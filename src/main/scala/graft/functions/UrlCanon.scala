package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the crawl-dedup key: two captures of the same
  * resource under cosmetically different URLs (case, default port, www,
  * tracking params, param order, fragments) must collapse to ONE key
  * before url-level dedup or frontier scheduling.
  *
  * Built entirely from Catalyst column functions (no UDF): lower/regexp/
  * split/filter/array_sort/concat stay inside whole-stage codegen, so the
  * canonical key is a map-side expression at 10^12 rows. The same steps
  * are expressible verbatim in ANSI SQL — q31's DuckDB oracle runs the
  * identical pipeline, making the transform value-verified end to end.
  *
  * Rules (the common-crawl-practical subset):
  *  - scheme and host lowercased
  *  - leading `www.` stripped
  *  - default port stripped (`:443` for https, `:80` for http)
  *  - fragment dropped
  *  - `utm_*` tracking params dropped; remaining params sorted
  *  - empty path becomes `/`
  * Userinfo stripping is handled at ingest (Outlinks.host) — crawl URLs
  * with credentials are quarantined upstream, not canonicalized.
  */
object UrlCanon {

  /** Two-level public suffixes — a curated subset of the publicsuffix.org
    * list (the crawl-practical head: UK/AU/JP/BR/CN/MX/IN/ZA second-level
    * registries plus the big private registries). Real deployments
    * broadcast the full PSL data file; the algorithm — longest known
    * suffix, registrable domain = suffix + one label — is identical.
    * Kept visible for the q53 oracle to mirror. */
  val twoLevelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.za", "github.io", "blogspot.com")

  /** Registrable domain (eTLD+1) of a bare hostname: the per-DOMAIN
    * aggregation key for crawl quotas, domain-level dedup lists, and
    * host→domain rollups (a host-keyed group explodes on CDNs;
    * registrable domain is the right granularity). Pure Catalyst —
    * stays in whole-stage codegen. Single labels and bare suffixes
    * return themselves (no registrable domain exists; returning the
    * input keeps the column total). */
  def registrableDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".",
      element_at(labels, -3), element_at(labels, -2), element_at(labels, -1))
    when(n <= 1, host)
      .when(n >= 3 && last2.isin(twoLevelSuffixes: _*), last3)
      .otherwise(last2)
  }

  def canonical(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    val noWww = regexp_replace(hostport, "^www\\.", "")
    val host = when(scheme === "https", regexp_replace(noWww, ":443$", ""))
      .when(scheme === "http", regexp_replace(noWww, ":80$", ""))
      .otherwise(noWww)
    val pq = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)", 1)
    val path = substring_index(pq, "?", 1)
    val qpos = instr(pq, "?")
    val query = when(qpos > 0, pq.substr(qpos + 1, length(pq))).otherwise("")
    val params = filter(split(query, "&"),
      x => substring(x, 1, 4) =!= "utm_" && x =!= "")
    val sortedQ = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host,
      when(path === "", "/").otherwise(path),
      when(sortedQ === "", "").otherwise(concat(lit("?"), sortedQ)))
  }
}
