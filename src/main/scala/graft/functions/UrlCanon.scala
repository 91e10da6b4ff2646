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
