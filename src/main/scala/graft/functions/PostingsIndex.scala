package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted BM25 postings index — the text-retrieval serving shape
  * beside [[IvfIndex]]'s vector one: the inverted index q44 builds
  * per-query is written ONCE as a term-bucket-partitioned parquet
  * table, and a query scans only the handful of bucket partitions its
  * terms hash into (Catalyst partition pruning — the same
  * `PartitionFilters` discipline as the IVF cells table). At 10^12
  * documents the postings table is petabytes; a two-term query reads
  * ~2/nBuckets of it and never touches the corpus.
  *
  * Layout under `dir`:
  *   postings/bucket=<b>/…parquet   (term, doc_id, tf, dl)
  *   terms/bucket=<b>/…parquet      (term, df) — the document frequency
  *   stats/…parquet                 one row: (n_docs, sum_dl)
  *   MANIFEST                       staleness: row count + order-independent
  *                                  content fingerprint + build params
  *                                  (the [[IvfIndex]] manifest discipline —
  *                                  an index surviving an in-place corpus
  *                                  change must not serve stale scores)
  *
  * Bucketing uses `pmod(xxhash64(term), nBuckets)` — the SAME Catalyst
  * expression at build and query time, so routing agrees by
  * construction. Scoring shares [[bm25Contrib]] with the direct q44
  * path, so index-served and scan-computed scores cannot drift.
  */
object PostingsIndex {

  /** BM25 term contribution (k1=1.2, b=0.75) with the rational idf
    * surrogate (N-df+0.5)/(df+0.5) — no ln(), so the arithmetic is
    * bit-identical cross-engine (q35/q44's argument), and ONE fixed
    * expression tree over integer tf/df/dl/N/sumDl, shared by q44 and
    * the index query path. */
  def bm25Contrib(nDocs: Column, df: Column, tf: Column, dl: Column,
      sumDl: Column): Column =
    ((nDocs - df + lit(0.5)) / (df + lit(0.5))) *
      ((tf * lit(2.2)) /
        (tf + lit(1.2) * (lit(0.25) + lit(0.75) *
          (dl / (sumDl.cast("double") / nDocs)))))

  private def bucketOf(term: Column, nBuckets: Int): Column =
    pmod(xxhash64(term), lit(nBuckets.toLong))

  /** (row count, content fingerprint) in one scan (cf.
    * [[IvfIndex.contentFingerprint]]): XOR of xxhash64(doc_id, text) —
    * partitioning-invariant, flips on any in-place text change. */
  private def manifestStats(docs: DataFrame): (Long, Long) = {
    val r = docs.select(xxhash64(col("doc_id"), col("text")).as("h"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("fp")).head()
    (r.getLong(0), r.getLong(1))
  }

  private def manifestJson(st: (Long, Long), nBuckets: Int): String =
    s"""{"rows":${st._1},"fingerprint":${st._2},"nBuckets":$nBuckets}"""

  /** Tokenization shared with q44: whitespace-delimited terms. */
  private def termFreqs(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id").cast("long").as("doc_id"),
      split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
        size(col("toks")).cast("long").as("dl"))
    toks.select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("long").as("tf"), first(col("dl")).as("dl"))
  }

  /** Build the index. One explode + two term-keyed aggs (both absorb
    * mega-terms map-side); the bucket write is the only wide exchange. */
  def build(docs: DataFrame, dir: String, nBuckets: Int = 32): Unit = {
    val spark = docs.sparkSession
    val tf = termFreqs(docs)
    tf.withColumn("bucket", bucketOf(col("term"), nBuckets))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/postings")
    tf.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .withColumn("bucket", bucketOf(col("term"), nBuckets))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/terms")
    docs.select(col("doc_id").cast("long").as("doc_id"),
        size(split(col("text"), " ")).cast("long").as("dl"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("dl")).cast("long").as("sum_dl"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/MANIFEST"),
      manifestJson(manifestStats(docs), nBuckets))
  }

  /** True when a usable index exists at `dir` AND its manifest matches
    * the given corpus (row count + content fingerprint + params). */
  def isCurrent(spark: SparkSession, dir: String, docs: DataFrame,
      nBuckets: Int = 32): Boolean = {
    val m = java.nio.file.Paths.get(s"$dir/MANIFEST")
    java.nio.file.Files.exists(m) &&
      java.nio.file.Files.readString(m) ==
        manifestJson(manifestStats(docs), nBuckets)
  }

  private def readNBuckets(dir: String): Int = {
    val txt = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/MANIFEST"))
    """"nBuckets":(\d+)""".r.findFirstMatchIn(txt) match {
      case Some(m) => m.group(1).toInt
      case None => throw new IllegalStateException(
        s"PostingsIndex MANIFEST at $dir has no nBuckets")
    }
  }

  /** BM25 top-k over the persisted index. `queryTerms` is
    * (query_id LONG, term STRING, tidx INT) with tidx ∈ {1,2} — the
    * two-term written-order float sum q44 uses for cross-engine
    * bit-exactness. Only the bucket partitions the query terms hash
    * into are scanned (PartitionFilters on `bucket`); query terms, df
    * rows, and corpus stats all broadcast. Returns the q44 columns
    * plus audit columns (n_buckets, n_buckets_scanned) — the x21
    * discipline: a persisted result carries the settings it was
    * produced under. */
  def query(spark: SparkSession, dir: String, queryTerms: DataFrame,
      k: Int = 5): DataFrame = {
    val nb = readNBuckets(dir)
    val qt = queryTerms.select(col("query_id").cast("long").as("query_id"),
        col("term"), col("tidx").cast("int").as("tidx"))
      .withColumn("bucket", bucketOf(col("term"), nb))
    // bounded by the query vocabulary — never corpus-sized
    val buckets = qt.select(col("bucket")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    val vocab = qt.select(col("term")).distinct()
    val post = spark.read.parquet(s"$dir/postings")
      .filter(col("bucket").isin(buckets: _*))
      .join(broadcast(vocab), Seq("term"))
    val dfT = spark.read.parquet(s"$dir/terms")
      .filter(col("bucket").isin(buckets: _*))
      .join(broadcast(vocab), Seq("term"))
      .select(col("term"), col("df"))
    val stats = spark.read.parquet(s"$dir/stats")
    val contrib = post
      .join(broadcast(dfT), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("term"),
        bm25Contrib(col("n_docs"), col("df"), col("tf"), col("dl"),
          col("sum_dl")).as("c"))
    val scored = contrib
      .join(broadcast(qt.select(col("query_id"), col("term"), col("tidx"))),
        Seq("term"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(max(when(col("tidx") === 1, col("c"))).as("c1"),
        max(when(col("tidx") === 2, col("c"))).as("c2"))
      .select(col("query_id"), col("doc_id").as("id"),
        (coalesce(col("c1"), lit(0.0)) + coalesce(col("c2"), lit(0.0)))
          .as("score"))
    TopK.perQuery(scored, k)
      .select(col("query_id"), col("rank"), col("id").as("doc_id"),
        floor(col("score") * 1e6).cast("long").as("score_x1e6"),
        lit(nb).as("n_buckets"),
        lit(buckets.length).as("n_buckets_scanned"))
      .orderBy("query_id", "rank")
  }
}
