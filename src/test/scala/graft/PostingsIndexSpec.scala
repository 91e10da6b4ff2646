package graft

import graft.functions.PostingsIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted-postings contract: index-served scores equal the direct
  * q44 scan path bit-for-bit, bucket partition pruning reaches the
  * scan, and the staleness manifest detects in-place corpus changes. */
class PostingsIndexSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("postings-index-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  test("index path == direct q44 path, bit-for-bit (shared scoring tree)") {
    val direct = SparkEntry.queries("q44_bm25_topk")(spark, sfDir)
      .collect().map(_.toString).toSeq
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val dir = java.nio.file.Files.createTempDirectory("postings_idx").toString
    PostingsIndex.build(docs, dir)
    import spark.implicits._
    val queryTerms = Seq((1L, "spark", 1), (1L, "window", 2),
      (2L, "merge", 1), (2L, "key", 2), (3L, "vector", 1), (3L, "batch", 2))
      .toDF("query_id", "term", "tidx")
    val served = PostingsIndex.query(spark, dir, queryTerms)
      .select("query_id", "rank", "doc_id", "score_x1e6")
      .collect().map(_.toString).toSeq
    assert(served == direct)
  }

  test("query scans only the buckets its terms hash into (pruned scan)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val dir = java.nio.file.Files.createTempDirectory("postings_prune").toString
    PostingsIndex.build(docs, dir)
    import spark.implicits._
    val qt = Seq((1L, "spark", 1), (1L, "window", 2)).toDF("query_id", "term", "tidx")
    val res = PostingsIndex.query(spark, dir, qt)
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [bucket#") ||
      plan.contains("bucket IN"), plan)
    // the audit columns publish the pruning that actually happened
    val audit = res.select("n_buckets", "n_buckets_scanned").distinct().collect()
    assert(audit.length == 1)
    assert(audit.head.getInt(0) == 32 && audit.head.getInt(1) <= 2)
  }

  test("staleness: in-place text change with same row count is detected") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "b c d"), (3L, "c d e"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("postings_stale").toString
    PostingsIndex.build(docs, dir)
    assert(PostingsIndex.isCurrent(spark, dir, docs))
    val mutated = Seq((1L, "a b c"), (2L, "b c CHANGED"), (3L, "c d e"))
      .toDF("doc_id", "text")
    assert(mutated.count() == docs.count())
    assert(!PostingsIndex.isCurrent(spark, dir, mutated))
    // params are part of the manifest too
    assert(!PostingsIndex.isCurrent(spark, dir, docs, nBuckets = 8))
  }

  test("query terms absent from the corpus contribute nothing, never fail") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta"), (2L, "beta gamma"), (3L, "gamma alpha"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("postings_oov").toString
    PostingsIndex.build(docs, dir)
    val qt = Seq((1L, "alpha", 1), (1L, "zzz_not_in_corpus", 2))
      .toDF("query_id", "term", "tidx")
    val rows = PostingsIndex.query(spark, dir, qt, k = 3).collect()
    // alpha appears in docs 1 and 3; the OOV term adds no candidates
    assert(rows.map(_.getLong(2)).toSet == Set(1L, 3L))
  }
}
