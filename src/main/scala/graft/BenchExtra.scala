package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1). NOT the driver
  * bench — Bench.scala is frozen; this main exists so individual
  * headline queries can be timed/explained in isolation with the same
  * session config, the same warmup discipline and the same `.count()`
  * action as Bench phase 1, plus optional noop-sink isolation (§1.4).
  *
  * Usage: sbt "runMain graft.BenchExtra [q1,q2,... | all] [repeats]"
  *   env SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in Bench
  *   env BENCH_EXTRA_EXPLAIN=dir  -> write <dir>/<query>_<tag>.txt explains
  *   env BENCH_EXTRA_TAG=before|after (default none)
  *   env BENCH_EXTRA_NOOP=1       -> time a noop-sink write instead of count
  */
object BenchExtra {

  private val headline = Seq(
    "q01_pricing_summary", "q02_nation_revenue", "q05_first_event",
    "q08_token_prf", "q09_dedup_exact", "q10_minhash_band",
    "q12_ngram_jaccard", "q13_cosine_topk", "q16_token_count",
    "q17_hourly_events", "x08_minhash_lsh_pairs",
    "q27_repetition_filter", "q28_decontamination", "q30_stratified_sample",
    "q34_packing_sharded", "q35_rare_term_idf", "x26_ann_pq",
    "q37_window_dedup", "q38_nfc_normalize",
    "q41_boilerplate_lines", "q44_bm25_topk", "q47_paragraph_dedup",
    "q49_lm_bucket",
    "q64_simhash_hamming", "q67_countmin_sketch", "q68_asof_join",
    "q74_event_funnel", "q76_pagerank")

  private def timed[T](f: => T): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val names =
      if (args.isEmpty || args(0) == "all") headline else args(0).split(",").toSeq
    val repeats = if (args.length > 1) args(1).toInt else 3
    val explainDir = sys.env.get("BENCH_EXTRA_EXPLAIN")
    val tag = sys.env.getOrElse("BENCH_EXTRA_TAG", "")
    val noop = sys.env.get("BENCH_EXTRA_NOOP").contains("1")

    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-extra-$cpus")
      .config("spark.sql.shuffle.partitions", (2 * cpus).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (1024 * 1024).toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s.range(1000).selectExpr("sum(id)").collect()

    val results = names.map { name =>
      s.sparkContext.setJobDescription(name)
      def run(): Unit = {
        val df = SparkEntry.queries(name)(s, sfDir)
        if (noop) df.write.format("noop").mode("overwrite").save() else df.count()
      }
      val secs = try {
        run() // plan+codegen warmup, as in Bench
        (1 to repeats).map(_ => timed(run()))
      } catch {
        case e: Throwable =>
          println(s"FAIL $name: ${e.getClass.getSimpleName}: ${e.getMessage}")
          Seq(-1.0)
      }
      explainDir.foreach { d =>
        val dir = java.nio.file.Paths.get(d)
        java.nio.file.Files.createDirectories(dir)
        val suffix = if (tag.nonEmpty) s"_$tag" else ""
        val txt = try SparkEntry.queries(name)(s, sfDir).queryExecution
          .explainString(org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"explain failed: $e" }
        java.nio.file.Files.writeString(dir.resolve(s"$name$suffix.txt"), txt)
      }
      s.sparkContext.setJobDescription(null)
      val best = secs.min
      val all = secs.map(x => f"$x%.3f").mkString(",")
      println(f"BENCHX $name%-24s min=${best}%.3f  samples=[$all]")
      name -> best
    }
    val total = results.map(_._2).filter(_ >= 0).sum
    println(f"BENCHX_TOTAL ${total}%.3f over ${results.size} queries")
    s.stop()
  }
}
