package graft

import graft.icelite.IceLite
import graft.pipeline.Pipeline
import org.apache.spark.sql.SparkSession

/** Diagnostic: chunked-reassembly stage timing at one parallelism level. */
object DiagChunked {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val benchRoot = s"${SparkEntry.SynthRoot}/bench_${sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "2000000")}_v${graft.gen.SynthCorpus.GenVersion}"
    val s = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", (2 * cores).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (1024 * 1024).toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val pages = IceLite.read(s, s"$benchRoot/pages")
    Pipeline.extractChunked(pages).count() // warmup
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      val n = Pipeline.extractChunked(pages).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"DIAGCHUNKED cores=$cores docs=$n secs=$sec%.2f")
      sec
    }
    println(f"DIAGCHUNKED BEST cores=$cores secs=${times.min}%.2f")
    s.stop()
  }
}
