package graft

import graft.extract.ExtractMode
import graft.icelite.IceLite
import graft.pipeline.Pipeline
import org.apache.spark.sql.SparkSession

/** One extraction measurement in a fresh JVM: BenchOne <cores> <salted>.
  * Prints a single line: cores salted docs secs docs_per_sec. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val salted = args(1).toBoolean
    val benchRoot = s"${SparkEntry.SynthRoot}/bench_${sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "2000000")}"
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", (2 * cores).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val pages = IceLite.read(s, s"$benchRoot/pages")
    Pipeline.extract(pages, ExtractMode.Plain, numPartitions = 2 * cores, repartitionByHost = salted).count()
    val t0 = System.nanoTime()
    val n = Pipeline.extract(pages, ExtractMode.Plain, numPartitions = 2 * cores, repartitionByHost = salted).count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"BENCHONE cores=$cores salted=$salted docs=$n secs=$sec%.2f dps=${n / sec}%.0f")
    s.stop()
  }
}
