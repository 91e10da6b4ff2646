package graft

import graft.extract.ExtractMode
import graft.icelite.IceLite
import graft.pipeline.Pipeline
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** One extraction measurement in a fresh JVM: BenchOne <cores> <salted>.
  * Runs one warmup + 3 timed passes, prints one line per pass plus a
  * BEST line (best-of-3 filters GC/JIT noise; see BASELINE.md protocol). */
object BenchOne {

  def gcMillis(): Long =
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum

  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val salted = args(1).toBoolean
    val benchRoot = s"${SparkEntry.SynthRoot}/bench_${sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "2000000")}_v${graft.gen.SynthCorpus.GenVersion}"
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", (2 * cores).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // At cluster scale the 128MB default yields ~800k splits per 100TB;
      // at bench scale (a few GB) it yields fewer splits than cores, so
      // size splits down to keep tasks >= 4x cores (see BASELINE.md).
      .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (1024 * 1024).toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    if (!IceLite.exists(s, s"$benchRoot/pages")) {
      val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "2000000").toLong
      IceLite.commit(s, s"$benchRoot/pages", graft.gen.SynthCorpus.pages(s, n).toDF())
    }
    // stage/task telemetry: per-stage task count, total task time, max task
    val stats = new java.util.concurrent.ConcurrentHashMap[Int, (Int, Long, Long)]()
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val d = te.taskInfo.duration
        stats.merge(te.stageId, (1, d, d),
          (a, b) => (a._1 + b._1, a._2 + b._2, math.max(a._3, b._3)))
      }
    })
    val pages = IceLite.read(s, s"$benchRoot/pages")
    def pass(): Long =
      Pipeline.extract(pages, ExtractMode.Plain, numPartitions = 2 * cores,
        repartitionByHost = salted).count()
    pass() // warmup: JIT + codegen
    val results = (1 to 3).map { i =>
      System.gc() // start each pass from a collected heap
      stats.clear()
      val g0 = gcMillis(); val t0 = System.nanoTime()
      val n = pass()
      val sec = (System.nanoTime() - t0) / 1e9
      val gc = gcMillis() - g0
      println(f"BENCHONE pass=$i cores=$cores salted=$salted docs=$n secs=$sec%.2f dps=${n / sec}%.0f gc_ms=$gc")
      stats.forEach { (sid, st) =>
        println(f"BENCHONE   stage=$sid tasks=${st._1} task_time_total_ms=${st._2} task_max_ms=${st._3}")
      }
      (n, sec)
    }
    val (n, best) = results.minBy(_._2)
    println(f"BENCHONE BEST cores=$cores salted=$salted docs=$n secs=$best%.2f dps=${n / best}%.0f")
    s.stop()
  }
}
