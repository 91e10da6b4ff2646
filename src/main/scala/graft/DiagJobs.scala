package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Diagnostic: per-JOB wall-time breakdown of one headline query —
  * answers "is this query's time data cost or driver-action count"
  * (guide §1.1 empirical loop). Runs the query once untimed (warmup),
  * then once with a listener capturing every job's start/end and
  * description; prints the job table and the gaps between jobs
  * (planning / driver-side time).
  *
  * Usage: runMain graft.DiagJobs <query> [sfDir]
  */
object DiagJobs {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-diag-jobs")
      .config("spark.sql.shuffle.partitions", (2 * cpus).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (1024 * 1024).toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // extra session confs for hypothesis tests: DIAG_CONF="k=v;k2=v2"
    sys.env.get("DIAG_CONF").foreach(_.split(";").filter(_.nonEmpty).foreach { kv =>
      val Array(k, v) = kv.split("=", 2); s.conf.set(k, v)
    })
    s.range(1000).selectExpr("sum(id)").collect()

    SparkEntry.queries(name)(s, sfDir).count() // warmup

    final case class J(id: Int, start: Long, var end: Long = -1L,
        var desc: String = "", var stages: Int = 0, var tasks: Int = 0)
    val jobs = mutable.LinkedHashMap.empty[Int, J]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val j = J(e.jobId, e.time)
        j.desc = Option(e.properties.getProperty("spark.job.description")).getOrElse("")
        j.stages = e.stageInfos.length
        j.tasks = e.stageInfos.map(_.numTasks).sum
        jobs(e.jobId) = j
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.end = e.time)
      }
    }
    s.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(s, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    s.sparkContext.removeSparkListener(listener)
    Thread.sleep(300) // let listener drain

    println(f"DIAGJOBS $name wall=$wall%.3f s")
    var prevEnd = -1L
    var jobSum = 0L
    jobs.values.toSeq.sortBy(_.start).foreach { j =>
      val dur = if (j.end > 0) j.end - j.start else -1L
      val gap = if (prevEnd > 0) j.start - prevEnd else 0L
      if (dur > 0) jobSum += dur
      println(f"  job=${j.id}%3d dur=${dur}%5d ms gap_before=${gap}%5d ms stages=${j.stages}%2d tasks=${j.tasks}%4d  ${j.desc.take(80)}")
      prevEnd = math.max(prevEnd, j.end)
    }
    println(f"  job_sum=${jobSum} ms  wall=${(wall * 1000).toLong} ms  non-job(driver/planning)=${(wall * 1000).toLong - jobSum} ms")
    s.stop()
  }
}
