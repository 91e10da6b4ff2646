package graft

import org.apache.spark.sql.SparkSession

/** Diag: time one SparkEntry query N times at a given parallelism —
  * `TimeQuery <sfDir> <cores> <reps> <name[,name…]>`. Used to separate
  * host burst-drift from real per-query regressions (a single bench
  * sample on a drifting box cannot tell the two apart). */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val cores = args(1).toInt; val reps = args(2).toInt
    val names = args(3).split(',')
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", (2 * cores).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.range(1000).selectExpr("sum(id)").collect() // session warmup
    names.foreach { name =>
      SparkEntry.queries(name)(s, sfDir).count() // plan+codegen warmup
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(s, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[time-query] $name reps=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    s.stop()
  }
}
