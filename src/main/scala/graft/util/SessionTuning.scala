package graft.util

import org.apache.spark.sql.SparkSession

/** Operator-scoped session tuning (guide §2.2 "let AQE coalesce").
  *
  * `spark.sql.optimizer.canChangeCachedPlanOutputPartitioning` defaults
  * to FALSE, so a `.persist()`ed table is materialized with the raw
  * `spark.sql.shuffle.partitions` count and every stage that reads the
  * cache pays one task per partition — for the iterative operators
  * (PageRank hop caches, Lloyd vector caches) that is hundreds of
  * near-empty tasks per job on small-per-key state. Flipping it lets
  * AQE size cached-plan output from the RUNTIME bytes (advisory
  * partition size), which is the scale-adaptive behaviour everywhere:
  * tiny aggregate caches coalesce to a few tasks, a 10^9-row cache
  * keeps hundreds. Scoped set-then-restore so callers' sessions keep
  * their own setting (the flag is read at each query's planning, so it
  * must be ON while the operator materializes its caches).
  */
object SessionTuning {

  final val CachedPlanAqeKey =
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"

  /** Run `body` with AQE cached-plan repartitioning enabled; restore
    * the previous session value (or unset) afterwards. */
  def withCachedPlanAqe[T](spark: SparkSession)(body: => T): T = {
    val prev = spark.conf.getOption(CachedPlanAqeKey)
    spark.conf.set(CachedPlanAqeKey, "true")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(CachedPlanAqeKey, v)
      case None    => spark.conf.unset(CachedPlanAqeKey)
    }
  }
}
