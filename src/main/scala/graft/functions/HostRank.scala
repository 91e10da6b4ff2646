package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PageRank over the host link graph (the x22 outlink aggregate) — the
  * crawl-quality prior: frontier schedulers and quality filters weight
  * hosts by link-graph centrality, the standard web-scale companion to
  * main-content extraction.
  *
  * Scale shape: one shuffle per power iteration (contribution join +
  * per-dst sum); ranks and weights are longs/doubles per HOST (~10^7-10^8
  * rows at crawl scale, not 10^12 pages). The dangling-mass reduction is
  * a one-row aggregate, and lineage is truncated every 4th iteration
  * exactly like `TextSketch.connectedComponents` (plan growth is the
  * iterative-join trap).
  *
  * Determinism: per-edge contributions are quantized to 1e-9 rank units
  * (longs) BEFORE the shuffle sum — integer addition is associative, so
  * ranks are bit-identical under any partitioning (the same fixed-point
  * discipline as the IVF centroid fit; float sums would drift with task
  * order). 1e-9 of a rank unit is far below any ranking decision; long
  * overflow needs total rank mass over ~9e9 units (rank mass is 1).
  */
object HostRank {

  final val Q = 1e9

  /** edges: (src, dst, weight) host-level multi-edge list. Returns
    * (host, rank) with sum(rank) ~= 1. `truncateFinal = false` keeps the
    * last iteration's full lineage (ExplainAll publishes the one-hop
    * plan as a reviewable artifact; a checkpoint would hide it). */
  def pageRank(edges: DataFrame, iters: Int = 10, damping: Double = 0.85,
      truncateFinal: Boolean = true): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col("src").cast("string").as("src"),
      col("dst").cast("string").as("dst"),
      col("weight").cast("double").as("w"))
      .groupBy("src", "dst").agg(sum(col("w")).as("w"))
      .persist()
    val outW = e.groupBy(col("src")).agg(sum(col("w")).as("out_w"))
    val weighted = e.join(outW, Seq("src"))
      .select(col("src"), col("dst"), (col("w") / col("out_w")).as("frac"))
      .persist()
    weighted.count()
    e.unpersist()
    val nodes = e.select(col("src").as("host"))
      .unionByName(e.select(col("dst").as("host"))).distinct().persist()
    val n = nodes.count()
    // loud failure beats Infinity ranks from 1/0 (the IvfIndex seeding
    // lesson: degenerate inputs must not produce silent garbage) — and
    // the failure path must release what it pinned
    if (n == 0) {
      weighted.unpersist(); nodes.unpersist()
      throw new IllegalArgumentException(
        "HostRank.pageRank: empty edge list — no hosts to rank")
    }
    val base = (1.0 - damping) / n
    val srcs = weighted.select(col("src")).distinct()
    var ranks = nodes.select(col("host"), lit(1.0 / n).as("rank")).localCheckpoint(true)
    var prev: DataFrame = null
    var it = 0
    while (it < iters) {
      // dangling hosts (no outlinks) spread their mass uniformly
      val danglingQ = ranks.join(srcs, ranks("host") === srcs("src"), "left_anti")
        .agg(coalesce(sum(round(col("rank") * Q).cast("long")), lit(0L)))
        .first().getLong(0)
      val inflow = ranks.join(weighted, ranks("host") === weighted("src"))
        .select(col("dst").as("host"),
          round(col("rank") * col("frac") * Q).cast("long").as("contrib_q"))
        .groupBy(col("host"))
        .agg(sum(col("contrib_q")).as("inflow_q"))
      val nextRaw = nodes.join(inflow, Seq("host"), "left")
        .select(col("host"),
          (lit(base) + lit(damping) *
            (coalesce(col("inflow_q"), lit(0L)) / Q + lit(danglingQ / Q / n))).as("rank"))
      val truncate = (it % 4 == 3 || it == iters - 1) &&
        (truncateFinal || it != iters - 1)
      val next = if (truncate) nextRaw.localCheckpoint(true)
        else { val p = nextRaw.persist(); p.count(); p }
      if (prev != null) { prev.unpersist(); prev = null }
      if (!truncate) prev = next
      ranks = next
      it += 1
    }
    if (prev != null) prev.unpersist()
    // release pinned executor storage: with truncateFinal the returned
    // ranks are checkpoint-materialized and depend on neither; without
    // it the lineage can recompute them (slower, never wrong). A
    // long-lived session invoking pageRank repeatedly must not
    // accumulate pinned node/weight sets (the r2 lshCandidatePairs
    // lesson).
    weighted.unpersist()
    nodes.unpersist()
    ranks
  }

  /** Driver-side reference implementation (tests): identical quantization
    * and iteration order-independent arithmetic, so the distributed result
    * must match it bit-for-bit. */
  def pageRankLocal(edges: Seq[(String, String, Double)], iters: Int = 10,
      damping: Double = 0.85): Map[String, Double] = {
    val w = edges.groupBy(e => (e._1, e._2)).map { case (k, es) => (k, es.map(_._3).sum) }
    val outW = w.groupBy(_._1._1).map { case (s, m) => (s, m.values.sum) }
    val nodes = (w.keys.map(_._1) ++ w.keys.map(_._2)).toSet.toSeq.sorted
    val n = nodes.length
    val base = (1.0 - damping) / n
    var ranks = nodes.map(h => h -> 1.0 / n).toMap
    (1 to iters).foreach { _ =>
      val danglingQ = nodes.filterNot(outW.contains)
        .map(h => math.round(ranks(h) * Q)).sum
      val inflowQ = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      w.foreach { case ((s, d), wt) =>
        inflowQ(d) += math.round(ranks(s) * (wt / outW(s)) * Q)
      }
      ranks = nodes.map(h =>
        h -> (base + damping * (inflowQ(h) / Q + danglingQ / Q / n))).toMap
    }
    ranks
  }
}
