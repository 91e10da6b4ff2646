package graft.functions

import graft.util.Checkpoints
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PageRank over the host link graph (the x22 outlink aggregate) — the
  * crawl-quality prior: frontier schedulers and quality filters weight
  * hosts by link-graph centrality, the standard web-scale companion to
  * main-content extraction.
  *
  * Scale shape: ONE shuffle and ONE action per power iteration — the
  * dangling-mass reduction is a broadcast one-row aggregate folded into
  * the same job as the contribution join, not a separate driver action.
  * Ranks and weights are per HOST (~10^7-10^8 rows at crawl scale, not
  * 10^12 pages). Lineage is truncated every 4th iteration via
  * [[Checkpoints.truncator]]: `spark.graft.cc.checkpointDir` switches it
  * to reliable checkpoints for fleet runs.
  *
  * Determinism: EVERY floating sum in the pipeline is quantized to 1e-9
  * units (longs) BEFORE it is shuffled — input edge weights on entry
  * (so multi-edge weights, out-weights and their ratios are exact for
  * ARBITRARY double weights, not just integral ones), and per-edge rank
  * contributions per iteration. Integer addition is associative, so
  * ranks are bit-identical under any partitioning. Sub-quantum edges
  * (weight < 0.5e-9) drop out — their source becomes dangling, which is
  * the honest reading of a zero-quantum link. Weights must be
  * non-negative and below ~9.2e9 (long range at Q = 1e9).
  */
object HostRank {

  final val Q = 1e9

  /** Spark's Round-on-double semantics (HALF_UP over the decimal value,
    * scala BigDecimal) then a long cast — the driver-side mirror must
    * round EXACTLY this way or values within 1 ULP of .5 diverge from
    * the distributed `round(x).cast("long")`. */
  private def roundQ(x: Double): Long =
    BigDecimal(x).setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble.toLong

  /** edges: (src, dst, weight) host-level multi-edge list. Returns
    * (host, rank) with sum(rank) ~= 1. `truncateFinal = false` keeps the
    * last iteration's full lineage (ExplainAll publishes the one-hop
    * plan as a reviewable artifact; a checkpoint would hide it). */
  def pageRank(edges: DataFrame, iters: Int = 10, damping: Double = 0.85,
      truncateFinal: Boolean = true): DataFrame =
    graft.util.SessionTuning.withCachedPlanAqe(edges.sparkSession) {
      pageRankImpl(edges, iters, damping, truncateFinal)
    }

  private def pageRankImpl(edges: DataFrame, iters: Int, damping: Double,
      truncateFinal: Boolean): DataFrame = {
    val spark = edges.sparkSession
    val truncate0 = Checkpoints.truncator(spark)
    // quantize each input weight BEFORE any aggregation: long sums are
    // partitioning-invariant where double sums are not
    val e = edges.select(col("src").cast("string").as("src"),
      col("dst").cast("string").as("dst"),
      round(col("weight").cast("double") * Q).cast("long").as("w_q"))
      .groupBy("src", "dst").agg(sum(col("w_q")).as("w_q"))
      .filter(col("w_q") > 0)
      .persist()
    val outW = e.groupBy(col("src")).agg(sum(col("w_q")).as("out_w_q"))
    // r6b: weighted persists LAZILY — its cache fills from cached `e`
    // during the first job that reads it (the hop-3 checkpoint), so the
    // dedicated eager `weighted.count()` action is gone. `e` stays
    // pinned until after the loop so that fill reads the cache, not the
    // source.
    val weighted = e.join(outW, Seq("src"))
      .select(col("src"), col("dst"), (col("w_q") / col("out_w_q")).as("frac"))
      .persist()
    // r6: the dangling classification (host has no outlink) is FIXED
    // for the whole run, so it is computed ONCE here as a boolean on
    // the node table and carried through every hop's rank rows.
    // r6b: built as ONE aggregation (max of a per-occurrence boolean)
    // instead of distinct + distinct + left join — same host set, same
    // has_out flag, two fewer exchanges inside the setup action.
    val nodes = e.select(col("src").as("host"), lit(true).as("has_out"))
      .unionByName(e.select(col("dst").as("host"), lit(false).as("has_out")))
      .groupBy(col("host")).agg(max(col("has_out")).as("has_out"))
      .persist()
    val n = nodes.count() // the ONLY setup action: fills e + nodes caches
    // loud failure beats Infinity ranks from 1/0 (the IvfIndex seeding
    // lesson: degenerate inputs must not produce silent garbage) — and
    // the failure path must release what it pinned
    if (n == 0) {
      e.unpersist(); weighted.unpersist(); nodes.unpersist()
      throw new IllegalArgumentException(
        "HostRank.pageRank: no hosts to rank (empty edge list, or every weight quantized to zero)")
    }
    val base = (1.0 - damping) / n
    // r6b: no eager checkpoint of the INITIAL ranks — it is a 1-deep
    // projection over the pinned `nodes` cache, so truncating its
    // lineage bought nothing and cost a full driver action; the hop
    // truncation every 4th iteration still bounds recompute depth.
    var ranks = nodes.select(col("host"), lit(1.0 / n).as("rank"), col("has_out"))
    // r6: non-checkpoint iterations persist LAZILY instead of
    // persist+count — each eager count was a full driver action (job
    // + scheduling) per hop, the dominant cost of a small-graph run
    // (q76 bench: 5 hops, ~10 actions). The caches fill during the
    // next checkpoint's job: each hop's dangling broadcast is built
    // before the main stage and materializes the previous hop's rank
    // partitions on the way, so within-job consumers still reuse
    // rather than recompute; shuffle/broadcast exchanges between hops
    // are additionally deduped by Spark's exchange reuse. Lineage is
    // still truncated every 4th hop, bounding recompute depth.
    // Unpersists move to AFTER the loop: releasing a lazily-persisted
    // hop before any action has run would silently discard the cache.
    val pinnedHops = scala.collection.mutable.ArrayBuffer[DataFrame]()
    // r6b: in LOCAL mode (no reliable checkpoint dir) every hop is a
    // LAZY localCheckpoint — the hop's logical plan collapses to a
    // LogicalRDD leaf, so per-hop plans stay CONSTANT-size instead of
    // doubling per hop (dangling + inflow each reference the previous
    // ranks: depth-4 lineage meant ~2^4 copies of the setup subtree and
    // a measured ~0.9 s optimizer stall before the checkpoint job, plus
    // 0.2-0.3 s AQE replans of the mega-tree per late stage). Lazy means
    // no dedicated driver action; AQE materializes the hop's exchange
    // stages on construction and the final map segment runs inside
    // whichever job consumes the hop. Hop storage is freed by the
    // ContextCleaner when the run's references drop. With a reliable
    // checkpoint dir set (fleet runs), the every-4th-hop EAGER
    // checkpoint + lazy-persist design is kept: executor loss must not
    // lose hop state, which localCheckpoint cannot guarantee.
    val localMode = spark.conf.getOption(Checkpoints.ConfKey).isEmpty
    var it = 0
    while (it < iters) {
      // dangling hosts (no outlinks) spread their mass uniformly; the
      // one-row aggregate rides the SAME job as the contribution join
      // via a broadcast cross join — a map-side filter on the carried
      // has_out flag (r6), no join
      val dangling = ranks.filter(!col("has_out"))
        .agg(coalesce(sum(round(col("rank") * Q).cast("long")), lit(0L)).as("dangling_q"))
      val inflow = ranks.join(weighted, ranks("host") === weighted("src"))
        .select(col("dst").as("host"),
          round(col("rank") * col("frac") * Q).cast("long").as("contrib_q"))
        .groupBy(col("host"))
        .agg(sum(col("contrib_q")).as("inflow_q"))
      val nextRaw = nodes.join(inflow, Seq("host"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("host"),
          (lit(base) + lit(damping) *
            (coalesce(col("inflow_q"), lit(0L)) / Q +
              col("dangling_q") / lit(Q) / lit(n.toDouble))).as("rank"),
          col("has_out"))
      val last = it == iters - 1
      val next =
        if (localMode) {
          if (last && !truncateFinal) nextRaw // folds into the caller's action
          else if (last) truncate0(nextRaw)   // eager: contract says final is materialized
          else nextRaw.localCheckpoint(eager = false)
        } else {
          val truncate = (it % 4 == 3 || last) && (truncateFinal || !last)
          if (truncate) truncate0(nextRaw)
          else { val p = nextRaw.persist(); pinnedHops += p; p }
        }
      ranks = next
      it += 1
    }
    pinnedHops.foreach(_.unpersist())
    // release pinned executor storage: with truncateFinal the returned
    // ranks are checkpoint-materialized and depend on neither; without
    // it the lineage can recompute them (slower, never wrong). A
    // long-lived session invoking pageRank repeatedly must not
    // accumulate pinned node/weight sets (the r2 lshCandidatePairs
    // lesson).
    e.unpersist()
    weighted.unpersist()
    nodes.unpersist()
    ranks.select(col("host"), col("rank"))
  }

  /** Driver-side reference implementation (tests): identical
    * quantization, rounding (Spark HALF_UP via roundQ) and
    * order-independent integer arithmetic, so the distributed result
    * must match it bit-for-bit — for arbitrary double weights. */
  def pageRankLocal(edges: Seq[(String, String, Double)], iters: Int = 10,
      damping: Double = 0.85): Map[String, Double] = {
    val wq = edges.groupBy(e => (e._1, e._2))
      .map { case (k, es) => (k, es.map(e => roundQ(e._3 * Q)).sum) }
      .filter(_._2 > 0)
    val outW = wq.groupBy(_._1._1).map { case (s, m) => (s, m.values.sum) }
    val nodes = (wq.keys.map(_._1) ++ wq.keys.map(_._2)).toSet.toSeq.sorted
    val n = nodes.length
    val base = (1.0 - damping) / n
    var ranks = nodes.map(h => h -> 1.0 / n).toMap
    (1 to iters).foreach { _ =>
      val danglingQ = nodes.filterNot(outW.contains)
        .map(h => roundQ(ranks(h) * Q)).sum
      val inflowQ = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      wq.foreach { case ((s, d), wt) =>
        val frac = wt.toDouble / outW(s).toDouble
        inflowQ(d) += roundQ(ranks(s) * frac * Q)
      }
      ranks = nodes.map(h =>
        h -> (base + damping * (inflowQ(h) / Q + danglingQ / Q / n))).toMap
    }
    ranks
  }
}
