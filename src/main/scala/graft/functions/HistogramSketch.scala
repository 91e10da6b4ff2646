package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-memory power-of-two histogram sketch over a non-negative long
  * column — the bounded-task quantile/sharding primitive behind q65
  * (per-host length quantiles) and q70 (deterministic range sharding),
  * extracted as a reusable operator (VERDICT r4 optional #8).
  *
  * Bin index = number of binary digits of the value (integer-exact in
  * every engine — no float-log2 ULP hazard at exact powers of two), so
  * a 64-bit domain collapses to ≤64 bins. The histogram is ONE
  * partial-aggregating shuffle keyed (keys..., bin); every downstream
  * cumulative window runs over BINS, never rows — task input is bounded
  * by 64 whatever the key's row count (the q46 row_number-window
  * hazard, retired). The price is bin-granular answers — the standard
  * histogram-sketch tradeoff (memory O(bins), error one bin).
  *
  * Mergeability: (key, bin, cnt) rows from disjoint corpus slices merge
  * by summing cnt per (key, bin) — integer addition, order-free — so
  * per-ingest histograms roll up into corpus histograms losslessly
  * (same property CountMin gets from its counter grid).
  */
object HistogramSketch extends Serializable {

  /** Power-of-two bin of a non-negative long column: length of its
    * binary rendering (0 → bin 1, 1 → 1, 2..3 → 2, 4..7 → 3, …).
    * Negative values RAISE instead of silently landing in bin 64
    * (bin(-1) renders 64 one-bits — a corrupt length would otherwise
    * quietly inflate max_bin and skew every quantile; the HostRank
    * loud-failure discipline, review finding). */
  def binOf(value: Column): Column = {
    val v = value.cast("long")
    when(v < 0, raise_error(concat(
        lit("HistogramSketch.binOf: negative value "), v.cast("string")))
      .cast("long"))
      .otherwise(length(bin(v)).cast("long"))
  }

  /** (keys…, bin, cnt): one partial-aggregating shuffle. `keys` empty
    * gives the global histogram (≤64 rows total). */
  def build(df: DataFrame, valueCol: String, keys: Seq[String]): DataFrame =
    df.withColumn("bin", binOf(col(valueCol).cast("long")))
      .groupBy((keys.map(col) :+ col("bin")): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Per-key quantile summary read off the histogram: (keys…, n_docs,
    * n_bins, p50_bin, p90_bin, max_bin). The cumulative window is over
    * the ≤64 bins of a key. For an empty `keys` the window partitions
    * on a constant — still ≤64 rows in the one partition, bounded by
    * construction (the only case where a constant partition key is
    * safe). */
  def quantileSummary(hist: DataFrame, keys: Seq[String]): DataFrame = {
    val part = if (keys.nonEmpty) Window.partitionBy(keys.map(col): _*)
      else Window.partitionBy(lit(1))
    val w = part.orderBy("bin")
    hist
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(part))
      .groupBy(keys.map(col): _*)
      .agg(max(col("n")).as("n_docs"),
        count(lit(1)).as("n_bins"),
        min(when(col("cum") * 2 >= col("n"), col("bin"))).as("p50_bin"),
        min(when(col("cum") * 10 >= col("n") * 9, col("bin"))).as("p90_bin"),
        max(col("bin")).as("max_bin"))
  }

  /** Deterministic range-shard boundaries off the GLOBAL histogram:
    * (s, b) for s in 1..nShards-1, b = the first bin where the
    * cumulative count crosses s/nShards of the corpus. Boundaries are
    * content-deterministic and integer-exact (unlike
    * repartitionByRange's sampled splits, which differ run to run);
    * shard assignment is then a broadcast of nShards-1 rows + a
    * map-side comparison. Sizes are bin-granular. */
  def shardBounds(hist: DataFrame, nShards: Int): DataFrame = {
    require(nShards >= 2, s"nShards must be >= 2, got $nShards")
    val spark = hist.sparkSession
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(Window.orderBy("bin")))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(lit(1))))
    val svals = spark.range(1, nShards).toDF("s")
    cum.crossJoin(svals)
      .filter(col("cum") * nShards >= col("s") * col("n"))
      .groupBy(col("s")).agg(min(col("bin")).as("b"))
  }
}
