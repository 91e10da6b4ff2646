package graft

import graft.functions.HostRank
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class HostRankSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("hostrank-spec").getOrCreate()

  private def rankDf(edges: Seq[(String, String, Double)], parts: Int) = {
    import spark.implicits._
    val df = spark.createDataset(edges).toDF("src", "dst", "weight").repartition(parts)
    HostRank.pageRank(df).collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  test("3-cycle converges to uniform ranks") {
    val edges = Seq(("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0))
    val r = rankDf(edges, 3)
    assert(r.size == 3)
    r.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-6))
  }

  test("distributed ranks equal the driver-side reference bit-for-bit") {
    val edges = Seq(
      ("hub", "a", 3.0), ("a", "hub", 1.0), ("b", "hub", 1.0),
      ("c", "hub", 2.0), ("hub", "b", 1.0), ("d", "a", 1.0))
    // 'c' and 'd' never receive; 'a','b','hub' form a cycle-ish core
    val expected = HostRank.pageRankLocal(edges)
    val got = rankDf(edges, 4)
    assert(got.keySet == expected.keySet)
    expected.foreach { case (h, v) =>
      assert(got(h) == v, s"host $h: ${got(h)} != $v") // exact, not approx
    }
  }

  test("partitioning-invariant: 1 partition == 7 partitions, bit-identical") {
    val edges = (0 until 40).map(i => (s"h${i % 8}", s"h${(i * 3) % 8}", 1.0 + (i % 3))) ++
      Seq(("sink1", "h0", 1.0), ("h1", "sink2", 2.0)) // sink2 is dangling
    val r1 = rankDf(edges, 1)
    val r7 = rankDf(edges, 7)
    assert(r1 == r7)
  }

  test("non-integral weights: partition-invariant AND bit-equal to local") {
    // fractional weights are where raw double sums drift with task
    // order; the entry-point quantization must make them exact too
    val edges = (0 until 60).map { i =>
      (s"w${i % 9}", s"w${(i * 5 + 2) % 9}", 0.1 + (i % 7) * 0.3 + i * 1e-4)
    } ++ Seq(("w0", "frac-sink", 0.7)) // dangling under fractional mass
    val expected = HostRank.pageRankLocal(edges)
    val r1 = rankDf(edges, 1)
    val r5 = rankDf(edges, 5)
    assert(r1 == r5)
    assert(r1.keySet == expected.keySet)
    expected.foreach { case (h, v) => assert(r1(h) == v, s"host $h") }
  }

  test("sub-quantum weights drop out; all-zero weights fail loudly") {
    import spark.implicits._
    // 1e-12 quantizes to zero at Q=1e9 -> its source becomes dangling
    val edges = Seq(("a", "b", 1.0), ("b", "a", 1.0), ("b", "ghost", 1e-12))
    val r = rankDf(edges, 2)
    assert(r.keySet == Set("a", "b")) // ghost edge (and node) dropped
    val allZero = spark.createDataset(Seq(("x", "y", 1e-12)))
      .toDF("src", "dst", "weight")
    intercept[IllegalArgumentException] { HostRank.pageRank(allZero).collect() }
  }

  test("empty edge list fails loudly instead of producing Infinity ranks") {
    import spark.implicits._
    val empty = spark.emptyDataset[(String, String, Double)].toDF("src", "dst", "weight")
    intercept[IllegalArgumentException] { HostRank.pageRank(empty).collect() }
  }

  test("repeated invocations pin no cached plans") {
    // the assertion is on GLOBAL cache state; forked tests run
    // sequentially (no testForkedParallel), so clearing the shared
    // cache here is race-free — earlier suites' cached frames simply
    // recompute (and re-cache) on next use. This replaces the old
    // `assume`-cancel with a real assertion in the full-suite run.
    spark.catalog.clearCache()
    val edges = Seq(("a", "b", 1.0), ("b", "a", 1.0))
    (1 to 3).foreach(_ => rankDf(edges, 2))
    // node/weight sets must be explicitly freed per call; rank sets are
    // localCheckpoint blocks, which the ContextCleaner releases on GC
    assert(spark.sharedState.cacheManager.isEmpty, "cached plans leaked")
  }

  test("dangling mass is redistributed: ranks still sum to ~1") {
    val edges = Seq(("a", "b", 1.0), ("b", "c", 1.0)) // c dangling
    val r = rankDf(edges, 2)
    assert(math.abs(r.values.sum - 1.0) < 1e-6)
    // c receives from b, b from a: rank(c) > rank(b) is false (b gets a's
    // full mass too); just assert the dangling node is not starved
    assert(r("c") > (1 - 0.85) / 3)
  }
}
