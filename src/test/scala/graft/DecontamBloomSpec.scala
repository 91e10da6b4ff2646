package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** x24 (Bloom-filter decontamination, map-only) must agree with q28
  * (exact broadcast-join decontamination) on the same corpus: the Bloom
  * path's only divergence mode is false positives, and at fpp 1e-6 over
  * this gram population there are none — so the outputs are EQUAL, not
  * just close. Spark's sketch BloomFilter is seed-fixed, so this is
  * deterministic, not flaky. */
class DecontamBloomSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("decontam-bloom-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("x24 bloom decontamination equals q28 exact on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val exact = SparkEntry.queries("q28_decontamination")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val bloom = SparkEntry.queries("x24_decontam_bloom")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(bloom == exact)
  }
}
