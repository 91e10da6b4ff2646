package graft.functions

import graft.util.{Hash64, SplitMix64}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal asset row: the opaque-binary-column pattern for a
  * training-data pipeline — image/audio/video payloads travel as
  * `binary` with TYPED metadata beside them, and all per-asset compute
  * runs batched per partition (the JVM analog of `mapInPandas`: one
  * iterator of batches in, one out, no per-row driver round trips).
  */
final case class AssetRow(asset_id: Long, kind: String, payload: Array[Byte],
    width: Int, height: Int, sample_rate: Int, n_frames: Int)

final case class AssetFeatures(asset_id: Long, kind: String,
    byte_len: Long, sha: Long, thumb_w: Int, thumb_h: Int,
    frame_ids: Seq[Int], feature: Seq[Float])

/** Image/audio/video plumbing with a STUBBED decode step.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic fake (it derives "pixels" from xxh64 of
  * the payload). Everything around it — the schema, the partition-batched
  * execution shape, the resize arithmetic, the frame-sampling stride, the
  * feature vector contract — is real and tested; swapping `decodeStub`
  * for a codec call is the only production change.
  */
object Multimodal {

  /** STUB — deterministic fake decode. Production: replace with an
    * actual codec (e.g. javax.imageio / ffmpeg bindings). */
  private def decodeStub(payload: Array[Byte], n: Int): Array[Float] = {
    val out = new Array[Float](n)
    val r = new SplitMix64(Hash64.xxh64(payload, 0x1a7e57L))
    var i = 0
    while (i < n) { out(i) = (r.nextDouble() * 2 - 1).toFloat; i += 1 }
    out
  }

  /** Thumbnail dimensions preserving aspect ratio, long side = `target`
    * (the real resize arithmetic; floor semantics, min 1px). */
  def thumbDims(w: Int, h: Int, target: Int = 256): (Int, Int) = {
    if (w <= 0 || h <= 0) (1, 1)
    else if (w >= h) (target, math.max(1, (h.toLong * target / w).toInt))
    else (math.max(1, (w.toLong * target / h).toInt), target)
  }

  /** Evenly-strided frame sample (video): k frames from n, first frame
    * always included, deterministic. */
  def sampleFrames(nFrames: Int, k: Int = 8): Seq[Int] = {
    if (nFrames <= 0) Seq.empty
    else if (nFrames <= k) 0 until nFrames
    else (0 until k).map(i => (i.toLong * nFrames / k).toInt)
  }

  /** Per-partition batched feature extraction — the mapInPandas-shaped
    * stage: iterator in, iterator out, one decode per asset. */
  def extractFeatures(assets: Dataset[AssetRow], featureDim: Int = 16): Dataset[AssetFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val (tw, th) = thumbDims(a.width, a.height)
        val frames = if (a.kind == "video") sampleFrames(a.n_frames) else Seq.empty
        AssetFeatures(a.asset_id, a.kind, a.payload.length.toLong,
          Hash64.xxh64(a.payload, 0L), tw, th, frames,
          decodeStub(a.payload, featureDim).toSeq)
      }
    }
  }

  /** Deterministic synthetic asset table (images/audio/video mix). */
  def synthAssets(spark: SparkSession, n: Long): Dataset[AssetRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val r = new SplitMix64(Hash64.xxh64(s"asset-$i", 42L))
      val kind = Seq("image", "audio", "video")(r.nextInt(3))
      val payload = Array.fill(64 + r.nextInt(192))((r.nextLong() & 0xff).toByte)
      kind match {
        case "image" => AssetRow(i, kind, payload, 320 + r.nextInt(3000), 240 + r.nextInt(2000), 0, 0)
        case "audio" => AssetRow(i, kind, payload, 0, 0, 16000 + 100 * r.nextInt(300), 0)
        case _       => AssetRow(i, kind, payload, 640, 480, 0, 1 + r.nextInt(600))
      }
    }
  }

  /** Feature table + per-kind stats — the query surface entry. */
  def featureStats(spark: SparkSession, n: Long): DataFrame = {
    extractFeatures(synthAssets(spark, n)).toDF()
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_assets"),
        sum(col("byte_len")).as("sum_bytes"),
        countDistinct(col("sha")).as("n_distinct_payloads"),
        sum(size(col("frame_ids"))).cast("long").as("sum_sampled_frames"),
        max(col("thumb_w")).as("max_thumb_w"))
      .orderBy("kind")
  }
}
