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
    byte_len: Long, sha: Long, decoded: Boolean, thumb_w: Int, thumb_h: Int,
    frame_ids: Seq[Int], feature: Seq[Float])

/** Image/audio/video feature extraction with REAL decode for the two
  * modalities the JDK can decode without any external dependency:
  *
  *  - images: `javax.imageio.ImageIO` (PNG/JPEG/BMP/GIF/TIFF readers are
  *    JDK-built-in and work headless) — the analog of the reference's
  *    image input path (GOT/demo/run_ocr_2.0.py:35-41 RGB open) and its
  *    resize+normalize preprocessing (GOT/model/vision_encoder/
  *    blip_process.py:478-493): decode → aspect-preserving box-filter
  *    thumbnail → normalized float feature vector pooled from real
  *    pixels.
  *  - audio: `javax.sound.sampled.AudioSystem` decodes WAV/PCM — frames
  *    are read and the feature vector is per-window RMS energy of the
  *    actual samples.
  *  - video: the JDK ships NO video codec, so video decode is a
  *    clearly-marked deterministic stub (`decodeStub`); the
  *    frame-sampling stride, schema, and batched execution shape around
  *    it are real. Swapping the stub for an ffmpeg binding is the only
  *    production change, and `decoded = false` marks stubbed rows.
  *
  * A payload its codec rejects is NOT an error: it degrades to the
  * deterministic stub with `decoded = false` (the pipeline's
  * broken-payload quarantine discipline — corrupt crawl bytes must
  * never kill a 100 TB job).
  */
object Multimodal {

  // ImageIO's default read path spools through a temp-file cache; these
  // payloads are in-memory byte arrays, so the cache is pure churn.
  javax.imageio.ImageIO.setUseCache(false)

  /** STUB — deterministic fake decode, used ONLY for video (no JDK
    * video codec) and as the quarantine fallback for undecodable
    * payloads. Derives "pixels" from xxh64 of the payload. */
  private def decodeStub(payload: Array[Byte], n: Int): Array[Float] = {
    val out = new Array[Float](n)
    val r = new SplitMix64(Hash64.xxh64(payload, 0x1a7e57L))
    var i = 0
    while (i < n) { out(i) = (r.nextDouble() * 2 - 1).toFloat; i += 1 }
    out
  }

  /** Thumbnail dimensions preserving aspect ratio, long side = `target`
    * (floor semantics, min 1px). */
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

  /** Integer box-filter resample of a luminance plane: every target
    * pixel averages its source rectangle (>=1px, so upscale degenerates
    * to replication). Integer-rect bounds -> bit-deterministic. */
  def boxResample(src: Array[Float], sw: Int, sh: Int, tw: Int, th: Int): Array[Float] = {
    val out = new Array[Float](tw * th)
    var ty = 0
    while (ty < th) {
      val y0 = (ty.toLong * sh / th).toInt
      val y1 = math.max(y0 + 1, ((ty + 1).toLong * sh / th).toInt)
      var tx = 0
      while (tx < tw) {
        val x0 = (tx.toLong * sw / tw).toInt
        val x1 = math.max(x0 + 1, ((tx + 1).toLong * sw / tw).toInt)
        var acc = 0.0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { acc += src(y * sw + x); x += 1 }
          y += 1
        }
        out(ty * tw + tx) = (acc / ((y1 - y0).toLong * (x1 - x0))).toFloat
        tx += 1
      }
      ty += 1
    }
    out
  }

  /** Decoded image: width, height, luminance plane in [0,1]. */
  final case class DecodedImage(w: Int, h: Int, lum: Array[Float])

  /** REAL image decode via the JDK's ImageIO (headless-safe). None when
    * no installed reader accepts the bytes. */
  def decodeImage(payload: Array[Byte]): Option[DecodedImage] = {
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        val lum = new Array[Float](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
            // ITU-R BT.601 luma, normalized to [0,1]
            lum(y * w + x) = ((0.299f * r + 0.587f * g + 0.114f * b) / 255.0f)
            x += 1
          }
          y += 1
        }
        Some(DecodedImage(w, h, lum))
      }
    } catch { case _: Exception => None }
  }

  /** REAL audio decode via javax.sound (WAV/PCM): mono-mixed samples in
    * [-1,1]. None when the bytes aren't a decodable audio stream. */
  def decodeAudio(payload: Array[Byte]): Option[Array[Float]] = {
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val fmt = in.getFormat
      if (fmt.getSampleSizeInBits != 16) { in.close(); return None }
      val bytes = in.readAllBytes(); in.close()
      val ch = fmt.getChannels
      val big = fmt.isBigEndian
      val n = bytes.length / (2 * ch)
      val out = new Array[Float](n)
      var i = 0
      while (i < n) {
        var acc = 0.0f
        var c = 0
        while (c < ch) {
          val o = (i * ch + c) * 2
          val s = if (big) ((bytes(o) << 8) | (bytes(o + 1) & 0xff)).toShort
                  else ((bytes(o + 1) << 8) | (bytes(o) & 0xff)).toShort
          acc += s / 32768.0f
          c += 1
        }
        out(i) = acc / ch
        i += 1
      }
      Some(out)
    } catch { case _: Exception => None }
  }

  /** Image feature: box-filter thumbnail of the decoded luminance, then
    * a `dim`-cell grid pooled from the THUMBNAIL pixels, normalized to
    * [-1,1] — the resize+normalize contract of blip_process.py:478-493
    * on real pixels. */
  def imageFeature(img: DecodedImage, dim: Int, tw: Int, th: Int): Array[Float] = {
    val thumb = boxResample(img.lum, img.w, img.h, tw, th)
    val side = math.max(1, math.sqrt(dim.toDouble).toInt)
    val grid = boxResample(thumb, tw, th, side, math.max(1, dim / side))
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) { out(i) = (if (i < grid.length) grid(i) else 0.0f) * 2 - 1; i += 1 }
    out
  }

  /** Audio feature: RMS energy per window over the real samples. */
  def audioFeature(samples: Array[Float], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (samples.isEmpty) return out
    var w = 0
    while (w < dim) {
      val a = (w.toLong * samples.length / dim).toInt
      val b = math.max(a + 1, ((w + 1).toLong * samples.length / dim).toInt)
      var acc = 0.0
      var i = a
      while (i < b) { acc += samples(i).toDouble * samples(i); i += 1 }
      out(w) = math.sqrt(acc / (b - a)).toFloat
      w += 1
    }
    out
  }

  /** Per-partition batched feature extraction — the mapInPandas-shaped
    * stage: iterator in, iterator out, one decode per asset. */
  def extractFeatures(assets: Dataset[AssetRow], featureDim: Int = 16): Dataset[AssetFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val frames = if (a.kind == "video") sampleFrames(a.n_frames) else Seq.empty
        a.kind match {
          case "image" =>
            decodeImage(a.payload) match {
              case Some(img) =>
                // dims come from the DECODED pixels (crawl metadata lies)
                val (tw, th) = thumbDims(img.w, img.h)
                AssetFeatures(a.asset_id, a.kind, a.payload.length.toLong,
                  Hash64.xxh64(a.payload, 0L), decoded = true, tw, th, frames,
                  imageFeature(img, featureDim, tw, th).toSeq)
              case None =>
                val (tw, th) = thumbDims(a.width, a.height)
                AssetFeatures(a.asset_id, a.kind, a.payload.length.toLong,
                  Hash64.xxh64(a.payload, 0L), decoded = false, tw, th, frames,
                  decodeStub(a.payload, featureDim).toSeq)
            }
          case "audio" =>
            decodeAudio(a.payload) match {
              case Some(samples) =>
                AssetFeatures(a.asset_id, a.kind, a.payload.length.toLong,
                  Hash64.xxh64(a.payload, 0L), decoded = true, 0, 0, frames,
                  audioFeature(samples, featureDim).toSeq)
              case None =>
                AssetFeatures(a.asset_id, a.kind, a.payload.length.toLong,
                  Hash64.xxh64(a.payload, 0L), decoded = false, 0, 0, frames,
                  decodeStub(a.payload, featureDim).toSeq)
            }
          case _ => // video: STUB decode (no JDK video codec)
            val (tw, th) = thumbDims(a.width, a.height)
            AssetFeatures(a.asset_id, a.kind, a.payload.length.toLong,
              Hash64.xxh64(a.payload, 0L), decoded = false, tw, th, frames,
              decodeStub(a.payload, featureDim).toSeq)
        }
      }
    }
  }

  /** Deterministic REAL PNG: seed-driven two-band gradient, encoded via
    * ImageIO (lossless, so decoded pixels are bit-reproducible). */
  def synthPng(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val r = new SplitMix64(seed)
    val baseR = r.nextInt(256); val baseG = r.nextInt(256); val baseB = r.nextInt(256)
    val bandH = 1 + r.nextInt(math.max(1, h / 2))
    var y = 0
    while (y < h) {
      val band = (y / bandH) % 2 == 0
      var x = 0
      while (x < w) {
        val shade = x * 255 / math.max(1, w - 1)
        val rgb =
          if (band) (baseR << 16) | (baseG << 8) | shade
          else (shade << 16) | (baseG << 8) | baseB
        img.setRGB(x, y, rgb)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic REAL WAV (PCM16 mono, hand-rolled RIFF header):
    * seed-driven sine tone. */
  def synthWav(seed: Long, sampleRate: Int, nSamples: Int): Array[Byte] = {
    val r = new SplitMix64(seed)
    val freq = 110.0 + r.nextInt(2000)
    val amp = 0.2 + r.nextDouble() * 0.7
    val dataLen = nSamples * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      val v = amp * math.sin(2 * math.Pi * freq * i / sampleRate)
      bb.putShort((v * 32767).toShort)
      i += 1
    }
    bb.array()
  }

  /** Deterministic synthetic asset table: REAL encoded payloads for
    * image (PNG) and audio (WAV); opaque bytes for video (stub kind). */
  def synthAssets(spark: SparkSession, n: Long): Dataset[AssetRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val r = new SplitMix64(Hash64.xxh64(s"asset-$i", 42L))
      val kind = Seq("image", "audio", "video")(r.nextInt(3))
      kind match {
        case "image" =>
          val w = 16 + r.nextInt(80); val h = 12 + r.nextInt(64)
          AssetRow(i, kind, synthPng(r.nextLong(), w, h), w, h, 0, 0)
        case "audio" =>
          val rate = 8000 * (1 + r.nextInt(2)) // 8k / 16k
          val samples = 400 + r.nextInt(1600)
          AssetRow(i, kind, synthWav(r.nextLong(), rate, samples), 0, 0, rate, 0)
        case _ =>
          val payload = Array.fill(64 + r.nextInt(192))((r.nextLong() & 0xff).toByte)
          AssetRow(i, kind, payload, 640, 480, 0, 1 + r.nextInt(600))
      }
    }
  }

  /** Feature table + per-kind stats — the query surface entry. */
  def featureStats(spark: SparkSession, n: Long): DataFrame = {
    extractFeatures(synthAssets(spark, n)).toDF()
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_assets"),
        sum(when(col("decoded"), 1L).otherwise(0L)).as("n_decoded"),
        sum(col("byte_len")).as("sum_bytes"),
        countDistinct(col("sha")).as("n_distinct_payloads"),
        sum(size(col("frame_ids"))).cast("long").as("sum_sampled_frames"),
        max(col("thumb_w")).as("max_thumb_w"))
      .orderBy("kind")
  }
}
