package graft.extract

import graft.html.Block

/** Document chunking — the analog of the reference's multi-crop tiling
  * (`dynamic_preprocess`, GOT/demo/run_ocr_2.0_crop.py:57-95): split an
  * oversized document into 1..6 ordered segments plus one "thumbnail"
  * summary, extract per segment, reassemble by index.
  */
object Chunker {

  /** Exact port of the reference grid chooser
    * `find_closest_aspect_ratio` (run_ocr_2.0_crop.py:40-54) including
    * the `area > 0.5 * size² * i * j` tie-break, kept as a pure function
    * with unit tests (SURVEY.md §5). Not used for byte chunking (documents
    * are 1-D); retained because it defines the reference's fan-out
    * semantics and budget arithmetic.
    */
  def findClosestAspectRatio(aspectRatio: Double, targetRatios: Seq[(Int, Int)],
      width: Int, height: Int, imageSize: Int): (Int, Int) = {
    var bestDiff = Double.PositiveInfinity
    var best = (1, 1)
    val area = width.toDouble * height.toDouble
    targetRatios.foreach { ratio =>
      val target = ratio._1.toDouble / ratio._2.toDouble
      val diff = math.abs(aspectRatio - target)
      if (diff < bestDiff) { bestDiff = diff; best = ratio }
      else if (diff == bestDiff) {
        if (area > 0.5 * imageSize.toDouble * imageSize.toDouble * ratio._1 * ratio._2)
          best = ratio
      }
    }
    best
  }

  /** The (i,j) candidate grid of `dynamic_preprocess`
    * (run_ocr_2.0_crop.py:61-66): all pairs with minNum ≤ i*j ≤ maxNum,
    * sorted by area i*j (stable, insertion order of the original set
    * does not matter for the chooser which scans in sorted order). */
  def targetRatios(minNum: Int = 1, maxNum: Int = 6): Seq[(Int, Int)] = {
    val set = for {
      n <- minNum to maxNum
      i <- 1 to n
      j <- 1 to n
      if i * j <= maxNum && i * j >= minNum
    } yield (i, j)
    set.distinct.sortBy(r => r._1 * r._2)
  }

  /** Max segments per document (reference max_num=6). */
  final val MaxSegments = 6
  /** Per-segment character budget — the analog of the reference's
    * 256-token-per-tile budget scaled to text (SURVEY.md P5). */
  final val SegCharBudget = 4096
  /** Thumbnail length (chars of plain text). */
  final val ThumbnailChars = 200

  /** Split the block list into 1..6 contiguous, order-preserving
    * segments of roughly equal character mass. Reassembling the per-
    * segment extractions in index order is identical to extracting the
    * whole list (chunk→reassemble identity, property-tested). */
  def segments(blocks: Vector[Block]): Vector[Vector[Block]] = {
    if (blocks.isEmpty) return Vector(Vector.empty)
    val totalChars = blocks.map(_.text.length.toLong).sum
    val n = math.min(MaxSegments,
      math.max(1L, (totalChars + SegCharBudget - 1) / SegCharBudget)).toInt
    if (n == 1) return Vector(blocks)
    val perSeg = totalChars.toDouble / n
    val out = Vector.newBuilder[Vector[Block]]
    var cur = Vector.newBuilder[Block]
    var acc = 0L
    var emitted = 0
    blocks.foreach { b =>
      cur += b
      acc += b.text.length
      if (emitted < n - 1 && acc >= perSeg * (emitted + 1)) {
        out += cur.result(); cur = Vector.newBuilder[Block]; emitted += 1
      }
    }
    val last = cur.result()
    if (last.nonEmpty) out += last
    out.result()
  }

  /** Thumbnail = leading slice of the plain rendering (the reference
    * appends a downscaled whole-image tile; ours is a summary prefix). */
  def thumbnail(blocks: Vector[Block]): String = {
    val full = blocks.map(_.text).mkString("\n")
    if (full.length <= ThumbnailChars) full else full.substring(0, ThumbnailChars)
  }
}
