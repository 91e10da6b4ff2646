package graft.functions

import org.apache.spark.util.sketch.BloomFilter

/** Shared word-5-gram overlap counting against a broadcast Bloom filter
  * of benchmark grams — the map-side core of both the batch map-only
  * decontamination (x24) and its streaming-ingest form (x28). Kept as
  * ONE function so the two paths cannot drift. */
object DecontamBloom {

  /** Number of DISTINCT word 5-grams of `text` the filter might
    * contain. FPP errs safe: may over-count (flags extra docs), never
    * misses real contamination. */
  def overlapCount(text: String, bf: BloomFilter): Long = {
    val toks = text.split(" ")
    var n = 0L
    if (toks.length >= 5) {
      val seen = scala.collection.mutable.HashSet.empty[String]
      var i = 0
      while (i + 5 <= toks.length) {
        val g = toks.slice(i, i + 5).mkString(" ")
        if (seen.add(g) && bf.mightContain(g)) n += 1
        i += 1
      }
    }
    n
  }
}
