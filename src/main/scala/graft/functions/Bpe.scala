package graft.functions

import graft.util.Checkpoints
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding merge learning — the tokenizer-training
  * stage of a pretraining data pipeline (Sennrich et al. 2016 `learn_bpe`
  * semantics: greedy argmax over adjacent-symbol pair counts, applied
  * over a frequency-weighted word vocabulary).
  *
  * Determinism: the winning pair each round is (max count, then
  * lexicographically smallest (left, right)) — a total order, so the
  * learned merge table is identical under any partitioning and matches
  * the single-threaded reference (`learnMergesLocal`) exactly. Integer
  * frequency sums make the argmax itself partitioning-proof.
  *
  * Scale shape: the vocabulary stays a distributed Dataset throughout
  * (10^9 distinct words is fine); each round is one map-side flatMap to
  * pair counts, one pair-keyed partial-aggregating shuffle, and a
  * LIMIT-1 ordered collect of a single row — never the vocabulary.
  * Mega-pairs (e.g. ("t","h") over English) are absorbed by map-side
  * combine exactly like q35's document-frequency aggregation. Lineage
  * is truncated through the shared reliable-checkpoint policy
  * ([[Checkpoints]]) every `ckptEvery` rounds, so a 10^3-merge training
  * run neither re-derives round 1 nor overflows the planner.
  */
object Bpe {

  final case class Merge(rank: Int, left: String, right: String, pair_count: Long)

  /** Greedy leftmost application of one merge to a symbol sequence. */
  def mergePair(symsIn: Seq[String], l: String, r: String): Seq[String] = {
    val syms = symsIn.toIndexedSeq
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  private def pairsOf(symsIn: Seq[String], f: Long): Iterator[((String, String), Long)] = {
    val syms = symsIn.toIndexedSeq
    if (syms.length < 2) Iterator.empty
    else (0 until syms.length - 1).iterator.map(i => ((syms(i), syms(i + 1)), f))
  }

  /** Learn up to `k` merges from a (word, freq) vocabulary DataFrame.
    * Stops early when no adjacent pair remains. */
  def learnMerges(spark: SparkSession, words: DataFrame, k: Int,
      ckptEvery: Int = 8): Seq[Merge] = {
    import spark.implicits._
    val truncate = Checkpoints.truncator(spark)
    var cur: Dataset[(Seq[String], Long)] = words
      .select(col("word").cast("string"), col("freq").cast("long"))
      .as[(String, Long)]
      .map { case (w, f) => (w.map(_.toString): Seq[String], f) }
      .cache()
    val merges = scala.collection.mutable.ArrayBuffer[Merge]()
    var r = 1
    var done = false
    while (r <= k && !done) {
      val top = cur.flatMap { case (syms, f) => pairsOf(syms, f) }
        .toDF("pair", "freq")
        .groupBy(col("pair._1").as("left"), col("pair._2").as("right"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(desc("cnt"), asc("left"), asc("right"))
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      if (top.isEmpty) done = true
      else {
        val (l, rr, c) = top.head
        merges += Merge(r, l, rr, c)
        val prev = cur
        val next0 = cur.map { case (syms, f) => (mergePair(syms, l, rr), f) }
        val next = if (r % ckptEvery == 0)
          truncate(next0.toDF()).as[(Seq[String], Long)].cache()
        else next0.cache()
        next.count() // materialize before releasing the parent
        prev.unpersist()
        cur = next
        r += 1
      }
    }
    cur.unpersist()
    merges.toSeq
  }

  /** Apply a learned merge table to one word: sequential application in
    * rank order, each merge greedy-leftmost across the word — exactly the
    * transformation `learnMerges` applied to the vocabulary while
    * learning, so encode(train_word) reproduces the trained segmentation
    * by construction. Concatenation invariant: encode(w).mkString == w. */
  def encode(w: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms: Seq[String] = w.map(_.toString)
    var i = 0
    while (i < merges.length && syms.length > 1) {
      syms = mergePair(syms, merges(i)._1, merges(i)._2)
      i += 1
    }
    syms
  }

  /** Single-threaded reference implementation (identical semantics) for
    * the spec's exact-equality check. */
  def learnMergesLocal(words: Seq[(String, Long)], k: Int): Seq[Merge] = {
    var vocab = words.map { case (w, f) => (w.map(_.toString): Seq[String], f) }
    val merges = scala.collection.mutable.ArrayBuffer[Merge]()
    var r = 1
    var done = false
    while (r <= k && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, f) =>
        pairsOf(syms, f).foreach { case (p, w) =>
          counts(p) = counts.getOrElse(p, 0L) + w
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, rr), c) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        merges += Merge(r, l, rr, c)
        vocab = vocab.map { case (syms, f) => (mergePair(syms, l, rr), f) }
        r += 1
      }
    }
    merges.toSeq
  }
}
