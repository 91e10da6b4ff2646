package graft

import graft.extract.{ExtractMode, Extractor}
import graft.html.{Dom, Html5Tokenizer}
import java.io.{BufferedInputStream, DataInputStream, FileInputStream}

/** Diagnostic: per-PHASE cost split of the html kernel path over a KBench
  * dump (tokenize / DOM-blocks / full extract), single-thread, anchored
  * like KBench so the split is comparable across host states. Answers
  * "where does the html microsecond go" — the per-kind tools (KBench,
  * DiagSkew) only say html costs X total.
  *
  * Usage: runMain graft.DiagPhase <dump> <reps>
  */
object DiagPhase {
  def main(args: Array[String]): Unit = {
    val in = new DataInputStream(new BufferedInputStream(new FileInputStream(args(0)), 1 << 20))
    val docs = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    try {
      while (true) {
        val len = in.readInt()
        val b = new Array[Byte](len)
        in.readFully(b)
        docs += b
      }
    } catch { case _: java.io.EOFException => () }
    in.close()
    val html = docs.toArray.filter(b => Extractor.payloadKind(b) == "html")
    val reps = args(1).toInt
    // warmup
    (1 to 2).foreach(_ => html.foreach(b => Extractor.extract(b, ExtractMode.Plain)))
    graft.util.HwCalib.calibrate(1)
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
    final case class Rep(decNs: Long, tokNs: Long, blkNs: Long, fusedNs: Long,
        extNs: Long, anchor: Double)
    val repRows = (1 to reps).map { _ =>
      val a0 = graft.util.HwCalib.calibrate(1)
      var decNs = 0L; var tokNs = 0L; var blkNs = 0L; var fusedNs = 0L; var extNs = 0L
      var i = 0
      while (i < html.length) {
        val b = html(i)
        val td = System.nanoTime()
        Html5Tokenizer.decodeOnly(b)
        val t0 = System.nanoTime()
        val toks = Html5Tokenizer.tokenize(b)
        val t1 = System.nanoTime()
        Dom.blocks(toks)
        val t2 = System.nanoTime()
        Dom.blocksStreaming(b)
        val t25 = System.nanoTime()
        Extractor.extract(b, ExtractMode.Plain)
        val t3 = System.nanoTime()
        decNs += t0 - td; tokNs += t1 - t0; blkNs += t2 - t1
        fusedNs += t25 - t2; extNs += t3 - t25
        i += 1
      }
      val a1 = graft.util.HwCalib.calibrate(1)
      Rep(decNs, tokNs, blkNs, fusedNs, extNs, (a0 + a1) / 2)
    }
    val n = html.length
    def row(name: String, f: Rep => Long): Unit = {
      val us = med(repRows.map(r => f(r) / 1e3 / n))
      val anch = med(repRows.map(r => (f(r) / 1e9 * r.anchor) / n))
      println(f"$name%-22s avg_us=$us%8.2f  anchor_ops_per_doc=$anch%8.1f")
    }
    println(s"html docs: $n")
    row("decode only", _.decNs)
    row("tokenize", _.tokNs)
    row("dom_blocks (excl tok)", _.blkNs)
    row("fused bytes->blocks", _.fusedNs)
    row("extract full", _.extNs)
    // drift-immune A/B: fused vs (tokenize + replay) within the same rep
    val ratio = med(repRows.map(r => r.fusedNs.toDouble / (r.tokNs + r.blkNs)))
    println(f"fused/(tok+blocks) time ratio = $ratio%.3f  (lower is better)")
  }
}
