package graft

import graft.extract.{ExtractMode, Extractor}
import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, FileInputStream, FileOutputStream}

/** Spark-free single-thread kernel microbench — attributes kernel-speed
  * deltas across rounds independent of corpus mix (the two are confounded
  * in end-to-end bench numbers when the generator changes).
  *
  *   gen <file> <nDocs>   dump the generator's payloads (length-prefixed)
  *   run <file> <reps>    time Extractor.extract per payload kind
  *
  * Dumps are portable across rounds (raw bytes only), so running round
  * R's kernel over round S's dump gives the kernel×corpus 2x2.
  */
object KBench {
  def main(args: Array[String]): Unit = args(0) match {
    case "bw" =>
      // sanity probe for the DRAM-bandwidth ceiling calibration
      Seq(1, 8, 32).foreach { t =>
        val b = graft.util.HwCalib.calibrateBandwidth(t)
        println(f"bw threads=$t%2d  ${b / 1e9}%8.2f GB/s")
      }
    case "gen" =>
      val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(args(1)), 1 << 20))
      val n = args(2).toLong
      var i = 0L
      while (i < n) {
        graft.gen.SynthCorpus.docRows(i, n)._1.foreach { p =>
          out.writeInt(p.html.length); out.write(p.html)
        }
        i += 1
      }
      out.close()
    case "sum" =>
      // output-identity checksum over a dump: total extracted chars and
      // an order-sensitive FNV over every text — compare across kernel
      // changes to prove byte-identical extraction beyond the goldens
      val in = new DataInputStream(new BufferedInputStream(new FileInputStream(args(1)), 1 << 20))
      var total = 0L
      var fnv = 0xcbf29ce484222325L
      try {
        while (true) {
          val len = in.readInt()
          val b = new Array[Byte](len)
          in.readFully(b)
          Extractor.extract(b, ExtractMode.Plain) match {
            case Right(res) =>
              total += res.text.length
              var i = 0
              while (i < res.text.length) {
                fnv = (fnv ^ res.text.charAt(i)) * 0x100000001b3L; i += 1
              }
              res.spans.foreach { sp =>
                fnv = (fnv ^ sp.start) * 0x100000001b3L
                fnv = (fnv ^ sp.end) * 0x100000001b3L
              }
            case Left(reason) =>
              var i = 0
              while (i < reason.length) {
                fnv = (fnv ^ reason.charAt(i)) * 0x100000001b3L; i += 1
              }
          }
        }
      } catch { case _: java.io.EOFException => () }
      in.close()
      println(s"SUM total_chars=$total fnv=$fnv")
    case "run" =>
      val in = new DataInputStream(new BufferedInputStream(new FileInputStream(args(1)), 1 << 20))
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
      val arr = docs.toArray
      val kinds = arr.map(Extractor.payloadKind)
      val reps = args(2).toInt
      // JIT warmup: two full passes (kernel) + anchor warmup
      (1 to 2).foreach(_ => arr.foreach(b => Extractor.extract(b, ExtractMode.Plain)))
      graft.util.HwCalib.calibrate(1)
      // Host speed drifts ~2x with hypervisor burst state, so each rep is
      // ANCHORED: the xxh64 single-thread calibration runs immediately
      // around the kernel pass and the reported figure is the per-rep
      // median of docs/s ÷ anchor ops/s — drift cancels within a rep.
      val perRep = (1 to reps).map { _ =>
        val a0 = graft.util.HwCalib.calibrate(1)
        val byKind = scala.collection.mutable.Map.empty[String, (Long, Long, Long)]
        var i = 0
        while (i < arr.length) {
          val t0 = System.nanoTime()
          Extractor.extract(arr(i), ExtractMode.Plain)
          val ns = System.nanoTime() - t0
          val (n0, b0, ns0) = byKind.getOrElse(kinds(i), (0L, 0L, 0L))
          byKind(kinds(i)) = (n0 + 1, b0 + arr(i).length, ns0 + ns)
          i += 1
        }
        val a1 = graft.util.HwCalib.calibrate(1)
        (byKind.toMap, (a0 + a1) / 2)
      }
      def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
      val allKinds = perRep.flatMap(_._1.keys).distinct
      allKinds.foreach { k =>
        val avgUs = med(perRep.map { case (m, _) => val (n, _, ns) = m(k); ns / 1e3 / n })
        val perByte = med(perRep.map { case (m, _) => val (_, b, ns) = m(k); ns.toDouble / b })
        // anchored cost: kernel ns per doc × anchor ops per ns = anchor ops per doc
        val anchored = med(perRep.map { case (m, a) => val (n, _, ns) = m(k); (ns / 1e9 * a) / n })
        println(f"$k%-8s n=${perRep.head._1(k)._1}%8d  avg_us=$avgUs%9.2f  ns_per_byte=$perByte%7.2f  anchor_ops_per_doc=$anchored%9.1f")
      }
      val tot = med(perRep.map { case (m, a) =>
        val ns = m.values.map(_._3).sum; val n = m.values.map(_._1).sum
        n.toDouble / (ns / 1e9) / a
      })
      println(f"TOTAL    docs_per_anchor_op=$tot%.4f  (docs/s per hw-anchor op/s; drift-immune)")
  }
}
