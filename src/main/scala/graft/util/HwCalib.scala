package graft.util

import java.util.concurrent.atomic.AtomicLong

/** Hardware parallel-scaling calibration.
  *
  * Sandbox caveat for the north-rule scaling protocol (BASELINE.md): on
  * this box, per-core speed at all-core load is ~0.5x the few-core speed
  * (hypervisor SMT/turbo sharing; measured: identical single-thread work
  * 2.49s idle vs 5.06s with 31 busy cores). A real N- vs 4N-EXECUTOR
  * comparison runs on disjoint machines and does not see this. So each
  * bench round also measures a pure-CPU reference workload (xxh64 over
  * L1-resident buffers — no allocation, no shared data) at both thread
  * counts; its scaling ratio IS the hardware ceiling, and extraction
  * efficiency is reported raw AND normalized to that ceiling.
  */
object HwCalib {

  /** Aggregate hash throughput (ops/sec) with `threads` spinner threads.
    * Total work is fixed (`totalOps`), threads pull from a shared counter
    * in 64-op chunks so stragglers cannot skew the tail. */
  def throughput(threads: Int, totalOps: Long = 3_000_000L): Double = {
    val remaining = new AtomicLong(totalOps)
    val sink = new AtomicLong(0L) // defeat dead-code elimination
    val t0 = System.nanoTime()
    val ts = (1 to threads).map { _ =>
      val t = new Thread(() => {
        val buf = new Array[Byte](16 * 1024) // L1-resident, per-thread
        var acc = 0L
        var chunk = remaining.addAndGet(-64L)
        while (chunk + 64L > 0L) {
          var i = 0
          val todo = math.min(64L, chunk + 64L).toInt
          while (i < todo) { acc ^= Hash64.xxh64(buf, i); i += 1 }
          chunk = remaining.addAndGet(-64L)
        }
        sink.addAndGet(acc)
      })
      t.setDaemon(true); t.start(); t
    }
    ts.foreach(_.join())
    val sec = (System.nanoTime() - t0) / 1e9
    totalOps / sec
  }

  /** Best-of-3 throughput at `threads`. */
  def calibrate(threads: Int): Double =
    (1 to 3).map(_ => throughput(threads)).max
}
