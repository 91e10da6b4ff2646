package graft.html

/** All per-thread scratch state of the extraction kernel in ONE object,
  * fetched with a SINGLE ThreadLocal.get per document and passed down
  * (r6b). The kernel previously kept one ThreadLocal per scratch buffer
  * and `normalize` looked its buffer up per BLOCK — on Spark executor
  * threads (long ThreadLocalMap probe chains from the framework's own
  * ThreadLocals) those lookups alone were ~5% of the extract-stage
  * profile.
  *
  * Reuse contract (same as the old per-buffer ThreadLocals): every
  * buffer is fully consumed within one kernel call — block text and
  * output text are copied out as Strings before the next document —
  * and kernel calls never interleave on one thread.
  *
  * Buffers grow monotonically to the largest document a thread has
  * seen, bounded by the kernel's own guards (MaxDocBytes for the input
  * side, MaxOutChars for the output builder).
  */
final class KernelScratch {
  /** normalize's flat in/out array (input copy + output region). */
  var normBuf: Array[Char] = new Array[Char](16 * 1024)
  /** BlockSink's current-block flat text accumulator. */
  var sinkBuf: Array[Char] = new Array[Char](8 * 1024)
  /** Extractor's output accumulator. */
  val outText: java.lang.StringBuilder = new java.lang.StringBuilder(8 * 1024)
  /** Tokenizer's multi-segment text fallback builder (entities, CDATA
    * splices) — previously a default-capacity builder allocated per
    * document, growing by byte[] copies on entity-heavy docs. */
  val tokText: java.lang.StringBuilder = new java.lang.StringBuilder(4 * 1024)
}

object KernelScratch {
  private val tl = new ThreadLocal[KernelScratch] {
    override def initialValue(): KernelScratch = new KernelScratch
  }
  def get(): KernelScratch = tl.get()
}
