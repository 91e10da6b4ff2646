package graft.extract

/** The reference's query modes as a typed ADT instead of prompt strings
  * (reference: 'OCR: ' / 'OCR with format: ' / box / color prefixes,
  * GOT/demo/run_ocr_2.0.py:73-97). Plan construction replaces prompt
  * assembly (SURVEY.md §3).
  */
sealed trait ExtractMode { def name: String }
object ExtractMode {
  /** Plain content extraction ('OCR: '). */
  case object Plain extends ExtractMode { val name = "plain" }
  /** Structure-preserving extraction ('OCR with format: '): headings,
    * list markers, \begin{tabular} tables — shaped so the reference's
    * category-split regexes (eval_ocr.py:39-41) apply to the output. */
  case object Format extends ExtractMode { val name = "format" }
  /** Region extraction: per-mille byte window [x1, x2) of the document,
    * the 1-D analog of the reference's 0-1000-normalized pixel box
    * (run_ocr_2.0.py:78-91, same floor((x*1000)/w) rounding). */
  final case class Box(x1: Int, x2: Int) extends ExtractMode { val name = "box" }
  /** Style-restricted extraction: keep blocks whose class or inline
    * style matches the color (reference '[red] OCR: ', :93-97). */
  final case class Color(color: String) extends ExtractMode { val name = "color" }
  /** Chunked extraction + ordered reassembly (reference dynamic_preprocess
    * multi-crop, run_ocr_2.0_crop.py:57-95); output ≡ Plain by the
    * chunk→reassemble identity property. */
  case object MultiCrop extends ExtractMode { val name = "multicrop" }

  /** Parse the golden table's (mode, mode_args-json) encoding. Only the
    * narrow arg shapes the generator emits are supported; anything else
    * falls back to Plain. */
  def parse(mode: String, argsJson: String): ExtractMode = mode match {
    case "format"    => Format
    case "multicrop" => MultiCrop
    case "box" =>
      val nums = "-?\\d+".r.findAllIn(Option(argsJson).getOrElse("")).map(_.toInt).toList
      nums match {
        case x1 :: x2 :: _ => Box(x1, x2)
        case _             => Plain
      }
    case "color" =>
      val c = "\"color\"\\s*:\\s*\"([^\"]+)\"".r
        .findFirstMatchIn(Option(argsJson).getOrElse("")).map(_.group(1))
      c.map(Color(_)).getOrElse(Plain)
    case _ => Plain
  }

  /** Per-mille window → byte window [from, until). Shared by engine and
    * generator so the rounding contract has exactly one definition
    * (floor integer division, reference int(x/w*1000) semantics). */
  def byteWindow(docLen: Long, x1: Int, x2: Int): (Long, Long) =
    ((x1.toLong * docLen) / 1000L, (x2.toLong * docLen) / 1000L)
}
