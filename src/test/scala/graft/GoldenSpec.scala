package graft

import graft.extract.{ExtractMode, Extractor}
import graft.gen.{GoldenRow, PageRow, SynthCorpus}
import java.nio.charset.StandardCharsets.UTF_8
import org.scalatest.funsuite.AnyFunSuite

/** Golden E2E (SURVEY.md §5): byte-identical extracted text per url
  * against the jointly-generated fixture corpus — the engine-vs-label
  * discipline of the reference's eval (eval_GOT_ocr.py answer-vs-label),
  * tightened to `Array[Byte]` equality. Pure-Scala (no Spark session):
  * the kernel itself must match; the distributed paths are covered by
  * PipelineSpec.
  */
class GoldenSpec extends AnyFunSuite {

  private val nDocs = 400L
  private lazy val docs: Seq[(Seq[PageRow], Seq[GoldenRow])] =
    (0L until nDocs).map(i => SynthCorpus.docRows(i, nDocs))

  test("every golden fixture extracts byte-identically") {
    var checked = 0
    var multipage = 0
    docs.foreach { case (pages, goldens) =>
      goldens.foreach { g =>
        if (g.mode == "multipage") {
          val parts = pages.sortBy(p => p.url.split("\\?part=")(1).toInt)
          val texts = parts.map { p =>
            Extractor.extract(p.html, ExtractMode.Plain) match {
              case Right(r) => r.text
              case Left(e)  => fail(s"${p.url}: quarantined $e")
            }
          }
          val got = texts.mkString("\n").getBytes(UTF_8)
          assert(java.util.Arrays.equals(got, g.expected_text),
            s"${g.url} [multipage]\n--- got ---\n${new String(got, UTF_8)}\n--- want ---\n${new String(g.expected_text, UTF_8)}")
          multipage += 1
        } else {
          val page = pages.find(_.url == g.url).getOrElse(fail(s"missing page ${g.url}"))
          val mode = ExtractMode.parse(g.mode, g.mode_args)
          Extractor.extract(page.html, mode) match {
            case Right(r) =>
              val got = r.text.getBytes(UTF_8)
              assert(java.util.Arrays.equals(got, g.expected_text),
                s"${g.url} [${g.mode}]\n--- got ---\n${r.text}\n--- want ---\n${new String(g.expected_text, UTF_8)}")
            case Left(e) => fail(s"${g.url} [${g.mode}]: quarantined $e")
          }
        }
        checked += 1
      }
    }
    info(s"checked $checked goldens ($multipage multipage) over $nDocs docs")
    assert(checked > 300)
  }

  test("span offsets index into the original bytes, ascending, within mode coverage") {
    docs.foreach { case (pages, goldens) =>
      goldens.filter(g => g.mode != "multipage").foreach { g =>
        val page = pages.find(_.url == g.url).get
        val mode = ExtractMode.parse(g.mode, g.mode_args)
        Extractor.extract(page.html, mode).foreach { r =>
          var prevEnd = -1L
          r.spans.foreach { s =>
            assert(s.start >= 0 && s.end <= page.html.length && s.start <= s.end, s"${g.url}: bad span $s")
            assert(s.start >= prevEnd, s"${g.url}: overlapping spans")
            prevEnd = s.end
          }
        }
      }
    }
  }

  test("expected spans match engine spans for plain/format/box/color html docs") {
    docs.foreach { case (pages, goldens) =>
      goldens.filter(g => g.mode != "multipage" && g.expected_spans.nonEmpty).foreach { g =>
        val page = pages.find(_.url == g.url).get
        val mode = ExtractMode.parse(g.mode, g.mode_args)
        Extractor.extract(page.html, mode).foreach { r =>
          assert(r.spans == g.expected_spans.toVector,
            s"${g.url} [${g.mode}]: spans differ\n got: ${r.spans}\nwant: ${g.expected_spans}")
        }
      }
    }
  }

  test("hostile payloads are quarantined, never crash, and html rows never quarantine") {
    var hostile = 0
    docs.foreach { case (pages, goldens) =>
      if (goldens.isEmpty) {
        pages.foreach { p =>
          Extractor.extract(p.html, ExtractMode.Plain) match {
            case Left(_)  => hostile += 1
            case Right(_) => fail(s"${p.url}: hostile payload extracted instead of quarantined")
          }
        }
      }
    }
    assert(hostile > 0)
  }

  test("extraction is deterministic (run twice, identical)") {
    val (pages, _) = SynthCorpus.docRows(7L, nDocs)
    pages.foreach { p =>
      val a = Extractor.extract(p.html, ExtractMode.Plain)
      val b = Extractor.extract(p.html, ExtractMode.Plain)
      assert(a == b)
    }
  }
}
