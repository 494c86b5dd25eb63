package graft.extract

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based extraction invariants (SURVEY.md §5.2 item 3). */
class ExtractorPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  private val word: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString).suchThat(_.nonEmpty)
  private val sentence: Gen[String] =
    Gen.nonEmptyListOf(word).map(_.mkString(" "))

  test("plain text: extraction is identity modulo outer trim") {
    check(Prop.forAll(sentence) { s =>
      val r = Extractor.extract("  " + s + " \n")
      r.kind == "plain" && r.text == s.trim
    })
  }

  test("extraction is idempotent") {
    check(Prop.forAll(sentence) { s =>
      val once = Extractor.extract(s).text
      Extractor.extract(once).text == once
    })
  }

  test("html: output words are a subsequence of source words") {
    val para: Gen[List[String]] = Gen.listOfN(15, word)
    check(Prop.forAll(para, para) { (p1, p2) =>
      val html = s"<html><body><nav><a href='/'>home link</a></nav>" +
        s"<p>${p1.mkString(" ")}</p><p>${p2.mkString(" ")}</p></body></html>"
      val out = Extractor.extract(html).text
      val srcWords = (p1 ++ p2)
      val outWords = out.split("\\s+").filter(_.nonEmpty).toList
      // every output word appears in the source paragraphs, in order
      def isSubseq(sub: List[String], sup: List[String]): Boolean = sub match {
        case Nil => true
        case h :: t => sup.dropWhile(_ != h) match {
          case Nil => false
          case _ :: rest => isSubseq(t, rest)
        }
      }
      isSubseq(outWords, srcWords)
    })
  }

  test("html with zero boilerplate extracts all content words") {
    val para: Gen[List[String]] = Gen.listOfN(20, word)
    check(Prop.forAll(para) { p =>
      val html = s"<html><body><p>${p.mkString(" ")}</p></body></html>"
      Extractor.extract(html).text == p.mkString(" ")
    })
  }

  test("entity decoding round-trips encode") {
    val special = Gen.oneOf("&", "<", ">", "\"")
    check(Prop.forAll(sentence, special) { (s, c) =>
      val encoded = c match {
        case "&" => "&amp;"; case "<" => "&lt;"
        case ">" => "&gt;"; case _ => "&quot;"
      }
      HtmlDom.decodeEntities(s + encoded) == s + c
    })
  }

  test("pdf: span count equals emitted Tj count, order independent of emission order") {
    val lineGen: Gen[List[(Int, String)]] = for {
      n <- Gen.choose(1, 8)
      ws <- Gen.listOfN(n, word)
    } yield ws.zipWithIndex.map { case (w, i) => (700 - 14 * i, w) }
    check(Prop.forAll(lineGen) { lines =>
      def pdf(ls: List[(Int, String)]): String = {
        val cs = "BT\n" + ls.map { case (y, t) =>
          s"1 0 0 1 72 $y Tm ($t) Tj"
        }.mkString("\n") + "\nET"
        s"%PDF-1.4\nstream\n$cs\nendstream"
      }
      val inOrder = PdfSpans.extractText(pdf(lines))
      val reversed = PdfSpans.extractText(pdf(lines.reverse))
      inOrder == reversed &&
        inOrder == lines.sortBy(-_._1).map(_._2).mkString("\n")
    })
  }

  test("watermark monotonicity: committed watermark never exceeds max written ts") {
    // pure property over the chunk-commit fold in ExtractionJob: for any
    // split of sorted timestamps into chunks with a failure at chunk k,
    // the final watermark is the max ts of the last committed chunk
    val tsGen = Gen.nonEmptyListOf(Gen.choose(1L, 1000000L))
    check(Prop.forAll(tsGen, Gen.choose(1, 5)) { (tss, nChunks) =>
      val sorted = tss.sorted
      val chunks = sorted.grouped(math.max(1, sorted.length / nChunks)).toList
      val failAt = chunks.length - 1
      val committed = chunks.take(failAt)
      val wm = committed.flatten.lastOption.getOrElse(0L)
      committed.flatten.forall(_ <= wm)
    })
  }
}
