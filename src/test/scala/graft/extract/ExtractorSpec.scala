package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import graft.fixtures.TranscriptGen
import graft.fixtures.TranscriptGen.GenConfig

class PayloadSnifferSpec extends AnyFunSuite {
  test("pdf magic") {
    assert(PayloadSniffer.sniff("%PDF-1.4\n…") == "pdf")
    assert(PayloadSniffer.sniff("  \n%PDF-1.7") == "pdf")
  }
  test("html detection") {
    assert(PayloadSniffer.sniff("<!DOCTYPE html><html></html>") == "html")
    assert(PayloadSniffer.sniff("<html><body>x</body></html>") == "html")
    assert(PayloadSniffer.sniff("<p>hello</p>") == "html")
    assert(PayloadSniffer.sniff("<div class=\"a\">x</div>") == "html")
  }
  test("plain fallbacks") {
    assert(PayloadSniffer.sniff("hello world") == "plain")
    assert(PayloadSniffer.sniff("") == "plain")
    assert(PayloadSniffer.sniff(null) == "plain")
    assert(PayloadSniffer.sniff("a < b and c > d") == "plain")
    assert(PayloadSniffer.sniff("<unknown>tag soup") == "plain")
  }
}

class HtmlDomSpec extends AnyFunSuite {
  test("entity decoding") {
    assert(HtmlDom.decodeEntities("a &amp; b &lt;c&gt; &quot;d&quot;") ==
      "a & b <c> \"d\"")
    assert(HtmlDom.decodeEntities("&#65;&#x42;") == "AB")
    assert(HtmlDom.decodeEntities("&nbsp;x") == " x")
    assert(HtmlDom.decodeEntities("5 &unknown; &") == "5 &unknown; &")
  }
  test("basic tree structure") {
    val root = HtmlDom.parse("<div><p>one</p><p>two</p></div>")
    val div = root.children.head.asInstanceOf[HtmlDom.Element]
    assert(div.tag == "div" && div.children.length == 2)
  }
  test("script and comments are not parsed as markup") {
    val html = "<body><script>if (1 < 2) { x(\"<p>\"); }</script>" +
      "<!-- <p>not me</p> --><p>real</p></body>"
    assert(HtmlExtractor.blocks(HtmlDom.parse(html)).map(_.text) ==
      Vector("real"))
  }
  test("unclosed tags recover") {
    val html = "<body><p>first para<p>second para</body>"
    val bs = HtmlExtractor.blocks(HtmlDom.parse(html))
    assert(bs.map(_.text) == Vector("first para", "second para"))
  }
  test("attributes with entities and bare values") {
    val root = HtmlDom.parse("<a href=\"/x?a=1&amp;b=2\" class=btn>go</a>")
    val a = root.children.head.asInstanceOf[HtmlDom.Element]
    assert(a.attrs("href") == "/x?a=1&b=2" && a.attrs("class") == "btn")
  }
}

class HtmlExtractorSpec extends AnyFunSuite {
  test("empty body extracts nothing") {
    assert(HtmlExtractor.extract("<html><body></body></html>") == "")
  }
  test("all-boilerplate page extracts nothing") {
    val html = "<html><body><nav><a href=\"/\">home</a> <a href=\"/b\">b</a>" +
      "</nav><footer>short footer text here</footer></body></html>"
    assert(HtmlExtractor.extract(html) == "")
  }
  test("content paragraph survives, link list does not") {
    val para = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val html = s"<body><ul><li><a href='/1'>one</a></li><li>" +
      s"<a href='/2'>two</a></li></ul><p>$para</p></body>"
    assert(HtmlExtractor.extract(html) == para)
  }
  test("heading adjacent to content is kept") {
    val para = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val html = s"<body><h2>section title here</h2><p>$para</p></body>"
    assert(HtmlExtractor.extract(html) == s"section title here\n$para")
  }
  test("entities inside content decode") {
    val html = "<body><p>tom &amp; jerry run &lt;fast&gt; today and " +
      "always forever more words here</p></body>"
    assert(HtmlExtractor.extract(html) ==
      "tom & jerry run <fast> today and always forever more words here")
  }
  test("high link-density long block is boilerplate") {
    val links = (1 to 20).map(i => s"<a href='/$i'>link$i word$i</a>").mkString(" ")
    val html = s"<body><div>$links</div></body>"
    assert(HtmlExtractor.extract(html) == "")
  }
}

class PdfSpansSpec extends AnyFunSuite {
  private def wrap(cs: String): String =
    s"%PDF-1.4\n4 0 obj << /Length ${cs.length} >>\nstream\n$cs\nendstream\nendobj\n%%EOF"

  test("Tm/Tj lines in layout order") {
    val cs = "BT\n/F1 12 Tf\n1 0 0 1 72 700 Tm (first line) Tj\n" +
      "1 0 0 1 72 686 Tm (second line) Tj\nET"
    assert(PdfSpans.extractText(wrap(cs)) == "first line\nsecond line")
  }
  test("out-of-order emission is sorted by layout") {
    val cs = "BT 1 0 0 1 72 100 Tm (bottom) Tj 1 0 0 1 72 700 Tm (top) Tj ET"
    assert(PdfSpans.extractText(wrap(cs)) == "top\nbottom")
  }
  test("same baseline joins with space, x-ordered") {
    val cs = "BT 1 0 0 1 300 700 Tm (right) Tj 1 0 0 1 72 700 Tm (left) Tj ET"
    assert(PdfSpans.extractText(wrap(cs)) == "left right")
  }
  test("Td is relative, TD sets leading, T* advances") {
    val cs = "BT 72 700 Td (a) Tj 0 -14 TD (b) Tj T* (c) Tj ET"
    val ss = PdfSpans.spans(wrap(cs))
    assert(ss.map(_.text) == Vector("a", "b", "c"))
    assert(ss.map(_.y) == Vector(700.0, 686.0, 672.0))
  }
  test("TJ array concatenates strings, ignores kerning") {
    val cs = "BT 72 700 Td [(Hel) -120 (lo) 20 ( world)] TJ ET"
    assert(PdfSpans.extractText(wrap(cs)) == "Hello world")
  }
  test("string escapes and nested parens") {
    val cs = "BT 72 700 Td (a \\(nested\\) \\\\ b \\101) Tj ET"
    assert(PdfSpans.extractText(wrap(cs)) == "a (nested) \\ b A")
  }
  test("quote operator advances line") {
    val cs = "BT 14 TL 72 700 Td (one) Tj (two) ' ET"
    val ss = PdfSpans.spans(wrap(cs))
    assert(ss.map(_.text) == Vector("one", "two"))
    assert(ss(1).y == 686.0)
  }
  test("text outside BT/ET is ignored, dicts skipped") {
    val cs = "(stray) Tj BT << /K (v) >> 72 700 Td (kept) Tj ET"
    assert(PdfSpans.extractText(wrap(cs)) == "kept")
  }
}

/** Golden-by-construction property: the extractor must reproduce the
  * generator's known main content for every payload kind. */
class GeneratorGoldenSpec extends AnyFunSuite {
  test("extractor matches generator goldens across 50 conversations") {
    val cfg = GenConfig(nConvs = 50)
    var checked = 0
    (0L until cfg.nConvs.toLong).foreach { ci =>
      TranscriptGen.turnsForConv(cfg, ci).foreach { case (turn, golden) =>
        val r = Extractor.extract(turn.text)
        assert(r.kind == golden.payload_kind,
          s"kind mismatch at ${turn.conv_id}/${turn.turn_idx}")
        assert(r.text == golden.extracted_text,
          s"text mismatch at ${turn.conv_id}/${turn.turn_idx} " +
            s"(${golden.payload_kind}):\n--- got:\n${r.text}\n--- want:\n${golden.extracted_text}")
        checked += 1
      }
    }
    assert(checked > 500, s"only $checked turns generated — tail too thin")
  }
  test("generation is deterministic and heavy-tailed") {
    val cfg = GenConfig(nConvs = 200)
    val lens = (0L until 200L).map(TranscriptGen.convLength(cfg, _))
    assert(lens == (0L until 200L).map(TranscriptGen.convLength(cfg, _)))
    assert(lens.max > 10 * lens.sorted.apply(100)) // tail ≫ median
  }
  test("extraction is idempotent on plain output") {
    val cfg = GenConfig(nConvs = 5)
    TranscriptGen.turnsForConv(cfg, 0L).foreach { case (turn, _) =>
      val once = Extractor.extract(turn.text).text
      assert(Extractor.extract(once).text == once)
    }
  }
}

class DepthCapSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("pathologically nested html cannot stack-overflow extraction") {
    val deep = "<div>" * 100000 + "some words appear here inside the deepest block level" + "</div>" * 100000
    val r = Extractor.extract("<html><body>" + deep + "</body></html>")
    assert(r.kind == "html") // total, no throw
  }
}
