package graft.extract

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.fixtures.TranscriptGen
import graft.fixtures.TranscriptGen.GenConfig

/** Frozen golden-file equality (FIXTURES.md §5): the committed golden
  * file pins BOTH the generator and the extractor — any drift in
  * tokenizer, thresholds, span ordering, or RNG breaks this test, which
  * is the point (SURVEY.md §7.5 risk 1: freeze extractor behavior
  * early).
  *
  * Regenerate (deliberately!) with:
  *   GRAFT_REGEN_GOLDENS=1 sbt "testOnly graft.extract.GoldenFileSpec"
  */
class GoldenFileSpec extends AnyFunSuite {

  private val cfg = GenConfig(nConvs = 8)
  private val goldenPath = Paths.get("src/test/resources/goldens/extract_v1.tsv")

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\t", "\\t").replace("\n", "\\n")

  private def render(): String = {
    val sb = new StringBuilder
    (0L until cfg.nConvs.toLong).foreach { ci =>
      TranscriptGen.turnsForConv(cfg, ci).foreach { case (turn, _) =>
        val r = Extractor.extract(turn.text)
        sb.append(turn.conv_id).append('\t').append(turn.turn_idx)
          .append('\t').append(r.kind).append('\t').append(r.nSpans)
          .append('\t').append(esc(r.text)).append('\n')
      }
    }
    sb.toString
  }

  test("extractor output matches the committed golden file byte-exactly") {
    val actual = render()
    if (sys.env.contains("GRAFT_REGEN_GOLDENS")) {
      Files.createDirectories(goldenPath.getParent)
      Files.write(goldenPath, actual.getBytes(StandardCharsets.UTF_8))
      succeed
    } else {
      assert(Files.exists(goldenPath),
        s"golden missing — run with GRAFT_REGEN_GOLDENS=1 to create")
      val want = new String(Files.readAllBytes(goldenPath), StandardCharsets.UTF_8)
      val aLines = actual.linesIterator.toVector
      val wLines = want.linesIterator.toVector
      assert(aLines.length == wLines.length,
        s"row count drift: ${aLines.length} vs ${wLines.length}")
      aLines.zip(wLines).zipWithIndex.foreach { case ((a, w), i) =>
        assert(a == w, s"golden drift at line ${i + 1}:\n got: $a\nwant: $w")
      }
    }
  }
}
