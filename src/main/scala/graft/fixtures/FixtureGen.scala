package graft.fixtures

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Writes the frozen fixture parquets under `<repo>/fixtures/` that give
  * the non-SQL-expressible queries a hard DuckDB oracle
  * (`read_parquet('<abs path>')` in SparkEntry.oracleSql):
  *
  *  - `golden_extract_multi.parquet` — the flagship-extraction golden
  *    at BOTH scales (an `n_convs` column tags the 200-conv slice for
  *    sf0.001/sf0.01 and the 1000-conv slice for sf0.1; the q15/q16
  *    oracles select by it): eligible rows + expected (payload_kind,
  *    extracted_text, n_spans), computed FROM THE GENERATOR's
  *    structural knowledge (TranscriptGen composes payloads from the
  *    golden content), never by running the extractor — so the driver
  *    compare proves extractor == golden every round, the engine analog
  *    of the reference's golden-set pinning
  *    (IngestQueryTest.java:110-123).
  *  - `media_{meta,features,frames,resize}_multi.parquet` — expected
  *    outputs of the multimodal operators at BOTH asset scales (an
  *    `n_assets` column tags the 500-asset slice for sf0.001/sf0.01
  *    and the 2000-asset slice for sf0.1), derived from
  *    FakeCodec.synth's PARAMETERS (kind, dims, payload RNG),
  *    independent of the header-decode/slice code paths under test.
  *
  * Regenerate with: MAIN=graft.fixtures.FixtureGen tools/run_verify.sh
  * (args ignored). Fixture changes must be deliberate — they redefine
  * the frozen contract, like editing a golden file.
  */
object FixtureGen {

  val FixtureDir: String = graft.RepoRoot.fixtures

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-fixture-gen")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(FixtureDir))
    writeSingle(goldenExtractMulti(spark),
      s"$FixtureDir/golden_extract_multi.parquet")
    writeSingle(neardupDocs(spark), NearDupDocsPath)
    writeSingle(neardupFastDocs(spark), NearDupFastDocsPath)
    writeSingle(simhashTemplateDocs(spark), SimhashTemplatesPath)
    def multi(f: (SparkSession, Long) => DataFrame): DataFrame = {
      import org.apache.spark.sql.functions.lit
      // synthParams is deterministic per id, so the 2000-asset table
      // supersets the 500-asset one; the tag column lets the q34-q36 /
      // q40 oracles select the slice matching the sf under test (the
      // same scheme as golden_extract_multi)
      f(spark, 500L).withColumn("n_assets", lit(500))
        .unionByName(f(spark, 2000L).withColumn("n_assets", lit(2000)))
    }
    writeSingle(multi(mediaMeta), s"$FixtureDir/media_meta_multi.parquet")
    writeSingle(multi(mediaFeatures),
      s"$FixtureDir/media_features_multi.parquet")
    writeSingle(multi(mediaFrames), s"$FixtureDir/media_frames_multi.parquet")
    writeSingle(multi(mediaResize), s"$FixtureDir/media_resize_multi.parquet")
    spark.stop()
  }

  /** The sf0.01 extraction-fixture config (SparkEntry.nConvsFor). */
  val Sf001Config: TranscriptGen.GenConfig = TranscriptGen.GenConfig(nConvs = 200)

  /** The sf0.1 extraction-fixture config — goldens are frozen at BOTH
    * scales so the north-star extraction path is oracle-checked at 10×
    * the driver gate, same as every data-derived query (round-4
    * verdict, Missing #3). */
  val Sf01Config: TranscriptGen.GenConfig = TranscriptGen.GenConfig(nConvs = 1000)

  /** Replicates Selection.ingest on generated Turn values: watermark,
    * role/tool predicates, and the (case_type, role) allow-list. Kept in
    * plain Scala so the fixture is computed WITHOUT the operators under
    * test. */
  def eligible(t: graft.model.Turn): Boolean =
    t.text != null &&
      t.ts.after(TranscriptGen.WatermarkTs) &&
      t.role != "system" &&
      (t.tool == null || t.tool != "internal") &&
      graft.pipeline.AllowList.pairs.contains((t.conv_id.takeRight(2), t.role))

  /** Expected span count from the golden text's structure: the
    * generator emits one single-line block per paragraph / PDF line /
    * plain payload, so spans == newline-separated lines. */
  def expectedSpans(goldenText: String): Int =
    if (goldenText.isEmpty) 0 else goldenText.count(_ == '\n') + 1

  def goldenExtract(spark: SparkSession,
      cfg: TranscriptGen.GenConfig = Sf001Config): DataFrame = {
    import spark.implicits._
    spark.range(0, cfg.nConvs.toLong)
      .flatMap { i =>
        TranscriptGen.turnsForConv(cfg, i).collect {
          case (t, g) if eligible(t) =>
            (g.conv_id, g.turn_idx, g.payload_kind, g.extracted_text,
              expectedSpans(g.extracted_text))
        }
      }
      .toDF("conv_id", "turn_idx", "payload_kind", "extracted_text", "n_spans")
  }

  /** Both scales in one fixture, tagged by `n_convs` — the q15/q16
    * oracles select the slice whose tag matches the sf under test (the
    * events row count distinguishes the dirs inside pure SQL). */
  def goldenExtractMulti(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions.lit
    goldenExtract(spark, Sf001Config)
      .withColumn("n_convs", lit(Sf001Config.nConvs))
      .unionByName(goldenExtract(spark, Sf01Config)
        .withColumn("n_convs", lit(Sf01Config.nConvs)))
  }

  // --- planted SimHash near-dups ------------------------------------------

  val NearDupDocsPath = s"$FixtureDir/neardup_docs.parquet"

  /** Corpus with PLANTED near-duplicates at the operator's real
    * operating regime (Hamming ≤ 3 of 64 simhash bits): 300 base docs of
    * 60-123 random vocab tokens, and for every even-indexed base a
    * variant with exactly one token substituted, accepted only when the
    * substitution lands the pair at Hamming distance 1..3 (one token in
    * a ~90-token doc usually flips 0-6 bits; the accept-reject makes the
    * planted distance exact and deterministic). The synthetic testdata
    * has no true near-dups — q30's maxHamming=16 run verifies plumbing
    * on it, q47 verifies the ≤3-bit semantics the operator exists for,
    * against this frozen corpus (the DuckDB oracle recomputes simhash
    * from the text independently; the generator's use of the kernel only
    * SHAPES the data, it decides no expected value).
    *
    * Texts are lowercase single-space ASCII, so normText is the identity
    * and the planted distances are exactly what the query sees.
    */
  def neardupDocs(spark: SparkSession): DataFrame = {
    import spark.implicits._
    import org.apache.spark.unsafe.types.UTF8String
    def sim(text: String): Long =
      graft.functions.HashKernels.simhash64(UTF8String.fromString(text))
    // 65,536-word vocab: a small shared vocab (512) makes per-bit token
    // hash distributions skew the same way in EVERY doc — simhash bands
    // then cluster into mega-buckets (99 docs on one 16-bit key observed)
    // and unrelated docs land within 3 bits of each other; 64k words
    // decorrelate the signatures so the planted pairs are the ONLY ≤3-bit
    // neighbors and band occupancy stays tiny
    val vocab = Array.tabulate(65536)(i => f"w$i%04x")
    def word(h: Long): String = vocab((h & 0xffff).toInt)
    val rows = (0 until 300).flatMap { i =>
      val len = 60 + (mix(1000L + i) & 63).toInt
      val base = Array.tabulate(len)(j => word(mix(i * 7919L + j)))
      val baseText = base.mkString(" ")
      val baseRow = (f"b$i%03d", baseText)
      if (i % 2 != 0) Seq(baseRow)
      else {
        val h0 = sim(baseText)
        val variant = (0 until 64).iterator.flatMap { s =>
          val pos = ((mix(i * 104729L + s) >>> 8) % len).toInt
          val repl = word(mix(i * 15485863L + s))
          if (repl == base(pos)) Iterator.empty
          else {
            val v = base.clone(); v(pos) = repl
            val t = v.mkString(" ")
            val d = java.lang.Long.bitCount(h0 ^ sim(t))
            if (d >= 1 && d <= 3) Iterator((f"v$i%03d", t)) else Iterator.empty
          }
        }.take(1).toSeq
        baseRow +: variant
      }
    }
    rows.toDF("doc_id", "text")
  }

  // --- planted fast-minhash near-dups -------------------------------------

  val NearDupFastDocsPath = s"$FixtureDir/neardup_fast_docs.parquet"

  /** Planted near-dup corpus for the PRODUCTION-CPU dedup path
    * (`ngramJaccardPairs(fastMinhash = true, hashShingles = true)`,
    * q57): 300 base docs from the 64k vocab (seed constants differ from
    * [[neardupDocs]], so the corpora are distinct), and for every
    * even-indexed base a one-token-substituted variant accepted only
    * when (a) its distinct-3-gram Jaccard with the base is ≥ 0.7 —
    * structurally guaranteed at these lengths, checked anyway — and
    * (b) base and variant SHARE at least one xxhash64 minhash BAND KEY,
    * so every planted pair is certainly an LSH candidate under the fast
    * hash family. That second condition is what makes the query
    * oracle-able: MinHash banding is probabilistic (a 0.93-Jaccard pair
    * misses all 4 bands with p ≈ 10⁻⁴ per substitution draw), so
    * without the accept-reject the DuckDB side — which cannot compute
    * xxhash64 — could not know the engine's candidate set; with it,
    * engine output == ALL pairs at Jaccard ≥ 0.7, which DuckDB
    * brute-forces from text alone (the corpus is 450 docs; cross pairs
    * sit at Jaccard ≈ 0). The banding/signature arithmetic here is
    * Spark's own XxHash64Function — the kernel only SHAPES the data;
    * every expected value is recomputed from text by the oracle.
    */
  def neardupFastDocs(spark: SparkSession): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    // exactly TextFunctions.minhashSigFromTokensFast: component i of the
    // signature is min over distinct tokens of xxhash64(i, tok)
    def xxTok(i: Int, tok: String): Long =
      XxHash64Function.hash(UTF8String.fromString(tok), StringType,
        XxHash64Function.hash(Int.box(i), IntegerType, 42L))
    def fastBandKeys(toks: Seq[String]): Array[Long] = {
      val distinct = toks.distinct
      val sig = Array.tabulate(16)(i => distinct.map(t => xxTok(i, t)).min)
      // exactly TextFunctions.bandKeysFromSigFast: xxhash64 over the
      // band's 4 signature components
      Array.tabulate(4) { b =>
        var h = 42L
        var r = 0
        while (r < 4) {
          h = XxHash64Function.hash(Long.box(sig(b * 4 + r)), LongType, h)
          r += 1
        }
        h
      }
    }
    def grams3(ts: Array[String]): Set[String] =
      (0 to ts.length - 3).map(k => s"${ts(k)} ${ts(k + 1)} ${ts(k + 2)}").toSet
    def jac(a: Set[String], b: Set[String]): Double = {
      val inter = (a & b).size.toDouble
      val uni = a.size + b.size - inter
      if (uni > 0) inter / uni else 0.0
    }
    val vocab = Array.tabulate(65536)(i => f"w$i%04x")
    def word(h: Long): String = vocab((h & 0xffff).toInt)
    val rows = (0 until 300).flatMap { i =>
      val len = 60 + (mix(2000L + i) & 63).toInt
      val base = Array.tabulate(len)(j => word(mix(i * 7927L + j)))
      val baseRow = (f"b$i%03d", base.mkString(" "))
      if (i % 2 != 0) Seq(baseRow)
      else {
        val baseBands = fastBandKeys(base.toSeq)
        val baseGrams = grams3(base)
        val variant = (0 until 64).iterator.flatMap { s =>
          val pos = ((mix(i * 104717L + s) >>> 8) % len).toInt
          val repl = word(mix(i * 15485917L + s))
          if (repl == base(pos)) Iterator.empty
          else {
            val v = base.clone(); v(pos) = repl
            val vb = fastBandKeys(v.toSeq)
            val sharesBand = (0 until 4).exists(b => vb(b) == baseBands(b))
            val j = math.floor(jac(baseGrams, grams3(v)) * 10000 + 0.5) / 10000
            if (sharesBand && j >= 0.7) Iterator((f"v$i%03d", v.mkString(" ")))
            else Iterator.empty
          }
        }.take(1).toSeq
        baseRow +: variant
      }
    }
    rows.toDF("doc_id", "text")
  }

  // --- planted simhash template families ----------------------------------

  val SimhashTemplatesPath = s"$FixtureDir/simhash_templates.parquet"

  /** Template-family corpus for the q30 banded-simhash operating point
    * at maxHamming = 8 (boilerplate/template cluster discovery — the
    * regime between q47's ≤3-bit guarantee and random noise): 40
    * families of up to 6 members each, every member a 1-3-token
    * substitution of the family base accepted only within Hamming ≤ 4
    * of the base, so ALL intra-family pairs sit at ≤ 8 (XOR-popcount
    * triangle inequality) while cross-family pairs sit ~32 bits apart.
    * Pairs at ≤3 are pigeonhole-guaranteed candidates; 4..8-bit pairs
    * are candidates only when some 16-bit band is untouched — the
    * oracle mirrors the banding exactly (simhashPairsSql), so both
    * sides agree pair-for-pair without needing guaranteed recall. */
  def simhashTemplateDocs(spark: SparkSession): DataFrame = {
    import spark.implicits._
    import org.apache.spark.unsafe.types.UTF8String
    def sim(text: String): Long =
      graft.functions.HashKernels.simhash64(UTF8String.fromString(text))
    val vocab = Array.tabulate(65536)(i => f"w$i%04x")
    def word(h: Long): String = vocab((h & 0xffff).toInt)
    val rows = (0 until 40).flatMap { t =>
      val len = 70 + (mix(5000L + t) & 31).toInt
      val base = Array.tabulate(len)(j => word(mix(t * 6007L + j)))
      val baseText = base.mkString(" ")
      val h0 = sim(baseText)
      val members = (1 until 6).flatMap { m =>
        val nSubs = 1 + (m % 3)
        (0 until 256).iterator.flatMap { s =>
          val v = base.clone()
          (0 until nSubs).foreach { q =>
            val pos = ((mix(t * 131071L + m * 512L + s * 8L + q) >>> 8) % len).toInt
            v(pos) = word(mix(t * 179424673L + m * 1024L + s * 8L + q))
          }
          val text = v.mkString(" ")
          val d = java.lang.Long.bitCount(h0 ^ sim(text))
          if (d >= 1 && d <= 4) Iterator((f"t$t%02d_m$m", text))
          else Iterator.empty
        }.take(1).toSeq
      }
      (f"t$t%02d_m0", baseText) +: members
    }
    rows.toDF("doc_id", "text")
  }

  // --- multimodal expectations from synth parameters ---------------------

  /** SplitMix64 — must match Multimodal.FakeCodec.mix (public-domain
    * constants; duplicated here so the fixture derivation reads the
    * asset RECIPE, not the codec under test). */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  final case class SynthParams(id: Long, kind: String, a: Int, b: Int,
      nPayload: Int)

  /** The asset recipe of FakeCodec.synth(id) (Multimodal.scala). */
  def synthParams(id: Long): SynthParams = {
    val kind = (id % 3) match {
      case 0 => "image"; case 1 => "audio"; case _ => "video"
    }
    val (a, b, n) = kind match {
      case "image" =>
        val w = 16 + (mix(id) & 0x3f).toInt
        val h = 16 + (mix(id + 1) & 0x3f).toInt
        (w, h, w * h)
      case "audio" =>
        val sr = 8000 + ((mix(id) & 0x3) * 8000).toInt
        val nn = 256 + (mix(id + 1) & 0xff).toInt
        (sr, nn, nn)
      case _ =>
        val w = 8 + (mix(id) & 0xf).toInt
        val frames = 4 + (mix(id + 1) & 0x7).toInt
        (w, frames, w * w * frames)
    }
    SynthParams(id, kind, a, b, n)
  }

  private val N = 500L

  def mediaMeta(spark: SparkSession, n: Long = N): DataFrame = {
    import spark.implicits._
    spark.range(0, n).map { id =>
      val p = synthParams(id)
      p.kind match {
        case "image" =>
          (p.id, p.kind, p.a, p.b, 0, 1, p.nPayload, true)
        case "audio" =>
          (p.id, p.kind, 0, 0, p.a, p.b, p.nPayload, true)
        case _ =>
          (p.id, p.kind, p.a, p.a, 0, p.b, p.nPayload, true)
      }
    }.toDF("asset_id", "kind", "width", "height", "sample_rate",
      "n_frames", "payload_bytes", "valid")
  }

  def mediaFeatures(spark: SparkSession, n: Long = N): DataFrame = {
    import spark.implicits._
    spark.range(0, n).map { id =>
      val p = synthParams(id)
      val hist = new Array[Int](32)
      var i = 0
      while (i < p.nPayload) {
        hist(((mix(id * 1000003L + i) & 0xff).toInt) >>> 3) += 1
        i += 1
      }
      val total = math.max(1, p.nPayload).toFloat
      val f = hist.map(_ / total)
      // same fold shape as Ann.dot: left-to-right accumulate
      var dot = 0.0
      var j = 0
      while (j < f.length) { dot += f(j).toDouble * f(j).toDouble; j += 1 }
      (p.id, p.kind, math.floor(dot * 10000 + 0.5) / 10000)
    }.toDF("asset_id", "kind", "feat_norm2")
  }

  def mediaFrames(spark: SparkSession, n: Long = N): DataFrame = {
    import spark.implicits._
    spark.range(0, n).flatMap { id =>
      val p = synthParams(id)
      if (p.kind != "video") Iterator.empty
      else (0 until p.b by 2).iterator.map(f => (p.id, f, p.a * p.a))
    }.toDF("asset_id", "frame_idx", "frame_bytes")
  }

  def mediaResize(spark: SparkSession, n: Long = N): DataFrame = {
    import spark.implicits._
    spark.range(0, n).flatMap { id =>
      val p = synthParams(id)
      if (p.kind != "image") Iterator.empty
      else Iterator((p.id, p.a / 2, p.b / 2, (p.a / 2) * (p.b / 2)))
    }.toDF("asset_id", "width", "height", "payload_bytes")
  }

  /** Write a DataFrame as ONE parquet FILE at `dest` (stable name for
    * the oracle's read_parquet). */
  def writeSingle(df: DataFrame, dest: String): Unit = {
    val tmp = dest + ".tmpdir"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    import scala.jdk.CollectionConverters._
    val ls = Files.list(Paths.get(tmp))
    val part =
      try ls.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet"))
        .getOrElse(sys.error(s"no parquet part written for $dest"))
      finally ls.close()
    Files.move(part, Paths.get(dest), StandardCopyOption.REPLACE_EXISTING)
    // clean the temp dir
    val w = Files.walk(Paths.get(tmp))
    try w.sorted(java.util.Comparator.reverseOrder())
      .iterator().asScala.foreach(Files.delete)
    finally w.close()
    println(s"[fixtures] wrote $dest")
  }
}
