package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.Dedup

/** The mega-bucket caps in Dedup are a silent coverage bound unless
  * disclosed — these pin that DedupJob turns each generator's drops
  * into a metrics-table row with the exact counts. */
class DedupJobSpec extends SparkSpec {

  import spark.implicits._

  private def metricsRow(root: String) =
    spark.read.parquet(s"$root/dedup_metrics").collect().head

  test("simhash run discloses dropped mega-buckets in the metrics table") {
    val root = tmpDir("graft-dedup-")
    // 100 identical docs share all four 16-bit band keys → 4 mega
    // buckets of 100 (doc, band) members each, all dropped; one small
    // pair survives in ordinary buckets
    val template = "boilerplate footer text repeated across the whole " +
      "corpus exactly the same every time with many words"
    val other = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs = ((1L to 100L).map(i => (i, template)) ++
      Seq((200L, other), (201L, other + " phi"))).toDF("doc_id", "text")
    val res = DedupJob.runObserved(spark, root, "simhash",
      obs => Dedup.simhashPairs(docs, "text", "doc_id",
        maxHamming = 10, stats = Some(obs)))
    assert(res.outputRows == 1L)
    assert(res.megaBucketsDropped == 4L)
    assert(res.docsInMegaBuckets == 400L)
    val row = metricsRow(root)
    assert(row.getAs[String]("operator") == "simhash")
    assert(row.getAs[Long]("mega_buckets_dropped") == 4L)
    assert(row.getAs[Long]("docs_in_mega_buckets") == 400L)
  }

  test("embedding near-dup run discloses its occupancy drops") {
    val root = tmpDir("graft-dedup-")
    val mega = (1L to 300L).map(i => (i, "mega", Array(1.0f, 0.0f)))
    val small = Seq((400L, "ok", Array(0.6f, 0.8f)),
      (401L, "ok", Array(0.6f, 0.81f)))
    val df = (mega ++ small).toDF("vec_id", "label", "embedding")
    val res = DedupJob.runObserved(spark, root, "embedding",
      obs => Dedup.embeddingNearDups(df, "embedding", "vec_id", "label",
        threshold = 0.9, stats = Some(obs)))
    assert(res.outputRows == 1L)
    assert(res.buckets == 2L)
    assert(res.megaBucketsDropped == 1L)
    assert(res.docsInMegaBuckets == 300L)
    assert(metricsRow(root).getAs[Long]("docs_in_mega_buckets") == 300L)
  }

  test("runSimhashDedup writes the cluster drop list and its metrics row") {
    val root = tmpDir("graft-dedup-")
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega " +
      "one two three four five six seven eight nine ten"
    // this spec pins the JOB plumbing (drop list written, keeper kept,
    // metrics row) — the ≤3-bit near-dup semantics are pinned by the
    // planted-fixture spec. d2/d3 differ from d1 only in whitespace and
    // case, so their canonical forms collide (hamming 0 — found at the
    // default budget in every band); unrelated d9 survives
    val docs = Seq(
      ("d1", base), ("d2", base.replace(" omega", "   OMEGA")),
      ("d3", "  " + base.replace("alpha", "ALPHA") + " "),
      ("d9", "completely different unrelated content about other things " +
        "entirely with many distinct words in it")).toDF("doc_id", "text")
    val res = DedupJob.runSimhashDedup(spark, root, docs, "text", "doc_id")
    val drops = spark.read.parquet(s"$root/dedup_drops")
      .collect().map(_.getString(0)).toSet
    assert(drops == Set("d2", "d3"), s"keeper d1 + unrelated d9 survive, got $drops")
    assert(res.outputRows == 2L, "drop count reported as output_rows")
    assert(metricsRow(root).getAs[String]("operator") == "simhash-cluster-dedup")
  }

  test("jaccard run discloses accumulator-counted drops (full membership)") {
    val root = tmpDir("graft-dedup-")
    // 70 identical docs (> the 64 cap) collide in all 4 minhash bands →
    // 4 dropped groups of 70 — the drain must report 70, not the
    // truncated 65-member peek; a distinct near-dup pair still verifies
    val template = (1 to 30).map(i => s"tmpl$i").mkString(" ")
    val pairText = (1 to 30).map(i => s"pair$i").mkString(" ")
    val docs = ((1L to 70L).map(i => (i, template)) ++
      Seq((200L, pairText), (201L, pairText + " tail"))).toDF("doc_id", "text")
    val res = DedupJob.runJaccard(spark, root, "jaccard",
      acc => Dedup.ngramJaccardPairs(docs, "text", "doc_id",
        n = 3, threshold = 0.5, stats = Some(acc)))
    assert(res.outputRows == 1L)
    assert(res.megaBucketsDropped == 4L)
    assert(res.docsInMegaBuckets == 280L, "true membership, not the peek cap")
    assert(res.buckets == -1L, "bucket totals not tracked on this path")
    assert(metricsRow(root).getAs[Long]("mega_buckets_dropped") == 4L)
  }
}
