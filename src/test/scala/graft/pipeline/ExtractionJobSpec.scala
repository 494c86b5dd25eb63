package graft.pipeline

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.fixtures.TranscriptGen
import graft.fixtures.TranscriptGen.GenConfig
import graft.table.{CheckpointStore, SnapshotTable}

/** End-to-end scenario tests — the engine translation of the
  * reference's integration scenarios 1-4 (SURVEY.md §5.1). */
class ExtractionJobSpec extends SparkSpec {

  private val cfg = GenConfig(nConvs = 40)

  private def freshTable(): (String, CheckpointStore) = {
    val root = tmpDir("graft-table-")
    val store = new CheckpointStore(root)
    store.seed("cs", "ingest", TranscriptGen.WatermarkTs)
    (root, store)
  }

  test("scenario 1: happy path — extract, golden equality, watermark = max ts") {
    val (root, store) = freshTable()
    val turns = TranscriptGen.dataset(spark, cfg).toDF()
    val res = ExtractionJob.run(spark, turns, root)
    assert(res.status == "COMPLETED")
    assert(res.rowsWritten > 0)

    val out = new SnapshotTable(root).read(spark)
    assert(out.count() == res.rowsWritten)

    // golden equality per (conv_id, turn_idx) via join (J3)
    val golden = TranscriptGen.goldenDataset(spark, cfg).toDF()
      .withColumnRenamed("extracted_text", "want")
      .withColumnRenamed("payload_kind", "want_kind")
    val joined = out.join(golden, Seq("conv_id", "turn_idx"))
    assert(joined.count() == res.rowsWritten, "every output row has a golden")
    val mismatches = joined
      .filter(col("extracted_text") =!= col("want") ||
        col("payload_kind") =!= col("want_kind"))
    assert(mismatches.count() == 0,
      s"golden mismatch: ${mismatches.take(2).mkString("; ")}")

    // watermark advanced to exactly max(ts) of the written rows
    // (IngestScenario1Test.java:115 analog)
    val maxTs = out.agg(max("ts")).head().getTimestamp(0)
    assert(store.read("cs", "ingest") == maxTs)

    // only eligible rows: nothing stale, no system/internal rows
    assert(out.filter(col("ts") <= lit(TranscriptGen.WatermarkTs)).count() == 0)
    assert(out.filter(col("role") === "system").count() == 0)
    assert(out.filter(col("tool") === "internal").count() == 0)
  }

  test("scenario 2: corrupt schema fails the job, watermark unchanged") {
    val (root, store) = freshTable()
    val before = store.read("cs", "ingest")
    // missing `text` column — hard failure at plan time, no commit
    val bad = TranscriptGen.dataset(spark, cfg).toDF()
      .drop("text").withColumnRenamed("role", "rle")
    val res = ExtractionJob.run(spark, bad, root)
    assert(res.status == "FAILED")
    assert(res.chunksCommitted == 0)
    assert(store.read("cs", "ingest") == before)
    assert(new SnapshotTable(root).currentSnapshotId.isEmpty)
  }

  test("scenario 3: poison payload in single chunk — FAILED, watermark unchanged, no output visible") {
    val (root, store) = freshTable()
    val before = store.read("cs", "ingest")
    val poison = udf((t: String, idx: Int) =>
      if (idx == 5) sys.error("poison payload") else t)
    val turns = TranscriptGen.dataset(spark, cfg).toDF()
      .withColumn("text", poison(col("text"), col("turn_idx")))
    val res = ExtractionJob.run(spark, turns, root, nChunks = 1)
    assert(res.status == "FAILED")
    assert(res.chunksCommitted == 0)
    assert(store.read("cs", "ingest") == before)
    // atomic pointer swap — no snapshot became visible
    assert(new SnapshotTable(root).currentSnapshotId.isEmpty)
  }

  test("scenario 4: failure in a later chunk — watermark = last committed chunk; resume completes") {
    val (root, store) = freshTable()
    val before = store.read("cs", "ingest")
    // poison only rows in the last ~quarter of the ts range
    val all = TranscriptGen.dataset(spark, cfg).toDF()
    val cut = all.filter(col("ts") > lit(TranscriptGen.WatermarkTs))
      .selectExpr("cast(ts as double) d").stat.approxQuantile("d", Array(0.9), 0.001)(0)
    val cutTs = new Timestamp((cut * 1000).toLong)
    val poison = udf((t: String, tsMs: Long) =>
      if (tsMs > cutTs.getTime) sys.error("poison late row") else t)
    val turns = all.withColumn("text",
      poison(col("text"), col("ts").cast("long") * 1000))
    val res = ExtractionJob.run(spark, turns, root, nChunks = 4)
    assert(res.status == "FAILED")
    assert(res.chunksCommitted > 0 && res.chunksCommitted < 4)
    val wmAfterFail = store.read("cs", "ingest")
    assert(wmAfterFail.after(before), "watermark advanced to last good chunk")
    assert(wmAfterFail.getTime <= cutTs.getTime + 1000)

    // resume with clean data: only uncommitted rows get processed
    val res2 = ExtractionJob.run(spark, all, root, nChunks = 4)
    assert(res2.status == "COMPLETED")
    val eligibleTotal = Selection.ingest(all, before, spark).count()
    assert(res.rowsWritten + res2.rowsWritten == eligibleTotal,
      "resume processes exactly the uncommitted remainder")
  }

  test("multi-chunk run: table view = ALL chunks, lineage has typed rows") {
    val (root, _) = freshTable()
    val turns = TranscriptGen.dataset(spark, cfg).toDF()
    val res = ExtractionJob.run(spark, turns, root, nChunks = 4)
    assert(res.status == "COMPLETED" && res.chunksCommitted == 4)
    // cumulative snapshots: read() is the union of every chunk's commit,
    // not the last delta (the --chunks 8 CLI default must not hide 7/8
    // of the data)
    val out = new SnapshotTable(root).read(spark)
    assert(out.count() == res.rowsWritten)
    // rows_read counts scanned input (pre-eligibility), not a copy of
    // rows_written
    assert(res.rowsRead > res.rowsWritten)
    // lineage rows decode as the PartitionLineage model with real bytes
    import spark.implicits._
    val lineage = spark.read.parquet(s"$root/lineage")
      .as[graft.model.PartitionLineage].collect()
    assert(lineage.nonEmpty)
    assert(lineage.forall(l => l.bytes_in > 0 && l.bytes_out > 0 &&
      l.bytes_in >= l.bytes_out && l.status == "COMMITTED"))
    assert(lineage.map(_.rows).sum == res.rowsWritten)
    assert(lineage.forall(l => l.partition_id >= 20230322 &&
      l.partition_id <= 20230501))
  }

  test("metrics write failure never masks the job status (X5 never-throw)") {
    val (root, _) = freshTable()
    // make <root>/metrics an unwritable target: a FILE in its place
    java.nio.file.Files.write(java.nio.file.Paths.get(root, "metrics"),
      "not a dir".getBytes)
    val turns = TranscriptGen.dataset(spark, GenConfig(nConvs = 5)).toDF()
    val res = ExtractionJob.run(spark, turns, root)
    assert(res.status == "COMPLETED", res.error.toString)
    assert(res.rowsWritten > 0)
  }

  test("resume with no new data completes with zero rows (empty chunks)") {
    val (root, store) = freshTable()
    val turns = TranscriptGen.dataset(spark, GenConfig(nConvs = 10)).toDF()
    val res1 = ExtractionJob.run(spark, turns, root, nChunks = 2)
    assert(res1.status == "COMPLETED" && res1.rowsWritten > 0)
    val wm = store.read("cs", "ingest")
    // second run sees nothing past the advanced watermark
    val res2 = ExtractionJob.run(spark, turns, root, nChunks = 2)
    assert(res2.status == "COMPLETED", res2.error.toString)
    assert(res2.rowsWritten == 0)
    assert(store.read("cs", "ingest") == wm, "watermark unchanged")
  }

  test("keyed events are published with the reference wire format") {
    val (root, _) = freshTable()
    val turns = TranscriptGen.dataset(spark, GenConfig(nConvs = 10)).toDF()
    val res = ExtractionJob.run(spark, turns, root)
    assert(res.status == "COMPLETED")
    val events = EventSink.readTopic(spark, root, "cs-ingest")
    assert(events.count() == res.rowsWritten)
    val r = events.filter(col("value").contains("\"payloadKind\":\"html\"")).head()
    val value = r.getString(events.columns.indexOf("value"))
    // camelCase keys + epoch-millis ts (DocumentSerializerTest analog)
    assert(value.contains("\"convId\":\"") && value.contains("\"turnIdx\":"))
    assert("\"ts\":(\\d{13})".r.findFirstIn(value).isDefined, value)
    assert(r.getString(events.columns.indexOf("key")).startsWith("conv-"))
  }

  test("delete run: lookback + last-write-wins, ingest watermark untouched") {
    val (root, store) = freshTable()
    store.seed("cs", "delete", TranscriptGen.WatermarkTs)
    val ingestWmBefore = store.read("cs", "ingest")
    val turns = TranscriptGen.dataset(spark, GenConfig(nConvs = 15)).toDF()
    // duplicate a slice to simulate re-delivery inside the window
    val tomb = turns.unionByName(turns.filter(col("turn_idx") === 0))
    val res = ExtractionJob.runDelete(spark, tomb, root)
    assert(res.status == "COMPLETED" && res.rowsWritten > 0)
    val events = EventSink.readTopic(spark, root, "cs-delete")
    // duplicates collapsed (keyed last-write-wins)
    assert(events.count() == res.rowsWritten)
    assert(events.groupBy("key", "value").count()
      .filter(col("count") > 1).count() == 0)
    // delete watermark advanced; ingest watermark untouched
    assert(store.read("cs", "delete").after(TranscriptGen.WatermarkTs))
    assert(store.read("cs", "ingest") == ingestWmBefore)
  }

  test("delete-mode lookback re-delivers the late window") {
    val wm = new Timestamp(TranscriptGen.BaseEpochMs + 10 * 86400000L)
    val turns = TranscriptGen.dataset(spark, cfg).toDF()
    val redelivered = Selection.deleteLookback(turns, wm)
    assert(redelivered.count() > 0, "lookback window is non-empty")
    val minTs = redelivered.agg(min("ts")).head().getTimestamp(0)
    // nothing older than wm - 7 days is re-delivered
    assert(minTs.getTime > wm.getTime - 7L * 86400000L)
    // and something strictly before wm IS re-delivered (the late window)
    assert(redelivered.filter(col("ts") <= lit(wm)).count() > 0)
  }

  test("rejected-rows audit is the exact complement of the allow-list") {
    val turns = TranscriptGen.dataset(spark, cfg).toDF()
    val wm = TranscriptGen.WatermarkTs
    val inSel = Selection.ingest(turns, wm, spark).count()
    val outSel = Selection.rejected(turns, wm, spark).count()
    val base = Selection.withCaseType(turns)
      .filter(col("text").isNotNull && col("role") =!= "system" &&
        (col("tool").isNull || col("tool") =!= "internal") &&
        col("ts") > lit(wm)).count()
    assert(inSel + outSel == base)
    assert(inSel > 0 && outSel > 0)
  }
}

/** The expression-based extraction path must be row-for-row identical
  * to the typed mapPartitions path. */
class ExtractExprParitySpec extends graft.SparkSpec {

  test("extraction plan never shuffles the raw payload (scale invariant)") {
    val cfg = graft.fixtures.TranscriptGen.GenConfig(nConvs = 10)
    val turns = graft.fixtures.TranscriptGen.dataset(spark, cfg).toDF()
    val eligible = Selection.ingest(turns,
      graft.fixtures.TranscriptGen.WatermarkTs, spark)
    // source → selection → extraction must be one map-side pipeline: the
    // only exchange allowed anywhere is the broadcast of the allow-list
    val plan = ExtractionPipeline.extractExpr(spark, eligible)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(2000))
    assert(plan.contains("BroadcastExchange"), plan.take(2000))
  }

  test("utf8Length == octet_length, including unpaired surrogates") {
    import spark.implicits._
    val weird = Seq("", "ascii", "café", "€ euro",
      "emoji 😀", "\ud800A", "a\udc00", "\ud800")
    val sparkBytes = weird.toDF("text")
      .select(octet_length(col("text"))).as[Int].collect().toSeq
    val ours = weird.map(ExtractionPipeline.utf8Length)
    assert(ours == sparkBytes, s"ours=$ours spark=$sparkBytes")
  }

  test("extractExpr == extract on the same eligible slice") {
    val cfg = graft.fixtures.TranscriptGen.GenConfig(nConvs = 30)
    val turns = graft.fixtures.TranscriptGen.dataset(spark, cfg).toDF()
    val eligible = Selection.ingest(turns,
      graft.fixtures.TranscriptGen.WatermarkTs, spark)
    val a = ExtractionPipeline.extract(spark, eligible).toDF()
    val b = ExtractionPipeline.extractExpr(spark, eligible).toDF()
    assert(a.count() == b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
