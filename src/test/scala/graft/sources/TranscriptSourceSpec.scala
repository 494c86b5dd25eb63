package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.fixtures.TranscriptGen
import graft.fixtures.TranscriptGen.GenConfig

class TranscriptSourceSpec extends SparkSpec {

  private val fmtOpts = Map(
    "timestampFormat" -> "yyyy-MM-dd HH:mm:ss.SSS")

  test("parquet/json/csv land on the identical pinned Turn schema and rows") {
    val cfg = GenConfig(nConvs = 12)
    val turns = TranscriptGen.dataset(spark, cfg).toDF()
    val base = tmpDir("src-")
    turns.write.parquet(s"$base/p")
    turns.write.options(fmtOpts).json(s"$base/j")
    turns.write.options(fmtOpts ++ Map("header" -> "true", "escape" -> "\""))
      .csv(s"$base/c")

    val p = TranscriptSource.read(spark, s"$base/p")
    val j = TranscriptSource.read(spark, s"$base/j", "json", fmtOpts)
    val c = TranscriptSource.read(spark, s"$base/c", "csv", fmtOpts)
    // names + types pinned (nullability legitimately differs by source —
    // file formats cannot promise non-null the way an Encoder can)
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f => (f.name, f.dataType)).toSeq
    assert(shape(p.schema) == shape(TranscriptSource.TurnSchema))
    assert(shape(j.schema) == shape(TranscriptSource.TurnSchema))
    assert(shape(c.schema) == shape(TranscriptSource.TurnSchema))
    assert(p.count() == turns.count())
    assert(p.exceptAll(j).isEmpty && j.exceptAll(p).isEmpty,
      "json round-trips row-exact")
    assert(p.exceptAll(c).isEmpty && c.exceptAll(p).isEmpty,
      "csv round-trips row-exact (multi-line payloads included)")

    // the full extraction pipeline runs identically over a JSON source
    val viaJson = graft.pipeline.ExtractionPipeline.extractExpr(spark,
      graft.pipeline.Selection.ingest(j, TranscriptGen.WatermarkTs, spark))
    val viaParquet = graft.pipeline.ExtractionPipeline.extractExpr(spark,
      graft.pipeline.Selection.ingest(p, TranscriptGen.WatermarkTs, spark))
    assert(viaJson.toDF().exceptAll(viaParquet.toDF()).isEmpty)
  }

  test("unknown format fails fast; missing columns fail loudly") {
    intercept[IllegalArgumentException] {
      TranscriptSource.read(spark, "/tmp/nope", "orc-ish")
    }
    val bad = tmpDir("src-bad-") + "/t"
    TranscriptGen.dataset(spark, GenConfig(nConvs = 2)).toDF()
      .drop("text").write.parquet(bad)
    intercept[org.apache.spark.sql.AnalysisException] {
      TranscriptSource.read(spark, bad)
    }
    // parquet with a wrong column TYPE also fails at read, not downstream
    val badType = tmpDir("src-bad-") + "/ty"
    TranscriptGen.dataset(spark, GenConfig(nConvs = 2)).toDF()
      .withColumn("ts", col("ts").cast("string")).write.parquet(badType)
    intercept[org.apache.spark.sql.AnalysisException] {
      TranscriptSource.read(spark, badType)
    }
    // json with a RENAMED key: supplied schemas null absent fields, so
    // the bounded sample check must reject it loudly
    val badJson = tmpDir("src-bad-") + "/j"
    TranscriptGen.dataset(spark, GenConfig(nConvs = 2)).toDF()
      .withColumnRenamed("text", "content")
      .write.options(fmtOpts).json(badJson)
    val ex = intercept[IllegalArgumentException] {
      TranscriptSource.read(spark, badJson, "json", fmtOpts)
    }
    assert(ex.getMessage.contains("text"))
  }

  test("spark.sql end-to-end: registered extraction exprs over a temp view") {
    graft.functions.Expressions.register(spark)
    TranscriptGen.dataset(spark, GenConfig(nConvs = 8)).toDF()
      .createOrReplaceTempView("turns")
    val out = spark.sql(
      """SELECT conv_id, turn_idx,
        |       sniff_payload(text) AS kind,
        |       length(extract_main_content(text)) AS n_chars
        |FROM turns
        |WHERE role <> 'system' AND text IS NOT NULL
        |ORDER BY conv_id, turn_idx""".stripMargin)
    assert(out.count() > 0)
    assert(out.filter(col("kind").isin("html", "pdf", "plain")).count()
      == out.count())
    assert(out.filter(col("n_chars") > 0).count() > 0)
  }
}
