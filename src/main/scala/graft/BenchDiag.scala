package graft

import org.apache.spark.sql.functions._

/** Component-level diagnosis of the extraction pipeline at a given
  * parallelism: scan-only vs scan+select vs full extraction. */
object BenchDiag {
  def main(args: Array[String]): Unit = {
    val lvl = sys.env.getOrElse("SPARK_GRAFT_BENCH_LEVEL", "16")
    val spark = Bench.session(lvl)
    spark.sparkContext.setLogLevel("ERROR")
    // same materialized input as Bench/ScalingBench (generator-version
    // keyed — a hardcoded /tmp path here was a stale-artifact hazard)
    val input = sys.env.getOrElse("SPARK_GRAFT_BENCH_INPUT",
      Bench.materializeInput(spark,
        sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "30000").toInt,
        sys.env.getOrElse("SPARK_GRAFT_BENCH_PARASCALE", "16").toInt))
    def time(name: String)(f: => Long): Unit = {
      // 1 warmup + 2 reps
      f
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val best = ts.minBy(_._1)
      println(f"$name: ${best._1}%.3f s (n=${best._2}) [${ts.map(t => f"${t._1}%.2f").mkString(",")}]")
    }
    val turns = spark.read.parquet(input)
    time("scan_meta_count") { turns.count() }
    time("scan_full_decode") {
      turns.agg(sum(length(col("text")))).head().getLong(0)
    }
    time("scan_select") {
      graft.pipeline.Selection.ingest(turns,
        graft.fixtures.TranscriptGen.WatermarkTs, spark).count()
    }
    time("sniff_only") {
      val el = graft.pipeline.Selection.ingest(turns,
        graft.fixtures.TranscriptGen.WatermarkTs, spark)
      import spark.implicits._
      el.select(col("text")).as[String].mapPartitions(
        _.map(t => graft.extract.PayloadSniffer.sniff(t).length.toLong))
        .agg(sum("value")).head().getLong(0)
    }
    time("full_extract") {
      val el = graft.pipeline.Selection.ingest(turns,
        graft.fixtures.TranscriptGen.WatermarkTs, spark)
      graft.pipeline.ExtractionPipeline.extract(spark, el).count()
    }
    time("full_extract_expr") {
      val el = graft.pipeline.Selection.ingest(turns,
        graft.fixtures.TranscriptGen.WatermarkTs, spark)
      graft.pipeline.ExtractionPipeline.extractExpr(spark, el)
        .agg(sum(length(col("extracted_text")))).head().getLong(0)
    }
    spark.stop()
  }
}
