package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query once (count() action)
  * plus the extraction-throughput headline (turns/sec — the BASELINE
  * metric). Emits ONE JSON line.
  */
object Bench {

  def session(cpus: String): SparkSession = SparkSession.builder()
    .master(s"local[$cpus]")
    .appName("graft-bench")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = session(cpus)
    spark.sparkContext.setLogLevel("WARN")

    // steady-state protocol: run EVERY query once untimed (JIT, codegen,
    // and shuffle-path warmup), then time each once — per-query numbers
    // are comparable round-over-round instead of dominated by
    // first-action JIT (round 1 booked 8.7 s of JIT to the trivial q01
    // projection)
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // headline: extraction throughput on a transcript table sized ~150k
    // turns (scaled down for smaller sf dirs); one warmup pass so the
    // number reflects steady-state, not first-action JIT
    val nConvs =
      if (sfDir.contains("0.001")) 50
      else if (sfDir.contains("0.01")) 500
      else 20000
    timeExtract(spark, math.max(nConvs / 4, 50))
    val (turns, extractSec) = timeExtract(spark, nConvs)
    val turnsPerSec = if (extractSec > 0) turns / extractSec else 0.0
    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum + extractSec
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","extract_turns":$turns%.0f,"extract_sec":$extractSec%.3f,"turns_per_sec":$turnsPerSec%.1f}""")
    spark.stop()
  }

  /** Time the full ingest pipeline (selection → salted repartition →
    * mapPartitions extraction) to a count action; returns (rows, sec). */
  def timeExtract(spark: SparkSession, nConvs: Int): (Double, Double) = {
    import graft.fixtures.TranscriptGen
    val cfg = TranscriptGen.GenConfig(nConvs = nConvs)
    val turns = TranscriptGen.dataset(spark, cfg).toDF()
    val eligible = graft.pipeline.Selection
      .ingest(turns, TranscriptGen.WatermarkTs, spark)
    val t0 = System.nanoTime()
    // aggregate over extracted_text so Catalyst cannot prune the
    // extraction away (a bare count() would measure a scan-only plan)
    val r = graft.pipeline.ExtractionPipeline.extractExpr(spark, eligible)
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)),
        org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("extracted_text")))).head()
    val n = r.getLong(0)
    ((n.toDouble), (System.nanoTime() - t0) / 1e9)
  }
}
