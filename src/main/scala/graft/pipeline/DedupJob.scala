package graft.pipeline

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import graft.functions.Dedup

/** Runs a near-dup pair generator as a JOB and discloses its silent
  * cap: every generator in [[graft.functions.Dedup]] drops candidate
  * buckets above an occupancy cap (the 100-TB bound on the bucket-local
  * self-join), and at corpus scale the dropped mass is exactly the
  * boilerplate/template clusters a user might expect dedup to catch —
  * so the drop counts land in a metrics table next to the run, the same
  * never-throw discipline as [[ExtractionJob.run]]'s metrics row
  * (reference analog: the run-summary notification that reports counts
  * without failing the batch, SlackNotification.java:73-105).
  *
  * Metrics schema (`<tableRoot>/dedup_metrics`, append):
  * (run_id, operator, output_rows, buckets, mega_buckets_dropped,
  * docs_in_mega_buckets, duration_sec). `output_rows` is the run's
  * primary result count — near-dup PAIRS for the pair generators,
  * DROPPED DOC ids for the end-to-end [[runSimhashDedup]]; the
  * `operator` column says which. `buckets` is −1 for the flatMapGroups
  * jaccard path (its accumulators see only dropped groups; bucket
  * totals would need a second aggregation over the exchange) and its
  * drop counts are at-least-once under task retries — a metrics
  * caveat, not a correctness one.
  */
object DedupJob {

  final case class DedupRunResult(runId: String, operator: String,
      outputRows: Long, buckets: Long, megaBucketsDropped: Long,
      docsInMegaBuckets: Long, durationSec: Double)

  /** Shared run scaffolding for the Observation-accounted paths: run
    * `body` against a fresh Observation, read the bucket metrics (an
    * AQE-pruned CollectMetrics on an empty result reads as 0), write
    * the disclosure row. `body` returns the run's output-row count. */
  private def observedRun(spark: SparkSession, tableRoot: String,
      operator: String, body: Observation => Long): DedupRunResult = {
    val runId = java.util.UUID.randomUUID().toString.take(8)
    val obs = Observation(s"dedup-$runId")
    val t0 = System.nanoTime()
    // release the operators' single-scan caches when the run completes
    // (success or failure) — a long-lived driver running dedup over
    // changing inputs would otherwise accumulate one entry per input.
    // SCOPED: this drains only the relations THIS run persisted, so a
    // concurrent dedup job on another driver thread keeps its caches
    val outputRows = Dedup.withCacheScope(body(obs))
    val sec = (System.nanoTime() - t0) / 1e9
    val row = obs.get
    // sum() over an all-dropped/empty run observes SQL NULL, which
    // arrives as Some(null) — match the boxed Long explicitly so the
    // NULL-metric → 0 path is intentional, not a null-unboxing quirk
    def m(k: String): Long = row.get(k) match {
      case Some(v: java.lang.Long) => v.longValue()
      case _ => 0L
    }
    val res = DedupRunResult(runId, operator, outputRows, m("buckets"),
      m("mega_buckets_dropped"), m("docs_in_mega_buckets"), sec)
    writeMetrics(spark, tableRoot, res)
    res
  }

  /** simhash / embedding / lsh near-dups: exact observation-based
    * accounting. The caller builds the pairs DataFrame against the
    * provided Observation (e.g. `Dedup.simhashPairs(df, "text", "id",
    * maxHamming = 3, stats = Some(obs))`). */
  def runObserved(spark: SparkSession, tableRoot: String, operator: String,
      build: Observation => DataFrame): DedupRunResult =
    observedRun(spark, tableRoot, operator, obs => build(obs).count())

  /** ngramJaccardPairs: accumulator-based accounting (the bucket-local
    * flatMapGroups path has no declarative aggregation to observe). */
  def runJaccard(spark: SparkSession, tableRoot: String, operator: String,
      build: Dedup.BucketAccounting => DataFrame): DedupRunResult = {
    val runId = java.util.UUID.randomUUID().toString.take(8)
    val acc = Dedup.BucketAccounting(spark)
    val t0 = System.nanoTime()
    val pairs = Dedup.withCacheScope(build(acc).count())
    val sec = (System.nanoTime() - t0) / 1e9
    val res = DedupRunResult(runId, operator, pairs, -1L,
      acc.megaBucketsDropped.value, acc.docsInMegaBuckets.value, sec)
    writeMetrics(spark, tableRoot, res)
    res
  }

  /** End-to-end content near-dedup over a document frame (the CLI's
    * `--mode dedup`): simhash pairs at the ≤3-bit operating point →
    * transitive clusters → drop list (every cluster member except its
    * min-id keeper) written to `<tableRoot>/dedup_drops`, with the
    * occupancy-drop disclosure row in the metrics table
    * (output_rows = dropped doc count). The observation fills during
    * cluster propagation's own actions — no extra pass over the corpus. */
  def runSimhashDedup(spark: SparkSession, tableRoot: String,
      docs: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3): DedupRunResult =
    observedRun(spark, tableRoot, "simhash-cluster-dedup", { obs =>
      import org.apache.spark.sql.functions.col
      val pairs = Dedup.simhashPairs(docs, textCol, idCol,
        maxHamming, stats = Some(obs))
      val drops = Dedup.dupClusters(pairs, "a", "b")
        .filter(col("id") =!= col("cluster"))
        .select(col("id").as("drop_id"))
      drops.write.mode("overwrite").parquet(s"$tableRoot/dedup_drops")
      spark.read.parquet(s"$tableRoot/dedup_drops").count()
    })

  /** NEVER throws — a metrics write failure must not mask the dedup
    * run's real outcome (the ExtractionJob.writeMetrics contract). */
  private def writeMetrics(spark: SparkSession, tableRoot: String,
      r: DedupRunResult): Unit =
    try {
      import spark.implicits._
      Seq((r.runId, r.operator, r.outputRows, r.buckets,
        r.megaBucketsDropped, r.docsInMegaBuckets, r.durationSec))
        .toDF("run_id", "operator", "output_rows", "buckets",
          "mega_buckets_dropped", "docs_in_mega_buckets", "duration_sec")
        .write.mode("append").parquet(s"$tableRoot/dedup_metrics")
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(
          s"[graft] dedup metrics write failed for run ${r.runId} " +
            s"(result preserved): ${e.getMessage}")
    }
}
