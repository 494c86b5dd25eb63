package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.debug._

/** Dumps physical plans for the load-bearing queries so the scale
  * properties are reviewable: filter pushdown reaching the parquet
  * scan, column pruning in ReadSchema, broadcast join strategy for the
  * allow-list, whole-stage codegen spans, and the absence of any
  * raw-payload shuffle in the extraction pipeline.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Bench.session("8")
    spark.sparkContext.setLogLevel("ERROR")

    def show(name: String, note: String)(dfb: => org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n## $name\n\n$note\n\n```")
      println(dfb.queryExecution.executedPlan.toString.take(6000))
      println("```")
    }

    show("ingest selection (q05 shape): pushdown + pruning + broadcast semi join",
      "Watermark/ts + event_type conjuncts must appear in PushedFilters; " +
      "ReadSchema must not include unused columns; the allow-list join " +
      "must be BroadcastHashJoin LeftSemi.") {
      SparkEntry.queries("q05_allowlist_semi")(spark, dir)
    }

    show("extraction pipeline (q15 shape): map-side, no raw-payload exchange",
      "There must be NO Exchange between the transcript source and the " +
      "MapPartitions extraction — the payload column is never shuffled.") {
      SparkEntry.queries("q15_extract_pipeline")(spark, dir)
    }

    show("join+agg (q07): partial aggregation below the shuffle",
      "HashAggregate(partial) must sit below the Exchange; join strategy " +
      "is left to AQE/Catalyst stats.") {
      SparkEntry.queries("q07_join_agg")(spark, dir)
    }

    show("column pruning proof: 2-column projection over 6-column events",
      "ReadSchema must list only event_id and ts.") {
      spark.read.parquet(s"$dir/events.parquet")
        .filter(col("ts") > lit("2024-01-15").cast("timestamp"))
        .select(col("event_id"), col("ts"))
    }

    show("lsh dedup (q27 shape): staged projects, single shuffle on band key",
      "tokens → signature → band keys are separate Projects (no " +
      "re-tokenization blowup); exactly one Exchange, keyed by band.") {
      SparkEntry.queries("q27_lsh_buckets")(spark, dir)
    }

    show("cosine top-k (q28): TakeOrderedAndProject, no full sort",
      "Global top-k must compile to TakeOrderedAndProject (k rows per " +
      "partition shuffled), never a total Sort.") {
      SparkEntry.queries("q28_cosine_topk")(spark, dir)
    }
    spark.stop()
  }
}
