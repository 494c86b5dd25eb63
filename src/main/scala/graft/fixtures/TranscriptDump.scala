package graft.fixtures

import org.apache.spark.sql.SparkSession

/** Writes a deterministic transcript table to parquet — the input-side
  * utility for driving `graft.cli.IngestApp` end-to-end outside tests.
  *
  * Usage: TranscriptDump <outDir> [nConvs=100] [paraScale=1]
  */
object TranscriptDump {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse(sys.error("usage: TranscriptDump <outDir> [nConvs] [paraScale]"))
    val nConvs = args.lift(1).map(_.toInt).getOrElse(100)
    val paraScale = args.lift(2).map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .appName("graft-transcript-dump")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = TranscriptGen.GenConfig(nConvs = nConvs, paraScale = paraScale)
    TranscriptGen.dataset(spark, cfg).write.mode("overwrite").parquet(out)
    println(s"[dump] wrote $out (nConvs=$nConvs, paraScale=$paraScale)")
    spark.stop()
  }
}
