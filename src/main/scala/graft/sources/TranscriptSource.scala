package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType
import graft.model.Turn

/** Schema-pinned transcript source over the formats a real deployment
  * lands transcripts in. The reference reads a Postgres table
  * (PostgresItemReader.java); here the equivalents are columnar parquet
  * (the scale default), JSONL (the export/interchange shape), and CSV
  * (the escape hatch). Every format resolves to the SAME pinned Turn
  * schema — the schema is always supplied, never inferred, so a
  * malformed file fails loudly (the Scenario-2 corrupt-input contract)
  * instead of silently inferring wrong types, and schema inference
  * never triggers an extra full pass over 100 TB of text.
  */
object TranscriptSource {

  val TurnSchema: StructType = org.apache.spark.sql.Encoders.product[Turn].schema

  /** Read a transcript table in the given format, normalized to the
    * pinned Turn schema (column order included). `options` pass through
    * to the reader (e.g. csv delimiter).
    */
  def read(spark: SparkSession, path: String, format: String = "parquet",
      options: Map[String, String] = Map.empty): DataFrame = {
    val cols = TurnSchema.fieldNames.map(col).toSeq
    format match {
      case "parquet" =>
        // parquet carries its own schema; select enforces presence +
        // canonical order and lets Catalyst prune the rest
        spark.read.options(options).parquet(path).select(cols: _*)
      case "json" =>
        spark.read.schema(TurnSchema)
          .options(Map("mode" -> "FAILFAST",
            "timestampFormat" -> "yyyy-MM-dd HH:mm:ss") ++ options)
          .json(path).select(cols: _*)
      case "csv" =>
        spark.read.schema(TurnSchema)
          .options(Map("header" -> "true", "mode" -> "FAILFAST",
            "multiLine" -> "true", "escape" -> "\"",
            "timestampFormat" -> "yyyy-MM-dd HH:mm:ss") ++ options)
          .csv(path).select(cols: _*)
      case other =>
        throw new IllegalArgumentException(
          s"unsupported transcript format: $other (parquet|json|csv)")
    }
  }
}
