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

  /** TurnSchema with every field nullable — file formats cannot promise
    * the Encoder's non-null fields (asNullable is private[sql]). */
  private val TurnSchemaNullable: StructType =
    StructType(TurnSchema.fields.map(_.copy(nullable = true)))

  /** Read a transcript table in the given format, normalized to the
    * pinned Turn schema (column order AND types included). `options`
    * pass through to the reader (e.g. csv delimiter).
    *
    * Loud-failure guarantees per format:
    *  - parquet: a missing column or an incompatible column type throws
    *    at plan time (`.to(TurnSchema)` refuses lossy casts);
    *  - json/csv: FAILFAST throws on malformed records, and because a
    *    supplied schema silently nulls structurally ABSENT fields, a
    *    bounded sample is validated (`validateSample` rows) — a rename
    *    like `content` for `text` fails here instead of extracting
    *    nothing from 100 TB.
    */
  def read(spark: SparkSession, path: String, format: String = "parquet",
      options: Map[String, String] = Map.empty,
      validateSample: Int = 100): DataFrame = {
    val cols = TurnSchema.fieldNames.map(col).toSeq
    format match {
      case "parquet" =>
        // parquet carries its own schema; select enforces presence +
        // canonical order (and prunes), .to pins the types (asNullable:
        // file formats cannot promise the Encoder's non-null fields)
        spark.read.options(options).parquet(path).select(cols: _*)
          .to(TurnSchemaNullable)
      case "json" =>
        val df = spark.read.schema(TurnSchema)
          .options(Map("mode" -> "FAILFAST",
            "timestampFormat" -> "yyyy-MM-dd HH:mm:ss") ++ options)
          .json(path).select(cols: _*)
        requireKeyFields(df, s"json $path", validateSample)
      case "csv" =>
        val df = spark.read.schema(TurnSchema)
          .options(Map("header" -> "true", "mode" -> "FAILFAST",
            "multiLine" -> "true", "escape" -> "\"",
            "timestampFormat" -> "yyyy-MM-dd HH:mm:ss") ++ options)
          .csv(path).select(cols: _*)
        requireKeyFields(df, s"csv $path", validateSample)
      case other =>
        throw new IllegalArgumentException(
          s"unsupported transcript format: $other (parquet|json|csv)")
    }
  }

  /** Bounded sanity scan: the key fields must not be entirely null in
    * the first `n` rows (one-partition read — trivial at any scale). */
  private def requireKeyFields(df: DataFrame, what: String, n: Int): DataFrame = {
    if (n > 0) {
      val sample = df.select(col("conv_id"), col("text"), col("ts")).limit(n)
        .collect()
      if (sample.nonEmpty) {
        Seq("conv_id", "text", "ts").zipWithIndex.foreach { case (f, i) =>
          require(sample.exists(!_.isNullAt(i)),
            s"$what: field '$f' is null in all of the first ${sample.length} " +
              "rows — wrong field name in the source? (schema fields are " +
              "matched by name; absent keys read as null)")
        }
      }
    }
    df
  }
}
