package graft.pipeline

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Extractor
import graft.model.{ExtractedTurn, Turn}

/** Allow-list for the (case_type, role) dispatch predicate — the
  * engine's analog of the reference's 14-arm
  * `(case_type = 'xx' AND type IN (...))` OR chain
  * (PostgresItemReader.java:121-134). Data-driven so it broadcast-joins
  * instead of compiling a giant boolean expression; unknown case types
  * (like the reference's `a6`/`ff` rows in IngestQueryTest.java:63-81)
  * simply never match.
  */
object AllowList {
  val pairs: Seq[(String, String)] = Seq(
    "a1" -> "user", "a1" -> "assistant", "a1" -> "tool",
    "b5" -> "user", "b5" -> "assistant", "b5" -> "tool",
    "c7" -> "user", "c7" -> "assistant",
    "d8" -> "user", "d8" -> "assistant", "d8" -> "tool",
    "e9" -> "assistant", "e9" -> "tool"
    // a6 deliberately absent — the unknown-case-type analog
  )

  def df(spark: SparkSession): DataFrame =
    spark.createDataFrame(pairs).toDF("case_type", "role")
}

/** The ingest/delete selection predicates (SURVEY.md §2.2, P4-P8). */
object Selection {

  /** Derived case_type = last 2 chars of conv_id (P3 analog of
    * RIGHT(external_reference_uuid::text, 2),
    * PostgresItemReader.java:94). */
  def withCaseType(df: DataFrame): DataFrame =
    df.withColumn("case_type", expr("right(conv_id, 2)"))

  /** Base conjunctive predicate. Order matters twice over: pushed-down
    * conjuncts evaluate left-to-right, so the cheap, selective
    * predicates (ts watermark, role, tool) run before anything that
    * touches the payload column — at 100 TB the `text` bytes of a
    * filtered-out row are never even decoded, and a corrupt payload in
    * an out-of-range row can never fail a scan.
    */
  private def basePredicate(watermark: Timestamp) =
    col("ts") > lit(watermark) &&
      col("role") =!= "system" &&
      (col("tool").isNull || col("tool") =!= "internal") &&
      col("text").isNotNull

  /** Ingest selection: base conjunctive predicate + watermark + the
    * broadcast-semi allow-list join (P4/P6/P7 + J1). Filters push to
    * the parquet scan; the join side is broadcast (small dim).
    */
  def ingest(turns: DataFrame, watermark: Timestamp,
      spark: SparkSession): DataFrame =
    withCaseType(turns.filter(basePredicate(watermark)))
      .join(broadcast(AllowList.df(spark)), Seq("case_type", "role"),
        "left_semi")

  /** Rows rejected by the allow-list — skip-audit (J2). */
  def rejected(turns: DataFrame, watermark: Timestamp,
      spark: SparkSession): DataFrame =
    withCaseType(turns.filter(basePredicate(watermark)))
      .join(broadcast(AllowList.df(spark)), Seq("case_type", "role"),
        "left_anti")

  /** Delete-mode selection with the reference's deliberate 1-week
    * lookback for late/out-of-order rows (PostgresItemReader.java:140-166):
    * re-deliver anything deleted since watermark - 7 days; the sink
    * dedupes keyed last-write-wins.
    */
  def deleteLookback(turns: DataFrame, watermark: Timestamp): DataFrame =
    withCaseType(turns)
      .filter(col("ts") > lit(watermark) - expr("INTERVAL 7 DAYS"))
}

/** The extraction stage: salted conv_id repartition → per-partition
  * extraction → typed output (SURVEY.md §3.1 engine equivalent).
  */
object ExtractionPipeline {

  /** Number of salt buckets for skewed long conversations. Safe for the
    * stateless per-turn transform (SURVEY.md §4.2). */
  val DefaultSalt = 8

  /** Run extraction over eligible turns.
    *
    * Extraction is per-turn stateless, so it runs MAP-SIDE — no shuffle
    * of the raw payload bytes. At 100 TB that is the difference between
    * shuffling the whole corpus and shuffling nothing: only the
    * (boilerplate-stripped, much smaller) output is ever repartitioned,
    * and only when the caller asks for write-layout clustering via
    * [[repartitionForWrite]]. The salted conv_id repartition from the
    * original design survives there — where co-location is actually
    * needed — not here.
    */
  def extract(spark: SparkSession, eligible: DataFrame,
      numPartitions: Int = 0, salt: Int = DefaultSalt): Dataset[ExtractedTurn] = {
    import spark.implicits._
    val turns = eligible
      .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
      .as[Turn]
    // mapPartitions amortizes per-partition setup (parsers are
    // stateless objects today, but the batching shape is the contract
    // - BASELINE.json "mapPartitions-batched tokenize/classify")
    turns.mapPartitions { it =>
      // per-partition setup amortization: one reused Calendar per task
      val cal = java.util.Calendar.getInstance(
        java.util.TimeZone.getTimeZone("UTC"))
      it.map { t =>
        val r = Extractor.extract(t.text)
        cal.setTimeInMillis(t.ts.getTime)
        ExtractedTurn(
          conv_id = t.conv_id,
          turn_idx = t.turn_idx,
          role = t.role,
          tool = t.tool,
          ts = t.ts,
          payload_kind = r.kind,
          extracted_text = r.text,
          n_spans = r.nSpans,
          payload_bytes = utf8Length(t.text),
          source = "graft",
          year = f"${cal.get(java.util.Calendar.YEAR)}%04d",
          month = f"${cal.get(java.util.Calendar.MONTH) + 1}%02d",
          day = f"${cal.get(java.util.Calendar.DAY_OF_MONTH)}%02d")
      }
    }
  }

  /** UTF-8 byte length without the `getBytes` copy (must equal Spark's
    * `octet_length` so the typed and expression paths stay row-for-row
    * identical). Matches the JDK/UTF8String encoder exactly: a VALID
    * surrogate pair is 4 bytes; an UNPAIRED surrogate encodes as the
    * 1-byte replacement '?'. */
  private[pipeline] def utf8Length(s: String): Int = {
    if (s == null) return 0
    var n = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < 0x80) n += 1
      else if (c < 0x800) n += 2
      else if (Character.isHighSurrogate(c) && i + 1 < s.length &&
        Character.isLowSurrogate(s.charAt(i + 1))) { n += 4; i += 1 }
      else if (Character.isSurrogate(c)) n += 1 // unpaired → '?'
      else n += 3
      i += 1
    }
    n
  }

  /** Expression-based extraction: the same output schema as [[extract]]
    * but through the native `ExtractAll` Catalyst expression — input
    * UTF8String in, InternalRow out, no Turn/ExtractedTurn object or
    * Encoder round-trip. Same measured throughput as the typed
    * mapPartitions path (extraction compute dominates both), but the
    * plan stays pure Project/Filter: Catalyst can prune, reorder, and
    * push around it, and a count-only consumer skips extraction
    * entirely. The typed path remains for callers needing arbitrary
    * per-partition state.
    */
  def extractExpr(spark: SparkSession, eligible: DataFrame): Dataset[ExtractedTurn] = {
    import spark.implicits._
    // UTC-pinned calendar date regardless of spark.sql.session.timeZone:
    // epoch-seconds → epoch-days → DateType (date_from_unix_date and the
    // year/month/day extractors are pure calendar arithmetic, no zone) —
    // date_format(ts, ...) would partition midnight-adjacent turns
    // differently on a non-UTC session than the typed UTC-Calendar path.
    val utcDate = date_from_unix_date(
      floor(col("ts").cast("long") / lit(86400)).cast("int"))
    eligible
      .withColumn("_x", graft.functions.Expressions.extractAll(col("text")))
      .withColumn("_d", utcDate)
      .select(
        col("conv_id"), col("turn_idx"), col("role"), col("tool"),
        col("ts"),
        col("_x.payload_kind").as("payload_kind"),
        col("_x.extracted_text").as("extracted_text"),
        col("_x.n_spans").as("n_spans"),
        octet_length(col("text")).as("payload_bytes"),
        lit("graft").as("source"),
        lpad(year(col("_d")).cast("string"), 4, "0").as("year"),
        lpad(month(col("_d")).cast("string"), 2, "0").as("month"),
        lpad(dayofmonth(col("_d")).cast("string"), 2, "0").as("day"))
      .as[ExtractedTurn]
  }

  /** Cluster extracted rows for the partitioned write: one shuffle of
    * the small output — co-locates each output date-partition (bounded
    * file counts) and each conversation's turns, salted so the 1% ~50×
    * heavy conversations split across `salt` tasks instead of one
    * straggler.
    */
  def repartitionForWrite(extracted: Dataset[ExtractedTurn],
      numPartitions: Int = 0,
      salt: Int = DefaultSalt): Dataset[ExtractedTurn] = {
    val parts =
      if (numPartitions > 0) numPartitions
      else extracted.sparkSession.sessionState.conf.numShufflePartitions
    extracted.repartition(parts, col("year"), col("month"), col("day"),
      col("conv_id"), pmod(col("turn_idx"), lit(salt)))
      // stable (conv_id, turn_idx) order inside every output file (O1):
      // downstream readers see turns in order, and parquet min/max
      // column stats stay tight for conv_id point lookups
      .sortWithinPartitions(col("year"), col("month"), col("day"),
        col("conv_id"), col("turn_idx"))
  }
}
