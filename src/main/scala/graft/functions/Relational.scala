package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Relational operators Spark's built-in join strategies don't provide
  * directly — as-of (temporal) join, interval/range join — re-expressed
  * in the shapes that survive 100 TB:
  *
  *  - `asofJoin` avoids the naive `l JOIN r ON l.k = r.k AND l.t >= r.t`
  *    + argmax formulation (a per-key cartesian within BroadcastNestedLoop
  *    or an exploded sort-merge) by UNION-tagging both inputs and taking
  *    one `last(_, ignoreNulls)` window pass: exactly ONE shuffle on the
  *    key and one per-key sort — the same cost envelope as a sort-merge
  *    join, independent of how many right rows precede each left row.
  *
  *  - `rangeJoinBinned` turns an inequality (interval-containment) join —
  *    which Catalyst can only plan as a nested-loop — into an EQUI-join on
  *    (key, time-bin): intervals explode to the ≤ `span/bin + 1` bins they
  *    overlap, points map to exactly one bin, and the residual range
  *    predicate filters bucket-locally after the hash join. Bin width is
  *    the dial: ~the typical interval span keeps the explode factor ≤ 2.
  *
  *  - `morton16` builds the z-order clustering key for two-dimensional
  *    table layout (sort/range-partition by it at write time so file
  *    min/max stats prune on either dimension).
  *
  *  - `percentileThreshold` computes an exact, engine-portable discrete
  *    percentile per group without `percentile_approx` (whose sketch is
  *    not reproducible across engines): rank rows per group on
  *    (value, tiebreak) and pick the value at ⌈p·n⌉. Only the (group,
  *    value, tiebreak) triple rides the window shuffle — callers join the
  *    resulting tiny threshold table back by broadcast, so the payload
  *    never enters an Exchange.
  */
object Relational {

  /** Reserved-staging-column guard (the Ann/Dedup discipline): funnel
    * and retentionCohorts stage `_graft_*` columns; an input already
    * carrying one would produce ambiguous references or a join on the
    * wrong column — fail fast instead. */
  private def requireNoStagingCols(df: DataFrame): Unit = {
    val clash = df.columns.filter(_.startsWith("_graft_"))
    require(clash.isEmpty,
      s"input already has reserved staging column(s): ${clash.mkString(", ")}")
  }

  /** For every left row, attach the payload of the LATEST right row of
    * the same `key` with `right(timeCol) <= left(timeCol)` (inclusive
    * as-of-backward semantics; left rows with no prior right row carry
    * nulls).
    *
    * Contract: `right` must be unique per (key, time) — dedupe with e.g.
    * `max_by` first, otherwise which tied right row wins is undefined.
    * Output: all `left` columns, plus each non-key right column renamed
    * `asof_<name>` (the right time column included, so callers can see
    * how stale the match is).
    *
    * Scale shape: one Exchange on `key`, one per-key sort; the window
    * carries left payload + one right-payload struct. A mega-key (one
    * key owning a large fraction of all rows) serializes its sort into
    * one task — as-of semantics need the full per-key order, so shard
    * such keys upstream (e.g. by coarse time range) if they exist.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               key: String, leftTime: String, rightTime: String): DataFrame = {
    val leftPayload = left.columns.filterNot(c => c == key || c == leftTime).toSeq
    val rightCarry  = right.columns.filterNot(_ == key).toSeq // includes rightTime

    def structTypeOf(df: DataFrame, cols: Seq[String]): StructType =
      df.select(struct(cols.map(col): _*)).schema.head.dataType.asInstanceOf[StructType]

    val lType = structTypeOf(left, leftPayload)
    val rType = structTypeOf(right, rightCarry)

    val lTagged = left.select(
      col(key), col(leftTime).as("_t"), lit(1).as("_is_left"),
      struct(leftPayload.map(col): _*).as("_l"),
      lit(null).cast(rType).as("_r"))
    // A NULL right time can never be "the nearest earlier event" — drop
    // such rows up front. Without this, Spark's NULLS-FIRST ascending
    // sort would park them at the window head and last(_r, ignoreNulls)
    // would hand their (non-null) payload struct to every left row that
    // has no real match — the opposite of ASOF semantics, where a NULL
    // time matches nothing.
    val rTagged = right.filter(col(rightTime).isNotNull).select(
      col(key), col(rightTime).as("_t"), lit(0).as("_is_left"),
      lit(null).cast(lType).as("_l"),
      struct(rightCarry.map(col): _*).as("_r"))

    // Right rows sort BEFORE left rows at the same timestamp
    // (_is_left 0 < 1), which is exactly the inclusive `<=` semantics;
    // tied left rows all read the same carried struct (they contribute
    // only nulls to the ignoreNulls last), so the tie order among them
    // cannot change the result.
    val w = Window.partitionBy(col(key))
      .orderBy(col("_t"), col("_is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val out = lTagged.unionByName(rTagged)
      .withColumn("_asof", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_is_left") === 1)

    val cols: Seq[Column] =
      col(key) +:
        col("_t").as(leftTime) +:
        (leftPayload.map(c => col(s"_l.$c").as(c)) ++
          rightCarry.map(c => col(s"_asof.$c").as(s"asof_$c")))
    out.select(cols: _*)
  }

  /** Inner interval-containment join: every (interval, point) pair of the
    * same `key` with `point(pTime) ∈ [start, end)`, planned as a hash
    * equi-join on (key, bin(time)) instead of a nested loop. `binSec`
    * should be on the order of the typical interval span (explode factor
    * = span/bin + 1). Column names of `intervals` and `points` must not
    * collide apart from `key`.
    */
  def rangeJoinBinned(intervals: DataFrame, points: DataFrame, key: String,
                      startCol: String, endCol: String, pTime: String,
                      binSec: Long): DataFrame = {
    // TIMESTAMP_NTZ has no direct cast to BIGINT; routing through
    // TIMESTAMP is epoch-exact under the engine's pinned UTC session tz.
    def epochBin(c: String) = expr(s"cast(cast($c as timestamp) as long) div $binSec")
    val iBinned = intervals.withColumn("_bin",
      explode(sequence(epochBin(startCol), epochBin(endCol))))
    val pBinned = points.withColumn("_bin", epochBin(pTime))
    iBinned.join(pBinned, Seq(key, "_bin"))
      .filter(col(pTime) >= col(startCol) && col(pTime) < col(endCol))
      .drop("_bin")
  }

  /** Morton (z-order) key: interleave the low 16 bits of `x` (even bit
    * positions) and `y` (odd positions) — the multi-dimensional
    * clustering key behind z-ordered table layouts (Delta OPTIMIZE
    * ZORDER, Iceberg sort orders): sorting/range-partitioning by `z`
    * co-locates rows that are close in BOTH dimensions, so per-file
    * min/max stats prune scans on either column. Pure integer
    * shift/mask ops over LONG — whole-stage-codegen'd, engine-portable
    * (the classic magic-number bit spread). Inputs must be in
    * [0, 65535]; callers bucketize first. */
  def morton16(x: Column, y: Column): Column = {
    def spread(v: Column): Column = {
      val v0 = v.cast("long")
      val a = v0.bitwiseOR(shiftleft(v0, 8)).bitwiseAND(lit(0x00FF00FFL))
      val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
      val c = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
      c.bitwiseOR(shiftleft(c, 1)).bitwiseAND(lit(0x55555555L))
    }
    spread(x).bitwiseOR(shiftleft(spread(y), 1))
  }

  /** One-pass binned p-quantile per `groupCol`: values (assumed in
    * [0, 1]) land in `bins` fixed bins, the per-(group, bin) histogram
    * aggregates with map-side combine, and the quantile bin is read off
    * the cumulative histogram — at most `bins` rows per group ever
    * enter the window, independent of input size. This is the 100 TB
    * alternative to `percentileThreshold`, whose exact rank needs a
    * full per-group sort of every value. Deterministic on both engines
    * when `bins` is a power of two (the reported threshold bin/bins is
    * then an IEEE-exact division). Returns
    * (groupCol, n, bin, threshold = bin/bins). */
  def histogramQuantile(df: DataFrame, groupCol: String, valCol: String,
                        p: Double, bins: Int): DataFrame = {
    // NULLs out, same rationale as percentileThreshold: a NULL bin would
    // sort to opposite ends of the cumulative histogram on Spark
    // (NULLS FIRST) vs DuckDB (NULLS LAST), shifting every cum count.
    val binned = df.filter(col(valCol).isNotNull).select(col(groupCol),
      least(floor(col(valCol) * bins), lit((bins - 1).toDouble))
        .cast("int").as("bin"))
    val hist = binned.groupBy(col(groupCol), col("bin"))
      .agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(col(groupCol)).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(groupCol))
    hist
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))
      .filter(col("cum") >= ceil(lit(p) * col("n")) &&
        col("cum") - col("c") < ceil(lit(p) * col("n")))
      .select(col(groupCol), col("n"), col("bin"),
        (col("bin").cast("double") / bins).as("threshold"))
  }

  /** Exact discrete p-quantile of `valCol` per `groupCol`: the value at
    * rank ⌈p·n⌉ in (value, tiebreak) ascending order — deterministic for
    * any tie pattern (tied values at the boundary all carry the same
    * value), reproducible in ANSI SQL. Returns (groupCol, threshold).
    */
  def percentileThreshold(df: DataFrame, groupCol: String, valCol: String,
                          tiebreak: String, p: Double): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(valCol), col(tiebreak))
    // NULL values are excluded from the percentile population: Spark
    // sorts NULLS FIRST and DuckDB NULLS LAST, so any NULL reaching the
    // window would shift rank ⌈p·n⌉ differently on each engine — and a
    // NULL is not a value a threshold can gate on anyway.
    df.filter(col(valCol).isNotNull)
      .select(col(groupCol), col(valCol), col(tiebreak))
      .withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(col(groupCol))))
      .filter(col("_rn") === ceil(lit(p) * col("_n")).cast("int"))
      .select(col(groupCol), col(valCol).as("threshold"))
  }

  /** Strict-sequence funnel: stage i counts the users whose earliest
    * `steps(i)` event is STRICTLY after their stage-(i-1) anchor time
    * (the classic ordered-funnel semantics — a click before the first
    * view does not convert). Returns `(stage, users)`, stage 1-based.
    *
    * Scale shape: one `groupBy(user).min(ts)` per stage plus one
    * equi-join per stage transition — all shuffles on the user key
    * (high-cardinality, even), the anchor relation shrinks
    * monotonically stage over stage, and no payload column ever enters
    * an Exchange. Exactness: pure timestamp comparisons, no arithmetic
    * to round. */
  def funnel(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    requireNoStagingCols(df)
    var cur = df.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol))
      .agg(min(col(tsCol)).as("_graft_t"))
      .select(col(userCol).as("_graft_u"), col("_graft_t"))
    val stages = scala.collection.mutable.ArrayBuffer(
      cur.agg(count(lit(1)).as("users"))
        .select(lit(1).as("stage"), col("users")))
    steps.tail.zipWithIndex.foreach { case (st, i) =>
      cur = df.filter(col(typeCol) === st)
        .join(cur, col(userCol) === col("_graft_u") &&
          col(tsCol) > col("_graft_t"))
        .groupBy(col("_graft_u"))
        .agg(min(col(tsCol)).as("_graft_t"))
      stages += cur.agg(count(lit(1)).as("users"))
        .select(lit(i + 2).as("stage"), col("users"))
    }
    stages.reduce(_ unionByName _)
  }

  /** Weekly retention cohorts: each user's cohort is the ISO week of
    * their first event; `users` counts the cohort's distinct users
    * active in each subsequent week. Returns
    * `(cohort_week yyyy-MM-dd, week_offset, users)`.
    *
    * Scale shape: first-event anchors and distinct (user, week)
    * activity are both user-keyed aggregations with map-side combine;
    * the join is user-keyed; the final rollup is the tiny
    * (#cohorts × #weeks) relation. Exactness: date_trunc('week') is
    * ISO-Monday in both engines, and the offset is integer day
    * difference floor-divided by 7. */
  def retentionCohorts(df: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    requireNoStagingCols(df)
    val first = df.groupBy(col(userCol))
      .agg(date_trunc("week", min(col(tsCol))).as("_graft_cw"))
      .select(col(userCol).as("_graft_u"), col("_graft_cw"))
    // distinct (user, week): one row per active week, so the final
    // count(*) per (cohort, offset) IS the distinct-user count
    val active = df
      .select(col(userCol), date_trunc("week", col(tsCol)).as("_graft_w"))
      .distinct()
    active.join(first, col(userCol) === col("_graft_u"))
      .select(col("_graft_cw"), expr(
        "cast(datediff(cast(_graft_w as date), cast(_graft_cw as date)) " +
          "div 7 as int)").as("week_offset"))
      .groupBy(col("_graft_cw"), col("week_offset"))
      .agg(count(lit(1)).as("users"))
      .select(date_format(col("_graft_cw"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"), col("users"))
  }
}
