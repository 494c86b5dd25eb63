package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit pins for the Relational operator family (as-of join, binned
  * range join, exact percentile thresholds) on hand-computed inputs —
  * the corpus-scale behavior is oracle-checked by q70/q71/q72.
  */
class RelationalSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofJoin picks the latest right row at or before each left time") {
    val left = Seq(
      ("u1", ts("2024-01-01 10:00:00"), 1L),
      ("u1", ts("2024-01-01 12:00:00"), 2L),
      ("u1", ts("2024-01-01 09:00:00"), 3L), // before any right row
      ("u2", ts("2024-01-01 10:00:00"), 4L)  // key with no right rows
    ).toDF("uid", "ts", "id")
    val right = Seq(
      ("u1", ts("2024-01-01 10:00:00"), "r_a"), // exactly at left #1 → inclusive
      ("u1", ts("2024-01-01 11:30:00"), "r_b")
    ).toDF("uid", "pts", "tag")

    val out = Relational.asofJoin(left, right, "uid", "ts", "pts")
      .select($"id", $"asof_tag").as[(Long, Option[String])]
      .collect().toMap

    assert(out(1L).contains("r_a")) // tie at 10:00 matches inclusively
    assert(out(2L).contains("r_b")) // latest of the two prior rows
    assert(out(3L).isEmpty)         // nothing at or before 09:00
    assert(out(4L).isEmpty)         // key absent from right
  }

  test("asofJoin carries every right payload column and the right time") {
    val left = Seq(("k", ts("2024-01-01 10:00:00"), 1L)).toDF("k", "t", "id")
    val right = Seq(("k", ts("2024-01-01 09:00:00"), 7L, 2.5))
      .toDF("k", "rt", "rid", "rv")
    val row = Relational.asofJoin(left, right, "k", "t", "rt")
      .select($"asof_rid", $"asof_rv", $"asof_rt").head()
    assert(row.getLong(0) == 7L)
    assert(row.getDouble(1) == 2.5)
    assert(row.getTimestamp(2) == ts("2024-01-01 09:00:00"))
  }

  test("rangeJoinBinned matches the brute-force inequality join") {
    val r = new scala.util.Random(42)
    val intervals = (0 until 50).map { i =>
      val start = 1000L + r.nextInt(5000)
      ("u" + (i % 5), i.toLong, start, start + 600L) // 10-min windows
    }
    val points = (0 until 400).map { i =>
      ("u" + (i % 7), 1000L + r.nextInt(6000), i.toLong)
    }
    val iDf = intervals.toDF("uid", "iid", "s", "e")
      .select($"uid", $"iid", $"s".cast("timestamp").as("s"),
        $"e".cast("timestamp").as("e"))
    val pDf = points.toDF("uid", "pt", "pid")
      .select($"uid", $"pt".cast("timestamp").as("pt"), $"pid")

    val got = Relational.rangeJoinBinned(iDf, pDf, "uid", "s", "e", "pt", 600L)
      .select($"iid", $"pid").as[(Long, Long)].collect().toSet

    val want = (for {
      (iu, iid, s, e) <- intervals
      (pu, pt, pid) <- points
      if pu == iu && pt >= s && pt < e
    } yield (iid, pid)).toSet

    assert(got == want)
    assert(want.nonEmpty) // the fixture actually exercises matches
  }

  test("rangeJoinBinned spans bins when the interval crosses a boundary") {
    val iDf = Seq(("k", 1L, 550L, 1150L)).toDF("uid", "iid", "s", "e")
      .select($"uid", $"iid", $"s".cast("timestamp").as("s"),
        $"e".cast("timestamp").as("e"))
    // points in bin 0, bin 1 (two different positions), and out of range
    val pDf = Seq(("k", 560L, 10L), ("k", 700L, 11L), ("k", 1100L, 12L),
      ("k", 1200L, 13L), ("k", 500L, 14L))
      .toDF("uid", "pt", "pid")
      .select($"uid", $"pt".cast("timestamp").as("pt"), $"pid")
    val got = Relational.rangeJoinBinned(iDf, pDf, "uid", "s", "e", "pt", 600L)
      .select($"pid").as[Long].collect().toSet
    assert(got == Set(10L, 11L, 12L))
  }

  test("percentileThreshold = value at rank ceil(p*n), per group") {
    val df = (1 to 10).map(i => ("g1", i.toDouble, i.toLong)) ++
      Seq(("g2", 5.0, 100L), ("g2", 7.0, 101L), ("g2", 9.0, 102L))
    val out = Relational
      .percentileThreshold(df.toDF("g", "v", "id"), "g", "v", "id", 0.75)
      .as[(String, Double)].collect().toMap
    assert(out("g1") == 8.0) // ceil(0.75*10)=8 → 8th smallest
    assert(out("g2") == 9.0) // ceil(0.75*3)=3 → 3rd smallest
  }

  test("percentileThreshold is deterministic under heavy ties") {
    val df = Seq.tabulate(8)(i => ("g", 1.0, i.toLong))
      .toDF("g", "v", "id")
    val out = Relational.percentileThreshold(df, "g", "v", "id", 0.5)
      .as[(String, Double)].collect()
    assert(out.toSeq == Seq(("g", 1.0)))
  }

  test("morton16 interleaves bits (x even positions, y odd)") {
    val df = Seq((3L, 5L), (65535L, 0L), (0L, 65535L), (0L, 0L),
      (1023L, 1023L)).toDF("x", "y")
    val got = df.select(Relational.morton16($"x", $"y")).as[Long].collect()
    // x=3 (b011), y=5 (b101): bits x0,y0,x1,y1,x2,y2 = 1,1,1,0,0,1 → 100111b
    assert(got(0) == 39L)
    assert(got(1) == 0x55555555L) // all even positions
    assert(got(2) == 0xAAAAAAAAL) // all odd positions
    assert(got(3) == 0L)
    assert(got(4) == (1L << 20) - 1) // 10+10 bits fill the low 20 exactly
  }

  test("morton16 cells bound both dimensions (the data-skipping claim)") {
    // 4096 grid points; cell = z >> 12 covers a 64x64 (x, y) block, so
    // every cell's min/max span must stay within 64 on EACH dimension.
    val pts = for { x <- 0 until 64; y <- 0 until 64 }
      yield (x.toLong * 16, y.toLong * 16)
    val stats = pts.toDF("x", "y")
      .select($"x", $"y",
        shiftright(Relational.morton16($"x", $"y"), 12).as("cell"))
      .groupBy($"cell")
      .agg(max($"x") - min($"x"), max($"y") - min($"y"))
      .as[(Long, Long, Long)].collect()
    assert(stats.nonEmpty)
    assert(stats.forall { case (_, dx, dy) => dx < 64 && dy < 64 })
  }

  test("histogramQuantile reads the p90 bin off the cumulative histogram") {
    // g1: 100 values spread over bins 0..99 (v = i/1024) → p90 at the
    // bin holding rank 90, i.e. bin 89; g2: all mass in one bin.
    val rows = (0 until 100).map(i => ("g1", i / 1024.0)) ++
      Seq.fill(5)(("g2", 512.5 / 1024.0))
    val out = Relational
      .histogramQuantile(rows.toDF("g", "v"), "g", "v", 0.9, 1024)
      .as[(String, Long, Int, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("g1") == ("g1", 100L, 89, 89.0 / 1024))
    assert(out("g2") == ("g2", 5L, 512, 512.0 / 1024))
  }

  test("histogramQuantile clamps v=1.0 into the top bin") {
    val out = Relational.histogramQuantile(
      Seq(("g", 1.0), ("g", 1.0)).toDF("g", "v"), "g", "v", 0.9, 1024)
      .as[(String, Long, Int, Double)].collect()
    assert(out.toSeq == Seq(("g", 2L, 1023, 1023.0 / 1024)))
  }

  test("funnel: strict sequence — pre-anchor events never convert") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // u1 completes view→click→purchase in order; u2's click PRECEDES
    // its first view (must not count at stage 2); u3 stops at click;
    // u4 has only a purchase (not even stage 1)
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 11:00:00"), "click"),
      (1L, ts("2024-01-01 12:00:00"), "purchase"),
      (2L, ts("2024-01-01 09:00:00"), "click"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (3L, ts("2024-01-01 10:00:00"), "view"),
      (3L, ts("2024-01-01 11:00:00"), "click"),
      (4L, ts("2024-01-01 10:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val out = Relational.funnel(ev, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .orderBy("stage").as[(Int, Long)].collect()
    assert(out.toSeq === Seq((1, 3L), (2, 2L), (3, 1L)))
  }

  test("funnel: same-timestamp step does not convert (strictly after)") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val out = Relational.funnel(ev, "user_id", "ts", "event_type",
      Seq("view", "click")).orderBy("stage").as[(Int, Long)].collect()
    assert(out.toSeq === Seq((1, 1L), (2, 0L)))
  }

  test("retentionCohorts: ISO-week cohort and offsets") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // 2024-01-01 is a Monday. u1 first-seen week of Jan 1, active
    // again in the week of Jan 15 (+2); u2 only the first week; u3
    // first-seen the SECOND week (its own cohort)
    val ev = Seq(
      (1L, ts("2024-01-03 10:00:00")),
      (1L, ts("2024-01-16 10:00:00")),
      (2L, ts("2024-01-01 09:00:00")),
      (3L, ts("2024-01-10 09:00:00"))
    ).toDF("user_id", "ts")
    val out = Relational.retentionCohorts(ev, "user_id", "ts")
      .orderBy("cohort_week", "week_offset")
      .as[(String, Int, Long)].collect()
    assert(out.toSeq === Seq(
      ("2024-01-01", 0, 2L),
      ("2024-01-01", 2, 1L),
      ("2024-01-08", 0, 1L)))
  }
}
