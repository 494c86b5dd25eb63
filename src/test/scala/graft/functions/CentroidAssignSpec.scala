package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pins for the r06 scale-safe centroid assignment (round-5 verdict
  * directive #1): `Ann.withIvfCell` now ships centroids as a Spark
  * broadcast consumed by the native NearestCentroid expression instead
  * of embedding them as plan literals. The spec proves (a) bit-equal
  * cell assignment vs the legacy literal-array argmin tree, including
  * ties, nulls, and ragged vectors; (b) the plan stays O(1) — no
  * centroid literals — at a forced 10⁴-centroid dial the literal tree
  * could never plan.
  */
class CentroidAssignSpec extends SparkSpec {

  // the legacy formulation, verbatim from the pre-r06 tree
  private def legacyCell(df: DataFrame, vecCol: String,
      centroids: Array[Array[Double]], out: String): DataFrame =
    df.withColumn("_v", transform(col(vecCol), x => x.cast("double")))
      .withColumn("_d", array(centroids.map(c =>
        Expressions.arrayL2Sq(col("_v"), array(c.map(lit): _*))): _*))
      .withColumn(out,
        array_position(col("_d"), array_min(col("_d"))).cast("int"))
      .drop("_v", "_d")

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  test("broadcast assignment == legacy literal-array argmin (64 cells, ties, nulls)") {
    import spark.implicits._
    val dim = 8
    val cents = Array.tabulate(64, dim)((c, d) =>
      (mix(c * 1000L + d).toDouble / Long.MaxValue))
    // duplicate centroid 7 at index 20 → equidistant ties must resolve
    // to the FIRST index on both paths
    cents(20) = cents(7).clone()
    val rows: Seq[Option[Seq[Option[Float]]]] =
      (0 until 500).map { i =>
        Some((0 until dim).map(d =>
          Some((mix(i * 31L + d).toDouble / Long.MaxValue).toFloat)))
      } ++ Seq(
        None, // null vector
        Some(Seq(Some(1f), Some(2f))), // ragged (dim mismatch)
        Some((0 until dim).map(d =>
          if (d == 3) None else Some(0.5f))), // null element
        Some(cents(7).map(x => Some(x.toFloat)).toSeq) // exact centroid hit
      )
    val df = rows.toDF("embedding")
    val nat = Ann.withIvfCell(df, "embedding", cents, "cell")
      .select(col("cell")).collect().map(r => Option(r.get(0)))
    val leg = legacyCell(df, "embedding", cents, "cell")
      .select(col("cell")).collect().map(r => Option(r.get(0)))
    assert(nat.toSeq == leg.toSeq)
    assert(nat.takeRight(4).take(3).forall(_.isEmpty)) // null/ragged/null-elem
  }

  test("10k-centroid assignment: O(1) plan, no centroid literals, correct argmin") {
    val nCents = 10000
    val dim = 4
    val cents = Array.tabulate(nCents, dim)((c, d) =>
      (mix(c * 7L + d).toDouble / Long.MaxValue))
    import spark.implicits._
    val vecs = (0 until 200).map(i =>
      (0 until dim).map(d => (mix(i * 13L + d).toDouble / Long.MaxValue).toFloat))
    val df = vecs.toDF("embedding")
    val out = Ann.withIvfCell(df, "embedding", cents, "cell")
    val planStr = out.queryExecution.executedPlan.toString
    assert(planStr.length < 20000,
      s"plan is ${planStr.length} chars — centroid literals leaked into the plan")
    // a distinctive centroid component must not appear as a literal
    val marker = cents(1234)(2).toString
    assert(!planStr.contains(marker), "centroid literal found in plan")
    val got = out.select(col("cell")).collect().map(_.getInt(0))
    // Scala reference argmin (same double arithmetic, first min wins)
    val expect = vecs.map { v =>
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < nCents) {
        var s = 0.0; var j = 0
        while (j < dim) {
          val d = v(j).toDouble - cents(c)(j); s += d * d; j += 1
        }
        if (s < bestD) { bestD = s; best = c }
        c += 1
      }
      best + 1
    }
    assert(got.toSeq == expect)
  }

  test("ivf queries still agree with the refine path end to end (smoke)") {
    // q38/q46/q52/q65/q69/q84/q91 stay oracle-pinned by Verify; this is
    // the in-suite smoke that the broadcast path composes with
    // ivfRefine's decimal determinism (assignment feeds the sums).
    import spark.implicits._
    val dim = 8
    val df = (0 until 300).map(i =>
      (i.toLong, (0 until dim).map(d =>
        (mix(i * 17L + d).toDouble / Long.MaxValue).toFloat)))
      .toDF("vec_id", "embedding")
    val q = (0 until dim).map(d => mix(999L + d).toDouble / Long.MaxValue)
    val top = Ann.ivfTopK(df, "embedding", "vec_id", q, 5,
      nCentroids = 16, refineIters = 1)
    assert(top.count() == 5)
  }
}
