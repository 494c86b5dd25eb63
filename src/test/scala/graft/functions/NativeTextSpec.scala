package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bit-equality pins for the r06 native text kernels against the exact
  * Column (higher-order-function) formulations they replaced. The
  * natives exist purely as optimizations — any value difference is a
  * correctness regression, so every edge the old trees handled is
  * asserted: null text, null token arrays, empty arrays, empty-string
  * and duplicate tokens, sub-n token counts, multi-whitespace.
  */
class NativeTextSpec extends SparkSpec {
  import spark.implicits._

  // the legacy formulations, verbatim from the pre-r06 tree
  private def legacyNgrams(t: Column, n: Int): Column = {
    val count = size(t) - (n - 1)
    val grams = transform(
      sequence(lit(0), greatest(count - 1, lit(0))),
      i => concat_ws(" ", (0 until n).map(j => element_at(t, i + j + 1)): _*))
    when(count <= 0, array().cast("array<string>")).otherwise(grams)
  }
  private def legacyShingles(t: Column, n: Int): Column =
    array_distinct(legacyNgrams(t, n))
  private def legacyMinhashSig(toks: Column, k: Int): Column =
    array((0 until k).map { i =>
      array_min(transform(toks, tok => md5(concat(lit(s"$i:"), tok))))
    }: _*)

  private lazy val texts = Seq[Option[String]](
    Some("the quick brown fox jumps over the lazy dog"),
    Some("a a a a a"),
    Some("one two"),
    Some("single"),
    Some(""),
    Some("   "),
    Some("tab\tsep  and   runs\nof newlines mixed   in"),
    None,
    Some("x y z x y z x y z"),
    Some((1 to 200).map(i => s"tok${i % 17}").mkString(" "))
  ).toDF("text")
    .withColumn("t", TextFunctions.tokens(col("text")))

  test("wordNgrams(distinct=false) == transform/concat_ws tree, n=2,3,8") {
    for (n <- Seq(2, 3, 8)) {
      val rows = texts.select(
        TextFunctions.ngramsFromTokens(col("t"), n).as("nat"),
        legacyNgrams(col("t"), n).as("leg")).collect()
      rows.foreach { r => assert(r.get(0) == r.get(1), s"n=$n row=$r") }
    }
  }

  test("wordNgrams(distinct=true) == array_distinct(legacy), n=2,3,8") {
    for (n <- Seq(2, 3, 8)) {
      val rows = texts.select(
        TextFunctions.shinglesFromTokens(col("t"), n).as("nat"),
        legacyShingles(col("t"), n).as("leg")).collect()
      rows.foreach { r => assert(r.get(0) == r.get(1), s"n=$n row=$r") }
    }
  }

  test("wordNgrams skips null window elements exactly like concat_ws") {
    val df = Seq(1).toDF("x").select(
      array(lit("a"), lit(null).cast("string"), lit("b"), lit("c")).as("t"))
    val r = df.select(
      TextFunctions.ngramsFromTokens(col("t"), 3).as("nat"),
      legacyNgrams(col("t"), 3).as("leg")).head()
    assert(r.get(0) == r.get(1))
    assert(r.getSeq[String](0) == Seq("a b", "b c")) // nulls skipped, no pad
  }

  test("hashedWordNgrams == arrayFnv1a64 over the gram strings") {
    for (n <- Seq(2, 3, 8); d <- Seq(true, false)) {
      val nat = texts.select(
        Expressions.hashedWordNgrams(col("t"), n, distinct = d).as("v"))
        .collect().map(r => Option(r.get(0)).map(_.toString))
      val legBase =
        if (d) legacyShingles(col("t"), n) else legacyNgrams(col("t"), n)
      val leg = texts.select(Expressions.arrayFnv1a64(legBase).as("v"))
        .collect().map(r => Option(r.get(0)).map(_.toString))
      assert(nat.toSeq == leg.toSeq, s"n=$n distinct=$d")
    }
  }

  test("minhashMd5Sig == array_min(transform(md5)) tree incl. dedup, null, empty") {
    for (k <- Seq(4, 16)) {
      val rows = texts.select(
        TextFunctions.minhashSigFromTokens(col("t"), k).as("nat"),
        legacyMinhashSig(array_distinct(col("t")), k).as("leg")).collect()
      rows.foreach { r => assert(r.get(0) == r.get(1), s"k=$k row=$r") }
      // the old tree without array_distinct must also agree (min over
      // multiset == min over set)
      val rows2 = texts.select(
        TextFunctions.minhashSigFromTokens(col("t"), k).as("nat"),
        legacyMinhashSig(col("t"), k).as("leg")).collect()
      rows2.foreach { r => assert(r.get(0) == r.get(1), s"k=$k row=$r") }
    }
  }

  test("minhashMd5Sig of a NULL token array is an array of k nulls (not null)") {
    val df = Seq(Option.empty[Seq[String]]).toDF("t")
    val r = df.select(
      TextFunctions.minhashSigFromTokens(col("t"), 4).as("nat"),
      array_join(TextFunctions.minhashSigFromTokens(col("t"), 4), "|").as("j"))
      .head()
    assert(r.getSeq[String](0) == Seq(null, null, null, null))
    assert(r.getString(1) == "") // array_join skips nulls — q26's shape
  }

  test("dsir feature hashing: chained-state bigram hash == fnv of joined string") {
    val df = Seq("alpha beta gamma").toDF("text")
      .withColumn("t", TextFunctions.tokens(col("text")))
    val r = df.select(
      Expressions.hashedWordNgrams(col("t"), 2, distinct = false).as("nat"),
      Expressions.arrayFnv1a64(legacyNgrams(col("t"), 2)).as("leg")).head()
    assert(r.get(0).toString == r.get(1).toString)
  }
}
