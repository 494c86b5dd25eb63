package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline. All are
  * shuffle-on-key group/join shapes — no pairwise O(n²) stage ever
  * materializes more than LSH-bucket-local candidates, so every
  * operator here survives a 100× scale-up.
  */
object Dedup {

  /** THE DEFAULT exact-dedup path: group by the 128-bit md5 fingerprint
    * of the canonical text instead of the text itself — the shuffle
    * carries 32 bytes per row, not the payload. At 100 TB that is the
    * difference between shuffling the corpus and shuffling 3 GB of
    * keys. (Content-hash grouping; md5 collisions are not a practical
    * concern for non-adversarial dedup — swap for SHA-256 if they are.)
    */
  def exactGroupsByFingerprint(df: DataFrame, textCol: String,
      idCol: String): DataFrame =
    df.select(col(idCol), md5(TextFunctions.normText(col(textCol))).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("group_size"))

  /** Exact dedup keyed by the canonical text ITSELF (min id wins —
    * deterministic), with the group size. Returns the readable norm_key,
    * which means the full normalized payload rides the shuffle — use
    * [[exactGroupsByFingerprint]] (the default) unless the key text is
    * needed in the output; this variant exists as the correctness
    * cross-check for the fingerprint path (q25 vs q39).
    */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(TextFunctions.normText(col(textCol)).as("norm_key"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("group_size"))

  /** Ids to drop under exact dedup (everything but the keeper).
    * Fingerprint-keyed: the window shuffles 32-byte md5 keys, never the
    * payload. */
  def exactDropIds(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col("fp")).orderBy(col(idCol))
    df.select(col(idCol), md5(TextFunctions.normText(col(textCol))).as("fp"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") > 1)
      .select(col(idCol).as("drop_id"))
  }

  /** MinHash-LSH near-dup buckets: signature → band keys → explode →
    * group by (band, key). Returns candidate buckets holding >1 doc —
    * the scale path for near-dup detection (bucket-local verification
    * replaces all-pairs). One shuffle on the band key.
    */
  def minhashLshBuckets(df: DataFrame, textCol: String, idCol: String,
      k: Int = 16, rows: Int = 4): DataFrame =
    df.select(col(idCol),
        array_distinct(TextFunctions.tokens(col(textCol))).as("toks"))
      .select(col(idCol),
        TextFunctions.minhashSigFromTokens(col("toks"), k).as("sig"))
      .select(col(idCol),
        posexplode(TextFunctions.bandKeysFromSig(col("sig"), k, rows))
          .as(Seq("band", "band_key")))
      .groupBy(col("band"), col("band_key"))
      .agg(sort_array(collect_set(col(idCol))).as("ids"),
        count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /** Candidate pairs from LSH buckets, deduped across bands, verified
    * with exact n-gram Jaccard ≥ threshold. Pair blow-up is bounded by
    * bucket sizes, not corpus size.
    */
  /** Mega-buckets (band keys shared by a large fraction of the corpus)
    * are degenerate for near-dup detection and explode quadratically —
    * standard LSH practice is to drop them. 64 keeps pair counts
    * bucket-bounded at any corpus size. */
  val MaxBucketForPairs = 64

  /** Bucket-local verification (the 100 TB shape): each doc's shingle
    * set shuffles ONCE per (doc, band) — bands × corpus bytes, a fixed
    * 4× of the shingle table — instead of once per candidate pair
    * (pair-join shuffle amplification: round 1 spent 203 s here at
    * sf0.1). Candidate generation and exact verification happen inside
    * the ≤maxBucket-member LSH bucket via flatMapGroups; a pair
    * surviving in several bands yields identical (a, b, jaccard) rows,
    * deduped at the end (tiny — only survivors).
    *
    * Further scale lever (not taken, to keep the DuckDB oracle exact on
    * string shingles): hash each shingle to a 64-bit long before the
    * shuffle — 8 bytes per shingle instead of the n-gram text, identical
    * Jaccard up to hash collisions (~2^-64 per comparison).
    */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
      n: Int = 3, threshold: Double = 0.7,
      k: Int = 16, rows: Int = 4,
      maxBucket: Int = MaxBucketForPairs): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val idType = df.schema(idCol).dataType
    val ord = idOrdering(idType)
    // staged Projects: tokens → (shingles, signature) → band keys — each
    // an attribute, so nothing re-tokenizes (TextFunctions staging note).
    // Null text yields a null token array but NON-null shingles ([""] —
    // greatest() skips the null count) and non-null band keys, so two
    // null-text docs would otherwise "verify" at jaccard 1.0; dropping
    // null-toks/null-id rows BEFORE the group stage reproduces the old
    // declarative path's silent null-jaccard exclusion.
    val banded = df
      .select(col(idCol).cast("string").as("id"),
        TextFunctions.tokens(col(textCol)).as("toks"))
      .filter(col("id").isNotNull && col("toks").isNotNull)
      .select(col("id"),
        TextFunctions.shinglesFromTokens(col("toks"), n).as("sh"),
        TextFunctions.minhashSigFromTokens(array_distinct(col("toks")), k)
          .as("sig"))
      .select(col("id"), col("sh"),
        posexplode(TextFunctions.bandKeysFromSig(col("sig"), k, rows))
          .as(Seq("band", "band_key")))
      .as[(String, Seq[String], Int, String)]
    banded
      .groupByKey { case (_, _, band, key) => (band, key) }
      .flatMapGroups { (_: (Int, String), members: Iterator[(String, Seq[String], Int, String)]) =>
        // mega-buckets (> maxBucket) are degenerate — drop, as in the
        // declarative path; cap the materialized group first
        val docs = members.take(maxBucket + 1).toArray
        if (docs.length < 2 || docs.length > maxBucket) Iterator.empty
        else {
          val sorted = docs.sortBy(_._1)(ord)
          val sets = sorted.map(d => d._2.toSet)
          for {
            i <- sorted.indices.iterator
            j <- (i + 1 until sorted.length).iterator
            inter = (sets(i) & sets(j)).size.toDouble
            uni = (sets(i).size + sets(j).size - inter)
            jac = math.floor((if (uni > 0) inter / uni else 0.0) * 10000 + 0.5) / 10000
            if jac >= threshold
          } yield (sorted(i)._1, sorted(j)._1, jac)
        }
      }
      .toDF("a", "b", "jaccard")
      .distinct()
      .select(col("a").cast(idType).as("a"), col("b").cast(idType).as("b"),
        col("jaccard"))
  }

  /** Pair-ordering for ids that rode the group stage as strings: must
    * match Spark's own `col("a") < col("b")` on the ORIGINAL type so the
    * (a, b) orientation is identical to the declarative join path.
    * Integral/decimal strings always re-parse; float/double compare via
    * java.lang.Double (NaN greatest — Spark's NaN ordering); everything
    * else compares in UTF8String binary order (code points), NOT Java
    * UTF-16 code-unit order, which flips for supplementary-plane chars. */
  private def idOrdering(
      idType: org.apache.spark.sql.types.DataType): Ordering[String] = {
    import org.apache.spark.sql.types._
    idType match {
      case ByteType | ShortType | IntegerType | LongType =>
        Ordering.by(_.toLong)
      case _: DecimalType => Ordering.by(BigDecimal(_))
      case FloatType | DoubleType =>
        (a: String, b: String) =>
          java.lang.Double.compare(java.lang.Double.parseDouble(a),
            java.lang.Double.parseDouble(b))
      case _ =>
        (a: String, b: String) =>
          org.apache.spark.unsafe.types.UTF8String.fromString(a)
            .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b))
    }
  }

  /** SimHash near-dup: 64-bit simhash via the native Catalyst
    * expression, banded into 4×16-bit sub-keys — two docs within
    * Hamming distance 3 share at least one exact sub-key (pigeonhole),
    * so candidate generation is again a bucket join, then exact
    * Hamming verification.
    */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3): DataFrame = {
    val hashed = df.select(col(idCol).as("id"),
      Expressions.simhash64(TextFunctions.normText(col(textCol))).as("sh"))
    val banded = hashed.select(col("id"), col("sh"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("sh"), b * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("band", "key")))
    val l = banded.toDF("a", "sh_a", "band", "key")
    val r = banded.toDF("b", "sh_b", "band", "key")
    l.join(r, Seq("band", "key"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding near-dup pairs: cosine ≥ threshold, candidates bucketed
    * by a coarse partition key (`bucketCol`, e.g. a cluster/LSH label)
    * so the self-join is bucket-local.
    */
  def embeddingNearDups(df: DataFrame, vecCol: String, idCol: String,
      bucketCol: String, threshold: Double): DataFrame = {
    val v = Ann.withNormalized(
        df.select(col(idCol).as("id"), col(bucketCol).as("bkt"),
          col(vecCol).as("_emb")),
        "_emb", "v")
      .select(col("id"), col("bkt"), col("v"))
    val l = v.toDF("a", "bkt", "va")
    val r = v.toDF("b", "bkt", "vb")
    l.join(r, "bkt")
      .filter(col("a") < col("b"))
      .withColumn("cos", Ann.round4(Ann.dot(col("va"), col("vb"))))
      .filter(col("cos") >= threshold)
      .select(col("a"), col("b"), col("cos"))
  }
}
