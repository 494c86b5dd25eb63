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

  /** Exact dedup on canonical text: one surviving row per distinct
    * normalized text (min id wins — deterministic), with the group
    * size. Hash-aggregate, one shuffle on the norm key.
    */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(TextFunctions.normText(col(textCol)).as("norm_key"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("group_size"))

  /** Scale path for exact dedup: group by the 128-bit md5 fingerprint
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

  /** Ids to drop under exact dedup (everything but the keeper). */
  def exactDropIds(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(TextFunctions.normText(col(textCol)))
      .orderBy(col(idCol))
    df.withColumn("rn", row_number().over(w))
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

  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
      n: Int = 3, threshold: Double = 0.7,
      k: Int = 16, rows: Int = 4,
      maxBucket: Int = MaxBucketForPairs): DataFrame = {
    val withShingles = df.select(col(idCol).as("id"),
      TextFunctions.shingles(col(textCol), n).as("sh"))
    val buckets = minhashLshBuckets(df, textCol, idCol, k, rows)
      .filter(col("n") <= maxBucket)
    val pairs = buckets
      .select(explode(col("ids")).as("a"), col("ids"))
      .select(col("a"), explode(col("ids")).as("b"))
      .filter(col("a") < col("b"))
      .distinct()
    val a = withShingles.toDF("a", "sh_a")
    val b = withShingles.toDF("b", "sh_b")
    pairs.join(a, "a").join(b, "b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("jaccard", Ann.round4(
        when(col("uni") > 0, col("inter") / col("uni")).otherwise(0.0)))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
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
    val v = df.select(col(idCol).as("id"), col(bucketCol).as("bkt"),
      Ann.normalized(col(vecCol)).as("v"))
    val l = v.toDF("a", "bkt", "va")
    val r = v.toDF("b", "bkt", "vb")
    l.join(r, "bkt")
      .filter(col("a") < col("b"))
      .withColumn("cos", Ann.round4(Ann.dot(col("va"), col("vb"))))
      .filter(col("cos") >= threshold)
      .select(col("a"), col("b"), col("cos"))
  }
}
