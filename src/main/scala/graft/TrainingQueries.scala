package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{Ann, Corpus, Dedup, Expressions, TextFunctions}

/** Training-data pipeline operators as driver-checkable queries:
  * dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding
  * cosine), similarity search (brute force + sign-LSH), and text
  * analysis (lang-id, quality, token stats, fingerprints) — each over
  * the documents/embeddings test tables with a DuckDB oracle wherever
  * the semantics are SQL-expressible.
  */
object TrainingQueries {

  /** NOT fanned out at the source: a blanket repartition taxes every
    * trivial-map query (+0.1-0.3 s each measured) and multi-branch
    * self-joins pay it once per branch. The operators/queries whose map
    * stages are genuinely CPU-heavy fan out themselves (Dedup/Corpus
    * internals, [[docsFanned]] below). */
  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** The fanned variant for queries whose per-doc map work is heavy
    * (quality/lang-ID scoring ~100s of µs/doc of interpreted HOFs, or
    * corpus-wide token explodes feeding a persisted relation) — the
    * cases where the one extra small exchange measurably wins (see
    * Exec.fanOutForCpu; no-op at real scale). */
  private def docsFanned(s: SparkSession, dir: String): DataFrame =
    graft.functions.Exec.fanOutForCpu(docs(s, dir))
  // embeddings deliberately NOT fanned out at the source: the ANN map
  // stages are native codegen'd dots (light per row, unlike tokenize/
  // md5), several consumers are point lookups or TakeOrdered scans
  // where an extra exchange+job costs more than the parallelism buys
  // (measured: q28 0.36→0.77 with a source fan-out), and the pair
  // generators that ARE per-row-heavy fan out inside Dedup/Ann.
  private def embs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** Scale detection by the sf dir's BASENAME, never the full path —
    * `dir.contains("0.1")` would also match a checkout under e.g.
    * `/data/v0.1/repo` and silently flip every fixture-scoped query to
    * the wrong slice while the (events-count-keyed) oracles stay put.
    * ("sf0.01"/"sf0.001" do not contain the substring "0.1".) */
  private[graft] def sfBaseName(dir: String): String =
    new java.io.File(dir).getName

  private[graft] def isSf01(dir: String): Boolean =
    sfBaseName(dir).contains("0.1")

  private val K = 16 // minhash signature size
  private val R = 4  // rows per LSH band

  /** q64 span-dedup window width (tokens) and the planted cross-doc
    * boilerplate spans — apostrophe-free so the same literals embed in
    * the DuckDB oracle. Both are ≥ SpanK tokens, so every planted copy
    * is guaranteed to contain at least one duplicated SpanK-gram. */
  private val SpanK = 8
  private val SpanBoiler1 =
    "this content is provided as is without any warranty of any kind " +
      "either express or implied"
  private val SpanBoiler2 =
    "click here to subscribe to our newsletter and never miss an " +
      "update from our team"

  /** Query vector = embedding of vec_id 0 (driver point lookup, like
    * the reference's watermark read). */
  private def queryVec(s: SparkSession, dir: String): Seq[Double] =
    embs(s, dir).filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)

  /** BM25 top-k (Robertson/Sparck Jones, k1=1.2 b=0.75) for the fixed
    * lexical query {spark, merge, vector} — shared by q81 (k=10) and
    * the q86 fusion arm (k=20). Scale shape and the exactness
    * discipline are documented on the q81 entry. */
  private def bm25TopK(s: SparkSession, dir: String, k: Int): DataFrame = {
    val qTerms = Seq("spark", "merge", "vector")
    val docTok = Dedup.trackPersisted(
      docsFanned(s, dir)
        .select(col("doc_id"),
          explode(TextFunctions.tokens(lower(col("text")))).as("tok"))
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("tf"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val dlen = docTok.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    // corpus stats straight off the cached token relation — one agg
    // instead of re-running the dlen aggregation a second time:
    // count(distinct doc) == dlen row count, sum(tf) == sum(dl)
    val stats = docTok.agg(
      countDistinct(col("doc_id")).as("n"), sum(col("tf")).as("sumdl"))
    val idf = broadcast(
      docTok.filter(col("tok").isin(qTerms: _*))
        .groupBy(col("tok")).agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(stats))
        .select(col("tok"),
          Ann.round4(log(
            (col("n").cast("double") - col("df").cast("double") + 0.5) /
              (col("df").cast("double") + 0.5))).as("idf"),
          (col("sumdl").cast("double") / col("n").cast("double"))
            .as("avgdl")))
    docTok.filter(col("tok").isin(qTerms: _*))
      .join(dlen, "doc_id")
      .join(idf, "tok")
      .select(col("doc_id"),
        Ann.round4(col("idf") * ((col("tf").cast("double") * 2.2) /
          (col("tf").cast("double") + lit(1.2) *
            (lit(0.25) + lit(0.75) *
              (col("dl").cast("double") / col("avgdl"))))))
          .cast("decimal(18,4)").as("contrib"))
      .groupBy(col("doc_id"))
      .agg(sum(col("contrib")).cast("double").as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_token_count" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_tok"))),

    "q21_lang_id" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextFunctions.langId(col("text")).as("lang_pred"))),

    "q22_quality_score" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextFunctions.qualityScore(col("text")).as("q"))),

    "q23_fingerprint" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextFunctions.docFingerprint(col("text")).as("fp"))),

    "q24_rolling_hash" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextFunctions.tokenRollingHash(col("text")).as("rh"))),

    "q25_exact_dedup" -> ((s, dir) =>
      Dedup.exactGroups(docs(s, dir), "text", "doc_id")),

    "q39_exact_dedup_fp" -> ((s, dir) =>
      Dedup.exactGroupsByFingerprint(docs(s, dir), "text", "doc_id")),

    // the drop-list variant of exact dedup (everything but the keeper,
    // fingerprint-keyed window). The sf tables are dup-free at the
    // driver's sf, so both sides synthesize the same duplicates
    // deterministically (every 10th doc re-inserted under id+100000) —
    // the operator does real work instead of returning an empty set
    "q49_exact_dropids" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val dupes = d.filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + 100000)
      Dedup.exactDropIds(d.unionByName(dupes), "text", "doc_id")
    }),

    "q26_minhash_sig" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          TextFunctions.tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          // the native sig dedups tokens internally (min over the
          // distinct set == min over the multiset)
          array_join(TextFunctions.minhashSigFromTokens(col("toks"), K), "|")
            .as("sig"))),

    "q27_lsh_buckets" -> ((s, dir) =>
      Dedup.minhashLshBuckets(docs(s, dir), "text", "doc_id", K, R)
        .select(col("band"), col("band_key"),
          concat_ws(",", transform(col("ids"), _.cast("string"))).as("ids"),
          col("n"))),

    "q28_cosine_topk" -> ((s, dir) =>
      Ann.cosineTopK(embs(s, dir), "embedding", "vec_id",
        queryVec(s, dir), 10)),

    // native Catalyst expressions (fnv1a64 / simhash64): no SQL oracle,
    // pinned by ExpressionsSpec unit tests instead
    "q29_simhash" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        Expressions.simhash64(TextFunctions.normText(col("text"))).as("sh"),
        Expressions.fnv1a64(TextFunctions.normText(col("text"))).as("fnv"))),

    // the TEMPLATE-family operating point (Hamming ≤ 8 — boilerplate
    // cluster discovery, between q47's ≤3-bit pigeonhole guarantee and
    // noise): 40 planted families whose members sit within 4 bits of
    // their base, so intra-family pairs are ≤ 8 apart and cross-family
    // pairs ~32. Replaces the round-1..3 maxHamming=16 run over the
    // dup-free documents table, whose survivors were band-collision
    // noise — every pair this finds is a real template near-dup.
    // (The oracle mirrors the 4×16-bit banding exactly, so 4..8-bit
    // pairs — candidates only when a band survives untouched — agree
    // pair-for-pair without needing guaranteed recall.)
    "q30_simhash_templates" -> ((s, dir) =>
      Dedup.simhashPairs(
        s.read.parquet(graft.fixtures.FixtureGen.SimhashTemplatesPath),
        "text", "doc_id", maxHamming = 8)),

    // the operator's tight operating point: Hamming ≤ 3 (the pigeonhole
    // bound of the 4×16-bit banding) over a frozen corpus with PLANTED
    // variants at distance 1..3 (FixtureGen.neardupDocs) — the survivor
    // set is actual near-dups, recomputed from text on both sides
    "q47_simhash_neardups" -> ((s, dir) =>
      Dedup.simhashPairs(
        s.read.parquet(graft.fixtures.FixtureGen.NearDupDocsPath),
        "text", "doc_id", maxHamming = 3)),

    // the PRODUCTION-CPU dedup path, oracle-green: xxhash64 minhash
    // signatures + 8-byte band keys + FNV-hashed shingles over the
    // planted fast-minhash corpus. The fixture's accept-reject
    // guarantees every planted pair shares a band under the fast
    // family, so the verified survivor set equals ALL pairs at
    // Jaccard ≥ 0.7 — which the oracle brute-forces from text alone
    // (450 docs; no banding model needed in SQL)
    "q57_fastminhash_neardups" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(
        s.read.parquet(graft.fixtures.FixtureGen.NearDupFastDocsPath),
        "text", "doc_id", n = 3, threshold = 0.7, K, R,
        hashShingles = true, fastMinhash = true)),

    "q31_jaccard_pairs" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(docs(s, dir), "text", "doc_id",
        n = 3, threshold = 0.2, K, R)),

    // the 100 TB shuffle lever of q31: shingles ride the exchange as
    // 8-byte FNV-1a longs instead of n-gram text — identical Jaccard up
    // to 2^-64 collisions (the oracle hashes its grams the same way)
    "q45_jaccard_pairs_hashed" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(docs(s, dir), "text", "doc_id",
        n = 3, threshold = 0.2, K, R, hashShingles = true)),

    "q32_embedding_neardups" -> ((s, dir) =>
      Dedup.embeddingNearDups(embs(s, dir), "embedding", "vec_id",
        "label", threshold = 0.2)),

    // the dedup pipeline's FINAL step: pairwise near-dup edges →
    // transitive clusters (keep one doc per connected component, not
    // per pair); min-label propagation in Spark vs a recursive-CTE
    // reachability closure in the oracle
    "q50_dup_clusters" -> ((s, dir) =>
      Dedup.dupClusters(
        Dedup.ngramJaccardPairs(docs(s, dir), "text", "doc_id",
          n = 3, threshold = 0.2, K, R),
        "a", "b")),

    // the SAME clustering contract computed by the O(log n)-round
    // large-star/small-star algorithm (Kiveris et al.) instead of
    // O(diameter) min-label propagation — the variant that still
    // converges on long-chain dup graphs (a template drifting one
    // token per crawl). Same edge set, same reachability oracle as q50.
    "q59_dup_clusters_star" -> ((s, dir) =>
      Dedup.dupClustersStar(
        Dedup.ngramJaccardPairs(docs(s, dir), "text", "doc_id",
          n = 3, threshold = 0.2, K, R),
        "a", "b")),

    // Gopher-style repetition signal: duplicate-token fraction per doc
    // (1 - distinct/total) — the standard repetitious-text filter input
    "q42_repetition" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("t"))
        .select(col("doc_id"),
          TextFunctions.repetitionFromTokens(col("t")).as("rep_frac"))),

    // lang-ID evaluation: confusion rollup of predicted vs labeled lang
    "q43_langid_eval" -> ((s, dir) =>
      docsFanned(s, dir)
        .select(col("lang"), TextFunctions.langId(col("text")).as("lang_pred"))
        .groupBy(col("lang"), col("lang_pred"))
        .agg(count(lit(1)).as("n"))),

    // the pipeline ENDPOINT: training-set selection composing the
    // individual signals — quality floor, confident lang-ID, repetition
    // ceiling, and exact-dedup keeper (first doc per content
    // fingerprint) — the SELECT that actually builds a training corpus
    // from the filter family above
    // signals + fingerprint are staged BEFORE the keeper rank, so the
    // window's exchange carries (doc_id, q, lang_pred, rep, fp) — a few
    // dozen bytes per doc — never the payload text
    "q51_training_selection" -> ((s, dir) =>
      Dedup.rankByFingerprint(
          docsFanned(s, dir).select(col("doc_id"),
            TextFunctions.qualityScore(col("text")).as("q"),
            TextFunctions.langId(col("text")).as("lang_pred"),
            TextFunctions.tokens(col("text")).as("t"),
            md5(TextFunctions.normText(col("text"))).as("fp"))
          .withColumn("rep", TextFunctions.repetitionFromTokens(col("t")))
          .drop("t"), "doc_id")
        .filter(col("rn") === 1 && col("q") >= 0.5 &&
          col("rep") <= 0.2 && col("lang_pred") =!= "und")
        .select(col("doc_id"), col("lang_pred"), col("q"), col("rep"))),

    // corpus profile: per (source, lang) doc counts / chars / tokens —
    // the standard pre-training corpus-stats rollup
    "q44_corpus_stats" -> ((s, dir) =>
      docs(s, dir)
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("docs"),
          sum(col("n_chars")).as("chars"),
          sum(TextFunctions.tokenCount(col("text")).cast("long")).as("tokens"))),

    // self-contained near-dup scale path: bucket by computed sign-LSH
    // (no pre-existing label column needed), then bucket-local capped
    // pairs; 8 planes is the oracle-pinned small-scale operating point
    "q41_lsh_neardups" -> ((s, dir) =>
      Dedup.lshNearDups(embs(s, dir), "embedding", "vec_id",
        nPlanes = 8, dim = 64, threshold = 0.2)),

    // the corpus-scale operating point of the same operator: nPlanes
    // sized ~log₂(N) so expected occupancy N/2^nPlanes stays O(1) —
    // 12 planes = 4096 buckets here (the oracle pins 12; at 10⁹ vectors
    // the same dial reads 24)
    "q48_lsh_neardups_scaled" -> ((s, dir) =>
      Dedup.lshNearDups(embs(s, dir), "embedding", "vec_id",
        nPlanes = 12, dim = 64, threshold = 0.2)),

    "q33_lsh_ann" -> ((s, dir) =>
      Ann.lshTopK(embs(s, dir), "embedding", "vec_id",
        queryVec(s, dir), 10)),

    // SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    // at web-scale through semantic deduplication") — the variant with
    // a DETERMINISTIC coarse quantizer: the IVF seed-sample cells
    // (lowest-id vectors, no Lloyd step — the paper uses k-means; the
    // bit-deterministic ivfRefine of q52/q65 could slot in, but the
    // oracle pins the seed-sample form) act as semantic clusters,
    // near-identical pairs are found ONLY within a cell (cosine ≥ 0.95
    // on the 4-decimal-rounded dot), transitive closure keeps one doc
    // per component (min id), everything else lands on the drop list.
    // Scale shape: the cell count is max(⌈√N⌉, ⌈N/128⌉), so EXPECTED
    // occupancy stays ≤ ~128 at any N — under the 256 occupancy cap,
    // which otherwise would silently drop every cell (and the planted
    // signal with them) once √N outgrew it; cell assignment is one
    // broadcast-centroid projection; the within-cell self-join is
    // bucket-local and capped; clusters resolve by the same min-label
    // propagation as q50; the embeddings scan exactly once (persisted
    // base feeds the count, the centroid collect, and the pipeline).
    // Both sides plant exact duplicate vectors (cosine 1.0) for every
    // 25th embedding under id+500000 (fail-fast if real ids ever reach
    // that range — a collision would silently diverge the two engines'
    // cell assignments).
    "q69_semdedup" -> ((s, dir) => {
      val e0 = Dedup.trackPersisted(
        embs(s, dir).select(col("vec_id"), col("embedding"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      // one driver action instead of two (id-range guard + aug count):
      // |aug| == |e0| + |{vec_id % 25 == 0}| by construction
      val pre = e0.agg(max(col("vec_id")).as("mx"), count(lit(1)).as("c"),
        sum(when(col("vec_id") % 25 === 0, 1L).otherwise(0L)).as("c25"))
        .head()
      require(pre.getLong(0) < 500000L,
        "q69 planted-id offset collides with real vec_ids")
      val aug = e0.unionByName(e0.filter(col("vec_id") % 25 === 0)
        .select((col("vec_id") + 500000).as("vec_id"), col("embedding")))
      val n = (pre.getLong(1) + pre.getLong(2)).toDouble
      val nc = math.max(math.ceil(math.sqrt(n)), math.ceil(n / 128)).toInt
      val cents = Ann.ivfCentroids(aug, "embedding", "vec_id", nc)
      val celled = Ann.withIvfCell(aug, "embedding", cents, "cell")
      val pairs = Dedup.embeddingNearDups(celled, "embedding", "vec_id",
        "cell", threshold = 0.95)
      Dedup.dupClusters(pairs, "a", "b")
        .filter(col("id") =!= col("cluster"))
        .select(col("id").as("drop_id"))
    }),

    "q38_ivf_ann" -> ((s, dir) =>
      Ann.ivfTopK(embs(s, dir), "embedding", "vec_id",
        queryVec(s, dir), 10)),

    // ANN EVALUATION: recall@10 of the sign-LSH index (bucket +
    // Hamming-1 probes) against the exact scan, for a 20-query eval
    // set, in ONE distributed pass — the measurement every approximate
    // index needs before it replaces the exact path. Scale shape: the
    // corpus is normalized + bucketed once (persisted, single scan);
    // the eval queries broadcast (eval sets are small, corpora are
    // not); the exact baseline is a broadcast nested-loop against the
    // 20-row query table (inherently N×Q — that IS the exact scan);
    // the approx side touches only probe-bucket candidates. Ranking
    // uses the 4-decimal-rounded cosine then vec_id, the same
    // deterministic tie order as every ANN oracle here.
    "q66_ann_recall" -> ((s, dir) =>
      Ann.annRecall(embs(s, dir), "embedding", "vec_id",
        col("vec_id") < 20, k = 10, nPlanes = 8, dim = 64)),

    // the scale-parameterized IVF operating point: nCentroids = ⌈√N⌉
    // (the standard balance between cell-scan cost and probe fan-out) —
    // the oracle recomputes the same ⌈√N⌉ via a scalar subquery in its
    // LIMIT, so the dial is exercised, not pinned
    "q46_ivf_sqrt" -> ((s, dir) => {
      val e = embs(s, dir)
      val nc = math.ceil(math.sqrt(e.count().toDouble)).toInt
      Ann.ivfTopK(e, "embedding", "vec_id", queryVec(s, dir), 10,
        nCentroids = nc)
    }),

    // one distributed Lloyd iteration over the coarse quantizer before
    // probing — exact decimal(30,12) per-(cell,dim) sums make the
    // refined centroids bit-deterministic across engines, so the oracle
    // recomputes the full refinement in SQL and the probe set, cell
    // assignment, and final top-k all agree
    "q52_ivf_refined" -> ((s, dir) =>
      Ann.ivfTopK(embs(s, dir), "embedding", "vec_id",
        queryVec(s, dir), 10, refineIters = 1)),

    // TWO Lloyd steps: one step is a demo, two proves the
    // bit-determinism scheme (quantized decimal sums, double divide)
    // survives composition — step 2's cell boundaries depend on step
    // 1's rounded centroids, so any cross-engine drift in step 1 would
    // cascade into different assignments here
    "q65_ivf_refined2" -> ((s, dir) =>
      Ann.ivfTopK(embs(s, dir), "embedding", "vec_id",
        queryVec(s, dir), 10, refineIters = 2)),

    // eval-set decontamination: flag every TRAIN doc sharing an 8-gram
    // with the EVAL corpus (the standard n-gram overlap rule). Both
    // sides derive eval = every 50th doc and inject known-contaminated
    // train copies of it (id+200000) so the check has true positives at
    // any sf; grams ride the semi join as 8-byte FNV longs (the q45
    // shuffle lever), and the broadcast of the eval gram set is the
    // 100 TB shape — eval corpora are small, train corpora are not
    "q56_decontaminate" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val evalDocs = d.filter(col("doc_id") % 50 === 0)
      val train = d.filter(col("doc_id") % 50 =!= 0)
        .unionByName(evalDocs.withColumn("doc_id", col("doc_id") + 200000))
      // null text yields null tokens but a NON-null [""] shingle list
      // (the greatest() null-skip — same hazard ngramJaccardPairs
      // filters, Dedup.scala), which would plant a phantom FNV("")
      // gram the oracle never emits — drop null-token docs first
      def grams(df: DataFrame) = df
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("t"))
        .filter(col("t").isNotNull)
        .select(col("doc_id"), explode(Expressions.arrayFnv1a64(
          TextFunctions.shinglesFromTokens(col("t"), 8))).as("g"))
      val evalGrams = grams(evalDocs).select(col("g")).distinct()
      grams(train)
        .join(broadcast(evalGrams), Seq("g"), "left_semi")
        .select(col("doc_id")).distinct()
    }),

    // DSIR-style importance weights (Xie et al. 2023, "Data Selection
    // for Language Models via Importance Resampling"): features are
    // unigrams+bigrams hashed into a FIXED 10k-bucket space; a doc's
    // weight is Σ n_b · ln(p_target(b)/p_raw(b)) with Laplace
    // smoothing, target = every 50th doc (the q56 split convention).
    // Scale shape: the feature space is fixed-size, so the per-bucket
    // log-ratio table is 10k rows and BROADCASTS regardless of corpus
    // size; doc features pre-aggregate to (doc, bucket, n) with
    // map-side combine before any join; the corpus is featurized once
    // (persisted docFeat feeds both the bucket counts and the scoring
    // join). Determinism: per-bucket λ is floor-quantized to 4
    // decimals and the per-doc sum is an exact DECIMAL(18,4) — the
    // q55 scheme, with the same disclosed ~1-ulp ln() caveat.
    "q67_dsir_weights" -> ((s, dir) =>
      TextFunctions.dsirWeights(docs(s, dir), "text", "doc_id",
        isTarget = col("doc_id") % 50 === 0)),

    // FUZZY eval-set decontamination (the GPT-3-style near-dup variant
    // of q56's exact 8-gram rule): flag every train doc whose 3-gram
    // Jaccard with ANY eval doc reaches 0.5 — catches lightly edited
    // contamination (appended boilerplate, small perturbations) that
    // exact gram overlap can miss when grams shift. Both sides plant
    // the positives: near-copies of every eval doc (three appended
    // sentinel tokens → Jaccard ≈ n/(n+5), well above threshold) enter
    // the train split under id+300000. Candidates come from the SAME
    // MinHash-band machinery as q31/q45 (bucket-local, occupancy-
    // capped, hashed shingles on the exchange), run over the combined
    // corpus; only cross-split pairs flag. The oracle mirrors the
    // banding exactly, so probabilistic band recall agrees
    // pair-for-pair.
    "q68_fuzzy_decontam" -> ((s, dir) => {
      val d = docs(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"), col("text"))
      val ev = d.filter(col("doc_id") % 50 === 0)
      val corpus = d.filter(col("doc_id") % 50 =!= 0)
        .unionByName(ev.select((col("doc_id") + 300000).as("doc_id"),
          concat(col("text"), lit(" zqcontam zqcontamb zqcontamc"))
            .as("text")))
        .unionByName(ev)
      val pairs = Dedup.ngramJaccardPairs(corpus, "text", "doc_id",
        n = 3, threshold = 0.5, K, R, hashShingles = true)
      def isEval(id: org.apache.spark.sql.Column) =
        id % 50 === 0 && id < 300000
      pairs.filter(isEval(col("a")) =!= isEval(col("b")))
        .select(when(isEval(col("a")), col("b")).otherwise(col("a"))
          .as("doc_id"))
        .distinct()
    }),

    // PERCENTILE quality gate (the FineWeb/CCNet "keep the top decile
    // per language" selection rule): an exact per-language p90 quality
    // threshold via Relational.percentileThreshold — rank-based, so it
    // reproduces in ANSI SQL, unlike percentile_approx's sketch. Scale
    // shape: only (lang, q, doc_id) rides the window shuffle — the
    // payload never enters an Exchange — and the resulting per-language
    // threshold table (one row per language) broadcasts back onto the
    // corpus, so the gate itself is a map-side filter. q is the q22
    // score, floor-quantized to 4 decimals on BOTH sides, so the
    // boundary compare is IEEE-exact.
    "q72_percentile_gate" -> ((s, dir) => {
      val scored = docsFanned(s, dir).select(col("doc_id"), col("lang"),
        TextFunctions.qualityScore(col("text")).as("q"))
      val thr = graft.functions.Relational
        .percentileThreshold(scored, "lang", "q", "doc_id", 0.9)
      scored.join(broadcast(thr), Seq("lang"))
        .filter(col("q") >= col("threshold"))
        .select(col("doc_id"), col("lang"), col("q"), col("threshold"))
    }),

    // temperature-balanced multilingual sampling (the XLM-R/mT5
    // alpha-sampling rule at alpha = 0.5): per-language keep-rate
    // proportional to sqrt(language share), normalized so the LARGEST
    // language keeps 100%, applied as a deterministic FNV hash gate —
    // reproducible doc-for-doc across engines and re-runs, unlike
    // rand() sampling. Scale shape: the language histogram is one
    // map-side-combined agg over a pruned (doc_id, lang) scan — a
    // handful of rows — and the rate table broadcasts back, so the
    // gate itself is a map-side filter; no payload enters any
    // Exchange. Exactness: n_l/n_max (both exact BIGINTs in double),
    // sqrt (IEEE correctly rounded), *10000, floor — the identical op
    // sequence on both engines.
    "q73_temperature_sample" -> ((s, dir) => {
      val base = Dedup.trackPersisted(
        docs(s, dir).select(col("doc_id"), col("lang"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val counts = base.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      val nmax = counts.agg(max(col("n")).as("nmax"))
      val rates = counts.crossJoin(broadcast(nmax))
        .select(col("lang"),
          floor(sqrt(col("n").cast("double") / col("nmax").cast("double"))
            * 10000).cast("long").as("rate"))
      base
        .select(col("doc_id"), col("lang"),
          pmod(Expressions.fnv1a64(col("doc_id").cast("string")),
            lit(10000L)).as("bucket"))
        .join(broadcast(rates), Seq("lang"))
        .filter(col("bucket") < col("rate"))
        .select(col("doc_id"), col("lang"), col("bucket"), col("rate"))
    }),

    // z-order table layout: Morton-interleave a 10-bit user bucket
    // with a 10-bit hour bucket of the events table and report
    // per-cell (z >> 12) occupancy + min/max of both dimensions — the
    // write-time clustering step that makes file-level min/max stats
    // prune scans on EITHER column (Delta ZORDER / Iceberg sort-order
    // semantics: one layout serves both "this user's history" and
    // "this hour across users" scans). In production the key feeds
    // repartitionByRange(z) + sortWithinPartitions at write; the
    // cell-stats rollup here is the audit that proves locality (each
    // cell's x/y spans are ≤64-wide slices of the 1024-wide domains).
    // Scale shape: the key is a pure codegen'd integer projection; the
    // only Exchange carries (cell, x, y) — ≤ 256 distinct cells out.
    "q74_zorder_layout" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
        .filter(col("ts").isNotNull && col("user_id").isNotNull)
      val x = pmod(col("user_id"), lit(1024L))
      val y = pmod(expr("cast(cast(ts as timestamp) as long) div 3600"),
        lit(1024L))
      ev.select(x.as("x"), y.as("y"))
        .withColumn("z", graft.functions.Relational
          .morton16(col("x"), col("y")))
        .withColumn("cell", shiftright(col("z"), 12))
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n"),
          min(col("x")).as("min_x"), max(col("x")).as("max_x"),
          min(col("y")).as("min_y"), max(col("y")).as("max_y"))
    }),

    // one-pass binned quantile (the 100 TB alternative to q72's exact
    // rank percentile, which needs a full per-language sort of every
    // score): quality scores land in 1024 fixed bins, the per-
    // (lang, bin) histogram is one map-side-combined agg, and the p90
    // bin is read off the cumulative histogram — at most 1024 rows per
    // language ever enter the window, independent of corpus size.
    // Deterministic: the binning floor() runs over the already
    // 4-decimal-quantized q22 score, and the reported threshold is
    // bin/1024 — a power-of-two division, IEEE-exact.
    "q75_histogram_quantile" -> ((s, dir) =>
      graft.functions.Relational.histogramQuantile(
        docs(s, dir).filter(col("text").isNotNull)
          .select(col("lang"),
            TextFunctions.qualityScore(col("text")).as("q")),
        "lang", "q", 0.9, 1024)
        .select(col("lang"), col("n").as("n_docs"),
          col("bin").as("p90_bin"), col("threshold"))),

    // per-doc top-3 TF-IDF terms — the classic salient-term extractor
    // (topic tagging / keyword indexing over a crawl). Reuses q55's
    // scale machinery wholesale: the corpus is tokenized ONCE into a
    // persisted (doc_id, tok, tf) relation, document frequency and the
    // doc count derive from it, and the idf join splits into a
    // broadcast Zipf head + a shuffle over the head-free tail.
    // Exactness: idf quantized to 4 decimals (ln's 1-ulp caveat as
    // q55); score = tf · idf is a SINGLE correctly-rounded double
    // product — no cross-partition float summation anywhere; rank ties
    // break on the token string.
    "q76_tfidf_topterms" -> ((s, dir) => {
      val docTok = Dedup.trackPersisted(
        docsFanned(s, dir)
          .select(col("doc_id"),
            explode(TextFunctions.tokens(lower(col("text")))).as("tok"))
          .groupBy(col("doc_id"), col("tok"))
          .agg(count(lit(1)).as("tf"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val dfreq = docTok.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val nDocs = docTok.agg(countDistinct(col("doc_id")).as("n"))
      val idf = dfreq.crossJoin(broadcast(nDocs))
        .select(col("tok"), col("df"),
          Ann.round4(log(col("n").cast("double") / col("df").cast("double")))
            .as("idf"))
      val head = broadcast(
        idf.orderBy(col("df").desc, col("tok")).limit(1024)
          .select(col("tok"), col("idf")))
      val withHead = docTok.join(head, Seq("tok"), "left")
      val scored = withHead.filter(col("idf").isNotNull)
        .unionByName(withHead.filter(col("idf").isNull).drop("idf")
          .join(idf.select(col("tok"), col("idf")), "tok"))
        .withColumn("score", col("tf").cast("double") * col("idf"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("tok"))
      scored
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("doc_id"), col("tok"), col("tf"), col("score"),
          col("rnk"))
    }),

    // incremental ingestion dedup: a NEW batch checked against the
    // fingerprint index of the EXISTING corpus — the shape a
    // continuously-crawled corpus needs, because re-running full-corpus
    // dedup per batch is O(corpus), while this is O(batch) plus one
    // semi-join against a 16-byte/doc index. Corpus = docs with
    // doc_id%3==0; batch = the rest plus planted re-crawls (every 30th
    // corpus doc re-inserted under id+200000) so cross-hits exist at
    // any sf. Each batch doc classifies as dup_of_corpus (fp in the
    // index), dup_in_batch (fp first seen at a smaller batch id, not
    // in the index), else new. Scale shape: only (fp, doc_id) rides
    // any Exchange — the corpus side shrinks to distinct fingerprints,
    // the in-batch keeper is groupBy(fp).min with map-side combine,
    // and the payload never shuffles.
    "q77_incremental_dedup" -> ((s, dir) => {
      val d = Dedup.trackPersisted(
        docs(s, dir).filter(col("text").isNotNull)
          .select(col("doc_id"),
            TextFunctions.docFingerprint(col("text")).as("fp"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val corpus = d.filter(col("doc_id") % 3 === 0)
      val batch = d.filter(col("doc_id") % 3 =!= 0)
        .unionByName(corpus.filter(col("doc_id") % 30 === 0)
          .select((col("doc_id") + 200000).as("doc_id"), col("fp")))
      Dedup.incrementalDedup(batch, corpus, "fp", "doc_id")
    }),

    // PMI phrase mining (the word2vec-phrases collocation detector,
    // Mikolov et al. 2013): score every adjacent bigram with count ≥ 5
    // by ln(c_xy·N / (c_x·c_y)) and keep the global top 100. Scale
    // shape: the corpus tokenizes ONCE into a persisted token relation;
    // unigram and bigram counts are map-side-combined aggs over even
    // (gram) keys; the two unigram joins key on the token (vocab-sized,
    // not corpus-sized relations); top-k is TakeOrderedAndProject —
    // nothing corpus-sized crosses an Exchange after the counts.
    // Exactness: the PMI argument is (c_xy·N)/(c_x·c_y) computed as
    // doubles in this exact op order on both engines (each step IEEE
    // correctly rounded; counts ≪ 2^53 exact), ln quantized to 4
    // decimals (q55's caveat), ties broken on the gram string.
    "q78_pmi_phrases" -> ((s, dir) => {
      val toks = Dedup.trackPersisted(
        docs(s, dir)
          .select(TextFunctions.tokens(lower(col("text"))).as("t"))
          .filter(size(col("t")) > 0)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val uni = toks.select(explode(col("t")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      val nTok = uni.agg(sum(col("c")).as("n"))
      val bi = toks
        .select(explode(TextFunctions.ngramsFromTokens(col("t"), 2)).as("g"))
        .groupBy(col("g")).agg(count(lit(1)).as("c_xy"))
        .filter(col("c_xy") >= 5)
        .withColumn("w1", split(col("g"), " ").getItem(0))
        .withColumn("w2", split(col("g"), " ").getItem(1))
      bi
        .join(uni.select(col("tok").as("w1"), col("c").as("c1")), "w1")
        .join(uni.select(col("tok").as("w2"), col("c").as("c2")), "w2")
        .crossJoin(broadcast(nTok))
        .select(col("g").as("gram"), col("c_xy"),
          Ann.round4(log(
            (col("c_xy").cast("double") * col("n").cast("double")) /
              (col("c1").cast("double") * col("c2").cast("double"))))
            .as("pmi"))
        .orderBy(col("pmi").desc, col("gram")).limit(100)
    }),

    // fixed-stride token chunking (the context-window splitter every
    // pretraining pipeline runs before packing): each doc becomes
    // ⌈(n−64)/48⌉+1 chunks of ≤64 tokens at stride 48 (16-token
    // overlap), each chunk carrying its token count and an FNV
    // fingerprint of its joined text. Scale shape: a pure codegen'd
    // projection + explode — ZERO shuffle; chunk boundaries depend only
    // on the row, so the operator is embarrassingly map-side at any
    // corpus size. slice() never over-reads: the last chunk start is
    // always < n by the ⌈·⌉ construction, and slice truncates at the
    // array end.
    "q79_token_chunks" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          TextFunctions.tokens(lower(col("text"))).as("t"))
        .filter(size(col("t")) > 0)
        .withColumn("n", size(col("t")))
        .withColumn("n_chunks",
          when(col("n") <= 64, lit(1L)).otherwise(
            ceil((col("n") - 64).cast("double") / 48.0).cast("long") + 1L))
        .select(col("doc_id"), col("t"),
          explode(sequence(lit(0L), col("n_chunks") - 1L)).as("chunk_id"))
        .withColumn("chunk",
          slice(col("t"), (col("chunk_id") * 48 + 1).cast("int"), lit(64)))
        .select(col("doc_id"), col("chunk_id"),
          size(col("chunk")).as("n_tok"),
          Expressions.fnv1a64(array_join(col("chunk"), " ")).as("chunk_fp"))),

    // capped inverted-index build (the corpus-search / lookup-table
    // primitive): token → document frequency + the 32 smallest doc_ids
    // holding it. The posting head uses the native BoundedMinK
    // TypedImperativeAggregate — a fixed 32-slot max-heap per group with
    // map-side partial aggregation, so a stopword's posting group ships
    // ONE ≤256-byte buffer per map partition across the Exchange where
    // collect_list would buffer the entire corpus-sized group on a
    // single reducer. Per-doc array_distinct keeps the exchange keyed
    // on distinct (doc, token) pairs.
    "q80_inverted_index" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          explode(array_distinct(TextFunctions.tokens(lower(col("text")))))
            .as("tok"))
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("df"),
          Expressions.boundedMinK(col("doc_id"), 32).as("p"))
        .select(col("tok"), col("df"),
          concat_ws(",", transform(col("p"), _.cast("string")))
            .as("postings"))),

    // BM25 top-k retrieval (Robertson/Sparck Jones) for a fixed query —
    // the ranking layer over the q80 index shape, and the standard
    // quality-retrieval primitive (matching pretraining docs against a
    // target distribution). Scale shape: the corpus tokenizes ONCE into
    // a persisted (doc_id, tok, tf) relation; doc lengths and the
    // corpus stats derive from it; the per-term idf/avgdl table is
    // |query| rows and BROADCASTS, so the only corpus-sized exchange is
    // the doc-keyed dlen join; top-k is TakeOrderedAndProject.
    // Exactness: idf = ln((N−df+0.5)/(df+0.5)) quantized to 4 decimals
    // (the q55 ln caveat); the tf-saturation term is IEEE + - * / in a
    // fixed parenthesization ((1−b) folded to the 0.25 literal so both
    // engines run the identical op sequence); each term's contribution
    // is a single correctly-rounded product, quantized to DECIMAL(18,4)
    // and summed exactly across the ≤3 query terms.
    "q81_bm25_topk" -> ((s, dir) => bm25TopK(s, dir, 10)),

    // bigram conditional surprisal (the CCNet-style LM-filter proxy one
    // order up from q55): per-doc mean of −ln(c_xy / c_x·) over adjacent
    // bigram occurrences, where c_x· counts bigrams opening with the
    // context word — a true conditional (probabilities sum to 1 per
    // context). Scale shape: q55's machinery at bigram order — the
    // corpus produces ONE persisted (doc_id, gram, n) relation; corpus
    // bigram and context counts derive from it (map-side-combined aggs
    // on even vocab-sized keys); the scored vocabulary splits into a
    // broadcast Zipf head + a shuffle over the head-free tail.
    // Exactness: c_xy/c_x is one exact-integer double division, ln
    // quantized to 4 decimals, per-doc mean accumulated in DECIMAL.
    "q82_bigram_surprisal" -> ((s, dir) => {
      val docBig = Dedup.trackPersisted(
        docsFanned(s, dir)
          .select(col("doc_id"),
            TextFunctions.tokens(lower(col("text"))).as("t"))
          .filter(size(col("t")) > 0)
          .select(col("doc_id"),
            explode(TextFunctions.ngramsFromTokens(col("t"), 2)).as("g"))
          .groupBy(col("doc_id"), col("g"))
          .agg(count(lit(1)).as("n"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val cxy = docBig.groupBy(col("g")).agg(sum(col("n")).as("c_xy"))
        .withColumn("w1", split(col("g"), " ").getItem(0))
      val cx = cxy.groupBy(col("w1")).agg(sum(col("c_xy")).as("c_x"))
      val surp = cxy.join(cx, "w1")
        .select(col("g"), col("c_xy"),
          Ann.round4(-log(col("c_xy").cast("double") /
            col("c_x").cast("double"))).cast("decimal(18,4)").as("surp"))
      val head = broadcast(
        surp.orderBy(col("c_xy").desc, col("g")).limit(1024)
          .select(col("g"), col("surp")))
      val withHead = docBig.join(head, Seq("g"), "left")
      val scored = withHead.filter(col("surp").isNotNull)
        .unionByName(withHead.filter(col("surp").isNull).drop("surp")
          .join(surp.select(col("g"), col("surp")), "g"))
      scored
        .groupBy(col("doc_id"))
        .agg((sum(col("surp") * col("n")).cast("double") /
          sum(col("n")).cast("double")).as("raw"))
        .select(col("doc_id"), Ann.round4(col("raw")).as("bigram_surprisal"))
    }),

    // hard-negative mining for contrastive training: for each of the 20
    // eval queries, the 5 nearest vectors of a DIFFERENT label — the
    // standard negatives-selection pass a retrieval/embedding trainer
    // runs per epoch. See Ann.hardNegatives for the scale shape
    // (single persisted corpus scan, broadcast query set, k-bounded
    // rank shuffle).
    "q83_hard_negatives" -> ((s, dir) =>
      Ann.hardNegatives(embs(s, dir), "embedding", "vec_id", "label",
        col("vec_id") < 20, k = 5)),

    // nearest-centroid confusion matrix: per-label DECIMAL(30,12)
    // centroids (the q52 bit-determinism scheme keyed by label), every
    // vector assigned to its closest centroid (ties to the smallest
    // label), confusion counts out — the embedding-quality eval that
    // gates whether vectors are trustworthy for semantic dedup. The
    // assignment is a pure codegen projection against literal
    // centroids; the only Exchange is the |labels|²-row count.
    "q84_nearest_centroid" -> ((s, dir) =>
      Ann.nearestCentroidConfusion(embs(s, dir), "embedding", "label")),

    // count-min sketch frequency estimation (Cormode & Muthukrishnan
    // 2005) via the native CountMinSketchAgg: corpus token counts
    // approximated by a 4×16 counter block whose aggregation state is
    // ONE 512-byte buffer per map partition — the mergeable-sketch
    // shape that replaces a vocabulary-sized shuffle with a constant
    // one at any corpus size. The query emits (tok, exact, estimate)
    // for every vocab token; width 16 < |vocab| forces real collisions,
    // so the CMS overcount property (est ≥ cnt, min over 4 independent
    // rows) is exercised, not vacuous. Deterministic: FNV row hashes +
    // signed pmod — the oracle rebuilds the identical sketch in SQL.
    "q85_cms_counts" -> ((s, dir) => {
      val (d, w) = (4, 16)
      val toks = Dedup.trackPersisted(
        docs(s, dir)
          .select(explode(TextFunctions.tokens(lower(col("text"))))
            .as("tok"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val sketch = toks.agg(Expressions.cmsSketch(col("tok"), d, w).as("sk"))
      val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      exact.crossJoin(broadcast(sketch))
        .select(col("tok"), col("cnt"),
          (0 until d).map { r =>
            element_at(col("sk"),
              (lit(r * w) +
                pmod(Expressions.fnv1a64(concat(lit(s"$r:"), col("tok"))),
                  lit(w.toLong)) + 1L).cast("int"))
          }.reduce(least(_, _)).as("est"))
    }),

    // reciprocal-rank fusion (Cormack et al. 2009) of the two retrieval
    // modalities: BM25 lexical top-20 (q81's pipeline) fused with
    // embedding cosine top-20 for the same corpus — the standard hybrid
    // retrieval combiner. rrf(id) = Σ 1/(60+rank) over the rankings
    // that contain id. Scale shape: both inputs are already k-row
    // relations (TakeOrderedAndProject), so ranking and fusion run on
    // 2k rows regardless of corpus size. Exactness: each 1/(60+r) is
    // one correctly-rounded double division quantized to DECIMAL(18,4);
    // the ≤2-term sum is exact; ties break on id.
    "q86_rrf_fusion" -> ((s, dir) => {
      def rrfTerm(r: Column): Column =
        Ann.round4(lit(1.0) / (lit(60) + r).cast("double"))
          .cast("decimal(18,4)")
      val zero = lit(0).cast("decimal(18,4)")
      val bm = bm25TopK(s, dir, 20)
        .withColumn("r1", row_number().over(
          Window.orderBy(col("score").desc, col("doc_id"))))
      val ann = Ann.cosineTopK(embs(s, dir), "embedding", "vec_id",
        queryVec(s, dir), 20)
        .withColumn("r2", row_number().over(
          Window.orderBy(col("cos").desc, col("vec_id"))))
      bm.select(col("doc_id").as("id"), col("r1"))
        .join(ann.select(col("vec_id").as("id"), col("r2")),
          Seq("id"), "full_outer")
        .select(col("id"),
          (coalesce(rrfTerm(col("r1")), zero) +
            coalesce(rrfTerm(col("r2")), zero)).cast("double").as("rrf"))
        .orderBy(col("rrf").desc, col("id"))
        .limit(10)
    }),

    // bloom-pruned eval-set decontamination: q56's operator at the
    // corpus scale where the exact eval-gram set no longer broadcasts.
    // The eval grams aggregate into ONE 4096-bit bloom bitset (native
    // mergeable BloomFilterAgg — ~bits per key where a broadcast hash
    // set costs ≥8 bytes per key: at 10⁹ eval grams that is 1.25 GB vs
    // 8 GB, the difference between a filter every executor holds and
    // one it cannot), the full-volume corpus gram stream is prefiltered
    // by a codegen'd BloomContains probe at scan speed, and only the
    // surviving sliver enters the residual exchange where an exact
    // (shuffle-hash, deliberately non-broadcast) semi join removes the
    // bloom's false positives. Exact by construction: the probe shares
    // the build's bit arithmetic, so there are no false negatives, and
    // the residual join kills the false positives — the sketch only
    // prunes volume, never decides membership. mBits is sized LOW for
    // the test corpus (~0.5 bits/gram at sf0.1) precisely so the
    // false-positive path carries real traffic the oracle would catch
    // if the residual join ever dropped out. Output is the per-doc
    // matched-gram count (a superset signal of q56's boolean flag).
    "q87_bloom_decontaminate" -> ((s, dir) => {
      val (mBits, k) = (4096, 3)
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val evalDocs = d.filter(col("doc_id") % 50 === 0)
      val train = d.filter(col("doc_id") % 50 =!= 0)
        .unionByName(evalDocs.withColumn("doc_id", col("doc_id") + 200000))
      // same null-token guard as q56 (phantom FNV("") hazard)
      def grams(df: DataFrame) = df
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("t"))
        .filter(col("t").isNotNull)
        .select(col("doc_id"), explode(Expressions.arrayFnv1a64(
          TextFunctions.shinglesFromTokens(col("t"), 8))).as("g"))
      // persisted: feeds the bloom build AND the residual join — eval
      // docs are scanned once per query (single-scan invariant)
      val evalGrams = Dedup.trackPersisted(
        grams(evalDocs).select(col("g")).distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val bloom = evalGrams
        .agg(Expressions.bloomFilter(col("g"), mBits, k).as("bf"))
      grams(train)
        .crossJoin(broadcast(bloom))
        .filter(Expressions.bloomContains(col("bf"), col("g"), mBits, k))
        .select(col("doc_id"), col("g"))
        // residual exactness join, pinned SHUFFLE_HASH: the 100 TB
        // premise is that the eval grams DON'T broadcast — survivors
        // (already bloom-thinned) shuffle on the 8-byte gram key
        .join(evalGrams.hint("SHUFFLE_HASH"), Seq("g"), "left_semi")
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("g")).as("shared"))
    }),

    // HyperLogLog distinct-cardinality sketch (Flajolet et al. 2007)
    // per language: the second mergeable-sketch aggregate (CMS = q85
    // counts; HLL = set cardinality). The state crossing the Exchange
    // is 64 one-byte registers per group where COUNT(DISTINCT tok)
    // shuffles every distinct token — the standard corpus-profiling
    // estimator at 100 TB. Exactness discipline: the estimate is pure
    // integer arithmetic — Σ 2^(59−reg) summed as DECIMAL(38,0)
    // (each addend a power of two; a double sum would shed low bits
    // past 53), then ⌊2905·2^59 / S⌋ by integral division, with
    // 2905 ≈ α₆₄·m² the engine's pinned scaled-alpha constant — so
    // the oracle rebuilds the identical registers (FNV key hash,
    // bucket = h mod 64, rho = 1 + trailing-zeros(h ÷ 64) — LSB rank,
    // see HllBuffer for why not leading zeros) and the identical
    // estimate with HUGEINT/DECIMAL math, no float anywhere. The
    // exact count rides along to expose the estimator's error.
    // (Integral-quotient overflow needs S < 182, i.e. every register
    // ≥ 53 ≈ 2^53 distinct keys per bucket — unreachable.)
    "q88_hll_distinct" -> ((s, dir) => {
      val toks = Dedup.trackPersisted(docs(s, dir)
        .filter(length(trim(col("text"))) > 0)
        .select(col("lang"),
          explode(TextFunctions.tokens(lower(col("text")))).as("tok"))
        // persisted: the sketch and the exact baseline both re-derive
        // from this cache — one corpus scan per query
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val est = toks.groupBy(col("lang"))
        .agg(Expressions.hllSketch(col("tok"), 64).as("regs"))
        .select(col("lang"), posexplode(col("regs")).as(Seq("b", "reg")))
        .groupBy(col("lang"))
        .agg(sum(expr(
          "cast(shiftleft(cast(1 as bigint), 59 - reg) as decimal(38,0))"))
          .as("ssum"))
        .select(col("lang"), expr(
          "cast(cast(2905 as decimal(38,0)) * " +
            "cast(576460752303423488 as decimal(38,0)) div ssum as bigint)")
          .as("hll_est"))
      toks.groupBy(col("lang"))
        .agg(countDistinct(col("tok")).as("exact_uniq"))
        .join(est, Seq("lang"))
    }),

    // GPT-style pretraining sequence packing (concat-and-chunk) —
    // distinct from q79 (per-doc stride windows) and q54 (shard budget
    // packing); the distributed two-phase prefix sum and the exactness
    // argument live on Corpus.packSequences
    "q89_pack_sequences" -> ((s, dir) =>
      Corpus.packSequences(docs(s, dir), "text", "doc_id", seqLen = 256L)),

    // PageRank-style centrality (3 integer-arithmetic power iterations,
    // Corpus.pagerank) over the rare-shingle co-occurrence graph
    // (Corpus.rareGramEdges): docs sharing a global-df∈[2,4] 8-gram are
    // linked — 8-grams, not tokens, because the synthetic corpus has a
    // ~31-token vocabulary where every token is common, while the rare
    // 8-gram band is exactly the near-dup/boilerplate signal
    "q90_pagerank" -> ((s, dir) =>
      Corpus.pagerank(
        Corpus.rareGramEdges(docs(s, dir), "text", "doc_id",
          k = 8, dfMin = 2, dfMax = 4), iters = 3)
        .orderBy(col("pr").desc, col("v")).limit(50)
        .select(col("v").as("doc_id"), col("deg"),
          col("pr").as("pr_micro"))),

    // product-quantization ANN (Jégou et al. 2011) — the missing
    // member of the ANN family (brute force q28, sign-LSH q33, IVF
    // q38/q46, Lloyd-refined q52/q65): 8 subspaces × 16 sub-centroids,
    // ADC ranking in exact 1e-12 integer units; scale rationale and
    // exactness discipline on Ann.pqTopK
    "q91_pq_ann" -> ((s, dir) =>
      Ann.pqTopK(embs(s, dir), "embedding", "vec_id",
        queryVec(s, dir), 10)),

    // document containment (Broder's asymmetric metric) over the rare-
    // 8-gram candidate pairs — catches the small-doc-inside-big-doc
    // duplicates whose Jaccard is tiny; semantics, caps, and the
    // integer-basis-point exactness on Corpus.containmentPairs
    "q92_containment" -> ((s, dir) =>
      Corpus.containmentPairs(docs(s, dir), "text", "doc_id",
        k = 8, dfMin = 2, dfMax = 4)),

    // leakage-safe split: q50's near-dup clusters anchor the split
    // hash, so a dup family can never straddle train/val/test —
    // guarantees and scale shape on Corpus.leakageSafeSplit
    "q95_leakage_split" -> ((s, dir) =>
      Corpus.leakageSafeSplit(docs(s, dir), "doc_id",
        Dedup.dupClusters(
          Dedup.ngramJaccardPairs(docs(s, dir), "text", "doc_id",
            n = 3, threshold = 0.2, K, R), "a", "b"))),

    // cross-source overlap matrix (corpus provenance): for every
    // source pair, how many exact content fingerprints they share —
    // the dedup-planning report that decides which source to keep when
    // crawls mirror each other. Both sides plant known cross-source
    // copies (every 25th doc mirrored into a synthetic source — the
    // q56 injection convention) so the matrix has true positives at
    // any sf. Scale shape: the self-join key is the fingerprint and
    // its occupancy is bounded by the SOURCE DIMENSION (≤ #sources
    // distinct rows per fp — sources are a dimension table, not data);
    // the fingerprint relation is persisted so the corpus text feeds
    // both join sides from one materialization.
    "q97_source_overlap" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("text"), col("source"))
      val corpus = d.unionByName(
        d.filter(col("doc_id") % 25 === 0)
          .withColumn("doc_id", col("doc_id") + 400000)
          .withColumn("source", lit("mirror")))
      val f = Dedup.trackPersisted(corpus
        .filter(length(trim(col("text"))) > 0)
        .select(md5(TextFunctions.normText(col("text"))).as("fp"),
          col("source"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      f.select(col("fp"), col("source").as("src_a"))
        .join(f.select(col("fp"), col("source").as("src_b")), Seq("fp"))
        .filter(col("src_a") < col("src_b"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(count(lit(1)).as("shared_fps"))
    }),

    // filter-ablation funnel: q51's selection decomposed into per-stage
    // survivor counts — all docs → dedup keeper → confident lang-ID →
    // quality floor → repetition ceiling (stage 4 == q51's final
    // count). The report every pipeline runs before committing to a
    // filter config, and it costs exactly ONE corpus scan at any
    // scale: every flag is staged in one projection, the cumulative
    // conjunctions aggregate in one map-side-combined pass, and the
    // output is a 5-row stack
    "q96_filter_ablation" -> ((s, dir) => {
      val scored = Dedup.rankByFingerprint(
          docsFanned(s, dir).select(col("doc_id"),
            TextFunctions.qualityScore(col("text")).as("q"),
            TextFunctions.langId(col("text")).as("lang_pred"),
            TextFunctions.tokens(col("text")).as("t"),
            md5(TextFunctions.normText(col("text"))).as("fp"))
          .withColumn("rep", TextFunctions.repetitionFromTokens(col("t")))
          .drop("t"), "doc_id")
      val c1 = col("rn") === 1
      val c2 = c1 && col("lang_pred") =!= "und"
      val c3 = c2 && col("q") >= 0.5
      val c4 = c3 && col("rep") <= 0.2
      scored.agg(
          count(lit(1)).as("s0"),
          sum(when(c1, 1L).otherwise(0L)).as("s1"),
          sum(when(c2, 1L).otherwise(0L)).as("s2"),
          sum(when(c3, 1L).otherwise(0L)).as("s3"),
          sum(when(c4, 1L).otherwise(0L)).as("s4"))
        .selectExpr(
          "stack(5, 0, s0, 1, s1, 2, s2, 3, s3, 4, s4) as (stage, docs)")
    }),

    // two-pass corpus-statistics scoring (the CCNet-style LM-filter
    // proxy): pass 1 builds the corpus unigram distribution, pass 2
    // scores each doc by its mean token surprisal −ln(cnt/total). The
    // per-token surprisal is floor-quantized to 4 decimals and summed
    // as DECIMAL(18,4) — double summation is partition-order-dependent,
    // so a plain avg() would be nondeterministic run-to-run and
    // engine-to-engine; the quantized decimal sum is exact, and the
    // final divide-by-count happens in double identically on both
    // sides. Residual cross-engine caveat: ln is a transcendental —
    // Math.log and DuckDB's libm are each ~1-ulp accurate, not
    // correctly rounded, so a token whose surprisal sits within 1 ulp
    // (~1e-12 relative) of a 1e-4 quantization boundary could flip —
    // ~1e-8 per token, disclosed rather than pretended away (every
    // other oracle sticks to IEEE-exact + - * / and sqrt)
    "q55_unigram_surprisal" -> ((s, dir) => {
      val toks = docsFanned(s, dir).select(col("doc_id"),
        explode(TextFunctions.tokens(lower(col("text")))).as("tok"))
      // pre-aggregate (doc_id, tok, n) BEFORE the frequency join: the
      // per-occurrence token table is ~corpus bytes again and its join
      // key is Zipfian ("the" alone is a few percent of all rows) — the
      // grouped table shrinks by the per-doc repetition factor and its
      // (doc_id, tok) shuffle key is even, with map-side partial agg
      // soaking up the in-doc repeats. Exactness is preserved: summing
      // the quantized DECIMAL surprisal n times == surp * n in DECIMAL.
      val docTok = Dedup.trackPersisted(toks
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("n"))
        // persisted: freq (and through it tot/head/tail) re-derives
        // from this cache, so the corpus text is tokenized exactly ONCE
        // per query instead of once per consuming subtree
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val freq = docTok.groupBy(col("tok")).agg(sum(col("n")).as("cnt"))
      val tot = freq.agg(sum(col("cnt")).as("total"))
      // score the vocabulary once (one row per distinct token), then
      // split it: the top of the Zipf head is tiny and covers most
      // occurrences, so it BROADCASTS — only (doc,tok) rows whose token
      // misses the head shuffle on the (still skewed, but now
      // head-free) tok key, where AQE skew-split handles the residue
      val surp = freq.crossJoin(broadcast(tot))
        .select(col("tok"), col("cnt"),
          Ann.round4(-log(col("cnt").cast("double") /
            col("total").cast("double"))).cast("decimal(18,4)").as("surp"))
      val head = broadcast(
        surp.orderBy(col("cnt").desc, col("tok")).limit(1024)
          .select(col("tok"), col("surp")))
      val withHead = docTok.join(head, Seq("tok"), "left")
      val scored = withHead.filter(col("surp").isNotNull)
        .unionByName(withHead.filter(col("surp").isNull).drop("surp")
          .join(surp.select(col("tok"), col("surp")), "tok"))
      scored
        .groupBy(col("doc_id"))
        .agg((sum(col("surp") * col("n")).cast("double") /
          sum(col("n")).cast("double")).as("raw"))
        .select(col("doc_id"), Ann.round4(col("raw")).as("surprisal"))
    }),

    // deterministic stratified sampling: keep a doc iff the FNV of its
    // id lands under the per-language rate (en 20%, rest 10%) — the
    // reproducible subsetting primitive every corpus pipeline needs
    // (re-runs and engines agree doc-for-doc, unlike rand()-sampling);
    // both sides compute pmod on the SIGNED hash value
    "q53_hash_sample" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), col("lang"),
          pmod(Expressions.fnv1a64(col("doc_id").cast("string")), lit(100L))
            .as("bucket"))
        .filter(col("bucket") <
          when(col("lang") === "en", lit(20L)).otherwise(lit(10L)))),

    // token-budget shard packing: per-source running token sum assigns
    // each doc to the shard its first token lands in — the greedy
    // sequence-packing step that turns a filtered corpus into
    // ~fixed-size training shards. Integer window sums → exact oracle.
    "q54_token_packing" -> ((s, dir) => {
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs(s, dir)
        .select(col("source"), col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tok"))
        .withColumn("cum", sum(col("n_tok")).over(w))
        .select(col("source"), col("doc_id"), col("n_tok"),
          floor((col("cum") - col("n_tok")) / 2000).cast("int").as("shard"))
    }),

    // Gopher-style repetition signal SUITE (Rae et al. 2021 §A1.1):
    // top-word fraction, top-bigram fraction, duplicate-line fraction —
    // the standard repetitious-text filters beyond q42's duplicate-token
    // fraction. Per-doc aggregations over exploded tokens/bigrams:
    // map-side partial agg on the even (doc_id, gram) key, then a
    // doc-keyed rollup — no corpus-wide skew key anywhere. Docs with a
    // single token have no bigram (left join, fraction 0); the output
    // domain is docs with ≥1 token on both sides.
    "q58_gopher_repetition" -> ((s, dir) => {
      val base = docs(s, dir).select(col("doc_id"), col("text"))
      def topFrac(grams: DataFrame, out: String) = grams
        .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(Ann.round4(max(col("c")).cast("double") /
          sum(col("c")).cast("double")).as(out))
      val toks = base.select(col("doc_id"),
        TextFunctions.tokens(lower(col("text"))).as("t"))
      val word = topFrac(
        toks.select(col("doc_id"), explode(col("t")).as("g")),
        "top_word_frac")
      val bigram = topFrac(
        toks.select(col("doc_id"),
          explode(TextFunctions.ngramsFromTokens(col("t"), 2)).as("g")),
        "top_bigram_frac")
      val lines = base.filter(col("text").isNotNull)
        .select(col("doc_id"), split(col("text"), "\n").as("ls"))
        .select(col("doc_id"),
          Ann.round4(lit(1.0) -
            size(array_distinct(col("ls"))).cast("double") /
            size(col("ls")).cast("double")).as("dup_line_frac"))
      word.join(lines, "doc_id")
        .join(bigram, Seq("doc_id"), "left")
        .select(col("doc_id"), col("top_word_frac"),
          coalesce(col("top_bigram_frac"), lit(0.0)).as("top_bigram_frac"),
          col("dup_line_frac"))
    }),

    // PII-style scrubbing: redact email addresses and long digit runs
    // (IDs/phones) to placeholder tokens, with per-doc match counts —
    // the standard pre-training scrub, as a single codegen'd
    // projection. Patterns stay inside the Java-regex ∩ RE2 common
    // subset (char classes + bounded quantifiers — no lookaround, no
    // '$'-anchor semantics), so both engines replace identically; both
    // sides plant a deterministic email + id on every 20th doc so the
    // scrub has true positives at any sf.
    "q63_redact" -> ((s, dir) => {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val digits = "[0-9]{9,}"
      docs(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"),
          when(col("doc_id") % 20 === 0,
            concat(col("text"), lit(" contact: user"),
              col("doc_id").cast("string"),
              lit("@example.com ref 9876543210")))
            .otherwise(col("text")).as("text"))
        .select(col("doc_id"),
          regexp_count(col("text"), lit(email)).cast("long").as("n_emails"),
          regexp_count(col("text"), lit(digits)).cast("long")
            .as("n_long_digits"),
          regexp_replace(regexp_replace(col("text"), email, "<EMAIL>"),
            digits, "<NUM>").as("redacted"))
    }),

    // exact dedup with the KEEP-MOST-COMPLETE keeper rule: within a
    // canonical-fingerprint group the survivor is the longest RAW text
    // (ties → min id) — the crawl-completeness heuristic (a re-crawl
    // that kept trailing whitespace/furniture normalizes to the same
    // canonical text but is the more complete capture). Both sides
    // synthesize whitespace-padded copies of every 10th doc so the rule
    // actually picks a non-min-id keeper at any sf. Same staged-signal
    // window shape as q51: the exchange carries (doc_id, fp, len) only.
    "q62_longest_keeper" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("text"))
        .filter(col("text").isNotNull)
      val padded = d.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 400000).as("doc_id"),
          concat(col("text"), lit("  ")).as("text"))
      // keeper via groupBy(fp).min(struct(-len, doc_id, len)) rather
      // than a row_number window: the aggregation combines MAP-SIDE, so
      // a mega-duplicate fingerprint group never ships all its rows to
      // one window task (the q61 lesson applied to the keeper rule)
      d.unionByName(padded)
        .withColumn("len", length(col("text")))
        .select(md5(TextFunctions.normText(col("text"))).as("fp"),
          struct((-col("len")).as("nl"), col("doc_id"), col("len"))
            .as("cand"))
        .groupBy(col("fp")).agg(min(col("cand")).as("k"))
        .select(col("k.doc_id").as("doc_id"), col("k.len").as("len"))
    }),

    // corpus-wide exact LINE dedup with reconstruction (the C4
    // "discard repeated spans across the corpus" operation at line
    // granularity): every non-empty line keeps only its FIRST
    // occurrence — min (doc_id, idx) order — and each doc's text is
    // rebuilt from its surviving lines. Scale shape: the global
    // keep-decision is a groupBy(fp).agg(min(struct(doc_id, idx))) —
    // map-side partial aggregation absorbs the mega-duplicate
    // boilerplate lines that would make a row_number window's hottest
    // fp partition a straggler — and the line payload rides only the
    // doc-keyed join/rebuild shuffles, never the fp exchange.
    // Whitespace-only lines always survive (document structure, and
    // they would otherwise all collapse onto one global key).
    "q61_line_dedup" -> ((s, dir) => {
      // the sf documents are single-line and dup-free, so both sides
      // synthesize the same overlapping multi-line corpus: doc i's text
      // becomes lines (i, i+1, i+2) — every interior line appears in 3
      // consecutive docs, giving the operator real corpus-wide
      // duplicates to drop at any sf (the q49/q56 synthesis pattern)
      val d0 = docs(s, dir).select(col("doc_id"), col("text"))
      val multi = d0.as("a")
        .join(d0.as("b"), col("b.doc_id") === col("a.doc_id") + 1)
        .join(d0.as("c"), col("c.doc_id") === col("a.doc_id") + 2)
        .select(col("a.doc_id").as("doc_id"),
          concat_ws("\n", col("a.text"), col("b.text"), col("c.text"))
            .as("text"))
      val base = multi.filter(col("text").isNotNull)
        .select(col("doc_id"),
          posexplode(split(col("text"), "\n")).as(Seq("idx0", "line")))
        .select(col("doc_id"), (col("idx0") + 1).as("idx"), col("line"))
      val nonEmpty = base.filter(trim(col("line")) =!= "")
      val keyed = nonEmpty.select(col("doc_id"), col("idx"),
        md5(col("line")).as("fp"))
      val first = keyed.groupBy(col("fp"))
        .agg(min(struct(col("doc_id"), col("idx"))).as("f"))
        .select(col("f.doc_id").as("doc_id"), col("f.idx").as("idx"))
      val kept = nonEmpty.join(first, Seq("doc_id", "idx"), "left_semi")
        .unionByName(base.filter(trim(col("line")) === ""))
      val agg = kept.groupBy(col("doc_id"))
        .agg(array_join(transform(
            array_sort(collect_list(struct(col("idx"), col("line")))),
            e => e.getField("line")), "\n").as("clean_text"),
          count(lit(1)).as("n_kept"))
      val tot = base.groupBy(col("doc_id")).agg(count(lit(1)).as("n_lines"))
      tot.join(agg, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("clean_text"), lit("")).as("clean_text"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          (col("n_lines") - coalesce(col("n_kept"), lit(0L)))
            .as("n_dropped"))
    }),

    // sub-line repeated-SPAN dedup (Lee et al. 2021, "Deduplicating
    // Training Data Makes Language Models Better", at k-token window
    // granularity): every k-token span whose fingerprint occurs more
    // than once in the corpus keeps only its FIRST occurrence — min
    // (doc_id, start) — and every token covered by a non-first
    // duplicated window is removed; docs are rebuilt from surviving
    // tokens. This is the finer-grained sibling of q61 (which only
    // reaches line granularity). Scale shape: span fingerprints are
    // 8-byte FNV longs (the q45 shuffle lever, ~24 B/span through the
    // fp exchange, never the text); the global keep decision is a
    // groupBy(fp).agg(count, min(struct)) — map-side partial agg
    // absorbs mega-duplicated boilerplate spans; only DUPLICATED fps
    // (count > 1) join back, bounding the mask join to the duplicated
    // mass; the token payload rides only doc-keyed shuffles. The
    // corpus text is tokenized once (persisted token table feeds both
    // the span generator and the rebuild).
    "q64_span_dedup" -> ((s, dir) => {
      // the sf documents are span-dup-free, so both sides plant the
      // same cross-doc boilerplate (every 5th doc prepends family 1,
      // docs ≡3 mod 7 append family 2 — first WHEN wins on overlap,
      // matching SQL CASE)
      val d = docs(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0,
            concat(lit(SpanBoiler1 + " "), col("text")))
            .when(col("doc_id") % 7 === 3,
              concat(col("text"), lit(" " + SpanBoiler2)))
            .otherwise(col("text")).as("text"))
      Dedup.spanDedup(d, "text", "doc_id", SpanK)
    }),

    // C4-style quality signal suite (Raffel et al. 2020 §2.2 + Gopher
    // word-length band): terminal-punctuation line fraction, mean word
    // length, lorem-ipsum / code-brace flags, sentence count — the
    // line- and doc-level heuristics that complement q22's composite
    // score. Pure codegen'd per-row expressions; no shuffle at all.
    "q60_c4_signals" -> ((s, dir) =>
      docs(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"),
          split(col("text"), "\n").as("ls"),
          TextFunctions.tokens(col("text")).as("t"),
          lower(col("text")).as("lt"),
          col("text"))
        .select(col("doc_id"),
          // last-char membership instead of a '$'-anchored regex:
          // Java's '$' matches before a trailing \r / Unicode line
          // terminator while RE2's does not — an oracle time-bomb on
          // CRLF fixtures; substring(-1) has one semantics everywhere
          Ann.round4(
            size(filter(col("ls"), l =>
              substring(trim(l), -1, 1).isin(".", "!", "?")))
              .cast("double") / size(col("ls")).cast("double"))
            .as("punct_line_frac"),
          // explicit whitespace class: Java \s includes \x0B, RE2's
          // does not — spell the set out so both engines strip the same
          when(size(col("t")) > 0, Ann.round4(
            length(regexp_replace(trim(col("text")), "[ \\t\\n\\r\\f\\x0B]+", ""))
              .cast("double") / size(col("t")).cast("double")))
            .otherwise(0.0).as("mean_word_len"),
          col("lt").contains("lorem ipsum").as("has_lorem"),
          col("lt").contains("{").as("has_brace"),
          regexp_count(col("text"), lit("[.!?]")).cast("long")
            .as("n_sentences"))),

    // BPE-ish regex token counting (letters / digits / punct runs) —
    // the subword-style counterpart of whitespace q20
    "q37_bpe_tokens" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        size(regexp_extract_all(col("text"),
          lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"), lit(0))).as("n_bpe"))),

    // vocabulary building: global token frequencies with deterministic
    // top-k tiebreak (map-side partial agg → single small shuffle)
    "q19_term_freq" -> ((s, dir) =>
      docs(s, dir)
        .select(explode(TextFunctions.tokens(lower(col("text")))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok")).limit(100)),

    // image resize (2× box downsample) verified through the decoded
    // header of the resized asset
    "q40_image_resize" -> ((s, dir) => {
      val n = if (isSf01(dir)) 2000L else 500L
      val assets = graft.multimodal.Multimodal.dataset(s, n)
      graft.multimodal.Multimodal.decodeMeta(
        graft.multimodal.Multimodal.resizeImages(assets)).toDF()
        .select(col("asset_id"), col("width"), col("height"),
          col("payload_bytes"))
    }),

    // multimodal plumbing (binary columns + typed metadata; fake codec,
    // real batch shape; fixture-golden DuckDB oracles — expectations
    // derived from the synth parameters in FixtureGen, frozen parquet)
    "q34_media_meta" -> ((s, dir) => {
      val n = if (isSf01(dir)) 2000L else 500L
      graft.multimodal.Multimodal
        .decodeMeta(graft.multimodal.Multimodal.dataset(s, n)).toDF()
    }),

    "q35_media_features" -> ((s, dir) => {
      val n = if (isSf01(dir)) 2000L else 500L
      val feats = graft.multimodal.Multimodal
        .extractFeatures(graft.multimodal.Multimodal.dataset(s, n)).toDF()
      feats.select(col("asset_id"), col("kind"),
        Ann.round4(Ann.dot(Ann.asDouble(col("feature")),
          Ann.asDouble(col("feature")))).as("feat_norm2"))
    }),

    "q36_frame_sample" -> ((s, dir) => {
      val n = if (isSf01(dir)) 2000L else 500L
      graft.multimodal.Multimodal
        .sampleFrames(graft.multimodal.Multimodal.dataset(s, n), 2)
        .select(col("asset_id"), col("frame_idx"),
          length(col("frame")).as("frame_bytes"))
    })
  )

  // --- oracle SQL ------------------------------------------------------

  private val TOK = """string_split_regex(trim(text), '\s+')"""
  private val TOKL = """string_split_regex(lower(trim(text)), '\s+')"""
  private val NORM = """regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"""

  private def langCount(markers: Seq[String]): String =
    s"len(list_filter($TOKL, t -> t IN (${markers.map("'" + _ + "'").mkString(",")})))"

  /** The q21 lang-ID argmax as a DuckDB CASE chain (shared by the
    * prediction and evaluation oracles). */
  private def langPredSql: String = {
    val scores = TextFunctions.LangMarkers
      .map { case (code, m) => code -> langCount(m) }
    val best = "greatest(" + scores.map(_._2).mkString(", ") + ")"
    val caseChain = scores.map { case (code, e) =>
      s"WHEN $best > 0 AND $e = $best THEN '$code'"
    }.mkString(" ")
    s"CASE $caseChain ELSE 'und' END"
  }

  /** The q22 quality score as a DuckDB expression (floor-rounded to 4
    * decimals, same IEEE ops as the engine). */
  private def qualitySql: String = {
    val nTok = s"(CASE WHEN len(trim(text)) = 0 THEN 0 ELSE len($TOK) END)::DOUBLE"
    val nPunct = """len(regexp_extract_all(text, '[.,;:!?]'))::DOUBLE"""
    val stopList = Seq("the", "a", "of", "and", "is", "to", "in")
      .map("'" + _ + "'").mkString(",")
    val nStop = s"len(list_filter($TOKL, t -> t IN ($stopList)))::DOUBLE"
    s"""floor((
       |  (CASE WHEN $nTok >= 10 AND $nTok <= 1000 THEN 1.0
       |        WHEN $nTok > 0 THEN 0.5 ELSE 0.0 END) * 0.4 +
       |  (1.0 - (CASE WHEN $nTok > 0 THEN least($nPunct / $nTok, 1.0) ELSE 0.0 END)) * 0.3 +
       |  least((CASE WHEN $nTok > 0 THEN $nStop / $nTok ELSE 0.0 END) * 5, 1.0) * 0.3
       |  ) * 10000 + 0.5) / 10000""".stripMargin
  }

  /** The q42 duplicate-token fraction as a DuckDB expression. */
  private def repSql: String =
    s"""floor((CASE WHEN len(trim(text)) = 0 THEN 0.0
       |  ELSE 1.0 - len(list_distinct($TOK))::DOUBLE / len($TOK)::DOUBLE
       |  END) * 10000 + 0.5) / 10000""".stripMargin

  /** 16 minhash component expressions over distinct tokens. */
  private def sigExprs: Seq[String] =
    (0 until K).map(i =>
      s"list_min(list_transform(list_distinct($TOK), x -> md5('$i:' || x)))")

  private def bandKeyExpr(b: Int): String =
    "md5(" + (0 until R).map(r => s"s[${b * R + r + 1}]")
      .mkString(" || '|' || ") + ")"

  /** FNV-1a 64 over code points of an ASCII column, as DuckDB HUGEINT
    * arithmetic mod 2^64 (validated byte-exact vs the native Catalyst
    * expression). */
  private def fnvSql(col: String): String =
    s"""list_reduce(
       |  list_prepend(14695981039346656037::HUGEINT,
       |    list_transform(range(1, len($col)+1), i -> unicode($col[i]))),
       |  (h, c) -> ((xor(h::UBIGINT, c::UBIGINT))::HUGEINT
       |             * 1099511628211::HUGEINT)
       |            % 18446744073709551616::HUGEINT)""".stripMargin

  /** The q90 integer-PageRank fixed point as chained CTEs — one
    * agg/pr pair per power iteration, BIGINT floor-division arithmetic
    * identical to the engine's (1e-12 units). */
  private def pagerankSql(iters: Int): String = {
    val gramJoin = (0 until 8).map(j => s"t[i+$j]").mkString(" || ' ' || ")
    val base =
      s"""d AS (SELECT doc_id, $TOK AS t FROM documents
         |      WHERE len(trim(text)) > 0),
         |g0 AS (SELECT doc_id, unnest(list_transform(range(1, len(t)-6),
         |        i -> $gramJoin)) AS g FROM d),
         |gh AS (SELECT DISTINCT doc_id, ${fnvSql("g")} AS g FROM g0),
         |rare AS (SELECT g FROM gh GROUP BY g
         |         HAVING count(*) BETWEEN 2 AND 4),
         |rt AS (SELECT doc_id, g FROM gh
         |       WHERE g IN (SELECT g FROM rare)),
         |e AS (SELECT DISTINCT a.doc_id AS sa, b.doc_id AS sb
         |      FROM rt a JOIN rt b USING (g) WHERE a.doc_id < b.doc_id),
         |sym AS (SELECT sa AS src, sb AS dst FROM e
         |        UNION ALL SELECT sb, sa FROM e),
         |verts AS (SELECT src AS v, count(*) AS deg FROM sym GROUP BY src),
         |nv AS (SELECT count(*) AS n FROM verts),
         |pr0 AS (SELECT v, deg, 1000000000000::BIGINT // n AS pr
         |        FROM verts, nv)""".stripMargin
    val iterCtes = (1 to iters).map { i =>
      s"""agg$i AS (
         |  SELECT dst AS v, CAST(sum(pr // deg) AS BIGINT) AS sc
         |  FROM sym JOIN pr${i - 1} ON sym.src = pr${i - 1}.v
         |  GROUP BY dst),
         |pr$i AS (
         |  SELECT verts.v, verts.deg,
         |    (150000000000::BIGINT // n) +
         |    CAST((85 * coalesce(sc, 0)) // 100 AS BIGINT) AS pr
         |  FROM verts CROSS JOIN nv
         |  LEFT JOIN agg$i ON agg$i.v = verts.v)""".stripMargin
    }
    s"WITH $base,\n${iterCtes.mkString(",\n")}\n" +
      s"SELECT v AS doc_id, deg, pr AS pr_micro FROM pr$iters " +
      "ORDER BY pr DESC, v LIMIT 50"
  }

  private def toSigned(v: String): String =
    s"""(CASE WHEN $v >= 9223372036854775808::HUGEINT
       | THEN ($v - 18446744073709551616::HUGEINT) ELSE $v END)::BIGINT""".stripMargin

  /** The q81 BM25 pipeline as a CTE list ending in `bm(doc_id, score)`
    * (unlimited) — shared by q81's top-10 and q86's fusion arm
    * (top-20 rank). Same op order as the engine: see the q81 entry. */
  private def bm25Ctes: String =
    s"""dt AS (
       |  SELECT doc_id, tok, count(*) AS tf FROM (
       |    SELECT doc_id, unnest($TOKL) AS tok FROM documents
       |    WHERE len(trim(text)) > 0) GROUP BY 1, 2),
       |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
       |       FROM dt GROUP BY 1),
       |st AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS sumdl
       |       FROM dl),
       |idf AS (
       |  SELECT tok,
       |    floor(ln((n::DOUBLE - df::DOUBLE + 0.5::DOUBLE)
       |             / (df::DOUBLE + 0.5::DOUBLE)) * 10000 + 0.5) / 10000
       |      AS idf,
       |    sumdl::DOUBLE / n::DOUBLE AS avgdl
       |  FROM (SELECT tok, count(*) AS df FROM dt
       |        WHERE tok IN ('spark', 'merge', 'vector')
       |        GROUP BY tok), st),
       |c AS (
       |  SELECT d.doc_id,
       |    CAST(floor(idf * ((tf::DOUBLE * 2.2::DOUBLE) /
       |        (tf::DOUBLE + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE
       |           * (dl::DOUBLE / avgdl)))) * 10000 + 0.5) / 10000
       |      AS DECIMAL(18,4)) AS contrib
       |  FROM dt d JOIN dl USING (doc_id) JOIN idf USING (tok)
       |  WHERE d.tok IN ('spark', 'merge', 'vector')),
       |bm AS (
       |  SELECT doc_id, CAST(sum(contrib) AS DOUBLE) AS score
       |  FROM c GROUP BY doc_id)""".stripMargin

  /** Unsigned 64-bit SimHash of every doc (empty docs → 0), as a WITH
    * prefix ending in a `shu(doc_id, u UBIGINT)` relation. */
  private def simhashCte(from: String = "documents"): String =
    s"""WITH n AS (SELECT doc_id, $NORM AS nt FROM $from),
       |tok AS (SELECT doc_id, unnest(string_split(nt, ' ')) AS t FROM n),
       |th AS (SELECT doc_id, ${fnvSql("t")}::UBIGINT AS h
       |       FROM tok WHERE t <> ''),
       |votes AS (
       |  SELECT doc_id, b,
       |    sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
       |  FROM th, range(64) r(b) GROUP BY doc_id, b),
       |sh_u AS (
       |  SELECT doc_id,
       |    sum(CASE WHEN v > 0 THEN (1::HUGEINT << b)
       |        ELSE 0::HUGEINT END)::UBIGINT AS u
       |  FROM votes GROUP BY doc_id),
       |shu AS (
       |  SELECT n.doc_id,
       |    CASE WHEN nt IS NULL THEN NULL
       |         ELSE coalesce(u, 0::UBIGINT) END AS u
       |  FROM n LEFT JOIN sh_u USING (doc_id))""".stripMargin

  /** Element-wise L2-normalize a DOUBLE[] named `e` (matches the Spark
    * side's normalize-then-dot IEEE op order). */
  private val NormE: String =
    """CASE WHEN sqrt(list_dot_product(e, e)) > 0
      |  THEN list_transform(e, x -> x / sqrt(list_dot_product(e, e)))
      |  ELSE e END""".stripMargin

  /** Sequential-fold squared L2 distance between two DOUBLE[] exprs —
    * the same left-to-right accumulate as Ann.l2sq's aggregate. */
  private def l2sqSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(0.0::DOUBLE,
       |  list_transform(list_zip($a, $b), p -> (p[1]-p[2])*(p[1]-p[2]))),
       |  (acc, x) -> acc + x)""".stripMargin

  /** The deterministic sign-LSH bucket of a DOUBLE[] expr, with the
    * nPlanes×64 hyperplanes from Ann.hyperplanes embedded as literals
    * (Double.toString round-trips exactly through DuckDB's parser). */
  private def lshBucketSql(v: String, nPlanes: Int = 8): String = {
    val planes = Ann.hyperplanes(nPlanes, 64)
    "(" + planes.zipWithIndex.map { case (p, i) =>
      val lit = "[" + p.map(java.lang.Double.toString).mkString(",") + "]::DOUBLE[]"
      s"CASE WHEN list_dot_product($v, $lit) >= 0 THEN ${1L << i} ELSE 0 END"
    }.mkString(" + ") + ")"
  }

  def oracleSql: Map[String, String] = Map(
    "q20_token_count" ->
      s"""SELECT doc_id, CASE WHEN len(trim(text)) = 0 THEN 0
         |  ELSE len($TOK) END AS n_tok FROM documents""".stripMargin,

    "q21_lang_id" ->
      s"SELECT doc_id, $langPredSql AS lang_pred FROM documents",

    "q42_repetition" ->
      s"SELECT doc_id, $repSql AS rep_frac FROM documents",

    // both sides floor-round q/rep to 4 decimals before the threshold
    // compare, so boundary docs land identically
    "q51_training_selection" ->
      s"""WITH scored AS (
         |  SELECT doc_id, $qualitySql AS q, $langPredSql AS lang_pred,
         |    $repSql AS rep,
         |    row_number() OVER (PARTITION BY md5($NORM) ORDER BY doc_id) AS rn
         |  FROM documents)
         |SELECT doc_id, lang_pred, q, rep FROM scored
         |WHERE rn = 1 AND q >= 0.5 AND rep <= 0.2 AND lang_pred <> 'und'""".stripMargin,

    "q43_langid_eval" ->
      s"""SELECT lang, $langPredSql AS lang_pred, count(*) AS n
         |FROM documents GROUP BY 1, 2""".stripMargin,

    "q44_corpus_stats" ->
      s"""SELECT source, lang, count(*) AS docs,
         |  CAST(sum(n_chars) AS BIGINT) AS chars,
         |  CAST(sum(CASE WHEN len(trim(text)) = 0 THEN 0 ELSE len($TOK) END)
         |       AS BIGINT) AS tokens
         |FROM documents GROUP BY 1, 2""".stripMargin,

    "q22_quality_score" ->
      s"SELECT doc_id, $qualitySql AS q FROM documents",

    // rank-based exact p90: the value at rank ceil(0.9*n) per language
    // in (q, doc_id) order — the same ceil over the same IEEE double
    // product on both engines, so the boundary row is identical
    "q72_percentile_gate" ->
      s"""WITH scored AS (
         |  SELECT doc_id, lang, $qualitySql AS q FROM documents),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY lang ORDER BY q, doc_id) AS rn,
         |    count(*) OVER (PARTITION BY lang) AS n
         |  FROM scored),
         |thr AS (
         |  SELECT lang, q AS threshold FROM ranked
         |  WHERE rn = CAST(ceil(0.9 * n) AS INT))
         |SELECT s.doc_id, s.lang, s.q, t.threshold
         |FROM scored s JOIN thr t USING (lang)
         |WHERE s.q >= t.threshold""".stripMargin,

    "q73_temperature_sample" -> {
      val bucket =
        s"((${toSigned(fnvSql("(doc_id::VARCHAR)"))} % 10000) + 10000) % 10000"
      s"""WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
         |mx AS (SELECT max(n) AS nmax FROM counts),
         |rates AS (
         |  SELECT lang,
         |    CAST(floor(sqrt(n::DOUBLE / nmax::DOUBLE) * 10000) AS BIGINT) AS rate
         |  FROM counts, mx)
         |SELECT doc_id, lang, $bucket AS bucket, rate
         |FROM documents JOIN rates USING (lang)
         |WHERE $bucket < rate""".stripMargin
    },

    "q74_zorder_layout" -> {
      def spread(v: String): String = {
        val a = s"((($v) | (($v) << 8)) & 16711935)"
        val b = s"(($a | ($a << 4)) & 252645135)"
        val c = s"(($b | ($b << 2)) & 858993459)"
        s"(($c | ($c << 1)) & 1431655765)"
      }
      s"""WITH base AS (
         |  SELECT ((user_id % 1024) + 1024) % 1024 AS x,
         |    (((CAST(floor(epoch(ts)) AS BIGINT) // 3600) % 1024) + 1024)
         |      % 1024 AS y
         |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
         |zk AS (SELECT x, y,
         |  (${spread("x")} | (${spread("y")} << 1)) AS z FROM base)
         |SELECT z >> 12 AS cell, count(*) AS n,
         |  min(x) AS min_x, max(x) AS max_x,
         |  min(y) AS min_y, max(y) AS max_y
         |FROM zk GROUP BY 1""".stripMargin
    },

    "q75_histogram_quantile" ->
      s"""WITH binned AS (
         |  SELECT lang,
         |    CAST(least(floor(($qualitySql) * 1024), 1023) AS INT) AS bin
         |  FROM documents WHERE text IS NOT NULL),
         |hist AS (SELECT lang, bin, count(*) AS c FROM binned GROUP BY 1, 2),
         |cums AS (
         |  SELECT lang, bin, c,
         |    CAST(sum(c) OVER (PARTITION BY lang ORDER BY bin
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         |    CAST(sum(c) OVER (PARTITION BY lang) AS BIGINT) AS n
         |  FROM hist)
         |SELECT lang, n AS n_docs, bin AS p90_bin,
         |  bin::DOUBLE / 1024.0 AS threshold
         |FROM cums
         |WHERE cum >= CAST(ceil(0.9 * n) AS BIGINT)
         |  AND cum - c < CAST(ceil(0.9 * n) AS BIGINT)""".stripMargin,

    "q76_tfidf_topterms" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($TOKL) AS tok FROM documents
         |  WHERE len(trim(text)) > 0),
         |dt AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
         |dfreq AS (SELECT tok, count(*) AS df FROM dt GROUP BY tok),
         |nd AS (SELECT count(DISTINCT doc_id) AS n FROM dt),
         |idf AS (
         |  SELECT tok, floor(ln(n::DOUBLE / df::DOUBLE) * 10000 + 0.5) / 10000
         |    AS idf
         |  FROM dfreq, nd),
         |scored AS (
         |  SELECT doc_id, tok, tf, tf::DOUBLE * idf AS score
         |  FROM dt JOIN idf USING (tok)),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY doc_id
         |    ORDER BY score DESC, tok) AS rnk
         |  FROM scored)
         |SELECT doc_id, tok, tf, score, rnk FROM ranked WHERE rnk <= 3""".stripMargin,

    "q77_incremental_dedup" ->
      s"""WITH d AS (
         |  SELECT doc_id, substr(md5($NORM), 1, 16) AS fp
         |  FROM documents WHERE text IS NOT NULL),
         |corpus AS (SELECT * FROM d WHERE doc_id % 3 = 0),
         |batch AS (
         |  SELECT * FROM d WHERE doc_id % 3 <> 0
         |  UNION ALL
         |  SELECT doc_id + 200000 AS doc_id, fp FROM corpus
         |  WHERE doc_id % 30 = 0),
         |keeper AS (SELECT fp, min(doc_id) AS keep_id FROM batch GROUP BY fp),
         |idx AS (SELECT DISTINCT fp FROM corpus)
         |SELECT b.doc_id, b.fp,
         |  CASE WHEN i.fp IS NOT NULL THEN 'dup_of_corpus'
         |       WHEN b.doc_id <> k.keep_id THEN 'dup_in_batch'
         |       ELSE 'new' END AS status
         |FROM batch b
         |JOIN keeper k USING (fp)
         |LEFT JOIN idx i ON b.fp = i.fp""".stripMargin,

    "q78_pmi_phrases" ->
      s"""WITH toksrc AS (
         |  SELECT $TOKL AS t FROM documents WHERE len(trim(text)) > 0),
         |uc AS (
         |  SELECT tok, count(*) AS c
         |  FROM (SELECT unnest(t) AS tok FROM toksrc) GROUP BY tok),
         |nt AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uc),
         |bc AS (
         |  SELECT g, count(*) AS c_xy
         |  FROM (SELECT unnest(list_transform(range(1, len(t)),
         |          i -> t[i] || ' ' || t[i+1])) AS g FROM toksrc)
         |  GROUP BY g HAVING count(*) >= 5)
         |SELECT b.g AS gram, b.c_xy,
         |  floor(ln((b.c_xy::DOUBLE * nt.n::DOUBLE)
         |           / (u1.c::DOUBLE * u2.c::DOUBLE)) * 10000 + 0.5) / 10000
         |    AS pmi
         |FROM bc b
         |JOIN uc u1 ON split_part(b.g, ' ', 1) = u1.tok
         |JOIN uc u2 ON split_part(b.g, ' ', 2) = u2.tok, nt
         |ORDER BY pmi DESC, gram LIMIT 100""".stripMargin,

    "q79_token_chunks" -> {
      val fp = toSigned(fnvSql("cs"))
      s"""WITH toksrc AS (
         |  SELECT doc_id, $TOKL AS t FROM documents
         |  WHERE len(trim(text)) > 0),
         |base AS (
         |  SELECT doc_id, t,
         |    CASE WHEN len(t) <= 64 THEN 1
         |         ELSE CAST(ceil((len(t) - 64) / 48.0) AS BIGINT) + 1 END
         |      AS n_chunks
         |  FROM toksrc),
         |ch AS (
         |  SELECT doc_id, t, unnest(range(0, n_chunks)) AS chunk_id
         |  FROM base),
         |sl AS (
         |  SELECT doc_id, chunk_id,
         |    list_slice(t, chunk_id * 48 + 1, chunk_id * 48 + 64) AS chunk
         |  FROM ch),
         |sj AS (
         |  SELECT doc_id, chunk_id, len(chunk) AS n_tok,
         |    array_to_string(chunk, ' ') AS cs
         |  FROM sl)
         |SELECT doc_id, chunk_id, n_tok, $fp AS chunk_fp FROM sj""".stripMargin
    },

    "q80_inverted_index" ->
      s"""WITH dt AS (
         |  SELECT DISTINCT doc_id, tok FROM (
         |    SELECT doc_id, unnest($TOKL) AS tok FROM documents
         |    WHERE len(trim(text)) > 0))
         |SELECT tok, count(*) AS df,
         |  array_to_string(list_sort(list(doc_id))[1:32], ',') AS postings
         |FROM dt GROUP BY tok""".stripMargin,

    "q81_bm25_topk" ->
      s"""WITH $bm25Ctes
         |SELECT doc_id, score FROM bm
         |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,

    "q85_cms_counts" -> {
      val bucket = s"((${toSigned(fnvSql("(r.r::VARCHAR || ':' || tok)"))}" +
        " % 16) + 16) % 16"
      s"""WITH toks AS (
         |  SELECT unnest($TOKL) AS tok FROM documents
         |  WHERE len(trim(text)) > 0),
         |exact AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
         |tb AS (
         |  SELECT tok, cnt, r.r AS r, $bucket AS c
         |  FROM exact, range(4) r(r)),
         |cells AS (
         |  SELECT r, c, CAST(sum(cnt) AS BIGINT) AS cell
         |  FROM tb GROUP BY r, c),
         |est AS (
         |  SELECT tok, min(cell) AS est
         |  FROM tb JOIN cells USING (r, c) GROUP BY tok)
         |SELECT e.tok, e.cnt, est FROM exact e JOIN est USING (tok)"""
        .stripMargin
    },

    "q86_rrf_fusion" -> {
      def term(r: String) =
        s"""coalesce((floor(1.0::DOUBLE / ((60 + $r)::DOUBLE)
           |  * 10000 + 0.5) / 10000)::DECIMAL(18,4),
           |  0::DECIMAL(18,4))""".stripMargin
      s"""WITH $bm25Ctes,
         |bmr AS (
         |  SELECT doc_id, row_number() OVER (
         |    ORDER BY score DESC, doc_id) AS r1
         |  FROM (SELECT * FROM bm ORDER BY score DESC, doc_id LIMIT 20)),
         |q0 AS (
         |  SELECT embedding::DOUBLE[] AS e FROM embeddings
         |  WHERE vec_id = 0),
         |qn AS (SELECT $NormE AS q FROM q0),
         |nv AS (SELECT vec_id, $NormE AS v FROM (
         |  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)),
         |atop AS (
         |  SELECT vec_id,
         |    floor(list_dot_product(v, q) * 10000 + 0.5) / 10000 AS cos
         |  FROM nv, qn ORDER BY cos DESC, vec_id LIMIT 20),
         |annr AS (
         |  SELECT vec_id, row_number() OVER (
         |    ORDER BY cos DESC, vec_id) AS r2 FROM atop),
         |f AS (
         |  SELECT coalesce(b.doc_id, a.vec_id) AS id,
         |    ${term("r1")} + ${term("r2")} AS rrf
         |  FROM bmr b FULL OUTER JOIN annr a ON b.doc_id = a.vec_id)
         |SELECT id, rrf::DOUBLE AS rrf FROM f
         |ORDER BY rrf DESC, id LIMIT 10""".stripMargin
    },

    // the bloom is oracle-INVISIBLE: no false negatives + exact
    // residual join ⇒ the composite equals the exact q56 overlap, so
    // the oracle is the exact gram intersection with a per-doc count
    "q87_bloom_decontaminate" -> {
      val gramJoin = (0 until 8).map(j => s"t[i+$j]").mkString(" || ' ' || ")
      s"""WITH d AS (SELECT doc_id, $TOK AS t FROM documents),
         |ev AS (SELECT * FROM d WHERE doc_id % 50 = 0),
         |tr AS (SELECT doc_id, t FROM d WHERE doc_id % 50 <> 0
         |       UNION ALL SELECT doc_id + 200000, t FROM ev),
         |evg AS (
         |  SELECT DISTINCT ${fnvSql("g")} AS h FROM (
         |    SELECT unnest(list_transform(range(1, len(t)-6),
         |      i -> $gramJoin)) AS g
         |    FROM ev)),
         |trg AS (
         |  SELECT doc_id, ${fnvSql("g")} AS h FROM (
         |    SELECT doc_id, unnest(list_transform(range(1, len(t)-6),
         |      i -> $gramJoin)) AS g
         |    FROM tr))
         |SELECT doc_id, count(DISTINCT h) AS shared FROM trg
         |WHERE h IN (SELECT h FROM evg)
         |GROUP BY doc_id""".stripMargin
    },

    // rebuilds the IDENTICAL HLL registers from raw data (unsigned FNV
    // in HUGEINT mod-2^64 arithmetic; bucket = h mod 64, w = h // 64,
    // rho = trailing zeros of w plus one, via bin()/rtrim) and the
    // identical integer estimate — no float math
    "q88_hll_distinct" ->
      s"""WITH toks AS (
         |  SELECT lang, unnest($TOKL) AS tok FROM documents
         |  WHERE len(trim(text)) > 0),
         |dt AS (SELECT DISTINCT lang, tok FROM toks),
         |h AS (SELECT lang, ${fnvSql("tok")} AS hu FROM dt),
         |br AS (SELECT lang, CAST(hu % 64 AS INT) AS b,
         |              CAST(hu // 64 AS BIGINT) AS w FROM h),
         |rr AS (SELECT lang, b,
         |  CASE WHEN w = 0 THEN 59
         |       ELSE length(bin(w)) - length(rtrim(bin(w), '0')) + 1
         |  END AS rho
         |  FROM br),
         |regs AS (
         |  SELECT l.lang, r.r AS b, coalesce(max(rho), 0) AS reg
         |  FROM (SELECT DISTINCT lang FROM dt) l CROSS JOIN range(64) r(r)
         |  LEFT JOIN rr ON rr.lang = l.lang AND rr.b = r.r
         |  GROUP BY 1, 2),
         |s AS (SELECT lang,
         |  sum((CAST(1 AS BIGINT) << (59 - reg))::HUGEINT) AS ssum
         |  FROM regs GROUP BY lang),
         |e AS (SELECT lang,
         |  CAST((2905::HUGEINT * 576460752303423488::HUGEINT)
         |       // ssum AS BIGINT) AS hll_est FROM s),
         |x AS (SELECT lang, count(DISTINCT tok) AS exact_uniq
         |      FROM toks GROUP BY lang)
         |SELECT x.lang, exact_uniq, hll_est FROM x JOIN e USING (lang)"""
        .stripMargin,

    // the sequential prefix sum (one window) — the engine's two-phase
    // shard sum must equal it exactly because shard = doc_id div 100
    // is monotonic in doc_id
    "q89_pack_sequences" ->
      s"""WITH dt AS (
         |  SELECT doc_id, len($TOK)::BIGINT AS n FROM documents
         |  WHERE len(trim(text)) > 0),
         |o AS (SELECT doc_id, n,
         |  CAST(coalesce(sum(n + 1) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |    AS BIGINT) AS off
         |  FROM dt),
         |sp AS (SELECT doc_id, n, off,
         |  unnest(range(off // 256, (off + n - 1) // 256 + 1)) AS seq_id
         |  FROM o)
         |SELECT seq_id, doc_id,
         |  greatest(off, seq_id * 256) - off AS doc_off,
         |  greatest(off, seq_id * 256) - seq_id * 256 AS seq_off,
         |  least(off + n, (seq_id + 1) * 256)
         |    - greatest(off, seq_id * 256) AS n_toks
         |FROM sp""".stripMargin,

    "q90_pagerank" -> pagerankSql(3),

    // rebuilds the codebook (16 lowest-id vectors), every vector's 8
    // sub-codes (first-min tie rule = the engine's array_position),
    // the query's integer-quantized distance table, and the exact
    // BIGINT ADC sum — the relational form of Ann.pqTopK
    "q91_pq_ann" ->
      s"""WITH v AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
         |  WHERE len(embedding) = 64),
         |cb AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS k,
         |         embedding::DOUBLE[] AS c
         |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)),
         |subs AS (SELECT unnest(range(8)) AS mi),
         |cd AS (
         |  SELECT v.vec_id, s.mi, cb.k,
         |    ${l2sqSql("list_slice(v.e, s.mi*8+1, s.mi*8+8)",
                        "list_slice(cb.c, s.mi*8+1, s.mi*8+8)")} AS dist
         |  FROM v, subs s, cb),
         |codes AS (
         |  SELECT vec_id, mi, k AS code FROM (
         |    SELECT vec_id, mi, k,
         |      row_number() OVER (PARTITION BY vec_id, mi
         |                         ORDER BY dist, k) AS rn
         |    FROM cd) WHERE rn = 1),
         |q0 AS (SELECT embedding::DOUBLE[] AS e FROM embeddings
         |       WHERE vec_id = 0),
         |t AS (
         |  SELECT s.mi, cb.k,
         |    CAST(floor(${l2sqSql("list_slice(q0.e, s.mi*8+1, s.mi*8+8)",
                                   "list_slice(cb.c, s.mi*8+1, s.mi*8+8)")}
         |         * 1000000000000 + 0.5) AS BIGINT) AS ts
         |  FROM q0, subs s, cb),
         |d AS (
         |  SELECT vec_id, CAST(sum(ts) AS BIGINT) AS dist_micro
         |  FROM codes JOIN t ON codes.mi = t.mi AND codes.code = t.k
         |  GROUP BY vec_id)
         |SELECT vec_id, dist_micro FROM d
         |ORDER BY dist_micro, vec_id LIMIT 10""".stripMargin,

    "q97_source_overlap" ->
      s"""WITH d0 AS (
         |  SELECT doc_id, text, source FROM documents
         |  UNION ALL
         |  SELECT doc_id + 400000, text, 'mirror' FROM documents
         |  WHERE doc_id % 25 = 0),
         |f AS (SELECT DISTINCT md5($NORM) AS fp, source FROM d0
         |      WHERE len(trim(text)) > 0)
         |SELECT a.source AS src_a, b.source AS src_b,
         |       count(*) AS shared_fps
         |FROM f a JOIN f b ON a.fp = b.fp AND a.source < b.source
         |GROUP BY 1, 2""".stripMargin,

    // cumulative conjunctions over the q51 signal expressions; stage 4
    // must equal q51's final selection count by construction
    "q96_filter_ablation" ->
      s"""WITH scored AS (
         |  SELECT doc_id, $qualitySql AS q, $langPredSql AS lang_pred,
         |    $repSql AS rep,
         |    row_number() OVER (PARTITION BY md5($NORM) ORDER BY doc_id)
         |      AS rn
         |  FROM documents),
         |f AS (SELECT
         |  count(*) AS s0,
         |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS s1,
         |  CAST(sum(CASE WHEN rn = 1 AND lang_pred <> 'und'
         |       THEN 1 ELSE 0 END) AS BIGINT) AS s2,
         |  CAST(sum(CASE WHEN rn = 1 AND lang_pred <> 'und' AND q >= 0.5
         |       THEN 1 ELSE 0 END) AS BIGINT) AS s3,
         |  CAST(sum(CASE WHEN rn = 1 AND lang_pred <> 'und' AND q >= 0.5
         |       AND rep <= 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS s4
         |  FROM scored)
         |SELECT 0 AS stage, s0 AS docs FROM f
         |UNION ALL SELECT 1, s1 FROM f
         |UNION ALL SELECT 2, s2 FROM f
         |UNION ALL SELECT 3, s3 FROM f
         |UNION ALL SELECT 4, s4 FROM f""".stripMargin,

    // the split is a pure function of the reachability clusters (the
    // q50 oracle) hashed mod 100 — same FNV, same cutoffs
    "q95_leakage_split" ->
      s"""WITH RECURSIVE ${jaccardCtes(hashed = false)},
         |sym AS (SELECT a AS src, b AS dst FROM jp
         |        UNION SELECT b, a FROM jp),
         |reach AS (
         |  SELECT src, dst FROM sym
         |  UNION
         |  SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src),
         |cl AS (SELECT src AS id, least(src, min(dst)) AS cluster
         |       FROM reach GROUP BY src),
         |a AS (
         |  SELECT d.doc_id, coalesce(cl.cluster, d.doc_id) AS anchor
         |  FROM (SELECT doc_id FROM documents) d
         |  LEFT JOIN cl ON cl.id = d.doc_id),
         |bkt AS (
         |  SELECT doc_id, anchor,
         |    ((${toSigned(fnvSql("CAST(anchor AS VARCHAR)"))} % 100)
         |     + 100) % 100 AS b
         |  FROM a)
         |SELECT doc_id, anchor,
         |  CASE WHEN b < 80 THEN 'train'
         |       WHEN b < 90 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM bkt""".stripMargin,

    "q92_containment" -> {
      val gramJoin = (0 until 8).map(j => s"t[i+$j]").mkString(" || ' ' || ")
      s"""WITH d AS (SELECT doc_id, $TOK AS t FROM documents
         |      WHERE len(trim(text)) > 0),
         |g0 AS (SELECT doc_id, unnest(list_transform(range(1, len(t)-6),
         |        i -> $gramJoin)) AS g FROM d),
         |gh AS (SELECT DISTINCT doc_id, ${fnvSql("g")} AS g FROM g0),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM gh GROUP BY doc_id),
         |rare AS (SELECT g FROM gh GROUP BY g
         |         HAVING count(*) BETWEEN 2 AND 4),
         |rt AS (SELECT doc_id, g FROM gh
         |       WHERE g IN (SELECT g FROM rare)),
         |e AS (SELECT DISTINCT a.doc_id AS sa, b.doc_id AS sb
         |      FROM rt a JOIN rt b USING (g) WHERE a.doc_id < b.doc_id),
         |inter AS (
         |  SELECT e.sa, e.sb, count(*) AS shared
         |  FROM e
         |  JOIN gh ga ON ga.doc_id = e.sa
         |  JOIN gh gb ON gb.doc_id = e.sb AND gb.g = ga.g
         |  GROUP BY e.sa, e.sb)
         |SELECT sa, sb, shared,
         |  (shared * 10000) // za.sz AS cont_a_bp,
         |  (shared * 10000) // zb.sz AS cont_b_bp
         |FROM inter
         |JOIN sizes za ON za.doc_id = sa
         |JOIN sizes zb ON zb.doc_id = sb""".stripMargin
    },

    "q82_bigram_surprisal" ->
      s"""WITH toksrc AS (
         |  SELECT doc_id, $TOKL AS t FROM documents
         |  WHERE len(trim(text)) > 0),
         |bg AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(t)),
         |           i -> t[i] || ' ' || t[i+1])) AS g
         |  FROM toksrc),
         |cxy AS (SELECT g, count(*) AS c_xy FROM bg GROUP BY g),
         |cx AS (
         |  SELECT split_part(g, ' ', 1) AS w1,
         |    CAST(sum(c_xy) AS BIGINT) AS c_x
         |  FROM cxy GROUP BY 1),
         |surp AS (
         |  SELECT g,
         |    (floor(-ln(c_xy::DOUBLE / c_x::DOUBLE) * 10000 + 0.5)
         |      / 10000)::DECIMAL(18,4) AS s
         |  FROM cxy JOIN cx ON split_part(g, ' ', 1) = cx.w1)
         |SELECT doc_id,
         |  floor((sum(s)::DOUBLE / count(*)) * 10000 + 0.5) / 10000
         |    AS bigram_surprisal
         |FROM bg JOIN surp USING (g) GROUP BY doc_id""".stripMargin,

    "q83_hard_negatives" ->
      s"""WITH b AS (
         |  SELECT vec_id, label, embedding::DOUBLE[] AS e
         |  FROM embeddings),
         |n AS (SELECT vec_id, label, $NormE AS v FROM b),
         |q AS (SELECT vec_id AS qid, label AS qlabel, v AS qv
         |      FROM n WHERE vec_id < 20),
         |x AS (
         |  SELECT q.qid, n.vec_id,
         |    floor(list_dot_product(n.v, q.qv) * 10000 + 0.5) / 10000 AS cos
         |  FROM n JOIN q ON n.label <> q.qlabel)
         |SELECT qid, vec_id AS neg_id, cos, rn FROM (
         |  SELECT qid, vec_id, cos, row_number() OVER (
         |    PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
         |  FROM x) WHERE rn <= 5""".stripMargin,

    "q84_nearest_centroid" ->
      s"""WITH v AS (
         |  SELECT vec_id, label, embedding::DOUBLE[] AS e
         |  FROM embeddings WHERE label IS NOT NULL),
         |dims AS (
         |  SELECT unnest(range((SELECT len(embedding::DOUBLE[])
         |                       FROM embeddings WHERE vec_id = 0))) AS pos),
         |sums AS (
         |  SELECT label, p.pos,
         |    sum((e[p.pos+1])::DECIMAL(30,12)) AS s, count(*) AS n
         |  FROM v, dims p GROUP BY label, p.pos),
         |cents AS (
         |  SELECT label AS clabel, list(s::DOUBLE / n ORDER BY pos) AS c
         |  FROM sums GROUP BY label),
         |d AS (
         |  SELECT v.vec_id, v.label, c.clabel,
         |    ${l2sqSql("v.e", "c.c")} AS dist
         |  FROM v, cents c),
         |pred AS (
         |  SELECT vec_id, label, clabel AS pred_label FROM (
         |    SELECT vec_id, label, clabel, row_number() OVER (
         |      PARTITION BY vec_id ORDER BY dist, clabel) AS rn
         |    FROM d) WHERE rn = 1)
         |SELECT label AS true_label, pred_label, count(*) AS n
         |FROM pred GROUP BY 1, 2""".stripMargin,

    "q23_fingerprint" ->
      s"SELECT doc_id, substr(md5($NORM), 1, 16) AS fp FROM documents",

    "q39_exact_dedup_fp" ->
      s"""SELECT md5($NORM) AS fp, min(doc_id) AS keep_id,
         |  count(*) AS group_size FROM documents GROUP BY 1""".stripMargin,

    "q49_exact_dropids" ->
      s"""WITH all_docs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 100000 AS doc_id, text FROM documents
         |  WHERE doc_id % 10 = 0)
         |SELECT doc_id AS drop_id FROM (
         |  SELECT doc_id,
         |    row_number() OVER (PARTITION BY md5($NORM) ORDER BY doc_id) AS rn
         |  FROM all_docs) WHERE rn > 1""".stripMargin,

    "q58_gopher_repetition" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest($TOKL) AS g FROM documents
         |  WHERE len(trim(text)) > 0),
         |wc AS (SELECT doc_id, g, count(*) AS c FROM tok GROUP BY 1, 2),
         |word AS (
         |  SELECT doc_id,
         |    floor(max(c)::DOUBLE / sum(c)::DOUBLE * 10000 + 0.5) / 10000
         |      AS top_word_frac
         |  FROM wc GROUP BY doc_id),
         |bg AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS g
         |  FROM (SELECT doc_id, $TOKL AS t FROM documents
         |        WHERE len(trim(text)) > 0)),
         |bc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
         |bi AS (
         |  SELECT doc_id,
         |    floor(max(c)::DOUBLE / sum(c)::DOUBLE * 10000 + 0.5) / 10000
         |      AS top_bigram_frac
         |  FROM bc GROUP BY doc_id),
         |ln AS (
         |  SELECT doc_id,
         |    floor((1.0 - len(list_distinct(ls))::DOUBLE / len(ls)::DOUBLE)
         |          * 10000 + 0.5) / 10000 AS dup_line_frac
         |  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls
         |        FROM documents WHERE text IS NOT NULL))
         |SELECT w.doc_id, w.top_word_frac,
         |  coalesce(b.top_bigram_frac, 0.0) AS top_bigram_frac,
         |  l.dup_line_frac
         |FROM word w JOIN ln l USING (doc_id)
         |LEFT JOIN bi b USING (doc_id)""".stripMargin,

    "q63_redact" -> {
      val email = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
      val digits = "[0-9]{9,}"
      s"""WITH d AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 20 = 0 THEN
         |      text || ' contact: user' || doc_id::VARCHAR
         |           || '@example.com ref 9876543210'
         |    ELSE text END AS text
         |  FROM documents WHERE text IS NOT NULL)
         |SELECT doc_id,
         |  len(regexp_extract_all(text, '$email'))::BIGINT AS n_emails,
         |  len(regexp_extract_all(text, '$digits'))::BIGINT AS n_long_digits,
         |  regexp_replace(regexp_replace(text, '$email', '<EMAIL>', 'g'),
         |    '$digits', '<NUM>', 'g') AS redacted
         |FROM d""".stripMargin
    },

    "q62_longest_keeper" ->
      s"""WITH all_docs AS (
         |  SELECT doc_id, text FROM documents WHERE text IS NOT NULL
         |  UNION ALL
         |  SELECT doc_id + 400000, text || '  ' FROM documents
         |  WHERE text IS NOT NULL AND doc_id % 10 = 0)
         |SELECT doc_id, len FROM (
         |  SELECT doc_id, len(text)::INT AS len,
         |    row_number() OVER (PARTITION BY md5($NORM)
         |                       ORDER BY len(text) DESC, doc_id) AS rn
         |  FROM all_docs) WHERE rn = 1""".stripMargin,

    "q64_span_dedup" -> {
      val gram = (0 until SpanK).map(j => s"t[i+$j]").mkString(" || ' ' || ")
      s"""WITH d AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 5 = 0 THEN '$SpanBoiler1 ' || text
         |         WHEN doc_id % 7 = 3 THEN text || ' $SpanBoiler2'
         |         ELSE text END AS text
         |  FROM documents WHERE text IS NOT NULL),
         |tk AS (SELECT doc_id,
         |         CASE WHEN len(trim(text)) = 0 THEN []::VARCHAR[]
         |              ELSE $TOK END AS t
         |       FROM d),
         |sp AS (
         |  SELECT doc_id, u['start'] AS start, ${fnvSql("g")} AS fp FROM (
         |    SELECT doc_id, u, u['g'] AS g FROM (
         |      SELECT doc_id, unnest(list_transform(
         |        range(1, len(t) - ${SpanK - 2}),
         |        i -> {'start': i - 1, 'g': $gram})) AS u
         |      FROM tk))),
         |rk AS (SELECT doc_id, start,
         |         count(*) OVER (PARTITION BY fp) AS n,
         |         row_number() OVER (PARTITION BY fp
         |                            ORDER BY doc_id, start) AS rn
         |       FROM sp),
         |mask AS (SELECT DISTINCT doc_id, pos FROM (
         |           SELECT doc_id,
         |             unnest(range(start, start + $SpanK)) AS pos
         |           FROM rk WHERE n > 1 AND rn > 1)),
         |tp AS (SELECT doc_id, u['pos'] AS pos, u['tok'] AS tok FROM (
         |         SELECT doc_id, unnest(list_transform(
         |           range(1, len(t) + 1),
         |           i -> {'pos': i - 1, 'tok': t[i]})) AS u
         |         FROM tk)),
         |kept AS (SELECT tp.doc_id, tp.pos, tp.tok FROM tp
         |         LEFT JOIN mask m
         |           ON m.doc_id = tp.doc_id AND m.pos = tp.pos
         |         WHERE m.pos IS NULL),
         |agg AS (SELECT doc_id,
         |          string_agg(tok, ' ' ORDER BY pos) AS clean_text,
         |          count(*) AS n_kept
         |        FROM kept GROUP BY doc_id),
         |tot AS (SELECT doc_id, len(t) AS n FROM tk)
         |SELECT t.doc_id, coalesce(a.clean_text, '') AS clean_text,
         |  t.n::BIGINT AS n_tokens,
         |  (t.n - coalesce(a.n_kept, 0))::BIGINT AS n_dropped
         |FROM tot t LEFT JOIN agg a USING (doc_id)""".stripMargin
    },

    "q61_line_dedup" ->
      s"""WITH docs3 AS (
         |  SELECT a.doc_id, concat_ws(chr(10), a.text, b.text, c.text) AS text
         |  FROM documents a
         |  JOIN documents b ON b.doc_id = a.doc_id + 1
         |  JOIN documents c ON c.doc_id = a.doc_id + 2),
         |lx AS (
         |  SELECT doc_id, u['idx'] AS idx, u['line'] AS line FROM (
         |    SELECT doc_id, unnest(list_transform(range(1, len(ls)+1),
         |      i -> {'idx': i, 'line': ls[i]})) AS u
         |    FROM (SELECT doc_id, string_split(text, chr(10)) AS ls
         |          FROM docs3 WHERE text IS NOT NULL))),
         |ne AS (SELECT doc_id, idx, line,
         |         row_number() OVER (PARTITION BY md5(line)
         |                            ORDER BY doc_id, idx) AS rn
         |       FROM lx WHERE trim(line) <> ''),
         |keep AS (SELECT doc_id, idx, line FROM ne WHERE rn = 1
         |         UNION ALL
         |         SELECT doc_id, idx, line FROM lx WHERE trim(line) = ''),
         |agg AS (SELECT doc_id,
         |          string_agg(line, chr(10) ORDER BY idx) AS clean_text,
         |          count(*) AS n_kept
         |        FROM keep GROUP BY doc_id),
         |tot AS (SELECT doc_id, count(*) AS n_lines FROM lx GROUP BY doc_id)
         |SELECT t.doc_id, coalesce(a.clean_text, '') AS clean_text,
         |  coalesce(a.n_kept, 0)::BIGINT AS n_kept,
         |  (t.n_lines - coalesce(a.n_kept, 0))::BIGINT AS n_dropped
         |FROM tot t LEFT JOIN agg a USING (doc_id)""".stripMargin,

    "q60_c4_signals" -> {
      val nTok = s"(CASE WHEN len(trim(text)) = 0 THEN 0 ELSE len($TOK) END)"
      s"""SELECT doc_id,
         |  floor(len(list_filter(string_split(text, chr(10)),
         |          l -> right(trim(l), 1) IN ('.', '!', '?')))::DOUBLE
         |    / len(string_split(text, chr(10)))::DOUBLE * 10000 + 0.5) / 10000
         |    AS punct_line_frac,
         |  CASE WHEN $nTok > 0 THEN
         |    floor(len(regexp_replace(trim(text), '[ \\t\\n\\r\\f\\x0B]+', '', 'g'))::DOUBLE
         |      / $nTok::DOUBLE * 10000 + 0.5) / 10000
         |  ELSE 0.0 END AS mean_word_len,
         |  contains(lower(text), 'lorem ipsum') AS has_lorem,
         |  contains(lower(text), '{') AS has_brace,
         |  len(regexp_extract_all(text, '[.!?]'))::BIGINT AS n_sentences
         |FROM documents WHERE text IS NOT NULL""".stripMargin
    },

    "q37_bpe_tokens" ->
      """SELECT doc_id, len(regexp_extract_all(text,
        |  '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+')) AS n_bpe
        |FROM documents""".stripMargin,

    "q24_rolling_hash" ->
      s"""SELECT doc_id, list_reduce(
         |  list_prepend(0::BIGINT, list_transform($TOK,
         |    t -> (len(t) + ascii(t))::BIGINT)),
         |  (h, t) -> (h * 31 + t) % 1000000007) AS rh
         |FROM documents""".stripMargin,

    "q25_exact_dedup" ->
      s"""SELECT $NORM AS norm_key, min(doc_id) AS keep_id,
         |  count(*) AS group_size FROM documents GROUP BY 1""".stripMargin,

    "q26_minhash_sig" ->
      s"SELECT doc_id, ${sigExprs.mkString(" || '|' || ")} AS sig FROM documents",

    "q27_lsh_buckets" -> {
      val bands = (0 until K / R).map(b =>
        s"SELECT doc_id, $b AS band, ${bandKeyExpr(b)} AS band_key FROM sig")
        .mkString(" UNION ALL ")
      s"""WITH sig AS (SELECT doc_id, [${sigExprs.mkString(", ")}] AS s FROM documents),
         |bk AS ($bands)
         |SELECT band, band_key,
         |  string_agg(doc_id, ',' ORDER BY doc_id) AS ids, count(*) AS n
         |FROM bk GROUP BY band, band_key
         |HAVING count(*) > 1 AND count(*) <= ${Dedup.MaxBucketForPairs}""".stripMargin
    },

    "q28_cosine_topk" ->
      """WITH q0 AS (
        |  SELECT embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id = 0),
        |qn AS (SELECT CASE WHEN sqrt(list_dot_product(e, e)) > 0
        |  THEN list_transform(e, x -> x / sqrt(list_dot_product(e, e)))
        |  ELSE e END AS q FROM q0),
        |n AS (SELECT vec_id,
        |  CASE WHEN sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) > 0
        |    THEN list_transform(embedding::DOUBLE[],
        |      x -> x / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])))
        |    ELSE embedding::DOUBLE[] END AS v FROM embeddings)
        |SELECT vec_id, floor(list_dot_product(v, q) * 10000 + 0.5) / 10000 AS cos
        |FROM n, qn ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin,

    "q31_jaccard_pairs" -> jaccardPairsSql(hashed = false),

    "q45_jaccard_pairs_hashed" -> jaccardPairsSql(hashed = true),

    // transitive closure over the q31 edge set: cluster = min reachable
    // id (the same deterministic min-wins keeper rule as exact dedup)
    "q50_dup_clusters" ->
      s"""WITH RECURSIVE ${jaccardCtes(hashed = false)},
         |sym AS (SELECT a AS src, b AS dst FROM jp
         |        UNION SELECT b, a FROM jp),
         |reach AS (
         |  SELECT src, dst FROM sym
         |  UNION
         |  SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src)
         |SELECT src AS id, least(src, min(dst)) AS cluster
         |FROM reach GROUP BY src""".stripMargin,

    "q59_dup_clusters_star" ->
      s"""WITH RECURSIVE ${jaccardCtes(hashed = false)},
         |sym AS (SELECT a AS src, b AS dst FROM jp
         |        UNION SELECT b, a FROM jp),
         |reach AS (
         |  SELECT src, dst FROM sym
         |  UNION
         |  SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src)
         |SELECT src AS id, least(src, min(dst)) AS cluster
         |FROM reach GROUP BY src""".stripMargin,

    "q19_term_freq" ->
      s"""SELECT tok, count(*) AS cnt FROM (
         |  SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
         |  FROM documents WHERE len(trim(text)) > 0)
         |GROUP BY tok ORDER BY cnt DESC, tok LIMIT 100""".stripMargin,

    // null text: engine emits (null, null) — the oracle's list_reduce
    // fold would otherwise degrade NULL input to the bare FNV seed and
    // coalesce would bucket it at simhash 0, so both columns propagate
    // NULL explicitly (empty text correctly hashes to seed / simhash 0
    // on both sides)
    "q29_simhash" ->
      s"""${simhashCte()},
         |f AS (SELECT doc_id,
         |  CASE WHEN nt IS NULL THEN NULL ELSE ${fnvSql("nt")} END AS h
         |  FROM n)
         |SELECT shu.doc_id, ${toSigned("shu.u::HUGEINT")} AS sh,
         |       ${toSigned("f.h")} AS fnv
         |FROM shu JOIN f USING (doc_id)""".stripMargin,

    "q30_simhash_templates" -> simhashPairsSql(
      s"read_parquet('${graft.fixtures.FixtureGen.SimhashTemplatesPath}')",
      maxHamming = 8),

    "q47_simhash_neardups" -> simhashPairsSql(
      s"read_parquet('${graft.fixtures.FixtureGen.NearDupDocsPath}')",
      maxHamming = 3),

    "q57_fastminhash_neardups" -> bruteJaccardSql(
      graft.fixtures.FixtureGen.NearDupFastDocsPath, threshold = 0.7),

    "q33_lsh_ann" ->
      s"""WITH q0 AS (
         |  SELECT embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id = 0),
         |qb AS (SELECT ${lshBucketSql("e")} AS qbucket FROM q0),
         |probes AS (
         |  SELECT qbucket AS p FROM qb
         |  UNION ALL
         |  SELECT xor(qbucket::BIGINT, (1::BIGINT << i))::BIGINT
         |  FROM qb, range(8) r(i)),
         |b AS (SELECT vec_id, embedding::DOUBLE[] AS e,
         |        ${lshBucketSql("embedding::DOUBLE[]")} AS bkt
         |      FROM embeddings),
         |cand AS (SELECT vec_id, e FROM b WHERE bkt IN (SELECT p FROM probes)),
         |qn AS (SELECT $NormE AS q FROM q0),
         |nn AS (SELECT vec_id, $NormE AS v FROM cand)
         |SELECT vec_id, floor(list_dot_product(v, q) * 10000 + 0.5) / 10000 AS cos
         |FROM nn, qn ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin,

    "q66_ann_recall" ->
      s"""WITH b AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS e,
         |    ${lshBucketSql("embedding::DOUBLE[]")} AS bkt
         |  FROM embeddings),
         |n AS (SELECT vec_id, $NormE AS v, bkt FROM b),
         |q AS (SELECT vec_id AS qid, v AS qv, bkt AS qbkt
         |      FROM n WHERE vec_id < 20),
         |probes AS (
         |  SELECT qid, qv, qbkt AS bkt FROM q
         |  UNION ALL
         |  SELECT qid, qv, xor(qbkt::BIGINT, (1::BIGINT << i))::BIGINT
         |  FROM q, range(8) r(i)),
         |ax AS (
         |  SELECT p.qid, n.vec_id,
         |    floor(list_dot_product(n.v, p.qv) * 10000 + 0.5) / 10000 AS cos
         |  FROM n JOIN probes p ON n.bkt = p.bkt),
         |atop AS (SELECT qid, vec_id FROM (
         |  SELECT qid, vec_id, row_number() OVER (
         |    PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
         |  FROM ax) WHERE rn <= 10),
         |ex AS (
         |  SELECT q.qid, n.vec_id,
         |    floor(list_dot_product(n.v, q.qv) * 10000 + 0.5) / 10000 AS cos
         |  FROM n, q),
         |etop AS (SELECT qid, vec_id FROM (
         |  SELECT qid, vec_id, row_number() OVER (
         |    PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
         |  FROM ex) WHERE rn <= 10),
         |hits AS (
         |  SELECT e.qid, count(*) AS c
         |  FROM etop e JOIN atop a ON a.qid = e.qid AND a.vec_id = e.vec_id
         |  GROUP BY e.qid)
         |SELECT qs.qid,
         |  floor(coalesce(c, 0)::DOUBLE / 10 * 10000 + 0.5) / 10000 AS recall
         |FROM (SELECT DISTINCT qid FROM q) qs
         |LEFT JOIN hits USING (qid)""".stripMargin,

    "q69_semdedup" ->
      s"""WITH RECURSIVE aug AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 500000, embedding::DOUBLE[] FROM embeddings
         |  WHERE vec_id % 25 = 0),
         |cents AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) AS cidx, e AS c
         |  FROM (SELECT * FROM aug ORDER BY vec_id
         |        LIMIT (SELECT CAST(greatest(ceil(sqrt(count(*))),
         |               ceil(count(*) / 128.0)) AS BIGINT) FROM aug))),
         |d0 AS (
         |  SELECT a.vec_id, c.cidx, ${l2sqSql("a.e", "c.c")} AS dist
         |  FROM aug a, cents c),
         |cell AS (
         |  SELECT vec_id, cidx AS cell FROM (
         |    SELECT vec_id, cidx,
         |      row_number() OVER (PARTITION BY vec_id
         |                         ORDER BY dist, cidx) AS rn
         |    FROM d0) WHERE rn = 1),
         |nv AS (
         |  SELECT a.vec_id, cell.cell, $NormE AS v
         |  FROM aug a JOIN cell ON cell.vec_id = a.vec_id),
         |ok AS (SELECT cell FROM cell GROUP BY cell
         |       HAVING count(*) BETWEEN 2 AND ${Dedup.MaxEmbBucketForPairs}),
         |jp AS (
         |  SELECT l.vec_id AS a, r.vec_id AS b
         |  FROM nv l JOIN ok USING (cell)
         |  JOIN nv r ON l.cell = r.cell AND l.vec_id < r.vec_id
         |  WHERE floor(list_dot_product(l.v, r.v) * 10000 + 0.5) / 10000
         |        >= 0.95),
         |sym AS (SELECT a AS src, b AS dst FROM jp
         |        UNION SELECT b, a FROM jp),
         |reach AS (
         |  SELECT src, dst FROM sym
         |  UNION
         |  SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src)
         |SELECT id AS drop_id FROM (
         |  SELECT src AS id, least(src, min(dst)) AS cluster
         |  FROM reach GROUP BY src)
         |WHERE id <> cluster""".stripMargin,

    "q38_ivf_ann" -> ivfSql("16"),

    "q46_ivf_sqrt" -> ivfSql(
      "(SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) FROM embeddings)"),

    "q52_ivf_refined" -> ivfRefinedSql(1),
    "q65_ivf_refined2" -> ivfRefinedSql(2),

    "q56_decontaminate" -> {
      val gramJoin = (0 until 8).map(j => s"t[i+$j]").mkString(" || ' ' || ")
      s"""WITH d AS (SELECT doc_id, $TOK AS t FROM documents),
         |ev AS (SELECT * FROM d WHERE doc_id % 50 = 0),
         |tr AS (SELECT doc_id, t FROM d WHERE doc_id % 50 <> 0
         |       UNION ALL SELECT doc_id + 200000, t FROM ev),
         |evg AS (
         |  SELECT DISTINCT ${fnvSql("g")} AS h FROM (
         |    SELECT unnest(list_transform(range(1, len(t)-6),
         |      i -> $gramJoin)) AS g
         |    FROM ev)),
         |trg AS (
         |  SELECT doc_id, ${fnvSql("g")} AS h FROM (
         |    SELECT doc_id, unnest(list_transform(range(1, len(t)-6),
         |      i -> $gramJoin)) AS g
         |    FROM tr))
         |SELECT DISTINCT doc_id FROM trg
         |WHERE h IN (SELECT h FROM evg)""".stripMargin
    },

    "q68_fuzzy_decontam" -> {
      val ctes = jaccardCtes(hashed = true, from = "corpus",
        threshold = 0.5)
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE text IS NOT NULL AND doc_id % 50 <> 0
         |  UNION ALL
         |  SELECT doc_id + 300000,
         |    text || ' zqcontam zqcontamb zqcontamc'
         |  FROM documents WHERE text IS NOT NULL AND doc_id % 50 = 0
         |  UNION ALL
         |  SELECT doc_id, text FROM documents
         |  WHERE text IS NOT NULL AND doc_id % 50 = 0),
         |$ctes
         |SELECT DISTINCT CASE WHEN (a % 50 = 0 AND a < 300000) THEN b
         |       ELSE a END AS doc_id
         |FROM jp
         |WHERE (a % 50 = 0 AND a < 300000)
         |   <> (b % 50 = 0 AND b < 300000)""".stripMargin
    },

    "q67_dsir_weights" -> {
      val bucket = s"((${toSigned(fnvSql("f"))} % 10000) + 10000) % 10000"
      s"""WITH d AS (
         |  SELECT doc_id,
         |    CASE WHEN len(trim(text)) = 0 THEN []::VARCHAR[]
         |         ELSE $TOKL END AS t
         |  FROM documents WHERE text IS NOT NULL),
         |uni AS (SELECT doc_id, unnest(t) AS f FROM d),
         |bi AS (SELECT doc_id, unnest(list_transform(range(1, len(t)),
         |         i -> t[i] || ' ' || t[i+1])) AS f FROM d),
         |feats AS (SELECT doc_id, $bucket AS b FROM
         |  (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
         |df AS (SELECT doc_id, b, count(*) AS n FROM feats
         |       GROUP BY doc_id, b),
         |bc AS (SELECT b,
         |         sum(CASE WHEN doc_id % 50 = 0 THEN n ELSE 0 END) AS ct,
         |         sum(CASE WHEN doc_id % 50 <> 0 THEN n ELSE 0 END) AS cr
         |       FROM df GROUP BY b),
         |tot AS (SELECT sum(ct) AS tt, sum(cr) AS tr FROM bc),
         |lam AS (SELECT b,
         |  (floor((ln((ct+1)::DOUBLE / (tt+10000)::DOUBLE)
         |        - ln((cr+1)::DOUBLE / (tr+10000)::DOUBLE))
         |    * 10000 + 0.5) / 10000)::DECIMAL(18,4) AS lam
         |  FROM bc, tot)
         |SELECT doc_id, sum(n)::BIGINT AS n_feat,
         |  floor(sum(lam * n)::DOUBLE * 10000 + 0.5) / 10000 AS weight
         |FROM df JOIN lam USING (b) GROUP BY doc_id""".stripMargin
    },

    "q55_unigram_surprisal" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
         |  FROM documents WHERE len(trim(text)) > 0),
         |freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
         |tot AS (SELECT sum(cnt) AS total FROM freq),
         |surp AS (
         |  SELECT doc_id,
         |    (floor(-ln(cnt::DOUBLE / total::DOUBLE) * 10000 + 0.5) / 10000)::DECIMAL(18,4) AS s
         |  FROM toks JOIN freq USING (tok), tot)
         |SELECT doc_id,
         |  floor((sum(s)::DOUBLE / count(*)) * 10000 + 0.5) / 10000 AS surprisal
         |FROM surp GROUP BY doc_id""".stripMargin,

    "q53_hash_sample" -> {
      val bucket =
        s"((${toSigned(fnvSql("(doc_id::VARCHAR)"))} % 100) + 100) % 100"
      s"""SELECT doc_id, lang, $bucket AS bucket FROM documents
         |WHERE $bucket < (CASE WHEN lang = 'en' THEN 20 ELSE 10 END)""".stripMargin
    },

    "q54_token_packing" ->
      s"""SELECT source, doc_id,
         |  (CASE WHEN len(trim(text)) = 0 THEN 0 ELSE len($TOK) END)::BIGINT AS n_tok,
         |  CAST(floor((sum((CASE WHEN len(trim(text)) = 0 THEN 0 ELSE len($TOK) END)::BIGINT)
         |      OVER (PARTITION BY source ORDER BY doc_id
         |            ROWS UNBOUNDED PRECEDING)
         |    - (CASE WHEN len(trim(text)) = 0 THEN 0 ELSE len($TOK) END)::BIGINT) / 2000)
         |    AS INT) AS shard
         |FROM documents""".stripMargin,

    "q34_media_meta" ->
      s"""SELECT asset_id, kind, width, height, sample_rate, n_frames,
        |       payload_bytes, valid
        |FROM read_parquet('${graft.RepoRoot.fixtures}/media_meta_multi.parquet')
        |WHERE n_assets = (SELECT CASE WHEN count(*) >= 100000 THEN 2000
        |                   ELSE 500 END FROM events)""".stripMargin,

    "q35_media_features" ->
      s"""SELECT asset_id, kind, feat_norm2
        |FROM read_parquet('${graft.RepoRoot.fixtures}/media_features_multi.parquet')
        |WHERE n_assets = (SELECT CASE WHEN count(*) >= 100000 THEN 2000
        |                   ELSE 500 END FROM events)""".stripMargin,

    "q36_frame_sample" ->
      s"""SELECT asset_id, frame_idx, frame_bytes
        |FROM read_parquet('${graft.RepoRoot.fixtures}/media_frames_multi.parquet')
        |WHERE n_assets = (SELECT CASE WHEN count(*) >= 100000 THEN 2000
        |                   ELSE 500 END FROM events)""".stripMargin,

    "q40_image_resize" ->
      s"""SELECT asset_id, width, height, payload_bytes
        |FROM read_parquet('${graft.RepoRoot.fixtures}/media_resize_multi.parquet')
        |WHERE n_assets = (SELECT CASE WHEN count(*) >= 100000 THEN 2000
        |                   ELSE 500 END FROM events)""".stripMargin,

    "q41_lsh_neardups" -> lshNearDupsSql(8),

    "q48_lsh_neardups_scaled" -> lshNearDupsSql(12),

    "q32_embedding_neardups" ->
      s"""WITH n AS (SELECT vec_id, label,
         |  CASE WHEN sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) > 0
         |    THEN list_transform(embedding::DOUBLE[],
         |      x -> x / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])))
         |    ELSE embedding::DOUBLE[] END AS v FROM embeddings),
         |ok AS (SELECT label FROM embeddings GROUP BY label
         |       HAVING count(*) BETWEEN 2 AND ${Dedup.MaxEmbBucketForPairs})
         |SELECT l.vec_id AS a, r.vec_id AS b,
         |  floor(list_dot_product(l.v, r.v) * 10000 + 0.5) / 10000 AS cos
         |FROM n l JOIN ok USING (label)
         |  JOIN n r ON l.label = r.label AND l.vec_id < r.vec_id
         |WHERE floor(list_dot_product(l.v, r.v) * 10000 + 0.5) / 10000 >= 0.2""".stripMargin
  )

  /** IVF ANN oracle (q38/q46): deterministic lowest-id centroids (count
    * given as a LIMIT expression — a literal for the pinned 16, a scalar
    * subquery for ⌈√N⌉), L2 cell assignment, 4-probe exact rescan. */
  private def ivfSql(centLimit: String): String =
    s"""WITH cents AS (
       |  SELECT row_number() OVER (ORDER BY vec_id) AS cidx,
       |         embedding::DOUBLE[] AS c
       |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT $centLimit)),
       |q0 AS (SELECT embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id = 0),
       |probes AS (
       |  SELECT cidx FROM cents, q0
       |  ORDER BY ${l2sqSql("c", "e")}, cidx LIMIT 4),
       |dists AS (
       |  SELECT v.vec_id, c.cidx, ${l2sqSql("v.e", "c.c")} AS dist
       |  FROM (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings) v,
       |       cents c),
       |cells AS (
       |  SELECT vec_id, cidx AS cell FROM (
       |    SELECT vec_id, cidx,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cidx) AS rn
       |    FROM dists) WHERE rn = 1),
       |cand AS (
       |  SELECT e2.vec_id, e2.embedding::DOUBLE[] AS e
       |  FROM embeddings e2 JOIN cells ON cells.vec_id = e2.vec_id
       |  WHERE cells.cell IN (SELECT cidx FROM probes)),
       |qn AS (SELECT $NormE AS q FROM q0),
       |nn AS (SELECT vec_id, $NormE AS v FROM cand)
       |SELECT vec_id, floor(list_dot_product(v, q) * 10000 + 0.5) / 10000 AS cos
       |FROM nn, qn ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin

  /** IVF with one Lloyd refinement (q52): assign on the 16 lowest-id
    * seed centroids, recompute non-empty cells as member means — exact
    * DECIMAL(30,12) per-(cell,dim) sums, divide in DOUBLE, exactly the
    * engine's [[Ann.ivfRefine]] arithmetic — empty cells keep their
    * seed, then 4-probe exact rescan against the refined quantizer. */
  /** IVF top-k oracle with `iters` Lloyd refinement steps, each
    * reproducing the engine's bit-deterministic scheme (DECIMAL(30,12)
    * per-(cell,dim) sums, final divide in double): every step's
    * assignment → decimal-mean → coalesce-empty-cell chain feeds the
    * next, so `iters = 2` proves the determinism survives COMPOSITION
    * (step 2's cell boundaries depend on step 1's rounded centroids). */
  private def ivfRefinedSql(iters: Int): String = {
    val steps = (0 until iters).map { k =>
      s"""d$k AS (
         |  SELECT v.vec_id, c.cidx, ${l2sqSql("v.e", "c.c")} AS dist
         |  FROM v, cents$k c),
         |cell$k AS (
         |  SELECT vec_id, cidx AS cell FROM (
         |    SELECT vec_id, cidx,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cidx) AS rn
         |    FROM d$k) WHERE rn = 1),
         |sums$k AS (
         |  SELECT cell, p.pos,
         |    sum((e[p.pos+1])::DECIMAL(30,12)) AS s, count(*) AS n
         |  FROM v JOIN cell$k USING (vec_id), dims p
         |  GROUP BY cell, p.pos),
         |refined$k AS (
         |  SELECT cell AS cidx, list(s::DOUBLE / n ORDER BY pos) AS c
         |  FROM sums$k GROUP BY cell),
         |cents${k + 1} AS (
         |  SELECT c0.cidx, coalesce(r.c, c0.c) AS c
         |  FROM cents$k c0 LEFT JOIN refined$k r ON r.cidx = c0.cidx)"""
        .stripMargin
    }.mkString(",\n")
    val cents = s"cents$iters"
    s"""WITH cents0 AS (
       |  SELECT row_number() OVER (ORDER BY vec_id) AS cidx,
       |         embedding::DOUBLE[] AS c
       |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)),
       |v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |dims AS (
       |  SELECT unnest(range((SELECT len(embedding::DOUBLE[])
       |                       FROM embeddings WHERE vec_id = 0))) AS pos),
       |$steps,
       |q0 AS (SELECT embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id = 0),
       |probes AS (
       |  SELECT cidx FROM $cents, q0
       |  ORDER BY ${l2sqSql("c", "e")}, cidx LIMIT 4),
       |dfin AS (
       |  SELECT v.vec_id, c.cidx, ${l2sqSql("v.e", "c.c")} AS dist
       |  FROM v, $cents c),
       |cells AS (
       |  SELECT vec_id, cidx AS cell FROM (
       |    SELECT vec_id, cidx,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cidx) AS rn
       |    FROM dfin) WHERE rn = 1),
       |cand AS (
       |  SELECT v.vec_id, v.e
       |  FROM v JOIN cells USING (vec_id)
       |  WHERE cells.cell IN (SELECT cidx FROM probes)),
       |qn AS (SELECT $NormE AS q FROM q0),
       |nn AS (SELECT vec_id, $NormE AS v FROM cand)
       |SELECT vec_id, floor(list_dot_product(v, q) * 10000 + 0.5) / 10000 AS cos
       |FROM nn, qn ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin
  }

  /** Banded simhash near-dup oracle (q30/q47): 4×16-bit band candidate
    * buckets (occupancy-capped like the Spark side), exact Hamming
    * verification at `maxHamming`. */
  private def simhashPairsSql(from: String, maxHamming: Int): String =
    s"""${simhashCte(from)},
       |bands AS (
       |  SELECT doc_id, b, (u >> (b*16)) & 65535 AS key
       |  FROM shu, range(4) r(b)),
       |ok AS (
       |  SELECT b, key FROM bands GROUP BY b, key
       |  HAVING count(*) BETWEEN 2 AND ${Dedup.MaxBucketForPairs}),
       |p AS (
       |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
       |  FROM bands l
       |  JOIN ok USING (b, key)
       |  JOIN bands r ON l.b = r.b AND l.key = r.key
       |  WHERE l.doc_id < r.doc_id)
       |SELECT p.a, p.b, CAST(bit_count(xor(la.u, lb.u)) AS INT) AS hamming
       |FROM p JOIN shu la ON la.doc_id = p.a
       |       JOIN shu lb ON lb.doc_id = p.b
       |WHERE bit_count(xor(la.u, lb.u)) <= $maxHamming""".stripMargin

  /** LSH-candidate + exact n-gram Jaccard oracle (q31/q45). With
    * `hashed`, each 3-gram is FNV-1a-hashed to a 64-bit value (HUGEINT
    * mod 2^64 — set-isomorphic to the engine's signed longs, so
    * intersection sizes match exactly) before the set comparison. */
  private def jaccardPairsSql(hashed: Boolean): String =
    s"""WITH ${jaccardCtes(hashed)}
       |SELECT a, b, jaccard FROM jp""".stripMargin

  /** The q31/q45 pipeline as a CTE list ending in
    * `jp(a, b, jaccard)` — shared by the pair queries and the q50
    * cluster oracle (which prepends RECURSIVE and appends the
    * reachability closure). */
  private def jaccardCtes(hashed: Boolean, from: String = "documents",
      threshold: Double = 0.2): String = {
    val bands = (0 until K / R).map(b =>
      s"SELECT doc_id, $b AS band, ${bandKeyExpr(b)} AS band_key FROM sig")
      .mkString(" UNION ALL ")
    val grams =
      """list_transform(list_zip(t[1:-3], t[2:-2], t[3:-1]),
        |    x -> x[1] || ' ' || x[2] || ' ' || x[3])""".stripMargin
    val shingleExpr =
      if (hashed) s"list_distinct(list_transform($grams, g -> ${fnvSql("g")}))"
      else s"list_distinct($grams)"
    s"""sig AS (SELECT doc_id, [${sigExprs.mkString(", ")}] AS s FROM $from),
       |bk AS ($bands),
       |ok AS (
       |  SELECT band, band_key FROM bk GROUP BY band, band_key
       |  HAVING count(*) BETWEEN 2 AND ${Dedup.MaxBucketForPairs}),
       |pairs AS (
       |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
       |  FROM bk l
       |  JOIN ok USING (band, band_key)
       |  JOIN bk r ON l.band = r.band AND l.band_key = r.band_key
       |  WHERE l.doc_id < r.doc_id),
       |sh AS (SELECT doc_id, $shingleExpr AS g
       |  FROM (SELECT doc_id, $TOK AS t FROM $from) tt),
       |j AS (SELECT a, b,
       |    len(list_intersect(sa.g, sb.g))::DOUBLE AS inter,
       |    (len(sa.g) + len(sb.g) - len(list_intersect(sa.g, sb.g)))::DOUBLE AS uni
       |  FROM pairs JOIN sh sa ON sa.doc_id = a JOIN sh sb ON sb.doc_id = b),
       |jp AS (
       |  SELECT a, b, floor((CASE WHEN uni > 0 THEN inter / uni ELSE 0.0 END) * 10000 + 0.5) / 10000 AS jaccard
       |  FROM j
       |  WHERE floor((CASE WHEN uni > 0 THEN inter / uni ELSE 0.0 END) * 10000 + 0.5) / 10000 >= $threshold)""".stripMargin
  }

  /** Brute-force hashed-3-gram Jaccard over a small frozen corpus
    * (q57): ALL pairs at Jaccard ≥ threshold, no banding model — valid
    * as the oracle because the fixture's accept-reject guarantees every
    * ≥-threshold pair is an LSH candidate under the engine's fast hash
    * family (FixtureGen.neardupFastDocs). Grams are FNV-hashed with the
    * engine's exact arithmetic, so intersection sizes (and any
    * collisions) agree bit-for-bit. */
  private def bruteJaccardSql(path: String, threshold: Double): String = {
    val grams =
      """list_transform(list_zip(t[1:-3], t[2:-2], t[3:-1]),
        |    x -> x[1] || ' ' || x[2] || ' ' || x[3])""".stripMargin
    s"""WITH tt AS (SELECT doc_id, $TOK AS t FROM read_parquet('$path')),
       |sh AS (SELECT doc_id,
       |  list_distinct(list_transform($grams, g -> ${fnvSql("g")})) AS g
       |  FROM tt),
       |j AS (SELECT l.doc_id AS a, r.doc_id AS b,
       |    len(list_intersect(l.g, r.g))::DOUBLE AS inter,
       |    (len(l.g) + len(r.g) - len(list_intersect(l.g, r.g)))::DOUBLE AS uni
       |  FROM sh l JOIN sh r ON l.doc_id < r.doc_id)
       |SELECT a, b,
       |  floor((CASE WHEN uni > 0 THEN inter / uni ELSE 0.0 END) * 10000 + 0.5) / 10000 AS jaccard
       |FROM j
       |WHERE floor((CASE WHEN uni > 0 THEN inter / uni ELSE 0.0 END) * 10000 + 0.5) / 10000 >= $threshold""".stripMargin
  }

  /** Sign-LSH near-dup oracle with the occupancy cap mirrored
    * (HAVING BETWEEN 2 AND cap, as in the Spark `ok` aggregation). */
  private def lshNearDupsSql(nPlanes: Int): String =
    s"""WITH b AS (SELECT vec_id, embedding::DOUBLE[] AS e,
       |        ${lshBucketSql("embedding::DOUBLE[]", nPlanes)} AS bkt
       |      FROM embeddings),
       |ok AS (SELECT bkt FROM b GROUP BY bkt
       |       HAVING count(*) BETWEEN 2 AND ${Dedup.MaxEmbBucketForPairs}),
       |n AS (SELECT vec_id, bkt, $NormE AS v FROM b JOIN ok USING (bkt))
       |SELECT l.vec_id AS a, r.vec_id AS b,
       |  floor(list_dot_product(l.v, r.v) * 10000 + 0.5) / 10000 AS cos
       |FROM n l JOIN n r ON l.bkt = r.bkt AND l.vec_id < r.vec_id
       |WHERE floor(list_dot_product(l.v, r.v) * 10000 + 0.5) / 10000 >= 0.2""".stripMargin
}
