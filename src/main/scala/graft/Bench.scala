package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query (count() action) plus
  * the extraction-throughput headline (turns/sec — the BASELINE metric).
  * Emits ONE JSON line on stdout AND writes it to BENCH/last_bench.json.
  *
  * Noise robustness: this host is shared — round 2's single-rep design
  * booked a ~4-minute external-load window onto five healthy queries
  * (the artifact claimed 166 s for a query that runs in 2.8 s). Every
  * query is therefore timed as the MIN of 2 reps after the full warmup
  * pass, with a third tie-breaker rep when the two reps disagree by
  * more than 2× (the signature of an external-load hit).
  *
  * SELF-IDENTIFYING under host load (round-4 lesson: a sustained load
  * window defeated min-of-2 + tie-breaker — the driver's artifact
  * booked 66.4 s where a clean re-run measured 29.3 s, and nothing in
  * the artifact could reveal it; adjudication took a full judge-side
  * re-run). The artifact therefore now records the EVIDENCE, not just
  * the verdict:
  *  - `reps`: every rep's wall time per query (failures as -1), so a
  *    reader can see whether the min came from agreeing reps or from
  *    one lucky rep between load spikes;
  *  - `probe_ms` / `mem_probe_ms`: fixed-work single-thread CPU
  *    (FNV-1a, register/L1) and memory-bandwidth (streamed 64 MB sum)
  *    calibration probes sampled before each query's reps — constant
  *    work whose wall time moves ONLY with external pressure, so a
  *    load window appears as a bump in the series exactly where the
  *    inflated queries sit; medians are absolute, comparable across
  *    runs (clean host: ~50 ms CPU / ~14 ms memory);
  *  - `foreign_cores`: per-rep host-CPU attribution (busy jiffies
  *    minus this JVM) — the direct co-tenant signal both probes can
  *    miss when a neighbor occupies OTHER cores;
  *  - `gc_sec_all_reps`: this JVM's collector time inside timed
  *    regions — wall inflation with flat probes, zero foreign load,
  *    and high GC is heap pressure, not the engine;
  *  - `noise`: "clean" | "suspect", computed from probe spreads,
  *    foreign-core median, and rep disagreement — a machine-readable
  *    flag that the artifact's numbers may overstate the engine's
  *    cost. Residual run-to-run variance on this virtualized host
  *    (~±15% with every internal signal flat) is host-level
  *    (sub-jiffy steal, EPT/THP effects) — min-of-reps plus these
  *    series are the honest bound on it.
  */
object Bench {

  /** Fixed-work calibration probe: 8 FNV-1a passes over a pinned,
    * deterministically-filled 4 MB buffer (~30 ms of pure register+L1
    * work on an idle core). Identical work every call — variance in
    * the returned wall-ms is external (scheduler pressure, frequency
    * throttling, a co-tenant's load), never the engine's. */
  private lazy val probeBuf: Array[Byte] = {
    val b = new Array[Byte](4 << 20)
    var x = 0x9e3779b97f4a7c15L // SplitMix64 stream, fixed seed
    var i = 0
    while (i < b.length) {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      b(i) = (z ^ (z >>> 31)).toByte
      i += 1
    }
    b
  }
  @volatile private var probeSink: Long = 0L // defeat dead-code elim

  def calibrationProbe(): Double = {
    val buf = probeBuf
    var h = 0xcbf29ce484222325L
    val t0 = System.nanoTime()
    var pass = 0
    while (pass < 8) {
      var i = 0
      while (i < buf.length) {
        h = (h ^ (buf(i) & 0xffL)) * 0x100000001b3L
        i += 1
      }
      pass += 1
    }
    probeSink = h
    (System.nanoTime() - t0) / 1e6
  }

  /** Memory-bound sibling of [[calibrationProbe]]: a sequential
    * one-load-per-cacheline sum over a 64 MB long array (far beyond
    * LLC) that the hardware prefetcher streams at memory BANDWIDTH —
    * deliberately bandwidth-bound, not latency-bound — so its wall
    * time moves with DRAM-bandwidth pressure.
    * The register/L1-bound CPU probe is BLIND to a co-tenant hammering
    * the memory bus — a window that uniformly inflated one round-5 run
    * 1.2× while the CPU probe read dead flat — so the noise verdict
    * needs both. */
  private lazy val memProbeBuf: Array[Long] = {
    val b = new Array[Long](8 << 20) // 64 MB
    var i = 0
    while (i < b.length) { b(i) = i * 0x9e3779b97f4a7c15L; i += 1 }
    b
  }

  def memCalibrationProbe(): Double = {
    val buf = memProbeBuf
    var s = 0L
    val t0 = System.nanoTime()
    var pass = 0
    while (pass < 4) {
      // one load per 64 B cacheline, sequential: the prefetcher
      // streams it at memory bandwidth — 64 MB of traffic per pass
      var i = pass
      while (i < buf.length) { s += buf(i); i += 8 }
      pass += 1
    }
    probeSink = s
    (System.nanoTime() - t0) / 1e6
  }

  def session(cpus: String): SparkSession = SparkSession.builder()
    .master(s"local[$cpus]")
    .appName("graft-bench")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // several WAVES of scan tasks per core, not one: the default
    // 128 MB/4 MB split sizing packs a bench-scale input into
    // ~defaultParallelism splits — a single task wave whose straggler
    // tail idles 15-25% of the cores (measured: delivered concurrency
    // 12.8/16 with 16 packed splits). A 100 TB table has millions of
    // row groups and gets many waves NATURALLY; these two knobs give
    // the bench the same shape. Per-query overhead at sf0.1 is nil
    // (those tables are single small files either way).
    .config("spark.sql.files.maxPartitionBytes", "8m")
    .config("spark.sql.files.openCostInBytes", "64k")
    // the generated-class cache defaults to 100 entries; 65 queries ×
    // several codegen units per plan thrash that LRU, so rep 1 of each
    // query re-runs Janino on classes the warmup already compiled
    // (measured as a systematic rep1 ≈ 1.2-1.3× rep2). The protocol
    // keeps JIT/codegen warmth as the ONLY carried state — a bigger
    // cache makes that actually true instead of eviction-dependent.
    .config("spark.sql.codegen.cache.maxEntries", "4096")
    .getOrCreate()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = session(cpus)
    spark.sparkContext.setLogLevel("WARN")

    // steady-state protocol: run EVERY query once untimed (JIT, codegen,
    // and shuffle-path warmup), then time each once — per-query numbers
    // are comparable round-over-round instead of dominated by
    // first-action JIT (round 1 booked 8.7 s of JIT to the trivial q01
    // projection)
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }

    // JIT-warm both calibration probes before their first recorded
    // samples
    calibrationProbe(); calibrationProbe(); calibrationProbe()
    memCalibrationProbe(); memCalibrationProbe()
    val probes = scala.collection.mutable.ArrayBuffer[Double]()
    val memProbes = scala.collection.mutable.ArrayBuffer[Double]()

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // a throwing query must be reported as FAILED (-1), never as its
      // time-to-fail — min-of-reps would otherwise book an exception as
      // a phantom speedup in the machine-parsed artifact
      // COLD-STATE per rep: drop the dedup single-scan caches and all
      // RDD-level checkpoint blocks before the clock starts, so every
      // timed rep pays its query's full cost — including its own cache
      // build — instead of reusing the warmup's (or rep 1's) blocks
      // and being measured under the accumulated pressure of every
      // earlier query. JIT/codegen warmth is the only state kept.
      // blocking=true: the sweep is OUTSIDE the timed region, so making
      // eviction synchronous is free — and it guarantees the blocks are
      // actually gone at t0 rather than evicting inside the clock.
      // returns (sec, foreignCores, gcSec): foreign = host busy CPU
      // not attributable to this JVM during the timed region, in
      // cores; gcSec = this JVM's collector time inside the region
      // (GC pauses serialize the job — wall inflation with flat
      // probes and zero foreign load is usually GC). Attribution is
      // BEST-EFFORT via HostProbe: a missing /proc/stat degrades it
      // to 0, never fails the rep; a FAILED rep reports NaN foreign
      // so the verdict's median sees only measured values.
      def once(): (Double, Double, Double) = {
        try {
          graft.functions.Dedup.releaseCaches()
          spark.sharedState.cacheManager.clearCache()
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
        } catch { case _: Throwable => () }
        val b0 = HostProbe.busyJiffies()
        val my0 = HostProbe.processCpuNanos()
        val g0 = HostProbe.gcMillis()
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
          catch { case _: Throwable => false }
        val wall = (System.nanoTime() - t0) / 1e9
        if (!ok) (-1.0, Double.NaN, 0.0)
        else (wall,
          HostProbe.foreignCores(b0, HostProbe.busyJiffies(),
            my0, HostProbe.processCpuNanos(), wall),
          (HostProbe.gcMillis() - g0) / 1e3)
      }
      // one sample of each probe per query, taken right before its
      // reps: the series index the load timeline onto the query
      // timeline — CPU probe for scheduler/frequency pressure, memory
      // probe for DRAM-bandwidth contention the CPU probe cannot see
      probes += calibrationProbe()
      memProbes += memCalibrationProbe()
      // min of 2 good reps; >2× disagreement OR a single transient
      // failure (external load can kill one rep of a healthy query) →
      // one tie-breaker rep, still min of successes; FAILED only when
      // no rep succeeds
      val r1 = once(); val r2 = once()
      val good0 = Seq(r1._1, r2._1).filter(_ >= 0)
      val (t, runs) =
        if (good0.isEmpty) (-1.0, Seq(r1, r2))
        else {
          val best = good0.min
          val retry = good0.size < 2 ||
            (best > 0.3 && good0.max > 2 * best)
          if (retry) {
            val t3 = once()
            (if (t3._1 >= 0) math.min(best, t3._1) else best,
              Seq(r1, r2, t3))
          } else (best, Seq(r1, r2))
        }
      (name, t, runs.map(_._1), runs.map(_._2), runs.map(_._3))
    }
    probes += calibrationProbe()
    memProbes += memCalibrationProbe()
    val failed = results.collect { case (n, t, _, _, _) if t < 0 => n }

    // headline: extraction throughput over EXACTLY the scaling
    // harness's input shape (30k conversations, paraScale 16 → ~30 KB
    // payloads, 212k turns at sf0.1 — the same materialized parquet,
    // so BENCH_rN.turns_per_sec and BENCH/BASELINE.md's same-level row
    // are the same experiment); scaled down for smaller sf dirs. One
    // warmup pass so the number reflects steady state, not
    // first-action JIT.
    val nConvs =
      if (TrainingQueries.sfBaseName(sfDir).contains("0.001")) 50
      else if (TrainingQueries.sfBaseName(sfDir).contains("0.01")) 500
      else 30000
    // the queries leave persisted dedup relations AND the cluster
    // queries' result-backing localCheckpoint blocks in the block
    // manager (the latter are RDD-level — cacheManager can't see
    // them); drop both so the headline measures extraction, not
    // extraction-under-cache-pressure (measured: 2.0 s → 5.7 s with
    // the leftover blocks pinned)
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    timeExtract(spark, math.max(nConvs / 4, 50))
    probes += calibrationProbe()
    memProbes += memCalibrationProbe()
    val r1 = timeExtract(spark, nConvs)
    val r2 = timeExtract(spark, nConvs)
    probes += calibrationProbe()
    memProbes += memCalibrationProbe()
    val (turns, extractSec) = if (r1._2 <= r2._2) r1 else r2
    val turnsPerSec = if (extractSec > 0) turns / extractSec else 0.0

    // noise verdict: both probes are fixed work, so spread beyond
    // thermal jitter (clean runs on this box hold max/min under ~1.5)
    // means an external-load window overlapped the run — the CPU probe
    // catches scheduler/frequency pressure, the memory probe catches
    // DRAM-bandwidth contention (which inflated one round-5 run a
    // uniform 1.2× while the CPU probe read dead flat); widespread >2×
    // rep disagreement on non-trivial queries is the same signature
    // seen from inside the engine. Any one alone flags the artifact.
    // robust spread (p90/p10, not max/min — one GC-overlapped sample
    // out of 70 must not flag a clean run) plus ABSOLUTE medians: a
    // contention window spanning the entire run produces no within-run
    // spread at all, but its elevated median is visible against the
    // committed clean-host reference (~48 ms CPU / ~14 ms memory on
    // this box, BENCH/BASELINE.md)
    def pct(xs: Seq[Double], p: Double): Double = {
      val s = xs.sorted
      s(math.min(s.size - 1, math.max(0, (p * (s.size - 1)).round.toInt)))
    }
    def spread(xs: Seq[Double]): Double =
      if (xs.nonEmpty && pct(xs, 0.1) > 0) pct(xs, 0.9) / pct(xs, 0.1)
      else 1.0
    val probeSpread = spread(probes.toSeq)
    val memProbeSpread = spread(memProbes.toSeq)
    val probeMed = if (probes.nonEmpty) pct(probes.toSeq, 0.5) else 0.0
    val memProbeMed =
      if (memProbes.nonEmpty) pct(memProbes.toSeq, 0.5) else 0.0
    val noisyQueries = results.count { case (_, t, reps, _, _) =>
      val good = reps.filter(_ >= 0)
      t > 0.3 && good.size >= 2 && good.max > 2 * good.min
    }
    // direct co-tenant attribution: median foreign cores across every
    // rep — the one signal that catches a neighbor occupying OTHER
    // cores for the whole run (both probes read flat through exactly
    // that window; a 32-thread job still loses the occupied capacity)
    val allForeign = results.flatMap { case (_, t, _, fc, _) =>
      if (t >= 0) fc.filterNot(_.isNaN) else Nil }
    val gcTotal = results.flatMap { case (_, t, _, _, gcs) =>
      if (t >= 0) gcs else Nil }.sum
    val foreignMed =
      if (allForeign.nonEmpty) pct(allForeign, 0.5) else 0.0
    val extractNoisy = extractSec > 0.3 &&
      math.max(r1._2, r2._2) > 2 * math.min(r1._2, r2._2)
    // ABSOLUTE-median gates against the committed clean-host reference
    // (~48 ms CPU / ~14 ms memory, BENCH/BASELINE.md): a contention
    // window spanning the WHOLE run produces flat spreads — the
    // round-5 failure mode where a 1.44× elevated (but flat) memory
    // probe coincided with 4× slower DRAM-bound extraction and the
    // spread-only verdict still said clean. Spread catches windows
    // SHORTER than the run; the absolute median catches windows
    // LONGER than it.
    val cpuMedElevated = probeMed > 60.0 // 48 ms × 1.25
    val memMedElevated = memProbeMed > 18.0 // 14 ms × ~1.3
    val noise =
      if (probeSpread > 1.35 || memProbeSpread > 1.5 ||
        foreignMed > 2.0 || cpuMedElevated || memMedElevated ||
        noisyQueries + (if (extractNoisy) 1 else 0) >= 5)
        "suspect"
      else "clean"

    val qs = results.map { case (k, v, _, _, _) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val repsJson = results.map { case (k, _, reps, _, _) =>
      "\"" + k + "\":" + reps.map(r => f"$r%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val foreignJson = results.map { case (k, _, _, fc, _) =>
      "\"" + k + "\":" + fc.map(r =>
        if (r.isNaN) "-1" else f"$r%.1f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val probesJson = probes.map(p => f"$p%.1f").mkString("[", ",", "]")
    val memProbesJson =
      memProbes.map(p => f"$p%.1f").mkString("[", ",", "]")
    val extractRepsJson =
      Seq(r1._2, r2._2).map(r => f"$r%.3f").mkString("[", ",", "]")
    val failedList = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum + extractSec
    // environment stamp: a 24g+ heap pushes G1 into a pathological
    // regime for this allocation profile (measured 49.4 s vs 31.9 s on
    // identical work, correctly flagged suspect by the probe) — the
    // artifact records the heap so that failure mode is diagnosable
    // from the JSON alone
    // round, don't floor: maxMemory() sits slightly under -Xmx (a
    // reserved survivor region), and a 24g heap stamped as 23 would
    // dodge the very threshold this field exists to flag
    val heapGb = (Runtime.getRuntime.maxMemory() + (1L << 29)) / (1L << 30)
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failedList,"sf":"$sfDir","extract_turns":$turns%.0f,"extract_sec":$extractSec%.3f,"turns_per_sec":$turnsPerSec%.1f,"reps":$repsJson,"extract_reps":$extractRepsJson,"probe_ms":$probesJson,"mem_probe_ms":$memProbesJson,"probe_spread":$probeSpread%.2f,"mem_probe_spread":$memProbeSpread%.2f,"probe_med_ms":$probeMed%.1f,"mem_probe_med_ms":$memProbeMed%.1f,"foreign_cores":$foreignJson,"foreign_cores_med":$foreignMed%.1f,"gc_sec_all_reps":$gcTotal%.1f,"noise":"$noise","heap_gb":$heapGb,"cpus":"$cpus","timing":"min_of_2_cold_state_reps_after_warmup_materialized_input"}"""
    println(json)
    // machine-readable copy: sbt's logger prefixes stdout lines, so the
    // driver's parser also gets a clean file to read. Repo-absolute (the
    // FixtureGen convention) — a cwd-relative path leaves a stale
    // artifact whenever the bench runs from outside the repo root.
    try {
      val dir = java.nio.file.Paths.get(RepoRoot.dir, "BENCH")
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.write(dir.resolve("last_bench.json"),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[graft] bench artifact write failed " +
          s"(stdout JSON above is authoritative): ${e.getMessage}")
    }
    spark.stop()
  }

  /** Materialize the `nConvs`-conversation transcript input to parquet
    * ONCE per (nConvs, paraScale) and reuse it across reps and JVMs —
    * the input side of every extraction measurement, so payload
    * GENERATION cost never leaks into an extraction number. (Rounds
    * 1-3 each measured a different thing here; see the protocol note
    * in BENCH/BASELINE.md.) */
  /** File-count granularity of the materialized input. The round-3
    * "16→32 degradation" was an INPUT artifact, not an engine one: the
    * input was 16 parquet files of one ~35 MB row group each, so at
    * most 16 scan tasks ever carried rows (splitting a single-row-group
    * file yields empty second halves) and local[32] could never beat
    * local[16] — thread sampling showed exactly 16 active tasks at any
    * level. 256 files ≈ 2 MB each give every local[N] level 8+ waves of
    * real tasks, the shape a 100 TB table has naturally (millions of
    * row groups). */
  val InputFiles = 256

  def materializeInput(spark: SparkSession, nConvs: Int,
      paraScale: Int = 1): String = {
    import graft.fixtures.TranscriptGen
    val input = s"/tmp/graft_bench_input_g${TranscriptGen.GeneratorVersion}" +
      s"_${nConvs}_p${paraScale}_f$InputFiles"
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(input, "_SUCCESS"))) {
      TranscriptGen.dataset(spark,
          TranscriptGen.GenConfig(nConvs = nConvs, paraScale = paraScale))
        .toDF().repartition(InputFiles)
        .write.mode("overwrite").parquet(input)
    }
    input
  }

  /** Time the ingest pipeline — parquet scan → selection → salted
    * repartition → mapPartitions extraction — over a MATERIALIZED
    * input; returns (rows, sec). The timed region starts after the
    * input exists on disk, so this measures extraction throughput (the
    * BASELINE metric), directly comparable to ScalingBench's levels. */
  def timeExtract(spark: SparkSession, nConvs: Int,
      paraScale: Int = 16): (Double, Double) = {
    import graft.fixtures.TranscriptGen
    val turns = spark.read.parquet(materializeInput(spark, nConvs, paraScale))
    val eligible = graft.pipeline.Selection
      .ingest(turns, TranscriptGen.WatermarkTs, spark)
    val t0 = System.nanoTime()
    // aggregate over extracted_text so Catalyst cannot prune the
    // extraction away (a bare count() would measure a scan-only plan);
    // octet_length is O(1) per row — length()'s O(n) char count was
    // ~17% of the measured work, a forcing-function artifact
    val r = graft.pipeline.ExtractionPipeline.extractExpr(spark, eligible)
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)),
        org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions.octet_length(
          org.apache.spark.sql.functions.col("extracted_text")))).head()
    val n = r.getLong(0)
    ((n.toDouble), (System.nanoTime() - t0) / 1e9)
  }
}
