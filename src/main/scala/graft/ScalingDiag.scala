package graft

/** Diagnostic harness behind the round-4 resolution of the "16→32
  * degradation" (round-3 verdict, What's wrong #4). Three probes at a
  * chosen `DIAG_LEVEL`:
  *
  *  1. pure-CPU Spark job (256 fine tasks of register-only hashing) —
  *     establishes what concurrency Spark-local can actually deliver on
  *     this host (≈23 cores at local[32] under ambient load);
  *  2. the extraction job with per-stage task-time accounting — where
  *     the wall-clock goes (sum of task runtime / wall = delivered
  *     concurrency);
  *  3. a 100 ms thread/task sampler during the extraction — thread
  *     states plus `statusTracker` active-task counts over time.
  *
  * FINDING (2026-08-17): GC was NOT the cause (0.1-0.3 s of a 2.6-5 s
  * wall at 8 g; the string-allocation hypothesis is disproven), and
  * tasks were on-CPU ≈96% of their runtime (no lock/IO blocking). The
  * sampler showed active tasks PINNED at 16 on a 32-thread session:
  * the materialized input was 16 parquet files of one ~35 MB row group
  * each, so only 16 splits ever carried rows — splitting a
  * single-row-group file yields empty second halves, and executor
  * threads sat parked in ThreadPoolExecutor.getTask (58% of samples)
  * with nothing schedulable. Bench.materializeInput now writes
  * Bench.InputFiles (256) small files; local[32] went from 2.29 s
  * (slower than local[16]'s 1.87 s, round 3) to beating it — see
  * BENCH/BASELINE.md for the re-measured table.
  */
object ScalingDiag {
  def main(args: Array[String]): Unit = {
    val lvl = sys.env.getOrElse("DIAG_LEVEL", "32")
    val spark = Bench.session(lvl)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def cpuSec(): Double = osBean.getProcessCpuTime / 1e9

    // (1) pure-CPU ceiling probe
    def pureCpu(): Unit = {
      val t0 = System.nanoTime(); val c0 = cpuSec()
      spark.range(0, 256, 1, 256).map { i =>
        var h = 0xcbf29ce484222325L ^ i
        var k = 0
        while (k < 20000000) { h ^= k; h *= 0x100000001b3L; h ^= (h >>> 33); k += 1 }
        h
      }.reduce(_ ^ _)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"pureCpu: wall=$wall%.3f cpuCores=${(cpuSec() - c0) / wall}%.1f")
    }
    pureCpu(); pureCpu()

    // (2) extraction with per-stage task-time accounting
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, Int)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        stages.merge(t.stageId,
          (t.taskMetrics.executorRunTime, t.taskMetrics.executorDeserializeTime, 1),
          (a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3))
    })
    val input = Bench.materializeInput(spark, 30000, 16)
    def job(): Unit = {
      val turns = spark.read.parquet(input)
      val eligible = graft.pipeline.Selection.ingest(
        turns, graft.fixtures.TranscriptGen.WatermarkTs, spark)
      graft.pipeline.ExtractionPipeline.extractExpr(spark, eligible)
        .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)),
          org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions.octet_length(
            org.apache.spark.sql.functions.col("extracted_text")))).head()
    }
    def accounted(label: String): Unit = {
      stages.clear()
      val t0 = System.nanoTime(); val c0 = cpuSec()
      job()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"$label: wall=$wall%.3f cpuCores=${(cpuSec() - c0) / wall}%.1f")
      import scala.jdk.CollectionConverters._
      stages.asScala.toSeq.sortBy(_._1).foreach { case (sid, (run, deser, n)) =>
        println(f"  stage $sid: tasks=$n runTimeSum=${run / 1e3}%.2fs avgTask=${run / 1e3 / n}%.3fs deliveredConcurrency=${run / 1e3 / wall}%.1f")
      }
    }
    accounted("warmup1"); accounted("warmup2"); accounted("extract")

    // (3) thread/task sampler over one more run
    @volatile var done = false
    val runner = new Thread(() => { try job() finally { done = true } })
    val tracker = spark.sparkContext.statusTracker
    val timeline = scala.collection.mutable.ArrayBuffer.empty[String]
    runner.start()
    var i = 0
    while (!done) {
      Thread.sleep(100); i += 1
      import scala.jdk.CollectionConverters._
      val exec = Thread.getAllStackTraces.asScala
        .filter(_._1.getName.startsWith("Executor task launch"))
      val runnable = exec.count(_._1.getState == Thread.State.RUNNABLE)
      val parked = exec.count { case (_, st) =>
        st.exists(_.toString.contains("ThreadPoolExecutor.getTask")) }
      val active = tracker.getActiveStageIds.flatMap(id =>
        tracker.getStageInfo(id).map(s => s"s$id:${s.numActiveTasks}/${s.numTasks}"))
        .mkString(",")
      timeline += s"t$i active=[$active] runnable=$runnable waitingForTask=$parked"
    }
    runner.join()
    timeline.foreach(println)
    spark.stop()
  }
}
