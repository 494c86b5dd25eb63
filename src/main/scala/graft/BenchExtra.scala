package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerStageSubmitted, SparkListenerTaskEnd}

/** Round-6 optimization probe (guide §1: measure first — separate main,
  * Bench.scala is frozen): per-query COLD-STATE timing with a stage
  * breakdown. For each named SparkEntry query it mirrors Bench's rep
  * protocol exactly — drop the dedup caches, the SQL cache, and every
  * persisted RDD before the clock starts; count() as the action — then
  * prints the slowest stages of the best rep (wall ms from submission
  * to completion, summed task time, task count, shuffle bytes), so the
  * expensive stage of an expensive query is identifiable without the
  * (disabled) UI.
  *
  * Usage: runMain graft.BenchExtra <sfDir> <query name or prefix>...
  */
object BenchExtra {

  private final class StageRec(
      var name: String = "",
      var submitted: Long = 0L,
      var completed: Long = 0L,
      var taskMs: Long = 0L,
      var gcMs: Long = 0L,
      var tasks: Int = 0,
      var shufReadB: Long = 0L,
      var shufWriteB: Long = 0L,
      var inputB: Long = 0L)

  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val prefixes = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Bench.session(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    val stages = new java.util.concurrent.ConcurrentHashMap[Int, StageRec]()
    @volatile var recording = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        if (recording) {
          val r = stages.computeIfAbsent(e.stageInfo.stageId, _ => new StageRec)
          // the RDD scope chain identifies the operator (callsite name is
          // always the same lambda); keep the distinct scope names in order
          r.name = e.stageInfo.rddInfos.map(_.name).distinct.mkString(">")
          r.submitted = System.currentTimeMillis()
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        if (recording) {
          val r = stages.get(e.stageInfo.stageId)
          if (r != null) r.completed = System.currentTimeMillis()
        }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (recording) {
          val r = stages.get(e.stageId)
          if (r != null && e.taskMetrics != null) {
            r.synchronized {
              r.tasks += 1
              r.taskMs += e.taskMetrics.executorRunTime
              r.gcMs += e.taskMetrics.jvmGCTime
              r.shufReadB += e.taskMetrics.shuffleReadMetrics.totalBytesRead
              r.shufWriteB += e.taskMetrics.shuffleWriteMetrics.bytesWritten
              r.inputB += e.taskMetrics.inputMetrics.bytesRead
            }
          }
        }
    })

    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => prefixes.exists(n.startsWith))
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      def sweep(): Unit = {
        try {
          graft.functions.Dedup.releaseCaches()
          spark.sharedState.cacheManager.clearCache()
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
        } catch { case _: Throwable => () }
      }
      def once(record: Boolean): Double = {
        sweep()
        if (record) { stages.clear(); recording = true }
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        if (record) recording = false
        wall
      }
      once(record = false) // warmup: JIT + codegen
      val r1 = once(record = false)
      val r2 = once(record = true) // stage table comes from the last rep
      println(f"\n== $name: min ${math.min(r1, r2)}%.3f s  reps=[$r1%.3f, $r2%.3f]")
      import scala.jdk.CollectionConverters._
      val recs = stages.values.asScala.toSeq
        .filter(_.completed > 0)
        .sortBy(r => -(r.completed - r.submitted))
      val totalWall = recs.map(r => r.completed - r.submitted).sum
      println(f"   stages=${recs.size} stage-wall-sum=${totalWall}ms (overlap possible)")
      recs.take(12).foreach { r =>
        println(f"   ${r.completed - r.submitted}%6dms wall | task ${r.taskMs}%6dms gc ${r.gcMs}%4dms | ${r.tasks}%3d tasks | in ${r.inputB / 1024}%6dK sr ${r.shufReadB / 1024}%6dK sw ${r.shufWriteB / 1024}%6dK | ${r.name.take(90)}")
      }
    }
    spark.stop()
  }
}
