package graft

/** Sampling profile of the extraction hot path: run the extraction at
  * local[1] and histogram executor stack frames (graft + hot JDK
  * frames) at 10 ms resolution. Scratch diagnostic. */
object HotProfile {
  def main(args: Array[String]): Unit = {
    val spark = Bench.session("1")
    spark.sparkContext.setLogLevel("ERROR")
    val input = Bench.materializeInput(spark, 4000, 16)
    def job(): Unit = {
      val turns = spark.read.parquet(input)
      val eligible = graft.pipeline.Selection.ingest(
        turns, graft.fixtures.TranscriptGen.WatermarkTs, spark)
      graft.pipeline.ExtractionPipeline.extractExpr(spark, eligible)
        .agg(org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions.octet_length(
          org.apache.spark.sql.functions.col("extracted_text")))).head()
    }
    job(); job() // warmup
    @volatile var done = false
    val t = new Thread(() => { try job() finally { done = true } })
    val hist = new java.util.HashMap[String, Int]()
    t.start()
    while (!done) {
      Thread.sleep(10)
      import scala.jdk.CollectionConverters._
      Thread.getAllStackTraces.asScala
        .filter(_._1.getName.startsWith("Executor task launch"))
        .foreach { case (_, st) =>
          // topmost graft frame, else topmost frame
          val frame = st.find(f => f.getClassName.startsWith("graft"))
            .orElse(st.headOption)
          frame.foreach { f =>
            hist.merge(s"${f.getClassName}.${f.getMethodName}", 1, _ + _)
          }
        }
    }
    t.join()
    import scala.jdk.CollectionConverters._
    val total = hist.values.asScala.sum.max(1)
    hist.asScala.toSeq.sortBy(-_._2).take(25).foreach { case (k, n) =>
      println(f"${n * 100.0 / total}%5.1f%% $k")
    }
    spark.stop()
  }
}
