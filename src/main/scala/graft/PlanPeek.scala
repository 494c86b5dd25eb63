package graft
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = Bench.session("8")
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"===== $name =====")
      println(df.queryExecution.executedPlan.toString.linesIterator.take(60).mkString("\n"))
    }
    spark.stop()
  }
}
