package graft

/** Ad-hoc per-query timing probe: `QueryProbe <sfDir> <q1> [q2 ...]`.
  * Times each named SparkEntry query (1 warmup rep + 2 timed, min
  * reported) with a count() action — the Bench per-query shape — so a
  * fix's effect is measurable without running the whole bench.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Bench.session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      def once(): (Long, Double) = {
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        (n, (System.nanoTime() - t0) / 1e9)
      }
      once() // warmup (JIT + codegen)
      val reps = (1 to 2).map(_ => once())
      val best = reps.minBy(_._2)
      println(f"$name: ${best._2}%.3f s rows=${best._1} [${reps.map(r => f"${r._2}%.2f").mkString(",")}]")
    }
    spark.stop()
  }
}
