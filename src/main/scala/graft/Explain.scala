package graft

/** Plan-audit helper (not part of the driver contract): dump the
  * executed plan of a named query. Usage:
  *   runMain graft.Explain <query> [sfDir] [formatted]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = Sessions.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")).getOrCreate()
    Sessions.tune(spark, "ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (args.contains("formatted")) df.explain("formatted")
    else println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
