package graft

import org.apache.spark.sql.functions._

/** Ad-hoc store-read profiler (not part of the driver contract). */
object StoreProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1x")
    val spark = Sessions.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    Sessions.tune(spark)
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    t("store build (warmup)")(
      SparkEntry.queries("store_rollup")(spark, dir).queryExecution.analyzed)
    val tbl = "graft_store_" + java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
    val rd = graft.sources.SeriesStore.read(spark, tbl).drop("dt")
    t("read.count")(rd.count())
    t("read.count again")(rd.count())
    val ru = graft.tsdb.Downsample.rollup(rd, "hour")
    t("rollup no sort")(ru.write.format("noop").mode("overwrite").save())
    t("rollup no sort again")(ru.write.format("noop").mode("overwrite").save())
    t("rollup + orderBy")(ru.orderBy("name", "user_id", "bucket_s")
      .write.format("noop").mode("overwrite").save())
    println("files: " + rd.inputFiles.length)
    spark.stop()
  }
}
