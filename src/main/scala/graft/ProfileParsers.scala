package graft

import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the line-protocol roundtrip family (not
  * part of the driver contract): times each pipeline stage of
  * ts_influx / ts_exposition / ts_prom_write / gr_carbon under the
  * noop sink so the next optimization targets the stage that actually
  * costs (guide §1.4). */
object ProfileParsers {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    Sessions.tune(spark)
    val ev = tsdb.Vectors.samples(Tables.events(spark, sfDir))
    ev.write.format("noop").mode("overwrite").save()
    def t(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      spark.sparkContext.setJobDescription(s"profile: $name")
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"PROFILE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    // ---- ts_influx ----
    val inflLines = ev.select(
      format_string("%s,user_id=%d value=%s %d",
        col("name"), col("user_id"), col("value"),
        unix_micros(col("ts")) * 1000).as("line"))
    for (pass <- 1 to 2) {
      println(s"== pass $pass")
      t("influx.render")(inflLines)
      t("influx.fan")(Tables.fan(inflLines, col("line")))
      t("influx.parse")(
        sources.InfluxLine.parse(Tables.fan(inflLines, col("line"))))
      t("influx.full")(
        sources.InfluxLine.toSampleFrame(
          sources.InfluxLine.parse(Tables.fan(inflLines, col("line"))),
          Seq("user_id")))

      // ---- ts_exposition ----
      val expoLines = ev.select(
        format_string("%s{user=\"%d\"} %s %d",
          col("name"), col("user_id"), col("value"),
          unix_millis(col("ts"))).as("line"))
        .unionAll(ev.limit(3).select(
          format_string("# HELP %s synthetic scrape", col("name")).as("line")))
        .unionAll(ev.limit(2).select(lit("bad_line{user=} oops").as("line")))
      t("expo.render")(expoLines)
      t("expo.parse")(
        sources.Exposition.parse(Tables.fan(expoLines, col("line"))))
      t("expo.full")(
        sources.Exposition.toSeriesFrame(
          sources.Exposition.parse(Tables.fan(expoLines, col("line"))), "user"))

      // ---- ts_prom_write ----
      val req = ev.select(
        array(
          struct(lit("__name__").as("name"), col("name").as("value")),
          struct(lit("user_id").as("name"),
            col("user_id").cast("string").as("value"))).as("labels"),
        col("ts"), col("value"))
      val mapped = sources.PromWrite.mapTags(req,
        Seq(sources.PromWrite.WriteTag("dc", "east")))
      t("prom.render+map")(mapped)
      t("prom.fan")(Tables.fan(mapped, struct(col("labels"), col("ts"))))
      t("prom.parse")(sources.PromWrite.parse(
        Tables.fan(mapped, struct(col("labels"), col("ts")))))
      t("prom.full")(sources.PromWrite.toSampleFrame(
        sources.PromWrite.parse(
          Tables.fan(mapped, struct(col("labels"), col("ts")))),
        Seq("user_id", "dc")))

      // ---- gr_carbon ----
      val carbLines = ev.select(
        format_string("%s %s %d",
          concat(lit("events."), col("name"), lit(".user"), col("user_id")),
          col("value"), unix_timestamp(col("ts"))).as("line"))
      t("carbon.render")(carbLines)
      t("carbon.parse")(sources.Carbon.parse(Tables.fan(carbLines, col("line"))))
      t("carbon.full")(sources.Carbon.toPathFrame(
        sources.Carbon.parse(Tables.fan(carbLines, col("line")))))
    }
    spark.stop()
  }
}
