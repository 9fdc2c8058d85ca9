package graft

import org.apache.spark.sql.functions._
import graft.sources.InfluxLine

/** Influx line-protocol parser semantics, tracking the reference
  * write handler (src/query/api/v1/handler/influxdb/write.go
  * `populateFields` + rewrite.go `promRewriter`): per-field series
  * fan-out named `measurement_field`, boolean/int/uint coercion,
  * string-field dropping, prom-charset sanitization, duplicate-tag
  * rejection, escape handling. */
class InfluxSpec extends SparkSpec {

  private def parseAll(ls: String*) = {
    val s = spark
    import s.implicits._
    InfluxLine.parse(ls.toDF("line")).collect()
      .map(r => (r.getString(0),
        Option(r.getMap[String, String](1)).map(_.toMap).getOrElse(Map.empty),
        Option(r.get(2)).map(_.toString),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        r.getBoolean(4)))
  }

  test("fields fan out to measurement_field series with tags") {
    val rows = parseAll(
      "cpu,host=a,region=west usage=1.5,idle=98i 1704067200000000000")
    assert(rows.length == 2)
    assert(rows.forall(!_._5))
    val byName = rows.map(r => r._1 -> r).toMap
    assert(byName("cpu_usage")._4.contains(1.5))
    assert(byName("cpu_idle")._4.contains(98.0)) // i suffix → float
    assert(byName("cpu_usage")._2 == Map("host" -> "a", "region" -> "west"))
    assert(byName("cpu_usage")._3.contains("2024-01-01 00:00:00.0"))
  }

  test("bool and uint coerce; string fields are dropped silently") {
    val rows = parseAll("m ok=t,bad=F,n=7u,note=\"hi there\" 1704067200000000000")
    // the string field produces NO row (reference drops it), the
    // other three parse
    assert(rows.length == 3 && rows.forall(!_._5))
    val v = rows.map(r => r._1 -> r._4.get).toMap
    assert(v == Map("m_ok" -> 1.0, "m_bad" -> 0.0, "m_n" -> 7.0))
  }

  test("prom-charset sanitization: invalid bytes become underscores") {
    val rows = parseAll("my-app,host-name=a 99th.pct=1.0 1704067200000000000")
    assert(rows.length == 1 && !rows(0)._5)
    // measurement head rule: '-' invalid → '_'; field tail rule:
    // leading digit is VALID in the tail ('.'→'_'); label rule
    // rewrites the tag NAME but not its value
    assert(rows(0)._1 == "my_app_99th_pct")
    assert(rows(0)._2 == Map("host_name" -> "a"))
  }

  test("escaped separators unescape in measurement, tags and field keys") {
    val rows = parseAll(
      """disk\ usage,mount\ point=/var/log used\ pct=12.5 1704067200000000000""")
    assert(rows.length == 1 && !rows(0)._5)
    assert(rows(0)._1 == "disk_usage_used_pct") // ' ' sanitized to _
    assert(rows(0)._2 == Map("mount_point" -> "/var/log"))
  }

  test("malformed lines survive with the flag: bad ts, dup tags, bad value") {
    val rows = parseAll(
      "m v=1.0 not-a-ts",
      "m,a=1,a=2 v=1.0 1704067200000000000", // duplicate tag name
      "m v=abc 1704067200000000000", // unrecognized field value
      "m v=1.0 1704067200000000000") // control: fine
    assert(rows.count(_._5) == 3)
    assert(rows.count(!_._5) == 1)
  }

  test("the parse transform runs unchanged under readStream") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("influx-stream").toString
    Seq("cpu,host=a usage=1.5 1704067200000000000",
      "cpu,host=b usage=2.5 1704070800000000000")
      .toDF("line").coalesce(1).write.mode("overwrite").text(dir)
    val stream = s.readStream.schema("line string").text(dir)
      .withColumnRenamed("value", "line")
    val q = InfluxLine.parse(stream, "line")
      .writeStream.format("memory").queryName("influx_mem")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = s.table("influx_mem").collect()
      assert(got.length == 2)
      assert(got.forall(_.getAs[String]("name") == "cpu_usage"))
    } finally q.stop()
  }
}
