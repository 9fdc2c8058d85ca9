package graft

import org.apache.spark.sql.functions._
import graft.sources.JsonWrite

/** JSON write-request parser semantics, tracking the reference
  * handler (src/query/api/v1/handler/json/write.go +
  * src/query/util/timing.go): float-epoch and RFC3339 timestamps,
  * ms rounding, and the validator's nonzero rules (empty tags,
  * missing timestamp, zero value). */
class JsonWriteSpec extends SparkSpec {

  private def parseAll(ls: String*) = {
    val s = spark
    import s.implicits._
    JsonWrite.parse(ls.toDF("line")).collect()
      .map(r => (
        Option(r.getMap[String, String](0)).map(_.toMap).getOrElse(Map.empty),
        Option(r.get(1)).map(_.toString),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        r.getBoolean(3)))
  }

  test("float epoch seconds round to millisecond precision") {
    val rows = parseAll(
      """{"tags":{"__name__":"m"},"timestamp":"1704067200.1239","value":2.5}""")
    assert(rows.length == 1 && !rows(0)._4)
    // .1239 rounds to .124 (timing.go rounds the fraction at 1e-3)
    assert(rows(0)._2.contains("2024-01-01 00:00:00.124"))
    assert(rows(0)._3.contains(2.5))
  }

  test("RFC3339 timestamps parse; tags stay verbatim") {
    val rows = parseAll(
      """{"tags":{"__name__":"m","host-x":"a b"},"timestamp":"2024-01-01T10:30:00.5Z","value":1.0}""")
    assert(rows.length == 1 && !rows(0)._4)
    assert(rows(0)._2.contains("2024-01-01 10:30:00.5"))
    // NO charset rewriting in the json handler (unlike influx)
    assert(rows(0)._1 == Map("__name__" -> "m", "host-x" -> "a b"))
  }

  test("validator rules: zero value, empty tags, bad timestamp flag malformed") {
    val rows = parseAll(
      """{"tags":{"__name__":"m"},"timestamp":"1704067200","value":0.0}""",
      """{"tags":{},"timestamp":"1704067200","value":1.0}""",
      """{"tags":{"__name__":"m"},"timestamp":"not-a-time","value":1.0}""",
      """not json at all""",
      """{"tags":{"__name__":"m"},"timestamp":"1704067200","value":1.0}""")
    assert(rows.count(_._4) == 4)
    assert(rows.count(!_._4) == 1)
  }

  test("the parse transform runs unchanged under readStream") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("jsonw-stream").toString
    Seq("""{"tags":{"__name__":"m","user_id":"1"},"timestamp":"1704067200","value":3.5}""")
      .toDF("line").coalesce(1).write.mode("overwrite").text(dir)
    val stream = s.readStream.schema("line string").text(dir)
      .withColumnRenamed("value", "line")
    val q = JsonWrite.parse(stream, "line")
      .writeStream.format("memory").queryName("jsonw_mem")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = s.table("jsonw_mem").collect()
      assert(got.length == 1)
      assert(got(0).getAs[Double]("value") == 3.5)
    } finally q.stop()
  }
}
