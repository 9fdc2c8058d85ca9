package graft

import org.apache.spark.sql.Row
import graft.sources.Exposition

/** Prometheus text exposition-format parser semantics: label
  * escapes, optional timestamps, special float values, comment and
  * blank-line skipping, malformed counting, trailing commas, and
  * greedy label-section bracketing when a quoted value contains
  * `}`. */
class ExpositionSpec extends SparkSpec {

  private def parseAll(ls: String*): Array[Row] = {
    val s = spark
    import s.implicits._
    Exposition.parse(ls.toDF("line")).collect()
  }

  private def tags(r: Row): Map[String, String] =
    r.getSeq[Row](r.fieldIndex("tags"))
      .map(t => t.getString(0) -> t.getString(1)).toMap

  test("sample lines parse: labels, ms timestamps, optional ts") {
    val rows = parseAll(
      "http_requests_total{method=\"post\",code=\"200\"} 1027 1704067200000",
      "up 1 1704067200000",
      "no_ts_metric{a=\"b\"} 42.5")
    assert(rows.forall(!_.getAs[Boolean]("malformed")))
    assert(rows(0).getString(0) == "http_requests_total")
    assert(tags(rows(0)) == Map("method" -> "post", "code" -> "200"))
    assert(rows(0).getAs[Double]("value") == 1027.0)
    assert(rows(0).getAs[java.sql.Timestamp]("ts").toString
      == "2024-01-01 00:00:00.0")
    assert(tags(rows(1)).isEmpty)
    // missing timestamp is LEGAL (live scrape stamps it) → null ts
    assert(rows(2).isNullAt(rows(2).fieldIndex("ts")))
    assert(rows(2).getAs[Double]("value") == 42.5)
  }

  test("tab separators parse like spaces") {
    val rows = parseAll("m{a=\"1\"}\t42\t1704067200000")
    assert(rows.length == 1 && !rows(0).getAs[Boolean]("malformed"))
    assert(rows(0).getAs[Double]("value") == 42.0)
    assert(tags(rows(0)) == Map("a" -> "1"))
  }

  test("comments and blank lines are dropped before parsing") {
    val rows = parseAll(
      "# HELP up Whether the target is up.",
      "# TYPE up gauge",
      "",
      "   ",
      "up 1 1704067200000")
    assert(rows.length == 1)
    assert(rows(0).getString(0) == "up")
  }

  test("label-value escapes unescape; quoted '}' stays inside the body") {
    val rows = parseAll(
      "m{a=\"x\\\\y\",b=\"q\\\"z\",c=\"l1\\nl2\"} 1 1704067200000",
      "m{path=\"a}b\"} 2 1704067200000")
    assert(rows.forall(!_.getAs[Boolean]("malformed")))
    assert(tags(rows(0)) == Map("a" -> "x\\y", "b" -> "q\"z",
      "c" -> "l1\nl2"))
    assert(tags(rows(1)) == Map("path" -> "a}b"))
    assert(rows(1).getAs[Double]("value") == 2.0)
  }

  test("special floats and trailing commas are legal") {
    val rows = parseAll(
      "m{a=\"1\",} 3 1704067200000",  // trailing comma
      "m NaN 1704067200000",
      "m +Inf 1704067200000",
      "m -inf 1704067200000",
      "m 1.5e3 1704067200000")
    assert(rows.forall(!_.getAs[Boolean]("malformed")))
    assert(tags(rows(0)) == Map("a" -> "1"))
    assert(rows(1).getAs[Double]("value").isNaN)
    assert(rows(2).getAs[Double]("value").isPosInfinity)
    assert(rows(3).getAs[Double]("value").isNegInfinity)
    assert(rows(4).getAs[Double]("value") == 1500.0)
  }

  test("malformed lines flag and count, never silently drop") {
    val rows = parseAll(
      "bad_line{user=} oops",      // empty label value + bad number
      "1leading_digit 1 1704067200000", // bad metric name
      "m notanumber 1704067200000",     // bad value
      "ok 1 1704067200000")
    assert(rows.count(_.getAs[Boolean]("malformed")) == 3)
    assert(rows.count(!_.getAs[Boolean]("malformed")) == 1)
  }

  test("toSeriesFrame consolidates hourly and drops untimestamped rows") {
    val s = spark
    import s.implicits._
    val parsed = Exposition.parse(Seq(
      "m{user=\"1\"} 10 1704067200000",
      "m{user=\"1\"} 20 1704069000000", // same hour → avg 15
      "m{user=\"1\"} 99",               // no ts → dropped
      "m{other=\"x\"} 7 1704067200000"  // no user label → dropped
    ).toDF("line"))
    val r = Exposition.toSeriesFrame(parsed, "user").collect()
    assert(r.length == 1)
    assert(r(0).getAs[String]("user") == "1")
    assert(r(0).getAs[Double]("value") == 15.0)
    assert(r(0).getAs[Long]("bucket_s") == 1704067200L)
  }
}
