package graft

import org.apache.spark.sql.functions._
import graft.sources.Carbon

/** Carbon plaintext-protocol parser semantics, tracking the
  * reference parser's cases (src/metrics/carbon/parser.go +
  * parser_test.go): field separation by space runs, nan values,
  * malformed counting, short-line skipping. */
class CarbonSpec extends SparkSpec {

  private def parseAll(ls: String*) = {
    val s = spark
    import s.implicits._
    Carbon.parse(ls.toDF("line")).collect()
      .map(r => (r.getString(0), Option(r.get(1)).map(_.toString),
        Option(r.get(2)).map(_.asInstanceOf[Double]), r.getBoolean(3)))
  }

  test("well-formed lines parse; space runs tolerated") {
    val rows = parseAll(
      "foo.bar 123.5 1704067200",
      "foo.baz   42   1704067260") // runs of spaces between fields
    assert(rows.forall(!_._4))
    assert(rows(0)._1 == "foo.bar" && rows(0)._3.contains(123.5))
    assert(rows(0)._2.contains("2024-01-01 00:00:00.0"))
    assert(rows(1)._3.contains(42.0))
  }

  test("nan values parse to NaN, not malformed") {
    val rows = parseAll("a.b nan 1704067200", "a.c -NaN 1704067200")
    assert(rows.forall(!_._4))
    assert(rows.forall(_._3.exists(_.isNaN)))
  }

  test("malformed lines are flagged, short lines skipped") {
    val rows = parseAll(
      "only.name.no.value",        // no separators
      "a.b notanumber 1704067200", // bad value
      "a.b 1.5 not_a_ts",          // bad timestamp
      "a.b 1.5 1704067200 extra",  // trailing garbage
      "x",                         // length ≤ 1: skipped entirely
      "a.ok 1.5 1704067200")
    assert(rows.length == 5, "1-char line must be dropped pre-parse")
    assert(rows.count(_._4) == 4)
    assert(rows.filter(!_._4).map(_._1).toSeq == Seq("a.ok"))
  }

  test("toPathFrame consolidates well-formed rows only") {
    val s = spark
    import s.implicits._
    val parsed = Carbon.parse(Seq(
      "m.a 10 1704067200",
      "m.a 20 1704067800",  // same hour
      "m.a garbage 1704067800",
      "m.a 99 1704070800"   // next hour
    ).toDF("line"))
    val pf = Carbon.toPathFrame(parsed).collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(pf == Map(1704067200L -> 15.0, 1704070800L -> 99.0))
  }
}
