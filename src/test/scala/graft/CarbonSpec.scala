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

  test("rewrite matches copyAndRewrite case by case") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    // (input, rewrite.go expectation)
    val cases = Seq(
      "foo.bar" -> "foo.bar",                // untouched
      "..foo.bar" -> "foo.bar",              // leading dots stripped
      "foo..bar...baz" -> "foo.bar.baz",     // dot runs collapse
      "foo.bar.." -> "foo.bar",              // trailing dots stripped
      "foo@bar" -> "foo_bar",                // invalid → _
      "foo@!bar" -> "foo_bar",               // invalid RUN → one _
      "foo_@bar" -> "foo_bar",               // preceding _ absorbs
      "foo__bar" -> "foo__bar",              // literal __ survives
      "f:o-o#9_A.z" -> "f:o-o#9_A.z",        // the full valid set
      ".?a" -> "_a")                         // leading dot then invalid
    val got = cases.map(_._1).toDF("p")
      .select(Carbon.rewrite(col("p"))).collect().map(_.getString(0))
    cases.map(_._2).zip(got).foreach { case (want, g) =>
      assert(g == want, s"want $want got $g")
    }
  }

  test("rules: first match wins, continue chains, raw vs aggregated") {
    val s = spark
    import s.implicits._
    val parsed = Carbon.parse(Seq(
      "svc.error.count 5 1704067200",
      "svc.error.count 7 1704067260",
      "svc.ok.count 10 1704067200",
      "other.thing 3 1704067200").toDF("line"))
    val rules = Seq(
      Carbon.CarbonRule(contains = Some("error"),
        aggregationEnabled = false, policies = Seq((60L, 86400L)),
        continueMatching = true),
      Carbon.CarbonRule(pattern = Some("^svc\\."),
        aggregationType = "sum", policies = Seq((3600L, 86400L))),
      Carbon.CarbonRule(pattern = Some(".*"),
        aggregationType = "max", policies = Seq((3600L, 86400L))))
    val out = Carbon.route(parsed, rules, nowS = 1704067200L).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getLong(5), r.getDouble(6)))
    // error metric: raw rows from rule 0 (both datapoints, es buckets)
    // AND rule 1 (continue chained into the svc sum) — NOT rule 2
    val err = out.filter(_._1 == "svc.error.count")
    assert(err.count(_._3 == "raw") == 2)
    assert(err.filter(_._2 == 1).map(_._5).toSeq == Seq(12.0))
    assert(!err.exists(_._2 == 2))
    // svc.ok stops at rule 1; other.thing falls through to match-all
    assert(out.filter(_._1 == "svc.ok.count").map(x => (x._2, x._5))
      .toSeq == Seq((1, 10.0)))
    assert(out.filter(_._1 == "other.thing").map(x => (x._2, x._3, x._5))
      .toSeq == Seq((2, "max", 3.0)))
    // retention floor: now far in the future empties everything
    assert(Carbon.route(parsed, rules, nowS = 1804067200L).count() == 0)
    // pattern XOR contains enforced like compileRulesWithLock
    intercept[IllegalArgumentException](Carbon.route(parsed,
      Seq(Carbon.CarbonRule(pattern = Some("a"), contains = Some("b"),
        policies = Seq((60L, 60L)))), 0L))
  }
}
