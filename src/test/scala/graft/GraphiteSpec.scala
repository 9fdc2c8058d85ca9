package graft

import org.apache.spark.sql.functions._
import graft.graphite.Graphite

class GraphiteSpec extends SparkSpec {

  private def frame = {
    val s = spark
    import s.implicits._
    Seq(
      ("events.a.user1", 0L, 10.0), ("events.a.user1", 3600L, 15.0),
      ("events.a.user1", 7200L, 12.0),
      ("events.b.user2", 0L, 100.0), ("events.b.user2", 3600L, 50.0))
      .toDF("path", "bucket_s", "value")
  }

  test("derivative and nonNegativeDerivative handle resets") {
    val d = Graphite.derivative(frame).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> Option(r.get(2))).toMap
    assert(d(("events.a.user1", 3600L)).contains(5.0))
    assert(d(("events.b.user2", 3600L)).contains(-50.0))
    val nn = Graphite.nonNegativeDerivative(frame).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> Option(r.get(2))).toMap
    assert(nn(("events.b.user2", 3600L)).isEmpty, "reset must yield null")
  }

  test("aliasByNode keeps the requested path segments") {
    val a = Graphite.aliasByNode(frame, 1, 2).select("path").distinct()
      .collect().map(_.getString(0)).toSet
    assert(a == Set("a.user1", "b.user2"))
  }

  test("integral is a per-series running sum") {
    val i = Graphite.integral(frame).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(i(("events.a.user1", 7200L)) == 37.0)
  }

  test("integralByInterval resets at interval boundaries") {
    // 2h intervals: buckets 0,3600 share one interval; 7200 starts anew
    val i = Graphite.integralByInterval(frame, 7200L).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(i(("events.a.user1", 3600L)) == 25.0)
    assert(i(("events.a.user1", 7200L)) == 12.0)
  }

  test("target parser builds the expected expression tree") {
    import graft.graphite.GraphiteParser._
    assert(parse("""summarize(exclude(events.*.user*, "user7$"), "1d", "sum")""") ==
      Call("summarize", Seq(
        T(Call("exclude", Seq(T(Path("events.*.user*")), S("user7$")))),
        S("1d"), S("sum"))))
    assert(parse("movingAverage(a.b, 3)") ==
      Call("movingAverage", Seq(T(Path("a.b")), N(3.0))))
    intercept[ParseException](parse("summarize(a.b"))
    intercept[ParseException](parse("notAFunction(a.b)") match {
      case c: Call => eval(c, frame); c
    })
  }

  test("path globs match whole segments only") {
    val r = graft.graphite.GraphiteParser.eval(
      graft.graphite.GraphiteParser.parse("events.a.*"), frame)
    assert(r.select("path").distinct().collect().map(_.getString(0)).toSet ==
      Set("events.a.user1"))
  }

  test("alias, transformNull and sortByName via the parser") {
    import graft.graphite.GraphiteParser
    val d = GraphiteParser.eval(
      GraphiteParser.parse("""alias(transformNull(derivative(events.a.user1), 0), "d")"""),
      frame).collect()
    assert(d.forall(_.getString(0) == "d"))
    assert(d.map(r => r.getLong(1) -> r.getDouble(2)).toMap ==
      Map(0L -> 0.0, 3600L -> 5.0, 7200L -> -3.0))
    val sn = GraphiteParser.eval(
      GraphiteParser.parse("sortByName(events.*.*)"), frame)
      .select("path", "sort_rank").distinct().collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(sn == Map("events.a.user1" -> 1, "events.b.user2" -> 2))
  }

  test("pointwise and filter builtins behave per graphite semantics") {
    import graft.graphite.GraphiteParser.{eval, parse}
    // removeAboveValue nulls out, keepLastValue forward-fills
    val filled = eval(parse(
      "keepLastValue(removeAboveValue(events.a.user1, 14))"), frame)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(filled == Map(0L -> 10.0, 3600L -> 10.0, 7200L -> 12.0))
    // movingMax over last 2 points
    val mm = eval(parse("movingMax(events.a.user1, 2)"), frame)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(mm == Map(0L -> 10.0, 3600L -> 15.0, 7200L -> 15.0))
    // currentAbove keeps series by their last value
    val ca = eval(parse("currentAbove(events.*.*, 20)"), frame)
      .select("path").distinct().collect().map(_.getString(0)).toSet
    assert(ca == Set("events.b.user2"))
    // offsetToZero shifts by per-series min
    val oz = eval(parse("offsetToZero(events.b.user2)"), frame)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(oz == Map(0L -> 50.0, 3600L -> 0.0))
    // countSeries counts per instant
    val cs = eval(parse("countSeries(events.*.*)"), frame)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(cs == Map(0L -> 2.0, 3600L -> 2.0, 7200L -> 1.0))
  }

  test("highestMax keeps exactly the top-n series") {
    val top = Graphite.highestMax(frame, 1).select("path").distinct()
      .collect().map(_.getString(0)).toSet
    assert(top == Set("events.b.user2"))
  }
}
