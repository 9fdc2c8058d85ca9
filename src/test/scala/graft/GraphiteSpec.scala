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

  test("variant builtins: combiners, filters, selectors, moving forms") {
    import graft.graphite.GraphiteParser._
    // bucket → value, path-agnostic (combined-series naming varies)
    def byBucket(q: String): Map[Long, Double] = eval(parse(q), frame)
      .select("bucket_s", "value")
      .collect().flatMap(r => Option(r.get(1))
        .map(v => r.getLong(0) -> v.asInstanceOf[Double])).toMap
    def series(q: String): Set[String] = eval(parse(q), frame)
      .select("path").distinct().collect().map(_.getString(0)).toSet

    // combiners (a: 10,15,12 / b: 100,50)
    assert(byBucket("averageSeries(events.*.*)") ==
      Map(0L -> 55.0, 3600L -> 32.5, 7200L -> 12.0))
    assert(byBucket("minSeries(events.*.*)") ==
      Map(0L -> 10.0, 3600L -> 15.0, 7200L -> 12.0))
    assert(byBucket("maxSeries(events.*.*)") ==
      Map(0L -> 100.0, 3600L -> 50.0, 7200L -> 12.0))
    // binary series math: joins on shared buckets, null-safe divisor
    assert(byBucket("divideSeries(events.a.user1, events.b.user2)") ==
      Map(0L -> 0.1, 3600L -> 0.3))
    // pointwise transforms
    assert(byBucket("pow(events.b.user2, 2)") ==
      Map(0L -> 10000.0, 3600L -> 2500.0))
    assert(byBucket("squareRoot(pow(events.b.user2, 2))") ==
      Map(0L -> 100.0, 3600L -> 50.0))
    assert(byBucket("invert(events.b.user2)") ==
      Map(0L -> 0.01, 3600L -> 0.02))
    assert(byBucket("logarithm(events.b.user2, 10)") ==
      Map(0L -> 2.0, 3600L -> math.log(50.0) / math.log(10.0)))
    // per-series threshold selectors
    assert(series("averageBelow(events.*.*, 20)") == Set("events.a.user1"))
    assert(series("currentBelow(events.*.*, 20)") == Set("events.a.user1"))
    assert(series("minimumAbove(events.*.*, 20)") == Set("events.b.user2"))
    assert(series("highestCurrent(events.*.*, 1)") == Set("events.b.user2"))
    assert(series("lowestCurrent(events.*.*, 1)") == Set("events.a.user1"))
    assert(series("highestAverage(events.*.*, 1)") == Set("events.b.user2"))
    assert(series("""grep(events.*.*, "user1")""") == Set("events.a.user1"))
    assert(series("limit(events.*.*, 1)").size == 1)
    assert(series("group(events.a.user1, events.b.user2)") ==
      Set("events.a.user1", "events.b.user2"))
    // value filters null out, never drop rows
    val rb = eval(parse("removeBelowValue(events.a.user1, 13)"), frame).collect()
    assert(rb.length == 3 && rb.count(_.get(2) == null) == 2)
    // moving windows over the last k points
    assert(byBucket("movingMin(events.a.user1, 2)") ==
      Map(0L -> 10.0, 3600L -> 10.0, 7200L -> 12.0))
    assert(byBucket("""movingWindow(events.a.user1, 2, "max")""") ==
      Map(0L -> 10.0, 3600L -> 15.0, 7200L -> 15.0))
  }

  test("variant builtins: wildcards aggregation, pow fold, percentile and sustained filters, ranks, render names") {
    import graft.graphite.GraphiteParser._
    def byBucket(q: String): Map[Long, Double] = eval(parse(q), frame)
      .select("bucket_s", "value")
      .collect().flatMap(r => Option(r.get(1))
        .map(v => r.getLong(0) -> v.asInstanceOf[Double])).toMap
    def series(q: String): Set[String] = eval(parse(q), frame)
      .select("path").distinct().collect().map(_.getString(0)).toSet

    // wildcards aggregation drops the given path segments, groups the rest
    assert(series("sumSeriesWithWildcards(events.*.*, 2)") ==
      Set("events.a", "events.b"))
    assert(byBucket("averageSeriesWithWildcards(events.*.*, 1, 2)") ==
      Map(0L -> 55.0, 3600L -> 32.5, 7200L -> 12.0))
    assert(byBucket("multiplySeriesWithWildcards(events.*.*, 1, 2)") ==
      Map(0L -> 1000.0, 3600L -> 750.0, 7200L -> 12.0))
    // powSeries folds v1^v2 across series in path order at each instant
    assert(byBucket("powSeries(events.*.*)") ==
      Map(0L -> math.pow(10.0, 100.0), 3600L -> math.pow(15.0, 50.0),
        7200L -> 12.0))
    // percentile(0.5) of (10,15,12) interpolates to 12; below nulls out
    val rb = eval(parse("removeBelowPercentile(events.a.user1, 50)"), frame)
      .collect()
    assert(rb.length == 3 && rb.count(_.get(2) == null) == 1)
    // 2h sustain at step 1h = 2 consecutive points <= n required
    assert(byBucket("""sustainedBelow(events.a.user1, 10, "1h")""") ==
      Map(0L -> 10.0, 3600L -> 20.0, 7200L -> 20.0))
    // rank-by-min attaches sort_rank: a(min 10) before b(min 50)
    val ranks = eval(parse("sortByMinima(events.*.*)"), frame)
      .select("path", "sort_rank").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ranks == Map("events.a.user1" -> 1L, "events.b.user2" -> 2L))
    // dashed is a render hint: the data-layer effect is the rename
    assert(series("dashed(events.a.user1)") ==
      Set("dashed(events.a.user1, 5.000)"))
  }

  test("keepLastValue limit fills only short gaps; moving windows take durations") {
    import graft.graphite.GraphiteParser._
    val s = spark
    import s.implicits._
    // one series with a 1-gap, a 2-gap, and a trailing null
    val gaps = Seq[(String, Long, Option[Double])](
      ("m.a", 0L, Some(1.0)), ("m.a", 3600L, None), ("m.a", 7200L, Some(3.0)),
      ("m.a", 10800L, None), ("m.a", 14400L, None), ("m.a", 18000L, Some(6.0)),
      ("m.a", 21600L, None))
      .map { case (p, b, v) => (p, b, v.map(Double.box).orNull) }
      .toDF("path", "bucket_s", "value")
    def vals(q: String): Seq[Any] = eval(parse(q), gaps)
      .orderBy("bucket_s").collect().map(_.get(2)).toSeq
    // limit 1: the single-null gap and the trailing run (length 1)
    // fill; the 2-gap stays null (builtin_functions.go:576 semantics)
    assert(vals("keepLastValue(m.a, 1)") ==
      Seq(1.0, 1.0, 3.0, null, null, 6.0, 6.0))
    // default -1 fills every gap
    assert(vals("keepLastValue(m.a)") ==
      Seq(1.0, 1.0, 3.0, 3.0, 3.0, 6.0, 6.0))
    // duration windows convert on the hourly grid: "2h" = 2 points
    val byNum = eval(parse("movingMin(events.a.user1, 2)"), frame)
      .select("bucket_s", "value").collect().map(r => r.getLong(0) -> r.get(1)).toMap
    val byDur = eval(parse("""movingMin(events.a.user1, "2h")"""), frame)
      .select("bucket_s", "value").collect().map(r => r.getLong(0) -> r.get(1)).toMap
    assert(byNum == byDur && byNum.nonEmpty)
    // xFilesFactor: the head window holds 1 of 2 nominal points
    // (0.5 < 0.9) → null; full windows pass the gate
    val xff = eval(parse("movingMin(events.a.user1, 2, 0.9)"), frame)
      .select("bucket_s", "value").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(xff == Map(0L -> None, 3600L -> Some(10.0), 7200L -> Some(12.0)))
  }

  test("counter wrap, interpolate limit, natural/reverse name sort") {
    import graft.graphite.GraphiteParser._
    val s = spark
    import s.implicits._
    // counter wraps at maxValue=255: 250 -> 3 reads as (255-250)+3+1
    val ctr = Seq(("c.a", 0L, 250.0), ("c.a", 3600L, 3.0), ("c.a", 7200L, 9.0))
      .toDF("path", "bucket_s", "value")
    val nn = eval(parse("nonNegativeDerivative(c.a, 255)"), ctr)
      .orderBy("bucket_s").collect().map(_.get(2)).toSeq
    assert(nn == Seq(null, 9.0, 6.0))
    // without maxValue the reset stays null
    val nn0 = eval(parse("nonNegativeDerivative(c.a)"), ctr)
      .orderBy("bucket_s").collect().map(_.get(2)).toSeq
    assert(nn0 == Seq(null, null, 6.0))
    // interpolate limit: 1-gap fills linearly, 2-gap stays null
    val gaps = Seq[(String, Long, Option[Double])](
      ("m.a", 0L, Some(1.0)), ("m.a", 3600L, None), ("m.a", 7200L, Some(3.0)),
      ("m.a", 10800L, None), ("m.a", 14400L, None), ("m.a", 18000L, Some(6.0)))
      .map { case (p, b, v) => (p, b, v.map(Double.box).orNull) }
      .toDF("path", "bucket_s", "value")
    val ip = eval(parse("interpolate(m.a, 1)"), gaps)
      .orderBy("bucket_s").collect().map(_.get(2)).toSeq
    assert(ip == Seq(1.0, 2.0, 3.0, null, null, 6.0))
    // natural sort ranks t2 before t10; reverse inverts
    val nat = Seq(("n.t10", 0L, 1.0), ("n.t2", 0L, 1.0), ("n.t1", 0L, 1.0))
      .toDF("path", "bucket_s", "value")
    def ranks(q: String): Map[String, Long] = eval(parse(q), nat)
      .select("path", "sort_rank").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ranks("sortByName(n.*)") ==
      Map("n.t1" -> 1L, "n.t10" -> 2L, "n.t2" -> 3L))
    assert(ranks("sortByName(n.*, true)") ==
      Map("n.t1" -> 1L, "n.t2" -> 2L, "n.t10" -> 3L))
    assert(ranks("sortByName(n.*, true, true)") ==
      Map("n.t10" -> 1L, "n.t2" -> 2L, "n.t1" -> 3L))
    // digit runs past the pad width are never truncated, matching
    // the reference's %010d key exactly: short runs order by
    // magnitude (0005 first), while runs longer than 10 digits
    // compare lexicographically against each other — the reference's
    // own behavior, replayed bug-for-bug ('12345…' < '98765…')
    val big = Seq(("m.1234567890123", 0L, 1.0), ("m.987654321098", 0L, 1.0),
      ("m.0005", 0L, 1.0)).toDF("path", "bucket_s", "value")
    val br = graft.graphite.Graphite.sortByName(big, natural = true)
      .select("path", "sort_rank").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(br == Map("m.0005" -> 1L, "m.1234567890123" -> 2L,
      "m.987654321098" -> 3L))
    // duration strings accept the reference's worded units
    assert(eval(parse("""movingMin(events.a.user1, "120min")"""), frame).count() ==
      eval(parse("""movingMin(events.a.user1, "2h")"""), frame).count())
    intercept[ParseException](
      eval(parse("""movingMin(events.a.user1, "2fortnights")"""), frame))
  }

  test("asPercent accepts a constant total or none (sum of inputs)") {
    import graft.graphite.GraphiteParser._
    def byKey(q: String): Map[(String, Long), Double] = eval(parse(q), frame)
      .collect().flatMap(r => Option(r.get(2))
        .map(v => (r.getString(0), r.getLong(1)) -> v.asInstanceOf[Double])).toMap
    // constant total: plain scale (a: 10,15,12 over 200)
    val const = byKey("asPercent(events.a.user1, 200)")
    assert(const(("events.a.user1", 0L)) == 5.0 &&
      const(("events.a.user1", 3600L)) == 7.5)
    // omitted total = percent of the instant-wise sum of the inputs
    val defTot = eval(parse("asPercent(events.*.*)"), frame)
      .select("bucket_s", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).groupBy(_._1)
      .view.mapValues(_.map(_._2).sum).toMap
    // per instant the percentages must sum to 100 (7200 has 1 series)
    assert(defTot.keySet == Set(0L, 3600L, 7200L) &&
      defTot.values.forall(s => math.abs(s - 100.0) < 1e-9))
  }

  test("summarize supports the full SafeAggregationFns set, time-ordered") {
    import graft.graphite.GraphiteParser._
    def one(q: String): Map[Long, Double] = eval(parse(q), frame)
      .where(col("path").contains("a.user1") ||
        col("path").startsWith("summarize"))
      .select("bucket_s", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // a.user1 = (0→10, 3600→15, 7200→12); one 1d bucket
    assert(one("""summarize(events.a.user1, "1d", "last")""") == Map(0L -> 12.0))
    assert(one("""summarize(events.a.user1, "1d", "median")""") == Map(0L -> 12.0))
    // SafeDiff = first − Σrest = 10 − 15 − 12
    assert(one("""summarize(events.a.user1, "1d", "diff")""") == Map(0L -> -17.0))
    assert(one("""summarize(events.a.user1, "1d", "range")""") == Map(0L -> 5.0))
    assert(one("""summarize(events.a.user1, "1d", "count")""") == Map(0L -> 3.0))
    assert(one("""summarize(events.a.user1, "1d", "multiply")""") ==
      Map(0L -> 1800.0))
    // smartSummarize last is time-ordered too (start-aligned buckets)
    assert(one("""smartSummarize(events.a.user1, "2h", "last")""") ==
      Map(0L -> 15.0, 7200L -> 12.0))
  }

  test("randomWalk generates the grid; aliasByTags aliases aliasByNode") {
    import graft.graphite.GraphiteParser._
    // one draw per step across the frame's bucket span, all in [-0.5, 0.5)
    val rw = eval(parse("""randomWalk("rw", 3600)"""), frame).collect()
    assert(rw.map(_.getLong(1)).sorted.toSeq == Seq(0L, 3600L, 7200L))
    assert(rw.forall(r => r.getString(0) == "rw" &&
      r.getDouble(2) >= -0.5 && r.getDouble(2) < 0.5))
    // name-derived seed: the draw is reproducible across evaluations
    val rw2 = eval(parse("""randomWalk("rw", 3600)"""), frame).collect()
    assert(rw.map(_.getDouble(2)).toSeq == rw2.map(_.getDouble(2)).toSeq)
    assert(eval(parse("randomWalk('rw')"), frame).count() == 121)
    val byTags = eval(parse("aliasByTags(events.*.*, 1, 2)"), frame)
      .select("path").distinct().collect().map(_.getString(0)).toSet
    assert(byTags == Set("a.user1", "b.user2"))
  }

  test("timeShift signs and compound durations per ParseInterval") {
    import graft.graphite.GraphiteParser.{eval, parse}
    def buckets(q: String): Seq[Long] = eval(parse(q), frame)
      .select("bucket_s").collect().map(_.getLong(0)).sorted.toSeq
    // no sign implies minus (builtin_functions.go:355): "1h" and
    // "-1h" both draw past data at present time = re-stamp +3600
    assert(buckets("""timeShift(events.a.user1, "1h")""") ==
      Seq(3600L, 7200L, 10800L))
    assert(buckets("""timeShift(events.a.user1, "-1h")""") ==
      Seq(3600L, 7200L, 10800L))
    // explicit plus shifts forward in time = re-stamp earlier
    assert(buckets("""timeShift(events.a.user1, "+1h")""") ==
      Seq(-3600L, 0L, 3600L))
    // compound intervals sum their runs (ParseInterval
    // FindAllString) — and the implied minus is a string prepend, so
    // it negates only the FIRST run: "1h30min" → "-1h30min" →
    // −3600 + 1800 = −1800 → re-stamp +1800, exactly the reference
    assert(buckets("""timeShift(events.a.user1, "1h30min")""") ==
      Seq(1800L, 5400L, 9000L))
    intercept[graft.graphite.GraphiteParser.ParseException](
      eval(parse("""timeShift(events.a.user1, "nope")"""), frame))
  }

  test("moving-window durations convert via the frame's grid step") {
    import graft.graphite.GraphiteParser.{eval, parse}
    def vals(q: String, unit: String = "hour"): Map[Long, Double] =
      eval(parse(q), frame, null, unit)
        .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    // "2h" on the hourly grid = 2 points — same result as the count form
    assert(vals("""movingMax(events.a.user1, "2h")""") ==
      vals("movingMax(events.a.user1, 2)"))
    // the same duration on a minute grid is 120 points — here the
    // fixture only has 3 rows so it degenerates to the running max
    assert(vals("""movingMax(events.a.user1, "2h")""", "minute") ==
      Map(0L -> 10.0, 3600L -> 15.0, 7200L -> 15.0))
    // sub-step durations round up to one point, never zero
    assert(vals("""movingMax(events.a.user1, "30min")""") ==
      vals("movingMax(events.a.user1, 1)"))
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
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sn == Map("events.a.user1" -> 1L, "events.b.user2" -> 2L))
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

  test("highestRanked fusion is row-identical to sortByMaxima∘highestMax") {
    for (n <- Seq(1, 2, 5)) {
      val fused = Graphite.highestRanked(frame, n, "max")
        .select("path", "bucket_s", "value", "sort_rank")
        .collect().map(_.toSeq).toSet
      val composed = Graphite.sortByMaxima(Graphite.highestMax(frame, n))
        .select("path", "bucket_s", "value", "sort_rank")
        .collect().map(_.toSeq).toSet
      assert(fused == composed, s"n=$n")
    }
  }

  // ---- round-3 builtin additions ----

  test("substr slices path segments with negative indexing") {
    import graft.graphite.GraphiteParser.{eval, parse}
    def paths(q: String) = eval(parse(q), frame)
      .select("path").distinct().collect().map(_.getString(0)).toSet
    assert(paths("substr(events.a.user1, 1, 0)") == Set("a.user1"))
    assert(paths("substr(events.a.user1, -2, 0)") == Set("a.user1"))
    assert(paths("substr(events.a.user1, 0, 2)") == Set("events.a"))
  }

  test("timeSlice nulls values outside the inclusive range") {
    import graft.graphite.GraphiteParser.{eval, parse}
    val v = eval(parse("timeSlice(events.a.user1, 0, 3600)"), frame)
      .collect().map(r => r.getLong(1) -> Option(r.get(2))).toMap
    assert(v(0L).contains(10.0) && v(3600L).contains(15.0) && v(7200L).isEmpty)
  }

  test("grid producers draw over the frame's bucket grid") {
    import graft.graphite.GraphiteParser.{eval, parse}
    val t = eval(parse("""threshold(42, "cap")"""), frame)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(t.map(_._2).toSet == Set(0L, 3600L, 7200L))
    assert(t.forall(x => x._1 == "cap" && x._3 == 42.0))
    val id = eval(parse("""identity("t")"""), frame)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(id == Map(0L -> 0.0, 3600L -> 3600.0, 7200L -> 7200.0))
  }

  test("isNonNull, delay and interpolate handle null gaps") {
    import graft.graphite.GraphiteParser.{eval, parse}
    val nn = eval(parse("isNonNull(removeAboveValue(events.a.user1, 12))"), frame)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(nn == Map(0L -> 1.0, 3600L -> 0.0, 7200L -> 1.0))
    val dl = eval(parse("delay(events.a.user1, 1)"), frame)
      .collect().map(r => r.getLong(1) -> Option(r.get(2))).toMap
    assert(dl(0L).isEmpty && dl(3600L).contains(10.0) && dl(7200L).contains(15.0))
    // interpolate bridges the nulled-out middle point linearly
    val ip = eval(parse("interpolate(removeAboveValue(events.a.user1, 12))"), frame)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(ip == Map(0L -> 10.0, 3600L -> 11.0, 7200L -> 12.0))
  }

  test("sustainedAbove only keeps values after the streak length") {
    // threshold 9, 2h interval = 2 hourly rows sustained
    val v = Graphite.sustainedAbove(frame, 9.0, 7200L)
      .where(col("path") === "events.a.user1")
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(v == Map(0L -> 0.0, 3600L -> 15.0, 7200L -> 12.0))
  }

  test("rank family: highest/lowest by reducer, filterSeries") {
    import graft.graphite.GraphiteParser.{eval, parse}
    def paths(q: String) = eval(parse(q), frame)
      .select("path").distinct().collect().map(_.getString(0)).toSet
    assert(paths("""highest(events.*.*, 1, "current")""") == Set("events.b.user2"))
    assert(paths("lowestAverage(events.*.*, 1)") == Set("events.a.user1"))
    assert(paths("""filterSeries(events.*.*, "max", ">", 20)""") ==
      Set("events.b.user2"))
    assert(paths("mostDeviant(events.*.*, 1)") == Set("events.b.user2"))
    val st = eval(parse("""sortBy(events.*.*, "sum", true)"""), frame)
      .select("path", "sort_rank").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // reverse=true: ascending by sum → a.user1 (37) before b.user2 (150)
    assert(st == Map("events.a.user1" -> 1L, "events.b.user2" -> 2L))
  }

  test("alias surgery and node grouping") {
    import graft.graphite.GraphiteParser.{eval, parse}
    val sub = eval(parse("""aliasSub(events.a.user1, "user", "u")"""), frame)
      .select("path").distinct().collect().map(_.getString(0)).toSet
    assert(sub == Set("events.a.u1"))
    val met = eval(parse("aliasByMetric(events.*.*)"), frame)
      .select("path").distinct().collect().map(_.getString(0)).toSet
    assert(met == Set("user1", "user2"))
    val gn = eval(parse("""groupByNodes(events.*.*, "sum", 0)"""), frame)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(gn(("events", 0L)) == 110.0)
  }

  test("hitcount and scaleToSeconds rescale by the step") {
    val hc = Graphite.hitcount(frame, 7200L, 3600L)
      .where(col("path") === "events.a.user1")
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(hc == Map(0L -> 25.0 * 3600.0, 7200L -> 12.0 * 3600.0))
    val sc = Graphite.scaleToSeconds(frame, 60, 3600L)
      .where(col("path") === "events.a.user1" && col("bucket_s") === 0L)
      .collect().map(_.getDouble(2))
    assert(sc.head == 10.0 * (60.0 / 3600.0))
  }

  test("fallbackSeries and divideSeriesLists pair frames") {
    import graft.graphite.GraphiteParser.{eval, parse}
    val fb = eval(parse("fallbackSeries(events.zzz.*, events.a.user1)"), frame)
      .select("path").distinct().collect().map(_.getString(0)).toSet
    assert(fb == Set("events.a.user1"))
    val kept = eval(parse("fallbackSeries(events.b.user2, events.a.user1)"), frame)
      .select("path").distinct().collect().map(_.getString(0)).toSet
    assert(kept == Set("events.b.user2"))
    val dl = eval(parse("divideSeriesLists(events.a.user1, events.a.user1)"), frame)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(dl == Map(0L -> 1.0, 3600L -> 1.0, 7200L -> 1.0))
  }

  test("consolidateBy re-derives the frame with the given function") {
    val s = spark
    import s.implicits._
    val samples = Seq(
      ("a", 1L, java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), 10.0, 1L),
      ("a", 1L, java.sql.Timestamp.valueOf("2024-01-01 00:20:00"), 30.0, 2L))
      .toDF("name", "user_id", "ts", "value", "event_id")
    val mx = graft.graphite.GraphiteParser.query(samples,
      """consolidateBy(events.a.user1, "max")""")
      .collect().map(_.getDouble(2))
    assert(mx.toSeq == Seq(30.0))
    val cum = graft.graphite.GraphiteParser.query(samples,
      "cumulative(events.a.user1)")
      .collect().map(_.getDouble(2))
    assert(cum.toSeq == Seq(40.0))
  }

  test("removeEmptySeries and percentile clamps") {
    import graft.graphite.GraphiteParser.{eval, parse}
    val re = eval(parse("removeEmptySeries(removeAboveValue(events.*.*, 60))"),
      frame).select("path").distinct().collect().map(_.getString(0)).toSet
    // b.user2 keeps one sub-60 value (50) → stays; a.user1 fully kept
    assert(re == Set("events.a.user1", "events.b.user2"))
    val rap = eval(parse("removeAbovePercentile(events.a.user1, 50)"), frame)
      .collect().map(r => r.getLong(1) -> Option(r.get(2))).toMap
    assert(rap(3600L).isEmpty, "above-median point must null out")
    // GetPercentile hand-checks (common/percentiles.go:61 — rank =
    // ceil(p/100·(n+1)) clamped to [1,n], no interpolation):
    // a=(10,12,15): p30 → rank ceil(1.2)=2 → 12; p95 → rank 4→clamp 3 → 15
    // b=(50,100):   p30 → rank ceil(0.9)=1 → 50; p95 → rank 3→clamp 2 → 100
    // nPercentile returns a CONSTANT series per input series (same
    // buckets, renamed with the %.3f percentile — NPercentile's
    // NewConstantValues shape), so distinct (path → value) collapses
    // to one entry per series
    def np(p: Int): Map[String, Double] =
      eval(parse(s"nPercentile(events.*.*, $p)"), frame)
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toSet.toMap
    assert(np(30) == Map(
      "nPercentile(events.a.user1, 30.000)" -> 12.0,
      "nPercentile(events.b.user2, 30.000)" -> 50.0))
    assert(np(95) == Map(
      "nPercentile(events.a.user1, 95.000)" -> 15.0,
      "nPercentile(events.b.user2, 95.000)" -> 100.0))
    // movingMedian upper-median: window of (100,50) → sorted[k/2]=100
    val mm = eval(parse("movingMedian(events.b.user2, 2)"), frame)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(mm == Map(0L -> 100.0, 3600L -> 100.0))
  }

  test("holt-winters bands contain the forecast; aberration is 0 inside") {
    val f = frame
    val bands = Graphite.holtWintersConfidenceBands(f, 3.0)
    assert(bands.select("path").distinct().count() == 4)
    val ab = Graphite.holtWintersAberration(f, 100.0)
      .collect().map(_.getDouble(2))
    assert(ab.forall(_ == 0.0), "wide delta: everything inside the band")
  }

  test("sortByName ranks correctly when every path shares a root") {
    val s = spark
    import s.implicits._
    // 40 paths all under the same root: the prefix shard must come
    // from AFTER the common prefix or everything lands in one shard
    val paths = (0 until 40).map(i => (f"events.m$i%02d.user1", 0L, 1.0))
    val ranked = Graphite.sortByName(paths.toDF("path", "bucket_s", "value"))
      .select("path", "sort_rank").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = paths.map(_._1).sorted.zipWithIndex
      .map { case (p, i) => p -> (i + 1L) }.toMap
    assert(ranked == expected)
  }

  test("aggregate dispatches the full combine-fn name set") {
    import graft.graphite.GraphiteParser.{eval, parse}
    def vals(q: String) = eval(parse(q), frame)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(vals("""aggregate(events.*.*, "range")""") ==
      Map(0L -> 90.0, 3600L -> 35.0, 7200L -> 0.0))
    assert(vals("""aggregate(events.*.*, "last")""") ==
      Map(0L -> 100.0, 3600L -> 50.0, 7200L -> 12.0))
    assert(vals("""aggregate(events.*.*, "median")""") ==
      Map(0L -> 55.0, 3600L -> 32.5, 7200L -> 12.0))
    assert(vals("""aggregate(events.*.*, "diff")""") ==
      Map(0L -> -90.0, 3600L -> -35.0, 7200L -> 12.0))
    // aggregateLine draws the reduced first series across the grid
    assert(vals("""aggregateLine(events.a.user1, "max")""") ==
      Map(0L -> 15.0, 3600L -> 15.0, 7200L -> 15.0))
  }

  test("applyByNode re-evaluates the template per node prefix") {
    import graft.graphite.GraphiteParser.{eval, parse}
    // prefixes of node 1: events.a, events.b → sum each subtree
    val r = eval(parse(
      """applyByNode(events.*.*, 1, "sumSeries(%.*)", "%.sum")"""), frame)
      .collect().map(x => (x.getString(0), x.getLong(1)) -> x.getDouble(2)).toMap
    assert(r(("events.a.sum", 0L)) == 10.0)
    assert(r(("events.a.sum", 7200L)) == 12.0)
    assert(r(("events.b.sum", 3600L)) == 50.0)
    // series with too few segments contribute no prefix
    intercept[graft.graphite.GraphiteParser.ParseException](
      eval(parse("""applyByNode(events.*.*, 5, "sumSeries(%.*)")"""), frame))
  }

  test("multi-series args union into one combine input") {
    import graft.graphite.GraphiteParser.{eval, parse}
    val sm = eval(parse("sumSeries(events.a.user1, events.b.user2)"), frame)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(sm == Map(0L -> 110.0, 3600L -> 65.0, 7200L -> 12.0))
    val df = eval(parse("diffSeries(events.a.user1, events.b.user2)"), frame)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(df == Map(0L -> -90.0, 3600L -> -35.0, 7200L -> 12.0))
  }

  test("registered short aliases dispatch to their canonical builtins") {
    import graft.graphite.GraphiteParser.{eval, parse}
    // sum/max/min/abs/avg (builtin_functions.go:3049) must evaluate
    // exactly like their long forms
    for ((short, long) <- Seq(
        "sum" -> "sumSeries", "max" -> "maxSeries", "min" -> "minSeries",
        "avg" -> "averageSeries")) {
      val a = eval(parse(s"$short(events.a.user1, events.b.user2)"), frame)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      val b = eval(parse(s"$long(events.a.user1, events.b.user2)"), frame)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(a == b, s"$short != $long")
    }
    val ab = eval(parse("abs(offset(events.a.user1, -14))"), frame)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(ab == Map(0L -> 4.0, 3600L -> 1.0, 7200L -> 2.0))
  }

  test("metricsFind flags nodes that are both leaf and expandable") {
    val s = spark
    import s.implicits._
    // a node can terminate a series AND have children below it
    val mixed = Seq(
      ("svc.api", 0L, 1.0),          // leaf at level 2
      ("svc.api.latency", 0L, 2.0),  // …and expandable
      ("svc.db.conns", 0L, 3.0))     // expandable only
      .toDF("path", "bucket_s", "value")
    val r = graft.graphite.Graphite.metricsFind(mixed, "svc.*").collect()
      .map(x => x.getAs[String]("id") ->
        (x.getAs[Int]("is_leaf"), x.getAs[Int]("has_children"))).toMap
    assert(r == Map("svc.api" -> ((1, 1)), "svc.db" -> ((0, 1))))
    // glob constrains the expanded level, segments match whole parts
    val one = graft.graphite.Graphite.metricsFind(mixed, "svc.a*").collect()
    assert(one.map(_.getAs[String]("text")).toSeq == Seq("api"))
  }

  test("findRange bounds the tree to series with data in the window") {
    val samples = graft.tsdb.Vectors.samples(Tables.events(spark, sf))
    val now = 1705795200L
    val all = graft.graphite.GraphiteParser
      .findRange(samples, "events.purchase.*", "0", "now", now)
      .collect().map(_.getAs[String]("id")).toSet
    val windowed = graft.graphite.GraphiteParser
      .findRange(samples, "events.purchase.*", "20240105", "20240107", now)
      .collect().map(_.getAs[String]("id")).toSet
    // find_parser.go defaults (0, now) expand the full tree; a tight
    // window expands a strict subset of it
    assert(windowed.subsetOf(all))
    assert(windowed.size < all.size, "two days should drop some leaves")
    assert(windowed.nonEmpty)
  }

  test("render offset: ParseDuration form and past-shifted window") {
    import graft.graphite.{GraphiteParser, GraphiteTime}
    // timespec.go:323 — only the -N<unit> form parses, always negative
    assert(GraphiteTime.parseDuration("-1d") == -86400L)
    assert(GraphiteTime.parseDuration("-30min") == -1800L)
    intercept[GraphiteParser.ParseException](GraphiteTime.parseDuration("1h"))
    intercept[GraphiteParser.ParseException](GraphiteTime.parseDuration("now"))
    // renderOffset(-1d) ≡ render with both bounds shifted a day back
    val samples = graft.tsdb.Vectors.samples(Tables.events(spark, sf))
    val now = 1705795200L
    val shifted = GraphiteParser.renderOffset(samples,
      "events.purchase.*", "20240105", "20240107", now, "-1d")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val direct = GraphiteParser.render(samples,
      "events.purchase.*", "20240104", "20240106", now)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(shifted == direct && shifted.nonEmpty)
  }

  test("renderMulti: request order, name sort, all-NaN omission") {
    import graft.graphite.GraphiteParser
    val samples = graft.tsdb.Vectors.samples(Tables.events(spark, sf))
    val now = 1705795200L
    // removeBelowValue(…, 1e9) nulls EVERY point → all-NaN series,
    // omitted by default (render.go:224 renderResultsJSON)
    val targets = Seq("events.purchase.*",
      "removeBelowValue(events.purchase.*, 1000000000)")
    val dropped = GraphiteParser.renderMulti(samples, targets,
      "20240105", "20240107", now)
    val byTarget = dropped.groupBy("target_idx").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byTarget.getOrElse(1, 0L) == 0L, "all-NaN series must vanish")
    assert(byTarget(0) > 0)
    // the server option keeps them (empty-datapoints rendering)
    val kept = GraphiteParser.renderMulti(samples, targets,
      "20240105", "20240107", now, renderSeriesAllNaNs = true)
      .groupBy("target_idx").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(kept.getOrElse(1, 0L) > 0L)
    // series_order is the stable per-target by-path rank
    val order = dropped.where(col("target_idx") === 0)
      .select("path", "series_order").distinct()
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val sorted = order.keys.toSeq.sorted
    assert(sorted.zipWithIndex.forall { case (p, i) => order(p) == i + 1 },
      s"rank must follow path order: $order")
  }
}
