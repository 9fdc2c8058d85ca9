package graft

import org.apache.spark.sql.functions.{col, lit, round, sum}

class SaltSpec extends SparkSpec {
  test("salted two-phase aggregation equals direct aggregation") {
    val samples = tsdb.Vectors.samples(Tables.events(spark, sf))
    val direct = samples.groupBy("name").agg(sum("value").as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = samples
      .withColumn("salt", tsdb.Vectors.saltedKey(8, col("user_id")))
      .groupBy("name", "salt").agg(sum("value").as("ps"))
      .groupBy("name").agg(sum("ps").as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(direct.keySet == salted.keySet)
    direct.foreach { case (k, v) =>
      assert(math.abs(v - salted(k)) < 1e-3, s"$k: $v vs ${salted(k)}")
    }
  }

  test("m3ql rejects malformed pipelines") {
    import graft.m3ql.M3QL
    val samples = tsdb.Vectors.samples(Tables.events(spark, sf))
    intercept[M3QL.ParseException](M3QL.query(samples, "sum name"))
    intercept[M3QL.ParseException](M3QL.query(samples, "fetch name:a | fetch name:b"))
    intercept[M3QL.ParseException](M3QL.query(samples, "fetch noColon"))
    intercept[M3QL.ParseException](
      M3QL.query(samples, "a = fetch name:x; b = fetch name:y")) // no main
    intercept[M3QL.ParseException](
      M3QL.query(samples, "m = m | abs; m")) // macro cycle
    // nesting (grammar.peg:40) malformed forms
    intercept[M3QL.ParseException](M3QL.query(samples,
      "fetch name:a | divide (fetch name:b | sum")) // unbalanced '('
    intercept[M3QL.ParseException](M3QL.query(samples,
      "fetch name:a | divide fetch name:b")) // missing parens
    intercept[M3QL.ParseException](M3QL.query(samples,
      "fetch name:a | divide (fetch name:b) (fetch name:c)")) // two args
    intercept[M3QL.ParseException](M3QL.query(samples,
      "divide (fetch name:b | sum)")) // nested op cannot start
    intercept[M3QL.ParseException](M3QL.query(samples,
      "fetch name:a | asPercent (sum name)")) // nested must fetch
  }

  test("block-segmented index honors time bounds, byte-equal to scan route") {
    import graft.tsdb.{Fetch, Index}
    val samples = tsdb.Vectors.samples(Tables.events(spark, sf))
    Index.writeBlockSegments(samples, "graft_idx_spec", Seq("name", "user_id"))
    val ms = Seq(Fetch.Matcher("name", Fetch.Re, "(pur|cli).*"),
      Fetch.Matcher("user_id", Fetch.Re, "[0-9]*[13579]"))
    val (f, u) = (19725L, 19732L)
    def tagSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    val viaIndex = tagSet(Index.boundedCompleteTags(
      spark.table("graft_idx_spec"), ms, Seq("name", "user_id"), f, u)
      .select("tag_name", "tag_value"))
    // the scan route: push matchers + the same second bounds into
    // the sample scan, then complete tags from the survivors
    val scanSeries = Fetch(samples, ms,
      startS = Some(f * 86400), endS = Some(u * 86400))
      .select(col("name").cast("string").as("name"),
        col("user_id").cast("string").as("user_id")).distinct()
    val viaScan = tagSet(
      scanSeries.select(lit("name").as("tag_name"), col("name").as("tag_value"))
        .unionByName(scanSeries.select(lit("user_id").as("tag_name"),
          col("user_id").as("tag_value")))
        .distinct())
    assert(viaIndex == viaScan && viaIndex.nonEmpty)
    // a window with no blocks resolves to the empty tag set
    assert(Index.boundedCompleteTags(spark.table("graft_idx_spec"), ms,
      Seq("name", "user_id"), 1L, 2L).count() == 0)
  }

  test("interpolate sharded coordinates equal the per-series window output") {
    // the shard-partitioned window (one shuffle, partition-local
    // sort) must produce the exact row SET of the per-series window —
    // in particular lead() must not leak across a series boundary
    // inside a shard (the masking under test)
    val samples = tsdb.Vectors.samples(Tables.events(spark, sf))
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("name", "user_id", "bucket_s", "v", "v_filled", "filled")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val plain = key(tsdb.Temporal.interpolateFrame(samples))
    val sharded = key(tsdb.Temporal.interpolateFrame(samples,
      shards = Some(32)))
    assert(sharded == plain)
  }

  test("m3ql nested sub-pipelines: divide/asPercent, macros inside nesting") {
    import graft.m3ql.M3QL
    val s = spark
    import s.implicits._
    val samples = Seq(
      ("a", 1L, ts("2024-01-01 01:00:00"), 10.0, 1L),
      ("a", 2L, ts("2024-01-01 02:00:00"), 30.0, 2L),
      ("b", 1L, ts("2024-01-01 03:00:00"), 5.0, 3L),
      ("z", 1L, ts("2024-01-01 04:00:00"), 0.0, 4L))
      .toDF("name", "user_id", "ts", "value", "event_id")
    // per-series share of the per-day all-series total (keys
    // intersect = name? no — right aggregates away user_id, keys =
    // (name, bucket_s)): a=10/40, a=30/40 against name-a's sum
    val r = M3QL.query(samples,
      "fetch name:* | asPercent (fetch name:* | sum name)")
      .select("name", "user_id", "value")
      .collect().map(x => (x.getString(0), x.getLong(1)) -> x.getDouble(2))
      .toMap
    assert(r(("a", 1L)) == 25.0 && r(("a", 2L)) == 75.0)
    assert(r(("b", 1L)) == 100.0)
    assert(!r.contains(("z", 1L)), "0/0 must drop (null, no keepNaN)")
    // divide by a nested MACRO pipeline; pipes inside parens must not
    // split the outer stage
    val d = M3QL.query(samples,
      "tot = fetch name:a | sum name; fetch name:a | divide (tot | scale 2)")
      .select("name", "user_id", "value")
      .collect().map(x => (x.getString(0), x.getLong(1)) -> x.getDouble(2))
      .toMap
    assert(d(("a", 1L)) == 0.125 && d(("a", 2L)) == 0.375)
  }

  test("m3ql macros splice and keepNaN retains null points") {
    import graft.m3ql.M3QL
    val s = spark
    import s.implicits._
    // one negative value: ln() nulls it; default pipelines DROP the
    // null point (m3 KeepNaNs=false), `keepNaN` keeps the row
    val samples = Seq(
      ("m", 1L, ts("2024-01-01 01:00:00"), 10.0, 1L),
      ("m", 1L, ts("2024-01-02 01:00:00"), -5.0, 2L))
      .toDF("name", "user_id", "ts", "value", "event_id")
    val dropped = M3QL.query(samples, "fetch name:m | ln")
    assert(dropped.count() == 1)
    val kept = M3QL.query(samples, "fetch name:m | ln | keepNaN")
    assert(kept.count() == 2)
    // macro splice: the macro body runs exactly as if inlined
    val viaMacro = M3QL.query(samples,
      "base = fetch name:m | abs; base | sqrt")
      .select("bucket_s", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val inline = M3QL.query(samples, "fetch name:m | abs | sqrt")
      .select("bucket_s", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaMacro == inline && viaMacro.size == 2)
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
}

import org.apache.spark.sql.functions._
import graft.tsdb._

/** Semantics specs for the TSDB operator families, on handcrafted
  * frames where the expected values are computable by hand. */
class TsdbSpec extends SparkSpec {
  import java.sql.Timestamp

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val counterSamples = {
    val s = spark
    import s.implicits._
    // one series, one day-bucket: counter goes 10 → 25 → 5 (reset) → 9
    Seq(
      ("c", 1L, ts("2024-01-01 00:00:00"), 10.0, 0L),
      ("c", 1L, ts("2024-01-01 06:00:00"), 25.0, 1L),
      ("c", 1L, ts("2024-01-01 12:00:00"), 5.0, 2L),
      ("c", 1L, ts("2024-01-01 18:00:00"), 9.0, 3L)
    ).toDF("name", "user_id", "ts", "value", "event_id")
  }

  test("motif discovery pairs z-identical shapes at distance zero") {
    val s = spark
    import s.implicits._
    val day = 86400L * 1000
    val base = ts("2024-01-01 12:00:00").getTime
    // two series with the same rising shape at different scales:
    // z-normalization makes them identical → dist 0, word "abcd"...
    val rows =
      Seq(1.0, 2.0, 3.0, 4.0).zipWithIndex.map { case (v, i) =>
        ("m", 1L, new Timestamp(base + i * day), v, i.toLong)
      } ++ Seq(10.0, 20.0, 30.0, 40.0).zipWithIndex.map { case (v, i) =>
        ("m", 2L, new Timestamp(base + i * day), v, (10 + i).toLong)
      }
    val r = Temporal.motifFrame(rows
      .toDF("name", "user_id", "ts", "value", "event_id")).collect()
    assert(r.length == 1, s"expected one motif pair: ${r.toSeq}")
    val m = r(0)
    assert(m.getAs[Long]("a_user") == 1L && m.getAs[Long]("b_user") == 2L)
    assert(m.getAs[Double]("dist") == 0.0)
    assert(m.getAs[String]("word").length == 4)
    // trivial-match exclusion: one series alone (overlapping windows
    // only) yields no pairs
    val solo = Seq(1.0, 2.0, 3.0, 4.0, 1.0, 2.0).zipWithIndex.map {
      case (v, i) => ("m", 1L, new Timestamp(base + i * day), v, i.toLong)
    }
    assert(Temporal.motifFrame(solo
      .toDF("name", "user_id", "ts", "value", "event_id")).count() == 0)
  }

  test("m3tsz value-cost fold replays the int encoder bit-for-bit") {
    val s = spark
    import s.implicits._
    // hand-computed against encoder.go:112-260 + the sig tracker:
    //  5.00  first: intMode(1) + sigUpd(8: sig 0→3) + noMultUpd(1)
    //        + sign(1) + 3            = 14
    //  5.00  repeat                   = 2
    //  5.25  mult 0→2, val 5→525, |diff|=520 (10 bits, grows):
    //        3 + sigUpd 8 + multUpd 4 + 1 + 10 = 26
    //  5.26..5.29  |diff|=1 (1 bit, ≥3 below 10): four no-updates
    //        at (1+1+10) = 12 each    = 48
    //  5.30  fifth low diff → tracker collapses to the run's highest
    //        (1): 3 + 8 + 1 + 1 + 1   = 14
    //  6.30  |diff|=100 (7 bits, grows): 3 + 8 + 1 + 1 + 7 = 20
    //  next-day 5.00: fresh block, first-value write again = 14
    val base = Seq(5.00, 5.00, 5.25, 5.26, 5.27, 5.28, 5.29, 5.30, 6.30)
      .zipWithIndex.map { case (v, i) =>
        ("m", 1L, new Timestamp(
          ts("2024-01-01 01:00:00").getTime + i * 60000L), v, i.toLong)
      } :+ (("m", 1L, ts("2024-01-02 01:00:00"), 5.00, 9L))
    val r = Temporal.tszValueCost(
      base.toDF("name", "user_id", "ts", "value", "event_id")).collect()(0)
    assert(r.getAs[Long]("n_samples") == 10)
    assert(r.getAs[Long]("n_blocks") == 2)
    assert(r.getAs[Long]("n_repeat") == 1)
    assert(r.getAs[Long]("n_sig_update") == 5)  // 4 in block 1 + day-2 first
    assert(r.getAs[Long]("n_mult_update") == 1)
    assert(r.getAs[Long]("max_mult") == 2)
    assert(r.getAs[Long]("total_bits") == 138)
    assert(r.getAs[Long]("n_float_mode") == 0)
    assert(r.getAs[Double]("bits_per_sample") == 13.8)
  }

  test("coverage card counts gaps and span exactly") {
    val s = spark
    import s.implicits._
    val base = ts("2024-01-01 00:00:00").getTime
    val rows = Seq(0, 1, 2, 5).map(h =>
      ("m", 1L, new Timestamp(base + h * 3600L * 1000), 1.0, h.toLong))
    val r = Temporal.coverageFrame(rows
      .toDF("name", "user_id", "ts", "value", "event_id")).collect()(0)
    assert(r.getAs[Long]("present_buckets") == 4)
    assert(r.getAs[Long]("span_buckets") == 6)
    assert(r.getAs[Double]("coverage") == 0.666667)
    assert(r.getAs[Long]("max_gap_hours") == 2)   // hours 3-4 missing
    assert(r.getAs[Long]("n_gaps") == 1)
  }

  test("profile outliers: the inverted-rhythm series ranks first") {
    val s = spark
    import s.implicits._
    val base = ts("2024-01-01 00:00:00").getTime
    // three series peak at noon; one peaks at midnight (inverted)
    val rows = (0 until 4).flatMap { u =>
      (0 until 48).map { h =>
        val hod = h % 24
        val peak = if (u == 3) (hod + 12) % 24 else hod
        val v = 10.0 + (if (peak == 12) 100.0 else 0.0)
        ("m", u.toLong, new Timestamp(base + h * 3600L * 1000), v,
          (u * 100 + h).toLong)
      }
    }
    val r = Temporal.profileOutliers(rows
      .toDF("name", "user_id", "ts", "value", "event_id"))
      .orderBy("rk").collect()
    assert(r(0).getAs[Long]("user_id") == 3L,
      s"expected the inverted series first: ${r.toSeq}")
    assert(r(0).getAs[Double]("dist") > r(1).getAs[Double]("dist"))
  }

  test("heatmap buckets are exact powers of two") {
    val s = spark
    import s.implicits._
    val base = ts("2024-01-01 00:00:00").getTime
    val rows = Seq(0.5, 1.0, 3.0, 4.0, 7.9, 200.0, -5.0, 0.0).zipWithIndex
      .map { case (v, i) => ("m", 1L, new Timestamp(base + i * 1000L), v, i.toLong) }
    val r = Temporal.heatmapFrame(rows
      .toDF("name", "user_id", "ts", "value", "event_id")).collect()
      .map(x => x.getAs[Long]("vb") -> (x.getAs[Long]("n"), x.getAs[Double]("v_lo")))
      .toMap
    // -5 and 0 drop (log domain); 0.5→vb -1, 1→0, 3→1, {4, 7.9}→2, 200→7
    assert(r == Map(-1L -> ((1L, 0.5)), 0L -> ((1L, 1.0)),
      1L -> ((1L, 2.0)), 2L -> ((2L, 4.0)), 7L -> ((1L, 128.0))), s"$r")
  }

  test("burn rate pages only when short AND long windows exceed budget") {
    val s = spark
    import s.implicits._
    val base = ts("2024-01-01 00:00:00").getTime
    // 7 clean days (10 events each, none bad), then one day fully bad:
    // short burn = 1/0.1 = 10 > 1; the 7-day window covers days 1..7
    // = 70 events, 10 bad → long burn = 10/70/0.1 ≈ 1.428571 > 1
    val rows = (0 until 8).flatMap { d =>
      (0 until 10).map { i =>
        val v = if (d == 7) 200.0 else 1.0
        ("svc", 1L, new Timestamp(base + (d * 86400L + i) * 1000L), v,
          (d * 10 + i).toLong)
      }
    }
    val r = Temporal.burnRateFrame(rows
      .toDF("name", "user_id", "ts", "value", "event_id"))
      .orderBy("bucket_s").collect()
    assert(r.take(7).forall(_.getAs[Int]("alert") == 0))
    val last = r.last
    assert(last.getAs[Double]("short_burn") == 10.0)
    assert(last.getAs[Double]("long_burn") == 1.428571)
    assert(last.getAs[Int]("alert") == 1)
  }

  test("CUSUM: flat prefix stays silent, level shift alarms") {
    val s = spark
    import s.implicits._
    val base = ts("2024-01-01 00:00:00").getTime
    val rows = (0 until 70).map { i =>
      val v = if (i < 50) 0.0 else 10.0
      ("m", 1L, new Timestamp(base + i * 3600L * 1000), v, i.toLong)
    }
    val r = Temporal.cusumFrame(rows.toDF("name", "user_id", "ts", "value",
      "event_id")).orderBy("bucket_s").collect()
    assert(r.take(50).forall(_.getAs[Int]("alarm") == 0),
      "alarm before the shift")
    assert(r.last.getAs[Int]("alarm") == 1, "no alarm after the shift")
    // statistic is non-negative by construction
    assert(r.forall(_.getAs[Double]("cusum_v") >= 0.0))
  }

  test("ACF: alternating series gives the exact biased-estimator comb") {
    val s = spark
    import s.implicits._
    val base = ts("2024-01-01 00:00:00").getTime
    // 0,2,0,2,… over 48 hours: μ=1, σ²_pop=1 exactly, so
    // acf(k) = (−1)^k·(n−k)/n with n=48 — the textbook comb
    val rows = (0 until 48).map { i =>
      ("m", 1L, new Timestamp(base + i * 3600L * 1000),
        if (i % 2 == 0) 0.0 else 2.0, i.toLong)
    }
    val r = Temporal.acfFrame(rows.toDF("name", "user_id", "ts", "value",
      "event_id")).collect()
      .map(x => x.getAs[Int]("lag_k") ->
        ((x.getAs[Long]("n_pairs"), x.getAs[Double]("acf_v")))).toMap
    (1 to 8).foreach { k =>
      val exp = BigDecimal(math.pow(-1, k) * (48.0 - k) / 48.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r(k) == ((48L - k, exp)), s"lag $k: got ${r(k)}")
    }
  }

  test("xcorr: a 2-hour-shifted copy peaks at exactly lag 2") {
    val s = spark
    import s.implicits._
    val base = ts("2024-01-01 00:00:00").getTime
    val pat = Array(3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3)
    val f = (t: Int) => pat(((t % 16) + 16) % 16).toDouble
    // b(t) = a(t−2): pairs (a(t), b(t+k)) align perfectly at k=2
    val rows = (0 until 48).flatMap { i =>
      val t = new Timestamp(base + i * 3600L * 1000)
      Seq(("a", 1L, t, f(i), i.toLong * 2),
        ("b", 1L, t, f(i - 2), i.toLong * 2 + 1))
    }
    val r = Temporal.xcorrFrame(rows.toDF("name", "user_id", "ts", "value",
      "event_id")).collect()
      .map(x => x.getAs[Int]("lag_k") -> x.getAs[Double]("r_v")).toMap
    assert(r(2) == 1.0, s"shift lag not perfect: ${r(2)}")
    assert(r.filter(_._1 != 2).values.forall(_ < 1.0),
      "another lag ties the true shift")
  }

  test("MAD outliers: one spike flags, alternation scores exactly") {
    val s = spark
    import s.implicits._
    val base = ts("2024-01-01 00:00:00").getTime
    // 10,12 ×5 then 1000: med=12, MAD=2 exactly; the spike's z is huge
    // while the stddev-z of the same series would be diluted by it
    val vals = Seq(10.0, 12.0, 10.0, 12.0, 10.0, 12.0, 10.0, 12.0,
      10.0, 12.0, 1000.0)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      ("m", 1L, new Timestamp(base + i * 3600L * 1000), v, i.toLong)
    }
    val r = Temporal.madFrame(rows.toDF("name", "user_id", "ts", "value",
      "event_id")).orderBy("bucket_s").collect()
    assert(r.forall(_.getAs[Double]("med_v") == 12.0))
    assert(r.forall(_.getAs[Double]("mad_v") == 2.0))
    assert(r.last.getAs[Int]("outlier") == 1)
    assert(r.last.getAs[Double]("z_v") > 300.0)
    assert(r.init.forall(_.getAs[Int]("outlier") == 0))
    // z of the 10-buckets: 0.6745·(10−12)/2 = −0.6745 (exact double)
    assert(r.filter(_.getAs[Double]("v") == 10.0)
      .forall(_.getAs[Double]("z_v") == -0.6745))
  }

  test("interpolate: short gaps fill linearly, long gaps stay NULL") {
    val s = spark
    import s.implicits._
    val base = ts("2024-01-01 00:00:00").getTime
    // values at hours 0, 3 (gap of 2 ≤ maxGap → fill), then 20
    // (gap of 16 > 6 → stays NULL)
    val pts = Map(0 -> 10.0, 3 -> 40.0, 20 -> 100.0)
    val rows = pts.toSeq.map { case (i, v) =>
      ("m", 1L, new Timestamp(base + i * 3600L * 1000), v, i.toLong)
    }
    val r = Temporal.interpolateFrame(rows.toDF("name", "user_id", "ts",
      "value", "event_id")).orderBy("bucket_s").collect()
      .map(x => ((x.getAs[Long]("bucket_s") - base / 1000) / 3600).toInt ->
        ((Option(x.get(x.fieldIndex("v_filled"))),
          x.getAs[Int]("filled")))).toMap
    assert(r.size == 21, "spine covers the full span")
    assert(r(0) == ((Some(10.0), 0)))
    assert(r(1) == ((Some(20.0), 1)), "hour 1 interpolates 10→40")
    assert(r(2) == ((Some(30.0), 1)))
    assert(r(3) == ((Some(40.0), 0)))
    assert(r(10) == ((None, 0)), "16-hour gap is not invented")
    assert(r(20) == ((Some(100.0), 0)))
  }

  test("rollup loss: flat series loses nothing, alternation loses spread") {
    val s = spark
    import s.implicits._
    val base = ts("2024-01-01 00:00:00").getTime
    // 48 h: flat 10.0 vs alternating 0/2 — the alternating series has
    // within-bucket spread 2 and RMS deviation exactly 1 at BOTH
    // resolutions (0,2 alternation: mean 1, var 1)
    val rows = (0 until 48).flatMap { i =>
      val t = new Timestamp(base + i * 3600L * 1000)
      Seq(("flat", 1L, t, 10.0, i.toLong * 2),
        ("alt", 1L, t, if (i % 2 == 0) 0.0 else 2.0, i.toLong * 2 + 1))
    }
    val r = Temporal.rollupLossFrame(rows.toDF("name", "user_id", "ts",
      "value", "event_id")).collect()
      .map(x => (x.getAs[String]("name"), x.getAs[Long]("res_s")) ->
        ((x.getAs[Long]("n_buckets"), x.getAs[Double]("avg_spread"),
          x.getAs[Double]("avg_rms_dev")))).toMap
    assert(r(("flat", 14400L)) == ((12L, 0.0, 0.0)))
    assert(r(("flat", 86400L)) == ((2L, 0.0, 0.0)))
    assert(r(("alt", 14400L)) == ((12L, 2.0, 1.0)))
    assert(r(("alt", 86400L)) == ((2L, 2.0, 1.0)))
  }

  test("alert FOR: fires only after 3 contiguous hot buckets; gaps reset") {
    val s = spark
    import s.implicits._
    val base = ts("2024-01-01 00:00:00").getTime
    // hours 0,1 hot (2 < for-window), 2 cold, 3,4,5 hot (fires at 5),
    // then a GAP (6 missing) and hot 7,8 — contiguity broken, and the
    // run restarted at 7 has only 2 buckets: no fire
    val hot = Map(0 -> 99.0, 1 -> 99.0, 2 -> 1.0, 3 -> 99.0, 4 -> 99.0,
      5 -> 99.0, 7 -> 99.0, 8 -> 99.0)
    val rows = hot.toSeq.map { case (i, v) =>
      ("m", 1L, new Timestamp(base + i * 3600L * 1000), v, i.toLong)
    }
    val r = Temporal.alertForFrame(rows.toDF("name", "user_id", "ts",
      "value", "event_id")).orderBy("bucket_s").collect()
      .map(x => ((x.getAs[Long]("bucket_s") - base / 1000) / 3600).toInt ->
        ((x.getAs[Int]("pending"), x.getAs[Int]("firing")))).toMap
    assert(r(0) == ((1, 0)) && r(1) == ((1, 0)), "pending before FOR")
    assert(r(2) == ((0, 0)))
    assert(r(3) == ((1, 0)) && r(4) == ((1, 0)))
    assert(r(5) == ((1, 1)), "third contiguous hot bucket fires")
    assert(r(7) == ((1, 0)) && r(8) == ((1, 0)),
      "gap resets the FOR clock")
  }

  test("type inference: monotone-with-reset is counter, noise is gauge") {
    val s = spark
    import s.implicits._
    val base = ts("2024-01-01 00:00:00").getTime
    val pat = Array(5, 2, 9, 1, 7, 3, 8, 4)
    // counter: cumulative sum that resets once at i=20 (process
    // restart) — 1 negative delta in 29 keeps frac ≥ 0.95;
    // gauge: the raw noise pattern — deltas alternate sign
    val rows = (0 until 30).flatMap { i =>
      val t = new Timestamp(base + i * 60000L)
      Seq(
        ("requests", 1L, t, if (i < 20) i * 10.0 else (i - 20) * 10.0,
          i.toLong * 2),
        ("temp", 1L, t, pat(i % 8).toDouble, i.toLong * 2 + 1))
    }
    val r = Temporal.typeInferFrame(rows.toDF("name", "user_id", "ts",
      "value", "event_id")).collect()
      .map(x => x.getAs[String]("name") -> x).toMap
    assert(r("requests").getAs[String]("inferred_type") == "counter")
    assert(r("requests").getAs[Long]("resets") == 1L)
    assert(r("temp").getAs[String]("inferred_type") == "gauge")
    assert(r("temp").getAs[Long]("n_deltas") == 29L)
  }

  test("strength: a pure ramp is all trend; a square day-wave is seasonal") {
    val s = spark
    import s.implicits._
    val base = ts("2024-01-01 00:00:00").getTime
    val mk = (name: String, f: Int => Double) => (0 until 96).map { i =>
      (name, 1L, new Timestamp(base + i * 3600L * 1000), f(i),
        i.toLong)
    }
    // ramp: the centered moving average of a line IS the line, so
    // residual variance is 0 → trend strength exactly 1; the
    // detrended series is identically 0 → Var(v−trend)=0 → seasonal
    // strength NULL (the guard, not 0)
    // wave: 0/100 split by hour-of-day plus a period-16 pseudo-noise
    // floor — without the noise BOTH strengths are exactly 1 (a
    // noiseless wave has zero residual), so the noise is what makes
    // the two measures discriminate
    val pat = Array(3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3)
    val rows = mk("ramp", i => 3.0 * i + 7.0) ++
      mk("wave", i =>
        (if (i % 24 < 12) 0.0 else 100.0) + pat(i % 16).toDouble)
    val r = Temporal.strengthFrame(rows.toDF("name", "user_id", "ts",
      "value", "event_id")).collect()
      .map(x => x.getAs[String]("name") -> x).toMap
    assert(r("ramp").getAs[Double]("trend_strength") == 1.0)
    assert(r("ramp").isNullAt(r("ramp").fieldIndex("seasonal_strength")))
    val w = r("wave")
    assert(w.getAs[Double]("seasonal_strength") > 0.9)
    assert(w.getAs[Double]("seasonal_strength") >
      w.getAs[Double]("trend_strength"))
  }

  test("Theil-Sen: one wild day cannot drag the median slope") {
    val s = spark
    import s.implicits._
    val base = ts("2024-01-01 00:00:00").getTime
    // v = 2·day + 5 except day 4 = 1000: 36 of 45 pair slopes are
    // exactly 2, so the median slope and intercept are untouched —
    // the least-squares fit would be dragged by ~+20/day
    val rows = (0 until 10).map { d =>
      val v = if (d == 4) 1000.0 else 2.0 * d + 5.0
      ("m", 1L, new Timestamp(base + d * 86400L * 1000 + 43200000L), v,
        d.toLong)
    }
    val r = Temporal.theilSenFrame(rows.toDF("name", "user_id", "ts",
      "value", "event_id")).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_days") == 10L)
    assert(r.head.getAs[Long]("n_pairs") == 45L)
    assert(r.head.getAs[Double]("slope_d") == 2.0)
    // icept = median(v − 2·(epoch-day index)); the day index is the
    // absolute epoch day, so recover the planted 5.0 by adding back
    val d0 = base / 1000 / 86400
    assert(r.head.getAs[Double]("icept_v") + 2.0 * d0 == 5.0)
  }

  test("forecast eval: seasonal-naive is exact on a 24h-periodic series") {
    val s = spark
    import s.implicits._
    val base = ts("2024-01-01 00:00:00").getTime
    val rows = (0 until 72).map { i =>
      ("m", 1L, new Timestamp(base + i * 3600L * 1000),
        (i % 24).toDouble, i.toLong)
    }
    val r = Temporal.forecastEvalFrame(rows.toDF("name", "user_id", "ts",
      "value", "event_id")).collect()
      .map(x => x.getAs[String]("method") ->
        ((x.getAs[Long]("n"), x.getAs[Double]("mae")))).toMap
    assert(r("snaive24") == ((48L, 0.0)), s"snaive: ${r("snaive24")}")
    assert(r("naive")._1 == 71L)
    assert(r("naive")._2 > 0.0)
    assert(r("drift")._1 == 70L)
  }

  test("SAX: low days map to low letters, flat series to the middle") {
    val s = spark
    import s.implicits._
    val base = ts("2024-01-01 00:00:00").getTime
    val wavy = (0 until 96).map { i =>
      val v = if (i < 48) 0.0 else 100.0   // 2 low days then 2 high days
      ("w", 1L, new Timestamp(base + i * 3600L * 1000), v, i.toLong)
    }
    val flat = (0 until 48).map { i =>
      ("f", 2L, new Timestamp(base + i * 3600L * 1000), 7.0, (100 + i).toLong)
    }
    val r = Temporal.saxFrame((wavy ++ flat)
      .toDF("name", "user_id", "ts", "value", "event_id"))
      .orderBy("name", "day_s").collect()
    val w = r.filter(_.getAs[String]("name") == "w")
      .map(_.getAs[String]("sax_char")).toSeq
    assert(w == Seq("a", "a", "d", "d"), s"wavy symbols $w")
    val f = r.filter(_.getAs[String]("name") == "f")
      .map(_.getAs[String]("sax_char")).toSeq
    assert(f.forall(_ == "c"), s"flat symbols $f") // z = 0 → middle
  }

  test("M4 downsampling keeps first/min/max/last per bucket") {
    val r = Temporal.m4Frame(counterSamples).collect()
    assert(r.length == 1)
    val x = r(0)
    assert(x.getAs[Long]("n") == 4)
    assert(x.getAs[Double]("v_first") == 10.0)
    assert(x.getAs[Double]("v_min") == 5.0)
    assert(x.getAs[Double]("v_max") == 25.0)
    assert(x.getAs[Double]("v_last") == 9.0)
  }

  test("m3tsz cost model: regular cadence compresses to ~1 bit/sample") {
    val s = spark
    import s.implicits._
    val base = ts("2024-01-01 00:00:00").getTime
    // regular 10 s cadence: 64 (first) + 9 (first delta) + 1·3 (dod=0)
    val regular = (0 until 5).map(i =>
      ("r", 1L, new Timestamp(base + i * 10000L), 1.0, i.toLong))
    // one 5000 s gap: its dod = 4990 falls in the 36-bit default bucket
    val irregular = regular :+
      (("r", 2L, new Timestamp(base), 1.0, 10L)) :+
      (("r", 2L, new Timestamp(base + 10000L), 1.0, 11L)) :+
      (("r", 2L, new Timestamp(base + 5010000L), 1.0, 12L))
    val r = Temporal.tszCost(irregular
      .toDF("name", "user_id", "ts", "value", "event_id"))
      .collect().map(x => x.getAs[Long]("user_id") -> x).toMap
    val reg = r(1L)
    assert(reg.getAs[Long]("total_bits") == 64 + 9 + 1 + 1 + 1)
    assert(reg.getAs[Long]("n_zero") == 3 && reg.getAs[Long]("n_b7") == 1)
    val irr = r(2L)
    assert(irr.getAs[Long]("n_default") == 1,
      s"expected one 36-bit sample: $irr")
    assert(irr.getAs[Long]("total_bits") == 64 + 9 + 36)
  }

  test("STL decomposition: linear series gives exact trend, zero residual") {
    val s = spark
    import s.implicits._
    val base = ts("2024-01-01 00:00:00").getTime
    val rows = (0 until 120).map { i =>
      ("m", 1L, new Timestamp(base + i * 3600L * 1000), i.toDouble, i.toLong)
    }
    val r = Temporal.stlFrame(rows.toDF("name", "user_id", "ts", "value",
      "event_id")).orderBy("bucket_s").collect()
    assert(r.length == 120)
    // edges (first/last 12 hours) have no full centered window
    assert(r.take(12).forall(_.isNullAt(r(0).fieldIndex("trend_v"))))
    assert(r.takeRight(12).forall(_.isNullAt(r(0).fieldIndex("trend_v"))))
    // interior: the 25-point centered MA of a linear ramp IS the ramp,
    // so trend == v, seasonal == 0, residual == 0
    val interior = r.slice(12, 108)
    assert(interior.forall(x =>
      x.getAs[Double]("trend_v") == x.getAs[Double]("v")))
    assert(interior.forall(x => math.abs(x.getAs[Double]("seasonal_v")) < 1e-9))
    assert(interior.forall(x => math.abs(x.getAs[Double]("resid_v")) < 1e-9))
  }

  test("index route equals the direct-scan matcher route") {
    val samples = Vectors.samples(Tables.events(spark, sf))
    val sets: Seq[Seq[Fetch.Matcher]] = Seq(
      Seq(Fetch.Matcher("name", Fetch.Eq, "purchase")),
      Seq(Fetch.Matcher("name", Fetch.Re, "cl.*"),
        Fetch.Matcher("user_id", Fetch.Re, "[0-9]*[02468]")),
      Seq(Fetch.Matcher("name", Fetch.NotEq, "purchase"),
        Fetch.Matcher("user_id", Fetch.NotRe, "1.*")),
      Seq(Fetch.Matcher("user_id", Fetch.Eq, "999983")))
    sets.foreach { ms =>
      val viaIndex = Index.indexMatch(samples, ms, Seq("name", "user_id"))
        .collect().map(_.toSeq).toSet
      val direct = samples
        .where(ms.map(Fetch.predicate).reduce(_ && _))
        .select(col("name").cast("string"), col("user_id").cast("string"))
        .distinct().collect().map(_.toSeq).toSet
      assert(viaIndex == direct, s"matcher set $ms diverged")
    }
  }

  test("matcher intersection plans smallest postings list first") {
    val samples = Vectors.samples(Tables.events(spark, sf))
    val series = samples
      .select(col("name").cast("string").as("name"),
        col("user_id").cast("string").as("user_id")).distinct()
    val post = Seq("name", "user_id").map { l =>
      series.where(col(l).isNotNull)
        .select(lit(l).as("label"), col(l).as("value"))
    }.reduce(_ unionByName _)
      .withColumn("sid", lit(1))
    val terms = post.select("label", "value").distinct()
    // a broad name regex (hundreds of postings) vs one exact user id
    // (a handful): m3ninx intersects smallest-first, so the exact
    // matcher must be planned ahead of the regex regardless of the
    // order the query wrote them in
    val ms = Seq(
      Fetch.Matcher("name", Fetch.Re, ".*"),
      Fetch.Matcher("user_id", Fetch.Eq,
        series.orderBy("user_id").limit(1).collect()(0).getString(1)))
    assert(Index.matcherOrder(post, terms, ms) == Seq(1, 0))
    assert(Index.matcherOrder(post, terms, ms.reverse) == Seq(0, 1))
    // equal sizes keep the written order (stable tie-break)
    assert(Index.matcherOrder(post, terms, Seq(ms.head, ms.head)) == Seq(0, 1))
  }

  test("postings sizes sum to series count per label") {
    val samples = Vectors.samples(Tables.events(spark, sf))
    val nSeries = samples.select("name", "user_id").distinct().count()
    val p = Index.postings(samples, Seq("name", "user_id")).collect()
    Seq("name", "user_id").foreach { l =>
      val tot = p.filter(_.getAs[String]("label") == l)
        .map(_.getAs[Long]("n_series")).sum
      assert(tot == nSeries, s"label $l postings don't cover the series")
    }
  }

  test("rate family: extrapolated delta/increase with counter reset") {
    // rate.go:150 hand-check — samples at 0/6/12/18h in a 24h window:
    // si=64800 s, avg spacing 21600, threshold 23760; d0=0 and
    // dEnd=21600 both under it → extrapolate to the full window,
    // factor 86400/64800 = 4/3. Reset 25→5 contributes prev=25:
    // res = 9−10+25 = 24; zero-point clamp inactive (d0=0).
    val r = Temporal.rateFrame(counterSamples).collect()(0)
    assert(r.getAs[Double]("delta_v") == -1.333333)    // (9−10)·4/3, round 6
    assert(r.getAs[Double]("increase_v") == 32.0)      // 24·4/3
    assert(math.abs(r.getAs[Double]("rate_v") - 32.0 / 86400) < 1e-9)
  }

  test("rate family: single-sample windows yield null (rate.go NaN)") {
    val s = spark
    import s.implicits._
    val one = Seq(("c", 1L, ts("2024-01-01 03:00:00"), 7.0, 0L))
      .toDF("name", "user_id", "ts", "value", "event_id")
    val r = Temporal.rateFrame(one).collect()(0)
    assert(r.isNullAt(r.fieldIndex("rate_v")) &&
      r.isNullAt(r.fieldIndex("delta_v")) &&
      r.isNullAt(r.fieldIndex("increase_v")))
  }

  test("irate: last two samples only") {
    val r = Temporal.irateFrame(counterSamples).collect()(0)
    assert(r.getAs[Double]("idelta_v") == 4.0)         // 9 − 5
    assert(math.abs(r.getAs[Double]("irate_v") - 4.0 / 21600) < 1e-9) // round(…,9)
  }

  test("resets and changes") {
    val r = Temporal.resetsChanges(counterSamples).collect()(0)
    assert(r.getAs[Long]("resets_v") == 1L)
    assert(r.getAs[Long]("changes_v") == 3L)
  }

  test("instant vector takes last sample in bucket deterministically") {
    val r = Vectors.instant(counterSamples).collect()(0)
    assert(r.getAs[Double]("value") == 9.0)
  }

  test("holt_winters matches the reference recurrence") {
    val vals = Seq(10.0, 25.0, 5.0, 9.0)
    val (sf0, tf0) = (0.3, 0.1)
    var s0 = vals(1); var b = vals(1) - vals(0)
    for (v <- vals.drop(2)) {
      val s1 = sf0 * v + (1 - sf0) * (s0 + b)
      b = tf0 * (s1 - s0) + (1 - tf0) * b
      s0 = s1
    }
    val r = Temporal.holtWinters(counterSamples, sf0, tf0).collect()(0)
    assert(math.abs(r.getAs[Double]("hw_v") - s0) < 1e-6)
  }

  test("anomaly: spike flags after warmup, cold start and normals don't") {
    val s = spark
    import s.implicits._
    // hours 0..23 alternate 10/12 (baseline mean 11, pop std 1),
    // hour 24 spikes to 100 → z = 89
    val pts = (0 until 24).map { h =>
      ("m", 1L, ts(f"2024-01-01 $h%02d:00:00"),
        if (h % 2 == 0) 10.0 else 12.0, h.toLong)
    } :+ (("m", 1L, ts("2024-01-02 00:00:00"), 100.0, 24L))
    val samples = pts.toDF("name", "user_id", "ts", "value", "event_id")
    val r = Temporal.anomalyFrame(samples).collect()
      .map(x => x.getAs[Long]("bucket_s") -> x).toMap.values
      .toSeq.sortBy(_.getAs[Long]("bucket_s"))
    val spike = r.last
    assert(spike.getAs[Double]("v") == 100.0)
    assert(spike.getAs[Long]("n_prev") == 24L)
    assert(math.abs(spike.getAs[Double]("z_v") - 89.0) < 1e-6)
    assert(spike.getAs[Int]("anomaly") == 1)
    // cold start: fewer than 6 trailing points → no z, no flag
    r.take(6).foreach { row =>
      assert(row.isNullAt(row.fieldIndex("z_v")))
      assert(row.getAs[Int]("anomaly") == 0)
    }
    // steady alternation: |z| = 1 well under the threshold
    val mid = r(10)
    assert(math.abs(math.abs(mid.getAs[Double]("z_v")) - 1.0) < 1e-6)
    assert(mid.getAs[Int]("anomaly") == 0)
  }

  test("seasonal: per-hour profile, in-sample spike flags, constant hour null") {
    val s = spark
    import s.implicits._
    // 21 days: hour 0 alternates 10/12 except day 20 = 200;
    // hour 1 constant 50 (zero variance → null z)
    val pts = (0 until 21).flatMap { d =>
      val day = f"2024-01-${d + 1}%02d"
      Seq(
        ("m", 1L, ts(s"$day 00:00:00"),
          if (d == 20) 200.0 else if (d % 2 == 0) 10.0 else 12.0,
          d.toLong * 2),
        ("m", 1L, ts(s"$day 01:00:00"), 50.0, d.toLong * 2 + 1))
    }
    val samples = pts.toDF("name", "user_id", "ts", "value", "event_id")
    val r = Temporal.seasonalFrame(samples).collect()
    val h0 = r.filter(_.getAs[Long]("hod") == 0L)
    val h1 = r.filter(_.getAs[Long]("hod") == 1L)
    assert(h0.forall(_.getAs[Long]("n_hod") == 21L))
    // hour-0 profile: (10·10 + 10·12 + 200)/21 = 20
    assert(h0.forall(_.getAs[Double]("prof_v") == 20.0))
    val spike = h0.find(_.getAs[Double]("v") == 200.0).get
    // var = (10·100 + 10·64 + 180²)/21 → z = 180/std ≈ 4.47
    val std = math.sqrt((10 * 100.0 + 10 * 64.0 + 180.0 * 180.0) / 21)
    assert(math.abs(spike.getAs[Double]("z_v") - 180.0 / std) < 1e-5)
    assert(spike.getAs[Int]("seasonal_anomaly") == 1)
    assert(h0.count(_.getAs[Int]("seasonal_anomaly") == 1) == 1)
    // constant hour: residual 0, z null, never flagged
    h1.foreach { row =>
      assert(row.getAs[Double]("resid_v") == 0.0)
      assert(row.isNullAt(row.fieldIndex("z_v")))
      assert(row.getAs[Int]("seasonal_anomaly") == 0)
    }
  }

  test("deriv: least-squares slope on a perfect line") {
    val s = spark
    import s.implicits._
    // value = 2·(hours since midnight) + 1 → slope 2/3600 per second
    val line = (0 until 5).map { h =>
      ("g", 1L, ts(f"2024-01-01 0$h:00:00"), 2.0 * h + 1, h.toLong)
    }.toDF("name", "user_id", "ts", "value", "event_id")
    val r = Temporal.linearRegression(line).collect()(0)
    assert(math.abs(r.getAs[Double]("deriv_v") - 2.0 / 3600) < 1e-9)
    // prediction at t = 25h from bucket start: 2·25 + 1
    assert(math.abs(r.getAs[Double]("predict_v") - 51.0) < 1e-6)
  }

  test("topk is deterministic under value ties") {
    val s = spark
    import s.implicits._
    val tied = Seq(
      ("m", 1L, 0L, 5.0), ("m", 2L, 0L, 5.0), ("m", 3L, 0L, 5.0),
      ("m", 4L, 0L, 5.0)).toDF("name", "user_id", "bucket_s", "value")
    val got = SeriesAgg.take(tied, 3, Seq("name"), Seq("user_id"), top = true)
      .select("user_id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(1L, 2L, 3L))
  }

  test("binary and/or/unless set semantics") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, 0L, 10.0), (2L, 0L, 20.0)).toDF("user_id", "bucket_s", "value")
    val r = Seq((2L, 0L, 99.0), (3L, 0L, 30.0)).toDF("user_id", "bucket_s", "value")
    assert(Binary.and(l, r, Seq("user_id")).collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(Binary.unless(l, r, Seq("user_id")).collect().map(_.getLong(0)).toSeq == Seq(1L))
    val or = Binary.or(l, r, Seq("user_id")).collect()
      .map(x => (x.getLong(0), x.getDouble(2))).toMap
    assert(or == Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0)) // lhs wins on 2
  }

  test("histogram_quantile interpolates within the target bucket") {
    val s = spark
    import s.implicits._
    // 10 samples uniform in (0,100]: q=0.5 → rank 5 in bucket (0,50] of 5
    val u = (1 to 10).map { i =>
      ("h", 1L, ts("2024-01-01 00:00:00"), i * 10.0, i.toLong)
    }.toDF("name", "user_id", "ts", "value", "event_id")
    val r = Transform.histogramQuantile(u, 0.5, Seq(50.0, 100.0)).collect()(0)
    assert(r.getAs[Double]("hq_v") == 50.0) // rank 5 = all of bucket 1
  }

  test("histogram_quantile: non-positive first bucket returns its bound") {
    val s = spark
    import s.implicits._
    // histogram_quantile.go:239 — a first bucket with le <= 0 can't
    // interpolate from an assumed 0 start; the bound itself returns
    val le = Seq(
      ("h", 0L, -1.0, 4.0),
      ("h", 0L, 2.0, 8.0),
      ("h", 0L, Double.PositiveInfinity, 10.0))
      .toDF("name", "bucket_s", "le", "value")
    val q2 = Transform.histogramQuantileLe(le, 0.2, Seq("name")).collect()(0)
    assert(q2.getAs[Double]("hq_v") == -1.0) // rank 2 lands in (-inf,-1]
    // and a rank past the first bucket still interpolates normally
    val q7 = Transform.histogramQuantileLe(le, 0.7, Seq("name")).collect()(0)
    assert(q7.getAs[Double]("hq_v") == -1.0 + 3.0 * (7.0 - 4.0) / 4.0)
  }

  test("restrict-by-tag overrides same-label matchers and strips tags") {
    import Fetch.{Matcher, Eq, Re, RestrictByTag}
    val caller = Seq(Matcher("name", Eq, "purchase"), Matcher("user_id", Eq, "7"))
    val r = RestrictByTag(Seq(Matcher("name", Re, "view|cart")))
    // same-label caller matcher dropped, restrict matcher appended
    assert(Fetch.mergeRestrict(caller, r) ==
      Seq(Matcher("user_id", Eq, "7"), Matcher("name", Re, "view|cart")))
    // strip defaults to the restricted labels; explicit strip wins
    assert(r.stripNames == Seq("name"))
    assert(RestrictByTag(r.restrict, strip = Seq("user_id")).stripNames ==
      Seq("user_id"))
    // end-to-end: restricted fetch returns only view|cart rows and
    // the name column is gone from the response
    val out = Fetch.withOptions(Vectors.samples(Tables.events(spark, sf)),
      caller.take(1), r)
    assert(!out.columns.contains("name"))
    val kept = Fetch(Vectors.samples(Tables.events(spark, sf)),
      Seq(Matcher("name", Re, "view|cart")))
    assert(out.count() == kept.count() && out.count() > 0)
  }

  test("completeTags: nameOnly mode and FilterNameTags") {
    import Fetch.{Matcher, Eq}
    val s = Vectors.samples(Tables.events(spark, sf))
    val nameOnly = Fetch.completeTags(s, Seq(Matcher("name", Eq, "view")),
      labelCols = Seq("name", "user_id"), nameOnly = true)
    assert(nameOnly.columns.toSeq == Seq("tag_name"))
    assert(nameOnly.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("name", "user_id"))
    val filtered = Fetch.completeTags(s, Nil,
      labelCols = Seq("name", "user_id"), filterNames = Seq("user_id"))
    assert(filtered.select("tag_name").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("user_id"))
  }

  test("downsample multi-res: coarse tier composes from fine tier") {
    val fineCoarse = Downsample.multiResolution(
      Vectors.samples(Tables.events(spark, sf)))
    val byRes = fineCoarse.groupBy("resolution")
      .agg(sum("count_v").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byRes("1h") == byRes("1d")) // same samples counted once each
  }

  test("policy stack: arbitrary tiers compose and trim retention") {
    val s = Vectors.samples(Tables.events(spark, sf))
    // each tier of the stack must equal a direct single-policy
    // rollup from raw — including 90s, which divides no finer tier
    // and falls back to the raw scan, and 1h, which composes 10m∘1m
    def direct(res: String) =
      Downsample.policyStack(s, Seq(Downsample.Policy(res)))
        .drop("resolution")
    val stack = Downsample.policyStack(s, Seq(
      Downsample.Policy("1m"), Downsample.Policy("10m"),
      Downsample.Policy("90s"), Downsample.Policy("1h")))
    for (res <- Seq("1m", "90s", "10m", "1h")) {
      val got = stack.where(col("resolution") === res).drop("resolution")
      val want = direct(res)
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"tier $res diverged from its direct rollup")
    }
    // retention floors each tier independently as of nowS
    val now = 1706745600L
    val trimmed = Downsample.policyStack(s, Seq(
      Downsample.Policy("1h", 7L * 86400L),
      Downsample.Policy("1d", 30L * 86400L)), nowS = Some(now))
    val minByRes = trimmed.groupBy("resolution")
      .agg(min("bucket_s").as("m")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(minByRes("1h") >= now - 7L * 86400L)
    assert(minByRes("1d") >= now - 30L * 86400L)
    assert(minByRes("1d") < now - 7L * 86400L,
      "the coarser tier should retain older history than the fine tier")
    Downsample.clearTierCache()
  }

  test("resolveTier replays the cluster_resolver decision table") {
    import Downsample._
    val now = 1000000L
    val stack = Seq(Policy("10m", 100L), Policy("1h", 500L),
      Policy("1d", 2000L))
    // 1. unaggregated retention covers the start → raw, full range
    //    (cluster_resolver_test.go FanoutUnaggregatedCoversRange shapes)
    assert(resolveTier(400L, stack, now, now - 300L) ==
      ((Unaggregated, CoversAll)))
    // 2. raw outrun → FINEST covering aggregated policy, not just any
    assert(resolveTier(200L, stack, now, now - 450L) ==
      ((Aggregated("1h", 500L), CoversAll)))
    //    start inside only the coarsest tier's retention
    assert(resolveTier(200L, stack, now, now - 1500L) ==
      ((Aggregated("1d", 2000L), CoversAll)))
    // 3. nothing covers → longest-retention aggregated, partial range
    assert(resolveTier(200L, stack, now, now - 5000L) ==
      ((Aggregated("1d", 2000L), CoversPartial)))
    //    ...but unaggregated preferred when its retention is >= the
    //    longest aggregated (Retention <= unaggregated at :257)
    assert(resolveTier(2000L, stack, now, now - 5000L) ==
      ((Unaggregated, CoversPartial)))
    assert(resolveTier(3000L, stack, now, now - 5000L) ==
      ((Unaggregated, CoversPartial)))
    // unbounded retention always covers
    assert(resolveTier(200L, Seq(Policy("1h")), now, 0L) ==
      ((Aggregated("1h", Long.MaxValue), CoversAll)))
    // related-query widening (cluster_resolver.go:98-107): a related
    // panel starting earlier drags namespace selection coarser so
    // both queries read the same tier
    // FanoutForceDisable: aggregated tiers out of contention — raw
    // serves the uncovered range, flagged partial
    assert(resolveTier(200L, stack, now, now - 1500L,
      fanoutAggregated = false) ==
      ((Downsample.Unaggregated, Downsample.CoversPartial)))
    assert(resolveTier(400L, stack, now, now - 300L,
      relatedStartsS = Seq(now - 450L)) ==
      ((Aggregated("1h", 500L), CoversAll)))
  }

  test("fetchAuto routes to the resolved tier and bounds the range") {
    val s = Vectors.samples(Tables.events(spark, sf))
    val now = 1706745600L
    val stack = Seq(
      Downsample.Policy("10m", 14L * 86400L),
      Downsample.Policy("1h", 30L * 86400L),
      Downsample.Policy("1d", 365L * 86400L))
    // aggregated route: equals the explicitly-pinned 1h tier over the
    // same stack, bounded to [start, now)
    val start = 1704931200L
    val auto = Downsample.fetchAuto(s, 7L * 86400L, stack, now, start)
    val pinned = Downsample.restrictByType(s,
      Downsample.Aggregated("1h", 30L * 86400L), now, policies = stack)
      .where(col("bucket_s") >= start && col("bucket_s") < now)
    assert(auto.exceptAll(pinned).isEmpty && pinned.exceptAll(auto).isEmpty)
    // raw route: recent start stays on the sample schema, floored at
    // max(start, now − retention)
    val recent = Downsample.fetchAuto(s, 7L * 86400L, stack, now,
      now - 3L * 86400L)
    assert(recent.columns.toSeq == s.columns.toSeq)
    val minTs = recent.agg(min(unix_timestamp(col("ts")))).collect()(0).getLong(0)
    assert(minTs >= now - 3L * 86400L)
    // series form: BOTH routes present the same (labels, ts, value)
    // schema, so the query engine composes with either
    val aggSeries = Downsample.fetchAutoSeries(s, 7L * 86400L, stack,
      now, start)
    val rawSeries = Downsample.fetchAutoSeries(s, 7L * 86400L, stack,
      now, now - 3L * 86400L)
    assert(aggSeries.columns.toSeq == rawSeries.columns.toSeq &&
      aggSeries.columns.toSeq == Seq("name", "user_id", "ts", "value"))
    // the aggregated series replays the tier's mean per bucket
    val one = aggSeries.limit(1).collect()(0)
    val direct = Downsample.restrictByType(s,
      Downsample.Aggregated("1h", 30L * 86400L), now, policies = stack)
      .where(col("name") === one.getString(0) &&
        col("user_id") === one.getLong(1) &&
        col("bucket_s") === one.getTimestamp(2).getTime / 1000)
      .collect()(0)
    assert(one.getDouble(3) == direct.getAs[Double]("mean_v"))
    Downsample.clearTierCache()
  }

  test("fanout fetch stitches at the latency boundary; zero latency degrades to the single route") {
    val s = Vectors.samples(Tables.events(spark, sf))
    val now = 1706745600L
    val start = 1704931200L
    val stack = Seq(
      Downsample.Policy("10m", 14L * 86400L),
      Downsample.Policy("1h", 30L * 86400L),
      Downsample.Policy("1d", 365L * 86400L))
    // no latency → byte-identical to the single-namespace series route
    val single = Downsample.fetchAutoSeries(s, 7L * 86400L, stack, now, start)
      .orderBy("name", "user_id", "ts").collect().toSeq
    val fan0 = Downsample.fetchFanoutSeries(s, 7L * 86400L, stack, now, start)
      .orderBy("name", "user_id", "ts").collect().toSeq
    assert(fan0 == single)
    // 2-day latency → aggregated buckets stop at the boundary, raw
    // rows cover [boundary, now); the branches are time-disjoint
    val boundary = now - 2L * 86400L
    val fan = Downsample.fetchFanoutSeries(s, 7L * 86400L, stack, now, start,
      aggLatencyS = 2L * 86400L)
    val aggMax = fan.where(unix_timestamp(col("ts")) % 3600 === 0 &&
      unix_timestamp(col("ts")) < boundary).count()
    val rawRows = fan.where(unix_timestamp(col("ts")) >= boundary).count()
    assert(aggMax > 0 && rawRows > 0)
    assert(fan.where(unix_timestamp(col("ts")) >= now).count() == 0)
    // raw branch carries the raw sample values: every post-boundary
    // row exists verbatim in the bounded sample frame
    val rawExpect = s.where(unix_timestamp(col("ts")) >= boundary &&
      unix_timestamp(col("ts")) < now).count()
    assert(rawRows == rawExpect)
    Downsample.clearTierCache()
  }

  test("pipeline transforms: Absolute, Reset's half-resolution zero, Increase drops") {
    val s = spark
    import s.implicits._
    val samples = Seq(
      ("m", 1L, 600L, 5.0), ("m", 1L, 1200L, -3.0))
      .toDF("name", "user_id", "ts_s", "value")
      .select(col("name"), col("user_id"),
        timestamp_seconds(col("ts_s")).as("ts"), col("value"),
        monotonically_increasing_id().as("event_id"))
    def run(transforms: Seq[String], aggs: Seq[String]) =
      Downsample.rollupTargets(samples, Seq(
        Downsample.RollupRule("r", Seq(Fetch.Matcher("name", Fetch.Eq, "m")),
          Seq(Downsample.RollupTarget("out", Downsample.GroupBy,
            Seq("user_id"), aggs, "hour", transforms = transforms)))))
        .collect().map(r => r.getAs[String]("agg") -> r.getAs[Double]("value"))
        .toMap
    // Absolute: |5| + |−3| = 8
    assert(run(Seq("Absolute"), Seq("sum"))("sum") == 8.0)
    // Reset doubles the datapoints (zero at ts + res/2 stays in the
    // hour bucket) and leaves the sum untouched
    val reset = run(Seq("Reset"), Seq("count", "sum"))
    assert(reset("count") == 4.0 && reset("sum") == 2.0)
    // Increase: no-prev first point dropped; the −8 diff dropped →
    // empty frame (matches binary.go's emptyDatapoint on both rules)
    assert(run(Seq("Increase"), Seq("sum")).isEmpty)
    // Add: running sum {5, 2}, last = 2
    assert(run(Seq("Add"), Seq("last"))("last") == 2.0)
  }

  test("m3 tag-filter grammar compiles to anchored matchers") {
    import Fetch._
    assert(tagsFilter("name:purchase") == Seq(Matcher("name", Eq, "purchase")))
    assert(tagsFilter("name:!purchase") ==
      Seq(Matcher("name", NotEq, "purchase")))
    assert(tagsFilter("name:pur* user_id:!{3,7}") == Seq(
      Matcher("name", Re, "pur.*"),
      Matcher("user_id", NotRe, "(?:3|7)")))
    assert(tagsFilter("name:p?r[a-z]hase") ==
      Seq(Matcher("name", Re, "p.r[a-z]hase")))
    // the contains form and the mid-wildcard form are both legal
    assert(tagsFilter("name:*cha*") == Seq(Matcher("name", Re, ".*cha.*")))
    assert(tagsFilter("name:pu*se") == Seq(Matcher("name", Re, "pu.*se")))
    // newWildcardFilter's invalid shapes and the parse rules throw
    intercept[IllegalArgumentException](tagsFilter("name:a*b*c"))
    intercept[IllegalArgumentException](tagsFilter("name:x name:y"))
    intercept[IllegalArgumentException](tagsFilter("name:"))
    intercept[IllegalArgumentException](tagsFilter(":pat"))
    intercept[IllegalArgumentException](tagsFilter("name:!"))
    // regex metachars in literals are escaped (RE2-compatible, no \\Q)
    val m = tagsFilter("name:a.b*").head
    assert(m == Matcher("name", Re, "a\\.b.*"))
    // rules construct from the config-form filter string
    val rule = Downsample.Rule.fromFilter("r", "name:pur*", "hour", Seq("sum"))
    assert(rule.matchers == Seq(Matcher("name", Re, "pur.*")))
    val rr = Downsample.RollupRule.fromFilter("rr", "name:{a,b}",
      Seq(Downsample.RollupTarget("t", Downsample.GroupBy, Nil,
        Seq("sum"), "day")), keepOriginal = true)
    assert(rr.matchers == Seq(Matcher("name", Re, "(?:a|b)")) &&
      rr.keepOriginal)
  }

  test("rollup targets rename, drop dims, and stay fetchable") {
    val s = spark
    import s.implicits._
    // two series of metric m (users 1,2), one of n (user 1); user_id
    // null on one extra m row to exercise the GroupBy presence rule
    val samples = Seq(
      ("m", Option(1L), 0L, 10.0), ("m", Option(2L), 0L, 20.0),
      ("m", Option.empty[Long], 0L, 70.0), ("n", Option(1L), 0L, 5.0))
      .toDF("name", "user_id", "ts_s", "value")
      .select(col("name"), col("user_id"),
        timestamp_seconds(col("ts_s")).as("ts"), col("value"),
        monotonically_increasing_id().as("event_id"))
    val out = Downsample.rollupTargets(samples, Seq(
      Downsample.RollupRule("r", Seq(Fetch.Matcher("name", Fetch.Eq, "m")),
        Seq(
          Downsample.RollupTarget("m_total", Downsample.GroupBy,
            Nil, Seq("sum"), "day"),
          Downsample.RollupTarget("{{ .MetricName }}_by_user",
            Downsample.GroupBy, Seq("user_id"), Seq("sum"), "day"),
          Downsample.RollupTarget("m_excl", Downsample.ExcludeBy,
            Seq("user_id"), Seq("count"), "day")))))
    val rows = out.collect().map(r => (r.getString(2),
      Option(r.get(3)).map(_.asInstanceOf[Long]),
      r.getString(5), r.getDouble(6))).toSet
    assert(rows == Set(
      // GroupBy []: everything (incl. the null-user row) into one series
      ("m_total", None, "sum", 100.0),
      // GroupBy [user_id]: the null-user row fails the presence rule
      // (active_ruleset.go:585 — a missing grouped-by tag = no match)
      ("m_by_user", Some(1L), "sum", 10.0),
      ("m_by_user", Some(2L), "sum", 20.0),
      // ExcludeBy [user_id]: always matches, null-user row included
      ("m_excl", None, "count", 3.0)))
    // renamed series are fetchable through the ordinary matcher path
    val fetched = Fetch(out, Seq(Fetch.Matcher("name", Fetch.Eq, "m_total")))
    assert(fetched.count() == 1)
    // template validation per NewRollupOp (pipeline/type.go:241-260)
    intercept[IllegalArgumentException](Downsample.rollupTargets(samples,
      Seq(Downsample.RollupRule("r", Nil, Seq(Downsample.RollupTarget(
        "{{ .MetricName }}_{{ .MetricName }}", Downsample.GroupBy,
        Nil, Seq("sum"), "day"))))))
    intercept[IllegalArgumentException](Downsample.rollupTargets(samples,
      Seq(Downsample.RollupRule("r", Nil, Seq(Downsample.RollupTarget(
        "{{ .Other }}_x", Downsample.GroupBy, Nil, Seq("sum"), "day"))))))
  }

  test("sketch percentiles bound rank error vs exact on a skewed window") {
    val s = spark
    import s.implicits._
    // one hot series with 20k samples in a single hourly window (the
    // skew shape that makes the exact collect_list buffer dangerous
    // at scale) — value == rank by construction, so rank error reads
    // directly off the value difference
    val n = 20000
    val rows = (1 to n).map(i => ("hot", 1L, (i % 3600).toLong, i.toDouble)) :+
      (("cold", 2L, 0L, 1.0))
    val samples = rows.toDF("name", "user_id", "off", "value")
      .select(col("name"), col("user_id"),
        timestamp_seconds(col("off")).as("ts"), col("value"),
        monotonically_increasing_id().as("event_id"))
    val exact = Downsample.rollup(samples, "hour")
      .where($"name" === "hot").head()
    val sketch = Downsample.rollup(samples, "hour",
      percentiles = Downsample.SketchAccuracy(1000))
      .where($"name" === "hot").head()
    for (c <- Seq("p50_v", "p95_v", "p99_v")) {
      val ex = exact.getAs[Double](c)
      val sk = sketch.getAs[Double](c)
      // percentile_approx at accuracy 1000 ⇒ rank error ≤ n/1000
      assert(math.abs(ex - sk) <= n / 1000.0 + 1, s"$c: exact=$ex sketch=$sk")
      // and the sketch returns a REAL sample, the CM-sketch property
      assert(sk == math.floor(sk) && sk >= 1 && sk <= n)
    }
    // non-percentile aggregates are identical across modes
    for (c <- Seq("sum_v", "count_v", "min_v", "max_v", "stdev_v"))
      assert(exact.getAs[Any](c) == sketch.getAs[Any](c))
    // the rule vocabulary takes the same mode
    val viaRules = Downsample.rollupRules(samples,
      Seq(Downsample.Rule("r", Seq(Fetch.Matcher("name", Fetch.Eq, "hot")),
        "hour", Seq("p99"))),
      percentiles = Downsample.SketchAccuracy(1000))
      .head().getAs[Double]("value")
    assert(math.abs(viaRules - exact.getAs[Double]("p99_v")) <= n / 1000.0 + 1)
  }

  test("series limit truncates whole series; RequireExhaustive throws") {
    val s = Vectors.samples(Tables.events(spark, sf))
    val fetched = Fetch(s, Seq(Fetch.Matcher("name", Fetch.Re, ".*")))
    val total = fetched.select("name", "user_id").distinct().count()
    assert(total > 3) // the limit below must actually bite
    val lim = Fetch.withSeriesLimit(fetched, 3)
    // exactly the first 3 identities by sorted (name, user_id) survive,
    // each with ALL its samples (whole-series truncation)
    val keptIds = lim.select("name", "user_id").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    val expect = fetched.select("name", "user_id").distinct()
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.take(3).toSeq
    assert(keptIds == expect)
    val perSeries = fetched.groupBy("name", "user_id").count().collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val limPerSeries = lim.groupBy("name", "user_id").count().collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(limPerSeries.forall { case (k, n) => perSeries(k) == n })
    // response metadata
    val meta = lim.select("total_series", "limited").distinct().collect()
    assert(meta.length == 1 && meta(0).getLong(0) == total &&
      meta(0).getInt(1) == 1)
    // RequireExhaustive refuses the truncated result — LAZILY: the
    // call builds a single-scan plan and the error fires when it
    // executes (fail at sink), not via an eager second count
    val lazyLim = Fetch.withSeriesLimit(fetched, 3, requireExhaustive = true)
    val ex = intercept[Throwable] { lazyLim.collect() }
    assert(messageChain(ex).exists(_.contains("ReturnedSeriesLimit=3")),
      s"expected the RequireExhaustive raise, got: $ex")
    // …even when the caller prunes away the stats columns — the gate
    // is a Filter on the stats frame, so ColumnPruning can't drop it
    val pruned = Fetch.withSeriesLimit(fetched, 3, requireExhaustive = true)
      .select("name", "user_id", "value")
    val ex2 = intercept[Throwable] { pruned.collect() }
    assert(messageChain(ex2).exists(_.contains("ReturnedSeriesLimit=3")),
      s"pruned select silently skipped the gate: $ex2")
    // …but passes when the limit doesn't bite
    val ok = Fetch.withSeriesLimit(fetched, total.toInt + 1,
      requireExhaustive = true)
    assert(ok.select("limited").distinct().collect()(0).getInt(0) == 0)
  }

  test("metadata limit caps the tag-search surfaces; exhaustive gate fires") {
    val s = Vectors.samples(Tables.events(spark, sf))
    val tags = Fetch.completeTags(s,
      Seq(Fetch.Matcher("name", Fetch.Re, ".*")),
      labelCols = Seq("name", "user_id"))
    val total = tags.count()
    assert(total > 4) // the cap below must bite
    val lim = Fetch.withMetadataLimit(tags, Seq("tag_name", "tag_value"), 4)
    val rows = lim.collect()
    assert(rows.length == 4)
    // the kept set is the first 4 by sorted key
    val expect = tags.collect()
      .map(r => (r.getString(0), r.getString(1))).sorted.take(4).toSeq
    assert(rows.map(r => (r.getString(0), r.getString(1))).sorted.toSeq
      == expect)
    // every row carries the response signals
    assert(rows.forall(r => r.getAs[Long]("total_results") == total &&
      r.getAs[Int]("limited") == 1))
    // RequireExhaustive refuses the truncated metadata lazily
    val ex = intercept[Throwable] {
      Fetch.withMetadataLimit(tags, Seq("tag_name", "tag_value"), 4,
        requireExhaustive = true).collect()
    }
    assert(messageChain(ex).exists(_.contains("SeriesMetadataLimit=4")),
      s"expected the RequireExhaustive raise, got: $ex")
    // …and passes untruncated with limited = 0
    val ok = Fetch.withMetadataLimit(tags, Seq("tag_name", "tag_value"),
      total.toInt + 1, requireExhaustive = true)
    assert(ok.count() == total &&
      ok.select("limited").distinct().collect()(0).getInt(0) == 0)
    // the same cap composes with seriesMatch (the /series surface)
    val sm = Fetch.seriesMatch(s,
      Seq(Seq(Fetch.Matcher("name", Fetch.Re, ".*"))),
      labelCols = Seq("name", "user_id"))
    val smLim = Fetch.withMetadataLimit(sm, Seq("name", "user_id"), 3)
    assert(smLim.count() == 3 &&
      smLim.select("limited").distinct().collect()(0).getInt(0) == 1)
  }

  test("datapoints limit keeps the longest whole-series prefix in budget") {
    val s = Vectors.samples(Tables.events(spark, sf))
    val fetched = Fetch(s, Seq(Fetch.Matcher("name", Fetch.Re, ".*")))
    val perSeries = fetched.groupBy("name", "user_id").count().collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val sortedIds = perSeries.keys.toSeq.sorted
    val budget = perSeries(sortedIds.head) + perSeries(sortedIds(1))
    // reference prefix: single-threaded cumsum over sorted identities
    var acc = 0L
    val expect = sortedIds.takeWhile { id => acc += perSeries(id); acc <= budget }
    val lim = Fetch.withDatapointsLimit(fetched, budget, shards = 4)
    val keptIds = lim.select("name", "user_id").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(keptIds == expect,
      s"two-phase prefix sum diverged: $keptIds vs $expect")
    // whole-series retention + metadata
    val limPerSeries = lim.groupBy("name", "user_id").count().collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(limPerSeries.forall { case (k, n) => perSeries(k) == n })
    assert(lim.select("limited").distinct().collect()(0).getInt(0) == 1)
    val lazyLim = Fetch.withDatapointsLimit(fetched, budget,
      requireExhaustive = true)
    val ex = intercept[Throwable] { lazyLim.collect() }
    assert(messageChain(ex).exists(_.contains(s"ReturnedDatapointsLimit=$budget")),
      s"expected the RequireExhaustive raise, got: $ex")
    // budget below the FIRST series: the kept set (and so the joined
    // result) is empty — the gate must still fire, which is why it
    // filters the stats frame rather than the joined rows
    val tiny = Fetch.withDatapointsLimit(fetched, 1, requireExhaustive = true)
    val ex2 = intercept[Throwable] { tiny.collect() }
    assert(messageChain(ex2).exists(_.contains("ReturnedDatapointsLimit=1")),
      s"empty kept set silently skipped the gate: $ex2")
  }

  /** Walk the cause chain — Spark wraps executor/broadcast raises. */
  private def messageChain(t: Throwable): Seq[String] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
      .flatMap(e => Option(e.getMessage)).toSeq
}
