package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, expr}
import graft.streaming.Ingest

class StreamingSpec extends SparkSpec {

  test("windowed rollup flushes closed windows in append mode") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[Ingest.Sample]
    val q = Ingest.startToMemory(s, mem.toDF(), "rollup_test")
    try {
      mem.addData(
        Ingest.Sample("click", 1L, Timestamp.valueOf("2024-01-01 00:10:00"), 5.0),
        Ingest.Sample("click", 1L, Timestamp.valueOf("2024-01-01 00:20:00"), 7.0))
      q.processAllAvailable()
      // advance watermark past the first window (1h window + 30m lateness)
      mem.addData(
        Ingest.Sample("click", 1L, Timestamp.valueOf("2024-01-01 02:00:00"), 1.0))
      q.processAllAvailable()
      val rows = s.sql("SELECT * FROM rollup_test").collect()
      assert(rows.length == 1) // only the closed 00:00 window emitted
      val r = rows(0)
      assert(r.getAs[Double]("sum_v") == 12.0)
      assert(r.getAs[Long]("count_v") == 2L)
      assert(r.getAs[Long]("bucket_s") == 1704067200L)
      // full m3 aggregation-type set: Last = latest by event time,
      // SumSq, Stdev via the reference's sumSq formula
      assert(r.getAs[Double]("last_v") == 7.0)
      assert(r.getAs[Double]("sumsq_v") == 74.0) // 25 + 49
      // sample stdev of {5,7} = √2
      assert(math.abs(r.getAs[Double]("stdev_v") - math.sqrt(2.0)) < 1e-9)
    } finally q.stop()
  }

  test("rollup resumes exactly-once from a checkpoint across a restart") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-ck").toString
    val (ck, out) = (s"$base/ck", s"$base/out")
    val mem = MemoryStream[Ingest.Sample]
    def start() = Ingest.windowedRollup(mem.toDF())
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ck)
      .outputMode("append").start()
    // run 1: open the 00:00 window, then kill the query with the
    // window still open — its state lives only in the checkpoint
    val q1 = start()
    try {
      mem.addData(
        Ingest.Sample("click", 1L, Timestamp.valueOf("2024-01-01 00:10:00"), 5.0),
        Ingest.Sample("click", 1L, Timestamp.valueOf("2024-01-01 00:20:00"), 7.0))
      q1.processAllAvailable()
    } finally q1.stop()
    // run 2: a NEW query from the same checkpoint must restore the
    // open window's state, absorb one more pre-watermark sample, and
    // flush the window exactly once when the watermark passes
    val q2 = start()
    try {
      mem.addData(
        Ingest.Sample("click", 1L, Timestamp.valueOf("2024-01-01 00:40:00"), 3.0),
        Ingest.Sample("click", 1L, Timestamp.valueOf("2024-01-01 02:00:00"), 1.0))
      q2.processAllAvailable()
    } finally q2.stop()
    val rows = s.read.parquet(out).where(col("bucket_s") === 1704067200L).collect()
    assert(rows.length == 1, s"closed window must flush exactly once: ${rows.toSeq}")
    // 5+7 from before the restart, +3 absorbed after — one window row
    assert(rows(0).getAs[Double]("sum_v") == 15.0)
    assert(rows(0).getAs[Long]("count_v") == 3L)
  }

  test("stdev/last/median rule aggregates flush per window") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val rules = Seq(graft.tsdb.Downsample.Rule("timers_hourly",
      Seq(graft.tsdb.Fetch.Matcher("name", graft.tsdb.Fetch.Eq, "timer")),
      "hour", Seq("last", "sum_sq", "stdev", "median")))
    val mem = MemoryStream[Ingest.Sample]
    val q = Ingest.ruleRollup(mem.toDF(), rules)
      .writeStream.outputMode("append").format("memory")
      .queryName("stdev_rule_test").start()
    try {
      mem.addData(
        Ingest.Sample("timer", 1L, Timestamp.valueOf("2024-01-01 00:10:00"), 3.0),
        Ingest.Sample("timer", 1L, Timestamp.valueOf("2024-01-01 00:20:00"), 9.0))
      q.processAllAvailable()
      mem.addData(
        Ingest.Sample("timer", 1L, Timestamp.valueOf("2024-01-01 02:00:00"), 1.0))
      q.processAllAvailable()
      val got = s.sql(
        "SELECT agg, value FROM stdev_rule_test WHERE bucket_s = 1704067200")
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got("last") == 9.0)
      assert(got("sum_sq") == 90.0)
      assert(math.abs(got("stdev") - math.sqrt(18.0)) < 1e-9) // samp stdev {3,9}
      assert(got("median") == 3.0 || got("median") == 9.0)
    } finally q.stop()
  }

  test("sliding rollup emits one row per covering step window") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[Ingest.Sample]
    val q = Ingest.slidingRollup(mem.toDF())
      .writeStream.outputMode("append").format("memory")
      .queryName("sliding_test").start()
    try {
      mem.addData(
        Ingest.Sample("click", 1L, Timestamp.valueOf("2024-01-01 00:10:00"), 5.0))
      q.processAllAvailable()
      mem.addData( // push watermark far past every covering window
        Ingest.Sample("click", 1L, Timestamp.valueOf("2024-01-01 06:00:00"), 1.0))
      q.processAllAvailable()
      val rows = s.sql(
        "SELECT * FROM sliding_test WHERE bucket_s <= 1704070800").collect()
      // 1h lookback / 15m step → the 00:10 sample closes 4 windows
      // (ends 00:15, 00:30, 00:45, 01:00)
      assert(rows.length == 4, rows.mkString(","))
      assert(rows.forall(_.getAs[Double]("sum_v") == 5.0))
    } finally q.stop()
  }

  test("windowed rollup flushes sketch percentiles per window") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[Ingest.Sample]
    val q = Ingest.startToMemory(s, mem.toDF(), "pctl_test")
    try {
      // 1..100 spread inside the 00:00 window
      mem.addData((1 to 100).map(i => Ingest.Sample("timer", 1L,
        Timestamp.valueOf(f"2024-01-01 00:${(i - 1) % 60}%02d:00"), i.toDouble)): _*)
      q.processAllAvailable()
      mem.addData( // watermark past window end + lateness → flush
        Ingest.Sample("timer", 1L, Timestamp.valueOf("2024-01-01 02:00:00"), 1.0))
      q.processAllAvailable()
      val r = s.sql("SELECT * FROM pctl_test WHERE bucket_s = 1704067200").collect()(0)
      // accuracy=1000 ⇒ rank error ≤ n/1000 = 0.1 ⇒ exact at n=100
      assert(math.abs(r.getAs[Double]("p50_v") - 50.0) <= 1.0)
      assert(math.abs(r.getAs[Double]("p95_v") - 95.0) <= 1.0)
      assert(math.abs(r.getAs[Double]("p99_v") - 99.0) <= 1.0)
    } finally q.stop()
  }

  test("streaming sketch percentiles track batch-exact within the rank bound") {
    val s = spark
    import s.implicits._
    // windowedRollup is the same column algebra in batch: run it over
    // n=1000 skewed values and bound it against Downsample.rollup's
    // exact percentile on identical data. eps = 1/1000 ⇒ rank error
    // ≤ 1 ⇒ the sketch value sits within one order statistic of exact.
    val vals = (1 to 1000).map(i => math.pow(i.toDouble, 1.7))
    val samples = vals.zipWithIndex.map { case (v, i) =>
      Ingest.Sample("timer", 1L,
        Timestamp.valueOf(f"2024-01-01 00:${i % 60}%02d:${(i / 60) % 60}%02d"), v)
    }.toDS().toDF()
    val approx = Ingest.windowedRollup(samples).collect()(0)
    val sorted = vals.sorted
    for ((p, c) <- Seq(0.5 -> "p50_v", 0.95 -> "p95_v", 0.99 -> "p99_v")) {
      val rank = math.ceil(p * 1000).toInt
      // exact ±1 order statistic (rank error ≤ n·eps = 1)
      val lo = sorted(math.max(rank - 2, 0))
      val hi = sorted(math.min(rank, 999))
      val got = approx.getAs[Double](c)
      assert(got >= lo && got <= hi, s"$c=$got outside [$lo,$hi]")
    }
  }

  test("rule rollup applies per-rule matchers, resolutions and agg sets") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val rules = Seq(
      graft.tsdb.Downsample.Rule("clicks_hourly",
        Seq(graft.tsdb.Fetch.Matcher("name", graft.tsdb.Fetch.Eq, "click")),
        "hour", Seq("sum", "count", "p95")),
      graft.tsdb.Downsample.Rule("all_daily",
        Seq(graft.tsdb.Fetch.Matcher("name", graft.tsdb.Fetch.Re, ".*")),
        "day", Seq("max")))
    val mem = MemoryStream[Ingest.Sample]
    val q = Ingest.ruleRollup(mem.toDF(), rules)
      .writeStream.outputMode("append").format("memory")
      .queryName("rules_test").start()
    try {
      mem.addData(
        Ingest.Sample("click", 1L, Timestamp.valueOf("2024-01-01 00:10:00"), 5.0),
        Ingest.Sample("buy", 2L, Timestamp.valueOf("2024-01-01 00:20:00"), 9.0))
      q.processAllAvailable()
      mem.addData( // close both the hourly and the daily windows
        Ingest.Sample("click", 1L, Timestamp.valueOf("2024-01-03 00:00:00"), 1.0))
      q.processAllAvailable()
      val rows = s.sql("SELECT rule, name, agg, value FROM rules_test").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3)))
        .toSet
      assert(rows.contains(("clicks_hourly", "click", "sum", 5.0)))
      assert(rows.contains(("clicks_hourly", "click", "count", 1.0)))
      assert(rows.contains(("clicks_hourly", "click", "p95", 5.0)))
      assert(rows.contains(("all_daily", "click", "max", 5.0)))
      assert(rows.contains(("all_daily", "buy", "max", 9.0)))
      assert(!rows.exists { case (rule, name, _, _) =>
        rule == "clicks_hourly" && name == "buy" }) // matcher filtered
    } finally q.stop()
  }

  test("ingest dedup drops at-least-once duplicates within the watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[Ingest.Sample]
    val q = Ingest.dedupIngest(mem.toDF())
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_ingest_test").start()
    try {
      val sample = Ingest.Sample("click", 1L,
        Timestamp.valueOf("2024-01-01 00:10:00"), 5.0)
      mem.addData(sample, sample) // duplicate inside one batch
      q.processAllAvailable()
      mem.addData(sample)         // redelivery in a later batch
      q.processAllAvailable()
      val n = s.sql("SELECT count(*) FROM dedup_ingest_test").collect()(0).getLong(0)
      assert(n == 1L, s"expected single deduped sample, got $n")
    } finally q.stop()
  }

  test("carbon lines parse + consolidate under readStream") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[String]
    // the same column algebra as batch: parse → filter → hourly agg,
    // complete mode (consolidation is an unbounded-state aggregation;
    // production would watermark on ts like Ingest.startToMemory)
    val q = graft.sources.Carbon.toPathFrame(
        graft.sources.Carbon.parse(mem.toDF().toDF("line")))
      .writeStream.outputMode("complete").format("memory")
      .queryName("carbon_stream_test").start()
    try {
      mem.addData(
        "m.a 10 1704067200",
        "m.a 20 1704067800",
        "m.a garbage 1704067800")
      q.processAllAvailable()
      val rows = s.sql("SELECT * FROM carbon_stream_test").collect()
        .map(r => r.getLong(1) -> r.getDouble(2)).toMap
      assert(rows == Map(1704067200L -> 15.0))
    } finally q.stop()
  }

  test("carbon ruleset routing runs under foreachBatch, batch-parity") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import graft.sources.Carbon
    val rules = Seq(
      Carbon.CarbonRule(contains = Some("error"),
        aggregationEnabled = false, policies = Seq((60L, 86400L)),
        continueMatching = true),
      Carbon.CarbonRule(pattern = Some(".*"),
        aggregationType = "sum", policies = Seq((3600L, 86400L))))
    val lines = Seq(
      "svc.error.count 5 1704067200",
      "svc.ok.count 10 1704067200",
      "svc.ok.count 20 1704067800")
    // the streaming ingester: per micro-batch, the SAME route()
    // column algebra (checkpoint-free on streams), collected via
    // foreachBatch — the per-datapoint downsampled increments the
    // reference's ingester hands its DownsamplerAndWriter
    val got = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Long, Double)]
    val mem = MemoryStream[String]
    val q = Carbon.parse(mem.toDF().toDF("line"))
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= Carbon.route(b, rules, nowS = 1704067200L).collect()
          .map(r => (r.getString(0), r.getInt(1),
            r.getAs[Long]("bucket_s"), r.getAs[Double]("value")))
        ()
      }.start()
    try {
      mem.addData(lines: _*)
      q.processAllAvailable()
    } finally q.stop()
    val batch = Carbon.route(Carbon.parse(lines.toDF("line")),
        rules, nowS = 1704067200L).collect()
      .map(r => (r.getString(0), r.getInt(1),
        r.getAs[Long]("bucket_s"), r.getAs[Double]("value")))
    assert(got.toSet == batch.toSet,
      s"stream ${got.toSet} != batch ${batch.toSet}")
    assert(batch.nonEmpty)
  }

  test("exposition scrape lines parse + consolidate under readStream") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[String]
    // the live scrape-tail claim in Exposition's scaladoc: the same
    // column algebra as batch, complete-mode consolidation
    val q = graft.sources.Exposition.toSeriesFrame(
        graft.sources.Exposition.parse(mem.toDF().toDF("line")), "user")
      .writeStream.outputMode("complete").format("memory")
      .queryName("expo_stream_test").start()
    try {
      mem.addData(
        "# TYPE m gauge",
        "m{user=\"1\"} 10 1704067200000",
        "m{user=\"1\"} 20 1704067800000",
        "m{user=\"1\"} untimestamped-garbage")
      q.processAllAvailable()
      val rows = s.sql("SELECT * FROM expo_stream_test").collect()
        .map(r => r.getAs[Long]("bucket_s") -> r.getAs[Double]("value"))
        .toMap
      assert(rows == Map(1704067200L -> 15.0))
    } finally q.stop()
  }

  test("influx wire → rules → rollup runs end-to-end under readStream") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[String]
    // the full m3 write path: line protocol in, per-rule watermarked
    // windowed aggregates out — all one streaming plan
    val samples = graft.sources.InfluxLine.parse(mem.toDF().toDF("line"))
      .where(!col("malformed"))
      .select(col("name"),
        expr("try_element_at(tags, 'user_id')").cast("long").as("user_id"),
        col("ts"), col("value"))
    val rules = Seq(graft.tsdb.Downsample.Rule("cpu_hourly",
      Seq(graft.tsdb.Fetch.Matcher("name", graft.tsdb.Fetch.Re, "cpu_.*")),
      "hour", Seq("sum", "count")))
    val q = Ingest.ruleRollup(samples, rules, lateness = "10 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("influx_rules_test").start()
    try {
      mem.addData(
        "cpu,user_id=1 usage=10.0 1704067200000000000",  // 00:00
        "cpu,user_id=1 usage=20.0 1704068100000000000",  // 00:15
        "mem,user_id=1 used=99.0 1704067200000000000",   // filtered by rule
        "cpu,user_id=1 usage=1.0 1704074400000000000")   // 02:00 → watermark
      q.processAllAvailable()
      mem.addData("cpu,user_id=1 usage=5.0 1704078000000000000") // advance
      q.processAllAvailable()
      val rows = s.sql("SELECT * FROM influx_rules_test").collect()
        .map(r => (r.getAs[String]("name"), r.getAs[Long]("bucket_s"),
          r.getAs[String]("agg")) -> r.getAs[Double]("value")).toMap
      // hour 00:00 flushed once the watermark passed its end
      assert(rows(("cpu_usage", 1704067200L, "sum")) == 30.0)
      assert(rows(("cpu_usage", 1704067200L, "count")) == 2.0)
      assert(!rows.keys.exists(_._1 == "mem_used"), "rule matcher leaked")
    } finally q.stop()
  }

  test("stateless text ops run unchanged under readStream") {
    // the quality/filter family is pure column algebra — the same
    // operator objects run on a stream in append mode with no
    // rewrite, the write-path form of a streaming curation pipeline
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = Seq(
      (1L, ("w " * 60).trim),
      (2L, "short doc with { brace")) // fails the C4 gate
    val q = pipeline.TextAnalysis.c4Filters(mem.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append").format("memory")
      .queryName("text_stream_test").start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
      val streamed = s.sql("SELECT doc_id, c4_pass FROM text_stream_test")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val batch = pipeline.TextAnalysis.c4Filters(docs.toDF("doc_id", "text"))
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("c4_pass")).toMap
      assert(streamed == batch && streamed == Map(1L -> 1, 2L -> 0))
    } finally q.stop()
    // the hashed-feature classifier is the same class of pure
    // projection (literal-array model, sequential fold) — stream
    // scores must be bit-equal to batch scores
    val mem2 = MemoryStream[(Long, String)]
    val q2 = pipeline.TextAnalysis.qualityClassifier(
      mem2.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append").format("memory")
      .queryName("classifier_stream_test").start()
    try {
      mem2.addData(docs: _*)
      q2.processAllAvailable()
      val streamed = s.sql(
        "SELECT doc_id, quality_score, keep FROM classifier_stream_test")
        .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getInt(2)))).toMap
      val batch = pipeline.TextAnalysis.qualityClassifier(
        docs.toDF("doc_id", "text"))
        .collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Double]("quality_score"), r.getAs[Int]("keep")))).toMap
      assert(streamed == batch)
    } finally q2.stop()
  }

  test("chunker runs unchanged under readStream (stateless fan-out)") {
    // posexplode fan-out is stateless — arriving long docs chunk in
    // append mode with the batch operator verbatim
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = Seq((1L, ("tok " * 100).trim), (2L, "tiny doc"))
    val q = pipeline.Corpus.chunk(mem.toDF().toDF("doc_id", "text"), 64, 16)
      .writeStream.outputMode("append").format("memory")
      .queryName("chunk_stream_test").start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
      val streamed = s.sql(
          "SELECT doc_id, chunk_idx, n_tok, chunk_md5 FROM chunk_stream_test")
        .collect().map(_.toSeq).toSet
      val batch = pipeline.Corpus.chunk(docs.toDF("doc_id", "text"), 64, 16)
        .select("doc_id", "chunk_idx", "n_tok", "chunk_md5")
        .collect().map(_.toSeq).toSet
      assert(streamed == batch)
      // 100 tokens, window 64, stride 48 → starts 0 and 48
      assert(streamed.count(_.head == 1L) == 2)
    } finally q.stop()
  }

  test("counter tracking maintains cumulative + resets across batches") {
    val s = spark
    import s.implicits._
    val batch = Seq(
      Ingest.Sample("c", 1L, Timestamp.valueOf("2024-01-01 00:00:00"), 10.0),
      Ingest.Sample("c", 1L, Timestamp.valueOf("2024-01-01 00:01:00"), 25.0),
      Ingest.Sample("c", 1L, Timestamp.valueOf("2024-01-01 00:02:00"), 5.0),
      Ingest.Sample("c", 1L, Timestamp.valueOf("2024-01-01 00:03:00"), 9.0)).toDS()
    val out = Ingest.counterTrack(batch).collect()(0)
    assert(out.cumulative == 24.0) // +15, reset(+5), +4
    assert(out.resets == 1)
  }

  test("bloom history probe dedups arriving micro-batches") {
    // the streaming role dedup_bloom is built for: history accumulates
    // across batches, each arriving batch probes the fixed-size bloom
    // of everything before it via foreachBatch — the loop a
    // continuously-crawled corpus runs on every drop
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[(Long, String)]
    var history: Option[org.apache.spark.sql.DataFrame] = None
    val results = scala.collection.concurrent.TrieMap.empty[Long, (Int, Int)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val b = batch.localCheckpoint(true)
        history match {
          case Some(h) =>
            val union = h.withColumn("is_new", lit(0))
              .unionByName(b.withColumn("is_new", lit(1)))
            pipeline.Dedup.bloomDedup(union, col("is_new") === 1)
              .collect().foreach(r => results(r.getAs[Long]("doc_id")) =
                (r.getAs[Int]("might_dup"), r.getAs[Int]("novel")))
            history = Some(h.unionByName(b).localCheckpoint(true))
          case None => // first drop seeds history; nothing to probe
            history = Some(b)
        }
      }.start()
    try {
      mem.addData((1L, "alpha"), (2L, "beta"))
      q.processAllAvailable()
      mem.addData((3L, "alpha"), (4L, "gamma")) // 3 repeats history doc 1
      q.processAllAvailable()
      assert(results(3L) == ((1, 0))) // flagged, genuinely not novel
      assert(results(4L)._2 == 1)     // fresh doc stays novel
      mem.addData((5L, "gamma"))      // dup of a SECOND-batch doc
      q.processAllAvailable()
      assert(results(5L) == ((1, 0))) // history grew across batches
    } finally q.stop()
  }

  test("session_window groupBy runs under readStream with a watermark") {
    // the q_sessionize aggregation verbatim, on a stream: merging-
    // sessions state per user, closed sessions flush in append mode
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val q = mem.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 6).as("sum_value"))
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_stream_test").start()
    try {
      mem.addData(
        (1L, Timestamp.valueOf("2024-01-01 00:00:00"), 1.0),
        (1L, Timestamp.valueOf("2024-01-01 00:10:00"), 2.0),  // merges
        (1L, Timestamp.valueOf("2024-01-01 02:00:00"), 4.0))  // new session
      q.processAllAvailable()
      // advance the watermark far enough to close both sessions
      mem.addData((9L, Timestamp.valueOf("2024-01-02 00:00:00"), 0.0))
      q.processAllAvailable()
      val rows = s.sql(
        "SELECT n_events, sum_value FROM sess_stream_test ORDER BY 1")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
      assert(rows == List((1L, 4.0), (2L, 3.0)))
    } finally q.stop()
  }

  test("streaming transforms carry state across batches, match batch semantics") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[Ingest.Sample]
    val q = Ingest.transformStream(mem.toDS(), "Increase")
      .writeStream.outputMode("append").format("memory")
      .queryName("transform_stream_test").start()
    try {
      // batch 1: first point dropped (no prev), then +2
      mem.addData(
        Ingest.Sample("c", 1L, Timestamp.valueOf("2024-01-01 00:00:10"), 5.0),
        Ingest.Sample("c", 1L, Timestamp.valueOf("2024-01-01 00:00:20"), 7.0))
      q.processAllAvailable()
      // batch 2: prev carried ACROSS the batch boundary (+3), then a
      // counter reset (negative diff) dropped, then +4 from the reset
      mem.addData(
        Ingest.Sample("c", 1L, Timestamp.valueOf("2024-01-01 00:00:30"), 10.0),
        Ingest.Sample("c", 1L, Timestamp.valueOf("2024-01-01 00:00:40"), 1.0),
        Ingest.Sample("c", 1L, Timestamp.valueOf("2024-01-01 00:00:50"), 5.0))
      q.processAllAvailable()
      val got = s.sql("SELECT value FROM transform_stream_test ORDER BY ts")
        .collect().map(_.getDouble(0)).toSeq
      assert(got == Seq(2.0, 3.0, 4.0), got)
    } finally q.stop()
    // PerSecond over the same shape: diffs divided by the 10 s gaps
    val mem2 = MemoryStream[Ingest.Sample]
    val q2 = Ingest.transformStream(mem2.toDS(), "PerSecond")
      .writeStream.outputMode("append").format("memory")
      .queryName("persecond_stream_test").start()
    try {
      mem2.addData(
        Ingest.Sample("c", 1L, Timestamp.valueOf("2024-01-01 00:00:10"), 5.0),
        Ingest.Sample("c", 1L, Timestamp.valueOf("2024-01-01 00:00:20"), 7.0),
        Ingest.Sample("c", 1L, Timestamp.valueOf("2024-01-01 00:00:40"), 13.0))
      q2.processAllAvailable()
      val got = s.sql("SELECT value FROM persecond_stream_test ORDER BY ts")
        .collect().map(_.getDouble(0)).toSeq
      assert(got == Seq(0.2, 0.3), got)
    } finally q2.stop()
    // Add: running sum; Absolute/Reset: stateless forms
    val mem3 = MemoryStream[Ingest.Sample]
    val q3 = Ingest.transformStream(mem3.toDS(), "Add")
      .writeStream.outputMode("append").format("memory")
      .queryName("add_stream_test").start()
    try {
      mem3.addData(
        Ingest.Sample("c", 1L, Timestamp.valueOf("2024-01-01 00:00:10"), 5.0))
      q3.processAllAvailable()
      mem3.addData(
        Ingest.Sample("c", 1L, Timestamp.valueOf("2024-01-01 00:00:20"), 2.0))
      q3.processAllAvailable()
      val got = s.sql("SELECT value FROM add_stream_test ORDER BY ts")
        .collect().map(_.getDouble(0)).toSeq
      assert(got == Seq(5.0, 7.0), got)
    } finally q3.stop()
  }

  test("streaming rollup targets match the batch replay row-for-row") {
    import graft.tsdb.{Downsample, Fetch}
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val rules = Seq(Downsample.RollupRule("svc",
      Seq(Fetch.Matcher("name", Fetch.Re, "(m|n)")),
      Seq(
        Downsample.RollupTarget("events_total", Downsample.GroupBy,
          Nil, Seq("sum", "count"), "hour"),
        Downsample.RollupTarget("{{ .MetricName }}_by_user",
          Downsample.GroupBy, Seq("user_id"), Seq("sum"), "hour"),
        Downsample.RollupTarget("all_excl", Downsample.ExcludeBy,
          Seq("user_id"), Seq("max"), "hour"))))
    val mem = MemoryStream[Ingest.Sample]
    val q = Ingest.targetRollup(mem.toDF(), rules)
      .writeStream.outputMode("append").format("memory")
      .queryName("target_rollup_test").start()
    try {
      val inWindow = Seq(
        ("m", 1L, "2024-01-01 00:10:00", 3.0),
        ("m", 2L, "2024-01-01 00:20:00", 5.0),
        ("n", 1L, "2024-01-01 00:40:00", 7.0))
      mem.addData(inWindow.map { case (n, u, t, v) =>
        Ingest.Sample(n, u, Timestamp.valueOf(t), v) }: _*)
      q.processAllAvailable()
      // push the watermark past the window so it flushes
      mem.addData(Ingest.Sample("m", 1L,
        Timestamp.valueOf("2024-01-01 03:00:00"), 1.0))
      q.processAllAvailable()
      def canon(rows: Array[org.apache.spark.sql.Row]) = rows.map { r =>
        (r.getString(0), r.getString(1), r.getString(2),
          Option(r.get(3)).map(_.toString).getOrElse("∅"),
          r.getLong(4), r.getString(5), r.getDouble(6))
      }.sorted.toSeq
      val streamed = canon(s.sql(
        """SELECT rule, resolution, name, user_id, bucket_s, agg, value
          | FROM target_rollup_test WHERE bucket_s = 1704067200"""
          .stripMargin).collect())
      // batch replay of the SAME closed-window samples through
      // Downsample.rollupTargets — identical long-format rows
      val batchIn = inWindow.toDF("name", "user_id", "ts_s", "value")
        .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
      val batch = canon(Downsample.rollupTargets(batchIn, rules,
        labelCols = Seq("name", "user_id"))
        .select("rule", "resolution", "name", "user_id",
          "bucket_s", "agg", "value").collect())
      assert(streamed == batch,
        s"stream/batch divergence:\n$streamed\nvs\n$batch")
      // spot-check the collapse semantics: GroupBy [] folds both
      // metrics into one literal-named series; ExcludeBy [user_id]
      // (the only dim) likewise collapses across users and metrics
      val m = streamed.map(t => (t._3, t._6) -> t._7).toMap
      assert(m(("events_total", "sum")) == 15.0)
      assert(m(("events_total", "count")) == 3.0)
      assert(m(("all_excl", "max")) == 7.0)
      // the template target keeps user_id: one series per (metric, user)
      val byUser = streamed.filter(t => t._3 == "m_by_user" && t._6 == "sum")
        .map(t => t._4 -> t._7).toMap
      assert(byUser == Map("1" -> 3.0, "2" -> 5.0))
      assert(m(("n_by_user", "sum")) == 7.0)
    } finally q.stop()
  }

  test("streaming z-score: cross-batch ring state, warmup guard, spike flags") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import graft.streaming.Ingest.Sample
    val ts = (m: Int) =>
      java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val pts = (0 until 7).map(i =>
      Sample("m", 1L, ts(i), if (i % 2 == 0) 1.0 else 3.0)) :+
      Sample("m", 1L, ts(7), 100.0)
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Sample]
    val q = graft.streaming.StreamAnomaly.zScores(mem.toDS())
      .writeStream.format("memory").queryName("stream_z")
      .outputMode("append").start()
    try {
      // split mid-history: state must carry the ring across batches
      mem.addData(pts.take(4): _*)
      q.processAllAvailable()
      mem.addData(pts.drop(4): _*)
      q.processAllAvailable()
      val r = s.sql("SELECT * FROM stream_z ORDER BY ts").collect()
      assert(r.length == 8)
      // first 6 points: fewer than minPrev trailing → NaN z, no flag
      r.take(6).foreach { row =>
        assert(row.getAs[Double]("z_v").isNaN)
        assert(row.getAs[Int]("anomaly") == 0)
      }
      // point 7 scores against [1,3,1,3,1,3]: mean 2, std 1 → z = −1
      assert(math.abs(r(6).getAs[Double]("z_v") - -1.0) < 1e-6)
      assert(r(6).getAs[Int]("anomaly") == 0)
      // point 8 (value 100) against the 7-point ring: z ≈ 99.1, flagged
      val buf = pts.take(7).map(_.value)
      val mean = buf.sum / 7
      val std = math.sqrt(buf.map(v => (v - mean) * (v - mean)).sum / 7)
      assert(math.abs(r(7).getAs[Double]("z_v") - (100.0 - mean) / std) < 1e-4)
      assert(r(7).getAs[Int]("anomaly") == 1)
    } finally q.stop()
  }

  test("streaming histogram cells equal the batch histogram, clamped edges") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Double]
    val vals = mem.toDF().toDF("value")
    val q = graft.pipeline.Sketches.histogram(vals, 0.0, 100.0, bins = 10)
      .writeStream.format("memory").queryName("hist_cells")
      .outputMode("complete").start()
    try {
      mem.addData(5.0, 15.0, 15.5, 95.0)
      q.processAllAvailable()
      // later batch adds cells and an out-of-range value (clamps to
      // the top bin instead of silently dropping)
      mem.addData(16.0, 250.0, -3.0)
      q.processAllAvailable()
      val streamed = s.sql("SELECT bin, c FROM hist_cells")
        .collect().map(_.toSeq).toSet
      val batch = graft.pipeline.Sketches.histogram(
        Seq(5.0, 15.0, 15.5, 95.0, 16.0, 250.0, -3.0).toDF("value"),
        0.0, 100.0, bins = 10).collect().map(_.toSeq).toSet
      assert(streamed == batch)
      val cells = streamed.map(r => r.head.asInstanceOf[Int] ->
        r(1).asInstanceOf[Long]).toMap
      assert(cells(1) == 3L) // 15.0, 15.5, 16.0
      assert(cells(9) == 2L) // 95.0 + clamped 250.0
      assert(cells(0) == 2L) // 5.0 + clamped −3.0
    } finally q.stop()
  }

  test("streaming dd-sketch cells equal the batch buckets of all arrived data") {
    // ddBuckets is streaming-safe BY CONSTRUCTION: the (type, bucket)
    // count runs as a stateful aggregation in complete mode; no value
    // bounds are declared up front (the DDSketch advantage over the
    // fixed-bounds histogram), and non-positives land in the null
    // bucket — the zero store — instead of being dropped
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Double)]
    val vals = mem.toDF().toDF("event_type", "value")
    val q = graft.pipeline.Sketches.ddBuckets(vals)
      .writeStream.format("memory").queryName("dd_cells")
      .outputMode("complete").start()
    try {
      mem.addData(("a", 5.0), ("a", 5.001), ("b", 900.0))
      q.processAllAvailable()
      // a later batch widens the range with no re-configuration and
      // sends a non-positive into the zero store
      mem.addData(("a", 1e-4), ("a", 4e8), ("b", -1.0))
      q.processAllAvailable()
      val streamed = s.sql("SELECT event_type, i, c FROM dd_cells")
        .collect().map(_.toSeq).toSet
      val batch = graft.pipeline.Sketches.ddBuckets(
        Seq(("a", 5.0), ("a", 5.001), ("b", 900.0),
          ("a", 1e-4), ("a", 4e8), ("b", -1.0))
          .toDF("event_type", "value")).collect().map(_.toSeq).toSet
      assert(streamed == batch)
      // 5.0 and 5.001 share a 1%-γ bucket; the zero store holds −1.0
      val cells = streamed.map(r => (r.head, r(1)) -> r(2)).toMap
      assert(cells.exists { case ((t, _), c) => t == "a" && c == 2L })
      assert(cells(("b", null)) == 1L)
    } finally q.stop()
  }

  test("streaming hll registers equal the batch sketch of all arrived data") {
    // the batch register build (explode → md5 → groupBy max) is
    // streaming-safe BY CONSTRUCTION — the same operator runs as a
    // stateful max aggregation in complete mode, so sketch
    // maintenance over an ingest stream needs no second code path;
    // this pins the cross-batch parity
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String)]
    val docs = mem.toDF().toDF("doc_id", "source", "text")
    val q = graft.pipeline.Sketches.hllRegisters(docs)
      .writeStream.format("memory").queryName("hll_regs")
      .outputMode("complete").start()
    try {
      mem.addData((1L, "a", "alpha beta gamma delta"),
        (2L, "b", "epsilon zeta"))
      q.processAllAvailable()
      // later batch adds new tokens to source a and repeats old ones
      // (repeats must not move a register — max is idempotent)
      mem.addData((3L, "a", "alpha beta eta theta iota"),
        (4L, "b", "epsilon zeta"))
      q.processAllAvailable()
      val streamed = s.sql("SELECT source, idx, mj FROM hll_regs")
        .collect().map(_.toSeq).toSet
      val batch = graft.pipeline.Sketches.hllRegisters(Seq(
        (1L, "a", "alpha beta gamma delta"), (2L, "b", "epsilon zeta"),
        (3L, "a", "alpha beta eta theta iota"), (4L, "b", "epsilon zeta"))
        .toDF("doc_id", "source", "text"))
        .collect().map(_.toSeq).toSet
      assert(streamed == batch)
    } finally q.stop()
  }
}
