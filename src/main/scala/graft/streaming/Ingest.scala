package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming ingest — the m3 write path re-expressed:
  * m3coordinator → m3aggregator staged tumbling windows →
  * downsampled storage (reference: src/aggregator/aggregator/
  * aggregator.go, src/cmd/services/m3coordinator/downsample/).
  *
  * Spark-first shape: `readStream` source → event-time watermark →
  * windowed aggregation → sink. The watermark bounds state exactly
  * like m3aggregator's window-close flush; allowed lateness =
  * watermark delay. Counter-reset tracking (the stateful part of
  * m3's counter aggregation) uses mapGroupsWithState keyed by
  * series.
  *
  * Scale: state is one row per (series, open window) — bounded by
  * series cardinality × (lateness / resolution). The shuffle keys on
  * series hash; with the default HDFS/RocksDB state store this is
  * the standard always-on deployment shape for 1000-executor
  * clusters.
  */
object Ingest {

  case class Sample(name: String, user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class CounterUpdate(name: String, user_id: Long, cumulative: Double, resets: Int)
  private case class CounterState(last: Double, cumulative: Double, resets: Int)

  /** Rank-error budget for streaming percentiles. m3aggregator's
    * timer P50/P95/P99 come from a Cormode–Muthukrishnan quantile
    * sketch with defaultEps = 1e-3
    * (src/aggregator/aggregation/quantile/cm/{stream.go,options.go});
    * Spark's `approx_percentile` is the Greenwald–Khanna sketch with
    * rank error ≤ 1/accuracy, so accuracy = 1000 gives the same
    * guarantee. Both sketches merge partials, which is exactly what
    * watermarked streaming aggregation needs (sketch state lives in
    * the state store per open window, flushed at window close — the
    * same shape as m3aggregator's per-window stream + flush). */
  val PercentileAccuracy = 1000

  /** Tumbling-window rollup over a (possibly streaming) sample
    * frame: the FULL m3 aggregation-type set
    * (src/metrics/aggregation/type.go:34-42 — Last, Min, Max, Mean,
    * Median, Count, Sum, SumSq, Stdev, plus timer P50/P95/P99) in
    * one pass. Every member is a streaming-safe declarative
    * aggregate: `last_v` is latest-by-event-time (max_by, the gauge
    * Last semantics of aggregation/gauge.go:75-80), `stdev_v`
    * replays the reference's exact sumSq formula
    * (aggregation/common.go:28-35: √((n·sumSq − sum²)/(n(n−1))),
    * 0 when n ≤ 1; clamped at 0 against float cancellation), and
    * median is P50 (type.go:221 dedups them). With
    * `withWatermark(ts, lateness)` upstream this runs in append mode
    * and flushes each window once the watermark passes its end.
    * Percentile accuracy bound: |rank(reported) − rank(exact)| ≤
    * n/[[PercentileAccuracy]] per window, matching the reference
    * sketch's eps=1e-3. */
  def windowedRollup(samples: DataFrame, windowLen: String = "1 hour",
                     lateness: String = "30 minutes"): DataFrame =
    samples
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen), col("name"), col("user_id"))
      .agg(
        sum("value").as("sum_v"),
        count(lit(1)).as("count_v"),
        min("value").as("min_v"),
        max("value").as("max_v"),
        avg("value").as("avg_v"),
        max_by(col("value"), col("ts")).as("last_v"),
        sum(col("value") * col("value")).as("sumsq_v"),
        percentile_approx(col("value"), lit(0.5), lit(PercentileAccuracy)).as("p50_v"),
        percentile_approx(col("value"), lit(0.95), lit(PercentileAccuracy)).as("p95_v"),
        percentile_approx(col("value"), lit(0.99), lit(PercentileAccuracy)).as("p99_v"))
      .select(
        col("name"), col("user_id"),
        unix_timestamp(col("window.start")).as("bucket_s"),
        col("sum_v"), col("count_v"), col("min_v"), col("max_v"), col("avg_v"),
        col("last_v"), col("sumsq_v"),
        when(col("count_v") > 1,
          sqrt(greatest(lit(0.0),
            (col("count_v") * col("sumsq_v") - col("sum_v") * col("sum_v")) /
              (col("count_v") * (col("count_v") - 1)))))
          .otherwise(lit(0.0)).as("stdev_v"),
        col("p50_v"), col("p95_v"), col("p99_v"))

  /** Sliding-lookback streaming evaluation — the streaming analogue
    * of Temporal.overTimeAggsSliding (m3's step-aligned range
    * queries, temporal/base.go): each step-aligned instant
    * aggregates the lookback window ending there, flushed in append
    * mode once the watermark passes the window end. State =
    * lookback/step open windows per series — bounded. */
  def slidingRollup(samples: DataFrame, lookback: String = "1 hour",
                    step: String = "15 minutes",
                    lateness: String = "30 minutes"): DataFrame =
    samples
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), lookback, step), col("name"), col("user_id"))
      .agg(
        sum("value").as("sum_v"),
        count(lit(1)).as("count_v"),
        avg("value").as("avg_v"))
      .select(
        col("name"), col("user_id"),
        unix_timestamp(col("window.end")).as("bucket_s"),
        col("sum_v"), col("count_v"), col("avg_v"))

  /** Streaming rule-based downsampling — m3's per-metric mapping
    * rules applied on the write path (the m3aggregator deployment
    * shape; src/cmd/services/m3coordinator/downsample): each rule
    * filters its matched series via [[graft.tsdb.Fetch]] matchers,
    * windows at its own resolution, and the rules union into one
    * long-format append stream. Aggregate set: sum/count/min/max/
    * mean plus sketch-backed p50/p95/p99 (every m3 timer policy
    * carries these — src/metrics/policy/ defaults; sketch semantics
    * per [[PercentileAccuracy]]). */
  def ruleRollup(samples: DataFrame,
                 rules: Seq[graft.tsdb.Downsample.Rule],
                 lateness: String = "30 minutes"): DataFrame = {
    val frames = rules.map { r =>
      val aggExprs = r.aggs.map(streamAgg)
      val kv = r.aggs.flatMap(a => Seq(lit(a), col(a)))
      graft.tsdb.Fetch(samples, r.matchers)
        .withWatermark("ts", lateness)
        .groupBy(window(col("ts"), windowLen(r.resolution)),
          col("name"), col("user_id"))
        .agg(aggExprs.head, aggExprs.tail: _*)
        .select(
          lit(r.name).as("rule"), lit(r.resolution).as("resolution"),
          col("name"), col("user_id"),
          unix_timestamp(col("window.start")).as("bucket_s"),
          explode(map(kv: _*)).as(Seq("agg", "value")))
    }
    frames.reduce(_ unionByName _)
  }

  private def windowLen(resolution: String): String = resolution match {
    case "minute" => "1 minute"
    case "hour"   => "1 hour"
    case "day"    => "1 day"
    case res => throw new IllegalArgumentException(s"unit $res")
  }

  /** The streaming-safe aggregation vocabulary — the batch rule set
    * minus exact percentiles (sketch-backed per
    * [[PercentileAccuracy]]). Sample stdev (aggregation/common.go
    * stdev, n≤1 → 0) uses stddev_samp, the numerically-stable
    * central-moments form. */
  private def streamAgg(a: String): Column = a match {
    case "sum"   => sum("value").as("sum")
    case "count" => count(lit(1)).cast("double").as("count")
    case "min"   => min("value").as("min")
    case "max"   => max("value").as("max")
    case "mean"  => avg("value").as("mean")
    case "last"  => max_by(col("value"), col("ts")).as("last")
    case "sum_sq" => sum(col("value") * col("value")).as("sum_sq")
    case "stdev" => coalesce(stddev_samp(col("value")), lit(0.0)).as("stdev")
    case p @ ("p50" | "p95" | "p99" | "median") =>
      val q = if (p == "median") 0.5 else p.drop(1).toDouble / 100.0
      percentile_approx(col("value"), lit(q), lit(PercentileAccuracy)).as(p)
    case a => throw new IllegalArgumentException(
      s"agg $a not streaming-safe (allowed: sum count min max mean " +
        "last sum_sq stdev median p50 p95 p99)")
  }

  /** Streaming rollup TARGETS — the aggregator's rollup-rule form
    * (src/metrics/rules/rollup_target.go:42 applied on the ingest
    * path: m3 computes rollup targets in the STREAMING aggregator,
    * batch replay is the derived form): aggregate across a tag
    * subset per window, emit under the new metric name. Semantics
    * identical to [[graft.tsdb.Downsample.rollupTargets]] (GroupBy
    * presence rule, ExcludeBy drop, `{{ .MetricName }}` template,
    * null columns for dropped dims) so the append stream unions
    * into the same long-format frame and a batch replay of the same
    * input is row-identical up to sketch-vs-exact percentiles.
    *
    * Scale: one windowed stateful aggregation per (rule, target),
    * state = one row per (new series, open window) — strictly
    * SMALLER cardinality than the pre-rollup series set; the
    * watermark bounds open windows. */
  def targetRollup(samples: DataFrame,
                   rules: Seq[graft.tsdb.Downsample.RollupRule],
                   labelCols: Seq[String] = graft.tsdb.Vectors.labels,
                   lateness: String = "30 minutes"): DataFrame = {
    import graft.tsdb.{Downsample, Fetch}
    require(rules.nonEmpty && rules.forall(_.targets.nonEmpty),
      "empty rollup rule/target set")
    val dims = labelCols.filterNot(_ == "name")
    val types = samples.schema.fields.map(f => f.name -> f.dataType).toMap
    val frames = for { r <- rules; t <- r.targets } yield {
      // the batch-replay contract must not silently weaken: pipeline
      // transforms need per-series state, so they run UPSTREAM via
      // [[transformStream]] (typed Dataset), not inside this
      // untyped windowing — reject rather than aggregate raw values
      // under a rule that promises transformed ones
      require(t.transforms.isEmpty,
        s"target ${t.newName}: apply pipeline transforms upstream with " +
          s"transformStream(${t.transforms.mkString(",")}) before targetRollup")
      t.tags.foreach(tag => require(dims.contains(tag),
        s"rollup tag $tag is not a dimension (have: ${dims.mkString(",")})"))
      val kept = t.rollupType match {
        case Downsample.GroupBy   => dims.filter(t.tags.contains)
        case Downsample.ExcludeBy => dims.filterNot(t.tags.contains)
      }
      val matched = Fetch(samples, r.matchers)
      val present = t.rollupType match {
        case Downsample.GroupBy => kept.foldLeft(matched)((df, c) =>
          df.where(col(c).isNotNull))
        case Downsample.ExcludeBy => matched
      }
      val aggExprs = t.aggs.map(streamAgg)
      val kv = t.aggs.flatMap(a => Seq(lit(a), col(a)))
      present
        .withColumn("_rollup_name", Downsample.newNameCol(t.newName))
        .withWatermark("ts", lateness)
        .groupBy(window(col("ts"), windowLen(t.resolution)) +:
          col("_rollup_name") +: kept.map(col): _*)
        .agg(aggExprs.head, aggExprs.tail: _*)
        .select(
          (lit(r.name).as("rule") +: lit(t.resolution).as("resolution") +:
            labelCols.map {
              case "name"                => col("_rollup_name").as("name")
              case c if kept.contains(c) => col(c)
              case c => lit(null).cast(types(c)).as(c)
            } :+ unix_timestamp(col("window.start")).as("bucket_s")) :+
            explode(map(kv: _*)).as(Seq("agg", "value")): _*)
    }
    frames.reduce(_ unionByName _)
  }

  /** Ingest dedup for at-least-once delivery — duplicate writes of
    * the same (series, timestamp) sample are dropped exactly like
    * m3's write-path upsert semantics. State is bounded by the
    * watermark horizon (`dropDuplicatesWithinWatermark`): one entry
    * per distinct sample key until the watermark passes it. */
  def dedupIngest(samples: DataFrame, lateness: String = "30 minutes"): DataFrame =
    samples
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("name", "user_id", "ts")

  /** Stateful counter-reset tracking per series
    * (m3 counter semantics, src/aggregator/aggregation/counter.go +
    * the reset logic of src/query/functions/temporal/rate.go):
    * maintains the running cumulative increase across batches and
    * counts resets. State per series = 3 numbers. */
  def counterTrack(samples: Dataset[Sample]): Dataset[CounterUpdate] = {
    import samples.sparkSession.implicits._
    samples
      .groupByKey(s => (s.name, s.user_id))
      .mapGroupsWithState[CounterState, CounterUpdate](
        GroupStateTimeout.NoTimeout()) {
        case ((name, uid), it, state: GroupState[CounterState]) =>
          val sorted = it.toSeq.sortBy(s => (s.ts.getTime, s.value))
          val init = state.getOption.getOrElse(
            CounterState(Double.NaN, 0.0, 0))
          val end = sorted.foldLeft(init) { (st, s) =>
            if (st.last.isNaN) CounterState(s.value, st.cumulative, st.resets)
            else if (s.value >= st.last)
              CounterState(s.value, st.cumulative + (s.value - st.last), st.resets)
            else // reset: counter restarted below previous value
              CounterState(s.value, st.cumulative + s.value, st.resets + 1)
          }
          state.update(end)
          CounterUpdate(name, uid, end.cumulative, end.resets)
      }
  }

  /** Streaming pipeline transformation ops — the aggregator's
    * transformation stage on the INGEST path, where m3 actually
    * computes it (reference: src/metrics/transformation/, applied by
    * the aggregator's elem tick before the rollup aggregation;
    * semantics per-op identical to the batch
    * [[graft.tsdb.Downsample.RollupTarget]] transforms):
    *  - Absolute: stateless |v| map.
    *  - Reset: stateless 2-datapoint flatMap (the half-resolution
    *    zero; unary_multi.go:46).
    *  - Add / PerSecond / Increase: per-series state via
    *    flatMapGroupsWithState — Add carries the NaN-as-zero running
    *    sum, the binary ops carry (prev ts, prev value) and DROP
    *    datapoints per binary.go (no prev / non-increasing ts / NaN
    *    / negative diff).
    *
    * Ordering: within a micro-batch the group sorts by event time
    * (ties by value, like [[counterTrack]]); across batches the
    * state carries the previous point. A datapoint arriving after a
    * later one was processed in an earlier batch is dropped by the
    * strict time-increase rule — bound reordering with the
    * upstream watermark, exactly like the aggregator's lateness
    * window.
    *
    * Scale: state is ONE small struct per series (not per window);
    * the shuffle keys on series hash — the same always-on shape as
    * [[counterTrack]]. */
  def transformStream(samples: Dataset[Sample], op: String,
                      resolution: String = "hour"): Dataset[Sample] = {
    import samples.sparkSession.implicits._
    op match {
      case "Absolute" => samples.map(s => s.copy(value = math.abs(s.value)))
      case "Reset" =>
        val halfMs = math.max(unitSecondsOf(resolution) * 500L, 1L)
        samples.flatMap(s => Seq(s,
          s.copy(ts = new java.sql.Timestamp(s.ts.getTime + halfMs),
            value = 0.0)))
      case "Add" | "PerSecond" | "Increase" =>
        samples
          .groupByKey(s => (s.name, s.user_id))
          // state = (prev ts µs, prev value, running sum); a plain
          // tuple so the state encoder stays primitive
          .flatMapGroupsWithState[(Long, Double, Double), Sample](
            OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
            case ((name, uid), it, state: GroupState[(Long, Double, Double)]) =>
              // sort at full µs precision (getTime is ms-truncated) —
              // the keep/state logic compares µs, so a ms-precision
              // sort could process sub-ms-spaced samples out of order
              def micros(t: java.sql.Timestamp): Long =
                t.getTime * 1000L + (t.getNanos / 1000) % 1000
              val sorted = it.toSeq.sortBy(s => (micros(s.ts), s.value))
              val init = state.getOption.getOrElse(
                (Long.MinValue, Double.NaN, 0.0))
              val out = Seq.newBuilder[Sample]
              val end = sorted.foldLeft(init) { case (st @ (lastTs, lastV, runSum), s) =>
                val tsMicros = micros(s.ts)
                op match {
                  case "Add" =>
                    val sum = runSum + (if (s.value.isNaN) 0.0 else s.value)
                    out += s.copy(value = sum)
                    (tsMicros, s.value, sum)
                  case _ =>
                    val hasPrev = lastTs != Long.MinValue
                    val prevV =
                      if (op == "Increase" && lastV.isNaN) 0.0 else lastV
                    val diff = s.value - prevV
                    val keep = hasPrev && lastTs < tsMicros &&
                      !s.value.isNaN && diff >= 0 &&
                      (op == "Increase" || !lastV.isNaN)
                    if (keep) {
                      val v =
                        if (op == "PerSecond")
                          diff / ((tsMicros - lastTs) / 1000000.0)
                        else diff
                      out += s.copy(value = v)
                    }
                    // prev always advances to the current datapoint
                    // (matching the batch lag replay: a same-ts
                    // successor is dropped but still becomes prev)
                    (tsMicros, s.value, runSum)
                }
              }
              state.update(end)
              out.result().iterator
          }
      case t => throw new IllegalArgumentException(s"unknown transformation $t")
    }
  }

  private def unitSecondsOf(resolution: String): Long = resolution match {
    case "minute" => 60L
    case "hour"   => 3600L
    case "day"    => 86400L
    case r => throw new IllegalArgumentException(s"unit $r")
  }

  /** End-to-end streaming pipeline wiring (source → rollup → memory
    * sink), used by the spec; in production the source/sink lines
    * are kafka/parquet instead of rate/memory. */
  def startToMemory(spark: SparkSession, source: DataFrame,
                    queryName: String): org.apache.spark.sql.streaming.StreamingQuery =
    windowedRollup(source)
      .writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(queryName)
      .start()
}
