package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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

  /** Tumbling-window rollup over a (possibly streaming) sample
    * frame: identical aggregate set to Downsample.rollup minus the
    * order-dependent ones (streaming-safe: sum/count/min/max/avg).
    * With `withWatermark(ts, lateness)` upstream this runs in
    * append mode and flushes each window once the watermark passes
    * its end. */
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
        avg("value").as("avg_v"))
      .select(
        col("name"), col("user_id"),
        unix_timestamp(col("window.start")).as("bucket_s"),
        col("sum_v"), col("count_v"), col("min_v"), col("max_v"), col("avg_v"))

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
    * long-format append stream. Streaming-safe aggregate set only
    * (sum/count/min/max/avg). */
  def ruleRollup(samples: DataFrame,
                 rules: Seq[graft.tsdb.Downsample.Rule],
                 lateness: String = "30 minutes"): DataFrame = {
    val frames = rules.map { r =>
      val windowLen = r.resolution match {
        case "minute" => "1 minute"
        case "hour"   => "1 hour"
        case "day"    => "1 day"
        case res => throw new IllegalArgumentException(s"unit $res")
      }
      val aggExprs = r.aggs.map {
        case "sum"   => sum("value").as("sum")
        case "count" => count(lit(1)).cast("double").as("count")
        case "min"   => min("value").as("min")
        case "max"   => max("value").as("max")
        case "mean"  => avg("value").as("mean")
        case a => throw new IllegalArgumentException(
          s"agg $a not streaming-safe (allowed: sum count min max mean)")
      }
      val kv = r.aggs.flatMap(a => Seq(lit(a), col(a)))
      graft.tsdb.Fetch(samples, r.matchers)
        .withWatermark("ts", lateness)
        .groupBy(window(col("ts"), windowLen), col("name"), col("user_id"))
        .agg(aggExprs.head, aggExprs.tail: _*)
        .select(
          lit(r.name).as("rule"), lit(r.resolution).as("resolution"),
          col("name"), col("user_id"),
          unix_timestamp(col("window.start")).as("bucket_s"),
          explode(map(kv: _*)).as(Seq("agg", "value")))
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
