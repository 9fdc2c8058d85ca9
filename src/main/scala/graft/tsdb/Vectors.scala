package graft.tsdb

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Canonical series frames — the m3 data model re-expressed as
  * DataFrames.
  *
  * In m3 a series is a metric name plus a label set, and samples are
  * (timestamp, float64) pairs (reference: src/query/models/tags.go,
  * src/query/ts/values.go). Here a *sample frame* is any DataFrame
  * with label columns + `ts` (timestamp) + `value` (double); an
  * *instant frame* additionally has `bucket_s` (bigint, epoch seconds
  * of the evaluation instant) instead of raw `ts`, one row per
  * (series, instant) — the Spark analogue of m3's consolidated
  * instant vector (src/query/ts/values.go consolidation uses the
  * last sample in the lookback window).
  *
  * On the synthetic testdata the raw sample stream is
  * `events.parquet`: name = event_type, labels = {user_id}.
  *
  * Scale notes: bucketing is `date_trunc`, a pure column op — with a
  * dt=/hour= partitioned layout every (series, bucket) group lives
  * inside one file partition, so the groupBy aggregations here are
  * map-side-partial first and shuffle only the (tiny) per-group
  * state. Per-series *ordered* window ops (lag etc., see Temporal)
  * shuffle once on the series key; all downstream ops reuse that
  * partitioning.
  */
object Vectors {

  /** Default label columns of the events-derived series frame. */
  val labels: Seq[String] = Seq("name", "user_id")

  /** events → sample frame (name, user_id, ts, value, event_id).
    * event_id rides along purely as the deterministic tiebreaker for
    * "last sample wins" consolidation and top-k row_numbers.
    */
  def samples(events: DataFrame): DataFrame =
    events.select(
      col("event_type").as("name"),
      col("user_id"),
      col("ts"),
      col("value"),
      col("event_id"))

  /** Epoch-seconds of `date_trunc(unit, ts)` — bigint bucket key.
    * Emitting epoch seconds (not timestamps) keeps oracle comparison
    * free of cross-engine timestamp codec differences. */
  def bucketS(unit: String, ts: Column = col("ts")): Column =
    unix_timestamp(date_trunc(unit, ts)).as("bucket_s")

  /** Packed per-bucket ordering key: (µs offset inside the bucket)
    * · 2²⁶ + event_id. A single BIGINT that orders identically to
    * (ts, event_id) — so max_by over it keeps a fully hash-aggregable
    * (double, long) buffer. A struct ordering key instead demotes the
    * whole aggregate to SortAggregate with a sort on both sides of
    * the shuffle; an atomic key keeps HashAggregate + whole-stage
    * codegen (asserted in PlanSpec).
    *
    * Range: day buckets → offset < 8.64e10, ×2²⁶ < 5.8e18 < 2⁶³.
    * Exact while event_id < 2²⁶ per µs-tied pair — beyond that the
    * pick remains a valid "one of the tied samples". */
  def lastKey: Column =
    (unix_micros(col("ts")) - col("bucket_s") * lit(1000000L)) * lit(1L << 26) +
      pmod(col("event_id"), lit(1L << 26))

  /** Deterministic salt in [0, n) from the given columns — the
    * standard guard for pathological label skew: aggregate first by
    * (key, salt) for the heavy partial reduction, then by key alone
    * over n small rows per key. Used when one label value dominates
    * (SURVEY §4 skew note); spec-verified equal to the direct
    * aggregation. */
  def saltedKey(n: Int, cols: Column*): Column =
    pmod(hash(cols: _*), lit(n))

  /** Sample frame → instant frame at the given resolution: one row
    * per (labels, bucket) with value = last sample in the bucket
    * (gauge consolidation — m3 consolidates by Last:
    * src/query/ts/values.go). Deterministic on timestamp ties via
    * event_id (see [[lastKey]]).
    */
  def instant(samples: DataFrame, unit: String = "day",
              labelCols: Seq[String] = labels): DataFrame =
    consolidate(samples, "last", unit, labelCols)

  /** Consolidation with an explicit function — m3's ConsolidationFunc
    * set (src/query/ts/consolidators; Last/Min/Max/Sum/Avg/Count):
    * how multiple samples in one step collapse to the instant value. */
  def consolidate(samples: DataFrame, how: String, unit: String = "day",
                  labelCols: Seq[String] = labels): DataFrame = {
    val agg = how match {
      case "last"  => max_by(col("value"), lastKey)
      case "min"   => min("value")
      case "max"   => max("value")
      case "sum"   => sum("value")
      case "avg"   => avg("value")
      case "count" => count(lit(1)).cast("double")
      case h => throw new IllegalArgumentException(s"unknown consolidation $h")
    }
    samples
      .withColumn("bucket_s", bucketS(unit))
      .groupBy((labelCols :+ "bucket_s").map(col): _*)
      .agg(agg.as("value"))
  }
}
