package graft.tsdb

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Across-series aggregation — the m3 `aggregation` function family
  * (reference: src/query/functions/aggregation/…go files): collapse an
  * instant frame across series, per instant, grouped by a label
  * subset (PromQL `sum by (g) (v)`).
  *
  * Input: an instant frame (labels…, bucket_s, value) — see
  * [[Vectors.instant]]. `by` is the label subset kept (PromQL `by`);
  * every op groups on (by…, bucket_s).
  *
  * Scale: these are plain hash aggregations with map-side partial
  * agg; input is already one row per (series, instant) so group
  * cardinality ≤ series count — always tiny relative to raw samples.
  * topk/bottomk use a rank window per (group, instant): one shuffle
  * on the group key, no global sort.
  */
object SeriesAgg {

  private def keys(by: Seq[String]): Seq[Column] = (by :+ "bucket_s").map(col)

  /** sum/min/max/avg/count by labels
    * (aggregation/function.go:29-43). */
  def basic(instant: DataFrame, by: Seq[String]): DataFrame =
    instant.groupBy(keys(by): _*)
      .agg(
        round(sum("value"), 6).as("sum_v"),
        min("value").as("min_v"),
        max("value").as("max_v"),
        round(avg("value"), 6).as("avg_v"),
        count(lit(1)).as("count_v"))

  /** PromQL `without` grouping (aggregation/base.go:51 `Without
    * bool`): aggregate grouping by every label *except* `drop`. */
  def basicWithout(instant: DataFrame, drop: Seq[String],
                   labelCols: Seq[String]): DataFrame =
    basic(instant, labelCols.filterNot(drop.contains))

  /** stddev/var by labels — population moments per PromQL
    * (aggregation/function.go:38,41). */
  def spread(instant: DataFrame, by: Seq[String]): DataFrame =
    instant.groupBy(keys(by): _*)
      .agg(
        round(stddev_pop("value"), 6).as("stddev_v"),
        round(var_pop("value"), 6).as("var_v"))

  /** quantile(q) by labels (aggregation/quantile.go:33) — exact
    * interpolated percentile across series. */
  def quantile(instant: DataFrame, q: Double, by: Seq[String]): DataFrame =
    instant.groupBy(keys(by): _*)
      .agg(round(percentile(col("value"), lit(q)), 6).as("quantile_v"))

  /** topk/bottomk(k) per (group, instant) (aggregation/take.go).
    * Deterministic on value ties via the remaining label columns.
    * rank window per group — no global sort, shuffles on the group
    * key only. */
  def take(instant: DataFrame, k: Int, by: Seq[String],
           tiebreak: Seq[String], top: Boolean): DataFrame = {
    val ord =
      if (top) col("value").desc +: tiebreak.map(col(_).asc)
      else col("value").asc +: tiebreak.map(col(_).asc)
    val w = Window.partitionBy(keys(by): _*).orderBy(ord: _*)
    instant.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .drop("rk")
  }

  /** count_values: frequency of each distinct value per (group,
    * instant) (aggregation/count_values.go:37). Values are grouped
    * by their string rendering like m3 does. */
  def countValues(instant: DataFrame, by: Seq[String]): DataFrame =
    instant
      // decimal render, not double render: both engines format
      // DECIMAL(18,2) identically, so the oracle hash matches.
      .withColumn("value_str", col("value").cast("decimal(18,2)").cast("string"))
      .groupBy((by :+ "bucket_s" :+ "value_str").map(col): _*)
      .agg(count(lit(1)).as("count_v"))

  /** absent: instants (from a complete bucket grid) where the
    * selector matched no series (aggregation/absent.go:36). Emits
    * (bucket_s, absent=1) rows only for empty instants.
    *
    * The bucket grid is generated with `sequence` — no driver-side
    * loop; the anti-join broadcasts the (tiny) distinct-instant side.
    */
  def absent(instant: DataFrame, startS: Long, endS: Long,
             stepS: Long): DataFrame = {
    val spark = instant.sparkSession
    val grid = spark.range(1)
      .select(explode(sequence(lit(startS), lit(endS), lit(stepS))).as("bucket_s"))
    val present = instant.select("bucket_s").distinct()
    grid.join(present, Seq("bucket_s"), "left_anti")
      .select(col("bucket_s"), lit(1).as("absent_v"))
  }
}
