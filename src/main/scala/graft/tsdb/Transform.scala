package graft.tsdb

import graft.Materialize.MatOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Instant transforms — the m3 `linear` function family (reference:
  * src/query/functions/linear/…go files): pure per-row column functions
  * over an instant frame. All stay inside whole-stage codegen; none
  * shuffles (except the explicit sort ops).
  */
object Transform {

  /** abs/ceil/floor/exp/sqrt/ln/log2/log10 (linear/math.go) plus
    * unary negation (src/query/functions/lazy/base.go:36 UnaryType).
    * ln/log are guarded: m3 emits NaN for non-positive inputs; we
    * emit null (SQL-comparable across engines). */
  def math(instant: DataFrame): DataFrame =
    instant.select(
      col("name"), col("user_id"), col("bucket_s"),
      round(-col("value"), 6).as("neg_v"),
      signum(col("value")).as("sgn_v"),
      round(abs(col("value")), 6).as("abs_v"),
      ceil(col("value")).cast("double").as("ceil_v"),
      floor(col("value")).cast("double").as("floor_v"),
      round(exp(col("value") / lit(100.0)), 6).as("exp_v"),
      round(sqrt(abs(col("value"))), 6).as("sqrt_v"),
      round(when(col("value") > 0, log(col("value"))), 6).as("ln_v"),
      round(when(col("value") > 0, log2(col("value"))), 6).as("log2_v"),
      round(when(col("value") > 0, log10(col("value"))), 6).as("log10_v"))

  /** clamp_min/clamp_max (linear/clamp.go). */
  def clamp(instant: DataFrame, lo: Double, hi: Double): DataFrame =
    instant.select(
      col("name"), col("user_id"), col("bucket_s"),
      round(greatest(col("value"), lit(lo)), 6).as("clamp_min_v"),
      round(least(col("value"), lit(hi)), 6).as("clamp_max_v"))

  /** round-to-multiple (linear/round.go:37): round(v / m) * m. */
  def roundTo(instant: DataFrame, toNearest: Double): DataFrame =
    instant.select(
      col("name"), col("user_id"), col("bucket_s"),
      round(round(col("value") / lit(toNearest), 0) * lit(toNearest), 6)
        .as("round_v"))

  /** PromQL datetime family (linear/datetime.go). day_of_week is
    * PromQL-style: 0 = Sunday … 6 = Saturday. */
  def datetime(samples: DataFrame): DataFrame =
    samples.select(
      col("name"), col("user_id"), col("event_id"),
      dayofmonth(col("ts")).cast("long").as("day_of_month_v"),
      (dayofweek(col("ts")) - lit(1)).cast("long").as("day_of_week_v"),
      dayofyear(col("ts")).cast("long").as("day_of_year_v"),
      dayofmonth(last_day(col("ts"))).cast("long").as("days_in_month_v"),
      hour(col("ts")).cast("long").as("hour_v"),
      minute(col("ts")).cast("long").as("minute_v"),
      month(col("ts")).cast("long").as("month_v"),
      year(col("ts")).cast("long").as("year_v"))

  /** histogram_quantile over pre-bucketed cumulative `le` series —
    * the actual PromQL/m3 input shape
    * (linear/histogram_quantile.go:43 consumes series carrying an
    * `le` label with cumulative bucket counts, as written by
    * histogram instrumentation). Input frame:
    * (groupCols…, bucket_s, le: double, value = cumulative count);
    * output one interpolated quantile per (group, instant). The
    * +Inf bucket returns its lower bound (PromQL behavior). */
  def histogramQuantileLe(frame: DataFrame, q: Double,
                          groupCols: Seq[String]): DataFrame = {
    val keys = (groupCols :+ "bucket_s").map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys: _*).orderBy("le")
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(keys: _*)
    frame
      .withColumn("cum_prev", coalesce(lag("value", 1).over(w), lit(0.0)))
      .withColumn("lo", coalesce(lag("le", 1).over(w), lit(0.0)))
      .withColumn("_first", lag("le", 1).over(w).isNull)
      .withColumn("total", max("value").over(wAll))
      .withColumn("q_rank", lit(q) * col("total"))
      .where(col("value") >= col("q_rank") && col("cum_prev") < col("q_rank"))
      .select(keys :+
        round(
          when(col("le") === Double.PositiveInfinity, col("lo"))
            // histogram_quantile.go:239 — a first bucket with a
            // non-positive bound returns the bound itself (no
            // interpolation from an assumed 0 start)
            .when(col("_first") && col("le") <= 0, col("le"))
            .otherwise(col("lo") + (col("le") - col("lo")) *
              (col("q_rank") - col("cum_prev")) / (col("value") - col("cum_prev"))),
          6).as("hq_v"): _*)
  }

  /** sort/sort_desc (linear/sort.go): the series of an instant
    * ordered by value. Emits the rank so the ordering is part of the
    * comparable output (row order itself is not hashed).
    *
    * Distributed two-phase ranking — a plain
    * `row_number over (partition by bucket_s)` puts *every series of
    * an instant* in one task, a straggler at high series
    * cardinality. Instead: (1) per-bucket value-range shards from
    * approx-percentile sketch bounds (tiny, broadcast; bounds only
    * balance shards — the rank below is exact for any cut points);
    * equal values always land in the same shard, so tiebreak
    * ordering stays intact;
    * (2) row_number within (bucket, shard); (3) global rank = local
    * rank + prefix count of the preceding shards (a buckets×shards
    * frame, broadcast back). Identical output to the single-window
    * form — validated by the unchanged oracle. */
  def sortSeries(instant: DataFrame, desc: Boolean,
                 tiebreak: Seq[String], shards: Int = 32): DataFrame = {
    val ordVal = if (desc) -col("value") else col("value")
    val qs = (1 until shards).map(_.toDouble / shards)
    val withOrd = instant.withColumn("_ord", ordVal)
    // sketch bounds: they only balance the shards (the local window
    // + prefix offsets keep the rank exact whatever the cut points),
    // and the exact form would buffer every distinct value per bucket
    val bounds = withOrd.groupBy("bucket_s")
      .agg(approx_percentile(col("_ord"), typedlit(qs), lit(1000)).as("_bs"))
    // null values (possible after graphite transformNull-style ops)
    // route to the LAST shard and order last within it — preserving
    // the `orderBy(value.desc)` null placement of the single-window
    // form (nulls last in both asc and desc here by convention).
    val sharded = withOrd.join(broadcast(bounds), "bucket_s")
      .withColumn("_shard",
        when(col("_ord").isNull, lit(shards))
          .otherwise(size(filter(col("_bs"), b => b < col("_ord")))))
      .drop("_bs")
      // the shard-count offsets AND the final ranked join both read
      // this frame — without the lazy checkpoint the whole
      // input+bounds subtree evaluates twice (r13 plan: ts_sort ran
      // the instant consolidation and the percentile sketch 2×; the
      // q_rfm/ppl-rank sharded-rank siblings already materialize
      // here)
      .materialize(false)
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket_s"), col("_shard"))
      .orderBy(col("_ord").asc_nulls_last +: tiebreak.map(col(_).asc): _*)
    val wPrefix = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket_s")).orderBy(col("_shard"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = sharded.groupBy("bucket_s", "_shard")
      .agg(count(lit(1)).as("_cnt"))
      .withColumn("_offset", coalesce(sum("_cnt").over(wPrefix), lit(0L)))
      .drop("_cnt")
    sharded.join(broadcast(offsets), Seq("bucket_s", "_shard"))
      .withColumn("sort_rank",
        (col("_offset") + row_number().over(wLocal)).cast("long"))
      .drop("_ord", "_shard", "_offset")
  }

  /** sort_by_label / sort_by_label_desc (upstream prometheus
    * functions.go funcSortByLabel(Desc) — m3 reaches it through the
    * embedded engine, reference src/query/server/query.go:1380):
    * order the vector by the given labels compared AS STRINGS
    * ("10" < "2"), remaining labels breaking ties.
    *
    * Rendering: `sort_rank` is the series' dense position in the
    * label ordering — constant across instants (labels don't vary by
    * time), so within any instant ascending `sort_rank` IS the
    * sorted vector.
    *
    * Distributed shape: ranks are computed on the DISTINCT series
    * tuples — series cardinality, not samples — range-partitioned
    * (Spark samples the key space) so each shard ranks locally, plus
    * a broadcast shard-count prefix; the `shards`-row prefix window
    * is bounded by construction. The rank frame joins back on the
    * label key. */
  def sortByLabel(instant: DataFrame, sortLabels: Seq[String],
                  desc: Boolean, allLabels: Seq[String],
                  shards: Int = 32): DataFrame = {
    require(sortLabels.nonEmpty, "sort_by_label needs at least one label")
    val ordCols = sortLabels ++ allLabels.filterNot(sortLabels.contains)
    val ord = ordCols.map(c =>
      if (desc) col(c).cast("string").desc else col(c).cast("string").asc)
    val tuples = instant.select(allLabels.map(col): _*).distinct()
      .repartitionByRange(shards, ord: _*)
      .withColumn("_pid", spark_partition_id())
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy("_pid").orderBy(ord: _*)
    val wPrefix = org.apache.spark.sql.expressions.Window
      .orderBy("_pid")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = tuples.groupBy("_pid").agg(count(lit(1)).as("_cnt"))
      .withColumn("_off", coalesce(sum("_cnt").over(wPrefix), lit(0L)))
      .drop("_cnt")
    val ranked = tuples.join(broadcast(offsets), "_pid")
      .withColumn("sort_rank",
        (col("_off") + row_number().over(wLocal)).cast("long"))
      .drop("_pid", "_off")
    instant.join(ranked, allLabels)
  }

  /** histogram_quantile(q) (linear/histogram_quantile.go): build
    * cumulative le-buckets from raw sample values, then PromQL's
    * linear interpolation within the target bucket:
    *   q_rank = q · total;
    *   target = lowest bucket with cum ≥ q_rank;
    *   result = lo + (hi − lo) · (q_rank − cum_prev) / (cum − cum_prev)
    * The +Inf bucket returns its lower bound (PromQL behavior).
    *
    * Buckets are synthesized from the gauge values (the testdata has
    * no pre-bucketed histogram metric); boundaries are fixed so both
    * engines build identical histograms.
    */
  def histogramQuantile(samples: DataFrame, q: Double,
                        bounds: Seq[Double] = Seq(10, 25, 50, 100, 150, 200),
                        unit: String = "day"): DataFrame =
    histogramQuantileInstant(
      samples.withColumn("bucket_s", Vectors.bucketS(unit)), q, bounds)

  /** [[histogramQuantile]] over an ALREADY-instant frame
    * (…, bucket_s, value) — the range-query-mode form, where the
    * instant vector per grid T is the last sample in the staleness
    * window rather than a calendar bucket (PromQL.rangeQuery). */
  def histogramQuantileInstant(bucketed: DataFrame, q: Double,
                               bounds: Seq[Double] = Seq(10, 25, 50, 100, 150, 200)): DataFrame = {
    // assign each sample its le bucket upper bound (+Inf for overflow)
    val withLe = bucketed.withColumn("le",
      bounds.reverse.foldLeft(lit(Double.PositiveInfinity)) { (acc, b) =>
        when(col("value") <= b, lit(b)).otherwise(acc)
      })
    val counts = withLe.groupBy("name", "bucket_s", "le")
      .agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("name", "bucket_s").orderBy("le")
    val cum = counts
      .withColumn("cum", sum("c").over(w))
      .withColumn("cum_prev", coalesce(lag("cum", 1).over(w), lit(0L)))
      .withColumn("lo", coalesce(lag("le", 1).over(w), lit(0.0)))
    val wTot = org.apache.spark.sql.expressions.Window
      .partitionBy("name", "bucket_s")
    val ranked = cum.withColumn("total", max("cum").over(wTot))
      .withColumn("q_rank", lit(q) * col("total"))
      .where(col("cum") >= col("q_rank") && col("cum_prev") < col("q_rank"))
    ranked.select(
      col("name"), col("bucket_s"),
      round(
        when(col("le") === Double.PositiveInfinity, col("lo"))
          .otherwise(col("lo") + (col("le") - col("lo")) *
            (col("q_rank") - col("cum_prev")) / (col("cum") - col("cum_prev"))),
        6).as("hq_v"))
  }
}
