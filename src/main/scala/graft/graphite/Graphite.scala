package graft.graphite

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tsdb.Vectors

/** Graphite function library — a faithful subset of the reference's
  * 139 builtins (src/query/graphite/native/builtin_functions.go),
  * re-expressed as DataFrame transforms over a *path frame*:
  * (path, bucket_s, value), one row per (dot-separated series path,
  * resolution bucket).
  *
  * Graphite series are identified by dot paths; [[seriesFrame]]
  * synthesizes them from the events table
  * (`events.<type>.user<id>`), consolidated hourly. All functions
  * below are per-series column/window algebra — the per-series
  * window ops shuffle once on `path` and every downstream op reuses
  * that partitioning; series-filter functions (highestMax,
  * averageAbove) aggregate per series (tiny) and semi-join back.
  */
object Graphite {

  /** events → graphite path frame at the given resolution. */
  def seriesFrame(samples: DataFrame, unit: String = "hour"): DataFrame =
    Vectors.instant(samples, unit)
      .select(
        concat(lit("events."), col("name"), lit(".user"), col("user_id"))
          .as("path"),
        col("bucket_s"), col("value"))

  private def byPath = Window.partitionBy("path").orderBy("bucket_s")

  /** aliasByNode(series, nodes…) (builtin_functions.go aliasByNode):
    * keep only the given dot-path segments. */
  def aliasByNode(df: DataFrame, nodes: Int*): DataFrame = {
    val parts = split(col("path"), "\\.")
    val kept = nodes.map(n => element_at(parts, n + 1))
    df.withColumn("path", concat_ws(".", kept: _*))
  }

  /** scale(series, k) (builtin_functions.go:481). */
  def scale(df: DataFrame, k: Double): DataFrame =
    df.withColumn("value", col("value") * lit(k))

  /** offset(series, k). */
  def offsetSeries(df: DataFrame, k: Double): DataFrame =
    df.withColumn("value", col("value") + lit(k))

  /** absolute(series) (builtin_functions.go:474). */
  def absolute(df: DataFrame): DataFrame =
    df.withColumn("value", abs(col("value")))

  /** derivative(series) (builtin_functions.go:1535): per-series
    * difference vs the previous point (null for the first). */
  def derivative(df: DataFrame): DataFrame =
    df.withColumn("value", col("value") - lag("value", 1).over(byPath))

  /** nonNegativeDerivative(series) (builtin_functions.go:1542):
    * like derivative but counter-reset-aware — negative deltas
    * become null. */
  def nonNegativeDerivative(df: DataFrame): DataFrame =
    df.withColumn("value", {
      val d = col("value") - lag("value", 1).over(byPath)
      when(d >= 0, d)
    })

  /** perSecond(series) (builtin_functions.go:543): non-negative
    * delta divided by the bucket-seconds gap. */
  def perSecond(df: DataFrame): DataFrame =
    df.withColumn("value", {
      val d = col("value") - lag("value", 1).over(byPath)
      val dt = (col("bucket_s") - lag("bucket_s", 1).over(byPath)).cast("double")
      when(d >= 0 && dt > 0, d / dt)
    })

  /** integral(series) (builtin_functions.go:1465): running sum. */
  def integral(df: DataFrame): DataFrame =
    df.withColumn("value",
      sum("value").over(byPath.rowsBetween(Window.unboundedPreceding, 0)))

  /** integralByInterval(series, interval) (builtin_functions.go:1494):
    * running sum that resets at each interval boundary. */
  def integralByInterval(df: DataFrame, intervalS: Long): DataFrame = {
    val iv = (floor(col("bucket_s") / intervalS) * intervalS).cast("long")
    val w = Window.partitionBy(col("path"), iv.as("_iv"))
      .orderBy("bucket_s")
      .rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn("value", sum("value").over(w))
  }

  /** timeShift(series, shift) (builtin_functions.go:357): re-stamp
    * each point `shiftS` seconds later (negative = earlier). */
  def timeShift(df: DataFrame, shiftS: Long): DataFrame =
    df.withColumn("bucket_s", col("bucket_s") + lit(shiftS))

  /** movingAverage(series, window) (builtin_functions.go:2572) over
    * the last `points` buckets of each series; movingMedian /
    * movingMax / movingMin are the same frame with a different
    * aggregate (builtin_functions.go movingMedian etc.). */
  def movingAverage(df: DataFrame, points: Int): DataFrame =
    df.withColumn("value",
      avg("value").over(byPath.rowsBetween(-(points - 1), 0)))

  def movingMedian(df: DataFrame, points: Int): DataFrame =
    df.withColumn("value",
      percentile(col("value"), lit(0.5)).over(byPath.rowsBetween(-(points - 1), 0)))

  def movingMax(df: DataFrame, points: Int): DataFrame =
    df.withColumn("value",
      max("value").over(byPath.rowsBetween(-(points - 1), 0)))

  def movingMin(df: DataFrame, points: Int): DataFrame =
    df.withColumn("value",
      min("value").over(byPath.rowsBetween(-(points - 1), 0)))

  /** countSeries: number of series present at each instant. */
  def countSeries(df: DataFrame): DataFrame =
    df.groupBy("bucket_s").agg(count(lit(1)).cast("double").as("value"))
      .select(lit("countSeries").as("path"), col("bucket_s"), col("value"))

  /** currentAbove/currentBelow(series, n): keep series whose LAST
    * value is above/below n (builtin_functions.go currentAbove). */
  def currentAbove(df: DataFrame, n: Double): DataFrame =
    filterByLast(df, _ > n)

  def currentBelow(df: DataFrame, n: Double): DataFrame =
    filterByLast(df, _ < n)

  private def filterByLast(df: DataFrame, pred: Column => Column): DataFrame = {
    val keep = df.groupBy("path")
      .agg(max_by(col("value"), col("bucket_s")).as("lastv"))
      .where(pred(col("lastv"))).select("path")
    df.join(keep, Seq("path"), "left_semi")
  }

  /** averageBelow / minimumAbove: more series-filter predicates
    * (builtin_functions.go averageBelow, minimumAbove). */
  def averageBelow(df: DataFrame, n: Double): DataFrame = {
    val keep = df.groupBy("path").agg(avg("value").as("av"))
      .where(col("av") < n).select("path")
    df.join(keep, Seq("path"), "left_semi")
  }

  def minimumAbove(df: DataFrame, n: Double): DataFrame = {
    val keep = df.groupBy("path").agg(min("value").as("mn"))
      .where(col("mn") > n).select("path")
    df.join(keep, Seq("path"), "left_semi")
  }

  /** removeAboveValue / removeBelowValue: null out points beyond the
    * bound (builtin_functions.go removeAboveValue). */
  def removeAboveValue(df: DataFrame, n: Double): DataFrame =
    df.withColumn("value", when(col("value") <= n, col("value")))

  def removeBelowValue(df: DataFrame, n: Double): DataFrame =
    df.withColumn("value", when(col("value") >= n, col("value")))

  /** invert / logarithm / pow / squareRoot — pointwise math
    * (builtin_functions.go invert, logarithm, pow, squareRoot). */
  def invert(df: DataFrame): DataFrame =
    df.withColumn("value", when(col("value") =!= 0, lit(1.0) / col("value")))

  def logarithm(df: DataFrame, base: Double = 10.0): DataFrame =
    df.withColumn("value",
      when(col("value") > 0, log(col("value")) / math.log(base)))

  def powSeries(df: DataFrame, k: Double): DataFrame =
    df.withColumn("value", pow(col("value"), lit(k)))

  def squareRoot(df: DataFrame): DataFrame =
    df.withColumn("value", when(col("value") >= 0, sqrt(col("value"))))

  /** offsetToZero: shift each series down by its own minimum
    * (builtin_functions.go offsetToZero). */
  def offsetToZero(df: DataFrame): DataFrame = {
    val mins = df.groupBy("path").agg(min("value").as("_mn"))
    df.join(broadcast(mins), "path")
      .withColumn("value", col("value") - col("_mn"))
      .drop("_mn")
  }

  /** keepLastValue: forward-fill nulls with the series' last
    * non-null value (builtin_functions.go keepLastValue). */
  def keepLastValue(df: DataFrame): DataFrame =
    df.withColumn("value",
      coalesce(col("value"),
        last("value", ignoreNulls = true)
          .over(byPath.rowsBetween(Window.unboundedPreceding, -1))))

  /** summarize(series, interval, func) (builtin_functions.go
    * summarize): re-bucket to a coarser tumbling interval with the
    * given consolidation. */
  def summarize(df: DataFrame, intervalS: Long, how: String): DataFrame = {
    val bucket = (floor(col("bucket_s") / intervalS) * intervalS)
      .cast("long").as("bucket_s")
    val agg: Column = how match {
      case "sum" => sum("value")
      case "avg" => avg("value")
      case "min" => min("value")
      case "max" => max("value")
      case "last" => max_by(col("value"), col("bucket_s"))
      case h => throw new IllegalArgumentException(s"unknown summarize fn $h")
    }
    df.groupBy(col("path"), bucket).agg(agg.as("value"))
  }

  /** divideSeries(dividends, divisor) (builtin_functions.go
    * divideSeries): each dividend series divided pointwise by the
    * single divisor series (divisor frames with several series must
    * be combined first, as in Graphite). Zero divisor → null. */
  def divideSeries(dividends: DataFrame, divisor: DataFrame): DataFrame = {
    val d = divisor.select(col("bucket_s"), col("value").as("_div"))
    dividends.join(broadcast(d), "bucket_s")
      .withColumn("value", when(col("_div") =!= 0, col("value") / col("_div")))
      .drop("_div")
  }

  /** asPercent(series, total) (builtin_functions.go asPercent):
    * 100 · series / total, total being a single combined series. */
  def asPercent(series: DataFrame, total: DataFrame): DataFrame =
    divideSeries(series, total).withColumn("value", col("value") * 100.0)

  /** highestMax(series, n) (builtin_functions.go:835): keep the n
    * series with the largest maximum over the range. Deterministic
    * on ties via path order. */
  def highestMax(df: DataFrame, n: Int): DataFrame = {
    val ranked = df.groupBy("path").agg(max("value").as("mx"))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("mx").desc, col("path").asc)))
      .where(col("rk") <= n)
      .select("path")
    df.join(ranked, Seq("path"), "left_semi")
  }

  /** averageAbove(series, n) (builtin_functions.go:272): keep series
    * whose range-average exceeds n. */
  def averageAbove(df: DataFrame, n: Double): DataFrame = {
    val keep = df.groupBy("path").agg(avg("value").as("av"))
      .where(col("av") > n).select("path")
    df.join(keep, Seq("path"), "left_semi")
  }

  /** nPercentile(series, p) (builtin_functions.go:1556): each series
    * flattened to its p-th percentile value. */
  def nPercentile(df: DataFrame, p: Double): DataFrame =
    df.groupBy("path")
      .agg(percentile(col("value"), lit(p / 100.0)).as("value"))

  /** alias(series, name) (builtin_functions.go alias): rename every
    * series to a constant display name. */
  def alias(df: DataFrame, name: String): DataFrame =
    df.withColumn("path", lit(name))

  /** transformNull(series, default) (builtin_functions.go
    * transformNull): replace null values (e.g. derivative heads)
    * with a constant. */
  def transformNull(df: DataFrame, default: Double = 0.0): DataFrame =
    df.withColumn("value", coalesce(col("value"), lit(default)))

  /** sortByName: rank series lexicographically by path, attached as
    * a column (like sortByMaxima). */
  def sortByName(df: DataFrame): DataFrame = {
    val ranked = df.select("path").distinct()
      .withColumn("sort_rank", row_number().over(
        Window.orderBy(col("path").asc)))
    df.join(ranked, "path")
  }

  /** sumSeries / averageSeries (builtin_functions.go sumSeries,
    * averageSeries): collapse all series into one, named after the
    * combining function. */
  def combineSeries(df: DataFrame, how: String): DataFrame = {
    val agg: Column = how match {
      case "sum" => sum("value")
      case "avg" => avg("value")
      case "min" => min("value")
      case "max" => max("value")
      case h => throw new IllegalArgumentException(s"unknown combine fn $h")
    }
    df.groupBy("bucket_s").agg(agg.as("value"))
      .select(lit(s"${how}Series").as("path"), col("bucket_s"), col("value"))
  }

  /** groupByNode(series, node, func) (builtin_functions.go
    * groupByNode): combine series sharing the given path segment. */
  def groupByNode(df: DataFrame, node: Int, how: String): DataFrame = {
    val seg = element_at(split(col("path"), "\\."), node + 1)
    val agg: Column = how match {
      case "sum" => sum("value")
      case "avg" => avg("value")
      case "min" => min("value")
      case "max" => max("value")
      case h => throw new IllegalArgumentException(s"unknown group fn $h")
    }
    df.groupBy(seg.as("path"), col("bucket_s")).agg(agg.as("value"))
  }

  /** exclude(series, pattern) / grep(series, pattern)
    * (builtin_functions.go exclude, grep): drop / keep series whose
    * path matches the regex (substring semantics, as in Graphite). */
  def exclude(df: DataFrame, pattern: String): DataFrame =
    df.where(!col("path").rlike(pattern))

  def grep(df: DataFrame, pattern: String): DataFrame =
    df.where(col("path").rlike(pattern))

  /** maximumAbove(series, n) (builtin_functions.go maximumAbove):
    * keep series whose maximum exceeds n. */
  def maximumAbove(df: DataFrame, n: Double): DataFrame = {
    val keep = df.groupBy("path").agg(max("value").as("mx"))
      .where(col("mx") > n).select("path")
    df.join(keep, Seq("path"), "left_semi")
  }

  /** limit(series, n) (builtin_functions.go limit): first n series
    * in path order. */
  def limitSeries(df: DataFrame, n: Int): DataFrame = {
    val keep = df.select("path").distinct()
      .withColumn("rk", row_number().over(Window.orderBy(col("path").asc)))
      .where(col("rk") <= n).select("path")
    df.join(keep, Seq("path"), "left_semi")
  }

  /** sortByMaxima(series): rank series by their maximum, attached as
    * a column (row order itself is not part of a frame's identity). */
  def sortByMaxima(df: DataFrame): DataFrame = {
    val ranked = df.groupBy("path").agg(max("value").as("mx"))
      .withColumn("sort_rank", row_number().over(
        Window.orderBy(col("mx").desc, col("path").asc)))
      .select("path", "sort_rank")
    df.join(ranked, "path")
  }
}
