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

  /** events → graphite path frame at the given resolution, with an
    * optional consolidation function (graphite's consolidateBy; the
    * default `last` mirrors m3's instant consolidation). */
  def seriesFrame(samples: DataFrame, unit: String = "hour",
                  how: String = "last"): DataFrame =
    Vectors.consolidate(samples, how, unit)
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

  /** nonNegativeDerivative(series, maxValue=NaN)
    * (builtin_functions.go:1542): per-step delta, negatives null —
    * unless `maxValue` is given and the new value fits under it, in
    * which case the delta is read as a counter wrap:
    * (maxValue − prev) + value + 1. */
  def nonNegativeDerivative(df: DataFrame,
                            maxValue: Double = Double.NaN): DataFrame =
    df.withColumn("value", {
      val prev = lag("value", 1).over(byPath)
      val d = col("value") - prev
      if (maxValue.isNaN) when(d >= 0, d)
      else when(d >= 0, d)
        .when(lit(maxValue) >= col("value"),
          lit(maxValue) - prev + col("value") + 1.0)
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

  /** movingAverage(series, window, xff) (builtin_functions.go:2572)
    * over the last `points` buckets of each series; movingMedian /
    * movingMax / movingMin / movingSum are the same frame with a
    * different aggregate (builtin_functions.go movingMedian etc.).
    *
    * The moving family's xFilesFactor gate (builtin_functions.go:897
    * effectiveXFF): a window's output is null unless its non-null
    * fraction of the nominal window size reaches the factor; the
    * registered default 0 keeps every window. */
  private def movingXff(points: Int, xff: Double, out: Column): Column =
    if (xff <= 0.0) out
    else {
      val nn = count(col("value")).over(byPath.rowsBetween(-(points - 1), 0))
      when(nn.cast("double") / points >= xff, out)
    }

  def movingAverage(df: DataFrame, points: Int, xff: Double = 0.0): DataFrame =
    df.withColumn("value", movingXff(points, xff,
      avg("value").over(byPath.rowsBetween(-(points - 1), 0))))

  /** movingMedian (builtin_functions.go:2358 movingMedianHelper):
    * the reference takes sorted-window[k/2] — the UPPER median for
    * even non-null counts, not the midpoint average its own
    * medianSeries uses. collect_list skips nulls, so k is the
    * non-null count; the array is bounded by the window size. */
  def movingMedian(df: DataFrame, points: Int, xff: Double = 0.0): DataFrame =
    df.withColumn("value", {
      val arr = sort_array(collect_list(col("value"))
        .over(byPath.rowsBetween(-(points - 1), 0)))
      movingXff(points, xff, when(size(arr) > 0,
        element_at(arr, (size(arr) / 2).cast("int") + 1)))
    })

  def movingMax(df: DataFrame, points: Int, xff: Double = 0.0): DataFrame =
    df.withColumn("value", movingXff(points, xff,
      max("value").over(byPath.rowsBetween(-(points - 1), 0))))

  def movingMin(df: DataFrame, points: Int, xff: Double = 0.0): DataFrame =
    df.withColumn("value", movingXff(points, xff,
      min("value").over(byPath.rowsBetween(-(points - 1), 0))))

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

  /** keepLastValue(series, limit=-1): forward-fill nulls with the
    * series' last non-null value; a positive `limit` fills only gap
    * runs of at most that many consecutive nulls (longer gaps stay
    * null — builtin_functions.go:576, default at :2911). Leading
    * nulls have no source value and stay null in both engines.
    *
    * The limited form groups each gap with its preceding non-null
    * row (running non-null count), so the run-length window
    * partitions per gap — bounded by one gap's length, never the
    * series. */
  /** Groups each null gap with its preceding non-null row (_grp =
    * running non-null count), attaching the gap's run length (_run)
    * and the group's one non-null value (_head) — the shared stage
    * of keepLastValue's and interpolate's limit forms. The per-gap
    * window is bounded by one gap's length, never the series. */
  private def withGapRuns(df: DataFrame): DataFrame = {
    val wGap = Window.partitionBy("path", "_grp")
    df.withColumn("_grp",
        count(col("value")).over(byPath.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("_run", sum(col("value").isNull.cast("long")).over(wGap))
      .withColumn("_head", max(col("value")).over(wGap))
  }

  def keepLastValue(df: DataFrame, limit: Int = -1): DataFrame =
    if (limit < 0)
      df.withColumn("value",
        coalesce(col("value"),
          last("value", ignoreNulls = true)
            .over(byPath.rowsBetween(Window.unboundedPreceding, -1))))
    else
      withGapRuns(df)
        .withColumn("value",
          when(col("value").isNotNull, col("value"))
            .when(col("_run") <= limit, col("_head")))
        .drop("_grp", "_run", "_head")

  /** Within-series re-bucketing aggregate — the full
    * SafeAggregationFns set (common/aggregation.go:70) over one
    * series' interval. Unlike [[combineAgg]] (the cross-series
    * combine), `last` here is the latest NON-NULL sample in time
    * (SafeLast) and `diff` is the first non-null minus the sum of
    * the rest (SafeDiff = 2·first − total). */
  private def summarizeAgg(how: String): Column = {
    val nnKey = when(col("value").isNotNull, col("bucket_s"))
    how match {
      case "sum" | "total"    => sum("value")
      case "avg" | "average"  => avg("value")
      case "min"              => min("value")
      case "max"              => max("value")
      case "median"           => percentile(col("value"), lit(0.5))
      case "multiply"         => product(col("value"))
      case "range"            => max("value") - min("value")
      case "stddev" | "stdev" => stddev_pop(col("value"))
      case "count"            => count(col("value")).cast("double")
      case "last" | "current" => max_by(col("value"), nnKey)
      case "diff"             => min_by(col("value"), nnKey) * 2 - sum("value")
      case h => throw new IllegalArgumentException(s"unknown summarize fn $h")
    }
  }

  /** summarize(series, interval, func) (summarize.go:35): re-bucket
    * to a coarser tumbling interval (epoch-aligned — the reference's
    * alignToFrom=false default) with the given consolidation. */
  def summarize(df: DataFrame, intervalS: Long, how: String): DataFrame = {
    val bucket = (floor(col("bucket_s") / intervalS) * intervalS)
      .cast("long").as("bucket_s")
    df.groupBy(col("path"), bucket).agg(summarizeAgg(how).as("value"))
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

  /** asPercent with a constant total (builtin_functions.go:1186
    * float64 case): plain scale, zero divisor → null like
    * [[divideSeries]]. */
  def asPercent(series: DataFrame, total: Double): DataFrame =
    series.withColumn("value",
      when(lit(total) =!= 0.0, col("value") / lit(total) * 100.0))

  // ------------- two-phase series ranking (scale path) -------------

  /** Global rank of a per-series reduced frame (path, _red) without a
    * single-partition window: (1) percentile-shard on the reduced
    * value (32 boundaries from one tiny agg, broadcast); (2)
    * row_number within each shard; (3) global rank = local rank +
    * prefix count of preceding shards (≤ shards rows). Null reduced
    * values shard last and order last, preserving the `desc`-mode
    * null placement of a plain `orderBy(desc)`. Same pattern as
    * Transform.sortSeries — no task ever sees more than ~1/shards of
    * the series. Returns (path, sort_rank). */
  private[graphite] def rankReduced(reduced: DataFrame, desc: Boolean,
                                    shards: Int = 32): DataFrame = {
    val ord = if (desc) -col("_red") else col("_red")
    val qs = (1 until shards).map(_.toDouble / shards)
    val withOrd = reduced.withColumn("_ord", ord)
    // sketch bounds: shard balance only — the rank stays exact
    // whatever the cut points, and exact percentile would buffer
    // every distinct value in one aggregation state
    val bounds = withOrd.agg(
      approx_percentile(col("_ord"), typedlit(qs), lit(1000)).as("_bs"))
    val sharded = withOrd.crossJoin(broadcast(bounds))
      .withColumn("_shard",
        when(col("_ord").isNull, lit(shards))
          .otherwise(size(filter(col("_bs"), b => b < col("_ord")))))
      .drop("_bs")
    val wLocal = Window.partitionBy("_shard")
      .orderBy(col("_ord").asc_nulls_last, col("path").asc)
    val wPrefix = Window.orderBy("_shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sharded.groupBy("_shard")
      .agg(count(lit(1)).as("_cnt"))
      .withColumn("_offset", coalesce(sum("_cnt").over(wPrefix), lit(0L)))
      .drop("_cnt")
    sharded.join(broadcast(offsets), "_shard")
      .withColumn("sort_rank",
        (col("_offset") + row_number().over(wLocal)).cast("long"))
      .select("path", "sort_rank")
  }

  /** Lexicographic rank of distinct paths, two-phase: shard by an
    * order-preserving character prefix, local row_number per shard,
    * prefix-count offsets (≤ #prefixes rows, broadcast). Replaces
    * the unpartitioned `Window.orderBy(path)` straggler.
    *
    * Graphite namespaces share a common root (`events.…`), so a
    * naive leading-2-chars shard would put EVERY path in one shard —
    * the straggler back by another name. The shard key is therefore
    * the two characters AFTER the list-wide longest common prefix
    * (one 1-row min/max aggregate, broadcast; the common prefix of
    * the whole set equals the common prefix of its min and max).
    * Returns (path, sort_rank). */
  /** The reference's natural-sort key (ts/series.go:120
    * digitsPrefixed = %010d after Atoi): digit runs are
    * leading-zero-normalized then left-padded to AT LEAST 10 — never
    * truncated, so longer numbers still order after shorter ones.
    * Equal-key paths (`a1`/`a01`) tie-break on the raw path for
    * determinism (the reference's sort.Stable). */
  private def naturalKey(p: Column): Column =
    array_join(transform(
      split(p, "(?<=\\D)(?=\\d)|(?<=\\d)(?=\\D)"),
      t => when(t.rlike("^\\d+$"), {
        val n = regexp_replace(t, "^0+(?=\\d)", "")
        when(length(n) < 10, lpad(n, 10, "0")).otherwise(n)
      }).otherwise(t)), "")

  private[graphite] def rankPaths(paths: DataFrame, natural: Boolean = false,
                                  desc: Boolean = false): DataFrame = {
    val distinctPaths = paths.select("path").distinct()
      .withColumn("_key", if (natural) naturalKey(col("path")) else col("path"))
    val mm = distinctPaths.agg(min("_key").as("_mn"), max("_key").as("_mx"))
      .withColumn("_cpl", {
        // longest common prefix length of (_mn, _mx) — scalar fold:
        // acc advances to i only while every prefix up to i matched
        val upTo = least(length(col("_mn")), length(col("_mx")))
        aggregate(
          sequence(lit(1), greatest(upTo, lit(1))),
          lit(0),
          (acc, i) => when(
            acc === i - 1 &&
              col("_mn").substr(lit(1), i) === col("_mx").substr(lit(1), i),
            i).otherwise(acc))
      })
    val sharded = distinctPaths.crossJoin(broadcast(
        mm.select(col("_cpl"))))
      .withColumn("_shard", substring2(col("_key"), col("_cpl") + 1, 2))
      .drop("_cpl")
    val wLocal = Window.partitionBy("_shard").orderBy(
      if (desc) col("_key").desc else col("_key").asc,
      if (desc) col("path").desc else col("path").asc)
    val wPrefix = Window
      .orderBy(if (desc) col("_shard").desc else col("_shard").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sharded.groupBy("_shard")
      .agg(count(lit(1)).as("_cnt"))
      .withColumn("_offset", coalesce(sum("_cnt").over(wPrefix), lit(0L)))
      .drop("_cnt")
    sharded.join(broadcast(offsets), "_shard")
      .withColumn("sort_rank",
        (col("_offset") + row_number().over(wLocal)).cast("long"))
      .select("path", "sort_rank")
  }

  /** substring with Column arguments. */
  private def substring2(str: Column, pos: Column, len: Int): Column =
    str.substr(pos, lit(len))

  /** Per-series reducer for the highest/lowest/sortBy family —
    * graphite's SeriesReducerApproach set (src/query/graphite/ts). */
  private[graphite] def reducer(f: String): Column = f match {
    case "avg" | "average"    => avg("value")
    case "sum" | "total"      => sum("value")
    case "max"                => max("value")
    case "min"                => min("value")
    case "last" | "current"   => max_by(col("value"), col("bucket_s"))
    case "stddev" | "stdev"   => stddev_pop(col("value"))
    case "median"             => percentile(col("value"), lit(0.5))
    case "count"              => count(col("value")).cast("double")
    case other => throw new IllegalArgumentException(s"unknown reducer $other")
  }

  private def reduceSeries(df: DataFrame, f: String): DataFrame =
    df.groupBy("path").agg(reducer(f).as("_red"))

  /** highest(series, n, f) (builtin_functions.go:817): keep the n
    * series with the largest f-reduced value. Deterministic on ties
    * via path order; two-phase rank (no global-window straggler). */
  def highest(df: DataFrame, n: Int, f: String): DataFrame = {
    val keep = rankReduced(reduceSeries(df, f), desc = true)
      .where(col("sort_rank") <= n).select("path")
    df.join(keep, Seq("path"), "left_semi")
  }

  /** lowest(series, n, f) (builtin_functions.go:874). */
  def lowest(df: DataFrame, n: Int, f: String): DataFrame = {
    val keep = rankReduced(reduceSeries(df, f), desc = false)
      .where(col("sort_rank") <= n).select("path")
    df.join(keep, Seq("path"), "left_semi")
  }

  /** highestMax(series, n) (builtin_functions.go:835). */
  def highestMax(df: DataFrame, n: Int): DataFrame = highest(df, n, "max")

  /** highestAverage / highestCurrent (builtin_functions.go:849,842). */
  def highestAverage(df: DataFrame, n: Int): DataFrame = highest(df, n, "avg")
  def highestCurrent(df: DataFrame, n: Int): DataFrame = highest(df, n, "last")

  /** lowestAverage / lowestCurrent (builtin_functions.go:885,892). */
  def lowestAverage(df: DataFrame, n: Int): DataFrame = lowest(df, n, "avg")
  def lowestCurrent(df: DataFrame, n: Int): DataFrame = lowest(df, n, "last")

  /** mostDeviant(series, n) (builtin_functions.go:867): the n series
    * with the largest standard deviation. */
  def mostDeviant(df: DataFrame, n: Int): DataFrame = highest(df, n, "stddev")

  /** sortBy(series, fn, reverse) (builtin_functions.go:77): rank
    * every series by the f-reduced value, attached as `sort_rank`. */
  def sortBy(df: DataFrame, f: String, reverse: Boolean = false): DataFrame = {
    val minFirst = f.startsWith("min")
    val asc = if (reverse) !minFirst else minFirst
    df.join(rankReduced(reduceSeries(df, f), desc = !asc), "path")
  }

  /** sortByTotal / sortByMinima (builtin_functions.go:130,208). */
  def sortByTotal(df: DataFrame): DataFrame = sortBy(df, "sum")
  def sortByMinima(df: DataFrame): DataFrame = sortBy(df, "min")

  /** filterSeries(series, func, operator, n) (builtin_functions.go:
    * 685): general reducer + comparison series filter. */
  def filterSeries(df: DataFrame, f: String, op: String, n: Double): DataFrame = {
    val red = col("_red")
    val pred = op match {
      case ">"  => red > n
      case ">=" => red >= n
      case "<"  => red < n
      case "<=" => red <= n
      case "="  | "==" => red === n
      case "!=" => red =!= n
      case other => throw new IllegalArgumentException(s"unknown operator $other")
    }
    val keep = reduceSeries(df, f).where(pred).select("path")
    df.join(keep, Seq("path"), "left_semi")
  }

  /** averageAbove(series, n) (builtin_functions.go:272): keep series
    * whose range-average exceeds n. */
  def averageAbove(df: DataFrame, n: Double): DataFrame = {
    val keep = df.groupBy("path").agg(avg("value").as("av"))
      .where(col("av") > n).select("path")
    df.join(keep, Seq("path"), "left_semi")
  }

  /** Exact replay of the reference's GetPercentile
    * (common/percentiles.go:61): fractional rank p/100·(n+1) over
    * the sorted non-null values, rounded UP to the next whole rank
    * when not interpolating (clamped to [1, n]); linear
    * interpolation toward the next value otherwise. NOTE Spark's
    * `percentile` interpolates over (n−1) ranks — a different
    * convention; graphite parity needs this one. */
  private[graphite] def getPercentile(sortedArr: Column, p: Double,
                                      interpolate: Boolean = false): Column = {
    val n = size(sortedArr)
    val fr = lit(p / 100.0) * (n + 1).cast("double")
    val rank0 = floor(fr)
    val frac = fr - rank0
    val rank = (if (interpolate) rank0 else rank0 + ceil(frac)).cast("int")
    val idx = greatest(least(rank, n), lit(1))
    val base = element_at(sortedArr, idx)
    val out =
      if (!interpolate) base
      else {
        val next = element_at(sortedArr, greatest(least(rank + 1, n), lit(1)))
        when(rank =!= n, base + frac * (next - base)).otherwise(base)
      }
    when(n > 0, out)
  }

  /** nPercentile(series, p) (builtin_functions.go:1556 →
    * common/percentiles.go NPercentile): each series becomes a
    * CONSTANT series over its own time range — every point carries
    * the p-th percentile value (GetPercentile with
    * interpolate=false, NOT the interpolated quantile) and the
    * series renames to `nPercentile(name, p)` with the %.3f
    * percentile format (percentiles.go FloatingPointFormat).
    * Keeping the time axis is what lets the result compose under
    * further functions (maxSeries(nPercentile(...)) — the r12 fuzz
    * find: the old flattened one-row-per-path shape broke every
    * downstream consumer expecting bucket_s). Series with no
    * non-null points drop (SafeValues: the NaN-percentile guard).
    * The per-path percentile frame is one row per series →
    * broadcast back onto the buckets. */
  def nPercentile(df: DataFrame, p: Double): DataFrame = {
    val pct = df.groupBy("path")
      .agg(getPercentile(sort_array(collect_list(col("value"))), p).as("_pv"))
      .where(col("_pv").isNotNull)
    df.select("path", "bucket_s")
      .join(broadcast(pct), Seq("path"))
      .select(
        concat(lit("nPercentile("), col("path"),
          lit(", " + f"$p%.3f" + ")")).as("path"),
        col("bucket_s"), col("_pv").as("value"))
  }

  /** alias(series, name) (builtin_functions.go alias): rename every
    * series to a constant display name. */
  def alias(df: DataFrame, name: String): DataFrame =
    df.withColumn("path", lit(name))

  /** transformNull(series, default) (builtin_functions.go
    * transformNull): replace null values (e.g. derivative heads)
    * with a constant. */
  def transformNull(df: DataFrame, default: Double = 0.0): DataFrame =
    df.withColumn("value", coalesce(col("value"), lit(default)))

  /** sortByName(series, natural=false, reverse=false)
    * (builtin_functions.go:101, defaults at :3001): rank series by
    * path (two-phase prefix-shard rank); `natural` compares embedded
    * digit runs numerically, `reverse` inverts the order. */
  def sortByName(df: DataFrame, natural: Boolean = false,
                 reverse: Boolean = false): DataFrame =
    df.join(rankPaths(df, natural, reverse), "path")

  /** Per-instant cross-series combine — the aggregate(series, fname)
    * dispatch set (aggregation_functions.go:300): sum, avg, min, max,
    * median, multiply, range, stddev (population), count, last (=
    * value of the path-order-last series at each instant), diff (=
    * first-in-path-order minus the sum of the rest). */
  private def combineAgg(how: String): Column = how match {
    case "sum" | "total"        => sum("value")
    case "avg" | "average"      => avg("value")
    case "min"                  => min("value")
    case "max"                  => max("value")
    case "median"               => percentile(col("value"), lit(0.5))
    case "multiply"             => product(col("value"))
    case "range" | "rangeOf"    => max("value") - min("value")
    case "stddev" | "stdev"     => stddev_pop(col("value"))
    case "count"                => count(col("value")).cast("double")
    case "last" | "current"     => max_by(col("value"), col("path"))
    case "diff" => sum(when(col("_first"), col("value"))
      .otherwise(-col("value")))
    case h => throw new IllegalArgumentException(s"unknown combine fn $h")
  }

  /** sumSeries / averageSeries / … (aggregation_functions.go:40-120):
    * collapse all series into one, named after the combining
    * function. */
  def combineSeries(df: DataFrame, how: String): DataFrame = {
    val prepared =
      if (how == "diff")
        df.crossJoin(broadcast(df.agg(min("path").as("_fp"))))
          .withColumn("_first", col("path") === col("_fp"))
      else df
    prepared.groupBy("bucket_s").agg(combineAgg(how).as("value"))
      .select(lit(s"${how}Series").as("path"), col("bucket_s"), col("value"))
  }

  /** aggregate(series, fname) (aggregation_functions.go:300). */
  def aggregateSeries(df: DataFrame, fname: String): DataFrame = {
    val canon = fname match {
      case "total" => "sum"
      case "average" => "avg"
      case "rangeOf" => "range"
      case "current" => "last"
      case "stdev" => "stddev"
      case f => f
    }
    combineSeries(df, canon)
  }

  /** diffSeries / multiplySeries / rangeOfSeries / stddevSeries
    * (aggregation_functions.go:49,74; :2212; :171). */
  def diffSeries(df: DataFrame): DataFrame = combineSeries(df, "diff")
  def multiplySeries(df: DataFrame): DataFrame = combineSeries(df, "multiply")
  def rangeOfSeries(df: DataFrame): DataFrame = combineSeries(df, "range")
  def stddevSeries(df: DataFrame): DataFrame = combineSeries(df, "stddev")

  /** percentileOfSeries(series, p, interpolate=false)
    * (builtin_functions.go:1562, default at :2971): the p-th
    * percentile across series at each instant — GetPercentile
    * semantics, optionally interpolated. The per-instant array is
    * bounded by the series count of the selection. */
  def percentileOfSeries(df: DataFrame, p: Double,
                         interpolate: Boolean = false): DataFrame =
    df.groupBy("bucket_s")
      .agg(getPercentile(sort_array(collect_list(col("value"))), p,
        interpolate).as("value"))
      .select(lit("percentileOfSeries").as("path"), col("bucket_s"),
        col("value"))

  /** aggregateLine(series, f) (builtin_functions.go:2273): constant
    * line at the f-reduced value of the path-order-first series. */
  def aggregateLine(df: DataFrame, f: String): DataFrame = {
    val firstPath = df.agg(min("path").as("_fp"))
    val v = df.join(broadcast(firstPath), col("path") === col("_fp"))
      .groupBy().agg(reducer(f).as("value"))
    df.select("bucket_s").distinct().crossJoin(broadcast(v))
      .select(lit("aggregateLine").as("path"), col("bucket_s"), col("value"))
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
    * in path order (two-phase prefix-shard rank). */
  def limitSeries(df: DataFrame, n: Int): DataFrame = {
    val keep = rankPaths(df).where(col("sort_rank") <= n).select("path")
    df.join(keep, Seq("path"), "left_semi")
  }

  /** sortByMaxima(series): rank series by their maximum, attached as
    * a column (row order itself is not part of a frame's identity). */
  def sortByMaxima(df: DataFrame): DataFrame =
    df.join(rankReduced(reduceSeries(df, "max"), desc = true), "path")

  /** Fusion of `sortBy<f>(highest(series, n, f))` — the common
    * dashboard composition ("top n, ordered"). Composed naively it
    * reduces and ranks the series set TWICE and re-evaluates the
    * input frame for each phase (4 source scans); but the global
    * ranks of the top n are exactly 1..n under the same comparator,
    * so one reduce + one rank serves both the keep-filter and the
    * attached rank: the n-row ranked keep list broadcasts onto the
    * single output join. Row-identical to the composition
    * (spec-proven), half the scans, one rank phase instead of two. */
  def highestRanked(df: DataFrame, n: Int, f: String): DataFrame = {
    val keep = rankReduced(reduceSeries(df, f), desc = true)
      .where(col("sort_rank") <= n)
    df.join(broadcast(keep), "path")
  }

  // ------------- wildcard grouping family -------------

  /** combineSeriesWithWildcards (aggregation_functions.go:420): group
    * series by the path with the given segment positions removed,
    * combining each group per instant. sumSeriesWithWildcards /
    * averageSeriesWithWildcards / multiplySeriesWithWildcards /
    * aggregateWithWildcards (aggregation_functions.go:334,345,358,
    * 370) are the registered forms. */
  def aggregateWithWildcards(df: DataFrame, how: String,
                             positions: Seq[Int]): DataFrame = {
    val parts = split(col("path"), "\\.")
    val posLit = typedlit(positions)
    val key = concat_ws(".",
      filter(parts, (seg, i) => !array_contains(posLit, i)))
    df.withColumn("path", key)
      .groupBy("path", "bucket_s").agg(combineAgg(how).as("value"))
  }

  def sumSeriesWithWildcards(df: DataFrame, positions: Seq[Int]): DataFrame =
    aggregateWithWildcards(df, "sum", positions)
  def averageSeriesWithWildcards(df: DataFrame, positions: Seq[Int]): DataFrame =
    aggregateWithWildcards(df, "avg", positions)
  def multiplySeriesWithWildcards(df: DataFrame, positions: Seq[Int]): DataFrame =
    aggregateWithWildcards(df, "multiply", positions)

  /** groupByNodes(series, fn, nodes…) (aggregation_functions.go
    * groupByNodes): keep only the given segments as the group key —
    * the multi-node generalization of groupByNode. */
  def groupByNodes(df: DataFrame, how: String, nodes: Seq[Int]): DataFrame = {
    val parts = split(col("path"), "\\.")
    val key = concat_ws(".", nodes.map(n => element_at(parts, n + 1)): _*)
    df.withColumn("path", key)
      .groupBy("path", "bucket_s").agg(combineAgg(how).as("value"))
  }

  // ------------- per-series window / pointwise additions -------------

  /** changed(series) (builtin_functions.go:2301, common
    * basic_functions.go:261): 1 when the value is non-null and
    * differs from the last non-null value before it, else 0. */
  def changed(df: DataFrame): DataFrame = {
    val prevNonNull = last("value", ignoreNulls = true)
      .over(byPath.rowsBetween(Window.unboundedPreceding, -1))
    df.withColumn("value",
      when(col("value").isNotNull && prevNonNull.isNotNull &&
        col("value") =!= prevNonNull, lit(1.0)).otherwise(lit(0.0)))
  }

  /** stdev(series, points, windowTolerance) (builtin_functions.go:
    * 2205, common/transform.go:211): moving population standard
    * deviation over the last `points` rows; emitted only when the
    * valid-point ratio reaches the tolerance. */
  def stdev(df: DataFrame, points: Int,
            windowTolerance: Double = 0.1): DataFrame = {
    val w = byPath.rowsBetween(-(points - 1), 0)
    val n = count(col("value")).over(w)
    df.withColumn("value",
      when(n > 0 && n.cast("double") / lit(points.toDouble) >= windowTolerance,
        stddev_pop(col("value")).over(w)))
  }

  /** movingSum(series, points) (builtin_functions.go:2561). */
  def movingSum(df: DataFrame, points: Int, xff: Double = 0.0): DataFrame =
    df.withColumn("value", movingXff(points, xff,
      sum("value").over(byPath.rowsBetween(-(points - 1), 0))))

  /** movingWindow(series, points, fn) (builtin_functions.go
    * movingWindow): dispatch to the moving* family. */
  def movingWindow(df: DataFrame, points: Int, how: String,
                   xff: Double = 0.0): DataFrame =
    how match {
      case "avg" | "average" => movingAverage(df, points, xff)
      case "sum"             => movingSum(df, points, xff)
      case "max"             => movingMax(df, points, xff)
      case "min"             => movingMin(df, points, xff)
      case "median"          => movingMedian(df, points, xff)
      case h => throw new IllegalArgumentException(s"unknown moving fn $h")
    }

  /** delay(series, steps) (builtin_functions.go:403): shift values
    * down by `steps` rows per series, keeping timestamps. */
  def delay(df: DataFrame, steps: Int): DataFrame =
    df.withColumn("value", lag("value", steps).over(byPath))

  /** interpolate(series, limit=-1) (builtin_functions.go:1376):
    * linearly interpolate null gaps between non-null neighbours
    * (time-weighted over the bucket axis; head/tail nulls stay
    * null). A non-negative `limit` fills only gap runs of at most
    * that many nulls — the observable effect of the reference's
    * consecutive-NaN counter (longer runs anchor on a NaN and emit
    * NaN, i.e. stay null). Same per-gap grouping as
    * [[keepLastValue]]: the run-length window is bounded by one
    * gap's length. */
  def interpolate(df: DataFrame, limit: Int = -1): DataFrame = {
    val before = byPath.rowsBetween(Window.unboundedPreceding, -1)
    val after = byPath.rowsBetween(1, Window.unboundedFollowing)
    val prevV = last("value", ignoreNulls = true).over(before)
    val prevB = last(when(col("value").isNotNull, col("bucket_s")),
      ignoreNulls = true).over(before)
    val nextV = first("value", ignoreNulls = true).over(after)
    val nextB = first(when(col("value").isNotNull, col("bucket_s")),
      ignoreNulls = true).over(after)
    val fill = when(col("value").isNotNull, col("value"))
      .when(prevV.isNotNull && nextV.isNotNull && nextB =!= prevB,
        prevV + (nextV - prevV) *
          (col("bucket_s") - prevB).cast("double") /
          (nextB - prevB).cast("double"))
    if (limit < 0) df.withColumn("value", fill)
    else
      withGapRuns(df)
        .withColumn("value",
          when(col("value").isNotNull || col("_run") <= limit, fill))
        .drop("_grp", "_run", "_head")
  }

  /** isNonNull(series) (builtin_functions.go:566). */
  def isNonNull(df: DataFrame): DataFrame =
    df.withColumn("value",
      when(col("value").isNotNull, lit(1.0)).otherwise(lit(0.0)))

  /** roundFunction(series, precision) (builtin_functions.go:617). */
  def roundSeries(df: DataFrame, precision: Int): DataFrame =
    df.withColumn("value", round(col("value"), precision))

  /** scaleToSeconds(series, seconds) (builtin_functions.go:494):
    * value · seconds / step. `stepS` is the frame resolution
    * (seriesFrame consolidates hourly → 3600). */
  def scaleToSeconds(df: DataFrame, seconds: Int,
                     stepS: Long = 3600L): DataFrame =
    df.withColumn("value",
      col("value") * (lit(seconds.toDouble) / lit(stepS.toDouble)))

  /** substr(series, start, stop) (builtin_functions.go:1793): keep
    * path segments [start, stop) with graphite's negative indexing;
    * stop = 0 means to-the-end. */
  def substrSeries(df: DataFrame, start: Int, stop: Int = 0): DataFrame = {
    val parts = split(col("path"), "\\.")
    val n = size(parts)
    val st = if (start >= 0) lit(start) else lit(start) + n
    val sp = if (stop == 0) n else if (stop > 0) lit(stop) else lit(stop) + n
    df.withColumn("path",
      concat_ws(".", slice(parts, st + 1, greatest(sp - st, lit(0)))))
  }

  /** timeSlice(series, startS, endS) (builtin_functions.go:434):
    * null out values outside the inclusive epoch-second range. */
  def timeSlice(df: DataFrame, startS: Long, endS: Long): DataFrame =
    df.withColumn("value",
      when(col("bucket_s").between(startS, endS), col("value")))

  /** sustainedAbove / sustainedBelow(series, n, interval)
    * (builtin_functions.go:764,768): keep the value only once the
    * comparison has held for `intervalS` seconds (= intervalS/stepS
    * consecutive rows); otherwise emit the zero value
    * (n − |n| above, n + |n| below). */
  def sustainedAbove(df: DataFrame, n: Double, intervalS: Long,
                     stepS: Long = 3600L): DataFrame =
    sustainedCompare(df, col("value") >= n, n - math.abs(n),
      (intervalS / stepS).toInt)

  def sustainedBelow(df: DataFrame, n: Double, intervalS: Long,
                     stepS: Long = 3600L): DataFrame =
    sustainedCompare(df, col("value") <= n, n + math.abs(n),
      (intervalS / stepS).toInt)

  private def sustainedCompare(df: DataFrame, cond: Column,
                               zeroValue: Double, minSteps: Int): DataFrame = {
    val withRn = df.withColumn("_rn", row_number().over(byPath))
    val lastFail = max(when(!coalesce(cond, lit(false)), col("_rn")))
      .over(Window.partitionBy("path").orderBy("bucket_s")
        .rowsBetween(Window.unboundedPreceding, 0))
    withRn.withColumn("_streak", col("_rn") - coalesce(lastFail, lit(0)))
      .withColumn("value",
        when(col("_streak") >= minSteps, col("value")).otherwise(zeroValue))
      .drop("_rn", "_streak")
  }

  /** removeAbovePercentile / removeBelowPercentile(series, p)
    * (builtin_functions.go:2228,2240): null out points beyond the
    * series' own p-th percentile — the cutoff is GetPercentile
    * (exclusive rank, via common.RemoveByPercentile -> NPercentile),
    * not the interpolated quantile. */
  def removeAbovePercentile(df: DataFrame, p: Double): DataFrame = {
    val cut = df.groupBy("path")
      .agg(getPercentile(sort_array(collect_list(col("value"))), p).as("_cut"))
    df.join(broadcast(cut), "path")
      .withColumn("value", when(col("value") <= col("_cut"), col("value")))
      .drop("_cut")
  }

  def removeBelowPercentile(df: DataFrame, p: Double): DataFrame = {
    val cut = df.groupBy("path")
      .agg(getPercentile(sort_array(collect_list(col("value"))), p).as("_cut"))
    df.join(broadcast(cut), "path")
      .withColumn("value", when(col("value") >= col("_cut"), col("value")))
      .drop("_cut")
  }

  /** removeEmptySeries(series, xFilesFactor) (builtin_functions.go:
    * 793): drop series whose non-null ratio is below the factor (and
    * all-null series always). */
  def removeEmptySeries(df: DataFrame, xFilesFactor: Double = 0.0): DataFrame = {
    val keep = df.groupBy("path")
      .agg(count(col("value")).as("_nn"), count(lit(1)).as("_n"))
      .where(col("_nn") > 0 &&
        col("_nn").cast("double") / col("_n") >= xFilesFactor)
      .select("path")
    df.join(keep, Seq("path"), "left_semi")
  }

  // ------------- grid-producing functions -------------

  /** constantLine(value) (builtin_functions.go:299): a constant
    * series over the input frame's bucket grid (the reference draws
    * over the query range; the frame range is the batch analogue). */
  def constantLine(base: DataFrame, value: Double,
                   label: String = "constantLine"): DataFrame =
    base.select("bucket_s").distinct()
      .select(lit(label).as("path"), col("bucket_s"),
        lit(value).as("value"))

  /** randomWalk(name, step=60) (builtin_functions.go:2253, registered
    * under the "randomWalk" alias at :3055): a synthetic series over
    * the input frame's bucket-grid span, one uniform draw in
    * [-0.5, 0.5) per step. The reference seeds from the wall clock —
    * every run is a different valid draw of the same process — so the
    * seed here derives from the series name instead, keeping runs
    * reproducible (and spec-assertable) while remaining a legal draw. */
  def randomWalk(base: DataFrame, name: String, stepS: Long = 60L): DataFrame = {
    require(stepS > 0, s"non-positive step size $stepS")
    base.agg(min("bucket_s").as("_lo"), max("bucket_s").as("_hi"))
      .select(explode(sequence(col("_lo"), col("_hi"), lit(stepS)))
        .as("bucket_s"))
      .select(lit(name).as("path"), col("bucket_s"),
        (rand(name.hashCode.toLong) - 0.5).as("value"))
  }

  /** threshold(value, label) (builtin_functions.go:2821). */
  def threshold(base: DataFrame, value: Double,
                label: String = ""): DataFrame =
    constantLine(base, value, if (label.isEmpty) "threshold" else label)

  /** identity(name) (builtin_functions.go:308): value = epoch
    * seconds of each grid instant; timeFunction (alias `time`) is
    * the same shape. */
  def identitySeries(base: DataFrame, name: String): DataFrame =
    base.select("bucket_s").distinct()
      .select(lit(name).as("path"), col("bucket_s"),
        col("bucket_s").cast("double").as("value"))

  // ------------- re-consolidation / re-bucketing -------------

  /** consolidateBy(series, fn) (builtin_functions.go:2714): re-derive
    * the path frame from raw samples with the given consolidation
    * function (graphite changes the render-time consolidation; the
    * batch analogue re-consolidates the frame). Callers that hold
    * samples use [[seriesFrame]]'s `how`; see GraphiteParser. */
  def consolidateBy(samples: DataFrame, how: String,
                    unit: String = "hour"): DataFrame =
    seriesFrame(samples, unit, how)

  /** hitcount(series, interval) (builtin_functions.go:1668): values
    * are per-second rates; total hits per coarser interval =
    * Σ value·stepS over the interval. */
  def hitcount(df: DataFrame, intervalS: Long,
               stepS: Long = 3600L): DataFrame = {
    val bucket = (floor(col("bucket_s") / intervalS) * intervalS)
      .cast("long").as("bucket_s")
    df.groupBy(col("path"), bucket)
      .agg(sum(col("value") * lit(stepS.toDouble)).as("value"))
  }

  /** smartSummarize(series, interval, func) (summarize.go:148):
    * summarize aligned to the frame's start instant instead of epoch
    * multiples. Same within-series aggregate set as [[summarize]]
    * (the previous combineAgg reuse made `last` pick by path — a
    * constant within one series' group — instead of by time). */
  def smartSummarize(df: DataFrame, intervalS: Long, how: String): DataFrame = {
    val start = df.agg(min("bucket_s").as("_start"))
    val aligned = df.crossJoin(broadcast(start))
      .withColumn("_b",
        (col("_start") +
          floor((col("bucket_s") - col("_start")) / intervalS) * intervalS)
          .cast("long"))
    aligned.groupBy(col("path"), col("_b").as("bucket_s"))
      .agg(summarizeAgg(how).as("value"))
  }

  // ------------- cross-list functions -------------

  /** weightedAverage(values, weights, node) (aggregation_functions
    * .go:767): pair value and weight series sharing the node
    * segment; one output series Σ v·w / Σ w per instant. */
  def weightedAverage(values: DataFrame, weights: DataFrame,
                      node: Int): DataFrame = {
    val key = element_at(split(col("path"), "\\."), node + 1)
    val v = values.select(key.as("_k"), col("bucket_s"),
      col("value").as("_v"))
    val w = weights.select(key.as("_k"), col("bucket_s"),
      col("value").as("_w"))
    v.join(w, Seq("_k", "bucket_s"))
      .groupBy("bucket_s")
      .agg((sum(col("_v") * col("_w")) /
        when(sum(col("_w")) =!= 0, sum(col("_w")))).as("value"))
      .select(lit("weightedAverage").as("path"), col("bucket_s"),
        col("value"))
  }

  /** divideSeriesLists(dividends, divisors) (aggregation_functions
    * .go:258): pair i-th dividend with i-th divisor in path order
    * (two-phase path rank on both sides), divide pointwise. */
  def divideSeriesLists(dividends: DataFrame, divisors: DataFrame): DataFrame = {
    val a = dividends.join(rankPaths(dividends), "path")
    val b = divisors.join(rankPaths(divisors), "path")
      .select(col("sort_rank"), col("bucket_s"), col("value").as("_div"),
        col("path").as("_dpath"))
    a.join(b, Seq("sort_rank", "bucket_s"))
      .withColumn("value",
        when(col("_div") =!= 0, col("value") / col("_div")))
      .withColumn("path",
        concat(lit("divideSeries("), col("path"), lit(","),
          col("_dpath"), lit(")")))
      .select("path", "bucket_s", "value")
  }

  /** fallbackSeries(series, fallback) (builtin_functions.go:855):
    * the fallback frame when the primary is empty (bounded 1-row
    * count broadcast; no driver action). */
  def fallbackSeries(df: DataFrame, fallback: DataFrame): DataFrame = {
    val n = df.agg(count(lit(1)).as("_n"))
    df.unionByName(
      fallback.crossJoin(broadcast(n)).where(col("_n") === 0).drop("_n"))
  }

  /** group(series…) (builtin_functions.go:1431): flat union. */
  def group(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_))

  /** aliasSub(series, search, replace) (alias_functions.go:73). */
  def aliasSub(df: DataFrame, search: String, replace: String): DataFrame =
    df.withColumn("path", regexp_replace(col("path"), search, replace))

  /** legendValue(series, valueType) (builtin_functions.go:2631):
    * rename each series to "name (type: %.3f-reduced)". */
  def legendValue(df: DataFrame, valueType: String): DataFrame = {
    val red = df.groupBy("path").agg(reducer(valueType).as("_red"))
    df.join(broadcast(red), "path")
      .withColumn("path",
        concat(col("path"), lit(s" ($valueType: "),
          format_string("%.3f", col("_red")), lit(")")))
      .drop("_red")
  }

  /** dashed(series, dashLength) (builtin_functions.go dashed): a
    * rendering hint — the data-layer effect is the rename the
    * reference applies. */
  def dashed(df: DataFrame, dashLength: Double = 5.0): DataFrame =
    df.withColumn("path",
      concat(lit("dashed("), col("path"), lit(", "),
        format_string("%.3f", lit(dashLength)), lit(")")))

  /** cactiStyle(series) (builtin_functions.go:2679): rename each
    * series to the cacti legend "name Current:l Max:m Min:n " with
    * every column left-justified to the list-wide width (the
    * reference's %*s padding; stat width = integer digits + 3 for
    * the ".xx"). */
  def cactiStyle(df: DataFrame): DataFrame = {
    val stats = df.groupBy("path").agg(
      max_by(col("value"), col("bucket_s")).as("_last"),
      max("value").as("_max"), min("value").as("_min"))
    def fmt(c: Column): Column =
      when(c.isNull, lit("nan")).otherwise(format_string("%.2f", c))
    def statLen(c: Column): Column =
      when(c.isNull, lit(4)).otherwise(length(format_string("%d",
        c.cast("long"))) + lit(3))
    val widths = stats.agg(
      max(length(col("path"))).as("_wn"),
      max(statLen(col("_last"))).as("_wl"),
      max(statLen(col("_max"))).as("_wx"),
      max(statLen(col("_min"))).as("_wm"))
    df.join(broadcast(stats), "path")
      .crossJoin(broadcast(widths))
      .withColumn("path", concat(
        rpad(col("path"), col("_wn").cast("int"), lit(" ")),
        lit(" Current:"), rpad(fmt(col("_last")), col("_wl").cast("int"), lit(" ")),
        lit(" Max:"), rpad(fmt(col("_max")), col("_wx").cast("int"), lit(" ")),
        lit(" Min:"), rpad(fmt(col("_min")), col("_wm").cast("int"), lit(" ")),
        lit(" ")))
      .drop("_last", "_max", "_min", "_wn", "_wl", "_wx", "_wm")
  }

  /** powSeries(series…) (aggregation_functions.go:93): fold pow
    * across the series in path order at each instant —
    * ((v₁^v₂)^v₃)… per the reference's pairwise consolidation. */
  def powSeries(df: DataFrame): DataFrame =
    df.groupBy("bucket_s")
      .agg(array_sort(collect_list(struct(col("path"), col("value"))))
        .as("_pts"))
      .select(lit("powSeries").as("path"), col("bucket_s"),
        aggregate(
          expr("slice(transform(_pts, p -> p.value), 2, size(_pts) - 1)"),
          expr("_pts[0].value"),
          (acc, v) => pow(acc, v)).as("value"))

  /** useSeriesAbove(series, n, search, replace)
    * (builtin_functions.go:149): take the series whose MAX exceeds
    * n, substring-replace their names, and fetch those renamed
    * series from the base frame (the reference re-evaluates each new
    * name as a target; plain renamed fetches are the semantics that
    * needs no sub-query machinery). */
  def useSeriesAbove(df: DataFrame, base: DataFrame, n: Double,
                     search: String, replace: String): DataFrame = {
    val renamed = df.groupBy("path").agg(max("value").as("_mx"))
      .where(col("_mx") > n)
      .select(regexp_replace(col("path"),
        java.util.regex.Pattern.quote(search), replace).as("path"))
    base.join(renamed, Seq("path"), "left_semi")
  }

  /** aliasByMetric(series) (alias_functions.go:38): last segment. */
  def aliasByMetric(df: DataFrame): DataFrame =
    df.withColumn("path", element_at(split(col("path"), "\\."), -1))

  // ------------- sequential recurrences (fold per series) -------------

  /** exponentialMovingAverage(series, points) (builtin_functions.go:
    * 973): ema₀ = simple average of the first `points` values (0 if
    * none); emaᵢ = c·vᵢ + (1−c)·emaᵢ₋₁ with c = 2/(points+1); null
    * values emit null and leave the state unchanged. Sequential per
    * series → higher-order `aggregate` fold over the collected
    * series (one row per series, O(n) fold), like
    * Temporal.holtWinters. Outputs round to 6 decimals as the
    * reference does (roundTo). */
  def exponentialMovingAverage(df: DataFrame, points: Int): DataFrame = {
    val c = 2.0 / (points + 1.0)
    val collected = df.groupBy("path")
      .agg(array_sort(collect_list(struct(col("bucket_s"), col("value"))))
        .as("pts"))
      .withColumn("vals", expr("transform(pts, p -> p.value)"))
      .withColumn("bks", expr("transform(pts, p -> p.bucket_s)"))
    val firstVals = filter(slice(col("vals"), 1, points), v => v.isNotNull)
    val seed = coalesce(
      aggregate(firstVals, lit(0.0), (acc, v) => acc + v) /
        when(size(firstVals) > 0, size(firstVals).cast("double")),
      lit(0.0))
    val folded = aggregate(
      expr("slice(vals, 2, size(vals) - 1)"),
      struct(seed.as("ema"), array(round(seed, 6)).as("out")),
      (acc, v) => {
        val ema1 = when(v.isNotNull,
          lit(c) * v + lit(1.0 - c) * acc("ema"))
          .otherwise(acc("ema"))
        struct(ema1.as("ema"),
          concat(acc("out"),
            array(when(v.isNotNull, round(ema1, 6)))).as("out"))
      },
      acc => acc("out"))
    collected
      .select(col("path"), col("bks"), folded.as("emas"))
      .select(col("path"),
        explode(arrays_zip(col("bks"), col("emas"))).as("z"))
      .select(col("path"), col("z.bks").as("bucket_s"),
        col("z.emas").as("value"))
  }

  // ------------- Holt-Winters seasonal family -------------

  private val hwAlpha = 0.1
  private val hwBeta = 0.0035
  private val hwGamma = 0.1

  /** Holt-Winters seasonal analysis (builtin_functions.go:2108
    * holtWintersAnalysis; α=0.1, β=0.0035, γ=0.1, season = one day =
    * 86400/stepS rows): per-series triple-smoothing fold producing
    * the one-step-ahead prediction and the seasonal deviation at
    * each instant. Null actuals emit the pending prediction, zero
    * the deviation, and reset intercept/slope state — exactly the
    * reference's NaN branch. The reference bootstraps with one extra
    * week of history (FetchWithBootstrap); the batch form starts
    * cold on the frame (documented divergence: early points differ
    * until a season of state accumulates).
    *
    * Scale note: the fold builds per-step output arrays, so cost is
    * O(points²) per SERIES ROW in array copies. Like the reference —
    * which only ever evaluates a render range plus one bootstrap
    * week — feed it a bounded time window (timeSlice / summarize
    * first), not a whole-retention scan.
    *
    * Returns (path, bucket_s, value, pred_v, dev_v). */
  def hwAnalysis(df: DataFrame, stepS: Long = 3600L): DataFrame = {
    val season = (86400L / stepS).toInt
    val collected = df.groupBy("path")
      .agg(array_sort(collect_list(struct(col("bucket_s"), col("value"))))
        .as("pts"))
      .withColumn("vals", expr("transform(pts, p -> p.value)"))
      .withColumn("bks", expr("transform(pts, p -> p.bucket_s)"))
    val zero = lit(0.0)
    val folded = aggregate(
      col("vals"),
      struct(
        lit(null).cast("double").as("icept"),
        lit(0.0).as("slope"),
        lit(null).cast("double").as("nextPred"),
        array().cast("array<double>").as("seasonals"),
        array().cast("array<double>").as("devs"),
        array().cast("array<double>").as("preds")),
      (acc, v) => {
        val i = size(acc("preds"))
        val lastSeasonal = when(i >= season,
          coalesce(element_at(acc("seasonals"), i - season + 1), zero))
          .otherwise(zero)
        val nextLastSeasonal = when(i + 1 >= season,
          coalesce(element_at(acc("seasonals"), i + 2 - season), zero))
          .otherwise(zero)
        val lastSeasonalDev = when(i >= season,
          coalesce(element_at(acc("devs"), i - season + 1), zero))
          .otherwise(zero)
        val isFirst = i === 0
        val lastIntercept =
          when(isFirst, v).otherwise(coalesce(acc("icept"), v))
        val lastSlope = when(isFirst, zero).otherwise(acc("slope"))
        val prediction = when(isFirst, v).otherwise(acc("nextPred"))
        val intercept = lit(hwAlpha) * (v - lastSeasonal) +
          lit(1 - hwAlpha) * (lastIntercept + lastSlope)
        val slope = lit(hwBeta) * (intercept - lastIntercept) +
          lit(1 - hwBeta) * lastSlope
        val seasonal = lit(hwGamma) * (v - intercept) +
          lit(1 - hwGamma) * lastSeasonal
        val deviation = lit(hwGamma) * abs(v - coalesce(prediction, zero)) +
          lit(1 - hwGamma) * lastSeasonalDev
        val isNull = v.isNull
        struct(
          when(isNull, lit(null).cast("double")).otherwise(intercept)
            .as("icept"),
          when(isNull, zero).otherwise(slope).as("slope"),
          when(isNull, lit(null).cast("double"))
            .otherwise(intercept + slope + nextLastSeasonal)
            .as("nextPred"),
          concat(acc("seasonals"),
            array(when(isNull, zero).otherwise(seasonal))).as("seasonals"),
          concat(acc("devs"),
            array(when(isNull, zero).otherwise(deviation))).as("devs"),
          concat(acc("preds"), array(prediction)).as("preds"))
      },
      acc => struct(acc("preds").as("preds"), acc("devs").as("devs")))
    collected
      .select(col("path"), col("bks"), col("vals"),
        folded.getField("preds").as("preds"),
        folded.getField("devs").as("devs"))
      .select(col("path"),
        explode(arrays_zip(col("bks"), col("vals"), col("preds"),
          col("devs"))).as("z"))
      .select(col("path"), col("z.bks").as("bucket_s"),
        col("z.vals").as("value"), col("z.preds").as("pred_v"),
        col("z.devs").as("dev_v"))
  }

  /** holtWintersForecast(series) (builtin_functions.go:1956). */
  def holtWintersForecast(df: DataFrame, stepS: Long = 3600L): DataFrame =
    hwAnalysis(df, stepS)
      .select(col("path"), col("bucket_s"), col("pred_v").as("value"))

  /** holtWintersConfidenceBands(series, delta) (builtin_functions
    * .go:1979): forecast ± delta · deviation, two series per input
    * (…ConfidenceLower / …ConfidenceUpper). */
  def holtWintersConfidenceBands(df: DataFrame, delta: Double,
                                 stepS: Long = 3600L): DataFrame = {
    val a = hwAnalysis(df, stepS)
    val band = (sign: Int) =>
      when(col("pred_v").isNotNull && col("dev_v").isNotNull,
        col("pred_v") + lit(sign * delta) * col("dev_v"))
    a.select(
      concat(lit("holtWintersConfidenceLower("), col("path"), lit(")"))
        .as("path"),
      col("bucket_s"), band(-1).as("value"))
      .unionByName(a.select(
        concat(lit("holtWintersConfidenceUpper("), col("path"), lit(")"))
          .as("path"),
        col("bucket_s"), band(1).as("value")))
  }

  /** holtWintersAberration(series, delta) (builtin_functions.go:
    * 2024): how far the actual value strays outside the confidence
    * band (0 inside the band or when the actual is null). */
  def holtWintersAberration(df: DataFrame, delta: Double,
                            stepS: Long = 3600L): DataFrame = {
    val upper = col("pred_v") + lit(delta) * col("dev_v")
    val lower = col("pred_v") - lit(delta) * col("dev_v")
    hwAnalysis(df, stepS).select(col("path"), col("bucket_s"),
      when(col("value").isNull, lit(0.0))
        .when(upper.isNotNull && col("value") > upper, col("value") - upper)
        .when(lower.isNotNull && col("value") < lower, col("value") - lower)
        .otherwise(lit(0.0)).as("value"))
  }

  /** The /metrics/find path-tree expansion (reference:
    * api/v1/handler/graphite/find.go + find_parser.go — the
    * terminated + child CompleteTags query pair): given a dot-glob
    * `query` with N components, expand the N-th path level of the
    * series tree. One row per distinct N-component prefix whose
    * first N segments match the glob, flagged `is_leaf` (some series
    * terminates exactly there — find_parser.go's terminatedQuery)
    * and `has_children` (some series continues below — childQuery,
    * the matcher cloned with MatchField on the last component). Both
    * flags can be 1 (graphite's includeBothExpandableAndLeaf).
    *
    * Documented deviation on the terminated route: nodes here are
    * keyed by the matched path's ACTUAL N-segment prefix (graphite-
    * web's tree semantics), while the reference keys its tagMap by
    * the last segment's VALUE alone and prefixes ids with the raw
    * query text (find.go:119-125, :211) — so a glob in a NON-last
    * segment merges different parents into one node there and the id
    * contains the glob. Identical for the common glob-in-last-segment
    * queries; the tree-correct form is deliberate here.
    *
    * Scale: glob filter is a pushdown-friendly rlike over the path
    * column; the only shuffle is the distinct-prefix aggregation,
    * carrying tree-node cardinality, not samples. */
  def metricsFind(df: DataFrame, query: String): DataFrame = {
    val seg = split(col("path"), "\\.")
    if (query.contains("**")) {
      // `**` mode (find_parser.go:109-133): the query translates to
      // ONE anchored whole-path regex (m3_wrapper.go:114-137,
      // StarStarUnterminatedTranslatedQuery) and the result set is
      // the distinct path segments at the last query level OR DEEPER
      // of every matching series; every node is assumed expandable
      // (is_leaf=0/has_children=1 — the reference skips the per-node
      // leaf check for `**`, find_parser.go comment at :110), and the
      // node id is the RAW QUERY's prefix + the segment name
      // (find.go:211 DropLastMetricPart(raw) + "." + name — the
      // reference keys nodes by segment VALUE and prefixes with the
      // query text, not the matched path).
      val segs = Glob.splitSegments(query)
      val n = segs.length
      val prefix =
        if (n > 1) segs.dropRight(1).mkString("", ".", ".") else ""
      val re = Glob.anchored(query, allowMatchAll = true)
      df.select("path").distinct()
        .where(col("path").rlike(re))
        .select(posexplode(seg))
        .where(col("pos") >= lit(n - 1))
        .select(concat(lit(prefix), col("col")).as("id"),
          col("col").as("text"),
          lit(0).as("is_leaf"), lit(1).as("has_children"))
        .distinct()
    } else {
      val n = Glob.splitSegments(query).length
      val glob = Glob.toRegex(query)
      df.select("path").distinct()
        .where(col("path").rlike(s"^$glob(\\..*)?$$"))
        .select(
          array_join(slice(seg, 1, n), ".").as("id"),
          element_at(seg, n).as("text"),
          (size(seg) === n).cast("int").as("_leaf"))
        .groupBy("id", "text")
        .agg(max(col("_leaf")).as("is_leaf"),
          max(lit(1) - col("_leaf")).as("has_children"))
    }
  }
}
