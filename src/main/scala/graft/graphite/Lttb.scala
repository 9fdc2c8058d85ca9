package graft.graphite

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Largest-Triangle-Three-Buckets render downsampling — the
  * `maxDataPoints` path of the render API. The reference applies
  * `ts.LTTB` to every series still larger than the requested point
  * budget after evaluation (render.go:171-178), with the new step
  * derived from `ResizeToMaxDataPointsMillisPerStep`
  * (series.go:426-437: `ceil(len / maxDataPoints) × step`).
  *
  * Restates lttb.go:32-140 exactly, including its deliberate
  * deviations from Steinarsson's thesis:
  *   - `maxArea` starts at -1 (lttb.go:127 — "the original algorithm
  *     implementation initializes the maxArea as 0 which is a bug!"),
  *     so the first candidate index wins when every area is zero;
  *   - the next-bucket average divides by the FULL (clamped) bucket
  *     length while summing only non-NaN points (lttb.go:69-88);
  *   - when the left anchor or the next-bucket average is NaN, the
  *     candidate closest to the candidate-bucket average is chosen
  *     instead of a triangle (lttb.go:102-105, indexClosestToAverage
  *     — this average DOES divide by the non-NaN count);
  *   - the first and last series points are always kept
  *     (lttb.go:51, :115-118).
  *
  * Spark shape: LTTB is sequential per series — bucket i's pick is
  * the anchor for bucket i+1 — and a render series is bounded by the
  * request window (|grid steps|, a few hundred at dashboard
  * resolutions). That is exactly the tsz-codec class of operator: a
  * per-series state machine over a bounded point array, so it runs
  * as the same shape — ONE shuffle grouping by series, an imperative
  * walk per group (`mapGroups`, the sources/TszStore.Tsz precedent;
  * a driver-loop-of-joins prototype measured 5.3 s of pure stage
  * overhead at sf0.1 against ~0.5 s for this form on identical
  * output). At 100 TB the walk distributes by series and the
  * per-series work is the render response's own cardinality.
  *
  * Missing grid steps are the reference's NaN points: they sum into
  * nothing (skipped), keep their slot in the full-length divisor,
  * carry zero triangle area (NaN area → 0, lttb.go:135-137), and are
  * representable winners — a bucket whose points are all missing
  * yields its first index with a null value.
  */
object Lttb {

  /** indexWithLargestTriangle (lttb.go:125-151): maxArea starts at
    * -1 so the first index wins an all-zero-area bucket; strict >
    * keeps the earliest max; NaN areas count as 0. */
  private def largestTriangle(vals: Array[Double], start: Int, end: Int,
                              leftX: Double, leftY: Double,
                              rightX: Double, rightY: Double): Int = {
    var maxArea = -1.0
    var largest = start
    val xDiff = leftX - rightX
    val yDiff = rightY - leftY
    var idx = start
    while (idx < end) {
      var area = math.abs(xDiff * (vals(idx) - leftY) - (leftX - idx) * yDiff)
      if (area.isNaN) area = 0.0
      if (area > maxArea) { maxArea = area; largest = idx }
      idx += 1
    }
    largest
  }

  /** indexClosestToAverage (lttb.go:153-181): the NaN-branch
    * fallback — candidate-bucket mean over non-NaN points (divided
    * by the COUNT here, unlike the triangle branch's full-length
    * average), earliest index on ties, bucket start when empty. */
  private def closestToAverage(vals: Array[Double], start: Int, end: Int): Int = {
    var sum = 0.0; var count = 0
    var idx = start
    while (idx < end) {
      if (!vals(idx).isNaN) { sum += vals(idx); count += 1 }
      idx += 1
    }
    if (count == 0) return start
    val avg = sum / count
    var minDiff = Double.MaxValue
    var closest = start
    idx = start
    while (idx < end) {
      val diff = math.abs(avg - vals(idx))
      if (!vals(idx).isNaN && diff < minDiff) { closest = idx; minDiff = diff }
      idx += 1
    }
    closest
  }

  /** The bucket walk of lttb.go:44-118 over one dense series:
    * keep point 0; for each of `threshold − 2` buckets (`bucketStart`
    * opens at 1, the first center one past a full bucket, both
    * cursors advancing by `every`) pick the largest-triangle point
    * against the previous pick and the next bucket's full-length
    * average — or, when either anchor is NaN, the point closest to
    * the candidate average; keep the last point. Returns the picked
    * values in output-slot order (NaN = a null point). */
  private[graphite] def walk(vals: Array[Double], every: Int,
                             threshold: Int): Array[Double] = {
    val len = vals.length
    val out = new Array[Double](threshold)
    out(0) = vals(0)
    var a = 0
    var bucketStart = 1
    var bucketCenter = bucketStart + every + 1
    var i = 0
    while (i < threshold - 2) {
      val bucketEnd = bucketCenter + every
      val avgRangeStart = bucketCenter
      val avgRangeEnd = math.min(bucketEnd, len)
      // the next-bucket average sums non-NaN points but divides by
      // the FULL clamped length (lttb.go:69-88)
      val avgRangeLength = (avgRangeEnd - avgRangeStart).toDouble
      var avgX = 0.0; var avgY = 0.0; var read = 0
      var j = avgRangeStart
      while (j < avgRangeEnd) {
        val y = vals(j)
        if (!y.isNaN) { read += 1; avgX += j; avgY += y }
        j += 1
      }
      if (read > 0) { avgX /= avgRangeLength; avgY /= avgRangeLength }
      else { avgX = Double.NaN; avgY = Double.NaN }
      val pointAY = vals(a)
      val nextA =
        if (avgY.isNaN || pointAY.isNaN)
          closestToAverage(vals, bucketStart, bucketCenter)
        else
          largestTriangle(vals, bucketStart, bucketCenter,
            a.toDouble, pointAY, avgX, avgY)
      out(i + 1) = vals(nextA)
      a = nextA
      bucketStart = bucketCenter
      bucketCenter = bucketEnd
      i += 1
    }
    if (threshold > 1) out(threshold - 1) = vals(len - 1)
    out
  }

  /** Downsample a path frame `(path, bucket_s, value)` whose points
    * sit on the `[startS, endS)` grid at `stepS` to at most
    * `maxDataPoints` points per series. Series at or under the
    * budget return unchanged on their original grid
    * (series.go:418-424 NeedsResizeToMaxDataPoints). Output points
    * land on the resized grid `startS + k·every·stepS` with the
    * ORIGINAL picked values (the reference keeps chosen points
    * verbatim, lttb.go:108). */
  def downsample(df: DataFrame, startS: Long, endS: Long, stepS: Long,
                 maxDataPoints: Int): DataFrame = {
    val len = ((endS - startS) / stepS).toInt
    if (maxDataPoints <= 0 || len <= maxDataPoints) return df
    val every = math.ceil(len.toDouble / maxDataPoints).toInt
    val threshold = math.ceil(len.toDouble / every).toInt
    if (threshold == 0 || threshold > len) return df

    val spark = df.sparkSession
    import spark.implicits._
    val outStep = every * stepS
    df.select(col("path"),
      ((col("bucket_s") - lit(startS)) / lit(stepS)).cast("int").as("idx"),
      col("value").cast("double").as("value"))
      .where(col("idx") >= 0 && col("idx") < len)
      .as[(String, Int, java.lang.Double)]
      .groupByKey(_._1)
      .flatMapGroups { (p: String, it: Iterator[(String, Int, java.lang.Double)]) =>
        // densify to the grid: a missing or null step is the
        // reference's NaN point (the fetched series is NaN-filled)
        val vals = Array.fill(len)(Double.NaN)
        it.foreach(t => if (t._3 != null) vals(t._2) = t._3.doubleValue())
        walk(vals, every, threshold).iterator.zipWithIndex.map {
          case (v, k) =>
            (p, startS + k * outStep,
              if (v.isNaN) null else java.lang.Double.valueOf(v))
        }
      }
      .toDF("path", "bucket_s", "value")
  }
}
