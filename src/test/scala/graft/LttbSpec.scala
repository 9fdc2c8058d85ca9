package graft

import org.apache.spark.sql.functions._
import graft.graphite.Lttb

/** LTTB render downsampling (lttb.go + render.go:171-178) — a
  * hand-pinned walk, the no-resize identity, and a differential
  * property test against a driver-side imperative restatement of
  * the reference loop (the GlobSpec differential convention):
  * integer-valued series make every sum exact in double, so the
  * distributed argmax must agree with the sequential walk
  * bit-for-bit, including on ties and through the NaN branches. */
class LttbSpec extends SparkSpec {

  import spark.implicits._

  private val startS = 1704412800L
  private val stepS = 3600L

  /** Dense-array series (NaN = missing step) → path frame rows. */
  private def frame(series: Map[String, Array[Double]]) = {
    val rows = for {
      (p, vals) <- series.toSeq
      (v, i) <- vals.zipWithIndex if !v.isNaN
    } yield (p, startS + i * stepS, v)
    rows.toDF("path", "bucket_s", "value")
  }

  // ---- imperative restatement of lttb.go:32-140 ----

  private def largestTriangle(vals: Array[Double], start: Int, end: Int,
                              leftX: Double, leftY: Double,
                              rightX: Double, rightY: Double): Int = {
    // maxArea starts at -1 (lttb.go:127) so the first index wins an
    // all-zero-area bucket; strict > keeps the earliest max
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

  /** The full bucket walk: returns (sourceIdx, value) per kept point. */
  private def lttbRef(vals: Array[Double], maxDp: Int): Array[(Int, Double)] = {
    val len = vals.length
    require(len > maxDp)
    val every = math.ceil(len.toDouble / maxDp).toInt
    val threshold = math.ceil(len.toDouble / every).toInt
    val out = Array.fill(threshold)((0, Double.NaN))
    out(0) = (0, vals(0))
    var a = 0
    var bucketStart = 1
    var bucketCenter = bucketStart + every + 1
    for (i <- 0 until threshold - 2) {
      val bucketEnd = bucketCenter + every
      val avgRangeStart = bucketCenter
      val avgRangeEnd = math.min(bucketEnd, len)
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
      out(i + 1) = (nextA, vals(nextA))
      a = nextA
      bucketStart = bucketCenter
      bucketCenter = bucketEnd
    }
    if (threshold > 1) out(threshold - 1) = (len - 1, vals(len - 1))
    out
  }

  private def runSpark(series: Map[String, Array[Double]],
                       len: Int, maxDp: Int): Map[(String, Long), Option[Double]] =
    Lttb.downsample(frame(series), startS, startS + len * stepS, stepS, maxDp)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap

  private def check(series: Map[String, Array[Double]], maxDp: Int): Unit = {
    val len = series.values.head.length
    val every = math.ceil(len.toDouble / maxDp).toInt
    val got = runSpark(series, len, maxDp)
    for ((p, vals) <- series) {
      val want = lttbRef(vals, maxDp)
      assert(got.count(_._1._1 == p) == want.length, s"$p point count")
      for (((_, v), k) <- want.zipWithIndex) {
        val ts = startS + k.toLong * every * stepS
        val g = got((p, ts))
        if (v.isNaN) assert(g.isEmpty, s"$p k=$k want NaN got $g")
        else assert(g.contains(v), s"$p k=$k want $v got $g")
      }
    }
  }

  test("hand-pinned walk: spikes win their buckets, edges kept") {
    val vals = Array[Double](0, 10, 0, 0, 0, 10, 0, 0, 0, 0)
    // maxDp=4 → every=3, threshold=4: round 0 picks the idx-1 spike
    // (area 56.67 vs 6.67/10), round 1 the idx-5 spike (40 vs 25/15)
    assert(lttbRef(vals, 4).toSeq ==
      Seq((0, 0.0), (1, 10.0), (5, 10.0), (9, 0.0)))
    check(Map("s" -> vals), 4)
  }

  test("no-resize identity at or under the budget (series.go:418-424)") {
    val df = frame(Map("s" -> Array[Double](1, 2, 3, 4, 5)))
    val out = Lttb.downsample(df, startS, startS + 5 * stepS, stepS, 5)
    assert(out.collect().toSet == df.collect().toSet)
    val out2 = Lttb.downsample(df, startS, startS + 5 * stepS, stepS, 0)
    assert(out2.collect().toSet == df.collect().toSet)
  }

  test("differential vs the imperative walk: dense, gappy, NaN-branch series") {
    val rnd = new scala.util.Random(42)
    def gen(len: Int, missing: Double, zeroFirst: Boolean): Array[Double] = {
      val a = Array.tabulate(len)(i =>
        if (rnd.nextDouble() < missing) Double.NaN
        else rnd.nextInt(1000).toDouble)
      if (zeroFirst) a(0) = Double.NaN else if (a(0).isNaN) a(0) = 1.0
      a
    }
    for ((len, maxDp) <- Seq((60, 7), (100, 10), (47, 5), (144, 10))) {
      val series = Map(
        "dense" -> gen(len, 0.0, zeroFirst = false),
        "gappy" -> gen(len, 0.3, zeroFirst = false),
        // 85% missing: whole candidate/average buckets go empty
        "sparse" -> gen(len, 0.85, zeroFirst = false),
        // missing first point: the anchor starts NaN → fallback branch
        "nanchor" -> gen(len, 0.2, zeroFirst = true),
        // constant series: every triangle area is 0 → first index
        "flat" -> Array.fill(len)(5.0))
      check(series, maxDp)
    }
  }

  test("renderMaxDataPoints end-to-end over events") {
    val samples = graft.tsdb.Vectors.samples(
      Tables.events(spark, sf))
    val out = graphite.GraphiteParser.renderMaxDataPoints(
      samples, "groupByNode(events.*.*, 1, \"sum\")",
      from = "20240105", until = "20240111", nowS = 1705795200L,
      maxDataPoints = 10)
    val perPath = out.groupBy("path").agg(
      countDistinct("bucket_s").as("n"),
      min("bucket_s").as("lo"), max("bucket_s").as("hi")).collect()
    assert(perPath.nonEmpty)
    perPath.foreach { r =>
      assert(r.getLong(1) <= 10, s"${r.getString(0)} over budget")
      assert(r.getLong(2) == 1704412800L) // first grid point kept
      assert(r.getLong(3) == 1704412800L + 9L * 15 * 3600) // last kept
    }
  }
}
