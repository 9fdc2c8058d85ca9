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
  * the anchor for bucket i+1 — but the bucket count is the render's
  * pixel budget (`maxDataPoints`), a small constant. So the walk is
  * a driver-side loop of `threshold - 2` rounds over ONE cached
  * indexed frame; each round joins the candidate-bucket slice with
  * the per-series anchor state (series-cardinality rows) and reduces
  * with a single `max(struct(...))` / `min(struct(...))` argmax.
  * Nothing is collected; state stays distributed and is
  * lineage-truncated per round so the final union evaluates each
  * round once. At 100 TB the per-round shuffle is bounded by
  * |series| × bucket width — the same cardinality the render
  * response itself carries.
  *
  * Missing grid steps are the reference's NaN points: they sum into
  * nothing (skipped), keep their slot in the full-length divisor,
  * carry zero triangle area (NaN area → 0, lttb.go:135-137), and are
  * representable winners — a bucket whose points are all missing
  * yields its first index with a null value.
  */
object Lttb {

  /** One bucket-walk round's index ranges (all constants):
    * candidates `[candStart, candEnd)`, next-bucket average
    * `[avgStart, avgEnd)` (end clamped to the series length,
    * lttb.go:64-66), `avgLen` = the UNCLAMPED-start full length the
    * average divides by (lttb.go:69). */
  private final case class Round(candStart: Int, candEnd: Int,
                                 avgStart: Int, avgEnd: Int) {
    def avgLen: Int = avgEnd - avgStart
  }

  /** The bucket walk of lttb.go:55-113: `bucketStart` opens at
    * seriesStart+1, the first center sits one past a full bucket
    * (`bucketStart + floor(every) + 1`), and every later round
    * advances both cursors by `every`. */
  private def rounds(len: Int, every: Int, threshold: Int): Seq[Round] =
    (0 until threshold - 2).map { i =>
      val candStart = if (i == 0) 1 else i * every + 2
      val candEnd = (i + 1) * every + 2
      val avgStart = candEnd
      val avgEnd = math.min((i + 2) * every + 2, len)
      Round(candStart, candEnd, avgStart, avgEnd)
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

    // one indexed, cached pass over the rendered frame; every round
    // slices it by constant index ranges
    val pts = df
      .select(col("path"),
        ((col("bucket_s") - lit(startS)) / lit(stepS)).cast("int").as("idx"),
        col("value").cast("double").as("value"))
      .where(col("idx") >= 0 && col("idx") < len)
      .localCheckpoint(eager = false)

    // first/last values per series (lttb.go:51, :115-118) + the full
    // series-id frame the round states key on
    val edges = pts.groupBy("path").agg(
      max(when(col("idx") === 0, col("value"))).as("v_first"),
      max(when(col("idx") === len - 1, col("value"))).as("v_last"))
      .localCheckpoint(eager = false)

    var state = edges.select(col("path"), lit(0).as("a_idx"),
      col("v_first").as("a_val"))
    val picks = Seq.newBuilder[DataFrame]
    picks += edges.select(col("path"), lit(0).as("k"),
      col("v_first").as("value"))

    rounds(len, every, threshold).zipWithIndex.foreach { case (r, i) =>
      // next-bucket running average: non-NaN sums over the FULL
      // bucket length (lttb.go:69-88); an empty range (or one past
      // the series end) leaves the average null → fallback branch
      val avgAgg =
        if (r.avgLen <= 0) state.select(col("path"),
          lit(null).cast("double").as("avg_x"),
          lit(null).cast("double").as("avg_y"))
        else pts.where(col("idx") >= r.avgStart && col("idx") < r.avgEnd)
          .groupBy("path").agg(
            (sum(col("idx")) / lit(r.avgLen.toDouble)).as("avg_x"),
            (sum(col("value")) / lit(r.avgLen.toDouble)).as("avg_y"))

      val base = state.join(avgAgg, Seq("path"), "left")

      // candidate slice × anchor state: ONE grouped pass computes
      // both branches' argmax and the bucket-opening value
      val cands = pts.where(col("idx") >= r.candStart && col("idx") < r.candEnd)
        .join(base, Seq("path"))
      val cavg = avg(col("value")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("path"))
      // a null point's triangle is the reference's NaN area → 0
      // (lttb.go:135-137), NOT a null that would dodge the ≤0 guard
      val area = coalesce(abs(
        (col("a_idx") - col("avg_x")) * (col("value") - col("a_val")) -
          (col("a_idx") - col("idx")) * (col("avg_y") - col("a_val"))),
        lit(0d))
      val candAgg = cands
        .withColumn("cavg", cavg)
        .groupBy("path").agg(
          // triangle branch: largest area, FIRST index on ties
          // (strict > in lttb.go:139 keeps the earlier max)
          max(when(col("a_val").isNotNull && col("avg_y").isNotNull,
            struct(area.as("area"), (-col("idx")).as("neg_idx"),
              col("idx").as("idx"), col("value").as("val")))).as("best"),
          // NaN-fallback branch: closest to the candidate average
          // among NON-null points only (lttb.go:174 skips NaN),
          // FIRST index on ties (strict < in lttb.go:177)
          min(when(col("value").isNotNull,
            struct(abs(col("cavg") - col("value")).as("d"),
              col("idx").as("idx"), col("value").as("val")))).as("close"),
          max(when(col("idx") === r.candStart, col("value"))).as("v_cs"))

      // lttb.go:100-110: pick the branch, defaulting to the bucket's
      // first index when no candidate exists or every area is zero
      // (maxArea = -1 → index candStart wins the walk)
      val normal = col("a_val").isNotNull && col("avg_y").isNotNull
      val next = base.join(candAgg, Seq("path"), "left")
        .select(col("path"),
          when(normal,
            when(col("best").isNull || col("best.area") <= 0d,
              lit(r.candStart)).otherwise(col("best.idx")))
            .otherwise(
              when(col("close").isNull, lit(r.candStart))
                .otherwise(col("close.idx"))).as("a_idx"),
          when(normal,
            when(col("best").isNull || col("best.area") <= 0d,
              col("v_cs")).otherwise(col("best.val")))
            .otherwise(
              when(col("close").isNull, col("v_cs"))
                .otherwise(col("close.val"))).as("a_val"))
        .localCheckpoint(eager = false)

      picks += next.select(col("path"), lit(i + 1).as("k"),
        col("a_val").as("value"))
      state = next
    }

    if (threshold > 1)
      picks += edges.select(col("path"), lit(threshold - 1).as("k"),
        col("v_last").as("value"))

    picks.result().reduce(_ unionByName _)
      .select(col("path"),
        (lit(startS) + col("k") * lit(every * stepS)).as("bucket_s"),
        col("value"))
  }
}
