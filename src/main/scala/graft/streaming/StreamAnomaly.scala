package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.streaming.Ingest.Sample

/** Streaming rolling z-score alerts — the always-on form of
  * [[graft.tsdb.Temporal.anomalyFrame]], for the alerting path where
  * the batch operator's hindsight window isn't available: each
  * arriving sample scores against the trailing `lookback` samples of
  * ITS OWN series carried in state, with the same guards (min
  * trailing points, zero-variance baseline) and the same
  * rounded-|z| flag rule, so a boundary point can't flip across
  * engines or replays.
  *
  * Semantics note: the batch operator consolidates to hourly buckets
  * before scoring; the streaming form scores RAW samples against raw
  * trailing samples (an alert path wants the point that fired, not
  * its bucket) — the divergence is deliberate and documented here.
  *
  * Ordering: within a micro-batch the group sorts by full-precision
  * event time (ties by value — the [[Ingest.counterTrack]]
  * convention); across batches the ring buffer carries the history,
  * so replaying the same stream in different batch splits emits
  * identical scores (spec-pinned).
  *
  * Scale: state is a ≤`lookback`-element ring of doubles per series —
  * bounded and watermark-free; the shuffle keys on series hash, the
  * same always-on shape as the other stateful ingest ops. */
object StreamAnomaly {

  case class AnomalyPoint(name: String, user_id: Long,
                          ts: java.sql.Timestamp, value: Double,
                          n_prev: Int, z_v: Double, anomaly: Int)

  def zScores(samples: Dataset[Sample], lookback: Int = 24,
              minPrev: Int = 6, zThresh: Double = 3.0): Dataset[AnomalyPoint] = {
    import samples.sparkSession.implicits._
    def micros(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos / 1000) % 1000
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    samples
      .groupByKey(s => (s.name, s.user_id))
      .flatMapGroupsWithState[Seq[Double], AnomalyPoint](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case ((name, uid), it, state: GroupState[Seq[Double]]) =>
          val sorted = it.toSeq.sortBy(s => (micros(s.ts), s.value))
          val out = Seq.newBuilder[AnomalyPoint]
          val end = sorted.foldLeft(state.getOption.getOrElse(Seq.empty)) {
            (buf, s) =>
              val n = buf.size
              val (z, flag) =
                if (n >= minPrev) {
                  val mean = buf.sum / n
                  val std = math.sqrt(
                    buf.map(v => (v - mean) * (v - mean)).sum / n)
                  if (std > 0) {
                    val zv = round6((s.value - mean) / std)
                    (zv, if (math.abs(zv) > zThresh) 1 else 0)
                  } else (Double.NaN, 0)
                } else (Double.NaN, 0)
              out += AnomalyPoint(name, uid, s.ts, s.value, n, z, flag)
              (buf :+ s.value).takeRight(lookback)
          }
          state.update(end)
          out.result().iterator
      }
  }
}
