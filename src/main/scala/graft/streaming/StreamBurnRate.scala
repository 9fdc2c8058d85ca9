package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SLO burn-rate alerting — the always-on form of
  * [[graft.tsdb.Temporal.burnRateFrame]]: the batch card tells you a
  * day AFTER the budget burned; the paging path has to watch the
  * same two windows continuously. Per service (series name), state
  * is the per-day (n, bad) counts of the trailing `longWin` PRESENT
  * days — counts are ADDITIVE, so merging any micro-batch split
  * yields the same state (order-independent, the
  * [[StreamReservoir]] class of parity, stronger than the
  * SpaceSaving pinned-order kind), and the spec asserts the final
  * snapshot equals the batch frame's last row per service exactly —
  * including the rounded rates and the alert bit, computed with the
  * same HALF_UP 6-decimal rounding Spark's `round` applies.
  *
  * Scale: one shuffle (by name) per micro-batch into the stateful
  * fold; state per service is ≤ longWin+0 rows of three longs —
  * bounded, watermark-free. */
object StreamBurnRate {

  case class Ev(name: String, day_s: Long, bad: Long)
  case class DayAgg(day_s: Long, n: Long, bad: Long)
  case class Burn(name: String, upto: Long, day_s: Long, n: Long,
                  bad: Long, short_burn: Double, long_burn: Double,
                  alert: Int)

  /** Spark `round(col, 6)`'s exact behavior (decimal-string HALF_UP). */
  private[streaming] def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  def keyed(events: DataFrame, threshold: Double): Dataset[Ev] = {
    val s = events.sparkSession
    import s.implicits._
    // day_s in epoch seconds of the day start — the batch frame's
    // bucketS("day") key, so parity compares need no rescaling
    events.select(col("event_type").as("name"),
      (floor(unix_timestamp(col("ts")).cast("double") / 86400.0)
        .cast("long") * 86400).as("day_s"),
      (col("value") > threshold).cast("long").as("bad"))
      .as[Ev]
  }

  private[streaming] def fold(state: Seq[DayAgg], batch: Seq[Ev],
                              longWin: Int): Seq[DayAgg] = {
    val m = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    state.foreach(d => m(d.day_s) = (d.n, d.bad))
    batch.foreach { e =>
      val (n, b) = m.getOrElse(e.day_s, (0L, 0L))
      m(e.day_s) = (n + 1, b + e.bad)
    }
    m.toSeq.map { case (d, (n, b)) => DayAgg(d, n, b) }
      .sortBy(-_.day_s).take(longWin)
  }

  private[streaming] def burnOf(name: String, upto: Long,
                                state: Seq[DayAgg],
                                errBudget: Double): Burn = {
    val latest = state.maxBy(_.day_s)
    val (nL, bL) = (state.map(_.n).sum, state.map(_.bad).sum)
    val short = r6(latest.bad.toDouble / latest.n / errBudget)
    val long = r6(bL.toDouble / nL / errBudget)
    Burn(name, upto, latest.day_s, latest.n, latest.bad, short, long,
      if (short > 1.0 && long > 1.0) 1 else 0)
  }

  /** Streaming form: fold each micro-batch's events into the per-day
    * counts, emit the latest day's burn card per update. */
  def run(events: DataFrame, threshold: Double = 100.0,
          errBudget: Double = 0.1, longWin: Int = 7): Dataset[Burn] = {
    val ds = keyed(events, threshold)
    val s = ds.sparkSession
    import s.implicits._
    ds.groupByKey(_.name)
      .flatMapGroupsWithState[(Long, Seq[DayAgg]), Burn](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (name, it, state: GroupState[(Long, Seq[DayAgg])]) =>
          val (n0, st0) = state.getOption.getOrElse((0L, Seq.empty[DayAgg]))
          val batch = it.toSeq
          val next = fold(st0, batch, longWin)
          val upto = n0 + batch.size
          state.update((upto, next))
          Iterator.single(burnOf(name, upto, next, errBudget))
      }
  }
}
