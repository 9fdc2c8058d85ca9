package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming sessionization — the continuous twin of the batch
  * `q_sessionize` query: the SAME session_window expression (gap-
  * merged per-user sessions) under an event-time watermark, so a
  * session finalizes — and emits exactly once in append mode — when
  * the watermark passes its close. Events arriving across
  * micro-batches within the gap extend the open session (Spark's
  * session-window state merge), which is the property batch
  * replays can't give an always-on product stream.
  *
  * Scale: state is one open session struct per (user, session) —
  * bounded by active users × the gap horizon; the aggregation keys
  * on user_id, the sessionize shuffle key shared with the batch
  * path. Output schema matches `q_sessionize` column-for-column so
  * downstream consumers (session stats, funnels over sessions)
  * compose with either path.
  */
object StreamSessions {

  def sessionize(events: DataFrame, gap: String = "30 minutes",
                 lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 6).as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("n_events"), col("sum_value"))
}
