package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamSessions

class StreamSessionsSpec extends SparkSpec {

  private def ts(h: Int, m: Int) =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("cross-batch events merge into one session; finalized = batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val events = mem.toDF().toDF("user_id", "ts", "value")
    val q = StreamSessions.sessionize(events).writeStream
      .format("memory").queryName("stream_sessions")
      .outputMode("append").start()
    try {
      // batch 1: user 1 opens a session
      mem.addData((1L, ts(10, 0), 1.0), (1L, ts(10, 10), 2.0))
      q.processAllAvailable()
      // batch 2: 10 min later — within the gap, must EXTEND the
      // same session, not open a new one
      mem.addData((1L, ts(10, 20), 3.0))
      q.processAllAvailable()
      // advance the watermark far past session close (+gap+lateness)
      mem.addData((99L, ts(14, 0), 0.0))
      q.processAllAvailable()
      val rows = s.table("stream_sessions")
        .where(col("user_id") === 1L).collect()
      assert(rows.length == 1, "gap-merge across batches failed")
      val r = rows(0)
      assert(r.getAs[Long]("n_events") == 3L)
      assert(r.getAs[Double]("sum_value") == 6.0)
      // byte-equal to the batch sessionize on the same events
      val batch = Seq((1L, ts(10, 0), 1.0), (1L, ts(10, 10), 2.0),
        (1L, ts(10, 20), 3.0)).toDF("user_id", "ts", "value")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 6).as("sum_value"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("session_start_us"),
          unix_micros(col("session_window.end")).as("session_end_us"),
          col("n_events"), col("sum_value")).collect()(0)
      assert(r.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("a gap beyond the window splits sessions") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val q = StreamSessions
      .sessionize(mem.toDF().toDF("user_id", "ts", "value")).writeStream
      .format("memory").queryName("stream_sessions2")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts(10, 0), 1.0), (1L, ts(12, 0), 1.0))
      q.processAllAvailable()
      mem.addData((99L, ts(16, 0), 0.0))
      q.processAllAvailable()
      assert(s.table("stream_sessions2")
        .where(col("user_id") === 1L).count() == 2L)
    } finally q.stop()
  }
}
