package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Ingest

class StreamingSpec extends SparkSpec {

  test("windowed rollup flushes closed windows in append mode") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[Ingest.Sample]
    val q = Ingest.startToMemory(s, mem.toDF(), "rollup_test")
    try {
      mem.addData(
        Ingest.Sample("click", 1L, Timestamp.valueOf("2024-01-01 00:10:00"), 5.0),
        Ingest.Sample("click", 1L, Timestamp.valueOf("2024-01-01 00:20:00"), 7.0))
      q.processAllAvailable()
      // advance watermark past the first window (1h window + 30m lateness)
      mem.addData(
        Ingest.Sample("click", 1L, Timestamp.valueOf("2024-01-01 02:00:00"), 1.0))
      q.processAllAvailable()
      val rows = s.sql("SELECT * FROM rollup_test").collect()
      assert(rows.length == 1) // only the closed 00:00 window emitted
      val r = rows(0)
      assert(r.getAs[Double]("sum_v") == 12.0)
      assert(r.getAs[Long]("count_v") == 2L)
      assert(r.getAs[Long]("bucket_s") == 1704067200L)
    } finally q.stop()
  }

  test("counter tracking maintains cumulative + resets across batches") {
    val s = spark
    import s.implicits._
    val batch = Seq(
      Ingest.Sample("c", 1L, Timestamp.valueOf("2024-01-01 00:00:00"), 10.0),
      Ingest.Sample("c", 1L, Timestamp.valueOf("2024-01-01 00:01:00"), 25.0),
      Ingest.Sample("c", 1L, Timestamp.valueOf("2024-01-01 00:02:00"), 5.0),
      Ingest.Sample("c", 1L, Timestamp.valueOf("2024-01-01 00:03:00"), 9.0)).toDS()
    val out = Ingest.counterTrack(batch).collect()(0)
    assert(out.cumulative == 24.0) // +15, reset(+5), +4
    assert(out.resets == 1)
  }
}
