package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamBurnRate
import graft.tsdb.Temporal

class StreamBurnRateSpec extends SparkSpec {

  private val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime

  // 7 clean days then one fully-bad day (the batch spec's shape),
  // two services so the state is genuinely keyed
  private val feed: Seq[(String, Long, Timestamp, Double, Long)] =
    for {
      svc <- Seq("svcA", "svcB")
      d <- 0 until 8
      i <- 0 until 10
    } yield (svc, 1L, new Timestamp(base + (d * 86400L + i) * 1000L),
      if (d == 7 && svc == "svcA") 200.0 else 1.0,
      (d * 10 + i).toLong)

  test("final streaming burn card equals the batch frame under any split") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    def runSplit(name: String,
                 splits: Seq[Seq[(String, Long, Timestamp, Double, Long)]]) = {
      val mem = MemoryStream[(String, Long, Timestamp, Double, Long)]
      val ev = mem.toDF().toDF("event_type", "user_id", "ts", "value",
        "event_id")
      val q = StreamBurnRate.run(ev)
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try {
        splits.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      } finally q.stop()
      // current card per service = the max-upto emission
      s.sql(s"SELECT * FROM $name").collect()
        .groupBy(_.getString(0))
        .map { case (svc, rows) =>
          svc -> rows.maxBy(_.getAs[Long]("upto")).toSeq.drop(2)
        }
    }
    val oneBig = runSplit("br_one", Seq(feed))
    val rowByRow = runSplit("br_row", feed.grouped(1).toSeq)
    val shuffled = runSplit("br_shuf",
      Seq(feed.reverse.take(40), feed.reverse.drop(40)))
    assert(oneBig == rowByRow)
    assert(oneBig == shuffled, "arrival order changed the final card")
    // ...and equals the batch operator's last row per service
    val batch = Temporal.burnRateFrame(feed.toDF("name", "user_id", "ts",
      "value", "event_id")).collect()
      .groupBy(_.getString(0))
      .map { case (svc, rows) =>
        val last = rows.maxBy(_.getAs[Long]("bucket_s"))
        svc -> Seq(
          last.getAs[Long]("bucket_s"), last.getAs[Long]("n"),
          last.getAs[Long]("bad"), last.getAs[Double]("short_burn"),
          last.getAs[Double]("long_burn"), last.getAs[Int]("alert"))
      }
    assert(oneBig == batch, s"stream $oneBig vs batch $batch")
    // the bad service pages, the clean one doesn't
    assert(oneBig("svcA").last == 1 && oneBig("svcB").last == 0)
  }
}
