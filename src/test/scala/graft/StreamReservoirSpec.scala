package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.pipeline.Corpus
import graft.streaming.StreamReservoir

class StreamReservoirSpec extends SparkSpec {

  // (doc_id, source, n_chars): two sources, enough docs to overflow n
  private val feed: Seq[(Long, String, Long)] =
    (0L until 30L).map(i => (i, if (i % 3 == 0) "srcA" else "srcB", 50 + i))

  private def current(sink: String) =
    spark.sql(s"SELECT * FROM $sink").collect()
      .groupBy(_.getAs[String]("source"))
      .map { case (src, rows) => src -> rows.maxBy(_.getAs[Long]("upto")) }
      .map { case (src, r) =>
        src -> r.getSeq[org.apache.spark.sql.Row](2)
          .map(e => (e.getLong(0), e.getLong(1), e.getDouble(2)))
      }

  test("streaming reservoir equals the batch sampler under any split") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    def runSplit(name: String, splits: Seq[Seq[(Long, String, Long)]]) = {
      val mem = MemoryStream[(Long, String, Long)]
      val docs = mem.toDF().toDF("doc_id", "source", "n_chars")
      val q = StreamReservoir.run(docs, n = 5)
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try {
        splits.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      } finally q.stop()
      current(name)
    }
    val oneBig = runSplit("res_one", Seq(feed))
    val rowByRow = runSplit("res_row", feed.map(Seq(_)))
    val uneven = runSplit("res_two", Seq(feed.take(7), feed.drop(7)))
    assert(oneBig == rowByRow)
    assert(oneBig == uneven)
    // ...and equals the BATCH sampler exactly (order-independent keys:
    // top-n by deterministic res_key is a pure selection)
    val batch = Corpus.reservoirSample(
      feed.toDF("doc_id", "source", "n_chars"), n = 5)
      .collect()
      .groupBy(_.getAs[String]("source"))
      .map { case (src, rows) =>
        src -> rows.sortBy(_.getAs[Long]("rk"))
          .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_chars"),
            r.getAs[Double]("res_key"))).toSeq
      }
    assert(oneBig == batch)
    // state is bounded at n entries per source
    assert(oneBig.values.forall(_.size <= 5))
  }
}
