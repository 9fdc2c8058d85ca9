package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup
import graft.streaming.StreamSpectrum

class StreamSpectrumSpec extends SparkSpec {

  private def docsSeq: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(23)
    (1L to 15L).map { id =>
      val n = Seq(1, 5, 40, 160, 400)(rnd.nextInt(5))
      id -> (0 until n).map(_ => "the quick, ".charAt(rnd.nextInt(11))).mkString
    }
  }

  private def cellMap(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getAs[Int]("kind"), r.getAs[Long]("depth"),
      r.getAs[Long]("k")) ->
      ((r.getAs[Long]("vmax"), r.getAs[Long]("vsum")))).toMap

  test("streamed sketch cells equal the batch walk under any split") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val feed = docsSeq
    def runSplit(name: String, splits: Seq[Seq[(Long, String)]]) = {
      val mem = MemoryStream[(Long, String)]
      val docs = mem.toDF().toDF("doc_id", "text")
      val q = StreamSpectrum.cells(docs)
        .writeStream.format("memory").queryName(name)
        .outputMode("complete").start()
      try {
        splits.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      } finally q.stop()
      cellMap(s.sql(s"SELECT * FROM $name").collect())
    }
    val oneBig = runSplit("sp_one", Seq(feed))
    val uneven = runSplit("sp_two", Seq(feed.take(4), feed.drop(4)))
    val rowByRow = runSplit("sp_row", feed.map(Seq(_)))
    assert(oneBig == uneven && oneBig == rowByRow,
      "cells are not micro-batch-split invariant")
    // the batch walk's per-partition accumulation merges to the
    // SAME cells (the sketch's mergeability, pinned bit-for-bit)
    val batchCells = cellMap(
      StreamSpectrum.cells(feed.toDF("doc_id", "text")).collect())
    assert(oneBig == batchCells, "streamed cells diverge from batch fold")
    // and the shared readout derives the identical 7-row spectrum
    // the oracle-gated batch operator reports
    // pin the maintained cells (localCheckpoint, like the batch
    // form) — spectrumFromCells self-joins its input's legs, which
    // needs distinct attribute ids per leg
    val streamed = Dedup.spectrumFromCells(
      s.sql("SELECT * FROM sp_two").localCheckpoint(true))
      .collect().map(_.toSeq).toSeq
    val batch = Dedup.suffixSpectrumSketch(feed.toDF("doc_id", "text"))
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch,
      s"spectrum readout diverges:\n$streamed\nvs\n$batch")
  }
}
