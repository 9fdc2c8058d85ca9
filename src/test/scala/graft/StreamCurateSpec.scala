package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import graft.pipeline.TextAnalysis
import graft.streaming.StreamCurate

class StreamCurateSpec extends SparkSpec {

  private val good =
    "the quick brown fox jumps over the lazy dog and that is that"
  // repetition sinks the quality composite (distinct ratio 0.25,
  // negligible length score, no stopwords) well under the 0.3 gate
  private val junk = "zzz zzz zzz zzz"

  test("stream scoring is bit-equal to the batch quality operator") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, Timestamp.valueOf("2024-01-01 00:00:00"), good))
      .toDF("doc_id", "ts", "text")
    val streamed = StreamCurate.curate(docs, minQuality = 0.0)
      .select("doc_id", "quality_score", "n_tokens").collect()(0)
    val batchQ = TextAnalysis.quality(docs).collect()(0)
      .getAs[Double]("quality_score")
    val batchT = TextAnalysis.tokenCount(docs).collect()(0)
      .getAs[Long]("bpe_tokens")
    assert(streamed.getAs[Double]("quality_score") == batchQ)
    assert(streamed.getAs[Long]("n_tokens") == batchT)
  }

  test("cross-batch exact dup dropped, junk gated, survivors pass") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val out = StreamCurate.curate(mem.toDF().toDF("doc_id", "ts", "text"))
    val q = out.writeStream.format("memory").queryName("curated")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, Timestamp.valueOf("2024-01-01 00:00:00"), good),
        (2L, Timestamp.valueOf("2024-01-01 00:01:00"), junk))
      q.processAllAvailable()
      // the same content arrives again in a LATER batch, inside the
      // watermark horizon — state must drop it
      mem.addData(
        (3L, Timestamp.valueOf("2024-01-01 00:10:00"), good),
        (4L, Timestamp.valueOf("2024-01-01 00:11:00"),
          "a different surviving document with plenty of ordinary words"))
      q.processAllAvailable()
      val ids = s.table("curated").select("doc_id").collect()
        .map(_.getLong(0)).toSet
      assert(ids == Set(1L, 4L), s"got $ids")
    } finally q.stop()
  }

  test("the dedup is the only stateful operator in the plan") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, Timestamp.valueOf("2024-01-01 00:00:00"), good))
      .toDF("doc_id", "ts", "text")
    val plan = StreamCurate.curate(docs)
      .queryExecution.analyzed.toString
    // no aggregation anywhere: scoring is projection-only, and the
    // batch dedup is the deterministic earliest-row pick (row_number
    // over the hash, ordered by arrival) — not an arbitrary-row
    // Deduplicate, so a backfill replay keeps the same doc the live
    // stream kept
    assert(!plan.contains("Aggregate"), s"scoring must stay map-side:\n$plan")
    assert(plan.contains("row_number"), plan)
  }

  test("batch backfill keeps the deterministic earliest arrival per hash") {
    val s = spark
    import s.implicits._
    // same content at three timestamps, shuffled input order: the
    // keeper must be the earliest (ts, doc_id), not partition luck
    val docs = Seq(
      (9L, Timestamp.valueOf("2024-01-01 00:05:00"), good),
      (2L, Timestamp.valueOf("2024-01-01 00:01:00"), good),
      (5L, Timestamp.valueOf("2024-01-01 00:01:00"), good))
      .toDF("doc_id", "ts", "text").repartition(4)
    val kept = StreamCurate.curate(docs).select("doc_id").collect()
      .map(_.getLong(0)).toSeq
    assert(kept == Seq(2L), s"got $kept")
  }
}
