package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import graft.pipeline.Dedup
import graft.streaming.StreamDedup

class StreamDedupSpec extends SparkSpec {

  private def docsFrame = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (3L, "a completely different document about spark structured streaming state"),
      (4L, "another unrelated text concerning parquet row group statistics pruning")
    ).toDF("doc_id", "text")
  }

  test("per-row signatures are bit-equal to the batch minhash pipeline") {
    val streamPath = StreamDedup.rowSignature(docsFrame)
      .select("doc_id", (0 until 16).map(i => s"mh$i"): _*)
      .collect().map(r => r.toSeq).toSet
    val batchPath = Dedup.minhashSignature(docsFrame)
      .select("doc_id", (0 until 16).map(i => s"mh$i"): _*)
      .collect().map(r => r.toSeq).toSet
    assert(streamPath == batchPath)
    Dedup.clearShingleCache()
  }

  test("signature projection is stateless — no aggregate in the plan") {
    val plan = StreamDedup.bandKeys(docsFrame)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Aggregate"), s"banding must stay map-side:\n$plan")
    assert(!plan.contains("Exchange"), s"banding must not shuffle:\n$plan")
  }

  test("shingle-less short docs never band (no constant-bucket flood)") {
    val s = spark
    import s.implicits._
    // <n words → no shingles → all-null minhashes; these must be
    // dropped before banding, mirroring the batch pipeline's
    // implicit drop — otherwise every short doc shares md5("")
    // buckets and pairs quadratically
    val docs = Seq((1L, "ok"), (2L, "error 42"), (3L, "a b"))
      .toDF("doc_id", "text")
    assert(StreamDedup.bandKeys(docs).count() == 0)
    val full = docsFrame
    assert(StreamDedup.bandKeys(full).count() == full.count() * 4)
  }

  test("streaming self-join finds cross-batch near-dups within the horizon") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val docs = mem.toDF().toDF("doc_id", "ts", "text")
    val out = StreamDedup.nearDupCandidates(docs)
    val q = out.writeStream.format("memory").queryName("near_dups")
      .outputMode("append").start()
    try {
      val dup = "the quick brown fox jumps over the lazy dog near the river bank"
      mem.addData((10L, Timestamp.valueOf("2024-01-01 00:00:00"), dup))
      q.processAllAvailable()
      // second copy arrives in a LATER batch, 10 min apart (in horizon)
      mem.addData(
        (11L, Timestamp.valueOf("2024-01-01 00:10:00"), dup),
        (12L, Timestamp.valueOf("2024-01-01 00:12:00"),
          "some wholly distinct third document about watermark semantics"))
      q.processAllAvailable()
      // a third copy far outside the horizon must NOT pair with 10/11
      mem.addData((13L, Timestamp.valueOf("2024-01-01 09:00:00"), dup))
      q.processAllAvailable()
      val pairs = s.sql("SELECT DISTINCT doc_a, doc_b FROM near_dups")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((10L, 11L)), s"missed the planted dup pair: $pairs")
      assert(!pairs.exists(p => p._1 == 12L || p._2 == 12L),
        s"unrelated doc paired: $pairs")
      assert(!pairs.exists(p => p._2 == 13L),
        s"pair across the horizon: $pairs")
    } finally q.stop()
  }
}
