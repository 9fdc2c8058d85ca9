package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamHeavyHitters

class StreamHeavyHittersSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private val feed = Seq(
    (1L, ts("2024-01-01 00:00:01"), "spark spark hash vector stream"),
    (2L, ts("2024-01-01 00:00:02"), "hash hash spark vector vector"),
    (3L, ts("2024-01-01 00:00:03"), "stream stream stream spark index"),
    (4L, ts("2024-01-01 00:00:04"), "vector hash spark spark probe"),
    (5L, ts("2024-01-01 00:00:05"), "index probe probe spark hash"))

  private def current(sink: String) = {
    val s = spark
    // update-mode memory sink appends every emission; current table
    // per shard = the max-upto row
    s.sql(s"SELECT * FROM $sink").collect()
      .groupBy(_.getAs[Int]("shard"))
      .map { case (sh, rows) => sh -> rows.maxBy(_.getAs[Long]("upto")) }
      .map { case (sh, r) =>
        sh -> ((r.getAs[Long]("upto"),
          r.getSeq[org.apache.spark.sql.Row](2).map(e =>
            (e.getString(0), e.getLong(1), e.getLong(2)))))
      }
  }

  test("streaming fold is split-invariant and equals the batch replay") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    def runSplit(name: String, splits: Seq[Seq[(Long, Timestamp, String)]]) = {
      val mem = MemoryStream[(Long, Timestamp, String)]
      val docs = mem.toDF().toDF("doc_id", "ts", "text")
      val q = StreamHeavyHitters.run(docs, m = 3, shards = 4)
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try {
        splits.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      } finally q.stop()
      current(name)
    }
    val oneBig = runSplit("hh_one", Seq(feed))
    val rowByRow = runSplit("hh_row", feed.map(Seq(_)))
    val uneven = runSplit("hh_two", Seq(feed.take(2), feed.drop(2)))
    assert(oneBig == rowByRow)
    assert(oneBig == uneven)
    val batch = StreamHeavyHitters.batch(
      feed.toDF("doc_id", "ts", "text"), m = 3, shards = 4).collect()
      .map(t => t.shard -> ((t.upto,
        t.entries.map(e => (e.word, e.est_count, e.err))))).toMap
    assert(oneBig == batch)
  }

  test("spacesaving bounds hold against exact counts on real docs") {
    val s = spark
    import s.implicits._
    val m = 16
    val shards = 8
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), lit(ts("2024-01-01 00:00:00")).as("ts"),
        col("text"))
    val tables = StreamHeavyHitters.batch(docs, m, shards).collect()
    val exact = docs
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tables.length == shards)
    tables.foreach { t =>
      assert(t.entries.size <= m)
      // per-shard token total = the fold's consumed count
      val shardWords = exact.filter { case (w, _) =>
        StreamHeavyHitters.shardOf(w, shards) == t.shard }
      assert(shardWords.values.sum == t.upto)
      t.entries.foreach { e =>
        val truth = exact(e.word)
        assert(truth <= e.est_count && e.est_count - e.err <= truth,
          s"${e.word}: true $truth est ${e.est_count} err ${e.err}")
      }
      // the classical guarantee: freq > n/m is always tracked
      val tracked = t.entries.map(_.word).toSet
      shardWords.foreach { case (w, c) =>
        if (c > t.upto / m) assert(tracked.contains(w), s"missed hot $w ($c)")
      }
    }
    // global top-k surfaces the corpus's hottest word
    val topWord = exact.maxBy { case (w, c) => (c, w) }._1
    val top = StreamHeavyHitters
      .topK(StreamHeavyHitters.batch(docs, m, shards), 5).collect()
    assert(top.map(_.getString(0)).contains(topWord))
    assert(top.forall(r => r.getAs[Long]("lo_count") <=
      exact(r.getString(0))))
  }
}
