package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.sources.{Tsz, TszStore}
import graft.tsdb.Temporal

class TszSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("codec round-trips adversarial blocks exactly") {
    // repeats, sign flips, mult upgrades (int → 1dp → 2dp), a large
    // jump, sig-tracker collapse run, irregular microsecond cadence
    val pts = Array(
      (1700000000000000L, 5.0),
      (1700000000000001L, 5.0),       // dod kicks to 7-bit bucket
      (1700000001500000L, -5.0),      // sign flip, big micros dod
      (1700000002000000L, 81.1),      // mult 0 → 1
      (1700000002000500L, 19.17),     // mult 1 → 2
      (1700000002001000L, 19.18),
      (1700000002001500L, 19.19),
      (1700000002002000L, 19.20),
      (1700000002002500L, 19.21),
      (1700000002003000L, 19.22),     // 5th small diff → sig collapse
      (1700000002003500L, 98765.43),  // large jump grows sig again
      (1700000002004000L, 98765.43),  // repeat at high mult
      (1700000002004500L, 0.0))
    val (bytes, tsBits, valBits) = Tsz.encodeBlock(pts)
    assert(tsBits > 0 && valBits > 0)
    assert(bytes.length.toLong * 8 >= tsBits + valBits)
    val back = Tsz.decodeBlock(bytes, pts.length)
    assert(back.toSeq == pts.toSeq, "round trip must be exact")
    // compression should beat raw (64+64 bits per point) on this block
    assert(tsBits + valBits < pts.length * 128L)
  }

  test("value-half bits equal the tszValueCost card per series") {
    val s = spark
    import s.implicits._
    val samples = tsdb.Vectors.samples(Tables.events(spark, sf))
    val cards = Temporal.tszValueCost(samples)
      .select("name", "user_id", "total_bits").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val enc = TszStore.blockFrame(samples)
      .groupBy("name", "user_id").agg(sum("val_bits").as("vb"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(enc.keySet == cards.keySet)
    val bad = enc.collect { case (k, v) if cards(k) != v => (k, v, cards(k)) }
    assert(bad.isEmpty, s"bits mismatch on ${bad.take(3).mkString(", ")}")
  }

  test("streamed ingest + compaction equal the batch path exactly") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.Ingest
    val mem = MemoryStream[Ingest.Sample]
    val ck = java.nio.file.Files.createTempDirectory("graft-tsz-ck").toString
    spark.sql("DROP TABLE IF EXISTS graft_tsz_stream")
    val q = TszStore.streamWrite(mem.toDF(), "graft_tsz_stream", ck)
    try {
      // one (series, day) split across TWO micro-batches
      mem.addData(
        Ingest.Sample("m", 1L, ts("2024-01-01 01:00:00"), 5.0),
        Ingest.Sample("m", 1L, ts("2024-01-01 02:00:00"), 7.25))
      q.processAllAvailable()
      mem.addData(
        Ingest.Sample("m", 1L, ts("2024-01-01 03:00:00"), 7.25),
        Ingest.Sample("m", 1L, ts("2024-01-02 01:00:00"), 9.0))
      q.processAllAvailable()
    } finally q.stop()
    val blobs = spark.table("graft_tsz_stream")
      .groupBy("block").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(blobs.values.exists(_ > 1) || blobs.size == 2,
      s"expected split-day blobs: $blobs")
    // pre-compaction: all points decode across the block versions
    def pts() = TszStore.readDecoded(spark, "graft_tsz_stream")
      .collect().map(r => (r.getAs[java.sql.Timestamp]("ts").getTime,
        r.getAs[Double]("value"))).sorted.toSeq
    val before = pts()
    assert(before.map(_._2) == Seq(5.0, 7.25, 7.25, 9.0))
    TszStore.compact(spark, "graft_tsz_stream")
    // post-compaction: ONE blob per block key, same point set
    val counts = spark.table("graft_tsz_stream")
      .groupBy("name", "user_id", "block").count()
      .collect().map(_.getLong(3))
    assert(counts.forall(_ == 1L), "compaction must fold to one blob per key")
    assert(pts() == before, "compaction must preserve the point set")
  }

  test("store round-trips the sf sample stream through parquet blocks") {
    val samples = tsdb.Vectors.samples(Tables.events(spark, sf))
    TszStore.write(samples, "graft_tsz_spec")
    val back = TszStore.readDecoded(spark, "graft_tsz_spec")
    val cents = round(col("value") * 100, 0).cast("long")
    def census(df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)), sum(cents), min(cents), max(cents),
        sum(unix_micros(col("ts")))).collect()(0).toSeq
    assert(census(back) == census(samples), "decoded census != raw census")
    // block pruning reaches the scan before any blob decodes
    val blocks = spark.table("graft_tsz_spec")
      .agg(min("block"), max("block")).collect()(0)
    val (mn, mx) = (blocks.getLong(0), blocks.getLong(1))
    if (mx > mn) {
      val pruned = TszStore.readDecoded(spark, "graft_tsz_spec",
        fromBlock = Some(mn + 1))
      val direct = samples.where(
        floor(unix_timestamp(col("ts")).cast("double") / 86400.0) >= mn + 1)
      assert(pruned.count() == direct.count())
    }
  }
}
