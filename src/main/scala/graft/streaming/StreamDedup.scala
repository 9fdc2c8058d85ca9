package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

/** Streaming near-duplicate detection — the continuous twin of the
  * batch MinHash+LSH family ([[graft.pipeline.Dedup]]): arriving
  * documents are matched against documents seen within a watermark
  * horizon via a band-bucket stream-stream self-join. The m3
  * reference has no streaming dedup (its aggregator dedup is
  * sample-level, src/aggregator/server); this is the training-data
  * counterpart a continuously-ingesting corpus needs.
  *
  * The batch signature pipeline (explode shingles → groupBy doc)
  * is an AGGREGATION — under streaming that would be a stateful op
  * whose output can't feed a stream-stream join in append mode. So
  * the signature here is recomputed as a PURE PROJECTION: the
  * shingle set is built inside the row with array higher-order
  * functions and each minhash is an `array_min` over it. No state,
  * no shuffle — signatures stream at parse speed, and the ONLY
  * stateful operator in the whole plan is the final self-join.
  * StreamDedupSpec asserts bit-equality of the per-row signatures
  * against [[Dedup.minhashSignature]] so the two paths cannot
  * drift.
  *
  * Scale: state is bounded by the watermark horizon × band keys
  * (bands rows per doc); the join is an equi-join on (band, bucket)
  * with an event-time range — Spark drops state past the horizon.
  * Hot buckets (boilerplate) inflate pairs quadratically exactly as
  * in batch; run exact dedup upstream and keep the horizon short —
  * the batch [[Dedup.minhashCandidates]] hot-bucket cap has no
  * streaming equivalent because a cap needs a per-bucket count
  * (another stateful op).
  */
object StreamDedup {

  /** Word n-gram shingle hashes of `text` as an in-row array —
    * identical values to [[Dedup.shingleHashes]]'s `h` (low 32 md5
    * bits of the lowercased shingle), but built with `transform`/
    * `filter`/`array_distinct` instead of explode+groupBy. The words
    * array is projected into a real column first — an inlined
    * `split` would re-run per element inside the lambdas (the 17×
    * regression recorded in BASELINE.md). */
  private def shingleHashArr(n: Int): Column = {
    val ws = col("_ws")
    val grams = array_distinct(filter(
      transform(ws, (_, i) =>
        when(i <= size(ws) - n,
          concat_ws(" ", (0 until n).map(j => element_at(ws, i + j + 1)): _*))),
      _.isNotNull))
    transform(grams, g => Dedup.md5Int(g))
  }

  /** Append the k per-row minhashes `mh0..mh{k-1}` to `docs`
    * (same affine family, seeds and modulus as
    * [[Dedup.minhashSignature]]). Pure projection — streaming-safe
    * anywhere, including before a stream-stream join. */
  def rowSignature(docs: DataFrame, k: Int = 16, n: Int = 3): DataFrame = {
    val hashed = docs
      .withColumn("_ws", split(lower(col("text")), "\\s+"))
      .withColumn("_hs", shingleHashArr(n))
    val mhs = (0 until k).map { i =>
      val a = 2L * i + 1
      val b = 7919L * (i + 1)
      array_min(transform(col("_hs"), h => pmod(lit(a) * h + lit(b), lit(Dedup.P))))
        .as(s"mh$i")
    }
    hashed.select(docs.columns.map(col) ++ mhs: _*)
  }

  /** LSH band keys: one row per (doc, band) with the band's bucket
    * (md5 of its `rows` consecutive minhashes — byte-identical to
    * the batch banding in [[Dedup.minhashCandidates]]). The band
    * structs are exploded map-side; no aggregation. */
  def bandKeys(docs: DataFrame, k: Int = 16, n: Int = 3,
               bands: Int = 4, rows: Int = 4): DataFrame = {
    // docs too short for a single n-gram have all-null minhashes;
    // left in, they'd all share the constant md5("") bucket (every
    // band) and pair quadratically with each other — the batch
    // pipeline drops shingle-less docs implicitly (no rows survive
    // the explode), so mirror that drop here
    val sigs = rowSignature(docs, k, n).where(col("mh0").isNotNull)
    val bandStructs = array((0 until bands).map { b =>
      val bandCols = (b * rows until b * rows + rows).map(i => col(s"mh$i"))
      struct(lit(b).as("band"),
        md5(concat_ws(",", bandCols: _*)).as("bucket"))
    }: _*)
    sigs
      .withColumn("_b", explode(bandStructs))
      .select(docs.columns.map(col) :+ col("_b.band") :+ col("_b.bucket"): _*)
  }

  /** Streaming near-dup candidate pairs: every arriving doc joined
    * to docs seen within ±`horizon` that share a band bucket.
    * `docs` must carry (doc_id, ts, text); emits one row per
    * (pair, matching band) in append mode — downstream exact
    * verification (jaccard on the pair's texts) dedupes multi-band
    * hits, mirroring the batch candidates→verify split.
    *
    * Both join inputs carry the watermark and the join condition
    * bounds event time in BOTH directions, so Spark evicts join
    * state past `lateness + horizon` — state per key is the band
    * rows of in-horizon docs, independent of stream length. */
  def nearDupCandidates(docs: DataFrame, lateness: String = "30 minutes",
                        horizon: String = "30 minutes"): DataFrame = {
    val banded = bandKeys(docs.select("doc_id", "ts", "text"))
      .withWatermark("ts", lateness)
    val left = banded.select(col("doc_id").as("doc_a"),
      col("ts").as("ts_a"), col("band"), col("bucket"))
    val right = banded.select(col("doc_id").as("doc_b"),
      col("ts").as("ts_b"), col("band").as("_band_b"),
      col("bucket").as("_bucket_b"))
    // the join condition carries ONLY the equi keys + the event-time
    // range: Spark's streaming-join state-watermark analyzer derives
    // eviction bounds from the <,>= terms and cannot handle an
    // inequality over non-time columns there — pair canonicalization
    // (doc_a < doc_b) is a stateless post-join filter instead
    left.join(right,
      col("band") === col("_band_b") &&
        col("bucket") === col("_bucket_b") &&
        col("ts_b") >= col("ts_a") - expr(s"INTERVAL $horizon") &&
        col("ts_b") <= col("ts_a") + expr(s"INTERVAL $horizon"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("band"),
        col("ts_a"), col("ts_b"))
  }
}
