package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.TextAnalysis

/** Streaming corpus curation — the continuous form of the batch
  * cleaning funnel (`corpus_funnel`): a quality gate and token meter
  * as pure projections, then exact first-occurrence dedup on the
  * content hash bounded by an event-time watermark. The m3 reference
  * streams METRICS through its aggregator; this is the training-data
  * analogue for a continuously-ingesting corpus — documents arrive,
  * are scored, gated and deduped online, and the survivor stream
  * feeds the same downstream stages the batch pipeline uses.
  *
  * Design mirrors [[StreamDedup]]'s discipline: everything that CAN
  * be a projection IS one (quality score and BPE token count reuse
  * the batch column expressions verbatim, so stream and batch
  * scoring cannot drift — spec-asserted bit-equal), and the ONLY
  * stateful operator in the plan is the final
  * `dropDuplicatesWithinWatermark`, whose state is one row per
  * distinct content hash inside the horizon. Near-dup streaming
  * lives in [[StreamDedup]]; run this exact gate upstream of it,
  * exactly as batch pipelines order exact-before-fuzzy.
  */
object StreamCurate {

  /** Gate + dedup an arriving document stream. `docs` needs
    * (doc_id, ts, text); emits the curated stream with
    * quality_score / n_tokens / content_hash attached. Docs below
    * `minQuality` drop map-side (no state); duplicate content within
    * the `lateness` horizon keeps only the first arrival. */
  def curate(docs: DataFrame, lateness: String = "30 minutes",
             minQuality: Double = 0.3): DataFrame = {
    val gated = docs
      .withColumn("quality_score", TextAnalysis.qualityScoreCol(col("text")))
      .withColumn("n_tokens", TextAnalysis.bpeTokensCol(col("text")))
      .where(col("quality_score") >= minQuality)
      .withColumn("content_hash", md5(col("text")))
    // watermark-bounded state on a stream; on a batch frame (the
    // within-watermark form is streaming-only) keep the DETERMINISTIC
    // earliest arrival per hash — plain dropDuplicates keeps an
    // arbitrary partition-order row, so a backfill replay could keep
    // a different doc than the live stream did
    if (gated.isStreaming)
      gated.withWatermark("ts", lateness)
        .dropDuplicatesWithinWatermark("content_hash")
    else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("content_hash").orderBy(col("ts"), col("doc_id"))
      gated.withColumn("_rn", row_number().over(w))
        .where(col("_rn") === 1).drop("_rn")
    }
  }
}
