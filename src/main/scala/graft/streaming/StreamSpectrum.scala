package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming maintenance of the sketch-mode repetition spectrum —
  * the always-on twin of [[graft.pipeline.Dedup.suffixSpectrumSketch]],
  * the same posture as the HLL/DDSketch maintainers: a continuously
  * ingesting corpus wants "how much verbatim duplication, at which
  * match lengths, RIGHT NOW" without rescanning history, and the
  * sketch was BUILT from mergeable state — HLL registers max-merge,
  * CMS cells / sampled census / alphabet census / char counts
  * sum-merge — so maintaining it is one streaming aggregation.
  *
  * Per micro-batch each doc emits its per-doc partial rows
  * ([[graft.pipeline.Dedup.spectrumDocPartials]] — the SAME
  * doubling-chain group ids and md5-carved estimator ranges as the
  * batch walk, shared code so the hash family cannot drift); the
  * maintained state is `groupBy(kind, depth, k)` with max(v)/sum(v),
  * whose cell values are partition- and split-order independent by
  * construction. The spec pins BIT-IDENTICAL cells (and the derived
  * 7-row spectrum, via the shared
  * [[graft.pipeline.Dedup.spectrumFromCells]] readout) against the
  * batch form under arbitrary micro-batch splits.
  *
  * Scale: per-batch partial aggregation combines each micro-batch's
  * rows down to ≤ the cell cardinality before touching state; the
  * state itself is the sketch — HLL registers + CMS cells are
  * FIXED-size, the sampled census grows with 1/64 of distinct deep
  * groups and the alphabet census with the alphabet, the same
  * footprint the batch sketch ships. */
object StreamSpectrum {

  /** The per-doc partial rows for one (possibly streaming) doc
    * frame — input (doc_id, text), output (kind, depth, k, v). */
  def partials(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (_, text) =>
          graft.pipeline.Dedup.spectrumDocPartials(md, text)
        }
      }
      .toDF("kind", "depth", "k", "v")
  }

  /** The maintained cell table: one streaming aggregation over the
    * per-doc partials (run with complete or update output mode; the
    * same plan doubles as the batch fold in the parity spec). */
  def cells(docs: DataFrame): DataFrame =
    partials(docs).groupBy("kind", "depth", "k")
      .agg(max("v").as("vmax"), sum("v").as("vsum"))
}
