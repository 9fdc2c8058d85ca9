package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming weighted reservoir — the always-on form of
  * [[graft.pipeline.Corpus.reservoirSample]]: a continuously-ingesting
  * corpus keeps a live per-source weighted sample ("give me 10
  * representative docs per feed, length-weighted, RIGHT NOW") without
  * re-scanning history.
  *
  * Because A-ES keys are DETERMINISTIC (md5-uniform, ln(u)/w) and
  * top-n-by-key is a pure selection, the reservoir is
  * order-independent: folding any partition of the stream in any
  * order yields exactly the batch sampler's result — a stronger
  * claim than the SpaceSaving family's order-defined parity, and the
  * spec asserts it: streaming snapshot == `reservoirSample` output
  * under every micro-batch split.
  *
  * State per source = the n kept (res_key, doc_id, n_chars) triples
  * plus a consumed-doc count — bounded, watermark-free, the
  * [[StreamHeavyHitters]] posture.
  *
  * Scale: each micro-batch shuffles once (by source) into the
  * stateful fold; per-batch work is merge-and-truncate over
  * n + batch rows. The batch twin IS the two-phase
  * `reservoirSample`. */
object StreamReservoir {

  case class Doc(source: String, doc_id: Long, n_chars: Long,
                 res_key: Double)
  case class Entry(doc_id: Long, n_chars: Long, res_key: Double)
  case class Reservoir(source: String, upto: Long, entries: Seq[Entry])

  /** Docs keyed with the SHARED batch draw column (no drift by
    * construction). */
  def keyed(docs: DataFrame): Dataset[Doc] = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col("source"), col("doc_id").cast("long"),
      col("n_chars").cast("long"),
      graft.pipeline.Corpus.resKeyCol.as("res_key"))
      .as[Doc]
  }

  /** Keep the top-n by (res_key desc, doc_id asc) — the same
    * ordering the batch windows use. */
  private[streaming] def truncate(es: Seq[Entry], n: Int): Seq[Entry] =
    es.sortBy(e => (-e.res_key, e.doc_id)).take(n)

  /** Streaming form: per source, merge each micro-batch into the
    * carried reservoir; emit the snapshot tagged with the consumed
    * count (max-`upto` row per source is "current"). Update mode. */
  def run(docs: DataFrame, n: Int = 10): Dataset[Reservoir] = {
    val ds = keyed(docs)
    val s = ds.sparkSession
    import s.implicits._
    ds.groupByKey(_.source)
      .flatMapGroupsWithState[(Long, Seq[Entry]), Reservoir](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (source, it, state: GroupState[(Long, Seq[Entry])]) =>
          val (n0, kept0) = state.getOption.getOrElse((0L, Seq.empty[Entry]))
          val batch = it.toSeq
          val kept = truncate(
            kept0 ++ batch.map(d => Entry(d.doc_id, d.n_chars, d.res_key)), n)
          val total = n0 + batch.size
          state.update((total, kept))
          Iterator.single(Reservoir(source, total, kept))
      }
  }
}
