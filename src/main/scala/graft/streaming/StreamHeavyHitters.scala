package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SpaceSaving heavy hitters (Metwally, Agrawal & El
  * Abbadi 2005, "Efficient Computation of Frequent and Top-k
  * Elements in Data Streams") — the always-on top-k companion of the
  * batch Count-Min card ([[graft.pipeline.Sketches.cmsHeavyHitters]]):
  * a continuously-ingesting corpus wants "what are the hot tokens
  * RIGHT NOW" without re-scanning history, and SpaceSaving is the
  * summary with the classical guarantees — per tracked word,
  * `est_count − err ≤ true ≤ est_count`, and every word whose true
  * frequency exceeds (shard tokens)/m IS tracked.
  *
  * SpaceSaving is an ORDER-DEFINED sketch (which entry gets evicted
  * depends on arrival order), so no batch-SQL oracle exists; instead
  * the canonical order is pinned — tokens fold in (event time,
  * doc_id, position) order with deterministic min-entry eviction on
  * (count, err, word) — and the spec proves the three properties
  * that make the sketch trustworthy: the streaming fold equals the
  * batch replay BIT-FOR-BIT under every micro-batch split, the
  * SpaceSaving error bound holds against exact counts, and every
  * above-threshold word is tracked.
  *
  * Sharding: words hash-partition into `shards` disjoint SpaceSaving
  * tables (low 32 md5 bits, the dedup family's hash derivation), so
  * state parallelizes across executors; each shard's guarantee
  * applies to exactly the words it owns, and the union of tables
  * majorizes a single m·shards-entry table. State per shard is the
  * m-entry table plus a consumed-token count — bounded, watermark-
  * free, the same always-on posture as [[StreamAnomaly]].
  *
  * Scale: the streaming path shuffles tokens once (by shard) into
  * the stateful fold; the batch twin repartitions by shard and
  * SORTS WITHIN partitions, folding each shard as a streaming pass
  * over the sorted run — no shard's token stream is ever
  * materialized in memory. */
object StreamHeavyHitters {

  case class Tok(shard: Int, ts_us: Long, doc_id: Long, pos: Int,
                 word: String)
  case class Entry(word: String, est_count: Long, err: Long)
  case class ShardTable(shard: Int, upto: Long, entries: Seq[Entry])

  val Shards = 16

  /** word → shard: first 4 md5 bytes as an unsigned int (the
    * Scala-side twin of Dedup.md5Int's column definition). */
  private[graft] def shardOf(w: String, shards: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(w.getBytes("UTF-8"))
    val h = ((md(0) & 0xffL) << 24) | ((md(1) & 0xffL) << 16) |
      ((md(2) & 0xffL) << 8) | (md(3) & 0xffL)
    (h % shards).toInt
  }

  /** One SpaceSaving step over the m-bounded table: tracked words
    * increment; new words fill free slots with err 0; a full table
    * evicts the deterministic minimum entry (count, err, word) and
    * the newcomer inherits its count as (count+1, err=count). */
  private[streaming] def step(tab: Map[String, (Long, Long)], m: Int,
                              w: String): Map[String, (Long, Long)] =
    tab.get(w) match {
      case Some((c, e))           => tab.updated(w, (c + 1, e))
      case None if tab.size < m   => tab.updated(w, (1L, 0L))
      case None =>
        val (vw, (vc, _)) = tab.minBy { case (k, (c, e)) => (c, e, k) }
        (tab - vw).updated(w, (vc + 1, vc))
    }

  private def render(tab: Map[String, (Long, Long)]): Seq[Entry] =
    tab.toSeq.map { case (w, (c, e)) => Entry(w, c, e) }
      .sortBy(e => (-e.est_count, e.err, e.word))

  /** The token stream in canonical order keys: whitespace words of
    * `text` (the corpus family's tokenization) with (event time µs,
    * doc_id, position) as the fold order. */
  def tokens(docs: DataFrame, shards: Int = Shards): Dataset[Tok] = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col("doc_id").cast("long"),
      unix_micros(col("ts")).as("ts_us"),
      posexplode(split(lower(col("text")), "\\s+")).as(Seq("pos", "word")))
      .as[(Long, Long, Int, String)]
      .map { case (id, ts, pos, w) => Tok(shardOf(w, shards), ts, id, pos, w) }
  }

  /** Streaming form: per shard, fold each micro-batch's tokens in
    * canonical order on top of the carried table; emit the table
    * snapshot tagged with the consumed-token count (`upto`), so a
    * consumer takes the max-`upto` row per shard as "current".
    * Update output mode. */
  def run(docs: DataFrame, m: Int = 32,
          shards: Int = Shards): Dataset[ShardTable] = {
    val toks = tokens(docs, shards)
    val s = toks.sparkSession
    import s.implicits._
    toks.groupByKey(_.shard)
      .flatMapGroupsWithState[(Long, Seq[Entry]), ShardTable](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (shard, it, state: GroupState[(Long, Seq[Entry])]) =>
          val (n0, entries0) =
            state.getOption.getOrElse((0L, Seq.empty[Entry]))
          val tab0 = entries0.map(e => e.word -> ((e.est_count, e.err))).toMap
          val batch = it.toSeq.sortBy(t => (t.ts_us, t.doc_id, t.pos))
          val tab = batch.foldLeft(tab0)((t, tok) => step(t, m, tok.word))
          val n = n0 + batch.size
          val entries = render(tab)
          state.update((n, entries))
          Iterator.single(ShardTable(shard, n, entries))
      }
  }

  /** Batch replay twin: the identical fold over the identical
    * canonical order, as one shard-partitioned sorted pass (each
    * shard folds as a stream over its sorted run — nothing
    * materializes a shard's tokens). */
  def batch(docs: DataFrame, m: Int = 32,
            shards: Int = Shards): Dataset[ShardTable] = {
    val toks = tokens(docs, shards)
    val s = toks.sparkSession
    import s.implicits._
    toks.repartition(col("shard"))
      .sortWithinPartitions("shard", "ts_us", "doc_id", "pos")
      .mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer.empty[ShardTable]
        var cur = -1
        var n = 0L
        var tab = Map.empty[String, (Long, Long)]
        def flush(): Unit =
          if (cur >= 0) out += ShardTable(cur, n, render(tab))
        it.foreach { t =>
          if (t.shard != cur) { flush(); cur = t.shard; n = 0L; tab = Map.empty }
          tab = step(tab, m, t.word); n += 1
        }
        flush()
        out.iterator
      }
  }

  /** Global top-k across shard tables with the SpaceSaving
    * guaranteed lower bound (`est_count − err ≤ true count`). */
  def topK(tables: Dataset[ShardTable], k: Int): DataFrame =
    tables.toDF().select(explode(col("entries")).as("e"))
      .select(col("e.word").as("word"), col("e.est_count").as("est_count"),
        col("e.err").as("err"),
        (col("e.est_count") - col("e.err")).as("lo_count"))
      .orderBy(col("est_count").desc, col("word").asc).limit(k)
}
