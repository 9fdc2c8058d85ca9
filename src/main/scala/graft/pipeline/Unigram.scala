package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer TRAINING — the
  * companion to the BPE trainer ([[TextAnalysis]] corpus_bpe_train):
  * where BPE grows a vocabulary bottom-up by merging, the unigram
  * trainer starts from an over-complete seed of frequent substrings
  * and PRUNES it down over EM-style rounds (Kudo 2018: seed → E-step
  * segment corpus under current vocab → count piece usage → M-step
  * drop the weakest pieces → repeat).
  *
  * The E-step here segments by deterministic greedy longest-match
  * (the WordPiece inference rule) instead of Viterbi: segmentation
  * then needs no probabilities — piece selection is integer string
  * matching, so every round replays bit-exactly in the DuckDB oracle
  * (no float argmax anywhere in the control path; the only float is
  * the reported log-probability of the FINAL vocabulary, rounded).
  * A Viterbi E-step is a drop-in swap on the same skeleton.
  *
  * Scale discipline (the corpus_bpe_train pattern): all counting
  * runs over the DISTINCT word-frequency table, never raw tokens;
  * the vocabulary is the bounded driver artifact (≤ seedMulti +
  * |charset| rows collected per round — it IS the model); the
  * per-round segmentation is `maxSteps` pure map stages against
  * vocab LITERALS (the IVF-centroid-literal pattern — zero joins,
  * zero shuffles) followed by ONE usage aggregation.
  */
object Unigram {

  /** Longest piece in `vocab` matching `word` at `pos` — a coalesce
    * over piece lengths, longest first: pure column algebra against
    * the bounded vocab literals. A length-l candidate only equals a
    * length-l piece, so a truncated end-of-word substr can never
    * false-match. */
  private def longestMatch(vocab: Seq[String], pieceMax: Int): Column = {
    val byLen = vocab.groupBy(_.length)
    val cands = (pieceMax to 1 by -1).flatMap { l =>
      byLen.get(l).map { ps =>
        val c = col("word").substr(col("pos"), lit(l))
        when(c.isin(ps: _*), c)
      }
    }
    coalesce(cands: _*)
  }

  /** One greedy segmentation pass of the word table under `vocab`:
    * returns (piece, usage) — usage summed over word frequencies.
    * `maxSteps` bounds the unroll (≥ the longest word; asserted by
    * the caller). */
  private def segmentCounts(wf: DataFrame, vocab: Seq[String],
                            pieceMax: Int, maxSteps: Int): DataFrame = {
    var cur = wf.withColumn("pos", lit(1))
    var emitted: Option[DataFrame] = None
    for (_ <- 1 to maxSteps) {
      // eager checkpoint per step: pos_{i+1} references piece_i which
      // references pos_i — left symbolic, CollapseProject inlines the
      // chain into every use and the expression tree grows
      // exponentially with the unroll depth (the OOM trap). The
      // frame is word-vocabulary-sized, so materializing it is the
      // cheap side of the trade.
      val m = cur.withColumn("piece", longestMatch(vocab, pieceMax))
        .where(col("piece").isNotNull)
        .localCheckpoint(true)
      val e = m.select(col("freq"), col("piece"))
      emitted = Some(emitted.map(_.unionAll(e)).getOrElse(e))
      cur = m.where(col("pos") + length(col("piece")) <= length(col("word")))
        .select(col("word"), col("freq"),
          (col("pos") + length(col("piece"))).as("pos"))
    }
    emitted.get.groupBy("piece").agg(sum("freq").as("usage"))
  }

  /** Segmentation steps actually needed: every step consumes at
    * least one character, so maxLen steps always complete — running
    * the full declared unroll would spend (maxSteps − maxLen) empty
    * jobs per pass (the oracle's extra unrolled CTEs are free; Spark
    * jobs are not). One bounded aggregate. */
  private def effectiveSteps(wf: DataFrame, maxSteps: Int): Int = {
    val maxLen = wf.agg(max(length(col("word")))).head().getInt(0)
    require(maxLen <= maxSteps,
      s"word length $maxLen exceeds the $maxSteps-step segmentation unroll")
    maxLen
  }

  /** The distinct word-frequency table every stage counts over. */
  private def wordFreq(docs: DataFrame): DataFrame =
    docs
      .select(explode(split(lower(col("text")), "\\s+")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .localCheckpoint(true)

  /** The prune-loop proper: returns the FINAL vocabulary (the
    * bounded model artifact — collected once per round, ≤ seedMulti
    * + |charset| strings). Shared by [[train]] (which reports it
    * with usage + log-probs) and [[encode]] (which applies it). */
  private[graft] def trainVocab(wf: DataFrame, seedMulti: Int,
                                pieceMax: Int, rounds: Int,
                                prunePerRound: Int,
                                maxSteps: Int): Seq[String] = {
    val steps = effectiveSteps(wf, maxSteps)
    // substring seed frequencies: every start position of every
    // length ≤ pieceMax, weighted by word frequency
    val subs = (1 to pieceMax).map { l =>
      wf.where(length(col("word")) >= l)
        .select(col("freq"),
          explode(transform(
            sequence(lit(1), length(col("word")) - lit(l - 1)),
            i => col("word").substr(i, lit(l)))).as("piece"))
    }.reduce(_ unionAll _)
      .groupBy("piece").agg(sum("freq").as("usage"))
    val chars: Seq[String] = subs.where(length(col("piece")) === 1)
      .orderBy("piece").collect().map(_.getString(0)).toSeq
    val seed: Seq[String] = subs.where(length(col("piece")) > 1)
      .orderBy(col("usage").desc, col("piece").asc).limit(seedMulti)
      .select("piece").collect().map(_.getString(0)).toSeq
    var vocab: Seq[String] = chars ++ seed
    for (_ <- 1 to rounds) {
      val counts = segmentCounts(wf, vocab, pieceMax, steps)
      // bounded collect: |vocab| rows — unused pieces count 0
      val usage: Map[String, Long] = counts.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val multi = vocab.filter(_.length > 1)
        .sortBy(p => (-usage.getOrElse(p, 0L), p))
      vocab = chars ++ multi.dropRight(math.min(prunePerRound, multi.size))
    }
    vocab
  }

  /** Train: seed = every corpus character plus the `seedMulti` most
    * frequent multi-character substrings (length ≤ `pieceMax`,
    * occurrence-weighted by word frequency, ties to the
    * lexicographically first); each round segments, counts and drops
    * the `prunePerRound` weakest multi-char pieces (characters are
    * never pruned — they guarantee coverage). Output: the final
    * vocabulary with usage counts under it and the smoothed
    * log-probability round(ln((usage+1)/(total+|V|)), 6) — the
    * unigram LM artifact, one row per piece. */
  def train(docs: DataFrame, seedMulti: Int = 16, pieceMax: Int = 4,
            rounds: Int = 3, prunePerRound: Int = 3,
            maxSteps: Int = 24): DataFrame = {
    val wf = wordFreq(docs)
    val vocab = trainVocab(wf, seedMulti, pieceMax, rounds, prunePerRound,
      maxSteps)
    val finalCounts = segmentCounts(wf, vocab, pieceMax,
      effectiveSteps(wf, maxSteps))
    val spark = docs.sparkSession
    import spark.implicits._
    val vdf = vocab.toDF("piece")
    val v = vocab.size
    val joined = vdf.join(finalCounts, Seq("piece"), "left")
      .select(col("piece"),
        coalesce(col("usage"), lit(0L)).as("usage"))
    val total = joined.agg(sum("usage")).head().getLong(0)
    joined
      .select(col("piece"), length(col("piece")).cast("long").as("n_chars"),
        col("usage"),
        round(log((col("usage") + 1).cast("double") /
          lit((total + v).toDouble)), 6).as("logp"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(lit(1))  // bounded |V|-row frame
          .orderBy(col("usage").desc, col("piece").asc)).cast("long"))
      .orderBy("rank")
  }

  /** Tokenizer APPLICATION — the corpus_bpe_encode companion: train
    * the vocabulary (same prune loop), then tokenize every document
    * with it. Per-word piece counts are computed ONCE on the
    * distinct word table (the same greedy segmentation, counting
    * pieces per word instead of usage per piece) and joined back to
    * the exploded doc words — the corpus text is touched once, and
    * the per-word cost table is vocabulary-sized (broadcast side).
    * Output per doc: word count and unigram token count. */
  def encode(docs: DataFrame, seedMulti: Int = 16, pieceMax: Int = 4,
             rounds: Int = 3, prunePerRound: Int = 3,
             maxSteps: Int = 24): DataFrame = {
    val wf = wordFreq(docs)
    val vocab = trainVocab(wf, seedMulti, pieceMax, rounds, prunePerRound,
      maxSteps)
    // per-word piece count under the final vocab: same unrolled
    // greedy walk, grouped by word
    var cur = wf.select(col("word")).withColumn("pos", lit(1))
    var emitted: Option[DataFrame] = None
    for (_ <- 1 to effectiveSteps(wf, maxSteps)) {
      val m = cur.withColumn("piece", longestMatch(vocab, pieceMax))
        .where(col("piece").isNotNull)
        .localCheckpoint(true)
      val e = m.select(col("word"))
      emitted = Some(emitted.map(_.unionAll(e)).getOrElse(e))
      cur = m.where(col("pos") + length(col("piece")) <= length(col("word")))
        .select(col("word"), (col("pos") + length(col("piece"))).as("pos"))
    }
    val perWord = emitted.get.groupBy("word")
      .agg(count(lit(1)).as("word_pieces"))
    docs
      .select(col("doc_id"),
        explode(split(lower(col("text")), "\\s+")).as("word"))
      .where(length(col("word")) > 0)
      .join(broadcast(perWord), Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum("word_pieces").as("unigram_tokens"))
      .orderBy("doc_id")
  }
}
