package graft.pipeline

import graft.Materialize.MatOps

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
  private def longestMatchAt(vocab: Seq[String], pieceMax: Int,
                             word: Column, pos: Column): Column = {
    val byLen = vocab.groupBy(_.length)
    val cands = (pieceMax to 1 by -1).flatMap { l =>
      byLen.get(l).map { ps =>
        val c = word.substr(pos, lit(l))
        when(c.isin(ps: _*), c)
      }
    }
    coalesce(cands: _*)
  }

  /** The full greedy longest-match walk over one word as a SINGLE
    * runtime-iterated expression: `aggregate` over sequence(1, len)
    * carries (pos, pieces, stop) and applies [[longestMatchAt]] per
    * step. Each step consumes ≥1 character, so len iterations always
    * complete — steps past the end are `when`-guarded no-ops. This
    * replaces the former per-step localCheckpoint unroll (one Spark
    * job per step, ~20 jobs per pass; the checkpoint existed only to
    * stop CollapseProject inlining the symbolic pos/piece chain
    * exponentially — runtime iteration sidesteps that entirely) with
    * zero extra jobs, and drops the former maxSteps truncation bound:
    * the walk is exact for ANY word length. An unmatched position
    * (impossible while every corpus char is in the vocab) stops the
    * walk without emitting, exactly like the old
    * `where(piece.isNotNull)` filter. */
  private def segmentPieces(vocab: Seq[String], pieceMax: Int,
                            word: Column): Column = {
    val zero = struct(lit(1).as("pos"),
      array().cast("array<string>").as("ps"), lit(false).as("stop"))
    aggregate(
      sequence(lit(1), length(word)),
      zero,
      (acc, _) => {
        val piece = longestMatchAt(vocab, pieceMax, word, acc.getField("pos"))
        when(acc.getField("stop") || acc.getField("pos") > length(word), acc)
          .otherwise(when(piece.isNull,
            struct(acc.getField("pos").as("pos"),
              acc.getField("ps").as("ps"), lit(true).as("stop")))
            .otherwise(struct(
              (acc.getField("pos") + length(piece)).as("pos"),
              concat(acc.getField("ps"), array(piece)).as("ps"),
              lit(false).as("stop"))))
      },
      acc => acc.getField("ps"))
  }

  /** One greedy segmentation pass of the word table under `vocab`:
    * returns (piece, usage) — usage summed over word frequencies.
    * One explode + one hash aggregation; the walk itself is the
    * [[segmentPieces]] runtime fold, no per-step jobs. */
  private def segmentCounts(wf: DataFrame, vocab: Seq[String],
                            pieceMax: Int): DataFrame =
    wf.select(col("freq"),
        explode(segmentPieces(vocab, pieceMax, col("word"))).as("piece"))
      .groupBy("piece").agg(sum("freq").as("usage"))

  /** Per-word piece count column under `vocab` — the [[segmentPieces]]
    * fold's size, shared by [[encode]] and the fertility card. */
  private[pipeline] def pieceCount(vocab: Seq[String], pieceMax: Int,
                                   word: Column): Column =
    size(segmentPieces(vocab, pieceMax, word)).cast("long")

  /** The distinct word-frequency table every stage counts over. */
  private[pipeline] def wordFreq(docs: DataFrame): DataFrame =
    docs
      .select(explode(split(lower(col("text")), "\\s+")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .materialize(true)

  /** The prune-loop proper: returns the FINAL vocabulary (the
    * bounded model artifact — collected once per round, ≤ seedMulti
    * + |charset| strings). Shared by [[train]] (which reports it
    * with usage + log-probs) and [[encode]] (which applies it). */
  private[graft] def trainVocab(wf: DataFrame, seedMulti: Int,
                                pieceMax: Int, rounds: Int,
                                prunePerRound: Int,
                                maxSteps: Int): Seq[String] = {
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
      val counts = segmentCounts(wf, vocab, pieceMax)
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
    val finalCounts = segmentCounts(wf, vocab, pieceMax)
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
    // per-word piece count under the final vocab: the same greedy
    // walk as [[segmentCounts]], but only the piece COUNT per word is
    // needed — size of the runtime-fold result, no explode at all
    // no `where(word_pieces > 0)` guard: every character of every
    // corpus word is in the vocab (chars are never pruned), so the
    // walk always emits ≥1 piece — and a filter on the computed
    // column would be pushed below the projection, evaluating the
    // fold TWICE per word (measured 1.4x on the bench)
    val perWord = wf.select(col("word"),
      pieceCount(vocab, pieceMax, col("word")).as("word_pieces"))
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
