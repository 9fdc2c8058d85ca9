package graft.pipeline

import graft.Materialize.MatOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable distributed sketches — the fixed-size summaries a 100 TB
  * corpus audit actually ships between stages instead of exact state:
  * HyperLogLog distinct counts (Flajolet et al. 2007) and Count-Min
  * frequency estimates (Cormode & Muthukrishnan 2005). Both are built
  * as tiny aggregation frames keyed by (register | row,bucket), so the
  * shuffle after map-side partial aggregation is bounded by the sketch
  * size — never by the token stream — and sketch union is just another
  * max/sum aggregation over the same keys.
  *
  * Engine-portable determinism: every hash is md5-derived (the repo
  * convention — never a JVM-specific hash), ranks come from pure
  * string/integer algebra on the hex digest (no floating log2 whose
  * libm rounding could differ between engines), and the HLL harmonic
  * sum is computed as an exact BIGINT sum of powers of two before the
  * single double division.
  *
  * Reference anchor: the reference summarizes fileset membership with
  * bloom filters (src/dbnode/persist/fs/bloom — restated as
  * `dedup_bloom`) but has no distinct/frequency sketch; these close
  * that gap for corpus audits (vocabulary size per source, heavy-hitter
  * tokens) where exact counting would shuffle the full key space.
  */
object Sketches {

  /** Number of HLL registers (2^8) — fixed so the oracle SQL and the
    * spec share the constant. */
  val HLL_M = 256

  /** Leading-zero-bit rank of the 52-bit value held in 13 hex chars,
    * plus 1 — via string algebra only: count leading '0' hex chars,
    * then the intra-char zeros of the first nonzero hex digit. */
  private def hexRank(s13: Column): Column = {
    val stripped = regexp_replace(s13, "^0+", "")
    val z = lit(13) - length(stripped)
    val first = substring(stripped, 1, 1)
    val extra = when(first === "1", 3)
      .when(first.isin("2", "3"), 2)
      .when(first.isin("4", "5", "6", "7"), 1)
      .otherwise(0)
    when(z === 13, lit(53)).otherwise(z * 4 + extra + lit(1))
  }

  /** HyperLogLog distinct-word estimate per source, next to the exact
    * count it approximates. Register index = first md5 byte (m=256,
    * p=8); rank = leading-zero count of the next 52 bits + 1; the
    * standard bias-corrected estimator with the linear-counting
    * small-range correction (Flajolet et al. 2007 §4):
    *
    *   E = α_m·m² / Σ_j 2^(−M_j),   E ≤ 2.5m ∧ V>0 → m·ln(m/V)
    *
    * The harmonic sum is computed exactly: Σ 2^(53−M_j) as BIGINT
    * (≤ 256·2^52 < 2^63), divided once — double summation order can
    * differ between engines by an ulp, integer summation cannot.
    *
    * Scale: the registers frame is ≤ m rows per source no matter the
    * corpus size, and `max(rank)` partial-aggregates map-side — the
    * shuffle carries at most sources×m rows. Merging shards or
    * appending a day's data is the same max-by-register aggregation
    * (spec-pinned), which is the whole point of shipping a sketch. */
  /** The register frame (source, idx, mj) — the sketch itself.
    * Merging two sketches (shards, days, sources) is
    * `union.groupBy(source, idx).agg(max(mj))`; spec-pinned equal to
    * rebuilding from the concatenated corpus. */
  private[graft] def hllRegisters(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("source"),
      explode(TextAnalysis.words(col("text"))).as("w"))
    val h = md5(col("w"))
    tok.select(col("source"),
      conv(substring(h, 1, 2), 16, 10).cast("int").as("idx"),
      hexRank(substring(h, 3, 13)).as("rank"))
      .groupBy("source", "idx").agg(max("rank").as("mj"))
  }

  /** Exact per-source distinct-word counts — the sketch's
    * calibration target. */
  private[graft] def hllExact(docs: DataFrame): DataFrame =
    docs.select(col("source"),
      explode(TextAnalysis.words(col("text"))).as("w"))
      .groupBy("source").agg(count_distinct(col("w")).as("exact_distinct"))

  def hllDistinct(docs: DataFrame): DataFrame =
    hllEstimateFrom(hllRegisters(docs), hllExact(docs))

  /** Cross-source vocabulary overlap from SKETCH ALGEBRA — the
    * 100 TB form of corpus_overlap's exact word join: HLL registers
    * are unions under per-register max, so |A∪B| estimates from
    * 256 integers per pair and |A∩B| follows by inclusion-exclusion
    * (est_a + est_b − est_union, clamped at 0 — the estimator can go
    * slightly negative on near-disjoint sources), with the exact
    * intersection alongside as the calibration target. The point is
    * the access pattern: exact pairwise overlap joins the corpora,
    * sketch overlap joins sources×256 register rows — sketches ship,
    * corpora don't.
    *
    * Scale: one register build (map-side max-combine, ≤ sources·m
    * rows shuffled), the pair algebra is on that bounded frame; only
    * the calibration column touches the corpus again (drop `exact`
    * consumers in production and nothing corpus-sized remains). */
  def hllOverlap(docs: DataFrame): DataFrame = {
    val regs = hllRegisters(docs)
    val perSrc = regs.groupBy("source")
      .agg(count(lit(1)).as("used"), sum(sIntTerm).as("s_int"))
    val single = perSrc.select(col("source"),
      hllEst(col("used"), col("s_int"))._2.as("est"))
    val pairs = single.as("l")
      .join(single.as("r"), col("l.source") < col("r.source"))
      .select(col("l.source").as("source_a"),
        col("r.source").as("source_b"),
        col("l.est").as("est_a"), col("r.est").as("est_b"))
    val ids = pairs.select("source_a", "source_b")
    val tagged = ids
      .join(regs.withColumnRenamed("source", "source_a"), "source_a")
      .select(col("source_a"), col("source_b"), col("idx"), col("mj"))
      .unionAll(ids
        .join(regs.withColumnRenamed("source", "source_b"), "source_b")
        .select(col("source_a"), col("source_b"), col("idx"), col("mj")))
    val perPair = tagged
      .groupBy("source_a", "source_b", "idx").agg(max("mj").as("mj"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("used"), sum(sIntTerm).as("s_int"))
    val withU = pairs.join(perPair
      .select(col("source_a"), col("source_b"),
        hllEst(col("used"), col("s_int"))._2.as("est_union")),
      Seq("source_a", "source_b"))
    val vocab = docs.select(col("source"),
      explode(TextAnalysis.words(col("text"))).as("w")).distinct()
    val exactInter = vocab.as("l")
      .join(vocab.as("r"),
        col("l.w") === col("r.w") && col("l.source") < col("r.source"))
      .groupBy(col("l.source").as("source_a"),
        col("r.source").as("source_b"))
      .agg(count(lit(1)).as("exact_inter"))
    val inter = greatest(lit(0.0),
      col("est_a") + col("est_b") - col("est_union"))
    withU.join(exactInter, Seq("source_a", "source_b"), "left")
      .select(col("source_a"), col("source_b"),
        round(col("est_a"), 6).as("est_a"),
        round(col("est_b"), 6).as("est_b"),
        round(col("est_union"), 6).as("est_union"),
        round(inter, 6).as("est_inter"),
        round(inter / col("est_union"), 6).as("jaccard_est"),
        coalesce(col("exact_inter"), lit(0L)).as("exact_inter"))
  }

  /** The estimator over an ALREADY-BUILT register frame — shared by
    * the direct path and [[graft.sources.SketchStore]]'s stored
    * path, so the two cannot drift (same byte-for-byte output). */
  /** The exact-integer harmonic-sum term per register row — summed
    * per sketch into `s_int`. */
  private[graft] def sIntTerm: Column =
    expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - mj AS INT))")

  /** The bias-corrected estimator over (used_registers, s_int) —
    * (raw, corrected) columns; shared by the per-source estimate,
    * the stored-sketch path and the pair-union overlap so the
    * expression (spelled identically in every oracle) cannot drift. */
  private[graft] def hllEst(used: Column, sInt: Column): (Column, Column) = {
    // empty registers hold value 0 and contribute 2^(-0)=1 each to
    // the harmonic sum — i.e. 2^53 in the integer scaling
    val vZero = lit(HLL_M) - used
    val sFull = sInt + vZero * lit(9007199254740992L)
    // the raw-estimate expression is spelled identically in the oracle
    // SQL — same literals, same operator order, bit-identical doubles
    val raw = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) *
      lit(65536.0) * lit(9007199254740992.0) / sFull
    val est = when(raw <= lit(2.5) * lit(256.0) && vZero > 0,
      lit(256.0) * log(lit(256.0) / vZero)).otherwise(raw)
    (raw, est)
  }

  private[graft] def hllEstimateFrom(regs: DataFrame,
                                     exact: DataFrame): DataFrame = {
    val per = regs.groupBy("source")
      .agg(count(lit(1)).as("used_registers"), sum(sIntTerm).as("s_int"))
    val vZero = lit(HLL_M) - col("used_registers")
    val (raw, est) = hllEst(col("used_registers"), col("s_int"))
    per.join(exact, "source")
      .select(col("source"), col("used_registers"),
        vZero.as("v_zero"), round(raw, 6).as("e_raw"),
        round(est, 6).as("estimate"), col("exact_distinct"),
        round((est - col("exact_distinct")) / col("exact_distinct"), 6)
          .as("rel_err"))
      .orderBy("source")
  }

  /** Equi-width histogram quantile sketch over `events.value` — the
    * mergeable form of the percentile aggregations the reference's
    * aggregator ships (P50/P95/P99 timer gauges): 256 fixed-width
    * bins over the observed [lo, hi] range, quantiles read back by
    * uniform interpolation inside the covering bin, next to the exact
    * percentile it approximates. Continuous rank r = p·(n−1)+1, the
    * same definition `percentile`/`quantile_cont` interpolate with,
    * so sketch error is purely binning error.
    *
    * Scale: bin assignment is a map-side expression; the histogram is
    * a ≤256-key hash aggregation (map-side combined — the shuffle
    * carries bins, not values); merging shards is adding histograms.
    * The cumulative window runs over the ≤256-row frame only. The
    * exact column is the calibration target (single-group exact
    * percentile — the same documented approx swap note as
    * q_session_stats applies for unbounded deployments). */
  def quantileSketch(events: DataFrame, bins: Int = 256): DataFrame = {
    val st = events.agg(min("value").as("lo"), max("value").as("hi"),
      count(lit(1)).as("n"),
      percentile(col("value"),
        array(lit(0.5), lit(0.9), lit(0.95), lit(0.99))).as("exact"))
      .materialize(true)
    val width = (col("hi") - col("lo")) / lit(bins.toDouble)
    val binned = events.crossJoin(broadcast(st))
      .select(when(col("hi") === col("lo"), lit(0)).otherwise(
        least(floor((col("value") - col("lo")) / width),
          lit(bins - 1)).cast("int")).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("c"))
    val cumW = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow) // ≤bins rows
    val cum = binned.withColumn("cum", sum("c").over(cumW))
    val ps = st.select(col("lo"), col("hi"), col("n"), col("exact"),
      posexplode(array(lit(0.5), lit(0.9), lit(0.95), lit(0.99)))
        .as(Seq("pi", "p")))
      .select(col("p"), (col("p") * (col("n") - 1) + 1).as("r"),
        col("lo"), col("hi"),
        element_at(col("exact"), col("pi") + 1).as("exact_q"))
    val est = ps.join(cum,
        col("cum") >= col("r") && (col("cum") - col("c")) < col("r"))
      .select(col("p"),
        when(col("hi") === col("lo"), col("lo")).otherwise(
          col("lo") + (col("hi") - col("lo")) / lit(bins.toDouble) *
            (col("bin") + (col("r") - (col("cum") - col("c"))) / col("c")))
          .as("est"),
        col("exact_q"))
    est.select(col("p"), round(col("est"), 6).as("est_q"),
      round(col("exact_q"), 6).as("exact_v"),
      round(col("est") - col("exact_q"), 6).as("err"))
      .orderBy("p")
  }

  /** Fixed-bounds equi-width histogram over a `value` column — the
    * form of [[quantileSketch]]'s binning a STREAM can maintain
    * (bounds must be declared up front on an unbounded input, exactly
    * as production metric pipelines configure them). Batch and
    * streaming share this one code path: on a streaming frame the
    * groupBy becomes a stateful count in complete/update mode, and
    * the streamed cells are spec-pinned equal to the batch histogram
    * of all arrived data. Out-of-range values clamp to the edge bins
    * (visible there, never dropped silently). Merging shards or days
    * is adding cell counts. */
  def histogram(values: DataFrame, lo: Double, hi: Double,
                bins: Int = 256): DataFrame = {
    val width = (hi - lo) / bins
    val bin = least(greatest(
      floor((col("value") - lit(lo)) / lit(width)), lit(0)),
      lit(bins - 1)).cast("int")
    values.select(bin.as("bin")).groupBy("bin")
      .agg(count(lit(1)).as("c"))
  }

  /** Count-Min heavy-hitter estimates: a d=4 × w=256 sketch of the
    * corpus token stream, then the top-`topK` exact tokens probed
    * through it — estimate = min over the d salted rows, which can
    * only OVERcount (collisions add, never subtract; `over_c >= 0` is
    * asserted in the spec and visible per row in the output).
    *
    * Scale: the sketch is a groupBy (salt, bucket) over the
    * salt-replicated token stream — d·w = 1024 distinct keys, so
    * map-side combine collapses each task's contribution to ≤1024
    * rows regardless of stream size; the probe side is a ≤topK-row
    * frame joined against the broadcast sketch. The exact top-k here
    * is the calibration target (TakeOrdered, no full sort); a pure
    * production path would keep only the sketch. */
  def cmsHeavyHitters(docs: DataFrame, topK: Int = 20): DataFrame = {
    // per-word counts FIRST (one shuffle with map-side combine), then
    // every downstream estimator runs per DISTINCT word: the sketch
    // adds each word's count to its (salt, bucket) cells — identical
    // cell totals to hashing every occurrence (sum over words landing
    // in a cell of their counts = count of occurrences landing there)
    // at 4 md5s per distinct word instead of 4 per TOKEN, and the
    // corpus-scale token checkpoint disappears (r13; guide §4/§6 —
    // at 100 TB the word table is millions of rows, the token stream
    // trillions)
    val tf = docs.select(
      explode(TextAnalysis.words(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("exact_c"))
      .materialize(true)
    val salts = explode(sequence(lit(0), lit(3))).as("salt")
    def bucket(w: Column, salt: Column): Column =
      conv(substring(md5(concat(salt.cast("string"), lit(":"), w)), 1, 8),
        16, 10).cast("long") % 256
    val sketch = tf.select(col("w"), col("exact_c"), salts)
      .select(col("salt"), bucket(col("w"), col("salt")).as("bucket"),
        col("exact_c"))
      .groupBy("salt", "bucket").agg(sum("exact_c").as("c"))
    val top = tf
      .orderBy(col("exact_c").desc, col("w").asc).limit(topK)
    val probed = top.select(col("w"), col("exact_c"), salts)
      .select(col("w"), col("exact_c"), col("salt"),
        bucket(col("w"), col("salt")).as("bucket"))
      .join(broadcast(sketch), Seq("salt", "bucket"))
      .groupBy("w", "exact_c").agg(min("c").as("est_c"))
    val rk = Window.orderBy(col("exact_c").desc, col("w").asc) // ≤topK rows
    probed
      .select(col("w").as("word"), col("exact_c"), col("est_c"),
        (col("est_c") - col("exact_c")).as("over_c"),
        row_number().over(rk).cast("long").as("rk"))
      .orderBy("rk")
  }

  /** DDSketch quantile estimates per event type — the RELATIVE-error
    * quantile sketch (Masson, Rim & Lee, VLDB 2019): bucket
    * `i = ⌈log_γ v⌉` with `γ = (1+α)/(1−α)` holds `(γ^(i−1), γ^i]`,
    * so the midpoint estimate `2γ^i/(γ+1)` is within α of ANY value
    * in the bucket — a guarantee uniform across the value range,
    * where [[quantileSketch]]'s equi-width bins give absolute error
    * scaled to (hi−lo). The collapsing form bounds memory: when a
    * key exceeds `maxBuckets` buckets, the LOWEST buckets fold into
    * the floor bucket (the paper's collapse rule — low quantiles
    * degrade first, high quantiles keep the guarantee; `n_collapsed`
    * makes the fold visible per row). Values ≤ 0 go to the zero
    * store (`n_zero`), exactly like the reference sketch.
    *
    * Complements the histogram-bucket family: the reference's timer
    * aggregations quantile over buckets configured up front
    * (src/aggregator quantile gauges — the streaming twins here),
    * while DDSketch needs no bounds declared and merges by adding
    * bucket counts.
    *
    * Cross-engine determinism: the bucket index rounds `ln v / ln γ`
    * to 9 dp before the ceil (the repo's libm-rounding absorber — a
    * flip would need the two engines' `ln` to disagree by > 1e-9
    * relative), and `ln γ` itself is computed once here and embedded
    * verbatim in the oracle SQL so both engines divide by the same
    * double.
    *
    * Scale: bucket assignment is a map-side expression; the sketch is
    * a (type, bucket) hash aggregation — map-side combined, the
    * shuffle carries ≤ maxBuckets keys per type, and merging shards
    * IS the aggregation's associativity. Collapse, the cumulative
    * walk and the rank pick all run on bucket-cardinality frames.
    * The exact column is the calibration target (per-type rank
    * window — the documented approx swap for unbounded deployments,
    * as in [[quantileSketch]]). */
  /** The DDSketch's maintained state: (event_type, bucket, count)
    * cells with non-positive values in the NULL bucket (the zero
    * store). Streaming-safe BY CONSTRUCTION — on an unbounded input
    * the same groupBy runs as a stateful count in complete/update
    * mode, maintaining exactly these cells with no bounds declared
    * up front (the advantage over [[histogram]]'s fixed-bounds
    * cells); [[ddSketch]]'s collapse + read-back then run batch-side
    * on the tiny maintained table. Cell parity between the streamed
    * and batch forms is spec-pinned. */
  def ddBuckets(events: DataFrame, alpha: Double = 0.01): DataFrame = {
    val lnG = math.log((1 + alpha) / (1 - alpha))
    events
      .select(col("event_type"),
        when(col("value") > 0,
          ceil(round(log(col("value")) / lit(lnG), 9)).cast("long"))
          .as("i"))
      .groupBy("event_type", "i").agg(count(lit(1)).as("c"))
  }

  def ddSketch(events: DataFrame, alpha: Double = 0.01,
               maxBuckets: Int = 256): DataFrame =
    // ONE events scan builds the sketch ([[ddBuckets]]); the result
    // is bucket-cardinality, so it checkpoints for the collapse /
    // stats / cumulative branches of the read-back
    ddReadback(ddBuckets(events, alpha).materialize(true),
      events, alpha, maxBuckets)

  /** Quantile read-back from an already-built bucket frame — the
    * piece [[graft.sources.SketchStore]]'s persisted cells share
    * with the direct path, so stored and direct answers are
    * byte-identical. `events` supplies only the exact-rank
    * calibration column. */
  private[graft] def ddReadback(binned: DataFrame, events: DataFrame,
                                alpha: Double, maxBuckets: Int): DataFrame = {
    val gamma = (1 + alpha) / (1 - alpha)
    val ps = Seq(0.5, 0.9, 0.95, 0.99)
    val pos = events.select(col("event_type"), col("value"))
      .where(col("value") > 0)
    val counts = binned.where(col("i").isNotNull)
    val zeros = binned.where(col("i").isNull)
      .select(col("event_type"), col("c").as("n_zero"))
    val raw = counts.groupBy("event_type")
      .agg(max("i").as("_max_i"), count(lit(1)).as("_nb_raw"))
    val collapsed = counts.join(raw, "event_type")
      .select(col("event_type"),
        greatest(col("i"), col("_max_i") - lit(maxBuckets - 1)).as("i"),
        col("c"))
      .groupBy("event_type", "i").agg(sum("c").as("c"))
    val st = collapsed.groupBy("event_type")
      .agg(count(lit(1)).as("n_buckets"), sum("c").as("n"))
      .join(raw, "event_type")
      .select(col("event_type"), col("n_buckets"), col("n"),
        (col("_nb_raw") - col("n_buckets")).as("n_collapsed"))
    val cumW = Window.partitionBy("event_type").orderBy("i")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow) // ≤maxBuckets rows
    val cum = collapsed.withColumn("cum", sum("c").over(cumW))
    val tgt = st.join(zeros, Seq("event_type"), "left")
      .withColumn("n_zero", coalesce(col("n_zero"), lit(0L)))
      .select(col("event_type"), col("n"), col("n_buckets"),
        col("n_collapsed"), col("n_zero"),
        explode(array(ps.map(lit): _*)).as("p"))
      .withColumn("r", floor(col("p") * (col("n") - 1)).cast("long"))
    val est = lit(2d) * pow(lit(gamma), col("i")) / lit(gamma + 1)
    val rankW = Window.partitionBy("event_type").orderBy("value")
    val exact = pos
      .withColumn("rk", row_number().over(rankW).cast("long"))
      .select(col("event_type").as("_etype"), col("value"), col("rk"))
    tgt.join(cum, Seq("event_type"))
      .where(col("cum") > col("r") && col("cum") - col("c") <= col("r"))
      .join(exact, col("event_type") === col("_etype") &&
        col("rk") === col("r") + 1)
      .select(col("event_type"), col("p"), col("n"), col("n_buckets"),
        col("n_collapsed"), col("n_zero"),
        round(est, 6).as("est_q"),
        round(col("value"), 6).as("exact_v"),
        round(abs(est - col("value")) / col("value"), 6).as("rel_err"))
      .orderBy("event_type", "p")
  }

  /** The exact `ln γ` / `γ` literals [[ddSketch]] evaluates with,
    * rendered for the oracle SQL (shortest round-trip repr — DuckDB
    * parses back the identical double). */
  def ddConstants(alpha: Double = 0.01): (String, String) = {
    val gamma = (1 + alpha) / (1 - alpha)
    (gamma.toString, math.log(gamma).toString)
  }
}
