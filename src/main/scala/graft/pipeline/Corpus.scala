package graft.pipeline

import graft.Materialize.MatOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-management operators for training-data pipelines: dup
  * clustering, deterministic splits, length bucketing, benchmark
  * decontamination. All compose with the Dedup/TextAnalysis family
  * over the `documents` table.
  */
object Corpus {

  /** Frees the block-manager storage behind a `localCheckpoint`ed
    * frame (the checkpoint plan is a [[org.apache.spark.sql.execution.LogicalRDD]]
    * wrapping the persisted rows). Safe only once nothing will read
    * the frame again — the RDD is unrecoverable after this. */
  private[graft] def freeCheckpoint(df: DataFrame): Unit =
    graft.Materialize.free(df)

  /** Connected components over an undirected dup-pair list
    * (doc_a, doc_b) — groups transitive near-duplicates into
    * clusters so one canonical doc per cluster survives.
    *
    * Pregel-style min-label propagation on DataFrames: every doc
    * starts labeled with its own id; each round joins the symmetric
    * edge list, takes the min neighbor label, then POINTER-JUMPS
    * (follows the candidate label one hop, label(label(x))) so label
    * chains halve every round — rounds needed ≈ log(diameter), not
    * diameter (dup clusters are near-cliques from LSH blocking →
    * 2-3 rounds in practice); `maxIter` bounds the worst case. Each
    * round is two joins on doc id — no driver-side graph state.
    */
  def dupClusters(docs: DataFrame, pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // the iterative propagation is the most expensive stage in the
    // corpus family and three operators consume its labels (clusters,
    // canonical pick, manifest) — run it once per (docs, pairs)
    // LINEAGE and share the persisted result. Keyed on canonicalized
    // plans (not plan hashes) for the same collision-safety as the
    // shingle cache; a throw inside the loop caches nothing. On a
    // cluster this frame is the written intermediate every downstream
    // curation stage reads — persisted DISK_ONLY accordingly (same
    // residency discipline as Dedup.shingleHashes: a corpus-sized
    // frame must not pin unified storage memory for the session).
    val ids = docs.select("doc_id")
    val key = (ids.sparkSession,
      ids.queryExecution.analyzed.canonicalized,
      pairs.queryExecution.analyzed.canonicalized)
    graft.Memo.once(clusterCache, key)(
      computeDupClusters(ids, pairs, maxIter)
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY))
  }

  private val clusterCache = scala.collection.concurrent.TrieMap.empty[
    (org.apache.spark.sql.SparkSession,
     org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
     org.apache.spark.sql.catalyst.plans.logical.LogicalPlan), DataFrame]

  /** Unpersist and forget every cached cluster-label frame — same
    * lifecycle contract as [[Dedup.clearShingleCache]] (Verify/Bench
    * call both at shutdown). */
  def clearClusterCache(): Unit = {
    clusterCache.values.foreach(_.unpersist(blocking = false))
    clusterCache.clear()
  }

  private def computeDupClusters(docs: DataFrame, pairs: DataFrame,
                                 maxIter: Int): DataFrame = {
    // materialize the (possibly expensive — e.g. minhash-derived)
    // pair lineage ONCE; every iteration's actions reuse the
    // checkpointed edges instead of re-running the upstream pipeline
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()
      .materialize(true)
    // only docs that appear in some pair participate in propagation —
    // the iteration cost scales with the dup GRAPH, not the corpus;
    // the (vast) singleton majority joins back once at the end
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("cluster_id", col("doc_id"))
      .materialize(true)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("doc_id", "dst"), "dst")
        .groupBy(col("src").as("doc_id"))
        .agg(min("cluster_id").as("nbr_min"))
      // one materialization per round carries both the new label and
      // the convergence flag — the changed-count is a cheap scan of
      // the checkpoint, not a recomputation
      val stepped = labels.join(neighborMin, Seq("doc_id"), "left")
        .select(col("doc_id"), col("cluster_id").as("_old"),
          least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id")))
            .as("_cand"))
      // pointer jump: candidate labels are themselves graph-node ids
      // (mins of existing labels), so chasing one hop is a self-join;
      // labels stay monotone-decreasing toward the same component-min
      // fixpoint, just geometrically faster
      val next = stepped.join(
          labels.select(col("doc_id").as("_cand"),
            col("cluster_id").as("_cand_lbl")),
          Seq("_cand"), "left")
        .select(col("doc_id"),
          least(col("_cand"), coalesce(col("_cand_lbl"), col("_cand")))
            .as("cluster_id"),
          (least(col("_cand"), coalesce(col("_cand_lbl"), col("_cand"))) <
            col("_old")).cast("int").as("_changed"))
        .materialize(true)
      converged = next.where(col("_changed") === 1).limit(1).count() == 0
      // `next` is materialized — the previous round's checkpoint
      // blocks are dead weight from here on; free them instead of
      // pinning maxIter tables of storage for the session lifetime
      freeCheckpoint(labels)
      labels = next.drop("_changed")
      i += 1
    }
    freeCheckpoint(edges)
    // a dup chain longer than maxIter rounds would return labels that
    // are not the transitive closure — surface it instead of silently
    // diverging from the recursive-CTE oracle
    if (!converged)
      throw new IllegalStateException(
        s"dupClusters did not converge in $maxIter rounds — " +
          "raise maxIter (rounds needed ≈ longest dup-chain diameter)")
    // plain equi-join on doc_id: labels has one row per doc in any
    // dup pair — at a realistic dup fraction that is O(corpus), far
    // beyond broadcast size, so let AQE pick the strategy (sort-merge
    // at scale, broadcast only when the dup graph is genuinely tiny)
    docs.select("doc_id")
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .withColumn("is_canonical", (col("doc_id") === col("cluster_id")).cast("int"))
  }

  /** End-to-end training-set manifest — the whole curation pipeline
    * composed into one keep/split decision per document: Gopher
    * quality gate ∧ exact-dedup survivor ∧ near-dup cluster
    * canonical, plus the deterministic split assignment. Each stage
    * is the already-verified operator; the joins are all on doc_id
    * (one shuffle key end to end). */
  def manifest(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val g = TextAnalysis.gopherQuality(docs)
      .select(col("doc_id"), col("gopher_pass"))
    val e = Dedup.exact(docs).select(col("doc_id"), col("dup_rank"))
    val c = dupClusters(docs.select("doc_id"), pairs)
      .select(col("doc_id"), col("is_canonical"))
    val sp = split(docs).select(col("doc_id"), col("split"))
    g.join(e, "doc_id").join(c, "doc_id").join(sp, "doc_id")
      .withColumn("keep",
        (col("gopher_pass") === 1 && col("dup_rank") === 1 &&
          col("is_canonical") === 1).cast("int"))
  }

  /** Per-source corpus audit — the "dataset card" aggregation every
    * curation pipeline publishes: for each ingest source, document
    * count, exact-duplicate count, mean quality score and
    * detected-English count. Composes the verified per-doc operators
    * (quality, exact dedup, language-ID), joined on doc_id — one
    * shuffle key through the composition, then a final tiny
    * aggregation keyed by source. */
  def sourceReport(docs: DataFrame): DataFrame = {
    val q = TextAnalysis.quality(docs).select(col("doc_id"), col("quality_score"))
    val e = Dedup.exact(docs).select(col("doc_id"), col("dup_rank"))
    val l = TextAnalysis.languageId(docs).select(col("doc_id"), col("pred_lang"))
    docs.select("doc_id", "source")
      .join(q, "doc_id").join(e, "doc_id").join(l, "doc_id")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum((col("dup_rank") > 1).cast("long")).as("dup_docs"),
        round(avg("quality_score"), 6).as("mean_quality"),
        sum((col("pred_lang") === "en").cast("long")).as("en_docs"))
  }

  /** Per-source distribution shift: unigram KL(source ‖ corpus) —
    * the data-mixing diagnostic that ranks how far each ingest feed
    * sits from the blended distribution (a complement to DSIR's
    * per-doc importance weights: DSIR reweights docs toward a
    * target, this scores whole feeds for mixture design). Every
    * source word occurs in the corpus distribution by construction,
    * so the divergence is finite without smoothing.
    *
    * Scale: one explode feeding a (source, word) hash aggregation —
    * map-side combined, so token occurrences never cross a shuffle
    * un-aggregated; the corpus marginal re-aggregates the SAME
    * distinct-key frame (vocab-sized, not corpus-sized); the join is
    * an equi-join on word carrying ≤ |vocab|·|sources| rows. */
  def sourceKl(docs: DataFrame): DataFrame = {
    val sw = docs.select(col("source"),
      explode(org.apache.spark.sql.functions.split(lower(col("text")), "\\s+"))
        .as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c_sw"))
    val cw = sw.groupBy("w").agg(sum("c_sw").as("c_w"))
    val totals = sw.groupBy("source").agg(sum("c_sw").as("n_s"))
    val nTotal = cw.agg(sum("c_w").as("n_total"))
    sw.join(cw, "w")
      .join(broadcast(totals), "source")
      .crossJoin(broadcast(nTotal))
      .groupBy("source")
      .agg(
        max("n_s").as("n_words"),
        count(lit(1)).as("vocab"),
        round(sum(
          (col("c_sw") / col("n_s")) *
            log((col("c_sw") / col("n_s")) / (col("c_w") / col("n_total")))),
          6).as("kl"))
  }

  /** Cross-source overlap matrix — the provenance artifact of a
    * dataset card: for every source pair, how much shingle content
    * they share (distinct-shingle intersection + Jaccard). High
    * off-diagonal cells mean two ingest feeds crawl the same
    * upstream — the signal that drives source-level dedup ordering
    * and mixture-weight corrections.
    *
    * Scale: the per-source distinct shingle set reuses the shared
    * hashed-shingle stage; the intersection is an equi-join on the
    * shingle hash (a shingle contributes at most |sources|² pair
    * rows, so the join is bounded by sources² per key — sources
    * number hundreds, not millions); totals broadcast back onto the
    * (≤ sources²)-row matrix. */
  def sourceOverlap(docs: DataFrame, n: Int = 3): DataFrame = {
    // totals + BOTH sides of the intersection self-join read the
    // distinct frame: materialize it once — DISK_ONLY, because the
    // distinct (source, h) set is corpus-scale and must not squat on
    // unified execution memory for the rest of the session (repo
    // policy since the r8 dedup_winnow incident; ADVICE r12)
    val sh = Dedup.shingleHashes(docs, n)
      .join(docs.select("doc_id", "source"), "doc_id")
      .select("source", "h").distinct()
      .materializeDisk(true)
    val totals = sh.groupBy("source").agg(count(lit(1)).as("total"))
    // intersection counts WITHOUT the h-keyed self-join (r13): one
    // aggregation collects each shingle's (bounded, ≤|sources|)
    // source set, ordered pairs explode from the sorted set map-side
    // — identical pair multiplicities to the join's (h, a<b) rows at
    // ONE exchange of the distinct frame instead of two plus a join
    // probe (guide §2.1/§3.4)
    val bySrc = sh.groupBy("h")
      .agg(sort_array(collect_set(col("source"))).as("_ss"))
    val shared = bySrc
      .select(explode(flatten(transform(col("_ss"), (a, i) =>
        transform(slice(col("_ss"), i + 2, size(col("_ss"))),
          b => struct(a.as("src_a"), b.as("src_b")))))).as("_p"))
      .select(col("_p.src_a"), col("_p.src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("shared"))
    shared
      .join(broadcast(totals.toDF("src_a", "total_a")), "src_a")
      .join(broadcast(totals.toDF("src_b", "total_b")), "src_b")
      .select(col("src_a"), col("src_b"), col("shared"),
        round(col("shared").cast("double") /
          (col("total_a") + col("total_b") - col("shared")).cast("double"), 6)
          .as("jaccard_v"))
  }

  /** Deterministic train/val/test split by content-independent hash
    * of the doc id — stable across runs and engines (md5 of the id's
    * decimal rendering), weights in percent. */
  def split(docs: DataFrame, valPct: Int = 10, testPct: Int = 10): DataFrame = {
    val h = pmod(Dedup.md5Int(col("doc_id").cast("string")), lit(100L))
    docs.select(col("doc_id"), h.as("bucket100"))
      .withColumn("split",
        when(col("bucket100") < testPct, "test")
          .when(col("bucket100") < testPct + valPct, "val")
          .otherwise("train"))
  }

  /** Length bucketing for batch packing: docs binned into
    * ~equal-population buckets by token count. Bucket boundaries are
    * the exact (interpolated) token-count percentiles — one
    * distributed aggregation — and the assignment is a broadcast of
    * the (nBuckets−1)-element boundary array; no global sort, no
    * single-partition window (a plain ntile would funnel the corpus
    * through one task). Ties land in the lower bucket. */
  def lengthBuckets(docs: DataFrame, nBuckets: Int = 10): DataFrame = {
    val toks = docs.select(col("doc_id"),
      size(org.apache.spark.sql.functions.split(lower(col("text")), "\\s+"))
        .cast("long").as("n_tokens"))
    val qs = (1 until nBuckets).map(i => i.toDouble / nBuckets)
    val bounds = toks.agg(
      percentile(col("n_tokens"), typedlit(qs)).as("bs"))
    toks.crossJoin(broadcast(bounds))
      .select(col("doc_id"), col("n_tokens"),
        (size(filter(col("bs"), b => col("n_tokens") > b)) + 1)
          .cast("long").as("length_bucket"))
  }

  /** Source-mixture sampling under a token budget — the data-mixing
    * step of training-set assembly: each ingest source gets a target
    * share (permille of `budgetTokens`), its acceptance fraction is
    * target / its actual token mass (clamped at keep-everything),
    * and docs are kept by a content-independent hash draw so the
    * sample is deterministic, reproducible and engine-portable.
    *
    * The accept test is INTEGER-EXACT: keep doc iff
    * `bucket_ppm · src_tokens · 1000 < permille · budget · 10⁶`
    * (both sides ≤ ~10¹⁶ — no float threshold, so two engines can
    * never disagree on a boundary row).
    *
    * Scale: token counting is a map stage; per-source totals are a
    * tiny aggregate broadcast back onto the corpus; the draw is a
    * per-row hash — one small shuffle total, no sort, no sampling
    * state on the driver. */
  def mixtureSample(docs: DataFrame, weightsPermille: Map[String, Int],
                    defaultPermille: Int, budgetTokens: Long): DataFrame = {
    val toks = docs.select(col("doc_id"), col("source"),
      size(org.apache.spark.sql.functions.split(lower(col("text")), "\\s+"))
        .cast("long").as("n_tokens"))
    val totals = toks.groupBy("source").agg(sum("n_tokens").as("src_tokens"))
    toks.join(broadcast(totals), "source")
      .withColumn("permille",
        coalesce(element_at(typedlit(weightsPermille), col("source")),
          lit(defaultPermille)).cast("long"))
      .withColumn("bucket_ppm",
        pmod(Dedup.md5Int(col("doc_id").cast("string")), lit(1000000L)))
      .withColumn("sampled",
        (col("bucket_ppm") * col("src_tokens") * lit(1000L) <
          col("permille") * lit(budgetTokens) * lit(1000000L)).cast("int"))
      .select("doc_id", "source", "n_tokens", "bucket_ppm", "sampled")
  }

  /** Deterministic weighted reservoir sample — Efraimidis & Spirakis
    * (2006) algorithm A-ES, the distributed form of "sample n docs
    * per source with probability ∝ weight without replacement": each
    * doc draws a hash-uniform u ∈ (0,1] and keys on ln(u)/w (the
    * log-domain form of u^(1/w), monotone-equivalent and stable for
    * tiny weights); the per-source top-n by key IS the weighted
    * sample. Weight here is `n_chars` — longer docs proportionally
    * likelier, the byte-budget convention. u derives from md5 of the
    * doc id, so the draw is reproducible across engines and runs
    * (same convention as [[mixtureSample]]'s permille draw).
    *
    * Determinism: keys round to 6 decimals before ranking (ln differs
    * in the last ulp across libm implementations), doc_id breaks
    * ties.
    *
    * Scale: a per-row hash + two bounded rank phases — docs first
    * take a LOCAL top-n within (source, md5-shard), so no window ever
    * sorts a whole source; the global rank re-ranks only the
    * sources × shards × n survivors. This is exactly how a
    * 1000-executor reservoir runs: per-partition heaps, then a
    * driver-sized merge. */
  /** The A-ES draw key as a bare column — shared by the batch
    * sampler and [[graft.streaming.StreamReservoir]] so the two
    * paths can never drift. */
  def resKeyCol: Column = {
    val u = (Dedup.md5Int(col("doc_id").cast("string")) + lit(1L)) /
      lit(4294967296.0)
    round(log(u) / col("n_chars"), 6)
  }

  def reservoirSample(docs: DataFrame, n: Int = 10,
                      shards: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(col("source"), col("doc_id"), col("n_chars"),
      resKeyCol.as("res_key"),
      pmod(Dedup.md5Int(concat(lit("shard:"), col("doc_id").cast("string"))),
        lit(shards.toLong)).as("_shard"))
    val wLocal = Window.partitionBy("source", "_shard")
      .orderBy(col("res_key").desc, col("doc_id").asc)
    val locals = base.withColumn("_lrk", row_number().over(wLocal))
      .where(col("_lrk") <= n)
    val wGlobal = Window.partitionBy("source")
      .orderBy(col("res_key").desc, col("doc_id").asc)
    locals.withColumn("rk", row_number().over(wGlobal).cast("long"))
      .where(col("rk") <= n)
      .select("source", "doc_id", "n_chars", "res_key", "rk")
  }

  /** Shard-balance card — the operational skew audit for every
    * md5-sharded path in this library (the rank shards, the
    * SpaceSaving tables, the training-shuffle shards): per shard,
    * doc and token counts plus the fractional deviation from a
    * perfectly even spread. A healthy hash shows |dev| ≲ a few
    * percent; a hot shard here is the early warning before a
    * straggler task is (the AQE skew-join threshold catches joins,
    * but stateful/window paths only rebalance if YOU see this).
    *
    * Scale: one map stage into a shards-sized hash aggregation;
    * totals are a one-row broadcast. */
  def shardBalance(docs: DataFrame, shards: Int = 32): DataFrame = {
    val per = docs.select(
      pmod(Dedup.md5Int(col("doc_id").cast("string")),
        lit(shards.toLong)).as("shard"),
      size(org.apache.spark.sql.functions.split(lower(col("text")), "\\s+"))
        .cast("long").as("toks"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("n_tokens"))
    val tot = per.agg(sum("n_docs").as("t_docs"), sum("n_tokens").as("t_toks"))
    per.crossJoin(broadcast(tot))
      .select(col("shard"), col("n_docs"), col("n_tokens"),
        round(col("n_docs") * lit(shards.toLong) /
          col("t_docs").cast("double") - 1.0, 6).as("doc_dev"),
        round(col("n_tokens") * lit(shards.toLong) /
          col("t_toks").cast("double") - 1.0, 6).as("token_dev"))
  }

  /** Temperature-scaled mixture design — the step BEFORE
    * [[mixtureSample]]: given only the corpus, derive the per-source
    * sampling weights. Natural sampling (share ∝ tokens) lets one
    * giant crawl drown curated sources; temperature α < 1 flattens
    * the distribution (share ∝ tokensᵅ — the multilingual/mixture
    * convention of the T5/PaLM lineage). α is fixed at ½ so the
    * power is `sqrt`, which is correctly rounded in IEEE-754 —
    * both engines compute bit-identical shares (a general `pow`
    * may differ in the last ulp across math libraries). `epochs` =
    * temp_share · total ⁄ tokens is how many passes over each
    * source one budget-filling epoch of the mixture implies — the
    * standard over-sampling diagnostic (epochs ≫ 1 on a small
    * source warns of memorization).
    *
    * Scale: token counting is a map stage into a sources-sized hash
    * aggregate; the two normalizers come back as a one-row broadcast
    * (no driver collect, no window over an unpartitioned frame). */
  def temperatureMixture(docs: DataFrame): DataFrame = {
    val perSrc = docs
      .select(col("source"),
        size(org.apache.spark.sql.functions.split(lower(col("text")), "\\s+"))
          .cast("long").as("tok"))
      .groupBy("source").agg(sum("tok").as("tokens"))
    val norms = perSrc.agg(
      sum("tokens").as("total"),
      sum(sqrt(col("tokens").cast("double"))).as("psum"))
    perSrc.crossJoin(broadcast(norms))
      .select(col("source"), col("tokens"),
        round(col("tokens") / col("total"), 6).as("natural_share"),
        round(sqrt(col("tokens").cast("double")) / col("psum"), 6)
          .as("temp_share"),
        round(sqrt(col("tokens").cast("double")) / col("psum") *
          col("total") / col("tokens"), 6).as("epochs"))
  }

  /** Data-constrained scaling card (Muennighoff et al. 2023,
    * "Scaling Data-Constrained Language Models"): when a token
    * budget exceeds the corpus, sources get REPEATED, and repeated
    * tokens decay in value — the paper's fit gives effective data
    * `D' = U·(1 + R*·(1 − e^(−R_D/R*)))` with `R_D = epochs − 1`
    * repetitions and decay constant `R* = 15.39`. The card allocates
    * a `budgetMult`× corpus budget by the τ=0.5 temperature share
    * (the [[temperatureMixture]] rule — small sources upsample, so
    * they hit MORE epochs and decay first) and reports per source:
    * available tokens, allocated tokens, epochs, effective tokens
    * under the decay, and the effective fraction — the number that
    * says whether upsampling a small source is still buying anything
    * or just re-reading it.
    *
    * Cross-engine determinism: allocations floor to whole tokens, so
    * epochs and the decay chain evaluate from exact integers in both
    * engines; only the sqrt-share normalizer carries a float sum
    * (through a floor, where a flip needs ~1e-10 proximity to an
    * integer).
    *
    * Scale: a per-source aggregation + two one-row broadcasts —
    * sources-sized everywhere after the token-count scan. */
  def dataConstrainedEpochs(docs: DataFrame, budgetMult: Double = 4.0,
                            rStar: Double = 15.39): DataFrame = {
    val perSrc = docs
      .select(col("source"), TextAnalysis.bpeTokensCol(col("text")).as("tok"))
      .groupBy("source").agg(sum("tok").as("unique_tokens"))
    val norms = perSrc.agg(sum("unique_tokens").as("total"),
      sum(sqrt(col("unique_tokens").cast("double"))).as("psum"))
    val alloc = perSrc.crossJoin(broadcast(norms))
      .withColumn("alloc_tokens",
        floor(sqrt(col("unique_tokens").cast("double")) / col("psum") *
          col("total") * lit(budgetMult)).cast("long"))
      .withColumn("epochs",
        col("alloc_tokens").cast("double") / col("unique_tokens"))
    val eff = when(col("epochs") <= 1d, col("alloc_tokens").cast("double"))
      .otherwise(col("unique_tokens") * (lit(1d) + lit(rStar) *
        (lit(1d) - exp((lit(1d) - col("epochs")) / lit(rStar)))))
    alloc.select(col("source"), col("unique_tokens"), col("alloc_tokens"),
      round(col("epochs"), 6).as("epochs"),
      round(eff, 6).as("eff_tokens"),
      round(eff / col("alloc_tokens"), 6).as("eff_frac"))
      .orderBy("source")
  }

  /** DoReMi-style domain reweighting (Xie et al. 2023, "DoReMi:
    * Optimizing Data Mixtures Speeds Up Language Model Pretraining")
    * restated with the engine's own LMs: DoReMi weights domains by
    * EXCESS LOSS — how much better a stronger proxy model does than
    * the reference on each domain (high excess = learnable headroom,
    * upweight). Reference = the corpus unigram LM, proxy = the
    * bigram LM (strictly better-informed, same training corpus), so
    * per-doc excess = unigram − bigram cross-entropy, both already
    * per-doc-rounded by their operators — the two engines aggregate
    * IDENTICAL inputs. One multiplicative-weights round: domain
    * weight ∝ token_share · exp(mean excess), normalized, then
    * smoothed with uniform mass exactly as the paper's final step
    * ((1−s)·w + s/k).
    *
    * Scale: the two LM scorings are the existing
    * aggregate-join-aggregate shapes; everything after is a
    * sources-sized aggregation with two one-row broadcasts. */
  def doremiWeights(docs: DataFrame, smoothing: Double = 0.2): DataFrame = {
    // Sharing ONE CHECKPOINTED tokenized frame across both LM
    // scorings was tried in r13 and REGRESSED 1.7× (3.2 s → 5.6 s at
    // sf0.1): serializing the word-array corpus through the
    // materialization costs far more than the codegen'd re-splits it
    // saves, at this scale and at 100 TB alike. The three independent
    // corpus passes stay (each is one scan + a map-side tf collapse).
    val uni = TextAnalysis.unigramCrossEntropy(docs)
      .select(col("doc_id"), col("n_words"), col("cross_entropy").as("xu"))
    val bi = TextAnalysis.bigramCrossEntropy(docs)
      .select(col("doc_id"), col("cross_entropy").as("xb"))
    val agg = docs.select("doc_id", "source")
      .join(uni, "doc_id").join(bi, "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_words").as("tokens"),
        avg(col("xu") - col("xb")).as("mean_excess"))
    val tot = agg.agg(sum("tokens").as("t"))
    val z = agg.crossJoin(broadcast(tot))
      .withColumn("z",
        col("tokens").cast("double") / col("t") * exp(col("mean_excess")))
    val zn = z.agg(sum("z").as("sz"), count(lit(1)).as("k"))
    z.crossJoin(broadcast(zn))
      .select(col("source"), col("n_docs"), col("tokens"),
        round(col("mean_excess"), 6).as("mean_excess"),
        round(col("z") / col("sz"), 6).as("doremi_weight"),
        round(col("z") / col("sz") * (1 - smoothing) +
          lit(smoothing) / col("k"), 6).as("smoothed_weight"))
  }

  /** Tokenizer fertility card — tokens-per-word by language for BOTH
    * trained tokenizers (BPE merges vs the unigram-LM prune loop):
    * THE standard tokenizer-evaluation artifact (fertility; parity
    * across languages is what multilingual tokenizer papers tune),
    * and the direct comparison of the two training algorithms this
    * engine ships. High fertility on a language = its text shatters
    * into more pieces = more compute per word and worse effective
    * context — the signal that sends a language's data share up or a
    * vocabulary budget rises.
    *
    * Scale: both encoders already do their work on bounded
    * vocabularies (merges collect R rows, the unigram vocab ≤ seed +
    * charset); this card joins their per-doc outputs (doc-sized,
    * id-keyed) and reduces per language. */
  def tokenizerFertility(docs: DataFrame): DataFrame = {
    // ONE checkpointed word-frequency frame feeds BOTH trainers and
    // both per-word cost columns, and ONE doc-side explode attaches
    // them — the earlier form ran bpeEncode + Unigram.encode end to
    // end (two corpus explodes, two per-doc aggregations, two
    // doc-keyed joins) just to re-aggregate per language
    val wf = Unigram.wordFreq(docs)
    val merges = TextAnalysis
      .bpeMerges(wf.select(col("word").as("w"), col("freq")), rounds = 8)
      .sortBy(_._1).map(t => (t._2, t._3))
    val chars = transform(sequence(lit(1), length(col("word"))),
      i => col("word").substr(i, lit(1)))
    val repr0 = concat(lit(" "), concat_ws("  ", chars), lit(" "))
    val reprN = merges.foldLeft(repr0) { case (c, (a, b)) =>
      org.apache.spark.sql.functions.replace(
        c, lit(s" $a  $b "), lit(s" $a$b "))
    }
    val vocab = Unigram.trainVocab(wf, seedMulti = 16, pieceMax = 4,
      rounds = 3, prunePerRound = 3, maxSteps = 24)
    val perWord = wf.select(col("word"),
      size(org.apache.spark.sql.functions.split(trim(reprN), "  "))
        .cast("long").as("bpe_pieces"),
      Unigram.pieceCount(vocab, 4, col("word")).as("uni_pieces"))
    docs
      .select(col("doc_id"), col("lang"),
        explode(org.apache.spark.sql.functions.split(
          lower(col("text")), "\\s+")).as("word"))
      .where(length(col("word")) > 0)
      // NO broadcast hint: perWord is the corpus's distinct-word
      // vocabulary — tens of millions of heavy-tailed strings at
      // 100 TB, over the 8 GB broadcast hard cap. Let AQE pick the
      // strategy from runtime stats (it still broadcasts at bench
      // scale, where the vocab is tiny); word is an equi-key either
      // way (VERDICT r12 item 3).
      .join(perWord, Seq("word"))
      .groupBy("lang")
      .agg(count_distinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("words"),
        sum("bpe_pieces").as("bpe_tokens"),
        sum("uni_pieces").as("unigram_tokens"))
      .select(col("lang"), col("n_docs"), col("words"),
        col("bpe_tokens"), col("unigram_tokens"),
        round(col("bpe_tokens").cast("double") / col("words"), 6)
          .as("bpe_fertility"),
        round(col("unigram_tokens").cast("double") / col("words"), 6)
          .as("unigram_fertility"))
  }

  /** Curation filter funnel — the dataset-card artifact that answers
    * "where did the tokens go": docs and tokens surviving each
    * cumulative stage of the standard cleaning order (C4 battery →
    * Gopher shape filters → exact dedup), with fractions against the
    * raw corpus. The stage ORDER matters operationally (dedup after
    * quality filtering dedups a smaller corpus) and the funnel makes
    * the cost of each choice visible.
    *
    * Scale: three doc-sized flag frames (each a single map/window
    * stage) equi-join on doc_id, then ONE global aggregation to a
    * single row that unpivots to four stage rows — the whole funnel
    * adds one one-row shuffle over the flags it composes. */
  def filterFunnel(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"),
      size(org.apache.spark.sql.functions.split(lower(col("text")), "\\s+"))
        .cast("long").as("tok"))
    val c4 = TextAnalysis.c4Filters(docs).select(col("doc_id"), col("c4_pass"))
    val gp = TextAnalysis.gopherQuality(docs)
      .select(col("doc_id"), col("gopher_pass"))
    val dd = Dedup.exact(docs).select(col("doc_id"), col("is_dup"))
    val f = tok.join(c4, "doc_id").join(gp, "doc_id").join(dd, "doc_id")
    val s1 = col("c4_pass") === 1
    val s2 = s1 && col("gopher_pass") === 1
    val s3 = s2 && col("is_dup") === 0
    f.agg(
        count(lit(1)).as("d0"), sum("tok").as("t0"),
        sum(when(s1, 1L).otherwise(0L)).as("d1"),
        sum(when(s1, col("tok")).otherwise(0L)).as("t1"),
        sum(when(s2, 1L).otherwise(0L)).as("d2"),
        sum(when(s2, col("tok")).otherwise(0L)).as("t2"),
        sum(when(s3, 1L).otherwise(0L)).as("d3"),
        sum(when(s3, col("tok")).otherwise(0L)).as("t3"))
      .selectExpr(
        "stack(4, 0, 'all', d0, t0, 1, 'c4', d1, t1," +
          " 2, 'c4_gopher', d2, t2, 3, 'c4_gopher_dedup', d3, t3)" +
          " as (stage, stage_name, docs, tokens)",
        "d0", "t0")
      .select(col("stage"), col("stage_name"), col("docs"), col("tokens"),
        round(col("docs") / col("d0"), 6).as("doc_frac"),
        round(col("tokens") / col("t0"), 6).as("token_frac"))
  }

  /** Deterministic stratified sample — k docs per source by seeded
    * hash rank (eval-set / human-review-batch construction: every
    * source is represented regardless of size, and the draw is
    * reproducible and engine-portable, no RNG state).
    *
    * Scale: the naive form is one rank window per source — a giant
    * source becomes a single straggler task. So the rank is
    * two-phase: docs first rank within (source, salt) sub-strata
    * (32-way hash salt, each task bounded by its stratum) and only
    * the ≤ 32·k per-stratum survivors enter the per-source window.
    * Equivalent to the single global per-source rank: an element
    * outside its stratum's top k cannot be in the source's top k. */
  def stratifiedSample(docs: DataFrame, k: Int = 10, seed: Long = 0L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val salted = docs.select(col("doc_id"), col("source"))
      .withColumn("rnd", Dedup.md5Int(
        concat(col("doc_id").cast("string"), lit(":"), lit(seed.toString))))
      .withColumn("salt", pmod(col("rnd"), lit(32L)))
    val w1 = Window.partitionBy("source", "salt")
      .orderBy(col("rnd"), col("doc_id"))
    val w2 = Window.partitionBy("source").orderBy(col("rnd"), col("doc_id"))
    salted.withColumn("r1", row_number().over(w1)).where(col("r1") <= k)
      .withColumn("rk", row_number().over(w2)).where(col("rk") <= k)
      .select(col("doc_id"), col("source"), col("rk").cast("long").as("rk"))
  }

  /** Corpus vocabulary table — the word-frequency statistics a
    * tokenizer-training (BPE/unigram-LM) pass starts from, and the
    * df side of tf-idf: per word, total occurrences and
    * document frequency, top `topN` by count (ties to the
    * lexicographically first word — deterministic).
    *
    * Scale: explode + one hash aggregation per statistic, then the
    * global top-N via orderBy+limit — Spark plans that as
    * TakeOrdered (per-partition heaps merged on the driver, N rows),
    * NOT a single-partition row_number window; the rank column is
    * computed over the already-reduced N rows. */
  def vocabulary(docs: DataFrame, topN: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = docs.select(col("doc_id"),
      explode(org.apache.spark.sql.functions.split(lower(col("text")), "\\s+"))
        .as("word"))
    val stats = words.groupBy("word").agg(
      count(lit(1)).as("tf"),
      countDistinct(col("doc_id")).as("df"))
    val top = stats.orderBy(col("tf").desc, col("word").asc).limit(topN)
    // rank over the N surviving rows only (tiny frame)
    top.withColumn("rank",
      row_number().over(Window.orderBy(col("tf").desc, col("word").asc))
        .cast("long"))
  }

  /** Zipf rank-frequency fit over the top-N vocabulary — the
    * dataset-card "does this corpus look like natural language"
    * check (natural text fits ln tf ≈ a + s·ln rank with s near −1;
    * template/boilerplate corpora flatten toward 0). Least-squares
    * on the log-log points: slope = cov(x,y)/var(x), intercept from
    * the means, r² = cov²/(var·var) — the same closed forms DuckDB's
    * regr_* aggregates use, so the oracle replays them exactly.
    *
    * Scale: everything after [[vocabulary]]'s hash aggregation runs
    * on the N surviving rows (one tiny final aggregate) — corpus
    * cost is the one explode+groupBy pass vocabulary already pays. */
  def zipfFit(docs: DataFrame, topN: Int = 100): DataFrame = {
    val pts = vocabulary(docs, topN)
      .select(log(col("rank").cast("double")).as("x"),
        log(col("tf").cast("double")).as("y"))
    pts.agg(
        count(lit(1)).as("n_words"),
        covar_pop(col("x"), col("y")).as("_cxy"),
        var_pop(col("x")).as("_vx"),
        var_pop(col("y")).as("_vy"),
        avg(col("x")).as("_mx"),
        avg(col("y")).as("_my"))
      .select(
        col("n_words"),
        round(col("_cxy") / col("_vx"), 6).as("zipf_slope"),
        round(col("_my") - col("_cxy") / col("_vx") * col("_mx"), 6)
          .as("intercept"),
        // r² undefined when tf is constant (var_y = 0): null, not a
        // divide-by-zero — vx > 0 always (ranks 1..N are distinct)
        round(when(col("_vy") === 0d, lit(null))
          .otherwise(col("_cxy") * col("_cxy") / (col("_vx") * col("_vy"))),
          6).as("r2"))
  }

  /** Per-document bigram pairs (u, w) — within-document whitespace
    * tokens zipped with their successor, formed map-side from the
    * token array (no per-doc window shuffle). */
  private def bigramPairs(docs: DataFrame): DataFrame = {
    val a = org.apache.spark.sql.functions.split(lower(col("text")), "\\s+")
    docs.select(col("doc_id"), a.as("a"))
      .where(size(col("a")) >= 2)
      .select(col("doc_id"), explode(arrays_zip(
        slice(col("a"), lit(1), size(col("a")) - 1).as("u"),
        slice(col("a"), lit(2), size(col("a")) - 1).as("w"))).as("p"))
      .select(col("doc_id"), col("p.u").as("u"), col("p.w").as("w"))
  }

  /** Interpolated Kneser-Ney bigram LM estimation (Kneser & Ney
    * 1995; Chen & Goodman 1998 §2.7 — the smoothing KenLM
    * implements, i.e. the model family behind CCNet-style
    * perplexity filtering). Whitespace tokens, bigrams within each
    * document; the absolute discount is estimated from corpus
    * statistics, D = n₁/(n₁+2n₂) over bigram-type counts, and for a
    * history u with total c(u·) and N₁₊(u·) distinct continuations:
    *
    *   p_kn(w|u) = max(c(u,w)−D, 0)/c(u·) + λ(u)·p_cont(w)
    *   λ(u) = D·N₁₊(u·)/c(u·),   p_cont(w) = N₁₊(·w)/‖bigram types‖
    *
    * Emits the top-N bigrams by count with every factor exposed;
    * all inputs are exact integer counts and the probability is one
    * fixed rational expression of them, so both engines compute the
    * identical double.
    *
    * Scale: one map-side bigram explode into a (u,w) hash count,
    * two skinny re-aggregations of that count table (per-u, per-w),
    * one 4-value global aggregate (n₁/n₂/types), and broadcast
    * joins of the tiny stat frames onto the top-N rows. */
  def knBigramLm(docs: DataFrame, topN: Int = 100): DataFrame = {
    // four consumers (perU, perW, glob, top) read the count table:
    // lazily checkpoint so the corpus explode+count runs once
    val cuw = bigramPairs(docs).groupBy("u", "w")
      .agg(count(lit(1)).as("c_uw")).materialize(false)
    val perU = cuw.groupBy("u").agg(sum("c_uw").as("c_u"),
      count(lit(1)).as("nplus_u"))
    val perW = cuw.groupBy("w").agg(count(lit(1)).as("nplus_w"))
    val glob = cuw.agg(
      sum((col("c_uw") === 1).cast("long")).as("n1"),
      sum((col("c_uw") === 2).cast("long")).as("n2"),
      count(lit(1)).as("n_types"))
    val top = cuw.orderBy(col("c_uw").desc, col("u").asc, col("w").asc)
      .limit(topN)
    // n1+2n2 = 0 (no singleton/doubleton bigram types — small vocab,
    // long docs) means nothing to discount: D = 0, plain MLE
    val d = when(col("n1") + lit(2L) * col("n2") === 0L, lit(0.0))
      .otherwise(col("n1").cast("double") /
        (col("n1") + lit(2L) * col("n2")).cast("double"))
    val pCont = col("nplus_w").cast("double") / col("n_types").cast("double")
    val lam = d * col("nplus_u").cast("double") / col("c_u").cast("double")
    val pKn = greatest(col("c_uw").cast("double") - d, lit(0.0)) /
      col("c_u").cast("double") + lam * pCont
    top.join(broadcast(perU), "u").join(broadcast(perW), "w")
      .crossJoin(broadcast(glob))
      .select(col("u"), col("w"), col("c_uw"), col("c_u"),
        col("nplus_u"), col("nplus_w"), col("n_types"),
        round(d, 6).as("discount"),
        round(lam, 6).as("lambda_u"),
        round(pCont, 6).as("p_cont"),
        round(pKn, 6).as("p_kn"))
      .orderBy(col("c_uw").desc, col("u").asc, col("w").asc)
  }

  /** Per-document trigram triples (u, v, w) — map-side like
    * [[bigramPairs]]. */
  private def trigramTriples(docs: DataFrame): DataFrame = {
    val a = org.apache.spark.sql.functions.split(lower(col("text")), "\\s+")
    docs.select(col("doc_id"), a.as("a"))
      .where(size(col("a")) >= 3)
      .select(col("doc_id"), explode(arrays_zip(
        slice(col("a"), lit(1), size(col("a")) - 2).as("u"),
        slice(col("a"), lit(2), size(col("a")) - 2).as("v"),
        slice(col("a"), lit(3), size(col("a")) - 2).as("w"))).as("p"))
      .select(col("doc_id"), col("p.u").as("u"), col("p.v").as("v"),
        col("p.w").as("w"))
  }

  /** Trigram interpolated Kneser-Ney — the full recursive form
    * (Chen & Goodman 1998 eq. 18: highest order uses raw counts,
    * every lower order uses CONTINUATION counts — "how many distinct
    * contexts precede this n-gram", the Kneser-Ney insight that
    * 'Francisco' is frequent but only ever follows 'San'), with the
    * KenLM-standard minimum-count PRUNING of trigram singletons
    * (`--prune 0 0 1`): trigram types with c < minCount leave the
    * model, and their mass rides the backoff weight — the SRILM
    * pruned-mass rule, which keeps the distribution EXACTLY
    * normalized:
    *
    *   retained: p₃(w|u,v) = max(c(u,v,w)−D₃,0)/c(u,v·) + λ₃·p₂(w|v)
    *   pruned:   p₃(w|u,v) = λ₃(u,v)·p₂(w|v)
    *   λ₃(u,v)  = (D₃·N≥(uv·) + Σ_{pruned w} c(u,v,w)) / c(u,v·)
    *   p₂(w|v)  = max(N₁₊(·vw)−D₂,0)/N₁₊(·v·) + λ₂(v)·p₁(w)
    *   p₁(w)    = N₁₊(·w)/‖bigram types‖
    *
    * where N≥(uv·) counts RETAINED types, c(u,v·) keeps the TRUE
    * denominator, the continuation layer builds from the PRUNED
    * table (if (v,w) or v lost every retained trigram, p₂ falls to
    * λ₂·p₁ and then p₁ — each step normalized), and discounts come
    * from raw counts-of-counts per KenLM (D₃ over raw trigram
    * counts, D₂ over the pruned continuation counts). Every factor
    * is an exact integer, so p is one cross-engine-identical
    * rational expression. Emits the top-N RETAINED trigrams with the
    * full factorization.
    *
    * Scale: the one O(tokens) pass is the trigram hash count; with
    * singleton pruning every downstream TYPE table (the model join
    * frame, the continuation tables) stops growing linearly with
    * tokens — trigram singletons are the ~linear-growth tail
    * (measured 4.8× at 10× unpruned in r8; the pruned tables grow
    * with repeated-trigram types only). */
  def knTrigramLm(docs: DataFrame, topN: Int = 100,
                  minCount: Int = 2): DataFrame = {
    val t = kn3Tables(docs, minCount)
    val top = t.c3p.orderBy(col("c_uvw").desc, col("u").asc,
      col("v").asc, col("w").asc).limit(topN)
    top.join(broadcast(t.hist), Seq("u", "v"))
      .join(broadcast(t.cont), Seq("v", "w"))
      .join(broadcast(t.contV), "v")
      .join(broadcast(t.perW), "w")
      .crossJoin(broadcast(t.nTypes))
      .crossJoin(broadcast(t.g3)).crossJoin(broadcast(t.g2))
      .select(col("u"), col("v"), col("w"), col("c_uvw"), col("c_uv"),
        col("n_vw"), col("n_v_dot"),
        round(t.d3, 6).as("d3"), round(t.d2, 6).as("d2"),
        round(t.lam3, 9).as("lam3"),
        round(t.p2Retained, 9).as("p2_backoff"),
        round(t.p3Retained, 9).as("p_kn3"))
      .orderBy(col("c_uvw").desc, col("u").asc, col("v").asc,
        col("w").asc)
  }

  /** The kn3 model tables + probability expressions shared by
    * [[knTrigramLm]] and [[knTrigramPerplexity]]. */
  private case class Kn3Tables(
    c3p: DataFrame, hist: DataFrame, cont: DataFrame, contV: DataFrame,
    perW: DataFrame, nTypes: DataFrame, g3: DataFrame, g2: DataFrame,
    d3: Column, d2: Column, lam3: Column, p1: Column,
    p2Retained: Column, p3Retained: Column)

  private def kn3Tables(docs: DataFrame, minCount: Int,
                        occ: Option[DataFrame] = None): Kn3Tables = {
    // the count tables are TYPE-level (small) but feed 4-7 consumers
    // each — lazily localCheckpoint so the corpus-sized explode+count
    // runs ONCE per query instead of once per consumer (blocks are
    // freed with the frame by the ContextCleaner, not session-pinned).
    // A caller that already materialized the occurrence stream (the
    // perplexity scorer) passes it in, saving one more corpus pass.
    val c3 = occ.getOrElse(trigramTriples(docs)).groupBy("u", "v", "w")
      .agg(count(lit(1)).as("c_uvw")).materialize(false)
    // per-context stats over the FULL count table: true denominator,
    // retained-type count, and the pruned mass that moves to λ₃
    val hist = c3.groupBy("u", "v").agg(sum("c_uvw").as("c_uv"),
      sum(when(col("c_uvw") >= minCount, 1L).otherwise(0L))
        .as("nplus_uv"),
      sum(when(col("c_uvw") < minCount, col("c_uvw")).otherwise(0L))
        .as("c_pruned"))
    val c3p = c3.where(col("c_uvw") >= minCount)
    // continuation layer from the PRUNED table: N1+(·vw) = distinct
    // retained u preceding (v,w)
    val cont = c3p.groupBy("v", "w").agg(count(lit(1)).as("n_vw"))
    val contV = cont.groupBy("v").agg(sum("n_vw").as("n_v_dot"),
      count(lit(1)).as("nplus_v"))
    // bigram continuation for the unigram layer: N1+(·w), ‖bigram types‖
    val bg = bigramPairs(docs).groupBy("u", "w")
      .agg(count(lit(1)).as("c_uw")).materialize(false)
    val perW = bg.groupBy("w").agg(count(lit(1)).as("nplus_w"))
    val nTypes = bg.agg(count(lit(1)).as("n_types"))
    // discounts from RAW counts-of-counts (KenLM computes D before
    // pruning) for D₃; the pruned continuation table for D₂
    val g3 = c3.agg(
      sum((col("c_uvw") === 1).cast("long")).as("n1_3"),
      sum((col("c_uvw") === 2).cast("long")).as("n2_3"))
    val g2 = cont.agg(
      sum((col("n_vw") === 1).cast("long")).as("n1_2"),
      sum((col("n_vw") === 2).cast("long")).as("n2_2"))
    def disc(n1: Column, n2: Column): Column =
      when(n1 + lit(2L) * n2 === 0L, lit(0.0))
        .otherwise(n1.cast("double") / (n1 + lit(2L) * n2).cast("double"))
    val d3 = disc(col("n1_3"), col("n2_3"))
    val d2 = disc(col("n1_2"), col("n2_2"))
    val p1 = col("nplus_w").cast("double") / col("n_types").cast("double")
    val p2 = greatest(col("n_vw").cast("double") - d2, lit(0.0)) /
      col("n_v_dot").cast("double") +
      d2 * col("nplus_v").cast("double") / col("n_v_dot").cast("double") * p1
    val lam3 = (d3 * col("nplus_uv").cast("double") +
      col("c_pruned").cast("double")) / col("c_uv").cast("double")
    val p3 = greatest(col("c_uvw").cast("double") - d3, lit(0.0)) /
      col("c_uv").cast("double") + lam3 * p2
    Kn3Tables(c3p, hist, cont, contV, perW, nTypes, g3, g2,
      d3, d2, lam3, p1, p2, p3)
  }

  /** Per-document cross-entropy under the TRIGRAM interpolated KN
    * ([[knTrigramLm]]) — the higher-order twin of [[knPerplexity]]:
    * a sharper quality signal (trigram context catches scrambled or
    * templated text a bigram model scores fluent). Self-evaluation:
    * every test trigram exists in training, no OOV branch.
    *
    * Scale: the same type-level model tables as [[knTrigramLm]]
    * pre-join into ONE (u,v,w → log₂p) frame; the trigram occurrence
    * stream shuffles once into that join, then one per-doc
    * aggregate. */
  def knTrigramPerplexity(docs: DataFrame, minCount: Int = 2): DataFrame = {
    val occ = trigramTriples(docs).materialize(false)
    val t = kn3Tables(docs, minCount, occ = Some(occ.drop("doc_id")))
    // self-evaluation with a PRUNED model: every test trigram has a
    // context row in `hist` (built from the full count table), but a
    // pruned singleton is absent from c3p/cont and scores through
    // the backoff chain — λ₃·p₂, with p₂ itself degrading to λ₂·p₁
    // (v retained, (v,w) not) and to p₁ (v fully pruned). Only the
    // PRUNED tables enter the scoring joins; the full trigram type
    // table never ships past its two skinny aggregations.
    val scored = occ
      .join(t.hist, Seq("u", "v"))
      .join(t.c3p.select(col("u"), col("v"), col("w"), col("c_uvw")),
        Seq("u", "v", "w"), "left")
      .join(t.cont, Seq("v", "w"), "left")
      .join(t.contV, Seq("v"), "left")
      .join(t.perW, Seq("w"))
      .crossJoin(broadcast(t.nTypes))
      .crossJoin(broadcast(t.g3)).crossJoin(broadcast(t.g2))
    val p2Chain = when(col("n_vw").isNotNull, t.p2Retained)
      .when(col("n_v_dot").isNotNull,
        t.d2 * col("nplus_v").cast("double") /
          col("n_v_dot").cast("double") * t.p1)
      .otherwise(t.p1)
    val p3 = when(col("c_uvw").isNotNull,
      greatest(col("c_uvw").cast("double") - t.d3, lit(0.0)) /
        col("c_uv").cast("double") + t.lam3 * p2Chain)
      .otherwise(t.lam3 * p2Chain)
    scored
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_trigrams"),
        (-avg(log2(p3))).as("_h"))
      .select(col("doc_id"), col("n_trigrams"),
        round(col("_h"), 6).as("cross_entropy_bits"),
        round(pow(lit(2.0), col("_h")), 6).as("ppl"))
      .orderBy("doc_id")
  }

  /** Per-document cross-entropy under the corpus's own interpolated
    * Kneser-Ney bigram LM ([[knBigramLm]]) — the CCNet §3.2 quality
    * signal computed with a real smoothed LM instead of a proxy:
    * docs whose bigrams are improbable under the corpus model are
    * the tail a perplexity filter drops. Self-evaluation means
    * every test bigram exists in training (no OOV backoff branch).
    * Emits per doc the bigram count, cross-entropy in bits
    * (−mean log₂ p_kn) and perplexity 2^H.
    *
    * Scale: the three type-level count tables pre-join into ONE
    * model frame (u, w, log₂p) — type-scale, so AQE broadcasts it at
    * these SFs and a 100 TB corpus pays a single occurrence-stream
    * shuffle instead of three — then one per-doc aggregate. (A
    * variant that pre-aggregated per-doc bigram counts before the
    * join measured SLOWER at 10×: bigrams are mostly unique within a
    * doc, so the extra groupBy shuffled occurrence-scale data
    * without shrinking it.) */
  def knPerplexity(docs: DataFrame): DataFrame = {
    val occ = bigramPairs(docs)
    val cuw = occ.groupBy("u", "w").agg(count(lit(1)).as("c_uw"))
    val perU = cuw.groupBy("u").agg(sum("c_uw").as("c_u"),
      count(lit(1)).as("nplus_u"))
    val perW = cuw.groupBy("w").agg(count(lit(1)).as("nplus_w"))
    val glob = cuw.agg(
      sum((col("c_uw") === 1).cast("long")).as("n1"),
      sum((col("c_uw") === 2).cast("long")).as("n2"),
      count(lit(1)).as("n_types"))
    val d = when(col("n1") + lit(2L) * col("n2") === 0L, lit(0.0))
      .otherwise(col("n1").cast("double") /
        (col("n1") + lit(2L) * col("n2")).cast("double"))
    val pKn = greatest(col("c_uw").cast("double") - d, lit(0.0)) /
      col("c_u").cast("double") +
      d * col("nplus_u").cast("double") / col("c_u").cast("double") *
        (col("nplus_w").cast("double") / col("n_types").cast("double"))
    val model = cuw.join(perU, "u").join(perW, "w")
      .crossJoin(broadcast(glob))
      .select(col("u"), col("w"), log2(pKn).as("lp"))
    occ.join(model, Seq("u", "w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        (-avg(col("lp"))).as("_h"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("_h"), 6).as("cross_entropy_bits"),
        round(pow(lit(2.0), col("_h")), 6).as("ppl"))
      .orderBy("doc_id")
  }

  /** Dup-cluster size distribution — the dedup summary a dataset
    * card reports (how many pairs/triples/blobs, how many docs the
    * near-dup graph would remove). One row per observed cluster
    * size with the cluster count, docs covered, and docs dedup
    * would drop (size − 1 per cluster).
    *
    * Scale: reuses the shared [[dupClusters]] label frame (computed
    * once per lineage), then two hash aggregations — cluster_id →
    * size, size → counts. The second aggregate's key space is
    * ≤ max cluster size: tiny by construction. */
  def clusterSizeStats(docs: DataFrame, pairs: DataFrame,
                       maxIter: Int = 20): DataFrame = {
    val labels = dupClusters(docs, pairs, maxIter)
    labels.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size").agg(
        count(lit(1)).as("n_clusters"),
        sum(col("cluster_size")).as("n_docs"),
        sum(col("cluster_size") - 1).as("docs_removable"))
      .orderBy("cluster_size")
  }

  /** One-row dataset card — the summary block a corpus release ships
    * with, composed from the individually-verified operators: corpus
    * size (docs / whitespace tokens / sources), exact-duplicate
    * fraction, Gopher quality pass rate, and the Zipf slope health
    * check.
    *
    * Scale: four independent single-row aggregates (each one hash
    * aggregation over the corpus or, for zipf, over the top-N vocab)
    * cross-joined at one row each — no corpus-side join, no window
    * wider than [[Dedup.exact]]'s per-content-hash rank. */
  def card(docs: DataFrame): DataFrame = {
    val base = docs.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("source")).as("n_sources"),
      sum(size(org.apache.spark.sql.functions.split(col("text"), "\\s+"))
        .cast("long")).as("n_tokens"))
    val dup = Dedup.exact(docs).agg(
      round(avg(col("is_dup").cast("double")), 6).as("exact_dup_frac"))
    val gq = TextAnalysis.gopherQuality(docs).agg(
      round(avg(col("gopher_pass").cast("double")), 6).as("gopher_pass_frac"))
    val zipf = zipfFit(docs).select(col("zipf_slope"))
    base.crossJoin(broadcast(dup)).crossJoin(broadcast(gq))
      .crossJoin(broadcast(zipf))
  }

  /** Benchmark decontamination: fraction of each document's distinct
    * shingles that appear in the benchmark set's shingle universe;
    * docs above `threshold` are flagged contaminated. The benchmark
    * shingle set is distinct-hashed (small → broadcast semi-join
    * side); cost is one pass over the corpus shingles. */
  def decontaminate(docs: DataFrame, benchmark: DataFrame,
                    threshold: Double = 0.5, n: Int = 3): DataFrame = {
    val docSh = Dedup.shingleHashes(docs, n).select("doc_id", "h").distinct()
    val benchSh = Dedup.shingleHashes(benchmark, n).select("h").distinct()
    val overlap = docSh.join(benchSh, Seq("h"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("hit"))
    docSh.groupBy("doc_id").agg(count(lit(1)).as("total"))
      .join(overlap, Seq("doc_id"), "left")
      .select(col("doc_id"),
        round(coalesce(col("hit"), lit(0L)).cast("double") / col("total"), 6)
          .as("overlap_ratio"))
      .withColumn("contaminated",
        (col("overlap_ratio") > threshold).cast("int"))
  }

  /** DSIR importance weights (Xie et al.: Data Selection via
    * Importance Resampling): score every corpus document by how much
    * more likely its hashed n-gram features are under a TARGET
    * distribution (here: a benchmark-like subset selected by `isTarget`)
    * than under the corpus itself —
    * log w(d) = Σ_w [ln p_t(b(w)) − ln p_s(b(w))] with words hashed
    * into `buckets` feature buckets (md5-derived, so the oracle replays
    * the bucketing exactly) and add-one smoothing on both sides.
    * Sampling ∝ w then selects target-like training data.
    *
    * Scale: one exploded word stream feeds ONE hash aggregation that
    * computes source and target bucket counts together (the target
    * indicator is a column, not a second scan); the log-ratio table is
    * ≤ `buckets` rows — broadcast back onto the word stream; final
    * per-doc aggregation keys on doc_id. No window, no driver state. */
  def dsirWeights(docs: DataFrame, isTarget: org.apache.spark.sql.Column,
                  buckets: Int = 64): DataFrame = {
    // per-doc bucket counts first: the token stream partial-combines
    // map-side and every downstream stage (bucket totals, the scoring
    // join) runs over distinct (doc, bucket) rows — ≤ buckets per doc
    val dbc = docs.select(col("doc_id"), isTarget.as("tgt"),
      explode(org.apache.spark.sql.functions.split(lower(col("text")), "\\s+"))
        .as("w"))
      .groupBy(col("doc_id"), col("tgt"),
        pmod(Dedup.md5Int(col("w")), lit(buckets.toLong)).as("b"))
      .agg(count(lit(1)).as("cnt"))
    val bc = dbc.groupBy("b").agg(
      sum("cnt").as("cs"),
      sum(when(col("tgt"), col("cnt")).otherwise(0L)).as("ct"))
    val tot = bc.agg(sum("cs").as("ns"), sum("ct").as("nt"))
    val lr = bc.crossJoin(broadcast(tot)).select(col("b"),
      (log((col("ct") + 1).cast("double") / (col("nt") + buckets).cast("double")) -
        log((col("cs") + 1).cast("double") / (col("ns") + buckets).cast("double")))
        .as("lr"))
    dbc.join(broadcast(lr), "b")
      .groupBy("doc_id")
      .agg(sum("cnt").as("n_words"),
        sum(col("cnt") * col("lr")).as("logw"),
        (sum(col("cnt") * col("lr")) / sum("cnt")).as("mlr"))
      .select(col("doc_id"), col("n_words"),
        round(col("logw"), 6).as("dsir_logweight"),
        round(col("mlr"), 6).as("dsir_mean"))
  }

  /** Quality-ranked survivor selection within near-dup clusters —
    * the "keep best, not first" curation policy: instead of
    * [[dupClusters]]'s min-id canonical, each cluster keeps its
    * highest-quality member (ties broken by lowest doc_id). This is
    * what production pipelines actually ship: near-dup groups
    * collapse to the cleanest copy, not an arbitrary one.
    *
    * Scale: cluster labels come from the verified [[dupClusters]]
    * iteration; the ranking window partitions by cluster_id —
    * clusters are near-cliques from LSH blocking (tiny), singletons
    * are 1-row partitions, so no window partition ever outgrows a
    * dup cluster. One doc_id-keyed join + one bounded window. */
  def canonicalPick(docs: DataFrame, pairs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cl = dupClusters(docs.select("doc_id"), pairs)
      .select("doc_id", "cluster_id")
    val q = TextAnalysis.quality(docs).select("doc_id", "quality_score")
    val w = Window.partitionBy("cluster_id")
      .orderBy(col("quality_score").desc, col("doc_id").asc)
    cl.join(q, "doc_id")
      .withColumn("keep_best", (row_number().over(w) === 1).cast("int"))
  }

  /** Concat-and-chunk sequence packing — the last mile of a
    * training-data pipeline: documents are concatenated in doc_id
    * order within a deterministic shard and chunked into fixed
    * `ctxTokens`-sized training sequences (the GPT-style packing
    * where a doc may straddle a window boundary). Emits each doc's
    * token-offset interval and the first/last sequence index it
    * lands in, so a loader can seek straight to any sequence.
    *
    * Scale: ONE running-sum window per shard, never a global sort —
    * the shard is an md5 bucket of doc_id, and nShards is chosen so
    * a shard's token stream fits an executor (at 100 TB you run
    * nShards ≈ 10⁴–10⁵; the default 8 matches the test corpus).
    * Sequence indices are shard-local by construction, so shards
    * pack fully independently — embarrassingly parallel. */
  def packSequences(docs: DataFrame, ctxTokens: Int = 512,
                    nShards: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("doc_id"),
      pmod(Dedup.md5Int(col("doc_id").cast("string")), lit(nShards.toLong))
        .as("shard"),
      size(org.apache.spark.sql.functions.split(lower(col("text")), "\\s+"))
        .cast("long").as("n_tokens"))
    val endOff = sum("n_tokens")
      .over(Window.partitionBy("shard").orderBy("doc_id"))
    toks.withColumn("end_off", endOff)
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        (col("end_off") - col("n_tokens")).as("start_off"),
        floor((col("end_off") - col("n_tokens")).cast("double") / ctxTokens)
          .cast("long").as("first_seq"),
        floor((col("end_off") - 1).cast("double") / ctxTokens)
          .cast("long").as("last_seq"))
  }

  /** Fold-pairing sequence packer — the zero-straddler alternative
    * to [[packSequences]]' concat-and-chunk: within each shard, docs
    * sort by length (desc) and the r-th longest pairs with the r-th
    * shortest (its mirror rank) when the two fit one context window —
    * the classic sorted-folding bin-packing heuristic, the
    * window-only special case of the first-fit/histogram packers
    * (Graphcore's packedBERT SPFHP family) that a plain SQL replay
    * can pin exactly. No document ever straddles a bin boundary
    * (attention contamination = 0 by construction, where concat
    * packing trades that for a perfect fill), at the cost of padding
    * in bins that don't fill. Docs longer than the context window
    * route to the chunker ([[chunkDocs]]) and are counted, not
    * silently dropped.
    *
    * Per shard: doc/oversize counts, token mass, bins and packed
    * pairs, fill ratio, and the ⌈tokens/ctx⌉ lower bound — the
    * concat-vs-fold decision next to [[packStats]]' straddler count.
    *
    * Scale: one shard-partitioned rank window (the packSequences
    * shuffle) + a mirror-rank self-join ON THE RANK FRAME (doc
    * cardinality, equi-join on (shard, rank) — no expansion) + a
    * shards-sized aggregation. */
  def packFold(docs: DataFrame, ctxTokens: Int = 512,
               nShards: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("doc_id"),
      pmod(Dedup.md5Int(col("doc_id").cast("string")), lit(nShards.toLong))
        .as("shard"),
      size(org.apache.spark.sql.functions.split(lower(col("text")), "\\s+"))
        .cast("long").as("n_tokens"))
    val fit = toks.where(col("n_tokens") <= ctxTokens)
    val over = toks.where(col("n_tokens") > ctxTokens)
      .groupBy("shard").agg(count(lit(1)).as("n_oversize"),
        sum("n_tokens").as("oversize_tokens"))
    val rkW = Window.partitionBy("shard")
      .orderBy(col("n_tokens").desc, col("doc_id").asc)
    val ranked = fit
      .withColumn("r", row_number().over(rkW).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("shard")))
    val mirror = ranked.select(col("shard").as("_m_shard"),
      col("r").as("_m_r"), col("n_tokens").as("_m_tokens"))
    val binned = ranked.join(mirror,
        col("shard") === col("_m_shard") &&
          col("_m_r") === col("n") + 1 - col("r"))
      .select(col("shard"), col("n_tokens"), col("r"),
        // a mirror pair packs iff both fit one window; the head rank
        // names the bin, the middle element (odd n: r = mirror) and
        // unpackable pairs sit alone
        when(col("r") =!= col("_m_r") &&
          col("n_tokens") + col("_m_tokens") <= ctxTokens,
          least(col("r"), col("_m_r"))).otherwise(col("r")).as("bin"))
    val perShard = binned.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("tokens"),
        countDistinct("bin").as("n_bins"),
        (count(lit(1)) - countDistinct("bin")).as("n_pairs"))
    perShard.join(over, Seq("shard"), "left")
      .select(col("shard"), col("n_docs"),
        coalesce(col("n_oversize"), lit(0L)).as("n_oversize"),
        col("tokens"), col("n_bins"), col("n_pairs"),
        round(col("tokens").cast("double") /
          (col("n_bins") * lit(ctxTokens.toLong)), 6).as("fill_ratio"),
        ceil(col("tokens").cast("double") / ctxTokens).cast("long")
          .as("lower_bound"))
      .orderBy("shard")
  }

  /** Packing-efficiency report — the operational readout of
    * [[packSequences]] pipelines: per shard, how many fixed-size
    * training sequences the token mass fills, the fill ratio (concat
    * packing pads only each shard's final partial sequence, so
    * waste = one tail per shard), and how many docs straddle a
    * sequence boundary (the attention-contamination proxy teams
    * monitor when deciding between concat and first-fit packing).
    *
    * Scale: a shards-sized hash aggregation over the pack frame —
    * the per-shard running sum is already computed there; nothing
    * new shuffles. */
  def packStats(docs: DataFrame, ctxTokens: Int = 512,
                nShards: Int = 8): DataFrame = {
    packSequences(docs, ctxTokens, nShards)
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("tokens"),
        (max("last_seq") + 1).as("n_seqs"),
        sum((col("first_seq") =!= col("last_seq")).cast("long"))
          .as("straddlers"))
      .select(col("shard"), col("n_docs"), col("tokens"), col("n_seqs"),
        col("straddlers"),
        round(col("tokens") / (col("n_seqs") * ctxTokens), 6)
          .as("fill_ratio"))
  }

  /** Sliding-window chunker — the context-window preparation stage
    * of RAG / long-document pretraining pipelines. The complement of
    * [[packSequences]]: packing concatenates SHORT docs into budget
    * bins; chunking splits LONG docs into fixed-`window` token
    * slices whose starts step by `window - overlap` (the final
    * window covers the tail and may be short). Chunk ids are
    * (doc_id, chunk_idx) — stable across runs.
    *
    * Scale: one projection + posexplode, NO shuffle; per-doc fan-out
    * is ceil(max(n-window,0)/stride)+1 rows, linear in the corpus
    * token count. The words array is projected before the slice
    * (the inlined-split trap recorded in BASELINE.md). */
  def chunk(docs: DataFrame, window: Int = 64, overlap: Int = 16): DataFrame = {
    require(overlap >= 0 && overlap < window,
      s"overlap must be in [0, window): $overlap / $window")
    val stride = window - overlap
    docs
      .select(col("doc_id"),
        org.apache.spark.sql.functions.split(lower(col("text")), "\\s+")
          .as("_toks"))
      .withColumn("_n", size(col("_toks")).cast("long"))
      .withColumn("_maxs", greatest(
        (ceil((col("_n") - window).cast("double") / stride) * stride)
          .cast("long"), lit(0L)))
      .select(col("doc_id"), col("_toks"), col("_n"),
        posexplode(sequence(lit(0L), col("_maxs"), lit(stride.toLong))))
      .select(col("doc_id"),
        col("pos").cast("long").as("chunk_idx"),
        col("col").as("start_tok"),
        least(lit(window.toLong), col("_n") - col("col")).as("n_tok"),
        md5(array_join(
          slice(col("_toks"), col("col") + 1, lit(window)), " ")).as("chunk_md5"))
  }

  /** Deterministic training-order shuffle — the final pass of every
    * data pipeline: docs get a pseudorandom but REPRODUCIBLE global
    * order (seeded md5 rank), materialized as (shard, position)
    * coordinates a training loader streams in shard-major order.
    *
    * Shuffling 100 TB is exactly where a naive global `orderBy`
    * dies, so the permutation is two-level, like packing: the md5
    * rank hash-assigns each doc to a shard (uniform by
    * construction), and each shard orders ONLY its own docs by rank
    * — a shard-partitioned window, never a global sort. Shard-major
    * + position-minor traversal then visits docs in an order that is
    * (a) deterministic in the seed, (b) uniform, (c) produced with
    * one hash shuffle. A different seed reshuffles every epoch.
    *
    * Ties cannot happen: rank collisions fall back to doc_id in the
    * window order, keeping the permutation total. */
  def shuffleOrder(docs: DataFrame, seed: Long = 0L,
                   nShards: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rnd = Dedup.md5Int(concat(col("doc_id").cast("string"),
      lit(s"#shuffle#$seed")))
    val w = Window.partitionBy("shard").orderBy("rnd", "doc_id")
    docs.select(col("doc_id"), rnd.as("rnd"))
      .withColumn("shard", pmod(col("rnd"), lit(nShards.toLong)))
      .withColumn("position", (row_number().over(w) - 1).cast("long"))
      .select("doc_id", "shard", "position", "rnd")
  }

  /** Curriculum staging — the difficulty-ordered training schedule
    * (curriculum learning as data pipelines run it: easiest docs
    * first; difficulty here = doc length, the standard short→long
    * proxy). Docs rank globally by (n_chars, doc_id); stage k of
    * `stages` is the contiguous rank block [k·N/stages,
    * (k+1)·N/stages); WITHIN a stage the order is a seeded md5
    * shuffle in (shard, position) coordinates — same two-level form
    * as [[shuffleOrder]] — so the loader streams stage-major,
    * shard-major, position-minor and each stage arrives iid.
    *
    * Scale: the global rank is the same two-phase shard pattern as
    * the graphite sort family — percentile bounds broadcast,
    * shard-local windows, broadcast prefix offsets — and the
    * within-stage windows partition by (stage, shard), never one
    * stage-wide (let alone corpus-wide) partition. N arrives as a
    * one-row broadcast, not a driver collect. */
  def curriculum(docs: DataFrame, stages: Int = 4, seed: Long = 0L,
                 nShards: Int = 8, rankShards: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qs = (1 until rankShards).map(_.toDouble / rankShards)
    val base = docs.select(col("doc_id"), col("n_chars"))
    // approx bounds are enough: they only balance the shards, the
    // rank itself stays exact whatever the cut points
    val bounds = base.agg(
      approx_percentile(col("n_chars"), typedlit(qs), lit(1000)).as("_bs"),
      count(lit(1)).as("_n"))
    val sharded = base.crossJoin(broadcast(bounds))
      .withColumn("_rshard", size(filter(col("_bs"), b => b < col("n_chars"))))
      .drop("_bs")
    val wLocal = Window.partitionBy("_rshard").orderBy("n_chars", "doc_id")
    val wPrefix = Window.orderBy("_rshard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sharded.groupBy("_rshard")
      .agg(count(lit(1)).as("_cnt"))
      .withColumn("_offset", coalesce(sum("_cnt").over(wPrefix), lit(0L)))
      .drop("_cnt")
    val rnd = Dedup.md5Int(concat(col("doc_id").cast("string"),
      lit(s"#curriculum#$seed")))
    val wStage = Window.partitionBy("stage", "shard").orderBy("rnd", "doc_id")
    sharded.join(broadcast(offsets), Seq("_rshard"))
      .withColumn("_rank",
        col("_offset") + row_number().over(wLocal) - 1)
      .withColumn("stage",
        expr(s"(_rank * $stages) div _n").cast("int"))
      .withColumn("rnd", rnd)
      .withColumn("shard", pmod(col("rnd"), lit(nShards.toLong)))
      .withColumn("position", (row_number().over(wStage) - 1).cast("long"))
      .select("doc_id", "n_chars", "stage", "shard", "position")
  }

  /** Cross-source duplicate attribution — who copies whom: every
    * non-canonical member of a near-dup cluster counted into a
    * (canonical's source, duplicate's source) matrix. Syndication,
    * mirror feeds and self-reposting all separate here, and the
    * matrix decides which feed to dedup FIRST (drop the habitual
    * copier, keep the origin). Canonical = the cluster label
    * (lowest doc_id), matching `corpus_clusters`.
    *
    * Scale: reuses the shared persisted cluster-label frame; the two
    * source lookups are equi-joins of the label frame against the
    * (doc_id, source) projection; the matrix aggregation is
    * ≤ sources². */
  def dupSources(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val labels = dupClusters(docs.select("doc_id"), pairs)
    val src = docs.select(col("doc_id"), col("source"))
    val canonSrc = src.toDF("cluster_id", "source_first")
    labels.where(col("doc_id") =!= col("cluster_id"))
      .join(src.toDF("doc_id", "source_dup"), "doc_id")
      .join(canonSrc, "cluster_id")
      .groupBy("source_first", "source_dup")
      .agg(count(lit(1)).as("n_dups"))
      .orderBy("source_first", "source_dup")
  }

  /** Corpus-growth duplication curve — the "marginal value of more
    * data" card: docs bucketed by arrival order (equal-width doc_id
    * ranges — ids are the ingest sequence), each bucket's exact-dup
    * count against everything that arrived BEFORE it, with the
    * cumulative dup fraction. A rising curve quantifies how fast a
    * feed exhausts its novelty — the signal behind stopping
    * crawls or re-weighting sources. Bucket assignment is integer
    * division end to end (no float boundaries).
    *
    * Scale: first-occurrence flags are the exact-dedup hash window
    * (partitioned by content hash, bounded by duplicate-set size);
    * buckets aggregate to `buckets` rows and the cumulative window
    * runs over those rows only. */
  def growthCurve(docs: DataFrame, buckets: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val flagged = docs.select(col("doc_id"), md5(col("text")).as("_h"))
      .withColumn("is_dup",
        (row_number().over(
          Window.partitionBy("_h").orderBy("doc_id")) > 1).cast("int"))
    val bounds = docs.agg(min("doc_id").as("_lo"), max("doc_id").as("_hi"))
    val wCum = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged.crossJoin(broadcast(bounds))
      .withColumn("bucket",
        least(expr(s"((doc_id - _lo) * $buckets) div (_hi - _lo + 1)"),
          lit(buckets - 1L)).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum("is_dup").cast("long").as("n_dups"))
      .withColumn("dup_frac",
        round(col("n_dups").cast("double") / col("n_docs"), 6))
      .withColumn("cum_dup_frac",
        round(sum("n_dups").over(wCum).cast("double") /
          sum("n_docs").over(wCum), 6))
      .select("bucket", "n_docs", "n_dups", "dup_frac", "cum_dup_frac")
      .orderBy("bucket")
  }

  /** Per-source quality drift — is a feed degrading: mean quality
    * score per (source, arrival bucket), with the bucket-0 baseline
    * and the delta attached to every row. The monitoring card that
    * catches a crawler rot or an upstream format change long before
    * aggregate corpus quality moves. Integer-exact arrival buckets
    * as in [[growthCurve]].
    *
    * Scale: quality evaluates in the scan (one map stage); the
    * aggregation is ≤ sources×buckets keys; the baseline join is
    * against the bucket-0 slice of that tiny frame. */
  def qualityDrift(docs: DataFrame, buckets: Int = 5): DataFrame = {
    val bounds = docs.agg(min("doc_id").as("_lo"), max("doc_id").as("_hi"))
    val scored = docs.crossJoin(broadcast(bounds))
      .select(col("source"),
        least(expr(s"((doc_id - _lo) * $buckets) div (_hi - _lo + 1)"),
          lit(buckets - 1L)).cast("long").as("bucket"),
        TextAnalysis.qualityScoreCol(col("text")).as("q"))
      .groupBy("source", "bucket")
      .agg(count(lit(1)).as("n_docs"), round(avg("q"), 6).as("mean_quality"))
    val base = scored.where(col("bucket") === 0)
      .select(col("source"), col("mean_quality").as("_q0"))
    scored.join(base, Seq("source"), "left")
      .select(col("source"), col("bucket"), col("n_docs"),
        col("mean_quality"),
        round(col("mean_quality") - col("_q0"), 6).as("drift_vs_first"))
      .orderBy("source", "bucket")
  }

  /** Dedup savings card — what running the near-dup plan actually
    * buys: docs and BPE tokens held by non-canonical cluster members
    * (the removable mass), as a one-row summary with fractions. The
    * number the "is fuzzy dedup worth the compute" decision is made
    * on, and the headline a dataset card quotes next to the exact-dup
    * fraction.
    *
    * Scale: rides the shared cluster-label frame; token counts
    * evaluate in the documents scan; one join on doc_id + a one-row
    * aggregation. */
  def dedupSavings(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val labels = dupClusters(docs.select("doc_id"), pairs)
      .select(col("doc_id"),
        (col("doc_id") =!= col("cluster_id")).cast("int").as("_removable"))
    docs.select(col("doc_id"),
        TextAnalysis.bpeTokensCol(col("text")).as("_tok"))
      .join(labels, "doc_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("_removable").cast("long").as("n_removable"),
        sum("_tok").cast("long").as("tokens_total"),
        sum(col("_tok") * col("_removable")).cast("long")
          .as("tokens_removable"))
      .select(col("n_docs"), col("n_removable"),
        round(col("n_removable").cast("double") / col("n_docs"), 6)
          .as("doc_frac"),
        col("tokens_total"), col("tokens_removable"),
        round(col("tokens_removable").cast("double") / col("tokens_total"), 6)
          .as("token_frac"))
  }

  /** Soft-dedup reweighting card — the down-weight-don't-delete
    * alternative to canonical-only dedup (SoftDeDup, Xue et al.
    * ACL 2024: duplicated documents keep a sampling weight inversely
    * proportional to their commonness instead of being dropped).
    * Weight = 1/cluster_size over the shared near-dup cluster frame,
    * so each cluster contributes exactly one copy's worth of mass in
    * expectation while every surface form stays available to the
    * sampler. Per source: how many docs carry a discount, the raw
    * vs effective token mass, and the mean weight — the numbers that
    * decide between this and [[dedupSavings]]' hard removal.
    *
    * Cross-engine determinism: weights are integer micro-units
    * (ppm = 1000000 / cluster_size, integer division — the repo's
    * micro-unit discipline), so every sum is exact integer algebra
    * and only the final single divisions are floating.
    *
    * Scale: rides the shared cluster-label frame (cached across the
    * cluster family); cluster sizes come from a bounded per-cluster
    * window on the doc-cardinality label frame; one doc_id join +
    * a per-source aggregation. */
  def softDedup(docs: DataFrame, pairs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val szW = Window.partitionBy("cluster_id")
    val weights = dupClusters(docs.select("doc_id"), pairs)
      .withColumn("_csz", count(lit(1)).over(szW))
      .select(col("doc_id"), col("_csz"),
        floor(lit(1000000L) / col("_csz")).cast("long").as("_ppm"))
    docs.select(col("doc_id"), col("source"),
        TextAnalysis.bpeTokensCol(col("text")).as("_tok"))
      .join(weights, "doc_id")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("_csz") > 1, 1L).otherwise(0L)).as("n_discounted"),
        sum("_tok").cast("long").as("tokens_raw"),
        sum(col("_tok") * col("_ppm")).cast("long").as("_eff_ppm"),
        sum("_ppm").cast("long").as("_w_ppm"))
      .select(col("source"), col("n_docs"), col("n_discounted"),
        col("tokens_raw"),
        round(col("_eff_ppm").cast("double") / 1e6, 6).as("tokens_eff"),
        round(col("_eff_ppm").cast("double") /
          (col("tokens_raw").cast("double") * 1e6), 6).as("discount"),
        round(col("_w_ppm").cast("double") /
          (col("n_docs").cast("double") * 1e6), 6).as("mean_weight"))
      .orderBy("source")
  }

  /** Log₂ token-length histogram — the sequence-length planning
    * card (context-window choice, packing efficiency and truncation
    * loss all read off this shape; percentile buckets answer "where
    * are the cuts", this answers "what does the distribution look
    * like"). Bucket = ⌊log₂ tokens⌋ — safe cross-engine for integer
    * inputs: log₂ is IEEE-exact at powers of two and more than 1 ulp
    * from an integer everywhere else, so the floor can't flip.
    *
    * Scale: one map stage + a ≤64-key aggregation. */
  def tokenHistogram(docs: DataFrame): DataFrame =
    docs.select(TextAnalysis.bpeTokensCol(col("text")).as("t"))
      .where(col("t") > 0)
      .withColumn("bucket", floor(log2(col("t"))).cast("long"))
      .groupBy("bucket").agg(count(lit(1)).as("n_docs"))
      .withColumn("bucket_lo", pow(lit(2.0), col("bucket")).cast("long"))
      .select("bucket", "bucket_lo", "n_docs")
      .orderBy("bucket")

  /** Vocabulary-growth curve by arrival order — the token-novelty
    * complement of [[growthCurve]]'s duplicate curve: per arrival
    * bucket, how many words appear for the FIRST time, the running
    * vocabulary size, and new-words-per-token (the novelty rate a
    * crawl's marginal value decays by — the empirical, in-order form
    * of the Heaps exponent). Same integer-exact bucket math as
    * growthCurve.
    *
    * Scale: one explode + per-word min-bucket aggregation (map-side
    * combining, state = one min per word) + a `buckets`-row cumsum
    * window; nothing sorts the corpus. */
  def vocabGrowth(docs: DataFrame, buckets: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bounds = docs.agg(min("doc_id").as("_lo"), max("doc_id").as("_hi"))
    val bucketed = docs.crossJoin(broadcast(bounds))
      .withColumn("bucket",
        least(expr(s"((doc_id - _lo) * $buckets) div (_hi - _lo + 1)"),
          lit(buckets - 1L)).cast("long"))
      .select(col("bucket"), explode(TextAnalysis.words(col("text"))).as("w"))
    val firstSeen = bucketed.groupBy("w").agg(min("bucket").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_new_words"))
    val tokens = bucketed.groupBy("bucket").agg(count(lit(1)).as("n_tokens"))
    val wCum = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tokens.join(firstSeen, Seq("bucket"), "left")
      .select(col("bucket"), col("n_tokens"),
        coalesce(col("n_new_words"), lit(0L)).as("n_new_words"))
      .withColumn("vocab_cum", sum("n_new_words").over(wCum))
      .withColumn("novelty_rate",
        round(col("n_new_words").cast("double") / col("n_tokens"), 6))
      .orderBy("bucket")
  }

  /** Boilerplate mining — the top-N most widely shared word
    * n-grams with their document frequency and an example doc: the
    * discovery view behind span dedup and C4's policy-phrase list
    * (nav bars, cookie banners, license headers all surface here
    * first). Counterpart of `text_novelty`, which scores docs by how
    * few OTHER docs share their shingles.
    *
    * Scale: rides [[Dedup.shingles]]' per-doc-distinct explode, so
    * the group-by counts docs directly (no distinct over
    * occurrences); per-shingle state is two counters + a min; the
    * global top-N compiles to TakeOrdered, never a full sort. */
  def boilerplate(docs: DataFrame, topN: Int = 50, n: Int = 3): DataFrame = {
    val byShingle = Dedup.shingles(docs, n)
      .groupBy("shingle")
      .agg(count(lit(1)).as("df"), min("doc_id").as("example_doc"))
    import org.apache.spark.sql.expressions.Window
    byShingle
      .orderBy(col("df").desc, col("shingle").asc)
      .limit(topN)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("df").desc, col("shingle").asc)).cast("long"))
      .select("rank", "shingle", "df", "example_doc")
  }

  /** Heaps'-law fit — vocabulary growth V ≈ K·nᵝ, the companion
    * dataset-card check to [[zipfFit]]: natural language shows
    * β ≈ 0.4–0.6 (vocabulary grows sub-linearly in document length);
    * template/boilerplate corpora give β near 0 or 1. Fit is
    * least-squares on the per-doc (ln n_tokens, ln n_distinct)
    * cloud. One map stage over the corpus + ONE six-accumulator
    * aggregation — the regression algebra never leaves the
    * aggregate, so cost is a scan regardless of corpus size.
    * β undefined when every doc has the same length (var x = 0):
    * null, not a divide-by-zero. */
  def heapsFit(docs: DataFrame): DataFrame = {
    val w = TextAnalysis.words(col("text"))
    val pts = docs.select(
      log(size(w).cast("double")).as("x"),
      log(size(array_distinct(w)).cast("double")).as("y"))
    pts.agg(
        count(lit(1)).as("n_docs"),
        covar_pop(col("x"), col("y")).as("_cxy"),
        var_pop(col("x")).as("_vx"),
        var_pop(col("y")).as("_vy"),
        avg(col("x")).as("_mx"),
        avg(col("y")).as("_my"))
      .select(
        col("n_docs"),
        round(when(col("_vx") === 0d, lit(null))
          .otherwise(col("_cxy") / col("_vx")), 6).as("heaps_beta"),
        round(when(col("_vx") === 0d, lit(null))
          .otherwise(exp(col("_my") - col("_cxy") / col("_vx") * col("_mx"))),
          6).as("heaps_k"),
        round(when(col("_vx") === 0d || col("_vy") === 0d, lit(null))
          .otherwise(col("_cxy") * col("_cxy") / (col("_vx") * col("_vy"))),
          6).as("r2"))
  }

  /** Split-leakage audit — near-dup clusters that straddle the
    * train/val/test boundary. Random by-doc splits leak: a train doc
    * whose near-duplicate sits in test inflates eval scores, so
    * cluster-aware splitting (or this audit over an existing split)
    * is a standard release gate. One row per straddling cluster with
    * its size and the splits it touches.
    *
    * Scale: reuses the shared persisted cluster-label frame (the
    * expensive propagation runs once per lineage across clusters /
    * canonical / manifest / this audit); the split assignment is a
    * pure hash of doc_id computed ON the label frame — no join back
    * to the corpus — and the aggregation state per cluster is
    * bounded by the 3 split names, never cluster size. */
  def splitLeakage(docs: DataFrame, pairs: DataFrame,
                   valPct: Int = 10, testPct: Int = 10): DataFrame = {
    val labels = dupClusters(docs.select("doc_id"), pairs)
    val h = pmod(Dedup.md5Int(col("doc_id").cast("string")), lit(100L))
    val sp = when(h < testPct, "test")
      .when(h < testPct + valPct, "val").otherwise("train")
    labels
      .withColumn("split", sp)
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_docs"),
        array_sort(collect_set("split")).as("_sps"))
      .withColumn("n_splits", size(col("_sps")))
      .where(col("n_splits") > 1)
      .select(col("cluster_id"), col("n_docs"), col("n_splits"),
        concat_ws(",", col("_sps")).as("splits"))
  }

  /** Token-budget selection — the "best N tokens" curation step:
    * rank every doc by (quality_score desc, doc_id), walk the
    * ranking accumulating BPE-ish token counts, and keep each doc
    * whose running total BEFORE it is still under the budget (the
    * greedy prefix; the last kept doc may overshoot, matching how
    * budgeted data selection is actually run). Emits every doc with
    * its global rank, inclusive cumulative tokens, and the selected
    * flag, so the survivor set AND the cut line are both auditable.
    *
    * Scale: quality and token count evaluate in ONE map stage over
    * the corpus (no self-join of derived frames); the global rank
    * and the global running token sum both use the two-phase shard
    * pattern — approx quality bounds broadcast to balance shards,
    * shard-local windows for rank and cumsum, and per-shard prefix
    * offsets (rows AND tokens) broadcast back. Nothing global-sorts
    * or global-windows the corpus; bounds are approximate but the
    * rank and cumsum stay exact whatever the cut points. */
  def budgetSelect(docs: DataFrame, budgetTokens: Long,
                   rankShards: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(
      col("doc_id"),
      TextAnalysis.qualityScoreCol(col("text")).as("quality_score"),
      TextAnalysis.bpeTokensCol(col("text")).as("n_tokens"))
    // rank key ascends, so shard on the NEGATED quality score
    val qs = (1 until rankShards).map(_.toDouble / rankShards)
    val bounds = base.agg(
      approx_percentile(-col("quality_score"), typedlit(qs), lit(1000))
        .as("_bs"))
    val sharded = base.crossJoin(broadcast(bounds))
      .withColumn("_key", -col("quality_score"))
      .withColumn("_rshard", size(filter(col("_bs"), b => b < col("_key"))))
      .drop("_bs")
    val wLocal = Window.partitionBy("_rshard").orderBy("_key", "doc_id")
    val wCum = wLocal.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrefix = Window.orderBy("_rshard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sharded.groupBy("_rshard")
      .agg(count(lit(1)).as("_cnt"), sum("n_tokens").as("_tok"))
      .withColumn("_roff", coalesce(sum("_cnt").over(wPrefix), lit(0L)))
      .withColumn("_toff", coalesce(sum("_tok").over(wPrefix), lit(0L)))
      .select("_rshard", "_roff", "_toff")
    sharded.join(broadcast(offsets), Seq("_rshard"))
      .withColumn("rank", col("_roff") + row_number().over(wLocal))
      .withColumn("cum_tokens", col("_toff") + sum("n_tokens").over(wCum))
      .withColumn("selected",
        (col("cum_tokens") - col("n_tokens") < budgetTokens).cast("int"))
      .select("doc_id", "quality_score", "n_tokens", "rank",
        "cum_tokens", "selected")
  }

  /** CCNet-style perplexity partition (Wenzek et al. 2020, "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl
    * Data" §4.3): per LANGUAGE, split documents into equal
    * head/middle/tail terciles by language-model perplexity — head =
    * the lowest-perplexity (most Wikipedia-like) third, the slice
    * CCNet keeps by default; tail = the noisiest third. The LM is
    * the engine's bigram model ([[TextAnalysis.bigramCrossEntropy]],
    * the conditional form closest to CCNet's KenLM); its per-doc ppl
    * is already rounded, so both engines tercile IDENTICAL keys.
    * Tercile index = `(3·rank) div n` on the 0-based (ppl, doc_id)
    * rank within the language — integer arithmetic end to end, and
    * for k=3 it reproduces SQL ntile's remainder placement exactly.
    * Documents under two words have no transitions to score and drop
    * out, as in [[TextAnalysis.bigramCrossEntropy]].
    *
    * Scale: the LM scoring is the existing aggregate-join-aggregate
    * shape; the per-language rank is the two-phase shard pattern of
    * [[budgetSelect]] with `lang` prepended to every key — approx
    * per-language ppl bounds broadcast to balance shards,
    * (lang, shard)-local windows, per-shard prefix offsets broadcast
    * back (the offset frame is langs × shards rows). No language —
    * let alone the corpus — is ever one window partition. */
  def ccnetBuckets(docs: DataFrame, rankShards: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ppl = TextAnalysis.bigramCrossEntropy(docs)
      .select(col("doc_id"), col("ppl"))
    // bounds + sharded both read `base` (the full bigram-LM scoring
    // join), and offsets + the final join both read `sharded`:
    // checkpoint each once — without this the LM scoring subplan
    // evaluates up to four times
    val base = docs.select(col("doc_id"), col("lang")).join(ppl, "doc_id")
      .materialize(false)
    val qs = (1 until rankShards).map(_.toDouble / rankShards)
    val bounds = base.groupBy("lang").agg(
      approx_percentile(col("ppl"), typedlit(qs), lit(1000)).as("_bs"),
      count(lit(1)).as("_n"))
    val sharded = base.join(broadcast(bounds), "lang")
      .withColumn("_rshard", size(filter(col("_bs"), b => b < col("ppl"))))
      .drop("_bs")
      .materialize(false)
    val wLocal = Window.partitionBy("lang", "_rshard").orderBy("ppl", "doc_id")
    val wPrefix = Window.partitionBy("lang").orderBy("_rshard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sharded.groupBy("lang", "_rshard")
      .agg(count(lit(1)).as("_cnt"))
      .withColumn("_offset", coalesce(sum("_cnt").over(wPrefix), lit(0L)))
      .drop("_cnt")
    sharded.join(broadcast(offsets), Seq("lang", "_rshard"))
      .withColumn("_rank",
        col("_offset") + row_number().over(wLocal) - 1)
      .withColumn("_bucket", expr("(_rank * 3) div _n").cast("int"))
      .select(col("doc_id"), col("lang"), col("ppl"),
        when(col("_bucket") === 0, "head")
          .when(col("_bucket") === 1, "middle")
          .otherwise("tail").as("ccnet_bucket"))
  }

  /** Population Stability Index drift card — THE standard
    * distribution-shift monitor of production ML (PSI =
    * Σ_b (p_b − q_b)·ln(p_b/q_b) over score buckets; rule-of-thumb
    * alarms at 0.1/0.25): per source, the quality-score distribution
    * of the SECOND arrival half compared against the first, catching
    * shape changes [[qualityDrift]]'s mean-tracking misses (a feed
    * whose mean holds while its tails fatten). Buckets are
    * equal-width over the score's [0,1] range (the per-doc score is
    * pre-rounded, so bucket assignment is identical cross-engine);
    * shares are Laplace-smoothed ((n_b+1)/(N+B)) over the DENSE
    * bucket grid so empty bins stay finite and deterministic. The
    * per-bucket term and the per-source total emit together — the
    * card is auditable down to which score band moved.
    *
    * Scale: scoring and half/bucket assignment evaluate in ONE map
    * stage over the corpus (the doc_id bounds arrive as a one-row
    * broadcast), into a sources×buckets hash aggregate; every window
    * after that is over the bounded aggregated grid. */
  def psiDrift(docs: DataFrame, buckets: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bounds = docs.agg(min("doc_id").as("_lo"), max("doc_id").as("_hi"))
    val scored = docs.crossJoin(broadcast(bounds))
      .select(col("source"),
        least(expr("((doc_id - _lo) * 2) div (_hi - _lo + 1)"), lit(1L))
          .as("half"),
        least(floor(TextAnalysis.qualityScoreCol(col("text")) * buckets)
          .cast("long"), lit(buckets - 1L)).as("bucket"))
    val counts = scored.groupBy("source", "bucket")
      .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).as("n_ref"),
        sum(when(col("half") === 1, 1L).otherwise(0L)).as("n_cur"))
    val g = counts.select("source").distinct()
      .select(col("source"),
        explode(sequence(lit(0L), lit(buckets - 1L))).as("bucket"))
      .join(counts, Seq("source", "bucket"), "left")
      .na.fill(0L, Seq("n_ref", "n_cur"))
    val wSrc = Window.partitionBy("source") // sources×buckets rows
    val p = (col("n_ref") + 1).cast("double") /
      (sum("n_ref").over(wSrc) + buckets)
    val q = (col("n_cur") + 1).cast("double") /
      (sum("n_cur").over(wSrc) + buckets)
    g.withColumn("_t", (p - q) * log(p / q))
      .select(col("source"), col("bucket"), col("n_ref"), col("n_cur"),
        round(p, 6).as("ref_share"), round(q, 6).as("cur_share"),
        round(col("_t"), 6).as("psi_term"),
        round(sum("_t").over(wSrc), 6).as("psi"))
  }

  /** UniMax language allocation (Chung et al. 2023, "UniMax: Fairer
    * and More Effective Language Sampling for Large-Scale
    * Multilingual Pretraining"): given a token budget B and an
    * epoch cap N, visit languages in ASCENDING corpus-size order;
    * each takes min(its full N epochs, an equal share of whatever
    * budget remains) — small languages are fully served up to N
    * epochs, the leftover spreads uniformly over the big ones. The
    * standard water-filling identity makes the capped set a PREFIX
    * of the ascending order, so the sequential loop collapses to
    * prefix sums: language at rank i (of n) is capped iff
    * `cᵢ·N·(n−i+1) ≤ B − N·Σ_{j<i} cⱼ` held at every rank ≤ i
    * (a running min keeps the prefix contiguous); uncapped quota =
    * `(B − N·S_t) div (n−t)` with t capped languages holding S_t
    * tokens. Integer arithmetic end to end — cross-multiplied
    * comparisons, floor-div shares — so two engines can never
    * disagree on a boundary language. Every uncapped language gets
    * the IDENTICAL floor share (a sequential loop would dribble the
    * < n−t remainder tokens onto later languages; dropping that
    * redistribution keeps the op order-free and costs under one
    * token per language).
    *
    * Scale: token counting is a map stage into a languages-sized
    * hash aggregate; every window after that is over the bounded
    * per-language table (constant partition key pins the frame —
    * languages number in the hundreds, never corpus-scale). */
  def unimaxAllocate(docs: DataFrame, budgetTokens: Long,
                     epochCap: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cap = epochCap.toLong
    val perLang = docs.select(col("lang"),
      size(org.apache.spark.sql.functions.split(lower(col("text")), "\\s+"))
        .cast("long").as("tok"))
      .groupBy("lang").agg(sum("tok").as("tokens"))
    val wRank = Window.partitionBy(lit(1)).orderBy("tokens", "lang")
    val wPrefix = wRank.rowsBetween(Window.unboundedPreceding, -1)
    val wRunMin = wRank.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val wAll = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    perLang
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .withColumn("_n", count(lit(1)).over(wAll))
      .withColumn("_prefix", coalesce(sum("tokens").over(wPrefix), lit(0L)))
      .withColumn("_cond",
        (col("tokens") * cap * (col("_n") - col("rank") + 1) <=
          lit(budgetTokens) - lit(cap) * col("_prefix")).cast("int"))
      .withColumn("capped", min("_cond").over(wRunMin))
      .withColumn("_t", sum("capped").over(wAll))
      .withColumn("_st", sum(col("capped") * col("tokens")).over(wAll))
      .withColumn("quota_tokens",
        when(col("capped") === 1, col("tokens") * cap)
          .otherwise(expr(s"(${budgetTokens}L - ${cap}L * _st)" +
            " div greatest(_n - _t, 1L)")))
      .select(col("lang"), col("tokens"), col("rank"), col("capped"),
        col("quota_tokens"),
        round(col("quota_tokens").cast("double") / col("tokens"), 6)
          .as("epochs"),
        round(col("quota_tokens").cast("double") / budgetTokens, 6)
          .as("budget_share"))
  }

  /** The dataset-card summary of [[ccnetBuckets]] — per (language,
    * tercile): document count and the perplexity range/mean, the
    * table CCNet publishes per language to justify its head cutoff
    * (and the sanity check that terciles are equal-sized ±1).
    *
    * Scale: a languages×3-row aggregation over the bucket frame. */
  def ccnetStats(docs: DataFrame): DataFrame =
    ccnetBuckets(docs)
      .groupBy("lang", "ccnet_bucket")
      .agg(count(lit(1)).as("n_docs"),
        round(min("ppl"), 6).as("min_ppl"),
        round(avg("ppl"), 6).as("mean_ppl"),
        round(max("ppl"), 6).as("max_ppl"))
}
