package graft.pipeline

import graft.Materialize.MatOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions.dotNative

/** Similarity search over an embedding column (`array<float>`).
  *
  * Dot products use the native codegen [[graft.functions.DotProduct]]
  * expression (float elements widened to double per element — exact,
  * matching the oracle's `::DOUBLE[]` semantics). Norms are computed
  * once per vector *before* any join, so an N·M scoring join does
  * N·M dots, not 3·N·M.
  *
  * Scale posture: brute-force top-k is the small-N oracle / recall
  * baseline; the production path is multi-table LSH bucketing
  * (random-hyperplane signs) where candidate joins happen within
  * buckets only. On a cluster the corpus would be written
  * bucketed-by(bucket) so repeated ANN queries co-locate without a
  * shuffle.
  */
object Similarity {

  /** Σ a_i·b_i — composable HOF form, kept as the readable reference
    * implementation; hot paths use [[dotNative]]. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dotNative(a, a))

  def cosine(a: Column, b: Column): Column =
    dotNative(a, b) / (norm(a) * norm(b))

  /** (id, embedding, norm) projection — norms precomputed pre-join. */
  private def withNorm(df: DataFrame, idAs: String, embAs: String,
                       normAs: String): DataFrame =
    df.select(col("vec_id").as(idAs), col("embedding").as(embAs),
      sqrt(dotNative(col("embedding"), col("embedding"))).as(normAs))

  private def scoreCos(embA: String, embB: String, normA: String,
                       normB: String): Column =
    dotNative(col(embA), col(embB)) / (col(normA) * col(normB))

  /** Brute-force cosine top-k neighbors for a query set: cross-join
    * queries × corpus (queries side is tiny → broadcast), rank per
    * query. */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = withNorm(queries, "q_id", "q_emb", "q_norm")
    val c = withNorm(corpus, "c_id", "c_emb", "c_norm")
    val scored = c.crossJoin(broadcast(q))
      .where(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        scoreCos("q_emb", "c_emb", "q_norm", "c_norm").as("cos"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("q_id"), col("c_id"), round(col("cos"), 6).as("cos_v"),
        col("rk").cast("long").as("rk"))
  }

  /** Retrieval-quality card against label ground truth — the eval
    * loop that closes the ANN family (MTEB-style protocol): each
    * query vector's relevant set is every OTHER vector sharing its
    * `label`; the dense top-k is scored as precision@k, MRR and
    * recall@k, averaged over queries (queries whose label has no
    * other member are excluded from recall, standard practice). Swap
    * any ANN variant emitting (q_id, c_id, rk) for [[cosineTopK]] to
    * measure ITS quality with the same card.
    *
    * Determinism: per-query metrics round before the mean (the
    * corpus_doremi convention) so cross-engine summation-order ulps
    * can't reach the rounded card.
    *
    * Scale: two broadcast-sized label joins on the q×k neighbor
    * frame + one per-label count; the heavy lifting stays in the
    * (already scale-audited) neighbor stage. */
  def retrievalEval(emb: DataFrame, k: Int = 10,
                    nQueries: Int = 10): DataFrame = {
    val labels = emb.select(col("vec_id"), col("label"))
    val top = cosineTopK(emb, emb.where(col("vec_id") < nQueries), k)
    val withRel = top
      .join(labels.select(col("vec_id").as("q_id"),
        col("label").as("q_lab")), "q_id")
      .join(labels.select(col("vec_id").as("c_id"),
        col("label").as("c_lab")), "c_id")
      .withColumn("rel", (col("q_lab") === col("c_lab")).cast("int"))
    val labCounts = labels.groupBy("label")
      .agg(count(lit(1)).as("n_lab"))
      .select(col("label").as("q_lab"), col("n_lab"))
    val perQ = withRel.groupBy("q_id", "q_lab")
      .agg(sum("rel").as("rel_found"),
        min(when(col("rel") === 1, col("rk"))).as("first_rel"))
      .join(labCounts, "q_lab")
      .withColumn("total_rel", col("n_lab") - 1)
    perQ.agg(
      count(lit(1)).as("n_queries"),
      round(avg(round(col("rel_found").cast("double") / k, 6)), 6)
        .as("p_at_k"),
      round(avg(round(coalesce(lit(1.0) / col("first_rel"), lit(0.0)), 6)),
        6).as("mrr"),
      round(avg(round(when(col("total_rel") > 0,
        least(col("rel_found"), col("total_rel")).cast("double") /
          col("total_rel")), 6)), 6).as("recall_at_k"))
  }

  /** Reciprocal-rank fusion of sparse (BM25 more-like-this) and dense
    * (cosine top-k) retrieval — the standard hybrid-retrieval merge
    * (Cormack et al. 2009, the default fusion in every RAG stack):
    *
    *   rrf(d) = Σ_r 1/(kq + rank_r(d))
    *
    * over the two rankings, docs absent from a list contribute 0 for
    * it. The corpus rows are linked to their embedding rows by id
    * (doc_id = vec_id — the documents table's embedding column).
    *
    * Determinism: ranks are integers and the fused score is a
    * two-term sum in fixed written order — bit-identical across
    * engines; ties break by candidate id.
    *
    * Scale: both input rankings are already scale-audited operators
    * ([[TextAnalysis.moreLikeThis]]'s posting join, [[cosineTopK]] —
    * swap in any ANN variant emitting (q_id, c_id, rk) for the dense
    * leg); the fusion itself is a full-outer join of two q×topK-row
    * frames and a rank window over ≤2·topK rows per query. */
  def rrfFusion(docs: DataFrame, emb: DataFrame, nQueries: Int = 10,
                kq: Int = 60, topK: Int = 20, out: Int = 10): DataFrame = {
    val sparse = TextAnalysis
      .moreLikeThis(docs, col("doc_id") < nQueries, topK)
      .select(col("q_id"), col("c_id"), col("s_rk"))
    val dense = cosineTopK(emb, emb.where(col("vec_id") < nQueries), topK)
      .select(col("q_id"), col("c_id"), col("rk").as("d_rk"))
    val fused = sparse.join(dense, Seq("q_id", "c_id"), "full_outer")
      .select(col("q_id"), col("c_id"),
        coalesce(col("s_rk"), lit(0L)).as("s_rk"),
        coalesce(col("d_rk"), lit(0L)).as("d_rk"),
        (coalesce(lit(1.0) / (lit(kq) + col("s_rk")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kq) + col("d_rk")), lit(0.0))).as("rrf"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("rrf").desc, col("c_id").asc)
    fused.withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= out)
      .select(col("q_id"), col("c_id"), col("s_rk"), col("d_rk"),
        round(col("rrf"), 6).as("rrf_v"), col("rk"))
      .orderBy("q_id", "rk")
  }

  /** Margin-based parallel-pair mining (Artetxe & Schwenk 2019 —
    * the LASER/CCMatrix bitext-mining criterion): a candidate pair
    * (x, y) scores by its cosine RELATIVE to each side's local
    * neighborhood density,
    *
    *   margin(x,y) = cos(x,y) / ((avgₖNN_B(x) + avgₖNN_A(y)) / 2)
    *
    * (the "ratio" margin), which suppresses hub vectors that are
    * near everything — raw-cosine thresholds mine hubs, margins
    * don't. Sides here are two label classes of the embedding
    * corpus (the bitext analogue: two languages' sentence
    * embeddings). For each of the `nQ` lowest-id side-A probes:
    * its best side-B candidate, the margin factorization, and the
    * accept flag (margin > threshold, 1.05 ≈ the CCMatrix working
    * point). Denominators average in integer MICRO-UNITS
    * (sum(cos6)/count, the [[marginMiningLsh]]/corpus_el2n lesson):
    * avg() of rounded doubles lands on exact .5 micro midpoints the
    * engines' round() implementations split, and the accept flag
    * derives from the same unrounded margin expression the oracle
    * computes.
    *
    * Scale: the probe pattern of the other retrieval cards
    * (probe × corpus linear scans, broadcast probes). FULL-corpus
    * mining at 100 TB swaps the brute-force neighbor lists for
    * [[lshAnn]]/[[ivfAnn]] candidate generation and keeps this
    * margin algebra over the candidate pairs. */
  def marginMining(emb: DataFrame, nQ: Int = 10, k: Int = 4,
                   threshold: Double = 1.05,
                   labelA: Int = 0, labelB: Int = 1): DataFrame = {
    val a = emb.where(col("label") === labelA)
    val b = emb.where(col("label") === labelB)
    val probes = a.orderBy("vec_id").limit(nQ)
    val cos6 = round(col("cos_v") * 1000000, 0).cast("long")
    val fwd = cosineTopK(b, probes, k).withColumn("cos6", cos6)
    val avgFwd = fwd.groupBy("q_id")
      .agg((sum("cos6").cast("double") / count(lit(1))).as("f6"))
    val best = fwd.where(col("rk") === 1)
      .select(col("q_id"), col("c_id"), col("cos6"))
    val ys = b.join(
      broadcast(best.select(col("c_id").as("vec_id")).distinct()), "vec_id")
    val avgBwd = cosineTopK(a, ys, k).withColumn("cos6", cos6)
      .groupBy("q_id")
      .agg((sum("cos6").cast("double") / count(lit(1))).as("b6"))
      .withColumnRenamed("q_id", "c_id")
    val margin = col("cos6") / ((col("f6") + col("b6")) / 2)
    best.join(broadcast(avgFwd), "q_id").join(broadcast(avgBwd), "c_id")
      .select(col("q_id"), col("c_id"),
        (col("cos6") / 1000000.0).as("cos_v"),
        (col("f6") / 1000000.0).as("avg_fwd"),
        (col("b6") / 1000000.0).as("avg_bwd"),
        round(margin, 6).as("margin"),
        (margin > threshold).as("accepted"))
      .orderBy("q_id")
  }

  /** Full-corpus margin mining over LSH candidates — the scale path
    * [[marginMining]] documents, made real: EVERY side-A vector is a
    * source (not a probe subset), candidates are cross-side pairs
    * sharing any of `tables` hyperplane bucketings (the lshAnn
    * blocking), and both margin denominators are top-k averages over
    * the CANDIDATE sets — so cost is linear in candidate pairs,
    * never |A|×|B|. Candidate top-k is a lower bound on true top-k;
    * that approximation is precisely CCMatrix's production trade
    * (FAISS ANN neighborhoods, Schwenk et al. 2021 §3).
    *
    * Scale: the banded-bucket equi-join generates candidates (hot
    * buckets stay bounded by the density-derived plane count), one
    * exact re-score per candidate pair, two partitioned rank windows
    * (per source, per candidate) and two skinny averages joined
    * back. */
  def marginMiningLsh(emb: DataFrame, k: Int = 4, threshold: Double = 1.05,
                      tables: Int = 8, planes: Int = 4,
                      labelA: Int = 0, labelB: Int = 1): DataFrame = {
    val dim = 64
    val a = withNorm(emb.where(col("label") === labelA),
      "a_id", "a_emb", "a_norm")
    val b = withNorm(emb.where(col("label") === labelB),
      "b_id", "b_emb", "b_norm")
    def banded(df: DataFrame, id: String, embC: String) =
      (0 until tables).map { t =>
        df.select(col(id), lit(t).as("tbl"),
          lshBucket(col(embC), dim, planes, t).as("bucket"))
      }.reduce(_ unionByName _)
    val cand = banded(a, "a_id", "a_emb")
      .join(banded(b, "b_id", "b_emb"), Seq("tbl", "bucket"))
      .select("a_id", "b_id").distinct()
    val scored = cand.join(a, "a_id").join(b, "b_id")
      .select(col("a_id"), col("b_id"),
        scoreCos("a_emb", "b_emb", "a_norm", "b_norm").as("cos"))
    val wf = Window.partitionBy("a_id")
      .orderBy(col("cos").desc, col("b_id").asc)
    val wb = Window.partitionBy("b_id")
      .orderBy(col("cos").desc, col("a_id").asc)
    // integer micro-units for the denominators: an avg of rounded
    // doubles lands on exact .5 micro midpoints the engines' round()
    // implementations split (same lesson as corpus_el2n)
    val ranked = scored
      .withColumn("cos6", round(col("cos") * 1000000, 0).cast("long"))
      .withColumn("rk_f", row_number().over(wf))
      .withColumn("rk_b", row_number().over(wb))
    val favg = ranked.where(col("rk_f") <= k).groupBy("a_id")
      .agg((sum("cos6").cast("double") / count(lit(1))).as("f6"))
    val bavg = ranked.where(col("rk_b") <= k).groupBy("b_id")
      .agg((sum("cos6").cast("double") / count(lit(1))).as("b6"))
    val best = ranked.where(col("rk_f") === 1)
      .select(col("a_id"), col("b_id"), col("cos6"))
    val margin = col("cos6") / ((col("f6") + col("b6")) / 2)
    best.join(favg, "a_id").join(bavg, "b_id")
      .select(col("a_id"), col("b_id"),
        (col("cos6") / 1000000.0).as("cos_v"),
        (col("f6") / 1000000.0).as("avg_fwd"),
        (col("b6") / 1000000.0).as("avg_bwd"),
        round(margin, 6).as("margin"),
        (margin > threshold).as("accepted"))
      .orderBy("a_id")
  }

  /** c-TF-IDF cluster keywords (Grootendorst 2022, BERTopic §3.2 —
    * the topic-labeling step every embedding-cluster pipeline runs
    * after clustering): treat each cluster as ONE meta-document and
    * weight terms by
    *
    *   W(t,c) = tf(t,c)/words(c) · ln(1 + A / f(t))
    *
    * with A = mean words per cluster and f(t) the term's corpus
    * count — a class-based tf-idf whose top terms ARE the cluster's
    * human-readable label. Clusters here are the embedding label
    * classes (doc_id = vec_id links the tables); ranks order by the
    * ROUNDED weight (term asc tiebreak) so ulp-divergent products
    * can't flip ranks across engines.
    *
    * Scale: one doc⋈label join, one explode into a (cluster, term)
    * hash count, two skinny re-aggregations (per-cluster totals,
    * per-term corpus counts — broadcast back), and a per-cluster
    * rank window over the cluster's term census (partitioned by
    * cluster; no global window). */
  def clusterKeywords(docs: DataFrame, emb: DataFrame,
                      topN: Int = 5): DataFrame = {
    val labeled = docs.select(col("doc_id"), col("text"))
      .join(emb.select(col("vec_id").as("doc_id"), col("label")), "doc_id")
    val tc = labeled
      .select(col("label"), explode(
        org.apache.spark.sql.functions.split(lower(col("text")), "\\s+"))
        .as("t"))
      .groupBy("label", "t").agg(count(lit(1)).as("tf"))
    val perC = tc.groupBy("label").agg(sum("tf").as("words_c"))
    val perT = tc.groupBy("t").agg(sum("tf").as("f_t"))
    val glob = perC.agg(
      (sum("words_c").cast("double") / count(lit(1))).as("a_words"))
    val w = col("tf").cast("double") / col("words_c").cast("double") *
      log(lit(1.0) + col("a_words") / col("f_t").cast("double"))
    val scored = tc.join(broadcast(perC), "label")
      .join(perT, "t").crossJoin(broadcast(glob))
      .select(col("label"), col("t"), col("tf"), col("f_t"),
        round(w, 9).as("w"))
    val rk = Window.partitionBy("label")
      .orderBy(col("w").desc, col("t").asc)
    scored.withColumn("rk", row_number().over(rk).cast("long"))
      .where(col("rk") <= topN)
      .orderBy("label", "rk")
  }

  /** kNN label classification — classification-by-retrieval over an
    * embedding corpus (the standard label-propagation / probe step
    * in embedding pipelines): each query's top-k cosine neighbors
    * vote with their `label`; majority wins, ties break to the
    * lowest label id (deterministic, oracle-replayable). Swap
    * [[cosineTopK]] for any ANN variant emitting (q_id, c_id) to
    * trade exactness for scale — the vote is the same plan.
    *
    * Scale: the vote is a groupBy over q×k rows (tiny) and the
    * per-query rank windows over ≤ distinct-label rows — all the
    * heavy lifting lives in the (already scale-audited) neighbor
    * stage. */
  def knnClassify(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val nn = cosineTopK(corpus, queries, k)
    val votes = nn
      .join(corpus.select(col("vec_id").as("c_id"), col("label")), "c_id")
      .groupBy("q_id", "label").agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("votes").desc, col("label").asc)
    votes.withColumn("_vrk", row_number().over(w))
      .where(col("_vrk") === 1)
      .select(col("q_id"), col("label").as("pred_label"), col("votes"))
  }

  /** Hard-negative mining — the retrieval step of contrastive /
    * triplet-loss training-data pipelines: for each query, the top-k
    * most-cosine-similar corpus vectors whose `label` DIFFERS from
    * the query's (near in embedding space, wrong class — the
    * negatives that actually move an embedding model). Composition:
    * neighbor scoring ∘ label anti-filter ∘ per-query top-k; at
    * corpus scale swap the brute scorer for [[lshAnn]]/[[ivfAnn]]
    * candidate pairs — the filter and rank stages are the same plan.
    *
    * Scale: queries broadcast (bounded probe batch, same contract as
    * [[cosineTopK]]); the label filter runs BEFORE the rank window,
    * so dense same-label neighborhoods never enter the window input;
    * the window partitions by q_id — no global sort. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = withNorm(queries, "q_id", "q_emb", "q_norm")
      .join(queries.select(col("vec_id").as("q_id"),
        col("label").as("q_label")), "q_id")
    val c = withNorm(corpus, "c_id", "c_emb", "c_norm")
      .join(corpus.select(col("vec_id").as("c_id"),
        col("label").as("neg_label")), "c_id")
    val scored = c.crossJoin(broadcast(q))
      .where(col("q_id") =!= col("c_id") &&
        col("q_label") =!= col("neg_label"))
      .select(col("q_id"), col("c_id"), col("neg_label"),
        scoreCos("q_emb", "c_emb", "q_norm", "c_norm").as("cos"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("q_id"), col("c_id"), col("neg_label"),
        round(col("cos"), 6).as("cos_v"), col("rk").cast("long").as("rk"))
  }

  /** Dimension-truncation recall — the matryoshka / index-sizing
    * measurement: how much of the full-dimension top-k survives when
    * the index keeps only the first `dims` embedding components.
    * Emits (q_id, overlap, recall) where overlap = |topk_full ∩
    * topk_truncated| — the number every dim-reduction decision
    * (cheaper ANN index, matryoshka prefix, PQ subspace count) is
    * made against.
    *
    * Scale: two [[cosineTopK]] passes (each plan-audited: broadcast
    * queries, per-q_id window) + an equi-join of two q×k frames —
    * the comparison stage is negligible next to the scoring it
    * measures. */
  def dimRecall(corpus: DataFrame, queries: DataFrame, k: Int,
                dims: Int): DataFrame = {
    def truncate(df: DataFrame): DataFrame =
      df.withColumn("embedding", slice(col("embedding"), 1, dims))
    val full = cosineTopK(corpus, queries, k).select("q_id", "c_id")
    val trunc = cosineTopK(truncate(corpus), truncate(queries), k)
      .select(col("q_id"), col("c_id").as("_tc"))
    full.join(trunc,
        full("q_id") === trunc("q_id") && col("c_id") === col("_tc"), "left")
      .groupBy(full("q_id").as("q_id"))
      .agg(count(col("_tc")).as("overlap"))
      .select(col("q_id"), col("overlap"),
        round(col("overlap") / lit(k.toDouble), 6).as("recall"))
  }

  /** Random-projection (Johnson–Lindenstrauss) recall — the other
    * dimension-reduction measurement next to [[dimRecall]]'s
    * truncation: project every vector through a deterministic ±1
    * matrix (the dense-JL construction via [[rpWeights]] — NOT the
    * LSH [[hyperplanes]] generator, whose entries are a function of
    * (167·p + 177·i) mod 256 alone, making every row a translate of
    * one periodic byte sequence: harmless for bucket hashing,
    * ruinous as a projection basis — measured overlap@5 0.08 at
    * dOut=32 vs genuine JL behavior from the mixed generator) down
    * to `dOut` dims, and report per-query top-k overlap
    * between projected-space and full-space cosine rankings. The
    * 1/√dOut JL scale factor cancels inside cosine and is omitted.
    *
    * Scale: the projection is `dOut` codegen [[dotNative]] calls per
    * vector against literal weight arrays — one map stage, O(dOut)
    * expression nodes — and both rankings reuse the
    * broadcast-queries [[cosineTopK]]; nothing new shuffles. */
  def rpRecall(corpus: DataFrame, queries: DataFrame, k: Int,
               dimIn: Int, dOut: Int, seed: Long = 0L): DataFrame = {
    val planes = rpWeights(dimIn, dOut, seed)
    def project(df: DataFrame): DataFrame =
      df.withColumn("embedding", array(planes.map(w =>
        dotNative(col("embedding").cast("array<double>"), typedLit(w))): _*))
    val full = cosineTopK(corpus, queries, k).select("q_id", "c_id")
    val proj = cosineTopK(project(corpus), project(queries), k)
      .select(col("q_id"), col("c_id").as("_pc"))
    full.join(proj,
        full("q_id") === proj("q_id") && col("c_id") === col("_pc"), "left")
      .groupBy(full("q_id").as("q_id"))
      .agg(count(col("_pc")).as("overlap"))
      .select(col("q_id"), col("overlap"),
        round(col("overlap") / lit(k.toDouble), 6).as("recall"))
  }

  /** Cosine-geometry histogram — the corpus-shape card for an
    * embedding column: cosines of a deterministic adjacent-id pair
    * sample bucketed into 0.1-wide bins over [−1, 1]. A healthy
    * encoder spreads mass; a collapsed one (all cosines ≈ 1) or a
    * concentrated one (narrow band, the regime where top-k rankings
    * destabilize — see sim_rp_recall) is visible at a glance.
    * Binning uses the ROUNDED cosine so bin edges are
    * engine-stable; empty bins are omitted.
    *
    * Scale: the sample is one hash equi-join on vec_id (adjacent
    * ids), linear in the corpus — never an all-pairs product — and
    * the histogram is a ≤20-key aggregation. */
  def cosineHistogram(emb: DataFrame): DataFrame = {
    val a = withNorm(emb, "a_id", "a_emb", "a_norm")
    val b = withNorm(emb, "b_id", "b_emb", "b_norm")
      .withColumn("_join_id", col("b_id") - 1)
    val cosR = round(
      scoreCos("a_emb", "b_emb", "a_norm", "b_norm"), 6)
    a.join(b, col("a_id") === col("_join_id"))
      .select(cosR.as("c"))
      .withColumn("bin",
        least(floor((col("c") + 1.0) * 10), lit(19.0)).cast("long"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_pairs"))
      .select(col("bin"),
        round(col("bin") / 10.0 - 1.0, 1).as("bin_lo"), col("n_pairs"))
      .orderBy("bin")
  }

  /** Embedding drift between two corpus halves — encoder-version /
    * distribution-shift detection: per dimension, the mean in the
    * first half of the id range vs the second, the delta, and a
    * z-like score (delta over the pooled std). A re-encoded or
    * drifted feed shows coordinated per-dim shifts long before
    * downstream recall drops. Split = id midpoint (arrival order),
    * the same convention as the corpus drift cards.
    *
    * Scale: same partial-aggregating posexplode as [[embedStats]] —
    * the shuffle carries ≤dim rows per task. */
  def embedDrift(emb: DataFrame): DataFrame = {
    val mid = emb.agg(((min("vec_id") + max("vec_id")) / 2).as("_mid"))
    emb.crossJoin(broadcast(mid))
      .select((col("vec_id") <= col("_mid")).as("_first"),
        posexplode(col("embedding").cast("array<double>"))
          .as(Seq("pos", "v")))
      .groupBy((col("pos") + 1).cast("long").as("dim"))
      .agg(
        round(avg(when(col("_first"), col("v"))), 6).as("mean_a"),
        round(avg(when(!col("_first"), col("v"))), 6).as("mean_b"),
        stddev_pop(col("v")).as("_sd"))
      .select(col("dim"), col("mean_a"), col("mean_b"),
        round(col("mean_b") - col("mean_a"), 6).as("delta"),
        round(when(col("_sd") === 0d, lit(null))
          .otherwise((col("mean_b") - col("mean_a")) / col("_sd")), 6)
          .as("drift_z"))
      .orderBy("dim")
  }

  /** Label-balance card — class skew over a labeled embedding corpus
    * (per label: count, share, and the share×|labels| imbalance
    * ratio vs uniform). Skew here silently biases every downstream
    * consumer — kNN votes, centroid classifiers, cluster purity,
    * hard-negative mining — so the card is read before any of them.
    *
    * Scale: one hash aggregation to ≤|labels| rows + a one-row
    * broadcast total. */
  def labelBalance(emb: DataFrame): DataFrame = {
    val counts = emb.groupBy("label").agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum("n").as("_tot"), count(lit(1)).as("_k"))
    counts.crossJoin(broadcast(tot))
      .select(col("label"), col("n"),
        round(col("n") / col("_tot"), 6).as("share"),
        round(col("n") * col("_k") / col("_tot"), 6).as("vs_uniform"))
      .orderBy("label")
  }

  /** Per-vector norm outliers — the row-level companion to
    * [[embedStats]]: L2 norm, corpus z-score, and the |z| > zMax
    * flag. Truncated inputs, failed encodes (near-zero norm) and
    * un-normalized mixtures show up here before they poison
    * similarity search. Flag compares the ROUNDED z-score so the
    * boundary is engine-stable.
    *
    * Scale: one codegen map stage for norms, a one-row broadcast of
    * (mean, std), and a second map stage — nothing shuffles the
    * vector payload. */
  def normOutliers(emb: DataFrame, zMax: Double = 2.0): DataFrame = {
    val embD = col("embedding").cast("array<double>")
    val base = emb.select(col("vec_id"),
      sqrt(dotNative(embD, embD)).as("_norm"))
    val stats = base.agg(avg("_norm").as("_m"), stddev_pop(col("_norm")).as("_s"))
    base.crossJoin(broadcast(stats))
      .withColumn("z_score", round((col("_norm") - col("_m")) / col("_s"), 6))
      .select(col("vec_id"), round(col("_norm"), 6).as("norm"),
        col("z_score"),
        (abs(col("z_score")) > zMax).cast("int").as("is_outlier"))
  }

  /** Per-dimension embedding QA stats — the dataset-card check run
    * before trusting an embedding column: mean/std/min/max per
    * coordinate surfaces dead dims (std 0), un-centered encoders
    * (|mean| ≫ 0) and clipped or exploding coordinates, any of
    * which silently degrade every cosine op downstream. `dim` is
    * 1-based to match SQL list indexing.
    *
    * Scale: the posexplode is map-side and hash aggregation
    * pre-combines per partition, so the shuffle carries at most
    * `dim` rows per task regardless of corpus size — the explode
    * never reaches the exchange. */
  def embedStats(emb: DataFrame): DataFrame =
    emb.select(posexplode(col("embedding").cast("array<double>"))
        .as(Seq("pos", "v")))
      .groupBy((col("pos") + 1).cast("long").as("dim"))
      .agg(
        round(avg("v"), 6).as("mean_v"),
        round(stddev_pop(col("v")), 6).as("std_v"),
        round(min("v"), 6).as("min_v"),
        round(max("v"), 6).as("max_v"))

  /** Deterministic ±1 JL projection entries: splitmix64-finalized
    * mix of (plane, dim, seed), so entries are pairwise-independent
    * for practical purposes (unlike [[hyperplanes]], see
    * [[rpRecall]]). No stored model — the oracle embeds the
    * regenerated rows as literal arrays. */
  def rpWeights(dim: Int, planes: Int, seed: Long): Seq[Seq[Double]] =
    (0 until planes).map { p =>
      (0 until dim).map { i =>
        var z = seed + p * 0x9E3779B97F4A7C15L + i * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z ^= z >>> 31
        if ((z & 1L) == 0L) 1.0 else -1.0
      }
    }

  /** Deterministic ±1 random-hyperplane weights for a (table-)seed —
    * integer mixing of (plane, dim, seed); no stored model, so the
    * DuckDB oracle can regenerate the identical planes. */
  def hyperplanes(dim: Int, planes: Int, seed: Long): Seq[Seq[Double]] =
    (0 until planes).map { p =>
      (0 until dim).map { i =>
        if (((p * 1315423911L + i * 2654435761L + seed * 97531L) >>> 7) % 2 == 0)
          1.0 else -1.0
      }
    }

  /** Random-hyperplane LSH bucket id: sign pattern of the `planes`
    * projections. Each projection is ONE codegen [[dotNative]]
    * against a *literal weight array* — the plan carries
    * planes·dim doubles as data, not planes·dim expression nodes.
    * (The previous unrolled form produced multi-MiB task binaries at
    * dim=64 and exploded at realistic dims; this form is O(planes)
    * expression nodes and works unchanged at dim=768+.) */
  def lshBucket(emb: Column, dim: Int, planes: Int, seed: Long = 0L): Column = {
    val embD = emb.cast("array<double>")
    hyperplanes(dim, planes, seed).zipWithIndex.map { case (w, p) =>
      when(dotNative(embD, typedLit(w)) >= 0, lit(1)).otherwise(lit(0)) * lit(1 << p)
    }.reduce(_ + _)
  }

  /** Density-derived hyperplane count: explicit `planes > 0` wins;
    * otherwise target ~32 vectors per bucket per table with a floor
    * of 4 planes (the floor is what the sf0.01 oracle gate — and
    * every corpus below ~512 vectors — resolves to). The count() is
    * one bounded job over the vector table; at 100 TB the corpus
    * row count is a catalog statistic. */
  private def derivePlanes(planes: Int, corpus: DataFrame): Int =
    if (planes > 0) planes
    else {
      val n = corpus.count()
      math.max(4,
        math.ceil(math.log((n / 32.0).max(1.0)) / math.log(2.0)).toInt)
    }

  /** Multi-table LSH ANN: `tables` independent bucketings (fewer
    * planes each → wider buckets); candidates = docs sharing any
    * table's bucket with the query; exact cosine re-rank on the
    * candidate set only. Recall rises with tables, cost with
    * 1/2^planes — the classic tradeoff; recall vs. cosineTopK is
    * asserted in the spec.
    *
    * Scale: candidate generation is `tables` equi-joins on (table,
    * bucket) — never all-pairs; at 100 TB the corpus side would be
    * written bucketed-by(bucket) so each table's probe is a
    * shuffle-free bucket join. */
  def lshAnn(corpus: DataFrame, queries: DataFrame, k: Int,
             dim: Int = 64, planes: Int = 4, tables: Int = 8): DataFrame = {
    val qb = (0 until tables).map { t =>
      queries.select(col("vec_id").as("q_id"), lit(t).as("tbl"),
        lshBucket(col("embedding"), dim, planes, t).as("bucket"))
    }.reduce(_ unionByName _)
    val cb = (0 until tables).map { t =>
      corpus.select(col("vec_id").as("c_id"), lit(t).as("tbl"),
        lshBucket(col("embedding"), dim, planes, t).as("bucket"))
    }.reduce(_ unionByName _)
    val cands = cb.join(qb, Seq("tbl", "bucket"))
      .where(col("q_id") =!= col("c_id"))
      .select("q_id", "c_id").distinct()
    val q = withNorm(queries, "q_id", "q_emb", "q_norm")
    val c = withNorm(corpus, "c_id", "c_emb", "c_norm")
    val scored = cands.join(broadcast(q), "q_id").join(c, "c_id")
      .select(col("q_id"), col("c_id"),
        scoreCos("q_emb", "c_emb", "q_norm", "c_norm").as("cos"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("q_id"), col("c_id"), round(col("cos"), 6).as("cos_v"),
        col("rk").cast("long").as("rk"))
  }

  /** Multi-probe LSH ANN (Lv et al., VLDB 2007) — the memory-lean
    * alternative to [[lshAnn]]'s table multiplication: ONE bucketing
    * with more planes (narrower buckets), and each query probes its
    * base bucket plus the `probes` single-bit perturbations obtained
    * by flipping the hyperplanes with the SMALLEST |margin| — the
    * planes the query sits closest to, exactly where a true neighbor
    * most likely landed on the other side. Same recall lever as
    * extra tables at 1/tables the index storage (the first-order
    * probe sequence; deeper perturbation sets extend the same
    * frame).
    *
    * Margins compute RELATIONALLY — a planes-way literal-array
    * union ranked per query — so the probe choice is an ordinary
    * window rank (|margin| asc, plane asc) both engines replay; no
    * array-of-struct sorting in the plan.
    *
    * Scale: the corpus carries one (c_id, bucket) frame (at 100 TB:
    * written bucketed-by(bucket), same as lshAnn's note); the probe
    * frame is queries × (probes+1) rows broadcast into the bucket
    * equi-join; exact re-rank touches only the candidate set. */
  def multiProbeAnn(corpus: DataFrame, queries: DataFrame, k: Int,
                    dim: Int = 64, planes: Int = 8, probes: Int = 3,
                    seed: Long = 0L): DataFrame = {
    val ws = hyperplanes(dim, planes, seed)
    val qm = ws.zipWithIndex.map { case (w, p) =>
      queries.select(col("vec_id").as("q_id"), lit(p).as("p"),
        lit(1 << p).as("pw"),
        dotNative(col("embedding").cast("array<double>"), typedLit(w))
          .as("m"))
    }.reduce(_ unionByName _)
    val base = qm.groupBy("q_id")
      .agg(sum(when(col("m") >= 0, col("pw")).otherwise(0))
        .cast("int").as("b"))
    val wR = Window.partitionBy("q_id")
      .orderBy(abs(col("m")).asc, col("p").asc)
    val flips = qm.withColumn("r", row_number().over(wR))
      .where(col("r") <= probes).select("q_id", "pw")
    val probeBuckets = base.select(col("q_id"), col("b").as("bucket"))
      .unionByName(flips.join(base, "q_id")
        .select(col("q_id"),
          col("b").bitwiseXOR(col("pw")).cast("int").as("bucket")))
    val cb = corpus.select(col("vec_id").as("c_id"),
      lshBucket(col("embedding"), dim, planes, seed).as("bucket"))
    val cands = cb.join(broadcast(probeBuckets), "bucket")
      .where(col("q_id") =!= col("c_id"))
      .select("q_id", "c_id").distinct()
    val q = withNorm(queries, "q_id", "q_emb", "q_norm")
    val c = withNorm(corpus, "c_id", "c_emb", "c_norm")
    val scored = cands.join(broadcast(q), "q_id").join(c, "c_id")
      .select(col("q_id"), col("c_id"),
        scoreCos("q_emb", "c_emb", "q_norm", "c_norm").as("cos"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("q_id"), col("c_id"), round(col("cos"), 6).as("cos_v"),
        col("rk").cast("long").as("rk"))
  }

  /** Farthest-first traversal seeding (Gonzalez 1985) — the
    * DETERMINISTIC k-means++-family initializer (k-means++ samples
    * ∝ D²; farthest-first takes the argmax — the 2-approximation for
    * k-center, and the standard deterministic seeding when
    * reproducibility matters more than the ++ guarantee): start at
    * the min-id vector, then k−1 rounds of "pick the point farthest
    * (min-L2² to the chosen set) from everything chosen", ties to
    * vec_id. Emits (rk, vec_id, min_d2) — min_d2 is the k-center
    * radius sequence, the diagnostic for "how many centers does this
    * corpus actually need" (a sharp drop at r means r centers
    * suffice). Already-chosen points self-exclude (their min-d² is
    * 0).
    *
    * Scale: each round is ONE map stage over the corpus (≤ chosen
    * literal-array dot products per row) + a 1-row TakeOrdered
    * collect; driver state = k vectors (the artifact), the
    * IVF-seed/bpeTrain bounded pattern. */
  def farthestFirstInit(corpus: DataFrame, k: Int = 8): DataFrame = {
    val spark = corpus.sparkSession
    val base = corpus.select(col("vec_id"),
      col("embedding").cast("array<double>").as("e"))
      .materialize(true)
    val first = base.orderBy("vec_id").limit(1).collect()(0)
    var chosen = Seq((first.getLong(0), first.getSeq[Double](1)))
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Option[Double])]
    out += ((0L, chosen.head._1, None))
    for (r <- 1 until k) {
      def d2(c: Seq[Double]) = {
        val lc = typedLit(c)
        dotNative(col("e"), col("e")) + dotNative(lc, lc) -
          lit(2.0) * dotNative(col("e"), lc)
      }
      val md = chosen.map(c => d2(c._2)).reduce(least(_, _))
      // carry e through the TakeOrdered so the chosen vector comes
      // back in the SAME 1-row collect (was: a second filter job per
      // round just to fetch the winner's embedding)
      val top = base.select(col("vec_id"), md.as("md"), col("e"))
        .orderBy(col("md").desc, col("vec_id").asc).limit(1).collect()(0)
      val id = top.getLong(0)
      out += ((r.toLong, id, Some(top.getDouble(1))))
      chosen = chosen :+ ((id, top.getSeq[Double](2)))
    }
    import spark.implicits._
    out.toSeq.toDF("rk", "vec_id", "min_d2_raw")
      .select(col("rk"), col("vec_id"),
        round(col("min_d2_raw"), 6).as("min_d2"))
      .orderBy("rk")
  }

  /** Probe-depth calibration for [[multiProbeAnn]] — the
    * [[nprobeCurve]] of the multi-probe family: recall@k and
    * candidate volume per probe depth 0..maxProbes, the table the
    * probes knob is tuned against. Candidate sets NEST (depth p's
    * buckets ⊆ depth p+1's), so everything computes once at max
    * depth with each candidate tagged by its ENTRY depth (min probe
    * rank that found it); depth p's ranking just filters entry ≤ p —
    * no re-probing per depth. Hit counts are integers; recall is one
    * int/(nq·k) division, engine-identical.
    *
    * Scale: one probe join + one scoring join at max depth (both the
    * multiProbeAnn shapes); per-depth work is a rank window over the
    * bounded candidate frame. */
  def probeCurve(corpus: DataFrame, queries: DataFrame, k: Int = 5,
                 maxProbes: Int = 3, dim: Int = 64, planes: Int = 8,
                 seed: Long = 0L): DataFrame = {
    val ws = hyperplanes(dim, planes, seed)
    val qm = ws.zipWithIndex.map { case (w, p) =>
      queries.select(col("vec_id").as("q_id"), lit(p).as("p"),
        lit(1 << p).as("pw"),
        dotNative(col("embedding").cast("array<double>"), typedLit(w))
          .as("m"))
    }.reduce(_ unionByName _)
    val base = qm.groupBy("q_id")
      .agg(sum(when(col("m") >= 0, col("pw")).otherwise(0))
        .cast("int").as("b"))
    val wR = Window.partitionBy("q_id")
      .orderBy(abs(col("m")).asc, col("p").asc)
    val flips = qm.withColumn("r", row_number().over(wR))
      .where(col("r") <= maxProbes)
      .join(base, "q_id")
      .select(col("q_id"),
        col("b").bitwiseXOR(col("pw")).cast("int").as("bucket"),
        col("r").as("depth"))
    val probeBuckets = base
      .select(col("q_id"), col("b").as("bucket"), lit(0).as("depth"))
      .unionByName(flips)
    val cb = corpus.select(col("vec_id").as("c_id"),
      lshBucket(col("embedding"), dim, planes, seed).as("bucket"))
    val cand = cb.join(broadcast(probeBuckets), "bucket")
      .where(col("q_id") =!= col("c_id"))
      .groupBy("q_id", "c_id").agg(min("depth").as("entry"))
    val q = withNorm(queries, "q_id", "q_emb", "q_norm")
    val c = withNorm(corpus, "c_id", "c_emb", "c_norm")
    val scored = cand.join(broadcast(q), "q_id").join(c, "c_id")
      .select(col("q_id"), col("c_id"), col("entry"),
        scoreCos("q_emb", "c_emb", "q_norm", "c_norm").as("cos"))
      .materialize(true)
    val exact = cosineTopK(corpus, queries, k)
      .select(col("q_id"), col("c_id")).withColumn("_ex", lit(1))
      .materialize(true)
    val nq = queries.count()
    (0 to maxProbes).map { p =>
      val w = Window.partitionBy("q_id")
        .orderBy(col("cos").desc, col("c_id").asc)
      val top = scored.where(col("entry") <= p)
        .withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      val hits = top.join(exact, Seq("q_id", "c_id"), "left")
        .agg(coalesce(sum("_ex"), lit(0)).cast("long").as("n_hits"))
      val cands = scored.where(col("entry") <= p)
        .agg(count(lit(1)).as("n_cand"))
      hits.crossJoin(cands)
        .select(lit(p.toLong).as("probes"), col("n_cand"), col("n_hits"),
          round(col("n_hits") / lit((nq * k).toDouble), 6).as("recall_k"))
    }.reduce(_ unionByName _)
  }

  /** ANN recall calibration curve — recall@k of the LSH index
    * against the exact ranking, per query and k: the similarity-side
    * companion of the dedup threshold curve, and the artifact
    * tables/planes/k actually get tuned against (recall@1 high +
    * recall@20 low means the index finds heads but starves deep
    * candidate lists, and vice versa).
    *
    * Scale: one exact ranking + one LSH ranking at max(ks) — both
    * already scale-audited — joined on (q_id, c_id); the curve is a
    * ks×overlap explode of that queries×k-bounded frame. Zero-hit
    * (k, query) cells survive via the grid left-join. */
  def recallCurve(corpus: DataFrame, queries: DataFrame,
                  ks: Seq[Int] = Seq(1, 5, 10, 20),
                  dim: Int = 64, planes: Int = 4, tables: Int = 8)
      : DataFrame = {
    val kMax = ks.max
    val full = cosineTopK(corpus, queries, kMax)
      .select(col("q_id"), col("c_id"), col("rk").as("rk_f"))
    val ann = lshAnn(corpus, queries, kMax, dim, planes, tables)
      .select(col("q_id"), col("c_id"), col("rk").as("rk_a"))
    val joined = full.join(ann, Seq("q_id", "c_id"))
    val kl = corpus.sparkSession.range(1)
      .select(explode(typedlit(ks)).as("k"))
    val grid = queries.select(col("vec_id").as("q_id"))
      .crossJoin(broadcast(kl))
    val ov = joined.crossJoin(broadcast(kl))
      .where(col("rk_f") <= col("k") && col("rk_a") <= col("k"))
      .groupBy("k", "q_id").agg(count(lit(1)).as("overlap"))
    grid.join(ov, Seq("k", "q_id"), "left")
      .select(col("k"), col("q_id"),
        coalesce(col("overlap"), lit(0L)).as("overlap"),
        round(coalesce(col("overlap"), lit(0L)) / col("k"), 6).as("recall"))
      .orderBy("k", "q_id")
  }

  /** IVF probe-depth calibration curve — recall@k of [[ivfAnn]]
    * against the exact ranking as nprobe grows: the depth/latency
    * trade every IVF deployment tunes (each probed cell costs a
    * bucket join; the curve shows where extra cells stop buying
    * recall). Fixed k, one row per (nprobe, query).
    *
    * Scale: one exact ranking + one [[ivfAnn]] per probe depth
    * (each a map-stage assignment + pruned cell join); the curve
    * aggregation is queries×|nprobes|-bounded. */
  def nprobeCurve(corpus: DataFrame, queries: DataFrame, k: Int = 5,
                  cells: Int = 8,
                  nprobes: Seq[Int] = Seq(1, 2, 4, 8)): DataFrame = {
    val full = cosineTopK(corpus, queries, k).select("q_id", "c_id")
    // ONE corpus cell assignment + ONE probe ranking serve every
    // depth (candidate sets nest: depth p = probe ranks 1..p) —
    // invoking ivfAnn per depth would re-assign the corpus
    // |nprobes| times
    val npMax = nprobes.max
    val cents: Array[Seq[Double]] = corpus
      .orderBy("vec_id").limit(cells)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq)
    def dists(emb: Column): Column = array(cents.map { c =>
      val cc = c.map(x => x * x).sum
      lit(cc) - lit(2.0) * dotNative(emb.cast("array<double>"), typedLit(c))
    }: _*)
    def cellOf(emb: Column): Column = {
      val d = dists(emb)
      (array_position(d, array_min(d)) - 1).cast("int")
    }
    val cb = corpus.select(col("vec_id").as("c_id"),
      col("embedding").as("c_emb"), cellOf(col("embedding")).as("cell"))
    val qb = queries.select(col("vec_id").as("q_id"),
      col("embedding").as("q_emb"), dists(col("embedding")).as("qd"))
      .select(col("q_id"), col("q_emb"),
        posexplode(slice(array_sort(array(
          (0 until cells).map(i =>
            struct(element_at(col("qd"), i + 1).as("d"), lit(i).as("i"))): _*)),
          1, npMax)).as(Seq("pos", "probe")))
      .select(col("q_id"), col("q_emb"),
        (col("pos") + 1).as("probe_rank"), col("probe.i").as("cell"))
    val cand = cb.join(broadcast(qb), Seq("cell"))
      .where(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"), col("probe_rank"),
        (dotNative(col("q_emb"), col("c_emb")) /
          (sqrt(dotNative(col("q_emb"), col("q_emb"))) *
            sqrt(dotNative(col("c_emb"), col("c_emb"))))).as("cos"))
    val nl = corpus.sparkSession.range(1)
      .select(explode(typedlit(nprobes)).as("nprobe"))
    val wNp = Window.partitionBy("nprobe", "q_id")
      .orderBy(col("cos").desc, col("c_id").asc)
    val parts = cand.crossJoin(broadcast(nl))
      .where(col("probe_rank") <= col("nprobe"))
      .withColumn("rk", row_number().over(wNp))
      .where(col("rk") <= k)
      .select(col("nprobe"), col("q_id"), col("c_id"))
    val grid = queries.select(col("vec_id").as("q_id"))
      .crossJoin(broadcast(nl))
    val ov = parts.join(full, Seq("q_id", "c_id"))
      .groupBy("nprobe", "q_id").agg(count(lit(1)).as("overlap"))
    grid.join(ov, Seq("nprobe", "q_id"), "left")
      .select(col("nprobe"), col("q_id"),
        coalesce(col("overlap"), lit(0L)).as("overlap"),
        round(coalesce(col("overlap"), lit(0L)) / lit(k.toDouble), 6)
          .as("recall"))
      .orderBy("nprobe", "q_id")
  }

  // ---- shared IVF/PQ building blocks ---------------------------------
  // One source of truth for cell assignment, probing, residual PQ
  // encoding and ADC scoring: the direct paths ([[ivfAnn]],
  // [[ivfpqAnn]]) and the persisted layout
  // ([[graft.sources.VectorStore]]) compose the SAME expressions, so
  // the stored route is byte-identical to the direct route by
  // construction (the store specs and the store_ann/store_ivfpq
  // oracles pin it).

  /** Deterministic seeded coarse quantizer — the first `cells`
    * corpus vectors by id (bounded collect: cells·dim doubles). */
  private[graft] def seedCentroids(corpus: DataFrame,
                                   cells: Int): Array[Seq[Double]] =
    corpus.orderBy("vec_id").limit(cells)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq)

  /** Per-cell ‖v−c‖² ranking array (up to the constant ‖v‖²):
    * c·c − 2 v·c per centroid literal — a pure map expression. */
  private[graft] def centroidDists(cents: Array[Seq[Double]])(emb: Column): Column =
    array(cents.map { c =>
      val cc = c.map(x => x * x).sum
      lit(cc) - lit(2.0) * dotNative(emb.cast("array<double>"), typedLit(c))
    }: _*)

  /** argmin cell id; ties to the lowest index (array_position takes
    * the first minimum). */
  private[graft] def cellAssign(cents: Array[Seq[Double]])(emb: Column): Column = {
    val d = centroidDists(cents)(emb)
    (array_position(d, array_min(d)) - 1).cast("int")
  }

  /** nprobe nearest cells from a precomputed distance array column —
    * an array of (d, i) structs sorted ascending, sliced to nprobe. */
  private[graft] def probeFromDists(qd: Column, cells: Int,
                                    nprobe: Int): Column =
    slice(array_sort(array(
      (0 until cells).map(i =>
        struct(element_at(qd, i + 1).as("d"), lit(i).as("i"))): _*)),
      1, nprobe)

  /** Query probe + in-cell exact cosine rerank over ANY
    * (c_id, c_emb, cell) corpus frame — the direct path hands it a
    * freshly-assigned frame, the stored layout hands it the pruned
    * bucketed read. */
  private[graft] def ivfProbeScore(cb: DataFrame, queries: DataFrame,
                                   cents: Array[Seq[Double]], k: Int,
                                   nprobe: Int): DataFrame = {
    val cells = cents.length
    val qb = queries.select(col("vec_id").as("q_id"),
      col("embedding").as("q_emb"),
      centroidDists(cents)(col("embedding")).as("qd"))
      .select(col("q_id"), col("q_emb"),
        explode(probeFromDists(col("qd"), cells, nprobe)).as("probe"))
      .select(col("q_id"), col("q_emb"), col("probe.i").as("cell"))
    val scored = cb.join(broadcast(qb), Seq("cell"))
      .where(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        (dotNative(col("q_emb"), col("c_emb")) /
          (sqrt(dotNative(col("q_emb"), col("q_emb"))) *
            sqrt(dotNative(col("c_emb"), col("c_emb"))))).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("q_id"), col("c_id"), round(col("cos"), 6).as("cos_v"),
        col("rk").cast("long").as("rk"))
  }

  /** IVF-style ANN: a coarse quantizer partitions the corpus into
    * cells; queries probe only the `nprobe` nearest cells and exact
    * cosine reranks within them — the inverted-file pattern behind
    * FAISS-style indexes, as a bucketed equi-join.
    *
    * The quantizer here is deterministic *seeded selection* (the
    * first k corpus vectors by id) rather than trained k-means, so
    * the oracle can replay cell assignment exactly; swapping in
    * trained centroids changes only the `centroids` frame. Cell
    * assignment is argmin of ‖v−c‖² = argmin (c·c − 2 v·c); ties
    * break to the lowest cell index (array_position takes the first
    * minimum).
    *
    * Scale: assignment is a map stage against k broadcast centroid
    * literals (k·dim doubles). This path re-assigns the corpus per
    * query; [[graft.sources.VectorStore]] persists the assignment as
    * a cell-partitioned layout so each probe is a PRUNED partition
    * read — same result, zero per-query assignment work. */
  def ivfAnn(corpus: DataFrame, queries: DataFrame, k: Int,
             cells: Int = 8, nprobe: Int = 2): DataFrame = {
    val cents = seedCentroids(corpus, cells)
    val cb = corpus.select(col("vec_id").as("c_id"),
      col("embedding").as("c_emb"),
      cellAssign(cents)(col("embedding")).as("cell"))
    ivfProbeScore(cb, queries, cents, k, nprobe)
  }

  /** Lloyd k-means over the embedding corpus — the semantic
    * clustering step of curation pipelines (domain discovery,
    * cluster-balanced sampling, SemDeDup-style semantic dedup) and
    * the trained form of [[ivfAnn]]'s coarse quantizer.
    *
    * Init is deterministic seeded selection (the first k vectors by
    * id — the same oracle-replayable convention as ivfAnn/pqAnn);
    * each of the `iters` Lloyd rounds assigns every vector to its
    * nearest centroid (argmin ‖v−c‖² via c·c − 2 v·c, ties to the
    * lowest cell) and recomputes centroids as element-wise means.
    * Empty cells keep their previous centroid.
    *
    * Scale: centroids are a k-row FRAME broadcast into the
    * assignment join (k·N intermediate rows, collapsed by map-side
    * min_by before any shuffle); the mean recompute is
    * posexplode + two hash aggregations keyed by (cluster, pos) then
    * cluster — fully distributed, nothing returns to the driver. The
    * iteration composes plans (no checkpoint): intended for the
    * small `iters` a curation pass uses; checkpoint between rounds
    * if you push it to tens of iterations. */
  def kmeans(corpus: DataFrame, k: Int = 8, iters: Int = 1): DataFrame = {
    val emb = kmEmb(corpus)
    kmAssign(emb, kmeansCentroids(corpus, k, iters))
      .select(col("vec_id"), col("cluster"))
  }

  private def kmEmb(corpus: DataFrame): DataFrame =
    corpus.select(col("vec_id"),
      col("embedding").cast("array<double>").as("e"))

  private def kmAssign(emb: DataFrame, cs: DataFrame): DataFrame =
    emb.crossJoin(broadcast(cs))
      .select(col("vec_id"), col("e"), col("ci"),
        (dotNative(col("cemb"), col("cemb")) -
          lit(2.0) * dotNative(col("e"), col("cemb"))).as("d"))
      .groupBy("vec_id")
      .agg(min_by(col("ci"), struct(col("d"), col("ci"))).as("cluster"),
        first(col("e")).as("e"))

  /** The trained (ci, cemb) centroid frame of [[kmeans]] — exposed
    * so selection operators (D4 prototypicality) can rank against
    * the SAME centroids the assignment used. */
  private[graft] def kmeansCentroids(corpus: DataFrame, k: Int,
                                     iters: Int): DataFrame = {
    val emb = kmEmb(corpus)
    val seedW = Window.orderBy("vec_id") // k rows — not a full-frame window
    var cents: DataFrame = emb.orderBy("vec_id").limit(k)
      .select((row_number().over(seedW) - 1).as("ci"), col("e").as("cemb"))
    for (_ <- 0 until iters) {
      val means = kmAssign(emb, cents)
        .select(col("cluster"), posexplode(col("e")).as(Seq("pos", "v")))
        .groupBy("cluster", "pos").agg(avg("v").as("mv"))
        .groupBy("cluster")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("mv")))),
          s => s.getField("mv")).as("memb"))
      // checkpoint the k-row centroid frame: left symbolic, iteration
      // t's broadcast re-evaluates all prior iterations' mean passes
      // (quadratic in iters)
      cents = cents.join(means, cents("ci") === means("cluster"), "left")
        .select(col("ci"), coalesce(col("memb"), col("cemb")).as("cemb"))
        .materialize(true)
    }
    cents
  }

  /** D4-style prototypicality pruning (Tirumala et al. 2023,
    * "D4: Improving LLM Pretraining via Document De-Duplication and
    * Diversification") — the step AFTER SemDeDup
    * ([[semanticNearDup]]): cluster the embedding space, then drop
    * the most PROTOTYPICAL `dropFrac` of each cluster (the points
    * closest to their centroid — the templated/boilerplate core that
    * survives near-dup removal), keeping the diverse tail. Same
    * seeded k-means as the rest of the family, so the oracle replays
    * clustering verbatim; prototypicality ranks on the ROUNDED full
    * squared distance (ties to the lowest vec_id) so both engines
    * rank identical keys.
    *
    * Scale: one broadcast-centroid assignment pass (map-side min_by
    * before the per-vector shuffle), distance is the same pass's
    * column algebra, and the rank windows partition by cluster —
    * never the corpus unpartitioned. */
  def d4Select(corpus: DataFrame, dropFrac: Double = 0.25, k: Int = 8,
               iters: Int = 1): DataFrame = {
    val cents = kmeansCentroids(corpus, k, iters)
    val d = kmEmb(corpus).crossJoin(broadcast(cents))
      .select(col("vec_id"), col("e"), col("ci"),
        (dotNative(col("cemb"), col("cemb")) -
          lit(2.0) * dotNative(col("e"), col("cemb"))).as("dd"),
        (dotNative(col("e"), col("e")) +
          dotNative(col("cemb"), col("cemb")) -
          lit(2.0) * dotNative(col("e"), col("cemb"))).as("d2full"))
      .groupBy("vec_id")
      .agg(min_by(struct(col("ci").as("c"), col("d2full").as("d2")),
        struct(col("dd"), col("ci"))).as("best"))
      .select(col("vec_id"), col("best.c").as("cluster"),
        round(col("best.d2"), 6).as("d2_v"))
    val wRank = Window.partitionBy("cluster")
      .orderBy(col("d2_v").asc, col("vec_id").asc)
    val wSize = Window.partitionBy("cluster")
    d.withColumn("proto_rank", row_number().over(wRank).cast("long"))
      .withColumn("n_vecs", count(lit(1)).over(wSize))
      .select(col("vec_id"), col("cluster"), col("d2_v"), col("proto_rank"),
        col("n_vecs"),
        (col("proto_rank") > floor(lit(dropFrac) * col("n_vecs")))
          .cast("int").as("kept"))
  }

  /** k-means convergence curve — per Lloyd iteration: total
    * within-cluster squared distance (inertia) and how many vectors
    * changed cluster. The elbow/convergence artifact k and the
    * iteration budget get chosen against; inertia is non-increasing
    * in exact arithmetic, so an uptick flags numerical trouble.
    * Same deterministic seeding as [[kmeans]].
    *
    * Scale: per iteration, assignment is the same broadcast-centroid
    * map stage as [[kmeans]]; the narrow (vec_id, cluster, d²) label
    * frame is materialized once per round (the written intermediate
    * a real cluster run keeps anyway) and serves the inertia sum,
    * the moved count and the mean recompute; driver state is one
    * scalar pair per iteration. */
  def kmeansInertia(corpus: DataFrame, k: Int = 8,
                    iters: Int = 3): DataFrame = {
    val spark = corpus.sparkSession
    val emb = corpus.select(col("vec_id"),
      col("embedding").cast("array<double>").as("e"))
    val seedW = Window.orderBy("vec_id") // k rows — not a full-frame window
    var cents: DataFrame = emb.orderBy("vec_id").limit(k)
      .select((row_number().over(seedW) - 1).as("ci"), col("e").as("cemb"))
    var prev: Option[DataFrame] = None
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Double, Option[Long])]
    for (t <- 0 until iters) {
      val labels = emb.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("ci"),
          (dotNative(col("e"), col("e")) +
            dotNative(col("cemb"), col("cemb")) -
            lit(2.0) * dotNative(col("e"), col("cemb"))).as("d2"))
        .groupBy("vec_id")
        .agg(min_by(struct(col("ci").as("c"), col("d2").as("d")),
          struct(col("d2"), col("ci"))).as("best"))
        .select(col("vec_id"), col("best.c").as("cluster"),
          col("best.d").as("d2"))
        .materialize(true)
      val inertia = labels.agg(sum("d2")).head.getDouble(0)
      val moved = prev.map(p => labels
        .join(p.select(col("vec_id"), col("cluster").as("_pc")), "vec_id")
        .where(col("cluster") =!= col("_pc")).count())
      out += ((t.toLong, inertia, moved))
      prev = Some(labels)
      if (t < iters - 1) {
        val means = labels.join(emb, "vec_id")
          .select(col("cluster"), posexplode(col("e")).as(Seq("pos", "v")))
          .groupBy("cluster", "pos").agg(avg("v").as("mv"))
          .groupBy("cluster")
          .agg(transform(array_sort(collect_list(struct(col("pos"), col("mv")))),
            s => s.getField("mv")).as("memb"))
        // k-row checkpoint — see kmeansCentroids: without it each
        // iteration re-evaluates every prior mean pass
        cents = cents.join(means, cents("ci") === means("cluster"), "left")
          .select(col("ci"), coalesce(col("memb"), col("cemb")).as("cemb"))
          .materialize(true)
      }
    }
    import spark.implicits._
    out.toSeq.map { case (t, in, mv) =>
      (t, BigDecimal(in).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        mv)
    }.toDF("iter", "inertia", "moved").orderBy("iter")
  }

  /** Nearest-class-centroid (Rocchio) classification over labeled
    * embeddings — the cheap linear baseline for corpus labeling
    * (domain tagging, quality-tier assignment) when a kNN vote
    * ([[knnClassify]]) is too expensive: train rows collapse to one
    * centroid per label, eval rows take the argmin-L² label
    * (c·c − 2 v·c, ties to the lowest label).
    *
    * Scale: centroids build with posexplode + two hash aggregations
    * (the [[kmeans]] mean machinery) into a ≤|labels|-row frame that
    * BROADCASTS into the scoring join; the |labels|·N intermediate
    * collapses by map-side min_by before the per-vector shuffle.
    * Training data never moves — only its per-label means do. */
  def centroidClassify(corpus: DataFrame,
                       isTrain: org.apache.spark.sql.Column): DataFrame = {
    val emb = corpus.select(col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("e"), isTrain.as("tr"))
    val cents = emb.where(col("tr"))
      .select(col("label").as("cl"), posexplode(col("e")).as(Seq("pos", "v")))
      .groupBy("cl", "pos").agg(avg("v").as("mv"))
      .groupBy("cl")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("mv")))),
        s => s.getField("mv")).as("cemb"))
    emb.where(!col("tr"))
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("label"), col("cl"),
        (dotNative(col("cemb"), col("cemb")) -
          lit(2.0) * dotNative(col("e"), col("cemb"))).as("d"))
      .groupBy("vec_id", "label")
      .agg(min_by(col("cl"), struct(col("d"), col("cl"))).as("pred_label"))
      .select(col("vec_id"), col("label"), col("pred_label"),
        (col("label") === col("pred_label")).cast("int").as("correct"))
  }

  /** Domain-discovery report over [[kmeans]] clusters: per-cluster
    * size, majority label and purity — the dataset-card view of a
    * semantic clustering (how coherent are the discovered domains,
    * which label dominates each). Cluster/label counts are one hash
    * aggregation; the majority pick windows the ≤ k·|labels|-row
    * count frame partitioned by cluster — never the corpus. */
  def domainReport(corpus: DataFrame, k: Int = 8, iters: Int = 1): DataFrame = {
    val counts = corpus.select("vec_id", "label")
      .join(kmeans(corpus, k, iters), "vec_id")
      .groupBy("cluster", "label").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("cluster")
      .orderBy(col("cnt").desc, col("label").asc)
    counts.withColumn("rn", row_number().over(w))
      .withColumn("n_vecs", sum("cnt").over(Window.partitionBy("cluster")))
      .where(col("rn") === 1)
      .select(col("cluster"), col("n_vecs"),
        col("label").as("top_label"),
        round(col("cnt").cast("double") / col("n_vecs"), 6).as("top_frac"))
  }

  /** SemDeDup-style semantic near-duplicate pairs: cluster the
    * corpus with [[kmeans]], then search for cosine-near pairs
    * WITHIN clusters only (Abbas et al., "SemDeDup" — semantic
    * duplicates are overwhelmingly co-located in embedding-space
    * clusters, so the cross-cluster quadratic term is dropped
    * entirely). The within-cluster join is the scale path's whole
    * point: Σ_c |c|²/2 pairs instead of N²/2, sharded by cluster id
    * — with balanced clusters that is a k× cost reduction before any
    * LSH refinement inside oversized cells.
    *
    * Output: (id_a, id_b, cluster, cos_v) for pairs above
    * `threshold`, ordered ids. Norms precompute before the join
    * (the [[cosineNearDup]] convention). */
  def semanticNearDup(corpus: DataFrame, threshold: Double, k: Int = 8,
                      iters: Int = 1): DataFrame = {
    val asg = kmeans(corpus, k, iters)
    val sided = corpus.join(asg, "vec_id")
    def side(p: String) = sided.select(
      col("vec_id").as(s"id_$p"), col("cluster"),
      col("embedding").as(s"emb_$p"),
      sqrt(dotNative(col("embedding"), col("embedding"))).as(s"norm_$p"))
    side("a").join(side("b"), Seq("cluster"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("cluster"),
        scoreCos("emb_a", "emb_b", "norm_a", "norm_b").as("cos"))
      .where(col("cos") > threshold)
      .select(col("id_a"), col("id_b"), col("cluster"),
        round(col("cos"), 6).as("cos_v"))
  }

  /** Product-quantization ANN with asymmetric distance computation
    * (ADC) — the memory-compression layer of billion-scale indexes
    * (PQ per Jégou et al. / the FAISS IVF-PQ pattern): vectors split
    * into `m` subspaces; each subvector is encoded as the index of
    * its nearest codeword in a per-subspace codebook of `ks`
    * entries, so a dim-float vector becomes m small codes. Queries
    * never touch corpus vectors: per (query, subspace, codeword) the
    * exact subspace distance is computed once, and each candidate
    * scores as Σ_j dist[j][code_j] — m lookups per pair instead of a
    * dim-length dot.
    *
    * The codebook is a FRAME (broadcast joined), not inlined
    * literals: m·ks inline distance expressions blow past the JVM
    * codegen method limit (the same plan-size explosion the LSH
    * literal-array rewrite removed), while the join form is one
    * codegen'd dot per ROW and swaps trained codebooks in without a
    * plan change. Codewords are deterministic seeded selection (the
    * subvectors of the first `ks` corpus vectors), like [[ivfAnn]]'s
    * quantizer, so the oracle replays encoding exactly; ties break
    * to the lowest codeword index.
    *
    * Scale: encoding = one broadcast join over m·N subvector rows →
    * min_by per (vector, subspace); the scored relation carries only
    * (id, code) pairs — the corpus' float payload stays in storage.
    * Composes with [[ivfAnn]] cells (encode within cells, probe then
    * ADC-score) for the full IVF-PQ shape. Distances are L2 (ADC's
    * native metric); the spec measures recall against exact L2
    * top-k. */
  /** PQ quantization-distortion report — per subspace: the mean
    * squared error between each subvector and its nearest codeword
    * (‖x_j − c‖² via the same c·c − 2x·c + x·x algebra the encoder
    * ranks on). THE tuning artifact for m and ks: distortion
    * concentrated in one subspace means that dimension block carries
    * structure the codebook can't express; total MSE tracks the ADC
    * scoring error against exact L2. Deterministic seed codebooks,
    * matching [[pqAnn]]'s oracle path.
    *
    * Scale: one sliced-projection scan of the corpus (the pqAnn
    * encode shape), a broadcast codebook join, and two hash
    * aggregations — per-group state is one running min / mean. */
  def pqDistortion(corpus: DataFrame, dim: Int = 64, m: Int = 8,
                   ks: Int = 64): DataFrame = {
    val sub = dim / m
    val spark = corpus.sparkSession
    import spark.implicits._
    val seed: Array[Seq[Double]] = corpus
      .orderBy("vec_id").limit(ks)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq)
    val bdf = (for (c <- 0 until ks; j <- 0 until m)
      yield (c, j, seed(c).slice(j * sub, (j + 1) * sub)))
      .toDF("c", "j", "w")
    val cs = corpus
      .select(col("vec_id"), col("embedding").cast("array<double>").as("_e"))
      .select(col("vec_id"),
        posexplode(array((0 until m).map(j =>
          slice(col("_e"), j * sub + 1, sub)): _*)).as(Seq("j", "s")))
    cs.join(broadcast(bdf), "j")
      .select(col("vec_id"), col("j"),
        (dotNative(col("w"), col("w")) -
          lit(2.0) * dotNative(col("s"), col("w")) +
          dotNative(col("s"), col("s"))).as("err"))
      .groupBy("vec_id", "j").agg(min("err").as("errmin"))
      .groupBy("j")
      .agg(count(lit(1)).as("n_vecs"), round(avg("errmin"), 6).as("mse"))
      .orderBy("j")
  }

  /** Composed IVF-PQ index — the FAISS IndexIVFPQ shape, built from
    * the two verified halves: a coarse quantizer prunes the search
    * to `nprobe` cells, and within cells vectors are PQ-encoded on
    * their RESIDUAL (x − centroid), the detail that makes IVF-PQ
    * beat flat PQ (residuals concentrate near zero, so the same
    * codebook budget spends its resolution where the data is).
    * Scoring is per-(query, probed-cell) asymmetric distance against
    * the query's residual in that cell. Deterministic seeds
    * throughout (first `cells` vectors as centroids, first `ks`
    * vectors' residuals as codewords) so the oracle replays
    * assignment, encoding and ADC exactly.
    *
    * Scale: cell assignment + residual + encoding are one map-stage
    * pass against broadcast centroid/codebook frames; scoring joins
    * corpus codes to the ADC table on (cell, j, code) — candidates
    * only ever come from probed cells, and the corpus float payload
    * never reaches the scoring join (codes only, the PQ compression
    * contract). */
  def ivfpqAnn(corpus: DataFrame, queries: DataFrame, k: Int,
               dim: Int = 64, cells: Int = 8, nprobe: Int = 2,
               m: Int = 8, ks: Int = 32): DataFrame = {
    val sub = dim / m
    val spark = corpus.sparkSession
    // ONE bounded collect covers both driver artifacts — the first
    // `cells` vectors are the coarse centroids AND the first `ks`
    // vectors seed the codebooks. The old form ran a second FULL
    // corpus pass (scan + cellAssign map + centroid join +
    // TakeOrdered) just to collect seed residuals that driver
    // arithmetic derives exactly from rows already on the driver —
    // the same bounded-model-artifact inversion as the r12 PCA move.
    val head: Array[Seq[Double]] = corpus
      .orderBy("vec_id").limit(math.max(cells, ks))
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq)
    val cents = head.take(cells)
    val centsDf = centroidFrame(spark, cents)
    val cb = residualFrame(corpus, cents, centsDf)
    // seed residuals replayed in driver arithmetic, bit-identical to
    // the plan expressions they replace: d_c = ‖c‖² − 2·v·c with
    // dotNative's left-to-right sum, cell = FIRST minimum
    // (array_position semantics), r = v − c element-wise. IEEE
    // doubles make the replication exact; the oracle re-verifies it.
    val seedRes: Array[Seq[Double]] = head.take(ks).map { v =>
      val ds = cents.map { c =>
        val cc = c.map(x => x * x).sum
        var dot = 0.0
        var i = 0
        val n = math.min(v.length, c.length)
        while (i < n) { dot += v(i) * c(i); i += 1 }
        cc - 2.0 * dot
      }
      val cell = ds.indexOf(ds.min)
      v.zip(cents(cell)).map { case (a, b) => a - b }
    }
    val bdf = pqCodebookFrame(spark, seedRes, m, sub)
    val codes = pqEncode(cb, bdf, m, sub)
    ivfpqScore(codes, queries, cents, centsDf, bdf, k, m, sub, nprobe)
  }

  /** (cell, cemb) centroid frame — broadcast joined wherever a
    * residual is formed. */
  private[graft] def centroidFrame(spark: org.apache.spark.sql.SparkSession,
                                   cents: Array[Seq[Double]]): DataFrame = {
    import spark.implicits._
    cents.zipWithIndex.map { case (c, i) => (i, c) }.toSeq.toDF("cell", "cemb")
  }

  /** Corpus cell assignment + residual (x − centroid): the frame PQ
    * encoding runs over. */
  private[graft] def residualFrame(corpus: DataFrame,
                                   cents: Array[Seq[Double]],
                                   centsDf: DataFrame): DataFrame =
    corpus
      .select(col("vec_id").as("c_id"),
        col("embedding").cast("array<double>").as("e"),
        cellAssign(cents)(col("embedding")).as("cell"))
      .join(broadcast(centsDf), "cell")
      .select(col("c_id"), col("cell"),
        zip_with(col("e"), col("cemb"), (a, b) => a - b).as("r"))

  /** (c, j, w) codebook frame from seed residuals — one row per
    * (codeword, subspace). */
  private[graft] def pqCodebookFrame(spark: org.apache.spark.sql.SparkSession,
                                     seedRes: Array[Seq[Double]],
                                     m: Int, sub: Int): DataFrame = {
    import spark.implicits._
    (for ((r, c) <- seedRes.zipWithIndex.toSeq; j <- 0 until m)
      yield (c, j, r.slice(j * sub, (j + 1) * sub))).toDF("c", "j", "w")
  }

  /** Encode residuals: argmin codeword per (vector, subspace) —
    * one broadcast codebook join + min_by, ties to the lowest
    * codeword index. Returns (c_id, cell, j, code). */
  private[graft] def pqEncode(cb: DataFrame, bdf: DataFrame,
                              m: Int, sub: Int): DataFrame =
    cb.select(col("c_id"), col("cell"),
        posexplode(array((0 until m).map(j =>
          slice(col("r"), j * sub + 1, sub)): _*)).as(Seq("j", "s")))
      .join(broadcast(bdf), "j")
      .select(col("c_id"), col("cell"), col("j"), col("c"),
        (dotNative(col("w"), col("w")) -
          lit(2.0) * dotNative(col("s"), col("w"))).as("d"))
      .groupBy("c_id", "cell", "j")
      .agg(min_by(col("c"), struct(col("d"), col("c"))).as("code"))

  /** Probe + ADC scoring over ANY (c_id, cell, j, code) codes frame —
    * direct path or the stored layout's exploded codes column: the
    * query's per-(cell, j, codeword) exact distances broadcast
    * against corpus codes; candidates only come from probed cells
    * and the corpus float payload never reaches the join. */
  private[graft] def ivfpqScore(codes: DataFrame, queries: DataFrame,
                                cents: Array[Seq[Double]], centsDf: DataFrame,
                                bdf: DataFrame, k: Int, m: Int, sub: Int,
                                nprobe: Int): DataFrame = {
    val cells = cents.length
    val qb = queries
      .select(col("vec_id").as("q_id"),
        col("embedding").cast("array<double>").as("qe"),
        centroidDists(cents)(col("embedding")).as("qd"))
      .select(col("q_id"), col("qe"),
        explode(probeFromDists(col("qd"), cells, nprobe)).as("probe"))
      .select(col("q_id"), col("qe"), col("probe.i").as("cell"))
      .join(broadcast(centsDf), "cell")
      .select(col("q_id"), col("cell"),
        zip_with(col("qe"), col("cemb"), (a, b) => a - b).as("rq"))
    val adc = qb
      .select(col("q_id"), col("cell"),
        posexplode(array((0 until m).map(j =>
          slice(col("rq"), j * sub + 1, sub)): _*)).as(Seq("j", "s")))
      .join(broadcast(bdf), "j")
      .select(col("q_id"), col("cell"), col("j"), col("c"),
        (dotNative(col("s"), col("s")) -
          lit(2.0) * dotNative(col("s"), col("w")) +
          dotNative(col("w"), col("w"))).as("d"))
    val scored = codes.join(broadcast(adc),
        codes("cell") === adc("cell") && codes("j") === adc("j") &&
          codes("code") === adc("c"))
      .where(col("q_id") =!= col("c_id"))
      .groupBy("q_id", "c_id").agg(sum("d").as("adc"))
    val w = Window.partitionBy("q_id").orderBy(col("adc").asc, col("c_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("q_id"), col("c_id"), round(col("adc"), 6).as("adc_v"),
        col("rk").cast("long").as("rk"))
  }

  def pqAnn(corpus: DataFrame, queries: DataFrame, k: Int,
            dim: Int = 64, m: Int = 8, ks: Int = 64,
            refine: Int = 0): DataFrame = {
    val sub = dim / m
    val spark = corpus.sparkSession
    import spark.implicits._
    // bounded driver collect (ks rows) — same pattern as the IVF seed
    val seed: Array[Seq[Double]] = corpus
      .orderBy("vec_id").limit(ks)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq)
    var books: Seq[(Int, Int, Seq[Double])] =
      for (c <- 0 until ks; j <- 0 until m)
        yield (c, j, seed(c).slice(j * sub, (j + 1) * sub))
    var bdf = books.toDF("c", "j", "w")
    // ONE scan of the embedding column per relation: slice the vector
    // into its m subvectors in a single projection and posexplode —
    // the old m-way union re-read the corpus m times in the encode
    // stage (m columnar scans where one suffices at 100 TB)
    def subvecs(df: DataFrame, idAs: String): DataFrame =
      df.select(col("vec_id").as(idAs),
          col("embedding").cast("array<double>").as("_e"))
        .select(col(idAs),
          posexplode(array((0 until m).map(j =>
            slice(col("_e"), j * sub + 1, sub)): _*)).as(Seq("j", "s")))
    // with refinement on, every Lloyd round's assignment AND the
    // final encode re-evaluate the corpus subvector explode — share
    // one materialization across them (refine=0 stays single-consumer
    // and unmaterialized)
    val cs0 = subvecs(corpus, "c_id")
    val cs = if (refine > 0) cs0.materialize(false) else cs0
    // encode: argmin_c ‖x_j − c‖² = argmin_c (c·c − 2 x_j·c);
    // min_by over (d, c) breaks ties to the lowest codeword
    def assign(extra: Column*): DataFrame =
      cs.join(broadcast(bdf), "j")
        .select(Seq(col("c_id"), col("j"), col("c"),
          (dotNative(col("w"), col("w")) -
            lit(2.0) * dotNative(col("s"), col("w"))).as("d")) ++ extra: _*)
    // optional Lloyd refinement: recompute each codeword as the
    // element-wise mean of its assigned subvectors (empty cells keep
    // their seed). The training hook — the oracle path runs refine=0
    // with the deterministic seed; refined recall uplift is
    // spec-measured. Each round is one assignment join + a bounded
    // (m·ks·sub values) collect.
    for (_ <- 0 until refine) {
      val assigned = assign(col("s"))
        .groupBy("c_id", "j")
        .agg(min_by(struct(col("c"), col("s")),
          struct(col("d"), col("c"))).as("a"))
        .select(col("j"), col("a.c").as("c"),
          posexplode(col("a.s")).as(Seq("pos", "v")))
      val means = assigned.groupBy("j", "c", "pos").agg(avg("v").as("mv"))
        .collect()
        .groupBy(r => (r.getInt(0), r.getInt(1)))
        .map { case (k2, rows) =>
          k2 -> rows.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq
        }
      books = books.map { case (c, j, w0) =>
        (c, j, means.getOrElse((j, c), w0))
      }
      bdf = books.toDF("c", "j", "w")
    }
    val enc = assign()
      .groupBy("c_id", "j")
      .agg(min_by(col("c"), struct(col("d"), col("c"))).as("code"))
    // per-(query, subspace, codeword) exact distance table
    val qd = subvecs(queries, "q_id").join(broadcast(bdf), "j")
      .select(col("q_id"), col("j").as("qj"), col("c").as("qc"),
        ((dotNative(col("s"), col("s")) -
          lit(2.0) * dotNative(col("s"), col("w"))) +
          dotNative(col("w"), col("w"))).as("d"))
    val scored = enc.join(broadcast(qd),
        col("j") === col("qj") && col("code") === col("qc"))
      .where(col("q_id") =!= col("c_id"))
      .groupBy("q_id", "c_id").agg(sum("d").as("adc"))
    val w = Window.partitionBy("q_id").orderBy(col("adc").asc, col("c_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("q_id"), col("c_id"), round(col("adc"), 6).as("adc_v"),
        col("rk").cast("long").as("rk"))
  }

  /** Symmetric int8 scalar quantization — the near-exact compression
    * sibling of [[pqAnn]]: per-vector scale = max|v|/127, codes =
    * round(v/scale) as tinyint. A float32 corpus shrinks 4× while
    * dot products stay within ~1% — the standard serving-layer
    * trade before PQ's lossier 32×. Returns
    * (vec_id, q_scale float, codes array<tinyint>).
    *
    * The scale materializes into its own column BEFORE the encode
    * lambda references it (an inlined array_max would re-evaluate
    * per element — the HOF re-evaluation trap). */
  def quantizeInt8(df: DataFrame): DataFrame = {
    val embD = col("embedding").cast("array<double>")
    df.select(col("vec_id"), embD.as("_e"))
      .withColumn("q_scale",
        greatest(aggregate(col("_e"), lit(0.0),
          (acc, v) => greatest(acc, abs(v))), lit(1e-30)) / lit(127.0))
      .select(col("vec_id"), col("q_scale").cast("float").as("q_scale"),
        transform(col("_e"), v => round(v / col("q_scale"), 0).cast("tinyint"))
          .as("codes"))
  }

  /** Cosine top-k over int8-quantized vectors:
    * dot(a, b) ≈ scale_a·scale_b·Σ qa·qb, norms from the quantized
    * self-dots — the whole scoring join carries only codes+scale,
    * never the float payload. Spec bounds the cosine error and the
    * top-k overlap vs the exact form. */
  def cosineTopKQuantized(corpus: DataFrame, queries: DataFrame,
                          k: Int): DataFrame = {
    def prep(df: DataFrame, idAs: String, p: String): DataFrame =
      quantizeInt8(df).select(
        col("vec_id").as(idAs),
        col("q_scale").as(s"${p}_scale"),
        col("codes").cast("array<double>").as(s"${p}_codes"))
        .withColumn(s"${p}_norm",
          sqrt(dotNative(col(s"${p}_codes"), col(s"${p}_codes"))))
    val q = prep(queries, "q_id", "q")
    val c = prep(corpus, "c_id", "c")
    val scored = c.crossJoin(broadcast(q))
      .where(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        (dotNative(col("q_codes"), col("c_codes")) /
          (col("q_norm") * col("c_norm"))).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("q_id"), col("c_id"), round(col("cos"), 6).as("cos_v"),
        col("rk").cast("long").as("rk"))
  }

  /** Binary (1-bit) quantization + Hamming re-rank — the most
    * aggressive compression tier after [[quantizeInt8]] (8 bit) and
    * [[pqAnn]] (sub-byte): each dimension keeps only its SIGN, so a
    * 64-dim float vector becomes two 32-bit words (32× smaller), and
    * the candidate metric is the Hamming distance between sign
    * patterns — a monotone proxy for angle (cos θ ≈ cos(π·h/d) under
    * the hyperplane-LSH argument; the same geometry
    * [[lshBucket]] exploits, evaluated exhaustively instead of
    * bucketed). Stage 1 ranks the corpus by packed-word Hamming
    * (bit_count over XOR — two ints per vector are ALL that moves);
    * stage 2 re-ranks only the `k·oversample` survivors with exact
    * float cosine.
    *
    * Packing folds each 32-dim half big-endian as acc·2+bit — no
    * 64-bit shift, so the words stay far from long overflow under
    * ANSI arithmetic.
    *
    * Scale: the Hamming scan carries 8 bytes/vector (the point of
    * binary quantization: the sign sketch of a 100 TB float corpus
    * fits hot storage); queries broadcast; the float payload is
    * touched only for the bounded candidate set via an equi-join on
    * c_id. Per-query windows partition by q_id. */
  def binaryHammingTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                        oversample: Int = 4): DataFrame = {
    def packWord(arr: Column): Column =
      aggregate(arr, lit(0L),
        (acc, v) => acc * 2 + when(v > 0, 1L).otherwise(0L))
    def signWords(df: DataFrame, idAs: String, p: String): DataFrame = {
      val e = col("embedding").cast("array<double>")
      df.select(col("vec_id").as(idAs),
        packWord(slice(e, 1, 32)).as(s"${p}_hi"),
        packWord(slice(e, 33, 32)).as(s"${p}_lo"))
    }
    val q = signWords(queries, "q_id", "q")
    val c = signWords(corpus, "c_id", "c")
    val ham = c.crossJoin(broadcast(q))
      .where(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        (bit_count(col("q_hi").bitwiseXOR(col("c_hi"))) +
          bit_count(col("q_lo").bitwiseXOR(col("c_lo"))))
          .cast("long").as("hamming"))
    val wCand = Window.partitionBy("q_id")
      .orderBy(col("hamming").asc, col("c_id").asc)
    val cand = ham.withColumn("_crk", row_number().over(wCand))
      .where(col("_crk") <= k * oversample)
    val qf = withNorm(queries, "q_id", "q_emb", "q_norm")
    val cf = withNorm(corpus, "c_id", "c_emb", "c_norm")
    val scored = cand.join(broadcast(qf), "q_id").join(cf, "c_id")
      .select(col("q_id"), col("c_id"), col("hamming"),
        scoreCos("q_emb", "c_emb", "q_norm", "c_norm").as("cos"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id").asc)
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
      .select(col("q_id"), col("c_id"), col("hamming"),
        round(col("cos"), 6).as("cos_v"), col("rk"))
  }

  /** Maximal Marginal Relevance re-rank (Carbonell & Goldstein 1998)
    * — the diversity-aware selection layer over any top-k retriever:
    * from each query's `poolK` dense-cosine candidates, greedily pick
    * `k` by
    *
    *   mmr(c) = λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)
    *
    * (step 1 is pure relevance — the max over the empty set is 0 by
    * convention). The training-data reading: `rel` = similarity to a
    * prototype, `sim` = redundancy among picks — the same
    * select-diverse-examples shape D4/SemDeDup optimize globally,
    * here per query.
    *
    * Determinism: rel and the pairwise sims round to 6 BEFORE any
    * selection, and the mmr score itself is computed in EXACT
    * integer tenth-micro units — λ must be a rational p/10, and
    * score = p·rel₆ − (10−p)·sim₆ over the 6-decimal integers. A
    * float λ·rel − (1−λ)·sim over 6-decimal inputs lands exactly ON
    * .5 at the 7th decimal routinely (0.7·x has 7 decimals), where
    * Spark's decimal-string HALF_UP and DuckDB's binary rounding
    * disagree — measured, not hypothetical. Integer scoring has no
    * rounding anywhere; the reported mmr_v = score/10⁷ divides
    * identically on both engines.
    *
    * Scale: selection is inherently sequential in k, but every round
    * touches only BOUNDED frames — the q×poolK candidate pool and
    * its poolK² pairwise-sim frame, both checkpointed once; rounds
    * compose anti-join → bounded max-agg → per-query top-1 window.
    * The corpus-sized work all lives in the candidate stage
    * ([[cosineTopK]] here; any ANN variant emitting
    * (q_id, c_id, cos_v) drops in). */
  def mmrRerank(corpus: DataFrame, queries: DataFrame, k: Int = 5,
                poolK: Int = 20, lambda: Double = 0.7): DataFrame = {
    val lamNum = math.round(lambda * 10).toInt
    require(lamNum / 10.0 == lambda && lamNum >= 0 && lamNum <= 10,
      s"lambda must be a tenth-rational in [0,1], got $lambda")
    def micro(c: Column): Column = round(c * lit(1e6), 0).cast("long")
    val cand = cosineTopK(corpus, queries, poolK)
      .select(col("q_id"), col("c_id"), col("cos_v").as("rel_v"),
        micro(col("cos_v")).as("rel_i"))
      .materialize(true)
    val ca = withNorm(corpus, "a_id", "a_emb", "a_norm")
    val cb = withNorm(corpus, "b_id", "b_emb", "b_norm")
    val sims = cand.select(col("q_id"), col("c_id").as("a_id"))
      .join(cand.select(col("q_id"), col("c_id").as("b_id")), "q_id")
      .where(col("a_id") =!= col("b_id"))
      .join(ca, "a_id").join(cb, "b_id")
      .select(col("q_id"), col("a_id"), col("b_id"),
        micro(round(scoreCos("a_emb", "b_emb", "a_norm", "b_norm"), 6))
          .as("sim_i"))
      .materialize(true)
    val w1 = Window.partitionBy("q_id")
      .orderBy(col("rel_i").desc, col("c_id").asc)
    var selected = cand.withColumn("_r", row_number().over(w1))
      .where(col("_r") === 1)
      .select(col("q_id"), col("c_id"), col("rel_v"),
        (lit(lamNum.toLong) * col("rel_i") / lit(1e7)).as("mmr_v"),
        lit(1L).as("step"))
    for (step <- 2 to k) {
      val rem = cand.join(selected.select(col("q_id"), col("c_id")),
        Seq("q_id", "c_id"), "left_anti")
      val ms = sims.withColumnRenamed("a_id", "c_id")
        .join(selected.select(col("q_id"), col("c_id").as("b_id")),
          Seq("q_id", "b_id"))
        .groupBy("q_id", "c_id").agg(max("sim_i").as("max_sim_i"))
      val scored = rem.join(ms, Seq("q_id", "c_id"))
        .withColumn("mmr_i", lit(lamNum.toLong) * col("rel_i") -
          lit((10 - lamNum).toLong) * col("max_sim_i"))
      val wS = Window.partitionBy("q_id")
        .orderBy(col("mmr_i").desc, col("c_id").asc)
      val pick = scored.withColumn("_r", row_number().over(wS))
        .where(col("_r") === 1)
        .select(col("q_id"), col("c_id"), col("rel_v"),
          (col("mmr_i") / lit(1e7)).as("mmr_v"),
          lit(step.toLong).as("step"))
      selected = selected.unionByName(pick).materialize(true)
    }
    selected
  }

  /** LSH-blocked embedding near-duplicate pairs — the 100 TB path:
    * candidates are pairs sharing any table's hyperplane bucket
    * (per-bucket equi-join, never all-pairs), then exact cosine > τ
    * on the candidate set only. Output = candidates ∩ threshold; the
    * probabilistic recall (rising with `tables`, falling with
    * distance) is the standard LSH trade — measured against the
    * brute-force form in the spec.
    *
    * Scale: per-table candidate volume is Σ_bucket |bucket|²/2 ≈
    * N²/2^planes partitioned across buckets — so a FIXED plane count
    * is quadratic in corpus size (the 10× scale rehearsal measured
    * 58× runtime at planes=4: buckets held 10× the vectors, pair
    * joins 100×). `planes <= 0` (the default) derives the count from
    * corpus density, targeting ~32 vectors per bucket per table
    * (one bounded count() job); recall for strong near-dups stays
    * high through the `tables` OR while candidate volume stays
    * ~linear. Pass an explicit plane count to pin the bucket family
    * (the sf0.01 oracle gate resolves to 4, the fixed-count
    * behavior, at its corpus size). Combine with exact-dedup-first
    * so identical-content clusters never reach the bucket join. */
  def cosineNearDupLsh(corpus: DataFrame, threshold: Double, dim: Int = 64,
                       planes: Int = 0, tables: Int = 6): DataFrame = {
    val pl = derivePlanes(planes, corpus)
    val banded = (0 until tables).map { t =>
      corpus.select(col("vec_id"), lit(t).as("tbl"),
        lshBucket(col("embedding"), dim, pl, t).as("bucket"))
    }.reduce(_ unionByName _)
    val cands = banded.as("l").join(banded.as("r"),
        col("l.tbl") === col("r.tbl") && col("l.bucket") === col("r.bucket") &&
          col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("id_a"), col("r.vec_id").as("id_b"))
      .distinct()
    val a = withNorm(corpus, "id_a", "emb_a", "norm_a")
    val b = withNorm(corpus, "id_b", "emb_b", "norm_b")
    cands.join(a, "id_a").join(b, "id_b")
      .select(col("id_a"), col("id_b"),
        scoreCos("emb_a", "emb_b", "norm_a", "norm_b").as("cos"))
      .where(col("cos") > threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos_v"))
  }

  /** Embedding-space benchmark decontamination: flags every corpus
    * vector whose cosine to ANY benchmark vector exceeds the
    * threshold — the semantic complement of the shingle-overlap
    * decontamination in [[Corpus.decontaminate]] (catches
    * paraphrased eval leakage that n-gram overlap misses).
    *
    * Scale: candidates come from the same multi-table hyperplane-LSH
    * bucketing as [[cosineNearDupLsh]], but CROSS-table — corpus
    * buckets equi-join benchmark buckets, so the work is
    * |bucket-collisions|, never |corpus|×|benchmark|; exact cosine
    * verifies candidates only, and the per-vector verdict is a
    * hash aggregation keyed by vec_id joined back on vec_id. */
  def decontaminateEmbed(corpus: DataFrame, benchmark: DataFrame,
                         threshold: Double, dim: Int = 64, planes: Int = 4,
                         tables: Int = 6): DataFrame = {
    def banded(df: DataFrame, idAs: String) = (0 until tables).map { t =>
      df.select(col("vec_id").as(idAs), lit(t).as("tbl"),
        lshBucket(col("embedding"), dim, planes, t).as("bucket"))
    }.reduce(_ unionByName _)
    val cands = banded(corpus, "c_id")
      .join(banded(benchmark, "b_id"), Seq("tbl", "bucket"))
      .select("c_id", "b_id").distinct()
    val c = withNorm(corpus, "c_id", "emb_c", "norm_c")
    val b = withNorm(benchmark, "b_id", "emb_b", "norm_b")
    val hits = cands.join(c, "c_id").join(b, "b_id")
      .select(col("c_id"),
        scoreCos("emb_c", "emb_b", "norm_c", "norm_b").as("cos"))
      .where(col("cos") > threshold)
      .groupBy("c_id")
      .agg(max("cos").as("max_cos"), count(lit(1)).as("n_hits"))
    corpus.select(col("vec_id"))
      .join(hits.withColumnRenamed("c_id", "vec_id"), Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(round(col("max_cos"), 6), lit(0.0)).as("max_bench_cos"),
        coalesce(col("n_hits"), lit(0L)).as("n_bench_hits"),
        col("max_cos").isNotNull.cast("int").as("contaminated"))
  }

  /** Top principal component of the embedding cloud by distributed
    * power iteration — the spectrum probe behind embedding
    * whitening/debiasing (a dominant component with high explained
    * variance is the classic "rogue dimension" of sentence-embedding
    * spaces; All-but-the-Top, Mu & Viswanath 2018, removes exactly
    * this vector). Two corpus map stages: per-dim means, and the
    * per-row outer product flattened MAP-SIDE (`transform×transform`
    * → one posexplode into a hash aggregate — the shuffle carries
    * d² partial sums per partition, never n·d² element rows). The
    * d²-row covariance `C = S/n − μμᵀ` is the bounded model artifact
    * (rounded 6dp so both engines iterate IDENTICAL matrices), local-
    * checkpointed once; the corpus is never touched again. Power
    * iteration then runs as `rounds` broadcast joins on the d²-row
    * frame: w = C·v, v = round(w/‖w‖₂, 9) — per-round rounding pins
    * the iterate cross-engine (aggregation-order ulps are 1e-15
    * relative, nine decimals is far coarser). v₀ = 1/√d uniform —
    * deterministic, and never orthogonal to the top component of a
    * covariance with nonnegative diagonal dominance in practice;
    * after R rounds both engines hold the same vector by
    * construction (this is "power iteration after R rounds", not
    * "the eigenvector to machine precision"). λ = vᵀCv (Rayleigh),
    * explained variance = λ / tr(C).
    *
    * Scale: O(n·d²) flops in one pass — the irreducible covariance
    * cost — with d²-bounded shuffle and driver state; the iteration
    * is d²-row joins with d-row broadcast sides, corpus-free. */
  /** Spark-identical HALF_UP rounding (the Round expression's double
    * path: BigDecimal.valueOf → setScale → toDouble), for driver-side
    * arithmetic that must land on the same decimals as the former
    * in-plan round() calls. */
  private def roundAt(x: Double, scale: Int): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()

  /** The PCA machinery shared by [[pcaPower]], [[pcaSpectrum]] and
    * [[allButTop]]: per-dim means (rounded 6dp), the 6dp-rounded
    * dense d×d covariance, and the top component after `rounds`
    * power-iteration rounds. The corpus is touched exactly twice
    * (mean pass + outer-product pass — as before); the d²-cell
    * covariance is a BOUNDED model artifact (d=64 → 4096 doubles,
    * the same driver-state class as the k-means seeds and PQ
    * codebooks), so the power iteration runs on the driver instead
    * of as `rounds` broadcast-join jobs over a 4096-row frame — the
    * per-round 9dp normalization pins the iterate exactly as before
    * (aggregation-order ulps are 1e-15 relative, nine decimals is
    * far coarser). */
  private def pcaParts(corpus: DataFrame, rounds: Int, dim: Int)
      : (Array[Double], Array[Array[Double]], Array[Double]) = {
    val emb = corpus.select(col("vec_id"),
      col("embedding").cast("array<double>").as("e"))
    val muRows = emb.select(posexplode(col("e")).as(Seq("k", "v")))
      .groupBy("k")
      .agg(round(avg("v"), 6).as("m"), count(lit(1)).as("n"))
      .collect()
    val mu = Array.ofDim[Double](dim)
    var n = 0L
    muRows.foreach { r =>
      mu(r.getInt(0)) = r.getDouble(1); n = r.getLong(2)
    }
    // one corpus count n normalizes every covariance cell — valid
    // only when all embeddings carry all `dim` elements. Surface a
    // ragged corpus instead of silently normalizing every cell by
    // whichever dim's count was collected last (ADVICE r12).
    require(muRows.forall(_.getLong(2) == n),
      s"pca: ragged embeddings (per-dim counts differ; expected $n everywhere)")
    val cov = Array.ofDim[Double](dim, dim)
    emb
      .select(posexplode(flatten(transform(col("e"),
        vi => transform(col("e"), vj => vi * vj)))).as(Seq("idx", "p")))
      .groupBy(expr(s"idx div $dim").cast("int").as("i"),
        pmod(col("idx"), lit(dim)).cast("int").as("j"))
      .agg(sum("p").as("s"))
      .collect()
      .foreach { r =>
        val (i, j) = (r.getInt(0), r.getInt(1))
        cov(i)(j) = roundAt(r.getDouble(2) / n - mu(i) * mu(j), 6)
      }
    (mu, cov, powerIterate(cov, rounds, dim))
  }

  /** `rounds` power-iteration rounds on the dense covariance from
    * the uniform 1/√d start, per-round 9dp normalization — driver
    * arithmetic over the bounded d×d artifact, summing in ascending
    * index order. */
  private def powerIterate(cov: Array[Array[Double]], rounds: Int,
                           dim: Int): Array[Double] = {
    var v = Array.fill(dim)(roundAt(1.0 / math.sqrt(dim), 9))
    for (_ <- 1 to rounds) {
      val w = Array.tabulate(dim) { i =>
        var s = 0.0
        var j = 0
        while (j < dim) { s += cov(i)(j) * v(j); j += 1 }
        s
      }
      val nw = math.sqrt(w.map(x => x * x).sum)
      v = w.map(x => roundAt(x / nw, 9))
    }
    v
  }

  /** Raw (unrounded) Rayleigh quotient vᵀMv, ascending-index sum. */
  private def rayleighRaw(mat: Array[Array[Double]],
                          v: Array[Double]): Double = {
    var s = 0.0
    for (i <- v.indices; j <- v.indices) s += mat(i)(j) * v(i) * v(j)
    s
  }

  def pcaPower(corpus: DataFrame, rounds: Int = 8,
               dim: Int = 64): DataFrame = {
    val (_, cov, v) = pcaParts(corpus, rounds, dim)
    val lam = rayleighRaw(cov, v)
    val tr = (0 until dim).map(i => cov(i)(i)).sum
    val spark = corpus.sparkSession
    import spark.implicits._
    v.zipWithIndex.toSeq
      .map { case (l, j) =>
        (j.toLong, l, roundAt(lam, 6), roundAt(lam / tr, 6)) }
      .toDF("pos", "loading", "eigenvalue", "var_explained")
  }

  /** Second principal component by Hotelling deflation — the
    * spectral-gap card completing [[pcaPower]]: deflate
    * C₂ = C − λ₁·v₁v₁ᵀ (both factors pre-rounded, so two engines
    * deflate the IDENTICAL matrix), power-iterate C₂ the same R
    * rounds, and report λ₂, the gap ratio λ₂/λ₁ (how dominant the
    * rogue direction really is — the number that decides whether
    * All-but-the-Top should remove one component or several), and
    * |v₁·v₂| as the orthogonality audit (near 0 when R rounds have
    * converged; a drifting value flags an unresolved near-degenerate
    * pair rather than failing silently).
    *
    * Scale: one extra d²-row join over the checkpointed covariance
    * to deflate, then the same corpus-free d²×d-broadcast iteration;
    * the corpus is still touched exactly once (inside
    * [[pcaParts]]). */
  def pcaSpectrum(corpus: DataFrame, rounds: Int = 8,
                  dim: Int = 64): DataFrame = {
    val (_, cov, v1) = pcaParts(corpus, rounds, dim)
    val l1 = roundAt(rayleighRaw(cov, v1), 6)
    val cov2 = Array.tabulate(dim, dim)((i, j) =>
      roundAt(cov(i)(j) - l1 * v1(i) * v1(j), 6))
    val v2 = powerIterate(cov2, rounds, dim)
    val l2 = roundAt(rayleighRaw(cov2, v2), 6)
    val orth = roundAt(math.abs(
      (0 until dim).map(j => v1(j) * v2(j)).sum), 6)
    val spark = corpus.sparkSession
    import spark.implicits._
    v2.zipWithIndex.toSeq
      .map { case (l, j) =>
        (j.toLong, l, l1, l2, roundAt(l2 / l1, 6), orth) }
      .toDF("pos", "loading2", "eigenvalue1", "eigenvalue2",
        "gap_ratio", "orthogonality")
  }

  /** All-but-the-Top embedding correction (Mu & Viswanath 2018):
    * center each vector and remove its projection on the dominant
    * component from [[pcaPower]] — the standard isotropy fix that
    * measurably improves cosine-similarity quality on anisotropic
    * encoder outputs. Emitted per vector: the projection coordinate,
    * the centered norm, and the corrected norm (Pythagoras:
    * ‖x'‖² = ‖x−μ‖² − proj², asserted in spec), so downstream ops
    * can both apply the fix and audit how much mass the rogue
    * direction held.
    *
    * Scale: μ and v assemble into ONE broadcast row (d-element
    * arrays — the bounded model artifact); the per-vector math is a
    * fixed-order [[dotNative]] fold, map-only — the corpus never
    * shuffles. */
  def allButTop(corpus: DataFrame, rounds: Int = 8,
                dim: Int = 64): DataFrame = {
    val (mu, _, v) = pcaParts(corpus, rounds, dim)
    // μ and v ship as LITERAL arrays in the plan (the broadcast-as-
    // literal rewrite the LSH planes use) — no crossJoin stage
    corpus.select(col("vec_id"),
      col("embedding").cast("array<double>").as("e"))
      .withColumn("mu", typedLit(mu.toSeq))
      .withColumn("top", typedLit(v.toSeq))
      .withColumn("xc", zip_with(col("e"), col("mu"), (x, m) => x - m))
      .select(col("vec_id"),
        dotNative(col("xc"), col("top")).as("proj"),
        dotNative(col("xc"), col("xc")).as("d2"))
      .select(col("vec_id"), round(col("proj"), 6).as("proj_v"),
        round(sqrt(col("d2")), 6).as("norm_centered"),
        round(sqrt(greatest(col("d2") - col("proj") * col("proj"),
          lit(0.0))), 6).as("norm_abtt"))
  }

  /** Embedding-cosine near-duplicate pairs above a threshold.
    * Brute-force form — the small-N recall oracle for
    * [[cosineNearDupLsh]]; all-pairs, never the production path. */
  def cosineNearDup(corpus: DataFrame, threshold: Double): DataFrame = {
    val a = withNorm(corpus, "id_a", "emb_a", "norm_a")
    val b = withNorm(corpus, "id_b", "emb_b", "norm_b")
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        scoreCos("emb_a", "emb_b", "norm_a", "norm_b").as("cos"))
      .where(col("cos") > threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos_v"))
  }
}
