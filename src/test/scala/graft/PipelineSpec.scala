package graft

import org.apache.spark.sql.functions._
import graft.pipeline._

class PipelineSpec extends SparkSpec {

  test("Kneser-Ney bigram LM matches the hand-computed factorization") {
    val s = spark
    import s.implicits._
    // bigrams: (a,b)x2, (b,a)x1, (a,c)x1 → n1=2 n2=1 → D=0.5, types=3
    // p(b|a) = 1.5/3 + 0.5·2/3·(1/3) = 0.611111
    // p(a|b) = 0.5/1 + 0.5·1/1·(1/3) = 0.666667
    // p(c|a) = 0.5/3 + 0.5·2/3·(1/3) = 0.277778
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val lm = Corpus.knBigramLm(docs).collect()
      .map(r => (r.getAs[String]("u"), r.getAs[String]("w")) ->
        (r.getAs[Long]("c_uw"), r.getAs[Double]("discount"),
          r.getAs[Double]("p_kn"))).toMap
    assert(lm(("a", "b")) == ((2L, 0.5, 0.611111)))
    assert(lm(("b", "a")) == ((1L, 0.5, 0.666667)))
    assert(lm(("a", "c")) == ((1L, 0.5, 0.277778)))
    // doc 2 has the single bigram (a,c): H = −log2(0.277778…),
    // ppl = 2^H = exactly 1/p = 3.6
    val ppl = Corpus.knPerplexity(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("cross_entropy_bits"),
          r.getAs[Double]("ppl"))).toMap
    assert(ppl(2L) == ((1L, 1.847997, 3.6)))
    assert(ppl(1L)._1 == 3L)
  }

  test("trigram KN backs off through continuation counts, hand-checked") {
    val s = spark
    import s.implicits._
    // trigrams: (a,b,c)x2, (b,c,a), (c,a,b), (a,b,d) → D3 = 3/5
    // UNPRUNED (minCount=1): continuation layer has every (v,w)
    // preceded by one context → D2 = 1
    // p2(c|b) = max(1−1,0)/2 + 1·(2/2)·p1(c)=0.25 → 0.25
    // p3(c|a,b) = 1.4/3 + 0.6·(2/3)·0.25 = 0.566666667
    val docs = Seq((1L, "a b c a b c"), (2L, "a b d")).toDF("doc_id", "text")
    val r = Corpus.knTrigramLm(docs, minCount = 1).collect()
      .map(x => (x.getAs[String]("u"), x.getAs[String]("v"),
        x.getAs[String]("w")) -> x).toMap
    val abc = r(("a", "b", "c"))
    assert(abc.getAs[Long]("c_uvw") == 2L)
    assert(abc.getAs[Double]("d3") == 0.6)
    assert(abc.getAs[Double]("d2") == 1.0)
    assert(abc.getAs[Double]("p2_backoff") == 0.25)
    assert(abc.getAs[Double]("p_kn3") == 0.566666667)
    // PRUNED (default minCount=2): singletons leave the model, their
    // mass rides λ₃ (SRILM pruned-mass rule). Retained = {(a,b,c):2}
    // only; hist(a,b): c_uv=3, retained 1, pruned mass 1;
    // cont = {(b,c):1} → D2 = 1; p2(c|b) = 0 + 1·(1/1)·(1/4) = 0.25;
    // λ₃(a,b) = (0.6·1 + 1)/3; p3 = 1.4/3 + (1.6/3)·0.25 = 0.6 exact
    val p = Corpus.knTrigramLm(docs).collect()
    assert(p.length == 1, "only the retained trigram stays in the model")
    val pr = p(0)
    assert(pr.getAs[String]("u") == "a" && pr.getAs[String]("w") == "c")
    assert(pr.getAs[Double]("lam3") ==
      math.rint((0.6 * 1 + 1) / 3.0 * 1e9) / 1e9)
    assert(pr.getAs[Double]("p_kn3") == 0.6)
    // pruned perplexity: every trigram scores (backoff for the
    // singletons), normalization intact
    val ppl = Corpus.knTrigramPerplexity(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("n_trigrams"))
      .toMap
    assert(ppl == Map(1L -> 4L, 2L -> 1L),
      "pruned trigrams must still score through the backoff chain")
  }

  test("exact dedup flags planted duplicates") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "aaa bbb"), (2L, "ccc"), (3L, "aaa bbb"))
      .toDF("doc_id", "text")
    val r = Dedup.exact(docs).collect().map(x =>
      x.getAs[Long]("doc_id") -> x.getAs[Int]("is_dup")).toMap
    assert(r == Map(1L -> 0, 2L -> 0, 3L -> 1))
  }

  test("identical docs share full minhash signature; jaccard = 1") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "an entirely different sentence about spark engines here"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignature(docs, 8).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("doc_a", "doc_b")
    val j = Dedup.jaccardPairs(docs, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((1L, 2L)) == 1.0)
    assert(j((1L, 3L)) == 0.0)
  }

  test("containment flags a quoted subset that jaccard underrates") {
    val s = spark
    import s.implicits._
    // doc 2 is a strict prefix of doc 1: every one of its shingles
    // is contained (contain_b = 1) while jaccard is only 3/7
    val docs = Seq(
      (1L, "one two three four five six seven eight nine"),
      (2L, "one two three four five"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val r = Dedup.containmentPairs(docs, pairs).collect()(0)
    assert(r.getAs[Double]("contain_b") == 1.0)
    assert(r.getAs[Double]("contain_a") == math.rint(3.0 / 7 * 1e6) / 1e6)
    val j = Dedup.jaccardPairs(docs, pairs).collect()(0).getDouble(2)
    assert(j < 0.5, s"jaccard underrates the subset: $j")
  }

  test("simhash: identical docs equal, near docs close in hamming") {
    val s = spark
    import s.implicits._
    val base = "spark streams join window aggregate shuffle partition " +
      "broadcast filter project scan codegen stage task executor driver"
    val docs = Seq((1L, base), (2L, base), (3L, "zz yy xx ww vv uu tt ss"))
      .toDF("doc_id", "text")
    val fp = Dedup.simhash(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash_v")).toMap
    assert(fp(1L) == fp(2L))
    assert(java.lang.Long.bitCount(fp(1L) ^ fp(3L)) > 4)
    // halves recombine into the signed 64-bit fingerprint
    val row = Dedup.simhash(docs).where(col("doc_id") === 1).collect()(0)
    val rebuilt = (row.getAs[Long]("fp_hi") << 32) | row.getAs[Long]("fp_lo")
    assert(rebuilt == row.getAs[Long]("simhash_v"))
  }

  test("minhash hot-bucket cap bounds pair explosion on planted clusters") {
    val s = spark
    import s.implicits._
    // 60 identical boilerplate docs + 4 distinct docs: uncapped LSH
    // would emit 60*59/2 = 1770 boilerplate pairs through every band
    val docs = ((1L to 60L).map(i => (i, "copy of the exact same boilerplate text here")) ++
      Seq((101L, "first unique document about engines"),
          (102L, "second unique document about windows"),
          (103L, "third unique document about shuffles"),
          (104L, "fourth unique document about buckets"))).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignature(docs, 16)
    val capped = Dedup.minhashCandidates(sigs, 8, 2, maxBucket = 10).count()
    val uncapped = Dedup.minhashCandidates(sigs, 8, 2, maxBucket = 1000000).count()
    assert(uncapped >= 1770L, s"expected boilerplate pair explosion, got $uncapped")
    assert(capped < 100L, s"cap should drop hot buckets, got $capped pairs")
  }

  test("simhash hot-block cap bounds pair explosion on planted clusters") {
    val s = spark
    import s.implicits._
    // 60 identical boilerplate docs share BOTH fingerprint halves:
    // uncapped half-block join emits ≥ 60*59/2 = 1770 pairs on one key
    val docs = ((1L to 60L).map(i => (i, "copy of the exact same boilerplate text here")) ++
      Seq((101L, "first unique document about engines"),
          (102L, "second unique document about windows"))).toDF("doc_id", "text")
    val fps = Dedup.simhash(docs)
    val uncapped = Dedup.simhashCandidates(fps, 8, maxBlock = 1000000).count()
    val capped = Dedup.simhashCandidates(fps, 8, maxBlock = 10).count()
    assert(uncapped >= 1770L, s"expected boilerplate pair explosion, got $uncapped")
    assert(capped < 100L, s"cap should drop hot blocks, got $capped pairs")
  }

  test("shingle cache re-registers after clearShingleCache") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "one two three four"), (2L, "five six seven eight"))
      .toDF("doc_id", "text")
    val before = Dedup.shingleHashes(docs)
    assert(Dedup.shingleHashes(docs) eq before, "same plan must hit the cache")
    Dedup.clearShingleCache()
    val after = Dedup.shingleHashes(docs)
    assert(!(after eq before), "cleared cache must rebuild the frame")
    assert(after.count() == before.count())
    Dedup.clearShingleCache()
  }

  test("cosine top-k: self-similar vectors rank first") {
    val s = spark
    import s.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val top = Similarity.cosineTopK(vecs, vecs.where(col("vec_id") === 1), 1)
      .collect()(0)
    assert(top.getAs[Long]("c_id") == 2L)
  }

  test("LSH ANN recall vs brute force on real embeddings") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.where(col("vec_id") < 20)
    val exact = Similarity.cosineTopK(emb, q, 5).select("q_id", "c_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshAnn(emb, q, 5).select("q_id", "c_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall > 0.55, s"LSH recall $recall too low") // 8 tables x 4 planes
  }

  test("dot_native is registered as a SQL function via extensions") {
    val r = spark.sql(
      "SELECT dot_native(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(r == 32.0)
  }

  test("resize plan aspect-fits without upscaling") {
    val s = spark
    import s.implicits._
    val feats = Seq((1L, 2048, 1024), (2L, 100, 50))
      .toDF("media_id", "width", "height")
    val r = Multimodal.resizePlan(feats, 512).collect()
      .map(x => x.getAs[Long]("media_id") ->
        (x.getAs[Int]("out_width"), x.getAs[Int]("out_height"))).toMap
    assert(r(1L) == (512, 256))  // downscaled, aspect kept
    assert(r(2L) == (100, 50))   // never upscaled
  }

  test("dup clustering follows transitive chains to one canonical doc") {
    val s = spark
    import s.implicits._
    val docs = (1L to 7L).map(Tuple1(_)).toDF("doc_id")
    // chain 1-2-3-4 (multi-hop, no direct 1-4 edge) + pair 5-6 + singleton 7
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L))
      .toDF("doc_a", "doc_b")
    val r = Corpus.dupClusters(docs, pairs).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("cluster_id"), x.getAs[Int]("is_canonical"))).toMap
    assert(r(1L) == (1L, 1) && r(2L) == (1L, 0) && r(3L) == (1L, 0) && r(4L) == (1L, 0))
    assert(r(5L) == (5L, 1) && r(6L) == (5L, 0))
    assert(r(7L) == (7L, 1))
  }

  test("span dedup charges later docs for repeated word windows") {
    val s = spark
    import s.implicits._
    // doc 2 repeats doc 1's first 4-word span verbatim; doc 3 is fresh
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta other words"),
      (3L, "totally unrelated span of words here"))
      .toDF("doc_id", "text")
    val r = Dedup.spanDedup(docs, k = 4).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_spans"), x.getAs[Long]("dup_spans"))).toMap
    // each doc = 6 words → spans of 4 + trailing 2
    assert(r(1L) == (2L, 0L))
    assert(r(2L) == (2L, 1L)) // its first span appeared in doc 1
    assert(r(3L) == (2L, 0L))
  }

  test("kmeans separates well-spaced blobs and converges assignment") {
    val s = spark
    import s.implicits._
    // two tight blobs far apart in 4-d; seeds (vec_id 0,1) land one
    // per blob, so one Lloyd round must keep blob membership intact
    val blobA = Seq(0L, 2L, 4L).map(i => (i, Seq(10.0f, 10f, 10f, 10f)
      .zipWithIndex.map { case (v, j) => v + (i + j) * 0.01f }))
    val blobB = Seq(1L, 3L, 5L).map(i => (i, Seq(-10.0f, -10f, -10f, -10f)
      .zipWithIndex.map { case (v, j) => v - (i + j) * 0.01f }))
    val emb = (blobA ++ blobB).toDF("vec_id", "embedding")
    val r = Similarity.kmeans(emb, k = 2, iters = 2).collect()
      .map(x => x.getAs[Long]("vec_id") -> x.getAs[Int]("cluster")).toMap
    assert(Set(0L, 2L, 4L).map(r) == Set(0))
    assert(Set(1L, 3L, 5L).map(r) == Set(1))
  }

  test("semantic near-dup finds co-clustered pairs, skips cross-cluster") {
    val s = spark
    import s.implicits._
    // blob A holds a genuine near-dup pair (0,2); blob B's members are
    // mutually near; any A↔B pair is anti-correlated (cos < 0)
    val emb = Seq(
      (0L, Seq(1.0f, 0f, 0f, 0f)), (2L, Seq(0.999f, 0.04f, 0f, 0f)),
      (1L, Seq(-1.0f, 0f, 0f, 0f)), (3L, Seq(-0.999f, -0.04f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.semanticNearDup(emb, 0.9, k = 2, iters = 1)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 2L)))
    assert(pairs.contains((1L, 3L)))
    assert(!pairs.exists { case (a, b) => (a % 2) != (b % 2) },
      s"cross-cluster pair leaked: $pairs")
  }

  test("source overlap matrix: shared crawl shows, disjoint sources don't") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "srcA", "the quick brown fox jumps over the lazy dog"),
      (2L, "srcB", "the quick brown fox jumps over the lazy dog"),
      (3L, "srcC", "completely different material about spark engines"))
      .toDF("doc_id", "source", "text")
    val m = Corpus.sourceOverlap(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("shared"), r.getAs[Double]("jaccard_v"))).toMap
    assert(m(("srcA", "srcB"))._2 == 1.0) // identical shingle sets
    assert(!m.contains(("srcA", "srcC")) || m(("srcA", "srcC"))._1 == 0L)
  }

  test("vocabulary ranks by frequency with lexicographic tie-break") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "b b b a a c"), (2L, "a c")).toDF("doc_id", "text")
    val r = Corpus.vocabulary(docs, topN = 2).collect()
      .map(x => (x.getAs[String]("word"), x.getAs[Long]("tf"),
        x.getAs[Long]("df"), x.getAs[Long]("rank")))
    // a: tf=3 df=2; b: tf=3 df=1; c: tf=2 df=2 — tie a/b breaks to a
    assert(r.toSeq == Seq(("a", 3L, 2L, 1L), ("b", 3L, 1L, 2L)))
  }

  test("mixture sampling is deterministic and respects weight order") {
    val s = spark
    import s.implicits._
    val docs = (1L to 200L).map(i =>
      (i, if (i % 2 == 0) "srcA" else "srcB", "w " * 50)).toDF("doc_id", "source", "text")
    // srcA gets 10× srcB's share of the same budget
    val m = Corpus.mixtureSample(docs, Map("srcA" -> 500), defaultPermille = 50,
      budgetTokens = 2000L)
    val kept = m.groupBy("source").agg(sum("sampled").as("k")).collect()
      .map(x => x.getString(0) -> x.getAs[Long]("k")).toMap
    assert(kept("srcA") > kept("srcB"), s"weights not respected: $kept")
    // deterministic draw: same inputs → identical sample
    val again = Corpus.mixtureSample(docs, Map("srcA" -> 500), 50, 2000L)
      .collect().map(r => r.getLong(0) -> r.getInt(4)).toMap
    m.collect().foreach(r => assert(again(r.getLong(0)) == r.getInt(4)))
  }

  test("tfidf ranks rare distinctive words above corpus-wide ones") {
    val s = spark
    import s.implicits._
    // "quantum" appears only in doc 1; "the" is everywhere (idf = 0)
    val docs = Seq(
      (1L, "the quantum engine the the"),
      (2L, "the ordinary engine the"),
      (3L, "the plain text the")).toDF("doc_id", "text")
    val top1 = TextAnalysis.tfidfKeywords(docs, topK = 1).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[String]("word")).toMap
    assert(top1(1L) == "quantum")
    assert(top1(2L) == "ordinary")
    assert(top1(3L) == "plain")
  }

  test("unigram entropy: repetition scores 0, uniform text scores ln k") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "spam spam spam spam"), (2L, "a b c d"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.unigramEntropy(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Double]("entropy")).toMap
    assert(r(1L) == 0.0)
    assert(math.abs(r(2L) - math.log(4.0)) < 1e-6)
  }

  test("unigram LM cross-entropy: common words score cheaper than rare") {
    val s = spark
    import s.implicits._
    // corpus counts: a=5, b=1 → N=6, V=2; p(a)=(5+1)/8, p(b)=(1+1)/8
    val docs = Seq((1L, "a a a a"), (2L, "a b")).toDF("doc_id", "text")
    val r = TextAnalysis.unigramCrossEntropy(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Double]("cross_entropy")).toMap
    assert(math.abs(r(1L) - -math.log(0.75)) < 1e-6)
    assert(math.abs(r(2L) - -(math.log(0.75) + math.log(0.25)) / 2) < 1e-6)
    assert(r(2L) > r(1L), "doc with the rare word must score higher")
  }

  test("bigram LM cross-entropy scores transitions, not just words") {
    val s = spark
    import s.implicits._
    // c12: aa=2, ab=1, ba=1; c1: a=3, b=1; V=2
    // p(a|a)=3/5, p(b|a)=2/5, p(a|b)=2/3
    val docs = Seq((1L, "a a a"), (2L, "a b a")).toDF("doc_id", "text")
    val r = TextAnalysis.bigramCrossEntropy(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Double]("cross_entropy")).toMap
    assert(math.abs(r(1L) - -math.log(0.6)) < 1e-6)
    assert(math.abs(r(2L) - -(math.log(0.4) + math.log(2.0 / 3)) / 2) < 1e-6)
    // single-word docs have no transitions and drop out
    val one = Seq((9L, "solo")).toDF("doc_id", "text")
    assert(TextAnalysis.bigramCrossEntropy(one).count() == 0)
  }

  test("Kneser-Ney bigram LM: discount + continuation backoff, sums to 1") {
    val s = spark
    import s.implicits._
    // c12: aa=2 ab=1 ba=1; fwd: a→(c1=3,n=2) b→(c1=1,n=1);
    // bwd: a←2 b←1; T=3, D=0.75
    //   P(a|a) = 1.25/3 + .75·(2/3)·(2/3) = 0.75
    //   P(b|a) = 0.25/3 + .75·(2/3)·(1/3) = 0.25   (context a sums to 1)
    //   P(a|b) = 0.25/1 + .75·(1/1)·(2/3) = 0.75
    val docs = Seq((1L, "a a a"), (2L, "a b a")).toDF("doc_id", "text")
    val r = TextAnalysis.knBigramCrossEntropy(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Double]("cross_entropy")).toMap
    assert(math.abs(r(1L) - -math.log(0.75)) < 1e-6)
    assert(math.abs(r(2L) - -(math.log(0.25) + math.log(0.75)) / 2) < 1e-6)
    // the continuation backoff is what separates KN from the add-one
    // bigram LM: under add-one, P(a|b)=2/3 < 0.75 — "a" is a cheap
    // continuation here because it follows BOTH contexts
    val one = Seq((9L, "solo")).toDF("doc_id", "text")
    assert(TextAnalysis.knBigramCrossEntropy(one).count() == 0)
  }

  test("bm25: tf raises score, length normalization lowers it, misses drop") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "x y"),                 // tf=1, dl=2
      (2L, "x y y y y y y y y y"), // tf=1, dl=10 → length-penalized
      (3L, "x x y"),               // tf=2 → saturated boost
      (4L, "y y")).toDF("doc_id", "text")
    val r = TextAnalysis.bm25(docs, Seq("x")).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Double]("bm25_v")).toMap
    assert(!r.contains(4L), "doc without any query term must drop")
    assert(r(1L) > r(2L), "same tf, longer doc must score lower")
    assert(r(3L) > r(1L), "higher tf must score higher")
  }

  test("c4 filters flag braces and boilerplate phrases, gate on words") {
    val s = spark
    import s.implicits._
    val long = ("w " * 60).trim
    val docs = Seq(
      (1L, long),                          // clean, 60 words → pass
      (2L, long + " {"),                   // brace → fail
      (3L, long + " lorem ipsum dolor"),   // phrase → fail
      (4L, "short doc. two sentences!")).toDF("doc_id", "text")
    val r = TextAnalysis.c4Filters(docs).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Int]("c4_pass"), x.getAs[Long]("n_sentences"))).toMap
    assert(r(1L)._1 == 1 && r(2L)._1 == 0 && r(3L)._1 == 0)
    assert(r(4L)._1 == 0, "short doc fails the word-count gate")
    assert(r(4L)._2 == 2, "sentence split on terminal punctuation")
  }

  test("dsir weights favor target-like documents") {
    val s = spark
    import s.implicits._
    // target doc is all "aaa" (bucket 7); "bbb" (bucket 38) never
    // appears in the target → docs of "aaa" must outweigh docs of "bbb"
    val docs = Seq(
      (1L, "aaa aaa aaa"), // the target
      (2L, "aaa aaa aaa"),
      (3L, "bbb bbb bbb")).toDF("doc_id", "text")
    val r = Corpus.dsirWeights(docs, col("doc_id") === 1L).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Double]("dsir_logweight")).toMap
    assert(r(2L) > r(3L),
      s"target-like doc must outweigh off-target: ${r(2L)} vs ${r(3L)}")
  }

  test("bpe pair stats weight by word frequency, rank deterministically") {
    val s = spark
    import s.implicits._
    // "aaab" twice: pairs aa,aa,ab per occurrence-weighted distinct
    // word → aa: 2·2=4, ab: 1·2=2; "xy" once → xy: 1
    val docs = Seq((1L, "aaab xy"), (2L, "aaab")).toDF("doc_id", "text")
    val r = TextAnalysis.bpePairStats(docs).collect()
      .map(x => (x.getAs[String]("pair"), x.getAs[Long]("pair_count"),
        x.getAs[Long]("rank")))
    assert(r.head == ("aa", 4L, 1L), s"top pair wrong: ${r.head}")
    assert(r.map(_._1).toSet == Set("aa", "ab", "xy"))
  }

  test("centroid classifier recovers planted blob labels") {
    val s = spark
    import s.implicits._
    // two separable blobs on axes; eval rows (ids 0,1) sit near their
    // own blob's centroid and must classify correctly
    val rows = Seq(
      (0L, Array(0.9f, 0.1f), 0), (1L, Array(0.1f, 0.9f), 1),
      (10L, Array(1.0f, 0.0f), 0), (11L, Array(0.8f, 0.2f), 0),
      (12L, Array(0.0f, 1.0f), 1), (13L, Array(0.2f, 0.8f), 1))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val r = Similarity.centroidClassify(emb, col("vec_id") >= 10).collect()
      .map(x => x.getAs[Long]("vec_id") ->
        (x.getAs[Int]("pred_label"), x.getAs[Int]("correct"))).toMap
    assert(r.size == 2)
    assert(r(0L) == (0, 1) && r(1L) == (1, 1), s"misclassified: $r")
  }

  test("domain report: coherent blobs yield pure clusters") {
    val s = spark
    import s.implicits._
    // k=2 on two tight blobs whose labels match the blob → purity 1.0
    val rows = Seq(
      (0L, Array(1.0f, 0.0f), 7), (1L, Array(0.0f, 1.0f), 3),
      (2L, Array(0.9f, 0.1f), 7), (3L, Array(0.1f, 0.9f), 3))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val r = Similarity.domainReport(emb, k = 2, iters = 1).collect()
    assert(r.length == 2)
    assert(r.forall(_.getAs[Double]("top_frac") == 1.0),
      "blob clusters should be label-pure")
    assert(r.map(_.getAs[Int]("top_label")).toSet == Set(7, 3))
  }

  test("dup clustering frees intermediate checkpoint blocks") {
    val s = spark
    import s.implicits._
    val before = spark.sparkContext.getPersistentRDDs.size
    val docs = (1L to 9L).map(Tuple1(_)).toDF("doc_id")
    // a 6-hop chain forces several propagation rounds → several
    // intermediate checkpoints that must all be released
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L))
      .toDF("doc_a", "doc_b")
    val r = Corpus.dupClusters(docs, pairs)
    assert(r.where(col("cluster_id") === 1L).count() == 7)
    val after = spark.sparkContext.getPersistentRDDs.size
    // only the final label table and the shared result cache may stay
    // pinned (the returned frame still reads the former; the latter
    // is the cross-operator reuse persist); edges + per-round
    // checkpoints must be freed
    assert(after <= before + 2,
      s"dupClusters leaked checkpoint blocks: $before -> $after persistent RDDs")
  }

  test("PQ ANN recall vs exact L2 on real embeddings") {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorExpressions.dotNative
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.where(col("vec_id") < 10)
    val pq = Similarity.pqAnn(emb, queries, 5)
      .select("q_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact L2 top-5 baseline
    val q = emb.select(col("vec_id").as("q_id"),
      col("embedding").cast("array<double>").as("qe")).where(col("q_id") < 10)
    val c = emb.select(col("vec_id").as("c_id"),
      col("embedding").cast("array<double>").as("ce"))
    val l2 = c.crossJoin(broadcast(q)).where(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        (dotNative(col("qe"), col("qe")) -
          lit(2.0) * dotNative(col("qe"), col("ce")) +
          dotNative(col("ce"), col("ce"))).as("d"))
    val w = Window.partitionBy("q_id").orderBy(col("d").asc, col("c_id").asc)
    val exact = l2.withColumn("rk", row_number().over(w))
      .where(col("rk") <= 5).select("q_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = pq.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.25,
      f"PQ(ADC, seeded codebooks) recall@5 vs exact L2: $recall%.2f")
    // one Lloyd refinement of the codebook must not hurt — and
    // typically lifts — recall (the training hook)
    val refined = Similarity.pqAnn(emb, queries, 5, refine = 2)
      .select("q_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recallR = refined.intersect(exact).size.toDouble / exact.size
    assert(recallR >= recall,
      f"refined recall $recallR%.2f below seeded $recall%.2f")
  }

  test("int8 quantization: bounded error, near-exact top-k") {
    val emb = Tables.embeddings(spark, sf)
    // reconstruction error ≤ scale/2 per element by construction
    val qz = Similarity.quantizeInt8(emb)
    val maxErr = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("e"))
      .join(qz, "vec_id")
      .select(aggregate(
        zip_with(col("e"),
          zip_with(col("codes").cast("array<double>"),
            array_repeat(col("q_scale").cast("double"), size(col("codes"))),
            (c, s) => c * s),
          (v, r) => abs(v - r)),
        lit(0.0), (acc, x) => greatest(acc, x)).as("err"))
      .agg(max("err")).collect()(0).getDouble(0)
    val maxScale = qz.agg(max(col("q_scale").cast("double")))
      .collect()(0).getDouble(0)
    assert(maxErr <= maxScale / 2 + 1e-9,
      s"per-element error $maxErr exceeds scale/2 bound")
    // quantized cosine top-5 nearly matches the exact top-5
    val queries = emb.where(col("vec_id") < 10)
    val exact = Similarity.cosineTopK(emb, queries, 5)
      .select("q_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.cosineTopKQuantized(emb, queries, 5)
      .select("q_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val overlap = exact.intersect(approx).size.toDouble / exact.size
    assert(overlap >= 0.85, s"int8 top-5 overlap $overlap too low")
  }

  test("binary quantization: sign-pattern hamming exact, cosine re-rank") {
    val s = spark
    import s.implicits._
    val vecs = Seq(
      (0L, Array.fill(64)(1.0f)),                                // query
      (1L, Array.tabulate(64)(i => if (i < 32) -1.0f else 1.0f)), // ham 32
      (2L, Array.fill(64)(-1.0f)),                               // ham 64
      (3L, Array.fill(64)(0.9f)))                                // ham 0
      .toDF("vec_id", "embedding")
    val r = Similarity.binaryHammingTopK(
      vecs, vecs.where(col("vec_id") === 0), k = 3).collect()
    val ham = r.map(x => x.getAs[Long]("c_id") -> x.getAs[Long]("hamming")).toMap
    assert(ham == Map(3L -> 0L, 1L -> 32L, 2L -> 64L))
    // re-rank is by exact cosine: the scaled-parallel vector wins
    val byRank = r.sortBy(_.getAs[Long]("rk")).map(_.getAs[Long]("c_id")).toSeq
    assert(byRank == Seq(3L, 1L, 2L))
    // on real embeddings the 1-bit tier still recovers most of top-5
    val emb = Tables.embeddings(spark, sf)
    val q = emb.where(col("vec_id") < 10)
    val exact = Similarity.cosineTopK(emb, q, 5).select("q_id", "c_id")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    // 1-bit sketches are coarse: recall rises with the candidate
    // oversample (the serving-time knob) — check the trend and the
    // deeper tier's floor
    def overlapAt(os: Int): Double = {
      val approx = Similarity.binaryHammingTopK(emb, q, 5, oversample = os)
        .select("q_id", "c_id")
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      exact.intersect(approx).size.toDouble / exact.size
    }
    val (o4, o16) = (overlapAt(4), overlapAt(16))
    assert(o16 >= o4, s"deeper candidates lost recall: $o4 -> $o16")
    assert(o16 >= 0.5, s"binary top-5 overlap $o16 at oversample=16 too low")
  }

  test("query likelihood: only matched candidates retrieved, ranked by score") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "apple banana"), (1L, "apple apple apple"),
      (2L, "banana banana"), (3L, "cherry cherry"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.queryLikelihood(docs, col("doc_id") === 0)
      .collect()
    // cherry-only doc shares no query term → not retrieved
    assert(r.map(_.getAs[Long]("c_id")).toSet == Set(1L, 2L))
    val byRank = r.sortBy(_.getAs[Long]("s_rk"))
    assert(byRank.map(_.getAs[Double]("ql_v")).toSeq ==
      byRank.map(_.getAs[Double]("ql_v")).sortBy(-_).toSeq)
  }

  test("reservoir sample: shard count never changes the sample") {
    val docs = Tables.documents(spark, sf)
    val one = Corpus.reservoirSample(docs, n = 10, shards = 1)
      .orderBy("source", "rk").collect().map(_.toSeq)
    val many = Corpus.reservoirSample(docs, n = 10, shards = 8)
      .orderBy("source", "rk").collect().map(_.toSeq)
    assert(one.toSeq == many.toSeq)
    // per-source sample size = min(n, source size)
    val sizes = Corpus.reservoirSample(docs, n = 10, shards = 8)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val srcSizes = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((src, n) <- srcSizes)
      assert(sizes(src) == math.min(10L, n), s"source $src sample ${sizes(src)}")
  }

  test("wordpiece vs bpe: likelihood argmax beats raw frequency") {
    val s = spark
    import s.implicits._
    // pair (a,b) is frequent but its symbols are everywhere;
    // (x,y) is rarer but x and y occur ONLY together
    val docs = Seq.fill(10)("ab").zipWithIndex.map { case (t, i) =>
      (i.toLong, t)
    } ++ Seq((10L, "xy"), (11L, "xy"), (12L, "ba"), (13L, "ba"))
    val df = docs.toDF("doc_id", "text")
    val bpe = TextAnalysis.bpeTrain(df, rounds = 1).collect()
    assert(bpe(0).getAs[String]("merged") == "ab") // freq 10 wins
    val wp = TextAnalysis.wordpieceTrain(df, rounds = 1).collect()
    // score(x,y) = 2/(2·2) = 0.5 > score(a,b) = 10/(12·12)
    assert(wp(0).getAs[String]("merged") == "xy",
      s"wordpiece picked ${wp(0).getAs[String]("merged")}")
    assert(wp(0).getAs[Long]("pair_freq") == 2L)
  }

  test("MMR re-rank: exact duplicate candidate demoted below diverse one") {
    val s = spark
    import s.implicits._
    def v(x: Float, y: Float): Array[Float] = {
      val a = Array.fill(64)(0.0f); a(0) = x; a(1) = y; a
    }
    val vecs = Seq(
      (0L, v(1.0f, 0.0f)),      // query
      (1L, v(0.99f, 0.141f)),   // most relevant
      (2L, v(0.99f, 0.141f)),   // exact duplicate of 1
      (3L, v(0.97f, -0.243f)))  // slightly less relevant, diverse
      .toDF("vec_id", "embedding")
    val r = Similarity.mmrRerank(vecs, vecs.where(col("vec_id") === 0),
      k = 3, poolK = 3).collect()
    val order = r.sortBy(_.getAs[Long]("step")).map(_.getAs[Long]("c_id")).toSeq
    // pure relevance would give (1, 2, 3); MMR's redundancy penalty
    // (sim(1,2) = 1) pushes the duplicate to last place
    assert(order == Seq(1L, 3L, 2L), s"MMR pick order $order")
  }

  test("sparse tf-idf cosine: identical docs at cos 1, df cap prunes terms") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "alpha beta"), (1L, "alpha beta"),
      (2L, "alpha gamma"), (3L, "delta delta"))
      .toDF("doc_id", "text")
    val loose = TextAnalysis.sparseCosineTopK(docs, col("doc_id") === 0,
      dfCapFrac = 0.9).collect()
    val byId = loose.map(x =>
      x.getAs[Long]("c_id") -> x.getAs[Double]("cos_v")).toMap
    assert(byId(1L) == 1.0)           // identical doc
    assert(byId.contains(2L))          // shares alpha
    assert(!byId.contains(3L))         // no shared term
    // cap at 50%: alpha (df=3 of 4) drops from every vector, so doc 2
    // no longer shares anything with the query
    val tight = TextAnalysis.sparseCosineTopK(docs, col("doc_id") === 0,
      dfCapFrac = 0.5).collect()
    assert(tight.map(_.getAs[Long]("c_id")).toSet == Set(1L))
  }

  test("multi-probe LSH: probing near-margin flips only adds recall") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.where(col("vec_id") < 10)
    val exact = Similarity.cosineTopK(emb, q, 5).select("q_id", "c_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // spec corpus is tiny — grid scaled down (16 buckets) so buckets
    // aren't single-vector; the oracle-gate run uses planes = 8
    def recallAt(probes: Int): Double = {
      val got = Similarity.multiProbeAnn(emb, q, 5, planes = 4,
        probes = probes).select("q_id", "c_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      exact.intersect(got).size.toDouble / exact.size
    }
    val (r0, r3) = (recallAt(0), recallAt(3))
    assert(r3 >= r0, s"probing lost recall: $r0 -> $r3")
    assert(r3 > 0.3, s"multi-probe recall $r3 too low")
  }

  test("probe curve: recall and candidate volume grow with depth") {
    val emb = Tables.embeddings(spark, sf)
    val r = Similarity.probeCurve(emb, emb.where(col("vec_id") < 10),
      planes = 4).orderBy("probes").collect()
    val rec = r.map(_.getAs[Double]("recall_k")).toSeq
    val cand = r.map(_.getAs[Long]("n_cand")).toSeq
    assert(rec == rec.sorted, s"recall not monotone: $rec")
    assert(cand == cand.sorted, s"candidates not monotone: $cand")
    assert(rec.last > rec.head || rec.head == 1.0,
      s"probing never helped: $rec")
  }

  test("bloom FPR curve: theory decreases with size, no false negatives") {
    val docs = Tables.documents(spark, sf)
    val r = Dedup.bloomFprCurve(docs, col("doc_id") % 2 === 1)
      .orderBy("m_bits").collect()
    val theory = r.map(_.getAs[Double]("theory_fpr")).toSeq
    assert(theory == theory.sorted.reverse, s"theory not decreasing: $theory")
    r.foreach { x =>
      val m = x.getAs[Double]("measured_fpr")
      assert(m >= 0.0 && m <= 1.0)
      // every true dup must be caught (no false negatives): probes −
      // novel = true dups, all of which must be in might_dup
      assert(x.getAs[Long]("n_false_pos") <= x.getAs[Long]("n_novel"))
    }
  }

  test("shard balance: totals conserved, md5 spread near-even") {
    val docs = Tables.documents(spark, sf)
    val r = Corpus.shardBalance(docs).collect()
    assert(r.length == 32)
    assert(r.map(_.getAs[Long]("n_docs")).sum == docs.count())
    // md5 is a good hash: no shard should be wildly off even at the
    // spec corpus size (50 docs / 32 shards is the worst case here)
    assert(r.map(x => math.abs(x.getAs[Double]("doc_dev"))).max < 5.0)
  }

  test("IVF ANN recall vs brute force on real embeddings") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.where(col("vec_id") < 20)
    val exact = Similarity.cosineTopK(emb, q, 5).select("q_id", "c_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfAnn(emb, q, 5, cells = 8, nprobe = 3)
      .select("q_id", "c_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall > 0.25, s"IVF recall $recall too low") // seeded quantizer, 3/8 cells
  }

  test("lshBucket handles dim=512 without plan blowup") {
    val s = spark
    import s.implicits._
    val vecs = (0L until 100L)
      .map(i => (i, Array.tabulate(512)(j => ((i * 31 + j * 7) % 13).toFloat - 6f)))
      .toDF("vec_id", "embedding")
    val buckets = vecs
      .select(pipeline.Similarity.lshBucket(col("embedding"), 512, 8).as("b"))
      .collect().map(_.getInt(0))
    assert(buckets.length == 100 && buckets.forall(b => b >= 0 && b < 256))
  }

  test("language id picks the stopword-dominant language") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "xx", "the cat and the dog is in a house that is big"),
      (2L, "xx", "der hund und die katze ist nicht ein zu haus"),
      (3L, "xx", "le chat et la maison les des un est que"),
      (4L, "xx", "猫 狗 房 子")).toDF("doc_id", "lang", "text")
    val r = TextAnalysis.languageId(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[String]("pred_lang")).toMap
    assert(r == Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "und"))
  }

  test("token counts: whitespace + ceil(len/4) subwords") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "abcd efghi x")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenCount(docs).collect()(0)
    assert(r.getAs[Long]("ws_tokens") == 3L)
    assert(r.getAs[Long]("bpe_tokens") == 1L + 2L + 1L)
  }

  test("BMP kernel: encode→decode roundtrip, malformed input rejected") {
    import graft.pipeline.Multimodal
    val bytes = Multimodal.encodeBmp(37, 21, seed = 42L)
    // 37 px * 3 B = 111 → padded row 112; 54-byte headers
    assert(bytes.length == 54 + 112 * 21)
    assert(Multimodal.decodeBmp(bytes) == ((37, 21, 24)))
    // same dims, different seed → same geometry, different pixels
    val other = Multimodal.encodeBmp(37, 21, seed = 7L)
    assert(Multimodal.decodeBmp(other) == ((37, 21, 24)))
    assert(!java.util.Arrays.equals(bytes, other))
    intercept[IllegalArgumentException](
      Multimodal.decodeBmp("not an image".getBytes))
    intercept[IllegalArgumentException](
      Multimodal.decodeBmp(bytes.take(100))) // truncated pixel array
  }

  test("WAV kernel: encode→decode roundtrip, malformed input rejected") {
    import graft.pipeline.Multimodal
    val bytes = Multimodal.encodeWav(2, 44100, 300, seed = 42L)
    // 44-byte headers + 300 samples * 2 ch * 2 B
    assert(bytes.length == 44 + 300 * 2 * 2)
    assert(Multimodal.decodeWav(bytes) == ((2, 44100, 300L)))
    // same geometry, different seed → same decode, different samples
    val other = Multimodal.encodeWav(2, 44100, 300, seed = 7L)
    assert(Multimodal.decodeWav(other) == ((2, 44100, 300L)))
    assert(!java.util.Arrays.equals(bytes, other))
    intercept[IllegalArgumentException](
      Multimodal.decodeWav("not audio at all, nope".getBytes ++ new Array[Byte](44)))
    intercept[IllegalArgumentException](
      Multimodal.decodeWav(bytes.take(100))) // truncated sample data
  }

  test("audio container dispatch: AIFF/AU cross-decode, MP3/FLAC/OGG gap") {
    import graft.pipeline.Multimodal
    val (nCh, rate, n) = (2, 16000, 300)
    val wav = Multimodal.encodeWav(nCh, rate, n, seed = 42L)
    val aiff = Multimodal.encodeViaJavaSound(nCh, rate, n, 42L, "aiff")
    val au = Multimodal.encodeViaJavaSound(nCh, rate, n, 42L, "au")
    // sniff → container names
    assert(Multimodal.audioContainer(wav) == "wav")
    assert(Multimodal.audioContainer(aiff) == "aiff")
    assert(Multimodal.audioContainer(au) == "au")
    // all three decode to the same geometry through the dispatch
    assert(Multimodal.decodeAudio(wav) == ((nCh, rate, n.toLong)))
    assert(Multimodal.decodeAudio(aiff) == ((nCh, rate, n.toLong)))
    assert(Multimodal.decodeAudio(au) == ((nCh, rate, n.toLong)))
    // cross-decoder sample equality: the JDK reader sees identical
    // PCM16 values in every container — and for WAV this also
    // cross-checks the hand parser's geometry against the JDK reader
    val sWav = Multimodal.pcmSamples(wav)
    val sAiff = Multimodal.pcmSamples(aiff)
    val sAu = Multimodal.pcmSamples(au)
    assert(sWav.length == n * nCh)
    assert(sWav.toSeq == sAiff.toSeq, "WAV vs AIFF sample values")
    assert(sWav.toSeq == sAu.toSeq, "WAV vs AU sample values")
    // compressed containers: recognized, documented no-JVM-decoder gap
    val mp3 = "ID3".getBytes ++ new Array[Byte](64)
    val flac = "fLaC".getBytes ++ new Array[Byte](64)
    val ogg = "OggS".getBytes ++ new Array[Byte](64)
    val frameSync = Array(0xff.toByte, 0xfb.toByte) ++ new Array[Byte](64)
    assert(Multimodal.audioContainer(mp3) == "mp3")
    assert(Multimodal.audioContainer(flac) == "flac")
    assert(Multimodal.audioContainer(ogg) == "ogg")
    assert(Multimodal.audioContainer(frameSync) == "mp3")
    for (p <- Seq(mp3, flac, ogg))
      intercept[IllegalArgumentException](Multimodal.decodeAudio(p))
    // the pipeline dispatch falls to the deterministic stub for them
    // (explicit seam), while AIFF payloads decode for real
    val s0 = spark
    import s0.implicits._
    val media = Seq(
      (1L, "audio", aiff, aiff.length.toLong),
      (2L, "audio", mp3, mp3.length.toLong)
    ).toDF("media_id", "kind", "payload", "meta_bytes")
    val feats = Multimodal.extractAudioFeatures(media)
      .collect().map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Int]("n_channels"), r.getAs[Int]("sample_rate"),
          r.getAs[Long]("n_samples"))).toMap
    assert(feats(1L) == ((nCh, rate, n.toLong)))
    assert(feats(2L)._2 % 8000 == 0) // stub geometry, deterministic
  }

  test("AVI kernel: encode→decode roundtrip, malformed input rejected") {
    import graft.pipeline.Multimodal
    val bytes = Multimodal.encodeAvi(16, 12, 25, 8, seed = 42L)
    // 100-byte headers + 8 frames * (8 B chunk header + RGB24 frame)
    assert(bytes.length == 100 + 8 * (8 + 16 * 12 * 3))
    assert(Multimodal.decodeAvi(bytes) == ((16, 12, 8, 25)))
    // same geometry, different seed → same decode, different pixels
    val other = Multimodal.encodeAvi(16, 12, 25, 8, seed = 7L)
    assert(Multimodal.decodeAvi(other) == ((16, 12, 8, 25)))
    assert(!java.util.Arrays.equals(bytes, other))
    intercept[IllegalArgumentException](
      Multimodal.decodeAvi("definitely not a video".getBytes ++ new Array[Byte](100)))
    intercept[IllegalArgumentException](
      Multimodal.decodeAvi(bytes.take(150))) // truncated frame data
    // corrupt the movi list size field → inconsistency must be caught
    val corrupt = bytes.clone()
    corrupt(92) = (corrupt(92) ^ 0x01).toByte
    intercept[IllegalArgumentException](Multimodal.decodeAvi(corrupt))
  }

  test("repetition signals: planted repeats score high, distinct text low") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a b a b a b"), (2L, "one two three four"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.repetitionSignals(docs).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Double]("top_bigram_frac"),
          x.getAs[Double]("dup_trigram_frac"))).toMap
    // doc 1: "a b"×3 covers 6/6 word chars; trigrams "a b a"×2 and
    // "b a b"×2 cover 12/6 — occurrence-weighted > 1 by design
    assert(r(1L) == ((1.0, 2.0)))
    // doc 2: all bigrams unique → top covers "onetwo" = 6 of 15 chars
    assert(r(2L) == ((0.4, 0.0)))
  }

  test("canonical pick keeps the highest-quality cluster member") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "short txt"),
      (2L, "the quick brown fox jumps over that lazy dog and keeps " +
        "running far away today"),
      (3L, "short txt again"),
      (4L, "unrelated solo document"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val r = Corpus.canonicalPick(docs, pairs).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("cluster_id"), x.getAs[Int]("keep_best")))).toMap
    // 1-2-3 are one transitive cluster labeled by its min id
    assert(Seq(1L, 2L, 3L).forall(r(_)._1 == 1L))
    assert(r(4L) == ((4L, 1)))
    // the survivor is the highest-quality doc (2), not the min-id doc
    assert(r(2L)._2 == 1 && r(1L)._2 == 0 && r(3L)._2 == 0)
  }

  test("sequence packing: contiguous offsets, straddling doc spans two seqs") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "w w w"), (2L, "w w w"), (3L, "w w w"))
      .toDF("doc_id", "text")
    val r = Corpus.packSequences(docs, ctxTokens = 4, nShards = 1).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("start_off"), x.getAs[Long]("first_seq"),
          x.getAs[Long]("last_seq")))).toMap
    assert(r(1L) == ((0L, 0L, 0L))) // tokens 0..2 inside seq 0
    assert(r(2L) == ((3L, 0L, 1L))) // tokens 3..5 straddle seqs 0-1
    assert(r(3L) == ((6L, 1L, 2L))) // tokens 6..8 straddle seqs 1-2
  }

  test("incremental dedup: novel-vs-history and first-in-batch") {
    val s = spark
    import s.implicits._
    // history = even ids {x, y}; arriving batch = odd ids {x, z, z}
    val docs = Seq((1L, "x"), (2L, "x"), (3L, "z"), (4L, "y"), (5L, "z"))
      .toDF("doc_id", "text")
    val r = Dedup.incremental(docs, col("doc_id") % 2 === 1).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Int]("novel"), x.getAs[Int]("keep")))).toMap
    assert(r.keySet == Set(1L, 3L, 5L)) // only the batch is emitted
    assert(r(1L) == ((0, 0))) // "x" already ingested (doc 2)
    assert(r(3L) == ((1, 1))) // first novel "z" survives
    assert(r(5L) == ((1, 0))) // within-batch dup of doc 3
  }

  test("embedding decontamination flags near-bench vectors only") {
    val s = spark
    import s.implicits._
    val bench = Seq((1L, Array(1f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (10L, Array(0.9f, 0.1f, 0f, 0f)), // ~0.994 cosine to the bench vec
      (11L, Array(0f, 0f, 1f, 0f)))     // orthogonal
      .toDF("vec_id", "embedding")
    val r = Similarity.decontaminateEmbed(corpus, bench, 0.8, dim = 4)
      .collect().map(x => x.getAs[Long]("vec_id") ->
        x.getAs[Int]("contaminated")).toMap
    assert(r(10L) == 1 && r(11L) == 0)
    assert(r.size == 2) // every corpus vector gets a verdict row
  }

  test("multimodal: stub decode is deterministic, plumbing intact") {
    val media = Multimodal.syntheticMedia(Tables.documents(spark, sf).limit(20))
    val f1 = Multimodal.extractFeatures(media).collect()
      .map(r => r.getLong(0) -> (r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    val f2 = Multimodal.extractFeatures(media).collect()
      .map(r => r.getLong(0) -> (r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    assert(f1 == f2 && f1.size == 20)
    val frames = Multimodal.sampleFrames(
      Multimodal.extractFeatures(media)).collect()
    assert(frames.forall(r => r.getAs[Seq[Int]]("frame_idx").nonEmpty))
  }

  test("bloom dedup: no false negatives; filter stays fixed-size") {
    val s = spark
    import s.implicits._
    // history = even ids {x, y}; batch = odd ids {x (true dup), z, w}
    val docs = Seq((1L, "x"), (2L, "x"), (3L, "z"), (4L, "y"), (5L, "w"))
      .toDF("doc_id", "text")
    val r = Dedup.bloomDedup(docs, col("doc_id") % 2 === 1).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Int]("might_dup"), x.getAs[Int]("novel"),
          x.getAs[Int]("false_pos")))).toMap
    assert(r.keySet == Set(1L, 3L, 5L)) // only the batch is emitted
    // a genuine history dup can NEVER be missed (bloom property)
    assert(r(1L)._1 == 1 && r(1L)._2 == 0 && r(1L)._3 == 0)
    // novel docs are novel; might_dup may be 0 or 1 (false positive),
    // but false_pos must equal might_dup ∧ novel
    assert(Seq(3L, 5L).forall(id =>
      r(id)._2 == 1 && r(id)._3 == (r(id)._1 min r(id)._2)))
    // the filter itself is bounded by mBits/32 words whatever the input
    assert(Dedup.bloomFilter(docs).count() <= Dedup.BloomBits / 32)
  }

  test("bloom filter false-positive rate is small on real hashes") {
    // sf docs: even = history, odd = batch; at ~250 hashes in a
    // 65536-bit / 5-hash filter the expected FP rate is < 1e-8 —
    // assert the observed count is (generously) under 1% of the batch
    val r = Dedup.bloomDedup(Tables.documents(spark, sf),
      col("doc_id") % 2 === 1)
    val n = r.count()
    val fp = r.where(col("false_pos") === 1).count()
    assert(fp.toDouble / n < 0.01, s"fp=$fp of $n")
  }

  test("normalize: idempotent, collapses case/punct variants to one hash") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "The Quick, Brown Fox!"),
      (2L, "the   quick brown--fox"),
      (3L, "a different document")).toDF("doc_id", "text")
    val n1 = TextAnalysis.normalize(docs).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[String]("norm_text"), x.getAs[String]("norm_md5")))).toMap
    assert(n1(1L)._1 == "the quick brown fox")
    assert(n1(1L)._2 == n1(2L)._2) // variants share the dedup hash
    assert(n1(3L)._2 != n1(1L)._2)
    // idempotence: normalizing the normalized text is the identity
    val again = TextAnalysis.normalize(
      TextAnalysis.normalize(docs).select(col("doc_id"),
        col("norm_text").as("text"))).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[String]("norm_text")).toMap
    assert(again == n1.view.mapValues(_._1).toMap)
  }

  test("blur stats: flat image flags blurry, noise image is sharp") {
    val s = spark
    import s.implicits._
    val noise = Multimodal.encodeBmp(32, 24, seed = 42L)
    // flatten the pixel data in place: constant gray → every
    // Laplacian is exactly 0 → variance 0 → blurry
    val flat = noise.clone()
    val off = java.nio.ByteBuffer.wrap(flat)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(10)
    for (i <- off until flat.length) flat(i) = 100.toByte
    val media = Seq((1L, noise), (2L, flat)).toDF("media_id", "payload")
    val r = Multimodal.blurStats(media).collect()
      .map(x => x.getAs[Long]("media_id") -> x).toMap
    assert(r(1).getAs[Long]("n_interior") == 30L * 22L)
    assert(r(1).getAs[Double]("lap_var") > 50.0)
    assert(r(1).getAs[Int]("blurry") == 0)
    assert(r(2).getAs[Double]("lap_var") == 0.0)
    assert(r(2).getAs[Int]("blurry") == 1)
  }

  test("perceptual hash: stable under small edits, far for distinct images") {
    val s = spark
    import s.implicits._
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val base = Multimodal.encodeBmp(32, 32, seed = 42L)
    // tiny edit: nudge a handful of pixel bytes by +1 (brightness
    // ripple far below any cell threshold)
    val edited = base.clone()
    for (i <- 0 until 5)
      edited(54 + i * 97) = ((edited(54 + i * 97) + 1) & 0xff).toByte
    // NB seed goes through `| 1` in the encoder — 42 and 43 would be
    // the SAME stream; 45 is genuinely distinct
    val other = Multimodal.encodeBmp(32, 32, seed = 45L)
    val hBase = Multimodal.aHash(base)
    assert(Multimodal.aHash(base.clone()) == hBase) // deterministic
    assert(hamming(hBase, Multimodal.aHash(edited)) <= 4,
      "small pixel edit moved the hash too far")
    assert(hamming(hBase, Multimodal.aHash(other)) >= 8,
      "distinct noise images hashed too close")
    // the near-dup blocking finds the planted perturbed pair
    val media = Seq((1L, base), (2L, edited), (3L, other))
      .toDF("media_id", "payload")
    val pairs = Multimodal.imageNearDups(media, maxHamming = 4).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs.contains((1L, 2L)) && !pairs.exists(_._2 == 3L))
  }

  test("resize: real BMP out, exact nearest-neighbor sampling, idempotent") {
    // 2x2 source with known bytes → 1x1 resize must pick pixel (0,0)
    // exactly (sx = 0*2/1 = 0, sy = 0)
    val src = Multimodal.encodeBmp(2, 2, seed = 7L)
    val one = Multimodal.resizeBmp(src, 1, 1)
    assert(Multimodal.decodeBmp(one) == ((1, 1, 24)))
    val off = java.nio.ByteBuffer.wrap(src)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(10)
    assert(one(54) == src(off) && one(55) == src(off + 1) &&
      one(56) == src(off + 2))
    // roundtrip at the query geometry; identity resize copies pixels
    val big = Multimodal.encodeBmp(40, 30, seed = 11L)
    val thumb = Multimodal.resizeBmp(big, 16, 12)
    assert(Multimodal.decodeBmp(thumb) == ((16, 12, 24)))
    assert(thumb.length == 54 + 48 * 12)
    val same = Multimodal.resizeBmp(big, 40, 30)
    assert(same.toSeq == big.toSeq, "identity resize must be a byte copy")
    // upscale repeats source pixels (still pure index math)
    val up = Multimodal.resizeBmp(src, 4, 4)
    assert(Multimodal.decodeBmp(up) == ((4, 4, 24)))
    // resizing the thumb again is deterministic
    assert(Multimodal.resizeBmp(thumb, 8, 8).toSeq ==
      Multimodal.resizeBmp(thumb, 8, 8).toSeq)
  }

  test("audio fingerprint: stable under tiny sample edits, far otherwise") {
    val s = spark
    import s.implicits._
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val base = Multimodal.encodeWav(1, 16000, 512, seed = 101L)
    val edited = base.clone()
    for (i <- 0 until 5) // nudge a few LOW bytes: sub-audible ripple
      edited(44 + i * 101 * 2) = ((edited(44 + i * 101 * 2) + 1) & 0xff).toByte
    val other = Multimodal.encodeWav(1, 16000, 512, seed = 103L)
    val hBase = Multimodal.audioFingerprint(base)
    assert(hamming(hBase, Multimodal.audioFingerprint(edited)) <= 4)
    assert(hamming(hBase, Multimodal.audioFingerprint(other)) >= 8)
    val media = Seq((1L, base), (2L, edited), (3L, other))
      .toDF("media_id", "payload")
    val pairs = Multimodal.fingerprintNearDups(
      Multimodal.audioFingerprints(media).withColumnRenamed("afp", "fp"),
      "fp", maxHamming = 4).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs.contains((1L, 2L)) && !pairs.exists(_._2 == 3L))
  }

  test("video fingerprint: stable under small frame edits, far otherwise") {
    val s = spark
    import s.implicits._
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val base = Multimodal.encodeAvi(12, 12, 10, 8, seed = 201L)
    val edited = base.clone()
    for (i <- 0 until 5) // nudge a few pixels inside the first frame
      edited(108 + i * 79) = ((edited(108 + i * 79) + 1) & 0xff).toByte
    val other = Multimodal.encodeAvi(12, 12, 10, 8, seed = 203L)
    val hBase = Multimodal.videoFingerprint(base)
    assert(hamming(hBase, Multimodal.videoFingerprint(edited)) <= 4)
    assert(hamming(hBase, Multimodal.videoFingerprint(other)) >= 8)
    val media = Seq((1L, base), (2L, edited), (3L, other))
      .toDF("media_id", "payload")
    val pairs = Multimodal.fingerprintNearDups(
      Multimodal.videoFingerprints(media).withColumnRenamed("vfp", "fp"),
      "fp", maxHamming = 4).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs.contains((1L, 2L)) && !pairs.exists(_._2 == 3L))
  }

  test("multi-index blocking guarantees recall where half-blocking misses") {
    val s = spark
    import s.implicits._
    // planted pair at hamming 2 with one diff in EACH 32-bit half:
    // neither half matches exactly → the 2-half scheme cannot see it;
    // 3+ fields guarantee it (pigeonhole: 2 diffs < 3 fields)
    val a = 0x0123456789abcdefL
    val b = a ^ (1L << 7) ^ (1L << 47)
    val far = 0x7edcba9876543210L
    val fps = Seq((1L, a), (2L, b), (3L, far)).toDF("doc_id", "simhash_v")
    val withHalves = fps.select(col("doc_id"), col("simhash_v"),
      col("simhash_v").bitwiseAND(lit(0xffffffffL)).as("fp_lo"),
      shiftrightunsigned(col("simhash_v"), 32).as("fp_hi"))
    val halfPairs = Dedup.simhashCandidates(withHalves, maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val multiPairs = Dedup.simhashCandidatesMulti(fps, maxHamming = 4, blocks = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!halfPairs.contains((1L, 2L)),
      "expected the straddling pair to escape half-blocking")
    assert(multiPairs == Set((1L, 2L)),
      s"multi-index must find exactly the planted pair: $multiPairs")
  }

  test("shuffle order: total permutation, seed-reproducible, seed-sensitive") {
    val docs = Tables.documents(spark, sf)
    val n = docs.count()
    val a = Corpus.shuffleOrder(docs, seed = 1L).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("shard"), r.getAs[Long]("position")))).toMap
    // (shard, position) is a bijection over the corpus
    assert(a.size == n && a.values.toSet.size == n)
    // positions are dense per shard: 0..count-1
    val perShard = a.values.groupBy(_._1)
    assert(perShard.forall { case (_, ps) =>
      ps.map(_._2).toSet == (0L until ps.size).toSet })
    // same seed reproduces; a different seed moves most docs
    val a2 = Corpus.shuffleOrder(docs, seed = 1L).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("shard"), r.getAs[Long]("position")))).toMap
    assert(a2 == a)
    val b = Corpus.shuffleOrder(docs, seed = 2L).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("shard"), r.getAs[Long]("position")))).toMap
    val moved = a.keys.count(k => a(k) != b(k))
    assert(moved > n * 0.8, s"only $moved of $n docs moved on reseed")
  }

  test("curriculum: contiguous difficulty stages, iid within-stage shuffle") {
    val docs = Tables.documents(spark, sf)
    val n = docs.count()
    val rows = Corpus.curriculum(docs, stages = 4, seed = 3L).collect()
    assert(rows.length == n)
    // stage sizes differ by at most 1 (contiguous rank blocks)
    val sizes = rows.groupBy(_.getAs[Int]("stage")).view.mapValues(_.length)
    assert(sizes.keySet == Set(0, 1, 2, 3))
    assert(sizes.values.max - sizes.values.min <= 1)
    // stages respect difficulty: every doc in stage k is no longer
    // than every doc in stage k+1, modulo ties at the cut
    val byStage = rows.groupBy(_.getAs[Int]("stage")).view
      .mapValues(_.map(_.getAs[Long]("n_chars"))).toMap
    for (k <- 0 to 2)
      assert(byStage(k).max <= byStage(k + 1).min ||
        byStage(k).max == byStage(k + 1).min,
        s"stage $k overlaps stage ${k + 1} beyond ties")
    // (stage, shard, position) is a dense total order within shards
    val perShard = rows.groupBy(r =>
      (r.getAs[Int]("stage"), r.getAs[Long]("shard")))
    assert(perShard.forall { case (_, rs) =>
      rs.map(_.getAs[Long]("position")).toSet == (0L until rs.size).toSet })
    // reproducible
    val again = Corpus.curriculum(docs, stages = 4, seed = 3L).collect()
    assert(again.map(_.toSeq).toSet == rows.map(_.toSeq).toSet)
  }

  test("ivfpqAnn: candidates confined to probed cells, nonzero recall") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.where(col("vec_id") < 10)
    val got = Similarity.ivfpqAnn(emb, q, 5).collect()
    assert(got.length == 50)
    // every returned candidate must live in a probed cell: the
    // plain IVF index with a huge k enumerates exactly those
    val cellCands = Similarity.ivfAnn(emb, q, 100000, cells = 8, nprobe = 2)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))).toSet
    got.foreach { r =>
      assert(cellCands((r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))))
    }
    // the compressed index still finds true neighbors: overlap@5
    // with exact cosine is well above zero across the query set
    val exact = Similarity.cosineTopK(emb, q, 5)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))).toSet
    val hits = got.count(r =>
      exact((r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))))
    assert(hits > 5, s"ivfpq found only $hits/50 exact neighbors")
  }

  test("pqDistortion: zero for codebook members, positive elsewhere") {
    val emb = Tables.embeddings(spark, sf)
    val rows = Similarity.pqDistortion(emb).collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_vecs") == 500L)
      assert(r.getAs[Double]("mse") > 0.0) // corpus ⊋ codebook seeds
    }
    // a corpus that IS the codebook reconstructs itself exactly
    val seedOnly = emb.where(col("vec_id") < 64)
    Similarity.pqDistortion(seedOnly, ks = 64).collect().foreach { r =>
      assert(math.abs(r.getAs[Double]("mse")) < 1e-6)
    }
  }

  test("channelStats: hand-built BMP gives exact per-channel sums") {
    val s = spark
    import s.implicits._
    // 2×1 24-bit BMP, pixels (B,G,R) = (10,20,30) and (50,60,70)
    val w = 2; val h = 1; val rowSize = 8
    val buf = java.nio.ByteBuffer.allocate(54 + rowSize * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + rowSize * h).putShort(0).putShort(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    buf.putInt(0).putInt(rowSize * h)
    buf.putInt(2835).putInt(2835).putInt(0).putInt(0)
    buf.put(Array[Byte](10, 20, 30, 50, 60, 70, 0, 0))
    val media = Seq((1L, buf.array())).toDF("media_id", "payload")
    val r = Multimodal.channelStats(media).collect()(0)
    assert(r.getAs[Long]("sum_b") == 60L)
    assert(r.getAs[Long]("sum_g") == 80L)
    assert(r.getAs[Long]("sum_r") == 100L)
    assert(r.getAs[Double]("mean_g") == 40.0)
    assert(r.getAs[Int]("width") == 2 && r.getAs[Int]("height") == 1)
  }

  test("kmeansInertia: non-increasing inertia, moved counts sane") {
    val rows = Similarity.kmeansInertia(Tables.embeddings(spark, sf))
      .collect().sortBy(_.getAs[Long]("iter"))
    assert(rows.length == 3)
    assert(rows(0).isNullAt(rows(0).fieldIndex("moved")))
    // Lloyd monotonicity: inertia never increases
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Double]("inertia") <=
        a.getAs[Double]("inertia") + 1e-6)
    }
    // the first recompute must actually move something
    assert(rows(1).getAs[Long]("moved") > 0)
    // movement shrinks (or holds) as Lloyd converges
    assert(rows(2).getAs[Long]("moved") <= rows(1).getAs[Long]("moved"))
  }

  test("trainClassifier learns a separable planted vocabulary") {
    val s = spark
    import s.implicits._
    val docs = ((1 to 20).map(i => (i.toLong, "good nice fine", "en")) ++
      (21 to 40).map(i => (i.toLong, "bad awful poor", "x")))
      .toDF("doc_id", "text", "lang")
    val w = TextAnalysis.trainClassifier(docs, rounds = 10, lr = 5.0)
      .collect().map(r => r.getAs[Int]("j") -> r.getAs[Double]("weight"))
      .toMap
    def bucketOf(t: String): Int = spark.range(1)
      .select((conv(substring(md5(lit(t)), 1, 8), 16, 10)
        .cast("long") % 64).cast("int")).head.getInt(0)
    // positive-class words push positive, negative-class negative;
    // untouched buckets stay exactly 0 (no bias leaks elsewhere)
    Seq("good", "nice", "fine").foreach(t => assert(w(bucketOf(t)) > 0.5))
    Seq("bad", "awful", "poor").foreach(t => assert(w(bucketOf(t)) < -0.5))
    val touched = Seq("good", "nice", "fine", "bad", "awful", "poor")
      .map(bucketOf).toSet
    w.foreach { case (j, v) => if (!touched(j)) assert(v == 0.0) }
    // the learned vector separates the training set perfectly
    val wl = typedlit((0 until 64).map(j => w(j)))
    val ws = split(lower(col("text")), "\\s+")
    val bucketC = (t: org.apache.spark.sql.Column) =>
      (conv(substring(md5(t), 1, 8), 16, 10).cast("long") % 64 + 1).cast("int")
    val z = aggregate(ws, lit(0.0), (a, t) => a + element_at(wl, bucketC(t)))
    val acc = docs
      .select(((z >= 0) === (col("lang") === "en")).cast("int").as("ok"))
      .agg(avg("ok")).head.getDouble(0)
    assert(acc == 1.0)
  }

  test("bpeEncode: trained merges shrink token counts correctly") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "aaa aaa abab")).toDF("doc_id", "text")
    // trained merges (see bpeTrain spec): aa, ab, aaa, abab →
    // "aaa" encodes to 1 token, "abab" to 1 token
    val r = TextAnalysis.bpeEncode(docs, rounds = 8).collect()(0)
    assert(r.getAs[Long]("n_words") == 3L)
    assert(r.getAs[Long]("bpe_tokens") == 3L)
    // with fewer rounds the merges stop early: at rounds = 1 only
    // (a,a)→aa exists, so aaa → (aa)a = 2 tokens, abab → 4 chars
    val r1 = TextAnalysis.bpeEncode(docs, rounds = 1).collect()(0)
    assert(r1.getAs[Long]("bpe_tokens") == 2L + 2L + 4L)
  }

  test("bpeTrain: greedy overlap, lexicographic ties, early stop") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "aaa aaa abab")).toDF("doc_id", "text")
    val m = TextAnalysis.bpeTrain(docs, rounds = 8).collect()
      .map(r => (r.getAs[Long]("round"), r.getAs[String]("sym_a"),
        r.getAs[String]("sym_b"), r.getAs[String]("merged"),
        r.getAs[Long]("pair_freq")))
    // r1: (a,a)=4 from aaa×2 (two overlapping pairs count; merge is
    //     greedy left: aaa → (aa)a). r2: tie (aa,a)=2 vs (a,b)=2 →
    //     lexicographic a wins. r3: (aa,a)=2. r4: (ab,ab)=1.
    // r5: no pairs remain → stops at 4 merges.
    assert(m.toSeq == Seq(
      (1L, "a", "a", "aa", 4L),
      (2L, "a", "b", "ab", 2L),
      (3L, "aa", "a", "aaa", 2L),
      (4L, "ab", "ab", "abab", 1L)))
  }

  test("nprobeCurve: recall non-decreasing in probe depth, full at all cells") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.where(col("vec_id") < 10)
    val rows = Similarity.nprobeCurve(emb, q).collect()
    assert(rows.length == 40)
    // per query, overlap grows with probe depth (candidate sets nest)
    rows.groupBy(_.getAs[Long]("q_id")).values.foreach { qs =>
      val byNp = qs.sortBy(_.getAs[Int]("nprobe")).map(_.getAs[Long]("overlap"))
      byNp.sliding(2).foreach { case Array(a, b) => assert(a <= b) }
    }
    // probing every cell = scanning the whole corpus = exact top-k
    rows.filter(_.getAs[Int]("nprobe") == 8)
      .foreach(r => assert(r.getAs[Double]("recall") == 1.0))
  }

  test("bucketStats: per-band doc totals and planted mega-bucket cap") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(spark, sf)
    val sigs = Dedup.minhashSignature(docs, 16)
    val n = docs.count()
    val stats = Dedup.bucketStats(sigs, 8, 2).collect()
    assert(stats.length == 8)
    stats.foreach { r =>
      assert(r.getAs[Long]("n_docs") == n) // every doc lands in a bucket per band
      assert(r.getAs[Long]("max_bucket") >= 1L)
      assert(r.getAs[Long]("colliding_docs") <= n)
      assert(r.getAs[Long]("over_cap") == 0L)
    }
    // identical docs collide: planted 3-way dup shows a bucket of ≥3
    val clones = (1L to 3L).map(i => (i, "same text in every clone here"))
      .toDF("doc_id", "text")
    val cs = Dedup.bucketStats(Dedup.minhashSignature(clones, 16), 8, 2)
      .collect()
    cs.foreach(r => assert(r.getAs[Long]("max_bucket") == 3L))
  }

  test("recallCurve: grid complete, overlap bounded, consistent with lshAnn") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.where(col("vec_id") < 10)
    val rows = Similarity.recallCurve(emb, q).collect()
    assert(rows.length == 40) // 4 k-values × 10 queries
    rows.foreach { r =>
      val (k, o) = (r.getAs[Int]("k"), r.getAs[Long]("overlap"))
      assert(o >= 0 && o <= k)
      assert(r.getAs[Double]("recall") == o.toDouble / k)
    }
    // overlap@k is non-decreasing in k per query (prefix property)
    rows.groupBy(_.getAs[Long]("q_id")).values.foreach { qs =>
      val byK = qs.sortBy(_.getAs[Int]("k")).map(_.getAs[Long]("overlap"))
      byK.sliding(2).foreach { case Array(a, b) => assert(a <= b) }
    }
  }

  test("dupSources attributes a planted cross-source near-dup cluster") {
    val s = spark
    import s.implicits._
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, text, "feedA"), (2L, text, "feedB"), (3L, text, "feedB"),
      (4L, "something else entirely unrelated to the clones", "feedC"))
      .toDF("doc_id", "text", "source")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("doc_a", "doc_b")
    val r = Corpus.dupSources(docs, pairs).collect()
      .map(x => (x.getAs[String]("source_first"),
        x.getAs[String]("source_dup")) -> x.getAs[Long]("n_dups")).toMap
    assert(r == Map(("feedA", "feedB") -> 2L))
  }

  test("lshRecall: identical planted pairs always found; bounds hold") {
    val s = spark
    import s.implicits._
    val clone = "the quick brown fox jumps over the lazy dog again today ok"
    val docs = ((1L to 4L).map(i => (i, clone)) ++
      (5L to 30L).map(i => (i, s"unrelated document number $i with its own words $i$i")))
      .toDF("doc_id", "text")
    val rows = Dedup.lshRecall(docs, col("doc_id") <= 30).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val (t, f) = (r.getAs[Long]("n_true"), r.getAs[Long]("n_found"))
      assert(f <= t)
      // identical docs share every band bucket — the 6 clone pairs
      // are always candidates, so recall is 1 wherever truth exists
      assert(t >= 6)
      assert(r.getAs[Double]("recall") == 1.0)
    }
    // n_true non-increasing in tau
    rows.sortBy(_.getAs[Double]("threshold")).sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("n_true") >= b.getAs[Long]("n_true"))
    }
  }

  test("thresholdCurve is monotone non-increasing in tau") {
    val rows = Dedup.thresholdCurve(Tables.documents(spark, sf)).collect()
    assert(rows.length == 5)
    assert(rows.map(_.getAs[Double]("threshold")).toSeq ==
      Seq(0.5, 0.6, 0.7, 0.8, 0.9))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n_pairs") >= b.getAs[Long]("n_pairs"))
      assert(a.getAs[Long]("n_docs") >= b.getAs[Long]("n_docs"))
    }
    // a pair touches two docs, and doc counts can't exceed 2×pairs
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") <= 2 * r.getAs[Long]("n_pairs"))
    }
  }

  test("tokenHistogram: planted docs land in exact power-of-two buckets") {
    val s = spark
    import s.implicits._
    // bpe tokens = ceil(len/4) per word: "aaaa" = 1 token;
    // doc A: 1 token → bucket 0; doc B: 4 tokens → bucket 2;
    // doc C: 7 tokens → bucket 2
    val docs = Seq(
      (1L, "aaaa"),
      (2L, "aaaa aaaa aaaa aaaa"),
      (3L, "aaaa aaaa aaaa aaaa aaaa aaaa aaaa")).toDF("doc_id", "text")
    val r = Corpus.tokenHistogram(docs).collect()
      .map(x => x.getAs[Long]("bucket") ->
        (x.getAs[Long]("bucket_lo"), x.getAs[Long]("n_docs"))).toMap
    assert(r == Map(0L -> ((1L, 1L)), 2L -> ((4L, 2L))))
  }

  test("vocabGrowth: first-seen attribution and monotone cumulative vocab") {
    val s = spark
    import s.implicits._
    // buckets of 2 docs: "a b" introduces {a,b}; repeats add nothing;
    // doc 5 introduces {c}
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "b a"), (4L, "a a"),
      (5L, "c a"), (6L, "b c")).toDF("doc_id", "text")
    val rows = Corpus.vocabGrowth(docs, buckets = 3).collect()
      .sortBy(_.getAs[Long]("bucket"))
    assert(rows.map(_.getAs[Long]("n_new_words")).toSeq == Seq(2L, 0L, 1L))
    assert(rows.map(_.getAs[Long]("vocab_cum")).toSeq == Seq(2L, 2L, 3L))
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == 12L)
  }

  test("growthCurve: planted duplicate lands in the later bucket") {
    val s = spark
    import s.implicits._
    // 20 docs, doc 15 repeats doc 3's content; buckets of 2
    val docs = (1L to 20L).map(i =>
      (i, if (i == 15L) "content 3" else s"content $i")).toDF("doc_id", "text")
    val rows = Corpus.growthCurve(docs, buckets = 10).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == 20L)
    val byBucket = rows.map(r => r.getAs[Long]("bucket") -> r).toMap
    // doc 15 → bucket ((15-1)*10) div 20 = 7
    assert(byBucket(7L).getAs[Long]("n_dups") == 1L)
    assert(rows.map(_.getAs[Long]("n_dups")).sum == 1L)
    // cumulative fraction at the last bucket = 1/20
    val last = rows.maxBy(_.getAs[Long]("bucket"))
    assert(last.getAs[Double]("cum_dup_frac") == 0.05)
  }

  test("cosineHistogram: identical adjacent vectors land in the top bin") {
    val s = spark
    import s.implicits._
    val emb = (1L to 10L).map(i => (i, Array(1.0f, 2.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    val rows = Similarity.cosineHistogram(emb).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("bin") == 19L)
    assert(rows(0).getAs[Double]("bin_lo") == 0.9)
    assert(rows(0).getAs[Long]("n_pairs") == 9L)
  }

  test("boilerplate surfaces the planted shared n-gram first") {
    val s = spark
    import s.implicits._
    val banner = "subscribe to our newsletter"
    val docs = (1L to 6L).map(i =>
      (i, s"unique words $i${i} here $banner end")).toDF("doc_id", "text")
    val top = Corpus.boilerplate(docs, topN = 4).collect()
    // the four banner shingles share df=6 and outrank everything else
    assert(top.map(_.getAs[Long]("df")).forall(_ == 6L))
    assert(top.map(_.getAs[String]("shingle")).contains("subscribe to our"))
    assert(top.map(_.getAs[Long]("example_doc")).forall(_ == 1L))
    assert(top.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("labelBalance: shares sum to 1, planted skew visible") {
    val s = spark
    import s.implicits._
    val emb = ((1L to 8L).map(i => (i, Array(1.0f), 0)) ++
      (9L to 10L).map(i => (i, Array(1.0f), 1)))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.labelBalance(emb).collect()
      .map(x => x.getAs[Int]("label") -> x).toMap
    assert(r(0).getAs[Double]("share") == 0.8)
    assert(r(0).getAs[Double]("vs_uniform") == 1.6) // 0.8 × 2 labels
    assert(r(1).getAs[Double]("vs_uniform") == 0.4)
    assert(math.abs(r.values.map(_.getAs[Double]("share")).sum - 1.0) < 1e-9)
  }

  test("normOutliers flags the planted extreme-norm vector") {
    val s = spark
    import s.implicits._
    val emb = ((1L to 20L).map(i => (i, Array(1.0f, 0.0f))) :+
      (21L, Array(100.0f, 0.0f))).toDF("vec_id", "embedding")
    val r = Similarity.normOutliers(emb).collect()
      .map(x => x.getAs[Long]("vec_id") -> x).toMap
    assert(r(21L).getAs[Int]("is_outlier") == 1)
    assert(r(21L).getAs[Double]("norm") == 100.0)
    assert((1L to 20L).forall(i => r(i).getAs[Int]("is_outlier") == 0))
    // z-scores center: the 20 identical vectors sit below mean
    assert(r(1L).getAs[Double]("z_score") < 0)
  }

  test("embedStats: per-dim moments on planted vectors; dead dim visible") {
    val s = spark
    import s.implicits._
    val emb = Seq(
      (1L, Array(1.0f, 2.0f, 7.0f)),
      (2L, Array(3.0f, 4.0f, 7.0f))).toDF("vec_id", "embedding")
    val r = Similarity.embedStats(emb).collect()
      .map(x => x.getAs[Long]("dim") -> x).toMap
    assert(r(1L).getAs[Double]("mean_v") == 2.0)
    assert(r(1L).getAs[Double]("std_v") == 1.0)
    assert(r(1L).getAs[Double]("min_v") == 1.0)
    assert(r(2L).getAs[Double]("max_v") == 4.0)
    // the dead dimension announces itself: std exactly 0
    assert(r(3L).getAs[Double]("std_v") == 0.0)
  }

  test("minhashEstimate: exact on identical docs, bounded error on sf") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today"),
      (2L, "the quick brown fox jumps over the lazy dog again today"),
      (3L, "a totally different document about distributed query engines"))
      .toDF("doc_id", "text")
    val planted = Dedup.minhashEstimate(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r).toMap
    val dup = planted((1L, 2L))
    assert(dup.getAs[Double]("est_jaccard") == 1.0)
    assert(dup.getAs[Double]("jaccard_v") == 1.0)
    assert(dup.getAs[Double]("abs_err") == 0.0)
    // estimator theory: stddev = sqrt(J(1-J)/K) <= 0.125 at K=16;
    // candidate pairs skew to high J, so mean |err| stays well under
    // a 1.6-sigma envelope
    val rows = Dedup.minhashEstimate(Tables.documents(spark, sf)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val e = r.getAs[Double]("est_jaccard")
      assert(e >= 0.0 && e <= 1.0)
    }
    val meanErr = rows.map(_.getAs[Double]("abs_err")).sum / rows.length
    assert(meanErr < 0.2, s"mean estimator error too large: $meanErr")
  }

  test("rpRecall: projection preserves neighbors better as dOut grows") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.where(col("vec_id") < 10)
    def mean(dOut: Int): Double = {
      val rows = Similarity.rpRecall(emb, q, 5, dimIn = 64, dOut = dOut)
        .collect()
      assert(rows.length == 10)
      rows.foreach { r =>
        val o = r.getAs[Long]("overlap")
        assert(o >= 0 && o <= 5)
      }
      rows.map(_.getAs[Double]("recall")).sum / rows.length
    }
    // this corpus's cosines concentrate (synthetic near-uniform
    // vectors), so absolute overlap@5 is inherently modest — the
    // JL property under test is the dOut trend, not a high ceiling
    val lo = mean(4)
    val hi = mean(128)
    assert(hi > lo + 0.1, s"recall did not improve with dims: d4=$lo d128=$hi")
    assert(lo < 0.2, s"4-dim projection should scramble top-5: $lo")
  }

  test("heapsFit recovers an exact power law; degenerate var guarded") {
    val s = spark
    import s.implicits._
    // two points lying exactly on V = n^0.5: (4,2) and (16,4)
    val docs = Seq(
      (1L, "a a b b"),
      (2L, "a a a a b b b b c c c c d d d d")).toDF("doc_id", "text")
    val r = Corpus.heapsFit(docs).collect()(0)
    assert(r.getAs[Long]("n_docs") == 2L)
    assert(math.abs(r.getAs[Double]("heaps_beta") - 0.5) < 1e-6)
    assert(math.abs(r.getAs[Double]("heaps_k") - 1.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("r2") - 1.0) < 1e-6)
    // all docs the same length → var x = 0 → null fit, no crash
    val const = Seq((1L, "a b"), (2L, "c d")).toDF("doc_id", "text")
    val c = Corpus.heapsFit(const).collect()(0)
    assert(c.isNullAt(c.fieldIndex("heaps_beta")))
  }

  test("langConfusion: planted diagonal and off-diagonal cells") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the cat and the dog of a to", "en"),
      (2L, "the cat and the dog of a to", "en"),
      (3L, "der hund und die katze ist nicht", "en"), // de text tagged en
      (4L, "zzz qqq", "zh"))
      .toDF("doc_id", "text", "lang")
    val r = TextAnalysis.langConfusion(docs).collect()
      .map(x => (x.getAs[String]("lang"), x.getAs[String]("pred_lang")) ->
        x.getAs[Long]("n")).toMap
    assert(r == Map(("en", "en") -> 2L, ("en", "de") -> 1L,
      ("zh", "und") -> 1L))
  }

  test("langMismatch counts contradictions and unknowns per source") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the cat and the dog of a to", "en", "feedA"),   // en, agrees
      (2L, "der hund und die katze ist nicht", "en", "feedA"), // de vs en
      (3L, "zzz qqq xxx", "en", "feedA"),                   // und
      (4L, "le chat et la tour est que", "fr", "feedB"))    // fr, agrees
      .toDF("doc_id", "text", "lang", "source")
    val r = TextAnalysis.langMismatch(docs).collect()
      .map(x => x.getAs[String]("source") ->
        (x.getAs[Long]("n_docs"), x.getAs[Long]("n_und"),
          x.getAs[Long]("n_mismatch"))).toMap
    assert(r("feedA") == ((3L, 1L, 1L)))
    assert(r("feedB") == ((1L, 0L, 0L)))
  }

  test("embedDrift: planted second-half shift shows in delta and z") {
    val s = spark
    import s.implicits._
    val emb = ((1L to 10L).map(i => (i, Array(0.0f, 1.0f))) ++
      (11L to 20L).map(i => (i, Array(2.0f, 1.0f))))
      .toDF("vec_id", "embedding")
    val r = Similarity.embedDrift(emb).collect()
      .map(x => x.getAs[Long]("dim") -> x).toMap
    assert(r(1L).getAs[Double]("delta") == 2.0)
    assert(r(1L).getAs[Double]("mean_a") == 0.0)
    assert(r(1L).getAs[Double]("mean_b") == 2.0)
    assert(r(1L).getAs[Double]("drift_z") == 2.0) // sd_pop = 1.0
    // the constant dim: zero delta, null z (sd = 0)
    assert(r(2L).getAs[Double]("delta") == 0.0)
    assert(r(2L).isNullAt(r(2L).fieldIndex("drift_z")))
  }

  test("qualityDrift: per-source buckets with bucket-0 baseline") {
    val docs = Tables.documents(spark, sf)
    val rows = Corpus.qualityDrift(docs).collect()
    assert(rows.nonEmpty)
    rows.filter(_.getAs[Long]("bucket") == 0L).foreach { r =>
      assert(r.getAs[Double]("drift_vs_first") == 0.0)
    }
    // doc counts cover the corpus exactly
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
  }

  test("dedupSavings counts non-canonical docs and their tokens") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "aa bb cc dd"),   // canonical of {1,2}
      (2L, "aa bb cc dd"),   // removable: 4 tokens
      (3L, "standalone doc here")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val r = Corpus.dedupSavings(docs, pairs).collect()(0)
    assert(r.getAs[Long]("n_docs") == 3L)
    assert(r.getAs[Long]("n_removable") == 1L)
    assert(r.getAs[Long]("tokens_removable") == 4L)
    assert(math.abs(r.getAs[Double]("token_frac") -
      4.0 / r.getAs[Long]("tokens_total")) < 1e-6)
  }

  test("splitLeakage reports exactly the clusters straddling splits") {
    val s = spark
    import s.implicits._
    val docs = (1L to 40L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = (1L to 39L by 2).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val splits = Corpus.split(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val expected = (1L to 39L by 2).map { i =>
      (i, Seq(i, i + 1).map(splits).distinct.sorted)
    }.filter(_._2.size > 1).toMap
    val got = Corpus.splitLeakage(docs, pairs).collect()
      .map(r => r.getAs[Long]("cluster_id") ->
        r.getAs[String]("splits").split(",").toSeq).toMap
    assert(expected.nonEmpty, "planted ids never straddle — regen test ids")
    assert(got == expected)
  }

  test("budgetSelect: greedy quality prefix, exact two-phase rank + cumsum") {
    val docs = Tables.documents(spark, sf)
    val n = docs.count()
    val rows = Corpus.budgetSelect(docs, budgetTokens = 25000L).collect()
    assert(rows.length == n)
    // rank is a dense global permutation
    assert(rows.map(_.getAs[Long]("rank")).toSet == (1L to n).toSet)
    val byRank = rows.sortBy(_.getAs[Long]("rank"))
    // the ranking descends by quality (doc_id breaks ties)
    byRank.sliding(2).foreach { case Array(a, b) =>
      val (qa, qb) = (a.getAs[Double]("quality_score"),
        b.getAs[Double]("quality_score"))
      assert(qa > qb || (qa == qb &&
        a.getAs[Long]("doc_id") < b.getAs[Long]("doc_id")))
    }
    // cum_tokens is the exact running sum in rank order
    var run = 0L
    byRank.foreach { r =>
      run += r.getAs[Long]("n_tokens")
      assert(r.getAs[Long]("cum_tokens") == run)
    }
    // selected is the greedy prefix: kept iff the total BEFORE the
    // doc is under budget — so selection is a rank prefix, every
    // kept doc started under budget, and the first dropped one not
    val sel = byRank.takeWhile(_.getAs[Int]("selected") == 1)
    assert(byRank.drop(sel.length).forall(_.getAs[Int]("selected") == 0))
    assert(sel.nonEmpty && sel.length < n)
    assert(sel.last.getAs[Long]("cum_tokens") -
      sel.last.getAs[Long]("n_tokens") < 25000L)
    val firstOut = byRank(sel.length)
    assert(firstOut.getAs[Long]("cum_tokens") -
      firstOut.getAs[Long]("n_tokens") >= 25000L)
  }

  test("source KL: zero for a uniform split, positive for a skewed feed") {
    val s = spark
    import s.implicits._
    // two sources with IDENTICAL word distributions → each equals the
    // corpus marginal → KL exactly 0 for both
    val same = Seq((1L, "a a b", "s1"), (2L, "a a b", "s2"))
      .toDF("doc_id", "text", "source")
    val r0 = Corpus.sourceKl(same).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(r0 == Map("s1" -> 0.0, "s2" -> 0.0))
    // skewed feed: s1={a}, s2={b} over corpus {a:1, b:1} →
    // KL = 1·ln(1/0.5) = ln 2 for each
    val skew = Seq((1L, "a", "s1"), (2L, "b", "s2"))
      .toDF("doc_id", "text", "source")
    val r1 = Corpus.sourceKl(skew).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    val ln2 = BigDecimal(math.log(2)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r1 == Map("s1" -> ln2, "s2" -> ln2))
  }

  test("quality classifier: deterministic model, bounded scores, keep=sign") {
    val s = spark
    import s.implicits._
    // weights replay the md5 formula and sit in [-0.5, 0.5)
    val w = TextAnalysis.classifierWeights(256)
    assert(w.length == 256 && w.forall(x => x >= -0.5 && x < 0.5))
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest("w0".getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    assert(w(0) == (java.lang.Long.parseLong(hex, 16) % 1000000L) / 1e6 - 0.5)
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityClassifier(docs).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Double]("quality_score"), x.getAs[Int]("keep")))).toMap
    // identical text → identical score; scores are valid sigmoids
    assert(r(1L) == r(2L))
    assert(r.values.forall { case (sc, k) =>
      sc > 0.0 && sc < 1.0 && (k == 1) == (sc >= 0.5) })
    // single codegen map stage: no exchange anywhere in the plan
    val plan = TextAnalysis.qualityClassifier(Tables.documents(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"classifier plan shuffles:\n$plan")
  }

  test("two DotProducts in one projection stay codegen-compiled") {
    val s = spark
    import s.implicits._
    import graft.functions.VectorExpressions.dotNative
    val df = Seq((Array(1f, 2f), Array(3f, 4f)))
      .toDF("a", "b")
    // with fallback disabled a codegen compile error (e.g. the fixed
    // local-variable collision between the two instances) would throw
    // instead of silently running interpreted
    s.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val r = df.select(
        (dotNative(col("a"), col("a")) - dotNative(col("a"), col("b")))
          .as("d")).collect().head.getDouble(0)
      assert(r == (1.0 + 4.0) - (3.0 + 8.0))
    } finally s.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("zipf fit: exact power law recovers its slope; flat corpus → 0") {
    val s = spark
    import s.implicits._
    // tf(rank) = round(1000 · rank^-0.8): log-log linear up to the
    // integer rounding, so the fitted slope lands within a few
    // percent of -0.8 and r² near 1
    val words = (1 to 30).flatMap { r =>
      val tf = math.round(1000 * math.pow(r, -0.8)).toInt
      Seq.fill(tf)(s"w$r")
    }
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val row = Corpus.zipfFit(docs, topN = 30).collect().head
    assert(row.getAs[Long]("n_words") == 30L)
    val slope = row.getAs[Double]("zipf_slope")
    assert(math.abs(slope - (-0.8)) < 0.05, s"slope $slope")
    assert(row.getAs[Double]("r2") > 0.99)
    // uniform frequencies: var(y)=0 → slope 0
    val flat = Seq((1L, (1 to 20).flatMap(i =>
      Seq.fill(5)(s"u$i")).mkString(" "))).toDF("doc_id", "text")
    val fr = Corpus.zipfFit(flat, topN = 20).collect().head
    assert(fr.getAs[Double]("zipf_slope") == 0.0)
  }

  test("dataset card: planted corpus with one exact dup and known tokens") {
    val s = spark
    import s.implicits._
    val good = "the quick brown fox jumps over the lazy dog again"
    val docs = Seq(
      (1L, good, "web"),
      (2L, good, "web"),            // exact dup of doc 1
      (3L, "#### $$$$ %%%% @@@@", "books")) // fails gopher symbol ratio
      .toDF("doc_id", "text", "source")
    val r = Corpus.card(docs).collect().head
    assert(r.getAs[Long]("n_docs") == 3L)
    assert(r.getAs[Long]("n_sources") == 2L)
    assert(r.getAs[Long]("n_tokens") == 10L + 10L + 4L)
    assert(r.getAs[Double]("exact_dup_frac") == 0.333333)
    assert(r.getAs[Double]("gopher_pass_frac") == 0.666667)
  }

  test("cluster size stats: planted 3+2+singletons histogram") {
    val s = spark
    import s.implicits._
    val docs = (1L to 10L).map(i => Tuple1(i)).toDF("doc_id")
    // one triple {1,2,3} (chained — transitivity required), one pair
    // {4,5}; 6..10 singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("doc_a", "doc_b")
    val r = Corpus.clusterSizeStats(docs, pairs).collect()
      .map(x => x.getAs[Long]("cluster_size") ->
        ((x.getAs[Long]("n_clusters"), x.getAs[Long]("n_docs"),
          x.getAs[Long]("docs_removable")))).toMap
    assert(r == Map(1L -> ((5L, 5L, 0L)), 2L -> ((1L, 2L, 1L)),
      3L -> ((1L, 3L, 2L))))
  }

  test("rocchio expansion surfaces co-occurring terms, never query terms") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "apple"),                       // query: one term
      (1L, "apple banana"), (2L, "apple banana"),
      (3L, "apple banana cherry"),
      (4L, "durian durian durian"))        // shares nothing
      .toDF("doc_id", "text")
    val r = TextAnalysis.rocchioExpansion(docs, col("doc_id") === 0,
      fbDocs = 3, expandK = 2).collect()
    val terms = r.map(_.getAs[String]("term")).toSet
    assert(terms.contains("banana"), s"expected banana in $terms")
    assert(!terms.contains("apple"), "query term must not expand")
    assert(!terms.contains("durian"), "unretrieved doc's term leaked")
  }

  test("gini card: equal users score 0, a dominant user concentrates") {
    val s = spark
    import s.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def mk(counts: Seq[Int]) = counts.zipWithIndex.flatMap { case (c, u) =>
      (0 until c).map(i => (u.toLong, t0, "e", 1.0, (u * 1000 + i).toLong))
    }.toDF("user_id", "ts", "event_type", "value", "event_id")
    val eq = RelQueries.giniCard(mk(Seq(5, 5, 5, 5))).collect()(0)
    assert(eq.getAs[Double]("gini") == 0.0)
    val skew = RelQueries.giniCard(mk(Seq(1, 1, 1, 97))).collect()(0)
    // ranks 1..4, S1 = 1+2+3+4·97 = 394: G = 2·394/400 − 5/4 = 0.72
    assert(skew.getAs[Double]("gini") == 0.72, skew.toString)
    assert(skew.getAs[Double]("top1_share") == 0.97)
  }

  test("farthest-first seeding: planted far point picked first, radius shrinks") {
    val s = spark
    import s.implicits._
    def v(x: Float, y: Float): Array[Float] = {
      val a = Array.fill(64)(0.0f); a(0) = x; a(1) = y; a
    }
    // a tight cluster near the origin and one far outlier
    val vecs = Seq(
      (0L, v(0.0f, 0.0f)), (1L, v(0.1f, 0.0f)), (2L, v(0.0f, 0.1f)),
      (3L, v(10.0f, 10.0f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.farthestFirstInit(vecs, k = 3)
      .orderBy("rk").collect()
    assert(r(0).getLong(1) == 0L)       // min-id start
    assert(r(1).getLong(1) == 3L)       // the outlier is farthest
    // the k-center radius sequence never grows
    val radii = r.drop(1).map(_.getAs[Double]("min_d2")).toSeq
    assert(radii == radii.sorted.reverse, s"radii grew: $radii")
  }

  test("basket lift: perfect co-occurrence lifts, independence doesn't") {
    val s = spark
    import s.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def day(d: Int) = new java.sql.Timestamp(ts0.getTime + d * 86400000L)
    // baskets 0-4: A, B, C together; baskets 5-9: C only
    val events =
      (0 until 5).flatMap(d => Seq(
        (d.toLong, day(d), "A", 1.0, (d * 3).toLong),
        (d.toLong, day(d), "B", 1.0, (d * 3 + 1).toLong),
        (d.toLong, day(d), "C", 1.0, (d * 3 + 2).toLong))) ++
        (5 until 10).map(d => (d.toLong, day(d), "C", 1.0, (100 + d).toLong))
    val df = events.toDF("user_id", "ts", "event_type", "value", "event_id")
    val r = RelQueries.basketLift(df, minSupport = 5).collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getAs[Double]("lift"))
      .toMap
    // A and B co-occur perfectly in half the baskets: lift = 10·5/(5·5)
    assert(r(("A", "B")) == 2.0, s"$r")
    // C is everywhere: knowing A says nothing about C
    assert(r(("A", "C")) == 1.0 && r(("B", "C")) == 1.0, s"$r")
  }

  test("RFM: scores follow recency/frequency/monetary order") {
    val s = spark
    import s.implicits._
    val day = (d: Int) => java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    // u1: 10 recent high-value events; u2: 5 mid; u3: 1 old small
    val events =
      (0 until 10).map(i => (1L, day(10), 100.0, (10 + i).toLong)) ++
        (0 until 5).map(i => (2L, day(8), 10.0, (20 + i).toLong)) ++
        Seq((3L, day(1), 1.0, 30L))
    val df = events.toDF("user_id", "ts", "value", "event_id")
      .withColumn("event_type", lit("purchase"))
    val r = RelQueries.rfm(df).collect()
      .map(x => x.getAs[Long]("user_id") -> x.getAs[Long]("rfm_code")).toMap
    // 3 users → quintile ranks (0,1,2)·5 div 3 + 1 = (1, 2, 4)
    assert(r == Map(1L -> 444L, 2L -> 222L, 3L -> 111L), s"codes $r")
  }

  test("funnel steps are ordered: later-step events before step 1 don't count") {
    val s = spark
    import s.implicits._
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val events = Seq(
      // user 1 completes the funnel in order
      (1L, "view", ts(0)), (1L, "click", ts(1)), (1L, "purchase", ts(2)),
      // user 2 clicks BEFORE first view — click must not count
      (2L, "click", ts(0)), (2L, "view", ts(1)),
      // user 3 views only
      (3L, "view", ts(0)),
      // user 4 purchases without ever viewing — no step counts
      (4L, "purchase", ts(0)))
      .toDF("user_id", "event_type", "ts")
    val r = RelQueries.funnel(events, Seq("view", "click", "purchase"))
      .collect().map(x => x.getAs[Int]("step") -> x.getAs[Long]("users"))
      .toMap
    assert(r == Map(1 -> 3L, 2 -> 1L, 3 -> 1L))
  }

  test("rolling active users: WAU unions the trailing window, DAU doesn't") {
    val s = spark
    import s.implicits._
    val t = (d: Int) => java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    // user 1 on days 1 and 3 (counts once in each window), user 2 on
    // day 1 only, user 3 on day 9 (outside day 3's 7-day reach)
    val events = Seq((1L, t(1)), (1L, t(3)), (2L, t(1)), (3L, t(9)))
      .toDF("user_id", "ts")
    val r = RelQueries.rollingActive(events).collect()
      .map(x => x.getAs[Long]("day_s") ->
        ((x.getAs[Long]("dau"), x.getAs[Long]("wau")))).toMap
    val d = (day: Int) => java.time.LocalDate.of(2024, 1, day)
      .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
    // day 1: users {1,2} both daily and weekly; day 3: DAU {1} but
    // WAU still {1,2} (day-1 actives reach through day 7); day 9:
    // DAU {3}, WAU {1,3} (user 1's day-3 activity reaches day 9)
    assert(r(d(1)) == ((2L, 2L)))
    assert(r(d(3)) == ((1L, 2L)))
    assert(r(d(9)) == ((1L, 2L)))
  }

  test("stickiness: MAU accumulates the trailing window, ratio divides") {
    val s = spark
    import s.implicits._
    val t = (d: Int) => java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    // users 1,2 on day 1; user 1 again on day 3 — within one 28-day
    // window, so MAU is the running distinct {1,2} on every observed
    // day while DAU drops to 1 on day 3
    val events = Seq((1L, t(1)), (2L, t(1)), (1L, t(3)))
      .toDF("user_id", "ts")
    val r = RelQueries.stickiness(events).collect()
      .map(x => x.getAs[Long]("day_s") ->
        ((x.getAs[Long]("dau"), x.getAs[Long]("mau"),
          x.getAs[Double]("stickiness")))).toMap
    val d = (day: Int) => java.time.LocalDate.of(2024, 1, day)
      .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
    assert(r(d(1)) == ((2L, 2L, 1.0)))
    assert(r(d(3)) == ((1L, 2L, 0.5)))
    // fan-out past the last observed day is dropped: only days with
    // DAU rows appear (the dau-mau join is inner on observed days)
    assert(r.keySet == Set(d(1), d(3)))
  }

  test("first-touch attribution: ties break on event_id, value credits") {
    val s = spark
    import s.implicits._
    val t = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // u1 signs up then buys 10+20; u2 views, never buys; u3 has TWO
    // events at the identical first timestamp — the lower event_id
    // ('signup', id 5) must win the channel, then buys 30
    val events = Seq(
      (1L, 1L, "signup", t(0), 0.0), (1L, 2L, "purchase", t(5), 10.0),
      (1L, 3L, "purchase", t(9), 20.0),
      (2L, 4L, "view", t(1), 0.0),
      (3L, 5L, "signup", t(2), 0.0), (3L, 6L, "click", t(2), 0.0),
      (3L, 7L, "purchase", t(8), 30.0))
      .toDF("user_id", "event_id", "event_type", "ts", "value")
    val r = RelQueries.firstTouch(events).collect()
      .map(x => x.getAs[String]("channel") ->
        ((x.getAs[Long]("users"), x.getAs[Long]("buyers"),
          x.getAs[Double]("attributed_value"),
          x.getAs[Double]("value_share")))).toMap
    assert(r("signup") == ((2L, 2L, 60.0, 1.0)))
    assert(r("view") == ((1L, 0L, 0.0, 0.0)))
    assert(r.keySet == Set("signup", "view"))
  }

  test("survival: censored users leave the denominator, not the numerator") {
    val s = spark
    import s.implicits._
    val t = (d: Int) => java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    // u1: active days 1→3 (life 2); u2: day 10 only (life 0) — u2's
    // first event sits AT the window edge, so it is observable for 0
    // days and must never enter any day-k denominator
    val events = Seq((1L, t(1)), (1L, t(3)), (2L, t(10)))
      .toDF("user_id", "ts")
    val r = RelQueries.survival(events).collect()
      .map(x => x.getAs[Int]("k") ->
        ((x.getAs[Long]("eligible"), x.getAs[Long]("surviving"),
          x.getAs[Double]("survival_rate")))).toMap
    assert(r.keySet == (1 to 9).toSet) // u1 observable for 9 days
    assert(r(1) == ((1L, 1L, 1.0)))
    assert(r(2) == ((1L, 1L, 1.0)))
    assert(r(3) == ((1L, 0L, 0.0)))
    assert(r(9) == ((1L, 0L, 0.0)))
  }

  test("classifier eval: rank-sum AUC matches the brute-force pairwise") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(spark, sf)
    val r = TextAnalysis.classifierEval(docs).collect()(0)
    // recompute every piece brute-force from the same split
    val test = docs.where(
      conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 5 === 0)
      .select(col("doc_id"), col("lang"), col("text")).collect()
    val scored = TextAnalysis.qualityClassifier(
      docs.where(conv(substring(md5(col("doc_id").cast("string")), 1, 8),
        16, 10).cast("long") % 5 === 0)).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        x.getAs[Double]("quality_score")).toMap
    val ys = test.map(x =>
      scored(x.getAs[Long]("doc_id")) -> (x.getAs[String]("lang") == "en"))
    val pos = ys.filter(_._2).map(_._1)
    val neg = ys.filter(!_._2).map(_._1)
    assert(r.getAs[Long]("n_test") == ys.length.toLong)
    assert(r.getAs[Long]("pos") == pos.length.toLong)
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val bruteAuc = BigDecimal(wins / (pos.length.toDouble * neg.length))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("auc") == bruteAuc,
      s"rank-sum ${r.getAs[Double]("auc")} vs brute $bruteAuc")
    assert(r.getAs[Long]("tp") + r.getAs[Long]("fn") == pos.length.toLong)
  }

  test("pareto: deciles partition users, shares sum to 1, top holds most") {
    val s = spark
    import s.implicits._
    val t = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    // 20 users: user i has value 100·i — decile 1 = the two biggest
    val events = (1 to 20).map(i => (i.toLong, t, 100.0 * i))
      .toDF("user_id", "ts", "value")
    val r = RelQueries.pareto(events).orderBy("decile").collect()
    assert(r.length == 10)
    assert(r.forall(_.getAs[Long]("users") == 2L))
    val total = (1 to 20).map(_ * 100.0).sum
    assert(r.head.getAs[Double]("value") == 100.0 * (20 + 19))
    assert(r.head.getAs[Double]("share") ==
      math.floor(100.0 * 39 / total * 1e6) / 1e6)
    assert(r.last.getAs[Double]("cum_share") == 1.0)
    // shares strictly decrease down the deciles
    val shares = r.map(_.getAs[Double]("share"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a > b })
  }

  test("topk churn: retained/entered/exited partition the leaderboards") {
    val s = spark
    import s.implicits._
    val t = (d: Int, h: Int) =>
      java.sql.Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    // k=2: day1 top = {1, 2} (values 100, 50); day2 top = {2, 3}
    // (users 1 drops to 1.0, 3 surges) → retained {2}, entered {3},
    // exited {1}
    val events = Seq(
      (1L, t(1, 1), 100.0), (2L, t(1, 2), 50.0), (3L, t(1, 3), 10.0),
      (1L, t(2, 1), 1.0), (2L, t(2, 2), 60.0), (3L, t(2, 3), 70.0))
      .toDF("user_id", "ts", "value")
    val r = RelQueries.topkChurn(events, k = 2).collect()
    assert(r.length == 1) // only day1 has a next day
    assert(r(0).getAs[Long]("n_top") == 2L)
    assert(r(0).getAs[Long]("n_top_next") == 2L)
    assert(r(0).getAs[Long]("retained") == 1L)
    assert(r(0).getAs[Long]("entered") == 1L)
    assert(r(0).getAs[Long]("exited") == 1L)
  }

  test("image entropy: flat image scores 0 bits, two-tone scores 1") {
    val s = spark
    import s.implicits._
    val noise = Multimodal.encodeBmp(32, 32, seed = 42L)
    val off = java.nio.ByteBuffer.wrap(noise)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(10)
    val rowSize = ((32 * 3 + 3) / 4) * 4
    val flat = noise.clone()
    for (i <- off until flat.length) flat(i) = 7.toByte
    // two-tone: alternate pixel bytes 0/255 INSIDE rows only (padding
    // bytes are excluded from the histogram, so keep them out)
    val duo = noise.clone()
    for (y <- 0 until 32; i <- 0 until 32 * 3)
      duo(off + y * rowSize + i) = (if (i % 2 == 0) 0 else 255).toByte
    val media = Seq((1L, noise), (2L, flat), (3L, duo))
      .toDF("media_id", "payload")
    val r = Multimodal.imageEntropy(media).collect()
      .map(x => x.getAs[Long]("media_id") -> x).toMap
    assert(r(2).getAs[Double]("entropy_bits") == 0.0)
    assert(r(2).getAs[Long]("distinct_bytes") == 1L)
    assert(r(3).getAs[Double]("entropy_bits") == 1.0)
    assert(r(3).getAs[Long]("distinct_bytes") == 2L)
    assert(r(1).getAs[Double]("entropy_bits") > 7.0, "noise is high-H")
  }

  test("video quality: static clip scores zero changes, hard cuts spike") {
    val s = spark
    import s.implicits._
    val base = Multimodal.encodeAvi(8, 8, 10, 6, seed = 42L)
    val frameSize = 8 * 8 * 3
    def setFrame(p: Array[Byte], f: Int, v: Byte): Unit = {
      val off = 100 + f * (8 + frameSize) + 8
      java.util.Arrays.fill(p, off, off + frameSize, v)
    }
    val static = base.clone()
    for (f <- 0 until 6) setFrame(static, f, 50.toByte)
    // cuts: black/white alternation — every consecutive pair is a cut
    val cuts = base.clone()
    for (f <- 0 until 6) setFrame(cuts, f, if (f % 2 == 0) 0 else 255.toByte)
    val media = Seq((1L, static), (2L, cuts)).toDF("media_id", "payload")
    val r = Multimodal.videoQuality(media).collect()
      .map(x => x.getAs[Long]("media_id") -> x).toMap
    assert(r(1).getAs[Double]("avg_delta") == 0.0)
    assert(r(1).getAs[Long]("scene_changes") == 0L)
    assert(r(2).getAs[Long]("frames_scored") == 6L)
    assert(r(2).getAs[Long]("scene_changes") == 5L)
    assert(r(2).getAs[Double]("avg_delta") == 255.0)
  }

  test("audio quality: silence and clipping flag exactly") {
    val s = spark
    import s.implicits._
    val noise = Multimodal.encodeWav(1, 8000, 100, seed = 42L)
    // silent: all-zero samples; clipped: all full-scale +32767
    // (little-endian 0xFF 0x7F)
    val silent = noise.clone()
    for (i <- 44 until silent.length) silent(i) = 0
    val clipped = noise.clone()
    var i = 44
    while (i < clipped.length) {
      clipped(i) = 0xff.toByte; clipped(i + 1) = 0x7f.toByte; i += 2
    }
    val media = Seq((1L, noise), (2L, silent), (3L, clipped))
      .toDF("media_id", "payload")
    val r = Multimodal.audioQuality(media).collect()
      .map(x => x.getAs[Long]("media_id") -> x).toMap
    assert(r(2).getAs[Double]("silence_frac") == 1.0)
    assert(r(2).getAs[Double]("rms_level") == 0.0)
    assert(r(2).getAs[Double]("clip_frac") == 0.0)
    assert(r(3).getAs[Double]("clip_frac") == 1.0)
    assert(r(3).getAs[Double]("rms_level") == 32767.0)
    assert(r(1).getAs[Long]("n_samples") == 100L)
    assert(r(1).getAs[Double]("clip_frac") < 1.0)
  }

  test("hll overlap: identical sources give jaccard 1, disjoint give 0") {
    val s = spark
    import s.implicits._
    val wordsOf = (seed: Int, n: Int) =>
      (0 until n).map(i => s"w${seed}_$i").mkString(" ")
    // twin/clone share EVERY word → union registers = each side's
    // registers → est_inter = est_a exactly, jaccard exactly 1;
    // alien is word-disjoint from both
    val docs = Seq(
      (1L, "twin", wordsOf(1, 400)), (2L, "clone", wordsOf(1, 400)),
      (3L, "alien", wordsOf(2, 400)))
      .toDF("doc_id", "source", "text")
    val r = Sketches.hllOverlap(docs).collect()
      .map(x => (x.getAs[String]("source_a"), x.getAs[String]("source_b"))
        -> x).toMap
    val twin = r(("clone", "twin"))
    assert(twin.getAs[Double]("jaccard_est") == 1.0)
    assert(twin.getAs[Long]("exact_inter") == 400L)
    assert(twin.getAs[Double]("est_inter") ==
      twin.getAs[Double]("est_a"))
    val alien = r(("alien", "twin"))
    assert(alien.getAs[Long]("exact_inter") == 0L)
    // inclusion-exclusion on disjoint sketches: small |estimator
    // noise|, clamped non-negative
    assert(alien.getAs[Double]("est_inter") >= 0.0)
    assert(alien.getAs[Double]("est_inter") < 100.0)
    // m=256 ⇒ ~6.5 % std error; 25 % is a generous 4σ bound
    assert(math.abs(twin.getAs[Double]("est_a") - 400.0) < 100.0)
  }

  test("props stats: missing keys and bad JSON are NULLs, not errors") {
    val s = spark
    import s.implicits._
    val events = Seq(
      ("a", """{"k": 10}"""), ("a", """{"k": 20}"""),
      ("a", """{"other": 1}"""),  // key absent → null k
      ("b", "not json at all"),   // malformed → null k
      ("b", """{"k": 7}"""))
      .toDF("event_type", "props")
    val r = RelQueries.propsStats(events).collect()
      .map(x => x.getAs[String]("event_type") -> x).toMap
    assert(r("a").getAs[Long]("n") == 3L)
    assert(r("a").getAs[Long]("n_k") == 2L)
    assert(r("a").getAs[Double]("p50_k") == 15.0) // interpolated .0
    assert(r("a").getAs[Long]("sum_k") == 30L)
    assert(r("b").getAs[Long]("n_k") == 1L)
    assert(r("b").getAs[Double]("avg_k") == 7.0)
  }

  test("event paths: triples form per user in time order, ranked by count") {
    val s = spark
    import s.implicits._
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // user 1: a b c d → paths a>b>c, b>c>d ; user 2: a b c → a>b>c
    val events = Seq(
      (1L, 1L, "a", ts(0)), (1L, 2L, "b", ts(1)),
      (1L, 3L, "c", ts(2)), (1L, 4L, "d", ts(3)),
      (2L, 5L, "a", ts(0)), (2L, 6L, "b", ts(1)), (2L, 7L, "c", ts(2)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val r = RelQueries.eventPaths(events).collect()
      .map(x => (x.getAs[String]("path"), x.getAs[Long]("n"),
        x.getAs[Long]("rk")))
    assert(r.toSeq == Seq(("a>b>c", 2L, 1L), ("b>c>d", 1L, 2L)))
  }

  test("sessionFunnel: cross-session steps don't convert, in-session do") {
    val s = spark
    import s.implicits._
    val ts = (h: Int, m: Int) =>
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val events = Seq(
      // user 1: full funnel inside one session
      (1L, 1L, "view", ts(10, 0)), (1L, 2L, "click", ts(10, 5)),
      (1L, 3L, "purchase", ts(10, 10)),
      // user 2: view in session 1, click+purchase in a LATER session
      // — click/purchase must NOT credit (no view in their session)
      (2L, 4L, "view", ts(10, 0)),
      (2L, 5L, "click", ts(13, 0)), (2L, 6L, "purchase", ts(13, 5)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val r = RelQueries
      .sessionFunnel(events, Seq("view", "click", "purchase")).collect()
      .map(x => x.getAs[String]("step") -> x.getAs[Long]("n_sessions"))
      .toMap
    assert(r == Map("view" -> 2L, "click" -> 1L, "purchase" -> 1L))
  }

  test("cohortValue: cumulative LTV per planted cohort") {
    val s = spark
    import s.implicits._
    val ts = (d: Int) => java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00")
    // 2024-01-01 is a Monday: users 1,2 join week 0; user 1 spends
    // 10 in week 0 and 5 in week 1; user 2 spends 2 in week 0
    val events = Seq(
      (1L, 1L, "purchase", 10.0, ts(0)),
      (1L, 2L, "purchase", 5.0, ts(7)),
      (2L, 3L, "purchase", 2.0, ts(1)))
      .toDF("user_id", "event_id", "event_type", "value", "ts")
    val rows = RelQueries.cohortValue(events).collect()
      .map(r => r.getAs[Int]("week_offset") ->
        (r.getAs[Double]("cum_value"), r.getAs[Double]("ltv_per_user")))
      .toMap
    assert(rows(0) == ((12.0, 6.0)))
    assert(rows(1) == ((17.0, 8.5)))
  }

  test("gapStats: planted gaps give exact percentiles and over-gap frac") {
    val s = spark
    import s.implicits._
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 ${10 + m / 60}%02d:${m % 60}%02d:00")
    // user 1 gaps: 60s, 60s, 3600s; user 2 gap: 120s
    val events = Seq(
      (1L, 1L, "a", ts(0)), (1L, 2L, "a", ts(1)), (1L, 3L, "a", ts(2)),
      (1L, 4L, "a", ts(62)),
      (2L, 5L, "a", ts(0)), (2L, 6L, "a", ts(2)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val r = RelQueries.gapStats(events).collect()(0)
    assert(r.getAs[Long]("n_gaps") == 4L)
    assert(r.getAs[Double]("p50_gap_s") == 90.0) // {60,60,120,3600} interp
    assert(r.getAs[Double]("frac_over_gap") == 0.25)
  }

  test("userActivity: planted concentration computes exactly") {
    val s = spark
    import s.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    // 9 users × 1 event, 1 user × 11 events → 20 total; p90 of
    // counts {1×9, 11} = 2.0 (interpolated) → top set = the whale
    val events = ((1L to 9L).map(u => (u, u, "a", ts0)) ++
      (1L to 11L).map(i => (10L, 100L + i, "a", ts0)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val r = RelQueries.userActivity(events).collect()(0)
    assert(r.getAs[Long]("n_users") == 10L)
    assert(r.getAs[Double]("p50_events") == 1.0)
    assert(r.getAs[Double]("top_share") == 0.55) // 11/20
  }

  test("sessionStats: hand-built sessions give exact counts and medians") {
    val s = spark
    import s.implicits._
    val ts = (h: Int, m: Int) =>
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // user 1: two sessions (3 events, then 1 after a >30min gap);
    // user 2: one 2-event session
    val events = Seq(
      (1L, 1L, "a", ts(10, 0)), (1L, 2L, "b", ts(10, 10)),
      (1L, 3L, "c", ts(10, 20)),
      (1L, 4L, "d", ts(12, 0)),
      (2L, 5L, "a", ts(10, 0)), (2L, 6L, "b", ts(10, 5)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val r = RelQueries.sessionStats(events).collect()(0)
    assert(r.getAs[Long]("n_sessions") == 3L)
    assert(r.getAs[Long]("n_users") == 2L)
    assert(r.getAs[Double]("avg_events") == 2.0)         // (3+1+2)/3
    assert(r.getAs[Double]("median_events") == 2.0)
    // durations incl. the 30min tail: 50, 30, 35 min → median 35*60
    assert(r.getAs[Double]("median_dur_s") == 2100.0)
  }

  test("transition matrix: per-src probabilities sum to 1, counts exact") {
    val s = spark
    import s.implicits._
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // user 1: a b a b ; user 2: a a c — transitions:
    // a>b ×2, b>a ×1, a>a ×1, a>c ×1
    val events = Seq(
      (1L, 1L, "a", ts(0)), (1L, 2L, "b", ts(1)),
      (1L, 3L, "a", ts(2)), (1L, 4L, "b", ts(3)),
      (2L, 5L, "a", ts(0)), (2L, 6L, "a", ts(1)), (2L, 7L, "c", ts(2)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val r = RelQueries.transitionMatrix(events).collect()
      .map(x => (x.getAs[String]("src"), x.getAs[String]("dst")) ->
        (x.getAs[Long]("n"), x.getAs[Double]("p"))).toMap
    assert(r(("a", "b")) == ((2L, 0.5)))
    assert(r(("a", "a")) == ((1L, 0.25)))
    assert(r(("a", "c")) == ((1L, 0.25)))
    assert(r(("b", "a")) == ((1L, 1.0)))
    // rows are a proper distribution per src
    r.keys.map(_._1).toSeq.distinct.foreach { src =>
      val tot = r.collect { case ((s2, _), (_, p)) if s2 == src => p }.sum
      assert(math.abs(tot - 1.0) < 1e-9)
    }
  }

  test("calibration: bins partition the corpus, ece is the weighted gap") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma", "en"), (2L, "delta epsilon", "en"),
      (3L, "zeta eta theta iota", "de"), (4L, "kappa", "de"),
      (5L, "lambda mu nu xi omicron", "en"), (6L, "pi rho sigma", "de"))
      .toDF("doc_id", "text", "lang")
    val r = TextAnalysis.calibration(docs, col("lang") === "en").collect()
    assert(r.map(_.getAs[Long]("n")).sum == 6L)
    r.foreach { row =>
      val (conf, acc) = (row.getAs[Double]("mean_conf"),
        row.getAs[Double]("pos_rate"))
      assert(conf >= 0.0 && conf <= 1.0 && acc >= 0.0 && acc <= 1.0)
      assert(math.abs(row.getAs[Double]("gap") -
        math.abs(conf - acc)) < 2e-6)
    }
    // ece column is constant and equals the n-weighted mean gap
    val eces = r.map(_.getAs[Double]("ece")).distinct
    assert(eces.length == 1)
    val manual = r.map(x => x.getAs[Long]("n") * x.getAs[Double]("gap")).sum /
      r.map(_.getAs[Long]("n")).sum
    assert(math.abs(eces.head - manual) < 1e-5)
  }

  test("quantile sketch: within one bin of exact, degenerate range exact") {
    val s = spark
    import s.implicits._
    val events = (1 to 100).map(i => (i.toLong, i.toDouble))
      .toDF("event_id", "value")
    val r = Sketches.quantileSketch(events).collect()
    assert(r.length == 4)
    // error ≤ bin width + inter-value spacing (integers: spacing 1 —
    // the sketch places the quantile inside the covering bin, while
    // the exact interpolates between adjacent order statistics)
    val width = 99.0 / 256
    r.foreach { row =>
      assert(math.abs(row.getAs[Double]("err")) <= width + 1.0,
        s"p=${row.getAs[Double]("p")} err=${row.getAs[Double]("err")}")
    }
    // p50 exact is 50.5 (continuous rank 0.5·99+1)
    val p50 = r.find(_.getAs[Double]("p") == 0.5).get
    assert(p50.getAs[Double]("exact_v") == 50.5)
    // all-equal stream: sketch collapses to the single value, zero error
    val flat = (1 to 10).map(i => (i.toLong, 7.0)).toDF("event_id", "value")
    Sketches.quantileSketch(flat).collect().foreach { row =>
      assert(row.getAs[Double]("est_q") == 7.0)
      assert(row.getAs[Double]("err") == 0.0)
    }
  }

  test("signal correlation: perfect linear pair hits r=1, bounds hold") {
    val s = spark
    import s.implicits._
    // texts engineered so length grows with distinct-word count —
    // correlations must land in [−1, 1] and n_docs must count all
    val docs = (1 to 12).map { i =>
      val words = (0 until i + 1).map(j => s"tok$j").mkString(" ")
      (i.toLong, words, words.length.toLong)
    }.toDF("doc_id", "text", "n_chars")
    val r = TextAnalysis.signalCorrelation(docs).collect()(0)
    assert(r.getAs[Long]("n_docs") == 12L)
    Seq("r_quality_xent", "r_quality_len", "r_xent_len").foreach { c =>
      val v = r.getAs[Double](c)
      assert(v >= -1.0 && v <= 1.0, s"$c=$v out of bounds")
    }
    // all-distinct growing docs: longer ⇒ rarer words ⇒ higher xent;
    // length and cross-entropy must correlate strongly positively
    assert(r.getAs[Double]("r_xent_len") > 0.8)
  }

  test("retrieval eval: textbook P@k/MRR/recall on a two-label plant") {
    val s = spark
    import s.implicits._
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f), 1), (1L, Seq(0.9f, 0.1f), 1),
      (2L, Seq(0.0f, 1.0f), 2), (3L, Seq(0.1f, 0.9f), 2))
      .toDF("vec_id", "embedding", "label")
    // query 0 (label 1), k=2: top-2 = [1 (relevant, rank 1), 3 (not)]
    val r = Similarity.retrievalEval(emb, k = 2, nQueries = 1).collect()(0)
    assert(r.getAs[Long]("n_queries") == 1L)
    assert(r.getAs[Double]("p_at_k") == 0.5)
    assert(r.getAs[Double]("mrr") == 1.0)
    assert(r.getAs[Double]("recall_at_k") == 1.0)
  }

  test("c-TF-IDF ranks the cluster-specific term above shared filler") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "apple apple the the"), (1L, "apple the the"),
      (2L, "rocket the the"), (3L, "rocket rocket the"))
      .toDF("doc_id", "text")
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f), 0), (1L, Seq(0.9f, 0.1f), 0),
      (2L, Seq(0.0f, 1.0f), 1), (3L, Seq(0.1f, 0.9f), 1))
      .toDF("vec_id", "embedding", "label")
    val top = Similarity.clusterKeywords(docs, emb, topN = 1).collect()
      .map(r => r.getAs[Int]("label") -> r.getAs[String]("t")).toMap
    // "the" is frequent everywhere → low idf; the cluster-specific
    // term wins each cluster
    assert(top == Map(0 -> "apple", 1 -> "rocket"))
  }

  test("EL2N pruning deciles partition the corpus with in-bucket means") {
    val docs = Tables.documents(spark, sf)
    val r = TextAnalysis.pruningScores(docs).collect()
    val total = r.map(_.getAs[Long]("n")).sum
    assert(total == docs.count(), "every doc lands in exactly one bucket")
    r.foreach { row =>
      val b = row.getAs[Long]("bucket")
      val m = row.getAs[Double]("avg_el2n")
      assert(b >= 0 && b <= 9)
      // bucket 9 also holds the capped e6 = 1e6 row, hence <=
      assert(m >= b / 10.0 - 1e-6 && m <= (b + 1) / 10.0 + 1e-6,
        s"bucket $b mean $m out of range")
    }
  }

  test("margin mining accepts a true pair and suppresses a weak hub match") {
    val s = spark
    import s.implicits._
    val emb = Seq(
      // side A (label 0): x1 has a true pair in B; x2 sits inside a
      // dense B neighborhood where no candidate stands out
      (0L, Seq(1.0f, 0.0f), 0), (1L, Seq(0.70711f, 0.70711f), 0),
      // side B (label 1): y≈x1 (the pair) + three near-x2 fillers
      (10L, Seq(0.9995f, 0.0316f), 1), (11L, Seq(0.75f, 0.6614f), 1),
      (12L, Seq(0.6614f, 0.75f), 1), (13L, Seq(0.8f, 0.6f), 1))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.marginMining(emb, nQ = 2, k = 3, threshold = 1.1)
      .collect()
      .map(x => x.getAs[Long]("q_id") ->
        (x.getAs[Long]("c_id"), x.getAs[Double]("margin"),
          x.getAs[Boolean]("accepted"))).toMap
    // x1's best is the true pair at cos≈1 against a diluted
    // neighborhood (margin ≈ 1.17) → accepted
    assert(r(0L)._1 == 10L && r(0L)._3, s"true pair rejected: ${r(0L)}")
    assert(r(0L)._2 > 1.1)
    // x2's best (filler 11, lower-id tiebreak over the symmetric 12)
    // barely beats its dense neighborhood (margin ≈ 1.07) → suppressed
    assert(r(1L)._1 == 11L && !r(1L)._3, s"hub match accepted: ${r(1L)}")
    assert(r(1L)._2 < 1.1)
  }

  test("rrf fusion: sparse-only and dense-only hits both fuse, ranks add") {
    val s = spark
    import s.implicits._
    val docs = Seq((0L, "apple banana"), (1L, "apple banana"),
      (2L, "cherry plum")).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f), 0), (1L, Seq(0.0f, 1.0f), 0),
      (2L, Seq(1.0f, 0.0f), 0)).toDF("vec_id", "embedding", "label")
    val r = Similarity.rrfFusion(docs, emb, nQueries = 1).collect()
    assert(r.forall(_.getAs[Long]("q_id") == 0L))
    val byC = r.map(x => x.getAs[Long]("c_id") -> x).toMap
    // c1: sparse rank 1 (only term-sharing doc) + dense rank 2 (cos 0)
    assert(byC(1L).getAs[Long]("s_rk") == 1L)
    assert(byC(1L).getAs[Long]("d_rk") == 2L)
    // c2: no shared terms → sparse-absent (0), dense rank 1 (cos 1)
    assert(byC(2L).getAs[Long]("s_rk") == 0L)
    assert(byC(2L).getAs[Long]("d_rk") == 1L)
    assert(math.abs(byC(1L).getAs[Double]("rrf_v") -
      (1.0 / 61 + 1.0 / 62)) < 1e-6)
    assert(math.abs(byC(2L).getAs[Double]("rrf_v") - 1.0 / 61) < 1e-6)
    // two lists beat one: c1 outranks c2
    assert(byC(1L).getAs[Long]("rk") == 1L && byC(2L).getAs[Long]("rk") == 2L)
  }

  test("pmi collocations: min-count floor, textbook score, rare pairs capped") {
    val s = spark
    import s.implicits._
    // "new york" ×5 adjacent; "york new" only ×4 (falls below floor)
    val docs = Seq(
      (1L, "new york new york new york new york new york"),
      (2L, "x y")).toDF("doc_id", "text")
    val r = TextAnalysis.pmiCollocations(docs).collect()
    assert(r.map(_.getAs[String]("bigram")).toSeq == Seq("new york"))
    val row = r.head
    assert(row.getAs[Long]("c12") == 5L)
    assert(row.getAs[Long]("c1") == 5L && row.getAs[Long]("c2") == 5L)
    // N=12 tokens, B=10 bigrams: ln((5/10) / ((5/12)·(5/12)))
    val expect = math.log((5.0 / 10) / ((5.0 / 12) * (5.0 / 12)))
    assert(math.abs(row.getAs[Double]("pmi_v") - expect) < 1e-6)
  }

  test("suffix spectrum: prefix-depth group structure on a planted corpus") {
    val s = spark
    import s.implicits._
    // two copies of "abab" + "xy": 10 suffixes total
    // depth 1: groups a×4 b×4 x×1 y×1 → 4 groups, 8 dup suffixes
    // depth 2: ab×4 ba×2 b×2 xy×1 y×1 → 5 groups
    // depth 4+: abab×2 bab×2 ab×2 b×2 xy×1 y×1 → 6 groups, max 2
    val docs = Seq((1L, "abab"), (2L, "abab"), (3L, "xy"))
      .toDF("doc_id", "text")
    val r = Dedup.suffixSpectrum(docs).collect()
      .map(x => x.getAs[Long]("prefix_len") ->
        (x.getAs[Long]("n_suffixes"), x.getAs[Long]("n_groups"),
          x.getAs[Long]("n_dup_suffixes"), x.getAs[Long]("max_group"))).toMap
    assert(r.keySet == Set(1L, 2L, 4L, 8L, 16L, 32L, 64L))
    assert(r(1L) == ((10L, 4L, 8L, 4L)))
    assert(r(2L) == ((10L, 5L, 8L, 4L)))
    assert(r(4L) == ((10L, 6L, 8L, 2L)))
    // no prefix exceeds 4 chars: deeper levels are fixed points
    Seq(8L, 16L, 32L, 64L).foreach(l => assert(r(l) == r(4L)))
  }

  test("lsh design: balanced bands win at tau=0.5, extremes penalized") {
    val r = Dedup.lshDesign(spark).collect()
      .map(x => (x.getAs[Int]("bands"), x.getAs[Int]("rows_per_band")) -> x)
      .toMap
    assert(r.size == 5)
    // b=1 (pure AND): crushes FP but misses most true pairs above tau
    assert(r((1, 16)).getAs[Double]("fn_area") >
      r((4, 4)).getAs[Double]("fn_area"))
    // b=16 (pure OR): catches everything, floods FP
    assert(r((16, 1)).getAs[Double]("fp_area") >
      r((4, 4)).getAs[Double]("fp_area"))
    // rank order matches an independent recomputation of the integral;
    // round like the operator — (1,16) and (16,1) have EXACTLY
    // symmetric costs (t ↔ 1−t on the symmetric midpoint grid), so
    // raw float sums differ only in ulps and the bands tie-break must
    // decide, not summation noise
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val costs = Seq((1, 16), (2, 8), (4, 4), (8, 2), (16, 1)).map {
      case (b, rr) =>
        val ts = (0 until 100).map(i => (i + 0.5) / 100.0)
        def p(t: Double) = 1 - math.pow(1 - math.pow(t, rr), b)
        val fp = ts.filter(_ < 0.5).map(p(_) * 0.01).sum
        val fn = ts.filter(_ >= 0.5).map(t => (1 - p(t)) * 0.01).sum
        (b, rr) -> r6(r6(fp) + r6(fn))
    }.toMap
    val expectOrder = costs.toSeq.sortBy { case ((b, _), c) => (c, b) }
      .map(_._1)
    val gotOrder = r.values.toSeq.sortBy(_.getAs[Long]("rk"))
      .map(x => (x.getAs[Int]("bands"), x.getAs[Int]("rows_per_band")))
    assert(gotOrder == expectOrder, s"got $gotOrder expected $expectOrder")
    // S-curve midpoint moves right as r grows
    assert(r((1, 16)).getAs[Double]("t_half") >
      r((16, 1)).getAs[Double]("t_half"))
    // cost is consistent with its parts
    r.values.foreach { row =>
      assert(math.abs(row.getAs[Double]("cost") -
        (row.getAs[Double]("fp_area") + row.getAs[Double]("fn_area"))) < 2e-6)
    }
  }

  test("suffix repeats: exemplar attribution and snippets on planted dups") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "abab"), (2L, "abab"), (3L, "xy"))
      .toDF("doc_id", "text")
    val r = Dedup.suffixRepeats(docs).collect()
    // four repeated suffix groups (abab, bab, ab, b), each ×2 docs,
    // exemplar always doc 1, positions 1..4
    assert(r.length == 4)
    assert(r.forall(_.getAs[Long]("grp_size") == 2L))
    assert(r.forall(_.getAs[Long]("n_docs") == 2L))
    assert(r.forall(_.getAs[Long]("doc_id") == 1L))
    assert(r.map(x => x.getAs[Long]("rk") -> x.getAs[String]("snippet"))
      .toMap == Map(1L -> "abab", 2L -> "bab", 3L -> "ab", 4L -> "b"))
  }

  test("winnowing: identical docs share all fingerprints, substring guarantee") {
    val s = spark
    import s.implicits._
    val common = "thequickbrownfoxjumpsoverthelazydog"
    val docs = Seq(
      (1L, common),
      (2L, common),                       // identical → all fps shared
      (3L, s"XXXXXXXXXX${common}YYYYYYYYYY"), // embedded → ≥1 shared (k+w−1=8)
      (4L, "completely unrelated stream of other characters here"))
      .toDF("doc_id", "text")
    val r = Dedup.winnowPairs(docs).collect()
      .map(x => (x.getAs[Long]("a"), x.getAs[Long]("b")) ->
        x.getAs[Long]("shared")).toMap
    assert(r.contains((1L, 2L)), "identical docs must pair")
    // the embedded common substring must surface against both copies
    assert(r.contains((1L, 3L)) && r.contains((2L, 3L)))
    assert(r((1L, 3L)) == r((2L, 3L)), "same overlap, same count")
    assert(r((1L, 2L)) >= r((1L, 3L)), "full copy shares at least as much")
    assert(!r.keys.exists(p => p._1 == 4L || p._2 == 4L),
      "unrelated doc must not pair")
  }

  test("zero-alloc hash twins match the String forms on edge values") {
    // r13: the per-character hot loop writes decimal ASCII into a
    // reused buffer instead of building Strings; this pins the twin
    // to the original (itself oracle-pinned) across digit-count
    // boundaries, zero, negatives and Long.MinValue
    val md = java.security.MessageDigest.getInstance("MD5")
    val in = new Array[Byte](48)
    val out = new Array[Byte](16)
    val edges = Seq(0L, 1L, 9L, 10L, 99L, 100L, 1L << 52, (1L << 60) - 1,
      Long.MaxValue, -1L, -10L, Long.MinValue, 128512L)
    for (g <- edges) {
      assert(Dedup.md5InfoFast(md, in, out, g) == Dedup.md5Info(md, g),
        s"md5Info twin diverges at $g")
      for (n <- edges) {
        assert(Dedup.roundHashFast(md, in, out, g, n, end = false) ==
          Dedup.roundHash(md, g, java.lang.Long.toString(n)),
          s"roundHash twin diverges at ($g, $n)")
      }
      assert(Dedup.roundHashFast(md, in, out, g, 0L, end = true) ==
        Dedup.roundHash(md, g, "END"), s"END twin diverges at $g")
    }
  }

  test("imperative suffix chain matches the declarative window form bit-for-bit") {
    // the r10 de-interpretation: the doubling rounds run in plain
    // Scala (roundHash) inside a flatMap; this differential pins them
    // to the expression form the ORACLES replay — conv(substring(
    // md5(concat(g, ':', lead-or-END)), 1, 15), 16, 10) over six
    // stacked lead() windows — on a corpus with repeats, short docs
    // (< every step) and a 1-char doc
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(7)
    val docs = (1L to 12L).map { id =>
      val n = Seq(1, 3, 17, 70, 200)(rnd.nextInt(5))
      id -> (0 until n).map(_ => "ab x,".charAt(rnd.nextInt(5))).mkString
    }.toDF("doc_id", "text")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    def nxt(g: org.apache.spark.sql.Column, step: Int) =
      conv(substring(md5(concat(g.cast("string"), lit(":"),
        coalesce(lead(g, step).over(w).cast("string"), lit("END")))),
        1, 15), 16, 10).cast("long")
    val decl = docs
      .select(col("doc_id"),
        posexplode(split(col("text"), "")).as(Seq("_p0", "ch")))
      .select(col("doc_id"), (col("_p0") + 1).as("pos"),
        ascii(col("ch")).cast("long").as("g1"))
      .withColumn("g2", nxt(col("g1"), 1))
      .withColumn("g4", nxt(col("g2"), 2))
      .withColumn("g8", nxt(col("g4"), 4))
      .withColumn("g16", nxt(col("g8"), 8))
      .withColumn("g32", nxt(col("g16"), 16))
      .withColumn("g64", nxt(col("g32"), 32))
    val imp = Dedup.chainForTest(docs)
    assert(imp.exceptAll(decl).isEmpty && decl.exceptAll(imp).isEmpty,
      "imperative and declarative chains diverge")
    // non-ASCII scope (ADVICE r10 adjudicated): Spark 4's ascii() is
    // CODE-POINT-valued — ascii('á')=225, ascii('日')=26085, astral
    // ascii('😀')=128512 — exactly DuckDB's ascii() and the
    // imperative walk's codePoints(), so the three conventions agree
    // on ALL text, not just ASCII. Pin that agreement (incl. an
    // astral surrogate-pair doc, where a UTF-16-char-based reading
    // would diverge) so a Spark behavior change cannot silently
    // un-scope the differential.
    val uniDocs = Seq((1L, "áé€x"), (2L, "日本語"),
      (3L, "a" + new String(Character.toChars(0x1F600)) + "b"))
    val uni = uniDocs.toDF("doc_id", "text")
    val g1 = Dedup.chainForTest(uni).select("doc_id", "pos", "g1")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    for ((id, text) <- uniDocs;
         (cp, i) <- text.codePoints().toArray.zipWithIndex)
      assert(g1((id, i + 1)) == cp.toLong,
        s"doc $id pos ${i + 1}: engine must carry the code point " +
          s"(the oracle's ascii convention), got ${g1((id, i + 1))} vs $cp")
    val declUni = uni
      .select(col("doc_id"),
        posexplode(split(col("text"), "")).as(Seq("_p0", "ch")))
      .select(col("doc_id"), (col("_p0") + 1).as("pos"),
        ascii(col("ch")).cast("long").as("g1"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(declUni == g1,
      "Spark ascii()/split('') diverged from the code-point convention")
  }

  test("imperative winnowing matches the declarative struct-max window form") {
    // same differential for winnowFps: md5 k-gram hashes + the
    // rightmost-min-per-window deque vs the lexicographic struct-max
    // ((-h, pos)) window + distinct — including hash-tie windows
    // (planted identical grams) where the rightmost rule decides
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val k = 5; val win = 4
    val rnd = new scala.util.Random(11)
    val docs = (1L to 10L).map { id =>
      val n = 8 + rnd.nextInt(120)
      // tiny alphabet → repeated grams → real tie exercise
      id -> (0 until n).map(_ => "abc".charAt(rnd.nextInt(3))).mkString
    }.toDF("doc_id", "text")
    val base = docs.select(col("doc_id"),
      regexp_replace(lower(col("text")), "\\s+", "").as("t"))
      .withColumn("np", length(col("t")) - (k - 1))
      .where(col("np") >= win)
    val wW = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.currentRow, win - 1)
    val decl = base.select(col("doc_id"), col("np"),
      posexplode(transform(sequence(lit(1), col("np")),
        i => conv(substring(md5(col("t").substr(i, lit(k))), 1, 8), 16, 10)
          .cast("long"))).as(Seq("p0", "h")))
      .select(col("doc_id"), col("np"), (col("p0") + 1).as("pos"), col("h"))
      .withColumn("pick", max(struct((-col("h")).as("nh"),
        col("pos").as("p"))).over(wW))
      .where(col("pos") <= col("np") - (win - 1))
      .select(col("doc_id"), (-col("pick.nh")).as("fp_h")).distinct()
    val md = java.security.MessageDigest.getInstance("MD5")
    val imp = docs.collect().flatMap { r =>
      val t = r.getAs[String]("text").toLowerCase.replaceAll("\\s+", "")
      if (t.length - (k - 1) >= win)
        Dedup.winnowFps(md, t, k, win).map(r.getAs[Long]("doc_id") -> _)
      else Iterator.empty
    }.toSet
    val want = decl.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("fp_h")).toSet
    assert(imp == want, s"fp sets diverge: extra=${imp -- want} missing=${want -- imp}")
  }

  test("hll sketch: estimate tracks exact, duplication-invariant, max-merge") {
    val s = spark
    import s.implicits._
    // ~600 distinct tokens across two sources (>> m=256 registers)
    val docs = (0 until 60).map { i =>
      (i.toLong, s"src${i % 2}",
        (0 until 10).map(j => s"tok_${i}_$j").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val r = Sketches.hllDistinct(docs).collect()
    assert(r.length == 2)
    r.foreach { row =>
      assert(row.getAs[Long]("exact_distinct") == 300L)
      // HLL standard error at m=256 is ~6.5%; allow 3σ
      assert(math.abs(row.getAs[Double]("rel_err")) < 0.2,
        s"rel_err ${row.getAs[Double]("rel_err")}")
    }
    // duplication invariance: the sketch counts DISTINCT values, so
    // unioning the corpus with itself must not move a single register
    val doubled = docs.union(docs.withColumn("doc_id", col("doc_id") + 100))
    assert(Sketches.hllDistinct(doubled).collect().toSeq ==
      r.toSeq)
    // mergeability: max-merging per-half sketches == sketch of the whole
    val (a, b) = (docs.where($"doc_id" < 30), docs.where($"doc_id" >= 30))
    val merged = Sketches.hllRegisters(a).union(Sketches.hllRegisters(b))
      .groupBy("source", "idx").agg(max("mj").as("mj"))
    val whole = Sketches.hllRegisters(docs)
    assert(merged.except(whole).count() == 0 &&
      whole.except(merged).count() == 0)
  }

  test("cms sketch: one-sided overcount, exact on sparse streams") {
    val s = spark
    import s.implicits._
    // heavy token "hot" ×40, others light — few distinct, sparse buckets
    val docs = Seq(
      (1L, ("hot " * 40).trim),
      (2L, "cold mild warm cool cold mild hot")).toDF("doc_id", "text")
    val r = Sketches.cmsHeavyHitters(docs, topK = 5).collect()
    val hot = r.find(_.getAs[String]("word") == "hot").get
    assert(hot.getAs[Long]("rk") == 1L)
    assert(hot.getAs[Long]("exact_c") == 41L)
    r.foreach { row =>
      assert(row.getAs[Long]("over_c") >= 0L, "CMS must never undercount")
      // 6 distinct tokens into 256 buckets: no collisions expected
      assert(row.getAs[Long]("over_c") == 0L)
    }
  }

  test("ab test: textbook z on a hand split, boundary not significant") {
    val s = spark
    import s.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    // users 1..8; purchases by 2,4,6 (variant 0) and 1 (variant 1)
    val events = ((1L to 8L).map(u => (u * 10, u, "view", ts0)) ++
      Seq(2L, 4L, 6L, 1L).map(u => (u * 100, u, "purchase", ts0)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val r = RelQueries.abTest(events).collect()(0)
    assert(r.getAs[Long]("a_users") == 4L && r.getAs[Long]("a_conv") == 3L)
    assert(r.getAs[Long]("b_users") == 4L && r.getAs[Long]("b_conv") == 1L)
    // p = 0.5 → se = sqrt(0.25·0.5) = 0.353553, z = −0.5/se = −1.414214
    assert(math.abs(r.getAs[Double]("z_v") - -1.414214) < 1e-6)
    assert(r.getAs[Int]("significant") == 0)
    // a lopsided split clears the 1.96 bound
    val big = ((1L to 40L).map(u => (u * 10, u, "view", ts0)) ++
      (1L to 40L).filter(_ % 2 == 0).map(u => (u * 100, u, "purchase", ts0)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val r2 = RelQueries.abTest(big).collect()(0)
    assert(r2.getAs[Double]("a_rate") == 1.0)
    assert(r2.getAs[Double]("b_rate") == 0.0)
    assert(r2.getAs[Int]("significant") == 1)
  }

  test("pagerank: dangling mass redistributed, total mass 1, sinks win") {
    val s = spark
    import s.implicits._
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // user 1: a b c ; user 2: a b — edges a>b ×2, b>c ×1; c dangling
    val events = Seq(
      (1L, 1L, "a", ts(0)), (1L, 2L, "b", ts(1)), (1L, 3L, "c", ts(2)),
      (2L, 4L, "a", ts(0)), (2L, 5L, "b", ts(1)))
      .toDF("user_id", "event_id", "event_type", "ts")
    // one round by hand: base 0.15/3 = 0.05, dangling share
    // 0.85·(1/3)/3 = 0.0944..; a gets no inflow, b and c get 1/3 each
    val r1 = RelQueries.pageRank(events, iters = 1).collect()
      .map(x => x.getAs[String]("node") -> x.getAs[Double]("pr")).toMap
    assert(math.abs(r1("a") - (0.05 + 0.85 / 9)) < 1e-6)
    assert(math.abs(r1("b") - (0.05 + 0.85 * (1.0 / 3 + 1.0 / 9))) < 1e-6)
    assert(r1("b") == r1("c"))
    // default 5 rounds: still a distribution, and the flow sink (c,
    // fed by everything via b) outranks the source a
    val r5 = RelQueries.pageRank(events).collect()
      .map(x => x.getAs[String]("node") -> x.getAs[Double]("pr")).toMap
    assert(math.abs(r5.values.sum - 1.0) < 1e-5)
    assert(r5("c") > r5("a"))
  }

  test("readability: known counts give the textbook Flesch/ARI values") {
    val s = spark
    import s.implicits._
    // 6 words, 2 sentences, 6 vowel groups, 18 alnum chars
    val docs = Seq((1L, "The cat sat. The dog ran!"), (2L, "x"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.readability(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Long]("n_words") == 6L)
    assert(r(1L).getAs[Long]("n_sents") == 2L)
    assert(r(1L).getAs[Long]("n_syllables") == 6L)
    assert(r(1L).getAs[Long]("n_chars") == 18L)
    // 2e-6 tolerance: outputs are floor-truncated at 1e-6, not rounded
    assert(math.abs(r(1L).getAs[Double]("flesch") - 119.19) < 2e-6)
    assert(math.abs(r(1L).getAs[Double]("ari") - -5.8) < 2e-6)
    // fragments: zero sentences/syllables floor at 1, no divide-by-zero
    assert(r(2L).getAs[Long]("n_sents") == 1L)
    assert(math.abs(r(2L).getAs[Double]("flesch") - 121.22) < 2e-6)
  }

  test("funnel latency: stats over completers only, first→last step") {
    val s = spark
    import s.implicits._
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val events = Seq(
      // user 1 converts in 2 min; user 2 in 4 min
      (1L, "view", ts(0)), (1L, "click", ts(1)), (1L, "purchase", ts(2)),
      (2L, "view", ts(10)), (2L, "click", ts(12)), (2L, "purchase", ts(14)),
      // user 3 never purchases — excluded
      (3L, "view", ts(0)), (3L, "click", ts(5)))
      .toDF("user_id", "event_type", "ts")
    val r = RelQueries.funnelLatency(events, Seq("view", "click", "purchase"))
      .collect().head
    assert(r.getAs[Long]("completers") == 2L)
    assert(r.getAs[Double]("min_s") == 120.0)
    assert(r.getAs[Double]("max_s") == 240.0)
    assert(r.getAs[Double]("mean_s") == 180.0)
    assert(r.getAs[Double]("median_s") == 180.0)
  }

  test("retention: two cohorts, offsets count distinct active users") {
    val s = spark
    import s.implicits._
    // weeks: 2024-01-01 (Mon) and 2024-01-08; user 1 active both
    // weeks, user 2 only week 0, user 3 first appears week 1
    val t = (d: Int) => java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    val events = Seq(
      (1L, t(1)), (1L, t(2)), (1L, t(9)),
      (2L, t(3)),
      (3L, t(8)))
      .toDF("user_id", "ts").withColumn("event_type", lit("view"))
    val r = RelQueries.retention(events).collect()
      .map(x => (x.getAs[Long]("cohort_week_s"), x.getAs[Int]("week_offset"))
        -> ((x.getAs[Long]("active_users"), x.getAs[Long]("cohort_users"),
             x.getAs[Double]("retention")))).toMap
    val w0 = java.time.LocalDate.of(2024, 1, 1)
      .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
    val w1 = w0 + 7 * 86400
    assert(r == Map(
      (w0, 0) -> ((2L, 2L, 1.0)), // users 1,2 in week 0
      (w0, 1) -> ((1L, 2L, 0.5)), // user 1 returns
      (w1, 0) -> ((1L, 1L, 1.0)))) // user 3's own cohort
  }

  test("WAV resample: identity copy, roundtrip geometry, exact frames") {
    val src = pipeline.Multimodal.encodeWav(2, 16000, 300, 42L)
    // identity resample (same frame count) copies the data verbatim
    val same = pipeline.Multimodal.resampleWav(src, 300)
    assert(same.drop(44).sameElements(src.drop(44)))
    // downsample: every output frame is some source frame, geometry
    // re-decodes at the target length
    val down = pipeline.Multimodal.resampleWav(src, 100)
    assert(pipeline.Multimodal.decodeWav(down) == ((2, 16000, 100L)))
    val block = 4
    (0 until 100).foreach { j =>
      val sj = j * 300 / 100
      (0 until block).foreach { c =>
        assert(down(44 + j * block + c) == src(44 + sj * block + c))
      }
    }
    // upsample past the source length repeats frames, never reads OOB
    val up = pipeline.Multimodal.resampleWav(src, 450)
    assert(pipeline.Multimodal.decodeWav(up) == ((2, 16000, 450L)))
  }

  test("novelty: duplicated docs score 0, unique doc 1, short doc null") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "an entirely different sentence about spark engines here"),
      (4L, "too short")) // < 3 words → no shingles
      .toDF("doc_id", "text")
    val r = TextAnalysis.noveltyScore(docs).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_shingles"), x.getAs[Long]("n_novel"),
          Option(x.getAs[java.lang.Double]("novelty"))))).toMap
    assert(r(1L)._1 == 7L && r(1L)._2 == 0L && r(1L)._3.contains(0.0))
    assert(r(2L) == r(1L))
    assert(r(3L)._1 == 6L && r(3L)._2 == 6L && r(3L)._3.contains(1.0))
    assert(r(4L) == ((0L, 0L, None)))
    Dedup.clearShingleCache()
  }

  test("stratified sample: two-phase rank equals the global per-source rank") {
    val s = spark
    import s.implicits._
    val docs = (1L to 300L).map(i => (i, s"doc $i", s"src${i % 3}"))
      .toDF("doc_id", "text", "source")
    val r = Corpus.stratifiedSample(docs, k = 5, seed = 7L).collect()
      .map(x => (x.getAs[String]("source"), x.getAs[Long]("rk")) ->
        x.getAs[Long]("doc_id")).toMap
    // every source yields exactly k rows with ranks 1..k
    assert(r.keys.groupBy(_._1).values.forall(_.toSeq.sortBy(_._2)
      .map(_._2) == (1L to 5L)))
    // the naive single-window form must pick the identical docs
    import org.apache.spark.sql.expressions.Window
    val rnd = Dedup.md5Int(concat(col("doc_id").cast("string"),
      lit(":"), lit("7")))
    val naive = docs.withColumn("rnd", rnd)
      .withColumn("rk", row_number().over(
        Window.partitionBy("source").orderBy(col("rnd"), col("doc_id"))))
      .where(col("rk") <= 5).collect()
      .map(x => (x.getAs[String]("source"), x.getAs[Int]("rk").toLong) ->
        x.getAs[Long]("doc_id")).toMap
    assert(r == naive)
  }

  test("temperature mixture: sqrt flattening, epochs invert the shares") {
    val s = spark
    import s.implicits._
    // source a: 9 tokens, source b: 1 token → natural 0.9/0.1,
    // sqrt-tempered 3/(3+1)=0.75 / 0.25
    val docs = Seq(
      (1L, "w w w w w w w w w", "a"),
      (2L, "x", "b"))
      .toDF("doc_id", "text", "source")
    val r = Corpus.temperatureMixture(docs).collect()
      .map(x => x.getAs[String]("source") ->
        ((x.getAs[Long]("tokens"), x.getAs[Double]("natural_share"),
          x.getAs[Double]("temp_share"), x.getAs[Double]("epochs")))).toMap
    assert(r("a") == ((9L, 0.9, 0.75, 0.833333)))
    assert(r("b") == ((1L, 0.1, 0.25, 2.5)))
  }

  test("unigram trainer: exact coverage, chars never pruned, prune arithmetic") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "abab abab cdcd"), (2L, "abab cdcd cdcd"), (3L, "abab xyx"))
      .toDF("doc_id", "text")
    val v = Unigram.train(docs, seedMulti = 4, rounds = 2, prunePerRound = 1)
      .collect()
    // greedy segmentation covers every word exactly: total characters
    // reassembled from (usage × piece length) equals the corpus total
    val covered = v.map(r => r.getAs[Long]("usage") * r.getAs[Long]("n_chars")).sum
    assert(covered == "ababababcdcd".length + "ababcdcdcdcd".length +
      "ababxyx".length)
    // every corpus character survives training
    val pieces = v.map(_.getAs[String]("piece")).toSet
    assert(Set("a", "b", "c", "d", "x", "y").subsetOf(pieces))
    // 4 multi-char seeds − 2 rounds × 1 prune = 2 multi-char pieces
    assert(v.count(_.getAs[Long]("n_chars") > 1) == 2)
    // greedy longest-match: every "abab" word consumes the 4-char
    // piece whole (usage 4 = its corpus frequency), every "cdcd"
    // splits into two "cd" pieces (usage 6 = 3 words × 2) — "cd"
    // tops the ranking
    val byPiece = v.map(r => r.getAs[String]("piece") ->
      ((r.getAs[Long]("usage"), r.getAs[Long]("rank")))).toMap
    assert(byPiece("cd") == ((6L, 1L)), byPiece.toString)
    assert(byPiece("abab")._1 == 4L, byPiece.toString)
  }

  test("pca power iteration finds a planted dominant axis") {
    val s = spark
    import s.implicits._
    // variance concentrated on axis 1 (values ±4), noise on axis 3;
    // axes 0 and 2 are constant (zero variance)
    val vecs = Seq(
      (1L, Array(0.0f, 4.0f, 1.0f, 0.5f)),
      (2L, Array(0.0f, -4.0f, 1.0f, -0.5f)),
      (3L, Array(0.0f, 4.0f, 1.0f, -0.5f)),
      (4L, Array(0.0f, -4.0f, 1.0f, 0.5f)),
      (5L, Array(0.0f, 2.0f, 1.0f, 0.25f)),
      (6L, Array(0.0f, -2.0f, 1.0f, -0.25f))).toDF("vec_id", "embedding")
    val rows = Similarity.pcaPower(vecs, rounds = 12, dim = 4).collect()
      .sortBy(_.getAs[Long]("pos"))
    assert(rows.length == 4)
    val v = rows.map(_.getAs[Double]("loading"))
    // unit vector dominated by the planted axis
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-6)
    assert(math.abs(v(1)) > 0.99, v.toSeq.toString)
    assert(math.abs(v(0)) < 1e-6 && math.abs(v(2)) < 1e-6)
    // eigenvalue = the dominant variance; explained share near 1
    val lam = rows.head.getAs[Double]("eigenvalue")
    val ve = rows.head.getAs[Double]("var_explained")
    // var(axis1) = mean(4^2*4 + 2^2*2)/6 = 12; tr adds axis3's 0.1875
    assert(math.abs(lam - 12.0) < 0.05, lam.toString)
    assert(ve > 0.97 && ve <= 1.0, ve.toString)
    // real embeddings: sane spectrum card
    val real = Similarity.pcaPower(Tables.embeddings(spark, sf)).collect()
    assert(real.length == 64)
    assert(math.abs(real.map(_.getAs[Double]("loading"))
      .map(x => x * x).sum - 1.0) < 1e-6)
    val rv = real.head.getAs[Double]("var_explained")
    assert(rv > 0.0 && rv <= 1.0)
    // all-but-the-top on the planted data: removing the dominant
    // axis leaves only the noise axis's mass (Pythagoras holds)
    val abtt = Similarity.allButTop(vecs, rounds = 12, dim = 4).collect()
    abtt.foreach { r =>
      val (p, nc, na) = (r.getAs[Double]("proj_v"),
        r.getAs[Double]("norm_centered"), r.getAs[Double]("norm_abtt"))
      assert(math.abs(na * na + p * p - nc * nc) < 1e-4, r.toString)
      assert(na <= nc)
    }
    // removing the dominant component strips almost all of doc 1's
    // centered mass (axis 1 ±4 dominates; only ~the noise axis's
    // ±0.5 remains, less the slight axis-1/axis-3 correlation tilt)
    val d1 = abtt.find(_.getAs[Long]("vec_id") == 1L).get
    assert(d1.getAs[Double]("norm_centered") > 3.9, d1.toString)
    assert(d1.getAs[Double]("norm_abtt") < 0.55, d1.toString)
    // spectral gap: second component is the (near-)noise axis,
    // orthogonal to the first, with a small gap ratio
    val spec2 = Similarity.pcaSpectrum(vecs, rounds = 12, dim = 4).collect()
      .sortBy(_.getAs[Long]("pos"))
    val v2 = spec2.map(_.getAs[Double]("loading2"))
    assert(math.abs(v2.map(x => x * x).sum - 1.0) < 1e-6)
    val h = spec2.head
    assert(h.getAs[Double]("eigenvalue1") > h.getAs[Double]("eigenvalue2"))
    assert(h.getAs[Double]("eigenvalue2") > 0.0)
    assert(h.getAs[Double]("gap_ratio") < 0.05, h.toString)
    assert(h.getAs[Double]("orthogonality") < 1e-3, h.toString)
  }

  test("psi: zero for identical halves, positive and additive on drift") {
    val s = spark
    import s.implicits._
    // the half split is global on the doc_id range (1..8 -> ids 1-4
    // first half, 5-8 second): source A repeats its texts across the
    // two halves (identical distributions -> every term 0); B's
    // second half shifts to stopword-soup scores
    val docs = Seq(
      (1L, "alpha beta gamma delta", "A"), (2L, "one two", "A"),
      (3L, "x", "B"), (4L, "y", "B"),
      (5L, "alpha beta gamma delta", "A"), (6L, "one two", "A"),
      (7L, "the of and to in a is it you that the of and", "B"),
      (8L, "the of and to in a is it you that the of and more", "B"))
      .toDF("doc_id", "text", "source")
    val rows = Corpus.psiDrift(docs).collect()
    assert(rows.length == 2 * 10)
    val aPsi = rows.filter(_.getAs[String]("source") == "A")
      .map(_.getAs[Double]("psi")).distinct
    assert(aPsi.toSeq == Seq(0.0), aPsi.toSeq.toString)
    val b = rows.filter(_.getAs[String]("source") == "B")
    assert(b.head.getAs[Double]("psi") > 0.0)
    // psi is the sum of its terms; every term is nonnegative
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val terms = rs.map(_.getAs[Double]("psi_term"))
      assert(terms.forall(_ >= 0.0))
      assert(math.abs(terms.sum - rs.head.getAs[Double]("psi")) < 1e-4)
      // smoothed shares each sum to 1 over the dense grid
      assert(math.abs(rs.map(_.getAs[Double]("ref_share")).sum - 1.0) < 1e-4)
      assert(math.abs(rs.map(_.getAs[Double]("cur_share")).sum - 1.0) < 1e-4)
    }
    // real corpus: one row per (source, bucket), all psi finite >= 0
    val real = Corpus.psiDrift(Tables.documents(spark, sf)).collect()
    assert(real.forall(r => r.getAs[Double]("psi") >= 0.0 &&
      !r.getAs[Double]("psi").isNaN))
  }

  test("unimax: prefix-sum water-filling matches the sequential loop") {
    val docs = Tables.documents(spark, sf)
    val cap = 2L
    val budget = 45000L
    val rows = Corpus.unimaxAllocate(docs, budget, cap.toInt).collect()
      .sortBy(_.getAs[Long]("rank"))
    // reference: UniMax's own sequential algorithm, ascending order
    val langs = rows.map(r =>
      r.getAs[String]("lang") -> r.getAs[Long]("tokens"))
    assert(langs.map(_._2).toSeq == langs.map(_._2).toSeq.sorted)
    // sequential water-filling; uncapped shares equalized as the
    // operator documents (no remainder dribble)
    var remaining = budget
    var k = langs.length
    val expected = langs.map { case (lang, c) =>
      val quota = math.min(c * cap, remaining / k)
      remaining -= quota; k -= 1
      lang -> quota
    }.toMap
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      val capped = r.getAs[Int]("capped")
      if (capped == 1)
        assert(r.getAs[Long]("quota_tokens") == expected(lang),
          s"$lang: got ${r.getAs[Long]("quota_tokens")} want ${expected(lang)}")
      assert((capped == 1) ==
        (r.getAs[Long]("quota_tokens") == r.getAs[Long]("tokens") * cap))
      assert(r.getAs[Double]("epochs") <= cap + 1e-9)
    }
    // capped languages form a prefix of the ascending order
    val cappedSeq = rows.map(_.getAs[Int]("capped")).toSeq
    assert(cappedSeq == cappedSeq.sorted.reverse)
    assert(cappedSeq.contains(1) && cappedSeq.contains(0),
      "constants should exercise both branches")
    // uncapped languages share the leftover equally (floor), and the
    // allocation exhausts the budget up to the dropped remainder
    val uncapped = rows.filter(_.getAs[Int]("capped") == 0)
      .map(_.getAs[Long]("quota_tokens")).toSeq
    assert(uncapped.distinct.size <= 1)
    val spent = rows.map(_.getAs[Long]("quota_tokens")).sum
    assert(spent <= budget && budget - spent < langs.length)
  }

  test("unimax: several uncapped languages split the leftover equally") {
    val s = spark
    import s.implicits._
    // tiny langs a,b get their 2 epochs; c,d,e split the rest
    val mk = (n: Int) => Seq.fill(n)("w").mkString(" ")
    val docs = Seq(
      (1L, mk(10), "aa"), (2L, mk(20), "bb"),
      (3L, mk(500), "cc"), (4L, mk(600), "dd"), (5L, mk(700), "ee"))
      .toDF("doc_id", "text", "lang")
    val rows = Corpus.unimaxAllocate(docs, budgetTokens = 1000L,
      epochCap = 2).collect().sortBy(_.getAs[Long]("rank"))
    val byLang = rows.map(r => r.getAs[String]("lang") ->
      ((r.getAs[Int]("capped"), r.getAs[Long]("quota_tokens")))).toMap
    // a: 10*2*5=100 <= 1000 capped; b: 20*2*4=160 <= 980 capped;
    // c: 500*2*3=3000 > 940 uncapped -> leftover 1000-2*30=940,
    // share 940 div 3 = 313 for c, d, e alike
    assert(byLang("aa") == ((1, 20L)), byLang.toString)
    assert(byLang("bb") == ((1, 40L)), byLang.toString)
    Seq("cc", "dd", "ee").foreach(l =>
      assert(byLang(l) == ((0, 313L)), byLang.toString))
  }

  test("ccnet buckets: equal per-language terciles ordered by ppl") {
    val docs = Tables.documents(spark, sf)
    val rows = Corpus.ccnetBuckets(docs).collect()
    // every doc with >= 2 words is bucketed exactly once
    val scorable = TextAnalysis.bigramCrossEntropy(docs).count()
    assert(rows.length == scorable)
    assert(rows.map(_.getAs[String]("ccnet_bucket")).toSet
      .subsetOf(Set("head", "middle", "tail")))
    val order = Map("head" -> 0, "middle" -> 1, "tail" -> 2)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, ls) =>
      // tercile sizes differ by at most one, larger terciles first
      val sizes = ls.groupBy(_.getAs[String]("ccnet_bucket"))
        .view.mapValues(_.length).toMap
      val inOrder = order.keys.toSeq.sortBy(order)
        .map(b => sizes.getOrElse(b, 0))
      assert(inOrder.max - inOrder.min <= 1, s"$lang sizes $sizes")
      assert(inOrder == inOrder.sorted.reverse, s"$lang sizes $sizes")
      // buckets partition the (ppl, doc_id) order: sorting the
      // language by the rank key must sort its bucket indices
      val sorted = ls.sortBy(r =>
        (r.getAs[Double]("ppl"), r.getAs[Long]("doc_id")))
        .map(r => order(r.getAs[String]("ccnet_bucket"))).toSeq
      assert(sorted == sorted.sorted, s"$lang buckets out of order")
    }
    // the stats card aggregates the same frame
    val stats = Corpus.ccnetStats(docs).collect()
    val statN = stats.map(_.getAs[Long]("n_docs")).sum
    assert(statN == rows.length)
    stats.foreach { r =>
      assert(r.getAs[Double]("min_ppl") <= r.getAs[Double]("mean_ppl") &&
        r.getAs[Double]("mean_ppl") <= r.getAs[Double]("max_ppl"))
    }
  }

  test("exactDecontam flags verbatim >=L-char overlap with the eval split") {
    val s = spark
    import s.implicits._
    import graft.pipeline.Dedup
    val banner = "the quick brown fox jumps over the lazy dog 0123456789"
    val docs = Seq(
      (0L, "EVAL " + banner + " TAIL OF THE EVAL DOCUMENT"),
      // a 40-char verbatim copy: contaminated at 8/16/32, clean at 64
      (10L, "zzz " + banner.take(40) + " qqq"),
      // symbol alphabet disjoint from the eval text: clean everywhere
      (11L, "@@@@-####-!!!!-%%%%-&&&&-@@@@-####-!!!!")
    ).toDF("doc_id", "text")
    val out = Dedup.exactDecontam(docs, col("doc_id") < 5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getInt(3)))).toMap
    assert(out((10L, 8L))._1 > 0 && out((10L, 8L))._2 == 1)
    assert(out((10L, 16L))._2 == 1 && out((10L, 32L))._2 == 1)
    assert(out((10L, 64L)) == ((0L, 0)), "no 64-char verbatim run exists")
    Seq(8L, 16L, 32L, 64L).foreach { l =>
      assert(out((11L, l)) == ((0L, 0)), s"clean doc flagged at $l")
    }
    // eval docs never appear in the output
    assert(!out.keySet.exists(_._1 == 0L))
    // depth-32 hit count: the 40-char copy opens 40-32+1 = 9 aligned
    // windows, plus the space BEFORE the copy ("zzz " + banner) whose
    // 32-char window equals the eval side's space-before-banner
    // ("EVAL " + banner) — 10 total, a nice reminder that verbatim
    // matching sees through intended span boundaries
    assert(out((10L, 32L))._1 == 10L)

    // the removal card: hit positions 4..13 cover the union
    // [4, 44] = 41 chars of the 48-char doc → 7 kept
    val rem = Dedup.exactDecontamRemove(docs, col("doc_id") < 5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(rem(10L) == ((10L, 41L, 7L)), s"got ${rem(10L)}")
    assert(rem(11L)._2 == 0L && rem(11L)._3 == 39L)
    assert(!rem.contains(0L))
  }

  test("DDSketch: α-guarantee, merge invariance, zero store") {
    val s = spark
    import s.implicits._
    // 100 linear values: ~92 occupied buckets, no collapse — the
    // paper's relative-error bound must hold at every probed p
    val events = (1 to 100).map(i => (i.toLong, "t", i.toDouble))
      .toDF("event_id", "event_type", "value")
    val r = Sketches.ddSketch(events).collect()
    assert(r.length == 4)
    r.foreach { row =>
      assert(row.getAs[Double]("rel_err") <= 0.01 + 1e-6,
        s"p=${row.getAs[Double]("p")} rel_err=${row.getAs[Double]("rel_err")}")
    }
    assert(r.head.getAs[Long]("n_collapsed") == 0L)
    assert(r.head.getAs[Long]("n_zero") == 0L)
    // merge = bucket addition: the sketch is partition-invariant
    val r32 = Sketches.ddSketch(events.repartition(32)).collect()
    assert(r.map(_.toSeq).toSeq == r32.map(_.toSeq).toSeq)
    // zero/negative store: non-positives counted, never bucketed
    val z = Sketches.ddSketch(events.union(
      Seq((900L, "t", 0.0), (901L, "t", -3.0))
        .toDF("event_id", "event_type", "value"))).collect()
    assert(z.head.getAs[Long]("n_zero") == 2L)
    assert(z.head.getAs[Long]("n") == 100L)
  }

  test("DDSketch: collapse folds lowest buckets, high quantiles keep α") {
    val s = spark
    import s.implicits._
    // 300 points spread over (0.001, 1] + 700 over [10, 500]: ~490
    // occupied buckets fold to the 256-cap index range; every probed
    // p ≥ 0.5 ranks in the high group, above the collapse cutoff
    val low = (0 until 300).map(i =>
      (i.toLong, "t", math.pow(10.0, -3.0 + 3.0 * i / 300.0)))
    val high = (0 until 700).map(i =>
      (1000L + i, "t", 10.0 + (490.0 * i) / 699.0))
    val r = Sketches.ddSketch((low ++ high).toDF(
      "event_id", "event_type", "value")).collect()
    assert(r.head.getAs[Long]("n_collapsed") > 100L)
    assert(r.head.getAs[Long]("n_buckets") <= 256L)
    r.foreach { row =>
      assert(row.getAs[Double]("rel_err") <= 0.01 + 1e-6,
        s"p=${row.getAs[Double]("p")} rel_err=${row.getAs[Double]("rel_err")}")
    }
  }

  test("data-constrained epochs: allocation floors, decay bounds hold") {
    val s = spark
    import s.implicits._
    // s1: 4 tokens, s2: 16 tokens → psum = 2+4 = 6, total 20, budget
    // 80 → alloc ⌊2/6·80⌋ = 26 and ⌊4/6·80⌋ = 53 (floored, integer)
    val docs = (Seq((1L, "aaaa bbbb cccc dddd", "s1")) ++
      (2 to 5).map(i => (i.toLong, "aaaa bbbb cccc dddd", "s2")))
      .toDF("doc_id", "text", "source")
    val r = Corpus.dataConstrainedEpochs(docs).collect()
      .map(x => x.getAs[String]("source") -> x).toMap
    assert(r("s1").getAs[Long]("unique_tokens") == 4L)
    assert(r("s2").getAs[Long]("unique_tokens") == 16L)
    assert(r("s1").getAs[Long]("alloc_tokens") == 26L)
    assert(r("s2").getAs[Long]("alloc_tokens") == 53L)
    assert(r("s1").getAs[Double]("epochs") == 6.5)
    // the decay formula, replayed: D' = U(1 + R*(1 − e^((1−epochs)/R*)))
    def eff(u: Double, ep: Double) =
      u * (1 + 15.39 * (1 - math.exp((1 - ep) / 15.39)))
    assert(math.abs(r("s1").getAs[Double]("eff_tokens") - eff(4, 6.5)) < 1e-5)
    assert(math.abs(r("s2").getAs[Double]("eff_tokens") -
      eff(16, 53.0 / 16)) < 1e-5)
    // monotone sanity: repetition always loses mass, and the smaller
    // (more-upsampled) source loses a larger fraction
    r.values.foreach { row =>
      assert(row.getAs[Double]("eff_tokens") <=
        row.getAs[Long]("alloc_tokens").toDouble)
      assert(row.getAs[Double]("eff_frac") <= 1.0)
    }
    assert(r("s1").getAs[Double]("eff_frac") < r("s2").getAs[Double]("eff_frac"))
  }

  test("fold packing: mirror pairs fit, odd middle and misfits sit alone") {
    val s = spark
    import s.implicits._
    def doc(id: Long, words: Int) = (id, (1 to words).map(i => "w").mkString(" "))
    // lengths 10,9,5,2,1 at ctx=12: (10,1) and (9,2) pack, 5 sits
    // alone → 3 bins, 2 pairs, fill 27/36
    val docs = Seq(doc(1, 10), doc(2, 9), doc(3, 5), doc(4, 2), doc(5, 1),
      doc(6, 15)) // oversize → chunker route
      .toDF("doc_id", "text")
    val r = Corpus.packFold(docs, ctxTokens = 12, nShards = 1).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_docs") == 5L)
    assert(row.getAs[Long]("n_oversize") == 1L)
    assert(row.getAs[Long]("tokens") == 27L)
    assert(row.getAs[Long]("n_bins") == 3L)
    assert(row.getAs[Long]("n_pairs") == 2L)
    assert(math.abs(row.getAs[Double]("fill_ratio") - 27.0 / 36) < 1e-6)
    assert(row.getAs[Long]("lower_bound") == 3L)
    // misfit mirrors stay separate: 8+7 > 12 → two singleton bins
    val misfit = Seq(doc(1, 8), doc(2, 7)).toDF("doc_id", "text")
    val m = Corpus.packFold(misfit, ctxTokens = 12, nShards = 1)
      .collect().head
    assert(m.getAs[Long]("n_bins") == 2L && m.getAs[Long]("n_pairs") == 0L)
  }

  test("soft dedup: cluster mass conserved, singletons keep full weight") {
    val s = spark
    import s.implicits._
    // cluster {1,2,3} spans s1/s2; doc 4 is a singleton. Tokens:
    // "aaaa bbbb" → 2, "cccc" → 1. Weight 1/3 → ppm 333333.
    val docs = Seq(
      (1L, "aaaa bbbb", "s1"), (2L, "aaaa bbbb", "s1"),
      (3L, "aaaa bbbb", "s2"), (4L, "cccc", "s2"))
      .toDF("doc_id", "text", "source")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val r = Corpus.softDedup(docs, pairs).collect()
      .map(x => x.getAs[String]("source") -> x).toMap
    assert(r("s1").getAs[Long]("n_docs") == 2L)
    assert(r("s1").getAs[Long]("n_discounted") == 2L)
    assert(r("s1").getAs[Long]("tokens_raw") == 4L)
    assert(math.abs(r("s1").getAs[Double]("tokens_eff") - 1.333332) < 2e-6)
    assert(math.abs(r("s1").getAs[Double]("mean_weight") - 1.0 / 3) < 2e-6)
    assert(r("s2").getAs[Long]("n_discounted") == 1L)
    assert(math.abs(r("s2").getAs[Double]("tokens_eff") -
      (2 * 0.333333 + 1.0)) < 2e-6)
    assert(math.abs(r("s2").getAs[Double]("mean_weight") -
      (0.333333 + 1.0) / 2) < 2e-6)
    // mass conservation: the cluster's three members sum to ≤ one
    // copy's weight (ppm floor), singletons keep exactly 1.0
    val eff = r.values.map(_.getAs[Double]("tokens_eff")).sum
    val raw = r.values.map(_.getAs[Long]("tokens_raw")).sum
    assert(eff <= raw.toDouble && eff > 0)
  }

  test("spectrum sketch tracks the exact census within its bounds") {
    val docs = Tables.documents(spark, sf)
    val exact = Dedup.suffixSpectrum(docs).collect()
      .map(r => r.getAs[Long]("prefix_len") -> r).toMap
    val sk = Dedup.suffixSpectrumSketch(docs).collect()
      .map(r => r.getAs[Long]("prefix_len") -> r).toMap
    assert(sk.keySet == Set(1L, 2L, 4L, 8L, 16L, 32L, 64L))
    val n = exact(1L).getAs[Long]("n_suffixes")
    for (d <- Seq(1L, 2L, 4L, 8L, 16L, 32L, 64L)) {
      val e = exact(d); val s = sk(d)
      assert(s.getAs[Long]("n_suffixes") == n, s"depth $d n")
      val exG = e.getAs[Long]("n_groups").toDouble
      val exD = e.getAs[Long]("n_dup_suffixes").toDouble
      val exM = e.getAs[Long]("max_group")
      if (d <= 2) {
        // exact mode: the hybrid must REPRODUCE the census, not
        // estimate it (a-priori bounded alphabet cardinality)
        assert(s.getAs[String]("mode") == "exact")
        assert(s.getAs[Long]("n_groups_est").toDouble == exG, s"depth $d")
        assert(s.getAs[Long]("n_dup_suffixes_est").toDouble == exD)
        assert(s.getAs[Long]("max_group_est") == exM)
      } else {
        assert(s.getAs[String]("mode") == "sketch")
        // 1/64 key-space sample: unbiased group counts; depth 4 has
        // only ~1k groups (≈16 sampled) so its band is wide
        val gTol = if (d == 4L) 0.6 else 0.25
        assert(math.abs(s.getAs[Long]("n_groups_est") / exG - 1) <= gTol,
          s"depth $d n_groups ${s.getAs[Long]("n_groups_est")} vs $exG")
        // dup mass via the low-variance singleton side
        assert(math.abs(s.getAs[Long]("n_dup_suffixes_est") - exD)
          <= math.max(0.35 * math.max(exD, 1.0), 0.05 * n),
          s"depth $d dup ${s.getAs[Long]("n_dup_suffixes_est")} vs $exD")
        // CMS min-over-rows row max: a true upper bound, within the
        // ~n/65536 collision mass
        val cm = s.getAs[Long]("max_group_est")
        assert(cm >= exM, s"depth $d CMS $cm below exact max $exM")
        assert(cm <= exM + 20L * (n / 65536L + 1L),
          s"depth $d CMS $cm too loose vs $exM")
      }
      // HLL runs at every depth (m=256 → ±~7% typical; generous band)
      assert(math.abs(s.getAs[Double]("n_groups_hll") / exG - 1) <= 0.25,
        s"depth $d hll ${s.getAs[Double]("n_groups_hll")} vs $exG")
    }
  }

  test("PNG kernel: real ImageIO roundtrip is bit-exact to the stream") {
    for ((w, h, seed) <- Seq((8, 8, 1L), (31, 23, 42L), (1, 5, 7L))) {
      val png = Multimodal.encodePng(w, h, seed)
      // a real PNG container, not a renamed bitmap
      assert((png(1) & 0xff) == 'P'.toInt && (png(2) & 0xff) == 'N'.toInt &&
        (png(3) & 0xff) == 'G'.toInt, "missing PNG signature")
      val img = Multimodal.decodeImage(png)
      assert(img.getWidth == w && img.getHeight == h)
      // decoded pixels must BE the xorshift stream (lossless codec)
      var s = seed | 1L
      def nb(): Int = {
        s ^= s << 13; s ^= s >>> 7; s ^= s << 17
        ((s >>> 56) & 0xffL).toInt
      }
      for (y <- 0 until h; x <- 0 until w) {
        val (er, eg, eb) = (nb(), nb(), nb())
        val rgb = img.getRGB(x, y)
        assert(((rgb >> 16) & 0xff) == er && ((rgb >> 8) & 0xff) == eg &&
          (rgb & 0xff) == eb, s"pixel ($x,$y) of ${w}x$h seed $seed")
      }
    }
  }

  test("generic decode dispatch: real containers get real geometry") {
    val s0 = spark
    import s0.implicits._
    val docs = Tables.documents(spark, sf).limit(12)
    for (media <- Seq(Multimodal.syntheticPngMedia(docs),
        Multimodal.syntheticGifMedia(docs),
        Multimodal.syntheticTiffMedia(docs),
        Multimodal.syntheticJpegMedia(docs))) {
      val feats = Multimodal.extractFeatures(media).collect()
      for (r <- feats) {
        val id = r.getAs[Long]("media_id")
        assert(r.getAs[Int]("width") == 8 + (id % 24).toInt &&
          r.getAs[Int]("height") == 8 + (id % 16).toInt,
          s"dispatch fell to the stub for media $id")
      }
    }
    // unrecognized bytes still fall to the deterministic stub
    val stubbed = Multimodal.extractFeatures(
      Multimodal.syntheticMedia(docs)).collect()
    assert(stubbed.nonEmpty && stubbed.forall(_.getAs[Int]("width") >= 64))
  }

  test("WAV kernel: cross-decoder parity with javax.sound.sampled") {
    // the JDK's own WAV reader decodes the hand-written RIFF/PCM16
    // container to the same header fields and the same samples —
    // the TIFF↔PNG cross-check idea applied to the audio kernel
    for ((ch, rate, n, seed) <- Seq((1, 8000, 64, 5L), (2, 44100, 333, 9L))) {
      val wav = Multimodal.encodeWav(ch, rate, n, seed)
      val (dch, drate, dn) = Multimodal.decodeWav(wav)
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
      val fmt = ais.getFormat
      assert(fmt.getChannels == ch && dch == ch)
      assert(fmt.getSampleRate.toInt == rate && drate == rate)
      assert(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian)
      assert(ais.getFrameLength == n && dn == n.toLong)
      // sample bytes byte-identical through the JDK reader
      val jdk = ais.readAllBytes()
      val ours = wav.takeRight(jdk.length)
      assert(java.util.Arrays.equals(jdk, ours), "PCM payload differs")
    }
  }

  test("TIFF kernel: cross-container parity with PNG on the same image") {
    for ((w, h, seed) <- Seq((8, 8, 4L), (31, 23, 9L))) {
      val png = Multimodal.decodeImage(Multimodal.encodePng(w, h, seed))
      val tif = Multimodal.decodeImage(Multimodal.encodeTiff(w, h, seed))
      assert(tif.getWidth == w && tif.getHeight == h)
      for (y <- 0 until h; x <- 0 until w)
        assert(png.getRGB(x, y) == tif.getRGB(x, y),
          s"containers disagree at ($x,$y) for ${w}x$h seed $seed")
    }
  }

  test("GIF kernel: indexed grayscale roundtrip is bit-exact") {
    for ((w, h, seed) <- Seq((8, 8, 2L), (31, 23, 17L), (2, 9, 5L))) {
      val gif = Multimodal.encodeGif(w, h, seed)
      assert((gif(0) & 0xff) == 'G'.toInt && (gif(1) & 0xff) == 'I'.toInt &&
        (gif(2) & 0xff) == 'F'.toInt, "missing GIF signature")
      val img = Multimodal.decodeImage(gif)
      assert(img.getWidth == w && img.getHeight == h)
      var s = seed | 1L
      for (y <- 0 until h; x <- 0 until w) {
        s ^= s << 13; s ^= s >>> 7; s ^= s << 17
        val expect = ((s >>> 56) & 0xffL).toInt
        val rgb = img.getRGB(x, y)
        assert((rgb & 0xff) == expect && ((rgb >> 8) & 0xff) == expect &&
          ((rgb >> 16) & 0xff) == expect,
          s"pixel ($x,$y) of ${w}x$h seed $seed")
      }
    }
  }

  test("image decode rejects corrupt and truncated payloads loudly") {
    intercept[IllegalArgumentException] {
      Multimodal.decodeImage("not an image at all".getBytes)
    }
    // ImageIO recognizes the signature of a truncated PNG but must
    // not return a phantom image for it
    val whole = Multimodal.encodePng(16, 16, 3L)
    val truncated = whole.take(whole.length / 2)
    intercept[Exception] { Multimodal.decodeImage(truncated) }
    intercept[IllegalArgumentException] {
      Multimodal.decodeImage(Array.empty[Byte])
    }
  }

  test("JPEG kernel: real lossy codec, geometry exact, drift bounded") {
    val s0 = spark
    import s0.implicits._
    val media = Multimodal.syntheticJpegMedia(
      Tables.documents(spark, sf).limit(30))
    val r = Multimodal.jpegDrift(media).collect()
    assert(r.length == 30)
    assert(r.forall(_.getAs[Boolean]("drift_ok")), "channel drift > tol")
    // geometry preserved exactly through the codec
    for (row <- r) {
      val id = row.getAs[Long]("media_id")
      assert(row.getAs[Int]("width") == 8 + (id % 24).toInt)
      assert(row.getAs[Int]("height") == 8 + (id % 16).toInt)
    }
    // prove a genuinely lossy codec ran: at least one image's decoded
    // bytes differ from the encoder's input (a pass-through fake
    // would be bit-exact everywhere)
    val anyLoss = media.select("media_id", "payload")
      .as[(Long, Array[Byte])].collect().exists { case (id, p) =>
        val img = Multimodal.decodeImage(p)
        val w = img.getWidth; val h = img.getHeight
        (0 until h).exists(y => (0 until w).exists { x =>
          val rgb = img.getRGB(x, y)
          val er = if (w == 1) 0 else x * 255 / (w - 1)
          val eg = if (h == 1) 0 else y * 255 / (h - 1)
          ((rgb >> 16) & 0xff) != er || ((rgb >> 8) & 0xff) != eg ||
            (rgb & 0xff) != 128
        })
      }
    assert(anyLoss, "JPEG decode was bit-exact — codec not exercised?")
  }

  test("repeats sketch surfaces a genuinely heavy depth-64 group") {
    val s0 = spark
    import s0.implicits._
    val docs = Tables.documents(spark, sf)
    val exactTop = Dedup.suffixRepeats(docs, 1).collect()(0)
      .getAs[Long]("grp_size")
    val sk = Dedup.suffixRepeatsSketch(docs).collect()
    assert(sk.nonEmpty, "sampled census found no repeated group")
    // every reported row is a real sampled census hit with an
    // unbiased 16× size estimate
    for (r <- sk) {
      assert(r.getAs[Long]("est_grp_size") ==
        16L * r.getAs[Long]("samp_size"))
      assert(r.getAs[Long]("samp_size") > 1L)
      assert(r.getAs[String]("snippet") != null)
    }
    // the sketch's top estimate lands within sampling noise of the
    // exact top group (position sampling preserves heavy ranks)
    val estTop = sk(0).getAs[Long]("est_grp_size").toDouble
    assert(estTop >= 0.2 * exactTop && estTop <= 5.0 * exactTop,
      s"sketch top $estTop vs exact top $exactTop")
  }
}
