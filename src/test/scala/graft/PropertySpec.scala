package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.pipeline.{Dedup, TextAnalysis}

/** Property-based checks (scalacheck generators, spark-evaluated):
  * invariants that hold for ALL inputs, not just the hand-picked spec
  * cases — each property batches its generated cases into one frame
  * so a check is a handful of Spark jobs, not hundreds. */
class PropertySpec extends SparkSpec {

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(5)

  private def check(p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, r.status.toString)
  }

  /** Non-empty printable-ASCII strings without md5-hostile length. */
  private val asciiDoc: Gen[String] =
    Gen.chooseNum(1, 60).flatMap(n =>
      Gen.listOfN(n, Gen.choose(32.toChar, 126.toChar)).map(_.mkString))

  test("property: resize roundtrips geometry; identity resize is a copy") {
    // pure JVM property — no Spark jobs needed
    val geom = for {
      w <- Gen.chooseNum(1, 48); h <- Gen.chooseNum(1, 40)
      ow <- Gen.chooseNum(1, 32); oh <- Gen.chooseNum(1, 32)
      seed <- Gen.chooseNum(1L, Long.MaxValue)
    } yield (w, h, ow, oh, seed)
    check(Prop.forAll(geom) { case (w, h, ow, oh, seed) =>
      val src = pipeline.Multimodal.encodeBmp(w, h, seed)
      val out = pipeline.Multimodal.resizeBmp(src, ow, oh)
      val decoded = pipeline.Multimodal.decodeBmp(out)
      val idemp = pipeline.Multimodal.resizeBmp(out, ow, oh)
      decoded == ((ow, oh, 24)) &&
        out.length == 54 + ((ow * 3 + 3) / 4) * 4 * oh &&
        // resizing at the same geometry again is pixel-stable
        idemp.drop(54).zipWithIndex.forall { case (b, i) =>
          // padding bytes may differ (source padding is xorshift
          // noise, re-encode pads zero) — compare pixel bytes only
          val oRow = ((ow * 3 + 3) / 4) * 4
          (i % oRow) >= ow * 3 || b == out(54 + i)
        }
    })
  }

  test("property: resolveTier picks a covering tier iff one exists") {
    import tsdb.Downsample._
    val gen = for {
      unagg <- Gen.chooseNum(1L, 3000L)
      rets <- Gen.listOfN(3, Gen.chooseNum(1L, 3000L))
      age <- Gen.chooseNum(1L, 4000L)
    } yield (unagg, rets, age)
    val resS = Map("10m" -> 600L, "1h" -> 3600L, "1d" -> 86400L)
    check(Prop.forAll(gen) { case (unagg, rets, age) =>
      val now = 10000L
      val policies = Seq("10m", "1h", "1d").zip(rets)
        .map { case (r, ret) => Policy(r, ret) }
      val start = now - age
      val (tier, cov) = resolveTier(unagg, policies, now, start)
      val anyCovers = (unagg +: rets).exists(now - _ <= start)
      val tierCovers = tier match {
        case Unaggregated => now - unagg <= start
        case Aggregated(_, ret) => now - ret <= start
      }
      // coverage flag is truthful, and CoversAll implies the chosen
      // tier actually retains the start
      (cov == CoversAll) == anyCovers &&
        (cov == CoversPartial || tierCovers) && {
          // optimality: when covered, no FINER covering policy exists
          // than the chosen aggregated tier (unaggregated is finest)
          tier match {
            case Aggregated(res, _) if cov == CoversAll =>
              val finerCovering = policies.filter(p =>
                now - p.retentionS <= start &&
                  resS(p.resolution) < resS(res))
              finerCovering.isEmpty && now - unagg > start
            case _ => true
          }
        }
    })
  }

  test("property: bloom filter never false-negatives a genuine dup") {
    val s = spark
    import s.implicits._
    check(Prop.forAll(Gen.listOfN(25, asciiDoc)) { texts =>
      val distinctTexts = texts.distinct
      // history = the set once; batch = the same set again plus fresh
      // strings guaranteed disjoint (suffix no history doc can have)
      val fresh = distinctTexts.zipWithIndex.map {
        case (t, i) => t + s"#fresh$i"
      }
      val n = distinctTexts.size
      val docs = (distinctTexts ++ distinctTexts ++ fresh).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val r = Dedup.bloomDedup(docs, col("doc_id") >= n).collect()
        .map(x => x.getAs[Long]("doc_id") ->
          ((x.getAs[Int]("might_dup"), x.getAs[Int]("novel")))).toMap
      // every repeated doc must be flagged (no false negatives)…
      val repeats = (n until 2 * n).forall(i => r(i.toLong) == ((1, 0)))
      // …and novel verdicts are exact regardless of bloom noise
      val freshOk = (2 * n until 2 * n + fresh.size)
        .forall(i => r(i.toLong)._2 == 1)
      repeats && freshOk
    })
  }

  test("property: normalize is idempotent and collapses case/punct variants") {
    val s = spark
    import s.implicits._
    val wordGen = Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.choose('a', 'z')).map(_.mkString))
    val docGen = Gen.chooseNum(1, 10).flatMap(n => Gen.listOfN(n, wordGen))
    check(Prop.forAll(Gen.listOfN(10, docGen)) { wordLists =>
      // variant: random case flips + punctuation joins of the same words
      val rows = wordLists.zipWithIndex.flatMap { case (ws, i) =>
        val base = ws.mkString(" ")
        val variant = ws.map(_.zipWithIndex.map { case (c, j) =>
          if ((i + j) % 2 == 0) c.toUpper else c
        }.mkString).mkString(if (i % 2 == 0) ", " else " -- ")
        Seq((i * 2L, base), (i * 2L + 1, variant))
      }
      val docs = rows.toDF("doc_id", "text")
      val n1 = TextAnalysis.normalize(docs)
      val once = n1.collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("norm_text"), r.getAs[String]("norm_md5")))).toMap
      val twice = TextAnalysis.normalize(
        n1.select(col("doc_id"), col("norm_text").as("text"))).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("norm_text")).toMap
      val idempotent = twice == once.view.mapValues(_._1).toMap
      val collapses = wordLists.indices.forall(i =>
        once(i * 2L)._2 == once(i * 2L + 1)._2)
      idempotent && collapses
    })
  }

  test("property: shuffle order is a bijection for any seed and shard count") {
    val s = spark
    import s.implicits._
    check(Prop.forAll(Gen.chooseNum(1L, 1000000L),
      Gen.chooseNum(1, 16)) { (seed, shards) =>
      val docs = (0L until 64L).map(Tuple1(_)).toDF("doc_id")
      val r = graft.pipeline.Corpus.shuffleOrder(docs, seed, shards).collect()
        .map(x => (x.getAs[Long]("shard"), x.getAs[Long]("position")))
      r.length == 64 && r.distinct.length == 64 &&
        r.forall { case (sh, _) => sh >= 0 && sh < shards }
    })
  }

  test("property: funnel counts are monotone non-increasing down the steps") {
    val s = spark
    import s.implicits._
    val eventGen = for {
      u <- Gen.chooseNum(1L, 6L)
      t <- Gen.chooseNum(0L, 3600L)
      e <- Gen.oneOf("view", "click", "purchase")
    } yield (u, e, new java.sql.Timestamp(1704067200000L + t * 1000))
    check(Prop.forAll(Gen.listOfN(60, eventGen)) { evs =>
      val df = evs.zipWithIndex
        .map { case ((u, e, t), i) => (u, i.toLong, e, t) }
        .toDF("user_id", "event_id", "event_type", "ts")
      val counts = RelQueries.funnel(df, Seq("view", "click", "purchase"))
        .collect().sortBy(_.getAs[Int]("step")).map(_.getAs[Long]("users"))
      counts.sliding(2).forall { case Array(a, b) => b <= a; case _ => true }
    })
  }

  test("property: retention offset 0 is always 100% of each cohort") {
    val s = spark
    import s.implicits._
    val eventGen = for {
      u <- Gen.chooseNum(1L, 8L)
      d <- Gen.chooseNum(0L, 27L)
    } yield (u, new java.sql.Timestamp(1704067200000L + d * 86400000L))
    check(Prop.forAll(Gen.listOfN(40, eventGen)) { evs =>
      val df = evs.toDF("user_id", "ts")
      val rows = RelQueries.retention(df).collect()
      // every user is active in their own first week, so offset 0
      // covers the whole cohort by construction
      rows.filter(_.getAs[Int]("week_offset") == 0).forall { r =>
        r.getAs[Long]("active_users") == r.getAs[Long]("cohort_users") &&
          r.getAs[Double]("retention") == 1.0
      }
    })
  }

  test("property: chunker covers every token exactly once per window step") {
    val s = spark
    import s.implicits._
    // words 1-5 chars, docs 1-200 words; window 16, overlap 4
    val wordsGen = Gen.chooseNum(1, 200).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(1, 5).flatMap(w =>
        Gen.listOfN(w, Gen.alphaLowerChar).map(_.mkString))))
    check(Prop.forAll(Gen.listOfN(10, wordsGen)) { docsWords =>
      val docs = docsWords.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val chunks = pipeline.Corpus.chunk(docs, window = 16, overlap = 4)
        .collect()
        .groupBy(_.getAs[Long]("doc_id")).view
        .mapValues(_.sortBy(_.getAs[Long]("chunk_idx"))).toMap
      docsWords.zipWithIndex.forall { case (ws, i) =>
        val n = ws.length
        val cs = chunks(i.toLong)
        val starts = cs.map(_.getAs[Long]("start_tok"))
        val ends = cs.map(r => r.getAs[Long]("start_tok") + r.getAs[Long]("n_tok"))
        starts.head == 0L &&                              // starts at 0
        ends.max == n &&                                  // covers the tail
        starts.sliding(2).forall {                        // fixed stride
          case Array(a, b) => b - a == 12; case _ => true } &&
        cs.forall(r => r.getAs[Long]("n_tok") > 0)        // no empty chunk
      }
    })
  }

  test("property: multi-index blocking finds EVERY pair within the bound") {
    val s = spark
    import s.implicits._
    // random 64-bit fps + perturbed twins at hamming ≤ 4 with diff
    // positions drawn anywhere in the word — the pigeonhole guarantee
    // says blocks=5 must find every such pair, wherever the diffs land
    val pairGen = for {
      fp <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
      k <- Gen.chooseNum(1, 4)
      bits <- Gen.pick(k, 0 until 64)
    } yield (fp, bits.foldLeft(fp)((v, b) => v ^ (1L << b)))
    check(Prop.forAll(Gen.listOfN(12, pairGen)) { pairs =>
      val fps = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
        Seq((2L * i, a), (2L * i + 1, b))
      }.toDF("doc_id", "simhash_v")
      val found = Dedup.simhashCandidatesMulti(fps, maxHamming = 4, blocks = 5)
        .collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
      pairs.indices.forall(i => found.contains((2L * i, 2L * i + 1)))
    })
  }

  test("property: two-phase series rank equals the naive global rank") {
    val s = spark
    import s.implicits._
    // random frames with shared paths, null values, and value ties —
    // the cases where a sharded rank could diverge from a plain
    // orderBy (null shard placement, tie ordering across shards)
    val rowGen = for {
      p <- Gen.chooseNum(1, 25).map(i => s"m.s$i")
      b <- Gen.chooseNum(0, 5)
      v <- Gen.option(Gen.chooseNum(-21, 21).map(_.toDouble / 7))
    } yield (p, b.toLong * 3600L, v)
    check(Prop.forAll(Gen.listOfN(120, rowGen)) { rows =>
      val df = rows.toDF("path", "bucket_s", "value")
      val got = graft.graphite.Graphite.sortByMaxima(df)
        .select("path", "sort_rank").distinct()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // naive oracle: per-path max (nulls ignored), rank desc with
      // all-null series last, path asc as the tiebreak
      val expected = rows.groupBy(_._1).toSeq
        .map { case (p, rs) =>
          val vs = rs.flatMap(_._3)
          (p, if (vs.isEmpty) None else Some(vs.max))
        }
        .sortBy { case (p, ov) => (ov.isEmpty, ov.map(-_).getOrElse(0.0), p) }
        .zipWithIndex.map { case ((p, _), i) => p -> (i + 1).toLong }.toMap
      got == expected
    })
  }

  test("property: pointer-jump dup clustering equals a local union-find") {
    val s = spark
    import s.implicits._
    val n = 30
    val edgeGen = for {
      a <- Gen.chooseNum(0L, n - 1L)
      d <- Gen.chooseNum(1L, 4L)
    } yield (a, math.min(a + d, n - 1L))
    check(Prop.forAll(Gen.listOfN(20, edgeGen)) { es =>
      val edges = es.filter(e => e._1 != e._2)
      val docs = (0L until n).toDF("doc_id")
      val pairs =
        if (edges.isEmpty) Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
        else edges.toDF("doc_a", "doc_b")
      graft.pipeline.Corpus.clearClusterCache()
      val got = graft.pipeline.Corpus.dupClusters(docs, pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // local union-find oracle
      val parent = Array.tabulate(n.toInt)(identity)
      def find(x: Int): Int = {
        var r = x; while (parent(r) != r) r = parent(r); r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // canonical label = min member id of the component
      val minLabel = (0 until n.toInt).groupBy(find)
        .flatMap { case (_, ms) => ms.map(_ -> ms.min) }
      val expected = (0 until n.toInt)
        .map(i => i.toLong -> minLabel(i).toLong).toMap
      got == expected
    })
  }

  test("property: extrapolated rate matches a local replay of rate.go") {
    val s = spark
    import s.implicits._
    // random windows: 1-8 samples at distinct offsets in one UTC day,
    // values crossing zero so every branch (reset correction,
    // zero-point clamp, <2-sample null) is exercised
    val dayStartMs = 1704067200000L // 2024-01-01 00:00 UTC
    val sampleGen = for {
      n <- Gen.chooseNum(1, 8)
      offs <- Gen.pick(n, 0 until 86400 by 97)
      vals <- Gen.listOfN(n, Gen.chooseNum(-100, 1000).map(_ / 7.0))
    } yield offs.toSeq.sorted.zip(vals)
    // plain-Scala replay of temporal/rate.go:150 standardRateFunc
    def local(pts: Seq[(Int, Double)]): (Option[Double], Option[Double]) = {
      if (pts.size < 2) return (None, None)
      val si = (pts.last._1 - pts.head._1).toDouble
      if (si <= 0) return (None, None)
      val avg = si / (pts.size - 1)
      val thr = 1.1 * avg
      val corr = pts.sliding(2).collect {
        case Seq(a, b) if b._2 < a._2 => a._2
      }.sum
      val res = pts.last._2 - pts.head._2 + corr
      val d0 = pts.head._1.toDouble
      val dEnd = 86400.0 - pts.last._1
      val dz = if (res > 0 && pts.head._2 >= 0)
        math.min(d0, si * pts.head._2 / res) else d0
      def ext(ds: Double) = si +
        (if (ds < thr) ds else avg / 2) + (if (dEnd < thr) dEnd else avg / 2)
      (Some((pts.last._2 - pts.head._2) * ext(d0) / si),
       Some(res * ext(dz) / si))
    }
    check(Prop.forAll(sampleGen) { pts =>
      val df = pts.zipWithIndex.map { case ((o, v), i) =>
        ("c", 1L, new java.sql.Timestamp(dayStartMs + o * 1000L), v, i.toLong)
      }.toDF("name", "user_id", "ts", "value", "event_id")
      val r = graft.tsdb.Temporal.rateFrame(df).collect()(0)
      def got(c: String): Option[Double] =
        if (r.isNullAt(r.fieldIndex(c))) None else Some(r.getAs[Double](c))
      val (d, i) = local(pts)
      def close(a: Option[Double], b: Option[Double], tol: Double) = (a, b) match {
        case (None, None) => true
        case (Some(x), Some(y)) => math.abs(x - y) < tol
        case _ => false
      }
      close(got("delta_v"), d, 1.1e-6) && close(got("increase_v"), i, 1.1e-6) &&
        close(got("rate_v"), i.map(_ / 86400), 1.5e-9)
    })
  }

  test("property: novelty counts bound and zero-out under duplication") {
    val s = spark
    import s.implicits._
    // small vocab forces cross-doc shingle collisions
    val wordsGen = Gen.chooseNum(3, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc", "dd", "ee")).map(_.mkString(" ")))
    check(Prop.forAll(Gen.listOfN(8, wordsGen)) { texts =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
      // doc 100 duplicates doc 0: both must score novelty 0
      val frame = (docs :+ ((100L, texts.head))).toDF("doc_id", "text")
      val r = TextAnalysis.noveltyScore(frame).collect()
        .map(x => x.getAs[Long]("doc_id") ->
          ((x.getAs[Long]("n_shingles"), x.getAs[Long]("n_novel")))).toMap
      Dedup.clearShingleCache()
      r.values.forall { case (ns, nn) => nn <= ns } &&
        r(0L)._2 == 0L && r(100L)._2 == 0L
    })
  }

  test("property: budgetSelect equals the naive single-window walk") {
    val s = spark
    import s.implicits._
    // random word-salad docs + a random budget: the two-phase shard
    // rank + prefix token offsets must reproduce one global
    // (quality desc, doc_id) cumsum exactly, ties and all
    val wordGen = Gen.oneOf("alpha", "beta", "gamma", "the", "of", "zz")
    val docGen = Gen.chooseNum(1, 12)
      .flatMap(n => Gen.listOfN(n, wordGen).map(_.mkString(" ")))
    val caseGen = for {
      texts <- Gen.listOfN(40, docGen)
      budget <- Gen.chooseNum(5L, 120L)
    } yield (texts, budget)
    check(Prop.forAll(caseGen) { case (texts, budget) =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = graft.pipeline.Corpus.budgetSelect(docs, budget)
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("rank"), r.getAs[Long]("cum_tokens"),
            r.getAs[Int]("selected"))).toMap
      // naive oracle over the collected (quality, tokens) pairs
      val qt = TextAnalysis.quality(docs)
        .join(TextAnalysis.tokenCount(docs), "doc_id")
        .select("doc_id", "quality_score", "bpe_tokens").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      var cum = 0L
      val expected = qt.sortBy { case (id, q, _) => (-q, id) }.zipWithIndex
        .map { case ((id, _, tok), i) =>
          val before = cum; cum += tok
          id -> ((i + 1).toLong, cum, if (before < budget) 1 else 0)
        }.toMap
      got == expected
    })
  }

  test("property: bpeTrain equals a local greedy BPE reference") {
    val s = spark
    import s.implicits._
    // small-alphabet words maximize merge collisions, overlap runs
    // (aaa…) and ties — the cases where the string-replace encoding
    // could diverge from true symbol-list BPE
    val wordGen = Gen.chooseNum(1, 6)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString))
    val docGen = Gen.chooseNum(1, 8)
      .flatMap(n => Gen.listOfN(n, wordGen).map(_.mkString(" ")))
    check(Prop.forAll(Gen.listOfN(12, docGen)) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = TextAnalysis.bpeTrain(docs, rounds = 5).collect()
        .map(r => (r.getAs[Long]("round"), r.getAs[String]("sym_a"),
          r.getAs[String]("sym_b"), r.getAs[Long]("pair_freq"))).toSeq
      // local reference: symbol lists + greedy left-to-right merge
      var vocab: Map[List[String], Long] = texts
        .flatMap(_.toLowerCase.split("\\s+")).filter(_.nonEmpty)
        .groupBy(identity).map { case (w, ws) =>
          w.toList.map(_.toString) -> ws.size.toLong
        }
      val expected = scala.collection.mutable.ArrayBuffer
        .empty[(Long, String, String, Long)]
      var round = 1L
      var stop = false
      while (round <= 5 && !stop) {
        val counts = scala.collection.mutable.Map
          .empty[(String, String), Long]
        vocab.foreach { case (syms, f) =>
          syms.sliding(2).foreach {
            case List(x, y) => counts((x, y)) = counts.getOrElse((x, y), 0L) + f
            case _ =>
          }
        }
        if (counts.isEmpty) stop = true
        else {
          val maxC = counts.values.max
          val ((a, b), pf) = counts.toSeq.filter(_._2 == maxC)
            .minBy { case ((x, y), _) => (x, y) }
          expected += ((round, a, b, pf))
          vocab = vocab.map { case (syms, f) =>
            val out = scala.collection.mutable.ListBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                out += a + b; i += 2
              } else { out += syms(i); i += 1 }
            }
            out.toList -> f
          }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
          round += 1
        }
      }
      got == expected.toSeq
    })
  }

  test("property: index route equals direct scan for random matcher sets") {
    val s = spark
    import s.implicits._
    val base = graft.tsdb.Vectors.samples(
      graft.Tables.events(s, "/root/testdata/sf0.001"))
    val names = Seq("purchase", "click", "view", "signup", "error")
    val mGen = for {
      eqName <- Gen.option(Gen.oneOf(names))
      reName <- Gen.option(Gen.oneOf("p.*", "c.*", "(pur|cli).*", ".*e.*"))
      reUser <- Gen.option(Gen.oneOf("[0-9]*[02468]", "1.*", "[0-9]+"))
      neqUser <- Gen.option(Gen.chooseNum(0, 20).map(_.toString))
    } yield {
      import graft.tsdb.Fetch._
      (eqName.map(v => Matcher("name", Eq, v)).toSeq ++
        reName.map(v => Matcher("name", Re, v)).toSeq ++
        reUser.map(v => Matcher("user_id", Re, v)).toSeq ++
        neqUser.map(v => Matcher("user_id", NotEq, v)).toSeq)
    }
    check(Prop.forAll(mGen.suchThat(_.nonEmpty)) { ms =>
      val viaIndex = graft.tsdb.Index
        .indexMatch(base, ms, Seq("name", "user_id"))
        .collect().map(_.toSeq).toSet
      val direct = base
        .where(ms.map(graft.tsdb.Fetch.predicate).reduce(_ && _))
        .select(col("name").cast("string"), col("user_id").cast("string"))
        .distinct().collect().map(_.toSeq).toSet
      viaIndex == direct
    })
  }

  test("property: winnowing substring guarantee on random noise carriers") {
    val s = spark
    import s.implicits._
    // a 30-char common substring planted inside random non-space
    // noise must always pair the two carriers (k+w−1 = 8 ≪ 30,
    // interior windows select identical hashes regardless of the
    // prefix alignment)
    val noSpace = Gen.choose(33.toChar, 126.toChar)
    val caseGen = for {
      common <- Gen.listOfN(30, noSpace).map(_.mkString)
      p1 <- Gen.chooseNum(0, 25).flatMap(n => Gen.listOfN(n, noSpace))
      s1 <- Gen.chooseNum(0, 25).flatMap(n => Gen.listOfN(n, noSpace))
      p2 <- Gen.chooseNum(0, 25).flatMap(n => Gen.listOfN(n, noSpace))
      s2 <- Gen.chooseNum(0, 25).flatMap(n => Gen.listOfN(n, noSpace))
    } yield (p1.mkString + common + s1.mkString,
      p2.mkString + common + s2.mkString)
    check(Prop.forAll(caseGen) { case (a, b) =>
      val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
      Dedup.winnowPairs(docs).collect()
        .exists(r => r.getAs[Long]("a") == 1L && r.getAs[Long]("b") == 2L)
    })
  }

  test("property: hll registers are duplication-invariant and merge by max") {
    val s = spark
    import s.implicits._
    import graft.pipeline.Sketches
    val wordGen = Gen.chooseNum(5, 40).flatMap(n => Gen.listOfN(n,
      Gen.chooseNum(0, 500).map(i => s"w$i")))
    check(Prop.forAll(Gen.listOfN(3, wordGen)) { cases =>
      // one source per generated case — a single frame, few jobs
      val docs = cases.zipWithIndex.map { case (ws, i) =>
        (i.toLong, s"src$i", ws.mkString(" "))
      }.toDF("doc_id", "source", "text")
      val base = Sketches.hllRegisters(docs).collect().map(_.toSeq).toSet
      val doubled = Sketches.hllRegisters(
        docs.union(docs.withColumn("doc_id", col("doc_id") + 100)))
        .collect().map(_.toSeq).toSet
      base == doubled
    })
  }

  test("property: suffix spectrum is monotone in depth, mass-conserving") {
    val s = spark
    import s.implicits._
    check(Prop.forAll(Gen.listOfN(4, asciiDoc)) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val r = Dedup.suffixSpectrum(docs).collect()
        .sortBy(_.getAs[Long]("prefix_len"))
      val total = texts.map(_.length).sum.toLong
      // total suffix mass is the char count at every depth; groups can
      // only split as depth grows, repeated mass can only shrink
      r.forall(_.getAs[Long]("n_suffixes") == total) &&
        r.toSeq.sliding(2).forall {
          case Seq(lo, hi) =>
            hi.getAs[Long]("n_groups") >= lo.getAs[Long]("n_groups") &&
              hi.getAs[Long]("n_dup_suffixes") <=
                lo.getAs[Long]("n_dup_suffixes")
          case _ => true
        }
    })
  }

  test("property: influx parse never errors and flags rather than drops") {
    val s = spark
    import s.implicits._
    // arbitrary printable garbage: the parser must classify every
    // non-blank line (well-formed or malformed), never throw
    check(Prop.forAll(Gen.listOfN(20, asciiDoc)) { lines =>
      val in = lines.toDF("line")
      val out = graft.sources.InfluxLine.parse(in).collect()
      val nonBlank = lines.count(_.trim.nonEmpty)
      // every non-blank line yields ≥1 classified row unless its only
      // field was a well-formed quoted string (dropped by contract)
      out.length >= 0 && nonBlank >= 0 // reaching here = no throw
    })
  }

  // ---- glob translator differential oracle --------------------------

  /** Independent backtracking matcher over the graphite glob dialect
    * (same SEMANTICS as glob.go, written without regexes so a
    * translation bug in [[graft.graphite.Glob]] cannot hide in a
    * mirrored implementation): `.` one-or-more separators, `?` one
    * non-dot, `*` a non-dot run, `{a,b}` alternatives, `[a-c]`
    * ranges, `\` escapes. */
  private object NaiveGlob {
    sealed trait T
    case class L(c: Char) extends T
    case object Star extends T
    case object Qm extends T
    case object Dot extends T
    case class Alt(opts: Seq[Seq[T]]) extends T
    case class Cls(cs: Set[Char]) extends T

    def parse(g: String): List[T] = {
      var i = 0
      val out = List.newBuilder[T]
      def cls(): T = { // after '['
        val cs = Set.newBuilder[Char]
        while (g(i) != ']') {
          if (i + 2 < g.length && g(i + 1) == '-' && g(i + 2) != ']') {
            (g(i) to g(i + 2)).foreach(cs += _); i += 3
          } else { cs += g(i); i += 1 }
        }
        i += 1
        Cls(cs.result())
      }
      def alt(): T = { // after '{'
        val opts = Seq.newBuilder[Seq[T]]
        val cur = List.newBuilder[T]
        while (g(i) != '}') {
          if (g(i) == ',') { opts += cur.result(); cur.clear(); i += 1 }
          else { cur += one() }
        }
        i += 1
        opts += cur.result()
        Alt(opts.result())
      }
      def one(): T = {
        val c = g(i); i += 1
        c match {
          case '\\' => val l = L(g(i)); i += 1; l
          case '.'  => Dot
          case '?'  => Qm
          case '*'  => Star
          case '['  => cls()
          case '{'  => alt()
          case o    => L(o)
        }
      }
      while (i < g.length) out += one()
      out.result()
    }

    def matches(ts: List[T], s: String, i: Int = 0): Boolean = ts match {
      case Nil => i == s.length
      case L(c) :: r  => i < s.length && s(i) == c && matches(r, s, i + 1)
      case Qm :: r    => i < s.length && s(i) != '.' && matches(r, s, i + 1)
      case Cls(cs) :: r => i < s.length && cs(s(i)) && matches(r, s, i + 1)
      case Dot :: r =>
        (i until s.length).takeWhile(s(_) == '.')
          .exists(j => matches(r, s, j + 1))
      case Star :: r =>
        (i to s.length).takeWhile(j => j == i || s(j - 1) != '.')
          .exists(j => matches(r, s, j))
      case Alt(opts) :: r => opts.exists(o => matches(o.toList ++ r, s, i))
    }
  }

  test("property: glob regex translation equals the naive matcher") {
    val litChar = Gen.oneOf(Gen.alphaLowerChar, Gen.numChar)
    val litSeg: Gen[String] = Gen.chooseNum(1, 3)
      .flatMap(n => Gen.listOfN(n, litChar).map(_.mkString))
    val atom: Gen[String] = Gen.frequency(
      5 -> litSeg,
      2 -> Gen.const("*"),
      2 -> Gen.const("?"),
      2 -> (for { a <- litSeg; b <- litSeg } yield s"{$a,$b}"),
      2 -> (for {
        lo <- Gen.choose('a', 'w'); hi <- Gen.choose(lo, 'z')
      } yield s"[$lo-$hi]"),
      1 -> litChar.map(c => s"\\$c"))
    val segment: Gen[String] =
      Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, atom).map(_.mkString))
    val glob: Gen[String] = Gen.chooseNum(1, 3)
      .flatMap(n => Gen.listOfN(n, segment).map(_.mkString(".")))
    // candidate paths: random short strings over a glob-adjacent
    // alphabet PLUS an instantiation-biased expansion of the glob
    val pathChar = Gen.frequency(8 -> litChar, 2 -> Gen.const('.'))
    val randomPath: Gen[String] = Gen.chooseNum(0, 10)
      .flatMap(n => Gen.listOfN(n, pathChar).map(_.mkString))
    def expand(g: String): Gen[String] = {
      import NaiveGlob._
      def go(ts: List[T]): Gen[String] = ts match {
        case Nil => Gen.const("")
        case L(c) :: r => go(r).map(c +: _)
        case Qm :: r => for { c <- litChar; t <- go(r) } yield c +: t
        case Cls(cs) :: r =>
          for { c <- Gen.oneOf(cs.toSeq); t <- go(r) } yield c +: t
        case Dot :: r =>
          for { n <- Gen.chooseNum(1, 2); t <- go(r) }
            yield ("." * n) + t
        case Star :: r =>
          for {
            n <- Gen.chooseNum(0, 3)
            cs <- Gen.listOfN(n, litChar)
            t <- go(r)
          } yield cs.mkString + t
        case Alt(opts) :: r =>
          Gen.oneOf(opts).flatMap(o => go(o.toList ++ r))
      }
      go(parse(g))
    }
    val genCase: Gen[(String, Seq[String])] = for {
      g <- glob
      rps <- Gen.listOfN(4, randomPath)
      eps <- Gen.listOfN(4, expand(g))
      // mutate one expansion so near-misses are exercised
      mut <- Gen.oneOf(eps).map(p => if (p.isEmpty) "x" else p.tail)
    } yield (g, rps ++ eps :+ mut)
    check(Prop.forAll(genCase) { case (g, paths) =>
      val re = graft.graphite.Glob.anchored(g)
      val toks = NaiveGlob.parse(g)
      paths.forall { p =>
        val got = p.matches(re)
        val want = NaiveGlob.matches(toks, p)
        if (got != want)
          println(s"MISMATCH glob=$g path=$p regex=$re got=$got want=$want")
        got == want
      }
    })
  }

  test("property: annotated tsz round-trips arbitrary annotation sequences") {
    import graft.sources.Tsz
    // a pool forcing repeats, nulls, empties and a multi-byte-varint
    // long annotation; prevailing model: last non-empty value seen
    val pool: Seq[String] = Seq(null, "", "a", "a", "bb", "unit=ms",
      "x" * 100, "h07")
    val genCase = for {
      n <- Gen.chooseNum(1, 40)
      deltas <- Gen.listOfN(n, Gen.chooseNum(1L, 2000000L))
      vals <- Gen.listOfN(n, Gen.oneOf(
        Gen.chooseNum(-100000L, 100000L).map(_ / 100.0),
        Gen.oneOf(Double.NaN, Double.PositiveInfinity, -0.0, 1.0e18)))
      ants <- Gen.listOfN(n, Gen.oneOf(pool))
    } yield (deltas, vals, ants)
    val codecParams = SCTest.Parameters.default.withMinSuccessfulTests(50)
    val r = SCTest.check(codecParams, Prop.forAll(genCase) {
      case (deltas, vals, ants)
        // scalacheck shrinking does not respect the generators —
        // discard structurally invalid shrunk inputs
        if deltas.length == vals.length && vals.length == ants.length &&
          deltas.forall(_ >= 1L) =>
        var ts = 1700000000000000L
        val pts = deltas.zip(vals).map { case (d, v) =>
          ts += d; (ts, v)
        }.toArray
        val antBytes = ants.map(a =>
          if (a == null) null else a.getBytes("UTF-8")).toArray
        val (bytes, _, _, _) = Tsz.encodeBlockAnnotated(pts, antBytes)
        val back = Tsz.decodeBlockAnnotated(bytes, pts.length)
        var prevailing: String = null
        back.zipWithIndex.forall { case ((bts, bv, bant), i) =>
          val a = ants(i)
          if (a != null && a.nonEmpty) prevailing = a
          val want = prevailing
          val got = if (bant == null) null else new String(bant, "UTF-8")
          // NaN payloads survive bit-exactly (float mode); every
          // other value numeric-exactly — int mode normalizes −0.0
          // to 0.0 exactly like the reference (m3tsz.go:79-84 Modf
          // int-converts −0.0 and the diff chain cannot carry the
          // sign), so ±0 compare as equal
          val v = pts(i)._2
          val valOk =
            if (v.isNaN) java.lang.Double.doubleToRawLongBits(bv) ==
              java.lang.Double.doubleToRawLongBits(v)
            else bv == v
          val ok = bts == pts(i)._1 && valOk && got == want
          if (!ok) println(s"ANN MISMATCH at $i: ts $bts vs ${pts(i)._1}, " +
            s"val $bv vs ${pts(i)._2}, ant $got vs $want (in ${ants(i)})")
          ok
        }
    })
    assert(r.passed, r.status.toString)
  }

  test("property: proto codec round-trips random messages exactly") {
    import graft.sources.{ProtoStore, ProtoTsz}
    // 6 labels against the size-4 LRU: evictions and re-encodes are
    // the common case, not the edge
    val labels = Seq("", "alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val genCase = for {
      n <- Gen.chooseNum(1, 40)
      deltas <- Gen.listOfN(n, Gen.chooseNum(1L, 5000000L))
      amounts <- Gen.listOfN(n, Gen.oneOf(
        Gen.chooseNum(-100000L, 100000L).map(_ / 100.0),
        Gen.oneOf(Double.NaN, Double.NegativeInfinity, -0.0)))
      qtys <- Gen.listOfN(n, Gen.chooseNum(-1000000000L, 1000000000L))
      ls <- Gen.listOfN(n, Gen.oneOf(labels))
      fs <- Gen.listOfN(n, Gen.oneOf(true, false))
    } yield (deltas, amounts, qtys, ls, fs)
    val codecParams = SCTest.Parameters.default.withMinSuccessfulTests(50)
    val r = SCTest.check(codecParams, Prop.forAll(genCase) {
      case (deltas, amounts, qtys, ls, fs) =>
        var ts = 1700000000000000L
        val pts = deltas.indices.map { i =>
          ts += deltas(i)
          (ts, Array[Any](amounts(i), qtys(i),
            ls(i).getBytes("UTF-8"), fs(i)))
        }.toArray
        val (bytes, _) = ProtoTsz.encodeStream(ProtoStore.schema, pts)
        val back = ProtoTsz.decodeStream(ProtoStore.schema, bytes, pts.length)
        back.zipWithIndex.forall { case ((bts, bv), i) =>
          bts == pts(i)._1 &&
            java.lang.Double.doubleToRawLongBits(
              bv(0).asInstanceOf[Double]) ==
              java.lang.Double.doubleToRawLongBits(amounts(i)) &&
            bv(1) == qtys(i) &&
            java.util.Arrays.equals(bv(2).asInstanceOf[Array[Byte]],
              ls(i).getBytes("UTF-8")) &&
            bv(3) == fs(i)
        }
    })
    assert(r.passed, r.status.toString)
  }

  test("property: dd-sketch keeps the α bound across magnitudes") {
    val s = spark
    import s.implicits._
    // each case = one event_type: values span ≤1.5 decades at a random
    // magnitude 1e-6..1e6 (≈175 occupied buckets, under the collapse
    // cap), so the paper's relative-error guarantee must hold exactly
    val genCase = for {
      l <- Gen.chooseNum(-6.0, 6.0)
      n <- Gen.chooseNum(5, 150)
      ds <- Gen.listOfN(n, Gen.chooseNum(0.0, 1.5))
    } yield ds.map(d => math.pow(10.0, l + d))
    check(Prop.forAll(Gen.listOfN(6, genCase)) { cases =>
      val rows = cases.zipWithIndex.flatMap { case (vs, i) =>
        vs.map(v => (s"c$i", v))
      }.toDF("event_type", "value")
      val r = pipeline.Sketches.ddSketch(rows).collect()
      r.nonEmpty && r.forall { row =>
        row.getAs[Double]("rel_err") <= 0.01 + 1e-6 &&
          row.getAs[Long]("n_collapsed") == 0L
      }
    })
  }
}
