package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.promql.PromQL
import graft.graphite.GraphiteParser
import graft.m3ql.M3QL

/** Grammar fuzz over the three query front doors (PromQL, Graphite
  * targets, M3QL pipelines). Two invariants per language:
  *
  *  1. GENERATED-VALID: every expression produced by a depth-bounded
  *     generator of the documented grammar parses (and, for the
  *     fused M3QL parser, builds its lazy plan) without error.
  *  2. MUTATION-TOTAL: a character-level mutation of a valid
  *     expression either still parses or fails with the parser's own
  *     `ParseException` — never a raw `MatchError`, `NoSuchElement`,
  *     `NumberFormat`, index-out-of-bounds or NPE. The front door's
  *     error contract is "controlled rejection with a message", the
  *     same guarantee the reference's PEG parsers give
  *     (src/query/parser/promql/parse.go returns typed errors for
  *     every malformed input rather than panicking).
  *
  * Pure-JVM for PromQL/Graphite (parse only); M3QL's parse is fused
  * with lazy plan construction, so its properties run against the
  * tiny sf0.001 events frame with no Spark actions.
  */
class FuzzSpec extends SparkSpec {

  private def check(p: Prop, n: Int): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(r.passed, r.status.toString)
  }

  // ---------------- shared generators ----------------

  private val ident: Gen[String] = for {
    c <- Gen.alphaChar
    n <- Gen.chooseNum(0, 5)
    cs <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaNumChar, 1 -> Gen.const('_')))
  } yield (c :: cs).mkString

  private val dur: Gen[String] = for {
    n <- Gen.chooseNum(1, 96)
    u <- Gen.oneOf("s", "m", "h", "d")
  } yield s"$n$u"

  /** Apply `k` random single-character edits (delete / insert / dup /
    * truncate) drawn from a language-specific alphabet. */
  private def mutate(s: String, alphabet: String): Gen[String] = {
    val edit: Gen[String => String] = Gen.oneOf(
      // delete one char
      Gen.chooseNum(0, math.max(0, s.length - 1)).map(i => (x: String) =>
        if (x.isEmpty) x else x.patch(i min (x.length - 1), "", 1)),
      // insert one alphabet char
      for {
        i <- Gen.chooseNum(0, s.length)
        c <- Gen.oneOf(alphabet.toSeq)
      } yield (x: String) => x.patch(i min x.length, c.toString, 0),
      // duplicate one char
      Gen.chooseNum(0, math.max(0, s.length - 1)).map(i => (x: String) =>
        if (x.isEmpty) x
        else { val j = i min (x.length - 1); x.patch(j, x(j).toString, 0) }),
      // truncate at a random point
      Gen.chooseNum(0, s.length).map(i => (x: String) =>
        x.take(i min x.length)))
    for {
      k <- Gen.chooseNum(1, 3)
      es <- Gen.listOfN(k, edit)
    } yield es.foldLeft(s)((acc, e) => e(acc))
  }

  /** The mutation-total contract: parse the mutant, allow success or
    * the given controlled-rejection class, surface anything else. */
  private def total(run: () => Any, ok: Class[_ <: Throwable],
                    q: String): Prop =
    try { run(); Prop.passed } catch {
      case e: Throwable if ok.isInstance(e) => Prop.passed
      case e: Throwable => Prop.falsified :| {
        s"uncontrolled ${e.getClass.getSimpleName}: ${e.getMessage} on <$q>"
      }
    }

  // ---------------- PromQL ----------------

  /** `real=true` confines label references to the sample frame's
    * actual tag columns (name/user_id) so a generated expression not
    * only parses but also BUILDS its plan — evaluation resolves
    * matcher/by labels against the schema. Parse-only tests use
    * arbitrary idents for broader lexer coverage. */
  private def pqlMatcher(real: Boolean): Gen[String] =
    if (real) for {
      op <- Gen.oneOf("=", "!=", "=~", "!~")
      v <- Gen.oneOf(ident, Gen.const("a.*"), Gen.const("purchase"))
    } yield s"""name$op"$v""""
    else for {
      k <- ident
      op <- Gen.oneOf("=", "!=", "=~", "!~")
      v <- Gen.oneOf(ident, Gen.const("a.*"), Gen.const(""))
    } yield s"""$k$op"$v""""

  /** Plain instant-vector selector, optionally with offset / @. */
  private def pqlSelector(real: Boolean): Gen[String] = for {
    m <- if (real)
      // bias toward the testdata's live series so evaluated fuzz
      // cases exercise non-empty frames, with a miss now and then
      Gen.frequency(5 -> Gen.oneOf("click", "purchase", "error",
        "signup", "view"), 1 -> ident)
    else ident
    nm <- Gen.chooseNum(0, if (real) 1 else 2)
    ms <- Gen.listOfN(nm, pqlMatcher(real))
    off <- Gen.frequency(
      4 -> Gen.const(""),
      1 -> dur.map(d => s" offset $d"),
      1 -> Gen.oneOf(" @ start()", " @ end()", " @ 1704855600"))
  } yield m + (if (ms.nonEmpty) ms.mkString("{", ",", "}") else "") + off

  private val pqlTemporal = Gen.oneOf(
    "rate", "increase", "delta", "irate", "idelta", "resets", "changes",
    "deriv", "sum_over_time", "avg_over_time", "min_over_time",
    "max_over_time", "count_over_time", "last_over_time",
    "stddev_over_time", "stdvar_over_time", "present_over_time",
    "absent_over_time")
  private val pqlSlidingCapable = Gen.oneOf(
    "rate", "increase", "delta", "sum_over_time", "avg_over_time",
    "min_over_time", "max_over_time", "count_over_time")
  private val pqlTransform = Gen.oneOf(
    "abs", "ceil", "floor", "exp", "sqrt", "sgn", "sort", "sort_desc",
    "sin", "cos", "atan", "absent")
  private val pqlAgg = Gen.oneOf(
    "sum", "avg", "min", "max", "count", "stddev", "stdvar", "group")

  /** Vector-typed expressions only: scalar leaves (numbers, time())
    * are legal solely as binop operands — `sqrt(1)` is a type error
    * upstream and here, so the generator never feeds a scalar where
    * a function or aggregation expects an instant vector.
    *
    * `real` → schema-resolvable labels (see [[pqlMatcher]]);
    * `ranked` → include the per-instant ranking forms (topk/bottomk,
    * sort) whose tie-breaking is legitimate to exclude from exact
    * cross-run differentials. */
  private def pqlExpr(depth: Int, real: Boolean = false,
                      ranked: Boolean = true): Gen[String] =
    if (depth <= 0) pqlSelector(real)
    else Gen.frequency(
      // temporal fn over a range selector. Batch mode evaluates
      // non-sliding-capable temporal fns on calendar windows only
      // (1m/1h/1d/1w tumbling buckets); sliding-capable fns take any
      // duration — mirror that contract in the generator.
      3 -> (for {
        fn <- pqlTemporal
        s <- pqlSelector(real)
        slidingOk = Set("rate", "increase", "delta", "sum_over_time",
          "avg_over_time", "min_over_time", "max_over_time",
          "count_over_time")(fn)
        d <- if (slidingOk) dur else Gen.oneOf("1m", "1h", "1d", "1w")
        // offset/@ already live on the selector; range goes before them
        base = s.takeWhile(c => c != ' ')
        tail0 = s.dropWhile(c => c != ' ')
        // @ on a SLIDING window (non-calendar duration) is a batch-
        // mode rejection by design — range mode pins against the
        // explicit grid instead; keep offset, drop @ there
        calendar = Set("1m", "1h", "1d", "1w")(d)
        tail = if (calendar || !tail0.contains("@")) tail0 else ""
      } yield s"$fn($base[$d]$tail)"),
      // transform over a sub-expression
      2 -> (for {
        fn <- if (ranked) pqlTransform
              else Gen.oneOf("abs", "ceil", "floor", "exp", "sqrt",
                "sgn", "sin", "cos", "atan", "absent")
        a <- pqlExpr(depth - 1, real, ranked)
      } yield s"$fn($a)"),
      // aggregation, with optional by/without
      2 -> (for {
        op <- pqlAgg; a <- pqlExpr(depth - 1, real, ranked)
        lbl <- if (real) Gen.oneOf("name", "user_id") else ident
        by <- Gen.oneOf("", s" by ($lbl)", s" without ($lbl)")
      } yield s"$op$by($a)"),
      // parameterized aggs
      (if (ranked) 1 else 0) -> (for {
        a <- pqlExpr(depth - 1, real, ranked)
        k <- Gen.chooseNum(1, 9)
        form <- Gen.oneOf(s"topk($k, $a)", s"bottomk($k, $a)",
          s"quantile(0.9, $a)")
      } yield form),
      // scalar binop on either side
      2 -> (for {
        a <- pqlExpr(depth - 1, real, ranked)
        op <- Gen.oneOf("+", "-", "*", "/", "^")
        n <- Gen.chooseNum(1, 99)
        flip <- Gen.oneOf(true, false)
      } yield if (flip) s"$a $op $n" else s"$n $op $a"),
      // vector-vector set/arith op between two sub-expressions
      1 -> (for {
        a <- pqlExpr(depth - 1, real, ranked)
        b <- pqlExpr(depth - 1, real, ranked)
        op <- Gen.oneOf("+", "and", "or", "unless")
      } yield s"($a) $op ($b)"),
      // subquery: outer *_over_time over sliding-capable inner
      1 -> (for {
        outer <- Gen.oneOf("sum_over_time", "avg_over_time",
          "max_over_time", "quantile_over_time")
        inner <- pqlSlidingCapable
        m <- ident; d <- dur
        steps <- Gen.chooseNum(2, 8)
        q = if (outer == "quantile_over_time") "0.5, " else ""
      } yield s"$outer($q$inner($m[$d])[${steps * 6}h:6h])"),
      // the parameterized/selector-consuming tail: histogram_quantile
      // and timestamp (plain-selector args), label_replace/label_join
      // (string params), clamp/round, comparison binops with and
      // without bool, count_values
      1 -> (for {
        a <- pqlExpr(depth - 1, real, ranked)
        sel <- pqlSelector(real)
        n <- Gen.chooseNum(1, 99)
        cmp <- Gen.oneOf("==", "!=", "<", "<=", ">", ">=")
        form <- Gen.oneOf(
          s"histogram_quantile(0.9, ${sel.takeWhile(_ != ' ')})",
          s"timestamp(${sel.takeWhile(_ != ' ')})",
          s"""label_replace($a, "dst", "$$1", "name", "(.*)")""",
          s"""label_join($a, "dst", "-", "name")""",
          s"clamp($a, 1, 9$n)", s"round($a)", s"round($a, 10)",
          s"$a $cmp $n", s"$a $cmp bool $n",
          s"""count_values("v", $a)""")
      } yield form))

  test("fuzz: generated PromQL expressions parse") {
    check(Prop.forAllNoShrink(Gen.chooseNum(0, 3).flatMap(d => pqlExpr(d))) { q =>
      try { PromQL.parse(q); Prop.passed } catch {
        case e: Throwable => Prop.falsified :| s"$q -> ${e.getMessage}"
      }
    }, 300)
  }

  test("fuzz: mutated PromQL rejects only with ParseException") {
    val alphabet = """()[]{}:,@^*/+-=~!"_ .0123456789aZsmhd"""
    val gen = for {
      q <- Gen.chooseNum(0, 3).flatMap(d => pqlExpr(d))
      m <- mutate(q, alphabet)
    } yield m
    check(Prop.forAllNoShrink(gen) { q =>
      total(() => PromQL.parse(q), classOf[PromQL.ParseException], q)
    }, 500)
  }

  test("fuzz: generated expressions build at the batch door") {
    // parse-valid must imply build-valid when labels resolve: the
    // batch evaluator may not reject (or crash on) any expression
    // the grammar accepts over the frame's real schema
    check(Prop.forAllNoShrink(
      Gen.chooseNum(0, 3).flatMap(d => pqlExpr(d, real = true))) { q =>
      try { PromQL.query(samples, q); Prop.passed }
      catch { case e: Throwable =>
        Prop.falsified :| s"$q -> ${e.getClass.getSimpleName}: ${e.getMessage}"
      }
    }, 150)
  }

  // ---------------- PromQL range-query door ----------------

  test("fuzz: generated expressions build at the range-query door") {
    // every batch-valid expression the generator emits must also be
    // accepted by rangeQuery — range mode is a window superset (any
    // duration, subqueries, @) and must not regress batch forms
    val (startS, endS, stepS) = (1704240000L, 1704412800L, 21600L)
    check(Prop.forAllNoShrink(
      Gen.chooseNum(0, 3).flatMap(d => pqlExpr(d, real = true))) { q =>
      try { PromQL.rangeQuery(samples, q, startS, endS, stepS); Prop.passed }
      catch { case e: Throwable =>
        Prop.falsified :| s"$q -> ${e.getClass.getSimpleName}: ${e.getMessage}"
      }
    }, 150)
  }

  test("fuzz: mutated range-mode inputs reject as parse/analysis errors") {
    val alphabet = """()[]{}:,@^*/+-=~!"_ .0123456789aZsmhd"""
    val (startS, endS, stepS) = (1704240000L, 1704412800L, 21600L)
    val gen = for {
      q <- Gen.chooseNum(0, 3).flatMap(d => pqlExpr(d, real = true))
      m <- mutate(q, alphabet)
    } yield m
    check(Prop.forAllNoShrink(gen) { q =>
      // the fused build path has two controlled-rejection classes:
      // the parser's own errors, and Catalyst analysis for mutants
      // that stay grammatical but name a label the frame lacks
      try { PromQL.rangeQuery(samples, q, startS, endS, stepS); Prop.passed }
      catch {
        case _: PromQL.ParseException => Prop.passed
        case _: org.apache.spark.sql.AnalysisException => Prop.passed
        case e: Throwable => Prop.falsified :| {
          s"uncontrolled ${e.getClass.getSimpleName}: ${e.getMessage} on <$q>"
        }
      }
    }, 300)
  }

  test("property: range-query values are step-invariant") {
    // A grid instant's value depends only on T, never on the grid it
    // sits in (Prometheus evaluates each step independently): the
    // 12h-step run must reproduce the 6h-step run exactly at every
    // shared instant, for ANY generated expression. Ranking forms
    // (topk/sort) are excluded — their per-instant tie-breaking is a
    // legitimate cross-run difference.
    val (startS, endS) = (1704240000L, 1704672000L)
    def rows(q: String, stepS: Long): Map[(Long, String), Double] =
      PromQL.rangeQuery(samples, q, startS, endS, stepS).collect().map { r =>
        val labels = r.schema.fieldNames.sorted
          .filterNot(f => f == "value" || f == "bucket_s")
          .map(f => f + "=" + String.valueOf(r.getAs[Any](f))).mkString(",")
        val v = r.getAs[Any]("value") match {
          case null => Double.NaN
          case d: java.lang.Double => d.doubleValue()
          case x => x.toString.toDouble
        }
        (r.getAs[Long]("bucket_s"), labels) -> v
      }.toMap
    def close(a: Double, b: Double): Boolean =
      (a.isNaN && b.isNaN) || a == b ||
        math.abs(a - b) <= 1e-9 * math.max(math.abs(a), math.abs(b))
    check(Prop.forAllNoShrink(
      Gen.chooseNum(1, 3).flatMap(d =>
        pqlExpr(d, real = true, ranked = false))) { q =>
      try {
        val fine = rows(q, 21600L)
        val coarse = rows(q, 43200L)
        val fineAtCoarse = fine.filter { case ((b, _), _) =>
          (b - startS) % 43200L == 0 }
        if (fineAtCoarse.keySet != coarse.keySet)
          Prop.falsified :| s"instant sets differ for <$q>: " +
            s"${fineAtCoarse.keySet.diff(coarse.keySet).take(2)} / " +
            s"${coarse.keySet.diff(fineAtCoarse.keySet).take(2)}"
        else coarse.find { case (k, v) => !close(v, fineAtCoarse(k)) } match {
          case Some((k, v)) =>
            Prop.falsified :| s"$k: coarse $v vs fine ${fineAtCoarse(k)} for <$q>"
          case None => Prop.passed
        }
      } catch { case e: Throwable =>
        Prop.falsified :| s"$q -> ${e.getClass.getSimpleName}: ${e.getMessage}"
      }
    }, 8)
  }

  // ---------------- Graphite targets ----------------

  private val gPathSeg: Gen[String] = Gen.frequency(
    5 -> ident,
    2 -> Gen.const("*"),
    1 -> (for { a <- ident; b <- ident } yield s"{$a,$b}"),
    1 -> ident.map(s => s"${s.take(2)}*"))

  private val gPath: Gen[String] = for {
    n <- Gen.chooseNum(1, 4)
    segs <- Gen.listOfN(n, gPathSeg)
  } yield segs.mkString(".")

  private def gTarget(depth: Int): Gen[String] =
    if (depth <= 0) gPath
    else Gen.frequency(
      2 -> gPath,
      2 -> (for {
        fn <- Gen.oneOf("sumSeries", "averageSeries", "maxSeries",
          "absolute", "derivative", "perSecond", "sortByMaxima")
        a <- gTarget(depth - 1)
      } yield s"$fn($a)"),
      1 -> (for {
        a <- gTarget(depth - 1)
        n <- Gen.chooseNum(1, 10)
        form <- Gen.oneOf(s"scale($a, $n.5)", s"offset($a, -$n)",
          s"highestMax($a, $n)", s"movingAverage($a, \"${n}min\")",
          s"alias($a, \"x$n\")", s"summarize($a, \"${n}h\", \"sum\")")
      } yield form),
      1 -> (for {
        a <- gTarget(depth - 1); b <- gTarget(depth - 1)
      } yield s"sumSeries($a, $b)"))

  test("fuzz: generated graphite targets parse") {
    check(Prop.forAllNoShrink(Gen.chooseNum(0, 3).flatMap(gTarget)) { t =>
      try { GraphiteParser.parse(t); Prop.passed } catch {
        case e: Throwable => Prop.falsified :| s"$t -> ${e.getMessage}"
      }
    }, 300)
  }

  test("fuzz: mutated graphite targets reject only with ParseException") {
    val alphabet = """(),.*{}"' -_0123456789aZ"""
    val gen = for {
      t <- Gen.chooseNum(0, 3).flatMap(gTarget)
      m <- mutate(t, alphabet)
    } yield m
    check(Prop.forAllNoShrink(gen) { t =>
      total(() => GraphiteParser.parse(t),
        classOf[GraphiteParser.ParseException], t)
    }, 500)
  }

  /** Render-target generator with REAL dot-paths so the evaluated
    * fuzz exercises the dispatch over non-empty frames. */
  private def gEvalTarget(depth: Int): Gen[String] = {
    val path = Gen.oneOf("events.purchase.*", "events.*.7",
      "events.{click,view}.*", "events.error.1?", "events.*.*")
    if (depth <= 0) path
    else Gen.frequency(
      2 -> path,
      2 -> (for {
        fn <- Gen.oneOf("sumSeries", "averageSeries", "maxSeries",
          "absolute", "derivative", "perSecond", "sortByMaxima")
        a <- gEvalTarget(depth - 1)
      } yield s"$fn($a)"),
      1 -> (for {
        a <- gEvalTarget(depth - 1)
        n <- Gen.chooseNum(1, 10)
        form <- Gen.oneOf(s"scale($a, $n.5)", s"offset($a, -$n)",
          s"highestMax($a, $n)", s"movingAverage($a, \"${n}min\")",
          s"alias($a, \"x$n\")", s"summarize($a, \"${n}h\", \"sum\")",
          s"keepLastValue($a)", s"nPercentile($a, 9$n)")
      } yield form),
      1 -> (for {
        a <- gEvalTarget(depth - 1); b <- gEvalTarget(depth - 1)
      } yield s"sumSeries($a, $b)"))
  }

  test("fuzz: generated graphite targets evaluate (lazy plan build)") {
    check(Prop.forAllNoShrink(
      Gen.chooseNum(0, 3).flatMap(gEvalTarget)) { t =>
      try { GraphiteParser.query(samples, t); Prop.passed } catch {
        case e: Throwable =>
          Prop.falsified :| s"$t -> ${e.getClass.getSimpleName}: ${e.getMessage}"
      }
    }, 120)
  }

  test("fuzz: mutated graphite targets reject as typed render errors") {
    // the render dispatch's controlled-rejection classes mirror the
    // reference's typed render-API errors: the parser's own
    // ParseException for malformed targets/args, GlobException for
    // invalid path patterns (the invalid-params response), and
    // Catalyst analysis for schema-level failures
    val alphabet = """(),.*{}"' -_0123456789aZ"""
    val gen = for {
      t <- Gen.chooseNum(0, 3).flatMap(gEvalTarget)
      m <- mutate(t, alphabet)
    } yield m
    check(Prop.forAllNoShrink(gen) { t =>
      try { GraphiteParser.query(samples, t); Prop.passed } catch {
        case _: GraphiteParser.ParseException => Prop.passed
        case _: graft.graphite.Glob.GlobException => Prop.passed
        case _: org.apache.spark.sql.AnalysisException => Prop.passed
        case e: Throwable => Prop.falsified :| {
          s"uncontrolled ${e.getClass.getSimpleName}: ${e.getMessage} on <$t>"
        }
      }
    }, 250)
  }

  // ---------------- M3QL pipelines ----------------

  // NOT cached: the suites share one SparkSession, and caching this
  // frame would make Catalyst substitute the InMemoryRelation into
  // every other suite's plans — PlanSpec's pushdown assertions then
  // see no parquet scan to push into
  private lazy val samples =
    tsdb.Vectors.samples(Tables.events(spark, sf))

  /** Stage list generator threading the schema: an aggregation keeps
    * only its BY labels, so later aggregations must draw from the
    * narrowed set (the frame after `sum` has no label columns left —
    * Catalyst would reject `sum | avg user_id`, and so would the
    * reference since the column is gone from the series tags). */
  private def mStages(avail: List[String], n: Int): Gen[List[String]] =
    if (n <= 0) Gen.const(Nil)
    else {
      val agg: Gen[(String, List[String])] = for {
        op <- Gen.oneOf("sum", "avg", "min", "max", "count")
        keep <- Gen.someOf(avail)
      } yield (op + keep.toList.sorted.map(" " + _).mkString,
        keep.toList.sorted)
      val pointwise: Gen[(String, List[String])] = Gen.oneOf(
        "abs", "ceil", "floor", "sqrt", "log10", "neg").map(f => (f, avail))
      val cmp: Gen[(String, List[String])] = for {
        op <- Gen.oneOf("<", "<=", ">", ">=", "==", "!=")
        v <- Gen.chooseNum(0, 500)
      } yield (s"$op $v", avail)
      val misc: Gen[(String, List[String])] = for {
        k <- Gen.chooseNum(1, 5)
        keep <- Gen.someOf(avail)
        form <- Gen.oneOf(
          (s"percentile 9$k" + keep.toList.sorted.map(" " + _).mkString,
            keep.toList.sorted),
          (s"top $k" + keep.toList.sorted.map(" " + _).mkString, avail),
          (s"scale $k.5", avail), (s"offset -$k", avail),
          (s"transformNull", avail), (s"clamp min:$k max:${k * 100}", avail),
          (s"timeshift ${k * 3600}", avail),
          // nested sub-pipeline argument (grammar.peg Nesting)
          (s"divide (fetch name:* | sum${keep.toList.sorted.map(" " + _).mkString})",
            avail))
      } yield form
      for {
        (stage, left) <- Gen.frequency(3 -> agg, 2 -> pointwise, 1 -> cmp,
          1 -> misc)
        rest <- mStages(left, n - 1)
      } yield stage :: rest
    }

  private val mPipeline: Gen[String] = for {
    m <- Gen.frequency(3 -> Gen.const("*"), 2 -> ident,
      1 -> ident.map(s => s"${s.take(2)}*"))
    n <- Gen.chooseNum(0, 3)
    stages <- mStages(List("name", "user_id"), n)
  } yield (s"fetch name:$m" +: stages).mkString(" | ")

  test("fuzz: generated m3ql pipelines build") {
    check(Prop.forAllNoShrink(mPipeline) { q =>
      try { M3QL.query(samples, q); Prop.passed } catch {
        case e: Throwable => Prop.falsified :| s"$q -> ${e.getMessage}"
      }
    }, 120)
  }

  test("fuzz: mutated m3ql pipelines reject only with ParseException") {
    val alphabet = """|:;=* _aZ0123456789<>!"""
    val gen = for {
      q <- mPipeline
      m <- mutate(q, alphabet)
    } yield m
    check(Prop.forAllNoShrink(gen) { q =>
      // a mutant that stays grammatical but names a label the frame
      // lacks (sum nam) is rejected by Catalyst analysis — that is
      // the fused parser's second controlled-rejection class
      try { M3QL.query(samples, q); Prop.passed } catch {
        case _: M3QL.ParseException => Prop.passed
        case _: org.apache.spark.sql.AnalysisException => Prop.passed
        case e: Throwable => Prop.falsified :| {
          s"uncontrolled ${e.getClass.getSimpleName}: ${e.getMessage} on <$q>"
        }
      }
    }, 200)
  }
}
