package graft.graphite

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graphite target-expression front-end — parse query strings like
  * `summarize(exclude(events.*.user*, "user7$"), "1d", "sum")` into
  * the [[Graphite]] function library, mirroring the reference's
  * native graphite engine (src/query/graphite/native: lexer.go /
  * parser.go build an expression tree over builtin_functions.go;
  * here the tree evaluates to DataFrame transforms).
  *
  * Grammar:
  * {{{
  *   target := func "(" arg ("," arg)* ")" | path
  *   arg    := target | "quoted" | 'quoted' | number
  *   path   := dotted glob (`*` matches within one segment)
  * }}}
  */
object GraphiteParser {

  sealed trait Node
  final case class Path(glob: String) extends Node
  final case class Call(fn: String, args: Seq[Arg]) extends Node

  sealed trait Arg
  final case class T(node: Node) extends Arg
  final case class S(s: String) extends Arg
  final case class N(d: Double) extends Arg

  final class ParseException(msg: String) extends IllegalArgumentException(msg)

  // the dotted-glob alternative comes before plain numbers would be
  // ambiguous with it: match numbers first, then paths (function
  // names lex as single-segment paths; a name is a call iff followed
  // by an opening paren)
  // path atoms cover the extended glob dialect ([[Glob]]): the bare
  // identifier/pattern runes, backslash escapes, and atomic `{...}` /
  // `[...]` groups (so the commas INSIDE an alternation never reach
  // the argument-separator comma rule). Quoted strings match first —
  // `'` is a valid identifier rune but a leading quote means string.
  private val tokenRe =
    ("""\s*(\(|\)|,|"[^"]*"|'[^']*'""" +
      """|-?[0-9]+\.[0-9]+|-?[0-9]+(?![A-Za-z0-9_*?.{\[\-])""" +
      """|(?:[A-Za-z0-9_*?.$|<>%#/:~\-]|\\.|\{[^{}()\s]*\}|\[[^\]\[(),\s]*\])+)""").r

  private def tokenize(q: String): List[String] = {
    var rest = q
    val out = List.newBuilder[String]
    while (rest.trim.nonEmpty) {
      tokenRe.findPrefixMatchOf(rest) match {
        case Some(m) => out += m.group(1); rest = rest.substring(m.end)
        case None => throw new ParseException(s"cannot tokenize at: $rest")
      }
    }
    out.result()
  }

  def parse(target: String): Node = {
    val (n, rest) = parseNode(tokenize(target))
    if (rest.nonEmpty) throw new ParseException(s"trailing tokens: $rest")
    n
  }

  /** Registered short aliases (builtin_functions.go:3049-3058
    * MustRegisterAliasedFunction) — normalized at parse time so the
    * evaluator dispatches on one canonical name. aliasByTags/
    * roundFunction/time are matched inline where they dispatch. */
  private val fnAlias = Map(
    "abs" -> "absolute", "avg" -> "averageSeries", "log" -> "logarithm",
    "max" -> "maxSeries", "min" -> "minSeries", "sum" -> "sumSeries",
    "randomWalkFunction" -> "randomWalk")

  private def parseNode(ts: List[String]): (Node, List[String]) = ts match {
    case fn0 :: "(" :: rest0 if fn0.matches("[A-Za-z_][A-Za-z0-9_]*") =>
      val fn = fnAlias.getOrElse(fn0, fn0)
      var rest = rest0
      val args = Seq.newBuilder[Arg]
      var done = false
      while (!done) {
        rest match {
          case ")" :: r => rest = r; done = true
          case "," :: r => rest = r
          case t :: _ =>
            val (arg, r) = parseArg(rest)
            args += arg; rest = r
          case Nil => throw new ParseException("unterminated call")
        }
      }
      (Call(fn, args.result()), rest)
    // a path token is anything the lexer's path-atom rule produced:
    // identifier/pattern runes, escapes, and {…}/[…] groups
    case p :: rest if p.matches(
      """(?:[A-Za-z0-9_*?.$|<>%#/:~\-]|\\.|\{[^{}]*\}|\[[^\]\[]*\])+""") =>
      (Path(p), rest)
    case other => throw new ParseException(s"bad target at $other")
  }

  private def parseArg(ts: List[String]): (Arg, List[String]) = ts.head match {
    case q if q.startsWith("\"") || q.startsWith("'") =>
      (S(q.substring(1, q.length - 1)), ts.tail)
    case n if n.matches("-?[0-9]+(\\.[0-9]+)?") => (N(n.toDouble), ts.tail)
    case _ =>
      val (node, rest) = parseNode(ts)
      (T(node), rest)
  }

  /** Duration strings per the reference's ParseInterval grammar
    * (common/basic_functions.go:186,294): each `[+-]?N unit` run in
    * the string contributes signed seconds and the runs SUM, so
    * "10min", "-1h", "+2d", "1h30min" and "1hour" (trailing letters
    * tolerated) all parse, matching `reInterval =
    * ([+-]?[0-9]+)(s|min|h|d|w|mon|y)`. Bare "m" (= minutes) is
    * additionally accepted for the single-char shorthand existing
    * targets use. */
  private val durRe = "([+-]?[0-9]+)(s|min|mon|m|h|d|w|y)([a-z]*)".r
  private def durSeconds(d: String): Long = {
    val trimmed = d.trim.toLowerCase
    val runs = durRe.findAllMatchIn(trimmed).toList
    if (runs.isEmpty) throw new ParseException(s"bad duration $d")
    // the runs must COVER the input — findAllMatchIn alone would
    // silently skip embedded garbage ("1.5h" → the 5h run only)
    if (runs.map(_.matched).mkString != trimmed)
      throw new ParseException(s"bad duration $d")
    runs.map { m =>
      val mult = m.group(2) match {
        case "s"         => 1L
        case "m" | "min" => 60L
        case "h"         => 3600L
        case "d"         => 86400L
        case "w"         => 604800L
        case "mon"       => 2592000L
        case "y"         => 31536000L
      }
      // regex-matched digits can still overflow Long past 19 digits —
      // reject as a parse error, not a NumberFormat escape
      val n = try m.group(1).toLong catch {
        case _: NumberFormatException =>
          throw new ParseException(s"duration out of range: ${m.group(0)}")
      }
      n * mult
    }.sum
  }

  /** Dot-glob → anchored regex via the shared extended translator
    * ([[Glob]], restating glob.go:94-180): `*`/`?` within a segment,
    * `{a,b}` alternation, `[a-z]` ranges, `\` escapes, and `**`
    * spanning separators (AllowMatchAll — the reference's graphite
    * storage wrapper enables it, m3_wrapper.go:123). */
  private def globRe(glob: String): String =
    Glob.anchored(glob, allowMatchAll = true)

  // ---------------- evaluator ----------------

  /** Consolidation grid steps — the `date_trunc` units
    * [[graft.tsdb.Vectors.bucketS]] accepts, with their step in
    * seconds. The unit picked at [[query]] time defines the series'
    * actual step, which the moving-window family uses to convert
    * duration windows to point counts (the reference derives points
    * from `series.MillisPerStep()` — builtin_functions.go:2572). */
  private val unitStep = Map(
    "second" -> 1L, "minute" -> 60L, "hour" -> 3600L, "day" -> 86400L)
  private def stepOf(unit: String): Long =
    unitStep.getOrElse(unit,
      throw new ParseException(s"unknown consolidation unit $unit"))

  /** Parse + evaluate `target` against a sample frame, consolidated
    * on the `unit` grid (default hourly). Builtin argument
    * validation (e.g. an unknown summarize/consolidation function
    * name) raises IllegalArgumentException during plan construction;
    * at this front door that is an invalid RENDER PARAMETER — the
    * reference's typed render-API error — so it maps to
    * ParseException rather than escaping as an engine error (the
    * fuzz suite pins this contract). */
  def query(samples: DataFrame, target: String,
            unit: String = "hour"): DataFrame =
    try eval(parse(target), Graphite.seriesFrame(samples, unit), samples, unit)
    catch {
      case e: ParseException => throw e
      case e: IllegalArgumentException =>
        throw new ParseException(e.getMessage)
    }

  /** The render-API entry (api/v1/handler/graphite/render.go:114
    * from/until form values → graphite.ParseTime → fetch bounds):
    * evaluate `target` over samples restricted to [from, until) —
    * the bound is a plain ts predicate on the INPUT scan, applied
    * before consolidation, so it pushes down to the parquet read
    * like every Fetch time bound. */
  def render(samples: DataFrame, target: String, from: String,
             until: String, nowS: Long,
             unit: String = "hour"): DataFrame = {
    val f = GraphiteTime.parseTime(from, nowS)
    val u = GraphiteTime.parseTime(until, nowS)
    query(samples.where(unix_timestamp(col("ts")) >= f &&
      unix_timestamp(col("ts")) < u), target, unit)
  }

  /** [[render]] plus the API's `maxDataPoints` form value
    * (render_parser.go:169-177): series still larger than the point
    * budget after evaluation are LTTB-downsampled to the resized
    * step (render.go:171-178 → [[Lttb.downsample]]). The resize grid
    * is the render window quantized to the consolidation unit —
    * `[floor(from/step)·step, ceil(until/step)·step)` — the step the
    * evaluated frame's buckets actually sit on. Targets that
    * re-step their series (summarize, hitcount) should instead size
    * their own buckets, same as the reference's consolidateBy
    * carve-out (render.go:170 comment). */
  /** /metrics/find with the API's from/until bounds
    * (find_parser.go:73-97 — defaults `0`/`now`, both through
    * graphite.ParseTime): the tree expands only over series that
    * have data IN THE WINDOW. The bound restricts the fetch before
    * the path frame is built — a plain pushed ts predicate, the
    * render mechanism. */
  def findRange(samples: DataFrame, query: String, from: String,
                until: String, nowS: Long,
                unit: String = "hour"): DataFrame = {
    val f = GraphiteTime.parseTime(from, nowS)
    val u = GraphiteTime.parseTime(until, nowS)
    Graphite.metricsFind(Graphite.seriesFrame(
      samples.where(unix_timestamp(col("ts")) >= f &&
        unix_timestamp(col("ts")) < u), unit), query)
  }

  /** [[render]] plus the API's `offset` form value
    * (render_parser.go:156-166 → timespec.go:323 ParseDuration — the
    * `-N<unit>` form only, so the shift is always into the PAST):
    * both resolved bounds move by the offset before the pushed ts
    * predicate, rendering an earlier copy of the same window (the
    * time-shifted comparison panel idiom). */
  def renderOffset(samples: DataFrame, target: String, from: String,
                   until: String, nowS: Long, offset: String,
                   unit: String = "hour"): DataFrame = {
    val d = GraphiteTime.parseDuration(offset)
    val f = GraphiteTime.parseTime(from, nowS) + d
    val u = GraphiteTime.parseTime(until, nowS) + d
    query(samples.where(unix_timestamp(col("ts")) >= f &&
      unix_timestamp(col("ts")) < u), target, unit)
  }

  /** Multi-target render (render.go:109-135: every `target` form
    * value compiles and executes, results concatenated in REQUEST
    * order; render.go:196-207 applies a STABLE by-name series sort
    * within each target unless the expression sorted already — the
    * deterministic stacking order dashboards depend on). The order is
    * part of the result here: `target_idx` is the request position
    * and `series_order` the per-target by-path rank, computed on the
    * DISTINCT path set and broadcast back (the sortByLabel
    * discipline — no unpartitioned window over data rows).
    *
    * All-NaN series are OMITTED unless `renderSeriesAllNaNs`
    * (render.go:224 renderResultsJSON writes their datapoints only
    * when the server option is set; in frame form the omitted series
    * has no rows at all — value-null rows of PARTIALLY-null series
    * always survive). */
  def renderMulti(samples: DataFrame, targets: Seq[String], from: String,
                  until: String, nowS: Long,
                  renderSeriesAllNaNs: Boolean = false,
                  unit: String = "hour"): DataFrame = {
    if (targets.isEmpty) throw new ParseException("no target specified")
    // allowMissingColumns: a ranked target (sortByMaxima) carries
    // sort_rank, a plain one doesn't — the union keeps it where
    // present, null elsewhere
    val all = targets.zipWithIndex.map { case (t, i) =>
      render(samples, t, from, until, nowS, unit)
        .withColumn("target_idx", lit(i))
    }.reduce(_.unionByName(_, allowMissingColumns = true))
    val kept =
      if (renderSeriesAllNaNs) all
      else all.join(
        all.groupBy("target_idx", "path")
          .agg(count(col("value")).as("_nn")).where(col("_nn") > 0)
          .select("target_idx", "path"),
        Seq("target_idx", "path"), "left_semi")
    val order = kept.select("target_idx", "path").distinct()
      .withColumn("series_order",
        dense_rank().over(org.apache.spark.sql.expressions.Window
          .partitionBy("target_idx").orderBy("path")))
    kept.join(broadcast(order), Seq("target_idx", "path"))
  }

  def renderMaxDataPoints(samples: DataFrame, target: String,
                          from: String, until: String, nowS: Long,
                          maxDataPoints: Int,
                          unit: String = "hour"): DataFrame = {
    val f = GraphiteTime.parseTime(from, nowS)
    val u = GraphiteTime.parseTime(until, nowS)
    val step = stepOf(unit)
    val start = math.floorDiv(f, step) * step
    val end = ((u + step - 1) / step) * step
    Lttb.downsample(render(samples, target, from, until, nowS, unit),
      start, end, step, maxDataPoints)
  }

  private def one(fn: String, args: Seq[Arg], base: DataFrame,
                  samples: DataFrame, unit: String): DataFrame =
    args match {
      case Seq(T(n), _*) => eval(n, base, samples, unit)
      case other => throw new ParseException(s"$fn needs a series argument, got $other")
    }
  // required-argument access goes through lift: a missing argument is
  // the parser's own error, never an index escape (the r12 fuzz find)
  private def num(fn: String, args: Seq[Arg], i: Int): Double = args.lift(i) match {
    case Some(N(d)) => d
    case other => throw new ParseException(
      s"$fn arg $i must be a number, got ${other.getOrElse("nothing")}")
  }
  private def str(fn: String, args: Seq[Arg], i: Int): String = args.lift(i) match {
    case Some(S(s)) => s
    case other => throw new ParseException(
      s"$fn arg $i must be a string, got ${other.getOrElse("nothing")}")
  }
  /** moving-family window: a point count (`3`) or a duration string
    * (`"5h"`), converted via the frame's actual consolidation step —
    * the reference derives points from the series' MillisPerStep
    * (builtin_functions.go:2572). A duration below one step rounds
    * up to a 1-point window, same as the reference's integer divide
    * floor-then-min(1). */
  private def windowPoints(fn: String, args: Seq[Arg], i: Int,
                           unit: String): Int =
    args.lift(i) match {
      case Some(N(d)) => d.toInt
      case Some(S(s)) => math.max(1, (durSeconds(s) / stepOf(unit)).toInt)
      case other => throw new ParseException(
        s"$fn arg $i must be a number or duration, got ${other.getOrElse("nothing")}")
    }
  private def optNum(args: Seq[Arg], i: Int, default: Double): Double =
    args.lift(i).collect { case N(d) => d }.getOrElse(default)
  private def optStr(args: Seq[Arg], i: Int, default: String): String =
    args.lift(i).collect { case S(s) => s }.getOrElse(default)
  /** graphite booleans lex as bare paths (`true`) or strings. */
  private def optBool(args: Seq[Arg], i: Int, default: Boolean): Boolean =
    args.lift(i).collect {
      case T(Path("true")) | S("true") => true
      case T(Path("false")) | S("false") => false
    }.getOrElse(default)
  private def intArgs(fn: String, args: Seq[Arg]): Seq[Int] =
    args.map {
      case N(d) => d.toInt
      case a => throw new ParseException(s"$fn positions must be ints: $a")
    }

  /** Functions over a series LIST: 1+ series args union into one
    * frame (graphite's multiplePathSpecs). */
  private val multiSeriesFns = Set(
    "sumSeries", "averageSeries", "minSeries", "maxSeries",
    "multiplySeries", "diffSeries", "rangeOfSeries", "stddevSeries",
    "countSeries", "group", "powSeries")

  /** A frame consumed where series ORDER is meaningless (multi-series
    * aggregation unions, the two-series combinators): shed the
    * ranked family's sort_rank column so differently-shaped
    * sub-results union cleanly — sumSeries(sortByMaxima(x), y) is
    * legal graphite (the r12 fuzz find). Rank-consuming chains
    * (limit∘sortByMaxima) evaluate through `one()` and keep it. */
  private def unordered(df: DataFrame): DataFrame =
    if (df.columns.contains("sort_rank")) df.drop("sort_rank") else df

  def eval(node: Node, base: DataFrame,
           samples: DataFrame = null,
           unit: String = "hour"): DataFrame = node match {
    case Path(glob) => base.where(col("path").rlike(globRe(glob)))
    case Call(fn, args) if multiSeriesFns(fn) && args.nonEmpty =>
      val frames = args.map {
        case T(n) => unordered(eval(n, base, samples, unit))
        case other => throw new ParseException(s"$fn takes series args, got $other")
      }
      val in = frames.reduce(_.unionByName(_))
      fn match {
        case "sumSeries"      => Graphite.combineSeries(in, "sum")
        case "averageSeries"  => Graphite.combineSeries(in, "avg")
        case "minSeries"      => Graphite.combineSeries(in, "min")
        case "maxSeries"      => Graphite.combineSeries(in, "max")
        case "multiplySeries" => Graphite.multiplySeries(in)
        case "diffSeries"     => Graphite.diffSeries(in)
        case "rangeOfSeries"  => Graphite.rangeOfSeries(in)
        case "stddevSeries"   => Graphite.stddevSeries(in)
        case "countSeries"    => Graphite.countSeries(in)
        case "group"          => in
        case "powSeries"      => Graphite.powSeries(in)
      }
    // two-series functions take their second vector from args(1)
    // asPercent's total may be a series, a constant, or omitted
    // (= the sum of the input series — builtin_functions.go:1072,
    // default total nil at :2854)
    case Call("asPercent", args) =>
      val in = one("asPercent", args, base, samples, unit)
      args.lift(1) match {
        case Some(T(n)) => Graphite.asPercent(in, eval(n, base, samples, unit))
        case Some(N(d)) => Graphite.asPercent(in, d)
        case None => Graphite.asPercent(in, Graphite.combineSeries(in, "sum"))
        case Some(other) =>
          throw new ParseException(s"asPercent total must be a series or number, got $other")
      }
    case Call(fn @ ("divideSeries" | "divideSeriesLists" |
                    "fallbackSeries" | "weightedAverage"), args) =>
      val (a, b) = (args.lift(0), args.lift(1)) match {
        case (Some(T(x)), Some(T(y))) =>
          (unordered(eval(x, base, samples, unit)),
            unordered(eval(y, base, samples, unit)))
        case other => throw new ParseException(s"$fn needs two series args: $other")
      }
      fn match {
        case "divideSeries"      => Graphite.divideSeries(a, b)
        case "divideSeriesLists" => Graphite.divideSeriesLists(a, b)
        case "fallbackSeries"    => Graphite.fallbackSeries(a, b)
        case "weightedAverage" =>
          Graphite.weightedAverage(a, b, num(fn, args, 2).toInt)
      }
    // grid producers need no series argument
    case Call("constantLine", args) =>
      Graphite.constantLine(base, num("constantLine", args, 0))
    case Call("threshold", args) =>
      Graphite.threshold(base, num("threshold", args, 0),
        optStr(args, 1, ""))
    case Call("identity", args) =>
      Graphite.identitySeries(base, str("identity", args, 0))
    case Call(fn @ ("time" | "timeFunction"), args) =>
      Graphite.identitySeries(base, str(fn, args, 0))
    case Call("randomWalk", args) =>
      Graphite.randomWalk(base, str("randomWalk", args, 0),
        optNum(args, 1, 60.0).toLong)
    // re-consolidation needs the raw samples
    case Call("consolidateBy", args) =>
      if (samples == null)
        throw new ParseException("consolidateBy needs a sample frame")
      val how = str("consolidateBy", args, 1) match {
        case "average" => "avg"
        case h => h
      }
      eval(args.lift(0) match {
        case Some(T(n)) => n
        case other => throw new ParseException(s"consolidateBy needs a series arg: $other")
      }, Graphite.seriesFrame(samples, unit, how), samples, unit)
    case Call("cumulative", args) =>
      if (samples == null)
        throw new ParseException("cumulative needs a sample frame")
      eval(args.lift(0) match {
        case Some(T(n)) => n
        case other => throw new ParseException(s"cumulative needs a series arg: $other")
      }, Graphite.seriesFrame(samples, unit, "sum"), samples, unit)
    // sub-target template evaluation: one evaluated target per
    // distinct node prefix (aggregation_functions.go:538). The
    // prefix set is a bounded driver collect, exactly the reference's
    // in-memory prefix map — capped so a runaway-cardinality
    // namespace fails loudly instead of building a 10⁶-branch plan.
    case Call("applyByNode", args) =>
      val in = one("applyByNode", args, base, samples, unit)
      val nodeNum = num("applyByNode", args, 1).toInt
      val template = str("applyByNode", args, 2)
      val newName = optStr(args, 3, "")
      val maxPrefixes = 128
      val parts = split(col("path"), "\\.")
      val prefixes = in
        .where(size(parts) > nodeNum + 1)
        .select(concat_ws(".", slice(parts, 1, nodeNum + 1)).as("p"))
        .distinct().orderBy("p").limit(maxPrefixes + 1)
        .collect().map(_.getString(0))
      if (prefixes.length > maxPrefixes)
        throw new ParseException(
          s"applyByNode: more than $maxPrefixes node prefixes")
      if (prefixes.isEmpty)
        throw new ParseException("applyByNode: no matching prefixes")
      prefixes.map { p =>
        val sub = unordered(
          eval(parse(template.replace("%", p)), base, samples, unit))
        if (newName.isEmpty) sub
        else sub.withColumn("path", lit(newName.replace("%", p)))
      }.reduce(_ unionByName _)
    case Call(fn, args) =>
      val in = one(fn, args, base, samples, unit)
      fn match {
        case "summarize" =>
          Graphite.summarize(in, durSeconds(str(fn, args, 1)), str(fn, args, 2))
        case "movingAverage" =>
          Graphite.movingAverage(in, windowPoints(fn, args, 1, unit),
            optNum(args, 2, 0.0))
        case "movingMedian" =>
          Graphite.movingMedian(in, windowPoints(fn, args, 1, unit),
            optNum(args, 2, 0.0))
        case "movingMax" =>
          Graphite.movingMax(in, windowPoints(fn, args, 1, unit),
            optNum(args, 2, 0.0))
        case "movingMin" =>
          Graphite.movingMin(in, windowPoints(fn, args, 1, unit),
            optNum(args, 2, 0.0))
        case "countSeries" => Graphite.countSeries(in)
        case "currentAbove" => Graphite.currentAbove(in, num(fn, args, 1))
        case "currentBelow" => Graphite.currentBelow(in, num(fn, args, 1))
        case "averageBelow" => Graphite.averageBelow(in, num(fn, args, 1))
        case "minimumAbove" => Graphite.minimumAbove(in, num(fn, args, 1))
        case "removeAboveValue" => Graphite.removeAboveValue(in, num(fn, args, 1))
        case "removeBelowValue" => Graphite.removeBelowValue(in, num(fn, args, 1))
        case "invert" => Graphite.invert(in)
        case "logarithm" =>
          Graphite.logarithm(in,
            args.lift(1).collect { case N(d) => d }.getOrElse(10.0))
        case "pow" => Graphite.powSeries(in, num(fn, args, 1))
        case "squareRoot" => Graphite.squareRoot(in)
        case "offsetToZero" => Graphite.offsetToZero(in)
        case "keepLastValue" =>
          Graphite.keepLastValue(in, optNum(args, 1, -1.0).toInt)
        // aliasByTags is a registered alias of aliasByNode in the
        // reference (builtin_functions.go:3050)
        case "aliasByNode" | "aliasByTags" =>
          Graphite.aliasByNode(in, intArgs(fn, args.tail): _*)
        case "scale"    => Graphite.scale(in, num(fn, args, 1))
        case "offset"   => Graphite.offsetSeries(in, num(fn, args, 1))
        case "absolute" => Graphite.absolute(in)
        case "derivative" => Graphite.derivative(in)
        case "nonNegativeDerivative" =>
          Graphite.nonNegativeDerivative(in, optNum(args, 1, Double.NaN))
        case "perSecond" => Graphite.perSecond(in)
        case "integral"  => Graphite.integral(in)
        case "integralByInterval" =>
          Graphite.integralByInterval(in, durSeconds(str(fn, args, 1)))
        // builtin_functions.go:355: no sign implies minus (shift back
        // in time); the series then shifts by -1 * interval, so "1h"
        // and "-1h" both re-stamp points one hour later and "+1h"
        // re-stamps them one hour earlier.
        case "timeShift" =>
          val raw = str(fn, args, 1).trim
          val signed =
            if (raw.startsWith("+") || raw.startsWith("-")) raw else "-" + raw
          Graphite.timeShift(in, -durSeconds(signed))
        case "highestMax" => Graphite.highestMax(in, num(fn, args, 1).toInt)
        case "averageAbove" => Graphite.averageAbove(in, num(fn, args, 1))
        case "maximumAbove" => Graphite.maximumAbove(in, num(fn, args, 1))
        case "nPercentile" => Graphite.nPercentile(in, num(fn, args, 1))
        case "sortByMaxima" => Graphite.sortByMaxima(in)
        case "groupByNode" =>
          Graphite.groupByNode(in, num(fn, args, 1).toInt,
            optStr(args, 2, "avg") match {
              case "average" => "avg"; case h => h
            })
        case "alias" => Graphite.alias(in, str(fn, args, 1))
        case "transformNull" =>
          Graphite.transformNull(in, optNum(args, 1, 0.0))
        case "sortByName" =>
          Graphite.sortByName(in, optBool(args, 1, default = false),
            optBool(args, 2, default = false))
        case "exclude" => Graphite.exclude(in, str(fn, args, 1))
        case "grep"    => Graphite.grep(in, str(fn, args, 1))
        case "limit"   => Graphite.limitSeries(in, num(fn, args, 1).toInt)
        // ---- round-3 additions (the rest of the registry core) ----
        case "aggregate" => Graphite.aggregateSeries(in, str(fn, args, 1))
        case "aggregateLine" =>
          Graphite.aggregateLine(in, optStr(args, 1, "avg") match {
            case "average" => "avg"; case h => h
          })
        case "percentileOfSeries" =>
          Graphite.percentileOfSeries(in, num(fn, args, 1),
            optBool(args, 2, default = false))
        case "sumSeriesWithWildcards" =>
          Graphite.sumSeriesWithWildcards(in, intArgs(fn, args.tail))
        case "averageSeriesWithWildcards" =>
          Graphite.averageSeriesWithWildcards(in, intArgs(fn, args.tail))
        case "multiplySeriesWithWildcards" =>
          Graphite.multiplySeriesWithWildcards(in, intArgs(fn, args.tail))
        case "aggregateWithWildcards" =>
          Graphite.aggregateWithWildcards(in, str(fn, args, 1),
            intArgs(fn, args.drop(2)))
        case "groupByNodes" =>
          Graphite.groupByNodes(in, str(fn, args, 1),
            intArgs(fn, args.drop(2)))
        case "changed" => Graphite.changed(in)
        case "stdev" =>
          Graphite.stdev(in, num(fn, args, 1).toInt, optNum(args, 2, 0.1))
        case "movingSum" =>
          Graphite.movingSum(in, windowPoints(fn, args, 1, unit),
            optNum(args, 2, 0.0))
        case "movingWindow" =>
          Graphite.movingWindow(in, windowPoints(fn, args, 1, unit),
            optStr(args, 2, "avg"), optNum(args, 3, 0.0))
        case "exponentialMovingAverage" =>
          Graphite.exponentialMovingAverage(in, num(fn, args, 1).toInt)
        case "delay" => Graphite.delay(in, num(fn, args, 1).toInt)
        case "interpolate" =>
          Graphite.interpolate(in, optNum(args, 1, -1.0).toInt)
        case "isNonNull" => Graphite.isNonNull(in)
        case "round" | "roundFunction" =>
          Graphite.roundSeries(in, optNum(args, 1, 0.0).toInt)
        case "scaleToSeconds" =>
          Graphite.scaleToSeconds(in, num(fn, args, 1).toInt, stepOf(unit))
        case "substr" =>
          Graphite.substrSeries(in, optNum(args, 1, 0.0).toInt,
            optNum(args, 2, 0.0).toInt)
        case "timeSlice" =>
          Graphite.timeSlice(in, num(fn, args, 1).toLong,
            num(fn, args, 2).toLong)
        case "sustainedAbove" =>
          Graphite.sustainedAbove(in, num(fn, args, 1),
            durSeconds(str(fn, args, 2)), stepOf(unit))
        case "sustainedBelow" =>
          Graphite.sustainedBelow(in, num(fn, args, 1),
            durSeconds(str(fn, args, 2)), stepOf(unit))
        case "removeAbovePercentile" =>
          Graphite.removeAbovePercentile(in, num(fn, args, 1))
        case "removeBelowPercentile" =>
          Graphite.removeBelowPercentile(in, num(fn, args, 1))
        case "removeEmptySeries" =>
          Graphite.removeEmptySeries(in, optNum(args, 1, 0.0))
        case "hitcount" =>
          Graphite.hitcount(in, durSeconds(str(fn, args, 1)),
            stepOf(unit))
        case "smartSummarize" =>
          Graphite.smartSummarize(in, durSeconds(str(fn, args, 1)),
            str(fn, args, 2) match { case "average" => "avg"; case h => h })
        case "highest" =>
          Graphite.highest(in, optNum(args, 1, 1.0).toInt,
            optStr(args, 2, "avg"))
        case "lowest" =>
          Graphite.lowest(in, optNum(args, 1, 1.0).toInt,
            optStr(args, 2, "avg"))
        case "highestAverage" =>
          Graphite.highestAverage(in, num(fn, args, 1).toInt)
        case "highestCurrent" =>
          Graphite.highestCurrent(in, num(fn, args, 1).toInt)
        case "lowestAverage" =>
          Graphite.lowestAverage(in, num(fn, args, 1).toInt)
        case "lowestCurrent" =>
          Graphite.lowestCurrent(in, num(fn, args, 1).toInt)
        case "mostDeviant" =>
          Graphite.mostDeviant(in, num(fn, args, 1).toInt)
        case "sortBy" =>
          Graphite.sortBy(in, optStr(args, 1, "avg"),
            optBool(args, 2, default = false))
        case "sortByTotal" => Graphite.sortByTotal(in)
        case "sortByMinima" => Graphite.sortByMinima(in)
        case "filterSeries" =>
          Graphite.filterSeries(in, str(fn, args, 1), str(fn, args, 2),
            num(fn, args, 3))
        case "aliasSub" =>
          Graphite.aliasSub(in, str(fn, args, 1), str(fn, args, 2))
        case "aliasByMetric" => Graphite.aliasByMetric(in)
        case "legendValue" =>
          Graphite.legendValue(in, str(fn, args, 1) match {
            case "average" => "avg"; case h => h
          })
        case "cactiStyle" => Graphite.cactiStyle(in)
        case "dashed" => Graphite.dashed(in, optNum(args, 1, 5.0))
        case "useSeriesAbove" =>
          Graphite.useSeriesAbove(in, base, num(fn, args, 1),
            str(fn, args, 2), str(fn, args, 3))
        case "holtWintersForecast" =>
          Graphite.holtWintersForecast(in, stepOf(unit))
        case "holtWintersConfidenceBands" =>
          Graphite.holtWintersConfidenceBands(in, optNum(args, 1, 3.0),
            stepOf(unit))
        case "holtWintersAberration" =>
          Graphite.holtWintersAberration(in, optNum(args, 1, 3.0),
            stepOf(unit))
        case other => throw new ParseException(s"unknown graphite function $other")
      }
  }
}
