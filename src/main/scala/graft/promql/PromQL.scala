package graft.promql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.tsdb.{Fetch, Temporal, Vectors}

/** Minimal PromQL front-end: parse a query string into the engine's
  * operators, so the library is usable without writing Scala — the
  * analogue of the reference's parser/planner pipeline
  * (src/query/parser/promql/parse.go builds the dataflow DAG that
  * the src/query/functions operators execute; here the DAG nodes are
  * the DataFrame transforms of graft.tsdb).
  *
  * Supported grammar (a deliberately small, real subset):
  * {{{
  *   expr     := agg | func | selector
  *   agg      := op ("by"|"without") "(" labels ")" "(" expr ")"
  *             | op "(" expr ")"                      op ∈ sum avg min max count stddev
  *   func     := name "(" expr ")"
  *               temporal (arg must carry a range):  rate increase delta
  *                 resets changes deriv sum_over_time avg_over_time
  *                 min_over_time max_over_time count_over_time last_over_time
  *                 stddev_over_time
  *               instant transforms: abs ceil floor exp sqrt ln log2 log10
  *   selector := metric? ("{" matcher ("," matcher)* "}")? ("[" dur "]")?
  *               ("offset" dur)?
  *   matcher  := label ("="|"!="|"=~"|"!~") "quoted"
  *   dur      := 1m 1h 1d 1w (tumbling resolution units)
  * }}}
  *
  * Evaluation model: selectors filter the sample frame via [[Fetch]]
  * (matchers push down to the scan); a bare selector consolidates to
  * the day-instant frame; temporal functions evaluate over tumbling
  * windows of the selector's range; aggregations group on
  * (kept labels, bucket_s). Result is always a frame
  * (labels…, bucket_s, value).
  */
object PromQL {

  // ---------------- AST ----------------
  sealed trait Expr
  final case class Selector(metric: Option[String],
                            matchers: Seq[Fetch.Matcher],
                            rangeUnit: Option[String],
                            offsetS: Long) extends Expr
  final case class Func(name: String, arg: Expr) extends Expr
  final case class Agg(op: String, by: Option[Seq[String]],
                       without: Option[Seq[String]], arg: Expr) extends Expr

  private val aggOps = Set("sum", "avg", "min", "max", "count", "stddev")
  private val temporalFns = Set(
    "rate", "increase", "delta", "resets", "changes", "deriv",
    "sum_over_time", "avg_over_time", "min_over_time", "max_over_time",
    "count_over_time", "last_over_time", "stddev_over_time")
  private val transformFns = Set(
    "abs", "ceil", "floor", "exp", "sqrt", "ln", "log2", "log10")

  // ---------------- parser ----------------
  final class ParseException(msg: String) extends IllegalArgumentException(msg)

  private val tokenRe =
    """\s*(=~|!~|!=|=|\(|\)|\{|\}|\[|\]|,|[0-9]+[smhdw]|[A-Za-z_][A-Za-z0-9_]*|"(?:[^"\\]|\\.)*")""".r

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

  def parse(q: String): Expr = {
    val (e, rest) = parseExpr(tokenize(q))
    if (rest.nonEmpty) throw new ParseException(s"trailing tokens: $rest")
    validate(e)
    e
  }

  private def validate(e: Expr): Unit = e match {
    case Func(fn, s: Selector) if temporalFns(fn) =>
      if (s.rangeUnit.isEmpty)
        throw new ParseException(s"$fn requires a range selector, e.g. x[1d]")
    case Func(fn, _) if temporalFns(fn) =>
      throw new ParseException(s"$fn requires a plain range selector argument")
    case Func(_, arg) => validate(arg)
    case Agg(_, _, _, arg) => validate(arg)
    case s: Selector =>
      if (s.rangeUnit.isDefined && s.metric.isEmpty && s.matchers.isEmpty)
        throw new ParseException("range selector needs a metric or matchers")
  }

  private def parseExpr(ts: List[String]): (Expr, List[String]) = ts match {
    case op :: ("by" | "without") :: _ if aggOps(op) => parseAgg(ts)
    case op :: "(" :: _ if aggOps(op) => parseAgg(ts)
    case fn :: "(" :: _ if temporalFns(fn) || transformFns(fn) =>
      val (arg, rest) = parseParen(ts.tail)
      (Func(fn, arg), rest)
    case _ => parseSelector(ts)
  }

  private def parseParen(ts: List[String]): (Expr, List[String]) = ts match {
    case "(" :: rest0 =>
      val (e, rest1) = parseExpr(rest0)
      rest1 match {
        case ")" :: rest2 => (e, rest2)
        case other => throw new ParseException(s"expected ), got $other")
      }
    case other => throw new ParseException(s"expected (, got $other")
  }

  private def parseAgg(ts: List[String]): (Expr, List[String]) = {
    val op = ts.head
    var rest = ts.tail
    var by: Option[Seq[String]] = None
    var without: Option[Seq[String]] = None
    rest match {
      case ("by" | "without") :: "(" :: _ =>
        val mode = rest.head
        val (labels, r) = parseLabelList(rest.tail)
        if (mode == "by") by = Some(labels) else without = Some(labels)
        rest = r
      case _ =>
    }
    val (arg, r2) = parseParen(rest)
    (Agg(op, by, without, arg), r2)
  }

  private def parseLabelList(ts: List[String]): (Seq[String], List[String]) = {
    require(ts.headOption.contains("("), s"expected ( in label list: $ts")
    var rest = ts.tail
    val out = Seq.newBuilder[String]
    var done = false
    while (!done) rest match {
      case ")" :: r => rest = r; done = true
      case "," :: r => rest = r
      case l :: r => out += l; rest = r
      case Nil => throw new ParseException("unterminated label list")
    }
    (out.result(), rest)
  }

  private def parseSelector(ts: List[String]): (Expr, List[String]) = {
    var rest = ts
    val metric = rest match {
      case m :: r if m != "{" && m.matches("[A-Za-z_][A-Za-z0-9_]*") =>
        rest = r; Some(m)
      case _ => None
    }
    var matchers = Seq.empty[Fetch.Matcher]
    rest match {
      case "{" :: r0 =>
        var r = r0
        var done = false
        while (!done) r match {
          case "}" :: rr => r = rr; done = true
          case "," :: rr => r = rr
          case label :: op :: v :: rr if v.startsWith("\"") =>
            val value = v.substring(1, v.length - 1)
              .replace("\\\"", "\"").replace("\\\\", "\\")
            val fop = op match {
              case "="  => Fetch.Eq
              case "!=" => Fetch.NotEq
              case "=~" => Fetch.Re
              case "!~" => Fetch.NotRe
              case o => throw new ParseException(s"bad matcher op $o")
            }
            matchers :+= Fetch.Matcher(label, fop, value)
            r = rr
          case other => throw new ParseException(s"bad matcher at $other")
        }
        rest = r
      case _ =>
    }
    var rangeUnit: Option[String] = None
    rest match {
      case "[" :: d :: "]" :: r => rangeUnit = Some(durUnit(d)); rest = r
      case _ =>
    }
    var offsetS = 0L
    rest match {
      case "offset" :: d :: r => offsetS = durSeconds(d); rest = r
      case _ =>
    }
    (Selector(metric, matchers, rangeUnit, offsetS), rest)
  }

  private def durUnit(d: String): String = d match {
    case "1m" => "minute"
    case "1h" => "hour"
    case "1d" => "day"
    case "1w" => "week"
    case _ => throw new ParseException(
      s"unsupported range $d (tumbling units: 1m 1h 1d 1w)")
  }

  private def durSeconds(d: String): Long = {
    val n = d.dropRight(1).toLong
    d.last match {
      case 's' => n
      case 'm' => n * 60
      case 'h' => n * 3600
      case 'd' => n * 86400
      case 'w' => n * 604800
      case u => throw new ParseException(s"bad duration unit $u")
    }
  }

  // ---------------- evaluator ----------------

  /** Parse + evaluate `q` against a sample frame
    * (name, user_id, ts, value, event_id). */
  def query(samples: DataFrame, q: String): DataFrame =
    evalExpr(parse(q), samples)

  private def labelsOf(df: DataFrame): Seq[String] =
    df.columns.toSeq.filterNot(Set("bucket_s", "value", "ts", "event_id"))

  private def fetchFor(sel: Selector, samples: DataFrame): DataFrame = {
    val ms = sel.metric.map(m => Fetch.Matcher("name", Fetch.Eq, m)).toSeq ++
      sel.matchers
    Fetch(samples, ms, offsetS = sel.offsetS)
  }

  private def evalExpr(e: Expr, samples: DataFrame): DataFrame = e match {
    case sel: Selector =>
      // bare selector: consolidate to the instant frame at the
      // selector's range resolution (default day)
      Vectors.instant(fetchFor(sel, samples), sel.rangeUnit.getOrElse("day"))

    case Func(fn, sel: Selector) if temporalFns(fn) =>
      val unit = sel.rangeUnit.getOrElse(throw new ParseException(
        s"$fn requires a range selector, e.g. x[1d]"))
      val in = fetchFor(sel, samples)
      val keep = (c: String) =>
        (Vectors.labels :+ "bucket_s").map(col) :+ col(c).as("value")
      fn match {
        case "rate"      => Temporal.rateFrame(in, unit).select(keep("rate_v"): _*)
        case "increase"  => Temporal.rateFrame(in, unit).select(keep("increase_v"): _*)
        case "delta"     => Temporal.rateFrame(in, unit).select(keep("delta_v"): _*)
        case "resets"    => Temporal.resetsChanges(in, unit).select(keep("resets_v"): _*)
        case "changes"   => Temporal.resetsChanges(in, unit).select(keep("changes_v"): _*)
        case "deriv"     => Temporal.linearRegression(in, unit = unit).select(keep("deriv_v"): _*)
        case "sum_over_time"   => Temporal.overTimeAggs(in, unit).select(keep("sum_v"): _*)
        case "avg_over_time"   => Temporal.overTimeAggs(in, unit).select(keep("avg_v"): _*)
        case "min_over_time"   => Temporal.overTimeAggs(in, unit).select(keep("min_v"): _*)
        case "max_over_time"   => Temporal.overTimeAggs(in, unit).select(keep("max_v"): _*)
        case "count_over_time" => Temporal.overTimeAggs(in, unit).select(keep("count_v"): _*)
        case "last_over_time"  => Temporal.lastOverTime(in, unit)
        case "stddev_over_time" => Temporal.overTimeStddev(in, unit).select(keep("stddev_v"): _*)
        case other => throw new ParseException(s"unknown temporal fn $other")
      }

    case Func(fn, _) if temporalFns(fn) =>
      throw new ParseException(s"$fn requires a plain range selector argument")

    case Func(fn, arg) =>
      val in = evalExpr(arg, samples)
      val v = col("value")
      val out: Column = fn match {
        case "abs"   => abs(v)
        case "ceil"  => ceil(v).cast("double")
        case "floor" => floor(v).cast("double")
        case "exp"   => exp(v)
        case "sqrt"  => sqrt(v)
        case "ln"    => when(v > 0, log(v))
        case "log2"  => when(v > 0, log2(v))
        case "log10" => when(v > 0, log10(v))
        case other => throw new ParseException(s"unknown function $other")
      }
      in.withColumn("value", out)

    case Agg(op, by, without, arg) =>
      val in = evalExpr(arg, samples)
      val labels = labelsOf(in)
      val kept = (by, without) match {
        case (Some(b), _) => labels.filter(b.contains)
        case (_, Some(w)) => labels.filterNot(w.contains)
        case _ => Seq.empty
      }
      val keys = (kept :+ "bucket_s").map(col)
      val agg: Column = op match {
        case "sum"    => sum("value")
        case "avg"    => avg("value")
        case "min"    => min("value")
        case "max"    => max("value")
        case "count"  => count(lit(1)).cast("double")
        case "stddev" => stddev_pop("value")
        case other => throw new ParseException(s"unknown agg $other")
      }
      in.groupBy(keys: _*).agg(agg.as("value"))
  }
}
