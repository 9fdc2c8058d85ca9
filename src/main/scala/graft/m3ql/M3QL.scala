package graft.m3ql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tsdb.{Fetch, Vectors}

/** M3QL front-end — the reference's third query language
  * (src/query/parser/m3ql/grammar.peg: a pipeline of stages joined
  * by `|`, with leading macro definitions separated by `;`).
  *
  * Supported grammar (tracking grammar.peg):
  * {{{
  *   script   := (macro ";")* pipeline
  *   macro    := ident "=" pipeline          spliced where referenced
  *   pipeline := stage ("|" stage)*
  *   stage    := "fetch" (label ":" pattern)+    glob patterns
  *             | aggOp label*                    sum avg min max count
  *             |                                 stddev median, BY labels
  *             | "percentile" q label*           quantile aggregation
  *             | "top" k label* | "bottom" k label*
  *             | cmpOp number                    < <= > >= == != on value
  *             | fn                              abs ceil floor sqrt exp
  *             |                                 ln log2 log10 sgn neg
  *             | "scale" k | "offset" k | "transformNull" d?
  *             | "clamp" min:a? max:b?           keyword arguments
  *             | "timeshift" seconds
  *             | "keepNaN" bool?                 keep null points (the
  *               m3 KeepNaNs result option; pipelines DROP null values
  *               at the end by default, `keepNaN` retains them)
  *             | "divide" "(" pipeline ")"       nested sub-pipeline
  *             | "asPercent" "(" pipeline ")"    (grammar.peg:40
  *               Nesting <- LParenthesis Pipeline RParenthesis — a
  *               parenthesized pipeline as a function argument);
  *               joins on the shared label columns + bucket, value =
  *               l/r (×100 for asPercent), null at r = 0
  *             | macroName                       splices the macro
  * }}}
  *
  * `;`, `|` and whitespace split at paren depth 0 only, so a nested
  * pipeline may itself contain pipes, macros and further nesting.
  *
  * `fetch` evaluates to the day-instant frame of the matched series;
  * downstream stages transform (labels…, bucket_s, value).
  */
object M3QL {

  final class ParseException(msg: String) extends IllegalArgumentException(msg)

  private val aggOps = Set("sum", "avg", "min", "max", "count",
    "stddev", "median")
  private val fns = Set("abs", "ceil", "floor", "sqrt", "exp", "ln",
    "log2", "log10", "sgn", "neg")
  private val cmpOps = Set("<", "<=", ">", ">=", "==", "!=")

  // glob translation is shared with the graphite route
  // (graft.graphite.Glob) — the reference m3ql grammar passes the
  // same GlobSymbols set `* ? { } [ ] , ^ $` through its pattern rule
  // (src/query/parser/m3ql/grammar.peg.go:1493) and the conversion
  // dialect is graphite's glob.go.

  private def labelsOf(df: DataFrame): Seq[String] =
    df.columns.toSeq.filterNot(Set("bucket_s", "value", "ts", "event_id"))

  /** Numeric stage arguments reject through the parser's own error
    * type — the reference grammar validates number tokens in its PEG
    * rules (grammar.peg.go's numericLiteral), so a malformed `< 00<`
    * is a parse error there, never a runtime panic. */
  private def numArg(s: String): Double =
    try s.toDouble catch { case _: NumberFormatException =>
      throw new ParseException(s"expected a number, got '$s'") }
  private def intArg(s: String): Int =
    try s.toInt catch { case _: NumberFormatException =>
      throw new ParseException(s"expected an integer, got '$s'") }
  private def longArg(s: String): Long =
    try s.toLong catch { case _: NumberFormatException =>
      throw new ParseException(s"expected an integer, got '$s'") }

  def query(samples: DataFrame, q: String): DataFrame = {
    // macro definitions: `name = pipeline ; … ; main-pipeline`
    val parts = splitTop(q, ';')
    val (defs, mains) = parts.partition(_.matches("^[A-Za-z_][A-Za-z0-9_]*\\s*=.*"))
    if (mains.length != 1)
      throw new ParseException(s"expected exactly one main pipeline, got ${mains.length}")
    val macros = defs.map { d =>
      val Array(name, body) = d.split("=", 2)
      name.trim -> stagesOf(body)
    }.toMap
    val (result, stages) = runPipeline(stagesOf(mains.head), samples, macros)
    // m3's KeepNaNs result option: null points drop from the response
    // unless the pipeline carries `keepNaN` (api/v1/.../common.go:278)
    if (stages.exists(_.split("\\s+").headOption.contains("keepNaN"))) result
    else result.where(col("value").isNotNull)
  }

  /** expand macros and fold the stage list — the shared evaluator for
    * the main pipeline and every nested `( pipeline )` argument. */
  private def runPipeline(raw: List[String], samples: DataFrame,
                          macros: Map[String, List[String]])
  : (DataFrame, List[String]) = {
    val stages = expand(raw, macros, depth = 0)
    val result = stages
      .foldLeft(Option.empty[DataFrame]) { (acc, stage) =>
        Some(evalStage(stage, acc, samples, macros))
      }
      .getOrElse(throw new ParseException("empty pipeline"))
    (result, stages)
  }

  /** split on `sep` at paren depth 0 only (grammar.peg:40 Nesting: a
    * parenthesized pipeline is opaque to the outer splitter); throws
    * on unbalanced parentheses. */
  private def splitTop(s: String, sep: Char): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    s.foreach { c =>
      if (c == '(') { depth += 1; cur += c }
      else if (c == ')') {
        depth -= 1
        if (depth < 0) throw new ParseException("unbalanced ')'")
        cur += c
      } else if (c == sep && depth == 0) { out += cur.toString; cur.clear() }
      else cur += c
    }
    if (depth != 0) throw new ParseException("unbalanced '('")
    out += cur.toString
    out.toList.map(_.trim).filter(_.nonEmpty)
  }

  private def stagesOf(pipeline: String): List[String] =
    splitTop(pipeline, '|')

  /** splice macro references (a stage that is exactly a macro name)
    * with the macro's stage list, recursively with a cycle guard. */
  private def expand(stages: List[String],
                     macros: Map[String, List[String]],
                     depth: Int): List[String] = {
    if (depth > 16) throw new ParseException("macro recursion too deep")
    stages.flatMap { s =>
      macros.get(s.trim) match {
        case Some(body) => expand(body, macros, depth + 1)
        case None => List(s)
      }
    }
  }

  /** keyword args (`min:5`) of a token list → (map, positional rest) */
  private def kwArgs(args: List[String]): (Map[String, String], List[String]) = {
    val (kw, pos) = args.partition(a => a.matches("[A-Za-z_]+:.*"))
    (kw.map { a => val Array(k, v) = a.split(":", 2); k -> v }.toMap, pos)
  }

  /** Stages taking a nested `( pipeline )` argument (grammar.peg:40):
    * the nested pipeline evaluates independently (its own fetch, its
    * own macros/nesting), joins on the shared label columns +
    * bucket_s, and the values combine pointwise. */
  private val nestedOps = Set("divide", "asPercent")

  private def evalNested(op: String, rest: String, in: DataFrame,
                         samples: DataFrame,
                         macros: Map[String, List[String]]): DataFrame = {
    // the whole remainder must be ONE balanced ( pipeline ) group
    if (!rest.startsWith("("))
      throw new ParseException(s"$op takes a nested ( pipeline ) argument")
    var depth = 0
    var close = -1
    rest.zipWithIndex.foreach { case (c, i) =>
      if (close < 0) {
        if (c == '(') depth += 1
        else if (c == ')') { depth -= 1; if (depth == 0) close = i }
      }
    }
    if (close < 0) throw new ParseException("unbalanced '('")
    if (close != rest.length - 1)
      throw new ParseException(
        s"$op takes exactly one ( pipeline ) argument, got trailing " +
          s"'${rest.substring(close + 1).trim}'")
    val (right, _) =
      runPipeline(stagesOf(rest.substring(1, close)), samples, macros)
    val keys = labelsOf(in).intersect(labelsOf(right)) :+ "bucket_s"
    // the denominator rounds to 6 decimals BEFORE dividing — an
    // aggregate denominator is a float sum whose last ulp varies
    // with summation order (across engines AND across DuckDB thread
    // schedules), and an unrounded quotient then flips 6-decimal
    // midpoints; dividing rounded inputs makes the quotient
    // bit-identical everywhere (the marginMining discipline)
    val rr = right.select(keys.map(col) :+
      round(col("value"), 6).as("_rv"): _*)
    val q = when(col("_rv") =!= 0, col("value") / col("_rv") *
      (if (op == "asPercent") lit(100.0) else lit(1.0)))
    in.join(rr, keys).withColumn("value", q).drop("_rv")
  }

  private def evalStage(stage: String, acc: Option[DataFrame],
                        samples: DataFrame,
                        macros: Map[String, List[String]]): DataFrame = {
    val head = stage.takeWhile(c => !c.isWhitespace && c != '(')
    if (nestedOps(head)) {
      val in = acc.getOrElse(
        throw new ParseException(s"$head cannot start a pipeline"))
      return evalNested(head, stage.drop(head.length).trim, in,
        samples, macros)
    }
    val toks = stage.split("\\s+").toList
    (toks, acc) match {
      case ("fetch" :: args, None) =>
        val matchers = args.map { a =>
          a.split(":", 2) match {
            case Array(label, pattern) =>
              // Fetch.Re anchors internally (^(?:…)$), so the body is
              // passed unanchored; a non-regexed pattern stays an Eq
              // matcher unless it carries escapes (then the regex body
              // holds the unescaped literal semantics).
              // an invalid glob is a parse error here (the reference's
              // PEG pattern rule rejects it in the grammar), unlike the
              // graphite route where GlobException mirrors that API's
              // invalid-params response
              val (body, regexed) =
                try graft.graphite.Glob.toRegexFlagged(pattern)
                catch { case e: graft.graphite.Glob.GlobException =>
                  throw new ParseException(s"bad pattern '$pattern': ${e.getMessage}")
                }
              if (regexed || pattern.contains('\\'))
                Fetch.Matcher(label, Fetch.Re, body)
              else Fetch.Matcher(label, Fetch.Eq, pattern)
            case _ => throw new ParseException(s"bad matcher $a (label:pattern)")
          }
        }
        Vectors.instant(Fetch(samples, matchers))
      case ("fetch" :: _, Some(_)) =>
        throw new ParseException("fetch must be the first stage")
      case ("keepNaN" :: rest, Some(in)) if rest.forall(r => r == "true" || r == "false") =>
        in // the flag is read by query(); the stage itself is a no-op
      case ("percentile" :: qstr :: by, Some(in)) =>
        in.groupBy((by :+ "bucket_s").map(col): _*)
          .agg(percentile(col("value"), lit(numArg(qstr) / 100.0)).as("value"))
      case (("top" | "bottom") :: k :: by, Some(in)) =>
        val rest = labelsOf(in).filterNot(by.contains)
        val ord =
          (if (toks.head == "top") col("value").desc else col("value").asc) +:
            rest.map(col(_).asc)
        val w = Window.partitionBy((by :+ "bucket_s").map(col): _*).orderBy(ord: _*)
        in.withColumn("_rk", row_number().over(w))
          .where(col("_rk") <= intArg(k)).drop("_rk")
      case (op :: by, Some(in)) if aggOps(op) =>
        val agg: Column = op match {
          case "sum"    => sum("value")
          case "avg"    => avg("value")
          case "min"    => min("value")
          case "max"    => max("value")
          case "count"  => count(lit(1)).cast("double")
          case "stddev" => stddev_pop("value")
          case "median" => percentile(col("value"), lit(0.5))
        }
        in.groupBy((by :+ "bucket_s").map(col): _*).agg(agg.as("value"))
      case (op :: n :: Nil, Some(in)) if cmpOps(op) =>
        val v = col("value")
        val s = lit(numArg(n))
        in.where(op match {
          case "<" => v < s;  case "<=" => v <= s
          case ">" => v > s;  case ">=" => v >= s
          case "==" => v === s; case "!=" => v =!= s
        })
      case ("scale" :: k :: Nil, Some(in)) =>
        in.withColumn("value", col("value") * lit(numArg(k)))
      case ("offset" :: k :: Nil, Some(in)) =>
        in.withColumn("value", col("value") + lit(numArg(k)))
      case ("transformNull" :: rest, Some(in)) if rest.length <= 1 =>
        in.withColumn("value",
          coalesce(col("value"), lit(rest.headOption.map(numArg).getOrElse(0.0))))
      case ("clamp" :: args, Some(in)) =>
        val (kw, pos) = kwArgs(args)
        if (pos.nonEmpty) throw new ParseException(s"clamp takes min:/max: args, got $pos")
        val lo = kw.get("min").map(numArg)
        val hi = kw.get("max").map(numArg)
        val clamped = (lo, hi) match {
          case (Some(a), Some(b)) => least(greatest(col("value"), lit(a)), lit(b))
          case (Some(a), None) => greatest(col("value"), lit(a))
          case (None, Some(b)) => least(col("value"), lit(b))
          case _ => throw new ParseException("clamp needs min: and/or max:")
        }
        in.withColumn("value", clamped)
      case ("timeshift" :: s :: Nil, Some(in)) =>
        in.withColumn("bucket_s", col("bucket_s") + lit(longArg(s)))
      case (fn :: Nil, Some(in)) if fns(fn) =>
        val v = col("value")
        in.withColumn("value", fn match {
          case "abs" => abs(v)
          case "ceil" => ceil(v).cast("double")
          case "floor" => floor(v).cast("double")
          case "sqrt" => when(v >= 0, sqrt(v))
          case "exp" => exp(v)
          case "ln" => when(v > 0, log(v))
          case "log2" => when(v > 0, log2(v))
          case "log10" => when(v > 0, log10(v))
          case "sgn" => signum(v)
          case "neg" => -v
        })
      case (other, None) =>
        throw new ParseException(s"pipeline must start with fetch, got $other")
      case (other, _) =>
        throw new ParseException(s"unknown stage $other")
    }
  }
}
