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
  *             | macroName                       splices the macro
  * }}}
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

  /** glob pattern → anchored regex (`*` matches within a segment,
    * per the graphite-style patterns m3ql uses). */
  private def globRe(glob: String): String =
    "^" + glob.split("\\.", -1).map(_.replace("*", "[^.]*")).mkString("\\.") + "$"

  private def labelsOf(df: DataFrame): Seq[String] =
    df.columns.toSeq.filterNot(Set("bucket_s", "value", "ts", "event_id"))

  def query(samples: DataFrame, q: String): DataFrame = {
    // macro definitions: `name = pipeline ; … ; main-pipeline`
    val parts = q.split(";").map(_.trim).filter(_.nonEmpty)
    val (defs, mains) = parts.partition(_.matches("^[A-Za-z_][A-Za-z0-9_]*\\s*=.*"))
    if (mains.length != 1)
      throw new ParseException(s"expected exactly one main pipeline, got ${mains.length}")
    val macros = defs.map { d =>
      val Array(name, body) = d.split("=", 2)
      name.trim -> stagesOf(body)
    }.toMap
    val stages = expand(stagesOf(mains.head), macros, depth = 0)
    val result = stages
      .foldLeft(Option.empty[DataFrame]) { (acc, stage) =>
        Some(evalStage(stage, acc, samples))
      }
      .getOrElse(throw new ParseException("empty pipeline"))
    // m3's KeepNaNs result option: null points drop from the response
    // unless the pipeline carries `keepNaN` (api/v1/.../common.go:278)
    if (stages.exists(_.split("\\s+").headOption.contains("keepNaN"))) result
    else result.where(col("value").isNotNull)
  }

  private def stagesOf(pipeline: String): List[String] =
    pipeline.split("\\|").map(_.trim).filter(_.nonEmpty).toList

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

  private def evalStage(stage: String, acc: Option[DataFrame],
                        samples: DataFrame): DataFrame = {
    val toks = stage.split("\\s+").toList
    (toks, acc) match {
      case ("fetch" :: args, None) =>
        val matchers = args.map { a =>
          a.split(":", 2) match {
            case Array(label, pattern) =>
              if (pattern.contains("*"))
                Fetch.Matcher(label, Fetch.Re, globRe(pattern).drop(1).dropRight(1))
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
          .agg(percentile(col("value"), lit(qstr.toDouble / 100.0)).as("value"))
      case (("top" | "bottom") :: k :: by, Some(in)) =>
        val rest = labelsOf(in).filterNot(by.contains)
        val ord =
          (if (toks.head == "top") col("value").desc else col("value").asc) +:
            rest.map(col(_).asc)
        val w = Window.partitionBy((by :+ "bucket_s").map(col): _*).orderBy(ord: _*)
        in.withColumn("_rk", row_number().over(w))
          .where(col("_rk") <= k.toInt).drop("_rk")
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
        val s = lit(n.toDouble)
        in.where(op match {
          case "<" => v < s;  case "<=" => v <= s
          case ">" => v > s;  case ">=" => v >= s
          case "==" => v === s; case "!=" => v =!= s
        })
      case ("scale" :: k :: Nil, Some(in)) =>
        in.withColumn("value", col("value") * lit(k.toDouble))
      case ("offset" :: k :: Nil, Some(in)) =>
        in.withColumn("value", col("value") + lit(k.toDouble))
      case ("transformNull" :: rest, Some(in)) if rest.length <= 1 =>
        in.withColumn("value",
          coalesce(col("value"), lit(rest.headOption.map(_.toDouble).getOrElse(0.0))))
      case ("clamp" :: args, Some(in)) =>
        val (kw, pos) = kwArgs(args)
        if (pos.nonEmpty) throw new ParseException(s"clamp takes min:/max: args, got $pos")
        val lo = kw.get("min").map(_.toDouble)
        val hi = kw.get("max").map(_.toDouble)
        val clamped = (lo, hi) match {
          case (Some(a), Some(b)) => least(greatest(col("value"), lit(a)), lit(b))
          case (Some(a), None) => greatest(col("value"), lit(a))
          case (None, Some(b)) => least(col("value"), lit(b))
          case _ => throw new ParseException("clamp needs min: and/or max:")
        }
        in.withColumn("value", clamped)
      case ("timeshift" :: s :: Nil, Some(in)) =>
        in.withColumn("bucket_s", col("bucket_s") + lit(s.toLong))
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
