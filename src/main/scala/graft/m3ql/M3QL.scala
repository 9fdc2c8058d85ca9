package graft.m3ql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.tsdb.{Fetch, SeriesAgg, Vectors}

/** Minimal M3QL front-end — the reference's third query language
  * (src/query/parser/m3ql/grammar.peg: a pipeline of stages joined
  * by `|`, e.g. `fetch name:foo.bar | sum region | >= 5`).
  *
  * Supported stage set:
  * {{{
  *   pipeline := stage ("|" stage)*
  *   stage    := "fetch" (label ":" pattern)+      glob patterns, * in-segment
  *             | aggOp label*                      sum avg min max count, BY kept labels
  *             | cmpOp number                      < <= > >= == != on value
  *             | fn                                abs ceil floor sqrt
  * }}}
  *
  * `fetch` evaluates to the day-instant frame of the matched series;
  * downstream stages transform (labels…, bucket_s, value).
  */
object M3QL {

  final class ParseException(msg: String) extends IllegalArgumentException(msg)

  private val aggOps = Set("sum", "avg", "min", "max", "count")
  private val fns = Set("abs", "ceil", "floor", "sqrt")
  private val cmpOps = Set("<", "<=", ">", ">=", "==", "!=")

  /** glob pattern → anchored regex (`*` matches within a segment,
    * per the graphite-style patterns m3ql uses). */
  private def globRe(glob: String): String =
    "^" + glob.split("\\.", -1).map(_.replace("*", "[^.]*")).mkString("\\.") + "$"

  def query(samples: DataFrame, q: String): DataFrame =
    q.split("\\|").map(_.trim).filter(_.nonEmpty)
      .foldLeft(Option.empty[DataFrame]) { (acc, stage) =>
        Some(evalStage(stage, acc, samples))
      }
      .getOrElse(throw new ParseException("empty pipeline"))

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
      case (op :: by, Some(in)) if aggOps(op) =>
        val agg: Column = op match {
          case "sum"   => sum("value")
          case "avg"   => avg("value")
          case "min"   => min("value")
          case "max"   => max("value")
          case "count" => count(lit(1)).cast("double")
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
      case (fn :: Nil, Some(in)) if fns(fn) =>
        val v = col("value")
        in.withColumn("value", fn match {
          case "abs" => abs(v)
          case "ceil" => ceil(v).cast("double")
          case "floor" => floor(v).cast("double")
          case "sqrt" => sqrt(v)
        })
      case (other, None) =>
        throw new ParseException(s"pipeline must start with fetch, got $other")
      case (other, _) =>
        throw new ParseException(s"unknown stage $other")
    }
  }
}
