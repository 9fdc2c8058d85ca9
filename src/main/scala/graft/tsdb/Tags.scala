package graft.tsdb

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tag manipulation — the m3 `tag` function family (reference:
  * src/query/functions/tag/join.go, replace.go). Labels are columns,
  * so these are pure column ops (no shuffle, codegen-friendly).
  */
object Tags {

  /** A source label that is absent from the frame (e.g. aggregated
    * away by an enclosing `max(...)`) reads as the EMPTY string —
    * upstream evaluates the regex/join against "" for missing
    * labels, it never errors (the r12 fuzz find: referencing the
    * missing column was an AnalysisException). */
  private def srcCol(in: DataFrame, c: String) =
    if (in.columns.contains(c)) col(c).cast("string") else lit("")

  /** label_join(v, dst, sep, src…) (tag/join.go:35): dst := the
    * values of src labels joined with sep. */
  def labelJoin(instant: DataFrame, dst: String, sep: String,
                src: Seq[String]): DataFrame =
    instant.withColumn(dst,
      concat_ws(sep, src.map(srcCol(instant, _)): _*))

  /** label_replace(v, dst, replacement, src, regex)
    * (tag/replace.go:35): if src matches regex, dst := replacement
    * with capture groups expanded; else dst keeps its value (empty
    * when absent). Uses java regex in Spark / RE2-compatible pattern
    * subset so the oracle regexp agrees. */
  def labelReplace(instant: DataFrame, dst: String, replacement: String,
                   src: String, regex: String): DataFrame = {
    val s = srcCol(instant, src)
    instant.withColumn(dst,
      when(s.rlike(regex), regexp_replace(s, regex, replacement))
        .otherwise(lit("")))
  }
}
