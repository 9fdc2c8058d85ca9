package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Prometheus text exposition-format ingestion — the scrape-side
  * twin of [[PromWrite]]'s remote-write frame. m3 consumes this
  * format indirectly (every Prometheus feeding m3 remote-write was
  * itself scraping it), and the coordinator's own /metrics endpoint
  * emits it; parsing it makes scrape archives / federation dumps a
  * first-class batch source.
  *
  * Grammar (the published text-format spec, Go parser semantics):
  *   - `# HELP` / `# TYPE` / any `#` comment line and blank lines
  *     are skipped without counting;
  *   - sample lines are `name{k="v",…} value [timestamp-ms]` with
  *     the label section optional, a trailing comma inside `{}`
  *     legal, metric names `[a-zA-Z_:][a-zA-Z0-9_:]*`, label names
  *     `[a-zA-Z_][a-zA-Z0-9_]*`;
  *   - label values are double-quoted with `\\`, `\"`, `\n` escapes
  *     (unescaped on output);
  *   - values are Go ParseFloat: decimals/exponents plus `NaN`,
  *     `Inf`, `+Inf`, `-Inf` (any case);
  *   - timestamps are MILLISECONDS since epoch and optional — a
  *     sample without one is stamped at scrape time by a live
  *     Prometheus, which a batch parser cannot know, so it carries
  *     a NULL ts (legal, not malformed) and consolidation drops it;
  *   - anything else marks the line malformed — dropped but
  *     counted, never silently swallowed (the [[Carbon]] stance).
  *
  * The label-section regex is greedy to the LAST `}` on the line,
  * which is exact because values/timestamps can never contain `}`
  * while quoted label values may. Comma-splitting labels first MASKS
  * the two backslash escapes (backslash-backslash to U+0001,
  * backslash-quote to U+0002) so the even-quotes comma lookahead
  * (shared with [[InfluxLine]]) only ever sees real string-delimiting
  * quotes — linear passes, no backtracking tokenizer — and the
  * masks unmask after extraction. (Raw U+0001/U+0002 bytes inside a
  * label value would confuse the mask; they are not printable
  * exposition text.)
  *
  * Everything is pure column algebra, so the transform runs
  * unchanged under `readStream` for a live scrape-tail.
  */
object Exposition {

  // separators are runs of spaces OR tabs (the Go scanner accepts
  // both between tokens)
  private val LINE = "^([a-zA-Z_:][a-zA-Z0-9_:]*)(?:\\{(.*)\\})?" +
    "[ \\t]+([^ \\t]+)(?:[ \\t]+(-?[0-9]+))?[ \\t]*$"
  private val COMMA = ",(?=(?:[^\"]*\"[^\"]*\")*[^\"]*$)"
  private val LABEL = "^([a-zA-Z_][a-zA-Z0-9_]*)=\"(.*)\"$"
  private val FLOAT =
    "^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?$"

  private val MaskBackslash = "\u0001"
  private val MaskQuote = "\u0002"

  // the escape masks: applied to the label BODY before comma/label
  // splitting so every remaining quote is a real string delimiter
  private def mask(c: Column): Column =
    when(c.contains("\\"),
      regexp_replace(regexp_replace(c, "\\\\\\\\", MaskBackslash),
        "\\\\\"", MaskQuote))
      .otherwise(c)

  // unmask + the remaining \n escape (real backslashes are masked,
  // so any surviving backslash-n IS the escape, never content)
  private def unescape(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c,
      "\\\\n", "\n"), MaskQuote, "\""), MaskBackslash, "\\\\")

  /** Parse a frame of raw exposition lines into
    * (name, tags array<struct<tag_name,tag_value>>, value double,
    * ts timestamp nullable, malformed boolean). Comments and blank
    * lines are dropped before the malformed flag is computed, so
    * `where(col("malformed"))`.count meters true parse failures only. */
  def parse(lines: DataFrame, lineCol: String = "line"): DataFrame = {
    val l = trim(col(lineCol))
    val matched = l.rlike(LINE)
    val name = regexp_extract(l, LINE, 1)
    val body = mask(regexp_extract(l, LINE, 2))
    val valS = regexp_extract(l, LINE, 3)
    val tsS = regexp_extract(l, LINE, 4)
    val segs = filter(split(body, COMMA), s => trim(s) =!= "")
    val labelsOk = forall(segs, s => trim(s).rlike(LABEL))
    val valOk = lower(valS).isin("nan", "inf", "+inf", "-inf") ||
      valS.rlike(FLOAT)
    val tags = transform(segs, s => struct(
      regexp_extract(trim(s), LABEL, 1).as("tag_name"),
      unescape(regexp_extract(trim(s), LABEL, 2)).as("tag_value")))
    lines
      .where(length(l) > 0 && !l.startsWith("#"))
      .select(
        name.as("name"),
        tags.as("tags"),
        when(lower(valS) === "nan", lit(Double.NaN))
          .when(lower(valS).isin("inf", "+inf"),
            lit(Double.PositiveInfinity))
          .when(lower(valS) === "-inf", lit(Double.NegativeInfinity))
          .when(valS.rlike(FLOAT), valS.cast("double"))
          .as("value"),
        when(tsS =!= "", timestamp_millis(tsS.cast("long"))).as("ts"),
        // non-deterministic guard: keeps the parse regexes from being
        // substituted into downstream filters (the [[InfluxLine]]
        // plan-blow-up defense)
        when(spark_partition_id() >= 0, !matched || !valOk || !labelsOk)
          .as("malformed"))
  }

  /** Well-formed, timestamped samples consolidated to an hourly
    * (name, tag-value-of `key`, bucket_s, value) frame — the
    * hand-off into the tsdb query surface. Consolidation is `avg`
    * (order-free) like [[Carbon.toPathFrame]]. */
  def toSeriesFrame(parsed: DataFrame, key: String): DataFrame = {
    val kv = filter(col("tags"), t => t.getField("tag_name") === key)
    parsed
      .where(!col("malformed") && col("ts").isNotNull)
      .withColumn("_kv", kv)
      .where(size(col("_kv")) === 1)
      .select(col("name"),
        element_at(col("_kv"), 1).getField("tag_value").as(key),
        graft.tsdb.Vectors.bucketS("hour").as("bucket_s"),
        col("value"))
      .groupBy("name", key, "bucket_s")
      .agg(avg("value").as("value"))
  }
}
