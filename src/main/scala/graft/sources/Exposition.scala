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
    // ---- single-execution line match (r13) ----
    // rlike + 4 regexp_extract each re-ran the anchored LINE regex —
    // five executions per line. One regexp_replace run emits every
    // group NUL-joined instead (an anchored match consumes the whole
    // line, a non-participating optional group substitutes "", and an
    // unmatched line comes back unchanged — so `4 parts` ⟺ matched,
    // exactly rlike). NUL can't collide with content on the guarded
    // path: a line CONTAINING a NUL byte (not printable exposition
    // text, same stance as the U+0001/U+0002 masks) falls back to the
    // original per-group extraction.
    val SEP = "\u0000"
    // stage 0: the ONE regex execution per line, staged as its own
    // attribute — inlining it into the five consumers would re-run
    // it per consumer (the exact duplication this replaces; explicit
    // staging instead of trusting conditional-branch subexpression
    // elimination). CollapseProject keeps the stages apart: the
    // aliases are referenced more than once and are not cheap.
    val staged0 = lines
      .where(length(l) > 0 && !l.startsWith("#"))
      .select(
        l.as("_l"),
        split(regexp_replace(l, LINE, s"$$1$SEP$$2$SEP$$3$SEP$$4"),
          SEP, -1).as("_parts"),
        l.contains(SEP).as("_hasSep"))
    val staged1 = staged0.select(
      col("_l"), col("_parts"), col("_hasSep"),
      when(col("_hasSep"), col("_l").rlike(LINE))
        .otherwise(size(col("_parts")) === 4).as("_m"))
    def part(i: Int): Column =
      when(col("_hasSep"), regexp_extract(col("_l"), LINE, i + 1))
        .otherwise(when(col("_m"), get(col("_parts"), lit(i)))
          .otherwise(lit("")))
    val staged = staged1.select(
      col("_m"),
      part(0).as("_name"),
      mask(part(1)).as("_body"),
      part(2).as("_valS"),
      part(3).as("_tsS"))
    // ---- labels: ONE LABEL-regex execution per segment (r13) ----
    // rlike (in the forall) + 2 regexp_extract ran the LABEL regex
    // three times per segment; the same NUL-join trick runs it once,
    // with the per-segment match carried as a third struct field so
    // labelsOk derives from the already-built array. The masked body
    // cannot contain NUL (only U+0001/U+0002 masks), so SEP is safe.
    val segs = filter(split(col("_body"), COMMA), s => trim(s) =!= "")
    // chain two transforms so the replaced string binds ONCE per
    // segment (a lambda has no aliasing — referencing the
    // regexp_replace from three consumers would re-run it three
    // times, i.e. exactly the cost this removes)
    val withRep = transform(segs, s => {
      val t0 = trim(s)
      struct(t0.as("t"),
        regexp_replace(t0, LABEL, s"$$1$SEP$$2").as("r"))
    })
    val tagged = transform(withRep, e => {
      val t0 = e.getField("t")
      val lrep = e.getField("r")
      // a segment carrying a raw NUL (possible only on the line-level
      // fallback path) keeps the original per-group extraction — the
      // join trick's separator would split inside the value
      val segHasSep = t0.contains(SEP)
      val okFast = lrep.contains(SEP)
      val ok = when(segHasSep, t0.rlike(LABEL)).otherwise(okFast)
      struct(
        when(segHasSep, regexp_extract(t0, LABEL, 1))
          .otherwise(when(okFast, substring_index(lrep, SEP, 1))
            .otherwise(lit(""))).as("tag_name"),
        unescape(when(segHasSep, regexp_extract(t0, LABEL, 2))
          .otherwise(when(okFast, substring_index(lrep, SEP, -1))
            .otherwise(lit("")))).as("tag_value"),
        ok.as("_ok"))
    })
    val scanned = staged.select(
      col("_m"), col("_name"), col("_valS"), col("_tsS"),
      tagged.as("_tagged"),
      lower(col("_valS")).as("_lv"),
      // FLOAT runs once per line instead of once per consuming branch
      col("_valS").rlike(FLOAT).as("_vOk"))
    val labelsOk = forall(col("_tagged"), _.getField("_ok"))
    val valOk = col("_lv").isin("nan", "inf", "+inf", "-inf") ||
      col("_vOk")
    scanned.select(
      col("_name").as("name"),
      transform(col("_tagged"), t => struct(
        t.getField("tag_name").as("tag_name"),
        t.getField("tag_value").as("tag_value"))).as("tags"),
      when(col("_lv") === "nan", lit(Double.NaN))
        .when(col("_lv").isin("inf", "+inf"), lit(Double.PositiveInfinity))
        .when(col("_lv") === "-inf", lit(Double.NegativeInfinity))
        .when(col("_vOk"), col("_valS").cast("double"))
        .as("value"),
      when(col("_tsS") =!= "", timestamp_millis(col("_tsS").cast("long")))
        .as("ts"),
      // non-deterministic guard: keeps the parse regexes from being
      // substituted into downstream filters (the [[InfluxLine]]
      // plan-blow-up defense)
      when(spark_partition_id() >= 0, !col("_m") || !valOk || !labelsOk)
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
