package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** InfluxDB line-protocol ingestion — the Spark-native analogue of
  * m3coordinator's influxdb write handler
  * (src/query/api/v1/handler/influxdb/write.go `populateFields`/
  * `Next`, rewrite.go `promRewriter`).
  *
  * Reference semantics reproduced exactly:
  *   - each point fans out to one series per field, named
  *     `measurement_fieldKey` (write.go:100-149), with the
  *     measurement+underscore sanitized by the metric rule (first
  *     char `[a-zA-Z_:]`, rest `[a-zA-Z0-9_:]`) and the field key by
  *     the metric-TAIL rule (`[a-zA-Z0-9_:]` throughout); invalid
  *     bytes become `_` (rewrite.go:32-58);
  *   - boolean fields → 1.0/0.0, integer (`i`) / unsigned (`u`)
  *     fields → float, float fields as-is; STRING fields are dropped
  *     without error (write.go:138-142 "drop them for now");
  *   - tag names are sanitized by the label rule (`[a-zA-Z_]` then
  *     `[a-zA-Z0-9_]`), values kept verbatim (write.go:163-167);
  *     duplicate tag names mark the point malformed (the reference's
  *     dupe check, write.go:173-182);
  *   - timestamps are nanoseconds since epoch (the handler's default
  *     precision); a missing/bad timestamp marks the line malformed
  *     (the HTTP handler would stamp server time — a batch parser
  *     has no deterministic "now", so it surfaces the line instead).
  *
  * Escapes: `\ `, `\,`, `\=` unescape inside measurement, tag
  * keys/values and field keys per the line-protocol grammar.
  *
  * Everything is pure column algebra (escape-aware lookbehind splits
  * + guarded casts), so the same transform runs unchanged under
  * `readStream` — the streaming write path, like [[Carbon]].
  */
object InfluxLine {

  // split on unescaped commas (the intra-segment separator). The
  // even-quotes lookahead keeps commas inside quoted string field
  // values intact ("a,b" stays one token); it rescans the segment
  // tail per candidate position, which is fine on short head/fields
  // SEGMENTS — segmenting the whole LINE this way is not (see the
  // anchored regex in parse). Escaped quotes inside string values
  // are out of scope — string fields are dropped either way.
  private val COMMA = "(?<!\\\\),(?=(?:[^\"]*\"[^\"]*\")*[^\"]*$)"
  // key=value with escaped '=' allowed inside the key
  private val KV = "^((?:[^=\\\\]|\\\\.)*)=(.*)$"
  private val TS = "^-?[0-9]+$"

  private def unescape(c: Column): Column =
    // escapes are rare — gate the regex behind a cheap contains so
    // the common path is a codegen'd no-op
    when(c.contains("\\"), regexp_replace(c, "\\\\([ ,=])", "$1"))
      .otherwise(c)

  /** first char from `headSet`, rest from `restSet`, invalid → `_`
    * (rewrite.go `regexpRewriter.rewrite`). */
  private def sanitize(c: Column, headSet: String, restSet: String): Column =
    concat(
      when(substring(c, 1, 1).rlike(s"^[$headSet]$$"), substring(c, 1, 1))
        .otherwise(lit("_")),
      regexp_replace(substring(c, 2, Int.MaxValue), s"[^$restSet]", "_"))

  private def sanMetricHead(c: Column) = sanitize(c, "a-zA-Z_:", "a-zA-Z0-9_:")
  private def sanMetricTail(c: Column) =
    regexp_replace(c, "[^a-zA-Z0-9_:]", "_")
  private def sanLabel(c: Column) = sanitize(c, "a-zA-Z_", "a-zA-Z0-9_")

  /** Parse a frame of raw lines into one row per (point, field):
    * (name, tags map<string,string>, ts timestamp, value double,
    * malformed boolean). String-valued fields are dropped (reference
    * behavior); malformed lines/fields survive with the flag set so
    * drops are meterable, never silent. */
  def parse(lines: DataFrame, lineCol: String = "line"): DataFrame = {
    val l = col(lineCol)

    // Escapes and quoted strings are RARE: lines without a backslash
    // or double quote (the overwhelming majority of real traffic)
    // segment with a trivial `split(" +")` and key/value on a plain
    // substring_index — all codegen'd string ops, zero regex. Only
    // complex lines fall back to the anchored linear-time regex
    // (disjoint alternation first-chars — no backtracking): head and
    // fields admit escaped separators, fields additionally quoted
    // strings, trailing timestamp optional so its absence FLAGS
    // instead of failing the whole match. (A per-candidate-position
    // quote-counting lookahead split profiled 40× slower at sf0.1 —
    // it rescans the line tail at every byte; and running even the
    // anchored regex on EVERY line profiled 4× the hybrid's cost.)
    val LINE = "^((?:[^ \\\\]|\\\\.)+) +((?:[^ \"\\\\]|\\\\.|\"[^\"]*\")+)(?: +([^ ]+))? *$"
    val simple = !l.contains("\\") && !l.contains("\"")
    val fastSegs = split(trim(l), " +")
    def fastSeg(i: Int): Column =
      when(size(fastSegs) >= i, element_at(fastSegs, i)).otherwise(lit(""))

    // stage 1: segments — each expression evaluates once per line
    val staged = lines
      .where(length(trim(l)) > 0)
      .select(
        when(simple, size(fastSegs) === 3).otherwise(l.rlike(LINE)).as("_m"),
        when(simple, fastSeg(1)).otherwise(regexp_extract(l, LINE, 1))
          .as("_head"),
        when(simple, fastSeg(2)).otherwise(regexp_extract(l, LINE, 2))
          .as("_fields"),
        when(simple, when(size(fastSegs) === 3, fastSeg(3)).otherwise(lit("")))
          .otherwise(regexp_extract(l, LINE, 3)).as("_tsS"),
        simple.as("_simple"))

    // stage 2: head → measurement + sanitized tag entries. The
    // entries array is built ONCE (each per-tag extraction runs a
    // single time); the dup-check and the map both derive from it.
    // Simple lines take the substring_index path inside the lambda —
    // interpreted either way (HOFs don't codegen) but string scans
    // beat regex matching several-fold.
    val headParts = when(col("_simple"), split(col("_head"), ","))
      .otherwise(split(col("_head"), COMMA))
    val tagParts = filter(
      slice(headParts, lit(2), greatest(size(headParts) - 1, lit(0))),
      _.isNotNull)
    def kvKey(p: Column): Column =
      when(col("_simple"), substring_index(p, "=", 1))
        .otherwise(unescape(regexp_extract(p, KV, 1)))
    def kvVal(p: Column): Column =
      when(col("_simple"),
        when(instr(p, "=") > 0, p.substr(instr(p, "=") + 1, length(p)))
          .otherwise(lit("")))
        .otherwise(unescape(regexp_extract(p, KV, 2)))
    val entries = transform(tagParts, p => struct(
      sanLabel(kvKey(p)).as("key"),
      kvVal(p).as("value")))
    val entriesStage = staged.select(
      col("_m"), col("_tsS"), col("_simple"),
      unescape(element_at(headParts, 1)).as("_meas"),
      entries.as("_ent"),
      forall(tagParts, _.contains("=")).as("_kvOk"),
      col("_fields"))

    // stage 2b: dup detection on the SANITIZED names (distinct raw
    // keys can collide after charset rewriting and must still flag);
    // map_from_entries throws on duplicate keys, so it is guarded —
    // a dup-tagged point must flag as malformed, not error out
    val tagsOk = col("_kvOk") &&
      size(array_distinct(transform(col("_ent"), _.getField("key")))) ===
        size(col("_ent"))
    val tsOk = col("_m") && col("_tsS").rlike(TS)
    val exploded = entriesStage.select(
      col("_meas"),
      when(tagsOk, map_from_entries(col("_ent"))).as("_tags"),
      when(tsOk,
        timestamp_micros((col("_tsS").cast("long") / 1000).cast("long")))
        .as("_ts"),
      (col("_m") && length(col("_meas")) > 0 && tagsOk && tsOk).as("_ok"),
      col("_simple"),
      explode_outer(
        when(col("_simple"), split(col("_fields"), ","))
          .otherwise(split(col("_fields"), COMMA))).as("_f"))

    // stage 3: field key/value — extracted once, then classified
    // with codegen'd cast/equality ops instead of a regex battery
    // (the rlike version profiled 2× the whole parse cost)
    val kvStage = exploded.select(
      col("_meas"), col("_tags"), col("_ts"), col("_ok"), col("_f"),
      kvKey(col("_f")).as("_fk"),
      kvVal(col("_f")).as("_fv"))

    val v = col("_fv")
    // try_cast accepts nan/inf spellings influx rejects — screen them
    // with cheap equality, not a regex
    val specials = upper(v).isin("NAN", "-NAN", "INF", "+INF", "-INF",
      "INFINITY", "+INFINITY", "-INFINITY")
    val asFloat = when(!specials, expr("try_cast(_fv AS double)"))
    val intBody = expr(
      "try_cast(substring(_fv, 1, length(_fv) - 1) AS bigint)")
    val noFloatMarks =
      !v.contains(".") && !v.contains("e") && !v.contains("E")
    val asInt = when(v.endsWith("i") && noFloatMarks, intBody.cast("double"))
    val asUint = when(v.endsWith("u") && noFloatMarks &&
      !v.startsWith("+") && !v.startsWith("-"), intBody.cast("double"))
    val isStr = v.startsWith("\"") && v.endsWith("\"") && length(v) >= 2
    kvStage.select(
      concat(sanMetricHead(concat(col("_meas"), lit("_"))),
        sanMetricTail(unescape(col("_fk")))).as("name"),
      col("_tags").as("tags"),
      col("_ts").as("ts"),
      col("_ok"),
      coalesce(asFloat, asInt, asUint,
        when(v.isin("t", "T", "true", "True", "TRUE"), 1.0),
        when(v.isin("f", "F", "false", "False", "FALSE"), 0.0))
        .as("value"),
      isStr.as("_isStr"))
      .select(col("name"), col("tags"), col("ts"), col("value"),
        // the always-true spark_partition_id() guard marks the flag
        // non-deterministic, which stops PushDownPredicates from
        // substituting this projection's alias chain into downstream
        // filters — that substitution duplicated the parse tree
        // combinatorially (199 regexp_extract nodes in the pushed
        // plan, 5× the runtime; profiled at sf0.1: 10.2 s → 2.1 s)
        when(spark_partition_id() >= 0,
          !col("_ok") ||
            (col("value").isNull && !coalesce(col("_isStr"), lit(false))))
          .as("malformed"),
        col("_isStr"))
      // reference drops string fields silently (write.go:138-142) —
      // they are well-formed, just not ingestible as samples
      .where(col("malformed") || !coalesce(col("_isStr"), lit(false)))
      .drop("_isStr")
  }

  /** Well-formed rows consolidated per (name, requested tag columns)
    * at `unit` resolution — the hand-off into the tsdb operator
    * surface. Tags are pulled out of the map into plain columns so
    * downstream grouping is codegen'd column equality, not map
    * lookups. */
  def toSampleFrame(parsed: DataFrame, tagCols: Seq[String],
                    how: String = "avg", unit: String = "hour"): DataFrame = {
    val agg: Column = how match {
      case "avg"   => avg("value")
      case "sum"   => sum("value")
      case "min"   => min("value")
      case "max"   => max("value")
      case "count" => count(lit(1)).cast("double")
      case h => throw new IllegalArgumentException(s"unknown consolidation $h")
    }
    // try_element_at: a missing tag is a null column, not an ANSI
    // MAP_KEY error
    val withTags = tagCols.foldLeft(parsed.where(!col("malformed"))) {
      (df, t) => df.withColumn(t, expr(s"try_element_at(tags, '$t')"))
    }
    withTags
      .groupBy(col("name") +: tagCols.map(col) :+
        graft.tsdb.Vectors.bucketS(unit).as("bucket_s"): _*)
      .agg(agg.as("value"))
  }
}
