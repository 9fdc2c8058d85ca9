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

  // split on unescaped space runs / commas (line-protocol
  // separators). The even-quotes lookahead keeps separators inside
  // quoted string field values intact ("hi there" stays one token);
  // escaped quotes inside string values are out of scope — string
  // fields are dropped either way, this only protects the rest of
  // the line's tokenization.
  private val SP = "(?<!\\\\) +(?=(?:[^\"]*\"[^\"]*\")*[^\"]*$)"
  private val COMMA = "(?<!\\\\),(?=(?:[^\"]*\"[^\"]*\")*[^\"]*$)"
  // key=value with escaped '=' allowed inside the key
  private val KV = "^((?:[^=\\\\]|\\\\.)*)=(.*)$"
  private val FLOAT = "^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?$"
  private val INT = "^[+-]?[0-9]+i$"
  private val UINT = "^[0-9]+u$"
  private val TRUE = "^(t|T|true|True|TRUE)$"
  private val FALSE = "^(f|F|false|False|FALSE)$"
  private val STRING = "^\".*\"$"
  private val TS = "^-?[0-9]+$"

  private def unescape(c: Column): Column =
    regexp_replace(c, "\\\\([ ,=])", "$1")

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
    val segs = split(l, SP)

    // ANSI mode: element_at beyond the array bound THROWS — a short
    // malformed line must flag, not kill the ingest job, so every
    // positional access is size-guarded (scalacheck-fuzzed in
    // PropertySpec)
    def seg(i: Int): Column =
      when(size(segs) >= i, element_at(segs, i))
    val headParts = split(seg(1), COMMA)
    val meas = unescape(element_at(headParts, 1))
    val tagParts = filter(
      slice(headParts, lit(2), greatest(size(headParts) - 1, lit(0))),
      _.isNotNull)
    // dup detection on the SANITIZED names: distinct raw keys can
    // collide after charset rewriting and must still flag
    val tagKeys = transform(tagParts,
      p => sanLabel(unescape(regexp_extract(p, KV, 1))))
    val tagsOk = size(tagParts) === 0 ||
      (forall(tagParts, _.rlike(KV)) &&
        size(array_distinct(tagKeys)) === size(tagParts))
    // guarded by tagsOk: map_from_entries throws on duplicate keys,
    // and a dup-tagged point must flag as malformed, not error out
    val tags = when(tagsOk,
      map_from_entries(transform(tagParts, p => struct(
        sanLabel(unescape(regexp_extract(p, KV, 1))).as("key"),
        unescape(regexp_extract(p, KV, 2)).as("value")))))

    val tsS = seg(3)
    val tsOk = size(segs) === 3 && tsS.rlike(TS)

    val lineOk = size(segs) === 3 && length(meas) > 0 && tagsOk && tsOk

    lines
      .where(length(trim(l)) > 0)
      .select(l.as("_line"), meas.as("_meas"), tags.as("_tags"),
        when(tsOk, timestamp_micros((tsS.cast("long") / 1000).cast("long")))
          .as("_ts"),
        lineOk.as("_ok"),
        explode_outer(split(seg(2), COMMA)).as("_f"))
      .select(
        concat(sanMetricHead(concat(col("_meas"), lit("_"))),
          sanMetricTail(unescape(regexp_extract(col("_f"), KV, 1))))
          .as("name"),
        col("_tags").as("tags"),
        col("_ts").as("ts"),
        {
          val v = regexp_extract(col("_f"), KV, 2)
          when(v.rlike(FLOAT), v.cast("double"))
            .when(v.rlike(INT) || v.rlike(UINT), // strip the i/u suffix
              v.substr(lit(1), length(v) - 1).cast("double"))
            .when(v.rlike(TRUE), lit(1.0))
            .when(v.rlike(FALSE), lit(0.0))
            .as("value")
        },
        {
          val v = regexp_extract(col("_f"), KV, 2)
          val fieldOk = col("_f").isNotNull && col("_f").rlike(KV) &&
            (v.rlike(FLOAT) || v.rlike(INT) || v.rlike(UINT) ||
              v.rlike(TRUE) || v.rlike(FALSE) || v.rlike(STRING))
          (!col("_ok") || !fieldOk).as("malformed")
        })
      // reference drops string fields silently (write.go:138-142) —
      // they are well-formed, just not ingestible as samples
      .where(col("malformed") ||
        !regexp_extract(col("_f"), KV, 2).rlike(STRING))
      .drop("_line", "_meas", "_f", "_ok")
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
