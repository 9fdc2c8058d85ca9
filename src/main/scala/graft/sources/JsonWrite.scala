package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** JSON write-request ingestion — the Spark-native analogue of
  * m3coordinator's JSON write handler
  * (src/query/api/v1/handler/json/write.go `WriteQuery`/
  * `newWriteQuery`, src/query/util/timing.go `ParseTimeString`).
  *
  * One request per line: `{"tags": {...}, "timestamp": s, "value": v}`.
  * Reference semantics reproduced exactly:
  *   - timestamp is EITHER a float epoch-seconds string (fraction
  *     rounded to millisecond precision — timing.go:44-47 rounds the
  *     sub-second part at 1e-3 and the write unit is Millisecond)
  *     OR an RFC3339(Nano) literal (timing.go:50; nanos truncate to
  *     Spark's µs resolution);
  *   - the validator tags (write.go:74-76 `validate:"nonzero"`)
  *     reject missing/empty tags, a missing timestamp, and — a real
  *     quirk worth preserving — a value of exactly 0.0 (Go's zero
  *     value); such requests flag as malformed;
  *   - tags are stored verbatim (no charset rewriting — write.go:112
  *     `AddTag` directly, unlike the influx handler), with the
  *     metric name carried as the `__name__` tag per the m3/prom
  *     convention.
  *
  * Pure column algebra (`from_json` + guarded casts): runs unchanged
  * under `readStream`, like [[Carbon]] and [[InfluxLine]].
  */
object JsonWrite {

  private val SCHEMA = "tags map<string,string>, timestamp string, value double"
  private val FLOAT = "^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?$"

  /** Parse a frame of raw JSON lines into
    * (tags map<string,string>, ts timestamp, value double,
    * malformed boolean). */
  def parse(lines: DataFrame, lineCol: String = "line"): DataFrame = {
    lines
      .where(length(trim(col(lineCol))) > 0)
      .select(
        from_json(col(lineCol),
          org.apache.spark.sql.types.StructType.fromDDL(SCHEMA)).as("_p"))
      // stage the timestamp parse so the float-regex and try_cast
      // each evaluate once per row, not once per consumer
      .select(col("_p"),
        {
          val tsS = col("_p.timestamp")
          when(tsS.rlike(FLOAT),
            // float epoch seconds, fraction rounded to ms
            timestamp_millis(round(tsS.cast("double") * 1000, 0).cast("long")))
            .otherwise(expr("try_cast(_p.timestamp AS timestamp)"))
            .as("_ts")
        })
      .select(
        col("_p.tags").as("tags"),
        col("_ts").as("ts"),
        col("_p.value").as("value"),
        // always-true non-deterministic guard: stops downstream
        // filter pushdown from substituting the from_json tree into
        // the condition and re-parsing every line per consumer (same
        // plan blow-up as [[InfluxLine]]; see the note there)
        when(spark_partition_id() >= 0,
          col("_p").isNull ||
            col("_p.tags").isNull || size(map_keys(col("_p.tags"))) === 0 ||
            col("_ts").isNull ||
            col("_p.value").isNull || col("_p.value") === 0.0)
          .as("malformed"))
  }

  /** Well-formed rows consolidated per (`__name__`, requested tag
    * columns) at `unit` resolution — same hand-off as
    * [[InfluxLine.toSampleFrame]]. */
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
    val withTags = tagCols.foldLeft(
      parsed.where(!col("malformed"))
        .withColumn("name", expr("try_element_at(tags, '__name__')"))) {
      (df, t) => df.withColumn(t, expr(s"try_element_at(tags, '$t')"))
    }
    withTags
      .groupBy(col("name") +: tagCols.map(col) :+
        graft.tsdb.Vectors.bucketS(unit).as("bucket_s"): _*)
      .agg(agg.as("value"))
  }
}
