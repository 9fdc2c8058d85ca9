package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Carbon (Graphite plaintext) line-protocol ingestion — the
  * Spark-native analogue of m3coordinator's carbon ingest path
  * (src/metrics/carbon/parser.go `Parse`/`ParsePacket`;
  * src/cmd/services/m3coordinator/ingest/carbon/ingest.go).
  *
  * Line grammar per the reference parser: `name value epoch-seconds`
  * — runs of spaces tolerated BETWEEN fields, none before the name
  * or after the timestamp; `nan`/`-nan` (any case) parse to NaN;
  * anything else unparseable marks the line malformed (the
  * reference's malformed counter — dropped but counted, never
  * silently swallowed); lines of length ≤ 1 are skipped without
  * counting, matching `parsePacket`'s `(i - prevIdx) > 1` guard.
  *
  * Everything is pure column algebra (anchored regex + guarded
  * casts — the cast only evaluates on branch match, so ANSI mode
  * never throws), which means the same transform runs unchanged
  * under `readStream` on a socket/file source for the streaming
  * ingest path.
  */
object Carbon {

  private val lineRe = "^([^ ]+) +([^ ]+) +([^ ]+)$"
  private val floatRe = "^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?$"
  private val intRe = "^[+-]?[0-9]+$"

  /** Parse a frame of raw lines into
    * (path, ts timestamp, value double, malformed boolean).
    * Well-formed rows have malformed = false; keep the flag frame to
    * meter drops (`where(col("malformed"))`.count is the reference's
    * malformed counter). */
  def parse(lines: DataFrame, lineCol: String = "line"): DataFrame = {
    val l = col(lineCol)
    val name = regexp_extract(l, lineRe, 1)
    val valS = regexp_extract(l, lineRe, 2)
    val tsS = regexp_extract(l, lineRe, 3)
    val valOk = lower(valS).isin("nan", "-nan") || valS.rlike(floatRe)
    val tsOk = tsS.rlike(intRe)
    val matched = l.rlike(lineRe)
    lines
      .where(length(l) > 1) // parsePacket skips empty/1-char lines
      .select(
        name.as("path"),
        when(tsOk, timestamp_seconds(tsS.cast("long"))).as("ts"),
        when(lower(valS).isin("nan", "-nan"), lit(Double.NaN))
          .when(valS.rlike(floatRe), valS.cast("double"))
          .as("value"),
        // always-true non-deterministic guard: stops downstream
        // filter pushdown from substituting the parse regexes into
        // consumers' conditions (the plan-tree blow-up documented in
        // [[InfluxLine]] — here defensive: toPathFrame is the only
        // in-repo consumer and its filter stays above this projection)
        when(spark_partition_id() >= 0, !matched || !valOk || !tsOk)
          .as("malformed"))
  }

  /** Well-formed lines consolidated to an hourly graphite path frame
    * (path, bucket_s, value) — the hand-off into the
    * [[graft.graphite.Graphite]] function library. Carbon lines
    * carry second-resolution timestamps and no arrival order, so the
    * default consolidation is `avg` (order-free); `min`/`max`/`sum`/
    * `count` are equally deterministic. */
  def toPathFrame(parsed: DataFrame, how: String = "avg",
                  unit: String = "hour"): DataFrame = {
    val agg: Column = how match {
      case "avg"   => avg("value")
      case "sum"   => sum("value")
      case "min"   => min("value")
      case "max"   => max("value")
      case "count" => count(lit(1)).cast("double")
      case h => throw new IllegalArgumentException(s"unknown consolidation $h")
    }
    parsed
      .where(!col("malformed"))
      .groupBy(col("path"),
        graft.tsdb.Vectors.bucketS(unit).as("bucket_s"))
      .agg(agg.as("value"))
  }
}
