package graft.sources

import graft.Materialize.MatOps

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
    // lineRe is exactly "three space-separated non-empty runs":
    // split(" +") with a non-empty first and last segment is the same
    // predicate (split keeps a leading/trailing empty segment when
    // the line starts/ends with a space, so those reject identically)
    // — a codegen'd string scan per line instead of FIVE executions
    // of the anchored regex (rlike + 3 extracts evaluated twice each
    // through the value/malformed branches; profiled in r13)
    // stage 0: the split, evaluated ONCE and staged as an attribute
    // (inlined, it would re-run per consuming column); stage 1: the
    // match; stage 2: the segments (regexp_extract returned "" on a
    // non-matching line — the otherwise("") keeps every downstream
    // branch byte-identical). CollapseProject keeps the stages apart:
    // the aliases are referenced more than once and are not cheap.
    val staged0 = lines
      .where(length(l) > 1) // parsePacket skips empty/1-char lines
      .select(split(l, " +").as("_segs"))
    val sg = col("_segs")
    val staged1 = staged0.select(sg,
      (size(sg) === 3 &&
        get(sg, lit(0)) =!= "" && get(sg, lit(2)) =!= "").as("_m"))
    val staged = staged1.select(
      col("_m"),
      when(col("_m"), get(sg, lit(0))).otherwise(lit("")).as("_name"),
      when(col("_m"), get(sg, lit(1))).otherwise(lit("")).as("_valS"),
      when(col("_m"), get(sg, lit(2))).otherwise(lit("")).as("_tsS"))
    val isNan = lower(col("_valS")).isin("nan", "-nan")
    val scanned = staged.select(
      col("_m"), col("_name"), col("_valS"), col("_tsS"),
      isNan.as("_isnan"),
      // the float/int regexes run ONCE per line here instead of once
      // per consuming branch
      col("_valS").rlike(floatRe).as("_vOk"),
      col("_tsS").rlike(intRe).as("_tsOk"))
    scanned.select(
      col("_name").as("path"),
      when(col("_tsOk"), timestamp_seconds(col("_tsS").cast("long")))
        .as("ts"),
      when(col("_isnan"), lit(Double.NaN))
        .when(col("_vOk"), col("_valS").cast("double"))
        .as("value"),
      // always-true non-deterministic guard: stops downstream
      // filter pushdown from substituting the parse regexes into
      // consumers' conditions (the plan-tree blow-up documented in
      // [[InfluxLine]] — here defensive: toPathFrame is the only
      // in-repo consumer and its filter stays above this projection)
      when(spark_partition_id() >= 0,
        !col("_m") || !(col("_isnan") || col("_vOk")) || !col("_tsOk"))
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

  /** The carbon ingester's opt-in path cleanup (ingest/carbon/
    * rewrite.go:28 copyAndRewrite, cfg.Cleanup): strip leading dots,
    * collapse runs of dots to one, replace runs of invalid characters
    * (anything outside `[A-Za-z0-9.\-_:#]`) with ONE `_` — and with
    * nothing at all when the preceding kept character is already an
    * underscore — then strip trailing dots. Pure column algebra, so
    * it runs identically on the batch and streaming ingest paths. */
  def rewrite(path: Column): Column = {
    val inv = "[^A-Za-z0-9.\\-_:#]"
    val step1 = regexp_replace(path, "^\\.+", "")
    val step2 = regexp_replace(step1, s"(_)$inv+", "$1")
    val step3 = regexp_replace(step2, s"$inv+", "_")
    val step4 = regexp_replace(step3, "\\.{2,}", ".")
    regexp_replace(step4, "\\.+$", "")
  }

  /** One carbon ingestion rule (ingest/carbon/ingest.go:560
    * compileRulesWithLock + config.CarbonIngesterRuleConfiguration):
    * match by raw UNANCHORED regex `pattern` (the reference compiles
    * the config string with regexp.Compile and calls Match; the `.*`
    * MatchAllPattern short-circuits) XOR `contains` substring;
    * `aggregationEnabled=true` downsamples matched metrics with
    * `aggregationType` into each storage policy's resolution,
    * `false` writes RAW datapoints tagged with the policy; policies
    * are (resolutionS, retentionS) pairs; `continueMatching` lets
    * later rules also fire (ingest.go:408 rule.rule.Continue),
    * otherwise the first matching rule wins. */
  final case class CarbonRule(
    pattern: Option[String] = None,
    contains: Option[String] = None,
    aggregationEnabled: Boolean = true,
    aggregationType: String = "mean",
    policies: Seq[(Long, Long)],
    continueMatching: Boolean = false)

  /** Route parsed carbon metrics through an ordered ruleset
    * (ingest.go:336 write): per metric, rules apply in order up to
    * and including the first matching rule with continueMatching =
    * false; each applied rule emits one series per storage policy —
    * aggregated into the policy's resolution buckets with the rule's
    * type, or raw datapoints when aggregation is disabled — with the
    * policy's retention as a time floor against `nowS`.
    *
    * Output: (path, rule, agg_type, resolution_s, retention_s,
    * bucket_s, value).
    *
    * Scale: matching is one codegen'd projection (no rule join — the
    * applied-rule set is a filtered literal array, exploded);
    * aggregation is ONE hash aggregation over all enabled
    * rule-policies (the policy table is a broadcast literal frame);
    * the raw branch is map-only. `Last` aggregation ties on equal
    * timestamps break by value (carbon lines carry no arrival
    * order — documented deviation from m3's arrival-order Last). */
  def route(parsed: DataFrame, rules: Seq[CarbonRule],
            nowS: Long): DataFrame = {
    require(rules.nonEmpty, "carbon ingester needs at least one rule")
    val knownAggs = Set("mean", "sum", "min", "max", "count", "last")
    rules.foreach { r =>
      require(r.pattern.isEmpty ^ r.contains.isEmpty,
        s"rule must set exactly one of pattern/contains: $r")
      require(!r.aggregationEnabled || knownAggs(r.aggregationType),
        s"unknown aggregation type ${r.aggregationType}")
    }
    val spark = parsed.sparkSession
    val matchCols: Seq[Column] = rules.map { r =>
      r.pattern.map {
        case ".*" => lit(true) // graphite.MatchAllPattern (tags.go:47)
        case p    => col("path").rlike(p)
      }.getOrElse(col("path").contains(r.contains.get))
    }
    val applied: Seq[Column] = rules.indices.map { k =>
      val stopBefore = (0 until k)
        .map(j => matchCols(j) && lit(!rules(j).continueMatching))
        .reduceOption(_ || _).getOrElse(lit(false))
      matchCols(k) && !stopBefore
    }
    val appliedArr = filter(
      array(rules.indices.map(k =>
        when(applied(k), lit(k)).otherwise(lit(-1))): _*),
      _ >= 0)
    // the aggregated and raw branches both read the parsed frame —
    // checkpoint it so the line-parse regexes run ONCE, not once per
    // branch (the multi-consumer rule from the kn3 type tables).
    // Streaming inputs skip the checkpoint (not legal mid-stream; a
    // micro-batch re-parse is per-batch-sized) so the SAME routing
    // runs under foreachBatch — StreamingSpec pins batch parity.
    val cleaned = parsed.where(!col("malformed"))
      .withColumn("es", unix_timestamp(col("ts")))
    val base =
      (if (parsed.isStreaming) cleaned else cleaned.materialize(false))
        .withColumn("rule", explode(appliedArr))

    import spark.implicits._
    val polRows = rules.zipWithIndex.flatMap { case (r, k) =>
      r.policies.map { case (res, ret) =>
        (k, if (r.aggregationEnabled) r.aggregationType else "raw",
          res, ret)
      }
    }
    val pol = polRows
      .toDF("rule", "agg_type", "resolution_s", "retention_s")

    val joined = base.join(broadcast(pol), "rule")
    val keys = Seq(col("path"), col("rule"), col("agg_type"),
      col("resolution_s"), col("retention_s"))

    val aggB = joined.where(col("agg_type") =!= "raw")
      .withColumn("bucket_s",
        (floor(col("es").cast("double") / col("resolution_s"))
          .cast("long") * col("resolution_s")).cast("long"))
      .groupBy(keys :+ col("bucket_s"): _*)
      .agg(
        avg("value").as("_mean"), sum("value").as("_sum"),
        min("value").as("_min"), max("value").as("_max"),
        count(lit(1)).cast("double").as("_count"),
        max_by(col("value"), struct(col("es"), col("value"))).as("_last"))
      .withColumn("value",
        when(col("agg_type") === "mean", col("_mean"))
          .when(col("agg_type") === "sum", col("_sum"))
          .when(col("agg_type") === "min", col("_min"))
          .when(col("agg_type") === "max", col("_max"))
          .when(col("agg_type") === "count", col("_count"))
          .when(col("agg_type") === "last", col("_last")))
      .drop("_mean", "_sum", "_min", "_max", "_count", "_last")

    val rawB = joined.where(col("agg_type") === "raw")
      .select(keys :+ col("es").as("bucket_s") :+ col("value"): _*)

    aggB.unionByName(rawB)
      .where(col("bucket_s") >= lit(nowS) - col("retention_s"))
  }
}
