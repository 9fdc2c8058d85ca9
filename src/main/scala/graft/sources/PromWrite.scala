package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.tsdb.Downsample

/** Prometheus remote-write ingestion — the Spark-native analogue of
  * m3coordinator's primary write path: the prom remote write handler
  * (src/query/api/v1/handler/prometheus/remote/write.go:139
  * NewPromWriteHandler / :437 parseRequest), its tag-mutation header
  * (map_tags.go mapTags, header `M3-Map-Tags-JSON`), and the
  * downsample-and-write routing behind it
  * (src/cmd/services/m3coordinator/ingest/write.go WriteBatch).
  *
  * The snappy-compressed protobuf wire format is out of scope (an
  * analytics library has no HTTP surface); the handler SEMANTICS are
  * restated over a PRE-PARSED frame — exactly as [[InfluxLine]] does
  * for the line protocol — with one row per (series, sample), the
  * prompb.WriteRequest flattened:
  *
  *   labels array<struct<name string, value string>>, ts timestamp,
  *   value double
  *
  * Reference semantics reproduced exactly:
  *   - label-set conversion (storage/converter.go:60
  *     PromLabelsToM3Tags): the `__name__` label becomes the metric
  *     name, every other label a tag; label ORDER in the request is
  *     irrelevant (newTSPromIter sorts before validation —
  *     write.go:431's guarantee);
  *   - label-set validation (models/tags.go:286 validate, the
  *     default TagOptions): at least one label; no empty label
  *     names; no empty label values (AllowTagValueEmpty=false); no
  *     duplicate label names (AllowTagNameDuplicates=false); name
  *     and value literals at most 65535 bytes
  *     (serialize.DefaultMaxTagLiteralLength = MaxUint16, checked at
  *     write.go:520). The reference fails the whole HTTP request on
  *     a too-long literal and the whole batch on validation; a batch
  *     parser flags the ROW as `malformed` instead, so drops are
  *     meterable, never silent — same divergence-by-design as
  *     [[InfluxLine]]'s missing-timestamp rule;
  *   - tag mapping (map_tags.go:32): `write` upserts a tag on every
  *     series (replace all occurrences if present, append if not);
  *     `drop`, `dropWithValue` and `replace` throw — the reference
  *     itself returns "operation is not yet supported" for them;
  *   - metric-type header (write.go:109 headerToMetricType, header
  *     `M3-Prom-Type`): one of counter/gauge/gauge_histogram/
  *     histogram/info/stateset/summary (case-insensitive), stamped
  *     on every series of the request, unknown type rejected;
  *   - header-driven write options (write.go:440-486):
  *     `M3-Metrics-Type: unaggregated` forbids a storage policy and
  *     disables downsampling (direct writes only);
  *     `M3-Metrics-Type: aggregated` + `M3-Storage-Policy: res:ret`
  *     pins the write to that policy's namespace with zero
  *     downsample rules; `M3-Write-Type: aggregate` clears the
  *     direct-write path (downsample only); unknown values reject;
  *   - routing (ingest/write.go:210 shouldWrite / :238
  *     shouldDownsample): direct writes happen iff a store exists
  *     and (no write override, or override with ≥1 policy);
  *     downsampling happens iff the downsampler is enabled and (no
  *     downsample override, or override with ≥1 mapping rule). The
  *     two paths are independent — a sample can go to both, either,
  *     or neither.
  *
  * Everything below is pure column algebra over the labels array
  * (higher-order functions, no UDFs, no explode until the caller
  * consolidates), so the same transform runs unchanged under
  * `readStream` — the streaming write path, like [[Carbon]] and
  * [[InfluxLine]].
  */
object PromWrite {

  /** serialize.DefaultMaxTagLiteralLength (x/serialize/limits.go:30)
    * — uint16 max. */
  val DefaultMaxTagLiteralLength: Int = 65535

  private val NameLabel = "__name__"

  // ---------------- tag mapping (map_tags.go) ----------------

  /** One tag-mutation op — handleroptions.TagMapper
    * (handleroptions/tag_options.go:129). Each instance is exactly
    * one op, which is the mapper Validate() rule ("must specify one
    * operation per tag mapper"). */
  sealed trait TagMapper
  /** Unconditionally add tag=value to every series; series already
    * carrying the tag have every occurrence's value replaced
    * (tag_options.go:163 WriteOp; map_tags.go:41). */
  final case class WriteTag(tag: String, value: String) extends TagMapper
  /** Not yet supported in the reference (map_tags.go:62). */
  final case class DropTag(tag: String) extends TagMapper
  /** Not yet supported in the reference (map_tags.go:66). */
  final case class DropTagWithValue(tag: String, value: String) extends TagMapper
  /** Not yet supported in the reference (map_tags.go:70). */
  final case class ReplaceTag(tag: String, oldValue: String,
                              newValue: String) extends TagMapper

  /** Apply tag mappers to the raw request frame (before [[parse]] —
    * the reference mutates the prompb request in parseRequest, ahead
    * of conversion/validation, so a mapper can e.g. repair a
    * missing label and make a series valid). */
  def mapTags(req: DataFrame, mappers: Seq[TagMapper],
              labelsCol: String = "labels"): DataFrame =
    mappers.foldLeft(req) { (df, m) =>
      m match {
        case WriteTag(tag, value) =>
          val ls = col(labelsCol)
          val entry = struct(lit(tag).as("name"), lit(value).as("value"))
          val replaced = transform(ls, l =>
            when(l.getField("name") === tag, entry).otherwise(l))
          df.withColumn(labelsCol,
            when(exists(ls, _.getField("name") === tag), replaced)
              .otherwise(concat(ls, array(entry))))
        case DropTag(_) =>
          throw new UnsupportedOperationException(
            "Drop operation is not yet supported")
        case DropTagWithValue(_, _) =>
          throw new UnsupportedOperationException(
            "DropWithValue operation is not yet supported")
        case ReplaceTag(_, _, _) =>
          throw new UnsupportedOperationException(
            "Replace operation is not yet supported")
      }
    }

  // ---------------- metric type (write.go:109) ----------------

  private val metricTypes = Set("counter", "gauge", "gauge_histogram",
    "histogram", "info", "stateset", "summary")

  /** Stamp the `M3-Prom-Type` header's metric type on every series
    * of the request (write.go:509: applied to all Timeseries; the
    * storeMetricsType=true behavior). Unknown types reject like the
    * handler's 400. */
  def withPromType(req: DataFrame, promType: String): DataFrame = {
    val tp = promType.toLowerCase
    if (!metricTypes(tp))
      throw new IllegalArgumentException(s"unknown prom metric type $promType")
    req.withColumn("metric_type", lit(tp))
  }

  // ---------------- parse + validate ----------------

  /** Pre-parsed request rows → sample rows:
    * (name, tags map<string,string>, ts, value, malformed), plus
    * `metric_type` if [[withPromType]] ran. `name` is the `__name__`
    * label (null when absent — tags.validate does not require it);
    * `tags` is every other label, null when the label set fails
    * validation (so the flag is the only signal, never a throw from
    * map_from_entries on dups). */
  def parse(req: DataFrame,
            maxTagLiteralLength: Int = DefaultMaxTagLiteralLength,
            allowTagValueEmpty: Boolean = false,
            allowTagNameDuplicates: Boolean = false,
            labelsCol: String = "labels"): DataFrame = {
    val ls = col(labelsCol)
    def nameOf(l: Column) = l.getField("name")
    def valueOf(l: Column) = l.getField("value")

    // the literal limit is a BYTE budget (the reference checks
    // len([]byte) against serialize.DefaultMaxTagLiteralLength), so
    // octet_length, not character length — a multi-byte UTF-8 value
    // must fail at the same point the wire format would
    val nonEmpty = size(ls) > 0
    // ONE traversal checks names and values together (the AND over
    // elements of a conjunction equals the conjunction of the two
    // foralls, including three-valued-logic nulls)
    val entriesOk = forall(ls, l =>
      length(nameOf(l)) > 0 &&
        octet_length(nameOf(l)) <= maxTagLiteralLength &&
        (if (allowTagValueEmpty) lit(true) else length(valueOf(l)) > 0) &&
        octet_length(valueOf(l)) <= maxTagLiteralLength)
    val dupOk =
      if (allowTagNameDuplicates) lit(true)
      else size(array_distinct(transform(ls, nameOf(_)))) === size(ls)
    // staged: the map guard AND the malformed flag both read the
    // verdict — inline, the whole validation tree (interpreted
    // higher-order functions) would evaluate twice per row (r13)
    val staged = req.withColumn("_ok", nonEmpty && entriesOk && dupOk)
    val ok = col("_ok")

    // the map is only built for valid label sets — map_from_entries
    // errors on duplicate keys, and a dup-labeled series must FLAG,
    // not fail the batch. Filtering the ENTRIES and building the map
    // once replaces build-then-map_filter (one map construction per
    // row instead of two; same entries in the same order, and the
    // dup guard is unchanged because dupOk checked ALL names). The
    // name reads the FIRST __name__ entry via get() (0-based, null
    // out of bounds — never an ANSI error), so it stays extractable
    // even from a flagged set.
    val tagsCol = when(ok,
      map_from_entries(filter(ls, l => nameOf(l) =!= NameLabel)))
    val nameCol =
      get(filter(ls, l => nameOf(l) === NameLabel), lit(0)).getField("value")
    val keep = req.columns.filter(c => c != labelsCol).map(col).toSeq
    staged.select(
      (nameCol.as("name") +: tagsCol.as("tags") +:
        keep) :+ (!ok).as("malformed"): _*)
  }

  /** Well-formed rows consolidated per (name, requested tag columns)
    * at `unit` resolution — the hand-off into the tsdb operator
    * surface, same contract as [[InfluxLine.toSampleFrame]]. */
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
    val withTags = tagCols.foldLeft(parsed.where(!col("malformed"))) {
      (df, t) => df.withColumn(t, expr(s"try_element_at(tags, '$t')"))
    }
    withTags
      .groupBy(col("name") +: tagCols.map(col) :+
        graft.tsdb.Vectors.bucketS(unit).as("bucket_s"): _*)
      .agg(agg.as("value"))
  }

  // ---------------- write options (write.go:440-486) ----------------

  /** A resolution:retention storage policy (policy.go:45;
    * storage_policy.go:145 ParseStoragePolicy). */
  final case class StoragePolicy(resolution: String, retentionS: Long) {
    override def toString: String = s"$resolution:${retentionS}s"
  }

  private val polRun = "([0-9]+)(s|min|m|h|d|w|y)".r
  private def polSeconds(s: String): Long = {
    val runs = polRun.findAllMatchIn(s.trim.toLowerCase).toList
    if (runs.isEmpty || runs.map(_.matched).mkString != s.trim.toLowerCase)
      throw new IllegalArgumentException(s"invalid duration $s")
    runs.map { r =>
      r.group(1).toLong * (r.group(2) match {
        case "s" => 1L; case "m" | "min" => 60L; case "h" => 3600L
        case "d" => 86400L; case "w" => 604800L; case "y" => 31536000L
      })
    }.sum
  }

  /** `res:ret` → [[StoragePolicy]], the resolution kept as written
    * (it names the tier) and the retention in seconds. */
  def parseStoragePolicy(s: String): StoragePolicy = s.split(":") match {
    case Array(res, ret) => StoragePolicy(res.trim, polSeconds(ret))
    case _ => throw new IllegalArgumentException(s"invalid storage policy $s")
  }

  /** ingest.WriteOptions (ingest/write.go:104): the per-request
    * override switches the routing predicates consult. */
  final case class WriteOptions(
      downsampleOverride: Boolean = false,
      downsampleMappingRules: Seq[Downsample.Rule] = Nil,
      writeOverride: Boolean = false,
      writeStoragePolicies: Seq[StoragePolicy] = Nil)

  /** Replay parseRequest's header handling (write.go:440-486):
    * metrics-type / storage-policy / write-type headers → the ingest
    * write options. Invalid combinations reject exactly as the
    * handler's 400s do. */
  def headerOptions(metricsType: Option[String] = None,
                    storagePolicy: Option[String] = None,
                    writeType: Option[String] = None): WriteOptions = {
    var opts = WriteOptions()
    metricsType.map(_.trim).filter(_.nonEmpty).foreach { t =>
      // override the default rules with ZERO rules — only direct
      // writes will be made (write.go:449-453)
      opts = opts.copy(downsampleOverride = true, downsampleMappingRules = Nil)
      t match {
        case "unaggregated" =>
          if (storagePolicy.exists(_.trim.nonEmpty))
            throw new IllegalArgumentException(
              "storage policy should not be set for unaggregated metrics type")
        case "aggregated" =>
          val p = storagePolicy.map(_.trim).filter(_.nonEmpty).getOrElse(
            throw new IllegalArgumentException(
              "could not parse storage policy: no policy set"))
          opts = opts.copy(writeOverride = true,
            writeStoragePolicies = Seq(parseStoragePolicy(p)))
        case other =>
          throw new IllegalArgumentException(s"invalid metrics type: $other")
      }
    }
    writeType.map(_.trim).filter(_.nonEmpty).foreach {
      case "default" =>
      case "aggregate" =>
        opts = opts.copy(writeOverride = true, writeStoragePolicies = Nil)
      case other =>
        throw new IllegalArgumentException(s"unrecognized write type: $other")
    }
    opts
  }

  // ---------------- routing (ingest/write.go:210,238) ----------------

  /** writeToStorage happens iff the store exists and the caller
    * either uses default policies or overrode with at least one. */
  def shouldWrite(opts: WriteOptions, storeExists: Boolean = true): Boolean =
    storeExists && (!opts.writeOverride || opts.writeStoragePolicies.nonEmpty)

  /** Downsampling happens iff the downsampler is enabled and the
    * caller either uses default mapping rules or overrode with at
    * least one. */
  def shouldDownsample(opts: WriteOptions,
                       downsamplerEnabled: Boolean = true): Boolean =
    downsamplerEnabled && (!opts.downsampleOverride ||
      opts.downsampleMappingRules.nonEmpty)

  /** The two output frames of the coordinator's WriteBatch. */
  final case class Routed(unaggregated: DataFrame, downsampled: DataFrame)

  /** Route a sample frame (labelCols…, ts, value) through the
    * DownsamplerAndWriter (ingest/write.go:402 WriteBatch): the
    * direct-storage path carries a `policy` attribution column
    * ("unaggregated", or one row-set per override policy — the
    * reference writes the same datapoints once per policy into that
    * policy's namespace, without aggregating); the downsample path
    * applies the effective mapping rules via
    * [[Downsample.rollupRules]]. A disabled path is the same-schema
    * empty frame, so callers union/write unconditionally.
    *
    * Scale: the policy fan-out is a union of narrow projections over
    * ONE scan (no shuffle until the downstream sink partitions);
    * rollupRules is per-rule hash aggregation with map-side combine.
    */
  def writeBatch(samples: DataFrame, opts: WriteOptions,
                 defaultRules: Seq[Downsample.Rule],
                 labelCols: Seq[String] = graft.tsdb.Vectors.labels,
                 storeExists: Boolean = true,
                 downsamplerEnabled: Boolean = true): Routed = {
    val unagg =
      if (!shouldWrite(opts, storeExists))
        samples.withColumn("policy", lit("")).limit(0)
      else if (opts.writeOverride && opts.writeStoragePolicies.nonEmpty)
        opts.writeStoragePolicies
          .map(p => samples.withColumn("policy", lit(p.toString)))
          .reduce(_ unionByName _)
      else samples.withColumn("policy", lit("unaggregated"))

    // effective rules: override wins when set AND non-empty, exactly
    // downsampleOverrideRules (ingest/write.go:254)
    val rules =
      if (opts.downsampleOverride && opts.downsampleMappingRules.nonEmpty)
        opts.downsampleMappingRules
      else defaultRules
    val down =
      if (rules.isEmpty)
        // no rules configured at all — still emit the rollup long
        // format (a zero-row frame over zero-row input), so callers
        // that union/write the downsampled frame unconditionally see
        // ONE schema in every branch
        Downsample.rollupRules(samples.limit(0),
          Seq(Downsample.Rule("disabled", Nil, "hour", Seq("sum"))),
          labelCols)
      else {
        val d = Downsample.rollupRules(samples, rules, labelCols)
        if (shouldDownsample(opts, downsamplerEnabled)) d else d.limit(0)
      }
    Routed(unagg, down)
  }
}
