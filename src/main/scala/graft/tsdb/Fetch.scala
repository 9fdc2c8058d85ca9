package graft.tsdb

import graft.Materialize.MatOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Series selection — the engine's front door, mirroring the m3
  * fetch operator (reference: src/query/functions/fetch.go:43-48
  * `FetchOp{Name, Range, Offset, Matchers}`) and its tag matcher
  * model (src/query/models/matcher.go: MatchEqual / MatchNotEqual /
  * MatchRegexp / MatchNotRegexp).
  *
  * Every m3/PromQL query begins with a matcher set
  * (`metric{label=~"...", other!="..."}`); this is its DataFrame
  * analogue: a conjunction of per-label predicates plus an optional
  * time range and offset, applied directly on the sample frame.
  *
  * Semantics:
  *  - EQ/NEQ compare natively (`col === value`), so Catalyst's
  *    type coercion folds the string literal into the column type
  *    and the predicate pushes down to the parquet scan
  *    (`PushedFilters` — asserted in PlanSpec).
  *  - Regex matchers are *fully anchored*, as in PromQL/m3
  *    (src/query/models/matcher.go wraps patterns with ^(?:…)$):
  *    `rlike("^(?:pat)$")` here, `regexp_full_match` in the oracle.
  *    Non-string label columns are matched on their string rendering.
  *  - `offset` (src/query/functions/lazy/base.go:33 OffsetType)
  *    shifts the *data* window back by `offsetS` and re-stamps
  *    samples at their evaluation time: rows with
  *    ts ∈ [start−offset, end−offset) surface as ts + offset.
  *
  * Scale: the matcher conjunction is a single Filter node directly
  * over the scan — EQ/NEQ reach parquet row-group pruning, the time
  * bound prunes dt= partitions in a partitioned layout, and regex
  * matchers evaluate in the same whole-stage-codegen map as the
  * scan. No shuffle is introduced.
  */
object Fetch {

  sealed trait Op
  /** `label = "v"` — MatchEqual. */
  case object Eq extends Op
  /** `label != "v"` — MatchNotEqual. */
  case object NotEq extends Op
  /** `label =~ "re"` — MatchRegexp (fully anchored). */
  case object Re extends Op
  /** `label !~ "re"` — MatchNotRegexp (fully anchored). */
  case object NotRe extends Op

  final case class Matcher(label: String, op: Op, value: String)

  /** Parse an m3 rule tag-filter string into a matcher conjunction —
    * the rule-matching grammar of the aggregation/rollup rule sets
    * (reference: src/metrics/filters/tags_filter.go
    * ParseTagFilterValueMap + filter.go NewFilter): space-separated
    * `tag:pattern` pairs, duplicate tags rejected; a leading `!`
    * negates the pattern; patterns support `?` (any one char),
    * `[a-z]`/`[abc]` single-char ranges, `{a,b}` alternation, and at
    * most ONE `*` wildcard — as prefix (`*pat`), suffix (`pat*`) or
    * middle (`a*b`) — except the contains form `*pat*`
    * (filter.go:147 newWildcardFilter's exhaustive shapes; anything
    * else is errInvalidFilterPattern). Each pattern compiles to one
    * fully-anchored regex [[Matcher]] ([[Re]]/[[NotRe]], or
    * [[Eq]]/[[NotEq]] when the pattern is literal), so the filter
    * rides the same scan-adjacent predicate as every other fetch. */
  def tagsFilter(filter: String): Seq[Matcher] = {
    val pairs = filter.trim.split(" ").filter(_.nonEmpty)
    val seen = scala.collection.mutable.Set.empty[String]
    pairs.toSeq.map { p =>
      val items = p.split(":", -1)
      require(items.length == 2, s"invalid filter $p: expecting tag pattern pairs")
      val Array(tag, pat0) = items
      require(tag.nonEmpty, s"invalid filter $p: empty tag name")
      require(pat0.nonEmpty, s"invalid filter $p: empty filter pattern")
      require(seen.add(tag), s"invalid filter $filter: duplicate tag $tag found")
      val (negate, pat) =
        if (pat0.startsWith("!")) {
          require(pat0.length > 1, s"invalid filter pattern: $pat0")
          (true, pat0.drop(1))
        } else (false, pat0)
      val (re, literal) = globToRegex(pat)
      (negate, literal) match {
        case (false, Some(v)) => Matcher(tag, Eq, v)
        case (true, Some(v))  => Matcher(tag, NotEq, v)
        case (false, None)    => Matcher(tag, Re, re)
        case (true, None)     => Matcher(tag, NotRe, re)
      }
    }
  }

  /** One glob pattern → (regex, Some(literal) when no glob chars).
    * Wildcard-shape validation replays newWildcardFilter exactly. */
  private def globToRegex(pat: String): (String, Option[String]) = {
    val wIdx = pat.indexOf('*')
    val shapeOk =
      if (wIdx == -1) true
      else if (pat == "*") true
      else {
        val second = pat.indexOf('*', wIdx + 1)
        if (second == -1) true // prefix, suffix or single middle wildcard
        else wIdx == 0 && second == pat.length - 1 && pat.length > 2 // *pat*
      }
    require(shapeOk, s"invalid filter pattern defined: $pat")
    // per-char escaping (not \Q…\E): the regex must parse in BOTH
    // Spark's Java engine and the DuckDB/RE2 oracle replay
    def esc(c: Char): String =
      if (c.isLetterOrDigit || c == '_') c.toString else "\\" + c
    val sb = new StringBuilder
    var literal = true
    var i = 0
    while (i < pat.length) {
      pat.charAt(i) match {
        case '*' => sb.append(".*"); literal = false; i += 1
        case '?' => sb.append('.'); literal = false; i += 1
        case '[' =>
          val end = pat.indexOf(']', i + 1)
          require(end > i, s"invalid filter pattern defined: $pat")
          val body = pat.substring(i + 1, end)
          require(body.nonEmpty && body.forall(c =>
            c.isLetterOrDigit || c == '-'), s"invalid filter pattern defined: $pat")
          sb.append('[').append(body).append(']'); literal = false
          i = end + 1
        case '{' =>
          val end = pat.indexOf('}', i + 1)
          require(end > i, s"invalid filter pattern defined: $pat")
          val alts = pat.substring(i + 1, end).split(",", -1)
          sb.append(alts.map(_.flatMap(esc)).mkString("(?:", "|", ")"))
          literal = false
          i = end + 1
        case c =>
          sb.append(esc(c)); i += 1
      }
    }
    (sb.toString, if (literal) Some(pat) else None)
  }

  /** Single matcher → boolean Column. PromQL's reserved `__name__`
    * label addresses the metric name column. */
  def predicate(m: Matcher): Column = {
    val label = if (m.label == "__name__") "name" else m.label
    m.op match {
      case Eq    => col(label) === lit(m.value)
      case NotEq => col(label) =!= lit(m.value)
      case Re    => col(label).cast("string").rlike(s"^(?:${m.value})$$")
      case NotRe => !col(label).cast("string").rlike(s"^(?:${m.value})$$")
    }
  }

  /** Restrict-by-tag fetch options (reference:
    * src/query/storage/restrict_query_options.go:207-216
    * `RestrictByTag{Restrict, Strip}`): `restrict` matchers are
    * *override* matchers — a caller matcher on the same label is
    * dropped and the restrict matcher applied instead
    * (WithAppliedOptions, restrict_query_options.go:130-172);
    * `strip` is the set of tag names removed from the response,
    * defaulting to every restricted label when unset
    * (GetFilterByNames, restrict_query_options.go:109-126). Used by
    * m3 deployments to pin fetches to a tenant/cluster tag and hide
    * that tag from results. */
  final case class RestrictByTag(restrict: Seq[Matcher],
                                 strip: Seq[String] = Nil) {
    def stripNames: Seq[String] =
      if (strip.nonEmpty) strip else restrict.map(_.label)
  }

  /** Merge caller matchers with restrict overrides: same-label
    * caller matchers are overridden (dropped), restrict matchers
    * appended — the n² loop of WithAppliedOptions as set algebra. */
  def mergeRestrict(matchers: Seq[Matcher], r: RestrictByTag): Seq[Matcher] = {
    val overridden = r.restrict.map(_.label).toSet
    matchers.filterNot(m => overridden.contains(m.label)) ++ r.restrict
  }

  /** Fetch under restrict-by-tag options: the merged matcher set is
    * applied, then the strip names are dropped from the response —
    * the tags-as-columns analogue of `Tags.TagsWithoutKeys`
    * (api/v1/handler/prometheus/common.go:591-607
    * FilterSeriesByOptions). Dropping a column never adds a plan
    * node beyond the projection already present, so the scale
    * posture of `apply` (single pushed-down Filter) is unchanged. */
  def withOptions(samples: DataFrame, matchers: Seq[Matcher],
                  options: RestrictByTag,
                  startS: Option[Long] = None, endS: Option[Long] = None,
                  offsetS: Long = 0L): DataFrame =
    apply(samples, mergeRestrict(matchers, options), startS, endS, offsetS)
      .drop(options.stripNames
        .map(l => if (l == "__name__") "name" else l): _*)

  /** Tag completion — the search surface behind m3's `/labels` and
    * label-values endpoints (reference: src/query/storage/types.go:300
    * `CompleteTagsQuery{CompleteNameOnly, FilterNameTags,
    * TagMatchers, Start, End}`): after applying the matcher
    * conjunction and time range, enumerate the distinct
    * (tag_name, tag_value) pairs over the label columns —
    * or just the tag names when `nameOnly`. `filterNames` keeps only
    * the listed tags (label-values = completeTags filtered to one
    * name, api/v1/handler/label_values.go).
    *
    * Scale: unpivot is a per-row explode (no shuffle); the single
    * shuffle is the distinct, which partial-aggregates map-side —
    * at 100 TB the exchange carries only the tag cardinality, not
    * the samples. */
  def completeTags(samples: DataFrame, matchers: Seq[Matcher],
                   labelCols: Seq[String],
                   nameOnly: Boolean = false,
                   filterNames: Seq[String] = Nil,
                   startS: Option[Long] = None,
                   endS: Option[Long] = None): DataFrame = {
    val names =
      if (filterNames.nonEmpty) labelCols.filter(filterNames.contains)
      else labelCols
    require(names.nonEmpty, "no label columns left after FilterNameTags")
    val fetched = apply(samples, matchers, startS, endS)
    // m3 reports a name only when present on ≥1 matching series: a
    // NULL label value models an absent tag, so filter it out before
    // the distinct in both modes
    val pairs = fetched.select(explode(array(names.map(n =>
      struct(lit(n).as("tag_name"),
        col(n).cast("string").as("tag_value"))): _*)).as("t"))
      .select(col("t.tag_name"), col("t.tag_value"))
      .where(col("tag_value").isNotNull)
    if (nameOnly) pairs.select("tag_name").distinct()
    else pairs.distinct()
  }

  /** Series match — the /series endpoint (reference:
    * src/query/storage/types.go:315 `SeriesMatchQuery{TagMatchers,
    * Start, End}` via api/v1/handler/prometheus/remote/match.go):
    * one matcher conjunction per `match[]` request parameter, the
    * per-set results unioned; returns the distinct label sets of
    * matching series.
    *
    * Scale: each set is a pushed-down fetch filter; the union is
    * plan-level (no shuffle) and the single exchange is the
    * distinct over series cardinality. */
  def seriesMatch(samples: DataFrame, matcherSets: Seq[Seq[Matcher]],
                  labelCols: Seq[String],
                  startS: Option[Long] = None,
                  endS: Option[Long] = None): DataFrame = {
    require(matcherSets.nonEmpty, "at least one match[] set required")
    matcherSets
      .map(ms => apply(samples, ms, startS, endS)
        .select(labelCols.map(col): _*))
      .reduce(_ unionByName _)
      .distinct()
  }

  /** Apply a matcher conjunction + optional [startS, endS) epoch
    * range + offset to a sample frame (labels…, ts, value, …). */
  def apply(samples: DataFrame, matchers: Seq[Matcher],
            startS: Option[Long] = None, endS: Option[Long] = None,
            offsetS: Long = 0L): DataFrame = {
    val shifted =
      if (offsetS == 0L) samples
      else samples.withColumn("ts", col("ts") + expr(s"INTERVAL $offsetS SECONDS"))
    val timeBounds = Seq(
      startS.map(s => col("ts") >= timestamp_seconds(lit(s))),
      endS.map(e => col("ts") < timestamp_seconds(lit(e)))).flatten
    (matchers.map(predicate) ++ timeBounds)
      .foldLeft(shifted)((df, p) => df.where(p))
  }

  /** Returned-series limit — m3's ReturnedSeriesLimit fetch option
    * (reference: src/query/storage/types.go:113-128 FetchOptions
    * {SeriesLimit, ReturnedSeriesLimit, RequireExhaustive}).
    * Truncation is at WHOLE-series granularity: rendering stops
    * before series limit+1, never mid-series
    * (api/v1/handler/prometheus/native/common.go:262-265), and the
    * response carries {TotalSeries, Limited}
    * (handleroptions.ReturnedDataLimited, read_common.go:272-285).
    * m3 keeps series in storage-arrival order; a distributed engine
    * needs a deterministic rule, so the kept set is the first
    * `limit` series by sorted identity (name, user_id).
    *
    * `requireExhaustive` mirrors RequireExhaustive (types.go:127):
    * a truncated result is an ERROR, not a silent partial answer.
    * The check is LAZY — a `raise_error` folded into the one-row
    * stats frame, so it fires when the result plan executes (fail
    * at sink, like m3 failing the fetch) and the fetch still scans
    * ONCE; an eager collect here would run a second full count
    * before the result plan.
    *
    * Scale: series identities collapse to a distinct frame (series
    * cardinality, not sample count); the kept set is a distributed
    * top-N (TakeOrdered — no global sort, no unpartitioned window)
    * that semi-joins back onto the samples; total/limited ride a
    * one-row broadcast crossJoin. */
  /** Metadata limit for the TAG-SEARCH surfaces — SeriesLimit /
    * DocsLimit / ReturnedSeriesMetadataLimit applied to tag
    * completion, series match and index-tags results (reference:
    * src/query/storage/types.go:113-128 FetchOptions; the
    * coordinator caps these exact endpoints because metadata
    * queries are where cardinality explosions hurt — a label-values
    * request against a million-series namespace must not stream a
    * million rows to the client). `meta` is any distinct metadata
    * frame (completeTags pairs, seriesMatch label sets, index tag
    * pairs); the kept set is the first `limit` rows by the sorted
    * key — the engine's deterministic stand-in for m3's
    * arrival-order truncation — and every returned row carries
    * {total_results, limited} (handleroptions.ReturnedDataLimited).
    * `requireExhaustive` raises LAZILY through the same one-row
    * gate as [[withSeriesLimit]] — one scan, fail at sink.
    *
    * Scale: the metadata frame is already tag/series cardinality
    * (the underlying fetch collapsed the samples map-side); the cap
    * is a distributed TakeOrdered over it — no global sort — and
    * the stats ride a one-row broadcast. */
  def withMetadataLimit(meta: DataFrame, keyCols: Seq[String], limit: Int,
                        requireExhaustive: Boolean = false): DataFrame = {
    // the kept set and the total both read `meta` — materialize the
    // (metadata-cardinality, tiny) frame once instead of replaying
    // a potentially expensive upstream twice (ADVICE r11)
    val m = meta.materialize(false)
    val kept = m.orderBy(keyCols.map(col): _*).limit(limit)
    val stats = exhaustiveGate(
      m.agg(count(lit(1)).as("total_results"))
        .withColumn("limited", (col("total_results") > limit).cast("int")),
      requireExhaustive,
      concat(lit(s"query exceeds SeriesMetadataLimit=$limit (total "),
        col("total_results").cast("string"),
        lit(" results) with RequireExhaustive set")))
    kept.crossJoin(broadcast(stats))
  }

  /** Per-metric-name result metadata stats — FetchOptions'
    * MaxMetricMetadataStats (reference:
    * src/query/storage/prom_converter.go:152 and
    * src/query/block/meta.go:58 ResultMetricMetadata): for every
    * series the fetch TOUCHED, the coordinator counts per metric
    * name whether it contributed samples to the result range
    * (WithSamples) or matched the query but was empty there
    * (NoSamples — the "why is my panel sparse" diagnostic), capped
    * at the heaviest `maxNames` names. Series identity comes from
    * the matcher conjunction alone; range membership from the
    * [startS, endS) bounds.
    *
    * Scale: ONE matcher scan (ADVICE r11 — the earlier form scanned
    * twice, once unbounded for identity and once bounded for range
    * membership): the per-series in-range flag is a map-side-combined
    * max(when(ts ∈ bounds)) in the same identity aggregation, then a
    * per-name count and a TakeOrdered cap — nothing sample-sized
    * crosses a shuffle. */
  def metricMetadataStats(samples: DataFrame, matchers: Seq[Matcher],
                          startS: Long, endS: Long,
                          maxNames: Int): DataFrame = {
    val inRange = col("ts") >= timestamp_seconds(lit(startS)) &&
      col("ts") < timestamp_seconds(lit(endS))
    apply(samples, matchers)
      .groupBy("name", "user_id")
      .agg(max(when(inRange, 1)).as("_hit"))
      .groupBy("name").agg(
        count(when(col("_hit").isNotNull, 1)).as("with_samples"),
        count(when(col("_hit").isNull, 1)).as("no_samples"))
      .orderBy((col("with_samples") + col("no_samples")).desc,
        col("name").asc)
      .limit(maxNames)
  }

  def withSeriesLimit(fetched: DataFrame, limit: Int,
                      requireExhaustive: Boolean = false): DataFrame = {
    val ident = fetched.select("name", "user_id").distinct()
    val kept = ident.orderBy("name", "user_id").limit(limit)
    val stats = exhaustiveGate(
      ident.agg(count(lit(1)).as("total_series"))
        .withColumn("limited", (col("total_series") > limit).cast("int")),
      requireExhaustive,
      concat(lit(s"query exceeds ReturnedSeriesLimit=$limit (total "),
        col("total_series").cast("string"),
        lit(" series) with RequireExhaustive set")))
    fetched.join(kept, Seq("name", "user_id"), "left_semi")
      .crossJoin(broadcast(stats))
  }

  /** The lazy RequireExhaustive gate: when the exhaustive contract
    * is requested and violated, the plan raises at evaluation time —
    * one scan, no eager pre-count. The raise lives in a row-level
    * FILTER on the one-row stats frame, not a projected column: a
    * projection-only gate would be dropped by column pruning
    * whenever the caller selects away the `limited` column, and a
    * filter on the joined rows would never evaluate when the kept
    * set is empty (a budget smaller than the first series) — the
    * stats filter runs whenever the broadcast side builds, in every
    * one of those shapes (spec-covered). */
  private def exhaustiveGate(stats: DataFrame, requireExhaustive: Boolean,
                             msg: Column): DataFrame =
    if (!requireExhaustive) stats
    else stats.where(
      when(col("limited") === 1, raise_error(msg).cast("boolean"))
        .otherwise(lit(true)))

  /** Returned-datapoints limit — the second returned-data budget in
    * m3's FetchOptions (types.go:124 ReturnedDatapointsLimit;
    * native/common.go:266-269 stops rendering before the first
    * series whose datapoints would exceed the budget — truncation is
    * again whole-series, in render order). With the deterministic
    * sorted-identity order this means: keep the longest prefix of
    * series whose cumulative sample count fits `budget`.
    *
    * Scale: the prefix sum runs over the per-series COUNTS frame
    * (series cardinality), and even there never as one global
    * window: counts range-repartition by identity, each shard
    * computes a local running sum, and shard offsets come from a
    * numShards-row frame (the corpus_pack discipline). Shard
    * boundaries are sampling-dependent; prefix sums are
    * boundary-invariant, so the result is deterministic. */
  def withDatapointsLimit(fetched: DataFrame, budget: Long,
                          requireExhaustive: Boolean = false,
                          shards: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = fetched.groupBy("name", "user_id")
      .agg(count(lit(1)).as("_n"))
      .repartitionByRange(shards, col("name"), col("user_id"))
      .withColumn("_shard", spark_partition_id())
    val localCum = counts.withColumn("_local_cum",
      sum("_n").over(Window.partitionBy("_shard")
        .orderBy("name", "user_id")))
    // shard totals: ≤ `shards` rows — the bounded bounds-frame that
    // may window/broadcast freely
    val offsets = counts.groupBy("_shard").agg(sum("_n").as("_tot"))
      .withColumn("_offset",
        coalesce(sum("_tot").over(Window.orderBy("_shard")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_shard", "_offset")
    val cum = localCum.join(broadcast(offsets), "_shard")
      .withColumn("_cum", col("_local_cum") + col("_offset"))
    val kept = cum.where(col("_cum") <= budget).select("name", "user_id")
    val stats = exhaustiveGate(
      fetched.agg(count(lit(1)).as("total_datapoints"))
        .withColumn("limited", (col("total_datapoints") > budget).cast("int")),
      requireExhaustive,
      concat(lit(s"query exceeds ReturnedDatapointsLimit=$budget (total "),
        col("total_datapoints").cast("string"),
        lit(" datapoints) with RequireExhaustive set")))
    fetched.join(kept, Seq("name", "user_id"), "left_semi")
      .crossJoin(broadcast(stats))
  }
}
