package graft.tsdb

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Downsampling / rollup — the m3aggregator tier (reference:
  * src/aggregator/aggregation/{gauge,counter,timer}.go and the
  * resolution:retention storage policies in src/metrics/policy/).
  *
  * m3 rolls every series up into tumbling windows per resolution,
  * keeping a fixed set of aggregations (Last, Min, Max, Mean, Sum,
  * Count, SumSq, Stdev, and P50/P95/P99 for timers). Each policy is
  * one groupBy at its resolution — map-side partial aggregation,
  * shuffle only of per-group state; with time-partitioned input the
  * shuffle keys are partition-local.
  */
object Downsample {

  /** The aggregator's timer-quantile rule (quantile/cm/stream.go:249):
    * the sample at 1-based rank ceil(q·n) over the sorted window — a
    * real stream element, never an interpolated midpoint (the CM
    * sketch can only return values it has seen).
    *
    * MEMORY: this EXACT form buffers one (series, window)'s samples
    * in the aggregation hash map — O(samples-per-window) per group,
    * NOT the eps-bounded state the reference's CM sketch holds (a
    * hot 100 Hz timer in an hourly window is 360k doubles in one
    * buffer). It is the oracle gate's replay; the scale path is
    * [[SketchAccuracy]] → `percentile_approx`, the same eps-bounded
    * trade the streaming side already makes (m3 CM eps=1e-3 ≈
    * accuracy 1000). */
  private def rankQuantile(q: Double): Column = {
    val arr = sort_array(collect_list(col("value")))
    element_at(arr, greatest(ceil(lit(q) * size(arr)).cast("int"), lit(1)))
  }

  /** Percentile execution mode for the batch rollup paths.
    * [[Exact]] replays the nearest-rank rule verbatim (unbounded
    * per-group state — correct, and what the DuckDB oracle checks);
    * [[SketchAccuracy]] bounds per-group state with Spark's
    * mergeable KLL-style `percentile_approx` sketch at the given
    * accuracy (rank error ≤ n/accuracy) — the default 1000 matches
    * the aggregator's CM sketch eps=1e-3 (cm/types.go defaults),
    * exactly the parity the streaming rollup already runs. At 100 TB
    * with skewed series, use the sketch. */
  sealed trait PercentileMode
  case object Exact extends PercentileMode
  final case class SketchAccuracy(accuracy: Int = 1000) extends PercentileMode

  private def quantileAgg(q: Double, mode: PercentileMode): Column =
    mode match {
      case Exact => rankQuantile(q)
      case SketchAccuracy(acc) => percentile_approx(col("value"), lit(q), lit(acc))
    }

  /** One rollup at a given resolution — the m3 timer aggregation set
    * (src/aggregator/aggregation/timer.go). Stdev here is SAMPLE
    * stdev with 0 for single-sample windows, replaying
    * aggregation/common.go:28 √((n·sumSq − sum²)/(n(n−1))) — the
    * aggregator's write-path semantics; the PromQL query-side
    * stddev/stdvar (SeriesAgg/Temporal) stay population per
    * Prometheus. */
  def rollup(samples: DataFrame, unit: String,
             labelCols: Seq[String] = Vectors.labels,
             percentiles: PercentileMode = Exact): DataFrame = {
    // ONE per-group quantile buffer feeds all three ranks: the
    // sorted window array in Exact mode (three rankQuantile
    // aggregates would hold three copies), the single merged sketch
    // in SketchAccuracy mode (percentile_approx over an array of
    // percentages)
    val quantileBuf = percentiles match {
      case Exact => sort_array(collect_list(col("value"))).as("_vs")
      case SketchAccuracy(acc) =>
        percentile_approx(col("value"),
          array(lit(0.5), lit(0.95), lit(0.99)), lit(acc)).as("_vs")
    }
    def rq(i: Int, q: Double) = percentiles match {
      case Exact => element_at(col("_vs"),
        greatest(ceil(lit(q) * size(col("_vs"))).cast("int"), lit(1)))
      case SketchAccuracy(_) => element_at(col("_vs"), i)
    }
    samples
      .withColumn("bucket_s", Vectors.bucketS(unit))
      .groupBy((labelCols :+ "bucket_s").map(col): _*)
      .agg(
        max_by(col("value"), Vectors.lastKey).as("last_v"),
        min("value").as("min_v"),
        max("value").as("max_v"),
        round(avg("value"), 6).as("mean_v"),
        round(sum("value"), 6).as("sum_v"),
        count(lit(1)).as("count_v"),
        round(coalesce(stddev_samp("value"), lit(0.0)), 6).as("stdev_v"),
        quantileBuf)
      .select(
        (labelCols :+ "bucket_s").map(col) ++ Seq(
          col("last_v"), col("min_v"), col("max_v"), col("mean_v"),
          col("sum_v"), col("count_v"), col("stdev_v"),
          round(rq(1, 0.5), 6).as("p50_v"),
          round(rq(2, 0.95), 6).as("p95_v"),
          round(rq(3, 0.99), 6).as("p99_v")): _*)
  }

  /** A downsampling rule: which series it applies to (tag matchers),
    * at what resolution, keeping which aggregations — the Spark
    * analogue of m3's mapping/rollup rules
    * (src/cmd/services/m3coordinator/downsample applies per-metric
    * rule sets; policies in src/metrics/policy/). */
  final case class Rule(name: String, matchers: Seq[Fetch.Matcher],
                        resolution: String, aggs: Seq[String])

  object Rule {
    /** A mapping rule from its config-form filter string — how m3
      * rule sets actually declare matchers (`filter: "app:foo*
      * env:production"`; rules/mapping.go rawFilter →
      * filters.NewTagsFilter), parsed by [[Fetch.tagsFilter]]. */
    def fromFilter(name: String, filter: String, resolution: String,
                   aggs: Seq[String]): Rule =
      Rule(name, Fetch.tagsFilter(filter), resolution, aggs)
  }

  /** Apply a rule set: each rule filters its matched series (via
    * [[Fetch]] — pushdown-friendly), rolls up at its own resolution
    * with exactly its aggregation set, and emits long-format rows
    * (rule, resolution, labels…, bucket_s, agg, value) so
    * heterogeneous rules union into one frame. A series matching
    * several rules appears under each, like m3 applying every
    * matching mapping rule.
    *
    * Scale: one scan per rule, each with its matcher pushed down; a
    * planner could share one scan across rules with
    * aggregate-filter, but per-rule scans parallelize trivially and
    * prune to the rule's partitions. */
  /** The rule-set aggregation vocabulary — the m3 aggregation-type
    * set (metrics/aggregation/type.go) incl. the aggregator's
    * "expensive" set (isExpensive, aggregation/common.go:37): sample
    * stdev (n≤1→0), sumSq, and nearest-rank percentiles/median
    * replaying the CM-sketch rule (see [[rankQuantile]]). */
  private def ruleAgg(a: String, mode: PercentileMode): Column = a match {
    case "last"  => round(max_by(col("value"), Vectors.lastKey), 6).as("last")
    case "min"   => round(min("value"), 6).as("min")
    case "max"   => round(max("value"), 6).as("max")
    case "mean"  => round(avg("value"), 6).as("mean")
    case "sum"   => round(sum("value"), 6).as("sum")
    case "count" => count(lit(1)).cast("double").as("count")
    case "stdev" =>
      round(coalesce(stddev_samp("value"), lit(0.0)), 6).as("stdev")
    case "sum_sq" =>
      round(sum(col("value") * col("value")), 6).as("sum_sq")
    case p @ ("p50" | "p95" | "p99" | "median") =>
      val q = if (p == "median") 0.5 else p.drop(1).toDouble / 100.0
      round(quantileAgg(q, mode), 6).as(p)
    case a => throw new IllegalArgumentException(s"unknown agg $a")
  }

  def rollupRules(samples: DataFrame, rules: Seq[Rule],
                  labelCols: Seq[String] = Vectors.labels,
                  percentiles: PercentileMode = Exact): DataFrame = {
    require(rules.nonEmpty, "empty rule set")
    val frames = rules.map { r =>
      val bucketed = Fetch(samples, r.matchers)
        .withColumn("bucket_s", Vectors.bucketS(r.resolution))
      val aggExprs = r.aggs.map(ruleAgg(_, percentiles))
      val agged = bucketed
        .groupBy((labelCols :+ "bucket_s").map(col): _*)
        .agg(aggExprs.head, aggExprs.tail: _*)
      val kv = r.aggs.flatMap(a => Seq(lit(a), col(a)))
      agged.select(
        (lit(r.name).as("rule") +: lit(r.resolution).as("resolution") +:
          labelCols.map(col) :+ col("bucket_s")) :+
          explode(map(kv: _*)).as(Seq("agg", "value")): _*)
    }
    frames.reduce(_ unionByName _)
  }

  /** Rollup-TARGET rules — the m3 rollup rule proper
    * (src/metrics/rules/rollup_target.go:42 rollupTarget{Pipeline,
    * StoragePolicies}; pipeline RollupOp, metrics/pipeline/type.go:
    * 195): unlike a mapping [[Rule]] (which keeps the original
    * series identity), a rollup target aggregates ACROSS a tag
    * subset and emits under a NEW metric name — "sum all hosts into
    * service_requests_total".
    *
    * `rollupType` mirrors pipeline/type.go:188:
    *  - [[GroupBy]] keeps EXACTLY the listed tags as dimensions; a
    *    series missing one of them does not match
    *    (active_ruleset.go:585 res>0 → no match — here: a null tag
    *    column fails the presence test);
    *  - [[ExcludeBy]] drops the listed tags and keeps the rest
    *    (active_ruleset.go:589).
    *
    * `newName` is a literal, or may contain the single supported
    * template variable `{{ .MetricName }}` substituted with the
    * original metric name (type.go:241-260 NewRollupOp — more than
    * one occurrence or any other template rejects; type.go:274
    * NewName).
    */
  sealed trait RollupType
  case object GroupBy extends RollupType
  case object ExcludeBy extends RollupType

  final case class RollupTarget(newName: String,
                                rollupType: RollupType,
                                tags: Seq[String],
                                aggs: Seq[String],
                                resolution: String,
                                transforms: Seq[String] = Nil)

  /** Pipeline transformation ops — the stage of a rollup pipeline
    * that precedes the RollupOp (reference:
    * src/metrics/transformation/type.go:39 Absolute | PerSecond |
    * Increase | Add | Reset, applied per ORIGINAL series in pipeline
    * order by the aggregator). Each is a per-series window op over
    * event time:
    *  - Absolute (unary.go:35): |v|, stateless.
    *  - Add (unary.go:46): running sum per series; NaN contributes
    *    zero (42 + NaN = 42).
    *  - PerSecond (binary.go:54): (curr−prev)/Δseconds; the
    *    datapoint is DROPPED (emptyDatapoint) when there is no
    *    previous point, timestamps are non-increasing, either value
    *    is NaN, or the diff is negative.
    *  - Increase (binary.go:71): curr−prev with NaN prev treated as
    *    0; dropped on no-prev / non-increasing ts / NaN curr /
    *    negative diff.
    *  - Reset (unary_multi.go:46): every datapoint additionally
    *    emits a zero at ts + resolution/2 — the spacing trick that
    *    makes a downstream sum-of-increases see each window's total
    *    exactly once.
    *
    * Ordering ties: the aggregator consumes an arrival-ordered
    * stream; a distributed replay needs a total order, so the window
    * sorts by (ts, event_id) when `event_id` exists, ts alone
    * otherwise — and the binary ops' strict time-increase rule then
    * drops same-timestamp successors deterministically. */
  private def applyTransform(df: DataFrame, op: String,
                             labelCols: Seq[String], resS: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val order =
      if (df.columns.contains("event_id")) Seq(col("ts"), col("event_id"))
      else Seq(col("ts"))
    val w = Window.partitionBy(labelCols.map(col): _*).orderBy(order: _*)
    op match {
      case "Absolute" => df.withColumn("value", abs(col("value")))
      case "Add" =>
        df.withColumn("value",
          sum(when(isnan(col("value")), lit(0.0)).otherwise(col("value")))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      case "PerSecond" | "Increase" =>
        val stepped = df
          .withColumn("_pv", lag("value", 1).over(w))
          .withColumn("_pts", lag("ts", 1).over(w))
        val prevV =
          if (op == "Increase")
            when(isnan(col("_pv")), lit(0.0)).otherwise(col("_pv"))
          else col("_pv")
        val diff = col("value") - prevV
        val v =
          if (op == "PerSecond")
            diff / ((unix_micros(col("ts")) - unix_micros(col("_pts"))) /
              lit(1000000.0))
          else diff
        val keep = col("_pts").isNotNull && col("_pts") < col("ts") &&
          !isnan(col("value")) && diff >= 0 &&
          (if (op == "PerSecond") !isnan(col("_pv")) else lit(true))
        stepped.where(keep).withColumn("value", v).drop("_pv", "_pts")
      case "Reset" =>
        val half = math.max(resS * 500000L, 1L) // µs; ≥ 1 like the reference
        df.withColumn("_dp", explode(array(
            struct(col("ts"), col("value")),
            struct(timestamp_micros(unix_micros(col("ts")) + half).as("ts"),
              lit(0.0).as("value")))))
          .withColumn("ts", col("_dp.ts"))
          .withColumn("value", col("_dp.value"))
          .drop("_dp")
      case t => throw new IllegalArgumentException(s"unknown transformation $t")
    }
  }

  private val unitSeconds =
    Map("minute" -> 60L, "hour" -> 3600L, "day" -> 86400L)

  /** `keepOriginal` is the rollup rule's write-routing flag
    * (reference: src/metrics/rules/rollup.go:122 rollupRuleSnapshot
    * keepOriginal, carried to MatchResult — match_result.go:69): by
    * default a metric consumed by a rollup rule stops flowing to the
    * unaggregated path; keepOriginal=true writes the original series
    * alongside the rollup output. */
  final case class RollupRule(name: String, matchers: Seq[Fetch.Matcher],
                              targets: Seq[RollupTarget],
                              keepOriginal: Boolean = false)

  object RollupRule {
    /** A rollup rule from its config-form filter string
      * (rules/rollup.go:125 ValidateTagsFilter(rawFilter)). */
    def fromFilter(name: String, filter: String,
                   targets: Seq[RollupTarget],
                   keepOriginal: Boolean = false): RollupRule =
      RollupRule(name, Fetch.tagsFilter(filter), targets, keepOriginal)
  }

  final case class RollupRouted(original: DataFrame, rolled: DataFrame)

  /** Apply rollup rules WITH their write routing: `rolled` is
    * [[rollupTargets]]' long-format output; `original` is the
    * unaggregated pass-through — every series except those matched
    * by a rule whose keepOriginal is false (the default drop).
    * A series matched only by keepOriginal rules, or by no rule,
    * passes through. Null tag values don't match a filter (so they
    * are kept), replaying the tag-presence rule.
    *
    * Scale: the drop set is a pure predicate disjunction on the scan
    * — no join, pushdown-eligible like every Fetch matcher. */
  def rollupRoute(samples: DataFrame, rules: Seq[RollupRule],
                  labelCols: Seq[String] = Vectors.labels,
                  percentiles: PercentileMode = Exact): RollupRouted = {
    val dropPred = rules.filterNot(_.keepOriginal)
      .flatMap(r => r.matchers.map(Fetch.predicate).reduceOption(_ && _))
      .reduceOption(_ || _)
    val original = dropPred match {
      case Some(p) => samples.where(!coalesce(p, lit(false)))
      case None    => samples
    }
    RollupRouted(original, rollupTargets(samples, rules, labelCols, percentiles))
  }

  private val MetricNameVar = "{{ .MetricName }}"

  /** newName column per NewRollupOp's template rules (shared with
    * the streaming rollup-target path). */
  private[graft] def newNameCol(newName: String): Column =
    if (newName.contains("{{") || newName.contains("}}")) {
      if (newName.sliding(MetricNameVar.length).count(_ == MetricNameVar) > 1)
        throw new IllegalArgumentException(
          s"rollup contained template variable metric name more than once: $newName")
      val stripped = newName.replaceFirst(
        java.util.regex.Pattern.quote(MetricNameVar), "")
      if (stripped.contains("{{") || stripped.contains("}}"))
        throw new IllegalArgumentException(
          s"rollup contained template tags but variables not resolved: $newName")
      val i = newName.indexOf(MetricNameVar)
      concat(lit(newName.substring(0, i)), col("name"),
        lit(newName.substring(i + MetricNameVar.length)))
    } else lit(newName)

  /** Apply rollup-target rules: each (rule, target) filters its
    * matched series, aggregates across the non-kept dimensions at
    * the target resolution with the target's aggregation set, and
    * emits long-format rows (rule, resolution, name=newName,
    * labels…, bucket_s, agg, value) — dropped dimensions are null
    * columns, so heterogeneous targets union into one frame and the
    * renamed series remain fetchable through [[Fetch]] matchers on
    * (name, kept tags).
    *
    * Scale: each target is ONE hash aggregation with map-side
    * combine — grouping by FEWER keys than the raw series identity
    * only shrinks the shuffle; the new-name column is a literal or
    * a concat over `name`, never a join. */
  def rollupTargets(samples: DataFrame, rules: Seq[RollupRule],
                    labelCols: Seq[String] = Vectors.labels,
                    percentiles: PercentileMode = Exact): DataFrame = {
    require(rules.nonEmpty && rules.forall(_.targets.nonEmpty),
      "empty rollup rule/target set")
    val dims = labelCols.filterNot(_ == "name")
    val types = samples.schema.fields.map(f => f.name -> f.dataType).toMap
    val frames = for { r <- rules; t <- r.targets } yield {
      t.tags.foreach(tag => require(dims.contains(tag),
        s"rollup tag $tag is not a dimension (have: ${dims.mkString(",")})"))
      val kept = t.rollupType match {
        case GroupBy   => dims.filter(t.tags.contains)
        case ExcludeBy => dims.filterNot(t.tags.contains)
      }
      val matched = Fetch(samples, r.matchers)
      // GroupBy: every listed dimension must be PRESENT on the series
      val present0 = t.rollupType match {
        case GroupBy => kept.foldLeft(matched)((df, c) =>
          df.where(col(c).isNotNull))
        case ExcludeBy => matched
      }
      // pipeline transformation ops run per ORIGINAL series, in
      // pipeline order, before the rollup aggregation
      val present = t.transforms.foldLeft(present0)((df, op) =>
        applyTransform(df, op, labelCols,
          unitSeconds.getOrElse(t.resolution, 3600L)))
      val nn = newNameCol(t.newName)
      val bucketed = present
        .withColumn("_rollup_name", nn)
        .withColumn("bucket_s", Vectors.bucketS(t.resolution))
      val aggExprs = t.aggs.map(ruleAgg(_, percentiles))
      val agged = bucketed
        .groupBy(("_rollup_name" +: kept :+ "bucket_s").map(col): _*)
        .agg(aggExprs.head, aggExprs.tail: _*)
      val labelOut = labelCols.map {
        case "name"                  => col("_rollup_name").as("name")
        case c if kept.contains(c)   => col(c)
        case c => lit(null).cast(types(c)).as(c)
      }
      val kv = t.aggs.flatMap(a => Seq(lit(a), col(a)))
      agged.select(
        (lit(r.name).as("rule") +: lit(t.resolution).as("resolution") +:
          labelOut :+ col("bucket_s")) :+
          explode(map(kv: _*)).as(Seq("agg", "value")): _*)
    }
    frames.reduce(_ unionByName _)
  }

  /** A storage policy `resolution:retention` (reference:
    * src/metrics/policy/policy.go:45 `Policy{resolution, retention}`,
    * e.g. 10s:2d, 1m:30d, 1h:1y). Resolution is a fixed-width
    * duration string (`10s`, `1m`, `10m`, `1h`, `1d`, `1w`) — m3
    * resolutions are durations, never calendar units. A retention of
    * `Long.MaxValue` means no time floor. */
  final case class Policy(resolution: String, retentionS: Long = Long.MaxValue)

  private val resUnitS =
    Map("s" -> 1L, "m" -> 60L, "min" -> 60L, "h" -> 3600L,
      "d" -> 86400L, "w" -> 604800L)
  private val resRe = "([0-9]+)(s|min|m|h|d|w)".r

  /** Parse a policy resolution string to seconds. */
  private[tsdb] def resolutionS(r: String): Long = r match {
    case resRe(n, u) => n.toLong * resUnitS(u)
    case _ => throw new IllegalArgumentException(s"bad resolution: $r")
  }

  /** Multi-resolution tiering over an arbitrary policy stack — the
    * m3 storage-policy stack (policy.go:45): the same series rolled
    * up at several resolutions, unioned with a `resolution` tag.
    * Each coarser tier aggregates the output of the FINEST earlier
    * tier whose resolution divides its own (sum/count/min/max
    * compose; mean recomputed from them) instead of rescanning raw
    * samples — at 100 TB only tiers with no divisible finer tier
    * ever read raw data. When `nowS` is given, each tier's policy
    * retention is enforced as a time floor (buckets older than
    * now − retention are outside that tier's namespace).
    */
  def policyStack(samples: DataFrame, policies: Seq[Policy],
                  nowS: Option[Long] = None,
                  labelCols: Seq[String] = Vectors.labels): DataFrame = {
    require(policies.nonEmpty, "empty policy stack")
    val sorted = policies.map(p => (resolutionS(p.resolution), p))
      .sortBy(_._1)
    require(sorted.map(_._1).distinct.size == sorted.size,
      "duplicate resolutions in policy stack")
    // composition edges from resolutions alone: tier i composes
    // from the COARSEST earlier tier that divides it (lastOption of
    // the ascending-sorted divisors — fewest rows; else raw)
    val resList = sorted.map(_._1)
    val sourceOf: Seq[Option[Int]] = resList.zipWithIndex.map {
      case (r, i) => (0 until i).filter(j => r % resList(j) == 0).lastOption
    }
    val isSource = sourceOf.flatten.toSet
    // one retention floor pushed into the SHARED raw scan: anything
    // older than now − max(retention) is outside every tier (each
    // tier still trims by its own bucket floor below, so boundary
    // buckets stay exact — a sample with ts < now−maxRet can only
    // land in buckets that every tier trims)
    val floored = nowS match {
      case Some(now) if sorted.forall(_._2.retentionS != Long.MaxValue) =>
        val maxRet = sorted.map(_._2.retentionS).max
        samples.where(col("ts") >= timestamp_seconds(lit(now - maxRet)))
      case _ => samples
    }
    val keys = (labelCols :+ "bucket_s").map(col)
    // (resS, internal frame): labels…, bucket_s, UNROUNDED sum_v,
    // count_v, min_v, max_v — rounding happens only at the output
    // edge so coarser tiers compose exact partials. Tiers that feed
    // a coarser tier are persisted: without it Catalyst pushes each
    // tier's retention filter into its own copy of the fine
    // aggregation, the branches stop being shareable, and the raw
    // scan + fine rollup run once PER TIER. Call [[clearTierCache]]
    // after materializing (same contract as the shingle cache).
    var tiers = Vector.empty[DataFrame]
    val outs = sorted.zipWithIndex.map { case ((resS, p), i) =>
      val internal0 = sourceOf(i) match {
        case Some(j) =>
          tiers(j)
            .withColumn("bucket_s",
              (floor(col("bucket_s") / resS) * resS).cast("long"))
            .groupBy(keys: _*)
            .agg(
              sum("sum_v").as("sum_v"), sum("count_v").as("count_v"),
              min("min_v").as("min_v"), max("max_v").as("max_v"))
        case None =>
          floored
            .withColumn("bucket_s",
              (floor(unix_timestamp(col("ts")) / resS) * resS).cast("long"))
            .groupBy(keys: _*)
            .agg(
              sum("value").as("sum_v"), count(lit(1)).as("count_v"),
              min("value").as("min_v"), max("value").as("max_v"))
      }
      val internal = if (isSource(i)) tierMemo(internal0) else internal0
      tiers = tiers :+ internal
      val trimmed = nowS match {
        case Some(now) if p.retentionS != Long.MaxValue =>
          internal.where(col("bucket_s") >= lit(now - p.retentionS))
        case _ => internal
      }
      trimmed.select(
        (labelCols.map(col) :+ lit(p.resolution).as("resolution") :+
          col("bucket_s")) ++ Seq(
          round(col("sum_v"), 6).as("sum_v"), col("count_v"),
          col("min_v"), col("max_v"),
          round(col("sum_v") / col("count_v"), 6).as("mean_v")): _*)
    }
    outs.reduce(_ unionByName _)
  }

  /** Memoized per (session, canonicalized tier plan) like the
    * shingle/simhash caches, so repeated policyStack calls (every
    * multiResolution / restrictByType routes here) reuse one
    * persisted copy instead of pinning a fresh partial per call. */
  private def tierMemo(df: DataFrame): DataFrame = {
    val key = (df.sparkSession, df.queryExecution.analyzed.canonicalized)
    graft.Memo.once(tierCache, key)(
      df.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY))
  }

  private val tierCache = scala.collection.concurrent.TrieMap.empty[
    (org.apache.spark.sql.SparkSession,
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan), DataFrame]

  /** Free the composition-source tiers persisted by [[policyStack]]
    * (call after materializing, like Dedup.clearShingleCache). */
  def clearTierCache(): Unit = {
    tierCache.values.foreach(_.unpersist(blocking = false))
    tierCache.clear()
  }

  private[graft] def cachedTierCount: Int = tierCache.size

  /** The default two-tier stack (1h, 1d) — the shape the restrict
    * and multi-res oracle queries pin. */
  val DefaultStack: Seq[Policy] = Seq(Policy("1h"), Policy("1d"))

  /** Two-tier multi-resolution rollup — [[policyStack]] over
    * [[DefaultStack]], kept as the named entry point. */
  def multiResolution(samples: DataFrame,
                      labelCols: Seq[String] = Vectors.labels): DataFrame =
    policyStack(samples, DefaultStack, None, labelCols)

  /** Metric-type restriction — the other half of m3's
    * RestrictQueryOptions (reference: src/query/storage/types.go:197
    * `RestrictByType{MetricsType, StoragePolicy}`, resolved to one
    * cluster namespace by storage/m3/cluster_resolver.go:148-152
    * instead of the default coverage-based fanout). `Unaggregated`
    * reads the raw sample frame; `Aggregated(resolution,
    * retentionS)` pins the fetch to that tier of the multi-res
    * stack, with the policy retention enforced as a time floor
    * (buckets older than now − retention are outside the namespace).
    *
    * Scale: the resolution filter prunes the tier union at plan time
    * (both sides of the multi-res union carry a literal resolution,
    * so Catalyst folds the non-matching branch to an empty scan);
    * the retention bound prunes time partitions. */
  sealed trait MetricsType
  case object Unaggregated extends MetricsType
  final case class Aggregated(resolution: String, retentionS: Long)
    extends MetricsType

  def restrictByType(samples: DataFrame, restrict: MetricsType, nowS: Long,
                     labelCols: Seq[String] = Vectors.labels,
                     policies: Seq[Policy] = DefaultStack): DataFrame =
    restrict match {
      case Unaggregated => samples
      case Aggregated(res, retS) =>
        policyStack(samples, policies, None, labelCols)
          .where(col("resolution") === res &&
            col("bucket_s") >= lit(nowS - retS))
    }

  /** Multi-type restriction — RestrictByTypes, the PLURAL form
    * (`storage/m3/cluster_resolver.go:459`
    * resolveClusterNamespacesForQueryWithTypesRestrictQueryOptions):
    * each restriction resolves independently exactly like
    * [[restrictByType]] and the namespaces APPEND — the one-query
    * raw-vs-rollup comparison surface. Results are served as series
    * on the common (labels…, resolution, ts_s, value) schema, each
    * row tagged by its namespace's resolution attribute ('raw' for
    * unaggregated) the way the reference attaches namespace
    * attributes to each result in the list.
    *
    * Scale: each branch keeps its own pruned single-tier plan (the
    * literal resolution filter folds the other tiers away, as
    * ds_restrict_type's PlanSpec shows); the union adds no shuffle. */
  def restrictByTypes(samples: DataFrame, restricts: Seq[MetricsType],
                      nowS: Long, aggType: String = "mean",
                      labelCols: Seq[String] = Vectors.labels,
                      policies: Seq[Policy] = DefaultStack): DataFrame = {
    require(restricts.nonEmpty, "RestrictByTypes needs at least one restriction")
    val cols = labelCols.map(col)
    restricts.map {
      case Unaggregated =>
        samples.select(cols :+ lit("raw").as("resolution") :+
          unix_timestamp(col("ts")).as("ts_s") :+ col("value"): _*)
      case agg: Aggregated =>
        restrictByType(samples, agg, nowS, labelCols, policies)
          .select(cols :+ col("resolution") :+
            col("bucket_s").as("ts_s") :+ tierValue(aggType).as("value"): _*)
    }.reduce(_ unionByName _)
  }

  /** Whether the resolved namespace covers the whole query range or
    * only its tail (reference: src/dbnode/storage/index/convert +
    * src/query/storage/consolidators QueryFanoutType — surfaced so
    * callers can warn exactly like the coordinator's partial-range
    * header). */
  sealed trait RangeCoverage
  case object CoversAll extends RangeCoverage
  case object CoversPartial extends RangeCoverage

  /** Automatic namespace resolution for a query window — the
    * coordinator's logical plan (reference: src/query/storage/m3/
    * cluster_resolver.go:142 resolveClusterNamespacesForQueryLogicalPlan,
    * single-cluster form with fanout optimization on, so a namespace
    * "covers the range" iff `now − retention ≤ start`):
    *
    *  1. if the unaggregated namespace's retention covers the query
    *     start, fetch raw and stop — it necessarily has every metric
    *     at the finest grain (cluster_resolver.go:166-171);
    *  2. else, of the aggregated policies whose retention covers the
    *     start, take the FINEST resolution (the sort at
    *     cluster_resolver.go:205 `resolvedNamespacesByResolutionAsc`);
    *  3. else, no namespace covers the range: take the LONGEST
    *     retention aggregated policy, but prefer unaggregated when
    *     its retention is at least as long (`completedAttrs.Retention
    *     <= unaggregatedAttrs.Retention` at cluster_resolver.go:257)
    *     — complete data at the most granular resolution wins a tie.
    *
    * `relatedStartsS` replays RelatedQueryOptions
    * (cluster_resolver.go:98-107): a query issued alongside others
    * (the split panels of one dashboard) selects its namespace from
    * the EARLIEST related start so all of them read the same tier.
    * The fetch itself stays bounded to the query's own range, but —
    * faithfully to the reference, which passes
    * namespaceSelectionStart into the logical plan wholesale — the
    * coverage signal is ALSO judged at the widened start, so a
    * widened query can report CoversPartial even when its own range
    * is fully retained.
    */
  def resolveTier(unaggRetentionS: Long, policies: Seq[Policy],
                  nowS: Long, startS: Long,
                  relatedStartsS: Seq[Long] = Nil,
                  fanoutAggregated: Boolean = true): (MetricsType, RangeCoverage) = {
    require(policies.nonEmpty, "empty policy stack")
    val selS = (startS +: relatedStartsS).min
    def covers(retS: Long) = retS == Long.MaxValue || nowS - retS <= selS
    if (covers(unaggRetentionS)) (Unaggregated, CoversAll)
    // FanoutAggregated = FanoutForceDisable (cluster_resolver.go:175):
    // aggregated namespaces are out of contention entirely — the raw
    // namespace serves whatever it has, flagged partial
    else if (!fanoutAggregated) (Unaggregated, CoversPartial)
    else {
      val covering = policies.filter(p => covers(p.retentionS))
      if (covering.nonEmpty) {
        val finest = covering.minBy(p => resolutionS(p.resolution))
        (Aggregated(finest.resolution, finest.retentionS), CoversAll)
      } else {
        val longest = policies.maxBy(_.retentionS)
        if (unaggRetentionS >= longest.retentionS)
          (Unaggregated, CoversPartial)
        else (Aggregated(longest.resolution, longest.retentionS),
          CoversPartial)
      }
    }
  }

  /** Fetch routed through [[resolveTier]] — the un-restricted query
    * path a coordinator user actually hits: the namespace is chosen
    * from the query start, the namespace's retention floors the
    * scan, and the query range bounds the result. Raw fetches keep
    * the sample schema; aggregated fetches return the tier's rollup
    * schema (same frame [[restrictByType]] pins explicitly).
    *
    * Scale: tier choice is plan-time scalar math — the routed plan
    * carries ONE branch (no runtime union of namespaces), so the
    * aggregated path keeps policyStack's single-raw-scan composition
    * and the raw path is just a filtered scan. */
  def fetchAuto(samples: DataFrame, unaggRetentionS: Long,
                policies: Seq[Policy], nowS: Long, startS: Long,
                labelCols: Seq[String] = Vectors.labels,
                relatedStartsS: Seq[Long] = Nil): DataFrame =
    resolveTier(unaggRetentionS, policies, nowS, startS, relatedStartsS) match {
      case (Unaggregated, _) =>
        val floorS = math.max(startS,
          if (unaggRetentionS == Long.MaxValue) Long.MinValue
          else nowS - unaggRetentionS)
        samples.where(col("ts") >= timestamp_seconds(lit(floorS)) &&
          col("ts") < timestamp_seconds(lit(nowS)))
      case (agg: Aggregated, _) =>
        restrictByType(samples, agg, nowS, labelCols, policies)
          .where(col("bucket_s") >= lit(startS) && col("bucket_s") < lit(nowS))
    }

  /** Resolved-namespace fetch surfaced as SERIES — how the
    * coordinator actually serves data out of an aggregated
    * namespace: the tier's stored aggregate (the namespace's
    * configured aggregation type; mean is m3's gauge default)
    * becomes the series datapoints, timestamped at the bucket, so
    * the query engine runs unchanged over whichever namespace
    * resolution picked. Both routes return the same
    * (labels…, ts, value) schema. */
  def fetchAutoSeries(samples: DataFrame, unaggRetentionS: Long,
                      policies: Seq[Policy], nowS: Long, startS: Long,
                      aggType: String = "mean",
                      labelCols: Seq[String] = Vectors.labels,
                      relatedStartsS: Seq[Long] = Nil): DataFrame = {
    val fetched = fetchAuto(samples, unaggRetentionS, policies, nowS, startS,
      labelCols, relatedStartsS)
    val cols = labelCols.map(col)
    if (fetched.columns.contains("resolution"))
      fetched.select(cols :+ timestamp_seconds(col("bucket_s")).as("ts") :+
        tierValue(aggType).as("value"): _*)
    else fetched.select(cols :+ col("ts") :+ col("value"): _*)
  }

  /** The tier column serving as series datapoints for a namespace's
    * configured aggregation type (mean is m3's gauge default). */
  private def tierValue(aggType: String) = aggType match {
    case "mean" => col("mean_v")
    case "sum" => col("sum_v")
    case "min" => col("min_v")
    case "max" => col("max_v")
    case "count" => col("count_v").cast("double")
    case other =>
      throw new IllegalArgumentException(s"unknown agg type: $other")
  }

  /** Multi-namespace fanout fetch — the reference can serve ONE query
    * from SEVERAL namespaces and stitch the responses (fanoutStorage,
    * src/query/storage/fanout/storage.go:50, over the multi-namespace
    * return of cluster_resolver.go:142): when the resolved aggregated
    * namespace's rollups lag behind `now` by a data latency, its
    * response is NARROWED to the buckets that exist
    * (cluster_resolver.go:364 `dataAvailableUntil = now − latency`
    * truncated to the resolution) and the unaggregated namespace is
    * added, narrowed to START at that same boundary
    * (`mustStitchWithUnaggregated`, cluster_resolver.go:484;
    * narrowQueryOpts, storage.go:923) — rolled-up-old ∪ raw-recent in
    * one result.
    *
    * The boundary lands on a bucket edge by construction (truncated
    * to the tier resolution), so the two branches are time-disjoint
    * and the union IS the series merge — the consolidator's
    * cross-namespace series dedup has nothing to drop. With no
    * latency (or a raw-covered start) this degrades to exactly the
    * single-namespace [[fetchAutoSeries]] route, byte-identically.
    *
    * Scale: two PRUNED branches, not a double-scan — the aggregated
    * branch's bucket range pushes through the rollup's grouping
    * column to its scan, and the raw branch carries a pushed-down
    * ts >= boundary predicate covering only `latency` worth of
    * samples (PlanSpec audits both). */
  def fetchFanoutSeries(samples: DataFrame, unaggRetentionS: Long,
                        policies: Seq[Policy], nowS: Long, startS: Long,
                        aggLatencyS: Long = 0L, aggType: String = "mean",
                        labelCols: Seq[String] = Vectors.labels,
                        relatedStartsS: Seq[Long] = Nil): DataFrame =
    fetchFanoutTagged(samples, unaggRetentionS, policies, nowS, startS,
      aggLatencyS, aggType, labelCols, relatedStartsS).drop("_tier")

  /** The fanout fetch with every row tagged by its SERVING namespace
    * kind — shared by [[fetchFanoutSeries]] (drops the tag) and
    * [[fanoutMetadataStats]] (counts it), so the stats can never
    * disagree with the fetch about which branch served a row. */
  private def fetchFanoutTagged(samples: DataFrame, unaggRetentionS: Long,
                                policies: Seq[Policy], nowS: Long,
                                startS: Long, aggLatencyS: Long,
                                aggType: String,
                                labelCols: Seq[String],
                                relatedStartsS: Seq[Long]): DataFrame =
    resolveTier(unaggRetentionS, policies, nowS, startS, relatedStartsS) match {
      case (agg: Aggregated, _) if aggLatencyS > 0 &&
          ((nowS - aggLatencyS) / resolutionS(agg.resolution)) *
            resolutionS(agg.resolution) < nowS =>
        val resS = resolutionS(agg.resolution)
        val availS = ((nowS - aggLatencyS) / resS) * resS
        val cols = labelCols.map(col)
        val aggSeries = restrictByType(samples, agg, nowS, labelCols, policies)
          .where(col("bucket_s") >= lit(startS) && col("bucket_s") < lit(availS))
          .select(cols :+ timestamp_seconds(col("bucket_s")).as("ts") :+
            tierValue(aggType).as("value"): _*)
          .withColumn("_tier", lit("aggregated"))
        val rawStartS = Seq(availS, startS,
          if (unaggRetentionS == Long.MaxValue) Long.MinValue
          else nowS - unaggRetentionS).max
        val raw = samples
          .where(col("ts") >= timestamp_seconds(lit(rawStartS)) &&
            col("ts") < timestamp_seconds(lit(nowS)))
          .select(cols :+ col("ts") :+ col("value"): _*)
          .withColumn("_tier", lit("unaggregated"))
        aggSeries.unionByName(raw)
      case (tier, _) =>
        fetchAutoSeries(samples, unaggRetentionS, policies, nowS, startS,
          aggType, labelCols, relatedStartsS)
          .withColumn("_tier", lit(tier match {
            case Unaggregated => "unaggregated"
            case _: Aggregated => "aggregated"
          }))
    }

  /** ResultMetricMetadata's namespace halves (block/meta.go:66-71
    * Aggregated/Unaggregated): per metric name, how many distinct
    * series the fanout fetch served from the aggregated vs the
    * unaggregated namespace — a series stitched from BOTH branches
    * (the latency split) counts in both, exactly as the coordinator
    * increments per fetched series per namespace. Capped at the
    * heaviest `maxNames` names like [[Fetch.metricMetadataStats]],
    * whose WithSamples/NoSamples columns complete the struct.
    *
    * Scale: the tagged fanout collapses to per-(name, tier) distinct
    * series counts — map-side combined, nothing sample-sized
    * shuffles beyond the fetch itself. */
  def fanoutMetadataStats(samples: DataFrame, unaggRetentionS: Long,
                          policies: Seq[Policy], nowS: Long, startS: Long,
                          aggLatencyS: Long = 0L,
                          labelCols: Seq[String] = Vectors.labels,
                          maxNames: Int = 10): DataFrame = {
    val rest = labelCols.filterNot(_ == "name")
    val series = struct(rest.map(col): _*)
    fetchFanoutTagged(samples, unaggRetentionS, policies, nowS, startS,
      aggLatencyS, "mean", labelCols, Nil)
      .groupBy("name").agg(
        count_distinct(when(col("_tier") === "aggregated", series))
          .as("aggregated"),
        count_distinct(when(col("_tier") === "unaggregated", series))
          .as("unaggregated"))
      .orderBy((col("aggregated") + col("unaggregated")).desc,
        col("name").asc)
      .limit(maxNames)
  }
}
