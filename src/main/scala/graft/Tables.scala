package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables.
  *
  * Every query goes through these so the read is a plain parquet scan
  * that Catalyst can prune/push into: call sites `.select(...)` only
  * the columns they need and filter as early as possible, which shows
  * up as `ReadSchema`/`PushedFilters` on the scan node. At 100 TB the
  * same loaders would point at a dt=/hour= partitioned layout and
  * partition pruning would kick in for every time-bounded query.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    require(all.contains(name), s"unknown table $name")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** `ts` normalization across the generator's parquet shapes. The
    * driver has written events.parquet as TIMESTAMP(NANOS) (Spark's
    * vectorized reader rejects it; Sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` so it arrives as
    * nanos-since-epoch LONG) and as TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) (arrives as TIMESTAMP_NTZ). Both are
    * UTC wall-clock microsecond values; normalize to TimestampType
    * so every downstream unix_micros/window/date_trunc sees one type
    * (sessions run in UTC, so the NTZ cast is value-identical). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val raw = apply(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")

  /** Pinned-count fan-out for SYNTHESIZED frames whose downstream
    * map work is a large multiple of their bytes — the line-protocol
    * roundtrips: the rendered `lines` frame inherits the events
    * scan's 1-2 file splits at test scale, so the whole regex parse
    * chain runs on 1-2 cores while the other 30 idle (measured ~2× on
    * ts_influx; the suffix-chain rewrite found the same class of
    * starvation). Three deliberate choices, each measured:
    *  - CONDITIONAL: when the input already carries ≥ the session's
    *    shuffle parallelism (the 100 TB case — thousands of splits),
    *    the exchange is pure overhead (sf10 A/B: +5% on ts_influx)
    *    and is skipped. The width probe is STATIC ([[staticWidth]]):
    *    it inspects the unexecuted physical plan and never submits a
    *    job — an earlier `df.rdd.getNumPartitions` probe would, under
    *    AQE, execute every shuffle stage in the input's lineage and
    *    throw the results away (the probe's QueryExecution shares no
    *    shuffle reuse with the real run). Inputs whose width is not
    *    statically knowable (anything behind a planner-inserted or
    *    AQE-coalescable exchange) are fanned: AQE coalesces such
    *    exchanges to one partition at ~MB sizes, which is exactly
    *    the starvation this exists to prevent, and the extra keyed
    *    exchange is noise next to the heavy map work every caller
    *    attaches.
    *  - KEYED, not round-robin: RoundRobinPartitioning sorts each
    *    partition by ALL columns first (retry determinism,
    *    sortBeforeRepartition) — hashing the given key costs one
    *    hash per row instead and is deterministic by construction.
    *  - REPARTITION_BY_NUM: a column-only `repartition(col)` or
    *    AQE-advisory exchange would be coalesced right back to one
    *    partition at ~MB sizes (measured: the whole md5 chain on one
    *    core). The pinned count is not coalescable. */
  def fan(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame = {
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    staticWidth(df) match {
      case Some(w) if w >= n => df
      case _ => df.repartition(n, key)
    }
  }

  /** Output-partition width of `df` derived from the UNEXECUTED
    * physical plan — plan compilation only, no job. `None` means the
    * width is decided at runtime (a planner-inserted or AQE-advisory
    * exchange sits on the lineage, whose final count the coalescer
    * picks from live statistics). Rules, top-down:
    *  - user `repartition(n, …)` pins its count (REPARTITION_BY_NUM
    *    is AQE-exempt); every other shuffle origin is coalescable
    *    → unknown;
    *  - leaf scans know their split/partition counts statically
    *    (file listing is driver-side metadata, not a job);
    *  - `coalesce(n)` caps its child;
    *  - unary operators that demand no distribution pass their
    *    child's width through; anything that demands one (final
    *    aggregates, joins, windows, limits) gets an exchange from
    *    EnsureRequirements later — sparkPlan predates that rule, so
    *    the demand itself marks the width unknown. */
  private[graft] def staticWidth(df: DataFrame): Option[Int] = {
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.exchange.{REPARTITION_BY_NUM, ShuffleExchangeLike}
    import org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution
    def width(p: SparkPlan): Option[Int] = p match {
      case s: ShuffleExchangeLike =>
        if (s.shuffleOrigin == REPARTITION_BY_NUM) Some(s.numPartitions)
        else None
      case c: CoalesceExec => width(c.child).map(math.min(_, c.numPartitions))
      case f: FileSourceScanExec => Some(f.inputRDD.getNumPartitions)
      case r: RDDScanExec => Some(r.rdd.getNumPartitions)
      case _: LocalTableScanExec => Some(1)
      case u: UnionExec =>
        val ws = u.children.map(width)
        if (ws.forall(_.isDefined)) Some(ws.flatten.sum) else None
      case o if o.children.size == 1 &&
          o.requiredChildDistribution.forall(_ == UnspecifiedDistribution) =>
        width(o.children.head)
      case _ => None
    }
    width(df.queryExecution.sparkPlan)
  }

  /** Same drift insurance as [[events]]: the generator has shipped
    * `embedding` as list<float>; if a regeneration ever widens it to
    * list<double>, normalize back so every sim_/dedup_ operator (and
    * the codegen DotProduct, which is Float-typed) sees one type. */
  def embeddings(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val raw = apply(spark, dir, "embeddings")
    raw.schema("embedding").dataType match {
      case ArrayType(DoubleType, _) =>
        raw.withColumn("embedding",
          org.apache.spark.sql.functions.col("embedding").cast("array<float>"))
      case _ => raw
    }
  }
}
