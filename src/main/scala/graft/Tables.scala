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
    *    and is skipped. The partition probe plans the frame but runs
    *    no job.
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
    if (df.rdd.getNumPartitions >= n) df else df.repartition(n, key)
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
