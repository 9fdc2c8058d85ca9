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
    * scan's 1-2 file splits, so the whole regex parse chain runs on
    * 1-2 cores while the other 30 idle (measured ~2× on ts_influx
    * even under load; the suffix-chain rewrite found the same class
    * of starvation). REPARTITION_BY_NUM on purpose: a column-less
    * `repartition(col)` or AQE-advisory exchange would be coalesced
    * right back to one partition at this byte size. At 100 TB real
    * ingest arrives across thousands of splits and the exchange
    * moves 1× line bytes to balance ~20× parse work — still the
    * right trade wherever a single hot split feeds a parser. */
  def fan(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions)

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
