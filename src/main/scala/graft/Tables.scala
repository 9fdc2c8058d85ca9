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

  /** events.parquet stores TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` (see [[Sessions]]),
    * so `ts` arrives as nanos-since-epoch LONG; convert to a
    * microsecond TimestampType here (lossless: the generator writes
    * µs-precision values). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = apply(spark, dir, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    else raw
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
