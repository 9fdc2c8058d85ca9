package graft.sources

import graft.Materialize.MatOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage layout for the 100 TB path — the Spark-native replacement
  * for the reference's custom storage engine (m3db's commit log /
  * block store, which SURVEY §1 deliberately does not port).
  *
  * Samples are written as parquet, *partitioned by day* (`dt=`) and
  * *bucketed by the series key* (name, user_id):
  *
  *  - *Partition pruning*: every time-bounded query (all of them —
  *    m3 queries always carry a range) reads only the matching dt=
  *    directories; the pruning shows up as `PartitionFilters` on the
  *    scan (asserted in StoreSpec).
  *  - *Bucketing*: per-series operators (the whole temporal family,
  *    consolidation, binary vector matching) need a hash
  *    distribution on the series key. Reading a bucketed table gives
  *    Spark that distribution for free, so groupBy/window/join on
  *    (name, user_id) runs with NO shuffle — at 1000 executors this
  *    removes the single biggest exchange in every query (asserted
  *    in StoreSpec: zero Exchange nodes in the bucketed agg plan).
  *  - The in-bucket `sortBy (name, user_id, ts)` keeps files
  *    clustered by series AND time-ordered within each series. Two
  *    wins: per-series scans are sequential reads, and the parquet
  *    min/max statistics become tight — a row group (or page, via
  *    the column index) inside one series' run covers a narrow ts
  *    span, so sub-day time-range predicates skip most of the file
  *    at read time (measured in StoreSpec: a 5 % ts window reads
  *    ~21 % of rows — row-group granularity — instead of the 100 %
  *    the series-only sort reads).
  *    This is the intra-day analogue of the dt= partition pruning —
  *    the same role m3db's time-windowed blocks play
  *    (/root/reference/src/dbnode/storage/block/block.go).
  *
  * Uses `saveAsTable` (bucket metadata lives in the catalog; plain
  * `save` cannot record bucketing). Bucket counts should be sized so
  * a bucket's largest partition fits an executor: at 100 TB /
  * 365 days / 1024 buckets ≈ 270 MB per (day, bucket) — right-sized.
  */
object SeriesStore {

  /** Bucket count sized to the sample volume — one bucket per ~250k
    * samples, clamped to [8, 1024]. The bucket count is the table's
    * permanent read parallelism (the zero-exchange property hands
    * the bucket distribution straight to every per-series operator,
    * so there is no AQE re-split downstream): too few buckets caps
    * the whole query at that width forever. 10× data at a fixed 8
    * buckets measured 5× wall-clock on the bucketed rollup — the
    * definition of a silent scale cliff; sizing at creation keeps
    * per-bucket volume flat as the corpus grows. At the 100 TB
    * design point the clamp lands on 1024 — the ≈270 MB/(day,
    * bucket) sizing in the layout comment above. Costs one
    * metadata-cheap count at table creation. */
  def sizedBuckets(samples: DataFrame): Int =
    math.min(1024L, math.max(8L, samples.count() / 250000L)).toInt

  /** Choose (buckets, dt granularity) from the sample volume — the
    * analogue of m3db's per-namespace block-size configuration
    * (/root/reference/src/dbnode/storage/namespace — hot namespaces
    * get 2 h blocks, archival ones days): a fixed day×bucket grid
    * that is right at 100 TB (≈270 MB files) degenerates at small
    * volumes into thousands of KB-sized files whose open/footer cost
    * dominates every read (measured: 7 680 files, 2.6 s to COUNT a
    * 21 MB table). One aggregate computes rows and the time span;
    * buckets target ~250k samples each, then the dt granularity is
    * the FINEST of day/month/year that keeps a (dt, bucket) file
    * ≥ ~50k rows. Coarser dt trades partition-pruning resolution for
    * sane file sizes — the in-bucket (series, ts) sort still prunes
    * sub-partition ranges via row-group stats, so time-bounded reads
    * stay cheap (StoreSpec measures it). */
  def layoutFor(samples: DataFrame): (Int, String) = {
    val r = samples.agg(count(lit(1)).as("n"),
      min("ts").as("mn"), max("ts").as("mx")).head()
    val rows = r.getLong(0)
    val days = math.max(1L, java.time.Duration.between(
      r.getTimestamp(1).toInstant, r.getTimestamp(2).toInstant).toDays + 1)
    val buckets = math.min(1024L, math.max(8L, rows / 250000L))
    val perFile = Seq("day" -> days, "month" -> math.max(1L, days / 30),
      "year" -> math.max(1L, days / 365))
    val granularity = perFile
      .collectFirst { case (g, periods)
        if rows / (periods * buckets) >= 50000L => g }
      .getOrElse("year")
    (buckets.toInt, granularity)
  }

  /** Table property recording the dt granularity for [[read]]. */
  private val GranularityProp = "graft.dt.granularity"

  /** Write a sample frame (name, user_id, ts, value, event_id) as a
    * dt-partitioned, series-bucketed table. Idempotent: drops a
    * stale catalog entry AND any orphaned warehouse location (a
    * fresh in-memory catalog does not know about directories a
    * previous session left behind, and CTAS refuses to reuse them).
    * `granularity` (day/month/year, see [[layoutFor]]) sets the dt
    * partition key's resolution and is recorded on the table so
    * readers floor their bounds to it. */
  def write(samples: DataFrame, table: String, buckets: Int = 8,
            granularity: String = "day"): Unit = {
    val spark = samples.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    samples
      .withColumn("dt", to_date(date_trunc(granularity, col("ts"))))
      .write.mode("overwrite")
      .partitionBy("dt")
      .bucketBy(buckets, "name", "user_id")
      .sortBy("name", "user_id", "ts")
      .format("parquet")
      .saveAsTable(table)
    spark.sql(
      s"ALTER TABLE `$table` SET TBLPROPERTIES('$GranularityProp'='$granularity')")
  }

  /** Compact a dt range in place — the analogue of m3db's background
    * compaction (/root/reference/src/dbnode/storage/compaction): a
    * long-running ingest lands many small files per (day, bucket)
    * (one per writing task per batch); compaction rewrites each
    * touched day to exactly ONE file per bucket, time-sorted.
    *
    * Mechanics: snapshot the range (localCheckpoint truncates the
    * lineage so Spark allows overwriting the table being read),
    * then `repartition(buckets, name, user_id)` — the SAME
    * murmur3-pmod assignment bucketing uses, so every task holds
    * exactly one bucket's rows and writes exactly one file — and
    * dynamic partition overwrite replaces only the touched days.
    * Readers keep the bucket distribution (zero-exchange per-series
    * ops) and gain back the row-group stats a fragmented layout
    * erodes. StoreSpec measures: files per day collapse to
    * `buckets`, rows byte-identical, reads still exchange-free. */
  def compact(spark: SparkSession, table: String,
              fromDt: Option[String] = None,
              untilDt: Option[String] = None,
              buckets: Int = 8): Unit = {
    val snap = read(spark, table, fromDt, untilDt).materialize(true)
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val cols = spark.table(table).columns // insertInto is positional
      // no manual sort: a partitioned+bucketed insert REQUIRES
      // ordering (dt, bucket-id, name, user_id, ts) and the write
      // path adds that sort itself — the table's sortBy metadata is
      // what produces the time-sorted files
      snap
        .repartition(buckets, col("name"), col("user_id"))
        .select(cols.map(col): _*)
        .write.mode("overwrite").insertInto(table)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }

  /** Read the table back; `fromDt`/`untilDt` bound the partitions
    * read ([from, until) on the dt= key — prunes at planning time).
    * The lower bound floors to the table's dt granularity so a
    * month/year-partitioned table still includes the partition a
    * mid-period `fromDt` falls in (pruning semantics: the exact row
    * bound is the caller's ts predicate, as in store_fetch). */
  def read(spark: SparkSession, table: String,
           fromDt: Option[String] = None,
           untilDt: Option[String] = None): DataFrame = {
    val gran = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .properties.getOrElse(GranularityProp, "day")
    val t = spark.table(table)
    val bounded = Seq(
      fromDt.map(d => col("dt") >= to_date(date_trunc(gran, lit(d)))),
      untilDt.map(d => col("dt") < lit(d))).flatten
    bounded.foldLeft(t)((df, p) => df.where(p))
  }

  /** Append one micro-batch to the layout (creating the table on the
    * first batch): same dt partitioning, bucket hash and in-bucket
    * time sort as [[write]], so readers keep zero-exchange
    * per-series plans across appended data. */
  def appendBatch(batch: DataFrame, table: String, buckets: Int = 8): Unit = {
    val spark = batch.sparkSession
    val withDt = batch.withColumn("dt", to_date(col("ts")))
    val exists = spark.catalog.tableExists(table)
    if (!exists) {
      // a location left behind without a metastore entry (a prior
      // JVM's warehouse) is unreadable garbage — clear it so the
      // create succeeds, same as [[write]]; an EXISTING table is
      // never touched (restart-append relies on it)
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), table)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    val mode = if (exists) "append" else "errorifexists"
    withDt.write.mode(mode)
      .partitionBy("dt")
      .bucketBy(buckets, "name", "user_id")
      .sortBy("name", "user_id", "ts")
      .format("parquet")
      .saveAsTable(table)
  }

  /** Continuous ingest into the bucketed layout — m3db's commit-log →
    * flush path restated over Structured Streaming: each micro-batch
    * appends bucketed, time-sorted files under its dt partitions via
    * [[appendBatch]] (exactly-once per batch under the checkpoint).
    * Small files accumulate one-per-bucket-per-batch — m3db's
    * flush-per-block behavior — and [[compact]] is the background
    * pass that folds a day back to one file per bucket. */
  def streamWrite(samples: DataFrame, table: String,
                  checkpoint: String,
                  buckets: Int = 8): org.apache.spark.sql.streaming.StreamingQuery =
    samples.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        appendBatch(batch, table, buckets)
      }
      .start()
}
