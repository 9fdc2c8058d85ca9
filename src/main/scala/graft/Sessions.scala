package graft

import org.apache.spark.sql.SparkSession

/** Standard session config shared by Verify, Bench and the specs. */
object Sessions {
  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet is TIMESTAMP(NANOS); read as long + convert
      // (see Tables.events)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // AQE on: runtime re-plan, skew-join handling, auto broadcast
      .config("spark.sql.adaptive.enabled", "true")
      // write timestamps as INT64 micros: INT96 is deprecated and
      // carries no usable min/max stats, which would defeat ts
      // row-group/page pruning on the SeriesStore layout
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // bucketed-table warehouse (SeriesStore tests) outside the repo
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
}
