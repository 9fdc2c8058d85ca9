package graft.tsdb

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar-producing operators — the m3 `scalar` function family
  * (reference: src/query/functions/scalar/scalar.go:54,
  * scalar/time.go:57).
  *
  * In PromQL a scalar is one value per evaluation instant. Here a
  * *scalar frame* is (bucket_s, scalar_v) — joined back onto vector
  * frames by instant (always broadcastable: one row per instant).
  */
object Scalar {

  /** scalar(v): the single series' value at each instant if the
    * vector has exactly one series, else NaN
    * (scalar/scalar.go semantics via PromQL). */
  def scalarOf(instant: DataFrame): DataFrame =
    instant.groupBy("bucket_s")
      .agg(count(lit(1)).as("n"), min("value").as("v"))
      .select(col("bucket_s"),
        when(col("n") === 1, col("v")).otherwise(lit(Double.NaN)).as("scalar_v"))

  /** time(): the evaluation instant itself (epoch seconds) as a
    * double value (scalar/time.go:57). */
  def timeCol: Column = col("bucket_s").cast("double")
}
