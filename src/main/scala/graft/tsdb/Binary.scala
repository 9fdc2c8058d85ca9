package graft.tsdb

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binary operations with vector matching — the m3 `binary` function
  * family (reference: src/query/functions/binary/…go files).
  *
  * PromQL binary ops match samples of two vectors whose label sets
  * agree on the matching labels (here: `on`). Arithmetic/comparison
  * produce a value per matched pair; and/or/unless are set ops on
  * series identity (binary/and.go, or.go, unless.go).
  *
  * Scale: both inputs are instant frames (already aggregated —
  * series-cardinality rows, not raw samples), so the equi-join on
  * (on…, bucket_s) is small; AQE turns it into a broadcast join
  * whenever one side fits, and both sides share the same hash
  * partitioning when they derive from the same upstream instant
  * frame, so the exchange is often reused.
  */
object Binary {

  private def joined(lhs: DataFrame, rhs: DataFrame, on: Seq[String]) =
    lhs.withColumnRenamed("value", "lv")
      .join(rhs.withColumnRenamed("value", "rv"), on :+ "bucket_s")

  /** + − × ÷ % ^ (binary/arithmetic.go). Division by zero yields
    * null (SQL) rather than ±Inf (m3/IEEE) — documented divergence,
    * comparable across engines. */
  def arithmetic(lhs: DataFrame, rhs: DataFrame, on: Seq[String]): DataFrame =
    joined(lhs, rhs, on).select(
      (on :+ "bucket_s").map(col) ++ Seq(
        round(col("lv") + col("rv"), 6).as("add_v"),
        round(col("lv") - col("rv"), 6).as("sub_v"),
        round(col("lv") * col("rv"), 6).as("mul_v"),
        round(when(col("rv") =!= 0, col("lv") / col("rv")), 6).as("div_v"),
        round(when(col("rv") =!= 0, col("lv") % col("rv")), 6).as("mod_v"),
        round(pow(col("lv"), col("rv") / lit(100.0)), 6).as("pow_v")): _*)

  /** == != > < >= <= as filters (binary/comparison.go): PromQL
    * comparison drops non-matching samples; we emit the matched pair
    * with per-op boolean flags plus the filtered `gt` value the way
    * `lhs > rhs` would. */
  def comparison(lhs: DataFrame, rhs: DataFrame, on: Seq[String]): DataFrame =
    joined(lhs, rhs, on).select(
      (on :+ "bucket_s").map(col) ++ Seq(
        (col("lv") > col("rv")).cast("int").as("gt_v"),
        (col("lv") >= col("rv")).cast("int").as("ge_v"),
        (col("lv") < col("rv")).cast("int").as("lt_v"),
        (col("lv") <= col("rv")).cast("int").as("le_v"),
        (col("lv") === col("rv")).cast("int").as("eq_v"),
        (col("lv") =!= col("rv")).cast("int").as("ne_v")): _*)

  /** PromQL `ignoring(...)` matching (binary/common.go:44-53
    * `Without` flag; hashFunc with on=false at common.go:22-33): the
    * join key is every label shared by both sides *except* the
    * ignored set. One-to-one cardinality; output keys = the matching
    * labels. */
  def opIgnoring(lhs: DataFrame, rhs: DataFrame, ignored: Seq[String],
                 op: (Column, Column) => Column, as: String): DataFrame = {
    val on = (lhs.columns.toSet
      .intersect(rhs.columns.toSet) -- ignored -- Set("value", "bucket_s"))
      .toSeq.sorted
    val keys = (on :+ "bucket_s").map(col)
    val l = lhs.select(keys :+ col("value").as("lv"): _*)
    val r = rhs.select(keys :+ col("value").as("rv"): _*)
    l.join(r, on :+ "bucket_s")
      .select(keys :+ op(col("lv"), col("rv")).as(as): _*)
  }

  /** Many-to-one `group_left` (binary/common.go:89-103
    * CardManyToOne): every lhs sample joins the unique rhs series
    * sharing the `on` labels at that instant; the lhs's full label
    * set is preserved. `group_right` (CardOneToMany) is the mirror
    * image — call with the sides swapped.
    *
    * Scale: the "one" side is pre-aggregated (≤ one row per on-group
    * per instant — tiny), so AQE broadcasts it and the many side
    * never shuffles. */
  def groupLeft(lhs: DataFrame, rhs: DataFrame, on: Seq[String],
                op: (Column, Column) => Column, as: String): DataFrame = {
    val r = rhs.select((on :+ "bucket_s").map(col) :+ col("value").as("rv"): _*)
    lhs.join(r, on :+ "bucket_s")
      .withColumn(as, op(col("value"), col("rv")))
      .drop("rv")
  }

  /** PromQL comparison *filter* semantics (binary/comparison.go:50):
    * `lhs > rhs` keeps the matched lhs samples where the comparison
    * holds — value stays the lhs value, non-matching pairs drop. */
  def comparisonFilter(lhs: DataFrame, rhs: DataFrame, on: Seq[String],
                       cmp: (Column, Column) => Column): DataFrame =
    joined(lhs, rhs, on)
      .where(cmp(col("lv"), col("rv")))
      .select((on :+ "bucket_s").map(col) :+ col("lv").as("value"): _*)

  /** `bool` modifier (binary/comparison.go:63): every matched pair is
    * kept and the value becomes 1.0 / 0.0. */
  def comparisonBool(lhs: DataFrame, rhs: DataFrame, on: Seq[String],
                     cmp: (Column, Column) => Column): DataFrame =
    joined(lhs, rhs, on)
      .select((on :+ "bucket_s").map(col) :+
        cmp(col("lv"), col("rv")).cast("double").as("value"): _*)

  /** lhs and rhs: lhs samples whose series exist in rhs at the same
    * instant (binary/and.go) — a left-semi join. */
  def and(lhs: DataFrame, rhs: DataFrame, on: Seq[String]): DataFrame =
    lhs.join(rhs.select((on :+ "bucket_s").map(col): _*).distinct(),
      on :+ "bucket_s", "left_semi")

  /** lhs unless rhs: lhs samples whose series do NOT exist in rhs at
    * that instant (binary/unless.go) — a left-anti join. */
  def unless(lhs: DataFrame, rhs: DataFrame, on: Seq[String]): DataFrame =
    lhs.join(rhs.select((on :+ "bucket_s").map(col): _*).distinct(),
      on :+ "bucket_s", "left_anti")

  /** lhs or rhs: all lhs samples plus rhs samples whose series are
    * absent from lhs at that instant (binary/or.go). */
  def or(lhs: DataFrame, rhs: DataFrame, on: Seq[String]): DataFrame = {
    val cols = (on :+ "bucket_s" :+ "value").map(col)
    val l = lhs.select(cols: _*)
    val rOnly = rhs.select(cols: _*)
      .join(lhs.select((on :+ "bucket_s").map(col): _*).distinct(),
        on :+ "bucket_s", "left_anti")
    l.unionByName(rOnly)
  }
}
