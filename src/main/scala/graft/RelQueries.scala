package graft

import graft.Materialize.MatOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational / warehouse queries (SURVEY §2G) — the Spark-first
  * capability proof on the TPC-H-ish tables. Monetary aggregates go
  * through DECIMAL so the sums are exact and match the oracle
  * bit-for-bit regardless of partial-aggregation order.
  *
  * Scale notes per query in Scaladoc; dims (region, nation, and at
  * real scale part/supplier) broadcast — verified in PlanSpec.
  */
object RelQueries {

  private def dec2(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")
  private def dec6(c: org.apache.spark.sql.Column) = c.cast("decimal(18,6)")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape: one scan, map-side partial agg, 4-group output.
    // The shipdate filter is pushed to the parquet scan.
    "q1_agg" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .where(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base"),
          sum(dec6(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          sum(dec6(col("l_extendedprice") * (lit(1) - col("l_discount")) *
            (lit(1) + col("l_tax")))).cast("double").as("sum_charge"),
          round(avg("l_quantity"), 6).as("avg_qty"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // ROLLUP hierarchy (warehouse subtotal/grand-total shape): one
    // scan, Expand for the grouping sets, hash agg — exact DECIMAL
    // sums so partial-agg order cannot shift the totals.
    "q_rollup" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .rollup("l_returnflag", "l_linestatus")
        .agg(
          sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    // CUBE over two dimensions — all four grouping sets in one scan.
    "q_cube" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .cube("l_returnflag", "l_linestatus")
        .agg(
          sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    // Q3 shape: selective dim filter → join → agg. customer side is
    // filtered before the join; join keys shuffle-hash with AQE.
    "q3_join" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
        .where(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val o = Tables.orders(s, dir)
        .where(col("o_orderdate") < to_timestamp(lit("1998-03-15 00:00:00")))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val l = Tables.lineitem(s, dir)
        .where(col("l_shipdate") > to_timestamp(lit("1998-03-15 00:00:00")))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(sum(dec6(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .cast("double").as("revenue"))
        .select(col("l_orderkey"),
          unix_timestamp(col("o_orderdate")).as("orderdate_s"), col("revenue"))
        .orderBy("l_orderkey")
    }),

    // Q5 star shape: two broadcast dims (region, nation) + three fact
    // joins. region/nation are broadcast explicitly — at 100 TB these
    // stay < 1 MB while lineitem is the 100 TB side.
    "q5_star" -> ((s, dir) => {
      val r = Tables.region(s, dir).where(col("r_name") === "ASIA")
      val n = Tables.nation(s, dir)
      val c = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
      val o = Tables.orders(s, dir)
        .where(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("o_orderdate") < to_timestamp(lit("1997-01-01 00:00:00")))
        .select("o_orderkey", "o_custkey")
      val l = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      val sup = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(sum(dec6(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy("n_name")
    }),

    // semi/anti join pair: customers with a big order and no 'F'
    // order. Both subqueries broadcast their (distinct-key) side.
    "q_semi_anti" -> ((s, dir) => {
      val c = Tables.customer(s, dir).select("c_custkey", "c_name")
      val big = Tables.orders(s, dir).where(col("o_totalprice") > 400000)
        .select("o_custkey")
      val f = Tables.orders(s, dir).where(col("o_orderstatus") === "F")
        .select("o_custkey")
      c.join(big, col("c_custkey") === big("o_custkey"), "left_semi")
        .join(f, col("c_custkey") === f("o_custkey"), "left_anti")
        .orderBy("c_custkey")
    }),

    // window rank per group: top-3 orders per customer. One shuffle
    // on o_custkey; no global sort.
    "q_window_rank" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, dir).select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rk", row_number().over(w).cast("long"))
        .where(col("rk") <= 3)
        .orderBy("o_custkey", "rk")
    }),

    // gap-based sessionization of the event stream via Spark's native
    // session_window: events of one user merge while consecutive gaps
    // stay under 30 min; window.end = last event + gap. The SAME
    // groupBy runs under readStream with a watermark (Structured
    // Streaming plans it as a merging-sessions aggregation), which is
    // why this uses session_window and not a lag/cumsum window: one
    // shuffle on user_id, session merge is per-key sort-local, no
    // global sort — at 100 TB sessions never cross partitions.
    // Micros precision end-to-end: the oracle replays the gap rule on
    // epoch_ns//1000, so sub-second timestamps round-trip exactly.
    "q_sessionize" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 6).as("sum_value"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("session_start_us"),
          unix_micros(col("session_window.end")).as("session_end_us"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "session_start_us")),

    // ordered-step funnel over the event stream (view → click →
    // purchase, each step's timestamp strictly after the previous
    // step's FIRST occurrence — the product-analytics conversion
    // query). Each stage is a filtered hash aggregation plus an
    // equi-join on user_id: one shuffle key end-to-end, stage count
    // fixed by the funnel definition — no per-user event arrays, no
    // window over the raw stream, so skewed users cost only their
    // aggregation rows. The final counts are 3 one-row aggregates
    // unioned (driver-safe by construction).
    "q_funnel" -> ((s, dir) =>
      funnel(Tables.events(s, dir), Seq("view", "click", "purchase"))),

    // weekly cohort retention: cohort = Monday-truncated week of a
    // user's first event; one row per (cohort, week offset) with the
    // distinct active users and the retention fraction. Two hash
    // aggregations (first-event per user; distinct user-weeks) and
    // one equi-join, all on user_id — the (user, week) frame is
    // already distinct when counted, so no count-distinct expand; the
    // cohort-size join keys on the ≤|weeks| cohort frame. Weeks
    // chosen because both engines truncate to Monday, making the
    // bucket boundary engine-portable.
    "q_retention" -> ((s, dir) => retention(Tables.events(s, dir))),

    // Q17 shape: per-group threshold applied back to the detail rows
    // (decorrelated form of TPC-H's correlated avg subquery). The
    // per-part average is its own hash aggregation joined back on
    // l_partkey — Catalyst's standard decorrelation; one shuffle key
    // for both sides, AQE picks the join strategy. The brand filter
    // broadcasts the small part side and prunes before the threshold
    // join. DECIMAL sum keeps the final figure exact.
    "q17_small_qty" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val parts = Tables.part(s, dir)
        .where(col("p_brand") === "Brand#1").select("p_partkey")
      val filtered = li.join(broadcast(parts),
        col("l_partkey") === col("p_partkey"))
      val thr = filtered.groupBy("l_partkey")
        .agg((avg("l_quantity") * 0.2).as("thr"))
      filtered.join(thr, "l_partkey")
        .where(col("l_quantity") < col("thr"))
        .agg(round(sum(dec2(col("l_extendedprice"))).cast("double") / 7.0, 6)
          .as("avg_yearly"))
    }),

    // Q15 shape: argmax over an aggregate (top supplier by revenue).
    // Revenue is one hash aggregation; the max is a one-row frame
    // broadcast back — the two-pass argmax that avoids any global
    // sort or rank window over the aggregate. DECIMAL revenue makes
    // the equality join exact (no float-epsilon ties).
    "q15_top_supplier" -> ((s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .where(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1996-04-01 00:00:00")))
        .groupBy("l_suppkey")
        .agg(sum(dec6(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("total_revenue"))
      val top = rev.agg(max("total_revenue").as("max_rev"))
      rev.join(broadcast(top), col("total_revenue") === col("max_rev"))
        .join(Tables.supplier(s, dir),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_revenue").cast("double").as("total_revenue"))
        .orderBy("s_suppkey")
    }),

    // Q18 shape: HAVING over a large aggregation, detail joined back
    // (large-volume customers). The per-order quantity sum is ONE
    // hash aggregation on l_orderkey; because that frame already
    // carries sum_qty, TPC-H's re-aggregation after the IN-subquery
    // disappears — the filtered agg (0.1 % of orders survive > 300)
    // joins orders on the same key, then customer. The final
    // ordering is a top-K (TakeOrderedAndProject under the limit) —
    // no global sort of the join result. At 100 TB: lineitem agg and
    // the orders join share one shuffle key; the surviving-orders
    // side is small enough that AQE broadcasts the customer join's
    // build side after the runtime size is known.
    "q18_big_orders" -> ((s, dir) => {
      val big = Tables.lineitem(s, dir)
        .groupBy("l_orderkey")
        .agg(round(sum("l_quantity"), 6).as("sum_qty"))
        .where(col("sum_qty") > 300)
      big.join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("o_orderdate_us"),
          round(col("o_totalprice"), 2).as("o_totalprice"),
          col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderdate_us"),
          col("o_orderkey"))
        .limit(100)
    }),

    // Q21 shape: "suppliers who alone kept a finished order waiting"
    // — the classic double-correlated EXISTS / NOT EXISTS over the
    // same fact table, decorrelated Spark-first into ONE per-order
    // aggregation (distinct suppliers, distinct R-flag suppliers)
    // joined back on the fact key: EXISTS(other supplier) becomes
    // n_supp > 1, NOT EXISTS(other R supplier) becomes n_r_supp = 1.
    // One extra hash agg + equi-join instead of two correlated
    // re-scans of lineitem; the oracle runs the textbook EXISTS form,
    // so the rewrite is cross-engine verified. Final top-N is
    // TakeOrdered over the per-supplier counts.
    "q21_waiting" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val stats = li.groupBy("l_orderkey").agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(col("l_returnflag") === "R", col("l_suppkey")))
          .as("n_r_supp"))
      li.where(col("l_returnflag") === "R")
        .join(stats.where(col("n_supp") > 1 && col("n_r_supp") === 1),
          "l_orderkey")
        .join(Tables.orders(s, dir).where(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name").agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    }),

    // Q6 shape: the pure-pushdown scan — every predicate (date
    // range, discount band, quantity cap) reaches the parquet
    // reader as a PushedFilter, so at 100 TB the scan touches only
    // row groups whose min/max stats intersect the ranges; the
    // aggregate is one map-side-partial sum, zero joins, zero
    // wide shuffles. Plan-audited in PlanSpec.
    "q6_forecast" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .where(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")) &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(
          sum(dec6(col("l_extendedprice") * col("l_discount")))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))),

    // Q4 shape (adapted: the schema has no commit/receipt dates, so
    // the "late line item" predicate is l_shipdate > o_orderdate):
    // a correlated EXISTS decorrelated to ONE left-semi hash join
    // on orderkey — the extra non-equi conjunct rides along as the
    // join condition, so no secondary filter pass and no duplicate
    // counting (semi join emits each order at most once, where an
    // inner join + distinct would shuffle the multiplicity).
    "q4_priority" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .where(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("o_orderdate") < to_timestamp(lit("1996-04-01 00:00:00")))
      val l = Tables.lineitem(s, dir).select("l_orderkey", "l_shipdate")
      o.join(l, col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // Q7 shape (nation-pair trade volume by year): the same dim
    // table joins the fact twice under two aliases (supplier's
    // nation vs customer's nation) — both broadcast; the pair
    // filter ((A,B) or (B,A)) evaluates after the two cheap
    // broadcast joins, never as a join condition that would
    // degenerate to a nested loop. One hash agg on the
    // (nation, nation, year) triple.
    "q7_volume" -> ((s, dir) => {
      val n1 = Tables.nation(s, dir)
        .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, dir)
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, dir)
        .where(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")))
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
          "l_shipdate")
        .join(Tables.supplier(s, dir).select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir).select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
        .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
        .where((col("supp_nation") === "NATION_1" &&
            col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" &&
            col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(sum(dec6(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .cast("double").as("volume"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // Q8 shape (national market share): the deepest join topology
    // in the suite — fact → part filter, orders, customer, then the
    // nation dim TWICE (customer side anchors the region filter,
    // supplier side carries the share nation) plus region, all four
    // dim frames broadcast. Numerator and denominator come from one
    // pass (CASE inside the DECIMAL sums, grouped by order year) —
    // the same single-scan conditional-ratio discipline as Q14.
    "q8_share" -> ((s, dir) => {
      val vol = dec6(col("l_extendedprice") * (lit(1) - col("l_discount")))
      val cn = Tables.nation(s, dir)
        .select(col("n_nationkey").as("cn_key"), col("n_regionkey"))
      val sn = Tables.nation(s, dir)
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      Tables.lineitem(s, dir)
        .join(Tables.part(s, dir).where(col("p_type") === "PROMO")
          .select("p_partkey"), col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, dir)
          .where(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
            col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
          .select("o_orderkey", "o_custkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir).select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(cn), col("c_nationkey") === col("cn_key"))
        .join(broadcast(Tables.region(s, dir).where(col("r_name") === "AMERICA")),
          col("n_regionkey") === col("r_regionkey"))
        .join(Tables.supplier(s, dir).select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(sn), col("s_nationkey") === col("sn_key"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_1", vol)
            .otherwise(dec6(lit(0)))).cast("double").as("nation_volume"),
          sum(vol).cast("double").as("total_volume"))
        .select(col("o_year"),
          round(col("nation_volume") / col("total_volume"), 6).as("mkt_share"),
          col("nation_volume"), col("total_volume"))
        .orderBy("o_year")
    }),

    // Q13 shape (customer order-count distribution): left outer
    // join so zero-order customers survive with count 0, then a
    // second aggregation over the per-customer counts. At warehouse
    // scale both sides shuffle on custkey, so the per-customer
    // groupBy reuses the join's partitioning (no second exchange of
    // the wide frame); at test SF AQE broadcasts the customer side
    // instead — either way the distribution agg reduces a
    // customers-sized frame to a handful of rows.
    "q13_custdist" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .where(col("o_orderpriority") =!= "1-URGENT")
        .select("o_orderkey", "o_custkey")
      Tables.customer(s, dir).select("c_custkey")
        .join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // Q14 shape (promo revenue share): conditional aggregation over
    // one lineitem⋈part join — both the promo numerator and the
    // total denominator come out of a single pass (CASE inside the
    // sums), never two scans. DECIMAL sums, the 100·promo⁄total
    // division in double at the very end.
    "q14_promo" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .where(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1996-03-01 00:00:00")))
        .join(Tables.part(s, dir).select("p_partkey", "p_type"),
          col("p_partkey") === col("l_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO",
            dec6(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .otherwise(dec6(lit(0)))).cast("double").as("promo_revenue"),
          sum(dec6(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .cast("double").as("total_revenue"))
        .select(
          round(lit(100.0) * col("promo_revenue") / col("total_revenue"), 6)
            .as("promo_pct"),
          col("promo_revenue"), col("total_revenue"))),

    // Q10 shape (returned-item ranking): facts filter before the
    // joins (returnflag pushed to the lineitem scan, the quarter to
    // orders), nation broadcasts, and the global top-20 plans as
    // TakeOrdered (per-partition heaps merged on the driver — no
    // single-partition sort of the full customer frame).
    "q10_returns" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir).where(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      val o = Tables.orders(s, dir)
        .where(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("o_orderdate") < to_timestamp(lit("1996-04-01 00:00:00")))
        .select("o_orderkey", "o_custkey")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(sum(dec6(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // Q22 shape (adapted: no phone column, so the cohort is keyed
    // by nation, and "idle" means no LARGE order — every customer
    // here has some order): customers above the average positive
    // balance with no order over 400 000. The scalar-subquery
    // threshold is a one-row broadcast, and the comparison is
    // cross-multiplied into exact DECIMAL arithmetic (bal·cnt >
    // total) — no floating average as a filter boundary, so two
    // engines cannot disagree on a borderline customer. The
    // no-large-orders test is one anti hash join whose build side
    // pre-filters to the large orders; sums are DECIMAL-exact.
    "q22_idle" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val stats = c.where(col("c_acctbal") > 0)
        .agg(sum(dec2(col("c_acctbal"))).as("total_bal"),
          count(lit(1)).as("n_pos"))
      c.crossJoin(broadcast(stats))
        .where(dec2(col("c_acctbal")) * col("n_pos") > col("total_bal"))
        .join(Tables.orders(s, dir).where(col("o_totalprice") > 400000)
            .select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("numcust"),
          sum(dec2(col("c_acctbal"))).cast("double").as("totacctbal"))
        .orderBy("c_nationkey")
    }),

    // Q19 shape: an OR-of-ANDs predicate spanning both join sides.
    // Catalyst extracts the common p_partkey equi-key from the
    // disjunction — the join stays a broadcast hash join (part is
    // dimension-sized), the disjunction evaluates as a post-join
    // filter, and the quantity bounds (common to no branch) stay
    // un-pushed by design. Plan-audited: never a nested-loop join.
    "q19_disjunct" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .join(Tables.part(s, dir), col("p_partkey") === col("l_partkey"))
        .where(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30)))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("revenue"))),

    // daily + 7-day rolling active users (DAU/WAU): the distinct
    // (user, day) frame fans out to the ≤7 window-end days it
    // contributes to (a bounded map-side multiplier — no sliding
    // count-distinct window, no self-join on the raw stream), then
    // distinct + per-day hash counts. Partial leading windows are
    // reported (standard), trailing fan-out past the last observed
    // day is dropped.
    "q_active_users" -> ((s, dir) => rollingActive(Tables.events(s, dir))),
    "q_stickiness" -> ((s, dir) => stickiness(Tables.events(s, dir))),

    // top-N 3-step event-type paths (path analysis: what do users do
    // next?). The path triple forms with two leads over the per-user
    // event order — the window partitions on user_id exactly like
    // sessionize's merge (per-user, sort-local, bounded by one user's
    // events), then a hash aggregation on the path string and a
    // global top-N that plans as TakeOrdered — no full-frame rank.
    // event_id breaks timestamp ties so the order is total and the
    // oracle replays it.
    "q_event_paths" -> ((s, dir) => eventPaths(Tables.events(s, dir))),
    "q_transitions" -> ((s, dir) => transitionMatrix(Tables.events(s, dir))),
    "q_session_stats" -> ((s, dir) => sessionStats(Tables.events(s, dir))),
    "q_user_activity" -> ((s, dir) => userActivity(Tables.events(s, dir))),
    "q_gap_stats" -> ((s, dir) => gapStats(Tables.events(s, dir))),
    "q_cohort_ltv" -> ((s, dir) => cohortValue(Tables.events(s, dir))),
    // RFM quintile segmentation over the event stream
    "q_rfm" -> ((s, dir) => rfm(Tables.events(s, dir)).orderBy("user_id")),
    // market-basket support/confidence/lift over (user, day) baskets
    "q_lift" -> ((s, dir) =>
      basketLift(Tables.events(s, dir)).orderBy("a", "b")),
    // activity concentration: Gini + top-1%/10% shares
    "q_gini" -> ((s, dir) => giniCard(Tables.events(s, dir))),
    // growth accounting: daily new vs returning actives
    "q_new_returning" -> ((s, dir) =>
      newVsReturning(Tables.events(s, dir)).orderBy("day_s")),
    // first-touch revenue attribution by acquisition event type
    "q_attribution" -> ((s, dir) =>
      firstTouch(Tables.events(s, dir)).orderBy("channel")),
    // censoring-honest k-day survival (retention half-life card)
    "q_survival" -> ((s, dir) => survival(Tables.events(s, dir))),
    // semi-structured JSON props extraction + per-type numeric stats
    "q_props_stats" -> ((s, dir) => propsStats(Tables.events(s, dir))),
    // day-over-day churn of the top-k users-by-value leaderboard
    "q_topk_churn" -> ((s, dir) => topkChurn(Tables.events(s, dir))),
    // Lorenz decile table: value share by user-value decile
    "q_pareto" -> ((s, dir) => pareto(Tables.events(s, dir))),
    "q_session_funnel" -> ((s, dir) =>
      sessionFunnel(Tables.events(s, dir), Seq("view", "click", "purchase"))
        .orderBy("step")),

    // funnel time-to-convert (see funnelLatency Scaladoc)
    "q_funnel_latency" -> ((s, dir) =>
      funnelLatency(Tables.events(s, dir), Seq("view", "click", "purchase"))),

    "q_pagerank" -> ((s, dir) => pageRank(Tables.events(s, dir))),
    "q_ab_test" -> ((s, dir) => abTest(Tables.events(s, dir)))
  )

  /** DAU + rolling `windowDays`-day active users per day. */
  def rollingActive(events: DataFrame, windowDays: Int = 7): DataFrame = {
    val days = events
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val dau = days.groupBy("day").agg(count(lit(1)).as("dau"))
    // fan each active (user, day) out to the window-end days it
    // counts toward; re-distinct because one user often appears in
    // several source days of the same window
    val maxDay = days.agg(max("day").as("max_day"))
    val wau = days
      .select(col("user_id"),
        explode(sequence(lit(0), lit(windowDays - 1))).as("off"),
        col("day"))
      .select(col("user_id"), expr("date_add(day, off)").as("wday"))
      .crossJoin(broadcast(maxDay))
      .where(col("wday") <= col("max_day"))
      .select(col("user_id"), col("wday")).distinct()
      .groupBy(col("wday").as("day")).agg(count(lit(1)).as("wau"))
    dau.join(wau, "day")
      .select(unix_seconds(col("day").cast("timestamp")).as("day_s"),
        col("dau"), col("wau"))
      .orderBy("day_s")
  }

  /** DAU/MAU stickiness — the product-health ratio (how much of the
    * monthly audience shows up on a given day): DAU and the rolling
    * `windowDays`-day active-user count share [[rollingActive]]'s
    * fan-out shape — each distinct (user, day) fans to the ≤window
    * window-end days it counts toward, then one distinct + count per
    * day — so the rolling distinct needs no count-distinct window
    * (which Spark cannot express) and no per-day rescan.
    *
    * Scale: the corpus reduces to distinct (user, day) first (one
    * hash aggregation); the fan-out is bounded by window·|that
    * frame|, all map-side, then two day-keyed counts and a tiny
    * day-level join. */
  def stickiness(events: DataFrame, windowDays: Int = 28): DataFrame = {
    val days = events
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val dau = days.groupBy("day").agg(count(lit(1)).as("dau"))
    val maxDay = days.agg(max("day").as("max_day"))
    val mau = days
      .select(col("user_id"),
        explode(sequence(lit(0), lit(windowDays - 1))).as("off"),
        col("day"))
      .select(col("user_id"), expr("date_add(day, off)").as("wday"))
      .crossJoin(broadcast(maxDay))
      .where(col("wday") <= col("max_day"))
      .select(col("user_id"), col("wday")).distinct()
      .groupBy(col("wday").as("day")).agg(count(lit(1)).as("mau"))
    dau.join(mau, "day")
      .select(unix_seconds(col("day").cast("timestamp")).as("day_s"),
        col("dau"), col("mau"),
        round(col("dau") / col("mau").cast("double"), 6).as("stickiness"))
      .orderBy("day_s")
  }

  /** First-touch revenue attribution: each user's lifetime purchase
    * value is credited to the event TYPE of their very first event
    * (the acquisition-channel proxy this schema offers) — the
    * marketing-mix card next to [[cohortValue]]'s when-curve. Per
    * channel: users acquired, buyers among them, attributed value
    * and its share of the total.
    *
    * The first event resolves in three hash steps — min(ts) per
    * user, min(event_id) at that ts, then the type lookup — instead
    * of a min_by over a (ts, event_id) struct: a struct ordering key
    * demotes the aggregate to SortAggregate (the [[graft.tsdb.Vectors]]
    * packed-key note), and three user-keyed hash aggs/joins co-locate
    * on one shuffle.
    *
    * Scale: everything is user-keyed until the final ≤|event-type|
    * channel aggregation; the grand total joins back as a one-row
    * broadcast. */
  def firstTouch(events: DataFrame): DataFrame = {
    val t0 = events.groupBy("user_id").agg(min("ts").as("ts"))
    val e0 = events.join(t0, Seq("user_id", "ts"))
      .groupBy("user_id", "ts").agg(min("event_id").as("event_id"))
    val channel = events.join(e0, Seq("user_id", "ts", "event_id"))
      .select(col("user_id"), col("event_type").as("channel"))
    val purch = events.where(col("event_type") === "purchase")
      .groupBy("user_id").agg(sum("value").as("pv"))
    val agg = channel.join(purch, Seq("user_id"), "left")
      .groupBy("channel")
      .agg(count(lit(1)).as("users"), count(col("pv")).as("buyers"),
        round(coalesce(sum("pv"), lit(0.0)), 6).as("attributed_value"))
    val tot = agg.agg(sum("attributed_value").as("tot"))
    agg.crossJoin(broadcast(tot))
      .select(col("channel"), col("users"), col("buyers"),
        col("attributed_value"),
        round(when(col("tot") > 0, col("attributed_value") / col("tot")), 6)
          .as("value_share"))
  }

  /** Censoring-honest k-day survival — "what fraction of users are
    * still active k days after their first event", the retention
    * half-life card behind every cohort chart. The Kaplan-Meier
    * honesty point: a user whose first event is within k days of the
    * observation window's end CANNOT have been observed surviving k
    * days, so they are excluded from day-k's denominator instead of
    * silently counted as churned (right-censoring). Surviving at k =
    * last-activity ≥ k days after first.
    *
    * Scale: one per-user hash aggregation (first/last day), a ≤
    * `maxDays` map-side fan-out of that bounded frame, one ≤maxDays
    * aggregation; the window edge joins as a one-row broadcast. */
  def survival(events: DataFrame, maxDays: Int = 14): DataFrame = {
    val u = events.groupBy("user_id")
      .agg(to_date(min("ts")).as("f"), to_date(max("ts")).as("l"))
      .select(col("user_id"), col("f"),
        datediff(col("l"), col("f")).as("life"))
    val w = events.agg(to_date(max("ts")).as("w_day"))
    u.crossJoin(broadcast(w))
      .select(col("life"),
        explode(sequence(lit(1), lit(maxDays))).as("k"),
        datediff(col("w_day"), col("f")).as("observable"))
      .where(col("observable") >= col("k"))
      .groupBy("k")
      .agg(count(lit(1)).as("eligible"),
        sum((col("life") >= col("k")).cast("long")).as("surviving"))
      .select(col("k"), col("eligible"), col("surviving"),
        round(col("surviving") / col("eligible").cast("double"), 6)
          .as("survival_rate"))
      .orderBy("k")
  }

  /** Semi-structured property extraction — every event pipeline
    * carries a JSON props column, and extracting typed values out of
    * it WITHOUT a pre-declared schema is the bread-and-butter
    * semi-structured query: `get_json_object` (codegen'd JSON path,
    * no UDF) pulls `$.k` as a nullable long, then per-type count /
    * presence / sum / min / max / avg / exact p50. Missing or
    * non-numeric properties surface as NULLs (counted by n − n_k),
    * not errors. p50 of integers interpolates to at worst a .5 —
    * exactly representable, so round(…, 6) has no midpoint case.
    *
    * Scale: extraction is one codegen map stage fused into the scan.
    * The p50 is EXACT without per-group sort state: integer
    * properties live on a discrete domain, so the median computes
    * from (type, k)-distinct COUNTS + a cumulative rank over that
    * bounded frame — `percentile(k, 0.5)` here went 9× for 10× data
    * (each of the 5 type groups buffers every value); the count
    * shape is one extra hash agg and a |domain|-bounded window, and
    * reproduces quantile_cont's midpoint interpolation exactly. */
  def propsStats(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val kcol = get_json_object(col("props"), "$.k").cast("long")
    val base = events.select(col("event_type"), kcol.as("k"))
    val agg = base.groupBy("event_type")
      .agg(count(lit(1)).as("n"), count(col("k")).as("n_k"),
        sum("k").as("sum_k"), min("k").as("min_k"), max("k").as("max_k"),
        round(avg("k"), 6).as("avg_k"))
    val byK = base.where(col("k").isNotNull)
      .groupBy("event_type", "k").agg(count(lit(1)).as("c"))
    val cum = byK
      .withColumn("cum",
        sum("c").over(Window.partitionBy("event_type").orderBy("k")))
      .withColumn("nk", sum("c").over(Window.partitionBy("event_type")))
    // quantile_cont(0.5) rank r = (n+1)/2; median = mean of the
    // values at ranks ⌊r⌋ and ⌈r⌉ (equal when n is odd)
    val r = (col("nk") + 1) / lit(2.0)
    val med = cum.groupBy("event_type")
      .agg(min(when(col("cum") >= floor(r), col("k"))).as("v_lo"),
        min(when(col("cum") >= ceil(r), col("k"))).as("v_hi"))
    agg.join(med, Seq("event_type"), "left")
      .select(col("event_type"), col("n"), col("n_k"), col("sum_k"),
        col("min_k"), col("max_k"), col("avg_k"),
        round((col("v_lo") + col("v_hi")) / 2.0, 6).as("p50_k"))
      .orderBy("event_type")
  }

  /** Day-over-day churn of the top-`k` users-by-value leaderboard —
    * the stability card behind every "top accounts" dashboard (a
    * leaderboard that reshuffles daily is noise, one that never moves
    * is saturation): per day, the k highest daily-value users
    * (DECIMAL-exact sums, event_id-free deterministic tie-break on
    * user_id), then per consecutive-day pair the retained / entered /
    * exited counts via a self-join on (user, day+1).
    *
    * Scale: the corpus reduces to (day, user) sums in one hash agg;
    * the rank is a per-DAY window whose frame is that day's active
    * users (swap the two-phase shard rank if a single day's users
    * outgrow a partition — noted, not needed at this shape); the
    * churn join is on the ≤ days·k ranked frame only. */
  def topkChurn(events: DataFrame, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .select(to_date(col("ts")).as("day"), col("user_id"),
        col("value").cast("decimal(18,2)").as("v"))
      .groupBy("day", "user_id").agg(sum("v").as("dv"))
    val w = Window.partitionBy("day")
      .orderBy(col("dv").desc, col("user_id").asc)
    val top = daily.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("day"), col("user_id"))
    val nxt = top.select(expr("date_add(day, -1)").as("day"),
      col("user_id").as("user_next"))
    val retained = top.join(nxt,
      top("day") === nxt("day") && col("user_id") === col("user_next"))
      .groupBy(top("day")).agg(count(lit(1)).as("retained"))
    val sizes = top.groupBy("day").agg(count(lit(1)).as("n_top"))
    val nextSizes = sizes.select(expr("date_add(day, -1)").as("day"),
      col("n_top").as("n_top_next"))
    sizes.join(nextSizes, Seq("day"))
      .join(retained, Seq("day"), "left")
      .select(unix_seconds(col("day").cast("timestamp")).as("day_s"),
        col("n_top"), col("n_top_next"),
        coalesce(col("retained"), lit(0L)).as("retained"),
        (col("n_top_next") - coalesce(col("retained"), lit(0L)))
          .as("entered"),
        (col("n_top") - coalesce(col("retained"), lit(0L))).as("exited"))
      .orderBy("day_s")
  }

  /** Lorenz decile table — the distribution behind [[giniCard]]'s
    * single number: users ranked by lifetime value (DESC,
    * deterministic user_id tie-break), cut into value deciles by the
    * same integer `(rank·10) div n` rule as [[rfm]] (no ntile, no
    * float boundaries), each decile reporting its user count, exact
    * DECIMAL value, share and cumulative share — "decile 1 holds
    * X % of revenue" read directly.
    *
    * Scale: per-user sums in one hash agg; the global DESC rank runs
    * the two-phase shard pattern (approx_percentile bounds route to
    * shards, exact rank = shard offset + local row_number — no
    * global sort); decile aggregation is a ≤10-key agg and the
    * cumulative share windows over those 10 rows (constant partition
    * key pins the bounded frame). Shares divide decimal-exact sums
    * cast to double, floor-truncated at 1e-6. */
  def pareto(events: DataFrame, rankShards: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = events.groupBy("user_id")
      .agg(sum(col("value").cast("decimal(18,2)")).as("vd"))
      .withColumn("v", col("vd").cast("double"))
      .materialize(true)
    val n = per.agg(count(lit(1)).as("_n"))
    val grand = per.agg(sum("vd").cast("double").as("_g"))
    val qs = (1 until rankShards).map(_.toDouble / rankShards)
    val bounds = per.agg(
      approx_percentile(col("v"), typedlit(qs), lit(1000)).as("_bs"))
    val sharded = per.crossJoin(broadcast(bounds))
      .withColumn("_rshard", size(filter(col("_bs"), b => b < col("v"))))
      .drop("_bs")
    // DESC rank: offsets accumulate from the TOP shard downward
    val wLocal = Window.partitionBy("_rshard")
      .orderBy(col("v").desc, col("user_id").asc)
    val wPrefix = Window.orderBy(col("_rshard").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sharded.groupBy("_rshard")
      .agg(count(lit(1)).as("_cnt"))
      .withColumn("_roff", coalesce(sum("_cnt").over(wPrefix), lit(0L)))
      .select("_rshard", "_roff")
    val trunc6 = (c: org.apache.spark.sql.Column) =>
      floor(c * lit(1000000.0)) / lit(1000000.0)
    val ranked = sharded.join(broadcast(offsets), Seq("_rshard"))
      .crossJoin(broadcast(n))
      .withColumn("_rank", col("_roff") + row_number().over(wLocal) - 1)
      .withColumn("decile", expr("(_rank * 10) div _n").cast("long") + 1)
    val wCum = Window.partitionBy(lit(1)).orderBy("decile") // ≤10 rows
    ranked.groupBy("decile")
      .agg(count(lit(1)).as("users"), sum("vd").as("vdec"))
      .withColumn("cumdec", sum("vdec").over(wCum))
      .crossJoin(broadcast(grand))
      .select(col("decile"), col("users"),
        trunc6(col("vdec").cast("double")).as("value"),
        trunc6(col("vdec").cast("double") / col("_g")).as("share"),
        trunc6(col("cumdec").cast("double") / col("_g")).as("cum_share"))
      .orderBy("decile")
  }

  /** Top-`topN` 3-step event-type paths across users. */
  def eventPaths(events: DataFrame, topN: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val paths = events
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("e2", lead("event_type", 1).over(w))
      .withColumn("e3", lead("event_type", 2).over(w))
      .where(col("e3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3"))
        .as("path"))
    val counted = paths.groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path").asc).limit(topN)
    counted.withColumn("rk",
      row_number().over(Window.orderBy(col("n").desc, col("path").asc))
        .cast("long"))
  }

  /** Inter-event gap distribution — the card the session gap
    * parameter is TUNED from (the 30-minute convention is exactly a
    * valley in this distribution): per consecutive same-user event
    * pair, the gap in seconds, summarized as p50/p90/p99 plus the
    * fraction of gaps exceeding the candidate session gap. One row.
    *
    * Scale: one lag window per user (sessionize's shuffle key), then
    * a single aggregation; percentile buffers hold gaps (= events −
    * users rows — same order as the event count; swap
    * approx_percentile for unbounded deployments as elsewhere). */
  def gapStats(events: DataFrame, gapS: Long = 1800L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .select(col("user_id"), col("event_id"), col("ts"),
        unix_timestamp(col("ts")).as("s"))
      .withColumn("gap", col("s") - lag("s", 1).over(w))
      .where(col("gap").isNotNull)
      .agg(
        count(lit(1)).as("n_gaps"),
        round(percentile(col("gap"), lit(0.5)), 6).as("p50_gap_s"),
        round(percentile(col("gap"), lit(0.9)), 6).as("p90_gap_s"),
        round(percentile(col("gap"), lit(0.99)), 6).as("p99_gap_s"),
        round(avg((col("gap") > gapS).cast("int")), 6).as("frac_over_gap"))
  }

  /** User-activity concentration card — the power-user panel: events
    * per user at p50/p90/p99 plus the share of ALL events produced
    * by users at or above the p90 activity level. Concentration is
    * threshold-based (count ≥ exact p90), not rank-based, so no
    * global user ranking is ever materialized — percentile buffers
    * hold per-user counts (users ≪ events; approx_percentile swap
    * for unbounded deployments, as elsewhere). */
  def userActivity(events: DataFrame): DataFrame = {
    val perUser = events.groupBy("user_id").agg(count(lit(1)).as("n"))
    val stats = perUser.agg(
      count(lit(1)).as("n_users"),
      sum("n").as("_tot"),
      round(percentile(col("n"), lit(0.5)), 6).as("p50_events"),
      percentile(col("n"), lit(0.9)).as("_p90"),
      round(percentile(col("n"), lit(0.99)), 6).as("p99_events"))
    perUser.crossJoin(broadcast(stats))
      .groupBy("n_users", "_tot", "p50_events", "_p90", "p99_events")
      .agg(sum(when(col("n") >= col("_p90"), col("n")).otherwise(0L))
        .as("_topSum"))
      .select(col("n_users"), col("p50_events"),
        round(col("_p90"), 6).as("p90_events"), col("p99_events"),
        round(col("_topSum").cast("double") / col("_tot"), 6)
          .as("top_share"))
  }

  /** Session summary card — the engagement panel over the
    * session_window frame: session/user counts, events per session
    * and duration percentiles (durations carry session_window's
    * trailing gap, consistently in both engines). Exact interpolated
    * percentiles follow the funnel-latency precedent: the buffer
    * holds sessions, already orders of magnitude smaller than
    * events; swap `approx_percentile` in for unbounded deployments.
    */
  def sessionStats(events: DataFrame, gap: String = "30 minutes"): DataFrame = {
    val sessions = events
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("n_events"),
        ((unix_micros(col("session_window.end")) -
          unix_micros(col("session_window.start"))).cast("double") / 1e6)
          .as("dur_s"))
    sessions.agg(
      count(lit(1)).as("n_sessions"),
      countDistinct("user_id").as("n_users"),
      round(avg("n_events"), 6).as("avg_events"),
      round(percentile(col("n_events"), lit(0.5)), 6).as("median_events"),
      round(percentile(col("dur_s"), lit(0.5)), 6).as("median_dur_s"),
      round(percentile(col("dur_s"), lit(0.9)), 6).as("p90_dur_s"))
  }

  /** First-order Markov transition matrix over per-user event
    * sequences — the user-journey model behind "what happens after X"
    * product analytics and journey simulation: for every ordered
    * (event, next event) adjacency within a user's stream, the count
    * and the row-normalized transition probability
    * P(next | current). Self-transitions count like any other (their
    * prevalence is itself the retry/refresh signal).
    *
    * Scale: one lag window per user (the sessionize shuffle key —
    * state is one row), then a ≤|event_types|² aggregation; the
    * normalizer is a window over the ≤|event_types| row groups,
    * never the event stream. */
  def transitionMatrix(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wSrc = Window.partitionBy("src")
    events
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type").as("src"))
      .withColumn("dst", lead("src", 1).over(w))
      .where(col("dst").isNotNull)
      .groupBy("src", "dst").agg(count(lit(1)).as("n"))
      .withColumn("p", round(col("n") / sum("n").over(wSrc), 6))
      .orderBy("src", "dst")
  }

  /** Damped PageRank over the event-type transition digraph — the
    * graph-centrality companion to [[transitionMatrix]] (which event
    * types sit at the center of user flows, with edge weights =
    * observed transition counts). Standard iteration, `iters` rounds
    * from uniform:
    *
    *   PR'(j) = (1−d)/N + d·( Σ_i PR(i)·w_ij + dangling_mass/N )
    *
    * where w_ij = n_ij / out_i and nodes with no outgoing transition
    * spread their mass uniformly (the dangling correction, so total
    * mass stays 1 every round — asserted in the spec).
    *
    * Scale: the transition-count aggregation touches the event stream
    * ONCE (hash agg keyed (src,dst), map-side combined); every
    * iteration after that joins node/edge frames whose size is the
    * event-type vocabulary, not the stream. Each round is
    * localCheckpointed so the unrolled 5-round plan stays linear (pr
    * feeds both the contribution join and the dangling sum — without
    * the checkpoint the lineage doubles per round). At 100 TB the
    * node set is still the type vocabulary; nothing collects to the
    * driver. */
  def pageRank(events: DataFrame, iters: Int = 5,
               damping: Double = 0.85): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val edges = events
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type").as("src"))
      .withColumn("dst", lead("src", 1).over(w))
      .where(col("dst").isNotNull)
      .groupBy("src", "dst").agg(count(lit(1)).as("n"))
      .materialize(true)
    val out = edges.groupBy("src").agg(sum("n").as("out_n"))
    val nodes = events.select(col("event_type").as("node")).distinct()
      .materialize(true)
    val nCnt = nodes.agg(count(lit(1)).cast("double").as("n_nodes"))
      .materialize(true)
    val d = lit(damping)
    var pr = nodes.crossJoin(broadcast(nCnt))
      .select(col("node"), (lit(1.0) / col("n_nodes")).as("pr"))
    for (_ <- 0 until iters) {
      val contrib = edges.join(out, "src")
        .join(pr.select(col("node").as("src"), col("pr")), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("pr") * col("n") / col("out_n")).as("c"))
      val dangling = pr
        .join(out.select(col("src").as("node")), Seq("node"), "left_anti")
        .agg(coalesce(sum("pr"), lit(0.0)).as("dm"))
      pr = nodes.join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(dangling)).crossJoin(broadcast(nCnt))
        .select(col("node"),
          // (1.0 - d) spelled as the same subtraction the oracle SQL
          // performs — a pre-folded 0.15 literal is 1 ulp away from
          // 1.0 − 0.85 in binary and the engines must agree bit-for-bit
          ((lit(1.0) - d) / col("n_nodes") +
            d * (coalesce(col("c"), lit(0.0)) + col("dm") / col("n_nodes")))
            .as("pr"))
        .materialize(true)
    }
    pr.select(col("node"), round(col("pr"), 6).as("pr"))
      .orderBy(col("pr").desc, col("node").asc)
  }

  /** Two-proportion A/B significance card — the experiment-readout
    * query every event warehouse serves: per-variant user conversion
    * (≥1 `target` event), rate difference, pooled standard error and
    * the z statistic, flagged at the 1.96 two-sided 95% bound. The
    * variant split here is the deterministic `user_id % 2` (a stand-in
    * for the hash-bucket assignment a real experiment framework
    * writes); the significance flag compares the ROUNDED z so a
    * boundary experiment can't flip across engines.
    *
    * Scale: two distinct-user aggregations + a user-keyed left join,
    * then a 2-row → 1-row conditional aggregation; no windows. */
  def abTest(events: DataFrame, target: String = "purchase"): DataFrame = {
    val users = events.select(col("user_id")).distinct()
      .select(col("user_id"), pmod(col("user_id"), lit(2)).as("v"))
    val conv = events.where(col("event_type") === target)
      .select("user_id").distinct().withColumn("c", lit(1L))
    val per = users.join(conv, Seq("user_id"), "left")
      .groupBy("v").agg(count(lit(1)).as("n"),
        sum(coalesce(col("c"), lit(0L))).as("cv"))
    val card = per.agg(
      sum(when(col("v") === 0, col("n"))).as("a_users"),
      sum(when(col("v") === 0, col("cv"))).as("a_conv"),
      sum(when(col("v") === 1, col("n"))).as("b_users"),
      sum(when(col("v") === 1, col("cv"))).as("b_conv"))
    val ra = col("a_conv").cast("double") / col("a_users")
    val rb = col("b_conv").cast("double") / col("b_users")
    val p = (col("a_conv") + col("b_conv")).cast("double") /
      (col("a_users") + col("b_users"))
    val se = sqrt(p * (lit(1.0) - p) *
      (lit(1.0) / col("a_users") + lit(1.0) / col("b_users")))
    val z = when(se > 0, (rb - ra) / se)
    card.select(col("a_users"), col("a_conv"), round(ra, 6).as("a_rate"),
      col("b_users"), col("b_conv"), round(rb, 6).as("b_rate"),
      round(rb - ra, 6).as("rate_diff"), round(se, 6).as("pooled_se"),
      round(z, 6).as("z_v"),
      coalesce((abs(round(z, 6)) > 1.96).cast("int"), lit(0))
        .as("significant"))
  }

  /** Per-stage (user_id, first-qualifying-ts) frames for an ordered
    * funnel — each stage is a filtered hash agg + equi-join, all
    * keyed on user_id. */
  private def funnelStages(events: DataFrame,
                           steps: Seq[String]): Seq[DataFrame] = {
    val e = events.select("user_id", "event_type", "ts")
    steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (step, _)) =>
        val hits = e.where(col("event_type") === step)
        val afterPrev = prev match {
          case None => hits.groupBy("user_id").agg(min("ts").as("t"))
          case Some(pf) => hits
            .join(pf.select(col("user_id"), col("t").as("t_prev")), "user_id")
            .where(col("ts") > col("t_prev"))
            .groupBy("user_id").agg(min("ts").as("t"))
        }
        Some(afterPrev)
    }.flatten
  }

  /** Ordered-step funnel: per user, the first timestamp of each step
    * strictly after the previous step's first occurrence; output is
    * one row per step with the users reaching it. */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    funnelStages(events, steps).zip(steps).zipWithIndex.map {
      case ((df, name), i) =>
        df.agg(count(lit(1)).as("users"))
          .select(lit(i + 1).as("step"), lit(name).as("stage"), col("users"))
    }.reduce(_ union _).orderBy("step")
  }

  /** Time-to-convert for funnel completers: first-step → last-step
    * latency stats (count, mean, min/max, exact median). The median
    * is an exact single-group percentile — its buffer holds the
    * COMPLETERS' latencies (a small fraction of users by
    * construction); an unbounded deployment swaps in the mergeable
    * `approx_percentile` sketch exactly as the streaming rollup
    * does. */
  def funnelLatency(events: DataFrame, steps: Seq[String]): DataFrame = {
    val stages = funnelStages(events, steps)
    val latency = stages.head.select(col("user_id"), col("t").as("t_first"))
      .join(stages.last.select(col("user_id"), col("t").as("t_last")),
        "user_id")
      .select(((unix_micros(col("t_last")) - unix_micros(col("t_first")))
        .cast("double") / 1e6).as("s"))
    latency.agg(
      count(lit(1)).as("completers"),
      round(avg("s"), 6).as("mean_s"),
      round(min("s"), 6).as("min_s"),
      round(max("s"), 6).as("max_s"),
      round(percentile(col("s"), lit(0.5)), 6).as("median_s"))
  }

  /** Weekly cohort retention — see the `q_retention` entry Scaladoc. */
  def retention(events: DataFrame): DataFrame = {
    val e = events
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
    val first = e.groupBy("user_id").agg(min("wk").as("cohort"))
    val active = e.distinct()
      .join(first, "user_id")
      .groupBy(col("cohort"),
        (datediff(col("wk"), col("cohort")) / 7).cast("int")
          .as("week_offset"))
      .agg(count(lit(1)).as("active_users"))
    val sizes = first.groupBy("cohort")
      .agg(count(lit(1)).as("cohort_users"))
    active.join(sizes, "cohort")
      .select(
        unix_seconds(col("cohort")).as("cohort_week_s"),
        col("week_offset"), col("active_users"), col("cohort_users"),
        round(col("active_users").cast("double") / col("cohort_users"), 6)
          .as("retention"))
      .orderBy("cohort_week_s", "week_offset")
  }

  /** Session-scoped ordered funnel — conversion WITHIN one session:
    * the user-scoped funnel (q_funnel) credits a purchase days after
    * the view; product teams usually ask the stricter question, so
    * steps here must occur in order inside the same gap-bounded
    * session. Sessions come from the same lag/cumsum rule the
    * sessionize oracle uses; per step, the count of sessions that
    * reached it and the fraction of step-1 sessions.
    *
    * Scale: session labeling is one per-user window pass
    * (sessionize's shuffle key); each step is a filtered min
    * aggregation + equi-join keyed on (user, session) — the funnel
    * machinery applied at session granularity. */
  def sessionFunnel(events: DataFrame, steps: Seq[String],
                    gapS: Long = 1800L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("s", "event_id")
    val labeled = events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("s"))
      .withColumn("_new",
        when(lag("s", 1).over(w).isNull ||
          col("s") - lag("s", 1).over(w) >= gapS, 1).otherwise(0))
      .withColumn("sid", sum("_new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val stages = steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (step, _)) =>
        val hits = labeled.where(col("event_type") === step)
        val reached = prev match {
          case None =>
            hits.groupBy("user_id", "sid").agg(min("s").as("t"))
          case Some(p) =>
            hits.join(p.select(col("user_id"), col("sid"),
                col("t").as("_pt")), Seq("user_id", "sid"))
              .where(col("s") > col("_pt"))
              .groupBy("user_id", "sid").agg(min("s").as("t"))
        }
        Some(reached)
    }.flatten
    val counts = stages.zip(steps).map { case (df, step) =>
      df.agg(count(lit(1)).as("n_sessions"))
        .select(lit(step).as("step"), col("n_sessions"))
    }.reduce(_ unionByName _)
    val base = counts.where(col("step") === steps.head)
      .select(col("n_sessions").as("_base"))
    counts.crossJoin(broadcast(base))
      .select(col("step"), col("n_sessions"),
        round(col("n_sessions").cast("double") / col("_base"), 6)
          .as("frac_of_first"))
  }

  /** Cohort cumulative-value curve — the LTV panel next to
    * [[retention]]: per (signup-week cohort, week offset), the
    * running total of event value produced by the cohort divided by
    * its size — "what is a week-N user worth so far", the number
    * acquisition spend is justified against. Same UTC week-trunc
    * conventions as retention; the cumulative window runs over the
    * ≤offsets rows per cohort, never the event stream. */
  def cohortValue(events: DataFrame, maxOffset: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = events.select(col("user_id"), col("value"),
      date_trunc("week", col("ts")).as("wk"))
    val first = e.groupBy("user_id").agg(min("wk").as("cohort"))
    val weekly = e.join(first, "user_id")
      .groupBy(col("cohort"),
        (datediff(col("wk"), col("cohort")) / 7).cast("int")
          .as("week_offset"))
      .agg(sum("value").as("_v"))
      .where(col("week_offset") <= maxOffset)
    val sizes = first.groupBy("cohort")
      .agg(count(lit(1)).as("cohort_users"))
    val wCum = Window.partitionBy("cohort").orderBy("week_offset")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    weekly.join(sizes, "cohort")
      .withColumn("_cum", sum("_v").over(wCum))
      .select(
        unix_seconds(col("cohort")).as("cohort_week_s"),
        col("week_offset"), col("cohort_users"),
        round(col("_cum"), 6).as("cum_value"),
        round(col("_cum") / col("cohort_users"), 6).as("ltv_per_user"))
      .orderBy("cohort_week_s", "week_offset")
  }

  /** New-vs-returning daily split — the growth-accounting view next
    * to [[rollingActive]]'s DAU/WAU: per day, active users, users
    * seen for the FIRST time that day, returning = active − new, and
    * the new fraction. A product whose new share collapses is
    * coasting on retention; one whose returning share collapses is a
    * leaky bucket.
    *
    * Scale: first-seen is one per-user min-day aggregation joined
    * back on (user, day); both sides are hash aggs on the same day
    * grain. */
  def newVsReturning(events: DataFrame): DataFrame = {
    val day = floor(unix_timestamp(col("ts")).cast("double") / 86400.0)
      .cast("long")
    val active = events.select(col("user_id"), day.as("d")).distinct()
    val firstSeen = active.groupBy("user_id").agg(min("d").as("first_d"))
    active.join(firstSeen, "user_id")
      .groupBy(col("d").as("day_s"))
      .agg(count(lit(1)).as("dau"),
        sum((col("d") === col("first_d")).cast("long")).as("new_users"))
      .withColumn("returning", col("dau") - col("new_users"))
      .withColumn("pct_new",
        round(col("new_users") / col("dau").cast("double"), 6))
  }

  /** Activity-concentration card — Gini coefficient + top-share
    * slices over per-user event counts (the "1% of users generate
    * X% of load" capacity/abuse view). Gini from the exact rank
    * identity G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n over ascending
    * (count, user_id) ranks — every sum is an exact integer, the
    * final expression divides two exact integers per term, so the
    * rounded card is engine-identical. Top p% shares use integer
    * ceil boundaries.
    *
    * Scale: per-user counts are one hash agg; the global rank is the
    * budgetSelect two-phase shard pattern (approx bounds broadcast,
    * shard-local windows + prefix offsets) — no global sort. */
  def giniCard(events: DataFrame, rankShards: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = events.groupBy("user_id").agg(count(lit(1)).as("x"))
      .materialize(true)
    val qs = (1 until rankShards).map(_.toDouble / rankShards)
    val bounds = per.agg(
      approx_percentile(col("x").cast("double"), typedlit(qs), lit(1000))
        .as("_bs"))
    val sharded = per.crossJoin(broadcast(bounds))
      .withColumn("_key", col("x").cast("double"))
      .withColumn("_rshard", size(filter(col("_bs"), b => b < col("_key"))))
      .drop("_bs")
    val wLocal = Window.partitionBy("_rshard")
      .orderBy(col("_key"), col("user_id"))
    val wPrefix = Window.orderBy("_rshard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sharded.groupBy("_rshard").agg(count(lit(1)).as("_cnt"))
      .withColumn("_roff", coalesce(sum("_cnt").over(wPrefix), lit(0L)))
      .select("_rshard", "_roff")
    val ranked = sharded.join(broadcast(offsets), Seq("_rshard"))
      .withColumn("rnk", col("_roff") + row_number().over(wLocal))
      .select("user_id", "x", "rnk")
    // rnk·x summed through DECIMAL(38): the per-term product fits a
    // long, the SUM would not at extreme scale (DuckDB's HUGEINT and
    // this decimal both convert to the same correctly-rounded double)
    val withTot = ranked.crossJoin(broadcast(ranked.agg(
      count(lit(1)).as("_n"), sum("x").as("_tot"))))
      .withColumn("_k1", greatest(lit(1L), expr("(_n + 99) div 100")))
      .withColumn("_k10", greatest(lit(1L), expr("(_n + 9) div 10")))
    withTot.agg(
      max("_n").as("n_users"),
      max("_tot").as("n_events"),
      sum((col("rnk") * col("x")).cast("decimal(38,0)")).cast("double")
        .as("_s1"),
      sum(when(col("rnk") > col("_n") - col("_k1"), col("x"))
        .otherwise(0L)).as("_t1"),
      sum(when(col("rnk") > col("_n") - col("_k10"), col("x"))
        .otherwise(0L)).as("_t10"))
      .select(col("n_users"), col("n_events"),
        round(lit(2.0) * col("_s1") /
          (col("n_users").cast("double") * col("n_events")) -
          (col("n_users") + 1) / col("n_users").cast("double"), 6)
          .as("gini"),
        round(col("_t1") / col("n_events").cast("double"), 6)
          .as("top1_share"),
        round(col("_t10") / col("n_events").cast("double"), 6)
          .as("top10_share"))
  }

  /** Market-basket association pairs — support / confidence / lift
    * over (user, day) baskets of event types (the transaction-mining
    * classic; PMI's corpus twin lives in TextAnalysis, this is the
    * behavioral-events form with the lift normalization retailers
    * tune against). lift > 1 = the pair co-occurs more than
    * independence predicts. Counts are integers end to end; the
    * ratios divide through doubles with the basket total as a
    * one-row broadcast.
    *
    * Scale: basket formation is a distinct + hash agg; the pair join
    * is per-basket (items² within a basket, bounded by the event-type
    * vocabulary, never cross-basket); event-type pairs are a tiny
    * output. */
  def basketLift(events: DataFrame, minSupport: Int = 5): DataFrame = {
    val day = floor(unix_timestamp(col("ts")).cast("double") / 86400.0)
      .cast("long")
    val items = events
      .select(col("user_id"), day.as("d"), col("event_type")).distinct()
    val nb = items.select("user_id", "d").distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val ca = items.groupBy("event_type").agg(count(lit(1)).as("c"))
    val pairs = items.select(col("user_id"), col("d"),
      col("event_type").as("a"))
      .join(items.select(col("user_id"), col("d"),
        col("event_type").as("b")), Seq("user_id", "d"))
      .where(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
      .where(col("c_ab") >= minSupport)
    pairs
      .join(ca.select(col("event_type").as("a"), col("c").as("c_a")), "a")
      .join(ca.select(col("event_type").as("b"), col("c").as("c_b")), "b")
      .crossJoin(broadcast(nb))
      .select(col("a"), col("b"), col("c_ab"), col("c_a"), col("c_b"),
        col("n_baskets"),
        round(col("c_ab") / col("c_a").cast("double"), 6).as("conf_a_b"),
        round((col("n_baskets").cast("double") * col("c_ab")) /
          (col("c_a").cast("double") * col("c_b").cast("double")), 6)
          .as("lift"))
  }

  /** RFM customer segmentation — the classic marketing-analytics
    * card: per user, Recency (days since last event, against the
    * corpus max ts), Frequency (event count), Monetary (DECIMAL-sum
    * value, so the rank key is bit-exact cross-engine), each scored
    * into integer quintiles 1..5 (higher = better) by the
    * `(5·rank) div n` integer rule the CCNet terciles use — no
    * ntile, no float boundaries. rfm_code packs the three digits.
    *
    * Scale: the per-user rollup is one hash aggregation; each
    * quintile rank runs the budgetSelect two-phase shard pattern
    * (approx bounds broadcast for balance, shard-local windows,
    * prefix offsets broadcast back) — no global sort at any user
    * cardinality. */
  def rfm(events: DataFrame, rankShards: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mx = events.agg(max("ts").as("mx"))
    val per = events.groupBy("user_id")
      .agg(max("ts").as("last_ts"), count(lit(1)).as("frequency"),
        sum(dec2(col("value"))).cast("double").as("monetary"))
      .crossJoin(broadcast(mx))
      .select(col("user_id"),
        floor((unix_timestamp(col("mx")) - unix_timestamp(col("last_ts")))
          / lit(86400.0)).cast("long").as("recency_days"),
        col("frequency"), col("monetary"))
      .materialize(true)
    val nUsers = per.agg(count(lit(1)).as("_n"))
    def score(df: DataFrame, key: org.apache.spark.sql.Column,
              as: String): DataFrame = {
      val qs = (1 until rankShards).map(_.toDouble / rankShards)
      val bounds = df.agg(
        approx_percentile(key.cast("double"), typedlit(qs), lit(1000))
          .as("_bs"))
      // offsets + the final join BOTH read `sharded`, and each score
      // level nests the previous one's whole plan — without a
      // checkpoint the innermost subplan re-expands ~2x per level
      // (8 copies at level 3). The frame is users-sized.
      val sharded = df.crossJoin(broadcast(bounds))
        .withColumn("_key", key.cast("double"))
        .withColumn("_rshard", size(filter(col("_bs"), b => b < col("_key"))))
        .drop("_bs")
        .materialize(false)
      val wLocal = Window.partitionBy("_rshard")
        .orderBy(col("_key"), col("user_id"))
      val wPrefix = Window.orderBy("_rshard")
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = sharded.groupBy("_rshard")
        .agg(count(lit(1)).as("_cnt"))
        .withColumn("_roff", coalesce(sum("_cnt").over(wPrefix), lit(0L)))
        .select("_rshard", "_roff")
      sharded.join(broadcast(offsets), Seq("_rshard"))
        .crossJoin(broadcast(nUsers))
        .withColumn("_rank",
          col("_roff") + row_number().over(wLocal) - 1)
        .withColumn(as, expr("(_rank * 5) div _n").cast("long") + 1)
        .drop("_key", "_rshard", "_roff", "_rank", "_n")
    }
    val scored = score(score(score(per,
      -col("recency_days"), "r_score"),
      col("frequency"), "f_score"),
      col("monetary"), "m_score")
    scored.select(col("user_id"), col("recency_days"), col("frequency"),
      col("monetary"), col("r_score"), col("f_score"), col("m_score"),
      (col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
        .as("rfm_code"))
  }

  val oracles: Map[String, String] = Map(
    "q_new_returning" ->
      """WITH a AS (SELECT DISTINCT user_id,
        |  CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d FROM events),
        | f AS (SELECT user_id, min(d) AS first_d FROM a GROUP BY user_id)
        | SELECT a.d AS day_s, count(*) AS dau,
        |  CAST(sum(CASE WHEN a.d = f.first_d THEN 1 ELSE 0 END) AS BIGINT)
        |   AS new_users,
        |  count(*) - CAST(sum(CASE WHEN a.d = f.first_d THEN 1 ELSE 0 END)
        |   AS BIGINT) AS returning,
        |  round(CAST(sum(CASE WHEN a.d = f.first_d THEN 1 ELSE 0 END)
        |   AS BIGINT) / count(*)::DOUBLE, 6) AS pct_new
        | FROM a JOIN f ON f.user_id = a.user_id
        | GROUP BY a.d ORDER BY day_s""".stripMargin.replace("\n", " "),
    // exact rank identity over ascending (count, user) — products
    // summed through HUGEINT, converted once to double like the
    // engine's decimal(38) path
    "q_gini" ->
      """WITH per AS (SELECT user_id, count(*) AS x FROM events
        |  GROUP BY user_id),
        | rk AS (SELECT user_id, x, row_number() OVER (
        |   ORDER BY x ASC, user_id ASC) AS rnk FROM per),
        | t AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS tot
        |  FROM per),
        | k AS (SELECT n, tot, greatest(1, (n + 99) // 100) AS k1,
        |   greatest(1, (n + 9) // 10) AS k10 FROM t),
        | agg AS (SELECT CAST(sum(rnk * x) AS DOUBLE) AS s1,
        |   CAST(sum(CASE WHEN rnk > k.n - k.k1 THEN x ELSE 0 END)
        |    AS BIGINT) AS t1,
        |   CAST(sum(CASE WHEN rnk > k.n - k.k10 THEN x ELSE 0 END)
        |    AS BIGINT) AS t10
        |  FROM rk, k GROUP BY k.n, k.tot, k.k1, k.k10)
        | SELECT k.n AS n_users, k.tot AS n_events,
        |  round(2.0 * agg.s1 / (k.n::DOUBLE * k.tot)
        |   - (k.n + 1) / k.n::DOUBLE, 6) AS gini,
        |  round(agg.t1 / k.tot::DOUBLE, 6) AS top1_share,
        |  round(agg.t10 / k.tot::DOUBLE, 6) AS top10_share
        | FROM agg, k""".stripMargin.replace("\n", " "),
    "q_lift" ->
      """WITH it AS (SELECT DISTINCT user_id,
        |  CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d, event_type
        | FROM events),
        | nb AS (SELECT count(*) AS n_baskets FROM (
        |  SELECT DISTINCT user_id, d FROM it) AS z),
        | ca AS (SELECT event_type, count(*) AS c FROM it GROUP BY 1),
        | pr AS (SELECT l.event_type AS a, r.event_type AS b,
        |   count(*) AS c_ab
        |  FROM it AS l JOIN it AS r ON l.user_id = r.user_id
        |   AND l.d = r.d AND l.event_type < r.event_type
        |  GROUP BY 1, 2 HAVING count(*) >= 5)
        | SELECT pr.a, pr.b, pr.c_ab, ca1.c AS c_a, ca2.c AS c_b,
        |  nb.n_baskets,
        |  round(pr.c_ab / ca1.c::DOUBLE, 6) AS conf_a_b,
        |  round((nb.n_baskets::DOUBLE * pr.c_ab)
        |   / (ca1.c::DOUBLE * ca2.c::DOUBLE), 6) AS lift
        | FROM pr JOIN ca AS ca1 ON ca1.event_type = pr.a
        |  JOIN ca AS ca2 ON ca2.event_type = pr.b CROSS JOIN nb
        | ORDER BY a, b""".stripMargin.replace("\n", " "),
    // quintiles replayed with the same (5·rank0) div n integer rule;
    // monetary ranks on the DECIMAL-exact sum
    "q_rfm" ->
      """WITH mxx AS (SELECT CAST(floor(epoch(max(ts))) AS BIGINT) AS mxs
        |  FROM events),
        | per AS (SELECT user_id,
        |   CAST(floor((mxs - CAST(floor(epoch(max(ts))) AS BIGINT))
        |     / 86400.0) AS BIGINT) AS recency_days,
        |   count(*) AS frequency,
        |   CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS monetary
        |  FROM events, mxx GROUP BY user_id, mxs),
        | n AS (SELECT count(*) AS nu FROM per),
        | r AS (SELECT user_id, (row_number() OVER (
        |    ORDER BY -recency_days ASC, user_id ASC) - 1) * 5 // nu + 1
        |   AS r_score FROM per, n),
        | f AS (SELECT user_id, (row_number() OVER (
        |    ORDER BY frequency ASC, user_id ASC) - 1) * 5 // nu + 1
        |   AS f_score FROM per, n),
        | m AS (SELECT user_id, (row_number() OVER (
        |    ORDER BY monetary ASC, user_id ASC) - 1) * 5 // nu + 1
        |   AS m_score FROM per, n)
        | SELECT per.user_id, per.recency_days, per.frequency, per.monetary,
        |  r.r_score, f.f_score, m.m_score,
        |  r.r_score * 100 + f.f_score * 10 + m.m_score AS rfm_code
        | FROM per JOIN r USING (user_id) JOIN f USING (user_id)
        |  JOIN m USING (user_id)
        | ORDER BY per.user_id""".stripMargin.replace("\n", " "),
    "q_cube" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | count(*) AS cnt
        | FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        | ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin.replace("\n", " "),
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | count(*) AS cnt
        | FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        | ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin.replace("\n", " "),
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
        | CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        | CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        | round(avg(l_quantity), 6) AS avg_qty, round(avg(l_discount), 6) AS avg_disc,
        | count(*) AS count_order
        | FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        | GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin.replace("\n", " "),
    "q3_join" ->
      """SELECT l.l_orderkey,
        | CAST(floor(epoch(o.o_orderdate)) AS BIGINT) AS orderdate_s,
        | CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        | FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        | JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        | WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |  AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        | GROUP BY l.l_orderkey, o.o_orderdate ORDER BY l.l_orderkey""".stripMargin.replace("\n", " "),
    "q5_star" ->
      """SELECT n.n_name,
        | CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        | FROM lineitem l
        | JOIN orders o ON l.l_orderkey = o.o_orderkey
        | JOIN customer c ON o.o_custkey = c.c_custkey
        | JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
        | JOIN nation n ON c.c_nationkey = n.n_nationkey
        | JOIN region r ON n.n_regionkey = r.r_regionkey
        | WHERE r.r_name = 'ASIA'
        |  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        | GROUP BY n.n_name ORDER BY n.n_name""".stripMargin.replace("\n", " "),
    "q_semi_anti" ->
      """SELECT c_custkey, c_name FROM customer c
        | WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |               AND o.o_totalprice > 400000)
        |  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |                  AND o.o_orderstatus = 'F')
        | ORDER BY c_custkey""".stripMargin.replace("\n", " "),
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        | FROM orders) t WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin.replace("\n", " "),
    "q_sessionize" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS us, value
        |  FROM events),
        | g AS (SELECT user_id, us, value,
        |  CASE WHEN lag(us) OVER w IS NULL
        |        OR us - lag(us) OVER w >= 1800000000 THEN 1 ELSE 0 END
        |   AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
        | s AS (SELECT user_id, us, value,
        |  sum(new_s) OVER (PARTITION BY user_id ORDER BY us
        |   ROWS UNBOUNDED PRECEDING) AS sid FROM g)
        | SELECT user_id, min(us) AS session_start_us,
        |  max(us) + 1800000000 AS session_end_us,
        |  count(*) AS n_events, round(sum(value), 6) AS sum_value
        | FROM s GROUP BY user_id, sid
        | ORDER BY user_id, session_start_us""".stripMargin.replace("\n", " "),
    "q_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        | c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN v ON v.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
        | p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |  JOIN c ON c.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
        | SELECT 1 AS step, 'view' AS stage, count(*) AS users FROM v
        | UNION ALL
        | SELECT 2 AS step, 'click' AS stage, count(*) AS users FROM c
        | UNION ALL
        | SELECT 3 AS step, 'purchase' AS stage, count(*) AS users FROM p
        | ORDER BY step""".stripMargin.replace("\n", " "),
    "q_retention" ->
      """WITH e AS (SELECT user_id, date_trunc('week', ts) AS wk FROM events),
        | f AS (SELECT user_id, min(wk) AS cohort FROM e GROUP BY user_id),
        | a AS (SELECT f.cohort,
        |   CAST(date_diff('day', f.cohort, d.wk) // 7 AS INT) AS week_offset,
        |   count(*) AS active_users
        |  FROM (SELECT DISTINCT user_id, wk FROM e) AS d
        |  JOIN f ON f.user_id = d.user_id
        |  GROUP BY 1, 2),
        | sz AS (SELECT cohort, count(*) AS cohort_users FROM f GROUP BY cohort)
        | SELECT CAST(floor(epoch(a.cohort)) AS BIGINT) AS cohort_week_s,
        |  a.week_offset, a.active_users, sz.cohort_users,
        |  round(a.active_users::DOUBLE / sz.cohort_users, 6) AS retention
        | FROM a JOIN sz ON sz.cohort = a.cohort
        | ORDER BY cohort_week_s, week_offset""".stripMargin.replace("\n", " "),
    "q17_small_qty" ->
      """WITH f AS (SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
        |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |  WHERE p.p_brand = 'Brand#1'),
        | thr AS (SELECT l_partkey, 0.2 * avg(l_quantity) AS thr
        |  FROM f GROUP BY l_partkey)
        | SELECT round(CAST(sum(CAST(f.l_extendedprice AS DECIMAL(18,2)))
        |   AS DOUBLE) / 7.0, 6) AS avg_yearly
        | FROM f JOIN thr ON thr.l_partkey = f.l_partkey
        | WHERE f.l_quantity < thr.thr""".stripMargin.replace("\n", " "),
    "q15_top_supplier" ->
      """WITH rev AS (SELECT l_suppkey,
        |  sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
        |    AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |   AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        | SELECT s.s_suppkey, s.s_name,
        |  CAST(rev.total_revenue AS DOUBLE) AS total_revenue
        | FROM rev JOIN supplier s ON s.s_suppkey = rev.l_suppkey
        | WHERE rev.total_revenue = (SELECT max(total_revenue) FROM rev)
        | ORDER BY s.s_suppkey""".stripMargin.replace("\n", " "),
    "q18_big_orders" ->
      """WITH big AS (SELECT l_orderkey, round(sum(l_quantity), 6) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING round(sum(l_quantity), 6) > 300)
        | SELECT c.c_name, c.c_custkey, o.o_orderkey,
        |  epoch_us(o.o_orderdate) AS o_orderdate_us,
        |  round(o.o_totalprice, 2) AS o_totalprice, b.sum_qty
        | FROM big b
        | JOIN orders o ON o.o_orderkey = b.l_orderkey
        | JOIN customer c ON c.c_custkey = o.o_custkey
        | ORDER BY o_totalprice DESC, o_orderdate_us, o_orderkey
        | LIMIT 100""".stripMargin.replace("\n", " "),
    "q6_forecast" ->
      """SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6)))
        |   AS DOUBLE) AS revenue, count(*) AS n_items
        | FROM lineitem
        | WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin.replace("\n", " "),
    // the textbook correlated EXISTS — the Spark side's semi-join
    // decorrelation is what the compare proves
    "q4_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        | FROM orders o
        | WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |   WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
        | GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin.replace("\n", " "),
    "q7_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l.l_shipdate) AS INT) AS l_year,
        |  CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
        |   AS DECIMAL(18,6))) AS DOUBLE) AS volume
        | FROM lineitem l
        | JOIN supplier s ON l.l_suppkey = s.s_suppkey
        | JOIN orders o ON l.l_orderkey = o.o_orderkey
        | JOIN customer c ON o.o_custkey = c.c_custkey
        | JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        | JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        | WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        | GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin.replace("\n", " "),
    "q8_share" ->
      """WITH rows_ AS (
        |  SELECT o.o_orderdate,
        |   CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))
        |    AS vol, sn.n_name AS supp_nation
        |  FROM lineitem l
        |  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        |  JOIN region r ON cn.n_regionkey = r.r_regionkey
        |   AND r.r_name = 'AMERICA'
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        |  WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |   AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'),
        | agg AS (SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN vol
        |   ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS nation_volume,
        |  CAST(sum(vol) AS DOUBLE) AS total_volume
        |  FROM rows_ GROUP BY 1)
        | SELECT o_year, round(nation_volume / total_volume, 6) AS mkt_share,
        |  nation_volume, total_volume
        | FROM agg ORDER BY o_year""".stripMargin.replace("\n", " "),
    "q13_custdist" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        |  FROM customer c LEFT OUTER JOIN orders o
        |   ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        |  GROUP BY c.c_custkey) AS t
        | GROUP BY c_count
        | ORDER BY custdist DESC, c_count DESC""".stripMargin.replace("\n", " "),
    "q14_promo" ->
      """SELECT round(100.0 * promo_revenue / total_revenue, 6) AS promo_pct,
        |  promo_revenue, total_revenue FROM (
        |  SELECT
        |   CAST(sum(CASE WHEN p.p_type = 'PROMO'
        |    THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))
        |    ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS promo_revenue,
        |   CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
        |    AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
        |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |  WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |   AND l.l_shipdate < TIMESTAMP '1996-03-01 00:00:00') AS t""".stripMargin.replace("\n", " "),
    "q10_returns" ->
      """SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
        |  CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
        |   AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        | FROM lineitem l
        | JOIN orders o ON l.l_orderkey = o.o_orderkey
        | JOIN customer c ON o.o_custkey = c.c_custkey
        | JOIN nation n ON c.c_nationkey = n.n_nationkey
        | WHERE l.l_returnflag = 'R'
        |  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        | GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
        | ORDER BY revenue DESC, c.c_custkey LIMIT 20""".stripMargin.replace("\n", " "),
    // the scalar-subquery form; the Spark side's broadcast stats
    // frame + exact cross-multiplied DECIMAL threshold must agree
    "q22_idle" ->
      """WITH stats AS (SELECT
        |   sum(CAST(c_acctbal AS DECIMAL(18,2))) AS total_bal,
        |   count(*) AS n_pos
        |  FROM customer WHERE c_acctbal > 0)
        | SELECT c.c_nationkey, count(*) AS numcust,
        |  CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        | FROM customer c, stats
        | WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) * stats.n_pos > stats.total_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |   WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        | GROUP BY c.c_nationkey ORDER BY c.c_nationkey""".stripMargin.replace("\n", " "),
    "q19_disjunct" ->
      """SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
        | FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        | WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
        |    AND l.l_quantity BETWEEN 1 AND 11)
        |  OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
        |    AND l.l_quantity BETWEEN 10 AND 20)
        |  OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
        |    AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin.replace("\n", " "),
    // the textbook correlated form — deliberately NOT the Spark
    // side's aggregation rewrite, so the decorrelation itself is
    // what the cross-engine compare proves
    "q21_waiting" ->
      """SELECT s.s_name, count(*) AS numwait
        | FROM supplier s
        | JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        | JOIN orders o ON o.o_orderkey = l1.l_orderkey
        | WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |   WHERE l2.l_orderkey = l1.l_orderkey
        |    AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |   WHERE l3.l_orderkey = l1.l_orderkey
        |    AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R')
        | GROUP BY s.s_name
        | ORDER BY numwait DESC, s.s_name
        | LIMIT 100""".stripMargin.replace("\n", " "),
    "q_active_users" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |  FROM events),
        | dau AS (SELECT day, count(*) AS dau FROM days GROUP BY day),
        | fan AS (SELECT DISTINCT user_id, day + CAST(o AS INT) AS wday
        |  FROM days CROSS JOIN (SELECT unnest(range(0, 7)) AS o) AS os
        |  WHERE day + CAST(o AS INT) <= (SELECT max(day) FROM days)),
        | wau AS (SELECT wday AS day, count(*) AS wau FROM fan GROUP BY wday)
        | SELECT CAST(floor(epoch(dau.day::TIMESTAMP)) AS BIGINT) AS day_s,
        |  dau.dau, wau.wau
        | FROM dau JOIN wau ON wau.day = dau.day
        | ORDER BY day_s""".stripMargin.replace("\n", " "),
    "q_stickiness" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |  FROM events),
        | dau AS (SELECT day, count(*) AS dau FROM days GROUP BY day),
        | fan AS (SELECT DISTINCT user_id, day + CAST(o AS INT) AS wday
        |  FROM days CROSS JOIN (SELECT unnest(range(0, 28)) AS o) AS os
        |  WHERE day + CAST(o AS INT) <= (SELECT max(day) FROM days)),
        | mau AS (SELECT wday AS day, count(*) AS mau FROM fan GROUP BY wday)
        | SELECT CAST(floor(epoch(dau.day::TIMESTAMP)) AS BIGINT) AS day_s,
        |  dau.dau, mau.mau, round(dau.dau / mau.mau::DOUBLE, 6)
        |   AS stickiness
        | FROM dau JOIN mau ON mau.day = dau.day
        | ORDER BY day_s""".stripMargin.replace("\n", " "),
    "q_funnel_latency" ->
      """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        | c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN v ON v.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
        | p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |  JOIN c ON c.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id),
        | lat AS (SELECT (epoch_ns(p.t3) // 1000 - epoch_ns(v.t1) // 1000)
        |    / 1e6 AS s
        |  FROM v JOIN p ON p.user_id = v.user_id)
        | SELECT count(*) AS completers, round(avg(s), 6) AS mean_s,
        |  round(min(s), 6) AS min_s, round(max(s), 6) AS max_s,
        |  round(quantile_cont(s, 0.5), 6) AS median_s
        | FROM lat""".stripMargin.replace("\n", " "),
    "q_session_funnel" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |  floor(epoch(ts)) AS s FROM events),
        | g AS (SELECT *, CASE WHEN lag(s) OVER w IS NULL
        |    OR s - lag(s) OVER w >= 1800 THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY s, event_id)),
        | l AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id
        |   ORDER BY s, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM g),
        | s1 AS (SELECT user_id, sid, min(s) AS t FROM l
        |  WHERE event_type = 'view' GROUP BY user_id, sid),
        | s2 AS (SELECT l.user_id, l.sid, min(l.s) AS t FROM l
        |  JOIN s1 ON s1.user_id = l.user_id AND s1.sid = l.sid
        |  WHERE l.event_type = 'click' AND l.s > s1.t
        |  GROUP BY l.user_id, l.sid),
        | s3 AS (SELECT l.user_id, l.sid, min(l.s) AS t FROM l
        |  JOIN s2 ON s2.user_id = l.user_id AND s2.sid = l.sid
        |  WHERE l.event_type = 'purchase' AND l.s > s2.t
        |  GROUP BY l.user_id, l.sid),
        | c AS (SELECT 'view' AS step, (SELECT count(*) FROM s1) AS n_sessions
        |  UNION ALL SELECT 'click', (SELECT count(*) FROM s2)
        |  UNION ALL SELECT 'purchase', (SELECT count(*) FROM s3))
        | SELECT step, n_sessions,
        |  round(n_sessions::DOUBLE /
        |   (SELECT n_sessions FROM c WHERE step = 'view'), 6)
        |   AS frac_of_first
        | FROM c ORDER BY step""".stripMargin.replace("\n", " "),
    "q_cohort_ltv" ->
      """WITH e AS (SELECT user_id, value, date_trunc('week', ts) AS wk
        |  FROM events),
        | f AS (SELECT user_id, min(wk) AS cohort FROM e GROUP BY user_id),
        | wv AS (SELECT f.cohort,
        |   CAST(date_diff('day', f.cohort, e.wk) // 7 AS INT) AS week_offset,
        |   sum(e.value) AS v
        |  FROM e JOIN f ON f.user_id = e.user_id
        |  GROUP BY 1, 2 HAVING CAST(date_diff('day', f.cohort, e.wk) // 7 AS INT) <= 4),
        | sz AS (SELECT cohort, count(*) AS cohort_users FROM f GROUP BY cohort),
        | c AS (SELECT wv.cohort, wv.week_offset, sz.cohort_users,
        |   sum(wv.v) OVER (PARTITION BY wv.cohort ORDER BY wv.week_offset
        |    ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM wv JOIN sz ON sz.cohort = wv.cohort)
        | SELECT CAST(floor(epoch(cohort)) AS BIGINT) AS cohort_week_s,
        |  week_offset, cohort_users, round(cum, 6) AS cum_value,
        |  round(cum / cohort_users, 6) AS ltv_per_user
        | FROM c ORDER BY cohort_week_s, week_offset""".stripMargin.replace("\n", " "),
    "q_attribution" ->
      """WITH t0 AS (SELECT user_id, min(ts) AS ts FROM events
        |  GROUP BY user_id),
        | e0 AS (SELECT e.user_id, e.ts, min(e.event_id) AS event_id
        |  FROM events e JOIN t0 ON t0.user_id = e.user_id
        |   AND t0.ts = e.ts GROUP BY 1, 2),
        | ch AS (SELECT e.user_id, e.event_type AS channel FROM events e
        |  JOIN e0 ON e0.user_id = e.user_id AND e0.ts = e.ts
        |   AND e0.event_id = e.event_id),
        | p AS (SELECT user_id, sum(value) AS pv FROM events
        |  WHERE event_type = 'purchase' GROUP BY user_id),
        | a AS (SELECT ch.channel, count(*) AS users, count(p.pv) AS buyers,
        |   round(coalesce(sum(p.pv), 0), 6) AS attributed_value
        |  FROM ch LEFT JOIN p ON p.user_id = ch.user_id GROUP BY 1)
        | SELECT channel, users, buyers, attributed_value,
        |  round(CASE WHEN t.tot > 0
        |   THEN attributed_value / t.tot END, 6) AS value_share
        | FROM a CROSS JOIN
        |  (SELECT sum(attributed_value) AS tot FROM a) t
        | ORDER BY channel""".stripMargin.replace("\n", " "),
    "q_survival" ->
      """WITH u AS (SELECT user_id, CAST(min(ts) AS DATE) AS f,
        |  date_diff('day', CAST(min(ts) AS DATE), CAST(max(ts) AS DATE))
        |   AS life FROM events GROUP BY user_id),
        | w AS (SELECT CAST(max(ts) AS DATE) AS w_day FROM events),
        | fan AS (SELECT u.life, CAST(ks.k AS INT) AS k,
        |   date_diff('day', u.f, w.w_day) AS observable
        |  FROM u CROSS JOIN (SELECT unnest(range(1, 15)) AS k) ks
        |  CROSS JOIN w)
        | SELECT k, count(*) AS eligible,
        |  CAST(sum(CASE WHEN life >= k THEN 1 ELSE 0 END) AS BIGINT)
        |   AS surviving,
        |  round(sum(CASE WHEN life >= k THEN 1 ELSE 0 END)
        |   / count(*)::DOUBLE, 6) AS survival_rate
        | FROM fan WHERE observable >= k GROUP BY k
        | ORDER BY k""".stripMargin.replace("\n", " "),
    "q_pareto" ->
      """WITH per AS (SELECT user_id,
        |  sum(CAST(value AS DECIMAL(18,2))) AS vd FROM events
        |  GROUP BY user_id),
        | rk AS (SELECT vd, row_number() OVER (
        |   ORDER BY CAST(vd AS DOUBLE) DESC, user_id) - 1 AS r,
        |  count(*) OVER () AS n FROM per),
        | dd AS (SELECT (r * 10) // n + 1 AS decile, vd FROM rk),
        | ag AS (SELECT decile, count(*) AS users, sum(vd) AS vdec
        |  FROM dd GROUP BY decile),
        | tot AS (SELECT CAST(sum(vd) AS DOUBLE) AS g FROM per),
        | cs AS (SELECT decile, users, vdec,
        |  sum(vdec) OVER (ORDER BY decile) AS cumdec FROM ag)
        | SELECT CAST(decile AS BIGINT) AS decile, users,
        |  floor(CAST(vdec AS DOUBLE) * 1000000) / 1000000 AS value,
        |  floor(CAST(vdec AS DOUBLE) / tot.g * 1000000) / 1000000
        |   AS share,
        |  floor(CAST(cumdec AS DOUBLE) / tot.g * 1000000) / 1000000
        |   AS cum_share
        | FROM cs CROSS JOIN tot ORDER BY decile"""
        .stripMargin.replace("\n", " "),
    "q_topk_churn" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day, user_id,
        |  sum(CAST(value AS DECIMAL(18,2))) AS dv FROM events
        |  GROUP BY 1, 2),
        | top AS (SELECT day, user_id FROM (SELECT *,
        |   row_number() OVER (PARTITION BY day
        |    ORDER BY dv DESC, user_id ASC) AS rk FROM daily) AS z
        |  WHERE rk <= 10),
        | ret AS (SELECT t.day, count(*) AS retained
        |  FROM top t JOIN top n ON n.day = t.day + 1
        |   AND n.user_id = t.user_id GROUP BY t.day),
        | sz AS (SELECT day, count(*) AS n_top FROM top GROUP BY day),
        | nsz AS (SELECT day - 1 AS day, n_top AS n_top_next FROM sz)
        | SELECT CAST(floor(epoch(sz.day::TIMESTAMP)) AS BIGINT) AS day_s,
        |  sz.n_top, nsz.n_top_next,
        |  coalesce(ret.retained, 0) AS retained,
        |  nsz.n_top_next - coalesce(ret.retained, 0) AS entered,
        |  sz.n_top - coalesce(ret.retained, 0) AS exited
        | FROM sz JOIN nsz ON nsz.day = sz.day
        | LEFT JOIN ret ON ret.day = sz.day
        | ORDER BY day_s""".stripMargin.replace("\n", " "),
    "q_props_stats" ->
      """SELECT event_type, count(*) AS n, count(k) AS n_k,
        | CAST(sum(k) AS BIGINT) AS sum_k, min(k) AS min_k,
        | max(k) AS max_k, round(avg(k), 6) AS avg_k,
        | round(quantile_cont(k, 0.5), 6) AS p50_k
        | FROM (SELECT event_type,
        |  TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events) AS e
        | GROUP BY event_type ORDER BY event_type"""
        .stripMargin.replace("\n", " "),
    "q_gap_stats" ->
      """WITH g AS (SELECT
        |  floor(epoch(ts)) - lag(floor(epoch(ts))) OVER (
        |   PARTITION BY user_id ORDER BY ts, event_id) AS gap
        | FROM events)
        | SELECT count(*) AS n_gaps,
        |  round(quantile_cont(gap, 0.5), 6) AS p50_gap_s,
        |  round(quantile_cont(gap, 0.9), 6) AS p90_gap_s,
        |  round(quantile_cont(gap, 0.99), 6) AS p99_gap_s,
        |  round(avg(CASE WHEN gap > 1800 THEN 1.0 ELSE 0.0 END), 6)
        |   AS frac_over_gap
        | FROM g WHERE gap IS NOT NULL""".stripMargin.replace("\n", " "),
    "q_user_activity" ->
      """WITH pu AS (SELECT user_id, count(*) AS n FROM events
        |  GROUP BY user_id),
        | st AS (SELECT count(*) AS n_users, sum(n) AS tot,
        |  round(quantile_cont(n, 0.5), 6) AS p50_events,
        |  quantile_cont(n, 0.9) AS p90,
        |  round(quantile_cont(n, 0.99), 6) AS p99_events FROM pu)
        | SELECT st.n_users, st.p50_events,
        |  round(st.p90, 6) AS p90_events, st.p99_events,
        |  round(sum(CASE WHEN pu.n >= st.p90 THEN pu.n ELSE 0 END)::DOUBLE
        |   / st.tot, 6) AS top_share
        | FROM pu, st
        | GROUP BY st.n_users, st.tot, st.p50_events, st.p90, st.p99_events""".stripMargin.replace("\n", " "),
    "q_session_stats" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS us FROM events),
        | g AS (SELECT user_id, us,
        |  CASE WHEN lag(us) OVER w IS NULL
        |        OR us - lag(us) OVER w >= 1800000000 THEN 1 ELSE 0 END
        |   AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
        | s AS (SELECT user_id, us,
        |  sum(new_s) OVER (PARTITION BY user_id ORDER BY us
        |   ROWS UNBOUNDED PRECEDING) AS sid FROM g),
        | sess AS (SELECT user_id, count(*) AS n_events,
        |  (max(us) + 1800000000 - min(us))::DOUBLE / 1e6 AS dur_s
        |  FROM s GROUP BY user_id, sid)
        | SELECT count(*) AS n_sessions,
        |  count(DISTINCT user_id) AS n_users,
        |  round(avg(n_events), 6) AS avg_events,
        |  round(quantile_cont(n_events, 0.5), 6) AS median_events,
        |  round(quantile_cont(dur_s, 0.5), 6) AS median_dur_s,
        |  round(quantile_cont(dur_s, 0.9), 6) AS p90_dur_s
        | FROM sess""".stripMargin.replace("\n", " "),
    "q_transitions" ->
      """WITH seq AS (SELECT event_type AS src,
        |  lead(event_type, 1) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS dst
        | FROM events),
        | t AS (SELECT src, dst, count(*) AS n FROM seq
        |  WHERE dst IS NOT NULL GROUP BY src, dst)
        | SELECT src, dst, n,
        |  round(n::DOUBLE / sum(n) OVER (PARTITION BY src), 6) AS p
        | FROM t ORDER BY src, dst""".stripMargin.replace("\n", " "),
    "q_event_paths" ->
      """WITH seq AS (SELECT
        |   event_type AS e1,
        |   lead(event_type, 1) OVER w AS e2,
        |   lead(event_type, 2) OVER w AS e3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        | p AS (SELECT e1 || '>' || e2 || '>' || e3 AS path, count(*) AS n
        |  FROM seq WHERE e3 IS NOT NULL GROUP BY 1)
        | SELECT path, n,
        |  row_number() OVER (ORDER BY n DESC, path ASC) AS rk
        | FROM p ORDER BY n DESC, path ASC LIMIT 10""".stripMargin.replace("\n", " "),
    "q_pagerank" -> {
      // 5 unrolled damped-PageRank rounds; each round MATERIALIZED so
      // DuckDB doesn't inline the previous round's CTE once per
      // reference (the same CTE-inlining blowup the BPE oracle hit)
      val rounds = (1 to 5).map { r =>
        val p = s"p${r - 1}"
        s"""c$r AS (SELECT e.dst AS node, sum(p.pr * e.n / o.out_n) AS c
           | FROM e JOIN o USING (src) JOIN $p p ON p.node = e.src
           | GROUP BY e.dst),
           | d$r AS (SELECT coalesce(sum(pr), 0.0) AS dm FROM $p
           | WHERE node NOT IN (SELECT src FROM o)),
           | p$r AS MATERIALIZED (SELECT nd.node,
           | (1.0 - 0.85) / nn.n_nodes
           |  + 0.85 * (coalesce(c.c, 0.0) + d$r.dm / nn.n_nodes) AS pr
           | FROM nd LEFT JOIN c$r c ON c.node = nd.node, d$r, nn)"""
          .stripMargin.replace("\n", " ")
      }.mkString(", ")
      s"""WITH e AS MATERIALIZED (SELECT src, dst, count(*) AS n FROM (
         |  SELECT event_type AS src, lead(event_type) OVER (
         |   PARTITION BY user_id ORDER BY ts, event_id) AS dst FROM events) t
         |  WHERE dst IS NOT NULL GROUP BY src, dst),
         | o AS (SELECT src, sum(n) AS out_n FROM e GROUP BY src),
         | nd AS MATERIALIZED (SELECT DISTINCT event_type AS node FROM events),
         | nn AS (SELECT count(*)::DOUBLE AS n_nodes FROM nd),
         | p0 AS (SELECT node, 1.0 / n_nodes AS pr FROM nd, nn),
         | $rounds
         | SELECT node, round(pr, 6) AS pr FROM p5
         | ORDER BY pr DESC, node ASC""".stripMargin.replace("\n", " ")
    },
    "q_ab_test" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        | uv AS (SELECT user_id, user_id % 2 AS v FROM u),
        | cv AS (SELECT DISTINCT user_id, 1 AS c FROM events
        |  WHERE event_type = 'purchase'),
        | per AS (SELECT v, count(*) AS n,
        |  CAST(sum(coalesce(c, 0)) AS BIGINT) AS conv
        |  FROM uv LEFT JOIN cv USING (user_id) GROUP BY v),
        | card AS (SELECT
        |  CAST(sum(CASE WHEN v = 0 THEN n END) AS BIGINT) AS a_users,
        |  CAST(sum(CASE WHEN v = 0 THEN conv END) AS BIGINT) AS a_conv,
        |  CAST(sum(CASE WHEN v = 1 THEN n END) AS BIGINT) AS b_users,
        |  CAST(sum(CASE WHEN v = 1 THEN conv END) AS BIGINT) AS b_conv
        |  FROM per),
        | calc AS (SELECT *,
        |  a_conv::DOUBLE / a_users AS ra, b_conv::DOUBLE / b_users AS rb,
        |  sqrt((a_conv + b_conv)::DOUBLE / (a_users + b_users)
        |   * (1.0 - (a_conv + b_conv)::DOUBLE / (a_users + b_users))
        |   * (1.0 / a_users + 1.0 / b_users)) AS se
        |  FROM card)
        | SELECT a_users, a_conv, round(ra, 6) AS a_rate,
        |  b_users, b_conv, round(rb, 6) AS b_rate,
        |  round(rb - ra, 6) AS rate_diff, round(se, 6) AS pooled_se,
        |  round(CASE WHEN se > 0 THEN (rb - ra) / se END, 6) AS z_v,
        |  coalesce(CAST(abs(round(CASE WHEN se > 0
        |   THEN (rb - ra) / se END, 6)) > 1.96 AS INT), 0) AS significant
        | FROM calc""".stripMargin.replace("\n", " ")
  )
}
