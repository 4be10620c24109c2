package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational analytics over the lakehouse tables — the query layer a
  * user points at the silver/gold zone.
  *
  * Decimal arithmetic everywhere money is summed: exact, associative,
  * engine-portable (double sums are order-dependent and would differ
  * across engines and across partition counts). Final projections
  * cast back to double for a stable output type.
  *
  * Scale notes: dimension tables (region/nation/supplier/part) are
  * broadcast — at 100 TB the fact tables shuffle only when an
  * aggregation key demands it, and AQE coalesces/skew-splits those
  * exchanges at runtime.
  */
object Analytics {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  /** TPC-H Q1-style pricing summary: multi-aggregate scan of lineitem.
    * Zero joins; one hash shuffle on (returnflag, linestatus) after
    * map-side partial aggregation. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** TPC-H Q3-style: top orders by revenue for one market segment.
    * customer is broadcast (small side); lineitem⋈orders shuffles on
    * orderkey; top-k via global sort of the tiny aggregated result. */
  def topOrders(spark: SparkSession, dir: String, segment: String = "BUILDING", k: Int = 10): DataFrame = {
    val c = Tables.customer(spark, dir).where(col("c_mktsegment") === segment)
    val o = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(k)
  }

  /** TPC-H Q5-style: revenue by nation within a region, customer and
    * supplier in the same nation. All dims broadcast; the only big
    * shuffle is lineitem⋈orders on orderkey. */
  def regionVolume(spark: SparkSession, dir: String, region: String = "ASIA"): DataFrame = {
    val r = Tables.region(spark, dir).where(col("r_name") === region)
    val n = Tables.nation(spark, dir)
    val c = Tables.customer(spark, dir)
    val s = Tables.supplier(spark, dir)
    val o = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Window functions: per-customer order rank and running spend. */
  def windowRank(spark: SparkSession, dir: String, maxRank: Int = 3): DataFrame = {
    val o = Tables.orders(spark, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.select(
        col("o_custkey"), col("o_orderkey"),
        dec(col("o_totalprice")).as("price_d"),
        rank().over(w).as("rnk"),
        sum(dec(col("o_totalprice")))
          .over(w.rowsBetween(Window.unboundedPreceding, 0))
          .as("running_spend_d"))
      .where(col("rnk") <= maxRank)
      .select(
        col("o_custkey"), col("o_orderkey"),
        col("price_d").cast("double").as("o_totalprice"),
        col("rnk").cast("long").as("rnk"),
        col("running_spend_d").cast("double").as("running_spend"))
      .orderBy(col("o_custkey"), col("rnk"), col("o_orderkey"))
  }

  /** As-of join: each event paired with the user's most recent order
    * at or before the event time (point-in-time enrichment — the
    * join a feature-store lookup needs). Build side deduped to one
    * row per (customer, date) with the max orderkey winning. */
  def eventOrderAsOf(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("event_id"), col("user_id"), col("ts"))
    val w = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
      .orderBy(col("o_orderkey").desc)
    val build = Tables.orders(spark, dir)
      .withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
      .select(col("o_custkey").as("user_id"), col("o_orderdate"),
        col("o_orderkey"), col("o_totalprice"))
    AsOfJoin.asof(ev, build, "user_id", "ts", "o_orderdate",
        Seq("o_orderkey", "o_totalprice"))
      .where(col("o_orderkey").isNotNull)
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"),
        col("o_orderkey"), dec(col("o_totalprice")).cast("double").as("o_totalprice"))
      .orderBy(col("event_id"))
  }

  /** ROLLUP aggregation: per (returnflag, linestatus) with subtotal
    * and grand-total rows — one pass, grouping-set expansion handled
    * by Catalyst's Expand operator. */
  def pricingRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Anti-join: customers with no order since `cutoff` (churn
    * detection), counted per segment. The filter lands on the build
    * side *before* the anti-join, so the hash table holds only
    * recent orderers. */
  def custNoOrders(spark: SparkSession, dir: String,
                   cutoff: String = "2000-01-01"): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
      .where(col("o_orderdate") >= lit(cutoff).cast("timestamp"))
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  /** Pivot-style conditional aggregation: one column per event type
    * (static type list so the plan is a single pass — a dynamic pivot
    * would need a driver-side distinct first). */
  def eventTypePivot(spark: SparkSession, dir: String): DataFrame = {
    val aggs = EventTypes.map(t =>
      count(when(col("event_type") === t, 1)).as(s"n_$t"))
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col("user_id"))
  }

  /** HLL sketch distinct counts (approx_count_distinct) next to the
    * exact answer — the O(1)-memory path for 100 TB cardinalities.
    * The raw sketch estimate is engine-specific, so the verified
    * output is the exact count plus `approx_ok`: estimate within
    * ±5% of exact (HLL++ at rsd=0.02 stays well inside; at gate
    * cardinalities the sparse encoding is exact). Hash-checkable
    * without pinning another engine's sketch internals. */
  /** Customer balance deciles (exact NTILE semantics) with
    * per-decile stats — the classic distribution report, computed
    * WITHOUT a global window: percentile-boundary bands on
    * c_acctbal (one approx_percentile aggregate; boundary precision
    * affects only balance, never the answer) → exact per-band counts
    * → driver prefix offsets → per-band row_number + offset = exact
    * global rank → decile by pure rank arithmetic
    * (`Ranks.ntileFromRank`). TPC-H customer grows with SF (~15 B
    * rows at 100 TB), so the single-reducer ntile sort is banned
    * here just like on the facts. */
  def customerDeciles(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val bs = Ranks.percentileBoundaries(c, col("c_acctbal"), 32)
    val band = Ranks.valueBands(col("c_acctbal"), bs, descending = true)
    val (ranked, n) = Ranks.withGlobalRank(c, band,
      Seq(col("c_acctbal").desc, col("c_custkey")), "rnk")
    ranked
      .withColumn("decile", Ranks.ntileFromRank("rnk", 10, n))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("c_acctbal").cast("decimal(18,4)")).cast("double") /
          count(lit(1)), 4).as("avg_bal"),
        min(col("c_acctbal")).as("min_bal"),
        max(col("c_acctbal")).as("max_bal"))
      .orderBy(col("decile"))
  }

  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")) <=
          col("exact_users") * 0.05).cast("long").as("approx_ok"))
      .orderBy(col("event_type"))

  /** Top customers by total spend among those with > minOrders
    * orders — groupBy + having + top-k. */
  def topCustomers(spark: SparkSession, dir: String, minOrders: Int = 12, k: Int = 10): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    o.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), sum(dec(col("o_totalprice"))).as("spend_d"))
      .where(col("n_orders") > minOrders)
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("n_orders"),
        col("spend_d").cast("double").as("total_spend"))
      .orderBy(col("total_spend").desc, col("c_custkey"))
      .limit(k)
  }

  /** Fixed-width value histogram: the band key is computed
    * ARITHMETICALLY map-side (floor(value/width)) and aggregated, so
    * the fact table never joins pre-aggregation; the O(bands) result
    * then left-joins onto the band table to keep empty bands. (A
    * range JOIN formulation of a left-outer band lookup would force
    * Spark's nested-loop join to broadcast the FACT side — the
    * preserved side must stream — which is an OOM at scale; for
    * genuinely irregular bands, inner-join with the band table
    * broadcast, or bucketize the boundaries.) */
  /** Orders priced above their own customer's average (the
    * correlated-subquery shape, decorrelated): the per-customer
    * average is one partial aggregation over orders (exact DECIMAL
    * sum / count), joined back on the same o_custkey hash
    * partitioning — Catalyst reuses the exchange, so the "subquery"
    * costs one extra agg, not a second scan shuffle. Counts roll up
    * per market segment with the customer dim broadcast. */
  def aboveAvgOrders(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val custAvg = orders.groupBy(col("o_custkey"))
      .agg((sum(dec(col("o_totalprice"))).cast("double") / count(lit(1)))
        .as("avg_price"))
    val above = orders.join(custAvg, "o_custkey")
      .where(col("o_totalprice") > col("avg_price"))
    above.join(broadcast(Tables.customer(spark, dir)),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_above"),
        countDistinct(col("o_custkey")).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  /** Revenue by part brand: the classic fact×dimension rollup — part
    * broadcasts (MBs at any SF), lineitem streams through map-side,
    * one hash shuffle on the ~brand-cardinality partials. */
  def partBrandRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.join(broadcast(Tables.part(spark, dir)),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n_lineitems"),
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice")) * (lit(BigDecimal(1)).cast("decimal(18,2)") -
          dec(col("l_discount")))).cast("double").as("revenue"))
      .orderBy(col("p_brand"))
  }

  /** Customers owning at least one order above `threshold`, counted
    * per market segment — the EXISTS shape as an explicit LEFT SEMI
    * join: the distinct-key probe side reduces BEFORE the join, so
    * the semi join carries one row per qualifying customer. */
  def highValueCustomers(spark: SparkSession, dir: String,
                         threshold: Double = 400000.0): DataFrame = {
    val hot = Tables.orders(spark, dir)
      .where(col("o_totalprice") > threshold)
      .select(col("o_custkey")).distinct()
    Tables.customer(spark, dir)
      .join(hot, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        (sum(dec(col("c_acctbal"))).cast("double") / count(lit(1))).as("avg_acctbal"))
      .orderBy(col("c_mktsegment"))
  }

  def valueBands(spark: SparkSession, dir: String,
                 nBands: Int = 10, width: Double = 50.0): DataFrame = {
    val bands = spark.range(nBands).select(col("id").as("band"),
      (col("id") * width).cast("double").as("lo"),
      ((col("id") + 1) * width).cast("double").as("hi"))
    val agg = Tables.events(spark, dir)
      .select(floor(col("value") / width).cast("long").as("band"),
        col("value"), col("event_id"))
      .where(col("band") >= 0 && col("band") < nBands)
      .groupBy(col("band"))
      .agg(count(col("event_id")).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
    bands.join(broadcast(agg), Seq("band"), "left")
      .select(col("band"), col("lo"), col("hi"),
        coalesce(col("n_events"), lit(0L)).as("n_events"), col("sum_value"))
      .orderBy(col("band"))
  }

  /** TPC-H Q4 shape (reference lineitem has no commit/receipt dates,
    * so "late" = shipped more than `lateDays` after the order date):
    * order-priority counts over a date window where EXISTS a late
    * lineitem. The EXISTS is a LEFT SEMI join on orderkey — lineitem
    * reduces map-side to the qualifying keys (the date filter on
    * orders is pushed to its scan), and the semi join emits each
    * order at most once regardless of how many lines matched. */
  def orderPriorityLate(spark: SparkSession, dir: String,
                        from: String = "1997-01-01", until: String = "1997-07-01",
                        lateDays: Int = 90): DataFrame = {
    val o = Tables.orders(spark, dir)
      .where(col("o_orderdate") >= lit(from).cast("timestamp") &&
        col("o_orderdate") < lit(until).cast("timestamp"))
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_shipdate"))
    o.join(li, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q13 shape: distribution of customers by order count,
    * INCLUDING zero-order customers (the left outer join is the whole
    * point). Two aggregations: per-customer counts shuffle on
    * custkey; the histogram over the O(customers) result is tiny. */
  def custOrderDistribution(spark: SparkSession, dir: String): DataFrame =
    custOrderDist(Tables.customer(spark, dir), Tables.orders(spark, dir))

  def custOrderDist(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.select(col("c_custkey"))
      .join(orders.select(col("o_custkey"), col("o_orderkey")),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .groupBy(col("n_orders"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("n_orders"))

  /** TPC-H Q17 shape: revenue from small-quantity lineitems — lines
    * whose quantity is below 20% of their part's average quantity.
    * The correlated AVG decorrelates into one per-part aggregation
    * joined back on partkey (both sides hash-partition on partkey;
    * the aggregated side is O(parts) and broadcasts under AQE when
    * small). The threshold compare is cross-multiplied into exact
    * DECIMAL terms (qty * 5 * n < sum_qty) so no engine-specific
    * float division decides membership. */
  def smallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val partAvg = li.groupBy(col("l_partkey").as("pk"))
      .agg(sum(dec(col("l_quantity"))).as("sum_qty_d"), count(lit(1)).as("n_lines"))
    li.join(partAvg, col("l_partkey") === col("pk"))
      .where(dec(col("l_quantity")) * lit(5) * col("n_lines") < col("sum_qty_d"))
      .agg(count(lit(1)).as("n_small"),
        sum(dec(col("l_extendedprice"))).cast("double").as("total_price"))
  }

  /** Share-of-total window: each supplier's revenue as a fraction of
    * its nation's total (the ratio_to_report shape). The window SUM
    * runs over the already-aggregated O(suppliers) rows — the
    * lineitem fact never enters a window — and sums DECIMAL, so the
    * denominator is exact; the share stays a raw double quotient. */
  def supplierShare(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val rev = li
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("s_name"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(BigDecimal(1)).cast("decimal(18,2)") -
        dec(col("l_discount")))).as("rev_d"))
    val w = Window.partitionBy(col("n_name"))
    rev.select(col("n_name"), col("s_name"),
        col("rev_d").cast("double").as("revenue"),
        (col("rev_d").cast("double") / sum(col("rev_d")).over(w).cast("double"))
          .as("nation_share"),
        row_number().over(w.orderBy(col("rev_d").desc, col("s_name")))
          .cast("long").as("nation_rank"))
      .orderBy(col("n_name"), col("nation_rank"))
  }

  /** Year-over-year growth per market segment: yearly DECIMAL revenue
    * rollup (O(segments · years) rows), then a lag window over that
    * tiny aggregate — the trend query every lakehouse dashboard runs.
    * Growth is a raw double quotient; the first year emits NULLs. */
  def yoyGrowth(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val yearly = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), year(col("o_orderdate")).cast("long").as("yr"))
      .agg(sum(dec(col("o_totalprice"))).as("rev_d"), count(lit(1)).as("n_orders"))
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("yr"))
    yearly.select(col("c_mktsegment"), col("yr"), col("n_orders"),
        col("rev_d").cast("double").as("revenue"),
        lag(col("rev_d"), 1).over(w).cast("double").as("prev_revenue"))
      .withColumn("yoy_growth",
        (col("revenue") - col("prev_revenue")) / col("prev_revenue"))
      .orderBy(col("c_mktsegment"), col("yr"))
  }

  /** Cumulative monthly revenue per market segment: DECIMAL monthly
    * rollup (O(segments · months) rows), then a running-sum window
    * over that tiny aggregate — the cumulative trend line. The
    * window sums DECIMAL, so the running totals are exact. */
  def monthlyCumRevenue(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val monthly = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"),
        date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(sum(dec(col("o_totalprice"))).as("rev_d"), count(lit(1)).as("n_orders"))
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("month"))
      .rowsBetween(Window.unboundedPreceding, 0)
    monthly.select(col("c_mktsegment"), col("month"), col("n_orders"),
        col("rev_d").cast("double").as("revenue"),
        sum(col("rev_d")).over(w).cast("double").as("cum_revenue"))
      .orderBy(col("c_mktsegment"), col("month"))
  }

  /** Customer-nation × supplier-nation trade matrix: the two-dim
    * rollup over the full star join. Both nation dims broadcast
    * twice under different aliases; the only big shuffle is
    * lineitem⋈orders on orderkey, then O(nations²) partials. */
  def nationTradeMatrix(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val n = Tables.nation(spark, dir)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n.select(col("n_nationkey").as("cnk"), col("n_name").as("cust_nation"))),
        col("c_nationkey") === col("cnk"))
      .join(broadcast(n.select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("snk"))
      .groupBy(col("cust_nation"), col("supp_nation"))
      .agg(count(lit(1)).as("n_lineitems"),
        sum(dec(col("l_extendedprice")) * (lit(BigDecimal(1)).cast("decimal(18,2)") -
          dec(col("l_discount")))).cast("double").as("revenue"))
      .orderBy(col("cust_nation"), col("supp_nation"))
  }

  /** Sliding window frame: per-user moving average of `value` over
    * the previous `frame` events (ROWS BETWEEN frame-1 PRECEDING AND
    * CURRENT ROW). One hash shuffle on user_id; the frame sum is
    * DECIMAL (exact, order-independent) and the average divides in
    * double only at output. */
  def movingAvg(spark: SparkSession, dir: String, frame: Int = 5): DataFrame =
    movingAvgOf(Tables.events(spark, dir), frame)

  def movingAvgOf(events: DataFrame, frame: Int = 5): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-(frame - 1), 0)
    events
      .select(col("user_id"), col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"),
        round(col("value"), 4).as("value"),
        round(sum(col("value").cast("decimal(18,4)")).over(w).cast("double") /
          count(lit(1)).over(w), 4).as("mov_avg"),
        count(lit(1)).over(w).as("n_in_frame"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Benford's-law first-digit audit on order totals — the classic
    * fabricated-data screen: naturally-grown monetary values follow
    * P(d) = log10(1 + 1/d); synthetic or tampered ones usually
    * don't. First digit extraction is pure integer/string (floor →
    * BIGINT → first char), never float log; observed shares are ppm
    * by integer division; expectations are injected as precomputed
    * integer literals — bit-exact on both engines. One 9-row
    * aggregation with map-side partials. */
  def benfordDigits(spark: SparkSession, dir: String): DataFrame = {
    val expPpm = (1 to 9).map(d => d.toLong ->
      math.floor(math.log10(1.0 + 1.0 / d) * 1e6).toLong).toMap
    val digits = Tables.orders(spark, dir)
      .where(col("o_totalprice") >= 1.0)
      .select(substring(floor(col("o_totalprice")).cast("long").cast("string"), 1, 1)
        .cast("long").as("digit"))
    val tot = digits.agg(count(lit(1)).as("total"))
    digits.groupBy(col("digit")).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        expr("n * 1000000 div total").as("obs_ppm"),
        element_at(typedlit(expPpm), col("digit")).as("exp_ppm"))
      .withColumn("dev_ppm", col("obs_ppm") - col("exp_ppm"))
      .orderBy(col("digit"))
  }

  /** Approximate-percentile accuracy contract, the quantile twin of
    * `approxDistinct`: the t-digest style `approx_percentile` sketch
    * value is engine-specific, but "the estimate lands within ±2% of
    * the exact median" is not — per return flag the query emits the
    * count and the contract verdict, and the oracle expects
    * approx_ok=1 from its own exact quantile. The approx path is the
    * 100 TB one (constant-size sketch per group, map-side merge); the
    * exact percentile here exists only to score it. */
  def approxPercentile(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("approx_p50"),
        expr("percentile(l_extendedprice, 0.5)").as("exact_p50"))
      .select(col("l_returnflag"), col("n_rows"),
        (abs(col("approx_p50") - col("exact_p50")) <= col("exact_p50") * 0.02)
          .cast("long").as("approx_ok"))
      .orderBy(col("l_returnflag"))

  /** SCD Type-2 dimension build: each customer's order-priority
    * history collapsed into versioned validity intervals — the
    * slowly-changing-dimension table a lakehouse maintains next to
    * its facts (Kimball SCD2: valid_from/valid_to/is_current).
    * Change detection is lag() per customer, the running change
    * count numbers the versions, and lead() closes each interval
    * with the next version's start. Every window partitions by
    * custkey — O(orders per customer) state, embarrassingly
    * parallel; the open interval gets the sentinel 9999-12-31. */
  def scd2Priority(spark: SparkSession, dir: String): DataFrame =
    scd2Of(Tables.orders(spark, dir))

  /** Core SCD2 build over any orders-shaped input — shared by the
    * batch query and the streaming incremental maintainer (which
    * re-runs it per micro-batch on just the touched customers). */
  def scd2Of(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val seg = orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .withColumn("chg",
        when(lag(col("o_orderpriority"), 1).over(w).isNull ||
          lag(col("o_orderpriority"), 1).over(w) =!= col("o_orderpriority"), 1L)
          .otherwise(0L))
      .withColumn("version", sum(col("chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val w2 = Window.partitionBy(col("custkey")).orderBy(col("version"))
    seg.groupBy(col("o_custkey").as("custkey"), col("version"), col("o_orderpriority").as("priority"))
      .agg(min(col("o_orderdate")).as("vf"), count(lit(1)).as("n_orders"))
      .withColumn("vt", lead(col("vf"), 1).over(w2))
      .select(col("custkey"), col("version"), col("priority"),
        date_format(col("vf"), "yyyy-MM-dd").as("valid_from"),
        coalesce(date_format(col("vt"), "yyyy-MM-dd"), lit("9999-12-31")).as("valid_to"),
        when(col("vt").isNull, 1L).otherwise(0L).as("is_current"),
        col("n_orders"))
      .orderBy(col("custkey"), col("version"))
  }

  /** Orders-in-flight backlog by month: an order opens at
    * o_orderdate and closes when its LAST line ships; the backlog at
    * a month's end is cumulative(opened) − cumulative(closed) — the
    * interval-counting shape behind every WIP/inventory dashboard.
    *
    * Scale: one groupBy(orderkey) rollup of lineitem (corpus-scale,
    * shuffles on the join key it already needs) joined to orders,
    * reduced immediately to the O(months) open/close rollup; the
    * cumulative window runs over months only (bounded — the
    * `ev_cum_users` allowlist family). */
  def ordersBacklog(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val spans = lineitem.groupBy(col("l_orderkey"))
      .agg(max(col("l_shipdate")).as("close_ts"))
      .join(orders.select(col("o_orderkey"), col("o_orderdate")),
        col("o_orderkey") === col("l_orderkey"))
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("om"),
        date_format(col("close_ts"), "yyyy-MM").as("cm"))
    val opened = spans.groupBy(col("om").as("month")).agg(count(lit(1)).as("opened"))
    val closed = spans.groupBy(col("cm").as("month")).agg(count(lit(1)).as("closed"))
    val w = Window.orderBy(col("month"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    opened.join(closed, Seq("month"), "full_outer")
      .select(col("month"), coalesce(col("opened"), lit(0L)).as("opened"),
        coalesce(col("closed"), lit(0L)).as("closed"))
      .withColumn("backlog", sum(col("opened") - col("closed")).over(w))
      .orderBy(col("month"))
  }

  /** Referential-integrity audit for one FK relationship: child rows
    * whose key has no parent (the orphan count every load pipeline
    * checks before publishing). Scale shape: the parent side reduces
    * to DISTINCT keys before the anti-join — dimension-sized parents
    * broadcast, fact-sized ones shuffle once on the key, and the
    * child is never scanned twice (both aggregates ride one plan). */
  def referentialOrphans(name: String, child: DataFrame, childKey: String,
                         parent: DataFrame, parentKey: String): DataFrame = {
    val total = child.agg(count(lit(1)).as("n_children"))
    val orphans = child
      .join(parent.select(col(parentKey)).distinct(),
        child(childKey) === col(parentKey), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
    total.crossJoin(orphans)
      .select(lit(name).as("relationship"), col("n_children"), col("n_orphans"),
        round(col("n_orphans").cast("double") / col("n_children"), 6)
          .as("orphan_rate"))
  }
}
