package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The remaining hard TPC-H query shapes, adapted to the driver's
  * star schema (no partsupp/phone/shipmode columns — each query keeps
  * the SHAPE that makes the original hard: correlated scalar
  * subqueries, argmin-over-ratio, HAVING against a global total,
  * multi-EXISTS, disjunctive pushdown).
  *
  * Reference context: silwalumit/lakehouse-to-rag drives its marts
  * with SQL transforms over the lakehouse zones (src/transforms);
  * these are the classic OLAP shapes a user of that pipeline would
  * point at the silver/gold tables.
  *
  * Determinism rules follow Analytics: money sums in DECIMAL(18,2),
  * ratios either cross-multiplied (membership tests) or reduced to
  * integer arithmetic (shares in ppm via BIGINT floor division —
  * exact and identical across engines, unlike float division; at
  * extreme scale the ppm numerator would move to DECIMAL(38,0), same
  * semantics).
  */
object TpchShapes {

  private def dec(c: Column) = c.cast("decimal(18,2)")
  private val one = lit(BigDecimal(1)).cast("decimal(18,2)")
  private def rev(p: Column, d: Column) = dec(p) * (one - dec(d))

  /** TPC-H Q10 shape: revenue lost to returned items per customer.
    * Fact-side filters (returnflag, order-date window) push to the
    * scans; customer and nation broadcast; one shuffle on custkey for
    * the aggregation. Top 20 by exact DECIMAL revenue. */
  def returnedRevenue(spark: SparkSession, dir: String,
                      from: String = "1998-01-01", until: String = "1998-07-01",
                      k: Int = 20): DataFrame = {
    val o = Tables.orders(spark, dir)
      .where(col("o_orderdate") >= lit(from).cast("timestamp") &&
        col("o_orderdate") < lit(until).cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.lineitem(spark, dir).where(col("l_returnflag") === "R")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(rev(col("l_extendedprice"), col("l_discount"))).as("rev_d"),
        count(lit(1)).as("n_items"))
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"), col("n_items"),
        col("rev_d").cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(k)
  }

  /** TPC-H Q14 shape: promotion revenue share over a ship-date
    * window. The share is computed in parts-per-million by BIGINT
    * floor division over exact DECIMAL cent totals — no float
    * division decides the output. Part broadcasts; the window filter
    * pushes to the lineitem scan. */
  def promoShare(spark: SparkSession, dir: String,
                 from: String = "1998-01-01", until: String = "1998-04-01"): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp"))
    li.join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO",
          rev(col("l_extendedprice"), col("l_discount")))
          .otherwise(lit(BigDecimal(0)).cast("decimal(18,2)"))).as("promo_d"),
        sum(rev(col("l_extendedprice"), col("l_discount"))).as("total_d"))
      .select(
        col("promo_d").cast("double").as("promo_revenue"),
        col("total_d").cast("double").as("total_revenue"),
        expr("cast(promo_d * 100 as bigint) * 1000000L div cast(total_d * 100 as bigint)")
          .as("promo_ppm"))
  }

  /** TPC-H Q15 shape: the supplier(s) with maximum revenue over a
    * quarter — HAVING against a global scalar MAX. Revenue aggregates
    * per supplier (one shuffle, O(suppliers) result); the scalar max
    * over that tiny aggregate cross-joins back (broadcast, one row).
    * Ties are kept, exactly as the original's view formulation. */
  def topSupplier(spark: SparkSession, dir: String,
                  from: String = "1998-01-01", until: String = "1998-04-01"): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp"))
    val revBySupp = li.groupBy(col("l_suppkey"))
      .agg(sum(rev(col("l_extendedprice"), col("l_discount"))).as("rev_d"))
    val maxRev = revBySupp.agg(max(col("rev_d")).as("max_rev"))
    revBySupp.crossJoin(broadcast(maxRev))
      .where(col("rev_d") === col("max_rev"))
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("rev_d").cast("double").as("total_rev"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q18 shape: large-volume orders — IN over a grouped HAVING.
    * The qualifying orderkeys reduce to O(matches) before any join
    * (sum(qty) > threshold on the lineitem aggregation), then join
    * orders and broadcast customer. The quantity threshold compares
    * DECIMAL sums exactly. */
  def largeOrders(spark: SparkSession, dir: String, minQty: Int = 250): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_quantity"))).as("qty_d"))
      .where(col("qty_d") > lit(BigDecimal(minQty)).cast("decimal(18,2)"))
    big.join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        dec(col("o_totalprice")).cast("double").as("o_totalprice"),
        col("qty_d").cast("double").as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
  }

  /** TPC-H Q21 shape: suppliers who were the ONLY late shipper on a
    * multi-supplier order (EXISTS another supplier + NOT EXISTS
    * another late supplier). Decorrelated into two aggregations that
    * reuse one hash partitioning on orderkey: per (order, supplier)
    * late flags, then per-order supplier/late-supplier counts, joined
    * back and filtered. Per-supplier counts roll up at the end with
    * the supplier dim broadcast. */
  def lateSoloSupplier(spark: SparkSession, dir: String, lateDays: Int = 60): DataFrame = {
    val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderdate"))
    val perSupp = Tables.lineitem(spark, dir)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("l_shipdate") >
        col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS"), 1).otherwise(0)).as("late"))
    val perOrder = perSupp.groupBy(col("l_orderkey").as("ok"))
      .agg(count(lit(1)).as("n_supp"), sum(col("late")).as("n_late"))
    perSupp
      .join(perOrder, col("l_orderkey") === col("ok"))
      .where(col("late") === 1 && col("n_supp") > 1 && col("n_late") === 1)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_waiting_orders"))
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_waiting_orders"))
      .orderBy(col("n_waiting_orders").desc, col("s_suppkey"))
  }

  /** TPC-H Q22 shape: well-funded customers gone idle — account
    * balance above the global positive average AND no orders since
    * the cutoff. The global average is one tiny aggregate broadcast
    * back; the membership test cross-multiplies (bal * n > sum) in
    * DECIMAL so no float average decides it. The "no recent orders"
    * arm is a left-anti join against the distinct recent custkeys. */
  def idleRichCustomers(spark: SparkSession, dir: String,
                        cutoff: String = "2000-01-01"): DataFrame = {
    val c = Tables.customer(spark, dir)
    val stats = c.where(col("c_acctbal") > 0)
      .agg(sum(dec(col("c_acctbal"))).as("sum_d"), count(lit(1)).as("n_pos"))
    val recent = Tables.orders(spark, dir)
      .where(col("o_orderdate") >= lit(cutoff).cast("timestamp"))
      .select(col("o_custkey")).distinct()
    c.crossJoin(broadcast(stats))
      .where(dec(col("c_acctbal")) * col("n_pos") > col("sum_d"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(dec(col("c_acctbal"))).cast("double").as("total_bal"))
      .orderBy(col("c_mktsegment"))
  }

  /** TPC-H Q2 shape: for each small part, the supplier(s) offering
    * the minimum unit price — argmin over a ratio. The unit price
    * reduces to exact integer cents (price is 2dp, quantity is
    * integral) via BIGINT floor division, so the argmin never
    * compares floats. Per-(part,supplier) min offers aggregate on one
    * partkey shuffle; the per-part min joins back on the same
    * partitioning (exchange reuse); part/supplier/nation broadcast
    * for the output attributes. Ties are kept, as in the original. */
  def minUnitCost(spark: SparkSession, dir: String, maxSize: Int = 5): DataFrame = {
    val p = Tables.part(spark, dir).where(col("p_size") <= maxSize)
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        expr("cast(round(l_extendedprice * 100) as bigint) div cast(l_quantity as bigint)")
          .as("unit_cents"))
    val offer = li.join(broadcast(p.select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("unit_cents")).as("offer_cents"))
    val best = offer.groupBy(col("l_partkey").as("pk"))
      .agg(min(col("offer_cents")).as("best_cents"))
    offer.join(best, col("l_partkey") === col("pk") &&
        col("offer_cents") === col("best_cents"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .select(col("p_partkey"), col("p_brand"), col("s_suppkey"), col("s_name"),
        col("n_name"), col("offer_cents"))
      .orderBy(col("p_partkey"), col("s_suppkey"))
  }

  /** TPC-H Q8 shape: one nation's market share inside a region, by
    * order year. Both the national and total revenue aggregate in one
    * pass (conditional DECIMAL sums); the share is ppm by BIGINT
    * floor division. Dims broadcast; the fact shuffles once on the
    * year key. */
  def marketShare(spark: SparkSession, dir: String,
                  region: String = "ASIA", nationName: String = "NATION_5"): DataFrame = {
    val n = Tables.nation(spark, dir)
    val custRegion = Tables.customer(spark, dir)
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .where(col("r_name") === region)
      .select(col("c_custkey"))
    val o = Tables.orders(spark, dir)
      .join(custRegion, col("o_custkey") === col("c_custkey"), "left_semi")
      .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("o_year"))
    Tables.lineitem(spark, dir)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n.select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("snk"))
      .groupBy(col("o_year"))
      .agg(
        sum(when(col("supp_nation") === nationName,
          rev(col("l_extendedprice"), col("l_discount")))
          .otherwise(lit(BigDecimal(0)).cast("decimal(18,2)"))).as("nation_d"),
        sum(rev(col("l_extendedprice"), col("l_discount"))).as("total_d"))
      .select(col("o_year"),
        col("nation_d").cast("double").as("nation_revenue"),
        col("total_d").cast("double").as("total_revenue"),
        expr("cast(nation_d * 100 as bigint) * 1000000L div cast(total_d * 100 as bigint)")
          .as("share_ppm"))
      .orderBy(col("o_year"))
  }

  /** TPC-H Q9 shape: profit by supplier nation and order year, with
    * the part's retail price as the cost proxy (no partsupp in this
    * schema). amount = revenue - retail*qty, every term DECIMAL. Two
    * broadcast dims + one fact shuffle on the (nation, year) key. */
  def productProfit(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("o_year"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.part(spark, dir)
        .select(col("p_partkey"), col("p_retailprice"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("o_year"))
      .agg(sum(rev(col("l_extendedprice"), col("l_discount")) -
        dec(col("p_retailprice")) * dec(col("l_quantity"))).cast("double").as("profit"))
      .orderBy(col("n_name"), col("o_year"))
  }

  /** TPC-H Q11 shape: parts whose total lineitem value exceeds
    * 1/1800 of the global total — HAVING against a global scalar.
    * Cross-multiplied DECIMAL comparison (value * 1800 > total), and
    * the output is bounded above by 1799 rows at ANY corpus size by
    * construction. */
  def importantParts(spark: SparkSession, dir: String, fraction: Int = 1800): DataFrame = {
    val pv = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(sum(dec(col("l_extendedprice"))).as("value_d"))
    val total = pv.agg(sum(col("value_d")).as("total_d"))
    pv.crossJoin(broadcast(total))
      .where(col("value_d") * lit(fraction) > col("total_d"))
      .select(col("l_partkey"), col("value_d").cast("double").as("value"))
      .orderBy(col("value").desc, col("l_partkey"))
  }

  /** TPC-H Q19 shape: disjunctive multi-attribute predicates — three
    * OR'd (brand, size-range, quantity-range) bundles. The join keeps
    * part broadcast; the per-bundle quantity arms stay on the fact
    * side so the parquet scan still prunes on the OR of quantity
    * ranges (min/max row-group skipping survives disjunction). */
  def disjunctiveBundles(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .where((col("l_quantity") >= 1 && col("l_quantity") <= 11) ||
        (col("l_quantity") >= 10 && col("l_quantity") <= 20) ||
        (col("l_quantity") >= 20 && col("l_quantity") <= 30))
    li.join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .where(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30)))
      .agg(count(lit(1)).as("n_lines"),
        sum(rev(col("l_extendedprice"), col("l_discount"))).cast("double").as("revenue"))
  }
}
