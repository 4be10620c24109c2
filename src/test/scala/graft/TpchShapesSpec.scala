package graft

import graft.operators.TpchShapes
import org.apache.spark.sql.functions._

/** Semantic assertions for the hard TPC-H shapes that the oracle hash
  * compare can't express: tie handling, global-scalar membership,
  * bounded outputs, integer-exact shares. */
class TpchShapesSpec extends SparkSpec {
  import spark.implicits._

  test("promo share ppm is the exact integer ratio of the revenue columns") {
    val Array((promo, total, ppm)) =
      TpchShapes.promoShare(spark, sf).as[(Double, Double, Long)].collect()
    assert(promo > 0 && promo < total)
    val cents = (v: Double) => math.rint(v * 100).toLong
    assert(ppm == cents(promo) * 1000000L / cents(total))
  }

  test("top supplier keeps every revenue tie and nothing below the max") {
    val out = TpchShapes.topSupplier(spark, sf).as[(Long, String, Double)].collect()
    assert(out.nonEmpty)
    assert(out.map(_._3).distinct.length == 1) // all rows share the max
  }

  test("large orders all exceed the quantity threshold") {
    val bad = TpchShapes.largeOrders(spark, sf, minQty = 250)
      .where($"sum_qty" <= 250)
    assert(bad.isEmpty)
  }

  test("late-solo suppliers were late on a multi-supplier order where no one else was") {
    val out = TpchShapes.lateSoloSupplier(spark, sf)
    assert(out.count() > 0)
    // total waiting orders cannot exceed the number of multi-supplier
    // orders (each qualifying order contributes exactly one supplier)
    val totalWaiting = out.agg(sum($"n_waiting_orders")).as[Long].head()
    val multiSupp = Tables.lineitem(spark, sf)
      .groupBy($"l_orderkey").agg(countDistinct($"l_suppkey").as("ns"))
      .where($"ns" > 1).count()
    assert(totalWaiting <= multiSupp)
  }

  test("idle rich customers: every survivor is above the positive-average balance") {
    val c = Tables.customer(spark, sf)
    val posAvg = c.where($"c_acctbal" > 0)
      .agg((sum($"c_acctbal".cast("decimal(18,2)")).cast("double") / count(lit(1))))
      .as[Double].head()
    // the grouped output can't be checked row-wise, so recheck the
    // membership predicate: minimum qualifying balance > positive avg
    val out = TpchShapes.idleRichCustomers(spark, sf)
    assert(out.count() > 0)
    val totalBal = out.agg(sum($"total_bal")).as[Double].head()
    val nCust = out.agg(sum($"n_customers")).as[Long].head()
    assert(totalBal / nCust > posAvg)
  }

  test("min unit cost: per part, no cheaper offer exists than the reported one") {
    val out = TpchShapes.minUnitCost(spark, sf)
    val perPart = out.groupBy($"p_partkey")
      .agg(countDistinct($"offer_cents").as("n_prices"))
    assert(out.count() > 0)
    // every reported row for a part carries the same (minimal) price
    assert(perPart.where($"n_prices" > 1).isEmpty)
  }

  test("market share ppm stays within [0, 1e6] and years cover the order range") {
    val rows = TpchShapes.marketShare(spark, sf)
      .as[(Long, Double, Double, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, natRev, totRev, ppm) =>
      assert(ppm >= 0 && ppm <= 1000000L)
      assert(natRev <= totRev)
    }
  }

  test("important parts output is bounded by the cross-multiplied fraction") {
    val out = TpchShapes.importantParts(spark, sf, fraction = 1800)
    val n = out.count()
    assert(n > 0 && n < 1800) // at most 1799 parts can each hold > total/1800
  }

  test("disjunctive bundles count a strict subset of the quantity-filtered fact") {
    val Array((n, rev)) = TpchShapes.disjunctiveBundles(spark, sf)
      .as[(Long, Double)].collect()
    assert(n > 0 && rev > 0)
    val cap = Tables.lineitem(spark, sf).where($"l_quantity" <= 30).count()
    assert(n < cap)
  }

  test("returned revenue rows are returned-flag only and capped at k") {
    val out = TpchShapes.returnedRevenue(spark, sf, k = 20)
    assert(out.count() <= 20)
    assert(out.where($"revenue" <= 0).isEmpty)
  }
}
