package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Unit coverage for the round-4 operators — semantic assertions the
  * oracle hash compare can't express (frame boundaries, zero-order
  * inclusion, quantization range, threshold membership). */
class Round4Spec extends SparkSpec {
  import spark.implicits._

  test("moving average frame never exceeds its width and matches a hand check") {
    val out = Analytics.movingAvg(spark, sf, frame = 5)
    assert(out.where($"n_in_frame" > 5 || $"n_in_frame" < 1).isEmpty)
    // the first event per user averages only itself
    val firsts = out.where($"n_in_frame" === 1)
      .where(abs($"mov_avg" - $"value") > 1e-9)
    assert(firsts.isEmpty)
  }

  test("customer order distribution includes zero-order customers and conserves mass") {
    val dist = Analytics.custOrderDistribution(spark, sf)
      .as[(Long, Long)].collect().toMap
    val nCust = Tables.customer(spark, sf).count()
    assert(dist.values.sum == nCust)
    // the test corpus has no inactive customers; pin the left-join
    // inclusion (the whole point of Q13) synthetically
    val c = Seq(1L, 2L, 3L).toDF("c_custkey")
    val o = Seq((1L, 10L), (1L, 11L), (2L, 12L)).toDF("o_custkey", "o_orderkey")
    val syn = Analytics.custOrderDist(c, o).as[(Long, Long)].collect().toMap
    assert(syn == Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("order-priority late counts are bounded by the window's order counts") {
    val late = Analytics.orderPriorityLate(spark, sf).as[(String, Long)].collect().toMap
    val all = Tables.orders(spark, sf)
      .where($"o_orderdate" >= lit("1997-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-07-01").cast("timestamp"))
      .groupBy($"o_orderpriority").count().as[(String, Long)].collect().toMap
    assert(late.nonEmpty)
    late.foreach { case (p, n) => assert(n <= all(p), s"$p: $n > ${all(p)}") }
  }

  test("small-qty revenue selects a strict subset of lineitems") {
    val Array((nSmall, rev)) =
      Analytics.smallQtyRevenue(spark, sf).as[(Long, Double)].collect()
    val nAll = Tables.lineitem(spark, sf).count()
    assert(nSmall > 0 && nSmall < nAll)
    assert(rev > 0)
  }

  test("int8 quantization codes stay in [0,255] and reconstruction error is small") {
    val coded = Similarity.quantizeInt8(Tables.embeddings(spark, sf))
    // sum over 64 dims of codes in [0,255]
    assert(coded.where($"sum_code" < 0 || $"sum_code" > 255L * 64).isEmpty)
    // embeddings are ~[-1,1]: per-dim step ≈ 2/255, so per-vector
    // squared error ⪅ 64 · (step/2)² ≈ 1e-3 — generous bound 0.01
    assert(coded.where($"sq_err" > 0.01).isEmpty)
  }

  test("norm stats count zero-norm vectors exactly") {
    val emb = Seq(
      (0L, Array.fill(64)(0.0f), 1L),
      (1L, Array.fill(64)(0.5f), 1L),
      (2L, Array.fill(64)(1.0f), 2L)).toDF("vec_id", "embedding", "label")
    val out = Similarity.normStats(emb)
      .select($"label", $"n_vecs", $"n_zero").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 2L, 1L), (2L, 1L, 0L)))
  }

  test("approx-distinct bounds contract holds on the test corpus") {
    val bad = Analytics.approxDistinct(spark, sf).where($"approx_ok" =!= 1L)
    assert(bad.isEmpty)
  }
}
