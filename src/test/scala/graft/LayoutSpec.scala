package graft

import graft.operators.{Layout, RuntimeFilter}
import org.apache.spark.sql.functions._

/** Z-order layout + Bloom runtime filter: the semantic guarantees the
  * oracle hash can't express — interleave bijectivity, pruning
  * soundness (scanned files cover every match), Z-order dominance on
  * two-dimensional boxes, and Bloom no-false-negatives with a bounded
  * false-positive rate. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("morton interleave is a bijection on the 8-bit grid") {
    val grid = spark.range(256).select((col("id") / 16).cast("long").as("a"),
      pmod(col("id"), lit(16)).as("b"))
    val z = grid.select(Layout.zorderValue(col("a"), col("b"), 8).as("z"))
    assert(z.distinct().count() == 256)
    // locality sanity: (0,0) -> 0, (1,1) -> 3 (bits interleave, a high)
    val hand = grid.where(col("a") === 1 && col("b") === 1)
      .select(Layout.zorderValue(col("a"), col("b"), 8)).as[Long].head()
    assert(hand == 3L)
  }

  test("skipping is sound and zorder dominates linear on a 2-d box") {
    val out = Layout.skippingStats(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val (lin, zo) = (out("linear"), out("zorder"))
    // soundness: the scanned rows can never be fewer than the matches
    Seq(lin, zo).foreach { r =>
      assert(r.getLong(4) >= r.getLong(5), s"scanned < matched in $r")
      assert(r.getLong(1) >= r.getLong(2)) // files_scanned <= n_files
    }
    assert(lin.getLong(5) == zo.getLong(5)) // layout never changes the answer
    // the point of the layout: fewer rows read for the same matches
    assert(zo.getLong(4) <= lin.getLong(4))
  }

  test("bloom filter has no false negatives and a bounded FP rate") {
    val dim = Tables.supplier(spark, sf).where($"s_acctbal" > 6000)
    val keys = dim.select($"s_suppkey").as[Long].collect()
    assert(keys.nonEmpty)
    val bits = RuntimeFilter.buildBits(dim.select($"s_suppkey"), mBits = 4096, k = 5)
    // probe/test modulus mismatch is impossible by construction
    assertThrows[IllegalArgumentException] {
      RuntimeFilter.buildBits(dim.select($"s_suppkey"), mBits = 1000, k = 5)
    }
    val li = Tables.lineitem(spark, sf)
    val exactN = li.where($"l_suppkey".isin(keys.map(Long.box): _*)).count()
    val passN = li.where(RuntimeFilter.mightContain($"l_suppkey", bits, 5)).count()
    // no false negatives: every true match passes the bloom test
    val missed = li.where($"l_suppkey".isin(keys.map(Long.box): _*) &&
      !RuntimeFilter.mightContain($"l_suppkey", bits, 5)).count()
    assert(missed == 0)
    // FP bound: with m/n >> 10 bits per key the rate is well under 5%
    val nonMatching = li.count() - exactN
    assert(passN - exactN <= math.max(1L, nonMatching / 20))
  }

  test("bloom-prefiltered revenue equals the plain semi-join revenue") {
    val viaBloom = RuntimeFilter.highBalanceRevenue(spark, sf)
      .as[(Long, Double)].head()
    val dim = Tables.supplier(spark, sf).where($"s_acctbal" > 6000)
    val plain = Tables.lineitem(spark, sf)
      .join(dim.select($"s_suppkey"), $"l_suppkey" === $"s_suppkey", "left_semi")
      .agg(count(lit(1)),
        sum($"l_extendedprice".cast("decimal(18,2)") *
          (lit(BigDecimal(1)).cast("decimal(18,2)") -
            $"l_discount".cast("decimal(18,2)"))).cast("double"))
      .as[(Long, Double)].head()
    assert(viaBloom == plain)
  }
}
