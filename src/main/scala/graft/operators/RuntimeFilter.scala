package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Bloom-filter runtime pre-filtering: the "small dim filters big
  * fact before the shuffle" trick, hand-rolled from builtin codegen'd
  * expressions so the membership test runs inside the fact table's
  * scan stage.
  *
  * Shape: a selective predicate on a dimension qualifies few keys;
  * the fact side is orders of magnitude larger. A plain semi join
  * ships the whole fact through a join (broadcast at best). Building
  * a Bloom filter over the qualifying keys and testing it map-side
  * drops ~all non-matching fact rows at the scan, so whatever
  * follows (join, agg, shuffle) sees only candidates. False
  * positives are culled by the exact join that follows — the answer
  * is exact; the filter only cuts I/O and shuffle bytes.
  *
  * The filter is built driver-side from the collected qualifying
  * keys — the dim side of a runtime filter is small BY CONSTRUCTION
  * (that's why it's worth broadcasting); the bit array rides into
  * the fact-side predicate as an array literal. At 100 TB the same
  * plan holds: O(qualifying keys) driver memory, O(m/64) longs
  * broadcast, zero extra shuffles.
  */
object RuntimeFilter {

  /** Build the bit array: `k` hash probes per key into `mBits` bits,
    * hashes from xxhash64(key, seed) — the same builtin the
    * fact-side predicate evaluates. */
  def buildBits(keys: Array[Long], mBits: Int, k: Int, spark: SparkSession): Array[Long] = {
    import spark.implicits._
    val probes = keys.toSeq.toDF("key")
      .select(explode(array((0 until k).map(lit): _*)).as("seed"), col("key"))
      .select(pmod(xxhash64(col("key"), col("seed")), lit(mBits)).as("bit"))
      .distinct().as[Long].collect()
    val bits = new Array[Long](mBits / 64)
    probes.foreach(b => bits(b.toInt / 64) |= (1L << (b.toInt % 64)))
    bits
  }

  /** The membership predicate: AND over `k` bit tests, each a shift/
    * mask on the broadcast literal array. Codegen-friendly — no UDF,
    * no driver round trip at execution time. */
  def mightContain(keyCol: Column, bits: Array[Long], k: Int): Column = {
    val mBits = bits.length * 64
    val bitsCol = typedlit(bits.toSeq)
    (0 until k).map { seed =>
      val h = pmod(xxhash64(keyCol, lit(seed)), lit(mBits))
      call_function("shiftright",
        element_at(bitsCol, (h / 64).cast("int") + 1),
        pmod(h, lit(64)).cast("int")).bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** Revenue from lineitems supplied by high-balance suppliers: the
    * Bloom pre-filter nominates fact rows map-side, the broadcast
    * semi join keeps the answer exact. */
  def highBalanceRevenue(spark: SparkSession, dir: String,
                         minBal: Double = 6000.0,
                         mBits: Int = 4096, k: Int = 5): DataFrame = {
    val dim = Tables.supplier(spark, dir).where(col("s_acctbal") > minBal)
    val keys = dim.select(col("s_suppkey")).as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect()
    val li = Tables.lineitem(spark, dir)
      .where(mightContain(col("l_suppkey"), buildBits(keys, mBits, k, spark), k))
    li.join(broadcast(dim.select(col("s_suppkey"))),
        col("l_suppkey") === col("s_suppkey"), "left_semi")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(BigDecimal(1)).cast("decimal(18,2)") -
            col("l_discount").cast("decimal(18,2)"))).cast("double").as("revenue"))
  }
}
