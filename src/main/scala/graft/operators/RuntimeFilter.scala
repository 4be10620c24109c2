package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * The bit array is built ON THE EXECUTORS: probe positions fold into
  * mBits/64 words via a map-side-combining `bit_or` aggregation, and
  * only those words — fixed-size sketch state, O(mBits/64) longs no
  * matter how many keys qualify — reach the driver to become the
  * fact-side predicate's literal. (Round 4 collected the raw key set
  * instead: O(keys·k) driver transfer, a driver OOM at 100 TB when a
  * filtered dim qualifies tens of millions of keys.) The probe and
  * test sides share one modulus by construction: buildBits requires
  * mBits % 64 == 0, so `bits.length * 64 == mBits` exactly — a
  * non-multiple would make the two moduli disagree and turn bloom
  * false negatives into dropped matching rows.
  */
object RuntimeFilter {

  /** Build the bit array from the qualifying-key DataFrame (single
    * key column): `k` hash probes per key into `mBits` bits, hashes
    * from xxhash64(key, seed) — the same builtin the fact-side
    * predicate evaluates — aggregated into words executor-side. */
  def buildBits(keys: DataFrame, mBits: Int, k: Int): Array[Long] = {
    require(mBits % 64 == 0,
      s"mBits ($mBits) must be a multiple of 64: mightContain recomputes the " +
        "modulus as bits.length*64, and any remainder would make the probe and " +
        "test moduli disagree (bloom false negatives = lost matching rows)")
    val keyCol = col(keys.columns.head)
    val words = keys
      .select(explode(array((0 until k).map(lit): _*)).as("seed"), keyCol.as("key"))
      .select(pmod(xxhash64(col("key"), col("seed")), lit(mBits)).as("bit"))
      .select((col("bit") / 64).cast("int").as("w"),
        call_function("shiftleft", lit(1L), pmod(col("bit"), lit(64)).cast("int")).as("m"))
      .groupBy(col("w")).agg(bit_or(col("m")).as("word"))
      .collect()
    val bits = new Array[Long](mBits / 64)
    words.foreach(r => bits(r.getInt(0)) = r.getLong(1))
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
  def highBalanceRevenue(spark: org.apache.spark.sql.SparkSession, dir: String,
                         minBal: Double = 6000.0,
                         mBits: Int = 4096, k: Int = 5): DataFrame = {
    val dim = Tables.supplier(spark, dir).where(col("s_acctbal") > minBal)
    val bits = buildBits(dim.select(col("s_suppkey")), mBits, k)
    val li = Tables.lineitem(spark, dir)
      .where(mightContain(col("l_suppkey"), bits, k))
    li.join(broadcast(dim.select(col("s_suppkey"))),
        col("l_suppkey") === col("s_suppkey"), "left_semi")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(BigDecimal(1)).cast("decimal(18,2)") -
            col("l_discount").cast("decimal(18,2)"))).cast("double").as("revenue"))
  }
}
