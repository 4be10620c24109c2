package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Scratch dev entrypoint (not part of the library surface). */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("local[8]", 8)
    spark.sparkContext.setLogLevel("ERROR")
    // skewed aggregation over real data: l_orderkey is uniform, so
    // manufacture a hot key the way real logs have one hot user
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select(when(col("l_linenumber") === 1, lit(42L)).otherwise(col("l_orderkey")).as("k"))
    val plain = li.groupBy(col("k")).count().where(col("k") === 42).head().getLong(1)
    val salted = Skew.saltedCount(li, "k").where(col("k") === 42).head().getLong(1)
    println(s"hot key 42: plain=$plain salted=$salted equal=${plain == salted}")
    val dim = Tables.orders(spark, "/root/testdata/sf0.01")
      .select(col("o_orderkey").as("k"), col("o_orderpriority"))
    val joined = Skew.hotColdJoin(
      Tables.lineitem(spark, "/root/testdata/sf0.01").withColumnRenamed("l_orderkey", "k"),
      dim, "k", Seq(1L, 2L, 3L))
    println("hotColdJoin rows: " + joined.count())
    spark.stop()
  }
}
