package graft

import graft.operators.Events
import org.apache.spark.sql.functions._

/** Scratch dev entrypoint (not part of the library surface). */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("local[8]", 8)
    spark.sparkContext.setLogLevel("ERROR")
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
    val native = Events.sessionizeNative(ev)
    println("native session_window sessions: " + native.count())
    native.show(5, false)
    val classic = Events.sessionize(ev)
    println("classic sessions: " + classic.count())
    // cross-check totals
    val nSum = native.agg(sum(col("n_events"))).head().getLong(0)
    val cSum = classic.agg(sum(col("n_events"))).head().getLong(0)
    println(s"events covered: native=$nSum classic=$cSum total=${ev.count()}")
    // stream-stream interval join operator, batch-mode drive
    val attrib = graft.streaming.StreamingEvents.purchaseAttribution(ev)
    println("purchase attributions (batch drive): " + attrib.count())
    attrib.select(col("purchase_id"), col("click_id"), col("purchase_ts"), col("click_ts")).show(3, false)
    // bucketed co-located join, outside the test harness
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.sql("DROP TABLE IF EXISTS b_o"); spark.sql("DROP TABLE IF EXISTS b_l")
    Tables.orders(spark, "/root/testdata/sf0.01").write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable("b_o")
    Tables.lineitem(spark, "/root/testdata/sf0.01").write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable("b_l")
    val j = spark.table("b_l").join(spark.table("b_o"), col("l_orderkey") === col("o_orderkey"))
    println("bucketed join rows: " + j.count())
    val plan = j.queryExecution.executedPlan.toString
    println("shuffle exchanges in join plan: " + "Exchange (hash|range)".r.findAllIn(plan).length +
      ", contains SortMergeJoin: " + plan.contains("SortMergeJoin"))
    spark.stop()
  }
}
