package graft

import graft.operators.Events
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    val o = Tables.orders(spark, sf)
    val li = Tables.lineitem(spark, sf)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // a previously crashed run can leave the managed location behind
    val wh = new java.io.File(spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))
    Seq("b_orders", "b_lineitem").foreach { t =>
      val dir = new java.io.File(wh, t)
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    // disable broadcast so the join would otherwise shuffle both sides
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      assert(joined.agg(sum($"n")).as[Long].head() == li.count())
      val plan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.initialPlan
        case p => p
      }
      def shuffles(p: org.apache.spark.sql.execution.SparkPlan): Int =
        (if (p.isInstanceOf[ShuffleExchangeLike]) 1 else 0) + p.children.map(shuffles).sum
      // bucketed-by-key join: only the tiny post-agg exchange remains
      assert(shuffles(plan) <= 1, s"unexpected shuffles:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("native session_window agrees with the window-function sessionizer") {
    val ev = Tables.events(spark, sf)
    val native = Events.sessionizeNative(ev)
    val classic = Events.sessionize(ev)
    // same session count and same total events per user
    assert(native.count() == classic.count())
    val a = native.groupBy($"user_id").agg(sum($"n_events").as("n"))
      .orderBy($"user_id").as[(Long, Long)].collect().toSeq
    val b = classic.groupBy($"user_id").agg(sum($"n_events").as("n"))
      .orderBy($"user_id").as[(Long, Long)].collect().toSeq
    assert(a == b)
    // per-session values align too
    val av = native.select($"user_id", $"n_events", $"session_value")
      .orderBy($"user_id", $"session_start").as[(Long, Long, Double)].collect().toSeq
    val bv = classic.select($"user_id", $"n_events", $"session_value")
      .orderBy($"user_id", $"session_seq").as[(Long, Long, Double)].collect().toSeq
    assert(av == bv)
  }
}
