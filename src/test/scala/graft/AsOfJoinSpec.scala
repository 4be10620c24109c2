package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

/** Interleaved-time cases the driver data can't exercise (there all
  * probe times postdate all build times). */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asof picks the latest build row at or before each probe") {
    val probe = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00")),  // between v1 and v2 → v1
      (2L, 7L, ts("2024-01-01 12:00:00")),  // exactly at v2 → v2 (inclusive)
      (3L, 7L, ts("2024-01-01 23:00:00")),  // after v3 → v3
      (4L, 7L, ts("2023-12-31 00:00:00")),  // before any build → null
      (5L, 8L, ts("2024-01-01 12:00:00")))  // other key, one build row → v8
      .toDF("probe_id", "k", "t")
    val build = Seq(
      (7L, ts("2024-01-01 09:00:00"), "v1"),
      (7L, ts("2024-01-01 12:00:00"), "v2"),
      (7L, ts("2024-01-01 18:00:00"), "v3"),
      (8L, ts("2024-01-01 00:00:00"), "v8"))
      .toDF("k", "bt", "state")

    val got = AsOfJoin.asof(probe, build, "k", "t", "bt", Seq("state"))
      .orderBy($"probe_id")
      .select($"probe_id", $"state").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "v1"), (2L, "v2"), (3L, "v3"), (4L, null), (5L, "v8")))
  }

  test("asof carries multiple build columns consistently") {
    val probe = Seq((1L, 7L, ts("2024-01-01 10:00:00"))).toDF("probe_id", "k", "t")
    val build = Seq(
      (7L, ts("2024-01-01 08:00:00"), "a", 100L),
      (7L, ts("2024-01-01 09:00:00"), "b", 200L))
      .toDF("k", "bt", "state", "version")
    val got = AsOfJoin.asof(probe, build, "k", "t", "bt", Seq("state", "version"))
      .select($"state", $"version").as[(String, Long)].head()
    // both columns must come from the SAME build row (the 09:00 one)
    assert(got == ("b", 200L))
  }

  test("native exec and composed baseline agree on the driver asof query inputs") {
    val ev = Tables.events(spark, sf).select(col("event_id"), col("user_id"), col("ts"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"), col("o_orderdate")).orderBy(col("o_orderkey").desc)
    val build = Tables.orders(spark, sf)
      .withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
      .select(col("o_custkey").as("user_id"), col("o_orderdate"),
        col("o_orderkey"), col("o_totalprice"))
    val native = AsOfJoin.asof(ev, build, "user_id", "ts", "o_orderdate",
      Seq("o_orderkey", "o_totalprice"))
    val composed = AsOfJoin.asofComposed(ev, build, "user_id", "ts", "o_orderdate",
      Seq("o_orderkey", "o_totalprice"))
    assert(native.schema == composed.schema)
    assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty)
  }

  test("native exec agrees with composed on interleaved adversarial times") {
    // many keys, interleaved probe/build times, build ties on (key,time)
    // broken upstream, keys with no build rows and builds with no probes
    val probe = (0 until 400).map { i =>
      (i.toLong, (i % 13).toLong, ts(f"2024-01-01 ${i % 24}%02d:${(i * 7) % 60}%02d:00"))
    }.toDF("probe_id", "k", "t")
    val build = (0 until 200).map { i =>
      ((i % 11).toLong, ts(f"2024-01-01 ${(i * 3) % 24}%02d:${(i * 11) % 60}%02d:00"), s"s$i")
    }.toDF("k", "bt", "state")
      .groupBy("k", "bt").agg(max("state").as("state")) // dedup (key,time)
    val native = AsOfJoin.asof(probe, build, "k", "t", "bt", Seq("state"))
    val composed = AsOfJoin.asofComposed(probe, build, "k", "t", "bt", Seq("state"))
    assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty)
    assert(native.count() == 400) // every probe row emits exactly once
  }

  test("null keys never match: exec and composed agree, null-key probes emit unmatched") {
    // null-key build rows must NOT carry onto null-key probe rows
    // (SQL equality-join semantics; the window baseline would other-
    // wise group all nulls into one partition and match them)
    val probe = Seq(
      (1L, Option(7L), ts("2024-01-01 10:00:00")),
      (2L, Option.empty[Long], ts("2024-01-01 11:00:00")),
      (3L, Option.empty[Long], ts("2024-01-01 12:00:00"))
    ).toDF("probe_id", "k", "t")
    val build = Seq(
      (Option(7L), ts("2024-01-01 08:00:00"), "real"),
      (Option.empty[Long], ts("2024-01-01 09:00:00"), "phantom")
    ).toDF("k", "bt", "state")
    val native = AsOfJoin.asof(probe, build, "k", "t", "bt", Seq("state"))
    val composed = AsOfJoin.asofComposed(probe, build, "k", "t", "bt", Seq("state"))
    val expect = Set((1L, "real"), (2L, null: String), (3L, null: String))
    assert(native.select($"probe_id", $"state").as[(Long, String)].collect().toSet == expect)
    assert(composed.select($"probe_id", $"state").as[(Long, String)].collect().toSet == expect)
    assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty)
  }

  test("the plan is ONE merge exec over two sorted shuffles — no union, no window") {
    val probe = Seq((1L, 7L, ts("2024-01-01 10:00:00"))).toDF("probe_id", "k", "t")
    val build = Seq((7L, ts("2024-01-01 08:00:00"), "a")).toDF("k", "bt", "state")
    val df = AsOfJoin.asof(probe, build, "k", "t", "bt", Seq("state"))
    df.collect() // materialize the AQE final plan
    val fin = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    def all(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => p +: all(q.plan)
      case _ => p +: p.children.flatMap(all)
    }
    val nodes = all(fin)
    assert(nodes.exists(_.isInstanceOf[graft.plans.SortMergeAsOfExec]))
    assert(!nodes.exists(_.isInstanceOf[org.apache.spark.sql.execution.UnionExec]))
    assert(!nodes.exists(_.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]))
    // distribution cost identical to a sort-merge join: one exchange per side
    assert(nodes.count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike]) == 2)
  }
}
