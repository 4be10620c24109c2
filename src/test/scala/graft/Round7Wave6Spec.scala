package graft

import graft.operators.{Events, Ranks}
import org.apache.spark.sql.functions._

/** Round-7 wave 6: scale-safe exact per-group median, Kaplan–Meier
  * survival, and daily-series autocorrelation. */
class Round7Wave6Spec extends SparkSpec {
  import spark.implicits._

  // ── exactMedianByGroup ─────────────────────────────────────────

  test("exactMedianByGroup matches Spark's exact percentile, odd and even groups, ties") {
    val df = Seq(
      ("a", 1.0), ("a", 3.0), ("a", 2.0),                  // odd: median 2
      ("b", 10.0), ("b", 20.0), ("b", 30.0), ("b", 40.0),  // even: 25
      ("c", 5.0), ("c", 5.0), ("c", 5.0), ("c", 9.0),      // ties: (5+5)/2 = 5
      ("d", 7.0)                                           // singleton: 7
    ).toDF("g", "v")
    val got = Ranks.exactMedianByGroup(df, "g", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("a" -> 2.0, "b" -> 25.0, "c" -> 5.0, "d" -> 7.0))
  }

  test("exactMedianByGroup agrees with percentile(0.5) on a large skewed input") {
    val df = spark.range(0, 20001)
      .select((col("id") % 3).cast("string").as("g"),
        (col("id") * col("id") % 997).cast("double").as("v"))
    val got = Ranks.exactMedianByGroup(df, "g", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exp = df.groupBy("g")
      .agg(expr("percentile(v, 0.5)").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == exp)
  }

  test("exactMedianByGroup is partition-invariant and plans no per-group global sort") {
    val df = spark.range(0, 5000)
      .select((col("id") % 4).cast("string").as("g"),
        (col("id") % 321).cast("double").as("v"))
    val a = Ranks.exactMedianByGroup(df.repartition(1), "g", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val b = Ranks.exactMedianByGroup(df.repartition(17, col("v")), "g", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(a == b)
    // every window in the plan is partitioned by (group, band) —
    // never by group alone (that would sort whole groups in one task)
    val plan = Ranks.exactMedianByGroup(df, "g", "v").queryExecution.executedPlan
    def windows(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.window.WindowExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => windows(a.executedPlan)
      case w: org.apache.spark.sql.execution.window.WindowExec => w +: w.children.flatMap(windows)
      case other => other.children.flatMap(windows)
    }
    windows(plan).foreach(w => assert(w.partitionSpec.size >= 2,
      s"median window must partition by (group, band), got ${w.partitionSpec}"))
  }

  // ── survivalKm ─────────────────────────────────────────────────

  test("survivalKm computes the textbook product-limit estimate with censoring") {
    // corpus end = day 30. Lifetimes: u1 dies day 0, u2 dies day 1,
    // u3 dies day 1, u4 censored day 2 (last event within 7d of end),
    // u5 dies day 3.
    def ev(u: Long, day: Int) = (u, java.sql.Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00"))
    val rows = Seq(
      ev(1, 0),            // first=last=day0 → lifetime 0, dies
      ev(2, 0), ev(2, 1),  // lifetime 1, dies
      ev(3, 5), ev(3, 6),  // lifetime 1, dies
      ev(4, 26), ev(4, 28),// lifetime 2, last day28 within 7d of end → censored
      ev(5, 10), ev(5, 13),// lifetime 3, dies
      ev(6, 30)            // pins corpus end to day 30; lifetime 0, censored
    )
    val df = rows.toDF("user_id", "ts")
    val got = Events.survivalKm(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // day 0: at_risk 6, deaths 1 (u1; u6 censored)  → S = 5/6 = .8333
    // day 1: at_risk 4, deaths 2 (u2,u3)            → S = 5/6 · 2/4 = .4167
    // day 2: at_risk 2, deaths 0 (u4 censored)      → S unchanged .4167
    // day 3: at_risk 1, deaths 1 (u5)               → S = 0
    assert(got.toSeq == Seq(
      (0L, 6L, 1L, 1L, 0.8333),
      (1L, 4L, 2L, 0L, 0.4167),
      (2L, 2L, 0L, 1L, 0.4167),
      (3L, 1L, 1L, 0L, 0.0)))
  }

  test("survivalKm survival is monotone non-increasing on real events") {
    val ev = Tables.events(spark, sf)
    val s = Events.survivalKm(ev).collect().map(_.getDouble(4))
    assert(s.nonEmpty)
    s.sliding(2).foreach { case Array(a, b) => assert(b <= a + 1e-12); case _ => }
  }

  // ── autocorrDaily ──────────────────────────────────────────────

  test("autocorrDaily finds a planted weekly cycle (acf peaks at lag 7)") {
    // 70 days of a strict period-7 series with a linear-free pattern
    val rows = (0 until 70).flatMap { d =>
      val day = java.sql.Timestamp.valueOf(f"2024-01-01 00:00:00").toLocalDateTime
        .plusDays(d)
      val v = Seq(10.0, 50.0, 20.0, 80.0, 30.0, 60.0, 40.0)(d % 7)
      Seq((java.sql.Timestamp.valueOf(day), v))
    }
    val df = rows.toDF("ts", "value")
    val acf = Events.autocorrDaily(df).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(math.abs(acf(7L) - 1.0) < 1e-9, s"period-7 series must have acf(7)=1, got ${acf(7L)}")
    assert((1 to 6).forall(k => acf(k.toLong) < 0.99))
  }

  // ── ordersBacklog / epochPlan ──────────────────────────────────

  test("ordersBacklog: backlog is cumulative(opened) − cumulative(closed) and ends at 0") {
    val got = graft.operators.Analytics.ordersBacklog(
      Tables.orders(spark, sf), Tables.lineitem(spark, sf)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    var cum = 0L
    got.foreach { case (_, o, c, b) => cum += o - c; assert(b == cum) }
    // every order with lineitems eventually ships its last line
    assert(got.last._4 == 0L)
    assert(got.map(_._4).max > 0L)
  }

  test("epochPlan: targets follow √-smoothed weights; epochs = target/available") {
    val got = graft.operators.TrainingMix.epochPlan(
      Tables.documents(spark, sf), budget = 500000L).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (tok, w, tgt, ep, fp) = (r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4), r.getLong(5))
      assert(tgt == math.floor(w * 500000L).toLong)
      assert(math.abs(ep - math.floor(tgt.toDouble / tok * 10000) / 10000.0) < 1.1e-4)
      assert(fp == math.floor(tgt.toDouble / tok).toLong)
    }
    // smoothing upsamples the smallest source relative to its share
    val withShare = got.map(r => (r.getLong(1), r.getDouble(2)))
    val totalTok = withShare.map(_._1).sum.toDouble
    val smallest = withShare.minBy(_._1)
    assert(smallest._2 > smallest._1 / totalTok,
      "√-smoothing must over-weight the smallest source")
  }

  test("autocorrDaily pair counts shrink by one per extra lag") {
    val ev = Tables.events(spark, sf)
    val got = Events.autocorrDaily(ev).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val days = ev.select(date_format(col("ts"), "yyyy-MM-dd")).distinct().count()
    (1 to 7).foreach(k => assert(got(k.toLong) == days - k))
  }
}
