package graft

import graft.operators.{Events, Quality}
import org.apache.spark.sql.functions._

/** Round-8 wave 3: the statistical-testing trio — exact two-sample
  * KS (banded-prefix CDFs), Cramér's V contingency association, and
  * the two-proportion A/B z-test. */
class StatTestsSpec extends SparkSpec {
  import spark.implicits._

  // ── ksExact ────────────────────────────────────────────────────

  /** Docs whose text length IS the distribution under test. */
  private def lenDocs(a: Seq[Int], b: Seq[Int]) =
    (a.map(n => ("src0", "x" * n)) ++ b.map(n => ("src1", "x" * n)))
      .zipWithIndex.map { case ((s, t), i) => (i.toLong, t, s) }
      .toDF("doc_id", "text", "source")

  test("ks: disjoint distributions attain D = 1 at the lower sample's max") {
    val d = Quality.ksExact(lenDocs(Seq(10, 20, 30), Seq(100, 110, 120))).collect()(0)
    assert(d.getDouble(0) == 1.0, s"disjoint samples must give D=1, got $d")
    assert(d.getLong(1) == 30L, s"gap attained at srcA's max length, got $d")
    assert(d.getLong(2) == 3L && d.getLong(3) == 3L)
  }

  test("ks: identical distributions give D = 0") {
    val lens = Seq(10, 20, 20, 30, 45)
    val d = Quality.ksExact(lenDocs(lens, lens)).collect()(0)
    assert(d.getDouble(0) == 0.0, s"identical samples must give D=0, got $d")
  }

  test("ks is partition-invariant and matches a driver-side reference") {
    val a = Seq(5, 8, 8, 13, 21, 34, 34, 55)
    val b = Seq(3, 8, 13, 13, 21, 40, 60)
    def refD: (Double, Long) = {
      val vals = (a ++ b).distinct.sorted
      val gaps = vals.map { v =>
        val fa = a.count(_ <= v).toDouble / a.size
        val fb = b.count(_ <= v).toDouble / b.size
        (math.abs(fa - fb), v.toLong)
      }
      val m = gaps.map(_._1).max
      (m, gaps.filter(_._1 == m).map(_._2).min)
    }
    val docs = lenDocs(a, b)
    val r1 = Quality.ksExact(docs.repartition(1)).collect()(0)
    val rn = Quality.ksExact(docs.repartition(7, col("doc_id"))).collect()(0)
    assert(r1.toSeq == rn.toSeq, "KS must be bit-identical on any partitioning")
    val (dExp, atExp) = refD
    // the emitted d_stat is 6dp-rounded
    assert(math.abs(r1.getDouble(0) - dExp) < 1e-6, s"D: got $r1, want $dExp")
    assert(r1.getLong(1) == atExp, s"at_len: got $r1, want $atExp")
  }

  test("ks plans no empty-partition window: the CDF prefix is banded") {
    val df = Quality.ksExact(lenDocs(Seq(1, 2, 3), Seq(2, 3, 4)))
    val plan = df.queryExecution.executedPlan
    def bad(p: org.apache.spark.sql.execution.SparkPlan): Int = (p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => bad(a.executedPlan)
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => 1 + w.children.map(bad).sum
      case other => other.children.map(bad).sum
    })
    assert(bad(plan) == 0, "the global CDF must come from the banded prefix")
  }

  // ── cramersV ───────────────────────────────────────────────────

  private def catDocs(rows: Seq[(String, String)]) =
    rows.zipWithIndex.map { case ((s, l), i) => (i.toLong, "t", l, s) }
      .toDF("doc_id", "text", "lang", "source")

  test("cramers v: a deterministic mapping scores V = 1") {
    // each source maps to exactly one lang, balanced 2x2
    val rows = Seq.fill(10)(("srcA", "en")) ++ Seq.fill(10)(("srcB", "de"))
    val r = Quality.cramersV(catDocs(rows)).collect()(0)
    assert(r.getDouble(3) == 1.0, s"perfect association must give V=1, got $r")
    assert(r.getLong(1) == 1L && r.getLong(2) == 20L)
  }

  test("cramers v: independent margins score V = 0") {
    // every (source, lang) cell equally filled: observed == expected
    val rows = for {
      s <- Seq("srcA", "srcB", "srcC"); l <- Seq("en", "de"); _ <- 1 to 4
    } yield (s, l)
    val r = Quality.cramersV(catDocs(rows)).collect()(0)
    assert(r.getDouble(0) == 0.0 && r.getDouble(3) == 0.0,
      s"independence must give chi2=0, V=0, got $r")
    assert(r.getLong(1) == 2L, s"dof (3-1)(2-1)=2, got $r")
  }

  test("cramers v counts absent cells' expected mass and is partition-invariant") {
    // srcB never pairs with 'de': the zero cell still contributes e
    val rows = Seq.fill(6)(("srcA", "en")) ++ Seq.fill(6)(("srcA", "de")) ++
      Seq.fill(12)(("srcB", "en"))
    val docs = catDocs(rows)
    val r1 = Quality.cramersV(docs.repartition(1)).collect()(0)
    val rn = Quality.cramersV(docs.repartition(5, col("doc_id"))).collect()(0)
    assert(r1.toSeq == rn.toSeq, "V must be bit-identical on any partitioning")
    // chi2 by hand: margins rs=(12,12), cs=(18,6), n=24 →
    // e = 9,3,9,3; o = 6,6,12,0 → 1 + 3 + 1 + 3 = 8
    assert(r1.getDouble(0) == 8.0, s"chi2 must include the zero cell, got $r1")
    assert(math.abs(r1.getDouble(3) - math.sqrt(8.0 / 24.0)) < 1e-6, s"V mismatch: $r1")
  }

  // ── abTest ─────────────────────────────────────────────────────

  /** Control (even users) purchases cluster at 10±2; treatment (odd
    * users) at 20±2 — a clean positive lift with nonzero variance in
    * both arms. Views carry value 999 and must be ignored. */
  private def abEvents = {
    val rows = (0 until 40).map { i =>
      val u = i % 10                        // users 0..9, both parities
      val shift = Seq(-2.0, 0.0, 0.0, 2.0)((i / 10) % 4)
      val base = if (u % 2 == 0) 10.0 else 20.0
      (u.toLong, "purchase", base + shift)
    } ++ (0 until 10).map(u => (u.toLong, "view", 999.0))
    rows.zipWithIndex.map { case ((u, t, v), i) =>
      (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), u, t, v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  test("ab test: moments, t, and dof match the closed-form construction") {
    val r = Events.abTest(abEvents).collect()(0)
    assert(r.getLong(0) == 20L && r.getLong(2) == 20L, s"20 purchases each, got $r")
    assert(r.getDouble(1) == 10.0 && r.getDouble(3) == 20.0, s"means 10/20, got $r")
    // each arm: values base±2,base,base,base±2 ×5 → s² = 40/19 per arm,
    // se² sum = 2·(40/19)/20 = 4/19 → t = 10/sqrt(4/19) = 21.794495
    assert(math.abs(r.getDouble(4) - 21.794495) < 1e-6, s"t mismatch: $r")
    // equal arms → dof = 2(n-1) = 38
    assert(r.getDouble(5) == 38.0, s"Welch dof must collapse to 38, got $r")
  }

  test("ab test ignores non-purchase events and is partition-invariant") {
    val ev = abEvents
    val r1 = Events.abTest(ev.repartition(1)).collect()(0)
    val rn = Events.abTest(ev.repartition(9, col("event_id"))).collect()(0)
    assert(r1.toSeq == rn.toSeq, "bit-identical on any partitioning")
    // the value-999 view rows would wreck both means if counted
    assert(r1.getDouble(1) == 10.0 && r1.getDouble(3) == 20.0,
      s"views must not enter the revenue comparison, got $r1")
  }

  test("ab test plans a single corpus shuffle and no window") {
    val df = Events.abTest(abEvents)
    val plan = df.queryExecution.executedPlan
    def count(p: org.apache.spark.sql.execution.SparkPlan,
              f: PartialFunction[org.apache.spark.sql.execution.SparkPlan, Boolean]): Int = {
      val self = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          return count(a.executedPlan, f)
        case other => if (f.isDefinedAt(other) && f(other)) 1 else 0
      }
      self + p.children.map(count(_, f)).sum
    }
    val windows = count(plan,
      { case _: org.apache.spark.sql.execution.window.WindowExec => true })
    assert(windows == 0, "the pivot is conditional aggregation, not a window")
    val exchanges = count(plan,
      { case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => true })
    // corpus shuffle on user_id + the 2-row variant rollup + the
    // single-row final agg: only the first touches corpus-scale data
    assert(exchanges <= 3,
      s"one corpus shuffle plus model-sized rollups, got $exchanges")
  }

  // ── mannWhitney ────────────────────────────────────────────────

  /** A = {1, 2, 2, 5}, B = {2, 3, 4}: combined average ranks
    * 1, 3, 3, 3, 5, 6, 7 → R1 = 1+3+3+7 = 14, U1 = 14−10 = 4;
    * tie group of three 2s → Σ(t³−t) = 24. */
  private def mwEvents = {
    val a = Seq(1.0, 2.0, 2.0, 5.0).map(("purchase", _))
    val b = Seq(2.0, 3.0, 4.0).map(("click", _))
    val noise = Seq(("view", 999.0))
    (a ++ b ++ noise).zipWithIndex.map { case ((t, v), i) =>
      (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), i.toLong, t, v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  test("mann-whitney: U, tie-corrected sigma, and z match the hand computation") {
    val r = Events.mannWhitney(mwEvents).collect()(0)
    assert(r.getLong(0) == 4L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 4.0, s"U1 must be 4, got $r")
    // sigma² = (12/12)·((8) − 24/(7·6)) = 8 − 4/7 = 52/7
    val sig = math.sqrt(52.0 / 7.0)
    assert(math.abs(r.getDouble(3) - sig) < 1e-6, s"sigma mismatch: $r")
    assert(math.abs(r.getDouble(4) - (4.0 - 6.0) / sig) < 1e-6, s"z mismatch: $r")
  }

  test("mann-whitney is partition-invariant and half-U exact under ties") {
    val ev = mwEvents
    val r1 = Events.mannWhitney(ev.repartition(1)).collect()(0)
    val rn = Events.mannWhitney(ev.repartition(7, col("event_id"))).collect()(0)
    assert(r1.toSeq == rn.toSeq, "bit-identical on any partitioning")
    // a cross-sample tie contributes exactly 0.5 to U
    val tied = Seq(("purchase", 1.0), ("click", 1.0)).zipWithIndex.map {
      case ((t, v), i) =>
        (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), i.toLong, t, v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(Events.mannWhitney(tied).collect()(0).getDouble(2) == 0.5)
  }

  // ── giniValue ──────────────────────────────────────────────────

  private def giniEvents(values: Seq[Double]) =
    values.zipWithIndex.map { case (v, i) =>
      (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        i.toLong, "purchase", v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")

  test("gini: perfect equality scores 0, extreme concentration near 1") {
    val eq = Events.giniValue(giniEvents(Seq.fill(8)(5.0))).collect()(0)
    assert(eq.getLong(0) == 8L && eq.getDouble(2) == 0.0, s"equal spend → 0, got $eq")
    // one user holds everything: G = (n-1)/n = 0.875
    val conc = Events.giniValue(giniEvents(Seq.fill(7)(0.0) :+ 800.0)).collect()(0)
    assert(conc.getDouble(2) == 0.875, s"max concentration → (n-1)/n, got $conc")
  }

  test("gini is partition-invariant and matches the closed form") {
    // x = 1..4 ascending: G = 2·(1+4+9+16)/(4·10) − 5/4 = 0.25
    val ev = giniEvents(Seq(3.0, 1.0, 4.0, 2.0))
    val r1 = Events.giniValue(ev.repartition(1)).collect()(0)
    val rn = Events.giniValue(ev.repartition(5, col("event_id"))).collect()(0)
    assert(r1.toSeq == rn.toSeq, "bit-identical on any partitioning")
    assert(r1.getDouble(2) == 0.25, s"hand gini 0.25, got $r1")
  }
}
