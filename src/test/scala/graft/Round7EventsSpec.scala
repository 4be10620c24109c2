package graft

import java.sql.Timestamp
import graft.operators.Events

/** Round-7 event operators: the strict windowed funnel chain and the
  * CUSUM changepoint, checked against hand-built streams. */
class Round7EventsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowed funnel: chains only when every step lands inside the gap") {
    val ev = Seq(
      // user 1: completes — view 10:00, click 10:30, purchase 11:15
      (1L, 1L, ts("2024-01-01 10:00:00"), "view"),
      (2L, 1L, ts("2024-01-01 10:30:00"), "click"),
      (3L, 1L, ts("2024-01-01 11:15:00"), "purchase"),
      // user 2: click too late (90 min after view) — no chain
      (4L, 2L, ts("2024-01-01 10:00:00"), "view"),
      (5L, 2L, ts("2024-01-01 11:30:00"), "click"),
      (6L, 2L, ts("2024-01-01 11:45:00"), "purchase"),
      // user 3: purchase BEFORE the click — order matters, no chain
      (7L, 3L, ts("2024-01-01 10:00:00"), "view"),
      (8L, 3L, ts("2024-01-01 10:10:00"), "purchase"),
      (9L, 3L, ts("2024-01-01 10:20:00"), "click"),
      // user 4: second click in window rescues nothing — greedy uses
      // the EARLIEST in-window click, whose purchase window then misses
      (10L, 4L, ts("2024-01-01 10:00:00"), "view"),
      (11L, 4L, ts("2024-01-01 10:05:00"), "click"),
      (12L, 4L, ts("2024-01-01 10:55:00"), "click"),
      (13L, 4L, ts("2024-01-01 11:30:00"), "purchase"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = Events.windowedFunnel(ev, stepGapMinutes = 60).collect()
    assert(got.map(_.getAs[Long]("user_id")).toSeq == Seq(1L))
    val r = got.head
    assert(r.getAs[String]("view_ts").startsWith("2024-01-01 10:00:00"))
    assert(r.getAs[Long]("funnel_us") == 75L * 60 * 1000000)
  }

  test("cusum: the changepoint lands where the level shifts") {
    // 10 quiet days of 2 events, then 10 loud days of 10 — CUSUM
    // peaks on the LAST day (deviations stay positive after the
    // shift), and the statistic is days·(10 − mean) at the peak
    val rows = (1 to 10).flatMap(d => (1 to 2).map(i =>
      (d * 100L + i, 1L, ts(f"2024-01-$d%02d 12:00:00"), "view"))) ++
      (11 to 20).flatMap(d => (1 to 10).map(i =>
        (d * 100L + i, 1L, ts(f"2024-01-$d%02d 12:00:00"), "view")))
    val ev = rows.toDF("event_id", "user_id", "ts", "event_type")
    val got = Events.cusumChangepoint(ev).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("n_days") == 20)
    assert(r.getAs[String]("changepoint_day") == "2024-01-20")
    // mean = 6, the loud tail accumulates (10-6)*10 = 40
    assert(math.abs(r.getAs[Double]("max_cusum") - 40.0) < 1e-9)
  }

  test("cusum is partition-invariant") {
    val ev = Tables.events(spark, sf)
    val a = Events.cusumChangepoint(ev).collect().map(_.toString).toSeq
    val b = Events.cusumChangepoint(ev.repartition(17)).collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("seasonal-naive backtest: a perfectly weekly series scores MAE 0") {
    // 21 days with counts cycling by day-of-week: the lag-7 forecast
    // is exact, so MAE and MAPE are both 0 over the 14 scorable days
    val rows = (0 until 21).flatMap { d =>
      val n = (d % 7) + 1
      (1 to n).map(i => (d * 100L + i, 1L,
        ts(f"2024-01-${d + 1}%02d 12:00:00"), "view"))
    }
    val got = Events.forecastBacktest(
      rows.toDF("event_id", "user_id", "ts", "event_type")).collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("n_days_scored") == 14)
    assert(got.head.getAs[Double]("mae") == 0.0)
    assert(got.head.getAs[Double]("mape") == 0.0)
  }

  test("seasonal-naive backtest is partition-invariant") {
    val ev = Tables.events(spark, sf)
    val a = Events.forecastBacktest(ev).collect().map(_.toString).toSeq
    val b = Events.forecastBacktest(ev.repartition(17)).collect().map(_.toString).toSeq
    assert(a == b && a.nonEmpty)
  }

  test("windowed funnel is partition-invariant") {
    val ev = Tables.events(spark, sf)
    val a = Events.windowedFunnel(ev).collect().map(_.toString).toSeq
    val b = Events.windowedFunnel(ev.repartition(17)).collect().map(_.toString).toSeq
    assert(a == b && a.nonEmpty)
  }

  test("sketch quantiles: estimate within one bin width of exact, merge counted") {
    val ev = Tables.events(spark, sf)
    val rows = Events.histQuantileSketch(ev).collect()
    assert(rows.map(_.getAs[Double]("q")).toSeq == Seq(0.5, 0.9, 0.99))
    // interpolation error is bounded by one bin width of the value range
    val vals = ev.agg(
      org.apache.spark.sql.functions.min("value"),
      org.apache.spark.sql.functions.max("value")).collect()(0)
    val binWidth = (vals.getDouble(1) - vals.getDouble(0)) / 256
    rows.foreach { r =>
      assert(r.getAs[Double]("abs_err") <= binWidth + 1e-6,
        s"estimate off by more than a bin: $r (bin width $binWidth)")
      assert(r.getAs[Long]("n_days_merged") > 1, "sketch zone must span days")
    }
  }

  test("kleinberg bursts: an injected high-rate stretch becomes one interval") {
    // 48 hours at the base rate (2 purchases / 10 events), except
    // hours 20..25 burst at 8/10 — far past p1 = 1.75·p0
    val ev = (0 until 48).flatMap { h =>
      val nP = if (h >= 20 && h <= 25) 8 else 2
      (0 until 10).map { i =>
        (h.toLong * 100 + i, ts(f"2024-03-01 00:00:00")
          .toLocalDateTime.plusHours(h).plusMinutes(i),
          i.toLong, if (i < nP) "purchase" else "view")
      }
    }.map { case (id, t, u, et) => (id, java.sql.Timestamp.valueOf(t), u, et) }
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = Events.kleinbergBursts(ev).collect()
    assert(out.length == 1, s"expected one burst: ${out.toSeq}")
    assert(out(0).getAs[String]("burst_start") == "2024-03-01 20:00:00" &&
      out(0).getAs[String]("burst_end") == "2024-03-02 01:00:00" &&
      out(0).getAs[Long]("n_hours") == 6L, s"${out(0)}")
    assert(out(0).getAs[Double]("weight") > 0)
  }

  test("kleinberg bursts are partition-invariant") {
    val ev = Tables.events(spark, sf)
    val a = Events.kleinbergBursts(ev).collect().map(_.toString).toSeq
    val b = Events.kleinbergBursts(ev.repartition(17)).collect().map(_.toString).toSeq
    assert(a == b && a.nonEmpty)
  }

  test("sketch quantiles are partition-invariant") {
    val ev = Tables.events(spark, sf)
    val a = Events.histQuantileSketch(ev).collect().map(_.toString).toSeq
    val b = Events.histQuantileSketch(ev.repartition(17)).collect().map(_.toString).toSeq
    assert(a == b && a.nonEmpty)
  }
}
