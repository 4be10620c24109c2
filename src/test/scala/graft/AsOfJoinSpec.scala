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
}
