package graft

import graft.multimodal.Multimodal
import graft.operators.{Events, Sampling, Similarity}
import org.apache.spark.sql.functions._

/** Semantic guards for the fourth round-4 wave: keyframe detection,
  * time-to-convert, centroid drift, class-balanced sampling. */
class Round4Wave4Spec extends SparkSpec {
  import spark.implicits._

  test("keyframes: every doc's first frame is a keyframe; deltas exceed the threshold") {
    val out = Multimodal.keyframes(
      Multimodal.withBinaryPayload(Tables.documents(spark, sf))).cache()
    val firsts = out.where($"frame_idx" === 0)
    val docs = Tables.documents(spark, sf).where(length($"text") > 0).count()
    assert(firsts.count() == docs)
    assert(firsts.where($"delta".isNotNull).isEmpty)
    assert(out.where($"frame_idx" > 0 && ($"delta".isNull || $"delta" <= 8)).isEmpty)
    out.unpersist()
  }

  test("time to convert: median within [min,max]; matches a hand replay on synthetic") {
    val real = Events.timeToConvert(Tables.events(spark, sf))
      .as[(Long, Long, Long, Long)].head()
    assert(real._2 <= real._3 && real._3 <= real._4)
    // user 1 converts in 5 us, user 2 in 11 us, user 3 never
    val syn = Seq(
      (1L, "view", 100L), (1L, "purchase", 105L),
      (2L, "view", 200L), (2L, "purchase", 211L),
      (3L, "purchase", 50L), (3L, "view", 60L)
    ).toDF("user_id", "event_type", "us")
      .select($"user_id", $"event_type", timestamp_micros($"us").as("ts"))
    val r = Events.timeToConvert(syn).as[(Long, Long, Long, Long)].head()
    assert(r == ((2L, 5L, 5L, 11L)))
  }

  test("centroid shift: identical halves shift zero; a moved half is detected") {
    val vec = Seq.fill(64)(1.0f)
    val shifted = Seq.fill(64)(2.0f)
    val syn = (
      Seq((0L, vec, "same"), (1L, vec, "same")) ++
      Seq((0L, vec, "moved"), (1L, shifted, "moved"))
    ).toDF("vec_id", "embedding", "label")
    val m = Similarity.centroidShift(syn)
      .select($"label", $"shift").as[(String, Double)].collect().toMap
    assert(m("same") == 0.0)
    assert(math.abs(m("moved") - 8.0) < 1e-4) // sqrt(64 * 1²)
  }

  test("balanced classes: every class keeps exactly the smallest class's size") {
    val out = Sampling.balancedClasses(Tables.documents(spark, sf))
      .as[(String, Long, Long, Long)].collect()
    val floor = out.map(_._2).min
    assert(out.forall(_._3 == floor))
    // the checksum pins a nonempty specific subset (not just a count)
    assert(out.forall(r => r._4 > 0))
  }
}
