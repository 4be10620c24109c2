package graft

import graft.multimodal.Multimodal
import graft.operators.Quality
import org.apache.spark.sql.functions._

/** Round-7 wave 5: code-vs-prose detection and the per-modality
  * byte-budget shard plan. */
class Round7Wave5Spec extends SparkSpec {
  import spark.implicits._

  test("code detect: code scores above prose, features bounded") {
    val docs = Seq(
      (1L, "def main(args): return [x for x in range(10) if x > 5]; import sys;"),
      (2L, "The quiet afternoon light settled over the harbor as fishermen mended their nets.")
    ).toDF("doc_id", "text")
    val out = Quality.codeDetect(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Double]("code_score") > out(2L).getAs[Double]("code_score"))
    assert(out(1L).getAs[Long]("kw_hits") >= 3)
    assert(out(2L).getAs[Long]("kw_hits") == 0)
    out.values.foreach { r =>
      val s = r.getAs[Double]("code_score")
      assert(s >= 0.0 && s <= 1.0)
      assert(r.getAs[Double]("symbol_ratio") >= 0.0)
    }
  }

  test("shard plan: conserves bytes and assets, contiguous shard ids, partition-invariant") {
    val docs = Tables.documents(spark, sf)
    val plan = Multimodal.shardPlan(docs).collect()
    // conservation: every asset lands in exactly one shard
    val media = Multimodal.withBinaryPayload(docs.where($"text".isNotNull))
    assert(plan.map(_.getAs[Long]("n_assets")).sum == media.count())
    assert(plan.map(_.getAs[Long]("shard_bytes")).sum ==
      media.agg(sum($"byte_len")).as[Long].head())
    // shard ids are 0..max contiguous within each mime
    plan.groupBy(_.getAs[String]("mime")).foreach { case (_, rows) =>
      val ids = rows.map(_.getAs[Long]("shard_id")).sorted
      assert(ids.toSeq == (0L until ids.length).toSeq)
    }
    // a shard never exceeds budget + one max asset (straddle bound)
    val maxAsset = media.agg(max($"byte_len")).as[Long].head()
    plan.foreach { r =>
      assert(r.getAs[Long]("shard_bytes") <= 8192L + maxAsset)
    }
    val b = Multimodal.shardPlan(docs.repartition(13)).collect()
    assert(plan.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }
}
