package graft

import graft.multimodal.Multimodal
import graft.operators.{Dedup, Quality, Similarity}
import graft.streaming.StreamingCuration
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Semantic guards for the late round-4 wave: lexical diversity,
  * n-gram novelty, deflated PCA, similarity histogram, perceptual
  * hashing, and the streaming dedup gate. */
class Round4WaveSpec extends SparkSpec {
  import spark.implicits._

  test("type-token ratio: types and hapax are bounded by tokens") {
    val out = Quality.typeTokenStats(Tables.documents(spark, sf))
    assert(out.where($"n_types" > $"n_tokens" || $"n_hapax" > $"n_types").isEmpty)
    assert(out.where($"ttr_ppm" < 0 || $"ttr_ppm" > 1000000).isEmpty)
    // a doc of all-distinct tokens has ttr 1e6 and all hapax
    val syn = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val r = Quality.typeTokenStats(syn).as[(Long, Long, Long, Long, Long)].head()
    assert(r == ((1L, 3L, 3L, 3L, 1000000L)))
  }

  test("ngram novelty: the earliest doc of any duplicate pair is fully novel") {
    val out = Quality.ngramNovelty(Tables.documents(spark, sf))
    assert(out.where($"n_seen" > $"n_grams").isEmpty)
    // exact duplicate content ⇒ the later copy has zero novelty
    val syn = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val m = Quality.ngramNovelty(syn)
      .select($"doc_id", $"novel_ppm").as[(Long, Long)].collect().toMap
    assert(m(1L) == 1000000L && m(2L) == 0L)
  }

  test("deflated second direction is near-orthogonal to the first") {
    val out = Similarity.powerIterationDeflated(Tables.embeddings(spark, sf))
    assert(out.count() == 64)
    val dotP = out.agg(sum($"v1" * $"v2")).as[Double].head()
    assert(math.abs(dotP) < 1e-3, s"v1·v2 = $dotP")
    // v2 is unit-normalized (up to the 6dp output rounding)
    val n2 = out.agg(sum($"v2" * $"v2")).as[Double].head()
    assert(math.abs(n2 - 1.0) < 1e-3)
  }

  test("cosine histogram conserves the blocked pair count") {
    val hist = Similarity.cosineHistogram(Tables.embeddings(spark, sf))
    val total = hist.agg(sum($"n_pairs")).as[Long].head()
    val perLabel = Tables.embeddings(spark, sf)
      .groupBy($"label").count().as[(Int, Long)].collect()
    val expected = perLabel.map { case (_, n) => n * (n - 1) / 2 }.sum
    assert(total == expected)
    assert(hist.where($"bucket" < -10 || $"bucket" > 10).isEmpty)
  }

  test("phash: identical payloads collide at hamming zero; pairs are symmetric-free") {
    val syn = Seq(
      (1L, "the quick brown fox jumps over the lazy dog " * 4),
      (2L, "the quick brown fox jumps over the lazy dog " * 4),
      (3L, "completely different content with other bytes entirely %%%")
    ).toDF("doc_id", "text")
    val pairs = Multimodal.phashPairs(Multimodal.withBinaryPayload(syn))
      .as[(Long, Long, Long)].collect()
    assert(pairs.contains((1L, 2L, 0L)))
    assert(pairs.forall { case (a, b, _) => a < b })
  }

  test("streaming dedup keeps first occurrence across micro-batches and drops later copies") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val stream = mem.toDF().toDF("doc_id", "ts", "text")
    val out = StreamingCuration.dedupStream(stream)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("dedup_stream").start()
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(sec: Int) = new java.sql.Timestamp(t0.getTime + sec * 1000L)
    try {
      mem.addData((1L, ts(0), "doc A"), (2L, ts(1), "doc B"), (3L, ts(2), "doc A"))
      q.processAllAvailable()
      // cross-batch duplicate within the watermark horizon
      mem.addData((4L, ts(3), "doc B"), (5L, ts(4), "doc C"))
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.table("dedup_stream").select($"doc_id").as[Long].collect().sorted
    assert(kept.sameElements(Array(1L, 2L, 5L)),
      s"kept ${kept.mkString(",")}; expected first occurrences 1,2,5")
  }
}
