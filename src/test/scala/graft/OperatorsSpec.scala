package graft

import graft.operators._
import org.apache.spark.sql.functions._

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("bronze filters empty content and stamps length") {
    val raw = Seq((1L, "  hi  "), (2L, "   "), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Medallion.bronze(raw).select($"doc_id", $"content", $"content_length")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "hi", 2L)))
  }

  test("silver dedup keeps lowest id per content") {
    val df = Seq((5L, "same text here"), (2L, "same text here"), (9L, "other text here"))
      .toDF("doc_id", "content")
    val kept = Medallion.silverDedup(df).select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 9L))
  }

  test("fixedStride chunks cover the text with the configured overlap") {
    val text = ("abcdefghij" * 45) // 450 chars → starts 0,190,380
    val df = Seq((1L, text)).toDF("doc_id", "content")
    val chunks = Chunker.fixedStride(df, "content")
      .orderBy($"chunk_idx").select($"chunk").as[String].collect().toSeq
    assert(chunks.length == 3)
    assert(chunks(0).length == 200 && chunks(1).length == 200 && chunks(2).length == 70)
    // consecutive chunks overlap by 10 chars
    assert(chunks(0).takeRight(10) == chunks(1).take(10))
    // full coverage
    assert(chunks(0) ++ chunks(1).drop(10) ++ chunks(2).drop(10) == text)
  }

  test("recursive splitter respects size and covers content") {
    val text = Seq.fill(20)("one two three four five.").mkString(" ")
    val chunks = Chunker.splitRecursive(text, size = 100, overlap = 10)
    assert(chunks.nonEmpty)
    assert(chunks.forall(_.length <= 110)) // size + overlap carry
    assert(chunks.mkString.contains("one two three"))
  }

  test("exact dedup groups identical content") {
    val df = Seq((1L, "aaa"), (2L, "aaa"), (3L, "bbb")).toDF("doc_id", "text")
    val got = Dedup.exact(df).select($"keep_id", $"n_copies").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (3L, 1L)))
  }

  test("ngram jaccard finds a planted near-duplicate pair") {
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val b = "the quick brown fox jumps over the lazy dog again and again tomorrow"
    val c = "completely different words describing some other topic entirely here now"
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(df, tau = 0.3)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSeq
    assert(pairs == Seq((1L, 2L)))
  }

  test("minhash LSH surfaces exact duplicates as candidates") {
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val df = Seq((1L, a), (2L, a), (3L, "uno dos tres cuatro cinco seis siete ocho nueve diez"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(df).select($"id_a", $"id_b", $"jaccard")
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs == Seq((1L, 2L, 1.0)))
  }

  test("simhash pairs: identical docs at hamming 0") {
    val df = Seq((1L, "w1 w2 w3 w4 w5"), (2L, "w1 w2 w3 w4 w5"), (3L, "q9 q8 q7 q6 q5"))
      .toDF("doc_id", "text")
    val got = Dedup.simhashPairs(df).select($"id_a", $"id_b", $"hamming")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.contains((1L, 2L, 0L)))
    assert(!got.exists(p => p._1 == 1L && p._2 == 3L))
  }

  test("embedding pairs finds duplicated vector at cosine 1") {
    val v1 = Seq.tabulate(64)(i => i.toFloat / 64f)
    val v2 = v1
    val v3 = Seq.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val df = Seq((1L, v1), (2L, v2), (3L, v3)).toDF("vec_id", "embedding")
    val got = Dedup.embeddingPairs(df, tau = 0.99)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L)))
  }

  test("brute topk ranks the duplicate first") {
    val base = Seq.tabulate(64)(i => math.sin(i.toDouble).toFloat)
    val near = base.updated(0, base(0) + 0.01f)
    val far = Seq.tabulate(64)(i => math.cos(i * 3.0).toFloat)
    val df = Seq((0L, base), (10L, near), (20L, far)).toDF("vec_id", "embedding")
    val top = Similarity.bruteTopK(df, nQueries = 1, k = 2)
      .select($"neighbor_id", $"rank").as[(Long, Long)].collect().toSeq
    assert(top == Seq((10L, 1L), (20L, 2L)))
  }

  test("sessionize splits on the idle gap") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val df = Seq(
      (1L, ts(0), 7L, "a", 1.0, "{}"), (2L, ts(10), 7L, "a", 2.0, "{}"),
      (3L, ts(60), 7L, "a", 3.0, "{}"), (4L, ts(65), 7L, "a", 4.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Events.sessionize(df).select($"session_seq", $"n_events", $"session_value")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 2L, 3.0), (2L, 2L, 7.0)))
  }

  test("quality suite shapes") {
    val docs = Tables.documents(spark, sf)
    assert(Quality.recordCounts(docs).count() > 0)
    assert(Quality.duplicateAnalysis(docs).count() == 1)
    assert(Quality.wordFrequency(docs).count() <= 20)
  }
}
