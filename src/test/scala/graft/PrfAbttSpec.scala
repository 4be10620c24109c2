package graft

import graft.operators.{Ranking, Similarity}
import org.apache.spark.sql.functions._

/** Round-8 wave 2: Rocchio pseudo-relevance feedback and
  * all-but-the-top embedding postprocessing. */
class PrfAbttSpec extends SparkSpec {
  import spark.implicits._

  // ── prfTopK ────────────────────────────────────────────────────

  /** 40 docs: 0-4 score high on the original terms AND carry the
    * distinctive feedback word; 5-9 carry ONLY the feedback word
    * (invisible to the original query); 10-39 are filler. */
  private def prfDocs = {
    val fb = (0 until 5).map(i =>
      (i.toLong, ("spark join query " * (5 - i)) + "telemetry telemetry pipeline"))
    val hidden = (5 until 10).map(i =>
      (i.toLong, "telemetry telemetry telemetry pipeline metrics"))
    val filler = (10 until 40).map(i =>
      (i.toLong, "alpha beta gamma delta epsilon"))
    (fb ++ hidden ++ filler).toDF("doc_id", "text")
  }

  test("prf expansion surfaces docs the original query cannot see") {
    val docs = prfDocs
    val plain = Ranking.bm25TopK(docs, topK = 10)
      .collect().map(_.getLong(0)).toSet
    val prf = Ranking.prfTopK(docs).collect().map(_.getLong(1)).toSet
    // the hidden docs match no original term — absent from plain BM25
    assert((5L until 10L).forall(!plain.contains(_)),
      s"hidden docs should not match the original query, got $plain")
    // feedback mines "telemetry"/"pipeline" from docs 0-4 and the
    // second pass retrieves the hidden docs through them
    assert((5L until 10L).forall(prf.contains),
      s"PRF should retrieve the hidden docs via expansion, got $prf")
  }

  test("prf result is partition-invariant and ranks densely from 1") {
    val docs = prfDocs
    val a = Ranking.prfTopK(docs.repartition(1)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val b = Ranking.prfTopK(docs.repartition(13, col("doc_id"))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(a == b, "PRF must be bit-identical on any partitioning")
    assert(a.map(_._1) == (1L to a.size), s"dense ranks from 1, got ${a.map(_._1)}")
    assert(a.map(_._3) == a.map(_._3).sorted.reverse, "ordered by score desc")
  }

  test("prf plans no sort-merge join: term tables, stats, and candidates broadcast") {
    val df = Ranking.prfTopK(prfDocs)
    val plan = df.queryExecution.executedPlan
    def count(p: org.apache.spark.sql.execution.SparkPlan): Int = (p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => count(a.executedPlan)
      case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec => 1 + s.children.map(count).sum
      case other => other.children.map(count).sum
    })
    assert(count(plan) == 0, "the corpus must never sort-merge")
  }

  // ── abttTopK ───────────────────────────────────────────────────

  /** Embeddings with a strong shared component: base direction plus
    * per-vector structured noise. Raw cosines are all ≈1 (the
    * anisotropy ABTT exists to fix); the corrected space spreads. */
  private def abttEmb(n: Int = 60, dim: Int = 64) =
    (0 until n).map { id =>
      val v = Array.tabulate(dim) { i =>
        (1.0 + ((id * 31 + i * 7) % 13 - 6) / 30.0).toFloat
      }
      (id.toLong, v)
    }.toDF("vec_id", "embedding")

  test("abtt removes the shared component: corrected sims spread below raw sims") {
    val emb = abttEmb()
    val raw = Similarity.bruteTopK(emb, nQueries = 3, k = 5)
      .agg(avg(col("sim"))).collect()(0).getDouble(0)
    val abtt = Similarity.abttTopK(emb)
      .agg(avg(col("sim"))).collect()(0).getDouble(0)
    assert(raw > 0.99, s"the synthetic corpus must be anisotropic, raw=$raw")
    assert(abtt < raw - 0.01,
      s"ABTT must reduce hub similarity, raw=$raw abtt=$abtt")
  }

  test("abtt is partition-invariant with dense per-query ranks") {
    val emb = abttEmb()
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.abttTopK(df).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val a = run(emb.repartition(1))
    val b = run(emb.repartition(11, col("vec_id")))
    assert(a == b, "ABTT search must be bit-identical on any partitioning")
    assert(a.map(t => (t._1, t._3)).groupBy(_._1).values
      .forall(_.map(_._2).sorted == (1L to 5L)), "dense ranks 1..5 per query")
  }

  test("abtt corpus path is map-only: no sort-merge join, model-sized exchanges") {
    val df = Similarity.abttTopK(abttEmb())
    val plan = df.queryExecution.executedPlan
    def count(p: org.apache.spark.sql.execution.SparkPlan): Int = (p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => count(a.executedPlan)
      case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec => 1 + s.children.map(count).sum
      case other => other.children.map(count).sum
    })
    assert(count(plan) == 0,
      "centering/projection are literals; the corpus must never sort-merge")
  }
}
