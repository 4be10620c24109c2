package graft

import graft.operators.{Analytics, Quality, Similarity}
import org.apache.spark.sql.functions._

/** Semantic guards for the third round-4 wave: JL projection ANN,
  * per-dim whitening stats, Benford audit, approx-percentile
  * contract, HTML stripping. */
class Round4Wave3Spec extends SparkSpec {
  import spark.implicits._

  test("jl: projection preserves self-similarity; recall is a valid average") {
    val emb = Tables.embeddings(spark, sf)
    val top = Similarity.jlTopK(emb)
    assert(top.groupBy($"query_id").count().where($"count" =!= 10).isEmpty)
    assert(top.where($"sim" > 1.000001 || $"sim" < -1.000001).isEmpty)
    val rec = Similarity.recallAtK(Similarity.jlTopK(emb), Similarity.bruteTopK(emb))
      .as[(Long, Double)].head()
    assert(rec._1 == 5L && rec._2 >= 0.0 && rec._2 <= 1.0)
    // projecting onto ALL the information (pDim=64 random rotation
    // keeps ~full rank) must beat the 8-dim crush
    val hi = Similarity.recallAtK(Similarity.jlTopK(emb, pDim = 64),
      Similarity.bruteTopK(emb)).as[(Long, Double)].head()._2
    val lo = Similarity.recallAtK(Similarity.jlTopK(emb, pDim = 8),
      Similarity.bruteTopK(emb)).as[(Long, Double)].head()._2
    assert(hi >= lo, s"recall(pDim=64)=$hi < recall(pDim=8)=$lo")
  }

  test("dim stats: 64 dims, counts match corpus, std non-negative") {
    val emb = Tables.embeddings(spark, sf)
    val out = Similarity.dimStats(emb).cache()
    assert(out.count() == 64)
    val n = emb.count()
    assert(out.where($"n" =!= n).isEmpty)
    assert(out.where($"std" < 0.0 || $"std".isNull).isEmpty)
    out.unpersist()
    // a constant dimension has std 0 and mean = the constant
    val syn = Seq((1L, Seq(2.0f, 5.0f)), (2L, Seq(2.0f, 1.0f))).toDF("vec_id", "embedding")
    val m = Similarity.dimStats(syn, dim = 2).as[(Long, Long, Double, Double)].collect()
    assert(m(0) == ((1L, 2L, 2.0, 0.0)) && m(1)._3 == 3.0)
  }

  test("benford: ppm shares sum to ~1e6 and expectations are the published law") {
    val out = Analytics.benfordDigits(spark, sf).as[(Long, Long, Long, Long, Long)].collect()
    assert(out.map(_._1).toSeq == (1L to 9L))
    val totPpm = out.map(_._3).sum
    assert(totPpm > 999990 && totPpm <= 1000000, s"obs ppm sum $totPpm")
    assert(out.head._4 == 301029L && out.last._4 == 45757L)
    assert(out.forall(r => r._5 == r._3 - r._4))
  }

  test("approx percentile contract holds on the driver data") {
    val out = Analytics.approxPercentile(spark, sf)
    assert(out.count() == 3)
    assert(out.where($"approx_ok" =!= 1).isEmpty)
  }

  test("html strip: tags out, entities decoded AFTER tag removal, text preserved") {
    val syn = Seq(
      (1L, "<html><p>hello &amp; bye</p></html>"),
      (2L, "keep &lt;this literal tag&gt; visible"),
      (3L, "plain  text   with	runs")).toDF("doc_id", "text")
    val m = Quality.htmlStrip(syn)
      .select($"doc_id", $"n_tags", $"clean_text").as[(Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(m(1L) == ((4L, "hello & bye")))
    // &lt;...&gt; decodes to a visible literal, NOT a stripped tag
    assert(m(2L) == ((0L, "keep <this literal tag> visible")))
    assert(m(3L) == ((0L, "plain text with runs")))
  }
}
