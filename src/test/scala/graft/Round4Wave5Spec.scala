package graft

import graft.operators.{Events, Quality}
import org.apache.spark.sql.functions._

/** Semantic guards for the fifth round-4 wave: RAKE keywords, script
  * mix, cumulative distinct users, cohort revenue. */
class Round4Wave5Spec extends SparkSpec {
  import spark.implicits._

  test("rake: a repeated content phrase outranks stopword-adjacent singles") {
    val syn = Seq(
      (1L, "the deep learning model and the deep learning model"),
      (2L, "deep learning model training is the goal of it all"),
      (3L, "an unrelated sentence with other words")).toDF("doc_id", "text")
    val top = Quality.rakeKeywords(syn).as[(String, Long, Long, Double)].collect()
    // the longer run scores highest (RAKE favors long content phrases);
    // the twice-repeated trigram is right behind with both occurrences
    assert(top.head._1 == "deep learning model training")
    val tri = top.find(_._1 == "deep learning model").get
    assert(tri._2 == 2L && top.indexOf(tri) <= 2)
    // phrases never contain stopwords
    val sw = graft.functions.TextFunctions.Stopwords.toSet
    assert(top.forall(_._1.split(" ").forall(w => !sw.contains(w))))
  }

  test("script mix: classes are disjoint and conserve total chars") {
    val out = Quality.scriptMix(Tables.documents(spark, sf))
    assert(out.where($"n_letter" + $"n_digit" + $"n_space" + $"n_cjk" + $"n_other"
      =!= $"n_chars").isEmpty)
    val syn = Seq((1L, "ab1 数据 x?", "s")).toDF("doc_id", "text", "source")
    val r = Quality.scriptMix(syn).as[(String, Long, Long, Long, Long, Long, Long)].head()
    assert(r == (("s", 9L, 3L, 1L, 2L, 2L, 1L)))
  }

  test("cumulative users: monotone, ends at total distinct, news sum to it") {
    val out = Events.cumulativeDistinctUsers(Tables.events(spark, sf))
      .as[(String, Long, Long)].collect()
    val total = Tables.events(spark, sf).select($"user_id").distinct().count()
    assert(out.last._3 == total)
    assert(out.map(_._2).sum == total)
    assert(out.sliding(2).forall { case Array(a, b) => a._3 < b._3; case _ => true })
  }

  test("pq code histogram: every vector is encoded exactly once per subspace") {
    val emb = Tables.embeddings(spark, sf)
    val out = graft.operators.Similarity.pqCodeHist(emb).cache()
    val n = emb.count()
    // per subspace the histogram sums to the corpus size
    val bySub = out.groupBy($"sub").agg(sum($"n_vecs").as("t"))
    assert(bySub.where($"t" =!= n).isEmpty)
    assert(out.where($"code" < 0 || $"code" >= 16).isEmpty)
    out.unpersist()
  }

  test("lsh dedup recall: hits never exceed truth; exact duplicates are always found") {
    val r = SparkEntry.queries("dedup_lsh_recall")(spark, sf)
      .as[(Long, Long, Double)].head()
    assert(r._2 <= r._1 && r._3 >= 0.0 && r._3 <= 1.0)
    // two exact duplicates share every band — banding must find them
    val syn = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "totally different words that never overlap with those above")
    ).toDF("doc_id", "text")
    val found = graft.operators.Dedup.minhashLshPairs(syn)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(found == Set((1L, 2L)))
  }

  test("cohort revenue: week offsets are non-negative; totals match the raw sum") {
    val out = Events.cohortRevenue(Tables.events(spark, sf)).cache()
    assert(out.where($"week_offset" < 0).isEmpty)
    val got = out.agg(round(sum($"revenue"), 2)).as[Double].head()
    val raw = Tables.events(spark, sf).where($"event_type" === "purchase")
      .agg(round(sum($"value".cast("decimal(18,4)")).cast("double"), 2)).as[Double].head()
    assert(math.abs(got - raw) < 0.05, s"$got vs $raw")
    out.unpersist()
  }
}
