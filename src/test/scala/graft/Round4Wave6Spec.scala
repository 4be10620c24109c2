package graft

import graft.operators.{Quality, Similarity}
import org.apache.spark.sql.functions._

/** Semantic guards for the sixth round-4 wave: hard-negative mining,
  * MRR retrieval eval, interpolated LM. */
class Round4Wave6Spec extends SparkSpec {
  import spark.implicits._

  test("hard negatives: no neighbor shares its query's label") {
    val emb = Tables.embeddings(spark, sf)
    val labels = emb.select($"vec_id", $"label")
    val out = Similarity.hardNegatives(emb)
      .join(labels.withColumnRenamed("vec_id", "neighbor_id")
        .withColumnRenamed("label", "nlbl"), "neighbor_id")
      .join(labels.withColumnRenamed("vec_id", "query_id")
        .withColumnRenamed("label", "qlbl"), "query_id")
    assert(out.where($"nlbl" === $"qlbl").isEmpty)
    assert(out.groupBy($"query_id").count().where($"count" =!= 5).isEmpty)
  }

  test("mrr: bounded by 1, and 1.0 exactly when every top hit is same-label") {
    val r = Similarity.mrrAtK(Tables.embeddings(spark, sf)).as[(Long, Double)].head()
    assert(r._1 == 5L && r._2 >= 0.0 && r._2 <= 1.0)
    // one label for everything -> first neighbor always relevant -> MRR 1
    val vecs = (0L until 8L).map(i =>
      (i, Seq.tabulate(64)(d => (i + d).toFloat / 64f), "same"))
    val syn = vecs.toDF("vec_id", "embedding", "label")
    val one = Similarity.mrrAtK(syn).as[(Long, Double)].head()
    assert(one == ((5L, 1.0)))
  }

  test("interpolated LM: between pure-bigram and pure-unigram on predictable text") {
    val docs = Tables.documents(spark, sf)
    val bi = Quality.bigramCrossEntropy(docs)
      .select($"doc_id", $"cross_entropy".as("bce"))
    val interp = Quality.interpolatedCrossEntropy(docs)
      .select($"doc_id", $"cross_entropy".as("ice"))
    val joined = bi.join(interp, "doc_id").where($"bce".isNotNull).cache()
    // λ-smoothing can only add mass to p ⇒ never below half the
    // bigram probability: ice ≤ bce + ln 2 always; and corpus-wide
    // the interpolated entropy exceeds the sharper pure-bigram one
    assert(joined.where($"ice" > $"bce" + math.log(2.0) + 1e-6).isEmpty)
    val meanDiff = joined.agg(avg($"ice" - $"bce")).as[Double].head()
    assert(meanDiff > 0.0, s"interp should lose to pure bigram on average, diff $meanDiff")
    joined.unpersist()
  }
}
