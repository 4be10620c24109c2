package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Graph ANN (NSW-style small world): deterministic construction,
  * partition invariance, navigability, and the scale shape (edge
  * list O(n·(m+2)), search cost independent of corpus size). */
class GraphAnnSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf)

  test("edges are deterministic and partition-invariant") {
    val one = Similarity.graphEdges(emb.coalesce(1))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val many = Similarity.graphEdges(emb.repartition(7))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(one == many && one.nonEmpty)
  }

  test("edge list carries the tree backbone and bounded-degree local links") {
    val edges = Similarity.graphEdges(emb)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val n = emb.count()
    // every node above 0 reaches its tree parent both ways
    (1L until math.min(n, 50L)).foreach { u =>
      assert(edges.contains((u, u / 2)) && edges.contains((u / 2, u)))
    }
    // degree is bounded: ≤ m local out-links + m reverses' worst case
    // is unbounded in-degree, but out-degree per src stays small
    val outDeg = edges.groupBy(_._1).view.mapValues(_.size)
    assert(outDeg.values.max <= 8 /*m*/ * 5 + 3,
      "out-degree should stay O(m + tree links)")
  }

  test("search is deterministic across partitionings and better than entry-seeding alone") {
    val a = Similarity.graphTopK(emb.repartition(5), nQueries = 3, k = 5)
      .collect().map(_.toString).toSeq
    val b = Similarity.graphTopK(emb.coalesce(1), nQueries = 3, k = 5)
      .collect().map(_.toString).toSeq
    assert(a == b && a.nonEmpty)
    // the walk must traverse: its results beat scoring only the
    // entry points (steps=0 equivalent would return entry ids)
    val res = Similarity.graphTopK(emb, nQueries = 3, k = 5)
    assert(res.where(col("neighbor_id") >= 16).count() > 0,
      "beam search must reach nodes beyond the entry set")
  }
}
