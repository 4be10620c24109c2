package graft

import graft.operators.Bpe

/** BPE trainer: canonical merge sequence on the textbook fixture,
  * deterministic tie-breaks, partition invariance. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learns the textbook merge sequence with deterministic tie-breaks") {
    // low:3 lower:2 newest:1 — hand-derived rounds:
    //  1: lo/ow tie at 5 -> 'lo' (left asc)   2: (lo,w) 5
    //  3: (low,e)/(e,r) tie at 2 -> (e,r)     4: (low,er) 2
    val docs = Seq(
      "low low low", "lower lower", "newest").toDF("text")
    val got = Bpe.bpeTrain(docs, nMerges = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got == Seq(
      (1L, "l", "o", "lo", 5L),
      (2L, "lo", "w", "low", 5L),
      (3L, "e", "r", "er", 2L),
      (4L, "low", "er", "lower", 2L)), s"got $got")
  }

  test("training is partition-invariant") {
    val docs = Tables.documents(spark, sf)
    val one = Bpe.bpeTrain(docs.coalesce(1), 3).collect().map(_.toString).toSeq
    val many = Bpe.bpeTrain(docs.repartition(7), 3).collect().map(_.toString).toSeq
    assert(one == many && one.nonEmpty)
  }
}
