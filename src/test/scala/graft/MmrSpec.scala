package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** The driver-side MMR greedy loop against an independent
  * re-derivation — in particular on a corpus engineered so the max
  * pairwise similarity among selected items goes NEGATIVE (two
  * anti-correlated clusters): flooring the penalty at zero (the bug
  * class this pins) under-penalizes anti-correlated picks and
  * reorders the tail. */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  // two anti-correlated clusters + noise, deterministic
  private def corpus() = {
    val dim = 8
    val rows = (0L until 40L).map { i =>
      val base = if (i % 2 == 0) 1.0 else -1.0
      val v = Array.tabulate(dim) { j =>
        val h = ((i * 31 + j * 17) % 13).toDouble / 13.0 - 0.5
        (base * (1.0 + j) / dim + 0.3 * h).toFloat
      }
      (i, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("greedy selection matches an independent replay, negative penalties included") {
    val emb = corpus()
    val got = Similarity.mmrTopK(emb, nQueries = 2, k = 5, depth = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

    // independent replay from the same candidate/sim tables
    val cand = Similarity.bruteTopK(emb, 2, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSeq
    def vec(id: Long): Array[Double] = emb.where($"vec_id" === id)
      .select($"embedding").head().getSeq[Float](0).map(_.toDouble).toArray
    def cos(a: Long, b: Long): Double = {
      val (x, y) = (vec(a), vec(b))
      val d = x.zip(y).map { case (p, q) => p * q }.sum
      val r = d / (math.sqrt(x.map(v => v * v).sum) * math.sqrt(y.map(v => v * v).sum))
      BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    def r6(v: Double): Long =
      BigDecimal(v * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact
    val want = cand.groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
      var rem = rows.map(r => r._2 -> r._3).toMap
      var sel = Vector.empty[Long]
      (1 to 5).map { step =>
        val scored = rem.toSeq.map { case (id, rel) =>
          val ms = if (sel.isEmpty) 0.0 else sel.map(s => cos(id, s)).max
          (id, 7L * r6(rel) - 3L * r6(ms))
        }
        val (pick, _) = scored.sortBy { case (id, s) => (-s, id) }.head
        rem -= pick; sel :+= pick
        (qid, pick, step.toLong)
      }
    }
    assert(got.sorted == want.sorted)
    // the corpus actually exercised the negative-penalty branch
    val sims = for (a <- 0L until 10L; b <- 0L until 10L if a < b) yield cos(a, b)
    assert(sims.exists(_ < -0.1), "test corpus lost its anti-correlated structure")
  }

  test("lambda = 1 degenerates to pure relevance order") {
    val emb = corpus()
    val got = Similarity.mmrTopK(emb, nQueries = 1, k = 5, depth = 10, lambda = 1.0)
      .select($"neighbor_id").collect().map(_.getLong(0)).toSeq
    val want = Similarity.bruteTopK(emb, 1, 5)
      .select($"neighbor_id").collect().map(_.getLong(0)).toSeq
    assert(got == want)
  }

  test("the /ask funnel shrinks monotonically, respects the budget, and is partition-invariant") {
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val rows = graft.operators.Ranking.askFunnel(docs, emb).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rs) =>
      val stages = rs.sortBy(_.getLong(1))
      assert(stages.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L, 4L), s"query $q missing stages")
      val counts = stages.map(_.getLong(3)).toSeq
      assert(counts(0) == 20 && counts(1) == 10 && counts(2) == 5,
        s"query $q stage counts $counts")
      assert(counts(3) <= counts(2), s"query $q pack grew: $counts")
      // the pack stage's token mass respects the budget
      assert(stages(3).getLong(4) <= 150L, s"query $q pack over budget")
      // funnel stages only ever DROP token mass
      val toks = stages.map(_.getLong(4)).toSeq
      assert(toks(0) >= toks(1) && toks(1) >= toks(2) && toks(2) >= toks(3),
        s"query $q token mass grew: $toks")
    }
    val rows2 = graft.operators.Ranking.askFunnel(docs.repartition(7), emb.repartition(5))
      .collect()
    assert(rows.map(_.toString).toSeq == rows2.map(_.toString).toSeq)
  }
}
