package graft

import graft.operators.TrainingMix
import org.apache.spark.sql.functions._

/** Mixture planning invariants: budget allocations sum EXACTLY to the
  * budget and track token mass; √-smoothing upsamples small sources
  * and downsamples large ones; curriculum ranks are a permutation
  * ordered by phase. */
class TrainingMixSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Tables.documents(spark, sf)

  test("token budget: allocations sum exactly to the budget, ordered by mass") {
    val out = TrainingMix.tokenBudget(docs, budget = 99991L) // prime: forces remainders
    val rows = out.collect()
    assert(rows.map(_.getAs[Long]("alloc_tokens")).sum == 99991L)
    // allocation is monotone in token mass up to the ±1 bump
    val byTok = rows.sortBy(_.getAs[Long]("n_tokens"))
    byTok.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("alloc_tokens") <= b.getAs[Long]("alloc_tokens") + 1)
      case _ =>
    }
    // every source with tokens gets a non-negative allocation
    assert(rows.forall(_.getAs[Long]("alloc_tokens") >= 0))
  }

  test("mixture weights: √-smoothing compresses the spread, weights sum to ~1") {
    val rows = TrainingMix.mixtureWeights(docs).collect()
    val wSum = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wSum - 1.0) < 1e-4, s"weights sum to $wSum")
    // smallest source is upsampled, largest downsampled
    val bySz = rows.sortBy(_.getAs[Long]("n_tokens"))
    assert(bySz.head.getAs[Double]("sampling_factor") >= 1.0)
    assert(bySz.last.getAs[Double]("sampling_factor") <= 1.0)
  }

  test("curriculum: ranks are a 1..N permutation, phases in order") {
    val out = TrainingMix.curriculum(docs).collect()
    val ranks = out.map(_.getAs[Long]("curriculum_rank")).sorted
    assert(ranks.toSeq == (1L to out.length).toSeq)
    // ranks respect phase order: every phase-1 doc before every phase-2 doc, etc.
    val byRank = out.sortBy(_.getAs[Long]("curriculum_rank"))
    val phases = byRank.map(_.getAs[Long]("phase"))
    assert(phases.toSeq == phases.sorted.toSeq)
  }

  test("curriculum rank is partition-invariant (banded, no global window)") {
    val a = TrainingMix.curriculum(docs)
    val b = TrainingMix.curriculum(docs.repartition(13))
    assert(a.collect().map(_.toString).toSeq == b.collect().map(_.toString).toSeq)
  }

  test("doremi: in-mixture domains keep their share, divergent domains gain") {
    // a and b share one vocabulary (≈ the corpus mixture → KL ≈ 0);
    // c is disjoint (large KL) with the same token mass as b
    val rows =
      Seq.fill(40)(("a", "x y z")) ++ Seq.fill(20)(("b", "x y z")) ++
        Seq.fill(20)(("c", "q r s"))
    val d = rows.toDF("source", "text")
    val out = TrainingMix.doremiWeights(d).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("kl"), r.getAs[Double]("weight"))).toMap
    assert(out("a")._1 < out("c")._1 && out("b")._1 < out("c")._1,
      s"disjoint domain must have the largest KL: $out")
    // EG lifts c above its 25% token share; b must fall below its 25%
    assert(out("c")._2 > 0.25 && out("b")._2 < 0.25, s"$out")
    // weights normalize
    val sumW = out.values.map(_._2).sum
    assert(math.abs(sumW - 1.0) < 1e-4, s"weights must sum to 1: $sumW")
  }

  test("doremi weights are partition-invariant") {
    val a = TrainingMix.doremiWeights(docs).collect().map(_.toString).toSeq
    val b = TrainingMix.doremiWeights(docs.repartition(13)).collect().map(_.toString).toSeq
    assert(a == b && a.nonEmpty)
  }
}
