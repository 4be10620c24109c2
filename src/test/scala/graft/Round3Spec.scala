package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Unit coverage for the round-3 operators (beyond the oracle gate):
  * semantic assertions the hash compare can't express — recall
  * quality, window multiplicity, probability normalization,
  * boilerplate-removal behavior. */
class Round3Spec extends SparkSpec {
  import spark.implicits._

  test("line dedup removes corpus-hot lines and keeps order") {
    val docs = Seq(
      (1L, "HEADER\nalpha\nFOOTER"),
      (2L, "HEADER\nbeta\nFOOTER"),
      (3L, "HEADER\ngamma\nFOOTER"),
      (4L, "delta only")).toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs, cap = 3)
      .select($"doc_id", $"n_lines", $"n_removed", $"clean_text")
      .as[(Long, Long, Long, String)].collect().toMap2
    assert(out(1L) == (3L, 2L, "alpha"))
    assert(out(4L) == (1L, 0L, "delta only"))
  }

  private implicit class Map2[A, B, C, D](s: Array[(A, B, C, D)]) {
    def toMap2: Map[A, (B, C, D)] = s.map(t => t._1 -> ((t._2, t._3, t._4))).toMap
  }

  test("repetition metrics flag a degenerate doc and pass a diverse one") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam"),
      (2L, "a varied sentence with many different interesting words here")
    ).toDF("doc_id", "text")
    val out = Quality.repetition(docs)
      .select($"doc_id", $"keep").as[(Long, Long)].collect().toMap
    assert(out(1L) == 0L && out(2L) == 1L)
  }

  test("repetition handles token-less docs without dividing by zero") {
    val docs = Seq((1L, "   "), (2L, "one")).toDF("doc_id", "text")
    val out = Quality.repetition(docs)
      .select($"doc_id", $"n_tokens", $"keep").as[(Long, Long, Long)]
      .collect().toMap2a
    assert(out(1L) == (0L, 0L))
    // a single-token doc: ttr = 1, top_word_frac = 1 -> filtered
    assert(out(2L) == (1L, 0L))
  }

  private implicit class Map2a[A, B, C](s: Array[(A, B, C)]) {
    def toMap2a: Map[A, (B, C)] = s.map(t => t._1 -> ((t._2, t._3))).toMap
  }

  test("markov transition probabilities sum to 1 per source state") {
    val sums = Events.transitions(Tables.events(spark, sf))
      .groupBy($"prev_type").agg(sum($"p").as("s"))
      .as[(String, Double)].collect()
    assert(sums.nonEmpty)
    sums.foreach { case (t, s) => assert(math.abs(s - 1.0) < 1e-9, s"$t sums to $s") }
  }

  test("hopping windows cover each event exactly size/slide times") {
    val ev = Tables.events(spark, sf)
    val total = ev.count()
    val windowed = Events.hoppingAgg(ev).agg(sum($"n_events")).as[Long].head()
    assert(windowed == 2 * total)
  }

  test("temperature sampling upweights small sources") {
    // 400 vs 100 docs: sqrt flattening must give the small source a
    // strictly higher keep rate
    val docs = (0 until 400).map(i => (i.toLong, s"d$i", "big")) ++
      (400 until 500).map(i => (i.toLong, s"d$i", "small"))
    val out = Sampling.temperatureMixture(docs.toDF("doc_id", "text", "source"))
      .select($"source", $"rate_pct").as[(String, Double)].collect().toMap
    assert(out("small") > out("big"))
  }

  test("pq top-k recalls most of the exact neighbors") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val rec = Similarity.recallAtK(
      Similarity.pqTopK(emb), Similarity.bruteTopK(emb, nQueries = 3))
      .select($"avg_recall").as[Double].head()
    // ADC over 16 codewords per subspace is a coarse sketch; on the
    // near-random synthetic vectors anything well above chance
    // (10/999 ~ 0.01) shows the code path ranks signal, not noise
    assert(rec > 0.2, s"pq recall $rec")
  }

  test("hybrid RRF ranks a doc on both lists above single-list docs") {
    val fused = Ranking.hybridTopK(
      Tables.documents(spark, "/root/testdata/sf0.01"),
      Tables.embeddings(spark, "/root/testdata/sf0.01"))
    val rows = fused.select($"query_id", $"vec_rank", $"lex_rank", $"rrf").collect()
    assert(rows.nonEmpty)
    // every fused score must equal the sum of its two RRF terms
    rows.foreach { r =>
      val vr = Option(r.get(1)).map(_.asInstanceOf[Long])
      val lr = Option(r.get(2)).map(_.asInstanceOf[Long])
      val expect = vr.map(v => BigDecimal(1.0 / (60 + v)).setScale(6, BigDecimal.RoundingMode.HALF_UP)).getOrElse(BigDecimal(0)) +
        lr.map(l => BigDecimal(1.0 / (60 + l)).setScale(6, BigDecimal.RoundingMode.HALF_UP)).getOrElse(BigDecimal(0))
      assert(math.abs(r.getDouble(3) - expect.toDouble) < 1e-9)
    }
  }

  test("power iteration yields a unit vector") {
    val out = Similarity.powerIteration(Tables.embeddings(spark, sf))
      .select($"v1").as[Double].collect()
    assert(out.length == 64)
    assert(math.abs(out.map(x => x * x).sum - 1.0) < 1e-4)
  }

  test("drift CDFs are monotone and end at 1") {
    val rows = Quality.lengthDrift(Tables.documents(spark, sf))
      .select($"k", $"cdf_a", $"cdf_b", $"gap")
      .as[(Long, Double, Double, Double)].collect().sortBy(_._1)
    assert(rows.length == 20)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 >= a._2 && b._3 >= a._3)
    }
    assert(rows.last._2 == 1.0 && rows.last._3 == 1.0)
    rows.foreach(r => assert(r._4 >= 0.0 && r._4 <= 1.0))
  }

  test("edit verification flags exact copies and clears distinct docs") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "a completely different document about query engines and columnar io")
    ).toDF("doc_id", "text")
    val out = Dedup.editVerifiedPairs(docs)
      .select($"id_a", $"id_b", $"lev", $"is_dup")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 0L, 1L)))
  }

  test("readability scores a terse text above a polysyllabic one") {
    val docs = Seq(
      (1L, "the cat sat. the dog ran. we go now."),
      (2L, "extraordinarily multisyllabic vocabulary necessitates considerable concentration")
    ).toDF("doc_id", "text")
    val out = Quality.readability(docs)
      .select($"doc_id", $"flesch").as[(Long, Double)].collect().toMap
    assert(out(1L) > out(2L))
  }

  test("pagerank mass sums to ~1 over the pair graph") {
    val pr = Dedup.pairPageRank(
      Dedup.minhashLshPairs(Tables.documents(spark, "/root/testdata/sf0.01")))
      .select($"pr").as[Double].collect()
    assert(pr.nonEmpty)
    // rank mass is conserved up to rounding: n_nodes * 6dp rounding slack
    assert(math.abs(pr.sum - 1.0) < pr.length * 1e-6 + 1e-4, s"sum=${pr.sum}")
  }

  test("converged pagerank: real iteration, mass conserved, partition-invariant, cap honored") {
    val pairs = Dedup.embeddingPairs(Tables.embeddings(spark, sf))
      .localCheckpoint(true)
    val r = Dedup.pairPageRankConverged(pairs)
    val rows = r.collect()
    assert(rows.nonEmpty)
    val iters = rows.map(_.getLong(3)).distinct.toSeq
    val conv = rows.map(_.getLong(4)).distinct.toSeq
    assert(iters.size == 1 && conv == Seq(1L), s"iters=$iters conv=$conv")
    // the iterate genuinely iterated (one-step convergence would
    // grade nothing) and stopped before the cap
    assert(iters.head > 1 && iters.head < 48, s"n_iters=${iters.head}")
    // mass conserved up to rounding slack
    val mass = rows.map(_.getDouble(2)).sum
    assert(math.abs(mass - 1.0) < rows.length * 1e-6 + 1e-4, s"sum=$mass")
    // partition invariance: the exact-integer stopping rule and the
    // decimal mass sums make the whole iterate layout-independent
    val r2 = Dedup.pairPageRankConverged(pairs.repartition(7)).collect()
    assert(rows.map(_.toString).toSeq == r2.map(_.toString).toSeq)
    // an impossible epsilon exhausts the cap and reports NOT converged
    val capped = Dedup.pairPageRankConverged(pairs, epsMicro = -1L, maxIters = 3)
    val capRow = capped.select($"n_iters", $"converged").distinct().collect()
    assert(capRow.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((3L, 0L)))
    // the empty graph converges trivially to an empty frame
    assert(Dedup.pairPageRankConverged(pairs.where($"id_a" < -1)).count() == 0)
  }

  test("ivfpq scores decompose into coarse + fine terms") {
    val out = Similarity.ivfpqTopK(Tables.embeddings(spark, sf))
      .select($"query_id", $"rank", $"sim").collect()
    assert(out.nonEmpty)
    // ranks are dense from 1 within each query
    out.groupBy(_.getLong(0)).values.foreach { rows =>
      val ranks = rows.map(_.getLong(1)).sorted.toSeq
      assert(ranks == (1L to ranks.length))
    }
  }

  test("profile reports nulls, distincts and bounds per column") {
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("c")))
      .toDF("id", "s")
    val out = Quality.profile(df, Seq("id", "s"))
      .as[(String, Long, Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out("id") == (0L, 3L, "1", "3"))
    assert(out("s") == (1L, 2L, "a", "c"))
  }
}
