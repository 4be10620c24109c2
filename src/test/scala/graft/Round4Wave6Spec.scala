package graft

import graft.operators.{Events, Quality, Similarity}
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

  test("collocations: a planted glued pair dominates by PMI") {
    // "quantum entanglement" always adjacent; filler words everywhere
    val filler = "one two three four five six seven eight nine ten"
    val syn = (1L to 10L).map(i => (i, s"$filler quantum entanglement $filler"))
      .toDF("doc_id", "text")
    val top = Quality.collocations(syn, minCount = 5)
      .as[(String, String, Long, Double)].collect()
    assert(top.head._1 == "quantum" && top.head._2 == "entanglement")
    // PMI of an always-together pair ~ ln(N / c) > any filler pair
    assert(top.head._4 > top(1)._4)
  }

  test("sample coverage: sampling keeps a subset of vocab and token mass") {
    val r = Quality.sampleCoverage(Tables.documents(spark, sf))
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(r._2 <= r._1 && r._5 <= r._4)
    assert(r._3 > 0 && r._3 <= 1000000 && r._6 > 0 && r._6 <= 1000000)
    // coverage of vocab (types) exceeds coverage of nothing and the
    // sample is ~10% of mass, so token share lands well under vocab share
    assert(r._3 >= r._6, "type coverage should exceed token-mass share at 10%")
  }

  test("pareto: decile shares sum to ~1e6 and decile 1 dominates decile 10") {
    val out = Events.paretoShare(Tables.events(spark, sf))
      .as[(Long, Long, Long, Long)].collect()
    assert(out.map(_._1).toSeq == (1L to 10L))
    val tot = out.map(_._4).sum
    assert(tot > 999990 && tot <= 1000000)
    assert(out.head._3 >= out.last._3)
  }

  test("winnowing: shared runs of w+n-1 tokens guarantee a shared fingerprint") {
    val run = (1 to 8).map(i => s"shared$i").mkString(" ") // 8 ≥ w+n−1 = 8
    val syn = Seq(
      (1L, s"prefix words here $run and a suffix tail"),
      (2L, s"$run with completely different surrounding words instead"),
      (3L, "no overlap in this one at all whatsoever today")).toDF("doc_id", "text")
    val audit = graft.operators.Dedup.winnowingFingerprints(syn)
    assert(audit.where($"n_fps" > $"n_grams").isEmpty)
    assert(audit.where($"n_fps" === 0).isEmpty)
    // the guarantee: docs 1 and 2 share a fingerprint HASH; doc 3 none
    val fps = graft.operators.Dedup.winnowingFingerprintSet(syn)
    def hashes(id: Long) = fps.where($"doc_id" === id)
      .select($"fp_hash").as[Long].collect().toSet
    assert((hashes(1L) & hashes(2L)).nonEmpty)
    assert((hashes(1L) & hashes(3L)).isEmpty)
  }

  test("winnowing matches report the planted near-dup pair, not the stranger") {
    val run = (1 to 20).map(i => s"tok$i").mkString(" ")
    val syn = Seq(
      (1L, s"$run plus some extra trailing words here"),
      (2L, s"different lead-in then $run closing words"),
      (3L, "nothing shared with the others in any way at all")).toDF("doc_id", "text")
    val m = graft.operators.Dedup.winnowingMatches(syn)
      .as[(Long, Long, Long)].collect()
    assert(m.map(r => (r._1, r._2)).toSet == Set((1L, 2L)))
    assert(m.head._3 >= 2)
  }

  test("cms point query reproduces the heavy-hitter estimates from the cell table") {
    import graft.operators.Sketches
    val ev = Tables.events(spark, sf)
    val cells = ev.select($"user_id".as("k"))
      .select($"k", explode(sequence(lit(0), lit(3))).as("r"))
      .select($"r", pmod(graft.functions.HashFunctions.md5Long($"r", $"k"), lit(64)).as("bucket"))
      .groupBy($"r", $"bucket").agg(count(lit(1)).as("c"))
    val hh = Sketches.cmsHeavyHitters(ev)
      .select($"user_id", $"est_n").as[(Long, Long)].collect().toMap
    val est = Sketches.cmsEstimate(cells, ev.select($"user_id").distinct())
      .as[(Long, Long)].collect().toMap
    assert(hh.forall { case (k, v) => est(k) == v })
  }

  test("cms point query on a sparse cell grid: unseen keys estimate 0, not absent") {
    import graft.operators.Sketches
    // two keys fill at most 8 of the 256 cells; a probe key whose
    // cells are all empty must report 0 (missing cell = count 0),
    // not vanish from the output or overestimate from partial cells
    val tiny = Seq(7L, 13L).toDF("user_id")
    val cells = tiny.select($"user_id".as("k"))
      .select($"k", explode(sequence(lit(0), lit(3))).as("r"))
      .select($"r", pmod(graft.functions.HashFunctions.md5Long($"r", $"k"), lit(64)).as("bucket"))
      .groupBy($"r", $"bucket").agg(count(lit(1)).as("c"))
    val probes = Seq(7L, 13L, -99L, 1234567L).toDF("user_id")
    val est = Sketches.cmsEstimate(cells, probes).as[(Long, Long)].collect().toMap
    assert(est.size == 4, s"keys dropped: $est")
    assert(est(7L) == 1L && est(13L) == 1L)
    assert(est(-99L) == 0L && est(1234567L) == 0L, s"unseen keys must be 0: $est")
  }

  test("stationary step: pi1 is a probability vector (sums to ~1)") {
    val out = Events.stationaryStep(Tables.events(spark, sf)).as[(String, Double)].collect()
    val mass = out.map(_._2).sum
    assert(math.abs(mass - 1.0) < 1e-3, s"mass $mass")
    assert(out.forall(_._2 >= 0.0))
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
