package graft

import graft.functions.TextFunctions._
import graft.operators._
import org.apache.spark.sql.functions._

/** Specs for the round-2 curation operators: BM25 ranking, gopher
  * filtering, PII scrubbing, decontamination, hash sampling, range
  * banding, anomaly detection, cluster assignment. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("bm25 ranks the doc with more query-term occurrences higher") {
    val docs = Seq(
      (1L, "spark join spark join spark"),
      (2L, "spark other words here now"),
      (3L, "nothing relevant at all here")).toDF("doc_id", "text")
    val got = Ranking.bm25TopK(docs, Seq("spark", "join"), topK = 10)
      .as[(Long, Double)].collect().toSeq
    assert(got.map(_._1) == Seq(1L, 2L)) // doc 3 scores nothing
    assert(got(0)._2 > got(1)._2)
  }

  test("gopher filter drops short docs and keeps long prose") {
    val long = (1 to 60).map(i => s"word$i").mkString(" ") + " the a of to"
    val docs = Seq((1L, "too short"), (2L, long)).toDF("doc_id", "text")
    val keep = Quality.gopherFilter(docs).select($"doc_id", $"keep")
      .as[(Long, Long)].collect().toMap
    assert(keep(1L) == 0L && keep(2L) == 1L)
  }

  test("pii scrub redacts emails and phones, counts match") {
    val docs = Seq((1L, "mail me at jo.doe+x@site.org or call +1 555-123-4567 ok"))
      .toDF("doc_id", "text")
    val row = docs.select(piiScrub($"text").as("s"),
        piiEmailCount($"text").as("e"), piiPhoneCount($"text").as("p"))
      .as[(String, Long, Long)].head()
    assert(row._1 == "mail me at <EMAIL> or call <PHONE> ok")
    assert(row._2 == 1L && row._3 == 1L)
  }

  test("decontamination flags the doc sharing a 5-gram with the benchmark") {
    val bench = "alpha beta gamma delta epsilon zeta"
    val contaminated = "intro words then alpha beta gamma delta epsilon end"
    val clean = "totally different content with many other tokens inside"
    val docs = Seq((0L, bench), (25L, contaminated), (30L, clean)).toDF("doc_id", "text")
    val got = Decontam.flagContaminated(docs, benchmarkMaxId = 20)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((25L, 1L))) // "alpha beta gamma delta epsilon" is shared
  }

  test("hash sampling is deterministic and roughly proportional") {
    val docs = spark.range(1000).select($"id".as("doc_id"))
    val a = Sampling.hashSample(docs, 20).count()
    val b = Sampling.hashSample(docs, 20).count()
    assert(a == b && a > 120 && a < 280)
    assert(Sampling.uniformN(docs, 50).count() == 50)
  }

  test("value bands partition all events exactly once") {
    val bands = Analytics.valueBands(spark, sf)
    val total = bands.agg(sum($"n_events")).as[Long].head()
    assert(total == Tables.events(spark, sf).count())
  }

  test("anomalies are symmetric-tail outliers with |z| > 3") {
    val out = Events.anomalies(Tables.events(spark, sf))
    val zs = out.select($"z").as[Double].collect()
    assert(zs.nonEmpty && zs.forall(z => math.abs(z) > 3.0))
  }

  test("near-dup clustering assigns the component minimum as representative") {
    val pairs = Seq((1L, 2L), (2L, 5L), (7L, 9L)).toDF("id_a", "id_b")
    val got = Dedup.nearDupClusters(pairs).as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L), (2L, 1L), (5L, 1L), (7L, 7L), (9L, 7L)))
  }

  test("near-dup clustering converges on a chain (diameter > 1)") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("id_a", "id_b")
    val labels = Dedup.nearDupClusters(chain).select($"cluster_id").as[Long].collect().toSet
    assert(labels == Set(1L))
  }

  test("sequence packing conserves tokens and respects block budget") {
    val chunks = Medallion.pipeline(Tables.documents(spark, sf))
    val packed = Chunker.packSequences(chunks)
    val packedTokens = packed.agg(sum($"n_tokens")).as[Long].head()
    val directTokens = chunks.select(tokenCount($"chunk").as("t"))
      .agg(sum($"t")).as[Long].head()
    assert(packedTokens == directTokens)
    // every block except possibly the last per source holds ≥ 512 tokens
    // minus at most one chunk's worth of spill; block ids are dense from 0
    val bySource = packed.select($"source", $"block_id").as[(String, Long)]
      .collect().groupBy(_._1).values
    bySource.foreach { blocks =>
      val ids = blocks.map(_._2).sorted.toSeq
      assert(ids == (0L until ids.length.toLong))
    }
  }

  test("split assignment is exhaustive and deterministic") {
    val docs = Tables.documents(spark, sf)
    val a = Sampling.splitAssign(docs).groupBy($"split").count()
      .as[(String, Long)].collect().toMap
    assert(a.keySet == Set("train", "val", "test"))
    assert(a.values.sum == docs.count())
    assert(a("train") > a("val") && a("train") > a("test"))
  }

  test("lloyd update emits one centroid value per (cell, dim)") {
    val up = Similarity.lloydUpdate(Tables.embeddings(spark, sf))
    val rows = up.as[(Long, Long, Double)].collect()
    assert(rows.length == 16 * 64)
    assert(rows.forall { case (_, _, c) => !c.isNaN && math.abs(c) < 10 })
    // a fitted centroid is a true mean: dims covered exactly 1..64 per cell
    val dims = rows.groupBy(_._1).values.map(_.map(_._2).sorted.toSeq)
    assert(dims.forall(_ == (1L to 64L)))
  }

  test("tfidf top terms are ranked descending within each doc") {
    val tt = Ranking.tfidfTopTerms(Tables.documents(spark, sf))
    val byDoc = tt.as[(Long, Long, String, Double)].collect().groupBy(_._1)
    assert(byDoc.nonEmpty)
    byDoc.values.foreach { rs =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length.toLong))
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._4 > b._4 || (a._4 == b._4 && a._3 < b._3)
        case _ => true
      })
    }
  }

  test("duplicate rows returns every copy of duplicated content") {
    val docs = Seq((1L, "x", "a"), (2L, "x", "a"), (3L, "y", "b"))
      .toDF("doc_id", "text", "source")
    val got = Quality.duplicateRows(docs)
      .select($"doc_id", $"n_copies").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (2L, 2L)))
  }

  test("funnel stages shrink monotonically") {
    val (v, c, p) = Events.funnel(Tables.events(spark, sf))
      .as[(Long, Long, Long)].head()
    assert(v >= c && c >= p && v > 0)
  }

  test("retention day-0 covers every cohort user exactly once") {
    val ret = Events.retention(Tables.events(spark, sf))
    val day0 = ret.where($"day_off" === 0L).agg(sum($"n_users")).as[Long].head()
    val users = Tables.events(spark, sf).select($"user_id").distinct().count()
    assert(day0 == users) // first-seen day is day 0 for every user
  }

  test("fitted centroids are complete, normalized-length vectors") {
    val cents = Similarity.fittedCentroids(Tables.embeddings(spark, sf))
      .select($"cell", size($"cv").as("d"), $"cnrm")
      .as[(Long, Int, Double)].collect().toSeq
    assert(cents.map(_._1).sorted == (0L until 16L))
    assert(cents.forall(_._2 == 64))
    assert(cents.forall(c => c._3 > 0 && !c._3.isNaN))
  }

  test("trained IVF returns a full ranked top-k per query") {
    val got = Similarity.ivfTopKFitted(Tables.embeddings(spark, sf))
      .select($"query_id", $"rank").as[(Long, Long)].collect().toSeq
    val byQ = got.groupBy(_._1)
    assert(byQ.keySet == (0L until 5L).toSet)
    byQ.values.foreach(rs => assert(rs.map(_._2).sorted.toSeq == (1L to 10L)))
  }

  test("cluster assignment covers every vector exactly once") {
    val emb = Tables.embeddings(spark, sf)
    val sizes = Similarity.clusterSizes(emb)
    assert(sizes.agg(sum($"n_members")).as[Long].head() == emb.count())
    assert(sizes.select($"cell").as[Long].collect().toSet.subsetOf((0L until 16L).toSet))
  }
}
