package graft

import graft.operators._
import org.apache.spark.sql.DataFrame

/** Partition-invariance guards: the engine's promise at 100 TB is
  * that results do not depend on how the input happens to be split.
  * Each case runs the operator on a single-partition and a
  * many-partition copy of the same input and requires bit-identical
  * collected results — this is what the DECIMAL-sum / round-before-
  * aggregate / deterministic-ORDER-BY discipline buys. */
class PartitionInvarianceSpec extends SparkSpec {

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  private def invariant(name: String)(op: DataFrame => DataFrame)(input: DataFrame): Unit = {
    val one = rows(op(input.coalesce(1)))
    val many = rows(op(input.repartition(7)))
    assert(one == many, s"$name differs across partitionings")
    assert(one.nonEmpty, s"$name returned nothing")
  }

  test("anomaly z-scores are partition-invariant (decimal moments)") {
    invariant("anomalies")(Events.anomalies(_))(Tables.events(spark, sf))
  }

  test("bm25 scores are partition-invariant (decimal term sums)") {
    invariant("bm25")(Ranking.bm25TopK(_))(Tables.documents(spark, sf))
  }

  test("rerank is partition-invariant (rounded blend over bounded candidates)") {
    val emb = Tables.embeddings(spark, sf)
    invariant("rerank")(d => Ranking.rerankTopK(d, emb))(Tables.documents(spark, sf))
  }

  test("lloyd update is partition-invariant (per-dim decimal means)") {
    invariant("lloyd")(Similarity.lloydUpdate(_))(Tables.embeddings(spark, sf))
  }

  test("sequence packing is partition-invariant (windowed cumsum)") {
    invariant("pack")(df => Chunker.packSequences(Medallion.pipeline(df)))(
      Tables.documents(spark, sf))
  }

  test("minhash pairs are partition-invariant (hash-derived signatures)") {
    invariant("minhash")(Dedup.minhashLshPairs(_))(
      Tables.documents(spark, "/root/testdata/sf0.01"))
  }

  test("hash sampling is partition-invariant (key-pure predicate)") {
    invariant("sample")(d => Sampling.hashSample(d, 20).orderBy("doc_id"))(
      Tables.documents(spark, sf))
  }

  test("char entropy is partition-invariant (rounded-term decimal sums)") {
    invariant("entropy")(Quality.charEntropy(_))(Tables.documents(spark, sf))
  }

  test("cohort retention is partition-invariant") {
    invariant("retention")(Events.retention(_))(Tables.events(spark, sf))
  }

  test("pq codes and scores are partition-invariant (rounded argmin + decimal ADC)") {
    invariant("pq")(Similarity.pqTopK(_))(Tables.embeddings(spark, sf))
  }

  test("hybrid RRF fusion is partition-invariant (decimal rrf terms)") {
    invariant("hybrid")(d => Ranking.hybridTopK(
      Tables.documents(spark, sf), d))(Tables.embeddings(spark, sf))
  }

  test("temperature rates are partition-invariant (decimal sqrt-weight denominator)") {
    invariant("temperature")(Sampling.temperatureMixture(_))(
      Tables.documents(spark, sf))
  }

  test("line dedup is partition-invariant (global counts + ordered reassembly)") {
    invariant("lines")(Dedup.lineDedup(_))(Tables.documents(spark, sf))
  }

  test("markov transitions are partition-invariant (integer quotients)") {
    invariant("markov")(Events.transitions(_))(Tables.events(spark, sf))
  }

  test("moving average is partition-invariant (decimal frame sums)") {
    invariant("movavg")(Analytics.movingAvgOf(_))(Tables.events(spark, sf))
  }

  test("unigram cross-entropy is partition-invariant (rounded-term decimal sums)") {
    invariant("unigram")(Quality.unigramCrossEntropy(_))(Tables.documents(spark, sf))
  }

  test("repeated n-gram stats are partition-invariant (integer df counts)") {
    invariant("ngram-rep")(Dedup.repeatedNgramStats(_))(Tables.documents(spark, sf))
  }

  test("containment pairs are partition-invariant (exact set intersections)") {
    invariant("containment")(Dedup.containmentPairs(_, tau = 0.1))(
      Tables.documents(spark, "/root/testdata/sf0.01"))
  }

  test("dsir weights are partition-invariant (integer-ratio models, decimal sums)") {
    invariant("dsir")(Sampling.importanceWeights(_))(Tables.documents(spark, sf))
  }

  test("rfm bands are partition-invariant (exact percentile boundaries)") {
    invariant("rfm")(Events.rfmScores(_))(Tables.events(spark, sf))
  }

  test("int8 quantization is partition-invariant (exact min/max + floor codes)") {
    invariant("int8")(Similarity.quantizeInt8(_))(Tables.embeddings(spark, sf))
  }

  test("refine top-k is partition-invariant (rounded cosine rescoring)") {
    invariant("refine")(Similarity.refineTopK(_))(Tables.embeddings(spark, sf))
  }

  test("bigram LM is partition-invariant (rounded-term decimal sums)") {
    invariant("bigram")(Quality.bigramCrossEntropy(_))(Tables.documents(spark, sf))
  }

  test("k-center traversal is partition-invariant (scaled-long argmax)") {
    invariant("kcenter")(Similarity.kCenterCoreset(_))(Tables.embeddings(spark, sf))
  }

  test("mmr selection is partition-invariant (integer scores)") {
    invariant("mmr")(Similarity.mmrTopK(_))(Tables.embeddings(spark, sf))
  }

  test("context packing is partition-invariant (ranked prefix sums)") {
    invariant("ctxpack")(Ranking.contextPack(Tables.documents(spark, sf), _))(
      Tables.embeddings(spark, sf))
  }

  test("shard assignment is partition-invariant (hash-order integer cuts)") {
    invariant("shard")(Sampling.shardAssign(_))(Tables.documents(spark, sf))
  }

  test("curation funnel is partition-invariant (flag sums)") {
    invariant("funnel")(Curation.funnel(_))(Tables.documents(spark, sf))
  }

  test("upsert is partition-invariant (key-unique sides)") {
    invariant("upsert") { d =>
      val docs = d.select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"),
        org.apache.spark.sql.functions.col("source"))
      val upd = docs.where("doc_id % 7 = 0")
        .withColumn("text", org.apache.spark.sql.functions.upper(
          org.apache.spark.sql.functions.col("text")))
      Medallion.upsertByKey(docs, upd).orderBy("doc_id")
    }(Tables.documents(spark, sf))
  }

  test("substring runs are partition-invariant (per-doc islands)") {
    invariant("substrings")(Dedup.substringRuns(_))(Tables.documents(spark, sf))
  }

  test("cms heavy hitters are partition-invariant (md5 buckets, integer cells)") {
    invariant("cms")(Sketches.cmsHeavyHitters(_))(Tables.events(spark, sf))
  }

  test("jl projection top-k is partition-invariant (rounded sketch cosines)") {
    invariant("jl")(Similarity.jlTopK(_))(Tables.embeddings(spark, sf))
  }

  test("balanced sampling is partition-invariant (hash ranks)") {
    invariant("balanced")(Sampling.balancedClasses(_))(Tables.documents(spark, sf))
  }

  test("rake keywords are partition-invariant (decimal word-score sums)") {
    invariant("rake")(Quality.rakeKeywords(_))(Tables.documents(spark, sf))
  }

  test("centroid shift is partition-invariant (decimal per-dim sums)") {
    invariant("centroid-shift")(Similarity.centroidShift(_))(Tables.embeddings(spark, sf))
  }

  test("query likelihood is partition-invariant (decimal term sums)") {
    invariant("qlm")(Ranking.queryLikelihoodTopK(_))(Tables.documents(spark, sf))
  }

  test("whitened projections are partition-invariant (decimal RMS, model collects)") {
    invariant("whitening")(Similarity.whitenedProjection(_))(Tables.embeddings(spark, sf))
  }

  test("int8 dequantized top-k is partition-invariant (exact min/max stats)") {
    invariant("int8")(Similarity.int8TopK(_))(Tables.embeddings(spark, sf))
  }

  test("binary Hamming top-k is partition-invariant and equals the per-dim sign count") {
    val emb = Tables.embeddings(spark, sf)
    invariant("binary")(Similarity.binaryTopK(_))(emb)
    // packed-word bit_count(xor) == the definitional count of dims
    // whose sign verdicts differ, for every reported pair
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val rows = Similarity.binaryTopK(emb).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (q, n, ham) = (r.getLong(0), r.getLong(1), r.getLong(3))
      val want = vecs(q).zip(vecs(n)).count { case (a, b) => (a > 0) != (b > 0) }
      assert(ham == want, s"query $q neighbor $n")
    }
  }

  test("binary refine is partition-invariant; every refined sim is the exact cosine") {
    val emb = Tables.embeddings(spark, sf)
    invariant("binary-refine")(Similarity.binaryRefineTopK(_))(emb)
    // the rerank contract: reported sims are full-precision cosines,
    // so they must agree with the brute scorer wherever both report
    val brute = Similarity.bruteTopK(emb, nQueries = 5, k = 50).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    Similarity.binaryRefineTopK(emb).collect().foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      brute.get(key).foreach(exact =>
        assert(r.getDouble(3) == exact, s"sim mismatch at $key"))
    }
  }

  test("minhash estimation report is partition-invariant") {
    invariant("minhash-est")(Dedup.minhashEstimation(_))(
      Tables.documents(spark, "/root/testdata/sf0.01"))
  }

  test("bootstrap replicate histogram is partition-invariant (seedless md5 draws)") {
    invariant("bootstrap")(Sampling.bootstrapCounts(_))(Tables.documents(spark, sf))
  }

  test("mmr re-ranking is partition-invariant (driver greedy over rounded sims)") {
    invariant("mmr")(Similarity.mmrTopK(_))(Tables.embeddings(spark, sf))
  }
}
