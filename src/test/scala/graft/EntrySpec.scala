package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class EntrySpec extends SparkSpec {
  import spark.implicits._

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every query runs at sf0.001 and most return rows") {
    // round 15 (suite budget): queries with no shared on-disk zone or
    // session-conf scope are independent jobs — overlap them from a
    // small thread pool (guide §2.6) so this sweep stops serializing
    // ~300 sub-second jobs. Zone-building (pipe_*, ann_*) and
    // conf-scoped streaming families stay strictly serial: ZoneCache
    // markers and withStreamShuffle are serial-only contracts.
    val serialPrefixes = Seq("pipe_", "stream_", "ann_")
    val (serialQ, pooledQ) = SparkEntry.queries.toSeq.sortBy(_._1)
      .partition { case (n, _) => serialPrefixes.exists(n.startsWith) }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val futs = pooledQ.map { case (name, fn) =>
      scala.concurrent.Future(name -> fn(spark, sf).count())
    }
    val counts = serialQ.map { case (name, fn) => name -> fn(spark, sf).count() } ++
      futs.map(scala.concurrent.Await.result(_, scala.concurrent.duration.Duration(600, "s")))
    pool.shutdown()
    val empties = counts.collect { case (name, 0L) => name }
    // near-dup/similarity thresholds may legitimately find nothing in
    // the tiny sf0.001 corpus; everything else must produce rows
    val allowedEmpty = Set("dedup_ngram_jaccard", "dedup_minhash_lsh",
      "dedup_simhash", "dedup_embedding", "dedup_embedding_lsh",
      "dedup_clusters", "txt_decontaminate", "dq_duplicate_rows")
    assert((empties.toSet -- allowedEmpty).isEmpty,
      s"unexpectedly empty: ${empties.toSet -- allowedEmpty}")
  }

  test("corpus is pure ASCII (mm oracles index chars as bytes)") {
    // the mm_frame_sample / mm_feature_hist oracles use
    // ascii(substr(text, i, 1)) at BYTE offsets, valid only while
    // chars == bytes; if the generator ever emits multi-byte text
    // this fails loudly instead of a silent oracle divergence
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { d =>
      val nonAscii = Tables.documents(spark, d)
        .where(octet_length($"text") =!= length($"text")).count()
      assert(nonAscii == 0, s"non-ASCII docs in $d")
    }
  }

  test("multimodal feature extraction histograms sum to byte length") {
    val media = Multimodal.withBinaryPayload(Tables.documents(spark, sf).limit(5))
    val feats = Multimodal.extractFeatures(media)
    val check = feats.join(media.select($"doc_id", $"byte_len"), "doc_id")
      .select($"byte_len", aggregate($"features", lit(0L), (a, x) => a + x).as("histsum"))
      .as[(Long, Long)].collect()
    assert(check.nonEmpty && check.forall { case (bl, hs) => bl == hs })
  }

  test("frame sampling offsets stride the payload") {
    val media = Multimodal.withBinaryPayload(Tables.documents(spark, sf).limit(1))
    val offs = Multimodal.sampleFrames(media, stride = 64)
      .select($"offset").as[Long].collect().toSeq
    assert(offs == offs.sorted && offs.forall(_ % 64 == 0))
  }
}
