package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Unit coverage for the round-4 operators — semantic assertions the
  * oracle hash compare can't express (frame boundaries, zero-order
  * inclusion, quantization range, threshold membership). */
class Round4Spec extends SparkSpec {
  import spark.implicits._

  test("moving average frame never exceeds its width and matches a hand check") {
    val out = Analytics.movingAvg(spark, sf, frame = 5)
    assert(out.where($"n_in_frame" > 5 || $"n_in_frame" < 1).isEmpty)
    // the first event per user averages only itself
    val firsts = out.where($"n_in_frame" === 1)
      .where(abs($"mov_avg" - $"value") > 1e-9)
    assert(firsts.isEmpty)
  }

  test("customer order distribution includes zero-order customers and conserves mass") {
    val dist = Analytics.custOrderDistribution(spark, sf)
      .as[(Long, Long)].collect().toMap
    val nCust = Tables.customer(spark, sf).count()
    assert(dist.values.sum == nCust)
    // the test corpus has no inactive customers; pin the left-join
    // inclusion (the whole point of Q13) synthetically
    val c = Seq(1L, 2L, 3L).toDF("c_custkey")
    val o = Seq((1L, 10L), (1L, 11L), (2L, 12L)).toDF("o_custkey", "o_orderkey")
    val syn = Analytics.custOrderDist(c, o).as[(Long, Long)].collect().toMap
    assert(syn == Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("order-priority late counts are bounded by the window's order counts") {
    val late = Analytics.orderPriorityLate(spark, sf).as[(String, Long)].collect().toMap
    val all = Tables.orders(spark, sf)
      .where($"o_orderdate" >= lit("1997-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-07-01").cast("timestamp"))
      .groupBy($"o_orderpriority").count().as[(String, Long)].collect().toMap
    assert(late.nonEmpty)
    late.foreach { case (p, n) => assert(n <= all(p), s"$p: $n > ${all(p)}") }
  }

  test("small-qty revenue selects a strict subset of lineitems") {
    val Array((nSmall, rev)) =
      Analytics.smallQtyRevenue(spark, sf).as[(Long, Double)].collect()
    val nAll = Tables.lineitem(spark, sf).count()
    assert(nSmall > 0 && nSmall < nAll)
    assert(rev > 0)
  }

  test("int8 quantization codes stay in [0,255] and reconstruction error is small") {
    val coded = Similarity.quantizeInt8(Tables.embeddings(spark, sf))
    // sum over 64 dims of codes in [0,255]
    assert(coded.where($"sum_code" < 0 || $"sum_code" > 255L * 64).isEmpty)
    // embeddings are ~[-1,1]: per-dim step ≈ 2/255, so per-vector
    // squared error ⪅ 64 · (step/2)² ≈ 1e-3 — generous bound 0.01
    assert(coded.where($"sq_err" > 0.01).isEmpty)
  }

  test("norm stats count zero-norm vectors exactly") {
    val emb = Seq(
      (0L, Array.fill(64)(0.0f), 1L),
      (1L, Array.fill(64)(0.5f), 1L),
      (2L, Array.fill(64)(1.0f), 2L)).toDF("vec_id", "embedding", "label")
    val out = Similarity.normStats(emb)
      .select($"label", $"n_vecs", $"n_zero").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 2L, 1L), (2L, 1L, 0L)))
  }

  test("containment catches a doc embedded in a larger one that jaccard misses") {
    val small = "alpha beta gamma delta epsilon zeta eta theta"
    val big = small + " " + (1 to 60).map(i => s"filler$i word$i").mkString(" ")
    val docs = Seq((1L, small), (2L, big)).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs, tau = 0.9)
      .as[(Long, Long, Double, Double)].collect()
    assert(cont.length == 1)
    val (a, b, cab, cba) = cont.head
    assert((a, b) == (1L, 2L))
    assert(cab == 1.0, "small doc fully contained")
    assert(cba < 0.2, "container barely covered")
    // symmetric jaccard at the same threshold finds nothing
    assert(Dedup.ngramJaccardPairs(docs, tau = 0.9).isEmpty)
  }

  test("repeated n-gram fraction flags cross-doc repetition only") {
    val shared = "one two three four five six seven eight"
    val docs = Seq(
      (1L, shared + " unique tail for doc one goes here now"),
      (2L, shared + " different ending text for doc two here"),
      (3L, "entirely fresh words nine ten eleven twelve thirteen fourteen")).toDF("doc_id", "text")
    val out = Dedup.repeatedNgramStats(docs, n = 8)
      .select($"doc_id", $"n_repeated").as[(Long, Long)].collect().toMap
    assert(out(1L) >= 1 && out(2L) >= 1, "shared leading 8-gram not counted")
    assert(out(3L) == 0, "unique doc wrongly flagged")
  }

  test("unigram cross-entropy ranks boilerplate below rare text") {
    val boiler = "the the the the the the the the the the"
    val docs = Seq(
      (1L, boiler), (2L, boiler), (3L, boiler),
      (4L, "quixotic zephyrs vex jumbled gnomes wafting banal proxies")).toDF("doc_id", "text")
    val ce = Quality.unigramCrossEntropy(docs)
      .select($"doc_id", $"cross_entropy").as[(Long, Option[Double])].collect().toMap
    assert(ce(1L).get < ce(4L).get, "repeated boilerplate should be less surprising")
    val empty = Quality.unigramCrossEntropy(Seq((1L, "  ")).toDF("doc_id", "text"))
      .select($"n_tokens", $"cross_entropy").as[(Long, Option[Double])].collect().head
    assert(empty == ((0L, None)))
  }

  test("frame energy splits payloads into exact 256-byte frames") {
    val media = graft.multimodal.Multimodal.withBinaryPayload(
      Seq((1L, "ab" * 300)).toDF("doc_id", "text")) // 600 bytes
    val out = graft.multimodal.Multimodal.frameEnergy(media)
      .select($"frame_idx", $"n_bytes", $"energy").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(out.map(_._2).toSeq == Seq(256L, 256L, 88L))
    val ab = 'a'.toLong + 'b'.toLong
    assert(out(0)._3 == 128 * ab && out(2)._3 == 44 * ab)
  }

  test("refine stage never hurts recall vs raw PQ at equal candidates") {
    val emb = Tables.embeddings(spark, sf)
    val exact = Similarity.bruteTopK(emb)
    def recall(df: org.apache.spark.sql.DataFrame): Double =
      Similarity.recallAtK(df, exact).select($"avg_recall").as[Double].head()
    val pq = recall(Similarity.pqTopK(emb, nQueries = 5, k = 10))
    val refined = recall(Similarity.refineTopK(emb, nQueries = 5, k = 10))
    assert(refined >= pq, s"refine $refined < pq $pq")
  }

  test("rfm bands stay in range and every quartile is populated") {
    val rfm = Events.rfmScores(Tables.events(spark, sf))
    assert(rfm.where($"r_score" < 1 || $"r_score" > 4 ||
      $"f_score" < 1 || $"f_score" > 4 || $"m_score" < 1 || $"m_score" > 4).isEmpty)
    assert(rfm.where($"rfm_code" =!=
      $"r_score" * 100 + $"f_score" * 10 + $"m_score").isEmpty)
    // quartile banding over >100 users must populate all 4 f-bands
    assert(rfm.select($"f_score").distinct().count() == 4)
  }

  test("dsir importance weights rank target-domain docs above the rest") {
    val iw = Sampling.importanceWeights(Tables.documents(spark, sf), "src0")
    val byTarget = iw.where($"n_tokens" > 0)
      .groupBy(($"source" === "src0").as("is_target"))
      .agg(avg($"avg_llr").as("m")).as[(Boolean, Double)].collect().toMap
    assert(byTarget(true) > byTarget(false),
      s"target mean ${byTarget(true)} not above rest ${byTarget(false)}")
  }

  test("supplier shares sum to one within every nation") {
    val sums = Analytics.supplierShare(spark, sf)
      .groupBy($"n_name").agg(sum($"nation_share").as("s"), max($"nation_rank").as("n"))
      .as[(String, Double, Long)].collect()
    assert(sums.nonEmpty)
    sums.foreach { case (nat, s, _) =>
      assert(math.abs(s - 1.0) < 1e-9, s"$nat shares sum to $s") }
  }

  test("yoy growth matches its own revenue columns and starts null") {
    val g = Analytics.yoyGrowth(spark, sf)
    val bad = g.where($"prev_revenue".isNotNull &&
      abs($"yoy_growth" - ($"revenue" - $"prev_revenue") / $"prev_revenue") > 1e-12)
    assert(bad.isEmpty)
    // exactly one NULL-growth row (the first year) per segment
    val firsts = g.where($"yoy_growth".isNull)
      .groupBy($"c_mktsegment").count().as[(String, Long)].collect()
    assert(firsts.nonEmpty && firsts.forall(_._2 == 1L))
  }

  test("matryoshka truncation at full width degenerates to exact brute force") {
    val emb = Tables.embeddings(spark, sf)
    val full = Similarity.truncatedTopK(emb, dims = 64)
    val brute = Similarity.bruteTopK(emb)
    assert(full.exceptAll(brute).isEmpty && brute.exceptAll(full).isEmpty)
    val r = Similarity.recallAtK(Similarity.truncatedTopK(emb), brute)
      .select($"avg_recall").as[Double].head()
    assert(r >= 0.0 && r <= 1.0)
  }

  test("mmr starts at the most relevant doc and diversifies the tail") {
    val emb = Tables.embeddings(spark, sf)
    val mmr = Similarity.mmrTopK(emb)
    val brute = Similarity.bruteTopK(emb)
    // step 1 has no penalty: it must equal brute-force rank 1
    val m1 = mmr.where($"rank" === 1).select($"query_id", $"neighbor_id")
      .as[(Long, Long)].collect().toSet
    val b1 = brute.where($"rank" === 1).select($"query_id", $"neighbor_id")
      .as[(Long, Long)].collect().toSet
    assert(m1 == b1)
    // k distinct picks per query
    val dup = mmr.groupBy($"query_id", $"neighbor_id").count().where($"count" > 1)
    assert(dup.isEmpty)
    assert(mmr.groupBy($"query_id").count().as[(Long, Long)].collect().forall(_._2 == 10))
  }

  test("token histogram buckets are exact powers of two") {
    val h = Quality.tokenHistogram(Tables.documents(spark, sf))
      .as[(Long, Long, Long, Long)].collect()
    assert(h.nonEmpty)
    h.filter(_._1 >= 0).foreach { case (bucket, _, mn, mx) =>
      assert(mn >= (1L << bucket) && mx < (1L << (bucket + 1)),
        s"bucket $bucket holds [$mn,$mx]")
    }
    assert(h.map(_._2).sum == Tables.documents(spark, sf).count())
  }

  test("inactivity gaps are positive and bounded by the user's own span") {
    val g = Events.inactivityGaps(Tables.events(spark, sf))
    assert(g.where($"max_gap_us" < 0 || $"avg_gap_us" > $"max_gap_us").isEmpty)
    assert(g.where($"n_gaps" =!= $"n_events" - 1).isEmpty)
  }

  test("nation trade matrix conserves total lineitem revenue") {
    val m = Analytics.nationTradeMatrix(spark, sf)
    val total = m.agg(sum($"n_lineitems")).as[Long].head()
    assert(total == Tables.lineitem(spark, sf).count(),
      "every lineitem must land in exactly one matrix cell")
  }

  test("streaming line-clean gate equals the batch cleaner on the same corpus") {
    val docs = Seq(
      (1L, "HEADER\nalpha\nFOOTER"),
      (2L, "HEADER\nbeta\nFOOTER"),
      (3L, "HEADER\ngamma\nFOOTER"),
      (4L, "delta only")).toDF("doc_id", "text")
    val hot = Dedup.hotLines(docs, cap = 3)
    val tmp = java.nio.file.Files.createTempDirectory("graft_lclean").toString
    docs.write.mode("overwrite").parquet(s"$tmp/in")
    val st = spark.readStream.schema(docs.schema).parquet(s"$tmp/in")
    val q = graft.streaming.StreamingCuration.lineCleanStream(st, hot)
      .select($"doc_id", $"clean_text")
      .writeStream.outputMode("append").format("memory").queryName("lclean").start()
    val got = try {
      q.processAllAvailable()
      spark.table("lclean").as[(Long, String)].collect().toMap
    } finally q.stop()
    val want = Dedup.lineDedup(docs, cap = 3)
      .select($"doc_id", $"clean_text").as[(Long, String)].collect().toMap
    assert(got == want)
  }

  test("curation funnel is monotone and consistent with its standalone stages") {
    val docs = Tables.documents(spark, sf)
    val f = Curation.funnel(docs)
      .select($"stage", $"n_docs").as[(Long, Long)].collect().sortBy(_._1).map(_._2)
    assert(f.length == 5)
    f.sliding(2).foreach { case Array(a, b) => assert(b <= a, s"funnel grew: $a -> $b") }
    // stage 1 must equal the standalone language-ID 'en' count
    import graft.functions.TextFunctions.langId
    val en = docs.where(langId($"text") === "en").count()
    assert(f(1) == en)
  }

  test("last-touch attribution credits the right click and respects the window") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(h: Long) = new java.sql.Timestamp(t0.getTime + h * 3600000L)
    val ev = Seq(
      (1L, ts(0), 7L, "click", 0.0),    // credited for purchase at h=2
      (2L, ts(1), 7L, "click", 0.0),    // more recent → wins
      (3L, ts(2), 7L, "purchase", 9.0),
      (4L, ts(40), 7L, "purchase", 9.0), // 39h after last click → null
      (5L, ts(5), 8L, "purchase", 9.0)   // user 8 never clicked → null
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.lastTouchAttribution(ev)
      .select($"event_id", $"attributed_click_id").as[(Long, Option[Long])]
      .collect().toMap
    assert(out == Map(3L -> Some(2L), 4L -> None, 5L -> None))
    // corpus-wide: delay is never negative nor beyond the horizon
    val all = Events.lastTouchAttribution(Tables.events(spark, sf))
    assert(all.where($"delay_us" < 0 || $"delay_us" > 24L * 3600 * 1000000).isEmpty)
  }

  test("stateful streaming moving average equals the batch window across micro-batches") {
    import graft.streaming.StreamingEvents.Ev
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 12:00:00")
    def ts(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val tmp = java.nio.file.Files.createTempDirectory("graft_mavg").toString
    val enc = implicitly[org.apache.spark.sql.Encoder[Ev]]
    def land(evs: Seq[Ev], name: String): Unit = {
      val stage = s"$tmp/stage_$name"
      evs.toDS().coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles
        .find(_.getName.endsWith(".parquet")).get.toPath
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$tmp/in"))
      java.nio.file.Files.copy(part, java.nio.file.Paths.get(s"$tmp/in/$name.parquet"))
    }
    val b1 = (1 to 6).map(i => Ev(i.toLong, ts(i), 7L, i * 1.111))
    val b2 = (7 to 12).map(i => Ev(i.toLong, ts(i), 7L, i * 1.111))
    land(b1, "b1")
    val st = spark.readStream.schema(enc.schema).parquet(s"$tmp/in").as[Ev]
    val q = graft.streaming.StreamingEvents.movingAvgStateful(st).writeStream
      .outputMode("append").format("memory").queryName("mavg").start()
    val got = try {
      q.processAllAvailable()
      land(b2, "b2") // frame must carry over the batch boundary
      q.processAllAvailable()
      spark.table("mavg")
        .select($"event_id", $"mov_avg", $"n_in_frame")
        .as[(Long, Double, Long)].collect().toSeq.sortBy(_._1)
    } finally q.stop()
    val batch = Analytics.movingAvgOf((b1 ++ b2).toDS()
        .select($"user_id", $"event_id", $"ts", $"value"))
      .select($"event_id", $"mov_avg", $"n_in_frame")
      .as[(Long, Double, Long)].collect().toSeq.sortBy(_._1)
    assert(got == batch)
  }

  test("k-center picks are distinct and the coverage radius never grows") {
    val ks = Similarity.kCenterCoreset(Tables.embeddings(spark, sf))
      .select($"vec_id", $"rank", $"radius_sq")
      .as[(Long, Long, Option[Double])].collect().sortBy(_._2)
    assert(ks.length == 10 && ks.map(_._1).distinct.length == 10)
    assert(ks.head._2 == 1L && ks.head._3.isEmpty, "seed is rank 1 with null radius")
    val radii = ks.flatMap(_._3)
    radii.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a + 1e-12, s"maximin radius grew: $a -> $b") }
  }

  test("chunk audit passes the real pipeline and catches a broken stride") {
    val gold = Medallion.pipeline(Tables.documents(spark, sf))
    val ok = Chunker.overlapAudit(gold)
    assert(ok.where($"n_overlap_viol" > 0 || $"n_oversize" > 0).isEmpty,
      "the real pipeline must satisfy its own overlap contract")
    // re-chunk with a different stride, audit with the default: the
    // contract breaks and the audit must say so
    val broken = Chunker.fixedStride(
      Medallion.silverDedup(Medallion.silverNormalize(Medallion.bronze(
        Tables.documents(spark, sf)))), "content", size = 200, overlap = 40)
    assert(Chunker.overlapAudit(broken).where($"n_overlap_viol" > 0).count() > 0)
  }

  test("hash split shows no material length drift between train and test") {
    val drift = SparkEntry.queries("samp_split_drift")(spark, "/root/testdata/sf0.01")
    val maxGap = drift.agg(max($"gap")).as[Double].head()
    assert(maxGap < 0.15, s"split drift too large: $maxGap")
  }

  test("bigram LM is sharper than unigram on predictable text") {
    // a corpus where bigram context is fully predictive: the bigram
    // model should assign (near-)zero surprise, far below unigram
    val docs = Seq.tabulate(4)(i => (i.toLong, "to be or not to be that is"))
      .toDF("doc_id", "text")
    val bi = Quality.bigramCrossEntropy(docs)
      .agg(avg($"cross_entropy")).as[Double].head()
    val uni = Quality.unigramCrossEntropy(docs)
      .agg(avg($"cross_entropy")).as[Double].head()
    assert(bi < uni, s"bigram $bi should beat unigram $uni on predictable text")
    // single-token docs have no bigrams → NULL entropy
    val one = Quality.bigramCrossEntropy(Seq((1L, "word")).toDF("doc_id", "text"))
      .select($"n_bigrams", $"cross_entropy").as[(Long, Option[Double])].head()
    assert(one == ((0L, None)))
  }

  test("context packing respects the budget and never skips then resumes") {
    val p = Ranking.contextPack(Tables.documents(spark, sf), Tables.embeddings(spark, sf))
    assert(p.where($"cum_tokens" > 150).isEmpty)
    // ranks per query form a contiguous prefix 1..n
    val byQ = p.groupBy($"query_id")
      .agg(max($"rank").as("mx"), count(lit(1)).as("n"))
    assert(byQ.where($"mx" =!= $"n").isEmpty, "packed ranks must be a prefix")
  }

  test("token-balanced shards stay within one max-doc of even mass") {
    val docs = Tables.documents(spark, sf)
    val sh = Sampling.shardAssign(docs, nShards = 8)
      .select($"shard", $"n_tokens").as[(Long, Long)].collect().toMap
    assert(sh.keySet == (0L to 7L).toSet, s"missing shards: ${sh.keySet}")
    val total = sh.values.sum
    val maxDoc = docs.select(max(graft.functions.TextFunctions.tokenCount($"text")))
      .as[Long].head()
    val ideal = total.toDouble / 8
    sh.values.foreach { m =>
      assert(math.abs(m - ideal) <= maxDoc + ideal * 0.01,
        s"shard mass $m vs ideal $ideal (maxDoc $maxDoc)") }
  }

  test("streaming dsir gate equals the batch importance filter") {
    val docs = Tables.documents(spark, sf)
    val model = Sampling.llrModel(docs).localCheckpoint(true)
    val tmp = java.nio.file.Files.createTempDirectory("graft_dsir").toString
    docs.select($"doc_id", $"text").write.mode("overwrite").parquet(s"$tmp/in")
    val st = spark.readStream
      .schema(docs.select($"doc_id", $"text").schema).parquet(s"$tmp/in")
    val q = graft.streaming.StreamingCuration.dsirGate(st, model)
      .select($"doc_id").writeStream
      .outputMode("update").format("memory").queryName("dsir_gate").start()
    val got = try {
      q.processAllAvailable()
      spark.table("dsir_gate").as[Long].collect().toSet
    } finally q.stop()
    val want = Sampling.importanceWeights(docs)
      .where($"n_tokens" > 0 && $"avg_llr" >= 0.0)
      .select($"doc_id").as[Long].collect().toSet
    assert(got == want)
    assert(got.nonEmpty && got.size < docs.count())
  }

  test("dedup survivors never exceed the corpus and drop known near-dups") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val surv = SparkEntry.queries("dedup_survivors")(spark, "/root/testdata/sf0.01")
      .agg(sum($"n_docs")).as[Long].head()
    val total = docs.count()
    val losers = Dedup.nearDupClusters(Dedup.minhashLshPairs(docs))
      .where($"doc_id" =!= $"cluster_id").count()
    assert(surv == total - losers && losers > 0)
  }

  test("cumulative revenue is monotone within each segment") {
    val c = Analytics.monthlyCumRevenue(spark, sf)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"c_mktsegment").orderBy($"month")
    val bad = c.withColumn("prev", lag($"cum_revenue", 1).over(w))
      .where($"prev".isNotNull && $"cum_revenue" < $"prev")
    assert(bad.isEmpty)
  }

  test("js divergence is bounded and zero against itself") {
    val jsd = Quality.jsDivergence(Tables.documents(spark, sf))
      .select($"jsd_nats").as[Double].head()
    assert(jsd >= 0.0 && jsd <= math.log(2) + 1e-9, s"jsd out of range: $jsd")
    val self = Quality.jsDivergence(Tables.documents(spark, sf), "src0", "src0")
      .select($"jsd_nats").as[Double].head()
    assert(math.abs(self) < 1e-9, s"self-divergence should be 0: $self")
  }

  test("zipf fit recovers the -1 slope on a 1/rank corpus") {
    val text = (1 to 60).flatMap(i => Seq.fill(600 / i)(s"w$i")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val slope = Quality.zipfFit(docs).select($"zipf_slope").as[Double].head()
    assert(math.abs(slope - (-1.0)) < 0.1, s"zipf slope $slope should be ~ -1")
    // corpus slope must at least be negative (frequency decreases in rank)
    val corpus = Quality.zipfFit(Tables.documents(spark, sf))
      .select($"zipf_slope").as[Double].head()
    assert(corpus < 0.0)
  }

  test("filtered retrieval only returns corpus matching the metadata filter") {
    val hits = SparkEntry.queries("rag_filtered")(spark, sf)
    assert(hits.where($"source" =!= "src1").isEmpty)
    assert(hits.count() > 0)
    // filtered results are a (re-ranked) subset of the unfiltered search space:
    // every hit must also score in the full store under the same metric
    val emb = Tables.embeddings(spark, sf)
    val all = Similarity.filteredTopK(emb, emb, nQueries = 3, k = 1000)
      .select($"query_id", $"neighbor_id")
    assert(hits.select($"query_id", $"doc_id".as("neighbor_id"))
      .exceptAll(all).isEmpty)
  }

  test("streaming attribution equals the batch carry across micro-batches") {
    import graft.streaming.StreamingEvents.TypedEv
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(h: Long) = new java.sql.Timestamp(t0.getTime + h * 3600000L)
    val tmp = java.nio.file.Files.createTempDirectory("graft_sattr").toString
    val enc = implicitly[org.apache.spark.sql.Encoder[TypedEv]]
    def land(evs: Seq[TypedEv], name: String): Unit = {
      val stage = s"$tmp/stage_$name"
      evs.toDS().coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles
        .find(_.getName.endsWith(".parquet")).get.toPath
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$tmp/in"))
      java.nio.file.Files.copy(part, java.nio.file.Paths.get(s"$tmp/in/$name.parquet"))
    }
    val b1 = Seq(TypedEv(1L, ts(0), 7L, "click"), TypedEv(2L, ts(2), 7L, "purchase"))
    // the batch-2 purchase must credit the click carried from batch 1
    val b2 = Seq(TypedEv(3L, ts(5), 7L, "purchase"), TypedEv(4L, ts(40), 7L, "purchase"))
    land(b1, "b1")
    val st = spark.readStream.schema(enc.schema).parquet(s"$tmp/in").as[TypedEv]
    val q = graft.streaming.StreamingEvents.attributionStateful(st).writeStream
      .outputMode("append").format("memory").queryName("sattr").start()
    val got = try {
      q.processAllAvailable(); land(b2, "b2"); q.processAllAvailable()
      spark.table("sattr")
        .select($"event_id", $"attributed_click_id", $"delay_us")
        .as[(Long, Option[Long], Option[Long])].collect().toSet
    } finally q.stop()
    val batch = Events.lastTouchAttribution((b1 ++ b2).toDS()
        .withColumn("value", lit(0.0)).toDF())
      .select($"event_id", $"attributed_click_id", $"delay_us")
      .as[(Long, Option[Long], Option[Long])].collect().toSet
    assert(got == batch && got.exists(_._2.isDefined))
  }

  test("cart abandonment flags the never-purchasing clicker and clears the converter") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(h: Long) = new java.sql.Timestamp(t0.getTime + h * 3600000L)
    val ev = Seq(
      (1L, ts(1), 7L, "click", 0.0), (2L, ts(2), 7L, "purchase", 1.0),
      (3L, ts(3), 8L, "click", 0.0), // user 8 never purchases
      (4L, ts(4), 9L, "click", 0.0), (5L, ts(40), 9L, "purchase", 1.0) // too late
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.cartAbandonment(ev)
      .agg(sum($"n_clicks"), sum($"n_abandoned")).as[(Long, Long)].head()
    assert(out == ((3L, 2L)))
  }

  test("embedding outliers are the bottom tail of assignment similarity") {
    val o = Similarity.embeddingOutliers(Tables.embeddings(spark, sf))
    val n = Tables.embeddings(spark, sf).count()
    val k = o.count()
    assert(k > 0 && k <= math.ceil(n * 0.07).toLong, s"$k outliers of $n")
    val maxOut = o.agg(max($"csim")).as[Double].head()
    val asg = Similarity.assignCells(
      Tables.embeddings(spark, sf).select($"vec_id".as("id"), $"embedding".as("v"),
        graft.functions.VectorFunctions.norm($"embedding").as("nrm")), 16)
    val medianAll = asg.agg(expr("percentile(csim, 0.5)")).as[Double].head()
    assert(maxOut <= medianAll, "outliers must sit below the median similarity")
  }

  test("peak concurrency brackets correctly on a hand-built overlap") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def ts(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    // three users, overlapping sessions: u1 [0,10], u2 [5,15], u3 [12,20]
    val ev = Seq(
      (1L, ts(0), 1L, "view", 0.0), (2L, ts(10), 1L, "view", 0.0),
      (3L, ts(5), 2L, "view", 0.0), (4L, ts(15), 2L, "view", 0.0),
      (5L, ts(12), 3L, "view", 0.0), (6L, ts(20), 3L, "view", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.peakConcurrency(ev)
      .select($"n_sessions", $"peak").as[(Long, Long)].head()
    assert(out == ((3L, 2L)), s"expected 3 sessions peaking at 2, got $out")
  }

  test("oov rate is a proper fraction and some docs see rare tokens") {
    val o = Quality.oovRate(Tables.documents(spark, sf))
    assert(o.where($"oov_rate" < 0 || $"oov_rate" > 1).isEmpty)
    assert(o.where($"n_oov" > 0).count() > 0, "top-20 vocab must leave some OOV")
  }

  test("semdedup drops exact-duplicate embeddings within a cell, conserving members") {
    val base = (0L to 19L).map(i =>
      (i, Array.tabulate(64)(d => ((i * 7 + d) % 13).toFloat / 13f), 0L))
    // vectors 100/101 duplicate vector 5 exactly → same cell, cos=1
    val dup = Seq((100L, base(5)._2.clone(), 0L), (101L, base(5)._2.clone(), 0L))
    val emb = (base ++ dup).toDF("vec_id", "embedding", "label")
    val out = Dedup.semDedup(emb)
    val Array((members, dropped)) = out
      .agg(sum($"n_members"), sum($"n_dropped")).as[(Long, Long)].collect()
    assert(members == 22 && dropped >= 2, s"members=$members dropped=$dropped")
    assert(out.where($"n_kept" + $"n_dropped" =!= $"n_members").isEmpty)
  }

  test("dataset card numbers agree with their standalone queries") {
    val card = SparkEntry.queries("pipe_dataset_card")(spark, sf)
      .select($"n_docs", $"n_exact_dups").as[(Long, Long)].head()
    assert(card._1 == Tables.documents(spark, sf).count())
    val dupRows = Quality.duplicateAnalysis(Tables.documents(spark, sf))
      .select($"duplicates").as[Long].head()
    assert(card._2 == dupRows)
  }

  test("lang confusion matrix mass equals the corpus and diagonal dominates") {
    val cm = SparkEntry.queries("txt_lang_confusion")(spark, sf)
    val total = cm.agg(sum($"n")).as[Long].head()
    assert(total == Tables.documents(spark, sf).count())
    // marker-vote langid on the synthetic word-salad corpus is weak
    // (≈0.35 at sf0.001) but must clearly beat chance over the
    // 5-language + 'und' label space
    val diag = cm.where($"lang" === $"lang_pred").agg(sum($"n")).as[Long].head()
    assert(diag.toDouble / total > 0.25, s"langid accuracy ${diag.toDouble / total}")
  }

  test("semi-additive sum counts one row per customer-month") {
    val sa = SparkEntry.queries("q_semi_additive")(spark, sf)
    val nCM = Tables.orders(spark, sf)
      .select($"o_custkey", date_format($"o_orderdate", "yyyy-MM").as("m"))
      .distinct().count()
    assert(sa.agg(sum($"n_customers")).as[Long].head() == nCM)
  }

  test("approx-distinct bounds contract holds on the test corpus") {
    val bad = Analytics.approxDistinct(spark, sf).where($"approx_ok" =!= 1L)
    assert(bad.isEmpty)
  }
}
