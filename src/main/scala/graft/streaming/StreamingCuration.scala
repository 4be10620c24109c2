package graft.streaming

import graft.operators.Quality
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming mirrors of the curation operators.
  *
  * The stateless ones (quality filter, PII scrub) lift unchanged —
  * they are map-only Column expressions, so the same function runs
  * batch or streaming. Anomaly detection becomes a stream-static
  * join: moments are computed batch-side over the historical corpus
  * (exact DECIMAL sums), broadcast, and each micro-batch scores
  * against them — the standard "train offline, score online" shape.
  */
object StreamingCuration {

  /** Stateless quality gate on a document stream: keep only rows the
    * gopher rules pass. A pure map-side filter — no join, no
    * streaming state — with verdicts identical to the batch filter. */
  def gopherKeep(stream: DataFrame): DataFrame =
    stream.where(Quality.gopherKeepExpr())

  /** Streaming expectations gate (the DLT pattern live): tag each
    * streamed row with its violated rules — `Quality.expectations`
    * is a map-only Column expression, so the SAME rule definitions
    * run batch or streaming with identical verdicts. Split the
    * output on `size(failed_rules) = 0` to route clean rows to the
    * zone and violations to a quarantine sink. No state, no
    * watermark. */
  def expectationsGate(stream: DataFrame,
                       rules: Seq[(String, org.apache.spark.sql.Column)] =
                         Quality.defaultExpectations): DataFrame =
    Quality.expectations(stream, rules)

  case class WordCount(word: String, n: Long)

  /** Stateful running word counts over a document stream (the
    * incremental form of `Quality.wordFrequency`): one long of state
    * per word, updated per micro-batch via `mapGroupsWithState` —
    * vocabulary-bounded state, emits each touched word's new total
    * (update mode). Top-k is a query over the sink's latest values;
    * totals equal the batch counts over the same documents. */
  def runningWordCounts(docs: DataFrame, minLen: Int = 3): Dataset[WordCount] = {
    import graft.functions.TextFunctions.tokens
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(explode(tokens(lower(col("text")))).as("word"))
      .where(length(col("word")) > minLen).as[String]
      .groupByKey(identity)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (w: String, it: Iterator[String], st: GroupState[Long]) =>
          val n = st.getOption.getOrElse(0L) + it.size
          st.update(n)
          WordCount(w, n)
      }
  }

  /** Stream-static boilerplate removal: the hot-line table comes from
    * a batch pass over the historical corpus (`Dedup.hotLines` —
    * small by construction), collapses to ONE array row, and
    * broadcasts into every micro-batch; cleaning is then a stateless
    * map (split → filter-by-membership → rejoin), so the stream
    * needs no aggregation state and no watermark. The CCNet cleaner
    * in its train-offline / clean-online shape. */
  def lineCleanStream(stream: DataFrame, hotLines: DataFrame,
                      contentCol: String = "text"): DataFrame = {
    val hot = hotLines.agg(collect_set(col("line")).as("__hot"))
    stream.crossJoin(broadcast(hot))
      .withColumn("clean_text",
        array_join(filter(split(col(contentCol), "\n"),
          l => !array_contains(col("__hot"), l)), "\n"))
      .drop("__hot")
  }

  /** Stream-static DSIR gate: score each incoming document against
    * batch-trained hashed-unigram log-ratio models (the `lr` table
    * from `Sampling.importanceWeights`'s model stage, O(buckets)
    * rows) and keep documents whose mean log-ratio clears the
    * threshold — importance filtering in its train-offline /
    * score-online shape. Per micro-batch: map-side token explode,
    * broadcast model join, one per-doc partial aggregation. */
  def dsirGate(stream: DataFrame, llrModel: DataFrame,
               minAvgLlr: Double = 0.0, contentCol: String = "text"): DataFrame = {
    import graft.functions.HashFunctions
    import graft.functions.TextFunctions.tokens
    val scored = stream
      .select(col("doc_id"), explode(tokens(col(contentCol))).as("tok"))
      .withColumn("b", HashFunctions.md5Long(col("tok")) % 128)
      .join(broadcast(llrModel), "b")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("llr").cast("decimal(18,6)")).cast("double").as("llr_sum"))
      .withColumn("avg_llr", col("llr_sum") / col("n_tokens"))
    scored.where(col("avg_llr") >= minAvgLlr)
  }

  /** Stream-static anomaly scoring: z-scores against batch-computed
    * per-type moments. `staticStats` comes from
    * `Events.typeStats(batchEvents)`; the static side broadcasts
    * into every micro-batch. */
  def anomalyScores(stream: DataFrame, staticStats: DataFrame, zMax: Double = 3.0): DataFrame = {
    val z = (col("value") - col("mean")) / when(col("std") =!= 0.0, col("std"))
    stream.join(broadcast(staticStats), "event_type")
      .where(abs(z) > zMax)
      .select(col("event_id"), col("event_type"), col("value"), round(z, 4).as("z"))
  }

  /** Streaming exact dedup — the online form of `Dedup.exact`: each
    * arriving document keeps only the FIRST occurrence of its content
    * hash. `dropDuplicatesWithinWatermark` bounds the hash state by
    * event time: a duplicate arriving within `horizon` of the
    * original is dropped; state older than the watermark is evicted,
    * so memory is O(docs per horizon), not O(corpus) — the only
    * state contract that survives an unbounded stream. Exactly-once
    * emission per content hash inside the horizon, matching the
    * batch dedup verdict on any replay whose duplicates fall within
    * it. */
  def dedupStream(stream: DataFrame, contentCol: String = "text",
                  eventTimeCol: String = "ts", horizon: String = "10 minutes"): DataFrame =
    stream
      .withColumn("content_hash", md5(col(contentCol)))
      .withWatermark(eventTimeCol, horizon)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Cross-batch NEAR-dup gate — the incremental-crawl pattern: each
    * micro-batch of new documents is deduped against the ACCUMULATED
    * signature zone (a Delta table of every kept document's hashed
    * shingles + MinHash signature), not just within itself, and the
    * survivors' signatures append to the zone so the next batch sees
    * them. No batch ever recomputes the corpus.
    *
    * Scale shape per batch: the batch's banded keys BROADCAST into
    * the zone's banded scan (the corpus side stays map-side, zero
    * zone shuffle); only candidate ids come back; the exact-Jaccard
    * verify touches candidate rows alone (the zone side reduced by a
    * broadcast semi-join on candidate ids). Batch-internal pairs go
    * through the same banding self-join — batch-sized, cheap.
    *
    * Exactly-once: survivors append under a `txn` (appId, batchId)
    * guard — a crash-replayed batch is skipped, so the zone never
    * double-counts. A doc with a verified match (to the zone or to a
    * LOWER-id doc in its own batch) reports `is_dup = true` with its
    * matched id; survivors report false. */
  def incrementalMinhashDedup(batch: DataFrame, batchId: Long, sigZone: String,
                              contentCol: String = "text", idCol: String = "doc_id",
                              n: Int = 3, k: Int = 16, bands: Int = 4,
                              tau: Double = 0.5,
                              appId: String = "graft-incr-dedup"): DataFrame = {
    import graft.functions.HashFunctions.bandKeys
    import graft.operators.Dedup
    import graft.sources.DeltaSource
    val spark = batch.sparkSession
    require(k % bands == 0, "k must divide into bands")
    val done = if (DeltaSource.latestVersion(spark, sigZone).isDefined)
      DeltaSource.lastTxnVersion(spark, sigZone, appId) else None
    val sigB = Dedup.signatureTable(batch, contentCol, idCol, n, k)
      .select(col("id"), col("shh"), col("sig")).localCheckpoint(true)
    def banded(sigs: DataFrame) = sigs.select(col("id"),
      posexplode(bandKeys(col("sig"), bands, k / bands)).as(Seq("band", "bkey")))
    val bandB = banded(sigB)
    val zoneExists = DeltaSource.latestVersion(spark, sigZone).isDefined
    // candidates vs the zone: batch side broadcasts, corpus side
    // never shuffles
    val candZ = if (!zoneExists) None else {
      val bandZ = banded(DeltaSource.readDelta(spark, sigZone))
      // id_a =!= id_b: a crash-REPLAYED batch finds its own already-
      // appended signatures in the zone; the self-pair must not turn
      // yesterday's survivor into today's duplicate
      Some(bandZ.join(
          broadcast(bandB.select(col("band"), col("bkey"), col("id").as("id_b"))),
          Seq("band", "bkey"))
        .where(col("id") =!= col("id_b"))
        .select(col("id").as("id_a"), col("id_b")).distinct())
    }
    // batch-internal candidates: lower id wins
    val candB = bandB.as("a").join(broadcast(bandB.as("b")),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    val cand = candZ.map(_.unionByName(candB)).getOrElse(candB)
    // verify shingle sets: zone side reduced to candidate ids first
    val zoneSets = candZ.map { cz =>
      DeltaSource.readDelta(spark, sigZone)
        .join(broadcast(cz.select(col("id_a").as("id")).distinct()), Seq("id"), "left_semi")
        .select(col("id"), col("shh"))
    }
    val sets = zoneSets.map(_.unionByName(sigB.select(col("id"), col("shh"))))
      .getOrElse(sigB.select(col("id"), col("shh")))
    val verified = cand
      .join(sets.select(col("id").as("id_a"), col("shh").as("sh_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("shh").as("sh_b")), "id_b")
      .withColumn("inter", graft.plans.NativeExprs.intersectSize(col("sh_a"), col("sh_b")))
      .withColumn("jaccard", round(col("inter").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")).cast("double"), 4))
      .where(col("jaccard") >= tau)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    val dupOf = verified.groupBy(col("id_b").as("id"))
      .agg(min(col("id_a")).as("matched_id"))
    val verdict = sigB.select(col("id"))
      .join(dupOf, Seq("id"), "left")
      .select(col("id"), col("matched_id").isNotNull.as("is_dup"), col("matched_id"))
      .localCheckpoint(true)
    val survivors = sigB.join(
      verdict.where(!col("is_dup")).select(col("id")), Seq("id"), "left_semi")
    if (!done.exists(_ >= batchId))
      DeltaSource.writeDelta(survivors, sigZone, overwrite = false,
        txn = Some(appId -> batchId))
    verdict
  }

  /** Streaming PSI drift monitor — the incremental half of the
    * `dq_drift`/`dq_ks_exact` suite: a FROZEN reference distribution
    * is compared against every event-time window of the live stream,
    * flagging windows whose population shifted. The reference fit is
    * one batch pass (approx-percentile bin edges + per-bin shares),
    * collected as a model; PSI per window is
    * Σ (p_obs − p_ref)·ln(p_obs/p_ref) over those bins, with
    * add-one (Laplace) smoothing on BOTH sides so empty bins stay
    * finite.
    *
    * Scale shape: the bin edges are LITERALS in the streaming plan —
    * no stream-static join, no second stateful operator — so each
    * window aggregates to ONE row of per-bin conditional counts and
    * state is O(open windows · bins) at any stream rate; output is
    * append-mode behind the watermark, ready for a `graft-delta`
    * sink. The industry threshold convention: PSI < 0.1 stable,
    * 0.1-0.25 moderate shift, > 0.25 action — `alertAt` defaults
    * into that band. */
  def psiDriftStream(stream: DataFrame, reference: DataFrame,
                     valueCol: String = "value", tsCol: String = "ts",
                     bins: Int = 10, windowSize: String = "1 hour",
                     watermark: String = "2 hours",
                     alertAt: Double = 0.2): DataFrame = {
    require(bins >= 2, s"need at least 2 bins, got $bins")
    // reference model: interior quantile edges (deduped — heavy
    // point masses collapse edges) and smoothed per-bin shares
    val edgeRow = reference
      .agg(percentile_approx(col(valueCol).cast("double"),
        array((1 until bins).map(i => lit(i.toDouble / bins)): _*),
        lit(10000)).as("es"))
      .head()
    require(!edgeRow.isNullAt(0),
      s"reference distribution is empty (no non-null '$valueCol' rows) — " +
        "fit the baseline before monitoring against it")
    val rawEdges = edgeRow.getSeq[Double](0).toSeq.distinct.sorted
    // bin index = number of edges strictly below the value
    def binOf(c: Column): Column =
      rawEdges.foldLeft(lit(0)) { (acc, e) =>
        acc + when(c > lit(e), 1).otherwise(0)
      }
    val nBins = rawEdges.size + 1
    val refCounts = reference
      .groupBy(binOf(col(valueCol).cast("double")).as("bin"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val refTotal = refCounts.valuesIterator.sum
    val refShare: Int => Double = b =>
      (refCounts.getOrElse(b, 0L) + 1.0) / (refTotal + nBins)
    // per window: one row of conditional per-bin counts — the bin
    // projects ONCE per row (O(edges) comparisons), the conditional
    // sums test the projected index (O(bins)), not O(bins·edges)
    val aggCols = count(lit(1)).as("n") +:
      (0 until nBins).map(b =>
        sum(when(col("__bin") === b, 1L).otherwise(0L)).as(s"__c$b"))
    val binned = stream
      .withColumn("__bin", binOf(col(valueCol).cast("double")))
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowSize))
      .agg(aggCols.head, aggCols.tail: _*)
    val psi = (0 until nBins).map { b =>
      val po = (col(s"__c$b") + lit(1.0)) / (col("n") + lit(nBins))
      val pr = lit(refShare(b))
      (po - pr) * log(po / pr)
    }.reduce(_ + _)
    // alert tests the SAME rounded value the row emits, so the
    // output can never contradict itself at the threshold
    val psiR = round(psi, 6)
    binned.select(
      col("window.start").as("window_start"),
      col("window.end").as("window_end"),
      col("n"),
      psiR.as("psi"),
      (psiR > lit(alertAt)).as("alert"))
  }
}
