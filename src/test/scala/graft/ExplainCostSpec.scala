package graft

import graft.operators.{Events, Sampling, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.functions._

/** EXPLAIN COST audit for the forced broadcasts beyond the q5 star
  * join (Round4LibSpec): DSIR's LLR model, the funnel's stage
  * tables, and the IVF-PQ probe-side tables. Two layers:
  *
  *  1. where Catalyst's size estimate is meaningful (scans, narrow
  *     aggregates) — assert the estimate alone justifies broadcast;
  *  2. where the estimate degrades through joins/explodes (the
  *     non-CBO visitor multiplies sizes, so a derived table like the
  *     PQ codebook estimates petabytes for 128 real rows) — assert
  *     the TRUE cardinality bound that justified forcing the hint,
  *     and at runtime that every BroadcastExchange in the executed
  *     plan carried only model-sized row counts. A forced broadcast
  *     whose exchange ships a corpus would fail here loudly.
  */
class ExplainCostSpec extends SparkSpec {

  private def est(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes
  private lazy val thresh = BigInt(spark.sessionState.conf.autoBroadcastJoinThreshold)

  /** Runtime audit: every broadcast exchange in the executed plan —
    * forced hint or AQE-chosen — actually shipped under the
    * autoBroadcastJoinThreshold (its `dataSize` metric), i.e. each
    * broadcast is justified by what it truly carried, not by an
    * estimate. `forcedRowBound` additionally caps the SMALLEST
    * exchange's rows: at least one exchange must be the model-sized
    * forced side (a plan where even the smallest broadcast is
    * corpus-sized means a hint is shipping the wrong table). */
  private def auditBroadcasts(df: DataFrame, forcedRowBound: Long): Unit = {
    df.write.mode("overwrite").format("noop").save()
    val exchanges = PlanWalk.deepCollect(df.queryExecution.executedPlan) {
      case b: BroadcastExchangeExec => b
    }
    assert(exchanges.nonEmpty, "expected at least one broadcast in the plan")
    exchanges.foreach { b =>
      val bytes = b.metrics.get("dataSize").map(_.value).getOrElse(-1L)
      assert(bytes >= 0 && bytes < thresh,
        s"broadcast shipped $bytes bytes (>= threshold $thresh):\n$b")
    }
    val minRows = exchanges
      .flatMap(_.metrics.get("numOutputRows").map(_.value)).min
    assert(minRows <= forcedRowBound,
      s"smallest broadcast carried $minRows rows (> $forcedRowBound)")
  }

  test("DSIR: the LLR model is stats-small AND cardinality-bounded") {
    val docs = Tables.documents(spark, sf)
    val model = Sampling.llrModel(docs)
    // layer 1: at this SF the estimate alone clears the threshold
    assert(est(model) < thresh, s"estimate ${est(model)} vs $thresh")
    // layer 2: the scale argument — the model never exceeds `buckets`
    // rows no matter the corpus size, which is what makes the forced
    // broadcast valid at 100 TB where the estimate would not be
    assert(model.count() <= 128)
    auditBroadcasts(Sampling.importanceWeights(docs), forcedRowBound = 128)
  }

  test("funnel: stage-1 is stats-justified and stages shrink monotonically") {
    val events = Tables.events(spark, sf)
    val v = events.where(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("vt"))
    assert(est(v) < thresh, s"estimate ${est(v)} vs $thresh")
    // each later stage only keeps users surviving the previous one,
    // so broadcasting the stage table is justified transitively
    val users = events.select(col("user_id")).distinct().count()
    assert(v.count() <= users)
    auditBroadcasts(Events.funnel(events), forcedRowBound = users)
  }

  test("IVF-PQ: model-sized sides are bounded; stats alone would NOT broadcast the codebook") {
    val emb = Tables.embeddings(spark, sf)
    val (cents, cb, codes) = Similarity.ivfpqBuild(emb)
    assert(cents.count() == 16)
    assert(cb.count() == 16 * 8) // nCodes × m — model-sized always
    // the size estimate for the derived codebook overshoots reality
    // by orders of magnitude (join-multiplied), i.e. the statistics
    // alone would refuse this broadcast: the explicit hint is load-
    // bearing, not redundant
    assert(est(cb) > thresh, s"estimate ${est(cb)} unexpectedly small")
    // and every exchange in the full fused query stays under the
    // broadcast threshold at runtime (largest forced side is the ADC
    // LUT: nQueries × m × nCodes = 640 rows)
    auditBroadcasts(Similarity.ivfpqTopK(emb), forcedRowBound = 640)
  }

  test("AnnIndex serve: every broadcast in the serving plan is model-sized") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cost_annix").toString
    val emb = Tables.embeddings(spark, sf)
    graft.sources.AnnIndex.ensureBuilt(emb, dir)
    auditBroadcasts(graft.sources.AnnIndex.query(spark, dir, emb), forcedRowBound = 640)
  }

  test("round-7 forced broadcasts are model-sized at runtime") {
    // recall curve: probes = nQueries × max(levels) rows; the per-band
    // offset table is ≤ #bands rows
    auditBroadcasts(Similarity.recallCurve(Tables.embeddings(spark, sf)),
      forcedRowBound = 5L * 8)
    // windowed funnel: stage tables shrink monotonically (≤ users)
    val events = Tables.events(spark, sf)
    val users = events.select(col("user_id")).distinct().count()
    auditBroadcasts(Events.windowedFunnel(events), forcedRowBound = users)
    // cusum: the per-type stats model is O(event types)
    auditBroadcasts(Events.cusumChangepoint(events), forcedRowBound = 8)
    // shard plan: the per-mime start-offset table is O(mimes)
    auditBroadcasts(
      graft.multimodal.Multimodal.shardPlan(Tables.documents(spark, sf)),
      forcedRowBound = 3)
    // rerank: candidates (depth), queries (nQueries), min-max stats (1)
    // all broadcast model-sized; the corpus is touched only by the
    // recall stage and the candidate-filtered embedding join
    auditBroadcasts(
      graft.operators.Ranking.rerankTopK(Tables.documents(spark, sf), Tables.embeddings(spark, sf)),
      forcedRowBound = 20)
  }
}
