package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}

/** Plan-shape regression guards: correctness tests prove the values;
  * these prove the *plans* stay the ones designed for scale —
  * filters reach the parquet scan, dimensions broadcast, shuffles
  * don't multiply. A future edit that silently turns a broadcast
  * join into a sort-merge or drops a pushed filter fails here, not
  * in a 100 TB run. */
class PlanShapeSpec extends SparkSpec {

  private def physical(df: DataFrame): SparkPlan = {
    val p = df.queryExecution.executedPlan
    p match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case other => other
    }
  }

  private def collectAll(p: SparkPlan): Seq[SparkPlan] =
    (p +: p.children.flatMap(collectAll)) ++ p.subqueries.flatMap(collectAll)

  private def count(df: DataFrame, pred: SparkPlan => Boolean): Int =
    collectAll(physical(df)).count(pred)

  /** Data shuffles = exchanges that redistribute by key/range.
    * Round-robin exchanges are the conditional `Tables.fanOut`
    * (parallelism restoration for the single-split local test files,
    * a no-op on pre-split cluster inputs) — not data movement the
    * operator's algorithm requires. */
  private def dataShuffles(df: DataFrame): Int =
    collectAll(physical(df)).count {
      case s: ShuffleExchangeLike =>
        !s.outputPartitioning.isInstanceOf[
          org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning]
      case _ => false
    }

  test("q1: shipdate filter is pushed into the parquet scan") {
    val df = SparkEntry.queries("q1_pricing_summary")(spark, sf)
    val scans = physical(df).collectLeaves().map(_.toString).mkString
    assert(scans.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"missing pushdown in: ${scans.take(400)}")
  }

  test("q1: exactly one data shuffle (partial agg before exchange)") {
    val df = SparkEntry.queries("q1_pricing_summary")(spark, sf)
    // one hash exchange for the groupBy + one range exchange for the
    // final orderBy — anything more means partial aggregation broke
    assert(dataShuffles(df) <= 2)
  }

  test("q5: all five dimension joins broadcast, none sort-merge") {
    val df = SparkEntry.queries("q5_region_volume")(spark, sf)
    assert(count(df, _.isInstanceOf[BroadcastHashJoinExec]) >= 4)
    assert(count(df, _.isInstanceOf[SortMergeJoinExec]) == 0)
  }

  test("pipeline is map-only until the dedup shuffle") {
    val df = SparkEntry.queries("pipe_silver_normalize")(spark, sf)
    // normalize stage: zero shuffles beyond the output sort
    assert(dataShuffles(df) <= 1)
  }

  test("decontamination joins the benchmark side as a broadcast") {
    val df = SparkEntry.queries("txt_decontaminate")(spark, sf)
    assert(count(df, _.isInstanceOf[BroadcastHashJoinExec]) >= 1)
    assert(count(df, _.isInstanceOf[SortMergeJoinExec]) == 0)
  }

  test("bm25 broadcasts the df/stats sides, never sort-merges") {
    val df = SparkEntry.queries("rag_bm25")(spark, sf)
    assert(count(df, _.isInstanceOf[BroadcastHashJoinExec]) >= 1)
    assert(count(df, _.isInstanceOf[SortMergeJoinExec]) == 0)
  }

  test("band histogram aggregates the facts before any join (no nested loop)") {
    val df = SparkEntry.queries("q_range_join")(spark, sf)
    // the fact side must reduce to O(bands) rows pre-join; a
    // BroadcastNestedLoopJoin here would mean the raw fact table is
    // being broadcast (the left-outer range-join trap)
    assert(count(df,
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec]) == 0)
    assert(count(df, _.isInstanceOf[BroadcastHashJoinExec]) >= 1)
    assert(count(df, _.isInstanceOf[SortMergeJoinExec]) == 0)
  }

  test("documents scan prunes to the referenced columns") {
    val df = SparkEntry.queries("txt_token_count")(spark, sf)
    val scan = physical(df).collectLeaves().map(_.toString).mkString
    assert(scan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"unpruned scan: ${scan.take(400)}")
  }

  test("pq: codebook and LUT broadcast; codebook filter reaches the scan") {
    val df = SparkEntry.queries("ann_pq_topk")(spark, sf)
    assert(count(df, _.isInstanceOf[BroadcastHashJoinExec]) >= 3)
    assert(count(df, _.isInstanceOf[SortMergeJoinExec]) == 0)
    val scans = physical(df).collectLeaves().map(_.toString).mkString
    assert(scans.contains("LessThan(vec_id,16)"), "codebook filter not pushed")
  }

  test("line dedup: AQE picks the hot-line join (broadcast when small, no forced hint)") {
    // the hot-line side is NOT hint-broadcast (a boilerplate-heavy
    // corpus can push it past driver memory), so the strategy is
    // AQE's runtime call: execute, then assert the FINAL plan
    // broadcast the small hot side at this SF
    val df = SparkEntry.queries("dedup_lines")(spark, sf)
    df.write.mode("overwrite").format("noop").save()
    val fin = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    assert(collectAll(fin).count(_.isInstanceOf[BroadcastHashJoinExec]) >= 1)
  }

  test("winnowing matches: AQE picks the hot-fingerprint join (no forced hint)") {
    // same contract as line dedup: the above-cap fingerprint table is
    // not provably small on boilerplate-heavy corpora, so no hint —
    // assert AQE's FINAL plan still broadcasts it at this SF
    val df = SparkEntry.queries("dedup_fp_matches")(spark, sf)
    df.write.mode("overwrite").format("noop").save()
    val fin = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    assert(collectAll(fin).count(_.isInstanceOf[BroadcastHashJoinExec]) >= 1)
  }

  test("temperature sampling: rate table broadcasts onto a map-only filter") {
    val df = SparkEntry.queries("samp_temperature")(spark, sf)
    assert(count(df, _.isInstanceOf[BroadcastHashJoinExec]) >= 1)
    assert(count(df, _.isInstanceOf[SortMergeJoinExec]) == 0)
  }

  test("hopping agg: one data shuffle (map-side window explode + partials)") {
    val df = SparkEntry.queries("ev_hopping_agg")(spark, sf)
    // one hash exchange on (window, type) + the output range sort
    assert(dataShuffles(df) <= 2)
  }

  test("q4: the order-date window is pushed into the orders scan") {
    val df = SparkEntry.queries("q_order_priority")(spark, sf)
    val scans = physical(df).collectLeaves().map(_.toString).mkString
    assert(scans.contains("GreaterThanOrEqual(o_orderdate") &&
      scans.contains("LessThan(o_orderdate"), s"window not pushed: ${scans.take(400)}")
  }

  test("moving average: one data shuffle (hash on user) + output sort") {
    val df = SparkEntry.queries("ev_moving_avg")(spark, sf)
    assert(dataShuffles(df) <= 2)
  }

  test("int8 quantization: per-dim stats broadcast back, never sort-merge") {
    val df = SparkEntry.queries("emb_quantize_int8")(spark, sf)
    assert(count(df, _.isInstanceOf[BroadcastHashJoinExec]) >= 1)
    assert(count(df, _.isInstanceOf[SortMergeJoinExec]) == 0)
  }

  test("dsir: the O(buckets) model broadcasts; corpus never sort-merges") {
    val df = SparkEntry.queries("samp_dsir")(spark, sf)
    // the llr-model join must be a broadcast hash join (the totals
    // 1-row cross join is a nested-loop broadcast, not counted here);
    // the one allowed sort-merge is the doc_id rejoin of the corpus
    // to its per-doc scores — corpus-sized on BOTH sides, so a
    // shuffle join is the design, not a regression
    assert(count(df, _.isInstanceOf[BroadcastHashJoinExec]) >= 1)
    assert(count(df, _.isInstanceOf[SortMergeJoinExec]) <= 1)
  }

  test("refine retrieval: candidates and queries broadcast onto the vector store") {
    val df = SparkEntry.queries("ann_refine_topk")(spark, sf)
    assert(count(df, _.isInstanceOf[BroadcastHashJoinExec]) >= 2)
    assert(count(df, _.isInstanceOf[SortMergeJoinExec]) == 0)
  }

  test("filtered retrieval: the metadata predicate reaches the documents scan") {
    val df = SparkEntry.queries("rag_filtered")(spark, sf)
    val scans = physical(df).collectLeaves().map(_.toString).mkString
    assert(scans.contains("EqualTo(source,src1)"),
      s"where= filter not pushed: ${scans.take(400)}")
  }

  test("small-qty revenue: no nested-loop joins, bounded shuffles") {
    val df = SparkEntry.queries("q_small_qty_rev")(spark, sf)
    assert(count(df,
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec]) == 0)
    // partkey agg + join back + final global agg
    assert(dataShuffles(df) <= 3)
  }

  test("cms: the 256-cell sketch broadcasts onto the probe, never sort-merges") {
    val df = SparkEntry.queries("ev_heavy_hitters")(spark, sf)
    assert(count(df, _.isInstanceOf[SortMergeJoinExec]) == 0)
    assert(count(df, _.isInstanceOf[BroadcastHashJoinExec]) >= 1)
  }

  test("qlm: corpus LM and totals broadcast; the corpus never sort-merges") {
    val df = SparkEntry.queries("rag_qlm")(spark, sf)
    assert(count(df, _.isInstanceOf[SortMergeJoinExec]) == 0)
  }

  test("jl: the plane matrix is a literal — projection adds no shuffle") {
    val df = SparkEntry.queries("ann_jl_topk")(spark, sf)
    // corpus->sketch is map-only; the only data exchanges are the
    // broadcast of the 5 queries and the top-k partial aggregation
    assert(count(df, _.isInstanceOf[SortMergeJoinExec]) == 0)
    assert(dataShuffles(df) <= 2)
  }

  test("benford: digit agg + scalar total + 9-row output sort, nothing more") {
    val df = SparkEntry.queries("dq_benford")(spark, sf)
    assert(dataShuffles(df) <= 3)
    assert(count(df, _.isInstanceOf[SortMergeJoinExec]) == 0)
  }

  test("binary: pack is map-side, queries broadcast, ranking is the one partial-agg shuffle") {
    val df = graft.operators.Similarity.binaryTopK(Tables.embeddings(spark, sf))
    // all-pairs scoring: the nq-row query side BROADCASTS under the
    // non-equi self-exclusion (nested-loop with a broadcast build is
    // the right physical shape — the corpus side streams once)
    assert(count(df, _.isInstanceOf[
        org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec]) == 1,
      "the query side must broadcast onto the packed corpus scan")
    assert(count(df, _.isInstanceOf[SortMergeJoinExec]) == 0)
    // one hash exchange for the top-k aggregation + the output sort —
    // a third would mean the pack or the Hamming map started shuffling
    assert(dataShuffles(df) <= 2, s"binary path shuffles: ${dataShuffles(df)}")
  }

  test("sweep: no query plans a global (empty-partition) window over unbounded input") {
    // Window.orderBy with no partition key funnels its entire input
    // through ONE task's sort — banned for anything that grows with
    // the corpus/SF (the pipe_shard_assign / q_customer_deciles /
    // ev_pareto / ev_time_to_convert / txt_ppl_buckets family was
    // rewritten to two-phase banded ranks for exactly this reason).
    // The allowlist is the provably bounded-input family:
    //   ev_cum_users  — windows the O(active days) daily rollup
    //   ev_pareto     — windows the O(distinct per-user counts) runs
    //                   table, bounded by max events/user
    //   rag_hybrid,
    //   rag_ndcg      — window an already-top-`depth` (≤20-row)
    //                   lexical list
    //   txt_bpe_pairs — windows ≤26² letter-pair rows
    //   txt_zipf_fit  — windows the O(distinct word counts) runs
    //                   table, ≤ O(√tokens) by the pigeonhole bound
    //   ev_survival_km — windows the O(distinct lifetime days)
    //                   rollup, ≤ O(calendar days)
    //   ev_autocorr   — lag windows over the O(days) daily series
    //   q_orders_backlog — cumsum over the O(months) rollup
    //   rag_prf       — ranks its already-top-10 (LIMIT-bounded)
    //                   stage-2 result
    // Anything new that plans a global window must either partition
    // it or argue its way onto this list.
    val allow = Set("ev_cum_users", "ev_pareto", "rag_hybrid", "rag_ndcg",
      "txt_bpe_pairs", "txt_zipf_fit", "ev_survival_km", "ev_autocorr",
      "q_orders_backlog", "rag_prf")
    // round 15 (suite budget): plan construction is independent per
    // query — overlap the stateless families from a small pool
    // (guide §2.6); zone-building / conf-scoped families stay serial
    // (imperative queries execute their builds at construction time)
    val serialPrefixes = Seq("pipe_", "stream_", "ann_")
    val (serialQ, pooledQ) = SparkEntry.queries.toSeq.sortBy(_._1)
      .partition { case (n, _) => serialPrefixes.exists(n.startsWith) }
    def globalsOf(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Int =
      collectAll(physical(fn(spark, sf))).count {
        case w: org.apache.spark.sql.execution.window.WindowExec =>
          w.partitionSpec.isEmpty
        case _ => false
      }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val futs = pooledQ.map { case (name, fn) =>
      scala.concurrent.Future(name -> globalsOf(fn))
    }
    val counts = serialQ.map { case (name, fn) => name -> globalsOf(fn) } ++
      futs.map(scala.concurrent.Await.result(_, scala.concurrent.duration.Duration(600, "s")))
    pool.shutdown()
    val offenders = counts.collect {
      case (name, g) if g > 0 && !allow(name) => name
    }
    assert(offenders.isEmpty,
      s"global-window plans outside the allowlist: $offenders")
  }

  test("bpe encode/pack: the merge-table replay broadcasts back onto the word stream") {
    for (name <- Seq("txt_bpe_encode", "pipe_pack_bpe")) {
      val df = SparkEntry.queries(name)(spark, sf)
      assert(count(df, _.isInstanceOf[BroadcastHashJoinExec]) >= 1,
        s"$name: word-type join must broadcast")
      assert(count(df, _.isInstanceOf[SortMergeJoinExec]) == 0,
        s"$name: nothing here is big enough to sort-merge")
    }
  }

  test("dct roundtrip: map-only codec pass (no shuffle before the output sort)") {
    val df = SparkEntry.queries("mm_dct_roundtrip")(spark, sf)
    assert(dataShuffles(df) <= 1)
  }

  test("held-out eval: the model-scale scoring joins never sort-merge") {
    val df = SparkEntry.queries("rag_ndcg_trained")(spark, sf)
    assert(count(df, _.isInstanceOf[SortMergeJoinExec]) == 0,
      "every eval-side frame is model-scale (nQ*V at most) and must broadcast")
  }
}
