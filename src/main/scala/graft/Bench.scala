package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    // optional args name a subset of queries (the scaling-decade
    // study benches heavyweight families at sf1.0 without paying the
    // full surface); the driver passes no args → full run, unchanged
    val only = args.toSet
    def selected(name: String): Boolean = only.isEmpty || only(name)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.tuning.foldLeft(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // evaluate via the noop sink, not count(): count() prunes every
    // column, so a map-heavy query would be timed without computing
    // its output expressions at all
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    // warm the session (codegen, scan machinery) so the first timed
    // query isn't charged for JVM/session startup
    spark.range(1000000).selectExpr("sum(id)").collect()
    // JIT warmup: run EVERY query once against the smallest sibling
    // scale factor, so timings below measure steady-state execution
    // rather than whichever query happens to trigger compilation
    // (e.g. the clustering loop runs 12s cold vs 3.7s warm)
    val warmDir = new java.io.File(sfDir).getParentFile match {
      case null => None
      case p =>
        val w = new java.io.File(p, "sf0.001")
        if (w.isDirectory && w.getPath != sfDir) Some(w.getPath) else None
    }
    warmDir.foreach { wd =>
      SparkEntry.queries.foreach { case (name, fn) =>
        if (selected(name))
          try exec(fn(spark, wd)) catch { case _: Throwable => () }
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    SparkEntry.queries.headOption.foreach { case (_, fn) =>
      try exec(fn(spark, sfDir)) catch { case _: Throwable => () }
    }
    // prime build-once zones (ZoneCache) at the TARGET sf before the
    // timed loop, so pipe_delta_* read-path timings never absorb the
    // one-time zone materialization for this corpus
    Seq("pipe_delta_roundtrip", "pipe_delta_partitioned",
        "pipe_delta_optimize", "pipe_delta_cdf", "pipe_delta_zorder",
        "pipe_delta_timetravel", "pipe_delta_dv",
        "pipe_incremental_silver", "pipe_delta_generated",
        "pipe_delta_identity", "pipe_delta_cdc",
        "pipe_delta_update", "pipe_delta_evolve",
        "pipe_delta_rowtracking", "pipe_delta_cluster",
        "pipe_delta_widen", "pipe_delta_rename",
        "pipe_delta_compact", "pipe_delta_v2checkpoint",
        "pipe_delta_cluster3", "pipe_delta_bigsnapshot",
        // round 14 (measurement fix): these four ZoneCache zones were
        // never primed, so their first timed run absorbed the
        // one-time zone build (pipe_delta_replacewhere timed 9.2 s of
        // which ~7 s was the partitioned silver write) — the same
        // read-path-vs-build-path bug the prime list exists to fix
        "pipe_delta_vacuum", "pipe_delta_replacewhere",
        "pipe_delta_pruned_replay", "pipe_delta_clone",
        // the shared graph-ANN index (ann_graph_topk/recall serve
        // from one persisted build; priming keeps BOTH timings pure
        // serving — ann_graph_build times construction on its own)
        "ann_graph_topk",
        // the delete row's own dir: priming pays the one-time build,
        // so the timed entry measures tombstone-write + masked serve
        "ann_graph_delete",
        // the compaction lifecycle dir: priming pays the one-time
        // grow (fingerprint-guarded build + increment) and the
        // compaction itself, so the timed entry measures the
        // steady-state shape — freshness probe + serve
        "ann_graph_compact",
        // the memoized unigram EM chain: train/segment are two views
        // of ONE training run; priming fills the memo so both timed
        // entries measure their own consumption, not whichever
        // happens to run first paying the whole chain
        "txt_unigram_segment",
        // the memoized GloVe training serves four graded views
        // (train/loss/retrieve/infer) — same discipline
        "emb_glove_train",
        // the SCALED training and the held-out eval's half-corpus
        // training are separate memo keys: prime both so their timed
        // entries measure consumption, like the toy chain
        "emb_glove_scaled", "rag_ndcg_trained",
        // the memoized SCALED BPE training serves three graded views
        // (train/encode/pack) — prime so each times its consumption
        "txt_bpe_train_scaled").foreach { n =>
      if (selected(n)) SparkEntry.queries.get(n).foreach { fn =>
        try exec(fn(spark, sfDir)) catch { case _: Throwable => () }
      }
    }
    // sorted-name order: deterministic run-to-run, and dependent
    // entries time their own phase (ann_index_build lands the
    // persisted index before ann_index_serve is timed, so the serve
    // number is load+query alone)
    def timedRun(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      // a failed query must be VISIBLE (-1), not a fast-looking timing
      val ok = try { exec(fn(spark, sfDir)); true } catch {
        case t: Throwable =>
          System.err.println(s"BENCH FAIL $name: ${t.getClass.getSimpleName}: ${t.getMessage}")
          false
      }
      val dt = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      // drop whatever a query left behind so later ones don't
      // inherit its heap: clearCache for catalog-level caches plus
      // an RDD-level sweep (localCheckpoint blocks, e.g. the
      // clustering result, live outside the CacheManager)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      dt
    }
    val firstPass = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => selected(name) }
      .map { case (name, fn) => name -> timedRun(name, fn) }
    // OUTLIER RE-MEASURE: host pressure has misread the same
    // memory-sensitive queries three rounds running (r9–r11:
    // dedup_substrings timed 50.7 s against an unchanged 2.4 s
    // implementation). Any query above `rerunFloor` that regressed
    // >3× against its best recent round re-times ONCE; the reported
    // time is the min of the two runs and the pair is listed in
    // `reruns`, so a real plan defect (reproduces) separates from an
    // eviction storm (vanishes) inside the artifact itself.
    val prior = priorTimings(sfDir = sfDir)
    val reruns = firstPass.collect {
      case (name, t1) if shouldRerun(name, t1, prior.get(name)) =>
        System.err.println(f"BENCH RERUN $name: $t1%.1f s vs prior best ${prior(name)}%.1f s")
        name -> (t1, timedRun(name, SparkEntry.queries(name)))
    }.toMap
    // round 15 (measurement fix, VERDICT r14 #8): the memoized scaled
    // trainings were invisible to PERF — their timed rows serve
    // memo-warm, so NO bench row moved when training code changed.
    // Time them COLD as extra rows (additions only; existing rows are
    // untouched), run LAST so clearing a memo never perturbs an
    // already-timed row.
    val coldRows: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] = Seq(
      "emb_glove_train_cold" -> ((s: SparkSession, d: String) => {
        graft.operators.Glove.clearMemo()
        SparkEntry.queries("emb_glove_scaled")(s, d)
      }),
      "txt_bpe_train_cold" -> ((s: SparkSession, d: String) => {
        graft.operators.Bpe.clearMemo()
        SparkEntry.queries("txt_bpe_train_scaled")(s, d)
      }))
    val cold = coldRows.filter { case (n, _) => selected(n) }
      .map { case (n, fn) => n -> timedRun(n, fn) }
    val results = firstPass.map { case (n, t) =>
      n -> reruns.get(n).fold(t) { case (a, b) =>
        if (b < 0) a else math.min(a, b) } // a failed re-run never hides the first timing
    } ++ cold
    // the driver captures only a ~2000-char tail of stdout and parses
    // the JSON from it — a line carrying all ~100 per-query timings
    // overflows that window and the whole benchmark reads as
    // unparseable (BENCH_r01–r03 all did). Keep the stdout line well
    // under the window: report the total plus the slowest queries,
    // and dump the complete per-query map to stderr for humans.
    val (stdoutLine, fullLine) = renderJson(results, sfDir, reruns = reruns)
    System.err.println("BENCH FULL " + fullLine)
    println(stdoutLine)
    spark.stop()
  }

  /** The emitted JSON lines (stdout-truncated, full) for a result
    * set. A failed query (sentinel time -1.0) must be LOUD, never a
    * fast-looking timing: it is excluded from `value` (the total of
    * the queries that ran) and named in `failed` — a bench whose
    * total silently absorbed a -1 would read as a 2-second
    * improvement per broken query. */
  private[graft] def renderJson(results: Seq[(String, Double)],
                                sfDir: String,
                                stdoutCap: Int = 1500,
                                reruns: Map[String, (Double, Double)] = Map.empty)
      : (String, String) = {
    def r3(v: Double): Double = math.rint(v * 1000) / 1000
    val failed = results.collect { case (n, v) if v < 0 => n }.sorted
    val total = r3(results.collect { case (_, v) if v >= 0 => v }.sum)
    def failedJson(names: Seq[String]) =
      names.map("\"" + _ + "\"").mkString("[", ",", "]")
    def rerunsJson(rs: Seq[(String, (Double, Double))]) =
      rs.map { case (n, (a, b)) => "\"" + n + "\":[" + r3(a) + "," + r3(b) + "]" }
        .mkString("{", ",", "}")
    // the stdout line must fit the driver's capture window even when
    // MANY queries fail: the query-map shrink loop floors at keep=1,
    // so an uncapped failed array could still overflow it — cap the
    // names here (n_failed always carries the true count; the stderr
    // BENCH FULL line keeps the complete list)
    val failedCap = 8
    val failedStdout = failedJson(failed.take(failedCap))
    val rerunsSorted = reruns.toSeq.sortBy(_._1)
    val rerunsStdout = rerunsJson(rerunsSorted.take(6))
    def jsonLine(qs: Seq[(String, Double)], failedJ: String, rerunsJ: String): String = {
      val qj = qs.map { case (k, v) => "\"" + k + "\":" + r3(v) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"n_failed":${failed.size},"failed":$failedJ,"n_reruns":${reruns.size},"reruns":$rerunsJ,"queries":$qj,"sf":"$sfDir"}"""
    }
    val bySlow = results.sortBy { case (_, v) => -v }
    var keep = bySlow.size
    while (keep > 1 && jsonLine(bySlow.take(keep), failedStdout, rerunsStdout).length > stdoutCap)
      keep -= 1
    (jsonLine(bySlow.take(keep).sortBy(_._1), failedStdout, rerunsStdout),
      jsonLine(bySlow, failedJson(failed), rerunsJson(rerunsSorted)))
  }

  /** Queries whose SECOND same-JVM run executes a warm/skip path
    * rather than the work the first run timed — the memoized
    * trainings (GloVe, unigram-EM) and the fingerprint-guarded
    * persisted-index builds. Re-measuring these would record an
    * artificially low time (the memo hit) as the time of record and
    * misclassify a genuine regression as an eviction storm, so they
    * are EXEMPT from the outlier re-measure: their first timing
    * stands, loud or not. */
  private[graft] val rerunExemptPrefixes =
    Seq("emb_glove", "txt_unigram", "ann_index_build",
        "ann_graph_build", "ann_graph_incr_build", "ann_graph_compact",
        "rag_ndcg_trained",
        // the BPE train/encode/pack rows (toy AND scaled) share one
        // memoized training per param set; txt_bpe_segment still
        // trains fresh (it needs the final vocab) and stays eligible
        "txt_bpe_train", "txt_bpe_encode", "pipe_pack_bpe",
        // fingerprint-guarded build in its own dir: a re-run serves warm
        "ann_graph_delete")
  private[graft] def rerunExempt(name: String): Boolean =
    rerunExemptPrefixes.exists(name.startsWith)

  /** Outlier re-measure trigger. Floor 5 s (sub-5 s noise is not
    * worth a re-run); the regression bound is min(3× prior-min,
    * prior-min + 15 s): the pure 3× rule let a query with ONE thin
    * prior artifact escape (r12: ann_graph_incr_build at 31.2 s just
    * cleared 3×11.26 s and polluted the round-over-round delta), and
    * the additive cap bounds how much absolute host noise a large
    * prior can hide. Memo/fingerprint-warm queries never re-run
    * (see [[rerunExempt]]). */
  private[graft] def shouldRerun(name: String, t1: Double,
                                 prior: Option[Double]): Boolean =
    t1 >= 5.0 && !rerunExempt(name) &&
      prior.exists(p => p > 0 && t1 > math.min(3 * p, p + 15.0))

  /** Best recent per-query timings for the outlier re-measure: the
    * per-query MIN over the newest three `BENCH_r{N}.json` round
    * artifacts in `dir` (the min approximates the quiet-host time —
    * an artifact that itself recorded the anomaly, like r11's
    * dedup_substrings 50.7 s, must not become the yardstick that
    * hides the next one). Missing dir / no artifacts / parse failure
    * all degrade to empty — the bench then simply re-runs nothing. */
  private[graft] def priorTimings(dir: String = ".",
                                  sfDir: String = ""): Map[String, Double] = {
    val re = raw"BENCH_r(\d+)\.json".r
    val files = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .flatMap(f => f.getName match {
        case re(n) => Some((n.toInt, f))
        case _ => None
      })
      .sortBy(-_._1).take(3)
    files.flatMap { case (_, f) =>
      try {
        val json = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        // only artifacts from the SAME scale factor are a yardstick:
        // an sf change between rounds would otherwise flag every
        // query as regressed (or hide every real regression)
        val sfM = java.util.regex.Pattern
          .compile("\"sf\"\\s*:\\s*\"([^\"]+)\"").matcher(json)
        if (sfDir.nonEmpty && sfM.find() && sfM.group(1) != sfDir) Seq.empty
        else parseQueryTimes(json).toSeq
      } catch { case scala.util.control.NonFatal(_) => Seq.empty }
    }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).min }
  }

  /** Pull the per-query map out of a round artifact without a JSON
    * dependency: the first UNESCAPED `"queries"` object (the
    * artifact's `tail` field holds a truncated stdout capture whose
    * quotes are escaped, so it cannot false-match). Times that fail
    * to parse (truncation mid-entry) are dropped. */
  private[graft] def parseQueryTimes(json: String): Map[String, Double] = {
    val m = java.util.regex.Pattern
      .compile("\"queries\"\\s*:\\s*\\{([^}]*)\\}").matcher(json)
    if (!m.find()) Map.empty
    else m.group(1).split(",").flatMap { kv =>
      kv.split(":") match {
        case Array(k, v) =>
          val name = k.trim.stripPrefix("\"").stripSuffix("\"")
          try if (name.nonEmpty) Some(name -> v.trim.toDouble) else None
          catch { case _: NumberFormatException => None }
        case _ => None
      }
    }.toMap
  }
}
