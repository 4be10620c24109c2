package graft.operators

import graft.functions.HashFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation.
  *
  * Both samplers are hash-based rather than RNG-based: the sample is
  * a pure function of the row key, so it is reproducible across
  * runs, engines (the DuckDB oracle replays the same md5 formula),
  * partitionings, and retries — the property `rand()`-based sampling
  * loses the moment a task is re-executed.
  */
object Sampling {

  /** Keep rows whose salted 48-bit md5 lands in the lowest `pct`
    * buckets of 100. Map-only (filter pushes to the scan), uniform
    * within every stratum of any column — so it IS a stratified
    * sample for free, no per-group state. */
  def hashSample(df: DataFrame, pct: Int, keyCol: String = "doc_id",
                 salt: String = "samp"): DataFrame =
    df.where(
      HashFunctions.md5Long(concat(lit(s"$salt:"), col(keyCol))) % 100 < pct)

  /** Mixture/domain-weighted sampling: per-row keep rate comes from a
    * rate Column (percent, 0–100) — e.g. upweight curated sources,
    * downweight crawl. Same hash discipline as `hashSample`: map-only
    * and retry-stable. */
  def weightedSample(df: DataFrame, rate: Column, keyCol: String = "doc_id",
                     salt: String = "mix"): DataFrame =
    df.where(
      HashFunctions.md5Long(concat(lit(s"$salt:"), col(keyCol))) % 100 < rate)

  /** Deterministic train/val/test assignment from the key hash:
    * bucket < trainPct → train, < trainPct+valPct → val, else test.
    * A document lands in the same split on every engine and every
    * run — the property that keeps eval sets leak-free. */
  def splitAssign(df: DataFrame, trainPct: Int = 80, valPct: Int = 10,
                  keyCol: String = "doc_id", salt: String = "split"): DataFrame = {
    val bucket = HashFunctions.md5Long(concat(lit(s"$salt:"), col(keyCol))) % 100
    df.withColumn("split",
      when(bucket < trainPct, lit("train"))
        .when(bucket < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }

  /** Exactly-n per stratum: rank rows inside each group by salted
    * hash and keep the lowest n — the balanced-mixture builder
    * (equal docs per source regardless of source sizes). The window
    * partitions by the stratum, so groups rank in parallel; the
    * ranked input is one row per DOC, not per token. */
  /** Class-balanced downsampling: every class keeps exactly the size
    * of the SMALLEST class, chosen by hash rank within the class
    * (deterministic, retry-stable) — the classic rebalance before
    * training a classifier on skewed labels. The floor is one tiny
    * counts aggregate broadcast back; ranking is a per-class window
    * (O(class size) state, parallel across classes). Returns the
    * per-class audit (n_orig, n_kept, plus the kept-id checksum so
    * the oracle pins WHICH rows survived, not just how many). */
  def balancedClasses(df: DataFrame, byCol: String = "lang",
                      keyCol: String = "doc_id", salt: String = "bal"): DataFrame = {
    val floor = df.groupBy(col(byCol)).agg(count(lit(1)).as("n_orig"))
      .agg(min(col("n_orig")).as("floor_n"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(byCol))
      .orderBy(md5(concat(lit(s"$salt:"), col(keyCol))), col(keyCol))
    df.select(col(byCol), col(keyCol))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .crossJoin(broadcast(floor))
      .groupBy(col(byCol))
      .agg(count(lit(1)).as("n_orig"),
        sum(when(col("rnk") <= col("floor_n"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("rnk") <= col("floor_n"), col(keyCol)).otherwise(lit(0L)))
          .as("kept_id_sum"))
      .orderBy(col(byCol))
  }

  def stratifiedN(df: DataFrame, n: Int, byCol: String = "source",
                  keyCol: String = "doc_id", salt: String = "sn"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(byCol))
      .orderBy(md5(concat(lit(s"$salt:"), col(keyCol))))
    df.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= n)
  }

  /** Temperature-flattened mixture sampling (the multilingual /
    * multi-domain rebalancer): target share of source s ∝ sqrt(n_s)
    * (temperature α = 0.5), scaled so the expected sample is
    * `targetFrac` of the corpus, capped at keeping a source whole.
    * The per-source rates derive from one tiny counts aggregate
    * (DECIMAL-summed sqrt weights, so the denominator is partition-
    * order independent) and broadcast back onto the corpus as a pure
    * hash predicate — map-only over the data, retry-stable, and
    * replayable in SQL. Returns (source, n_orig, rate_pct,
    * n_sampled). */
  def temperatureMixture(df: DataFrame, targetFrac: Double = 0.5,
                         byCol: String = "source", keyCol: String = "doc_id",
                         salt: String = "temp"): DataFrame = {
    val counts = df.groupBy(col(byCol)).agg(count(lit(1)).as("n"))
    val denom = counts.agg(
      sum(round(sqrt(col("n").cast("double")), 6).cast("decimal(18,6)"))
        .cast("double").as("denom"),
      sum(col("n")).as("total"))
    // fixed association order, mirrored verbatim in the oracle:
    // ((100.0 * (targetFrac * total)) * (w / denom)) / n
    val rates = counts.crossJoin(broadcast(denom))
      .withColumn("w", round(sqrt(col("n").cast("double")), 6))
      .withColumn("rate_pct", least(lit(100.0),
        lit(100.0) * (lit(targetFrac) * col("total")) * (col("w") / col("denom")) / col("n")))
      .select(col(byCol), col("n").as("n_orig"), col("rate_pct"))
    df.join(broadcast(rates), byCol)
      .where(HashFunctions.md5Long(concat(lit(s"$salt:"), col(keyCol))) % 10000 <
        col("rate_pct") * 100)
      .groupBy(col(byCol), col("n_orig"), col("rate_pct"))
      .agg(count(lit(1)).as("n_sampled"))
      .select(col(byCol), col("n_orig"), round(col("rate_pct"), 6).as("rate_pct"),
        col("n_sampled"))
      .orderBy(col(byCol))
  }

  /** Exactly-n uniform sample: rank by salted md5 and keep the lowest
    * n. Runs as a distributed top-k (TakeOrdered: per-partition heap
    * then merge of n·partitions rows) — never a full global sort. */
  def uniformN(df: DataFrame, n: Int, keyCol: String = "doc_id",
               salt: String = "u"): DataFrame =
    df.withColumn("h", md5(concat(lit(s"$salt:"), col(keyCol))))
      .orderBy(col("h"))
      .limit(n)

  /** Token-balanced shard assignment: documents in deterministic
    * hash order are cut into `nShards` contiguous ranges of
    * near-equal TOKEN mass — the data-parallel sharding that keeps
    * every trainer rank fed evenly (doc-count round-robin skews by
    * doc length). shard = ⌊start·N / total⌋ in exact integer math
    * over the exclusive running sum, computed with the classic
    * two-phase prefix form (`Ranks.withGlobalPrefixSum`): md5-prefix
    * bands (4096 order-preserving buckets — lowercase fixed-width
    * hex, so lexicographic == numeric prefix order) → per-band token
    * sums collected as a ≤4096-row model → per-band running-sum
    * window + band offset. No single task ever sorts the corpus.
    * Returns the per-shard summary. */
  def shardAssign(docs: DataFrame, nShards: Int = 8,
                  contentCol: String = "text", keyCol: String = "doc_id",
                  salt: String = "shard"): DataFrame = {
    import graft.functions.TextFunctions.tokenCount
    val t = docs.select(col(keyCol).as("id"),
      tokenCount(col(contentCol)).as("n_tok"),
      md5(concat(lit(s"$salt:"), col(keyCol))).as("h"))
    val band = expr("conv(substring(h, 1, 3), 16, 10)").cast("long")
    val (p, total) =
      Ranks.withGlobalPrefixSum(t, band, Seq(col("h")), col("n_tok"), "excl")
    // integer `div`, not `/`: Spark's / is always fractional and a
    // float detour could misround at extreme token totals
    p.select(col("id"), col("n_tok"),
        expr(s"(excl * $nShards) div ${math.max(total, 1L)}L")
          .cast("long").as("shard"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .orderBy(col("shard"))
  }

  /** DSIR-style importance weights (Xie et al., NeurIPS 2023):
    * per-doc log-likelihood ratio between a hashed-unigram LM of the
    * TARGET domain and one of the rest of the corpus — the score
    * data-selection-for-pretraining resamples by. Tokens hash into
    * `buckets` md5 buckets (the hashed n-gram trick that keeps both
    * LMs O(buckets), engine-replayable, and broadcastable at any
    * corpus size); both models are Laplace-smoothed integer ratios,
    * (c_b + 1)/(C + buckets). Per-token terms are rounded then
    * DECIMAL-summed; the mean stays a raw quotient. Shape: one
    * explode + one O(buckets) aggregation + a broadcast join back —
    * the corpus never shuffles. */
  /** The trained DSIR model alone: per-bucket log-likelihood ratio
    * between the target domain's hashed-unigram LM and the rest's.
    * O(buckets) rows — materialize/broadcast it and score streams
    * with `StreamingCuration.dsirGate`. */
  def llrModel(docs: DataFrame, targetSource: String = "src0",
               buckets: Int = 128, contentCol: String = "text"): DataFrame = {
    import graft.functions.TextFunctions.tokens
    val tk = docs
      .select(col("source"), explode(tokens(col(contentCol))).as("tok"))
      .withColumn("b", HashFunctions.md5Long(col("tok")) % buckets)
    val isT = col("source") === targetSource
    val model = tk.groupBy(col("b"))
      .agg(sum(when(isT, 1L).otherwise(0L)).as("tb"),
        sum(when(isT, 0L).otherwise(1L)).as("rb"))
    val totals = model.agg(sum(col("tb")).as("tt"), sum(col("rb")).as("rt"))
    model.crossJoin(broadcast(totals))
      .select(col("b"), round(
        log((col("tb") + 1).cast("double") / (col("tt") + buckets)) -
          log((col("rb") + 1).cast("double") / (col("rt") + buckets)), 6).as("llr"))
  }

  def importanceWeights(docs: DataFrame, targetSource: String = "src0",
                        buckets: Int = 128, contentCol: String = "text"): DataFrame = {
    import graft.functions.TextFunctions.tokens
    val tk = docs
      .select(col("doc_id"), col("source"), explode(tokens(col(contentCol))).as("tok"))
      .withColumn("b", HashFunctions.md5Long(col("tok")) % buckets)
    val lr = llrModel(docs, targetSource, buckets, contentCol)
    val perDoc = tk.join(broadcast(lr), "b")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("llr").cast("decimal(18,6)")).cast("double").as("llr_sum"))
    docs.select(col("doc_id"), col("source"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("llr_sum"), (col("llr_sum") / col("n_tokens")).as("avg_llr"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic bootstrap replicate counts: each doc draws
    * `trials` hash-derived uniforms (md5, the engine's seedless RNG)
    * and counts those under `thresholdPerMille`/1000 — Binomial(n,p)
    * replicates with NO RNG state, so every executor, every retry,
    * and the SQL oracle agree row for row. The per-doc draw is
    * map-only; the histogram shuffle carries ≤ trials+1 groups.
    * Bootstrap resampling at corpus scale (ensemble training splits,
    * uncertainty estimates over quality metrics) is exactly this
    * shape: replicate multiplicities, never materialized copies. */
  def bootstrapCounts(docs: DataFrame, trials: Int = 8,
                      thresholdPerMille: Int = 125): DataFrame = {
    val reps = (0 until trials).map { j =>
      when(HashFunctions.md5Long(
        concat(lit(s"b$j:"), col("doc_id").cast("string"))) % 1000 < thresholdPerMille,
        1L).otherwise(0L)
    }.reduce(_ + _)
    docs.select(col("doc_id"), reps.as("replicates"))
      .groupBy(col("replicates"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("replicates"))
  }

  /** Effective sample size of source-balancing importance weights —
    * the diagnostic a weighted-mixture training run checks BEFORE
    * paying for an epoch: reweighting every source to a uniform
    * target share gives each doc w = (N/S)/n_src, and
    * n_eff = (Σw)²/Σw² says how many i.i.d. docs the weighted corpus
    * is actually worth (Kish 1965); deff = N/n_eff is the variance
    * inflation. A corpus already balanced scores n_eff = N; one
    * dominated by a single source collapses toward S·(smallest
    * share)·N. Scale shape: Σw and Σw² factor through the per-source
    * count table — Σ_s n_s·w_s and Σ_s n_s·w_s² — so after ONE
    * partial-agg count shuffle everything is model-sized arithmetic
    * on exact integer counts; no per-doc weight column ever
    * materializes. */
  def effectiveSampleSize(docs: DataFrame, by: String = "source"): DataFrame = {
    val counts = docs.groupBy(col(by)).agg(count(lit(1)).as("n_s"))
    val tot = counts.agg(sum(col("n_s")).as("n"), count(lit(1)).as("s"))
    // w_s = (N/S)/n_s; Σw = Σ n_s·w_s = N exactly; Σw² = Σ n_s·w_s²
    val sw2 = counts.crossJoin(broadcast(tot))
      .select((col("n_s") *
        pow(col("n").cast("double") / col("s") / col("n_s"), 2)).as("t"),
        col("n"), col("s"))
      .groupBy(col("n"), col("s"))
      .agg(sum(round(col("t"), 6).cast("decimal(28,6)")).cast("double").as("sw2"))
    val neff = col("n") * col("n") / col("sw2")
    sw2.select(col("n").cast("long").as("n_docs"),
      col("s").cast("long").as("n_sources"),
      round(neff, 4).as("n_eff"),
      round(col("n") / neff, 6).as("deff"))
  }
}
