package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-data mixture planning — what a pretraining pipeline runs
  * AFTER curation to decide how much of each source to train on and
  * in what order (mixture reweighting per the data-mixing literature
  * — DoReMi-style smoothing, temperature sampling — and length-based
  * curriculum schedules; see PAPERS.md. The reference's curation
  * stages stop at filtering; these are the planning operators the
  * same lakehouse feeds next).
  *
  * Scale shape: the corpus reduces to a MODEL-SIZED per-source table
  * (one row per source) in one map-side token count + one
  * groupBy(source) shuffle before any further math; the allocation /
  * weighting arithmetic runs on that model. Curriculum ranking reuses
  * the two-phase banded rank ([[Ranks]]) — no empty-partition-spec
  * window ever touches the document table.
  */
object TrainingMix {

  /** Per-source token mass: the model every mixture decision reads. */
  private def perSource(docs: DataFrame): DataFrame =
    docs.where(col("text").isNotNull)
      .select(col("source"), tokenCount(col("text")).as("n_tok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))

  /** Allocate a global token `budget` across sources proportionally
    * to their token mass, with LARGEST-REMAINDER rounding so the
    * allocations sum to the budget EXACTLY. All arithmetic is exact
    * integer math (`budget·n DIV total`, remainders compared as
    * integers, ties by source name), so the result is deterministic
    * on any partitioning and replayable by the oracle.
    *
    * The rounding needs the full per-source table at once; that table
    * is model-sized (one row per source), so it is collected and the
    * allocation computed driver-side — the same model-to-driver shape
    * as [[Ranks.withGlobalPrefixSum]]'s band offsets. */
  def tokenBudget(docs: DataFrame, budget: Long = 100000L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val per = perSource(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val total = per.iterator.map(_._3).sum
    val based = per.map { case (src, nd, nt) =>
      (src, nd, nt, budget * nt / total, budget * nt % total)
    }
    val leftover = budget - based.iterator.map(_._4).sum
    // one extra token to the `leftover` largest remainders (ties by
    // source name, already the sort order within equal remainders)
    val bump = based.sortBy { case (src, _, _, _, rem) => (-rem, src) }
      .take(leftover.toInt).map(_._1).toSet
    val rows = based.map { case (src, nd, nt, base, _) =>
      (src, nd, nt, base + (if (bump(src)) 1L else 0L))
    }
    rows.toSeq.toDF("source", "n_docs", "n_tokens", "alloc_tokens")
      .orderBy(col("source"))
  }

  /** Smoothed mixture weights: w_s ∝ √(token share) — the α=0.5
    * temperature reweighting that upsamples small sources without
    * letting any single giant source dominate. Emits the raw share,
    * the smoothed weight, and the effective over/under-sampling
    * factor (weight/share). Per-source √ masses are rounded then
    * DECIMAL-summed so the normalizer is order-independent; ratios
    * round to 6 dp with identical formulas in the oracle. */
  def mixtureWeights(docs: DataFrame): DataFrame = {
    val per = perSource(docs)
    val sw = round(sqrt(col("n_tokens").cast("double")), 6)
      .cast("decimal(18,6)")
    val withSw = per.withColumn("sw", sw)
    val tot = withSw.agg(
      sum(col("n_tokens")).as("total_tokens"),
      sum(col("sw")).as("total_sw"))
    withSw.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens").cast("double") / col("total_tokens"), 6).as("share"),
        // exact DECIMAL totals, but the DIVISIONS happen in IEEE
        // double on both engines (decimal-division scale rules differ
        // between Spark and DuckDB)
        round(col("sw").cast("double") / col("total_sw").cast("double"), 6).as("weight"),
        round((col("sw").cast("double") / col("total_sw").cast("double")) /
          (col("n_tokens").cast("double") / col("total_tokens")), 4).as("sampling_factor"))
      .orderBy(col("source"))
  }

  /** Epochs-per-source plan under a global token budget: the
    * smoothed (α=0.5) mixture weight fixes each source's token
    * TARGET, and target/available is the number of PASSES over that
    * source — >1 means the small source repeats across epochs
    * (upsampling), <1 means the giant source is subsampled inside
    * one pass. The LLaMA-style sampling-ratio table a dataloader
    * consumes. Model-sized end to end (one row per source); weight
    * rounds to 6 dp BEFORE the target multiply so the integer floor
    * is bit-identical on both engines. */
  def epochPlan(docs: DataFrame, budget: Long = 1000000L): DataFrame = {
    val per = perSource(docs)
    val sw = round(sqrt(col("n_tokens").cast("double")), 6).cast("decimal(18,6)")
    val withSw = per.withColumn("sw", sw)
    val tot = withSw.agg(sum(col("sw")).as("total_sw"))
    withSw.crossJoin(broadcast(tot))
      .withColumn("weight",
        round(col("sw").cast("double") / col("total_sw").cast("double"), 6))
      .withColumn("target_tokens", floor(col("weight") * budget).cast("long"))
      .select(col("source"), col("n_tokens"), col("weight"), col("target_tokens"),
        round(col("target_tokens").cast("double") / col("n_tokens"), 4).as("epochs"),
        floor(col("target_tokens").cast("double") / col("n_tokens"))
          .cast("long").as("full_passes"))
      .orderBy(col("source"))
  }

  /** Length-curriculum order: documents banded into difficulty
    * phases by fixed length thresholds (easy < `easyMax`, medium <
    * `midMax`, hard), then given ONE global training order — phases
    * in sequence, deterministic md5 shuffle within each phase. The
    * rank is exact and global yet no global window runs: phase and an
    * md5 hex prefix form the order-preserving band for the two-phase
    * banded rank ([[Ranks.withGlobalRank]]). */
  /** DoReMi-style domain reweighting (Xie et al., NeurIPS 2023) —
    * the deterministic one-shot analogue of the proxy-model loop:
    * each domain's "excess loss" is the EXACT KL divergence between
    * its unigram distribution and the corpus mixture (what a unigram
    * reference model would measure), and one exponentiated-gradient
    * step lifts the token-share prior by exp(η·KL) — domains far
    * from the average mix get upweighted, near-duplicate domains
    * collapse toward their share.
    *
    * Scale shape: one (source, word) count shuffle — the standard
    * O(domains · vocab) model table; the corpus-marginal join runs
    * vocab-keyed (NOT broadcast — the vocabulary is not model-sized
    * at 100 TB), while the per-domain totals and the normalizer are.
    * KL terms are 8dp-rounded then DECIMAL-summed (products only, no
    * FMA shapes), the EG numerators 8dp DECIMAL before the exact
    * normalizing sum, so weights are bit-stable on any partitioning
    * and both engines. */
  def doremiWeights(docs: DataFrame, eta: Double = 1.0,
                    contentCol: String = "text"): DataFrame = {
    val cnt = docs.where(col(contentCol).isNotNull)
      .select(col("source"), explode(tokens(lower(col(contentCol)))).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
    val perDom = cnt.groupBy(col("source")).agg(sum(col("c")).as("nd"))
    val perWord = cnt.groupBy(col("w")).agg(sum(col("c")).as("cw"))
    val tot = perDom.agg(sum(col("nd")).as("n"))
    val terms = cnt.join(perWord, Seq("w"))
      .join(broadcast(perDom), Seq("source"))
      .crossJoin(broadcast(tot))
      .select(col("source"), col("nd"),
        round((col("c").cast("double") / col("nd")) *
          log((col("c").cast("double") / col("nd")) /
            (col("cw").cast("double") / col("n"))), 8).as("t8"))
    val kl = terms.groupBy(col("source"), col("nd"))
      .agg(sum(col("t8").cast("decimal(18,8)")).as("klSum"))
    val raw = kl.crossJoin(broadcast(tot))
      .select(col("source"), col("nd").as("n_tokens"),
        col("klSum").cast("double").as("klv"),
        round((col("nd").cast("double") / col("n")) *
          exp(lit(eta) * col("klSum").cast("double")), 8)
          .cast("decimal(18,8)").as("raw8"))
    val z = raw.agg(sum(col("raw8")).as("z"))
    raw.crossJoin(broadcast(z))
      .select(col("source"), col("n_tokens"),
        round(col("klv"), 6).as("kl"),
        round(col("raw8").cast("double") / col("z").cast("double"), 6).as("weight"))
      .orderBy(col("source"))
  }

  def curriculum(docs: DataFrame, easyMax: Int = 250, midMax: Int = 450): DataFrame = {
    val base = docs.where(col("text").isNotNull)
      .select(col("doc_id"),
        when(length(col("text")) < easyMax, 1L)
          .when(length(col("text")) < midMax, 2L)
          .otherwise(3L).as("phase"),
        md5(col("text")).as("sk"))
    val band = col("phase") * 16 + conv(substring(col("sk"), 1, 1), 16, 10).cast("long")
    val (ranked, _) = Ranks.withGlobalRank(base, band,
      Seq(col("phase"), col("sk"), col("doc_id")), "curriculum_rank")
    ranked.select(col("doc_id"), col("phase"), col("curriculum_rank"))
      .orderBy(col("curriculum_rank"))
  }
}
