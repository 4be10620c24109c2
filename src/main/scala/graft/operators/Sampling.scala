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
  def stratifiedN(df: DataFrame, n: Int, byCol: String = "source",
                  keyCol: String = "doc_id", salt: String = "sn"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(byCol))
      .orderBy(md5(concat(lit(s"$salt:"), col(keyCol))))
    df.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= n)
  }

  /** Exactly-n uniform sample: rank by salted md5 and keep the lowest
    * n. Runs as a distributed top-k (TakeOrdered: per-partition heap
    * then merge of n·partitions rows) — never a full global sort. */
  def uniformN(df: DataFrame, n: Int, keyCol: String = "doc_id",
               salt: String = "u"): DataFrame =
    df.withColumn("h", md5(concat(lit(s"$salt:"), col(keyCol))))
      .orderBy(col("h"))
      .limit(n)
}
