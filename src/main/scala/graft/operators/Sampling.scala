package graft.operators

import graft.functions.HashFunctions
import org.apache.spark.sql.DataFrame
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

  /** Exactly-n uniform sample: rank by salted md5 and keep the lowest
    * n. Runs as a distributed top-k (TakeOrdered: per-partition heap
    * then merge of n·partitions rows) — never a full global sort. */
  def uniformN(df: DataFrame, n: Int, keyCol: String = "doc_id",
               salt: String = "u"): DataFrame =
    df.withColumn("h", md5(concat(lit(s"$salt:"), col(keyCol))))
      .orderBy(col("h"))
      .limit(n)
}
