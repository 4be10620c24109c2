package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling utilities.
  *
  * AQE's skew-join splitting handles most runtime skew; these are the
  * explicit tools for the cases AQE can't see — a hot aggregation key
  * (AQE only splits *join* partitions) or a deliberately salted
  * two-phase rollup at 100 TB.
  */
object Skew {

  /** Two-phase salted aggregation: count/sum-like aggregates over a
    * skewed key. Phase 1 groups on (key, salt) — the hot key's rows
    * spread across `buckets` reducers — phase 2 merges the partials.
    * Only algebraic aggregates compose this way; the API takes the
    * (partial, merge) pair explicitly.
    */
  def saltedCount(df: DataFrame, key: String, buckets: Int = 16): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as("cnt"))

  /** Salted broadcast join for one known-hot key set: hot keys take
    * the replicated-broadcast path (no shuffle of the hot rows at
    * all), the long tail takes the normal shuffle join, results
    * union. `hotKeys` is small by construction (you found them with
    * a count). */
  def hotColdJoin(facts: DataFrame, dim: DataFrame, key: String,
                  hotKeys: Seq[Long]): DataFrame = {
    val hot = facts.where(col(key).isin(hotKeys: _*))
      .join(broadcast(dim), key)
    val cold = facts.where(!col(key).isin(hotKeys: _*))
      .join(dim, key)
    hot.unionByName(cold)
  }
}
