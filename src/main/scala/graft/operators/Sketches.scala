package graft.operators

import graft.functions.HashFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-size streaming sketches (Cormode & Muthukrishnan's count-min
  * sketch). Unlike the HLL++ estimate (`q_approx_distinct`, whose
  * value is engine-specific and verified by an accuracy contract),
  * a CMS built on md5-derived bucket hashes is fully deterministic —
  * the DuckDB oracle replays every cell bit-for-bit.
  */
object Sketches {

  /** Count-min heavy hitters: estimate the top-`topK` keys' counts
    * from a `depth`×`width` CMS and report them against the exact
    * counts (est ≥ exact always; the overcount column is the
    * collision error). Scale shape: the sketch build is ONE
    * aggregation onto depth×width cells — partial-aggregating
    * map-side into at most 256 rows regardless of corpus size, the
    * whole point of sketching — and the probe join broadcasts those
    * cells onto the topK candidate rows. The exact-count pass exists
    * only for the verification report; a production pipeline ships
    * the 256-cell sketch alone. */
  /** CMS point query: estimate each candidate key's count from an
    * existing cell table (e.g. the streaming build's state or a
    * persisted sketch) — min over the key's depth bucket counts.
    * The cells broadcast; keys never touch the raw stream. A cell
    * absent from the table counts as 0 (left join + coalesce): CMS
    * semantics give est_n = 0 for keys the sketch never saw, rather
    * than dropping them (all cells missing) or overestimating from
    * only the present cells. */
  def cmsEstimate(cells: DataFrame, keys: DataFrame, keyCol: String = "user_id",
                  depth: Int = 4, width: Int = 64): DataFrame =
    keys.select(col(keyCol).as("k"))
      .select(col("k"), explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .withColumn("bucket", pmod(md5Long(col("r"), col("k")), lit(width)))
      .join(broadcast(cells), Seq("r", "bucket"), "left")
      .groupBy(col("k"))
      .agg(min(coalesce(col("c"), lit(0L))).as("est_n"))
      .select(col("k").as(keyCol), col("est_n"))
      .orderBy(col(keyCol))

  def cmsHeavyHitters(events: DataFrame, keyCol: String = "user_id",
                      depth: Int = 4, width: Int = 64, topK: Int = 20): DataFrame = {
    val cells = events.select(col(keyCol).as("k"))
      .select(col("k"), explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .select(col("r"), pmod(md5Long(col("r"), col("k")), lit(width)).as("bucket"))
      .groupBy(col("r"), col("bucket")).agg(count(lit(1)).as("c"))
    val top = events.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("k")).limit(topK)
    top
      .select(col("k"), col("exact_n"),
        explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .withColumn("bucket", pmod(md5Long(col("r"), col("k")), lit(width)))
      .join(broadcast(cells), Seq("r", "bucket"))
      .groupBy(col("k"), col("exact_n"))
      .agg(min(col("c")).as("est_n"))
      .select(col("k").as(keyCol), col("exact_n"), col("est_n"),
        (col("est_n") - col("exact_n")).as("overcount"))
      .orderBy(col("exact_n").desc, col(keyCol))
  }
}
