package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality monitoring suite (reference:
  * src/helpers/duckdb_queries.py:27-100 and delta_queries.py:46-62).
  *
  * Every metric is a single partial-aggregating groupBy — map-side
  * combine makes each a one-shuffle (or zero-shuffle global agg)
  * job regardless of input size.
  */
object Quality {

  /** Per-source record counts (duckdb_queries.py:34-41). */
  def recordCounts(docs: DataFrame, by: String = "source"): DataFrame =
    docs.groupBy(col(by)).agg(count(lit(1)).as("record_count"))
      .orderBy(col(by))

  /** Content-length stats per source (duckdb_queries.py:48-60). */
  def lengthStats(docs: DataFrame, contentCol: String = "text", by: String = "source"): DataFrame =
    docs.groupBy(col(by)).agg(
      round(avg(length(col(contentCol))), 4).as("avg_length"),
      min(length(col(contentCol))).cast("long").as("min_length"),
      max(length(col(contentCol))).cast("long").as("max_length"))
      .orderBy(col(by))

  /** Missing-value counts (duckdb_queries.py:69-82): count(*) −
    * count(col) per audited column. */
  def missingValues(docs: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.map(c => (count(lit(1)) - count(col(c))).as(s"missing_$c"))
    docs.agg(count(lit(1)).as("total_records"), aggs: _*)
  }

  /** Duplicate analysis (duckdb_queries.py:120-128): total vs
    * distinct vs duplicate content rows. */
  def duplicateAnalysis(docs: DataFrame, contentCol: String = "text"): DataFrame =
    docs.agg(
      count(lit(1)).as("total_records"),
      countDistinct(col(contentCol)).as("unique_content"),
      (count(lit(1)) - countDistinct(col(contentCol))).as("duplicates"))

  /** Top-k word frequency over words longer than `minLen`
    * (duckdb_queries.py:103-117). Explode + partial-agg count: the
    * only shuffle carries (word, partial count) pairs. */
  def wordFrequency(docs: DataFrame, contentCol: String = "text",
                    minLen: Int = 3, k: Int = 20): DataFrame =
    docs
      .select(explode(tokens(lower(col(contentCol)))).as("word"))
      .where(length(col("word")) > minLen)
      .groupBy("word").agg(count(lit(1)).as("frequency"))
      .orderBy(col("frequency").desc, col("word"))
      .limit(k)

  /** Top sources by average content length (duckdb_queries.py:150-159). */
  def topSourcesByLength(docs: DataFrame, contentCol: String = "text",
                         by: String = "source", k: Int = 5): DataFrame =
    docs.groupBy(col(by))
      .agg(round(avg(length(col(contentCol))), 4).as("avg_length"))
      .orderBy(col("avg_length").desc, col(by))
      .limit(k)
}
