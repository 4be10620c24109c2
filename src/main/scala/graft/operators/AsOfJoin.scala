package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each probe row, the most recent
  * build row with build.time <= probe.time on the same key.
  *
  * Spark has no asof operator; per the extension ladder the right
  * first move is *composition*, and asof composes exactly: tag and
  * union both sides, sort by (key, time, side) within key partitions,
  * and carry build attributes forward with last_value(ignoreNulls).
  * One hash shuffle on the key + a per-key sort — the same cost
  * profile a native asof-merge exec would have, and AQE handles key
  * skew. (A custom LogicalPlan/Strategy would only buy avoiding the
  * union's column padding, not a different shuffle shape.)
  *
  * Build-side ties on (key, time) must be broken before the join —
  * callers dedup to one build row per (key, time) (see
  * `Analytics.eventOrderAsOf`) — after which the result is exactly
  * DuckDB's `ASOF JOIN ... ON probe.t >= build.t`.
  */
object AsOfJoin {

  /** @param probe  rows asking "state as of my time"
    * @param build  rows defining state changes; one row per (key, time)
    * @param key    equi-join key column name (same name both sides)
    * @param probeTime/buildTime  event-time column names
    * @param buildCols build-side columns to carry onto probe rows */
  def asof(probe: DataFrame, build: DataFrame, key: String,
           probeTime: String, buildTime: String,
           buildCols: Seq[String]): DataFrame = {
    val probeCols = probe.columns.toSeq
    // side 0 = build (sorts first on time ties → inclusive <=), 1 = probe
    val buildTagged = build.select(
      (col(key).as(key) +: col(buildTime).as("_t") +: lit(0).as("_side") +:
        (buildCols.map(c => col(c).as(s"_b_$c")) ++
          probeCols.filterNot(_ == key).map(c => lit(null).cast(probe.schema(c).dataType).as(c)))): _*)
    val probeTagged = probe.select(
      (col(key).as(key) +: col(probeTime).cast("timestamp").as("_t") +: lit(1).as("_side") +:
        (buildCols.map(c => lit(null).cast(build.schema(c).dataType).as(s"_b_$c")) ++
          probeCols.filterNot(_ == key).map(col))): _*)
    val unioned = probeTagged.unionByName(buildTagged)
    val w = Window.partitionBy(col(key)).orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // carry ALL build columns as one struct so every output column
    // comes from the same build row even when some are null; the
    // struct is nulled out on probe rows so ignoreNulls skips them
    val packed = when(col("_side") === 0,
      struct(buildCols.map(c => col(s"_b_$c").as(c)): _*))
    unioned
      .withColumn("_asof", last(packed, ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select((probeCols.map(col) ++ buildCols.map(c => col(s"_asof.$c").as(c))): _*)
  }
}
