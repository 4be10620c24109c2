package graft.operators

import graft.plans.AsOfJoinNode
import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Cast, Expression}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** As-of (point-in-time) join: for each probe row, the most recent
  * build row with build.time <= probe.time on the same key.
  *
  * `asof` is the production path: a native whole-operator extension
  * (`AsOfJoinNode` → `SortMergeAsOfExec`, see plans/AsOfJoinPlan
  * .scala) planned as one streaming merge over the two key-clustered,
  * (key, time)-sorted sides. `asofComposed` keeps the builtin-only
  * formulation — tag/union + window-carry, same shuffle shape, more
  * executor work — as the semantic baseline the specs arbitrate the
  * exec against.
  *
  * Build-side ties on (key, time) must be broken before the join —
  * callers dedup to one build row per (key, time) (see
  * `Analytics.eventOrderAsOf`) — after which the result is exactly
  * DuckDB's `ASOF JOIN ... ON probe.t >= build.t`.
  */
object AsOfJoin {

  /** Native as-of join (SortMergeAsOfExec). Same contract as
    * `asofComposed`; mixed date/timestamp time columns are promoted
    * to timestamp with the session zone, mirroring the union
    * coercion of the composed form. */
  def asof(probe: DataFrame, build: DataFrame, key: String,
           probeTime: String, buildTime: String,
           buildCols: Seq[String]): DataFrame = {
    val spark = probe.sparkSession
    val lp = probe.queryExecution.analyzed
    val rp = build.queryExecution.analyzed
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             n: String): Attribute =
      plan.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in [${plan.output.map(_.name).mkString(", ")}]"))
    val (lt0, rt0) = (attr(lp, probeTime), attr(rp, buildTime))
    val tz = Some(spark.sessionState.conf.sessionLocalTimeZone)
    val (lt: Expression, rt: Expression) =
      if (lt0.dataType == rt0.dataType) (lt0, rt0)
      else (Cast(lt0, TimestampType, tz), Cast(rt0, TimestampType, tz))
    GraftBridge.ofRows(spark, AsOfJoinNode(lp, rp,
      attr(lp, key), attr(rp, key), lt, rt, buildCols.map(attr(rp, _))))
  }

  /** Composed baseline: tag and union both sides, sort by (key,
    * time, side) within key partitions, carry build attributes
    * forward with last(ignoreNulls). One hash shuffle on the key +
    * a per-key sort — the native exec's distribution cost, plus the
    * union padding and window machinery it avoids. */
  def asofComposed(probe: DataFrame, build: DataFrame, key: String,
                   probeTime: String, buildTime: String,
                   buildCols: Seq[String]): DataFrame = {
    val probeCols = probe.columns.toSeq
    // null keys never match (same as the native exec and SQL equality
    // join semantics) — drop null-key build rows so the window's
    // null-key partition can't carry them onto null-key probe rows
    val buildNn = build.filter(col(key).isNotNull)
    // side 0 = build (sorts first on time ties → inclusive <=), 1 = probe
    val buildTagged = buildNn.select(
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
