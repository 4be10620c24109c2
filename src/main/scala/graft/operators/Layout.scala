package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multi-dimensional data layout (Z-ordering) and its payoff:
  * min/max file skipping, measured.
  *
  * A lakehouse table clustered on ONE key skips row groups only for
  * predicates on that key. Interleaving the bits of two keys (the
  * Morton / Z-order curve) makes files square-ish regions of the
  * (k1, k2) plane, so min/max pruning works for box predicates on
  * EITHER OR BOTH keys — the layout trick behind OPTIMIZE ZORDER BY.
  *
  * Everything here is exact integer arithmetic on builtin codegen'd
  * expressions (shifts, masks, adds): no UDF, no sort. File
  * assignment is fixed-width bucketing of the Z-value — map-only, so
  * the "rewrite" shuffles once on file_id at any scale, and the
  * skipping statistics are one O(files) aggregation.
  */
object Layout {

  /** Morton-interleave the low `bits` bits of two non-negative int
    * columns: bit i of `a` lands at position 2i+1, bit i of `b` at
    * 2i. Pure shift/mask/add chain — whole-stage codegen keeps it in
    * the scan stage. */
  def zorderValue(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftright(a.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)) +
        shiftright(b.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))
    }.reduce(_ + _)

  /** Hilbert curve index of two non-negative int columns on a
    * 2^bits × 2^bits grid — the space-filling curve behind liquid
    * clustering. Unlike the Morton interleave, CONSECUTIVE Hilbert
    * cells are always grid neighbors (no quadrant jumps), so range
    * clustering on this value yields tighter per-file bounding boxes
    * and strictly better min/max skipping on box predicates. Native
    * codegen'd expression ([[graft.plans.NativeExprs.HilbertIndex]]):
    * the per-level rotation is inherently a loop, which composed
    * Columns cannot express without a 3^bits expression tree. */
  def hilbertValue(a: Column, b: Column, bits: Int = 16): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.NativeExprs.HilbertIndex(
        org.apache.spark.sql.GraftBridge.expression(a.cast("long")),
        org.apache.spark.sql.GraftBridge.expression(b.cast("long")), bits))

  /** N-dimensional Hilbert index (2-8 coordinates) via Skilling's
    * transpose algorithm — the curve behind CLUSTER BY on more than
    * two columns. Same bijection/adjacency guarantees as the 2-D
    * form (a different but equally valid orientation). */
  def hilbertValueN(cols: Seq[Column], bits: Int = 16): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.NativeExprs.HilbertIndexN(
        cols.map(c => org.apache.spark.sql.GraftBridge.expression(c.cast("long"))), bits))

  /** Per-file min/max stats after laying `df` out by `fileKey` into
    * fixed-width buckets: the footer statistics a parquet writer
    * would record. */
  private def fileStats(df: DataFrame, fileKey: Column): DataFrame =
    df.groupBy(fileKey.as("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("k1")).as("min_k1"), max(col("k1")).as("max_k1"),
        min(col("k2")).as("min_k2"), max(col("k2")).as("max_k2"))

  /** Compare Z-order against single-key (linear) clustering for a box
    * predicate on (l_partkey, l_suppkey) over lineitem.
    *
    * Keys normalize against their ACTUAL domain (one tiny min/max
    * aggregate, broadcast back — what a range-clustering OPTIMIZE
    * derives from its sample) into 8-bit coordinates, so the bucketing
    * is meaningful at every scale factor. The predicate box is
    * fractional for the same reason: k1 in [10%, 30%] of its range,
    * k2 in [20%, 30%] — selective on both dimensions, which is
    * exactly where Z-order beats linear (linear can prune on k1
    * alone; only the interleave prunes on k2 too).
    *
    * Both layouts pack the same rows into the same NUMBER of
    * fixed-width buckets; the only difference is the clustering key.
    * Output, one row per layout: how many files exist, how many a
    * min/max-pruning scan must read, and how many rows those surviving
    * files hold (the I/O actually paid). rows_matched is identical
    * across layouts — the layout changes cost, never the answer. */
  def skippingStats(spark: SparkSession, dir: String, nFiles: Int = 64): DataFrame = {
    val stats = Tables.lineitem(spark, dir).agg(
      min(col("l_partkey")).as("k1min"), max(col("l_partkey")).as("k1max"),
      min(col("l_suppkey")).as("k2min"), max(col("l_suppkey")).as("k2max"))
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey").as("k1"), col("l_suppkey").as("k2"))
      .crossJoin(broadcast(stats))
      .withColumn("n1", expr("(k1 - k1min) * 256 div (k1max - k1min + 1)"))
      .withColumn("n2", expr("(k2 - k2min) * 256 div (k2max - k2min + 1)"))
      // the fractional predicate box, in raw-key space
      .withColumn("k1lo", expr("k1min + (k1max - k1min + 1) * 10 div 100"))
      .withColumn("k1hi", expr("k1min + (k1max - k1min + 1) * 30 div 100"))
      .withColumn("k2lo", expr("k2min + (k2max - k2min + 1) * 20 div 100"))
      .withColumn("k2hi", expr("k2min + (k2max - k2min + 1) * 30 div 100"))
    val zorder = li.withColumn("zval", zorderValue(col("n1"), col("n2"), 8))
      .withColumn("file_id", expr(s"zval * $nFiles div 65536"))
    // linear: clustered on k1 alone (the one-key ORDER BY layout)
    val linear = li.withColumn("file_id", expr(s"n1 * $nFiles div 256"))

    def statsFor(name: String, laid: DataFrame): DataFrame = {
      val files = laid.groupBy(col("file_id"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("k1")).as("min_k1"), max(col("k1")).as("max_k1"),
          min(col("k2")).as("min_k2"), max(col("k2")).as("max_k2"),
          // bounds are constant per row; min() just carries them out
          min(col("k1lo")).as("k1lo"), min(col("k1hi")).as("k1hi"),
          min(col("k2lo")).as("k2lo"), min(col("k2hi")).as("k2hi"))
      val scanned = files.where(
        col("max_k1") >= col("k1lo") && col("min_k1") <= col("k1hi") &&
          col("max_k2") >= col("k2lo") && col("min_k2") <= col("k2hi"))
      val matched = laid.where(
        col("k1").between(col("k1lo"), col("k1hi")) &&
          col("k2").between(col("k2lo"), col("k2hi")))
        .agg(count(lit(1)).as("rows_matched"))
      files.agg(count(lit(1)).as("n_files"), sum(col("n_rows")).as("n_rows_total"))
        .crossJoin(scanned.agg(
          count(lit(1)).as("files_scanned"),
          coalesce(sum(col("n_rows")), lit(0L)).as("rows_scanned")))
        .crossJoin(matched)
        .select(lit(name).as("layout"), col("n_files"), col("files_scanned"),
          col("n_rows_total"), col("rows_scanned"), col("rows_matched"))
    }
    statsFor("linear", linear).unionByName(statsFor("zorder", zorder))
      .orderBy(col("layout"))
  }
}
