package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact ranking without a global window.
  *
  * `Window.orderBy` with no partition key is the one Spark construct
  * that cannot scale: every input row flows through ONE task's sort.
  * The classic two-phase rewrite used here keeps the exact same
  * answer while staying fully parallel:
  *
  *   1. band every row by an ORDER-PRESERVING function of the sort
  *      key (value-range bands from one `approx_percentile`
  *      aggregate, or a hex prefix of an md5 sort key);
  *   2. aggregate the per-band mass — a model-sized table (one row
  *      per band) collected to the driver and scanned into exclusive
  *      prefix offsets;
  *   3. rank within each band (a Window WITH a partition key — fully
  *      parallel) and add the band's offset.
  *
  * Band quality affects only balance, never correctness: offsets are
  * exact per-band totals, and because the band function is monotone
  * in the sort key, rows that compare equal always share a band.
  * (Mirrors the two-phase prefix-sum in TeraSort-style partitioners;
  * the reference computes the same shapes single-node in DuckDB,
  * e.g. /root/reference/src/eval/eval.py-style rank reports.)
  */
object Ranks {

  /** Ascending band index of `v` given sorted boundary literals: the
    * number of boundaries ≤ v (so equal values share a band and the
    * index is monotone in v). `descending = true` flips the index so
    * it is monotone in DESCENDING v — for `ORDER BY v DESC` ranks. */
  def valueBands(v: Column, boundaries: Seq[Double],
                 descending: Boolean = false): Column =
    if (boundaries.isEmpty) lit(0L)
    else {
      val arr = array(boundaries.map(lit): _*)
      val asc = size(filter(arr, b => b <= v.cast("double"))).cast("long")
      if (descending) lit(boundaries.length.toLong) - asc else asc
    }

  /** Band boundaries for a numeric column from ONE approx_percentile
    * aggregate — a ≤(bands-1)-value model read to the driver. Rank
    * exactness never depends on these values; they only balance the
    * per-band sorts, so the sketch's approximation is harmless. */
  def percentileBoundaries(df: DataFrame, v: Column, bands: Int): Seq[Double] = {
    val ps = (1 until bands).map(i => i.toDouble / bands)
    val row = df
      .agg(percentile_approx(v.cast("double"), array(ps.map(lit): _*),
        lit(10000)).as("bs"))
      .head()
    if (row.isNullAt(0)) Seq.empty
    else row.getSeq[Double](0).distinct.sorted
  }

  /** Exclusive global prefix sum of `measure` under `order`, written
    * to column `out`; returns the frame plus the grand total. `band`
    * must be an order-preserving, deterministic function of the sort
    * key. Phase 1 collects one sum per band (model-sized); phase 2
    * is a per-band window — no empty-partition-spec window anywhere. */
  def withGlobalPrefixSum(df: DataFrame, band: Column, order: Seq[Column],
                          measure: Column, out: String): (DataFrame, Long) = {
    val spark = df.sparkSession
    import spark.implicits._
    val banded = df.withColumn("__band", band.cast("long"))
      .withColumn("__m", measure.cast("long"))
    val per = banded.groupBy(col("__band")).agg(sum(col("__m")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val total = per.iterator.map(_._2).sum
    val offs = per.map(_._1).zip(per.map(_._2).scanLeft(0L)(_ + _))
    val offDf = offs.toSeq.toDF("__band", "__off")
    val w = Window.partitionBy(col("__band")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val out0 = banded.join(broadcast(offDf), "__band")
      .withColumn(out, coalesce(sum(col("__m")).over(w), lit(0L)) + col("__off"))
      .drop("__band", "__m", "__off")
    (out0, total)
  }

  /** Exact global `row_number` under `order` (1-based, written to
    * `out`) plus the total row count — the prefix sum of 1s. */
  def withGlobalRank(df: DataFrame, band: Column, order: Seq[Column],
                     out: String = "rnk"): (DataFrame, Long) = {
    val (d, n) = withGlobalPrefixSum(df, band, order, lit(1L), "__excl")
    (d.withColumn(out, col("__excl") + lit(1L)).drop("__excl"), n)
  }

  /** Exact NTILE(n) tile of a global rank under SQL semantics: the
    * first (N mod n) tiles take ⌈N/n⌉ rows, the rest ⌊N/n⌋ — pure
    * rank arithmetic once N is known, no window at all. */
  def ntileFromRank(rankCol: String, n: Int, total: Long): Column = {
    val q = total / n
    val rem = total % n
    val thr = rem * (q + 1)
    if (q == 0) col(rankCol).cast("long")
    else expr(
      s"CASE WHEN $rankCol <= $thr THEN ($rankCol - 1) DIV ${q + 1} + 1 " +
        s"ELSE $rem + ($rankCol - 1 - $thr) DIV $q + 1 END").cast("long")
  }

  /** Exact k-th smallest (1-based) value of long column `v` by
    * iterative range narrowing — the distributed selection that
    * replaces a global row_number for medians/quantiles. Each round
    * costs one percentile aggregate plus one band-count aggregate
    * (≤ `bands` rows to the driver) and shrinks the candidate range
    * ~bands×; once the surviving range holds ≤ `takeLimit` rows the
    * element resolves with a distributed TakeOrdered (per-partition
    * heaps, never a global sort). Rounds are O(log_bands n). */
  /** Elements at SEVERAL ranks in one banding descent (round 14):
    * the first boundaries + band-count pass — the corpus-scale one —
    * is computed ONCE and shared by every rank; each rank then
    * resolves inside its own band (already 1/bands of the input)
    * exactly as [[selectAtRank]] would in its second round. Values
    * are identical to per-rank calls: the banding only routes the
    * descent, never the answer. */
  def selectAtRanks(df: DataFrame, v: String, ks: Seq[Long], bands: Int = 64,
                    takeLimit: Long = 65536): Seq[Long] = {
    ks.foreach(k => require(k >= 1, s"rank must be >= 1, got $k"))
    if (ks.isEmpty) return Nil
    val cur = df.select(col(v).cast("long").as("v"))
    val bs = percentileBoundaries(cur, col("v"), bands)
    if (bs.size <= 1) return ks.map(k => selectAtRank(cur, "v", k, bands, takeLimit))
    val counts = cur.groupBy(valueBands(col("v"), bs).as("b"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    ks.map { k =>
      var prefix = 0L
      var tb = -1L
      var tc = 0L
      counts.foreach { case (b, c) =>
        if (tb < 0) {
          if (k <= prefix + c) { tb = b; tc = c } else prefix += c
        }
      }
      require(tb >= 0, s"rank $k beyond input size")
      val kk = k - prefix
      val lo = if (tb > 0) Some(bs(tb.toInt - 1)) else None
      val hi = if (tb < bs.length) Some(bs(tb.toInt)) else None
      val inBand = cur.where(
        lo.map(col("v").cast("double") >= _).getOrElse(lit(true)) &&
          hi.map(col("v").cast("double") < _).getOrElse(lit(true)))
      if (tc <= takeLimit)
        inBand.orderBy(col("v")).limit(kk.toInt)
          .agg(max(col("v"))).head().getLong(0)
      else selectAtRank(inBand, "v", kk, bands, takeLimit)
    }
  }

  def selectAtRank(df: DataFrame, v: String, k: Long, bands: Int = 64,
                   takeLimit: Long = 65536): Long = {
    require(k >= 1, s"rank must be >= 1, got $k")
    var cur = df.select(col(v).cast("long").as("v"))
    var kk = k
    var rounds = 0
    while (rounds < 64) {
      rounds += 1
      val bs = percentileBoundaries(cur, col("v"), bands)
      val counts = cur.groupBy(valueBands(col("v"), bs).as("b"))
        .agg(count(lit(1)).as("c"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      var prefix = 0L
      var tb = -1L
      var tc = 0L
      counts.foreach { case (b, c) =>
        if (tb < 0) {
          if (kk <= prefix + c) { tb = b; tc = c } else prefix += c
        }
      }
      require(tb >= 0, s"rank $k beyond input size")
      kk -= prefix
      val inBand =
        if (bs.isEmpty) cur
        else {
          val lo = if (tb > 0) Some(bs(tb.toInt - 1)) else None
          val hi = if (tb < bs.length) Some(bs(tb.toInt)) else None
          cur.where(lo.map(col("v").cast("double") >= _).getOrElse(lit(true)) &&
            hi.map(col("v").cast("double") < _).getOrElse(lit(true)))
        }
      // resolve when the band is small enough for a heap top-k, or
      // when banding can no longer split (≤1 boundary survived)
      if (tc <= takeLimit || bs.size <= 1) {
        if (tc > takeLimit) {
          // degenerate band: if every surviving value is identical the
          // answer needs no ordering at all
          val r = inBand.agg(min(col("v")).as("mn"), max(col("v")).as("mx")).head()
          if (r.getLong(0) == r.getLong(1)) return r.getLong(0)
        }
        return inBand.orderBy(col("v")).limit(kk.toInt)
          .agg(max(col("v"))).head().getLong(0)
      }
      cur = inBand
    }
    cur.orderBy(col("v")).limit(kk.toInt).agg(max(col("v"))).head().getLong(0)
  }

  /** Exact per-group median (SQL `median` semantics: the mean of the
    * two middle values when the group count is even) with NO
    * per-group global sort — the per-group generalization of
    * `selectAtRank`, for the few-huge-groups regime where
    * `Window.partitionBy(group).orderBy(v)` would still push ~n/G
    * rows through single tasks.
    *
    * One banding pass (global percentile boundaries), one
    * (groups × bands)-row count aggregate collected as the model,
    * driver arithmetic to find each group's two middle ranks and the
    * band+offset holding them, then a row_number window over ONLY the
    * rows of the ≤2 needed (group, band) cells — ~2/bands of the
    * input, each cell a separate window partition. Group keys are
    * compared as strings (the lookup join key); numeric group
    * columns should be cast/formatted by the caller. */
  def exactMedianByGroup(df: DataFrame, groupCol: String, valueCol: String,
                         bands: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val src = df.select(col(groupCol).cast("string").as("__g"),
      col(valueCol).cast("double").as("__v"))
    val bounds = percentileBoundaries(src, col("__v"), bands)
    val banded = src.withColumn("__band", valueBands(col("__v"), bounds))
    // model-sized: |groups| × bands rows
    val counts = banded.groupBy(col("__g"), col("__band")).count()
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val targets: Seq[(String, Long, Long)] = counts.groupBy(_._1).toSeq.flatMap {
      case (g, rows) =>
        val sorted = rows.sortBy(_._2)
        val n = sorted.map(_._3).sum
        val mids = Seq((n + 1) / 2, n / 2 + 1).distinct
        var prefix = 0L
        val wanted = scala.collection.mutable.ArrayBuffer[(String, Long, Long)]()
        sorted.foreach { case (_, band, c) =>
          mids.foreach { m =>
            if (m > prefix && m <= prefix + c) wanted += ((g, band, m - prefix))
          }
          prefix += c
        }
        wanted
    }
    val lookup = targets.toDF("__g", "__band", "__need")
    val cells = lookup.select(col("__g"), col("__band")).distinct()
    val w = Window.partitionBy(col("__g"), col("__band")).orderBy(col("__v"))
    // ties need no tiebreaker: the k-th smallest VALUE is invariant
    // under any ordering of equal values
    banded.join(broadcast(cells), Seq("__g", "__band"))
      .withColumn("__r", row_number().over(w))
      .join(broadcast(lookup.withColumnRenamed("__need", "__r")),
        Seq("__g", "__band", "__r"))
      .groupBy(col("__g"))
      .agg(avg(col("__v")).as("median"))
      .withColumnRenamed("__g", groupCol)
  }
}
