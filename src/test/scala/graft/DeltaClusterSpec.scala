package graft

import java.nio.file.Files
import graft.plans.NativeExprs
import graft.sources.DeltaSource
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** OPTIMIZE CLUSTER BY (liquid-style clustering): the Hilbert-curve
  * layout swap — value-invisible, dataChange=false, box predicates
  * data-skip, clustering columns recorded in the `delta.clustering`
  * domainMetadata, and row-tracking ids survive the rewrite. The
  * curve itself is pinned by its defining property: consecutive
  * cells are ALWAYS grid neighbors (Morton quadrant jumps are what
  * loosen z-order's per-file bounding boxes). */
class DeltaClusterSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft_cluster_$tag").toString + "/t"

  private def scanFiles(df: DataFrame): Long = {
    df.collect()
    def rec(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => rec(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => rec(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => rec(r.child)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(rec)
    }
    rec(df.queryExecution.executedPlan).map(_.metrics("numFiles").value).sum
  }

  private def grid(): DataFrame =
    spark.range(1024).select(
      $"id".as("x"),
      expr("cast(conv(reverse(lpad(bin(id), 10, '0')), 2, 10) as long)").as("y"),
      concat(lit("row"), $"id").as("payload"))

  test("hilbertEval is a bijection onto the full grid") {
    val n = 16 // bits = 4
    val ds = for (x <- 0 until n; y <- 0 until n)
      yield NativeExprs.hilbertEval(x.toLong, y.toLong, 4)
    assert(ds.toSet == (0L until (n.toLong * n)).toSet,
      "every cell maps to a distinct index covering [0, n^2)")
  }

  test("consecutive hilbert indices are always grid neighbors (the locality property z-order lacks)") {
    val n = 32 // bits = 5
    val cellOf = (for (x <- 0 until n; y <- 0 until n)
      yield NativeExprs.hilbertEval(x.toLong, y.toLong, 5) -> (x, y)).toMap
    (0L until (n.toLong * n - 1)).foreach { d =>
      val (x1, y1) = cellOf(d); val (x2, y2) = cellOf(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"cells $d and ${d + 1} must be adjacent, got ($x1,$y1) -> ($x2,$y2)")
    }
    // the Morton interleave violates this at every quadrant boundary
    // (e.g. z=3 -> z=4 jumps from (1,1) to (0,2)... diagonal or worse)
    val mortonJumps = (0 until n * n - 1).count { d =>
      def deinterleave(z: Int): (Int, Int) = {
        var x = 0; var y = 0
        for (i <- 0 until 5) {
          y |= ((z >> (2 * i)) & 1) << i
          x |= ((z >> (2 * i + 1)) & 1) << i
        }
        (x, y)
      }
      val (x1, y1) = deinterleave(d); val (x2, y2) = deinterleave(d + 1)
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1
    }
    assert(mortonJumps > 0, "sanity: z-order does jump; hilbert never does")
  }

  test("out-of-range inputs clamp to the grid edge") {
    assert(NativeExprs.hilbertEval(-5L, 3L, 4) == NativeExprs.hilbertEval(0L, 3L, 4))
    assert(NativeExprs.hilbertEval(99L, 3L, 4) == NativeExprs.hilbertEval(15L, 3L, 4))
  }

  test("the swap is value-invisible, feed-invisible, and records the clustering state") {
    val t = tmpDir("invis")
    DeltaSource.writeDelta(grid().repartition(8, md5($"payload")), t)
    val before = DeltaSource.readDelta(spark, t).orderBy($"x").collect().toSeq
    val (nBefore, nAfter) = DeltaSource.optimizeCluster(spark, t, ("x", "y"), nFiles = 8)
    assert(nBefore == 8 && nAfter == 8)
    assert(DeltaSource.readDelta(spark, t).orderBy($"x").collect().toSeq == before)
    val (cursor, feed) = DeltaSource.changesSince(spark, t, Some(0L))
    assert(cursor.contains(1L) && feed.isEmpty, "dataChange=false to the feed")
    assert(DeltaSource.clusteringColumnsOf(spark, t) == Seq("x", "y"),
      "clustering columns must ride the delta.clustering domainMetadata")
  }

  test("box predicates prune files after the clustering swap") {
    val t = tmpDir("prune")
    DeltaSource.writeDelta(grid().repartition(8, md5($"payload")), t)
    val box = () => DeltaSource.readDelta(spark, t)
      .where($"x".between(100, 220) && $"y".between(100, 320))
    assert(scanFiles(box()) == 8, "hash layout reads everything")
    DeltaSource.optimizeCluster(spark, t, ("x", "y"), nFiles = 8)
    val hFiles = scanFiles(box())
    assert(hFiles < 8, s"clustered layout should skip files, read $hFiles of 8")
    val xOnly = scanFiles(DeltaSource.readDelta(spark, t).where($"x".between(0, 63)))
    val yOnly = scanFiles(DeltaSource.readDelta(spark, t).where($"y".between(0, 63)))
    assert(xOnly < 8 && yOnly < 8, s"both dims skip: x=$xOnly y=$yOnly")
    val got = box().select($"x").orderBy($"x").as[Long].collect().toSeq
    val want = grid().where($"x".between(100, 220) && $"y".between(100, 320))
      .select($"x").orderBy($"x").as[Long].collect().toSeq
    assert(got == want)
  }

  test("the N-dimensional curve keeps the bijection + adjacency invariants") {
    // n=3, bits=3: 512 cells
    val cells3 = for (x <- 0L until 8; y <- 0L until 8; z <- 0L until 8)
      yield NativeExprs.hilbertEvalN(Array(x, y, z), 3) -> (x, y, z)
    assert(cells3.map(_._1).toSet == (0L until 512L).toSet, "3-D bijection")
    val at3 = cells3.toMap.map(_.swap) ++ cells3.toMap // d -> cell
    val cellOf3 = cells3.map { case (d, c) => d -> c }.toMap
    (0L until 511L).foreach { d =>
      val (x1, y1, z1) = cellOf3(d); val (x2, y2, z2) = cellOf3(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) + math.abs(z1 - z2) == 1,
        s"3-D cells $d, ${d + 1} must be unit-adjacent")
    }
    // n=4, bits=2: 256 cells
    val cells4 = for (a <- 0L until 4; b <- 0L until 4; c <- 0L until 4; e <- 0L until 4)
      yield NativeExprsN4(a, b, c, e)
    assert(cells4.toSet == (0L until 256L).toSet, "4-D bijection")
  }
  private def NativeExprsN4(a: Long, b: Long, c: Long, e: Long): Long =
    NativeExprs.hilbertEvalN(Array(a, b, c, e), 2)

  test("CLUSTER BY three columns prunes on every dimension") {
    val t = tmpDir("threed")
    val df = spark.range(4096).select(
      ($"id" % 16).as("x"),
      (($"id" / 16) % 16).as("y"),
      (($"id" / 256) % 16).as("z"),
      concat(lit("r"), $"id").as("payload"))
    DeltaSource.writeDelta(df.repartition(8, md5($"payload")), t)
    DeltaSource.optimizeClusterBy(spark, t, Seq("x", "y", "z"), nFiles = 8, bits = 8)
    assert(DeltaSource.clusteringColumnsOf(spark, t) == Seq("x", "y", "z"))
    val fx = scanFiles(DeltaSource.readDelta(spark, t).where($"x" < 4))
    val fy = scanFiles(DeltaSource.readDelta(spark, t).where($"y" < 4))
    val fz = scanFiles(DeltaSource.readDelta(spark, t).where($"z" < 4))
    assert(fx < 8 && fy < 8 && fz < 8, s"all dims must skip: x=$fx y=$fy z=$fz")
    // and the swap stays value-invisible
    assert(DeltaSource.readDelta(spark, t).count() == 4096L)
  }

  test("the SQL-reachable N-ary form matches the static eval") {
    import graft.plans.GraftFunctions
    GraftFunctions.register(spark)
    val viaSql = spark.sql("SELECT graft_hilbert_n(3L, 5L, 6L, 3) AS h")
      .as[Long].head()
    assert(viaSql == NativeExprs.hilbertEvalN(Array(3L, 5L, 6L), 3))
  }

  test("row-tracking ids survive the clustering rewrite") {
    val t = tmpDir("rt")
    DeltaSource.writeDelta(grid().coalesce(1).sortWithinPartitions("x"), t)
    DeltaSource.enableRowTracking(spark, t)
    val before = DeltaSource.readDeltaWithRowIds(spark, t)
      .select($"x", $"_row_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    DeltaSource.optimizeCluster(spark, t, ("x", "y"), nFiles = 4)
    val after = DeltaSource.readDeltaWithRowIds(spark, t)
      .select($"x", $"_row_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after == before, "ids must be materialized through the swap")
  }
}
