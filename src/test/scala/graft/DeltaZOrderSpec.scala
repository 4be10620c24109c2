package graft

import java.nio.file.Files
import graft.sources.DeltaSource
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** OPTIMIZE ZORDER as a Delta layout swap: value-invisible to reads,
  * dataChange=false to the change feed, and — the point — box
  * predicates on EITHER clustered dimension data-skip most files via
  * the rewritten per-file stats. */
class DeltaZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft_zorder_$tag").toString + "/t"

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

  // a 2-D grid scattered across files when hash-laid: ids 0..1023,
  // dims (x, y) = (id, reversed-bits id) so neither dim correlates
  // with the other
  private def grid(): DataFrame =
    spark.range(1024).select(
      $"id".as("x"),
      expr("cast(conv(reverse(lpad(bin(id), 10, '0')), 2, 10) as long)").as("y"),
      concat(lit("row"), $"id").as("payload"))

  test("the swap is value-invisible and the change feed skips it") {
    val t = tmpDir("invis")
    DeltaSource.writeDelta(grid().repartition(8, md5($"payload")), t)
    val before = DeltaSource.readDelta(spark, t).orderBy($"x").collect().toSeq
    val (nBefore, nAfter) = DeltaSource.optimizeZOrder(spark, t, ("x", "y"), nFiles = 8)
    assert(nBefore == 8 && nAfter == 8)
    val after = DeltaSource.readDelta(spark, t).orderBy($"x").collect().toSeq
    assert(after == before)
    // dataChange=false: a consumer cursored past v0 sees NO new rows
    val (cursor, feed) = DeltaSource.changesSince(spark, t, Some(0L))
    assert(cursor.contains(1L) && feed.isEmpty)
  }

  test("box predicates on either dimension prune files after the swap") {
    val t = tmpDir("prune")
    DeltaSource.writeDelta(grid().repartition(8, md5($"payload")), t)
    // hash layout scatters both dims: every file spans ~the full
    // range, so the box predicate reads everything
    val box = () => DeltaSource.readDelta(spark, t)
      .where($"x".between(100, 220) && $"y".between(100, 320))
    val hashFiles = scanFiles(box())
    assert(hashFiles == 8, s"hash layout should read all 8 files, read $hashFiles")
    DeltaSource.optimizeZOrder(spark, t, ("x", "y"), nFiles = 8)
    val zFiles = scanFiles(box())
    assert(zFiles < 8, s"z-order layout should skip files, read $zFiles of 8")
    // single-dimension ranges skip too (z-order serves BOTH dims,
    // unlike a linear sort that serves only its leading key)
    val xOnly = scanFiles(DeltaSource.readDelta(spark, t).where($"x".between(0, 63)))
    val yOnly = scanFiles(DeltaSource.readDelta(spark, t).where($"y".between(0, 63)))
    assert(xOnly < 8, s"x-range should skip files, read $xOnly")
    assert(yOnly < 8, s"y-range should skip files, read $yOnly")
    // and the pruned read returns exactly the box rows
    val got = box().select($"x").orderBy($"x").as[Long].collect().toSeq
    val want = grid().where($"x".between(100, 220) && $"y".between(100, 320))
      .select($"x").orderBy($"x").as[Long].collect().toSeq
    assert(got == want)
  }

  test("z-order clusters within hive partitions of a partitioned table") {
    val t = tmpDir("part")
    val data = grid().withColumn("bucket", ($"x" % 2).cast("string"))
    DeltaSource.writeDelta(data.repartition(4, md5($"payload")), t,
      partitionBy = Seq("bucket"))
    DeltaSource.optimizeZOrder(spark, t, ("x", "y"), nFiles = 4)
    val back = DeltaSource.readDelta(spark, t)
    assert(back.count() == 1024)
    // partition pruning still applies on top of the new layout
    val one = back.where($"bucket" === "1" && $"x".between(0, 99))
    assert(one.select(sum($"x")).as[Long].head() ==
      (1L to 99L by 2).sum)
  }
}
