package graft

import java.nio.file.Files
import graft.sources.DeltaSource
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Column-mapping contracts (`delta.columnMapping.mode = name`):
  * rename/drop are metaData-only (zero data rewritten), old and new
  * files read under one logical view, per-file stats keep skipping
  * on renamed columns, dropped values never resurrect, and the
  * mapping survives checkpoints, clones, DVs and compaction. */
class DeltaColumnMappingSpec extends SparkSpec {

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft_cm_$tag").toString + "/t"

  private def dataFileSet(tbl: String): Set[String] = {
    val fs = new Path(tbl).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(d: Path): Seq[String] = fs.listStatus(d).toSeq.flatMap { s =>
      if (s.isDirectory) { if (s.getPath.getName == "_delta_log") Nil else walk(s.getPath) }
      else if (s.getPath.getName.startsWith("part-")) Seq(s.getPath.toString) else Nil
    }
    walk(new Path(tbl)).toSet
  }

  private def mkTable(): String = {
    val tbl = tmpDir("base")
    DeltaSource.writeDelta(
      spark.range(0, 1000).selectExpr("id", "id * 2 as v"), tbl)
    tbl
  }

  test("rename is metaData-only: same files, new logical name, same values") {
    val tbl = mkTable()
    val before = dataFileSet(tbl)
    DeltaSource.enableColumnMapping(spark, tbl)
    DeltaSource.renameColumn(spark, tbl, "v", "doubled")
    assert(dataFileSet(tbl) == before, "rename must not touch data files")
    val got = DeltaSource.readDelta(spark, tbl)
    assert(got.columns.toSeq == Seq("id", "doubled"))
    assert(got.where(col("doubled") =!= col("id") * 2).count() == 0)
  }

  test("appends after a rename land under the physical name; old and new files read as one") {
    val tbl = mkTable()
    DeltaSource.enableColumnMapping(spark, tbl)
    DeltaSource.renameColumn(spark, tbl, "v", "doubled")
    DeltaSource.writeDelta(
      spark.range(1000, 1500).selectExpr("id", "id * 2 as doubled"), tbl,
      overwrite = false)
    val got = DeltaSource.readDelta(spark, tbl)
    assert(got.count() == 1500)
    assert(got.where(col("doubled") =!= col("id") * 2).count() == 0)
    // the new files physically carry the ORIGINAL name (the field's
    // physical identity), not the logical alias
    val newest = dataFileSet(tbl).toSeq.sorted
      .filter(_.contains(s"part-${DeltaSource.latestVersion(spark, tbl).get}-"))
    assert(newest.nonEmpty)
    val phys = spark.read.parquet(newest: _*)
    assert(phys.columns.contains("v") && !phys.columns.contains("doubled"))
  }

  test("data skipping still prunes on a renamed column (stats are physical)") {
    val tbl = tmpDir("skip")
    DeltaSource.writeDelta(
      spark.range(0, 8000).select(col("id").as("k"), (col("id") % 97).as("v"))
        .repartitionByRange(8, col("k")).sortWithinPartitions("k"), tbl)
    DeltaSource.enableColumnMapping(spark, tbl)
    DeltaSource.renameColumn(spark, tbl, "k", "key")
    val df = DeltaSource.readDelta(spark, tbl).where(col("key") < 1000)
    df.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => scans(a.executedPlan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val scanned = scans(df.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).sum
    assert(scanned < 8, s"a renamed column's range predicate must still skip files (scanned $scanned/8)")
    assert(df.count() == 1000)
  }

  test("dropped values never resurrect when the logical name is re-added") {
    val tbl = mkTable()
    DeltaSource.enableColumnMapping(spark, tbl)
    DeltaSource.dropColumn(spark, tbl, "v")
    assert(DeltaSource.readDelta(spark, tbl).columns.toSeq == Seq("id"))
    // re-add the logical name with different values via mergeSchema append
    DeltaSource.writeDelta(
      spark.range(0, 10).selectExpr("id + 5000 as id", "id + 9000 as v"), tbl,
      overwrite = false, mergeSchema = true)
    val got = DeltaSource.readDelta(spark, tbl)
    // the ORIGINAL 1000 rows must read v as NULL — not their old id*2
    assert(got.where(col("id") < 1000 && col("v").isNotNull).count() == 0,
      "old files' dropped bytes must not resurrect under the re-added name")
    assert(got.where(col("id") >= 5000 && col("v").isNull).count() == 0)
  }

  test("mapping survives checkpoint + log truncation and carries to clones") {
    val tbl = mkTable()
    DeltaSource.enableColumnMapping(spark, tbl)
    DeltaSource.renameColumn(spark, tbl, "v", "doubled")
    val cpv = DeltaSource.checkpoint(spark, tbl)
    val fs = new Path(tbl).getFileSystem(spark.sparkContext.hadoopConfiguration)
    (0L to cpv).foreach(v => fs.delete(new Path(tbl, f"_delta_log/$v%020d.json"), false))
    assert(DeltaSource.readDelta(spark, tbl).columns.toSeq == Seq("id", "doubled"))
    val dst = tmpDir("clone")
    DeltaSource.cloneDelta(spark, tbl, dst)
    val got = DeltaSource.readDelta(spark, dst)
    assert(got.columns.toSeq == Seq("id", "doubled"))
    assert(got.where(col("doubled") =!= col("id") * 2).count() == 0)
  }

  test("rename composes with deletion vectors and OPTIMIZE purge") {
    val tbl = mkTable()
    DeltaSource.enableColumnMapping(spark, tbl)
    DeltaSource.renameColumn(spark, tbl, "v", "doubled")
    DeltaSource.deleteDelta(spark, tbl, col("doubled") % 4 === 0)
    val logical = DeltaSource.readDelta(spark, tbl)
    assert(logical.count() == 500)
    assert(logical.where(col("doubled") % 4 === 0).count() == 0)
    DeltaSource.optimizeDelta(spark, tbl)
    val after = DeltaSource.readDelta(spark, tbl)
    assert(after.count() == 500)
    assert(after.columns.toSeq == Seq("id", "doubled"))
  }

  test("partition columns refuse rename/drop; unmapped tables refuse both") {
    val tbl = tmpDir("part")
    DeltaSource.writeDelta(
      spark.range(0, 100).selectExpr("id", "concat('s', id % 3) as src"), tbl,
      partitionBy = Seq("src"))
    intercept[IllegalArgumentException] {
      DeltaSource.renameColumn(spark, tbl, "id", "id2") // mapping off
    }
    DeltaSource.enableColumnMapping(spark, tbl)
    intercept[IllegalArgumentException] {
      DeltaSource.renameColumn(spark, tbl, "src", "source")
    }
    intercept[IllegalArgumentException] {
      DeltaSource.dropColumn(spark, tbl, "src")
    }
    // non-partition rename on the partitioned table still works
    DeltaSource.renameColumn(spark, tbl, "id", "row_id")
    val got = DeltaSource.readDelta(spark, tbl).where(col("src") === "s1")
    assert(got.columns.toSeq.sorted == Seq("row_id", "src"))
    assert(got.count() == 33)
  }
}
