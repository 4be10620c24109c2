package graft

import java.nio.file.Files
import graft.sources.DeltaSource
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deletion-vector (merge-on-read DELETE) contracts: a delete marks
  * rows in a sidecar without rewriting data files; reads apply the
  * DV row-exactly; a second delete unions; a fully-dead file drops;
  * OPTIMIZE materializes and purges; VACUUM keeps referenced
  * sidecars and reclaims superseded ones; checkpoints, RESTORE,
  * CLONE, MERGE, time travel and the change feed all compose with
  * DVs. Reference behavior: the reference stack rewrites whole
  * tables on erasure (delta-rs write_deltalake overwrite,
  * /root/reference/airflow/dags/etl.py); DVs are the scale path a
  * 100 TB zone needs — delete cost O(deleted rows), not O(bytes). */
class DeltaDvSpec extends SparkSpec {

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft_dv_$tag").toString + "/t"

  private def fsOf(p: String): FileSystem =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dataFiles(tbl: String): Seq[String] = {
    val fs = fsOf(tbl)
    fs.listStatus(new Path(tbl)).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .map(_.getPath.getName).sorted
  }

  private def sidecars(tbl: String): Seq[String] = {
    val fs = fsOf(tbl)
    fs.listStatus(new Path(tbl)).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("deletion_vector_"))
      .map(_.getPath.getName).sorted
  }

  private def logText(tbl: String, v: Long): String = {
    val p = new Path(tbl, f"_delta_log/$v%020d.json")
    val in = fsOf(tbl).open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  /** 1000 rows in 4 clustered files (disjoint id ranges). */
  private def mkTable(): String = {
    val tbl = tmpDir("base")
    val df = spark.range(0, 1000).selectExpr("id", "id % 7 as k")
      .repartitionByRange(4, col("id")).sortWithinPartitions("id")
    DeltaSource.writeDelta(df, tbl)
    tbl
  }

  test("delete marks rows without rewriting any data file; descriptor lands in the log") {
    val tbl = mkTable()
    val before = dataFiles(tbl)
    val v = DeltaSource.deleteDelta(spark, tbl, col("k") === 3)
    assert(v == 1L)
    assert(dataFiles(tbl) == before, "a DV delete must not rewrite or add data files")
    assert(sidecars(tbl).size == 1, "one packed sidecar per delete commit")
    val log = logText(tbl, 1)
    assert(log.contains("\"deletionVector\""))
    // spec descriptor shape: UUID-named sidecar ("u"), base85 name,
    // offset + sizeInBytes + cardinality all present
    assert(log.contains("\"storageType\":\"u\""))
    assert(log.contains("\"offset\":"))
    assert(log.contains("\"sizeInBytes\":"))
    assert(log.contains("\"cardinality\":"))
    // remove precedes the same-path re-add (spec commit shape)
    assert(log.indexOf("\"remove\"") < log.indexOf("\"add\""))
    val got = DeltaSource.readDelta(spark, tbl)
    assert(got.count() == 1000 - 143) // ids ≡3 (mod 7) in [0,1000): 143
    assert(got.where(col("k") === 3).count() == 0)
  }

  test("the DV filter is a codegen expression — no UDF eval boundary in the plan") {
    val tbl = mkTable()
    DeltaSource.deleteDelta(spark, tbl, col("k") === 3)
    val df = DeltaSource.readDelta(spark, tbl)
    // plan pin: the probe rides a native Catalyst expression (one
    // static call inside the scan's codegen stage), never a ScalaUDF
    // or python eval node that would break whole-stage codegen on
    // every DV-carrying read
    val executed = df.queryExecution.executedPlan.toString
    assert(!executed.contains("ScalaUDF") && !executed.toLowerCase.contains("batchevalpython"),
      s"DV filter fell back to a UDF eval boundary:\n$executed")
    assert(executed.contains("dvkeepexpr"),
      s"expected the DvKeepExpr filter in the executed plan:\n$executed")
    // and the filter sits INSIDE a whole-stage-codegen span (the
    // `*(n)` prefix on its plan line)
    assert(executed.linesIterator.exists(l =>
      l.contains("dvkeepexpr") && l.trim.matches("""^[+:\-\s]*\*\(\d+\) Filter .*""")),
      s"DV filter not inside WholeStageCodegen:\n$executed")
    assert(df.count() == 1000 - 143)
  }

  test("read is row-exact: survivors in a touched file are all still served") {
    val tbl = mkTable()
    DeltaSource.deleteDelta(spark, tbl, col("id") % 2 === 0)
    val got = DeltaSource.readDelta(spark, tbl).select("id")
      .collect().map(_.getLong(0)).sorted
    assert(got.toSeq == (1L until 1000L by 2).toSeq)
  }

  test("second delete unions into a fresh descriptor; cardinality accumulates") {
    val tbl = mkTable()
    DeltaSource.deleteDelta(spark, tbl, col("k") === 3)
    DeltaSource.deleteDelta(spark, tbl, col("id") < 100)
    val got = DeltaSource.readDelta(spark, tbl)
    // survivors: id in [100,1000) with k != 3  (129 of the 143 k=3 ids are >= 100)
    assert(got.count() == 900 - 129)
    assert(got.where(col("id") < 100).count() == 0)
    assert(got.where(col("k") === 3).count() == 0)
    // the union is wholesale descriptor replacement: v2 re-add carries
    // a cardinality >= the fresh wave alone
    val log2 = logText(tbl, 2)
    assert(log2.contains("\"deletionVector\""))
  }

  test("a delete matching only already-deleted rows is a no-op (no commit)") {
    val tbl = mkTable()
    val v1 = DeltaSource.deleteDelta(spark, tbl, col("k") === 3)
    val v2 = DeltaSource.deleteDelta(spark, tbl, col("k") === 3)
    assert(v2 == v1, "re-deleting deleted rows must not commit")
    assert(DeltaSource.latestVersion(spark, tbl).contains(v1))
  }

  test("a file whose every live row is deleted drops from the snapshot") {
    val tbl = mkTable()
    // file 0 holds the lowest id range; kill everything below 250
    // (covers at least the first range partition entirely)
    DeltaSource.deleteDelta(spark, tbl, col("id") < 250)
    val log = logText(tbl, 1)
    // at least one file is removed WITHOUT a matching re-add: count
    // removes vs adds in the commit
    val removes = "\"remove\"".r.findAllIn(log).size
    val adds = "\"add\"".r.findAllIn(log).size
    assert(removes > adds, s"full-dead files must not be re-added (removes=$removes adds=$adds)")
    assert(DeltaSource.readDelta(spark, tbl).count() == 750)
  }

  test("OPTIMIZE applies DVs (no resurrection) and purges descriptors") {
    val tbl = mkTable()
    DeltaSource.deleteDelta(spark, tbl, col("k") === 3)
    val logical = DeltaSource.readDelta(spark, tbl).count()
    val (before, after) = DeltaSource.optimizeDelta(spark, tbl)
    assert(after < before)
    assert(DeltaSource.readDelta(spark, tbl).count() == logical)
    // post-compaction files carry no DV, and physical == logical
    val physical = spark.read.parquet(
      dataFiles(tbl).map(n => s"$tbl/$n"): _*).count()
    // old (pre-compaction) files still on disk; count only live ones
    val live = DeltaSource.readDelta(spark, tbl)
    assert(live.count() == logical)
    val lastLog = logText(tbl, DeltaSource.latestVersion(spark, tbl).get)
    assert(!lastLog.contains("\"deletionVector\""),
      "compaction rewrites must drop the deletion vectors")
    assert(physical >= logical) // stale files inflate the raw glob; live scan is exact
  }

  test("a single DV'd file is rewritten by OPTIMIZE even without a bin partner (purge)") {
    val tbl = tmpDir("purge")
    DeltaSource.writeDelta(spark.range(0, 100).toDF("id"), tbl)
    assert(dataFiles(tbl).size >= 1)
    DeltaSource.deleteDelta(spark, tbl, col("id") < 10)
    val (_, _) = DeltaSource.optimizeDelta(spark, tbl)
    val lastLog = logText(tbl, DeltaSource.latestVersion(spark, tbl).get)
    assert(!lastLog.contains("\"deletionVector\""))
    assert(DeltaSource.readDelta(spark, tbl).count() == 90)
  }

  test("MERGE over a DV'd table does not resurrect deleted rows") {
    val tbl = mkTable()
    DeltaSource.deleteDelta(spark, tbl, col("k") === 3)
    val upd = spark.range(0, 10).selectExpr("id + 2000 as id", "cast(1 as bigint) as k")
    DeltaSource.mergeDelta(spark, tbl, upd, Seq("id"))
    val got = DeltaSource.readDelta(spark, tbl)
    assert(got.where(col("k") === 3).count() == 0)
    assert(got.count() == 1000 - 143 + 10)
  }

  test("VACUUM keeps referenced sidecars and reclaims superseded ones") {
    val tbl = mkTable()
    DeltaSource.deleteDelta(spark, tbl, col("k") === 3)
    val first = sidecars(tbl)
    // the second wave touches EVERY file (k=5 rows live in all four),
    // so every descriptor re-points to the new sidecar and the first
    // one becomes unreferenced garbage
    DeltaSource.deleteDelta(spark, tbl, col("k") === 5)
    assert(sidecars(tbl).size == 2)
    Thread.sleep(5) // mtime strictly below the retain cutoff
    val deleted = DeltaSource.vacuum(spark, tbl, retainMs = 0L)
    assert(deleted.exists(_.endsWith(first.head)))
    val left = sidecars(tbl)
    assert(left.size == 1 && left.head != first.head)
    val got = DeltaSource.readDelta(spark, tbl)
    assert(got.where(col("k") === 3).count() == 0)
    assert(got.where(col("k") === 5).count() == 0)
    assert(got.count() == 1000 - 143 - 143)
  }

  test("DV exclusions survive checkpoint + log truncation") {
    val tbl = mkTable()
    DeltaSource.deleteDelta(spark, tbl, col("k") === 3)
    val cpv = DeltaSource.checkpoint(spark, tbl)
    val fs = fsOf(tbl)
    // truncate every JSON commit at or below the checkpoint
    (0L to cpv).foreach { v =>
      fs.delete(new Path(tbl, f"_delta_log/$v%020d.json"), false)
    }
    val got = DeltaSource.readDelta(spark, tbl)
    assert(got.count() == 1000 - 143)
    assert(got.where(col("k") === 3).count() == 0)
  }

  test("RESTORE across a delete brings the rows back; restore onto a DV'd state re-applies it") {
    val tbl = mkTable()
    DeltaSource.deleteDelta(spark, tbl, col("k") === 3) // v1
    // restore to v0: full table again
    DeltaSource.restoreDelta(spark, tbl, 0L) // v2
    assert(DeltaSource.readDelta(spark, tbl).count() == 1000)
    // restore to v1: the delete is part of the restored state
    DeltaSource.restoreDelta(spark, tbl, 1L) // v3
    val got = DeltaSource.readDelta(spark, tbl)
    assert(got.count() == 1000 - 143)
    assert(got.where(col("k") === 3).count() == 0)
  }

  test("time travel to a pre-delete version ignores later DVs") {
    val tbl = mkTable()
    DeltaSource.deleteDelta(spark, tbl, col("k") === 3)
    assert(DeltaSource.readDelta(spark, tbl, Some(0L)).count() == 1000)
  }

  test("shallow CLONE preserves DV exclusions by absolute sidecar URI") {
    val src = mkTable()
    DeltaSource.deleteDelta(spark, src, col("k") === 3)
    val dst = tmpDir("clone")
    DeltaSource.cloneDelta(spark, src, dst)
    val got = DeltaSource.readDelta(spark, dst)
    assert(got.count() == 1000 - 143)
    assert(got.where(col("k") === 3).count() == 0)
    // zero data or sidecar bytes copied
    assert(dataFiles(dst).isEmpty && sidecars(dst).isEmpty)
  }

  test("change feed replays a delete commit as the survivors of its touched files") {
    val tbl = mkTable()
    DeltaSource.deleteDelta(spark, tbl, col("id") < 100) // v1
    val (cursor, feed) = DeltaSource.changesSince(spark, tbl, Some(0L))
    assert(cursor.contains(1L))
    val batch = feed.get
    // the touched files' surviving rows replay; none of the deleted
    // rows appear (the re-add is DV-filtered like any read)
    assert(batch.where(col("id") < 100).count() == 0)
    assert(batch.count() > 0)
  }

  test("partitioned table: DV delete respects partition values and pruning still works") {
    val tbl = tmpDir("part")
    val df = spark.range(0, 400)
      .selectExpr("id", "concat('s', cast(id % 4 as string)) as src")
    DeltaSource.writeDelta(df, tbl, partitionBy = Seq("src"))
    DeltaSource.deleteDelta(spark, tbl, col("src") === "s1" && col("id") < 200)
    val got = DeltaSource.readDelta(spark, tbl)
    assert(got.count() == 400 - 50) // s1 ids <200: 50 rows
    assert(got.where(col("src") === "s1").count() == 50)
    // a partition predicate still prunes (planning-time) and applies the DV
    val s1 = DeltaSource.readDelta(spark, tbl).where(col("src") === "s1")
    assert(s1.collect().map(_.getAs[Long]("id")).forall(_ >= 200))
  }
}
