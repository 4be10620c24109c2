package graft

import graft.sources.DeltaSource
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Row tracking (the Delta `rowTracking` writer feature): every add
  * carries a fresh `baseRowId` range under a domainMetadata-kept high
  * watermark, rewrites MATERIALIZE per-row ids, and `_row_id` stays
  * stable through OPTIMIZE / clustering / DV deletes / UPDATE / MERGE
  * — the lineage backbone incremental consumers key on.
  * Mirrors delta-io/delta PROTOCOL.md §Row Tracking. */
class DeltaRowTrackingSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("graft_rt").toString + "/t"

  /** (id, part, v) table, row tracking ON from version 1's backfill. */
  private def mk(): String = {
    val tbl = tmpTable()
    DeltaSource.writeDelta(
      Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L), (4L, "b", 40L))
        .toDF("id", "part", "v").coalesce(1).sortWithinPartitions("id"),
      tbl, partitionBy = Seq("part"))
    DeltaSource.enableRowTracking(spark, tbl)
    tbl
  }

  private def idsOf(tbl: String): Map[Long, Long] =
    DeltaSource.readDeltaWithRowIds(spark, tbl)
      .select(col("id"), col("_row_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("enablement backfills every live file; ids are dense and unique") {
    val tbl = mk()
    val ids = idsOf(tbl)
    assert(ids.size == 4)
    assert(ids.values.toSet == Set(0L, 1L, 2L, 3L), s"got $ids")
    // versions: backfilled rows stamp the enablement commit
    val vers = DeltaSource.readDeltaWithRowIds(spark, tbl)
      .select(col("_row_commit_version")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(vers == Set(1L), s"got $vers")
  }

  test("appends allocate DISJOINT fresh ranges above the watermark") {
    val tbl = mk()
    DeltaSource.writeDelta(Seq((5L, "c", 50L), (6L, "c", 60L))
      .toDF("id", "part", "v").coalesce(1).sortWithinPartitions("id"),
      tbl, overwrite = false)
    DeltaSource.writeDelta(Seq((7L, "a", 70L)).toDF("id", "part", "v"),
      tbl, overwrite = false)
    val ids = idsOf(tbl)
    assert(ids.values.toSet.size == 7, s"row ids must be unique: $ids")
    assert(ids.values.toSet == (0L to 6L).toSet, s"dense allocation: $ids")
    assert(ids(7L) == 6L, "third commit allocates above the second")
  }

  test("OPTIMIZE compaction preserves every row's id (materialized)") {
    val tbl = mk()
    DeltaSource.writeDelta(Seq((5L, "a", 50L), (6L, "b", 60L))
      .toDF("id", "part", "v").coalesce(1).sortWithinPartitions("id"),
      tbl, overwrite = false)
    val before = idsOf(tbl)
    val (nb, na) = DeltaSource.optimizeDelta(spark, tbl)
    assert(na < nb, "compaction must shrink the file count")
    assert(idsOf(tbl) == before, "ids must survive compaction")
    // and a SECOND optimize round-trips the materialized columns
    DeltaSource.writeDelta(Seq((8L, "a", 80L)).toDF("id", "part", "v"),
      tbl, overwrite = false)
    val before2 = idsOf(tbl)
    DeltaSource.optimizeDelta(spark, tbl)
    assert(idsOf(tbl) == before2, "ids must survive a re-compaction")
  }

  test("OPTIMIZE ZORDER preserves ids across the reshuffle") {
    val tbl = tmpTable()
    DeltaSource.writeDelta((1L to 64L).map(i => (i, i * 7 % 13, i * 11 % 17))
      .toDF("id", "x", "y").coalesce(1).sortWithinPartitions("id"), tbl)
    DeltaSource.enableRowTracking(spark, tbl)
    val before = idsOf(tbl)
    DeltaSource.optimizeZOrder(spark, tbl, ("x", "y"), nFiles = 4)
    assert(idsOf(tbl) == before, "ids must survive the z-order rewrite")
  }

  test("a DV delete drops exactly the deleted ids; survivors keep theirs") {
    val tbl = mk()
    val before = idsOf(tbl)
    DeltaSource.deleteDelta(spark, tbl, col("id") === 2L)
    val after = idsOf(tbl)
    assert(after == before - 2L, s"got $after")
  }

  test("UPDATE preserves the updated row's id and bumps its version") {
    val tbl = mk()
    val before = idsOf(tbl)
    val v = DeltaSource.updateDelta(spark, tbl, col("id") === 3L,
      Map("v" -> (col("v") + 1000L)))
    assert(idsOf(tbl) == before, "UPDATE must keep row identity")
    val verOf = DeltaSource.readDeltaWithRowIds(spark, tbl)
      .select(col("id"), col("_row_commit_version"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(verOf(3L) == v, "updated row carries the update commit's version")
    assert(verOf(1L) == 1L, "untouched rows keep their stamp")
  }

  test("MERGE keeps survivor and replaced ids; inserts get fresh ones") {
    val tbl = mk()
    val before = idsOf(tbl)
    DeltaSource.mergeDelta(spark, tbl,
      Seq((3L, "b", 3333L), (9L, "c", 90L)).toDF("id", "part", "v"),
      Seq("id"))
    val after = idsOf(tbl)
    assert(after(1L) == before(1L) && after(2L) == before(2L) &&
      after(4L) == before(4L), "survivors keep ids")
    assert(after(3L) == before(3L), "the replaced key keeps its row id")
    assert(after(9L) > before.values.max, "insert allocates above the watermark")
    assert(after.values.toSet.size == 5, "ids stay unique")
  }

  test("checkpoint + log truncation keeps the watermark: no id reuse") {
    val tbl = mk()
    DeltaSource.checkpoint(spark, tbl)
    DeltaSource.cleanupExpiredLogs(spark, tbl, retainMs = 0L)
    DeltaSource.writeDelta(Seq((5L, "c", 50L)).toDF("id", "part", "v"),
      tbl, overwrite = false)
    val ids = idsOf(tbl)
    assert(ids(5L) == 4L, s"watermark must survive truncation, got ${ids(5L)}")
    assert(ids.values.toSet.size == 5)
  }

  test("CLONE carries ids and the watermark") {
    val tbl = mk()
    val dst = tmpTable()
    DeltaSource.cloneDelta(spark, tbl, dst)
    assert(idsOf(dst) == idsOf(tbl), "cloned rows keep their ids")
    DeltaSource.writeDelta(Seq((5L, "c", 50L)).toDF("id", "part", "v"),
      dst, overwrite = false)
    assert(idsOf(dst)(5L) == 4L, "clone allocates above the source watermark")
  }

  test("RESTORE resurrects the pre-delete ids") {
    val tbl = mk()
    val before = idsOf(tbl)
    val vPre = DeltaSource.latestVersion(spark, tbl).get
    DeltaSource.deleteDelta(spark, tbl, col("id") === 1L)
    DeltaSource.restoreDelta(spark, tbl, vPre)
    assert(idsOf(tbl) == before, "restore must bring id 1 back unchanged")
  }

  test("a plain readDelta is unchanged by row tracking (no leaked columns)") {
    val tbl = mk()
    DeltaSource.optimizeDelta(spark, tbl)
    val cols = DeltaSource.readDelta(spark, tbl).columns.toSeq
    assert(cols == Seq("id", "part", "v"),
      s"materialized columns must stay physical-only, got $cols")
  }

  test("time travel reads the ids as of that version") {
    val tbl = mk()
    val v1 = DeltaSource.latestVersion(spark, tbl).get
    DeltaSource.writeDelta(Seq((5L, "c", 50L)).toDF("id", "part", "v"),
      tbl, overwrite = false)
    val atV1 = DeltaSource.readDeltaWithRowIds(spark, tbl, Some(v1))
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(atV1 == Set(1L, 2L, 3L, 4L))
  }
}
