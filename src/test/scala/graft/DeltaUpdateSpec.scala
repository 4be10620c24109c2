package graft

import graft.sources.DeltaSource
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Merge-on-read UPDATE: matched rows are marked via deletion
  * vectors (no data file rewritten) and their post-images appended
  * in the same commit; SET rules (identity refused, generated
  * recomputed, partition columns movable), one-evaluation CDF
  * consistency, and no-op behavior. */
class DeltaUpdateSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("graft_upd").toString + "/t"

  private def mk(): String = {
    val tbl = tmpTable()
    DeltaSource.writeDelta(
      Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L), (4L, "b", 40L),
        (5L, "c", 50L)).toDF("id", "part", "v").coalesce(1),
      tbl, partitionBy = Seq("part"))
    tbl
  }

  test("updates matched rows in one commit; files are DV'd, not rewritten") {
    val tbl = mk()
    val v0 = DeltaSource.latestVersion(spark, tbl).get
    // id=3 is HALF of partition b's file: the file must survive with
    // a vector, not be rewritten or dropped
    val v1 = DeltaSource.updateDelta(spark, tbl, col("id") === 3L,
      Map("v" -> (col("v") + 1000L)))
    assert(v1 == v0 + 1, "UPDATE must be ONE commit")
    val rows = DeltaSource.readDelta(spark, tbl)
      .as[(Long, String, Long)].collect().toSet
    assert(rows == Set((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 1030L),
      (4L, "b", 40L), (5L, "c", 50L)), s"got $rows")
    // merge-on-read: the commit wrote a DV sidecar (old file marked,
    // not rewritten), and the pre-update state still reads at v0
    val dir = new java.io.File(tbl)
    assert(dir.listFiles().exists(_.getName.startsWith("deletion_vector_")),
      "expected a deletion-vector sidecar from the update")
    assert(DeltaSource.readDelta(spark, tbl, Some(v0))
      .where(col("id") === 3L).select(col("v")).collect().map(_.getLong(0)).toSeq
      == Seq(30L))
    // a fully-matched file is dropped outright instead (stats-proven)
    DeltaSource.updateDelta(spark, tbl, col("part") === "c",
      Map("v" -> lit(0L)))
    assert(DeltaSource.readDelta(spark, tbl).where(col("part") === "c")
      .select(col("v")).collect().map(_.getLong(0)).toSeq == Seq(0L))
  }

  test("a second update unions into the same files' vectors") {
    val tbl = mk()
    DeltaSource.updateDelta(spark, tbl, col("id") === 3L,
      Map("v" -> lit(999L)))
    DeltaSource.updateDelta(spark, tbl, col("id") === 4L,
      Map("v" -> lit(888L)))
    val rows = DeltaSource.readDelta(spark, tbl)
      .as[(Long, String, Long)].collect().toSet
    assert(rows == Set((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 999L),
      (4L, "b", 888L), (5L, "c", 50L)), s"got $rows")
  }

  test("SET on a partition column moves rows across partitions") {
    val tbl = mk()
    DeltaSource.updateDelta(spark, tbl, col("id") === 5L,
      Map("part" -> lit("a")))
    val rows = DeltaSource.readDelta(spark, tbl)
      .where(col("part") === "a").as[(Long, String, Long)].collect().toSet
    assert(rows == Set((1L, "a", 10L), (2L, "a", 20L), (5L, "a", 50L)))
    assert(DeltaSource.readDelta(spark, tbl).count() == 5)
  }

  test("no matches is a no-op: no commit, version unchanged") {
    val tbl = mk()
    val v0 = DeltaSource.latestVersion(spark, tbl).get
    assert(DeltaSource.updateDelta(spark, tbl, col("v") > 10000L,
      Map("v" -> lit(0L))) == v0)
    assert(DeltaSource.latestVersion(spark, tbl).get == v0)
  }

  test("refuses SET on identity and generated columns; recomputes generated") {
    val tbl = tmpTable()
    DeltaSource.writeDelta(
      DeltaSource.withGeneratedColumn(
        Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), "v2", "v * 2"),
      tbl)
    intercept[IllegalArgumentException] {
      DeltaSource.updateDelta(spark, tbl, col("k") === 1L, Map("v2" -> lit(0L)))
    }
    // the generated column tracks the SET base column
    DeltaSource.updateDelta(spark, tbl, col("k") === 1L, Map("v" -> lit(7L)))
    val rows = DeltaSource.readDelta(spark, tbl)
      .as[(Long, Long, Long)].collect().toSet
    assert(rows == Set((1L, 7L, 14L), (2L, 20L, 40L)), s"got $rows")
  }

  test("CDF stages update_preimage/update_postimage for the matched rows") {
    val tbl = mk()
    DeltaSource.setTableProperties(spark, tbl,
      Map("delta.enableChangeDataFeed" -> "true"))
    val v0 = DeltaSource.latestVersion(spark, tbl).get
    DeltaSource.updateDelta(spark, tbl, col("part") === "b",
      Map("v" -> (col("v") + 1L)))
    val ch = DeltaSource.changesCdf(spark, tbl, Some(v0))._2.get
      .select(col("id"), col("v"), col("_change_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(ch == Set(
      (3L, 30L, "update_preimage"), (3L, 31L, "update_postimage"),
      (4L, 40L, "update_preimage"), (4L, 41L, "update_postimage")), s"got $ch")
  }

  test("already-DV-deleted rows cannot re-match a later update") {
    val tbl = mk()
    DeltaSource.deleteDelta(spark, tbl, col("id") === 3L)
    DeltaSource.updateDelta(spark, tbl, col("part") === "b",
      Map("v" -> lit(777L)))
    val rows = DeltaSource.readDelta(spark, tbl)
      .as[(Long, String, Long)].collect().toSet
    assert(rows == Set((1L, "a", 10L), (2L, "a", 20L), (4L, "b", 777L),
      (5L, "c", 50L)), s"got $rows")
  }
}
