package graft

import graft.sources.DeltaSource
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Atomic partition overwrite (replaceWhere): exactly the predicate's
  * slice is replaced in one commit, victims are chosen by partition
  * metadata, out-of-predicate batches and non-partition predicates
  * are refused with nothing committed, and CDF carries the full
  * delete/insert image pair. */
class DeltaReplaceWhereSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("graft_rw").toString + "/t"

  private def mk(): String = {
    val tbl = tmpTable()
    DeltaSource.writeDelta(
      Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L), (4L, "b", 40L),
        (5L, "c", 50L)).toDF("id", "part", "v"),
      tbl, partitionBy = Seq("part"))
    tbl
  }

  test("replaces exactly the predicate's partition in one commit") {
    val tbl = mk()
    val v0 = DeltaSource.latestVersion(spark, tbl).get
    val v1 = DeltaSource.writeDeltaReplaceWhere(
      Seq((9L, "b", 900L)).toDF("id", "part", "v"), tbl, col("part") === "b")
    assert(v1 == v0 + 1, "replace must be ONE commit")
    val rows = DeltaSource.readDelta(spark, tbl)
      .as[(Long, String, Long)].collect().toSet
    assert(rows == Set((1L, "a", 10L), (2L, "a", 20L), (9L, "b", 900L),
      (5L, "c", 50L)), s"got $rows")
    // history preserved: the old slice still reads at v0
    assert(DeltaSource.readDelta(spark, tbl, Some(v0))
      .where(col("part") === "b").count() == 2)
  }

  test("an empty batch deletes the partition") {
    val tbl = mk()
    DeltaSource.writeDeltaReplaceWhere(
      Seq.empty[(Long, String, Long)].toDF("id", "part", "v"),
      tbl, col("part") === "a")
    val rows = DeltaSource.readDelta(spark, tbl)
      .as[(Long, String, Long)].collect().toSet
    assert(rows == Set((3L, "b", 30L), (4L, "b", 40L), (5L, "c", 50L)))
  }

  test("refuses a batch with rows outside the predicate; nothing committed") {
    val tbl = mk()
    val v0 = DeltaSource.latestVersion(spark, tbl).get
    intercept[IllegalArgumentException] {
      DeltaSource.writeDeltaReplaceWhere(
        Seq((9L, "b", 900L), (10L, "c", 1000L)).toDF("id", "part", "v"),
        tbl, col("part") === "b")
    }
    assert(DeltaSource.latestVersion(spark, tbl).get == v0)
    assert(DeltaSource.readDelta(spark, tbl).count() == 5)
  }

  test("refuses predicates on non-partition columns") {
    val tbl = mk()
    intercept[IllegalArgumentException] {
      DeltaSource.writeDeltaReplaceWhere(
        Seq((9L, "b", 900L)).toDF("id", "part", "v"), tbl, col("v") > 0)
    }
  }

  test("CDF: delete images for the replaced slice, inserts for the batch") {
    val tbl = mk()
    DeltaSource.setTableProperties(spark, tbl,
      Map("delta.enableChangeDataFeed" -> "true"))
    val v0 = DeltaSource.latestVersion(spark, tbl).get
    DeltaSource.writeDeltaReplaceWhere(
      Seq((9L, "b", 900L)).toDF("id", "part", "v"), tbl, col("part") === "b")
    val ch = DeltaSource.changesCdf(spark, tbl, Some(v0))._2.get
      .select(col("id"), col("part"), col("v"), col("_change_type"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3))).toSet
    assert(ch == Set(
      (3L, "b", 30L, "delete"),
      (4L, "b", 40L, "delete"),
      (9L, "b", 900L, "insert")), s"got $ch")
  }

  test("CDF delete images honor deletion vectors on the victim files") {
    val tbl = mk()
    DeltaSource.setTableProperties(spark, tbl,
      Map("delta.enableChangeDataFeed" -> "true"))
    // DV-delete id=3 first: its row is no longer live, so the later
    // replace must NOT emit a delete image for it
    DeltaSource.deleteDelta(spark, tbl, col("id") === 3L)
    val v0 = DeltaSource.latestVersion(spark, tbl).get
    DeltaSource.writeDeltaReplaceWhere(
      Seq((9L, "b", 900L)).toDF("id", "part", "v"), tbl, col("part") === "b")
    val ch = DeltaSource.changesCdf(spark, tbl, Some(v0))._2.get
      .select(col("id"), col("_change_type"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(ch == Set((4L, "delete"), (9L, "insert")), s"got $ch")
    val rows = DeltaSource.readDelta(spark, tbl)
      .as[(Long, String, Long)].collect().toSet
    assert(rows == Set((1L, "a", 10L), (2L, "a", 20L), (9L, "b", 900L),
      (5L, "c", 50L)))
  }
}
