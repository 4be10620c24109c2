package graft

import java.nio.file.Files
import graft.sources.DeltaSource
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** CHECK-constraint contracts (the Delta writer-protocol
  * `delta.constraints.*` table properties): adding validates existing
  * rows; writes/merges that violate abort before anything lands;
  * NULL passes (SQL CHECK semantics); properties survive
  * checkpoints, carry to clones, and drop cleanly. */
class DeltaConstraintsSpec extends SparkSpec {

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft_ck_$tag").toString + "/t"

  private def mkTable(): String = {
    val tbl = tmpDir("base")
    DeltaSource.writeDelta(
      spark.range(1, 100).selectExpr("id", "id * 2 as v"), tbl)
    tbl
  }

  test("delta.appendOnly refuses overwrite / merge-touching / delete / restore, allows appends") {
    import org.apache.spark.sql.functions.col
    val tbl = mkTable()
    DeltaSource.setTableProperties(spark, tbl, Map("delta.appendOnly" -> "true"))
    // appends stay legal
    DeltaSource.writeDelta(
      spark.range(100, 110).selectExpr("id", "id * 2 as v"), tbl, overwrite = false)
    assert(DeltaSource.readDelta(spark, tbl).count() == 109)
    val vNow = DeltaSource.latestVersion(spark, tbl).get
    def refused(op: => Any): Unit = {
      val e = intercept[IllegalStateException](op)
      assert(e.getMessage.contains("appendOnly"))
      assert(DeltaSource.latestVersion(spark, tbl).contains(vNow))
    }
    refused(DeltaSource.writeDelta(
      spark.range(3).selectExpr("id", "id as v"), tbl, overwrite = true))
    refused(DeltaSource.mergeDelta(spark, tbl,
      spark.range(1, 2).selectExpr("id", "id * 99 as v"), Seq("id")))
    refused(DeltaSource.deleteDelta(spark, tbl, col("id") < 5))
    refused(DeltaSource.restoreDelta(spark, tbl, 0L))
    // a merge of ONLY new keys is a pure append: legal
    DeltaSource.mergeDelta(spark, tbl,
      spark.range(500, 503).selectExpr("id", "id as v"), Seq("id"))
    assert(DeltaSource.readDelta(spark, tbl).count() == 112)
  }

  test("NOT NULL invariants refuse null values inline, before any commit") {
    import spark.implicits._
    val tbl = tmpDir("nn")
    // spark.range's id is non-nullable in the declared schema
    DeltaSource.writeDelta(spark.range(5).selectExpr("id", "id as v"), tbl)
    val vBefore = DeltaSource.latestVersion(spark, tbl).get
    val nullIds = Seq[(Option[Long], Long)]((Some(7L), 7L), (None, 8L))
      .toDF("id", "v")
    val e = intercept[Exception] {
      DeltaSource.writeDelta(nullIds, tbl, overwrite = false)
    }
    assert(e.getMessage.contains("NOT NULL invariant") ||
      Option(e.getCause).exists(_.getMessage.contains("NOT NULL invariant")),
      s"unexpected failure: $e")
    assert(DeltaSource.latestVersion(spark, tbl).contains(vBefore),
      "a violating batch must not commit")
    assert(DeltaSource.readDelta(spark, tbl).count() == 5)
  }

  test("addCheckConstraint refuses a constraint existing rows violate") {
    val tbl = mkTable()
    val e = intercept[IllegalArgumentException] {
      DeltaSource.addCheckConstraint(spark, tbl, "big", "id > 50")
    }
    assert(e.getMessage.contains("existing rows violate"))
    assert(DeltaSource.checkConstraintsOf(spark, tbl).isEmpty)
  }

  test("a violating append aborts before anything lands; a valid one passes") {
    val tbl = mkTable()
    DeltaSource.addCheckConstraint(spark, tbl, "positive", "id > 0")
    val vBefore = DeltaSource.latestVersion(spark, tbl).get
    val e = intercept[IllegalStateException] {
      DeltaSource.writeDelta(
        spark.range(-5, 5).selectExpr("id", "id * 2 as v"), tbl,
        overwrite = false)
    }
    assert(e.getMessage.contains("positive"))
    assert(DeltaSource.latestVersion(spark, tbl).contains(vBefore),
      "a refused write must not commit")
    assert(DeltaSource.readDelta(spark, tbl).count() == 99)
    DeltaSource.writeDelta(
      spark.range(100, 110).selectExpr("id", "id * 2 as v"), tbl,
      overwrite = false)
    assert(DeltaSource.readDelta(spark, tbl).count() == 109)
  }

  test("NULL constraint results pass (SQL CHECK three-valued semantics)") {
    val tbl = tmpDir("nulls")
    import spark.implicits._
    DeltaSource.writeDelta(
      Seq((1L, Some(2L)), (2L, None)).toDF("id", "v"), tbl)
    DeltaSource.addCheckConstraint(spark, tbl, "v_pos", "v > 0")
    // null v → constraint UNKNOWN → passes, per the SQL standard
    DeltaSource.writeDelta(
      Seq((3L, Option.empty[Long])).toDF("id", "v"), tbl, overwrite = false)
    assert(DeltaSource.readDelta(spark, tbl).count() == 3)
    // false v → aborts
    intercept[IllegalStateException] {
      DeltaSource.writeDelta(
        Seq((4L, Some(-1L))).toDF("id", "v"), tbl, overwrite = false)
    }
  }

  test("mergeDelta enforces constraints on the update batch") {
    val tbl = mkTable()
    DeltaSource.addCheckConstraint(spark, tbl, "cap", "v < 1000")
    intercept[IllegalStateException] {
      DeltaSource.mergeDelta(spark, tbl,
        spark.range(1, 3).selectExpr("id", "id + 5000 as v"), Seq("id"))
    }
    DeltaSource.mergeDelta(spark, tbl,
      spark.range(1, 3).selectExpr("id", "id + 500 as v"), Seq("id"))
    assert(DeltaSource.readDelta(spark, tbl)
      .where(col("id") === 1).head().getLong(1) == 501)
  }

  test("constraints survive checkpoint + log truncation and drop cleanly") {
    val tbl = mkTable()
    DeltaSource.addCheckConstraint(spark, tbl, "positive", "id > 0")
    val cpv = DeltaSource.checkpoint(spark, tbl)
    val fs = new Path(tbl).getFileSystem(spark.sparkContext.hadoopConfiguration)
    (0L to cpv).foreach(v => fs.delete(new Path(tbl, f"_delta_log/$v%020d.json"), false))
    assert(DeltaSource.checkConstraintsOf(spark, tbl) == Map("positive" -> "id > 0"))
    intercept[IllegalStateException] {
      DeltaSource.writeDelta(
        spark.range(-1, 1).selectExpr("id", "id as v"), tbl, overwrite = false)
    }
    DeltaSource.dropCheckConstraint(spark, tbl, "positive")
    assert(DeltaSource.checkConstraintsOf(spark, tbl).isEmpty)
    DeltaSource.writeDelta(
      spark.range(-1, 1).selectExpr("id", "id as v"), tbl, overwrite = false)
    assert(DeltaSource.readDelta(spark, tbl).where(col("id") <= 0).count() == 2)
  }

  test("table properties carry to a shallow clone") {
    val src = mkTable()
    DeltaSource.addCheckConstraint(spark, src, "positive", "id > 0")
    val dst = tmpDir("clone")
    DeltaSource.cloneDelta(spark, src, dst)
    assert(DeltaSource.checkConstraintsOf(spark, dst) == Map("positive" -> "id > 0"))
    intercept[IllegalStateException] {
      DeltaSource.writeDelta(
        spark.range(-1, 1).selectExpr("id", "id * 2 as v"), dst, overwrite = false)
    }
  }
}
