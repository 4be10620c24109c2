package graft

import java.nio.file.Files
import graft.sources.DeltaSource
import org.apache.spark.sql.functions._

/** Identity-column contracts (the Delta-spec `delta.identity.*`
  * schema-metadata fields + the identityColumns writer gate):
  * GENERATED ALWAYS assignment above a high watermark that rides the
  * commit's own metaData (read back from footer stats, no extra
  * job); start/step honored; explicit values refused; monotone
  * across appends and restarts. Assignment is the two-phase
  * zipWithIndex shape — per-partition counts, driver prefix offsets,
  * map-side values — so no global window at any batch size. */
class DeltaIdentitySpec extends SparkSpec {

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft_id_$tag").toString + "/t"

  private def mk(start: Long = 1L, step: Long = 1L): String = {
    val tbl = tmpDir("base")
    DeltaSource.writeDelta(
      DeltaSource.withIdentityColumn(
        spark.range(100).selectExpr("id as k", "id * 2 as v"),
        "row_id", start, step),
      tbl)
    tbl
  }

  test("create assigns dense unique values from start") {
    val tbl = mk()
    val r = DeltaSource.readDelta(spark, tbl)
      .agg(count(lit(1)).as("n"), countDistinct(col("row_id")).as("d"),
        min(col("row_id")).as("mn"), max(col("row_id")).as("mx"))
      .collect()(0)
    assert(r.getLong(0) == 100 && r.getLong(1) == 100)
    assert(r.getLong(2) == 1L && r.getLong(3) == 100L)
    assert(DeltaSource.identityColumnsOf(spark, tbl) ==
      Map("row_id" -> (1L, 1L, Some(100L))))
  }

  test("start and step are honored, including negative step") {
    val tbl = mk(start = 1000L, step = 10L)
    val r = DeltaSource.readDelta(spark, tbl)
      .agg(min(col("row_id")), max(col("row_id")),
        count_distinct(col("row_id") % 10)).collect()(0)
    assert(r.getLong(0) == 1000L && r.getLong(1) == 1990L && r.getLong(2) == 1L)

    val neg = tmpDir("neg")
    DeltaSource.writeDelta(
      DeltaSource.withIdentityColumn(
        spark.range(5).selectExpr("id as k"), "row_id", -1L, -1L),
      neg)
    val vals = DeltaSource.readDelta(spark, neg)
      .select(col("row_id")).collect().map(_.getLong(0)).sorted
    assert(vals.toSeq == Seq(-5L, -4L, -3L, -2L, -1L))
    assert(DeltaSource.identityColumnsOf(spark, neg)("row_id")._3.contains(-5L))
  }

  test("an append omitting the column continues above the watermark") {
    val tbl = mk()
    DeltaSource.writeDelta(
      spark.range(40).selectExpr("id + 500 as k", "id as v"), tbl,
      overwrite = false)
    val all = DeltaSource.readDelta(spark, tbl)
    assert(all.agg(countDistinct(col("row_id"))).collect()(0).getLong(0) == 140)
    val newMin = all.where(col("k") >= 500)
      .agg(min(col("row_id"))).collect()(0).getLong(0)
    assert(newMin == 101L, s"append must start past the watermark, got $newMin")
    assert(DeltaSource.identityColumnsOf(spark, tbl)("row_id")._3.contains(140L))
  }

  test("supplying explicit values is refused (GENERATED ALWAYS)") {
    val tbl = mk()
    val vBefore = DeltaSource.latestVersion(spark, tbl).get
    val e = intercept[IllegalStateException] {
      DeltaSource.writeDelta(
        spark.range(5).selectExpr("id as k", "id as v", "id + 9000 as row_id"),
        tbl, overwrite = false)
    }
    assert(e.getMessage.contains("GENERATED ALWAYS"))
    assert(DeltaSource.latestVersion(spark, tbl).contains(vBefore))
  }

  test("the identityColumns writer gate rides the declaring commit") {
    val tbl = mk()
    val log = Files.readString(java.nio.file.Paths.get(
      tbl, "_delta_log", "00000000000000000000.json"))
    assert(log.contains("\"minWriterVersion\":6"),
      s"declaring commit must carry the writer gate, got: $log")
  }

  test("the watermark survives checkpoint + log replay; ids stay unique across many appends") {
    val tbl = mk()
    (0 until 4).foreach { i =>
      DeltaSource.writeDelta(
        spark.range(10).selectExpr(s"id + ${1000 * (i + 1)} as k", "id as v"),
        tbl, overwrite = false)
      if (i == 1) DeltaSource.checkpoint(spark, tbl)
    }
    val all = DeltaSource.readDelta(spark, tbl)
    val r = all.agg(count(lit(1)), countDistinct(col("row_id")),
      max(col("row_id"))).collect()(0)
    assert(r.getLong(0) == 140 && r.getLong(1) == 140 && r.getLong(2) == 140L)
  }

  test("MERGE: matched rows keep their ids, inserts get fresh ones, watermark advances") {
    import spark.implicits._
    val tbl = mk() // ids 1..100 on k = 0..99
    val idOfK3 = DeltaSource.readDelta(spark, tbl)
      .where(col("k") === 3).select(col("row_id")).head().getLong(0)
    // update k=3, insert k=500 — identity column NOT supplied
    DeltaSource.mergeDelta(spark, tbl,
      Seq((3L, 999L), (500L, 1L)).toDF("k", "v"), Seq("k"))
    val after = DeltaSource.readDelta(spark, tbl)
    assert(after.where(col("k") === 3).select(col("row_id")).head().getLong(0)
      == idOfK3, "matched rows must keep their existing id")
    val newId = after.where(col("k") === 500).select(col("row_id")).head().getLong(0)
    assert(newId == 101L, s"insert must take the next id above the watermark, got $newId")
    assert(after.agg(countDistinct(col("row_id"))).head().getLong(0) == 101)
    assert(DeltaSource.identityColumnsOf(spark, tbl)("row_id")._3.exists(_ >= 101L),
      "merge must advance the watermark in its own commit")
    // and the NEXT append continues correctly past the merge's ids
    DeltaSource.writeDelta(spark.range(600, 603).selectExpr("id as k", "id as v"),
      tbl, overwrite = false)
    assert(DeltaSource.readDelta(spark, tbl)
      .agg(countDistinct(col("row_id"))).head().getLong(0) == 104,
      "post-merge appends must not reuse merge-assigned ids")
    // supplying identity values to a merge is refused
    val e = intercept[IllegalStateException] {
      DeltaSource.mergeDelta(spark, tbl,
        Seq((7L, 1L, 9999L)).toDF("k", "v", "row_id"), Seq("k"))
    }
    assert(e.getMessage.contains("GENERATED ALWAYS"))
  }

  test("identity survives the streaming sink: ids continue across micro-batches") {
    val src = tmpDir("ssrc")
    val dst = tmpDir("sdst")
    // identity table pre-created; the stream appends WITHOUT the column
    DeltaSource.writeDelta(
      DeltaSource.withIdentityColumn(
        spark.range(10).selectExpr("id as k"), "row_id"),
      dst)
    DeltaSource.writeDelta(spark.range(100, 110).selectExpr("id as k"), src)
    DeltaSource.writeDelta(spark.range(110, 115).selectExpr("id as k"), src,
      overwrite = false)
    val q = spark.readStream.format("graft-delta")
      .option("maxCommitsPerBatch", "1")
      .load(src)
      .writeStream.format("graft-delta")
      .option("checkpointLocation", tmpDir("sckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(dst)
    assert(q.awaitTermination(120000))
    val r = DeltaSource.readDelta(spark, dst)
      .agg(count(lit(1)), countDistinct(col("row_id")), max(col("row_id")))
      .collect()(0)
    assert(r.getLong(0) == 25 && r.getLong(1) == 25 && r.getLong(2) == 25L,
      "streamed batches must extend the id sequence densely and uniquely")
  }

  test("an overwrite keeps the declaration and restarts numbering from its watermark") {
    val tbl = mk()
    // caller's overwrite batch: no identity column, no metadata
    DeltaSource.writeDelta(
      spark.range(7).selectExpr("id as k", "id as v"), tbl, overwrite = true)
    val ids = DeltaSource.identityColumnsOf(spark, tbl)
    assert(ids.contains("row_id"), "overwrite must carry the identity declaration")
    val vals = DeltaSource.readDelta(spark, tbl)
      .select(col("row_id")).collect().map(_.getLong(0)).sorted
    assert(vals.toSeq == (101L to 107L),
      s"overwrite numbering continues above the previous watermark, got ${vals.toSeq}")
  }
}
