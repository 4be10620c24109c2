package graft

import java.nio.file.Files
import graft.sources.DeltaSource
import org.apache.spark.sql.functions._

/** V2 checkpoints (the `v2Checkpoint` reader-writer feature): a
  * UUID-named manifest carrying table-wide actions + sidecar
  * pointers, file actions split across `_delta_log/_sidecars/`
  * parquet. Contracts: replay parity after log truncation, the
  * protocol gate, torn-sidecar loudness, sidecar GC, multi-sidecar
  * splits, and coexistence with the classic form. */
class DeltaCheckpointV2Spec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("graft_cpv2").toString + "/t"

  private def mk(): String = {
    val tbl = tmpTable()
    DeltaSource.writeDelta(
      (1L to 40L).map(i => (i, s"p${i % 3}", i * 10L)).toDF("id", "part", "v")
        .coalesce(1).sortWithinPartitions("id"),
      tbl, partitionBy = Seq("part"))
    DeltaSource.enableRowTracking(spark, tbl)
    DeltaSource.writeDelta(Seq((99L, "p0", 990L)).toDF("id", "part", "v"),
      tbl, overwrite = false, txn = Some("app1" -> 7L))
    DeltaSource.deleteDelta(spark, tbl, col("id") === 5L)
    tbl
  }

  test("v2 checkpoint + full log truncation replays the exact state") {
    val tbl = mk()
    val before = DeltaSource.readDeltaWithRowIds(spark, tbl)
      .orderBy($"id").collect().toSeq
    val cv = DeltaSource.checkpointV2(spark, tbl, sidecarFiles = 2)
    DeltaSource.cleanupExpiredLogs(spark, tbl, retainMs = 0L)
    // every pre-checkpoint JSON is gone; the state must come from the
    // manifest + sidecars alone
    val after = DeltaSource.readDeltaWithRowIds(spark, tbl)
      .orderBy($"id").collect().toSeq
    assert(after == before, "v2 replay must carry files, DVs, row ids, domains")
    assert(DeltaSource.lastTxnVersion(spark, tbl, "app1").contains(7L),
      "txn idempotency state must ride the manifest")
    // and a post-truncation append continues above the watermark
    DeltaSource.writeDelta(Seq((100L, "p1", 1000L)).toDF("id", "part", "v"),
      tbl, overwrite = false)
    val ids = DeltaSource.readDeltaWithRowIds(spark, tbl)
      .select($"_row_id").as[Long].collect().toSet
    assert(ids.size == 41, s"row ids stay unique after v2 replay, got ${ids.size}")
    assert(cv >= 3L)
  }

  test("the feature gate commits once; a re-checkpoint adds no version") {
    val tbl = mk()
    val v0 = DeltaSource.latestVersion(spark, tbl).get
    DeltaSource.checkpointV2(spark, tbl)
    val v1 = DeltaSource.latestVersion(spark, tbl).get
    assert(v1 == v0 + 1, "first v2 checkpoint commits the protocol gate")
    DeltaSource.checkpointV2(spark, tbl)
    assert(DeltaSource.latestVersion(spark, tbl).get == v1,
      "an already-gated table re-checkpoints without a new commit")
  }

  test("a torn sidecar errors loudly instead of serving a smaller table") {
    val tbl = mk()
    DeltaSource.checkpointV2(spark, tbl)
    DeltaSource.cleanupExpiredLogs(spark, tbl, retainMs = 0L)
    val dir = new java.io.File(s"$tbl/_delta_log/_sidecars")
    dir.listFiles().foreach(_.delete())
    val e = intercept[Exception] {
      DeltaSource.readDelta(spark, tbl).collect()
    }
    assert(e.getMessage.contains("missing") && e.getMessage.contains("sidecar"),
      s"got: ${e.getMessage}")
  }

  test("sidecar GC keeps referenced files, removes superseded ones") {
    val tbl = mk()
    DeltaSource.checkpointV2(spark, tbl)
    val firstSidecars = new java.io.File(s"$tbl/_delta_log/_sidecars")
      .listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet
    DeltaSource.writeDelta(Seq((101L, "p2", 1010L)).toDF("id", "part", "v"),
      tbl, overwrite = false)
    DeltaSource.checkpointV2(spark, tbl)
    DeltaSource.cleanupExpiredLogs(spark, tbl, retainMs = 0L)
    val left = new java.io.File(s"$tbl/_delta_log/_sidecars")
      .listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet
    assert(left.nonEmpty, "the newest manifest's sidecars survive")
    assert((left intersect firstSidecars).isEmpty,
      s"superseded sidecars must be GC'd, kept: ${left intersect firstSidecars}")
    val rows = DeltaSource.readDelta(spark, tbl).count()
    assert(rows == 41L)
  }

  test("multiple sidecars split the add actions") {
    val tbl = mk()
    DeltaSource.checkpointV2(spark, tbl, sidecarFiles = 3)
    val sidecars = new java.io.File(s"$tbl/_delta_log/_sidecars").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(sidecars.length == 3, s"expected 3 sidecars, got ${sidecars.length}")
  }

  test("a NEWER classic checkpoint coexists and wins as the seed") {
    val tbl = mk()
    DeltaSource.checkpointV2(spark, tbl)
    DeltaSource.writeDelta(Seq((102L, "p0", 1020L)).toDF("id", "part", "v"),
      tbl, overwrite = false)
    DeltaSource.checkpoint(spark, tbl) // classic, newer
    DeltaSource.cleanupExpiredLogs(spark, tbl, retainMs = 0L)
    assert(DeltaSource.readDelta(spark, tbl).count() == 41L)
  }
}
