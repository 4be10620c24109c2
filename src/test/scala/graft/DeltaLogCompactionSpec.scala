package graft

import java.nio.file.Files
import graft.sources.DeltaSource
import org.apache.spark.sql.functions._

/** Minor log compaction: aligned commit ranges reconcile into
  * `<x>.<y>.compacted.json` files that replay reads INSTEAD of the
  * member commits — O(ranges + stragglers) log reads between
  * checkpoints. Contracts: state parity (proven by deleting the
  * originals), tombstone survival, txn/domain reconciliation,
  * mid-range time travel via originals, and GC of spent ranges. */
class DeltaLogCompactionSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("graft_compact").toString + "/t"

  /** 21 commits: v0 base, v1..v20 appends of one row each; v7 is a
    * DELETE (tombstone via DV) and v14 an overwrite-free update mix. */
  private def mk(): String = {
    val tbl = tmpTable()
    DeltaSource.writeDelta(Seq((0L, 0L)).toDF("id", "v").coalesce(1), tbl)
    (1 to 6).foreach(i => DeltaSource.writeDelta(
      Seq((i.toLong, i * 10L)).toDF("id", "v"), tbl, overwrite = false))
    DeltaSource.deleteDelta(spark, tbl, col("id") === 3L) // v7
    (8 to 13).foreach(i => DeltaSource.writeDelta(
      Seq((i.toLong, i * 10L)).toDF("id", "v"), tbl, overwrite = false))
    DeltaSource.updateDelta(spark, tbl, col("id") === 5L,
      Map("v" -> lit(555L))) // v14
    (15 to 20).foreach(i => DeltaSource.writeDelta(
      Seq((i.toLong, i * 10L)).toDF("id", "v"), tbl, overwrite = false))
    tbl
  }

  test("compacted ranges replace their member commits byte-for-byte in replay") {
    val tbl = mk()
    val before = DeltaSource.readDelta(spark, tbl).orderBy($"id").collect().toSeq
    val ranges = DeltaSource.compactLog(spark, tbl, every = 10)
    assert(ranges == Seq((0L, 9L), (10L, 19L)), s"got $ranges")
    // the strongest possible proof the compactions are USED: remove
    // the originals they cover — replay must reconstruct the same
    // state from the two compacted files + the v20 straggler
    (0 to 19).foreach { v =>
      new java.io.File(s"$tbl/_delta_log/${"%020d".format(v)}.json").delete()
    }
    val after = DeltaSource.readDelta(spark, tbl).orderBy($"id").collect().toSeq
    assert(after == before, "compacted replay must equal the original state")
    // the v7 DELETE's tombstone and the v14 UPDATE both survived
    val ids = after.map(_.getLong(0))
    assert(!ids.contains(3L), "the deleted row must stay deleted")
    assert(after.find(_.getLong(0) == 5L).get.getLong(1) == 555L)
  }

  test("a second compactLog call is a no-op; partial tail ranges are skipped") {
    val tbl = mk()
    assert(DeltaSource.compactLog(spark, tbl, every = 10).size == 2)
    assert(DeltaSource.compactLog(spark, tbl, every = 10).isEmpty,
      "already-compacted ranges must not rewrite")
    // v20 alone is a partial range — never compacted
    assert(!new java.io.File(s"$tbl/_delta_log").listFiles()
      .exists(f => f.getName.endsWith(".compacted.json") &&
        f.getName.startsWith("%020d.".format(20))))
  }

  test("time travel INTO a compacted range reads the originals exactly") {
    val tbl = mk()
    val atV5 = DeltaSource.readDelta(spark, tbl, Some(5L)).orderBy($"id").collect().toSeq
    DeltaSource.compactLog(spark, tbl, every = 10)
    assert(DeltaSource.readDelta(spark, tbl, Some(5L)).orderBy($"id").collect().toSeq
      == atV5, "mid-range targets replay from plain commits")
  }

  test("txn state and row-tracking domains reconcile into the compaction") {
    val tbl = tmpTable()
    DeltaSource.writeDelta(Seq((0L, 0L)).toDF("id", "v").coalesce(1), tbl)
    DeltaSource.enableRowTracking(spark, tbl)
    (2 to 9).foreach(i => DeltaSource.writeDelta(
      Seq((i.toLong, i * 10L)).toDF("id", "v"), tbl, overwrite = false,
      txn = Some("appZ" -> i.toLong)))
    val hwmBefore = DeltaSource.readDeltaWithRowIds(spark, tbl)
      .agg(max($"_row_id")).as[Long].head()
    assert(DeltaSource.compactLog(spark, tbl, every = 10) == Seq((0L, 9L)))
    (0 to 9).foreach { v =>
      new java.io.File(s"$tbl/_delta_log/${"%020d".format(v)}.json").delete()
    }
    // appending above the compaction: watermark and txn state intact
    DeltaSource.writeDelta(Seq((99L, 990L)).toDF("id", "v"), tbl, overwrite = false)
    assert(DeltaSource.lastTxnVersion(spark, tbl, "appZ").contains(9L))
    val ids = DeltaSource.readDeltaWithRowIds(spark, tbl)
      .select($"_row_id").as[Long].collect().toSet
    assert(ids.size == 10 && ids.max > hwmBefore, s"no id reuse: $ids")
  }

  test("cleanup GCs compacted ranges spent below the newest checkpoint") {
    val tbl = mk()
    DeltaSource.compactLog(spark, tbl, every = 10)
    DeltaSource.checkpoint(spark, tbl)
    DeltaSource.cleanupExpiredLogs(spark, tbl, retainMs = 0L)
    val leftovers = new java.io.File(s"$tbl/_delta_log").listFiles()
      .map(_.getName).filter(_.endsWith(".compacted.json"))
    assert(leftovers.isEmpty, s"spent compactions must be GC'd: ${leftovers.toSeq}")
    // 19 appended rows minus the v7 delete
    assert(DeltaSource.readDelta(spark, tbl).count() == 18L)
  }
}
