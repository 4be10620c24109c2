package graft

import java.nio.file.Files
import graft.sources.DeltaSource
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The graft Delta change feed as a first-class Structured Streaming
  * source: engine-checkpointed offsets (commit versions), AvailableNow
  * draining, restart-exactly-once, dataChange=false invisibility, DV
  * composition, and mid-log starts. */
class DeltaStreamSourceSpec extends SparkSpec {

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft_dss_$tag").toString

  /** Drain the table's unseen commits through AvailableNow into a
    * buffer; returns the (batchId, rows) pairs this run consumed. */
  private def drain(tbl: String, ckpt: String,
                    options: Map[String, String] = Map.empty): Seq[(Long, Seq[(Long, Long)])] = {
    val buf = scala.collection.mutable.ArrayBuffer[(Long, Seq[(Long, Long)])]()
    val reader = options.foldLeft(spark.readStream.format("graft-delta")) {
      case (r, (k, v)) => r.option(k, v)
    }
    val q = reader.load(tbl)
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val rows = batch.select(col("id"), col("k")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
        buf.synchronized { buf += ((id, rows)) }
        ()
      }
      .start()
    q.awaitTermination(120000)
    buf.toSeq
  }

  private def mkTable(): String = {
    val tbl = tmpDir("tbl") + "/t"
    DeltaSource.writeDelta(
      spark.range(0, 100).selectExpr("id", "id % 7 as k"), tbl) // v0
    DeltaSource.writeDelta(
      spark.range(100, 200).selectExpr("id", "id % 7 as k"), tbl,
      overwrite = false) // v1
    tbl
  }

  test("AvailableNow drains every commit once, in order, through the engine checkpoint") {
    val tbl = mkTable()
    val ckpt = tmpDir("ckpt")
    val got = drain(tbl, ckpt)
    assert(got.flatMap(_._2).map(_._1).sorted == (0L until 200L))
    // a second run against the SAME checkpoint with no new commits
    // consumes nothing (no batch with rows)
    val again = drain(tbl, ckpt)
    assert(again.flatMap(_._2).isEmpty)
  }

  test("a restarted query resumes at exactly the first unseen commit") {
    val tbl = mkTable()
    val ckpt = tmpDir("ckpt")
    drain(tbl, ckpt)
    DeltaSource.writeDelta(
      spark.range(200, 250).selectExpr("id", "id % 7 as k"), tbl,
      overwrite = false) // v2
    val got = drain(tbl, ckpt)
    assert(got.flatMap(_._2).map(_._1).sorted == (200L until 250L))
  }

  test("dataChange=false commits (OPTIMIZE) are invisible to the stream") {
    val tbl = mkTable()
    val ckpt = tmpDir("ckpt")
    drain(tbl, ckpt)
    DeltaSource.optimizeDelta(spark, tbl, targetBytes = 1L << 30)
    val got = drain(tbl, ckpt)
    assert(got.flatMap(_._2).isEmpty,
      "a layout swap holds no new data and must not replay")
  }

  test("a DV delete commit replays the survivors of its touched files") {
    val tbl = mkTable()
    val ckpt = tmpDir("ckpt")
    drain(tbl, ckpt)
    DeltaSource.deleteDelta(spark, tbl, col("id") % 2 === 0)
    val got = drain(tbl, ckpt).flatMap(_._2).map(_._1)
    assert(got.nonEmpty && got.forall(_ % 2 == 1),
      s"delete commit must replay only surviving rows, got ${got.take(5)}")
  }

  test("startingVersion begins mid-log") {
    val tbl = mkTable()
    val ckpt = tmpDir("ckpt")
    val got = drain(tbl, ckpt, Map("startingVersion" -> "1"))
    assert(got.flatMap(_._2).map(_._1).sorted == (100L until 200L))
  }
}
