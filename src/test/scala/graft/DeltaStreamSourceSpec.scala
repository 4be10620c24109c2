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

  test("a batch spanning append + full-file delete emits nothing from the dropped file") {
    // two disjoint clustered files; a delete that wipes ONE file
    // entirely (remove without re-add) inside the same batch range —
    // the dropped file's rows must not leak into the sink
    val tbl = tmpDir("drop") + "/t"
    DeltaSource.writeDelta(
      spark.range(0, 100).selectExpr("id", "id % 7 as k")
        .repartitionByRange(2, col("id")).sortWithinPartitions("id"), tbl) // v0
    DeltaSource.deleteDelta(spark, tbl, col("id") < 50) // v1: one file dropped
    val got = drain(tbl, tmpDir("ckpt")).flatMap(_._2).map(_._1)
    assert(got.sorted == (50L until 100L),
      s"dropped file's rows leaked: ${got.filter(_ < 50).take(5)}")
  }

  test("a batch spanning append + OPTIMIZE still delivers the appended rows once") {
    // the appends' files are compacted away (dataChange=false swap)
    // before the batch's end version: the source must chase the
    // rewrite to the compacted file instead of emitting nothing
    val tbl = mkTable() // v0: 0-99, v1: 100-199
    DeltaSource.optimizeDelta(spark, tbl, targetBytes = 1L << 30) // v2: swap
    val got = drain(tbl, tmpDir("ckpt")).flatMap(_._2).map(_._1)
    assert(got.sorted == (0L until 200L),
      s"append+optimize in one batch lost/duplicated rows: n=${got.size}")
  }

  test("a chained rewrite (optimize twice) still resolves to the live file") {
    val tbl = mkTable()
    DeltaSource.optimizeDelta(spark, tbl, targetBytes = 1L << 30) // v2
    DeltaSource.writeDelta(
      spark.range(200, 230).selectExpr("id", "id % 7 as k"), tbl,
      overwrite = false) // v3
    DeltaSource.optimizeDelta(spark, tbl, targetBytes = 1L << 30) // v4: rewrites again
    val got = drain(tbl, tmpDir("ckpt")).flatMap(_._2).map(_._1)
    assert(got.sorted == (0L until 230L),
      s"chained rewrites must chase to the final live file: n=${got.size}")
  }

  test("a batch spanning a CLUSTER BY rewrite that materialized row ids delivers appends once") {
    // the compaction-overlap contract composed with row tracking: the
    // swap commit rewrites the appended files WITH materialized
    // row-id/commit-version physical columns (extra cols the table
    // schema doesn't know) and carries the clustering domain — the
    // source must chase the rewrite into those fatter files and
    // project them through the TABLE schema, not choke on or leak
    // the materialized columns
    val tbl = tmpDir("rt") + "/t"
    DeltaSource.writeDelta(
      spark.range(0, 60).selectExpr("id", "id % 7 as k"), tbl) // v0
    DeltaSource.enableRowTracking(spark, tbl) // v1 (+ backfill commits)
    DeltaSource.writeDelta(
      spark.range(60, 120).selectExpr("id", "id % 7 as k"), tbl,
      overwrite = false)
    DeltaSource.optimizeClusterBy(spark, tbl, Seq("id", "k"), nFiles = 2, bits = 8)
    val got = drain(tbl, tmpDir("ckpt")).flatMap(_._2).map(_._1)
    assert(got.sorted == (0L until 120L),
      s"cluster-rewrite with materialized ids lost/duplicated rows: n=${got.size}")
  }

  test("a batch spanning a replaceWhere partition swap emits the POST-swap slice") {
    // append into p1 and then replaceWhere(p = p1) inside ONE batch
    // window: the appended file is removed with dataChange=true
    // before the batch's end version, so its rows never surface —
    // the feed reflects the swap's outcome (exactly the change-feed-
    // as-of-end contract; rows both born and replaced inside one
    // batch are unobservable, documented at-least-once composition)
    val tbl = tmpDir("rw") + "/t"
    val df0 = spark.range(0, 10).selectExpr("id", "id % 2 as k")
    DeltaSource.writeDelta(df0, tbl, partitionBy = Seq("k")) // v0
    DeltaSource.writeDelta(
      spark.range(100, 104).selectExpr("id", "id % 2 as k"), tbl,
      overwrite = false, partitionBy = Seq("k")) // v1: 2 rows each side
    DeltaSource.writeDeltaReplaceWhere(
      spark.range(200, 203).selectExpr("id", "cast(1 as bigint) as k"), tbl,
      col("k") === 1) // v2: k=1 slice swapped
    val got = drain(tbl, tmpDir("ckpt")).flatMap(_._2).map(_._1).sorted
    val expected = ((0L until 10L) ++ Seq(100L, 102L))
      .filter(_ % 2 == 0) ++ Seq(200L, 201L, 202L)
    assert(got == expected.sorted,
      s"replaceWhere-in-batch must emit survivors + replacement, got $got")
  }

  test("startingVersion begins mid-log") {
    val tbl = mkTable()
    val ckpt = tmpDir("ckpt")
    val got = drain(tbl, ckpt, Map("startingVersion" -> "1"))
    assert(got.flatMap(_._2).map(_._1).sorted == (100L until 200L))
  }

  // ── the matching graft-delta SINK ──────────────────────────────

  test("delta-to-delta pipeline: source -> transform -> sink, exactly once across reruns") {
    val src = mkTable()
    val dst = tmpDir("dst") + "/t"
    val ckpt = tmpDir("ckpt")
    def run(): Unit = {
      val q = spark.readStream.format("graft-delta").load(src)
        .withColumn("v2", col("k") * 10)
        .writeStream.format("graft-delta")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start(dst)
      q.awaitTermination(120000)
    }
    run()
    val got1 = DeltaSource.readDelta(spark, dst)
    assert(got1.count() == 200)
    assert(got1.where(col("v2") =!= col("k") * 10).count() == 0)
    // rerun with nothing new: no duplicates, no extra commits
    val v1 = DeltaSource.latestVersion(spark, dst)
    run()
    assert(DeltaSource.readDelta(spark, dst).count() == 200)
    assert(DeltaSource.latestVersion(spark, dst) == v1)
    // append upstream; only the delta flows through
    DeltaSource.writeDelta(
      spark.range(200, 230).selectExpr("id", "id % 7 as k"), src,
      overwrite = false)
    run()
    assert(DeltaSource.readDelta(spark, dst).count() == 230)
  }

  test("maxCommitsPerBatch bounds a deep-log backfill into multiple batches") {
    val tbl = tmpDir("deep") + "/t"
    (0 until 6).foreach { i =>
      DeltaSource.writeDelta(
        spark.range(i * 10, i * 10 + 10).selectExpr("id", "id % 7 as k"), tbl,
        overwrite = i == 0)
    }
    val buf = scala.collection.mutable.ArrayBuffer[Int]()
    val q = spark.readStream.format("graft-delta")
      .option("maxCommitsPerBatch", "2")
      .load(tbl)
      .writeStream
      .option("checkpointLocation", tmpDir("ckpt"))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val n = batch.count().toInt
        buf.synchronized { buf += n }
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    assert(buf.sum == 60)
    assert(buf.count(_ > 0) == 3, s"6 commits at 2/batch must drain in 3 batches, got $buf")
    assert(buf.filter(_ > 0).forall(_ == 20))
  }

  test("maxBytesPerBatch admits one commit per batch under a tiny budget") {
    val tbl = tmpDir("bytes") + "/t"
    (0 until 4).foreach { i =>
      DeltaSource.writeDelta(
        spark.range(i * 10, i * 10 + 10).selectExpr("id", "id % 5 as k"), tbl,
        overwrite = i == 0)
    }
    val buf = scala.collection.mutable.ArrayBuffer[Int]()
    val q = spark.readStream.format("graft-delta")
      // every commit exceeds 1 byte, so each batch admits exactly the
      // FIRST pending commit (the progress guarantee)
      .option("maxBytesPerBatch", "1")
      .load(tbl)
      .writeStream
      .option("checkpointLocation", tmpDir("bytesckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val n = batch.count().toInt
        buf.synchronized { buf += n }
        ()
      }
      .start()
    assert(q.awaitTermination(120000))
    assert(buf.sum == 40, s"drain must cover all 4 commits, got $buf")
    assert(buf.count(_ > 0) == 4, s"1-byte budget = one commit per batch, got $buf")
  }

  test("Trigger.AvailableNow drains a capped backfill COMPLETELY, then terminates") {
    // Under the single-batch fallback (no SupportsTriggerAvailableNow)
    // a maxCommitsPerBatch cap would strand all but the first n
    // commits: the engine would run one capped batch and stop. The
    // trait pins the log end at start and loops batches to it.
    val tbl = tmpDir("anow") + "/t"
    (0 until 6).foreach { i =>
      DeltaSource.writeDelta(
        spark.range(i * 10, i * 10 + 10).selectExpr("id", "id % 7 as k"), tbl,
        overwrite = i == 0)
    }
    val buf = scala.collection.mutable.ArrayBuffer[Int]()
    val q = spark.readStream.format("graft-delta")
      .option("maxCommitsPerBatch", "2")
      .load(tbl)
      .writeStream
      .option("checkpointLocation", tmpDir("anowckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val n = batch.count().toInt
        buf.synchronized { buf += n }
        ()
      }
      .start()
    assert(q.awaitTermination(120000), "AvailableNow query must self-terminate")
    assert(buf.sum == 60, s"the drain must cover ALL 6 commits, got $buf")
    assert(buf.count(_ > 0) == 3, s"6 commits at 2/batch = 3 batches, got $buf")
  }

  test("readChangeFeed streams true pre/post images and derived inserts") {
    import spark.implicits._
    val tbl = tmpDir("cdf") + "/t"
    DeltaSource.writeDelta(
      spark.range(5).selectExpr("id as k", "id * 10 as v"), tbl) // v0: derive inserts
    DeltaSource.setTableProperties(spark, tbl,
      Map("delta.enableChangeDataFeed" -> "true")) // v1: metadata only
    DeltaSource.mergeDelta(spark, tbl,
      Seq((2L, 222L), (50L, 500L)).toDF("k", "v"), Seq("k")) // v2: cdc
    DeltaSource.deleteDelta(spark, tbl,
      org.apache.spark.sql.functions.col("k") === 0L) // v3: cdc
    val buf = scala.collection.mutable.ArrayBuffer[(Long, Long, String, Long)]()
    val q = spark.readStream.format("graft-delta")
      .option("readChangeFeed", "true")
      .load(tbl)
      .writeStream
      .option("checkpointLocation", tmpDir("cdfckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = batch.collect().map(r => (r.getLong(0), r.getLong(1),
          r.getString(2), r.getLong(3)))
        buf.synchronized { buf ++= rows }
        ()
      }
      .start()
    assert(q.awaitTermination(120000))
    val got = buf.toSet
    val inserts0 = (0L until 5L).map(i => (i, i * 10, "insert", 0L)).toSet
    assert(got == inserts0 ++ Set(
      (2L, 20L, "update_preimage", 2L),
      (2L, 222L, "update_postimage", 2L),
      (50L, 500L, "insert", 2L),
      (0L, 0L, "delete", 3L)), s"got $got")
  }

  test("a replayed batch id commits once (txn guard in the sink)") {
    val dst = tmpDir("replay") + "/t"
    val sink = new graft.sources.DeltaStreamSink(dst, "app1", complete = false, Nil)
    val batch = spark.range(0, 50).selectExpr("id", "id % 7 as k")
    sink.addBatch(0L, batch.toDF())
    sink.addBatch(0L, batch.toDF()) // crash-replay of the same id
    sink.addBatch(1L, batch.toDF()) // a genuinely new batch appends
    assert(DeltaSource.readDelta(spark, dst).count() == 100)
  }
}
