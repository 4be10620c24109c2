package graft

import graft.sources.DeltaSource
import java.nio.file.Files
import org.apache.spark.sql.functions.col

/** Delta operational commands: exactly-once streaming sink (txn
  * actions), VACUUM, and OPTIMIZE (dataChange=false compaction the
  * change feed must skip). */
class DeltaOpsSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("graft_deltaops").toString + "/t"

  test("delta.checkpointInterval auto-checkpoints every Nth commit") {
    val tbl = tmpTable()
    DeltaSource.writeDelta(spark.range(5).toDF("id"), tbl)
    DeltaSource.setTableProperties(spark, tbl,
      Map("delta.checkpointInterval" -> "3"))
    // commits 2..7: versions 3 and 6 should fold checkpoints
    (0 until 5).foreach { i =>
      DeltaSource.writeDelta(spark.range(i * 5, i * 5 + 5).toDF("id"), tbl,
        overwrite = false)
    }
    val logDir = java.nio.file.Paths.get(tbl, "_delta_log")
    val cps = java.nio.file.Files.list(logDir).toArray.map(_.toString)
      .filter(_.contains("checkpoint")).sorted
    assert(cps.exists(_.contains("00000000000000000003.checkpoint")) &&
      cps.exists(_.contains("00000000000000000006.checkpoint")),
      s"expected auto-checkpoints at v3 and v6, got ${cps.toSeq}")
    assert(DeltaSource.readDelta(spark, tbl).count() == 30)
  }

  test("statsProfile profiles the table from metadata alone (data files deletable)") {
    import org.apache.spark.sql.functions.col
    val tbl = tmpTable()
    DeltaSource.writeDelta(
      spark.range(1000).selectExpr("id as k",
        "CASE WHEN id % 10 = 0 THEN NULL ELSE id * 2 END as v",
        "concat('row-', lpad(CAST(id AS STRING), 4, '0')) as s")
        .repartition(4, col("k")), tbl)
    val prof = DeltaSource.statsProfile(spark, tbl)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(prof("k").getString(1) == "0" && prof("k").getString(2) == "999")
    assert(prof("v").getLong(3) == 100, "null count from footer stats")
    assert(prof("s").getString(1) == "row-0000" && prof("s").getString(2) == "row-0999")
    assert(prof("k").getLong(6) == 1000, "numRecords accounting")
    // the proof it is metadata-only: delete every DATA file, profile again
    val dir = new org.apache.hadoop.fs.Path(tbl)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(dir).filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .foreach(s => fs.delete(s.getPath, false))
    val again = DeltaSource.statsProfile(spark, tbl)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(again("k").getString(2) == "999",
      "profile must come from the log, not the data files")
  }

  test("history lists commits newest-first with action counts and authoritative timestamps") {
    val tbl = tmpTable()
    DeltaSource.writeDelta(spark.range(5).toDF("id"), tbl)
    DeltaSource.writeDelta(spark.range(5, 8).toDF("id"), tbl, overwrite = false)
    DeltaSource.enableInCommitTimestamps(spark, tbl)
    DeltaSource.writeDelta(spark.range(8, 9).toDF("id"), tbl, overwrite = false)
    val h = DeltaSource.history(spark, tbl).collect()
    assert(h.map(_.getLong(0)).toSeq == Seq(3L, 2L, 1L, 0L), "newest first")
    val ts = h.map(_.getLong(1)).reverse.toSeq
    assert(ts == ts.sorted, "timestamps non-decreasing across the log")
    assert(h.find(_.getLong(0) == 2L).get.getAs[Long]("n_metadata") == 1L)
    assert(h.find(_.getLong(0) == 3L).get.getAs[Long]("n_adds") >= 1L)
  }

  test("cleanupExpiredLogs deletes only checkpoint-folded expired commits; replay survives") {
    val tbl = tmpTable()
    (0 until 5).foreach { i =>
      DeltaSource.writeDelta(spark.range(i * 3, i * 3 + 3).toDF("id"), tbl,
        overwrite = i == 0)
    }
    // no checkpoint yet: nothing is reclaimable at any age
    assert(DeltaSource.cleanupExpiredLogs(spark, tbl, retainMs = 0L).isEmpty)
    DeltaSource.checkpoint(spark, tbl) // at v4
    val gone = DeltaSource.cleanupExpiredLogs(spark, tbl, retainMs = 0L)
    assert(gone == Seq(0L, 1L, 2L, 3L), s"expected v0-v3 reclaimed, got $gone")
    // the table replays from the checkpoint + surviving commits
    assert(DeltaSource.readDelta(spark, tbl).count() == 15)
    // a retention window keeps young commits even below the checkpoint
    DeltaSource.writeDelta(spark.range(100, 101).toDF("id"), tbl, overwrite = false)
    DeltaSource.checkpoint(spark, tbl)
    assert(DeltaSource.cleanupExpiredLogs(spark, tbl,
      retainMs = 24L * 3600 * 1000).isEmpty, "young commits must survive retention")
  }

  test("cleanup keeps a superseded checkpoint that retained commits still seed from") {
    val tbl = tmpTable()
    (0 until 3).foreach { i =>
      DeltaSource.writeDelta(spark.range(i * 3, i * 3 + 3).toDF("id"), tbl,
        overwrite = i == 0)
    }
    DeltaSource.checkpoint(spark, tbl) // checkpoint at v2
    DeltaSource.writeDelta(spark.range(100, 103).toDF("id"), tbl,
      overwrite = false) // v3 — seeds from checkpoint 2
    DeltaSource.writeDelta(spark.range(103, 106).toDF("id"), tbl,
      overwrite = false) // v4
    DeltaSource.checkpoint(spark, tbl) // checkpoint at v4 (newest)
    // age everything EXCEPT the v3 commit (it stays in-retention);
    // retainMs=0 would doom every old file, so backdate selectively
    val fs = new org.apache.hadoop.fs.Path(tbl)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val logDir = new org.apache.hadoop.fs.Path(tbl, "_delta_log")
    val old = System.currentTimeMillis() - 60L * 24 * 3600 * 1000
    fs.listStatus(logDir).toSeq.filter(_.isFile).foreach { s =>
      if (!s.getPath.getName.startsWith(f"${3L}%020d"))
        fs.setTimes(s.getPath, old, -1)
    }
    val gone = DeltaSource.cleanupExpiredLogs(spark, tbl,
      retainMs = 30L * 24 * 3600 * 1000)
    assert(gone == Seq(0L, 1L, 2L), s"expired commits reclaimed, got $gone")
    // checkpoint 2 must SURVIVE: the retained v3 commit seeds from it
    assert(fs.listStatus(logDir).toSeq.map(_.getPath.getName)
      .exists(_.startsWith(f"${2L}%020d.checkpoint")),
      "checkpoint 2 is v3's replay seed and must not be deleted")
    // and time travel to the retained version still works
    assert(DeltaSource.readDelta(spark, tbl, Some(3L)).count() == 12)
  }

  test("a torn multi-part checkpoint is never used as a replay seed") {
    // adopted-table shape: the checkpoint is split into parts
    // 1..n; losing a part (crashed cleanup, transient delete
    // failure) must surface as an explicit error when the missing
    // commits can no longer replay — NOT as a silently smaller table
    val tbl = tmpTable()
    DeltaSource.writeDelta(spark.range(0, 3).toDF("id"), tbl) // v0
    DeltaSource.writeDelta(spark.range(3, 6).toDF("id"), tbl,
      overwrite = false) // v1
    DeltaSource.checkpoint(spark, tbl) // single-file checkpoint at v1
    val conf = spark.sparkContext.hadoopConfiguration
    val logDir = new org.apache.hadoop.fs.Path(tbl, "_delta_log")
    val fs = logDir.getFileSystem(conf)
    val single = new org.apache.hadoop.fs.Path(logDir, f"${1L}%020d.checkpoint.parquet")
    val part1 = new org.apache.hadoop.fs.Path(logDir,
      f"${1L}%020d.checkpoint.0000000001.0000000002.parquet")
    val part2 = new org.apache.hadoop.fs.Path(logDir,
      f"${1L}%020d.checkpoint.0000000002.0000000002.parquet")
    org.apache.hadoop.fs.FileUtil.copy(fs, single, fs, part1, false, conf)
    org.apache.hadoop.fs.FileUtil.copy(fs, single, fs, part2, false, conf)
    fs.delete(single, false)
    // a COMPLETE part set seeds fine
    assert(DeltaSource.readDelta(spark, tbl).count() == 6)
    // tear it and expire the pre-checkpoint commit, as a crashed
    // cleanup would leave things
    fs.delete(part2, false)
    fs.delete(new org.apache.hadoop.fs.Path(logDir, f"${0L}%020d.json"), false)
    val e = intercept[IllegalArgumentException] {
      DeltaSource.readDelta(spark, tbl).count()
    }
    assert(e.getMessage.contains("missing from the log"),
      s"torn checkpoint must error on unreplayable state, got: ${e.getMessage}")
    // restoring the part heals the seed
    org.apache.hadoop.fs.FileUtil.copy(fs, part1, fs, part2, false, conf)
    assert(DeltaSource.readDelta(spark, tbl).count() == 6)
  }

  test("cleanup reclaims aged stray parts of a crashed checkpoint attempt") {
    val tbl = tmpTable()
    DeltaSource.writeDelta(spark.range(0, 3).toDF("id"), tbl) // v0
    DeltaSource.writeDelta(spark.range(3, 6).toDF("id"), tbl,
      overwrite = false) // v1
    DeltaSource.checkpoint(spark, tbl) // valid single-file cp at v1
    val conf = spark.sparkContext.hadoopConfiguration
    val logDir = new org.apache.hadoop.fs.Path(tbl, "_delta_log")
    val fs = logDir.getFileSystem(conf)
    // a crashed multi-part attempt left one part at v0 — logVersions
    // refuses it as a seed, so without explicit reclamation it would
    // survive every cleanup forever
    val stray = new org.apache.hadoop.fs.Path(logDir,
      f"${0L}%020d.checkpoint.0000000001.0000000003.parquet")
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(logDir, f"${1L}%020d.checkpoint.parquet"),
      fs, stray, false, conf)
    val old = System.currentTimeMillis() - 60L * 24 * 3600 * 1000
    fs.setTimes(stray, old, -1)
    DeltaSource.cleanupExpiredLogs(spark, tbl, retainMs = 30L * 24 * 3600 * 1000)
    assert(!fs.exists(stray), "aged torn-attempt garbage must be reclaimed")
    assert(DeltaSource.readDelta(spark, tbl).count() == 6)
  }

  test("exactly-once sink: a replayed batch commits once") {
    val t = tmpTable()
    val sink = DeltaSource.exactlyOnceBatchSink(t, "app1") _
    sink(Seq((1L, "a")).toDF("id", "s"), 0L)
    sink(Seq((2L, "b")).toDF("id", "s"), 1L)
    sink(Seq((2L, "b")).toDF("id", "s"), 1L) // restart replays batch 1
    assert(DeltaSource.readDelta(spark, t).count() == 2)
    assert(DeltaSource.lastTxnVersion(spark, t, "app1").contains(1L))
    assert(DeltaSource.lastTxnVersion(spark, t, "other").isEmpty)
    // out-of-order old batch is also refused
    sink(Seq((9L, "z")).toDF("id", "s"), 0L)
    assert(DeltaSource.readDelta(spark, t).count() == 2)
  }

  test("the sink rides a real writeStream.foreachBatch micro-batch stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t = tmpTable()
    val mem = MemoryStream[(Long, String)]
    mem.addData((1L, "a"), (2L, "b"))
    val q = mem.toDF().toDF("id", "s").writeStream
      .foreachBatch(DeltaSource.exactlyOnceBatchSink(t, "stream1") _)
      .start()
    try {
      q.processAllAvailable()
      mem.addData((3L, "c"))
      q.processAllAvailable()
    } finally q.stop()
    assert(DeltaSource.readDelta(spark, t).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(DeltaSource.lastTxnVersion(spark, t, "stream1").contains(1L))
  }

  test("txn state survives checkpoint + log truncation") {
    val t = tmpTable()
    val sink = DeltaSource.exactlyOnceBatchSink(t, "appX") _
    sink(Seq((1L, "a")).toDF("id", "s"), 0L)
    sink(Seq((2L, "b")).toDF("id", "s"), 1L)
    DeltaSource.checkpoint(spark, t)
    // drop the JSON commits the checkpoint subsumes
    val log = new java.io.File(s"$t/_delta_log")
    log.listFiles.filter(_.getName.endsWith(".json")).foreach(_.delete())
    assert(DeltaSource.lastTxnVersion(spark, t, "appX").contains(1L))
    sink(Seq((2L, "b")).toDF("id", "s"), 1L) // replay after truncation
    assert(DeltaSource.readDelta(spark, t).count() == 2)
  }

  test("vacuum deletes only unreferenced data files; the snapshot survives") {
    val t = tmpTable()
    DeltaSource.writeDelta(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), t)
    DeltaSource.writeDelta(Seq((3L, "c")).toDF("id", "s"), t) // overwrite: v0 orphaned
    def dataFiles() = new java.io.File(t).listFiles
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.getName).toSet
    val before = dataFiles()
    val deleted = DeltaSource.vacuum(spark, t, retainMs = -60000) // everything is "old"
    assert(deleted.nonEmpty)
    val after = dataFiles()
    assert(after.subsetOf(before) && after.size < before.size)
    assert(DeltaSource.readDelta(spark, t).as[(Long, String)].collect().toSet ==
      Set((3L, "c")))
  }

  test("vacuum after DELETE + OPTIMIZE reclaims the stranded DV sidecars too") {
    val t = tmpTable()
    DeltaSource.writeDelta((1L to 40L).map(i => (i, s"s$i")).toDF("id", "s"), t)
    DeltaSource.deleteDelta(spark, t, col("id") % 4 === 0) // merge-on-read DVs
    def files(ext: String) = new java.io.File(t).listFiles
      .filter(f => f.isFile && f.getName.endsWith(ext)).map(_.getName).toSet
    assert(files(".bin").nonEmpty, "delete must have written a DV sidecar")
    // while the DV is referenced by a live add, vacuum must keep it
    val early = DeltaSource.vacuum(spark, t, retainMs = -60000)
    assert(files(".bin").nonEmpty, s"referenced sidecar reclaimed: $early")
    assert(DeltaSource.readDelta(spark, t).count() == 30)
    // the purge rewrite materializes the deletes; sidecar + original
    // data file are now unreferenced and vacuum takes both
    DeltaSource.optimizeDelta(spark, t)
    val removed = DeltaSource.vacuum(spark, t, retainMs = -60000)
    assert(removed.nonEmpty && files(".bin").isEmpty,
      s"stranded sidecar survived vacuum: ${files(".bin")}")
    assert(DeltaSource.readDelta(spark, t).as[(Long, String)].collect().toSet ==
      (1L to 40L).filter(_ % 4 != 0).map(i => (i, s"s$i")).toSet)
  }

  test("optimize compacts to fewer files, content-identical, invisible to the change feed") {
    val t = tmpTable()
    DeltaSource.writeDelta(Seq((1L, "a")).toDF("id", "s"), t)
    DeltaSource.writeDelta(Seq((2L, "b")).toDF("id", "s"), t, overwrite = false)
    DeltaSource.writeDelta(Seq((3L, "c")).toDF("id", "s"), t, overwrite = false)
    val (cursor0, feed0) = DeltaSource.changesSince(spark, t, None)
    assert(feed0.isDefined && cursor0.contains(2L))
    val (nBefore, nAfter) = DeltaSource.optimizeDelta(spark, t, targetBytes = 1L << 30)
    assert(nBefore == 3 && nAfter == 1, s"$nBefore -> $nAfter")
    assert(DeltaSource.readDelta(spark, t).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    // the compaction commit exists but carries no data change:
    // a consumer's cursor crosses it with an empty feed
    val (cursor1, feed1) = DeltaSource.changesSince(spark, t, cursor0)
    assert(cursor1.contains(3L) && feed1.isEmpty)
    // pre-optimize versions still read (compaction removes nothing physically)
    assert(DeltaSource.readDelta(spark, t, Some(1L)).count() == 2)
  }

  test("mergeSchema append widens the table; old files read the new column as null") {
    val t = tmpTable()
    DeltaSource.writeDelta(Seq((1L, "a")).toDF("id", "s"), t)
    // extra column without opting in → refused
    val e = intercept[IllegalArgumentException](
      DeltaSource.writeDelta(Seq((2L, "b", 9L)).toDF("id", "s", "x"), t, overwrite = false))
    assert(e.getMessage.contains("mergeSchema"))
    DeltaSource.writeDelta(Seq((2L, "b", 9L)).toDF("id", "s", "x"), t,
      overwrite = false, mergeSchema = true)
    val back = DeltaSource.readDelta(spark, t).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
    assert(back == Seq((1L, "a", None), (2L, "b", Some(9L))))
    // a type conflict on a shared column is refused outright
    val e2 = intercept[IllegalArgumentException](
      DeltaSource.writeDelta(Seq((3L, 5.0)).toDF("id", "s"), t, overwrite = false))
    assert(e2.getMessage.contains("conflicts"))
    // an overwrite REDEFINES the schema
    DeltaSource.writeDelta(Seq((7L, true)).toDF("id", "flag"), t)
    val redefined = DeltaSource.readDelta(spark, t)
    assert(redefined.columns.toSeq == Seq("id", "flag"))
    assert(redefined.collect().map(r => (r.getLong(0), r.getBoolean(1))).toSeq ==
      Seq((7L, true)))
  }

  test("optimize respects hive partitions") {
    val t = tmpTable()
    val df1 = Seq((1L, "x", "p1"), (2L, "y", "p2")).toDF("id", "s", "part")
    val df2 = Seq((3L, "z", "p1"), (4L, "w", "p2")).toDF("id", "s", "part")
    DeltaSource.writeDelta(df1, t, partitionBy = Seq("part"))
    DeltaSource.writeDelta(df2, t, overwrite = false)
    val (nb, na) = DeltaSource.optimizeDelta(spark, t, targetBytes = 1L << 30)
    assert(nb == 4 && na == 2, s"$nb -> $na") // one file per partition
    val back = DeltaSource.readDelta(spark, t).as[(Long, String, String)].collect().toSet
    assert(back == Set((1L, "x", "p1"), (2L, "y", "p2"), (3L, "z", "p1"), (4L, "w", "p2")))
    // partition pruning still works on the compacted layout
    import org.apache.spark.sql.functions.col
    assert(DeltaSource.readDelta(spark, t).where(col("part") === "p1").count() == 2)
  }
}
