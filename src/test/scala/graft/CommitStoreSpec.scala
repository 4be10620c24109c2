package graft

import java.nio.file.Files

import graft.sources.{CoordinatedCommitStore, DeltaSource}
import org.apache.hadoop.fs.Path

/** Multi-writer commit arbitration through [[CoordinatedCommitStore]]:
  * racing appenders all land at consecutive versions with no lost
  * updates; a commit that won arbitration but crashed before landing
  * its data-side file is recovered by the next writer (and by the
  * read-side fixup). */
class CommitStoreSpec extends SparkSpec {
  import spark.implicits._

  private def fsOf(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("two appenders racing N commits: all land, versions consecutive, no lost rows") {
    val root = Files.createTempDirectory("graft_coord").toString
    val tbl = root + "/tbl"
    val store = new CoordinatedCommitStore(root + "/_coord")
    DeltaSource.writeDelta(spark.range(0, 0).toDF("id"), tbl, commitStore = store)
    val n = 6
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 2).map { t =>
      new Thread(() => {
        try {
          (0 until n).foreach { i =>
            DeltaSource.writeDelta(
              spark.range(t * 1000 + i * 10, t * 1000 + i * 10 + 10).toDF("id"),
              tbl, overwrite = false, commitStore = store)
          }
        } catch { case e: Throwable => errs.add(e) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(errs.isEmpty, s"racing appenders errored: $errs")
    assert(DeltaSource.latestVersion(spark, tbl).contains(2L * n),
      "every commit must land exactly once")
    // contiguous log 0..2n (the snapshot contiguity check would also
    // refuse gaps — assert directly on the listing)
    val fs = fsOf(tbl)
    val versions = fs.listStatus(new Path(tbl, "_delta_log")).toSeq
      .map(_.getPath.getName).filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json").toLong).sorted
    assert(versions == (0L to 2L * n), s"got $versions")
    // no lost updates: all 2n batches' rows present
    assert(DeltaSource.readDelta(spark, tbl).count() == 2L * n * 10)
  }

  test("a won commit missing from the log is back-filled by the next writer") {
    val root = Files.createTempDirectory("graft_coord2").toString
    val tbl = root + "/tbl"
    val store = new CoordinatedCommitStore(root + "/_coord")
    DeltaSource.writeDelta(spark.range(0, 5).toDF("id"), tbl, commitStore = store)
    DeltaSource.writeDelta(spark.range(5, 10).toDF("id"), tbl,
      overwrite = false, commitStore = store)
    // simulate a crash AFTER winning arbitration for v1 but BEFORE
    // the data-side copy: drop the data-side file; the entry survives
    val fs = fsOf(tbl)
    fs.delete(new Path(tbl, f"_delta_log/${1L}%020d.json"), false)
    assert(DeltaSource.latestVersion(spark, tbl).contains(0L))
    // the next writer recovers v1 first, then commits at v2
    DeltaSource.writeDelta(spark.range(10, 15).toDF("id"), tbl,
      overwrite = false, commitStore = store)
    assert(DeltaSource.latestVersion(spark, tbl).contains(2L))
    assert(DeltaSource.readDelta(spark, tbl).count() == 15)
  }

  test("read-side fixup recovers the log without a writer") {
    val root = Files.createTempDirectory("graft_coord3").toString
    val tbl = root + "/tbl"
    val coord = root + "/_coord"
    val store = new CoordinatedCommitStore(coord)
    DeltaSource.writeDelta(spark.range(0, 5).toDF("id"), tbl, commitStore = store)
    DeltaSource.writeDelta(spark.range(5, 10).toDF("id"), tbl,
      overwrite = false, commitStore = store)
    val fs = fsOf(tbl)
    fs.delete(new Path(tbl, f"_delta_log/${1L}%020d.json"), false)
    CoordinatedCommitStore.recoverLog(spark, tbl, coord)
    assert(DeltaSource.latestVersion(spark, tbl).contains(1L))
    assert(DeltaSource.readDelta(spark, tbl).count() == 10)
  }

  private val Footer = "\n#graft-commit-complete\n"

  test("a version lost to a racing writer surfaces as a retry, not a corrupt log") {
    val root = Files.createTempDirectory("graft_coord4").toString
    val tbl = root + "/tbl"
    val store = new CoordinatedCommitStore(root + "/_coord")
    DeltaSource.writeDelta(spark.range(0, 2).toDF("id"), tbl, commitStore = store)
    // pre-claim version 1 in the coordination dir (another writer won
    // it and crashed); this writer must recover it and commit at 2
    val entryContent =
      s"""{"add":{"path":"does-not-exist.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":false}}\n"""
    val logDir = new Path(tbl, "_delta_log")
    val dir = store.tableDir(logDir)
    val cfs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    cfs.mkdirs(dir)
    val out = cfs.create(new Path(dir, f"${1L}%020d.json"), false)
    try out.write((entryContent + Footer).getBytes("UTF-8")) finally out.close()
    DeltaSource.writeDelta(spark.range(2, 4).toDF("id"), tbl,
      overwrite = false, commitStore = store)
    assert(DeltaSource.latestVersion(spark, tbl).contains(2L))
  }

  test("an existing data-side commit is refused even when its entry was pruned") {
    // a stale writer racing for a version whose coordination entry is
    // long gone (pruned, or pre-adoption history) must never rewrite
    // the committed file — the CommitStore contract
    val root = Files.createTempDirectory("graft_coord5").toString
    val tbl = root + "/tbl"
    val store = new CoordinatedCommitStore(root + "/_coord")
    DeltaSource.writeDelta(spark.range(0, 2).toDF("id"), tbl) // default store: no entry
    val fs = fsOf(tbl)
    val v0 = new Path(tbl, f"_delta_log/${0L}%020d.json")
    val before = {
      val in = fs.open(v0)
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }
    intercept[org.apache.hadoop.fs.FileAlreadyExistsException] {
      store.putIfAbsent(fs, v0, "{\"overwritten\":true}\n")
    }
    val after = {
      val in = fs.open(v0)
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }
    assert(after == before, "the committed file must be untouched")
  }

  test("a torn (footer-less) entry is never recovered and surfaces a descriptive error") {
    val root = Files.createTempDirectory("graft_coord6").toString
    val tbl = root + "/tbl"
    val coord = root + "/_coord"
    val store = new CoordinatedCommitStore(coord, tornPollMaxMs = 200L)
    DeltaSource.writeDelta(spark.range(0, 2).toDF("id"), tbl, commitStore = store)
    // simulate a writer that died INSIDE its entry write: claimed,
    // no completeness footer
    val dir = store.tableDir(new Path(tbl, "_delta_log"))
    val cfs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    cfs.mkdirs(dir)
    val out = cfs.create(new Path(dir, f"${1L}%020d.json"), false)
    try out.write("{\"add\":".getBytes("UTF-8")) finally out.close()
    // read-side fixup must NOT copy the torn entry into the log
    CoordinatedCommitStore.recoverLog(spark, tbl, coord)
    assert(DeltaSource.latestVersion(spark, tbl).contains(0L))
    // a conflicting writer polls, then explains instead of guessing
    val e = intercept[Exception] {
      DeltaSource.writeDelta(spark.range(2, 4).toDF("id"), tbl,
        overwrite = false, commitStore = store)
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).exists(t => Option(t.getMessage).exists(_.contains("torn"))),
      s"expected a torn-entry explanation, got $e")
  }
}
