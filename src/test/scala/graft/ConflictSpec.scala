package graft

import java.nio.file.Files

import graft.sources.{CommitStore, CreateExclusiveCommitStore, DeltaSource}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._

/** Logical conflict checking (the delta-io PROTOCOL.md ConflictChecker
  * semantics): a non-pure-append commit that loses its version race
  * REBASES over interleaved commits it provably commutes with —
  * OPTIMIZE over a steady appender, partition-disjoint DML — and
  * still aborts when commutativity is unprovable (same partition,
  * removed read files, metadata changes, new partitions,
  * domainMetadata). Before this checker, every maintenance commit
  * died under any concurrent append. */
class ConflictSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft_conflict_$tag").toString + "/t"

  /** Injects a competing commit the first time a writer tries to
    * commit — a deterministic lost race. */
  private class RacingStore(competitor: () => Unit) extends CommitStore {
    @volatile var fired = false
    def putIfAbsent(fs: FileSystem, path: Path, content: String): Unit = {
      if (!fired) { fired = true; competitor() }
      CreateExclusiveCommitStore.putIfAbsent(fs, path, content)
    }
  }

  test("OPTIMIZE losing to a concurrent append REBASES; nobody's rows are lost") {
    val t = tmpDir("opt_app")
    DeltaSource.writeDelta(Seq((1L, "a"), (2L, "b")).toDF("id", "src"), t)
    DeltaSource.writeDelta(Seq((3L, "c")).toDF("id", "src"), t, overwrite = false)
    val competitor = () => {
      DeltaSource.writeDelta(Seq((9L, "late")).toDF("id", "src"), t,
        overwrite = false): Unit
    }
    val (before, after) = DeltaSource.optimizeDelta(spark, t,
      commitStore = new RacingStore(competitor))
    assert(before >= 2)
    // the rebased swap landed AND the racing append survived it
    val rows = DeltaSource.readDelta(spark, t).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "a"), (2L, "b"), (3L, "c"), (9L, "late")))
    // optimize landed after the competitor: versions 0,1 data; 2 the
    // append; 3 the rebased swap
    assert(DeltaSource.latestVersion(spark, t).contains(3L))
    assert(after >= 1)
  }

  test("OPTIMIZE ZORDER losing to a concurrent append rebases with read parity") {
    val t = tmpDir("z_app")
    DeltaSource.writeDelta((0L until 40L).map(i => (i, i % 7, i % 5))
      .toDF("id", "x", "y"), t)
    DeltaSource.writeDelta(Seq((100L, 1L, 1L)).toDF("id", "x", "y"), t,
      overwrite = false)
    val competitor = () => {
      DeltaSource.writeDelta(Seq((200L, 2L, 2L)).toDF("id", "x", "y"), t,
        overwrite = false): Unit
    }
    DeltaSource.optimizeZOrder(spark, t, ("x", "y"), nFiles = 4,
      commitStore = new RacingStore(competitor))
    val got = DeltaSource.readDelta(spark, t).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == ((0L until 40L) ++ Seq(100L, 200L)).sorted)
  }

  test("OPTIMIZE losing to an OPTIMIZE that took its files ABORTS") {
    val t = tmpDir("opt_opt")
    DeltaSource.writeDelta(Seq((1L, "a")).toDF("id", "src"), t)
    DeltaSource.writeDelta(Seq((2L, "b")).toDF("id", "src"), t, overwrite = false)
    val competitor = () => { DeltaSource.optimizeDelta(spark, t): Unit }
    val e = intercept[java.util.ConcurrentModificationException] {
      DeltaSource.optimizeDelta(spark, t, commitStore = new RacingStore(competitor))
    }
    assert(e.getMessage.contains("cannot rebase"))
    // the winner's compaction stands
    assert(DeltaSource.readDelta(spark, t).count() == 2L)
  }

  test("partition DELETE racing an append into a DIFFERENT partition rebases") {
    val t = tmpDir("del_disjoint")
    DeltaSource.writeDelta(Seq((1L, "p1"), (2L, "p2")).toDF("id", "p"), t,
      partitionBy = Seq("p"))
    val competitor = () => {
      DeltaSource.writeDelta(Seq((3L, "p2")).toDF("id", "p"), t,
        overwrite = false, partitionBy = Seq("p")): Unit
    }
    DeltaSource.deleteDelta(spark, t, col("p") === "p1",
      commitStore = new RacingStore(competitor))
    val rows = DeltaSource.readDelta(spark, t).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((2L, "p2"), (3L, "p2")),
      "p1 deleted, the racing p2 append intact")
  }

  test("partition DELETE racing an append into the SAME partition aborts") {
    val t = tmpDir("del_same")
    DeltaSource.writeDelta(Seq((1L, "p1"), (2L, "p2")).toDF("id", "p"), t,
      partitionBy = Seq("p"))
    val competitor = () => {
      DeltaSource.writeDelta(Seq((3L, "p1")).toDF("id", "p"), t,
        overwrite = false, partitionBy = Seq("p")): Unit
    }
    val e = intercept[java.util.ConcurrentModificationException] {
      DeltaSource.deleteDelta(spark, t, col("p") === "p1",
        commitStore = new RacingStore(competitor))
    }
    assert(e.getMessage.contains("partition this txn read"))
    // nothing deleted; both appends visible
    assert(DeltaSource.readDelta(spark, t).count() == 3L)
  }

  test("partition DELETE racing an append into a NEW partition aborts (disjointness unprovable)") {
    val t = tmpDir("del_newpart")
    DeltaSource.writeDelta(Seq((1L, "p1"), (2L, "p2")).toDF("id", "p"), t,
      partitionBy = Seq("p"))
    val competitor = () => {
      DeltaSource.writeDelta(Seq((3L, "p3")).toDF("id", "p"), t,
        overwrite = false, partitionBy = Seq("p")): Unit
    }
    val e = intercept[java.util.ConcurrentModificationException] {
      // predicate p >= "p1" would ALSO match the newborn p3
      DeltaSource.deleteDelta(spark, t, col("p") === "p1",
        commitStore = new RacingStore(competitor))
    }
    assert(e.getMessage.contains("born after"))
  }

  test("whole-table DELETE (non-partition predicate) racing an append aborts") {
    val t = tmpDir("del_whole")
    DeltaSource.writeDelta(Seq((1L, "p1"), (2L, "p2")).toDF("id", "p"), t,
      partitionBy = Seq("p"))
    val competitor = () => {
      DeltaSource.writeDelta(Seq((3L, "p2")).toDF("id", "p"), t,
        overwrite = false, partitionBy = Seq("p")): Unit
    }
    val e = intercept[java.util.ConcurrentModificationException] {
      DeltaSource.deleteDelta(spark, t, col("id") === 1L,
        commitStore = new RacingStore(competitor))
    }
    assert(e.getMessage.contains("read the whole table"))
  }

  test("partition UPDATE racing a disjoint-partition append rebases") {
    val t = tmpDir("upd_disjoint")
    DeltaSource.writeDelta(Seq((1L, 10L, "p1"), (2L, 20L, "p2"))
      .toDF("id", "v", "p"), t, partitionBy = Seq("p"))
    val competitor = () => {
      DeltaSource.writeDelta(Seq((3L, 30L, "p2")).toDF("id", "v", "p"), t,
        overwrite = false, partitionBy = Seq("p")): Unit
    }
    DeltaSource.updateDelta(spark, t, col("p") === "p1",
      Map("v" -> (col("v") + 1)), commitStore = new RacingStore(competitor))
    val rows = DeltaSource.readDelta(spark, t).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((1L, 11L), (2L, 20L), (3L, 30L)))
  }

  test("replaceWhere racing an append into an untouched partition rebases") {
    val t = tmpDir("rw_disjoint")
    DeltaSource.writeDelta(Seq((1L, "p1"), (2L, "p2")).toDF("id", "p"), t,
      partitionBy = Seq("p"))
    val competitor = () => {
      DeltaSource.writeDelta(Seq((3L, "p2")).toDF("id", "p"), t,
        overwrite = false, partitionBy = Seq("p")): Unit
    }
    DeltaSource.writeDeltaReplaceWhere(
      Seq((10L, "p1"), (11L, "p1")).toDF("id", "p"), t, col("p") === "p1",
      commitStore = new RacingStore(competitor))
    val rows = DeltaSource.readDelta(spark, t).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((2L, "p2"), (3L, "p2"), (10L, "p1"), (11L, "p1")))
  }

  test("MERGE racing a layout swap of files it never touched rebases") {
    val t = tmpDir("merge_swap")
    // p1: one file (merge target); p2: two files (the swap's prey)
    DeltaSource.writeDelta(Seq((1L, 10L, "p1")).toDF("id", "v", "p"), t,
      partitionBy = Seq("p"))
    DeltaSource.writeDelta(Seq((2L, 20L, "p2")).toDF("id", "v", "p"), t,
      overwrite = false, partitionBy = Seq("p"))
    DeltaSource.writeDelta(Seq((4L, 40L, "p2")).toDF("id", "v", "p"), t,
      overwrite = false, partitionBy = Seq("p"))
    val competitor = () => { DeltaSource.optimizeDelta(spark, t): Unit }
    DeltaSource.mergeDelta(spark, t,
      Seq((1L, 11L, "p1")).toDF("id", "v", "p"), Seq("id"),
      commitStore = new RacingStore(competitor))
    val rows = DeltaSource.readDelta(spark, t).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((1L, 11L), (2L, 20L), (4L, 40L)))
  }

  test("MERGE racing a data-changing append still aborts (it read the whole table)") {
    val t = tmpDir("merge_app")
    DeltaSource.writeDelta(Seq((1L, 10L)).toDF("id", "v"), t)
    val competitor = () => {
      DeltaSource.writeDelta(Seq((2L, 20L)).toDF("id", "v"), t,
        overwrite = false): Unit
    }
    intercept[java.util.ConcurrentModificationException] {
      DeltaSource.mergeDelta(spark, t, Seq((1L, 11L)).toDF("id", "v"), Seq("id"),
        commitStore = new RacingStore(competitor))
    }
    assert(DeltaSource.readDelta(spark, t).count() == 2L)
  }

  test("real concurrency through the CAS store: a steady appender and a repeating optimizer all land") {
    // the scenario the checker exists for: maintenance running UNDER
    // live ingest. The appender never aborts (pure appends), the
    // optimizer rebases over every append it loses to — before the
    // checker, each lost race killed the whole compaction.
    val root = Files.createTempDirectory("graft_livemaint").toString
    val t = root + "/t"
    val store = new graft.sources.CoordinatedCommitStore(root + "/_coord")
    DeltaSource.writeDelta(Seq((0L, "seed")).toDF("id", "src"), t, commitStore = store)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val appender = new Thread(() => {
      try (1 to 5).foreach { i =>
        DeltaSource.writeDelta(Seq((i.toLong, s"a$i")).toDF("id", "src"), t,
          overwrite = false, commitStore = store)
      } catch { case e: Throwable => errs.add(e) }
    })
    val optimizer = new Thread(() => {
      try (1 to 2).foreach { _ =>
        DeltaSource.optimizeDelta(spark, t, commitStore = store)
      } catch { case e: Throwable => errs.add(e) }
    })
    appender.start(); optimizer.start()
    appender.join(120000); optimizer.join(120000)
    assert(errs.isEmpty, s"live maintenance errored: $errs")
    val rows = DeltaSource.readDelta(spark, t).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(rows == (0L to 5L), s"lost or duplicated rows: $rows")
    // contiguous log: every commit (appends + any landed swaps) at
    // consecutive versions through the arbitration store
    val fs = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions = fs.listStatus(new Path(t, "_delta_log")).toSeq
      .map(_.getPath.getName).filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json").toLong).sorted
    assert(versions == (0L to versions.max), s"log has gaps: $versions")
  }

  test("CLUSTER BY still aborts on any race: its domainMetadata outranks intent") {
    val t = tmpDir("cluster_dom")
    DeltaSource.writeDelta((0L until 30L).map(i => (i, i % 5, i % 3))
      .toDF("id", "x", "y"), t)
    val competitor = () => {
      DeltaSource.writeDelta(Seq((100L, 1L, 1L)).toDF("id", "x", "y"), t,
        overwrite = false): Unit
    }
    val e = intercept[java.util.ConcurrentModificationException] {
      DeltaSource.optimizeClusterBy(spark, t, Seq("x", "y"), nFiles = 4,
        bits = 16, commitStore = new RacingStore(competitor))
    }
    assert(e.getMessage.contains("domainMetadata"))
  }
}
