package graft

import java.nio.file.Files
import graft.sources.{CommitStore, CreateExclusiveCommitStore, DeltaSource}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Round-7 Delta contracts: per-file stats on add actions power
  * data skipping in the reader; losing the commit race retries
  * (append) or aborts (overwrite/merge) per the optimistic-
  * concurrency rules; MERGE lands as a copy-on-write remove+add
  * commit touching only files that provably hold matching keys; the
  * change feed drains through a crash-safe checkpointed cursor; and
  * timestamp time travel falls back to checkpoint versions after log
  * truncation. */
class DeltaRound7Spec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft_delta7_$tag").toString + "/t"

  private def fsOf(p: String): FileSystem =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def scansOf(df: DataFrame): Seq[FileSourceScanExec] = {
    df.collect()
    def rec(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => rec(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => rec(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => rec(r.child)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(rec)
    }
    rec(df.queryExecution.executedPlan)
  }

  private def logText(table: String, v: Long): String = {
    val p = new Path(table, f"_delta_log/$v%020d.json")
    val in = fsOf(table).open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  /** A table whose 8 files hold disjoint `k` ranges (clustered
    * write), so min/max stats can prove non-matches. */
  private def mkClustered(): String = {
    val tmp = tmpDir("skip")
    val df = spark.range(8000L)
      .select(col("id").as("k"), (col("id") % 97).cast("double").as("v"),
        concat(lit("row-"), format_string("%05d", col("id"))).as("s"))
      .repartitionByRange(8, col("k"))
      .sortWithinPartitions(col("k"))
    DeltaSource.writeDelta(df, tmp)
    tmp
  }

  test("writeDelta emits per-file stats; a range predicate skips files the stats rule out") {
    val tmp = mkClustered()
    // the add actions carry the delta-spec stats field
    val log0 = logText(tmp, 0L)
    assert(log0.contains("\"stats\""), "add actions carry no stats")
    assert(log0.contains("numRecords") && log0.contains("minValues") &&
      log0.contains("maxValues") && log0.contains("nullCount"))

    val all = DeltaSource.readDelta(spark, tmp)
    val total = scansOf(all).head.metrics("numFiles").value
    assert(total == 8L, s"expected 8 clustered files, got $total")

    // k < 1000 lives in the first of 8 disjoint ranges
    val narrow = DeltaSource.readDelta(spark, tmp).filter(col("k") < 1000L)
    assert(narrow.count() == 1000L)
    val narrowFiles = scansOf(narrow).head.metrics("numFiles").value
    assert(narrowFiles < total,
      s"data predicate skipped nothing ($narrowFiles of $total files)")
    assert(narrowFiles <= 2L, s"expected ~1 surviving file, got $narrowFiles")

    // string stats skip too
    val s1 = DeltaSource.readDelta(spark, tmp).filter(col("s") === "row-00042")
    assert(s1.count() == 1L)
    assert(scansOf(s1).head.metrics("numFiles").value <= 2L)

    // skipping never changes answers: full-scan predicate agrees
    val expect = spark.range(8000L).filter(col("id") >= 7000L).count()
    assert(DeltaSource.readDelta(spark, tmp).filter(col("k") >= 7000L).count() == expect)
  }

  /** Injects a competing commit the first time a writer tries to
    * commit — a deterministic lost race. */
  private class RacingStore(competitor: () => Unit) extends CommitStore {
    @volatile var fired = false
    def putIfAbsent(fs: FileSystem, path: Path, content: String): Unit = {
      if (!fired) { fired = true; competitor() }
      CreateExclusiveCommitStore.putIfAbsent(fs, path, content)
    }
  }

  test("two concurrent appenders BOTH commit, at consecutive versions") {
    val tmp = tmpDir("race")
    DeltaSource.writeDelta(Seq((1L, "base")).toDF("id", "src"), tmp)
    val competitor = () => {
      DeltaSource.writeDelta(Seq((2L, "other")).toDF("id", "src"), tmp,
        overwrite = false): Unit
    }
    val v = DeltaSource.writeDelta(Seq((3L, "mine")).toDF("id", "src"), tmp,
      overwrite = false, commitStore = new RacingStore(competitor))
    assert(v == 2L, s"losing appender should land at the next version, got $v")
    val rows = DeltaSource.readDelta(spark, tmp).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "base"), (2L, "other"), (3L, "mine")))
  }

  test("a writer that removes files aborts cleanly on losing the race") {
    val tmp = tmpDir("race2")
    DeltaSource.writeDelta(Seq((1L, "base")).toDF("id", "src"), tmp)
    val competitor = () => {
      DeltaSource.writeDelta(Seq((2L, "other")).toDF("id", "src"), tmp,
        overwrite = false): Unit
    }
    val e = intercept[java.util.ConcurrentModificationException] {
      DeltaSource.writeDelta(Seq((9L, "ow")).toDF("id", "src"), tmp,
        overwrite = true, commitStore = new RacingStore(competitor))
    }
    assert(e.getMessage.contains("not a pure append"))
    // the loser left no commit; the competitor's append is intact
    assert(DeltaSource.latestVersion(spark, tmp).contains(1L))
    assert(DeltaSource.readDelta(spark, tmp).count() == 2L)
  }

  test("an appender racing a concurrent METADATA change aborts") {
    val tmp = tmpDir("race3")
    DeltaSource.writeDelta(Seq((1L, "base")).toDF("id", "src"), tmp)
    val competitor = () => {
      // widens the schema => metaData action in the interleaved commit
      DeltaSource.writeDelta(Seq((2L, "other", 7.5)).toDF("id", "src", "score"),
        tmp, overwrite = false, mergeSchema = true): Unit
    }
    intercept[java.util.ConcurrentModificationException] {
      DeltaSource.writeDelta(Seq((3L, "mine")).toDF("id", "src"), tmp,
        overwrite = false, commitStore = new RacingStore(competitor))
    }
  }

  test("MERGE rewrites only files that hold matching keys; semantics equal the portable upsert") {
    val tmp = tmpDir("merge")
    // two commits, each clustered: files hold disjoint id ranges
    val mk = (lo: Long, hi: Long) => spark.range(lo, hi)
      .select(col("id"), concat(lit("v0-"), col("id")).as("payload"))
      .repartitionByRange(2, col("id")).sortWithinPartitions(col("id"))
    DeltaSource.writeDelta(mk(0L, 100L), tmp)
    DeltaSource.writeDelta(mk(100L, 200L), tmp, overwrite = false)
    val before = DeltaSource.readDelta(spark, tmp)
    val beforeFiles = scansOf(before).head.metrics("numFiles").value
    assert(beforeFiles == 4L)

    // updates touch ids 0-9 (one file's range) plus brand-new ids
    val updates = (Seq.tabulate(10)(i => (i.toLong, s"v1-$i")) ++
      Seq((500L, "v1-500"), (501L, "v1-501"))).toDF("id", "payload")
    val v = DeltaSource.mergeDelta(spark, tmp, updates, Seq("id"))
    assert(v == 2L)

    // the portable-upsert expectation
    val expect = (Seq.tabulate(10)(i => (i.toLong, s"v1-$i")) ++
      (10L until 200L).map(i => (i, s"v0-$i")) ++
      Seq((500L, "v1-500"), (501L, "v1-501"))).sortBy(_._1)
    val got = DeltaSource.readDelta(spark, tmp).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == expect)

    // copy-on-write touched ONE file: 3 of the 4 originals survive
    val log2 = logText(tmp, 2L)
    val removes = "\"remove\"".r.findAllIn(log2).size
    assert(removes == 1, s"expected 1 removed file, got $removes")

    // merge with no matching keys is a pure append (no removes)
    val v3 = DeltaSource.mergeDelta(spark, tmp,
      Seq((900L, "v1-900")).toDF("id", "payload"), Seq("id"))
    assert(!logText(tmp, v3).contains("\"remove\""))
  }

  test("MERGE preserves partitionValues on a hive-partitioned table") {
    val tmp = tmpDir("mergep")
    val df = spark.range(100L)
      .select(col("id"), (col("id") % 4).cast("string").as("zone"),
        lit("old").as("payload"))
    DeltaSource.writeDelta(df, tmp, partitionBy = Seq("zone"))
    DeltaSource.mergeDelta(spark, tmp,
      Seq((8L, "0", "new")).toDF("id", "zone", "payload"), Seq("id"))
    val back = DeltaSource.readDelta(spark, tmp)
    assert(back.where(col("id") === 8L).select("payload").head().getString(0) == "new")
    assert(back.count() == 100L)
    // rewritten rows still live under their hive partition dirs and
    // a partition predicate still prunes
    val one = DeltaSource.readDelta(spark, tmp).filter(col("zone") === "0")
    assert(one.count() == 25L)
    val scan = scansOf(one).head
    assert(scan.metrics("numFiles").value < scansOf(back).head.metrics("numFiles").value)
  }

  test("checkpointed change feed: crash between versions resumes at exactly the unseen commits") {
    val tmp = tmpDir("feed")
    val cp = tmpDir("feedcp")
    val slice = (lo: Long, hi: Long) =>
      spark.range(lo, hi).select(col("id"), lit("x").as("src"))
    DeltaSource.writeDelta(slice(0L, 10L), tmp)
    DeltaSource.writeDelta(slice(10L, 20L), tmp, overwrite = false)

    val seen = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val c1 = DeltaSource.followChangesCheckpointed(spark, tmp, cp) { (v, b) =>
      seen += ((v, b.count()))
    }
    assert(c1.contains(1L))
    assert(seen.toSeq == Seq((0L, 10L), (1L, 10L)))

    // "restart": a fresh consumer over the same checkpoint sees nothing new
    seen.clear()
    DeltaSource.followChangesCheckpointed(spark, tmp, cp)((v, b) => seen += ((v, b.count())))
    assert(seen.isEmpty)

    // new commit, then resume: exactly the unseen commit replays
    DeltaSource.writeDelta(slice(20L, 25L), tmp, overwrite = false)
    DeltaSource.followChangesCheckpointed(spark, tmp, cp)((v, b) => seen += ((v, b.count())))
    assert(seen.toSeq == Seq((2L, 5L)))

    // a crash INSIDE the callback leaves the cursor untouched, so the
    // failed commit replays on the next drain (at-least-once boundary)
    DeltaSource.writeDelta(slice(25L, 28L), tmp, overwrite = false)
    seen.clear()
    intercept[RuntimeException] {
      DeltaSource.followChangesCheckpointed(spark, tmp, cp) { (v, b) =>
        throw new RuntimeException("consumer crash")
      }
    }
    assert(DeltaSource.readCursor(spark, cp).contains(2L))
    DeltaSource.followChangesCheckpointed(spark, tmp, cp)((v, b) => seen += ((v, b.count())))
    assert(seen.toSeq == Seq((3L, 3L)))
  }

  test("readDeltaAsOf falls back to checkpoint versions after log truncation") {
    val tmp = tmpDir("asof")
    DeltaSource.writeDelta(spark.range(10L).toDF("id"), tmp)
    DeltaSource.writeDelta(spark.range(10L, 30L).toDF("id"), tmp, overwrite = false)
    DeltaSource.checkpoint(spark, tmp)
    // truncate the JSON commits the checkpoint subsumes
    val fs = fsOf(tmp)
    val logDir = new Path(tmp, "_delta_log")
    fs.listStatus(logDir).toSeq.map(_.getPath)
      .filter(_.getName.endsWith(".json")).foreach(p => fs.delete(p, false))
    val back = DeltaSource.readDeltaAsOf(spark, tmp, System.currentTimeMillis() + 60000)
    assert(back.count() == 30L)
  }
}
