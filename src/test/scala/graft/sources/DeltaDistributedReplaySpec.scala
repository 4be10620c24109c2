package graft.sources

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** Distributed snapshot reconstruction ≡ the driver fold, proven on a
  * synthetic many-file log (100k+ adds across 100 commits, removes,
  * deletion vectors, row tracking, column mapping, txn and
  * domainMetadata actions, a mid-log checkpoint). The driver fold is
  * the classic Delta reader shape but the one genuine 100× ceiling:
  * at ~10M add actions it is multi-GB of driver heap and a
  * single-threaded replay per cold snapshot. The distributed path
  * reconciles newest-action-per-path as ONE Spark job and must be
  * bit-identical in every Snapshot field. */
class DeltaDistributedReplaySpec extends SparkSpec {

  private val nCommits = 100
  private val addsPerCommit = 1000

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  /** Synthesize a _delta_log with no data files: snapshot() only
    * reads the log, so reconstruction is testable at 100k-file scale
    * without writing 100k parquet files. */
  private def synthLog(table: String): Unit = {
    val fs = new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val logDir = new Path(table, "_delta_log")
    fs.delete(new Path(table), true)
    fs.mkdirs(logDir)
    val schemaJson = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("p", org.apache.spark.sql.types.StringType))).json
    def write(v: Long, lines: Seq[String]): Unit = {
      val out = fs.create(new Path(logDir, f"$v%020d.json"), true)
      try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8")) finally out.close()
    }
    val protocol =
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["deletionVectors","columnMapping"],""" +
        """"writerFeatures":["deletionVectors","columnMapping"]}}"""
    val meta =
      s"""{"metaData":{"id":"tbl-distreplay","schemaString":"${esc(schemaJson)}",""" +
        s""""partitionColumns":["p"],"configuration":{"delta.columnMapping.mode":"name"}}}"""
    write(0L, Seq(protocol, meta))
    (1 to nCommits).foreach { v =>
      val adds = (0 until addsPerCommit).map { i =>
        val n = (v - 1).toLong * addsPerCommit + i
        // every 17th file carries a DV descriptor; every 5th row
        // tracking fields — the reconcile must ferry both intact
        val dv = if (n % 17 == 0)
          s""","deletionVector":{"storageType":"u","pathOrInlineDv":"dv$n","offset":1,"sizeInBytes":40,"cardinality":${n % 7 + 1}}"""
        else ""
        val rt = if (n % 5 == 0) s""","baseRowId":${n * 10},"defaultRowCommitVersion":$v""" else ""
        s"""{"add":{"path":"part-$n.parquet","partitionValues":{"p":"${n % 4}"},""" +
          s""""size":${1000 + n},"modificationTime":${1700000000000L + n},"dataChange":true,""" +
          s""""stats":"{\\"numRecords\\":${n % 100}}"$dv$rt}}"""
      }
      // each commit after the first also retires 100 files of the
      // PREVIOUS commit (newest-action-per-path must honor them) and
      // stamps txn/domainMetadata state
      val removes = if (v > 1) (0 until 100).map { i =>
        val n = (v - 2).toLong * addsPerCommit + i * 7 % addsPerCommit
        s"""{"remove":{"path":"part-$n.parquet","dataChange":true}}"""
      } else Seq.empty
      val txn = s"""{"txn":{"appId":"app-${v % 3}","version":$v}}"""
      val dom =
        s"""{"domainMetadata":{"domain":"d${v % 2}","configuration":"{\\"hw\\":$v}","removed":false}}"""
      write(v.toLong, Seq(txn, dom) ++ removes ++ adds)
    }
  }

  private def snap(table: String, mode: String): DeltaSource.Snapshot = {
    spark.conf.set("spark.graft.delta.replay.mode", mode)
    try DeltaSource.snapshot(spark, table, None)
    finally spark.conf.unset("spark.graft.delta.replay.mode")
  }

  private def assertSame(a: DeltaSource.Snapshot, b: DeltaSource.Snapshot): Unit = {
    assert(a.version == b.version)
    assert(a.schema == b.schema)
    assert(a.partitionColumns == b.partitionColumns)
    assert(a.configuration == b.configuration)
    assert(a.protocol == b.protocol)
    assert(a.txns == b.txns)
    assert(a.domains == b.domains)
    val fa = a.files.sortBy(_.path)
    val fb = b.files.sortBy(_.path)
    assert(fa.size == fb.size, s"file counts: ${fa.size} vs ${fb.size}")
    fa.zip(fb).foreach { case (x, y) => assert(x == y, s"file diverged: $x vs $y") }
  }

  test("distributed reconcile == driver fold on a 100k-add log with removes/DVs/column mapping") {
    val table = s"${System.getProperty("java.io.tmpdir")}/graft_distreplay"
    synthLog(table)
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val (driver, tDrv) = timed(snap(table, "driver"))
    val (dist, tDist) = timed(snap(table, "distributed"))
    info(f"replay of ${nCommits * addsPerCommit} adds: driver fold $tDrv%.1f s, " +
      f"distributed reconcile $tDist%.1f s (local[8]; the driver fold also " +
      "scales with HEAP, which wall time understates)")
    // the log really is many-file scale, and removes really removed
    val removed = (2 to nCommits).flatMap { v =>
      (0 until 100).map(i => ((v - 2).toLong * addsPerCommit + i * 7 % addsPerCommit))
    }.toSet.map((n: Long) => s"part-$n.parquet")
    assert(driver.files.size == nCommits * addsPerCommit - removed.size)
    assert(driver.files.map(_.path).toSet.intersect(removed).isEmpty)
    // DV descriptors and row-tracking fields survived the reconcile
    assert(dist.files.count(_.dv.nonEmpty) == driver.files.count(_.dv.nonEmpty))
    assert(dist.files.count(_.baseRowId.nonEmpty) == driver.files.count(_.baseRowId.nonEmpty))
    assert(driver.files.exists(_.dv.nonEmpty) && driver.files.exists(_.baseRowId.nonEmpty))
    assertSame(driver, dist)
  }

  test("a mid-log checkpoint seeds both paths identically") {
    val table = s"${System.getProperty("java.io.tmpdir")}/graft_distreplay"
    // reuse the log from the previous test (synthesize if run alone)
    val fs = new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(table, "_delta_log"))) synthLog(table)
    DeltaSource.checkpoint(spark, table)
    // append two more commits on top of the checkpoint
    val logDir = new Path(table, "_delta_log")
    val next = DeltaSource.latestVersion(spark, table).get + 1
    (0 until 2).foreach { i =>
      val v = next + i
      val out = fs.create(new Path(logDir, f"$v%020d.json"), true)
      try out.write(
        (s"""{"add":{"path":"tail-$v.parquet","partitionValues":{"p":"9"},"size":1,"modificationTime":1,"dataChange":true}}""" + "\n" +
          s"""{"remove":{"path":"part-${v % 1000}.parquet","dataChange":true}}""" + "\n")
          .getBytes("UTF-8"))
      finally out.close()
    }
    assertSame(snap(table, "driver"), snap(table, "distributed"))
  }

  test("a v2 checkpoint (manifest + sidecars) seeds the distributed branch identically") {
    val table = s"${System.getProperty("java.io.tmpdir")}/graft_distreplay_v2"
    synthLog(table)
    // multi-sidecar v2 checkpoint: the distributed branch must stamp
    // the manifest AND every sidecar at the checkpoint version, and
    // the auto-mode sizing must resolve sidecar bytes via the
    // manifest's pointer column
    DeltaSource.checkpointV2(spark, table, sidecarFiles = 3)
    // tail commits on top (checkpointV2 itself commits the protocol
    // upgrade, so fetch the fresh latest)
    val fs = new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val logDir = new Path(table, "_delta_log")
    val next = DeltaSource.latestVersion(spark, table).get + 1
    val out = fs.create(new Path(logDir, f"$next%020d.json"), true)
    try out.write(
      (s"""{"add":{"path":"v2tail.parquet","partitionValues":{"p":"1"},"size":5,"modificationTime":5,"dataChange":true}}""" + "\n" +
        s"""{"remove":{"path":"part-77.parquet","dataChange":true}}""" + "\n").getBytes("UTF-8"))
    finally out.close()
    val driver = snap(table, "driver")
    val dist = snap(table, "distributed")
    assert(driver.files.exists(_.path == "v2tail.parquet"))
    assert(!driver.files.exists(_.path == "part-77.parquet"))
    assertSame(driver, dist)
    // auto with a zero threshold exercises the v2 sidecar sizing path
    spark.conf.set("spark.graft.delta.replay.driverMaxBytes", "0")
    try assertSame(driver, snap(table, "auto"))
    finally spark.conf.unset("spark.graft.delta.replay.driverMaxBytes")
  }

  test("a REAL table round-trips identically through the distributed mode") {
    // composition check on actual data: writes, a DV delete, and a
    // merge all read back the same rows whichever replay branch
    // reconstructed the snapshot
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val table = java.nio.file.Files.createTempDirectory("graft_distreal").toString + "/t"
    val df = (0L until 500L).map(i => (i, i % 7, s"row-$i")).toDF("id", "k", "s")
    DeltaSource.writeDelta(df.repartition(8), table)
    DeltaSource.writeDelta(df.where($"id" < 50).withColumn("s", upper($"s")),
      table, overwrite = false)
    DeltaSource.deleteDelta(spark, table, col("k") === 3)
    def readAll(mode: String): Seq[String] = {
      spark.conf.set("spark.graft.delta.replay.mode", mode)
      try DeltaSource.readDelta(spark, table).orderBy("id", "s")
        .collect().map(_.toString).toSeq
      finally spark.conf.unset("spark.graft.delta.replay.mode")
    }
    val drv = readAll("driver")
    assert(drv.nonEmpty && readAll("distributed") == drv)
    // layer on a clustering rewrite (removes + re-adds), a
    // checkpoint, and a tail write: the distributed branch must keep
    // tracking the driver fold through the whole lifecycle
    DeltaSource.optimizeCluster(spark, table, ("k", "id"), nFiles = 4)
    DeltaSource.checkpoint(spark, table)
    DeltaSource.writeDelta(df.where($"id" >= 490).withColumn("s", lit("tail")),
      table, overwrite = false)
    val drv2 = readAll("driver")
    assert(drv2.nonEmpty && readAll("distributed") == drv2)
    // pruned read composes with the DV delete: partition the table,
    // delete some rows, then a reconcile-pruned read must equal the
    // full read + filter under either branch
    val ptable = java.nio.file.Files.createTempDirectory("graft_distpruned").toString + "/t"
    DeltaSource.writeDelta(df, ptable, partitionBy = Seq("k"))
    DeltaSource.deleteDelta(spark, ptable, col("id") % 5 === 0)
    def prunedRead(mode: String): Seq[String] = {
      spark.conf.set("spark.graft.delta.replay.mode", mode)
      try DeltaSource.readDeltaPruned(spark, ptable,
          element_at(col("pv"), "k").isin("2", "4"))
        .orderBy("id").collect().map(_.toString).toSeq
      finally spark.conf.unset("spark.graft.delta.replay.mode")
    }
    val wantP = DeltaSource.readDelta(spark, ptable)
      .where(col("k").isin(2, 4)).orderBy("id").collect().map(_.toString).toSeq
    assert(wantP.nonEmpty && prunedRead("driver") == wantP && prunedRead("distributed") == wantP)
  }

  test("partition pruning inside the reconcile ships only matching survivors") {
    import org.apache.spark.sql.functions._
    val table = s"${System.getProperty("java.io.tmpdir")}/graft_distreplay"
    val fs = new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(table, "_delta_log"))) synthLog(table)
    val pred = element_at(col("pv"), "p") === "2"
    def pruned(mode: String): DeltaSource.Snapshot = {
      spark.conf.set("spark.graft.delta.replay.mode", mode)
      try DeltaSource.snapshot(spark, table, None, Some(pred))
      finally spark.conf.unset("spark.graft.delta.replay.mode")
    }
    val full = snap(table, "driver")
    val dDrv = pruned("driver")
    val dDist = pruned("distributed")
    // both modes prune bit-identically, to exactly the p=2 survivors
    assertSame(dDrv, dDist)
    val want = full.files.filter(_.partitionValues.get("p").contains("2"))
    assert(dDrv.files.map(_.path).sorted == want.map(_.path).sorted)
    assert(dDrv.files.nonEmpty && dDrv.files.size < full.files.size / 3)
    // non-file state is NOT pruned: schema/protocol/txns ride along
    assert(dDrv.schema == full.schema && dDrv.txns == full.txns)
  }

  test("auto mode routes by replay bytes") {
    val table = s"${System.getProperty("java.io.tmpdir")}/graft_distreplay"
    val fs = new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(table, "_delta_log"))) synthLog(table)
    val driver = snap(table, "driver")
    // a zero threshold forces every auto read through the distributed
    // branch; the answer must not move
    spark.conf.set("spark.graft.delta.replay.driverMaxBytes", "0")
    try {
      assertSame(driver, snap(table, "auto"))
      assert(DeltaSource.lastReplayDistributed.contains(true),
        "a zero byte budget must route auto mode distributed")
    } finally spark.conf.unset("spark.graft.delta.replay.driverMaxBytes")
    // and the default threshold keeps this ~20MB log on the driver
    // path (same answer by construction — smoke the plumbing)
    assertSame(driver, snap(table, "auto"))
    assert(DeltaSource.lastReplayDistributed.contains(false),
      "a ~20MB log must stay under the default 64MB driver budget")
  }

  test("checkpointV2 sidecars from the reconcile frame equal the driver-list sidecars") {
    // above the replay threshold the surviving adds already exist as
    // a DataFrame inside snapshot(); the V2 checkpoint writer must
    // feed sidecars from that frame — never round-trip a 10M-file
    // list through a driver Seq — and write EXACTLY the rows the
    // driver-list path writes
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val table = java.nio.file.Files.createTempDirectory("graft_cpv2df").toString + "/t"
    val df = (0L until 400L).map(i => (i, i % 5, s"v-$i")).toDF("id", "k", "s")
    DeltaSource.writeDelta(df.repartition(6), table, partitionBy = Seq("k"))
    DeltaSource.deleteDelta(spark, table, col("id") % 7 === 0) // DVs ride the adds
    DeltaSource.writeDelta(df.where($"id" < 40), table, overwrite = false)
    val logDir = new Path(table, "_delta_log")
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def manifests(): Set[String] = fs.listStatus(logDir).map(_.getPath.getName)
      .filter(n => n.contains(".checkpoint.") && n.endsWith(".parquet")).toSet
    def sidecarAdds(mode: String): Seq[String] = {
      val before = manifests()
      spark.conf.set("spark.graft.delta.replay.mode", mode)
      try DeltaSource.checkpointV2(spark, table, sidecarFiles = 3)
      finally spark.conf.unset("spark.graft.delta.replay.mode")
      if (mode == "distributed")
        assert(DeltaSource.lastReplayDistributed.contains(true),
          "the distributed checkpoint run must have reconciled distributedly")
      val fresh = (manifests() -- before).toSeq
      assert(fresh.size == 1, s"expected one new manifest, got $fresh")
      val names = spark.read.parquet(new Path(logDir, fresh.head).toString)
        .where(col("sidecar").isNotNull).select(col("sidecar.path"))
        .collect().map(_.getString(0)).toSeq
      assert(names.size == 3)
      spark.read.parquet(
          names.map(n => new Path(logDir, s"_sidecars/$n").toString): _*)
        .where(col("add").isNotNull).select(col("add"))
        .collect().map(_.toString).sorted.toSeq
    }
    val fromDriverList = sidecarAdds("driver")
    val fromFrame = sidecarAdds("distributed")
    assert(fromDriverList.nonEmpty && fromDriverList == fromFrame)
    // and the checkpoint each wrote reconstructs the same snapshot
    assertSame(snap(table, "driver"), snap(table, "distributed"))
  }

  test("auto routing COUNTS commit bytes on a checkpoint-less log (branch-asserted)") {
    // regression: the router compared scheme-QUALIFIED listing paths
    // against unqualified constructed commit paths, so commit/
    // compacted JSON bytes never matched and a big checkpoint-less
    // log silently stayed on the driver fold whatever the budget —
    // undetectable by value equality because both branches return
    // identical snapshots. Assert the BRANCH, not just the value.
    val table = s"${System.getProperty("java.io.tmpdir")}/graft_distreplay_nockpt"
    val fs = new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val logDir = new Path(table, "_delta_log")
    fs.delete(new Path(table), true)
    fs.mkdirs(logDir)
    val schemaJson = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType))).json
    def write(v: Long, lines: Seq[String]): Unit = {
      val out = fs.create(new Path(logDir, f"$v%020d.json"), true)
      try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8")) finally out.close()
    }
    write(0L, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"tbl-nockpt","schemaString":"${esc(schemaJson)}","partitionColumns":[],"configuration":{}}}"""))
    (1 to 3).foreach { v =>
      write(v.toLong, (0 until 200).map(i =>
        s"""{"add":{"path":"f-$v-$i.parquet","partitionValues":{},"size":$i,"modificationTime":$v,"dataChange":true}}"""))
    }
    val driver = snap(table, "driver")
    // budget below the commit-JSON bytes (~100KB here): auto must see
    // those bytes and route DISTRIBUTED — the old full-path compare
    // counted zero and stayed on the driver fold
    spark.conf.set("spark.graft.delta.replay.driverMaxBytes", "1000")
    try {
      assertSame(driver, snap(table, "auto"))
      assert(DeltaSource.lastReplayDistributed.contains(true),
        "commit bytes over the budget must route a checkpoint-less log distributed")
    } finally spark.conf.unset("spark.graft.delta.replay.driverMaxBytes")
    // generous budget: same log stays on the driver fold
    assertSame(driver, snap(table, "auto"))
    assert(DeltaSource.lastReplayDistributed.contains(false))
    // forced modes stamp the probe too
    snap(table, "distributed")
    assert(DeltaSource.lastReplayDistributed.contains(true))
    snap(table, "driver")
    assert(DeltaSource.lastReplayDistributed.contains(false))
  }
}
