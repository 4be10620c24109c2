package graft

import java.nio.file.Files
import graft.sources.{CreateExclusiveCommitStore, DeltaSource}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Round-6 Delta interop contracts: partitioned tables plan as ONE
  * relation (any partition count), partition predicates prune files at
  * planning time, graft can LAND a hive-partitioned table, the log
  * doubles as an incremental change source, the commit race has one
  * winner, and checkpoints carry the full action complement the Delta
  * spec requires (external readers seed from them). */
class DeltaRound6Spec extends SparkSpec {
  import spark.implicits._

  private def scansOf(df: DataFrame): Seq[FileSourceScanExec] = {
    df.collect() // execute so AQE finalizes and scan metrics populate
    def rec(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => rec(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => rec(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => rec(r.child)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(rec)
    }
    rec(df.queryExecution.executedPlan)
  }

  private def mkPartitioned(n: Int): (String, Long) = {
    val tmp = Files.createTempDirectory("graft_delta6").toString + "/t"
    val df = spark.range(n * 10L)
      .select(col("id"), (col("id") % n).cast("string").as("zone"))
    val v = DeltaSource.writeDelta(df, tmp, partitionBy = Seq("zone"))
    (tmp, v)
  }

  test("partitioned write round-trips; many partitions still plan as ONE scan relation") {
    val n = 40 // 40 hive partitions — the union-fold design this replaced was O(n) plan nodes
    val (tmp, v) = mkPartitioned(n)
    assert(v == 0L)
    val back = DeltaSource.readDelta(spark, tmp)
    assert(back.columns.toSeq == Seq("id", "zone"))
    assert(back.count() == n * 10L)
    assert(back.groupBy("zone").count().count() == n.toLong)
    // the whole table is one FileSourceScan, not a 40-way union
    val scans = scansOf(back)
    assert(scans.size == 1, s"expected ONE scan, got ${scans.size}")
    // data files land hive-style so delta-rs-style readers recover layout too
    assert(new java.io.File(s"$tmp/zone=7").exists())
  }

  test("partition predicate prunes to the matching files at planning time") {
    val (tmp, _) = mkPartitioned(8)
    val all = DeltaSource.readDelta(spark, tmp)
    val totalFiles = scansOf(all).head.metrics("numFiles").value
    val one = DeltaSource.readDelta(spark, tmp).filter(col("zone") === "3")
    assert(one.count() == 10L)
    val scan = scansOf(one).head
    // each writer task lands a file per zone, so a partition holds
    // several files — pruning keeps exactly the matching DIRECTORY
    assert(scan.metrics("numPartitions").value == 1,
      s"partition filter should prune 8 partitions to 1, scanned ${scan.metrics("numPartitions").value}")
    assert(scan.metrics("numFiles").value == totalFiles / 8,
      s"expected ${totalFiles / 8} of $totalFiles files, scanned ${scan.metrics("numFiles").value}")
    // and values survive the round trip through partitionValues
    assert(one.select(min("id"), max("id")).as[(Long, Long)].head() == ((3L, 75L)))
  }

  test("partitioned append inherits partition columns; conflicting partitionBy rejected") {
    val (tmp, _) = mkPartitioned(4)
    val more = Seq((1000L, "9")).toDF("id", "zone")
    DeltaSource.writeDelta(more, tmp, overwrite = false)
    val back = DeltaSource.readDelta(spark, tmp)
    assert(back.count() == 41L)
    assert(back.filter(col("zone") === "9").as[(Long, String)].collect().toSet == Set((1000L, "9")))
    intercept[IllegalArgumentException] {
      DeltaSource.writeDelta(more, tmp, overwrite = false, partitionBy = Seq("id"))
    }
  }

  test("changesSince replays commits after the cursor as one pruned feed") {
    val tmp = Files.createTempDirectory("graft_delta6").toString + "/t"
    DeltaSource.writeDelta(Seq((1L, "a")).toDF("id", "s"), tmp)
    val (c0, b0) = DeltaSource.changesSince(spark, tmp, None)
    assert(c0.contains(0L))
    assert(b0.get.select("id", "s").as[(Long, String)].collect().toSet == Set((1L, "a")))
    // no new commits → cursor unchanged, no batch
    assert(DeltaSource.changesSince(spark, tmp, c0) == ((c0, None)))
    // two more commits: the feed carries both, tagged by commit version
    DeltaSource.writeDelta(Seq((2L, "b")).toDF("id", "s"), tmp, overwrite = false)
    DeltaSource.writeDelta(Seq((3L, "c")).toDF("id", "s"), tmp, overwrite = false)
    val (c2, b2) = DeltaSource.changesSince(spark, tmp, c0)
    assert(c2.contains(2L))
    val got = b2.get.select("id", "s", "_commit_version").as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((2L, "b", 1L), (3L, "c", 2L)))
    // the feed is ONE scan relation; _commit_version is a partition column there
    assert(scansOf(b2.get).size == 1)
  }

  test("followChanges drains commit-by-commit, restart-safe from a stored cursor") {
    val tmp = Files.createTempDirectory("graft_delta6").toString + "/t"
    DeltaSource.writeDelta(Seq((1L, "a")).toDF("id", "s"), tmp)
    DeltaSource.writeDelta(Seq((2L, "b")).toDF("id", "s"), tmp, overwrite = false)
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Set[(Long, String)])]
    val cur = DeltaSource.followChanges(spark, tmp, None) { (v, batch) =>
      seen += ((v, batch.select("id", "s").as[(Long, String)].collect().toSet))
    }
    assert(cur.contains(1L))
    assert(seen.toSeq == Seq((0L, Set((1L, "a"))), (1L, Set((2L, "b")))))
    // replay from the stored cursor sees only what came after
    DeltaSource.writeDelta(Seq((3L, "c")).toDF("id", "s"), tmp, overwrite = false)
    seen.clear()
    val cur2 = DeltaSource.followChanges(spark, tmp, cur) { (v, batch) =>
      seen += ((v, batch.select("id", "s").as[(Long, String)].collect().toSet))
    }
    assert(cur2.contains(2L) && seen.toSeq == Seq((2L, Set((3L, "c")))))
  }

  test("commit race has ONE winner: put-if-absent refuses an existing version file") {
    val tmp = Files.createTempDirectory("graft_delta6").toString + "/t"
    DeltaSource.writeDelta(Seq((1L, "a")).toDF("id", "s"), tmp)
    val fs = new org.apache.hadoop.fs.Path(tmp)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val commit1 = new org.apache.hadoop.fs.Path(tmp, "_delta_log/00000000000000000001.json")
    CreateExclusiveCommitStore.putIfAbsent(fs, commit1, "{}\n")
    // the losing writer targeting the same next version must throw,
    // leaving the winner's commit intact
    intercept[Exception] {
      CreateExclusiveCommitStore.putIfAbsent(fs, commit1, """{"loser":true}""")
    }
    val content = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$tmp/_delta_log/00000000000000000001.json")), "UTF-8")
    assert(content == "{}\n")
  }

  test("checkpoint carries protocol + metaData + adds with real sizes (external-reader seedable)") {
    val tmp = Files.createTempDirectory("graft_delta6").toString + "/t"
    val df = spark.range(20L).select(col("id"), (col("id") % 2).cast("string").as("zone"))
    DeltaSource.writeDelta(df, tmp, partitionBy = Seq("zone"))
    val cv = DeltaSource.checkpoint(spark, tmp)
    val cp = spark.read.parquet(s"$tmp/_delta_log/${"%020d".format(cv)}.checkpoint.parquet")
    assert(cp.columns.toSet ==
      Set("add", "remove", "metaData", "txn", "protocol", "domainMetadata"))
    assert(cp.filter(col("protocol.minReaderVersion") === 1).count() == 1)
    assert(cp.filter(col("metaData.schemaString").isNotNull).count() == 1)
    val adds = cp.filter(col("add").isNotNull)
    assert(adds.count() >= 2)
    assert(adds.filter(col("add.size").isNull || col("add.size") <= 0).count() == 0)
    assert(adds.filter(col("add.modificationTime").isNull || col("add.modificationTime") <= 0).count() == 0)
    // partitioned checkpoint state round-trips after pre-checkpoint commit removal
    new java.io.File(s"$tmp/_delta_log/00000000000000000000.json").delete()
    assert(DeltaSource.readDelta(spark, tmp).count() == 20L)
  }

  test("absolute add paths (delta spec: external files) resolve as-is") {
    val root = Files.createTempDirectory("graft_delta6").toString
    val ext = s"$root/external"
    Seq((7L, "ext")).toDF("id", "s").coalesce(1).write.parquet(ext)
    val file = new java.io.File(ext).listFiles.find(_.getName.endsWith(".parquet")).get
    val tableDir = s"$root/t"; new java.io.File(s"$tableDir/_delta_log").mkdirs()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("s", org.apache.spark.sql.types.StringType)))
    val schemaJson = schema.json.replace("\"", "\\\"")
    val commit =
      s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}
         |{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{}}}
         |{"add":{"path":"file:${file.getAbsolutePath}","partitionValues":{},"size":${file.length()},"modificationTime":0,"dataChange":true}}
         |""".stripMargin
    Files.write(java.nio.file.Paths.get(s"$tableDir/_delta_log/00000000000000000000.json"),
      commit.getBytes("UTF-8"))
    assert(DeltaSource.readDelta(spark, tableDir).as[(Long, String)]
      .collect().toSet == Set((7L, "ext")))
  }
}
