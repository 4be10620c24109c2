package graft

import java.nio.file.Files
import graft.sources.DeltaSource
import org.apache.spark.sql.functions._

/** Delta Lake interop: graft reads and writes the open `_delta_log`
  * protocol — the reference's storage substrate (delta-rs zones,
  * delta_queries.py reads them back). Fixtures are real log layouts:
  * JSON commits, checkpoint parquet, partitioned adds. */
class DeltaSourceSpec extends SparkSpec {
  import spark.implicits._

  private def silver() = SparkEntry.queries("pipe_silver_normalize")(spark, sf)

  test("write/read round-trip reproduces the silver zone (query_silver_table parity)") {
    val tmp = Files.createTempDirectory("graft_delta").toString + "/silver"
    val zone = silver()
    val v = DeltaSource.writeDelta(zone, tmp)
    assert(v == 0L)
    val back = DeltaSource.readDelta(spark, tmp)
    // the reference's silver query reports count + columns; we pin full content
    assert(back.columns.toSeq == zone.columns.toSeq)
    assert(back.count() == zone.count())
    assert(back.exceptAll(zone).isEmpty && zone.exceptAll(back).isEmpty)
    // the on-disk layout is a real delta table: one commit, add actions only
    val log = new java.io.File(s"$tmp/_delta_log")
    assert(log.listFiles.map(_.getName).contains("00000000000000000000.json"))
  }

  test("overwrite commits replace the snapshot; time travel sees each version") {
    val tmp = Files.createTempDirectory("graft_delta").toString + "/t"
    val a = Seq((1L, "x"), (2L, "y")).toDF("id", "s")
    val b = Seq((3L, "z")).toDF("id", "s")
    DeltaSource.writeDelta(a, tmp)
    val v1 = DeltaSource.writeDelta(b, tmp) // overwrite: removes v0 files
    assert(v1 == 1L)
    assert(DeltaSource.readDelta(spark, tmp).as[(Long, String)].collect().toSet == Set((3L, "z")))
    assert(DeltaSource.readDelta(spark, tmp, Some(0L)).as[(Long, String)]
      .collect().toSet == Set((1L, "x"), (2L, "y")))
    assert(DeltaSource.latestVersion(spark, tmp).contains(1L))
  }

  test("timestamp time travel resolves to the newest commit at-or-before the instant") {
    val tmp = Files.createTempDirectory("graft_delta").toString + "/t"
    DeltaSource.writeDelta(Seq((1L, "x")).toDF("id", "s"), tmp)
    val log = new java.io.File(s"$tmp/_delta_log")
    // push commit 0 visibly into the past so the two versions'
    // mtimes are strictly ordered without sleeping
    val c0 = new java.io.File(log, "00000000000000000000.json")
    val past = System.currentTimeMillis() - 60000
    assert(c0.setLastModified(past))
    DeltaSource.writeDelta(Seq((2L, "y")).toDF("id", "s"), tmp)
    // between the two commits → v0; now → v1; before both → error
    assert(DeltaSource.readDeltaAsOf(spark, tmp, past + 1000)
      .as[(Long, String)].collect().toSet == Set((1L, "x")))
    assert(DeltaSource.readDeltaAsOf(spark, tmp, System.currentTimeMillis())
      .as[(Long, String)].collect().toSet == Set((2L, "y")))
    val e = intercept[IllegalArgumentException](
      DeltaSource.readDeltaAsOf(spark, tmp, past - 1000))
    assert(e.getMessage.contains("no commit or checkpoint at or before"))
  }

  test("append commits accumulate") {
    val tmp = Files.createTempDirectory("graft_delta").toString + "/t"
    DeltaSource.writeDelta(Seq((1L, "x")).toDF("id", "s"), tmp)
    DeltaSource.writeDelta(Seq((2L, "y")).toDF("id", "s"), tmp, overwrite = false)
    assert(DeltaSource.readDelta(spark, tmp).as[(Long, String)]
      .collect().toSet == Set((1L, "x"), (2L, "y")))
  }

  test("checkpoint bounds replay: snapshot survives deleting pre-checkpoint commits") {
    val tmp = Files.createTempDirectory("graft_delta").toString + "/t"
    DeltaSource.writeDelta(Seq((1L, "a")).toDF("id", "s"), tmp)
    DeltaSource.writeDelta(Seq((2L, "b")).toDF("id", "s"), tmp, overwrite = false)
    val cv = DeltaSource.checkpoint(spark, tmp)
    assert(cv == 1L)
    // a post-checkpoint commit applies on top of the checkpoint state
    DeltaSource.writeDelta(Seq((3L, "c")).toDF("id", "s"), tmp, overwrite = false)
    // Delta's log-retention cleanup: pre-checkpoint commits vanish
    val log = new java.io.File(s"$tmp/_delta_log")
    log.listFiles.filter(f => f.getName.matches("\\d{20}\\.json") &&
      f.getName.stripSuffix(".json").toLong <= cv).foreach(_.delete())
    assert(DeltaSource.readDelta(spark, tmp).as[(Long, String)]
      .collect().toSet == Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("reads a hand-written partitioned delta-rs-style log (partitionValues re-attached)") {
    val root = Files.createTempDirectory("graft_delta").toString + "/p"
    val fs = new java.io.File(root); fs.mkdirs()
    // two data files, partition column `zone` NOT stored in the files
    def land(name: String, rows: Seq[(Long, String)]): Long = {
      val stage = s"$root/.s"
      rows.toDF("id", "s").coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles.find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, java.nio.file.Paths.get(s"$root/$name"))
      val n = new java.io.File(s"$root/$name").length()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(stage))
      n
    }
    val s1 = land("f1.parquet", Seq((1L, "u")))
    val s2 = land("f2.parquet", Seq((2L, "v")))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("s", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("zone", org.apache.spark.sql.types.StringType)))
    val schemaJson = schema.json.replace("\"", "\\\"")
    val log = new java.io.File(s"$root/_delta_log"); log.mkdirs()
    val commit =
      s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}
         |{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":["zone"],"configuration":{}}}
         |{"add":{"path":"f1.parquet","partitionValues":{"zone":"bronze"},"size":$s1,"modificationTime":0,"dataChange":true}}
         |{"add":{"path":"f2.parquet","partitionValues":{"zone":"silver"},"size":$s2,"modificationTime":0,"dataChange":true}}
         |""".stripMargin
    Files.write(java.nio.file.Paths.get(s"$root/_delta_log/00000000000000000000.json"),
      commit.getBytes("UTF-8"))
    val got = DeltaSource.readDelta(spark, root)
    assert(got.columns.toSeq == Seq("id", "s", "zone"))
    assert(got.as[(Long, String, String)].collect().toSet ==
      Set((1L, "u", "bronze"), (2L, "v", "silver")))
    // a second commit removing f1: the remove wins over the older add
    Files.write(java.nio.file.Paths.get(s"$root/_delta_log/00000000000000000001.json"),
      """{"remove":{"path":"f1.parquet","deletionTimestamp":1,"dataChange":true}}
        |""".stripMargin.getBytes("UTF-8"))
    assert(DeltaSource.readDelta(spark, root).as[(Long, String, String)]
      .collect().toSet == Set((2L, "v", "silver")))
    assert(DeltaSource.readDelta(spark, root, Some(0L)).count() == 2)
  }
}
