package graft

import java.nio.file.Files
import graft.sources.DeltaSource
import org.apache.hadoop.fs.Path

/** In-commit-timestamp contracts (`delta.enableInCommitTimestamps` +
  * the inCommitTimestamp writer feature): the enabling commit carries
  * the feature, the enablement properties and its own ICT; every
  * later commit leads with a strictly-monotone commitInfo timestamp;
  * and `readDeltaAsOf` trusts the ICT over the log file's mtime —
  * the object-store reality where mtimes are rewritten by copies and
  * lifecycle transitions. */
class DeltaIctSpec extends SparkSpec {

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft_ict_$tag").toString + "/t"

  private def fsOf(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def ict(tbl: String, v: Long): Option[Long] = {
    val first = Files.readString(java.nio.file.Paths.get(
      tbl, "_delta_log", f"$v%020d.json")).linesIterator.next()
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(first)
    val t = node.path("commitInfo").path("inCommitTimestamp")
    if (t.isNumber) Some(t.asLong) else None
  }

  test("enabling stamps the feature, the properties and the commit's own ICT") {
    val tbl = tmpDir("on")
    DeltaSource.writeDelta(spark.range(10).selectExpr("id", "id * 2 as v"), tbl)
    assert(ict(tbl, 0L).isEmpty, "pre-enable commits carry no ICT")
    DeltaSource.enableInCommitTimestamps(spark, tbl)
    assert(ict(tbl, 1L).nonEmpty, "the enabling commit must carry its own ICT")
    val log1 = Files.readString(java.nio.file.Paths.get(
      tbl, "_delta_log", "00000000000000000001.json"))
    assert(log1.contains("\"inCommitTimestamp\"") &&
      log1.contains("inCommitTimestampEnablementVersion"))
    assert(log1.contains("\"minWriterVersion\":7") &&
      log1.contains("\"inCommitTimestamp\""), "writer feature must ride the commit")
  }

  test("later commits carry strictly increasing ICTs") {
    val tbl = tmpDir("mono")
    DeltaSource.writeDelta(spark.range(5).selectExpr("id"), tbl)
    DeltaSource.enableInCommitTimestamps(spark, tbl)
    (0 until 3).foreach { i =>
      DeltaSource.writeDelta(spark.range(i, i + 1).selectExpr("id"), tbl,
        overwrite = false)
    }
    val ts = (1L to 4L).map(v => ict(tbl, v).getOrElse(
      fail(s"commit $v lost its ICT")))
    assert(ts == ts.sorted && ts.distinct == ts,
      s"ICTs must be strictly monotone, got $ts")
  }

  test("readDeltaAsOf trusts the ICT over a rewritten mtime") {
    val tbl = tmpDir("asof")
    DeltaSource.writeDelta(spark.range(10).selectExpr("id"), tbl)
    DeltaSource.enableInCommitTimestamps(spark, tbl)
    DeltaSource.writeDelta(spark.range(10, 25).selectExpr("id"), tbl,
      overwrite = false)
    // an object store "rewrites" commit 2's mtime into the far future
    val fs = fsOf(tbl)
    val c2 = new Path(tbl, "_delta_log/00000000000000000002.json")
    fs.setTimes(c2, System.currentTimeMillis() + 365L * 24 * 3600 * 1000, -1)
    // as-of "shortly after now" must still see commit 2: its ICT is
    // in the past even though its mtime claims next year
    val asOf = DeltaSource.readDeltaAsOf(spark, tbl,
      System.currentTimeMillis() + 60000)
    assert(asOf.count() == 25,
      "mtime-based resolution would have dropped the appended commit")
  }
}
