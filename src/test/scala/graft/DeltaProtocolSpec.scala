package graft

import java.nio.file.Files
import graft.sources.DeltaSource
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Protocol gating: feature-bearing tables advertise what a reader
  * MUST understand (deletionVectors, columnMapping), upgrades ride
  * the commit that introduces the feature, and this reader refuses
  * tables requiring features it lacks instead of misreading them. */
class DeltaProtocolSpec extends SparkSpec {

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft_proto_$tag").toString + "/t"

  private def logText(tbl: String, v: Long): String = {
    val p = new Path(tbl, f"_delta_log/$v%020d.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  test("a fresh table advertises (1,2); the first DV delete upgrades to (3,7)+deletionVectors in the same commit") {
    val tbl = tmpDir("dv")
    DeltaSource.writeDelta(spark.range(0, 100).selectExpr("id", "id % 7 as k"), tbl)
    assert(logText(tbl, 0).contains("\"minReaderVersion\":1"))
    DeltaSource.deleteDelta(spark, tbl, col("k") === 3)
    val l1 = logText(tbl, 1)
    assert(l1.contains("\"minReaderVersion\":3"))
    assert(l1.contains("\"minWriterVersion\":7"))
    assert(l1.contains("\"readerFeatures\":[\"deletionVectors\"]"))
    // the upgrade precedes the DV-bearing add
    assert(l1.indexOf("\"protocol\"") < l1.indexOf("\"deletionVector\""))
    // a second delete does NOT re-emit the protocol
    DeltaSource.deleteDelta(spark, tbl, col("k") === 5)
    assert(!logText(tbl, 2).contains("\"protocol\""))
  }

  test("enableColumnMapping gates to legacy (2,5); on a DV table it joins the feature list") {
    val plain = tmpDir("cm")
    DeltaSource.writeDelta(spark.range(0, 50).selectExpr("id", "id as v"), plain)
    DeltaSource.enableColumnMapping(spark, plain)
    val l = logText(plain, 1)
    assert(l.contains("\"minReaderVersion\":2") && l.contains("\"minWriterVersion\":5"))

    val dvTbl = tmpDir("cmdv")
    DeltaSource.writeDelta(spark.range(0, 50).selectExpr("id", "id % 5 as k"), dvTbl)
    DeltaSource.deleteDelta(spark, dvTbl, col("k") === 0)
    DeltaSource.enableColumnMapping(spark, dvTbl)
    val l2 = logText(dvTbl, 2)
    assert(l2.contains("\"readerFeatures\":[\"columnMapping\",\"deletionVectors\"]"))
    // and everything still reads
    DeltaSource.renameColumn(spark, dvTbl, "k", "bucket")
    val got = DeltaSource.readDelta(spark, dvTbl)
    assert(got.where(col("bucket") === 0).count() == 0)
    assert(got.count() == 40)
  }

  test("upgrading an already-(x,7) table does not re-derive the legacy feature ladder") {
    // ICT first (protocol goes to minWriter 7 listing only what the
    // legacy (1,2) start + state implied), then a DV delete: the DV
    // upgrade must ADD deletionVectors, not pollute the list with
    // changeDataFeed/generatedColumns/columnMapping/identityColumns
    // the table never used — external writers must implement every
    // listed feature, so over-listing shuts them out.
    val tbl = tmpDir("ladder")
    DeltaSource.writeDelta(spark.range(0, 60).selectExpr("id", "id % 5 as k"), tbl)
    DeltaSource.enableInCommitTimestamps(spark, tbl) // v1: -> (1,7)
    DeltaSource.deleteDelta(spark, tbl, col("k") === 2) // v2: -> (3,7)+DV
    val l = logText(tbl, 2)
    assert(l.contains("\"protocol\""), "the DV delete must carry the upgrade")
    for (f <- Seq("changeDataFeed", "generatedColumns", "columnMapping",
        "identityColumns", "checkConstraints"))
      assert(!l.contains(f),
        s"feature $f was never used by this table but got listed:\n$l")
    for (f <- Seq("deletionVectors", "inCommitTimestamp"))
      assert(l.contains(f), s"active feature $f must stay listed:\n$l")
    // the table still reads and the delete took effect
    assert(DeltaSource.readDelta(spark, tbl).count() == 48)
  }

  test("a table requiring an unsupported reader feature is refused, not misread") {
    val tbl = tmpDir("alien")
    DeltaSource.writeDelta(spark.range(0, 10).toDF("id"), tbl)
    val fs = new Path(tbl).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new Path(tbl, f"_delta_log/${1L}%020d.json"), true)
    // timestampNtz is a real spec feature this reader does NOT implement
    out.write(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["timestampNtz"],"writerFeatures":["timestampNtz"]}}"""
        .getBytes("UTF-8"))
    out.close()
    val e = intercept[IllegalArgumentException] {
      DeltaSource.readDelta(spark, tbl).collect()
    }
    assert(e.getMessage.contains("timestampNtz"))
    // a version far beyond us is refused too
    val out2 = fs.create(new Path(tbl, f"_delta_log/${2L}%020d.json"), true)
    out2.write("""{"protocol":{"minReaderVersion":9,"minWriterVersion":9}}""".getBytes("UTF-8"))
    out2.close()
    val e2 = intercept[IllegalArgumentException] {
      DeltaSource.readDelta(spark, tbl).collect()
    }
    assert(e2.getMessage.contains("minReaderVersion 9"))
  }

  test("a table requiring an unsupported WRITER feature refuses writes but still reads") {
    val tbl = tmpDir("alienw")
    DeltaSource.writeDelta(
      spark.range(0, 20).selectExpr("id", "id % 4 as k"), tbl)
    val fs = new Path(tbl).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new Path(tbl, f"_delta_log/${1L}%020d.json"), true)
    // icebergCompatV2 is a real spec WRITER feature this engine does
    // not implement; reader-side the table stays plain (minReader 1)
    out.write(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["icebergCompatV2","appendOnly","invariants"]}}"""
        .getBytes("UTF-8"))
    out.close()
    // reads are LEGAL — reader gating is separate per the spec
    assert(DeltaSource.readDelta(spark, tbl).count() == 20)
    // every mutating entry point refuses, naming the feature
    def refused(op: => Any): Unit = {
      val e = intercept[IllegalArgumentException](op)
      assert(e.getMessage.contains("icebergCompatV2"), e.getMessage)
    }
    refused(DeltaSource.writeDelta(
      spark.range(20, 30).selectExpr("id", "id % 4 as k"), tbl, overwrite = false))
    refused(DeltaSource.deleteDelta(spark, tbl, col("k") === 1))
    refused(DeltaSource.updateDelta(spark, tbl, col("k") === 1,
      Map("k" -> lit(9L))))
    refused(DeltaSource.mergeDelta(spark, tbl,
      spark.range(0, 5).selectExpr("id", "id % 4 as k"), Seq("id")))
    refused(DeltaSource.optimizeDelta(spark, tbl))
    refused(DeltaSource.vacuum(spark, tbl))
    // METADATA-mutating commits are gated too — the spec requires the
    // writer-feature check before ANY commit, not only data ones
    refused(DeltaSource.setTableProperties(spark, tbl, Map("foo" -> "bar")))
    refused(DeltaSource.addCheckConstraint(spark, tbl, "kpos", "k >= 0"))
    refused(DeltaSource.dropCheckConstraint(spark, tbl, "kpos"))
    refused(DeltaSource.enableColumnMapping(spark, tbl))
    refused(DeltaSource.renameColumn(spark, tbl, "k", "kk"))
    refused(DeltaSource.dropColumn(spark, tbl, "k"))
    refused(DeltaSource.enableRowTracking(spark, tbl))
    refused(DeltaSource.enableInCommitTimestamps(spark, tbl))
    // an unknown minWriterVersion alone is refused too
    val out2 = fs.create(new Path(tbl, f"_delta_log/${2L}%020d.json"), true)
    out2.write("""{"protocol":{"minReaderVersion":1,"minWriterVersion":9}}""".getBytes("UTF-8"))
    out2.close()
    val e2 = intercept[IllegalArgumentException](
      DeltaSource.deleteDelta(spark, tbl, col("k") === 1))
    assert(e2.getMessage.contains("minWriterVersion 9"))
    assert(DeltaSource.readDelta(spark, tbl).count() == 20) // still readable
  }

  test("the protocol (with features) rides checkpoints and clones") {
    val tbl = tmpDir("cp")
    DeltaSource.writeDelta(spark.range(0, 200).selectExpr("id", "id % 7 as k"), tbl)
    DeltaSource.deleteDelta(spark, tbl, col("k") === 1)
    val cpv = DeltaSource.checkpoint(spark, tbl)
    val fs = new Path(tbl).getFileSystem(spark.sparkContext.hadoopConfiguration)
    (0L to cpv).foreach(v => fs.delete(new Path(tbl, f"_delta_log/$v%020d.json"), false))
    // replay now seeds from the checkpoint alone — the DV feature
    // must still be advertised AND applied
    assert(DeltaSource.readDelta(spark, tbl).where(col("k") === 1).count() == 0)
    val dst = tmpDir("cpclone")
    DeltaSource.cloneDelta(spark, tbl, dst)
    assert(logText(dst, 0).contains("\"readerFeatures\":[\"deletionVectors\"]"))
    assert(DeltaSource.readDelta(spark, dst).where(col("k") === 1).count() == 0)
  }
}
