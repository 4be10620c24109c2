package graft

import java.nio.file.Files
import graft.sources.DeltaSource
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Type widening (the Delta `typeWidening` reader-writer feature): an
  * append under mergeSchema may widen a column in place — one
  * metaData action records the promotion in `delta.typeChanges`,
  * zero files rewritten, and v0's narrow parquet pages read through
  * the vectorized reader's native promotion (int32→long, float→double,
  * int→double — verified on Spark 4.1). */
class DeltaTypeWideningSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("graft_widen").toString + "/t"

  private def logText(tbl: String, v: Long): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$tbl/_delta_log/${"%020d".format(v)}.json")), "UTF-8")

  test("int -> long widening: schema widens in place, old files read exactly") {
    val tbl = tmpTable()
    DeltaSource.writeDelta(Seq((1, "a"), (2, "b")).toDF("n", "s"), tbl)
    DeltaSource.writeDelta(Seq((3000000000L, "c")).toDF("n", "s"), tbl,
      overwrite = false, mergeSchema = true)
    val df = DeltaSource.readDelta(spark, tbl)
    assert(df.schema("n").dataType == LongType, "table type must widen to long")
    assert(df.as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3000000000L, "c")))
    // the promotion is recorded on the field
    assert(df.schema("n").metadata.contains("delta.typeChanges"))
    val ch = df.schema("n").metadata.getMetadataArray("delta.typeChanges")
    assert(ch.length == 1 && ch(0).getString("fromType") == "int" &&
      ch(0).getString("toType") == "bigint")
    // and the commit carries the reader-writer feature gate
    val commit = logText(tbl, 1L)
    assert(commit.contains("\"typeWidening\""), "protocol must list typeWidening")
    assert(commit.contains("\"minReaderVersion\":3"))
  }

  test("float -> double widening reads v0's float pages exactly") {
    val tbl = tmpTable()
    DeltaSource.writeDelta(Seq((1L, 1.5f), (2L, 2.25f)).toDF("id", "x"), tbl)
    DeltaSource.writeDelta(Seq((3L, math.Pi)).toDF("id", "x"), tbl,
      overwrite = false, mergeSchema = true)
    val df = DeltaSource.readDelta(spark, tbl)
    assert(df.schema("x").dataType == DoubleType)
    val got = df.as[(Long, Double)].collect().toMap
    assert(got(1L) == 1.5 && got(2L) == 2.25 && got(3L) == math.Pi)
  }

  test("a NARROWER batch upcasts silently as a pure append (no schema commit)") {
    val tbl = tmpTable()
    DeltaSource.writeDelta(Seq((1L, "a")).toDF("n", "s"), tbl)
    DeltaSource.writeDelta(Seq((2, "b")).toDF("n", "s"), tbl, overwrite = false)
    val df = DeltaSource.readDelta(spark, tbl)
    assert(df.schema("n").dataType == LongType, "table keeps its wide type")
    assert(df.as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
    assert(!logText(tbl, 1L).contains("metaData"),
      "an upcast append must not rewrite the table schema")
  }

  test("widening without mergeSchema, and non-widening conflicts, are refused") {
    val tbl = tmpTable()
    DeltaSource.writeDelta(Seq((1, "a")).toDF("n", "s"), tbl)
    val e1 = intercept[IllegalArgumentException] {
      DeltaSource.writeDelta(Seq((2L, "b")).toDF("n", "s"), tbl, overwrite = false)
    }
    assert(e1.getMessage.contains("mergeSchema"))
    val e2 = intercept[IllegalArgumentException] {
      DeltaSource.writeDelta(Seq(("x", "b")).toDF("n", "s"), tbl,
        overwrite = false, mergeSchema = true)
    }
    assert(e2.getMessage.contains("not a supported widening"))
    // the refused appends committed NOTHING
    assert(DeltaSource.latestVersion(spark, tbl).contains(0L))
  }

  test("widening and a new column land in ONE mergeSchema append") {
    val tbl = tmpTable()
    DeltaSource.writeDelta(Seq((1, "a")).toDF("n", "s"), tbl)
    DeltaSource.writeDelta(Seq((5L, "b", 0.5)).toDF("n", "s", "score"), tbl,
      overwrite = false, mergeSchema = true)
    val df = DeltaSource.readDelta(spark, tbl).orderBy($"n")
    assert(df.schema("n").dataType == LongType)
    assert(df.schema("score").dataType == DoubleType && df.schema("score").nullable)
    val rows = df.select($"n", $"s", $"score").collect()
    assert(rows(0).getLong(0) == 1L && rows(0).isNullAt(2))
    assert(rows(1).getLong(0) == 5L && rows(1).getDouble(2) == 0.5)
  }

  test("stats-based skipping still prunes on the widened column") {
    val tbl = tmpTable()
    DeltaSource.writeDelta(Seq((1, "lo"), (10, "lo2")).toDF("n", "s").coalesce(1), tbl)
    DeltaSource.writeDelta(
      Seq((5000000000L, "hi")).toDF("n", "s").coalesce(1), tbl,
      overwrite = false, mergeSchema = true)
    // v0's int stats parse under the widened long schema and the
    // narrow file prunes for a high-range predicate
    val hi = DeltaSource.readDelta(spark, tbl).where($"n" > 1000000L)
    assert(hi.as[(Long, String)].collect().toSeq == Seq((5000000000L, "hi")))
    val lo = DeltaSource.readDelta(spark, tbl).where($"n" < 100L)
      .as[(Long, String)].collect().toSet
    assert(lo == Set((1L, "lo"), (10L, "lo2")))
  }
}
