package graft

import java.nio.file.Files
import graft.operators.{Medallion, Quality}
import graft.sources.DeltaSource
import org.apache.spark.sql.functions._

/** Round-7 wave 3: incremental silver maintenance over the change
  * feed (resume, idempotence, equality with the batch recompute) and
  * DLT-style expectations (null handling, report invariants). */
class Round7Wave3Spec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft_r7w3_$tag").toString

  private def docs = Tables.documents(spark, sf)

  test("incremental silver over the feed equals the batch recompute, resumes incrementally") {
    val root = tmpDir("incr")
    val br = Medallion.bronze(docs)
      .select($"doc_id", $"source", $"content", $"content_length")
    DeltaSource.writeDelta(br.where($"doc_id" % 2 === 0), s"$root/bronze")
    val c1 = Medallion.incrementalSilver(spark, s"$root/bronze", s"$root/silver", s"$root/ckpt")
    assert(c1.contains(0L))
    val afterV0 = DeltaSource.readDelta(spark, s"$root/silver").count()
    // a second bronze commit arrives; the consumer drains ONLY it
    DeltaSource.writeDelta(br.where($"doc_id" % 2 =!= 0), s"$root/bronze",
      overwrite = false)
    val c2 = Medallion.incrementalSilver(spark, s"$root/bronze", s"$root/silver", s"$root/ckpt")
    assert(c2.contains(1L))
    // silver == full batch recompute
    val got = DeltaSource.readDelta(spark, s"$root/silver")
      .orderBy($"doc_id").collect().map(_.toString).toSeq
    val want = Medallion.silverNormalize(br)
      .select($"doc_id", $"source", $"content", $"content_length")
      .orderBy($"doc_id").collect().map(_.toString).toSeq
    assert(got == want && got.size > afterV0)
    // draining again with no new commits is a no-op (cursor holds)
    val silverV = DeltaSource.latestVersion(spark, s"$root/silver")
    assert(Medallion.incrementalSilver(
      spark, s"$root/bronze", s"$root/silver", s"$root/ckpt").contains(1L))
    assert(DeltaSource.latestVersion(spark, s"$root/silver") == silverV)
  }

  test("replaying a commit after a crash-before-cursor is idempotent (MERGE by key)") {
    val root = tmpDir("replay")
    val br = Medallion.bronze(docs)
      .select($"doc_id", $"source", $"content", $"content_length")
    DeltaSource.writeDelta(br.where($"doc_id" % 2 === 0), s"$root/bronze")
    DeltaSource.writeDelta(br.where($"doc_id" % 2 =!= 0), s"$root/bronze",
      overwrite = false)
    Medallion.incrementalSilver(spark, s"$root/bronze", s"$root/silver", s"$root/ckpt")
    val want = DeltaSource.readDelta(spark, s"$root/silver")
      .orderBy($"doc_id").collect().map(_.toString).toSeq
    // simulate a crash AFTER processing v1 but BEFORE the cursor
    // landed: delete the cursor marker and drain again — v0+v1 replay
    val fs = new org.apache.hadoop.fs.Path(s"$root/ckpt")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/ckpt"))
      .foreach(s => fs.delete(s.getPath, false))
    Medallion.incrementalSilver(spark, s"$root/bronze", s"$root/silver", s"$root/ckpt")
    val after = DeltaSource.readDelta(spark, s"$root/silver")
      .orderBy($"doc_id").collect().map(_.toString).toSeq
    assert(after == want)
  }

  test("expectations: null predicates are violations; clean rows carry empty lists") {
    val df = Seq(
      (1L, "long enough text that passes the gate", 37L),
      (2L, null.asInstanceOf[String], 0L), // null text → null length pred
      (3L, "short", 99L) // wrong n_chars AND short
    ).toDF("doc_id", "text", "n_chars")
    val rules = Seq(
      "text_not_null" -> col("text").isNotNull,
      "min_len_10" -> (length(col("text")) >= 10),
      "n_chars_ok" -> (col("n_chars") === length(col("text"))))
    val out = Quality.expectations(df, rules).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](r.fieldIndex("failed_rules")))
      .toMap
    assert(out(1L) == Seq.empty)
    assert(out(2L) == Seq("min_len_10", "n_chars_ok", "text_not_null"))
    assert(out(3L) == Seq("min_len_10", "n_chars_ok"))
  }

  test("expectation report: rates in [0,1], n_rows constant, rule set complete") {
    val rows = Quality.expectationReport(docs, Quality.defaultExpectations).collect()
    assert(rows.map(_.getAs[String]("rule")).sorted.toSeq ==
      Quality.defaultExpectations.map(_._1).sorted)
    assert(rows.map(_.getAs[Long]("n_rows")).distinct.length == 1)
    rows.foreach { r =>
      val rate = r.getAs[Double]("fail_rate")
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }
}
