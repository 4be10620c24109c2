package graft

import java.nio.file.Files
import graft.operators.Quality
import graft.sources.DeltaSource
import graft.streaming.StreamingCuration
import org.apache.spark.sql.functions._

/** Round-7 wave 4: shallow CLONE (zero-copy, independent, stats
  * carried) and the streaming expectations gate (batch/stream verdict
  * parity through a real micro-batch). */
class Round7Wave4Spec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft_r7w4_$tag").toString

  test("shallow clone: zero data copied, reads equal, stats skip on the clone") {
    val root = tmpDir("clone")
    val src = s"$root/src"
    val dst = s"$root/dst"
    val data = spark.range(1000).select($"id", ($"id" % 10).as("k"))
    // clustered source so per-file id stats are tight
    DeltaSource.writeDelta(data.repartitionByRange(4, $"id"), src)
    DeltaSource.cloneDelta(spark, src, dst)
    // equal reads
    assert(DeltaSource.readDelta(spark, dst).orderBy($"id").collect().toSeq ==
      DeltaSource.readDelta(spark, src).orderBy($"id").collect().toSeq)
    // ZERO data files under the clone root — only the log
    val dataFiles = new java.io.File(dst).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(dataFiles.isEmpty)
    // carried stats still data-skip: a narrow id range reads 1 of 4 files
    val narrow = DeltaSource.readDelta(spark, dst).where($"id".between(0, 100))
    narrow.collect()
    val scan = narrow.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }.get
    assert(scan.metrics("numFiles").value < 4,
      s"clone scan read ${scan.metrics("numFiles").value} files, expected skipping")
  }

  test("clone is independent: writes to the clone never touch the source") {
    val root = tmpDir("indep")
    val src = s"$root/src"
    val dst = s"$root/dst"
    DeltaSource.writeDelta(spark.range(100).toDF("id"), src)
    DeltaSource.cloneDelta(spark, src, dst)
    // append to the CLONE: new file stages under the clone's root
    DeltaSource.writeDelta(spark.range(100, 150).toDF("id"), dst, overwrite = false)
    assert(DeltaSource.readDelta(spark, dst).count() == 150)
    assert(DeltaSource.readDelta(spark, src).count() == 100)
    // and merging on the clone copy-on-writes into the clone root,
    // leaving the shared source file referenced but unmodified
    DeltaSource.mergeDelta(spark, dst,
      spark.range(5).select($"id" + 1000).toDF("id"), Seq("id"))
    assert(DeltaSource.readDelta(spark, src).count() == 100)
    // cloning onto an existing table refuses
    val e = intercept[IllegalArgumentException](DeltaSource.cloneDelta(spark, src, dst))
    assert(e.getMessage.contains("already has a Delta log"))
  }

  test("streaming expectations gate matches the batch verdicts on a real micro-batch") {
    val root = tmpDir("expect")
    val rows = Seq(
      (1L, "a perfectly reasonable document with plenty of characters in it for once", "en"),
      (2L, "short", "en"),
      (3L, "another long enough piece of text that satisfies the length expectation", "zh"))
      .toDF("doc_id", "text", "lang")
      .withColumn("n_chars", length($"text"))
    val rules = Seq(
      "min_length_40" -> (length(col("text")) >= 40),
      "latin_lang" -> col("lang").isin("en", "de", "fr", "es"))
    // land the batch as one parquet file in the watched dir
    val stage = s"$root/stage"
    rows.coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles
      .find(_.getName.endsWith(".parquet")).get.toPath
    Files.createDirectories(java.nio.file.Paths.get(s"$root/in"))
    Files.copy(part, java.nio.file.Paths.get(s"$root/in/b1.parquet"))

    val out = s"$root/out"
    val q = StreamingCuration.expectationsGate(
        spark.readStream.schema(rows.schema).parquet(s"$root/in"), rules)
      .withColumn("failed", concat_ws(",", $"failed_rules"))
      .select($"doc_id", $"failed")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", s"$root/cp")
      .start()
    try { q.processAllAvailable() } finally { q.stop() }

    val streamed = spark.read.parquet(out)
      .as[(Long, String)].collect().toMap
    val batch = Quality.expectations(rows, rules)
      .select($"doc_id", concat_ws(",", $"failed_rules"))
      .as[(Long, String)].collect().toMap
    assert(streamed == batch)
    assert(streamed(1L) == "" && streamed(2L) == "min_length_40" &&
      streamed(3L) == "latin_lang")
  }
}
