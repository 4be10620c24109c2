package graft

import graft.operators.{Dedup, Events, Quality}
import graft.streaming.{StreamingCuration, StreamingEvents}
import org.apache.spark.sql.functions._
import java.nio.file.Files

class StreamingCurationSpec extends SparkSpec {
  import spark.implicits._

  test("materialized signature table reproduces minhash pairs bit-exactly") {
    val docs = Tables.documents(spark, sf)
    val direct = Dedup.minhashLshPairs(docs)
      .as[(Long, Long, Double)].collect().toSeq

    val tmp = Files.createTempDirectory("graft_sigs").toString
    Dedup.signatureTable(docs).write.mode("overwrite").parquet(tmp)
    val fromZone = Dedup.minhashLshPairsFrom(spark.read.parquet(tmp))
      .as[(Long, Long, Double)].collect().toSeq
    assert(fromZone == direct && direct.nonEmpty)
  }

  test("streaming upsert sink merges micro-batches into a versioned zone") {
    import graft.sources.VersionedZone
    val tmp = Files.createTempDirectory("graft_vz").toString
    val zone = s"$tmp/zone"

    // land each micro-batch as a bare parquet FILE in the watched dir
    // (the file source does not recurse into nested write dirs)
    def land(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val stage = s"$tmp/stage_$name"
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles
        .find(_.getName.endsWith(".parquet")).get.toPath
      Files.createDirectories(java.nio.file.Paths.get(s"$tmp/in"))
      Files.copy(part, java.nio.file.Paths.get(s"$tmp/in/$name.parquet"))
    }

    val b1 = Seq((1L, "one", "s"), (2L, "two", "s")).toDF("doc_id", "text", "source")
    land(b1, "b1")
    val q1 = VersionedZone.upsertSink(
      spark.readStream.schema(b1.schema).parquet(s"$tmp/in"), zone, s"$tmp/cp").start()
    try { q1.processAllAvailable() } finally { q1.stop() }

    // batch 2: doc 1 updated, doc 3 new
    land(Seq((1L, "one-v2", "s"), (3L, "three", "s")).toDF("doc_id", "text", "source"), "b2")
    val q2 = VersionedZone.upsertSink(
      spark.readStream.schema(b1.schema).parquet(s"$tmp/in"), zone, s"$tmp/cp").start()
    try { q2.processAllAvailable() } finally { q2.stop() }

    val latest = VersionedZone.read(spark, zone)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq.sortBy(_._1)
    assert(latest == Seq((1L, "one-v2"), (2L, "two"), (3L, "three")))
    // time travel: version 0 still holds the pre-update state
    val v0 = VersionedZone.read(spark, zone, Some(0L))
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq.sortBy(_._1)
    assert(v0 == Seq((1L, "one"), (2L, "two")))
  }

  test("stream-static anomaly scoring matches the batch operator") {
    val tmp = Files.createTempDirectory("graft_anom").toString
    val batch = Tables.events(spark, sf)
    batch.write.mode("overwrite").parquet(s"$tmp/in")

    val stats = Events.typeStats(batch)
    val out = StreamingCuration.anomalyScores(
      StreamingEvents.eventsStream(spark, s"$tmp/in"), stats)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("anom").start()
    try { q.processAllAvailable() } finally { q.stop() }

    val streamed = spark.table("anom")
      .select($"event_id", $"z").as[(Long, Double)].collect().toMap
    val batched = Events.anomalies(batch)
      .select($"event_id", $"z").as[(Long, Double)].collect().toMap
    assert(streamed == batched && batched.nonEmpty)
  }

  test("streaming gopher gate keeps exactly the batch-kept docs") {
    val tmp = Files.createTempDirectory("graft_gq").toString
    val docs = Tables.documents(spark, sf)
    docs.write.mode("overwrite").parquet(s"$tmp/in")

    val stream = spark.readStream.schema(docs.schema).parquet(s"$tmp/in")
    val q = StreamingCuration.gopherKeep(stream).writeStream
      .outputMode("append").format("memory").queryName("gq").start()
    try { q.processAllAvailable() } finally { q.stop() }

    val streamedIds = spark.table("gq").select($"doc_id").as[Long].collect().toSet
    val batchIds = Quality.gopherFilter(docs).where($"keep" === 1L)
      .select($"doc_id").as[Long].collect().toSet
    assert(streamedIds == batchIds && batchIds.nonEmpty)
  }
}
