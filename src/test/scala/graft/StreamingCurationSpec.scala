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
