package graft

import graft.operators.Skew
import graft.streaming.StreamingEvents
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted count equals plain count under extreme key skew") {
    val skewed = spark.range(100000).select(
      when($"id" % 100 === 0, lit(7L)).otherwise($"id").as("k"))
    val plain = skewed.groupBy($"k").count().orderBy($"k")
      .as[(Long, Long)].collect().toMap
    val salted = Skew.saltedCount(skewed, "k").orderBy($"k")
      .as[(Long, Long)].collect().toMap
    assert(salted == plain)
    assert(salted(7L) == 1001L) // 1000 multiples of 100, plus id=7 itself
  }

  test("hot/cold join equals plain join") {
    val facts = spark.range(10000).select(($"id" % 10).as("k"), $"id".as("v"))
    val dim = spark.range(10).select($"id".as("k"), concat(lit("d"), $"id").as("name"))
    val plain = facts.join(dim, "k").agg(count(lit(1)), sum($"v")).as[(Long, Long)].head()
    val hc = Skew.hotColdJoin(facts, dim, "k", Seq(0L, 1L))
      .agg(count(lit(1)), sum($"v")).as[(Long, Long)].head()
    assert(hc == plain)
  }

  test("streaming dedup drops re-scraped content within the watermark") {
    val tmp = Files.createTempDirectory("graft_sdedup").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    Seq(
      (1L, t0, "same content"), (2L, t0, "same content"), (3L, t0, "other content"))
      .toDF("doc_id", "ts", "content")
      .write.mode("overwrite").parquet(s"$tmp/in")
    val stream = spark.readStream
      .schema("doc_id LONG, ts TIMESTAMP, content STRING")
      .parquet(s"$tmp/in")
      .withWatermark("ts", "1 hour")
      .dropDuplicates("content")
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("sdedup").start()
    try { q.processAllAvailable() } finally { q.stop() }
    assert(spark.table("sdedup").select($"content").distinct().count() == 2)
    assert(spark.table("sdedup").count() == 2)
  }
}
