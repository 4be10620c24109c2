package graft

import graft.streaming.StreamingEvents
import graft.streaming.StreamingEvents.Ev
import org.apache.spark.sql.functions._
import java.nio.file.Files

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming tumbling agg matches batch on the same data") {
    val tmp = Files.createTempDirectory("graft_stream").toString
    val batch = Tables.events(spark, sf)
    batch.write.mode("overwrite").parquet(s"$tmp/in")

    val agg = StreamingEvents.tumblingAgg(
      StreamingEvents.eventsStream(spark, s"$tmp/in"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("stream_agg").start()
    try { q.processAllAvailable() } finally { q.stop() }

    val streamed = spark.table("stream_agg")
      .groupBy().agg(sum($"n_events")).as[Long].head()
    assert(streamed == batch.count())

    // spot-check one (window, type) cell against the batch operator
    val batchCell = graft.operators.Events.tumblingAgg(batch)
      .orderBy($"window_start", $"event_type").limit(1)
      .select($"n_events").as[Long].head()
    val (ws, et) = graft.operators.Events.tumblingAgg(batch)
      .orderBy($"window_start", $"event_type").limit(1)
      .select($"window_start", $"event_type").as[(java.sql.Timestamp, String)].head()
    val streamCell = spark.table("stream_agg")
      .where($"window_start" === ws && $"event_type" === et)
      .select($"n_events").as[Long].head()
    assert(streamCell == batchCell)
  }

  test("stateful sessionizer emits completed sessions, holds the open one") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val tmp = Files.createTempDirectory("graft_sess").toString
    Seq(
      Ev(1L, ts(0), 7L, 1.0), Ev(2L, ts(10), 7L, 2.0),   // session 1 (closed by gap)
      Ev(3L, ts(60), 7L, 3.0),                            // session 2 (still open)
      Ev(4L, ts(0), 8L, 5.0))                             // user 8 session 1 (open)
      .toDS().write.mode("overwrite").parquet(s"$tmp/in")

    val evs = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Ev]].schema)
      .parquet(s"$tmp/in").as[Ev]
    val out = StreamingEvents.sessionizeStateful(evs)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sessions").start()
    try { q.processAllAvailable() } finally { q.stop() }

    val done = spark.table("sessions")
      .select($"user_id", $"session_seq", $"n_events", $"session_value")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // only user 7's first session completed within the batch
    assert(done == Seq((7L, 1L, 2L, 3.0)))
  }

  test("streaming medallion pipeline chunks raw json end to end") {
    val tmp = Files.createTempDirectory("graft_raw").toString
    val text = "lorem ipsum dolor sit amet " * 20
    Files.writeString(java.nio.file.Path.of(s"$tmp/in.json"),
      s"""{"url":"u1","title":"t","content":"$text","author":"a","date":"2024-01-01"}
         |{"url":"u2","title":"t","content":"short","author":"a","date":"2024-01-01"}
         |""".stripMargin)
    val gold = graft.streaming.StreamingPipeline.rawToGold(spark, tmp)
    val q = gold.writeStream.outputMode("append")
      .format("memory").queryName("gold_stream").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val rows = spark.table("gold_stream")
    assert(rows.count() > 1)            // long doc fans out to chunks
    assert(rows.where($"url" === "u2").count() == 0) // short doc filtered
  }

  test("stream-stream interval join matches the batch equivalent") {
    val tmp = Files.createTempDirectory("graft_ssj").toString
    val batch = Tables.events(spark, sf)
    batch.write.mode("overwrite").parquet(s"$tmp/in")
    val joined = StreamingEvents.purchaseAttribution(
      StreamingEvents.eventsStream(spark, s"$tmp/in"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("attrib").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val streamed = spark.table("attrib").count()
    val expected = StreamingEvents.purchaseAttribution(batch).count()
    assert(streamed == expected)
    assert(streamed > 0)
  }

  test("streaming session_window emits batch-identical closed sessions") {
    val tmp = Files.createTempDirectory("graft_ssw").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ev(id: Long, min: Long, user: Long, v: Double) =
      (id, new java.sql.Timestamp(t0.getTime + min * 60000L), user, "click", v, "{}")
    // user 1: two sessions (gap 45 > 30); user 2: one session whose
    // two halves only MERGE once event 12 bridges them
    val real = Seq(
      ev(1, 0, 1L, 1.0), ev(2, 10, 1L, 2.0), ev(3, 20, 1L, 3.0),
      ev(4, 65, 1L, 4.0), ev(5, 70, 1L, 5.0),
      ev(10, 0, 2L, 1.0), ev(12, 25, 2L, 1.0), ev(11, 50, 2L, 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // a far-future flush event advances the watermark past every real
    // session so append mode emits them all; its own session stays open
    val flush = Seq(ev(99, 60 * 24, 9L, 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    real.coalesce(1).write.parquet(s"$tmp/in/b1")
    flush.coalesce(1).write.parquet(s"$tmp/in/b2")
    val stream = spark.readStream.schema(StreamingEvents.EventSchema)
      .option("maxFilesPerTrigger", 1).parquet(s"$tmp/in/*")
    val q = StreamingEvents.sessionWindowStream(stream, gapMinutes = 30,
      watermarkDelay = "0 seconds")
      .writeStream.outputMode("append").format("memory").queryName("ssw").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.table("ssw")
      .select($"user_id", $"session_start", $"session_end", $"n_events", $"session_value")
      .orderBy($"user_id", $"session_start").collect().toSeq
    val want = graft.operators.Events.sessionizeNative(
      real.unionByName(flush), gapMinutes = 30)
      .where($"user_id" =!= 9L) // the flush session never closed
      .orderBy($"user_id", $"session_start").collect().toSeq
    assert(got == want, s"streamed sessions:\n$got\nbatch sessions:\n$want")
    assert(got.size == 3, "two user-1 sessions plus user 2's merged one")
    // the bridge proof: user 2 emitted ONE 0..50+30 session, not two
    val u2 = got.filter(_.getLong(0) == 2L)
    assert(u2.size == 1 && u2.head.getLong(3) == 3L)
  }
}
