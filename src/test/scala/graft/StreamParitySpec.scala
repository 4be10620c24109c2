package graft

import graft.operators.Events
import org.apache.spark.sql.functions._

/** The graded streaming entries' contract, pinned in-library: a
  * windowed aggregation run as a REAL streaming query (file source →
  * AvailableNow micro-batches → complete-mode sink) lands exactly
  * the batch answer — row for row, on the same corpus. The DuckDB
  * oracle grades the same parity against SQL; this spec grades it
  * against the batch operator, so operator, stream, and oracle pin
  * one another. */
class StreamParitySpec extends SparkSpec {

  test("streamed tumbling agg equals the batch twin") {
    val streamed = SparkEntry.queries("stream_tumbling_agg")(spark, sf)
      .collect().map(_.toString).toSeq
    val batch = Events.tumblingAgg(Tables.events(spark, sf))
      .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy(col("window_start"), col("event_type"))
      .collect().map(_.toString).toSeq
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streamed dedup-distinct users equal the batch distinct counts") {
    val streamed = SparkEntry.queries("stream_distinct_users")(spark, sf)
      .collect().map(_.toString).toSeq
    val batch = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("event_type"))
      .collect().map(_.toString).toSeq
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streamed Delta ingestion lands exactly the batch silver table") {
    val streamed = SparkEntry.queries("stream_delta_silver")(spark, sf)
      .collect().map(_.toString).toSeq
    val batch = graft.operators.Medallion.silverNormalize(
        graft.operators.Medallion.bronze(Tables.documents(spark, sf)))
      .select(col("doc_id"), col("source"), col("content"), col("content_length"))
      .orderBy(col("doc_id"))
      .collect().map(_.toString).toSeq
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streamed co-occurrence equals the batch X under split arrival") {
    import spark.implicits._
    import graft.operators.Glove
    val d1 = Seq((0L, "key agg row scan key agg"), (1L, "agg row agg key"))
    val d2 = Seq((2L, "row key key agg row"), (3L, "scan scan key"))
    val all = (d1 ++ d2).toDF("doc_id", "text")
    val vb = broadcast(Glove.vocab(all))
    val tmp = java.nio.file.Files.createTempDirectory("graft_gcooc").toString
    def land(rows: Seq[(Long, String)], f: String): Unit = {
      val stage = s"$tmp/stage_$f"
      rows.toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles
        .find(_.getName.endsWith(".parquet")).get.toPath
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$tmp/in"))
      java.nio.file.Files.copy(part, java.nio.file.Paths.get(s"$tmp/in/$f.parquet"))
    }
    land(d1, "b1")
    val stream = spark.readStream
      .schema(all.schema).parquet(s"$tmp/in")
    val q = Glove.coocDirectedWithVocab(stream, vb)
      .writeStream.outputMode("complete").format("memory")
      .queryName("gcooc_par").start()
    val streamed = try {
      q.processAllAvailable()
      land(d2, "b2") // second micro-batch: counts must ACCUMULATE
      q.processAllAvailable()
      val directed = spark.table("gcooc_par")
      directed.unionByName(directed
          .select(col("ib").as("ia"), col("ia").as("ib"), col("x")))
        .groupBy(col("ia"), col("ib"))
        .agg(sum(col("x")).cast("double").as("x"))
        .orderBy(col("ia"), col("ib"))
        .collect().map(_.toString).toSeq
    } finally q.stop()
    val batch = Glove.cooc(all)
      .select(col("ia"), col("ib"), col("x").cast("double").as("x"))
      .orderBy(col("ia"), col("ib"))
      .collect().map(_.toString).toSeq
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streamed hopping agg equals the batch twin") {
    val streamed = SparkEntry.queries("stream_hopping_agg")(spark, sf)
      .collect().map(_.toString).toSeq
    val batch = Events.hoppingAgg(Tables.events(spark, sf))
      .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy(col("window_start"), col("event_type"))
      .collect().map(_.toString).toSeq
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("stream-stream interval join: time-ordered split arrival loses no pairs") {
    // the state-retention inequality on trial: the 2h watermark
    // EXCEEDS the 1h join interval, so when the corpus arrives in
    // event-time order across separate micro-batches, no click a
    // future purchase still needs is evicted before that purchase
    // lands. Pairs STRADDLING the batch boundary are the teeth.
    import graft.streaming.StreamingEvents
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
    // split BETWEEN a matched pair's click and purchase, so at least
    // one pair provably straddles the batch boundary
    val anchor = StreamingEvents.purchaseAttribution(ev)
      .where(col("click_ts") < col("purchase_ts"))
      .select(unix_micros(col("click_ts")).as("c"),
        unix_micros(col("purchase_ts")).as("p"))
      .orderBy(col("p"), col("c")).head()
    val splitUs = (anchor.getLong(0) + anchor.getLong(1)) / 2
    val h1 = ev.where(unix_micros(col("ts")) <= splitUs)
    val h2 = ev.where(unix_micros(col("ts")) > splitUs)
    val tmp = java.nio.file.Files.createTempDirectory("graft_ssj2").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$tmp/in"))
    def land(df: org.apache.spark.sql.DataFrame, f: String): Unit = {
      val stage = s"$tmp/stage_$f"
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles
        .find(_.getName.endsWith(".parquet")).get.toPath
      java.nio.file.Files.copy(part, java.nio.file.Paths.get(s"$tmp/in/$f.parquet"))
    }
    land(h1, "b1")
    val joined = StreamingEvents.purchaseAttribution(
      spark.readStream.schema(StreamingEvents.EventSchema).parquet(s"$tmp/in"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_split").start()
    val streamed = try {
      q.processAllAvailable()
      land(h2, "b2") // second micro-batch: the late half
      q.processAllAvailable()
      spark.table("ssj_split")
        .select(col("purchase_id"), col("click_id"))
        .orderBy(col("purchase_id"), col("click_id"))
        .collect().map(_.toString).toSeq
    } finally q.stop()
    val batchPairs = StreamingEvents.purchaseAttribution(ev)
      .select(col("purchase_id"), col("click_id"))
      .orderBy(col("purchase_id"), col("click_id"))
      .collect().map(_.toString).toSeq
    assert(streamed == batchPairs && streamed.nonEmpty)
    // the control has teeth only if some pair straddles the boundary
    val straddling = StreamingEvents.purchaseAttribution(ev)
      .where(unix_micros(col("purchase_ts")) > splitUs &&
        unix_micros(col("click_ts")) <= splitUs)
      .count()
    assert(straddling > 0,
      "no pair straddles the split - the arrival-order control proves nothing")
  }
}
