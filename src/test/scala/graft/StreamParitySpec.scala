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
}
