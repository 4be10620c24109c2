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
