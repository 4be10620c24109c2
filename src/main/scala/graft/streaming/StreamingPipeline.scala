package graft.streaming

import graft.operators.{Chunker, Medallion}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

/** Streaming medallion: the reference's batch DAG run continuously.
  * Bronze cleanup, silver normalization and gold chunking are all
  * stateless (map-only), so they lift to Structured Streaming
  * unchanged; only the cross-row dedup step needs the stateful
  * path (dropDuplicates within the watermark).
  */
object StreamingPipeline {

  /** Raw-zone JSON stream → silver chunks, as one declarative plan. */
  def rawToGold(spark: SparkSession, rawDir: String,
                minContentLength: Int = 50): DataFrame = {
    val raw = spark.readStream
      .schema(graft.sources.Sources.RawPageSchema)
      .json(rawDir)
    val silver = Medallion.silverNormalize(
      Medallion.bronze(raw, "content"), minContentLength)
    Chunker.fixedStride(silver, "content")
  }

  /** Continuous write into the lakehouse gold zone. */
  def sinkParquet(gold: DataFrame, outDir: String, checkpointDir: String): DataStreamWriter[Row] =
    gold.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
}
