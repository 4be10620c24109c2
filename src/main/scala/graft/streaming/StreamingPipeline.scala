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

  /** Stream enriched against the versioned zone's LATEST committed
    * snapshot, re-resolved per micro-batch. A plain stream-static
    * join pins the files it saw at planning time — new snapshot
    * versions (new directories) are invisible to it — so the
    * re-resolution happens in foreachBatch, where each batch freshly
    * reads `latestVersion`. The dimension snapshot broadcasts (it's
    * the small side by contract); rows with no match keep NULL
    * enrichment (left join) rather than silently dropping. */
  def enrichFromLatestSnapshot(stream: DataFrame, zonePath: String,
                               checkpointDir: String, key: String,
                               enrichCols: Seq[String])
                              (out: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import org.apache.spark.sql.functions.{broadcast, col}
        val spark = batch.sparkSession
        val dim = graft.sources.VersionedZone.read(spark, zonePath)
          .select((key +: enrichCols).map(col).toIndexedSeq: _*)
        out(batch.join(broadcast(dim), Seq(key), "left"), batchId)
        ()
      }
}
