package graft

import graft.functions.HashFunctions
import graft.operators.{Embedder, Medallion, StubTextEncoder, TextEncoder}
import org.apache.spark.sql.functions._

import java.util.concurrent.ConcurrentLinkedQueue

/** Records every batch it is handed (local mode: one shared JVM). */
class RecordingEncoder(val dim: Int) extends TextEncoder {
  override def encode(batch: Seq[String]): Seq[Array[Float]] = {
    RecordingEncoder.batches.add(batch.length)
    batch.map(_ => Array.fill(dim)(1.0f))
  }
}
object RecordingEncoder {
  val batches = new ConcurrentLinkedQueue[Integer]()
}

/** Batched embedding inference: the pluggable-encoder boundary, the
  * one-pass batch shape, and the stub encoder's SQL replayability. */
class EmbedderSpec extends SparkSpec {
  import spark.implicits._

  private def gold() =
    Medallion.pipeline(Tables.documents(spark, sf))
      .select(col("doc_id"), col("chunk_idx"), col("chunk"))

  test("stub encoder matches the engine's portable md5 formula component-wise") {
    val out = Embedder.embed(gold(), "chunk", Seq("doc_id", "chunk_idx"), StubTextEncoder(4))
    val viaSql = gold().select(col("doc_id"), col("chunk_idx"),
      array((0 until 4).map(j =>
        (HashFunctions.md5Long(concat(lit(s"e$j:"), col("chunk"))) % 1000)
          .cast("float")): _*).as("embedding"))
    assert(out.exceptAll(viaSql).isEmpty && viaSql.exceptAll(out).isEmpty)
  }

  test("batch size never changes the result (model boundary is pure per-text)") {
    val byOne = Embedder.embed(gold(), "chunk", Seq("doc_id", "chunk_idx"),
      StubTextEncoder(8), batchSize = 1)
    val by64 = Embedder.embed(gold(), "chunk", Seq("doc_id", "chunk_idx"),
      StubTextEncoder(8), batchSize = 64)
    assert(byOne.exceptAll(by64).isEmpty && by64.exceptAll(byOne).isEmpty)
  }

  test("encoder sees real batches: every call but the per-partition tail is full") {
    RecordingEncoder.batches.clear()
    val n = Embedder.embed(gold().repartition(2), "chunk",
      Seq("doc_id", "chunk_idx"), new RecordingEncoder(2), batchSize = 16).count()
    val sizes = {
      val it = RecordingEncoder.batches.iterator(); val b = Seq.newBuilder[Int]
      while (it.hasNext) b += it.next().intValue(); b.result()
    }
    assert(sizes.sum == n)
    // 2 partitions → at most 2 short tail batches; everything else is full
    assert(sizes.count(_ < 16) <= 2)
    assert(sizes.count(_ == 16) >= (n.toInt / 16) - 2)
  }

  test("map-only: partitioning is preserved, no shuffle in the plan") {
    val in = gold().repartition(5)
    val out = Embedder.embed(in, "chunk", Seq("doc_id", "chunk_idx"), StubTextEncoder(2))
    assert(out.rdd.getNumPartitions == 5)
    // embed adds ZERO exchanges over whatever the input plan already had
    val before = "Exchange".r.findAllIn(in.queryExecution.executedPlan.toString()).size
    val after = "Exchange".r.findAllIn(out.queryExecution.executedPlan.toString()).size
    assert(after == before)
  }

  test("a misdeclared encoder dim fails loudly, not silently") {
    val bad = new TextEncoder {
      val dim = 3
      def encode(b: Seq[String]): Seq[Array[Float]] = b.map(_ => Array(1.0f))
    }
    val ex = intercept[org.apache.spark.SparkException] {
      Embedder.embed(gold(), "chunk", Seq("doc_id"), bad).count()
    }
    assert(ex.getMessage != null)
  }

  test("embedChunks output is the inferred-embedding summary in exact integer space") {
    val out = Embedder.embedChunks(gold()).orderBy(col("doc_id"), col("chunk_idx"))
    val row = out.head()
    assert(out.columns.toSeq ==
      Seq("doc_id", "chunk_idx", "emb_dim", "emb_checksum", "emb_head"))
    assert(row.getAs[Int]("emb_dim") == 8)
    assert(row.getAs[Long]("emb_checksum") >= 0L && row.getAs[Long]("emb_head") < 1000L)
    // downstream-compatible vector shape: same column type as Tables.embeddings
    val vec = Embedder.embed(gold(), "chunk", Seq("doc_id"), StubTextEncoder(8))
    assert(vec.schema("embedding").dataType ==
      Tables.embeddings(spark, sf).schema("embedding").dataType)
  }

  test("streaming inference: chunk stream -> encoder -> exactly-once zone -> incremental index") {
    import graft.sources.{AnnIndex, DeltaSource}
    import graft.streaming.StreamingPipeline
    val spark2 = spark
    import spark2.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_embstream").toString
    val chunksTbl = s"$root/chunks"
    val zone = s"$root/embzone"
    // two commits of chunks -> two bounded micro-batches
    val texts = (0 until 40).map(i => (i.toLong, s"chunk number $i with some text"))
    DeltaSource.writeDelta(texts.take(25).toDF("chunk_id", "chunk"), chunksTbl)
    DeltaSource.writeDelta(texts.drop(25).toDF("chunk_id", "chunk"), chunksTbl,
      overwrite = false)
    val stream = spark.readStream.format("graft-delta")
      .option("maxCommitsPerBatch", "1").load(chunksTbl)
    val q = StreamingPipeline.embedToZone(stream, StubTextEncoder(8),
      "chunk", Seq("chunk_id"), s"$root/ckpt").start(zone)
    assert(q.awaitTermination(120000))
    // the zone equals the batch operator over the full table
    val streamed = DeltaSource.readDelta(spark, zone)
      .select(col("chunk_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toMap
    val batch = Embedder.embed(texts.toDF("chunk_id", "chunk"),
      "chunk", Seq("chunk_id"), StubTextEncoder(8))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toMap
    assert(streamed == batch, "streamed zone must equal the batch computation")
    // continuous index maintenance: build on batch 0's vectors, then
    // append batch 1's from the zone change feed
    val ixDir = s"$root/annix"
    val zoneEmb = DeltaSource.readDelta(spark, zone)
      .select(col("chunk_id").as("vec_id"), col("embedding"))
    AnnIndex.buildAndSave(zoneEmb.where(col("vec_id") < 25), ixDir)
    assert(AnnIndex.appendIncremental(zoneEmb.where(col("vec_id") >= 25), ixDir,
      incrementId = Some("batch-1")))
    val covered = spark.read.parquet(s"$ixDir/codes")
      .select(col("id")).distinct().count()
    assert(covered == 40, s"index must cover every streamed chunk, got $covered")
  }
}
