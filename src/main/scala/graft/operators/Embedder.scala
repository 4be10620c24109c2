package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Batched embedding inference — the reference's Embeddings stage
  * (/root/reference/README.md:14: gold chunks are embedded by a
  * model before they land in the vector store). The model itself is
  * external; what belongs to the engine is the BATCH SHAPE around
  * it, and that shape is what this operator makes real:
  *
  *  - `TextEncoder` is the pluggable model boundary: batch of texts
  *    in, one fixed-`dim` vector per text out. A production binding
  *    holds its session `@transient lazy` so each executor JVM
  *    initializes the model once, no matter how many partitions it
  *    processes; the trait stays `Serializable` so the *handle*
  *    ships in the task closure while the weights never do.
  *  - `embed` drives the encoder through ONE `mapPartitions` pass:
  *    rows stream through `grouped(batchSize)` so the model sees
  *    real batches (GPU/ONNX throughput lives or dies on this), and
  *    nothing is ever materialized beyond one batch per partition —
  *    memory is O(batchSize · dim), not O(partition).
  *
  * Scale: map-only (no shuffle, no driver round trip); embedding
  * 100 TB of chunks is exactly as parallel as the chunk table's
  * partitioning. Result vectors are `array<float>` — the same
  * column shape `Tables.embeddings` serves, so every downstream ANN
  * / dedup operator consumes inferred embeddings unchanged.
  *
  * The stub encoder stands in for the model the way Multimodal's
  * fakeDecode stands in for a codec (no model runtime ships in this
  * environment): component `j` of `text` is the engine's portable
  * 48-bit md5 prefix of `"e<j>:<text>"` mod 1000, as a Float
  * (integers < 1000 are float-exact). Deterministic, order-free,
  * and replayable in ANSI SQL — so the end-to-end chunk→embedding
  * query is oracle-checked exactly, not just smoke-tested.
  */
trait TextEncoder extends Serializable {
  def dim: Int

  /** Must return exactly `batch.length` vectors, each of length `dim`. */
  def encode(batch: Seq[String]): Seq[Array[Float]]
}

/** Deterministic model stand-in; see the module doc. Matches
  * `HashFunctions.md5Long(lit("e" + j), text) % 1000` bit-for-bit. */
final case class StubTextEncoder(dim: Int = 8) extends TextEncoder {
  override def encode(batch: Seq[String]): Seq[Array[Float]] = {
    val md = MessageDigest.getInstance("MD5") // one instance per batch call
    batch.map { t =>
      Array.tabulate(dim) { j =>
        md.reset()
        val hex = md.digest(s"e$j:$t".getBytes(StandardCharsets.UTF_8))
          .take(6).map(b => f"${b & 0xff}%02x").mkString
        (java.lang.Long.parseLong(hex, 16) % 1000L).toFloat
      }
    }
  }
}

object Embedder {

  /** Attach an `embedding array<float>` column produced by `encoder`
    * over `textCol`, preserving `keyCols`. One mapPartitions pass,
    * `batchSize` texts per model call, partitioning untouched. */
  def embed(df: DataFrame, textCol: String, keyCols: Seq[String],
            encoder: TextEncoder, batchSize: Int = 64): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive: $batchSize")
    val in = df.select((keyCols :+ textCol).map(col): _*)
    val outSchema = StructType(
      keyCols.map(k => in.schema(k)) :+
        // containsNull=true: byte-compatible with the parquet-served
        // `Tables.embeddings` column, so downstream ops are drop-in
        StructField("embedding", ArrayType(FloatType, containsNull = true)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val nKeys = keyCols.length
    in.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val vecs = encoder.encode(batch.map(_.getString(nKeys)))
        require(vecs.length == batch.length,
          s"encoder returned ${vecs.length} vectors for ${batch.length} texts")
        batch.lazyZip(vecs).map { (r, v) =>
          require(v.length == encoder.dim,
            s"encoder returned dim ${v.length}, declared ${encoder.dim}")
          Row.fromSeq(Seq.tabulate(nKeys)(r.get) :+ v.toIndexedSeq)
        }
      }
    }(enc)
  }

  /** Gold chunks → embeddings end-to-end (the README:14 stage as one
    * query), summarized in exact integer space for the oracle:
    * declared dim, component checksum, and the leading component. */
  def embedChunks(gold: DataFrame, dim: Int = 8, batchSize: Int = 64): DataFrame =
    embed(gold, "chunk", Seq("doc_id", "chunk_idx"), StubTextEncoder(dim), batchSize)
      .select(col("doc_id"), col("chunk_idx"),
        size(col("embedding")).as("emb_dim"),
        aggregate(col("embedding"), lit(0L), (acc, x) => acc + x.cast("long"))
          .as("emb_checksum"),
        element_at(col("embedding"), 1).cast("long").as("emb_head"))
}
