package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text chunking for RAG ingestion (reference: airflow/dags/etl.py
  * :201-214 — RecursiveCharacterTextSplitter(chunk_size=200,
  * chunk_overlap=10) + pandas explode).
  *
  * Two implementations:
  *  - `fixedStride`: deterministic fixed-window chunks with overlap,
  *    a pure `sequence` + `posexplode` plan (map-only, codegen'd,
  *    SQL-oracle-expressible).
  *  - `recursive`: reference-faithful recursive splitting
  *    (paragraph → sentence → word fallback) as a typed flatMap.
  */
object Chunker {

  /** Number of chunks for a text of length `len` with stride s:
    * floor((len-1)/s) + 1 (len > 0 guaranteed upstream). */
  def chunkStarts(len: Column, stride: Int): Column =
    sequence(lit(0L), floor((len - 1) / stride).cast("long"))

  /** Fixed-stride overlapping chunks: chunk i = substr(i*stride + 1,
    * size), stride = size - overlap. Map-only fan-out — one row in,
    * ceil(len/stride) rows out, no shuffle. */
  def fixedStride(df: DataFrame, contentCol: String,
                  size: Int = 200, overlap: Int = 10): DataFrame = {
    val stride = size - overlap
    require(stride > 0, "chunk size must exceed overlap")
    df
      .withColumn("chunk_idx", explode(chunkStarts(length(col(contentCol)), stride)))
      .withColumn("chunk", substring_index_safe(col(contentCol), col("chunk_idx"), stride, size))
      .withColumn("chunk_length", length(col("chunk")).cast("long"))
  }

  private def substring_index_safe(c: Column, idx: Column, stride: Int, size: Int): Column =
    substring(c, (idx * stride + 1).cast("int"), lit(size))

  /** Gold-zone integrity audit: per doc, count chunks violating the
    * overlap contract (a full chunk's last `overlap` chars must
    * reopen the next chunk) or the size bound. An ETL regression —
    * wrong stride, re-chunk with different params, truncation —
    * shows up here as nonzero counts instead of silently degraded
    * retrieval. One doc-hash shuffle for the lag window. */
  def overlapAudit(gold: DataFrame, size: Int = 200, overlap: Int = 10): DataFrame = {
    val stride = size - overlap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("chunk_idx"))
    gold.select(col("doc_id"), col("chunk_idx"), col("chunk"))
      .withColumn("prev", lag(col("chunk"), 1).over(w))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("prev").isNotNull && length(col("prev")) === size &&
          substring(col("prev"), stride + 1, overlap) =!= substring(col("chunk"), 1, overlap),
          1L).otherwise(0L)).as("n_overlap_viol"),
        sum(when(length(col("chunk")) > size, 1L).otherwise(0L)).as("n_oversize"))
      .orderBy(col("doc_id"))
  }

  /** Reference-faithful recursive character splitter: try paragraph
    * separators first, fall back to sentence then word boundaries,
    * greedily packing pieces up to `size` chars with `overlap` carry.
    * Runs as a typed flatMap over rows (per-partition, distributed;
    * no state crosses rows).
    */
  def splitRecursive(text: String, size: Int = 200, overlap: Int = 10): Seq[String] = {
    val seps = Seq("\n\n", "\n", ". ", " ")
    def split(t: String, sepIdx: Int): Seq[String] =
      if (t.length <= size) Seq(t)
      else if (sepIdx >= seps.length) t.grouped(size).toSeq
      else {
        val parts = t.split(java.util.regex.Pattern.quote(seps(sepIdx)), -1).toSeq
        if (parts.length == 1) split(t, sepIdx + 1)
        else {
          // greedy re-pack: merge consecutive parts while <= size
          val sep = seps(sepIdx)
          val packed = parts.foldLeft(Vector.empty[String]) { (acc, p) =>
            acc.lastOption match {
              case Some(last) if last.length + sep.length + p.length <= size =>
                acc.init :+ (last + sep + p)
              case _ => acc :+ p
            }
          }
          packed.flatMap(p => if (p.length <= size) Seq(p) else split(p, sepIdx + 1))
        }
      }
    val chunks = split(text, 0).filter(_.nonEmpty)
    // carry `overlap` trailing chars of the previous chunk forward
    if (overlap <= 0) chunks
    else chunks.zipWithIndex.map { case (c, i) =>
      if (i == 0) c
      else chunks(i - 1).takeRight(overlap) + c
    }
  }

  /** DataFrame wrapper for the recursive splitter. */
  /** Pack chunks into fixed-token-budget training blocks: a running
    * token count per source assigns each chunk to
    * `floor(preceding_tokens / blockTokens)` — greedy packing in
    * (doc_id, chunk_idx) order, the shape a pretraining data loader
    * consumes. The window partitions by source, so each source packs
    * independently across the cluster — no global sort; at 100 TB
    * you partition by (source, date) shard keys the same way. */
  def packSequences(chunks: DataFrame, blockTokens: Int = 512): DataFrame = {
    import graft.functions.TextFunctions.tokenCount
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"), col("chunk_idx"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    chunks
      .select(col("source"), col("doc_id"), col("chunk_idx"),
        tokenCount(col("chunk")).as("n_tok"))
      .withColumn("cum_tok", sum(col("n_tok")).over(w))
      .withColumn("block_id",
        floor((col("cum_tok") - col("n_tok")) / lit(blockTokens)).cast("long"))
      .groupBy(col("source"), col("block_id"))
      .agg(count(lit(1)).as("n_chunks"),
        countDistinct(col("doc_id")).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"))
      .orderBy(col("source"), col("block_id"))
  }

  /** DataFrame form of the recursive splitter, via the native
    * `RecursiveSplit` Catalyst expression (codegen'd; no ScalaUDF —
    * the explode's parent project stays in WholeStageCodegen). */
  def recursive(df: DataFrame, contentCol: String,
                size: Int = 200, overlap: Int = 10): DataFrame =
    df.withColumn("chunk",
        explode(graft.plans.NativeExprs.recursiveSplit(col(contentCol), size, overlap)))
      .withColumn("chunk_length", length(col("chunk")).cast("long"))
}
