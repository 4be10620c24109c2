package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's bronze → silver → gold medallion pipeline,
  * re-expressed as narrow Spark transforms.
  *
  * Reference semantics: airflow/dags/etl.py — bronze (:94-105) trims
  * and filters raw content; silver (:150-196) normalizes text,
  * applies a min-length filter and keeps the first row per key;
  * gold (:201-239) explodes content into overlapping chunks.
  *
  * Scale notes: bronze and silver-normalize are map-only (zero
  * shuffle — they scale linearly with input splits). The dedup is
  * the single shuffle in the pipeline (hash-partition by the dedup
  * key). Chunking is again map-only; one input row fans out to
  * ceil(len/stride) rows without any exchange.
  */
object Medallion {

  /** Bronze: trim, drop null/empty content, stamp length.
    * (processed_at is stamped by `withIngestTime` separately so the
    * core transform stays deterministic and testable.) */
  def bronze(raw: DataFrame, contentCol: String = "text"): DataFrame = {
    val cleaned = raw
      .withColumn("content", trim(col(contentCol)))
      .where(col("content").isNotNull && length(col("content")) > 0)
      .withColumn("content_length", length(col("content")).cast("long"))
    if (contentCol == "content") cleaned else cleaned.drop(contentCol)
  }

  def withIngestTime(df: DataFrame): DataFrame =
    df.withColumn("processed_at", current_timestamp())

  /** INCREMENTAL silver maintenance — the lakehouse pattern that
    * replaces full recomputes: drain the bronze Delta table's change
    * feed past a checkpointed cursor and fold each commit's rows
    * through normalize + MERGE into the silver Delta table. Because
    * normalize is per-row and MERGE is keyed on doc_id, the
    * incremental result is IDENTICAL to rebuilding silver from the
    * full bronze snapshot (oracle-verified by
    * `pipe_incremental_silver`). Restart-safe: the cursor is
    * persisted after each commit, so a crashed consumer resumes at
    * exactly the unseen commits; replaying a commit is idempotent
    * (same keys merge to the same rows).
    *
    * Scale: each drained commit touches only ITS rows plus the
    * silver files that provably hold matching keys (mergeDelta's
    * semi-join on input_file_name) — cost tracks the delta, never
    * the table. */
  def incrementalSilver(spark: org.apache.spark.sql.SparkSession, bronzeTable: String,
                        silverTable: String, checkpointDir: String): Option[Long] =
    graft.sources.DeltaSource.followChangesCheckpointed(
      spark, bronzeTable, checkpointDir) { (_, batch) =>
      val upd = silverNormalize(batch.drop("_commit_version"))
        .select(col("doc_id"), col("source"), col("content"), col("content_length"))
      if (graft.sources.DeltaSource.latestVersion(spark, silverTable).isEmpty)
        graft.sources.DeltaSource.writeDelta(upd, silverTable)
      else if (!upd.isEmpty)
        graft.sources.DeltaSource.mergeDelta(spark, silverTable, upd, Seq("doc_id"))
    }

  /** Silver step 1: normalize content (strip → lower → collapse ws →
    * trim) and re-apply the min-length gate. */
  def silverNormalize(bronze: DataFrame, minContentLength: Int = 50): DataFrame =
    bronze
      .withColumn("content", normalizeText(col("content")))
      .withColumn("content_length", length(col("content")).cast("long"))
      .where(col("content_length") > minContentLength)

  /** Silver step 2: keep the first row per key (reference keeps the
    * earliest scrape per url; here the lowest tiebreaker per key).
    * One hash shuffle on the dedup key. */
  def silverDedup(df: DataFrame, key: String = "content", tiebreak: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(tiebreak))
    df.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_rn")
  }

  /** Gold: chunk-explode the deduplicated silver content. */
  def gold(silver: DataFrame, chunkSize: Int = 200, overlap: Int = 10): DataFrame =
    Chunker.fixedStride(silver, "content", chunkSize, overlap)

  /** The full pipeline, composed. */
  def pipeline(raw: DataFrame, contentCol: String = "text",
               minContentLength: Int = 50, chunkSize: Int = 200, overlap: Int = 10): DataFrame =
    gold(silverDedup(silverNormalize(bronze(raw, contentCol), minContentLength)), chunkSize, overlap)

  /** MERGE/upsert semantics without a table format: rows in `updates`
    * replace same-key rows in `existing`; new keys append. Each side
    * must be key-unique (the usual CDC contract). One hash shuffle on
    * the key; on a bucketed zone the exchange disappears entirely.
    * The delta-rs writer in the reference gets this from Delta — here
    * it is a window over the union, which any engine can replay. */
  def upsertByKey(existing: DataFrame, updates: DataFrame,
                  key: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col("is_update").desc)
    existing.withColumn("is_update", lit(0))
      .unionByName(updates.withColumn("is_update", lit(1)))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .drop("rn")
  }
}
