package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the CCNet/Gopher-style pipeline
  * assembled from the engine's own stages, reported as a funnel.
  *
  * language-ID → quality rules → repetition filters → exact dedup,
  * each stage a composition of the individually-oracled operators —
  * the numbers a curation run reports ("started with N docs / M
  * tokens, kept K") fall out as one DataFrame.
  *
  * Scale shape: stages 0–2 are pure map-side predicates (they fuse
  * into one scan pass under whole-stage codegen); repetition adds
  * its two per-doc aggregations over the SURVIVORS only; dedup is
  * one hash-window over the remaining rows. Filters run cheapest-
  * first, so each stage sees only what the previous one kept. */
object Curation {

  def funnel(docs: DataFrame, contentCol: String = "text"): DataFrame = {
    val s0 = docs.select(col("doc_id"), col(contentCol).as("text"))
    val s1 = s0.where(langId(col("text")) === "en")
    val s2 = s1.where(Quality.gopherKeepExpr("text"))
    val repKeep = Quality.repetition(s2, "text").where(col("keep") === 1)
      .select(col("doc_id"))
    val s3 = s2.join(repKeep, Seq("doc_id"), "left_semi")
    val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    val s4 = s3.withColumn("rn", row_number().over(w)).where(col("rn") === 1).drop("rn")
    def stage(i: Long, name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n_docs"),
          sum(tokenCount(col("text"))).as("n_tokens"))
        .select(lit(i).as("stage"), lit(name).as("name"),
          col("n_docs"), col("n_tokens"))
    Seq(stage(0, "raw", s0), stage(1, "langid", s1), stage(2, "gopher", s2),
        stage(3, "repetition", s3), stage(4, "dedup", s4))
      .reduce(_ unionByName _)
      .orderBy(col("stage"))
  }
}
