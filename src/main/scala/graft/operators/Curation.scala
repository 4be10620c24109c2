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
    // one pass computes every per-doc stage flag; the five stage
    // rows then fall out of a SINGLE conditional aggregation —
    // a per-stage re-filter would rescan (and re-predicate) the
    // corpus five times, with stage i redoing stages 1..i−1's work
    val base = docs.select(col("doc_id"), col(contentCol).as("text"),
        tokenCount(col(contentCol)).as("n_tok"))
      .withColumn("f1", (langId(col("text")) === "en").cast("int"))
      .withColumn("f2", (col("f1") === 1 &&
        Quality.gopherKeepExpr("text")).cast("int"))
    // repetition metrics only over the gopher survivors (its explode
    // + two aggregations are the expensive part of the pipeline)
    val repKeep = Quality.repetition(base.where(col("f2") === 1), "text")
      .where(col("keep") === 1).select(col("doc_id"), lit(1).as("rk"))
    val w = Window.partitionBy(md5(col("text")))
      .orderBy(col("f3").desc, col("doc_id"))
    val flagged = base.join(repKeep, Seq("doc_id"), "left")
      .withColumn("f3", when(col("f2") === 1 && col("rk") === 1, 1).otherwise(0))
      .withColumn("f4",
        when(col("f3") === 1 && row_number().over(w) === 1, 1).otherwise(0))
    val agg = flagged.agg(
      count(lit(1)).as("d0"), sum(col("n_tok")).as("t0"),
      sum(col("f1")).as("d1"), sum(col("f1") * col("n_tok")).as("t1"),
      sum(col("f2")).as("d2"), sum(col("f2") * col("n_tok")).as("t2"),
      sum(col("f3")).as("d3"), sum(col("f3") * col("n_tok")).as("t3"),
      sum(col("f4")).as("d4"), sum(col("f4") * col("n_tok")).as("t4"))
    // the 5 stage rows explode out of the ONE aggregate row — a
    // union of per-stage projections would re-run the whole funnel
    // per stage (no subplan reuse across union branches)
    val stages = array(
      Seq(("0", "raw"), ("1", "langid"), ("2", "gopher"),
          ("3", "repetition"), ("4", "dedup")).map { case (i, name) =>
        // an empty stage reports NULL tokens (sum over no rows), not
        // the conditional-sum's 0 — matching the per-stage oracle
        struct(lit(i.toLong).as("stage"), lit(name).as("name"),
          col(s"d$i").as("n_docs"),
          when(col(s"d$i") > 0, col(s"t$i")).cast("long").as("n_tokens"))
      }: _*)
    agg.select(explode(stages).as("s"))
      .select(col("s.stage").as("stage"), col("s.name").as("name"),
        col("s.n_docs").as("n_docs"), col("s.n_tokens").as("n_tokens"))
      .orderBy(col("stage"))
  }
}
