package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lexical relevance ranking — the retrieval scorer a RAG stack runs
  * next to (or as a pre-filter for) vector search (reference: the
  * /ask retrieval flow in the README architecture; BM25 per
  * Robertson/Spärck Jones, see PAPERS.md).
  *
  * Scale shape: the corpus is tokenized map-side and immediately
  * filtered to the query terms, so the exploded intermediate carries
  * only matching (doc, term) pairs — O(matches), not O(tokens).
  * Document frequencies aggregate over that reduced set; corpus-level
  * scalars (N, avg doc length) are one tiny partial-agg and join back
  * as a broadcast. Per-term scores are rounded then summed as
  * DECIMAL so the final score is order-independent — identical on
  * any partitioning and in the DuckDB oracle replay.
  */
object Ranking {

  val DefaultTerms: Seq[String] = Seq("spark", "join", "vector", "query")

  /** BM25 top-k documents for a bag of query terms.
    * k1=1.2, b=0.75; idf = ln((N − df + 0.5)/(df + 0.5) + 1). */
  def bm25TopK(docs: DataFrame, terms: Seq[String] = DefaultTerms,
               topK: Int = 20, contentCol: String = "text",
               idCol: String = "doc_id"): DataFrame = {
    val t = docs.select(col(idCol).as("doc_id"), tokens(col(contentCol)).as("tk"))
    val stats = t.agg(count(lit(1)).as("n_docs"),
      avg(size(col("tk"))).as("avg_len"))
    val tf = t
      .select(col("doc_id"), size(col("tk")).cast("long").as("dl"),
        explode(col("tk")).as("w"))
      .where(col("w").isin(terms: _*))
      .groupBy(col("doc_id"), col("w"), col("dl"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    // identical formula/association order to the oracle SQL:
    //   ln((N - df + 0.5)/(df + 0.5) + 1) * (tf*2.2) / (tf + 1.2*(0.25 + 0.75*dl/avg_len))
    val idf = log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val termScore = round(
      idf * (col("tf") * lit(2.2)) /
        (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avg_len"))), 6)
    tf.join(broadcast(df), "w")
      .crossJoin(broadcast(stats))
      .withColumn("term_score", termScore)
      .groupBy(col("doc_id"))
      .agg(sum(col("term_score").cast("decimal(18,6)")).cast("double").as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(topK)
  }

  /** Per-document top-k TF-IDF terms (the classic keyword extractor):
    * tf and df are two partial-aggregating passes over the exploded
    * tokens; df is corpus-wide but only |vocab| rows, so it
    * broadcasts back; the ranking window runs over the already
    * grouped (doc, word, score) set, never the raw tokens. */
  def tfidfTopTerms(docs: DataFrame, minLen: Int = 3, k: Int = 3,
                    contentCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val t = docs.select(col(idCol).as("doc_id"), tokens(lower(col(contentCol))).as("tk"))
    val stats = t.agg(count(lit(1)).as("n_docs"))
    val tf = t.select(col("doc_id"), explode(col("tk")).as("word"))
      .where(length(col("word")) > minLen)
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val score = round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score").desc, col("word"))
    tf.join(broadcast(df), "word")
      .crossJoin(broadcast(stats))
      .withColumn("score", score)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select(col("doc_id"), col("rnk"), col("word"), col("score"))
      .orderBy(col("doc_id"), col("rnk"))
  }
}
