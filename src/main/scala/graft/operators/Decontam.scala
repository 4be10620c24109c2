package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share
  * word-n-gram evidence with a held-out evaluation set — the overlap
  * check every LLM training pipeline runs before a corpus ships.
  *
  * Scale shape: the benchmark side is small by construction (eval
  * sets are thousands of docs, the corpus is billions), so its
  * distinct shingle set broadcasts; the corpus side explodes its
  * shingles map-side and the contamination join is a broadcast hash
  * join — the 100 TB corpus never shuffles. Shingles are 48-bit md5
  * hashes (graft.plans.NativeExprs.HashedShingles), so the broadcast
  * set is 8 bytes per n-gram.
  */
object Decontam {

  /** Corpus docs (id ≥ benchmarkMaxId) that share ≥ 1 distinct
    * n-gram shingle with the benchmark docs (id < benchmarkMaxId),
    * with the overlap count. */
  def flagContaminated(docs: DataFrame, benchmarkMaxId: Long = 20, n: Int = 5,
                       contentCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val sets = Dedup.hashedShingleSets(docs, contentCol, idCol, n)
    val bench = sets.where(col("id") < benchmarkMaxId)
      .select(explode(col("shh")).as("sg")).distinct()
    val corpus = sets.where(col("id") >= benchmarkMaxId)
      .select(col("id").as("doc_id"), explode(col("shh")).as("sg"))
    corpus.join(broadcast(bench), "sg")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
      .orderBy(col("doc_id"))
  }
}
