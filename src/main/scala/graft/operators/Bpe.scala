package graft.operators

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE tokenizer TRAINING — the multi-round merge loop, distributed
  * (`txt_bpe_pairs` is one round of pair counting; this is the
  * trainer that consumes it). Sennrich et al.'s algorithm, shaped
  * for a 100 TB corpus:
  *
  *  - the corpus is tokenized ONCE into a (word, freq) vocabulary
  *    and never touched again — every merge round runs over the
  *    vocabulary, which is orders of magnitude smaller than the
  *    corpus (the standard trainer optimization); the vocab is
  *    eagerly localCheckpoint'ed so round r never re-derives rounds
  *    1..r-1 lazily from the corpus;
  *  - each round: adjacent symbol pairs explode out of the symbol
  *    sequences, counts aggregate weighted by word frequency
  *    (partial map-side combine), and exactly ONE row — the winning
  *    pair — reaches the driver; ties break (count desc, left asc,
  *    right asc) so training is deterministic on any partitioning;
  *  - the merge applies map-side as a literal string replace over
  *    `|`-wrapped symbol sequences (`|a||b|` → `|ab|`): wrapped
  *    symbols never share delimiter characters, so replace-all is
  *    exactly the canonical merge-ALL-occurrences step, identically
  *    in Spark and the DuckDB oracle replay.
  *
  * Words are restricted to lowercase letter runs so the `|`
  * delimiter cannot collide with symbol text. */
object Bpe {

  /** The shared training loop: returns the merge log AND the final
    * vocabulary (w, freq, seq) it produced — one implementation
    * behind the trainer and the segmentation stats, so the
    * compression number is always measured against the merges the
    * trainer actually learned. */
  private def trainLoop(docs: DataFrame, nMerges: Int, contentCol: String)
      : (Seq[(Long, String, String, String, Long)], DataFrame) = {
    val vocab0 = docs
      .select(explode(tokens(lower(col(contentCol)))).as("w"))
      .where(col("w").rlike("^[a-z]+$"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .withColumn("seq", regexp_replace(col("w"), "(.)", "|$1|"))
      .localCheckpoint(true) // corpus touched once; rounds run on the vocab
    var vocab = vocab0
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, String, Long)]
    (1 to nMerges).foreach { step =>
      val tk = split(expr("trim(BOTH '|' FROM seq)"), "\\|\\|")
      val withTk = vocab.select(col("freq"), tk.as("tk")).where(size(col("tk")) >= 2)
      val top = withTk.select(col("freq"),
        explode(zip_with(
          slice(col("tk"), lit(1), size(col("tk")) - 1),
          slice(col("tk"), lit(2), size(col("tk")) - 1),
          (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.nonEmpty) {
        val (a, b, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((step.toLong, a, b, a + b, n))
        vocab = vocab.withColumn("seq",
          expr(s"replace(seq, '|$a||$b|', '|$a$b|')"))
      }
    }
    (merges.toSeq, vocab)
  }

  /** The merge table (step, left, right, merged, n) — the artifact a
    * tokenizer ships. */
  def bpeTrain(docs: DataFrame, nMerges: Int = 4,
               contentCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    trainLoop(docs, nMerges, contentCol)._1
      .toDF("step", "left", "right", "merged", "n")
  }

  /** Segmentation quality of the trained merges: symbols per corpus
    * before (characters) vs after (BPE tokens), the compression
    * number a tokenizer is judged by. One aggregate over the final
    * vocabulary; corpus still touched exactly once. */
  def bpeSegmentStats(docs: DataFrame, nMerges: Int = 4,
                      contentCol: String = "text"): DataFrame = {
    val (_, vocab) = trainLoop(docs, nMerges, contentCol)
    val ntok = size(split(expr("trim(BOTH '|' FROM seq)"), "\\|\\|")).cast("long")
    vocab.agg(
      count(lit(1)).as("n_word_types"),
      sum(col("freq")).as("n_words"),
      sum(col("freq") * length(col("w"))).as("sym_before"),
      sum(col("freq") * ntok).as("sym_after"))
      .select(col("n_word_types"), col("n_words"), col("sym_before"), col("sym_after"),
        round(col("sym_after").cast("double") / col("sym_before"), 6).as("compression"))
  }
}
