package graft.operators

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Unigram-LM tokenizer TRAINING (Kudo 2018, the SentencePiece
  * algorithm) — the other real subword tokenizer next to BPE
  * (operators/Bpe.scala), shaped the same way for a 100 TB corpus:
  *
  *  - the corpus is tokenized ONCE into a (word, freq) vocabulary
  *    (one partial-agg shuffle) and never touched again; training
  *    runs over the vocabulary, orders of magnitude smaller;
  *  - the seed piece inventory is every substring of length
  *    1..maxPieceLen with corpus-weighted occurrence count ≥
  *    minCount (single characters always kept, so every word stays
  *    segmentable — SentencePiece's character-coverage rule);
  *  - EM is the hard-EM (Viterbi) variant: the E-step segments each
  *    word type with the current piece costs, the M-step
  *    re-estimates Laplace-smoothed piece probabilities from the
  *    winning segmentations (zero-count multi-character pieces are
  *    pruned; characters survive). Hard EM keeps every step exactly
  *    replayable — costs are 6-dp DECIMAL literals, path sums are
  *    exact decimal sums, and ties break on the segmentation string
  *    itself — so the DuckDB oracle replays the trainer CTE-for-CTE
  *    (a recursive CTE enumerates the same path space);
  *  - the Viterbi DP never leaves the cluster and never shuffles
  *    per-path: each extension round is a BROADCAST join of the
  *    model-sized cost table against the path frontier — 12 narrow
  *    rounds fuse into one stage — and only the terminal min-per-word
  *    aggregation exchanges. Path count per word is bounded by the
  *    tetranacci composition count (≤ 1490 at maxWordLen = 12), and
  *    in practice far lower because only frequent substrings are in
  *    the inventory; the frontier is O(word types · paths), i.e.
  *    vocabulary-scale, at any corpus size.
  *
  * Words are lowercase letter runs (the Bpe.scala convention) capped
  * at maxWordLen characters — the trainer's word-length cap, the
  * moral twin of SentencePiece's max sentence length. */
object Unigram {

  /** One Viterbi E-step: the best segmentation of every word type
    * under `costs` (piece, pcost DECIMAL(18,6)). Ties break on
    * (cost, path string) so the result is independent of
    * partitioning and engine. */
  private def bestPaths(wf: DataFrame, costs: DataFrame,
                        maxWordLen: Int, maxPieceLen: Int): DataFrame = {
    val init = wf.select(col("w"), col("freq"),
      lit(0).as("pos"),
      lit(0).cast("decimal(18,6)").as("cost"),
      lit("").as("path"))
    var frontier = init
    val terminals = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    for (_ <- 1 to maxWordLen) {
      val ext = frontier
        .select(col("w"), col("freq"), col("pos"), col("cost"), col("path"),
          explode(array((1 to maxPieceLen).map(lit(_)): _*)).as("l"))
        .where(col("pos") + col("l") <= length(col("w")))
        .withColumn("piece", expr("substring(w, pos + 1, l)"))
        .join(broadcast(costs), Seq("piece"))
        .select(col("w"), col("freq"),
          (col("pos") + col("l")).as("pos"),
          (col("cost") + col("pcost")).cast("decimal(18,6)").as("cost"),
          concat(col("path"), lit(" "), col("piece")).as("path"))
      terminals += ext.where(col("pos") === length(col("w")))
      frontier = ext.where(col("pos") < length(col("w")))
    }
    terminals.reduce(_.unionByName(_))
      .groupBy(col("w"))
      .agg(min(struct(col("cost"), col("path"), col("freq"))).as("m"))
      .select(col("w"), col("m.freq").as("freq"), col("m.cost").as("cost"),
        ltrim(col("m.path")).as("path"))
  }

  /** E-step counts: corpus-weighted piece occurrences in the winning
    * segmentations. */
  private def pieceCounts(winners: DataFrame): DataFrame =
    winners.select(col("freq"), explode(split(col("path"), " ")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))

  /** M-step: keep counted pieces plus every single character,
    * Laplace-smooth over the kept inventory, emit 6-dp decimal
    * costs. Returns (piece, cnt, pcost). */
  private def mstep(chars: DataFrame, counts: DataFrame): DataFrame = {
    val kept = chars.select(col("piece"))
      .unionByName(counts.select(col("piece"))).distinct()
      .join(counts, Seq("piece"), "left")
      .na.fill(0L, Seq("cnt"))
    val tv = kept.agg(sum(col("cnt")).as("t"), count(lit(1)).as("v"))
    kept.crossJoin(broadcast(tv))
      .select(col("piece"), col("cnt"),
        round(-log((col("cnt") + lit(1)).cast("double") / (col("t") + col("v"))), 6)
          .cast("decimal(18,6)").as("pcost"))
  }

  /** The shared training chain. Returns (finalModel(piece, cnt,
    * logprob), winners2(w, freq, cost, path)) — the piece table a
    * tokenizer ships, and the final segmentation of the vocabulary.
    * Every intermediate is model-sized and eagerly pinned so neither
    * EM iteration re-derives the other lazily. */
  private def trainChain(docs: DataFrame, contentCol: String,
                         maxWordLen: Int, maxPieceLen: Int, minCount: Long)
      : (DataFrame, DataFrame) = {
    val wf = docs
      .select(explode(tokens(lower(col(contentCol)))).as("w"))
      .where(col("w").rlike("^[a-z]+$") && length(col("w")) <= maxWordLen)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .localCheckpoint(true) // corpus touched once; EM runs on the vocab
    // seed inventory: all substrings, weighted occurrence counts
    val occ = wf
      .select(col("w"), col("freq"),
        explode(expr("sequence(1, length(w))")).as("i"))
      .select(col("freq"),
        explode(array((1 to maxPieceLen).map(l =>
          expr(s"case when i + $l - 1 <= length(w) then substring(w, i, $l) end")): _*))
          .as("piece"))
      .where(col("piece").isNotNull)
      .groupBy(col("piece")).agg(sum(col("freq")).as("occ"))
    val seed = occ.where(length(col("piece")) === 1 || col("occ") >= minCount)
      .localCheckpoint(true)
    val chars = seed.where(length(col("piece")) === 1).select(col("piece"))
    val tot0 = seed.agg(sum(col("occ")).as("t"))
    val costs1 = seed.crossJoin(broadcast(tot0))
      .select(col("piece"),
        round(-log(col("occ").cast("double") / col("t")), 6)
          .cast("decimal(18,6)").as("pcost"))
      .localCheckpoint(true)
    val winners1 = bestPaths(wf, costs1, maxWordLen, maxPieceLen).localCheckpoint(true)
    val model1 = mstep(chars, pieceCounts(winners1)).localCheckpoint(true)
    val winners2 = bestPaths(wf, model1.select(col("piece"), col("pcost")),
      maxWordLen, maxPieceLen).localCheckpoint(true)
    val model2raw = mstep(chars, pieceCounts(winners2))
    val tv2 = model2raw.agg(sum(col("cnt")).as("t"), count(lit(1)).as("v"))
    val model2 = model2raw.crossJoin(broadcast(tv2))
      .select(col("piece"), col("cnt"),
        round(log((col("cnt") + lit(1)).cast("double") / (col("t") + col("v"))), 4)
          .as("logprob"))
    (model2, winners2)
  }

  /** One trained chain per (app, corpus, plan, params) — `unigramTrain`
    * and `unigramSegmentStats` are two views of the SAME EM run, so a
    * pipeline invoking both must pay training once, not twice. The
    * memo key is the ZoneCache corpus fingerprint (any file added/
    * removed/rewritten flips it) plus the canonicalized plan hash
    * (two different filters over the same files must not collide)
    * plus the training params; values are model-sized and pinned.
    * In-memory DataFrames have no file listing to fingerprint, so
    * they train fresh every call (specs stay isolated). The memo is
    * in-JVM rather than on-disk: the model is KB-sized and one
    * vocab-job to rebuild, so cross-application persistence would
    * save less than its format surface costs. */
  /** The memo stores COLLECTED rows + schema, not DataFrames: a
    * cached frame would pin localCheckpoint blocks that any
    * cache-hygiene sweep (`getPersistentRDDs...unpersist`, e.g. the
    * Bench loop's per-query sweep) silently destroys, after which
    * the memoized frame throws on next use (the round-9 bench
    * failure). Rows live on the driver heap — model-sized (the piece
    * table and per-word-type winners, KBs–MBs) — and every call
    * rebuilds a fresh LocalRelation, immune to block eviction and to
    * lost executors. Access-ordered and capped: an evolving corpus
    * in a long-lived session keeps only the freshest trainings, and
    * eviction is plain GC (nothing pinned to unpersist). */
  private val chainCacheCap = 4
  private val chainCache =
    new java.util.LinkedHashMap[String, ((StructType, Array[Row]), (StructType, Array[Row]))](
      8, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, ((StructType, Array[Row]), (StructType, Array[Row]))])
        : Boolean = size > chainCacheCap
    }

  private def trainChainCached(docs: DataFrame, contentCol: String,
                               maxWordLen: Int, maxPieceLen: Int, minCount: Long)
      : (DataFrame, DataFrame) = {
    if (docs.inputFiles.isEmpty)
      trainChain(docs, contentCol, maxWordLen, maxPieceLen, minCount)
    else {
      val spark = docs.sparkSession
      val key = Seq(
        spark.sparkContext.applicationId,
        graft.sources.ZoneCache.corpusFingerprint(docs),
        docs.queryExecution.analyzed.canonicalized.semanticHash().toString,
        contentCol, maxWordLen, maxPieceLen, minCount).mkString("|")
      val ((mSchema, mRows), (wSchema, wRows)) = chainCache.synchronized {
        val hit = chainCache.get(key)
        if (hit != null) hit
        else {
          val (model, winners) =
            trainChain(docs, contentCol, maxWordLen, maxPieceLen, minCount)
          val v = ((model.schema, model.collect()), (winners.schema, winners.collect()))
          chainCache.put(key, v)
          v
        }
      }
      (spark.createDataFrame(java.util.Arrays.asList(mRows: _*), mSchema),
       spark.createDataFrame(java.util.Arrays.asList(wRows: _*), wSchema))
    }
  }

  /** The trained piece table — top multi-character pieces by final
    * EM count (ties on the piece string), with their Laplace
    * log-probabilities. The artifact a unigram tokenizer ships. */
  def unigramTrain(docs: DataFrame, contentCol: String = "text",
                   maxWordLen: Int = 12, maxPieceLen: Int = 4,
                   minCount: Long = 100L, topK: Int = 40): DataFrame = {
    val (model, _) = trainChainCached(docs, contentCol, maxWordLen, maxPieceLen, minCount)
    model.where(length(col("piece")) >= 2)
      .select(col("piece"), col("cnt").as("n"), col("logprob"))
      .orderBy(col("n").desc, col("piece"))
      .limit(topK)
  }

  /** What the trained model buys: the distribution of
    * pieces-per-word over the corpus under the final segmentation —
    * the unigram twin of Bpe.bpeSegmentStats. */
  def unigramSegmentStats(docs: DataFrame, contentCol: String = "text",
                          maxWordLen: Int = 12, maxPieceLen: Int = 4,
                          minCount: Long = 100L): DataFrame = {
    val (_, winners) = trainChainCached(docs, contentCol, maxWordLen, maxPieceLen, minCount)
    winners
      .select(col("freq"), length(col("w")).cast("long").as("wlen"),
        size(split(col("path"), " ")).cast("long").as("n_pieces"))
      .groupBy(col("n_pieces"))
      .agg(count(lit(1)).as("n_word_types"),
        sum(col("freq")).as("n_words"),
        sum(col("freq") * col("n_pieces")).as("pieces_total"),
        round(sum(col("freq") * col("wlen")).cast("double") /
          sum(col("freq") * col("n_pieces")), 6).as("chars_per_piece"))
      .orderBy(col("n_pieces"))
  }
}
