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

  /** Hybrid retrieval via reciprocal-rank fusion (RRF, Cormack et
    * al.): fuse the BM25 lexical list with each query vector's
    * cosine top-list — score = Σ 1/(K + rank) over the lists a doc
    * appears in. Both input lists are already tiny (top-`depth`
    * each), so the fusion is a full-outer join of two O(depth)
    * tables per query — the corpus is touched only inside the two
    * underlying retrievals. The RRF terms are rounded then
    * DECIMAL-summed: order-independent and oracle-replayable. */
  def hybridTopK(docs: DataFrame, emb: DataFrame,
                 terms: Seq[String] = DefaultTerms, nQueries: Int = 3,
                 depth: Int = 20, k: Int = 10, rrfK: Int = 60): DataFrame = {
    val lexW = org.apache.spark.sql.expressions.Window
      .orderBy(col("bm25").desc, col("doc_id"))
    val lex = bm25TopK(docs, terms, depth)
      .withColumn("lex_rank", row_number().over(lexW).cast("long"))
      .select(col("doc_id"), col("lex_rank"))
    val vec = graft.operators.Similarity.bruteTopK(emb, nQueries, depth)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rank").as("vec_rank"))
    val queries = vec.select(col("query_id")).distinct()
    val lexPerQuery = queries.crossJoin(lex)
    val fused = vec.join(lexPerQuery, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf", (
        coalesce(round(lit(1.0) / (lit(rrfK) + col("vec_rank")), 6), lit(0.0))
          .cast("decimal(18,6)") +
        coalesce(round(lit(1.0) / (lit(rrfK) + col("lex_rank")), 6), lit(0.0))
          .cast("decimal(18,6)")).cast("double"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("rrf").desc, col("doc_id"))
    fused.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("doc_id"),
        col("vec_rank"), col("lex_rank"), col("rrf"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** nDCG@k of the BM25 lexical ranking, judged by vector-cosine
    * relevance — the retrieval-quality eval a RAG pipeline runs
    * alongside `rag_eval_mrr`: how much of the embedding model's
    * notion of relevance does the cheap lexical ranker preserve?
    * Graded relevance of a doc for a query is its clamped cosine to
    * the query vector; DCG discounts by 1/log2(rank+1) down the
    * lexical list; the ideal DCG comes from the true cosine top-k
    * (the brute list). Per-position terms are rounded then
    * DECIMAL-summed; nDCG stays a raw quotient. Both retrievals are
    * the audited corpus-scale shapes; the eval itself joins two
    * O(k)-row lists per query. */
  def ndcgAtK(docs: DataFrame, emb: DataFrame,
              terms: Seq[String] = DefaultTerms, nQueries: Int = 3,
              depth: Int = 20, k: Int = 10): DataFrame = {
    import graft.functions.VectorFunctions.{cosinePrenormed, dot, norm}
    val lexW = org.apache.spark.sql.expressions.Window
      .orderBy(col("bm25").desc, col("doc_id"))
    val lex = bm25TopK(docs, terms, depth)
      .withColumn("lex_rank", row_number().over(lexW).cast("long"))
      .where(col("lex_rank") <= k)
      .select(col("doc_id"), col("lex_rank"))
    val e = emb.select(col("vec_id").as("id"), col("embedding").as("v"),
      norm(col("embedding")).as("nrm"))
    val q = e.where(col("id") < nQueries)
      .select(col("id").as("query_id"), col("v").as("qv"), col("nrm").as("qnrm"))
    // ln(x)/ln(2) spelled out on BOTH engines (not a native log2):
    // identical double arithmetic, so the 6dp rounding cannot flake
    def disc(rank: org.apache.spark.sql.Column) =
      log(rank.cast("double") + 1.0) / log(lit(2.0))
    val dcg = lex.crossJoin(broadcast(q))
      .join(e, col("id") === col("doc_id"))
      .where(col("doc_id") =!= col("query_id")) // self-hit excluded, as in brute
      .select(col("query_id"),
        round(greatest(lit(0.0),
          round(cosinePrenormed(dot(col("qv"), col("v")), col("qnrm"), col("nrm")), 6))
          / disc(col("lex_rank")), 6).as("term"))
      .groupBy(col("query_id"))
      .agg(sum(col("term").cast("decimal(18,6)")).cast("double").as("dcg"))
    val idcg = graft.operators.Similarity.bruteTopK(emb, nQueries, k)
      .select(col("query_id"),
        round(greatest(lit(0.0), col("sim")) / disc(col("rank")), 6).as("term"))
      .groupBy(col("query_id"))
      .agg(sum(col("term").cast("decimal(18,6)")).cast("double").as("idcg"))
    dcg.join(idcg, "query_id")
      .select(col("query_id"), col("dcg"), col("idcg"),
        (col("dcg") / col("idcg")).as("ndcg"))
      .orderBy(col("query_id"))
  }

  /** Two-stage retrieve-then-rerank (the production serving shape:
    * cheap recall stage over the corpus, expensive precision stage
    * over candidates only). Stage 1 is the corpus-scale BM25 top-
    * `depth`; stage 2 re-scores ONLY those `depth` candidates per
    * query with a blended cross-score — min-max-normalized BM25
    * averaged with query-document cosine — so the costly scorer
    * touches O(queries × depth) rows no matter the corpus size (the
    * same cost asymmetry a neural cross-encoder has; the blend is
    * its deterministic stand-in, wired so a ProcessTextEncoder-style
    * scorer can replace the cosine term). The candidate list
    * broadcasts into the embedding join; the rerank window is over
    * queries × depth rows, bounded by construction. Cosine rounded
    * 6dp before blending, blend rounded 6dp — oracle-replayable on
    * any partitioning. */
  def rerankTopK(docs: DataFrame, emb: DataFrame,
                 terms: Seq[String] = DefaultTerms, nQueries: Int = 3,
                 depth: Int = 20, k: Int = 10): DataFrame = {
    import graft.functions.VectorFunctions.{dot, norm}
    val cands = bm25TopK(docs, terms, depth) // doc_id, bm25 (depth rows)
    val bstats = cands.agg(min(col("bm25")).as("bmin"), max(col("bm25")).as("bmax"))
    val n = emb.select(col("vec_id").as("doc_id"), col("embedding").as("v"),
      norm(col("embedding")).as("nrm"))
    val q = emb.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        norm(col("embedding")).as("qnrm"))
    val nb = when(col("bmax") === col("bmin"), lit(1.0))
      .otherwise((col("bm25") - col("bmin")) / (col("bmax") - col("bmin")))
    val cosR = round(dot(col("qv"), col("v")) / (col("qnrm") * col("nrm")), 6)
    val scored = n.join(broadcast(cands), "doc_id")
      .crossJoin(broadcast(q))
      .crossJoin(broadcast(bstats))
      .select(col("query_id"), col("doc_id"), col("bm25"),
        round(nb * lit(0.5) + lit(0.5) * cosR, 6).as("rerank_score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("rerank_score").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("rerank_score"))
      .orderBy(col("query_id"), col("rank"))
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

  /** Context-window assembly: the retrieved candidates packed into a
    * fixed token budget in relevance order — what actually gets
    * prompted. The running token total is a per-query window over
    * ≤ depth candidate rows (never the corpus); packing stops at
    * the first overflow (prefix rule: deterministic and identical
    * in the SQL replay). */
  def contextPack(docs: DataFrame, emb: DataFrame, nQueries: Int = 5,
                  depth: Int = 20, budgetTokens: Long = 150): DataFrame = {
    val cand = graft.operators.Similarity.bruteTopK(emb, nQueries, depth)
      .join(docs.select(col("doc_id"), tokenCount(col("text")).as("n_tok")),
        col("neighbor_id") === col("doc_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("rank"))
    cand.withColumn("cum_tokens", sum(col("n_tok")).over(w))
      .where(col("cum_tokens") <= budgetTokens)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("n_tok"), col("cum_tokens"), col("sim"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Pseudo-relevance feedback (Rocchio-style query expansion, the
    * classic two-pass retrieval refinement): retrieve a small
    * feedback set with the original query, mine it for the terms
    * that best characterize it, and re-retrieve with the expanded
    * weighted query. The corpus is tokenized ONCE into a pinned
    * token zone every stage reads. Stage 1 is the `bm25TopK` formula
    * at depth `fbDocs` over that zone; the expansion candidates are
    * the feedback docs' own tokens (length ≥ `minLen`) scored
    * tf-in-feedback × ln(N/df) with df over the WHOLE corpus (the
    * feedback vocabulary is tiny, so the corpus-side df pass is a
    * map-side semi-join filter + one partial agg, O(matches)); the
    * top `expandK` become extra query terms at weight
    * `expandWeight`, originals keep weight 1. Stage 2 is one more
    * BM25 pass over the corpus with the combined term table
    * broadcast. Per-term scores are rounded 6dp then weighted in
    * EXACT DECIMAL (scale-7 product — never a second double
    * rounding, whose half-ulp ties engines break differently) and
    * DECIMAL-summed: order-independent and oracle-replayable. */
  def prfTopK(docs: DataFrame, terms: Seq[String] = DefaultTerms,
              fbDocs: Int = 5, expandK: Int = 3, minLen: Int = 4,
              topK: Int = 10, contentCol: String = "text",
              idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    val t = docs.select(col(idCol).as("doc_id"), tokens(col(contentCol)).as("tk"))
    val stats = t.agg(count(lit(1)).as("n_docs"), avg(size(col("tk"))).as("avg_len"))
    // round 15: the corpus-scale explode is pre-aggregated ONCE to a
    // (doc_id, dl, w, tf) table and materialized — PRF is inherently
    // multi-pass (feedback retrieval, term mining, corpus df, the
    // weighted second pass), and each pass previously re-exploded and
    // re-shuffled every token instance (the r14 before-plan:
    // 38 Exchange nodes, zero reuse). Aggregate before you shuffle
    // (guide §2.3/§2.4): every stage below now reads O(distinct
    // (doc, term)) rows from this one checkpoint, and the only
    // corpus-scale exchange in the query is the pre-agg's own.
    val toks = t
      .select(col("doc_id"), size(col("tk")).cast("long").as("dl"),
        explode(col("tk")).as("w"))
      .groupBy(col("doc_id"), col("dl"), col("w"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    // distinct: bm25TopK's isin() filter dedupes repeated query
    // terms implicitly; the join against this table must too, or a
    // duplicated term would double its tf
    val original = spark.createDataFrame(terms.distinct.map(Tuple1(_))).toDF("w")
      .select(col("w"), lit("1.0").cast("decimal(2,1)").as("weight"))
    // stage 1: the plain BM25 feedback set (weight-1 term table —
    // the ×1.0 DECIMAL product is exact, so scores match bm25TopK)
    val fb = weightedBm25(toks, stats, original, "bm25")
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(fbDocs)
      .select(col("doc_id"))
    // expansion candidates: feedback-set term mass, corpus idf;
    // minLen is the inclusive minimum expansion-term length.
    // fb_tf sums the pre-agg'd per-doc counts (== counting instances);
    // the df pass needs no distinct — (doc_id, w) is unique in `toks`
    val fbTf = toks.join(broadcast(fb), "doc_id")
      .where(length(col("w")) >= minLen && !col("w").isin(terms: _*))
      .groupBy(col("w")).agg(sum(col("tf")).as("fb_tf"))
    val dfAll = toks.join(broadcast(fbTf.select(col("w"))), "w")
      .groupBy(col("w")).agg(count(lit(1)).as("df"))
    val expansion = fbTf.join(broadcast(dfAll), "w")
      .crossJoin(broadcast(stats.select(col("n_docs"))))
      .select(col("w"),
        round(col("fb_tf") * log(col("n_docs").cast("double") / col("df")), 6)
          .as("score"))
      .orderBy(col("score").desc, col("w"))
      .limit(expandK)
      .select(col("w"), lit("0.5").cast("decimal(2,1)").as("weight"))
    // stage 2: weighted BM25 over the combined term table
    val scored = weightedBm25(toks, stats, original.unionByName(expansion), "prf")
      .orderBy(col("prf").desc, col("doc_id"))
      .limit(topK)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("prf").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("doc_id"), col("prf"))
      .orderBy(col("rank"))
  }

  /** BM25 doc scores over a pre-aggregated (doc_id, dl, w, tf) token
    * table and a broadcast (w, weight) term table — `bm25TopK`'s
    * formula with per-term weights: each 6dp-rounded term score
    * multiplies its DECIMAL(2,1) weight (exact at scale 7 — never a
    * second double rounding, whose half-ulp ties engines break
    * differently) and DECIMAL-sums per doc: order-independent and
    * oracle-replayable. The tf counts arrive precomputed, so the
    * only work here is a broadcast semi-filter plus model-scale
    * aggregates — no corpus-scale exchange (round 15). */
  private def weightedBm25(toks: DataFrame, stats: DataFrame,
                           termTable: DataFrame, scoreName: String): DataFrame = {
    val tf = toks.join(broadcast(termTable), "w")
    val df = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val idf = log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val termScore = round(
      idf * (col("tf") * lit(2.2)) /
        (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avg_len"))), 6)
    tf.join(broadcast(df), "w")
      .crossJoin(broadcast(stats))
      .withColumn("term_score", termScore)
      .groupBy(col("doc_id"))
      .agg(sum(col("term_score").cast("decimal(18,6)") * col("weight"))
        .cast("double").as(scoreName))
  }

  /** Query-likelihood retrieval with Dirichlet smoothing (Zhai &
    * Lafferty 2004) — the LM alternative to BM25:
    * score(d) = Σ_t ln((tf(t,d) + µ·cf(t)/T) / (|d| + µ)).
    * Smoothing gives every doc a finite score, so ranking sees the
    * whole corpus — but the per-doc work is |query| terms: the
    * exploded corpus is filtered to query terms BEFORE any shuffle
    * (O(matches) pairs), the corpus LM is |query| rows broadcast,
    * and non-matching (doc, term) cells materialize only as the
    * query-term × doc left join, never a token-level cross. Same
    * round-then-DECIMAL-sum fold as BM25. */
  def queryLikelihoodTopK(docs: DataFrame, terms: Seq[String] = DefaultTerms,
                          topK: Int = 20, mu: Int = 2000,
                          contentCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val t = docs.select(col(idCol).as("doc_id"), tokens(col(contentCol)).as("tk"))
    val toks = t.select(col("doc_id"), explode(col("tk")).as("w"))
    val total = toks.agg(count(lit(1)).as("total"))
    val cf = toks.where(col("w").isin(terms: _*))
      .groupBy(col("w")).agg(count(lit(1)).as("cf"))
    val tf = toks.where(col("w").isin(terms: _*))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    val termTable = docs.sparkSession.createDataFrame(
      terms.map(Tuple1(_))).toDF("w")
    val cells = t.select(col("doc_id"), size(col("tk")).cast("long").as("dl"))
      .crossJoin(broadcast(termTable))
      .join(tf, Seq("doc_id", "w"), "left")
      .join(broadcast(cf), Seq("w"))
      .crossJoin(broadcast(total))
    // identical association order in the oracle:
    //   ln((tf + mu * (cf / T)) / (dl + mu))
    val term = round(log(
      (coalesce(col("tf"), lit(0L)) + lit(mu) * (col("cf").cast("double") / col("total"))) /
        (col("dl") + lit(mu))), 6)
    cells.withColumn("term_nll", term)
      .groupBy(col("doc_id"))
      .agg(sum(col("term_nll").cast("decimal(18,6)")).cast("double").as("qlm"))
      .orderBy(col("qlm").desc, col("doc_id"))
      .limit(topK)
  }

  /** The reference's /ask endpoint as ONE graded funnel (round 14 —
    * the stages `rag_retrieve` / `rag_rerank` / `rag_mmr` /
    * `rag_context_pack` each grade alone; the API actually runs
    * their COMPOSITION): vector retrieve (cosine top-`depth` recall
    * stage over the corpus) → blended rerank (min-max-normalized
    * BM25 of the RETRIEVED candidates averaged with their cosine —
    * the cross-encoder stand-in scoring O(queries·depth) rows) →
    * MMR diversification over the reranked survivors (λ = 0.7, the
    * `mmrTopK` exact-integer greedy with rel = the RERANK score) →
    * greedy token-budget context packing in MMR order.
    *
    * Graded as per-(query, stage) audit rows: surviving doc count,
    * token mass, and the md5 of the ORDERED id list — one hash pins
    * every stage's membership AND ranking, so a drift anywhere in
    * the chain (a candidate swapped, an order flipped, a budget
    * off-by-one) lands in exactly one visible row.
    *
    * Scale shape: stage 1 is the only corpus-scale scan (plus the
    * O(matches) BM25 token pass); it is checkpointed, so stages 2–4
    * run on O(queries·depth) rows. The MMR greedy collects
    * O(queries·rerankK²) cells driver-side — the mmrTopK budget. */
  def askFunnel(docs: DataFrame, emb: DataFrame,
                terms: Seq[String] = DefaultTerms, nQueries: Int = 3,
                depth: Int = 20, rerankK: Int = 10, mmrK: Int = 5,
                lambda: Double = 0.7, budgetTokens: Long = 150): DataFrame = {
    import graft.functions.VectorFunctions.{cosinePrenormed, dot, norm}
    val spark = docs.sparkSession
    val l10 = math.round(lambda * 10)
    require(l10 >= 0 && l10 <= 10, "lambda must be in [0, 1]")
    // ── stage 1: retrieve (the one corpus pass; checkpoint so the
    // later stages never re-derive it) ──
    val ntok = docs.select(col("doc_id"), tokenCount(col("text")).as("n_tok"))
    val s1 = graft.operators.Similarity.bruteTopK(emb, nQueries, depth)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rank"), col("sim"))
      .join(ntok, "doc_id")
      .select(col("query_id"), col("doc_id"), col("rank"), col("sim"), col("n_tok"))
      .localCheckpoint(true)
    // ── stage 2: rerank the retrieved candidates (corpus-wide BM25
    // stats, candidates' scores only; absent terms score 0) ──
    val t = docs.select(col("doc_id"), tokens(col("text")).as("tk"))
    val stats = t.agg(count(lit(1)).as("n_docs"), avg(size(col("tk"))).as("avg_len"))
    val tf = t
      .select(col("doc_id"), size(col("tk")).cast("long").as("dl"),
        explode(col("tk")).as("w"))
      .where(col("w").isin(terms: _*))
      .groupBy(col("doc_id"), col("w"), col("dl"))
      .agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val idf = log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val termScore = round(
      idf * (col("tf") * lit(2.2)) /
        (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avg_len"))), 6)
    val bm = tf.join(broadcast(dfT), "w").crossJoin(broadcast(stats))
      .withColumn("term_score", termScore)
      .groupBy(col("doc_id"))
      .agg(sum(col("term_score").cast("decimal(18,6)")).cast("double").as("bm25"))
    val withBm = s1.join(broadcast(bm), Seq("doc_id"), "left")
      .withColumn("bm25", coalesce(col("bm25"), lit(0.0)))
    val bstats = withBm.groupBy(col("query_id"))
      .agg(min(col("bm25")).as("bmin"), max(col("bm25")).as("bmax"))
    val nb = when(col("bmax") === col("bmin"), lit(1.0))
      .otherwise((col("bm25") - col("bmin")) / (col("bmax") - col("bmin")))
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("rscore").desc, col("doc_id"))
    val s2 = withBm.join(broadcast(bstats), "query_id")
      .withColumn("rscore", round(nb * lit(0.5) + lit(0.5) * col("sim"), 6))
      .withColumn("rank", row_number().over(w2).cast("long"))
      .where(col("rank") <= rerankK)
      .select(col("query_id"), col("doc_id"), col("rank"), col("rscore"), col("n_tok"))
      .localCheckpoint(true)
    // ── stage 3: MMR over the reranked survivors, rel = rerank
    // score. Pairwise sims are O(queries·rerankK²) cells; the greedy
    // runs driver-side in exact integers (the mmrTopK discipline:
    // 6dp-rounded scores 10⁶-scale to exact longs). ──
    val e = emb.select(col("vec_id").as("id"), col("embedding").as("v"),
      norm(col("embedding")).as("nrm"))
    val av = e.select(col("id").as("pa"), col("v").as("av"), col("nrm").as("anrm"))
    val bv = e.select(col("id").as("pb"), col("v").as("bv"), col("nrm").as("bnrm"))
    val psim = s2.select(col("query_id"), col("doc_id").as("pa"))
      .join(s2.select(col("query_id"), col("doc_id").as("pb")), "query_id")
      .where(col("pa") =!= col("pb"))
      .join(broadcast(av), "pa").join(broadcast(bv), "pb")
      .select(col("query_id"), col("pa"), col("pb"),
        round(cosinePrenormed(dot(col("av"), col("bv")), col("anrm"), col("bnrm")), 6)
          .as("sim"))
    def r6l(v: Double): Long =
      java.math.BigDecimal.valueOf(v * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    val candRows = s2.select(col("query_id"), col("doc_id"), col("rscore")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val simMap: Map[(Long, Long, Long), Double] = psim.collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getDouble(3))).toMap
    val s3rows = candRows.groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
      val rel = rows.map(r => r._2 -> r._3).toMap
      var remaining = rel.keySet
      var selected = List.empty[Long]
      (1 to math.min(mmrK, remaining.size)).map { step =>
        val (id, _) = remaining.map { c =>
          val ms = if (selected.isEmpty) 0.0
                   else selected.map(s => simMap((qid, c, s))).max
          c -> (l10 * r6l(rel(c)) - (10L - l10) * r6l(ms))
        }.minBy { case (cid, s) => (-s, cid) }
        remaining -= id
        selected ::= id
        (qid, id, step.toLong)
      }
    }
    import spark.implicits._
    val s3 = s3rows.toDF("query_id", "doc_id", "rank")
      .join(broadcast(s2.select(col("query_id"), col("doc_id"), col("n_tok"))),
        Seq("query_id", "doc_id"))
    // ── stage 4: pack the MMR order into the token budget ──
    val w4 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("rank"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val s4 = s3.withColumn("cum", sum(col("n_tok")).over(w4))
      .where(col("cum") <= budgetTokens)
    // ── the audit frame: one row per (query, stage) — counts, token
    // mass, and the md5 of the ordered id list ──
    def stageRows(df: DataFrame, stage: Int, name: String): DataFrame = {
      val idsOrdered = array_join(transform(
        array_sort(collect_list(struct(col("rank"), col("doc_id")))),
        x => x.getField("doc_id").cast("string")), ",")
      df.groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
          md5(idsOrdered).as("ids_md5"))
        .select(col("query_id"), lit(stage.toLong).as("stage"),
          lit(name).as("name"), col("n_docs"), col("n_tokens"), col("ids_md5"))
    }
    stageRows(s1, 1, "retrieve")
      .unionByName(stageRows(s2, 2, "rerank"))
      .unionByName(stageRows(s3, 3, "mmr"))
      .unionByName(stageRows(s4, 4, "pack"))
      .orderBy(col("query_id"), col("stage"))
  }
}
