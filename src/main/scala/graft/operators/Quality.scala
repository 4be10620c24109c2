package graft.operators

import graft.functions.HashFunctions.md5Long
import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality monitoring suite (reference:
  * src/helpers/duckdb_queries.py:27-100 and delta_queries.py:46-62).
  *
  * Every metric is a single partial-aggregating groupBy — map-side
  * combine makes each a one-shuffle (or zero-shuffle global agg)
  * job regardless of input size.
  */
object Quality {

  /** Per-source record counts (duckdb_queries.py:34-41). */
  def recordCounts(docs: DataFrame, by: String = "source"): DataFrame =
    docs.groupBy(col(by)).agg(count(lit(1)).as("record_count"))
      .orderBy(col(by))

  /** Content-length stats per source (duckdb_queries.py:48-60). */
  def lengthStats(docs: DataFrame, contentCol: String = "text", by: String = "source"): DataFrame =
    docs.groupBy(col(by)).agg(
      round(avg(length(col(contentCol))), 4).as("avg_length"),
      min(length(col(contentCol))).cast("long").as("min_length"),
      max(length(col(contentCol))).cast("long").as("max_length"))
      .orderBy(col(by))

  /** Per-source integrity audit — completeness (null/empty text,
    * null lang) AND cross-column consistency: rows where the
    * recorded `n_chars` disagrees with the actual text length. The
    * consistency count is the interesting one: a loader that
    * truncates text or stamps metadata from a different revision
    * shows up here as nonzero `n_chars_mismatch` while every
    * per-column null check stays green. One partial-aggregating
    * pass, output rows = |sources|. */
  def integrityBySource(docs: DataFrame): DataFrame =
    docs.groupBy(col("source")).agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("text").isNull || length(col("text")) === 0, 1L)
        .otherwise(0L)).as("n_empty_text"),
      sum(when(col("lang").isNull, 1L).otherwise(0L)).as("n_null_lang"),
      sum(when(col("n_chars") =!= length(col("text")), 1L)
        .otherwise(0L)).as("n_chars_mismatch"))
      .orderBy(col("source"))

  /** Missing-value counts (duckdb_queries.py:69-82): count(*) −
    * count(col) per audited column. */
  def missingValues(docs: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.map(c => (count(lit(1)) - count(col(c))).as(s"missing_$c"))
    docs.agg(count(lit(1)).as("total_records"), aggs: _*)
  }

  /** Duplicate analysis (duckdb_queries.py:120-128): total vs
    * distinct vs duplicate content rows. */
  def duplicateAnalysis(docs: DataFrame, contentCol: String = "text"): DataFrame =
    docs.agg(
      count(lit(1)).as("total_records"),
      countDistinct(col(contentCol)).as("unique_content"),
      (count(lit(1)) - countDistinct(col(contentCol))).as("duplicates"))

  /** Top-k word frequency over words longer than `minLen`
    * (duckdb_queries.py:103-117). Explode + partial-agg count: the
    * only shuffle carries (word, partial count) pairs. */
  def wordFrequency(docs: DataFrame, contentCol: String = "text",
                    minLen: Int = 3, k: Int = 20): DataFrame =
    docs
      .select(explode(tokens(lower(col(contentCol)))).as("word"))
      .where(length(col("word")) > minLen)
      .groupBy("word").agg(count(lit(1)).as("frequency"))
      .orderBy(col("frequency").desc, col("word"))
      .limit(k)

  /** Hapax legomena report — the lexical-richness companion to the
    * Heaps/Zipf fits: vocabulary size, total tokens, the count of
    * words with corpus frequency EXACTLY 1, and the hapax rate H/V
    * (≈0.4-0.6 for natural text per Zipf's law; a collapsing rate
    * flags templated/duplicated corpora before training). One explode
    * + one (word) aggregation — the same partial-agg shuffle shape as
    * every word-count probe; the rollup over distinct words is a
    * second model-output aggregation. */
  def hapaxReport(docs: DataFrame, contentCol: String = "text"): DataFrame =
    docs.select(explode(tokens(lower(col(contentCol)))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("f"))
      .agg(
        count(lit(1)).as("vocab"),
        sum(col("f")).cast("long").as("n_tokens"),
        sum(when(col("f") === 1, 1L).otherwise(0L)).as("hapax"))
      .select(col("vocab"), col("n_tokens"), col("hapax"),
        round(col("hapax").cast("double") / col("vocab"), 6).as("hapax_rate"))

  /** Per-document repetition metrics — the Gopher repetition filters
    * (type-token ratio, most-common-word share, most-common-bigram
    * share). The word counts come from one explode + two-level
    * aggregation (doc×word partials, then per-doc max/sum), the
    * bigrams from a map-side zip of the token array with its own
    * tail — no self-join, no second tokenization pass. All ratios
    * are exact integer quotients (bit-stable everywhere); token-less
    * docs yield NULL ratios and keep=0. */
  def repetition(docs: DataFrame, contentCol: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    val t = docs.select(col(idCol).as("doc_id"), tokens(lower(col(contentCol))).as("tk"))
    val wordAgg = t.select(col("doc_id"), explode(col("tk")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"), count(lit(1)).as("n_distinct"),
        max(col("tf")).as("top_tf"))
    val bigrams = t.select(col("doc_id"),
        explode(zip_with(
          slice(col("tk"), lit(1), greatest(size(col("tk")) - 1, lit(0))),
          slice(col("tk"), lit(2), greatest(size(col("tk")) - 1, lit(0))),
          (a, b) => concat(a, lit(" "), b))).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("bf"))
      .groupBy(col("doc_id")).agg(max(col("bf")).as("top_bf"))
    val nTok = col("n_tokens")
    val ttr = col("n_distinct").cast("double") / nTok
    val topW = col("top_tf").cast("double") / nTok
    val topB = col("top_bf").cast("double") / (nTok - 1)
    docs.select(col(idCol).as("doc_id"))
      .join(wordAgg, Seq("doc_id"), "left")
      .join(bigrams, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(nTok, lit(0L)).as("n_tokens"),
        ttr.as("ttr"), topW.as("top_word_frac"),
        when(nTok > 1, topB).as("top_bigram_frac"),
        when(nTok > 0 && ttr > 0.2 && topW < 0.3 &&
          (nTok <= 1 || topB < 0.25), 1L).otherwise(0L).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** One-pass column profiler: null count, exact distinct count and
    * min/max per column, unpivoted to one row per column. The single
    * wide aggregate computes every metric in one scan (the multi-
    * distinct is Spark's Expand: one shuffle carrying per-column
    * partials); the unpivot is a map-side explode of the 1-row
    * result. Doubles are excluded by callers because their string
    * rendering is engine-specific — longs/strings/dates render
    * identically everywhere. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    // round 15: the multi-countDistinct wide aggregate planned as one
    // Expand — every row multiplied (|cols|+1)-way into a single
    // object-hash aggregate whose per-task state held every distinct
    // value of every column (r14 driver: 5.6 s, and 2.4× FASTER at 8
    // cores than 32 — pure oversharded-Expand overhead). Split per
    // guide §2.3: pass 1 is the narrow nulls/min/max aggregate
    // (map-side partials, one row); pass 2 unpivots to (column,
    // value) and counts distinct via two partial-aggregating
    // groupBys. Values compare as their string rendering — injective
    // for the long/string/date columns this profiler accepts
    // (doubles are excluded by contract, see scaladoc) — so the
    // counts equal countDistinct's exactly. Measured 2× at sf0.1.
    val aggs = cols.flatMap { c => Seq(
      (count(lit(1)) - count(col(c))).as(s"nn_$c"),
      min(col(c)).cast("string").as(s"mn_$c"),
      max(col(c)).cast("string").as(s"mx_$c")) }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c => struct(lit(c).as("column"),
      col(s"nn_$c").as("n_nulls"),
      col(s"mn_$c").as("min_val"), col(s"mx_$c").as("max_val")) }
    val narrow = row.select(explode(array(entries: _*)).as("e")).select(col("e.*"))
    val distincts = df
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("column"), col(c).cast("string").as("v"))): _*)).as("e"))
      .select(col("e.column").as("column"), col("e.v").as("v"))
      .where(col("v").isNotNull)
      .groupBy(col("column"), col("v")).agg(count(lit(1)).as("__c"))
      .groupBy(col("column")).agg(count(lit(1)).as("n_distinct"))
    narrow.join(distincts, Seq("column"), "left")
      .select(col("column"), col("n_nulls"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("min_val"), col("max_val"))
      .orderBy(col("column"))
  }

  /** Flesch-style readability score per document: words from the
    * shared tokenizer, sentences from punctuation-run counts,
    * syllables approximated as vowel runs — all regexp_count, fully
    * codegen'd, map-only. Ratios guard zero denominators to NULL;
    * the score is rounded with the formula's association order
    * mirrored in the oracle. */
  def readability(docs: DataFrame, contentCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    val nW = tokenCount(col(contentCol))
    // a text without terminal punctuation is one sentence
    val nS = greatest(regexp_count(col(contentCol), lit("[.!?]+")), lit(1))
    val nSyl = regexp_count(lower(col(contentCol)), lit("[aeiouy]+"))
    val wps = nW.cast("double") / nS
    val spw = nSyl.cast("double") / when(nW > 0, nW)
    docs.select(col(idCol).as("doc_id"),
        nW.as("n_words"), nS.cast("long").as("n_sents"),
        nSyl.cast("long").as("n_syllables"),
        round(lit(206.835) - lit(1.015) * wps - lit(84.6) * spw, 4).as("flesch"))
      .orderBy(col("doc_id"))
  }

  /** Distribution drift between two sources (KS-style): the max
    * absolute CDF gap of content length over an equal-width grid.
    * One scalar pass for the [lo, hi] bounds, one map-side
    * grid-explode + conditional-count pass whose shuffle carries
    * `bins` partial rows — no global sort, unlike an exact KS. CDF
    * values are integer quotients: bit-stable everywhere. */
  def lengthDrift(docs: DataFrame, srcA: String = "src0", srcB: String = "src1",
                  bins: Int = 20, contentCol: String = "text",
                  by: String = "source"): DataFrame = {
    val lens = docs.where(col(by).isin(srcA, srcB))
      .select(col(by).as("src"), length(col(contentCol)).cast("long").as("len"))
    val bounds = lens.agg(min(col("len")).as("lo"), max(col("len")).as("hi"),
      count(when(col("src") === srcA, 1)).as("na"),
      count(when(col("src") === srcB, 1)).as("nb"))
    lens.crossJoin(broadcast(bounds))
      .select(col("src"), col("len"), col("lo"), col("na"), col("nb"),
        explode(sequence(lit(1), lit(bins))).as("k"),
        ((col("hi") - col("lo")).cast("double") / bins).as("step"))
      .withColumn("t", col("lo").cast("double") + col("k") * col("step"))
      .groupBy(col("k"), col("t"), col("na"), col("nb"))
      .agg(count(when(col("src") === srcA && col("len") <= col("t"), 1)).as("ca"),
        count(when(col("src") === srcB && col("len") <= col("t"), 1)).as("cb"))
      .select(col("k").cast("long").as("k"), col("t"),
        (col("ca").cast("double") / col("na")).as("cdf_a"),
        (col("cb").cast("double") / col("nb")).as("cdf_b"),
        abs(col("ca").cast("double") / col("na") -
          col("cb").cast("double") / col("nb")).as("gap"))
      .orderBy(col("k"))
  }

  /** EXACT two-sample Kolmogorov-Smirnov test between two sources'
    * content-length distributions — the rigorous companion to the
    * gridded `lengthDrift`: D = sup over the ACTUAL observed values
    * of |F_A − F_B|, not a 20-bin approximation. Scale shape: one
    * groupBy collapses the corpus to O(distinct lengths) rows, then
    * the exact global CDFs come from `Ranks.withGlobalPrefixSum`
    * (banded two-phase prefix — one model-sized sum per band to the
    * driver, per-band windows; NEVER a global single-partition
    * window), so the whole test is two small jobs over the
    * length-histogram table regardless of corpus size. CDF values
    * are integer quotients (bit-stable in any engine); the max gap
    * tie-breaks on the smaller length. Returns one row: the D
    * statistic, the length where it is attained, both sample sizes,
    * and the α=0.05 critical value c(α)·√((n_a+n_b)/(n_a·n_b)),
    * c(0.05)=1.358 (Smirnov's asymptotic form). */
  def ksExact(docs: DataFrame, srcA: String = "src0", srcB: String = "src1",
              contentCol: String = "text", by: String = "source"): DataFrame = {
    val lens = docs.where(col(by).isin(srcA, srcB))
      .select(col(by).as("src"), length(col(contentCol)).cast("long").as("len"))
    val perLen = lens.groupBy(col("len")).agg(
      count(when(col("src") === srcA, 1)).as("ca"),
      count(when(col("src") === srcB, 1)).as("cb"))
    // band = len DIV 64: order-preserving in len, O(maxLen/64) bands
    val (pa, na) = Ranks.withGlobalPrefixSum(
      perLen, expr("len DIV 64"), Seq(col("len")), col("ca"), "xa")
    val (pb, nb) = Ranks.withGlobalPrefixSum(
      pa, expr("len DIV 64"), Seq(col("len")), col("cb"), "xb")
    val gap = abs((col("xa") + col("ca")).cast("double") / lit(na) -
      (col("xb") + col("cb")).cast("double") / lit(nb))
    pb.withColumn("gap", gap)
      .orderBy(col("gap").desc, col("len"))
      .limit(1)
      .select(round(col("gap"), 6).as("d_stat"), col("len").as("at_len"),
        lit(na).as("n_a"), lit(nb).as("n_b"),
        round(lit(1.358) * sqrt(lit((na + nb).toDouble) / lit(na.toDouble * nb)), 6)
          .as("crit_95"))
  }

  /** Cramér's V association between two categorical columns (source ×
    * lang): the contingency-table effect size a curation pipeline
    * checks before stratifying one dimension by another (V≈0 means
    * the strata are independent and one can be dropped). The corpus
    * collapses to the R×C observed table in ONE partial-aggregating
    * shuffle; margins, expected counts, and χ² run over that
    * model-sized table (zero-count cells included via the margins
    * cross join — χ² needs their expected mass). Expected counts are
    * exact integer products/quotients in double; χ² terms are
    * 6dp-rounded then DECIMAL-summed (order-independent). Returns one
    * row: χ², degrees of freedom, n, and V = √(χ²/n/min(R−1,C−1)). */
  def cramersV(docs: DataFrame, a: String = "source", b: String = "lang"): DataFrame = {
    val obs = docs.where(col(a).isNotNull && col(b).isNotNull)
      .groupBy(col(a), col(b)).agg(count(lit(1)).as("o"))
    val rowM = obs.groupBy(col(a)).agg(sum(col("o")).as("rs"))
    val colM = obs.groupBy(col(b)).agg(sum(col("o")).as("cs"))
    val tot = obs.agg(sum(col("o")).as("n"))
    val cells = rowM.crossJoin(broadcast(colM))
      .join(obs, Seq(a, b), "left")
      .na.fill(0L, Seq("o"))
      .crossJoin(broadcast(tot))
      .withColumn("e", col("rs").cast("double") * col("cs") / col("n"))
      .withColumn("term",
        round((col("o") - col("e")) * (col("o") - col("e")) / col("e"), 6))
    cells
      .agg(sum(col("term").cast("decimal(18,6)")).cast("double").as("chi2"),
        countDistinct(col(a)).as("r"), countDistinct(col(b)).as("c"),
        max(col("n")).as("n"))
      .select(round(col("chi2"), 6).as("chi2"),
        ((col("r") - 1) * (col("c") - 1)).cast("long").as("dof"),
        col("n").cast("long").as("n"),
        round(sqrt(col("chi2") / col("n") /
          least(col("r") - 1, col("c") - 1)), 6).as("cramers_v"))
  }

  /** Top sources by average content length (duckdb_queries.py:150-159). */
  def topSourcesByLength(docs: DataFrame, contentCol: String = "text",
                         by: String = "source", k: Int = 5): DataFrame =
    docs.groupBy(col(by))
      .agg(round(avg(length(col(contentCol))), 4).as("avg_length"))
      .orderBy(col("avg_length").desc, col(by))
      .limit(k)

  /** All rows whose content occurs more than once — the reference's
    * `find_duplicates` (delta_queries.py:57-62, pandas
    * `duplicated(keep=False)`). Scale shape: aggregate content hashes
    * (one shuffle), keep the hot ones, semi-join the corpus back —
    * the corpus itself never self-joins. */
  def duplicateRows(docs: DataFrame, contentCol: String = "text"): DataFrame = {
    val hot = docs.groupBy(md5(col(contentCol)).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"))
      .where(col("n_copies") > 1)
    docs.select(col("doc_id"), col("source"), md5(col(contentCol)).as("content_hash"))
      .join(hot, "content_hash")
      .select(col("doc_id"), col("source"), col("content_hash"), col("n_copies"))
      .orderBy(col("doc_id"))
  }

  /** Per-doc character-distribution entropy (nats) — the cheap
    * perplexity proxy: gibberish and boilerplate sit at the entropy
    * extremes. Explode → per-(doc, char) counts (partial-agg
    * map-side), per-term contributions rounded then DECIMAL-summed
    * so the score is partition-independent. */
  def charEntropy(docs: DataFrame, contentCol: String = "text"): DataFrame = {
    val cnt = docs.select(col("doc_id"), explode(split(col(contentCol), "")).as("ch"))
      .groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
    val p = col("c").cast("double") / col("n")
    cnt.withColumn("n", sum(col("c")).over(w))
      .withColumn("t", round(-p * log(p), 6))
      .groupBy(col("doc_id"))
      .agg(sum(col("t").cast("decimal(18,6)")).cast("double").as("entropy"))
      .orderBy(col("doc_id"))
  }

  /** Per-doc cross-entropy under the corpus's own unigram LM — the
    * cheap in-engine stand-in for a KenLM-style perplexity filter:
    * H(d) = −(1/|d|) Σ_{t∈d} ln(count(t)/total). Surprising docs
    * (gibberish, wrong-language, encoding damage) score high;
    * boilerplate scores low. Shape: token explode is map-side; one
    * hash shuffle builds the count table (O(vocab), partial-agg);
    * the term join shuffles on token (AQE broadcasts it when the
    * vocab fits); per-term nll is rounded then DECIMAL-summed so the
    * doc score is partition-independent, and the final divide is a
    * raw double quotient (identical on every engine). */
  def unigramCrossEntropy(docs: DataFrame, contentCol: String = "text"): DataFrame = {
    // round 15 (guide §2.3, aggregate before you shuffle): the token
    // explode pre-aggregates to (doc_id, tok, tf) — the first shuffle
    // carries distinct (doc, token) pairs, not every instance, the
    // count table derives by summing tf, and the rate join runs over
    // the pre-agg'd rows. Both consumers share the ONE pre-agg
    // exchange (ReusedExchange), so the corpus is tokenized once.
    // Repeated instances of a token in a doc carry an identical
    // 6dp-rounded nll, so tf × nll in exact DECIMAL equals adding the
    // term tf times — bit-identical scores.
    val tk = docs.select(col("doc_id"), explode(tokens(col(contentCol))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val cnt = tk.groupBy(col("tok")).agg(sum(col("tf")).as("cnt"))
    val total = cnt.agg(sum(col("cnt")).as("total"))
    val perDoc = tk.join(cnt, "tok")
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("tf"),
        round(-log(col("cnt").cast("double") / col("total")), 6).as("nll"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        sum(col("tf") * col("nll").cast("decimal(18,6)")).cast("double").as("nll_sum"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("nll_sum"),
        (col("nll_sum") / col("n_tokens")).as("cross_entropy"))
      .orderBy(col("doc_id"))
  }

  /** Per-doc cross-entropy under the corpus BIGRAM LM — the
    * conditional upgrade of `unigramCrossEntropy`:
    * H(d) = −(1/(|d|−1)) Σ ln(c(prev,w) / c(prev,·)), with the
    * prefix marginal derived from the bigram table itself (exact).
    * Shape: bigram explode is map-side; counts build in one hash
    * shuffle; the per-pair rate joins back on (prev, w). Same
    * rounding discipline as the unigram LM. Single-token and empty
    * docs emit NULL entropy. */
  def bigramCrossEntropy(docs: DataFrame, contentCol: String = "text"): DataFrame = {
    val pairs = docs
      .select(col("doc_id"), tokens(col(contentCol)).as("tk"))
      .where(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(tk) - 1), " +
          "i -> struct(element_at(tk, i) AS prev, element_at(tk, i + 1) AS w))"))
        .as("p"))
      .select(col("doc_id"), col("p.prev").as("prev"), col("p.w").as("w"))
    val c2 = pairs.groupBy(col("prev"), col("w")).agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy(col("prev")).agg(sum(col("c2")).as("c1"))
    val rate = c2.join(c1, "prev")
      .select(col("prev"), col("w"),
        round(-log(col("c2").cast("double") / col("c1")), 6).as("nll"))
    val perDoc = pairs.join(rate, Seq("prev", "w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("nll").cast("decimal(18,6)")).cast("double").as("nll_sum"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("nll_sum"), (col("nll_sum") / col("n_bigrams")).as("cross_entropy"))
      .orderBy(col("doc_id"))
  }

  /** Collocation extraction by pointwise mutual information over
    * adjacent token pairs: PMI = ln(N·c(a,b) / (c(a)·c(b))) — the
    * "new york"-finder (Church & Hanks 1990), and the signal behind
    * phrase-aware tokenizer vocabularies. Support floor `minCount`
    * keeps the estimate stable (PMI of rare pairs explodes).
    * Bigram and unigram tables each build in one hash shuffle; the
    * PMI join runs over the O(bigram-vocab) table only; top-k is
    * TakeOrdered. The ln's argument is assembled in one fixed shape
    * (N·c(a,b)) / (c(a)·c(b)) on both engines. */
  def collocations(docs: DataFrame, contentCol: String = "text",
                   topK: Int = 20, minCount: Int = 5): DataFrame = {
    val pairs = docs
      .select(col("doc_id"), tokens(lower(col(contentCol))).as("tk"))
      .where(size(col("tk")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(tk) - 1), " +
          "i -> struct(element_at(tk, i) AS a, element_at(tk, i + 1) AS b))"))
        .as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val cab = pairs.groupBy(col("a"), col("b")).agg(count(lit(1)).as("cab"))
      .where(col("cab") >= minCount)
    val uni = docs.select(explode(tokens(lower(col(contentCol)))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cu"))
    val total = uni.agg(sum(col("cu")).as("total"))
    cab
      .join(uni.select(col("w").as("a"), col("cu").as("ca")), "a")
      .join(uni.select(col("w").as("b"), col("cu").as("cb")), "b")
      .crossJoin(broadcast(total))
      .select(col("a"), col("b"), col("cab"),
        round(log((col("total").cast("double") * col("cab")) /
          (col("ca").cast("double") * col("cb"))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("a"), col("b"))
      .limit(topK)
  }

  /** Sampling-loss audit: what share of the corpus vocabulary (and
    * token mass) survives a p% deterministic sample — the cheap
    * answer to "what does downsampling cost the tokenizer / the long
    * tail?". Both sides reduce to vocab-keyed tables (one shuffle);
    * shares are exact integer ppm. */
  def sampleCoverage(docs: DataFrame, pct: Int = 10,
                     contentCol: String = "text"): DataFrame = {
    val sampled = graft.operators.Sampling.hashSample(docs, pct)
      .select(explode(tokens(lower(col(contentCol)))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cs"))
    val full = docs.select(explode(tokens(lower(col(contentCol)))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cf"))
    full.join(sampled, Seq("w"), "left")
      .agg(count(lit(1)).as("vocab_full"),
        sum(when(col("cs").isNotNull, 1L).otherwise(0L)).as("vocab_sampled"),
        sum(col("cf")).as("tokens_full"),
        sum(coalesce(col("cs"), lit(0L))).as("tokens_sampled"))
      .select(col("vocab_full"), col("vocab_sampled"),
        expr("vocab_sampled * 1000000 div vocab_full").as("vocab_ppm"),
        col("tokens_full"), col("tokens_sampled"),
        expr("tokens_sampled * 1000000 div tokens_full").as("token_ppm"))
  }

  /** Jelinek–Mercer interpolated LM cross-entropy: per-bigram
    * p = λ·p(w|prev) + (1−λ)·p(w), λ = 0.5 — the smoothing that
    * makes a bigram perplexity filter robust where raw conditional
    * estimates are sparse (every curation stack interpolates; raw
    * bigram LMs overfit rare prefixes). Same shapes as
    * `bigramCrossEntropy` plus one broadcast unigram-rate join;
    * identical rounded-term DECIMAL fold. */
  def interpolatedCrossEntropy(docs: DataFrame, contentCol: String = "text"): DataFrame = {
    val pairs = docs
      .select(col("doc_id"), tokens(col(contentCol)).as("tk"))
      .where(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(tk) - 1), " +
          "i -> struct(element_at(tk, i) AS prev, element_at(tk, i + 1) AS w))"))
        .as("p"))
      .select(col("doc_id"), col("p.prev").as("prev"), col("p.w").as("w"))
    val c2 = pairs.groupBy(col("prev"), col("w")).agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy(col("prev")).agg(sum(col("c2")).as("c1"))
    val uni = docs.select(explode(tokens(col(contentCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cu"))
    val total = uni.agg(sum(col("cu")).as("total"))
    val rate = c2.join(c1, "prev").join(uni, "w").crossJoin(broadcast(total))
      .select(col("prev"), col("w"),
        round(-log(
          lit(0.5) * (col("c2").cast("double") / col("c1")) +
            lit(0.5) * (col("cu").cast("double") / col("total"))), 6).as("nll"))
    val perDoc = pairs.join(rate, Seq("prev", "w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("nll").cast("decimal(18,6)")).cast("double").as("nll_sum"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("nll_sum"), (col("nll_sum") / col("n_bigrams")).as("cross_entropy"))
      .orderBy(col("doc_id"))
  }

  /** Jensen–Shannon divergence between two sources' unigram
    * distributions — the vocabulary-level corpus-drift metric (a
    * symmetric, bounded complement to the length-KS drift).
    * JSD = ½KL(p‖m) + ½KL(q‖m), m = (p+q)/2, in nats; absent words
    * contribute zero to their side's KL. One token-count shuffle
    * (O(vocab) rows); per-word terms rounded then DECIMAL-summed —
    * products only, no a·b−c·d shapes, so no FMA divergence. */
  def jsDivergence(docs: DataFrame, srcA: String = "src0", srcB: String = "src1",
                   contentCol: String = "text", by: String = "source"): DataFrame = {
    val cnt = docs.where(col(by).isin(srcA, srcB))
      .select(col(by).as("src"), explode(tokens(col(contentCol))).as("w"))
      .groupBy(col("w"))
      .agg(count(when(col("src") === srcA, 1)).as("ca"),
        count(when(col("src") === srcB, 1)).as("cb"))
    val totals = cnt.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    val terms = cnt.crossJoin(broadcast(totals))
      .select(
        when(col("ca") > 0, round(
          lit(0.5) * (col("ca").cast("double") / col("na")) *
            log((col("ca").cast("double") / col("na")) /
              ((col("ca").cast("double") / col("na") +
                col("cb").cast("double") / col("nb")) / 2)), 8))
          .otherwise(lit(0.0)).as("tp"),
        when(col("cb") > 0, round(
          lit(0.5) * (col("cb").cast("double") / col("nb")) *
            log((col("cb").cast("double") / col("nb")) /
              ((col("ca").cast("double") / col("na") +
                col("cb").cast("double") / col("nb")) / 2)), 8))
          .otherwise(lit(0.0)).as("tq"))
    terms.agg(count(lit(1)).as("n_vocab"),
      (sum(col("tp").cast("decimal(18,8)")) +
        sum(col("tq").cast("decimal(18,8)"))).cast("double").as("jsd_nats"))
  }

  /** Out-of-vocabulary rate against the corpus's own top-`vocabSize`
    * frequency vocabulary — the rare-token-density signal (tokenizer
    * coverage proxy; high OOV flags encoding damage or off-domain
    * text). The vocab is a distributed top-k (never a full sort) and
    * broadcasts back onto a per-token membership join. */
  def oovRate(docs: DataFrame, vocabSize: Int = 20,
              contentCol: String = "text"): DataFrame = {
    val tk = docs.select(col("doc_id"),
      explode(tokens(lower(col(contentCol)))).as("w"))
    val vocab = tk.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(vocabSize)
      .select(col("w"), lit(1).as("iv"))
    val pd = tk.join(broadcast(vocab), Seq("w"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("iv").isNull, 1L).otherwise(0L)).as("n_oov"))
    docs.select(col("doc_id"))
      .join(pd, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens")).as("oov_rate"))
      .orderBy(col("doc_id"))
  }

  /** Zipf's-law fit over the corpus vocabulary: OLS slope of
    * ln(freq) against ln(rank) — natural text sits near −1; heavy
    * boilerplate or deduplication damage shows up as a bent tail.
    * One token-count shuffle; ranks are then generated WITHOUT
    * sorting the vocabulary: the OLS sums only need the multiset of
    * (rank, cnt) pairs, and every word of a given cnt occupies a
    * contiguous rank run — so group to RUNS of equal cnt (a
    * cumulative window over O(distinct cnt) ≤ O(√tokens) rows),
    * then explode each run's rank range in 64k chunks, re-spread by
    * chunk so the cnt=1 mega-run parallelizes. Word-level tie-break
    * never reaches the sums. Per-term products are rounded then
    * DECIMAL-summed; the slope's a·b−c·d combination is emitted
    * through STAGED product columns and rounded to 4dp (the raw
    * combined double is FMA-contraction-unstable across engines —
    * same lesson as MMR's scoring). */
  def zipfFit(docs: DataFrame, contentCol: String = "text"): DataFrame = {
    val freq = docs.select(explode(tokens(lower(col(contentCol)))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val runs = freq.groupBy(col("cnt")).agg(count(lit(1)).as("c"))
      .withColumn("r1", sum(col("c")).over(w))
      .withColumn("r0", col("r1") - col("c") + 1)
    val chunk = 65536
    val ranks = runs
      .selectExpr("cnt", "r1", s"explode(sequence(r0, r1, $chunk)) AS cs")
      .repartition(col("cs"), col("cnt"))
      .selectExpr("cnt",
        s"explode(sequence(cs, least(cs + ${chunk - 1}, r1))) AS rnk")
    val terms = ranks
      .select(round(log(col("rnk").cast("double")), 6).as("x"),
        round(log(col("cnt").cast("double")), 6).as("y"))
      .select(col("x"), col("y"),
        round(col("x") * col("y"), 6).as("xy"),
        round(col("x") * col("x"), 6).as("xx"))
    val sums = terms.agg(count(lit(1)).as("n"),
      sum(col("x").cast("decimal(18,6)")).cast("double").as("sx"),
      sum(col("y").cast("decimal(18,6)")).cast("double").as("sy"),
      sum(col("xy").cast("decimal(18,6)")).cast("double").as("sxy"),
      sum(col("xx").cast("decimal(18,6)")).cast("double").as("sxx"))
    sums.select(col("n").as("n_vocab"), col("sx"), col("sy"), col("sxy"), col("sxx"),
      round((col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx")), 4).as("zipf_slope"))
  }

  /** Heaps'-law fit V = K·N^β of vocabulary growth — Zipf's
    * companion law, the corpus-size planning tool (how big does the
    * vocab get at 10× the tokens?). The distributed trick: a word
    * type is "new" exactly once, at its FIRST document, so
    * min(doc_id) per word (ONE shuffle) turns the inherently
    * sequential "distinct-so-far" scan into per-doc new-type counts;
    * the cumulative (N, V) growth points then come from the banded
    * two-phase prefix sum over the O(docs) per-doc table — never a
    * single-partition window, never a second corpus pass. β and K
    * fit by log-log OLS under the `zipfFit` discipline: 6dp-rounded
    * staged products, DECIMAL sums, 4dp outputs (K uses the
    * 4dp-rounded β so both engines exponentiate the same number). */
  def heapsFit(docs: DataFrame, contentCol: String = "text",
               idCol: String = "doc_id"): DataFrame = {
    val t = docs.select(col(idCol).as("doc_id"),
      tokens(lower(col(contentCol))).as("tk"))
    val toks = t.select(col("doc_id"), explode(col("tk")).as("w"))
    val firstDoc = toks.groupBy(col("w")).agg(min(col("doc_id")).as("doc_id"))
    val nv = firstDoc.groupBy(col("doc_id")).agg(count(lit(1)).as("nv"))
    val dl = t.select(col("doc_id"), size(col("tk")).cast("long").as("dl"))
    // pin the O(docs) per-doc table: both banded prefix calls and
    // the final fit job would otherwise each re-tokenize the corpus
    // through this lineage (the rag_prf lesson)
    val perDoc = dl.join(nv, Seq("doc_id"), "left").na.fill(0L, Seq("nv"))
      .localCheckpoint()
    val band = expr("doc_id DIV 1024")
    val (p1, _) = Ranks.withGlobalPrefixSum(
      perDoc, band, Seq(col("doc_id")), col("dl"), "xn")
    val (p2, _) = Ranks.withGlobalPrefixSum(
      p1, band, Seq(col("doc_id")), col("nv"), "xv")
    val pts = p2
      .select((col("xn") + col("dl")).as("bign"), (col("xv") + col("nv")).as("v"))
      .where(col("bign") > 0 && col("v") > 0)
      .select(round(log(col("bign").cast("double")), 6).as("x"),
        round(log(col("v").cast("double")), 6).as("y"))
      .select(col("x"), col("y"),
        round(col("x") * col("y"), 6).as("xy"),
        round(col("x") * col("x"), 6).as("xx"))
    val sums = pts.agg(count(lit(1)).as("n"),
      sum(col("x").cast("decimal(18,6)")).cast("double").as("sx"),
      sum(col("y").cast("decimal(18,6)")).cast("double").as("sy"),
      sum(col("xy").cast("decimal(18,6)")).cast("double").as("sxy"),
      sum(col("xx").cast("decimal(18,6)")).cast("double").as("sxx"))
    val beta = round((col("n") * col("sxy") - col("sx") * col("sy")) /
      (col("n") * col("sxx") - col("sx") * col("sx")), 4)
    sums.select(col("n").cast("long").as("n_points"),
      beta.as("heaps_beta"),
      round(exp((col("sy") - beta * col("sx")) / col("n")), 4).as("heaps_k"))
  }

  /** Per-term burstiness (Fano factor of per-doc counts, Church &
    * Gale): content words CLUMP — a doc that says "parquet" once
    * says it again — while function words spread evenly; the
    * variance-to-mean ratio of a term's per-doc count separates the
    * two and flags boilerplate (ratio ≫ 1 with high df = repeated
    * template text). Zero-count docs enter the variance via the
    * algebraic form Σ(c−m)² = Σc² − (Σc)²/N, so only the (doc, term)
    * matches are ever materialized: one tf shuffle, one per-term
    * rollup of EXACT integer moments (Σc, Σc² as longs), then
    * model-sized double arithmetic for the top-`k` terms. */
  def burstiness(docs: DataFrame, k: Int = 20, minLen: Int = 3,
                 contentCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val t = docs.select(col(idCol).as("doc_id"),
      tokens(lower(col(contentCol))).as("tk"))
    val nDocs = t.agg(count(lit(1)).as("n"))
    val tf = t.select(col("doc_id"), explode(col("tk")).as("w"))
      .where(length(col("w")) >= minLen)
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
    val perTerm = tf.groupBy(col("w")).agg(
      count(lit(1)).as("df"),
      sum(col("c")).as("sc"),
      sum(col("c") * col("c")).as("scc"))
    val mean = col("sc").cast("double") / col("n")
    val variance = (col("scc").cast("double") -
      col("sc").cast("double") * col("sc") / col("n")) / (col("n") - 1)
    perTerm.crossJoin(broadcast(nDocs))
      .orderBy(col("sc").desc, col("w"))
      .limit(k)
      .select(col("w"), col("sc").cast("long").as("total_tf"),
        col("df").cast("long").as("df"),
        round(mean, 6).as("mean_tf"),
        round(variance / mean, 6).as("fano"))
      .orderBy(col("total_tf").desc, col("w"))
  }

  /** Mergeable distinct-count audit via HLL sketch UNION: each
    * source builds its own HyperLogLog sketch of content (one
    * partial-aggregating shuffle — sketches merge associatively, so
    * partitions combine map-side), the per-source sketches union
    * WITHOUT revisiting any data, and the union's estimate is
    * checked against the exact corpus-wide distinct. This is the
    * 100 TB distinct-count shape: per-shard sketches of kilobytes
    * each, unioned on the driver-side of one exchange, where an
    * exact global countDistinct would shuffle every distinct value.
    * Emits the estimate CONTRACT (within `tol`), not the
    * engine-specific estimate — the `q_approx_distinct`
    * determinism pattern. */
  def hllUnionAudit(docs: DataFrame, contentCol: String = "text",
                    by: String = "source", tol: Double = 0.05): DataFrame = {
    // null-source docs are outside the audit on BOTH sides (the
    // oracle's count(DISTINCT source) ignores nulls; keeping them in
    // the sketches but not the source count would skew the contract)
    val scoped = docs.where(col(by).isNotNull)
    val perSrc = scoped.groupBy(col(by))
      .agg(hll_sketch_agg(col(contentCol)).as("sk"))
    val unioned = perSrc.agg(
      count(lit(1)).as("n_sources"),
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val exact = scoped.agg(countDistinct(col(contentCol)).as("exact_docs"))
    unioned.crossJoin(exact).select(
      col("n_sources").cast("long").as("n_sources"),
      col("exact_docs").cast("long").as("exact_docs"),
      when(abs(col("est") - col("exact_docs")) <=
        lit(tol) * col("exact_docs"), 1L).otherwise(0L).as("union_ok"))
  }

  /** Token-count histogram in power-of-two bins: the one-glance
    * length-distribution profile a curation run starts from. The
    * bucket is floor(log2(n)) computed EXACTLY as the bit length of
    * the integer (length(bin(n)) − 1) — float log2 sits on exact-
    * power boundaries where libm implementations disagree. Empty
    * docs land in bucket −1. Map-only + one O(buckets) aggregate. */
  def tokenHistogram(docs: DataFrame, contentCol: String = "text"): DataFrame =
    docs.select(tokenCount(col(contentCol)).as("n"))
      .select(col("n"),
        when(col("n") === 0, lit(-1L))
          .otherwise((length(bin(col("n"))) - 1).cast("long")).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n")).as("min_tokens"), max(col("n")).as("max_tokens"))
      .orderBy(col("bucket"))

  /** Robust length-outlier stats via MAD (median absolute deviation):
    * median and MAD are exact interpolated percentiles (bit-equal to
    * quantile_cont in any engine), so the outlier count is exact.
    * NOTE this is inherently ≥2 sequential passes (MAD needs the
    * median first) and as written scans the length projection three
    * times; at 100 TB cache/checkpoint the one-column projection
    * once and swap `percentile` for `approx_percentile` — the
    * operator shape is unchanged. */
  def lengthMadOutliers(docs: DataFrame, contentCol: String = "text",
                        k: Double = 2.0): DataFrame = {
    val l = docs.select(length(col(contentCol)).cast("double").as("len"))
    val med = l.agg(expr("percentile(len, 0.5)").as("median_len"))
    val d = l.crossJoin(broadcast(med))
      .withColumn("dev", abs(col("len") - col("median_len")))
    val mad = d.agg(expr("percentile(dev, 0.5)").as("mad"))
    d.crossJoin(broadcast(mad))
      .agg(count(lit(1)).as("n_docs"),
        first(col("median_len")).as("median_len"),
        first(col("mad")).as("mad"),
        count(when(col("dev") > lit(k) * col("mad"), 1)).as("n_outliers"))
  }

  /** Stopwords the gopher-style rule checks for (small fixed list so
    * the oracle can inline it). */
  val GopherStopwords: Seq[String] = Seq("the", "a", "of", "to", "and", "in")

  /** Gopher-style document filter (per Rae et al.'s quality rules —
    * word-count band, mean-word-length band, alphabetic-word ratio,
    * required stopwords). Pure map-side row metrics + verdict; rows
    * carry the metrics so downstream can audit WHY a doc dropped. */
  def gopherFilter(docs: DataFrame, contentCol: String = "text",
                   minWords: Long = 50, maxWords: Long = 100000): DataFrame =
    gopherFilterUnordered(docs, contentCol, minWords, maxWords)
      .orderBy(col("doc_id"))

  /** The four gopher metric Columns (word count, summed word chars,
    * alphabetic-word count, stopword count) — the single source the
    * verdict, the audit columns, and the streaming gate all build
    * from. */
  private def gopherMetrics(contentCol: String)
      : (org.apache.spark.sql.Column, org.apache.spark.sql.Column,
         org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    val tk = tokens(col(contentCol))
    val nWords = size(tk).cast("long")
    val charSum = aggregate(transform(tk, w => length(w).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val nAlpha = size(filter(tk, w => w.rlike("[A-Za-z]"))).cast("long")
    val nStop = size(filter(tk, w => w.isin(GopherStopwords: _*))).cast("long")
    (nWords, charSum, nAlpha, nStop)
  }

  /** Null divisor when a doc has no tokens: division yields NULL
    * (matching DuckDB's x/0) instead of the ANSI DIVIDE_BY_ZERO
    * error Spark 4 raises by default. */
  private def nzWords(nWords: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(nWords > 0, nWords)

  /** The verdict from already-computed metric Columns — shared by
    * the standalone expression and the audit filter so the metrics
    * are built (and evaluated) exactly once per row. A token-less
    * doc yields NULL ratios → NULL verdict → keep = 0 / filtered. */
  private def gopherKeepFrom(nWords: org.apache.spark.sql.Column,
                             charSum: org.apache.spark.sql.Column,
                             nAlpha: org.apache.spark.sql.Column,
                             nStop: org.apache.spark.sql.Column,
                             minWords: Long, maxWords: Long): org.apache.spark.sql.Column =
    nWords.between(minWords, maxWords) &&
      (charSum.cast("double") / nzWords(nWords)).between(3.0, 10.0) &&
      nAlpha.cast("double") / nzWords(nWords) >= 0.8 && nStop >= 2

  /** The gopher verdict as a single boolean Column — usable as a
    * plain `where` filter on batch or streaming frames (no join, no
    * state). */
  def gopherKeepExpr(contentCol: String = "text",
                     minWords: Long = 50, maxWords: Long = 100000): org.apache.spark.sql.Column = {
    val (nWords, charSum, nAlpha, nStop) = gopherMetrics(contentCol)
    gopherKeepFrom(nWords, charSum, nAlpha, nStop, minWords, maxWords)
  }

  /** The map-only part of the gopher filter (no output sort) — the
    * form that lifts unchanged into Structured Streaming. The verdict
    * is derived from the SAME projected metric columns it reports, so
    * the interpreted token lambdas run once per metric, not twice. */
  def gopherFilterUnordered(docs: DataFrame, contentCol: String = "text",
                            minWords: Long = 50, maxWords: Long = 100000): DataFrame = {
    val (nWords, charSum, nAlpha, nStop) = gopherMetrics(contentCol)
    docs.select(col("doc_id"), nWords.as("n_words"), charSum.as("char_sum"),
        nAlpha.as("n_alpha"), nStop.as("n_stop"))
      .select(col("doc_id"), col("n_words"),
        round(col("char_sum").cast("double") / nzWords(col("n_words")), 4).as("mean_word_len"),
        round(col("n_alpha").cast("double") / nzWords(col("n_words")), 4).as("alpha_ratio"),
        col("n_stop"),
        when(gopherKeepFrom(col("n_words"), col("char_sum"), col("n_alpha"),
          col("n_stop"), minWords, maxWords), 1L).otherwise(0L).as("keep"))
  }

  /** Per-source content-length quartiles via ntile. The window is
    * partitioned by source, so at scale each source sorts
    * independently across the cluster — no global sort. */
  def lengthQuartiles(docs: DataFrame, contentCol: String = "text",
                      by: String = "source"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(by)).orderBy(length(col(contentCol)), col("doc_id"))
    docs.select(col(by), length(col(contentCol)).cast("long").as("len"),
        ntile(4).over(w).cast("long").as("quartile"))
      .groupBy(col(by), col("quartile"))
      .agg(count(lit(1)).as("n"), min(col("len")).as("min_len"),
        max(col("len")).as("max_len"))
      .orderBy(col(by), col("quartile"))
  }

  /** Top-k words per source: two-level aggregation (word counts
    * partial-agg map-side, then a per-source window over the already
    * tiny (source, word, freq) set). The window input is the grouped
    * counts, never the exploded tokens. */
  def topWordsPerSource(docs: DataFrame, contentCol: String = "text",
                        by: String = "source", minLen: Int = 3, k: Int = 5): DataFrame = {
    val counts = docs
      .select(col(by), explode(tokens(lower(col(contentCol)))).as("word"))
      .where(length(col("word")) > minLen)
      .groupBy(col(by), col("word")).agg(count(lit(1)).as("freq"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(by)).orderBy(col("freq").desc, col("word"))
    counts.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select(col(by), col("rnk"), col("word"), col("freq"))
      .orderBy(col(by), col("rnk"))
  }

  /** Lexical diversity per document: type-token ratio and hapax
    * (once-only) counts. One explode + two-level aggregation — the
    * per-(doc, token) counts partial-aggregate map-side, and the
    * per-doc rollup rides the same doc_id hash partitioning. The
    * ratio is ppm by integer floor division (exact cross-engine). */
  def typeTokenStats(docs: DataFrame, contentCol: String = "text"): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(tokens(lower(col(contentCol)))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("n"))
    tf.groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("n") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .withColumn("ttr_ppm", expr("n_types * 1000000 div n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** HTML boilerplate stripping — the first pass of every web-corpus
    * curation stack: drop tags, decode the core entities, collapse
    * whitespace; report what was removed. Map-only (one regex pass
    * per doc, whole-stage codegen'd), no shuffle at all; the
    * patterns are deliberately RE2-safe so the Spark (Java regex)
    * and oracle (RE2) replays agree byte for byte. */
  def htmlStrip(docs: DataFrame, contentCol: String = "text"): DataFrame = {
    val unescaped = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&amp;" -> "&")
      .foldLeft(regexp_replace(col(contentCol), "<[^>]*>", " ")) {
        case (c, (ent, ch)) => regexp_replace(c, ent, ch)
      }
    docs.select(col("doc_id"),
        length(col(contentCol)).cast("long").as("raw_len"),
        size(expr(s"regexp_extract_all($contentCol, '<[^>]*>', 0)")).cast("long").as("n_tags"),
        trim(regexp_replace(unescaped, "\\s+", " ")).as("clean_text"))
      .withColumn("clean_len", length(col("clean_text")).cast("long"))
      .withColumn("removed_ppm",
        expr("(raw_len - clean_len) * 1000000 div greatest(raw_len, 1)"))
      .select(col("doc_id"), col("raw_len"), col("n_tags"),
        col("clean_len"), col("removed_ppm"), col("clean_text"))
      .orderBy(col("doc_id"))
  }

  /** RAKE keyword extraction (Rose et al. 2010): candidate phrases
    * are maximal stopword-free token runs; each word scores
    * degree/freq over the phrase corpus (degree = total length of
    * phrases it appears in) and a phrase scores the sum of its
    * words' scores. Everything through phrase assembly is per-doc
    * (gaps-and-islands window over token positions); the word-stat
    * and phrase-score aggregations hash on word/phrase with map-side
    * partials, and the final top-k is TakeOrdered — no global sort
    * materializes. Word scores are rounded then DECIMAL-summed. */
  def rakeKeywords(docs: DataFrame, contentCol: String = "text", topK: Int = 20,
                   maxPhraseLen: Int = 4): DataFrame = {
    val toks = docs
      .select(col("doc_id"), posexplode(tokens(lower(col(contentCol)))).as(Seq("pos", "tok")))
      .where(col("tok").rlike("^[a-z]+$"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val phrases = toks.where(!col("tok").isin(Stopwords: _*))
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(array_join(transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
        x => x("tok")), " ").as("phrase"),
        count(lit(1)).as("plen"))
      .where(col("plen") <= maxPhraseLen)
    val words = phrases.select(col("plen"), explode(split(col("phrase"), " ")).as("w"))
    val wstats = words.groupBy(col("w"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("degree"))
      .select(col("w"), round(col("degree").cast("double") / col("freq"), 6).as("wscore"))
    val ph = phrases.groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_occur"), min(col("plen")).as("plen"))
    ph.select(col("phrase"), col("n_occur"), col("plen"),
        explode(split(col("phrase"), " ")).as("w"))
      .join(wstats, "w")
      .groupBy(col("phrase"), col("n_occur"), col("plen"))
      .agg(sum(col("wscore").cast("decimal(18,6)")).cast("double").as("score"))
      .orderBy(col("score").desc, col("phrase"))
      .limit(topK)
  }

  /** Character-class profile per source: letters / digits /
    * whitespace / CJK / other counts — the cheap encoding-damage and
    * language-mix screen (a "en" source suddenly heavy in `other` is
    * mojibake; CJK mass in a Latin corpus is mislabeled routing).
    * Class counts are length-minus-stripped (one regex pass per
    * class, map-only, codegen'd); one small aggregation per source. */
  def scriptMix(docs: DataFrame, contentCol: String = "text"): DataFrame = {
    def cnt(pattern: String) =
      (length(col(contentCol)) -
        length(regexp_replace(col(contentCol), pattern, ""))).cast("long")
    docs
      .select(col("source"),
        length(col(contentCol)).cast("long").as("n_chars"),
        cnt("[A-Za-z]").as("n_letter"),
        cnt("[0-9]").as("n_digit"),
        cnt("\\s").as("n_space"),
        cnt("[\\x{4E00}-\\x{9FFF}]").as("n_cjk"))
      .groupBy(col("source"))
      .agg(sum(col("n_chars")).as("n_chars"),
        sum(col("n_letter")).as("n_letter"),
        sum(col("n_digit")).as("n_digit"),
        sum(col("n_space")).as("n_space"),
        sum(col("n_cjk")).as("n_cjk"),
        sum(col("n_chars") - col("n_letter") - col("n_digit") -
          col("n_space") - col("n_cjk")).as("n_other"))
      .orderBy(col("source"))
  }

  /** One BPE training step: the weighted adjacent-symbol-pair counts
    * a byte-pair-encoding tokenizer ranks to pick its next merge
    * (Sennrich et al. 2016). Restricted to ASCII-lowercase word
    * types so char indexing is engine-exact. Scale shape: the corpus
    * collapses to its word-type frequency table first (one hash
    * shuffle, map-side partials), so the pair explode runs over
    * O(vocab) rows, not O(tokens); the final ranking window sees at
    * most 26² distinct pairs — driver-trivial at any corpus size. */
  def bpePairStats(docs: DataFrame, contentCol: String = "text", topK: Int = 20): DataFrame = {
    val words = docs
      .select(explode(tokens(lower(col(contentCol)))).as("w"))
      .where(col("w").rlike("^[a-z]+$") && length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    val pairs = words
      .select(col("w"), col("freq"), explode(expr(
        "transform(sequence(1, length(w) - 1), " +
          "i -> concat(substring(w, i, 1), ' ', substring(w, i + 1, 1)))")).as("pair"))
      .groupBy(col("pair"))
      .agg(sum(col("freq")).as("pair_freq"),
        countDistinct(col("w")).as("n_word_types"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("pair_freq").desc, col("pair"))
    pairs.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= topK)
      .select(col("rnk"), col("pair"), col("pair_freq"), col("n_word_types"))
      .orderBy(col("rnk"))
  }

  /** CCNet-style perplexity bucketing: documents split into
    * head/middle/tail tertiles by their unigram-LM cross-entropy
    * (Wenzek et al. 2020 keep the head, drop the tail). Exact
    * NTILE(3) semantics under the fully tie-broken (entropy, doc_id)
    * order, computed WITHOUT a global window: entropy-boundary bands
    * (one approx_percentile aggregate — precision affects only
    * balance) → exact per-band counts → driver prefix offsets →
    * per-band row_number + offset → tertile by rank arithmetic
    * (`Ranks.ntileFromRank`). The scored table is persisted across
    * the two phase-1 aggregates, then released. */
  def perplexityBuckets(docs: DataFrame, contentCol: String = "text"): DataFrame = {
    val scored = unigramCrossEntropy(docs, contentCol)
      .where(col("cross_entropy").isNotNull)
      .persist()
    val bs = Ranks.percentileBoundaries(scored, col("cross_entropy"), 32)
    val band = Ranks.valueBands(col("cross_entropy"), bs)
    val (ranked, n) = Ranks.withGlobalRank(scored, band,
      Seq(col("cross_entropy"), col("doc_id")), "rnk")
    scored.unpersist()
    ranked.withColumn("bucket", Ranks.ntileFromRank("rnk", 3, n))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        round(min(col("cross_entropy")), 6).as("min_ce"),
        round(max(col("cross_entropy")), 6).as("max_ce"))
      .orderBy(col("bucket"))
  }

  /** Corpus-order n-gram novelty: for each document, how many of its
    * distinct word 8-grams appear in ANY earlier document (doc_id
    * order = ingestion order). The "seen before" set is one global
    * min(doc_id)-per-gram aggregation — O(distinct grams), hashed,
    * no timeline sort — joined back on the same gram partitioning.
    * The novelty curve of a growing corpus is the curation signal
    * for "are new sources still adding new content?". */
  def ngramNovelty(docs: DataFrame, contentCol: String = "text", n: Int = 8): DataFrame = {
    val grams = graft.operators.Shingling
      .explodedGrams(docs, contentCol, "doc_id", n)
      .select(col("doc_id"), md5Long(col("g")).as("gh"))
      .distinct()
    // round 15 (guide §2.4): for a gram of doc d, first_doc ≤ d, so
    // "seen before" ⟺ "not owned first": n_seen = n_grams − n_first,
    // with n_first read off the firsts table itself — the corpus-
    // scale join back on the gram hash disappears outright
    val counts = grams.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
    val firstCounts = grams
      .groupBy(col("gh")).agg(min(col("doc_id")).as("first_doc"))
      .groupBy(col("first_doc")).agg(count(lit(1)).as("n_first"))
    val perDoc = counts
      .join(firstCounts, col("doc_id") === col("first_doc"), "left")
      .select(col("doc_id"), col("n_grams"),
        (col("n_grams") - coalesce(col("n_first"), lit(0L))).as("n_seen"))
      .withColumn("novel_ppm", expr("(n_grams - n_seen) * 1000000 div n_grams"))
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_seen"), lit(0L)).as("n_seen"),
        coalesce(col("novel_ppm"), lit(1000000L)).as("novel_ppm"))
      .orderBy(col("doc_id"))
  }

  /** Code-vs-prose heuristic — the curation signal that routes
    * source-code documents to a code pipeline (different tokenizer,
    * different dedup) instead of the prose one. Two deterministic
    * surface features: the ratio of code-ish symbol characters
    * and the count of distinct programming keywords present; the
    * score blends both, clamped. Map-only, oracle-replayable. */
  def codeDetect(docs: DataFrame): DataFrame = {
    val kws = Seq("def", "class", "return", "import", "for",
      "while", "if", "function", "var", "let", "const")
    val sym = length(col("text")) -
      length(regexp_replace(col("text"), "[{}()\\[\\]=<>;]", ""))
    val symRatio = round(sym.cast("double") / length(col("text")), 4)
    val tk = tokens(lower(col("text")))
    val kwHits = size(filter(array(kws.map(lit): _*),
      k => array_contains(tk, k))).cast("long")
    docs.where(col("text").isNotNull && length(col("text")) > 0)
      .select(col("doc_id"),
        symRatio.as("symbol_ratio"),
        kwHits.as("kw_hits"),
        round(least(lit(1.0), symRatio * 20) * 0.6 +
          least(lit(1.0), kwHits.cast("double") / 3.0) * 0.4, 4).as("code_score"))
      .orderBy(col("doc_id"))
  }

  /** The default expectation suite for the documents corpus —
    * the named row-level contracts a curation zone declares. */
  def defaultExpectations: Seq[(String, org.apache.spark.sql.Column)] = Seq(
    "text_not_null" -> col("text").isNotNull,
    "min_length_100" -> (length(col("text")) >= 100),
    "latin_lang" -> col("lang").isin("en", "de", "fr", "es"),
    "n_chars_consistent" -> (col("n_chars") === length(col("text"))))

  /** Declarative data EXPECTATIONS (the Delta Live Tables pattern):
    * evaluate named rule predicates per row and tag each row with the
    * sorted list of rules it violates — empty list = clean row. A
    * null predicate result counts as a violation (SQL three-valued
    * logic must not smuggle bad rows past a gate). Map-only. */
  def expectations(df: DataFrame,
                   rules: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    val flags = array(rules.map { case (name, pred) =>
      when(!coalesce(pred, lit(false)), lit(name))
    }: _*)
    df.withColumn("failed_rules", array_sort(filter(flags, x => x.isNotNull)))
  }

  /** Per-rule violation report over `rules`: one row per rule with
    * the corpus size, violation count, and violation rate — the
    * quality dashboard a curation zone publishes next to its data.
    * ONE aggregate pass (a conditional sum per rule), then the
    * single result row unpivots to O(rules) output rows. */
  def expectationReport(df: DataFrame,
                        rules: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    val flagged = expectations(df, rules)
    val aggs = count(lit(1)).as("n_rows") +:
      rules.map { case (name, _) =>
        sum(array_contains(col("failed_rules"), name).cast("long")).as(s"f_$name")
      }
    val one = flagged.agg(aggs.head, aggs.tail: _*)
    val stacked = rules.map { case (name, _) =>
      s"'$name', f_$name"
    }.mkString(", ")
    one.selectExpr("n_rows", s"stack(${rules.size}, $stacked) AS (rule, n_fail)")
      .select(col("rule"), col("n_rows"), col("n_fail"),
        round(col("n_fail").cast("double") / col("n_rows"), 4).as("fail_rate"))
      .orderBy(col("rule"))
  }
}
