package graft.operators

import graft.functions.HashFunctions
import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Corpus-trained word embeddings — GloVe (Pennington, Socher &
  * Manning, EMNLP 2014) as a fully deterministic, oracle-replayable
  * distributed trainer. This closes the one pipeline stage the
  * engine still simulated: the reference's embedding stage
  * (/root/reference/README.md architecture — documents are embedded
  * before indexing/retrieval) has until now been represented by
  * hash-feature vectors; here the vectors are LEARNED from the
  * corpus's own co-occurrence statistics.
  *
  * Scale shape — the two halves scale differently and are split
  * accordingly:
  *   1. CO-OCCURRENCE (corpus-scale, once): pairs are generated
  *      MAP-SIDE from each doc's token array (a nested `transform`
  *      over the array — no self-join, no shuffle per window
  *      position), filtered to the vocab by broadcast join, and
  *      reduced to the X_ij matrix with one shuffle keyed on
  *      (i, j). At 100 TB this is the only big job, and it is one
  *      explode + one partially-aggregated groupBy.
  *   2. TRAINING (model-scale, iterated): X is at most V² rows; the
  *      AdaGrad loop joins it against V·dim-row state tables. Every
  *      step is a handful of broadcast-sized joins — the driver
  *      never holds the corpus, and the loop cost is independent of
  *      corpus size.
  *
  * Determinism discipline (the emb_kmeans_update / power-iteration
  * contract, so DuckDB replays the whole trainer bit-for-bit):
  *   - every SUM whose order Spark does not define is a DECIMAL sum
  *     of per-term ROUNDED products (order-free, exact). Scale 8,
  *     deliberately not higher: DuckDB's round(x, s) computes
  *     round(x·10^s)/10^s in doubles, so at scale 10 the grid-level
  *     ulp error (~2e-7 for x≈0.1) flips boundary cases against
  *     the JVM's string-exact rounding — measured once per ~50k
  *     roundings. At scale 8 the grid error is ~2e-11: safe;
  *   - ln and pow — the only non-IEEE-portable ops — are rounded to
  *     6 dp immediately (f and log X are constants of the run);
  *   - +, −, ×, ÷, sqrt are correctly-rounded IEEE ops, identical
  *     in every engine, so state updates need no re-rounding;
  *   - init is md5-derived from (salt, word, dim): reproducible
  *     anywhere, no RNG state to ship.
  */
object Glove {

  /** Tie-break epsilon, +2⁻³³ (binary-exact, so the add is the same
    * IEEE op in every engine): the md5 init lies on a 5-dp decimal
    * grid, so step-1 products are EXACT 10-dp decimals that land
    * precisely ON .5 rounding boundaries — where the JVM's
    * string-exact HALF_UP and DuckDB's double-multiply rounding
    * disagree (measured: 3 flipped weights at sf0.01). Every round
    * in the trainer adds this epsilon first: exact ties move
    * strictly above the boundary (both engines round up), and
    * generic values move by 1.2e-10 — orders of magnitude beyond
    * any engine's rounding error at these scales. */
  private[graft] val TieEps: Double = java.lang.Math.pow(2, -33)

  /** round with the tie-break epsilon — the ONLY rounding the GloVe
    * family uses. */
  private[graft] def rnd(c: Column, s: Int): Column = round(c + lit(TieEps), s)

  val VocabSize = 32
  val WindowSize = 2
  val Dim = 8
  val Steps = 3
  val Lr = 0.05

  /** The SCALED model configuration (round-13): the toy constants
    * above demonstrate the loop at V·dim = 256 parameters; these run
    * it at V·dim = 32k parameters with X in the 10⁵–10⁶-cell range
    * at sf0.1 — the same code path, three orders up. The synthetic
    * corpus has only 31 distinct words, so the scaled vocabulary is
    * MIXED-GRANULARITY: units are word n-grams of length 1..3 (the
    * wordpiece-style vocab shape), whose chaining structure
    * ("a_b" always co-occurs with "b_c" when "a b c" occurs) gives
    * the scaled model real distributional signal to learn.
    * ScaledTermScale = 6, not 8: the dot/gradient term roundings
    * number ~10⁷ per training at these sizes, and DuckDB's
    * double-multiply round has a flip band proportional to
    * ulp(x·10^s) — at scale 6 the expected cross-engine flips over
    * the whole chain are ≪ 1 (measured rate at scale 10 was 1 per
    * ~50k roundings; each scale step divides it by 10). */
  val ScaledV = 1024
  val ScaledWindow = 4
  val ScaledDim = 32
  val ScaledSteps = 2
  val ScaledMaxGram = 3
  val ScaledTermScale = 6

  /** The token-unit array: whitespace words for maxGram = 1, else
    * all word n-grams of length 1..maxGram in (position, length)
    * order, joined by '_' — map-only, mirrored term for term by the
    * oracle's list_transform replay. */
  private[graft] def unitsOf(c: Column, maxGram: Int): Column =
    if (maxGram == 1) tokens(lower(c))
    else {
      // level-wise construction (round 14, guide §1.2 per-task work):
      // the former per-position lambda did a slice + array_join + a
      // sequence allocation for every (position, gram) cell —
      // higher-order lambdas evaluate interpreted, and that nest was
      // ~9.5 s of the 11 s co-occurrence pass at sf0.1. Build each
      // gram level as ONE zip_with over the token array (u_g =
      // u_{g-1} ⧺ "_" ⧺ tk shifted by g−1; zip_with pads the short
      // side with null and concat propagates it, which reproduces
      // the old `when(p + g <= size(tk), …)` out-of-range null),
      // then interleave position-major via arrays_zip — the exact
      // (position, length)-ordered, null-filtered unit array as
      // before, term for term.
      val tk = tokens(lower(c))
      val n = size(tk)
      val levels = (2 to maxGram).scanLeft(tk) { (prev, g) =>
        zip_with(prev, slice(tk, lit(g), n), (xy, z) => concat(xy, lit("_"), z))
      }
      val zipped = arrays_zip(levels.zipWithIndex.map {
        case (l, i) => l.as(s"g$i")
      }: _*)
      filter(
        flatten(transform(zipped, s =>
          array(levels.indices.map(i => s.getField(s"g$i")): _*))),
        u => u.isNotNull)
    }

  /** Top-`v` lowercased units by (count DESC, unit ASC), with dense
    * rank i ∈ [0, v). The global sort is a distributed top-k
    * (orderBy + limit); only the v survivors see the
    * single-partition row_number window — model-sized by then. */
  def vocab(docs: DataFrame, v: Int = VocabSize,
            contentCol: String = "text", maxGram: Int = 1): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("w"))
    docs.select(explode(unitsOf(col(contentCol), maxGram)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(v)
      .withColumn("i", (row_number().over(w) - 1).cast("long"))
      .select(col("w"), col("i"))
  }

  /** The symmetric co-occurrence matrix X over the vocab: for every
    * ordered in-window pair at distance d ≤ `window`, both (a,b) and
    * (b,a) accumulate 1/d (the GloVe distance weighting), summed as
    * DECIMAL(18,6) — exact for window ≤ 2 and order-free always.
    * Pair generation is map-only (nested transform over the token
    * array); the vocab gate is a broadcast semi-side join. */
  def cooc(docs: DataFrame, v: Int = VocabSize, window: Int = WindowSize,
           contentCol: String = "text", maxGram: Int = 1): DataFrame =
    coocWithVocab(docs, broadcast(vocab(docs, v, contentCol, maxGram)),
      window, contentCol, maxGram)

  /** The directed in-window pair stream (a, b, dist) — map-only, the
    * shared generator under both cooc forms. */
  private def pairsOf(docs: DataFrame, window: Int, contentCol: String,
                      maxGram: Int): DataFrame = docs
    .select(unitsOf(col(contentCol), maxGram).as("tk"))
    .where(size(col("tk")) > 1)
    .select(explode(expr(
      s"""flatten(transform(tk, (wa, p) ->
         |  transform(slice(tk, p + 2, $window), (wb, d) ->
         |    struct(wa AS a, wb AS b, d + 1 AS dist))))""".stripMargin)).as("pr"))
    .select(col("pr.a").as("a"), col("pr.b").as("b"), col("pr.dist").as("dist"))

  /** Co-occurrence against an EXPLICIT vocab table (w, i) — the seam
    * the held-out evaluation needs: test-half counts gated on the
    * train-half vocabulary. */
  private[graft] def coocWithVocab(docs: DataFrame, vb: DataFrame,
                                   window: Int, contentCol: String,
                                   maxGram: Int): DataFrame = {
    // X = A + Aᵀ over the DIRECTED table (the fold
    // [[coocDirectedWithVocab]] documents): the corpus-scale
    // aggregation shuffles the directed pair stream ONCE instead of
    // the former self-union's doubled stream (guide §2.3 — shuffle
    // fewer bytes; the symmetrization moves to the model-scale X
    // table). Decimal sums are exact, so the regrouped fold is
    // bit-equal to summing both directions in one pass; the cast
    // pins the former sum-of-terms output type.
    val a = coocDirectedWithVocab(docs, vb, window, contentCol, maxGram)
    a.unionByName(a.select(col("ib").as("ia"), col("ia").as("ib"), col("x")))
      .groupBy(col("ia"), col("ib"))
      .agg(sum(col("x")).cast("decimal(28,6)").as("x"))
  }

  /** The DIRECTED co-occurrence counts (no symmetric union) —
    * STREAM-SAFE: one map-side explode + one keyed aggregation, no
    * self-union, so a `readStream` document source flows through it
    * in complete mode with O(V²) bounded state. The symmetric X is
    * X = A + Aᵀ, a model-scale fold over the final table (decimal
    * sums make the split exact). */
  def coocDirectedWithVocab(docs: DataFrame, vb: DataFrame,
                            window: Int = WindowSize,
                            contentCol: String = "text",
                            maxGram: Int = 1): DataFrame =
    pairsOf(docs, window, contentCol, maxGram)
      .join(vb.select(col("w").as("a"), col("i").as("ia")), "a")
      .join(vb.select(col("w").as("b"), col("i").as("ib")), "b")
      .groupBy(col("ia"), col("ib"))
      .agg(sum((lit(1.0) / col("dist")).cast("decimal(18,6)")).as("x"))

  /** X with its run constants: f = min((x/xmax)^0.75, 1) and ln x,
    * both rounded to 6 dp at birth (pow/ln are the only ops whose
    * low bits differ across engines). */
  private def pairsWithConstants(x: DataFrame): DataFrame = {
    val xmax = x.agg(max(col("x")).as("xmax"))
    x.crossJoin(broadcast(xmax))
      .select(col("ia"), col("ib"),
        rnd(log(col("x").cast("double")), 6).as("logx"),
        rnd(least(pow(col("x").cast("double") / col("xmax").cast("double"),
          lit(0.75)), lit(1.0)), 6).as("f"))
  }

  /** md5-seeded init in [−0.05, 0.05): one value per (word, dim),
    * identical arithmetic to the oracle's replay. */
  private def seeded(salt: String): Column =
    (HashFunctions.md5Long(concat(lit(s"$salt:"), col("word"), lit(":"), col("k")))
      % 10000).cast("double") / lit(100000.0) - lit(0.05)

  /** The trained state: word-vector table W, context table C, bias
    * table B, and the per-step full-batch losses (for the
    * loss-decrease pin — training that does not descend is a bug). */
  final case class Trained(w: DataFrame, c: DataFrame, b: DataFrame,
                           vocab: DataFrame, losses: Seq[Double])

  // One training serves every consumer (emb_glove_train/loss,
  // rag_retrieve_trained, emb_infer_trained) — the Unigram
  // chainCache discipline verbatim: keyed on (application, corpus
  // fingerprint, canonical plan hash, params); values are COLLECTED
  // model-sized rows, not DataFrames (cached frames pin
  // localCheckpoint blocks that cache-hygiene sweeps destroy);
  // in-memory inputs (no file listing to fingerprint) train fresh so
  // specs stay isolated.
  private final case class TrainedRows(
      w: (StructType, Array[Row]), c: (StructType, Array[Row]),
      b: (StructType, Array[Row]), vocab: (StructType, Array[Row]),
      losses: Seq[Double])
  private val memoCap = 4
  private val memo = new java.util.LinkedHashMap[String, TrainedRows](8, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String, TrainedRows]): Boolean =
      size > memoCap
  }

  /** Drop every memoized training (round 15): the bench's
    * `emb_glove_train_cold` row times the scaled training from
    * parquet, not the memo-warm serve. Test/bench hook only. */
  private[graft] def clearMemo(): Unit = memo.synchronized(memo.clear())
  // per-key in-flight futures: the memo lock is held only for get/put
  // (microseconds), never across the multi-job Spark training, so two
  // callers training DIFFERENT corpora/params proceed concurrently
  // while a second caller on the SAME key awaits the first's result
  private val inflight =
    new java.util.concurrent.ConcurrentHashMap[
      String, java.util.concurrent.CompletableFuture[TrainedRows]]()

  /** Full-batch AdaGrad on the GloVe objective
    * J = Σ f(X_ij)·(wᵢ·cⱼ + bᵢ + bcⱼ − ln X_ij)², `steps` rounds.
    * Memoized per (corpus, params): the bench's four glove entries
    * pay ONE training. */
  def train(docs: DataFrame, v: Int = VocabSize, window: Int = WindowSize,
            dim: Int = Dim, steps: Int = Steps, lr: Double = Lr,
            contentCol: String = "text", maxGram: Int = 1,
            termScale: Int = 8): Trained = {
    if (docs.inputFiles.isEmpty)
      return trainFresh(docs, v, window, dim, steps, lr, contentCol,
        maxGram, termScale)
    val spark = docs.sparkSession
    val key = Seq(
      spark.sparkContext.applicationId,
      graft.sources.ZoneCache.corpusFingerprint(docs),
      docs.queryExecution.analyzed.canonicalized.semanticHash().toString,
      v, window, dim, steps, lr, contentCol, maxGram, termScale).mkString("|")
    def memoGet: Option[TrainedRows] =
      memo.synchronized(Option(memo.get(key)))
    def computeAndPut(): TrainedRows = {
      val t = trainFresh(docs, v, window, dim, steps, lr, contentCol,
        maxGram, termScale)
      val fresh = TrainedRows(
        (t.w.schema, t.w.collect()), (t.c.schema, t.c.collect()),
        (t.b.schema, t.b.collect()), (t.vocab.schema, t.vocab.collect()),
        t.losses)
      memo.synchronized(memo.put(key, fresh))
      fresh
    }
    val rows = memoGet.getOrElse {
      val mine = new java.util.concurrent.CompletableFuture[TrainedRows]()
      val winner = inflight.putIfAbsent(key, mine)
      if (winner == null) {
        try {
          // double-check under the race: a concurrent trainer may have
          // finished between the memo miss and the inflight claim
          val fresh = memoGet.getOrElse(computeAndPut())
          mine.complete(fresh)
          fresh
        } catch {
          case t: Throwable => mine.completeExceptionally(t); throw t
        } finally inflight.remove(key)
      } else winner.join() // same key already training: await its result
    }
    def df(p: (StructType, Array[Row])): DataFrame =
      spark.createDataFrame(java.util.Arrays.asList(p._2: _*), p._1)
    Trained(df(rows.w), df(rows.c), df(rows.b), df(rows.vocab), rows.losses)
  }

  private def trainFresh(docs: DataFrame, v: Int, window: Int,
                         dim: Int, steps: Int, lr: Double,
                         contentCol: String, maxGram: Int = 1,
                         termScale: Int = 8): Trained = {
    val voc = vocab(docs, v, contentCol, maxGram).localCheckpoint(true)
    val px = pairsWithConstants(
        coocWithVocab(docs, broadcast(voc), window, contentCol, maxGram))
      .localCheckpoint(true) // ≤ V² rows — the whole training set
    val ks = voc.select(col("i"), col("w").as("word"))
      .select(col("i"), col("word"),
        explode(sequence(lit(0), lit(dim - 1))).as("k"))
    var wT = ks.select(col("i"), col("k"),
      seeded("gw").as("v"), lit(0.0).as("a")).localCheckpoint(true)
    var cT = ks.select(col("i"), col("k"),
      seeded("gc").as("v"), lit(0.0).as("a")).localCheckpoint(true)
    var bT = voc.select(col("i"), lit(0.0).as("b"), lit(0.0).as("ab"),
      lit(0.0).as("c"), lit(0.0).as("ac")).localCheckpoint(true)
    val losses = scala.collection.mutable.ArrayBuffer.empty[Double]
    (1 to steps).foreach { _ =>
      // err per pair: order-free decimal dot + IEEE bias adds, then
      // ONE round — same 6 dp the oracle applies at the same spot
      // round 15: the factor tables are model-scale by construction
      // (V×dim rows, V bounded by the vocab param) — broadcast them
      // so the px×dim intermediate is never shuffled (guide §3.1)
      val dot = px
        .join(broadcast(wT.select(col("i").as("ia"), col("k"), col("v").as("wv"))), "ia")
        .join(broadcast(cT.select(col("i").as("ib"), col("k"), col("v").as("cv"))), Seq("ib", "k"))
        .groupBy(col("ia"), col("ib"), col("f"), col("logx"))
        .agg(sum(rnd(col("wv") * col("cv"), termScale).cast("decimal(28,8)"))
          .cast("double").as("dot"))
      val err = dot
        .join(broadcast(bT.select(col("i").as("ia"), col("b"))), "ia")
        .join(broadcast(bT.select(col("i").as("ib"), col("c").as("bc"))), "ib")
        .select(col("ia"), col("ib"), col("f"),
          rnd(col("dot") + col("b") + col("bc") - col("logx"), 6).as("err"))
        .withColumn("coef", rnd(lit(2.0) * col("f") * col("err"), 6))
        .localCheckpoint(true)
      // null-safe: a corpus with no co-occurring vocab pairs (every
      // doc under 2 tokens) has an EMPTY err frame — its loss is 0,
      // not an NPE out of a null SUM
      losses += Option(err
        .agg(sum(rnd(col("f") * col("err") * col("err"), termScale)
          .cast("decimal(28,8)")).cast("double"))
        .head().get(0)).map(_.asInstanceOf[Double]).getOrElse(0.0)
      val gw = err
        .join(broadcast(cT.select(col("i").as("ib"), col("k"), col("v").as("cv"))), "ib")
        .groupBy(col("ia").as("i"), col("k"))
        .agg(sum(rnd(col("coef") * col("cv"), termScale).cast("decimal(28,8)"))
          .cast("double").as("g"))
      val gc = err
        .join(broadcast(wT.select(col("i").as("ia"), col("k"), col("v").as("wv"))), "ia")
        .groupBy(col("ib").as("i"), col("k"))
        .agg(sum(rnd(col("coef") * col("wv"), termScale).cast("decimal(28,8)"))
          .cast("double").as("g"))
      val gb = err.groupBy(col("ia").as("i"))
        .agg(sum(col("coef").cast("decimal(18,6)")).cast("double").as("g"))
      val gbc = err.groupBy(col("ib").as("i"))
        .agg(sum(col("coef").cast("decimal(18,6)")).cast("double").as("g"))
      // AdaGrad: a' = a + g²; v' = v − lr·g/sqrt(a' + 1e-8). All
      // IEEE — no re-rounding needed or wanted. A vocab word no pair
      // touched keeps its state (g = 0 exactly).
      def updVec(state: DataFrame, grad: DataFrame): DataFrame = state
        .join(grad, Seq("i", "k"), "left")
        .withColumn("g", coalesce(col("g"), lit(0.0)))
        .select(col("i"), col("k"),
          (col("v") - lit(lr) * col("g") /
            sqrt(col("a") + col("g") * col("g") + lit(1e-8))).as("v"),
          (col("a") + col("g") * col("g")).as("a"))
        .localCheckpoint(true)
      val w2 = updVec(wT, gw)
      val c2 = updVec(cT, gc)
      bT = bT
        .join(gb.withColumnRenamed("g", "gB"), Seq("i"), "left")
        .join(gbc.withColumnRenamed("g", "gC"), Seq("i"), "left")
        .withColumn("gB", coalesce(col("gB"), lit(0.0)))
        .withColumn("gC", coalesce(col("gC"), lit(0.0)))
        .select(col("i"),
          (col("b") - lit(lr) * col("gB") /
            sqrt(col("ab") + col("gB") * col("gB") + lit(1e-8))).as("b"),
          (col("ab") + col("gB") * col("gB")).as("ab"),
          (col("c") - lit(lr) * col("gC") /
            sqrt(col("ac") + col("gC") * col("gC") + lit(1e-8))).as("c"),
          (col("ac") + col("gC") * col("gC")).as("ac"))
        .localCheckpoint(true)
      wT = w2; cT = c2
    }
    Trained(wT, cT, bT, voc, losses.toSeq)
  }

  /** The per-step full-batch losses as a graded frame (step, loss) —
    * descent is pinned by the ORACLE as well as the spec: each loss
    * is the order-free decimal sum Σ f·err² at the step's entry
    * state, replayed from the same unrolled CTE chain. */
  def trainLosses(docs: DataFrame, v: Int = VocabSize,
                  window: Int = WindowSize, dim: Int = Dim,
                  steps: Int = Steps, lr: Double = Lr): DataFrame = {
    val t = train(docs, v, window, dim, steps, lr)
    val spark = docs.sparkSession
    import spark.implicits._
    t.losses.zipWithIndex
      .map { case (l, i) => ((i + 1).toLong, l) }
      .toDF("step", "loss")
  }

  /** The graded trainer surface: final word vectors as
    * (word_id, word, dim, weight) rows — the oracle replays vocab,
    * co-occurrence, constants, and every AdaGrad step. */
  def trainedVectors(docs: DataFrame, v: Int = VocabSize,
                     window: Int = WindowSize, dim: Int = Dim,
                     steps: Int = Steps, lr: Double = Lr,
                     maxGram: Int = 1, termScale: Int = 8): DataFrame = {
    val t = train(docs, v, window, dim, steps, lr, "text", maxGram, termScale)
    t.w.join(t.vocab, Seq("i"))
      .select(col("i").as("word_id"), col("w").as("word"),
        col("k").cast("long").as("dim"), col("v").as("weight"))
      .orderBy(col("word_id"), col("dim"))
  }

  /** The SCALED trained model as a graded frame: the same
    * [[trainedVectors]] surface at V=1024 mixed-granularity units ×
    * dim 32 × window 4 — V·dim = 32,768 weights learned from an X in
    * the 10⁵–10⁶-cell range, proving the model-scale loop holds far
    * above the toy constants. Training is memoized (one training
    * serves bench + verify consumers); the oracle replays the full
    * chain — unit extraction, top-1024 vocab, window-4 co-occurrence,
    * and both unrolled AdaGrad rounds — at termScale 6. */
  def scaledVectors(docs: DataFrame): DataFrame =
    trainedVectors(docs, ScaledV, ScaledWindow, ScaledDim, ScaledSteps, Lr,
      ScaledMaxGram, ScaledTermScale)

  /** Per-step losses of the scaled training (spec consumer: descent
    * must hold at scale too, not only at V=32). */
  def scaledLosses(docs: DataFrame): Seq[Double] =
    train(docs, ScaledV, ScaledWindow, ScaledDim, ScaledSteps, Lr,
      "text", ScaledMaxGram, ScaledTermScale).losses

  /** Mean-of-word-vectors document embeddings over the TRAINED table
    * (6-dp-rounded decimal sums / occurrence count — the lloydUpdate
    * mean discipline, so the quotient is bit-stable), one row per
    * (doc, dim). Docs with no vocab token drop out (no embedding). */
  def docVectors(docs: DataFrame, trained: Trained,
                 contentCol: String = "text"): DataFrame = {
    val wv = trained.w.join(trained.vocab, Seq("i"))
      .select(col("w"), col("k"), col("v"))
    docs.select(col("doc_id"), explode(tokens(lower(col(contentCol)))).as("w"))
      .join(broadcast(wv), "w")
      .groupBy(col("doc_id"), col("k"))
      .agg((sum(rnd(col("v"), 6).cast("decimal(18,6)")).cast("double") /
        count(lit(1))).as("dv"))
  }

  /** Retrieval over the trained document embeddings: cosine top-k of
    * the first `nQueries` embedded docs against the rest. Norms and
    * dots are order-free decimal sums of rounded products; the final
    * cosine rounds to 6 dp; ties break on neighbor id. */
  def retrieveTrained(docs: DataFrame, k: Int = 10, nQueries: Int = 5,
                      v: Int = VocabSize, window: Int = WindowSize,
                      dim: Int = Dim, steps: Int = Steps,
                      lr: Double = Lr): DataFrame = {
    val dv = docVectors(docs, train(docs, v, window, dim, steps, lr))
      .localCheckpoint(true)
    val nrm = dv.groupBy(col("doc_id"))
      .agg(sum(rnd(col("dv") * col("dv"), 8).cast("decimal(28,8)"))
        .cast("double").as("n2"))
    val q = dv.where(col("doc_id") < nQueries)
      .select(col("doc_id").as("query_id"), col("k"), col("dv").as("qv"))
    val dots = q.join(dv.where(col("doc_id") >= nQueries)
        .select(col("doc_id").as("neighbor_id"), col("k"), col("dv")), Seq("k"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(rnd(col("qv") * col("dv"), 8).cast("decimal(28,8)"))
        .cast("double").as("dot"))
    val scored = dots
      .join(nrm.select(col("doc_id").as("query_id"), col("n2").as("qn")), "query_id")
      .join(nrm.select(col("doc_id").as("neighbor_id"), col("n2").as("nn")), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        rnd(col("dot") / (sqrt(col("qn")) * sqrt(col("nn"))), 6).as("sim"))
    Similarity.rankTopK(scored, k)
  }

  /** Nearest words by TRAINED cosine — the classic inspection
    * surface of a word-embedding table: for each of the first
    * `nWords` vocab words, the top-`k` most-similar OTHER words.
    * All sums order-free decimal; ties break on neighbor id. Joins
    * are over the V·dim state — model-scale however big the corpus
    * that trained it. */
  def wordNeighbors(docs: DataFrame, nWords: Int = 8, k: Int = 5,
                    v: Int = VocabSize, window: Int = WindowSize,
                    dim: Int = Dim, steps: Int = Steps,
                    lr: Double = Lr): DataFrame = {
    val t = train(docs, v, window, dim, steps, lr)
    val wv = t.w.select(col("i"), col("k"), col("v"))
    val n2 = wv.groupBy(col("i"))
      .agg(sum(rnd(col("v") * col("v"), 8).cast("decimal(28,8)"))
        .cast("double").as("n2"))
    val dots = wv.where(col("i") < nWords)
      .select(col("i").as("qi"), col("k"), col("v").as("qv"))
      .join(wv.select(col("i").as("ni"), col("k"), col("v").as("nv")), Seq("k"))
      .where(col("ni") =!= col("qi"))
      .groupBy(col("qi"), col("ni"))
      .agg(sum(rnd(col("qv") * col("nv"), 8).cast("decimal(28,8)"))
        .cast("double").as("dot"))
    val scored = dots
      .join(n2.select(col("i").as("qi"), col("n2").as("qn")), "qi")
      .join(n2.select(col("i").as("ni"), col("n2").as("nn")), "ni")
      .select(col("qi"), col("ni"),
        rnd(col("dot") / (sqrt(col("qn")) * sqrt(col("nn"))), 6).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qi")).orderBy(col("sim").desc, col("ni"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .join(t.vocab.select(col("i").as("qi"), col("w").as("word")), "qi")
      .join(t.vocab.select(col("i").as("ni"), col("w").as("neighbor")), "ni")
      .select(col("qi").as("word_id"), col("word"),
        col("ni").as("neighbor_id"), col("neighbor"), col("rank"), col("sim"))
      .orderBy(col("word_id"), col("rank"))
  }

  /** The rank-r DCG discount 1/log₂(r+1) as a 9-dp decimal literal
    * string — injected verbatim into BOTH engines' expressions, so
    * the only log in the nDCG chain is a shared constant, never a
    * per-engine libm call. */
  private[graft] def dcgDiscounts(k: Int): Seq[(Int, String)] =
    (1 to k).map { r =>
      r -> BigDecimal(1.0 / (math.log(r + 1.0) / math.log(2.0)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toString
    }

  /** Retrieval-quality eval of the TRAINED model on HELD-OUT data —
    * the graded proof that training buys retrieval, not just a
    * descending loss. The corpus splits by doc_id parity: the model
    * trains on EVEN docs only; relevance ground truth is the ODD
    * (unseen) half's co-occurrence mass, rel(q,c) = ln(1 + X_test).
    * For each of the first `nQ` vocab units, every other vocab unit
    * is ranked by the model's predicted co-occurrence — w_q·c_c +
    * b_q + bc_c, GloVe's actual regression output — and nDCG@k is
    * computed against the held-out relevance; the same ranking over
    * the md5-SEEDED init vectors (the hash-feature baseline the rest
    * of the engine uses) grades beside it. At the scaled config the
    * trained ranking reaches ~0.7 nDCG where the hash baseline sits
    * under 0.1 (spec-pinned margin ≥ 0.2).
    *
    * Scale shape: training is the memoized scaled trainer; the
    * test-half co-occurrence is ONE corpus pass; everything after is
    * model-scale (nQ·V score cells). Determinism: scores and rel are
    * 6-dp rounds of decimal-summed terms; DCG terms multiply by
    * shared literal discounts ([[dcgDiscounts]]); ranks break ties
    * on candidate id. */
  def heldOutNdcg(docs: DataFrame, nQ: Int = 64, k: Int = 10,
                  v: Int = ScaledV, window: Int = ScaledWindow,
                  dim: Int = ScaledDim, steps: Int = ScaledSteps,
                  lr: Double = Lr, maxGram: Int = ScaledMaxGram,
                  termScale: Int = ScaledTermScale): DataFrame = {
    val trainDocs = docs.where(pmod(col("doc_id"), lit(2)) === 0)
    val testDocs = docs.where(pmod(col("doc_id"), lit(2)) === 1)
    val t = train(trainDocs, v, window, dim, steps, lr, "text",
      maxGram, termScale)
    val voc = t.vocab
    // held-out relevance: test-half co-occurrence gated on the TRAIN
    // vocab (the one corpus-scale pass of the eval)
    // self co-occurrence (cand == q) leaves rel: the scoring grid
    // excludes the diagonal, so keeping it in the ideal ranking would
    // structurally cap nDCG below 1 whenever the diagonal reaches the
    // ideal top-k — both metrics depressed for no signal
    val rel = coocWithVocab(testDocs, broadcast(voc), window, "text", maxGram)
      .where(col("ia") =!= col("ib"))
      .select(col("ia").as("q"), col("ib").as("cand"),
        rnd(log(lit(1.0) + col("x").cast("double")), 6).as("rel"))
      .localCheckpoint(true)
    val eligible = rel.where(col("q") < nQ && col("rel") > 0)
      .groupBy(col("q")).agg(count(lit(1)).as("n_pos"))
      .where(col("n_pos") >= k)
    // predicted-co-occurrence scores over the full candidate grid
    def scores(w: DataFrame, c: DataFrame, bias: Option[DataFrame]): DataFrame = {
      val dots = w.where(col("i") < nQ)
        .select(col("i").as("q"), col("k"), col("v").as("wv"))
        .join(c.select(col("i").as("cand"), col("k"), col("v").as("cv")), "k")
        .where(col("cand") =!= col("q"))
        .groupBy(col("q"), col("cand"))
        .agg(sum(rnd(col("wv") * col("cv"), termScale).cast("decimal(28,8)"))
          .cast("double").as("dot"))
      bias match {
        case Some(b) => dots
          .join(broadcast(b.select(col("i").as("q"), col("b"))), "q")
          .join(broadcast(b.select(col("i").as("cand"), col("c").as("bc"))), "cand")
          .select(col("q"), col("cand"),
            rnd(col("dot") + col("b") + col("bc"), 6).as("s"))
        case None => dots.select(col("q"), col("cand"), rnd(col("dot"), 6).as("s"))
      }
    }
    val disc = dcgDiscounts(k)
    def discOf(r: Column): Column =
      disc.tail.foldLeft(when(r === disc.head._1, lit(disc.head._2.toDouble))) {
        case (acc, (rank, d)) => acc.when(r === rank, lit(d.toDouble))
      }
    // every frame below is model-scale (≤ nQ·V cells; rel ≤ the
    // observed test co-occurrence of the top-V units) — broadcast
    // explicitly: the checkpointed frames carry no size statistics,
    // and a defaulted sort-merge would shuffle megabytes to join
    // hundreds of rows. At a vocab far beyond serving scale (10⁵+),
    // drop the hints and let AQE route.
    def ndcgOf(score: DataFrame, outCol: String): DataFrame = {
      val wRank = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q")).orderBy(col("s").desc, col("cand"))
      val dcg = score.withColumn("r", row_number().over(wRank))
        .where(col("r") <= k)
        .join(broadcast(rel), Seq("q", "cand"), "left")
        .select(col("q"), col("r"),
          rnd(coalesce(col("rel"), lit(0.0)) * discOf(col("r")), 6).as("term"))
        .groupBy(col("q"))
        .agg(sum(col("term").cast("decimal(18,6)")).cast("double").as("dcg"))
      val wRel = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q")).orderBy(col("rel").desc, col("cand"))
      val idcg = rel.withColumn("r", row_number().over(wRel))
        .where(col("r") <= k)
        .select(col("q"), rnd(col("rel") * discOf(col("r")), 6).as("term"))
        .groupBy(col("q"))
        .agg(sum(col("term").cast("decimal(18,6)")).cast("double").as("idcg"))
      dcg.join(broadcast(idcg), "q")
        .select(col("q"), rnd(col("dcg") / col("idcg"), 6).as(outCol))
    }
    val trainedN = ndcgOf(scores(t.w, t.c, Some(t.b)), "ndcg_trained")
    // the hash baseline: the md5-seeded init (biases zero), exactly
    // the gw0/gc0 tables of the unrolled chain
    val ks = voc.select(col("i"), col("w").as("word"),
      explode(sequence(lit(0), lit(dim - 1))).as("k"))
    val w0 = ks.select(col("i"), col("k"), seeded("gw").as("v"))
    val c0 = ks.select(col("i"), col("k"), seeded("gc").as("v"))
    val initN = ndcgOf(scores(w0, c0, None), "ndcg_init")
    eligible.join(broadcast(trainedN), "q").join(broadcast(initN), "q")
      .join(broadcast(voc.select(col("i").as("q"), col("w").as("unit"))), "q")
      .select(col("q").as("query_id"), col("unit"), col("n_pos"),
        col("ndcg_trained"), col("ndcg_init"))
      .orderBy(col("query_id"))
  }

  /** The trained model in its closure-shippable form: a driver-side
    * word → vector map (V·dim doubles — model-sized by
    * construction, like every quantizer/codebook collect in this
    * engine). Scale boundary: this collect is for encoder-serving
    * vocabs (10⁴–10⁵ words); a web-scale vocab (10⁶+ × dim 300)
    * stays a DataFrame and embeds documents through the DISTRIBUTED
    * broadcast-join path [[docVectors]] instead — same math, no
    * driver materialization. */
  def trainedMap(t: Trained): Map[String, Array[Double]] =
    t.w.join(t.vocab, Seq("i"))
      .select(col("w"), col("k"), col("v")).collect()
      .groupBy(_.getString(0))
      .map { case (w, rows) =>
        w -> rows.sortBy(_.getInt(1)).map(_.getDouble(2))
      }
}

/** The TRAINED GloVe model behind the production [[TextEncoder]]
  * boundary: per text, the mean of trained word vectors over its
  * vocab tokens (zero vector when none match). The weights ride the
  * task closure — V·dim doubles, the model-sized payload the seam
  * was designed for — and the mean follows the docVectors decimal
  * discipline exactly (BigDecimal.valueOf == Spark's round: both go
  * through the shortest-repr string), so the chunk→embedding pass
  * through Embedder.embed is oracle-replayable, not just
  * smoke-tested. Tokenization mirrors TextFunctions.tokens
  * (trim, split on whitespace, drop empties) plus lower(). */
final case class GloveTextEncoder(vectors: Map[String, Array[Double]],
                                  dim: Int) extends TextEncoder {
  override def encode(batch: Seq[String]): Seq[Array[Float]] = batch.map { t =>
    val toks = t.trim.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").iterator.filter(_.nonEmpty)
    var n = 0
    val sums = Array.fill(dim)(java.math.BigDecimal.ZERO)
    toks.foreach { w =>
      vectors.get(w).foreach { v =>
        n += 1
        var j = 0
        while (j < dim) {
          // mirror Glove.rnd: the tie-break epsilon rides every round
          sums(j) = sums(j).add(java.math.BigDecimal.valueOf(v(j) + Glove.TieEps)
            .setScale(6, java.math.RoundingMode.HALF_UP))
          j += 1
        }
      }
    }
    if (n == 0) Array.fill(dim)(0f)
    else sums.map(s => (s.doubleValue() / n).toFloat)
  }
}
