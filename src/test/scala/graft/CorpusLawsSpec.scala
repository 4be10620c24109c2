package graft

import graft.operators.Quality
import org.apache.spark.sql.functions._

/** Round-8 wave 4: corpus-growth laws and mergeable-sketch audits —
  * Heaps'-law vocabulary growth (first-occurrence formulation) and
  * the HLL sketch-union distinct audit. */
class CorpusLawsSpec extends SparkSpec {
  import spark.implicits._

  // ── heapsFit ───────────────────────────────────────────────────

  test("heaps: an all-unique corpus fits beta = 1, K = 1 exactly") {
    // every token is globally new -> V == N at every doc boundary ->
    // the log-log points sit on y = x and the OLS is exact
    val docs = (0 until 30).map { i =>
      (i.toLong, (0 until 5).map(j => s"w_${i}_$j").mkString(" "))
    }.toDF("doc_id", "text")
    val r = Quality.heapsFit(docs).collect()(0)
    assert(r.getLong(0) == 30L, s"one growth point per doc, got $r")
    assert(r.getDouble(1) == 1.0 && r.getDouble(2) == 1.0,
      s"V = N must fit beta=1, K=1, got $r")
  }

  test("heaps: a closed-vocabulary corpus fits beta near 0") {
    // doc 0 introduces the whole vocab; later docs only repeat it
    val docs = (0 until 40).map { i =>
      (i.toLong, "alpha beta gamma delta epsilon zeta")
    }.toDF("doc_id", "text")
    val r = Quality.heapsFit(docs).collect()(0)
    assert(math.abs(r.getDouble(1)) < 0.1,
      s"no vocab growth must fit beta ~ 0, got $r")
  }

  test("heaps matches a driver-side sequential reference and is partition-invariant") {
    // mixed corpus: each doc has some shared and some fresh words
    val docs = (0 until 25).map { i =>
      val fresh = (0 until (1 + i % 3)).map(j => s"new_${i}_$j")
      val shared = Seq("the", "quick", "fox").take(1 + i % 3)
      (i.toLong, (fresh ++ shared).mkString(" "))
    }.toDF("doc_id", "text")
    def r6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r4(d: Double) = BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // sequential reference: the definitional distinct-so-far scan
    val ref = {
      val seen = scala.collection.mutable.Set[String]()
      var n = 0L
      val pts = (0 until 25).map { i =>
        val ws = docs.where(col("doc_id") === i).select("text")
          .as[String].head().split(" ").toSeq
        n += ws.size
        ws.foreach(seen += _)
        (r6(math.log(n.toDouble)), r6(math.log(seen.size.toDouble)))
      }
      val xs = pts.map(_._1); val ys = pts.map(_._2)
      val xy = pts.map(p => r6(p._1 * p._2)); val xx = xs.map(x => r6(x * x))
      val (cnt, sx, sy, sxy, sxx) =
        (pts.size.toDouble, xs.sum, ys.sum, xy.sum, xx.sum)
      val beta = r4((cnt * sxy - sx * sy) / (cnt * sxx - sx * sx))
      (beta, r4(math.exp((sy - beta * sx) / cnt)))
    }
    val a = Quality.heapsFit(docs.repartition(1)).collect()(0)
    val b = Quality.heapsFit(docs.repartition(7, col("doc_id"))).collect()(0)
    assert(a.toSeq == b.toSeq, "fit must be bit-identical on any partitioning")
    assert(math.abs(a.getDouble(1) - ref._1) < 1e-9, s"beta: got $a, want $ref")
    assert(math.abs(a.getDouble(2) - ref._2) < 1e-9, s"K: got $a, want $ref")
    assert(a.getDouble(1) > 0.3 && a.getDouble(1) < 1.0,
      s"mixed corpus grows sublinearly, got $a")
  }

  // ── hllUnionAudit ──────────────────────────────────────────────

  test("hll union audit: the unioned sketch estimate honors the contract") {
    // 400 distinct contents spread over 8 sources, plus cross-source
    // duplicates the union must not double-count
    val docs = (0 until 500).map { i =>
      (i.toLong, s"content_${i % 400}", s"src${i % 8}")
    }.toDF("doc_id", "text", "source")
    val r = Quality.hllUnionAudit(docs).collect()(0)
    assert(r.getLong(0) == 8L, s"8 sources, got $r")
    assert(r.getLong(1) == 400L, s"400 exact distinct, got $r")
    assert(r.getLong(2) == 1L, s"HLL at this cardinality is well within 5%, got $r")
  }

  // ── burstiness ─────────────────────────────────────────────────

  test("burstiness: a clumping word out-scores an evenly spread word at equal mass") {
    // "even" once in each of 20 docs; "bursty" four times in each of
    // 5 docs — same total 20 over N=40 docs, very different Fano
    val docs = (0 until 40).map { i =>
      val parts = Seq("filler") ++
        (if (i < 20) Seq("even") else Nil) ++
        (if (i >= 20 && i < 25) Seq.fill(4)("bursty") else Nil)
      (i.toLong, parts.mkString(" "))
    }.toDF("doc_id", "text")
    val rows = Quality.burstiness(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(4))).toMap
    assert(rows("even")._1 == 20L && rows("bursty")._1 == 20L)
    // hand-computed: even var=(20-10)/39, m=.5 → fano=0.512821;
    // bursty scc=80 → var=(80-10)/39 → fano=3.589744
    assert(math.abs(rows("even")._2 - 0.512821) < 1e-6, s"even: $rows")
    assert(math.abs(rows("bursty")._2 - 3.589744) < 1e-6, s"bursty: $rows")
  }

  test("burstiness is partition-invariant with deterministic top-k order") {
    val docs = (0 until 30).map { i =>
      (i.toLong, s"alpha beta beta gamma_$i word${i % 7} word${i % 7}")
    }.toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      Quality.burstiness(d).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(4))).toSeq
    val a = run(docs.repartition(1))
    val b = run(docs.repartition(11, col("doc_id")))
    assert(a == b, "bit-identical on any partitioning")
    assert(a.map(_._2) == a.map(_._2).sorted.reverse, "ordered by mass desc")
  }

  // ── effectiveSampleSize ────────────────────────────────────────

  test("n_eff: a balanced corpus is worth its full size, a skewed one is not") {
    import graft.operators.Sampling
    val balanced = (0 until 100).map(i => (i.toLong, "t", s"src${i % 4}"))
      .toDF("doc_id", "text", "source")
    val rb = Sampling.effectiveSampleSize(balanced).collect()(0)
    assert(rb.getLong(0) == 100L && rb.getLong(1) == 4L)
    assert(rb.getDouble(2) == 100.0 && rb.getDouble(3) == 1.0,
      s"uniform shares: n_eff = N exactly, got $rb")
    // 90/10 split: sw2 = 90·(5/9)² + 10·5² ≈ 277.78 → n_eff ≈ 36
    val skewed = (0 until 100).map(i =>
      (i.toLong, "t", if (i < 90) "big" else "small"))
      .toDF("doc_id", "text", "source")
    val rs = Sampling.effectiveSampleSize(skewed).collect()(0)
    assert(math.abs(rs.getDouble(2) - 36.0) < 0.1,
      s"90/10 split collapses n_eff to ~36, got $rs")
    assert(rs.getDouble(3) > 2.7, s"variance inflation ~2.78, got $rs")
  }

  test("n_eff is partition-invariant") {
    import graft.operators.Sampling
    val docs = (0 until 120).map(i => (i.toLong, "t", s"src${i % 7}"))
      .toDF("doc_id", "text", "source")
    val a = Sampling.effectiveSampleSize(docs.repartition(1)).collect()(0)
    val b = Sampling.effectiveSampleSize(docs.repartition(9, col("doc_id"))).collect()(0)
    assert(a.toSeq == b.toSeq)
  }

  test("hll union audit is partition-invariant") {
    val docs = (0 until 300).map { i =>
      (i.toLong, s"doc body $i", s"src${i % 5}")
    }.toDF("doc_id", "text", "source")
    val a = Quality.hllUnionAudit(docs.repartition(1)).collect()(0)
    val b = Quality.hllUnionAudit(docs.repartition(9, col("doc_id"))).collect()(0)
    assert(a.toSeq == b.toSeq,
      "sketch merge is associative: same audit on any partitioning")
  }

  test("hapax report counts frequency-1 words exactly and is partition-invariant") {
    // corpus: "alpha" x3, "beta" x2, "gamma" x1, "delta" x1 →
    // vocab 4, tokens 7, hapax 2, rate 0.5
    val docs = Seq(
      (1L, "alpha beta Gamma", "s"),
      (2L, "ALPHA beta", "s"),
      (3L, "alpha delta", "s")).toDF("doc_id", "text", "source")
    val r = Quality.hapaxReport(docs).collect()(0)
    assert(r.getLong(0) == 4L && r.getLong(1) == 7L && r.getLong(2) == 2L,
      s"vocab/tokens/hapax mismatch: $r")
    assert(r.getDouble(3) == 0.5)
    val b = Quality.hapaxReport(docs.repartition(5, col("doc_id"))).collect()(0)
    assert(r.toSeq == b.toSeq, "bit-identical on any partitioning")
  }
}
