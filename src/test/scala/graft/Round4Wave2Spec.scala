package graft

import graft.operators.{Analytics, Dedup, Events, Quality, Ranking, Sketches}
import org.apache.spark.sql.functions._

/** Semantic guards for the second late round-4 wave: BPE pair stats,
  * perplexity buckets, cross-doc substring runs, SCD2, time-RANGE
  * frames, query-likelihood retrieval, and the count-min sketch. */
class Round4Wave2Spec extends SparkSpec {
  import spark.implicits._

  test("bpe pairs: planted dominant pair ranks first; counts weight by word freq") {
    val syn = Seq.tabulate(10)(i => (i.toLong, "zqzq zqzq other")) ++ Seq((99L, "ab"))
    val out = Quality.bpePairStats(syn.toDF("doc_id", "text"))
      .as[(Long, String, Long, Long)].collect()
    // "z q" and "q z" occur in word type "zqzq" (freq 20): "z q" twice
    // per word = 40, "q z" once per word = 20
    val byPair = out.map(r => r._2 -> r._3).toMap
    assert(byPair("z q") == 40L && byPair("q z") == 20L)
    assert(out.head._2 == "z q")
    // ranks are 1..k and frequencies are non-increasing in rank
    assert(out.map(_._1).toSeq == (1L to out.length))
    assert(out.sliding(2).forall { case Array(a, b) => a._3 >= b._3; case _ => true })
  }

  test("perplexity buckets: tertiles cover all scored docs, entropy ranges are ordered") {
    val docs = Tables.documents(spark, sf)
    val out = Quality.perplexityBuckets(docs).as[(Long, Long, Long, Double, Double)].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
    val scored = Quality.unigramCrossEntropy(docs).where($"cross_entropy".isNotNull).count()
    assert(out.map(_._2).sum == scored)
    // bucket 1 = lowest entropy (most fluent); max of each bucket ≤ min of the next
    assert(out(0)._5 <= out(1)._4 && out(1)._5 <= out(2)._4)
  }

  test("substring runs: a planted shared 20-token span is found at the right length") {
    val span = (1 to 20).map(i => s"tok$i").mkString(" ")
    val syn = Seq(
      (1L, s"unique one $span trailing words here"),
      (2L, s"$span completely different tail content"),
      (3L, "no overlap at all in this document body")).toDF("doc_id", "text")
    val m = Dedup.substringRuns(syn)
      .select($"doc_id", $"max_dup_span").as[(Long, Long)].collect().toMap
    // 20 shared tokens ⇒ 5 consecutive shared 16-grams ⇒ span 20
    assert(m(1L) == 20L && m(2L) == 20L && m(3L) == 0L)
  }

  test("scd2: versions partition each customer's timeline; one current row each") {
    val out = Analytics.scd2Priority(spark, sf).cache()
    val perCust = out.groupBy($"custkey")
      .agg(sum($"is_current").as("cur"), count(lit(1)).as("n"), max($"version").as("maxv"))
    // exactly one open interval per customer; versions are 1..n dense
    assert(perCust.where($"cur" =!= 1).isEmpty)
    assert(perCust.where($"maxv" =!= $"n").isEmpty)
    // intervals chain: valid_to of version v equals valid_from of v+1
    val chain = out.as("a").join(out.as("b"),
      $"a.custkey" === $"b.custkey" && $"a.version" + 1 === $"b.version")
    assert(chain.where($"a.valid_to" =!= $"b.valid_from").isEmpty)
    // consecutive versions never share a priority (else they'd be one segment)
    assert(chain.where($"a.priority" === $"b.priority").isEmpty)
    out.unpersist()
  }

  test("range frame: the frame always contains the current row; sum matches a replay") {
    val out = Events.rangeFrameSum(Tables.events(spark, sf))
    assert(out.where($"n_in_window" < 1).isEmpty)
    // brute-force replay on one user via a self-join
    val ev = Tables.events(spark, sf)
      .select($"user_id", $"event_id", expr("unix_micros(ts)").as("us"),
        $"value".cast("decimal(18,4)").as("v"))
    val uid = ev.select($"user_id").head().getLong(0)
    val one = ev.where($"user_id" === uid)
    val brute = one.as("a").join(one.as("b"),
        $"b.us" >= $"a.us" - 600000000L && $"b.us" <= $"a.us")
      .groupBy($"a.event_id").agg(sum($"b.v").cast("double").as("expect"))
    val joined = out.where($"user_id" === uid).join(brute, "event_id")
    assert(joined.where($"win_sum" =!= $"expect").isEmpty)
  }

  test("qlm: a doc stuffed with query terms outranks one with none") {
    val syn = Seq(
      (1L, "spark join vector query spark join vector query"),
      (2L, "completely unrelated text about nothing much at all"),
      (3L, "spark appears once here among other words")).toDF("doc_id", "text")
    val ranked = Ranking.queryLikelihoodTopK(syn).as[(Long, Double)].collect()
    assert(ranked.head._1 == 1L)
    assert(ranked.map(_._2).sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    // smoothing gives even the no-term doc a finite score
    assert(ranked.map(_._1).contains(2L))
  }

  test("cms: estimates never undercount and equal exact when collision-free") {
    val out = Sketches.cmsHeavyHitters(Tables.events(spark, sf)).cache()
    assert(out.where($"est_n" < $"exact_n").isEmpty)
    assert(out.where($"overcount" =!= $"est_n" - $"exact_n").isEmpty)
    out.unpersist()
    // tiny synthetic stream with 3 keys in a 64-wide sketch: no collisions
    val syn = (Seq.fill(5)(10L) ++ Seq.fill(3)(20L) ++ Seq(30L))
      .zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("event_id", "user_id")
    val est = Sketches.cmsHeavyHitters(syn).as[(Long, Long, Long, Long)].collect()
    assert(est.forall(r => r._2 == r._3 && r._4 == 0L))
  }
}
