package graft

import graft.operators.Unigram
import org.apache.spark.sql.functions._

/** Unigram-LM trainer: exact agreement with a driver-side hard-EM
  * reference, coverage via characters, partition invariance, and
  * segment-stats accounting identities. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  /** The same algorithm, driver-side: substring seed inventory,
    * 6-dp decimal Viterbi with (cost, path) tie-break, two hard-EM
    * iterations with Laplace smoothing — ground truth for the
    * distributed trainer. */
  private def reference(words: Map[String, Long], minCount: Long)
      : (Map[String, (Long, Double)], Map[String, List[String]]) = {
    import java.math.{BigDecimal => BD, RoundingMode}
    def cost6(p: Double): BD = new BD(-Math.log(p)).setScale(6, RoundingMode.HALF_UP)
    val occ = collection.mutable.Map.empty[String, Long]
    for ((w, f) <- words; i <- 0 until w.length; l <- 1 to 4
         if i + l <= w.length)
      occ(w.substring(i, i + l)) = occ.getOrElse(w.substring(i, i + l), 0L) + f
    val seed = occ.filter { case (p, n) => p.length == 1 || n >= minCount }
    val tot0 = seed.values.sum
    var costs: Map[String, BD] =
      seed.map { case (p, n) => p -> cost6(n.toDouble / tot0) }.toMap
    val chars = seed.keys.filter(_.length == 1).toSet
    var winners = Map.empty[String, List[String]]
    var model = Map.empty[String, (Long, Double)]
    for (_ <- 1 to 2) {
      winners = words.keys.map { w =>
        // all segmentations, min by (cost, path-string)
        def paths(pos: Int): List[List[String]] =
          if (pos == w.length) List(Nil)
          else (1 to 4).toList.flatMap { l =>
            if (pos + l > w.length) Nil
            else {
              val piece = w.substring(pos, pos + l)
              if (!costs.contains(piece)) Nil
              else paths(pos + l).map(piece :: _)
            }
          }
        val best = paths(0).map { p =>
          (p.map(costs).reduce(_.add(_)), p.mkString(" "), p)
        }.minBy { case (c, s, _) => (c, s) }(
          Ordering.Tuple2(Ordering.ordered[BD], Ordering.String))
        w -> best._3
      }.toMap
      val cnt = collection.mutable.Map.empty[String, Long]
      for ((w, ps) <- winners; p <- ps)
        cnt(p) = cnt.getOrElse(p, 0L) + words(w)
      val kept = (cnt.keySet ++ chars).map(p => p -> cnt.getOrElse(p, 0L)).toMap
      val t = kept.values.sum; val v = kept.size
      costs = kept.map { case (p, n) => p -> cost6((n + 1).toDouble / (t + v)) }
      model = kept.map { case (p, n) =>
        p -> (n, BigDecimal(Math.log((n + 1).toDouble / (t + v)))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
    (model, winners)
  }

  private def wordFreqs(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(_.toLowerCase.split("\\s+")).filter(_.matches("^[a-z]+$"))
      .filter(_.length <= 12).groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("matches the driver-side hard-EM reference piece for piece") {
    val texts = Seq(
      "spark spark spark table table scan scan scan scan",
      "sparkly tables scanned spark table scan",
      "spark table scan spark table scan spark")
    val docs = texts.toDF("text")
    val (refModel, _) = reference(wordFreqs(texts), minCount = 3)
    val expect = refModel.toSeq
      .filter { case (p, (n, _)) => p.length >= 2 }
      .sortBy { case (p, (n, _)) => (-n, p) }
      .map { case (p, (n, lp)) => (p, n, lp) }
    val got = Unigram.unigramTrain(docs, minCount = 3, topK = 1000)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expect, s"\ngot    $got\nexpect $expect")
  }

  test("every word stays segmentable: rare words fall back to characters") {
    // "xyzzy" appears once — none of its multi-char substrings reach
    // minCount, so it must segment into single characters
    val texts = Seq.fill(30)("data data table") :+ "xyzzy"
    val docs = texts.toDF("text")
    val (_, winners) = reference(wordFreqs(texts), minCount = 10)
    assert(winners("xyzzy") == List("x", "y", "z", "z", "y"))
    val seg = Unigram.unigramSegmentStats(docs, minCount = 10)
      .where(col("n_pieces") === 5).collect()
    assert(seg.length == 1 && seg(0).getAs[Long]("n_word_types") == 1L)
  }

  test("training is partition-invariant") {
    val docs = Tables.documents(spark, sf)
    val one = Unigram.unigramTrain(docs.coalesce(1), minCount = 20)
      .collect().map(_.toString).toSeq
    val many = Unigram.unigramTrain(docs.repartition(7), minCount = 20)
      .collect().map(_.toString).toSeq
    assert(one == many && one.nonEmpty)
  }

  test("segment stats satisfy the accounting identities") {
    val docs = Tables.documents(spark, sf)
    val rows = Unigram.unigramSegmentStats(docs, minCount = 20).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val np = r.getAs[Long]("n_pieces")
      val nw = r.getAs[Long]("n_words")
      val pt = r.getAs[Long]("pieces_total")
      assert(pt == np * nw, s"pieces_total must be n_pieces * n_words in $r")
      // a piece is 1..4 chars, so chars-per-piece must sit in [1, 4]
      val cpp = r.getAs[Double]("chars_per_piece")
      assert(cpp >= 1.0 && cpp <= 4.0, s"chars_per_piece out of range in $r")
    }
    // EM concentrates mass: the corpus vocabulary is frequent words,
    // so at least one word type must segment as a single piece chain
    // shorter than its character count
    val docs2 = Seq.fill(50)("table table scan").toDF("text")
    val seg2 = Unigram.unigramSegmentStats(docs2, minCount = 10).collect()
    val maxPieces = seg2.map(_.getAs[Long]("n_pieces")).max
    assert(maxPieces <= 2, s"frequent short words must not char-split: ${seg2.toSeq}")
  }

  test("the training memo survives a cache-hygiene sweep (the Bench loop's shape)") {
    // the round-9 bench failure: the memo pinned localCheckpoint
    // blocks, Bench's per-query `getPersistentRDDs...unpersist` sweep
    // destroyed them, and the memoized frames threw on next use. The
    // memo now stores collected rows; both views must keep answering
    // (identically) across sweeps.
    val docs = Tables.documents(spark, sf)
    val train1 = Unigram.unigramTrain(docs, minCount = 20)
      .collect().map(_.toString).toSeq
    val seg1 = Unigram.unigramSegmentStats(docs, minCount = 20)
      .collect().map(_.toString).toSeq
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    val train2 = Unigram.unigramTrain(docs, minCount = 20)
      .collect().map(_.toString).toSeq
    val seg2 = Unigram.unigramSegmentStats(docs, minCount = 20)
      .collect().map(_.toString).toSeq
    assert(train2 == train1 && seg2 == seg1 && train1.nonEmpty && seg1.nonEmpty)
  }
}
