package graft
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("local[32]", 32)
    val d = "/root/testdata/sf0.1"
    SparkEntry.queries("ann_ivf_topk")(spark, d).count() // warm
    Seq("ann_ivf_trained", "ann_ivf_trained_recall", "txt_tfidf_topterms").foreach { q =>
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, d).count()
      println(s"$q: ${(System.nanoTime()-t0)/1e9}s")
    }
    spark.stop()
  }
}
