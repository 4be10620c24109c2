package graft
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("local[16]", 16)
    Seq("sf0.01", "sf0.1").foreach { sf =>
      val d = s"/root/testdata/$sf"
      val seed = SparkEntry.queries("ann_ivf_recall")(spark, d).collect()(0).getDouble(1)
      val fit = SparkEntry.queries("ann_ivf_trained_recall")(spark, d).collect()(0).getDouble(1)
      // occupancy balance: max/min members, seed vs fitted
      val emb = Tables.embeddings(spark, d)
      println(s"$sf: seed recall=$seed fitted recall=$fit")
    }
    spark.stop()
  }
}
