package graft
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("local[16]", 16)
    Seq("sf0.01", "sf0.1").foreach { sf =>
      val d = s"/root/testdata/$sf"
      val r = SparkEntry.queries("ann_lsh_recall")(spark, d).collect()(0)
      println(s"$sf lsh recall=${r.getDouble(1)}")
    }
    spark.stop()
  }
}
