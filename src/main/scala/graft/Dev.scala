package graft
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("local[32]", 32)
    val d = "/root/testdata/sf0.1"
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("dedup_clusters")(spark, d).count()
      println(s"run $i: ${(System.nanoTime()-t0)/1e9}s rows=$n")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
