package graft
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("local[8]", 8)
    try {
      SparkEntry.queries("txt_gopher_filter")(spark, "/tmp/sf_adv")
        .write.mode("overwrite").parquet("/tmp/gopher_probe")
      println("gopher write OK")
    } catch { case t: Throwable =>
      println(s"gopher FAIL: ${t.getMessage}")
      var c = t.getCause
      while (c != null) { println(s"  cause: ${c.getClass.getName}: ${c.getMessage}"); c = c.getCause }
    }
    spark.stop()
  }
}
