package graft
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("local[4]", 4)
    try println("double/0 = " + spark.sql("SELECT CAST(1.0 AS DOUBLE)/CAST(0.0 AS DOUBLE) AS r").collect()(0))
    catch { case t: Throwable => println("double/0 THROWS: " + t.getMessage.take(100)) }
    try println("long/long0 = " + spark.sql("SELECT 1L/0L AS r").collect()(0))
    catch { case t: Throwable => println("long/0 THROWS: " + t.getMessage.take(100)) }
    try println("dbl/long0 = " + spark.sql("SELECT CAST(1.0 AS DOUBLE)/0L AS r").collect()(0))
    catch { case t: Throwable => println("dbl/long0 THROWS: " + t.getMessage.take(100)) }
    spark.stop()
  }
}
