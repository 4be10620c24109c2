import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
object TestWiden {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = "/tmp/widen_test"
    Seq(1, 2, 3).toDF("a").write.mode("overwrite").parquet(dir)   // INT32
    val wide = StructType(Seq(StructField("a", LongType)))
    try {
      val got = spark.read.schema(wide).parquet(dir).collect().map(_.getLong(0)).sorted.toSeq
      println(s"LONG-READ-OK $got")
    } catch { case e: Throwable => println(s"LONG-READ-FAIL ${e.getClass.getName}: ${e.getMessage}".take(200)) }
    Seq(1.5f, 2.5f).toDF("f").write.mode("overwrite").parquet(dir + "2")
    val wideF = StructType(Seq(StructField("f", DoubleType)))
    try {
      val got = spark.read.schema(wideF).parquet(dir + "2").collect().map(_.getDouble(0)).sorted.toSeq
      println(s"DOUBLE-READ-OK $got")
    } catch { case e: Throwable => println(s"DOUBLE-READ-FAIL ${e.getClass.getName}".take(200)) }
    spark.stop()
  }
}
