package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DevTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tuning.foldLeft(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"TIME $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.range(1000000).selectExpr("sum(id)").collect()
    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val bits = graft.operators.Similarity.autoBits(n)
    (1 to 2).foreach { i =>
      val dir = s"/tmp/graft_devgix_$i"
      val base = emb.where(col("vec_id") < n * 4 / 5)
      val inc = emb.where(col("vec_id") >= n * 4 / 5)
      time(s"buildAndSave-$i") {
        graft.sources.GraphAnnIndex.buildAndSave(base, dir, nbits = bits, pBuckets = 8)
      }
      time(s"appendIncremental-$i") {
        graft.sources.GraphAnnIndex.appendIncremental(inc, dir)
      }
      time(s"stats-$i") {
        graft.sources.GraphAnnIndex.stats(spark, dir)
          .write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
