package graft

import org.apache.spark.sql.SparkSession

/** Scratch dev entrypoint (not part of the library surface). */
object Dev {
  def main(args: Array[String]): Unit = {
    // driver-style vanilla session: no graft tuning, stock defaults
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("entry rows: " + SparkEntry.entry(spark).count())
    Seq("ev_sessionize", "dedup_minhash_lsh", "q_asof_join", "rag_retrieve").foreach { q =>
      println(q + " rows: " + SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count())
    }
    spark.stop()
  }
}
