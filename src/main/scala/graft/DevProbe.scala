package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe for optimization measurements (not part of the
  * driver contract): time labelled sub-steps of a query under the
  * bench session confs. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    spark.range(1000000).selectExpr("sum(id)").collect()

    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    time("bm25-warm")(noop(graft.operators.Ranking.bm25TopK(docs)))
    time("bm25")(noop(graft.operators.Ranking.bm25TopK(docs)))
    time("brute-warm")(noop(graft.operators.Similarity.bruteTopK(emb, 3, 20)))
    time("brute")(noop(graft.operators.Similarity.bruteTopK(emb, 3, 20)))
    time("hybrid")(noop(graft.operators.Ranking.hybridTopK(docs, emb)))
    time("ndcg")(noop(graft.operators.Ranking.ndcgAtK(docs, emb)))
    time("rag-retrieve-like")(noop(graft.operators.Similarity.bruteTopK(emb, 5, 20)))

    spark.stop()
  }
}
