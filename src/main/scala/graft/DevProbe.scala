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

    import graft.functions.TextFunctions._
    import graft.functions.HashFunctions.md5Long
    val docs = Tables.documents(spark, sfDir)
    val ex1 = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    time("explode-tokens-warm")(noop(ex1))
    time("explode-tokens")(noop(ex1))
    val toksDf = docs.select(col("doc_id"), tokens(col("text")).as("tk"))
    val ex2 = toksDf.select(col("doc_id"), explode(col("tk")).as("tok"))
    time("explode-tokens-attr")(noop(ex2))
    // does keeping tk as an output defeat the inline?
    val ex3 = toksDf.select(col("doc_id"), col("tk"), explode(col("tk")).as("tok")).drop("tk")
    time("explode-tokens-keep")(noop(ex3))
    // raw split (no filter HOF) inline:
    val ex4 = docs.select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("tok"))
    time("explode-split-inline")(noop(ex4))
    // bigram shape inline vs staged
    val big1 = docs.select(col("doc_id"), tokens(col("text")).as("tk"))
      .where(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(tk) - 1), i -> struct(element_at(tk, i) AS prev, element_at(tk, i + 1) AS w))")).as("p"))
      .select(col("doc_id"), col("p.prev").as("prev"), col("p.w").as("w"))
    time("bigram-inline")(noop(big1))
    val big2 = docs.select(col("doc_id"), tokens(col("text")).as("tk"))
      .where(size(col("tk")) >= 2)
      .select(col("doc_id"), col("tk"), posexplode(sequence(lit(1), size(col("tk")) - 1)).as(Seq("p0", "i")))
      .select(col("doc_id"), element_at(col("tk"), col("i")).as("prev"), element_at(col("tk"), col("i") + 1).as("w"))
    time("bigram-staged")(noop(big2))
    time("bigram-staged2")(noop(big2))

    spark.stop()
  }
}
