package graft

/** Targeted timing loop for iterating on the bench's slow tail
  * without paying for the full 195-query sweep. Not part of the
  * driver contract — test-scope tooling only.
  *
  * Usage: sbt "Test/runMain graft.BenchTail q1 q2 ..." (defaults to
  * the md5-heavy tail from the round-4 verdict). Prints min-of-3
  * steady-state seconds per query at sf0.1.
  */
object BenchTail {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("ann_lsh_topk", "ann_lsh_recall", "dedup_embedding_lsh",
        "q_exists_highvalue", "dq_profile", "dedup_winnowing", "dedup_minhash_lsh",
        "ev_user_stats")
    val spark = GraftSession.getOrCreate("local[32]", 32)
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (n <- names) {
      val fn = SparkEntry.queries(n)
      exec(fn(spark, sfDir)) // warm
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        exec(fn(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }.min
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      println(f"TAIL $n%-24s ${t}%.3f s")
    }
    spark.stop()
  }
}
