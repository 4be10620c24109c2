package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.tuning.foldLeft(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (codegen, scan machinery) so the first timed
    // query isn't charged for JVM/session startup
    spark.range(1000000).selectExpr("sum(id)").collect()
    // JIT warmup: run EVERY query once against the smallest sibling
    // scale factor, so timings below measure steady-state execution
    // rather than whichever query happens to trigger compilation
    // (e.g. the clustering loop runs 12s cold vs 3.7s warm)
    val warmDir = new java.io.File(sfDir).getParentFile match {
      case null => None
      case p =>
        val w = new java.io.File(p, "sf0.001")
        if (w.isDirectory && w.getPath != sfDir) Some(w.getPath) else None
    }
    warmDir.foreach { wd =>
      SparkEntry.queries.values.foreach { fn =>
        try fn(spark, wd).count() catch { case _: Throwable => () }
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    SparkEntry.queries.headOption.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // a failed query must be VISIBLE (-1), not a fast-looking timing
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case t: Throwable =>
          System.err.println(s"BENCH FAIL $name: ${t.getClass.getSimpleName}: ${t.getMessage}")
          false
      }
      val dt = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      // drop whatever a query left behind so later ones don't
      // inherit its heap: clearCache for catalog-level caches plus
      // an RDD-level sweep (localCheckpoint blocks, e.g. the
      // clustering result, live outside the CacheManager)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
