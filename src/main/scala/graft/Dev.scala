package graft

import org.apache.spark.sql.SparkSession

/** Scratch dev entrypoint (not part of the library surface). */
object Dev {
  def main(args: Array[String]): Unit = {
    // cluster-config path: extensions injected at session build time
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.documents(spark, "/root/testdata/sf0.01").createOrReplaceTempView("documents")
    println("== via spark.sql.extensions ==")
    spark.sql(
      """SELECT doc_id, graft_simhash32(split(text, ' ')) AS simhash,
        |       graft_minhash_sig(graft_hashed_shingles(split(text, ' '), 3), 4) AS sig4
        |FROM documents ORDER BY doc_id LIMIT 3""".stripMargin).show(false)

    println("== probe: non-literal k ==")
    try {
      spark.sql("SELECT graft_minhash_sig(graft_hashed_shingles(split(text,' '),3), doc_id + 1) FROM documents LIMIT 1").show()
      println("NO ERROR (unexpected)")
    } catch {
      case e: Throwable => println(s"error class: ${e.getClass.getSimpleName}: ${e.getMessage.linesIterator.next()}")
    }

    println("== zone IO: partitioned write + pruned read ==")
    val tmp = java.nio.file.Files.createTempDirectory("zone").toString
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    graft.sources.Sources.writeZone(ev, s"$tmp/gold", Seq("day"))
    val read = graft.sources.Sources.readZone(spark, s"$tmp/gold")
      .where(col("day") === "2024-01-05")
    println("rows: " + read.count())
    read.explain() // expect PartitionFilters on day
    spark.stop()
  }
}
