package graft

import graft.plans.GraftFunctions
import graft.sources.Sources
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("native expressions are callable from pure SQL") {
    GraftFunctions.register(spark)
    Seq(("a b c d e", Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)))
      .toDF("t", "x", "y").createOrReplaceTempView("sqlsurface")
    val row = spark.sql(
      """SELECT graft_simhash32(split(t, ' ')) AS sh,
        |       graft_dot(x, y) AS d,
        |       size(graft_hashed_shingles(split(t, ' '), 3)) AS ns,
        |       graft_intersect_size(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS isz,
        |       size(graft_recursive_split(repeat(t, 3), 8, 2)) AS nchunks
        |FROM sqlsurface""".stripMargin).head()
    assert(row.getDouble(1) == 11.0) // d = 1*3 + 2*4
    assert(row.getInt(2) == 3) // 5 tokens → 3 trigrams
    assert(row.getLong(3) == 2L)
    assert(row.getInt(4) ==
      graft.operators.Chunker.splitRecursive("a b c d e" * 3, 8, 2).length)
    // SQL simhash == Column-API simhash
    val viaColumn = Seq("a b c d e").toDF("t")
      .select(graft.plans.NativeExprs.simhash32(split($"t", " "))).as[Long].head()
    assert(row.getLong(0) == viaColumn)
    // the hilbert index is SQL-reachable and matches the static eval
    val h = spark.sql("SELECT graft_hilbert(5L, 9L, 4) AS h").as[Long].head()
    assert(h == graft.plans.NativeExprs.hilbertEval(5L, 9L, 4))
  }

  test("partitioned zone write enables partition pruning") {
    val tmp = Files.createTempDirectory("graft_zone").toString
    val df = Tables.events(spark, sf)
      .withColumn("day", date_format($"ts", "yyyy-MM-dd"))
    Sources.writeZone(df, s"$tmp/gold", Seq("day"))
    val firstDay = df.select(min($"day")).as[String].head()
    val read = Sources.readZone(spark, s"$tmp/gold").where($"day" === firstDay)
    // the pruned scan must list only the one matching partition
    val scan = read.queryExecution.executedPlan.collectLeaves().head.toString
    assert(read.count() > 0)
    assert(read.count() == df.where($"day" === firstDay).count())
    val files = read.select(input_file_name()).distinct().as[String].collect()
    assert(files.forall(_.contains(s"day=$firstDay")), s"unpruned read: ${files.take(3).mkString}")
  }

  test("orc zone round-trips with partition pruning and pushed filters") {
    val tmp = Files.createTempDirectory("graft_orc").toString
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text", $"source")
    Sources.writeOrcZone(docs, s"$tmp/z", Seq("source"))
    val back = Sources.readOrcZone(spark, s"$tmp/z")
    assert(back.count() == docs.count())
    val one = back.where($"source" === "src0" && $"doc_id" < 100)
    assert(one.count() == docs.where($"source" === "src0" && $"doc_id" < 100).count())
    val scan = one.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains("PushedFilters") && scan.contains("LessThan(doc_id,100)"),
      s"orc pushdown missing: ${scan.take(300)}")
  }

  test("compaction preserves data and hits the target file count") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val docs = Tables.documents(spark, sf)
    docs.repartition(40).write.mode("overwrite").parquet(s"$tmp/tiny")
    graft.sources.Sources.compactZone(spark, s"$tmp/tiny", s"$tmp/big", targetRows = 250)
    val before = new java.io.File(s"$tmp/tiny").listFiles.count(_.getName.endsWith(".parquet"))
    val after = new java.io.File(s"$tmp/big").listFiles.count(_.getName.endsWith(".parquet"))
    assert(before == 40 && after == 2)
    assert(spark.read.parquet(s"$tmp/big").count() == docs.count())
  }

  test("clustered write produces range-disjoint files (data skipping layout)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cluster").toString
    val docs = Tables.documents(spark, sf)
    graft.sources.Sources.writeClusteredZone(docs, s"$tmp/z", Seq("doc_id"), numFiles = 4)
    val files = new java.io.File(s"$tmp/z").listFiles
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length == 4)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(org.apache.spark.sql.functions.min($"doc_id"),
          org.apache.spark.sql.functions.max($"doc_id"))
        .as[(Long, Long)].head()
      r
    }.sortBy(_._1)
    // every file's range ends before the next begins → footer min/max
    // stats prune whole files for key-ranged scans
    assert(ranges.sliding(2).forall {
      case Array(a, b) => a._2 < b._1
      case _ => true
    })
  }

  test("upsert replaces matched keys and appends new ones") {
    import graft.operators.Medallion
    val existing = Seq((1L, "old", "s"), (2L, "keep", "s")).toDF("doc_id", "text", "source")
    val updates = Seq((1L, "new", "s"), (9L, "fresh", "s")).toDF("doc_id", "text", "source")
    val got = Medallion.upsertByKey(existing, updates)
      .select($"doc_id", $"text", $"is_update").as[(Long, String, Int)]
      .collect().toSeq.sortBy(_._1)
    assert(got == Seq((1L, "new", 1), (2L, "keep", 0), (9L, "fresh", 1)))
  }

  test("csv source round-trips with explicit schema") {
    val tmp = Files.createTempDirectory("graft_csv").toString
    Files.writeString(java.nio.file.Path.of(s"$tmp/data.csv"),
      "url,title,content,author,date\nu1,t1,hello world,a1,2024-01-01\n")
    val df = Sources.readCsv(spark, tmp, Sources.RawPageSchema)
    assert(df.count() == 1)
    assert(df.select($"content").as[String].head() == "hello world")
  }
}
