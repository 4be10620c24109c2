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
        |       graft_intersect_size(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS isz
        |FROM sqlsurface""".stripMargin).head()
    assert(row.getDouble(1) == 11.0) // d = 1*3 + 2*4
    assert(row.getInt(2) == 3) // 5 tokens → 3 trigrams
    assert(row.getLong(3) == 2L)
    // SQL simhash == Column-API simhash
    val viaColumn = Seq("a b c d e").toDF("t")
      .select(graft.plans.NativeExprs.simhash32(split($"t", " "))).as[Long].head()
    assert(row.getLong(0) == viaColumn)
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

  test("csv source round-trips with explicit schema") {
    val tmp = Files.createTempDirectory("graft_csv").toString
    Files.writeString(java.nio.file.Path.of(s"$tmp/data.csv"),
      "url,title,content,author,date\nu1,t1,hello world,a1,2024-01-01\n")
    val df = Sources.readCsv(spark, tmp, Sources.RawPageSchema)
    assert(df.count() == 1)
    assert(df.select($"content").as[String].head() == "hello world")
  }
}
