package graft

import java.nio.file.Files
import graft.sources.DeltaSource
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Generated-column contracts (the Delta-spec
  * `delta.generationExpression` schema-metadata field + the
  * generatedColumns writer gate):
  *  - a batch omitting the column gets it computed from the stored
  *    expression; a batch supplying DISAGREEING values is refused
  *    before anything lands;
  *  - the declaration survives overwrite redefinition (metadata
  *    carried) and log replay;
  *  - a generated DATE partition column derives PARTITION pruning
  *    from predicates on its timestamp source column — the
  *    scale-defining behavior: queries never mention the partition
  *    column yet still skip partitions. */
class DeltaGeneratedSpec extends SparkSpec {

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft_gen_$tag").toString + "/t"

  private def scanFiles(df: DataFrame): Long = {
    df.collect()
    def rec(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        rec(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => rec(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => rec(r.child)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(rec)
    }
    rec(df.queryExecution.executedPlan).map(_.metrics("numFiles").value).sum
  }

  /** events-shaped fixture: 100 hourly rows spanning 5 day partitions. */
  private def mkPartitioned(): String = {
    val tbl = tmpDir("part")
    val src = spark.range(100).selectExpr(
      "id",
      "TIMESTAMP'2024-03-01 00:00:00' + make_interval(0,0,0,0,CAST(id AS INT),0,0) as ts")
    DeltaSource.writeDelta(
      DeltaSource.withGeneratedColumn(src, "d", "CAST(ts AS DATE)"),
      tbl, partitionBy = Seq("d"))
    tbl
  }

  test("an append omitting the generated column gets it computed") {
    val tbl = mkPartitioned()
    DeltaSource.writeDelta(
      spark.range(100, 110).selectExpr(
        "id", "TIMESTAMP'2024-03-09 12:00:00' as ts"),
      tbl, overwrite = false)
    val got = DeltaSource.readDelta(spark, tbl)
      .where(col("id") >= 100)
      .select(col("d").cast("string")).distinct().collect().map(_.getString(0))
    assert(got.toSeq == Seq("2024-03-09"))
    assert(DeltaSource.readDelta(spark, tbl)
      .where(col("d") =!= col("ts").cast("date")).count() == 0)
  }

  test("a batch supplying disagreeing values is refused; agreeing values pass") {
    val tbl = mkPartitioned()
    val vBefore = DeltaSource.latestVersion(spark, tbl).get
    val e = intercept[IllegalStateException] {
      DeltaSource.writeDelta(
        spark.range(200, 205).selectExpr(
          "id", "TIMESTAMP'2024-03-09 12:00:00' as ts",
          "DATE'2024-01-01' as d"),
        tbl, overwrite = false)
    }
    assert(e.getMessage.contains("generated column d"))
    assert(DeltaSource.latestVersion(spark, tbl).contains(vBefore),
      "a refused write must not commit")
    DeltaSource.writeDelta(
      spark.range(200, 205).selectExpr(
        "id", "TIMESTAMP'2024-03-09 12:00:00' as ts",
        "DATE'2024-03-09' as d"),
      tbl, overwrite = false)
    assert(DeltaSource.readDelta(spark, tbl).count() == 105)
  }

  test("the declaration survives log replay and overwrite redefinition") {
    val tbl = mkPartitioned()
    assert(DeltaSource.generationExpressionsOf(spark, tbl) ==
      Map("d" -> "CAST(ts AS DATE)"))
    // overwrite with a df whose fields carry NO metadata: the
    // declaration must be carried from the previous schema
    DeltaSource.writeDelta(
      spark.range(50).selectExpr(
        "id",
        "TIMESTAMP'2024-06-01 00:00:00' + make_interval(0,0,0,CAST(id % 2 AS INT),0,0,0) as ts",
        "CAST(TIMESTAMP'2024-06-01 00:00:00' + make_interval(0,0,0,CAST(id % 2 AS INT),0,0,0) AS DATE) as d"),
      tbl, overwrite = true)
    assert(DeltaSource.generationExpressionsOf(spark, tbl) ==
      Map("d" -> "CAST(ts AS DATE)"))
    // and a later append still fills the column
    DeltaSource.writeDelta(
      spark.range(900, 901).selectExpr("id", "TIMESTAMP'2024-06-05 00:00:00' as ts"),
      tbl, overwrite = false)
    assert(DeltaSource.readDelta(spark, tbl)
      .where(col("d") === lit("2024-06-05").cast("date")).count() == 1)
  }

  test("the generatedColumns writer gate rides the declaring commit") {
    val tbl = mkPartitioned()
    val log = Files.readString(java.nio.file.Paths.get(
      tbl, "_delta_log", "00000000000000000000.json"))
    assert(log.contains("\"minWriterVersion\":4"),
      s"declaring commit must carry the writer gate, got: $log")
  }

  test("a predicate on the SOURCE column prunes generated-date partitions") {
    val tbl = mkPartitioned()
    val all = DeltaSource.readDelta(spark, tbl)
    val total = scanFiles(all.select(sum(col("id"))))
    assert(total >= 4, s"fixture must span >= 4 day partitions, got $total files")
    // range predicate on ts only — never mentions d
    val oneDay = DeltaSource.readDelta(spark, tbl)
      .where(col("ts") >= lit("2024-03-02 00:00:00").cast("timestamp") &&
        col("ts") < lit("2024-03-03 00:00:00").cast("timestamp"))
    assert(oneDay.count() == 24)
    val pruned = scanFiles(oneDay.select(sum(col("id"))))
    assert(pruned < total,
      s"ts range must prune date partitions: $pruned of $total files scanned")
    // equality predicate
    val eq = DeltaSource.readDelta(spark, tbl)
      .where(col("ts") === lit("2024-03-02 05:00:00").cast("timestamp"))
    assert(eq.count() == 1)
    assert(scanFiles(eq.select(count(lit(1)))) <= total / 2)
  }

  test("date_trunc HOUR partitions prune from a ts range; year(ts) partitions prune too") {
    // hour-grain: 100 hourly rows → 100 hour partitions
    val hrTbl = tmpDir("hr")
    val src = spark.range(100).selectExpr(
      "id",
      "TIMESTAMP'2024-03-01 00:00:00' + make_interval(0,0,0,0,CAST(id AS INT),0,0) as ts")
    DeltaSource.writeDelta(
      DeltaSource.withGeneratedColumn(src, "h", "date_trunc('HOUR', ts)"),
      hrTbl, partitionBy = Seq("h"))
    val total = scanFiles(DeltaSource.readDelta(spark, hrTbl).select(sum(col("id"))))
    val sixHours = DeltaSource.readDelta(spark, hrTbl)
      .where(col("ts") >= lit("2024-03-02 00:30:00").cast("timestamp") &&
        col("ts") < lit("2024-03-02 06:30:00").cast("timestamp"))
    assert(sixHours.count() == 6)
    val pruned = scanFiles(sixHours.select(sum(col("id"))))
    assert(pruned <= 7 && pruned < total,
      s"hour-grain derived pruning: $pruned of $total files scanned")

    // year-grain: 4 rows across 4 years
    val yrTbl = tmpDir("yr")
    val ysrc = spark.range(4).selectExpr(
      "id",
      "TIMESTAMP'2021-06-15 12:00:00' + make_interval(CAST(id AS INT),0,0,0,0,0,0) as ts")
    DeltaSource.writeDelta(
      DeltaSource.withGeneratedColumn(ysrc, "y", "year(ts)"),
      yrTbl, partitionBy = Seq("y"))
    val yTotal = scanFiles(DeltaSource.readDelta(spark, yrTbl).select(sum(col("id"))))
    assert(yTotal >= 4)
    val oneYear = DeltaSource.readDelta(spark, yrTbl)
      .where(col("ts") >= lit("2023-01-01 00:00:00").cast("timestamp") &&
        col("ts") < lit("2024-01-01 00:00:00").cast("timestamp"))
    assert(oneYear.count() == 1)
    assert(scanFiles(oneYear.select(count(lit(1)))) == 1,
      "year(ts) derived pruning must isolate one year partition")
  }

  test("MERGE fills an omitted generated column and refuses disagreement") {
    import spark.implicits._
    val tbl = mkPartitioned()
    // merge WITHOUT the generated column: filled from the expression
    DeltaSource.mergeDelta(spark, tbl,
      Seq((500L, java.sql.Timestamp.valueOf("2024-03-20 08:00:00")))
        .toDF("id", "ts"), Seq("id"))
    val got = DeltaSource.readDelta(spark, tbl)
      .where(col("id") === 500).select(col("d").cast("string")).head().getString(0)
    assert(got == "2024-03-20", "merge must compute the generated column")
    // merge WITH a disagreeing value: refused before anything lands
    val vBefore = DeltaSource.latestVersion(spark, tbl).get
    val e = intercept[IllegalStateException] {
      DeltaSource.mergeDelta(spark, tbl,
        Seq((501L, java.sql.Timestamp.valueOf("2024-03-20 08:00:00"),
          java.sql.Date.valueOf("2020-01-01"))).toDF("id", "ts", "d"), Seq("id"))
    }
    assert(e.getMessage.contains("generated column d"))
    assert(DeltaSource.latestVersion(spark, tbl).contains(vBefore))
  }

  test("derived pruning never drops matching rows across day boundaries") {
    val tbl = mkPartitioned()
    // window straddling two partitions, half-open on both styles
    val win = DeltaSource.readDelta(spark, tbl)
      .where(col("ts") > lit("2024-03-01 20:00:00").cast("timestamp") &&
        col("ts") <= lit("2024-03-02 03:00:00").cast("timestamp"))
    assert(win.count() == 7, "exact row preservation across the boundary")
  }
}
