package graft

import graft.operators.Runbook
import graft.sources.DeltaSource
import org.apache.spark.sql.functions._

/** The scheduler-free pipeline runbook: correct zone contents,
  * skip-when-unchanged idempotency, and input-change propagation
  * down the stage DAG. */
class RunbookSpec extends SparkSpec {

  private def freshLake(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_lake").toFile
    d.deleteOnExit()
    d.getPath
  }

  test("one run lands all four zones with the medallion contents") {
    val lake = freshLake()
    val res = Runbook.run(spark, sf, lake)
    assert(res.map(r => (r.stage, r.action)) == Seq(
      "bronze" -> "written", "silver" -> "written",
      "gold" -> "written", "embeddings" -> "written"))
    // zone contents equal the in-memory pipeline on the same corpus
    val silver = DeltaSource.readDelta(spark, s"$lake/silver")
    val want = graft.operators.Medallion.silverDedup(
      graft.operators.Medallion.silverNormalize(
        graft.operators.Medallion.bronze(Tables.documents(spark, sf))))
      .select(col("doc_id"), col("source"), col("content"), col("content_length"))
    assert(silver.orderBy(col("doc_id")).collect().toSeq ==
      want.orderBy(col("doc_id")).collect().toSeq)
    val gold = DeltaSource.readDelta(spark, s"$lake/gold")
    assert(gold.count() ==
      graft.operators.Chunker.fixedStride(want, "content").count())
    val emb = DeltaSource.readDelta(spark, s"$lake/embeddings")
    assert(emb.count() == gold.count())
    assert(emb.schema("embedding").dataType.typeName == "array")
  }

  test("an unchanged re-run skips every stage (restartable, no-op)") {
    val lake = freshLake()
    Runbook.run(spark, sf, lake)
    val second = Runbook.run(spark, sf, lake)
    assert(second.map(_.action).forall(_ == "skipped"), second.toString)
    // versions did not advance
    assert(DeltaSource.latestVersion(spark, s"$lake/gold").contains(0L))
  }

  test("an upstream change recomputes only downstream stages") {
    val lake = freshLake()
    Runbook.run(spark, sf, lake)
    // simulate a bronze-only change: recommit bronze (new version),
    // leaving the raw drop directory untouched
    val bronze = DeltaSource.readDelta(spark, s"$lake/bronze")
    DeltaSource.writeDelta(bronze.limit(100), s"$lake/bronze")
    val res = Runbook.run(spark, sf, lake)
    assert(res.map(r => (r.stage, r.action)) == Seq(
      "bronze" -> "skipped", "silver" -> "written",
      "gold" -> "written", "embeddings" -> "written"), res.toString)
    // silver now reflects the shrunk bronze
    assert(DeltaSource.readDelta(spark, s"$lake/silver").count() <= 100)
  }
}
