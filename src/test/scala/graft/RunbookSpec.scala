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

  test("the training DAG: model zone is a versioned artifact, persisted serving = in-memory serving") {
    val lake = freshLake()
    val res = Runbook.runWithTraining(spark, sf, lake)
    assert(res.map(r => (r.stage, r.action)) == Seq(
      "bronze" -> "written", "silver" -> "written", "gold" -> "written",
      "model" -> "written", "embeddings_trained" -> "written"), res.toString)
    // the persisted model zone IS the trained table
    val model = DeltaSource.readDelta(spark, s"$lake/model")
    val want = graft.operators.Glove.trainedVectors(
      DeltaSource.readDelta(spark, s"$lake/silver")
        .withColumnRenamed("content", "text"))
    assert(model.orderBy(col("word_id"), col("dim")).collect().toSeq ==
      want.orderBy(col("word_id"), col("dim")).collect().toSeq)
    // serving the PERSISTED model equals serving the in-memory one
    val served = DeltaSource.readDelta(spark, s"$lake/embeddings_trained")
    val enc = graft.operators.GloveTextEncoder(
      graft.operators.Glove.trainedMap(graft.operators.Glove.train(
        DeltaSource.readDelta(spark, s"$lake/silver")
          .withColumnRenamed("content", "text"))),
      graft.operators.Glove.Dim)
    val inline = graft.operators.Embedder.embed(
      DeltaSource.readDelta(spark, s"$lake/gold"), "chunk",
      Seq("doc_id", "chunk_idx"), enc)
    assert(served.orderBy(col("doc_id"), col("chunk_idx")).collect().toSeq ==
      inline.orderBy(col("doc_id"), col("chunk_idx")).collect().toSeq)
    // idempotent re-run skips everything, INCLUDING the training
    val second = Runbook.runWithTraining(spark, sf, lake)
    assert(second.map(_.action).forall(_ == "skipped"), second.toString)
    // a retrained model re-embeds even with unchanged chunks: bump
    // the model zone's version without touching gold
    DeltaSource.writeDelta(model, s"$lake/model")
    val third = Runbook.runWithTraining(spark, sf, lake)
    assert(third.map(r => (r.stage, r.action)) == Seq(
      "bronze" -> "skipped", "silver" -> "skipped", "gold" -> "skipped",
      "model" -> "skipped", "embeddings_trained" -> "written"), third.toString)
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
