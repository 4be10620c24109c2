package graft

import graft.operators.Similarity
import graft.sources.AnnIndex
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Persisted ANN index: the build/serve split is real (serve never
  * rebuilds), the served results are bit-identical to the fused
  * in-memory path, and — the layout's whole point — the serving scan
  * dynamic-partition-prunes the cell-partitioned codes table to the
  * probed cells instead of reading the corpus. */
class AnnIndexSpec extends SparkSpec {

  private def freshDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_annix_$tag").toFile
    d.deleteOnExit()
    d.getPath
  }

  private def allScans(p: SparkPlan): Seq[FileSourceScanExec] =
    PlanWalk.deepCollect(p) { case s: FileSourceScanExec => s }

  test("serve equals the fused IVF-PQ path after save/load") {
    val emb = Tables.embeddings(spark, sf)
    val dir = freshDir("serve")
    AnnIndex.buildAndSave(emb, dir)
    val served = AnnIndex.query(spark, dir, emb).collect().map(_.toString).toSeq
    val fused = Similarity.ivfpqTopK(emb).collect().map(_.toString).toSeq
    assert(served == fused)
  }

  test("ensureBuilt builds once and never rebuilds an existing layout") {
    val emb = Tables.embeddings(spark, sf)
    val dir = freshDir("ensure")
    AnnIndex.ensureBuilt(emb, dir)
    val metaFile = new java.io.File(s"$dir/meta")
    val stamp = metaFile.listFiles().map(f => f.getName -> f.lastModified()).toMap
    AnnIndex.ensureBuilt(emb, dir) // second call must be a no-op
    val again = metaFile.listFiles().map(f => f.getName -> f.lastModified()).toMap
    assert(stamp == again)
  }

  test("ensureBuilt rebuilds when the corpus behind the path changed") {
    // a layout stamped from one corpus must not serve another: the
    // fingerprint in meta flips and ensureBuilt rebuilds in place
    val emb = Tables.embeddings(spark, sf)
    val other = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val dir = freshDir("stale")
    AnnIndex.ensureBuilt(emb, dir)
    val before = spark.read.parquet(s"$dir/meta").head().getAs[String]("corpus_fp")
    AnnIndex.ensureBuilt(other, dir) // different corpus → rebuild
    val after = spark.read.parquet(s"$dir/meta").head().getAs[String]("corpus_fp")
    assert(before != after)
    // and the rebuilt index is the OTHER corpus's (row count tells)
    val nVecs = AnnIndex.stats(spark, dir)
      .agg(org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions.col("n_vecs")))
      .collect().head.getLong(0)
    assert(nVecs == other.count())
  }

  test("stats reads the persisted bytes and matches the in-memory build") {
    val emb = Tables.embeddings(spark, sf)
    val dir = freshDir("stats")
    AnnIndex.buildAndSave(emb, dir)
    import org.apache.spark.sql.functions._
    val (_, _, codes) = Similarity.ivfpqBuild(emb)
    val want = codes.groupBy(col("cell"))
      .agg(countDistinct(col("id")).as("n_vecs"), count(lit(1)).as("n_rows"),
        countDistinct(col("code")).as("n_codes"))
      .orderBy(col("cell")).collect().map(_.toString).toSeq
    val got = AnnIndex.stats(spark, dir).collect().map(_.toString).toSeq
    assert(got == want)
    // every corpus vector is in exactly one cell
    val total = AnnIndex.stats(spark, dir)
      .agg(sum(col("n_vecs"))).collect().head.getLong(0)
    assert(total == emb.count())
  }

  test("the serving scan dynamic-partition-prunes codes to the probed cells") {
    val emb = Tables.embeddings(spark, sf)
    val dir = freshDir("dpp")
    AnnIndex.ensureBuilt(emb, dir)
    val q = AnnIndex.query(spark, dir, emb)
    q.collect() // finalize the adaptive plan
    val codesScans = allScans(q.queryExecution.executedPlan)
      .filter(_.toString.contains("/codes"))
    assert(codesScans.nonEmpty, q.queryExecution.executedPlan.toString)
    // the scan must carry a dynamic partition filter on `cell` —
    // i.e. the probe join prunes directories, it does not read the
    // whole corpus and filter rows after the fact
    assert(codesScans.exists(_.toString.toLowerCase.contains("dynamicpruning")),
      codesScans.map(_.toString).mkString("\n"))
  }

  test("appendIncremental: new vectors serve without a rebuild; replays are skipped") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf)
    val dir = freshDir("incr")
    // build on the LOW half only, then append the high half
    val maxId = emb.agg(max(col("vec_id"))).head().getLong(0)
    val cut = maxId / 2
    AnnIndex.buildAndSave(emb.where(col("vec_id") <= cut), dir)
    val before = spark.read.parquet(s"$dir/codes")
      .select(col("id")).distinct().count()
    val applied = AnnIndex.appendIncremental(
      emb.where(col("vec_id") > cut), dir, incrementId = Some("inc-1"))
    assert(applied, "first append must run")
    val after = spark.read.parquet(s"$dir/codes")
      .select(col("id")).distinct().count()
    assert(after == emb.count(), s"index must now cover the corpus ($before -> $after)")
    // frozen models: encoding the build corpus against the loaded
    // models reproduces the persisted code rows bit-exactly
    val ix = AnnIndex.load(spark, dir)
    val reEnc = Similarity.ivfpqEncode(
      emb.where(col("vec_id") <= cut), ix.centroids, ix.codebooks, ix.m)
      .collect().map(_.toString).sorted.toSeq
    val persisted = ix.codes
      .join(emb.where(col("vec_id") <= cut).select(col("vec_id").as("id")), Seq("id"),
        "left_semi")
      .select(col("id"), col("cell"), col("sub"), col("code"))
      .collect().map(_.toString).sorted.toSeq
    assert(reEnc == persisted, "append must not disturb existing code rows")
    // serving over the appended layout is bit-identical to the fused
    // in-memory query over (build codes ∪ encoded increment) — the
    // appended rows participate exactly like built ones
    val inMem = Similarity.ivfpqQuery(emb, ix.centroids, ix.codebooks,
      Similarity.ivfpqEncode(emb.where(col("vec_id") <= cut),
          ix.centroids, ix.codebooks, ix.m)
        .unionByName(Similarity.ivfpqEncode(emb.where(col("vec_id") > cut),
          ix.centroids, ix.codebooks, ix.m)),
      m = ix.m).collect().map(_.toString).toSeq
    val served = AnnIndex.query(spark, dir, emb).collect().map(_.toString).toSeq
    assert(served == inMem, "served results must equal the fused union path")
    // a replayed increment is skipped: no duplicate code rows
    val replay = AnnIndex.appendIncremental(
      emb.where(col("vec_id") > cut), dir, incrementId = Some("inc-1"))
    assert(!replay, "replayed increment must be skipped")
    assert(spark.read.parquet(s"$dir/codes").count() ==
      after * ix.m, "no duplicate code rows after a replay")
    // a CRASHED attempt (data landed, meta update lost) retries
    // cleanly: the retry sweeps the orphaned increment files first
    import spark.implicits._
    val meta = spark.read.parquet(s"$dir/meta").head()
    Seq((meta.getAs[Int]("n_cells"), meta.getAs[Int]("n_codes"), meta.getAs[Int]("m"),
      meta.getAs[String]("corpus_fp"), ""))
      .toDF("n_cells", "n_codes", "m", "corpus_fp", "applied_fps")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    assert(AnnIndex.appendIncremental(
      emb.where(col("vec_id") > cut), dir, incrementId = Some("inc-1")),
      "retry after a crashed attempt must run")
    assert(spark.read.parquet(s"$dir/codes").count() == after * ix.m,
      "crash retry must not duplicate the increment's code rows")
  }
}
