package graft

import java.nio.file.Files
import graft.operators.Similarity
import graft.sources.DeltaSource
import org.apache.spark.sql.functions._

/** Round-7 wave 2: RESTORE as a metadata-only versioned commit, the
  * recall-vs-nprobe curve's monotonicity, cluster purity bounds, and
  * dimension-correlation self-consistency. */
class Round7Wave2Spec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft_r7w2_$tag").toString + "/t"

  test("restore rolls back to v0 and is itself a versioned, revertible commit") {
    val t = tmpDir("restore")
    val data = spark.range(100).select($"id", ($"id" % 7).as("grp"))
    DeltaSource.writeDelta(data.where($"id" < 50), t)
    DeltaSource.writeDelta(data.where($"id" >= 50), t, overwrite = false)
    assert(DeltaSource.readDelta(spark, t).count() == 100)
    val v = DeltaSource.restoreDelta(spark, t, 0L)
    assert(v == 2L)
    // latest state = v0's rows
    assert(DeltaSource.readDelta(spark, t).agg(max($"id")).as[Long].head() == 49)
    // history preserved: v1 still readable through time travel
    assert(DeltaSource.readDelta(spark, t, version = Some(1L)).count() == 100)
    // and the restore is revertible: restore to v1 brings everything back
    DeltaSource.restoreDelta(spark, t, 1L)
    assert(DeltaSource.readDelta(spark, t).count() == 100)
    // metadata-only: no data file was written by either restore (all
    // files in the final snapshot date from the two original writes)
    val files = new java.io.File(t).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length == DeltaSource.readDelta(spark, t).inputFiles.length)
  }

  test("restore refuses a vacuumed target version") {
    val t = tmpDir("vac")
    val data = spark.range(40).toDF("id")
    DeltaSource.writeDelta(data.where($"id" < 20), t)
    DeltaSource.writeDelta(data, t) // overwrite: v0's files now unreferenced
    DeltaSource.vacuum(spark, t, retainMs = 0L)
    val e = intercept[IllegalArgumentException](DeltaSource.restoreDelta(spark, t, 0L))
    assert(e.getMessage.contains("vacuumed"))
  }

  test("recall curve: recall is monotone in nprobe and hits 1.0 at full probe") {
    val emb = Tables.embeddings(spark, sf)
    val rows = Similarity.recallCurve(emb, levels = Seq(1, 2, 4, 8, 16)).collect()
    val recalls = rows.sortBy(_.getAs[Long]("nprobe")).map(_.getAs[Double]("avg_recall"))
    recalls.sliding(2).foreach {
      case Array(a, b) => assert(a <= b + 1e-9, s"recall not monotone: ${recalls.toSeq}")
      case _ =>
    }
    // probing every cell IS brute force (same rounding, same ties)
    assert(math.abs(recalls.last - 1.0) < 1e-9)
  }

  test("cluster purity: bounded, consistent with cluster sizes") {
    val emb = Tables.embeddings(spark, sf)
    val purity = Similarity.clusterPurity(emb).collect()
    purity.foreach { r =>
      val p = r.getAs[Double]("purity")
      assert(p > 0.0 && p <= 1.0)
    }
    val sizes = Similarity.clusterSizes(emb).collect()
      .map(r => r.getAs[Long]("cell") -> r.getAs[Long]("n_members")).toMap
    purity.foreach { r =>
      assert(r.getAs[Long]("n_members") == sizes(r.getAs[Long]("cell")))
    }
  }

  test("dim correlation: symmetric-formula sanity and partition invariance") {
    val emb = Tables.embeddings(spark, sf)
    val a = Similarity.dimCorrelation(emb).collect()
    assert(a.length == 28) // C(8,2)
    a.foreach { r =>
      val c = r.getAs[Double]("corr")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
    }
    val b = Similarity.dimCorrelation(emb.repartition(13)).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }
}
