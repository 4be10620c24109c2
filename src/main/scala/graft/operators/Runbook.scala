package graft.operators

import graft.sources.DeltaSource
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's orchestration surface — its Airflow DAG sequences
  * bronze → silver → gold with retries and task dependencies
  * (/root/reference/airflow/dags/etl.py:246-307) — re-expressed
  * WITHOUT an external scheduler: every zone is a Delta table, and a
  * stage's "have I already done this?" question is answered by the
  * Delta log itself.
  *
  * Contract per stage:
  *  - input  = the upstream zone's Delta table (or the raw corpus);
  *  - output = this zone's Delta table, committed atomically through
  *    `DeltaSource.writeDelta` (a killed run leaves at worst orphan
  *    data files, never a half-visible commit — the commit IS the
  *    completion marker);
  *  - the commit records the INPUT VERSION it was computed from (a
  *    `graftInputVersion=<v>` marker file written next to the log
  *    after the commit). On re-run, a stage whose recorded input
  *    version still equals the upstream's current version is SKIPPED;
  *    otherwise it recomputes. A crash between commit and marker
  *    re-runs the stage once (idempotent: full-snapshot overwrite).
  *
  * So `run` is restartable at any point — rerunning after a crash,
  * or on a schedule, does exactly the work whose inputs changed and
  * no more: the DAG's retry + dependency semantics as a pure
  * library, driveable from cron, Airflow, or a notebook alike.
  *
  * Scale: each stage is the already-audited medallion operator
  * (map-only except the silver dedup shuffle); the sequencing layer
  * adds only driver-side log reads, KB-sized at any corpus size.
  */
object Runbook {

  final case class StageResult(stage: String, action: String,
                               outVersion: Long, inVersion: Long)

  /** Marker path for a zone's last-processed input version. */
  private def markerPath(zone: String) =
    new org.apache.hadoop.fs.Path(zone, "_delta_log/_graft_input_version")

  private def readMarker(spark: SparkSession, zone: String): Option[Long] = {
    val p = markerPath(zone)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong)
      finally in.close()
    }
  }

  private def writeMarker(spark: SparkSession, zone: String, v: Long): Unit = {
    val p = markerPath(zone)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, /* overwrite = */ true)
    try out.write(v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Run one stage: skip when the upstream version is unchanged,
    * else transform + commit + record. */
  private def stage(spark: SparkSession, name: String, zone: String,
                    inVersion: Long)(compute: => DataFrame): StageResult = {
    val done = readMarker(spark, zone)
    if (done.contains(inVersion) && DeltaSource.latestVersion(spark, zone).isDefined)
      StageResult(name, "skipped",
        DeltaSource.latestVersion(spark, zone).get, inVersion)
    else {
      val v = DeltaSource.writeDelta(compute, zone)
      writeMarker(spark, zone, inVersion)
      StageResult(name, "written", v, inVersion)
    }
  }

  /** Bronze → silver → gold → embeddings against `lakeDir`, reading
    * the raw corpus from `inputDir`. Returns one row per stage with
    * the action taken — the runbook's audit trail. */
  def run(spark: SparkSession, inputDir: String, lakeDir: String,
          encoder: TextEncoder = StubTextEncoder()): Seq[StageResult] = {
    val bronzeT = s"$lakeDir/bronze"
    val silverT = s"$lakeDir/silver"
    val goldT = s"$lakeDir/gold"
    val embT = s"$lakeDir/embeddings"

    // the raw corpus has no Delta log; version it by content-free
    // metadata (file count + total bytes + newest mtime) so an
    // unchanged drop directory skips the whole pipeline
    val inRoot = new org.apache.hadoop.fs.Path(inputDir)
    val fs = inRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val statuses = fs.listStatus(inRoot).filter(_.isFile)
    val rawVersion = statuses.map(s => s.getLen + s.getModificationTime).sum +
      statuses.length

    val r1 = stage(spark, "bronze", bronzeT, rawVersion) {
      Medallion.bronze(graft.Tables.documents(spark, inputDir))
        .select(col("doc_id"), col("source"), col("content"), col("content_length"))
    }
    val r2 = stage(spark, "silver", silverT, r1.outVersion) {
      Medallion.silverDedup(Medallion.silverNormalize(
        DeltaSource.readDelta(spark, bronzeT)))
        .select(col("doc_id"), col("source"), col("content"), col("content_length"))
    }
    val r3 = stage(spark, "gold", goldT, r2.outVersion) {
      Chunker.fixedStride(DeltaSource.readDelta(spark, silverT), "content")
        .select(col("doc_id"), col("source"), col("chunk_idx"),
          col("chunk"), col("chunk_length"))
    }
    val r4 = stage(spark, "embeddings", embT, r3.outVersion) {
      Embedder.embed(DeltaSource.readDelta(spark, goldT), "chunk",
        Seq("doc_id", "chunk_idx"), encoder)
    }
    Seq(r1, r2, r3, r4)
  }

  /** CLI: `Runbook <inputDir> <lakeDir>` — prints the audit trail.
    * Re-running is always safe; it does only the work whose inputs
    * changed. */
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: Runbook <inputDir> <lakeDir>")
    val spark = graft.GraftSession.getOrCreate(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt)
    spark.sparkContext.setLogLevel("WARN")
    run(spark, args(0), args(1)).foreach { r =>
      println(s"${r.stage}: ${r.action} (out v${r.outVersion} <- in v${r.inVersion})")
    }
    spark.stop()
  }
}
