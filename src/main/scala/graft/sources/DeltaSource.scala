package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.net.{URLDecoder, URLEncoder}
import java.nio.charset.StandardCharsets
import java.util.UUID

/** Delta Lake table interop — the reference's actual storage format
  * (delta-rs writes every zone as a Delta table;
  * /root/reference/src/helpers/delta_queries.py:9-13 reads them back
  * with `DeltaTable(path).to_pandas()`). This module reads and writes
  * the open `_delta_log` protocol directly, so graft can point at an
  * existing lakehouse (or land zones a delta-rs/pandas consumer can
  * read) without any extra library:
  *
  *  - `readDelta` reconstructs a snapshot from the newest checkpoint
  *    parquet at-or-below the requested version plus the JSON commits
  *    after it — the standard log-replay contract: per file path, the
  *    latest add/remove action wins; surviving adds form the scan.
  *  - `writeDelta` commits parquet data files plus a JSON log entry
  *    (protocol + metaData on first commit; add/remove actions after)
  *    with create-exclusive semantics on the commit file, the same
  *    optimistic-concurrency primitive Delta itself uses.
  *  - `checkpoint` folds the current snapshot into a
  *    `NNN.checkpoint.parquet` + `_last_checkpoint`, so replay cost
  *    stays O(commits since checkpoint), not O(table history).
  *
  * Everything goes through the Hadoop FileSystem API — local disk,
  * s3a, or any other configured scheme behave identically.
  *
  * Scale notes: log JSON files are KB-sized regardless of data size;
  * the active-file reconstruction is a driver-side fold over log
  * actions, exactly like every Delta reader (the log carries file
  * metadata, not data). Partition values from `add.partitionValues`
  * are re-attached as typed literal columns per file group, so
  * partition pruning happens before any scan: version filters never
  * read data files at all.
  */
object DeltaSource {

  private case class AddFile(path: String, partitionValues: Map[String, String])

  private case class Snapshot(
      version: Long,
      schema: StructType,
      partitionColumns: Seq[String],
      files: Seq[AddFile])

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val CommitRe = """(\d{20})\.json""".r
  private val CheckpointRe = """(\d{20})\.checkpoint(?:\.\d+\.\d+)?\.parquet""".r

  /** (commit versions, checkpoint versions) present in the log. */
  private def logVersions(fs: FileSystem, logDir: Path): (Seq[Long], Seq[Long]) = {
    if (!fs.exists(logDir)) return (Seq.empty, Seq.empty)
    val names = fs.listStatus(logDir).toSeq.filter(_.isFile).map(_.getPath.getName)
    val commits = names.collect { case CommitRe(v) => v.toLong }.distinct.sorted
    val checkpoints = names.collect { case CheckpointRe(v) => v.toLong }.distinct.sorted
    (commits, checkpoints)
  }

  def latestVersion(spark: SparkSession, tablePath: String): Option[Long] = {
    val logDir = new Path(tablePath, "_delta_log")
    val (commits, checkpoints) = logVersions(fsOf(spark, logDir), logDir)
    (commits ++ checkpoints).sorted.lastOption
  }

  /** Minimal action schema — the fields snapshot reconstruction
    * needs. Unknown fields in the log are ignored (forward-compat,
    * same as any reader honoring protocol minReaderVersion 1). */
  private val ActionSchema: StructType = StructType(Seq(
    StructField("add", StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType),
      StructField("dataChange", BooleanType)))),
    StructField("remove", StructType(Seq(
      StructField("path", StringType),
      StructField("dataChange", BooleanType)))),
    StructField("metaData", StructType(Seq(
      StructField("id", StringType),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType)))))))

  /** Replay the log up to `version` (latest when None): newest
    * checkpoint ≤ version seeds the state, JSON commits after it
    * apply on top; per path the action with the highest version
    * wins, and only adds survive. */
  private def snapshot(spark: SparkSession, tablePath: String,
                       version: Option[Long]): Snapshot = {
    val logDir = new Path(tablePath, "_delta_log")
    val fs = fsOf(spark, logDir)
    val (commits, checkpoints) = logVersions(fs, logDir)
    val maxAvail = (commits ++ checkpoints).sorted.lastOption.getOrElse(
      throw new IllegalArgumentException(s"not a Delta table (no _delta_log): $tablePath"))
    val target = version.getOrElse(maxAvail)
    require(target <= maxAvail, s"version $target not in log (latest: $maxAvail)")
    val cp = checkpoints.filter(_ <= target).sorted.lastOption
    val replayCommits = commits.filter(v => v <= target && cp.forall(v > _))
    require(cp.nonEmpty || commits.headOption.contains(0L) || replayCommits.nonEmpty,
      s"log is empty up to version $target under $tablePath")

    // Checkpoint rows carry the same action structs as JSON commits.
    val cpActions: Seq[(Long, org.apache.spark.sql.Row)] = cp match {
      case None => Seq.empty
      case Some(v) =>
        val files = fs.listStatus(logDir).toSeq.map(_.getPath)
          .filter(p => CheckpointRe.findFirstMatchIn(p.getName).exists(_.group(1).toLong == v))
        spark.read.schema(ActionSchema).parquet(files.map(_.toString): _*)
          .collect().toSeq.map(r => (v, r))
    }
    val jsonActions: Seq[(Long, org.apache.spark.sql.Row)] = replayCommits.flatMap { v =>
      val f = new Path(logDir, f"$v%020d.json")
      spark.read.schema(ActionSchema).json(f.toString).collect().toSeq.map(r => (v, r))
    }

    var schemaString: Option[String] = None
    var partCols: Seq[String] = Nil
    var metaVersion = -1L
    // newest action per path wins (paths are unique within a commit)
    val state = scala.collection.mutable.LinkedHashMap[String, (Long, Option[AddFile])]()
    (cpActions ++ jsonActions).foreach { case (v, row) =>
      val addIdx = row.fieldIndex("add")
      val remIdx = row.fieldIndex("remove")
      val metaIdx = row.fieldIndex("metaData")
      if (!row.isNullAt(metaIdx)) {
        val m = row.getStruct(metaIdx)
        if (v >= metaVersion && m.getAs[String]("schemaString") != null) {
          metaVersion = v
          schemaString = Option(m.getAs[String]("schemaString"))
          partCols = Option(m.getAs[scala.collection.Seq[String]]("partitionColumns"))
            .map(_.toSeq).getOrElse(Nil)
        }
      }
      if (!row.isNullAt(addIdx)) {
        val a = row.getStruct(addIdx)
        val p = a.getAs[String]("path")
        val pv = Option(a.getAs[scala.collection.Map[String, String]]("partitionValues"))
          .map(_.toMap).getOrElse(Map.empty[String, String])
        if (state.get(p).forall(_._1 <= v)) state(p) = (v, Some(AddFile(p, pv)))
      } else if (!row.isNullAt(remIdx)) {
        val p = row.getStruct(remIdx).getAs[String]("path")
        if (p != null && state.get(p).forall(_._1 <= v)) state(p) = (v, None)
      }
    }
    val schema = schemaString
      .map(s => DataType.fromJson(s).asInstanceOf[StructType])
      .getOrElse(throw new IllegalStateException(
        s"no metaData action found in the log of $tablePath"))
    Snapshot(target, schema, partCols, state.values.collect { case (_, Some(a)) => a }.toSeq)
  }

  private def dataPath(tablePath: String, rel: String): String =
    new Path(tablePath, URLDecoder.decode(rel, "UTF-8")).toString

  /** Read a Delta table at the latest (or a pinned) version. */
  def readDelta(spark: SparkSession, tablePath: String,
                version: Option[Long] = None): DataFrame = {
    val snap = snapshot(spark, tablePath, version)
    val dataSchema = StructType(snap.schema.filterNot(f => snap.partitionColumns.contains(f.name)))
    if (snap.files.isEmpty) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snap.schema)
    } else if (snap.partitionColumns.isEmpty) {
      spark.read.schema(dataSchema)
        .parquet(snap.files.map(f => dataPath(tablePath, f.path)): _*)
        .select(snap.schema.map(f => col(f.name)).toIndexedSeq: _*)
    } else {
      // data files don't store partition columns: group files by their
      // partition values and re-attach them as typed literals, so the
      // partition predicate prunes whole groups before any scan
      val groups = snap.files.groupBy(_.partitionValues)
      groups.map { case (pv, files) =>
        val base = spark.read.schema(dataSchema)
          .parquet(files.map(f => dataPath(tablePath, f.path)): _*)
        snap.partitionColumns.foldLeft(base) { (df, c) =>
          val t = snap.schema(c).dataType
          df.withColumn(c, lit(pv.get(c).orNull).cast(t))
        }.select(snap.schema.map(f => col(f.name)).toIndexedSeq: _*)
      }.reduce(_ unionByName _)
    }
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def writeText(fs: FileSystem, p: Path, text: String, overwrite: Boolean): Unit = {
    val out = fs.create(p, overwrite)
    try out.write(text.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  /** Commit `df` as the next version of an (unpartitioned) Delta
    * table. `overwrite = true` logically removes the previous
    * snapshot's files in the same commit (full-snapshot replace, the
    * reference's zone-write mode); `false` appends. The JSON commit
    * file is created WITHOUT overwrite — two racing writers get one
    * winner and one FileAlreadyExistsException, Delta's optimistic
    * concurrency contract. */
  def writeDelta(df: DataFrame, tablePath: String, overwrite: Boolean = true): Long = {
    val spark = df.sparkSession
    val table = new Path(tablePath)
    val logDir = new Path(table, "_delta_log")
    val fs = fsOf(spark, table)
    fs.mkdirs(logDir)
    val prev = latestVersion(spark, tablePath)
    val next = prev.map(_ + 1).getOrElse(0L)
    val removed: Seq[String] =
      if (overwrite && prev.nonEmpty) snapshot(spark, tablePath, prev).files.map(_.path)
      else Nil

    // land data files under a unique staging dir, then move them in
    val stage = new Path(table, s".stage-${UUID.randomUUID().toString.take(8)}")
    df.write.mode("overwrite").parquet(stage.toString)
    val parts = fs.listStatus(stage).toSeq.map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
    val adds = parts.map { p =>
      val name = s"part-$next-${UUID.randomUUID().toString}.parquet"
      fs.rename(p, new Path(table, name))
      val size = fs.getFileStatus(new Path(table, name)).getLen
      (name, size)
    }
    fs.delete(stage, true)

    val now = System.currentTimeMillis()
    val header =
      if (next == 0L) Seq(
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
        s"""{"metaData":{"id":${jsonStr(UUID.randomUUID().toString)},"format":{"provider":"parquet","options":{}},"schemaString":${jsonStr(df.schema.json)},"partitionColumns":[],"configuration":{},"createdTime":$now}}""")
      else Seq.empty
    val addLines = adds.map { case (name, size) =>
      s"""{"add":{"path":${jsonStr(URLEncoder.encode(name, "UTF-8"))},"partitionValues":{},"size":$size,"modificationTime":$now,"dataChange":true}}"""
    }
    val removeLines = removed.map { p =>
      s"""{"remove":{"path":${jsonStr(p)},"deletionTimestamp":$now,"dataChange":true}}"""
    }
    val commit = new Path(logDir, f"$next%020d.json")
    writeText(fs, commit, (header ++ removeLines ++ addLines).mkString("", "\n", "\n"),
      overwrite = false)
    next
  }

  /** Fold the snapshot at the latest version into a checkpoint
    * parquet + `_last_checkpoint`, bounding future replay to commits
    * after it. */
  def checkpoint(spark: SparkSession, tablePath: String): Long = {
    val v = latestVersion(spark, tablePath).getOrElse(
      throw new IllegalArgumentException(s"not a Delta table: $tablePath"))
    val snap = snapshot(spark, tablePath, Some(v))
    val logDir = new Path(tablePath, "_delta_log")
    val fs = fsOf(spark, logDir)
    import spark.implicits._
    val addRows = snap.files.map(f => (f.path, f.partitionValues))
      .toDF("path", "partitionValues")
      .select(struct(col("path"), col("partitionValues"),
        lit(null).cast("long").as("size"), lit(true).as("dataChange"))
        .cast(ActionSchema("add").dataType).as("add"))
      .withColumn("remove", lit(null).cast(ActionSchema("remove").dataType))
      .withColumn("metaData", lit(null).cast(ActionSchema("metaData").dataType))
    val metaRow = Seq(((snap.schema.json, snap.partitionColumns))).toDF("s", "p")
      .select(
        lit(null).cast(ActionSchema("add").dataType).as("add"),
        lit(null).cast(ActionSchema("remove").dataType).as("remove"),
        struct(lit(UUID.randomUUID().toString).as("id"), col("s").as("schemaString"),
          col("p").as("partitionColumns")).as("metaData"))
    val stage = new Path(tablePath, s".cpstage-${UUID.randomUUID().toString.take(8)}")
    addRows.unionByName(metaRow).coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val part = fs.listStatus(stage).toSeq.map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    fs.rename(part, new Path(logDir, f"$v%020d.checkpoint.parquet"))
    fs.delete(stage, true)
    writeText(fs, new Path(logDir, "_last_checkpoint"),
      s"""{"version":$v,"size":${snap.files.size + 1}}""", overwrite = true)
    v
  }
}
