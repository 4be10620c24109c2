package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}

/** Conditional-put commit arbitration through a SEPARATE
  * coordination filesystem — the architecture of Delta's
  * S3DynamoDBLogStore, with a filesystem playing DynamoDB's role:
  * the winner of version N is whoever CREATES the coordination entry
  * `<coordDir>/<table-key>/N.json` first (create-exclusive, atomic
  * on local disk / HDFS / any CAS-capable store), and only then is
  * the data-side `_delta_log/N.json` written — with overwrite
  * allowed, because arbitration has already decided. This makes
  * multi-writer commits safe when the TABLE lives on a filesystem
  * whose create-exclusive is not atomic (s3a/MinIO — see
  * [[CommitStore]]), as long as all writers share one coordination
  * root on a store that is.
  *
  * Write-ahead durability: the entry carries the FULL commit content
  * (commit JSONs are KB-scale regardless of table size). A writer
  * that crashes after winning arbitration but before landing the
  * data-side file leaves a durable entry; every subsequent
  * `putIfAbsent` against the same table — and any reader calling
  * [[recoverLog]] — first copies over entries whose data-side file
  * is missing, so a won commit is never lost. A LOSING writer also
  * performs that copy for the version it lost before reporting the
  * conflict, so its own retry loop immediately sees the winner in
  * the log.
  *
  * Entry hygiene: entries whose data-side file exists and that sit
  * more than `retainEntries` versions behind the newest are deleted
  * opportunistically — the coordination dir stays O(retainEntries)
  * regardless of table history.
  *
  * The data-side copy uses overwrite=true with IDENTICAL bytes from
  * any party (winner or recoverers), so replays are idempotent; on a
  * real object store each copy is one atomic PUT.
  */
class CoordinatedCommitStore(coordDir: String, retainEntries: Int = 100)
    extends CommitStore {

  /** Coordination subdirectory for one table's log: keyed by an md5
    * of the log directory's URI (stable across writers, collision-
    * free in practice, path-safe). */
  private[graft] def tableDir(logDir: Path): Path = {
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(logDir.toUri.toString.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    new Path(coordDir, key)
  }

  private def readAll(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
  }

  private def writeFile(fs: FileSystem, p: Path, content: String,
                        overwrite: Boolean): Unit = {
    val out = fs.create(p, overwrite)
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  /** Copy every coordination entry whose data-side commit file is
    * missing into the log (idempotent), and prune old satisfied
    * entries. Writers run this before each attempt; a READER of a
    * multi-writer table on a non-atomic store should run it (via the
    * companion's [[CoordinatedCommitStore.recoverLog]]) before
    * trusting the log listing, mirroring S3DynamoDBLogStore's
    * read-side fixup. */
  private def recoverAndPrune(dataFs: FileSystem, cfs: FileSystem,
                              dir: Path, logDir: Path): Unit = {
    if (!cfs.exists(dir)) return
    val entries = cfs.listStatus(dir).toSeq.filter(_.isFile)
      .map(_.getPath).filter(_.getName.endsWith(".json"))
      .sortBy(_.getName)
    entries.foreach { e =>
      val dataSide = new Path(logDir, e.getName)
      if (!dataFs.exists(dataSide))
        writeFile(dataFs, dataSide, readAll(cfs, e), overwrite = true)
    }
    if (entries.size > retainEntries)
      entries.dropRight(retainEntries).foreach { e =>
        if (dataFs.exists(new Path(logDir, e.getName))) cfs.delete(e, false)
      }
  }

  override def putIfAbsent(fs: FileSystem, path: Path, content: String): Unit = {
    val logDir = path.getParent
    val dir = tableDir(logDir)
    val cfs = dir.getFileSystem(fs.getConf)
    cfs.mkdirs(dir)
    recoverAndPrune(fs, cfs, dir, logDir)
    val entry = new Path(dir, path.getName)
    try {
      // the arbitration point: atomic on the COORDINATION store
      writeFile(cfs, entry, content, overwrite = false)
    } catch {
      case e: Exception =>
        // lost the race — land the winner's content on the data side
        // so the caller's retry loop sees it in the log immediately
        if (cfs.exists(entry) && !fs.exists(path))
          writeFile(fs, path, readAll(cfs, entry), overwrite = true)
        throw e
    }
    // arbitration won: the data-side write may overwrite (a stale
    // recovery copy of OUR OWN entry at worst — identical bytes)
    writeFile(fs, path, content, overwrite = true)
  }
}

object CoordinatedCommitStore {
  /** Read-side fixup: back-fill any won-but-uncopied commits of
    * `tablePath` from the coordination root into its `_delta_log`.
    * Call before reading a multi-writer table on a non-atomic
    * store. */
  def recoverLog(spark: org.apache.spark.sql.SparkSession, tablePath: String,
                 coordDir: String): Unit = {
    val store = new CoordinatedCommitStore(coordDir)
    val logDir = new Path(tablePath, "_delta_log")
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // recovery is putIfAbsent's preamble; an impossible version never
    // creates an entry, so this only back-fills and prunes
    val dir = store.tableDir(logDir)
    val cfs = dir.getFileSystem(fs.getConf)
    if (!cfs.exists(dir)) return
    cfs.listStatus(dir).toSeq.filter(_.isFile).map(_.getPath)
      .filter(_.getName.endsWith(".json")).foreach { e =>
        val dataSide = new Path(logDir, e.getName)
        if (!fs.exists(dataSide)) {
          val in = cfs.open(e)
          val content = try new String(in.readAllBytes(), StandardCharsets.UTF_8)
            finally in.close()
          val out = fs.create(dataSide, true)
          try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
        }
      }
  }
}
