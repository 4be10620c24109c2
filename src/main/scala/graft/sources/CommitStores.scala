package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileAlreadyExistsException, FileSystem, Path}

/** Conditional-put commit arbitration through a SEPARATE
  * coordination filesystem — the architecture of Delta's
  * S3DynamoDBLogStore, with a filesystem playing DynamoDB's role:
  * the winner of version N is whoever CREATES the coordination entry
  * `<coordDir>/<table-key>/N.json` first (create-exclusive — atomic
  * on local disk / HDFS / any CAS-capable store; a plain rename
  * would NOT arbitrate on POSIX, where rename replaces an existing
  * destination). Only then is the data-side `_delta_log/N.json`
  * written — with overwrite allowed, because arbitration has already
  * decided. This makes multi-writer commits safe when the TABLE
  * lives on a filesystem whose create-exclusive is not atomic
  * (s3a/MinIO — see [[CommitStore]]), as long as all writers share
  * one coordination root on a store that is.
  *
  * Entry integrity: the claim (file creation) and the content write
  * are not one atomic step, so every entry ends with a completeness
  * FOOTER line. An entry without the footer is torn or in-flight:
  * recovery skips it, and a conflicting writer polls briefly for the
  * footer before copying (a live winner finishes in milliseconds).
  * A writer that dies INSIDE the KB-scale entry write leaves a
  * claimed-but-torn entry — conflicting writers surface a
  * descriptive error instead of guessing (operator resolution:
  * delete the torn entry); the window is microseconds per commit.
  *
  * Write-ahead durability: the entry carries the FULL commit content
  * (commit JSONs are KB-scale regardless of table size). A writer
  * that crashes after the entry completed but before landing the
  * data-side file leaves a durable entry; the NEXT writer that races
  * for that version loses to the entry, copies it over to the data
  * side itself, and retries at the following version — so a won
  * commit always surfaces before anything commits above it. A
  * reader can force the same back-fill with [[CoordinatedCommitStore
  * .recoverLog]].
  *
  * Hot-path cost: one data-side existence probe + one entry create
  * per commit. The coordination dir is only LISTED on the conflict
  * path and on the periodic prune (every `PruneEvery`-th version),
  * so a healthy single-writer stream pays no O(history) requests.
  * Entries whose data-side file exists and that sit more than
  * `retainEntries` versions behind the newest are pruned — the dir
  * stays O(retainEntries) regardless of history.
  *
  * The data-side copy uses overwrite=true with IDENTICAL bytes from
  * any party (winner or recoverers), so replays are idempotent; a
  * version whose data-side file already exists is REFUSED before
  * arbitration (per the [[CommitStore]] contract — a pruned entry or
  * pre-adoption history must never be silently rewritten).
  */
class CoordinatedCommitStore(coordDir: String, retainEntries: Int = 100,
                             tornPollMaxMs: Long = 10000L)
    extends CommitStore {

  import CoordinatedCommitStore.Footer

  private val PruneEvery = 16
  private val TornPollMs = 50L

  /** Coordination subdirectory for one table's log: keyed by an md5
    * of the log directory's URI (stable across writers, collision-
    * free in practice, path-safe). */
  private[graft] def tableDir(logDir: Path): Path = {
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(logDir.toUri.toString.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    new Path(coordDir, key)
  }

  private def writeFile(fs: FileSystem, p: Path, content: String,
                        overwrite: Boolean): Unit = {
    val out = fs.create(p, overwrite)
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  /** The entry's commit content iff its completeness footer landed;
    * None for a torn or still-being-written entry. */
  private def readEntry(cfs: FileSystem, e: Path): Option[String] = {
    val in = cfs.open(e)
    val raw = try new String(in.readAllBytes(), StandardCharsets.UTF_8)
      finally in.close()
    if (raw.endsWith(Footer)) Some(raw.dropRight(Footer.length)) else None
  }

  /** Copy every COMPLETE coordination entry whose data-side commit
    * file is missing into the log (idempotent), and optionally prune
    * old satisfied entries. Runs on the conflict path and from the
    * read-side fixup — never on the healthy commit path. */
  private def recoverAndPrune(dataFs: FileSystem, cfs: FileSystem,
                              dir: Path, logDir: Path, prune: Boolean): Unit = {
    if (!cfs.exists(dir)) return
    val entries = cfs.listStatus(dir).toSeq.filter(_.isFile)
      .map(_.getPath).filter(_.getName.endsWith(".json"))
      .sortBy(_.getName)
    entries.foreach { e =>
      val dataSide = new Path(logDir, e.getName)
      if (!dataFs.exists(dataSide))
        readEntry(cfs, e).foreach(c => writeFile(dataFs, dataSide, c, overwrite = true))
    }
    if (prune && entries.size > retainEntries)
      entries.dropRight(retainEntries).foreach { e =>
        if (dataFs.exists(new Path(logDir, e.getName))) cfs.delete(e, false)
      }
  }

  override def putIfAbsent(fs: FileSystem, path: Path, content: String): Unit = {
    val logDir = path.getParent
    // the CommitStore contract: an existing commit MUST be refused —
    // including versions whose entry was pruned long ago and
    // pre-adoption history that never had entries. Never overwrite.
    if (fs.exists(path))
      throw new FileAlreadyExistsException(s"commit $path already exists")
    val dir = tableDir(logDir)
    val cfs = dir.getFileSystem(fs.getConf)
    cfs.mkdirs(dir)
    val entry = new Path(dir, path.getName)
    try {
      // the arbitration point — create-exclusive on the COORDINATION
      // store; the footer marks the content complete
      writeFile(cfs, entry, content + Footer, overwrite = false)
    } catch {
      case e: Exception =>
        // lost the race — land the winner's content on the data side
        // so the caller's retry loop sees it in the log immediately
        // (this is also how a crashed winner's commit surfaces). A
        // footer-less entry is polled briefly: a live winner closes
        // its KB-scale write in milliseconds.
        if (cfs.exists(entry) && !fs.exists(path)) {
          var waited = 0L
          var won = readEntry(cfs, entry)
          while (won.isEmpty && waited < tornPollMaxMs) {
            Thread.sleep(TornPollMs)
            waited += TornPollMs
            won = readEntry(cfs, entry)
          }
          won match {
            case Some(c) => writeFile(fs, path, c, overwrite = true)
            case None => throw new IllegalStateException(
              s"coordination entry $entry is torn (claimed, never completed); " +
                "its writer likely died mid-entry — delete the entry to release " +
                s"the version", e)
          }
        }
        recoverAndPrune(fs, cfs, dir, logDir, prune = false)
        throw e
    }
    // arbitration won: the data-side write may overwrite (a stale
    // recovery copy of OUR OWN entry at worst — identical bytes)
    writeFile(fs, path, content, overwrite = true)
    // amortized hygiene: prune satisfied entries every few versions
    val version = path.getName.stripSuffix(".json").toLong
    if (version % PruneEvery == 0)
      recoverAndPrune(fs, cfs, dir, logDir, prune = true)
  }

  /** Read-side fixup: back-fill any won-but-uncopied commits of
    * `tablePath` from the coordination root into its `_delta_log`. */
  private[sources] def recover(fs: FileSystem, tablePath: String): Unit = {
    val logDir = new Path(tablePath, "_delta_log")
    val dir = tableDir(logDir)
    recoverAndPrune(fs, dir.getFileSystem(fs.getConf), dir, logDir, prune = false)
  }
}

object CoordinatedCommitStore {
  /** Completeness footer terminating every coordination entry. */
  private[sources] val Footer = "\n#graft-commit-complete\n"

  /** Read-side fixup: back-fill any won-but-uncopied commits of
    * `tablePath` from the coordination root into its `_delta_log`.
    * Call before reading a multi-writer table on a non-atomic
    * store. */
  def recoverLog(spark: org.apache.spark.sql.SparkSession, tablePath: String,
                 coordDir: String): Unit = {
    val fs = new Path(tablePath).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    new CoordinatedCommitStore(coordDir).recover(fs, tablePath)
  }
}

/** Deterministic lost-race harness: injects `competitor` exactly once,
  * immediately before this writer's FIRST commit attempt, then
  * delegates to create-exclusive arbitration — the writer reliably
  * loses its first version race and exercises the logical conflict
  * path ([[DeltaSource.CommitIntent]] rebase-or-abort) with a
  * reproducible interleaving. This is how the conflict semantics are
  * graded END TO END (the `pipe_delta_conflict` oracle query and
  * ConflictSpec): a thread-scheduler race would flake; a forced one
  * replays bit-identically on every engine and every run. */
class ForcedRaceStore(competitor: () => Unit) extends CommitStore {
  @volatile private var fired = false
  override def putIfAbsent(fs: FileSystem, path: Path, content: String): Unit = {
    if (!fired) { fired = true; competitor() }
    CreateExclusiveCommitStore.putIfAbsent(fs, path, content)
  }
}
