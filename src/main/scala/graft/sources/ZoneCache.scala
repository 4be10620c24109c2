package graft.sources

import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Build-once cache for derived on-disk zones (Delta tables, index
  * layouts) keyed by a fingerprint of the SOURCE corpus.
  *
  * Bench hygiene: a query that rebuilds its zone every invocation
  * times the WRITE path when the thing under test is the read path.
  * `ensure` materializes the zone once per corpus generation — a
  * marker file next to the zone records the corpus fingerprint, and a
  * regenerated corpus (new files/mtimes at the same path) wipes and
  * rebuilds, so a stale zone is never served (same contract as
  * `AnnIndex.ensureBuilt`).
  *
  * Crash safety: the marker is written AFTER the build, so a run
  * killed mid-build leaves no marker and the next call rebuilds from
  * scratch (builds are full overwrites — idempotent).
  */
object ZoneCache {

  /** Bumped whenever the engine's on-disk zone format changes (e.g.
    * the deletion-vector sidecar serialization moving to the spec's
    * roaring `.bin` form) — a zone built by an older engine build
    * must rebuild, not be misread. */
  private val FormatEpoch = "2"

  /** Metadata-only fingerprint of the corpus behind `src`: md5 over
    * the sorted (path, len, mtime) listing of its input files plus
    * the engine format epoch. No data is read; any file added/
    * removed/rewritten (or a format change) flips the value. */
  def corpusFingerprint(src: DataFrame): String = {
    val conf = src.sparkSession.sparkContext.hadoopConfiguration
    val listing = (s"format-epoch $FormatEpoch" +: src.inputFiles.sorted.map { f =>
      val p = new Path(f)
      val st = p.getFileSystem(conf).getFileStatus(p)
      s"$f ${st.getLen} ${st.getModificationTime}"
    }).mkString("\n")
    java.security.MessageDigest.getInstance("MD5")
      .digest(listing.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }

  /** Run `build` only if `zoneRoot` is absent or was built from a
    * different corpus generation than `src`. Returns true when a
    * build ran (visible for tests/bench accounting). */
  def ensure(src: DataFrame, zoneRoot: String)(build: => Unit): Boolean = {
    val fp = corpusFingerprint(src)
    val root = new Path(zoneRoot)
    val fs = root.getFileSystem(src.sparkSession.sparkContext.hadoopConfiguration)
    val marker = new Path(root, "_graft_corpus_fp")
    val fresh = fs.exists(marker) && {
      val in = fs.open(marker)
      try new String(in.readAllBytes(), StandardCharsets.UTF_8).trim == fp
      finally in.close()
    }
    if (fresh) false
    else {
      if (fs.exists(root)) fs.delete(root, true)
      build
      val out = fs.create(marker, /* overwrite = */ true)
      try out.write(fp.getBytes(StandardCharsets.UTF_8)) finally out.close()
      true
    }
  }
}
