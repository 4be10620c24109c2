package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** The graft Delta change feed as a REAL Structured Streaming source:
  *
  * {{{
  *   spark.readStream.format("graft-delta").load(tablePath)
  *     .writeStream.trigger(Trigger.AvailableNow()).foreachBatch(...)
  * }}}
  *
  * Offsets are Delta commit versions (`LongOffset(v)` = "everything
  * up to and including commit v has been planned"), so the engine's
  * own offset log provides the checkpointed-cursor semantics the
  * driver-loop consumer (`DeltaSource.followChangesCheckpointed`)
  * implements by hand: a restarted query resumes at exactly the
  * first unplanned commit, replaying at most the one in-flight batch
  * (the standard at-least-once boundary, exactly-once end-to-end
  * with an idempotent sink such as `exactlyOnceBatchSink`).
  *
  * Batch (start, end] replays the `dataChange=true` adds of those
  * commits through ONE [[DeltaFileIndex]] scan relation (the v1
  * `Source` contract lets `getBatch` return a batch DataFrame, which
  * is exactly why the change feed fits it so naturally — no
  * row-reader reimplementation, full pushdown/pruning/DV machinery
  * reused). Commit semantics mirror `changesSince`: append commits
  * yield the snapshot diff; an overwrite yields its full new
  * snapshot; `dataChange=false` layout swaps (OPTIMIZE / ZORDER)
  * yield nothing; a deletion-vector delete commit yields the
  * SURVIVORS of its touched files (removed-only rows are not
  * replayed — Delta's own CDF materializes deletes separately for
  * the same reason).
  *
  * Options: `startingVersion` — first commit to include (default 0;
  * pass a higher version to begin mid-log, e.g. after an initial
  * batch backfill).
  *
  * Scale: getOffset is an O(log-listing) driver call; each batch
  * plans only the files its commits added — the same incremental
  * cost as the polling consumer, but scheduled, checkpointed, and
  * rate-controllable by the engine. */
class DeltaStreamSourceProvider extends StreamSourceProvider
  with org.apache.spark.sql.sources.StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "graft-delta"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-delta source requires a table path: .load(path) or .option(\"path\", ...)"))

  /** The matching SINK: `stream.writeStream.format("graft-delta")
    * .option("checkpointLocation", ...).start(tablePath)`. Append
    * mode appends each micro-batch as a Delta commit; Complete mode
    * overwrites the snapshot per batch. Exactly-once: every commit
    * carries a `txn` action keyed (txnAppId, batchId) — a replayed
    * batch (the foreachBatch at-least-once boundary after a crash)
    * is SKIPPED when the table already recorded its id, the same
    * guard as `exactlyOnceBatchSink`, now behind the engine's own
    * checkpoint/restart machinery. `txnAppId` defaults to a
    * path-derived id; set it explicitly when two independent queries
    * write the same table. */
  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    val tbl = pathOf(parameters)
    val appId = parameters.getOrElse("txnAppId",
      s"graft-delta-sink-${Integer.toHexString(tbl.hashCode)}")
    val complete = outputMode == org.apache.spark.sql.streaming.OutputMode.Complete()
    new DeltaStreamSink(tbl, appId, complete, partitionColumns)
  }

  private def cdfMode(parameters: Map[String, String]): Boolean =
    parameters.get("readChangeFeed").contains("true")

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    val spark = sqlContext.sparkSession
    val tbl = pathOf(parameters)
    val snap = DeltaSource.snapshot(spark, tbl, None)
    val base = schema.getOrElse(snap.schema)
    val out = if (!cdfMode(parameters)) base
      else StructType(base.fields.toSeq :+
        org.apache.spark.sql.types.StructField("_change_type",
          org.apache.spark.sql.types.StringType) :+
        org.apache.spark.sql.types.StructField("_commit_version",
          org.apache.spark.sql.types.LongType))
    (shortName(), out)
  }

  override def createSource(sqlContext: SQLContext,
                            metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source = {
    val spark = sqlContext.sparkSession
    val tbl = pathOf(parameters)
    val starting = parameters.get("startingVersion").map(_.toLong).getOrElse(0L)
    val maxCommits = parameters.get("maxCommitsPerBatch").map(_.toLong)
    val maxBytes = parameters.get("maxBytesPerBatch").map(_.toLong)
    new DeltaStreamSource(spark, tbl, starting, maxCommits, maxBytes,
      cdf = cdfMode(parameters))
  }
}

class DeltaStreamSource(spark: SparkSession, tablePath: String,
                        startingVersion: Long,
                        maxCommitsPerBatch: Option[Long] = None,
                        maxBytesPerBatch: Option[Long] = None,
                        cdf: Boolean = false) extends Source
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2, ReadLimit}

  private val snap0 = DeltaSource.snapshot(spark, tablePath, None)

  override val schema: StructType =
    if (!cdf) snap0.schema
    else StructType(snap0.schema.fields.toSeq :+
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType) :+
      org.apache.spark.sql.types.StructField("_commit_version",
        org.apache.spark.sql.types.LongType))


  /** Log end pinned at `prepareForTriggerAvailableNow` time: a
    * Trigger.AvailableNow run drains exactly the commits present when
    * it started — in bounded batches when `maxCommitsPerBatch` is set
    * — then terminates, ignoring commits that land mid-drain (the
    * AvailableNow contract). Without this trait the engine fell back
    * to ONE batch at the current getOffset, which under a commit cap
    * would silently strand everything past the first `n` commits. */
  @volatile private var availableNowTarget: Option[Option[Long]] = None

  private def ver(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong // SerializedOffset from the checkpoint log
  }

  private def verV2(o: OffsetV2): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong
  }

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(
      DeltaSource.latestVersion(spark, tablePath).filter(_ >= startingVersion))

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Admission-control offset resolution (the path the engine uses
    * for every trigger once this trait is present): end = min(log
    * end, AvailableNow pin, start + maxCommitsPerBatch). Returning
    * `start` unchanged signals "no new data" and, under AvailableNow,
    * terminates the drain. */
  /** Bytes a commit's dataChange adds reference (from the log's add
    * sizes). Drives the `maxBytesPerBatch` cap. Parsed DRIVER-side
    * (commit files are small) — a Spark job per pending commit per
    * trigger would swamp the scheduler on a deep backfill — and
    * MEMOIZED: commit files are immutable, and without the cache a
    * byte-capped drain re-reads every pending commit on every
    * trigger (O(n^2) log reads over a deep backlog). */
  private val commitBytesCache =
    new java.util.concurrent.ConcurrentHashMap[Long, java.lang.Long]()

  private def commitBytes(v: Long): Long =
    commitBytesCache.computeIfAbsent(v, _ => computeCommitBytes(v))

  private def computeCommitBytes(v: Long): Long = {
    val p = new Path(tablePath, f"_delta_log/$v%020d.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L
    else {
      val in = fs.open(p)
      val text = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      text.linesIterator.filter(_.nonEmpty).map { line =>
        val add = mapper.readTree(line).path("add")
        if (add.isObject && add.path("dataChange").asBoolean(false))
          add.path("size").asLong(0L)
        else 0L
      }.sum
    }
  }

  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val base = Option(start).map(verV2).getOrElse(startingVersion - 1)
    val latest = availableNowTarget match {
      case Some(pinned) => pinned // AvailableNow: the log end at prepare time
      case None => DeltaSource.latestVersion(spark, tablePath).filter(_ >= startingVersion)
    }
    val capped = latest.map { l =>
      maxCommitsPerBatch.fold(l)(n => math.min(l, base + n))
    }
    // byte cap on top of the commit cap: walk forward accumulating
    // add sizes; the FIRST commit is always admitted (progress even
    // when one commit alone exceeds the budget)
    val sized = (capped, maxBytesPerBatch) match {
      case (Some(top), Some(mb)) =>
        var h = base
        var acc = 0L
        var v = base + 1
        var full = false
        while (v <= top && !full) {
          val b = commitBytes(v)
          if (h == base || acc + b <= mb) { h = v; acc += b; v += 1 }
          else full = true
        }
        Some(h)
      case _ => capped
    }
    sized.filter(_ > base).map(LongOffset(_)).getOrElse(start)
  }

  override def reportLatestOffset(): OffsetV2 =
    DeltaSource.latestVersion(spark, tablePath).filter(_ >= startingVersion)
      .map(LongOffset(_)).orNull

  /** Legacy v1 offset resolution — UNCAPPED by design: the engine
    * resolves offsets through the admission-control `latestOffset`
    * above (where the caps are computed from the ENGINE's own start
    * offset); a cap here would have to be tracked source-side, and a
    * source-side cursor regresses below the checkpointed offset
    * after a clean restart, re-emitting committed commits. */
  override def getOffset: Option[Offset] =
    DeltaSource.latestVersion(spark, tablePath)
      .filter(_ >= startingVersion)
      .map(LongOffset(_))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val lo = start.map(ver).getOrElse(startingVersion - 1)
    val hi = ver(end)
    if (cdf) return getCdfBatch(lo, hi)
    val logDir = new Path(tablePath, "_delta_log")
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val commits = {
      // JSON commits in range; a checkpointed-away range can no
      // longer replay incrementally (same contract as changesSince)
      val names = if (fs.exists(logDir)) fs.listStatus(logDir).toSeq
        .filter(_.isFile).map(_.getPath.getName) else Nil
      names.collect { case s if s.endsWith(".json") && s.length == 25 =>
        s.stripSuffix(".json").toLong
      }.distinct.sorted.filter(v => v > lo && v <= hi)
    }
    // Normalize the range's adds against the END-of-range state:
    //  - dedupe by path, newest commit wins — a range spanning a
    //    file's original append AND a later re-add of the same path
    //    (a DV delete's re-point, a restore) must list the file
    //    ONCE, with the newest descriptor;
    //  - drop paths absent from snapshot(hi) whose removal CHANGED
    //    data — a DELETE that dropped the file outright must not
    //    leak its deleted rows into the sink, consistently with
    //    how a DV'd survivor file emits survivors only;
    //  - but a path a later dataChange=false layout swap (OPTIMIZE /
    //    Z-order) compacted away is NOT deleted data: its rows live
    //    on in the swap's target files, so the chase below follows
    //    the rewrite chain to the files live at hi — otherwise an
    //    append+optimize pair inside one batch silently loses the
    //    appended rows.
    // each commit JSON parses ONCE; adds and (if needed) rewrite
    // chains both derive from the same parsed rows
    val actionRows = DeltaSource.commitActionRows(spark, tablePath, commits)
    val rawAdds = DeltaSource.addsFrom(actionRows)
      .groupBy(_._2.path).valuesIterator.map(_.maxBy(_._1)).toSeq.sortBy(_._1)
    if (rawAdds.isEmpty)
      org.apache.spark.sql.graft.GraftSqlShims.emptyStreaming(spark, schema)
    else {
      val snap = DeltaSource.snapshot(spark, tablePath, Some(hi))
      val liveAtHi = snap.files.map(a => a.path -> a).toMap
      val live = rawAdds.flatMap { case (v, a) =>
        liveAtHi.get(a.path).map(l => (v, l))
      }
      val lost = rawAdds.filterNot { case (_, a) => liveAtHi.contains(a.path) }
      // Swap targets merge many source files, so a chased target can
      // also carry rows already emitted in an earlier batch —
      // at-least-once on compaction overlap, the same contract as
      // Delta's own ignoreChanges re-emission.
      val chased = if (lost.isEmpty) Nil else {
        val rewrites = DeltaSource.rewritesFrom(actionRows)
        val emitted = scala.collection.mutable.Set[String](live.map(_._2.path): _*)
        def chase(path: String, fromV: Long): Seq[DeltaSource.AddFile] =
          rewrites.find { case (v, rm, _) => v > fromV && rm.contains(path) } match {
            case Some((v, _, targets)) => targets.flatMap { t =>
              if (!emitted.add(t.path)) Nil
              else liveAtHi.get(t.path).map(Seq(_)).getOrElse(chase(t.path, v))
            }
            case None => Nil // removed with dataChange=true: a real delete
          }
        lost.flatMap { case (v, a) => chase(a.path, v).map((v, _)) }
      }
      val adds = live ++ chased
      if (adds.isEmpty)
        return org.apache.spark.sql.graft.GraftSqlShims.emptyStreaming(spark, schema)
      // the batch rides the normal scan relation (pushdown, pruning,
      // DV filtering all reused), re-rooted with the streaming flag
      // the v1 getBatch contract requires — on the DeltaFileIndex
      // leaf ONLY, so a DV sidecar lookup stays a stream-STATIC join
      org.apache.spark.sql.graft.GraftSqlShims.asStreaming(
        DeltaSource.scanRelation(spark, tablePath, snap.schema, snap.partitionColumns,
          adds.map { case (_, a) => (a, Map.empty[String, String]) })
          .select(schema.map(f => col(f.name)).toIndexedSeq: _*)) {
        case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          h.location.isInstanceOf[DeltaFileIndex]
        case _ => false
      }
    }
  }

  /** The commit range's CHANGE FEED as the micro-batch (`.option(
    * "readChangeFeed", "true")`): rows carry `_change_type` +
    * `_commit_version`. Materialized cdc files (CDF-enabled MERGE /
    * DELETE commits) read directly; other commits derive per the
    * spec rule (see [[DeltaSource.changesCdf]]). Streaming-flag
    * scope: the table's own scan leaves (DeltaFileIndex) and the
    * `_change_data` reads; DV sidecar lookups stay static. */
  private def getCdfBatch(lo: Long, hi: Long): DataFrame =
    DeltaSource.changesCdf(spark, tablePath, Some(lo), Some(hi))._2 match {
      case None =>
        org.apache.spark.sql.graft.GraftSqlShims.emptyStreaming(spark, schema)
      case Some(feed) =>
        org.apache.spark.sql.graft.GraftSqlShims.asStreaming(
          feed.select(schema.map(f => col(f.name)).toIndexedSeq: _*)) {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.isInstanceOf[DeltaFileIndex] ||
              h.location.rootPaths.forall(_.toString.contains("/_change_data/"))
          case _ => false
        }
    }

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def toString: String = s"DeltaStreamSource[$tablePath]"
}

class DeltaStreamSink(tablePath: String, appId: String, complete: Boolean,
                      partitionColumns: Seq[String])
  extends org.apache.spark.sql.execution.streaming.Sink {

  override def addBatch(batchId: Long, data: org.apache.spark.sql.DataFrame): Unit = {
    val spark = data.sparkSession
    // a replayed batch id is already in the table's txn state → skip
    val exists = DeltaSource.latestVersion(spark, tablePath).isDefined
    val done = if (exists) DeltaSource.lastTxnVersion(spark, tablePath, appId) else None
    if (!done.exists(_ >= batchId)) {
      val batch = org.apache.spark.sql.graft.GraftSqlShims.rebatch(data)
      DeltaSource.writeDelta(batch, tablePath, overwrite = complete,
        partitionBy = if (exists) Nil else partitionColumns,
        txn = Some(appId -> batchId))
    }
  }

  override def toString: String = s"DeltaStreamSink[$tablePath]"
}
