package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming mirrors of the batch event operators
  * (`graft.operators.Events`): the same logical transforms over
  * `readStream`, plus a stateful sessionizer that the batch
  * window-function formulation cannot express incrementally.
  */
object StreamingEvents {

  val EventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** File-source stream over a directory of event parquet. */
  def eventsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(EventSchema).parquet(dir)

  /** Streaming mirror of Events.tumblingAgg: watermarked hourly
    * windows. Late data beyond 2h is dropped; state is bounded by
    * the watermark — the property that keeps this runnable forever
    * on an unbounded stream. */
  def tumblingAgg(stream: DataFrame, watermarkDelay: String = "2 hours"): DataFrame =
    stream
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Streaming mirror of Events.hoppingAgg: watermarked sliding
    * windows (each event in size/slide windows, exploded map-side;
    * state bounded by the watermark). */
  def hoppingAgg(stream: DataFrame, sizeMinutes: Int = 10,
                 slideMinutes: Int = 5): DataFrame =
    stream
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), s"$sizeMinutes minutes", s"$slideMinutes minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Exact distinct-user counts per event type on a stream: streaming
    * DEDUP state (dropDuplicates over the key pair) feeding a
    * complete-mode count — the composition that stands in for the
    * unsupported streaming `count(DISTINCT)`. The count of distinct
    * pairs is arrival-order-independent, which is what makes the
    * final answer batch-equal under any micro-batching. State is
    * O(distinct pairs); a production deployment bounds it with
    * dropDuplicatesWithinWatermark when the key space grows with
    * time. */
  def distinctUsers(stream: DataFrame): DataFrame =
    stream.dropDuplicates("event_type", "user_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"))

  /** Streaming mirror of Events.sessionizeNative: gap sessions via
    * the native `session_window` aggregation under a watermark. Open
    * sessions live in the state store and MERGE when a late-but-
    * in-watermark event bridges two of them; a session emits (append
    * mode) once the watermark passes its close — so state is O(open
    * sessions), bounded, at any stream rate, and emitted rows are
    * final (no retraction downstream). The batch operator certifies
    * the same aggregation offline. */
  def sessionWindowStream(stream: DataFrame, gapMinutes: Int = 30,
                          watermarkDelay: String = "2 hours"): DataFrame =
    stream
      .withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), s"$gapMinutes minutes").as("w"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("session_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("session_value"))

  /** Streaming mirror of Events.slidingDistinct's PRODUCT half: the
    * HLL++ distinct-user estimate per sliding window. Exact
    * countDistinct is unsupported in streaming aggregation (it would
    * need unbounded per-window user sets); the sketch is the part
    * that streams — O(registers) state per window, bounded by the
    * watermark — which is exactly why the batch query carries the
    * estimate-vs-exact contract: it certifies offline what the live
    * dashboard serves. */
  def slidingDistinctStream(stream: DataFrame, sizeMinutes: Int = 60,
                            slideMinutes: Int = 15): DataFrame =
    stream
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), s"$sizeMinutes minutes", s"$slideMinutes minutes").as("w"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
      .select(col("w.start").as("window_start"), col("approx_users"))

  /** Stream-stream interval join: purchases matched to the same
    * user's clicks in the preceding hour. Both sides watermarked so
    * the join state is bounded — Spark drops buffered rows once the
    * event-time bound passes. */
  def purchaseAttribution(events: DataFrame): DataFrame = {
    val clicks = events.where(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
      .withWatermark("click_ts", "2 hours")
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", "2 hours")
    purchases.join(clicks,
      col("p_user") === col("user_id") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
  }

  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long, value: Double)
  case class OpenSession(seq: Long, startUs: Long, lastUs: Long, n: Long, sum: Double)
  case class SessionOut(user_id: Long, session_seq: Long, n_events: Long,
                        session_start: java.sql.Timestamp, session_end: java.sql.Timestamp,
                        session_value: Double)

  /** Stateful gap sessionization: per user, events more than `gap`
    * apart open a new session. Emits *completed* sessions (append
    * mode); the open session rides in `GroupState` across batches.
    * State per key is one small case class — bounded regardless of
    * stream length.
    *
    * Cross-batch late data: an event within the open session's reach
    * ([start − gap, last + gap]) merges with min/max bounds, so a
    * late arrival can never produce end < start; an event older than
    * the open session's reach is DROPPED (the watermark discipline —
    * its true session may already have been emitted downstream). */
  /** Full-precision epoch micros: Timestamp.getTime is millis only
    * (sub-ms lives in getNanos), so derive micros from both — the
    * truncated form can disagree with batch unix_micros on gap
    * boundaries. */
  private def tsMicros(ts: java.sql.Timestamp): Long =
    math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  private def microsTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(math.floorDiv(us, 1000L))
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  case class TypedEv(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                     event_type: String)
  case class FunnelState(viewUs: Long, clickUs: Long, purchaseUs: Long)
  case class FunnelOut(user_id: Long, view_ts: java.sql.Timestamp,
                       click_ts: java.sql.Timestamp, purchase_ts: java.sql.Timestamp)

  /** Stateful conversion funnel (streaming form of `Events.funnel`):
    * per user, the first view, then the first click within
    * `windowHours` of it, then the first purchase within
    * `windowHours` of that click. State per key is three epoch-micro
    * longs — bounded forever. Emits one row per user on conversion
    * (append mode).
    *
    * Ordering discipline: each batch is processed in (event-time,
    * event_id) order; a view arriving AFTER a later stage has
    * already locked in (cross-batch late data) cannot retroactively
    * shift the funnel — the stage chain only advances, mirroring the
    * sessionizer's drop-too-late watermark stance. On in-order (or
    * single-batch) input this equals the batch operator exactly. */
  def funnelStateful(events: Dataset[TypedEv],
                     windowHours: Int = 24): Dataset[FunnelOut] = {
    val winUs = windowHours * 3600L * 1000000L
    import events.sparkSession.implicits._
    val unset = Long.MaxValue
    events.groupByKey(_.user_id).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (userId: Long, batch: Iterator[TypedEv], state: GroupState[FunnelState]) =>
        val sorted = batch.toSeq.sortBy(e => (tsMicros(e.ts), e.event_id))
        var s = state.getOption.getOrElse(FunnelState(unset, unset, unset))
        val done = Seq.newBuilder[FunnelOut]
        sorted.foreach { e =>
          val us = tsMicros(e.ts)
          e.event_type match {
            case "view" if s.clickUs == unset =>
              s = s.copy(viewUs = math.min(s.viewUs, us))
            case "click" if s.viewUs != unset && s.clickUs == unset &&
                us > s.viewUs && us <= s.viewUs + winUs =>
              s = s.copy(clickUs = us)
            case "purchase" if s.clickUs != unset && s.purchaseUs == unset &&
                us > s.clickUs && us <= s.clickUs + winUs =>
              s = s.copy(purchaseUs = us)
              done += FunnelOut(userId, microsTs(s.viewUs),
                microsTs(s.clickUs), microsTs(s.purchaseUs))
            case _ => ()
          }
        }
        state.update(s)
        done.result().iterator
    }
  }

  case class ClickState(tsUs: Long, eventId: Long)
  case class AttributionOut(user_id: Long, event_id: Long, ts_us: Long,
                            attributed_click_id: Option[Long], delay_us: Option[Long])

  /** Stateful streaming mirror of `Events.lastTouchAttribution`:
    * the most recent click rides in GroupState (two longs per user —
    * bounded forever), and each purchase emits its credit
    * immediately. On in-order input the emissions equal the batch
    * window-carry operator row for row. */
  def attributionStateful(events: Dataset[TypedEv],
                          windowHours: Int = 24): Dataset[AttributionOut] = {
    val horizon = windowHours * 3600L * 1000000L
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (userId: Long, batch: Iterator[TypedEv], state: GroupState[ClickState]) =>
        val sorted = batch.toSeq.sortBy(e => (tsMicros(e.ts), e.event_id))
        var last = state.getOption
        val out = Seq.newBuilder[AttributionOut]
        sorted.foreach { e =>
          val us = tsMicros(e.ts)
          e.event_type match {
            case "click" => last = Some(ClickState(us, e.event_id))
            case "purchase" =>
              val hit = last.filter(c => us - c.tsUs <= horizon)
              out += AttributionOut(userId, e.event_id, us,
                hit.map(_.eventId), hit.map(c => us - c.tsUs))
            case _ => ()
          }
        }
        last.foreach(state.update)
        out.result().iterator
    }
  }

  case class FrameState(vals: List[Long]) // 10⁴-scaled, newest last, ≤ frame−1
  case class MovAvgOut(user_id: Long, event_id: Long, ts: java.sql.Timestamp,
                       value: Double, mov_avg: Double, n_in_frame: Long)

  /** Stateful streaming mirror of `Analytics.movingAvgOf`: the
    * ROWS-frame moving average carried across micro-batches. State
    * per user is the last frame−1 values as 10⁴-SCALED LONGS — the
    * exact decimal(18,4) representation the batch operator sums, so
    * on in-order input the stream emits bit-identical averages
    * (the spec asserts exactly that). Rounding goes through
    * BigDecimal.valueOf (shortest-repr), matching Spark's Round. */
  def movingAvgStateful(events: Dataset[Ev], frame: Int = 5): Dataset[MovAvgOut] = {
    import events.sparkSession.implicits._
    def r4(d: Double): Double =
      java.math.BigDecimal.valueOf(d)
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    events.groupByKey(_.user_id).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (userId: Long, batch: Iterator[Ev], state: GroupState[FrameState]) =>
        val sorted = batch.toSeq.sortBy(e => (tsMicros(e.ts), e.event_id))
        var vals = state.getOption.map(_.vals).getOrElse(Nil)
        val out = sorted.map { e =>
          val scaled = java.math.BigDecimal.valueOf(e.value)
            .setScale(4, java.math.RoundingMode.HALF_UP)
            .unscaledValue().longValueExact()
          val window = (vals :+ scaled).takeRight(frame)
          val sumD = new java.math.BigDecimal(
            java.math.BigInteger.valueOf(window.sum), 4).doubleValue()
          val o = MovAvgOut(userId, e.event_id, e.ts,
            r4(e.value), r4(sumD / window.size), window.size.toLong)
          vals = window.takeRight(frame - 1)
          o
        }
        state.update(FrameState(vals))
        out.iterator
    }
  }

  def sessionizeStateful(events: Dataset[Ev], gapMinutes: Int = 30): Dataset[SessionOut] = {
    val gapUs = gapMinutes * 60L * 1000000L
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (userId: Long, batch: Iterator[Ev], state: GroupState[OpenSession]) =>
        val sorted = batch.toSeq.sortBy(e => (tsMicros(e.ts), e.event_id))
        var open = state.getOption
        val done = Seq.newBuilder[SessionOut]
        sorted.foreach { e =>
          val us = tsMicros(e.ts)
          open match {
            case Some(s) if us < s.startUs - gapUs =>
              () // too late: older than the open session's reach
            case Some(s) if us - s.lastUs <= gapUs =>
              open = Some(s.copy(startUs = math.min(s.startUs, us),
                lastUs = math.max(s.lastUs, us), n = s.n + 1, sum = s.sum + e.value))
            case Some(s) =>
              done += SessionOut(userId, s.seq, s.n,
                microsTs(s.startUs), microsTs(s.lastUs), s.sum)
              open = Some(OpenSession(s.seq + 1, us, us, 1L, e.value))
            case None =>
              open = Some(OpenSession(1L, us, us, 1L, e.value))
          }
        }
        open.foreach(state.update)
        done.result().iterator
    }
  }

  /** Streaming count-min sketch cells — the online form of
    * `Sketches.cmsHeavyHitters`'s build stage: the running
    * (row, bucket) counts as a plain streaming aggregation. State is
    * the depth×width cell grid (256 longs) FOREVER, regardless of
    * stream length or key cardinality — the sketch IS the bounded
    * state, which is why it needs no watermark. Cells equal the
    * batch build on the same prefix (spec-pinned), and carry the
    * same `c` count column, so the streaming state feeds
    * `Sketches.cmsEstimate` point queries unchanged. */
  def cmsCellsStream(stream: DataFrame, keyCol: String = "user_id",
                     depth: Int = 4, width: Int = 64): DataFrame =
    stream.select(col(keyCol).as("k"))
      .select(col("k"), explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .select(col("r"), pmod(graft.functions.HashFunctions.md5Long(col("r"), col("k")),
        lit(width)).as("bucket"))
      .groupBy(col("r"), col("bucket")).agg(count(lit(1)).as("c"))

  /** Streaming first-seen users per day — the online form of
    * `Events.cumulativeDistinctUsers`'s daily-news stage:
    * dropDuplicates on user keeps each user's FIRST event (arrival
    * order), then a day-keyed count. Equal to the batch operator
    * whenever per-user arrival respects event time (the exactness
    * contract of every first-seen rewrite; out-of-order first events
    * would need `dropDuplicatesWithinWatermark` + reconciliation).
    * State is one row per user — the same O(distinct users) any
    * exact distinct count pays. */
  def newUsersByDayStream(stream: DataFrame): DataFrame =
    stream
      .select(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .dropDuplicates("user_id")
      .groupBy(col("day")).count()
}
