package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics in batch form. Each query here has a
  * Structured Streaming mirror in `graft.streaming` (same logical
  * transform over `readStream`); keeping the core logic in batch
  * makes it oracle-checkable while the streaming layer adds
  * watermarks/triggers.
  */
object Events {

  /** Tumbling-window aggregation: events per (hour, type) with value
    * sums. Streaming mirror: groupBy(window($"ts", "1 hour"), type). */
  def tumblingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .orderBy(col("window_start"), col("event_type"))

  /** Gap-based sessionization: a new session starts when a user is
    * idle longer than `gap`. Classic lag + cumulative-sum windows —
    * one shuffle on user_id, then linear scans per user partition.
    * Streaming mirror: flatMapGroupsWithState with event-time timeout.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapMicros = gapMinutes * 60L * 1000000L
    events
      .withColumn("_prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("_new_session",
        when(col("_prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("_prev_ts")) > gapMicros, 1L)
          .otherwise(0L))
      .withColumn("session_seq",
        sum(col("_new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("session_value"))
      .orderBy(col("user_id"), col("session_seq"))
  }

  /** Gap sessionization via Spark's native `session_window` — same
    * 30-minute-gap semantics as `sessionize`, expressed as a session
    * window aggregation (merging handled inside the aggregation
    * operator, works identically in batch and streaming). */
  def sessionizeNative(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    events
      .groupBy(session_window(col("ts"), s"$gapMinutes minutes").as("w"), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("session_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("session_value"))
      .orderBy(col("user_id"), col("session_start"))

  /** Per-user stats with JSON props extraction. `props` is parsed
    * ONCE with a schema'd `from_json` (Jackson parse per row, struct
    * out) rather than per-field `get_json_object` — with several
    * extracted fields the per-field form re-parses the blob N times;
    * the schema'd parse is one pass no matter how many fields ride
    * along, which is the shape that holds up when the props schema
    * grows. */
  def userStats(events: DataFrame): DataFrame =
    events
      .withColumn("k",
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")).getField("k"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("total_value"),
        sum(col("k")).as("sum_k"),
        min(col("ts")).as("first_seen"),
        max(col("ts")).as("last_seen"))
      .orderBy(col("user_id"))

  /** Ordered conversion funnel with per-stage windows: first view →
    * first click within `windowHours` → first purchase within
    * `windowHours` of that click. Each stage is one filtered
    * aggregate joined to the previous stage's (small) user table —
    * the stage tables shrink monotonically, so at scale each join
    * broadcasts the converted-user side against the event stream.
    * Stage subtrees repeat in the plan (v inside c inside p AND in
    * the final join); Spark's ReuseExchange dedups the identical
    * aggregates, but at 100 TB persist/checkpoint each stage table
    * explicitly rather than rely on it. */
  def funnel(events: DataFrame, windowHours: Int = 24): DataFrame = {
    val win = expr(s"INTERVAL $windowHours HOURS")
    val v = events.where(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("vt"))
    val c = events.where(col("event_type") === "click").as("e")
      .join(broadcast(v), col("e.user_id") === v("user_id") &&
        col("e.ts") > col("vt") && col("e.ts") <= col("vt") + win)
      .groupBy(col("e.user_id").as("c_user")).agg(min(col("e.ts")).as("ct"))
    val p = events.where(col("event_type") === "purchase").as("e2")
      .join(broadcast(c), col("e2.user_id") === col("c_user") &&
        col("e2.ts") > col("ct") && col("e2.ts") <= col("ct") + win)
      .groupBy(col("e2.user_id").as("p_user")).agg(min(col("e2.ts")).as("pt"))
    // one user-stage table, counts in ONE aggregate — the crossJoin-
    // of-three-counts form re-evaluated every unpersisted stage
    // (v three times, c twice ≈ six event scans)
    v.join(c, col("user_id") === col("c_user"), "left")
      .join(p, col("user_id") === col("p_user"), "left")
      .agg(count(lit(1)).as("n_view"),
        count(col("ct")).as("n_view_click"),
        count(col("pt")).as("n_full_funnel"))
  }

  /** Cohort retention: users grouped by first-seen date; one row per
    * (cohort, day offset ≤ maxDays) with the distinct active users.
    * Two aggregation passes — the cohort table is one row per user
    * and joins back hash-partitioned on user_id. */
  def retention(events: DataFrame, maxDays: Int = 7): DataFrame = {
    val f = events.groupBy(col("user_id"))
      .agg(to_date(min(col("ts"))).as("cohort"))
    events.join(f, "user_id")
      .select(col("user_id"), col("cohort"),
        datediff(to_date(col("ts")), col("cohort")).cast("long").as("day_off"))
      .where(col("day_off") <= maxDays)
      .distinct()
      .groupBy(col("cohort"), col("day_off"))
      .agg(count(lit(1)).as("n_users"))
      .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort"),
        col("day_off"), col("n_users"))
      .orderBy(col("cohort"), col("day_off"))
  }

  /** Event-type transition matrix (first-order Markov chain over each
    * user's ordered stream): lag window per user, then one aggregation
    * over (prev, next) pairs. The probability is an exact integer
    * quotient (count/total as doubles), so it is bit-stable on any
    * partitioning and in the oracle. One shuffle on user_id for the
    * lag, one tiny shuffle on the pair keys. */
  def transitions(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = events
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .where(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val totalW = Window.partitionBy(col("prev_type"))
    pairs
      .withColumn("p", col("n").cast("double") / sum(col("n")).over(totalW))
      .orderBy(col("prev_type"), col("event_type"))
  }

  /** One power-iteration step toward the Markov chain's stationary
    * distribution: π₁ = π₀·P from uniform π₀ over the event-type
    * transition matrix — where user journeys concentrate in the
    * long run. The matrix is O(types²) rows (tiny at any corpus
    * size once `transitions` has aggregated); probabilities are
    * rounded 6dp and the mass sums fold through DECIMAL, so the
    * step is exact cross-engine. */
  def stationaryStep(events: DataFrame): DataFrame = {
    val t = transitions(events)
      .select(col("prev_type"), col("event_type"), round(col("p"), 6).as("p"))
    val nStates = t.select(col("prev_type")).distinct()
      .agg(count(lit(1)).as("k"))
    t.crossJoin(broadcast(nStates))
      .groupBy(col("event_type"))
      .agg(sum(round(col("p") / col("k"), 6).cast("decimal(18,6)"))
        .cast("double").as("pi1"))
      .orderBy(col("event_type"))
  }

  /** Hopping (sliding) window aggregation via Spark's native
    * `window(ts, size, slide)`: each event lands in size/slide
    * windows (2 here), exploded map-side — the streaming-native
    * sliding counterpart of `tumblingAgg`, identical in readStream
    * form. Shuffle carries (window, type) partials only. */
  def hoppingAgg(events: DataFrame, sizeMinutes: Int = 10,
                 slideMinutes: Int = 5): DataFrame =
    events
      .groupBy(window(col("ts"), s"$sizeMinutes minutes", s"$slideMinutes minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy(col("window_start"), col("event_type"))

  /** Distinct users per sliding (hopping) window, with the
    * approximate-distinct contract: exact per-window uniques beside
    * an HLL++ estimate asserted within 5% + 3 absolute (the
    * `q_approx_distinct` pattern applied to windowed traffic — the
    * shape a live concurrent-users dashboard runs, where exact
    * countDistinct is the scale bottleneck and the sketch is the
    * product). The absolute slack matters: Spark's HLL++ has no
    * sparse mode, so windows holding a handful of users see ±1-2
    * even at rsd=0.02, where a relative-only bound is vacuous.
    * Exact and sketch ride the same single shuffle. */
  /** Distinct users per sliding window. The naive shape replicates
    * every EVENT into its size/slide containing windows before the
    * distinct agg; here the corpus first dedupes to (slide-slice,
    * user) pairs — one shuffle of the RAW rows at slide granularity,
    * map-side combinable — and only those already-deduped pairs
    * replicate into the k overlapping windows. Same result (a user
    * spanning two slices of one window dedupes again in the final
    * per-window distinct; HLL estimates are duplicate-insensitive),
    * but the expensive exchange carries |distinct slice-user| rows
    * instead of k×|events|. Window starts follow Spark's epoch-
    * aligned window() semantics: start = floor(ts/slide)·slide −
    * j·slide for j < k. */
  def slidingDistinct(events: DataFrame, sizeMinutes: Int = 60,
                      slideMinutes: Int = 15): DataFrame = {
    require(sizeMinutes % slideMinutes == 0,
      s"size ($sizeMinutes) must be a multiple of slide ($slideMinutes)")
    val k = sizeMinutes / slideMinutes
    val slideSec = slideMinutes * 60L
    val slice = (floor(unix_timestamp(col("ts")) / slideSec) * slideSec)
      .cast("long").as("slice")
    val su = events.select(slice, col("user_id")).distinct()
    // dedup (ws, user) BEFORE the sketch aggregation (round 14):
    // countDistinct mixed with approx_count_distinct makes Spark
    // two-phase the distinct through a per-(ws, user) partial agg
    // that carries a 4 KB HLL buffer PER GROUP — ~k·|su| sketches of
    // overhead. Deduped first, count(1) IS the exact distinct and
    // the per-ws sketch ingests each user once — identical numbers
    // (HLL insertion is idempotent on duplicates), one sketch per
    // window instead of one per (window, user).
    su
      .select(explode(sequence(lit(0L), lit(k - 1L))).as("j"),
        col("slice"), col("user_id"))
      .select((col("slice") - col("j") * slideSec).as("ws"), col("user_id"))
      .distinct()
      .groupBy(col("ws"))
      .agg(count(lit(1)).as("exact_users"),
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
      .select(date_format(timestamp_seconds(col("ws")), "yyyy-MM-dd HH:mm:ss")
          .as("window_start"),
        col("exact_users"),
        (abs(col("approx_users") - col("exact_users")) <=
          col("exact_users") * 0.05 + 3).cast("long").as("approx_ok"))
      .orderBy(col("window_start"))
  }

  /** Top event-type trigrams across user streams (path mining): two
    * lag windows per user, then one count aggregation over the path
    * keys — the n-gram analysis of behavioral sequences. One shuffle
    * on user_id (both lags share the window), one tiny shuffle on
    * the trigram keys. */
  def pathTrigrams(events: DataFrame, k: Int = 20): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("t1", lag(col("event_type"), 2).over(byUser))
      .withColumn("t2", lag(col("event_type"), 1).over(byUser))
      .where(col("t1").isNotNull)
      .groupBy(col("t1"), col("t2"), col("event_type").as("t3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("t1"), col("t2"), col("t3"))
      .limit(k)
  }

  /** Per-type (mean, std) from one partial-aggregating pass with
    * DECIMAL sums — exact on any partitioning. Reused as the static
    * side of the streaming anomaly scorer. */
  def typeStats(events: DataFrame): DataFrame = {
    val d = col("value").cast("decimal(18,4)")
    events.groupBy(col("event_type"))
      .agg(sum(d).cast("double").as("sumv"),
        sum(d * d).cast("double").as("sumsq"),
        count(lit(1)).as("n"))
      .select(col("event_type"), (col("sumv") / col("n")).as("mean"),
        sqrt(col("sumsq") / col("n") -
          (col("sumv") / col("n")) * (col("sumv") / col("n"))).as("std"))
  }

  /** Last-touch attribution: each purchase credits the user's most
    * recent click at or before it, if within `windowHours`. One
    * user-hash shuffle; the candidate click rides along as a
    * last-non-null window carry (IGNORE NULLS running last_value) —
    * no self-join of the event stream against itself. Timestamps
    * stay exact integer microseconds. */
  def lastTouchAttribution(events: DataFrame, windowHours: Int = 24): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val horizon = windowHours * 3600L * 1000000L
    events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("last_click_us",
        last(when(col("event_type") === "click", col("ts_us")), ignoreNulls = true)
          .over(w))
      .withColumn("last_click_id",
        last(when(col("event_type") === "click", col("event_id")), ignoreNulls = true)
          .over(w))
      .where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts_us"),
        when(col("ts_us") - col("last_click_us") <= horizon, col("last_click_id"))
          .as("attributed_click_id"),
        when(col("ts_us") - col("last_click_us") <= horizon,
          col("ts_us") - col("last_click_us")).as("delay_us"))
      .orderBy(col("event_id"))
  }

  /** Peak concurrent sessions per day — interval algebra over the
    * session table: each session contributes +1/−1 boundary deltas,
    * the running sum inside a day is the live-session count, and
    * the peak is its max. Boundaries order (ts, +1-before-−1, user,
    * seq) so touching sessions count as concurrent and ties are
    * deterministic. O(sessions) rows ever enter the windows;
    * per-day partitions keep the running sum parallel (sessions
    * assumed intraday — the 30-minute gap rule makes midnight
    * spanning rare; a spanning session counts in its start day). */
  def peakConcurrency(events: DataFrame): DataFrame = {
    val sess = sessionize(events)
      .select(col("user_id"), col("session_seq"),
        unix_micros(col("session_start")).as("s_us"),
        unix_micros(col("session_end")).as("e_us"),
        to_date(col("session_start")).cast("string").as("day"))
    val bounds = sess.select(col("day"), col("s_us").as("ts_us"),
        lit(1).as("delta"), col("user_id"), col("session_seq"))
      .unionByName(sess.select(col("day"), col("e_us").as("ts_us"),
        lit(-1).as("delta"), col("user_id"), col("session_seq")))
    val w = Window.partitionBy(col("day"))
      .orderBy(col("ts_us"), col("delta").desc, col("user_id"), col("session_seq"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val peak = bounds.withColumn("live", sum(col("delta")).over(w).cast("long"))
      .groupBy(col("day")).agg(max(col("live")).as("peak"))
    val ns = sess.groupBy(col("day")).agg(count(lit(1)).as("n_sessions"))
    peak.join(ns, "day")
      .select(col("day"), col("n_sessions"), col("peak"))
      .orderBy(col("day"))
  }

  /** Cart abandonment: clicks with no purchase by the same user
    * within `windowHours` after. The candidate purchase rides
    * BACKWARD as an IGNORE-NULLS carry over descending time (the
    * next purchase at or after each event) — same no-self-join
    * discipline as attribution, one user-hash shuffle. Reported per
    * day with the abandonment rate as a raw quotient. */
  def cartAbandonment(events: DataFrame, windowHours: Int = 24): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val horizon = windowHours * 3600L * 1000000L
    events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"),
        to_date(col("ts")).cast("string").as("day"))
      .withColumn("next_purchase_us",
        last(when(col("event_type") === "purchase", col("ts_us")), ignoreNulls = true)
          .over(w))
      .where(col("event_type") === "click")
      .withColumn("abandoned",
        when(col("next_purchase_us").isNull ||
          col("next_purchase_us") - col("ts_us") > horizon, 1L).otherwise(0L))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_clicks"), sum(col("abandoned")).as("n_abandoned"),
        (sum(col("abandoned")).cast("double") / count(lit(1))).as("abandon_rate"))
      .orderBy(col("day"))
  }

  /** Per-user inactivity gaps: the max and mean time between
    * consecutive events (the churn-risk / session-break signal).
    * One user-hash shuffle for the lag window; gaps stay exact
    * integer MICROSECONDS end to end (the mean is a raw quotient of
    * an exact sum — no float timestamps anywhere). */
  def inactivityGaps(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"),
        (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))).as("gap_us"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        count(col("gap_us")).as("n_gaps"),
        max(col("gap_us")).as("max_gap_us"),
        (sum(col("gap_us")).cast("double") / count(col("gap_us"))).as("avg_gap_us"))
      .where(col("n_gaps") > 0)
      .orderBy(col("user_id"))
  }

  /** RFM segmentation (recency / frequency / monetary): per-user
    * rollup in one partial-agg shuffle, quartile BOUNDARIES from
    * exact interpolated percentiles over the O(users) rollup (the
    * small derivative table — swap approx_percentile at extreme
    * scale), then map-only banding by boundary compare:
    * band = 1 + (x > q1) + (x > q2) + (x > q3). No global sort and
    * no ntile window — banding a user never shuffles the users.
    * r_score inverts the recency band so 4 = most recent on every
    * axis; rfm_code = r·100 + f·10 + m. */
  def rfmScores(events: DataFrame): DataFrame = {
    val maxTs = events.agg(max(col("ts")).as("max_ts"))
    val peru = events.groupBy(col("user_id"))
      .agg(max(col("ts")).as("last_ts"), count(lit(1)).as("freq"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("monetary"))
      .crossJoin(broadcast(maxTs))
      .select(col("user_id"),
        datediff(col("max_ts"), col("last_ts")).cast("long").as("recency_days"),
        col("freq"), col("monetary"))
    val qs = peru.agg(
      expr("percentile(recency_days, 0.25)").as("r1"),
      expr("percentile(recency_days, 0.5)").as("r2"),
      expr("percentile(recency_days, 0.75)").as("r3"),
      expr("percentile(freq, 0.25)").as("f1"),
      expr("percentile(freq, 0.5)").as("f2"),
      expr("percentile(freq, 0.75)").as("f3"),
      expr("percentile(monetary, 0.25)").as("m1"),
      expr("percentile(monetary, 0.5)").as("m2"),
      expr("percentile(monetary, 0.75)").as("m3"))
    def band(x: org.apache.spark.sql.Column, q1: String, q2: String, q3: String) =
      lit(1L) + (x > col(q1)).cast("long") + (x > col(q2)).cast("long") +
        (x > col(q3)).cast("long")
    peru.crossJoin(broadcast(qs))
      .select(col("user_id"), col("recency_days"), col("freq"), col("monetary"),
        (lit(5L) - band(col("recency_days").cast("double"), "r1", "r2", "r3")).as("r_score"),
        band(col("freq").cast("double"), "f1", "f2", "f3").as("f_score"),
        band(col("monetary"), "m1", "m2", "m3").as("m_score"))
      .withColumn("rfm_code",
        col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
      .orderBy(col("user_id"))
  }

  /** Per-type z-score outliers (|z| > `zMax`): the tiny stats table
    * broadcasts back onto the events — two narrow passes total, no
    * wide shuffle of the events themselves. */
  def anomalies(events: DataFrame, zMax: Double = 3.0): DataFrame = {
    // a zero-variance type yields NULL z (no outliers), matching the
    // oracle's x/0 → NULL instead of Spark's ANSI divide error
    val z = (col("value") - col("mean")) / when(col("std") =!= 0.0, col("std"))
    events.join(broadcast(typeStats(events)), "event_type")
      .where(abs(z) > zMax)
      .select(col("event_id"), col("event_type"), col("value"),
        round(z, 4).as("z"))
      .orderBy(col("event_id"))
  }

  /** Activity concentration (Pareto audit): the share of all events
    * generated by the top decile of users — the "is 10% of the
    * corpus 90% of the traffic?" check that decides whether per-user
    * capping is needed before training on behavioral data. Exact
    * NTILE semantics WITHOUT ranking users: group users into RUNS of
    * equal event-count (rank order inside a run is user_id, which
    * can never change a per-decile count/sum), place each run at its
    * exact global rank interval with a cumulative window over the
    * O(distinct count values) runs table — bounded by the max
    * per-user count, independent of user cardinality — and split
    * runs across decile boundaries by pure rank arithmetic. The
    * O(users) aggregate shuffles once; nothing user-sized is ever
    * sorted on one task. Shares are integer ppm. */
  def paretoShare(events: DataFrame): DataFrame = {
    val perUser = events.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    val perVal = perUser.groupBy(col("n")).agg(count(lit(1)).as("c"))
    val tot = perUser.agg(count(lit(1)).as("nu"), sum(col("n")).as("total"))
    // runs table: O(distinct n) rows — same allowlisted class as an
    // O(days) window
    val w = Window.orderBy(col("n").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val runs = perVal
      .withColumn("r1", sum(col("c")).over(w))
      .withColumn("r0", col("r1") - col("c") + 1)
      .crossJoin(broadcast(tot))
      .selectExpr("n", "r0", "r1", "total",
        "nu DIV 10 AS q", "nu % 10 AS rem")
      .selectExpr("n", "r0", "r1", "total", "q", "rem",
        "rem * (q + 1) AS thr")
    // NTILE(10) of the run's first and last rank, then one row per
    // covered decile with the overlap length k
    val d = runs.selectExpr("n", "r0", "r1", "total", "q", "rem", "thr",
        "CASE WHEN q = 0 THEN r0 WHEN r0 <= thr THEN (r0 - 1) DIV (q + 1) + 1 " +
          "ELSE rem + (r0 - 1 - thr) DIV q + 1 END AS d0",
        "CASE WHEN q = 0 THEN r1 WHEN r1 <= thr THEN (r1 - 1) DIV (q + 1) + 1 " +
          "ELSE rem + (r1 - 1 - thr) DIV q + 1 END AS d1")
      .selectExpr("n", "r0", "r1", "total", "q", "rem", "thr",
        "explode(sequence(d0, d1)) AS decile")
      .selectExpr("n", "r0", "r1", "decile", "total",
        "CASE WHEN decile <= rem THEN (decile - 1) * (q + 1) + 1 " +
          "ELSE thr + (decile - 1 - rem) * q + 1 END AS lo",
        "CASE WHEN decile <= rem THEN decile * (q + 1) " +
          "ELSE thr + (decile - rem) * q END AS hi")
      .selectExpr("n", "decile", "total",
        "least(r1, hi) - greatest(r0, lo) + 1 AS k")
    d.groupBy(col("decile"))
      .agg(sum(col("k")).as("n_users"), sum(col("k") * col("n")).as("n_events"),
        max(col("total")).as("total"))
      .select(col("decile"), col("n_users"), col("n_events"),
        expr("n_events * 1000000 div total").as("share_ppm"))
      .orderBy(col("decile"))
  }

  /** Cumulative distinct users per day. Windowed COUNT(DISTINCT) is
    * unsupported (and would be quadratic anyway); the standard
    * rewrite is first-seen-day per user + a running sum of the daily
    * news — one user-keyed aggregation over the corpus, then an
    * O(days) window. */
  def cumulativeDistinctUsers(events: DataFrame): DataFrame = {
    val daily = events
      .select(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .groupBy(col("user_id")).agg(min(col("day")).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("new_users"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.withColumn("cum_users", sum(col("new_users")).over(w))
      .orderBy(col("day"))
  }

  /** Cohort lifetime revenue: purchase value by signup-week cohort ×
    * weeks-since-signup — the retention-revenue matrix a growth team
    * reads. Cohort is each user's first-seen week (one user-keyed
    * aggregation); revenue joins back on user and buckets by exact
    * integer week offset; money sums through DECIMAL. */
  def cohortRevenue(events: DataFrame): DataFrame = {
    val firstWeek = events.groupBy(col("user_id"))
      .agg(min(date_trunc("week", col("ts"))).as("cohort"))
    events.where(col("event_type") === "purchase")
      .join(firstWeek, "user_id")
      .groupBy(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_week"),
        (datediff(date_trunc("week", col("ts")), col("cohort")).cast("long") / 7)
          .cast("long").as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_buyers"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("revenue"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Time-to-convert distribution: per user, microseconds from the
    * first `fromType` event to the first `toType` event at-or-after
    * it; reported as count/min/median/max over converting users. The
    * median is percentile_disc-style — the actual element at rank
    * ⌈n/2⌉ — so it is integer-exact, never interpolated. (The rank's
    * nominal (delta, user_id) tie-break can never change the VALUE
    * at the rank, so it needs no ordering by user.) The per-user
    * reduction is two filtered aggregations; the median resolves by
    * rank-by-counting (`Ranks.selectAtRank`: percentile-banded
    * counts narrowing the candidate range, final bounded
    * TakeOrdered) — no global window touches the O(converting
    * users) delta table. */
  def timeToConvert(events: DataFrame, fromType: String = "view",
                    toType: String = "purchase"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val e = events.select(col("user_id"), col("event_type"),
      expr("unix_micros(ts)").as("us"))
    val v = e.where(col("event_type") === fromType)
      .groupBy(col("user_id")).agg(min(col("us")).as("v_us"))
    val deltas = e.where(col("event_type") === toType)
      .join(v, "user_id").where(col("us") >= col("v_us"))
      .groupBy(col("user_id"))
      .agg((min(col("us")) - min(col("v_us"))).as("delta"))
      .persist()
    val tot = deltas.agg(count(lit(1)).as("n_users"),
      min(col("delta")).as("min_us"), max(col("delta")).as("max_us"))
    val n = tot.head().getLong(0)
    val med =
      if (n == 0) Seq.empty[Long].toDF("median_us")
      else Seq(Ranks.selectAtRank(deltas, "delta", (n + 1) / 2))
        .toDF("median_us")
    deltas.unpersist()
    tot.crossJoin(broadcast(med))
      .select(col("n_users"), col("min_us"), col("median_us"), col("max_us"))
  }

  /** Time-RANGE window frame: per event, the sum/count of the same
    * user's events in the trailing `windowMinutes` — a true RANGE
    * frame over event-time microseconds, not a row-count frame
    * (`movingAvgOf`), so ts-peers share one frame and sparse/bursty
    * activity is windowed by TIME. The frame sum is DECIMAL (exact,
    * order-independent); windows partition per user — no global
    * order at any scale. */
  def rangeFrameSum(events: DataFrame, windowMinutes: Int = 10): DataFrame = {
    val us = expr("unix_micros(ts)")
    val w = Window.partitionBy(col("user_id")).orderBy(us)
      .rangeBetween(-windowMinutes * 60L * 1000000L, 0L)
    events
      .select(col("user_id"), col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"),
        sum(col("value").cast("decimal(18,4)")).over(w).cast("double").as("win_sum"),
        count(lit(1)).over(w).as("n_in_window"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Strict per-step funnel completions: the greedy earliest
    * view → click → purchase chain where EACH step follows the
    * previous within `stepGapMinutes` (default 24 h, the same window
    * `funnel` uses per stage) — one row per completing user
    * with the chain timestamps and total duration (`funnel` reports
    * stage counts with a loose per-stage window; this is the per-user
    * completion record with a tight inter-step constraint).
    *
    * Same scale shape as `funnel`: each stage is one filtered
    * aggregate joined to the PREVIOUS stage's user table, which
    * shrinks monotonically — so each join broadcasts the
    * converted-user side against the event stream. Durations are
    * exact integer microseconds. */
  def windowedFunnel(events: DataFrame, stepGapMinutes: Int = 1440): DataFrame = {
    val gapUs = stepGapMinutes * 60L * 1000000L
    val e = events.select(col("user_id"), col("event_type"),
      expr("unix_micros(ts)").as("us"))
    val v = e.where(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("v_us"))
    val c = e.where(col("event_type") === "click").as("e")
      .join(broadcast(v).as("v"), col("e.user_id") === col("v.user_id") &&
        col("e.us") > col("v_us") && col("e.us") <= col("v_us") + lit(gapUs))
      .groupBy(col("e.user_id").as("user_id"))
      .agg(min(col("v_us")).as("v_us"), min(col("e.us")).as("c_us"))
    val p = e.where(col("event_type") === "purchase").as("e2")
      .join(broadcast(c).as("c"), col("e2.user_id") === col("c.user_id") &&
        col("e2.us") > col("c_us") && col("e2.us") <= col("c_us") + lit(gapUs))
      .groupBy(col("e2.user_id").as("user_id"))
      .agg(min(col("v_us")).as("v_us"), min(col("c_us")).as("c_us"),
        min(col("e2.us")).as("p_us"))
    p.select(col("user_id"),
        date_format(expr("timestamp_micros(v_us)"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("view_ts"),
        date_format(expr("timestamp_micros(c_us)"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("click_ts"),
        date_format(expr("timestamp_micros(p_us)"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("purchase_ts"),
        (col("p_us") - col("v_us")).as("funnel_us"))
      .orderBy(col("user_id"))
  }

  /** Seasonal-naive forecast backtest per event type: predict each
    * day's count with the count 7 days of data earlier (the
    * same-weekday naive baseline every real forecast must beat) and
    * score MAE / MAPE over the scorable days. Exact integer errors
    * summed as integers, one rounded division at the end; lag runs
    * per type over the O(days) daily rollup — never the raw stream.
    * The baseline number a metrics team publishes BEFORE trying a
    * model: if a learned forecaster cannot beat this MAE, ship the
    * lag. */
  def forecastBacktest(events: DataFrame, season: Int = 7): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    daily.withColumn("pred", lag(col("n"), season).over(w))
      .where(col("pred").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days_scored"),
        round(sum(abs(col("n") - col("pred"))).cast("double") / count(lit(1)), 4)
          .as("mae"),
        // per-day relative errors round-then-DECIMAL-sum (order-free)
        round(sum(round(abs(col("n") - col("pred")).cast("double") / col("n"), 6)
          .cast("decimal(18,6)")).cast("double") / count(lit(1)), 6).as("mape"))
      .orderBy(col("event_type"))
  }

  /** CUSUM changepoint per event type over the daily count series:
    * the day where the one-sided cumulative sum of deviations from
    * the series mean peaks — the classic Page test statistic, the
    * "when did this metric shift?" monitor.
    *
    * Computed by the prefix identity S_t = P_t − min_{j≤t} P_j with
    * P the running sum of (count − mean): two windows PARTITIONED BY
    * event type over the O(days) daily rollup — never the raw
    * stream, and no global window. Deviations fold in day order on
    * both engines, so the doubles are bit-stable; output rounds to
    * 4 dp. */
  def cusumChangepoint(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"))
    val stats = daily.groupBy(col("event_type"))
      .agg((sum(col("n")).cast("double") / count(lit(1))).as("mean_n"),
        count(lit(1)).as("n_days"))
    val wRun = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = daily.join(broadcast(stats), "event_type")
      .withColumn("p", sum(col("n").cast("double") - col("mean_n")).over(wRun))
      // the prefix min must include the EMPTY prefix (P_0 = 0), else
      // an all-positive series would lose its own head start
      .withColumn("s", col("p") - least(lit(0.0), min(col("p")).over(wRun)))
    val wTop = Window.partitionBy(col("event_type"))
      .orderBy(col("s").desc, col("day"))
    scored.withColumn("rnk", row_number().over(wTop))
      .where(col("rnk") === 1)
      .select(col("event_type"), col("n_days"), col("day").as("changepoint_day"),
        round(col("s"), 4).as("max_cusum"))
      .orderBy(col("event_type"))
  }

  /** Kaplan–Meier survival curve over user LIFETIMES (days between a
    * user's first and last event): S(t) = Π_{u≤t} (1 − d_u/n_u),
    * the standard product-limit estimator with right censoring —
    * users whose last event falls within `censorDays` of the corpus
    * end are censored (still alive), not churned. The churn question
    * every retention dashboard actually asks ("what fraction of
    * users survive past day t?"), answered correctly in the presence
    * of users who simply haven't had time to churn yet.
    *
    * Scale shape: one groupBy(user) rollup (corpus-scale, fully
    * parallel), then everything runs on the O(distinct lifetime
    * days) table — the global windows are over that bounded rollup,
    * never the stream (the `ev_cum_users` allowlist family). The
    * hazard products fold in day order on both engines (sequential
    * window), so exp(Σ ln) is stable to well past the 4 dp output
    * rounding. A day that kills EVERY remaining at-risk user drives
    * S to exactly 0 via the zero-factor flag (ln(0) never
    * evaluates). */
  def survivalKm(events: DataFrame, censorDays: Int = 7): DataFrame = {
    val spans = events.groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
    val end = events.agg(max(col("ts")).cast("date").as("end_day"),
      count(lit(1)).as("_ignore"))
      .select(col("end_day"))
    val lifed = spans.crossJoin(broadcast(end))
      .select(
        datediff(col("last_ts").cast("date"), col("first_ts").cast("date"))
          .cast("long").as("lifetime_d"),
        when(datediff(col("end_day"), col("last_ts").cast("date")) <= censorDays,
          lit(1L)).otherwise(lit(0L)).as("censored"))
    val perDay = lifed.groupBy(col("lifetime_d"))
      .agg(count(lit(1)).as("total"), sum(col("censored")).as("c"),
        (count(lit(1)) - sum(col("censored"))).as("d"))
    val tot = lifed.agg(count(lit(1)).as("n_users"))
    val wPrior = Window.orderBy(col("lifetime_d"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy(col("lifetime_d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perDay.crossJoin(broadcast(tot))
      .withColumn("at_risk",
        col("n_users") - coalesce(sum(col("total")).over(wPrior), lit(0L)))
      .withColumn("factor",
        lit(1.0) - col("d").cast("double") / col("at_risk"))
      .withColumn("cum_ln",
        sum(when(col("factor") > 0, log(col("factor"))).otherwise(lit(0.0)))
          .over(wCum))
      .withColumn("died_out",
        max(when(col("factor") === 0, lit(1)).otherwise(lit(0))).over(wCum))
      .select(col("lifetime_d"), col("at_risk"), col("d").as("deaths"),
        col("c").as("censored"),
        round(when(col("died_out") === 1, lit(0.0)).otherwise(exp(col("cum_ln"))), 4)
          .as("survival"))
      .orderBy(col("lifetime_d"))
  }

  /** Lag-k autocorrelation (k = 1..`maxLag`) of the daily event-value
    * series — the seasonality detector behind `ev_forecast_backtest`'s
    * lag-7 choice: a spike at k=7 IS the weekly cycle. Pearson
    * correlation between the series and its k-shifted self, one
    * coefficient per lag.
    *
    * Scale shape: one corpus-scale daily rollup (value summed as
    * DECIMAL so the per-day totals are order-exact), then lags and
    * correlations run on the O(days) series — the lag windows are
    * global but provably bounded (`ev_cum_users` family); the k
    * lagged copies explode O(days·maxLag) rows, still model-sized. */
  def autocorrDaily(events: DataFrame, maxLag: Int = 7): DataFrame = {
    val daily = events
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(sum(col("value").cast("decimal(18,4)")).cast("double").as("x"))
    val w = Window.orderBy(col("day"))
    val lagged = daily.select(
      (col("day") +: col("x") +:
        (1 to maxLag).map(k => lag(col("x"), k).over(w).as(s"__l$k"))): _*)
    val stacked = lagged.select(explode(array(
      (1 to maxLag).map(k =>
        struct(lit(k).cast("long").as("lag_k"), col("x"), col(s"__l$k").as("y"))): _*))
      .as("s"))
      .select(col("s.lag_k"), col("s.x"), col("s.y"))
      .where(col("y").isNotNull)
    stacked.groupBy(col("lag_k"))
      .agg(count(lit(1)).as("n_pairs"), round(corr(col("x"), col("y")), 4).as("acf"))
      .orderBy(col("lag_k"))
  }

  /** Welch's t-test A/B comparison of purchase value between
    * hash-split variants: users land in control/treatment by
    * user_id parity (the deterministic stand-in for an assignment
    * column) and the per-variant revenue means are compared with
    * the unequal-variance t statistic t = (m₁−m₀)/√(s₀²/n₀+s₁²/n₁)
    * and its Welch–Satterthwaite degrees of freedom. Scale shape:
    * the corpus collapses to two rows of (count, Σx, Σx²) moments in
    * ONE fully map-side-combinable shuffle — no per-user grouping,
    * no second pass; the pivot is single-row conditional
    * aggregation. Determinism: values quantize to DECIMAL(18,4) and
    * the moments are EXACT decimal sums (order-independent on any
    * partitioning); means/variances/t derive from those exact sums
    * in fixed double arithmetic, so the oracle replay is
    * bit-identical — a naive distributed var_samp over doubles
    * would not be. */
  def abTest(events: DataFrame): DataFrame = {
    val purch = events.where(col("event_type") === "purchase")
      .select(pmod(col("user_id"), lit(2)).cast("long").as("variant"),
        col("value").cast("decimal(18,4)").as("x"))
    val variants = purch.groupBy(col("variant")).agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"),
      sum((col("x") * col("x")).cast("decimal(28,8)")).as("sxx"))
    val one = variants.agg(
      max(when(col("variant") === 0, col("n"))).as("n0"),
      max(when(col("variant") === 0, col("sx"))).as("sx0"),
      max(when(col("variant") === 0, col("sxx"))).as("sxx0"),
      max(when(col("variant") === 1, col("n"))).as("n1"),
      max(when(col("variant") === 1, col("sx"))).as("sx1"),
      max(when(col("variant") === 1, col("sxx"))).as("sxx1"))
    def mean(sx: Column, n: Column) = sx.cast("double") / n
    def variance(sxx: Column, sx: Column, n: Column) =
      (sxx.cast("double") - sx.cast("double") * sx.cast("double") / n) / (n - 1)
    val m0 = mean(col("sx0"), col("n0"))
    val m1 = mean(col("sx1"), col("n1"))
    val se0 = variance(col("sxx0"), col("sx0"), col("n0")) / col("n0")
    val se1 = variance(col("sxx1"), col("sx1"), col("n1")) / col("n1")
    one.select(col("n0").cast("long").as("n_control"),
        round(m0, 6).as("mean_control"),
        col("n1").cast("long").as("n_treatment"),
        round(m1, 6).as("mean_treatment"),
        round((m1 - m0) / sqrt(se0 + se1), 6).as("t_stat"),
        round((se0 + se1) * (se0 + se1) /
          (se0 * se0 / (col("n0") - 1) + se1 * se1 / (col("n1") - 1)), 4)
          .as("welch_dof"))
  }

  /** Gini coefficient of per-user total value — the inequality
    * diagnostic next to [[pareto]]'s top-share cut: G = 2·Σ i·x_(i) /
    * (n·Σx) − (n+1)/n over the ascending per-user totals. Ranks come
    * from the two-phase banded machinery (never a global window);
    * Σ i·x accumulates in exact DECIMAL, and tied totals make the sum
    * order-invariant by construction (equal x under permuted ranks).
    * One corpus shuffle (the per-user aggregation); everything after
    * is model-sized or per-band parallel. */
  def giniValue(events: DataFrame): DataFrame = {
    val perUser = events.groupBy(col("user_id"))
      .agg(sum(col("value").cast("decimal(18,4)")).as("x"))
    val bounds = Ranks.percentileBoundaries(perUser, col("x").cast("double"), 64)
    val (ranked, n) = Ranks.withGlobalRank(perUser,
      Ranks.valueBands(col("x").cast("double"), bounds),
      Seq(col("x"), col("user_id")), "rnk")
    val agg = ranked.agg(
      sum(col("x")).as("sx"),
      sum((col("rnk").cast("decimal(19,0)") * col("x")).cast("decimal(38,4)")).as("six"))
    agg.select(lit(n).as("n_users"),
      round(col("sx").cast("double"), 4).as("total_value"),
      round(lit(2.0) * col("six").cast("double") /
        (lit(n.toDouble) * col("sx").cast("double")) -
        (lit(n.toDouble) + 1.0) / lit(n.toDouble), 6).as("gini"))
  }

  /** Mann-Whitney U (Wilcoxon rank-sum) comparing `value` between two
    * event types — the nonparametric member of the testing family
    * (ev_abtest is Welch's t on means; this one is distribution-free
    * with the standard normal approximation and TIE correction, which
    * the cent-granular values genuinely exercise).
    *
    * Scale shape: ONE shuffle groups the two samples by distinct
    * value into (v, cntA, cntB); the combined average rank of each
    * value needs the EXCLUSIVE prefix count over value order, which
    * is the two-phase banded prefix sum ([[Ranks.withGlobalPrefixSum]])
    * — never a global window. All rank mass is summed in exact
    * integer DECIMAL (2·R1 stays integral through the tie halves), so
    * U is exact at any partitioning; only the final z goes through
    * double math, in the same association order as the oracle. */
  def mannWhitney(events: DataFrame, typeA: String = "purchase",
                  typeB: String = "click"): DataFrame = {
    val byV = events.where(col("event_type").isin(typeA, typeB))
      .groupBy(col("value").as("v"))
      .agg(sum(when(col("event_type") === typeA, 1L).otherwise(0L)).as("ca"),
        sum(when(col("event_type") === typeB, 1L).otherwise(0L)).as("cb"))
      .withColumn("ct", col("ca") + col("cb"))
    val bounds = Ranks.percentileBoundaries(byV, col("v"), 64)
    val (withCum, _) = Ranks.withGlobalPrefixSum(byV,
      Ranks.valueBands(col("v"), bounds), Seq(col("v")), col("ct"), "cum_less")
    val ctD = col("ct").cast("decimal(19,0)")
    val one = withCum.agg(
      sum(col("ca")).cast("long").as("n1"),
      sum(col("cb")).cast("long").as("n2"),
      // 2·R1 = Σ ca · (2·cum_less + ct + 1): integral, exact
      sum((col("ca").cast("decimal(19,0)") *
        (col("cum_less") * 2 + col("ct") + 1).cast("decimal(19,0)"))
        .cast("decimal(38,0)")).as("r1x2"),
      sum((ctD * ctD * ctD - ctD).cast("decimal(38,0)")).as("tie3"))
    val n1 = col("n1").cast("double")
    val n2 = col("n2").cast("double")
    val n = n1 + n2
    val uA = (col("r1x2").cast("double") - n1 * (n1 + 1)) / 2.0
    val sigma = sqrt(n1 * n2 / 12.0 * ((n + 1) - col("tie3").cast("double") / (n * (n - 1))))
    one.select(col("n1").as("n_a"), col("n2").as("n_b"),
      uA.as("u_a"),
      round(sigma, 6).as("sigma_u"),
      // a fully-degenerate comparison (every value tied) has no
      // sampling variance — z is undefined, not infinite
      when(sigma > 0, round((uA - n1 * n2 / 2.0) / sigma, 6)).as("z"))
  }

  /** Kleinberg burst detection (Kleinberg, KDD 2002 — the batched
    * two-state automaton): which hours does the target event type
    * arrive at a BURST rate rather than its base rate? State 0 emits
    * the hourly (r, n) pair at the corpus rate p0 = R/N, state 1 at
    * p1 = s·p0; entering the burst state costs γ·ln T, leaving is
    * free, and the minimum-cost state sequence is the burst
    * annotation. Emitted intervals carry the standard burst weight
    * Σ(cost0 − cost1).
    *
    * Scale shape: the corpus reduces to the HOURLY (n, r) series in
    * one partial-agg shuffle — O(hours) rows, a model-sized table at
    * ANY corpus size (a month is 720 rows whether the table is 60 k
    * events or 100 TB) — and the inherently sequential Viterbi runs
    * over that model (the [[Ranks]] band-table shape). Costs are
    * 6-dp DECIMAL with "stay on tie" break rules, so the DuckDB
    * oracle replays the DP exactly as a recursive CTE carrying both
    * state accumulators and their argmin paths. */
  def kleinbergBursts(events: DataFrame, targetType: String = "purchase",
                      s: Double = 1.75, gamma: Double = 0.6): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import java.math.{BigDecimal => BD, RoundingMode}
    val hourly = events.groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("h"))
      .agg(count(lit(1)).as("n"),
        count(when(col("event_type") === targetType, 1)).as("r"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val nn = hourly.map(_._2).sum
    val rr = hourly.map(_._3).sum
    val p0 = rr.toDouble / nn
    val p1 = math.min(s * p0, 0.999999)
    def d6(x: Double) = new BD(x).setScale(6, RoundingMode.HALF_UP)
    val trans = d6(gamma * math.log(hourly.length.toDouble))
    def emit(r: Long, n: Long, p: Double): BD =
      d6(-(r * math.log(p) + (n - r) * math.log(1 - p)))
    var c0 = emit(hourly(0)._3, hourly(0)._2, p0)
    var c1 = trans.add(emit(hourly(0)._3, hourly(0)._2, p1))
    var path0 = "0"
    var path1 = "1"
    for (i <- 1 until hourly.length) {
      val (_, n, r) = hourly(i)
      val e0 = emit(r, n, p0)
      val e1 = emit(r, n, p1)
      val c0t = c0.add(trans)
      val stay0 = c0.compareTo(c1) <= 0
      val stay1 = c1.compareTo(c0t) <= 0
      val (nc0, np0) = ((if (stay0) c0 else c1).add(e0),
        (if (stay0) path0 else path1) + "0")
      val (nc1, np1) = ((if (stay1) c1 else c0t).add(e1),
        (if (stay1) path1 else path0) + "1")
      c0 = nc0; c1 = nc1; path0 = np0; path1 = np1
    }
    val best = if (c0.compareTo(c1) <= 0) path0 else path1
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long, Double)]
    var i = 0
    while (i < best.length) {
      if (best(i) == '1') {
        var j = i
        while (j + 1 < best.length && best(j + 1) == '1') j += 1
        val w = (i to j).map { t =>
          emit(hourly(t)._3, hourly(t)._2, p0)
            .subtract(emit(hourly(t)._3, hourly(t)._2, p1))
        }.reduce(_.add(_))
        out += ((hourly(i)._1, hourly(j)._1, (j - i + 1).toLong, w.doubleValue))
        i = j + 1
      } else i += 1
    }
    out.toSeq.toDF("burst_start", "burst_end", "n_hours", "weight")
      .orderBy(col("burst_start"))
  }

  /** Mergeable quantile-sketch zone — THE 100 TB quantile shape: a
    * sorted-selection quantile cannot be recomputed per ad-hoc date
    * range, so the corpus pre-aggregates into per-day fixed-bin
    * histograms (one partial-agg shuffle, O(days · bins) rows — the
    * persisted sketch zone) and any range query MERGES the
    * model-sized histograms without revisiting an event. This entry
    * builds the per-day zone, merges it corpus-wide, interpolates
    * q∈{0.5, 0.9, 0.99}, and grades each estimate against the EXACT
    * rank-selected quantile (`Ranks.selectAtRank`, never a global
    * sort) — emitting estimate, exact, and the error the sketch
    * actually pays. Values are quantized to exact micro-units so
    * rank selection and both engines agree bit-for-bit; the
    * cumulative over 256 bins is a model-sized self-join, not a
    * single-partition window. */
  def histQuantileSketch(events: DataFrame, nBins: Int = 256,
                         qs: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val uv = events.where(col("value").isNotNull)
      .select(floor(col("value") * lit(1000000d)).cast("long").as("uv"),
        to_date(col("ts")).as("day"))
    val mm = uv.agg(min(col("uv")), max(col("uv")), count(lit(1))).collect()(0)
    val (lo, hi, n) = (mm.getLong(0), mm.getLong(1), mm.getLong(2))
    require(hi > lo, "degenerate value range")
    val width = (hi - lo).toDouble / nBins
    // the per-day sketch zone (what a real deployment persists)
    val sketch = uv.groupBy(col("day"),
        least(floor((col("uv") - lit(lo)) / lit(width)), lit(nBins - 1))
          .cast("long").as("bin"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val nDays = sketch.agg(countDistinct(col("day"))).collect()(0).getLong(0)
    // merging sketches never touches events again
    val merged = sketch.groupBy(col("bin")).agg(sum(col("cnt")).as("cnt"))
    val cumB = merged.as("a").join(merged.as("b"), col("b.bin") < col("a.bin"), "left")
      .groupBy(col("a.bin").as("bin"), col("a.cnt").as("cnt"))
      .agg(coalesce(sum(col("b.cnt")), lit(0L)).as("cumb"))
    // exact ground truth per rank, by iterative banded counting
    val uvOnly = uv.select(col("uv"))
    // one shared banding pass resolves every rank (round 14): the
    // per-q selectAtRank calls each re-ran the corpus-scale
    // boundary + band-count jobs the multi-rank variant shares
    val ranks = qs.map(q => math.max(1L, math.ceil(q * n).toLong))
    val exact = Ranks.selectAtRanks(uvOnly, "uv", ranks)
    val ks = qs.zip(ranks).zip(exact)
      .map { case ((q, k), e) => (q, k, e) }.toDF("q", "k", "exact_u")
    ks.join(cumB, col("cumb") < col("k") && col("cumb") + col("cnt") >= col("k"))
      .select(round(col("q"), 2).as("q"), col("k"),
        round((lit(lo) + lit(width) * col("bin") +
          lit(width) * ((col("k") - col("cumb") - 1).cast("double") / col("cnt"))) /
          lit(1000000), 6).as("est"),
        round(col("exact_u") / lit(1000000), 6).as("exact"),
        round(abs(lit(lo) + lit(width) * col("bin") +
          lit(width) * ((col("k") - col("cumb") - 1).cast("double") / col("cnt")) -
          col("exact_u")) / lit(1000000), 6).as("abs_err"),
        lit(nDays).as("n_days_merged"))
      .orderBy(col("q"))
  }
}
