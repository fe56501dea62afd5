package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming twins of the batch event queries: the same
  * logical plans driven by readStream, so a deployment can switch the
  * events table between batch parquet and a live stream without
  * changing the aggregation code (the reference is batch-only —
  * SURVEY §2.9 — this is the engine's streaming extension).
  *
  * Scale: tumbling windows with watermarks keep state bounded;
  * sessionization uses flatMapGroupsWithState with an explicit
  * timeout so idle users are evicted.
  */
object EventStream {

  /** The driver-generated events schema (ts = native timestamp[us],
    * surfaced as TIMESTAMP_NTZ; conversions go through
    * functions.EventTime, which also still accepts the older
    * epoch-nano LONG generation on batch reads). */
  val eventsSchema: StructType = StructType.fromDDL(
    "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")

  /** Shared plan: 5-minute tumbling counts/sums, watermarked. The
    * exact aggregation mirrored by batch query q40_window_tumbling. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withColumn("event_ts", graft.functions.EventTime.eventTs(events))
      .withWatermark("event_ts", "10 minutes")
      .groupBy(window(col("event_ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n"), col("total"))

  /** Run the tumbling aggregation as a stream over a parquet directory
    * and materialize to an in-memory table; returns the query.
    * `glob` narrows the directory to the events files (readStream
    * requires a directory path, not a file). */
  def runTumbling(spark: SparkSession, dir: String, queryName: String,
      glob: String = "*.parquet"): StreamingQuery = {
    val stream = spark.readStream.schema(eventsSchema)
      .option("pathGlobFilter", glob).parquet(dir)
    tumblingCounts(stream)
      .writeStream
      // Complete mode: Append would hold back windows newer than the
      // watermark, which never finalize once an AvailableNow run ends
      .outputMode(OutputMode.Complete)
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** 10-minute/5-minute sliding counts, watermarked — the streaming
    * twin of batch q46_sliding_window (each event feeds two windows;
    * state is bounded by watermark horizon x window count). */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withColumn("event_ts", graft.functions.EventTime.eventTs(events))
      .withWatermark("event_ts", "10 minutes")
      .groupBy(window(col("event_ts"), "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("n"), col("total"))

  /** Run the sliding aggregation as a stream into a memory sink.
    *
    * Default mode is Update: the watermark is honored, so window state
    * is dropped once the horizon passes — bounded state on a continuous
    * stream (Complete would retain every window forever). The
    * batch-parity test passes Complete explicitly: with a finite
    * AvailableNow input it makes every window visible in the memory
    * sink, which Update-mode late-batch emission does not guarantee —
    * that is a test-only, unbounded setting. */
  def runSliding(spark: SparkSession, dir: String, queryName: String,
      glob: String = "*.parquet",
      mode: OutputMode = OutputMode.Update): StreamingQuery = {
    val stream = spark.readStream.schema(eventsSchema)
      .option("pathGlobFilter", glob).parquet(dir)
    slidingCounts(stream)
      .writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Watermarked streaming dedup on an idempotency key (user, type,
    * 5-min window): state for a key is dropped once the watermark
    * passes its window, so it stays bounded by the watermark horizon x
    * key cardinality. First ARRIVAL wins (stream semantics); the batch
    * twin q45_stream_dedup picks first EVENT TIME — key counts agree,
    * which is what the parity test checks. */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withColumn("event_ts", graft.functions.EventTime.eventTs(events))
      .withColumn("win5", window(col("event_ts"), "5 minutes").getField("start"))
      .withWatermark("event_ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user_id", "event_type", "win5")

  /** Run the streaming dedup over a parquet directory into a memory
    * sink; returns the query. */
  def runDedup(spark: SparkSession, dir: String, queryName: String,
      glob: String = "*.parquet"): StreamingQuery = {
    val stream = spark.readStream.schema(eventsSchema)
      .option("pathGlobFilter", glob).parquet(dir)
    dedupEvents(stream)
      .writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Stream-stream interval join: each `earlierType` event joined to
    * the same user's `laterType` events that follow it within
    * `horizonMin` minutes — the attribution join (view -> purchase)
    * as a LIVE query. Both sides carry watermarks and the join
    * condition bounds both event-time columns, which is exactly what
    * Structured Streaming needs to evict buffered rows: a view older
    * than (purchase watermark - horizon) can never match again and is
    * dropped, so state is bounded by horizon x arrival rate, not by
    * stream length. Inner join -> Append mode; the batch twin is
    * q72_interval_join (same plan over the static table). */
  def intervalJoinPairs(earlier: DataFrame, later: DataFrame,
      horizonMin: Int = 10, watermarkMin: Int = -1): DataFrame = {
    // the lateness allowance must cover the attribution horizon: a
    // purchase can legitimately reference a view horizonMin old, so a
    // fixed small watermark would discard in-horizon matches arriving
    // in later micro-batches. Default: horizon + 10 minutes slack.
    val wm = s"${if (watermarkMin >= 0) watermarkMin else horizonMin + 10} minutes"
    val v = earlier
      .withColumn("v_ts", graft.functions.EventTime.eventTs(earlier))
      .select(col("user_id").as("v_user"), col("v_ts"),
        col("event_id").as("view_id"))
      .withWatermark("v_ts", wm)
    val p = later
      .withColumn("p_ts", graft.functions.EventTime.eventTs(later))
      .select(col("user_id").as("p_user"), col("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("p_ts", wm)
    v.join(p,
      col("v_user") === col("p_user") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr(s"INTERVAL $horizonMin MINUTES"))
      .select(col("v_user").as("user_id"), col("view_id"), col("purchase_id"),
        (unix_millis(col("p_ts")) - unix_millis(col("v_ts"))).as("lag_ms"),
        col("value"))
  }

  /** Run the interval join as a live stream-stream join over a parquet
    * directory (two independent readStream branches of the same
    * source) into a memory sink. */
  def runIntervalJoin(spark: SparkSession, dir: String, queryName: String,
      earlierType: String = "view", laterType: String = "purchase",
      horizonMin: Int = 10, glob: String = "*.parquet",
      watermarkMin: Int = -1): StreamingQuery = {
    def branch(eventType: String): DataFrame =
      spark.readStream.schema(eventsSchema)
        .option("pathGlobFilter", glob).parquet(dir)
        .filter(col("event_type") === eventType)
    intervalJoinPairs(branch(earlierType), branch(laterType), horizonMin, watermarkMin)
      .writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Stream-static AS-OF enrichment: every event picks the STATIC
    * reference table's latest state at-or-before its event time — the
    * live twin of `operators.AsOfJoin.asOfBackward` (whose union +
    * window resolution a stream cannot run: non-time windows are
    * unsupported over streaming frames). The static side collapses to
    * ONE row per key carrying its time-sorted (time, value) array —
    * reference states are checkpoints/config versions, bounded per
    * key by definition, unlike events — and broadcast-joins the
    * stream; the match is then a map-side `filter` + last-element
    * pick inside codegen. ZERO stream state: stateless projection +
    * broadcast join, Append mode, and the static side re-plans every
    * micro-batch (same shape as VulnMatch.scanStream) so a reloaded
    * reference table is picked up live. Ties at equal time match
    * (at-or-before); events before a key's first state, or with no
    * key match, keep null state columns (left-outer parity with the
    * batch operator). */
  def asOfLookup(events: DataFrame, states: DataFrame,
      eventKey: String, stateKey: String,
      eventTime: String, stateTime: String,
      stateCols: Seq[String], prefix: String = "s_"): DataFrame = {
    require(stateCols.nonEmpty, "asOfLookup needs at least one state value column")
    require(!stateCols.contains(stateTime),
      s"$stateTime is carried automatically as $prefix$stateTime; leave it out of stateCols")
    val outCols = (stateTime +: stateCols).map(prefix + _)
    require(events.columns.toSeq.intersect(outCols).isEmpty,
      s"prefixed state columns ${outCols.mkString(",")} collide with the event schema; pass a prefix")
    val internal = Seq("_k", "_states", "_m")
    val clash = (events.columns ++ states.columns).distinct.intersect(internal)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(",")} collide with as-of-lookup internal names; rename them first")
    // value fields ride under a `_v_` prefix so a state column named
    // "t" cannot duplicate the `_t` time field inside the struct
    val packed = states
      .groupBy(col(stateKey).as("_k"))
      .agg(sort_array(collect_list(struct(
        col(stateTime).as("_t") +:
        stateCols.map(c => col(c).as("_v_" + c)): _*))).as("_states"))
    val joined = events.join(broadcast(packed),
      col(eventKey) === col("_k"), "left_outer")
    // latest at-or-before = last element of the (sorted, order-
    // preserving) filter; guarded so an empty match stays null under
    // ANSI element_at. Materialized ONCE as `_m` — lambda-bearing
    // expressions are excluded from subexpression elimination, so
    // projecting k fields straight off the filter would rescan each
    // event's state array ~2(k+1) times
    val matches = filter(col("_states"), s => s.getField("_t") <= col(eventTime))
    val withM = joined.withColumn("_m",
      when(size(matches) > 0, element_at(matches, -1)))
    val out = ((prefix + stateTime, col("_m").getField("_t")) +:
      stateCols.map(c => (prefix + c, col("_m").getField("_v_" + c))))
      .map { case (n, c) => c.as(n) }
    withM.select(events.columns.map(col) ++ out: _*)
  }

  /** Run the as-of lookup live: events stream from a parquet
    * directory, the reference table stays static, output appends to a
    * memory sink. */
  def runAsOfLookup(spark: SparkSession, dir: String, states: DataFrame,
      queryName: String, eventKey: String, stateKey: String,
      stateTime: String, stateCols: Seq[String],
      glob: String = "*.parquet", prefix: String = "s_"): StreamingQuery = {
    val raw = spark.readStream.schema(eventsSchema)
      .option("pathGlobFilter", glob).parquet(dir)
    val stream = raw.withColumn("event_ts", graft.functions.EventTime.eventTs(raw))
    asOfLookup(stream, states, eventKey, stateKey, "event_ts", stateTime,
        stateCols, prefix)
      .writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  final case class SessionInput(user_id: Long, ms: Long)
  final case class SessionSummary(user_id: Long, n_sessions: Long, n_events: Long)
  final case class SessionState(nSessions: Long, nEvents: Long, lastMs: Long)

  /** Stateful gap-based sessionization (10-minute idle gap) via
    * flatMapGroupsWithState — the streaming twin of q41_sessionize.
    * Emits one summary per user per trigger (Update mode).
    *
    * State is BOUNDED: a processing-time timeout of `stateTtlMs`
    * (default 1 h) evicts users idle past it — the summaries already
    * emitted stand (Update-mode consumers keep the latest per key);
    * a user returning AFTER eviction restarts its counters, the
    * documented price of bounded state on an unbounded key space.
    * Late out-of-order arrivals cannot move `lastMs` backwards
    * (max-merge), so a stale event in a later micro-batch never
    * splits a session the true timeline would have joined. */
  def sessionize(spark: SparkSession, events: DataFrame, gapMs: Long = 600000L,
      stateTtlMs: Long = 3600000L): DataFrame = {
    import spark.implicits._
    require(stateTtlMs > 0, s"stateTtlMs must be positive, got $stateTtlMs")
    val input = events
      .select(col("user_id"), graft.functions.EventTime.eventMs(events).as("ms"))
      .as[SessionInput]

    input.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Update, GroupStateTimeout.ProcessingTimeTimeout) {
        (user: Long, rows: Iterator[SessionInput], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(_.ms)
            var st = state.getOption.getOrElse(SessionState(0L, 0L, Long.MinValue))
            for (r <- sorted) {
              val newSession = st.lastMs == Long.MinValue || r.ms - st.lastMs > gapMs
              st = SessionState(st.nSessions + (if (newSession) 1 else 0),
                st.nEvents + 1, math.max(st.lastMs, r.ms))
            }
            state.update(st)
            state.setTimeoutDuration(stateTtlMs)
            Iterator.single(SessionSummary(user, st.nSessions, st.nEvents))
          }
      }.toDF()
  }
}
