package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming operators over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * Design rule: every aggregation is written as a `DataFrame =>
  * DataFrame` transform usable in BOTH batch and streaming plans — batch
  * runs give the DuckDB-oracle'd semantics, streaming runs attach
  * watermarks and incremental state. That is exactly Spark's unified
  * model: one logical plan, two execution modes.
  */
object EventStreams {

  /** Tumbling-window counts/sums per event type. Streaming: watermarked
    * state store keyed by (window, event_type) — bounded state, scales
    * with windows × types, not events.
    */
  def windowedCounts(events: DataFrame, windowLength: String): DataFrame =
    events
      .groupBy(window(col("ts"), windowLength).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Same, with the streaming watermark attached. */
  def windowedCountsStream(events: DataFrame, windowLength: String,
      watermark: String): DataFrame =
    windowedCounts(events.withWatermark("ts", watermark), windowLength)

  /** Sliding (hopping) window event counts: each event contributes to
    * length/slide windows.
    */
  def slidingCounts(events: DataFrame, windowLength: String, slide: String): DataFrame =
    events
      .groupBy(window(col("ts"), windowLength, slide).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("n_events"))

  /** Session windows, streaming-native: `session_window` merges events
    * within `gap` into one growing window per user. State per open
    * session only.
    */
  def sessionWindows(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("s"), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("session_value"))
      .select(
        col("user_id"),
        date_format(col("s.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("s.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("n_events"), col("session_value"))

  def sessionWindowsStream(events: DataFrame, gap: String, watermark: String): DataFrame =
    sessionWindows(events.withWatermark("ts", watermark), gap)

  /** Stream-stream interval join (conversion attribution): each left
    * event pairs with the same user's right events inside
    * `[l.ts, l.ts + horizon]`. In streaming BOTH sides carry watermarks
    * and the time-range predicate bounds the state store — Spark derives
    * how long each side must be retained from the interval condition, so
    * state is O(events inside the horizon), not unbounded. Latency is
    * emitted in exact microseconds (BIGINT) for oracle parity.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, horizon: String): DataFrame =
    intervalJoinWith(left, right, horizon, "inner")

  /** The attribution shape over the events table: views joined to the
    * same user's purchases within the horizon.
    */
  def attributedConversions(events: DataFrame, horizon: String): DataFrame =
    intervalJoin(
      events.filter(col("event_type") === "view"),
      events.filter(col("event_type") === "purchase"),
      horizon)
      .withColumnRenamed("left_id", "view_id")
      .withColumnRenamed("right_id", "purchase_id")

  /** Streaming twin: two watermarked streams (usually two filters of one
    * source stream — a genuine stream-stream self-join).
    */
  def attributedConversionsStream(
      viewStream: DataFrame, purchaseStream: DataFrame,
      horizon: String, watermark: String): DataFrame =
    intervalJoin(
      viewStream.withWatermark("ts", watermark),
      purchaseStream.withWatermark("ts", watermark),
      horizon)
      .withColumnRenamed("left_id", "view_id")
      .withColumnRenamed("right_id", "purchase_id")

  /** Left-outer interval join: every left event emits — paired rows as
    * [[intervalJoin]], unmatched lefts once with null right columns. In
    * streaming this is the shape that needs the watermark most: Spark
    * can only emit the null row after the watermark proves no match can
    * still arrive, so unmatched results trail by the watermark delay
    * (bounded state, eventual completeness — pinned in EventStreamsSpec).
    */
  def intervalJoinOuter(left: DataFrame, right: DataFrame, horizon: String): DataFrame =
    intervalJoinWith(left, right, horizon, "left_outer")

  /** Shared body of the two interval joins — one place owns the horizon
    * predicate and the latency projection.
    */
  private def intervalJoinWith(
      left: DataFrame, right: DataFrame, horizon: String,
      joinType: String): DataFrame =
    left.alias("l").join(
        right.alias("r"),
        col("l.user_id") === col("r.user_id") &&
          col("r.ts") >= col("l.ts") &&
          col("r.ts") <= col("l.ts") + expr(s"INTERVAL $horizon"),
        joinType)
      .select(
        col("l.event_id").as("left_id"),
        col("r.event_id").as("right_id"),
        col("l.user_id").as("user_id"),
        (unix_micros(col("r.ts")) - unix_micros(col("l.ts"))).as("usecs_between"))

  /** Batch-shadow sessionization via lag + running count — the exact
    * relational statement of the session_window semantics, and the form
    * a SQL oracle can replicate: a session starts where the gap from the
    * previous event of the same user exceeds `gapSeconds`.
    */
  def sessionizeBatch(events: DataFrame, gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"))
    val sessions = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn(
        "is_start",
        // microsecond arithmetic: exact integers on both engines (the
        // DuckDB oracle uses epoch_us), no sub-second truncation drift
        when(
          col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapSeconds * 1000000L,
          1).otherwise(0))
      .withColumn(
        "session_seq",
        sum(col("is_start")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    sessions
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("session_value"))
  }

  /** Ingestion dedup: at most one event per (user_id, event_type,
    * minute) — the at-least-once-delivery cleanup every event pipeline
    * needs. Batch form elects the min-event_id survivor per key
    * (deterministic, oracle-able).
    */
  def dedupedEvents(events: DataFrame): DataFrame = {
    val keyed = events.withColumn("minute_bucket", date_trunc("minute", col("ts")))
    val w = Window.partitionBy("user_id", "event_type", "minute_bucket")
      .orderBy(col("event_id"))
    keyed
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("event_id"), col("user_id"), col("event_type"),
        date_format(col("minute_bucket"), "yyyy-MM-dd HH:mm:ss").as("minute_bucket"))
  }

  /** Streaming form: dropDuplicatesWithinWatermark on the same key, so
    * dedup state is BOUNDED by the watermark horizon (keys older than
    * the watermark are evicted — infinite streams, finite state). The
    * survivor is the first arrival rather than the min event_id; key-set
    * equivalence with the batch form is pinned in EventStreamsSpec.
    */
  def dedupedEventsStream(events: DataFrame, watermark: String): DataFrame =
    events
      .withColumn("minute_bucket", date_trunc("minute", col("ts")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("user_id", "event_type", "minute_bucket")
      .select(
        col("event_id"), col("user_id"), col("event_type"),
        date_format(col("minute_bucket"), "yyyy-MM-dd HH:mm:ss").as("minute_bucket"))

  /** Stream-static enrichment join: attach dimension attributes to each
    * event. In streaming execution the static side is (re)broadcast per
    * micro-batch and the stream side is map-only — no state store, no
    * watermark needed; the canonical "enrich events with a dim table"
    * pattern. Identical transform runs in batch for the oracle gate.
    */
  def enrichEvents(events: DataFrame, users: DataFrame): DataFrame =
    events
      .join(broadcast(users), events("user_id") === users("user_key"), "left")
      .select(
        events("event_id"), events("user_id"), events("event_type"),
        users("user_segment"))

  // ------------------------------------------------------- custom state
  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class UserRunningState(nEvents: Long, totalValue: Double)
  final case class UserSnapshot(user_id: Long, n_events: Long, total_value: Double)

  /** Custom keyed state via mapGroupsWithState: a running per-user
    * counter that survives across micro-batches — the
    * KeyValueGroupedDataset stateful-processing surface for logic the
    * built-in aggregations can't express.
    */
  def runningUserTotals(
      events: Dataset[Event]): Dataset[UserSnapshot] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserRunningState, UserSnapshot](
        GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[UserRunningState]) =>
          val prev = state.getOption.getOrElse(UserRunningState(0L, 0.0))
          val (n, v) = batch.foldLeft((prev.nEvents, prev.totalValue)) {
            case ((cn, cv), e) => (cn + 1, cv + e.value)
          }
          state.update(UserRunningState(n, v))
          UserSnapshot(userId, n, roundCents(v))
      }
  }

  final case class UserProfile(
      user_id: Long, n_events: Long, total_value: Double, type_counts: String)

  /** Spark 4's `transformWithState` surface: one keyed processor holding
    * MULTIPLE typed state variables — a ValueState for running totals
    * plus a MapState of per-event-type counts — something
    * mapGroupsWithState's single state object only emulates by packing
    * everything into one blob (rewritten wholesale every batch, where
    * MapState updates only the touched event-type entries in the state
    * store). Emits the refreshed profile for each user seen in a batch
    * (Update mode). Requires the RocksDB state store provider.
    */
  class UserProfileProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, UserProfile] {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{MapState, TimeMode, TTLConfig, TimerValues, ValueState}

    @transient private var totals: ValueState[UserRunningState] = _
    @transient private var perType: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      totals = getHandle.getValueState[UserRunningState](
        "totals", Encoders.product[UserRunningState], TTLConfig.NONE)
      perType = getHandle.getMapState[String, Long](
        "per_type", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(
        user: Long, rows: Iterator[Event],
        timers: TimerValues): Iterator[UserProfile] = {
      var st = if (totals.exists()) totals.get() else UserRunningState(0L, 0.0)
      rows.foreach { e =>
        st = UserRunningState(st.nEvents + 1, st.totalValue + e.value)
        val prev = if (perType.containsKey(e.event_type)) perType.getValue(e.event_type) else 0L
        perType.updateValue(e.event_type, prev + 1)
      }
      totals.update(st)
      val tc = perType.iterator()
        .map { case (t, c) => s"$t:$c" }.toSeq.sorted.mkString(",")
      Iterator.single(UserProfile(
        user, st.nEvents, roundCents(st.totalValue), tc))
    }
  }

  /** Per-user profiles via transformWithState (TimeMode.None, Update
    * output). The converged result must equal the batch aggregation —
    * pinned in EventStreamsSpec.
    */
  def userProfiles(events: Dataset[Event]): Dataset[UserProfile] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new UserProfileProcessor, TimeMode.None(), OutputMode.Update())
  }

  /** Sessionization on the transformWithState API with EVENT-TIME
    * timers — the modern form of [[expiringSessions]]: one ValueState
    * holds the open session; every batch re-arms a timer at
    * `session end + gap`, and [[handleExpiredTimer]] emits the closed
    * session exactly once when the watermark crosses it. Unlike
    * flatMapGroupsWithState's single timeout slot, timers here are
    * first-class (several can coexist per key) — this processor needs
    * one, so it deletes the previous before re-arming.
    */
  /** Event time in MICROSECONDS — Spark's native timestamp resolution
    * and the unit the batch sessionization uses (`unix_micros`); the
    * old millisecond `getTime` arithmetic mis-merged gap-boundary
    * events with sub-millisecond timestamps and truncated emitted
    * session bounds.
    */
  // floorDiv/floorMod, not `/` and `%`: truncating division rounds
  // toward zero for pre-epoch (negative) times, shifting the seconds
  // component one too high — and a truncated negative remainder handed
  // setNanos a negative argument (IllegalArgumentException). Floor
  // semantics make the roundtrip exact on both sides of the epoch.
  private[streaming] def tsMicros(ts: java.sql.Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  private[streaming] def microsTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  private def roundCents(v: Double): Double = math.round(v * 100).toDouble / 100

  private def closeSession(user: Long, s: OpenSession): ClosedSession =
    ClosedSession(user, microsTs(s.start), microsTs(s.end), s.n,
      roundCents(s.value))

  /** Fold a batch of events (sorted ascending) into the per-key OPEN
    * session list. Each event enters as a singleton session and MERGES
    * with every existing session within `gapUs` of it — so a late event
    * can extend a session backwards or bridge two sessions, exactly
    * like batch `session_window`. Closure is decided by the WATERMARK
    * alone: a session closes iff `end + gap <= watermark` (it can never
    * grow again — any still-admissible event is at or after the
    * watermark and therefore beyond the gap). Keeping EVERY unexpired
    * session open, not just the latest, is what makes the streamed
    * closed-session set equal the batch one: the old
    * latest-session-only state re-fragmented sessions whenever an
    * admissible late event fell near an already-emitted one.
    */
  private def foldSessions(
      openBefore: Seq[OpenSession], sorted: Seq[Event], gapUs: Long,
      watermarkUs: Long): (Seq[OpenSession], Seq[OpenSession]) = {
    var sessions = openBefore.toList
    sorted.foreach { e =>
      val t = tsMicros(e.ts)
      val (mergeable, rest) = sessions.partition(s =>
        t >= s.start - gapUs && t <= s.end + gapUs)
      val merged = mergeable.foldLeft(OpenSession(t, t, 1, e.value)) { (a, s) =>
        OpenSession(math.min(a.start, s.start), math.max(a.end, s.end),
          a.n + s.n, a.value + s.value)
      }
      sessions = (merged :: rest).sortBy(_.start)
    }
    val (expired, open) = sessions.partition(s => s.end + gapUs <= watermarkUs)
    (expired, open)
  }

  class SessionProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, ClosedSession] {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, TimeMode, TTLConfig, TimerValues}

    private val gapUs = gapMs * 1000L
    @transient private var open: ListState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getListState[OpenSession](
        "open", Encoders.product[OpenSession], TTLConfig.NONE)

    /** Persist the open set and re-arm ONE timer at the earliest
      * deadline (ms, clamped at/after the watermark as Spark requires).
      */
    private def persist(sessions: Seq[OpenSession], watermarkMs: Long): Unit = {
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      if (sessions.isEmpty) open.clear()
      else {
        open.put(sessions.toArray)
        val earliestUs = sessions.map(s => s.end + gapUs).min
        // ceil to ms: an early-by-truncation timer would fire before
        // the watermark actually passes the deadline
        val deadlineMs = (earliestUs + 999L) / 1000L
        getHandle.registerTimer(math.max(deadlineMs, watermarkMs + 1))
      }
    }

    override def handleInputRows(
        user: Long, rows: Iterator[Event],
        timers: TimerValues): Iterator[ClosedSession] = {
      val wmUs = timers.getCurrentWatermarkInMs() * 1000L
      val (expired, stillOpen) = foldSessions(
        open.get().toSeq, rows.toSeq.sortBy(e => tsMicros(e.ts)), gapUs, wmUs)
      persist(stillOpen, timers.getCurrentWatermarkInMs())
      expired.map(closeSession(user, _)).iterator
    }

    override def handleExpiredTimer(
        user: Long, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[ClosedSession] = {
      val wmUs = timers.getCurrentWatermarkInMs() * 1000L
      val (done, stillOpen) = open.get().toSeq
        .partition(s => s.end + gapUs <= wmUs)
      persist(stillOpen, timers.getCurrentWatermarkInMs())
      done.map(closeSession(user, _)).iterator
    }
  }

  /** [[expiringSessions]] on the transformWithState surface (event-time
    * TimeMode, Append output). Converges to the same closed-session set
    * — pinned in EventStreamsSpec.
    */
  def expiringSessionsTws(
      events: Dataset[Event], gapSeconds: Long, watermark: String): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .transformWithState(
        new SessionProcessor(gapSeconds * 1000L),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** start/end are event-time MICROSECONDS (Spark's native timestamp
    * resolution — ms arithmetic mis-merged gap-boundary events).
    */
  final case class OpenSession(start: Long, end: Long, n: Long, value: Double)
  final case class OpenSessionSet(sessions: Seq[OpenSession])
  final case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, session_value: Double)

  /** Sessionization with EMISSION ON EXPIRY — the flatMapGroupsWithState
    * + event-time-timeout form of [[sessionWindows]]: a session is
    * emitted exactly once, as soon as the watermark passes its gap
    * deadline, instead of living in a Complete-mode result table. This
    * is the shape for infinite streams: state holds only OPEN sessions
    * — ALL of them per key, not just the latest, so an admissible late
    * event near an earlier session merges instead of fragmenting —
    * and each closed session is appended downstream once and forgotten.
    */
  def expiringSessions(
      events: Dataset[Event], gapSeconds: Long, watermark: String): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapUs = gapSeconds * 1000000L
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSessionSet, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, batch: Iterator[Event], state: GroupState[OpenSessionSet]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val before = state.getOption.map(_.sessions).getOrElse(Nil)
          val (expired, stillOpen) = foldSessions(
            before, batch.toSeq.sortBy(e => tsMicros(e.ts)), gapUs, wmUs)
          if (stillOpen.isEmpty) {
            if (state.exists) state.remove()
          } else {
            state.update(OpenSessionSet(stillOpen))
            // one timeout at the EARLIEST deadline (ceil to ms; Spark
            // requires it at/after the current watermark)
            val earliestMs = (stillOpen.map(s => s.end + gapUs).min + 999L) / 1000L
            state.setTimeoutTimestamp(
              math.max(earliestMs, state.getCurrentWatermarkMs() + 1))
          }
          expired.map(closeSession(user, _)).iterator
      }
  }

  /** Incremental file-source ingest run to completion with
    * `Trigger.AvailableNow`: process every file currently in `srcDir`,
    * then STOP — the batch-job-shaped run of a streaming pipeline (the
    * scheduler-friendly backfill mode). The checkpoint records which
    * files were consumed, so a later run with the SAME checkpoint
    * processes only files that arrived since (pinned in
    * StreamingIngestSpec). Delivery to `process` is AT-LEAST-ONCE on a
    * crash between process() and the checkpoint commit — pair a
    * non-idempotent sink with the (appId, batchId) ledger the way
    * [[streamingScd1Upsert]] does for exactly-once effects.
    *
    * At scale this is the standard landing-zone pattern: object-store
    * prefix in, `process` (usually a foreachBatch MERGE into the store)
    * out, run from any scheduler with no always-on cluster.
    */
  def ingestFilesAvailableNow(
      spark: SparkSession, srcDir: String, schema: StructType,
      checkpointDir: String)(process: DataFrame => Unit): Unit = {
    val q = spark.readStream
      .schema(schema)
      .parquet(srcDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((batch: DataFrame, _: Long) => process(batch))
      .start()
    q.awaitTermination()
  }

  /** Streaming SCD1 upsert — the production foreachBatch sink: each
    * micro-batch MERGEs into the store with update semantics, wrapped in
    * the store's (appId, batchId) ledger so a replayed micro-batch
    * (checkpoint recovery, speculative re-run) is SKIPPED rather than
    * re-applied over newer state. Insert-only sinks are naturally
    * idempotent; update sinks need exactly this guard — it is the
    * Delta txnAppId/txnVersion pattern on the directory store.
    */
  /** @param checkpointDir durable checkpoint location. REQUIRED for the
    *        ledger guarantee to hold across restarts: without one, a
    *        restarted query renumbers micro-batches from 0 and the
    *        (appId, batchId) ledger would SKIP the new run's batches as
    *        replays — silent data loss. None is for single-run tests.
    */
  def streamingScd1Upsert(
      stream: DataFrame,
      store: graft.operators.TableStore,
      table: String,
      keys: Seq[String],
      updateCols: Seq[String],
      appId: String,
      checkpointDir: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    val w = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.commitIfNew(table, appId, batchId) {
          graft.operators.Merge.mergeInto(store, table, batch, keys, updateCols)
        }
        ()
      }
    checkpointDir.fold(w)(d => w.option("checkpointLocation", d)).start()
  }

  /** Convenience: read the events table as a file-source stream (one
    * parquet file = one micro-batch when `maxFilesPerTrigger=1`).
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    val batchSchema = spark.read.parquet(s"$dir/events.parquet").schema
    // the file source requires a directory; narrow it to the events file
    // with a glob filter
    val raw = spark.readStream
      .schema(batchSchema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    graft.Tables.normalizeEventTs(raw)
  }
}
