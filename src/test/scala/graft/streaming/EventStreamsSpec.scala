package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.{SparkSpec, Tables}
import graft.streaming.EventStreams._

/** Streaming execution of the shared transforms: the same
  * `DataFrame => DataFrame` used by the batch oracle queries, run as a
  * real Structured Streaming query with watermarks, must converge to the
  * batch answer once the stream is drained.
  */
class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("file-source stream: windowed counts converge to batch result") {
    val batch = windowedCounts(Tables.load(spark, sf, "events"), "1 hour")
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap

    val stream = windowedCountsStream(
      readEventStream(spark, sf), "1 hour", watermark = "2 hours")
    val q = stream.writeStream
      .format("memory")
      .queryName("win_counts")
      .outputMode(OutputMode.Complete())
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("win_counts")
        .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
        .toMap
      assert(streamed == batch,
        s"streaming result (${streamed.size} windows) != batch (${batch.size})")
    } finally q.stop()
  }

  test("append mode drops rows later than the watermark; on-time rows still count") {
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, String, Double)]
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")
    val q = windowedCountsStream(
        mem.toDF().toDF("ts", "event_type", "value"), "10 minutes", "15 minutes")
      .writeStream.format("memory").queryName("late_drop")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((t(0), "view", 1.0), (t(5), "view", 1.0))
      q.processAllAvailable()
      // watermark advances to 120-15=105min: the [0,10) window finalizes and emits
      mem.addData((t(120), "view", 1.0))
      q.processAllAvailable()
      val finalized = spark.table("late_drop")
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      assert(finalized("2024-01-01 00:00:00") == 2L)
      // a row for the long-finalized [0,10) window is LATE beyond the
      // watermark: it must be dropped, not re-emit or mutate the window
      mem.addData((t(1), "view", 99.0))
      q.processAllAvailable()
      val after = spark.table("late_drop")
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      assert(after("2024-01-01 00:00:00") == 2L, "late row was not dropped")
      assert(spark.table("late_drop").where("window_start = '2024-01-01 00:00:00'")
        .count() == 1, "finalized window re-emitted")
    } finally q.stop()
  }

  test("memory stream: session windows merge across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val events = mem.toDF().toDF("user_id", "ts", "value")

    def ts(minute: Int) = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")
    // batch 1: two events 5 min apart (same session)
    mem.addData((1L, ts(0), 1.0), (1L, ts(5), 2.0))
    // batch 2: one event 10 min later (same session), one 50 min later (new)
    mem.addData((1L, ts(15), 3.0), (1L, ts(55), 4.0))

    val q = sessionWindowsStream(events, gap = "30 minutes", watermark = "10 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Complete())
      .start()
    try {
      q.processAllAvailable()
      val sessions = spark.table("sessions")
        .orderBy("session_start")
        .collect().map(r => (r.getLong(3), r.getDouble(4)))
      // state merged across micro-batches: (3 events, 6.0) then (1 event, 4.0)
      assert(sessions.toSeq == Seq((3L, 6.0), (1L, 4.0)))
    } finally q.stop()
  }

  test("session_window matches the relational sessionization on real data") {
    val events = Tables.load(spark, sf, "events")
    val native = sessionWindows(events, "30 minutes")
      .select("user_id", "session_start", "n_events")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val relational = sessionizeBatch(events, 1800)
      .select("user_id", "session_start", "n_events")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(native == relational)
  }

  test("streaming dedup drops cross-batch duplicates within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String)]
    val events = mem.toDF().toDF("event_id", "ts", "user_id", "event_type")
    def ts(minute: Int) = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")
    // batch 1: two distinct keys + an in-batch duplicate of the first
    mem.addData((1L, ts(0), 7L, "click"), (2L, ts(0), 7L, "click"),
      (3L, ts(1), 7L, "view"))
    // batch 2: cross-batch duplicate (same user/type/minute) + a new key
    mem.addData((4L, ts(0), 7L, "click"), (5L, ts(2), 8L, "click"))

    val q = dedupedEventsStream(events, watermark = "1 hour")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append())
      .start()
    try {
      q.processAllAvailable()
      val kept = spark.table("dedup_stream")
        .select("user_id", "event_type", "minute_bucket")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      // one survivor per key; duplicates 2 (in-batch) and 4 (cross-batch) dropped
      assert(spark.table("dedup_stream").count() == 3)
      assert(kept == Set(
        (7L, "click", "2024-01-01 10:00:00"),
        (7L, "view", "2024-01-01 10:01:00"),
        (8L, "click", "2024-01-01 10:02:00")))
    } finally q.stop()
  }

  test("streaming dedup key set equals the batch dedup on real data") {
    val events = Tables.load(spark, sf, "events")
    val batchKeys = dedupedEvents(events)
      .select("user_id", "event_type", "minute_bucket")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val q = dedupedEventsStream(readEventStream(spark, sf), watermark = "2 hours")
      .writeStream.format("memory").queryName("dedup_file_stream")
      .outputMode(OutputMode.Append())
      .start()
    try {
      q.processAllAvailable()
      val streamKeys = spark.table("dedup_file_stream")
        .select("user_id", "event_type", "minute_bucket")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(streamKeys == batchKeys,
        s"stream kept ${streamKeys.size} keys, batch ${batchKeys.size}")
    } finally q.stop()
  }

  test("stream-stream interval self-join converges to the batch interval join") {
    val events = Tables.load(spark, sf, "events")
    val batch = attributedConversions(events, "30 minutes")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet

    // a genuine stream-stream self-join: one file source, filtered into
    // two watermarked sides, joined with the event-time range condition
    val src = readEventStream(spark, sf)
    val q = attributedConversionsStream(
        src.filter(col("event_type") === "view"),
        src.filter(col("event_type") === "purchase"),
        horizon = "30 minutes", watermark = "2 hours")
      .writeStream.format("memory").queryName("conversions")
      .outputMode(OutputMode.Append())
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("conversions")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
      assert(streamed == batch,
        s"stream paired ${streamed.size} conversions, batch ${batch.size}")
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER interval join: matches exact, null rows only for true non-matches") {
    val events = Tables.load(spark, sf, "events")
    val batchAll = intervalJoinOuter(
        events.filter(col("event_type") === "view"),
        events.filter(col("event_type") === "purchase"), "30 minutes")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    val batchMatched = batchAll.filter(_._2 >= 0)

    val src = readEventStream(spark, sf)
    val q = intervalJoinOuter(
        src.filter(col("event_type") === "view").withWatermark("ts", "1 hour"),
        src.filter(col("event_type") === "purchase").withWatermark("ts", "1 hour"),
        "30 minutes")
      .writeStream.format("memory").queryName("outer_conversions")
      .outputMode(OutputMode.Append())
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("outer_conversions")
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      // every matched pair arrives; a streamed null row is NEVER a lie
      // (it appears only for views the batch join also left unmatched);
      // null rows whose watermark hadn't passed at shutdown may be absent
      val streamedMatched = streamed.filter(_._2 >= 0)
      assert(streamedMatched == batchMatched,
        s"matched pairs: stream ${streamedMatched.size} vs batch ${batchMatched.size}")
      val streamedNulls = streamed.filter(_._2 < 0)
      assert(streamedNulls.subsetOf(batchAll),
        "stream emitted a null row for a view the batch join matched")
      assert(streamedNulls.nonEmpty, "watermark never released any unmatched view")
    } finally q.stop()
  }

  test("stream-static enrichment join converges to the batch join") {
    val users = Tables.load(spark, sf, "customer")
      .select(col("c_custkey").as("user_key"), col("c_mktsegment").as("user_segment"))
    val batch = enrichEvents(Tables.load(spark, sf, "events"), users)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap

    val q = enrichEvents(readEventStream(spark, sf), users)
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append())
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("enriched")
        .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
      assert(streamed == batch,
        s"stream enriched ${streamed.size} events, batch ${batch.size}")
    } finally q.stop()
  }

  test("flatMapGroupsWithState: sessions emit exactly once when the watermark expires them") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    def ev(id: Long, user: Long, hm: String, v: Double) =
      Event(id, Timestamp.valueOf(s"2024-01-01 $hm:00"), user, "click", v)

    val q = expiringSessions(mem.toDS(), gapSeconds = 1800, watermark = "10 minutes")
      .writeStream.format("memory").queryName("expiring")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // batch 1: one session for user 1 (10:00, 10:05)
      mem.addData(ev(1, 1L, "10:00", 1.0), ev(2, 1L, "10:05", 2.0))
      q.processAllAvailable()
      assert(spark.table("expiring").count() == 0) // still open

      // batch 2: same user far past the gap — old session closes in-handler
      mem.addData(ev(3, 1L, "12:00", 4.0))
      q.processAllAvailable()
      val first = spark.table("expiring").collect()
      assert(first.length == 1)
      assert(first.head.getLong(3) == 2L && first.head.getDouble(4) == 3.0)

      // batch 3: unrelated user advances the watermark past 12:30 —
      // user 1's open session times out WITHOUT any new user-1 event
      mem.addData(ev(4, 99L, "13:30", 0.5))
      q.processAllAvailable()
      val all = spark.table("expiring").collect()
      assert(all.length == 2, s"expected timeout emission, got ${all.length}")
      val timedOut = all.map(r => (r.getLong(0), r.getLong(3), r.getDouble(4))).toSet
      assert(timedOut.contains((1L, 1L, 4.0)), s"got $timedOut")
    } finally q.stop()
  }

  test("late cross-batch event extends the open session BACKWARDS (batch-equivalent)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    def ev(id: Long, user: Long, hm: String, v: Double) =
      Event(id, Timestamp.valueOf(s"2024-01-01 $hm:00"), user, "click", v)

    val q = expiringSessions(mem.toDS(), gapSeconds = 1800, watermark = "2 hours")
      .writeStream.format("memory").queryName("latesess")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // batch 1: open session at 10:00
      mem.addData(ev(1, 1L, "10:00", 1.0))
      q.processAllAvailable()
      // batch 2: a LATE event at 09:45 — within the gap of the open
      // session's START, so it must merge and LOWER session_start
      // (the old guard kept start at 10:00)
      mem.addData(ev(2, 1L, "09:45", 2.0))
      q.processAllAvailable()
      // batch 3: far-future same-user event closes the session in-handler
      mem.addData(ev(3, 1L, "13:00", 0.0))
      q.processAllAvailable()
      val rows = spark.table("latesess")
        .select("session_start", "n_events").collect()
      assert(rows.length == 1)
      assert(rows.head.getTimestamp(0).toString.startsWith("2024-01-01 09:45:00"),
        s"late event did not extend the session backwards: ${rows.toSeq}")
      assert(rows.head.getLong(1) == 2L)
    } finally q.stop()
  }

  test("late DISJOINT cross-batch event closes as its own session, not absorbed") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    def ev(id: Long, user: Long, hm: String, v: Double) =
      Event(id, Timestamp.valueOf(s"2024-01-01 $hm:00"), user, "click", v)

    val q = expiringSessions(mem.toDS(), gapSeconds = 1800, watermark = "6 hours")
      .writeStream.format("memory").queryName("latedisj")
      .outputMode(OutputMode.Append())
      .start()
    try {
      mem.addData(ev(1, 1L, "10:00", 1.0))
      q.processAllAvailable()
      // batch 2: a late event a full 3 HOURS before the open session —
      // batch semantics puts it in its own session; single-open-session
      // state used to fold it into [10:00] and inflate n_events
      mem.addData(ev(2, 1L, "07:00", 2.0))
      q.processAllAvailable()
      // sessions close only when the WATERMARK proves them final (no
      // in-handler force-close) — walk it forward past each deadline
      Seq("14:00", "18:00", "22:00").zipWithIndex.foreach { case (hm, i) =>
        mem.addData(ev(10 + i, 1L, hm, 0.0)); q.processAllAvailable()
      }
      val rows = spark.table("latedisj")
        .select("session_start", "n_events").collect()
        .map(r => (r.getTimestamp(0).toString.take(19), r.getLong(1)))
        .sortBy(_._1).toSeq
      // the first watermark-walking helper (14:00) expires too once the
      // watermark reaches 16:00 — the late 07:00 event stays its OWN
      // session and 10:00 keeps n_events=1 (no absorption)
      assert(rows === Seq(("2024-01-01 07:00:00", 1L), ("2024-01-01 10:00:00", 1L),
        ("2024-01-01 14:00:00", 1L)), s"got $rows")
    } finally q.stop()
  }

  test("session gap compares in MICROSECONDS: a 10.0008s delta splits at gap 10s") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    def at(id: Long, t: String) =
      Event(id, Timestamp.valueOf(t), 1L, "click", 1.0)
    val q = expiringSessions(mem.toDS(), gapSeconds = 10, watermark = "1 minute")
      .writeStream.format("memory").queryName("microgap")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // true delta 10.0008 s > gap — millisecond truncation saw exactly
      // 10000 ms and wrongly merged them into one session
      mem.addData(
        at(1, "2024-01-01 10:00:00.0001"),
        at(2, "2024-01-01 10:00:10.0009"))
      q.processAllAvailable()
      mem.addData(at(3, "2024-01-01 10:30:00")) // advance the watermark
      q.processAllAvailable()
      mem.addData(at(4, "2024-01-01 11:00:00"))
      q.processAllAvailable()
      val rows = spark.table("microgap")
        .filter($"session_start" < Timestamp.valueOf("2024-01-01 10:05:00"))
        .select("session_start", "n_events").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getTimestamp(0).getNanos, r.getLong(1)))
      assert(rows.length === 2, s"expected two sessions, got ${rows.toSeq}")
      // emitted bounds keep their microseconds
      assert(rows.map(_._2).toSet === Set(100000, 900000))
    } finally q.stop()
  }

  test("mapGroupsWithState: running totals accumulate across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    def ev(id: Long, user: Long, v: Double) =
      Event(id, Timestamp.valueOf("2024-01-01 00:00:00"), user, "click", v)
    mem.addData(ev(1, 7, 1.5), ev(2, 7, 2.5), ev(3, 8, 10.0))
    mem.addData(ev(4, 7, 6.0))

    val q = runningUserTotals(mem.toDS())
      .writeStream.format("memory").queryName("totals")
      .outputMode(OutputMode.Update())
      .start()
    try {
      q.processAllAvailable()
      // last update per user wins: user 7 saw 3 events total 10.0
      val last = spark.table("totals")
        .groupBy("user_id").agg(max("n_events").as("n"), max("total_value").as("v"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(last(7L) == ((3L, 10.0)))
      assert(last(8L) == ((1L, 10.0)))
    } finally q.stop()
  }

  test("transformWithState + event-time timers: sessions emit once on expiry") {
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Event]
      def ev(id: Long, user: Long, hm: String, v: Double) =
        Event(id, Timestamp.valueOf(s"2024-01-01 $hm:00"), user, "click", v)

      val q = expiringSessionsTws(mem.toDS(), gapSeconds = 1800, watermark = "10 minutes")
        .writeStream.format("memory").queryName("tws_sessions")
        .outputMode(OutputMode.Append())
        .start()
      try {
        // batch 1: open session for user 1
        mem.addData(ev(1, 1L, "10:00", 1.0), ev(2, 1L, "10:05", 2.0))
        q.processAllAvailable()
        assert(spark.table("tws_sessions").count() == 0)

        // batch 2: same user far past the gap — old session closes in-handler
        mem.addData(ev(3, 1L, "12:00", 4.0))
        q.processAllAvailable()
        val first = spark.table("tws_sessions").collect()
        assert(first.length == 1)
        assert(first.head.getLong(3) == 2L && first.head.getDouble(4) == 3.0)

        // batch 3: unrelated user pushes the watermark past 12:30 — the
        // open session's TIMER fires without any new user-1 event
        mem.addData(ev(4, 99L, "13:30", 0.5))
        q.processAllAvailable()
        val all = spark.table("tws_sessions").collect()
        assert(all.length == 2, s"expected timer emission, got ${all.length}")
        val closed = all.map(r => (r.getLong(0), r.getLong(3), r.getDouble(4))).toSet
        assert(closed.contains((1L, 1L, 4.0)), s"got $closed")
      } finally q.stop()
    } finally {
      before match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("transformWithState: multi-variable keyed state accumulates across batches") {
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Event]
      def ev(id: Long, user: Long, typ: String, v: Double) =
        Event(id, Timestamp.valueOf("2024-01-01 00:00:00"), user, typ, v)
      mem.addData(ev(1, 7, "click", 1.5), ev(2, 7, "view", 2.5), ev(3, 8, "click", 10.0))
      mem.addData(ev(4, 7, "click", 6.0))

      val q = userProfiles(mem.toDS())
        .writeStream.format("memory").queryName("profiles")
        .outputMode(OutputMode.Update())
        .start()
      try {
        q.processAllAvailable()
        // latest update per user: ValueState totals + MapState type counts
        val last = spark.table("profiles")
          .orderBy(desc("n_events")).collect()
          .groupBy(_.getLong(0)).map { case (u, rs) =>
            u -> (rs.head.getLong(1), rs.head.getDouble(2), rs.head.getString(3))
          }
        assert(last(7L) == ((3L, 10.0, "click:2,view:1")))
        assert(last(8L) == ((1L, 10.0, "click:1")))
      } finally q.stop()
    } finally {
      before match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("timestamp<->micros roundtrip is exact on both sides of the epoch") {
    // truncating division rounded pre-epoch seconds toward zero (micros
    // ~1s too high) and handed setNanos a negative argument on the way
    // back — floorDiv/floorMod semantics make the roundtrip exact
    val cases = Seq(
      0L, 1L, -1L, 999999L, -999999L, 1718000000123456L,
      -1718000000123456L, -500000L, 1000000L, -1000000L)
    cases.foreach { us =>
      val ts = EventStreams.microsTs(us)
      assert(ts.getNanos >= 0, s"negative nanos for $us")
      assert(EventStreams.tsMicros(ts) === us, s"roundtrip broke for $us")
    }
    // and from the Timestamp side: -0.5 s
    val preEpoch = new java.sql.Timestamp(-500L)
    assert(EventStreams.tsMicros(preEpoch) === -500000L)
  }
}
