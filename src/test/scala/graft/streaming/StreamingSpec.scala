package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming execution of the EventStreams transforms: incremental
  * aggregation, watermark-driven late-data drop, and the custom
  * flatMapGroupsWithState sessionizer — the paths the batch twins
  * (q41-q43) can't exercise. */
class StreamingSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** Run `body` with the RocksDB state-store provider on the session
    * (required by transformWithState; the at-scale backend for the other
    * stateful ops), restoring the prior provider afterwards. */
  private def withRocksDBProvider(body: => Unit): Unit = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("hourlyByType aggregates incrementally over a memory stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.hourlyByType(events)
      .writeStream.format("memory").queryName("hourly_t")
      .outputMode("complete").start()
    try {
      mem.addData((ts("2024-01-01 10:05:00"), "view", 1.0),
        (ts("2024-01-01 10:55:00"), "view", 2.0),
        (ts("2024-01-01 11:05:00"), "click", 5.0))
      q.processAllAvailable()
      val out = spark.table("hourly_t").orderBy("hour", "event_type")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(out.toSeq == Seq(
        ("2024-01-01 10:00:00", "view", 2L, 3.0),
        ("2024-01-01 11:00:00", "click", 1L, 5.0)))
      // second micro-batch updates the same window's state
      mem.addData((ts("2024-01-01 10:30:00"), "view", 10.0))
      q.processAllAvailable()
      val upd = spark.table("hourly_t")
        .filter(col("hour") === "2024-01-01 10:00:00").collect()
      assert(upd.head.getLong(2) == 3L && upd.head.getDouble(3) == 13.0)
    } finally q.stop()
  }

  test("watermark drops late data in append mode") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val q = EventStreams.hourlyByType(mem.toDF().toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("late_t")
      .outputMode("append").start()
    try {
      mem.addData((ts("2024-01-01 10:10:00"), "view", 1.0))
      q.processAllAvailable()
      // advance event time far past the 2h watermark → closes the 10:00 window
      mem.addData((ts("2024-01-01 15:00:00"), "view", 1.0))
      q.processAllAvailable()
      // this event is >2h behind the watermark → must be dropped
      mem.addData((ts("2024-01-01 10:20:00"), "view", 100.0))
      q.processAllAvailable()
      mem.addData((ts("2024-01-01 20:00:00"), "view", 1.0))
      q.processAllAvailable()
      val out = spark.table("late_t")
        .filter(col("hour") === "2024-01-01 10:00:00").collect()
      assert(out.length == 1)
      assert(out.head.getLong(2) == 1L, "late event must not be counted")
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionizer emits closed sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Event]
    val q = EventStreams.sessionize(mem.toDS(), gapMs = 30 * 60 * 1000)
      .writeStream.format("memory").queryName("sessions_t")
      .outputMode("append").start()
    try {
      // user 1: two events 10 min apart (one session), then a 2h gap
      mem.addData(
        EventStreams.Event(1L, ts("2024-01-01 10:00:00"), 1.0),
        EventStreams.Event(1L, ts("2024-01-01 10:10:00"), 2.0))
      q.processAllAvailable()
      mem.addData(EventStreams.Event(1L, ts("2024-01-01 12:30:00"), 5.0))
      q.processAllAvailable()
      val out = spark.table("sessions_t").orderBy("start").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getInt(2), r.getDouble(3)))
      assert(out.contains((1L, "2024-01-01 10:00:00.0", 2, 3.0)),
        s"first session should have closed; got ${out.toSeq}")
    } finally q.stop()
  }

  test("sessionizer runs unchanged on the RocksDB state store — the " +
    "at-scale state backend") {
    // The default HDFS-backed store keeps every key's state ON HEAP —
    // fine per-task locally, an OOM at 100 TB streaming state. RocksDB
    // keeps state off-heap/on-disk with incremental checkpointing; the
    // provider is a pure config swap, so the same stateful transform must
    // produce identical sessions. This pins that none of our state logic
    // accidentally depends on the default provider's semantics (e.g.
    // object identity across get/put — RocksDB round-trips through bytes).
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDBProvider {
      val mem = MemoryStream[EventStreams.Event]
      val q = EventStreams.sessionize(mem.toDS(), gapMs = 30 * 60 * 1000)
        .writeStream.format("memory").queryName("sessions_rocks_t")
        .outputMode("append").start()
      try {
        mem.addData(
          EventStreams.Event(1L, ts("2024-01-01 10:00:00"), 1.0),
          EventStreams.Event(1L, ts("2024-01-01 10:10:00"), 2.0))
        q.processAllAvailable()
        mem.addData(EventStreams.Event(1L, ts("2024-01-01 12:30:00"), 5.0))
        q.processAllAvailable()
        val out = spark.table("sessions_rocks_t").orderBy("start").collect()
          .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getInt(2), r.getDouble(3)))
        assert(out.contains((1L, "2024-01-01 10:00:00.0", 2, 3.0)),
          s"RocksDB-backed run must close the same session; got ${out.toSeq}")
      } finally q.stop()
    }
  }

  test("transformWithState sessionizer matches the flatMapGroupsWithState " +
    "contract on the same input") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // transformWithState supports ONLY the RocksDB provider
    withRocksDBProvider {
      val mem = MemoryStream[EventStreams.Event]
      val q = EventStreams.sessionizeTws(mem.toDS(), gapMs = 30 * 60 * 1000)
        .writeStream.format("memory").queryName("sessions_tws_t")
        .outputMode("append").start()
      try {
        mem.addData(
          EventStreams.Event(1L, ts("2024-01-01 10:00:00"), 1.0),
          EventStreams.Event(1L, ts("2024-01-01 10:10:00"), 2.0))
        q.processAllAvailable()
        // a 2h-later event closes the first session (gap exceeded)
        mem.addData(EventStreams.Event(1L, ts("2024-01-01 12:30:00"), 5.0))
        q.processAllAvailable()
        val out = spark.table("sessions_tws_t").orderBy("start").collect()
          .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getInt(2), r.getDouble(3)))
        assert(out.contains((1L, "2024-01-01 10:00:00.0", 2, 3.0)),
          s"first session should have closed; got ${out.toSeq}")
      } finally q.stop()
    }
  }

  test("replay sessionizer: out-of-order arrival emits the sessions the " +
    "in-order run emits (late event + bridge merge across micro-batches)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // gap 30 min. True event times for user 1: 10:00, 10:20, 10:40 — ONE
    // session (each adjacent pair ≤ 30 min) — then 13:30 opens another.
    // Replay order delivers 10:00 and 10:40 first (provisionally TWO
    // intervals: 40 min apart), then 10:20 late in a later micro-batch,
    // bridging them — the merge the in-order-only processor cannot do.
    def run(name: String)(batches: Seq[EventStreams.Event]*): Seq[(Long, String, Int, Double)] = {
      withRocksDBProvider {
        val mem = MemoryStream[EventStreams.Event]
        val q = EventStreams.sessionizeReplay(mem.toDS(), gapMs = 30 * 60 * 1000)
          .writeStream.format("memory").queryName(name)
          .outputMode("append").start()
        try {
          batches.foreach { b => mem.addData(b); q.processAllAvailable() }
          // empty nudge batches let the advanced watermark fire the timers
          q.processAllAvailable()
        } finally q.stop()
      }
      spark.table(name).orderBy("start").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getInt(2), r.getDouble(3)))
        .toSeq
    }
    val e = (h: String, v: Double) => EventStreams.Event(1L, ts(s"2024-01-01 $h"), v)
    val outOfOrder = run("replay_ooo_t")(
      Seq(e("10:00:00", 1.0), e("10:40:00", 4.0)),
      Seq(e("10:20:00", 2.0)), // late bridge, well within the 2h watermark
      Seq(e("13:30:00", 8.0)), // advances wm to 11:30 > 10:40 + gap
      Seq(e("16:30:00", 0.5))) // advances wm to 14:30 > 13:30 + gap
    val inOrder = run("replay_ord_t")(
      Seq(e("10:00:00", 1.0), e("10:20:00", 2.0)),
      Seq(e("10:40:00", 4.0)),
      Seq(e("13:30:00", 8.0)),
      Seq(e("16:30:00", 0.5)))
    assert(outOfOrder == inOrder,
      s"replay must converge: ooo=$outOfOrder in-order=$inOrder")
    assert(outOfOrder.contains((1L, "2024-01-01 10:00:00.0", 3, 7.0)),
      s"bridged session must merge to n=3 sum=7.0; got $outOfOrder")
    assert(outOfOrder.contains((1L, "2024-01-01 13:30:00.0", 1, 8.0)),
      s"second session must close once the watermark passes; got $outOfOrder")
  }

  test("replay sessionizer: a watermark landing EXACTLY on a close boundary " +
    "neither leaks the session nor splits it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // gap 30 min, watermark delay 2 h. u1's interval ends 10:30, so its
    // close boundary is 11:00, and u2@13:00 advances the watermark to
    // EXACTLY 11:00. The strict close condition (lastTs + gap < wm) keeps
    // the interval open at equality — which is only sound because store()
    // floors the re-armed timer past the watermark; without that floor the
    // re-registered 11:00 timer (a time the watermark already reached)
    // never fires and the session leaks in state forever. The event at
    // ts == 11:00 probes the other side: Spark's transformWithState late
    // filter drops rows at the watermark, so nothing at or before the
    // boundary can re-open the session once it closes — one session out,
    // exactly once, with exactly the pre-boundary rows.
    withRocksDBProvider {
      val mem = MemoryStream[EventStreams.Event]
      val q = EventStreams.sessionizeReplay(mem.toDS(), gapMs = 30 * 60 * 1000)
        .writeStream.format("memory").queryName("replay_boundary_t")
        .outputMode("append").start()
      try {
        val e = (u: Long, h: String, v: Double) =>
          EventStreams.Event(u, ts(s"2024-01-01 $h"), v)
        Seq(
          Seq(e(1L, "10:30:00", 1.0)),
          Seq(e(2L, "13:00:00", 0.25)), // wm -> exactly 11:00:00 (boundary)
          Seq(e(1L, "11:00:00", 2.0)),  // ts == wm: engine-dropped as late
          Seq(e(2L, "16:00:00", 0.5)),  // wm -> 14:00 must close u1 + u2@13
          Seq(e(2L, "19:00:00", 0.5))   // wm -> 17:00 closes u2@16
        ).foreach { b => mem.addData(b); q.processAllAvailable() }
        q.processAllAvailable()
      } finally q.stop()
    }
    val u1 = spark.table("replay_boundary_t").orderBy("start").collect()
      .filter(_.getLong(0) == 1L)
      .map(r => (r.getTimestamp(1).toString, r.getInt(2), r.getDouble(3)))
      .toSeq
    assert(u1 == Seq(("2024-01-01 10:30:00.0", 1, 1.0)),
      s"boundary session must emit exactly once with pre-boundary rows, got $u1")
  }

  test("bootstrap sessionizer: initial state seeded from a batch snapshot " +
    "yields the sessions a full-history replay yields — extension across " +
    "the cutover, closure of idle seeds, no double-count") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val e = (u: Long, h: String, v: Double) =>
      EventStreams.Event(u, ts(s"2024-01-01 $h"), v)
    // gap 30 min. Full history:
    //   user 1: 10:00, 10:10 (pre-cutover) + 10:30 (post) -> ONE session n=3
    //   user 2: 10:05 (pre-cutover only, idle after)      -> ONE session n=1
    //   user 3: 11:00 (post-cutover only)                 -> ONE session n=1
    // Cutover at 10:15: the batch snapshot carries users 1 and 2 as open.
    val pre = Seq(e(1L, "10:00:00", 1.0), e(1L, "10:10:00", 2.0),
      e(2L, "10:05:00", 7.0))
    val post = Seq(e(1L, "10:30:00", 4.0), e(3L, "11:00:00", 9.0))
    val closer = Seq(e(9L, "16:00:00", 0.1)) // advances wm past every close
    def collectSessions(name: String): Seq[(Long, String, Int, Double)] =
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getInt(2),
          r.getDouble(3))).toSeq.sorted
    // reference: the whole history through the replay sessionizer
    withRocksDBProvider {
      val mem = MemoryStream[EventStreams.Event]
      val q = EventStreams.sessionizeReplay(mem.toDS(), gapMs = 30 * 60 * 1000)
        .writeStream.format("memory").queryName("boot_ref_t")
        .outputMode("append").start()
      try {
        Seq(pre, post, closer).foreach { b => mem.addData(b); q.processAllAvailable() }
        q.processAllAvailable()
      } finally q.stop()
    }
    // cutover: batch-sessionize the pre-cutover history driver-side into
    // the open-session snapshot, then stream ONLY the post-cutover events
    val snapshot = pre.groupBy(_.user_id).toSeq.map { case (u, evs) =>
      val sorted = evs.sortBy(_.ts.getTime)
      EventStreams.BootstrapSession(u, sorted.head.ts.getTime,
        sorted.last.ts.getTime, sorted.size, sorted.map(_.value).sum)
    }
    withRocksDBProvider {
      val mem = MemoryStream[EventStreams.Event]
      val q = EventStreams.sessionizeBootstrap(mem.toDS(),
          gapMs = 30 * 60 * 1000, snapshot.toDS())
        .writeStream.format("memory").queryName("boot_cut_t")
        .outputMode("append").start()
      try {
        Seq(post, closer).foreach { b => mem.addData(b); q.processAllAvailable() }
        q.processAllAvailable()
      } finally q.stop()
    }
    val ref = collectSessions("boot_ref_t")
    val cut = collectSessions("boot_cut_t")
    assert(ref.nonEmpty && cut == ref,
      s"bootstrap must match full-history replay: ref=$ref cut=$cut")
    // the load-bearing cases, stated explicitly: cross-cutover extension
    // (n=3, not a fresh n=1 session) and idle-seed closure (user 2)
    assert(cut.contains((1L, "2024-01-01 10:00:00.0", 3, 7.0)), s"got $cut")
    assert(cut.contains((2L, "2024-01-01 10:05:00.0", 1, 7.0)), s"got $cut")
  }

  test("ListState last-N buffer: window aggregates are exact and state " +
    "stays bounded across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDBProvider {
      val mem = MemoryStream[EventStreams.Event]
      val q = EventStreams.recentWindow(mem.toDS(), n = 3)
        .writeStream.format("memory").queryName("recent_t")
        .outputMode("append").start()
      try {
        mem.addData(
          EventStreams.Event(1L, ts("2024-01-01 10:00:00"), 1.0),
          EventStreams.Event(1L, ts("2024-01-01 10:01:00"), 2.0))
        q.processAllAvailable()
        // second batch: buffer carries over; 4th event must evict the 1st
        mem.addData(
          EventStreams.Event(1L, ts("2024-01-01 10:02:00"), 4.0),
          EventStreams.Event(1L, ts("2024-01-01 10:03:00"), 8.0))
        q.processAllAvailable()
        val out = spark.table("recent_t").orderBy("ts").collect()
          .map(r => (r.getInt(2), r.getDouble(3)))
        // windows: [1], [1,2], [1,2,4], [2,4,8] — the last is n-capped
        assert(out.toSeq == Seq((1, 1.0), (2, 3.0), (3, 7.0), (3, 14.0)),
          s"got ${out.toSeq}")
      } finally q.stop()
    }
  }

  test("MapState profile: per-type counters update in place across " +
    "micro-batches and distinct-type cardinality grows monotonically") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDBProvider {
      val mem = MemoryStream[EventStreams.TypedEvent]
      val q = EventStreams.typeProfile(mem.toDS())
        .writeStream.format("memory").queryName("profile_t")
        .outputMode("append").start()
      try {
        mem.addData(
          EventStreams.TypedEvent(1L, ts("2024-01-01 10:00:00"), "view"),
          EventStreams.TypedEvent(1L, ts("2024-01-01 10:01:00"), "view"))
        q.processAllAvailable()
        mem.addData(
          EventStreams.TypedEvent(1L, ts("2024-01-01 10:02:00"), "click"),
          EventStreams.TypedEvent(1L, ts("2024-01-01 10:03:00"), "view"))
        q.processAllAvailable()
        val out = spark.table("profile_t").orderBy("ts").collect()
          .map(r => (r.getString(2), r.getLong(3), r.getInt(4)))
        assert(out.toSeq == Seq(
          ("view", 1L, 1), ("view", 2L, 1),   // batch 1
          ("click", 1L, 2), ("view", 3L, 2)), // batch 2: state carried over
          s"got ${out.toSeq}")
      } finally q.stop()
    }
  }

  test("streaming dedup drops cross-batch duplicates within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val q = EventStreams.dedupEvents(mem.toDF().toDF("event_id", "ts", "value"))
      .writeStream.format("memory").queryName("dedup_t")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts("2024-01-01 10:00:00"), 1.0),
        (1L, ts("2024-01-01 10:00:00"), 1.0), // same-batch duplicate
        (2L, ts("2024-01-01 10:05:00"), 2.0))
      q.processAllAvailable()
      // cross-batch replay of event 1 while its state is live → dropped
      mem.addData((1L, ts("2024-01-01 10:00:00"), 1.0),
        (3L, ts("2024-01-01 10:10:00"), 3.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_t").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L),
        s"each event_id must survive exactly once, got ${ids.toSeq}")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups re-deliveries and evicts by event time") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val q = EventStreams.dedupEventsWithinWatermark(
      mem.toDF().toDF("event_id", "ts", "value"))
      .writeStream.format("memory").queryName("dedup_wm_t")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts("2024-01-01 10:00:00"), 1.0),
        (2L, ts("2024-01-01 10:05:00"), 2.0))
      q.processAllAvailable()
      // at-least-once re-delivery inside the 2h horizon → dropped
      mem.addData((1L, ts("2024-01-01 10:20:00"), 1.0))
      q.processAllAvailable()
      assert(spark.table("dedup_wm_t").count() == 2)
      // advance event time far past the horizon, then REUSE key 1: its
      // state was evicted, so the new occurrence survives (the contract
      // difference vs dropDuplicates, which would still drop it)
      mem.addData((9L, ts("2024-01-02 10:00:00"), 0.0))
      q.processAllAvailable()
      mem.addData((1L, ts("2024-01-02 09:00:00"), 5.0))
      q.processAllAvailable()
      val n1 = spark.table("dedup_wm_t")
        .filter($"event_id" === 1L).count()
      assert(n1 == 2, s"key 1 must reappear after eviction, got $n1")
    } finally q.stop()
  }

  test("left-outer stream-stream join emits unconverted views after the horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val vMem = MemoryStream[(Long, Long, Timestamp)]
    val cMem = MemoryStream[(Long, Long, Timestamp)]
    val q = EventStreams.attributedClicksOuter(
      vMem.toDF().toDF("event_id", "user_id", "ts"),
      cMem.toDF().toDF("event_id", "user_id", "ts"))
      .writeStream.format("memory").queryName("attr_outer_t")
      .outputMode("append").start()
    try {
      vMem.addData((100L, 1L, ts("2024-01-01 10:00:00")), // will convert
        (101L, 2L, ts("2024-01-01 10:00:00")))            // never converts
      cMem.addData((200L, 1L, ts("2024-01-01 10:30:00")))
      q.processAllAvailable()
      // watermark far enough that view 101's match window is provably closed
      vMem.addData((110L, 9L, ts("2024-01-01 20:00:00")))
      cMem.addData((210L, 9L, ts("2024-01-01 20:00:00")))
      q.processAllAvailable()
      val rows = spark.table("attr_outer_t")
        .select("view_id", "click_id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
      assert(rows.get(100L).contains(Some(200L)), s"matched view, got $rows")
      assert(rows.get(101L).contains(None),
        s"unconverted view must emit null-padded after the horizon, got $rows")
    } finally q.stop()
  }

  test("stream-stream interval join attributes clicks to preceding views") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val vMem = MemoryStream[(Long, Long, Timestamp)]
    val cMem = MemoryStream[(Long, Long, Timestamp)]
    val q = EventStreams.attributedClicks(
      vMem.toDF().toDF("event_id", "user_id", "ts"),
      cMem.toDF().toDF("event_id", "user_id", "ts"))
      .writeStream.format("memory").queryName("attr_t")
      .outputMode("append").start()
    try {
      vMem.addData((100L, 1L, ts("2024-01-01 10:00:00")),
        (101L, 2L, ts("2024-01-01 10:00:00")))
      cMem.addData(
        (200L, 1L, ts("2024-01-01 10:30:00")), // within the hour → match
        (201L, 1L, ts("2024-01-01 12:00:00")), // outside → no match
        (202L, 3L, ts("2024-01-01 10:10:00"))) // other user → no match
      q.processAllAvailable()
      // advance both watermarks so joined rows emit in append mode
      vMem.addData((110L, 9L, ts("2024-01-01 20:00:00")))
      cMem.addData((210L, 9L, ts("2024-01-01 20:00:00")))
      q.processAllAvailable()
      val pairs = spark.table("attr_t")
        .select("view_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((100L, 200L)), s"expected the in-window match, got $pairs")
      assert(!pairs.contains((100L, 201L)) && !pairs.contains((101L, 202L)))
    } finally q.stop()
  }

  test("stream-static join enriches micro-batches from a broadcast dim") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val q = EventStreams.enriched(
        mem.toDF().toDF("user_id", "ts", "value"), dim)
      .writeStream.format("memory").queryName("enrich_t")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts("2024-01-01 10:00:00"), 1.0),
        (2L, ts("2024-01-01 10:01:00"), 2.0),
        (9L, ts("2024-01-01 10:02:00"), 3.0)) // not in dim → tier null
      q.processAllAvailable()
      val out = spark.table("enrich_t").select("user_id", "tier")
        .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
      assert(out == Set((1L, Some("gold")), (2L, Some("basic")), (9L, None)))
    } finally q.stop()
  }

  test("streaming admission gate: a near-copy hits the standing band index, " +
    "novel docs admit clean via the per-batch anti-join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // standing corpus: two docs; its band index is the batch-built artifact
    val standing = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "data pipelines shuffle partitions across executors with broadcast joins"))
      .toDF("doc_id", "text")
    val index = EventStreams.bandKeys(standing)
    // stream: 100 is a near-copy of doc 1 (one word changed → shares bands),
    // 101/102 are novel
    val mem = MemoryStream[(Long, String)]
    val admitted = scala.collection.mutable.Set[Long]()
    val suspects = scala.collection.mutable.Set[(Long, Long)]()
    val q = EventStreams.admissionCandidates(
        mem.toDF().toDF("doc_id", "text"), index)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        suspects ++= batch.select("doc_id", "hit_id").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        ()
      }.start()
    val docs = Seq(
      100L -> "the quick brown fox jumps over the lazy dog again and again tonight",
      101L -> "completely unrelated content about cooking pasta with fresh tomatoes basil",
      102L -> "orbital mechanics requires delta v budgets for interplanetary transfer windows")
    mem.addData(docs: _*)
    q.processAllAvailable()
    q.stop()
    // admission = the batch anti-joined against its candidate doc_ids
    val hitIds = suspects.map(_._1)
    admitted ++= docs.map(_._1).filterNot(hitIds)
    assert(suspects.nonEmpty && suspects.forall(_ == (100L -> 1L)),
      s"only the near-copy may hit, and only against doc 1: $suspects")
    assert(admitted == Set(101L, 102L))
  }

  test("foreachBatch sink applies per-batch upserts to an external store") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // a driver-side "store" standing in for any idempotent-upsert target
    val store = scala.collection.concurrent.TrieMap[Long, Double]()
    val mem = MemoryStream[(Long, Double)]
    val q = mem.toDF().toDF("user_id", "value")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.groupBy("user_id")
          .agg(sum(col("value").cast("decimal(38,6)")).cast("double").as("v"))
          .collect().foreach { r =>
            val k = r.getLong(0)
            store(k) = store.getOrElse(k, 0.0) + r.getDouble(1)
          }
      }
      .start()
    try {
      mem.addData((1L, 1.0), (1L, 2.0), (2L, 5.0))
      q.processAllAvailable()
      mem.addData((1L, 10.0))
      q.processAllAvailable()
      assert(store.toMap == Map(1L -> 13.0, 2L -> 5.0))
    } finally q.stop()
  }

  test("exactly-once TxLog sink: re-delivered micro-batches commit exactly " +
    "once, across queries and within a race") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val table = tmpDir("txsink")
    def run(data: Seq[(Long, String)]): Unit = {
      val mem = MemoryStream[(Long, String)]
      val q = mem.toDF().toDF("k", "s").writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          graft.sources.TxLog.appendBatch(spark, batch, table, id)
          ()
        }.start()
      try { mem.addData(data: _*); q.processAllAvailable() } finally q.stop()
    }
    run(Seq(1L -> "a", 2L -> "b"))
    // a fresh query RESTARTS batch numbering at 0 — the same batch id
    // re-delivers with the same content after a crash/restart; the sink
    // must recognize it and not double-append
    run(Seq(1L -> "a", 2L -> "b"))
    val rows = graft.sources.TxLog.read(spark, table)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(rows == Seq(1L, 2L), s"batch 0 must land once, got $rows")
    // direct replay check, plus the version is stable
    val v1 = graft.sources.TxLog.committedBatch(table, 0L)
    assert(v1.contains(1))
    val again = graft.sources.TxLog.appendBatch(spark,
      Seq(9L -> "x").toDF("k", "s"), table, batchId = 0L)
    assert(again == 1, "replayed batch id returns the original version")
    assert(graft.sources.TxLog.read(spark, table).count() == 2)
  }

  test("end-to-end: file source through a transform into the DSv2 staging sink") {
    import spark.implicits._
    // both custom edges in ONE streaming job: parquet file source →
    // map-side cleanse → epoch-committed StagedFdicSource sink
    val src = tmpDir("e2e_src")
    val dst = tmpDir("e2e_dst")
    val ckpt = tmpDir("e2e_ckpt")
    Seq((ts("2024-01-01 10:05:00"), "view", 4.25),
      (ts("2024-01-01 10:06:00"), "click", 1.5))
      .toDF("ts", "event_type", "value")
      .write.mode("overwrite").parquet(src)
    val q = spark.readStream
      .schema("ts TIMESTAMP, event_type STRING, value DOUBLE").parquet(src)
      .selectExpr("upper(event_type) AS ETYPE",
        "CAST(CAST(value * 100 AS BIGINT) AS STRING) AS CENTS")
      .writeStream.format(classOf[graft.sources.v2.StagedFdicSource].getName)
      .option("path", dst).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    q.processAllAvailable()
    // second batch arrives as a new file → new epoch, appended
    Seq((ts("2024-01-01 10:07:00"), "view", 2.0))
      .toDF("ts", "event_type", "value").write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    val back = spark.read
      .format(classOf[graft.sources.v2.StagedFdicSource].getName)
      .option("fields", "ETYPE,CENTS").load(dst)
    assert(back.orderBy("CENTS").collect().map(r =>
      (r.getString(0), r.getString(1))).toSeq ===
      Seq(("CLICK", "150"), ("VIEW", "200"), ("VIEW", "425")))
  }

  test("file-source stream produces the batch-identical hourly result") {
    import spark.implicits._
    val dir = tmpDir("stream_src")
    val batch = Seq(
      (ts("2024-01-01 10:05:00"), "view", 1.0),
      (ts("2024-01-01 11:05:00"), "view", 2.0)).toDF("ts", "event_type", "value")
    batch.write.mode("overwrite").parquet(dir)
    EventStreams.runFileStream(spark, dir,
      "ts TIMESTAMP, event_type STRING, value DOUBLE",
      EventStreams.hourlyByType, "file_hourly")
    val streamRows = spark.table("file_hourly").orderBy("hour").collect().toSeq
    val batchRows = EventStreams.hourlyByType(batch).orderBy("hour").collect().toSeq
    assert(streamRows == batchRows)
  }

  test("streaming incremental curation: the probe -> admit -> two-table TxLog " +
    "commit loop grows the index batch over batch, ignores a restart replay, " +
    "and converges after a mid-commit crash") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.TxLog
    val root = tmpDir("stream_cur")
    val corpusT = s"$root/admitted"
    val indexT = s"$root/band_index"
    // standing corpus + its band index, the batch-built d189 artifacts
    val seed = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "data pipelines shuffle partitions across executors with broadcast joins"))
      .toDF("doc_id", "text")
    TxLog.append(spark, seed, corpusT)
    TxLog.append(spark, EventStreams.bandKeys(seed), indexT)
    // the foreachBatch body — q313's admission stage as a continuous loop.
    // Each micro-batch probes the CURRENT index (read inside the batch, so
    // prior commits are visible), admits the miss set, and commits BOTH the
    // docs and their band keys under the batch id (exactly-once per table).
    def admitBatch(batch: org.apache.spark.sql.DataFrame, id: Long): Unit = {
      val suspects = EventStreams
        .admissionCandidates(batch, TxLog.read(spark, indexT))
        .select("doc_id").distinct()
      val admitted = batch.join(suspects, Seq("doc_id"), "left_anti")
      TxLog.appendBatch(spark, admitted, corpusT, id)
      TxLog.appendBatch(spark, EventStreams.bandKeys(admitted), indexT, id)
    }
    def docSet: Set[Long] = TxLog.read(spark, corpusT)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    def run(batches: Seq[(Long, String)]*): Unit = {
      val mem = MemoryStream[(Long, String)]
      val q = mem.toDF().toDF("doc_id", "text").writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          admitBatch(b, id); () }
        .start()
      try batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
    }
    val b0 = Seq(
      100L -> "the quick brown fox jumps over the lazy dog again and again tonight",
      101L -> "completely unrelated content about cooking pasta with fresh tomatoes basil")
    val b1 = Seq(
      // near-copy of 101 — rejectable ONLY if batch 0's commit grew the index
      200L -> "completely unrelated content about cooking pasta with fresh tomatoes parsley",
      201L -> "orbital mechanics requires delta v budgets for interplanetary transfer windows")
    run(b0, b1)
    assert(docSet == Set(1L, 2L, 101L, 201L),
      s"100 hits the seed index, 200 hits batch 0's admission, got $docSet")
    // restart: a fresh query re-delivers batch ids 0/1 with the same data —
    // both tables already committed those ids, so the replay is a no-op
    val (vCorpus, vIndex) = (TxLog.versions(corpusT).max, TxLog.versions(indexT).max)
    run(b0, b1)
    assert(docSet == Set(1L, 2L, 101L, 201L))
    assert(TxLog.versions(corpusT).max == vCorpus &&
      TxLog.versions(indexT).max == vIndex,
      "a restart replay must not create new versions in either table")
    // mid-commit crash: the corpus append of batch 7 lands, the process dies
    // before the index append. The tables disagree until the source replays
    // the batch: the corpus append is then recognized (no-op) and the index
    // append completes — per-table idempotence gives cross-table convergence.
    val b7 = Seq(300L -> "fresh novel text about glacier formation and moraine deposits in valleys")
      .toDF("doc_id", "text")
    TxLog.appendBatch(spark, b7, corpusT, batchId = 7L)       // ...crash here
    assert(TxLog.committedBatch(indexT, 7L).isEmpty, "index must lag the crash")
    admitBatch(b7, 7L)                                        // the replay
    assert(docSet == Set(1L, 2L, 101L, 201L, 300L))
    assert(TxLog.committedBatch(indexT, 7L).nonEmpty)
    // convergence invariant: the index IS bandKeys(admitted corpus) — no
    // drift in either direction after growth, replay, and crash recovery
    val fromIndex = TxLog.read(spark, indexT)
      .select("doc_id", "band_key").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val fromCorpus = EventStreams.bandKeys(TxLog.read(spark, corpusT))
      .select("doc_id", "band_key").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(fromIndex == fromCorpus)
  }

  test("streaming fresh-index retrieval: a vector admitted in batch N is " +
    "retrievable by the next search with is_fresh, and a restart replay " +
    "creates no posting versions") {
    // s319's admit commit composed into the streaming admission loop
    // (VERDICT r8 directive 4) — the last seam between the streaming and
    // retrieval stacks: the searcher reads (history ∪ streamed batches)
    // through the posting log, so freshness is read-your-writes and
    // exactly-once is appendBatch's, not the spec's.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.TxLog
    import graft.operators.{Similarity, Similarity2}
    val dir = "/root/testdata/sf0.001"
    val root = tmpDir("stream_fresh")
    val postingsT = s"$root/postings"
    val vecs = Similarity.vecs(spark, dir)
    val hist = vecs.select("vec_id", "v")
    // frozen quantizer, committed and READ BACK from the log — the
    // production shape: per-batch admits must not re-derive the quantizer
    TxLog.append(spark, Similarity2.frozenCentroids(hist),
      s"$root/centroids", partFiles = 1)
    TxLog.append(spark, Similarity2.pqCodebook(Similarity2.pqSubOf(hist)),
      s"$root/codebook", partFiles = 1)
    val cent = TxLog.read(spark, s"$root/centroids")
    val cb = TxLog.read(spark, s"$root/codebook")
    TxLog.append(spark, Similarity2.freshAdmitPostings(hist, cent, cb),
      postingsT, partFiles = 2)
    val histVersion = TxLog.versions(postingsT).max

    def search(qid: Long): Seq[(Long, Int)] = {
      val qv = vecs.filter(col("vec_id") === qid)
      val q = qv.select(col("vec_id").as("qid"), col("v"))
      val qsub = Similarity2.pqSubOf(qv).select(col("vec_id").as("qid"),
        col("m").as("qm"), col("sv").as("qsv"))
      Similarity2.ivfpqSearch(q, qsub, cent, cb, TxLog.read(spark, postingsT))
        .collect().map(r => (r.getLong(2), r.getInt(1))).toSeq
    }
    // fresh = committed after the history build — derived from the LOG
    // (version asOf diff), the same read-your-writes channel the searcher
    // uses, not from spec-side bookkeeping
    def freshIds: Set[Long] = {
      val atBuild = TxLog.read(spark, postingsT, Some(histVersion))
        .select("vec_id").collect().map(_.getLong(0)).toSet
      TxLog.read(spark, postingsT)
        .select("vec_id").collect().map(_.getLong(0)).toSet -- atBuild
    }
    def vecOf(id: Long): Seq[Double] = vecs.filter(col("vec_id") === id)
      .head.getAs[scala.collection.Seq[Double]]("v").toVector
    val v42 = vecOf(42L)
    val v17 = vecOf(17L)
    val b0 = Seq(9042L -> v42) // near-copy of 42, new id
    val b1 = Seq(9017L -> v17)
    assert(!search(42L).exists(_._1 == 9042L), "not retrievable pre-admit")

    def run(batches: Seq[(Long, Seq[Double])]*)(between: Int => Unit): Unit = {
      val mem = MemoryStream[(Long, Seq[Double])]
      val q = mem.toDF().toDF("vec_id", "v").writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          EventStreams.admitVectorBatch(b, postingsT, cent, cb, id); () }
        .start()
      try batches.zipWithIndex.foreach { case (b, i) =>
        mem.addData(b: _*); q.processAllAvailable(); between(i)
      } finally q.stop()
    }
    run(b0, b1) {
      case 0 =>
        // the batch-0 admit is visible to a search BETWEEN micro-batches
        val hits = search(42L)
        assert(hits.exists(_._1 == 9042L),
          s"9042 must be retrievable right after its admit, got $hits")
        assert(freshIds.contains(9042L), "9042 must read back as fresh")
        assert(!search(17L).exists(_._1 == 9017L), "9017 not yet admitted")
      case _ =>
        assert(search(17L).exists(_._1 == 9017L),
          "batch 1's vector must be retrievable after batch 1")
    }
    assert(freshIds == Set(9042L, 9017L))
    // restart replay: same batch ids, same data — appendBatch recognizes
    // both commits, no new versions, search results unchanged
    val vMax = TxLog.versions(postingsT).max
    val before42 = search(42L)
    run(b0, b1)((_: Int) => ())
    assert(TxLog.versions(postingsT).max == vMax,
      "a restart replay must not create posting versions")
    assert(search(42L) == before42)
  }
}
