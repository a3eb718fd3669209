package graft

import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Event, Session}
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming transforms driven through MemoryStream micro-batches —
  * watermark advancement and event-time session timeout exercised for real. */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(minute: Int): Timestamp = new Timestamp(1700000000000L + minute * 60000L)

  test("windowed counts aggregate by tumbling window and drop late data") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.windowedCounts(input.toDF())
      .writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(5), 1, "click", 2.0),
        Event(3, ts(12), 2, "view", 3.0))
      q.processAllAvailable()
      // advance watermark far past the first windows so they close
      input.addData(Event(4, ts(120), 3, "click", 4.0))
      q.processAllAvailable()
      // a very late event for the long-closed first window must be dropped
      input.addData(Event(5, ts(1), 9, "click", 99.0))
      q.processAllAvailable()
      val rows = spark.table("win_counts")
        .select($"event_type", $"n").as[(String, Long)].collect().toSet
      assert(rows.contains(("click", 2L))) // the two in-window clicks, late one dropped
      assert(rows.contains(("view", 1L)))
    } finally q.stop()
  }

  test("sliding windows: one event lands in both overlapping windows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.slidingCounts(input.toDF())
      .writeStream.format("memory").queryName("slide_counts")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Event(1, ts(7), 1, "click", 1.0)) // in [0,10) and [5,15)
      q.processAllAvailable()
      input.addData(Event(2, ts(120), 2, "view", 0.0)) // close them
      q.processAllAvailable()
      val rows = spark.table("slide_counts")
        .select($"event_type", $"n").as[(String, Long)].collect()
        .filter(_._1 == "click")
      assert(rows.length == 2 && rows.forall(_._2 == 1L),
        s"expected the click counted in two windows, got ${rows.toSeq}")
    } finally q.stop()
  }

  test("sessionize: late in-watermark event extends, never shrinks, the session") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sess_late")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Event(1, ts(0), 5, "click", 1.0), Event(2, ts(20), 5, "view", 2.0))
      q.processAllAvailable()
      // late event (t=10) arrives in a later batch, still within watermark
      input.addData(Event(3, ts(10), 5, "click", 4.0))
      q.processAllAvailable()
      // push watermark far ahead to close the session
      input.addData(Event(4, ts(600), 6, "view", 0.0))
      q.processAllAvailable()
      input.addData(Event(5, ts(1200), 6, "view", 0.0))
      q.processAllAvailable()
      val s = spark.table("sess_late").as[Session].collect().find(_.user_id == 5).get
      assert(s.n_events == 3 && s.total_value == 7.0)
      assert(s.end_ms - s.start_ms == 20 * 60000L) // end stays at t=20, not t=10
    } finally q.stop()
  }

  test("stream-stream interval join matches clicks to recent purchases") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.clickPurchaseJoin(input.toDF())
      .writeStream.format("memory").queryName("ssjoin")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        Event(1, ts(0), 7, "purchase", 10.0),  // in window for click@30
        Event(2, ts(30), 7, "click", 0.0),
        Event(3, ts(30), 8, "click", 0.0),     // user 8 has no purchase
        Event(4, ts(100), 7, "purchase", 5.0)) // AFTER the click → no match
      q.processAllAvailable()
      val rows = spark.table("ssjoin")
        .select($"click_id", $"purchase_id").as[(Long, Long)].collect().toSet
      assert(rows == Set((2L, 1L)))
    } finally q.stop()
  }

  test("streaming dedup drops re-delivered event_ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.dedupEvents(input.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 1, "view", 2.0))
      q.processAllAvailable()
      // re-deliver id 1 (at-least-once source) + one new event
      input.addData(Event(1, ts(0), 1, "click", 1.0), Event(3, ts(2), 2, "click", 3.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select($"event_id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("streaming heavy hitters: a dominant user is guaranteed into the sketch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.heavyUsers(input.toDF(), k = 4)
      .writeStream.format("memory").queryName("heavy")
      .outputMode(OutputMode.Append).start()
    try {
      // user 7 sends 12 of 18 events in the window — far above N/(k+1)
      val burst = (0 until 12).map(i => Event(100 + i, ts(i % 9), 7, "click", 1.0)) ++
        (0 until 6).map(i => Event(200 + i, ts(i), 20 + i, "view", 1.0))
      input.addData(burst: _*)
      q.processAllAvailable()
      input.addData(Event(999, ts(120), 99, "view", 0.0)) // close the window
      q.processAllAvailable()
      val rows = spark.table("heavy")
        .select($"candidates").as[Seq[String]].collect()
      assert(rows.nonEmpty && rows.exists(_.contains("7")),
        s"dominant user missing from sketch: ${rows.toSeq}")
    } finally q.stop()
  }

  test("streaming CMS window is bit-identical to the batch sketch of the same rows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.frequencySketch(input.toDF(), width = 64, depth = 4)
      .writeStream.format("memory").queryName("freq_sketch")
      .outputMode(OutputMode.Append).start()
    try {
      // all inside one 10' window; micro-batched in two adds so the sketch
      // goes through streaming partial/final merge across batches
      val a = (0 until 9).map(i => Event(300 + i, ts(i % 9), i % 3, "click", 1.0))
      val b = (0 until 7).map(i => Event(400 + i, ts(i % 9), 7, "view", 1.0))
      input.addData(a: _*)
      q.processAllAvailable()
      input.addData(b: _*)
      q.processAllAvailable()
      input.addData(Event(999, ts(120), 99, "view", 0.0)) // close the window
      q.processAllAvailable()
      val streamed = spark.table("freq_sketch")
        .orderBy($"win_start").select($"cms").as[Seq[Long]].collect()
      assert(streamed.nonEmpty)
      // additive counters: the 16 events straddle two tumbling windows
      // (epoch-aligned boundaries), and the ELEMENT-WISE SUM of the closed
      // windows' sketches must be bit-identical to one batch pass over the
      // same rows — the mergeability law, across streaming micro-batches
      val summed = streamed.reduce((x, y) => x.zip(y).map { case (p, q) => p + q })
      val batch = (a ++ b).toDF()
        .agg(graft.functions.CountMinSketch.sketch($"user_id".cast("string"), 64, 4))
        .collect()(0).getSeq[Long](0)
      assert(summed == batch, "summed streamed sketches diverged from batch sketch")
      assert(summed.sum == (a.size + b.size).toLong * 4)
    } finally q.stop()
  }

  test("session_window: declarative sessions merge events within the gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.sessionWindowCounts(input.toDF())
      .writeStream.format("memory").queryName("sess_win")
      .outputMode(OutputMode.Append).start()
    try {
      // two events 20' apart merge into one session; the 2h-later event
      // starts a new one and (with a follow-up) closes the first
      input.addData(Event(1, ts(0), 3, "click", 1.0), Event(2, ts(20), 3, "view", 2.0))
      q.processAllAvailable()
      input.addData(Event(3, ts(180), 3, "click", 9.0))
      q.processAllAvailable()
      input.addData(Event(4, ts(400), 4, "view", 0.0))
      q.processAllAvailable()
      val rows = spark.table("sess_win")
        .select($"user_id", $"n_events", $"total_value",
          $"sess_start".cast("long"), $"sess_end".cast("long"))
        .as[(Long, Long, Double, Long, Long)].collect()
      val first = rows.find(r => r._1 == 3 && r._2 == 2)
      assert(first.isDefined, s"expected closed 2-event session, got ${rows.toSeq}")
      assert(first.get._3 == 3.0)
      // session_window end = last event (t=20') + 30' gap = t=50'
      assert(first.get._5 - first.get._4 == 50 * 60L)
    } finally q.stop()
  }

  test("sessionize closes a session after the inactivity gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // burst of 3 events, then silence; a second burst 2h later both
      // advances the watermark and starts a new session
      input.addData(
        Event(1, ts(0), 7, "click", 1.0),
        Event(2, ts(10), 7, "view", 2.0),
        Event(3, ts(20), 7, "click", 3.0))
      q.processAllAvailable()
      input.addData(Event(4, ts(180), 7, "click", 9.0))
      q.processAllAvailable()
      input.addData(Event(5, ts(400), 8, "view", 1.0)) // push watermark further
      q.processAllAvailable()
      val sessions = spark.table("sessions").as[Session].collect()
      val first = sessions.find(s => s.user_id == 7 && s.n_events == 3)
      assert(first.isDefined, s"expected closed 3-event session, got ${sessions.toSeq}")
      assert(first.get.total_value == 6.0)
      assert(first.get.end_ms - first.get.start_ms == 20 * 60000L)
    } finally q.stop()
  }
}
