package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming surface (extension — the reference is batch-only,
  * SURVEY.md §2.9; the `events` table gives the stream schema).
  *
  * Both transforms are expressed on an *unbounded* DataFrame: the identical
  * code runs over `readStream` in production and over `MemoryStream` in
  * tests. Watermarks bound state, so these run indefinitely on a cluster:
  *  - [[windowedCounts]]: tumbling-window agg with late-data handling —
  *    state is one row per (window, event_type), dropped once the
  *    watermark passes the window end.
  *  - [[sessionize]]: per-user session assembly via
  *    `flatMapGroupsWithState` with an event-time timeout — the canonical
  *    custom-state operator (KeyValueGroupedDataset).
  */
object EventStreams {
  /** 10-minute tumbling window counts per event_type, 20-minute watermark. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "20 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("win_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** SLIDING 10-minute windows every 5 minutes — each event feeds two
    * overlapping windows; watermark closes both. Same window() expression
    * as the batch q51, which carries the DuckDB oracle for the values. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "20 minutes")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))

  /** DECLARATIVE session windows via the built-in `session_window()` —
    * Catalyst merges overlapping per-event windows and manages the state
    * store itself, the preferred formulation when the per-session output
    * is expressible as an aggregate (vs [[sessionize]]'s custom-state
    * `flatMapGroupsWithState`, which this complements: same 30-minute gap,
    * but window end = last event + gap by session_window semantics). */
  def sessionWindowCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(
        col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("user_id"), col("n_events"), col("total_value"))

  /** Streaming heavy-hitter detection: a Misra–Gries sketch per tumbling
    * window (the streaming face of x31) — state per window is k-bounded
    * however many distinct users flow through, which is what makes
    * frequency monitoring viable on an unbounded stream. The MG guarantee
    * holds per closed window: any user with more than N/(k+1) of the
    * window's events is in `candidates`. */
  def heavyUsers(events: DataFrame, k: Int = 8): DataFrame =
    events
      .withWatermark("ts", "20 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(graft.functions.MisraGries
        .topkSketch(col("user_id").cast("string"), k).as("mg"))
      .select(
        col("window.start").as("win_start"),
        array_sort(map_keys(col("mg"))).as("candidates"))

  /** Streaming point-frequency sketch: a count–min sketch per tumbling
    * window (the streaming face of x42, complementing [[heavyUsers]]'
    * Misra–Gries: MG never overestimates, CMS never underestimates).
    * State per window is the fixed depth×width counter array however many
    * distinct keys flow through, and the counters are purely additive, so
    * partial aggregation merges them exactly in any order — the property
    * that makes the sketch safe in streaming partial/final aggregation. */
  def frequencySketch(events: DataFrame,
      width: Int = graft.functions.CountMinSketch.DefaultWidth,
      depth: Int = graft.functions.CountMinSketch.DefaultDepth): DataFrame =
    events
      .withWatermark("ts", "20 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(graft.functions.CountMinSketch
        .sketch(col("user_id").cast("string"), width, depth).as("cms"))
      .select(col("window.start").as("win_start"), col("cms"))

  /** Streaming exact dedup: drop re-deliveries of the same event_id, with
    * the watermark bounding how long each id is remembered — state stays
    * finite on an infinite stream (the streaming face of ext.Dedup x01). */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: each click joined to same-user purchases
    * within the preceding hour. Watermarks on BOTH sides bound the join
    * state (Spark drops buffered rows once the other side's watermark
    * passes the interval) — the canonical streaming join shape. */
  def clickPurchaseJoin(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.expr
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "30 minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("p_ts", "30 minutes")
    clicks.join(purchases,
      expr("""c_user = p_user AND p_ts <= c_ts AND p_ts >= c_ts - INTERVAL 1 HOUR"""))
      .select(col("click_id"), col("purchase_id"), col("value"))
  }

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class SessionState(start: Long, last: Long, nEvents: Int, total: Double)
  final case class Session(user_id: Long, start_ms: Long, end_ms: Long,
      n_events: Int, total_value: Double)

  val SessionGapMs: Long = 30 * 60 * 1000L

  /** Assemble closed sessions per user: a session ends after 30 minutes of
    * inactivity (tracked with an event-time timeout so state is bounded). */
  def sessionize(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, s.start, s.last, s.nEvents, s.total))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= SessionGapMs =>
                  // late-but-in-watermark events may arrive with t < last
                  // (across micro-batches): extend bounds, never shrink
                  cur = Some(SessionState(math.min(s.start, t), math.max(s.last, t),
                    s.nEvents + 1, s.total + e.value))
                case Some(s) =>
                  closed += Session(userId, s.start, s.last, s.nEvents, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + SessionGapMs)
            }
            closed.result().iterator
          }
      }
  }
}
