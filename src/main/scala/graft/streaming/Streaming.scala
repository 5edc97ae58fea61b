package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators over the events shape
  * (event_id, ts, user_id, event_type, value).
  *
  * The reference has no streaming at all (SURVEY.md §2.4) — this module is
  * the Spark-native extension of the same pipeline capabilities to
  * unbounded input: the batch transforms compose unchanged on a streaming
  * DataFrame (`readStream -> transform -> writeStream`), and the two
  * genuinely stateful operators live here.
  *
  * Scale notes: windowed aggregation state is bounded by the watermark
  * (late data beyond it is dropped, state evicted); sessionization state is
  * one small struct per active user, partitioned by user_id across
  * executors — both shapes run unchanged on a 1000-executor cluster.
  */
object Streaming {

  /** Watermarked sliding-window event stats per type. Works on both
    * streaming and batch frames (same code path — Spark semantics). */
  def windowedEventStats(
      events: DataFrame,
      tsCol: String = "ts",
      watermark: String = "10 minutes",
      windowDur: String = "5 minutes",
      slideDur: String = "5 minutes"
  ): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur, slideDur), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  final case class SessionEvent(user_id: Long, event_id: Long, ts: Timestamp, value: Double)

  final case class SessionState(
      sessionStartMs: Long,
      lastEventMs: Long,
      nEvents: Long,
      totalValue: Double)

  final case class Session(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long,
      total_value: Double)

  /** Stateful gap-based sessionization: a session closes once a later event
    * arrives past `gapMs` of user inactivity. With
    * `idleTimeout = true`, idle sessions additionally flush via
    * processing-time timeouts without needing another event for that user —
    * note that timeout-driven batches keep the query "busy", so
    * `processAllAvailable()`-style synchronous draining (tests, backfills)
    * should use the default.
    *
    * State per group = one [[SessionState]] — constant-size per active
    * user, hash-partitioned on user_id across executors. The streaming
    * analogue of the batch sessionize query (q18).
    */
  final case class EwmEvent(user_id: Long, event_id: Long, t: Double, value: Double)

  final case class EwmState(y: Double, prevT: Double)

  final case class EwmPoint(user_id: Long, event_id: Long, ewm_mean_by: Double)

  /** Streaming twin of [[graft.operators.TimeSeries.ewmMeanBy]] (polars'
    * UNADJUSTED `ewm_mean_by` recurrence — y ← a·y + (1−a)·x with
    * a = 0.5^(Δt/halfLife)): the time-decayed mean is THE canonical
    * incrementally-maintainable statistic — per-key state is exactly two
    * scalars (y, last timestamp), so a 100M-key stream carries a few GB
    * of state hash-partitioned across executors, with no window buffer at
    * all. Each micro-batch's rows are sorted by (t, event_id) within the
    * key group; the recurrence then continues from the carried state, so
    * the emitted per-event values equal the batch operator's output on
    * the same prefix (asserted in StreamingSpec across multiple batches).
    *
    * Ordering contract — ENFORCED, not just documented: a row arriving in
    * a later micro-batch with t < the carried prevT has no valid place on
    * the decay axis (folding it would apply a negative-gap weight > 1 —
    * silent wrongness). Such rows are DROPPED and counted in
    * `lateEvents` (register a LongAccumulator to observe; pass None to
    * drop silently). t == prevT is a valid tie (weight 0), not late. The
    * batch operator is the replay/backfill path for late data either
    * way. */
  def ewmMeanByStream(
      events: Dataset[EwmEvent],
      halfLife: Double,
      lateEvents: Option[org.apache.spark.util.LongAccumulator] = None
  ): Dataset[EwmPoint] = {
    import events.sparkSession.implicits._
    require(halfLife > 0.0, s"halfLife must be positive, got $halfLife")

    def update(
        userId: Long,
        batch: Iterator[EwmEvent],
        state: GroupState[EwmState]
    ): Iterator[EwmPoint] = {
      val sorted = batch.toSeq.sortBy(e => (e.t, e.event_id))
      var st = state.getOption
      val out = sorted.flatMap { e =>
        st match {
          case Some(s) if e.t < s.prevT =>
            lateEvents.foreach(_.add(1L))
            None
          case Some(s) =>
            val a = math.pow(0.5, (e.t - s.prevT) / halfLife)
            val next = EwmState(a * s.y + (1.0 - a) * e.value, e.t)
            st = Some(next)
            Some(EwmPoint(userId, e.event_id, next.y))
          case None =>
            val next = EwmState(e.value, e.t)
            st = Some(next)
            Some(EwmPoint(userId, e.event_id, next.y))
        }
      }
      st.foreach(state.update)
      out.iterator
    }

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }

  def sessionize(
      events: Dataset[SessionEvent],
      gapMs: Long = 30L * 60 * 1000,
      idleTimeout: Boolean = false
  ): Dataset[Session] = {
    import events.sparkSession.implicits._

    def update(
        userId: Long,
        batch: Iterator[SessionEvent],
        state: GroupState[SessionState]
    ): Iterator[Session] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator(Session(userId, new Timestamp(s.sessionStartMs),
          new Timestamp(s.lastEventMs), s.nEvents, s.totalValue))
      }
      val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var closed = List.empty[Session]
      var cur = state.getOption
      for (e <- sorted) {
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.lastEventMs <= gapMs =>
            cur = Some(s.copy(lastEventMs = t, nEvents = s.nEvents + 1,
              totalValue = s.totalValue + e.value))
          case Some(s) =>
            closed ::= Session(userId, new Timestamp(s.sessionStartMs),
              new Timestamp(s.lastEventMs), s.nEvents, s.totalValue)
            cur = Some(SessionState(t, t, 1, e.value))
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      cur match {
        case Some(s) =>
          state.update(s)
          if (idleTimeout) state.setTimeoutDuration(gapMs)
        case None => ()
      }
      closed.reverseIterator
    }

    val timeoutConf =
      if (idleTimeout) GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(update)
  }
}
