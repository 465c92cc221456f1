package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Streaming-native event analytics. Both operators run identically over
  * batch and streaming frames; the streaming variants add watermarks /
  * state timeouts. Shuffles only on the aggregation keys.
  */
object EventAgg {

  /** Tumbling-window aggregation: events per (window, event_type) with
    * value sums. Batch and streaming share this exact plan; streaming
    * callers add `withWatermark("ts", ...)` upstream. */
  def windowedAgg(events: DataFrame, windowLen: String = "1 hour"): DataFrame =
    events.groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Watermarked streaming variant (late events beyond the watermark are
    * dropped; append-mode emits finalized windows only). */
  def windowedAggStream(events: DataFrame, windowLen: String = "1 hour",
                        watermark: String = "2 hours"): DataFrame =
    windowedAgg(events.withWatermark("ts", watermark), windowLen)

  /** SLIDING-window aggregation: each event lands in windowLen/slide
    * overlapping windows (Spark's `window` generator expands them before
    * the aggregation, so the shuffle carries len/slide copies per event —
    * the inherent cost of sliding windows on any engine; keep the ratio
    * small at scale). Batch and streaming share the plan; streaming
    * callers watermark upstream exactly like [[windowedAggStream]]. */
  def slidingAgg(events: DataFrame, windowLen: String = "1 hour",
                 slide: String = "15 minutes"): DataFrame =
    events.groupBy(window(col("ts"), windowLen, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  def slidingAggStream(events: DataFrame, windowLen: String = "1 hour",
                       slide: String = "15 minutes",
                       watermark: String = "2 hours"): DataFrame =
    slidingAgg(events.withWatermark("ts", watermark), windowLen, slide)

  /** OHLC bars as a pure aggregation — the same min/max(struct) shape
    * as `Temporal.ohlcBars`, expressed over Spark's `window` generator
    * so it runs identically over batch and streaming frames (the
    * struct-edge trick needs NO windows/row_numbers, which is what
    * makes it streamable: open/close are ordinary commutative
    * aggregates). Streaming callers watermark upstream. */
  def ohlcAgg(events: DataFrame, keyCol: String, tieCol: String,
              valCol: String, windowLen: String = "1 hour"): DataFrame = {
    val edge = struct(col("ts").as("__t"), col(tieCol).as("__k"),
      col(valCol).as("__v"))
    events.groupBy(window(col("ts"), windowLen).as("w"), col(keyCol))
      .agg(min(edge).getField("__v").as("open"),
        max(col(valCol)).as("high"),
        min(col(valCol)).as("low"),
        max(edge).getField("__v").as("close"),
        sum(round(col(valCol) * 100).cast("long")).as("vol_cents"),
        count(lit(1)).as("n_events"))
      .select(col("w.start").as("bar_start"), col(keyCol),
        col("open"), col("high"), col("low"), col("close"),
        col("vol_cents"), col("n_events"))
  }

  def ohlcAggStream(events: DataFrame, keyCol: String, tieCol: String,
                    valCol: String, windowLen: String = "1 hour",
                    watermark: String = "2 hours"): DataFrame =
    ohlcAgg(events.withWatermark("ts", watermark), keyCol, tieCol, valCol,
      windowLen)

  final case class Event(user_id: Long, ts: Timestamp, event_type: String, value: Double)
  final case class Session(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, n_events: Long, sum_value: Double)
  final case class SessionState(startMs: Long, endMs: Long, cnt: Long, total: Double)

  /** Streaming exact dedup: first-seen row per key within the watermark
    * horizon (late duplicates beyond the watermark are dropped by the
    * engine; state for old keys is evicted — the bounded-state version of
    * batch `Dedup.exact` for infinite streams). */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
                  watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-stream enrichment join: each left event picks up right-side
    * events for the same key whose timestamp falls within
    * `[left.ts - lookback, left.ts]` — the streaming counterpart of the
    * batch as-of join ([[graft.ops.AsofJoin]]). Stream-stream joins need
    * a BOUNDED time-range predicate so the engine can size and evict
    * per-key state from the watermarks; an unbounded "latest ever" match
    * would require infinite state. Payload columns arrive prefixed
    * `r_`.
    *
    * @param timeCol event-time column name, present on BOTH streams
    *                (like [[graft.ops.AsofJoin.asofJoin]]'s timeCol). */
  def enrichStream(left: DataFrame, right: DataFrame, keyCol: String,
                   payloadCols: Seq[String], lookback: String = "1 hour",
                   watermark: String = "1 hour",
                   timeCol: String = "ts"): DataFrame = {
    // lookback splices into an INTERVAL literal — validate the shape
    // (one or more '<n> unit' terms) instead of letting arbitrary text
    // reach the SQL parser
    require(lookback.matches(
      "(?i)\\s*(\\d+\\s+(millisecond|second|minute|hour|day|week)s?\\s*)+"),
      s"lookback must look like '<n> <unit>[ <n> <unit>...]', got '$lookback'")
    require(left.columns.contains(timeCol) && right.columns.contains(timeCol),
      s"both streams need the event-time column '$timeCol'")
    val l = left.withWatermark(timeCol, watermark)
    val r = right.withWatermark(timeCol, watermark)
      .select(Seq(col(keyCol).as("r_key"), col(timeCol).as("r_ts")) ++
        payloadCols.map(c => col(c).as(s"r_$c")): _*)
    l.join(r,
      col(keyCol) === col("r_key") &&
        col("r_ts") >= col(timeCol) - expr(s"INTERVAL $lookback") &&
        col("r_ts") <= col(timeCol),
      "leftOuter")
      .drop("r_key")
  }

  /** Batch sessionization: gap-and-island with a per-user window — a new
    * session starts when the gap to the previous event exceeds
    * `gapMinutes`. One shuffle on user_id. */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    val gapped = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("double") - col("prev_ts").cast("double") > gapMinutes * 60.0, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(byUser))
    gapped.groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .drop("session_id")
  }

  /** Streaming sessionization with custom state:
    * `flatMapGroupsWithState` keeps one open session per user, emits a
    * session when the in-data gap is exceeded, or via EVENT-TIME timeout
    * when the watermark passes `session_end + gap` — the idle user's open
    * session is flushed and its state entry evicted, so state stays
    * bounded by the set of users active within the watermark horizon.
    * (Event-time, not processing-time: no wall-clock dependence, and the
    * microbatch engine only schedules extra batches when the watermark
    * actually advances.) The KeyValueGroupedDataset shape is the
    * canonical Spark mechanism for reference-free custom streaming
    * state. */
  def sessionizeStream(events: Dataset[Event], gapMinutes: Int = 30,
                       watermarkDelay: String = "30 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed session_end + gap: emit and evict
            val out = state.getOption.map(cur =>
              Session(uid, new Timestamp(cur.startMs), new Timestamp(cur.endMs),
                cur.cnt, cur.total))
            state.remove()
            out.iterator
          } else {
            var cur = state.getOption.orNull
            val out = scala.collection.mutable.ArrayBuffer.empty[Session]
            rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              if (cur == null) cur = SessionState(t, t, 1, e.value)
              else if (t - cur.endMs > gapMs) {
                out += Session(uid, new Timestamp(cur.startMs), new Timestamp(cur.endMs),
                  cur.cnt, cur.total)
                cur = SessionState(t, t, 1, e.value)
              } else cur = SessionState(cur.startMs, math.max(cur.endMs, t),
                cur.cnt + 1, cur.total + e.value)
            }
            if (cur != null) {
              state.update(cur)
              // must stay above the current watermark or the engine rejects it
              state.setTimeoutTimestamp(
                math.max(cur.endMs + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
      }
  }

  /** A user's funnel progress: step times reached so far (epoch
    * micros, index i = step i+1). */
  final case class FunnelProgress(user_id: Long, steps_completed: Int,
                                  times: Seq[Long])

  /** Streaming twin of [[graft.ops.Analytics.funnel]]: per-user state
    * is the prefix of step times reached (N longs), advanced greedily
    * as events arrive — which equals the batch min-chain whenever each
    * user's events arrive in event-time order (in-batch sorting handles
    * intra-batch disorder; CROSS-batch disorder is the documented
    * limit, the same in-order contract every incremental funnel
    * engine states). Emits a row in Update mode whenever a user
    * progresses.
    *
    * State is O(active users) x N longs — the minimal possible funnel
    * state; no event history is retained. */
  def funnelStream(events: Dataset[Event],
                   steps: Seq[String]): Dataset[FunnelProgress] = {
    import events.sparkSession.implicits._
    require(steps.nonEmpty, "funnel needs at least one step")
    val n = steps.size
    // full microsecond precision: Timestamp.getTime is millis-only and
    // would merge events that differ in the sub-ms digits
    def micros(t: Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Seq[Long], FunnelProgress](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[Event], state: GroupState[Seq[Long]]) =>
          var times = state.getOption.getOrElse(Seq.empty[Long])
          val before = times.size
          rows.toSeq.sortBy(e => (micros(e.ts), e.event_type)).foreach { e =>
            if (times.size < n && e.event_type == steps(times.size) &&
                (times.isEmpty || micros(e.ts) > times.last))
              times = times :+ micros(e.ts)
          }
          if (times.size > before) {
            state.update(times)
            Iterator.single(FunnelProgress(uid, times.size, times))
          } else Iterator.empty
      }
  }

  /** A key that stopped emitting: last event seen and the declared
    * silence bound that fired. */
  final case class SilenceAlert(user_id: Long, last_seen: Timestamp,
                                silent_for_min: Long)
  final case class LastSeen(lastMs: Long)

  /** Silence / heartbeat-loss detection — the monitoring dual of
    * [[sessionizeStream]]: one alert per key whose EVENT-TIME silence
    * exceeds `silenceMinutes` (detected when the watermark passes
    * `last_seen + silence`; no wall-clock dependence). State is one
    * timestamp per key active within the horizon, evicted on alert —
    * the key re-arms when it next appears, so a flapping source emits
    * one alert per silent episode, not per micro-batch. */
  def silenceAlerts(events: Dataset[Event], silenceMinutes: Int = 30,
                    watermarkDelay: String = "10 minutes"): Dataset[SilenceAlert] = {
    import events.sparkSession.implicits._
    val gapMs = silenceMinutes * 60000L
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastSeen, SilenceAlert](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[Event], state: GroupState[LastSeen]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(s =>
              SilenceAlert(uid, new Timestamp(s.lastMs), silenceMinutes.toLong))
            state.remove()
            out.iterator
          } else {
            val maxT = rows.map(_.ts.getTime).max
            val last = math.max(
              state.getOption.map(_.lastMs).getOrElse(Long.MinValue), maxT)
            state.update(LastSeen(last))
            state.setTimeoutTimestamp(
              math.max(last + gapMs, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  final case class EwmaState(level: Double, n: Long, lastMicros: Long)
  final case class EwmaRow(user_id: Long, n: Long, last_ts: Timestamp,
                           ewma: Double)

  /** Streaming twin of [[graft.ops.Drift.ewmaLevel]]: per-user state is
    * (level, n, last_ts) — three scalars, the minimal possible — and
    * each micro-batch folds its rows in event-time order, emitting the
    * updated level per touched user (Update-mode sink). Equals the
    * batch operator whenever each user's events arrive in event-time
    * order ACROSS batches (in-batch disorder is sorted away; the
    * cross-batch in-order contract is the same one [[funnelStream]]
    * documents — the recursion is order-sensitive by definition).
    * Events must be unique per (user, ts) for the order to be total. */
  def ewmaStream(events: Dataset[Event],
                 alpha: Double = 0.25): Dataset[EwmaRow] = {
    import events.sparkSession.implicits._
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    val beta = 1.0 - alpha
    def micros(t: Timestamp): Long =
      t.getTime / 1000 * 1000000L + t.getNanos / 1000
    events.groupByKey(_.user_id)
      .mapGroupsWithState[EwmaState, EwmaRow](GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[Event], state: GroupState[EwmaState]) =>
          var cur = state.getOption.orNull
          rows.toSeq.sortBy(e => micros(e.ts)).foreach { e =>
            cur =
              if (cur == null) EwmaState(e.value, 1L, micros(e.ts))
              else EwmaState(beta * cur.level + alpha * e.value, cur.n + 1,
                math.max(cur.lastMicros, micros(e.ts)))
          }
          state.update(cur)
          val ts = new Timestamp(cur.lastMicros / 1000)
          ts.setNanos((cur.lastMicros % 1000000L).toInt * 1000)
          EwmaRow(uid, cur.n, ts, cur.level)
      }
  }

  final case class HoltState(level: Double, trend: Double, n: Long,
                             lastMicros: Long)
  final case class HoltRow(user_id: Long, n: Long, last_ts: Timestamp,
                           level: Double, trend: Double, forecast: Double)

  /** Streaming twin of [[graft.ops.Drift.holtLevelTrend]]: four
    * scalars of state per key in mapGroupsWithState, Update-mode
    * emission. Same cross-batch contract as [[ewmaStream]]: rows
    * sort by event time INSIDE each micro-batch; equality with the
    * batch fold holds when batches arrive in event-time order (the
    * replay/backfill case the spec pins). */
  def holtStream(events: Dataset[Event], alpha: Double = 0.5,
                 beta: Double = 0.25): Dataset[HoltRow] = {
    import events.sparkSession.implicits._
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    require(beta > 0 && beta < 1, s"beta must be in (0,1), got $beta")
    def micros(t: Timestamp): Long =
      t.getTime / 1000 * 1000000L + t.getNanos / 1000
    events.groupByKey(_.user_id)
      .mapGroupsWithState[HoltState, HoltRow](GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[Event], state: GroupState[HoltState]) =>
          var cur = state.getOption.orNull
          rows.toSeq.sortBy(e => micros(e.ts)).foreach { e =>
            cur =
              if (cur == null) HoltState(e.value, 0.0, 1L, micros(e.ts))
              else {
                val l2 = alpha * e.value + (1 - alpha) * (cur.level + cur.trend)
                val b2 = beta * (l2 - cur.level) + (1 - beta) * cur.trend
                HoltState(l2, b2, cur.n + 1,
                  math.max(cur.lastMicros, micros(e.ts)))
              }
          }
          state.update(cur)
          val ts = new Timestamp(cur.lastMicros / 1000)
          ts.setNanos((cur.lastMicros % 1000000L).toInt * 1000)
          HoltRow(uid, cur.n, ts, cur.level, cur.trend,
            cur.level + cur.trend)
      }
  }

  final case class FirstSeenState(firstMicros: Long)
  final case class NewUser(user_id: Long, first_ts: Timestamp)

  /** Streaming twin of [[graft.ops.Analytics.userGrowth]]'s first-seen
    * detection: one long of state per known user; a user's FIRST
    * appearance emits exactly one `NewUser` row (Append mode), later
    * events emit nothing — the growth dashboard updates incrementally
    * instead of rescanning history. Same cross-batch contract as
    * [[ewmaStream]]: in-batch disorder is resolved by taking the batch
    * minimum, so equality with the batch operator holds when each
    * user's batches arrive in event-time order. State never expires
    * (a "new user" is forever-known by definition); for bounded state
    * on unbounded user churn, snapshot-and-compact via the batch
    * operator. */
  def firstSeenStream(events: Dataset[Event]): Dataset[NewUser] = {
    import events.sparkSession.implicits._
    def micros(t: Timestamp): Long =
      t.getTime / 1000 * 1000000L + t.getNanos / 1000
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FirstSeenState, NewUser](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[Event], state: GroupState[FirstSeenState]) =>
          val batchMin = rows.map(e => micros(e.ts)).min
          if (state.exists) Iterator.empty
          else {
            state.update(FirstSeenState(batchMin))
            val ts = new Timestamp(batchMin / 1000)
            ts.setNanos((batchMin % 1000000L).toInt * 1000)
            Iterator(NewUser(uid, ts))
          }
      }
  }
}
