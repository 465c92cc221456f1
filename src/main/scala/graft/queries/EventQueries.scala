package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.EventAgg
import graft.ml.{CvSgdNet, SgdNetParams}
import MlQueries.tbl

/** Event-stream analytics queries (batch twins of the streaming
  * operators) + cv_sgdnet post-fit methods. */
object EventQueries {

  /** events.parquet has carried either TIMESTAMP(NANOS) — which Spark's
    * vectorized reader rejects, so nanos read as long and truncate to
    * micros exactly (integer division, matching DuckDB's read
    * truncation) — or TIMESTAMP(MICROS, NTZ), which casts to the
    * session-UTC instant directly. Dispatch on the OBSERVED schema so
    * either generation of the driver's testdata loads. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = tbl(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** Tumbling 1-hour window aggregation over events. */
  def eventWindow(spark: SparkSession, dir: String): DataFrame =
    EventAgg.windowedAgg(events(spark, dir), "1 hour")
      .withColumn("sum_value", round(col("sum_value"), 4))
      .orderBy("window_start", "event_type")

  /** Sliding 1-hour windows every 15 minutes (each event lands in 4
    * windows — the overlap the `window` generator expands). */
  def eventSliding(spark: SparkSession, dir: String): DataFrame =
    EventAgg.slidingAgg(events(spark, dir), "1 hour", "15 minutes")
      .withColumn("sum_value", round(col("sum_value"), 4))
      .orderBy("window_start", "event_type")

  /** Gap-based sessionization (30-minute inactivity gap). */
  def sessionize(spark: SparkSession, dir: String): DataFrame =
    EventAgg.sessionizeBatch(events(spark, dir), gapMinutes = 30)
      .withColumn("sum_value", round(col("sum_value"), 4))
      .orderBy("user_id", "session_start")

  /** As-of join: each click event picks up the user's most recent error
    * event at-or-before its timestamp (the canonical time-series
    * enrichment; DuckDB's native ASOF JOIN is the oracle). */
  def asofErrors(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"),
        col("ts").as("err_ts"), col("value").as("err_value"))
    graft.ops.AsofJoin.asofJoin(clicks, errors, "user_id", "ts",
        Seq("err_ts", "err_value"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("asof_err_ts").as("err_ts"),
        (round(col("asof_err_value"), 4) + lit(0.0)).as("err_value"))
      .orderBy("event_id")
  }

  /** Strict-order view → click → purchase funnel per user (timestamps
    * + step count — pure min-aggregation/join chain, engine-exact). */
  def funnelQ(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Analytics.funnel(events(spark, dir), "user_id", "ts",
        "event_type", Seq("view", "click", "purchase"))
      .orderBy("user_id")

  /** Weekly cohort retention triangle over events. */
  def retentionQ(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Analytics.weeklyRetention(events(spark, dir), "user_id", "ts")
      .orderBy("cohort_week", "week_offset")

  /** Interval-overlap join via grid bucketing: error incident windows
    * [ts, ts+15min] against purchase attribution windows [ts-5min, ts]
    * — epoch-micro integer intervals, engine-exact overlap bounds. The
    * DuckDB oracle plans its native range join (IEJoin); the Spark
    * side uses the grid decomposition (see
    * [[graft.ops.IntervalJoin.overlapJoin]]). */
  def intervalJoinQ(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), unix_micros(col("ts")).as("s"),
        (unix_micros(col("ts")) + lit(900000000L)).as("e"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), (unix_micros(col("ts")) - lit(300000000L)).as("s"),
        unix_micros(col("ts")).as("e"))
    graft.ops.IntervalJoin.overlapJoin(errors, "event_id", "s", "e",
        purchases, "event_id", "s", "e", gridWidth = 900000000L)
      .orderBy("left_id", "right_id")
  }

  /** SCD2 dimension build: each user's event_type change log compresses
    * into validity versions (valid_from/valid_to/version/is_current) —
    * pure timestamp/window semantics, engine-exact. */
  def scd2Q(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Temporal.scd2(events(spark, dir), "user_id", "event_type",
        "ts", "event_id")
      .select(col("user_id"), col("event_type"), col("valid_from"),
        col("valid_to"), col("version"), col("is_current"))
      .orderBy("user_id", "version")

  /** Dense hourly grid with zero-filled counts + exact cent sums over
    * each user's purchase activity span (users < 30 bound the grid). */
  def gapFillQ(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Temporal.gapFill(
        events(spark, dir)
          .filter(col("event_type") === "purchase" && col("user_id") < 30),
        "user_id", "ts", col("value"))
      .orderBy("user_id", "bucket")

  /** First-order Markov transition matrix over per-user event-type
    * sequences (counts + exact-ratio probabilities). */
  def transitionsQ(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Analytics.transitions(events(spark, dir), "user_id", "ts",
        "event_id", "event_type")
      .orderBy("from_type", "to_type")

  /** Nearest-in-time join: each click attaches the user's error event
    * with minimal |Δt| (ties to the earlier error), composed from two
    * as-of passes — no range cross-join. */
  def nearestJoinQ(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"),
        col("ts").as("err_ts"), col("value").as("err_value"))
    graft.ops.AsofJoin.nearestJoin(clicks, errors, "user_id", "ts",
        Seq("err_ts", "err_value"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("nearest_err_ts").as("err_ts"),
        (round(col("nearest_err_value"), 4) + lit(0.0)).as("err_value"),
        col("nearest_dt_us"))
      .orderBy("event_id")
  }

  /** Week-over-week per event type: counts + exact cent sums joined to
    * the previous calendar week (gap-safe equi-join, not a lag). */
  def wowQ(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Analytics.periodOverPeriod(events(spark, dir), "event_type",
        "ts", col("value"))
      .orderBy("series", "period")

  /** Top-10 week-over-week movers by absolute cent delta. */
  def topMoversQ(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Analytics.topMovers(events(spark, dir), "event_type",
      "ts", col("value"))

  /** Arrival-order lateness histogram (10-minute buckets). */
  def latenessQ(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Analytics.latenessProfile(events(spark, dir), "event_id", "ts")

  /** Last-touch marketing attribution: each purchase attributes to the
    * user's most recent view/click touch within a 2-hour lookback
    * (else "none"); per-channel conversions + attributed revenue.
    * Touches pre-dedup to one per (user, ts) — min(channel), a
    * deterministic cross-engine tiebreak — then ONE as-of pass and a
    * tiny grouped rollup. */
  def attributionQ(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        round(col("value") * 100).cast("long").as("cents"))
    val touches = ev.filter(col("event_type").isin("view", "click"))
      .groupBy(col("user_id"), col("ts"))
      .agg(min(col("event_type")).as("channel"))
      .withColumn("touch_us", unix_micros(col("ts")))
    val att = graft.ops.AsofJoin.asofJoin(purchases, touches, "user_id",
        "ts", Seq("channel", "touch_us"))
      .withColumn("attributed",
        when(col("asof_touch_us").isNotNull &&
          unix_micros(col("ts")) - col("asof_touch_us") <= 7200L * 1000000L,
          col("asof_channel")).otherwise(lit("none")))
    att.groupBy(col("attributed").as("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("cents")).cast("long").as("revenue_cents"))
      .orderBy("channel")
  }

  /** Per-event-type CUSUM change-point statistic (all-long centered
    * prefix deviations via the two-level bucketed prefix sum). */
  def cusumQ(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Drift.cusum(events(spark, dir), "event_type", "ts",
        "event_id", col("value"))
      .orderBy("event_type")

  /** Per-user time-weighted average event value (TWAP): cent-micro
    * products summed exactly, one final division. */
  def twapQ(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Temporal.timeWeightedAvg(events(spark, dir), "user_id",
        "ts", "event_id", col("value"))
      .orderBy("user_id")

  /** Hourly OHLC bars per event type: open/close picked by the
    * deterministic (ts, event_id) total order, integer-cent volume. */
  def ohlcQ(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Temporal.ohlcBars(events(spark, dir), "event_type", "ts",
        "event_id", col("value"), bucketSeconds = 3600L)
      .orderBy("event_type", "bar_start")

  /** Two-proportion A/B z-test: users split by parity of user_id;
    * "converted" = made >= 14 purchases (the per-user median is 13, so
    * both arms land strictly inside (0, 1) and the pooled variance is
    * non-degenerate). */
  def abTestQ(spark: SparkSession, dir: String): DataFrame = {
    val units = events(spark, dir)
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("n_purch"))
    graft.ops.Analytics.abTest(units,
      col("user_id") % 2 === 1, col("n_purch") >= 14)
  }
}
