package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal data-engineering operators: SCD2 dimension builds, CDC
  * (change-data-capture) merge application, and time-series gap
  * filling — the warehouse maintenance surface next to the as-of join
  * ([[AsofJoin]]) and sessionization ([[graft.streaming.EventAgg]]).
  *
  * Scale notes (100 TB): every window here is partitioned by the
  * entity key (never a single global partition); the SCD2 change
  * compression and the CDC latest-wins pick reuse one (key)-hash
  * shuffle across their window passes. Gap filling explodes a dense
  * per-key bucket grid from one row per key — grid size is bounded by
  * (time span / step), independent of event volume.
  */
object Temporal {

  /** Type-2 slowly-changing-dimension build from a change log:
    * consecutive rows (per key, ordered by (ts, tie)) with the SAME
    * attribute value compress into one version; each version carries
    * `valid_from` (its first change ts), `valid_to` (the next
    * version's start, null while current), a 1-based `version`
    * number, and `is_current`.
    *
    * All comparisons are null-safe (`<=>`), so a null attribute value
    * forms versions like any other value. Timestamp/integer
    * semantics only — engine-exact.
    *
    * Shape: two window passes over the SAME (key, order) partitioning
    * — the change-detection lag and the validity lead reuse one
    * shuffle+sort (the filter between them preserves distribution and
    * order, so Catalyst plans a single Exchange). */
  def scd2(changes: DataFrame, keyCol: String, attrCol: String,
           tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val versions = changes
      .select(col(keyCol), col(attrCol), col(tsCol), col(tieCol))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .filter(col("__rn") === 1 || !(col("__prev") <=> col(attrCol)))
    versions
      .select(col(keyCol), col(attrCol),
        col(tsCol).as("valid_from"),
        lead(col(tsCol), 1).over(w).as("valid_to"),
        row_number().over(w).as("version"))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Apply a CDC change stream to a base snapshot, latest-wins:
    * for each key the change with the highest (orderCols, …) wins —
    * `op` 'D' deletes the key, 'I'/'U' upserts `valueCols` — and keys
    * without changes keep their base row. The caller's `orderCols`
    * MUST totally order changes per key (include a unique tiebreak),
    * or the pick is nondeterministic.
    *
    * Shape: one (key)-window to pick the winning change, one
    * full-outer key-join against the base — the MERGE INTO plan. The
    * change stream is usually ≪ the snapshot; at 100 TB the join
    * shuffles each side once on the key (bucketed base tables skip
    * their side entirely). */
  def cdcApply(base: DataFrame, changes: DataFrame, keyCol: String,
               opCol: String, orderCols: Seq[Column],
               valueCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(_.desc): _*)
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(keyCol) +: col(opCol).as("__op") +:
        valueCols.map(c => col(c).as(s"__c_$c")): _*)
    base.join(latest, Seq(keyCol), "full_outer")
      .filter(!(col("__op") <=> lit("D"))) // delete wins; absent op keeps base
      .select(col(keyCol) +: valueCols.map(c =>
        when(col("__op").isNotNull, col(s"__c_$c")).otherwise(col(c)).as(c)): _*)
  }

  /** Dense per-key time grid with zero-filled counts and exact cent
    * sums: buckets events into `date_trunc(unit, ts)`, then fills
    * every bucket between each key's first and last active bucket.
    * Integer counts + cent sums — engine-exact.
    *
    * Shape: one (key, bucket) aggregation; the grid explodes from ONE
    * row per key (min/max bucket) — narrow, bounded by span/step —
    * then a left key-join back. No per-event window. */
  def gapFill(events: DataFrame, keyCol: String, tsCol: String,
              valCol: Column, unit: String = "hour",
              step: String = "INTERVAL 1 HOUR"): DataFrame = {
    val b = events.select(col(keyCol).as("k"),
      date_trunc(unit, col(tsCol)).as("bucket"),
      round(valCol * 100).cast("long").as("__cents"))
    val counts = b.groupBy(col("k"), col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("__cents")).as("sum_cents"))
    val grid = counts.groupBy(col("k"))
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(col("k"), explode(sequence(col("lo"), col("hi"), expr(step)))
        .as("bucket"))
    grid.join(counts, Seq("k", "bucket"), "left")
      .select(col("k").as(keyCol), col("bucket"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("sum_cents"), lit(0L)).as("sum_cents"))
  }

  /** Time-weighted average per key (TWAP semantics): each observation's
    * value holds from its timestamp until the next observation; the
    * average weights each held value by its holding duration. All-LONG
    * accumulation — cent values × epoch-micro durations summed as
    * decimal(38,0) (a 64-bit sum can overflow: cents·micros reaches
    * ~1e13 PER ROW) — with ONE double division at the end. The final
    * observation has no holding period and contributes nothing (the
    * standard left-closed convention; document, don't silently pad).
    *
    * Shape: one key-partitioned lead window + one grouped aggregation
    * — the SCD2 partitioning reused. */
  def timeWeightedAvg(df: DataFrame, keyCol: String, tsCol: String,
                      tieCol: String, valCol: Column,
                      outDigits: Int = 6): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val held = df
      .select(col(keyCol), col(tsCol), col(tieCol),
        round(valCol * 100).cast("long").as("__cents"),
        unix_micros(col(tsCol)).as("__us"))
      .withColumn("__dur", lead(col("__us"), 1).over(w) - col("__us"))
      .filter(col("__dur").isNotNull)
    held.groupBy(col(keyCol)).agg(
        count(lit(1)).as("n_held"),
        sum(col("__dur")).as("total_us"),
        sum((col("__cents") * col("__dur")).cast("decimal(38,0)"))
          .as("__wsum"))
      .select(col(keyCol), col("n_held"), col("total_us"),
        round(col("__wsum").cast("double")
          / col("total_us") / 100.0, outDigits).as("twap"))
  }

  /** OHLC downsampling: per (key, time bucket) open / high / low /
    * close / integer cent volume / event count — the standard
    * time-series compaction bar. Open and close are picked by the
    * DETERMINISTIC total order (ts, tieCol), so ties at the bucket edge
    * resolve identically on every engine (arg_min/arg_max style
    * aggregates leave ties engine-defined, which would break the
    * oracle): open/close are `min/max(struct(ts, tie, v))` — the
    * struct comparison resolves on (ts, tie) before ever reaching v.
    *
    * Shape: ONE partial-aggregated (key, bucket) groupBy — no windows,
    * no per-bucket sort; a bucket with a billion events combines
    * map-side to one row per input partition. Bucket membership is
    * pure integer arithmetic on epoch micros (pmod, not float division
    * — a float quotient could land an edge timestamp in the wrong
    * bar). Volume accumulates integer cents; the only doubles in the
    * output are the carried o/h/l/c values themselves. */
  def ohlcBars(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
               valCol: Column, bucketSeconds: Long): DataFrame = {
    require(bucketSeconds >= 1, "bucketSeconds must be >= 1")
    val step = bucketSeconds * 1000000L
    val us = unix_micros(col(tsCol))
    val edge = struct(col(tsCol).as("__t"), col(tieCol).as("__k"),
      col("__v"))
    df.select(col(keyCol), col(tsCol), col(tieCol), valCol.as("__v"),
        timestamp_micros(us - pmod(us, lit(step))).as("__bar"))
      .groupBy(col(keyCol), col("__bar").as("bar_start"))
      .agg(
        min(edge).getField("__v").as("open"),
        max(col("__v")).as("high"),
        min(col("__v")).as("low"),
        max(edge).getField("__v").as("close"),
        sum(round(col("__v") * 100).cast("long")).as("vol_cents"),
        count(lit(1)).as("n_events"))
  }

  /** Inter-arrival statistics per key: gap moments and the
    * Goh–Barabási burstiness `B = (σ − μ)/(σ + μ)` over consecutive
    * event gaps — the bot/automation signal (B → −1 periodic cron,
    * B ≈ 0 Poisson-human, B → +1 bursty scraper).
    *
    * Gaps are integer MICROSECONDS from a key-partitioned lag window;
    * moments are decimal(38,0) sums (exact); μ, σ and B are one
    * mirrored double expression each, rounded. Keys with fewer than
    * two events emit null burstiness. */
  def interArrivalStats(df: DataFrame, keyCol: String, tsCol: String,
                        tieCol: String, outDigits: Int = 6): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("__us"), col(tieCol))
    def d(c: Column): Column = c.cast("decimal(38,0)")
    df.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol), col(tieCol),
        unix_micros(col(tsCol).cast("timestamp")).as("__us"))
      .withColumn("__gap", col("__us") - lag(col("__us"), 1).over(w))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        count(col("__gap")).as("n_gaps"),
        coalesce(sum(d(col("__gap"))), lit(0).cast("decimal(38,0)"))
          .as("__s"),
        coalesce(sum(d(col("__gap")) * d(col("__gap"))),
          lit(0).cast("decimal(38,0)")).as("__s2"))
      .select(col(keyCol), col("n_events"), col("n_gaps"),
        when(col("n_gaps") > 0, expr("CAST(__s div n_gaps AS BIGINT)"))
          .as("mean_gap_us"),
        // __s > 0 guards the all-zero-gap key (mean = sd = 0 → 0/0)
        when(col("n_gaps") > 1 && col("__s") > 0,
          round(expr(
            "(sqrt(CAST(n_gaps * __s2 - __s * __s AS DOUBLE)) / n_gaps" +
            " - CAST(__s AS DOUBLE) / n_gaps)" +
            " / (sqrt(CAST(n_gaps * __s2 - __s * __s AS DOUBLE)) / n_gaps" +
            " + CAST(__s AS DOUBLE) / n_gaps)"), outDigits))
          .as("burstiness"))
  }

  /** Freshness-decayed counts and value sums per key: each row weighs
    * `2^-(age div halflife)` of a fresh row — the recency weighting
    * behind "prefer recent crawl snapshots" mixture decisions — kept
    * INTEGRAL by bucketing age into halflife units and weighting with
    * power-of-two shifts on a 2^20 fixed-point scale:
    *
    *   k = age_days div halflifeDays   (rows after `refDate` clamp to 0)
    *   w = 1 << (20 − k)  for k ≤ 20, else 0  (< 1e-6 of a fresh row)
    *
    * decayed_x20 is the decayed COUNT ·2^20, decayed_cents_x20 the
    * decayed cent-value sum ·2^20 — pure Long sums, engine-exact. One
    * narrow projection + one map-side-combined aggregation.
    *
    * @param refDate  'YYYY-MM-DD' reference date (the "now" anchor,
    *                 injected as a literal so both engines share it) */
  def timeDecayedStats(df: DataFrame, keyCol: String, tsCol: String,
                       valueCol: String, refDate: String,
                       halflifeDays: Int): DataFrame = {
    require(halflifeDays >= 1, s"halflifeDays must be >= 1, got $halflifeDays")
    require(refDate.matches("\\d{4}-\\d{2}-\\d{2}"), "refDate must be YYYY-MM-DD")
    val kExpr = s"greatest(datediff(CAST('$refDate' AS DATE), " +
      s"CAST($tsCol AS DATE)), 0) div $halflifeDays"
    val w = expr(s"CASE WHEN $kExpr <= 20 THEN " +
      s"shiftleft(CAST(1 AS BIGINT), 20 - CAST(($kExpr) AS INT)) " +
      s"ELSE CAST(0 AS BIGINT) END")
    df.filter(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(keyCol), w.as("__w"),
        round(col(valueCol).cast("double") * 100).cast("long").as("__xc"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(col("__w")).as("decayed_x20"),
        sum(col("__w") * col("__xc")).as("decayed_cents_x20"))
  }

  /** Autocorrelation function of the daily `valueCol` sum at lags
    * 1..`maxLag` — the periodicity / trend-persistence diagnostic for
    * event streams and revenue series. The series is the ZERO-FILLED
    * calendar grid (one row per day between min and max date), so its
    * length is bounded by the calendar span, never by event volume;
    * the distributed work is one grouped cent-sum over the raw scan.
    * Everything downstream — the lag self-join and the moment sums —
    * runs on the tiny day grid. acf_k = (n²·Σxy − n·S·(H+T) +
    * (n−k)·S²) / (n²·Σx² − n·S²) with every term an exact decimal;
    * the single double division is the only inexact step. Returns
    * (lag, n_days, acf). */
  def acf(df: DataFrame, dateCol: String, valueCol: String,
          maxLag: Int = 7, scaleDigits: Int = 2,
          outDigits: Int = 6): DataFrame = {
    require(maxLag >= 1, "maxLag must be >= 1")
    val spark = df.sparkSession
    val unit = math.pow(10, scaleDigits)
    val vc = round(col(valueCol).cast("double") * lit(unit)).cast("long")
    val perDay = df
      .filter(col(valueCol).isNotNull && col(dateCol).isNotNull)
      .groupBy(to_date(col(dateCol)).as("d"))
      .agg(sum(vc).as("xc"))
    val bounds = perDay.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val span = bounds
      .select((datediff(col("d1"), col("d0")) + 1).cast("long")).head().getLong(0)
    val indexed = perDay.crossJoin(broadcast(bounds))
      .select(datediff(col("d"), col("d0")).cast("long").as("t"), col("xc"))
    val x = spark.range(span).toDF("t")
      .join(indexed, Seq("t"), "left").na.fill(0L, Seq("xc"))
      .localCheckpoint(false)
    def dd(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val g = x.agg(count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(dd(col("xc"))).as("s"),
      sum(dd(col("xc")) * dd(col("xc"))).as("sxx"))
    val lagged = x.select(
      explode(array((1 to maxLag).map(k => lit(k.toLong)): _*)).as("k"),
      col("t"), col("xc").as("xa"))
    val pairs = lagged
      .withColumn("t2", col("t") + col("k"))
      .join(x.select(col("t").as("t2"), col("xc").as("xb")), Seq("t2"))
    pairs.groupBy("k")
      .agg(sum(dd(col("xa")) * dd(col("xb"))).as("sxy"),
        sum(dd(col("xa"))).as("h"), sum(dd(col("xb"))).as("tt"))
      .crossJoin(broadcast(g))
      .select(col("k").as("lag"), col("n").cast("long").as("n_days"),
        round(
          (col("n") * col("n") * col("sxy")
            - col("n") * col("s") * (col("h") + col("tt"))
            + (col("n") - dd(col("k"))) * col("s") * col("s")).cast("double")
          / (col("n") * col("n") * col("sxx")
            - col("n") * col("s") * col("s")).cast("double"),
          outDigits).as("acf"))
      .orderBy("lag")
  }
}
