package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-funnel, cohort-retention, and exact-correlation analytics —
  * the product-analytics query surface over the `events` stream that a
  * warehouse user expects next to windowed aggregation and
  * sessionization ([[graft.streaming.EventAgg]]).
  *
  * Scale notes (100 TB): every operator here reduces to per-key
  * aggregations and key-joins on the SAME key (`userCol`), so one hash
  * partitioning is reused across stages (AQE coalesces the tiny
  * post-aggregation shuffles); the per-user intermediates are one row
  * per user — orders of magnitude smaller than the event stream. The
  * correlation matrix is a single full-scan aggregation with map-side
  * partial combine and a fixed-width (per column pair) result.
  */
object Analytics {

  /** Strict-order funnel: for each user, the earliest time of `steps
    * .head`, then the earliest later occurrence of each subsequent
    * step. A step counts only AFTER the previous step's chosen time
    * (strictly greater — the classic ordered-funnel semantics).
    *
    * Returns one row per user who completed step 1:
    * (user, t1..tN (null once the funnel breaks), steps_completed).
    *
    * Shape: N filtered per-user min-aggregations chained by key-joins —
    * each join input is one row per user, every shuffle is on the user
    * key. No windows over raw events, no per-user event lists. */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val e = events.select(col(userCol).as("user_id"), col(tsCol).as("__ts"),
      col(typeCol).as("__type"))
    val first = e.filter(col("__type") === steps.head)
      .groupBy("user_id").agg(min(col("__ts")).as("t1"))
    val full = steps.zipWithIndex.drop(1).foldLeft(first) {
      case (acc, (step, i)) =>
        val prev = s"t$i"
        val cur = s"t${i + 1}"
        val next = e.filter(col("__type") === step)
          .join(acc.select(col("user_id"), col(prev)), "user_id")
          .filter(col("__ts") > col(prev))
          .groupBy("user_id").agg(min(col("__ts")).as(cur))
        acc.join(next, Seq("user_id"), "left")
    }
    val stepCols = (1 to steps.size).map(i => col(s"t$i"))
    full.withColumn("steps_completed",
      stepCols.map(c => when(c.isNotNull, 1).otherwise(0))
        .reduce(_ + _).cast("int"))
  }

  /** Weekly cohort retention: users are cohorted by the ISO week
    * (Monday-truncated) of their FIRST event; each (cohort, offset)
    * cell counts distinct users from that cohort active `offset` weeks
    * later. Pure date/integer arithmetic — engine-exact.
    *
    * Shape: per-user min (one row per user), key-join back to the
    * per-user-week activity aggregate, then a small grouped count. */
  def weeklyRetention(events: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    val e = events.select(col(userCol).as("user_id"),
      date_trunc("week", col(tsCol)).cast("date").as("week"))
    val cohorts = e.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
    val active = e.distinct()
    active.join(cohorts, "user_id")
      .withColumn("week_offset",
        (datediff(col("week"), col("cohort_week")) / 7).cast("int"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** Exact Pearson correlation for the given column pairs, engine-
    * reproducibly: each value is scaled to integer units (`round(x *
    * 10^scaleDigits)` — exact for fixed-point data like money columns),
    * the five moments (n, Sx, Sy, Sxx, Syy, Sxy) are summed as
    * decimal(38,0) — EXACT integer arithmetic, no float summation-order
    * dependence; a 64-bit sum would overflow at Sxx ~ 6.6e19 for price
    * columns at sf0.1 — and only the final combination runs in doubles
    * (correctly-rounded decimal→double conversions followed by
    * identical IEEE ops on any engine).
    *
    * One full-scan aggregation computes every pair's moments at once
    * (map-side partial combine; result width = 6 doubles per pair). */
  def corrPairs(df: DataFrame, pairs: Seq[(String, String)],
                scaleDigits: Int = 2, outDigits: Int = 6): DataFrame = {
    require(pairs.nonEmpty, "need at least one column pair")
    val unit = math.pow(10, scaleDigits)
    def ints(c: String): Column =
      round(col(c).cast("double") * lit(unit)).cast("long").cast("decimal(38,0)")
    val aggs = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq(
        count(lit(1)).cast("decimal(38,0)").as(s"n_$i"),
        sum(ints(a)).as(s"sx_$i"), sum(ints(b)).as(s"sy_$i"),
        sum(ints(a) * ints(a)).as(s"sxx_$i"),
        sum(ints(b) * ints(b)).as(s"syy_$i"),
        sum(ints(a) * ints(b)).as(s"sxy_$i"))
    }
    val m = df.agg(aggs.head, aggs.tail: _*)
    val rows = pairs.zipWithIndex.map { case ((a, b), i) =>
      val (n, sx, sy) = (col(s"n_$i"), col(s"sx_$i"), col(s"sy_$i"))
      val (sxx, syy, sxy) = (col(s"sxx_$i"), col(s"syy_$i"), col(s"sxy_$i"))
      // decimal(38,0) intermediates stay exact (max ~6e24 << 1e38);
      // double conversion is the FIRST inexact step on either engine
      val num = (n * sxy - sx * sy).cast("double")
      val dx = (n * sxx - sx * sx).cast("double")
      val dy = (n * syy - sy * sy).cast("double")
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        round(num / (sqrt(dx) * sqrt(dy)), outDigits).as("corr"))
    }
    // one scan for ALL pairs: the single aggregate row explodes into
    // one output row per pair (a per-pair union would rescan)
    m.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** First-order (Markov) transition counts over the event stream: for
    * each key, consecutive event types (ordered by (ts, tie)) form a
    * (from, to) pair; returns per-pair counts and the exact row
    * probability n / total(from). Integer counts; the single division
    * is IEEE-identical on any engine.
    *
    * Shape: one key-partitioned lag window (the sessionization
    * partitioning), one grouped count, one broadcast-sized join on the
    * `from` marginal. */
  def transitions(events: DataFrame, keyCol: String, tsCol: String,
                  tieCol: String, typeCol: String,
                  outDigits: Int = 6): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .select(col(keyCol), col(tsCol), col(tieCol), col(typeCol))
      .withColumn("__prev", lag(col(typeCol), 1).over(w))
      .filter(col("__prev").isNotNull)
    val cnt = pairs
      .groupBy(col("__prev").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
    val marginal = cnt.groupBy(col("from_type")).agg(sum(col("n")).as("tot"))
    cnt.join(broadcast(marginal), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("tot"), outDigits).as("p"))
  }

  /** Two-proportion A/B z-test: each unit (e.g. user) lands in variant
    * A or B by `variantIsB`; `converted` marks success. Returns the
    * integer counts per arm plus the pooled-variance z statistic —
    * counts are exact longs, and the final z combination is one fixed
    * IEEE expression, identical on any engine.
    *
    * Shape: ONE full-scan aggregation (conditional sums, map-side
    * combine) — adding arms or metrics adds columns, not passes. */
  def abTest(units: DataFrame, variantIsB: Column, converted: Column,
             outDigits: Int = 6): DataFrame = {
    val isB = variantIsB.cast("boolean")
    val conv = converted.cast("boolean")
    units.agg(
        sum(when(!isB, 1L).otherwise(0L)).as("n_a"),
        sum(when(!isB && conv, 1L).otherwise(0L)).as("conv_a"),
        sum(when(isB, 1L).otherwise(0L)).as("n_b"),
        sum(when(isB && conv, 1L).otherwise(0L)).as("conv_b"))
      .select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
        round(
          (col("conv_a").cast("double") / col("n_a")
            - col("conv_b").cast("double") / col("n_b")) /
          sqrt(((col("conv_a") + col("conv_b")).cast("double")
              / (col("n_a") + col("n_b")))
            * (lit(1.0) - (col("conv_a") + col("conv_b")).cast("double")
              / (col("n_a") + col("n_b")))
            * (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))),
          outDigits).as("z"))
  }

  /** Per-group closed-form OLS (segmented regression): slope,
    * intercept, and R² of y ~ x within each group, from integer-cent
    * moments summed as decimal(38,0) — EXACT accumulation (the
    * [[corrPairs]] discipline: no float summation-order dependence;
    * long Sxx overflows at sf0.1 magnitudes), with the closed-form
    * combination `slope = (n·Sxy − Sx·Sy)/(n·Sxx − Sx²)` in doubles at
    * the end. One grouped full-scan aggregation.
    *
    * Both columns scale by 100 (cents), so the slope is in original
    * units; the intercept converts back via /100. */
  def groupedOls(df: DataFrame, groupCol: String, xCol: String,
                 yCol: String, outDigits: Int = 6): DataFrame = {
    def ints(c: String): Column =
      round(col(c).cast("double") * 100).cast("long").cast("decimal(38,0)")
    val m = df.groupBy(col(groupCol)).agg(
      count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(ints(xCol)).as("sx"), sum(ints(yCol)).as("sy"),
      sum(ints(xCol) * ints(xCol)).as("sxx"),
      sum(ints(xCol) * ints(yCol)).as("sxy"),
      sum(ints(yCol) * ints(yCol)).as("syy"))
    val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val den = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val dy = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    val slope = num / den
    // degenerate groups (constant x -> den = 0, e.g. a single point)
    // return null rather than NaN/Inf
    def guarded(c: Column): Column = when(den =!= 0.0, c)
    m.select(col(groupCol),
      round(guarded(slope), outDigits).as("slope"),
      round(guarded(col("sy").cast("double") / col("n").cast("double")
        - slope * (col("sx").cast("double") / col("n").cast("double")))
        / 100.0, outDigits).as("intercept"),
      round(guarded(num * num / (den * dy)), outDigits).as("r2"))
  }

  /** Period-over-period report: per (series, period) integer counts +
    * exact cent sums, each period joined to the series' PREVIOUS
    * calendar period (an equi-join on `period − interval` — gap-safe,
    * unlike a lag window, which would silently compare across missing
    * periods). Growth ratios are one integer division each — the only
    * IEEE ops, identical on any engine; null when no previous period.
    *
    * Shape: one aggregation + one self-equi-join on the (tiny)
    * per-period table. */
  def periodOverPeriod(events: DataFrame, seriesCol: String, tsCol: String,
                       valCol: Column, truncUnit: String = "week",
                       stepInterval: String = "INTERVAL 7 DAYS",
                       outDigits: Int = 6): DataFrame = {
    val per = events.select(col(seriesCol).as("series"),
        date_trunc(truncUnit, col(tsCol)).as("period"),
        round(valCol * 100).cast("long").as("__cents"))
      .groupBy(col("series"), col("period"))
      .agg(count(lit(1)).as("n"), sum(col("__cents")).as("sum_cents"))
      .localCheckpoint(false) // both join sides reuse it
    val prev = per.select(col("series"),
      (col("period") + expr(stepInterval)).as("period"),
      col("n").as("n_prev"), col("sum_cents").as("sum_cents_prev"))
    per.join(prev, Seq("series", "period"), "left")
      .select(col("series"), col("period"), col("n"), col("sum_cents"),
        col("n_prev"), col("sum_cents_prev"),
        round(col("n").cast("double") / col("n_prev") - 1.0, outDigits)
          .as("wow_n"),
        round(col("sum_cents").cast("double") / col("sum_cents_prev") - 1.0,
          outDigits).as("wow_cents"))
  }

  /** Robust per-group outlier profile: EXACT median and MAD (median
    * absolute deviation) over integer cent units, plus the count of
    * rows beyond `k` MADs. All-integer arithmetic: medians average the
    * two middle values, so everything lives in half-cent (`2·cents`)
    * and the MAD test in `4·cents` units — no float until the final
    * /2.0 and /4.0 (dyadic — exact doubles). Engine-exact.
    *
    * Shape: no per-row window anywhere. Rows aggregate to (group,
    * value)-distinct counts; prefix sums run over DISTINCT values per
    * group (bounded by value cardinality, not row count — the same
    * two-pass rank discipline as AUC/KS). Three aggregations total.
    * For unbounded-cardinality doubles at 100 TB, pre-quantize or use
    * [[Quantiles.approx]]; this is the exact anchor. */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: Column,
                  k: Int = 3): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("v"))
    val wg = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
    def medianOfCounts(counts: DataFrame): DataFrame =
      // counts: (g, v, cnt) distinct-value rows → (g, n, med2 = lo+hi)
      counts
        .withColumn("cum", sum(col("cnt")).over(w))
        .withColumn("n", sum(col("cnt")).over(wg))
        .groupBy(col("g")).agg(
          max(col("n")).as("n"),
          // floor((n+1)/2), floor((n+2)/2): the 1-based lower/upper
          // median positions (equal when n is odd)
          min(when(col("cum") >= floor((col("n") + 1) / 2), col("v"))).as("lo"),
          min(when(col("cum") >= floor((col("n") + 2) / 2), col("v"))).as("hi"))
        .select(col("g"), col("n"), (col("lo") + col("hi")).as("med2"))
    val cents = df.select(col(groupCol).as("g"),
      round(valueCol * 100).cast("long").as("v"))
    val vc = cents.groupBy(col("g"), col("v")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(false) // reused by the deviation pass
    val med = medianOfCounts(vc)
    // deviations in half-cent units, aggregated per DISTINCT (g, dev)
    val dev = vc.join(broadcast(med.select(col("g"), col("med2"))), "g")
      .select(col("g"), abs(lit(2) * col("v") - col("med2")).as("v"), col("cnt"))
      .groupBy(col("g"), col("v")).agg(sum(col("cnt")).as("cnt"))
    val mad = medianOfCounts(dev)
      .select(col("g"), (col("med2")).as("mad4")) // 2·dev2-median = 4·MAD cents
    // dev_cents > k·MAD_cents  ⇔  dev2/2 > k·mad4/4  ⇔  2·dev2 > k·mad4
    val out = dev.join(broadcast(mad), "g")
      .groupBy(col("g")).agg(
        sum(when(lit(2L) * col("v") > lit(k.toLong) * col("mad4"),
          col("cnt")).otherwise(0L)).as("n_outliers"))
    med.join(mad, "g").join(out, "g")
      .select(col("g").as(groupCol), col("n"),
        (col("med2") / 2.0).as("median"),
        (col("mad4") / 4.0).as("mad"), col("n_outliers"))
  }

  /** Per-group feature scaling — the three standard normalizations in
    * one pass: z-score ((x - mean)/stddev_pop), min-max ((x - min)/
    * (max - min)), and robust ((x - median)/IQR, Tukey), each against
    * its group's statistics.
    *
    * Shape: ONE grouped aggregation produces every statistic (the
    * percentile aggregate buffers per-group values — fine for bounded
    * group cardinality; at 100 TB per-group value counts swap in the
    * distinct-value prefix-sum quantiles of [[Quantiles.groupPctsScale]]
    * as the stats source), the tiny stats table broadcasts back, and
    * scaling is a narrow codegen'd projection. Degenerate groups
    * (constant value: sd = 0, max = min, IQR = 0) yield null for the
    * affected scale rather than a division blowup. */
  def scaleByGroup(df: DataFrame, groupCol: Column, valueCol: Column)
      : DataFrame = {
    val x = df.withColumn("__g", groupCol).withColumn("__x",
      valueCol.cast("double"))
    val stats = x.groupBy(col("__g")).agg(
      avg(col("__x")).as("mean"),
      stddev_pop(col("__x")).as("sd"),
      min(col("__x")).as("mn"),
      max(col("__x")).as("mx"),
      expr("percentile(__x, 0.25)").as("p25"),
      expr("percentile(__x, 0.5)").as("p50"),
      expr("percentile(__x, 0.75)").as("p75"))
    x.join(broadcast(stats), Seq("__g"))
      .withColumn("z",
        when(col("sd") > 0, (col("__x") - col("mean")) / col("sd")))
      .withColumn("minmax",
        when(col("mx") > col("mn"),
          (col("__x") - col("mn")) / (col("mx") - col("mn"))))
      .withColumn("robust",
        when(col("p75") > col("p25"),
          (col("__x") - col("p50")) / (col("p75") - col("p25"))))
      .drop("__g", "__x", "mean", "sd", "mn", "mx", "p25", "p50", "p75")
  }

  /** Hour-of-week seasonal profile per key: (day-of-week, hour) cells
    * with row counts, exact cent sums, and each cell's ppm share of
    * its key's total — the load/traffic shape behind ingestion
    * scheduling and anomaly baselines. Day-of-week is computed as
    * `pmod(epoch_days + 4, 7)` (0 = Sunday) — pure integer arithmetic,
    * sidestepping the engines' disagreeing dayofweek() conventions.
    * One grouped aggregation + one broadcast-sized key-total join. */
  def seasonalProfile(df: DataFrame, keyCol: String, tsCol: String,
                      valueCol: String): DataFrame = {
    val cells = df
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(keyCol),
        pmod(datediff(col(tsCol).cast("date"),
          lit("1970-01-01").cast("date")) + 4, lit(7)).as("dow"),
        hour(col(tsCol)).as("hour"),
        round(col(valueCol).cast("double") * 100).cast("long").as("__xc"))
      .groupBy(col(keyCol), col("dow"), col("hour"))
      .agg(count(lit(1)).as("n"), sum(col("__xc")).as("sum_cents"))
    val totals = cells.groupBy(col(keyCol)).agg(sum(col("n")).as("__tot"))
    cells.join(totals, keyCol)
      .select(col(keyCol), col("dow"), col("hour"), col("n"),
        col("sum_cents"),
        expr("n * 1000000 div __tot").as("share_ppm"))
  }

  /** Mutual information (and the two marginal entropies) between two
    * categorical columns — "how much does source predict language",
    * the dependence diagnostic behind mixture / dedup stratification
    * decisions.
    *
    * Cross-engine discipline for the ln() sums: each cell/marginal
    * term is ONE mirrored double expression rounded to 1e-9, and the
    * rounded terms sum as DECIMAL(38,9) — exact, order-independent —
    * before the final rounding. (The same per-term-round-then-
    * decimal-sum recipe as the PMI / KL-drift oracles.) Shape: one
    * grouped count for the joint (|A|·|B| observed cells), two
    * marginal aggregations, broadcast-sized joins. */
  def mutualInfo(df: DataFrame, colA: String, colB: String,
                 outDigits: Int = 6): DataFrame = {
    val base = df.filter(col(colA).isNotNull && col(colB).isNotNull)
      .select(col(colA).as("__a"), col(colB).as("__b"))
      .localCheckpoint(false) // joint + two marginals reuse
    val n = base.count()
    require(n > 0, "no non-null rows")
    val joint = base.groupBy(col("__a"), col("__b"))
      .agg(count(lit(1)).as("n_ab"))
    val ma = base.groupBy(col("__a")).agg(count(lit(1)).as("n_a"))
    val mb = base.groupBy(col("__b")).agg(count(lit(1)).as("n_b"))
    def dec(c: Column): Column = c.cast("decimal(38,9)")
    val mi = joint.join(ma, "__a").join(mb, "__b")
      .select(round((col("n_ab").cast("double") / n) *
        log(col("n_ab").cast("double") * n /
          (col("n_a").cast("double") * col("n_b"))), 9).as("__t"))
      .agg(sum(dec(col("__t"))).as("__mi"))
    def entropy(m: DataFrame, cnt: String): DataFrame = m
      .select(round((col(cnt).cast("double") / n) *
        log(col(cnt).cast("double") / n), 9).as("__t"))
      .agg((-sum(dec(col("__t")))).as("__h"))
    mi.crossJoin(entropy(ma, "n_a").select(col("__h").as("__ha")))
      .crossJoin(entropy(mb, "n_b").select(col("__h").as("__hb")))
      .select(lit(n).as("n"),
        round(col("__mi"), outDigits).cast("double").as("mi_nats"),
        round(col("__ha"), outDigits).cast("double").as("h_a"),
        round(col("__hb"), outDigits).cast("double").as("h_b"))
  }

  /** EXACT rolling distinct actors (DAU / trailing-window WAU): the
    * retention dashboard's exact counterpart — no HLL error. The
    * trailing window is an EXPLODE of each (actor, day) into the
    * `windowDays` target days it covers (equi-aggregation — never a
    * non-equi range join), then a two-level distinct reduce; both
    * shapes are corpus-linear × windowDays. */
  def rollingDistinct(df: DataFrame, keyCol: String, tsCol: String,
                      windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1 && windowDays <= 366,
      s"windowDays must be in [1, 366], got $windowDays")
    val days = df.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("__k"), col(tsCol).cast("date").as("__d"))
      .distinct()
      .localCheckpoint(false) // dau + window explode reuse
    val dau = days.groupBy(col("__d").as("d"))
      .agg(count(lit(1)).as("dau"))
    val wau = days
      .select(col("__k"), explode(sequence(lit(0), lit(windowDays - 1)))
        .as("__o"), col("__d"))
      .select(col("__k"), date_add(col("__d"), col("__o")).as("d"))
      .distinct()
      .groupBy(col("d")).agg(count(lit(1)).as(s"rolling_$windowDays"))
    dau.join(wau, Seq("d"))
      .select(col("d"), col("dau"), col(s"rolling_$windowDays"))
  }

  /** Top k 3-step behavior paths: consecutive event-type trigrams per
    * actor (ordered by (ts, tie)), counted corpus-wide — the "what do
    * users actually do" extension of first-order [[transitions]].
    * One keyed double-lag window + one grouped count; the top-k pick
    * is TakeOrdered with a deterministic (count desc, path asc)
    * ordering. Returns (path, n). */
  def sessionPaths(events: DataFrame, keyCol: String, tsCol: String,
                   tieCol: String, typeCol: String, k: Int = 20): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    events
      .select(col(keyCol), col(tsCol), col(tieCol), col(typeCol))
      .withColumn("__p1", lag(col(typeCol), 1).over(w))
      .withColumn("__p2", lag(col(typeCol), 2).over(w))
      .filter(col("__p1").isNotNull && col("__p2").isNotNull)
      .select(concat_ws(">", col("__p2"), col("__p1"), col(typeCol)).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(k)
  }

  /** Conversion-lag histogram: for each actor with a `fromType` event,
    * the day gap to their first `toType` event AT OR AFTER the first
    * `fromType` — the time-to-convert distribution behind funnel SLAs.
    * Two grouped min aggregations + one equi-join on the actor key
    * (the ts comparison is a post-join filter, never a range join).
    * Returns the integral histogram (lag_days, n_users). */
  def conversionLag(events: DataFrame, keyCol: String, tsCol: String,
                    typeCol: String, fromType: String,
                    toType: String): DataFrame = {
    val base = events.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
    val first = base.filter(col(typeCol) === fromType)
      .groupBy(col(keyCol).as("u")).agg(min(col(tsCol)).as("t0"))
    val conv = base.filter(col(typeCol) === toType)
      .select(col(keyCol).as("u"), col(tsCol).as("t1"))
      .join(first, Seq("u"))
      .filter(col("t1") >= col("t0"))
      .groupBy(col("u"), col("t0")).agg(min(col("t1")).as("t1"))
    conv
      .select(datediff(to_date(col("t1")), to_date(col("t0"))).cast("long")
        .as("lag_days"))
      .groupBy("lag_days").agg(count(lit(1)).as("n_users"))
      .orderBy("lag_days")
  }

  /** New-user growth curve: per first-seen day, how many actors
    * appeared for the first time and the cumulative total — the
    * acquisition view the DAU series cannot give. One per-actor min
    * aggregation (corpus-linear); the cumulative sum runs over the
    * bounded day grid. Returns (d, new_users, cum_users). */
  def userGrowth(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val firstSeen = df
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(min(col(tsCol).cast("date")).as("d"))
      .groupBy(col("d"))
      .agg(count(lit(1)).as("new_users"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("d")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    firstSeen
      .withColumn("cum_users", sum(col("new_users")).over(w))
      .orderBy("d")
  }

  /** RFM (recency / frequency / monetary) customer segmentation with
    * DISTRIBUTED quartile assignment: each metric ranks through
    * [[Ranking.globalRank]]'s two-pass range-partitioned scan (ties
    * broken by the customer key, so bucket assignment is fully
    * deterministic), never a single-partition ntile. Scores are 1–4
    * with recency inverted (most recent = 4); segment = r·100 + f·10
    * + m. Three rank passes + two equi-joins on the customer key.
    * Returns (key, recency_days, frequency, monetary_cents, r, f, m,
    * segment). */
  def rfmSegments(orders: DataFrame, keyCol: String, tsCol: String,
                  valueCol: String, scaleDigits: Int = 2): DataFrame = {
    val unit = math.pow(10, scaleDigits)
    val vc = round(col(valueCol).cast("double") * lit(unit)).cast("long")
    val base = orders
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull
        && col(valueCol).isNotNull)
    val maxDay = base.agg(max(to_date(col(tsCol)))).head().getDate(0)
    val perKey = base.groupBy(col(keyCol).as("k"))
      .agg(datediff(lit(maxDay), max(to_date(col(tsCol)))).cast("long")
        .as("recency_days"),
        count(lit(1)).as("frequency"),
        sum(vc).as("monetary_cents"))
      .localCheckpoint(false) // three rank passes reuse
    def score(metric: String, invert: Boolean): DataFrame = {
      val ranked = Ranking.globalRank(
        perKey.select(col("k"), col(metric)),
        Seq(col(metric), col("k")), nBuckets = 4)
      val s = if (invert) lit(4L) - col("bucket") else col("bucket") + 1L
      ranked.select(col("k"), s.as(s"__s_$metric"))
    }
    perKey
      .join(score("recency_days", invert = true), Seq("k"))
      .join(score("frequency", invert = false), Seq("k"))
      .join(score("monetary_cents", invert = false), Seq("k"))
      .select(col("k").as(keyCol), col("recency_days"), col("frequency"),
        col("monetary_cents"),
        col("__s_recency_days").as("r"), col("__s_frequency").as("f"),
        col("__s_monetary_cents").as("m"),
        (col("__s_recency_days") * 100 + col("__s_frequency") * 10
          + col("__s_monetary_cents")).as("segment"))
      .orderBy(keyCol)
  }

  /** Engagement-depth histogram: how many actors were active on
    * exactly N distinct days — the loyalty distribution behind
    * retention targets. Two grouped counts over the distinct
    * (actor, day) reduction. Returns (active_days, n_users). */
  def engagementDepth(df: DataFrame, keyCol: String,
                      tsCol: String): DataFrame =
    df.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("k"), col(tsCol).cast("date").as("d"))
      .distinct()
      .groupBy(col("k")).agg(count(lit(1)).as("active_days"))
      .groupBy(col("active_days")).agg(count(lit(1)).as("n_users"))
      .orderBy("active_days")

  /** DAU/WAU stickiness per day — "what share of the trailing window's
    * actives showed up today", the engagement-frequency dial. Rides on
    * [[rollingDistinct]]'s exact explode-based trailing window (no HLL
    * error) and adds one integral floored-ppm ratio. The leading
    * `windowDays − 1` days carry partial windows, as in any trailing
    * metric. Returns (d, dau, rolling_N, stickiness_ppm). */
  def stickiness(df: DataFrame, keyCol: String, tsCol: String,
                 windowDays: Int = 7): DataFrame =
    rollingDistinct(df, keyCol, tsCol, windowDays)
      .withColumn("stickiness_ppm",
        expr(s"dau * 1000000 div rolling_$windowDays"))
      .orderBy("d")

  /** Seasonal-residual anomalies: subtract each event's hour-of-week
    * cell mean ([[seasonalProfile]]'s grid) from its value and count
    * exceedances — the "is this spike real or just Friday night"
    * detrending step before alerting. All integer: cell means are
    * integral `sum_cents div n` floors, residuals are cent
    * differences. One grid aggregation + one grid join + one per-key
    * rollup. */
  def seasonalResiduals(df: DataFrame, keyCol: String, tsCol: String,
                        valueCol: String, threshCents: Long): DataFrame = {
    require(threshCents > 0, s"threshCents must be positive, got $threshCents")
    val base = df
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(keyCol),
        pmod(datediff(col(tsCol).cast("date"),
          lit("1970-01-01").cast("date")) + 4, lit(7)).as("dow"),
        hour(col(tsCol)).as("hour"),
        round(col(valueCol).cast("double") * 100).cast("long").as("__xc"))
      .localCheckpoint(false) // grid + residual join reuse
    val cells = base.groupBy(col(keyCol), col("dow"), col("hour"))
      .agg(expr("sum(__xc) div count(1)").as("__mean"))
    base.join(cells, Seq(keyCol, "dow", "hour"))
      .select(col(keyCol), (col("__xc") - col("__mean")).as("__r"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        max(abs(col("__r"))).as("max_abs_resid_cents"),
        sum((abs(col("__r")) > threshCents).cast("long")).as("n_beyond"))
  }

  /** Chi-square test of independence between two categorical columns
    * (+ Cramér's V effect size) — the frequentist counterpart of
    * [[mutualInfo]] over the same contingency table, sharing its
    * cross-engine discipline: each cell contribution
    * `(o − e)²/e` is ONE mirrored double expression rounded at 1e-9,
    * summed as DECIMAL(38,9); dof and N are integers; Cramér's V is
    * one final mirrored double. One joint + two marginal
    * aggregations. */
  def chiSquare(df: DataFrame, colA: String, colB: String,
                outDigits: Int = 6): DataFrame = {
    val base = df.filter(col(colA).isNotNull && col(colB).isNotNull)
      .select(col(colA).as("__a"), col(colB).as("__b"))
      .localCheckpoint(false)
    val n = base.count()
    require(n > 0, "no non-null rows")
    val joint = base.groupBy(col("__a"), col("__b"))
      .agg(count(lit(1)).as("n_ab"))
    val ma = base.groupBy(col("__a")).agg(count(lit(1)).as("n_a"))
    val mb = base.groupBy(col("__b")).agg(count(lit(1)).as("n_b"))
    val ka = ma.count(); val kb = mb.count()
    val dof = (ka - 1) * (kb - 1)
    // Σ_all (o−e)²/e = Σ_observed o²/e − N  (cells absent from the
    // joint table have o = 0 and contribute exactly their e, which the
    // −N term absorbs — no zero-cell enumeration needed)
    val e = col("n_a").cast("double") * col("n_b") / n
    val chi = joint.join(ma, "__a").join(mb, "__b")
      .select(round(col("n_ab").cast("double") * col("n_ab") / e, 9)
        .as("__t"))
      .agg((sum(col("__t").cast("decimal(38,9)")) - n).as("__chi"))
    val minDim = math.min(ka, kb) - 1
    chi.select(lit(n).as("n"), lit(dof).as("dof"),
      round(col("__chi"), outDigits).cast("double").as("chi2"),
      when(lit(minDim) > 0,
        round(sqrt(col("__chi").cast("double") / (n.toDouble * minDim)),
          outDigits)).as("cramers_v"))
  }

  /** Winsorized per-group summary: values clipped at the group's exact
    * [pLo, pHi] percentiles — the robust-statistics companion to
    * [[Quantiles]] (outlier-proof means for quality-score dashboards).
    * Reports the clip counts and the cent-sum of the clipped values —
    * a compact audit row per group; apply the same `least/greatest`
    * expression row-wise for the full clipped table.
    *
    * The grouped `percentile` buffers per-group values (the exact
    * anchor, like q_group_pcts); the declared scale path for unbounded
    * groups is [[Quantiles.exactScale]]'s prefix-sum discipline. */
  def winsorizedStats(df: DataFrame, groupCol: String, valueCol: String,
                      pLo: Double = 0.01, pHi: Double = 0.99): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, "need 0 <= pLo < pHi <= 1")
    val bounds = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(expr(s"percentile($valueCol, $pLo)").as("__lo"),
        expr(s"percentile($valueCol, $pHi)").as("__hi"))
    val clipped = least(greatest(col(valueCol).cast("double"), col("__lo")),
      col("__hi"))
    df.filter(col(valueCol).isNotNull)
      .join(bounds, groupCol)
      .select(col(groupCol), col(valueCol), col("__lo"), col("__hi"),
        clipped.as("__c"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum((col(valueCol) < col("__lo")).cast("long")).as("n_clipped_lo"),
        sum((col(valueCol) > col("__hi")).cast("long")).as("n_clipped_hi"),
        round(min(col("__lo")), 6).as("lo"),
        round(min(col("__hi")), 6).as("hi"),
        sum(round(col("__c") * 100).cast("long")).as("winsorized_cents"))
  }

  /** Per-group Gini concentration of a non-negative integer value —
    * "how unequal are per-domain document sizes / token budgets", the
    * standard inequality diagnostic for corpus-mixture decisions.
    *
    * Exact integral form over ascending ranks i = 1..n:
    *   gini = Σ(2i − n − 1)·x_i / (n·Σx)
    * computed as `(2·Σ i·x_i − (n+1)·Σx) · 1e6 div (n·Σx)` — Long
    * arithmetic end to end. The rank window is partitioned by group
    * (ties in any order: equal x share a contiguous rank block and
    * Σ(2i−n−1) over a block is permutation-invariant, so the statistic
    * is deterministic). One keyed window + one grouped aggregation. */
  def giniBy(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__x"))
    df.filter(col(valueCol).isNotNull && col(valueCol) >= 0)
      .select(col(groupCol), col(valueCol).cast("long").as("__x"))
      .withColumn("__i", row_number().over(w).cast("long"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col("__x")).as("total"),
        sum(col("__i") * col("__x")).as("__ix"))
      .select(col(groupCol), col("n"), col("total"),
        when(col("total") > 0,
          expr("(2 * __ix - (n + 1) * total) * 1000000 div (n * total)"))
          .as("gini_ppm"))
  }

  /** Top movers between consecutive periods: the k series-periods with
    * the largest ABSOLUTE cent delta vs the prior period — "what
    * changed most this week", the triage view over
    * [[periodOverPeriod]]'s full table. The delta is exact integer
    * cents, so the ordering is deterministic; ties break on
    * (series, period). TakeOrdered(k) — never a global sort. */
  def topMovers(events: DataFrame, seriesCol: String, tsCol: String,
                valCol: Column, k: Int = 10): DataFrame =
    periodOverPeriod(events, seriesCol, tsCol, valCol)
      .filter(col("sum_cents_prev").isNotNull)
      .select(col("series"), col("period"), col("sum_cents"),
        col("sum_cents_prev"),
        (col("sum_cents") - col("sum_cents_prev")).as("delta_cents"))
      .orderBy(abs(col("delta_cents")).desc, col("series"), col("period"))
      .limit(k)

  /** Out-of-orderness (lateness) profile of an event stream: for each
    * event, lateness = high-watermark timestamp among STRICTLY EARLIER
    * arrivals (by `seqCol`) minus its own timestamp, clamped at 0 —
    * the measurement that picks a Structured Streaming watermark delay.
    * The running maximum runs as the repo's two-pass range-partitioned
    * prefix scan (per-partition maxima broadcast back as exclusive
    * offsets), so no stage sees more than its range slice. Returns the
    * integral histogram (bucket_start_s, n_events) with
    * `bucketSeconds`-wide buckets. */
  def latenessProfile(events: DataFrame, seqCol: String, tsCol: String,
                      bucketSeconds: Long = 600): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    val base = events
      .filter(col(seqCol).isNotNull && col(tsCol).isNotNull)
      .select(col(seqCol).cast("long").as("seq"),
        col(tsCol).cast("long").as("t"))
      .repartitionByRange(col("seq"))
      .sortWithinPartitions("seq")
    val rdd = base.rdd.map(r => (r.getLong(0), r.getLong(1)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val partMax = rdd.mapPartitionsWithIndex { (i, it) =>
        var m = Long.MinValue
        it.foreach { case (_, t) => if (t > m) m = t }
        Iterator((i, m))
      }.collect().sortBy(_._1)
      val offs = new Array[Long](math.max(rdd.getNumPartitions, 1))
      var acc = Long.MinValue
      partMax.foreach { case (i, m) => offs(i) = acc; acc = math.max(acc, m) }
      val bcOff = rdd.sparkContext.broadcast(offs)
      val lateness = rdd.mapPartitionsWithIndex { (i, it) =>
        var run = bcOff.value(i)
        it.map { case (_, t) =>
          val lat = if (run == Long.MinValue) 0L else math.max(0L, run - t)
          if (t > run) run = t
          lat
        }
      }.toDF("lat")
      lateness
        .groupBy((expr(s"lat div $bucketSeconds") * bucketSeconds)
          .as("bucket_start_s"))
        .agg(count(lit(1)).as("n_events"))
        .orderBy("bucket_start_s")
        // materialize before unpersist: one bounded histogram
        .localCheckpoint(true)
    } finally { rdd.unpersist(blocking = false); () }
  }

  /** Cohort LTV curves: cumulative cent revenue per signup cohort by
    * age — "how much is a week-N cohort worth by week M", the growth
    * accounting behind payback windows. Cohort = each actor's
    * first-seen week; one grouped cent-sum per (cohort, age) cell;
    * the cumulative window is keyed by cohort and bounded by the
    * calendar span. All integral; per-user normalization is a floored
    * milli division. Returns (cohort_week, age_week, n_users,
    * rev_cents, cum_rev_cents, cum_per_user_milli). */
  def cohortLtv(events: DataFrame, keyCol: String, tsCol: String,
                valueCol: String, scaleDigits: Int = 2): DataFrame = {
    val unit = math.pow(10, scaleDigits)
    val vc = round(col(valueCol).cast("double") * lit(unit)).cast("long")
    val base = events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull
        && col(valueCol).isNotNull)
    val minDay = base.agg(min(to_date(col(tsCol)))).head().getDate(0)
    val withWeek = base.select(col(keyCol).as("u"),
      expr(s"datediff(to_date($tsCol), date'$minDay') div 7").as("w"),
      vc.as("vc"))
      .localCheckpoint(false) // cohort map + revenue cells reuse
    val cohorts = withWeek.groupBy("u").agg(min(col("w")).as("cohort_week"))
    val sizes = cohorts.groupBy("cohort_week").agg(count(lit(1)).as("n_users"))
    val cells = withWeek.join(cohorts, Seq("u"))
      .groupBy(col("cohort_week"), (col("w") - col("cohort_week")).as("age_week"))
      .agg(sum(col("vc")).as("rev_cents"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cohort_week")).orderBy(col("age_week"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    cells
      .withColumn("cum_rev_cents", sum(col("rev_cents")).over(wCum))
      .join(sizes, Seq("cohort_week"))
      .select(col("cohort_week"), col("age_week"), col("n_users"),
        col("rev_cents"), col("cum_rev_cents"),
        expr("cum_rev_cents * 10 div n_users").as("cum_per_user_milli"))
      .orderBy("cohort_week", "age_week")
  }

  /** Navigation predictability: Shannon entropy of the next-event
    * distribution per predecessor type — "how deterministic is user
    * behavior after X", the information-theoretic read of the
    * [[transitions]] matrix. Counts exact; each per-prev entropy sums
    * a handful of ln terms and rounds once. Returns
    * (from_type, n, h_nats). */
  def navEntropy(events: DataFrame, keyCol: String, tsCol: String,
                 tieCol: String, typeCol: String,
                 outDigits: Int = 6): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .select(col(keyCol), col(tsCol), col(tieCol), col(typeCol))
      .withColumn("__prev", lag(col(typeCol), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("c"))
    val totals = pairs.groupBy("from_type").agg(sum(col("c")).as("n"))
    pairs.join(totals, Seq("from_type"))
      .groupBy(col("from_type"), col("n"))
      .agg(round(sum((col("c").cast("double") / col("n").cast("double"))
        * log(col("n").cast("double") / col("c").cast("double"))), outDigits)
        .as("h_nats"))
      .orderBy("from_type")
  }

  /** Conformal prediction interval from exact-moment OLS: fit
    * y ~ x by the decimal-moment closed form (both engines derive
    * IDENTICAL double coefficients from identical exact integers),
    * quantize absolute residuals to cents, and take the weighted
    * LOWER quantile at `permille` through
    * [[Quantiles.weightedExactScale]]'s bounded two-pass scan — the
    * distribution-free "±q covers p% of points" guarantee band.
    * Returns one row (n, slope, intercept, q_permille,
    * q_resid_cents). */
  def conformalInterval(df: DataFrame, xCol: String, yCol: String,
                        permille: Int = 900, scaleDigits: Int = 2,
                        outDigits: Int = 6): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val unit = math.pow(10, scaleDigits)
    def ic(c: String) = round(col(c).cast("double") * lit(unit))
      .cast("long").cast("decimal(38,0)")
    // prune to the two live columns BEFORE the checkpoint: the reuse
    // only needs (x, y), not the full input width (round 16 — the
    // full-width checkpoint was most of this operator's wall)
    val base = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol), col(yCol))
      .localCheckpoint(false) // moments + residual pass reuse
    val m = base.agg(count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(ic(xCol)).as("sx"), sum(ic(yCol)).as("sy"),
      sum(ic(xCol) * ic(xCol)).as("sxx"),
      sum(ic(xCol) * ic(yCol)).as("sxy")).head()
    val Seq(n, sx, sy, sxx, sxy) =
      (0 until 5).map(i => BigDecimal(m.getDecimal(i)))
    require(n > 1, "need n > 1")
    // cent-scale moments cancel: slope is unit-free, intercept in units
    val b = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    val a = (sy.toDouble - b * sx.toDouble) / n.toDouble / unit
    val resid = base.select(
      round(abs(col(yCol).cast("double")
        - (lit(a) + lit(b) * col(xCol).cast("double"))) * lit(unit))
        .cast("long").as("rc"))
      .withColumn("w", lit(1L))
    val q = Quantiles.weightedExactScale(resid, "rc", "w", Seq(permille))
      .head()
    def r6(x: Double) = BigDecimal(x)
      .setScale(outDigits, BigDecimal.RoundingMode.HALF_UP).toDouble
    Seq((n.toLong, r6(b), r6(a), permille.toLong,
      q.getAs[Double]("value")))
      .toDF("n", "slope", "intercept", "q_permille", "q_resid_cents")
  }

  /** Lorenz curve by deciles: each tenth of keys (poorest→richest by
    * summed cent mass, ties broken by key) with its mass and the
    * cumulative share — the full inequality curve behind the single
    * Gini number and the [[CorpusStats.paretoCurve]] top-k view.
    * Decile assignment runs through [[Ranking.globalRank]]'s two-pass
    * scan; the cumulative window sees only `nBuckets` rows. All
    * integral. Returns (decile, n_keys, mass_cents, cum_share_ppm). */
  def lorenzDeciles(df: DataFrame, keyCol: String, valueCol: String,
                    scaleDigits: Int = 2, nBuckets: Int = 10): DataFrame = {
    require(nBuckets >= 2, "need at least 2 buckets")
    val unit = math.pow(10, scaleDigits)
    val vc = round(col(valueCol).cast("double") * lit(unit)).cast("long")
    val mass = df
      .filter(col(keyCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(keyCol).as("k")).agg(sum(vc).as("cents"))
    val ranked = Ranking.globalRank(mass, Seq(col("cents"), col("k")),
      nBuckets = nBuckets)
    val per = ranked.groupBy(col("bucket").as("decile"))
      .agg(count(lit(1)).as("n_keys"), sum(col("cents")).as("mass_cents"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("decile")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    per
      .withColumn("__cum", sum(col("mass_cents")).over(w))
      .crossJoin(broadcast(per.agg(sum(col("mass_cents")).as("__tot"))))
      .select(col("decile"), col("n_keys"), col("mass_cents"),
        expr("__cum * 1000000 div __tot").as("cum_share_ppm"))
      .orderBy("decile")
  }

  /** Price–volume–mix decomposition of the revenue change between two
    * periods (split at `splitDays` after the corpus min date), per
    * matched product: PE = Σ(p₂−p₁)·q₁, VE = Σp₁·(q₂−q₁), MIX =
    * Σ(p₂−p₁)(q₂−q₁), with unit prices as FLOORED milli-cent
    * integers (`rev·1000 div units`) so every term — and the flooring
    * residue, reported explicitly as `resid_milli` — is engine-exact.
    * New / discontinued products contribute their whole mass to
    * dedicated columns instead of polluting the matched effects. Two
    * grouped aggregations + one full outer join on the product key.
    * Returns one row. */
  def priceVolumeMix(df: DataFrame, keyCol: String, tsCol: String,
                     valueCol: String, qtyCol: String,
                     splitDays: Int = 15, scaleDigits: Int = 2): DataFrame = {
    val unit = math.pow(10, scaleDigits)
    val base = df.filter(col(tsCol).isNotNull && col(valueCol).isNotNull
      && col(qtyCol).isNotNull)
    val minDay = base.agg(min(to_date(col(tsCol)))).head().getDate(0)
    def period(pre: Boolean) = {
      val f = datediff(to_date(col(tsCol)), lit(minDay)) < lit(splitDays)
      base.filter(if (pre) f else !f)
        .groupBy(col(keyCol).as("k"))
        .agg(sum(round(col(valueCol).cast("double") * lit(unit)).cast("long"))
          .as(if (pre) "r1" else "r2"),
          sum(round(col(qtyCol)).cast("long"))
            .as(if (pre) "q1" else "q2"))
    }
    val joined = period(pre = true)
      .join(period(pre = false), Seq("k"), "full_outer")
    joined.agg(
      sum(when(col("r1").isNotNull && col("r2").isNotNull, 1L)
        .otherwise(0L)).as("n_matched"),
      sum(when(col("r1").isNull, 1L).otherwise(0L)).as("n_new"),
      sum(when(col("r2").isNull, 1L).otherwise(0L)).as("n_dropped"),
      sum(when(col("r1").isNotNull && col("r2").isNotNull,
        col("r2") - col("r1")).otherwise(0L)).as("delta_matched_cents"),
      sum(when(col("r1").isNotNull && col("r2").isNotNull
        && col("q1") > 0 && col("q2") > 0,
        (expr("r2 * 1000 div q2") - expr("r1 * 1000 div q1")) * col("q1"))
        .otherwise(0L)).as("price_effect_milli"),
      sum(when(col("r1").isNotNull && col("r2").isNotNull
        && col("q1") > 0 && col("q2") > 0,
        expr("r1 * 1000 div q1") * (col("q2") - col("q1")))
        .otherwise(0L)).as("volume_effect_milli"),
      sum(when(col("r1").isNotNull && col("r2").isNotNull
        && col("q1") > 0 && col("q2") > 0,
        (expr("r2 * 1000 div q2") - expr("r1 * 1000 div q1"))
          * (col("q2") - col("q1"))).otherwise(0L)).as("mix_effect_milli"),
      sum(when(col("r1").isNull, col("r2")).otherwise(0L)).as("new_mass_cents"),
      sum(when(col("r2").isNull, col("r1")).otherwise(0L))
        .as("dropped_mass_cents"))
      .withColumn("resid_milli",
        col("delta_matched_cents") * 1000 - col("price_effect_milli")
          - col("volume_effect_milli") - col("mix_effect_milli"))
  }

  /** Quadratic trend of the weekly `valueCol` sum — "is growth
    * accelerating or saturating", the curvature question the linear
    * OLS trend cannot answer. One grouped cent-sum builds the weekly
    * series (x = gap-safe week index); the 3×3 normal equations solve
    * by CRAMER'S RULE over EXACT integral moments (n ≤ ~5k weeks ⇒
    * every determinant term < 10³⁸, BigInt on the driver, HUGEINT in
    * the oracle), so the whole fit is engine-exact up to the three
    * final double divisions. Returns one row
    * (n_weeks, c0, c1, c2) with y = c0 + c1·x + c2·x² in original
    * units per week. */
  def quadTrend(df: DataFrame, dateCol: String, valueCol: String,
                scaleDigits: Int = 2, outDigits: Int = 6): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val unit = math.pow(10, scaleDigits)
    val vc = round(col(valueCol).cast("double") * lit(unit)).cast("long")
    val base = df.filter(col(valueCol).isNotNull && col(dateCol).isNotNull)
    val minDay = base.agg(min(to_date(col(dateCol)))).head().getDate(0)
    val weekly = base
      .groupBy(expr(s"datediff(to_date($dateCol), date'$minDay') div 7")
        .as("x"))
      .agg(sum(vc).as("y"))
    def dd(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val m = weekly.agg(
      count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(dd(col("x"))).as("sx"),
      sum(dd(col("x")) * dd(col("x"))).as("sx2"),
      sum(dd(col("x")) * dd(col("x")) * dd(col("x"))).as("sx3"),
      sum(dd(col("x")) * dd(col("x")) * dd(col("x")) * dd(col("x"))).as("sx4"),
      sum(dd(col("y"))).as("sy"),
      sum(dd(col("x")) * dd(col("y"))).as("sxy"),
      sum(dd(col("x")) * dd(col("x")) * dd(col("y"))).as("sx2y")).head()
    val Seq(n, sx, sx2, sx3, sx4, sy, sxy, sx2y) =
      (0 until 8).map(i => BigInt(m.getDecimal(i).toBigInteger))
    require(n >= 3, "need at least 3 weeks")
    def det3(a: BigInt, b: BigInt, c: BigInt, d: BigInt, e: BigInt,
             f: BigInt, g: BigInt, h: BigInt, i: BigInt): BigInt =
      a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)
    val det = det3(n, sx, sx2, sx, sx2, sx3, sx2, sx3, sx4)
    require(det != 0, "degenerate design (all weeks identical)")
    val d0 = det3(sy, sx, sx2, sxy, sx2, sx3, sx2y, sx3, sx4)
    val d1 = det3(n, sy, sx2, sx, sxy, sx3, sx2, sx2y, sx4)
    val d2 = det3(n, sx, sy, sx, sx2, sxy, sx2, sx3, sx2y)
    def r6(x: Double) = BigDecimal(x)
      .setScale(outDigits, BigDecimal.RoundingMode.HALF_UP).toDouble
    // one double division per coefficient, then the cent rescale
    Seq((n.toLong, r6(d0.toDouble / det.toDouble / unit),
      r6(d1.toDouble / det.toDouble / unit),
      r6(d2.toDouble / det.toDouble / unit)))
      .toDF("n_weeks", "c0", "c1", "c2")
  }

  /** Log-rank test between two cohorts' survival curves — "does
    * variant A churn faster", the hypothesis-test companion to
    * [[kaplanMeier]]. Per event time t: observed group-1 events d1t
    * vs the expectation d_t·n1t/n_t under equal hazards, variance
    * d_t·(n1t/n_t)(1−n1t/n_t)(n_t−d_t)/(n_t−1); Z = Σ(O−E)/√ΣV.
    * Same lifetime/censoring construction as kaplanMeier; the grid,
    * suffix-sum n_risk and the per-cell terms all live on the
    * bounded duration grid (≤ calendar span rows — the ln-surv
    * summation discipline). Returns one row
    * (n_1, n_2, d_1, exp_1, z_logrank). */
  /** Cox proportional-hazards SCORE test + one-step estimator for a
    * single per-user covariate (Cox 1972; Breslow tie handling): at
    * β = 0 the partial-likelihood score is
    * U = Σ_t (sx_t − d_t·x̄(R_t)) and the information is
    * I = Σ_t d_t·(x̄²(R_t) − x̄(R_t)²) over the event-time grid, with
    * risk set R_t = users whose lifetime ≥ t. Reports the score z =
    * U/√I (the log-rank generalization to a CONTINUOUS covariate) and
    * the one-step estimate β₁ = U/I — the standard first Newton step
    * toward the Cox MLE from the null.
    *
    * Same fully-observed lifetime construction as [[kaplanMeier]] /
    * [[logRank]] (lifetime = last−first active day; every subject is
    * an event — the shipped events table has no censoring regime).
    * All grid inputs are integral (d_t, Σx, Σx² of an integer
    * covariate); suffix sums run on the bounded duration grid, and
    * the final fold adds cells in ascending-t order so any engine
    * replays the double sums exactly. Returns one row
    * (n_users, n_times, u_score, info, beta_1, z_score). */
  def coxScoreTest(events: DataFrame, userCol: String, tsCol: String,
                   xAgg: org.apache.spark.sql.Column,
                   outDigits: Int = 6): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val users = events
      .filter(col(tsCol).isNotNull && col(userCol).isNotNull)
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("d"))
      .groupBy("u")
      .agg(datediff(max(col("d")), min(col("d"))).cast("long").as("t"),
        xAgg.cast("long").as("x"))
    val grid = users.groupBy("t")
      .agg(count(lit(1)).as("dt"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
    val wSuffix = org.apache.spark.sql.expressions.Window.orderBy("t")
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val cells = grid
      .withColumn("nr", sum(col("dt")).over(wSuffix))
      .withColumn("rx", sum(col("sx")).over(wSuffix))
      .withColumn("rxx", sum(col("sxx")).over(wSuffix))
      .select(col("t"), col("dt"), col("sx"), col("nr"), col("rx"), col("rxx"))
      .collect() // bounded by the duration grid
      .sortBy(_.getLong(0))
    require(cells.nonEmpty, "no lifetimes")
    var u = 0.0; var info = 0.0; var nUsers = 0L
    cells.foreach { r =>
      val dt = r.getLong(1); val sx = r.getLong(2)
      val nr = r.getLong(3); val rx = r.getLong(4); val rxx = r.getLong(5)
      val xb = rx.toDouble / nr.toDouble
      u += sx.toDouble - dt.toDouble * xb
      info += dt.toDouble * (rxx.toDouble / nr.toDouble - xb * xb)
      nUsers += dt
    }
    require(info > 0, "no covariate variance in any risk set")
    def rd(x: Double) = BigDecimal(x)
      .setScale(outDigits, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    Seq((nUsers, cells.length.toLong, rd(u), rd(info), rd(u / info),
      rd(u / math.sqrt(info))))
      .toDF("n_users", "n_times", "u_score", "info", "beta_1", "z_score")
  }

  def logRank(events: DataFrame, userCol: String, tsCol: String,
              groupCol: org.apache.spark.sql.Column,
              churnGapDays: Int = 7, outDigits: Int = 6): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val days = events
      .filter(col(tsCol).isNotNull && col(userCol).isNotNull)
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("d"),
        groupCol.cast("long").as("g"))
    val bounds = days.agg(max(col("d")).as("dmax"))
    val users = days.groupBy("u")
      .agg(first(col("g")).as("g"), min(col("d")).as("f"), max(col("d")).as("l"))
      .crossJoin(broadcast(bounds))
      .select(col("g"), datediff(col("l"), col("f")).cast("long").as("t"),
        (datediff(col("dmax"), col("l")) > churnGapDays).cast("long").as("e"))
    val grid = users.groupBy("t")
      .agg(sum(when(col("g") === 1, col("e")).otherwise(0L)).as("d1"),
        sum(col("e")).as("d"),
        sum(when(col("g") === 1, 1L).otherwise(0L)).as("m1"),
        count(lit(1)).as("m"))
    val wSuffix = org.apache.spark.sql.expressions.Window.orderBy("t")
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val cells = grid
      .withColumn("n1", sum(col("m1")).over(wSuffix))
      .withColumn("n", sum(col("m")).over(wSuffix))
      .filter(col("d") > 0 && col("n") > 1)
      .select(col("d1"), col("d"),
        (col("d").cast("double") * col("n1").cast("double")
          / col("n").cast("double")).as("e1"),
        (col("d").cast("double")
          * (col("n1").cast("double") / col("n").cast("double"))
          * (lit(1.0) - col("n1").cast("double") / col("n").cast("double"))
          * (col("n") - col("d")).cast("double")
          / (col("n") - lit(1L)).cast("double")).as("v"))
      .collect() // bounded by the duration grid; deterministic fold below
      .sortBy(-_.getAs[Double]("e1")) // stable total order for the sums
    val totals = users.groupBy("g").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    var o1 = 0L; var e1 = 0.0; var v = 0.0
    cells.foreach { r =>
      o1 += r.getAs[Long]("d1"); e1 += r.getAs[Double]("e1")
      v += r.getAs[Double]("v")
    }
    require(v > 0, "no variance — degenerate cohorts")
    def r6(x: Double) = BigDecimal(x)
      .setScale(outDigits, BigDecimal.RoundingMode.HALF_UP).toDouble
    Seq((totals.getOrElse(1L, 0L), totals.getOrElse(0L, 0L), o1,
      r6(e1), r6((o1.toDouble - e1) / math.sqrt(v))))
      .toDF("n_1", "n_2", "d_1", "exp_1", "z_logrank")
  }

  /** Kaplan–Meier survival over per-user activity lifetimes — the
    * retention curve with correct CENSORING, which the cohort
    * retention table cannot express (users still active at the corpus
    * edge are censored, not churned). Duration = days between a user's
    * first and last event; the user churned iff their last event is
    * more than `churnGapDays` before the corpus max date, else they
    * are censored at their observed duration. The distributed work is
    * one per-user min/max aggregation; everything after runs on the
    * duration grid, bounded by the calendar span. n_risk is a suffix
    * sum over the grid; survival is reported as ln S(t) — a CUMULATIVE
    * sum (not product) in ascending-t order, which both engines
    * evaluate in the same sequence, so the doubles agree bit-for-bit
    * before the single rounding. Event times only; the terminal point
    * where everyone at risk churns (S = 0, ln undefined) is omitted.
    * `timeUnit` picks the grid granularity: "day" (default) or "hour"
    * for corpora whose lifetimes saturate the calendar span
    * (churnGapDays then counts hours). Returns
    * (t_days, n_risk, d_churn, ln_surv) — t in the chosen unit. */
  /** Theil–Sen robust trend of the daily `valueCol` sum: the MEDIAN of
    * all pairwise slopes between observed days — immune to the outlier
    * days that wreck an OLS trend line. The distributed work is one
    * grouped cent-sum; the pairwise slope set lives on the day grid,
    * bounded by the CALENDAR SPAN squared (≤ ~266k pairs for two years
    * of days), never by event volume. The median pick runs through the
    * two-pass range-partitioned [[Ranking.globalRank]] — NO
    * single-partition sort anywhere (round 16: a 10-year daily series
    * is ~6.6M slope rows, too many for a one-task Window). Ties in the
    * slope value don't disturb the median: any order of equal values
    * yields the same VALUES at the two middle rank positions. n_pairs
    * is n_days·(n_days−1)/2 by construction (every t1 < t2 pair of
    * distinct days produces exactly one slope). Slopes are one
    * exact-integer difference ratio each; the median of an even count
    * averages the two middle values (commutative two-term mean,
    * engine-identical). Returns one row (n_days, n_pairs,
    * slope_per_day). */
  def theilSen(df: DataFrame, dateCol: String, valueCol: String,
               scaleDigits: Int = 2, outDigits: Int = 6,
               maxLocalDays: Int = 4096): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val unit = math.pow(10, scaleDigits)
    val vc = round(col(valueCol).cast("double") * lit(unit)).cast("long")
    val perDay = df
      .filter(col(valueCol).isNotNull && col(dateCol).isNotNull)
      .groupBy(to_date(col(dateCol)).as("d"))
      .agg(sum(vc).as("y"))
    val bounds = perDay.agg(min(col("d")).as("d0"))
    val idx = perDay.crossJoin(broadcast(bounds))
      .select(datediff(col("d"), col("d0")).cast("long").as("t"), col("y"))
      .localCheckpoint(false)
    // Driver cutover (the pageRank/aucPerGroup pattern): the per-day
    // table is calendar-bounded — a 100 TB corpus still aggregates to
    // one row per day — so below an explicit day bound the O(n²)
    // slope enumeration + median selection run on the driver instead
    // of an n² cross join + the two-pass range rank (optimization
    // round 18: 2.12 s → sub-second on the bench board). Identical
    // output: slope doubles are the same divisions ((yB−yA)/(tB−tA) is
    // orientation-invariant in IEEE), the median positions select the
    // same multiset values as globalRank's row_number filter, and the
    // final round is the same HALF_UP BigDecimal. Above the bound the
    // distributed two-pass rank below is unchanged.
    if (idx.count() <= maxLocalDays) {
      val days = idx.as[(Long, Long)].collect()
      val nDays = days.length.toLong
      val nPairs = nDays * (nDays - 1) / 2
      if (nPairs <= 0)
        return Seq.empty[(Long, Long, Double)]
          .toDF("n_days", "n_pairs", "slope_per_day")
      val slopes = new Array[Double](nPairs.toInt)
      var k = 0
      var i = 0
      while (i < days.length) {
        var j = i + 1
        while (j < days.length) {
          slopes(k) = (days(j)._2 - days(i)._2).toDouble /
            (days(j)._1 - days(i)._1).toDouble
          k += 1; j += 1
        }
        i += 1
      }
      java.util.Arrays.sort(slopes)
      val r1 = ((nPairs + 1) / 2).toInt
      val r2 = ((nPairs + 2) / 2).toInt
      val avg =
        if (r1 == r2) slopes(r1 - 1)
        else (slopes(r1 - 1) + slopes(r2 - 1)) / 2.0
      val slope = BigDecimal(avg / unit)
        .setScale(outDigits, BigDecimal.RoundingMode.HALF_UP).toDouble
      return Seq((nDays, nPairs, slope))
        .toDF("n_days", "n_pairs", "slope_per_day")
    }
    val a = idx.select(col("t").as("t1"), col("y").as("y1"))
    val b = idx.select(col("t").as("t2"), col("y").as("y2"))
    val slopes = a.join(b, col("t1") < col("t2"))
      .select(((col("y2") - col("y1")).cast("double")
        / (col("t2") - col("t1")).cast("double")).as("s"))
    val ranked = Ranking.globalRank(slopes, Seq(col("s")), nBuckets = 1)
    val stats = idx.agg(count(lit(1)).as("n_days"))
      .select(col("n_days"),
        (col("n_days") * (col("n_days") - 1) / 2).cast("long").as("n_pairs"))
    ranked.crossJoin(broadcast(stats))
      .filter(col("rank") === expr("(n_pairs + 1) div 2")
        || col("rank") === expr("(n_pairs + 2) div 2"))
      .groupBy(col("n_days"), col("n_pairs"))
      .agg(round(avg(col("s")) / lit(unit), outDigits).as("slope_per_day"))
  }

  /** Herfindahl–Hirschman concentration of `valueCol` mass over
    * `entityCol` within each `groupCol` — "how concentrated is this
    * source / supplier / domain mix", the same diagnostic the coverage
    * curve gives cumulatively, as one exact scalar per group.
    * hhi_ppm = Σ share² in parts-per-million = (Σ rᵢ²)·10⁶ // (Σ rᵢ)²
    * with all moments exact decimals; top_share_ppm is the largest
    * single entity's share. Two grouped aggregations, all integral. */
  def hhi(df: DataFrame, groupCol: String, entityCol: String,
          valueCol: String, scaleDigits: Int = 2): DataFrame = {
    val unit = math.pow(10, scaleDigits)
    val vc = round(col(valueCol).cast("double") * lit(unit)).cast("long")
    def dd(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    df.filter(col(valueCol).isNotNull && col(entityCol).isNotNull)
      .groupBy(col(groupCol), col(entityCol))
      .agg(sum(vc).as("r"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_entities"),
        sum(dd(col("r"))).as("tot"),
        sum(dd(col("r")) * dd(col("r"))).as("sq"),
        max(col("r")).cast("decimal(38,0)").as("top"))
      .filter(col("tot") > 0)
      .select(col(groupCol), col("n_entities"),
        col("tot").cast("long").as("total_units"),
        expr("CAST((sq * 1000000) div (tot * tot) AS BIGINT)").as("hhi_ppm"),
        expr("CAST((top * 1000000) div tot AS BIGINT)").as("top_share_ppm"))
      .orderBy(groupCol)
  }

  def kaplanMeier(events: DataFrame, userCol: String, tsCol: String,
                  churnGapDays: Int = 7, outDigits: Int = 6,
                  timeUnit: String = "day"): DataFrame = {
    // integer time index: "day" reproduces the original to_date/datediff
    // semantics exactly (UTC session, epoch-day arithmetic); "hour"
    // gives survival curves a usable grid on corpora whose user
    // lifetimes all span the full calendar (the driver events table has
    // a max last-event gap of 2 DAYS, so any day-grid churn rule is
    // near-vacuous there — churnGapDays then counts HOURS)
    val idx = timeUnit match {
      case "day"  => datediff(to_date(col(tsCol)), lit("1970-01-01"))
        .cast("long")
      case "hour" => floor(unix_timestamp(col(tsCol)) / lit(3600L))
        .cast("long")
      case other  => throw new IllegalArgumentException(
        s"timeUnit must be day|hour, got $other")
    }
    val days = events
      .filter(col(tsCol).isNotNull && col(userCol).isNotNull)
      .select(col(userCol).as("u"), idx.as("d"))
    val bounds = days.agg(max(col("d")).as("dmax"))
    val users = days.groupBy("u")
      .agg(min(col("d")).as("f"), max(col("d")).as("l"))
      .crossJoin(broadcast(bounds))
      .select((col("l") - col("f")).as("t"),
        (col("dmax") - col("l") > churnGapDays).cast("long").as("e"))
    val grid = users.groupBy("t")
      .agg(sum(col("e")).as("d"), count(lit(1)).as("m"))
    val wSuffix = org.apache.spark.sql.expressions.Window.orderBy("t")
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val wPrefix = org.apache.spark.sql.expressions.Window.orderBy("t")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    grid.withColumn("n_risk", sum(col("m")).over(wSuffix))
      .filter(col("d") > 0 && col("n_risk") > col("d"))
      .withColumn("__lt",
        log((col("n_risk") - col("d")).cast("double") / col("n_risk").cast("double")))
      .withColumn("ln_surv", sum(col("__lt")).over(wPrefix))
      .select(col("t").as("t_days"), col("n_risk"), col("d").as("d_churn"),
        round(col("ln_surv"), outDigits).as("ln_surv"))
      .orderBy("t_days")
  }

  /** Nelson–Aalen cumulative-hazard estimator over the same
    * lifetime/censoring construction as [[kaplanMeier]] (identical
    * duration grid, risk sets, and churn rule): H(t) = Σ_{t_i ≤ t}
    * d_i/n_i with the Poisson-type variance Σ d_i/n_i². Where KM
    * reports ln-survival, NA reports the cumulative hazard directly —
    * the robust choice for small risk sets. Shape: one grouped rollup
    * to the duration grid + two windows over the calendar-bounded
    * grid; the prefix sums run in t-order on both engines, so the
    * double sequences are identical. Returns
    * (t_days, n_risk, d_churn, na_hazard, na_var). */
  def nelsonAalen(events: DataFrame, userCol: String, tsCol: String,
                  churnGapDays: Int = 7, outDigits: Int = 6,
                  timeUnit: String = "day"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val idx = timeUnit match {
      case "day"  => datediff(to_date(col(tsCol)), lit("1970-01-01"))
        .cast("long")
      case "hour" => floor(unix_timestamp(col(tsCol)) / lit(3600L))
        .cast("long")
      case other  => throw new IllegalArgumentException(
        s"timeUnit must be day|hour, got $other")
    }
    val days = events
      .filter(col(tsCol).isNotNull && col(userCol).isNotNull)
      .select(col(userCol).as("u"), idx.as("d"))
    val bounds = days.agg(max(col("d")).as("dmax"))
    val users = days.groupBy("u")
      .agg(min(col("d")).as("f"), max(col("d")).as("l"))
      .crossJoin(broadcast(bounds))
      .select((col("l") - col("f")).as("t"),
        (col("dmax") - col("l") > churnGapDays).cast("long").as("e"))
    val grid = users.groupBy("t")
      .agg(sum(col("e")).as("d"), count(lit(1)).as("m"))
    val wSuffix = Window.orderBy("t")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wPrefix = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.withColumn("n_risk", sum(col("m")).over(wSuffix))
      .filter(col("d") > 0)
      .withColumn("__h", col("d").cast("double") / col("n_risk").cast("double"))
      .withColumn("__v", col("d").cast("double") /
        (col("n_risk").cast("double") * col("n_risk").cast("double")))
      .withColumn("na_hazard", sum(col("__h")).over(wPrefix))
      .withColumn("na_var", sum(col("__v")).over(wPrefix))
      .select(col("t").as("t_days"), col("n_risk"), col("d").as("d_churn"),
        round(col("na_hazard"), outDigits).as("na_hazard"),
        round(col("na_var"), outDigits).as("na_var"))
      .orderBy("t_days")
  }

  /** Mean cumulative function of RECURRENT events (Nelson estimator
    * under the fully-observed convention this table satisfies — every
    * unit at risk for the whole window): per day, cumulative matching
    * events per at-risk unit in integral micro-units. The
    * Kaplan–Meier family answers "time to FIRST event"; the MCF is
    * the reliability view for events that repeat (errors, repairs,
    * repeat purchases). One day rollup + one window over the
    * calendar-bounded grid. Returns
    * (day, n_events, cum_events, mcf_micro). */
  def meanCumulativeFunction(events: DataFrame, tsCol: String,
                             unitCol: String,
                             cond: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // NULL unit ids are not at-risk units: DataFrame.distinct keeps a
    // null row, but SQL COUNT(DISTINCT) (the oracle) drops it
    val nUnits = events.filter(col(unitCol).isNotNull)
      .select(col(unitCol)).distinct().count()
    require(nUnits > 0, "no at-risk units")
    val days = events.filter(cond)
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    days.withColumn("cum_events", sum(col("n_events")).over(w))
      .select(col("day"), col("n_events"), col("cum_events"),
        expr(s"cum_events * 1000000 div ${nUnits}L").as("mcf_micro"))
      .orderBy("day")
  }

  /** MULTI-TOUCH attribution: each conversion's credit splits across
    * its full touch path inside the lookback window, under two
    * standard models at once — `linear` (1/n each) and `ushape`
    * (position-based 40/20/40: first and last touch 40% each, middles
    * share 20%; n=1 → 100%, n=2 → 50/50). Weights are integral PPM
    * with the division remainder assigned to the path's LAST touch,
    * so credit mass is conserved EXACTLY per conversion and every
    * aggregate is order-free integer arithmetic — no fractional
    * drift, engine-exact. Conversions with no in-window touch credit
    * 'none' in full (total credit = conversions × 10⁶ ppm, always).
    *
    * Shape: one user-keyed equi-join (touches bounded by the lookback
    * window), one conversion-keyed rank window over the per-path
    * touches, one grouped rollup. Returns per channel:
    * (channel, touches, linear_micro_cents, ushape_micro_cents). */
  def multiTouchAttribution(conversions: DataFrame, touches: DataFrame,
                            idCol: String, userCol: String, tsCol: String,
                            channelCol: String, valueCentsCol: String,
                            lookbackSeconds: Long = 7200L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val conv = conversions.select(col(idCol).as("__cid"),
      col(userCol).as("__cu"), unix_micros(col(tsCol)).as("__cus"),
      col(valueCentsCol).cast("long").as("__cents"))
    val tch = touches.select(col(userCol).as("__tu"),
      unix_micros(col(tsCol)).as("__tus"), col(channelCol).as("__ch"))
    val lb = lookbackSeconds * 1000000L
    // window condition lives IN the join: a conversion whose touches all
    // fall outside the lookback must keep its null row (-> 'none'), not
    // vanish to a post-join filter
    val joined = conv.join(tch,
      conv("__cu") === tch("__tu") && tch("__tus") <= conv("__cus") &&
        conv("__cus") - tch("__tus") <= lb, "left")
    val w = Window.partitionBy("__cid")
      .orderBy(col("__tus").asc_nulls_first, col("__ch"))
    val wN = Window.partitionBy("__cid")
    val ranked = joined
      .withColumn("__pos", row_number().over(w))
      .withColumn("__n", count(col("__tus")).over(wN))
    // integral ppm weights; division remainders go to the LAST touch
    // (deterministic), so each conversion's credit sums to exactly 1e6
    val m = lit(1000000L)
    val linW = when(col("__n") === 0, m).otherwise(
      expr("1000000 div __n") +
        when(col("__pos") === col("__n"), pmod(m, col("__n"))).otherwise(0L))
    val uW = when(col("__n") <= 0, m)
      .when(col("__n") === 1, m)
      .when(col("__n") === 2, lit(500000L))
      .otherwise(
        when(col("__pos") === 1 || col("__pos") === col("__n"), lit(400000L))
          .otherwise(expr("200000 div (__n - 2)") +
            when(col("__pos") === col("__n") - 1,
              pmod(lit(200000L), col("__n") - 2)).otherwise(0L)))
    val dd = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    ranked
      .withColumn("__channel",
        when(col("__n") === 0, lit("none")).otherwise(col("__ch")))
      .groupBy(col("__channel").as("channel"))
      .agg(sum(when(col("__n") > 0, 1L).otherwise(0L)).as("touches"),
        sum(dd(linW) * dd(col("__cents"))).cast("long")
          .as("linear_micro_cents"),
        sum(dd(uW) * dd(col("__cents"))).cast("long")
          .as("ushape_micro_cents"))
      .orderBy("channel")
  }
}
