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
}
