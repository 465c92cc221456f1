package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution quantiles of a numeric column as a (q, value) frame.
  *
  * Two execution strategies with the same output shape:
  *
  * - [[approx]] — `approx_percentile` (Greenwald–Khanna sketch). THE
  *   100 TB path: aggregation state is bounded by `accuracy`, not row
  *   count, with rank error <= n/accuracy; partial sketches merge
  *   map-side like any algebraic aggregate. While n <= accuracy the
  *   sketch is rank-EXACT and returns the discrete quantile — the same
  *   order statistic DuckDB `quantile_disc` picks (verified
  *   empirically), which is how the small-sf oracle checks this
  *   operator bit-exactly.
  * - [[exact]] — Spark `percentile`, linear interpolation (DuckDB
  *   `quantile_cont` semantics). Buffers every value in the aggregation
  *   state: correctness anchor for small data, NOT for 100 TB use.
  */
object Quantiles {

  private def unpack(df: DataFrame, agg: org.apache.spark.sql.Column,
                     probs: Seq[Double]): DataFrame =
    df.agg(agg.as("qs"))
      .select(posexplode(col("qs")).as(Seq("i", "v")))
      .select(element_at(typedlit(probs), col("i") + 1).as("q"),
        col("v").cast("double").as("value"))

  /** Exact interpolated quantiles (per-group state = all values). */
  def exact(df: DataFrame, valueCol: String, probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1))
    unpack(df, percentile(col(valueCol), typedlit(probs)), probs)
  }

  /** Sketch-based quantiles with bounded state (the scale path).
    * @param accuracy rank error bound n/accuracy; memory ~ O(accuracy).
    *        10^4 (the Spark default) keeps state in KBs at any n. */
  def approx(df: DataFrame, valueCol: String, probs: Seq[Double],
             accuracy: Int = 10000): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1))
    require(accuracy > 0, "accuracy must be positive")
    unpack(df,
      percentile_approx(col(valueCol), typedlit(probs), lit(accuracy)), probs)
  }

  /** Exact interpolated quantiles PER GROUP — the p50/p95/p99-by-
    * segment report. One aggregation; per-group state buffers that
    * group's values (the [[exact]] caveat per group — the correctness
    * anchor; swap `percentile` for `percentile_approx` at 100 TB, or
    * use the distinct-value prefix-sum machinery of
    * [[Analytics.madOutliers]] when values are integer-valued). */
  def exactByGroup(df: DataFrame, groupCol: String, valueCol: String,
                   probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1))
    df.groupBy(col(groupCol))
      .agg(percentile(col(valueCol), typedlit(probs)).as("qs"))
      .select(col(groupCol), posexplode(col("qs")).as(Seq("i", "v")))
      .select(col(groupCol),
        element_at(typedlit(probs), col("i") + 1).as("q"),
        col("v").cast("double").as("value"))
  }
}
