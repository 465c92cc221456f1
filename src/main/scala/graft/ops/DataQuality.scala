package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table-level data-quality checking (Deequ-style constraint sweep)
  * and integer-exact histograms — the validation pass a pipeline runs
  * before committing a snapshot to training.
  *
  * Scale notes (100 TB): every rule is a `sum(when(violation, 1))`
  * aggregate, so ALL rules evaluate in ONE full scan with map-side
  * partial combine (adding a rule adds a column, not a pass); the
  * histogram is one hash aggregation on an integer bin key. Counts are
  * integers — engine-exact. */
object DataQuality {

  /** One row per rule: (rule, n_violations, n_rows). A rule's column
    * is the VIOLATION predicate (true/non-null-true = bad row). */
  def check(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val aggs = count(lit(1)).as("__n") +:
      rules.zipWithIndex.map { case ((_, pred), i) =>
        sum(when(pred, 1L).otherwise(0L)).as(s"__v_$i")
      }
    val m = df.agg(aggs.head, aggs.tail: _*)
    val rows = rules.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("rule"), col(s"__v_$i").as("n_violations"),
        col("__n").as("n_rows"))
    }
    m.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** Fixed-width histogram over `valueExpr` scaled to integer units
    * (`round(v * 10^scaleDigits)`): bin = `units div binUnits`,
    * integral arithmetic only, so bin membership is engine-exact
    * (float `floor(v / width)` could land boundary values in different
    * bins per engine). Returns (bin, lo, n, sum_units) for non-empty
    * bins. */
  def histogram(df: DataFrame, valueExpr: Column, binUnits: Long,
                scaleDigits: Int = 2): DataFrame = {
    require(binUnits > 0, "binUnits must be positive")
    val unit = math.pow(10, scaleDigits)
    val units = round(valueExpr.cast("double") * lit(unit)).cast("long")
    df.select(units.as("__u")).filter(col("__u").isNotNull)
      // FLOOR division (pmod-adjusted — `div` truncates toward zero,
      // which would disagree with SQL `//` on negative values)
      .select(expr(s"(__u - pmod(__u, $binUnits)) div $binUnits").as("bin"),
        col("__u"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__u")).as("sum_units"))
      .select(col("bin"), (col("bin") * binUnits).as("lo_units"),
        col("n"), col("sum_units"))
  }
}
