package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key rolling (sliding-frame) features over ordered event streams —
  * the batch feature-engineering counterpart of the streaming operators
  * (session stats, per-user activity rates for quality/abuse filtering).
  *
  * Every window here is PARTITIONED by the entity key: Spark shuffles
  * once on the key and evaluates frames within partitions, so the shape
  * scales with the number of keys (no single-partition WindowExec at any
  * corpus size — the same discipline as `SgdNetModel.aucOf` and
  * `Packing.concatChunk`). Ordering ties are broken by explicit
  * tiebreaker columns so results are deterministic and cross-engine
  * reproducible.
  */
object Rolling {

  /** Rolling aggregates over the last `n` rows per key (current row
    * inclusive), ordered by `orderCols` (must be a deterministic total
    * order within each key — include a unique id as the last column).
    * Adds `roll_n` (rows in frame) and, per value column, an exact
    * integer rolling sum of `round(value * 100)` cents — integer so the
    * result is bit-identical on any engine and any partitioning, unlike
    * a float running sum whose addition order varies. */
  def lastNRows(df: DataFrame, keyCol: Column, orderCols: Seq[Column],
                n: Int, valCol: Column): DataFrame = {
    require(n > 0, "frame must contain at least the current row")
    val w = Window.partitionBy(keyCol).orderBy(orderCols: _*)
      .rowsBetween(-(n - 1), Window.currentRow)
    val cents = floor(valCol * 100 + 0.5).cast("long")
    df.withColumn("roll_n", count(lit(1)).over(w))
      .withColumn("roll_cents", sum(cents).over(w))
  }

  /** Rolling count and exact cents sum over a trailing event-time range
    * of `seconds` per key (inclusive of the current row's instant).
    * Range frames need a numeric order key, so the timestamp is lowered
    * to epoch seconds; ties all fall inside the frame by definition. */
  def timeRange(df: DataFrame, keyCol: Column, tsCol: Column,
                seconds: Long, valCol: Column): DataFrame = {
    require(seconds > 0, "range must be positive")
    val w = Window.partitionBy(keyCol)
      .orderBy(unix_timestamp(tsCol))
      .rangeBetween(-seconds, Window.currentRow)
    val cents = floor(valCol * 100 + 0.5).cast("long")
    df.withColumn("range_n", count(lit(1)).over(w))
      .withColumn("range_cents", sum(cents).over(w))
  }
}
