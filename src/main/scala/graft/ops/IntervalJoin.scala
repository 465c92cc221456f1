package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap join via GRID BUCKETING — the range join Spark has
  * no native operator for. A naive `a.start <= b.end AND b.start <=
  * a.end` join plans as a cartesian/BNLJ product; instead each
  * interval explodes to the fixed-width grid cells it covers, overlap
  * candidates meet in an equi-join on the cell, and the exact overlap
  * predicate verifies after a distinct — the standard spatial-grid
  * decomposition, one shuffle on the cell key.
  *
  * Scale notes (100 TB): work is sum over intervals of
  * `len / gridWidth + 1` cell rows — pick `gridWidth` near the median
  * interval length so typical intervals hit 1-2 cells; a cell behaves
  * like an LSH bucket (co-bucketed pairs are verified, so skew follows
  * interval density, and a hot cell can be salted the same way).
  * Overlap semantics are CLOSED intervals (touching endpoints match) —
  * integer/timestamp-exact, no floats anywhere. */
object IntervalJoin {

  /** Pairs (leftId, rightId) whose [start, end] intervals overlap,
    * with the overlap bounds. Columns are long epoch units (cast
    * timestamps upstream); `gridWidth` is in the same units. */
  def overlapJoin(left: DataFrame, leftId: String, ls: String, le: String,
                  right: DataFrame, rightId: String, rs: String, re: String,
                  gridWidth: Long): DataFrame = {
    require(gridWidth > 0, "gridWidth must be positive")
    def cells(df: DataFrame, id: String, s: String, e: String,
              outId: String): DataFrame =
      df.select(col(id).as(outId), col(s).cast("long").as(s"__${outId}_s"),
          col(e).cast("long").as(s"__${outId}_e"))
        .filter(col(s"__${outId}_s").isNotNull && col(s"__${outId}_e").isNotNull
          && col(s"__${outId}_s") <= col(s"__${outId}_e"))
        // pmod-adjusted floor division: negative epochs bin correctly
        .withColumn("__cell",
          explode(sequence(
            expr(s"(__${outId}_s - pmod(__${outId}_s, $gridWidth)) div $gridWidth"),
            expr(s"(__${outId}_e - pmod(__${outId}_e, $gridWidth)) div $gridWidth"))))
    val l = cells(left, leftId, ls, le, "left_id")
    val r = cells(right, rightId, rs, re, "right_id")
    l.join(r, "__cell")
      .filter(col("__left_id_s") <= col("__right_id_e") &&
        col("__right_id_s") <= col("__left_id_e"))
      .select(col("left_id"), col("right_id"),
        greatest(col("__left_id_s"), col("__right_id_s")).as("overlap_start"),
        least(col("__left_id_e"), col("__right_id_e")).as("overlap_end"))
      .distinct() // an overlapping pair can meet in several cells
  }
}
