package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group ranked selection: the "best k documents per domain /
  * language / source" primitive behind curation and per-source caps.
  *
  * Shape: one shuffle on the group keys, then Spark's SORT-BASED window
  * evaluates `row_number` streaming per group — group size is never
  * buffered in memory (unlike a `collect_list`-and-slice aggregation,
  * which holds whole groups on the heap), and spilling covers skewed
  * groups. The `rank <= k` filter runs inside the same stage, so only
  * k rows per group survive the window. `orderCols` must end in a
  * unique tiebreaker (an id) for deterministic, engine-portable output.
  */
object TopK {

  /** Adds `rank` (1-based) and keeps the top `k` rows per group by
    * `orderCols`. */
  def perGroup(df: DataFrame, groupCols: Seq[Column], orderCols: Seq[Column],
               k: Int): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(orderCols.nonEmpty, "need at least one order column")
    require(k > 0, "k must be positive")
    val w = Window.partitionBy(groupCols: _*).orderBy(orderCols: _*)
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
