package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column profiling: the per-column data-quality summary table behind
  * corpus audits (null fractions, cardinalities, ranges, string lengths).
  *
  * ONE aggregation pass over the table computes every column's stats —
  * partial aggregation combines map-side, so the shuffle carries one
  * partial-state row per partition, never data rows. The wide one-row
  * result then unpivots to the long (column, stat) frame with a narrow
  * explode.
  *
  * Scale notes (100 TB): exact `countDistinct` over several columns
  * plans an Expand (input amplified once per distinct column) — correct
  * but the dominant cost at scale; pass `approxDistinct = true` to use
  * HyperLogLog sketches (bounded state, one pass, no Expand) when exact
  * cardinalities aren't required. Means are emitted only for integral
  * columns (exact integer sums -> order-independent, engine-portable);
  * float means are intentionally omitted from the contract because
  * summation order changes last-ulp results across engines/partitionings.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String],
              approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val schema = df.schema
    def isStr(c: String) = schema(c).dataType == StringType
    def isIntegral(c: String) = schema(c).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    val aggs: Seq[Column] = count(lit(1)).as("__n") +: cols.flatMap { c =>
      val cc = col(c)
      Seq(
        count(cc).as(s"__nn_$c"),
        (if (approxDistinct) approx_count_distinct(cc)
         else countDistinct(cc)).cast("long").as(s"__nd_$c"),
        min(cc).cast("string").as(s"__mn_$c"),
        max(cc).cast("string").as(s"__mx_$c"),
        (if (isIntegral(c)) round(avg(cc), 6)
         else lit(null).cast("double")).as(s"__mean_$c"),
        (if (isStr(c)) round(avg(length(cc)), 6)
         else lit(null).cast("double")).as(s"__al_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val structs = cols.map { c =>
      struct(lit(c).as("col_name"), col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_value"), col(s"__mx_$c").as("max_value"),
        col(s"__mean_$c").as("mean"), col(s"__al_$c").as("avg_len"))
    }
    row.select(explode(array(structs: _*)).as("p")).select("p.*")
  }
}
