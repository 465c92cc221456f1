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

  /** EXACT equi-join cardinality from per-key histograms, without
    * running the join: `|A ⋈ B| = Σ_k cA(k)·cB(k)` — what a 100 TB
    * planner wants to know before committing to a shuffle (is this
    * join going to explode? which keys dominate?).
    *
    * One row out: the exact joined row count, matched-key count, the
    * single hottest key's contribution and its share in ppm — all
    * Long/decimal sums over the two per-key count tables (each
    * map-side combined), met by ONE equi-join on the key. Cost is
    * |distinct A-keys ⋈ distinct B-keys|, never |A|·|B|. */
  def joinCardinality(a: DataFrame, aKey: String,
                      b: DataFrame, bKey: String): DataFrame = {
    val ca = a.filter(col(aKey).isNotNull)
      .groupBy(col(aKey).as("__k")).agg(count(lit(1)).as("__ca"))
    val cb = b.filter(col(bKey).isNotNull)
      .groupBy(col(bKey).as("__k")).agg(count(lit(1)).as("__cb"))
    ca.join(cb, "__k")
      .select(col("__k"),
        (col("__ca").cast("decimal(38,0)") * col("__cb"))
          .cast("decimal(38,0)").as("__c"))
      .agg(sum(col("__c")).cast("decimal(38,0)").as("__est"),
        count(lit(1)).as("n_matched_keys"),
        max(col("__c")).cast("decimal(38,0)").as("__max"))
      .select(col("__est").cast("long").as("est_rows"),
        col("n_matched_keys"),
        col("__max").cast("long").as("max_key_rows"),
        expr("CAST(__max * 1000000 div greatest(__est, CAST(1 AS DECIMAL(38,0))) AS BIGINT)")
          .as("max_key_share_ppm"))
  }
}
