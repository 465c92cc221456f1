package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Storage-layout operators: the write-side half of 100 TB performance.
  *
  * A scan's cost is decided before the query runs — by how the data was
  * laid out. Two layouts matter for this engine's workloads:
  *
  *  - **Z-ordering** clusters rows that are close in SEVERAL dimensions
  *    into the same files, so parquet min/max (row-group and file
  *    footer) statistics prune multi-column range predicates. Sorting by
  *    one column only prunes that column; interleaving the bits of k
  *    binned columns gives every column locality at 1/k resolution.
  *  - **Bucketing** pre-shuffles a table by its join key at WRITE time:
  *    two tables bucketed the same way join with zero exchanges — the
  *    shuffle is paid once, not per query (asserted by the plan gate in
  *    `PlanSpec`).
  *
  * Everything here is deterministic and engine-portable: the bin
  * boundaries come from exact column min/max, and the interleave is
  * integer arithmetic — which is how the DuckDB oracle verifies
  * `q_zorder` bit-for-bit.
  */
object Layout {

  /** Bit-interleaved Z-value over already-binned non-negative ints:
    * bit `b` of column `j` lands at position `b * k + j`. Built from
    * shift/and/or expressions only — whole-stage-codegen'd, no UDF. */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    val k = cols.size
    require(k > 0, "need at least one column")
    require(bits > 0 && bits * k <= 63, s"$bits bits x $k cols must fit a long")
    val terms = for {
      (c, j) <- cols.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), b).bitwiseAND(lit(1L)), b * k + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** Adds `__z`: the Z-value of `cols` after min/max-normalized binning
    * into [0, 2^bits). ONE aggregation pass computes the per-column
    * min/max (broadcast to the binning expression as literals); the
    * binning itself is a narrow projection. Constant columns bin to 0. */
  def zOrderKey(df: DataFrame, cols: Seq[String], bits: Int): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val buckets = 1L << bits
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"__mn_$c"),
        max(col(c).cast("double")).as(s"__mx_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val binned = cols.zipWithIndex.map { case (c, i) =>
      // an all-null column has null min/max — bin it to 0 like a constant
      // column; per-row nulls likewise coalesce to bin 0 instead of
      // silently nulling the whole __z key
      if (row.isNullAt(2 * i)) lit(0L)
      else {
        val mn = row.getDouble(2 * i)
        val mx = row.getDouble(2 * i + 1)
        if (mx == mn) lit(0L)
        else coalesce(
          least(floor((col(c).cast("double") - mn) / (mx - mn) * buckets),
            lit(buckets - 1)),
          lit(0L))
      }
    }
    df.withColumn("__z", zValue(binned, bits))
  }

  /** Writes `df` clustered by the Z-value of `cols`: range-partition on
    * `__z` into `numFiles` output files, sort within each — so parquet
    * min/max stats on EVERY `cols` member are tight per file/row-group
    * and multi-dimensional range scans prune instead of reading the
    * table. The layout pass is one shuffle at write time, amortized over
    * every future scan. */
  def writeZOrdered(df: DataFrame, cols: Seq[String], bits: Int,
                    path: String, numFiles: Int = 200): Unit =
    zOrderKey(df, cols, bits)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Writes `df` as a bucketed+sorted table: `buckets` hash buckets on
    * `keys`, rows sorted by `keys` within each bucket. A join or
    * aggregation keyed on `keys` between tables bucketed the same way
    * runs with NO exchange (and no sort, for sort-merge) — the plan
    * property `PlanSpec` asserts. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    buckets: Int): Unit = {
    require(keys.nonEmpty, "need at least one bucketing key")
    df.write.format("parquet").mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** Small-file compaction plan: assign files to target-sized
    * compaction bins, sequentially per partition key (the lakehouse
    * OPTIMIZE planning step — which files to rewrite together).
    *
    * Deterministic rule: files ordered by id within their partition;
    * `bin_id = (bytes before this file) div targetBytes`. Bins then
    * hold ~targetBytes each (a file may straddle a boundary — this is
    * a grouping plan, not a byte splitter). Pure integer prefix sums
    * in a window PARTITIONED BY the partition key — per-partition file
    * counts bound the window, never the whole manifest. */
  def compactionPlan(files: DataFrame, partCol: String, fileCol: String,
                     bytesCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(partCol)).orderBy(col(fileCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    files
      .filter(col(bytesCol).isNotNull)
      .select(col(partCol), col(fileCol), col(bytesCol).cast("long").as("bytes"))
      .withColumn("__before", coalesce(sum(col("bytes")).over(w), lit(0L)))
      .withColumn("bin_id", expr(s"__before div CAST($targetBytes AS BIGINT)"))
      .drop("__before")
  }

  /** Per-bin rollup of [[compactionPlan]]: one row per compaction task
    * with its file count and total bytes. */
  def compactionBins(plan: DataFrame, partCol: String): DataFrame =
    plan.groupBy(col(partCol), col("bin_id"))
      .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("bin_bytes"))
}
