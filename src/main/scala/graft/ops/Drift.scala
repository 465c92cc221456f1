package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two corpus slices (new crawl vs
  * old, one source vs another) — the monitoring primitive a training-data
  * pipeline runs before mixing sources.
  *
  * The two-sample Kolmogorov-Smirnov statistic needs the maximum ECDF
  * gap over the merged sample — a global sorted scan. Like
  * `SgdNetModel.aucOf`, it runs as a TWO-PASS range-partitioned rank
  * instead of a single-partition window: (1) aggregate to distinct
  * values with per-side counts (bounds the sorted data at the distinct
  * cardinality), range-partition by value; (2) per-partition totals
  * broadcast back as prefix offsets, then one partition-local scan takes
  * the running ECDF gap maximum. No stage ever sees more than its range
  * slice — the shape survives any row count.
  */
object Drift {

  /** KS statistic D = sup_x |F_a(x) - F_b(x)| between `valueCol` in `a`
    * and in `b`, plus the two sample sizes. Exact (no binning): ECDFs
    * are evaluated at every distinct value. */
  def ksStatistic(a: DataFrame, b: DataFrame, valueCol: String): (Double, Long, Long) = {
    val tagged = a.select(col(valueCol).cast("double").as("v"), lit(1).as("g"))
      .unionAll(b.select(col(valueCol).cast("double").as("v"), lit(0).as("g")))
      .filter(col("v").isNotNull)
    val perValue = tagged.groupBy(col("v"))
      .agg(sum(col("g")).cast("double").as("ca"),
        sum(lit(1) - col("g")).cast("double").as("cb"))
      .repartitionByRange(col("v"))
      .sortWithinPartitions("v")
      .select(col("ca"), col("cb"))
    // Double sums here are EXACT, not approximate: ca/cb are integer
    // counts, and IEEE doubles represent every integer below 2^53
    // exactly (same argument as SgdNetModel.aucOf) — do not "fix" this
    // to floats or to a lossy accumulator.
    val rdd = perValue.rdd.map(r => (r.getDouble(0), r.getDouble(1)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val partTotals = rdd.mapPartitionsWithIndex { (i, it) =>
        var x = 0.0; var y = 0.0
        it.foreach { case (ca, cb) => x += ca; y += cb }
        Iterator((i, x, y))
      }.collect().sortBy(_._1)
      val na = partTotals.map(_._2).sum
      val nb = partTotals.map(_._3).sum
      require(na > 0 && nb > 0, "both samples must be non-empty")
      val offs = new Array[(Double, Double)](math.max(rdd.getNumPartitions, 1))
      var accA = 0.0; var accB = 0.0
      partTotals.foreach { case (i, x, y) => offs(i) = (accA, accB); accA += x; accB += y }
      val bcOff = rdd.sparkContext.broadcast(offs)
      val d = rdd.mapPartitionsWithIndex { (i, it) =>
        var (ca, cb) = bcOff.value(i)
        var best = 0.0
        it.foreach { case (xa, xb) =>
          ca += xa; cb += xb
          val gap = math.abs(ca / na - cb / nb)
          if (gap > best) best = gap
        }
        Iterator(best)
      }.fold(0.0)(math.max)
      (d, na.toLong, nb.toLong)
    } finally rdd.unpersist(blocking = false)
  }
}
