package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the most recent right row with
  * `right.time <= left.time` in the same key group — the canonical
  * time-series enrichment operator (latest quote for a trade, last
  * error before a click). Spark has no native ASOF JOIN; the naive
  * range-predicate join degrades to O(|L| x |R|) per key.
  *
  * Execution shape: tag and union both sides, then ONE window pass per
  * key ordered by (time, side): `last(payload, ignoreNulls)` over
  * unbounded-preceding rows hands every left row the latest preceding
  * right payload. At equal timestamps the right row sorts first, so the
  * match is inclusive (>=). Cost: one shuffle on the key + a per-key
  * sort — O(n log n), the same shape as a windowed aggregation, at any
  * scale.
  */
object AsofJoin {

  /** @param left        left (probe) side; all its columns are kept
    * @param right       right (reference) side
    * @param keyCol      equi-join key present on both sides
    * @param timeCol     orderable time column present on both sides
    * @param payloadCols right-side columns to attach (null when no right
    *                    row precedes the left row)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               timeCol: String, payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "as-of join needs at least one payload column")
    val leftCols = left.columns.toSeq
    // unified schema: key, time, side, left columns (null on right rows),
    // and ONE payload struct (null on left rows). The struct is picked
    // atomically by last(ignoreNulls): a right row whose payload VALUE is
    // null still wins (struct non-null), and multiple payload columns can
    // never mix values from different right rows.
    val payloadStruct = struct(payloadCols.map(c => col(c).as(c)): _*)
    val nullStruct = lit(null).cast(
      org.apache.spark.sql.types.StructType(payloadCols.map(c => right.schema(c)).toArray))
    // __tie: deterministic order among right rows sharing (key, time) —
    // without it the window sort is ambiguous on ties and last() could
    // attach a different payload run-to-run. The payload hash is stable
    // across runs and partitionings (xxhash64 of the payload values), so
    // ties resolve identically every execution.
    val l = left.select(
      Seq(col(keyCol).as("__k"), col(timeCol).as("__t"), lit(1).as("__side"),
        lit(0L).as("__tie")) ++
        leftCols.map(col) :+ nullStruct.as("__p"): _*)
    val r = right.filter(col(timeCol).isNotNull).select(
      Seq(col(keyCol).as("__k"), col(timeCol).as("__t"), lit(0).as("__side"),
        xxhash64(payloadCols.map(col): _*).as("__tie")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        payloadStruct.as("__p"): _*)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l.unionAll(r)
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    payloadCols.foldLeft(joined) { (d, c) =>
      d.withColumn(s"asof_$c", col("__asof").getField(c))
    }.select(leftCols.map(col) ++ payloadCols.map(c => col(s"asof_$c")): _*)
  }

  /** Nearest-in-time join: for each left row, the right row in the same
    * key group minimizing |Δtime|, ties to the EARLIER right row.
    * Composed from two as-of passes — backward (latest at-or-before)
    * and forward (earliest at-or-after, which is the backward pass on
    * NEGATED epoch micros) — then one integer |Δ| comparison picks the
    * winner. Same cost shape as [[asofJoin]] ×2: key-shuffle + per-key
    * sort, no range cross-join at any scale.
    *
    * `timeCol` must be a timestamp; Δ compares in epoch micros
    * (integer-exact). Returns left columns + `nearest_<payload>` +
    * `nearest_dt_us` (null when the key has no right rows). */
  def nearestJoin(left: DataFrame, right: DataFrame, keyCol: String,
                  timeCol: String, payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val us = unix_micros(col(timeCol))
    // carry the right row's own time as a payload so Δ is computable
    val rp = right.withColumn("__rt_us", us)
    val back = asofJoin(left, rp, keyCol, timeCol,
      payloadCols :+ "__rt_us")
    val backRenamed = (payloadCols :+ "__rt_us").foldLeft(back) { (d, c) =>
      d.withColumnRenamed(s"asof_$c", s"__b_$c")
    }
    // forward pass: negate micros on BOTH sides; "latest -t' <= -t" is
    // exactly "earliest t' >= t". Equal timestamps land in the backward
    // pass too, so the tie-to-earlier rule below never loses them.
    val negT = "__negt"
    val lNeg = backRenamed.withColumn(negT, -us)
    val rNeg = rp.withColumn(negT, -us)
    val both = asofJoin(lNeg, rNeg, keyCol, negT, payloadCols :+ "__rt_us")
    val fwdRenamed = (payloadCols :+ "__rt_us").foldLeft(both) { (d, c) =>
      d.withColumnRenamed(s"asof_$c", s"__f_$c")
    }
    val dtB = us - col("__b___rt_us")  // >= 0 when present
    val dtF = col("__f___rt_us") - us  // >= 0 when present
    val useB = col("__b___rt_us").isNotNull &&
      (col("__f___rt_us").isNull || dtB <= dtF) // tie -> earlier (backward)
    val picked = payloadCols.foldLeft(fwdRenamed) { (d, c) =>
      d.withColumn(s"nearest_$c",
        when(useB, col(s"__b_$c")).otherwise(col(s"__f_$c")))
    }.withColumn("nearest_dt_us",
      when(useB, dtB).otherwise(dtF))
    picked.select(leftCols.map(col) ++
      payloadCols.map(c => col(s"nearest_$c")) :+ col("nearest_dt_us"): _*)
  }
}
