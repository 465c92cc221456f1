package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

final case class KeyedValue(key: String, value: String)
final case class HllStreamState(regs: Array[Byte], n: Long)
final case class HllRow(key: String, n_values: Long, v_zero: Long,
                        s_scaled: Long, est_raw: Double, est: Double)

/** Streaming sketch maintenance — the continuous-ingest twin of the
  * per-group HLL family ([[graft.ops.Frequent.hllSketchBy]]).
  *
  * Unlike the recursive streaming twins (EWMA/Holt/funnel), whose
  * equality with the batch operator needs the cross-batch in-order
  * contract, the HLL register fold is an element-wise MAX — it
  * commutes and is idempotent — so the emitted sketch equals the
  * batch sketch of everything seen so far under ANY arrival order,
  * batching, or duplication. Exact, not best-effort.
  */
object SketchStream {

  /** Per-key streaming HLL: state is the 2^p max-rank register array
    * itself (the mergeable artifact — m bytes per key, scale-free in
    * the value count), updated per micro-batch with the same
    * md5/leading-zero-rank arithmetic as [[graft.ops.Frequent
    * .hllSketch]] and summarized with its exact-integer harmonic
    * denominator and fixed IEEE estimate sequence. Update-mode
    * emission: one refreshed sketch row per touched key per batch.
    * `n_values` counts non-null ingested values (appearances, not
    * distincts — the ratio est/n_values is the stream's duplication
    * signal). */
  def hllStream(values: Dataset[KeyedValue], p: Int = 10): Dataset[HllRow] = {
    require(p >= 7 && p <= 20, "p must be in [7, 20]")
    import values.sparkSession.implicits._
    val m = 1 << p
    val w = 60 - p
    values.filter(kv => kv.key != null)
      .groupByKey(_.key)
      .mapGroupsWithState[HllStreamState, HllRow](GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[KeyedValue],
         state: GroupState[HllStreamState]) =>
          val prev = state.getOption.getOrElse(
            HllStreamState(new Array[Byte](m), 0L))
          val regs = prev.regs.clone()
          var n = prev.n
          rows.foreach { kv =>
            if (kv.value != null) {
              val h = java.lang.Long.parseLong(
                graft.functions.TextKernels.md5Hex(kv.value).substring(0, 15), 16)
              val bucket = (h >>> w).toInt
              val rest = h & ((1L << w) - 1L)
              val rank =
                if (rest == 0L) w + 1
                else w - (63 - java.lang.Long.numberOfLeadingZeros(rest))
              if (rank > regs(bucket)) regs(bucket) = rank.toByte
              n += 1
            }
          }
          state.update(HllStreamState(regs, n))
          var s = 0L
          var vZero = 0L
          var j = 0
          while (j < m) {
            s += 1L << (w + 1 - regs(j))
            if (regs(j) == 0) vZero += 1
            j += 1
          }
          val alpha = 0.7213 / (1.0 + 1.079 / m.toDouble)
          val raw = alpha * (m.toDouble * m.toDouble) *
            java.lang.Math.scalb(1.0, w + 1) / s.toDouble
          val est =
            if (raw <= 2.5 * m.toDouble && vZero > 0)
              m.toDouble * math.log(m.toDouble / vZero.toDouble)
            else raw
          def r4(x: Double) =
            BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
          HllRow(key, n, vZero, s, r4(raw), r4(est))
      }
  }
}
