package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Streaming near-duplicate detection: the streaming member of the
  * dedup family (`Dedup.simhashPairs` is the batch twin).
  *
  * Each incoming document is simhashed (the same md5-derived 64-bit
  * kernel as the batch operator) and banded into 4 x 16-bit bucket
  * keys; per (band, bucket) a `flatMapGroupsWithState` keeps the recent
  * bucket members and emits a hit when a new document lands within
  * `maxHamming` of one. State is bounded on BOTH axes: event-time
  * timeout evicts buckets idle past the retention horizon, and each
  * bucket retains at most `maxPerBucket` most-recent members (a bucket
  * hotter than that is degenerate boilerplate — the batch operator's
  * hot-bucket cap makes the same call).
  *
  * A pair within Hamming distance of several bands can be emitted once
  * per matching band; feed the output through
  * `dropDuplicatesWithinWatermark` (or dedupe downstream) when exact
  * once-per-pair delivery matters — chaining it here directly would
  * stack a second stateful operator behind `flatMapGroupsWithState`,
  * which the microbatch engine does not support.
  */
object StreamDedup {

  final case class Doc(doc_id: Long, ts: Timestamp, text: String)
  final case class DupHit(doc_id: Long, dup_of: Long, hamming: Int, ts: Timestamp)
  // public: flatMapGroupsWithState state classes must be public or
  // encoder codegen fails (see repo gotchas)
  final case class BucketState(ids: Array[Long], hashes: Array[Long],
                               times: Array[Long])

  /** 64-bit simhash of one text — identical to `Dedup.simhash`'s kernel. */
  def simhash64(text: String): Long = {
    val votes = new Array[Int](64)
    if (text != null)
      text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+").foreach { w =>
        val h = java.lang.Long.parseUnsignedLong(
          graft.functions.TextKernels.md5Hex(w).substring(0, 16), 16)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
    var packed = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) packed |= (1L << b); b += 1 }
    packed
  }

  def nearDupStream(docs: Dataset[Doc], maxHamming: Int = 3,
                    watermarkDelay: String = "1 hour",
                    retentionMs: Long = 3600000L,
                    maxPerBucket: Int = 64): Dataset[DupHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // simhash + band rows FIRST (a typed map re-keys the attributes, so
    // the watermark must be declared on the post-map ts column)
    val banded = docs.flatMap { d =>
      val h = simhash64(d.text)
      (0 until 4).iterator.map { b =>
        (d.doc_id, d.ts, h, (b.toLong << 16) | ((h >>> (b * 16)) & 0xFFFFL))
      }
    }.toDF("doc_id", "ts", "simhash", "bucket_key")
      .withWatermark("ts", watermarkDelay)
      .as[(Long, Timestamp, Long, Long)]

    banded.groupByKey(_._4)
      .flatMapGroupsWithState[BucketState, DupHit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Long, rows: Iterator[(Long, Timestamp, Long, Long)],
         state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(
              BucketState(Array.empty, Array.empty, Array.empty))
            val out = scala.collection.mutable.ArrayBuffer.empty[DupHit]
            var lastTs = 0L
            rows.toSeq.sortBy(r => (r._2.getTime, r._1)).foreach {
              case (id, ts, h, _) =>
                var i = 0
                while (i < st.ids.length) {
                  val d = java.lang.Long.bitCount(st.hashes(i) ^ h)
                  if (d <= maxHamming && st.ids(i) != id)
                    out += DupHit(id, st.ids(i), d, ts)
                  i += 1
                }
                // append, keeping the most-recent maxPerBucket members
                val from = math.max(0, st.ids.length + 1 - maxPerBucket)
                st = BucketState(
                  (st.ids :+ id).drop(from),
                  (st.hashes :+ h).drop(from),
                  (st.times :+ ts.getTime).drop(from))
                lastTs = math.max(lastTs, ts.getTime)
            }
            state.update(st)
            // evict once the watermark passes last activity + retention
            state.setTimeoutTimestamp(
              math.max(lastTs + retentionMs, state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }
}
