package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis

/** Streaming quality gates (round 18) — the named Gopher/C4 filter
  * batteries on the continuous-ingest path.
  *
  * All three batteries ([[graft.ops.TextAnalysis.gopherRules]],
  * [[graft.ops.TextAnalysis.c4Filters]],
  * [[graft.ops.TextAnalysis.gopherRepetitionRules]]) are STATELESS
  * per-document operators — column projections / a typed
  * mapPartitions kernel, no aggregation, no watermark, no state store
  * — so they lift onto a Structured Streaming source unchanged and
  * batch == stream holds exactly, under any batching or arrival order
  * (the StreamingSpec quality-gate rows pin this on multi-batch
  * feeds). This object supplies the composed ingest-path gate; the
  * repetition battery applies directly
  * (`TextAnalysis.gopherRepetitionRules(stream, ...)`) since its
  * kernel output is already per-doc flags keyed by id.
  *
  * At 100 TB the composed gate runs at scan speed in each micro-batch:
  * one shuffle-free projection per document — the same plan shape as
  * the batch board queries (q_gopher_rules / q_c4_filters), just fed
  * by a readStream source.
  */
object QualityStream {

  /** Composed Gopher × C4 page gate: every per-rule flag from both
    * batteries plus the joint `quality_keep` = gopher_keep && c4_keep.
    * Works identically on a batch or streaming DataFrame (Append mode,
    * stateless). Thresholds forward to the underlying batteries. */
  def gateStream(docs: DataFrame, textCol: String,
                 minWords: Int = 50, maxWords: Int = 100000,
                 minSentences: Int = 3, minWordsPerLine: Int = 5): DataFrame =
    TextAnalysis.c4Filters(
        TextAnalysis.gopherRules(docs, textCol, minWords, maxWords),
        textCol, minSentences, minWordsPerLine)
      .withColumn("quality_keep", col("gopher_keep") && col("c4_keep"))
}
