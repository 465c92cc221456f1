package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: documents are concatenated in
  * id order into one token stream that is split into fixed-length
  * context windows (the GPT-style "concat and chunk" packing). Each
  * document's placement in the packed stream is fully determined by the
  * prefix-sum of token counts before it — this operator computes that
  * placement per document:
  *
  *   token_offset — tokens before this doc in the stream
  *   chunk_first / chunk_last — context windows the doc lands in
  *     (a doc spans multiple windows when it crosses a boundary)
  *
  * Scale shape: the prefix sum runs as a TWO-PASS range-partitioned
  * scan (per-partition totals + broadcast offsets — the same pattern as
  * [[graft.ml.SgdNetModel.aucOf]]), never a single-partition window.
  * Token counts are integers, so the distributed prefix sums are exact
  * and the whole operator verifies bit-exactly against a SQL window.
  */
object Packing {

  /** @param contextLen tokens per packed context window (> 0). */
  def concatChunk(df: DataFrame, idCol: String, tokenCol: String,
                  contextLen: Long): DataFrame = {
    require(contextLen > 0, "contextLen must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val ranged = df
      .select(col(idCol).cast("long").as("__id"),
        col(tokenCol).cast("long").as("__tok"))
      .repartitionByRange(col("__id"))
      .sortWithinPartitions("__id")
    // persisted (not unpersisted here: the RETURNED frame still reads
    // it; RDD persists are reference-tracked and GC-freed)
    // a null token count (e.g. wsTokenCount of a null text) packs as 0
    // tokens — one bad row must not fail the job
    val rdd = ranged.rdd
      .map(r => (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val partTotals = rdd.mapPartitionsWithIndex { (i, it) =>
      var s = 0L
      it.foreach { case (_, t) => s += t }
      Iterator((i, s))
    }.collect().sortBy(_._1)
    val offsets = new Array[Long](math.max(rdd.getNumPartitions, 1))
    var acc = 0L
    partTotals.foreach { case (i, s) => offsets(i) = acc; acc += s }
    val bcOff = rdd.sparkContext.broadcast(offsets)
    val cl = contextLen
    rdd.mapPartitionsWithIndex { (i, it) =>
      var cum = bcOff.value(i)
      it.map { case (id, tok) =>
        val off = cum
        cum += tok
        val last = if (tok > 0) (off + tok - 1) / cl else off / cl
        (id, tok, off, off / cl, last)
      }
    }.toDF(idCol, "n_tokens", "token_offset", "chunk_first", "chunk_last")
  }

  /** Per-chunk composition: one row per (chunk, document segment) —
    * the table a training data-loader needs to assemble each packed
    * context window and draw attention-mask boundaries between the
    * documents inside it:
    *
    *   doc_start — first token of the segment within the document
    *   seg_len   — tokens the document contributes to this chunk
    *   chunk_pos — where the segment starts within the chunk
    *
    * Zero-token documents contribute nothing and are omitted. Pure
    * integer arithmetic on top of [[concatChunk]]'s placement (the
    * explode fans each doc out to the few chunks it spans), so the
    * whole manifest is engine-exact. */
  def chunkManifest(df: DataFrame, idCol: String, tokenCol: String,
                    contextLen: Long): DataFrame = {
    val placed = concatChunk(df, idCol, tokenCol, contextLen)
      .filter(col("n_tokens") > 0)
    val L = lit(contextLen)
    placed
      .withColumn("chunk", explode(sequence(col("chunk_first"), col("chunk_last"))))
      .withColumn("gbeg", greatest(col("token_offset"), col("chunk") * L))
      .withColumn("gend",
        least(col("token_offset") + col("n_tokens"), (col("chunk") + 1) * L))
      .select(col("chunk"), col(idCol),
        (col("gbeg") - col("token_offset")).as("doc_start"),
        (col("gend") - col("gbeg")).as("seg_len"),
        (col("gbeg") - col("chunk") * L).as("chunk_pos"))
  }
}
