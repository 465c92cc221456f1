package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Packing

/** Sharded training-data export: deterministic assignment of documents
  * to bounded-size shards in a stable global order, a partitioned write,
  * and the shard manifest that downstream training jobs consume.
  *
  * Shard assignment is the [[Packing.concatChunk]] placement applied to
  * byte sizes: shard = floor(bytes-before-this-doc / shardBytes) over
  * docs in id order — a TWO-PASS range-partitioned prefix sum (per-
  * partition totals + broadcast offsets), never a single-partition
  * window. Whole documents stay in one shard, so a shard can exceed
  * `shardBytes` by at most one document — the standard contract for
  * training shards.
  *
  * Scale notes (100 TB): the prefix sum shuffles once (range partition
  * on the id); the shard-attach join is a join on the id key; the write
  * is `partitionBy(shard)` so each task streams its shard files without
  * a global sort. Deterministic: same ids + sizes -> same shards on any
  * cluster size, any engine.
  */
object Export {

  /** Per-doc shard placement: (idCol, n_bytes, byte_offset, shard). */
  def assignShards(df: DataFrame, idCol: String, sizeExpr: Column,
                   shardBytes: Long): DataFrame = {
    require(shardBytes > 0, "shardBytes must be positive")
    Packing.concatChunk(
        df.select(col(idCol), sizeExpr.cast("long").as("__bytes")),
        idCol, "__bytes", shardBytes)
      .select(col(idCol), col("n_tokens").as("n_bytes"),
        col("token_offset").as("byte_offset"), col("chunk_first").as("shard"))
  }

  /** `df` with a `shard` column attached (join on the id key). */
  def withShard(df: DataFrame, idCol: String, sizeExpr: Column,
                shardBytes: Long): DataFrame =
    df.join(assignShards(df, idCol, sizeExpr, shardBytes)
      .select(col(idCol), col("shard")), Seq(idCol))

  /** Shard manifest: per-shard doc count, byte total, id range. */
  def manifest(df: DataFrame, idCol: String, sizeExpr: Column,
               shardBytes: Long): DataFrame =
    assignShards(df, idCol, sizeExpr, shardBytes)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_bytes")).as("total_bytes"),
        min(col(idCol)).as("first_id"), max(col(idCol)).as("last_id"))

  /** Write the corpus as bounded-size shards under `outDir/shard=N/`,
    * `format` = "parquet" (columnar shards) or "json" (JSONL shards).
    * Returns the manifest of what was written. */
  def writeShards(df: DataFrame, idCol: String, sizeExpr: Column,
                  shardBytes: Long, outDir: String,
                  format: String = "parquet"): DataFrame = {
    require(format == "parquet" || format == "json",
      s"unsupported shard format: $format")
    withShard(df, idCol, sizeExpr, shardBytes)
      .write.mode("overwrite").format(format).partitionBy("shard").save(outDir)
    manifest(df, idCol, sizeExpr, shardBytes)
  }

  /** Corpus delta between two snapshots — the incremental-refresh
    * primitive: which rows a downstream training job must re-ingest
    * (`added` / `changed`) or tombstone (`removed`) versus what it can
    * skip (`unchanged`). Content equality uses [[graft.ops.Dedup.exact]]'s
    * injection-safe key (per-column `V`/`N`-tagged md5, digests
    * concatenated and hashed), so comparing 100 TB snapshots moves only
    * (id, hash) pairs into the full-outer key-join — never the
    * payloads.
    *
    * Returns (idCol, status). Engine-exact: md5 + join semantics
    * only. */
  def delta(oldDf: DataFrame, newDf: DataFrame, idCol: String,
            contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "need at least one content column")
    def keyed(df: DataFrame, h: String) = df.select(col(idCol),
      md5(concat(contentCols.map(c =>
        md5(coalesce(concat(lit("V"), col(c).cast("string")), lit("N")))): _*))
        .as(h))
    keyed(oldDf, "__old").join(keyed(newDf, "__new"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__old").isNull, "added")
          .when(col("__new").isNull, "removed")
          .when(col("__old") === col("__new"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** ORDER-INDEPENDENT content digest per shard: each row hashes to a
    * 60-bit integer (first 15 md5 hex chars — engine-portable), shards
    * by `hash % shards` (content-addressed: no id column needed), and
    * each shard reports (row count, sum-of-hashes mod 10^18). Equal
    * tables produce equal digests under ANY partitioning/ordering —
    * the cheap integrity check before/after an export or migration,
    * and the per-shard split localizes WHERE two snapshots diverge.
    * All-integer (decimal-exact sum), engine-exact.
    *
    * One narrow projection + one tiny aggregation; nothing but
    * (shard, hash) moves. */
  def tableDigest(df: DataFrame, contentCols: Seq[String],
                  shards: Int = 16): DataFrame = {
    require(contentCols.nonEmpty && shards >= 1)
    val rowStr = concat_ws("\u0001", // separator: ("ab","c") vs ("a","bc") must differ
      contentCols.map(c => coalesce(col(c).cast("string"), lit(""))): _*)
    val hv = conv(substring(md5(rowStr), 1, 15), 16, 10)
      .cast("decimal(38,0)").cast("long")
    df.select((hv % shards).as("shard"), hv.as("__h"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"),
        (sum(col("__h").cast("decimal(38,0)")) % lit(1000000000000000000L))
          .cast("long").as("digest"))
  }
}
