package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resilient equi-join: salt the hot keys.
  *
  * A shuffle join hash-partitions both sides on the key, so one hot key
  * (a null-ish sentinel user, a boilerplate domain, an empty-string
  * bucket) lands its entire row set on ONE reducer — at 100 TB that task
  * runs for hours while the other 999 executors idle, or OOMs. AQE's
  * skew-join handles sort-merge spills but not the logical imbalance of
  * a single gigantic key group.
  *
  * `saltedJoin` fixes the plan shape: a first aggregation pass finds keys
  * whose row count exceeds `hotThreshold` (by construction at most
  * n/hotThreshold keys — a tiny, driver-safe set); hot left rows get a
  * deterministic salt in [0, salts) derived from a caller-named unique
  * column (NOT rand(): reruns and task retries must salt identically),
  * and the right side replicates only its hot-key rows `salts` ways. The
  * join key becomes (key, salt), splitting each hot reducer into `salts`
  * even shards. Cold keys keep salt 0 on both sides — no replication.
  * Output == the plain inner join, row for row (the DuckDB oracle for
  * `q_skew_join` IS the plain join).
  */
object SkewJoin {

  /** Inner equi-join of `left` and `right` on `key`, resilient to
    * left-side key skew. `saltBy` must be unique-ish per left row (an id
    * column) — it only drives shard placement, never the result.
    * `maxHotKeys` bounds the driver collect; exceeding it fails fast
    * rather than silently degrading. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltBy: Column, salts: Int = 16,
                 hotThreshold: Long = 1000000L,
                 maxHotKeys: Int = 10000): DataFrame = {
    require(salts > 1, "salts must exceed 1 (1 would be a plain join)")
    require(hotThreshold > 0, "hotThreshold must be positive")
    val hotRows = left.groupBy(col(key)).count()
      .filter(col("count") >= hotThreshold)
      .select(col(key)).limit(maxHotKeys + 1).collect()
    require(hotRows.length <= maxHotKeys,
      s"more than $maxHotKeys hot keys — raise hotThreshold")
    if (hotRows.isEmpty) return left.join(right, key)
    val hot = hotRows.map(_.get(0)).toSeq
    // literal IN-set over a bounded key list: codegen'd, no extra join.
    // coalesce: a null saltBy on a hot-key row would yield a null salt
    // that matches no right-side shard and silently drop the row —
    // shard placement is arbitrary, so any constant preserves the
    // row-identical-to-plain-join contract.
    val lSalt = when(col(key).isin(hot: _*),
      coalesce(Sampling.hashBucket(saltBy) % salts, lit(0L))).otherwise(lit(0L))
    val rSalts = when(col(key).isin(hot: _*),
      sequence(lit(0L), lit(salts - 1L))).otherwise(array(lit(0L)))
    val l = left.withColumn("__salt", lSalt)
    val r = right.withColumn("__salt", explode(rSalts))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** Key-skew diagnosis for join/aggregation planning: reduces the
    * table to per-key counts (one map-side-combined aggregation), then
    * summarizes the count DISTRIBUTION in one pass —
    *
    *   n_keys / total_rows / max_cnt — the basics
    *   p50 / p95 / p99               — exact interpolated percentiles
    *                                   of the per-key counts
    *   skew_x1000                    — max div median, milli-units
    *   suggested_salt                — ceil(max / p95): the salt factor
    *                                   that levels the hottest key to
    *                                   p95-sized shards ([[saltedJoin]]
    *                                   takes it directly)
    *
    * The percentile aggregate buffers the PER-KEY COUNT table (n_keys
    * rows), not the input — fine up to very large key cardinalities;
    * beyond that run [[Quantiles.exactScale]] on the counts frame
    * instead (same numbers, bounded state). */
  def skewReport(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    counts.agg(
      count(lit(1)).as("n_keys"), sum(col("cnt")).as("total_rows"),
      max(col("cnt")).as("max_cnt"),
      expr("percentile(cnt, 0.5)").as("p50"),
      expr("percentile(cnt, 0.95)").as("p95"),
      expr("percentile(cnt, 0.99)").as("p99"))
      .select(col("n_keys"), col("total_rows"), col("max_cnt"),
        round(col("p50"), 6).as("p50"), round(col("p95"), 6).as("p95"),
        round(col("p99"), 6).as("p99"),
        when(col("p50") > 0,
          round(col("max_cnt").cast("double") / col("p50") * 1000)
            .cast("long")).as("skew_x1000"),
        when(col("p95") > 0,
          ceil(col("max_cnt").cast("double") / col("p95")).cast("long"))
          .as("suggested_salt"))
  }
}
