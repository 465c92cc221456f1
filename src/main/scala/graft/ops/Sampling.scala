package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data pipelines.
  *
  * `rand()`-based sampling is irreproducible across runs, engines, and
  * partitionings; these operators hash a stable row key with Knuth's
  * multiplicative hash (h = key * 2654435761 mod 2^32) and keep a row
  * iff h < frac * 2^32 — the same rows survive on any engine that can
  * do 64-bit integer arithmetic (which is how the DuckDB oracle verifies
  * them), on any cluster size, in any order. Pure narrow filters: no
  * shuffle, pushdown-friendly.
  */
object Sampling {

  private val KNUTH = 2654435761L
  private val MOD = 4294967296L // 2^32

  /** The [0, 2^32) hash bucket of a long key. */
  def hashBucket(key: Column): Column =
    pmod(key.cast("long") * lit(KNUTH), lit(MOD))

  /** Keep ~`frac` of rows, selected deterministically by the key. */
  def sample(df: DataFrame, keyCol: Column, frac: Double): DataFrame = {
    require(frac >= 0 && frac <= 1, "sampling fraction must be in [0, 1]")
    df.filter(hashBucket(keyCol) < math.round(frac * MOD))
  }

  /** Stratified sampling: per-stratum fractions over a stratum column
    * (e.g. downsample dominant languages, upweight rare sources). Rows
    * in strata missing from `fracs` are dropped. */
  def stratifiedSample(df: DataFrame, keyCol: Column, stratumCol: Column,
                       fracs: Map[String, Double]): DataFrame = {
    require(fracs.values.forall(f => f >= 0 && f <= 1),
      "sampling fractions must be in [0, 1]")
    val threshold = fracs.foldLeft(lit(-1L)) { case (acc, (stratum, frac)) =>
      when(stratumCol === lit(stratum), lit(math.round(frac * MOD))).otherwise(acc)
    }
    df.filter(hashBucket(keyCol) < threshold)
  }
}
