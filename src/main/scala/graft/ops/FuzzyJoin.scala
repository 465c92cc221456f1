package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy string matching (record linkage): candidate pairs
  * come from equality on a cheap BLOCKING key, and only candidates pay
  * the edit-distance verify — the standard two-phase shape that keeps
  * fuzzy joins off the all-pairs cliff.
  *
  * Scale notes (100 TB): the block join is a plain key equi-join
  * (shuffle on the block key, or broadcast when one side is small);
  * per-block cost is |L_b| x |R_b| verifies, so the blocking function
  * controls the work exactly like `maxBucketSize` bounds LSH buckets —
  * pick keys whose blocks stay small (prefix + normalization is the
  * classic choice). Levenshtein is a codegen'd builtin on both
  * engines. Recall: a pair whose block keys differ is NEVER compared
  * (documented false-negative trade of all blocking schemes; use
  * multiple passes with different keys to tighten). */
object FuzzyJoin {

  /** Normalized blocking key: lowercased, non-letters stripped, first
    * `prefixLen` chars — robust to the punctuation/spacing/casing noise
    * edit distance is meant to absorb, expressible identically in SQL
    * (`regexp_replace(lower(s), '[^a-z]', '', 'g')`). */
  def blockKey(c: Column, prefixLen: Int): Column =
    substring(regexp_replace(lower(c), "[^a-z]", ""), 1, prefixLen)

  /** Pairs (leftId, rightId, dist) with edit distance <= maxDist among
    * candidates sharing a blocking key. Pass distinct id/key frames. */
  def fuzzyPairs(left: DataFrame, leftId: String, leftKey: String,
                 right: DataFrame, rightId: String, rightKey: String,
                 maxDist: Int, blockPrefixLen: Int = 8): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    val l = left.select(col(leftId).as("left_id"), col(leftKey).as("__lk"),
      blockKey(col(leftKey), blockPrefixLen).as("__b"))
    val r = right.select(col(rightId).as("right_id"), col(rightKey).as("__rk"),
      blockKey(col(rightKey), blockPrefixLen).as("__b"))
    l.join(r, "__b")
      .withColumn("dist", levenshtein(col("__lk"), col("__rk")))
      .filter(col("dist") <= maxDist)
      .select(col("left_id"), col("right_id"), col("dist").cast("int").as("dist"))
  }
}
