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

  /** Sorted-neighborhood blocking (Hernández–Stolfo): candidate pairs
    * are records within `window` positions of each other in the
    * GLOBAL sort order of a numeric blocking key — the classic
    * complement to prefix/LSH blocking when similarity is ordinal
    * (balances, timestamps, zip codes). The global order comes from
    * [[Ranking.globalRank]]'s two-pass range scan with the id as a
    * deterministic tiebreak; the neighborhood join is an EQUI-join on
    * rank buckets of width `window` (the right side probes its own
    * and its predecessor bucket), so no rank ever compares across
    * more than two buckets and nothing is quadratic. Returns
    * (id_a, id_b, v_a, v_b, rank_dist) with id_a earlier in the sort
    * order. */
  def sortedNeighborhood(df: DataFrame, idCol: String,
                         sortVal: Column, window: Int = 5): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val ranked = graft.ops.Ranking.globalRank(
      df.filter(col(idCol).isNotNull)
        .select(col(idCol).as("id"), sortVal.cast("long").as("v"))
        .filter(col("v").isNotNull),
      Seq(col("v"), col("id")), nBuckets = 1)
      .select(col("id"), col("v"), col("rank"))
      .localCheckpoint(false) // both join sides reuse one rank pass
    val left = ranked
      .select(col("id").as("id_a"), col("v").as("v_a"), col("rank").as("ra"))
      .withColumn("__bk", expr(s"(ra - 1) div $window"))
    val right = ranked
      .select(col("id").as("id_b"), col("v").as("v_b"), col("rank").as("rb"))
      .withColumn("__pk", explode(array(expr(s"(rb - 1) div $window"),
        expr(s"(rb - 1) div $window - 1"))))
    left.join(right, col("__bk") === col("__pk"))
      .filter(col("rb") > col("ra") && col("rb") <= col("ra") + window)
      .select(col("id_a"), col("id_b"), col("v_a"), col("v_b"),
        (col("rb") - col("ra")).as("rank_dist"))
      .orderBy("id_a", "id_b")
  }
}
