package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact frequent-item mining with bounded per-task state — the
  * SON/Apriori two-pass recipe (Savasere-Omiecinski-Navathe):
  *
  *   pass 1  every partition counts its own tokens in a local hash map
  *           and emits only those meeting the LOCAL threshold
  *           ceil(minCount / numPartitions). By pigeonhole, an item with
  *           global count >= minCount must reach that threshold in at
  *           least one partition — the candidate set has NO false
  *           negatives, and its size is bounded by partitionTokens /
  *           localThreshold per task.
  *   pass 2  recount ONLY the candidates exactly: a broadcast semi-join
  *           prunes the long tail before any shuffle, so the final
  *           aggregation moves one row per (partition, candidate), not
  *           per token.
  *
  * Output is EXACTLY the tokens with global count >= minCount and their
  * exact counts — same answer as the full groupBy, but the shuffle and
  * the aggregation state never see the (Zipf-heavy) tail that dominates
  * a 100 TB corpus vocabulary.
  */
object Frequent {

  /** Frequent whitespace tokens of a text column. */
  def heavyTokens(df: DataFrame, textCol: String, minCount: Long): DataFrame = {
    require(minCount >= 1, "minCount must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    // materialized once: both passes read it, and explode over a computed
    // array would otherwise re-split every text per consumer
    val toks = df.select(explode(Dedup.words(col(textCol))).as("tok"))
      .localCheckpoint(false)
    val p = math.max(toks.rdd.getNumPartitions, 1)
    val local = (minCount + p - 1) / p // ceil(minCount / p)
    val cand = toks.as[String].mapPartitions { it =>
      val m = new java.util.HashMap[String, Array[Long]]()
      it.foreach { t =>
        val c = m.get(t)
        if (c == null) m.put(t, Array(1L)) else c(0) += 1L
      }
      val out = Seq.newBuilder[String]
      m.forEach { (k, v) => if (v(0) >= local) out += k }
      out.result().iterator
    }.distinct().toDF("tok")
    toks.join(broadcast(cand), Seq("tok"), "left_semi")
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
  }
}
