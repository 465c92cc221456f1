package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and application.
  *
  * Training follows the standard large-corpus recipe (Sennrich et al.):
  * ONE distributed aggregation reduces the corpus to its word-frequency
  * table — at any corpus size the merge loop then runs over that bounded
  * table (capped at `maxVocabWords` rows by frequency), never over raw
  * text again. Merges are fully deterministic: the most frequent
  * adjacent symbol pair wins, ties broken lexicographically.
  */
object Tokenizer {

  /** What the `maxVocabWords` cap cost: `droppedMass` is the number of
    * word OCCURRENCES past the cap that the merge loop never saw. When
    * it is 0 the merges are exactly the full-vocab merges; when it is
    * not, late merges may differ from a full-vocab train — callers
    * deciding whether to raise the cap should look here, not guess. */
  case class BpeTrainStats(keptWords: Long, totalWords: Long,
                           keptMass: Long, totalMass: Long) {
    def droppedWords: Long = totalWords - keptWords
    def droppedMass: Long = totalMass - keptMass
  }

  /** Ordered BPE merges learned from the corpus.
    * @return (rank, left, right, pair_count) — rank 0 is the first merge. */
  def trainBpe(df: DataFrame, textCol: String, numMerges: Int,
               maxVocabWords: Int = 65536): DataFrame = {
    val (merges, stats) = trainBpeWithStats(df, textCol, numMerges, maxVocabWords)
    if (stats.droppedMass > 0)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"BPE vocab cap $maxVocabWords dropped ${stats.droppedWords} distinct " +
          s"words / ${stats.droppedMass} occurrences (of ${stats.totalMass}); " +
          "late merges may differ from a full-vocab train")
    merges
  }

  /** [[trainBpe]], also returning the vocabulary-truncation stats so the
    * dropped word mass is observable rather than silent. */
  def trainBpeWithStats(df: DataFrame, textCol: String, numMerges: Int,
                        maxVocabWords: Int = 65536): (DataFrame, BpeTrainStats) = {
    require(numMerges > 0, "numMerges must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    // vocab-sized (not corpus-sized) intermediate: cached so the top-k
    // collect and the total-mass aggregate share one corpus scan
    val grouped = df.select(explode(Dedup.words(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val wc = grouped
        .orderBy(col("c").desc, col("w"))
        .limit(maxVocabWords)
        .as[(String, Long)].collect()
      val totRow = grouped.agg(count(lit(1)), coalesce(sum(col("c")), lit(0L))).head()
      val stats = BpeTrainStats(
        keptWords = wc.length.toLong, totalWords = totRow.getLong(0),
        keptMass = wc.map(_._2).sum, totalMass = totRow.getLong(1))
      val merges = trainOnWordCounts(wc, numMerges)
      val out = merges.zipWithIndex
        .map { case ((l, r, c), i) => (i, l, r, c) }
        .toSeq.toDF("rank", "left", "right", "pair_count")
      (out, stats)
    } finally grouped.unpersist(false)
  }

  /** Driver-side merge loop over the (bounded) word-frequency table. */
  private[ops] def trainOnWordCounts(wc: Array[(String, Long)],
                                     numMerges: Int): Array[(String, String, Long)] = {
    // each word as its current symbol sequence (starts as characters)
    var words: Array[(Array[String], Long)] =
      wc.map { case (w, c) => (w.map(_.toString).toArray, c) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var m = 0
    var done = false
    while (m < numMerges && !done) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairCounts(k) = pairCounts.getOrElse(k, 0L) + c
          i += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        val ((l, r), c) = pairCounts.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((l, r, c))
        val merged = l + r
        words = words.map { case (syms, wcnt) =>
          val ns = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              ns += merged; i += 2
            } else { ns += syms(i); i += 1 }
          }
          (ns.toArray, wcnt)
        }
        m += 1
      }
    }
    out.toArray
  }

  /** Apply learned merges to one word (merge order = training order). */
  private[ops] def encodeWord(word: String,
                              merges: Array[(String, String)]): Array[String] = {
    var syms = word.map(_.toString).toArray
    merges.foreach { case (l, r) =>
      val merged = l + r
      val ns = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
          ns += merged; i += 2
        } else { ns += syms(i); i += 1 }
      }
      syms = ns.toArray
    }
    syms
  }

  /** Per-doc BPE token count under a trained merge list — the accurate
    * "how many tokens will this doc cost" column (vs the whitespace /
    * regex approximations). Typed kernel, merges broadcast; one narrow
    * pass. */
  def bpeTokenCount(spark: SparkSession, df: DataFrame, idCol: String,
                    textCol: String,
                    merges: Array[(String, String)]): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges)
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        if (text == null) (id, 0L)
        else {
          val ws = text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
          var n = 0L
          ws.foreach { w => n += encodeWord(w, bc.value).length }
          (id, n)
        }
      }
      .toDF(idCol, "bpe_tokens")
  }
}
