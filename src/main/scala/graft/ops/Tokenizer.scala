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

  /** Where the vocabulary landed relative to `maxVocabWords`: since
    * round 11 NOTHING is dropped — a vocabulary over the threshold
    * trains through the distributed merge rounds instead of the
    * driver loop, so keptWords == totalWords and droppedMass == 0
    * always; the fields remain for observability of which route ran
    * (keptMass < totalMass can no longer occur). */
  case class BpeTrainStats(keptWords: Long, totalWords: Long,
                           keptMass: Long, totalMass: Long) {
    def droppedWords: Long = totalWords - keptWords
    def droppedMass: Long = totalMass - keptMass
  }

  /** Ordered BPE merges learned from the corpus.
    * @return (rank, left, right, pair_count) — rank 0 is the first merge. */
  def trainBpe(df: DataFrame, textCol: String, numMerges: Int,
               maxVocabWords: Int = 65536): DataFrame =
    trainBpeWithStats(df, textCol, numMerges, maxVocabWords)._1

  /** [[trainBpe]], also returning the vocabulary stats.
    *
    * `maxVocabWords` is a ROUTING threshold, not a truncation: a
    * vocabulary that fits is collected once and merged in the fast
    * driver loop; a larger vocabulary runs the SAME deterministic
    * algorithm distributed — one adjacent-pair aggregation + one
    * argmax row per merge over the word-frequency table (vocab-sized,
    * never corpus-sized, and never collected), applying each winning
    * merge with a typed map. Identical merges on either route (most
    * frequent pair wins, ties lexicographic), proven by spec. At
    * 100 TB the corpus cost stays the single word-count scan; each
    * merge round then touches only the distinct-word table. */
  def trainBpeWithStats(df: DataFrame, textCol: String, numMerges: Int,
                        maxVocabWords: Int = 65536): (DataFrame, BpeTrainStats) = {
    require(numMerges > 0, "numMerges must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    // vocab-sized (not corpus-sized) intermediate: cached so the route
    // decision, the collect / merge rounds, and the mass aggregate share
    // one corpus scan
    val grouped = df.select(explode(Dedup.words(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val totRow = grouped.agg(count(lit(1)), coalesce(sum(col("c")), lit(0L))).head()
      val totalWords = totRow.getLong(0)
      val totalMass = totRow.getLong(1)
      val stats = BpeTrainStats(totalWords, totalWords, totalMass, totalMass)
      val merges =
        if (totalWords <= maxVocabWords) {
          val wc = grouped.orderBy(col("c").desc, col("w"))
            .as[(String, Long)].collect()
          trainOnWordCounts(wc, numMerges)
        } else trainDistributed(grouped, numMerges)
      val out = merges.zipWithIndex
        .map { case ((l, r, c), i) => (i, l, r, c) }
        .toSeq.toDF("rank", "left", "right", "pair_count")
      (out, stats)
    } finally grouped.unpersist(false)
  }

  /** Distributed merge rounds over the word-frequency table: per merge,
    * ONE adjacent-pair aggregation (flatMap -> grouped sum), one
    * single-row argmax collect (ordered count desc, then lexicographic
    * — the driver loop's exact tie-break), and one typed map applying
    * the merge. The word table is localCheckpointed per round so the
    * lineage stays flat across hundreds of merges; it is never
    * collected to the driver. */
  private def trainDistributed(grouped: DataFrame,
                               numMerges: Int): Array[(String, String, Long)] = {
    val spark = grouped.sparkSession
    import spark.implicits._
    var words = grouped.as[(String, Long)]
      .map { case (w, c) => (toSymbols(w), c) }
      .localCheckpoint(false)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var m = 0
    var done = false
    while (m < numMerges && !done) {
      val top = words.flatMap { case (syms, c) =>
        (0 until syms.length - 1).iterator.map(i => (syms(i), syms(i + 1), c))
      }.toDF("l", "r", "c")
        .groupBy("l", "r").agg(sum(col("c")).as("n"))
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val l = top(0).getString(0)
        val r = top(0).getString(1)
        out += ((l, r, top(0).getLong(2)))
        words = words.map { case (syms, c) => (mergePair(syms, l, r), c) }
        // checkpoint every few rounds: merge maps are vocab-sized and
        // cheap to replay, so a flat-every-round materialization costs
        // more in job overhead than the replay it saves
        if (m % 8 == 7) words = words.localCheckpoint(false)
        m += 1
      }
    }
    out.toArray
  }

  /** One merge application to one symbol sequence (left-to-right,
    * non-overlapping) — shared by the driver loop, the distributed
    * rounds, and [[encodeWord]] so every route merges identically. */
  private[ops] def mergePair(syms: Array[String], l: String,
                             r: String): Array[String] = {
    val ns = scala.collection.mutable.ArrayBuffer.empty[String]
    val merged = l + r
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
        ns += merged; i += 2
      } else { ns += syms(i); i += 1 }
    }
    ns.toArray
  }

  /** Driver-side merge loop over the (bounded) word-frequency table. */
  private[ops] def trainOnWordCounts(wc: Array[(String, Long)],
                                     numMerges: Int): Array[(String, String, Long)] = {
    // each word as its current symbol sequence (starts as code points)
    var words: Array[(Array[String], Long)] =
      wc.map { case (w, c) => (toSymbols(w), c) }
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
        // Tie-break in CODE-POINT order (== UTF-8 binary order, which is
        // what Spark's string sort uses on the distributed route), NOT
        // Java's UTF-16 code-unit compareTo: for symbols mixing
        // supplementary-plane chars with U+E000–U+FFFF the two orders
        // differ, and the two routes must pick identical merges.
        val ((l, r), c) = pairCounts.reduceLeft { (best, cur) =>
          val ((ba, bb), bn) = best; val ((ca2, cb2), cn) = cur
          val cmp =
            if (cn != bn) java.lang.Long.compare(bn, cn) // higher count wins
            else {
              val c1 = codePointCompare(ca2, ba)
              if (c1 != 0) c1 else codePointCompare(cb2, bb)
            }
          if (cmp < 0) cur else best
        }
        out += ((l, r, c))
        words = words.map { case (syms, wcnt) => (mergePair(syms, l, r), wcnt) }
        m += 1
      }
    }
    out.toArray
  }

  /** Initial symbolization of a word: one symbol per Unicode CODE
    * POINT, never per UTF-16 char — splitting a surrogate pair would
    * make lone-surrogate symbols that Spark's UTF-8 string encoding
    * cannot represent (they collapse to `?` on shuffle), silently
    * corrupting the distributed route's pair counts on emoji/CJK-B
    * text. Merged symbols concatenate well-formed strings, so no
    * route ever sees an ill-formed symbol. */
  private[ops] def toSymbols(w: String): Array[String] = {
    val out = new Array[String](w.codePointCount(0, w.length))
    var i = 0; var k = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out(k) = new String(Character.toChars(cp))
      k += 1; i += Character.charCount(cp)
    }
    out
  }

  /** Compare two strings by Unicode CODE POINT (equivalent to UTF-8
    * byte order for well-formed strings) — the collation Spark's
    * binary string sort uses, shared by both training routes. */
  private[ops] def codePointCompare(a: String, b: String): Int = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** Apply learned merges to one word (merge order = training order). */
  private[ops] def encodeWord(word: String,
                              merges: Array[(String, String)]): Array[String] = {
    var syms = toSymbols(word)
    merges.foreach { case (l, r) => syms = mergePair(syms, l, r) }
    syms
  }

  /** Per-doc BPE token SEQUENCE under a trained merge list — the
    * exploded (id, pos, token) rows an export or packing stage consumes
    * (where [[bpeTokenCount]] only answers "how many"). Typed kernel,
    * merges broadcast; one narrow pass, output size = token count.
    * Null/empty text emits no rows. */
  def bpeEncode(spark: SparkSession, df: DataFrame, idCol: String,
                textCol: String,
                merges: Array[(String, String)]): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges)
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        if (text == null) Iterator.empty
        else {
          val ws = text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
          var pos = -1L
          ws.iterator.flatMap { w =>
            encodeWord(w, bc.value).iterator.map { t =>
              pos += 1
              (id, pos, t)
            }
          }
        }
      }
      .toDF(idCol, "pos", "token")
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
