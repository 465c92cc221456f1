package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis operators: language ID, quality scoring, token counting,
  * document fingerprinting. All pure Catalyst expressions — codegen'd,
  * shuffle-free per-row transforms (fingerprints aggregate by doc id).
  */
object TextAnalysis {

  // --------------------------------------------------------- token counting

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column = size(split(trim(text), "\\s+"))

  /** BPE-ish token count: letter runs, single digits, and punctuation each
    * count as one token (a cheap proxy for byte-pair tokenizers). */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]|[^a-z0-9\\s]"), lit(0)))

  // -------------------------------------------------------- quality scoring

  /** Quality metrics mirroring common pretraining-data filters:
    * length, word stats, punctuation/digit ratios, repetition. */
  def qualityMetrics(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val ws = Dedup.words(t)
    df.withColumn("n_chars", length(t))
      .withColumn("n_words", size(ws))
      .withColumn("avg_word_len",
        (length(t) - size(ws) + 1).cast("double") / size(ws))
      .withColumn("punct_ratio",
        (length(t) - length(regexp_replace(t, "[^\\w\\s]", ""))).cast("double") /
          length(t))
      .withColumn("digit_ratio",
        (length(t) - length(regexp_replace(t, "[0-9]", ""))).cast("double") /
          length(t))
      .withColumn("uniq_word_ratio",
        size(array_distinct(ws)).cast("double") / size(ws))
  }

  /** Gopher document-quality rules (Rae et al. 2021, "Scaling Language
    * Models: Methods, Analysis & Insights from Training Gopher",
    * Appendix A — the MassiveText filter battery; round 17): the NAMED
    * rule set corpus pipelines reach for, as per-rule boolean flags
    * plus the overall `gopher_keep`:
    *
    *  - word count in [minWords, maxWords]
    *  - mean word length in [3, 10]
    *  - symbol-to-word ratio (# and ...) <= 0.1
    *  - <= 90% of lines start with a bullet (-, *, •)
    *  - <= 30% of lines end with an ellipsis
    *  - >= 80% of words contain at least one alphabetic character
    *  - >= 2 distinct hits from the required-stopword set
    *    (the/be/to/of/and/that/have/with)
    *
    * One shuffle-free projection per document (array HOFs over the
    * per-doc word/line arrays, O(words) each), so the rule battery
    * runs at scan speed at any corpus size. */
  def gopherRules(df: DataFrame, textCol: String,
                  minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    // null text scores as the empty document (every metric defined,
    // gopher_keep = false) instead of null-propagating into flags that
    // a when(!flag) census would silently count as passing — the same
    // contract gopherRepetitionRules applies in its kernel
    val t = coalesce(col(textCol).cast("string"), lit(""))
    val ws = split(trim(t), "\\s+")
    val lines = split(t, "\n")
    val reqStops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val wsLower = transform(ws, w => lower(w))
    val stopHits = reqStops.map(s =>
      when(array_contains(wsLower, s), 1).otherwise(0)).reduce(_ + _)
    df.withColumn("n_words", size(ws))
      .withColumn("mean_word_len",
        aggregate(ws, lit(0L), (acc, w) => acc + length(w)).cast("double") /
          col("n_words"))
      .withColumn("symbol_ratio",
        ((length(t) - length(regexp_replace(t, "#", ""))) +
          (length(t) - length(regexp_replace(t, "\\.\\.\\.", ""))) / 3)
          .cast("double") / col("n_words"))
      .withColumn("bullet_ratio",
        size(filter(lines, ln => ln.rlike("^\\s*[-*•]"))).cast("double") /
          size(lines))
      .withColumn("ellipsis_ratio",
        size(filter(lines, ln => ln.rlike("\\.\\.\\.\\s*$"))).cast("double") /
          size(lines))
      .withColumn("alpha_word_ratio",
        size(filter(ws, w => w.rlike("[A-Za-z]"))).cast("double") /
          col("n_words"))
      .withColumn("stop_hits", stopHits)
      .withColumn("g_word_count",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("g_word_len",
        col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0)
      .withColumn("g_symbols", col("symbol_ratio") <= 0.1)
      .withColumn("g_bullets", col("bullet_ratio") <= 0.9)
      .withColumn("g_ellipsis", col("ellipsis_ratio") <= 0.3)
      .withColumn("g_alpha", col("alpha_word_ratio") >= 0.8)
      .withColumn("g_stops", col("stop_hits") >= 2)
      .withColumn("gopher_keep",
        col("g_word_count") && col("g_word_len") && col("g_symbols") &&
          col("g_bullets") && col("g_ellipsis") && col("g_alpha") &&
          col("g_stops"))
  }

  /** Gopher REPETITION rules (Rae et al. 2021 Appendix A, Table A1 —
    * the companion battery to [[gopherRules]]; round 17): per-document
    * repetition fractions with the paper's thresholds and the overall
    * `rep_keep`:
    *
    *  - duplicate line / paragraph fraction <= 0.30 (occurrences after
    *    the first, over the line/paragraph count)
    *  - duplicate line / paragraph CHARACTER fraction <= 0.20 (chars of
    *    occurrences after the first, over total line/paragraph chars)
    *  - top word-n-gram character fraction: n=2 <= 0.20, n=3 <= 0.18,
    *    n=4 <= 0.16 — count × n-gram char length (ties: the longest
    *    max-count gram) over the single-space-joined word text; a top
    *    count of 1 scores 0 (no repetition — short docs would
    *    otherwise fire on their own longest n-gram)
    *  - duplicated word-n-gram character fraction: n=5..10 <=
    *    0.15/0.14/0.13/0.12/0.11/0.10 — the UNION of character spans
    *    covered by occurrences after each n-gram's first, over the
    *    joined word text
    *
    * Runs as a typed mapPartitions kernel (per-doc hash maps + one
    * boolean span array — the interpreted-HOF-per-column trap doesn't
    * apply), one pass, no shuffle: corpus-linear. Lines split on \\n,
    * paragraphs on \\n\\n; words on whitespace. */
  def gopherRepetitionRules(df: DataFrame, idCol: String,
                            textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // CPU-heavy per-doc kernel with no upstream shuffle: spread thin
    // (single-file) inputs to the session's parallelism (bench-measured
    // 2.7x on the one-row-group corpus; no-op at scale — see Spread)
    Spread.thin(df.select(col(idCol).cast("long"), col(textCol)))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val t = if (text == null) "" else text
        def dupFrac(xs: Array[String]): (Double, Double) = {
          if (xs.isEmpty) (0.0, 0.0)
          else {
            val counts = scala.collection.mutable.HashMap.empty[String, Int]
            xs.foreach(x => counts(x) = counts.getOrElse(x, 0) + 1)
            val dups = xs.length - counts.size
            val totalChars = xs.map(_.length.toLong).sum.toDouble
            val dupChars = counts.iterator.map { case (s, c) =>
              (c - 1).toLong * s.length }.sum.toDouble
            (dups.toDouble / xs.length,
              if (totalChars > 0) dupChars / totalChars else 0.0)
          }
        }
        val (dlf, dlcf) = dupFrac(t.split("\n"))
        val (dpf, dpcf) = dupFrac(t.split("\n\n"))
        val words = t.trim.split("\\s+").filter(_.nonEmpty)
        val starts = new Array[Int](words.length)
        var off = 0
        for (i <- words.indices) { starts(i) = off; off += words(i).length + 1 }
        val total = math.max(off - 1, 0) // single-space-joined length
        def topNgramFrac(n: Int): Double = {
          if (words.length < n || total == 0) 0.0
          else {
            val counts = scala.collection.mutable.HashMap.empty[String, Int]
            var i = 0
            while (i + n <= words.length) {
              val g = words.slice(i, i + n).mkString(" ")
              counts(g) = counts.getOrElse(g, 0) + 1
              i += 1
            }
            val maxC = counts.valuesIterator.max
            if (maxC < 2) 0.0 // no repetition at all: the rule can't fire
            else {
              val len =
                counts.iterator.filter(_._2 == maxC).map(_._1.length).max
              maxC.toLong * len / total.toDouble
            }
          }
        }
        def dupNgramFrac(n: Int): Double = {
          if (words.length < n || total == 0) 0.0
          else {
            val firstSeen = scala.collection.mutable.HashSet.empty[String]
            val marked = new Array[Boolean](total)
            var i = 0
            while (i + n <= words.length) {
              val g = words.slice(i, i + n).mkString(" ")
              if (!firstSeen.add(g)) {
                val e = starts(i + n - 1) + words(i + n - 1).length
                var k = starts(i)
                while (k < e) { marked(k) = true; k += 1 }
              }
              i += 1
            }
            var c = 0
            var k = 0
            while (k < total) { if (marked(k)) c += 1; k += 1 }
            c.toDouble / total
          }
        }
        val t2 = topNgramFrac(2); val t3 = topNgramFrac(3)
        val t4 = topNgramFrac(4)
        val d5 = dupNgramFrac(5); val d6 = dupNgramFrac(6)
        val d7 = dupNgramFrac(7); val d8 = dupNgramFrac(8)
        val d9 = dupNgramFrac(9); val d10 = dupNgramFrac(10)
        val keep = dlf <= 0.30 && dpf <= 0.30 && dlcf <= 0.20 &&
          dpcf <= 0.20 && t2 <= 0.20 && t3 <= 0.18 && t4 <= 0.16 &&
          d5 <= 0.15 && d6 <= 0.14 && d7 <= 0.13 && d8 <= 0.12 &&
          d9 <= 0.11 && d10 <= 0.10
        (id, dlf, dlcf, dpf, dpcf, t2, t3, t4, d5, d6, d7, d8, d9, d10, keep)
      })
      .toDF(idCol, "dup_line_frac", "dup_line_char_frac", "dup_para_frac",
        "dup_para_char_frac", "top_2gram_frac", "top_3gram_frac",
        "top_4gram_frac", "dup_5gram_frac", "dup_6gram_frac",
        "dup_7gram_frac", "dup_8gram_frac", "dup_9gram_frac",
        "dup_10gram_frac", "rep_keep")
  }

  /** C4 document filters (Raffel et al. 2020, the Colossal Clean
    * Crawled Corpus rules; round 17): line-level cleaning + page-level
    * drops as a named battery —
    *
    *  - a line is KEPT iff it ends in terminal punctuation (. ! ? "),
    *    has >= `minWordsPerLine` words, and does not mention
    *    "javascript" (case-insensitive);
    *  - the page is kept (`c4_keep`) iff the cleaned text has >=
    *    `minSentences` sentence terminators, and the page contains
    *    neither "lorem ipsum" nor a curly brace.
    *
    * Returns `c4_text` (kept lines re-joined), per-rule flags, and
    * line/sentence counts. One shuffle-free projection per document —
    * corpus-linear. */
  def c4Filters(df: DataFrame, textCol: String,
                minSentences: Int = 3, minWordsPerLine: Int = 5): DataFrame = {
    // null text = empty document (c4_keep = false), matching
    // gopherRules/gopherRepetitionRules — see the gopherRules note
    val t = coalesce(col(textCol).cast("string"), lit(""))
    val lines = split(t, "\n")
    val keptLines = filter(lines, ln =>
      ln.rlike("[.!?\"]\\s*$") &&
        size(split(trim(ln), "\\s+")) >= minWordsPerLine &&
        !lower(ln).contains("javascript"))
    df.withColumn("n_lines", size(lines))
      .withColumn("c4_text", array_join(keptLines, "\n"))
      .withColumn("n_kept_lines", size(keptLines))
      .withColumn("n_sentences",
        length(col("c4_text")) -
          length(regexp_replace(col("c4_text"), "[.!?]", "")))
      .withColumn("c4_lorem", lower(t).contains("lorem ipsum"))
      .withColumn("c4_brace", t.contains("{"))
      .withColumn("c4_keep",
        col("n_sentences") >= minSentences && !col("c4_lorem") &&
          !col("c4_brace"))
  }

  /** Composite quality score in [0,1]: penalizes extreme lengths, high
    * punctuation/digit density, and heavy repetition. */
  def qualityScore(df: DataFrame, textCol: String): DataFrame =
    qualityMetrics(df, textCol).withColumn("quality",
      round(
        least(col("n_words") / 50.0, lit(1.0)) * lit(0.4) +
          (lit(1.0) - least(col("punct_ratio") * 5.0, lit(1.0))) * lit(0.2) +
          (lit(1.0) - least(col("digit_ratio") * 5.0, lit(1.0))) * lit(0.2) +
          least(col("uniq_word_ratio") * 2.0, lit(1.0)) * lit(0.2), 6))

  // ------------------------------------------------------------ language ID

  /** Distinct-stopword-hit language scores. Deterministic, engine-portable
    * (array intersection of lowercased whitespace tokens with small
    * per-language stopword lists), with a CJK character-ratio override. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "für"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "en", "por", "para"))

  def langScores(text: Column): Seq[(String, Column)] = {
    val toks = array_distinct(Dedup.words(text))
    stopwords.toSeq.sortBy(_._1).map { case (lang, sw) =>
      lang -> size(array_intersect(toks, array(sw.map(lit): _*)))
    }
  }

  /** Predicted language: argmax of stopword hits (ties -> lexicographically
    * larger language code, 'und' when no stopword hits), 'zh' when CJK
    * characters dominate.
    *
    * Backed by the codegen'd `graft_lang_id` expression
    * ([[graft.functions.LangId]]): the HOF formulation (4 interpreted
    * array_intersects + a regex per row) measured ~50x slower. */
  def langId(spark: org.apache.spark.sql.SparkSession, text: Column): Column =
    graft.functions.GraftFunctions.langId(spark, text)

  // ---------------------------------------------------------- text cleaning

  /** Canonical text normalization for dedup/training: lowercase, collapse
    * whitespace runs, strip leading/trailing whitespace. */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** PII scrubbing: mask email addresses, long digit runs (phone/account
    * numbers), and bare IPv4 addresses with typed placeholders. Simple
    * dialect-portable patterns (same semantics in Java regex and RE2). */
  def scrubPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "<EMAIL>")
    val ip = regexp_replace(email,
      "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>")
    regexp_replace(ip, "[0-9][0-9 ()+-]{6,}[0-9]", "<NUMBER>")
  }

  // ------------------------------------------------- provenance / URL stats

  /** URLs in a text column (scheme://... up to whitespace) — the
    * extraction primitive for provenance filtering and dedup-by-source.
    * Dialect-portable pattern (same semantics in Java regex and RE2). */
  def extractUrls(text: Column): Column =
    regexp_extract_all(text, lit("https?://[^\\s]+"), lit(0))

  /** Registered host of a URL: lowercased, leading `www.` stripped. */
  def urlDomain(url: Column): Column =
    regexp_replace(lower(regexp_extract(url, "https?://([^/\\s]+)", 1)),
      "^www\\.", "")

  /** Per-domain corpus stats: distinct documents mentioning the domain
    * and total URL mentions — the table behind domain allow/deny lists
    * and per-source sampling decisions. One explode + one aggregation
    * on the domain key; corpus-linear. */
  def domainStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(extractUrls(col(textCol))).as("url"))
      .withColumn("domain", urlDomain(col("url")))
      .groupBy("domain")
      .agg(countDistinct(col(idCol)).as("n_docs"), count(lit(1)).as("n_urls"))

  /** CANONICAL form of an absolute http(s) URL — the CommonCrawl-style
    * URL-key used for crawl dedup and provenance joins. Normalizations,
    * all engine-portable (simple regex + array ops, no dialect traps):
    * lowercase scheme and host, strip a leading `www.`, strip the
    * scheme's own default port (:80 for http, :443 for https — an
    * explicit :443 on an http URL is a *different* resource and is
    * kept), drop the #fragment, drop tracking params
    * (utm_*, fbclid, gclid), SORT the surviving query params (param
    * order is not semantic), and strip trailing slashes from the path.
    * Purely columnar — usable inside any narrow pass. */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host0 = lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val noWww = regexp_replace(host0, "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(noWww, ":80$", ""))
      .when(scheme === "https", regexp_replace(noWww, ":443$", ""))
      .otherwise(noWww)
    val rest = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val path = regexp_replace(rest, "/+$", "")
    val qs = regexp_extract(noFrag, "\\?([^#]*)", 1)
    val params = array_sort(filter(split(qs, "&"), p =>
      p =!= "" && !p.rlike("^(utm_[a-z]+|fbclid|gclid)=")))
    val query = array_join(params, "&")
    concat(scheme, lit("://"), host, path,
      when(query === "", lit("")).otherwise(concat(lit("?"), query)))
  }

  /** URL-keyed dedup: group by [[canonicalUrl]], keep the smallest id —
    * the crawl-frontier dedup that collapses tracking-param/case/port/
    * fragment variants of the same page. One hash aggregation on the
    * canonical key; corpus-linear, map-side combined. */
  def urlDedup(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(col(idCol), canonicalUrl(col(urlCol)).as("canon_url"))
      .groupBy("canon_url")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_urls"))

  // ------------------------------------------------------------- chunking

  /** RAG/embedding-style document chunking: fixed-size character windows
    * with `overlap` characters shared between consecutive chunks
    * (stride = chunkSize - overlap). Emits one row per chunk with its
    * 0-based index and character offset. The window count per doc is
    * max(1, ceil((len - overlap) / stride)) so no chunk starts inside the
    * overlap tail of the previous one (the final chunk may be short).
    * Pure narrow explode — corpus-linear, no shuffle, codegen'd
    * (`sequence`/`posexplode`/`substr`); empty/null docs emit nothing. */
  def chunkText(df: DataFrame, idCol: String, textCol: String,
                chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    require(overlap >= 0 && overlap < chunkSize,
      "overlap must be in [0, chunkSize)")
    val stride = chunkSize - overlap
    val t = col(textCol)
    val len = length(t)
    // integer arithmetic on positives only: truncating division == floor
    val nChunks = when(len <= overlap, lit(1))
      .otherwise(floor((len - overlap - 1) / lit(stride)).cast("int") + 1)
    df.filter(len > 0)
      .select(col(idCol), t.as("__text"),
        posexplode(sequence(lit(0), (nChunks - 1) * lit(stride), lit(stride))))
      .select(col(idCol), col("pos").as("chunk_id"),
        col("col").as("chunk_start"),
        col("__text").substr(col("col") + 1, lit(chunkSize)).as("chunk"))
  }

  /** Per-document language-mix (code-switching) profile: chunk the
    * text into fixed character windows, language-ID each window (the
    * codegen `graft_lang_id` expression), then report how mixed the
    * document is — (id, n_chunks, n_langs, major_lang, major_ppm).
    * Multilingual pretraining corpora route heavily on this: a doc
    * that flips language mid-stream needs different handling than its
    * majority label suggests. One chunk explode + two grouped
    * aggregations, corpus-linear; the majority pick is a keyed window
    * over the bounded (id, lang) counts with a deterministic
    * (count desc, lang asc) tiebreak. */
  def langMix(spark: org.apache.spark.sql.SparkSession, df: DataFrame,
              idCol: String, textCol: String,
              chunkSize: Int = 180): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ch = chunkText(df, idCol, textCol, chunkSize, overlap = 0)
      .select(col(idCol).as("id"), langId(spark, col("chunk")).as("lang"))
    val per = ch.groupBy("id", "lang").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("id").orderBy(col("c").desc, col("lang").asc)
    per.withColumn("rn", row_number().over(w))
      .groupBy("id")
      .agg(sum(col("c")).as("n_chunks"), count(lit(1)).as("n_langs"),
        max(when(col("rn") === 1, col("lang"))).as("major_lang"),
        max(when(col("rn") === 1, col("c"))).as("major_n"))
      .select(col("id").as(idCol), col("n_chunks"), col("n_langs"),
        col("major_lang"),
        expr("major_n * 1000000 div n_chunks").as("major_ppm"))
  }

  // ------------------------------------------------------ repetition filters

  /** Gopher-style repetition metrics: fraction of duplicate lines and the
    * fraction of characters in the most common line (documents dominated
    * by repeated boilerplate lines get filtered upstream of training).
    * Pure per-row expressions over the split-lines array. */
  def repetitionMetrics(df: DataFrame, textCol: String): DataFrame = {
    val lines = split(col(textCol), "\\n")
    df.withColumn("n_lines", size(lines))
      .withColumn("n_distinct_lines", size(array_distinct(lines)))
      .withColumn("dup_line_ratio",
        (size(lines) - size(array_distinct(lines))).cast("double") / size(lines))
  }

  /** Top n-gram concentration: characters covered by the single most
    * frequent word — high values indicate degenerate repetition. */
  def topWordConcentration(text: Column): Column = {
    val ws = Dedup.words(text)
    val distinctW = array_distinct(ws)
    // count of the most frequent word via HOFs on small per-doc arrays
    val maxCount = array_max(transform(distinctW,
      w => size(filter(ws, x => x === w))))
    maxCount.cast("double") / size(ws)
  }

  // ------------------------------------------------- boilerplate removal

  /** Line-level boilerplate removal (C4/Common-Crawl style): a line that
    * appears in at least `minDocs` DISTINCT documents is boilerplate
    * (nav menus, cookie banners, copyright footers) and is dropped from
    * every document; surviving lines are reassembled in original order.
    *
    * Shape: one exploded doc-frequency aggregation (map-side combined,
    * shuffle on the line key), the boilerplate line set broadcasts into
    * a left-anti join, and the rebuild groups by doc id. Documents whose
    * every line was boilerplate come back as empty text (left join from
    * the input keeps them). */
  def removeBoilerplate(df: DataFrame, idCol: String, textCol: String,
                        minDocs: Int): DataFrame = {
    val lines = df.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    // no broadcast hint: the boilerplate set is unbounded (every line in
    // >= minDocs docs) — let the planner pick broadcast vs shuffle from
    // its actual size
    val boiler = lines.groupBy(col("line"))
      .agg(countDistinct(col(idCol)).as("docs"))
      .filter(col("docs") >= minDocs)
      .select(col("line"))
    val kept = lines.join(boiler, Seq("line"), "left_anti")
    val rebuilt = kept.groupBy(col(idCol))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            x => x.getField("line")), "\n").as("clean_text"),
        count(lit(1)).as("n_kept_lines"))
    df.select(col(idCol), size(split(col(textCol), "\n")).as("n_lines"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_lines"),
        (col("n_lines") - coalesce(col("n_kept_lines"), lit(0L))).as("n_removed_lines"))
  }

  // ------------------------------------------------------ ranked retrieval

  /** BM25 scores of every document against a fixed term set — the
    * standard ranked-retrieval scoring (k1/b defaults per Robertson).
    *
    * Shape: one exploded term-frequency aggregation (shuffle on
    * (doc, term)), document frequencies for the QUERY terms only
    * (broadcast — the query is small by construction), then a per-doc
    * score aggregation. Corpus-linear at any scale; nothing quadratic.
    * idf uses the BM25+ form ln(1 + (N - df + 0.5)/(df + 0.5)), which is
    * positive for any df. */
  /** Dirichlet-smoothed query-likelihood retrieval (Zhai & Lafferty):
    * score(d) = Σ_t ln((tf_t,d + μ·cf_t/|C|) / (|d| + μ)) over the
    * query terms — the language-modeling alternative to [[bm25]],
    * ranking by how likely the query is under each document's smoothed
    * unigram LM. Scored docs are those matching ≥1 term (smoothing
    * makes the remaining terms contribute their background mass, so
    * scores stay comparable). Shape: the bm25 one-pass typed kernel
    * (per-doc length + fixed-width term counts), ONE collection-stats
    * aggregate (term cfs + total tokens — all integral, so the sums
    * are order-free exact), then a single codegen score expression;
    * corpus-linear, no shuffle beyond the stats aggregate. */
  def queryLikelihood(df: DataFrame, idCol: String, textCol: String,
                      queryTerms: Seq[String], mu: Double = 2000.0,
                      outDigits: Int = 6): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(queryTerms.distinct.size == queryTerms.size,
      "queryTerms must be distinct (duplicates would double-count their " +
        "log term; repeat-weighted queries should weight scores instead)")
    val terms = queryTerms.toArray
    val perDoc = df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        if (text == null) None
        else {
          val ws = text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
          val tfs = new Array[Long](terms.length)
          var i = 0
          while (i < ws.length) {
            var t = 0
            while (t < terms.length) {
              if (ws(i) == terms(t)) tfs(t) += 1
              t += 1
            }
            i += 1
          }
          Some((id, ws.length.toLong, tfs))
        }
      }
      .toDF("__id", "dl", "tfs")
      .localCheckpoint(false)
    val statsExprs = sum(col("dl")) +: terms.indices.map(i =>
      sum(element_at(col("tfs"), i + 1)))
    val statsRow = perDoc.agg(statsExprs.head, statsExprs.tail: _*).head()
    // sum over an empty/all-null-text collection is NULL — degrade to 0
    // so the require below fires with its message instead of an NPE
    val tTot = if (statsRow.isNullAt(0)) 0L else statsRow.getLong(0)
    require(tTot > 0, "empty collection")
    // background mass μ·cf_t/|C| — integral cf/T, one double each
    val priors = terms.indices.map { i =>
      val cf = if (statsRow.isNullAt(i + 1)) 0L else statsRow.getLong(i + 1)
      mu * cf.toDouble / tTot.toDouble
    }
    val score = terms.indices.map { i =>
      log((element_at(col("tfs"), i + 1).cast("double") + lit(priors(i))) /
        (col("dl").cast("double") + lit(mu)))
    }.reduce(_ + _)
    val anyMatch = terms.indices.map(i =>
      element_at(col("tfs"), i + 1) > 0).reduce(_ || _)
    perDoc.filter(anyMatch)
      .select(col("__id").as(idCol), round(score, outDigits).as("qld"))
  }

  def bm25(df: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val terms = queryTerms.toArray
    // ONE tokenization pass: a typed kernel reduces each doc to its
    // length + per-query-term counts (a tiny fixed-width row), replacing
    // the exploded-token shuffle AND the second tokenization of the old
    // docLen/tf split. Null-text docs drop out (no tokens), matching
    // the explode semantics.
    val perDoc = df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        if (text == null) None
        else {
          val ws = text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
          val tfs = new Array[Long](terms.length)
          var i = 0
          while (i < ws.length) {
            var t = 0
            while (t < terms.length) {
              if (ws(i) == terms(t)) tfs(t) += 1
              t += 1
            }
            i += 1
          }
          Some((id, ws.length.toLong, tfs))
        }
      }
      .toDF("__id", "dl", "tfs")
      .localCheckpoint(false) // feeds stats, tf rows; GC-freed
    val stats = perDoc.agg(count(lit(1)).cast("double"), avg(col("dl"))).head()
    val n = stats.getDouble(0)
    val avgLen = stats.getDouble(1)
    val tf = perDoc
      .select(col("__id").as(idCol), col("dl"),
        posexplode(col("tfs")).as(Seq("ti", "tf")))
      .filter(col("tf") > 0)
      .withColumn("tf", col("tf").cast("double"))
    val dfreq = tf.groupBy(col("ti")).agg(count(lit(1)).cast("double").as("df"))
    tf.join(broadcast(dfreq), "ti")
      .withColumn("idf", log(lit(1.0) + (lit(n) - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("s", col("idf") * col("tf") * lit(k1 + 1) /
        (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / lit(avgLen))))
      .groupBy(idCol).agg(sum(col("s")).as("bm25"))
  }

  // -------------------------------------------- n-gram LM perplexity filter

  /** Per-row bigram arrays (NON-distinct, one entry per occurrence) as
    * "w1 w2" strings — a typed kernel like [[Dedup.shingleSets]]
    * (array HOFs evaluate interpreted; this is a tight loop). Words
    * cannot contain whitespace (split on \s+), so the joined string is
    * an unambiguous pair key. */
  private def bigramArr(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        if (text == null) (id, Array.empty[String])
        else {
          val ws = text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
          val out = new Array[String](math.max(ws.length - 1, 0))
          var i = 0
          while (i < out.length) { out(i) = ws(i) + " " + ws(i + 1); i += 1 }
          (id, out)
        }
      }
      .toDF("__id", "bg")
  }

  /** Bigram language-model scoring — the CCNet/RedPajama-style
    * "perplexity filter" primitive: train an add-k-smoothed bigram LM on
    * `corpus`, score each `docs` row with its mean negative log
    * likelihood (low nll ~ fluent according to the corpus; outliers get
    * filtered or bucketed before training).
    *
    * P(w2|w1) = (C(w1 w2) + k) / (C(w1 ·) + k V), V = corpus vocabulary.
    *
    * Shapes (100 TB): bigram counts are ONE map-side-combined
    * aggregation; the follow-C1 and vocab aggregations run over the
    * already-reduced count table; scoring is an equi-join of the doc
    * bigrams against the count table (shuffle on the bigram key,
    * corpus-linear) + a per-doc aggregation. Nothing quadratic, no
    * driver row data. Returns (doc_id, n_bigrams, nll); docs with < 2
    * words have no bigrams and drop out (no likelihood is defined). */
  def lmPerplexity(corpus: DataFrame, docs: DataFrame, idCol: String,
                   textCol: String, k: Double = 1.0): DataFrame = {
    require(k > 0, "smoothing constant k must be positive")
    val bgAll = bigramArr(corpus, idCol, textCol)
      .select(explode(col("bg")).as("b"))
    val c2 = bgAll.groupBy(col("b")).agg(count(lit(1)).cast("double").as("c2"))
      .localCheckpoint(false) // feeds both c1 and the scoring join
    val c1 = c2.groupBy(substring_index(col("b"), " ", 1).as("w1"))
      .agg(sum(col("c2")).as("c1"))
    val v = corpus.select(explode(Dedup.words(col(textCol))).as("w"))
      .agg(countDistinct(col("w")).cast("double")).head().getDouble(0)
    // left joins: a held-out bigram (or even prefix word) absent from
    // the corpus still scores — that is exactly what smoothing is for
    bigramArr(docs, idCol, textCol)
      .select(col("__id").as(idCol), explode(col("bg")).as("b"))
      .withColumn("w1", substring_index(col("b"), " ", 1))
      .join(c2, Seq("b"), "left")
      .join(c1, Seq("w1"), "left")
      .withColumn("lp",
        log((coalesce(col("c2"), lit(0.0)) + k) /
          (coalesce(col("c1"), lit(0.0)) + k * v)))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), avg(-col("lp")).as("nll"))
  }

  /** Interpolated Kneser-Ney bigram LM scoring — the KenLM-style
    * quality-filter estimator (the de-facto standard for pretraining
    * perplexity filters; ref: Kneser & Ney 1995, Chen & Goodman 1998).
    * Absolute discounting with interpolation:
    *
    * seen prefix:  P(w2|w1) = max(C(w1w2) - D, 0)/C(w1.)
    *                        + D * N1+(w1.)/C(w1.) * Pcont(w2)
    * unseen prefix: P(w2|w1) = Pcont(w2)
    *
    * with the continuation probability smoothed so every token scores:
    * Pcont(w2) = (N1+(.w2) + 0.5) / (|bigram types| + 0.5 * V).
    *
    * Everything derives from ONE bigram-count aggregation: C(w1.),
    * N1+(w1.), N1+(.w2) and the type total are aggregations over the
    * already-reduced count table; scoring joins doc bigrams against the
    * count tables on their keys (corpus-linear, no driver row data —
    * same shape as [[lmPerplexity]]). Returns (doc_id, n_bigrams, nll);
    * docs with < 2 words drop out. */
  def knPerplexity(corpus: DataFrame, docs: DataFrame, idCol: String,
                   textCol: String, discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1,
      s"discount must be in (0, 1), got $discount")
    val c2 = bigramArr(corpus, idCol, textCol)
      .select(explode(col("bg")).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).cast("double").as("c2"))
      .localCheckpoint(false) // feeds prefix stats, continuation stats, scoring
    val pre = c2.groupBy(substring_index(col("b"), " ", 1).as("w1"))
      .agg(sum(col("c2")).as("c1"), count(lit(1)).cast("double").as("n1p"))
    val cont = c2.groupBy(substring_index(col("b"), " ", -1).as("w2"))
      .agg(count(lit(1)).cast("double").as("nc"))
    val types = c2.agg(count(lit(1)).cast("double")).head().getDouble(0)
    val v = corpus.select(explode(Dedup.words(col(textCol))).as("w"))
      .agg(countDistinct(col("w")).cast("double")).head().getDouble(0)
    val d = lit(discount)
    val pcont = (coalesce(col("nc"), lit(0.0)) + 0.5) / lit(types + 0.5 * v)
    bigramArr(docs, idCol, textCol)
      .select(col("__id").as(idCol), explode(col("bg")).as("b"))
      .withColumn("w1", substring_index(col("b"), " ", 1))
      .withColumn("w2", substring_index(col("b"), " ", -1))
      .join(c2, Seq("b"), "left")
      .join(pre, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .withColumn("p",
        when(col("c1").isNotNull,
          greatest(col("c2") - d, lit(0.0)) / col("c1") +
            d * col("n1p") / col("c1") * pcont)
          .otherwise(pcont))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), avg(-log(col("p"))).as("nll"))
  }

  /** CCNet-style perplexity bucketing: score every document with a
    * bigram LM trained on the TARGET corpus (e.g. the wiki-like slice)
    * and one trained on the full corpus, and bucket by the target-LM
    * nll against fixed thresholds — `head` (most target-like), `middle`,
    * `tail`. `delta` (target nll minus general nll) is the
    * domain-affinity signal DSIR generalizes.
    *
    * Two [[lmPerplexity]] passes + one join on the doc key; thresholds
    * are FIXED constants, not corpus quantiles, so the bucketing is
    * embarrassingly parallel and engine-exact (the CCNet paper also
    * fixes its cutoffs, from a held-out calibration). */
  def pplRatioBuckets(corpus: DataFrame, target: DataFrame, docs: DataFrame,
                      idCol: String, textCol: String,
                      headMax: Double, middleMax: Double,
                      k: Double = 1.0): DataFrame = {
    require(headMax < middleMax,
      s"head threshold $headMax must be below middle threshold $middleMax")
    val tgt = lmPerplexity(target, docs, idCol, textCol, k)
      .withColumnRenamed("nll", "nll_target")
    val gen = lmPerplexity(corpus, docs, idCol, textCol, k)
      .withColumnRenamed("nll", "nll_general")
      .drop("n_bigrams")
    tgt.join(gen, Seq(idCol))
      .select(col(idCol), col("n_bigrams"), col("nll_target"),
        (col("nll_target") - col("nll_general")).as("delta"),
        when(col("nll_target") < headMax, lit("head"))
          .when(col("nll_target") < middleMax, lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /** First-occurrence n-gram novelty — the "how much of this document
    * has the corpus already seen" diversity signal used to favor fresh
    * content in curation order. For each document: the fraction of its
    * DISTINCT w-word shingles whose first corpus occurrence (minimum doc
    * id) is this document. Early documents score high, boilerplate
    * repeated everywhere scores ~0 for every later copy.
    *
    * Shape: one shingle explode + min-aggregation on the gram key, one
    * join back, one per-doc aggregation — corpus-linear, and the counts
    * are INTEGER-exact (the ratio is one final division). Docs with no
    * grams (shorter than w words) drop out. */
  def ngramNovelty(df: DataFrame, idCol: String, textCol: String,
                   w: Int = 4): DataFrame = {
    val grams = Dedup.shingleSets(df, idCol, textCol, w)
      .select(col("__id"), explode(col("sh")).as("g"))
      .localCheckpoint(false) // feeds the first-seen agg and the per-doc join
    val first = grams.groupBy(col("g")).agg(min(col("__id")).as("first_id"))
    grams.join(first, Seq("g"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("total_grams"),
        sum(when(col("first_id") === col("__id"), lit(1L)).otherwise(lit(0L)))
          .as("novel_grams"))
      .withColumn("novelty",
        col("novel_grams").cast("double") / col("total_grams"))
      .withColumnRenamed("__id", idCol)
  }

  /** Tokenizer fertility per detected language: tokens-per-word and
    * chars-per-token of the BPE-ish regex tokenizer, grouped by
    * [[langId]]. The standard "how expensive is this language for the
    * tokenizer" diagnostic for mixture design (fertility >> 1 means the
    * tokenizer fragments that language). All-integer sums, one narrow
    * pass + one tiny aggregation — the divisions happen on the final
    * per-language row. */
  def tokenFertility(spark: org.apache.spark.sql.SparkSession,
                     df: DataFrame, textCol: String): DataFrame =
    df.select(langId(spark, col(textCol)).as("lang_pred"),
        wsTokenCount(col(textCol)).cast("long").as("wsn"),
        regexTokenCount(col(textCol)).cast("long").as("ren"),
        length(col(textCol)).cast("long").as("nc"))
      .groupBy(col("lang_pred"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("wsn")).as("ws_tokens"),
        sum(col("ren")).as("regex_tokens"),
        sum(col("nc")).as("chars"),
        (sum(col("ren")).cast("double") / sum(col("wsn"))).as("fertility"),
        (sum(col("nc")).cast("double") / sum(col("ren"))).as("chars_per_token"))

  /** Train-domain x eval-set contamination matrix: for every (training
    * domain, evaluation set) pair, the number and fraction of eval
    * documents whose distinct w-gram overlap with that domain's grams
    * reaches `threshold` — the audit table behind "which crawl sources
    * leak which benchmarks".
    *
    * Shape: domain grams deduplicate once per (domain, gram); the eval
    * side joins on the gram key only (never domain x eval doc
    * cartesian — pairs exist only where grams actually collide), then
    * one aggregation to (eval doc, domain) and one to the matrix cell.
    * Counts are integer-exact; `rate` is one final division. Eval sets
    * with zero contaminated docs still appear (cross join of the
    * observed domain and set keys), with rate 0. */
  def contaminationMatrix(train: DataFrame, domainCol: String,
                          eval: DataFrame, setCol: String, idCol: String,
                          textCol: String, w: Int = 3,
                          threshold: Double = 0.5): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    // typed gram kernel, NOT explode(Dedup.shingles(...)): exploding an
    // interpreted HOF re-evaluates the whole transform per OUTPUT row
    // (the PLANS.md-measured trap) — quadratic in shingles per doc
    val spark = train.sparkSession
    import spark.implicits._
    val ww = w
    val domainGrams = train
      .select(col(domainCol).cast("string").as("domain"),
        col(textCol).cast("string").as("__t"))
      .as[(String, String)]
      .mapPartitions(_.flatMap { case (dom, text) =>
        if (text == null) Iterator.empty
        else {
          val ws = text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
          val n = math.max(ws.length - ww, 0)
          val grams = new java.util.LinkedHashSet[String]()
          var i = 0
          while (i <= n) {
            val sb = new StringBuilder
            var o = 0
            while (o < ww && i + o < ws.length) {
              if (o > 0) sb.append(' ')
              sb.append(ws(i + o))
              o += 1
            }
            grams.add(sb.toString)
            i += 1
          }
          grams.toArray(Array.empty[String]).iterator.map(g => (dom, g))
        }
      })
      .toDF("domain", "g")
      .distinct()
    val evalSets = Dedup.shingleSets(eval, idCol, textCol, w)
      .join(eval.select(col(idCol).cast("long").as("__id"),
        col(setCol).as("eset")), Seq("__id"))
      .withColumn("n", size(col("sh")))
      .localCheckpoint(false) // feeds the per-set sizes and the overlap join
    val perSet = evalSets.groupBy(col("eset"))
      .agg(count(lit(1)).as("n_eval"))
    val hits = evalSets
      .select(col("__id"), col("eset"), col("n"), explode(col("sh")).as("g"))
      .join(domainGrams, Seq("g"))
      .groupBy(col("__id"), col("eset"), col("domain"), col("n"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c").cast("double") >= col("n").cast("double") * threshold)
      .groupBy(col("domain"), col("eset"))
      .agg(count(lit(1)).as("contaminated"))
    val domains = domainGrams.select(col("domain")).distinct()
    domains.crossJoin(perSet)
      .join(hits, Seq("domain", "eset"), "left")
      .select(col("domain"), col("eset").as("eval_set"), col("n_eval"),
        coalesce(col("contaminated"), lit(0L)).as("contaminated"),
        (coalesce(col("contaminated"), lit(0L)).cast("double") /
          col("n_eval")).as("rate"))
  }

  // -------------------------------------------------- corpus vocabulary

  /** Corpus vocabulary with counts: whitespace tokens (lowercased) and
    * their total occurrence counts, thresholded — the input to frequency
    * filters and tokenizer training. One map-side-combined aggregation
    * on the token key. */
  def vocabulary(df: DataFrame, textCol: String, minCount: Long = 1L): DataFrame =
    df.select(explode(Dedup.words(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)

  /** TF-IDF term weights per document: term frequency from one explode +
    * (doc, term) aggregation, document frequency from one term-keyed
    * aggregation over that result, idf = ln(nDocs / df) joined back on
    * the term key. Two shuffles (doc-term, term), both corpus-linear;
    * `minDf` prunes the long hapax tail before the join. The whole chain
    * is count arithmetic + ln — oracle-exact. */
  def tfidf(df: DataFrame, idCol: String, textCol: String,
            minDf: Long = 1L): DataFrame = {
    val nDocs = df.count().toDouble
    val tf = df.select(col(idCol), explode(Dedup.words(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
    tf.join(dfreq, "term")
      .withColumn("tfidf", col("tf") * log(lit(nDocs) / col("df")))
      .select(col(idCol), col("term"), col("tf"), col("df"), col("tfidf"))
  }

  // ------------------------------------------------------- contamination

  /** Benchmark-contamination detection: fraction of each document's
    * distinct w-word shingles that appear anywhere in the benchmark
    * corpus (the decontamination primitive for training pipelines).
    *
    * Shape: benchmark shingles deduplicate once, the doc-side inverted
    * index joins on the shingle key (benchmark side broadcasts when
    * small), and matches aggregate per doc — never a cartesian product,
    * corpus scales linearly. */
  def contamination(docs: DataFrame, idCol: String, textCol: String,
                    bench: DataFrame, benchTextCol: String,
                    w: Int = 3): DataFrame = {
    val docSets = Dedup.shingleSets(docs, idCol, textCol, w)
      .withColumn("n", size(col("sh")))
      .localCheckpoint(false) // GC-freed, unlike cache
    val benchGrams = Dedup.shingleSets(bench, idCol, benchTextCol, w)
      .select(explode(col("sh")).as("g")).distinct()
    val inv = docSets.select(col("__id"), explode(col("sh")).as("g"))
    val matched = inv.join(benchGrams, "g")
      .groupBy(col("__id")).agg(count(lit(1)).as("c"))
    docSets.join(matched, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        (coalesce(col("c"), lit(0L)).cast("double") / col("n"))
          .as("contamination"))
  }

  /** Bloom-filter contamination — the NO-JOIN scale path of
    * [[contamination]]. The benchmark's distinct shingles reduce to one
    * Bloom filter (a distributed treeAggregate build; the driver holds
    * only the filter bits, sized by the benchmark, never the corpus),
    * which broadcasts to a single narrow pass over the documents: no
    * inverted index, no shuffle of the corpus at all. One-sided error:
    * never *misses* a contaminated shingle (no false negatives), and
    * over-counts with probability <= `fpp` per clean shingle — exactly
    * the safe direction for decontamination (you only ever drop a few
    * extra docs). Use the exact operator when the per-doc fraction must
    * be auditable; use this one at 100 TB. */
  def contaminationBloom(docs: DataFrame, idCol: String, textCol: String,
                         bench: DataFrame, benchTextCol: String,
                         w: Int = 3, fpp: Double = 0.001): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val benchGrams = Dedup.shingleSets(bench, idCol, benchTextCol, w)
      .select(explode(col("sh")).as("g")).distinct()
      .localCheckpoint(false) // consumed by the count and the filter build
    val nGrams = math.max(benchGrams.count(), 1L)
    val filter = benchGrams.stat.bloomFilter("g", nGrams, fpp)
    val bcF = spark.sparkContext.broadcast(filter)
    Dedup.shingleSets(docs, idCol, textCol, w)
      .as[(Long, Array[String])]
      .map { case (id, sh) =>
        val f = bcF.value
        var hits = 0
        var i = 0
        while (i < sh.length) {
          if (f.mightContainString(sh(i))) hits += 1
          i += 1
        }
        (id, if (sh.length > 0) hits.toDouble / sh.length else 0.0)
      }
      .toDF(idCol, "contamination")
  }

  // --------------------------------------------------------- fingerprinting

  /** Document fingerprint: minimum md5 over all character k-grams (the
    * min-hash member of a winnowing scheme). Deterministic and
    * engine-portable. Typed kernel ([[graft.functions.TextKernels]]):
    * the HOF version interpreted one md5 expression per gram. */
  def fingerprint(df: DataFrame, idCol: String, textCol: String,
                  k: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        // null text -> null fingerprint (the HOF formulation's behavior)
        (id, if (text == null) null
             else graft.functions.TextKernels.minGramHash(text, k))
      }
      .toDF(idCol, "fingerprint")
  }

  /** Winnowing fingerprints: minimum gram-hash in each sliding window of
    * `w` consecutive k-gram hashes — the standard winnowing selection
    * (Schleimer et al.).
    *
    * Typed kernel: the nested-HOF formulation (transform over window
    * positions of array_min(slice(gramHashes))) re-evaluated the ENTIRE
    * gram-hash array per window position interpreted — O(n^2) md5 calls
    * per document. The kernel hashes each gram once and slides the
    * window: O(n*w) string compares, one md5 per gram. */
  def winnowing(df: DataFrame, idCol: String, textCol: String,
                k: Int = 8, w: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        // null text -> no fingerprints (one bad row must not fail the job)
        (id, if (text == null) Array.empty[String]
             else graft.functions.TextKernels.winnow(text, k, w))
      }
      .toDF(idCol, "fingerprints")
  }
  /** Windowed collocation PMI (the classic collocation-extraction
    * statistic): token pairs co-occurring within `window` positions,
    * scored `pmi = ln((c_ab/N_pairs) / ((c_a/N)·(c_b/N)))` against
    * the unigram marginals. Integer counts with ONE ln at the end —
    * engine-exact.
    *
    * Shape: NO per-document quadratic — each position explodes to its
    * `window` forward offsets and equi-joins back on (doc, position),
    * so the pair stream is exactly `window ×` the token stream
    * (corpus-linear), then aggregates to the (tiny) pair vocabulary.
    * Unordered pairs canonicalize lexically; self-pairs (a word near
    * itself) count like any other — the repetition signal. */
  def cooccurrence(df: DataFrame, idCol: String, textCol: String,
                   window: Int = 5, minPair: Long = 2L,
                   outDigits: Int = 6): DataFrame = {
    require(window >= 1, "window must be >= 1")
    // the posexplode + window-offset explode inherit the scan
    // partitioning — spread thin inputs so the token/pair streams
    // build in parallel (no-op at scale)
    val tok = Spread.thin(df.select(col(idCol).as("__doc"), col(textCol)))
      .select(col("__doc"),
        posexplode(Dedup.words(col(textCol))).as(Seq("pos", "tok")))
      .localCheckpoint(false) // marginals + both pair-join sides reuse it
    val nTok = tok.count().toDouble
    val uni = tok.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val shifted = tok
      .select(col("__doc"), col("pos"), col("tok").as("t1"),
        explode(sequence(lit(1), lit(window))).as("o"))
      .select(col("__doc"), (col("pos") + col("o")).as("pos"), col("t1"))
    val pairs = shifted
      .join(tok.select(col("__doc"), col("pos"), col("tok").as("t2")),
        Seq("__doc", "pos"))
      .select(least(col("t1"), col("t2")).as("tok_a"),
        greatest(col("t1"), col("t2")).as("tok_b"))
      .localCheckpoint(false) // pair total + pair counts reuse it
    val nPairs = pairs.count().toDouble
    pairs.groupBy(col("tok_a"), col("tok_b")).agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minPair)
      .join(broadcast(uni.select(col("tok").as("tok_a"), col("c").as("c_a"))),
        "tok_a")
      .join(broadcast(uni.select(col("tok").as("tok_b"), col("c").as("c_b"))),
        "tok_b")
      .select(col("tok_a"), col("tok_b"), col("n_pair"), col("c_a"), col("c_b"),
        round(log((col("n_pair") * lit(nTok * nTok))
          / (lit(nPairs) * (col("c_a") * col("c_b")))), outDigits).as("pmi"))
  }

  /** Positional inverted index: (token, doc, occurrence count, first
    * 1-based position) postings for tokens appearing in >= minDocs
    * documents — the retrieval-index build step (BM25/phrase search
    * run over exactly this shape). Integer-exact.
    *
    * Shape: one posexplode (narrow) → (token, doc) aggregation →
    * token-keyed df filter join. Corpus-linear; the index is
    * naturally partitioned by token key for serving. */
  def positionalIndex(df: DataFrame, idCol: String, textCol: String,
                      minDocs: Long = 2L): DataFrame = {
    val posting = df.select(col(idCol).as("doc_id"),
        posexplode(Dedup.words(col(textCol))).as(Seq("pos0", "token")))
      .groupBy(col("token"), col("doc_id"))
      .agg(count(lit(1)).as("n_occur"), (min(col("pos0")) + 1).as("first_pos"))
    val dfreq = posting.groupBy(col("token"))
      .agg(count(lit(1)).as("df")).filter(col("df") >= minDocs)
    posting.join(dfreq, "token")
      .select(col("token"), col("doc_id"), col("n_occur"),
        col("first_pos"), col("df"))
  }

  // -------------------------------------------------- code/prose routing

  /** Code-vs-prose signals — the routing gate that keeps source code
    * out of a prose corpus (or carves out a code corpus): symbol
    * density, code-keyword hits, indented/terminator line ratios, with
    * a thresholded `is_code` verdict. All counts come from
    * `regexp_extract_all` lengths (RE2 == Java on these patterns) and
    * integer line arithmetic — engine-exact; ratios are the only
    * doubles. Pure narrow projection, no shuffle.
    *
    * Returns (idCol, n_chars, n_symbols, n_keywords, n_lines,
    * n_marked_lines, symbol_ratio, is_code) where marked lines start
    * indented or end in `;`/`{`/`}`. */
  def codeSignals(df: DataFrame, idCol: String, textCol: String,
                  symbolRatioMin: Double = 0.03,
                  keywordsMin: Long = 2L,
                  markedLineRatioMin: Double = 0.3): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val nChars = length(t)
    val nSym = size(regexp_extract_all(t, lit("[{}\\[\\]();=<>]"), lit(0)))
    val nKw = size(regexp_extract_all(t,
      lit("\\b(def|class|return|import|function|var|val|int|void|if|else|for|while)\\b"),
      lit(0)))
    val lines = split(t, "\n")
    val nLines = size(lines)
    val nMarked = size(filter(lines, l =>
      l.rlike("^(  |\\t)") || l.rlike("[;{}]\\s*$")))
    df.select(col(idCol), nChars.as("n_chars"), nSym.as("n_symbols"),
        nKw.cast("long").as("n_keywords"), nLines.as("n_lines"),
        nMarked.as("n_marked_lines"))
      .withColumn("symbol_ratio",
        col("n_symbols").cast("double") / greatest(col("n_chars"), lit(1)))
      .withColumn("is_code",
        (col("symbol_ratio") > symbolRatioMin &&
          col("n_keywords") >= keywordsMin) ||
        (col("n_marked_lines").cast("double") /
          greatest(col("n_lines"), lit(1)) > markedLineRatioMin))
  }

  // ------------------------------------------------ checksum-verified PII

  /** Payment-card detection with Luhn validation — the checksum stage
    * that separates real PAN leaks from random digit runs, so a PII
    * scrubber can redact aggressively without mangling order ids and
    * timestamps. Returns one row per candidate digit run (13–19 digits,
    * spaces/dashes allowed): (idCol, candidate, digits, luhn_valid).
    *
    * Everything is integer arithmetic over the digit characters
    * (`aggregate` over the reversed digit string — codegen'd, no UDF),
    * and the candidate regex avoids lookarounds so the oracle's RE2
    * extracts the identical spans. Narrow explode; corpus-linear. */
  def luhnScan(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val cand = explode(regexp_extract_all(col(textCol),
      lit("[0-9](?:[ -]?[0-9]){12,18}"), lit(0)))
    val digits = regexp_replace(col("candidate"), "[ -]", "")
    val chars = split(reverse(col("digits")), "")
    val luhnSum = aggregate(
      sequence(lit(1), size(chars)), lit(0),
      (acc, i) => {
        val d = element_at(chars, i).cast("int")
        acc + when(i % 2 === 1, d)
          .otherwise(d * 2 - when(d >= 5, 9).otherwise(0))
      })
    df.select(col(idCol), cand.as("candidate"))
      .withColumn("digits", digits)
      .filter(length(col("digits")).between(13, 19))
      .withColumn("luhn_valid", luhnSum % 10 === 0)
  }

  /** Quality-gate co-failure matrix: how often each pair of filter
    * gates fires together — the tuning diagnostic that shows which
    * gates are redundant (near-identical fail sets) and which catch
    * unique garbage. Gates are integral cross-multiplied predicates
    * (no float ratios, engine-exact):
    *
    *   short       n_words < 20          long      n_words > 300
    *   repetitive  2·distinct < words    numeric   5·digits > chars
    *   puncty      5·punct > chars       mojibake  any corruption marker
    *
    * One narrow projection builds each doc's failed-gate array; the
    * double explode emits ≤ g² pairs per doc (g ≤ 6); one grouped
    * count. Diagonal rows are per-gate totals. */
  def gateMatrix(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val ws = Dedup.words(t)
    val nWords = size(ws).cast("long")
    val nDistinct = size(array_distinct(ws)).cast("long")
    val nChars = length(t).cast("long")
    val nDigits = (nChars - length(regexp_replace(t, "[0-9]", "")))
      .cast("long")
    val nPunct = (nChars - length(regexp_replace(t, "[^\\w\\s]", "")))
      .cast("long")
    val moji = size(regexp_extract_all(t, lit("\\x{FFFD}"), lit(0))) +
      size(regexp_extract_all(t, lit("[\\x{80}-\\x{9f}]"), lit(0)))
    val gates = Seq(
      "short" -> (nWords < 20),
      "long" -> (nWords > 300),
      "repetitive" -> (nDistinct * 2 < nWords),
      "numeric" -> (nDigits * 5 > nChars),
      "puncty" -> (nPunct * 5 > nChars),
      "mojibake" -> (moji > 0))
    val failed = array_compact(array(gates.map { case (name, cond) =>
      when(cond, lit(name)) }: _*))
    df.select(col(idCol), failed.as("__f"))
      .select(col(idCol), explode(col("__f")).as("gate_a"), col("__f"))
      .select(col(idCol), col("gate_a"), explode(col("__f")).as("gate_b"))
      .filter(col("gate_a") <= col("gate_b"))
      .groupBy(col("gate_a"), col("gate_b"))
      .agg(count(lit(1)).as("n_both"))
  }

  /** IBAN detection with MOD-97 validation (ISO 13616) — [[luhnScan]]'s
    * sibling for bank-account PII: candidates are word-bounded
    * `CC##A…` runs; validation rearranges the first four chars to the
    * end, expands letters to two digits (A=10..Z=35) and folds the
    * resulting number mod 97 — an integer `aggregate` over the chars
    * (acc ≤ 96, so `acc·100+35` never leaves Int range), valid iff the
    * remainder is 1. Narrow explode; corpus-linear; the oracle replays
    * the identical fold as a recursive CTE. */
  def ibanScan(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val cand = explode(regexp_extract_all(col(textCol),
      lit("\\b[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}\\b"), lit(0)))
    val rearranged = concat(expr("substr(candidate, 5)"),
      expr("substr(candidate, 1, 4)"))
    val chars = split(col("__r"), "")
    val mod97 = aggregate(
      sequence(lit(1), size(chars)), lit(0),
      (acc, i) => {
        val c = ascii(element_at(chars, i))
        when(c.between(48, 57), (acc * 10 + (c - 48)) % 97)
          .otherwise((acc * 100 + (c - 55)) % 97)
      })
    df.select(col(idCol), cand.as("candidate"))
      .withColumn("__r", rearranged)
      .withColumn("iban_valid",
        length(col("candidate")).between(15, 34) && mod97 === 1)
      .drop("__r")
  }

  // ----------------------------------------------------- domain blocklist

  /** Suffix-semantics domain blocklist marking — the crawl-pipeline
    * deny-list primitive: a rule `example.com` blocks the domain itself
    * AND every subdomain (`ads.example.com`), the way Public Suffix /
    * adblock lists are interpreted.
    *
    * `idCol` must uniquely key `df`'s rows (an explode producer should
    * pass its (doc, url-ordinal) key); `rules` is a one-column frame of
    * blocked domain suffixes. Returns the input plus `domain` and
    * `blocked_by` (the LONGEST matching rule, alphabetical tie-break —
    * deterministic; null = allowed).
    *
    * Shape (100 TB): each URL explodes into its domain's dot-suffixes
    * (bounded by label depth, ~5) and equi-joins the broadcast rule
    * table — never a LIKE scan per rule, so cost is corpus-linear and
    * independent of blocklist size. */
  def markBlockedDomains(df: DataFrame, idCol: String, urlCol: String,
                         rules: DataFrame, ruleCol: String = "pattern"): DataFrame = {
    val withDomain = df.withColumn("domain", urlDomain(col(urlCol)))
    val parts = split(col("domain"), "\\.")
    val suffixes = withDomain
      .select(col(idCol), explode(transform(
        sequence(lit(1), size(parts)),
        // length = full size is always >= the remaining tail (slice
        // clamps); an Int.MaxValue length would overflow start+length
        i => concat_ws(".", slice(parts, i, size(parts))))).as("sfx"))
    val matched = suffixes
      .join(broadcast(rules.select(col(ruleCol).as("sfx")).distinct()), "sfx")
      .groupBy(col(idCol))
      .agg(max(struct(length(col("sfx")).as("l"), col("sfx").as("s")))
        .as("best"))
      .select(col(idCol), col("best.s").as("blocked_by"))
    withDomain.join(matched, Seq(idCol), "left")
  }

  // --------------------------------------------------- unicode hygiene

  /** NFC normalization + per-document normalization stats — the
    * unicode-hygiene pass (mojibake from mixed encodings, decomposed
    * accents from OCR/mac filesystems) that runs before any
    * hash-keyed dedup: two canonically-equal strings hash apart unless
    * both sides normalized first.
    *
    * Returns (idCol, len_raw, len_nfc, changed) with codepoint counts
    * (not UTF-16 units — portable to engines whose `length` is
    * codepoint-based, like DuckDB). The transform itself is
    * [[nfc]]. Pure narrow kernel pass; no shuffle. */
  def nfcStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          if (text == null) (id, 0L, 0L, false)
          else {
            val n = java.text.Normalizer.normalize(
              text, java.text.Normalizer.Form.NFC)
            (id, text.codePointCount(0, text.length).toLong,
              n.codePointCount(0, n.length).toLong, n != text)
          }
        }
      }
      .toDF(idCol, "len_raw", "len_nfc", "changed")
  }

  /** NFC-normalize a text Dataset column via a typed kernel: returns
    * (idCol, textCol) with the text canonically composed. */
  def nfc(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        (id, if (text == null) null
             else java.text.Normalizer.normalize(
               text, java.text.Normalizer.Form.NFC))
      })
      .toDF(idCol, textCol)
  }

  /** Encoding-artifact (mojibake) scan: per-document counts of the
    * classic corruption fingerprints a crawl carries —
    *
    *   n_replacement — U+FFFD replacement characters (decoder already
    *                   gave up)
    *   n_c1          — C1 control codepoints U+0080–U+009F (Windows-1252
    *                   bytes mis-read as Latin-1/UTF-8)
    *   n_latin1      — 'Ã' / 'Â' lead bytes and the 'â€' digraph, the
    *                   UTF-8-decoded-as-Latin-1 signature ("Ã©" for é,
    *                   "â€™" for ’)
    *
    * plus `is_mojibake` when any count is positive. Codepoint-class
    * counts are `regexp_extract_all` lengths (RE2 == Java on explicit
    * codepoint classes); the digraph/lead counts are replace()-length
    * arithmetic — no regex at all. One narrow projection, no shuffle:
    * corpus-linear, a gate in the same family as the Gopher repetition
    * filters. */
  def mojibakeScan(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    def subCount(needle: String): Column =
      (length(t) - length(regexp_replace(t, lit(java.util.regex.Pattern.quote(needle)), lit("")))) / needle.length
    val nRepl = size(regexp_extract_all(t, lit("\\x{FFFD}"), lit(0)))
    val nC1 = size(regexp_extract_all(t, lit("[\\x{80}-\\x{9f}]"), lit(0)))
    val nLatin1 = (subCount("\u00c3") + subCount("\u00c2") +
      subCount("\u00e2\u20ac")).cast("long")
    df.select(col(idCol), length(t).cast("long").as("n_chars"),
        nRepl.cast("long").as("n_replacement"),
        nC1.cast("long").as("n_c1"),
        nLatin1.as("n_latin1"))
      .withColumn("is_mojibake",
        col("n_replacement") + col("n_c1") + col("n_latin1") > 0)
  }

  /** Flesch–Kincaid readability signals: words (whitespace runs),
    * sentences (terminator runs, floored at 1), syllables (vowel
    * groups of the lowercased text — the standard heuristic; vowel
    * groups never span whitespace so the text-global count equals the
    * per-word sum), and the FK grade
    * `0.39·W/S + 11.8·Syl/W − 15.59` rounded to milli-units. The grade
    * is the only non-integer: one fixed expression tree of IEEE double
    * ops per row, identical on any engine. One narrow projection. */
  def readability(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val words = size(regexp_extract_all(lower(t), lit("[^\\s]+"), lit(0)))
      .cast("long")
    val sents = greatest(
      size(regexp_extract_all(t, lit("[.!?]+"), lit(0))).cast("long"), lit(1L))
    val syls = size(regexp_extract_all(lower(t), lit("[aeiouy]+"), lit(0)))
      .cast("long")
    df.select(col(idCol), words.as("n_words"), sents.as("n_sentences"),
        syls.as("n_syllables"))
      .withColumn("fk_grade_milli",
        when(col("n_words") > 0,
          round((lit(0.39) * col("n_words").cast("double") /
            col("n_sentences").cast("double") +
            lit(11.8) * col("n_syllables").cast("double") /
            col("n_words").cast("double") - lit(15.59)) * 1000)
            .cast("long")))
  }

  /** RAKE keyphrase extraction (Rose et al. 2010), integral scoring:
    * candidate phrases are maximal runs between stopwords/punctuation;
    * each word scores `deg(w)·1e6 div freq(w)` (deg = summed length of
    * phrases containing it, freq = occurrences) and a phrase scores the
    * sum of its word scores.
    *
    * Shape (100 TB): phrase extraction is a narrow regex pipeline +
    * explode (corpus-linear); word stats are ONE map-side-combined
    * aggregation; the phrase score is one (word → score) equi-join +
    * one grouped sum — join volume is total phrase words, never
    * pairwise. Returns one row per distinct phrase with `n_docs`,
    * `score_ppm`; the caller ranks/filters (e.g. top-k via
    * [[TopK.perGroup]] or a global rank). */
  def rakePhrases(df: DataFrame, idCol: String, textCol: String,
                  stopwords: Seq[String] = Seq("the", "and", "of", "to",
                    "a", "in", "is", "for", "on", "with"),
                  minPhraseWords: Int = 2): DataFrame = {
    require(stopwords.nonEmpty, "need a stopword list")
    require(minPhraseWords >= 1, "minPhraseWords must be >= 1")
    val stopPat = s"\\b(${stopwords.mkString("|")})\\b"
    // lower → strip non-letters → stopwords to '|' → split to phrases
    val cleaned = regexp_replace(lower(coalesce(col(textCol), lit(""))),
      lit("[^a-z ]"), lit(" "))
    val marked = regexp_replace(cleaned, lit(stopPat), lit("|"))
    val phrase = explode(split(marked, lit("\\|")))
    val phrases = df
      .select(col(idCol).as("__doc"), phrase.as("__raw"))
      .select(col("__doc"),
        trim(regexp_replace(col("__raw"), lit(" +"), lit(" "))).as("phrase"))
      .filter(length(col("phrase")) > 0)
      .filter(size(split(col("phrase"), lit(" "))) >= minPhraseWords)
    val pw = phrases.select(col("__doc"), col("phrase"),
        size(split(col("phrase"), lit(" "))).cast("long").as("__len"),
        explode(split(col("phrase"), lit(" "))).as("__w"))
    val wordStats = pw.groupBy(col("__w"))
      .agg(count(lit(1)).as("__freq"), sum(col("__len")).as("__deg"))
      .select(col("__w"), expr("__deg * 1000000 div __freq").as("__wscore"))
    // score each DISTINCT phrase once (instances share the word multiset)
    val distinctPhrases = phrases.groupBy(col("phrase"))
      .agg(countDistinct(col("__doc")).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
    val scored = distinctPhrases
      .select(col("phrase"), explode(split(col("phrase"), lit(" "))).as("__w"))
      .join(wordStats, "__w")
      .groupBy(col("phrase"))
      .agg(sum(col("__wscore")).as("score_ppm"))
    distinctPhrases.join(scored, "phrase")
      .select(col("phrase"), col("n_docs"), col("n_occurrences"),
        col("score_ppm"))
  }
}
