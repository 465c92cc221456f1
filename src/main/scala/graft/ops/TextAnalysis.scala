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
  def bm25(df: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = df.select(col(idCol), explode(Dedup.words(col(textCol))).as("w"))
    // cache the small per-doc length table; n and avgLen come from ONE
    // action over it instead of separate corpus scans (tokenization —
    // the expensive step — runs twice total: docLen and tf)
    val docLen = toks.groupBy(idCol).agg(count(lit(1)).as("dl"))
      .localCheckpoint(false) // GC-freed, unlike cache
    val stats = docLen.agg(count(lit(1)).cast("double"), avg(col("dl"))).head
    val n = stats.getDouble(0)
    val avgLen = stats.getDouble(1)
    val qt = toks.filter(col("w").isInCollection(queryTerms))
    val tf = qt.groupBy(col(idCol), col("w")).agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy(col("w")).agg(count(lit(1)).cast("double").as("df"))
    tf.join(broadcast(dfreq), "w")
      .join(docLen, idCol)
      .withColumn("idf", log(lit(1.0) + (lit(n) - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("s", col("idf") * col("tf") * lit(k1 + 1) /
        (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / lit(avgLen))))
      .groupBy(idCol).agg(sum(col("s")).as("bm25"))
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
}
