package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level distributional statistics — the diagnostics a curation
  * pipeline runs before and after every filtering/mixing decision:
  * per-document lexical health (entropy, type-token ratio), corpus
  * Zipf conformance (tokenizer / crawl sanity), and per-slice
  * KL divergence against the full corpus (mixture drift).
  *
  * All token handling mirrors [[Dedup.words]] (lowercased whitespace
  * split) so every statistic is reproducible by the DuckDB oracle.
  */
object CorpusStats {

  /** Per-document lexical statistics: token count, distinct-type count,
    * type-token ratio, hapax ratio (fraction of types occurring once),
    * and unigram Shannon entropy in nats
    * (`ln n − Σ c·ln c / n` — computed from integer counts, so only the
    * final arithmetic is floating point).
    *
    * Low entropy / low TTR flags templated or repetitive documents —
    * the same family of gates as [[TextAnalysis.repetitionStats]] but
    * distribution-based rather than span-based.
    *
    * Shape (100 TB): one explode into a map-side-combined (doc, token)
    * count, then one (doc) aggregation — both corpus-linear, no state
    * beyond the combiner. */
  def lexicalStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(Dedup.words(col(textCol))).as("w"))
      .groupBy(col(idCol), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"),
        sum(col("c").cast("double") * log(col("c").cast("double"))).as("_clnc"))
      .select(col(idCol), col("n_tokens"), col("n_types"),
        (col("n_types").cast("double") / col("n_tokens")).as("ttr"),
        (col("n_hapax").cast("double") / col("n_types")).as("hapax_ratio"),
        (log(col("n_tokens").cast("double")) -
          col("_clnc") / col("n_tokens")).as("entropy"))

  /** Zipf's-law fit over the top-`topK` token frequencies: OLS of
    * `ln freq ~ ln rank` (rank by count desc, token asc for a total
    * order). A healthy natural-language corpus sits near slope −1;
    * boilerplate floods or tokenizer bugs bend the curve — the standard
    * one-number crawl-health diagnostic.
    *
    * Returns one row: (top_k, slope, intercept).
    *
    * Shape (100 TB): the vocabulary aggregation is one map-side-combined
    * count on the token key; only `topK` rows (orderBy + limit = a
    * distributed TakeOrdered — never a full sort) reach the ranking
    * window, which is therefore bounded at `topK` rows regardless of
    * corpus size (the unpartitioned window is safe ONLY because of that
    * bound). */
  def zipfFit(df: DataFrame, textCol: String, topK: Int = 100): DataFrame = {
    require(topK > 1, s"topK must be > 1, got $topK")
    val top = TextAnalysis.vocabulary(df, textCol)
      .orderBy(desc("cnt"), col("word")).limit(topK)
    val xy = top
      .withColumn("r", row_number().over(
        Window.orderBy(desc("cnt"), col("word"))))
      .select(log(col("r").cast("double")).as("x"),
        log(col("cnt").cast("double")).as("y"))
    xy.agg(count(lit(1)).cast("double").as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("n").cast("long").as("top_k"),
        ((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx"))).as("slope"),
        ((col("sy") - col("sx") *
          ((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")))) / col("n"))
          .as("intercept"))
  }

  /** Per-slice KL divergence `KL(p_slice ‖ p_corpus)` over Laplace-
    * smoothed hashed-unigram distributions — "how far has each source /
    * shard / snapshot drifted from the corpus mixture", the
    * distribution-level companion to [[Drift.psi]].
    *
    * Tokens hash into `buckets` md5 buckets (the [[Importance]] DSIR
    * featurization, portable to the oracle as
    * `('0x' || substr(md5(w),1,8))::BIGINT % buckets`), so the state is
    * `slices × buckets` rows no matter how large the vocabulary — the
    * full-vocab KL would carry a corpus-sized join at 100 TB; the
    * bucketed one is a constant-size table. The bucket grid is dense
    * (every (slice, bucket) cell, absent ⇒ count 0), so the smoothed
    * distributions sum to exactly 1 and the KL is a true divergence.
    *
    * Returns (slice, n_tokens, kl). */
  def klMixture(df: DataFrame, sliceCol: String, textCol: String,
                buckets: Int = 4096, s: Double = 1.0): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(s > 0, s"smoothing constant must be positive, got $s")
    val spark = df.sparkSession
    import spark.implicits._
    val b = buckets.toLong
    val counts = df.select(col(sliceCol).cast("string"), col(textCol))
      .as[(String, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        def bucket(w: String): Long = {
          val h = md.digest(w.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          val v = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
            ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
          v % b
        }
        it.flatMap { case (slice, text) =>
          if (slice == null || text == null) Iterator.empty
          else {
            val ws = text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
            ws.iterator.map(w => (slice, bucket(w)))
          }
        }
      }
      .toDF("slice", "b")
      .groupBy(col("slice"), col("b")).agg(count(lit(1)).as("c"))
      .localCheckpoint(false) // feeds the corpus totals AND the grid join
    val corpus = counts.groupBy(col("b")).agg(sum(col("c")).as("cb"))
    val total = corpus.agg(coalesce(sum(col("cb")), lit(0L))).head().getLong(0)
    val sliceTotals = counts.groupBy(col("slice"))
      .agg(sum(col("c")).as("n_tokens"))
    // dense (slice × bucket) grid: slices are few, buckets bounded —
    // the cross join is (n_slices × buckets) rows, broadcast-sized
    val grid = sliceTotals.crossJoin(
      spark.range(buckets).select(col("id").as("b")))
    val denomQ = total.toDouble + s * buckets
    grid
      .join(counts, Seq("slice", "b"), "left")
      .join(broadcast(corpus), Seq("b"), "left")
      .select(col("slice"), col("n_tokens"),
        ((coalesce(col("c"), lit(0L)).cast("double") + s) /
          (col("n_tokens").cast("double") + s * buckets)).as("p"),
        ((coalesce(col("cb"), lit(0L)).cast("double") + s) / denomQ).as("q"))
      .groupBy(col("slice"), col("n_tokens"))
      .agg(sum(col("p") * log(col("p") / col("q"))).as("kl"))
      .select(col("slice"), col("n_tokens"), col("kl"))
  }

  /** Corpus concentration (coverage) curve: the top-k keys by row
    * count with each prefix's cumulative share of the WHOLE corpus —
    * "the top N domains hold X% of the documents", the mixture-risk
    * diagnostic behind temperature and cap decisions. All integral
    * (cum·1e6 div total). The zipfFit discipline bounds the global
    * ordering: TakeOrdered(topK) runs BEFORE the rank window, so the
    * window sees ≤ topK rows — never the key universe. The total
    * includes the tail beyond top-k, so the last row's share_cum_ppm
    * < 1e6 exactly measures the uncovered mass. */
  def coverageCurve(df: DataFrame, keyCol: String,
                    topK: Int = 100): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val counts = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(false) // total + top-k reuse
    val total = counts.agg(coalesce(sum(col("cnt")), lit(0L)))
      .head().getLong(0)
    require(total > 0, "no non-null rows")
    val w = Window.orderBy(desc("cnt"), col(keyCol))
    counts.orderBy(desc("cnt"), col(keyCol)).limit(topK)
      .withColumn("rank", row_number().over(w))
      .withColumn("cum", sum(col("cnt")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("rank"), col(keyCol), col("cnt"), col("cum"),
        expr(s"cum * 1000000 div CAST($total AS BIGINT)").as("share_cum_ppm"))
  }

  /** VALUE-weighted coverage (Pareto) curve: the top-k keys by summed
    * cent mass with each prefix's cumulative share of the WHOLE
    * corpus's mass — "the top N customers hold X% of revenue", the
    * [[coverageCurve]] generalized from row counts to an additive
    * measure. Same TakeOrdered-bounded shape: the rank window sees at
    * most topK rows. */
  def paretoCurve(df: DataFrame, keyCol: String,
                  valueCol: String, topK: Int = 100,
                  scaleDigits: Int = 2): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val unit = math.pow(10, scaleDigits)
    val vc = round(col(valueCol).cast("double") * lit(unit)).cast("long")
    val mass = df.filter(col(keyCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(keyCol)).agg(sum(vc).as("cents"))
      .localCheckpoint(false) // total + top-k reuse
    val total = mass.agg(coalesce(sum(col("cents")), lit(0L)))
      .head().getLong(0)
    require(total > 0, "no positive mass")
    val w = Window.orderBy(desc("cents"), col(keyCol))
    mass.orderBy(desc("cents"), col(keyCol)).limit(topK)
      .withColumn("rank", row_number().over(w))
      .withColumn("cum", sum(col("cents")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("rank"), col(keyCol), col("cents"), col("cum"),
        expr(s"cum * 1000000 div CAST($total AS BIGINT)").as("share_cum_ppm"))
  }

  /** Per-slice lexical diversity: token Shannon entropy (bits),
    * Simpson repeat probability, and type-token ratio — the "is this
    * source word-soup or natural text" triage that complements the
    * Zipf fit. One token explode + (slice, token) count, one slice
    * rollup; the integral outputs (Simpson / TTR as floored ppm) are
    * engine-exact, and the entropy follows the [[klMixture]] ln-sum
    * discipline (rounded once at the end). Returns one row per slice:
    * (slice, n_tokens, vocab, simpson_ppm, ttr_ppm, entropy_bits). */
  def tokenDiversity(df: DataFrame, sliceCol: String, textCol: String,
                     outDigits: Int = 6): DataFrame = {
    val counts = df
      .filter(col(sliceCol).isNotNull && col(textCol).isNotNull)
      .select(col(sliceCol).as("slice"),
        explode(Dedup.words(col(textCol))).as("w"))
      .groupBy("slice", "w").agg(count(lit(1)).as("c"))
    val totals = counts.groupBy("slice")
      .agg(sum(col("c")).as("n"), count(lit(1)).as("vocab"),
        sum(col("c") * (col("c") - lit(1L))).as("rp"))
    counts.join(totals, Seq("slice"))
      .groupBy(col("slice"), col("n"), col("vocab"), col("rp"))
      .agg(sum((col("c").cast("double") / col("n").cast("double"))
        * log(col("n").cast("double") / col("c").cast("double"))).as("ent_nats"))
      .select(col("slice"), col("n").as("n_tokens"), col("vocab"),
        expr("rp * 1000000 div (n * (n - 1))").as("simpson_ppm"),
        expr("vocab * 1000000 div n").as("ttr_ppm"),
        round(col("ent_nats") / log(lit(2.0)), outDigits).as("entropy_bits"))
      .orderBy("slice")
  }

  /** Jensen–Shannon divergence between TWO slices' hashed-token
    * distributions — the symmetric, bounded ([0,1] bit) companion to
    * [[klMixture]]'s slice-vs-corpus KL, the right pairwise distance
    * for "how far apart are these two sources". Same md5 bucket
    * kernel, same +s smoothing over the dense bucket grid, same
    * ln-sum discipline (one rounded double). Returns one row
    * (n_a, n_b, jsd_bits). */
  def jsDivergence(df: DataFrame, sliceCol: String, textCol: String,
                   sliceA: String, sliceB: String, buckets: Int = 1024,
                   s: Double = 1.0, outDigits: Int = 6): DataFrame = {
    require(buckets > 0 && s > 0, "buckets and smoothing must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val b = buckets.toLong
    val counts = df
      .filter(col(sliceCol).isin(sliceA, sliceB))
      .select(col(sliceCol).cast("string"), col(textCol))
      .as[(String, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        def bucket(w: String): Long = {
          val h = md.digest(w.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          val v = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
            ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
          v % b
        }
        it.flatMap { case (slice, text) =>
          if (slice == null || text == null) Iterator.empty
          else {
            val ws = text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
            ws.iterator.map(w => (slice, bucket(w)))
          }
        }
      }
      .toDF("slice", "b")
      .groupBy(col("slice"), col("b")).agg(count(lit(1)).as("c"))
    val grid = spark.range(buckets).select(col("id").as("b"))
      .join(counts.filter(col("slice") === sliceA)
        .select(col("b"), col("c").as("ca")), Seq("b"), "left")
      .join(counts.filter(col("slice") === sliceB)
        .select(col("b"), col("c").as("cb")), Seq("b"), "left")
      .na.fill(0L, Seq("ca", "cb"))
    val totals = grid.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    grid.crossJoin(broadcast(totals))
      .select(col("na"), col("nb"),
        ((col("ca").cast("double") + lit(s))
          / (col("na").cast("double") + lit(s * buckets))).as("p"),
        ((col("cb").cast("double") + lit(s))
          / (col("nb").cast("double") + lit(s * buckets))).as("q"))
      .withColumn("m", (col("p") + col("q")) * lit(0.5))
      .groupBy(col("na"), col("nb"))
      .agg(sum(lit(0.5) * col("p") * log(col("p") / col("m"))
        + lit(0.5) * col("q") * log(col("q") / col("m"))).as("jsd_nats"))
      .select(col("na").as("n_a"), col("nb").as("n_b"),
        round(col("jsd_nats") / log(lit(2.0)), outDigits).as("jsd_bits"))
  }

  /** Distinctive terms per slice — Monroe et al.'s "Fightin' Words"
    * log-odds with an informative Dirichlet prior, the statistically
    * honest replacement for raw TF-IDF "top terms" when comparing
    * sources (it damps both hapax noise and stopword mass). For slice
    * s and term w with slice count y_sw, corpus count y_w, slice
    * total n_s and corpus total N, prior α_w = a0·y_w/N:
    * δ = ln((y_sw+α_w)/(n_s+a0−y_sw−α_w)) − ln((y_rw+α_w)/(N−n_s+a0−y_rw−α_w)),
    * where y_rw = y_w − y_sw is the rest-of-corpus count; z = δ/√var
    * with var ≈ 1/(y_sw+α_w) + 1/(y_rw+α_w). Counts are exact; every
    * term's z is assembled from them with one rounding. Top-k per
    * slice by (z desc, term) — a keyed WindowGroupLimit, bounded at
    * k·slices rows. `minCount` prunes the hapax tail before any join.
    * Returns (slice, term, y_sw, z_score). */
  def distinctiveTerms(df: DataFrame, sliceCol: String, textCol: String,
                       topK: Int = 10, a0: Double = 100.0,
                       minCount: Long = 5, outDigits: Int = 6): DataFrame = {
    require(topK >= 1 && a0 > 0 && minCount >= 1, "bad parameters")
    val toks = df
      .filter(col(sliceCol).isNotNull && col(textCol).isNotNull)
      .select(col(sliceCol).as("slice"),
        explode(Dedup.words(col(textCol))).as("w"))
    val sw = toks.groupBy("slice", "w").agg(count(lit(1)).as("y_sw"))
      .localCheckpoint(false) // corpus + slice totals reuse
    val wTot = sw.groupBy("w").agg(sum(col("y_sw")).as("y_w"))
      .filter(col("y_w") >= minCount)
    val sTot = sw.groupBy("slice").agg(sum(col("y_sw")).as("n_s"))
    val nTot = sw.agg(coalesce(sum(col("y_sw")), lit(0L))).head().getLong(0)
    require(nTot > 0, "no tokens")
    val joined = sw
      .join(wTot, Seq("w"))
      .join(broadcast(sTot), Seq("slice"))
    val alpha = lit(a0) * col("y_w").cast("double") / lit(nTot.toDouble)
    val ysw = col("y_sw").cast("double")
    val yrw = (col("y_w") - col("y_sw")).cast("double")
    val ns = col("n_s").cast("double")
    val rest = lit(nTot.toDouble) - ns
    val delta = log((ysw + alpha) / (ns + lit(a0) - ysw - alpha)) -
      log((yrw + alpha) / (rest + lit(a0) - yrw - alpha))
    val z = delta / sqrt(lit(1.0) / (ysw + alpha) + lit(1.0) / (yrw + alpha))
    val scored = joined.select(col("slice"), col("w").as("term"),
      col("y_sw"), round(z, outDigits).as("z_score"))
    val win = Window.partitionBy(col("slice"))
      .orderBy(col("z_score").desc, col("term"))
    scored
      .withColumn("__rn", row_number().over(win))
      .filter(col("__rn") <= topK)
      .select(col("slice"), col("term"), col("y_sw"), col("z_score"))
      .orderBy(col("slice"), col("z_score").desc, col("term"))
  }

  /** One-row corpus datasheet ("datasheets for datasets" summary):
    * document/token/vocabulary volumes, language and source breadth,
    * exact-duplicate mass, and mean length — the header numbers every
    * corpus release note needs, from two corpus-linear aggregation
    * passes (one text-token pass, one md5-duplicate pass). All outputs
    * integral (floored milli/ppm). Returns (n_docs, n_null_text,
    * n_langs, n_sources, n_tokens, vocab_size, dup_doc_ppm,
    * mean_chars_milli). */
  def corpusCard(df: DataFrame, idCol: String, textCol: String,
                 langCol: String, sourceCol: String,
                 charsCol: String): DataFrame = {
    val head = df.agg(
      count(lit(1)).as("n_docs"),
      sum(when(col(textCol).isNull, 1L).otherwise(0L)).as("n_null_text"),
      countDistinct(col(langCol)).as("n_langs"),
      countDistinct(col(sourceCol)).as("n_sources"),
      sum(coalesce(col(charsCol), lit(0L))).as("sum_chars"))
    val toks = df.filter(col(textCol).isNotNull)
      .select(explode(Dedup.words(col(textCol))).as("w"))
      .agg(count(lit(1)).as("n_tokens"), countDistinct(col("w")).as("vocab_size"))
    val dups = df.filter(col(textCol).isNotNull)
      .groupBy(md5(col(textCol)).as("__h")).agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(col("c") - lit(1L)), lit(0L)).as("dup_docs"))
    head.crossJoin(toks).crossJoin(dups)
      .select(col("n_docs"), col("n_null_text"), col("n_langs"),
        col("n_sources"), col("n_tokens"), col("vocab_size"),
        expr("dup_docs * 1000000 div n_docs").as("dup_doc_ppm"),
        expr("sum_chars * 1000 div n_docs").as("mean_chars_milli"))
  }

  /** Pairwise vocabulary overlap between slices: |A∩B| and the
    * Jaccard share of type sets for every source pair — "are these
    * two feeds the same content in different wrappers" at the
    * vocabulary level. Distinct (slice, token) reduction, an
    * inverted-index equi-join on the token (per-token fanout bounded
    * by slices², never corpus-quadratic), sizes joined back. Returns
    * (slice_a, slice_b, common, size_a, size_b, jaccard_ppm). */
  def vocabOverlap(df: DataFrame, sliceCol: String,
                   textCol: String): DataFrame = {
    val types = df
      .filter(col(sliceCol).isNotNull && col(textCol).isNotNull)
      .select(col(sliceCol).as("s"),
        explode(Dedup.words(col(textCol))).as("w"))
      .distinct()
      .localCheckpoint(false) // sizes + pair join reuse
    val sizes = types.groupBy("s").agg(count(lit(1)).as("sz"))
    val pairs = types.select(col("s").as("sa"), col("w"))
      .join(types.select(col("s").as("sb"), col("w")), Seq("w"))
      .filter(col("sa") < col("sb"))
      .groupBy("sa", "sb").agg(count(lit(1)).as("common"))
    pairs
      .join(sizes.select(col("s").as("sa"), col("sz").as("size_a")), Seq("sa"))
      .join(sizes.select(col("s").as("sb"), col("sz").as("size_b")), Seq("sb"))
      .select(col("sa").as("slice_a"), col("sb").as("slice_b"),
        col("common"), col("size_a"), col("size_b"),
        expr("common * 1000000 div (size_a + size_b - common)")
          .as("jaccard_ppm"))
      .orderBy("slice_a", "slice_b")
  }

  /** Term-burst detection: (term, week) cells whose observed count
    * most exceeds the independence expectation term_total·week_total/N
    * — Poisson-standardized z = (obs − exp)/√exp, the "what spiked
    * this week" trend surfacing over any timestamped text. Week index
    * is the gap-safe `days-since-min div 7`; counts are exact; each
    * cell's z is one double chain rounded once; the global top-k is a
    * TakeOrdered with (z desc, term, week) tiebreaks. `minCount`
    * prunes rare terms before the cell join. Returns
    * (term, week, n_obs, z_burst). */
  def termBurst(df: DataFrame, tsCol: String, textCol: String,
                minCount: Long = 50, topK: Int = 20,
                outDigits: Int = 6): DataFrame = {
    require(topK >= 1 && minCount >= 1, "bad parameters")
    val base = df.filter(col(tsCol).isNotNull && col(textCol).isNotNull)
    val minDay = base.agg(min(to_date(col(tsCol)))).head().getDate(0)
    val cells = base
      .select(expr(s"datediff(to_date($tsCol), date'$minDay') div 7")
        .as("week"), explode(Dedup.words(col(textCol))).as("term"))
      .groupBy("week", "term").agg(count(lit(1)).as("n_obs"))
      .localCheckpoint(false) // term/week totals + cells reuse
    val termTot = cells.groupBy("term").agg(sum(col("n_obs")).as("t_tot"))
      .filter(col("t_tot") >= minCount)
    val weekTot = cells.groupBy("week").agg(sum(col("n_obs")).as("w_tot"))
    val n = cells.agg(coalesce(sum(col("n_obs")), lit(0L))).head().getLong(0)
    require(n > 0, "no tokens")
    val expC = col("t_tot").cast("double") * col("w_tot").cast("double") /
      lit(n.toDouble)
    cells
      .join(termTot, Seq("term"))
      .join(broadcast(weekTot), Seq("week"))
      .select(col("term"), col("week"), col("n_obs"),
        round((col("n_obs").cast("double") - expC) / sqrt(expC), outDigits)
          .as("z_burst"))
      .orderBy(col("z_burst").desc, col("term"), col("week"))
      .limit(topK)
  }

  /** Hill estimator of the power-law tail index over the top `k` order
    * statistics of `valueCol` — the heavy-tail diagnostic behind "can
    * I cap document length / degree / domain mass at X". alpha =
    * k / Σᵢ ln(x₍ᵢ₎ / x₍ₖ₊₁₎). The only distributed work is a
    * TakeOrdered top-(k+1) (never a global sort); the bounded order
    * statistics finish on the driver. Ties at the boundary cannot
    * change the value multiset. Returns (k, x_tail, hill_alpha). */
  def hillTail(df: DataFrame, valueCol: String, k: Int = 100,
               outDigits: Int = 6): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val top = df.select(col(valueCol).cast("long").as("x"))
      .filter(col("x").isNotNull && col("x") > 0)
      .orderBy(col("x").desc)
      .limit(k + 1)
      .collect().map(_.getLong(0))
    require(top.length == k + 1, s"need at least ${k + 1} positive values")
    val xTail = top.last
    val sumLn = top.take(k).map(x => math.log(x.toDouble / xTail)).sum
    // all top k+1 order statistics equal (capped/constant column) ->
    // k/sumLn is +Inf; fail with a diagnostic instead of
    // NumberFormatException from BigDecimal(Infinity)
    require(sumLn > 0,
      s"hillTail: degenerate tail — top ${k + 1} values are all $xTail")
    val alpha = BigDecimal(k.toDouble / sumLn)
      .setScale(outDigits, BigDecimal.RoundingMode.HALF_UP).toDouble
    Seq((k.toLong, xTail, alpha)).toDF("k", "x_tail", "hill_alpha")
  }

  /** Per-slice HAPAX/DIS LEGOMENA profile: vocabulary size, words
    * occurring exactly once / twice within the slice, token count,
    * and the integral ratios — type-token ratio and hapax share in
    * ppm (floor division, engine-exact). The hapax share is the
    * classic OCR-noise / synthetic-text / vocabulary-saturation
    * signal: natural corpora run ~40–60% hapax, noisy ones spike,
    * templated ones collapse. One explode + two grouped aggregations,
    * corpus-linear. Returns (slice, n_tokens, vocab, hapax, dis,
    * ttr_ppm, hapax_share_ppm). */
  def hapaxStats(df: DataFrame, sliceCol: String,
                 textCol: String): DataFrame = {
    val words = df.filter(col(textCol).isNotNull && col(sliceCol).isNotNull)
      .select(col(sliceCol).as("slice"),
        explode(Dedup.words(col(textCol))).as("w"))
    words.groupBy(col("slice"), col("w"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("slice"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("hapax"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("dis"))
      .select(col("slice"), col("n_tokens"), col("vocab"), col("hapax"),
        col("dis"),
        expr("vocab * 1000000 div n_tokens").as("ttr_ppm"),
        expr("hapax * 1000000 div vocab").as("hapax_share_ppm"))
      .orderBy("slice")
  }

  /** Good–Turing frequency re-estimation over the corpus unigram
    * distribution (Good 1953; the smoothing inside Katz backoff and the
    * classic estimate of UNSEEN-type mass): from the
    * frequency-of-frequencies table N_r = |{w : count(w) = r}|, the
    * adjusted count is r* = (r+1)·N_{r+1}/N_r, and N_1/N estimates the
    * probability mass of never-seen types — the quantity that tells a
    * corpus curator how much vocabulary the next crawl batch will add.
    *
    * Shape: token explode → word-count aggregation → ONE tiny grouped
    * rollup on r (the count-of-counts table is ~O(max count) rows,
    * never corpus-sized) → a self-join of N_{r+1} onto N_r on the
    * r-key. Integral outputs (`r_star_ppm` = (r+1)·N_{r+1}·1e6 div
    * N_r, 0 where the next bucket is empty; `p0_ppm` = N_1·1e6 div N
    * on every row) keep it engine-exact. `maxR` bounds the emitted
    * table (smoothing only matters for small r; the tail is reported
    * unsmoothed by any consumer).
    *
    * @param tokens array-of-string Column producing the count unit —
    *        [[Dedup.words]] for unigrams, [[Dedup.shingles]] for the
    *        n-gram distributions whose singleton tail actually drives
    *        the estimate on template-heavy corpora. */
  def goodTuring(df: DataFrame, tokens: Column, maxR: Long = 10L): DataFrame =
    goodTuringTokens(df.select(explode(tokens).as("w")), "w", maxR)

  /** [[goodTuring]] over an already-tokenized stream (one row per
    * token OCCURRENCE) — the fast path: feed it
    * [[Dedup.shingleStream]] instead of exploding the interpreted
    * shingles HOF (bench-measured ~15× on the trigram board query). */
  def goodTuringTokens(tokenDf: DataFrame, tokenCol: String,
                       maxR: Long = 10L): DataFrame = {
    require(maxR >= 1, "maxR must be >= 1")
    val counts = tokenDf.select(col(tokenCol).as("w"))
      .filter(col("w").isNotNull)
      .groupBy("w").agg(count(lit(1)).as("r"))
    val freqOfFreq = counts.groupBy("r").agg(count(lit(1)).as("n_r"))
      .localCheckpoint(false) // self-join + the two scalar aggs below
    val totals = freqOfFreq.agg(
        sum(col("r") * col("n_r")).as("n_tokens"),
        sum(when(col("r") === 1, col("n_r")).otherwise(0L)).as("n1"))
      .head()
    val nTokens = totals.getLong(0)
    val n1 = totals.getLong(1)
    val next = freqOfFreq.select((col("r") - 1).as("r"), col("n_r").as("n_next"))
    freqOfFreq.filter(col("r") <= maxR)
      .join(next, Seq("r"), "left")
      .select(col("r"), col("n_r"),
        coalesce(col("n_next"), lit(0L)).as("n_next"),
        expr("(r + 1) * coalesce(n_next, 0) * 1000000 div n_r")
          .as("r_star_ppm"),
        lit(if (nTokens > 0) n1 * 1000000L / nTokens else 0L).as("p0_ppm"))
      .orderBy("r")
  }
}
