package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._
import MlQueries.tbl

/** Declared queries for the training-data pipeline operators
  * (SURVEY.md §2 "Training-data pipeline operators").
  *
  * The synthetic corpus has no natural duplicates, so dedup queries PLANT
  * deterministic (near-)duplicates by unioning the table with a perturbed
  * copy (ids offset by 100000) — the operator must find exactly the
  * planted pairs and reject the random ones, and the DuckDB oracle
  * replicates the same construction.
  */
object OpsQueries {

  /** documents ∪ exact copies (ids + 100000). */
  private def docsWithDups(spark: SparkSession, dir: String): DataFrame = {
    val d = tbl(spark, dir, "documents")
    d.select(col("doc_id"), col("text"))
      .unionAll(d.select(col("doc_id") + 100000, col("text")))
  }

  /** documents ∪ near-dup copies (last 5 words dropped, ids + 100000).
    * `maxDocs` bounds quadratic-demo queries; Long.MaxValue = all. */
  private[graft] def docsWithNearDups(spark: SparkSession, dir: String,
                               maxDocs: Long = Long.MaxValue): DataFrame = {
    val d = tbl(spark, dir, "documents").filter(col("doc_id") < maxDocs)
    val w = Dedup.words(col("text"))
    d.select(col("doc_id"), col("text"))
      .unionAll(d.select(col("doc_id") + 100000,
        concat_ws(" ", slice(w, lit(1), size(w) - 5)).as("text")))
  }

  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Dedup.exact(docsWithDups(spark, dir), "doc_id", Seq("text"))
      .select(col("content_key"), col("keep_id"), col("cluster_size"))
      .orderBy("keep_id")

  def dedupMinhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashLsh(docsWithNearDups(spark, dir), "doc_id", "text",
        bands = 4, rowsPerBand = 3, threshold = 0.6)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("id_a", "id_b")

  def dedupSimhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(docsWithNearDups(spark, dir), "doc_id", "text",
        maxHamming = 6)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .orderBy("id_a", "id_b")

  /** Exact all-pairs n-gram Jaccard on a bounded slice (doc_id < 1000):
    * the exact operator is inherently quadratic — the LSH query above is
    * the full-corpus scale path. */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(docsWithNearDups(spark, dir, 1000), "doc_id", "text",
        threshold = 0.6)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("id_a", "id_b")

  /** Prefix-filtered EXACT Jaccard join on the same bounded slice as
    * [[ngramJaccard]]: candidates from rarest-first gram prefixes only,
    * then exact verify — the output must equal the brute-force
    * all-pairs query (which IS the oracle). */
  def prefixJaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.prefixJaccardPairs(docsWithNearDups(spark, dir, 1000), "doc_id",
        "text", threshold = 0.6)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("id_a", "id_b")

  /** embeddings ∪ rescaled copies (cosine-identical, ids + 100000). */
  def dedupCosine(spark: SparkSession, dir: String): DataFrame = {
    val e = tbl(spark, dir, "embeddings")
    val dup = e.select((col("vec_id") + 100000).as("vec_id"),
      transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    val all = e.select(col("vec_id"), col("embedding")).unionAll(dup)
    Dedup.cosineNearDups(all, "vec_id", "embedding", threshold = 0.95)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
      .orderBy("id_a", "id_b")
  }

  def annTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = tbl(spark, dir, "embeddings")
    Ann.bruteForceTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 4).as("cos"))
      .orderBy("query_id", "rank")
  }

  /** ColBERT-style late-interaction MaxSim top-k: embeddings grouped
    * into 5-vector "documents" (vec_id div 5), the first two documents'
    * vector bags as the queries. */
  def maxSimQ(spark: SparkSession, dir: String): DataFrame = {
    val e = tbl(spark, dir, "embeddings")
    val docs = e.select(expr("vec_id div 5").as("doc_id"), col("embedding"))
    val qs = e.filter(col("vec_id") < 10)
      .select(expr("vec_id div 5").as("query_id"), col("embedding"))
    Ann.maxSimTopK(docs, qs, "doc_id", "query_id", "embedding", k = 5)
      .select(col("query_id"), col("rank"), col("doc_id"),
        round(col("maxsim"), 4).as("maxsim"))
      .orderBy("query_id", "rank")
  }

  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val e = tbl(spark, dir, "embeddings")
    Ann.lshTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, tables = 8, bits = 6)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 4).as("cos"))
      .orderBy("query_id", "rank")
  }

  /** IVF top-k with FIXED coarse centroids (the first 16 corpus vectors
    * — the q_semdedup technique): assignment, probing and scoring become
    * pure argmin/cosine arithmetic, so the DuckDB oracle replicates the
    * whole chain. The production sampled-k-means path ([[Ann.ivfTopK]])
    * keeps its recall/pruning spec in `OpsSpec`. */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val e = tbl(spark, dir, "embeddings")
    val centers = e.filter(col("vec_id") < 16).orderBy("vec_id")
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    Ann.ivfTopKFixed(e, e.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, centers, nprobe = 4)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 4).as("cos"))
      .orderBy("query_id", "rank")
  }

  /** PQ/ADC quantized top-k with FIXED codebooks (subvectors of the
    * first 16 corpus vectors): encode + asymmetric-distance scoring are
    * exact arithmetic over the codebook table — oracle-exact. The
    * sampled-k-means training path ([[Ann.pqTopK]]) keeps its
    * recall/determinism spec. */
  def annPq(spark: SparkSession, dir: String): DataFrame = {
    val e = tbl(spark, dir, "embeddings")
    val cvecs = e.filter(col("vec_id") < 16).orderBy("vec_id")
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    val m = 8
    val sub = cvecs(0).length / m
    val codebooks = Array.tabulate(m) { mi =>
      cvecs.map(v => java.util.Arrays.copyOfRange(v, mi * sub, (mi + 1) * sub))
    }
    Ann.pqTopKFixed(e, e.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, codebooks)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("adist"), 4).as("adist"))
      .orderBy("query_id", "rank")
  }

  /** COMPOSED IVFPQ (residual product quantization inside coarse
    * cells — the FAISS `IVFx,PQy` billion-vector layout) with FIXED
    * parameters: coarse centroids = first 4 corpus vectors, residual
    * codebooks = subvectors of the first 16 (the q_ann_ivf/q_ann_pq
    * technique) — assignment, residual encoding, probing and ADC are
    * exact arithmetic the DuckDB oracle replicates end-to-end. The
    * trained path ([[Ann.ivfpqTopK]], residual-trained codebooks) keeps
    * its recall spec in `OpsSpec`. */
  def annIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val e = tbl(spark, dir, "embeddings")
    val centers = e.filter(col("vec_id") < 4).orderBy("vec_id")
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    val cvecs = e.filter(col("vec_id") < 16).orderBy("vec_id")
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    val m = 8
    val sub = cvecs(0).length / m
    val codebooks = Array.tabulate(m) { mi =>
      cvecs.map(v => java.util.Arrays.copyOfRange(v, mi * sub, (mi + 1) * sub))
    }
    Ann.ivfpqTopKFixed(e, e.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, centers, codebooks, nprobe = 2)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("adist"), 4).as("adist"))
      .orderBy("query_id", "rank")
  }

  /** [[annIvf]]'s exact chain scored through the DISTRIBUTED join
    * probe ([[Ann.ivfTopKJoin]] — centroids broadcast, nprobe cells
    * computed executor-side, NO query-side collect): result-identical
    * to the driver path by construction, so it shares `q_ann_ivf`'s
    * oracle — putting the batch-scale query path itself on the
    * correctness board. */
  def annIvfDist(spark: SparkSession, dir: String): DataFrame = {
    val e = tbl(spark, dir, "embeddings")
    val centers = e.filter(col("vec_id") < 16).orderBy("vec_id")
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    Ann.ivfTopKJoin(e, e.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, centers, nprobe = 4)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 4).as("cos"))
      .orderBy("query_id", "rank")
  }

  /** [[annIvfPq]]'s composed residual chain through the DISTRIBUTED
    * join probe ([[Ann.ivfpqTopKJoin]] — executor-side residual ADC
    * tables, equi-join scoring, no collect): shares `q_ann_ivfpq`'s
    * oracle, bit-identical summation order. */
  def annIvfPqDist(spark: SparkSession, dir: String): DataFrame = {
    val e = tbl(spark, dir, "embeddings")
    val centers = e.filter(col("vec_id") < 4).orderBy("vec_id")
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    val cvecs = e.filter(col("vec_id") < 16).orderBy("vec_id")
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    val m = 8
    val sub = cvecs(0).length / m
    val codebooks = Array.tabulate(m) { mi =>
      cvecs.map(v => java.util.Arrays.copyOfRange(v, mi * sub, (mi + 1) * sub))
    }
    Ann.ivfpqTopKJoin(e, e.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, centers, codebooks, nprobe = 2)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("adist"), 4).as("adist"))
      .orderBy("query_id", "rank")
  }

  /** TWO-STAGE retrieval: the fixed-codebook PQ/ADC index recalls a
    * generous 20-candidate shortlist per query by APPROXIMATE distance,
    * then [[Ann.rerank]] re-scores only those candidates with the exact
    * cosine and cuts to the true top-5 — the standard recall-then-rerank
    * pipeline. Reuses [[annPq]]'s fixed codebooks so the whole chain
    * stays oracle-exact. */
  def annRerank(spark: SparkSession, dir: String): DataFrame = {
    val e = tbl(spark, dir, "embeddings")
    val cvecs = e.filter(col("vec_id") < 16).orderBy("vec_id")
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    val m = 8
    val sub = cvecs(0).length / m
    val codebooks = Array.tabulate(m) { mi =>
      cvecs.map(v => java.util.Arrays.copyOfRange(v, mi * sub, (mi + 1) * sub))
    }
    val shortlist = Ann.pqTopKFixed(e, e.filter(col("vec_id") < 10), "vec_id",
      "embedding", k = 20, codebooks)
    Ann.rerank(shortlist, e, e.filter(col("vec_id") < 10), "vec_id",
        "embedding", "query_id", "neighbor_id", k = 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 4).as("cos"))
      .orderBy("query_id", "rank")
  }

  /** Paragraph-level global dedup over documents ∪ exact copies: the
    * corpus is single-line, so texts are re-chunked into 8-word
    * "paragraphs" first — common phrase runs then collide across
    * documents and every full-copy document loses ALL its paragraphs
    * (text comes back NULL, n_kept = 0). */
  def paraDedup(spark: SparkSession, dir: String): DataFrame = {
    val d = docsWithDups(spark, dir)
    val w = Dedup.words(col("text"))
    val nChunks = greatest(ceil(size(w) / lit(8.0)).cast("int"), lit(1))
    val paraText = array_join(transform(sequence(lit(0), nChunks - 1),
      i => array_join(slice(w, i * 8 + 1, lit(8)), " ")), "\n")
    Dedup.paragraphDedup(d.select(col("doc_id"), paraText.as("text")),
        "doc_id", "text")
      .orderBy("doc_id")
  }

  /** Exact-k deterministic per-group sample: 10 documents per language,
    * chosen by Knuth-hash order — engine-portable, so the oracle picks
    * the identical rows. */
  def groupSampleQ(spark: SparkSession, dir: String): DataFrame =
    Sampling.groupSample(tbl(spark, dir, "documents"), col("doc_id"),
        col("lang"), k = 10)
      .select(col("lang"), col("sample_rank"), col("doc_id"))
      .orderBy("lang", "sample_rank")

  /** Temperature-scaled (τ=2) token budget split across languages with
    * largest-remainder integer apportionment — allocations sum to
    * exactly 1,000,000. */
  def tempBudgets(spark: SparkSession, dir: String): DataFrame =
    Sampling.temperatureBudgets(tbl(spark, dir, "documents"), col("lang"),
        col("n_chars"), budget = 1000000L)
      .orderBy("domain")

  /** The full mixture pipeline: temperature-scaled per-language token
    * budgets ([[tempBudgets]]' construction) turned into actual
    * document picks — within each language, the longest-first greedy
    * prefix whose cumulative n_chars fits that language's allocation. */
  def groupBudgetSelect(spark: SparkSession, dir: String): DataFrame = {
    val d = tbl(spark, dir, "documents")
    val budgets = Sampling.temperatureBudgets(d, col("lang"), col("n_chars"),
      budget = 100000L)
    Curation.selectByGroupBudget(d.select("doc_id", "lang", "n_chars"),
        col("lang"), Seq(col("n_chars").desc, col("doc_id").asc),
        col("n_chars"), budgets, "domain", "tokens_alloc")
      .select("doc_id", "lang", "n_chars")
      .orderBy("doc_id")
  }

  /** Per-language calibrated percentile of document length — the
    * "top-k% within each domain" score normalization. */
  def calibratedRank(spark: SparkSession, dir: String): DataFrame =
    Ranking.groupPercentRank(
        tbl(spark, dir, "documents").select("doc_id", "lang", "n_chars"),
        col("lang"), Seq(col("n_chars"), col("doc_id")))
      .select(col("doc_id"), col("lang"), col("n_chars"),
        round(col("pct_rank"), 6).as("pct_rank"))
      .orderBy("doc_id")

  /** Containment (excerpt) detection on planted short quotes: each
    * clone embeds a 15-word excerpt of its source inside unique filler
    * — Jaccard stays far below any useful threshold (the union term
    * swamps the quote) but smaller-side containment clears 0.5.
    * Bounded slice like [[ngramJaccard]]: exact pair ops are the
    * quadratic anchors; LSH is the corpus path. */
  def containmentQ(spark: SparkSession, dir: String): DataFrame = {
    val d = tbl(spark, dir, "documents").filter(col("doc_id") < 1000)
      .select(col("doc_id"), col("text"))
    val w = Dedup.words(col("text"))
    val planted = d.select((col("doc_id") + 100000).as("doc_id"),
      concat_ws(" ",
        concat(lit("qa"), col("doc_id")), concat(lit("qb"), col("doc_id")),
        array_join(slice(w, 11, 15), " "),
        concat(lit("qc"), col("doc_id"))).as("text"))
    Dedup.containmentPairs(d.unionAll(planted), "doc_id", "text",
        threshold = 0.5)
      .select(col("id_small"), col("id_big"),
        round(col("containment"), 4).as("containment"))
      .orderBy("id_small", "id_big")
  }

  /** Exact substring-dedup REMOVAL over the same planted overlap as
    * [[dupSpans]]: each clone (larger id) loses the 40-token window it
    * shares with its source; sentinel tokens survive. */
  def spanRemoval(spark: SparkSession, dir: String): DataFrame = {
    val d = tbl(spark, dir, "documents").filter(col("doc_id") < 200)
      .select(col("doc_id"), col("text"))
    val w = Dedup.words(col("text"))
    val planted = d.select((col("doc_id") + 100000).as("doc_id"),
      concat_ws(" ",
        concat(lit("uniq"), col("doc_id")),
        array_join(slice(w, 11, 40), " "),
        concat(lit("tail"), col("doc_id"))).as("text"))
    Dedup.removeDuplicateSpans(d.unionAll(planted), "doc_id", "text",
        minTokens = 10, gramWidth = 5)
      .orderBy("doc_id")
  }

  /** URL-keyed crawl dedup: injected URL variants (case, www., default
    * port, tracking params, fragment, param order) collapse to one
    * canonical key per page; a genuinely different query string stays
    * distinct. */
  def urlDedupQ(spark: SparkSession, dir: String): DataFrame = {
    val d = tbl(spark, dir, "documents").filter(col("doc_id") < 300)
    val k = (col("doc_id") % 20).cast("string")
    val j = (col("doc_id") % 50).cast("string")
    val base = concat(lit("site"), k, lit(".example.org/p"), j)
    val url = when(col("doc_id") % 6 === 0, concat(lit("https://"), base))
      .when(col("doc_id") % 6 === 1,
        concat(lit("HTTPS://SITE"), k, lit(".EXAMPLE.ORG/p"), j))
      .when(col("doc_id") % 6 === 2,
        concat(lit("https://www.site"), k, lit(".example.org:443/p"), j, lit("/")))
      .when(col("doc_id") % 6 === 3,
        concat(lit("https://"), base, lit("?utm_source=x&utm_campaign=y")))
      .when(col("doc_id") % 6 === 4, concat(lit("https://"), base, lit("#frag")))
      .otherwise(concat(lit("https://"), base, lit("?b=2&a=1")))
    TextAnalysis.urlDedup(d.select(col("doc_id"), url.as("url")),
        "doc_id", "url")
      .orderBy("canon_url")
  }

  /** Leakage-safe 80/10/10 split over the planted near-dup graph:
    * near-dup clusters land in one split atomically. */
  def splitLeakage(spark: SparkSession, dir: String): DataFrame = {
    val d = docsWithNearDups(spark, dir)
    val pairs = Dedup.minhashLsh(d, "doc_id", "text",
      bands = 4, rowsPerBand = 3, threshold = 0.6)
    Sampling.leakageSafeSplit(d.select(col("doc_id")), "doc_id", pairs,
        "id_a", "id_b", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .orderBy("doc_id")
  }

  /** Deterministic epoch-3 training order over documents. */
  def epochShuffleQ(spark: SparkSession, dir: String): DataFrame =
    Sampling.epochShuffle(tbl(spark, dir, "documents").select("doc_id"),
        col("doc_id"), epoch = 3)
      .select(col("epoch_pos"), col("doc_id"))
      .orderBy("epoch_pos")

  /** PSI drift between even- and odd-user event values over fixed
    * 50-wide bins. */
  def psiQ(spark: SparkSession, dir: String): DataFrame = {
    val ev = tbl(spark, dir, "events")
    Drift.psiBins(ev.filter(col("user_id") % 2 === 0),
        ev.filter(col("user_id") % 2 === 1), "value",
        (1 to 9).map(_ * 50.0))
      .select(col("bin"), col("n_a"), col("n_b"),
        round(col("psi_term"), 6).as("psi_term"))
      .orderBy("bin")
  }

  /** JL random projection of embeddings to 8 dims (portable md5 planes:
    * the oracle recomputes identical projections). */
  def embedProject(spark: SparkSession, dir: String): DataFrame =
    Embeddings.randomProject(
        tbl(spark, dir, "embeddings").filter(col("vec_id") < 100),
        "vec_id", "embedding", outDim = 8)
      .select(col("vec_id"), posexplode(col("projection")).as(Seq("i", "value")))
      .select(col("vec_id"), col("i"), round(col("value"), 6).as("value"))
      .orderBy("vec_id", "i")

  def langId(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "documents")
      .select(TextAnalysis.langId(spark, col("text")).as("lang_pred"))
      .groupBy("lang_pred").agg(count(lit(1)).as("n"))
      .orderBy("lang_pred")

  /** Documents re-lined into 7-word lines with deterministic
    * degeneracies injected by doc_id residue — bullets (%7), trailing
    * ellipsis (%11), hash spam (%13) — so every Gopher rule fires on a
    * known subset; the whole per-rule violation census verifies in
    * DuckDB with the same list arithmetic. */
  def gopherRulesQ(spark: SparkSession, dir: String): DataFrame = {
    val d = tbl(spark, dir, "documents")
      .withColumn("t2", regexp_replace(col("text"),
        "((\\S+ ){6}\\S+) ", "$1\n"))
      .withColumn("t2",
        when(pmod(col("doc_id"), lit(7)) === 0,
          concat(lit("- one\n* two\n- three\n"), col("t2")))
          .otherwise(col("t2")))
      .withColumn("t2",
        when(pmod(col("doc_id"), lit(11)) === 0,
          concat(col("t2"), lit("\nto be continued...")))
          .otherwise(col("t2")))
      .withColumn("t2",
        when(pmod(col("doc_id"), lit(13)) === 0,
          concat(col("t2"), lit(" ### ### ### ### ### ### ### ###")))
          .otherwise(col("t2")))
    TextAnalysis.gopherRules(d, "t2", minWords = 20)
      .agg(count(lit(1)).as("n_docs"),
        sum(when(!col("g_word_count"), 1).otherwise(0)).as("f_word_count"),
        sum(when(!col("g_word_len"), 1).otherwise(0)).as("f_word_len"),
        sum(when(!col("g_symbols"), 1).otherwise(0)).as("f_symbols"),
        sum(when(!col("g_bullets"), 1).otherwise(0)).as("f_bullets"),
        sum(when(!col("g_ellipsis"), 1).otherwise(0)).as("f_ellipsis"),
        sum(when(!col("g_alpha"), 1).otherwise(0)).as("f_alpha"),
        sum(when(!col("g_stops"), 1).otherwise(0)).as("f_stops"),
        sum(when(col("gopher_keep"), 1).otherwise(0)).as("n_keep"),
        round(sum(col("mean_word_len")), 4).as("sum_mwl"))
  }

  /** Documents re-lined into period-terminated 7-word lines with C4
    * degeneracies injected by doc_id residue — a curly brace (%7), a
    * "lorem ipsum" line (%11), a javascript line (%13), and a 2-word
    * line everywhere (dropped by the min-words-per-line rule) — the
    * census of kept lines/sentences and page drops is DuckDB-exact. */
  def c4FiltersQ(spark: SparkSession, dir: String): DataFrame = {
    val d = tbl(spark, dir, "documents")
      .withColumn("t2", concat(regexp_replace(col("text"),
        "((\\S+ ){6}\\S+) ", "$1.\n"), lit(".")))
      .withColumn("t2", concat(col("t2"), lit("\ntoo short.")))
      .withColumn("t2",
        when(pmod(col("doc_id"), lit(7)) === 0,
          concat(col("t2"), lit("\nbraces are code { nope.")))
          .otherwise(col("t2")))
      .withColumn("t2",
        when(pmod(col("doc_id"), lit(11)) === 0,
          concat(col("t2"), lit("\nthis page is Lorem Ipsum filler text.")))
          .otherwise(col("t2")))
      .withColumn("t2",
        when(pmod(col("doc_id"), lit(13)) === 0,
          concat(col("t2"), lit("\nenable JavaScript to view this page.")))
          .otherwise(col("t2")))
    TextAnalysis.c4Filters(d, "t2")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("c4_keep"), 1).otherwise(0)).as("n_keep"),
        sum(col("n_kept_lines")).as("kept_lines"),
        sum(col("n_sentences")).as("sentences"),
        sum(when(col("c4_lorem"), 1).otherwise(0)).as("n_lorem"),
        sum(when(col("c4_brace"), 1).otherwise(0)).as("n_brace"))
  }

  /** Gopher repetition battery census over re-lined docs with injected
    * duplicate lines (%7) and a bigram-spam line (%11): the
    * SQL-expressible rules (dup line fraction, dup line CHAR fraction,
    * top 2/3/4-gram char fractions with the count≥2 convention and
    * longest-tie-break) recompute exactly in DuckDB; the dup-5..10-gram
    * span-union rules are hand-computed in QualityOpsSpec. */
  def gopherRepetitionQ(spark: SparkSession, dir: String): DataFrame = {
    val d = tbl(spark, dir, "documents")
      .withColumn("t2", regexp_replace(col("text"),
        "((\\S+ ){6}\\S+) ", "$1\n"))
      .withColumn("t2",
        when(pmod(col("doc_id"), lit(7)) === 0,
          concat(lit("copy this line now\ncopy this line now\n" +
            "copy this line now\n"), col("t2")))
          .otherwise(col("t2")))
      .withColumn("t2",
        when(pmod(col("doc_id"), lit(11)) === 0,
          concat(col("t2"), lit("\n" + ("the cat " * 14) + "the cat")))
          .otherwise(col("t2")))
    TextAnalysis.gopherRepetitionRules(d, "doc_id", "t2")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("dup_line_frac") > 0.3, 1).otherwise(0))
          .as("f_dup_line"),
        sum(when(col("dup_line_char_frac") > 0.2, 1).otherwise(0))
          .as("f_dup_line_char"),
        sum(when(col("top_2gram_frac") > 0.2, 1).otherwise(0)).as("f_top2"),
        sum(when(col("top_3gram_frac") > 0.18, 1).otherwise(0)).as("f_top3"),
        sum(when(col("top_4gram_frac") > 0.16, 1).otherwise(0)).as("f_top4"),
        round(sum(col("dup_line_frac")), 4).as("sum_dlf"),
        round(sum(col("top_2gram_frac")), 4).as("sum_top2"))
  }

  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityScore(
        tbl(spark, dir, "documents").filter(col("doc_id") < 100), "text")
      .select(col("doc_id"), col("n_chars"), col("n_words"),
        round(col("punct_ratio"), 6).as("punct_ratio"),
        round(col("uniq_word_ratio"), 6).as("uniq_word_ratio"),
        col("quality"))
      .orderBy("doc_id")

  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "documents").filter(col("doc_id") < 100)
      .select(col("doc_id"),
        TextAnalysis.wsTokenCount(col("text")).as("ws_tokens"),
        TextAnalysis.regexTokenCount(col("text")).as("re_tokens"))
      .orderBy("doc_id")

  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.fingerprint(
        tbl(spark, dir, "documents").filter(col("doc_id") < 100),
        "doc_id", "text", k = 8)
      .orderBy("doc_id")

  def winnow(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.winnowing(
        tbl(spark, dir, "documents").filter(col("doc_id") < 20),
        "doc_id", "text", k = 8, w = 4)
      // (no cache needed: the kernel output is a bound attribute, so
      // explode does not re-evaluate the winnowing work per output row)
      .select(col("doc_id"), explode(col("fingerprints")).as("fp"))
      .orderBy("doc_id", "fp")

  /** End-to-end pipeline composition — the shape of a real training-data
    * job: exact-dedup the (duplicated) corpus, keep quality >= 0.8 docs,
    * report per-predicted-language doc counts and token totals. Every
    * stage is engine-portable, so the whole chain has an exact oracle. */
  def pipelineE2e(spark: SparkSession, dir: String): DataFrame = {
    val docs = docsWithDups(spark, dir)
    val keep = Dedup.exact(docs, "doc_id", Seq("text"))
      .select(col("keep_id").as("doc_id"))
    val deduped = docs.join(keep, "doc_id")
    val scored = TextAnalysis.qualityScore(deduped, "text")
      .filter(col("quality") >= 0.8)
    scored
      .withColumn("lang_pred", TextAnalysis.langId(spark, col("text")))
      .withColumn("toks", TextAnalysis.wsTokenCount(col("text")))
      .groupBy("lang_pred")
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).cast("long").as("total_tokens"))
      .orderBy("lang_pred")
  }

  /** Benchmark-contamination: shingle overlap of docs < 200 against the
    * "benchmark" (docs < 5 stand in). Planted property: benchmark docs
    * score exactly 1.0. */
  def contamination(spark: SparkSession, dir: String): DataFrame = {
    val all = tbl(spark, dir, "documents")
    TextAnalysis.contamination(
        all.filter(col("doc_id") < 200), "doc_id", "text",
        all.filter(col("doc_id") < 5), "text")
      .withColumn("contamination", round(col("contamination"), 6))
      .orderBy("doc_id")
  }

  /** Gopher-style repetition metrics + top-word concentration. */
  def repetition(spark: SparkSession, dir: String): DataFrame = {
    val d = tbl(spark, dir, "documents").filter(col("doc_id") < 100)
    TextAnalysis.repetitionMetrics(d, "text")
      .withColumn("top_word_conc",
        round(TextAnalysis.topWordConcentration(col("text")), 6))
      .select(col("doc_id"), col("n_lines"), col("n_distinct_lines"),
        round(col("dup_line_ratio"), 6).as("dup_line_ratio"), col("top_word_conc"))
      .orderBy("doc_id")
  }

  /** PII scrubbing + normalization over documents with deterministically
    * injected emails/phones/IPs: every row must come out masked, hashes
    * compared exactly against the oracle's identical chain. */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val d = tbl(spark, dir, "documents").filter(col("doc_id") < 200)
    val injected = d.withColumn("text", concat(
      substring(col("text"), 1, 40), lit(" contact bob"),
      col("doc_id").cast("string"), lit("@example.com or call +1 (555) 010-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
      lit(" ip 10.0."), (col("doc_id") % 256).cast("string"), lit(".7 "),
      expr("substring(text, 41)")))
    val cleaned = injected.withColumn("text",
      TextAnalysis.normalize(TextAnalysis.scrubPii(col("text"))))
    cleaned.select(col("doc_id"), md5(col("text")).as("scrubbed_hash"),
      col("text").contains("<email>").as("has_email_mask"),
      col("text").contains("<number>").as("has_number_mask"),
      col("text").contains("<ip>").as("has_ip_mask"))
      .orderBy("doc_id")
  }

  /** Near-dup clustering: minhash-LSH pairs → connected components →
    * (doc_id, cluster_id = min id in the component). The step that turns
    * pairwise near-dup evidence into dedup keep/drop groups. */
  def dedupCluster(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.minhashLsh(docsWithNearDups(spark, dir), "doc_id", "text",
      bands = 4, rowsPerBand = 3, threshold = 0.6)
    Dedup.connectedComponents(pairs, "id_a", "id_b")
      .select(col("id").as("doc_id"), col("cluster_id"))
      .orderBy("doc_id")
  }

  /** Near-dup clustering via LARGE-STAR/SMALL-STAR contraction — same
    * pair graph and min-id labels as [[dedupCluster]], produced by the
    * O(log n)-round star algorithm ([[Dedup.connectedComponentsStar]])
    * instead of label propagation; the same reachability oracle
    * verifies both. */
  def dedupClusterStar(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.minhashLsh(docsWithNearDups(spark, dir), "doc_id", "text",
      bands = 4, rowsPerBand = 3, threshold = 0.6)
    Dedup.connectedComponentsStar(pairs, "id_a", "id_b")
      .select(col("id").as("doc_id"), col("cluster_id"))
      .orderBy("doc_id")
  }

  /** Incremental dedup: the ORIGINAL documents are indexed
    * (signature-sized minhash index, no text retained); the shortened
    * near-dup copies arrive as the "new batch" and probe the index.
    * Every step — signatures, band buckets, the estimate — is md5
    * arithmetic, so the whole index-probe chain has an exact oracle. */
  def dedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = tbl(spark, dir, "documents")
    val index = Dedup.minhashIndex(docs, "doc_id", "text",
      bands = 4, rowsPerBand = 3)
    val w = Dedup.words(col("text"))
    val newBatch = docs.select((col("doc_id") + 100000).as("doc_id"),
      concat_ws(" ", slice(w, lit(1), size(w) - 5)).as("text"))
    Dedup.minhashLshIncremental(index, newBatch, "doc_id", "text",
        bands = 4, rowsPerBand = 3, minEstJaccard = 0.5)
      .select(col("new_id"), col("index_id"),
        round(col("est_jaccard"), 4).as("est_jaccard"))
      .orderBy("new_id", "index_id")
  }

  /** Dedup DECISION table over the near-dup clusters: one keeper per
    * cluster by (score desc, id asc) — the keep/drop list a pipeline
    * actually executes on. Score = text length (engine-portable), so
    * the whole chain — pairs, clustering, election — has an exact
    * oracle. */
  def keeperTableQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = docsWithNearDups(spark, dir)
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text",
      bands = 4, rowsPerBand = 3, threshold = 0.6)
    val scores = docs.select(col("doc_id"), length(col("text")).as("score"))
    Dedup.keeperTable(pairs, "id_a", "id_b", scores, "doc_id", "score")
      .select(col("id").as("doc_id"), col("cluster_id"), col("keeper_id"),
        col("keep"))
      .orderBy("doc_id")
  }

  /** BPE token counts under the corpus-trained merges (bounded doc
    * slice) — the APPLY half of the tokenizer, priced per document. */
  /** BPE token SEQUENCES (exploded id/pos/token rows) under the same
    * 20 trained merges as q_bpe_tokens — what an export/packing stage
    * actually consumes. */
  def bpeEncodeQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = tbl(spark, dir, "documents")
    val merges = Tokenizer.trainBpe(docs, "text", numMerges = 20)
      .orderBy("rank").select("left", "right")
      .collect().map(r => (r.getString(0), r.getString(1)))
    Tokenizer.bpeEncode(spark, docs.filter(col("doc_id") < 30),
        "doc_id", "text", merges)
      .orderBy("doc_id", "pos")
  }

  def bpeTokens(spark: SparkSession, dir: String): DataFrame = {
    val docs = tbl(spark, dir, "documents")
    val merges = Tokenizer.trainBpe(docs, "text", numMerges = 20)
      .orderBy("rank").select("left", "right")
      .collect().map(r => (r.getString(0), r.getString(1)))
    Tokenizer.bpeTokenCount(spark, docs.filter(col("doc_id") < 100),
        "doc_id", "text", merges)
      .orderBy("doc_id")
  }

  /** Line-level boilerplate removal over documents with deterministically
    * injected header/footer lines: every doc must come out stripped of
    * exactly the injected lines (its natural lines are unique), verified
    * by content hash. */
  def boilerplate(spark: SparkSession, dir: String): DataFrame = {
    val d = tbl(spark, dir, "documents").filter(col("doc_id") < 300)
      .withColumn("text", concat(lit("SUBSCRIBE TO OUR NEWSLETTER\n"),
        col("text"), lit("\nCOPYRIGHT 2024 EXAMPLE CORP")))
    TextAnalysis.removeBoilerplate(d, "doc_id", "text", minDocs = 50)
      .select(col("doc_id"), md5(col("clean_text")).as("clean_hash"),
        col("n_lines"), col("n_removed_lines"))
      .orderBy("doc_id")
  }

  /** Deterministic stratified sampling of lineitem by return flag
    * (Knuth-hash portable: the DuckDB oracle reproduces the exact rows). */
  def sampleStrat(spark: SparkSession, dir: String): DataFrame = {
    val li = tbl(spark, dir, "lineitem")
    Sampling.stratifiedSample(li,
        col("l_orderkey") * 100 + col("l_linenumber"), col("l_returnflag"),
        Map("A" -> 0.10, "N" -> 0.25, "R" -> 0.05))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Weight-proportional Bernoulli sample of documents (importance
    * sampling by length: keep probability ∝ n_chars, ~400 expected
    * survivors). The division-free integral keep test makes the
    * surviving set engine-exact — the oracle reproduces the exact
    * rows with HUGEINT arithmetic. */
  def sampleWeighted(spark: SparkSession, dir: String): DataFrame =
    Sampling.weightedSample(tbl(spark, dir, "documents"), col("doc_id"),
        col("n_chars"), targetRows = 400)
      .select(col("doc_id"), col("n_chars"))
      .orderBy("doc_id")

  /** Hybrid retrieval: reciprocal-rank fusion of a lexical ranker
    * (BM25 top-20, ranks from the two-pass [[Ranking.globalRank]] on
    * the 6dp-rounded score — no single-partition window) and a
    * semantic ranker (brute cosine top-20 for query vector 7). Integer
    * ranks + exact IEEE divisions make the fused list oracle-exact. */
  def rrfFusion(spark: SparkSession, dir: String): DataFrame = {
    val docs = tbl(spark, dir, "documents")
    val e = tbl(spark, dir, "embeddings")
    val bmTop = TextAnalysis.bm25(docs, "doc_id", "text",
        Seq("spark", "query", "stream"))
      .select(col("doc_id"), round(col("bm25"), 6).as("s"))
      .orderBy(col("s").desc, col("doc_id")).limit(20)
    val lexical = Ranking.globalRank(bmTop, Seq(col("s").desc, col("doc_id")))
      .select(lit(7L).as("query_id"), col("doc_id"), col("rank"))
    val semantic = Ann.bruteForceTopK(e, e.filter(col("vec_id") === 7),
        "vec_id", "embedding", k = 20)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
    Ranking.rrfFuse(Seq(lexical, semantic), "query_id", "doc_id", "rank",
        kRrf = 60, topN = 10)
      .select(col("query_id"), col("doc_id"), round(col("rrf"), 6).as("rrf"),
        col("n_rankers"), col("fused_rank"))
      .orderBy("fused_rank")
  }

  /** Hard-negative mining: brute-cosine top-15 candidates for queries
    * 0..4, minus a deterministic labeled-positive table, re-ranked to
    * the top-8 non-positives per query — the contrastive-batch
    * composition (candidates from any ANN producer + one anti-join). */
  def hardNegativesQ(spark: SparkSession, dir: String): DataFrame = {
    val e = tbl(spark, dir, "embeddings")
    val cand = Ann.bruteForceTopK(e, e.filter(col("vec_id") < 5),
      "vec_id", "embedding", k = 15)
    val pos = spark.range(5).select(col("id").as("query_id"),
        ((col("id") * 7 + 3) % 100).as("neighbor_id"))
      .unionAll(spark.range(5).select(col("id").as("query_id"),
        ((col("id") * 13 + 11) % 100).as("neighbor_id")))
    Ann.hardNegatives(cand, pos, "query_id", "neighbor_id", "rank", k = 8)
      .select(col("query_id"), col("neg_rank"), col("neighbor_id"),
        round(col("cos"), 4).as("cos"))
      .orderBy("query_id", "neg_rank")
  }

  /** Per-label embedding centroids (integer-quantized moments — exact
    * long sums, one double division per output cell; see
    * [[Embeddings.centroidBy]]). */
  def embedCentroid(spark: SparkSession, dir: String): DataFrame =
    Embeddings.centroidBy(tbl(spark, dir, "embeddings"), "label", "embedding")
      .select(col("label"), col("pos"), round(col("mean"), 6).as("mean"))
      .orderBy("label", "pos")

  /** Bigram-LM perplexity filter (CCNet/RedPajama-style): train the
    * smoothed bigram LM on the full corpus, score docs < 200 by mean
    * negative log likelihood. The whole chain (counts, smoothing,
    * scoring join) is engine-portable — exact oracle. */
  def lmScore(spark: SparkSession, dir: String): DataFrame = {
    val d = tbl(spark, dir, "documents")
    TextAnalysis.lmPerplexity(d, d.filter(col("doc_id") < 200), "doc_id", "text")
      .select(col("doc_id"), col("n_bigrams"), round(col("nll"), 6).as("nll"))
      .orderBy("doc_id")
  }

  /** GPT-style concat-and-chunk sequence packing: every document's
    * placement (token offset, context-window span) in the packed
    * training stream. Integer prefix sums — bit-exact oracle via a SQL
    * window, while the Spark side runs the two-pass distributed scan. */
  def packChunks(spark: SparkSession, dir: String): DataFrame = {
    val d = tbl(spark, dir, "documents")
      .withColumn("toks", TextAnalysis.wsTokenCount(col("text")))
    Packing.concatChunk(d, "doc_id", "toks", contextLen = 2048)
      .select(col("doc_id"), col("n_tokens"), col("token_offset"),
        col("chunk_first"), col("chunk_last"))
      .orderBy("doc_id")
  }

  /** Per-domain provenance stats over deterministically injected URLs:
    * extraction + domain normalization + per-domain doc/mention counts,
    * all engine-portable — exact oracle. */
  def domainStats(spark: SparkSession, dir: String): DataFrame = {
    val d = tbl(spark, dir, "documents").filter(col("doc_id") < 300)
      .withColumn("text", concat(col("text"),
        lit(" see https://Site"), (col("doc_id") % 20).cast("string"),
        lit(".example.org/p"), col("doc_id").cast("string"),
        lit(" or http://www.ref"), (col("doc_id") % 7).cast("string"),
        lit(".net/x")))
    TextAnalysis.domainStats(d, "doc_id", "text")
      .orderBy("domain")
  }

  /** BPE merge training over the corpus word-frequency table (rows-only:
    * the iterative merge loop is not SQL-expressible; determinism and
    * correctness are spec-verified against hand-computed merges). */
  def bpeMerges(spark: SparkSession, dir: String): DataFrame =
    Tokenizer.trainBpe(tbl(spark, dir, "documents"), "text", numMerges = 20)
      .orderBy("rank")

  /** Corpus vocabulary with counts (whitespace tokens, lowercased). */
  def vocab(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabulary(tbl(spark, dir, "documents"), "text")
      .orderBy("word")

  /** BM25 ranked retrieval over the corpus for a fixed query. */
  def bm25(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.bm25(tbl(spark, dir, "documents"), "doc_id", "text",
        Seq("spark", "query", "stream"))
      .select(col("doc_id"), round(col("bm25"), 6).as("bm25"))
      .orderBy("doc_id")

  /** Exact interpolated quantiles of lineitem prices via the two-pass
    * range-partitioned rank ([[Quantiles.exactScale]]) — same linear
    * interpolation as DuckDB `quantile_cont`, so the result is
    * oracle-exact, but no task ever buffers the column (the
    * `percentile`-aggregate anchor [[Quantiles.exact]] remains in the
    * API); [[quantilesApprox]] is the bounded-sketch alternative. */
  def quantiles(spark: SparkSession, dir: String): DataFrame =
    Quantiles.exactScale(tbl(spark, dir, "lineitem"), "l_extendedprice",
        Seq(0.25, 0.5, 0.75, 0.99))
      .select(col("q"), round(col("value"), 4).as("value"))
      .orderBy("q")

  /** Sketch quantiles (bounded aggregation state — the 100 TB path).
    * With accuracy >= n the Greenwald-Khanna sketch is rank-exact and
    * returns the discrete quantile, so DuckDB `quantile_disc` verifies
    * the operator bit-exactly at verification scale; production callers
    * lower `accuracy` to bound memory and accept rank error
    * <= n/accuracy. */
  def quantilesApprox(spark: SparkSession, dir: String): DataFrame =
    Quantiles.approx(tbl(spark, dir, "lineitem"), "l_extendedprice",
        Seq(0.25, 0.5, 0.75, 0.99), accuracy = 10000000)
      .select(col("q"), round(col("value"), 4).as("value"))
      .orderBy("q")

  /** Multimodal feature extraction: payload -> embedding vectors via the
    * batched encoder plumbing (md5-derived stub features, so the chain
    * verifies bit-exactly in DuckDB). */
  def multimodalEmbed(spark: SparkSession, dir: String): DataFrame = {
    val d = Multimodal.withPayload(
      tbl(spark, dir, "documents").filter(col("doc_id") < 50)
        .select("doc_id", "text"), "text", "image")
    Multimodal.featureExtract(d, dim = 8)
      .select(col("doc_id"), posexplode(col("features")).as(Seq("j", "value")))
      .select(col("doc_id"), col("j"), round(col("value"), 6).as("value"))
      .orderBy("doc_id", "j")
  }

  /** RAG-style chunking of every document into 180-char windows with a
    * 30-char overlap: chunk ids, offsets, and content digests — the
    * narrow explode an embedding pipeline runs before encoding. */
  def chunk(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.chunkText(tbl(spark, dir, "documents"), "doc_id", "text",
        chunkSize = 180, overlap = 30)
      .select(col("doc_id"), col("chunk_id"), col("chunk_start"),
        length(col("chunk")).as("chunk_len"), md5(col("chunk")).as("chunk_md5"))
      .orderBy("doc_id", "chunk_id")

  /** Per-user rolling features over the event stream: last-5-events count
    * and exact cents sum (row frame, id tiebreak) plus a trailing 1-hour
    * range frame — all key-partitioned windows, integer-exact oracle. */
  def rollingFeats(spark: SparkSession, dir: String): DataFrame = {
    val e = EventQueries.events(spark, dir)
    val rows = Rolling.lastNRows(e, col("user_id"),
      Seq(col("ts"), col("event_id")), n = 5, valCol = col("value"))
    Rolling.timeRange(rows, col("user_id"), col("ts"),
        seconds = 3600, valCol = col("value"))
      .select(col("event_id"), col("roll_n"), col("roll_cents"),
        col("range_n"), col("range_cents"))
      .orderBy("event_id")
  }

  /** Skew-resilient join: half the events collapse onto one planted hot
    * key, which a plain shuffle join would send to a single reducer. The
    * salted join splits it 8 ways; the oracle is the PLAIN join — the
    * operator must be a pure plan-shape change, row-identical output. */
  def skewJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = EventQueries.events(spark, dir)
      .withColumn("k", when(col("user_id") % 2 === 0, lit(0L))
        .otherwise(col("user_id")))
    val c = tbl(spark, dir, "customer")
      .select(col("c_custkey").as("k"), col("c_mktsegment"))
    SkewJoin.saltedJoin(e, c, "k", saltBy = col("event_id"),
        salts = 8, hotThreshold = 1000L)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), sum(col("user_id")).as("uid_sum"))
      .orderBy("c_mktsegment")
  }

  /** SemDeDup over embeddings with planted exact duplicates: fixed
    * centroids (the first four corpus vectors) make the whole chain —
    * argmin assignment, within-cluster pairing, cosine verify —
    * replicable in SQL, so the oracle is exact. */
  def semDedup(spark: SparkSession, dir: String): DataFrame = {
    val e = tbl(spark, dir, "embeddings").filter(col("vec_id") < 200)
      .select(col("vec_id"), col("embedding"))
    val all = e.unionAll(e.select(col("vec_id") + 100000, col("embedding")))
    val centroids = e.filter(col("vec_id") < 4).orderBy("vec_id")
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    Dedup.semDedup(all, "vec_id", "embedding", centroids, threshold = 0.99)
      .select(col("cluster"), col("id_a"), col("id_b"),
        round(col("cos"), 4).as("cos"))
      .orderBy("id_a", "id_b")
  }

  /** Z-order layout key over orders (customer x price, 8-bit bins):
    * the multi-dimensional clustering key behind data-skipping writes
    * (`graft.sources.Layout.writeZOrdered`). Binning and interleave are
    * exact integer/double arithmetic — oracle-exact. */
  def zorder(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Layout.zOrderKey(tbl(spark, dir, "orders"),
        Seq("o_custkey", "o_totalprice"), bits = 8)
      .select(col("o_orderkey"), col("__z").as("z"))
      .orderBy("o_orderkey")

  /** TF-IDF term weights over a bounded doc slice (minDf = 2 prunes the
    * hapax tail) — count arithmetic + ln, oracle-exact. */
  def tfidfQ(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.tfidf(tbl(spark, dir, "documents").filter(col("doc_id") < 100),
        "doc_id", "text", minDf = 2)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        round(col("tfidf"), 6).as("tfidf"))
      .orderBy("doc_id", "term")

  /** Top 3 documents per language by quality score (deterministic
    * doc_id tiebreak) — the per-group curation primitive; the ranking
    * runs on the 6-dp-rounded quality so it is engine-portable. */
  def groupTopK(spark: SparkSession, dir: String): DataFrame =
    TopK.perGroup(
        TextAnalysis.qualityScore(tbl(spark, dir, "documents"), "text"),
        Seq(col("lang")), Seq(col("quality").desc, col("doc_id")), k = 3)
      .select(col("lang"), col("rank"), col("doc_id"), col("quality"))
      .orderBy("lang", "rank")

  /** Two-sample KS drift between returned and kept lineitem prices:
    * exact ECDF gap via the two-pass range-partitioned rank (the same
    * no-single-partition-window discipline as AUC). */
  def ksDrift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = tbl(spark, dir, "lineitem")
    val (d, na, nb) = Drift.ksStatistic(
      li.filter(col("l_returnflag") === "R"),
      li.filter(col("l_returnflag") =!= "R"), "l_extendedprice")
    Seq((d, na, nb)).toDF("ks", "n_a", "n_b")
      .withColumn("ks", round(col("ks"), 6))
  }

  /** Exact duplicate-span detection on a planted internal overlap: each
    * clone carries words 11..50 of its source wrapped in unique sentinel
    * tokens, so the operator must recover exactly the shared 40-token
    * window (plus any organic repeats the synthetic corpus has — the
    * oracle replicates the same construction either way). */
  def dupSpans(spark: SparkSession, dir: String): DataFrame = {
    val d = tbl(spark, dir, "documents").filter(col("doc_id") < 200)
      .select(col("doc_id"), col("text"))
    val w = Dedup.words(col("text"))
    val planted = d.select((col("doc_id") + 100000).as("doc_id"),
      concat_ws(" ",
        concat(lit("uniq"), col("doc_id")),
        array_join(slice(w, 11, 40), " "),
        concat(lit("tail"), col("doc_id"))).as("text"))
    Dedup.duplicateSpans(d.unionAll(planted), "doc_id", "text",
        minTokens = 10, gramWidth = 5)
      .select(col("id_a"), col("id_b"), col("start_a").cast("long").as("start_a"),
        col("start_b").cast("long").as("start_b"), col("span_tokens"))
      .orderBy("id_a", "id_b", "start_a", "start_b")
  }

  /** One-pass per-column profile over orders (integral, string, and
    * double columns exercise every stat arm). */
  def profileQ(spark: SparkSession, dir: String): DataFrame =
    Profile.profile(tbl(spark, dir, "orders"),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderpriority"))
      .orderBy("col_name")

  /** SON two-pass frequent tokens: exact counts of every token occurring
    * >= 500 times in the corpus — same answer as the full vocabulary
    * groupBy (which IS the oracle), bounded state on the way there. */
  def heavyTokensQ(spark: SparkSession, dir: String): DataFrame =
    Frequent.heavyTokens(tbl(spark, dir, "documents"), "text", minCount = 500)
      .orderBy("tok")

  /** Shard manifest for a 64 KiB-bounded export of the documents table
    * (deterministic prefix-sum placement; integer-exact oracle). */
  def shardManifest(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Export.manifest(
        tbl(spark, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", length(col("text")), shardBytes = 65536L)
      .orderBy("shard")

  /** Token-budget curation: best documents by (rounded) quality score
    * until 50k whitespace tokens are spent. The ranking runs on the
    * 6-dp-rounded quality with a doc_id tiebreak so the order — and
    * therefore the kept set — is engine-exact. */
  def budgetSelect(spark: SparkSession, dir: String): DataFrame = {
    val scored = TextAnalysis.qualityScore(
        tbl(spark, dir, "documents").select(col("doc_id"), col("text")), "text")
      .withColumn("n_tokens", TextAnalysis.wsTokenCount(col("text")))
      .select(col("doc_id"), col("quality"), col("n_tokens"))
    Curation.selectByBudget(scored,
        Seq(col("quality").desc, col("doc_id")), col("n_tokens"), budget = 50000L)
      .select(col("doc_id"), col("quality"), col("n_tokens").cast("long").as("n_tokens"),
        col("cum_before"))
      .orderBy("doc_id")
  }

  /** Exact p25/p50/p75/p99 of line prices per return flag — the
    * per-segment latency/value report (exact anchor; approx is the
    * 100 TB path, see [[Quantiles.exactByGroup]]). */
  def groupPcts(spark: SparkSession, dir: String): DataFrame =
    Quantiles.exactByGroup(tbl(spark, dir, "lineitem"), "l_returnflag",
        "l_extendedprice", Seq(0.25, 0.5, 0.75, 0.99))
      .select(col("l_returnflag"), col("q"), round(col("value"), 4).as("value"))
      .orderBy("l_returnflag", "q")

  /** Scale-exact grouped percentiles: the distinct-value prefix-sum
    * path ([[Quantiles.exactByGroupScale]]) — bounded aggregation
    * state at any row count, same interpolated values as
    * quantile_cont. */
  def groupPctsScale(spark: SparkSession, dir: String): DataFrame =
    Quantiles.exactByGroupScale(tbl(spark, dir, "lineitem"), "l_returnflag",
        "l_extendedprice", Seq(0.5, 0.95, 0.99))
      .select(col("l_returnflag"), col("q"), round(col("value"), 4).as("value"))
      .orderBy("l_returnflag", "q")

  /** Segmented OLS: price ~ quantity per return flag (exact decimal
    * integer moments, closed-form slope/intercept/R²). */
  def groupOls(spark: SparkSession, dir: String): DataFrame =
    Analytics.groupedOls(tbl(spark, dir, "lineitem"), "l_returnflag",
        "l_quantity", "l_extendedprice")
      .orderBy("l_returnflag")

  /** Order-independent per-shard content digests of the documents
    * table (the export/migration integrity check). */
  def tableDigestQ(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Export.tableDigest(
        tbl(spark, dir, "documents").select("doc_id", "text"),
        Seq("doc_id", "text"), shards = 16)
      .orderBy("shard")

  def multimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    val d = Multimodal.withPayload(
      tbl(spark, dir, "documents").select("doc_id", "text"), "text", "image")
      .drop("text")
    Multimodal.decode(d)
      .select(col("doc_id"), col("media.byte_len").as("byte_len"),
        col("media.width").as("width"), col("media.height").as("height"),
        col("media.format").as("format"))
      .orderBy("doc_id")
  }

  /** Exact Pearson correlation matrix over lineitem's numeric columns
    * (decimal-exact integer moments; see [[Analytics.corrPairs]]). */
  def corrMatrix(spark: SparkSession, dir: String): DataFrame =
    Analytics.corrPairs(tbl(spark, dir, "lineitem"),
        Seq(("l_quantity", "l_extendedprice"), ("l_quantity", "l_discount"),
          ("l_quantity", "l_tax"), ("l_extendedprice", "l_discount"),
          ("l_extendedprice", "l_tax"), ("l_discount", "l_tax")))
      .orderBy("col_a", "col_b")

  /** Mixture rebalancing over document sources: data-dependent integer
    * thresholds (target-count / observed-count), engine-exact kept set.
    * src2's target exceeds every SF's source count (keep-all branch);
    * src4 is deliberately absent (dropped-domain branch). */
  def mixtureSample(spark: SparkSession, dir: String): DataFrame =
    Sampling.mixtureSample(tbl(spark, dir, "documents"),
        col("doc_id"), col("source"),
        Map("src0" -> 5L, "src1" -> 12L, "src2" -> 100000L,
          "src3" -> 17L, "src5" -> 1L))
      .select(col("doc_id"), col("source"))
      .orderBy("doc_id")

  /** Distributed Lloyd's k-means (k=8, 3 assignment rounds) on the
    * embeddings table — the full iterative fit verified row-exactly
    * against the unrolled-CTE oracle (see [[KMeans.lloyd]]). */
  def kmeansQ(spark: SparkSession, dir: String): DataFrame =
    KMeans.lloyd(tbl(spark, dir, "embeddings"), "vec_id", "embedding",
        k = 8, iters = 3)
      .select(col("id").as("vec_id"), col("cluster"))
      .orderBy("vec_id")

  /** OLAP ROLLUP with grouping ids over lineitem (subtotals + grand
    * total in ONE Expand+aggregate pass — no self-union of per-level
    * aggregations; money sums in exact integer cents). Spark and
    * DuckDB share the grouping-id bitmask convention (first column =
    * highest bit). */
  def rollupQ(spark: SparkSession, dir: String): DataFrame = {
    val li = tbl(spark, dir, "lineitem")
    val qtyC = round(col("l_quantity") * 100).cast("long")
    val priceC = round(col("l_extendedprice") * 100).cast("long")
    li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().cast("int").as("gid"),
        count(lit(1)).as("n"),
        sum(qtyC).as("sum_qty_cents"),
        sum(priceC).as("sum_price_cents"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))
  }

  /** PIVOT: per-source document counts spread across language columns
    * (one aggregation; absent cells 0 — integer-exact). */
  def pivotQ(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "documents")
      .groupBy(col("source"))
      .pivot("lang", Seq("de", "en", "es", "fr", "zh"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("source")

  /** ASCII-normalized 30-char name keys for the fuzzy-matching queries:
    * the right side truncates by doc_id % 5 chars, so edit distances
    * span 0-4 and the maxDist=3 filter genuinely prunes. Pure-ASCII
    * keys keep byte-level and codepoint-level Levenshtein identical
    * across engines (the zh documents would otherwise diverge). */
  private def fuzzySides(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val d = tbl(spark, dir, "documents").filter(col("doc_id") < 300)
      .withColumn("base",
        substring(regexp_replace(lower(col("text")), "[^a-z ]", ""), 1, 30))
    val left = d.select(col("doc_id"), col("base").as("k"))
    val right = d.select((col("doc_id") + 100000).as("doc_id"),
      expr("substring(base, 1, 30 - CAST(doc_id % 5 AS INT))").as("k"))
    (left, right)
  }

  /** Blocked fuzzy join (record linkage): normalized-prefix blocking +
    * Levenshtein verify (see [[FuzzyJoin.fuzzyPairs]]). */
  def fuzzyJoinQ(spark: SparkSession, dir: String): DataFrame = {
    val (left, right) = fuzzySides(spark, dir)
    FuzzyJoin.fuzzyPairs(left, "doc_id", "k", right, "doc_id", "k",
        maxDist = 3)
      .orderBy("left_id", "right_id")
  }

  /** Entity resolution: fuzzy pairs → connected components → canonical
    * entity id (min member) + entity size — the full record-linkage
    * pipeline composed from [[FuzzyJoin]] + [[Dedup.connectedComponents]]. */
  def entityResolution(spark: SparkSession, dir: String): DataFrame = {
    val (left, right) = fuzzySides(spark, dir)
    val pairs = FuzzyJoin.fuzzyPairs(left, "doc_id", "k",
      right, "doc_id", "k", maxDist = 3)
    val cc = Dedup.connectedComponents(pairs, "left_id", "right_id")
    val sizes = cc.groupBy(col("cluster_id")).agg(count(lit(1)).as("entity_size"))
    cc.join(sizes, "cluster_id")
      .select(col("id"), col("cluster_id").as("entity_id"), col("entity_size"))
      .orderBy("id")
  }

  /** Corpus delta between two snapshots (see [[graft.sources.Export.delta]]):
    * removals (doc_id % 7 == 0), edits (% 5 == 0, " v2" appended), and
    * 25 added docs — every row classified engine-exactly by content
    * hash. */
  def exportDelta(spark: SparkSession, dir: String): DataFrame = {
    val d = tbl(spark, dir, "documents")
    val oldDf = d.select(col("doc_id"), col("text"))
    val newDf = d.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
      .unionAll(d.filter(col("doc_id") < 25)
        .select((col("doc_id") + 200000).as("doc_id"), col("text")))
    graft.sources.Export.delta(oldDf, newDf, "doc_id", Seq("text"))
      .orderBy("doc_id")
  }

  /** Distributed global ranking + decile assignment (two-pass
    * range-partitioned rank, no single-partition window): documents by
    * length, unique doc_id tiebreak — engine-exact total order. */
  def rankDeciles(spark: SparkSession, dir: String): DataFrame =
    Ranking.globalRank(
        tbl(spark, dir, "documents").select(col("doc_id"), col("n_chars")),
        Seq(col("n_chars").desc, col("doc_id")), nBuckets = 10)
      .orderBy("rank")

  /** Deequ-style data-quality sweep: every rule in ONE scan (counts —
    * engine-exact). Rules deliberately mix passing and failing checks. */
  def dqChecks(spark: SparkSession, dir: String): DataFrame =
    DataQuality.check(tbl(spark, dir, "lineitem"), Seq(
        "l_orderkey_not_null" -> col("l_orderkey").isNull,
        "l_quantity_in_1_50" ->
          (col("l_quantity") < 1.0 || col("l_quantity") > 50.0),
        "l_discount_in_0_0.1" ->
          (col("l_discount") < 0.0 || col("l_discount") > 0.1),
        "l_price_positive" -> (col("l_extendedprice") <= 0.0),
        "l_returnflag_domain" -> !col("l_returnflag").isin("A", "N", "R"),
        "l_tax_under_0.05" -> (col("l_tax") > 0.05)))
      .orderBy("rule")

  /** Integer-exact fixed-width histogram of l_extendedprice (cent
    * units, $5,000 bins — floor-division bin keys, no float binning). */
  def histogramQ(spark: SparkSession, dir: String): DataFrame =
    DataQuality.histogram(tbl(spark, dir, "lineitem"),
        col("l_extendedprice"), binUnits = 500000L)
      .orderBy("bin")

  /** Fixed-point integer PageRank over the symmetrized near-dup pair
    * graph (rank canonical documents within duplicate neighborhoods) —
    * bit-exact on any engine, iterations unrolled in the oracle. */
  def pagerankQ(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.minhashLsh(docsWithNearDups(spark, dir), "doc_id",
      "text", bands = 4, rowsPerBand = 3, threshold = 0.6)
    val sym = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
    Graph.pageRank(sym, "src", "dst", iters = 5)
      .select(col("id").as("doc_id"), col("pr_nano"))
      .orderBy("doc_id")
  }

  /** STANDARD-semantics PageRank (dangling mass redistributed) over the
    * DIRECTED near-dup pair graph (id_a -> id_b only, so every
    * component's sink nodes have no out-edges and the redistribution
    * path actually carries mass) — the same fixed-point integer
    * arithmetic, sink share = sinkMass div n per iteration, bit-exact
    * against the unrolled oracle. */
  def pagerankDangling(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.minhashLsh(docsWithNearDups(spark, dir), "doc_id",
      "text", bands = 4, rowsPerBand = 3, threshold = 0.6)
    Graph.pageRank(pairs.select(col("id_a").as("src"), col("id_b").as("dst")),
        "src", "dst", iters = 5, redistributeDangling = true)
      .select(col("id").as("doc_id"), col("pr_nano"))
      .orderBy("doc_id")
  }

  /** CDC MERGE: a synthetic change stream derived from orders (updates,
    * deletes for custkey % 97 == 0, inserts keyed +100000) applies
    * latest-wins — ordered by (o_orderdate, o_orderkey) — onto the
    * customer snapshot. Pure pick-and-join semantics, engine-exact. */
  def cdcMerge(spark: SparkSession, dir: String): DataFrame = {
    val base = tbl(spark, dir, "customer")
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val changes = tbl(spark, dir, "orders").select(
      when(col("o_orderkey") % 10 === 0, col("o_custkey") + 100000)
        .otherwise(col("o_custkey")).as("c_custkey"),
      when(col("o_custkey") % 97 === 0, lit("D")).otherwise(lit("U")).as("op"),
      col("o_orderdate"), col("o_orderkey"),
      concat(lit("cdc-"), col("o_orderkey")).as("c_name"),
      (col("o_orderkey") % 25).cast("int").as("c_nationkey"),
      col("o_totalprice").as("c_acctbal"),
      col("o_orderpriority").as("c_mktsegment"))
    Temporal.cdcApply(base, changes, "c_custkey", "op",
        Seq(col("o_orderdate"), col("o_orderkey")),
        Seq("c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))
      .orderBy("c_custkey")
  }

  /** OLAP CUBE over lineitem (all four grouping levels in ONE
    * Expand+aggregate pass; exact integer cents — the rollup query's
    * full-lattice sibling). */
  def cubeQ(spark: SparkSession, dir: String): DataFrame = {
    val li = tbl(spark, dir, "lineitem")
    li.cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().cast("int").as("gid"),
        count(lit(1)).as("n"),
        sum(round(col("l_quantity") * 100).cast("long")).as("sum_qty_cents"),
        sum(round(col("l_extendedprice") * 100).cast("long"))
          .as("sum_price_cents"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))
  }

  /** Exact per-group median / MAD / outlier counts over order totals
    * (all-integer half/quarter-cent arithmetic — see
    * [[Analytics.madOutliers]]). */
  def madOutliersQ(spark: SparkSession, dir: String): DataFrame =
    Analytics.madOutliers(tbl(spark, dir, "orders"), "o_orderpriority",
        col("o_totalprice"), k = 3)
      .orderBy("o_orderpriority")

  /** Part co-purchase graph (parts bucketed mod 997 co-occurring in the
    * same order; bounded order slice keeps the exact-enumeration demos
    * fixed-size across SFs) — shared by the triangle and k-core
    * queries. */
  private def coPurchaseEdges(spark: SparkSession, dir: String): DataFrame = {
    val pe = tbl(spark, dir, "lineitem").filter(col("l_orderkey") < 3000)
      .select(col("l_orderkey").as("ok"), (col("l_partkey") % 997).as("p"))
      .distinct()
    pe.select(col("ok"), col("p").as("src"))
      .join(pe.select(col("ok"), col("p").as("dst")), "ok")
      .filter(col("src") < col("dst"))
  }

  /** Per-node triangle counts over the co-purchase graph — the operator
    * itself is the O(m^1.5) degree-oriented join. */
  def triangleCountQ(spark: SparkSession, dir: String): DataFrame =
    Graph.triangleCount(coPurchaseEdges(spark, dir), "src", "dst")
      .orderBy("id")

  /** 30-core membership of the co-purchase graph: 16 synchronous peel
    * rounds (convergence needs <= 15 at every shipped SF; the oracle
    * unrolls the same 16 rounds, so the match is exact regardless). */
  def kcoreQ(spark: SparkSession, dir: String): DataFrame =
    Graph.kCore(coPurchaseEdges(spark, dir), "src", "dst", k = 30,
        rounds = 16)
      .orderBy("id")

  /** [[kcoreQ]] through the FIXPOINT mode ([[Graph.kCoreConverged]]):
    * on this graph peeling converges within the oracle's 16 unrolled
    * rounds (spec-proved at every shipped SF), so the converged result
    * equals the fixed-round oracle exactly — putting the
    * no-truncation API itself on the correctness board. */
  def kcoreConvQ(spark: SparkSession, dir: String): DataFrame =
    Graph.kCoreConverged(coPurchaseEdges(spark, dir), "src", "dst", k = 30)
      .orderBy("id")

  /** Windowed collocation PMI over the corpus (window 5, pair count
    * >= 5) — integer counts, one ln at the end. */
  def cooccurQ(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.cooccurrence(tbl(spark, dir, "documents"), "doc_id", "text",
        window = 5, minPair = 5L)
      .orderBy("tok_a", "tok_b")

  /** Positional inverted index over a bounded doc slice: postings with
    * occurrence counts and first positions for tokens in >= 3 docs. */
  def posIndexQ(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.positionalIndex(
        tbl(spark, dir, "documents").filter(col("doc_id") < 100),
        "doc_id", "text", minDocs = 3L)
      .select(col("token"), col("doc_id"), col("n_occur"),
        col("first_pos").cast("long").as("first_pos"), col("df"))
      .orderBy("token", "doc_id")

  /** DSIR importance weights: raw = the whole corpus, target = the
    * `src0` source slice ("select web docs that look like this
    * domain"). Per-doc hashed-ngram log-likelihood ratios for a bounded
    * output slice; the Gumbel-top-k resampler on these weights is
    * spec-covered ([[Importance.dsirResample]]). */
  def dsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val d = tbl(spark, dir, "documents")
    Importance.dsirWeights(d, d.filter(col("source") === "src0"),
        "doc_id", "text", buckets = 4096, s = 1.0)
      .filter(col("doc_id") < 400)
      .select(col("doc_id"), col("n_feats"), round(col("logw"), 6).as("logw"))
      .orderBy("doc_id")
  }

  /** Interpolated Kneser-Ney bigram LM (KenLM-style quality filter):
    * train on the full corpus, score a bounded doc slice. */
  def knLm(spark: SparkSession, dir: String): DataFrame = {
    val d = tbl(spark, dir, "documents")
    TextAnalysis.knPerplexity(d, d.filter(col("doc_id") < 200),
        "doc_id", "text", discount = 0.75)
      .select(col("doc_id"), col("n_bigrams"), round(col("nll"), 6).as("nll"))
      .orderBy("doc_id")
  }

  /** CCNet-style perplexity head/middle/tail bucketing: target LM =
    * English docs, general LM = full corpus, fixed nll cutoffs. */
  def pplRatio(spark: SparkSession, dir: String): DataFrame = {
    val d = tbl(spark, dir, "documents")
    TextAnalysis.pplRatioBuckets(d, d.filter(col("lang") === "en"),
        d.filter(col("doc_id") < 200), "doc_id", "text",
        headMax = 4.0, middleMax = 5.0)
      .select(col("doc_id"), col("n_bigrams"),
        round(col("nll_target"), 6).as("nll_target"),
        round(col("delta"), 6).as("delta"), col("bucket"))
      .orderBy("doc_id")
  }

  /** First-occurrence 4-gram novelty over the corpus in doc-id order —
    * integer-exact counts, one final division. */
  def noveltyQ(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.ngramNovelty(tbl(spark, dir, "documents"),
        "doc_id", "text", w = 4)
      .filter(col("doc_id") < 300)
      .select(col("doc_id"), col("total_grams"), col("novel_grams"),
        round(col("novelty"), 6).as("novelty"))
      .orderBy("doc_id")

  /** Tokenizer fertility per DETECTED language (composes the codegen'd
    * lang-id with the regex tokenizer) — all-integer sums, two final
    * divisions per language row. The synthetic corpus is pure lowercase
    * words (fertility would be exactly 1.0 everywhere), so the query
    * appends a deterministic punctuation/digit/CJK tail per doc to make
    * the tokenizer actually fragment — the injected-variant pattern of
    * q_url_dedup/q_domain_stats. */
  def tokFertility(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenFertility(spark,
      tbl(spark, dir, "documents").withColumn("text",
        concat(col("text"), lit(" v"), (col("doc_id") % 10).cast("string"),
          lit(".x! 数据"))), "text")
      .select(col("lang_pred"), col("n_docs"), col("ws_tokens"),
        col("regex_tokens"), col("chars"),
        round(col("fertility"), 6).as("fertility"),
        round(col("chars_per_token"), 6).as("chars_per_token"))
      .orderBy("lang_pred")

  /** Per-nation feature scaling of customer account balances: z-score,
    * min-max, and robust (median/IQR) in one stats pass, on a bounded
    * output slice. */
  def featureScale(spark: SparkSession, dir: String): DataFrame =
    Analytics.scaleByGroup(tbl(spark, dir, "customer"),
        col("c_nationkey"), col("c_acctbal"))
      .filter(col("c_custkey") <= 200)
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
        round(col("z"), 6).as("z"), round(col("minmax"), 6).as("minmax"),
        round(col("robust"), 6).as("robust"))
      .orderBy("c_custkey")

  /** Contamination audit matrix: training domains = `source` over docs
    * 0-399, eval sets = lang over docs 400+; a doc is contaminated by a
    * domain when half its 3-gram shingles appear in that domain. */
  def contamMatrix(spark: SparkSession, dir: String): DataFrame = {
    val d = tbl(spark, dir, "documents")
    TextAnalysis.contaminationMatrix(
        d.filter(col("doc_id") < 400), "source",
        d.filter(col("doc_id") >= 400), "lang", "doc_id", "text",
        w = 3, threshold = 0.5)
      .select(col("domain"), col("eval_set"), col("n_eval"),
        col("contaminated"), round(col("rate"), 6).as("rate"))
      .orderBy("domain", "eval_set")
  }

  /** Per-document lexical health: token/type counts, TTR, hapax ratio,
    * unigram entropy, on a bounded doc slice. */
  def lexicalStats(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.lexicalStats(
        tbl(spark, dir, "documents").filter(col("doc_id") < 300),
        "doc_id", "text")
      .select(col("doc_id"), col("n_tokens"), col("n_types"),
        round(col("ttr"), 6).as("ttr"),
        round(col("hapax_ratio"), 6).as("hapax_ratio"),
        round(col("entropy"), 6).as("entropy"))
      .orderBy("doc_id")

  /** Corpus Zipf conformance: log-log OLS over the top-100 token
    * frequencies — one diagnostic row. */
  def zipfQ(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.zipfFit(tbl(spark, dir, "documents"), "text", topK = 100)
      .select(col("top_k"), round(col("slope"), 6).as("slope"),
        round(col("intercept"), 6).as("intercept"))

  /** Per-source KL divergence against the corpus token mixture over
    * 1024 md5 buckets. */
  def klMix(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.klMixture(tbl(spark, dir, "documents"), "source", "text",
        buckets = 1024, s = 1.0)
      .select(col("slice"), col("n_tokens"), round(col("kl"), 6).as("kl"))
      .orderBy("slice")

  /** Suffix-semantics domain blocklisting over synthetic per-doc URLs:
    * subdomain prefixes (ads. / cdn.media. / www.) hit rules at
    * different suffix depths; longest match wins. */
  def domainFilter(spark: SparkSession, dir: String): DataFrame = {
    val d = tbl(spark, dir, "documents").filter(col("doc_id") < 400)
    val sub = element_at(array(lit(""), lit("ads."), lit("cdn.media."),
      lit("www.")), (col("doc_id") % 4).cast("int") + 1)
    val url = concat(lit("https://"), sub,
      lit("site"), (col("doc_id") % 5).cast("string"),
      lit(".example"), (col("doc_id") % 3).cast("string"),
      lit(".org/p"), col("doc_id").cast("string"))
    val rules = spark.createDataFrame(Seq(
      Tuple1("example0.org"), Tuple1("site2.example2.org"),
      Tuple1("ads.site1.example1.org"))).toDF("pattern")
    TextAnalysis.markBlockedDomains(d.select(col("doc_id"), url.as("url")),
        "doc_id", "url", rules)
      .select(col("doc_id"), col("domain"), col("blocked_by"))
      .orderBy("doc_id")
  }

  /** NFC normalization stats with planted decomposed accents (every
    * third doc gets a combining-acute suffix that NFC composes away). */
  def nfcNorm(spark: SparkSession, dir: String): DataFrame = {
    val d = tbl(spark, dir, "documents").filter(col("doc_id") < 500)
      .withColumn("text", when(col("doc_id") % 3 === 0,
        concat(col("text"), lit(" caf"), lit("e\u0301"))) // decomposed e + combining acute
        .otherwise(col("text")))
    TextAnalysis.nfcStats(d, "doc_id", "text")
      .select(col("doc_id"), col("len_raw"), col("len_nfc"), col("changed"))
      .orderBy("doc_id")
  }

  /** Per-user EWMA level (alpha = 1/4) over event values in (ts,
    * event_id) order — bit-exact against the oracle's ordered
    * list_reduce replay. */
  def ewmaQ(spark: SparkSession, dir: String): DataFrame =
    Drift.ewmaLevel(tbl(spark, dir, "events")
          .filter(col("user_id") < 200),
        "user_id", "ts", "event_id", "value", alpha = 0.25)
      .select(col("user_id"), col("n"), col("last_ts"),
        round(col("ewma"), 6).as("ewma"))
      .orderBy("user_id")

  /** Luhn-validated payment-card scan over planted digit runs: one
    * valid bare PAN, one checksum-broken dashed run, one valid spaced
    * run, and one too-short run that must NOT match. */
  def luhnScanQ(spark: SparkSession, dir: String): DataFrame = {
    val d = tbl(spark, dir, "documents").filter(col("doc_id") < 400)
      .withColumn("text", concat(col("text"),
        when(col("doc_id") % 4 === 0, lit(" card 4111111111111111 ok"))
          .when(col("doc_id") % 4 === 1, lit(" ref 4111-1111-1111-1112 bad"))
          .when(col("doc_id") % 4 === 2, lit(" num 4539 5787 6362 1486 x"))
          .otherwise(lit(" order 123456789012 none"))))
    TextAnalysis.luhnScan(d, "doc_id", "text")
      .select(col("doc_id"), col("candidate"), col("digits"), col("luhn_valid"))
      .orderBy("doc_id", "candidate")
  }

  /** Corpus-level MinHash sketch similarity between two overlapping doc
    * slices — the snapshot-delta Jaccard estimate. */
  def sketchSim(spark: SparkSession, dir: String): DataFrame = {
    val d = tbl(spark, dir, "documents")
    val a = Dedup.corpusSketch(d.filter(col("doc_id") < 300), "text",
      k = 64, w = 3)
    val b = Dedup.corpusSketch(d.filter(col("doc_id") >= 200), "text",
      k = 64, w = 3)
    Dedup.sketchSimilarity(a, b)
      .select(col("k"), col("n_equal"), round(col("sim"), 6).as("sim"))
  }

  /** Recall@5 of the LSH ANN path against brute-force ground truth on
    * the standard 10-query workload. */
  def annRecall(spark: SparkSession, dir: String): DataFrame = {
    val e = tbl(spark, dir, "embeddings")
    val truth = Ann.bruteForceTopK(e, e.filter(col("vec_id") < 10),
      "vec_id", "embedding", k = 5)
    val approx = Ann.lshTopK(e, e.filter(col("vec_id") < 10),
      "vec_id", "embedding", k = 5, tables = 8, bits = 6)
    Ann.recallAtK(approx, truth, k = 5)
      .select(col("query_id"), col("n_true"), col("n_hit"),
        round(col("recall"), 6).as("recall"))
      .orderBy("query_id")
  }

  /** MMR diversified selection: per-query brute-force top-8 shortlist,
    * then greedy MaxRel-minus-redundancy re-selection of 4
    * (lambda = 0.5 in ppm — the integral objective is engine-exact). */
  def mmrQ(spark: SparkSession, dir: String): DataFrame = {
    val e = tbl(spark, dir, "embeddings")
    val shortlist = Ann.bruteForceTopK(e, e.filter(col("vec_id") < 6),
        "vec_id", "embedding", k = 8)
      .join(e.select(col("vec_id").as("neighbor_id"), col("embedding")),
        "neighbor_id")
    Ann.mmrSelect(shortlist, "query_id", "neighbor_id", "cos", "embedding",
        k = 4)
      .orderBy("query_id", "rank")
  }

  /** Matryoshka truncation evaluation (Kusupati et al. 2022,
    * arXiv:2205.13147): retrieval recall@k of the first-32-dim PREFIX
    * of each embedding against the full-dimension ground truth — the
    * measurement behind "how many dims can we drop before retrieval
    * degrades", composed entirely from the existing brute-force top-k
    * + recall operators (slice is a codegen expression; the corpus
    * never shuffles on either pass). */
  def matryoshkaEval(spark: SparkSession, dir: String): DataFrame = {
    val e = tbl(spark, dir, "embeddings")
    val trunc = e.select(col("vec_id"),
      slice(col("embedding"), 1, 32).as("embedding"))
    val truth = Ann.bruteForceTopK(e, e.filter(col("vec_id") < 10),
      "vec_id", "embedding", k = 5)
    val approx = Ann.bruteForceTopK(trunc, trunc.filter(col("vec_id") < 10),
      "vec_id", "embedding", k = 5)
    Ann.recallAtK(approx, truth, k = 5)
      .select(col("query_id"), col("n_true"), col("n_hit"),
        round(col("recall"), 6).as("recall"))
      .orderBy("query_id")
  }

  /** Per-label embedding dispersion (mean cosine distance to the
    * integer-quantized centroid). */
  def embedDispersion(spark: SparkSession, dir: String): DataFrame =
    Embeddings.dispersionBy(tbl(spark, dir, "embeddings"),
        "label", "embedding")
      .select(col("label"), col("n_vecs"),
        round(col("dispersion"), 6).as("dispersion"))
      .orderBy("label")

  /** Code-vs-prose routing signals with a planted code block on every
    * fifth doc. */
  def codeDetect(spark: SparkSession, dir: String): DataFrame = {
    val block = "\ndef f(x):\n  return x + 1;\nclass A {\n  int v = 2;\n}"
    val d = tbl(spark, dir, "documents").filter(col("doc_id") < 400)
      .withColumn("text", when(col("doc_id") % 5 === 0,
        concat(col("text"), lit(block))).otherwise(col("text")))
    TextAnalysis.codeSignals(d, "doc_id", "text")
      .select(col("doc_id"), col("n_chars"), col("n_symbols"),
        col("n_keywords"), col("n_lines"), col("n_marked_lines"),
        round(col("symbol_ratio"), 6).as("symbol_ratio"), col("is_code"))
      .orderBy("doc_id")
  }

  /** HITS hubs/authorities over the DIRECTED planted near-dup pair
    * graph (the q_pagerank_dangling edge set) — 2 integer iterations
    * with power-of-two rescale, bit-exact. */
  def hitsQ(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.minhashLsh(docsWithNearDups(spark, dir), "doc_id",
      "text", bands = 4, rowsPerBand = 3, threshold = 0.6)
    Graph.hits(pairs.select(col("id_a").as("src"), col("id_b").as("dst")),
        "src", "dst", iters = 2)
      .select(col("id").as("doc_id"), col("auth"), col("hub"),
        round(col("auth_share"), 6).as("auth_share"),
        round(col("hub_share"), 6).as("hub_share"))
      .orderBy("doc_id")
  }

  /** Ranked-retrieval evaluation: each user's events ranked by value
    * form the "run", event_type grades form the relevance judgments
    * (purchase=3, signup=2, click/view=1, error=0) — NDCG@10, AP@10,
    * reciprocal rank, precision/recall, all scaled-integer. */
  private def rankedEvalDf(spark: SparkSession, dir: String): DataFrame = {
    val ev = tbl(spark, dir, "events")
      .filter(col("user_id").isNotNull && col("value").isNotNull)
    val rel = expr("CASE event_type WHEN 'purchase' THEN 3 " +
      "WHEN 'signup' THEN 2 WHEN 'click' THEN 1 WHEN 'view' THEN 1 " +
      "ELSE 0 END")
    Evaluation.rankedEval(
      ev.select(col("user_id"), col("event_id"), col("value")),
      ev.select(col("user_id"), col("event_id"), rel.as("rel")),
      "user_id", "event_id", "value", "rel", k = 10)
  }

  def rankedEvalQ(spark: SparkSession, dir: String): DataFrame =
    rankedEvalDf(spark, dir).orderBy("user_id")

  def irSummaryQ(spark: SparkSession, dir: String): DataFrame =
    Evaluation.irSummary(rankedEvalDf(spark, dir), k = 10)

  /** Exact PR curve of the l_quantity score against the R-returnflag
    * label — one point per distinct score, two-pass prefix sums. */
  def prCurveQ(spark: SparkSession, dir: String): DataFrame =
    Evaluation.prCurve(
      tbl(spark, dir, "lineitem").select(col("l_quantity"),
        (col("l_returnflag") === "R").cast("long").as("is_r")),
      "l_quantity", "is_r")
      .orderBy(col("threshold").desc)

  def confusionQ(spark: SparkSession, dir: String): DataFrame =
    Evaluation.confusionAt(
      tbl(spark, dir, "lineitem").select(col("l_quantity"),
        (col("l_returnflag") === "R").cast("long").as("is_r")),
      "l_quantity", "is_r", threshold = 25.0)

  /** Calibration of the toy "probability" mu = l_quantity / 50 (ppm
    * integers by construction) against the R-returnflag label. */
  private def muPpmDf(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "lineitem")
      .select((col("l_quantity").cast("long") * 20000L).as("mu_ppm"),
        (col("l_returnflag") === "R").cast("long").as("is_r"))

  def calibrationQ(spark: SparkSession, dir: String): DataFrame =
    Evaluation.calibrationBins(muPpmDf(spark, dir), "mu_ppm", "is_r",
      bins = 10).orderBy("bin")

  def brierQ(spark: SparkSession, dir: String): DataFrame =
    Evaluation.brier(muPpmDf(spark, dir), "mu_ppm", "is_r", bins = 10)

  /** Link-prediction scores over the co-purchase graph (cn >= 10 keeps
    * the declared result to the strongly-overlapping pairs — the dense
    * demo graph has ~400k 1-wedge pairs; the operator emits them all). */
  def linkPredictQ(spark: SparkSession, dir: String): DataFrame =
    Graph.linkPredict(coPurchaseEdges(spark, dir), "src", "dst")
      .filter(col("cn") >= 10)
      .orderBy("u", "v")

  def clusteringCoeffQ(spark: SparkSession, dir: String): DataFrame =
    Graph.clusteringCoeff(coPurchaseEdges(spark, dir), "src", "dst")
      .orderBy("id")

  def assortativityQ(spark: SparkSession, dir: String): DataFrame =
    Graph.degreeAssortativity(coPurchaseEdges(spark, dir), "src", "dst")

  /** Association rules over (user, event_type) baskets. */
  def assocRulesQ(spark: SparkSession, dir: String): DataFrame =
    Frequent.associationRules(
      tbl(spark, dir, "events"), "user_id", "event_type", minSupport = 2)
      .orderBy("ante", "cons")

  /** Mojibake scan over documents with PLANTED encoding artifacts
    * (replacement char, C1 control, latin-1 double-decode digraph) —
    * the clean corpus must scan clean and exactly the planted docs
    * must flag. */
  def mojibakeQ(spark: SparkSession, dir: String): DataFrame = {
    val d = tbl(spark, dir, "documents")
      .select(col("doc_id"), concat(coalesce(col("text"), lit("")),
        when(col("doc_id") % 7 === 0, lit(" \u00c3\u00a9")).otherwise(lit("")),
        when(col("doc_id") % 11 === 0, lit(" \ufffd")).otherwise(lit("")),
        when(col("doc_id") % 13 === 0, lit("\u0085")).otherwise(lit("")))
        .as("text"))
    TextAnalysis.mojibakeScan(d, "doc_id", "text").orderBy("doc_id")
  }

  def readabilityQ(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.readability(tbl(spark, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")

  /** RAKE keyphrases of the corpus (recurring phrases only — the
    * one-off tail is the operator's raw output). */
  def keyphraseQ(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.rakePhrases(tbl(spark, dir, "documents"), "doc_id", "text")
      .filter(col("n_occurrences") >= 3)
      .orderBy("phrase")

  /** Compaction bins of the documents "manifest" (source = partition,
    * n_chars = file bytes, 5 KB target). */
  def compactionPlanQ(spark: SparkSession, dir: String): DataFrame = {
    val plan = graft.sources.Layout.compactionPlan(
      tbl(spark, dir, "documents"), "source", "doc_id", "n_chars",
      targetBytes = 5000)
    graft.sources.Layout.compactionBins(plan, "source")
      .orderBy("source", "bin_id")
  }

  def skewReportQ(spark: SparkSession, dir: String): DataFrame =
    SkewJoin.skewReport(tbl(spark, dir, "lineitem"), "l_suppkey")

  /** Mann-Whitney U: purchase vs click event values. */
  /** Two-sample Cramér–von Mises between A-flag and N-flag prices —
    * the integrated-squared-gap companion to q_ks_drift's max gap. */
  def cvmQ(spark: SparkSession, dir: String): DataFrame = {
    val li = tbl(spark, dir, "lineitem")
    Drift.cvmStatistic(
      li.filter(col("l_returnflag") === "A").select(col("l_extendedprice")),
      li.filter(col("l_returnflag") === "N").select(col("l_extendedprice")),
      "l_extendedprice")
  }

  def mannWhitneyQ(spark: SparkSession, dir: String): DataFrame = {
    val ev = tbl(spark, dir, "events").filter(col("value").isNotNull)
    Drift.mannWhitneyU(
      ev.filter(col("event_type") === "purchase").select(col("value")),
      ev.filter(col("event_type") === "click").select(col("value")),
      "value")
  }

  def giniQ(spark: SparkSession, dir: String): DataFrame =
    Analytics.giniBy(tbl(spark, dir, "documents"), "source", "n_chars")
      .orderBy("source")

  /** Modularity of the near-dup cluster partition over its own pair
    * graph (communities = connected components — every edge intra, so
    * Q measures the degree-mass spread across clusters). */
  def modularityQ(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.minhashLsh(docsWithNearDups(spark, dir), "doc_id",
      "text", bands = 4, rowsPerBand = 3, threshold = 0.6)
      .localCheckpoint(false) // edges + membership reuse one LSH pass
    val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
    Graph.modularity(pairs, "id_a", "id_b", cc, "id", "cluster_id")
      .orderBy("community")
  }

  /** Poisson-bootstrap replicate means of the event values. */
  def bootstrapCiQ(spark: SparkSession, dir: String): DataFrame =
    Sampling.bootstrapMeans(
      tbl(spark, dir, "events"), "event_id", "value", replicates = 40)
      .orderBy("replicate")

  def mutualInfoQ(spark: SparkSession, dir: String): DataFrame =
    Analytics.mutualInfo(tbl(spark, dir, "documents"), "source", "lang")

  /** Holt level+trend per user (bounded key range mirrors q_ewma). */
  def holtQ(spark: SparkSession, dir: String): DataFrame =
    Drift.holtLevelTrend(
      tbl(spark, dir, "events").filter(col("user_id") < 200),
      "user_id", "ts", "event_id", "value")
      .orderBy("user_id")

  /** Centroid silhouette of the embeddings' ground-truth labels. */
  def silhouetteQ(spark: SparkSession, dir: String): DataFrame =
    Embeddings.silhouetteBy(tbl(spark, dir, "embeddings"),
      "vec_id", "label", "embedding")
      .orderBy("label")

  /** Freshness-decayed per-type event mass (halflife 7 days, anchored
    * at 2024-02-05 — just past the synthetic 30-day span). */
  def timeDecayQ(spark: SparkSession, dir: String): DataFrame =
    Temporal.timeDecayedStats(tbl(spark, dir, "events"),
      "event_type", "ts", "value", refDate = "2024-02-05", halflifeDays = 7)
      .orderBy("event_type")

  /** Exact self-join cardinality estimate on l_partkey — "would the
    * co-purchase join explode" without running it. */
  def joinEstimateQ(spark: SparkSession, dir: String): DataFrame = {
    val li = tbl(spark, dir, "lineitem")
    Profile.joinCardinality(li, "l_partkey", li, "l_partkey")
  }

  /** k-anonymity / l-diversity audit of events under the
    * (user cohort, event type) quasi-identifier with bucketed value as
    * the sensitive attribute. */
  def kAnonQ(spark: SparkSession, dir: String): DataFrame =
    DataQuality.kAnonymity(
      tbl(spark, dir, "events")
        .filter(col("user_id").isNotNull && col("event_type").isNotNull &&
          col("value").isNotNull)
        .select((col("user_id") % 500).as("qa"), col("event_type"),
          expr("CAST(round(value * 100) AS BIGINT) div 5000").as("vb")),
      Seq("qa", "event_type"), "vb", k = 5)

  /** Banding quality: minhash candidates (verify floor 0.01) scored
    * against the exact all-pairs Jaccard truth at 0.6. */
  def dedupEvalQ(spark: SparkSession, dir: String): DataFrame = {
    val corpus = docsWithNearDups(spark, dir, 1000)
      .localCheckpoint(false) // both pair producers share one build
    val truth = Dedup.ngramJaccardPairs(corpus, "doc_id", "text",
      threshold = 0.6, maxDf = Int.MaxValue)
    val cand = Dedup.minhashLsh(corpus, "doc_id", "text",
      bands = 4, rowsPerBand = 3, threshold = 0.01)
    Evaluation.pairSetEval(truth, cand, "id_a", "id_b")
  }

  /** Label propagation: sources of the seed docs (doc_id < 250) spread
    * over the near-dup graph, two clamped synchronous rounds. */
  def labelPropQ(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.minhashLsh(docsWithNearDups(spark, dir), "doc_id",
      "text", bands = 4, rowsPerBand = 3, threshold = 0.6)
    val seeds = tbl(spark, dir, "documents")
      .filter(col("doc_id") < 250)
      .select(col("doc_id"), col("source"))
    Graph.labelPropagation(pairs, "id_a", "id_b", seeds, "doc_id", "source",
        rounds = 2)
      .orderBy("id")
  }

  def seasonalityQ(spark: SparkSession, dir: String): DataFrame =
    Analytics.seasonalProfile(tbl(spark, dir, "events"),
      "event_type", "ts", "value")
      .orderBy("event_type", "dow", "hour")

  def chi2Q(spark: SparkSession, dir: String): DataFrame =
    Analytics.chiSquare(tbl(spark, dir, "documents"), "source", "lang")

  def winsorizeQ(spark: SparkSession, dir: String): DataFrame =
    Analytics.winsorizedStats(
      tbl(spark, dir, "lineitem").select(col("l_returnflag"),
        col("l_extendedprice")),
      "l_returnflag", "l_extendedprice", pLo = 0.05, pHi = 0.95)
      .orderBy("l_returnflag")

  /** Bitext candidate mining: each doc under 300 gains two unique
    * deterministic reference numbers; a planted "translation" twin
    * (id + 200000, lang 'xx', words reversed) keeps the numbers —
    * cross-language number-fingerprint Jaccard must pair exactly the
    * twins. */
  def bitextMineQ(spark: SparkSession, dir: String): DataFrame = {
    val base = tbl(spark, dir, "documents")
      .filter(col("doc_id") < 300)
      .select(col("doc_id"), col("lang"),
        concat(coalesce(col("text"), lit("")),
          lit(" ref "), col("doc_id") * 7 + 11,
          lit(" code "), col("doc_id") * 13 + 29).as("text"))
    val twin = base.select((col("doc_id") + 200000).as("doc_id"),
      lit("xx").as("lang"),
      concat_ws(" ", reverse(split(col("text"), " "))).as("text"))
    Dedup.bitextCandidates(base.unionAll(twin), "doc_id", "lang", "text",
        threshold = 0.9, maxDf = 1000)
      .orderBy("id_a", "id_b")
  }

  /** Incremental clustering: CC labels of the early pair batch folded
    * with the late batch must equal the full recompute (shares the
    * q_dedup_cluster oracle). */
  def ccIncrementalQ(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.minhashLsh(docsWithNearDups(spark, dir), "doc_id",
      "text", bands = 4, rowsPerBand = 3, threshold = 0.6)
      .localCheckpoint(false) // split twice below
    val old = pairs.filter(col("id_b") < 100250)
    val fresh = pairs.filter(col("id_b") >= 100250)
    val labels1 = Dedup.connectedComponents(old, "id_a", "id_b")
    Dedup.connectedComponentsIncremental(labels1, "id", "cluster_id",
        fresh, "id_a", "id_b")
      .select(col("id").as("doc_id"), col("cluster_id"))
      .orderBy("doc_id")
  }

  /** Exact 1-D EMD between purchase and click value distributions. */
  def emdQ(spark: SparkSession, dir: String): DataFrame = {
    val ev = tbl(spark, dir, "events").filter(col("value").isNotNull)
    Drift.emd1d(
      ev.filter(col("event_type") === "purchase").select(col("value")),
      ev.filter(col("event_type") === "click").select(col("value")),
      "value")
  }

  /** Exact DAU + trailing-7-day distinct users per day. */
  def rollingDistinctQ(spark: SparkSession, dir: String): DataFrame =
    Analytics.rollingDistinct(tbl(spark, dir, "events"),
      "user_id", "ts", windowDays = 7)
      .orderBy("d")

  /** Multi-probe LSH ANN: same workload as q_ann_lsh, two extra
    * Hamming-1 probes per query bucket. */
  def annMultiProbe(spark: SparkSession, dir: String): DataFrame = {
    val e = tbl(spark, dir, "embeddings")
    Ann.lshTopKMultiProbe(e, e.filter(col("vec_id") < 10), "vec_id",
        "embedding", k = 5, tables = 8, bits = 6, probes = 2)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 4).as("cos"))
      .orderBy("query_id", "rank")
  }

  /** Seasonal-residual anomaly counts per event type (1.00-unit
    * threshold = 100 cents... using 10000 cents = 100.00). */
  def seasonalResidQ(spark: SparkSession, dir: String): DataFrame =
    Analytics.seasonalResiduals(tbl(spark, dir, "events"),
      "event_type", "ts", "value", threshCents = 10000)
      .orderBy("event_type")

  /** Inter-arrival burstiness per user over the event stream. */
  def interArrivalQ(spark: SparkSession, dir: String): DataFrame =
    Temporal.interArrivalStats(tbl(spark, dir, "events"),
      "user_id", "ts", "event_id")
      .orderBy("user_id")

  /** Degree distribution of the co-purchase graph. */
  def degreeDistQ(spark: SparkSession, dir: String): DataFrame =
    Graph.degreeDistribution(coPurchaseEdges(spark, dir), "src", "dst")
      .orderBy("deg")

  /** Gate co-failure matrix over documents with planted failures:
    * %6 → numeric+short stub, %5 → 15-char truncation (short),
    * %11 → appended replacement char (mojibake). */
  def gateMatrixQ(spark: SparkSession, dir: String): DataFrame = {
    val t0 = coalesce(col("text"), lit(""))
    val t1 = when(col("doc_id") % 6 === 0, lit("999 999 999 x"))
      .when(col("doc_id") % 5 === 0, expr("substr(coalesce(text, ''), 1, 15)"))
      .otherwise(t0)
    val d = tbl(spark, dir, "documents")
      .select(col("doc_id"), concat(t1,
        when(col("doc_id") % 11 === 0, lit("\ufffd")).otherwise(lit("")))
        .as("text"))
    TextAnalysis.gateMatrix(d, "doc_id", "text")
      .orderBy("gate_a", "gate_b")
  }

  /** Effective (post-exact-dedup) token accounting per source over the
    * planted full-duplicate corpus — the ratio must land at ~50%. */
  def effectiveTokensQ(spark: SparkSession, dir: String): DataFrame = {
    val base = tbl(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val d = base.unionAll(base.select(col("doc_id") + 100000,
      col("source"), col("text")))
    Curation.effectiveTokens(d, "doc_id", "source", "text")
      .orderBy("source")
  }

  /** Coverage curve: cumulative corpus share of the top-10 sources. */
  def coverageCurveQ(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.coverageCurve(tbl(spark, dir, "documents"), "source",
        topK = 10)
      .orderBy("rank")

  /** INT8 quantization audit of the embeddings corpus per label. */
  def embedInt8Q(spark: SparkSession, dir: String): DataFrame =
    Embeddings.quantizeInt8Report(tbl(spark, dir, "embeddings"),
      "vec_id", "label", "embedding")
      .orderBy("label")

  /** IBAN scan over documents with planted valid/invalid accounts. */
  def ibanScanQ(spark: SparkSession, dir: String): DataFrame = {
    val d = tbl(spark, dir, "documents")
      .select(col("doc_id"), concat(coalesce(col("text"), lit("")),
        when(col("doc_id") % 9 === 0, lit(" DE89370400440532013000"))
          .otherwise(lit("")),
        when(col("doc_id") % 10 === 0, lit(" DE89370400440532013001"))
          .otherwise(lit("")),
        when(col("doc_id") % 11 === 0, lit(" GB82WEST12345698765432"))
          .otherwise(lit("")))
        .as("text"))
    TextAnalysis.ibanScan(d, "doc_id", "text")
      .orderBy("doc_id", "candidate")
  }

  /** Spearman rank correlation (exact midranks) of quantity vs price. */
  def spearmanQ(spark: SparkSession, dir: String): DataFrame =
    Stats.spearman(tbl(spark, dir, "lineitem"), "l_quantity", "l_extendedprice")

  /** Kendall tau-b over the bounded (quantity, discount) grid. */
  def kendallQ(spark: SparkSession, dir: String): DataFrame =
    Stats.kendallTau(tbl(spark, dir, "lineitem"), "l_quantity", "l_discount")

  /** Welch's t-test: extendedprice, returnflag 'R' vs 'A'. */
  def welchQ(spark: SparkSession, dir: String): DataFrame =
    Stats.welchTTest(tbl(spark, dir, "lineitem"), "l_extendedprice",
      "l_returnflag", "R", "A")

  /** Benford first-digit audit of extendedprice cents. */
  def benfordQ(spark: SparkSession, dir: String): DataFrame =
    Stats.benford(tbl(spark, dir, "lineitem"), "l_extendedprice")

  /** CUPED adjustment of per-user event value, variant = user_id mod 2. */
  def cupedQ(spark: SparkSession, dir: String): DataFrame =
    Stats.cuped(tbl(spark, dir, "events"), "user_id", "ts", "value",
      pmod(col("user_id"), lit(2)).cast("long"))

  /** ACF of daily order revenue at lags 1..7 (zero-filled calendar). */
  def acfQ(spark: SparkSession, dir: String): DataFrame =
    Temporal.acf(tbl(spark, dir, "orders"), "o_orderdate", "o_totalprice")

  /** Per-source lexical diversity: entropy, Simpson, TTR. */
  def tokenEntropyQ(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.tokenDiversity(tbl(spark, dir, "documents"), "source", "text")

  /** Schema-profile drift: events, first 15 days vs the rest. */
  def profileDriftQ(spark: SparkSession, dir: String): DataFrame = {
    val ev = tbl(spark, dir, "events")
    val d0 = ev.agg(min(to_date(col("ts")))).head().getDate(0)
    val early = ev.filter(datediff(to_date(col("ts")), lit(d0)) < 15)
    val late = ev.filter(datediff(to_date(col("ts")), lit(d0)) >= 15)
    DataQuality.profileDrift(early, late, Seq("event_type", "value", "props"))
  }

  /** Exact embedding covariance (upper triangle, one treeAggregate). */
  def embedCovQ(spark: SparkSession, dir: String): DataFrame =
    Embeddings.covariance(tbl(spark, dir, "embeddings"), "embedding")
      .orderBy("i", "j")

  /** Integer-exact deep-discount label shared by the encoding queries:
    * discount cents >= 6 (double literals never cross the engines). */
  private def discountLabel =
    (round(col("l_discount") * 100).cast("long") >= 6).cast("long")

  /** LOO target encoding: returnflag vs the deep-discount label. */
  def targetEncodeQ(spark: SparkSession, dir: String): DataFrame =
    Importance.targetEncode(tbl(spark, dir, "lineitem"), "l_returnflag",
      discountLabel)

  /** WoE / IV of the quantity bucket vs the deep-discount label. */
  def woeIvQ(spark: SparkSession, dir: String): DataFrame =
    Importance.woeIv(tbl(spark, dir, "lineitem"),
      round(col("l_quantity")).cast("long"), discountLabel)

  /** Cohen's kappa between two deterministic document "raters". */
  def cohenKappaQ(spark: SparkSession, dir: String): DataFrame =
    Evaluation.cohenKappa(tbl(spark, dir, "documents"),
      (col("n_chars") >= 300).cast("int"),
      (length(trim(col("text"))) >= 280).cast("int"))

  /** Kaplan-Meier over user activity lifetimes. Hour grid + 24h churn
    * gap: the events table's lifetimes saturate the 30-day calendar and
    * its max last-event gap is 2 days, so the day-grid/7-day default
    * produces an EMPTY survival table here (the round-10 vacuous-oracle
    * finding) — hours give a populated curve with a real censoring mix
    * (14 churned / 150 users at sf0.01). */
  def kaplanMeierQ(spark: SparkSession, dir: String): DataFrame =
    Analytics.kaplanMeier(tbl(spark, dir, "events"), "user_id", "ts",
      churnGapDays = 24, timeUnit = "hour")

  /** Theil-Sen robust trend of daily order revenue. */
  def theilSenQ(spark: SparkSession, dir: String): DataFrame =
    Analytics.theilSen(tbl(spark, dir, "orders"), "o_orderdate", "o_totalprice")

  /** HHI concentration of revenue over suppliers per returnflag. */
  def hhiQ(spark: SparkSession, dir: String): DataFrame =
    Analytics.hhi(tbl(spark, dir, "lineitem"), "l_returnflag", "l_suppkey",
      "l_extendedprice")

  /** Jensen-Shannon divergence between the src0 and src1 corpora. */
  def jsdQ(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.jsDivergence(tbl(spark, dir, "documents"), "source", "text",
      "src0", "src1")

  /** Hill tail index of the document-length distribution (k=100). */
  def hillTailQ(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.hillTail(tbl(spark, dir, "documents"), "n_chars")

  /** New-user growth curve over the event stream. */
  def userGrowthQ(spark: SparkSession, dir: String): DataFrame =
    Analytics.userGrowth(tbl(spark, dir, "events"), "user_id", "ts")

  /** DAU/WAU stickiness per day (7-day trailing window). */
  def stickinessQ(spark: SparkSession, dir: String): DataFrame =
    Analytics.stickiness(tbl(spark, dir, "events"), "user_id", "ts")

  /** Per-language fairness audit of the length-gate classifier
    * against a deterministic planted label. */
  def fairnessQ(spark: SparkSession, dir: String): DataFrame =
    Evaluation.fairnessAudit(tbl(spark, dir, "documents"), "lang",
      (col("n_chars") >= 300).cast("long"),
      (col("doc_id") % 3 === 0).cast("long"))

  /** Deterministic contrastive negatives over the dense vec_id space. */
  def negSampleQ(spark: SparkSession, dir: String): DataFrame = {
    val emb = tbl(spark, dir, "embeddings")
    val n = emb.count()
    val pairs = emb.filter(col("vec_id") < 20)
      .select(col("vec_id"), ((col("vec_id") + 7) % n).as("pos"))
    Sampling.negativeSample(pairs, "vec_id", "pos", corpusSize = n, k = 4)
  }

  /** Empirical-Bayes smoothing of per-source long-doc rates. */
  def ebSmoothQ(spark: SparkSession, dir: String): DataFrame =
    Curation.ebSmoothRates(tbl(spark, dir, "documents"), "source",
      (col("n_chars") >= 300).cast("long"))

  /** Log-rank survival test between user_id-parity cohorts. The
    * driver corpus outlives every user (max last-event gap is 2
    * days), so the query runs the FULLY-OBSERVED contract
    * (churnGapDays = -1: every lifetime is a complete event). */
  def logRankQ(spark: SparkSession, dir: String): DataFrame =
    Analytics.logRank(tbl(spark, dir, "events"), "user_id", "ts",
      pmod(col("user_id"), lit(2)) === 1, churnGapDays = -1)

  /** Lorenz deciles of customer revenue. */
  def lorenzQ(spark: SparkSession, dir: String): DataFrame =
    Analytics.lorenzDeciles(tbl(spark, dir, "orders"), "o_custkey",
      "o_totalprice")

  /** Price-volume-mix: per-part revenue change, year-1 vs rest. */
  def pvmQ(spark: SparkSession, dir: String): DataFrame =
    Analytics.priceVolumeMix(tbl(spark, dir, "lineitem"), "l_partkey",
      "l_shipdate", "l_extendedprice", "l_quantity", splitDays = 365)

  /** Exact-duplicate rate per source (every third doc re-planted). */
  def dupRateQ(spark: SparkSession, dir: String): DataFrame = {
    val d = tbl(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val doubled = d.unionAll(
      d.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id") + 100000, col("source"), col("text")))
    Dedup.dupRateBySlice(doubled, "source", "text")
  }

  /** Cohort LTV curves over the event stream. */
  def cohortLtvQ(spark: SparkSession, dir: String): DataFrame =
    Analytics.cohortLtv(tbl(spark, dir, "events"), "user_id", "ts", "value")

  /** Referential-integrity audit over the TPC-H-ish star schema. */
  def integrityQ(spark: SparkSession, dir: String): DataFrame =
    DataQuality.integrityAudit(Seq(
      ("lineitem->orders", tbl(spark, dir, "lineitem"), "l_orderkey",
        tbl(spark, dir, "orders"), "o_orderkey"),
      ("lineitem->part", tbl(spark, dir, "lineitem"), "l_partkey",
        tbl(spark, dir, "part"), "p_partkey"),
      ("lineitem->supplier", tbl(spark, dir, "lineitem"), "l_suppkey",
        tbl(spark, dir, "supplier"), "s_suppkey"),
      ("orders->customer", tbl(spark, dir, "orders"), "o_custkey",
        tbl(spark, dir, "customer"), "c_custkey"),
      ("customer->nation", tbl(spark, dir, "customer"), "c_nationkey",
        tbl(spark, dir, "nation"), "n_nationkey")))

  /** Golden-record merge over the near-dup clusters. */
  def goldenRecordQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = docsWithNearDups(spark, dir)
      .withColumn("len", length(coalesce(col("text"), lit(""))))
      .withColumn("cat",
        substring(coalesce(col("text"), lit("")), 1, 1))
    val pairs = Dedup.minhashLsh(docsWithNearDups(spark, dir), "doc_id",
      "text", bands = 4, rowsPerBand = 3, threshold = 0.6)
    val labels = Dedup.connectedComponents(pairs, "id_a", "id_b")
    Dedup.goldenRecord(docs, "doc_id", "len", "cat",
      labels.select(col("id"), col("cluster_id")), "id", "cluster_id")
  }

  /** Per-predecessor next-event entropy (navigation predictability). */
  def navEntropyQ(spark: SparkSession, dir: String): DataFrame =
    Analytics.navEntropy(tbl(spark, dir, "events"), "user_id", "ts",
      "event_id", "event_type")

  /** k-anonymity generalization ladder over (lang, source, length). */
  def kanonLadderQ(spark: SparkSession, dir: String): DataFrame =
    DataQuality.kAnonLadder(
      tbl(spark, dir, "documents")
        .withColumn("len_bucket", expr("n_chars div 100")),
      Seq("lang", "source", "len_bucket"))

  /** Conformal 90% residual band for price ~ quantity. */
  def conformalQ(spark: SparkSession, dir: String): DataFrame =
    Analytics.conformalInterval(tbl(spark, dir, "lineitem"),
      "l_quantity", "l_extendedprice")

  /** Additive Holt-Winters over the daily event-value series. */
  def holtWintersQ(spark: SparkSession, dir: String): DataFrame =
    Drift.holtWinters(tbl(spark, dir, "events"), "ts", "value")

  /** Best single changepoint of the weekly mean order value. */
  def changepointQ(spark: SparkSession, dir: String): DataFrame =
    Drift.changepointSplit(tbl(spark, dir, "orders"), "o_orderdate",
      "o_totalprice")

  /** Quadratic trend of weekly order revenue (exact Cramer solve). */
  def quadTrendQ(spark: SparkSession, dir: String): DataFrame =
    Analytics.quadTrend(tbl(spark, dir, "orders"), "o_orderdate",
      "o_totalprice")

  /** Weighted exact price quantiles: cents weighted by units sold. */
  def weightedQuantilesQ(spark: SparkSession, dir: String): DataFrame =
    Quantiles.weightedExactScale(
      tbl(spark, dir, "lineitem")
        .select(round(col("l_extendedprice") * 100).cast("long").as("cents"),
          round(col("l_quantity")).cast("long").as("units")),
      "cents", "units", permille = Seq(250, 500, 750, 950))

  /** CMS calibration audit over document tokens (3x256 sketch). */
  def cmsAuditQ(spark: SparkSession, dir: String): DataFrame =
    Frequent.countMinAudit(tbl(spark, dir, "documents"), "text")

  /** Sample-ratio-mismatch guardrail on the user_id mod 2 split. */
  def srmQ(spark: SparkSession, dir: String): DataFrame =
    Stats.srmCheck(tbl(spark, dir, "events"),
      (pmod(col("user_id"), lit(2)) === 0).cast("long"))

  /** Difference-in-differences: user_id mod 2 treatment, day-15 split. */
  def didQ(spark: SparkSession, dir: String): DataFrame =
    Stats.diffInDiff(tbl(spark, dir, "events"), "ts", "value",
      pmod(col("user_id"), lit(2)) === 1)

  /** One-row corpus datasheet over the documents table. */
  def corpusCardQ(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.corpusCard(tbl(spark, dir, "documents"), "doc_id", "text",
      "lang", "source", "n_chars")

  /** Pairwise vocabulary overlap across sources. */
  def vocabOverlapQ(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.vocabOverlap(tbl(spark, dir, "documents"), "source", "text")

  /** Term bursts: part-name tokens over shipdate weeks (top 20). */
  def termBurstQ(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.termBurst(
      tbl(spark, dir, "lineitem")
        .join(broadcast(tbl(spark, dir, "part")),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_shipdate"), col("p_name")),
      "l_shipdate", "p_name")

  /** Distinctive terms per source (Monroe log-odds, top 5). */
  def distinctiveTermsQ(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.distinctiveTerms(tbl(spark, dir, "documents"),
      "source", "text", topK = 5)

  /** Sorted-neighborhood candidates over customer balances (w=5). */
  def sortedNeighborhoodQ(spark: SparkSession, dir: String): DataFrame =
    FuzzyJoin.sortedNeighborhood(tbl(spark, dir, "customer"),
      "c_custkey", round(col("c_acctbal") * 100), window = 5)

  /** One-way ANOVA: extendedprice across returnflag groups. */
  def anovaQ(spark: SparkSession, dir: String): DataFrame =
    Stats.anovaF(tbl(spark, dir, "lineitem"), "l_returnflag",
      "l_extendedprice")

  /** Kruskal-Wallis H: event values across event types. */
  def kruskalQ(spark: SparkSession, dir: String): DataFrame =
    Stats.kruskalWallis(tbl(spark, dir, "events"), "event_type", "value")

  /** RFM segmentation of customers over their orders. */
  def rfmQ(spark: SparkSession, dir: String): DataFrame =
    Analytics.rfmSegments(tbl(spark, dir, "orders"), "o_custkey",
      "o_orderdate", "o_totalprice")

  /** Cluster-downweighted sampling over the near-dup corpus. */
  def clusterDownweightQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = docsWithNearDups(spark, dir)
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text",
      bands = 4, rowsPerBand = 3, threshold = 0.6)
    val labels = Dedup.connectedComponents(pairs, "id_a", "id_b")
    Dedup.clusterDownweight(docs, "doc_id",
      labels.select(col("id"), col("cluster_id")), "id", "cluster_id")
  }

  /** Revenue Pareto curve: top-20 customers by order mass. */
  def paretoCurveQ(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.paretoCurve(tbl(spark, dir, "orders"), "o_custkey",
      "o_totalprice", topK = 20)

  /** Engagement-depth histogram over the event stream. */
  def engagementDepthQ(spark: SparkSession, dir: String): DataFrame =
    Analytics.engagementDepth(tbl(spark, dir, "events"), "user_id", "ts")

  /** Weekly PSI drift series of event values vs the first week. */
  def psiSeriesQ(spark: SparkSession, dir: String): DataFrame =
    Drift.psiSeries(tbl(spark, dir, "events"), "ts", "value",
      breaks = Seq(50.0, 100.0, 150.0, 200.0, 250.0, 300.0, 350.0, 400.0, 450.0))

  /** Typed-field profile of the events props JSON per event type. */
  def jsonExtractQ(spark: SparkSession, dir: String): DataFrame =
    DataQuality.jsonFieldStats(tbl(spark, dir, "events"), "event_type",
      "props", "$.k")

  /** Top 20 3-step event-type paths. */
  def sessionPathsQ(spark: SparkSession, dir: String): DataFrame =
    Analytics.sessionPaths(tbl(spark, dir, "events"), "user_id", "ts",
      "event_id", "event_type")

  /** View-to-purchase conversion-lag histogram. */
  def conversionLagQ(spark: SparkSession, dir: String): DataFrame =
    Analytics.conversionLag(tbl(spark, dir, "events"), "user_id", "ts",
      "event_type", "view", "purchase")

  /** Declared-vs-predicted language confusion matrix. */
  def langConfusionQ(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "documents")
      .filter(col("lang").isNotNull)
      .select(col("lang").as("lang_declared"),
        TextAnalysis.langId(spark, col("text")).as("lang_pred"))
      .groupBy("lang_declared", "lang_pred").agg(count(lit(1)).as("n"))
      .orderBy("lang_declared", "lang_pred")

  /** Cluster-size distribution of the near-dup CC labeling. */
  def clusterSizesQ(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.minhashLsh(docsWithNearDups(spark, dir), "doc_id", "text",
      bands = 4, rowsPerBand = 3, threshold = 0.6)
    Dedup.clusterSizes(
      Dedup.connectedComponents(pairs, "id_a", "id_b"), "cluster_id")
  }

  /** Cliff's delta: purchase vs click event values. */
  def cliffsDeltaQ(spark: SparkSession, dir: String): DataFrame = {
    val ev = tbl(spark, dir, "events").filter(col("value").isNotNull)
    Stats.cliffsDelta(
      ev.filter(col("event_type") === "purchase").select(col("value")),
      ev.filter(col("event_type") === "click").select(col("value")),
      "value")
  }

  /** Cohen's d / Hedges' g: extendedprice, returnflag 'R' vs 'A'. */
  def effectSizeQ(spark: SparkSession, dir: String): DataFrame =
    Stats.effectSize(tbl(spark, dir, "lineitem"), "l_extendedprice",
      "l_returnflag", "R", "A")

  /** Brown–Forsythe variance-homogeneity test across event types. */
  def leveneQ(spark: SparkSession, dir: String): DataFrame =
    Stats.leveneTest(tbl(spark, dir, "events"), "event_type", "value")

  /** 10%-trimmed mean of event value per event type. */
  def trimmedMeanQ(spark: SparkSession, dir: String): DataFrame =
    Stats.trimmedMean(tbl(spark, dir, "events"), "event_type", "value",
      trimFrac = 0.1).orderBy("event_type")

  /** Durbin–Watson of the mean-centered daily event-value series. */
  def durbinWatsonQ(spark: SparkSession, dir: String): DataFrame =
    Stats.durbinWatson(tbl(spark, dir, "events"), "ts", "value")

  /** McNemar: per (user, day) pair, morning purchase vs evening
    * purchase — the within-subject flip test. */
  def mcnemarQ(spark: SparkSession, dir: String): DataFrame = {
    val ev = tbl(spark, dir, "events")
      .withColumn("ud", concat_ws("|", col("user_id"),
        to_date(col("ts")).cast("string")))
    val isAm = hour(col("ts")) < 12
    Stats.mcnemar(ev, "ud",
      condA = (col("event_type") === "purchase") && isAm,
      condB = (col("event_type") === "purchase") && !isAm)
  }

  /** Wald–Wolfowitz runs test on the daily value series. */
  def runsTestQ(spark: SparkSession, dir: String): DataFrame =
    Drift.runsTest(tbl(spark, dir, "events"), "ts", "value")

  /** Mann–Kendall monotone-trend test on the daily value series. */
  def mannKendallQ(spark: SparkSession, dir: String): DataFrame =
    Drift.mannKendall(tbl(spark, dir, "events"), "ts", "value")

  /** Gains/lift deciles: rank lineitems by price, capture of 'R'. */
  def gainsQ(spark: SparkSession, dir: String): DataFrame = {
    val li = tbl(spark, dir, "lineitem")
      .withColumn("rid", col("l_orderkey") * 10 + col("l_linenumber"))
    Evaluation.gainsCurve(li, "rid", "l_extendedprice",
      col("l_returnflag") === "R")
  }

  /** Mean cumulative function of error events per at-risk user. */
  def mcfQ(spark: SparkSession, dir: String): DataFrame =
    Analytics.meanCumulativeFunction(tbl(spark, dir, "events"), "ts",
      "user_id", col("event_type") === "error")

  /** Cronbach's alpha over the three lineitem amount columns. */
  def cronbachQ(spark: SparkSession, dir: String): DataFrame =
    Stats.cronbachAlpha(tbl(spark, dir, "lineitem"),
      Seq("l_quantity", "l_discount", "l_tax"))

  /** ICC(1) of extendedprice within returnflag groups. */
  def iccQ(spark: SparkSession, dir: String): DataFrame =
    Stats.iccOneWay(tbl(spark, dir, "lineitem"), "l_returnflag",
      "l_extendedprice")

  /** Capture–recapture dedup-recall audit: minhash vs simhash
    * catches over the planted near-dup corpus — both detectors fed by
    * ONE shared tokenization/shingle pass. */
  def captureRecaptureQ(spark: SparkSession, dir: String): DataFrame =
    Dedup.captureRecaptureFromText(docsWithNearDups(spark, dir),
      "doc_id", "text", bands = 4, rowsPerBand = 3, threshold = 0.6,
      maxHamming = 6)

  /** Dirichlet query-likelihood retrieval, same query terms as bm25. */
  def qldQ(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.queryLikelihood(tbl(spark, dir, "documents"), "doc_id",
        "text", Seq("spark", "query", "stream"))
      .orderBy("doc_id")

  /** Onion-style cross-doc shingle overlap over the near-dup corpus. */
  def onionQ(spark: SparkSession, dir: String): DataFrame =
    Dedup.onionOverlap(docsWithNearDups(spark, dir), "doc_id", "text",
        w = 3, minDf = 2)
      .orderBy("id")

  /** Candidate-key audit over orders: the real key, a foreign key, and
    * a plausible-but-false composite. */
  def keyDetectQ(spark: SparkSession, dir: String): DataFrame =
    DataQuality.keyCandidates(tbl(spark, dir, "orders"),
        Seq(Seq("o_orderkey"), Seq("o_custkey"),
          Seq("o_custkey", "o_orderdate")))
      .orderBy("column_set")

  /** Missingness co-occurrence over events with planted correlated
    * nulls (value on id%7, props on id%5, event_type on id%35 — so
    * type-nulls co-occur with BOTH others by construction). */
  def nullPatternQ(spark: SparkSession, dir: String): DataFrame = {
    val ev = tbl(spark, dir, "events").select(
      when(col("event_id") % 7 === 0, lit(null)).otherwise(col("value"))
        .as("value"),
      when(col("event_id") % 5 === 0, lit(null)).otherwise(col("props"))
        .as("props"),
      when(col("event_id") % 35 === 0, lit(null)).otherwise(col("event_type"))
        .as("event_type"))
    DataQuality.nullPattern(ev, Seq("value", "props", "event_type"))
  }

  /** Language-mix profile over PLANTED code-switched docs (each doc
    * concatenated with its successor, chunked at 120 chars). */
  def langMixQ(spark: SparkSession, dir: String): DataFrame = {
    val d = tbl(spark, dir, "documents").select(col("doc_id"), col("text"))
    val paired = d.as("a").join(d.as("b"),
        col("b.doc_id") === col("a.doc_id") + 1)
      .select(col("a.doc_id").as("doc_id"),
        concat(col("a.text"), lit(" "), col("b.text")).as("text"))
    TextAnalysis.langMix(spark, paired, "doc_id", "text", chunkSize = 120)
      .orderBy("doc_id")
  }

  /** Arbitrary GROUPING SETS (the OLAP shape rollup/cube can't
    * express): (flag, status), (flag), and the grand total in ONE
    * aggregation pass. */
  def groupingSetsQ(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).cast("long").as("sum_qty"),
        count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
        coalesce(col("l_linestatus"), lit("(all)")).as("ls"),
        col("sum_qty"), col("n"))
      .orderBy("rf", "ls")

  /** Quantile normalization of event values across event types
    * (output bounded to event_id < 500; the mapping uses ALL rows). */
  def quantileNormQ(spark: SparkSession, dir: String): DataFrame =
    Ranking.quantileNormalize(tbl(spark, dir, "events"), "event_type",
        "value", "event_id")
      .filter(col("event_id") < 500)
      .orderBy("event_id")

  /** 3-hop harmonic centrality on the bounded co-purchase graph. */
  def closenessQ(spark: SparkSession, dir: String): DataFrame =
    Graph.harmonicCentrality(coPurchaseEdges(spark, dir), "src", "dst",
        maxHops = 3)
      .orderBy("id")

  /** Personalized PageRank around docs {0, 1} on the near-dup graph. */
  def pprQ(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.minhashLsh(docsWithNearDups(spark, dir), "doc_id",
      "text", bands = 4, rowsPerBand = 3, threshold = 0.6)
    val sym = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
    Graph.personalizedPageRank(sym, "src", "dst", seeds = Seq(0L, 1L),
        iters = 5)
      .select(col("id").as("doc_id"), col("ppr_nano"))
      .orderBy("doc_id")
  }

  /** G-test of independence: order priority × order status. */
  def gTestQ(spark: SparkSession, dir: String): DataFrame =
    Stats.gTest(tbl(spark, dir, "orders"), "o_orderpriority", "o_orderstatus")

  /** Jarque–Bera normality of extended price per return flag. */
  def jarqueBeraQ(spark: SparkSession, dir: String): DataFrame =
    Stats.jarqueBera(tbl(spark, dir, "lineitem"), "l_extendedprice",
      "l_returnflag")

  /** Grubbs outlier statistic of account balance per market segment. */
  def grubbsQ(spark: SparkSession, dir: String): DataFrame =
    Stats.grubbs(tbl(spark, dir, "customer"), "c_acctbal", "c_mktsegment")

  /** BH / Holm multiple-testing correction over a family of per-event-
    * type two-proportion z-tests (variant = user parity, converted =
    * ≥15 events of the type). The p-score is the Chernoff normal tail
    * bound exp(−z²/2) of the ROUNDED z — monotone in the true
    * two-sided p, engine-exact, and honest about what a SQL oracle can
    * replicate (neither engine ships erfc). */
  def bhFdrQ(spark: SparkSession, dir: String): DataFrame = {
    val perUser = tbl(spark, dir, "events")
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("c"))
    val cells = perUser.groupBy(col("event_type"))
      .agg(sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("user_id") % 2 === 0 && col("c") >= 15, 1L)
          .otherwise(0L)).as("conv_a"),
        sum(when(col("user_id") % 2 === 1, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("user_id") % 2 === 1 && col("c") >= 15, 1L)
          .otherwise(0L)).as("conv_b"))
    val z = round(
      (col("conv_a").cast("double") / col("n_a")
        - col("conv_b").cast("double") / col("n_b")) /
      sqrt(((col("conv_a") + col("conv_b")).cast("double")
          / (col("n_a") + col("n_b")))
        * (lit(1.0) - (col("conv_a") + col("conv_b")).cast("double")
          / (col("n_a") + col("n_b")))
        * (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), 6)
    val hyp = cells.select(col("event_type"),
      exp(lit(-0.5) * z * z).as("p"))
    Stats.fdrCorrect(hyp, "event_type", "p")
      .orderBy("rank")
  }

  /** Nelson–Aalen cumulative hazard on the KM query's lifetime grid
    * (hour unit, 24h churn gap — the populated-curve regime). */
  def nelsonAalenQ(spark: SparkSession, dir: String): DataFrame =
    Analytics.nelsonAalen(tbl(spark, dir, "events"), "user_id", "ts",
      churnGapDays = 24, timeUnit = "hour")

  /** Mutual-3NN graph on a bounded slice (vec_id < 2000 — the exact
    * route is inherently quadratic; the IVF route is the scale path,
    * proved equal to this one by spec). */
  def knnGraphQ(spark: SparkSession, dir: String): DataFrame =
    Ann.knnGraph(tbl(spark, dir, "embeddings").filter(col("vec_id") < 2000),
        "vec_id", "embedding", k = 3)
      .select(col("src"), col("dst"), col("rank"),
        round(col("cos"), 4).as("cos"), col("mutual"))
      .orderBy("src", "rank")

  /** Pre-filtered ANN: label=1 corpus only, first ten vectors as
    * queries — every query gets k eligible neighbors (post-filtering
    * an index probe would under-fill). */
  def annFilteredQ(spark: SparkSession, dir: String): DataFrame = {
    val e = tbl(spark, dir, "embeddings")
    Ann.filteredTopK(e, e.filter(col("vec_id") < 10), "vec_id",
        "embedding", k = 5, pred = col("label") === 1)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 4).as("cos"))
      .orderBy("query_id", "rank")
  }

  /** Optimal LSH band plan for threshold 0.6 under a 64-hash budget
    * (pure planner output: chosen (b, r) + its S-curve). */
  def lshPlanQ(spark: SparkSession, dir: String): DataFrame =
    Dedup.lshPlan(spark, threshold = 0.6, maxHashes = 64)
      .orderBy("s_pct")

  /** Linear + U-shaped multi-touch attribution: purchases credit
    * their view/click touch path within a 2-hour lookback (touches
    * pre-deduped per (user, ts) with the q_attribution min-channel
    * tiebreak; no-touch purchases credit 'none' in full). */
  def multiTouchQ(spark: SparkSession, dir: String): DataFrame = {
    val ev = EventQueries.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        round(col("value") * 100).cast("long").as("cents"))
    val touches = ev.filter(col("event_type").isin("view", "click"))
      .groupBy(col("user_id"), col("ts"))
      .agg(min(col("event_type")).as("channel"))
    Analytics.multiTouchAttribution(purchases, touches, "event_id",
      "user_id", "ts", "channel", "cents")
  }

  /** Decision stump: best event-value threshold separating purchases
    * from the other event types. */
  def stumpQ(spark: SparkSession, dir: String): DataFrame =
    Importance.decisionStump(tbl(spark, dir, "events"), "value",
      col("event_type") === "purchase")

  /** Hapax/dis legomena + TTR per document source. */
  def hapaxQ(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.hapaxStats(tbl(spark, dir, "documents"), "source", "text")

  /** Bradley–Terry source strengths from head-to-head doc-quality
    * comparisons: adjacent doc ids from DIFFERENT sources duel, the
    * longer doc wins — the preference-ranking shape of RLHF data. */
  def bradleyTerryQ(spark: SparkSession, dir: String): DataFrame = {
    val d = tbl(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val d2 = d.select(col("doc_id").as("did2"), col("source").as("source2"),
      col("n_chars").as("n2"))
    val pairs = d.join(d2, col("did2") === col("doc_id") + 1)
      .filter(col("source") =!= col("source2") && col("n_chars") =!= col("n2"))
      .select(
        when(col("n_chars") > col("n2"), col("source"))
          .otherwise(col("source2")).as("w"),
        when(col("n_chars") > col("n2"), col("source2"))
          .otherwise(col("source")).as("l"))
    Ranking.bradleyTerry(pairs, "w", "l", iters = 15)
  }

  /** Good–Turing frequency re-estimation of the corpus TRIGRAM
    * distribution (r ≤ 8) + unseen-type mass — trigrams because the
    * synthetic corpus's 31-word unigram vocabulary has no rare tail
    * (every word appears hundreds of times; N_1 = 0 makes unigram GT
    * vacuous), while the trigram table is Zipf-shaped. */
  def goodTuringQ(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.goodTuringTokens(
      Dedup.shingleStream(tbl(spark, dir, "documents")
        .filter(col("text").isNotNull), "text", 3), "gram", maxR = 8)

  /** Isotonic calibration of the scaled discount as a pseudo-score for
    * the return flag, on a 10-bin grid. */
  def isotonicQ(spark: SparkSession, dir: String): DataFrame =
    Evaluation.isotonicCalibration(tbl(spark, dir, "lineitem"),
      col("l_discount") * 10.0, (col("l_returnflag") === "R").cast("long"),
      nBins = 10)

  /** Fleiss' kappa across the 4 "raters" (line numbers) of 4-line
    * orders rating the category l_returnflag. */
  def fleissKappaQ(spark: SparkSession, dir: String): DataFrame =
    Evaluation.fleissKappa(tbl(spark, dir, "lineitem"),
      col("l_orderkey"), col("l_returnflag"), nRaters = 4)

  /** Friedman test: do event types differ in per-user cent spend once
    * user effects are blocked out? */
  def friedmanQ(spark: SparkSession, dir: String): DataFrame =
    Stats.friedmanTest(tbl(spark, dir, "events"),
      col("user_id"), col("event_type"),
      round(col("value") * 100).cast("long"))

  /** Cochran–Mantel–Haenszel test: user-parity "exposure" vs purchase
    * outcome, stratified by day-of-month mod 7 (an engine-neutral
    * stratifier — dayofweek numbering differs between engines). */
  def cmhQ(spark: SparkSession, dir: String): DataFrame =
    Stats.cmhTest(tbl(spark, dir, "events"),
      pmod(dayofmonth(col("ts")), lit(7)),
      pmod(col("user_id"), lit(2)) === 0,
      col("event_type") === "purchase")

  /** Wilcoxon signed-rank test over the same per-user purchase-minus-
    * click cent diffs as q_sign_flip (the rank-based paired test). */
  def wilcoxonQ(spark: SparkSession, dir: String): DataFrame = {
    val ev = tbl(spark, dir, "events")
    val d = ev.filter(col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg((sum(when(col("event_type") === "purchase",
          round(col("value") * 100).cast("long")).otherwise(0L)) -
        sum(when(col("event_type") === "click",
          round(col("value") * 100).cast("long")).otherwise(0L))).as("d"))
    Stats.wilcoxonSignedRank(d, "user_id", col("d"))
  }

  /** Delta-method CI for purchase cents per event, clustered by user
    * (the ratio-metric error bars of Deng et al. 2017). */
  def ratioCiQ(spark: SparkSession, dir: String): DataFrame =
    Stats.ratioMetricCI(tbl(spark, dir, "events"), "user_id",
      when(col("event_type") === "purchase",
        round(col("value") * 100).cast("long")).otherwise(0L),
      lit(1L))

  /** Sign-flip randomization test: does per-user purchase spend exceed
    * click spend? (integral cents diffs, md5-deterministic flips). */
  def signFlipQ(spark: SparkSession, dir: String): DataFrame = {
    val ev = tbl(spark, dir, "events")
    val d = ev.filter(col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg((sum(when(col("event_type") === "purchase",
          round(col("value") * 100).cast("long")).otherwise(0L)) -
        sum(when(col("event_type") === "click",
          round(col("value") * 100).cast("long")).otherwise(0L))).as("d"))
    Stats.signFlipTest(d, "user_id", col("d"))
  }

  /** DoReMi-style exponentiated-gradient domain reweighting: one EG
    * step over the source mixture using mean doc length as the
    * per-domain signal, u-smoothed 10% toward uniform. */
  def domainReweightQ(spark: SparkSession, dir: String): DataFrame =
    Curation.domainReweight(tbl(spark, dir, "documents"), "source",
      col("n_chars"), eta = 0.01, smooth = 0.1)

  /** Engine-portable HyperLogLog sketch of distinct users (p = 10). */
  def hllQ(spark: SparkSession, dir: String): DataFrame =
    Frequent.hllSketch(tbl(spark, dir, "events"), "user_id", p = 10)

  /** Per-group HLL (round 15): one register-exact sketch row per event
    * type — the per-key cardinality table (distinct users per event
    * type) whose registers replay exactly in DuckDB via the same
    * md5/rank arithmetic as q_hll, now keyed. */
  def hllByQ(spark: SparkSession, dir: String): DataFrame =
    Frequent.hllSketchBy(tbl(spark, dir, "events"), Seq("event_type"),
      "user_id", p = 10)

  /** Cox score test + one-step estimator: does per-user activity
    * volume (event count) predict the lifetime hazard? */
  def coxScoreQ(spark: SparkSession, dir: String): DataFrame =
    Analytics.coxScoreTest(tbl(spark, dir, "events"), "user_id", "ts",
      count(lit(1)))

  /** PCA of the 2-D (quantity, extendedprice) cloud — the 2x2
    * covariance eigensystem is CLOSED FORM, so the Jacobi sweep
    * verifies against an exact SQL oracle (eigenvalues ln-encoded;
    * unit eigenvectors with the deterministic largest-|weight|-
    * positive sign). scaleDigits = 0: prices quantize to whole units
    * so the scaled-integer moments stay far from Long overflow at any
    * SF. */
  def pcaQ(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = tbl(spark, dir, "lineitem")
      .select(array(col("l_quantity"), col("l_extendedprice"))
        .cast("array<double>").as("v"))
    val m = Embeddings.pcaTopK(li, "v", k = 2, scaleDigits = 0)
    (0 until 2).map { i =>
      (i, m.eigenvalues(i), m.components(i)(0), m.components(i)(1))
    }.toDF("comp", "eig", "w_qty", "w_price")
      .select(col("comp"),
        round(log(col("eig")), 6).as("ln_eig"),
        (round(col("w_qty"), 6) + lit(0.0)).as("w_qty"),
        (round(col("w_price"), 6) + lit(0.0)).as("w_price"))
      .orderBy("comp")
  }
}
