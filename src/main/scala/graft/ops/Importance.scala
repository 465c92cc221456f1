package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023) —
  * pick raw-corpus documents whose hashed-n-gram distribution looks like
  * a target corpus. The standard recipe behind "select web data that
  * resembles Wikipedia/books" curation passes.
  *
  * Pipeline: (1) bag-of-hashed-n-grams features (unigrams + bigrams,
  * md5-bucketed); (2) two smoothed categorical distributions over the
  * buckets, one from the target corpus (p) and one from the raw corpus
  * (q); (3) per-document log importance weight
  * `log w(x) = sum_b c_b(x) * (log p_b - log q_b)`; (4) Gumbel-top-k
  * resampling on the weights (sampling without replacement proportional
  * to w) with deterministic hash-derived Gumbel noise.
  *
  * Shapes (100 TB): feature extraction is a typed per-partition kernel
  * (no exploded-string shuffle — bucket ids only); both distributions
  * are ONE map-side-combined aggregation each, reduced to `buckets`
  * rows (<= 2^16, broadcast to the weight join); the per-doc weight is
  * one aggregation over the doc's bucket counts. Selection is a
  * TakeOrdered top-k (driver holds k rows, never the corpus) — for k
  * beyond driver comfort, rank with [[Ranking.rankGlobal]] instead and
  * filter `rank <= k`.
  */
object Importance {

  /** Hashed bag-of-n-grams features: one row per (doc, bucket) with its
    * occurrence count. Features are lowercased whitespace unigrams and
    * bigrams; bucket = first 4 md5 bytes (as an unsigned int) mod
    * `buckets` — portable across engines (DuckDB:
    * `('0x' || substr(md5(f), 1, 8))::BIGINT % buckets`). */
  def hashedNgramCounts(df: DataFrame, idCol: String, textCol: String,
                        buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val spark = df.sparkSession
    import spark.implicits._
    val b = buckets.toLong
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        def bucket(s: String): Long = {
          val h = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          val v = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
            ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
          v % b
        }
        it.flatMap { case (id, text) =>
          if (text == null) Iterator.empty
          else {
            val ws = text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
            val out = new Array[(Long, Long)](math.max(2 * ws.length - 1, 0))
            var i = 0
            while (i < ws.length) { out(i) = (id, bucket(ws(i))); i += 1 }
            var j = 0
            while (j < ws.length - 1) {
              out(ws.length + j) = (id, bucket(ws(j) + " " + ws(j + 1)))
              j += 1
            }
            out.iterator
          }
        }
      }
      .toDF("__id", "b")
      .groupBy(col("__id"), col("b"))
      .agg(count(lit(1)).as("c"))
  }

  /** Smoothed bucket distribution log-probabilities of a corpus:
    * `log((count_b + s) / (total + s * buckets))` for every bucket that
    * occurs (absent buckets take the implied floor `log(s / (total +
    * s * buckets))`, applied by the consumer via coalesce on count 0). */
  private def bucketLogDist(counts: DataFrame): (DataFrame, Double) = {
    val byBucket = counts.groupBy(col("b"))
      .agg(sum(col("c")).cast("double").as("cb"))
    val total = byBucket.agg(coalesce(sum(col("cb")), lit(0.0))).head().getDouble(0)
    (byBucket, total)
  }

  /** Per-document DSIR log importance weights against a target corpus.
    *
    * Returns (idCol, n_feats, logw): `n_feats` is the document's total
    * feature count, `logw` the summed log-likelihood ratio under the
    * Laplace-smoothed (constant `s`) target vs raw bucket distributions.
    * Documents with no features (null/empty text) drop out — no
    * distribution ratio is defined for them. */
  def dsirWeights(raw: DataFrame, target: DataFrame, idCol: String,
                  textCol: String, buckets: Int = 4096,
                  s: Double = 1.0): DataFrame = {
    require(s > 0, s"smoothing constant must be positive, got $s")
    val rawCounts = hashedNgramCounts(raw, idCol, textCol, buckets)
      .localCheckpoint(false) // feeds both the q distribution and scoring
    val (tb, tTot) = bucketLogDist(
      hashedNgramCounts(target, idCol, textCol, buckets))
    val (qb, qTot) = bucketLogDist(rawCounts)
    val denomT = tTot + s * buckets
    val denomQ = qTot + s * buckets
    // <= `buckets` rows each: broadcast both sides of the ratio table
    val ratio = broadcast(qb.join(tb.withColumnRenamed("cb", "tb"), Seq("b"), "full")
      .select(col("b"),
        (log((coalesce(col("tb"), lit(0.0)) + s) / denomT) -
          log((coalesce(col("cb"), lit(0.0)) + s) / denomQ)).as("lr")))
    rawCounts.join(ratio, Seq("b"))
      .groupBy(col("__id"))
      .agg(sum(col("c")).as("n_feats"),
        sum(col("c").cast("double") * col("lr")).as("logw"))
      .withColumnRenamed("__id", idCol)
  }

  /** Gumbel-top-k resampling on DSIR weights: sampling k documents
    * without replacement with probability proportional to their
    * importance weight. The Gumbel noise is hash-derived from the doc id
    * ([[Sampling.hashBucket]]), so the draw is deterministic and
    * engine-portable: `g = -ln(-ln((hash(id) + 0.5) / 2^32))`.
    *
    * Driver holds exactly k rows (TakeOrdered); the corpus is never
    * collected. */
  def dsirResample(raw: DataFrame, target: DataFrame, idCol: String,
                   textCol: String, k: Int, buckets: Int = 4096,
                   s: Double = 1.0): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val u = (Sampling.hashBucket(col(idCol)).cast("double") + 0.5) /
      lit(Sampling.MOD.toDouble)
    dsirWeights(raw, target, idCol, textCol, buckets, s)
      .withColumn("gumbel_key", col("logw") - log(-log(u)))
      .orderBy(desc("gumbel_key"), col(idCol))
      .limit(k)
  }

  // ------------------------------------ trained quality filter (fastText-ish)

  /** Per-doc sparse hashed-n-gram feature vectors: (idCol, idx, vals) —
    * sorted bucket indices with ln(1+count) values, the standard
    * linear-classifier featurization over [[hashedNgramCounts]]. */
  def sparseNgramFeatures(df: DataFrame, idCol: String, textCol: String,
                          buckets: Int): DataFrame =
    hashedNgramCounts(df, idCol, textCol, buckets)
      .groupBy(col("__id"))
      .agg(sort_array(collect_list(struct(col("b").cast("int").as("b"),
        log(lit(1.0) + col("c")).as("v")))).as("f"))
      .select(col("__id").as(idCol),
        col("f.b").as("idx"), col("f.v").as("vals"))

  /** Train a LOGISTIC quality filter that separates `target` (label 1)
    * from `background` (label 0) on hashed n-gram features — the
    * fastText-style classifier gate (GPT-3/LLaMA-lineage "looks like
    * high-quality reference text" filter), here trained by the in-repo
    * distributed elastic-net solver on the SAME featurization DSIR uses,
    * so the two curation signals are directly comparable.
    *
    * The sparse path never densifies: [[graft.ml.SgdNet.fitSparse]]
    * accumulates weighted moments over each row's nonzeros only.
    * Returns the fitted [[graft.ml.SgdNetModel]] (full lambda path). */
  def trainQualityFilter(background: DataFrame, target: DataFrame,
                         idCol: String, textCol: String,
                         buckets: Int = 4096,
                         params: graft.ml.SgdNetParams =
                           graft.ml.SgdNetParams(family = "binomial",
                             lambda = Array(0.001))): graft.ml.SgdNetModel = {
    val bg = sparseNgramFeatures(background, idCol, textCol, buckets)
      .withColumn("__y", lit(0.0))
    val tg = sparseNgramFeatures(target, idCol, textCol, buckets)
      .withColumn("__y", lit(1.0))
    graft.ml.SgdNet.fitSparse(bg.unionAll(tg), "idx", "vals", buckets,
      "__y", params)
  }

  /** Score documents with a trained quality filter: (idCol, score) with
    * score = P(target-like) at the model's LAST lambda (the least-
    * penalized fit). One narrow codegen'd sparse-dot pass. */
  def qualityFilterScores(model: graft.ml.SgdNetModel, df: DataFrame,
                          idCol: String, textCol: String,
                          buckets: Int): DataFrame = {
    val feats = sparseNgramFeatures(df, idCol, textCol, buckets)
    val last = model.lambda.length - 1
    model.predictSparse(feats, "idx", "vals", tpe = "response",
        lambdaIdxs = Seq(last))
      .select(col(idCol), col(s"pred_$last").as("score"))
  }

  /** Leave-one-out target encoding of a categorical feature against a
    * binary label — the leakage-safe categorical encoder for
    * downstream models. Because the label is binary, every row's LOO
    * value is determined by its (category, y) pair, so the output is
    * the DISTINCT encoding table (category, y, n_cat, sum_y, enc) —
    * tiny, joinable back to rows by (cat, y) — not a per-row rewrite.
    * enc = (sum_y − y + m·prior) / (n_cat − 1 + m) with smoothing m
    * toward the global prior; counts are exact, the two divisions are
    * the only doubles, mirrored by the oracle. */
  def targetEncode(df: DataFrame, catCol: String, labelCol: org.apache.spark.sql.Column,
                   smoothing: Double = 10.0, outDigits: Int = 6): DataFrame = {
    val base = df.filter(col(catCol).isNotNull)
      .select(col(catCol).as("category"), labelCol.cast("long").as("y"))
    val perCat = base.groupBy("category")
      .agg(count(lit(1)).as("n_cat"), sum(col("y")).as("sum_y"))
    val global = base.agg(count(lit(1)).as("n_all"), sum(col("y")).as("s_all"))
    perCat
      .join(base.select("category", "y").distinct(), Seq("category"))
      .crossJoin(broadcast(global))
      .select(col("category"), col("y"), col("n_cat"), col("sum_y"),
        round(
          (col("sum_y").cast("double") - col("y").cast("double")
            + lit(smoothing) * (col("s_all").cast("double") / col("n_all").cast("double")))
            / (col("n_cat").cast("double") - lit(1.0) + lit(smoothing)),
          outDigits).as("enc"))
      .orderBy("category", "y")
  }

  /** Weight of evidence and information value of a bounded-cardinality
    * feature bucket against a binary label — the classic credit-risk /
    * feature-screening statistic. Per bucket b: WoE = ln((bad_b·Good)
    * / (good_b·Bad)) and iv_term = (bad_b/Bad − good_b/Good)·WoE,
    * where Good/Bad are the global class totals; Σ iv_term is the
    * feature's IV. One grouped count pass; buckets where either class
    * is absent are omitted (the standard zero-cell rule — apply your
    * own smoothing upstream if you need those buckets). Counts exact;
    * each output double rounds once, so there is no cross-engine
    * float-sum ordering anywhere. */
  def woeIv(df: DataFrame, bucketCol: org.apache.spark.sql.Column,
            labelCol: org.apache.spark.sql.Column,
            outDigits: Int = 6): DataFrame = {
    val base = df.select(bucketCol.as("bucket"), labelCol.cast("long").as("y"))
      .filter(col("bucket").isNotNull)
    val perBucket = base.groupBy("bucket")
      .agg(sum(lit(1L) - col("y")).as("good"), sum(col("y")).as("bad"))
    val totals = perBucket.agg(sum(col("good")).as("g_all"), sum(col("bad")).as("b_all"))
    def dd(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    perBucket.filter(col("good") > 0 && col("bad") > 0)
      .crossJoin(broadcast(totals))
      .select(col("bucket"), col("good"), col("bad"),
        round(log((dd(col("bad")) * dd(col("g_all"))).cast("double")
          / (dd(col("good")) * dd(col("b_all"))).cast("double")), outDigits)
          .as("woe"),
        round((col("bad").cast("double") / col("b_all").cast("double")
          - col("good").cast("double") / col("g_all").cast("double"))
          * log((dd(col("bad")) * dd(col("g_all"))).cast("double")
            / (dd(col("good")) * dd(col("b_all"))).cast("double")), outDigits)
          .as("iv_term"))
      .orderBy("bucket")
  }

  /** Best single-feature binary split (DECISION STUMP): the threshold
    * on a cent-scaled numeric feature minimizing weighted Gini
    * impurity of a boolean label — the one-feature core of tree
    * induction, and the strongest single-split summary of "does this
    * feature separate the classes". Candidates are every distinct
    * feature value (left = x ≤ threshold); prefix class counts come
    * from one cumulative window over the DISTINCT-VALUE grid (bounded
    * by value cardinality, not rows — the quantile-grid shape), and
    * the Gini comparison is pure +,−,×,÷ on exact integral counts, so
    * both engines order candidates by IDENTICAL doubles (no
    * transcendental wobble); ties break to the smaller threshold.
    * Returns one row: (threshold_cents, n_left, pos_left, n_right,
    * pos_right, gini_split, gini_parent, gain). */
  def decisionStump(df: DataFrame, featureCol: String,
                    labelCond: org.apache.spark.sql.Column,
                    scaleDigits: Int = 2, outDigits: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val unit = math.pow(10, scaleDigits)
    val base = df.filter(col(featureCol).isNotNull)
      .select(round(col(featureCol).cast("double") * lit(unit))
        .cast("long").as("x"),
        labelCond.cast("boolean").cast("long").as("y"))
    val grid = base.groupBy("x")
      .agg(count(lit(1)).as("n"), sum(col("y")).as("p"))
    val tot = grid.agg(sum(col("n")).as("nn"), sum(col("p")).as("pp"))
    val wc = Window.orderBy("x")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = grid
      .withColumn("n1", sum(col("n")).over(wc))
      .withColumn("p1", sum(col("p")).over(wc))
      .crossJoin(broadcast(tot))
      .filter(col("n1") < col("nn"))   // the max value has no right side
      .withColumn("n2", col("nn") - col("n1"))
      .withColumn("p2", col("pp") - col("p1"))
    def gini(n: org.apache.spark.sql.Column, p: org.apache.spark.sql.Column) = {
      val pd = p.cast("double") / n.cast("double")
      val qd = (n - p).cast("double") / n.cast("double")
      lit(1.0) - pd * pd - qd * qd
    }
    val wg = (col("n1").cast("double") * gini(col("n1"), col("p1"))
      + col("n2").cast("double") * gini(col("n2"), col("p2"))) /
      col("nn").cast("double")
    val gp = gini(col("nn"), col("pp"))
    cum.withColumn("wg", wg).withColumn("gp", gp)
      .orderBy(col("wg"), col("x")).limit(1)
      .select(col("x").as("threshold_cents"),
        col("n1").as("n_left"), col("p1").as("pos_left"),
        col("n2").as("n_right"), col("p2").as("pos_right"),
        round(col("wg"), outDigits).as("gini_split"),
        round(col("gp"), outDigits).as("gini_parent"),
        round(col("gp") - col("wg"), outDigits).as("gain"))
  }
}
