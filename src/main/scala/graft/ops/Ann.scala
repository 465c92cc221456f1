package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * - [[bruteForceTopK]] is the exact baseline: broadcast the (small) query
  *   set against the corpus — one broadcast join, no shuffle of the corpus,
  *   per-query top-k via aggregation. Exact at any corpus size as long as
  *   the QUERY set is broadcastable.
  * - [[lshTopK]] is the scale path: random-hyperplane signatures bucket
  *   the corpus; queries probe only their buckets (L tables). The corpus
  *   shuffle is on (table, bucket) keys; candidates per query are bounded
  *   by bucket sizes, not corpus size.
  */
object Ann {

  /** Engine-portable Rademacher (±1) hyperplanes: entry (t, b, j) is +1
    * iff the first md5 nibble of "t|b|j" is odd. Sign-random-projection
    * with ±1 entries has the same locality guarantees as gaussian planes
    * (Achlioptas-style sparse projections), and any engine with md5 can
    * reproduce the buckets — which is how the DuckDB oracle verifies
    * [[lshTopK]] end-to-end. */
  def planesMd5(dim: Int, tables: Int, bits: Int): Array[Array[Array[Double]]] =
    Array.tabulate(tables, bits, dim) { (t, b, j) =>
      val nib = Integer.parseInt(
        graft.functions.TextKernels.md5Hex(s"$t|$b|$j").substring(0, 1), 16)
      if ((nib & 1) == 1) 1.0 else -1.0
    }

  /** Exact top-k cosine neighbors for each query row.
    * `queries` must be small (broadcast). Returns
    * (query_id, neighbor_id, rank, cos). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        graft.functions.GraftFunctions.cosine(corpus.sparkSession, col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** ColBERT-style LATE-INTERACTION retrieval (Khattab & Zaharia 2020,
    * arXiv:2004.12832): queries and documents are BAGS of vectors
    * (one per token/chunk), and a document's score for a query is
    * MaxSim — the sum over query vectors of each one's best dot
    * against the document's vectors. Captures fine-grained term
    * matching that single-vector cosine blurs away; the standard
    * second-stage ranker between ANN shortlisting and a cross-encoder.
    *
    * Execution shape: the (bounded) query vector set broadcasts; the
    * corpus vector table streams through ONE codegen-dot projection
    * and two grouped aggregations (max per query vector, then the
    * MaxSim sum) — the corpus never shuffles by more than its
    * (query, doc) score grid, and map-side combine reduces the dot
    * stream before the exchange. Per-query top-k is a
    * WindowGroupLimit-bounded rank, ties broken by doc id.
    *
    * Cross-engine discipline: each dot rounds once to `scaleDigits`
    * and becomes an integral micro-unit long, so the max and the sum
    * are ORDER-FREE integer aggregates (double summation order never
    * leaks into the result); the score converts back to a double at
    * the end. Returns (query_id, doc_id, rank, maxsim). */
  def maxSimTopK(docVecs: DataFrame, queryVecs: DataFrame,
                 docIdCol: String, queryIdCol: String, vecCol: String,
                 k: Int, scaleDigits: Int = 6): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = docVecs.sparkSession
    val unit = math.pow(10, scaleDigits)
    val q = queryVecs.select(col(queryIdCol).as("query_id"),
      monotonically_increasing_id().as("__qpos"),
      col(vecCol).cast("array<double>").as("qv"))
    val d = docVecs.select(col(docIdCol).as("doc_id"),
      col(vecCol).cast("array<double>").as("dv"))
    val dots = d.crossJoin(broadcast(q))
      .select(col("query_id"), col("doc_id"), col("__qpos"),
        round(graft.functions.GraftFunctions.dot(spark, col("qv"), col("dv")),
          scaleDigits).as("dot"))
      .withColumn("__u", round(col("dot") * lit(unit)).cast("long"))
    val perQueryVec = dots.groupBy("query_id", "doc_id", "__qpos")
      .agg(max(col("__u")).as("__m"))
    val scores = perQueryVec.groupBy("query_id", "doc_id")
      .agg(sum(col("__m")).as("__s"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__s").desc, col("doc_id"))
    scores.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rank"),
        (col("__s").cast("double") / lit(unit)).as("maxsim"))
  }

  /** MAXIMAL MARGINAL RELEVANCE diversification (Carbonell & Goldstein
    * 1998): greedily re-select `k` results per query from a bounded
    * candidate shortlist, each step taking the candidate maximizing
    * lambda*relevance - (1-lambda)*max-cosine-to-already-selected —
    * the standard redundancy killer between retrieval and a RAG
    * context window.
    *
    * Execution shape: ONE groupByKey over the query id; each group is
    * the (contract-bounded, <= maxCandidates) shortlist, and the
    * greedy loop runs inside the group kernel in O(k * n * dim) with
    * incrementally-maintained max-sim — no driver collection, queries
    * parallelize across the cluster.
    *
    * Cross-engine discipline: relevance and pairwise cosines round
    * once to micro-units, lambda arrives as PPM, and the objective
    * lambdaPpm*rel_u - (1e6-lambdaPpm)*maxSim_u is EXACT long
    * arithmetic — the argmax (ties -> smaller doc id) is deterministic
    * on any engine, and the emitted `mmr_u` objective is integral.
    * With nothing selected yet the redundancy term is 0, so step one
    * is pure relevance. Returns (query_id, rank, doc_id, mmr_u). */
  def mmrSelect(cands: DataFrame, queryCol: String, idCol: String,
                relCol: String, vecCol: String, k: Int,
                lambdaPpm: Int = 500000,
                maxCandidates: Int = 4096): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(lambdaPpm >= 0 && lambdaPpm <= 1000000,
      "lambdaPpm must be in [0, 1e6]")
    val spark = cands.sparkSession
    import spark.implicits._
    val lp = lambdaPpm.toLong
    val rows = cands.select(col(queryCol).cast("long"), col(idCol).cast("long"),
        col(relCol).cast("double"), col(vecCol).cast("array<double>"))
      .as[(Long, Long, Double, Array[Double])]
    rows.groupByKey(_._1)
      .flatMapGroups { (q, it) =>
        val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
        val relU = scala.collection.mutable.ArrayBuffer.empty[Long]
        val vecs = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
        // HALF_UP micro-unit rounding — matches SQL round() (half away
        // from zero), not rint's half-even
        def u6(x: Double): Long = BigDecimal(x * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        it.foreach { e =>
          ids += e._2
          relU += u6(e._3)
          vecs += e._4
        }
        require(ids.length <= maxCandidates,
          s"mmrSelect: ${ids.length} candidates for query $q exceed " +
            s"maxCandidates=$maxCandidates — shortlist upstream (top-N per query)")
        val n = ids.length
        // micro-unit cosine, same sequential-fold arithmetic as the
        // codegen CosineSimilarity expression
        def cosU(a: Array[Double], b: Array[Double]): Long = {
          val m = math.min(a.length, b.length)
          var dot = 0.0; var na = 0.0; var nb = 0.0
          var i = 0
          while (i < m) {
            dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
            i += 1
          }
          val denom = math.sqrt(na) * math.sqrt(nb)
          if (denom == 0) 0L
          else BigDecimal(dot / denom * 1e6)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        }
        val taken = new Array[Boolean](n)
        // MinValue = "nothing selected yet" sentinel: the redundancy
        // term is 0 with an empty selected set, but once anything is
        // selected the true (possibly NEGATIVE) max similarity counts —
        // clamping at 0 would hide anti-correlated diversity wins
        val maxSimU = Array.fill(n)(Long.MinValue)
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long, Long)]
        var step = 0
        val kk = math.min(k, n)
        while (step < kk) {
          var best = -1
          var bestObj = Long.MinValue
          var i = 0
          while (i < n) {
            if (!taken(i)) {
              val m = if (maxSimU(i) == Long.MinValue) 0L else maxSimU(i)
              val obj = lp * relU(i) - (1000000L - lp) * m
              if (best < 0 || obj > bestObj ||
                (obj == bestObj && ids(i) < ids(best))) {
                best = i; bestObj = obj
              }
            }
            i += 1
          }
          taken(best) = true
          out += ((q, step + 1, ids(best), bestObj))
          i = 0
          while (i < n) {
            if (!taken(i)) {
              val c = cosU(vecs(i), vecs(best))
              if (c > maxSimU(i)) maxSimU(i) = c
            }
            i += 1
          }
          step += 1
        }
        out.iterator
      }
      .toDF("query_id", "rank", "doc_id", "mmr_u")
  }

  /** HARD-NEGATIVE MINING for contrastive training: from a ranked
    * candidate list `(query_id, neighbor_id, rank, ...)` (any ANN
    * producer here — brute, LSH, IVF, PQ, IVFPQ), drop each query's
    * labeled positives and re-rank what remains, keeping the top `k`
    * most-similar non-positives — the "closest wrong answers" batch
    * builders sample. Pure composition: one left-anti equi-join on
    * (query, id) + a per-query window over the candidate-bounded
    * survivors. The candidate list must carry enough slack to survive
    * exclusion (ask the producer for k + max positives per query).
    *
    * `positives` is (queryCol, idCol)-shaped; extra columns ignored. */
  def hardNegatives(candidates: DataFrame, positives: DataFrame,
                    queryCol: String, idCol: String, rankCol: String,
                    k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val pos = positives.select(col(queryCol).cast("long").as("__pq"),
      col(idCol).cast("long").as("__pi"))
    val surv = candidates.join(pos,
      col(queryCol).cast("long") === col("__pq") &&
        col(idCol).cast("long") === col("__pi"), "left_anti")
    val w = Window.partitionBy(col(queryCol))
      .orderBy(col(rankCol).asc)
    surv.withColumn("neg_rank", row_number().over(w))
      .filter(col("neg_rank") <= k)
  }

  /** EXACT-COSINE RERANK of an ANN candidate shortlist — the second
    * stage of two-stage retrieval: a cheap index (IVFPQ / LSH / IVF)
    * recalls a generous shortlist of m candidates per query, then the
    * TRUE metric re-scores only those m rows. `candidates` is any
    * (queryCol, candCol) frame from any producer; extra columns are
    * dropped. Vectors re-attach via ONE candidate-sized equi-join
    * against the corpus (the corpus itself never re-scans beyond that
    * join's probe side) and the query vectors broadcast; per-query
    * top-k is the WindowGroupLimit rank filter. At 100 TB the join is
    * shuffle-hash on the id — candidate volume is queries × m,
    * independent of corpus size.
    *
    * The shortlist is defensively normalized — self-pairs dropped and
    * duplicate (query, candidate) pairs collapsed — so a producer that
    * emits the query itself or overlapping candidate sets (e.g. a union
    * of two recall routes) can't surface the query as its own neighbor
    * or repeat a neighbor inside top-k. */
  def rerank(candidates: DataFrame, corpus: DataFrame, queries: DataFrame,
             idCol: String, vecCol: String, queryCol: String,
             candCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val cand = candidates.select(col(queryCol).cast("long").as("query_id"),
      col(candCol).cast("long").as("neighbor_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .distinct()
    val c = corpus.select(col(idCol).cast("long").as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val q = queries.select(col(idCol).cast("long").as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val scored = cand.join(c, "neighbor_id").join(broadcast(q), "query_id")
      .withColumn("cos", graft.functions.GraftFunctions.cosine(
        corpus.sparkSession, col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  // -------------------------------------------------- driver-side k-means

  private def sqdist(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0
    var j = 0
    while (j < a.length) { val t = a(j) - b(j); d += t * t; j += 1 }
    d
  }

  private[ops] def nearestCell(v: Array[Double], centers: Array[Array[Double]]): Int = {
    var best = 0
    var bd = Double.MaxValue
    var c = 0
    while (c < centers.length) {
      val d = sqdist(v, centers(c))
      if (d < bd) { bd = d; best = c }
      c += 1
    }
    best
  }

  /** Lloyd's k-means with k-means++ seeding, run driver-side on a bounded
    * sample (the coarse quantizer only needs a sample — the FAISS
    * training recipe; a distributed iterative fit would cost one Spark
    * job per iteration for a 16-row result). */
  private[ops] def kmeansFit(xs: Array[Array[Double]], k: Int, seed: Long,
                             maxIter: Int = 20): Array[Array[Double]] = {
    require(xs.nonEmpty, "k-means sample is empty")
    val rnd = new scala.util.Random(seed)
    val n = xs.length
    val kk = math.min(k, n)
    val dim = xs(0).length
    val centers = Array.ofDim[Array[Double]](kk)
    centers(0) = xs(rnd.nextInt(n)).clone()
    val d2 = Array.fill(n)(Double.MaxValue)
    for (c <- 1 until kk) {
      var i = 0
      while (i < n) {
        val d = sqdist(xs(i), centers(c - 1))
        if (d < d2(i)) d2(i) = d
        i += 1
      }
      var r = rnd.nextDouble() * d2.sum
      var idx = 0
      while (idx < n - 1 && r > d2(idx)) { r -= d2(idx); idx += 1 }
      centers(c) = xs(idx).clone()
    }
    val assign = Array.fill(n)(-1)
    var changed = true
    var iter = 0
    while (changed && iter < maxIter) {
      changed = false
      var i = 0
      while (i < n) {
        val a = nearestCell(xs(i), centers)
        if (a != assign(i)) { assign(i) = a; changed = true }
        i += 1
      }
      val sums = Array.ofDim[Double](kk, dim)
      val cnt = new Array[Int](kk)
      i = 0
      while (i < n) {
        val a = assign(i)
        cnt(a) += 1
        var j = 0
        while (j < dim) { sums(a)(j) += xs(i)(j); j += 1 }
        i += 1
      }
      var c = 0
      while (c < kk) {
        if (cnt(c) > 0) {
          var j = 0
          while (j < dim) { centers(c)(j) = sums(c)(j) / cnt(c); j += 1 }
        }
        c += 1
      }
      iter += 1
    }
    centers
  }

  /** IVF (inverted-file) approximate top-k: a k-means coarse quantizer
    * partitions the corpus into `nlist` cells; each query probes its
    * `nprobe` nearest cells only. The quantizer trains driver-side on a
    * bounded deterministic sample (FAISS recipe — sample-train, then ONE
    * distributed assignment pass over the corpus instead of one Spark
    * job per k-means iteration); per-query work is bounded by the probed
    * cells, not corpus size — the standard billion-scale ANN layout,
    * expressed as Spark joins.
    */
  /** Bounded deterministic training sample: the rows with the SMALLEST
    * id hash (TakeOrdered, one pass). Ordering by raw id would bias the
    * quantizer to a corpus prefix whenever ids correlate with content
    * (time- or source-ordered ingestion). The sample collects to the
    * DRIVER (the FAISS train-on-sample recipe), so its size is budgeted
    * in BYTES, not rows: at 1536-dim doubles, 65536 rows is ~0.8 GB of
    * heap — maxTrainBytes rescales the row cap by the actual dimension
    * (default 256 MB of vectors). */
  /** `validateDim` runs against the corpus dimension BEFORE the driver
    * collect, so shape errors (e.g. PQ's dim % m) fail in milliseconds
    * instead of after sampling up to `maxTrainBytes` of vectors. */
  private def trainSample(corpus: DataFrame, idCol: String, vecCol: String,
                          minRows: Long, maxTrainSample: Int,
                          maxTrainBytes: Long,
                          validateDim: Int => Unit = _ => ()): Array[Array[Double]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val vecs = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("neighbor_id"),
        col(vecCol).cast("array<double>").as("cv"))
    val first = vecs.select(size(col("cv"))).limit(1).collect()
    require(first.nonEmpty,
      s"ANN training corpus is empty (no non-null '$vecCol' rows)")
    val dim = first(0).getInt(0)
    validateDim(dim)
    val budgetRows = math.max(minRows,
      maxTrainBytes / math.max(8L * dim, 1L)).min(maxTrainSample).toInt
    vecs
      .orderBy(graft.ops.Sampling.hashBucket(col("neighbor_id")), col("neighbor_id"))
      .limit(budgetRows)
      .as[(Long, Array[Double])].collect().map(_._2)
  }

  /** Train the IVF coarse quantizer (sampled k-means) and return its
    * centroid table — the reusable index artifact. Persist with
    * [[saveIvfIndex]]; score with [[ivfTopKFixed]]. */
  def trainIvf(corpus: DataFrame, idCol: String, vecCol: String,
               nlist: Int = 16, seed: Long = 42L, maxTrainSample: Int = 65536,
               maxTrainBytes: Long = 256L << 20): Array[Array[Double]] =
    kmeansFit(trainSample(corpus, idCol, vecCol, nlist * 8L,
      maxTrainSample, maxTrainBytes), nlist, seed)

  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
              seed: Long = 42L, maxTrainSample: Int = 65536,
              maxTrainBytes: Long = 256L << 20): DataFrame = {
    val centers = trainIvf(corpus, idCol, vecCol, nlist, seed,
      maxTrainSample, maxTrainBytes)
    ivfTopKFixed(corpus, queries, idCol, vecCol, k, centers, nprobe)
  }

  /** [[ivfTopK]] with CALLER-SUPPLIED coarse centroids — the
    * engine-portable variant (assignment, probing and scoring are pure
    * argmin/cosine arithmetic over the given centroid table, so another
    * engine reproduces the result exactly; `q_ann_ivf`'s DuckDB oracle
    * does). Production indexing should prefer [[ivfTopK]]'s sampled
    * k-means; this entry point also serves index REUSE — score against
    * a quantizer trained once elsewhere.
    *
    * BOUNDED-QUERY contract: the query set collects to the driver (the
    * interactive/micro-batch serving shape). For batch loads where the
    * query side is itself corpus-sized, use [[ivfTopKJoin]] (no
    * collect) or [[ivfTopKAuto]] (explicit count gate). */
  def ivfTopKFixed(corpus: DataFrame, queries: DataFrame, idCol: String,
                   vecCol: String, k: Int, centers: Array[Array[Double]],
                   nprobe: Int = 4): DataFrame = {
    require(centers.nonEmpty, "need at least one centroid")
    val spark = corpus.sparkSession
    import spark.implicits._
    val vecs = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("neighbor_id"),
        col(vecCol).cast("array<double>").as("cv"))
    val bcC = spark.sparkContext.broadcast(centers)
    // single assignment pass: cell id per corpus row (typed kernel — a
    // tight argmin loop; no iterative distributed fitting)
    val cells = vecs.as[(Long, Array[Double])]
      .map { case (id, v) => (id, v, nearestCell(v, bcC.value)) }
      .toDF("neighbor_id", "cv", "cell")
    // driver-side: nprobe nearest centroids per query (centroid table is tiny)
    val q = queries.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .as[(Long, Array[Double])].collect()
    val probes = q.flatMap { case (qid, qv) =>
      // stable sort: exact distance ties resolve to the lower cell id,
      // matching the oracle's ORDER BY dist, cid
      centers.zipWithIndex.map { case (c, i) => (sqdist(qv, c), i) }
        .sortBy(_._1).take(nprobe).map { case (_, cell) => (qid, qv, cell) }
    }
    val probeDf = spark.createDataset(probes.toSeq).toDF("query_id", "qv", "cell")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cells.join(broadcast(probeDf), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        graft.functions.GraftFunctions.cosine(spark, col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** [[ivfTopKFixed]] with a DISTRIBUTED query side — the batch-load
    * variant for query sets too large to collect (full-corpus
    * reprocessing, query = corpus joins). The query frame is never
    * collected: the (tiny) centroid table broadcasts and each executor
    * computes its queries' nprobe cells in a typed flatMap; candidates
    * come from an equi-join of the (query, cell) probe rows against the
    * cell-assigned corpus. Result-identical to [[ivfTopKFixed]] (same
    * probe arithmetic, same (cos desc, id) tie-break).
    *
    * Scale shape: both sides shuffle on the cell key — skew is bounded
    * by the largest (cell population × queries probing it); production
    * nlist should grow with the corpus (the usual ~sqrt(n) sizing), which
    * simultaneously bounds cell sizes and spreads the join. Per-query
    * top-k is a key-partitioned window, never a global sort. */
  def ivfTopKJoin(corpus: DataFrame, queries: DataFrame, idCol: String,
                  vecCol: String, k: Int, centers: Array[Array[Double]],
                  nprobe: Int = 4): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(nprobe >= 1, "nprobe must be >= 1")
    require(centers.nonEmpty, "need at least one centroid")
    val spark = corpus.sparkSession
    import spark.implicits._
    val bcC = spark.sparkContext.broadcast(centers)
    val cells = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("neighbor_id"),
        col(vecCol).cast("array<double>").as("cv"))
      .as[(Long, Array[Double])]
      .map { case (id, v) => (id, v, nearestCell(v, bcC.value)) }
      .toDF("neighbor_id", "cv", "cell")
    // executor-side probe pass: same stable (dist, cell) order as the
    // driver path, so results are identical down to ties
    val probeRows = queries.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .as[(Long, Array[Double])]
      .flatMap { case (qid, qv) =>
        val cs = bcC.value
        cs.zipWithIndex.map { case (c, i) => (sqdist(qv, c), i) }
          .sortBy(_._1).take(nprobe).map { case (_, cell) => (qid, qv, cell) }
      }
      .toDF("query_id", "qv", "cell")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cells.join(probeRows, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        graft.functions.GraftFunctions.cosine(spark, col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** Gated IVF scoring: the driver ADC path ([[ivfTopKFixed]] — fastest
    * for the common bounded query set) below `maxDriverQueries`, the
    * join-based probe ([[ivfTopKJoin]]) above it. The gate is an
    * explicit count of the query frame — the
    * [[graft.ops.Dedup.connectedComponents]] cutover pattern: driver
    * participation is always bounded by construction, never by hope. */
  def ivfTopKAuto(corpus: DataFrame, queries: DataFrame, idCol: String,
                  vecCol: String, k: Int, centers: Array[Array[Double]],
                  nprobe: Int = 4,
                  maxDriverQueries: Long = 1L << 16): DataFrame = {
    // materialize the (projected) query frame ONCE: the gate count and
    // the chosen path both read the checkpointed blocks, so an
    // expensive derived query frame is computed a single time — and a
    // nondeterministic one cannot disagree between count and scoring
    val q = queries.filter(col(vecCol).isNotNull)
      .select(col(idCol), col(vecCol)).localCheckpoint(false)
    val n = q.count()
    if (n <= maxDriverQueries)
      ivfTopKFixed(corpus, q, idCol, vecCol, k, centers, nprobe)
    else ivfTopKJoin(corpus, q, idCol, vecCol, k, centers, nprobe)
  }

  /** Scalar twin of the `graft_cosine` codegen expression — the SAME
    * fused dot/norm loop and final division, so kernel and expression
    * routes produce bit-identical doubles. */
  @inline private def cosScalar(x: Array[Double], y: Array[Double]): Double = {
    val n = math.min(x.length, y.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xv = x(i); val yv = y(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Exact cosine top-k via a PARTITION-LOCAL bounded-selection kernel:
    * the (bounded, gated) query set broadcasts, the corpus streams
    * through each partition ONCE keeping a k-slot candidate set per
    * query, and only the per-partition winners (≤ parts·k rows per
    * query) reach the final rank — no |corpus|×|queries| row blowup
    * ever materializes (a broadcast nested-loop join builds exactly
    * that, interpreted, which measured ~10× slower at 2000×2000).
    * Selection order is (cos desc, neighbor_id asc) with cosines from
    * [[cosScalar]], so the output is bit-identical to
    * [[bruteForceTopK]]. */
  def bruteTopKKernel(corpus: DataFrame, queries: DataFrame, idCol: String,
                      vecCol: String, k: Int,
                      maxQueries: Long = 1L << 16): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val qRows = queries.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])].collect()
    require(qRows.length <= maxQueries,
      s"bruteTopKKernel query set is gated at $maxQueries (got " +
        s"${qRows.length}); use the IVF join path for unbounded queries")
    val bcQ = spark.sparkContext.broadcast(qRows)
    val kk = k
    val cand = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val q = bcQ.value
        val nq = q.length
        val hIds = Array.fill(nq)(new Array[Long](kk))
        val hCos = Array.fill(nq)(new Array[Double](kk))
        val hCnt = new Array[Int](nq)
        // "a is worse than b" under (cos desc, id asc)
        @inline def worse(c1: Double, i1: Long, c2: Double, i2: Long) =
          c1 < c2 || (c1 == c2 && i1 > i2)
        it.foreach { case (cid, cv) =>
          var qi = 0
          while (qi < nq) {
            if (q(qi)._1 != cid) {
              val c = cosScalar(q(qi)._2, cv)
              val cnt = hCnt(qi)
              if (cnt < kk) {
                hIds(qi)(cnt) = cid; hCos(qi)(cnt) = c; hCnt(qi) = cnt + 1
              } else {
                var w = 0; var j = 1
                while (j < cnt) {
                  if (worse(hCos(qi)(j), hIds(qi)(j), hCos(qi)(w),
                    hIds(qi)(w))) w = j
                  j += 1
                }
                if (worse(hCos(qi)(w), hIds(qi)(w), c, cid)) {
                  hCos(qi)(w) = c; hIds(qi)(w) = cid
                }
              }
            }
            qi += 1
          }
        }
        (0 until nq).iterator.flatMap { qi =>
          (0 until hCnt(qi)).iterator
            .map(j => (q(qi)._1, hIds(qi)(j), hCos(qi)(j)))
        }
      }.toDF("query_id", "neighbor_id", "cos")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kk)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** Mutual-kNN GRAPH over an embedding corpus: each vector's top-k
    * cosine neighbors as edges (src, dst, rank, cos, mutual), where
    * `mutual` marks edges whose reverse is also a top-k edge — the
    * standard densification input for graph clustering, SemDeDup-style
    * semantic grouping, and UMAP-ish neighborhood methods (mutual
    * edges are the high-precision core; one-way edges the recall
    * fringe). Small corpora (≤ `maxBruteRows`, explicit gate) run the
    * exact broadcast scan; larger corpora MUST pass trained IVF
    * `centers` and run the [[ivfTopKJoin]] bucketed probe — corpus ×
    * corpus never materializes, only cell-cohabiting pairs. The
    * mutual flag is one self-equi-join on the n·k edge table. */
  def knnGraph(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
               centers: Option[Array[Array[Double]]] = None,
               nprobe: Int = 4, maxBruteRows: Long = 1L << 14): DataFrame = {
    val base = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as(idCol), col(vecCol))
      .localCheckpoint(false)
    val topk = centers match {
      case Some(c) => ivfTopKJoin(base, base, idCol, vecCol, k, c, nprobe)
      case None =>
        val n = base.count()
        require(n <= maxBruteRows,
          s"knnGraph exact path is bounded to $maxBruteRows rows ($n " +
            "given); pass trained IVF centers for the bucketed path")
        bruteTopKKernel(base, base, idCol, vecCol, k, maxBruteRows)
    }
    val rev = topk.select(col("query_id").as("__rd"),
      col("neighbor_id").as("__rs"))
    topk.join(rev, col("query_id") === col("__rs") &&
        col("neighbor_id") === col("__rd"), "left")
      .select(col("query_id").as("src"), col("neighbor_id").as("dst"),
        col("rank"), col("cos"), col("__rs").isNotNull.as("mutual"))
  }

  /** PRE-FILTERED ANN: restrict the corpus by an arbitrary predicate
    * BEFORE searching, so every query still gets k results from the
    * eligible set (post-filtering an index probe under-fills whenever
    * the filter is selective — the classic filtered-search failure).
    * The predicate is applied to the corpus scan, so a narrow column
    * predicate stays pushdown-eligible all the way to parquet. With
    * trained `centers` the search runs the count-gated
    * [[ivfTopKAuto]] probe over the filtered corpus; without, the
    * exact broadcast scan (corpus streams, bounded queries
    * broadcast). */
  def filteredTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                   vecCol: String, k: Int,
                   pred: org.apache.spark.sql.Column,
                   centers: Option[Array[Array[Double]]] = None,
                   nprobe: Int = 4): DataFrame = {
    val c = corpus.filter(pred)
    centers match {
      case Some(ct) => ivfTopKAuto(c, queries, idCol, vecCol, k, ct, nprobe)
      case None     => bruteForceTopK(c, queries, idCol, vecCol, k)
    }
  }

  /** Product-quantization ANN (the PQ/ADC half of FAISS's IVFPQ): the
    * vector dimension splits into `m` subspaces; each subspace gets a
    * `ksub`-centroid k-means codebook trained driver-side on a bounded
    * sample; ONE distributed pass encodes every corpus vector to m small
    * codes (m*log2(ksub) bits instead of dim*64 — the memory layout that
    * makes billion-vector indexes fit). Queries precompute per-subspace
    * distance tables, so scoring a vector is m table lookups (asymmetric
    * distance computation), not a dim-length dot product.
    *
    * Distances are approximate squared L2; callers wanting cosine ranks
    * should pre-normalize (then L2^2 = 2 - 2cos, same order). The scan
    * keeps a bounded per-query heap PER PARTITION and only the partition
    * winners reach the final top-k — no corpus-sized shuffle. At 100 TB
    * combine with [[ivfTopK]]-style cell pruning; this operator is the
    * quantized-scoring building block.
    */
  /** Train PQ codebooks (one sampled k-means per subspace) and return
    * `codebooks(mi)(c)` — the reusable index artifact. Persist with
    * [[savePqIndex]]; score with [[pqTopKFixed]]. */
  def trainPq(corpus: DataFrame, idCol: String, vecCol: String,
              m: Int = 8, ksub: Int = 16, seed: Long = 42L,
              maxTrainSample: Int = 65536,
              maxTrainBytes: Long = 256L << 20): Array[Array[Array[Double]]] = {
    val sample = trainSample(corpus, idCol, vecCol, ksub * 8L,
      maxTrainSample, maxTrainBytes,
      validateDim = d =>
        require(d % m == 0, s"dim $d must divide into m=$m subspaces"))
    val dim = sample(0).length
    val sub = dim / m
    // one codebook per subspace (independent k-means — the PQ recipe)
    Array.tabulate(m) { mi =>
      kmeansFit(sample.map(v => java.util.Arrays.copyOfRange(v, mi * sub, (mi + 1) * sub)),
        ksub, seed + mi)
    }
  }

  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, k: Int, m: Int = 8, ksub: Int = 16,
             seed: Long = 42L, maxTrainSample: Int = 65536,
             maxTrainBytes: Long = 256L << 20): DataFrame = {
    val codebooks = trainPq(corpus, idCol, vecCol, m, ksub, seed,
      maxTrainSample, maxTrainBytes)
    pqTopKFixed(corpus, queries, idCol, vecCol, k, codebooks)
  }

  /** [[pqTopK]] with CALLER-SUPPLIED codebooks (`codebooks(mi)(c)` is
    * centroid `c` of subspace `mi`) — the engine-portable variant
    * (`q_ann_pq`'s DuckDB oracle replicates encode + ADC exactly), and
    * the index-reuse path: encode/score against codebooks trained once
    * elsewhere. Production training should prefer [[pqTopK]].
    *
    * BOUNDED-QUERY contract: the query set collects to the driver, and
    * unpruned PQ scans the whole corpus per query batch by design. For
    * corpus-sized query loads compose cell pruning with the distributed
    * probe instead — [[ivfpqTopKJoin]] is that path. */
  def pqTopKFixed(corpus: DataFrame, queries: DataFrame, idCol: String,
                  vecCol: String, k: Int,
                  codebooks: Array[Array[Array[Double]]]): DataFrame = {
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
      "codebooks must be non-empty per subspace")
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    val spark = corpus.sparkSession
    import spark.implicits._
    val vecs = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("neighbor_id"),
        col(vecCol).cast("array<double>").as("cv"))
    val ksub = codebooks(0).length
    val bcCB = spark.sparkContext.broadcast(codebooks)
    // ONE encoding pass: corpus vector -> m codes
    val codes = vecs.as[(Long, Array[Double])]
      .map { case (id, v) =>
        val cb = bcCB.value
        val c = new Array[Int](m)
        var mi = 0
        while (mi < m) {
          c(mi) = nearestCell(
            java.util.Arrays.copyOfRange(v, mi * sub, (mi + 1) * sub), cb(mi))
          mi += 1
        }
        (id, c)
      }
    // per-query ADC tables: table(mi)(code) = ||q_sub - centroid||^2
    val q = queries.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .as[(Long, Array[Double])].collect()
    val tables = q.map { case (qid, qv) =>
      (qid, Array.tabulate(m, ksub) { (mi, c) =>
        sqdist(java.util.Arrays.copyOfRange(qv, mi * sub, (mi + 1) * sub),
          bcCB.value(mi)(c))
      })
    }
    val bcT = spark.sparkContext.broadcast(tables)
    // partition-local bounded heaps: only numPartitions * |queries| * k
    // candidate rows ever shuffle
    val kk = k
    val cands = codes.mapPartitions { it =>
      import scala.jdk.CollectionConverters._
      val ts = bcT.value
      val nat = Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)
      // per query: heap holding the k best (dist, id), worst at the head
      val heaps = ts.map { case (qid, _) =>
        qid -> new java.util.PriorityQueue[(Double, Long)](
          math.max(kk, 1), nat.reverse)
      }.toMap
      it.foreach { case (id, code) =>
        ts.foreach { case (qid, tab) =>
          if (qid != id) {
            var d = 0.0
            var mi = 0
            while (mi < code.length) { d += tab(mi)(code(mi)); mi += 1 }
            val h = heaps(qid)
            val cand = (d, id)
            if (h.size < kk) h.add(cand)
            else if (nat.lt(cand, h.peek())) { h.poll(); h.add(cand) }
          }
        }
      }
      heaps.iterator.flatMap { case (qid, h) =>
        h.iterator().asScala.map { case (d, id) => (qid, id, d) }
      }
    }.toDF("query_id", "neighbor_id", "adist")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist"), col("neighbor_id"))
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "adist")
  }

  /** [[pqTopKFixed]] with a DISTRIBUTED query side — plain-PQ batch
    * scoring for query sets too large to collect. Plain PQ has no cell
    * key to join on (every query scans every code by design), so the
    * distributed shape INVERTS the driver path: the corpus codes — the
    * COMPRESSED corpus, m·log2(ksub) bits/vector, the artifact PQ
    * exists to make RAM-resident — broadcast once, and the query frame
    * streams through a mapPartitions that builds each query's ADC
    * table and scans the code block with a k-slot heap. Identical
    * summation order and (adist, neighbor_id) tie-break to
    * [[pqTopKFixed]], so results are bit-exact.
    *
    * GATED-corpus contract: the code block must fit a broadcast —
    * `maxCorpusCodes` (default 2^22 ≈ 4M codes, ~150 MB at m = 8)
    * bounds it EXPLICITLY and the call throws past the bound with the
    * fix spelled out: a corpus past broadcast size needs cell pruning,
    * which is [[ivfpqTopKJoin]] — the composed layout exists exactly
    * because plain PQ stops scaling here. */
  def pqTopKJoin(corpus: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, k: Int,
                 codebooks: Array[Array[Array[Double]]],
                 maxCorpusCodes: Long = 1L << 22): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
      "codebooks must be non-empty per subspace")
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    val ksub = codebooks(0).length
    val spark = corpus.sparkSession
    import spark.implicits._
    val bcCB = spark.sparkContext.broadcast(codebooks)
    // ONE encoding pass (the pqTopKFixed kernel), then a GATED collect
    // of the compressed codes: limit(max+1) bounds driver memory even
    // on the over-sized corpus that throws
    val codes = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("neighbor_id"),
        col(vecCol).cast("array<double>").as("cv"))
      .as[(Long, Array[Double])]
      .map { case (id, v) =>
        val cb = bcCB.value
        val c = new Array[Int](m)
        var mi = 0
        while (mi < m) {
          c(mi) = nearestCell(
            java.util.Arrays.copyOfRange(v, mi * sub, (mi + 1) * sub), cb(mi))
          mi += 1
        }
        (id, c)
      }
    val block = codes.limit((maxCorpusCodes + 1).min(Int.MaxValue).toInt)
      .collect()
    require(block.length <= maxCorpusCodes,
      s"pqTopKJoin corpus is gated at $maxCorpusCodes codes (got more): " +
        "plain PQ scans every code per query — past broadcast size use " +
        "the cell-pruned composed index (trainIvfPq + ivfpqTopKJoin)")
    val bcCodes = spark.sparkContext.broadcast(block)
    val kk = k
    val scored = queries.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        import scala.jdk.CollectionConverters._
        val cb = bcCB.value
        val cs = bcCodes.value
        val nat = Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)
        it.flatMap { case (qid, qv) =>
          // per-query ADC table — same arithmetic as the driver path
          val tab = Array.tabulate(m, ksub) { (mi, c) =>
            sqdist(java.util.Arrays.copyOfRange(qv, mi * sub, (mi + 1) * sub),
              cb(mi)(c))
          }
          val h = new java.util.PriorityQueue[(Double, Long)](
            math.max(kk, 1), nat.reverse)
          var i = 0
          while (i < cs.length) {
            val (id, code) = cs(i)
            if (id != qid) {
              // ascending-mi summation: bit-identical to pqTopKFixed
              var d = 0.0
              var mi = 0
              while (mi < code.length) { d += tab(mi)(code(mi)); mi += 1 }
              val cand = (d, id)
              if (h.size < kk) h.add(cand)
              else if (nat.lt(cand, h.peek())) { h.poll(); h.add(cand) }
            }
            i += 1
          }
          h.iterator().asScala.map { case (d, id) => (qid, id, d) }
        }
      }
      .toDF("query_id", "neighbor_id", "adist")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "adist")
  }

  // ------------------------------------------------------ IVFPQ (composed)

  /** Train the COMPOSED IVFPQ index (the FAISS `IVFx,PQy` layout): a
    * coarse k-means quantizer partitions space into `nlist` cells, and
    * PQ codebooks are trained on per-cell RESIDUALS (v − centroid(v)) —
    * residuals concentrate near the origin regardless of which cell a
    * vector lives in, so one shared set of codebooks quantizes every
    * cell far more accurately than raw-vector PQ at the same bit
    * budget. That residual encoding is what makes the billion-vector
    * layout work: cell pruning bounds the candidates, PQ codes bound
    * the memory (m·log2(ksub) bits/vector), and the two compose.
    * Returns (coarse centroids, residual codebooks); both persist with
    * the existing [[saveIvfIndex]]/[[savePqIndex]]. */
  def trainIvfPq(corpus: DataFrame, idCol: String, vecCol: String,
                 nlist: Int = 16, m: Int = 8, ksub: Int = 16,
                 seed: Long = 42L, maxTrainSample: Int = 65536,
                 maxTrainBytes: Long = 256L << 20)
      : (Array[Array[Double]], Array[Array[Array[Double]]]) = {
    val sample = trainSample(corpus, idCol, vecCol,
      math.max(nlist, ksub) * 8L, maxTrainSample, maxTrainBytes,
      validateDim = d =>
        require(d % m == 0, s"dim $d must divide into m=$m subspaces"))
    val centers = kmeansFit(sample, nlist, seed)
    val dim = sample(0).length
    val sub = dim / m
    // residuals of the SAME sample against the trained quantizer
    val residuals = sample.map { v =>
      val c = centers(nearestCell(v, centers))
      Array.tabulate(dim)(j => v(j) - c(j))
    }
    val codebooks = Array.tabulate(m) { mi =>
      kmeansFit(residuals.map(v =>
        java.util.Arrays.copyOfRange(v, mi * sub, (mi + 1) * sub)),
        ksub, seed + 1 + mi)
    }
    (centers, codebooks)
  }

  def ivfpqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, k: Int, nlist: Int = 16, m: Int = 8,
                ksub: Int = 16, nprobe: Int = 4, seed: Long = 42L,
                maxTrainSample: Int = 65536,
                maxTrainBytes: Long = 256L << 20): DataFrame = {
    val (centers, codebooks) = trainIvfPq(corpus, idCol, vecCol, nlist, m,
      ksub, seed, maxTrainSample, maxTrainBytes)
    ivfpqTopKFixed(corpus, queries, idCol, vecCol, k, centers, codebooks,
      nprobe)
  }

  /** [[ivfpqTopK]] with CALLER-SUPPLIED centroids + codebooks — the
    * engine-portable / index-reuse variant (`q_ann_ivfpq`'s DuckDB
    * oracle replicates assign → residual-encode → probe → ADC exactly).
    *
    * Scale shape: ONE distributed pass assigns each corpus vector to
    * its cell and residual-encodes it to m codes (the corpus is never
    * collected and its vectors never shuffle); per-query ADC tables are
    * built per PROBED CELL (the residual q − centroid(cell) differs per
    * cell, so each probed cell gets its own m×ksub table — still tiny:
    * |q|·nprobe·m·ksub doubles, broadcast); scoring scans only code
    * rows in probed cells with partition-local bounded heaps, so only
    * numPartitions·|q|·k candidate rows ever shuffle.
    *
    * BOUNDED-QUERY contract: the query set collects to the driver. For
    * corpus-sized query loads use [[ivfpqTopKJoin]] (distributed probe,
    * no collect) or [[ivfpqTopKAuto]] (explicit count gate). */
  def ivfpqTopKFixed(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int, centers: Array[Array[Double]],
                     codebooks: Array[Array[Array[Double]]],
                     nprobe: Int = 4): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(nprobe >= 1, "nprobe must be >= 1")
    require(centers.nonEmpty, "need at least one centroid")
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
      "codebooks must be non-empty per subspace")
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    val dim = centers(0).length
    require(dim == m * sub,
      s"centroid dim $dim != m*sub = ${m * sub} of the codebooks")
    val ksub = codebooks(0).length
    val spark = corpus.sparkSession
    import spark.implicits._
    val bcC = spark.sparkContext.broadcast(centers)
    val bcCB = spark.sparkContext.broadcast(codebooks)
    // ONE pass: cell assignment + residual PQ encoding per corpus row
    val codes = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("neighbor_id"),
        col(vecCol).cast("array<double>").as("cv"))
      .as[(Long, Array[Double])]
      .map { case (id, v) =>
        val cs = bcC.value; val cb = bcCB.value
        val cell = nearestCell(v, cs)
        val ctr = cs(cell)
        val r = new Array[Double](v.length)
        var j = 0
        while (j < v.length) { r(j) = v(j) - ctr(j); j += 1 }
        val code = new Array[Int](m)
        var mi = 0
        while (mi < m) {
          code(mi) = nearestCell(
            java.util.Arrays.copyOfRange(r, mi * sub, (mi + 1) * sub), cb(mi))
          mi += 1
        }
        (id, cell, code)
      }
    // driver-side: probed cells + per-(query, cell) residual ADC tables
    val q = queries.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .as[(Long, Array[Double])].collect()
    // probes(cell) -> [(qid, table)]: table(mi)(c) = ||(q-ctr)_mi - cb(mi)(c)||^2
    val probes: Map[Int, Array[(Long, Array[Array[Double]])]] = q.flatMap {
      case (qid, qv) =>
        centers.zipWithIndex.map { case (c, i) => (sqdist(qv, c), i) }
          .sortBy(_._1).take(nprobe) // stable: ties -> lower cell id
          .map { case (_, cell) =>
            val ctr = centers(cell)
            val qr = Array.tabulate(dim)(j => qv(j) - ctr(j))
            val tab = Array.tabulate(m, ksub) { (mi, c) =>
              sqdist(java.util.Arrays.copyOfRange(qr, mi * sub, (mi + 1) * sub),
                codebooks(mi)(c))
            }
            (cell, (qid, tab))
          }
    }.groupBy(_._1).map { case (cell, xs) => (cell, xs.map(_._2)) }
    val bcT = spark.sparkContext.broadcast(probes)
    val kk = k
    val cands = codes.mapPartitions { it =>
      import scala.jdk.CollectionConverters._
      val byCell = bcT.value
      val nat = Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)
      val heaps = scala.collection.mutable.HashMap
        .empty[Long, java.util.PriorityQueue[(Double, Long)]]
      it.foreach { case (id, cell, code) =>
        byCell.get(cell).foreach(_.foreach { case (qid, tab) =>
          if (qid != id) {
            var d = 0.0
            var mi = 0
            while (mi < code.length) { d += tab(mi)(code(mi)); mi += 1 }
            val h = heaps.getOrElseUpdate(qid,
              new java.util.PriorityQueue[(Double, Long)](
                math.max(kk, 1), nat.reverse))
            val cand = (d, id)
            if (h.size < kk) h.add(cand)
            else if (nat.lt(cand, h.peek())) { h.poll(); h.add(cand) }
          }
        })
      }
      heaps.iterator.flatMap { case (qid, h) =>
        h.iterator().asScala.map { case (d, id) => (qid, id, d) }
      }
    }.toDF("query_id", "neighbor_id", "adist")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist"), col("neighbor_id"))
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "adist")
  }

  /** [[ivfpqTopKFixed]] with a DISTRIBUTED query side — no query
    * collect, no driver-built ADC tables. The (tiny) centroid and
    * codebook tables broadcast; a typed flatMap over the query frame
    * computes, executor-side, each query's nprobe cells and the
    * per-(query, cell) residual ADC table (flattened m·ksub doubles);
    * scoring is an equi-join of those probe rows against the
    * residual-encoded corpus codes on the cell key, m table lookups per
    * candidate — identical arithmetic and identical (adist,
    * neighbor_id) tie-break to the driver path, so results match
    * exactly.
    *
    * Scale shape: the corpus is encoded in ONE pass and never
    * re-scanned per query; join volume is Σ_cells (cell population ×
    * queries probing the cell) — the inherent IVFPQ batch-scoring work.
    * Shuffle is on the cell key (size nlist; grow nlist ~sqrt(n) as the
    * corpus grows). Per-query top-k is a key-partitioned window. */
  def ivfpqTopKJoin(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, k: Int, centers: Array[Array[Double]],
                    codebooks: Array[Array[Array[Double]]],
                    nprobe: Int = 4): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(nprobe >= 1, "nprobe must be >= 1")
    require(centers.nonEmpty, "need at least one centroid")
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
      "codebooks must be non-empty per subspace")
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    val dim = centers(0).length
    require(dim == m * sub,
      s"centroid dim $dim != m*sub = ${m * sub} of the codebooks")
    val ksub = codebooks(0).length
    val spark = corpus.sparkSession
    import spark.implicits._
    val bcC = spark.sparkContext.broadcast(centers)
    val bcCB = spark.sparkContext.broadcast(codebooks)
    // same one-pass cell assignment + residual encoding as the driver path
    val codes = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("neighbor_id"),
        col(vecCol).cast("array<double>").as("cv"))
      .as[(Long, Array[Double])]
      .map { case (id, v) =>
        val cs = bcC.value; val cb = bcCB.value
        val cell = nearestCell(v, cs)
        val ctr = cs(cell)
        val r = new Array[Double](v.length)
        var j = 0
        while (j < v.length) { r(j) = v(j) - ctr(j); j += 1 }
        val code = new Array[Int](m)
        var mi = 0
        while (mi < m) {
          code(mi) = nearestCell(
            java.util.Arrays.copyOfRange(r, mi * sub, (mi + 1) * sub), cb(mi))
          mi += 1
        }
        (id, cell, code)
      }
      .toDF("neighbor_id", "cell", "code")
    // executor-side probe pass: nprobe cells + flattened residual ADC
    // table per (query, cell) — the structure the driver path builds on
    // the driver, computed where the query rows already live
    val probeTabs = queries.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .as[(Long, Array[Double])]
      .flatMap { case (qid, qv) =>
        val cs = bcC.value; val cb = bcCB.value
        cs.zipWithIndex.map { case (c, i) => (sqdist(qv, c), i) }
          .sortBy(_._1).take(nprobe) // stable: ties -> lower cell id
          .map { case (_, cell) =>
            val ctr = cs(cell)
            val qr = Array.tabulate(dim)(j => qv(j) - ctr(j))
            val tab = new Array[Double](m * ksub)
            var mi = 0
            while (mi < m) {
              var c = 0
              while (c < ksub) {
                tab(mi * ksub + c) = sqdist(
                  java.util.Arrays.copyOfRange(qr, mi * sub, (mi + 1) * sub),
                  cb(mi)(c))
                c += 1
              }
              mi += 1
            }
            (qid, cell, tab)
          }
      }
      .toDF("query_id", "cell", "tab")
    val scored = codes.join(probeTabs, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("tab"), col("code"))
      .as[(Long, Long, Array[Double], Array[Int])]
      .map { case (qid, nid, tab, code) =>
        // same ascending-mi summation order as the driver scorer, so
        // the float result is bit-identical
        var d = 0.0
        var mi = 0
        while (mi < code.length) { d += tab(mi * ksub + code(mi)); mi += 1 }
        (qid, nid, d)
      }
      .toDF("query_id", "neighbor_id", "adist")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "adist")
  }

  /** Gated IVFPQ scoring: driver ADC below `maxDriverQueries`
    * ([[ivfpqTopKFixed]]), join-based probe above ([[ivfpqTopKJoin]]) —
    * the [[ivfTopKAuto]] contract for the composed index. */
  def ivfpqTopKAuto(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, k: Int, centers: Array[Array[Double]],
                    codebooks: Array[Array[Array[Double]]],
                    nprobe: Int = 4,
                    maxDriverQueries: Long = 1L << 16): DataFrame = {
    // one materialization for gate + path (see ivfTopKAuto)
    val q = queries.filter(col(vecCol).isNotNull)
      .select(col(idCol), col(vecCol)).localCheckpoint(false)
    val n = q.count()
    if (n <= maxDriverQueries)
      ivfpqTopKFixed(corpus, q, idCol, vecCol, k, centers, codebooks,
        nprobe)
    else ivfpqTopKJoin(corpus, q, idCol, vecCol, k, centers, codebooks,
      nprobe)
  }

  /** LSH-bucketed approximate top-k: candidates share a bucket with the
    * query in at least one of `tables` hash tables.
    *
    * Bucketing is ONE typed-kernel pass emitting (id, vec, table, bucket)
    * rows — the previous plan unioned `tables` scan branches, each
    * computing `bits` interpreted HOF dot products per row. The corpus
    * side streams into a broadcast join on (table, bucket); candidate
    * pairs dedupe on ids AFTER the cosine (so the shuffle never carries
    * vector payloads). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, tables: Int = 8, bits: Int = 6): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val dim = corpus.filter(col(vecCol).isNotNull)
      .select(size(col(vecCol))).head().getInt(0)
    val pl = planesMd5(dim, tables, bits)
    val bcP = spark.sparkContext.broadcast(pl)
    // null vectors can't bucket — excluded, like the HOF formulation's
    // null-propagating signatures that never joined
    def bucketed(df: DataFrame, id: String): DataFrame =
      df.filter(col(vecCol).isNotNull)
        .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
        .as[(Long, Array[Double])]
        .flatMap { case (rid, v) =>
          val p = bcP.value
          (0 until p.length).iterator.map { t =>
            val tp = p(t)
            var sig = 0L
            var b = 0
            while (b < tp.length) {
              val plane = tp(b)
              var d = 0.0
              var j = 0
              while (j < v.length) { d += v(j) * plane(j); j += 1 }
              if (d > 0) sig |= (1L << b)
              b += 1
            }
            (rid, v, t, sig)
          }
        }
        .toDF(id, s"${id}_v", "table", "bucket")
    val cb = bucketed(corpus, "neighbor_id")
    val qb = bucketed(queries, "query_id")
    // cosine before the dedup: the group-by then shuffles only
    // (query_id, neighbor_id, cos) — never the vectors
    val cands = cb.join(broadcast(qb), Seq("table", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.GraftFunctions.cosine(spark,
          col("query_id_v"), col("neighbor_id_v")).as("cos"))
      .groupBy("query_id", "neighbor_id").agg(max(col("cos")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** MULTI-PROBE LSH top-k (Lv et al. 2007): besides its own bucket,
    * each QUERY also probes the buckets at Hamming distance 1 on its
    * first `probes` sign bits — the classic recall-for-tables trade
    * (one probe ≈ one extra table of recall at zero extra corpus
    * bucketing cost). Corpus-side work is IDENTICAL to [[lshTopK]];
    * only the broadcast query side fans out ×(1 + probes). The
    * candidate set is a superset of the single-probe set, so recall
    * can only improve (spec-pinned). Deterministic bit choice (lowest
    * `probes` positions) keeps the oracle mechanical. */
  def lshTopKMultiProbe(corpus: DataFrame, queries: DataFrame, idCol: String,
                        vecCol: String, k: Int, tables: Int = 8,
                        bits: Int = 6, probes: Int = 2): DataFrame = {
    require(probes >= 0 && probes <= bits,
      s"probes must be in [0, bits=$bits], got $probes")
    val spark = corpus.sparkSession
    import spark.implicits._
    val dim = corpus.filter(col(vecCol).isNotNull)
      .select(size(col(vecCol))).head().getInt(0)
    val pl = planesMd5(dim, tables, bits)
    val bcP = spark.sparkContext.broadcast(pl)
    def bucketed(df: DataFrame, id: String, nProbes: Int): DataFrame =
      df.filter(col(vecCol).isNotNull)
        .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
        .as[(Long, Array[Double])]
        .flatMap { case (rid, v) =>
          val p = bcP.value
          (0 until p.length).iterator.flatMap { t =>
            val tp = p(t)
            var sig = 0L
            var b = 0
            while (b < tp.length) {
              val plane = tp(b)
              var d = 0.0
              var j = 0
              while (j < v.length) { d += v(j) * plane(j); j += 1 }
              if (d > 0) sig |= (1L << b)
              b += 1
            }
            Iterator.single((rid, v, t, sig)) ++
              (0 until nProbes).iterator.map(pb => (rid, v, t, sig ^ (1L << pb)))
          }
        }
        .toDF(id, s"${id}_v", "table", "bucket")
    val cb = bucketed(corpus, "neighbor_id", 0)
    val qb = bucketed(queries, "query_id", probes)
    val cands = cb.join(broadcast(qb), Seq("table", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.GraftFunctions.cosine(spark,
          col("query_id_v"), col("neighbor_id_v")).as("cos"))
      .groupBy("query_id", "neighbor_id").agg(max(col("cos")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  // --------------------------------------------------- materialized layout

  /** MATERIALIZED cell-partitioned corpus layout: assign each vector to
    * its coarse cell ONCE and write `partitionBy(cell)` — searches then
    * read only probed cell DIRECTORIES (parquet partition pruning)
    * instead of re-assigning the whole corpus per query batch. This is
    * the serving-side half of the FAISS IVF recipe: the quantizer
    * ([[saveIvfIndex]]) is tiny and frozen; the corpus lives as a
    * cell-keyed table whose file layout IS the index. */
  def saveIvfLayout(corpus: DataFrame, idCol: String, vecCol: String,
                    centers: Array[Array[Double]], path: String,
                    mode: String = "overwrite"): Unit = {
    require(centers.nonEmpty, "need at least one centroid")
    val spark = corpus.sparkSession
    import spark.implicits._
    val bcC = spark.sparkContext.broadcast(centers)
    corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("vec"))
      .as[(Long, Array[Double])]
      .map { case (id, v) => (id, v, nearestCell(v, bcC.value)) }
      .toDF("id", "vec", "cell")
      .write.mode(mode).partitionBy("cell").parquet(path)
  }

  /** INCREMENTAL indexing: assign a new vector batch with the SAME
    * frozen quantizer and dynamic-partition-append it into the layout
    * — the daily-embedding-delta path. No retrain, no rewrite of
    * existing cells; existing files are untouched. */
  def appendIvfLayout(batch: DataFrame, idCol: String, vecCol: String,
                      centers: Array[Array[Double]], path: String): Unit =
    saveIvfLayout(batch, idCol, vecCol, centers, path, mode = "append")

  /** Search a [[saveIvfLayout]] table: probed cells resolve driver-side
    * against the tiny centroid table, and the `cell IN (...)` literal
    * filter becomes a parquet PartitionFilter — only probed cell
    * directories are ever read. Result semantics are identical to
    * [[ivfTopKFixed]] over the same corpus and centers.
    *
    * BOUNDED-QUERY contract (the [[bruteTopKKernel]] gate): the query
    * set collects to the driver to resolve the partition-pruning cell
    * list — `maxQueries` bounds that collect EXPLICITLY (limit-gated,
    * so even the over-sized call never materializes more than the
    * bound + 1 driver rows). Corpus-sized query loads belong on
    * [[ivfTopKJoin]] against the loaded layout table instead. */
  def ivfTopKFromLayout(spark: org.apache.spark.sql.SparkSession,
                        path: String, queries: DataFrame, idCol: String,
                        vecCol: String, k: Int,
                        centers: Array[Array[Double]],
                        nprobe: Int = 4,
                        maxQueries: Long = 1L << 16): DataFrame = {
    require(centers.nonEmpty, "need at least one centroid")
    import spark.implicits._
    val q = queries.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .as[(Long, Array[Double])]
      .limit((maxQueries + 1).min(Int.MaxValue).toInt).collect()
    require(q.length <= maxQueries,
      s"ivfTopKFromLayout query set is gated at $maxQueries (got more): " +
        "partition-pruned layout search collects queries driver-side — " +
        "route corpus-sized query loads through ivfTopKJoin over the " +
        "loaded layout table")
    val probes = q.flatMap { case (qid, qv) =>
      centers.zipWithIndex.map { case (c, i) => (sqdist(qv, c), i) }
        .sortBy(_._1).take(nprobe).map { case (_, cell) => (qid, qv, cell) }
    }
    val probedCells = probes.map(_._3).distinct.toSeq
    val probeDf = spark.createDataset(probes.toSeq)
      .toDF("query_id", "qv", "cell")
    val layout = spark.read.parquet(path)
      .filter(col("cell").isin(probedCells: _*))
      .select(col("id").as("neighbor_id"), col("vec").as("cv"), col("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    layout.join(broadcast(probeDf), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        graft.functions.GraftFunctions.cosine(spark, col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  // --------------------------------------------------- index persistence

  /** Persist a trained IVF quantizer (the FAISS write-index workflow:
    * train once, reuse across sessions). Layout: `<path>` parquet of
    * (cell, centroid). Restored by [[loadIvfIndex]] bit-exactly (doubles
    * round-trip exactly through parquet). */
  def saveIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                   centers: Array[Array[Double]],
                   overwrite: Boolean = true): Unit = {
    import spark.implicits._
    centers.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .repartition(1).write
      .mode(if (overwrite) "overwrite" else "errorifexists").parquet(path)
  }

  /** Restore an IVF quantizer persisted by [[saveIvfIndex]]. */
  def loadIvfIndex(spark: org.apache.spark.sql.SparkSession,
                   path: String): Array[Array[Double]] = {
    val rows = spark.read.parquet(path)
      .select(col("cell").cast("int"), col("centroid").cast("array<double>"))
      .collect().sortBy(_.getInt(0))
    require(rows.nonEmpty, s"empty IVF index at $path")
    require(rows.zipWithIndex.forall { case (r, i) => r.getInt(0) == i },
      s"non-contiguous cell ids in IVF index at $path")
    rows.map(_.getSeq[Double](1).toArray)
  }

  /** Persist trained PQ codebooks. Layout: `<path>` parquet of
    * (subspace, code, centroid). Restored by [[loadPqIndex]]. */
  def savePqIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                  codebooks: Array[Array[Array[Double]]],
                  overwrite: Boolean = true): Unit = {
    import spark.implicits._
    val rows = for {
      (cb, mi) <- codebooks.zipWithIndex
      (c, code) <- cb.zipWithIndex
    } yield (mi, code, c.toSeq)
    rows.toSeq.toDF("subspace", "code", "centroid")
      .repartition(1).write
      .mode(if (overwrite) "overwrite" else "errorifexists").parquet(path)
  }

  /** Restore PQ codebooks persisted by [[savePqIndex]]. */
  def loadPqIndex(spark: org.apache.spark.sql.SparkSession,
                  path: String): Array[Array[Array[Double]]] = {
    val rows = spark.read.parquet(path)
      .select(col("subspace").cast("int"), col("code").cast("int"),
        col("centroid").cast("array<double>"))
      .collect()
    require(rows.nonEmpty, s"empty PQ index at $path")
    val bySub = rows.groupBy(_.getInt(0)).toSeq.sortBy(_._1)
    require(bySub.zipWithIndex.forall { case ((mi, _), i) => mi == i },
      s"non-contiguous subspace ids in PQ index at $path")
    bySub.map { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      require(sorted.zipWithIndex.forall { case (r, i) => r.getInt(1) == i },
        s"non-contiguous code ids in PQ index at $path")
      sorted.map(_.getSeq[Double](2).toArray)
    }.toArray
  }

  /** Recall@k of an approximate neighbor table against exact ground
    * truth — the evaluation harness every ANN deployment tunes
    * against (nprobe / tables / bits sweeps read this number).
    *
    * Both inputs are (queryCol, neighborCol, …) tables from any
    * producer ([[bruteForceTopK]] as truth; [[lshTopK]] / [[ivfTopKJoin]]
    * / [[ivfpqTopKJoin]] / [[pqTopK]] as approx). Truth is taken as-is
    * (pass its top-k); recall divides hits by `k`, so a truth table
    * with fewer than k rows for a query (tiny corpus) caps that
    * query's recall below 1 — deliberate, it keeps the denominator
    * comparable across queries.
    *
    * Returns one row per truth query: (queryCol, n_true, n_hit,
    * recall). Queries the approx table missed entirely still appear
    * (recall 0). Shape: one equi-join on (query, neighbor) + one
    * grouped count — result-set-sized, never corpus-sized. */
  def recallAtK(approx: DataFrame, truth: DataFrame, k: Int,
                queryCol: String = "query_id",
                neighborCol: String = "neighbor_id"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val a = approx.select(col(queryCol).as("__q"), col(neighborCol).as("__n"))
      .distinct()
    val t = truth.select(col(queryCol).as("__q"), col(neighborCol).as("__n"))
      .distinct()
    val hits = t.join(a, Seq("__q", "__n"))
      .groupBy(col("__q")).agg(count(lit(1)).as("n_hit"))
    t.groupBy(col("__q")).agg(count(lit(1)).as("n_true"))
      .join(hits, Seq("__q"), "left")
      .select(col("__q").as(queryCol), col("n_true"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)).cast("double") / k).as("recall"))
  }
}
