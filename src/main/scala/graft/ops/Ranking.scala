package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Global ranking and quantile-bucket assignment with NO
  * single-partition window — the distributed answer to
  * `row_number() OVER (ORDER BY ...)` / `ntile(n)`, which Spark plans
  * as a one-task sort at any scale.
  *
  * The shape is the repo's standard two-pass range-partitioned rank
  * ([[Drift]], [[Packing]], the AUC ranks): range-partition + local
  * sort on the key, pass 1 collects per-partition row counts (tiny),
  * whose running sums give each partition its rank offset; pass 2
  * turns offset + local position into the global rank. Deterministic
  * ranks REQUIRE a total order — include a unique tiebreak column in
  * `sortCols` (engine-exactness dies with ties, exactly as it would
  * for any `row_number`). */
object Ranking {

  /** Input columns + `rank` (1-based, by `sortCols`) + `bucket`
    * (0 .. nBuckets-1, `((rank-1) * nBuckets) div n` — integral, so
    * bucket boundaries are engine-exact; bucket sizes differ by at
    * most one, matching SQL ntile only when n % nBuckets == 0 — the
    * floor-division contract is simpler and exact, and is what the
    * oracle replicates). */
  def globalRank(df: DataFrame, sortCols: Seq[Column],
                 nBuckets: Int = 10): DataFrame = {
    require(sortCols.nonEmpty, "need at least one sort column")
    require(nBuckets >= 1, "nBuckets must be >= 1")
    val spark = df.sparkSession
    val ranged = df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    // persisted, not unpersisted here: the returned frame still reads
    // it; RDD persists are reference-tracked and GC-freed (the Packing
    // prefix-sum idiom)
    val rdd = ranged.rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val partCounts = rdd.mapPartitionsWithIndex { (i, it) =>
      var c = 0L; it.foreach(_ => c += 1); Iterator((i, c))
    }.collect().sortBy(_._1)
    val n = math.max(partCounts.map(_._2).sum, 1L)
    val offsets = new Array[Long](math.max(rdd.getNumPartitions, 1))
    var acc = 0L
    partCounts.foreach { case (i, c) => offsets(i) = acc; acc += c }
    val bcOff = rdd.sparkContext.broadcast(offsets)
    val nb = nBuckets.toLong
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var r = bcOff.value(i)
      it.map { row =>
        r += 1
        Row.fromSeq(row.toSeq :+ r :+ ((r - 1) * nb) / n)
      }
    }
    spark.createDataFrame(out, StructType(ranged.schema.fields ++
      Seq(StructField("rank", LongType, nullable = false),
        StructField("bucket", LongType, nullable = false))))
  }

  /** Quantile NORMALIZATION across slices: replace each value with the
    * POOLED distribution's value at the equivalent within-slice rank
    * position — the classic cross-batch normalization (arrays,
    * per-source quality scores) that makes slice distributions
    * identical without assuming a parametric form. All-integral
    * selection variant: within-slice rank r of n_s maps to pooled
    * position ⌊r·N/(n_s+1)⌋+1 clamped to [1, N] (floor division on
    * positives — engine-exact, no interpolation). Shape: one keyed
    * rank window per slice + the two-pass range-partitioned
    * [[globalRank]] for the pooled order + one equi-join on position.
    * Returns (idCol, sliceCol, value_cents, norm_cents). */
  def quantileNormalize(df: DataFrame, sliceCol: String, valueCol: String,
                        idCol: String, scaleDigits: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val unit = math.pow(10, scaleDigits)
    val base = df.filter(col(valueCol).isNotNull && col(sliceCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), col(sliceCol).as("g"),
        round(col(valueCol).cast("double") * lit(unit)).cast("long").as("x"))
    val w = Window.partitionBy("g").orderBy(col("x"), col("id"))
    val ranked = base
      .withColumn("r", row_number().over(w))
      .withColumn("ns", count(lit(1)).over(Window.partitionBy("g")))
    val pooled = globalRank(base.select(col("x"), col("id")),
        Seq(col("x"), col("id")))
      .select(col("x").as("px"), col("rank").as("pr"))
    val n = base.count()
    val pos = ranked.withColumn("nn", lit(n))
      .withColumn("pos",
        least(greatest(expr("r * nn div (ns + 1)") + 1, lit(1L)), lit(n)))
    pos.join(pooled, pos("pos") === pooled("pr"))
      .select(col("id").as(idCol), col("g").as(sliceCol),
        col("x").as("value_cents"), col("px").as("norm_cents"))
  }

  /** DOMAIN-CALIBRATED percentile rank: percent_rank of `sortCols`
    * within each `groupCol` — makes a raw quality/length/perplexity
    * score comparable ACROSS domains ("keep each domain's top 20%"
    * instead of one global threshold that wipes out whole domains).
    * `sortCols` must be a total order (unique tiebreak) for
    * engine-exact ranks; percent_rank = (rank-1)/(n-1) is then an
    * exact rational.
    *
    * Shape: one keyed window per group — state bounded by group size
    * (the `rolling`/per-key discipline); for a single giant group use
    * [[globalRank]] + arithmetic instead. */
  def groupPercentRank(df: DataFrame, groupCol: Column,
                       sortCols: Seq[Column]): DataFrame = {
    require(sortCols.nonEmpty, "need at least one sort column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(sortCols: _*)
    df.withColumn("pct_rank", percent_rank().over(w))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) — the hybrid-search
    * combiner: each ranker contributes 1/(k + rank) per candidate and
    * the fused score is the sum, so scale-incompatible score spaces
    * (BM25 vs cosine) fuse on RANKS alone. Input frames are candidate
    * lists `(queryCol, idCol, rankCol)` whose size the PRODUCER bounds
    * (an ANN top-k, a BM25 top-n via [[globalRank]]) — fusion adds no
    * unbounded state of its own.
    *
    * Shape: union of the candidate lists → ONE (query, id) groupBy
    * (map-side combined) → a per-QUERY window over candidate-bounded
    * rows for the fused rank. Determinism: integer ranks make each
    * contribution an exact IEEE division; ties in the fused score break
    * by id. `n_rankers` reports how many lists each survivor came from
    * (the usual hybrid-search diagnostic). */
  def rrfFuse(rankers: Seq[DataFrame], queryCol: String, idCol: String,
              rankCol: String, kRrf: Int = 60, topN: Int = 10): DataFrame = {
    require(rankers.nonEmpty, "need at least one ranker")
    require(kRrf >= 1 && topN >= 1, "kRrf and topN must be >= 1")
    val uni = rankers.map { df =>
      df.select(col(queryCol).cast("long").as("query_id"),
        col(idCol).cast("long").as("doc_id"),
        col(rankCol).cast("long").as("__r"))
    }.reduce(_ unionAll _)
    val fused = uni.groupBy("query_id", "doc_id")
      .agg(sum(lit(1.0) / (lit(kRrf.toDouble) + col("__r"))).as("rrf"),
        count(lit(1)).as("n_rankers"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("rrf").desc, col("doc_id"))
    fused.withColumn("fused_rank", row_number().over(w))
      .filter(col("fused_rank") <= topN)
      .select("query_id", "doc_id", "rrf", "n_rankers", "fused_rank")
  }

  /** Bradley–Terry preference-strength ranking from pairwise outcomes
    * (Hunter 2004 MM) — the model behind RLHF preference data and
    * pairwise eval harnesses ("which source/model wins head-to-head"):
    * P[i beats j] = s_i / (s_i + s_j), fit by the MM fixed point
    * s_i ← w_i / Σ_j n_ij / (s_i + s_j), normalized to mean 1 each
    * round.
    *
    * Scale shape: wins and per-pair game counts aggregate DISTRIBUTED
    * (two map-side-combined groupBys over the pair stream — the only
    * corpus-sized work); the MM loop runs on the driver over the
    * ITEM-BOUNDED count table (items are models/sources/policies —
    * thousands at most; `maxItems` makes the bound explicit).
    *
    * Engine-exactness: every MM round runs in INTEGER micro-units
    * (strengths ppm, mean 1e6) with floor division at two fixed points
    * — denominator terms n·1e12 div (s_i + s_j) and the normalized
    * update u·k·1e6 div Σu — so the whole trajectory is exact integer
    * arithmetic any engine reproduces bit-for-bit (the quantization
    * perturbs strengths O(1e-6) relative per round, far below ranking
    * resolution). Items that never win have exact strength 0 (the MLE
    * boundary). Returns (item, wins, games, strength_ppm) sorted by
    * strength desc, item asc. */
  def bradleyTerry(pairs: DataFrame, winnerCol: String, loserCol: String,
                   iters: Int = 15, maxItems: Int = 1024): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val spark = pairs.sparkSession
    import spark.implicits._
    val pw = pairs.select(col(winnerCol).cast("string").as("w"),
      col(loserCol).cast("string").as("l"))
      .filter(col("w") =!= col("l"))
      .localCheckpoint(false) // item gate + wins + games re-read the stream
    // the gate runs BEFORE any driver collect: distinct-item count is
    // one cheap aggregation, and it bounds the pair-count table at
    // <= maxItems^2 rows
    val nItems = pw.select(explode(array(col("w"), col("l"))).as("i"))
      .agg(countDistinct(col("i"))).head().getLong(0)
    require(nItems >= 2, "need at least two distinct items")
    require(nItems <= maxItems,
      s"bradleyTerry item set is gated at $maxItems (got $nItems): " +
        "the MM loop holds the item-pair count table on the driver")
    val winRows = pw.groupBy("w").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val gameRows = pw.select(least(col("w"), col("l")).as("a"),
        greatest(col("w"), col("l")).as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val items = gameRows.flatMap(g => Seq(g._1, g._2)).distinct.sorted
    val idx = items.zipWithIndex.toMap
    val k = items.length
    val wins = items.map(i => BigInt(winRows.getOrElse(i, 0L)))
    val games = gameRows.map { case (a, b, n) => (idx(a), idx(b), BigInt(n)) }
    val gamesPerItem = new Array[Long](k)
    games.foreach { case (a, b, n) =>
      gamesPerItem(a) += n.toLong; gamesPerItem(b) += n.toLong
    }
    val U = BigInt(1000000L)            // 1.0 in micro-units
    val SC = BigInt(1000000000000L)     // 1e12 div scale
    var s = Array.fill(k)(U)
    for (_ <- 1 to iters) {
      val den = Array.fill(k)(BigInt(0))
      games.foreach { case (a, b, n) =>
        val tot = s(a) + s(b)
        if (tot > 0) {
          val t = n * SC / tot
          den(a) += t; den(b) += t
        }
      }
      val u = Array.tabulate(k)(i =>
        if (den(i) > 0) wins(i) * SC / den(i) else BigInt(0))
      val uSum = u.sum
      s = if (uSum > 0) u.map(_ * BigInt(k) * U / uSum) else u
    }
    items.indices.map { i =>
      (items(i), winRows.getOrElse(items(i), 0L), gamesPerItem(i),
        s(i).toLong)
    }.toDF("item", "wins", "games", "strength_ppm")
      .orderBy(desc("strength_ppm"), col("item"))
  }
}
