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
  *
  * Two guards keep the recipe honest at scale:
  *   - pass 1 runs on at most minCount / MinLocalThreshold partitions
  *     (coalesced if needed) so the local threshold never degenerates to
  *     1 — with thousands of partitions and a modest minCount, a
  *     threshold of 1 would make every distinct token a candidate; if
  *     that cap would fall below the core count (tiny minCount), the
  *     operator skips SON for the plain exact shuffle agg instead of
  *     strangling the scan's parallelism;
  *   - the candidate set is probed against `maxCandidates` BEFORE being
  *     broadcast; past the cap (pruning has degenerated — e.g. a flat
  *     token distribution) the operator falls back to the plain exact
  *     shuffle aggregation instead of broadcasting a vocabulary-sized
  *     set to every executor.
  *
  * Both passes recompute the token explode — two cheap narrow scans —
  * rather than checkpointing a corpus-scale token materialization.
  */
object Frequent {

  /** Pass-1 local thresholds below this defeat the pruning; partitions
    * are coalesced to keep ceil(minCount / p) at or above it. */
  private val MinLocalThreshold = 8L

  /** Frequent whitespace tokens of a text column. */
  def heavyTokens(df: DataFrame, textCol: String, minCount: Long,
                  maxCandidates: Long = 1L << 20): DataFrame = {
    require(minCount >= 1, "minCount must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    // lazy on purpose: recomputed by each pass (narrow scans), never
    // materialized — a checkpoint here would be corpus-sized at scale
    val toks = df.select(explode(Dedup.words(col(textCol))).as("tok"))
    def plainExact: DataFrame =
      toks.groupBy(col("tok"))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= minCount)
    val p0 = math.max(toks.rdd.getNumPartitions, 1)
    val dp = math.max(spark.sparkContext.defaultParallelism, 1)
    val pCap = math.max(1L, minCount / MinLocalThreshold)
    val p = math.min(p0.toLong, pCap).toInt
    // A small minCount would coalesce pass 1 below the core count and
    // funnel the corpus scan through a handful of tasks — there the
    // plain exact shuffle agg IS the fast path (and with a threshold
    // that low, SON pruning barely prunes anyway).
    if (p < p0 && p < dp) return plainExact
    val pass1 = if (p < p0) toks.coalesce(p) else toks
    val local = (minCount + p - 1) / p // ceil(minCount / p)
    val cand = pass1.as[String].mapPartitions { it =>
      val m = new java.util.HashMap[String, Array[Long]]()
      it.foreach { t =>
        val c = m.get(t)
        if (c == null) m.put(t, Array(1L)) else c(0) += 1L
      }
      val out = Seq.newBuilder[String]
      m.forEach { (k, v) => if (v(0) >= local) out += k }
      out.result().iterator
    }.distinct().toDF("tok")
    // ONE bounded computation of the candidate set (limit cap + 1, so
    // the driver never holds more than the broadcast budget): the
    // collected array both answers the size probe and feeds the
    // broadcast join, instead of computing pass 1 twice. Deliberate
    // tradeoff vs a count()-gate: `cand` is NOT persisted (it would be
    // corpus-scale pressure for a set we expect to be small), so a
    // count-first gate would recompute the full pass-1 corpus scan on
    // the fast path — strictly worse than the one capped (≤ ~32 MB)
    // transfer this probe wastes in the rare degenerate-pruning case.
    val candArr = cand.limit(
      math.min(maxCandidates + 1, Int.MaxValue.toLong).toInt).collect()
    if (candArr.length > maxCandidates) {
      // pruning degenerated: exact answer via the plain shuffle agg
      plainExact
    } else {
      val candDf = candArr.map(_.getString(0)).toSeq.toDF("tok")
      toks.join(broadcast(candDf), Seq("tok"), "left_semi")
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= minCount)
    }
  }

  /** Pairwise association rules over (basket, item) rows — the
    * market-basket support/confidence/lift mining that powers
    * "documents tagged X also carry tag Y" curation diagnostics.
    *
    * For every DIRECTED item pair (a → b) co-occurring in at least
    * `minSupport` baskets:
    *   n_a, n_b    — baskets containing each item
    *   n_ab        — baskets containing both
    *   conf_ppm    — n_ab · 1e6 div n_a        (P(b | a))
    *   lift_ppm    — n_ab · N · 1e6 div (n_a · n_b)  (1e6 = independent)
    * All integral, so the table is engine-exact.
    *
    * Shape (100 TB): baskets dedupe to distinct (basket, item) — one
    * map-side-combined aggregation; the pair generation is ONE
    * self-equi-join on the basket key, bounded by `maxBasketSize`
    * (baskets past the cap are dropped whole before the join — a
    * degenerate mega-basket of b items would otherwise emit b² pairs);
    * item marginals join on the item key (left to AQE — broadcast when
    * the item vocabulary is small, shuffle when it isn't: the pair
    * table is keyed on items anyway). */
  def associationRules(df: DataFrame, basketCol: String, itemCol: String,
                       minSupport: Long = 2,
                       maxBasketSize: Int = 1024): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    require(maxBasketSize >= 2,
      s"maxBasketSize must be >= 2, got $maxBasketSize")
    val bi = df.filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("__bk"), col(itemCol).as("__it"))
      .distinct()
    val sized = bi.groupBy("__bk").agg(count(lit(1)).as("__sz"))
      .filter(col("__sz") <= maxBasketSize)
    val kept = bi.join(sized.select("__bk"), "__bk")
      .localCheckpoint(false) // marginals + pair join reuse
    val nBaskets = kept.select(col("__bk")).distinct().count()
    val marg = kept.groupBy(col("__it")).agg(count(lit(1)).as("__n"))
    val pairs = kept.select(col("__bk"), col("__it").as("ante"))
      .join(kept.select(col("__bk"), col("__it").as("cons")), "__bk")
      .filter(col("ante") =!= col("cons"))
      .groupBy(col("ante"), col("cons"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    pairs
      .join(marg.select(col("__it").as("ante"), col("__n").as("n_a")), "ante")
      .join(marg.select(col("__it").as("cons"), col("__n").as("n_b")), "cons")
      .select(col("ante"), col("cons"), col("n_a"), col("n_b"), col("n_ab"),
        expr("n_ab * 1000000 div n_a").as("conf_ppm"),
        // decimal: n_ab·N·1e6 can pass 2^63 on a billion-basket corpus
        expr(s"CAST(CAST(n_ab AS DECIMAL(38,0)) * $nBaskets * 1000000" +
          s" div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)")
          .as("lift_ppm"))
  }

  /** Count-Min sketch with an EXACT error audit: build a (depth ×
    * width) CM sketch of the token stream with deterministic md5-row
    * hashes (engine-portable, no seeds), then report, for the top-k
    * exact tokens, the sketch estimate (min over rows) next to the
    * true count and the overcount — the calibration run that tells
    * you what width a production sketch needs. The sketch itself is
    * ONE grouped aggregation into depth·width cells (bounded state at
    * any corpus size, the point of a CMS); the audit joins the tiny
    * top-k exact list against the broadcast-sized cell table. CMS
    * never undercounts, so `overcount >= 0` is an invariant. Returns
    * (token, exact_count, cms_estimate, overcount). */
  def countMinAudit(df: DataFrame, textCol: String, depth: Int = 3,
                    width: Int = 256, topK: Int = 20): DataFrame = {
    require(depth >= 1 && depth <= 8 && width >= 2, "bad sketch shape")
    val spark = df.sparkSession
    // row r hash: first 8 hex chars of md5(r || ':' || token) mod width
    def cell(r: Int) =
      expr(s"CAST(conv(substring(md5(concat('$r', ':', w)), 1, 8), 16, 10) " +
        s"AS BIGINT) % $width").as(s"c_$r")
    val toks = df.filter(col(textCol).isNotNull)
      .select(explode(Dedup.words(col(textCol))).as("w"))
      .localCheckpoint(false) // sketch + exact counts reuse one explode
    val cells = (0 until depth).map { r =>
      toks.select(lit(r).as("row"), cell(r).as("cellv"))
    }.reduce(_ unionAll _)
      .groupBy("row", "cellv").agg(count(lit(1)).as("cnt"))
    val exact = toks.groupBy("w").agg(count(lit(1)).as("exact_count"))
      .orderBy(desc("exact_count"), col("w")).limit(topK)
    val probes = (0 until depth).map { r =>
      exact.select(col("w"), col("exact_count"), lit(r).as("row"),
        cell(r).as("cellv"))
    }.reduce(_ unionAll _)
    probes
      .join(broadcast(cells), Seq("row", "cellv"))
      .groupBy(col("w").as("token"), col("exact_count"))
      .agg(min(col("cnt")).as("cms_estimate"))
      .select(col("token"), col("exact_count"), col("cms_estimate"),
        (col("cms_estimate") - col("exact_count")).as("overcount"))
      .orderBy(desc("exact_count"), col("token"))
  }

  /** HyperLogLog distinct-count sketch (Flajolet 2007) with
    * ENGINE-PORTABLE registers: the value hash is the top 60 bits of
    * md5 (the [[graft.ops.Dedup.simhash]] discipline — never an
    * engine-private hash), bucket = top p bits, register = max
    * leading-zero rank of the remaining w = 60−p bits. One
    * treeAggregate of element-wise register MAX — the sketch is
    * mergeable by construction, which is the whole point at 100 TB:
    * registers from per-partition/per-day sketches fold into corpus
    * totals without rescanning.
    *
    * Exactness: the harmonic denominator is reported as the INTEGER
    * Σ_j 2^(w+1−M_j) (each term a power of two; Σ ≤ 2^(p+w+1) fits a
    * Long), and the raw estimate α·m²·2^(w+1)/S is a fixed sequence
    * of IEEE ops on exact integers — any engine reproduces it
    * bit-for-bit. The standard small-range correction is applied for
    * the reported `est`: linear counting m·ln(m/V) when est_raw ≤
    * 2.5m and V = v_zero > 0 (the Flajolet decision rule; the one ln
    * rides the same cross-engine libm agreement every ln-encoded
    * oracle on this board already relies on at 4-6 dp). Returns one
    * row (p, m, v_zero, s_scaled, est_raw, est). */
  def hllSketch(df: DataFrame, valueCol: String, p: Int = 10): DataFrame = {
    // p >= 7 so the single alpha formula applies (m >= 128; smaller
    // sketches use tabulated constants the estimator doesn't carry)
    require(p >= 7 && p <= 20, "p must be in [7, 20]")
    val spark = df.sparkSession
    import spark.implicits._
    val m = 1 << p
    val w = 60 - p
    val regs = df.select(col(valueCol).cast("string").as("v"))
      .filter(col("v").isNotNull)
      .as[String]
      .mapPartitions { it =>
        val local = new Array[Byte](m)
        it.foreach { v =>
          val h = java.lang.Long.parseLong(
            graft.functions.TextKernels.md5Hex(v).substring(0, 15), 16)
          val bucket = (h >>> w).toInt
          val rest = h & ((1L << w) - 1L)
          val rank =
            if (rest == 0L) w + 1
            else w - (63 - java.lang.Long.numberOfLeadingZeros(rest))
          if (rank > local(bucket)) local(bucket) = rank.toByte
        }
        Iterator.single(local)
      }
      // treeAggregate, not Dataset.reduce: reduce throws on an empty
      // (zero-partition) input, while the fold's zero register array is
      // exactly the empty sketch (v_zero = m → linear counting → est 0)
      .rdd
      .treeAggregate(new Array[Byte](m))(
        (a, b) => {
          var i = 0
          while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
          a
        },
        (a, b) => {
          var i = 0
          while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
          a
        })
    var s = 0L
    var vZero = 0L
    var j = 0
    while (j < m) {
      s += 1L << (w + 1 - regs(j))
      if (regs(j) == 0) vZero += 1
      j += 1
    }
    val alpha = 0.7213 / (1.0 + 1.079 / m.toDouble)
    val raw = alpha * (m.toDouble * m.toDouble) *
      java.lang.Math.scalb(1.0, w + 1) / s.toDouble
    val est =
      if (raw <= 2.5 * m.toDouble && vZero > 0)
        m.toDouble * math.log(m.toDouble / vZero.toDouble)
      else raw
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    Seq((p, m, vZero, s, r4(raw), r4(est)))
      .toDF("p", "m", "v_zero", "s_scaled", "est_raw", "est")
  }

  // ---------------------------------------------------- per-group HLL

  /** Per-group HyperLogLog (round 15): one sketch row PER KEY — the
    * per-day/per-domain cardinality table a 100 TB corpus actually
    * needs, where [[hllSketch]] gives one corpus-global row. Same
    * engine-portable register arithmetic (60-bit md5 prefix, top-p-bit
    * bucket, leading-zero rank), but entirely in codegen'd column
    * expressions: one corpus-linear groupBy(keys, bucket) max-rank
    * aggregation (map-side combined), then a per-key rollup of the
    * occupied buckets — empty registers are counted, never
    * materialized, so state per key is min(distinct-hashes, m) rows at
    * any corpus size. Output per key: (keys..., p, m, v_zero,
    * s_scaled, est_raw, est) with the exact-integer harmonic
    * denominator and the same fixed IEEE estimate sequence as
    * [[hllSketch]] (register-exact oracle replay). */
  def hllSketchBy(df: DataFrame, keyCols: Seq[String], valueCol: String,
                  p: Int = 10): DataFrame = {
    val m = 1 << p
    val w = 60 - p
    val sparse = sparseRegisters(df, keyCols, valueCol, p)
    val keys = keyCols.map(col)
    val grouped = sparse.groupBy(keys: _*).agg(
      count(lit(1)).as("__occ"),
      sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${w + 1} - __mreg)")).as("__socc"))
    summaryCols(grouped
        .withColumn("v_zero", (lit(m.toLong) - col("__occ")).cast("long"))
        .withColumn("s_scaled",
          (col("__socc") + (lit(m.toLong) - col("__occ")) *
            lit(1L << (w + 1))).cast("long")),
      keyCols, p)
      .orderBy(keys: _*)
  }

  /** Per-group DENSE register arrays — the mergeable artifact for
    * incremental folding: sketch each partition/day separately with
    * this, fold with [[mergeHllRegisters]], summarize with
    * [[summarizeHllRegisters]] — union-equivalence is exact (register
    * max commutes with union), spec-pinned. One m-int array per key;
    * keep p modest (default 1024 registers) when keys are many. */
  def hllRegistersBy(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     p: Int = 10): DataFrame = {
    val m = 1 << p
    val keys = keyCols.map(col)
    sparseRegisters(df, keyCols, valueCol, p)
      .groupBy(keys: _*)
      .agg(map_from_entries(collect_list(struct(col("__bucket"),
        col("__mreg")))).as("__mp"))
      .withColumn("regs", expr(
        s"transform(sequence(0, ${m - 1}), i -> coalesce(element_at(__mp, i), 0))"))
      .select((keys :+ col("regs")): _*)
  }

  /** Element-wise register MAX across two per-key register frames
    * (full-outer on keys; a key absent from one side merges against the
    * empty sketch). Exactly the union sketch: HLL registers are a
    * max-fold, so merge(sketch(A), sketch(B)) == sketch(A ∪ B). */
  def mergeHllRegisters(a: DataFrame, b: DataFrame, keyCols: Seq[String],
                        p: Int = 10): DataFrame = {
    val m = 1 << p
    val zeroArr = array_repeat(lit(0), m)
    val keys = keyCols.map(col)
    val aa = a.select((keys :+ col("regs").as("__ra")): _*)
    val bb = b.select((keys :+ col("regs").as("__rb")): _*)
    aa.join(bb, keyCols, "full_outer")
      .withColumn("regs", zip_with(
        coalesce(col("__ra"), zeroArr), coalesce(col("__rb"), zeroArr),
        (x, y) => greatest(x, y)))
      .select((keys :+ col("regs")): _*)
  }

  /** [[hllRegistersBy]] arrays → the [[hllSketchBy]] summary row per
    * key (identical estimate arithmetic). */
  def summarizeHllRegisters(regsDf: DataFrame, keyCols: Seq[String],
                            p: Int = 10): DataFrame = {
    val w = 60 - p
    summaryCols(regsDf
        .withColumn("v_zero",
          expr("CAST(size(filter(regs, r -> r = 0)) AS BIGINT)"))
        .withColumn("s_scaled", expr(
          s"aggregate(regs, CAST(0 AS BIGINT), " +
            s"(acc, r) -> acc + shiftleft(CAST(1 AS BIGINT), ${w + 1} - r))")),
      keyCols, p)
      .orderBy(keyCols.map(col): _*)
  }

  /** Shared kernel: one row per occupied (keys..., bucket) with the max
    * leading-zero rank — the corpus-linear heavy pass of every
    * per-group HLL entry point. Null keys/values are excluded (a null
    * key is not a group; a null value is not an element). */
  private def sparseRegisters(df: DataFrame, keyCols: Seq[String],
                              valueCol: String, p: Int): DataFrame = {
    require(p >= 7 && p <= 20, "p must be in [7, 20]")
    require(keyCols.nonEmpty, "need at least one key column")
    val w = 60 - p
    val keys = keyCols.map(col)
    df.filter(keyCols.map(col(_).isNotNull).reduce(_ && _) &&
        col(valueCol).isNotNull)
      .select((keys :+ conv(substring(md5(col(valueCol).cast("string")), 1, 15),
        16, 10).cast("long").as("__hv")): _*)
      .withColumn("__bucket", shiftright(col("__hv"), w).cast("int"))
      .withColumn("__rest", col("__hv").bitwiseAND(lit((1L << w) - 1L)))
      .withColumn("__rank",
        when(col("__rest") === 0L, lit(w + 1))
          .otherwise(lit(w) - (length(bin(col("__rest"))) - lit(1)))
          .cast("int"))
      .groupBy((keys :+ col("__bucket")): _*)
      .agg(max(col("__rank")).as("__mreg"))
  }

  /** The fixed IEEE estimate sequence of [[hllSketch]] as columns over
    * per-key (v_zero, s_scaled) — alpha·m²·2^(w+1)/S raw, linear
    * counting m·ln(m/V) in the small range, 4-dp HALF_UP rounding. */
  private def summaryCols(grouped: DataFrame, keyCols: Seq[String],
                          p: Int): DataFrame = {
    val m = 1 << p
    val w = 60 - p
    val alpha = 0.7213 / (1.0 + 1.079 / m.toDouble)
    val raw = lit(alpha) * lit(m.toDouble * m.toDouble) *
      lit(java.lang.Math.scalb(1.0, w + 1)) / col("s_scaled").cast("double")
    val est = when(raw <= lit(2.5 * m.toDouble) && col("v_zero") > 0,
      lit(m.toDouble) * log(lit(m.toDouble) / col("v_zero").cast("double")))
      .otherwise(raw)
    grouped.select((keyCols.map(col) :+ lit(p).as("p") :+ lit(m).as("m") :+
      col("v_zero") :+ col("s_scaled") :+
      (round(raw, 4) + lit(0.0)).as("est_raw") :+
      (round(est, 4) + lit(0.0)).as("est")): _*)
  }
}
