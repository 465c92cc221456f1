package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Data selection under a token budget: keep the best-ranked rows whose
  * cumulative cost still fits the budget — the curation step behind
  * "train on the top-quality N tokens" recipes (greedy prefix of the
  * quality ranking).
  *
  * The cumulative cost runs as the same TWO-PASS range-partitioned
  * prefix sum as [[Packing.concatChunk]]: range-partition on the rank
  * order, per-partition totals to the driver (one long per partition),
  * broadcast cumulative offsets — never a single-partition window.
  * Partitions whose offset already exceeds the budget short-circuit.
  * Costs are integers, so the prefix sums are exact and
  * engine-portable. `orderCols` must be a TOTAL order (add an id
  * tiebreak): with ties, the row choice at the budget boundary is
  * otherwise engine-defined.
  */
object Curation {

  /** Rows (in any output order) whose inclusive cumulative cost in
    * `orderCols` order is <= `budget`, with a `cum_before` column
    * (cost mass strictly before the row; null costs count as 0). */
  def selectByBudget(df: DataFrame, orderCols: Seq[Column], costCol: Column,
                     budget: Long): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val spark = df.sparkSession
    val withCost = df.withColumn("__cost", costCol.cast("long"))
    val ranged = withCost.repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val schema = ranged.schema
    val ci = schema.fieldIndex("__cost")
    val rdd = ranged.rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = rdd.mapPartitionsWithIndex { (i, it) =>
      var s = 0L
      it.foreach { r => if (!r.isNullAt(ci)) s += r.getLong(ci) }
      Iterator((i, s))
    }.collect().sortBy(_._1)
    val offsets = new Array[Long](math.max(rdd.getNumPartitions, 1))
    var acc = 0L
    totals.foreach { case (i, s) => offsets(i) = acc; acc += s }
    val bcOff = spark.sparkContext.broadcast(offsets)
    val b = budget
    val kept = rdd.mapPartitionsWithIndex { (i, it) =>
      var cum = bcOff.value(i)
      if (cum > b) Iterator.empty
      else it.flatMap { r =>
        val c = if (r.isNullAt(ci)) 0L else r.getLong(ci)
        val before = cum
        cum += c
        if (before + c <= b) Some(Row.fromSeq(r.toSeq :+ before)) else None
      }
    }
    spark.createDataFrame(kept, schema.add("cum_before", LongType))
      .drop("__cost")
  }

  /** PER-GROUP budgeted selection — the step that turns
    * [[graft.ops.Sampling.temperatureBudgets]]' per-domain token
    * budgets into actual document picks: within each group, keep the
    * greedy prefix of the `orderCols` ranking whose inclusive
    * cumulative cost fits that group's budget. `budgets` is one row
    * per group (a domain table — tiny, broadcast).
    *
    * Shape: one keyed window per group for the cumulative cost (state
    * bounded by group size, the `rolling` discipline — for one
    * enormous ungrouped corpus use [[selectByBudget]]'s two-pass
    * machinery instead) + a broadcast join against the budget table.
    * Integer costs keep the prefix sums engine-exact; `orderCols` must
    * total-order within each group (id tiebreak). */
  def selectByGroupBudget(df: DataFrame, groupCol: Column,
                          orderCols: Seq[Column], costCol: Column,
                          budgets: DataFrame, budgetGroupCol: String,
                          budgetCol: String): DataFrame = {
    require(orderCols.nonEmpty, "need at least one order column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(orderCols: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val b = budgets.select(col(budgetGroupCol).as("__g"),
      col(budgetCol).cast("long").as("__budget"))
    df.withColumn("__cost", costCol.cast("long"))
      .withColumn("__cum", sum(col("__cost")).over(w))
      .join(broadcast(b), groupCol === col("__g"))
      .filter(col("__cum") <= col("__budget"))
      .drop("__g", "__budget", "__cost", "__cum")
  }

  /** EFFECTIVE token accounting per group: raw tokens vs tokens after
    * exact dedup (keep = smallest id per content hash) — the corpus
    * bookkeeping that answers "how many tokens does this source REALLY
    * contribute", the number that budget and mixture math must use
    * instead of the raw count (duplicated boilerplate inflates raw
    * counts 2-10× on web crawls).
    *
    * One [[Dedup.exact]] hash aggregation, one keep-side semi-join,
    * two grouped sums. All integer: `dedup_ratio_ppm = effective·1e6
    * div raw`. */
  def effectiveTokens(df: DataFrame, idCol: String, groupCol: String,
                      textCol: String): DataFrame = {
    val toks = df.select(col(idCol), col(groupCol),
        TextAnalysis.wsTokenCount(col(textCol)).cast("long").as("__t"))
      .filter(col("__t").isNotNull)
      .localCheckpoint(false) // raw + kept sides reuse
    val keep = Dedup.exact(df, idCol, Seq(textCol))
      .select(col("keep_id").as(idCol))
    val raw = toks.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("__t")).as("raw_tokens"))
    val kept = toks.join(keep, Seq(idCol), "left_semi")
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_kept"), sum(col("__t")).as("effective_tokens"))
    raw.join(kept, Seq(groupCol), "left")
      .select(col(groupCol), col("n_docs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        col("raw_tokens"),
        coalesce(col("effective_tokens"), lit(0L)).as("effective_tokens"),
        when(col("raw_tokens") > 0,
          expr("coalesce(effective_tokens, 0) * 1000000 div raw_tokens"))
          .as("dedup_ratio_ppm"))
  }

  /** Empirical-Bayes (beta-binomial) smoothing of per-key success
    * rates — the standard fix for "this domain has 2/2 good docs, is
    * it really 100%?" before rates feed mixture or keeper decisions.
    * The beta prior is fitted by method of moments on the FLOORED-PPM
    * per-key rates (exact integer moments → two doubles), so the fit
    * is deterministic on any engine; each key's smoothed rate is then
    * (s + α) / (t + α + β). Degenerate fits (zero between-key
    * variance, or variance at the binomial bound) DISABLE smoothing:
    * (α, β) = (0, 0) makes the smoothed rate the raw per-key rate s/t
    * (mirrored by the q_eb_smooth oracle) — there is no global-mean
    * shrinkage in that regime. One grouped count pass + one moment
    * rollup.
    * Returns (key, trials, successes, raw_ppm, alpha, beta,
    * smoothed). */
  def ebSmoothRates(df: DataFrame, keyCol: String,
                    successCol: org.apache.spark.sql.Column,
                    outDigits: Int = 6): DataFrame = {
    val perKey = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("t"), sum(successCol.cast("long")).as("s"))
      .withColumn("r_ppm", expr("s * 1000000 div t"))
      .localCheckpoint(false) // key rows + moment rollup reuse
    val m = perKey.agg(count(lit(1)).cast("decimal(38,0)").as("k"),
      sum(col("r_ppm").cast("decimal(38,0)")).as("sr"),
      sum(col("r_ppm").cast("decimal(38,0)")
        * col("r_ppm").cast("decimal(38,0)")).as("srr")).head()
    val kk = BigDecimal(m.getDecimal(0))
    val sr = BigDecimal(m.getDecimal(1))
    val srr = BigDecimal(m.getDecimal(2))
    require(kk > 0, "no keys")
    // population moments of the ppm rates; the double conversions are
    // the first inexact step and the oracle mirrors them
    val mean = sr.toDouble / kk.toDouble / 1e6
    val variance = (kk * srr - sr * sr).toDouble / (kk * kk).toDouble / 1e12
    val mm = mean * (1.0 - mean)
    val (alpha, beta) =
      if (variance <= 0.0 || variance >= mm) (0.0, 0.0) // fallback: no prior
      else {
        val c = mm / variance - 1.0
        (mean * c, (1.0 - mean) * c)
      }
    def r6(c: org.apache.spark.sql.Column) = round(c, outDigits)
    perKey.select(col("key"), col("t").as("trials"), col("s").as("successes"),
      col("r_ppm").as("raw_ppm"),
      r6(lit(alpha)).as("alpha"), r6(lit(beta)).as("beta"),
      r6((col("s").cast("double") + lit(alpha))
        / (col("t").cast("double") + lit(alpha) + lit(beta))).as("smoothed"))
      .orderBy("key")
  }

  /** DoReMi-style domain reweighting (Xie et al. 2023's
    * exponentiated-gradient core): one EG step over the mixture —
    * w_d ∝ share_d · exp(eta · (score_d − max_d score_d)) — where
    * share_d is each domain's document share and score_d its mean
    * per-doc signal (excess loss, quality, staleness…). The max
    * subtraction is the standard log-sum-exp stabilizer and cancels
    * in the normalization. `smooth` mixes the result back toward
    * uniform ((1−smooth)·w + smooth/k, the DoReMi u-smoothing).
    *
    * Shape: ONE grouped aggregation (map-side combined) to the
    * domain-bounded table, then driver arithmetic over ≤ `maxDomains`
    * rows. Determinism: shares are integral ppm; the normalization
    * denominator folds in SORTED domain order so any engine replays
    * the double sum. Returns (domain, n_docs, share_ppm, mean_score,
    * weight) sorted by domain. */
  def domainReweight(df: DataFrame, domainCol: String, scoreCol: Column,
                     eta: Double, smooth: Double = 0.0,
                     maxDomains: Int = 4096,
                     outDigits: Int = 6): DataFrame = {
    require(eta > 0, "eta must be positive")
    require(smooth >= 0 && smooth < 1, "smooth must be in [0, 1)")
    val spark = df.sparkSession
    import spark.implicits._
    // avg over an INTEGRAL score column is exact on any engine (exact
    // sum / count, one division) — callers pass integral signals
    // (chars, cents, ppm) for bit-stable means
    val rows = df.filter(col(domainCol).isNotNull)
      .groupBy(col(domainCol).cast("string").as("d"))
      .agg(count(lit(1)).as("n"), avg(scoreCol).as("m"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    require(rows.nonEmpty, "no domains")
    require(rows.length <= maxDomains,
      s"domainReweight is gated at $maxDomains domains (got ${rows.length})")
    val total = rows.map(_._2).sum
    val maxM = rows.map(_._3).max
    val k = rows.length
    val u = rows.map { case (_, n, m) =>
      (n.toDouble / total.toDouble) * math.exp(eta * (m - maxM))
    }
    var denom = 0.0
    u.foreach(denom += _) // sorted-domain fold order, oracle-replayable
    def rd(x: Double) = BigDecimal(x)
      .setScale(outDigits, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    rows.indices.map { i =>
      val (d, n, m) = rows(i)
      val w = (1.0 - smooth) * (u(i) / denom) + smooth / k.toDouble
      (d, n, n * 1000000L / total, rd(m), rd(w))
    }.toDF("domain", "n_docs", "share_ppm", "mean_score", "weight")
      .orderBy("domain")
  }
}
