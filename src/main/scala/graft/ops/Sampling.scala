package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data pipelines.
  *
  * `rand()`-based sampling is irreproducible across runs, engines, and
  * partitionings; these operators hash a stable row key with Knuth's
  * multiplicative hash (h = key * 2654435761 mod 2^32) and keep a row
  * iff h < frac * 2^32 — the same rows survive on any engine that can
  * do 64-bit integer arithmetic (which is how the DuckDB oracle verifies
  * them), on any cluster size, in any order. Pure narrow filters: no
  * shuffle, pushdown-friendly.
  */
object Sampling {

  private[ops] val KNUTH = 2654435761L
  private[ops] val MOD = 4294967296L  // 2^32
  private[ops] val RED = 2147483648L  // 2^31

  /** The [0, 2^32) hash bucket of a non-negative long key.
    *
    * The key is reduced mod 2^31 BEFORE the multiply so the product
    * (< 2^31 * 2654435761 ~ 5.7e18) never exceeds Long range: unguarded,
    * a key above ~3.5e9 would silently wrap in Spark but raise a BIGINT
    * overflow in engines that check (e.g. the DuckDB oracle) — breaking
    * the cross-engine contract exactly where it matters. Keys are
    * expected non-negative (row ids); pmod keeps the result lawful
    * either way. */
  def hashBucket(key: Column): Column =
    pmod(pmod(key.cast("long"), lit(RED)) * lit(KNUTH), lit(MOD))

  /** Keep ~`frac` of rows, selected deterministically by the key. */
  def sample(df: DataFrame, keyCol: Column, frac: Double): DataFrame = {
    require(frac >= 0 && frac <= 1, "sampling fraction must be in [0, 1]")
    df.filter(hashBucket(keyCol) < math.round(frac * MOD))
  }

  /** Mixture rebalancing: keep ~`targets(domain)` rows per domain,
    * deriving each domain's sampling rate from its OBSERVED count at
    * runtime — the domain-reweighting step of a training-data mixture
    * (e.g. "cap web crawl at 2B docs, keep all of wikipedia"). Domains
    * absent from `targets` are dropped; a target at or above the
    * observed count keeps the whole domain.
    *
    * The per-domain threshold is `min(2^32, (target * 2^32) div n)` —
    * PURE integer arithmetic (target * 2^32 ≤ ~9.2e18 fits a long for
    * targets up to ~2.1e9), so the kept set is engine-exact, unlike a
    * float rate whose threshold could round differently per engine.
    *
    * Shape: one count aggregation over the domain column (tiny result,
    * broadcast back) + the narrow hash filter. No corpus shuffle. */
  def mixtureSample(df: DataFrame, keyCol: Column, domainCol: Column,
                    targets: Map[String, Long]): DataFrame = {
    require(targets.values.forall(_ >= 0), "targets must be >= 0")
    require(targets.values.forall(_ <= Long.MaxValue / MOD),
      s"targets must be <= ${Long.MaxValue / MOD} (threshold stays in long range)")
    val counts = df.groupBy(domainCol.as("__domain"))
      .agg(count(lit(1)).as("__n"))
    val targetNum = targets.foldLeft(lit(-1L)) { case (acc, (d, t)) =>
      when(col("__domain") === lit(d), lit(t * MOD)).otherwise(acc)
    }
    // `div` is INTEGRAL division (a float quotient + floor could round
    // across an integer boundary and flip a row's membership)
    val thr = counts.select(col("__domain"), col("__n"), targetNum.as("__num"))
      .select(col("__domain"),
        when(col("__num") < 0, lit(-1L))
          .otherwise(least(lit(MOD), expr("__num div __n"))).as("__thr"))
    df.join(broadcast(thr), domainCol === col("__domain"))
      .filter(hashBucket(keyCol) < col("__thr"))
      .drop("__domain", "__thr")
  }

  /** WEIGHT-PROPORTIONAL Bernoulli sampling: keep each row with
    * probability `targetRows * w / sum(w)` (capped at 1) — the
    * importance-sampling step of a data mixture ("sample documents
    * proportional to quality x length, expect ~N survivors"), kept
    * deterministic and engine-exact like every sampler here.
    *
    * Exactness discipline: weights must be non-negative INTEGERS
    * (cents, tokens, scaled scores — the repo-wide integer-moment
    * convention), and the keep test is the DIVISION-FREE cross-
    * multiplied form of `h < (targetRows * w * 2^32) div sum(w)`:
    *
    *   keep  ⟺  (h + 1) * sum(w)  <=  targetRows * w * 2^32
    *
    * evaluated in DECIMAL(38,0) products (both sides < 10^29 for any
    * long weights and targetRows <= 2^31) — pure exact integer
    * multiplication on BOTH engines, where a decimal or double
    * QUOTIENT rounds at some scale and could flip a row across its
    * keep boundary differently per engine. The probability-1 cap is
    * free: targetRows*w*2^32 >= 2^32*sum(w) keeps every hash bucket.
    *
    * Shape: ONE scalar aggregate (sum of weights — map-side combined)
    * folded into a narrow filter. No shuffle of the corpus, no per-row
    * state; the expected survivor count is targetRows minus whatever
    * mass the probability cap absorbs. */
  def weightedSample(df: DataFrame, keyCol: Column, weightCol: Column,
                     targetRows: Long): DataFrame = {
    require(targetRows >= 0 && targetRows <= Long.MaxValue / MOD,
      s"targetRows must be in [0, ${Long.MaxValue / MOD}]")
    val w = weightCol.cast("long")
    val dec = "decimal(38,0)"
    // total in decimal(38,0): a plain long sum would WRAP silently past
    // 2^63 (trillions of rows x large weights — the scale this module
    // targets) while the oracle sums in HUGEINT; decimal keeps both
    // engines on the same exact total
    val totRow = df.agg(sum(w.cast(dec)).as("t"), min(w).as("mn")).head()
    require(!totRow.isNullAt(0) &&
      totRow.getDecimal(0).compareTo(java.math.BigDecimal.ZERO) > 0,
      "total weight must be positive")
    require(totRow.getLong(1) >= 0, "weights must be non-negative")
    val tot = totRow.getDecimal(0)
    val lhs = (hashBucket(keyCol) + lit(1L)).cast(dec) * lit(tot).cast(dec)
    val rhs = lit(targetRows * MOD).cast(dec) * w.cast(dec)
    df.filter(w > 0 && lhs <= rhs)
  }

  /** EXACT-k deterministic per-group sample: the `k` rows of each group
    * with the smallest Knuth-hash buckets (ties broken by the key
    * itself) — "give me exactly 10 eval documents per language", where
    * [[stratifiedSample]]'s Bernoulli fractions only deliver an
    * EXPECTED count. Same portability contract as every sampler here:
    * the chosen rows depend only on the key values.
    *
    * Shape: rank-filter over a (group)-partitioned window ordered by
    * the hash. Spark plans the `rank <= k` filter as WindowGroupLimit —
    * each map task keeps only its local top-k per group BEFORE the
    * shuffle, so a billion-row group moves k rows per input partition,
    * not the group. */
  def groupSample(df: DataFrame, keyCol: Column, groupCol: Column,
                  k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val w = Window.partitionBy(groupCol).orderBy(hashBucket(keyCol).asc,
      keyCol.asc)
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }

  /** TEMPERATURE-SCALED mixture budgeting (the multilingual /
    * data-mixture standard at temperature τ = 2): split an integer
    * token `budget` across domains proportionally to sqrt(domain mass),
    * flattening the head of the distribution so low-resource domains
    * are upsampled relative to their raw share. Largest-remainder
    * (Hamilton) apportionment makes the per-domain allocations INTEGERS
    * that sum to exactly `budget`.
    *
    * Exactness discipline: sqrt is correctly rounded IEEE-754 (the one
    * float op here, identical on every engine), quantized to the
    * integer weight floor(sqrt(mass)·10⁶); base share and remainder are
    * decimal(38,0) div/mod; the +1 top-up ranks (remainder desc,
    * domain) through the two-pass [[Ranking.globalRank]] — so the whole
    * allocation is engine-exact and a DuckDB oracle reproduces it.
    *
    * Shape: one aggregation to the (tiny) domain table, two scalar
    * aggregates, one bounded global rank. The corpus is scanned once. */
  def temperatureBudgets(df: DataFrame, domainCol: Column, massCol: Column,
                         budget: Long): DataFrame = {
    require(budget >= 0, "budget must be >= 0")
    val dec = "decimal(38,0)"
    val dom = df.groupBy(domainCol.as("domain"))
      .agg(sum(massCol.cast("long")).as("mass"))
      .withColumn("w", floor(sqrt(col("mass").cast("double")) * 1e6).cast(dec))
    val totRow = dom.agg(sum(col("w")).cast(dec),
      count(when(col("mass").isNull || col("mass") < 0, 1))).head()
    require(totRow.getLong(1) == 0,
      "every domain mass must be non-negative and non-null — a negative " +
        "or all-null mass would turn into sqrt(NaN) and silently break " +
        "the exact-sum allocation invariant")
    require(!totRow.isNullAt(0) &&
      totRow.getDecimal(0).compareTo(java.math.BigDecimal.ZERO) > 0,
      "total weight must be positive")
    // base = (budget * w) div totalW (IntegralDivide → long, exact);
    // remainder stays decimal — both engines floor identically
    val withBase = dom
      .withColumn("__num", lit(budget).cast(dec) * col("w"))
      .withColumn("__tw", lit(totRow.getDecimal(0)).cast(dec))
      .withColumn("base", expr("__num div __tw"))
      .withColumn("__rem", col("__num") - col("base").cast(dec) * col("__tw"))
    val leftover = budget - withBase.agg(sum(col("base"))).head().getLong(0)
    Ranking.globalRank(withBase, Seq(col("__rem").desc, col("domain").asc))
      .select(col("domain"), col("mass"),
        (col("base") + when(col("rank") <= lit(leftover), lit(1L))
          .otherwise(lit(0L))).as("tokens_alloc"))
  }

  /** DETERMINISTIC per-epoch training order: global position 0..n-1 by
    * the epoch-salted Knuth hash of the key — every epoch visits the
    * corpus in a different but fully reproducible order, with no
    * `rand()` and no driver state. The salt enters BEFORE the multiply
    * (h = (key mod 2^31 + epoch·40503) · KNUTH mod 2^32), so
    * consecutive epochs decorrelate rather than rotate.
    *
    * Shape: the two-pass range-partitioned [[Ranking.globalRank]] over
    * the hash — one range shuffle + one bounded offsets collect, never
    * a single-partition window. Output adds `epoch_pos`. */
  def epochShuffle(df: DataFrame, keyCol: Column, epoch: Int): DataFrame = {
    require(epoch >= 0, "epoch must be >= 0")
    // (2^31-1 + epoch·40503) · KNUTH must stay within a signed 64-bit
    // long for the engine-exact contract to hold against a wider-integer
    // oracle: (2^63-1)/KNUTH ≈ 3.4747e9 caps the salted key, giving
    // epoch ≤ (3.4747e9 − 2^31)/40503 ≈ 32769. Beyond that Spark would
    // silently wrap while a HUGEINT oracle would not.
    require(epoch <= 32768,
      "epoch must be <= 32768: larger salts overflow the 64-bit Knuth " +
        "product and break engine-exactness")
    val salted = pmod(
      (pmod(keyCol.cast("long"), lit(RED)) + lit(epoch.toLong * 40503L))
        * lit(KNUTH), lit(MOD))
    Ranking.globalRank(df.withColumn("__eb", salted),
        Seq(col("__eb").asc, keyCol.asc))
      .withColumn("epoch_pos", col("rank") - 1)
      .drop("rank", "bucket", "__eb")
  }

  /** LEAKAGE-SAFE train/val/test split: near-duplicate CLUSTERS are
    * assigned to splits atomically — no near-dup pair ever straddles
    * train and test, the held-out-contamination guard every LLM data
    * pipeline needs. `pairs` is any near-dup pair frame (minhash LSH,
    * simhash, cosine); ids absent from `pairs` are singleton clusters.
    * The split of a cluster depends only on its label (min reachable
    * id) and the cumulative-fraction thresholds — engine-exact.
    *
    * Shape: connected components over the PAIR graph (pair-volume, not
    * corpus-volume), one left join back to the corpus, then a narrow
    * hash filter. */
  def leakageSafeSplit(df: DataFrame, idCol: String, pairs: DataFrame,
                       aCol: String, bCol: String,
                       splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 >= 0),
      "splits must be non-empty with non-negative fractions")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val cc = Dedup.connectedComponents(pairs, aCol, bCol)
      .select(col("id"), col("cluster_id"))
    val labeled = df.select(col(idCol).cast("long").as("id"))
      .join(cc, Seq("id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("id")))
    val b = hashBucket(col("cluster_id"))
    // first matching cumulative threshold wins: fold right-to-left so
    // the when-chain tests splits in declaration order
    val thresholds = splits.scanLeft(0.0)(_ + _._2).tail
      .map(c => math.round(c * MOD))
    val chain = splits.zip(thresholds).reverse
      .foldLeft(lit(splits.last._1): Column) {
        case (acc, ((name, _), thr)) =>
          when(b < lit(thr), lit(name)).otherwise(acc)
      }
    labeled.select(col("id").as(idCol), col("cluster_id"),
      chain.as("split"))
  }

  /** Stratified sampling: per-stratum fractions over a stratum column
    * (e.g. downsample dominant languages, upweight rare sources). Rows
    * in strata missing from `fracs` are dropped. */
  def stratifiedSample(df: DataFrame, keyCol: Column, stratumCol: Column,
                       fracs: Map[String, Double]): DataFrame = {
    require(fracs.values.forall(f => f >= 0 && f <= 1),
      "sampling fractions must be in [0, 1]")
    val threshold = fracs.foldLeft(lit(-1L)) { case (acc, (stratum, frac)) =>
      when(stratumCol === lit(stratum), lit(math.round(frac * MOD))).otherwise(acc)
    }
    df.filter(hashBucket(keyCol) < threshold)
  }

  /** Poisson(1) CDF thresholds on the u32 hash scale, k = 0..maxK:
    * `T_k = floor(P(X <= k) · 2^32)`. Computed ONCE on the driver and
    * injected as integer literals into both the Spark plan and the
    * oracle SQL, so the weight function is identical arithmetic in
    * every engine (no cross-engine exp/factorial). */
  def poissonThresholdsU32(maxK: Int): Array[Long] = {
    require(maxK >= 1 && maxK <= 16, s"maxK must be in [1, 16], got $maxK")
    var p = math.exp(-1.0); var c = 0.0
    (0 to maxK).map { k =>
      c += p; p = p / (k + 1)
      math.floor(c * MOD).toLong
    }.toArray
  }

  /** Deterministic Poisson bootstrap: per-replicate resampled MEANS of
    * a value column, with multinomial counts approximated by
    * independent Poisson(1) weights (the standard streaming-bootstrap
    * recipe — Chamandy et al., "Estimating Uncertainty for Massive
    * Data Streams") drawn from the SALTED row hash, so replicates are
    * reproducible, engine-exact, and need no RNG state.
    *
    * Values quantize to `10^scaleDigits` units once (round — the
    * oracle mirrors it); each replicate's weighted sum and effective n
    * are Long sums, and the reported mean is the integral
    * `sum · 1e6 div n_eff` in ppm of a quantized unit. Percentiles of
    * the replicate means are the bootstrap CI ([[bootstrapSummary]]).
    *
    * Shape (100 TB): ONE narrow explode of `replicates` ids per row
    * feeding directly into a map-side-combined (replicate) aggregation
    * — the exploded rows never shuffle; the shuffle moves `replicates`
    * partial rows per task. Weights cap at maxK+1 (tail probability
    * < 1e-4 at the default) — documented truncation, same in the
    * oracle. */
  def bootstrapMeans(df: DataFrame, idCol: String, valueCol: String,
                     replicates: Int = 40, scaleDigits: Int = 2,
                     maxK: Int = 5): DataFrame = {
    require(replicates >= 2 && replicates <= 10000,
      s"replicates must be in [2, 10000], got $replicates")
    require(scaleDigits >= 0 && scaleDigits <= 6,
      s"scaleDigits must be in [0, 6], got $scaleDigits")
    val unit = math.pow(10, scaleDigits)
    val t = poissonThresholdsU32(maxK)
    // salted u32 hash: (key mod 2^31 + b*40503) * KNUTH mod 2^32 — the
    // epochShuffle salt scheme, replicate count bounded far below the
    // overflow edge by the require above
    val salted = pmod((pmod(col("__id"), lit(RED)) + col("b") * 40503L)
      * lit(KNUTH), lit(MOD))
    val w = t.zipWithIndex.foldRight(lit(maxK + 1): Column) {
      case ((thr, k), acc) => when(salted < thr, lit(k.toLong)).otherwise(acc)
    }
    df.filter(col(valueCol).isNotNull && col(idCol).isNotNull)
      .select(col(idCol).cast("long").as("__id"),
        round(col(valueCol).cast("double") * unit).cast("long").as("__x"))
      .select(col("__id"), col("__x"),
        explode(sequence(lit(0L), lit(replicates - 1L))).as("b"))
      .select(col("b"), col("__x"), w.cast("long").as("__w"))
      .groupBy(col("b"))
      .agg(sum(col("__w")).as("n_eff"),
        sum(col("__w") * col("__x")).as("__ws"))
      .select(col("b").as("replicate"), col("n_eff"),
        when(col("n_eff") > 0, expr("__ws * 1000000 div n_eff"))
          .as("mean_ppm_units"))
  }

  /** Bootstrap CI rollup: percentile bounds of the replicate means
    * (the replicate table is `replicates` rows — driver-trivial). */
  def bootstrapSummary(means: DataFrame, lo: Double = 0.025,
                       hi: Double = 0.975): DataFrame =
    means.agg(count(lit(1)).as("n_replicates"),
      round(expr("percentile(mean_ppm_units, 0.5)"), 6).as("median"),
      round(expr(s"percentile(mean_ppm_units, $lo)"), 6).as("ci_lo"),
      round(expr(s"percentile(mean_ppm_units, $hi)"), 6).as("ci_hi"))

  /** Deterministic negative sampling for contrastive training: for
    * each (query, positive) pair, emit `k` pseudo-random negatives
    * drawn by a Knuth multiplicative hash over a DENSE id space
    * [0, corpusSize) — reproducible across runs and engines (no
    * rand()), the epoch-shuffle discipline applied to negatives.
    * A draw that collides with the row's positive advances by one
    * (mod corpusSize); collisions BETWEEN negatives of one query are
    * possible and by design (sampling with replacement, the standard
    * contrastive setup). Pure per-row expressions — corpus-linear,
    * no join, no shuffle beyond the input's. Requires ids dense:
    * callers with sparse ids must rank-compact first. */
  def negativeSample(pairs: DataFrame, queryCol: String, posCol: String,
                     corpusSize: Long, k: Int = 4): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(corpusSize > 1, "need at least two candidates")
    val spark = pairs.sparkSession
    import spark.implicits._
    val draws = spark.range(1, k + 1).toDF("neg_rank")
    pairs
      .select(col(queryCol).cast("long").as("query_id"),
        col(posCol).cast("long").as("pos_id"))
      .filter(col("query_id").isNotNull && col("pos_id").isNotNull)
      .crossJoin(broadcast(draws))
      // pmod(q, 2^31)·KNUTH + rank·40503 < 2^63 always; pmod (not %,
      // which keeps the dividend's sign and would push a negative
      // query_id's neg_id outside [0, corpusSize)) keeps every
      // intermediate non-negative on any engine
      .withColumn("__h",
        expr("(pmod(query_id, 2147483648) * 2654435761 + neg_rank * 40503) " +
          s"% 2147483648 % $corpusSize"))
      .withColumn("neg_id",
        when(col("__h") === col("pos_id"),
          (col("__h") + 1) % corpusSize).otherwise(col("__h")))
      .select(col("query_id"), col("pos_id"), col("neg_rank"), col("neg_id"))
      .orderBy("query_id", "neg_rank")
  }
}
