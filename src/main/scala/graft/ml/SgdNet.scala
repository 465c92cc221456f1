package graft.ml

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Fit parameters, mirroring the reference API surface
  * (sgdnet R/sgdnet.R:175-196: family, alpha, nlambda, lambda.min.ratio,
  * lambda, maxit, standardize, intercept, thresh, standardize.response).
  */
final case class SgdNetParams(
    family: String = "gaussian",
    alpha: Double = 1.0,
    nlambda: Int = 100,
    lambdaMinRatio: Double = Double.NaN, // NaN => reference default
    lambda: Array[Double] = null,        // user-supplied path (descending)
    standardize: Boolean = true,
    intercept: Boolean = true,
    thresh: Double = 1e-3,
    maxit: Int = 1000,
    standardizeResponse: Boolean = false,
    // "ungrouped" (reference behavior) or "grouped" (group-lasso across
    // classes per feature — the reference's own TODO, R/sgdnet.R:265)
    typeMultinomial: String = "ungrouped",
    // Reference-exact penalty compatibility (sgdnet src/utils.h:170-180):
    // the reference's solver divides BOTH penalty terms by
    // max(y_scale) on its y-standardized working problem, which —
    // unwound to the original scale — keeps the documented L1 term but
    // scales the L2 term by 1/sd_pop(y). That deviates from the
    // objective the reference DOCUMENTS (R/sgdnet.R:28-41), which graft
    // implements by default; setting sgdnetCompat = true reproduces the
    // reference's implemented coefficients at the same lambda (its own
    // manual ridge test, tests/testthat/test-gaussian.R:45-60).
    // Gaussian single-response only by construction: binomial /
    // multinomial / poisson / mgaussian all have y_scale = 1 in the
    // reference (families.h Preprocess is a no-op there), so the flag
    // is a correct no-op for them.
    sgdnetCompat: Boolean = false,
    // glmnet penalty.factor: per-feature multiplier on BOTH penalty
    // terms (0 = that feature is never penalized; used as given, no
    // rescaling — document your own normalization if you want
    // glmnet's sum-to-p convention). Applies on the standardized
    // working coordinates, matching glmnet. Supported for EVERY
    // family — the group solvers (mgaussian; grouped multinomial)
    // scale the whole cross-response group j by pf_j. Contract
    // (requireNoZeroPf): pf = 0 entries need an EXPLICIT lambda
    // sequence on the paths without the unpenalized-coordinate
    // lambda_max projection (sparse GLM, group solvers, multinomial,
    // offset poisson, shared CV).
    penaltyFactor: Array[Double] = null,
    // glmnet lower.limits / upper.limits: per-coefficient box
    // constraints on the ORIGINAL coefficient scale (the working
    // problem clips on standardized coordinates via the same
    // beta_std = beta_orig·sd/y_scale transform the unstandardization
    // inverts). glmnet's validity requirement applies: every
    // lowerLimit ≤ 0 ≤ upperLimit (the clipped soft-threshold step is
    // the exact 1-D prox only when 0 is feasible). lower=upper=0
    // forces a coefficient out — glmnet's `exclude`, see
    // [[SgdNet.excludeLimits]]. Supported EVERYWHERE since round 16:
    // the 1-D paths (gaussian dense/sparse/weighted/relaxed, binomial
    // and poisson dense/SPARSE/weighted incl. offset, ungrouped
    // multinomial) take the exact clipped soft-threshold prox, and the
    // GROUP solvers (mgaussian; grouped multinomial) take the
    // box-constrained group prox — the group-norm bisection of
    // [[LinAlg.boxedGroupProx]] (the l1/l2 prox has no closed form
    // under a box, but its norm fixed point is unique). The CV paths
    // inherit whichever their fit uses.
    lowerLimits: Array[Double] = null,
    upperLimits: Array[Double] = null,
    // glmnet dfmax / pmax: early path truncation for very large p.
    // dfmax bounds the nonzero-FEATURE count of any returned model
    // (multivariate: a feature counts if ANY class/response uses it);
    // pmax bounds the EVER-ACTIVE feature count along the path. The
    // first path point that violates either is dropped and the path
    // stops there (glmnet returns the shorter sequence); -1 = no
    // bound. Enforced by [[SgdNet.dfTruncate]] in the dense/sparse/
    // weighted gaussian-family solver and the binomial/poisson/
    // multinomial path cores.
    dfmax: Int = -1,
    pmax: Int = -1)

/** Spark-native elastic-net GLM path fitting with the capability surface
  * of `sgdnet` (gaussian, binomial, multinomial, mgaussian families).
  *
  * Architecture (NOT a port — see SURVEY.md §3): the reference's SAGA
  * solver is sequential per-sample; graft instead computes per-pass
  * sufficient statistics with `treeAggregate` and solves the penalized
  * problem driver-side on p-dimensional moments:
  *   - gaussian / mgaussian: ONE data pass for the entire lambda path
  *     (coordinate descent on the Gram matrix, covariance updates);
  *   - binomial: distributed IRLS — one pass per Newton step, warm
  *     starts along the path;
  *   - multinomial: distributed proximal gradient (FISTA) — one pass
  *     per gradient step.
  * Every pass is a shuffle-free linear scan; driver state is O(p^2).
  */
object SgdNet {

  /** Path-truncation cursor for glmnet `dfmax`/`pmax` (see
    * [[SgdNetParams]]): the solver asks [[admit]] after each path
    * point's solve; a `false` means that point violates a bound — the
    * caller drops it and stops the path (glmnet returns the shorter
    * lambda sequence). Ever-active bookkeeping is O(p) driver state. */
  private[ml] final class DfGate(params: SgdNetParams, p: Int) {
    private val ever = new Array[Boolean](p)
    private var everCount = 0
    val unbounded: Boolean = params.dfmax < 0 && params.pmax < 0
    def admit(nz: Int => Boolean): Boolean = {
      if (unbounded) return true
      var df = 0
      var j = 0
      while (j < p) {
        if (nz(j)) {
          df += 1
          if (!ever(j)) { ever(j) = true; everCount += 1 }
        }
        j += 1
      }
      (params.dfmax < 0 || df <= params.dfmax) &&
        (params.pmax < 0 || everCount <= params.pmax)
    }
  }

  /** Post-hoc `dfmax`/`pmax` truncation for the secondary path routes
    * (sparse/weighted/offset GLM IRLS): the primary cores stop the
    * path early at the first violation; these routes solve their path
    * and slice to the same returned surface — first violating point
    * dropped, path ends there (nonzero patterns are scale-invariant,
    * so gating the original-scale coefficients is exact). */
  private[ml] def dfTruncate(m: SgdNetModel, params: SgdNetParams): SgdNetModel = {
    if (params.dfmax < 0 && params.pmax < 0) return m
    val p = m.nFeatures
    val gate = new DfGate(params, p)
    var cut = 0
    var stopped = false
    while (cut < m.lambda.length && !stopped) {
      val bl = m.beta(cut)
      if (gate.admit(j => bl.exists(bt => bt(j) != 0.0))) cut += 1
      else stopped = true
    }
    require(cut > 0, "dfmax/pmax exclude every path point")
    if (cut == m.lambda.length) m
    else new SgdNetModel(m.family, m.featureNames, m.responseNames,
      m.classLabels, m.lambda.take(cut), m.a0.take(cut), m.beta.take(cut),
      m.nulldev, m.devRatio.take(cut), m.nobs, m.npasses, m.params)
  }

  def fit(df: DataFrame, featureCols: Seq[String], labelCol: String,
          params: SgdNetParams = SgdNetParams()): SgdNetModel =
    fitMulti(df, featureCols, Seq(labelCol), params)

  /** glmnet `exclude` as limit arrays: lower = upper = 0 at the
    * excluded indices (the coefficient is forced out at every lambda),
    * ±∞ elsewhere. Pass the pair to
    * `SgdNetParams(lowerLimits = lo, upperLimits = up)`. */
  def excludeLimits(p: Int, exclude: Seq[Int]):
      (Array[Double], Array[Double]) = {
    require(exclude.forall(j => j >= 0 && j < p),
      s"exclude indices must be in [0, $p)")
    val lo = Array.fill(p)(Double.NegativeInfinity)
    val up = Array.fill(p)(Double.PositiveInfinity)
    exclude.foreach { j => lo(j) = 0.0; up(j) = 0.0 }
    (lo, up)
  }

  /** Validate box limits and convert from the ORIGINAL coefficient
    * scale to the working standardized scale (beta_std =
    * beta_orig·scale_j / y_scale). Returns (null, null) when both
    * limit arrays are null. */
  private[ml] def boundsStd(params: SgdNetParams, scale: Array[Double],
                            yScale: Double): (Array[Double], Array[Double]) = {
    val (lo, up) = (params.lowerLimits, params.upperLimits)
    if (lo == null && up == null) return (null, null)
    val p = scale.length
    require(lo == null || lo.length == p,
      s"lowerLimits must have one entry per feature ($p)")
    require(up == null || up.length == p,
      s"upperLimits must have one entry per feature ($p)")
    require(lo == null || lo.forall(_ <= 0),
      "every lowerLimit must be <= 0 (the glmnet requirement)")
    require(up == null || up.forall(_ >= 0),
      "every upperLimit must be >= 0 (the glmnet requirement)")
    val loS = if (lo == null) Array.fill(p)(Double.NegativeInfinity)
      else Array.tabulate(p)(j => lo(j) * scale(j) / yScale)
    val upS = if (up == null) Array.fill(p)(Double.PositiveInfinity)
      else Array.tabulate(p)(j => up(j) * scale(j) / yScale)
    (loS, upS)
  }

  /** Large-p contract (round 18): the sufficient-stats / IRLS
    * architecture keeps O(p²) driver AND per-task state — the packed
    * Gram is p(p+1)/2 doubles, every per-Newton WLS subproblem a
    * p×p solve. SURVEY §3 scopes the design to p up to ~5k–8k; beyond
    * that the failure mode used to be a driver OOM deep inside a
    * treeAggregate. Every fit / CV / relax / offset / weighted entry
    * (dense and sparse) now fails fast at p > maxGramP instead.
    * Override with `-Dgraft.ml.maxGramP=N` (or assign the var) when
    * the driver is provisioned for the p² state; for genuinely large
    * p, reduce dimensionality first (feature hashing, screening, JL
    * projection — `graft.ops.Embeddings.projectTopK`/random
    * projection) — the designed extension is a screened/active-set
    * Gram, not a bigger allocation. */
  @volatile var maxGramP: Int =
    sys.props.get("graft.ml.maxGramP").map(_.toInt).getOrElse(8192)

  private[ml] def requireGramP(p: Int): Unit =
    require(p <= maxGramP,
      s"p = $p features exceeds maxGramP = $maxGramP: graft's " +
        "sufficient-stats/IRLS solvers keep O(p^2) driver state (packed " +
        "Gram + per-Newton WLS), sized for p up to ~8k. Reduce " +
        "dimensionality (feature hashing / screening / a random " +
        "projection) or raise graft.ml.SgdNet.maxGramP / " +
        "-Dgraft.ml.maxGramP if the driver is provisioned for p^2 memory.")

  /** The argument validation every fit entry point shares (reference
    * R/sgdnet.R:101-131 input checks) — fitMulti and the weighted /
    * offset routes that bypass it run the same requires. */
  private[ml] def validateCommon(featureCols: Seq[String],
                                 labelCols: Seq[String],
                                 params: SgdNetParams): Unit = {
    require(featureCols.nonEmpty, "the predictor matrix (x) is empty.")
    requireGramP(featureCols.size)
    require(labelCols.nonEmpty, "the response (y) is empty.")
    require(params.alpha >= 0 && params.alpha <= 1,
      "elastic net mixing parameter (alpha) must be in [0, 1].")
    require(params.nlambda > 0, "lambda path cannot be of zero length.")
    require(params.thresh >= 0, "threshold for stopping criteria cannot be negative.")
    require(params.maxit > 0, "maximum number of iterations cannot be negative or zero.")
    if (params.lambda != null)
      require(params.lambda.forall(_ >= 0), "penalty strengths (lambdas) must be positive.")
  }

  def fitMulti(df: DataFrame, featureCols: Seq[String], labelCols: Seq[String],
               params: SgdNetParams): SgdNetModel = {
    validateCommon(featureCols, labelCols, params)

    params.family match {
      case "gaussian" =>
        require(labelCols.size == 1, "response for Gaussian regression must be one-dimensional.")
        fitGaussianLike(df, featureCols, labelCols, params)
      case "mgaussian" =>
        fitGaussianLike(df, featureCols, labelCols, params)
      case "binomial" =>
        fitBinomial(df, featureCols, labelCols.head, params)
      case "poisson" =>
        fitPoisson(df, featureCols, labelCols.head, params)
      case "multinomial" =>
        fitMultinomial(df, featureCols, labelCols.head, params)
      case f => throw new IllegalArgumentException(s"unsupported family: $f")
    }
  }

  /** Refit including extra penalty values (the reference's
    * `predict(..., exact = TRUE)` / `update()` path, R/utils.R refit):
    * merges `extra` into the model's lambda sequence (descending) and
    * refits — for the gaussian families this still costs ONE data pass.
    */
  def refit(model: SgdNetModel, df: DataFrame, extra: Seq[Double]): SgdNetModel = {
    val merged = (model.lambda ++ extra).distinct.sorted(Ordering[Double].reverse)
    val p = model.params.copy(lambda = merged.toArray)
    if (model.responseNames.length > 1 || model.family == "mgaussian")
      fitMulti(df, model.featureNames.toSeq, model.responseNames.toSeq, p)
    else fit(df, model.featureNames.toSeq, model.responseNames.head, p)
  }

  /** [[refit]] for a WEIGHTED model (`predict(exact = TRUE)` on a
    * cv.glmnet-weights fit): same merged-lambda refit through the
    * weighted routes. The model does not record its weight column —
    * callers pass the one they trained with (passing a different one is
    * a new model, exactly as glmnet's update(weights=) would be). */
  def refitWeighted(model: SgdNetModel, df: DataFrame, weightCol: String,
                    extra: Seq[Double]): SgdNetModel = {
    val merged = (model.lambda ++ extra).distinct.sorted(Ordering[Double].reverse)
    val p = model.params.copy(lambda = merged.toArray)
    if (model.responseNames.length > 1 || model.family == "mgaussian")
      fitWeightedMulti(df, model.featureNames.toSeq,
        model.responseNames.toSeq, weightCol, p)
    else fitWeighted(df, model.featureNames.toSeq, model.responseNames.head,
      weightCol, p)
  }

  /** Sparse-input gaussian/mgaussian fit: rows are CSR-style
    * (indices, values) arrays over a fixed feature dimension `dim`
    * (the Spark shape of the reference's dgCMatrix input,
    * R/sgdnet.R:224-228 / src/saga-sparse.h). Per-row cost is O(nnz^2)
    * for the Gram pass; the solve is identical to the dense path.
    */
  def fitSparse(df: DataFrame, idxCol: String, valCol: String, dim: Int,
                labelCol: String, params: SgdNetParams = SgdNetParams()): SgdNetModel = {
    requireGramP(dim)
    import org.apache.spark.sql.functions.col
    params.family match {
      case "gaussian" | "mgaussian" =>
        val rdd = df.select(col(idxCol), col(valCol).cast("array<double>"),
            col(labelCol).cast("double"))
          .rdd.map { row =>
            (row.getSeq[Int](0).toArray, row.getSeq[Double](1).toArray,
              Array(row.getDouble(2)))
          }
        val g = rdd.treeAggregate(new GramStats(dim, 1))(
          seqOp = (s, r) => s.addSparse(r._1, r._2, r._3),
          combOp = (a, b) => a.merge(b), depth = 2)
        solveGaussianFromStats(g, (0 until dim).map(j => s"V$j"), Seq(labelCol), params)
      case "binomial" | "poisson" =>
        fitSparseGlm(df, idxCol, valCol, dim, labelCol, params)
      case "multinomial" =>
        fitSparseMultinomial(df, idxCol, valCol, dim, labelCol, params)
      case f => throw new IllegalArgumentException(s"unsupported family: $f")
    }
  }

  /** Sparse-input MULTI-RESPONSE fit (mgaussian with a dgCMatrix x,
    * round 16 — the reference supports sparse x for EVERY family
    * including the multi-response gaussian, src/saga-sparse.h +
    * families.h:340): one O(nnz²)-per-row sparse-moment treeAggregate
    * into the SAME group path solver as the dense [[fitMulti]] —
    * standardization, lambda path, group prox (incl. round-16 box
    * limits), standardize.response all apply unchanged. With
    * `weightCol`, RAW-v weighted moments normalized to sum-to-n over
    * the positive-weight rows (the [[fitSparseWeighted]] convention;
    * w = 0 drops the observation). Also accepts the k = 1 gaussian
    * case, where it reproduces [[fitSparse]] exactly. */
  /** [[fitSparseMulti]] with a per-response OFFSET matrix (round 16 —
    * the sparse twin of [[fitMultiWithOffset]]): identity link makes
    * this exact by delegation, fitting y_t − offset_t through the
    * sparse multi-response moment route (the label/offset columns are
    * dense; only x is CSR). */
  def fitSparseMultiWithOffset(df: DataFrame, idxCol: String, valCol: String,
                               dim: Int, labelCols: Seq[String],
                               offsetCols: Seq[String],
                               params: SgdNetParams = SgdNetParams(),
                               weightCol: String = null): SgdNetModel = {
    requireGramP(dim)
    import org.apache.spark.sql.functions.col
    require(params.family == "mgaussian" || params.family == "gaussian",
      s"fitSparseMultiWithOffset is the identity-link route, not ${params.family}")
    require(offsetCols.size == labelCols.size,
      s"need one offset column per response (${labelCols.size}), got ${offsetCols.size}")
    val adj = labelCols.zip(offsetCols).foldLeft(df) { case (d, (l, o)) =>
      d.withColumn(l, col(l).cast("double") - col(o).cast("double"))
    }
    fitSparseMulti(adj, idxCol, valCol, dim, labelCols, params, weightCol)
  }

  def fitSparseMulti(df: DataFrame, idxCol: String, valCol: String,
                     dim: Int, labelCols: Seq[String],
                     params: SgdNetParams = SgdNetParams(),
                     weightCol: String = null): SgdNetModel = {
    requireGramP(dim)
    import org.apache.spark.sql.functions.{col, lit}
    require(params.family == "gaussian" || params.family == "mgaussian",
      s"fitSparseMulti supports gaussian and mgaussian, not ${params.family}")
    require(params.family == "mgaussian" || labelCols.size == 1,
      "response for gaussian must be one-dimensional " +
        "(use family=\"mgaussian\" for multi-response)")
    val k = labelCols.size
    val wCol = if (weightCol == null) lit(1.0) else col(weightCol).cast("double")
    val raw = df.select((Seq(col(idxCol), col(valCol).cast("array<double>")) ++
        labelCols.map(c => col(c).cast("double")) :+ wCol): _*)
      .rdd.map { row =>
        val y = new Array[Double](k)
        var t = 0
        while (t < k) { y(t) = row.getDouble(2 + t); t += 1 }
        (row.getSeq[Int](0).toArray, row.getSeq[Double](1).toArray, y,
          row.getDouble(2 + k))
      }.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val norm =
        if (weightCol == null) 1.0
        else {
          val (nRows, wSum) = raw.treeAggregate((0L, 0.0))(
            seqOp = (s, r) => {
              require(r._4 >= 0, "weights must be non-negative")
              if (r._4 > 0) (s._1 + 1, s._2 + r._4) else s
            },
            combOp = (a, b) => (a._1 + b._1, a._2 + b._2), depth = 2)
          require(nRows > 0, "the response (y) is empty.")
          nRows.toDouble / wSum
        }
      val g = raw.filter(_._4 > 0).treeAggregate(new GramStats(dim, k))(
        seqOp = (s, r) => s.addSparseWeighted(r._1, r._2, r._3, r._4 * norm),
        combOp = (a, b) => a.merge(b), depth = 2)
      solveGaussianFromStats(g, (0 until dim).map(j => s"V$j"), labelCols,
        params)
    } finally { raw.unpersist(blocking = false); () }
  }

  /** [[fitSparse]] WITH observation weights (glmnet sparse x +
    * `weights` together, round 15 — the reference supports dgCMatrix
    * for every family, src/saga-sparse.h, and glmnet accepts weights
    * with it): gaussian runs one weighted sparse-moment treeAggregate
    * (O(nnz²) per row, never densified) into the same driver path
    * solver; binomial/poisson/multinomial thread v·norm through every
    * sparse IRLS / softmax-gradient pass. Integer weights reproduce
    * row duplication (spec); w = 0 drops the observation. */
  def fitSparseWeighted(df: DataFrame, idxCol: String, valCol: String,
                        dim: Int, labelCol: String, weightCol: String,
                        params: SgdNetParams = SgdNetParams()): SgdNetModel = {
    requireGramP(dim)
    import org.apache.spark.sql.functions.col
    params.family match {
      case "gaussian" =>
        val raw = df.select(col(idxCol), col(valCol).cast("array<double>"),
            col(labelCol).cast("double"), col(weightCol).cast("double"))
          .rdd.map { row =>
            (row.getSeq[Int](0).toArray, row.getSeq[Double](1).toArray,
              row.getDouble(2), row.getDouble(3))
          }.persist(StorageLevel.MEMORY_AND_DISK)
        try {
          val (nRows, wSum) = raw.treeAggregate((0L, 0.0))(
            seqOp = (s, r) => {
              require(r._4 >= 0, "weights must be non-negative")
              if (r._4 > 0) (s._1 + 1, s._2 + r._4) else s
            },
            combOp = (a, b) => (a._1 + b._1, a._2 + b._2), depth = 2)
          require(nRows > 0, "the response (y) is empty.")
          val norm = nRows.toDouble / wSum
          val g = raw.filter(_._4 > 0).treeAggregate(new GramStats(dim, 1))(
            seqOp = (s, r) =>
              s.addSparseWeighted(r._1, r._2, Array(r._3), r._4 * norm),
            combOp = (a, b) => a.merge(b), depth = 2)
          solveGaussianFromStats(g, (0 until dim).map(j => s"V$j"),
            Seq(labelCol), params)
        } finally { raw.unpersist(blocking = false); () }
      case "binomial" | "poisson" =>
        fitSparseGlm(df, idxCol, valCol, dim, labelCol, params, weightCol)
      case "multinomial" =>
        fitSparseMultinomial(df, idxCol, valCol, dim, labelCol, params,
          weightCol)
      case f => throw new IllegalArgumentException(
        s"fitSparseWeighted supports gaussian, binomial, poisson, " +
          s"multinomial, not $f")
    }
  }

  /** Sparse-input fit WITH a linear-predictor offset (round 16 —
    * closes the sparse × offset cells; glmnet accepts offset with a
    * dgCMatrix x): gaussian reduces exactly to [[fitSparse]] /
    * [[fitSparseWeighted]] on y − offset; binomial/poisson run the
    * [[fitSparseGlm]] uncentered-moment IRLS with the per-row offset in
    * every linear predictor and the WLS target z − off (the
    * fitPoissonOffset / fitBinomialOffset algebra over CSR rows —
    * never densified). Null intercepts: poisson closed-form
    * ln(Σv·y/Σv·e^off); binomial via the driver Newton loop (exact at
    * the mean-offset-shifted logit start for constant offsets). The
    * lambda path uses the offset-corrected null gradient. `weightCol`
    * folds sum-to-n normalized frequency weights into every
    * accumulation. */
  def fitSparseWithOffset(df: DataFrame, idxCol: String, valCol: String,
                          dim: Int, labelCol: String, offsetCol: String,
                          params: SgdNetParams = SgdNetParams(),
                          weightCol: String = null): SgdNetModel = {
    requireGramP(dim)
    import org.apache.spark.sql.functions.{col, lit}
    params.family match {
      case "gaussian" =>
        val adj = df.withColumn(labelCol,
          col(labelCol).cast("double") - col(offsetCol).cast("double"))
        if (weightCol == null) fitSparse(adj, idxCol, valCol, dim, labelCol,
          params)
        else fitSparseWeighted(adj, idxCol, valCol, dim, labelCol, weightCol,
          params)
      case "binomial" | "poisson" =>
        fitSparseGlmOffset(df, idxCol, valCol, dim, labelCol, offsetCol,
          params, weightCol)
      case f => throw new IllegalArgumentException(
        s"fitSparseWithOffset supports gaussian, binomial, poisson, not $f")
    }
  }

  /** The binomial/poisson half of [[fitSparseWithOffset]]. */
  private def fitSparseGlmOffset(df: DataFrame, idxCol: String,
                                 valCol: String, dim: Int, labelCol: String,
                                 offsetCol: String, params: SgdNetParams,
                                 weightCol: String): SgdNetModel = {
    import org.apache.spark.sql.functions.{col, lit}
    requireNoZeroPf(params, "sparse offset GLM")
    val p = dim
    val binomial = params.family == "binomial"
    val classes: Array[String] =
      if (binomial) {
        val cs = df.select(col(labelCol).cast("string")).distinct()
          .limit(3).collect().map(_.getString(0)).sorted
        require(cs.length == 2,
          if (cs.length > 2) "more than two classes in response. Are you looking for family = 'multinomial'?"
          else "only one class in response.")
        cs
      } else Array.empty
    val yCol =
      if (binomial) (col(labelCol).cast("string") === classes(1)).cast("double")
      else col(labelCol).cast("double")
    val wCol = if (weightCol == null) lit(1.0) else col(weightCol).cast("double")
    val raw = df.select(col(idxCol), col(valCol).cast("array<double>"), yCol,
        col(offsetCol).cast("double"), wCol)
      .rdd.map { r =>
        (r.getSeq[Int](0).toArray, r.getSeq[Double](1).toArray,
          r.getDouble(2), r.getDouble(3), r.getDouble(4))
      }.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val rows =
        if (weightCol == null) raw
        else {
          val (nRows, wSum) = raw.treeAggregate((0L, 0.0))(
            seqOp = (s, r) => {
              require(r._5 >= 0, "weights must be non-negative")
              if (r._5 > 0) (s._1 + 1, s._2 + r._5) else s
            },
            combOp = (a, b) => (a._1 + b._1, a._2 + b._2), depth = 2)
          require(nRows > 0, "the response (y) is empty.")
          val norm = nRows.toDouble / wSum
          raw.filter(_._5 > 0).map(r => (r._1, r._2, r._3, r._4, r._5 * norm))
        }
      // ONE stats pass: weighted sparse moments + Σvn·e^off + Σvn·off
      val (g, sumExpOff, sumOff) =
        rows.treeAggregate((new GramStats(p, 1), 0.0, 0.0))(
          seqOp = (s, r) =>
            (s._1.addSparseWeighted(r._1, r._2, Array(r._3), r._5),
              s._2 + r._5 * math.exp(math.max(math.min(r._4, 30.0), -30.0)),
              s._3 + r._5 * r._4),
          combOp = (a, b) => (a._1.merge(b._1), a._2 + b._2, a._3 + b._3),
          depth = 2)
      val st = SufficientStats.standardize(g, params.standardize, params.intercept)
      val n = g.n.toDouble
      val yBar = st.yMean(0)
      var passes = 1

      // offset null intercept
      var a0Null =
        if (!params.intercept) 0.0
        else if (binomial) {
          require(yBar > 0 && yBar < 1,
            "binomial response must contain both classes")
          math.log(yBar / (1 - yBar)) - sumOff / n
        } else {
          require(yBar > 0, "poisson response must contain positive counts")
          math.log(yBar * n / sumExpOff)
        }
      if (binomial && params.intercept) {
        // Newton on a0 with μ = σ(a0 + off) — the fitBinomialOffset loop
        var it = 0
        var done = false
        while (it < 25 && !done) {
          val (s1, s2) = rows.treeAggregate((0.0, 0.0))(
            (s, r) => {
              val mu = 1.0 / (1.0 + math.exp(-(a0Null + r._4)))
              (s._1 + r._5 * (r._3 - mu),
                s._2 + r._5 * math.max(mu * (1.0 - mu), 1e-10))
            },
            (a, b) => (a._1 + b._1, a._2 + b._2), depth = 2)
          passes += 1
          val step = s1 / s2
          a0Null += step
          it += 1
          if (math.abs(step) < 1e-12) done = true
        }
      }

      val mean = if (params.intercept) st.xMean else new Array[Double](p)
      val scale = if (params.standardize) st.xSd else Array.fill(p)(1.0)
      val minRatio = if (params.lambdaMinRatio.isNaN)
        LambdaPath.defaultMinRatio(g.n, p) else params.lambdaMinRatio
      val lambdas = if (params.lambda != null) params.lambda
        else {
          // offset-corrected lambda_max: one SPARSE gradient pass at the
          // null (uncentered sums + algebraic centering)
          val a0N = a0Null
          val acc = rows.treeAggregate(new Array[Double](p + 1))(
            seqOp = (s, r) => {
              val mu =
                if (binomial) 1.0 / (1.0 + math.exp(-(a0N + r._4)))
                else math.exp(math.max(math.min(a0N + r._4, 30.0), -30.0))
              val res = r._5 * (r._3 - mu)
              var i = 0
              while (i < r._1.length) { s(r._1(i)) += res * r._2(i); i += 1 }
              s(p) += res
              s
            },
            combOp = (a, b) => {
              var i = 0; while (i <= p) { a(i) += b(i); i += 1 }; a
            }, depth = 2)
          passes += 1
          val bOff = Array.tabulate(p)(j =>
            (acc(j) - mean(j) * acc(p)) / scale(j) / n)
          LambdaPath.build(Array(bOff), params.alpha, params.nlambda,
            minRatio, params.penaltyFactor)
        }
      val (loStd, upStd) = boundsStd(params, scale, 1.0)
      val sc = rows.sparkContext

      val L = lambdas.length
      val a0Out = Array.ofDim[Double](L, 1)
      val betaOut = Array.ofDim[Double](L, 1, p)
      var beta = new Array[Double](p) // standardized scale
      var a0 = a0Null
      val newtonTol = math.max(params.thresh * 1e-4, 1e-10)

      // round 17: TRUE dfmax/pmax early stopping on this route — the
      // first violating path point stops the remaining lambdas' IRLS
      // cluster passes; the violating point carries forward so the
      // post-hoc dfTruncate slices the path at it (identical surface)
      val dfGate = new DfGate(params, p)
      var dfStop = -1
      for (l <- 0 until L) if (dfStop >= 0) {
        a0Out(l)(0) = a0Out(dfStop)(0)
        betaOut(l)(0) = betaOut(dfStop)(0)
      } else {
        var iter = 0
        var done = false
        while (iter < 25 && !done) {
          // linear-predictor form on the ORIGINAL sparse scale:
          // η = off_row + cOff + Σ vals·(β/scale)(idx); the WLS target
          // is z − off_row so the solver fits a0 + xs·β exactly
          val bOverS = Array.tabulate(p)(j => beta(j) / scale(j))
          var cOff = a0
          var j0 = 0
          while (j0 < p) { cOff -= mean(j0) * bOverS(j0); j0 += 1 }
          val bc = sc.broadcast(bOverS)
          val wg = rows.treeAggregate(new SpWGram(p))(
            seqOp = (s, r) => {
              val (idx, vals, y, off, vn) = r
              val bos = bc.value
              var eta = cOff + off
              var i = 0
              while (i < idx.length) { eta += vals(i) * bos(idx(i)); i += 1 }
              var w = 0.0
              var z = 0.0
              if (binomial) {
                val mu = 1.0 / (1.0 + math.exp(-eta))
                w = math.max(mu * (1.0 - mu), 1e-5)
                z = eta + (y - mu) / w - off
              } else {
                val etaC = math.max(math.min(eta, 30.0), -30.0)
                val mu = math.exp(etaC)
                w = math.max(mu, 1e-5)
                z = etaC + (y - mu) / w - off
              }
              w = w * vn
              s.sw += w; s.swz += w * z
              i = 0
              while (i < idx.length) {
                val j = idx(i)
                val wxj = w * vals(i)
                s.swx(j) += wxj
                s.swxz(j) += wxj * z
                var m = 0
                while (m <= i) {
                  s.swxx(LinAlg.triIdx(idx(m), j)) += wxj * vals(m)
                  m += 1
                }
                i += 1
              }
              s
            },
            combOp = (a, b) => a.merge(b), depth = 2)
          passes += 1
          // center + standardize algebraically, then the SAME driver CD
          val ninv = 1.0 / n
          val swxStd = Array.tabulate(p)(j =>
            (wg.swx(j) - mean(j) * wg.sw) / scale(j))
          val swxzStd = Array.tabulate(p)(j =>
            (wg.swxz(j) - mean(j) * wg.swz) / scale(j))
          val aM = Array.ofDim[Double](p, p)
          var j = 0
          while (j < p) {
            var i = 0
            while (i <= j) {
              val v = (wg.swxx(LinAlg.triIdx(i, j)) - mean(i) * wg.swx(j) -
                mean(j) * wg.swx(i) + mean(i) * mean(j) * wg.sw) /
                (scale(i) * scale(j)) * ninv
              aM(i)(j) = v; aM(j)(i) = v
              i += 1
            }
            j += 1
          }
          // round 18: the sparse IRLS working-response solves take the
          // same per-Newton strong-rule screen as the dense routes
          // (round 17) — exact by KKT backcheck, same gates; the
          // centered/standardized Gram algebra above is unchanged
          val r =
            if (screenGlm && params.alpha > 0 && p >= ScreenMinP && l > 0)
              CoordinateDescent.solveScreened(aM, swxzStd.map(_ * ninv),
                swxStd.map(_ * ninv), wg.swz * ninv, wg.sw * ninv,
                lambdas(l), lambdas(l - 1), params.alpha, params.intercept,
                beta, thresh = newtonTol, maxIter = params.maxit,
                penaltyFactor = params.penaltyFactor,
                lower = loStd, upper = upStd)
            else CoordinateDescent.solve(aM, swxzStd.map(_ * ninv),
              swxStd.map(_ * ninv), wg.swz * ninv, wg.sw * ninv,
              lambdas(l), params.alpha, params.intercept, beta,
              thresh = newtonTol, maxIter = params.maxit,
              penaltyFactor = params.penaltyFactor,
              lower = loStd, upper = upStd)
          var maxD = math.abs(r.a0 - a0)
          j = 0
          while (j < p) {
            val d = math.abs(r.beta(j) - beta(j)); if (d > maxD) maxD = d; j += 1
          }
          beta = r.beta; a0 = r.a0
          iter += 1
          if (maxD < math.max(params.thresh * 1e-2, 1e-8)) done = true
        }
        for (j <- 0 until p) betaOut(l)(0)(j) = beta(j) / scale(j)
        a0Out(l)(0) =
          if (params.intercept) a0 - (0 until p).map(j => betaOut(l)(0)(j) * mean(j)).sum
          else a0
        if (!dfGate.admit(j => betaOut(l)(0)(j) != 0.0)) dfStop = l
      }

      // deviance with per-row offset (sparse eta); the null model is the
      // converged offset null intercept
      val featureNames = (0 until p).map(j => s"V$j").toArray
      val devs = rows.treeAggregate(new Array[Double](L + 1))(
        seqOp = (acc, r) => {
          val (idx, vals, y, off, vn) = r
          def binDev(eta: Double): Double = {
            val m = math.max(eta, 0.0)
            2.0 * (m + math.log(math.exp(-m) + math.exp(eta - m)) - y * eta)
          }
          def poisDev(mu: Double): Double = {
            val ylog = if (y > 0) y * math.log(y / mu) else 0.0
            2.0 * (ylog - (y - mu))
          }
          var l = 0
          while (l < L) {
            var eta = a0Out(l)(0) + off
            val bl = betaOut(l)(0)
            var i = 0
            while (i < idx.length) { eta += bl(idx(i)) * vals(i); i += 1 }
            acc(l) += vn * (if (binomial) binDev(eta)
              else poisDev(math.exp(math.max(math.min(eta, 30.0), -30.0))))
            l += 1
          }
          acc(L) += vn * (if (binomial) binDev(a0Null + off)
            else poisDev(math.exp(
              math.max(math.min(a0Null + off, 30.0), -30.0))))
          acc
        },
        combOp = (a, b) => { var i = 0; while (i <= L) { a(i) += b(i); i += 1 }; a },
        depth = 2)
      passes += 1
      val nulldev = devs(L)
      val devRatio = Array.tabulate(L)(l =>
        if (nulldev > 0) 1.0 - devs(l) / nulldev else 0.0)
      dfTruncate(new SgdNetModel(params.family, featureNames, Array(labelCol),
        classes, lambdas, a0Out, betaOut, nulldev, devRatio, g.n, passes,
        params), params)
    } finally { raw.unpersist(blocking = false); () }
  }

  /** Sparse-input binomial/poisson IRLS (reference supports dgCMatrix for
    * every family — src/saga-sparse.h): the same distributed Newton shape
    * as the dense path, but each pass accumulates UNCENTERED weighted
    * moments over only each row's nonzeros (O(nnz^2) per row), and the
    * centering + standardization correction is applied ALGEBRAICALLY on
    * the driver:
    *   sum w xs_i xs_j = (sum w x_i x_j - m_i sum w x_j - m_j sum w x_i
    *                       + m_i m_j sum w) / (s_i s_j)
    * so the sparse matrix is never densified — the linear predictor uses
    * a per-pass scalar offset a0 - sum_j m_j beta_j / s_j, O(nnz) per
    * row. Produces bitwise the same solve inputs as the dense path. */
  private def fitSparseGlm(df: DataFrame, idxCol: String, valCol: String,
                           dim: Int, labelCol: String,
                           params: SgdNetParams,
                           weightCol: String = null): SgdNetModel = {
    import org.apache.spark.sql.functions.{col, lit}
    requireNoZeroPf(params, "sparse GLM")
    val p = dim
    val binomial = params.family == "binomial"
    val classes: Array[String] =
      if (binomial) {
        val cs = df.select(col(labelCol).cast("string")).distinct()
          .limit(3).collect().map(_.getString(0)).sorted
        require(cs.length == 2,
          if (cs.length > 2) "more than two classes in response. Are you looking for family = 'multinomial'?"
          else "only one class in response.")
        cs
      } else Array.empty
    val yCol =
      if (binomial) (col(labelCol).cast("string") === classes(1)).cast("double")
      else col(labelCol).cast("double")
    val wCol = if (weightCol == null) lit(1.0) else col(weightCol).cast("double")
    val raw = df.select(col(idxCol), col(valCol).cast("array<double>"), yCol,
        wCol)
      .rdd.map { r =>
        (r.getSeq[Int](0).toArray, r.getSeq[Double](1).toArray,
          r.getDouble(2), r.getDouble(3))
      }.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // weights normalize to sum to the kept-row count (w == 0 drops
      // the observation); vn = 1.0 everywhere for the unweighted call,
      // which is bit-identical to the pre-weights arithmetic
      val rows =
        if (weightCol == null) raw
        else {
          val (nRows, wSum) = raw.treeAggregate((0L, 0.0))(
            seqOp = (s, r) => {
              require(r._4 >= 0, "weights must be non-negative")
              if (r._4 > 0) (s._1 + 1, s._2 + r._4) else s
            },
            combOp = (a, b) => (a._1 + b._1, a._2 + b._2), depth = 2)
          require(nRows > 0, "the response (y) is empty.")
          val norm = nRows.toDouble / wSum
          raw.filter(_._4 > 0).map(r => (r._1, r._2, r._3, r._4 * norm))
        }
      val g = rows.treeAggregate(new GramStats(p, 1))(
        seqOp = (s, r) => s.addSparseWeighted(r._1, r._2, Array(r._3), r._4),
        combOp = (a, b) => a.merge(b), depth = 2)
      val st = SufficientStats.standardize(g, params.standardize, params.intercept)
      val n = g.n.toDouble
      val yBar = st.yMean(0)
      if (!binomial) require(yBar > 0, "poisson response must contain positive counts")

      val minRatio = if (params.lambdaMinRatio.isNaN)
        LambdaPath.defaultMinRatio(g.n, p) else params.lambdaMinRatio
      val lambdas = if (params.lambda != null) params.lambda
        else LambdaPath.build(st.b, params.alpha, params.nlambda, minRatio,
          params.penaltyFactor)

      val mean = if (params.intercept) st.xMean else new Array[Double](p)
      val scale = if (params.standardize) st.xSd else Array.fill(p)(1.0)
      // glmnet box limits on the sparse IRLS route: the algebraic
      // centering feeds the SAME driver CD as the dense path, so the
      // clipped 1-D prox applies unchanged on standardized coordinates
      val (loStd, upStd) = boundsStd(params, scale, 1.0)
      val sc = rows.sparkContext

      val L = lambdas.length
      val a0Out = Array.ofDim[Double](L, 1)
      val betaOut = Array.ofDim[Double](L, 1, p)
      var beta = new Array[Double](p) // standardized scale
      var a0 =
        if (binomial) {
          if (params.intercept && yBar > 0 && yBar < 1) math.log(yBar / (1 - yBar)) else 0.0
        } else if (params.intercept) math.log(yBar) else 0.0
      var passes = 0
      val newtonTol = math.max(params.thresh * 1e-4, 1e-10)

      // round 17: TRUE dfmax/pmax early stopping on this route — the
      // first violating path point stops the remaining lambdas' IRLS
      // cluster passes; the violating point carries forward so the
      // post-hoc dfTruncate slices the path at it (identical surface)
      val dfGate = new DfGate(params, p)
      var dfStop = -1
      for (l <- 0 until L) if (dfStop >= 0) {
        a0Out(l)(0) = a0Out(dfStop)(0)
        betaOut(l)(0) = betaOut(dfStop)(0)
      } else {
        var iter = 0
        var done = false
        while (iter < 25 && !done) {
          val bOverS = Array.tabulate(p)(j => beta(j) / scale(j))
          var offset = a0
          var j0 = 0
          while (j0 < p) { offset -= mean(j0) * bOverS(j0); j0 += 1 }
          val bc = sc.broadcast(bOverS)
          val wg = rows.treeAggregate(new SpWGram(p))(
            seqOp = (s, r) => {
              val (idx, vals, y, vn) = r
              val bos = bc.value
              var eta = offset
              var i = 0
              while (i < idx.length) { eta += vals(i) * bos(idx(i)); i += 1 }
              var w = 0.0
              var z = 0.0
              if (binomial) {
                val mu = 1.0 / (1.0 + math.exp(-eta))
                w = math.max(mu * (1.0 - mu), 1e-5)
                z = eta + (y - mu) / w
              } else {
                val etaC = math.max(math.min(eta, 30.0), -30.0)
                val mu = math.exp(etaC)
                w = math.max(mu, 1e-5)
                z = etaC + (y - mu) / w
              }
              w = w * vn // frequency weight folds into the IRLS weight
              s.sw += w; s.swz += w * z
              i = 0
              while (i < idx.length) {
                val j = idx(i)
                val wxj = w * vals(i)
                s.swx(j) += wxj
                s.swxz(j) += wxj * z
                var m = 0
                while (m <= i) {
                  s.swxx(LinAlg.triIdx(idx(m), j)) += wxj * vals(m)
                  m += 1
                }
                i += 1
              }
              s
            },
            combOp = (a, b) => a.merge(b), depth = 2)
          passes += 1
          // center + standardize algebraically, then the SAME driver CD
          val ninv = 1.0 / n
          val swxStd = Array.tabulate(p)(j =>
            (wg.swx(j) - mean(j) * wg.sw) / scale(j))
          val swxzStd = Array.tabulate(p)(j =>
            (wg.swxz(j) - mean(j) * wg.swz) / scale(j))
          val aM = Array.ofDim[Double](p, p)
          var j = 0
          while (j < p) {
            var i = 0
            while (i <= j) {
              val v = (wg.swxx(LinAlg.triIdx(i, j)) - mean(i) * wg.swx(j) -
                mean(j) * wg.swx(i) + mean(i) * mean(j) * wg.sw) /
                (scale(i) * scale(j)) * ninv
              aM(i)(j) = v; aM(j)(i) = v
              i += 1
            }
            j += 1
          }
          // round 18: the sparse IRLS working-response solves take the
          // same per-Newton strong-rule screen as the dense routes
          // (round 17) — exact by KKT backcheck, same gates; the
          // centered/standardized Gram algebra above is unchanged
          val r =
            if (screenGlm && params.alpha > 0 && p >= ScreenMinP && l > 0)
              CoordinateDescent.solveScreened(aM, swxzStd.map(_ * ninv),
                swxStd.map(_ * ninv), wg.swz * ninv, wg.sw * ninv,
                lambdas(l), lambdas(l - 1), params.alpha, params.intercept,
                beta, thresh = newtonTol, maxIter = params.maxit,
                penaltyFactor = params.penaltyFactor,
                lower = loStd, upper = upStd)
            else CoordinateDescent.solve(aM, swxzStd.map(_ * ninv),
              swxStd.map(_ * ninv), wg.swz * ninv, wg.sw * ninv,
              lambdas(l), params.alpha, params.intercept, beta,
              thresh = newtonTol, maxIter = params.maxit,
              penaltyFactor = params.penaltyFactor,
              lower = loStd, upper = upStd)
          var maxD = math.abs(r.a0 - a0)
          j = 0
          while (j < p) {
            val d = math.abs(r.beta(j) - beta(j)); if (d > maxD) maxD = d; j += 1
          }
          beta = r.beta; a0 = r.a0
          iter += 1
          if (maxD < math.max(params.thresh * 1e-2, 1e-8)) done = true
        }
        for (j <- 0 until p) betaOut(l)(0)(j) = beta(j) / scale(j)
        a0Out(l)(0) =
          if (params.intercept) a0 - (0 until p).map(j => betaOut(l)(0)(j) * mean(j)).sum
          else a0
        if (!dfGate.admit(j => betaOut(l)(0)(j) != 0.0)) dfStop = l
      }

      // deviance pass on original-scale coefficients (sparse eta)
      val featureNames = (0 until p).map(j => s"V$j").toArray
      if (binomial) {
        val pBar = yBar
        val nullP = if (params.intercept) pBar else 0.5
        val nulldev = -2.0 * n * (safeXLog(pBar, nullP) + safeXLog(1 - pBar, 1 - nullP))
        val devs = rows.treeAggregate(new Array[Double](L))(
          seqOp = (acc, r) => {
            val (idx, vals, y, vn) = r
            var l = 0
            while (l < L) {
              var eta = a0Out(l)(0)
              val bl = betaOut(l)(0)
              var i = 0
              while (i < idx.length) { eta += bl(idx(i)) * vals(i); i += 1 }
              val m = math.max(eta, 0.0)
              acc(l) += vn *
                (2.0 * (m + math.log(math.exp(-m) + math.exp(eta - m)) - y * eta))
              l += 1
            }
            acc
          },
          combOp = (a, b) => { var i = 0; while (i < L) { a(i) += b(i); i += 1 }; a },
          depth = 2)
        passes += 1
        val devRatio = devs.map(d => if (nulldev > 0) 1.0 - d / nulldev else 0.0)
        dfTruncate(new SgdNetModel("binomial", featureNames, Array(labelCol),
          classes, lambdas, a0Out, betaOut, nulldev, devRatio, g.n, passes,
          params), params)
      } else {
        val muNull = if (params.intercept) yBar else 1.0
        val devs = rows.treeAggregate(new Array[Double](L + 1))(
          seqOp = (acc, r) => {
            val (idx, vals, y, vn) = r
            def devTerm(mu: Double): Double = {
              val ylog = if (y > 0) y * math.log(y / mu) else 0.0
              2.0 * (ylog - (y - mu))
            }
            var l = 0
            while (l < L) {
              var eta = a0Out(l)(0)
              val bl = betaOut(l)(0)
              var i = 0
              while (i < idx.length) { eta += bl(idx(i)) * vals(i); i += 1 }
              acc(l) += vn *
                devTerm(math.exp(math.max(math.min(eta, 30.0), -30.0)))
              l += 1
            }
            acc(L) += vn * devTerm(muNull)
            acc
          },
          combOp = (a, b) => { var i = 0; while (i <= L) { a(i) += b(i); i += 1 }; a },
          depth = 2)
        passes += 1
        val nulldev = devs.last
        val devRatio = Array.tabulate(L)(l =>
          if (nulldev > 0) 1.0 - devs(l) / nulldev else 0.0)
        dfTruncate(new SgdNetModel("poisson", featureNames, Array(labelCol),
          Array.empty, lambdas, a0Out, betaOut, nulldev, devRatio, g.n,
          passes, params), params)
      }
    } finally raw.unpersist(blocking = false)
  }

  /** Uncentered weighted-moment accumulator for the sparse IRLS pass. */
  private final class SpWGram(p: Int) extends Serializable {
    var sw = 0.0; var swz = 0.0
    val swx = new Array[Double](p)
    val swxz = new Array[Double](p)
    val swxx = new Array[Double](LinAlg.triSize(p))
    def merge(o: SpWGram): SpWGram = {
      sw += o.sw; swz += o.swz
      var i = 0
      while (i < swx.length) { swx(i) += o.swx(i); swxz(i) += o.swxz(i); i += 1 }
      i = 0
      while (i < swxx.length) { swxx(i) += o.swxx(i); i += 1 }
      this
    }
  }

  // ---------------------------------------------------------------- gaussian

  private def fitGaussianLike(df: DataFrame, featureCols: Seq[String],
                              labelCols: Seq[String], params: SgdNetParams): SgdNetModel = {
    val rdd = SufficientStats.toRdd(df, featureCols, labelCols)
    val g = SufficientStats.compute(rdd, featureCols.size, labelCols.size)
    solveGaussianFromStats(g, featureCols, labelCols, params)
  }

  /** L2-penalty multiplier under [[SgdNetParams.sgdnetCompat]]: the
    * reference's implemented penalty construction divides the working
    * penalties by max(y_scale) (src/utils.h:170-180), which on the
    * original scale leaves L1 alone and scales L2 by 1/sd_pop(y) —
    * gaussian single-response only (every other family keeps
    * y_scale = 1). `yVar` must be ORIGINAL-scale population variances.
    * A constant response (sd 0) degrades to 1 — the reference's lambda
    * path is all-zero there anyway. */
  private[ml] def compatL2Scale(params: SgdNetParams, k: Int,
                                yVar: Array[Double]): Double =
    if (params.sgdnetCompat && k == 1) {
      val s = math.sqrt(yVar(0))
      if (s > 0) 1.0 / s else 1.0
    } else 1.0

  /** Solve the full gaussian/mgaussian path from one-pass statistics. */
  /** Features below this count solve the full CD problem directly —
    * screening bookkeeping isn't worth it, and the small-p paths (every
    * oracle query) keep their exact round-15 arithmetic. At or above
    * it, [[solveGaussianFromStats]] runs the SEQUENTIAL STRONG RULE
    * (Tibshirani et al. 2012, "Strong rules for discarding predictors
    * in lasso-type problems", JRSS-B 74(2)) with an exact KKT
    * backcheck — the screened path is EQUAL to the unscreened one by
    * construction, it just solves a |active|-sized subproblem per
    * lambda instead of a p-sized one. */
  private[ml] val ScreenMinP: Int = 32
  /** Test seam (round 18): disables the per-Newton IRLS strong-rule
    * screen so chassis-level specs can assert screened == unscreened
    * through the REAL dense/sparse fit routes (not just the solver).
    * Production code never touches it. */
  @volatile private[graft] var screenGlm: Boolean = true

  private[ml] def solveGaussianFromStats(g: GramStats, featureCols: Seq[String],
                                     labelCols: Seq[String],
                                     params: SgdNetParams,
                                     screen: Boolean = true): SgdNetModel = {
    val p = featureCols.size
    val k = labelCols.size
    require(g.n > 0, "the response (y) is empty.")
    val raw = SufficientStats.standardize(g, params.standardize, params.intercept)

    // optional response standardization (mgaussian only): pure moment math
    val yScale: Array[Double] =
      if (params.standardizeResponse)
        raw.yVar.map(v => { val s = math.sqrt(v); if (s > 0) s else 1.0 })
      else Array.fill(k)(1.0)
    // sgdnetCompat: L2 term scaled by 1/sd_pop(y) (see SgdNetParams);
    // single-response gaussian only — the reference's y_scale is 1 for
    // every other family, and its mgaussian Standardize(y) never writes
    // y_scale either (families.h:340-346), so max(y_scale) stays 1 there
    val l2Scale = compatL2Scale(params, k, raw.yVar)
    val st = raw.copy(
      b = Array.tabulate(k, p)((t, j) => raw.b(t)(j) / yScale(t)),
      yMean = Array.tabulate(k)(t => raw.yMean(t) / yScale(t)),
      yVar = Array.tabulate(k)(t => raw.yVar(t) / (yScale(t) * yScale(t))))

    require(params.penaltyFactor == null ||
      (params.penaltyFactor.length == p && params.penaltyFactor.forall(_ >= 0)),
      "penaltyFactor must have one non-negative entry per feature")
    // the unpenalized-coordinate lambda_max projection below is
    // single-response; the group path needs an explicit lambda there
    if (k > 1) requireNoZeroPf(params, "mgaussian group")
    val minRatio = if (params.lambdaMinRatio.isNaN)
      LambdaPath.defaultMinRatio(g.n, p) else params.lambdaMinRatio
    // lambda_max under penalty factors with UNPENALIZED coordinates
    // (pf = 0): glmnet semantics — those coordinates are fit exactly
    // first, and the path starts where every PENALIZED gradient of the
    // residual problem is dominated: max |c_j − A_jU·β_U| / pf_j. The
    // null-model bound would leave penalized coefficients live at the
    // first path point.
    val pathB: Array[Array[Double]] = {
      val pf = params.penaltyFactor
      if (params.lambda != null || pf == null || !pf.contains(0.0)) st.b
      else {
        val unpen = (0 until p).filter(j => pf(j) == 0.0)
        val aU = Array.tabulate(unpen.size, unpen.size)((i2, j2) =>
          st.gram(unpen(i2))(unpen(j2)))
        val sol = LinAlg.solve(aU, unpen.map(j => st.b(0)(j)).toArray)
        Array(Array.tabulate(p)(j => st.b(0)(j) -
          unpen.zipWithIndex.map { case (u, i2) =>
            st.gram(j)(u) * sol(i2) }.sum))
      }
    }
    val lambdas = if (params.lambda != null) params.lambda
      else LambdaPath.build(pathB, params.alpha, params.nlambda, minRatio,
        params.penaltyFactor)

    val scale = if (params.standardize) st.xSd else Array.fill(p)(1.0)
    // null deviance: intercept-model RSS (or zero-model if no intercept).
    // ySecond is on the response-STANDARDIZED scale (matching the fit);
    // nulldev is reported on the ORIGINAL y scale (ySecond * yScale^2),
    // the same scale rss is converted to below — so dev.ratio never mixes
    // the two even when standardizeResponse=true.
    val ySecond = Array.tabulate(k) { t =>
      if (params.intercept) st.yVar(t) else st.yVar(t) + st.yMean(t) * st.yMean(t)
    }
    val nulldev = g.n * (0 until k).map(t => ySecond(t) * yScale(t) * yScale(t)).sum

    val L = lambdas.length
    val a0 = Array.ofDim[Double](L, k)
    val beta = Array.ofDim[Double](L, k, p)
    val devRatio = new Array[Double](L)
    var warm = Array.ofDim[Double](k, p)
    var totalIters = 0
    val (loStd, upStd) =
      if (k == 1) boundsStd(params, scale, yScale(0)) else (null, null)
    // mgaussian limits (round 16 — the boxed group prox closes the
    // documented gap): per-response standardized bounds [k][p], since
    // standardize.response makes the working bound response-specific
    val (loG, upG) =
      if (k == 1 || (params.lowerLimits == null && params.upperLimits == null))
        (null, null)
      else {
        val rows = (0 until k).map(t => boundsStd(params, scale, yScale(t)))
        (rows.map(_._1).toArray, rows.map(_._2).toArray)
      }

    // strong-rule screening applies to the single-response l1-bearing
    // path at scale (alpha = 0 keeps every coordinate by definition)
    val useScreen = screen && k == 1 && params.alpha > 0 && p >= ScreenMinP

    /** One screened path point: sequential strong rule from the
      * previous solution's gradient, CD on the surviving subproblem,
      * then the exact KKT sweep over the discarded coordinates —
      * violators (rare; the rule's assumption is unit-slope gradient
      * paths) re-enter and the subproblem re-solves, so the final
      * coefficients satisfy the FULL problem's optimality conditions:
      * equality with the unscreened solve is structural, not
      * approximate. Discarded coordinates hold beta = 0 (they were
      * zero in the warm start by construction of the active set). */
    /** Full (unscreened) solve at one point — the dense-regime route
      * and the gate fallback. */
    def fullSolve(lam: Double, w0: Array[Double]): (Array[Double], Int) = {
      val r = CoordinateDescent.solve(st.gram, st.b(0),
        new Array[Double](p), 0.0, 1.0, lam, params.alpha,
        intercept = false, init = w0,
        thresh = params.thresh * 1e-4, maxIter = params.maxit,
        l2Scale = l2Scale, penaltyFactor = params.penaltyFactor,
        lower = loStd, upper = upStd)
      (r.beta, r.iters)
    }

    def screenSolve(lam: Double, lamPrev: Double,
                    w0: Array[Double]): (Array[Double], Int) = {
      val pf = params.penaltyFactor
      // DENSITY GATE: screening pays off while solutions are sparse
      // (p >> n or the upper path); once the active set approaches p,
      // the subproblem IS the full problem and the bookkeeping
      // (gradient pass, submatrix copies, KKT sweeps) only adds cost —
      // measured 7x slower at df ~= p vs 2x faster at df << p. A dense
      // warm start means a dense next point: take the direct route.
      val nz0 = (0 until p).filter(j => w0(j) != 0.0).toArray
      if (nz0.length * 2 > p) return fullSolve(lam, w0)
      // gradient of the working objective at the warm solution:
      // grad_j = c_j − (A·w0)_j, with A·w0 over w0's nonzeros only
      val grad = new Array[Double](p)
      var j = 0
      while (j < p) {
        var s = 0.0
        val gj = st.gram(j)
        var i = 0
        while (i < nz0.length) { s += gj(nz0(i)) * w0(nz0(i)); i += 1 }
        grad(j) = st.b(0)(j) - s
        j += 1
      }
      val bound = params.alpha * (2.0 * lam - lamPrev)
      val inAct = new Array[Boolean](p)
      val act = scala.collection.mutable.ArrayBuffer.empty[Int]
      j = 0
      while (j < p) {
        val pfj = if (pf == null) 1.0 else pf(j)
        // keep: warm-nonzero, unpenalized, or strong-rule survivors
        if (w0(j) != 0.0 || pfj == 0.0 || math.abs(grad(j)) >= bound * pfj) {
          inAct(j) = true; act += j
        }
        j += 1
      }
      // same gate on the PROPOSED set: a strong set near p gains nothing
      if (act.length * 2 > p) return fullSolve(lam, w0)
      val out = w0.clone()
      var iters = 0
      var done = false
      while (!done) {
        val m = act.length
        val idx = act.toArray
        val aSub = Array.tabulate(m, m)((x, y) => st.gram(idx(x))(idx(y)))
        val cSub = Array.tabulate(m)(x => st.b(0)(idx(x)))
        val initSub = Array.tabulate(m)(x => out(idx(x)))
        val loS = if (loStd == null) null else Array.tabulate(m)(x => loStd(idx(x)))
        val upS = if (upStd == null) null else Array.tabulate(m)(x => upStd(idx(x)))
        val pfS = if (pf == null) null else Array.tabulate(m)(x => pf(idx(x)))
        val r = CoordinateDescent.solve(aSub, cSub,
          new Array[Double](m), 0.0, 1.0, lam, params.alpha,
          intercept = false, init = initSub,
          thresh = params.thresh * 1e-4, maxIter = params.maxit,
          l2Scale = l2Scale, penaltyFactor = pfS,
          lower = loS, upper = upS)
        iters += r.iters
        var x = 0
        while (x < m) { out(idx(x)) = r.beta(x); x += 1 }
        // exact KKT over the discarded coordinates (all at beta = 0):
        // subgradient optimality is |c_j − A_j,act·beta| <= lam*alpha*pf_j
        // (the L2 term's gradient vanishes at 0); tolerance tracks the
        // CD convergence threshold so finite-precision actives don't
        // spuriously re-enter
        val nz2 = idx.filter(out(_) != 0.0)
        // round 18: track the CD solve threshold (thresh*1e-4 above),
        // not 1e-2 — the same slack class tightened in solveScreened
        val tol = math.max(params.thresh * 1e-4, 1e-12) * math.max(lam, 1.0)
        var violations = 0
        j = 0
        while (j < p) {
          if (!inAct(j)) {
            var s = 0.0
            val gj = st.gram(j)
            var i = 0
            while (i < nz2.length) { s += gj(nz2(i)) * out(nz2(i)); i += 1 }
            val pfj = if (pf == null) 1.0 else pf(j)
            if (math.abs(st.b(0)(j) - s) > lam * params.alpha * pfj + tol) {
              inAct(j) = true; act += j; violations += 1
            }
          }
          j += 1
        }
        done = violations == 0
      }
      (out, iters)
    }

    val dfGate = new DfGate(params, p)
    var cutL = L
    var l = 0
    while (l < L) {
      val lam = lambdas(l)
      val (sol, iters) =
        if (k == 1) {
          if (useScreen && l > 0) {
            val (b1, it1) = screenSolve(lam, lambdas(l - 1), warm(0))
            (Array(b1), it1)
          } else {
            val r = CoordinateDescent.solve(st.gram, st.b(0),
              new Array[Double](p), 0.0, 1.0, lam, params.alpha,
              intercept = false, init = warm(0),
              thresh = params.thresh * 1e-4, maxIter = params.maxit,
              l2Scale = l2Scale, penaltyFactor = params.penaltyFactor,
              lower = loStd, upper = upStd)
            (Array(r.beta), r.iters)
          }
        } else {
          CoordinateDescent.solveGroup(st.gram, st.b, lam, params.alpha,
            warm, thresh = params.thresh * 1e-4, maxIter = params.maxit,
            penaltyFactor = params.penaltyFactor, lower = loG, upper = upG)
        }
      warm = sol
      totalIters += iters
      // glmnet dfmax/pmax: a violating point is dropped and the path
      // stops (the shorter lambda sequence is returned)
      if (!dfGate.admit(j => (0 until k).exists(t => sol(t)(j) != 0.0))) {
        cutL = l
        l = L
      } else {
        var rss = 0.0
        for (t <- 0 until k) {
          val bt = sol(t)
          // RSS/n on working scale = E[yc^2] - 2 b.beta + beta' G beta
          var bb = 0.0; var gq = 0.0
          var j = 0
          while (j < p) {
            bb += st.b(t)(j) * bt(j)
            var m = 0
            var s = 0.0
            while (m < p) { s += st.gram(j)(m) * bt(m); m += 1 }
            gq += bt(j) * s
            j += 1
          }
          rss += (ySecond(t) - 2 * bb + gq) * yScale(t) * yScale(t)
          for (j2 <- 0 until p) beta(l)(t)(j2) = bt(j2) / scale(j2) * yScale(t)
          a0(l)(t) = if (params.intercept)
            st.yMean(t) * yScale(t) - (0 until p).map(j3 => beta(l)(t)(j3) * st.xMean(j3)).sum
          else 0.0
        }
        devRatio(l) = if (nulldev > 0) 1.0 - g.n * rss / nulldev else 0.0
        l += 1
      }
    }
    require(cutL > 0, "dfmax/pmax exclude every path point")

    new SgdNetModel(params.family, featureCols.toArray, labelCols.toArray,
      Array.empty, lambdas.take(cutL), a0.take(cutL), beta.take(cutL),
      nulldev, devRatio.take(cutL), g.n, totalIters, params)
  }

  /** Weighted gaussian elastic-net path (glmnet `weights`): minimizes
    * 1/(2W) Σ w_i(y_i − a0 − x_i'β)² + λ[(1−α)/2‖β‖² + α‖β‖₁] with
    * W = Σw. Weights are normalized to sum to n (the glmnet
    * convention — lambda values stay comparable to the unweighted
    * fit), then ONE weighted-moment treeAggregate feeds the exact
    * same path solver as [[fit]]: standardization, lambda path,
    * penalty factors, sgdnetCompat all apply on the WEIGHTED
    * moments. Integer weights reproduce row duplication exactly
    * (spec-verified). Zero weights are accepted and drop the
    * observation (the glmnet convention); the sum-to-n normalization
    * runs over the POSITIVE-weight rows only. */
  def fitWeighted(df: DataFrame, featureCols: Seq[String], labelCol: String,
                  weightCol: String,
                  params: SgdNetParams = SgdNetParams()): SgdNetModel = {
    validateCommon(featureCols, Seq(labelCol), params)
    params.family match {
      case "gaussian" =>
        fitWeightedMulti(df, featureCols, Seq(labelCol), weightCol, params)
      case "binomial" | "poisson" =>
        fitWeightedGlm(df, featureCols, labelCol, weightCol, params)
      case "multinomial" =>
        fitWeightedMultinomial(df, featureCols, labelCol, weightCol, params)
      case f => throw new IllegalArgumentException(
        s"fitWeighted supports gaussian, binomial, poisson, multinomial, " +
          s"and (via fitWeightedMulti) mgaussian, not $f")
    }
  }

  /** Multi-response weighted fit (glmnet `weights` with
    * family = "mgaussian", and the gaussian k = 1 case): identical
    * weighted-moment construction to the single-response route — the
    * GramStats carry k response columns and the group solver couples
    * them only driver-side, so weights fold into ONE treeAggregate
    * regardless of k. */
  def fitWeightedMulti(df: DataFrame, featureCols: Seq[String],
                       labelCols: Seq[String], weightCol: String,
                       params: SgdNetParams = SgdNetParams()): SgdNetModel = {
    validateCommon(featureCols, labelCols, params)
    require(params.family == "gaussian" || params.family == "mgaussian",
      s"fitWeightedMulti is the gaussian/mgaussian route, not ${params.family}")
    require(params.family == "mgaussian" || labelCols.size == 1,
      "response for gaussian must be one-dimensional (family=\"mgaussian\" for multi)")
    val g = weightedGramStats(df, featureCols, labelCols, weightCol)
    solveGaussianFromStats(g, featureCols, labelCols, params)
  }

  /** ONE-pass sum-to-n-normalized weighted moments — the statistics a
    * weighted gaussian/mgaussian fit solves from, shared by
    * [[fitWeightedMulti]], [[relaxedFitWeighted]], and the weighted
    * refit route. w == 0 drops the observation (glmnet accepts it);
    * n counts the kept rows so the normalization runs over them only. */
  private[ml] def weightedGramStats(df: DataFrame, featureCols: Seq[String],
                                    labelCols: Seq[String],
                                    weightCol: String): GramStats = {
    import org.apache.spark.sql.functions.col
    val p = featureCols.size
    val k = labelCols.size
    val rows = df.select((featureCols.map(c => col(c).cast("double")) ++
        labelCols.map(c => col(c).cast("double")) :+
        col(weightCol).cast("double")): _*)
      .rdd.map { r =>
        val x = Array.tabulate(p)(j => r.getDouble(j))
        val y = Array.tabulate(k)(t => r.getDouble(p + t))
        (x, y, r.getDouble(p + k))
      }
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val (nRows, wSum) = rows.treeAggregate((0L, 0.0))(
        seqOp = (s, r) => {
          require(r._3 >= 0, "weights must be non-negative")
          if (r._3 > 0) (s._1 + 1, s._2 + r._3) else s
        },
        combOp = (a, b) => (a._1 + b._1, a._2 + b._2), depth = 2)
      require(nRows > 0, "the response (y) is empty.")
      val norm = nRows.toDouble / wSum
      rows.treeAggregate(new GramStats(p, k))(
        seqOp = (s, r) =>
          if (r._3 > 0) s.addWeighted(r._1, r._2, r._3 * norm) else s,
        combOp = (a, b) => a.merge(b), depth = 2)
    } finally { rows.unpersist(blocking = false); () }
  }

  /** Weighted binomial/poisson elastic-net path (glmnet `weights` for
    * the IRLS families): frequency weights v_i (normalized to sum to n,
    * the glmnet convention) FOLD INTO the IRLS working weights — every
    * gram accumulation uses v_i·w_i where w_i is the family's IRLS
    * weight at the current linear predictor, the working response
    * z_i = eta_i + (y_i − mu_i)/w_i is unchanged, and every deviance
    * term is scaled by v_i. Standardization, the lambda path, penalty
    * factors, and box limits all apply on the WEIGHTED moments, so
    * integer weights reproduce row duplication exactly
    * (spec-verified), and the same distributed shape holds: one
    * `treeAggregate` per Newton step, driver CD on p² moments. */
  private def fitWeightedGlm(df: DataFrame, featureCols: Seq[String],
                             labelCol: String, weightCol: String,
                             params: SgdNetParams): SgdNetModel = {
    import org.apache.spark.sql.functions.col
    val p = featureCols.size
    val binomial = params.family == "binomial"
    val classes: Array[String] =
      if (binomial) {
        val cs = df.select(col(labelCol).cast("string")).distinct()
          .limit(3).collect().map(_.getString(0)).sorted
        require(cs.length == 2,
          if (cs.length > 2) "more than two classes in response. Are you looking for family = 'multinomial'?"
          else "only one class in response.")
        cs
      } else Array.empty
    val yCol =
      if (binomial) (col(labelCol).cast("string") === classes(1)).cast("double")
      else col(labelCol).cast("double")
    val raw = df.select((featureCols.map(c => col(c).cast("double")) ++
        Seq(yCol, col(weightCol).cast("double"))): _*)
      .rdd.map { r =>
        val x = new Array[Double](p)
        var j = 0
        while (j < p) { x(j) = r.getDouble(j); j += 1 }
        (x, r.getDouble(p), r.getDouble(p + 1))
      }.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // w == 0 drops the observation (glmnet accepts it); n counts the
      // kept rows so the sum-to-n normalization runs over them only
      val (nRows, wSum) = raw.treeAggregate((0L, 0.0))(
        seqOp = (s, r) => {
          require(r._3 >= 0, "weights must be non-negative")
          if (r._3 > 0) (s._1 + 1, s._2 + r._3) else s
        },
        combOp = (a, b) => (a._1 + b._1, a._2 + b._2), depth = 2)
      require(nRows > 0, "the response (y) is empty.")
      val norm = nRows.toDouble / wSum
      // rows carry the PRE-normalized weight: moments divide by n below
      val rows = raw.filter(_._3 > 0).map(r => (r._1, r._2, r._3 * norm))
      val g = rows.treeAggregate(new GramStats(p, 1))(
        seqOp = (s, r) => s.addWeighted(r._1, Array(r._2), r._3),
        combOp = (a, b) => a.merge(b), depth = 2)
      val st = SufficientStats.standardize(g, params.standardize, params.intercept)
      val n = g.n.toDouble
      val yBar = st.yMean(0) // weighted mean of y
      if (!binomial) require(yBar > 0, "poisson response must contain positive counts")

      require(params.penaltyFactor == null ||
        (params.penaltyFactor.length == p && params.penaltyFactor.forall(_ >= 0)),
        "penaltyFactor must have one non-negative entry per feature")
      val mean = if (params.intercept) st.xMean else new Array[Double](p)
      val scale = if (params.standardize) st.xSd else Array.fill(p)(1.0)
      val a0Null =
        if (!params.intercept) 0.0
        else if (binomial) {
          if (yBar > 0 && yBar < 1) math.log(yBar / (1 - yBar)) else 0.0
        } else math.log(yBar)

      // one weighted IRLS gram pass at (beta, a0) — shared by the path
      // solve, the pf==0 projection, and the per-lambda Newton loop
      def gramAt(beta: Array[Double], a0: Double): WGram =
        rows.treeAggregate(new WGram(p))(
          seqOp = (s, xyv) => {
            val (xr, y, v) = xyv
            val xs = new Array[Double](p)
            var j = 0
            var eta = a0
            while (j < p) {
              xs(j) = (xr(j) - mean(j)) / scale(j)
              eta += xs(j) * beta(j)
              j += 1
            }
            var w = 0.0
            var z = 0.0
            if (binomial) {
              val mu = 1.0 / (1.0 + math.exp(-eta))
              w = math.max(mu * (1.0 - mu), 1e-5)
              z = eta + (y - mu) / w
            } else {
              val etaC = math.max(math.min(eta, 30.0), -30.0)
              val mu = math.exp(etaC)
              w = math.max(mu, 1e-5)
              z = etaC + (y - mu) / w
            }
            val wv = w * v // frequency weight folds into the IRLS weight
            s.sw += wv; s.swz += wv * z
            j = 0
            while (j < p) {
              val wxj = wv * xs(j)
              s.swx(j) += wxj
              s.swxz(j) += wxj * z
              var i = 0
              val base = j * (j + 1) / 2
              while (i <= j) { s.swxx(base + i) += xs(i) * wxj; i += 1 }
              j += 1
            }
            s
          },
          combOp = (a, b) => {
            a.sw += b.sw; a.swz += b.swz
            var i = 0
            while (i < a.swx.length) {
              a.swx(i) += b.swx(i); a.swxz(i) += b.swxz(i); i += 1
            }
            i = 0
            while (i < a.swxx.length) { a.swxx(i) += b.swxx(i); i += 1 }
            a
          }, depth = 2)

      val minRatio = if (params.lambdaMinRatio.isNaN)
        LambdaPath.defaultMinRatio(g.n, p) else params.lambdaMinRatio
      val (loStd, upStd) = boundsStd(params, scale, 1.0)
      val lambdas = if (params.lambda != null) params.lambda
        else {
          val pf = params.penaltyFactor
          val pathB =
            if (pf == null || !pf.contains(0.0)) st.b
            else Array(pfZeroPathGradient(p, n, pf, params.intercept,
              a0Init = a0Null, thresh = params.thresh, maxit = params.maxit,
              gramAt = gramAt, userLo = loStd, userUp = upStd))
          LambdaPath.build(pathB, params.alpha, params.nlambda, minRatio, pf)
        }

      val L = lambdas.length
      val a0Out = Array.ofDim[Double](L, 1)
      val betaOut = Array.ofDim[Double](L, 1, p)
      var beta = new Array[Double](p)
      var a0 = a0Null
      var passes = 0
      val newtonTol = math.max(params.thresh * 1e-4, 1e-10)

      // round 17: TRUE dfmax/pmax early stopping on this route — the
      // first violating path point stops the remaining lambdas' IRLS
      // cluster passes; the violating point carries forward so the
      // post-hoc dfTruncate slices the path at it (identical surface)
      val dfGate = new DfGate(params, p)
      var dfStop = -1
      for (l <- 0 until L) if (dfStop >= 0) {
        a0Out(l)(0) = a0Out(dfStop)(0)
        betaOut(l)(0) = betaOut(dfStop)(0)
      } else {
        var iter = 0
        var done = false
        while (iter < 25 && !done) {
          val wg = gramAt(beta, a0)
          passes += 1
          val ninv = 1.0 / n
          val aM = LinAlg.unpackSym(wg.swxx, p).map(_.map(_ * ninv))
          val r = CoordinateDescent.solve(aM, wg.swxz.map(_ * ninv),
            wg.swx.map(_ * ninv), wg.swz * ninv, wg.sw * ninv,
            lambdas(l), params.alpha, params.intercept, beta,
            thresh = newtonTol, maxIter = params.maxit,
            penaltyFactor = params.penaltyFactor,
            lower = loStd, upper = upStd)
          var maxD = math.abs(r.a0 - a0)
          var j = 0
          while (j < p) {
            val d = math.abs(r.beta(j) - beta(j)); if (d > maxD) maxD = d; j += 1
          }
          beta = r.beta; a0 = r.a0
          iter += 1
          if (maxD < math.max(params.thresh * 1e-2, 1e-8)) done = true
        }
        for (j <- 0 until p) betaOut(l)(0)(j) = beta(j) / scale(j)
        a0Out(l)(0) =
          if (params.intercept) a0 - (0 until p).map(j => betaOut(l)(0)(j) * mean(j)).sum
          else a0
        if (!dfGate.admit(j => betaOut(l)(0)(j) != 0.0)) dfStop = l
      }

      // v-weighted deviance pass for every lambda + the null model
      val devs = rows.treeAggregate(new Array[Double](L + 1))(
        seqOp = (acc, xyv) => {
          val (x, y, v) = xyv
          def binDev(eta: Double): Double = {
            val m = math.max(eta, 0.0)
            2.0 * (m + math.log(math.exp(-m) + math.exp(eta - m)) - y * eta)
          }
          def poisDev(mu: Double): Double = {
            val ylog = if (y > 0) y * math.log(y / mu) else 0.0
            2.0 * (ylog - (y - mu))
          }
          var l = 0
          while (l < L) {
            var eta = a0Out(l)(0)
            val bl = betaOut(l)(0)
            var j = 0
            while (j < p) { eta += bl(j) * x(j); j += 1 }
            acc(l) += v * (if (binomial) binDev(eta)
              else poisDev(math.exp(math.max(math.min(eta, 30.0), -30.0))))
            l += 1
          }
          acc(L) += v * (if (binomial) binDev(a0Null)
            else poisDev(if (params.intercept) yBar else 1.0))
          acc
        },
        combOp = (a, b) => { var i = 0; while (i <= L) { a(i) += b(i); i += 1 }; a },
        depth = 2)
      passes += 1
      val nulldev = devs(L)
      val devRatio = Array.tabulate(L)(l =>
        if (nulldev > 0) 1.0 - devs(l) / nulldev else 0.0)
      dfTruncate(new SgdNetModel(params.family, featureCols.toArray,
        Array(labelCol), classes, lambdas, a0Out, betaOut, nulldev, devRatio,
        g.n, passes, params), params)
    } finally { raw.unpersist(blocking = false); () }
  }

  /** Relaxed elastic-net path (glmnet `relax = TRUE`): for each lambda,
    * the UNPENALIZED least-squares refit restricted to that lambda's
    * active set, plus the γ-blend γ·penalized + (1−γ)·refit (γ=1 is
    * the original path, γ=0 fully relaxed). The reference has no
    * counterpart; glmnet users migrating through sgdnet ask for it
    * because the lasso's shrinkage bias on the SELECTED coefficients
    * is often unwanted once selection is done (Meinshausen 2007). */
  final case class RelaxedPath(model: SgdNetModel, olsA0: Array[Double],
                               olsBeta: Array[Array[Double]], gamma: Double) {
    def blendedA0(l: Int): Double =
      gamma * model.a0(l)(0) + (1 - gamma) * olsA0(l)
    def blendedBeta(l: Int): Array[Double] =
      Array.tabulate(model.beta(l)(0).length)(j =>
        gamma * model.beta(l)(0)(j) + (1 - gamma) * olsBeta(l)(j))
    /** Persist the relaxed path (round 17): the penalized model under
      * `<path>/penalized`, the active-set refits + gamma under
      * `<path>/refit` — restored by [[SgdNet.loadRelaxedPath]]. Same
      * overwrite contract as [[SgdNetModel.save]]. */
    def save(spark: org.apache.spark.sql.SparkSession, path: String,
             overwrite: Boolean = true): Unit = {
      import spark.implicits._
      SgdNetModel.checkOverwrite(spark, path, overwrite)
      model.save(spark, s"$path/penalized")
      olsA0.indices.map(l => (l, gamma, olsA0(l), olsBeta(l).toSeq))
        .toDF("lambda_idx", "gamma", "ols_a0", "ols_beta")
        .repartition(1).write.mode("overwrite").parquet(s"$path/refit")
    }
  }

  /** Restore a relaxed path persisted by [[RelaxedPath.save]]. */
  def loadRelaxedPath(spark: org.apache.spark.sql.SparkSession,
                      path: String): RelaxedPath = {
    val model = SgdNetModel.load(spark, s"$path/penalized")
    val rows = spark.read.parquet(s"$path/refit")
      .select("lambda_idx", "gamma", "ols_a0", "ols_beta")
      .collect().sortBy(_.getInt(0))
    RelaxedPath(model, rows.map(_.getDouble(2)),
      rows.map(_.getSeq[Double](3).toArray), rows.head.getDouble(1))
  }

  /** Fit the gaussian path, then refit each lambda's active set
    * unpenalized — from the SAME one-pass sufficient statistics, so
    * the relaxed path costs zero extra data passes: the active-set
    * normal equations gram_AA·x = b_A solve driver-side (active sets
    * are p-bounded). Empty active set refits to the intercept-only
    * model. */
  def relaxedFit(df: DataFrame, featureCols: Seq[String], labelCol: String,
                 params: SgdNetParams = SgdNetParams(),
                 gamma: Double = 1.0): RelaxedPath = {
    // binomial/poisson route to the IRLS refit (round 16); gaussian
    // keeps the one-pass moment route
    if (params.family == "binomial" || params.family == "poisson")
      return relaxedFitGlm(df, featureCols, labelCol, params, gamma)
    validateRelaxed(params, gamma)
    val rdd = SufficientStats.toRdd(df, featureCols, Seq(labelCol))
    val g = SufficientStats.compute(rdd, featureCols.size, 1)
    relaxedFromStats(g, featureCols, labelCol, params, gamma)
  }

  /** WEIGHTED relaxed fit (glmnet `relax = TRUE` + `weights`): the
    * active-set OLS refit runs on the same one-pass WEIGHTED moments
    * the penalized path solves from — v-weighted least squares on each
    * lambda's active set, zero extra data passes, exactly
    * [[relaxedFit]]'s shape. Integer weights reproduce row duplication
    * (spec). */
  /** Relaxed fit WITH a linear-predictor offset (round 17 — glmnet
    * relax = TRUE + offset, completing relax × offset): gaussian
    * delegates to the plain relax on the offset-adjusted response
    * (identity link — fitting y − offset IS the offset model, same
    * reduction as [[fitWithOffset]]); binomial/poisson route to the
    * offset-aware IRLS refit ([[relaxedFitGlm]]: η includes the
    * row's offset in every refit accumulation, the WLS target
    * excludes it, empty sets take the OFFSET null). `weightCol`
    * composes (offset + weights together). */
  def relaxedFitWithOffset(df: DataFrame, featureCols: Seq[String],
                           labelCol: String, offsetCol: String,
                           params: SgdNetParams = SgdNetParams(),
                           gamma: Double = 1.0,
                           weightCol: String = null): RelaxedPath = {
    import org.apache.spark.sql.functions.col
    if (params.family == "binomial" || params.family == "poisson")
      return relaxedFitGlm(df, featureCols, labelCol, params, gamma,
        weightCol, offsetCol)
    require(params.family == "gaussian",
      s"relaxed offset fit supports gaussian, binomial, poisson, not ${params.family}")
    val adj = df.select((featureCols.map(col) ++
      (if (weightCol == null) Nil else Seq(col(weightCol))) :+
      (col(labelCol).cast("double") - col(offsetCol).cast("double"))
        .as(labelCol)): _*)
    if (weightCol != null)
      relaxedFitWeighted(adj, featureCols, labelCol, weightCol, params, gamma)
    else relaxedFit(adj, featureCols, labelCol, params, gamma)
  }

  def relaxedFitWeighted(df: DataFrame, featureCols: Seq[String],
                         labelCol: String, weightCol: String,
                         params: SgdNetParams = SgdNetParams(),
                         gamma: Double = 1.0): RelaxedPath = {
    // binomial/poisson route to the weighted IRLS refit (round 17 —
    // glmnet relax = TRUE + weights for every family)
    if (params.family == "binomial" || params.family == "poisson")
      return relaxedFitGlm(df, featureCols, labelCol, params, gamma, weightCol)
    validateRelaxed(params, gamma)
    val g = weightedGramStats(df, featureCols, Seq(labelCol), weightCol)
    relaxedFromStats(g, featureCols, labelCol, params, gamma)
  }

  /** SPARSE relaxed fit (glmnet `relax = TRUE` with a dgCMatrix x,
    * round 16): ONE O(nnz²)-per-row sparse-moment pass feeds both the
    * penalized path and every active-set OLS refit — exactly
    * [[relaxedFit]]'s zero-extra-passes shape over CSR rows; with
    * `weightCol`, raw-v weighted moments normalized to sum-to-n (the
    * [[fitSparseWeighted]] convention). */
  def relaxedFitSparse(df: DataFrame, idxCol: String, valCol: String,
                       dim: Int, labelCol: String,
                       params: SgdNetParams = SgdNetParams(),
                       gamma: Double = 1.0,
                       weightCol: String = null): RelaxedPath = {
    requireGramP(dim)
    import org.apache.spark.sql.functions.{col, lit}
    // binomial/poisson route to the sparse IRLS refit (round 17 adds
    // the weighted cell — glmnet relax + weights with a dgCMatrix x)
    if (params.family == "binomial" || params.family == "poisson")
      return relaxedFitGlmSparse(df, idxCol, valCol, dim, labelCol, params,
        gamma, weightCol)
    validateRelaxed(params, gamma)
    val wCol = if (weightCol == null) lit(1.0) else col(weightCol).cast("double")
    val raw = df.select(col(idxCol), col(valCol).cast("array<double>"),
        col(labelCol).cast("double"), wCol)
      .rdd.map { row =>
        (row.getSeq[Int](0).toArray, row.getSeq[Double](1).toArray,
          row.getDouble(2), row.getDouble(3))
      }.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val norm =
        if (weightCol == null) 1.0
        else {
          val (nRows, wSum) = raw.treeAggregate((0L, 0.0))(
            seqOp = (s, r) => {
              require(r._4 >= 0, "weights must be non-negative")
              if (r._4 > 0) (s._1 + 1, s._2 + r._4) else s
            },
            combOp = (a, b) => (a._1 + b._1, a._2 + b._2), depth = 2)
          require(nRows > 0, "the response (y) is empty.")
          nRows.toDouble / wSum
        }
      val g = raw.filter(_._4 > 0).treeAggregate(new GramStats(dim, 1))(
        seqOp = (s, r) => s.addSparseWeighted(r._1, r._2, Array(r._3),
          r._4 * norm),
        combOp = (a, b) => a.merge(b), depth = 2)
      relaxedFromStats(g, (0 until dim).map(j => s"V$j"), labelCol, params,
        gamma)
    } finally { raw.unpersist(blocking = false); () }
  }

  private def validateRelaxed(params: SgdNetParams, gamma: Double): Unit = {
    require(params.family == "gaussian", "relaxedFit: gaussian family only")
    require(gamma >= 0 && gamma <= 1, "gamma must be in [0, 1]")
    require(!params.standardizeResponse,
      "relaxedFit: standardize.response is mgaussian-only")
  }

  /** Relaxed path for the IRLS families (round 16 — glmnet
    * `relax = TRUE` with family = binomial | poisson): the penalized
    * path from [[fit]], then for each lambda the UNPENALIZED IRLS
    * refit restricted to that lambda's active set. All lambdas' refits
    * advance TOGETHER: each Newton round is ONE treeAggregate in which
    * a row contributes its restricted weighted-moment block
    * (Σw, Σwz, Σw·x_A, Σw·x_A·z, Σw·x_A·x_A') to every unconverged
    * lambda, and the per-lambda unpenalized WLS systems solve
    * driver-side — so the refit stage costs a handful of cluster
    * passes regardless of path length, warm-started at the penalized
    * coefficients (no standardization: the unpenalized MLE is
    * scale-equivariant). An empty active set refits to the closed-form
    * null (logit(ȳ) / ln(ȳ)). The γ-blend semantics are
    * [[RelaxedPath]]'s. With `weightCol` (round 17 — glmnet
    * relax = TRUE + weights for the IRLS families) the penalized path
    * comes from [[fitWeighted]] and every refit accumulation folds the
    * raw v into the IRLS weight (the unpenalized WLS is
    * scale-invariant in the weights, so no renormalization; w = 0
    * drops the row; the null is the v-weighted mean). With `offsetCol`
    * (round 17 — glmnet relax = TRUE + offset) the penalized path
    * comes from the offset fits, every refit η includes the row's
    * offset while the WLS target excludes it (the solve fits exactly
    * a0 + x_A·β), and the empty-set null is the OFFSET null (poisson
    * closed-form exposure MLE; binomial via a driver Newton over
    * one-pair data passes, exact at the start for constant offsets). */
  def relaxedFitGlm(df: DataFrame, featureCols: Seq[String],
                    labelCol: String,
                    params: SgdNetParams,
                    gamma: Double = 1.0,
                    weightCol: String = null,
                    offsetCol: String = null): RelaxedPath = {
    import org.apache.spark.sql.functions.{col, lit}
    require(params.family == "binomial" || params.family == "poisson",
      s"relaxedFitGlm is the IRLS-family route (binomial|poisson), not ${params.family}")
    require(gamma >= 0 && gamma <= 1, "gamma must be in [0, 1]")
    val binomial = params.family == "binomial"
    val weighted = weightCol != null
    val hasOffset = offsetCol != null
    val model = (weighted, hasOffset) match {
      case (true, true) =>
        fitWithOffsetWeighted(df, featureCols, labelCol, offsetCol,
          weightCol, params)
      case (true, false) => fitWeighted(df, featureCols, labelCol, weightCol,
        params)
      case (false, true) => fitWithOffset(df, featureCols, labelCol,
        offsetCol, params)
      case (false, false) => fit(df, featureCols, labelCol, params)
    }
    val p = featureCols.size
    val yExpr =
      if (binomial) {
        val positive = model.classLabels(1)
        (col(labelCol).cast("string") === positive).cast("double")
      } else col(labelCol).cast("double")
    val wExpr = if (weighted) col(weightCol).cast("double") else lit(1.0)
    val oExpr = if (hasOffset) col(offsetCol).cast("double") else lit(0.0)
    val rows0 = df.select((featureCols.map(c => col(c).cast("double")) :+
        yExpr :+ wExpr :+ oExpr): _*)
      .rdd.map { r =>
        val x = new Array[Double](p)
        var j = 0
        while (j < p) { x(j) = r.getDouble(j); j += 1 }
        (x, r.getDouble(p), r.getDouble(p + 1), r.getDouble(p + 2))
      }
    val rows = (if (weighted)
        rows0.map { t => require(t._3 >= 0, "weights must be non-negative"); t }
          .filter(_._3 > 0)
      else rows0).persist(StorageLevel.MEMORY_AND_DISK)
    try relaxedGlmRefit(rows, model, params, gamma, hasOffset)
    finally { rows.unpersist(blocking = false); () }
  }

  /** Lockstep unpenalized IRLS refits of a fitted GLM path's active
    * sets over (x, y, v, off) rows — the [[relaxedFitGlm]] refit stage
    * as a standalone: every cluster pass accumulates only the
    * RESTRICTED per-lambda moment blocks (O(Σ_live |A_l|²) per row,
    * never p²), so the LARGE-P screened penalized paths
    * (`LargeP.relaxedFitBinomial`/`relaxedFitPoisson`) reuse it
    * unchanged — the refit machinery never had a p² term to remove.
    * Weights enter RAW (the WLS solves and the null closed forms are
    * invariant to uniform weight scaling, so raw v and sum-to-n
    * normalized vn give identical refits). */
  private[ml] def relaxedGlmRefit(rows: RDD[(Array[Double], Double, Double, Double)],
                                  model: SgdNetModel, params: SgdNetParams,
                                  gamma: Double, hasOffset: Boolean): RelaxedPath = {
    val binomial = params.family == "binomial"
    locally {
      val L = model.lambda.length
      val active: Array[Array[Int]] =
        model.beta.map(bl => bl(0).indices.filter(bl(0)(_) != 0.0).toArray)
      val a0R = Array.tabulate(L)(l => model.a0(l)(0))
      val bR = Array.tabulate(L)(l => model.beta(l)(0).clone())
      val done = new Array[Boolean](L)
      // empty active sets refit to the closed-form (v-weighted) null —
      // the OFFSET null when an offset rides along
      if (active.exists(_.isEmpty)) {
        val a0Null =
          if (!params.intercept) 0.0
          else if (!hasOffset) {
            val (sy, n) = rows.treeAggregate((0.0, 0.0))(
              (s, r) => (s._1 + r._3 * r._2, s._2 + r._3),
              (a, b) => (a._1 + b._1, a._2 + b._2), depth = 2)
            val ybar = sy / n
            if (binomial) math.log(ybar / (1 - ybar)) else math.log(ybar)
          } else if (!binomial) {
            // poisson exposure MLE: a0 = ln(Σv·y / Σv·e^off)
            val (sy, se) = rows.treeAggregate((0.0, 0.0))(
              (s, r) => (s._1 + r._3 * r._2, s._2 + r._3 * math.exp(
                math.max(math.min(r._4, 30.0), -30.0))),
              (a, b) => (a._1 + b._1, a._2 + b._2), depth = 2)
            math.log(sy / se)
          } else {
            // binomial offset null: Newton on Σv·σ(a0+off) = Σv·y from
            // the mean-offset-shifted logit (exact for constant offsets)
            val (sy, sv, so) = rows.treeAggregate((0.0, 0.0, 0.0))(
              (s, r) => (s._1 + r._3 * r._2, s._2 + r._3, s._3 + r._3 * r._4),
              (a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3), depth = 2)
            val ybar = sy / sv
            var a0n = math.log(ybar / (1 - ybar)) - so / sv
            var it = 0
            var doneN = false
            while (!doneN && it < 50) {
              val (g, h) = rows.treeAggregate((0.0, 0.0))(
                (s, r) => {
                  val mu = 1.0 / (1.0 + math.exp(-(a0n + r._4)))
                  (s._1 + r._3 * (mu - r._2), s._2 + r._3 * mu * (1.0 - mu))
                },
                (a, b) => (a._1 + b._1, a._2 + b._2), depth = 2)
              if (math.abs(g / sv) < 1e-12 || h <= 0) doneN = true
              else { a0n -= g / h; it += 1 }
            }
            a0n
          }
        for (l <- 0 until L if active(l).isEmpty) {
          a0R(l) = a0Null
          java.util.Arrays.fill(bR(l), 0.0)
          done(l) = true
        }
      }
      // restricted-moment layout per unconverged lambda:
      // [Σw, Σwz, Σw·x_A (m), Σw·x_A·z (m), packed Σw·x·x' (tri(m))]
      val sc = rows.sparkContext
      val tol = math.max(params.thresh * 1e-2, 1e-8)
      var iter = 0
      while (iter < 25 && !done.forall(identity)) {
        val live = (0 until L).filter(!done(_)).toArray
        val sizes = live.map(l => 2 + 2 * active(l).length +
          LinAlg.triSize(active(l).length))
        val offs = sizes.scanLeft(0)(_ + _)
        val total = offs.last
        val bState = sc.broadcast((live, live.map(active(_)),
          live.map(a0R(_)), live.map(bR(_)), offs))
        val acc = rows.treeAggregate(new Array[Double](total))(
          (s, xy) => {
            val (x, y, v, off) = xy
            val (lv, acts, a0s, bs, os) = bState.value
            var i = 0
            while (i < lv.length) {
              val a = acts(i)
              val m = a.length
              var eta = a0s(i) + off
              var q = 0
              while (q < m) { eta += bs(i)(a(q)) * x(a(q)); q += 1 }
              var w = 0.0
              var z = 0.0
              if (binomial) {
                val mu = 1.0 / (1.0 + math.exp(-eta))
                w = math.max(mu * (1.0 - mu), 1e-5)
                z = eta + (y - mu) / w - off
              } else {
                val etaC = math.max(math.min(eta, 30.0), -30.0)
                val mu = math.exp(etaC)
                w = math.max(mu, 1e-5)
                z = etaC + (y - mu) / w - off
              }
              w *= v
              val base = os(i)
              s(base) += w
              s(base + 1) += w * z
              q = 0
              while (q < m) {
                val wx = w * x(a(q))
                s(base + 2 + q) += wx
                s(base + 2 + m + q) += wx * z
                var r2 = 0
                while (r2 <= q) {
                  s(base + 2 + 2 * m + LinAlg.triIdx(r2, q)) += wx * x(a(r2))
                  r2 += 1
                }
                q += 1
              }
              i += 1
            }
            s
          },
          (a, b) => { var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a },
          depth = 2)
        // per-lambda unpenalized WLS solve (intercept included)
        for (i <- live.indices) {
          val l = live(i)
          val a = active(l)
          val m = a.length
          val base = offs(i)
          val loA = if (params.lowerLimits == null) null
            else a.map(params.lowerLimits(_))
          val upA = if (params.upperLimits == null) null
            else a.map(params.upperLimits(_))
          val (na0, sol) = solveRestrictedWls(acc, base, m,
            params.intercept, loA, upA, a.map(bR(l)(_)), params.maxit)
          var maxD = math.abs(na0 - a0R(l))
          for (q <- 0 until m) {
            val d = math.abs(sol(q) - bR(l)(a(q)))
            if (d > maxD) maxD = d
          }
          a0R(l) = na0
          for (q <- 0 until m) bR(l)(a(q)) = sol(q)
          if (maxD < tol) done(l) = true
        }
        iter += 1
      }
      RelaxedPath(model, a0R, bR, gamma)
    }
  }

  private[ml] def relaxedFromStats(g: GramStats, featureCols: Seq[String],
                                   labelCol: String, params: SgdNetParams,
                                   gamma: Double): RelaxedPath = {
    val model = solveGaussianFromStats(g, featureCols, Seq(labelCol), params)
    val p = featureCols.size
    val st = SufficientStats.standardize(g, params.standardize, params.intercept)
    val scale = if (params.standardize) st.xSd else Array.fill(p)(1.0)
    val L = model.lambda.length
    val olsA0 = new Array[Double](L)
    val olsBeta = Array.ofDim[Double](L, p)
    val (loStdR, upStdR) = boundsStd(params, scale, 1.0)
    for (l <- 0 until L) {
      val active = (0 until p).filter(j => model.beta(l)(0)(j) != 0.0)
      if (active.nonEmpty) {
        val a = Array.tabulate(active.size, active.size)((i, j) =>
          st.gram(active(i))(active(j)))
        val bv = active.map(j => st.b(0)(j)).toArray
        // glmnet relax + lower/upper.limits (round 17): the refit
        // honors the ORIGINAL call's box — CD at λ = 0 with clipped
        // steps on standardized coordinates; unbounded keeps the exact
        // normal-equations solve bit-identically
        val sol =
          if (loStdR == null && upStdR == null) LinAlg.solve(a, bv)
          else CoordinateDescent.solve(a, bv,
            new Array[Double](active.size), 0.0, 1.0, 0.0, 1.0,
            intercept = false,
            active.map(j => model.beta(l)(0)(j) * scale(j)).toArray,
            thresh = 1e-12, maxIter = params.maxit,
            lower = if (loStdR == null) null else active.map(loStdR(_)).toArray,
            upper = if (upStdR == null) null else active.map(upStdR(_)).toArray
          ).beta
        active.zipWithIndex.foreach { case (j, i) =>
          olsBeta(l)(j) = sol(i) / scale(j)
        }
      }
      olsA0(l) = if (params.intercept)
        st.yMean(0) - (0 until p).map(j => olsBeta(l)(j) * st.xMean(j)).sum
      else 0.0
    }
    RelaxedPath(model, olsA0, olsBeta, gamma)
  }

  // ---------------------------------------------------------------- binomial

  private def fitBinomial(df: DataFrame, featureCols: Seq[String],
                          labelCol: String, params: SgdNetParams): SgdNetModel = {
    import org.apache.spark.sql.functions.col
    require(params.penaltyFactor == null ||
      (params.penaltyFactor.length == featureCols.size &&
        params.penaltyFactor.forall(_ >= 0)),
      "penaltyFactor must have one non-negative entry per feature")
    val p = featureCols.size
    val classes = df.select(col(labelCol).cast("string")).distinct()
      .limit(3).collect().map(_.getString(0)).sorted
    require(classes.length == 2,
      if (classes.length > 2) "more than two classes in response. Are you looking for family = 'multinomial'?"
      else "only one class in response.")
    val positive = classes(1)

    val rows = df.selectExpr(
        (featureCols.map(c => s"cast(`$c` as double)") :+
          s"cast(cast(`$labelCol` as string) = '$positive' as double)"): _*)
      .rdd.map { row =>
        val x = new Array[Double](p)
        var j = 0
        while (j < p) { x(j) = row.getDouble(j); j += 1 }
        (x, Array(row.getDouble(p)))
      }.persist(StorageLevel.MEMORY_AND_DISK)

    try fitBinomialImpl(rows, featureCols, labelCol, classes, params)
    finally rows.unpersist(blocking = false)
  }

  private def fitBinomialImpl(rows: RDD[(Array[Double], Array[Double])],
                              featureCols: Seq[String], labelCol: String,
                              classes: Array[String], params: SgdNetParams): SgdNetModel = {
    val p = featureCols.size
    val g = SufficientStats.compute(rows, p, 1)
    val st = SufficientStats.standardize(g, params.standardize, params.intercept)
    val n = g.n.toDouble
    val pBar = st.yMean(0)

    val mean = if (params.intercept) st.xMean else new Array[Double](p)
    val scale = if (params.standardize) st.xSd else Array.fill(p)(1.0)
    // lambda_max from the gradient of the *unpenalized logistic* loss at the
    // null model: (1/n)|<xs_j, y - pbar>| (glmnet convention). With
    // penaltyFactor entries of 0 the null model is the UNPENALIZED
    // sub-fit on those coordinates (same projection the gaussian
    // pathB applies) — a few extra IRLS passes, only on that edge.
    val minRatio = if (params.lambdaMinRatio.isNaN)
      LambdaPath.defaultMinRatio(g.n, p) else params.lambdaMinRatio
    val (loStd0, upStd0) = boundsStd(params, scale, 1.0)
    val lambdas = if (params.lambda != null) params.lambda
      else {
        val pf = params.penaltyFactor
        val pathB =
          if (pf == null || !pf.contains(0.0)) st.b
          else Array(pfZeroPathGradient(p, n, pf, params.intercept,
            a0Init = if (params.intercept && pBar > 0 && pBar < 1)
              math.log(pBar / (1 - pBar)) else 0.0,
            thresh = params.thresh, maxit = params.maxit,
            gramAt = (b, a) => weightedGram(rows, mean, scale, b, a)._1,
            userLo = loStd0, userUp = upStd0))
        LambdaPath.build(pathB, params.alpha, params.nlambda, minRatio, pf)
      }
    val sc = rows.sparkContext
    val bMean = sc.broadcast(mean)
    val bScale = sc.broadcast(scale)

    val L = lambdas.length
    val a0Out = Array.ofDim[Double](L, 1)
    val betaOut = Array.ofDim[Double](L, 1, p)
    var beta = new Array[Double](p) // standardized scale
    var a0 = if (params.intercept && pBar > 0 && pBar < 1)
      math.log(pBar / (1 - pBar)) else 0.0
    var passes = 0

    val newtonTol = math.max(params.thresh * 1e-4, 1e-10)
    val (loStd, upStd) = (loStd0, upStd0)
    val dfGate = new DfGate(params, p)
    var cutL = L
    var l = 0
    while (l < L) {
      val lam = lambdas(l)
      var iter = 0
      var done = false
      while (iter < 25 && !done) {
        val (wg, _) = weightedGram(rows, bMean.value, bScale.value, beta, a0)
        passes += 1
        val ninv = 1.0 / n
        val a = LinAlg.unpackSym(wg.swxx, p).map(_.map(_ * ninv))
        val c = wg.swxz.map(_ * ninv)
        val xw = wg.swx.map(_ * ninv)
        // round 17: strong-rule screen on the per-Newton WLS subproblem
        // at scale (exact by KKT backcheck — same gate as the gaussian
        // driver solve; first path point has no lamPrev)
        val r =
          if (screenGlm && params.alpha > 0 && p >= ScreenMinP && l > 0)
            CoordinateDescent.solveScreened(a, c, xw, wg.swz * ninv,
              wg.sw * ninv, lam, lambdas(l - 1), params.alpha,
              params.intercept, beta, thresh = newtonTol,
              maxIter = params.maxit, penaltyFactor = params.penaltyFactor,
              lower = loStd, upper = upStd)
          else CoordinateDescent.solve(a, c, xw, wg.swz * ninv, wg.sw * ninv,
            lam, params.alpha, params.intercept, beta,
            thresh = newtonTol, maxIter = params.maxit,
            penaltyFactor = params.penaltyFactor,
            lower = loStd, upper = upStd)
        var maxD = math.abs(r.a0 - a0)
        var j = 0
        while (j < p) {
          val d = math.abs(r.beta(j) - beta(j)); if (d > maxD) maxD = d; j += 1
        }
        beta = r.beta; a0 = r.a0
        iter += 1
        if (maxD < math.max(params.thresh * 1e-2, 1e-8)) done = true
      }
      // glmnet dfmax/pmax: drop the violating point and stop the path
      if (!dfGate.admit(j => beta(j) != 0.0)) { cutL = l; l = L }
      else {
        for (j <- 0 until p) betaOut(l)(0)(j) = beta(j) / scale(j)
        a0Out(l)(0) =
          if (params.intercept) a0 - (0 until p).map(j => betaOut(l)(0)(j) * mean(j)).sum
          else a0
        l += 1
      }
    }
    require(cutL > 0, "dfmax/pmax exclude every path point")
    val lambdasT = lambdas.take(cutL)
    val a0OutT = a0Out.take(cutL)
    val betaOutT = betaOut.take(cutL)

    // null deviance (reference families.h Binomial::NullDeviance):
    // 2 * sum of logistic losses at the null linear predictor
    val nullP = if (params.intercept) pBar else 0.5
    val nulldev = -2.0 * n * (safeXLog(pBar, nullP) + safeXLog(1 - pBar, 1 - nullP))

    // one scoring pass for the whole path -> deviance ratios
    val devs = pathDeviance(rows, a0OutT, betaOutT)
    passes += 1
    val devRatio = devs.map(d => if (nulldev > 0) 1.0 - d / nulldev else 0.0)

    new SgdNetModel("binomial", featureCols.toArray, Array(labelCol),
      classes, lambdasT, a0OutT, betaOutT, nulldev, devRatio, g.n, passes, params)
  }

  // ---------------------------------------------------------------- poisson

  /** Poisson regression with log link — a graft extension beyond the
    * reference's four families, using the same distributed IRLS shape as
    * binomial: one `treeAggregate` per Newton step, penalized WLS solved
    * driver-side by CD. y must be a nonnegative count-like column.
    */
  private def fitPoisson(df: DataFrame, featureCols: Seq[String],
                         labelCol: String, params: SgdNetParams): SgdNetModel = {
    import org.apache.spark.sql.functions.col
    val p = featureCols.size
    val rows = df.select(
        (featureCols.map(c => col(c).cast("double")) :+ col(labelCol).cast("double")): _*)
      .rdd.map { row =>
        val x = new Array[Double](p)
        var j = 0
        while (j < p) { x(j) = row.getDouble(j); j += 1 }
        (x, Array(row.getDouble(p)))
      }.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val g = SufficientStats.compute(rows, p, 1)
      val st = SufficientStats.standardize(g, params.standardize, params.intercept)
      val n = g.n.toDouble
      val yBar = st.yMean(0)
      require(yBar > 0, "poisson response must contain positive counts")

      val mean = if (params.intercept) st.xMean else new Array[Double](p)
      val scale = if (params.standardize) st.xSd else Array.fill(p)(1.0)
      val minRatio = if (params.lambdaMinRatio.isNaN)
        LambdaPath.defaultMinRatio(g.n, p) else params.lambdaMinRatio
      // penaltyFactor entries of 0: lambda_max comes from the gradient
      // at the unpenalized sub-fit (glmnet semantics, same projection
      // the gaussian pathB applies), not the raw null covariance
      val (loStd, upStd) = boundsStd(params, scale, 1.0)
      val lambdas = if (params.lambda != null) params.lambda
        else {
          val pf = params.penaltyFactor
          val pathB =
            if (pf == null || !pf.contains(0.0)) st.b
            else Array(pfZeroPathGradient(p, n, pf, params.intercept,
              a0Init = if (params.intercept) math.log(yBar) else 0.0,
              thresh = params.thresh, maxit = params.maxit,
              gramAt = (b, a) => poissonGram(rows, mean, scale, b, a),
              userLo = loStd, userUp = upStd))
          LambdaPath.build(pathB, params.alpha, params.nlambda, minRatio, pf)
        }
      val sc = rows.sparkContext
      val bMean = sc.broadcast(mean)
      val bScale = sc.broadcast(scale)

      val L = lambdas.length
      val a0Out = Array.ofDim[Double](L, 1)
      val betaOut = Array.ofDim[Double](L, 1, p)
      var beta = new Array[Double](p)
      var a0 = if (params.intercept) math.log(yBar) else 0.0
      var passes = 0
      val newtonTol = math.max(params.thresh * 1e-4, 1e-10)

      val dfGate = new DfGate(params, p)
      var cutL = L
      var l = 0
      while (l < L) {
        var iter = 0
        var done = false
        while (iter < 25 && !done) {
          val wg = poissonGram(rows, bMean.value, bScale.value, beta, a0)
          passes += 1
          val ninv = 1.0 / n
          val a = LinAlg.unpackSym(wg.swxx, p).map(_.map(_ * ninv))
          // round 17: strong-rule screen on the per-Newton WLS
          // subproblem at scale (exact by KKT backcheck)
          val r =
            if (screenGlm && params.alpha > 0 && p >= ScreenMinP && l > 0)
              CoordinateDescent.solveScreened(a, wg.swxz.map(_ * ninv),
                wg.swx.map(_ * ninv), wg.swz * ninv, wg.sw * ninv,
                lambdas(l), lambdas(l - 1), params.alpha, params.intercept,
                beta, thresh = newtonTol, maxIter = params.maxit,
                penaltyFactor = params.penaltyFactor,
                lower = loStd, upper = upStd)
            else CoordinateDescent.solve(a, wg.swxz.map(_ * ninv),
              wg.swx.map(_ * ninv), wg.swz * ninv, wg.sw * ninv,
              lambdas(l), params.alpha, params.intercept, beta,
              thresh = newtonTol, maxIter = params.maxit,
              penaltyFactor = params.penaltyFactor,
              lower = loStd, upper = upStd)
          var maxD = math.abs(r.a0 - a0)
          var j = 0
          while (j < p) {
            val d = math.abs(r.beta(j) - beta(j)); if (d > maxD) maxD = d; j += 1
          }
          beta = r.beta; a0 = r.a0
          iter += 1
          if (maxD < math.max(params.thresh * 1e-2, 1e-8)) done = true
        }
        // glmnet dfmax/pmax: drop the violating point and stop the path
        if (!dfGate.admit(j => beta(j) != 0.0)) { cutL = l; l = L }
        else {
          for (j <- 0 until p) betaOut(l)(0)(j) = beta(j) / scale(j)
          a0Out(l)(0) =
            if (params.intercept) a0 - (0 until p).map(j => betaOut(l)(0)(j) * mean(j)).sum
            else a0
          l += 1
        }
      }
      require(cutL > 0, "dfmax/pmax exclude every path point")
      val lambdasT = lambdas.take(cutL)
      val a0OutT = a0Out.take(cutL)
      val betaOutT = betaOut.take(cutL)

      // null deviance: 2 sum[y log(y/muNull) - (y - muNull)], muNull = yBar
      // (intercept) or 1 (eta = 0)
      val muNull = if (params.intercept) yBar else 1.0
      val devs = poissonDeviance(rows, a0OutT, betaOutT, muNull)
      passes += 1
      val nulldev = devs.last // last slot carries the null-model deviance
      val devRatio = Array.tabulate(cutL)(l =>
        if (nulldev > 0) 1.0 - devs(l) / nulldev else 0.0)

      new SgdNetModel("poisson", featureCols.toArray, Array(labelCol),
        Array.empty, lambdasT, a0OutT, betaOutT, nulldev, devRatio, g.n, passes, params)
    } finally rows.unpersist(blocking = false)
  }

  private def poissonGram(rows: RDD[(Array[Double], Array[Double])],
                          mean: Array[Double], scale: Array[Double],
                          beta: Array[Double], a0: Double): WGram = {
    val p = mean.length
    rows.treeAggregate(new WGram(p))(
      seqOp = (s, xy) => {
        val (xr, y) = xy
        val xs = new Array[Double](p)
        var j = 0
        var eta = a0
        while (j < p) {
          xs(j) = (xr(j) - mean(j)) / scale(j)
          eta += xs(j) * beta(j)
          j += 1
        }
        val etaC = math.max(math.min(eta, 30.0), -30.0)
        val mu = math.exp(etaC)
        val w = math.max(mu, 1e-5)
        val z = etaC + (y(0) - mu) / w
        s.sw += w; s.swz += w * z
        j = 0
        while (j < p) {
          val wxj = w * xs(j)
          s.swx(j) += wxj
          s.swxz(j) += wxj * z
          var i = 0
          val base = j * (j + 1) / 2
          while (i <= j) { s.swxx(base + i) += xs(i) * wxj; i += 1 }
          j += 1
        }
        s
      },
      combOp = (a, b) => {
        a.sw += b.sw; a.swz += b.swz
        var i = 0
        while (i < a.swx.length) { a.swx(i) += b.swx(i); a.swxz(i) += b.swxz(i); i += 1 }
        i = 0
        while (i < a.swxx.length) { a.swxx(i) += b.swxx(i); i += 1 }
        a
      }, depth = 2)
  }

  /** One pass: deviance for every lambda plus the null model (last slot). */
  private[ml] def poissonDeviance(rows: RDD[(Array[Double], Array[Double])],
                              a0: Array[Array[Double]],
                              beta: Array[Array[Array[Double]]],
                              muNull: Double): Array[Double] = {
    val L = a0.length
    rows.treeAggregate(new Array[Double](L + 1))(
      seqOp = (acc, xy) => {
        val (x, y) = xy
        val p = x.length
        def devTerm(mu: Double): Double = {
          val ylog = if (y(0) > 0) y(0) * math.log(y(0) / mu) else 0.0
          2.0 * (ylog - (y(0) - mu))
        }
        var l = 0
        while (l < L) {
          var eta = a0(l)(0)
          var j = 0
          val bl = beta(l)(0)
          while (j < p) { eta += bl(j) * x(j); j += 1 }
          acc(l) += devTerm(math.exp(math.max(math.min(eta, 30.0), -30.0)))
          l += 1
        }
        acc(L) += devTerm(muNull)
        acc
      },
      combOp = (a, b) => { var i = 0; while (i <= L) { a(i) += b(i); i += 1 }; a },
      depth = 2)
  }

  private[ml] def safeXLog(x: Double, q: Double): Double =
    if (x <= 0) 0.0 else x * math.log(math.max(q, 1e-300))

  /** Lambda-path gradient under penaltyFactor entries of 0 for the IRLS
    * families — the glmnet semantics the gaussian path's pathB
    * projection implements (SgdNet.scala pathB): UNPENALIZED
    * coordinates are fit exactly first (the null model of the residual
    * problem), and lambda_max is the largest PENALIZED gradient there.
    * Solves the unpenalized sub-fit with the existing IRLS machinery —
    * lambda = 0 with the penalized coordinates boxed to 0 — then reads
    * the loss gradient from one fresh gram at the final coefficients:
    * w·(z − eta) = y − mu, so
    * (1/n)<xs_j, y − mu> = (swxz_j − (A·beta)_j − a0·swx_j)/n.
    * `userLo`/`userUp` are the caller's STANDARDIZED box limits (null =
    * unbounded): unpenalized coordinates keep them during the sub-fit,
    * so a binding box on a pf=0 coordinate shapes lambda_max exactly
    * like the constrained path it heads. */
  private def pfZeroPathGradient(p: Int, n: Double, pf: Array[Double],
      intercept: Boolean, a0Init: Double, thresh: Double, maxit: Int,
      gramAt: (Array[Double], Double) => WGram,
      userLo: Array[Double] = null,
      userUp: Array[Double] = null): Array[Double] = {
    val lo = Array.tabulate(p)(j =>
      if (pf(j) == 0.0) {
        if (userLo != null) userLo(j) else Double.NegativeInfinity
      } else 0.0)
    val up = Array.tabulate(p)(j =>
      if (pf(j) == 0.0) {
        if (userUp != null) userUp(j) else Double.PositiveInfinity
      } else 0.0)
    var beta = new Array[Double](p)
    var a0 = a0Init
    var iter = 0
    var done = false
    val newtonTol = math.max(thresh * 1e-4, 1e-10)
    while (iter < 25 && !done) {
      val wg = gramAt(beta, a0)
      val ninv = 1.0 / n
      val aM = LinAlg.unpackSym(wg.swxx, p).map(_.map(_ * ninv))
      val r = CoordinateDescent.solve(aM, wg.swxz.map(_ * ninv),
        wg.swx.map(_ * ninv), wg.swz * ninv, wg.sw * ninv,
        0.0, 1.0, intercept, beta, thresh = newtonTol, maxIter = maxit,
        lower = lo, upper = up)
      var maxD = math.abs(r.a0 - a0)
      var j = 0
      while (j < p) {
        val d = math.abs(r.beta(j) - beta(j)); if (d > maxD) maxD = d; j += 1
      }
      beta = r.beta; a0 = r.a0
      iter += 1
      if (maxD < math.max(thresh * 1e-2, 1e-8)) done = true
    }
    val wg = gramAt(beta, a0)
    Array.tabulate(p) { j =>
      var ab = 0.0
      var k = 0
      while (k < p) { ab += wg.swxx(LinAlg.triIdx(k, j)) * beta(k); k += 1 }
      (wg.swxz(j) - ab - a0 * wg.swx(j)) / n
    }
  }

  /** Upper bound on multinomial class discovery (round 17 hardening):
    * model state is O(k·p) driver-side anyway, so a label column with
    * more distinct values than this is almost certainly mis-typed
    * (a continuous response or an id column) — fail FAST on a bounded
    * `limit(maxClasses + 1)` scan instead of collecting an unbounded
    * distinct and dying slowly in the k×p solve. */
  private[ml] val MaxMultinomialClasses = 1024

  /** Gated multinomial class discovery: distinct labels, sorted,
    * bounded by [[MaxMultinomialClasses]] (the binomial routes use the
    * same shape with `limit(3)`). */
  private[ml] def multinomialClasses(df: DataFrame,
                                     labelCol: String): Array[String] = {
    import org.apache.spark.sql.functions.col
    val cs = df.select(col(labelCol).cast("string")).distinct()
      .limit(MaxMultinomialClasses + 1).collect().map(_.getString(0)).sorted
    require(cs.length > 2,
      if (cs.length == 2) "only two classes in response. Are you looking for family = 'binomial'?"
      else "only one class in response.")
    require(cs.length <= MaxMultinomialClasses,
      s"multinomial label column '$labelCol' has more than " +
        s"$MaxMultinomialClasses distinct values — multinomial state is " +
        "O(classes × features); is the label a continuous or id column?")
    cs
  }

  /** Solve one restricted unpenalized WLS system from an accumulated
    * moment block laid out [Σw, Σwz, Σw·x_A (m), Σw·x_A·z (m),
    * packed Σw·x_A·x_A' (tri(m))] — shared by every IRLS relaxed-refit
    * site. Unbounded solves the exact normal equations (bit-identical
    * to the pre-round-17 arithmetic); with box limits (round 17 —
    * glmnet relax.glmnet refits with the ORIGINAL call's
    * lower/upper.limits) it runs CD at λ = 0 with clipped steps:
    * box-constrained WLS, exact 1-D prox per coordinate, intercept
    * unbounded. `lo`/`up` are per-ACTIVE-coordinate on the solve's
    * coordinate scale (null = unbounded); `warm` is the current
    * active-set coefficients. Returns (a0, beta_A). */
  private[ml] def solveRestrictedWls(acc: Array[Double], base: Int, m: Int,
                                     intercept: Boolean,
                                     lo: Array[Double], up: Array[Double],
                                     warm: Array[Double],
                                     maxit: Int): (Double, Array[Double]) = {
    if (lo == null && up == null) {
      val dim2 = if (intercept) m + 1 else m
      val mat = Array.ofDim[Double](dim2, dim2)
      val rhs = new Array[Double](dim2)
      if (intercept) {
        mat(0)(0) = acc(base)
        rhs(0) = acc(base + 1)
        for (q <- 0 until m) {
          mat(0)(q + 1) = acc(base + 2 + q)
          mat(q + 1)(0) = acc(base + 2 + q)
          rhs(q + 1) = acc(base + 2 + m + q)
          for (r2 <- 0 to q) {
            val v = acc(base + 2 + 2 * m + LinAlg.triIdx(r2, q))
            mat(r2 + 1)(q + 1) = v
            mat(q + 1)(r2 + 1) = v
          }
        }
      } else {
        for (q <- 0 until m) {
          rhs(q) = acc(base + 2 + m + q)
          for (r2 <- 0 to q) {
            val v = acc(base + 2 + 2 * m + LinAlg.triIdx(r2, q))
            mat(r2)(q) = v
            mat(q)(r2) = v
          }
        }
      }
      val sol = LinAlg.solve(mat, rhs)
      if (intercept) (sol(0), sol.drop(1)) else (0.0, sol)
    } else {
      val aM = Array.tabulate(m, m)((i, j) =>
        acc(base + 2 + 2 * m + LinAlg.triIdx(math.min(i, j), math.max(i, j))))
      val c = Array.tabulate(m)(q => acc(base + 2 + m + q))
      val xw = Array.tabulate(m)(q => acc(base + 2 + q))
      val r = CoordinateDescent.solve(aM, c, xw, acc(base + 1), acc(base),
        0.0, 1.0, intercept, warm, thresh = 1e-12, maxIter = maxit,
        lower = lo, upper = up)
      (r.a0, r.beta)
    }
  }

  private[ml] def requireNoZeroPf(params: SgdNetParams, where: String): Unit =
    require(params.lambda != null || params.penaltyFactor == null ||
      !params.penaltyFactor.contains(0.0),
      s"penaltyFactor entries of 0 need an explicit lambda sequence on " +
        s"the $where path (the automatic lambda_max there does not apply " +
        "the unpenalized-coordinate projection the dense gaussian/" +
        "binomial/poisson paths implement)")

  // ----------------------------------------------------------- offset fits

  /** GLM fit with a per-row OFFSET on the linear predictor (the glmnet
    * `offset` argument): η_i = offset_i + a0 + x_i'β. For poisson with
    * log link, offset = ln(exposure) is THE standard rate model
    * (counts over unequal observation windows). Gaussian reduces
    * exactly to fitting y − offset; poisson threads the offset through
    * every IRLS pass (weights, working response, deviance, and the
    * exposure-weighted null intercept a0 = ln(Σy / Σe^offset)).
    * Predictions from the returned model are `offset + linkCol` —
    * the offset column is the caller's to supply at scoring time,
    * exactly as glmnet's `newoffset` works. */
  def fitWithOffset(df: DataFrame, featureCols: Seq[String], labelCol: String,
                    offsetCol: String,
                    params: SgdNetParams = SgdNetParams()): SgdNetModel = {
    requireGramP(featureCols.size)
    import org.apache.spark.sql.functions.col
    params.family match {
      case "gaussian" =>
        val adj = df.select((featureCols.map(col) :+
          (col(labelCol).cast("double") - col(offsetCol).cast("double"))
            .as(labelCol)): _*)
        fit(adj, featureCols, labelCol, params)
      case "poisson" => fitPoissonOffset(df, featureCols, labelCol,
        offsetCol, params)
      case "binomial" => fitBinomialOffset(df, featureCols, labelCol,
        offsetCol, params)
      case "multinomial" | "mgaussian" => throw new IllegalArgumentException(
        s"${params.family} takes a MATRIX offset (one column per " +
          "class/response) - use fitMultinomialWithOffset / fitMultiWithOffset")
      case f => throw new IllegalArgumentException(
        s"fitWithOffset supports gaussian, binomial, poisson, not $f")
    }
  }

  /** [[fitWithOffset]] WITH observation weights (glmnet `offset` +
    * `weights` together — the standard rate model with exposure AND
    * frequency weights, round 15): gaussian reduces to the weighted
    * fit of y − offset; poisson threads v·norm through every IRLS
    * accumulation, the exposure-weighted null (a0 =
    * ln(Σv·y / Σv·e^offset)), the lambda-path gradient, and the
    * deviance pass. Integer weights reproduce row duplication
    * (spec); w = 0 drops the observation. */
  def fitWithOffsetWeighted(df: DataFrame, featureCols: Seq[String],
                            labelCol: String, offsetCol: String,
                            weightCol: String,
                            params: SgdNetParams = SgdNetParams()): SgdNetModel = {
    requireGramP(featureCols.size)
    import org.apache.spark.sql.functions.col
    params.family match {
      case "gaussian" =>
        val adj = df.select((featureCols.map(col) :+
          (col(labelCol).cast("double") - col(offsetCol).cast("double"))
            .as(labelCol) :+ col(weightCol)): _*)
        fitWeighted(adj, featureCols, labelCol, weightCol, params)
      case "poisson" => fitPoissonOffset(df, featureCols, labelCol,
        offsetCol, params, weightCol)
      case "binomial" => fitBinomialOffset(df, featureCols, labelCol,
        offsetCol, params, weightCol)
      case "multinomial" | "mgaussian" => throw new IllegalArgumentException(
        s"${params.family} takes a MATRIX offset (one column per " +
          "class/response) - use fitMultinomialWithOffset / fitMultiWithOffset")
      case f => throw new IllegalArgumentException(
        s"fitWithOffsetWeighted supports gaussian, binomial, poisson, not $f")
    }
  }

  /** Multi-response (mgaussian) fit with a per-response OFFSET matrix
    * (glmnet `offset` for family = "mgaussian" is an nobs × nresp
    * matrix; here one offset column per response, matched
    * positionally to `labelCols`). Identity link makes this EXACT by
    * delegation: fitting y_t − offset_t is the offset model itself —
    * slopes unchanged vs the no-offset fit of the adjusted responses,
    * intercepts already on the offset scale. `weightCol` non-null
    * routes through the weighted multi-response moments. The
    * reference leaves offset as a TODO (R/sgdnet.R:341); glmnet
    * semantics implemented. */
  def fitMultiWithOffset(df: DataFrame, featureCols: Seq[String],
                         labelCols: Seq[String], offsetCols: Seq[String],
                         params: SgdNetParams,
                         weightCol: String = null): SgdNetModel = {
    requireGramP(featureCols.size)
    import org.apache.spark.sql.functions.col
    require(params.family == "mgaussian" || params.family == "gaussian",
      s"fitMultiWithOffset is the identity-link (gaussian/mgaussian) route, not ${params.family}")
    require(offsetCols.size == labelCols.size,
      s"need one offset column per response (${labelCols.size}), got ${offsetCols.size}")
    val adjusted = labelCols.zip(offsetCols).map { case (l, o) =>
      (col(l).cast("double") - col(o).cast("double")).as(l)
    }
    if (weightCol == null) {
      val adj = df.select((featureCols.map(col) ++ adjusted): _*)
      fitMulti(adj, featureCols, labelCols, params)
    } else {
      val adj = df.select((featureCols.map(col) ++ adjusted :+ col(weightCol)): _*)
      fitWeightedMulti(adj, featureCols, labelCols, weightCol, params)
    }
  }

  /** Poisson offset fit; `weightCol` non-null folds frequency weights
    * v (sum-to-n normalized over kept rows) into every accumulation —
    * the unweighted call passes vn = 1.0 everywhere, which is
    * bit-identical to the pre-weights arithmetic. */
  private def fitPoissonOffset(df: DataFrame, featureCols: Seq[String],
                               labelCol: String, offsetCol: String,
                               params: SgdNetParams,
                               weightCol: String = null): SgdNetModel = {
    import org.apache.spark.sql.functions.{col, lit}
    requireNoZeroPf(params, "poisson offset")
    val p = featureCols.size
    val wCol = if (weightCol == null) lit(1.0) else col(weightCol).cast("double")
    val raw = df.select((featureCols.map(c => col(c).cast("double")) ++
        Seq(col(labelCol).cast("double"), col(offsetCol).cast("double"),
          wCol)): _*)
      .rdd.map { row =>
        val x = Array.tabulate(p)(j => row.getDouble(j))
        (x, Array(row.getDouble(p), row.getDouble(p + 1), row.getDouble(p + 2)))
      }.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val rows =
        if (weightCol == null) raw
        else {
          // w == 0 drops the observation; weights renormalize to sum
          // to the kept-row count (the fitWeighted convention)
          val (nRows, wSum) = raw.treeAggregate((0L, 0.0))(
            seqOp = (s, r) => {
              require(r._2(2) >= 0, "weights must be non-negative")
              if (r._2(2) > 0) (s._1 + 1, s._2 + r._2(2)) else s
            },
            combOp = (a, b) => (a._1 + b._1, a._2 + b._2), depth = 2)
          require(nRows > 0, "the response (y) is empty.")
          val norm = nRows.toDouble / wSum
          raw.filter(_._2(2) > 0)
            .map(r => (r._1, Array(r._2(0), r._2(1), r._2(2) * norm)))
        }
      // weighted moments over (x, y) for standardization/lambda;
      // v-weighted exposure sum for the null intercept
      val g = rows.treeAggregate(new GramStats(p, 1))(
        seqOp = (s, r) => s.addWeighted(r._1, Array(r._2(0)), r._2(2)),
        combOp = (a, b) => a.merge(b), depth = 2)
      val st = SufficientStats.standardize(g, params.standardize, params.intercept)
      val n = g.n.toDouble
      val sumExpOff = rows.treeAggregate(0.0)(
        (s, r) => s + r._2(2) *
          math.exp(math.max(math.min(r._2(1), 30.0), -30.0)),
        _ + _, depth = 2)
      val sumY = st.yMean(0) * n
      require(sumY > 0, "poisson response must contain positive counts")

      val mean = if (params.intercept) st.xMean else new Array[Double](p)
      val scale = if (params.standardize) st.xSd else Array.fill(p)(1.0)
      val minRatio = if (params.lambdaMinRatio.isNaN)
        LambdaPath.defaultMinRatio(g.n, p) else params.lambdaMinRatio
      val lambdas = if (params.lambda != null) params.lambda
        else {
          // With a non-constant offset the null-model mean
          // mu_i = exp(a0Null + off_i) varies per row, so the glmnet
          // lambda_max is max_j |(1/n) Σ xs_ij (y_i − mu_i)| — st.b (the
          // offset-IGNORING covariance) would start the path at a lambda
          // where coefficients are already nonzero. One extra gradient
          // pass, mirroring the pathB correction on the gaussian path.
          val a0Null0 = if (params.intercept) math.log(sumY / sumExpOff) else 0.0
          val bOff = rows.treeAggregate(new Array[Double](p))(
            seqOp = (acc, xy) => {
              val (xr, yo) = xy
              val mu = math.exp(
                math.max(math.min(a0Null0 + yo(1), 30.0), -30.0))
              val r = yo(2) * (yo(0) - mu)
              var j = 0
              while (j < p) {
                acc(j) += (xr(j) - mean(j)) / scale(j) * r; j += 1
              }
              acc
            },
            combOp = (a, b) => {
              var i = 0; while (i < p) { a(i) += b(i); i += 1 }; a
            }, depth = 2)
          LambdaPath.build(Array(bOff.map(_ / n)), params.alpha,
            params.nlambda, minRatio, params.penaltyFactor)
        }
      val sc = rows.sparkContext
      val bMean = sc.broadcast(mean)
      val bScale = sc.broadcast(scale)

      val L = lambdas.length
      val a0Out = Array.ofDim[Double](L, 1)
      val betaOut = Array.ofDim[Double](L, 1, p)
      var beta = new Array[Double](p)
      var a0 = if (params.intercept) math.log(sumY / sumExpOff) else 0.0
      var passes = 0
      val newtonTol = math.max(params.thresh * 1e-4, 1e-10)
      val (loStd, upStd) = boundsStd(params, scale, 1.0)

      // round 17: TRUE dfmax/pmax early stopping on this route — the
      // first violating path point stops the remaining lambdas' IRLS
      // cluster passes; the violating point carries forward so the
      // post-hoc dfTruncate slices the path at it (identical surface)
      val dfGate = new DfGate(params, p)
      var dfStop = -1
      for (l <- 0 until L) if (dfStop >= 0) {
        a0Out(l)(0) = a0Out(dfStop)(0)
        betaOut(l)(0) = betaOut(dfStop)(0)
      } else {
        var iter = 0
        var done = false
        while (iter < 25 && !done) {
          // IRLS pass at η = off + a0 + xs·β; the WLS target is z − off
          // so the solver fits exactly a0 + xs·β
          val wg = rows.treeAggregate(new WGram(p))(
            seqOp = (s, xy) => {
              val (xr, yo) = xy
              val off = yo(1)
              val xs = new Array[Double](p)
              var j = 0
              var eta = a0 + off
              while (j < p) {
                xs(j) = (xr(j) - bMean.value(j)) / bScale.value(j)
                eta += xs(j) * beta(j)
                j += 1
              }
              val etaC = math.max(math.min(eta, 30.0), -30.0)
              val mu = math.exp(etaC)
              val w = math.max(mu, 1e-5) * yo(2) // frequency weight folds in
              val z = etaC + (yo(0) - mu) / math.max(mu, 1e-5) - off
              s.sw += w; s.swz += w * z
              j = 0
              while (j < p) {
                val wxj = w * xs(j)
                s.swx(j) += wxj
                s.swxz(j) += wxj * z
                var i = 0
                val base = j * (j + 1) / 2
                while (i <= j) { s.swxx(base + i) += xs(i) * wxj; i += 1 }
                j += 1
              }
              s
            },
            combOp = (a, b) => {
              a.sw += b.sw; a.swz += b.swz
              var i = 0
              while (i < a.swx.length) {
                a.swx(i) += b.swx(i); a.swxz(i) += b.swxz(i); i += 1
              }
              i = 0
              while (i < a.swxx.length) { a.swxx(i) += b.swxx(i); i += 1 }
              a
            }, depth = 2)
          passes += 1
          val ninv = 1.0 / n
          val aM = LinAlg.unpackSym(wg.swxx, p).map(_.map(_ * ninv))
          val r = CoordinateDescent.solve(aM, wg.swxz.map(_ * ninv),
            wg.swx.map(_ * ninv), wg.swz * ninv, wg.sw * ninv,
            lambdas(l), params.alpha, params.intercept, beta,
            thresh = newtonTol, maxIter = params.maxit,
            penaltyFactor = params.penaltyFactor,
            lower = loStd, upper = upStd)
          var maxD = math.abs(r.a0 - a0)
          var j = 0
          while (j < p) {
            val d = math.abs(r.beta(j) - beta(j)); if (d > maxD) maxD = d; j += 1
          }
          beta = r.beta; a0 = r.a0
          iter += 1
          if (maxD < math.max(params.thresh * 1e-2, 1e-8)) done = true
        }
        for (j <- 0 until p) betaOut(l)(0)(j) = beta(j) / scale(j)
        a0Out(l)(0) =
          if (params.intercept) a0 - (0 until p).map(j => betaOut(l)(0)(j) * mean(j)).sum
          else a0
        if (!dfGate.admit(j => betaOut(l)(0)(j) != 0.0)) dfStop = l
      }

      // deviance with per-row offset; null model uses the
      // exposure-weighted intercept (or bare offset without intercept)
      val a0Null = if (params.intercept) math.log(sumY / sumExpOff) else 0.0
      val devs = rows.treeAggregate(new Array[Double](L + 1))(
        seqOp = (acc, xy) => {
          val (x, yo) = xy
          val off = yo(1)
          def devTerm(mu: Double): Double = {
            val ylog = if (yo(0) > 0) yo(0) * math.log(yo(0) / mu) else 0.0
            2.0 * (ylog - (yo(0) - mu))
          }
          var l = 0
          while (l < L) {
            var eta = a0Out(l)(0) + off
            var j = 0
            val bl = betaOut(l)(0)
            while (j < p) { eta += bl(j) * x(j); j += 1 }
            acc(l) += yo(2) *
              devTerm(math.exp(math.max(math.min(eta, 30.0), -30.0)))
            l += 1
          }
          acc(L) += yo(2) * devTerm(math.exp(
            math.max(math.min(a0Null + off, 30.0), -30.0)))
          acc
        },
        combOp = (a, b) => { var i = 0; while (i <= L) { a(i) += b(i); i += 1 }; a },
        depth = 2)
      passes += 1
      val nulldev = devs(L)
      val devRatio = Array.tabulate(L)(l =>
        if (nulldev > 0) 1.0 - devs(l) / nulldev else 0.0)

      dfTruncate(new SgdNetModel("poisson", featureCols.toArray,
        Array(labelCol), Array.empty, lambdas, a0Out, betaOut, nulldev,
        devRatio, g.n, passes, params), params)
    } finally { raw.unpersist(blocking = false); () }
  }

  /** Binomial offset fit (round 16 — glmnet supports `offset` for
    * every family; gaussian/poisson shipped earlier, this closes
    * binomial): the [[fitPoissonOffset]] IRLS shape with sigmoid
    * forms. The null intercept with a per-row offset has no closed
    * form — a0Null solves Σv·sigmoid(a0 + off) = Σv·y — so a driver
    * Newton loop over one-scalar-pair data passes converges it
    * (quadratic; with a CONSTANT offset the start
    * logit(ȳ) − mean(off) is already the exact root). `weightCol`
    * folds v (sum-to-n normalized over kept rows) into every
    * accumulation; the unweighted call passes vn = 1.0 everywhere. */
  private def fitBinomialOffset(df: DataFrame, featureCols: Seq[String],
                                labelCol: String, offsetCol: String,
                                params: SgdNetParams,
                                weightCol: String = null): SgdNetModel = {
    import org.apache.spark.sql.functions.{col, lit}
    requireNoZeroPf(params, "binomial offset")
    val p = featureCols.size
    val classes = df.select(col(labelCol).cast("string")).distinct()
      .limit(3).collect().map(_.getString(0)).sorted
    require(classes.length == 2,
      if (classes.length > 2) "more than two classes in response. Are you looking for family = 'multinomial'?"
      else "only one class in response.")
    val yCol = (col(labelCol).cast("string") === classes(1)).cast("double")
    val wCol = if (weightCol == null) lit(1.0) else col(weightCol).cast("double")
    val raw = df.select((featureCols.map(c => col(c).cast("double")) ++
        Seq(yCol, col(offsetCol).cast("double"), wCol)): _*)
      .rdd.map { row =>
        val x = Array.tabulate(p)(j => row.getDouble(j))
        (x, Array(row.getDouble(p), row.getDouble(p + 1), row.getDouble(p + 2)))
      }.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val rows =
        if (weightCol == null) raw
        else {
          val (nRows, wSum) = raw.treeAggregate((0L, 0.0))(
            seqOp = (s, r) => {
              require(r._2(2) >= 0, "weights must be non-negative")
              if (r._2(2) > 0) (s._1 + 1, s._2 + r._2(2)) else s
            },
            combOp = (a, b) => (a._1 + b._1, a._2 + b._2), depth = 2)
          require(nRows > 0, "the response (y) is empty.")
          val norm = nRows.toDouble / wSum
          raw.filter(_._2(2) > 0)
            .map(r => (r._1, Array(r._2(0), r._2(1), r._2(2) * norm)))
        }
      // weighted moments + Σvn·off in ONE pass (off rides slot p of a
      // widened stats row is overkill — a paired aggregate suffices)
      val (g, sumOff) = rows.treeAggregate((new GramStats(p, 1), 0.0))(
        seqOp = (s, r) =>
          (s._1.addWeighted(r._1, Array(r._2(0)), r._2(2)),
            s._2 + r._2(2) * r._2(1)),
        combOp = (a, b) => (a._1.merge(b._1), a._2 + b._2), depth = 2)
      val st = SufficientStats.standardize(g, params.standardize, params.intercept)
      val n = g.n.toDouble
      val ybar = st.yMean(0)
      require(ybar > 0 && ybar < 1, "binomial response must contain both classes")
      var passes = 1

      // null intercept: Newton on a0 with μ = σ(a0 + off_i); the
      // mean-offset-shifted logit start is exact for a constant offset
      var a0Null = if (params.intercept)
        math.log(ybar / (1 - ybar)) - sumOff / n else 0.0
      if (params.intercept) {
        var it = 0
        var done = false
        while (it < 25 && !done) {
          val (s1, s2) = rows.treeAggregate((0.0, 0.0))(
            (s, r) => {
              val mu = 1.0 / (1.0 + math.exp(-(a0Null + r._2(1))))
              (s._1 + r._2(2) * (r._2(0) - mu),
                s._2 + r._2(2) * math.max(mu * (1.0 - mu), 1e-10))
            },
            (a, b) => (a._1 + b._1, a._2 + b._2), depth = 2)
          passes += 1
          val step = s1 / s2
          a0Null += step
          it += 1
          if (math.abs(step) < 1e-12) done = true
        }
      }

      val mean = if (params.intercept) st.xMean else new Array[Double](p)
      val scale = if (params.standardize) st.xSd else Array.fill(p)(1.0)
      val minRatio = if (params.lambdaMinRatio.isNaN)
        LambdaPath.defaultMinRatio(g.n, p) else params.lambdaMinRatio
      val lambdas = if (params.lambda != null) params.lambda
        else {
          // offset-corrected lambda_max: gradient at the offset null
          val a0N = a0Null
          val bOff = rows.treeAggregate(new Array[Double](p))(
            seqOp = (acc, xy) => {
              val (xr, yo) = xy
              val mu = 1.0 / (1.0 + math.exp(-(a0N + yo(1))))
              val r = yo(2) * (yo(0) - mu)
              var j = 0
              while (j < p) {
                acc(j) += (xr(j) - mean(j)) / scale(j) * r; j += 1
              }
              acc
            },
            combOp = (a, b) => {
              var i = 0; while (i < p) { a(i) += b(i); i += 1 }; a
            }, depth = 2)
          passes += 1
          LambdaPath.build(Array(bOff.map(_ / n)), params.alpha,
            params.nlambda, minRatio, params.penaltyFactor)
        }
      val sc = rows.sparkContext
      val bMean = sc.broadcast(mean)
      val bScale = sc.broadcast(scale)

      val L = lambdas.length
      val a0Out = Array.ofDim[Double](L, 1)
      val betaOut = Array.ofDim[Double](L, 1, p)
      var beta = new Array[Double](p)
      var a0 = a0Null
      val newtonTol = math.max(params.thresh * 1e-4, 1e-10)
      val (loStd, upStd) = boundsStd(params, scale, 1.0)

      // round 17: TRUE dfmax/pmax early stopping on this route — the
      // first violating path point stops the remaining lambdas' IRLS
      // cluster passes; the violating point carries forward so the
      // post-hoc dfTruncate slices the path at it (identical surface)
      val dfGate = new DfGate(params, p)
      var dfStop = -1
      for (l <- 0 until L) if (dfStop >= 0) {
        a0Out(l)(0) = a0Out(dfStop)(0)
        betaOut(l)(0) = betaOut(dfStop)(0)
      } else {
        var iter = 0
        var done = false
        while (iter < 25 && !done) {
          // IRLS pass at η = off + a0 + xs·β; the WLS target is z − off
          val wg = rows.treeAggregate(new WGram(p))(
            seqOp = (s, xy) => {
              val (xr, yo) = xy
              val off = yo(1)
              val xs = new Array[Double](p)
              var j = 0
              var eta = a0 + off
              while (j < p) {
                xs(j) = (xr(j) - bMean.value(j)) / bScale.value(j)
                eta += xs(j) * beta(j)
                j += 1
              }
              val mu = 1.0 / (1.0 + math.exp(-eta))
              val wr = math.max(mu * (1.0 - mu), 1e-5)
              val w = wr * yo(2) // frequency weight folds in
              val z = eta + (yo(0) - mu) / wr - off
              s.sw += w; s.swz += w * z
              j = 0
              while (j < p) {
                val wxj = w * xs(j)
                s.swx(j) += wxj
                s.swxz(j) += wxj * z
                var i = 0
                val base = j * (j + 1) / 2
                while (i <= j) { s.swxx(base + i) += xs(i) * wxj; i += 1 }
                j += 1
              }
              s
            },
            combOp = (a, b) => {
              a.sw += b.sw; a.swz += b.swz
              var i = 0
              while (i < a.swx.length) {
                a.swx(i) += b.swx(i); a.swxz(i) += b.swxz(i); i += 1
              }
              i = 0
              while (i < a.swxx.length) { a.swxx(i) += b.swxx(i); i += 1 }
              a
            }, depth = 2)
          passes += 1
          val ninv = 1.0 / n
          val aM = LinAlg.unpackSym(wg.swxx, p).map(_.map(_ * ninv))
          val r = CoordinateDescent.solve(aM, wg.swxz.map(_ * ninv),
            wg.swx.map(_ * ninv), wg.swz * ninv, wg.sw * ninv,
            lambdas(l), params.alpha, params.intercept, beta,
            thresh = newtonTol, maxIter = params.maxit,
            penaltyFactor = params.penaltyFactor,
            lower = loStd, upper = upStd)
          var maxD = math.abs(r.a0 - a0)
          var j = 0
          while (j < p) {
            val d = math.abs(r.beta(j) - beta(j)); if (d > maxD) maxD = d; j += 1
          }
          beta = r.beta; a0 = r.a0
          iter += 1
          if (maxD < math.max(params.thresh * 1e-2, 1e-8)) done = true
        }
        for (j <- 0 until p) betaOut(l)(0)(j) = beta(j) / scale(j)
        a0Out(l)(0) =
          if (params.intercept) a0 - (0 until p).map(j => betaOut(l)(0)(j) * mean(j)).sum
          else a0
        if (!dfGate.admit(j => betaOut(l)(0)(j) != 0.0)) dfStop = l
      }

      // deviance with per-row offset; the null model is the converged
      // offset null intercept (or the bare offset without intercept)
      val devs = rows.treeAggregate(new Array[Double](L + 1))(
        seqOp = (acc, xy) => {
          val (x, yo) = xy
          val off = yo(1)
          def binDev(eta: Double): Double = {
            val m = math.max(eta, 0.0)
            2.0 * (m + math.log(math.exp(-m) + math.exp(eta - m)) - yo(0) * eta)
          }
          var l = 0
          while (l < L) {
            var eta = a0Out(l)(0) + off
            var j = 0
            val bl = betaOut(l)(0)
            while (j < p) { eta += bl(j) * x(j); j += 1 }
            acc(l) += yo(2) * binDev(eta)
            l += 1
          }
          acc(L) += yo(2) * binDev(a0Null + off)
          acc
        },
        combOp = (a, b) => {
          var i = 0; while (i <= L) { a(i) += b(i); i += 1 }; a
        },
        depth = 2)
      passes += 1
      val nulldev = devs(L)
      val devRatio = Array.tabulate(L)(l =>
        if (nulldev > 0) 1.0 - devs(l) / nulldev else 0.0)

      dfTruncate(new SgdNetModel("binomial", featureCols.toArray,
        Array(labelCol), classes, lambdas, a0Out, betaOut, nulldev, devRatio,
        g.n, passes, params), params)
    } finally { raw.unpersist(blocking = false); () }
  }

  private final class WGram(p: Int) extends Serializable {
    var sw = 0.0; var swz = 0.0; var loglik = 0.0
    val swx = new Array[Double](p)
    val swxz = new Array[Double](p)
    val swxx = new Array[Double](LinAlg.triSize(p))
  }

  /** One IRLS pass: weighted moments of the working response at (a0, beta). */
  private def weightedGram(rows: RDD[(Array[Double], Array[Double])],
                           mean: Array[Double], scale: Array[Double],
                           beta: Array[Double], a0: Double): (WGram, Long) = {
    val p = mean.length
    val acc = rows.treeAggregate(new WGram(p))(
      seqOp = (s, xy) => {
        val (xr, y) = xy
        val xs = new Array[Double](p)
        var j = 0
        var eta = a0
        while (j < p) {
          xs(j) = (xr(j) - mean(j)) / scale(j)
          eta += xs(j) * beta(j)
          j += 1
        }
        val mu = 1.0 / (1.0 + math.exp(-eta))
        val w = math.max(mu * (1.0 - mu), 1e-5)
        val z = eta + (y(0) - mu) / w
        s.sw += w; s.swz += w * z
        j = 0
        while (j < p) {
          val wxj = w * xs(j)
          s.swx(j) += wxj
          s.swxz(j) += wxj * z
          var i = 0
          val base = j * (j + 1) / 2
          while (i <= j) { s.swxx(base + i) += xs(i) * wxj; i += 1 }
          j += 1
        }
        s
      },
      combOp = (a, b) => {
        a.sw += b.sw; a.swz += b.swz; a.loglik += b.loglik
        var i = 0
        while (i < a.swx.length) { a.swx(i) += b.swx(i); a.swxz(i) += b.swxz(i); i += 1 }
        i = 0
        while (i < a.swxx.length) { a.swxx(i) += b.swxx(i); i += 1 }
        a
      }, depth = 2)
    (acc, 0L)
  }

  /** One pass scoring deviance (=-2 loglik) for EVERY lambda at once.
    * Coefficients are on the ORIGINAL feature scale (a0Out/betaOut), so no
    * standardization is needed in the scan.
    */
  private[ml] def pathDeviance(rows: RDD[(Array[Double], Array[Double])],
                           a0: Array[Array[Double]],
                           beta: Array[Array[Array[Double]]]): Array[Double] = {
    val L = a0.length
    rows.treeAggregate(new Array[Double](L))(
      seqOp = (acc, xy) => {
        val (x, y) = xy
        var l = 0
        while (l < L) {
          var eta = a0(l)(0)
          var j = 0
          val bl = beta(l)(0)
          while (j < x.length) { eta += bl(j) * x(j); j += 1 }
          // -2 * [y*eta - log(1+e^eta)] in a numerically stable form
          val m = math.max(eta, 0.0)
          acc(l) += 2.0 * (m + math.log(math.exp(-m) + math.exp(eta - m)) - y(0) * eta)
          l += 1
        }
        acc
      },
      combOp = (a, b) => { var i = 0; while (i < L) { a(i) += b(i); i += 1 }; a },
      depth = 2)
  }

  // ------------------------------------------------------------- multinomial

  private def fitMultinomial(df: DataFrame, featureCols: Seq[String],
                             labelCol: String, params: SgdNetParams): SgdNetModel = {
    import org.apache.spark.sql.functions.col
    val p = featureCols.size
    val classes = multinomialClasses(df, labelCol)
    val k = classes.length
    val classIdx = classes.zipWithIndex.toMap

    val rows = df.selectExpr(
        (featureCols.map(c => s"cast(`$c` as double)") :+ s"cast(`$labelCol` as string)"): _*)
      .rdd.map { row =>
        val x = new Array[Double](p)
        var j = 0
        while (j < p) { x(j) = row.getDouble(j); j += 1 }
        (x, row.getString(p))
      }.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val idx = rows.sparkContext.broadcast(classIdx)
      val onehot = rows.map { case (x, c) =>
        val y = new Array[Double](k); y(idx.value(c)) = 1.0; (x, y)
      }
      fitMultinomialImpl(onehot, featureCols, labelCol, classes, params)
    } finally rows.unpersist(blocking = false)
  }

  private def fitMultinomialImpl(rows: RDD[(Array[Double], Array[Double])],
                                 featureCols: Seq[String], labelCol: String,
                                 classes: Array[String], params: SgdNetParams): SgdNetModel = {
    val p = featureCols.size
    val k = classes.length
    val g = SufficientStats.compute(rows, p, k)
    fitMultinomialCore(g, featureCols.toArray, labelCol, classes, params,
      gradFn = (mean, scale, yB, yA) => softmaxGrad(rows, mean, scale, yB, yA, k),
      devFn = (a0Out, betaOut) => multinomDeviance(rows, a0Out, betaOut, k))
  }

  /** WEIGHTED multinomial fit (glmnet `weights` with
    * family = "multinomial", round 15 — closes the last documented
    * weighted-family reject): frequency weights v (normalized to sum
    * to n over the kept rows, the glmnet convention) multiply every
    * per-row softmax-gradient contribution (grad = Σ vn·(p−y)·xs / n)
    * and every deviance term; the weighted GramStats drive
    * standardization, the lambda path, and the Lipschitz step, so
    * integer weights reproduce row duplication exactly (spec) through
    * the SAME FISTA core as the unweighted fit — grouped and ungrouped
    * penalties, penalty factors, and box limits included. The deviance
    * pass reuses [[multinomDeviance]] on v-SCALED one-hot labels
    * (deviance is linear in y, so scaling the one-hot weights it
    * exactly); w = 0 drops the observation. */
  private def fitWeightedMultinomial(df: DataFrame, featureCols: Seq[String],
                                     labelCol: String, weightCol: String,
                                     params: SgdNetParams): SgdNetModel = {
    import org.apache.spark.sql.functions.col
    val p = featureCols.size
    val classes = multinomialClasses(df, labelCol)
    val k = classes.length
    val classIdx = classes.zipWithIndex.toMap
    val raw = df.select((featureCols.map(c => col(c).cast("double")) :+
        col(labelCol).cast("string") :+ col(weightCol).cast("double")): _*)
      .rdd.map { row =>
        val x = new Array[Double](p)
        var j = 0
        while (j < p) { x(j) = row.getDouble(j); j += 1 }
        (x, row.getString(p), row.getDouble(p + 1))
      }.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val (nRows, wSum) = raw.treeAggregate((0L, 0.0))(
        seqOp = (s, r) => {
          require(r._3 >= 0, "weights must be non-negative")
          if (r._3 > 0) (s._1 + 1, s._2 + r._3) else s
        },
        combOp = (a, b) => (a._1 + b._1, a._2 + b._2), depth = 2)
      require(nRows > 0, "the response (y) is empty.")
      val norm = nRows.toDouble / wSum
      val idx = raw.sparkContext.broadcast(classIdx)
      val rows = raw.filter(_._3 > 0).map { case (x, c, v) =>
        val y = new Array[Double](k); y(idx.value(c)) = 1.0
        (x, y, v * norm)
      }
      val g = rows.treeAggregate(new GramStats(p, k))(
        seqOp = (s, r) => s.addWeighted(r._1, r._2, r._3),
        combOp = (a, b) => a.merge(b), depth = 2)
      fitMultinomialCore(g, featureCols.toArray, labelCol, classes, params,
        gradFn = (mean, scale, yB, yA) =>
          softmaxGradWeighted(rows, mean, scale, yB, yA, k),
        devFn = (a0Out, betaOut) => multinomDeviance(
          rows.map(r => (r._1, r._2.map(_ * r._3))), a0Out, betaOut, k))
    } finally { raw.unpersist(blocking = false); () }
  }

  /** Multinomial fit with a per-class linear-predictor OFFSET (round
    * 16 — glmnet `offset` for family = "multinomial" is an
    * nobs × nclass matrix; here one offset column per class, matched
    * positionally to the SORTED class labels, the model's
    * `classLabels` order). eta_it = offset_it + a0_t + x_i·β_t through
    * the SAME FISTA core as the plain fit. The pieces the offset
    * changes are supplied to the core explicitly:
    *
    *  - the NULL intercepts (no closed form once offsets vary): a
    *    damped-Newton driver loop on the k-vector a0 — each iteration
    *    ONE treeAggregate yielding the k-gradient, the k×k softmax
    *    Hessian and the log-likelihood; the k×k solve is driver-side.
    *    The start ln(prior_t) − mean(offset_t) is already exact for
    *    constant offsets (gradient 0 → zero Newton steps), mirroring
    *    the binomial offset null. The softmax flat direction (adding a
    *    constant to every a0) is handled by a 1e-9 ridge on H.
    *  - the lambda path: offset-corrected null gradient
    *    b_tj = (1/n)Σ vn·(y_it − p_it)·xs_ij at the offset null.
    *  - nulldev: −2·Σ vn·log p_null(y_i) at the offset null.
    *
    * `weightCol` non-null folds frequency weights v (sum-to-n
    * normalized, w = 0 drops the row) into every accumulation.
    * The reference leaves offset as a TODO (R/sgdnet.R:341); glmnet
    * semantics implemented. */
  def fitMultinomialWithOffset(df: DataFrame, featureCols: Seq[String],
                               labelCol: String, offsetCols: Seq[String],
                               params: SgdNetParams,
                               weightCol: String = null): SgdNetModel = {
    requireGramP(featureCols.size)
    import org.apache.spark.sql.functions.{col, lit}
    require(params.family == "multinomial",
      s"fitMultinomialWithOffset is the multinomial route, not ${params.family}")
    val p = featureCols.size
    val classes = multinomialClasses(df, labelCol)
    val k = classes.length
    require(offsetCols.size == k,
      s"multinomial offset needs one column per class (nclass = $k, " +
        s"sorted-label order), got ${offsetCols.size}")
    val classIdx = classes.zipWithIndex.toMap
    val wCol = if (weightCol == null) lit(1.0) else col(weightCol).cast("double")
    val raw = df.select((featureCols.map(c => col(c).cast("double")) ++
        offsetCols.map(c => col(c).cast("double")) :+
        col(labelCol).cast("string") :+ wCol): _*)
      .rdd.map { row =>
        val x = new Array[Double](p)
        var j = 0
        while (j < p) { x(j) = row.getDouble(j); j += 1 }
        val off = new Array[Double](k)
        var t = 0
        while (t < k) { off(t) = row.getDouble(p + t); t += 1 }
        (x, off, row.getString(p + k), row.getDouble(p + k + 1))
      }.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // kept-row count, weight mass, per-class weighted offset means
      val (nRows, wSum, offSum) = raw.treeAggregate((0L, 0.0, new Array[Double](k)))(
        seqOp = (s, r) => {
          require(r._4 >= 0, "weights must be non-negative")
          if (r._4 > 0) {
            var t = 0
            while (t < k) { s._3(t) += r._4 * r._2(t); t += 1 }
            (s._1 + 1, s._2 + r._4, s._3)
          } else s
        },
        combOp = (a, b) => {
          var t = 0
          while (t < k) { a._3(t) += b._3(t); t += 1 }
          (a._1 + b._1, a._2 + b._2, a._3)
        }, depth = 2)
      require(nRows > 0, "the response (y) is empty.")
      val norm = nRows.toDouble / wSum
      val idx = raw.sparkContext.broadcast(classIdx)
      val rows = raw.filter(_._4 > 0).map { case (x, off, c, v) =>
        val y = new Array[Double](k); y(idx.value(c)) = 1.0
        (x, y, off, v * norm)
      }
      var passes = 1
      val g = rows.treeAggregate(new GramStats(p, k))(
        seqOp = (s, r) => s.addWeighted(r._1, r._2, r._4),
        combOp = (a, b) => a.merge(b), depth = 2)
      passes += 1
      val st = SufficientStats.standardize(g, params.standardize, params.intercept)
      val mean = if (params.intercept) st.xMean else new Array[Double](p)
      val scale = if (params.standardize) st.xSd else Array.fill(p)(1.0)
      val n = g.n.toDouble

      // offset null intercepts: damped Newton from the mean-offset-
      // shifted log-priors (exact for constant offsets)
      val a0n = if (params.intercept)
        Array.tabulate(k)(t =>
          math.log(math.max(st.yMean(t), 1e-12)) - offSum(t) / wSum)
        else new Array[Double](k)
      val (nulldev, nullPasses) = multinomOffsetNull(
        rows.map(r => (r._2, r._3, r._4)), a0n, k, params.intercept, n)
      passes += nullPasses

      // offset-corrected null gradient for the lambda path (skipped
      // when the caller supplies the lambda sequence — it only feeds
      // the data-derived path)
      val nullB = if (params.lambda != null) null else {
        val (g0, _) = softmaxGradOffset(rows, mean, scale,
          Array.ofDim[Double](k, p), a0n, k)
        passes += 1
        g0.map(_.map(v => -v))
      }

      fitMultinomialCore(g, featureCols.toArray, labelCol, classes, params,
        gradFn = (m, s, yB, yA) => softmaxGradOffset(rows, m, s, yB, yA, k),
        devFn = (a0Out, betaOut) =>
          multinomOffsetDeviance(rows, a0Out, betaOut, k),
        nullA0 = a0n, nullB = nullB, nulldevOverride = nulldev,
        passes0 = passes)
    } finally { raw.unpersist(blocking = false); () }
  }

  /** [[relaxedFitGlm]] over CSR feature rows (round 16 — glmnet
    * relax = TRUE with a dgCMatrix x and family binomial | poisson):
    * the penalized path from [[fitSparse]], then the lambda-tiled
    * unpenalized active-set IRLS refits with SPARSE restricted-moment
    * accumulation — a row contributes only its nonzeros that fall in
    * each live lambda's active set (position lookup via a broadcast
    * per-cell index map), so per-row cost is O(Σ_live |nnz ∩ A_l|²)
    * and the matrix is never densified. Same convergence and
    * empty-active-set semantics as the dense route. */
  def relaxedFitGlmSparse(df: DataFrame, idxCol: String, valCol: String,
                          dim: Int, labelCol: String,
                          params: SgdNetParams,
                          gamma: Double = 1.0,
                          weightCol: String = null,
                          offsetCol: String = null): RelaxedPath = {
    requireGramP(dim)
    import org.apache.spark.sql.functions.{col, lit}
    require(params.family == "binomial" || params.family == "poisson",
      s"relaxedFitGlmSparse is the IRLS-family route (binomial|poisson), not ${params.family}")
    require(gamma >= 0 && gamma <= 1, "gamma must be in [0, 1]")
    val binomial = params.family == "binomial"
    val weighted = weightCol != null
    val hasOffset = offsetCol != null
    val model =
      if (hasOffset)
        fitSparseWithOffset(df, idxCol, valCol, dim, labelCol, offsetCol,
          params, weightCol)
      else if (weighted)
        fitSparseWeighted(df, idxCol, valCol, dim, labelCol, weightCol, params)
      else fitSparse(df, idxCol, valCol, dim, labelCol, params)
    val p = dim
    val yExpr =
      if (binomial) {
        val positive = model.classLabels(1)
        (col(labelCol).cast("string") === positive).cast("double")
      } else col(labelCol).cast("double")
    val wExpr = if (weighted) col(weightCol).cast("double") else lit(1.0)
    val oExpr = if (hasOffset) col(offsetCol).cast("double") else lit(0.0)
    val rows0 = df.select(col(idxCol), col(valCol).cast("array<double>"),
        yExpr, wExpr, oExpr)
      .rdd.map { r =>
        (r.getSeq[Int](0).toArray, r.getSeq[Double](1).toArray,
          r.getDouble(2), r.getDouble(3), r.getDouble(4))
      }
    val rows = (if (weighted)
        rows0.map { t => require(t._4 >= 0, "weights must be non-negative"); t }
          .filter(_._4 > 0)
      else rows0).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val L = model.lambda.length
      val active: Array[Array[Int]] =
        model.beta.map(bl => (0 until p).filter(j => bl(0)(j) != 0.0).toArray)
      val a0R = Array.tabulate(L)(l => model.a0(l)(0))
      val bR = Array.tabulate(L)(l => model.beta(l)(0).clone())
      val done = new Array[Boolean](L)
      if (active.exists(_.isEmpty)) {
        val a0Null =
          if (!params.intercept) 0.0
          else if (!hasOffset) {
            val (sy, n) = rows.treeAggregate((0.0, 0.0))(
              (s, r) => (s._1 + r._4 * r._3, s._2 + r._4),
              (a, b) => (a._1 + b._1, a._2 + b._2), depth = 2)
            val ybar = sy / n
            if (binomial) math.log(ybar / (1 - ybar)) else math.log(ybar)
          } else if (!binomial) {
            val (sy, se) = rows.treeAggregate((0.0, 0.0))(
              (s, r) => (s._1 + r._4 * r._3, s._2 + r._4 * math.exp(
                math.max(math.min(r._5, 30.0), -30.0))),
              (a, b) => (a._1 + b._1, a._2 + b._2), depth = 2)
            math.log(sy / se)
          } else {
            val (sy, sv, so) = rows.treeAggregate((0.0, 0.0, 0.0))(
              (s, r) => (s._1 + r._4 * r._3, s._2 + r._4, s._3 + r._4 * r._5),
              (a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3), depth = 2)
            val ybar = sy / sv
            var a0n = math.log(ybar / (1 - ybar)) - so / sv
            var it = 0
            var doneN = false
            while (!doneN && it < 50) {
              val (g, h) = rows.treeAggregate((0.0, 0.0))(
                (s, r) => {
                  val mu = 1.0 / (1.0 + math.exp(-(a0n + r._5)))
                  (s._1 + r._4 * (mu - r._3), s._2 + r._4 * mu * (1.0 - mu))
                },
                (a, b) => (a._1 + b._1, a._2 + b._2), depth = 2)
              if (math.abs(g / sv) < 1e-12 || h <= 0) doneN = true
              else { a0n -= g / h; it += 1 }
            }
            a0n
          }
        for (l <- 0 until L if active(l).isEmpty) {
          a0R(l) = a0Null
          java.util.Arrays.fill(bR(l), 0.0)
          done(l) = true
        }
      }
      val sc = rows.sparkContext
      val tol = math.max(params.thresh * 1e-2, 1e-8)
      var iter = 0
      while (iter < 25 && !done.forall(identity)) {
        val live = (0 until L).filter(!done(_)).toArray
        val sizes = live.map(l => 2 + 2 * active(l).length +
          LinAlg.triSize(active(l).length))
        val offs = sizes.scanLeft(0)(_ + _)
        // per-cell feature→slot map (-1 = inactive) for O(1) lookup
        // while walking a row's nonzeros
        val posOf = live.map { l =>
          val m = Array.fill(p)(-1)
          active(l).zipWithIndex.foreach { case (j, q) => m(j) = q }
          m
        }
        val bState = sc.broadcast((live, live.map(active(_)), posOf,
          live.map(a0R(_)), live.map(bR(_)), offs))
        val acc = rows.treeAggregate(new Array[Double](offs.last))(
          (s, row) => {
            val (idx, vals, y, v, off) = row
            val (lv, acts, pos, a0s, bs, os) = bState.value
            var i = 0
            while (i < lv.length) {
              val a = acts(i)
              val m = a.length
              val pm = pos(i)
              // eta over the row's nonzeros in this cell's active set
              var eta = a0s(i) + off
              var t = 0
              while (t < idx.length) {
                if (pm(idx(t)) >= 0) eta += bs(i)(idx(t)) * vals(t)
                t += 1
              }
              var w = 0.0
              var z = 0.0
              if (binomial) {
                val mu = 1.0 / (1.0 + math.exp(-eta))
                w = math.max(mu * (1.0 - mu), 1e-5)
                z = eta + (y - mu) / w - off
              } else {
                val etaC = math.max(math.min(eta, 30.0), -30.0)
                val mu = math.exp(etaC)
                w = math.max(mu, 1e-5)
                z = etaC + (y - mu) / w - off
              }
              w *= v
              val base = os(i)
              s(base) += w
              s(base + 1) += w * z
              t = 0
              while (t < idx.length) {
                val q = pm(idx(t))
                if (q >= 0) {
                  val wx = w * vals(t)
                  s(base + 2 + q) += wx
                  s(base + 2 + m + q) += wx * z
                  var u = 0
                  while (u <= t) {
                    val r2 = pm(idx(u))
                    if (r2 >= 0) {
                      val lo = math.min(q, r2); val hi = math.max(q, r2)
                      s(base + 2 + 2 * m + LinAlg.triIdx(lo, hi)) +=
                        (if (u == t) wx * vals(t) else wx * vals(u))
                    }
                    u += 1
                  }
                }
                t += 1
              }
              i += 1
            }
            s
          },
          (a, b) => { var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a },
          depth = 2)
        for (i <- live.indices) {
          val l = live(i)
          val a = active(l)
          val m = a.length
          val base = offs(i)
          val loA = if (params.lowerLimits == null) null
            else a.map(params.lowerLimits(_))
          val upA = if (params.upperLimits == null) null
            else a.map(params.upperLimits(_))
          val (na0, sol) = solveRestrictedWls(acc, base, m,
            params.intercept, loA, upA, a.map(bR(l)(_)), params.maxit)
          var maxD = math.abs(na0 - a0R(l))
          for (q <- 0 until m) {
            val d = math.abs(sol(q) - bR(l)(a(q)))
            if (d > maxD) maxD = d
          }
          a0R(l) = na0
          for (q <- 0 until m) bR(l)(a(q)) = sol(q)
          if (maxD < tol) done(l) = true
        }
        iter += 1
      }
      RelaxedPath(model, a0R, bR, gamma)
    } finally { rows.unpersist(blocking = false); () }
  }

  /** Intercept-only softmax null WITH per-row per-class offsets:
    * damped Newton on the k-vector a0 (updated IN PLACE) — each step
    * is ONE treeAggregate over (one-hot y, offset, weight) rows
    * yielding the k-gradient, the k×k softmax Hessian and the
    * log-likelihood; the k×k solve is driver-side with a 1e-9 ridge
    * for the softmax flat direction (adding a constant to every a0).
    * Shared by the dense and SPARSE multinomial offset fits (x never
    * enters the null). Returns (nulldev at the final a0, passes). */
  private def multinomOffsetNull(
      rows: RDD[(Array[Double], Array[Double], Double)],
      a0n: Array[Double], k: Int, intercept: Boolean,
      n: Double): (Double, Int) = {
    var nulldev = Double.NaN
    var passes = 0
    var it = 0
    var done = false
    while (!done) {
      // one pass: k-gradient, k×k Hessian, log-likelihood at a0n
      val acc = rows.treeAggregate(new Array[Double](k + k * k + 1))(
        seqOp = (s, r) => {
          val (y, off, vn) = r
          val pr = new Array[Double](k)
          var mx = Double.NegativeInfinity
          var t = 0
          while (t < k) {
            pr(t) = a0n(t) + off(t); if (pr(t) > mx) mx = pr(t); t += 1
          }
          var z = 0.0
          t = 0
          while (t < k) { pr(t) = math.exp(pr(t) - mx); z += pr(t); t += 1 }
          val logZ = mx + math.log(z)
          t = 0
          while (t < k) {
            pr(t) /= z
            s(t) += vn * (pr(t) - y(t))
            s(k + k * k) += vn * y(t) * (a0n(t) + off(t) - logZ)
            var u = 0
            while (u < k) {
              s(k + t * k + u) += vn *
                (if (t == u) pr(t) * (1.0 - pr(t)) else -pr(t) * pr(u))
              u += 1
            }
            t += 1
          }
          s
        },
        combOp = (a, b) => {
          var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a
        }, depth = 2)
      passes += 1
      nulldev = -2.0 * acc(k + k * k)
      if (!intercept) done = true
      else {
        val gvec = Array.tabulate(k)(t => acc(t) / n)
        val gInf = gvec.map(math.abs).max
        if (gInf < 1e-12 || it >= 50) done = true
        else {
          val h = Array.tabulate(k, k)((i2, j2) =>
            acc(k + i2 * k + j2) / n + (if (i2 == j2) 1e-9 else 0.0))
          val d = LinAlg.solve(h, gvec)
          var t = 0
          while (t < k) { a0n(t) -= d(t); t += 1 }
          it += 1
        }
      }
    }
    (nulldev, passes)
  }

  /** [[softmaxGradWeighted]] with a per-row per-class offset in the
    * linear predictor: eta_t = a0_t + off_t + β_t·xs. */
  private def softmaxGradOffset(
      rows: RDD[(Array[Double], Array[Double], Array[Double], Double)],
      mean: Array[Double], scale: Array[Double],
      beta: Array[Array[Double]], a0: Array[Double],
      k: Int): (Array[Array[Double]], Array[Double]) = {
    val p = mean.length
    val acc = rows.treeAggregate(new Array[Double](k * (p + 1) + 1))(
      seqOp = (s, xyov) => {
        val (xr, y, off, vn) = xyov
        val xs = new Array[Double](p)
        var j = 0
        while (j < p) { xs(j) = (xr(j) - mean(j)) / scale(j); j += 1 }
        val eta = new Array[Double](k)
        var mx = Double.NegativeInfinity
        var t = 0
        while (t < k) {
          var e = a0(t) + off(t)
          j = 0
          while (j < p) { e += beta(t)(j) * xs(j); j += 1 }
          eta(t) = e; if (e > mx) mx = e
          t += 1
        }
        var z = 0.0
        t = 0
        while (t < k) { eta(t) = math.exp(eta(t) - mx); z += eta(t); t += 1 }
        t = 0
        while (t < k) {
          val r = vn * (eta(t) / z - y(t))   // vn·(P_t - Y_t)
          s(t * (p + 1)) += r
          j = 0
          while (j < p) { s(t * (p + 1) + 1 + j) += r * xs(j); j += 1 }
          t += 1
        }
        s(k * (p + 1)) += vn
        s
      },
      combOp = (a, b) => { var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a },
      depth = 2)
    val n = acc(k * (p + 1))
    val grad = Array.tabulate(k, p)((t, j) => acc(t * (p + 1) + 1 + j) / n)
    val gradA0 = Array.tabulate(k)(t => acc(t * (p + 1)) / n)
    (grad, gradA0)
  }

  /** [[multinomDeviance]] with per-row per-class offsets and frequency
    * weights: −2 Σ vn·y_t·(eta_t − logZ) with eta = a0 + off + βx. */
  private def multinomOffsetDeviance(
      rows: RDD[(Array[Double], Array[Double], Array[Double], Double)],
      a0: Array[Array[Double]], beta: Array[Array[Array[Double]]],
      k: Int): Array[Double] = {
    val L = a0.length
    rows.treeAggregate(new Array[Double](L))(
      seqOp = (acc, xyov) => {
        val (x, y, off, vn) = xyov
        val p = x.length
        var l = 0
        while (l < L) {
          val eta = new Array[Double](k)
          var mx = Double.NegativeInfinity
          var t = 0
          while (t < k) {
            var e = a0(l)(t) + off(t)
            var j = 0
            while (j < p) { e += beta(l)(t)(j) * x(j); j += 1 }
            eta(t) = e; if (e > mx) mx = e
            t += 1
          }
          var z = 0.0
          t = 0
          while (t < k) { z += math.exp(eta(t) - mx); t += 1 }
          val logZ = mx + math.log(z)
          t = 0
          var ll = 0.0
          while (t < k) { ll += y(t) * (eta(t) - logZ); t += 1 }
          acc(l) += -2.0 * vn * ll
          l += 1
        }
        acc
      },
      combOp = (a, b) => { var i = 0; while (i < L) { a(i) += b(i); i += 1 }; a },
      depth = 2)
  }

  /** Driver-side FISTA over cluster gradient passes — shared by the dense
    * and sparse multinomial paths (only the per-pass gradient and the
    * final deviance scan differ by row representation). The OFFSET
    * route (round 16) supplies its own null point: `nullA0` (the
    * offset-null intercepts replacing ln(prior)), `nullB` (the
    * offset-corrected null gradient driving the lambda path) and
    * `nulldevOverride` (deviance of the offset null model) — all three
    * default to the plain closed forms; `passes0` counts the caller's
    * own pre-core cluster scans into npasses. */
  private def fitMultinomialCore(
      g: GramStats, featureNames: Array[String], labelCol: String,
      classes: Array[String], params: SgdNetParams,
      gradFn: (Array[Double], Array[Double], Array[Array[Double]], Array[Double]) =>
        (Array[Array[Double]], Array[Double]),
      devFn: (Array[Array[Double]], Array[Array[Array[Double]]]) => Array[Double],
      nullA0: Array[Double] = null,
      nullB: Array[Array[Double]] = null,
      nulldevOverride: Double = Double.NaN,
      passes0: Int = 0)
      : SgdNetModel = {
    val st = SufficientStats.standardize(g, params.standardize, params.intercept)
    // Lipschitz bound for softmax cross-entropy on standardized X:
    // L <= 0.5 * lambda_max(Gram)
    val lip = 0.5 * LinAlg.maxEig(st.gram) + 1e-9
    fitMultinomialCoreSt(st, g.n, lip, featureNames, labelCol, classes,
      params, gradFn, devFn, nullA0, nullB, nulldevOverride, passes0)
  }

  /** [[fitMultinomialCore]] from PRE-STANDARDIZED stats and a caller-
    * supplied Lipschitz constant — the Gram matrix itself is consumed
    * ONLY for the Lipschitz bound, so the large-p multinomial route
    * (`LargeP.fitMultinomial`: O(p·k) moments + a distributed power
    * iteration for L) runs the IDENTICAL FISTA core without ever
    * materializing p². `st.gram` may be null here. */
  private[ml] def fitMultinomialCoreSt(
      st: StdStats, nRows: Long, lip: Double,
      featureNames: Array[String], labelCol: String,
      classes: Array[String], params: SgdNetParams,
      gradFn: (Array[Double], Array[Double], Array[Array[Double]], Array[Double]) =>
        (Array[Array[Double]], Array[Double]),
      devFn: (Array[Array[Double]], Array[Array[Array[Double]]]) => Array[Double],
      nullA0: Array[Double] = null,
      nullB: Array[Array[Double]] = null,
      nulldevOverride: Double = Double.NaN,
      passes0: Int = 0)
      : SgdNetModel = {
    val p = featureNames.length
    val k = classes.length
    val n = nRows.toDouble

    // glmnet penalty.factor for multinomial: per-FEATURE multiplier on
    // both penalty terms (every class coefficient of feature j scales
    // by pf_j — ungrouped entrywise and grouped group-prox alike).
    // pf == 0 needs an explicit lambda (the unpenalized-coordinate
    // lambda_max projection is single-response only).
    val pf = params.penaltyFactor
    require(pf == null || (pf.length == p && pf.forall(_ >= 0)),
      "penaltyFactor must have one non-negative entry per feature")
    requireNoZeroPf(params, "multinomial")
    // glmnet lower/upper.limits: per-feature bounds applied to EVERY
    // class coefficient. Ungrouped: the entrywise clipped
    // soft-threshold is the exact box+l1 prox. Grouped (round 16): the
    // box-constrained group prox solves by group-norm bisection
    // (LinAlg.boxedGroupProx) — the closed form the reject used to
    // cite as missing.

    val minRatio = if (params.lambdaMinRatio.isNaN)
      LambdaPath.defaultMinRatio(nRows, p) else params.lambdaMinRatio
    // gradient at null: (1/n)<xs_j, y_t - pbar_t>; with xs centered this is b
    val bSrc = if (nullB != null) nullB else st.b
    val lambdas = if (params.lambda != null) params.lambda
      else {
        // ungrouped: lambda_max = max |b_tj| / pf_j (pf tiled per class
        // to match the flattened t-major layout); grouped:
        // max_j ||b_.j||_2 / pf_j
        val bArg = if (params.typeMultinomial == "grouped") bSrc
          else Array(bSrc.flatten)
        val pfArg = if (pf == null) null
          else if (params.typeMultinomial == "grouped") pf
          else Array.tabulate(k * p)(i => pf(i % p))
        LambdaPath.build(bArg, params.alpha, params.nlambda, minRatio, pfArg)
      }

    val mean = if (params.intercept) st.xMean else new Array[Double](p)
    val scale = if (params.standardize) st.xSd else Array.fill(p)(1.0)
    val (loStd, upStd) = boundsStd(params, scale, 1.0)
    val priors = st.yMean // class proportions

    val L = lambdas.length
    val a0Out = Array.ofDim[Double](L, k)
    val betaOut = Array.ofDim[Double](L, k, p)
    var beta = Array.ofDim[Double](k, p)
    var a0 = if (nullA0 != null) nullA0.clone()
      else Array.tabulate(k)(t => if (params.intercept)
        math.log(math.max(priors(t), 1e-12)) else 0.0)
    var passes = passes0

    val dfGate = new DfGate(params, p)
    var cutL = L
    var l = 0
    while (l < L) {
      val lam = lambdas(l)
      val step = 1.0 / lip
      var iter = 0
      var done = false
      // FISTA state
      var yB = beta.map(_.clone()); var yA = a0.clone(); var tk = 1.0
      // honor the user's maxit exactly — no hidden iteration clamp (the
      // model's npasses surfaces how many gradient passes were spent;
      // each pass is one distributed scan, so a non-converging fit can
      // spend up to maxit scans PER LAMBDA — tune maxit/thresh, the
      // engine will not silently truncate)
      while (iter < params.maxit && !done) {
        val (grad, gradA0) = gradFn(mean, scale, yB, yA)
        passes += 1
        val nb = Array.ofDim[Double](k, p)
        val na = new Array[Double](k)
        var maxD = 0.0
        val grouped = params.typeMultinomial == "grouped"
        for (t <- 0 until k) {
          na(t) = if (params.intercept) yA(t) - step * gradA0(t) else 0.0
          val d0 = math.abs(na(t) - a0(t)); if (d0 > maxD) maxD = d0
        }
        for (j <- 0 until p) {
          val pfj = if (pf == null) 1.0 else pf(j)
          if (grouped) {
            // group soft-threshold across classes: the l1/l2 mixed norm
            // prox (fills the reference's own TODO for grouped multinomial)
            var nrm = 0.0
            val v = Array.tabulate(k)(t => yB(t)(j) - step * grad(t)(j))
            v.foreach(x => nrm += x * x)
            nrm = math.sqrt(nrm)
            val g = step * lam * params.alpha * pfj
            if (loStd != null || upStd != null) {
              // boxed group prox (round 16): ½‖x−v‖² + g‖x‖ + (h/2)‖x‖²
              // + box ≡ (q/2)‖x‖² − v·x + g‖x‖ + box with q = 1 + h
              val q = 1.0 + step * lam * (1.0 - params.alpha) * pfj
              val loJ = Array.fill(k)(
                if (loStd == null) Double.NegativeInfinity else loStd(j))
              val upJ = Array.fill(k)(
                if (upStd == null) Double.PositiveInfinity else upStd(j))
              val u = LinAlg.boxedGroupProx(v, q, g, loJ, upJ,
                new Array[Double](k))
              for (t <- 0 until k) {
                nb(t)(j) = u(t)
                val d = math.abs(nb(t)(j) - beta(t)(j)); if (d > maxD) maxD = d
              }
            } else {
              val shrink =
                if (nrm > g)
                  (1.0 - g / nrm) /
                    (1.0 + step * lam * (1.0 - params.alpha) * pfj)
                else 0.0
              for (t <- 0 until k) {
                nb(t)(j) = v(t) * shrink
                val d = math.abs(nb(t)(j) - beta(t)(j)); if (d > maxD) maxD = d
              }
            }
          } else {
            for (t <- 0 until k) {
              val v = yB(t)(j) - step * grad(t)(j)
              var x = LinAlg.softThreshold(v, step * lam * params.alpha * pfj) /
                (1.0 + step * lam * (1.0 - params.alpha) * pfj)
              // 1-D box clip IS the exact prox of l1+l2+box when
              // 0 ∈ [lo_j, up_j] (enforced by boundsStd)
              if (loStd != null && x < loStd(j)) x = loStd(j)
              if (upStd != null && x > upStd(j)) x = upStd(j)
              nb(t)(j) = x
              val d = math.abs(nb(t)(j) - beta(t)(j)); if (d > maxD) maxD = d
            }
          }
        }
        // gradient-based adaptive restart (O'Donoghue & Candès): when the
        // momentum direction opposes the gradient step, reset it —
        // typically 2-5x fewer gradient passes, each of which is a
        // cluster scan here
        var restartDot = 0.0
        for (t <- 0 until k; j <- 0 until p)
          restartDot += grad(t)(j) * (nb(t)(j) - beta(t)(j))
        for (t <- 0 until k) restartDot += gradA0(t) * (na(t) - a0(t))
        val tk1 = if (restartDot > 0) 1.0
          else (1.0 + math.sqrt(1.0 + 4.0 * tk * tk)) / 2.0
        val mom = if (restartDot > 0) 0.0 else (tk - 1.0) / tk1
        for (t <- 0 until k; j <- 0 until p)
          yB(t)(j) = nb(t)(j) + mom * (nb(t)(j) - beta(t)(j))
        for (t <- 0 until k) yA(t) = na(t) + mom * (na(t) - a0(t))
        beta = nb; a0 = na; tk = tk1
        iter += 1
        if (maxD < math.max(params.thresh * 1e-3, 1e-8)) done = true
      }
      // glmnet dfmax/pmax: a feature counts if ANY class uses it
      if (!dfGate.admit(j => (0 until k).exists(t => beta(t)(j) != 0.0))) {
        cutL = l
        l = L
      } else {
        for (t <- 0 until k; j <- 0 until p) betaOut(l)(t)(j) = beta(t)(j) / scale(j)
        for (t <- 0 until k)
          a0Out(l)(t) = if (params.intercept)
            a0(t) - (0 until p).map(j => betaOut(l)(t)(j) * mean(j)).sum else 0.0
        l += 1
      }
    }
    require(cutL > 0, "dfmax/pmax exclude every path point")
    val lambdasT = lambdas.take(cutL)
    val a0OutT = a0Out.take(cutL)
    val betaOutT = betaOut.take(cutL)

    // null deviance: 2 * sum_i -log(prior_{y_i}) (reference families.h:263);
    // the offset route pre-computes it at the offset null instead
    val nulldev = if (!nulldevOverride.isNaN) nulldevOverride
      else -2.0 * n * priors.map(pr => safeXLog(pr, pr)).sum
    val devs = devFn(a0OutT, betaOutT)
    passes += 1
    val devRatio = devs.map(d => if (nulldev > 0) 1.0 - d / nulldev else 0.0)

    new SgdNetModel("multinomial", featureNames, Array(labelCol),
      classes, lambdasT, a0OutT, betaOutT, nulldev, devRatio, nRows, passes, params)
  }

  private[ml] def softmaxGrad(rows: RDD[(Array[Double], Array[Double])],
                          mean: Array[Double], scale: Array[Double],
                          beta: Array[Array[Double]], a0: Array[Double],
                          k: Int): (Array[Array[Double]], Array[Double]) = {
    val p = mean.length
    // accumulator: [k*(p+1)] gradient sums
    val acc = rows.treeAggregate(new Array[Double](k * (p + 1) + 1))(
      seqOp = (s, xy) => {
        val (xr, y) = xy
        val xs = new Array[Double](p)
        var j = 0
        while (j < p) { xs(j) = (xr(j) - mean(j)) / scale(j); j += 1 }
        val eta = new Array[Double](k)
        var mx = Double.NegativeInfinity
        var t = 0
        while (t < k) {
          var e = a0(t)
          j = 0
          while (j < p) { e += beta(t)(j) * xs(j); j += 1 }
          eta(t) = e; if (e > mx) mx = e
          t += 1
        }
        var z = 0.0
        t = 0
        while (t < k) { eta(t) = math.exp(eta(t) - mx); z += eta(t); t += 1 }
        t = 0
        while (t < k) {
          val r = eta(t) / z - y(t)   // P_t - Y_t
          s(t * (p + 1)) += r
          j = 0
          while (j < p) { s(t * (p + 1) + 1 + j) += r * xs(j); j += 1 }
          t += 1
        }
        s(k * (p + 1)) += 1.0
        s
      },
      combOp = (a, b) => { var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a },
      depth = 2)
    val n = acc(k * (p + 1))
    val grad = Array.tabulate(k, p)((t, j) => acc(t * (p + 1) + 1 + j) / n)
    val gradA0 = Array.tabulate(k)(t => acc(t * (p + 1)) / n)
    (grad, gradA0)
  }

  /** [[softmaxGrad]] with per-row frequency weights: rows carry the
    * PRE-NORMALIZED weight vn (sums to n over kept rows), every
    * residual contribution multiplies by it, and the count slot
    * accumulates vn — so grad = Σ vn·(p−y)·xs / Σvn, the weighted
    * softmax gradient on the same standardized scale. */
  private def softmaxGradWeighted(rows: RDD[(Array[Double], Array[Double], Double)],
                          mean: Array[Double], scale: Array[Double],
                          beta: Array[Array[Double]], a0: Array[Double],
                          k: Int): (Array[Array[Double]], Array[Double]) = {
    val p = mean.length
    val acc = rows.treeAggregate(new Array[Double](k * (p + 1) + 1))(
      seqOp = (s, xyv) => {
        val (xr, y, vn) = xyv
        val xs = new Array[Double](p)
        var j = 0
        while (j < p) { xs(j) = (xr(j) - mean(j)) / scale(j); j += 1 }
        val eta = new Array[Double](k)
        var mx = Double.NegativeInfinity
        var t = 0
        while (t < k) {
          var e = a0(t)
          j = 0
          while (j < p) { e += beta(t)(j) * xs(j); j += 1 }
          eta(t) = e; if (e > mx) mx = e
          t += 1
        }
        var z = 0.0
        t = 0
        while (t < k) { eta(t) = math.exp(eta(t) - mx); z += eta(t); t += 1 }
        t = 0
        while (t < k) {
          val r = vn * (eta(t) / z - y(t))   // vn·(P_t - Y_t)
          s(t * (p + 1)) += r
          j = 0
          while (j < p) { s(t * (p + 1) + 1 + j) += r * xs(j); j += 1 }
          t += 1
        }
        s(k * (p + 1)) += vn
        s
      },
      combOp = (a, b) => { var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a },
      depth = 2)
    val n = acc(k * (p + 1))
    val grad = Array.tabulate(k, p)((t, j) => acc(t * (p + 1) + 1 + j) / n)
    val gradA0 = Array.tabulate(k)(t => acc(t * (p + 1)) / n)
    (grad, gradA0)
  }

  /** Sparse softmax gradient pass: raw per-class accumulations over the
    * nonzeros only; the centering/standardization correction
    *   grad_std[t][j] = (sum r_t x_j - m_j sum r_t) / s_j / n
    * is applied driver-side (same algebra as the sparse IRLS gram). */
  private[ml] def sparseSoftmaxGrad(
      rows: RDD[(Array[Int], Array[Double], Array[Double], Double)],
      mean: Array[Double], scale: Array[Double],
      beta: Array[Array[Double]], a0: Array[Double],
      k: Int): (Array[Array[Double]], Array[Double]) = {
    val p = mean.length
    val sc = rows.sparkContext
    val bOverS = Array.tabulate(k, p)((t, j) => beta(t)(j) / scale(j))
    val offsets = Array.tabulate(k) { t =>
      var o = a0(t)
      var j = 0
      while (j < p) { o -= mean(j) * bOverS(t)(j); j += 1 }
      o
    }
    val bc = sc.broadcast((bOverS, offsets))
    val acc = rows.treeAggregate(new Array[Double](k * (p + 1) + 1))(
      seqOp = (s, row) => {
        val (idx, vals, y, vn) = row
        val (bos, off) = bc.value
        val eta = new Array[Double](k)
        var mx = Double.NegativeInfinity
        var t = 0
        while (t < k) {
          var e = off(t)
          var i = 0
          while (i < idx.length) { e += vals(i) * bos(t)(idx(i)); i += 1 }
          eta(t) = e; if (e > mx) mx = e
          t += 1
        }
        var z = 0.0
        t = 0
        while (t < k) { eta(t) = math.exp(eta(t) - mx); z += eta(t); t += 1 }
        t = 0
        while (t < k) {
          val r = vn * (eta(t) / z - y(t)) // vn·(P_t - Y_t)
          s(t * (p + 1)) += r
          var i = 0
          while (i < idx.length) {
            s(t * (p + 1) + 1 + idx(i)) += r * vals(i)
            i += 1
          }
          t += 1
        }
        s(k * (p + 1)) += vn
        s
      },
      combOp = (a, b) => { var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a },
      depth = 2)
    val n = acc(k * (p + 1))
    val gradA0 = Array.tabulate(k)(t => acc(t * (p + 1)) / n)
    val grad = Array.tabulate(k, p)((t, j) =>
      (acc(t * (p + 1) + 1 + j) - mean(j) * acc(t * (p + 1))) / scale(j) / n)
    (grad, gradA0)
  }

  private[ml] def sparseMultinomDeviance(rows: RDD[(Array[Int], Array[Double], Array[Double])],
                                     a0: Array[Array[Double]],
                                     beta: Array[Array[Array[Double]]],
                                     k: Int): Array[Double] = {
    val L = a0.length
    rows.treeAggregate(new Array[Double](L))(
      seqOp = (acc, row) => {
        val (idx, vals, y) = row
        var l = 0
        while (l < L) {
          val eta = new Array[Double](k)
          var mx = Double.NegativeInfinity
          var t = 0
          while (t < k) {
            var e = a0(l)(t)
            val bl = beta(l)(t)
            var i = 0
            while (i < idx.length) { e += bl(idx(i)) * vals(i); i += 1 }
            eta(t) = e; if (e > mx) mx = e
            t += 1
          }
          var z = 0.0
          t = 0
          while (t < k) { z += math.exp(eta(t) - mx); t += 1 }
          val logZ = mx + math.log(z)
          t = 0
          var ll = 0.0
          while (t < k) { ll += y(t) * (eta(t) - logZ); t += 1 }
          acc(l) += -2.0 * ll
          l += 1
        }
        acc
      },
      combOp = (a, b) => { var i = 0; while (i < L) { a(i) += b(i); i += 1 }; a },
      depth = 2)
  }

  /** Sparse-input multinomial: one-hot labels over CSR rows; the FISTA
    * driver loop is [[fitMultinomialCore]], with sparse gradient and
    * deviance passes (never densified). */
  private def fitSparseMultinomial(df: DataFrame, idxCol: String, valCol: String,
                                   dim: Int, labelCol: String,
                                   params: SgdNetParams,
                                   weightCol: String = null): SgdNetModel = {
    import org.apache.spark.sql.functions.{col, lit}
    val classes = multinomialClasses(df, labelCol)
    val k = classes.length
    val classIdx = classes.zipWithIndex.toMap
    val wCol = if (weightCol == null) lit(1.0) else col(weightCol).cast("double")
    val raw = df.select(col(idxCol), col(valCol).cast("array<double>"),
        col(labelCol).cast("string"), wCol)
      .rdd.map { r =>
        val y = new Array[Double](k)
        y(classIdx(r.getString(2))) = 1.0
        (r.getSeq[Int](0).toArray, r.getSeq[Double](1).toArray, y,
          r.getDouble(3))
      }.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // vn = 1.0 for the unweighted call — bit-identical arithmetic
      val rows =
        if (weightCol == null) raw
        else {
          val (nRows, wSum) = raw.treeAggregate((0L, 0.0))(
            seqOp = (s, r) => {
              require(r._4 >= 0, "weights must be non-negative")
              if (r._4 > 0) (s._1 + 1, s._2 + r._4) else s
            },
            combOp = (a, b) => (a._1 + b._1, a._2 + b._2), depth = 2)
          require(nRows > 0, "the response (y) is empty.")
          val norm = nRows.toDouble / wSum
          raw.filter(_._4 > 0).map(r => (r._1, r._2, r._3, r._4 * norm))
        }
      val g = rows.treeAggregate(new GramStats(dim, k))(
        seqOp = (s, r) => s.addSparseWeighted(r._1, r._2, r._3, r._4),
        combOp = (a, b) => a.merge(b), depth = 2)
      fitMultinomialCore(g, (0 until dim).map(j => s"V$j").toArray, labelCol,
        classes, params,
        gradFn = (mean, scale, yB, yA) =>
          sparseSoftmaxGrad(rows, mean, scale, yB, yA, k),
        devFn = (a0Out, betaOut) =>
          // deviance is linear in y: vn-scaled one-hots weight it exactly
          sparseMultinomDeviance(rows.map(r => (r._1, r._2, r._3.map(_ * r._4))),
            a0Out, betaOut, k))
    } finally raw.unpersist(blocking = false)
  }

  /** SPARSE multinomial fit WITH a per-class offset matrix (round 16 —
    * the [[fitMultinomialWithOffset]] algebra over CSR rows: shared
    * offset-null Newton, offset-corrected null gradient for the lambda
    * path, and the offset in every sparse FISTA gradient / deviance
    * pass; the matrix is never densified). One offset column per
    * class, sorted-label order; optional frequency weights. */
  def fitSparseMultinomialWithOffset(df: DataFrame, idxCol: String,
                                     valCol: String, dim: Int,
                                     labelCol: String,
                                     offsetCols: Seq[String],
                                     params: SgdNetParams,
                                     weightCol: String = null): SgdNetModel = {
    requireGramP(dim)
    import org.apache.spark.sql.functions.{col, lit}
    require(params.family == "multinomial",
      s"fitSparseMultinomialWithOffset is the multinomial route, not ${params.family}")
    val classes = multinomialClasses(df, labelCol)
    val k = classes.length
    require(offsetCols.size == k,
      s"multinomial offset needs one column per class (nclass = $k, " +
        s"sorted-label order), got ${offsetCols.size}")
    val classIdx = classes.zipWithIndex.toMap
    val wCol = if (weightCol == null) lit(1.0) else col(weightCol).cast("double")
    val raw = df.select((Seq(col(idxCol), col(valCol).cast("array<double>"),
        col(labelCol).cast("string")) ++
        offsetCols.map(c => col(c).cast("double")) :+ wCol): _*)
      .rdd.map { r =>
        val y = new Array[Double](k)
        y(classIdx(r.getString(2))) = 1.0
        val off = Array.tabulate(k)(t => r.getDouble(3 + t))
        (r.getSeq[Int](0).toArray, r.getSeq[Double](1).toArray, y, off,
          r.getDouble(3 + k))
      }.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val (nRows, wSum, offSum) = raw.treeAggregate((0L, 0.0, new Array[Double](k)))(
        seqOp = (s, r) => {
          require(r._5 >= 0, "weights must be non-negative")
          if (r._5 > 0) {
            var t = 0
            while (t < k) { s._3(t) += r._5 * r._4(t); t += 1 }
            (s._1 + 1, s._2 + r._5, s._3)
          } else s
        },
        combOp = (a, b) => {
          var t = 0
          while (t < k) { a._3(t) += b._3(t); t += 1 }
          (a._1 + b._1, a._2 + b._2, a._3)
        }, depth = 2)
      require(nRows > 0, "the response (y) is empty.")
      val norm = nRows.toDouble / wSum
      val rows = raw.filter(_._5 > 0).map(r => (r._1, r._2, r._3, r._4, r._5 * norm))
      var passes = 1
      val g = rows.treeAggregate(new GramStats(dim, k))(
        seqOp = (s, r) => s.addSparseWeighted(r._1, r._2, r._3, r._5),
        combOp = (a, b) => a.merge(b), depth = 2)
      passes += 1
      val st = SufficientStats.standardize(g, params.standardize, params.intercept)
      val mean = if (params.intercept) st.xMean else new Array[Double](dim)
      val scale = if (params.standardize) st.xSd else Array.fill(dim)(1.0)
      val n = g.n.toDouble

      val a0n = if (params.intercept)
        Array.tabulate(k)(t =>
          math.log(math.max(st.yMean(t), 1e-12)) - offSum(t) / wSum)
        else new Array[Double](k)
      val (nulldev, nullPasses) = multinomOffsetNull(
        rows.map(r => (r._3, r._4, r._5)), a0n, k, params.intercept, n)
      passes += nullPasses

      val nullB = if (params.lambda != null) null else {
        val (g0, _) = sparseSoftmaxGradOffset(rows, mean, scale,
          Array.ofDim[Double](k, dim), a0n, k)
        passes += 1
        g0.map(_.map(v => -v))
      }

      fitMultinomialCore(g, (0 until dim).map(j => s"V$j").toArray, labelCol,
        classes, params,
        gradFn = (m, s, yB, yA) => sparseSoftmaxGradOffset(rows, m, s, yB, yA, k),
        devFn = (a0Out, betaOut) =>
          sparseMultinomOffsetDeviance(rows, a0Out, betaOut, k),
        nullA0 = a0n, nullB = nullB, nulldevOverride = nulldev,
        passes0 = passes)
    } finally raw.unpersist(blocking = false)
  }

  /** [[sparseSoftmaxGrad]] with per-row per-class offsets: eta adds
    * the row's offset before the softmax; same uncentered
    * accumulation + driver-side standardization correction. */
  private def sparseSoftmaxGradOffset(
      rows: RDD[(Array[Int], Array[Double], Array[Double], Array[Double], Double)],
      mean: Array[Double], scale: Array[Double],
      beta: Array[Array[Double]], a0: Array[Double],
      k: Int): (Array[Array[Double]], Array[Double]) = {
    val p = mean.length
    val sc = rows.sparkContext
    val bOverS = Array.tabulate(k, p)((t, j) => beta(t)(j) / scale(j))
    val centerOff = Array.tabulate(k) { t =>
      var o = a0(t)
      var j = 0
      while (j < p) { o -= mean(j) * bOverS(t)(j); j += 1 }
      o
    }
    val bc = sc.broadcast((bOverS, centerOff))
    val acc = rows.treeAggregate(new Array[Double](k * (p + 1) + 1))(
      seqOp = (s, row) => {
        val (idx, vals, y, off, vn) = row
        val (bos, cOff) = bc.value
        val eta = new Array[Double](k)
        var mx = Double.NegativeInfinity
        var t = 0
        while (t < k) {
          var e = cOff(t) + off(t)
          var i = 0
          while (i < idx.length) { e += vals(i) * bos(t)(idx(i)); i += 1 }
          eta(t) = e; if (e > mx) mx = e
          t += 1
        }
        var z = 0.0
        t = 0
        while (t < k) { eta(t) = math.exp(eta(t) - mx); z += eta(t); t += 1 }
        t = 0
        while (t < k) {
          val r = vn * (eta(t) / z - y(t)) // vn·(P_t - Y_t)
          s(t * (p + 1)) += r
          var i = 0
          while (i < idx.length) {
            s(t * (p + 1) + 1 + idx(i)) += r * vals(i)
            i += 1
          }
          t += 1
        }
        s(k * (p + 1)) += vn
        s
      },
      combOp = (a, b) => { var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a },
      depth = 2)
    val n = acc(k * (p + 1))
    val gradA0 = Array.tabulate(k)(t => acc(t * (p + 1)) / n)
    val grad = Array.tabulate(k, p)((t, j) =>
      (acc(t * (p + 1) + 1 + j) - mean(j) * acc(t * (p + 1))) / scale(j) / n)
    (grad, gradA0)
  }

  /** [[sparseMultinomDeviance]] with per-row per-class offsets and
    * frequency weights. */
  private def sparseMultinomOffsetDeviance(
      rows: RDD[(Array[Int], Array[Double], Array[Double], Array[Double], Double)],
      a0: Array[Array[Double]], beta: Array[Array[Array[Double]]],
      k: Int): Array[Double] = {
    val L = a0.length
    rows.treeAggregate(new Array[Double](L))(
      seqOp = (acc, row) => {
        val (idx, vals, y, off, vn) = row
        var l = 0
        while (l < L) {
          val eta = new Array[Double](k)
          var mx = Double.NegativeInfinity
          var t = 0
          while (t < k) {
            var e = a0(l)(t) + off(t)
            val bl = beta(l)(t)
            var i = 0
            while (i < idx.length) { e += bl(idx(i)) * vals(i); i += 1 }
            eta(t) = e; if (e > mx) mx = e
            t += 1
          }
          var z = 0.0
          t = 0
          while (t < k) { z += math.exp(eta(t) - mx); t += 1 }
          val logZ = mx + math.log(z)
          t = 0
          var ll = 0.0
          while (t < k) { ll += y(t) * (eta(t) - logZ); t += 1 }
          acc(l) += -2.0 * vn * ll
          l += 1
        }
        acc
      },
      combOp = (a, b) => { var i = 0; while (i < L) { a(i) += b(i); i += 1 }; a },
      depth = 2)
  }

  private[ml] def multinomDeviance(rows: RDD[(Array[Double], Array[Double])],
                               a0: Array[Array[Double]],
                               beta: Array[Array[Array[Double]]],
                               k: Int): Array[Double] = {
    val L = a0.length
    rows.treeAggregate(new Array[Double](L))(
      seqOp = (acc, xy) => {
        val (x, y) = xy
        val p = x.length
        var l = 0
        while (l < L) {
          val eta = new Array[Double](k)
          var mx = Double.NegativeInfinity
          var t = 0
          while (t < k) {
            var e = a0(l)(t)
            var j = 0
            while (j < p) { e += beta(l)(t)(j) * x(j); j += 1 }
            eta(t) = e; if (e > mx) mx = e
            t += 1
          }
          var z = 0.0
          t = 0
          while (t < k) { z += math.exp(eta(t) - mx); t += 1 }
          val logZ = mx + math.log(z)
          t = 0
          var ll = 0.0
          while (t < k) { ll += y(t) * (eta(t) - logZ); t += 1 }
          acc(l) += -2.0 * ll
          l += 1
        }
        acc
      },
      combOp = (a, b) => { var i = 0; while (i < L) { a(i) += b(i); i += 1 }; a },
      depth = 2)
  }
}
