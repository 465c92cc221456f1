package graft.ml

import LinAlg._

/** Penalized (weighted) least-squares solver by coordinate descent with
  * covariance updates (Friedman, Hastie & Tibshirani 2010, "Regularization
  * Paths for Generalized Linear Models via Coordinate Descent").
  *
  * Operates purely on p x p moment matrices produced by one Spark pass
  * (see [[SufficientStats]]); never touches row data. This replaces the
  * reference's sequential SAGA inner loop (sgdnet src/saga-dense.h:1) with
  * a solver whose data access pattern distributes: at 100 TB the cost is
  * the aggregation scan, not the optimization.
  *
  * Objective (working scale):
  *   1/(2n) sum_i w_i (z_i - a0 - x_i'beta)^2
  *     + lambda * [ (1-alpha)/2 ||beta||_2^2 + alpha ||beta||_1 ]
  * expressed via moments A = (1/n) X'WX, c = (1/n) X'Wz,
  * xw = (1/n) X'w, zw = (1/n) z'w, ww = (1/n) sum w.
  */
object CoordinateDescent {

  final case class Result(a0: Double, beta: Array[Double], iters: Int)

  def solve(
      a: Array[Array[Double]],   // (1/n) X'WX
      c: Array[Double],          // (1/n) X'Wz
      xw: Array[Double],         // (1/n) X'w   (zeros if pre-centered)
      zw: Double,                // (1/n) w'z   (0 if pre-centered)
      ww: Double,                // (1/n) sum w (1 for unweighted)
      lambda: Double,
      alpha: Double,
      intercept: Boolean,
      init: Array[Double],
      thresh: Double = 1e-7,
      maxIter: Int = 10000,
      // multiplier on the L2 term only — 1.0 for the documented
      // objective; 1/sd_pop(y) reproduces the reference solver's
      // implemented penalty construction (SgdNetParams.sgdnetCompat)
      l2Scale: Double = 1.0,
      // glmnet penalty.factor: per-coordinate multiplier on BOTH
      // penalty terms (0 = unpenalized, used as given, no rescaling);
      // null = all ones
      penaltyFactor: Array[Double] = null,
      // glmnet lower.limits / upper.limits, on THIS solver's (working,
      // standardized) coordinate scale; null = unbounded. Each
      // coordinate step solves its 1-D box-constrained subproblem
      // exactly: clip(soft-threshold update) is the prox of
      // l1 + box when 0 ∈ [lower_j, upper_j] (enforced by callers,
      // the glmnet requirement), so cyclic CD converges to the
      // box-constrained elastic-net optimum
      lower: Array[Double] = null,
      upper: Array[Double] = null): Result = {

    val p = c.length
    val beta = init.clone()
    val l1 = lambda * alpha
    val l2 = lambda * (1.0 - alpha) * l2Scale
    require(penaltyFactor == null ||
      (penaltyFactor.length == p && penaltyFactor.forall(_ >= 0)),
      "penaltyFactor must have one non-negative entry per feature")
    var a0 = 0.0

    // residual moment r_j = (1/n) <x_j, w*(z - a0 - X beta)>
    //                     = c_j - a0*xw_j - sum_k a_jk beta_k
    val ab = new Array[Double](p) // sum_k a_jk beta_k, maintained incrementally
    var j = 0
    while (j < p) {
      var s = 0.0
      val aj = a(j)
      var kk = 0
      while (kk < p) { s += aj(kk) * beta(kk); kk += 1 }
      ab(j) = s
      j += 1
    }

    var it = 0
    var converged = false
    while (it < maxIter && !converged) {
      var maxDelta = 0.0
      if (intercept && ww > 0) {
        val newA0 = (zw - dot(xw, beta)) / ww
        if (newA0 != a0) {
          a0 = newA0
        }
      }
      j = 0
      while (j < p) {
        val old = beta(j)
        val ajj = a(j)(j)
        val pf = if (penaltyFactor == null) 1.0 else penaltyFactor(j)
        if (ajj > 0 || l2 * pf > 0) {
          val rho = c(j) - a0 * xw(j) - (ab(j) - ajj * old)
          var nb = softThreshold(rho, l1 * pf) / (ajj + l2 * pf)
          if (lower != null && nb < lower(j)) nb = lower(j)
          if (upper != null && nb > upper(j)) nb = upper(j)
          if (nb != old) {
            val d = nb - old
            beta(j) = nb
            // incremental update of A*beta
            val col = a(j)
            var kk = 0
            while (kk < p) { ab(kk) += col(kk) * d; kk += 1 }
            val ad = math.abs(d)
            if (ad > maxDelta) maxDelta = ad
          }
        }
        j += 1
      }
      it += 1
      if (maxDelta < thresh) converged = true
    }
    Result(a0, beta, it)
  }

  /** [[solve]] behind the SEQUENTIAL STRONG RULE (round 17 — Tibshirani
    * et al. 2012, "Strong rules for discarding predictors in lasso-type
    * problems", §5 extends the rule to the penalized WLS subproblems of
    * GLM IRLS): density-gated screening with an exact KKT backcheck over
    * the discarded coordinates, so the returned solution satisfies the
    * FULL problem's optimality conditions — equality with the unscreened
    * [[solve]] is structural, not approximate (violators re-enter and
    * the subproblem re-solves). `lamPrev` is the previous path point;
    * the rule keeps j when |grad_j| >= alpha·(2λ − λ_prev)·pf_j at the
    * warm start, plus warm-nonzeros and unpenalized coordinates.
    * Callers route the FIRST path point (no λ_prev) to [[solve]]. */
  def solveScreened(
      a: Array[Array[Double]], c: Array[Double], xw: Array[Double],
      zw: Double, ww: Double, lambda: Double, lamPrev: Double,
      alpha: Double, intercept: Boolean, init: Array[Double],
      thresh: Double = 1e-7, maxIter: Int = 10000,
      l2Scale: Double = 1.0, penaltyFactor: Array[Double] = null,
      lower: Array[Double] = null, upper: Array[Double] = null): Result = {
    val p = c.length
    def full(): Result = solve(a, c, xw, zw, ww, lambda, alpha, intercept,
      init, thresh, maxIter, l2Scale, penaltyFactor, lower, upper)
    if (alpha <= 0) return full()
    // density gate (same argument as the gaussian path screen): once
    // the warm active set approaches p the subproblem IS the full
    // problem and the bookkeeping only adds cost
    val nz0 = new Array[Int](p)
    var nzN = 0
    var j = 0
    while (j < p) { if (init(j) != 0.0) { nz0(nzN) = j; nzN += 1 }; j += 1 }
    if (nzN * 2 > p) return full()
    val a0w =
      if (intercept && ww > 0) {
        var s = 0.0
        var j2 = 0
        while (j2 < p) { s += xw(j2) * init(j2); j2 += 1 }
        (zw - s) / ww
      } else 0.0
    val pf = penaltyFactor
    val bound = alpha * (2.0 * lambda - lamPrev)
    val inAct = new Array[Boolean](p)
    val act = scala.collection.mutable.ArrayBuffer.empty[Int]
    j = 0
    while (j < p) {
      var s = 0.0
      val aj = a(j)
      var i = 0
      while (i < nzN) { s += aj(nz0(i)) * init(nz0(i)); i += 1 }
      val grad = c(j) - a0w * xw(j) - s
      val pfj = if (pf == null) 1.0 else pf(j)
      if (init(j) != 0.0 || pfj == 0.0 || math.abs(grad) >= bound * pfj) {
        inAct(j) = true; act += j
      }
      j += 1
    }
    if (act.length * 2 > p) return full()
    val out = init.clone()
    var a0 = a0w
    var iters = 0
    var done = false
    while (!done) {
      val idx = act.toArray
      val m = idx.length
      val aSub = Array.tabulate(m, m)((x, y) => a(idx(x))(idx(y)))
      val cSub = Array.tabulate(m)(x => c(idx(x)))
      val xwSub = Array.tabulate(m)(x => xw(idx(x)))
      val initSub = Array.tabulate(m)(x => out(idx(x)))
      val loS = if (lower == null) null else Array.tabulate(m)(x => lower(idx(x)))
      val upS = if (upper == null) null else Array.tabulate(m)(x => upper(idx(x)))
      val pfS = if (pf == null) null else Array.tabulate(m)(x => pf(idx(x)))
      val r = solve(aSub, cSub, xwSub, zw, ww, lambda, alpha, intercept,
        initSub, thresh, maxIter, l2Scale, pfS, loS, upS)
      iters += r.iters
      a0 = r.a0
      var x = 0
      while (x < m) { out(idx(x)) = r.beta(x); x += 1 }
      // exact KKT over the discarded coordinates (all at beta = 0):
      // |c_j − a0·xw_j − A_j,act·beta| <= λ·alpha·pf_j (+ tolerance
      // tracking the CD threshold so finite-precision actives don't
      // spuriously re-enter)
      val nz2 = idx.filter(out(_) != 0.0)
      // tolerance == the CD convergence threshold itself (round 18:
      // was thresh*1e2, which at the IRLS callers' thresh=newtonTol
      // left ~1e-5·λ of slack where a boundary coordinate could stay
      // screened out while the unscreened solve would activate it).
      // A marginal false re-entry only costs one extra sub-solve —
      // act is grow-only, so the loop still terminates.
      val tol = math.max(thresh, 1e-12) * math.max(lambda, 1.0)
      var violations = 0
      j = 0
      while (j < p) {
        if (!inAct(j)) {
          var s = 0.0
          val aj = a(j)
          var i = 0
          while (i < nz2.length) { s += aj(nz2(i)) * out(nz2(i)); i += 1 }
          val pfj = if (pf == null) 1.0 else pf(j)
          if (math.abs(c(j) - a0 * xw(j) - s) > lambda * alpha * pfj + tol) {
            inAct(j) = true; act += j; violations += 1
          }
        }
        j += 1
      }
      done = violations == 0
    }
    Result(a0, out, iters)
  }

  /** Group-lasso CD for multi-response (mgaussian): penalty
    * lambda * [ (1-alpha)/2 ||B||_F^2 + alpha * sum_j ||B_j.||_2 ]
    * (the l1/l2 mixed norm of sgdnet's mgaussian objective,
    * reference R/sgdnet.R:76-88). Requires pre-centered moments
    * (intercept recovered outside). gram diag assumed > 0.
    */
  def solveGroup(
      gram: Array[Array[Double]],  // (1/n) Xs'Xs
      b: Array[Array[Double]],     // [K][p] (1/n) <xs_j, y_t>
      lambda: Double,
      alpha: Double,
      init: Array[Array[Double]],  // [K][p]
      thresh: Double = 1e-7,
      maxIter: Int = 10000,
      // glmnet penalty.factor for the GROUP penalty: per-FEATURE
      // multiplier on both the group-l1 and l2 terms (the whole
      // cross-response group j is scaled by pf_j); null = all ones
      penaltyFactor: Array[Double] = null,
      // glmnet lower.limits / upper.limits on the working standardized
      // scale, PER RESPONSE then per feature ([K][p] — mgaussian's
      // standardize.response makes the working bound response-specific).
      // null = unbounded; when present, the block update is the
      // box-constrained group prox (LinAlg.boxedGroupProx — bisection
      // on the group norm; round 16, closes the documented
      // mgaussian-limits gap). Block CD on a strongly convex smooth
      // term + block-separable nonsmooth term converges (Tseng 2001),
      // and the unbounded path below is byte-identical to round 15's.
      lower: Array[Array[Double]] = null,
      upper: Array[Array[Double]] = null): (Array[Array[Double]], Int) = {

    val k = b.length
    val p = if (k == 0) 0 else b(0).length
    val beta = init.map(_.clone())
    val l1 = lambda * alpha
    val l2 = lambda * (1.0 - alpha)
    require(penaltyFactor == null ||
      (penaltyFactor.length == p && penaltyFactor.forall(_ >= 0)),
      "penaltyFactor must have one non-negative entry per feature")

    // gb(t)(j) = sum_m gram(j)(m) * beta(t)(m)
    val gb = Array.tabulate(k, p) { (t, j) =>
      var s = 0.0; var m = 0
      while (m < p) { s += gram(j)(m) * beta(t)(m); m += 1 }
      s
    }

    var it = 0
    var converged = false
    val rho = new Array[Double](k)
    while (it < maxIter && !converged) {
      var maxDelta = 0.0
      var j = 0
      while (j < p) {
        val gjj = gram(j)(j)
        var t = 0
        var nrm = 0.0
        while (t < k) {
          rho(t) = b(t)(j) - (gb(t)(j) - gjj * beta(t)(j))
          nrm += rho(t) * rho(t)
          t += 1
        }
        nrm = math.sqrt(nrm)
        val pf = if (penaltyFactor == null) 1.0 else penaltyFactor(j)
        val l1j = l1 * pf
        val boxed = lower != null || upper != null
        val nbArr =
          if (!boxed) null
          else {
            val loJ = Array.tabulate(k)(t2 =>
              if (lower == null) Double.NegativeInfinity else lower(t2)(j))
            val upJ = Array.tabulate(k)(t2 =>
              if (upper == null) Double.PositiveInfinity else upper(t2)(j))
            LinAlg.boxedGroupProx(rho, gjj + l2 * pf, l1j, loJ, upJ,
              new Array[Double](k))
          }
        val shrink = if (boxed) 0.0
          else if (nrm > l1j) (1.0 - l1j / nrm) / (gjj + l2 * pf) else 0.0
        t = 0
        while (t < k) {
          val nb = if (boxed) nbArr(t) else rho(t) * shrink
          val d = nb - beta(t)(j)
          if (d != 0.0) {
            beta(t)(j) = nb
            val col = gram(j)
            var m = 0
            while (m < p) { gb(t)(m) += col(m) * d; m += 1 }
            val ad = math.abs(d)
            if (ad > maxDelta) maxDelta = ad
          }
          t += 1
        }
        j += 1
      }
      it += 1
      if (maxDelta < thresh) converged = true
    }
    (beta, it)
  }
}
