package graft.ml

import org.scalatest.funsuite.AnyFunSuite

/** Strong-rule screening (round 16 — Tibshirani et al. 2012): the
  * screened gaussian path must EQUAL the unscreened path on random
  * problems — the sequential strong rule only proposes an active set;
  * the exact KKT backcheck makes the result structurally identical.
  * Pure driver math (GramStats → solveGaussianFromStats), no Spark
  * session — the screening lives entirely below the aggregation. */
class ScreenSpec extends AnyFunSuite {

  private def randomProblem(p: Int, n: Int, seed: Int,
                            sparse: Boolean = true): GramStats = {
    val rnd = new scala.util.Random(seed)
    val g = new GramStats(p, 1)
    val trueBeta = Array.tabulate(p)(j =>
      if (!sparse || j % 11 == 0) rnd.nextGaussian() * 2.0 else 0.0)
    for (_ <- 0 until n) {
      val x = Array.fill(p)(rnd.nextGaussian())
      val y = (0 until p).map(j => x(j) * trueBeta(j)).sum + rnd.nextGaussian()
      g.add(x, Array(y))
    }
    g
  }

  private def maxDiff(a: SgdNetModel, b: SgdNetModel): Double = {
    var d = math.abs(a.nulldev - b.nulldev)
    for (l <- a.lambda.indices) {
      d = math.max(d, math.abs(a.a0(l)(0) - b.a0(l)(0)))
      d = math.max(d, math.abs(a.devRatio(l) - b.devRatio(l)))
      for (j <- a.beta(l)(0).indices)
        d = math.max(d, math.abs(a.beta(l)(0)(j) - b.beta(l)(0)(j)))
    }
    d
  }

  private val names64 = (0 until 64).map(j => s"V$j")

  test("screened path == unscreened path (lasso + elastic net, 64 features)") {
    for ((alpha, seed) <- Seq((1.0, 7), (0.6, 11))) {
      val g = randomProblem(64, 400, seed)
      val prm = SgdNetParams(alpha = alpha, nlambda = 30, thresh = 1e-9)
      val s = SgdNet.solveGaussianFromStats(g, names64, Seq("y"), prm)
      val u = SgdNet.solveGaussianFromStats(g, names64, Seq("y"), prm,
        screen = false)
      assert(s.lambda.sameElements(u.lambda))
      val d = maxDiff(s, u)
      assert(d < 1e-9, s"alpha=$alpha maxDiff=$d")
    }
  }

  test("screened path == unscreened with penalty factors, limits, user grid") {
    val g = randomProblem(64, 300, seed = 23)
    val pf = Array.tabulate(64)(j =>
      if (j % 13 == 0) 0.0 else if (j % 5 == 0) 2.0 else 1.0)
    val prm = SgdNetParams(alpha = 1.0, thresh = 1e-9,
      lambda = Array(0.8, 0.4, 0.1, 0.02, 0.005), penaltyFactor = pf)
    val s = SgdNet.solveGaussianFromStats(g, names64, Seq("y"), prm)
    val u = SgdNet.solveGaussianFromStats(g, names64, Seq("y"), prm,
      screen = false)
    assert(maxDiff(s, u) < 1e-9, "penalty factors")
    val prmLim = SgdNetParams(alpha = 0.9, thresh = 1e-9, nlambda = 20,
      lowerLimits = Array.fill(64)(-0.5), upperLimits = Array.fill(64)(0.8))
    val sl = SgdNet.solveGaussianFromStats(g, names64, Seq("y"), prmLim)
    val ul = SgdNet.solveGaussianFromStats(g, names64, Seq("y"), prmLim,
      screen = false)
    assert(maxDiff(sl, ul) < 1e-9, "box limits")
  }

  test("screened solution satisfies the full problem's KKT conditions") {
    val p = 96
    val g = randomProblem(p, 500, seed = 41)
    val prm = SgdNetParams(alpha = 1.0, nlambda = 25, thresh = 1e-10)
    val m = SgdNet.solveGaussianFromStats(g, (0 until p).map(j => s"V$j"),
      Seq("y"), prm)
    // re-derive the standardized working problem and check subgradient
    // optimality of every ZERO coordinate at every lambda
    val st = SufficientStats.standardize(g, standardizeX = true, intercept = true)
    for (l <- m.lambda.indices) {
      // back to the working scale: beta_std = beta * sd
      val bStd = Array.tabulate(p)(j => m.beta(l)(0)(j) * st.xSd(j))
      for (j <- 0 until p if bStd(j) == 0.0) {
        var s = 0.0
        for (k2 <- 0 until p) s += st.gram(j)(k2) * bStd(k2)
        val rho = math.abs(st.b(0)(j) - s)
        assert(rho <= m.lambda(l) * prm.alpha + 1e-7,
          s"KKT violated at lambda($l) coord $j: $rho > ${m.lambda(l)}")
      }
    }
  }

  test("screened WLS subproblem == unscreened (IRLS strong rule, round 17)") {
    // solveScreened is the per-Newton screen for the GLM IRLS cores:
    // random intercept-bearing weighted subproblems along a lambda path,
    // warm-started like the real solver — equality is structural (KKT
    // backcheck), assert it numerically to 1e-10
    val p = 48
    val rnd = new scala.util.Random(71)
    val n = 300
    val xs = Array.fill(n)(Array.fill(p)(rnd.nextGaussian()))
    val w = Array.fill(n)(0.05 + rnd.nextDouble() * 0.2) // IRLS-like weights
    val z = xs.map(x => 1.3 * x(0) - 0.9 * x(7) + 0.4 * x(20) +
      rnd.nextGaussian() * 0.5)
    val a = Array.ofDim[Double](p, p)
    val c = new Array[Double](p)
    val xw = new Array[Double](p)
    var zw = 0.0
    var ww = 0.0
    for (i <- 0 until n) {
      ww += w(i) / n; zw += w(i) * z(i) / n
      for (j <- 0 until p) {
        c(j) += w(i) * xs(i)(j) * z(i) / n
        xw(j) += w(i) * xs(i)(j) / n
        for (m <- 0 to j) {
          a(m)(j) += w(i) * xs(i)(m) * xs(i)(j) / n
          if (m != j) a(j)(m) = a(m)(j)
        }
      }
    }
    val pf = Array.tabulate(p)(j => if (j % 9 == 0) 0.0 else 1.0)
    val lo = Array.fill(p)(-0.9)
    val up = Array.fill(p)(1.1)
    for ((alpha, usePf, useLim) <- Seq((1.0, false, false), (0.7, true, false),
        (0.9, false, true))) {
      val lams = Array(0.5, 0.2, 0.08, 0.03, 0.01)
      var warmU = new Array[Double](p)
      var warmS = new Array[Double](p)
      for (li <- lams.indices) {
        val u = CoordinateDescent.solve(a, c, xw, zw, ww, lams(li), alpha,
          intercept = true, warmU, thresh = 1e-12, maxIter = 100000,
          penaltyFactor = if (usePf) pf else null,
          lower = if (useLim) lo else null, upper = if (useLim) up else null)
        val s = if (li == 0) u
          else CoordinateDescent.solveScreened(a, c, xw, zw, ww, lams(li),
            lams(li - 1), alpha, intercept = true, warmS, thresh = 1e-12,
            maxIter = 100000, penaltyFactor = if (usePf) pf else null,
            lower = if (useLim) lo else null, upper = if (useLim) up else null)
        assert(math.abs(s.a0 - u.a0) < 1e-10,
          s"alpha=$alpha pf=$usePf lim=$useLim a0($li)")
        for (j <- 0 until p)
          assert(math.abs(s.beta(j) - u.beta(j)) < 1e-10,
            s"alpha=$alpha pf=$usePf lim=$useLim beta($li)($j)")
        warmU = u.beta; warmS = s.beta.clone()
      }
    }
    // dense warm start takes the gate fallback (bitwise-equal full solve)
    val dense = Array.fill(p)(0.1)
    val u2 = CoordinateDescent.solve(a, c, xw, zw, ww, 0.01, 1.0,
      intercept = true, dense, thresh = 1e-12, maxIter = 100000)
    val s2 = CoordinateDescent.solveScreened(a, c, xw, zw, ww, 0.01, 0.03,
      1.0, intercept = true, dense, thresh = 1e-12, maxIter = 100000)
    assert(s2.a0 == u2.a0 && s2.beta.sameElements(u2.beta))
  }

  test("small-p and alpha = 0 keep the direct unscreened route") {
    // p < ScreenMinP: the screened and unscreened calls run the SAME
    // code path (gate), so equality is trivially bitwise
    val g = randomProblem(8, 200, seed = 55)
    val names = (0 until 8).map(j => s"V$j")
    val prm = SgdNetParams(alpha = 1.0, nlambda = 10, thresh = 1e-9)
    val s = SgdNet.solveGaussianFromStats(g, names, Seq("y"), prm)
    val u = SgdNet.solveGaussianFromStats(g, names, Seq("y"), prm,
      screen = false)
    assert(maxDiff(s, u) == 0.0)
    // ridge never screens (the rule keeps everything at alpha = 0)
    val g2 = randomProblem(64, 300, seed = 61)
    val r = SgdNet.solveGaussianFromStats(g2, names64, Seq("y"),
      SgdNetParams(alpha = 0.0, nlambda = 5, thresh = 1e-9))
    val r2 = SgdNet.solveGaussianFromStats(g2, names64, Seq("y"),
      SgdNetParams(alpha = 0.0, nlambda = 5, thresh = 1e-9), screen = false)
    assert(maxDiff(r, r2) == 0.0)
  }

  test("screened WLS at the PRODUCTION thresh regime (round 18)") {
    // The IRLS callers pass thresh = newtonTol (~1e-7 at the default
    // params.thresh = 1e-3). Round 18 tied the KKT-backcheck tolerance
    // to thresh itself (was thresh*1e2, leaving ~1e-5·λ of slack where
    // boundary coordinates stayed screened out). Assert at exactly that
    // regime: screened == unscreened within O(thresh), and the screened
    // zeros satisfy the FULL problem's KKT within the backcheck bound.
    val p = 48
    val rnd = new scala.util.Random(83)
    val n = 300
    val xs = Array.fill(n)(Array.fill(p)(rnd.nextGaussian()))
    val w = Array.fill(n)(0.05 + rnd.nextDouble() * 0.2)
    val z = xs.map(x => 1.1 * x(2) - 0.8 * x(9) + 0.3 * x(31) +
      rnd.nextGaussian() * 0.5)
    val a = Array.ofDim[Double](p, p)
    val c = new Array[Double](p)
    val xw = new Array[Double](p)
    var zw = 0.0
    var ww = 0.0
    for (i <- 0 until n) {
      ww += w(i) / n; zw += w(i) * z(i) / n
      for (j <- 0 until p) {
        c(j) += w(i) * xs(i)(j) * z(i) / n
        xw(j) += w(i) * xs(i)(j) / n
        for (m <- 0 to j) {
          a(m)(j) += w(i) * xs(i)(m) * xs(i)(j) / n
          if (m != j) a(j)(m) = a(m)(j)
        }
      }
    }
    val thresh = 1e-7 // == newtonTol at the default params.thresh
    val lams = Array(0.5, 0.2, 0.08, 0.03, 0.01)
    for (alpha <- Seq(1.0, 0.7)) {
      var warmU = new Array[Double](p)
      var warmS = new Array[Double](p)
      for (li <- lams.indices) {
        val u = CoordinateDescent.solve(a, c, xw, zw, ww, lams(li), alpha,
          intercept = true, warmU, thresh = thresh, maxIter = 100000)
        val s = if (li == 0) u
          else CoordinateDescent.solveScreened(a, c, xw, zw, ww, lams(li),
            lams(li - 1), alpha, intercept = true, warmS, thresh = thresh,
            maxIter = 100000)
        // O(thresh) agreement: both solves stop within thresh of the
        // optimum, so they can differ by a small multiple of it
        assert(math.abs(s.a0 - u.a0) < 1e-5, s"alpha=$alpha a0($li)")
        for (j <- 0 until p)
          assert(math.abs(s.beta(j) - u.beta(j)) < 1e-5,
            s"alpha=$alpha beta($li)($j)")
        // full-problem KKT at every screened zero, at the backcheck's
        // own tolerance (thresh, not thresh*1e2)
        val a0s = s.a0
        val tol = thresh * math.max(lams(li), 1.0) * 2.0
        for (j <- 0 until p if s.beta(j) == 0.0) {
          var g = c(j) - a0s * xw(j)
          for (m <- 0 until p) g -= a(j)(m) * s.beta(m)
          assert(math.abs(g) <= lams(li) * alpha + tol,
            s"alpha=$alpha KKT zero($li)($j): |$g| > ${lams(li) * alpha}")
        }
        warmU = u.beta; warmS = s.beta.clone()
      }
    }
  }
}
