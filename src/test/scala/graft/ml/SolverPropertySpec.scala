package graft.ml

import org.scalatest.funsuite.AnyFunSuite

/** Property-based KKT verification of the driver-side CD solver on random
  * well-posed problems (no Spark involved — the solver is pure). For any
  * generated (Gram, b, lambda, alpha), the returned coefficients must
  * satisfy the elastic-net optimality conditions.
  */
class SolverPropertySpec extends AnyFunSuite {

  private def randomProblem(seed: Long, p: Int) = {
    val rnd = new scala.util.Random(seed)
    // PSD gram with unit diagonal: G = A'A/rows, normalized
    val rows = p * 4
    val a = Array.fill(rows, p)(rnd.nextGaussian())
    val g = Array.tabulate(p, p)((i, j) =>
      (0 until rows).map(r => a(r)(i) * a(r)(j)).sum / rows)
    val d = Array.tabulate(p)(i => math.sqrt(g(i)(i)))
    val gn = Array.tabulate(p, p)((i, j) => g(i)(j) / (d(i) * d(j)))
    val b = Array.fill(p)(rnd.nextGaussian())
    (gn, b)
  }

  test("CD solutions satisfy elastic-net KKT conditions for random problems") {
    for (trial <- 1 to 60) {
      val trialRnd = new scala.util.Random(trial * 977L)
      val seed = trialRnd.nextLong(); val p = 2 + trialRnd.nextInt(7)
      val alpha = trialRnd.nextDouble(); val lam = 0.01 + trialRnd.nextDouble() * 0.99
      locally {
        val (g, b) = randomProblem(seed, p)
        val r = CoordinateDescent.solve(g, b, new Array[Double](p), 0.0, 1.0,
          lam, alpha, intercept = false, new Array[Double](p),
          thresh = 1e-12, maxIter = 100000)
        val l1 = lam * alpha
        val l2 = lam * (1 - alpha)
        for (j <- 0 until p) {
          val grad = (0 until p).map(k => g(j)(k) * r.beta(k)).sum - b(j) + l2 * r.beta(j)
          if (r.beta(j) == 0.0)
            assert(math.abs(grad) <= l1 + 1e-7, s"zero-coef KKT j=$j: |$grad| > $l1")
          else
            assert(math.abs(grad + l1 * math.signum(r.beta(j))) < 1e-7,
              s"active-coef KKT j=$j trial=$trial")
        }
      }
    }
  }

  test("group CD solutions satisfy group-lasso KKT for random multi-response problems") {
    for (trial <- 1 to 40) {
      val trialRnd = new scala.util.Random(trial * 1409L)
      val seed = trialRnd.nextLong(); val p = 2 + trialRnd.nextInt(5)
      val lam = 0.05 + trialRnd.nextDouble() * 0.75
      locally {
        val (g, _) = randomProblem(seed, p)
        val rnd = new scala.util.Random(seed + 1)
        val k = 2
        val b = Array.fill(k, p)(rnd.nextGaussian())
        val (beta, _) = CoordinateDescent.solveGroup(g, b, lam, 1.0,
          Array.ofDim[Double](k, p), thresh = 1e-12, maxIter = 100000)
        for (j <- 0 until p) {
          val grad = Array.tabulate(k)(t =>
            (0 until p).map(m => g(j)(m) * beta(t)(m)).sum - b(t)(j))
          val nrm = math.sqrt(grad.map(x => x * x).sum)
          val bn = math.sqrt((0 until k).map(t => beta(t)(j) * beta(t)(j)).sum)
          if (bn == 0.0) assert(nrm <= lam + 1e-7, s"zero-group KKT j=$j: $nrm > $lam")
          else (0 until k).foreach { t =>
            assert(math.abs(grad(t) + lam * beta(t)(j) / bn) < 1e-7, s"active-group j=$j t=$t")
          }
        }
      }
    }
  }

  test("group CD with penalty factors satisfies the pf-scaled group KKT") {
    for (trial <- 1 to 40) {
      val trialRnd = new scala.util.Random(trial * 2203L)
      val seed = trialRnd.nextLong(); val p = 2 + trialRnd.nextInt(5)
      val lam = 0.05 + trialRnd.nextDouble() * 0.75
      val alpha = trialRnd.nextDouble()
      locally {
        val (g, _) = randomProblem(seed, p)
        val rnd = new scala.util.Random(seed + 1)
        val k = 2 + rnd.nextInt(2)
        val b = Array.fill(k, p)(rnd.nextGaussian())
        // pf mixes light, unit, and heavy factors (never 0: the group
        // path requires an explicit lambda for pf=0 — separate contract)
        val pf = Array.fill(p)(Seq(0.25, 1.0, 4.0)(rnd.nextInt(3)))
        val (beta, _) = CoordinateDescent.solveGroup(g, b, lam, alpha,
          Array.ofDim[Double](k, p), thresh = 1e-12, maxIter = 100000,
          penaltyFactor = pf)
        val l1 = lam * alpha
        val l2 = lam * (1 - alpha)
        for (j <- 0 until p) {
          val grad = Array.tabulate(k)(t =>
            (0 until p).map(m => g(j)(m) * beta(t)(m)).sum - b(t)(j) +
              l2 * pf(j) * beta(t)(j))
          val nrm = math.sqrt(grad.map(x => x * x).sum)
          val bn = math.sqrt((0 until k).map(t => beta(t)(j) * beta(t)(j)).sum)
          if (bn == 0.0)
            assert(nrm <= l1 * pf(j) + 1e-7,
              s"zero-group pf KKT j=$j: $nrm > ${l1 * pf(j)} trial=$trial")
          else (0 until k).foreach { t =>
            assert(math.abs(grad(t) + l1 * pf(j) * beta(t)(j) / bn) < 1e-7,
              s"active-group pf KKT j=$j t=$t trial=$trial")
          }
        }
      }
    }
  }

  test("soft-threshold and logspace basics") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val z = rnd.nextDouble() * 20 - 10; val g = rnd.nextDouble() * 5
      val s = LinAlg.softThreshold(z, g)
      assert(math.abs(s) <= math.max(math.abs(z) - g, 0.0) + 1e-15)
      assert(s * z >= 0.0, "never flips sign")
    }
    for (_ <- 1 to 100) {
      val hi = 0.1 + rnd.nextDouble() * 100; val n = 2 + rnd.nextInt(49)
      val xs = LambdaPath.logSpace(hi, hi * 1e-4, n)
      assert(xs.length == n && math.abs(xs.head - hi) < 1e-9 * hi)
      assert(xs.sliding(2).forall(a => a(0) > a(1)))
    }
  }

  test("solveScreened == solve over 40 random weighted WLS problems (round 17)") {
    // the strong-rule screen's equality with the direct solve must hold
    // for ANY warm start / lambda pair / penalty config, not just the
    // curated ScreenSpec cases — violators re-enter via the exact KKT
    // backcheck, so equality is structural
    for (trial <- 1 to 40) {
      val rnd = new scala.util.Random(trial * 7919L)
      val p = 36 + rnd.nextInt(24)
      val n = 200 + rnd.nextInt(200)
      val a = Array.ofDim[Double](p, p)
      val c = new Array[Double](p)
      val xw = new Array[Double](p)
      var zw = 0.0
      var ww = 0.0
      val trueB = Array.tabulate(p)(j =>
        if (rnd.nextDouble() < 0.1) rnd.nextGaussian() * 2 else 0.0)
      for (_ <- 0 until n) {
        val x = Array.fill(p)(rnd.nextGaussian())
        val w = 0.02 + rnd.nextDouble() * 0.25
        var z = rnd.nextGaussian() * 0.6
        var j = 0
        while (j < p) { z += x(j) * trueB(j); j += 1 }
        ww += w / n; zw += w * z / n
        j = 0
        while (j < p) {
          c(j) += w * x(j) * z / n
          xw(j) += w * x(j) / n
          var m = 0
          while (m <= j) {
            a(m)(j) += w * x(m) * x(j) / n
            if (m != j) a(j)(m) = a(m)(j)
            m += 1
          }
          j += 1
        }
      }
      val alpha = 0.5 + rnd.nextDouble() * 0.5
      val lamMax = c.map(math.abs).max / alpha
      val lam = lamMax * (0.02 + rnd.nextDouble() * 0.5)
      val lamPrev = lam * (1.2 + rnd.nextDouble())
      val pf = if (rnd.nextBoolean()) null
        else Array.tabulate(p)(j => if (j % 11 == 0) 0.0 else 1.0)
      // warm start: the direct solve at lamPrev (a realistic path warm)
      val warm = CoordinateDescent.solve(a, c, xw, zw, ww, lamPrev, alpha,
        intercept = true, new Array[Double](p), thresh = 1e-12,
        maxIter = 100000, penaltyFactor = pf).beta
      val u = CoordinateDescent.solve(a, c, xw, zw, ww, lam, alpha,
        intercept = true, warm, thresh = 1e-12, maxIter = 100000,
        penaltyFactor = pf)
      val s = CoordinateDescent.solveScreened(a, c, xw, zw, ww, lam, lamPrev,
        alpha, intercept = true, warm, thresh = 1e-12, maxIter = 100000,
        penaltyFactor = pf)
      assert(math.abs(s.a0 - u.a0) < 1e-9, s"trial $trial a0")
      for (j <- 0 until p)
        assert(math.abs(s.beta(j) - u.beta(j)) < 1e-9,
          s"trial $trial beta($j): ${s.beta(j)} vs ${u.beta(j)}")
    }
  }
}
