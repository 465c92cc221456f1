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
}
