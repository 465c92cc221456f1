package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Box limits on the GROUP-penalty paths (round 16 — closes the
  * documented mgaussian / grouped-multinomial limits gap via the
  * box-constrained group prox, [[LinAlg.boxedGroupProx]]):
  * prox-level optimality certificates, fit-level containment, and
  * non-binding-bounds == unbounded parity. */
class GroupLimitsSpec extends SparkSpec {
  import spark.implicits._

  private def proxObjective(u: Array[Double], r: Array[Double], q: Double,
                            g: Double): Double = {
    var quad = 0.0; var lin = 0.0; var nrm = 0.0
    for (t <- u.indices) { quad += u(t) * u(t); lin += r(t) * u(t); nrm += u(t) * u(t) }
    0.5 * q * quad - lin + g * math.sqrt(nrm)
  }

  test("boxedGroupProx: optimality certificates on random problems") {
    val rnd = new scala.util.Random(31)
    for (trial <- 0 until 200) {
      val k = 2 + rnd.nextInt(4)
      val r = Array.fill(k)(rnd.nextGaussian() * 3)
      val q = 0.2 + rnd.nextDouble() * 3
      val g = rnd.nextDouble() * 3
      val lo = Array.fill(k)(-rnd.nextDouble() * 2)
      val up = Array.fill(k)(rnd.nextDouble() * 2)
      if (trial % 5 == 0) { lo(0) = 0.0; up(0) = 0.0 } // pinned coordinate
      val u = LinAlg.boxedGroupProx(r, q, g, lo, up, new Array[Double](k))
      for (t <- 0 until k)
        assert(u(t) >= lo(t) - 1e-12 && u(t) <= up(t) + 1e-12,
          s"trial $trial coord $t out of box")
      val fU = proxObjective(u, r, q, g)
      // certificate 1: beats the naive clip of the unconstrained prox
      val nrmR = math.sqrt(r.map(x => x * x).sum)
      val shrink = if (nrmR > g) (1.0 - g / nrmR) / q else 0.0
      val naive = Array.tabulate(k)(t =>
        math.min(math.max(r(t) * shrink, lo(t)), up(t)))
      assert(fU <= proxObjective(naive, r, q, g) + 1e-9, s"trial $trial naive")
      // certificate 2: beats random feasible points AND feasible
      // perturbations of itself
      for (_ <- 0 until 50) {
        val cand = Array.tabulate(k) { t =>
          val x = if (rnd.nextBoolean()) rnd.nextDouble() * (up(t) - lo(t)) + lo(t)
            else math.min(math.max(u(t) + rnd.nextGaussian() * 0.05, lo(t)), up(t))
          x
        }
        assert(fU <= proxObjective(cand, r, q, g) + 1e-9, s"trial $trial cand")
      }
    }
  }

  test("boxedGroupProx: closed-form regimes") {
    // non-binding bounds == unconstrained group soft-threshold
    val r = Array(2.0, -1.5, 0.7)
    val q = 1.3; val g = 0.9
    val wide = LinAlg.boxedGroupProx(r, q, g, Array.fill(3)(-1e9),
      Array.fill(3)(1e9), new Array[Double](3))
    val nrm = math.sqrt(r.map(x => x * x).sum)
    val shrink = (1.0 - g / nrm) / q
    for (t <- 0 until 3)
      assert(math.abs(wide(t) - r(t) * shrink) < 1e-10, s"coord $t")
    // g = 0: exact separable clipped ridge
    val sep = LinAlg.boxedGroupProx(r, q, 0.0, Array.fill(3)(-0.5),
      Array.fill(3)(0.5), new Array[Double](3))
    for (t <- 0 until 3)
      assert(sep(t) == math.min(math.max(r(t) / q, -0.5), 0.5))
    // zero test respects blocked directions: positive gradient with
    // up = 0 contributes nothing
    val z = LinAlg.boxedGroupProx(Array(5.0, 0.1), 1.0, 1.0,
      Array(0.0, -1.0), Array(0.0, 1.0), new Array[Double](2))
    assert(z(0) == 0.0 && z(1) == 0.0, "blocked-direction zero test")
  }

  private lazy val li = spark.read
    .parquet("/root/testdata/sf0.001/lineitem.parquet")

  test("mgaussian limits: containment, non-binding parity, closed form") {
    val feats = Seq("l_quantity", "l_discount")
    val resp = Seq("l_extendedprice", "l_tax")
    val base = SgdNetParams(family = "mgaussian", alpha = 0.7,
      lambda = Array(64.0, 4.0, 0.25), thresh = 1e-11, maxit = 100000)
    val free = SgdNet.fitMulti(li, feats, resp, base)
    // huge limits change nothing (bisection lands on the closed form)
    val wide = SgdNet.fitMulti(li, feats, resp, base.copy(
      lowerLimits = Array.fill(2)(-1e12), upperLimits = Array.fill(2)(1e12)))
    for (l <- 0 until 3; t <- 0 until 2; j <- 0 until 2)
      assert(math.abs(wide.beta(l)(t)(j) - free.beta(l)(t)(j)) <
        1e-8 * math.max(1.0, math.abs(free.beta(l)(t)(j))), s"wide $l $t $j")
    // tight limits: every coefficient lands inside the box
    val lim = SgdNet.fitMulti(li, feats, resp, base.copy(
      lowerLimits = Array(-5.0, -5.0), upperLimits = Array(5.0, 5.0)))
    for (l <- 0 until 3; t <- 0 until 2; j <- 0 until 2)
      assert(lim.beta(l)(t)(j) >= -5.0 - 1e-9 && lim.beta(l)(t)(j) <= 5.0 + 1e-9)
    // and binds somewhere (l_extendedprice's OLS slope >> 5)
    assert((0 until 3).exists(l => math.abs(lim.beta(l)(0)(0) - 5.0) < 1e-6 ||
      math.abs(lim.beta(l)(0)(1) - 5.0) < 1e-6), "expected a binding bound")
  }

  test("grouped multinomial limits: containment + non-binding parity") {
    val prm = SgdNetParams(family = "multinomial", alpha = 1.0,
      lambda = Array(0.01, 0.001), typeMultinomial = "grouped",
      thresh = 1e-8, maxit = 2000)
    val free = SgdNet.fit(li, Seq("l_quantity", "l_discount"), "l_returnflag",
      prm)
    val wide = SgdNet.fit(li, Seq("l_quantity", "l_discount"), "l_returnflag",
      prm.copy(lowerLimits = Array.fill(2)(-1e12),
        upperLimits = Array.fill(2)(1e12)))
    for (l <- 0 until 2; t <- 0 until free.nResponses; j <- 0 until 2)
      assert(math.abs(wide.beta(l)(t)(j) - free.beta(l)(t)(j)) < 1e-6,
        s"wide $l $t $j: ${wide.beta(l)(t)(j)} vs ${free.beta(l)(t)(j)}")
    val cap = 0.002
    val lim = SgdNet.fit(li, Seq("l_quantity", "l_discount"), "l_returnflag",
      prm.copy(lowerLimits = Array.fill(2)(-cap),
        upperLimits = Array.fill(2)(cap)))
    for (l <- 0 until 2; t <- 0 until lim.nResponses; j <- 0 until 2)
      assert(lim.beta(l)(t)(j) >= -cap - 1e-9 && lim.beta(l)(t)(j) <= cap + 1e-9)
  }

  test("mgaussian CV accepts limits (round-16 unreject) and stays boxed") {
    val fold = pmod(xxhash64(col("l_orderkey") * 10 + col("l_linenumber")),
      lit(3))
    val cv = CvSgdNet.fit(li, Seq("l_quantity"),
      Seq("l_extendedprice", "l_tax"),
      SgdNetParams(family = "mgaussian", alpha = 0.0,
        lambda = Array(16.0, 1.0), lowerLimits = Array(-20.0),
        upperLimits = Array(20.0), thresh = 1e-11, maxit = 100000),
      nfolds = 3, measure = "mse", foldCol = fold)
    for (l <- 0 until 2; t <- 0 until 2)
      assert(cv.best.fit.beta(l)(t)(0) >= -20.0 - 1e-9 &&
        cv.best.fit.beta(l)(t)(0) <= 20.0 + 1e-9)
    assert(cv.best.cvm.forall(v => v > 0 && !v.isNaN))
  }
}
