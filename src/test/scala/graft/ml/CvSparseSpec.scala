package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sparse-input cross-validation (round 15 — the cv.glmnet-with-
  * dgCMatrix surface): the sparse CV must reproduce the DENSE CV on
  * the same logical data under a shared fold expression, for every
  * routed family and measure — both the one-pass gaussian moments and
  * the shared sparse IRLS converge to the same fold models as their
  * dense twins. */
class CvSparseSpec extends SparkSpec {
  import spark.implicits._

  // sparse rows over 4 features + a stable row id for the shared fold
  private lazy val data = {
    val rnd = new scala.util.Random(17)
    (1 to 500).map { i =>
      val dense = Array.tabulate(4)(_ =>
        if (rnd.nextDouble() < 0.4) rnd.nextGaussian() else 0.0)
      val yg = 1.0 + dense(0) * 0.8 - dense(2) * 0.5 + rnd.nextGaussian() * 0.2
      val eta = -0.2 + dense(0) * 1.1 - dense(1) * 0.7
      val yb = if (rnd.nextDouble() < 1.0 / (1.0 + math.exp(-eta))) 1.0 else 0.0
      val mu = math.exp(0.4 + dense(0) * 0.3)
      val yp = math.max(0L, math.round(mu + rnd.nextGaussian() * math.sqrt(mu))).toDouble
      val idx = dense.indices.filter(dense(_) != 0.0).toArray
      (i.toLong, idx, idx.map(dense), dense.toSeq, yg, yb, yp)
    }
  }
  private lazy val sp = data.map(r => (r._1, r._2, r._3, r._5, r._6, r._7))
    .toDF("rid", "idx", "vals", "yg", "yb", "yp")
  private lazy val dn = data.map(r =>
      (r._1, r._4(0), r._4(1), r._4(2), r._4(3), r._5, r._6, r._7))
    .toDF("rid", "V0", "V1", "V2", "V3", "yg", "yb", "yp")
  private val feats = (0 until 4).map(j => s"V$j")
  private def fold = pmod(xxhash64(col("rid")), lit(3))

  private def assertClose(a: CvSgdNet.CvPath, b: CvSgdNet.CvPath,
                          tol: Double, tag: String): Unit = {
    assert(a.lambda.sameElements(b.lambda), s"$tag lambda grid")
    for (l <- a.lambda.indices) {
      assert(math.abs(a.cvm(l) - b.cvm(l)) <
        tol * math.max(1.0, math.abs(b.cvm(l))), s"$tag cvm($l): ${a.cvm(l)} vs ${b.cvm(l)}")
      assert(math.abs(a.cvsd(l) - b.cvsd(l)) <
        tol * math.max(1.0, math.abs(b.cvsd(l))), s"$tag cvsd($l)")
    }
  }

  test("sparse gaussian CV == dense CV (mse, mae, alpha grid)") {
    val params = SgdNetParams(alpha = 0.5, lambda = Array(0.5, 0.1, 0.02),
      thresh = 1e-11, maxit = 100000)
    for (measure <- Seq("mse", "mae")) {
      val s = CvSgdNet.fitSparse(sp, "idx", "vals", 4, "yg", params,
        nfolds = 3, measure = measure, foldCol = fold)
      val d = CvSgdNet.fit(dn, feats, Seq("yg"), params,
        nfolds = 3, measure = measure, foldCol = fold)
      assertClose(s.best, d.best, 1e-8, s"gauss/$measure")
    }
    // alpha grid: one sparse-moment pass serves every alpha
    val grid = CvSgdNet.fitSparse(sp, "idx", "vals", 4, "yg", params,
      nfolds = 3, measure = "mse", foldCol = fold, alphas = Seq(0.0, 1.0))
    assert(grid.paths.size == 2)
    for ((a, i) <- Seq(0.0, 1.0).zipWithIndex) {
      val d = CvSgdNet.fit(dn, feats, Seq("yg"), params.copy(alpha = a),
        nfolds = 3, measure = "mse", foldCol = fold)
      assertClose(grid.paths(i), d.best, 1e-8, s"gauss/alpha=$a")
    }
  }

  test("sparse binomial CV == dense shared CV (deviance, class, auc)") {
    val params = SgdNetParams(family = "binomial",
      lambda = Array(0.05, 0.01, 0.002), thresh = 1e-9, maxit = 100000)
    for (measure <- Seq("deviance", "class", "auc")) {
      val s = CvSgdNet.fitSparse(sp, "idx", "vals", 4, "yb", params,
        nfolds = 3, measure = measure, foldCol = fold)
      val d = CvSgdNet.fit(dn, feats, Seq("yb"), params,
        nfolds = 3, measure = measure, foldCol = fold)
      assertClose(s.best, d.best, 1e-6, s"binom/$measure")
    }
  }

  test("sparse poisson CV == dense shared CV; contracts") {
    val params = SgdNetParams(family = "poisson",
      lambda = Array(0.1, 0.02), thresh = 1e-9, maxit = 100000)
    val s = CvSgdNet.fitSparse(sp, "idx", "vals", 4, "yp", params,
      nfolds = 3, measure = "deviance", foldCol = fold)
    val d = CvSgdNet.fit(dn, feats, Seq("yp"), params,
      nfolds = 3, measure = "deviance", foldCol = fold)
    assertClose(s.best, d.best, 1e-6, "poisson/deviance")
    // full-data model rides the passes: matches a standalone fitSparse
    val standalone = SgdNet.fitSparse(sp, "idx", "vals", 4, "yp", params)
    for (l <- 0 until 2; j <- 0 until 4)
      assert(math.abs(s.best.fit.beta(l)(0)(j) - standalone.beta(l)(0)(j)) < 1e-6,
        s"full-fit b($l)($j)")
    // multinomial rejects with a pointer to the dense CV
    intercept[IllegalArgumentException] {
      CvSgdNet.fitSparse(sp, "idx", "vals", 4, "yb",
        SgdNetParams(family = "multinomial"), nfolds = 2)
    }
    // auc off-binomial rejects
    intercept[IllegalArgumentException] {
      CvSgdNet.fitSparse(sp, "idx", "vals", 4, "yp",
        SgdNetParams(family = "poisson"), nfolds = 2, measure = "auc")
    }
    ()
  }
}
