package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cross-validation WITH a linear-predictor offset (round 16 — the
  * cv.glmnet `offset`/`newoffset` surface over the fitWithOffset
  * families): gaussian must equal the plain CV on y − offset exactly;
  * the shared poisson offset chassis must reproduce per-fold
  * standalone offset fits and collapse to the plain poisson CV at
  * offset ≡ 0. */
class OffsetCvSpec extends SparkSpec {
  import spark.implicits._

  private lazy val data = {
    val rnd = new scala.util.Random(29)
    (1 to 600).map { i =>
      val x1 = rnd.nextGaussian(); val x2 = rnd.nextGaussian()
      val off = math.log(1.0 + rnd.nextInt(5)) // ln exposure
      val mu = math.exp(0.3 + 0.4 * x1 + off)
      val yp = math.max(0L, math.round(mu + rnd.nextGaussian() * math.sqrt(mu))).toDouble
      val yg = 1.0 + 0.8 * x1 - 0.5 * x2 + off + rnd.nextGaussian() * 0.3
      val pb = 1.0 / (1.0 + math.exp(-(-0.4 + 0.9 * x1 + off * 0.5)))
      val yb = if (rnd.nextDouble() < pb) 1.0 else 0.0
      (i.toLong, x1, x2, off, yg, yp, yb, (i % 3 + 1).toDouble)
    }.toDF("rid", "x1", "x2", "off", "yg", "yp", "yb", "w")
  }
  private def fold = pmod(xxhash64(col("rid")), lit(3))

  private def assertClose(a: CvSgdNet.CvPath, b: CvSgdNet.CvPath,
                          tol: Double, tag: String): Unit = {
    assert(a.lambda.sameElements(b.lambda), s"$tag lambda grid")
    for (l <- a.lambda.indices) {
      assert(math.abs(a.cvm(l) - b.cvm(l)) <
        tol * math.max(1.0, math.abs(b.cvm(l))), s"$tag cvm($l)")
      assert(math.abs(a.cvsd(l) - b.cvsd(l)) <
        tol * math.max(1.0, math.abs(b.cvsd(l))), s"$tag cvsd($l)")
    }
  }

  test("gaussian offset CV == plain CV on y − offset (and weighted)") {
    val params = SgdNetParams(alpha = 0.5, lambda = Array(0.4, 0.05),
      thresh = 1e-11, maxit = 100000)
    val adj = data.withColumn("yadj", col("yg") - col("off"))
    for (measure <- Seq("mse", "mae")) {
      val o = CvSgdNet.fitWithOffset(data, Seq("x1", "x2"), "yg", "off",
        params, nfolds = 3, measure = measure, foldCol = fold)
      val d = CvSgdNet.fit(adj, Seq("x1", "x2"), Seq("yadj"), params,
        nfolds = 3, measure = measure, foldCol = fold)
      assertClose(o.best, d.best, 1e-12, s"gauss/$measure")
    }
    val ow = CvSgdNet.fitWithOffset(data, Seq("x1", "x2"), "yg", "off",
      params, nfolds = 3, measure = "mse", foldCol = fold, weightCol = "w")
    val dw = CvSgdNet.fitWeighted(adj, Seq("x1", "x2"), "yadj", "w", params,
      nfolds = 3, measure = "mse", foldCol = fold)
    assertClose(ow.best, dw.best, 1e-12, "gauss/weighted")
  }

  test("poisson offset CV == per-fold standalone offset refits") {
    val lambdas = Array(0.3, 0.05)
    val params = SgdNetParams(family = "poisson", alpha = 1.0,
      lambda = lambdas, thresh = 1e-9, maxit = 100000)
    val cv = CvSgdNet.fitWithOffset(data, Seq("x1", "x2"), "yp", "off",
      params, nfolds = 3, measure = "deviance", foldCol = fold)
    // manual generic route: fold f's model from a standalone
    // fitWithOffset on the train rows, held-out deviance by hand
    val withF = data.withColumn("__f", fold)
    val foldScores = Array.ofDim[Double](3, lambdas.length)
    for (f <- 0 until 3) {
      val m = SgdNet.fitWithOffset(withF.filter(col("__f") =!= f),
        Seq("x1", "x2"), "yp", "off", params)
      val test = withF.filter(col("__f") === f)
        .select("x1", "x2", "off", "yp").collect()
      for (l <- lambdas.indices) {
        var s = 0.0
        test.foreach { r =>
          val eta = m.a0(l)(0) + m.beta(l)(0)(0) * r.getDouble(0) +
            m.beta(l)(0)(1) * r.getDouble(1) + r.getDouble(2)
          val mu = math.exp(eta)
          val y = r.getDouble(3)
          s += 2.0 * ((if (y > 0) y * math.log(y / mu) else 0.0) - (y - mu))
        }
        foldScores(f)(l) = s / test.length
      }
    }
    for (l <- lambdas.indices) {
      val cvm = (0 until 3).map(foldScores(_)(l)).sum / 3.0
      assert(math.abs(cv.best.cvm(l) - cvm) < 1e-6 * math.max(1.0, cvm),
        s"cvm($l): ${cv.best.cvm(l)} vs $cvm")
    }
    // full model rides the passes == standalone full-data offset fit
    val full = SgdNet.fitWithOffset(data, Seq("x1", "x2"), "yp", "off", params)
    for (l <- lambdas.indices; j <- 0 until 2)
      assert(math.abs(cv.best.fit.beta(l)(0)(j) - full.beta(l)(0)(j)) < 1e-6)
  }

  test("binomial offset fit == spark.ml GLR; constant offset == shift") {
    // unregularized offset logistic vs spark.ml GeneralizedLinearRegression
    // (binomial family + offsetCol) — same MLE, independent solvers
    val m = SgdNet.fitWithOffset(data, Seq("x1", "x2"), "yb", "off",
      SgdNetParams(family = "binomial", lambda = Array(0.0),
        standardize = false, thresh = 1e-10, maxit = 100000))
    val assembled = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(Array("x1", "x2")).setOutputCol("fv").transform(data)
    val glr = new org.apache.spark.ml.regression.GeneralizedLinearRegression()
      .setFamily("binomial").setLink("logit").setOffsetCol("off")
      .setFeaturesCol("fv").setLabelCol("yb").setRegParam(0.0)
      .setTol(1e-10).setMaxIter(200)
      .fit(assembled)
    assert(math.abs(m.a0(0)(0) - glr.intercept) < 1e-4,
      s"a0 ${m.a0(0)(0)} vs ${glr.intercept}")
    for (j <- 0 until 2)
      assert(math.abs(m.beta(0)(0)(j) - glr.coefficients(j)) < 1e-4,
        s"b$j ${m.beta(0)(0)(j)} vs ${glr.coefficients(j)}")
    // a CONSTANT offset c shifts the intercept by −c, betas unchanged
    val cst = data.withColumn("c", lit(0.7))
    val mc = SgdNet.fitWithOffset(cst, Seq("x1", "x2"), "yb", "c",
      SgdNetParams(family = "binomial", lambda = Array(0.01),
        thresh = 1e-10, maxit = 100000))
    val m0 = SgdNet.fit(data, Seq("x1", "x2"), "yb",
      SgdNetParams(family = "binomial", lambda = Array(0.01),
        thresh = 1e-10, maxit = 100000))
    assert(math.abs((mc.a0(0)(0) + 0.7) - m0.a0(0)(0)) < 1e-7)
    for (j <- 0 until 2)
      assert(math.abs(mc.beta(0)(0)(j) - m0.beta(0)(0)(j)) < 1e-7)
  }

  test("binomial offset CV == per-fold standalone refits; zero-offset collapse") {
    val lambdas = Array(0.05, 0.01)
    val params = SgdNetParams(family = "binomial", alpha = 1.0,
      lambda = lambdas, thresh = 1e-9, maxit = 100000)
    val cv = CvSgdNet.fitWithOffset(data, Seq("x1", "x2"), "yb", "off",
      params, nfolds = 3, measure = "deviance", foldCol = fold)
    val withF = data.withColumn("__f", fold)
    for (l <- lambdas.indices) {
      var cvm = 0.0
      for (f <- 0 until 3) {
        val m = SgdNet.fitWithOffset(withF.filter(col("__f") =!= f),
          Seq("x1", "x2"), "yb", "off", params)
        val test = withF.filter(col("__f") === f)
          .select("x1", "x2", "off", "yb").collect()
        var s = 0.0
        test.foreach { r =>
          val eta = m.a0(l)(0) + m.beta(l)(0)(0) * r.getDouble(0) +
            m.beta(l)(0)(1) * r.getDouble(1) + r.getDouble(2)
          val mu0 = 1.0 / (1.0 + math.exp(-eta))
          val mu = math.min(math.max(mu0, 1e-5), 1.0 - 1e-5)
          val y = r.getDouble(3)
          s += -2.0 * (y * math.log(mu) + (1 - y) * math.log(1 - mu))
        }
        cvm += s / test.length
      }
      cvm /= 3.0
      assert(math.abs(cv.best.cvm(l) - cvm) < 1e-5 * math.max(1.0, cvm),
        s"cvm($l): ${cv.best.cvm(l)} vs $cvm")
    }
    // zero offset collapses to the plain shared binomial CV (incl. auc)
    val z = data.withColumn("z0", lit(0.0))
    for (measure <- Seq("deviance", "auc")) {
      val o = CvSgdNet.fitWithOffset(z, Seq("x1", "x2"), "yb", "z0", params,
        nfolds = 3, measure = measure, foldCol = fold)
      val d = CvSgdNet.fit(data, Seq("x1", "x2"), Seq("yb"), params,
        nfolds = 3, measure = measure, foldCol = fold)
      assertClose(o.best, d.best, 1e-7, s"binom/zero-offset/$measure")
    }
  }

  test("zero offset == plain poisson CV; weights == duplication; contracts") {
    val z = data.withColumn("z0", lit(0.0))
    val params = SgdNetParams(family = "poisson", alpha = 1.0,
      lambda = Array(0.3, 0.05), thresh = 1e-9, maxit = 100000)
    val o = CvSgdNet.fitWithOffset(z, Seq("x1", "x2"), "yp", "z0", params,
      nfolds = 3, measure = "deviance", foldCol = fold)
    val d = CvSgdNet.fit(data, Seq("x1", "x2"), Seq("yp"), params,
      nfolds = 3, measure = "deviance", foldCol = fold)
    assertClose(o.best, d.best, 1e-8, "poisson/zero-offset")
    // integer weights == row duplication (same rid → same fold)
    val exploded = data.withColumn("__rep",
      explode(sequence(lit(1), col("w").cast("int"))))
    val ow = CvSgdNet.fitWithOffset(data, Seq("x1", "x2"), "yp", "off",
      params, nfolds = 3, measure = "deviance", foldCol = fold,
      weightCol = "w")
    val od = CvSgdNet.fitWithOffset(exploded, Seq("x1", "x2"), "yp", "off",
      params, nfolds = 3, measure = "deviance", foldCol = fold)
    assertClose(ow.best, od.best, 1e-8, "poisson/weights-duplication")
    intercept[IllegalArgumentException] {
      CvSgdNet.fitWithOffset(data, Seq("x1"), "yp", "off",
        SgdNetParams(family = "multinomial"), nfolds = 3)
    }
    intercept[IllegalArgumentException] {
      CvSgdNet.fitWithOffset(data, Seq("x1"), "yp", "off",
        SgdNetParams(family = "poisson"), nfolds = 3, measure = "auc")
    }
    ()
  }

  test("sparse offset fit == dense offset fit (binomial, poisson, gaussian)") {
    val sp3 = data.withColumn("idx", array(lit(0), lit(1)))
      .withColumn("vals", array(col("x1"), col("x2")))
    val pp = SgdNetParams(family = "poisson", alpha = 1.0,
      lambda = Array(0.3, 0.05), thresh = 1e-9, maxit = 100000)
    val dp = SgdNet.fitWithOffset(data, Seq("x1", "x2"), "yp", "off", pp)
    val spp = SgdNet.fitSparseWithOffset(sp3, "idx", "vals", 2, "yp", "off", pp)
    for (l <- 0 until 2; j <- 0 until 2) {
      assert(math.abs(spp.beta(l)(0)(j) - dp.beta(l)(0)(j)) < 1e-7,
        s"poisson b($l)($j)")
      assert(math.abs(spp.a0(l)(0) - dp.a0(l)(0)) < 1e-7)
    }
    assert(math.abs(spp.nulldev - dp.nulldev) < 1e-6 * dp.nulldev)
    val pb = SgdNetParams(family = "binomial", alpha = 1.0,
      lambda = Array(0.05, 0.01), thresh = 1e-9, maxit = 100000)
    val db = SgdNet.fitWithOffset(data, Seq("x1", "x2"), "yb", "off", pb)
    val spb = SgdNet.fitSparseWithOffset(sp3, "idx", "vals", 2, "yb", "off", pb)
    for (l <- 0 until 2; j <- 0 until 2)
      assert(math.abs(spb.beta(l)(0)(j) - db.beta(l)(0)(j)) < 1e-7,
        s"binomial b($l)($j)")
    // gaussian delegation + data-derived path (offset-corrected
    // lambda_max must agree between the routes too)
    val pg = SgdNetParams(alpha = 1.0, nlambda = 5, thresh = 1e-10,
      maxit = 100000)
    val dg = SgdNet.fitWithOffset(data, Seq("x1", "x2"), "yg", "off", pg)
    val spg = SgdNet.fitSparseWithOffset(sp3, "idx", "vals", 2, "yg", "off", pg)
    assert(spg.lambda.zip(dg.lambda).forall { case (a, b) =>
      math.abs(a - b) < 1e-9 * b })
    for (l <- 0 until 5; j <- 0 until 2)
      assert(math.abs(spg.beta(l)(0)(j) - dg.beta(l)(0)(j)) < 1e-8)
    // weighted sparse offset == weighted dense offset (poisson)
    val dpw = SgdNet.fitWithOffsetWeighted(data, Seq("x1", "x2"), "yp",
      "off", "w", pp)
    val spw = SgdNet.fitSparseWithOffset(sp3, "idx", "vals", 2, "yp", "off",
      pp, weightCol = "w")
    for (l <- 0 until 2; j <- 0 until 2)
      assert(math.abs(spw.beta(l)(0)(j) - dpw.beta(l)(0)(j)) < 1e-7)
    // data-derived path for the GLM families agrees with the dense route
    val ppPath = SgdNetParams(family = "poisson", alpha = 1.0, nlambda = 4,
      thresh = 1e-9, maxit = 100000)
    val dpp = SgdNet.fitWithOffset(data, Seq("x1", "x2"), "yp", "off", ppPath)
    val spp2 = SgdNet.fitSparseWithOffset(sp3, "idx", "vals", 2, "yp", "off",
      ppPath)
    assert(spp2.lambda.zip(dpp.lambda).forall { case (a, b) =>
      math.abs(a - b) < 1e-9 * b }, "poisson offset lambda path")
    intercept[IllegalArgumentException] {
      SgdNet.fitSparseWithOffset(sp3, "idx", "vals", 2, "yp", "off",
        SgdNetParams(family = "multinomial"))
    }
    ()
  }
}
