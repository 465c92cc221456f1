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

  // ---------------------------------------------------------------------
  // multinomial / mgaussian MATRIX offset (round 16)

  /** 3-class data whose generating model includes per-class varying
    * offsets (oa/ob/oc), plus integer-ish weights. */
  private lazy val mdata = {
    val rnd = new scala.util.Random(31)
    (1 to 600).map { i =>
      val x1 = rnd.nextGaussian(); val x2 = rnd.nextGaussian()
      val oA = 0.3 * x1; val oB = -0.2 * x2; val oC = 0.1 * (x1 + x2)
      val eta = Array(0.5 + x1 + oA, -0.3 - 0.5 * x2 + oB, 0.2 * x1 + oC)
      val mx = eta.max
      val ps = eta.map(e => math.exp(e - mx))
      val u = rnd.nextDouble() * ps.sum
      val cls = if (u < ps(0)) "a" else if (u < ps(0) + ps(1)) "b" else "c"
      (i.toLong, x1, x2, oA, oB, oC, cls, (i % 3 + 1).toDouble)
    }.toDF("rid", "x1", "x2", "oa", "ob", "oc", "cls", "w")
  }

  test("multinomial constant offset == plain fit with intercepts shifted by -c") {
    val params = SgdNetParams(family = "multinomial", alpha = 1.0,
      lambda = Array(0.05, 0.005), thresh = 1e-9, maxit = 20000)
    val c = Array(0.4, -0.2, 0.1)
    val dd = mdata.withColumn("c1", lit(c(0)))
      .withColumn("c2", lit(c(1))).withColumn("c3", lit(c(2)))
    val off = SgdNet.fitMultinomialWithOffset(dd, Seq("x1", "x2"), "cls",
      Seq("c1", "c2", "c3"), params)
    val plain = SgdNet.fit(mdata, Seq("x1", "x2"), "cls", params)
    for (l <- 0 until 2; t <- 0 until 3) {
      assert(math.abs(off.a0(l)(t) - (plain.a0(l)(t) - c(t))) < 1e-7,
        s"a0($l)($t)")
      for (j <- 0 until 2)
        assert(math.abs(off.beta(l)(t)(j) - plain.beta(l)(t)(j)) < 1e-7,
          s"beta($l)($t)($j)")
    }
    // constant offsets shift the null model the same way -> same nulldev
    assert(math.abs(off.nulldev - plain.nulldev) < 1e-6 * plain.nulldev)
  }

  test("multinomial zero offset == plain fit (incl. data-derived path, grouped)") {
    val z = mdata.withColumn("z", lit(0.0))
    for (tm <- Seq("ungrouped", "grouped")) {
      val params = SgdNetParams(family = "multinomial", alpha = 1.0,
        nlambda = 5, thresh = 1e-9, maxit = 20000, typeMultinomial = tm)
      val off = SgdNet.fitMultinomialWithOffset(z, Seq("x1", "x2"), "cls",
        Seq("z", "z", "z"), params)
      val plain = SgdNet.fit(mdata, Seq("x1", "x2"), "cls", params)
      assert(off.lambda.zip(plain.lambda).forall { case (a, b) =>
        math.abs(a - b) < 1e-10 * b }, s"$tm lambda path")
      for (l <- 0 until 5; t <- 0 until 3) {
        assert(math.abs(off.a0(l)(t) - plain.a0(l)(t)) < 1e-8, s"$tm a0")
        for (j <- 0 until 2)
          assert(math.abs(off.beta(l)(t)(j) - plain.beta(l)(t)(j)) < 1e-8,
            s"$tm beta")
      }
    }
  }

  test("multinomial varying offset: integer weights == row duplication") {
    val params = SgdNetParams(family = "multinomial", alpha = 0.5,
      lambda = Array(0.02), thresh = 1e-10, maxit = 30000)
    val wfit = SgdNet.fitMultinomialWithOffset(mdata, Seq("x1", "x2"), "cls",
      Seq("oa", "ob", "oc"), params, weightCol = "w")
    val dup = mdata.withColumn("k",
      explode(sequence(lit(1), col("w").cast("int"))))
    val dfit = SgdNet.fitMultinomialWithOffset(dup, Seq("x1", "x2"), "cls",
      Seq("oa", "ob", "oc"), params)
    for (t <- 0 until 3) {
      assert(math.abs(wfit.a0(0)(t) - dfit.a0(0)(t)) < 1e-8, s"a0($t)")
      for (j <- 0 until 2)
        assert(math.abs(wfit.beta(0)(t)(j) - dfit.beta(0)(t)(j)) < 1e-8,
          s"beta($t)($j)")
    }
  }

  test("multinomial varying offset satisfies KKT at the solution") {
    val lam = 0.02
    val params = SgdNetParams(family = "multinomial", alpha = 1.0,
      lambda = Array(lam), thresh = 1e-11, maxit = 50000)
    val m = SgdNet.fitMultinomialWithOffset(mdata, Seq("x1", "x2"), "cls",
      Seq("oa", "ob", "oc"), params)
    val rows = mdata.select("x1", "x2", "oa", "ob", "oc", "cls").collect()
    val n = rows.length.toDouble
    val xs = Array(rows.map(_.getDouble(0)), rows.map(_.getDouble(1)))
    val mean = xs.map(_.sum / n)
    val sd = xs.zip(mean).map { case (v, mu) =>
      math.sqrt(v.map(x => (x - mu) * (x - mu)).sum / n) }
    val cls = m.classLabels
    // unpenalized-loss gradient w.r.t. the STANDARDIZED coefficients
    val grad = Array.ofDim[Double](3, 2)
    rows.foreach { r =>
      val eta = Array.tabulate(3) { t =>
        m.a0(0)(t) + r.getDouble(2 + t) +
          m.beta(0)(t)(0) * r.getDouble(0) + m.beta(0)(t)(1) * r.getDouble(1)
      }
      val mx = eta.max
      val ps = eta.map(e => math.exp(e - mx)); val z = ps.sum
      val y = cls.indexOf(r.getString(5))
      for (t <- 0 until 3; j <- 0 until 2) {
        val xsj = (r.getDouble(j) - mean(j)) / sd(j)
        grad(t)(j) += (ps(t) / z - (if (t == y) 1.0 else 0.0)) * xsj / n
      }
    }
    for (t <- 0 until 3; j <- 0 until 2) {
      val bstd = m.beta(0)(t)(j) * sd(j)
      if (bstd == 0.0)
        assert(math.abs(grad(t)(j)) <= lam + 1e-5, s"KKT zero ($t,$j)")
      else
        assert(math.abs(grad(t)(j) + lam * math.signum(bstd)) < 1e-5,
          s"KKT active ($t,$j): ${grad(t)(j)}")
    }
  }

  test("mgaussian offset == fitMulti on the adjusted responses (incl. weighted)") {
    val rnd = new scala.util.Random(37)
    val d = data.withColumn("y2", col("x2") * 2.0 + col("off") * 0.5 + lit(rnd.nextGaussian() * 0.1))
      .withColumn("o2", lit(0.3))
    val params = SgdNetParams(family = "mgaussian", alpha = 0.5,
      lambda = Array(0.1, 0.01), thresh = 1e-11, maxit = 100000)
    val adj = d.withColumn("yga", col("yg") - col("off"))
      .withColumn("y2a", col("y2") - col("o2"))
    val off = SgdNet.fitMultiWithOffset(d, Seq("x1", "x2"), Seq("yg", "y2"),
      Seq("off", "o2"), params)
    val plain = SgdNet.fitMulti(adj, Seq("x1", "x2"), Seq("yga", "y2a"), params)
    for (l <- 0 until 2; t <- 0 until 2; j <- 0 until 2)
      assert(math.abs(off.beta(l)(t)(j) - plain.beta(l)(t)(j)) <=
        1e-12 * math.max(1.0, math.abs(plain.beta(l)(t)(j))), s"beta($l)($t)($j)")
    for (l <- 0 until 2; t <- 0 until 2)
      assert(math.abs(off.a0(l)(t) - plain.a0(l)(t)) <=
        1e-12 * math.max(1.0, math.abs(plain.a0(l)(t))), s"a0($l)($t)")
    val offW = SgdNet.fitMultiWithOffset(d, Seq("x1", "x2"), Seq("yg", "y2"),
      Seq("off", "o2"), params, weightCol = "w")
    val plainW = SgdNet.fitWeightedMulti(adj, Seq("x1", "x2"),
      Seq("yga", "y2a"), "w", params)
    for (l <- 0 until 2; t <- 0 until 2; j <- 0 until 2)
      assert(math.abs(offW.beta(l)(t)(j) - plainW.beta(l)(t)(j)) <=
        1e-12 * math.max(1.0, math.abs(plainW.beta(l)(t)(j))), s"w beta($l)($t)($j)")
    intercept[IllegalArgumentException] {
      SgdNet.fitWithOffset(d, Seq("x1"), "yg", "off",
        SgdNetParams(family = "multinomial"))
    }
    intercept[IllegalArgumentException] {
      SgdNet.fitMultinomialWithOffset(mdata, Seq("x1"), "cls", Seq("oa", "ob"),
        SgdNetParams(family = "multinomial"))
    }
    ()
  }

  test("sparse offset CV == dense offset CV (poisson, binomial; weighted; gaussian)") {
    val sp = data.withColumn("idx", array(lit(0), lit(1)))
      .withColumn("vals", array(col("x1"), col("x2")))
    // poisson deviance on a fixed grid
    val pp = SgdNetParams(family = "poisson", alpha = 1.0,
      lambda = Array(0.3, 0.05), thresh = 1e-9, maxit = 100000)
    val dp = CvSgdNet.fitWithOffset(data, Seq("x1", "x2"), "yp", "off", pp,
      nfolds = 3, measure = "deviance", foldCol = fold)
    val spC = CvSgdNet.fitSparseWithOffset(sp, "idx", "vals", 2, "yp", "off",
      pp, nfolds = 3, measure = "deviance", foldCol = fold)
    assertClose(spC.best, dp.best, 1e-7, "sparse-offset/poisson")
    for (l <- 0 until 2; j <- 0 until 2)
      assert(math.abs(spC.best.fit.beta(l)(0)(j) - dp.best.fit.beta(l)(0)(j)) < 1e-7,
        s"poisson full beta($l)($j)")
    // binomial weighted auc on a fixed grid
    val pb = SgdNetParams(family = "binomial", alpha = 1.0,
      lambda = Array(0.05, 0.01), thresh = 1e-9, maxit = 100000)
    val db = CvSgdNet.fitWithOffset(data, Seq("x1", "x2"), "yb", "off", pb,
      nfolds = 3, measure = "auc", foldCol = fold, weightCol = "w")
    val sb = CvSgdNet.fitSparseWithOffset(sp, "idx", "vals", 2, "yb", "off",
      pb, nfolds = 3, measure = "auc", foldCol = fold, weightCol = "w")
    assertClose(sb.best, db.best, 1e-6, "sparse-offset/binomial-wauc")
    // data-derived lambda path agrees with the dense offset chassis
    val pbPath = SgdNetParams(family = "binomial", alpha = 1.0, nlambda = 4,
      thresh = 1e-9, maxit = 100000)
    val dbp = CvSgdNet.fitWithOffset(data, Seq("x1", "x2"), "yb", "off",
      pbPath, nfolds = 3, measure = "deviance", foldCol = fold)
    val sbp = CvSgdNet.fitSparseWithOffset(sp, "idx", "vals", 2, "yb", "off",
      pbPath, nfolds = 3, measure = "deviance", foldCol = fold)
    assert(sbp.best.lambda.zip(dbp.best.lambda).forall { case (a, b) =>
      math.abs(a - b) < 1e-9 * b }, "binomial offset lambda path")
    for (l <- sbp.best.lambda.indices)
      assert(math.abs(sbp.best.cvm(l) - dbp.best.cvm(l)) <
        1e-6 * math.max(1.0, dbp.best.cvm(l)), s"path cvm($l)")
    // gaussian delegates to the plain sparse CV on y − offset
    val pg = SgdNetParams(alpha = 0.5, lambda = Array(0.4, 0.05),
      thresh = 1e-11, maxit = 100000)
    val adj = sp.withColumn("yadj", col("yg") - col("off"))
    val sg = CvSgdNet.fitSparseWithOffset(sp, "idx", "vals", 2, "yg", "off",
      pg, nfolds = 3, measure = "mse", foldCol = fold)
    val sgAdj = CvSgdNet.fitSparse(adj, "idx", "vals", 2, "yadj", pg,
      nfolds = 3, measure = "mse", foldCol = fold)
    assertClose(sg.best, sgAdj.best, 1e-12, "sparse-offset/gaussian")
    intercept[IllegalArgumentException] {
      CvSgdNet.fitSparseWithOffset(sp, "idx", "vals", 2, "cls3", "off",
        SgdNetParams(family = "multinomial"), foldCol = fold)
    }
    ()
  }

  test("sparse multinomial offset == dense; mgaussian offset CV delegates") {
    val sp = mdata.withColumn("sidx", array(lit(0), lit(1)))
      .withColumn("svals", array(col("x1"), col("x2")))
    val params = SgdNetParams(family = "multinomial", alpha = 1.0,
      nlambda = 4, thresh = 1e-8, maxit = 10000)
    val d = SgdNet.fitMultinomialWithOffset(mdata, Seq("x1", "x2"), "cls",
      Seq("oa", "ob", "oc"), params)
    val s = SgdNet.fitSparseMultinomialWithOffset(sp, "sidx", "svals", 2,
      "cls", Seq("oa", "ob", "oc"), params)
    assert(s.lambda.zip(d.lambda).forall { case (a, b) =>
      math.abs(a - b) < 1e-9 * b }, "sparse offset lambda path")
    for (l <- 0 until 4; t <- 0 until 3) {
      assert(math.abs(s.a0(l)(t) - d.a0(l)(t)) < 1e-6, s"a0($l)($t)")
      for (j <- 0 until 2)
        assert(math.abs(s.beta(l)(t)(j) - d.beta(l)(t)(j)) < 1e-6,
          s"beta($l)($t)($j)")
    }
    // weighted sparse == weighted dense
    val pw = params.copy(lambda = Array(0.02), nlambda = 100)
    val dw = SgdNet.fitMultinomialWithOffset(mdata, Seq("x1", "x2"), "cls",
      Seq("oa", "ob", "oc"), pw, weightCol = "w")
    val sw = SgdNet.fitSparseMultinomialWithOffset(sp, "sidx", "svals", 2,
      "cls", Seq("oa", "ob", "oc"), pw, weightCol = "w")
    for (t <- 0 until 3; j <- 0 until 2)
      assert(math.abs(sw.beta(0)(t)(j) - dw.beta(0)(t)(j)) < 1e-6,
        s"w beta($t)($j)")
    // mgaussian offset CV == plain CV on the adjusted responses
    val d2 = data.withColumn("y2", col("x2") * 2.0 + lit(0.3) * 0.5)
      .withColumn("o2", lit(0.3))
    val pg = SgdNetParams(family = "mgaussian", alpha = 0.5,
      lambda = Array(0.1, 0.01), thresh = 1e-11, maxit = 100000)
    val cvOff = CvSgdNet.fitMultiWithOffset(d2, Seq("x1", "x2"),
      Seq("yg", "y2"), Seq("off", "o2"), pg, nfolds = 3, foldCol = fold)
    val adj = d2.withColumn("yg", col("yg") - col("off"))
      .withColumn("y2", col("y2") - col("o2"))
    val cvAdj = CvSgdNet.fit(adj, Seq("x1", "x2"), Seq("yg", "y2"), pg,
      nfolds = 3, foldCol = fold)
    assertClose(cvOff.best, cvAdj.best, 1e-12, "mgauss-offset-cv")
    // weighted delegation
    val cvOffW = CvSgdNet.fitMultiWithOffset(d2, Seq("x1", "x2"),
      Seq("yg", "y2"), Seq("off", "o2"), pg, nfolds = 3, foldCol = fold,
      weightCol = "w")
    val cvAdjW = CvSgdNet.fitWeightedMulti(adj, Seq("x1", "x2"),
      Seq("yg", "y2"), "w", pg, nfolds = 3, foldCol = fold)
    assertClose(cvOffW.best, cvAdjW.best, 1e-12, "mgauss-offset-cv-w")
    intercept[IllegalArgumentException] {
      CvSgdNet.fitMultiWithOffset(d2, Seq("x1"), Seq("yg", "y2"),
        Seq("off"), pg, foldCol = fold)
    }
    ()
  }

  test("multinomial offset CV: zero==plain, constant==plain scores, fold parity") {
    val params = SgdNetParams(family = "multinomial", alpha = 1.0,
      lambda = Array(0.05, 0.01), thresh = 1e-8, maxit = 20000)
    // zero offsets collapse to the plain shared multinomial CV
    val z = mdata.withColumn("z0", lit(0.0))
    for (measure <- Seq("deviance", "class")) {
      val o = CvSgdNet.fitMultinomialWithOffset(z, Seq("x1", "x2"), "cls",
        Seq("z0", "z0", "z0"), params, nfolds = 3, measure = measure,
        foldCol = fold)
      val d = CvSgdNet.fit(mdata, Seq("x1", "x2"), Seq("cls"), params,
        nfolds = 3, measure = measure, foldCol = fold)
      assertClose(o.best, d.best, 1e-7, s"multinom-offset-zero/$measure")
    }
    // CONSTANT offsets shift every intercept by −c and the held-out
    // eta adds c back — scores identical to the plain CV
    val cst = mdata.withColumn("c1", lit(0.4)).withColumn("c2", lit(-0.2))
      .withColumn("c3", lit(0.1))
    val oc = CvSgdNet.fitMultinomialWithOffset(cst, Seq("x1", "x2"), "cls",
      Seq("c1", "c2", "c3"), params, nfolds = 3, measure = "deviance",
      foldCol = fold)
    val dc = CvSgdNet.fit(mdata, Seq("x1", "x2"), Seq("cls"), params,
      nfolds = 3, measure = "deviance", foldCol = fold)
    assertClose(oc.best, dc.best, 1e-6, "multinom-offset-const")
    // VARYING offsets: cvm matches per-fold standalone offset refits
    // scored by hand (the poisson offset CV discipline)
    val cv = CvSgdNet.fitMultinomialWithOffset(mdata, Seq("x1", "x2"), "cls",
      Seq("oa", "ob", "oc"), params, nfolds = 3, measure = "deviance",
      foldCol = fold)
    val withF = mdata.withColumn("__f", fold)
    for (l <- 0 until 2) {
      var cvm = 0.0
      for (f <- 0 until 3) {
        val m = SgdNet.fitMultinomialWithOffset(withF.filter(col("__f") =!= f),
          Seq("x1", "x2"), "cls", Seq("oa", "ob", "oc"), params)
        val test = withF.filter(col("__f") === f)
          .select("x1", "x2", "oa", "ob", "oc", "cls").collect()
        var sum = 0.0
        test.foreach { r =>
          val etas = Array.tabulate(3)(t => m.a0(l)(t) + r.getDouble(2 + t) +
            m.beta(l)(t)(0) * r.getDouble(0) + m.beta(l)(t)(1) * r.getDouble(1))
          val mx = etas.max
          val z2 = etas.map(e => math.exp(e - mx)).sum
          val yi = m.classLabels.indexOf(r.getString(5))
          val pt = math.min(math.max(math.exp(etas(yi) - mx) / z2, 1e-5),
            1.0 - 1e-5)
          sum += -2.0 * math.log(pt)
        }
        cvm += sum / test.length
      }
      cvm /= 3.0
      assert(math.abs(cv.best.cvm(l) - cvm) < 2e-4 * math.max(1.0, cvm),
        s"cvm($l): ${cv.best.cvm(l)} vs $cvm")
    }
    // full model rides the passes == standalone full-data offset fit
    val full = SgdNet.fitMultinomialWithOffset(mdata, Seq("x1", "x2"), "cls",
      Seq("oa", "ob", "oc"), params)
    for (l <- 0 until 2; t <- 0 until 3; j <- 0 until 2)
      assert(math.abs(cv.best.fit.beta(l)(t)(j) - full.beta(l)(t)(j)) < 1e-5,
        s"full beta($l)($t)($j)")
    // integer weights == row duplication
    val wcv = CvSgdNet.fitMultinomialWithOffset(mdata, Seq("x1", "x2"), "cls",
      Seq("oa", "ob", "oc"), params, nfolds = 3, measure = "deviance",
      foldCol = fold, weightCol = "w")
    val dup = mdata.withColumn("k2",
      explode(sequence(lit(1), col("w").cast("int"))))
    val dcv = CvSgdNet.fitMultinomialWithOffset(dup, Seq("x1", "x2"), "cls",
      Seq("oa", "ob", "oc"), params, nfolds = 3, measure = "deviance",
      foldCol = fold)
    assertClose(wcv.best, dcv.best, 1e-6, "multinom-offset-dup")
    intercept[IllegalArgumentException] {
      CvSgdNet.fitMultinomialWithOffset(mdata, Seq("x1", "x2"), "cls",
        Seq("oa", "ob"), params, foldCol = fold)
    }
    ()
  }

  test("sparse offset multinomial CV == dense; sparse mgaussian offset delegates") {
    val sp = mdata.withColumn("sidx", array(lit(0), lit(1)))
      .withColumn("svals", array(col("x1"), col("x2")))
    val params = SgdNetParams(family = "multinomial", alpha = 1.0,
      lambda = Array(0.05, 0.01), thresh = 1e-8, maxit = 20000)
    for (measure <- Seq("deviance", "class")) {
      val d = CvSgdNet.fitMultinomialWithOffset(mdata, Seq("x1", "x2"), "cls",
        Seq("oa", "ob", "oc"), params, nfolds = 3, measure = measure,
        foldCol = fold)
      val s = CvSgdNet.fitSparseMultinomialWithOffset(sp, "sidx", "svals", 2,
        "cls", Seq("oa", "ob", "oc"), params, nfolds = 3, measure = measure,
        foldCol = fold)
      assertClose(s.best, d.best, 1e-6, s"sparse-mn-offset/$measure")
    }
    // data-derived path + weights
    val pp = SgdNetParams(family = "multinomial", alpha = 1.0, nlambda = 4,
      thresh = 1e-8, maxit = 20000)
    val dw = CvSgdNet.fitMultinomialWithOffset(mdata, Seq("x1", "x2"), "cls",
      Seq("oa", "ob", "oc"), pp, nfolds = 3, measure = "deviance",
      foldCol = fold, weightCol = "w")
    val sw = CvSgdNet.fitSparseMultinomialWithOffset(sp, "sidx", "svals", 2,
      "cls", Seq("oa", "ob", "oc"), pp, nfolds = 3, measure = "deviance",
      foldCol = fold, weightCol = "w")
    assert(sw.best.lambda.zip(dw.best.lambda).forall { case (a, b) =>
      math.abs(a - b) < 1e-9 * b }, "sparse offset mn lambda path")
    for (l <- sw.best.lambda.indices)
      assert(math.abs(sw.best.cvm(l) - dw.best.cvm(l)) <
        1e-6 * math.max(1.0, dw.best.cvm(l)), s"w cvm($l)")
    // sparse mgaussian offset fit + CV delegate to the adjusted problem
    val d2 = data.withColumn("y2", col("x2") * 2.0 + lit(0.15))
      .withColumn("o2", lit(0.3))
      .withColumn("sidx", array(lit(0), lit(1)))
      .withColumn("svals", array(col("x1"), col("x2")))
    val pg = SgdNetParams(family = "mgaussian", alpha = 0.5,
      lambda = Array(0.1, 0.01), thresh = 1e-11, maxit = 100000)
    val offFit = SgdNet.fitSparseMultiWithOffset(d2, "sidx", "svals", 2,
      Seq("yg", "y2"), Seq("off", "o2"), pg)
    val adj = d2.withColumn("yg", col("yg") - col("off"))
      .withColumn("y2", col("y2") - col("o2"))
    val adjFit = SgdNet.fitSparseMulti(adj, "sidx", "svals", 2,
      Seq("yg", "y2"), pg)
    for (l <- 0 until 2; t <- 0 until 2; j <- 0 until 2)
      assert(math.abs(offFit.beta(l)(t)(j) - adjFit.beta(l)(t)(j)) <=
        1e-12 * math.max(1.0, math.abs(adjFit.beta(l)(t)(j))),
        s"sparse mgauss offset beta($l)($t)($j)")
    val offCv = CvSgdNet.fitSparseMultiWithOffset(d2, "sidx", "svals", 2,
      Seq("yg", "y2"), Seq("off", "o2"), pg, nfolds = 3, foldCol = fold)
    val adjCv = CvSgdNet.fitSparseMulti(adj, "sidx", "svals", 2,
      Seq("yg", "y2"), pg, nfolds = 3, foldCol = fold)
    assertClose(offCv.best, adjCv.best, 1e-12, "sparse-mgauss-offset-cv")
    ()
  }

  test("predictAt forwards newoffset and sparse newx (round 18)") {
    // glmnet's predict.cv.glmnet REQUIRES newoffset when the fit used
    // offset and accepts dgCMatrix newx; both now compose through
    // CvResult.predictAt / RelaxedCvResult.predictAt via predColFor.
    // The grids are fixed, so lambda.min is a grid point and atLambda
    // returns the exact path coefficients — parity with the model
    // layer's predictWithOffset/predictSparse is then 1e-12-exact.
    val pb = SgdNetParams(family = "binomial", alpha = 1.0,
      lambda = Array(0.05, 0.01), thresh = 1e-9, maxit = 100000)
    val cv = CvSgdNet.fitWithOffset(data, Seq("x1", "x2"), "yb", "off", pb,
      nfolds = 3, measure = "deviance", foldCol = fold)
    val li = cv.best.lambda.indexOf(cv.best.lambdaMin)
    val sp = data.withColumn("idx", array(lit(0), lit(1)))
      .withColumn("vals", array(col("x1"), col("x2")))
    def colDiff(a: org.apache.spark.sql.DataFrame, ca: String,
                b: org.apache.spark.sql.DataFrame, cb: String): Double = {
      val xs = a.orderBy("rid").select(col(ca).cast("double")).collect()
        .map(_.getDouble(0))
      val ys = b.orderBy("rid").select(col(cb).cast("double")).collect()
        .map(_.getDouble(0))
      xs.zip(ys).map { case (x, y) => math.abs(x - y) }.max
    }
    // the pure-sparse-newx route needs an OFFSET-LESS cv (the round-18
    // contract forbids offset-less predictAt on an offset fit)
    val cvPlain = CvSgdNet.fit(data, Seq("x1", "x2"), Seq("yb"), pb,
      nfolds = 3, measure = "deviance", foldCol = fold)
    val pli = cvPlain.best.lambda.indexOf(cvPlain.best.lambdaMin)
    for (tpe <- Seq("link", "response")) {
      val viaAt = cv.predictAt(data, "lambda.min", tpe,
        offsetCols = Seq("off"))
      val viaModel = cv.best.fit.predictWithOffset(data, Seq("off"), tpe,
        Seq(li))
      assert(colDiff(viaAt, "pred", viaModel, s"pred_$li") < 1e-12,
        s"offset predictAt $tpe == predictWithOffset")
      // sparse newx route == the model layer's predictSparse
      val sAt = cvPlain.predictAt(sp, "lambda.min", tpe,
        idxCol = "idx", valCol = "vals")
      val sModel = cvPlain.best.fit.predictSparse(sp, "idx", "vals", tpe,
        Seq(pli))
      assert(colDiff(sAt, "pred", sModel, s"pred_$pli") < 1e-12,
        s"sparse predictAt $tpe == predictSparse")
      // sparse + offset composition == dense + offset (same rows)
      val sBoth = cv.predictAt(sp, "lambda.min", tpe,
        offsetCols = Seq("off"), idxCol = "idx", valCol = "vals")
      assert(colDiff(sBoth, "pred", viaAt, "pred") < 1e-12,
        s"sparse+offset predictAt $tpe")
    }
    // class type: string predictions must agree row-for-row
    val cAt = cv.predictAt(data, "lambda.min", "class",
      offsetCols = Seq("off")).orderBy("rid").select("pred").collect()
    val cModel = cv.best.fit.predictWithOffset(data, Seq("off"), "class",
      Seq(li)).orderBy("rid").select(s"pred_$li").collect()
    assert(cAt.zip(cModel).forall { case (a, b) =>
      a.getString(0) == b.getString(0) }, "offset class parity")
    // relaxed twin: the blended best-gamma path with offset + sparse
    val r = CvSgdNet.fitRelaxed(data, Seq("x1", "x2"), "yb", pb,
      nfolds = 3, gammas = Seq(0.0, 1.0), measure = "deviance",
      foldCol = fold, offsetCol = "off")
    val rli = r.best.lambda.indexOf(r.best.lambdaMin)
    val rAt = r.predictAt(data, "lambda.min", "response",
      offsetCols = Seq("off"))
    val rModel = r.best.fit.predictWithOffset(data, Seq("off"), "response",
      Seq(rli))
    assert(colDiff(rAt, "pred", rModel, s"pred_$rli") < 1e-12,
      "relaxed offset predictAt")
    val rS = r.predictAt(sp, "lambda.min", "link",
      offsetCols = Seq("off"), idxCol = "idx", valCol = "vals")
    val rD = r.predictAt(data, "lambda.min", "link", offsetCols = Seq("off"))
    assert(colDiff(rS, "pred", rD, "pred") < 1e-12,
      "relaxed sparse+offset == dense+offset")
    // contracts: wrong offset arity, half-specified sparse cols
    intercept[IllegalArgumentException] {
      cv.predictAt(data, "lambda.min", "link",
        offsetCols = Seq("off", "off"))
    }
    intercept[IllegalArgumentException] {
      cv.predictAt(sp, "lambda.min", "link", idxCol = "idx")
    }
    // glmnet newoffset contract: an offset-fit CV REFUSES offset-less
    // predictAt (predict.cv.glmnet errors without newoffset) — dense,
    // relaxed, and sparse-chassis entries all carry the flag
    intercept[IllegalArgumentException] {
      cv.predictAt(data, "lambda.min", "link")
    }
    intercept[IllegalArgumentException] {
      r.predictAt(data, "lambda.min", "link")
    }
    val sCv = CvSgdNet.fitSparseWithOffset(sp, "idx", "vals", 2, "yb",
      "off", pb, nfolds = 3, measure = "deviance", foldCol = fold)
    intercept[IllegalArgumentException] {
      sCv.predictAt(sp, "lambda.min", "link", idxCol = "idx",
        valCol = "vals")
    }
    ()
  }
}
