package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CvSpec extends SparkSpec {

  test("gaussian one-pass CV matches the generic per-fold refit path") {
    val df = SparkSpec.regressionDF(spark, n = 300)
    val params = SgdNetParams(alpha = 1.0, nlambda = 8, thresh = 1e-7, maxit = 50000)
    val fast = CvSgdNet.fit(df, Seq("x1", "x2", "x3"), Seq("y"), params, nfolds = 4)
    // force the generic path by asking for the same thing via a measure that
    // routes generically: use reflection-free trick — call cvGeneric through
    // the public API with family gaussian but measure "mse" goes fast, so
    // instead verify internal consistency: recompute fold scores manually.
    val k = 4
    val withFold = df.withColumn("__fold",
      pmod(xxhash64(col("x1"), col("x2"), col("x3"), col("y")), lit(k)))
    val lambdas = fast.best.lambda
    val manual = Array.ofDim[Double](k, lambdas.length)
    for (f <- 0 until k) {
      val train = withFold.filter(col("__fold") =!= f)
      val test = withFold.filter(col("__fold") === f)
      val m = SgdNet.fit(train, Seq("x1", "x2", "x3"), "y",
        params.copy(lambda = lambdas))
      for (l <- lambdas.indices) {
        manual(f)(l) = test.agg(
          avg(pow(col("y") - m.linkCol(l), 2))).head.getDouble(0)
      }
    }
    val cvmManual = lambdas.indices.map(l => (0 until k).map(manual(_)(l)).sum / k)
    for (l <- lambdas.indices)
      assert(math.abs(fast.best.cvm(l) - cvmManual(l)) < 1e-6,
        s"lambda $l: ${fast.best.cvm(l)} vs ${cvmManual(l)}")
  }

  test("lambda.min minimizes cvm; lambda.1se >= lambda.min") {
    val df = SparkSpec.regressionDF(spark, n = 400)
    val cv = CvSgdNet.fit(df, Seq("x1", "x2", "x3"), Seq("y"),
      SgdNetParams(alpha = 1.0, nlambda = 20), nfolds = 5)
    val b = cv.best
    val minIdx = b.cvm.indices.minBy(b.cvm(_))
    assert(b.lambdaMin == b.lambda(minIdx))
    assert(b.lambda1se >= b.lambdaMin)
    // CV error at lambda.min should be near the noise floor (sigma^2=0.09)
    assert(b.cvm(minIdx) < 0.2, s"cv mse ${b.cvm(minIdx)}")
  }

  test("alpha grid returns a best path and all requested alphas") {
    val df = SparkSpec.regressionDF(spark, n = 300)
    val cv = CvSgdNet.fit(df, Seq("x1", "x2", "x3"), Seq("y"),
      SgdNetParams(nlambda = 6), nfolds = 3, alphas = Seq(0.0, 0.5, 1.0))
    assert(cv.paths.map(_.alpha) == Seq(0.0, 0.5, 1.0))
    assert(cv.paths.contains(cv.best))
    assert(cv.curveDF(spark).count() == 18)
  }

  test("binomial CV via generic path produces sane deviance curve") {
    val df = SparkSpec.binaryDF(spark, n = 400)
    val cv = CvSgdNet.fit(df, Seq("x1", "x2"), Seq("y"),
      SgdNetParams(family = "binomial", nlambda = 5, thresh = 1e-4),
      nfolds = 3)
    val b = cv.best
    assert(b.cvm.length == 5)
    // strongly predictive features: CV deviance at lambda.min beats null
    assert(b.cvm.min < b.cvm.head, "regularized fit beats the near-null fit")
    assert(b.cvm.forall(v => v > 0 && v.isFinite))
  }

  test("binomial shared-pass CV matches per-fold refits") {
    val df = SparkSpec.binaryDF(spark, n = 400)
    val params = SgdNetParams(family = "binomial", alpha = 0.5, nlambda = 4,
      thresh = 1e-6, maxit = 100000)
    // shared-pass path (measure=deviance routes there)
    val fast = CvSgdNet.fit(df, Seq("x1", "x2"), Seq("y"), params,
      nfolds = 3, measure = "deviance")
    // manual per-fold refits with the same hash folds and lambdas
    import org.apache.spark.sql.functions._
    val k = 3
    val withFold = df.withColumn("__fold",
      pmod(xxhash64(col("x1"), col("x2"), col("y")), lit(k)))
    val lambdas = fast.best.lambda
    val manual = Array.ofDim[Double](k, lambdas.length)
    for (f <- 0 until k) {
      val train = withFold.filter(col("__fold") =!= f)
      val test = withFold.filter(col("__fold") === f)
      val m = SgdNet.fit(train, Seq("x1", "x2"), "y", params.copy(lambda = lambdas))
      for (l <- lambdas.indices) {
        val pm = m.responseCol(l)
        val pc = least(greatest(pm, lit(1e-5)), lit(1.0 - 1e-5))
        manual(f)(l) = test.agg(avg(lit(-2.0) *
          (col("y") * log(pc) + (lit(1.0) - col("y")) * log(lit(1.0) - pc))))
          .head.getDouble(0)
      }
    }
    for (l <- lambdas.indices) {
      val cvmManual = (0 until k).map(manual(_)(l)).sum / k
      assert(math.abs(fast.best.cvm(l) - cvmManual) < 1e-4,
        s"lambda $l: shared=${fast.best.cvm(l)} manual=$cvmManual")
    }
  }

  test("multinomial shared-pass CV matches the generic per-fold refit path") {
    val df = SparkSpec.multiclassDF(spark, n = 450)
    val k = 3
    val lambdas = Array(0.5, 0.2, 0.1, 0.05, 0.02)
    // deviance + class on the entrywise penalty, deviance on the grouped
    // penalty — the three routes ADVICE asked to light up. class error is
    // a 0/1 fraction: one near-boundary row flipping between the shared
    // and refit iterates moves a fold by 1/|fold| (~1/150), so it gets a
    // looser gate than the smooth deviance measure.
    for ((measure, tpe, tol) <- Seq(("deviance", "ungrouped", 1e-4),
                                    ("class", "ungrouped", 2e-2),
                                    ("deviance", "grouped", 1e-4))) {
      val params = SgdNetParams(family = "multinomial", alpha = 0.5,
        lambda = lambdas, thresh = 1e-7, maxit = 100000,
        typeMultinomial = tpe)
      // shared-pass path (the default multinomial CV route)
      val fast = CvSgdNet.fit(df, Seq("x1", "x2"), Seq("cls"), params,
        nfolds = k, measure = measure)
      // generic per-fold refit path on the SAME fixed grid + default folds
      val gen = CvSgdNet.cvGeneric(df, Seq("x1", "x2"), Seq("cls"), params,
        k, measure)
      assert(fast.best.lambda.sameElements(gen.lambda))
      for (l <- lambdas.indices) {
        assert(math.abs(fast.best.cvm(l) - gen.cvm(l)) < tol,
          s"$measure/$tpe lambda $l: shared=${fast.best.cvm(l)} generic=${gen.cvm(l)}")
        assert(math.abs(fast.best.cvsd(l) - gen.cvsd(l)) < tol,
          s"$measure/$tpe lambda $l: cvsd shared=${fast.best.cvsd(l)} generic=${gen.cvsd(l)}")
      }
    }
  }

  test("CV fails fast when a fold receives no observations") {
    // foldCol only ever produces folds 0..2 but nfolds = 4: fold 3 is
    // empty and each family's shared path must raise, not emit NaN
    val foldCol = pmod(xxhash64(col("x1")), lit(3))
    val gaussian = intercept[IllegalArgumentException] {
      CvSgdNet.fit(SparkSpec.regressionDF(spark, n = 80),
        Seq("x1", "x2", "x3"), Seq("y"), SgdNetParams(nlambda = 3),
        nfolds = 4, foldCol = foldCol)
    }
    assert(gaussian.getMessage.contains("fold"))
    val binomial = intercept[IllegalArgumentException] {
      CvSgdNet.fit(SparkSpec.binaryDF(spark, n = 80), Seq("x1", "x2"),
        Seq("y"), SgdNetParams(family = "binomial", nlambda = 3),
        nfolds = 4, foldCol = foldCol)
    }
    assert(binomial.getMessage.contains("fold"))
    val multinomial = intercept[IllegalArgumentException] {
      CvSgdNet.fit(SparkSpec.multiclassDF(spark, n = 90), Seq("x1", "x2"),
        Seq("cls"), SgdNetParams(family = "multinomial", nlambda = 3),
        nfolds = 4, foldCol = foldCol)
    }
    assert(multinomial.getMessage.contains("fold"))
  }

  test("CV over auc matches per-fold refits scored by aucScore") {
    val df = SparkSpec.binaryDF(spark, n = 400)
    val params = SgdNetParams(family = "binomial", alpha = 0.5, nlambda = 4,
      thresh = 1e-6, maxit = 100000)
    val cv = CvSgdNet.fit(df, Seq("x1", "x2"), Seq("y"), params,
      nfolds = 3, measure = "auc")
    // manual per-fold refits with the same hash folds and lambdas
    val k = 3
    val withFold = df.withColumn("__fold",
      pmod(xxhash64(col("x1"), col("x2"), col("y")), lit(k)))
    val lambdas = cv.best.lambda
    for (l <- lambdas.indices) {
      val manual = (0 until k).map { f =>
        val train = withFold.filter(col("__fold") =!= f)
        val test = withFold.filter(col("__fold") === f)
        val m = SgdNet.fit(train, Seq("x1", "x2"), "y", params.copy(lambda = lambdas))
        m.aucScore(test, l)
      }
      val cvmManual = manual.sum / k
      // shared-pass and refit coefficients agree to solver tolerance;
      // a near-tie pair of scores may rank differently, moving AUC by
      // ~1/(np*nn) — compare loosely
      assert(math.abs(cv.best.cvm(l) - cvmManual) < 1e-3,
        s"lambda $l: cv=${cv.best.cvm(l)} manual=$cvmManual")
      // predictive features: auc at the least-penalized end beats chance
      if (l == lambdas.length - 1) assert(cv.best.cvm(l) > 0.7, cv.best.cvm(l))
    }
  }

  test("gaussian CV honors measure=mae (not silently mse)") {
    val df = SparkSpec.regressionDF(spark, n = 300)
    val params = SgdNetParams(alpha = 1.0, nlambda = 5, thresh = 1e-7,
      maxit = 50000)
    val mae = CvSgdNet.fit(df, Seq("x1", "x2", "x3"), Seq("y"), params,
      nfolds = 3, measure = "mae")
    // manual per-fold MAE with the same hash folds
    val k = 3
    val withFold = df.withColumn("__fold",
      pmod(xxhash64(col("x1"), col("x2"), col("x3"), col("y")), lit(k)))
    val lambdas = mae.best.lambda
    for (l <- lambdas.indices) {
      val manual = (0 until k).map { f =>
        val m = SgdNet.fit(withFold.filter(col("__fold") =!= f),
          Seq("x1", "x2", "x3"), "y", params.copy(lambda = lambdas))
        withFold.filter(col("__fold") === f)
          .agg(avg(abs(col("y") - m.linkCol(l)))).head.getDouble(0)
      }
      assert(math.abs(mae.best.cvm(l) - manual.sum / k) < 1e-9,
        s"lambda $l: ${mae.best.cvm(l)} vs ${manual.sum / k}")
    }
    // and it is NOT the mse curve
    val mse = CvSgdNet.fit(df, Seq("x1", "x2", "x3"), Seq("y"), params,
      nfolds = 3, measure = "mse")
    assert((0 until lambdas.length).exists(l =>
      math.abs(mae.best.cvm(l) - mse.best.cvm(l)) > 1e-6),
      "mae curve must differ from mse curve")
  }

  test("score.cv_sgdnet scores held-out data at the selected lambda") {
    val df = SparkSpec.binaryDF(spark, n = 400)
    val cv = CvSgdNet.fit(df, Seq("x1", "x2"), Seq("y"),
      SgdNetParams(family = "binomial", nlambda = 5, thresh = 1e-5),
      nfolds = 3)
    val holdout = df.limit(100)
    for (measure <- Seq("deviance", "mse", "mae", "class", "auc")) {
      val v = cv.score(holdout, measure, "lambda.min")
      assert(v.isFinite && v >= 0, s"$measure: $v")
      // delegates to the interpolated full-data fit
      val direct = cv.best.fit.scoreAt(holdout, measure, cv.best.lambdaMin)
      assert(v == direct, s"$measure: $v vs $direct")
    }
    // at an exact path point, scoreAt agrees with the per-index score()
    val li = cv.best.fit.lambda.indices.last
    val s = cv.best.fit.score(df, "deviance", Seq(li)).collect()(0).getDouble(2)
    val at = cv.best.fit.scoreAt(df, "deviance", cv.best.fit.lambda(li))
    assert(math.abs(s - at) < 1e-12, s"$s vs $at")
  }

  private def poissonDF(n: Int = 400, seed: Long = 31L) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (1 to n).map { _ =>
      val x1 = rnd.nextGaussian(); val x2 = rnd.nextGaussian()
      val mu = math.exp(0.5 + 0.4 * x1 - 0.3 * x2)
      val y = math.floor(mu + rnd.nextGaussian() * math.sqrt(mu)).max(0.0)
      (x1, x2, y)
    }.toDF("x1", "x2", "y")
  }

  private def mgaussDF(n: Int = 300, seed: Long = 47L) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (1 to n).map { _ =>
      val x1 = rnd.nextGaussian() * 2.0 + 1.0
      val x2 = rnd.nextGaussian() * 0.5 - 2.0
      val y1 = 3.0 + 2.0 * x1 - 1.5 * x2 + rnd.nextGaussian() * 0.3
      val y2 = -1.0 + 0.5 * x1 + 1.0 * x2 + rnd.nextGaussian() * 0.3
      (x1, x2, y1, y2)
    }.toDF("x1", "x2", "y1", "y2")
  }

  test("poisson shared-pass CV matches the generic per-fold refit path") {
    val df = poissonDF()
    val lambdas = Array(0.5, 0.1, 0.02)
    for (measure <- Seq("deviance", "mse", "mae")) {
      val params = SgdNetParams(family = "poisson", alpha = 0.5,
        lambda = lambdas, thresh = 1e-7, maxit = 100000)
      val fast = CvSgdNet.fit(df, Seq("x1", "x2"), Seq("y"), params,
        nfolds = 3, measure = measure)
      val gen = CvSgdNet.cvGeneric(df, Seq("x1", "x2"), Seq("y"), params,
        3, measure)
      assert(fast.best.lambda.sameElements(gen.lambda))
      for (l <- lambdas.indices) {
        assert(math.abs(fast.best.cvm(l) - gen.cvm(l)) < 1e-4,
          s"$measure lambda $l: shared=${fast.best.cvm(l)} generic=${gen.cvm(l)}")
        assert(math.abs(fast.best.cvsd(l) - gen.cvsd(l)) < 1e-4,
          s"$measure lambda $l: cvsd shared=${fast.best.cvsd(l)} generic=${gen.cvsd(l)}")
      }
    }
  }

  test("mgaussian one-pass moment CV matches the generic per-fold refit path") {
    val df = mgaussDF()
    val lambdas = Array(1.0, 0.3, 0.1, 0.03)
    for ((measure, stdResp) <- Seq(("deviance", false), ("mse", false),
                                   ("mae", false), ("deviance", true))) {
      val params = SgdNetParams(family = "mgaussian", alpha = 0.5,
        lambda = lambdas, thresh = 1e-9, maxit = 100000,
        standardizeResponse = stdResp)
      val fast = CvSgdNet.fit(df, Seq("x1", "x2"), Seq("y1", "y2"), params,
        nfolds = 3, measure = measure)
      val gen = CvSgdNet.cvGeneric(df, Seq("x1", "x2"), Seq("y1", "y2"),
        params, 3, measure)
      assert(fast.best.lambda.sameElements(gen.lambda))
      for (l <- lambdas.indices) {
        // the fold solves reuse solveGaussianFromStats verbatim, so the
        // only differences are moment-vs-row float summation order
        assert(math.abs(fast.best.cvm(l) - gen.cvm(l)) < 1e-6,
          s"$measure/std=$stdResp lambda $l: shared=${fast.best.cvm(l)} generic=${gen.cvm(l)}")
        assert(math.abs(fast.best.cvsd(l) - gen.cvsd(l)) < 1e-6,
          s"$measure/std=$stdResp lambda $l: cvsd shared=${fast.best.cvsd(l)} generic=${gen.cvsd(l)}")
      }
    }
  }

  test("poisson CV scores held-out deviance (shared-pass route)") {
    val df = poissonDF()
    val cv = CvSgdNet.fit(df, Seq("x1", "x2"), Seq("y"),
      SgdNetParams(family = "poisson", alpha = 0.5, nlambda = 4, thresh = 1e-6),
      nfolds = 3)
    assert(cv.best.cvm.length == 4)
    assert(cv.best.cvm.forall(v => v.isFinite && v > 0))
    // predictive features: the regularized end of the path beats the
    // most-penalized (near-null) end
    assert(cv.best.cvm.last < cv.best.cvm.head,
      s"${cv.best.cvm.last} vs ${cv.best.cvm.head}")
    // mse/mae also run
    for (ms <- Seq("mse", "mae")) {
      val c = CvSgdNet.fit(df, Seq("x1", "x2"), Seq("y"),
        SgdNetParams(family = "poisson", alpha = 0.5, nlambda = 3, thresh = 1e-5),
        nfolds = 3, measure = ms)
      assert(c.best.cvm.forall(_.isFinite))
    }
  }

  test("predictAt honors the prediction type (link/response/class)") {
    val df = SparkSpec.binaryDF(spark, n = 400)
    val cv = CvSgdNet.fit(df, Seq("x1", "x2"), Seq("y"),
      SgdNetParams(family = "binomial", nlambda = 5, thresh = 1e-5),
      nfolds = 3)
    val sample = df.limit(20)
    val link = cv.predictAt(sample, "lambda.min", "link")
      .select("pred").collect().map(_.getDouble(0))
    val resp = cv.predictAt(sample, "lambda.min", "response")
      .select("pred").collect().map(_.getDouble(0))
    val cls = cv.predictAt(sample, "lambda.min", "class")
      .select("pred").collect().map(_.getString(0))
    for (i <- link.indices) {
      val sigmoid = 1.0 / (1.0 + math.exp(-link(i)))
      assert(math.abs(resp(i) - sigmoid) < 1e-12,
        s"response must be sigmoid(link): ${resp(i)} vs $sigmoid")
      val expected = cv.best.fit.classLabels(if (resp(i) > 0.5) 1 else 0)
      assert(cls(i) == expected)
    }
  }
}
