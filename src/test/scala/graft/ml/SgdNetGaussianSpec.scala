package graft.ml

import graft.SparkSpec

/** Gaussian-family correctness: closed forms, KKT optimality, spark.ml
  * agreement (spark.ml minimizes the same glmnet objective).
  */
class SgdNetGaussianSpec extends SparkSpec {

  private def fitStats(df: org.apache.spark.sql.DataFrame, cols: Seq[String]) = {
    val rdd = SufficientStats.toRdd(df, cols, Seq("y"))
    SufficientStats.standardize(
      SufficientStats.compute(rdd, cols.size, 1), standardizeX = true, intercept = true)
  }

  test("OLS matches the normal equations") {
    val df = SparkSpec.regressionDF(spark)
    val m = SgdNet.fit(df, Seq("x1", "x2", "x3"), "y",
      SgdNetParams(lambda = Array(0.0), thresh = 1e-11, maxit = 100000))
    // spark.ml with regParam=0 solves the same least squares
    import org.apache.spark.ml.feature.VectorAssembler
    import org.apache.spark.ml.regression.LinearRegression
    val va = new VectorAssembler().setInputCols(Array("x1", "x2", "x3")).setOutputCol("f")
    val lr = new LinearRegression().setFeaturesCol("f").setLabelCol("y")
      .setRegParam(0.0).setSolver("normal")
    val ml = lr.fit(va.transform(df))
    val got = m.beta(0)(0)
    for (j <- 0 until 3)
      assert(math.abs(got(j) - ml.coefficients(j)) < 1e-6, s"beta_$j: ${got(j)} vs ${ml.coefficients(j)}")
    assert(math.abs(m.a0(0)(0) - ml.intercept) < 1e-6)
  }

  test("elastic net matches spark.ml (same objective, converted params)") {
    // spark.ml LinearRegression internally scales the label by its
    // POPULATION sd, which turns its (regParam, elasticNetParam) into the
    // glmnet-scale penalties l1 = lamMl*alphaMl, l2 = lamMl*(1-alphaMl)/sdY.
    // Convert glmnet (alpha, lambda) -> spark.ml params and require exact
    // agreement (verified to ~1e-11).
    import org.apache.spark.sql.functions.stddev_pop
    val df = SparkSpec.regressionDF(spark)
    val sdY = df.agg(stddev_pop(org.apache.spark.sql.functions.col("y"))).head.getDouble(0)
    for ((alpha, lam) <- Seq((1.0, 0.1), (0.5, 0.2), (0.0, 0.5))) {
      val m = SgdNet.fit(df, Seq("x1", "x2", "x3"), "y",
        SgdNetParams(alpha = alpha, lambda = Array(lam), thresh = 1e-12, maxit = 100000))
      val a = lam * alpha; val b = lam * (1 - alpha)
      val lamMl = a + b * sdY
      val alphaMl = if (lamMl == 0) 0.0 else a / lamMl
      import org.apache.spark.ml.feature.VectorAssembler
      import org.apache.spark.ml.regression.LinearRegression
      val va = new VectorAssembler().setInputCols(Array("x1", "x2", "x3")).setOutputCol("f")
      val ml = new LinearRegression().setFeaturesCol("f").setLabelCol("y")
        .setRegParam(lamMl).setElasticNetParam(alphaMl).setStandardization(true)
        .setMaxIter(100000).setTol(1e-15).fit(va.transform(df))
      for (j <- 0 until 3)
        assert(math.abs(m.beta(0)(0)(j) - ml.coefficients(j)) < 1e-7,
          s"alpha=$alpha lam=$lam beta_$j: ${m.beta(0)(0)(j)} vs ${ml.coefficients(j)}")
      assert(math.abs(m.a0(0)(0) - ml.intercept) < 1e-7)
    }
  }

  test("sgdnetCompat reproduces the reference's implemented penalty") {
    // the reference converts its penalties "to match scikit-learn"
    // (src/utils.h:172-178) — the same convention spark.ml uses (label
    // scaled by sd_pop), so compat mode must agree with spark.ml at
    // UNCONVERTED params (regParam = lambda, elasticNetParam = alpha),
    // where default mode needs the sdY-converted params above
    val df = SparkSpec.regressionDF(spark)
    import org.apache.spark.ml.feature.VectorAssembler
    import org.apache.spark.ml.regression.LinearRegression
    val va = new VectorAssembler().setInputCols(Array("x1", "x2", "x3")).setOutputCol("f")
    for ((alpha, lam) <- Seq((0.0, 0.5), (0.5, 0.2))) {
      val m = SgdNet.fit(df, Seq("x1", "x2", "x3"), "y",
        SgdNetParams(alpha = alpha, lambda = Array(lam), thresh = 1e-12,
          maxit = 100000, sgdnetCompat = true))
      val ml = new LinearRegression().setFeaturesCol("f").setLabelCol("y")
        .setRegParam(lam).setElasticNetParam(alpha).setStandardization(true)
        .setMaxIter(100000).setTol(1e-15).fit(va.transform(df))
      for (j <- 0 until 3)
        assert(math.abs(m.beta(0)(0)(j) - ml.coefficients(j)) < 1e-7,
          s"compat alpha=$alpha lam=$lam beta_$j: ${m.beta(0)(0)(j)} vs ${ml.coefficients(j)}")
      assert(math.abs(m.a0(0)(0) - ml.intercept) < 1e-7)
    }
    // pure lasso: the conventions share the L1 term, so compat is the
    // identity there (tolerance, not bitwise: treeAggregate partition
    // merges follow task completion order, which wobbles the moment
    // sums at the last ulp between runs)
    val d0 = SgdNet.fit(df, Seq("x1", "x2", "x3"), "y",
      SgdNetParams(alpha = 1.0, lambda = Array(0.1), thresh = 1e-12))
    val d1 = SgdNet.fit(df, Seq("x1", "x2", "x3"), "y",
      SgdNetParams(alpha = 1.0, lambda = Array(0.1), thresh = 1e-12,
        sgdnetCompat = true))
    for (j <- 0 until 3)
      assert(math.abs(d0.beta(0)(0)(j) - d1.beta(0)(0)(j)) < 1e-9)
    assert(math.abs(d0.a0(0)(0) - d1.a0(0)(0)) < 1e-9)
  }

  test("lasso solution satisfies KKT conditions") {
    val df = SparkSpec.regressionDF(spark)
    val cols = Seq("x1", "x2", "x3")
    val lam = 0.3
    val m = SgdNet.fit(df, cols, "y",
      SgdNetParams(alpha = 1.0, lambda = Array(lam), thresh = 1e-11, maxit = 100000))
    val st = fitStats(df, cols)
    // standardized-scale coefficients
    val bstd = Array.tabulate(3)(j => m.beta(0)(0)(j) * st.xSd(j))
    // gradient_j = sum_k G_jk beta_k - b_j ; KKT: |grad| <= lam if beta=0,
    // grad + lam*sign(beta) = 0 otherwise
    for (j <- 0 until 3) {
      val grad = (0 until 3).map(k => st.gram(j)(k) * bstd(k)).sum - st.b(0)(j)
      if (bstd(j) == 0.0) assert(math.abs(grad) <= lam + 1e-6, s"KKT zero coef $j: $grad")
      else assert(math.abs(grad + lam * math.signum(bstd(j))) < 1e-6, s"KKT active $j")
    }
  }

  test("lambda path is decreasing, first solution is null model") {
    val df = SparkSpec.regressionDF(spark)
    val m = SgdNet.fit(df, Seq("x1", "x2", "x3"), "y",
      SgdNetParams(alpha = 1.0, nlambda = 10))
    assert(m.lambda.sliding(2).forall(a => a(0) > a(1)))
    assert(m.beta(0)(0).forall(_ == 0.0), "at lambda_max all coefficients are zero")
    assert(m.df.head == 0 && m.df.last > 0)
    assert(m.devRatio.last > m.devRatio.head)
  }

  test("no-intercept / no-standardize fit") {
    val df = SparkSpec.regressionDF(spark)
    val m = SgdNet.fit(df, Seq("x1"), "y",
      SgdNetParams(lambda = Array(0.0), standardize = false, intercept = false, thresh = 1e-11))
    import spark.implicits._
    val d = df.select("x1", "y").as[(Double, Double)].collect()
    val expected = d.map(t => t._1 * t._2).sum / d.map(t => t._1 * t._1).sum
    assert(math.abs(m.beta(0)(0)(0) - expected) < 1e-8)
    assert(m.a0(0)(0) == 0.0)
  }

  test("input validation mirrors reference") {
    val df = SparkSpec.regressionDF(spark)
    intercept[IllegalArgumentException] {
      SgdNet.fit(df, Seq("x1"), "y", SgdNetParams(alpha = 1.5))
    }
    intercept[IllegalArgumentException] {
      SgdNet.fit(df, Seq("x1"), "y", SgdNetParams(nlambda = 0))
    }
    intercept[IllegalArgumentException] {
      SgdNet.fit(df, Seq("x1"), "y", SgdNetParams(lambda = Array(-1.0)))
    }
    intercept[IllegalArgumentException] {
      SgdNet.fit(df, Seq("x1"), "y", SgdNetParams(maxit = 0))
    }
  }

  test("penaltyFactor: all-ones is the default fit; 0 leaves a feature unpenalized") {
    val df = SparkSpec.regressionDF(spark)
    val base = SgdNet.fit(df, Seq("x1", "x2"), "y",
      SgdNetParams(lambda = Array(0.3), thresh = 1e-11, maxit = 100000))
    val ones = SgdNet.fit(df, Seq("x1", "x2"), "y",
      SgdNetParams(lambda = Array(0.3), thresh = 1e-11, maxit = 100000,
        penaltyFactor = Array(1.0, 1.0)))
    for (j <- 0 until 2)
      assert(math.abs(base.beta(0)(0)(j) - ones.beta(0)(0)(j)) < 1e-9)
    // pf = [0, 1] at enormous lambda: x2 dies, x1 refits as the
    // 1-feature OLS (its coordinate never sees the penalty)
    val pf = SgdNet.fit(df, Seq("x1", "x2"), "y",
      SgdNetParams(lambda = Array(1e9), thresh = 1e-11, maxit = 100000,
        penaltyFactor = Array(0.0, 1.0)))
    assert(pf.beta(0)(0)(1) == 0.0, "penalized coef must vanish")
    val ols1 = SgdNet.fit(df, Seq("x1"), "y",
      SgdNetParams(lambda = Array(0.0), thresh = 1e-11, maxit = 100000))
    assert(math.abs(pf.beta(0)(0)(0) - ols1.beta(0)(0)(0)) < 1e-7,
      s"${pf.beta(0)(0)(0)} vs ${ols1.beta(0)(0)(0)}")
    // automatic path: lambda_max comes from PENALIZED coords only
    val path = SgdNet.fit(df, Seq("x1", "x2"), "y",
      SgdNetParams(nlambda = 3, penaltyFactor = Array(0.0, 1.0)))
    assert(path.beta(0)(0)(0) != 0.0, "unpenalized coef live at lambda_max")
    assert(math.abs(path.beta(0)(0)(1)) < 1e-6,
      s"penalized coef zero at lambda_max: ${path.beta(0)(0)(1)}")
    // binomial route: a huge factor on x2 kills exactly that coef
    val db = SparkSpec.binaryDF(spark)
    val mb = SgdNet.fit(db, Seq("x1", "x2"), "y",
      SgdNetParams(family = "binomial", lambda = Array(0.02),
        penaltyFactor = Array(1.0, 1e6), thresh = 1e-7))
    assert(mb.beta(0)(0)(1) == 0.0 && mb.beta(0)(0)(0) != 0.0)
    // group solver accepts pf: a huge factor on x1 kills that feature's
    // whole cross-response group, and the surviving x2 group matches the
    // fit without x1
    val mgPf = SgdNet.fitMulti(df, Seq("x1", "x2"), Seq("y", "x3"),
      SgdNetParams(family = "mgaussian", lambda = Array(0.05),
        thresh = 1e-11, maxit = 100000, penaltyFactor = Array(1e9, 1.0)))
    for (t <- 0 until 2) assert(mgPf.beta(0)(t)(0) == 0.0)
    val mgX2 = SgdNet.fitMulti(df, Seq("x2"), Seq("y", "x3"),
      SgdNetParams(family = "mgaussian", lambda = Array(0.05),
        thresh = 1e-11, maxit = 100000))
    for (t <- 0 until 2)
      assert(math.abs(mgPf.beta(0)(t)(1) - mgX2.beta(0)(t)(0)) < 1e-7,
        s"response $t")
    // pf = 0 on the group path: explicit lambda leaves the coordinate
    // UNPENALIZED (alive at enormous lambda while x2 dies) ...
    val mgPf0 = SgdNet.fitMulti(df, Seq("x1", "x2"), Seq("y", "x3"),
      SgdNetParams(family = "mgaussian", lambda = Array(1e9),
        thresh = 1e-11, maxit = 100000, penaltyFactor = Array(0.0, 1.0)))
    assert(mgPf0.beta(0)(0)(0) != 0.0 && mgPf0.beta(0)(1)(1) == 0.0)
    // ... but the AUTOMATIC lambda path rejects (the unpenalized-
    // coordinate lambda_max projection is single-response only)
    intercept[IllegalArgumentException] {
      SgdNet.fitMulti(df, Seq("x1", "x2"), Seq("y", "x3"),
        SgdNetParams(family = "mgaussian", nlambda = 5,
          penaltyFactor = Array(0.0, 1.0)))
    }
  }

  test("fitWeighted: unit weights = unweighted fit; integer weights = row duplication") {
    import org.apache.spark.sql.functions._
    val df = SparkSpec.regressionDF(spark)
    val unw = SgdNet.fit(df, Seq("x1", "x2"), "y",
      SgdNetParams(lambda = Array(0.2), thresh = 1e-11, maxit = 100000))
    val w1 = SgdNet.fitWeighted(df.withColumn("w", lit(1.0)),
      Seq("x1", "x2"), "y", "w",
      SgdNetParams(lambda = Array(0.2), thresh = 1e-11, maxit = 100000))
    for (j <- 0 until 2)
      assert(math.abs(unw.beta(0)(0)(j) - w1.beta(0)(0)(j)) < 1e-9)
    assert(math.abs(unw.a0(0)(0) - w1.a0(0)(0)) < 1e-7)
    // integer weights {1,2,3} == physically duplicated rows
    val wdf = df.withColumn("w",
      (pmod(round(col("y") * 100).cast("long"), lit(3)) + 1).cast("double"))
    val dup = wdf.withColumn("k",
        explode(sequence(lit(1), col("w").cast("int"))))
      .drop("k")
    val mw = SgdNet.fitWeighted(wdf, Seq("x1", "x2"), "y", "w",
      SgdNetParams(lambda = Array(0.2), thresh = 1e-12, maxit = 100000))
    val md = SgdNet.fit(dup, Seq("x1", "x2"), "y",
      SgdNetParams(lambda = Array(0.2), thresh = 1e-12, maxit = 100000))
    for (j <- 0 until 2)
      assert(math.abs(mw.beta(0)(0)(j) - md.beta(0)(0)(j)) < 1e-6,
        s"beta_$j: ${mw.beta(0)(0)(j)} vs ${md.beta(0)(0)(j)}")
    assert(math.abs(mw.a0(0)(0) - md.a0(0)(0)) < 1e-4)
    // w == 0 drops the observation: weights {0,1} == the filtered fit
    val w01 = df.withColumn("w",
      (pmod(round(col("y") * 100).cast("long"), lit(2))).cast("double"))
    val mz = SgdNet.fitWeighted(w01, Seq("x1", "x2"), "y", "w",
      SgdNetParams(lambda = Array(0.2), thresh = 1e-12, maxit = 100000))
    val mf = SgdNet.fit(w01.filter(col("w") > 0), Seq("x1", "x2"), "y",
      SgdNetParams(lambda = Array(0.2), thresh = 1e-12, maxit = 100000))
    for (j <- 0 until 2)
      assert(math.abs(mz.beta(0)(0)(j) - mf.beta(0)(0)(j)) < 1e-9)
    assert(math.abs(mz.a0(0)(0) - mf.a0(0)(0)) < 1e-9)
    // contracts: non-negative weights; supported families; valid alpha
    intercept[Exception] {
      SgdNet.fitWeighted(df.withColumn("w", lit(-1.0)),
        Seq("x1"), "y", "w", SgdNetParams(lambda = Array(0.1)))
    }
    // mgaussian needs the multi-label entry point (fitWeightedMulti);
    // the single-label fitWeighted rejects it with a pointer there
    // (multinomial is a SUPPORTED weighted family since round 15)
    intercept[IllegalArgumentException] {
      SgdNet.fitWeighted(df.withColumn("w", lit(1.0)), Seq("x1"), "y", "w",
        SgdNetParams(family = "mgaussian"))
    }
    intercept[IllegalArgumentException] {
      SgdNet.fitWeighted(df.withColumn("w", lit(1.0)), Seq("x1"), "y", "w",
        SgdNetParams(alpha = 2.0, lambda = Array(0.1)))
    }
  }

  test("relaxedFit: active-set OLS refit, empty-set fallback, gamma blend") {
    val df = SparkSpec.regressionDF(spark)
    // lambda 1e12 kills every coefficient; 0.05 keeps x1/x2 active
    val rp = SgdNet.relaxedFit(df, Seq("x1", "x2", "x3"), "y",
      SgdNetParams(lambda = Array(1e12, 0.05), thresh = 1e-11,
        maxit = 100000), gamma = 0.25)
    // empty active set → intercept-only refit at the mean
    assert(rp.olsBeta(0).forall(_ == 0.0))
    val yMean = df.agg(org.apache.spark.sql.functions.avg("y")).head().getDouble(0)
    assert(math.abs(rp.olsA0(0) - yMean) < 1e-9)
    // refit on the full active set == unpenalized least squares on it
    val active = rp.model.beta(1)(0).zipWithIndex.filter(_._1 != 0.0).map(_._2)
    assert(active.nonEmpty)
    val cols = active.map(j => Seq("x1", "x2", "x3")(j)).toSeq
    val ols = SgdNet.fit(df, cols, "y",
      SgdNetParams(lambda = Array(0.0), thresh = 1e-11, maxit = 100000))
    active.zipWithIndex.foreach { case (j, i) =>
      assert(math.abs(rp.olsBeta(1)(j) - ols.beta(0)(0)(i)) < 1e-6,
        s"refit beta_$j")
    }
    assert(math.abs(rp.olsA0(1) - ols.a0(0)(0)) < 1e-6)
    // refit shrinks less than the lasso toward zero on the signal coefs
    assert(math.abs(rp.olsBeta(1)(0)) > math.abs(rp.model.beta(1)(0)(0)))
    // blend is the stated affine combination
    val b = rp.blendedBeta(1)
    for (j <- 0 until 3)
      assert(math.abs(b(j) - (0.25 * rp.model.beta(1)(0)(j)
        + 0.75 * rp.olsBeta(1)(j))) < 1e-12)
    // gaussian-only contract
    intercept[IllegalArgumentException] {
      SgdNet.relaxedFit(df, Seq("x1"), "y",
        SgdNetParams(family = "binomial"))
    }
  }

  test("relaxedFitSparse == dense relaxedFit (round 16, incl. weights)") {
    import org.apache.spark.sql.functions._
    val df = SparkSpec.regressionDF(spark)
      .withColumn("idx", array(lit(0), lit(1), lit(2)))
      .withColumn("vals", array(col("x1"), col("x2"), col("x3")))
      .withColumn("w", pmod(xxhash64(col("y")), lit(3)).cast("double") + 1.0)
    val prm = SgdNetParams(lambda = Array(1e12, 0.05), thresh = 1e-11,
      maxit = 100000)
    val d = SgdNet.relaxedFit(df, Seq("x1", "x2", "x3"), "y", prm,
      gamma = 0.25)
    val s = SgdNet.relaxedFitSparse(df, "idx", "vals", 3, "y", prm,
      gamma = 0.25)
    for (l <- 0 until 2; j <- 0 until 3) {
      assert(math.abs(s.model.beta(l)(0)(j) - d.model.beta(l)(0)(j)) < 1e-9)
      assert(math.abs(s.olsBeta(l)(j) - d.olsBeta(l)(j)) < 1e-9)
    }
    val dw = SgdNet.relaxedFitWeighted(df, Seq("x1", "x2", "x3"), "y", "w",
      prm, gamma = 0.25)
    val sw = SgdNet.relaxedFitSparse(df, "idx", "vals", 3, "y", prm,
      gamma = 0.25, weightCol = "w")
    for (l <- 0 until 2; j <- 0 until 3)
      assert(math.abs(sw.olsBeta(l)(j) - dw.olsBeta(l)(j)) < 1e-9)
  }
}
