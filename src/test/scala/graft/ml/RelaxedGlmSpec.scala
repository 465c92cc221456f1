package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Relaxed elastic net for the IRLS families (round 16 — glmnet
  * relax = TRUE with binomial/poisson): the active-set unpenalized
  * refit must equal an independent solver's MLE on the active
  * columns, empty active sets must refit to the closed-form null, and
  * the gamma blend must be linear with γ = 1 reproducing the
  * penalized path. */
class RelaxedGlmSpec extends SparkSpec {
  import spark.implicits._

  private def assembled(df: org.apache.spark.sql.DataFrame,
                        cols: Array[String]) =
    new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(cols).setOutputCol("fv").transform(df)

  test("binomial relaxed refit == spark.ml LogisticRegression at regParam 0") {
    val db = SparkSpec.binaryDF(spark)
    val params = SgdNetParams(family = "binomial", alpha = 1.0,
      lambda = Array(0.02), thresh = 1e-9, maxit = 100000)
    val rp = SgdNet.relaxedFit(db, Seq("x1", "x2"), "y", params, gamma = 0.0)
    assert(rp.model.df(0) == 2, "both features should be active")
    val lr = new org.apache.spark.ml.classification.LogisticRegression()
      .setRegParam(0.0).setFitIntercept(true).setTol(1e-10).setMaxIter(300)
      .setFeaturesCol("fv").setLabelCol("y")
      .fit(assembled(db, Array("x1", "x2")))
    assert(math.abs(rp.olsA0(0) - lr.intercept) < 1e-4,
      s"a0 ${rp.olsA0(0)} vs ${lr.intercept}")
    for (j <- 0 until 2)
      assert(math.abs(rp.olsBeta(0)(j) - lr.coefficients(j)) < 1e-4,
        s"b$j ${rp.olsBeta(0)(j)} vs ${lr.coefficients(j)}")
    // gamma = 0 blends to the refit; gamma = 1 to the penalized path
    assert(rp.blendedA0(0) == rp.olsA0(0))
    val rp1 = SgdNet.relaxedFit(db, Seq("x1", "x2"), "y", params, gamma = 1.0)
    for (j <- 0 until 2)
      assert(rp1.blendedBeta(0)(j) == rp1.model.beta(0)(0)(j), "gamma=1")
  }

  test("poisson relaxed refit == spark.ml GLR at regParam 0") {
    val dp = SparkSpec.regressionDF(spark)
      .withColumn("yp", ceil(abs(col("y"))).cast("double"))
    val params = SgdNetParams(family = "poisson", alpha = 1.0,
      lambda = Array(0.01), thresh = 1e-9, maxit = 100000)
    val rp = SgdNet.relaxedFit(dp, Seq("x1", "x2"), "yp", params, gamma = 0.5)
    val glr = new org.apache.spark.ml.regression.GeneralizedLinearRegression()
      .setFamily("poisson").setLink("log").setRegParam(0.0)
      .setTol(1e-10).setMaxIter(200)
      .setFeaturesCol("fv").setLabelCol("yp")
      .fit(assembled(dp, Array("x1", "x2")))
    assert(math.abs(rp.olsA0(0) - glr.intercept) < 1e-4,
      s"a0 ${rp.olsA0(0)} vs ${glr.intercept}")
    for (j <- 0 until 2)
      assert(math.abs(rp.olsBeta(0)(j) - glr.coefficients(j)) < 1e-4,
        s"b$j ${rp.olsBeta(0)(j)} vs ${glr.coefficients(j)}")
    // blend linearity at gamma = 0.5
    for (j <- 0 until 2) {
      val want = 0.5 * rp.model.beta(0)(0)(j) + 0.5 * rp.olsBeta(0)(j)
      assert(rp.blendedBeta(0)(j) == want, s"blend b$j")
    }
  }

  test("empty and partial active sets; per-lambda refits along a path") {
    val db = SparkSpec.binaryDF(spark)
    // explicit grid: 10.0 guarantees an empty active set, the tail is
    // dense enough for a df == 1 transition point
    val params = SgdNetParams(family = "binomial", alpha = 1.0,
      lambda = Array(10.0, 0.3, 0.15, 0.08, 0.05, 0.02, 0.01),
      thresh = 1e-9, maxit = 100000)
    val rp = SgdNet.relaxedFit(db, Seq("x1", "x2"), "y", params, gamma = 0.0)
    val dfs = rp.model.df
    assert(dfs(0) == 0, "the large-lambda point is the null")
    val pbar = db.agg(avg(col("y"))).head().getDouble(0)
    assert(math.abs(rp.olsA0(0) - math.log(pbar / (1 - pbar))) < 1e-9,
      "empty active set refits to logit(ybar)")
    assert(rp.olsBeta(0).forall(_ == 0.0))
    // a df == 1 point (if the path has one): refit == single-feature MLE
    val l1 = dfs.indexWhere(_ == 1)
    if (l1 >= 0) {
      val j = (0 until 2).find(rp.model.beta(l1)(0)(_) != 0.0).get
      val lr = new org.apache.spark.ml.classification.LogisticRegression()
        .setRegParam(0.0).setFitIntercept(true).setTol(1e-10).setMaxIter(300)
        .setFeaturesCol("fv").setLabelCol("y")
        .fit(assembled(db, Array(Seq("x1", "x2")(j))))
      assert(math.abs(rp.olsA0(l1) - lr.intercept) < 1e-4, "partial a0")
      assert(math.abs(rp.olsBeta(l1)(j) - lr.coefficients(0)) < 1e-4,
        "partial beta")
      assert(rp.olsBeta(l1).zipWithIndex.filter(_._2 != j).forall(_._1 == 0.0),
        "inactive stays zero")
    }
    // identical active sets share the same refit (path tail)
    val lLast = dfs.length - 1
    if (dfs(lLast) == 2 && dfs(lLast - 1) == 2)
      for (j <- 0 until 2)
        assert(math.abs(rp.olsBeta(lLast)(j) - rp.olsBeta(lLast - 1)(j)) < 1e-6,
          "same active set -> same refit")
    intercept[IllegalArgumentException] {
      SgdNet.relaxedFitGlm(db, Seq("x1"), "y", SgdNetParams())
    }
    ()
  }

  test("sparse GLM relaxed fit == dense (binomial, poisson; paths)") {
    val db = SparkSpec.binaryDF(spark)
      .withColumn("sidx", array(lit(0), lit(1)))
      .withColumn("svals", array(col("x1"), col("x2")))
    val pb = SgdNetParams(family = "binomial", alpha = 1.0,
      lambda = Array(0.3, 0.05, 0.01), thresh = 1e-9, maxit = 100000)
    val d = SgdNet.relaxedFitGlm(db, Seq("x1", "x2"), "y", pb, gamma = 0.25)
    val s = SgdNet.relaxedFitGlmSparse(db, "sidx", "svals", 2, "y", pb,
      gamma = 0.25)
    for (l <- 0 until 3) {
      assert(math.abs(s.olsA0(l) - d.olsA0(l)) < 1e-6, s"ols a0($l)")
      for (j <- 0 until 2) {
        assert(math.abs(s.olsBeta(l)(j) - d.olsBeta(l)(j)) < 1e-6,
          s"ols beta($l)($j)")
        assert(math.abs(s.blendedBeta(l)(j) - d.blendedBeta(l)(j)) < 1e-6,
          s"blend($l)($j)")
      }
    }
    // poisson with a data-derived path
    val dp = SparkSpec.regressionDF(spark)
      .withColumn("yp", ceil(abs(col("y"))).cast("double"))
      .withColumn("sidx", array(lit(0), lit(1)))
      .withColumn("svals", array(col("x1"), col("x2")))
    val pp = SgdNetParams(family = "poisson", alpha = 1.0, nlambda = 5,
      thresh = 1e-9, maxit = 100000)
    val dpp = SgdNet.relaxedFitGlm(dp, Seq("x1", "x2"), "yp", pp)
    val spp = SgdNet.relaxedFitGlmSparse(dp, "sidx", "svals", 2, "yp", pp)
    assert(spp.model.lambda.zip(dpp.model.lambda).forall { case (a, b) =>
      math.abs(a - b) < 1e-9 * b }, "lambda path")
    // the lambda_max point sits EXACTLY on the soft-threshold boundary,
    // so an ulp of moment-order difference can flip a ~1e-17
    // coefficient between active and not (changing that point's refit
    // between null and single-feature MLE — inherent to the path
    // definition, glmnet shares the edge). Compare refits only where
    // the two routes agree on the active set; they must agree past the
    // knife-edge point.
    var compared = 0
    for (l <- 0 until 5) {
      val aD = (0 until 2).filter(j => dpp.model.beta(l)(0)(j) != 0.0)
      val aS = (0 until 2).filter(j => spp.model.beta(l)(0)(j) != 0.0)
      if (l > 0) assert(aD == aS, s"active set($l): $aD vs $aS")
      if (aD == aS) {
        compared += 1
        for (j <- 0 until 2)
          assert(math.abs(spp.olsBeta(l)(j) - dpp.olsBeta(l)(j)) < 1e-6,
            s"poisson ols($l)($j)")
      }
    }
    assert(compared >= 4, "parity must cover the path tail")
    intercept[IllegalArgumentException] {
      SgdNet.relaxedFitGlmSparse(db, "sidx", "svals", 2, "y", SgdNetParams())
    }
    ()
  }
}
