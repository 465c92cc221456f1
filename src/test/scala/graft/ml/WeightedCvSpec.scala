package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Shared-pass WEIGHTED cross-validation (round 15): every family's
  * weighted CV now rides the fused machinery (gaussian/mgaussian
  * one-pass raw-v moments with per-fold renormalization; binomial/
  * poisson shared IRLS with v·norm_f working weights). These specs pin
  * the routes three ways: (a) shared == the k+1-fit generic route
  * ([[CvSgdNet.cvWeightedGeneric]], the pre-round-15 parity reference),
  * (b) unit weights == the unweighted shared CV, (c) integer weights ==
  * physically duplicated rows — including for the v-weighted AUC rank
  * statistic, whose continuous-mass formula must collapse to the
  * integer-rank one on integer mass. */
class WeightedCvSpec extends SparkSpec {
  import spark.implicits._

  private val lambdas = Array(1.0, 0.25, 0.05)

  private def assertCurvesClose(a: CvSgdNet.CvPath, b: CvSgdNet.CvPath,
                                tol: Double, tag: String): Unit = {
    assert(a.lambda.sameElements(b.lambda), s"$tag lambda grid")
    for (l <- a.lambda.indices) {
      assert(math.abs(a.cvm(l) - b.cvm(l)) <
        tol * math.max(1.0, math.abs(b.cvm(l))), s"$tag cvm($l): ${a.cvm(l)} vs ${b.cvm(l)}")
      assert(math.abs(a.cvsd(l) - b.cvsd(l)) <
        tol * math.max(1.0, math.abs(b.cvsd(l))), s"$tag cvsd($l)")
    }
  }

  test("gaussian: shared one-pass weighted CV == generic k+1-fit route") {
    val df = SparkSpec.regressionDF(spark)
      .withColumn("w", (pmod(round(col("y") * 100).cast("long"), lit(4)) + 1).cast("double"))
    val fold = pmod(xxhash64(col("x1"), col("x2"), col("y")), lit(3))
    for (measure <- Seq("mse", "deviance", "mae")) {
      val params = SgdNetParams(alpha = 0.5, lambda = lambdas,
        thresh = 1e-11, maxit = 100000)
      val shared = CvSgdNet.fitWeighted(df, Seq("x1", "x2"), "y", "w",
        params, nfolds = 3, measure = measure, foldCol = fold)
      val generic = CvSgdNet.cvWeightedGeneric(df, Seq("x1", "x2"), "y", "w",
        params, nfolds = 3, measure = measure, foldCol = fold)
      assertCurvesClose(shared.best, generic.best, 1e-6, s"gaussian/$measure")
    }
  }

  test("binomial: shared weighted CV == generic route; unit weights == " +
    "unweighted shared CV (deviance, class, auc)") {
    val df = SparkSpec.binaryDF(spark)
    val fold = pmod(xxhash64(col("x1"), col("x2"), col("y")), lit(3))
    val lamB = Array(0.05, 0.01, 0.002)
    val params = SgdNetParams(family = "binomial", lambda = lamB,
      thresh = 1e-9, maxit = 100000)
    val wdf = df.withColumn("w",
      (pmod(round(col("x1") * 100).cast("long"), lit(3)) + 1).cast("double"))
    val shared = CvSgdNet.fitWeighted(wdf, Seq("x1", "x2"), "y", "w",
      params, nfolds = 3, measure = "deviance", foldCol = fold)
    val generic = CvSgdNet.cvWeightedGeneric(wdf, Seq("x1", "x2"), "y", "w",
      params, nfolds = 3, measure = "deviance", foldCol = fold)
    assertCurvesClose(shared.best, generic.best, 1e-5, "binomial/deviance")
    // unit weights collapse to the unweighted shared route, for every
    // binomial measure including the weighted-rank auc
    val w1 = df.withColumn("w", lit(1.0))
    for (measure <- Seq("deviance", "class", "auc")) {
      val sw = CvSgdNet.fitWeighted(w1, Seq("x1", "x2"), "y", "w",
        params, nfolds = 3, measure = measure, foldCol = fold)
      val un = CvSgdNet.fit(df, Seq("x1", "x2"), Seq("y"),
        params, nfolds = 3, measure = measure, foldCol = fold)
      assertCurvesClose(sw.best, un.best, 1e-6, s"binomial-unit/$measure")
    }
  }

  test("binomial: integer weights == duplicated rows, auc included " +
    "(continuous-mass rank collapses to integer ranks)") {
    val df = SparkSpec.binaryDF(spark, n = 300)
    val fold = pmod(xxhash64(col("x1"), col("x2"), col("y")), lit(3))
    val lamB = Array(0.05, 0.01, 0.002)
    val params = SgdNetParams(family = "binomial", lambda = lamB,
      thresh = 1e-9, maxit = 100000)
    val wdf = df.withColumn("w",
      (pmod(round(col("x2") * 100).cast("long"), lit(3)) + 1).cast("double"))
    val dup = wdf.withColumn("k",
        explode(sequence(lit(1), col("w").cast("int")))).drop("k")
    for (measure <- Seq("deviance", "auc")) {
      val cvW = CvSgdNet.fitWeighted(wdf, Seq("x1", "x2"), "y", "w",
        params, nfolds = 3, measure = measure, foldCol = fold)
      val cvD = CvSgdNet.fit(dup, Seq("x1", "x2"), Seq("y"),
        params, nfolds = 3, measure = measure, foldCol = fold)
      assertCurvesClose(cvW.best, cvD.best, 1e-5, s"binomial-dup/$measure")
    }
  }

  test("poisson: shared weighted CV == generic route; unit weights == " +
    "unweighted shared CV") {
    val rnd = new scala.util.Random(23)
    val df = (1 to 400).map { _ =>
      val x1 = rnd.nextGaussian()
      val mu = math.exp(0.4 + 0.5 * x1)
      val y = math.max(0L, math.round(mu + rnd.nextGaussian() * math.sqrt(mu)))
      (x1, y.toDouble)
    }.toDF("x1", "y")
    val fold = pmod(xxhash64(col("x1"), col("y")), lit(3))
    val lamP = Array(0.1, 0.02, 0.004)
    val params = SgdNetParams(family = "poisson", lambda = lamP,
      thresh = 1e-9, maxit = 100000)
    val wdf = df.withColumn("w",
      (pmod(round(col("x1") * 100).cast("long"), lit(3)) + 1).cast("double"))
    val shared = CvSgdNet.fitWeighted(wdf, Seq("x1"), "y", "w",
      params, nfolds = 3, measure = "mse", foldCol = fold)
    val generic = CvSgdNet.cvWeightedGeneric(wdf, Seq("x1"), "y", "w",
      params, nfolds = 3, measure = "mse", foldCol = fold)
    assertCurvesClose(shared.best, generic.best, 1e-5, "poisson/mse")
    val w1 = df.withColumn("w", lit(1.0))
    val sw = CvSgdNet.fitWeighted(w1, Seq("x1"), "y", "w",
      params, nfolds = 3, measure = "deviance", foldCol = fold)
    val un = CvSgdNet.fit(df, Seq("x1"), Seq("y"),
      params, nfolds = 3, measure = "deviance", foldCol = fold)
    assertCurvesClose(sw.best, un.best, 1e-6, "poisson-unit/deviance")
  }

  test("mgaussian: weighted CV via fitWeightedMulti — unit weights == " +
    "unweighted one-pass CV; integer weights == duplicated rows") {
    val df = SparkSpec.regressionDF(spark)
    val fold = pmod(xxhash64(col("x1"), col("x2"), col("y"), col("x3")), lit(3))
    val params = SgdNetParams(family = "mgaussian", lambda = lambdas,
      thresh = 1e-11, maxit = 100000)
    val w1 = df.withColumn("w", lit(1.0))
    val sw = CvSgdNet.fitWeightedMulti(w1, Seq("x1", "x2"), Seq("y", "x3"),
      "w", params, nfolds = 3, measure = "mse", foldCol = fold)
    val un = CvSgdNet.fit(df, Seq("x1", "x2"), Seq("y", "x3"),
      params, nfolds = 3, measure = "mse", foldCol = fold)
    assertCurvesClose(sw.best, un.best, 1e-6, "mgauss-unit/mse")
    val wdf = df.withColumn("w",
      (pmod(round(col("y") * 100).cast("long"), lit(3)) + 1).cast("double"))
    val dup = wdf.withColumn("k",
        explode(sequence(lit(1), col("w").cast("int")))).drop("k")
    val cvW = CvSgdNet.fitWeightedMulti(wdf, Seq("x1", "x2"), Seq("y", "x3"),
      "w", params, nfolds = 3, measure = "mse", foldCol = fold)
    val cvD = CvSgdNet.fit(dup, Seq("x1", "x2"), Seq("y", "x3"),
      params, nfolds = 3, measure = "mse", foldCol = fold)
    assertCurvesClose(cvW.best, cvD.best, 1e-5, "mgauss-dup/mse")
  }

  test("weighted CV alpha grid: one stats pass serves every alpha; each " +
    "path equals its single-alpha call") {
    val df = SparkSpec.regressionDF(spark)
      .withColumn("w", (pmod(round(col("x1") * 100).cast("long"), lit(3)) + 1).cast("double"))
    val fold = pmod(xxhash64(col("x1"), col("x2"), col("y")), lit(3))
    val params = SgdNetParams(lambda = lambdas, thresh = 1e-11, maxit = 100000)
    val grid = CvSgdNet.fitWeighted(df, Seq("x1", "x2"), "y", "w",
      params, nfolds = 3, measure = "mse", foldCol = fold,
      alphas = Seq(0.0, 1.0))
    assert(grid.paths.size == 2)
    for ((a, i) <- Seq(0.0, 1.0).zipWithIndex) {
      val single = CvSgdNet.fitWeighted(df, Seq("x1", "x2"), "y", "w",
        params.copy(alpha = a), nfolds = 3, measure = "mse", foldCol = fold)
      assertCurvesClose(grid.paths(i), single.best, 1e-12, s"alpha=$a")
    }
    // best path minimizes cvm across the grid
    assert(grid.best.cvm.min == grid.paths.map(_.cvm.min).min)
  }

  test("multinomial: weighted fit + shared weighted CV — unit weights == " +
    "unweighted; integer weights == duplicated rows") {
    val df = SparkSpec.multiclassDF(spark, n = 450)
    val fold = pmod(xxhash64(col("x1"), col("x2"), col("cls")), lit(3))
    val lamM = Array(0.05, 0.01)
    val params = SgdNetParams(family = "multinomial", lambda = lamM,
      thresh = 1e-7, maxit = 5000)
    // fit: unit weights == unweighted; integer weights == duplication
    val w1 = df.withColumn("w", lit(1.0))
    val fUnw = SgdNet.fit(df, Seq("x1", "x2"), "cls", params)
    val fW1 = SgdNet.fitWeighted(w1, Seq("x1", "x2"), "cls", "w", params)
    for (l <- lamM.indices; t <- 0 until 3; j <- 0 until 2)
      assert(math.abs(fW1.beta(l)(t)(j) - fUnw.beta(l)(t)(j)) < 1e-7,
        s"fit unit b($l)($t)($j)")
    val wdf = df.withColumn("w",
      (pmod(round(col("x1") * 100).cast("long"), lit(3)) + 1).cast("double"))
    val dup = wdf.withColumn("k",
        explode(sequence(lit(1), col("w").cast("int")))).drop("k")
    val fWI = SgdNet.fitWeighted(wdf, Seq("x1", "x2"), "cls", "w", params)
    val fDup = SgdNet.fit(dup, Seq("x1", "x2"), "cls", params)
    for (l <- lamM.indices; t <- 0 until 3; j <- 0 until 2)
      assert(math.abs(fWI.beta(l)(t)(j) - fDup.beta(l)(t)(j)) < 1e-5,
        s"fit dup b($l)($t)($j): ${fWI.beta(l)(t)(j)} vs ${fDup.beta(l)(t)(j)}")
    // CV: unit weights == unweighted shared CV; integer == duplication
    for (measure <- Seq("deviance", "class")) {
      val sw = CvSgdNet.fitWeighted(w1, Seq("x1", "x2"), "cls", "w",
        params, nfolds = 3, measure = measure, foldCol = fold)
      val un = CvSgdNet.fit(df, Seq("x1", "x2"), Seq("cls"),
        params, nfolds = 3, measure = measure, foldCol = fold)
      assertCurvesClose(sw.best, un.best, 1e-6, s"multinom-unit/$measure")
    }
    val cvI = CvSgdNet.fitWeighted(wdf, Seq("x1", "x2"), "cls", "w",
      params, nfolds = 3, measure = "deviance", foldCol = fold)
    val cvD = CvSgdNet.fit(dup, Seq("x1", "x2"), Seq("cls"),
      params, nfolds = 3, measure = "deviance", foldCol = fold)
    assertCurvesClose(cvI.best, cvD.best, 1e-4, "multinom-dup/deviance")
  }

  test("weighted CV contracts: auc rejected off-binomial; zero weights " +
    "drop; non-negative weights enforced") {
    val df = SparkSpec.binaryDF(spark, n = 200).withColumn("w", lit(1.0))
    intercept[IllegalArgumentException] {
      CvSgdNet.fitWeighted(df, Seq("x1"), "y", "w",
        SgdNetParams(family = "poisson"), nfolds = 2, measure = "auc")
    }
    intercept[IllegalArgumentException] {
      CvSgdNet.fitWeighted(df, Seq("x1"), "y", "w",
        SgdNetParams(family = "multinomial"), nfolds = 2, measure = "auc")
    }
    // zero-weight rows drop from training AND scoring: CV on (w ∈ {0,2})
    // equals CV on the w>0 subset with constant weights
    val reg = SparkSpec.regressionDF(spark)
      .withColumn("w", (pmod(round(col("x1") * 100).cast("long"), lit(2)) * 2).cast("double"))
    val fold = pmod(xxhash64(col("x1"), col("x2"), col("y")), lit(3))
    val params = SgdNetParams(alpha = 0.0, lambda = lambdas,
      thresh = 1e-11, maxit = 100000)
    val cvZ = CvSgdNet.fitWeighted(reg, Seq("x1", "x2"), "y", "w",
      params, nfolds = 3, measure = "mse", foldCol = fold)
    val cvS = CvSgdNet.fitWeighted(reg.filter(col("w") > 0),
      Seq("x1", "x2"), "y", "w", params, nfolds = 3, measure = "mse",
      foldCol = fold)
    assertCurvesClose(cvZ.best, cvS.best, 1e-9, "zero-drop")
    val neg = SparkSpec.regressionDF(spark).withColumn("w", lit(-1.0))
    intercept[Exception] {
      CvSgdNet.fitWeighted(neg, Seq("x1", "x2"), "y", "w",
        params, nfolds = 3, measure = "mse", foldCol = fold)
    }
    ()
  }
}
