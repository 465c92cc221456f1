package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Observation weights for the IRLS families (glmnet `weights` with
  * family = binomial / poisson): the weighted fit must reproduce row
  * duplication exactly for integer weights, drop zero-weight rows, and
  * land on the closed-form intercept-only MLE when the penalty kills
  * every coefficient (reference weights semantics, R/sgdnet.R:18-100
  * parameter mapping). */
class WeightedGlmSpec extends SparkSpec {
  import spark.implicits._

  private def countData = {
    val rnd = new scala.util.Random(23)
    (1 to 500).map { _ =>
      val x1 = rnd.nextGaussian()
      val mu = math.exp(0.4 + 0.5 * x1)
      // deterministic count response around the log-linear mean
      val y = math.max(0L, math.round(mu + rnd.nextGaussian() * math.sqrt(mu)))
      (x1, y.toDouble)
    }.toDF("x1", "y")
  }

  test("binomial: unit weights == unweighted fit; integer weights == row duplication") {
    val df = SparkSpec.binaryDF(spark)
    val p = SgdNetParams(family = "binomial", lambda = Array(0.01),
      thresh = 1e-10, maxit = 100000)
    val unw = SgdNet.fit(df, Seq("x1", "x2"), "y", p)
    val w1 = SgdNet.fitWeighted(df.withColumn("w", lit(1.0)),
      Seq("x1", "x2"), "y", "w", p)
    for (j <- 0 until 2)
      assert(math.abs(unw.beta(0)(0)(j) - w1.beta(0)(0)(j)) < 1e-7, s"b_$j")
    assert(math.abs(unw.a0(0)(0) - w1.a0(0)(0)) < 1e-7)

    // integer weights {1,2,3} == physically duplicated rows: identical
    // IRLS moments, identical objective (weights normalize to sum to n,
    // so lambda means the same thing in both fits)
    val wdf = df.withColumn("w",
      (pmod(round(col("x1") * 100).cast("long"), lit(3)) + 1).cast("double"))
    val dup = wdf.withColumn("k",
        explode(sequence(lit(1), col("w").cast("int"))))
      .drop("k")
    val mw = SgdNet.fitWeighted(wdf, Seq("x1", "x2"), "y", "w", p)
    val md = SgdNet.fit(dup, Seq("x1", "x2"), "y", p)
    for (j <- 0 until 2)
      assert(math.abs(mw.beta(0)(0)(j) - md.beta(0)(0)(j)) < 1e-6,
        s"beta_$j: ${mw.beta(0)(0)(j)} vs ${md.beta(0)(0)(j)}")
    assert(math.abs(mw.a0(0)(0) - md.a0(0)(0)) < 1e-5)
    assert(math.abs(mw.nulldev / mw.nobs - md.nulldev / md.nobs) < 1e-6)
  }

  test("poisson: integer weights == row duplication; weighted deviance matches") {
    val df = countData
    val p = SgdNetParams(family = "poisson", lambda = Array(0.01),
      thresh = 1e-10, maxit = 100000)
    val wdf = df.withColumn("w",
      (pmod(round(col("x1") * 100).cast("long"), lit(3)) + 1).cast("double"))
    val dup = wdf.withColumn("k",
        explode(sequence(lit(1), col("w").cast("int"))))
      .drop("k")
    val mw = SgdNet.fitWeighted(wdf, Seq("x1"), "y", "w", p)
    val md = SgdNet.fit(dup, Seq("x1"), "y", p)
    assert(math.abs(mw.beta(0)(0)(0) - md.beta(0)(0)(0)) < 1e-6,
      s"${mw.beta(0)(0)(0)} vs ${md.beta(0)(0)(0)}")
    assert(math.abs(mw.a0(0)(0) - md.a0(0)(0)) < 1e-5)
    assert(math.abs(mw.devRatio(0) - md.devRatio(0)) < 1e-6)
  }

  test("binomial: zero weights drop the observation") {
    val df = SparkSpec.binaryDF(spark)
    val p = SgdNetParams(family = "binomial", lambda = Array(0.01),
      thresh = 1e-10, maxit = 100000)
    val w01 = df.withColumn("w",
      pmod(round(col("x2") * 100).cast("long"), lit(2)).cast("double"))
    val mz = SgdNet.fitWeighted(w01, Seq("x1", "x2"), "y", "w", p)
    val mf = SgdNet.fit(w01.filter(col("w") > 0), Seq("x1", "x2"), "y", p)
    for (j <- 0 until 2)
      assert(math.abs(mz.beta(0)(0)(j) - mf.beta(0)(0)(j)) < 1e-7, s"b_$j")
    assert(math.abs(mz.a0(0)(0) - mf.a0(0)(0)) < 1e-7)
  }

  test("intercept-only closed forms: a0 = logit / log of the weighted mean") {
    val df = SparkSpec.binaryDF(spark)
      .withColumn("w", (pmod(round(col("x1") * 100).cast("long"), lit(4)) + 1)
        .cast("double"))
    val mb = SgdNet.fitWeighted(df, Seq("x1"), "y", "w",
      SgdNetParams(family = "binomial", lambda = Array(1e6), thresh = 1e-9,
        maxit = 10000))
    val pw = df.agg((sum(col("w") * col("y")) / sum(col("w"))).as("p"))
      .head().getDouble(0)
    assert(mb.beta(0)(0)(0) == 0.0)
    assert(math.abs(mb.a0(0)(0) - math.log(pw / (1 - pw))) < 1e-9)

    val cd = countData.withColumn("w",
      (pmod(round(col("x1") * 100).cast("long"), lit(4)) + 1).cast("double"))
    val mp = SgdNet.fitWeighted(cd, Seq("x1"), "y", "w",
      SgdNetParams(family = "poisson", lambda = Array(1e6), thresh = 1e-9,
        maxit = 10000))
    val yw = cd.agg((sum(col("w") * col("y")) / sum(col("w"))).as("m"))
      .head().getDouble(0)
    assert(mp.beta(0)(0)(0) == 0.0)
    assert(math.abs(mp.a0(0)(0) - math.log(yw)) < 1e-9)
  }

  test("mgaussian: integer weights == row duplication; zero weights drop") {
    val df = SparkSpec.regressionDF(spark)
    val p = SgdNetParams(family = "mgaussian", alpha = 0.5,
      lambda = Array(0.1), thresh = 1e-12, maxit = 100000)
    val wdf = df.withColumn("w",
      (pmod(round(col("y") * 100).cast("long"), lit(3)) + 1).cast("double"))
    val dup = wdf.withColumn("k",
        explode(sequence(lit(1), col("w").cast("int"))))
      .drop("k")
    val mw = SgdNet.fitWeightedMulti(wdf, Seq("x1", "x2"), Seq("y", "x3"),
      "w", p)
    val md = SgdNet.fitMulti(dup, Seq("x1", "x2"), Seq("y", "x3"), p)
    for (t <- 0 until 2; j <- 0 until 2)
      assert(math.abs(mw.beta(0)(t)(j) - md.beta(0)(t)(j)) < 1e-8,
        s"beta($t)($j)")
    for (t <- 0 until 2)
      assert(math.abs(mw.a0(0)(t) - md.a0(0)(t)) < 1e-6)
    // zero weights drop the observation
    val w01 = df.withColumn("w",
      pmod(round(col("x1") * 100).cast("long"), lit(2)).cast("double"))
    val mz = SgdNet.fitWeightedMulti(w01, Seq("x1", "x2"), Seq("y", "x3"),
      "w", p)
    val mf = SgdNet.fitMulti(w01.filter(col("w") > 0), Seq("x1", "x2"),
      Seq("y", "x3"), p)
    for (t <- 0 until 2; j <- 0 until 2)
      assert(math.abs(mz.beta(0)(t)(j) - mf.beta(0)(t)(j)) < 1e-9)
    // family contract
    intercept[IllegalArgumentException] {
      SgdNet.fitWeightedMulti(w01, Seq("x1"), Seq("y"), "w",
        SgdNetParams(family = "binomial"))
    }
    ()
  }

  test("weighted CV: unit weights match the unweighted moment-route CV; " +
    "integer weights equal row duplication") {
    val df = SparkSpec.regressionDF(spark)
    val lambdas = Array(2.0, 0.5, 0.1)
    val params = SgdNetParams(alpha = 0.0, lambda = lambdas,
      thresh = 1e-11, maxit = 100000)
    val fold = pmod(xxhash64(col("x1"), col("x2"), col("y")), lit(3))
    val w1 = df.withColumn("w", lit(1.0))
    val cvW = CvSgdNet.fitWeighted(w1, Seq("x1", "x2"), "y", "w", params,
      nfolds = 3, measure = "mse", foldCol = fold)
    val cvU = CvSgdNet.fit(df, Seq("x1", "x2"), Seq("y"), params,
      nfolds = 3, measure = "mse", foldCol = fold)
    for (l <- lambdas.indices)
      assert(math.abs(cvW.best.cvm(l) - cvU.best.cvm(l)) <
        1e-6 * math.max(1.0, cvU.best.cvm(l)), s"cvm($l)")
    // integer weights == physically duplicated rows: duplicated rows
    // hash to the SAME content fold, so the whole CV curve must agree
    val wdf = df.withColumn("w",
      (pmod(round(col("y") * 100).cast("long"), lit(3)) + 1).cast("double"))
    val dup = wdf.withColumn("k",
        explode(sequence(lit(1), col("w").cast("int"))))
      .drop("k")
    val foldW = pmod(xxhash64(col("x1"), col("x2"), col("y")), lit(3))
    val cvI = CvSgdNet.fitWeighted(wdf, Seq("x1", "x2"), "y", "w", params,
      nfolds = 3, measure = "mse", foldCol = foldW)
    val cvD = CvSgdNet.fit(dup, Seq("x1", "x2"), Seq("y"), params,
      nfolds = 3, measure = "mse", foldCol = foldW)
    for (l <- lambdas.indices)
      assert(math.abs(cvI.best.cvm(l) - cvD.best.cvm(l)) <
        1e-5 * math.max(1.0, cvD.best.cvm(l)),
        s"cvm($l): ${cvI.best.cvm(l)} vs ${cvD.best.cvm(l)}")
    assert(cvI.best.lambdaMin === cvD.best.lambdaMin)
    // measure contract
    intercept[IllegalArgumentException] {
      CvSgdNet.fitWeighted(w1, Seq("x1"), "y", "w", params, nfolds = 3,
        measure = "auc")
    }
    ()
  }

  test("pf = 0 with box limits: lambda_max projection respects a binding bound") {
    // one unpenalized coordinate (pf=0) under a non-negative bound whose
    // unconstrained sub-fit coefficient would be NEGATIVE: the projected
    // lambda_max must come from the BOUNDED sub-fit (beta_1 clipped to 0),
    // i.e. equal the plain null-model lambda_max of the penalized coords
    val rnd = new scala.util.Random(31)
    val df = (1 to 400).map { _ =>
      val x1 = rnd.nextGaussian(); val x2 = rnd.nextGaussian()
      val eta = 0.3 - 1.2 * x1 + 0.8 * x2
      val y = if (1.0 / (1.0 + math.exp(-eta)) > rnd.nextDouble()) 1.0 else 0.0
      (x1, x2, y, 1.0)
    }.toDF("x1", "x2", "y", "w")
    val bounded = SgdNet.fitWeighted(df, Seq("x1", "x2"), "y", "w",
      SgdNetParams(family = "binomial", nlambda = 3,
        penaltyFactor = Array(0.0, 1.0), lowerLimits = Array(0.0, 0.0),
        thresh = 1e-9, maxit = 10000))
    // x1's true effect is negative, the bound clips it to 0 — so the
    // sub-fit IS the null model and beta_2 must be zero at lambda_max
    assert(bounded.beta(0)(0)(0) == 0.0)
    assert(math.abs(bounded.beta(0)(0)(1)) < 1e-8,
      s"penalized coef at lambda_max: ${bounded.beta(0)(0)(1)}")
  }

  test("weighted completeness sweep (round 15): relaxedFitWeighted, " +
    "refitWeighted, sgdnetCompat + weights, exclude + weights") {
    val df = SparkSpec.regressionDF(spark)
    val lambdas = Array(1.0, 0.2)
    val params = SgdNetParams(alpha = 1.0, lambda = lambdas,
      thresh = 1e-11, maxit = 100000)
    val wdf = df.withColumn("w",
      (pmod(round(col("y") * 100).cast("long"), lit(3)) + 1).cast("double"))
    val dup = wdf.withColumn("k",
        explode(sequence(lit(1), col("w").cast("int")))).drop("k")
    // relaxed: unit weights == unweighted; integer weights == duplication
    val rUnw = SgdNet.relaxedFit(df, Seq("x1", "x2", "x3"), "y", params, 0.0)
    val rW1 = SgdNet.relaxedFitWeighted(df.withColumn("w", lit(1.0)),
      Seq("x1", "x2", "x3"), "y", "w", params, 0.0)
    val rWI = SgdNet.relaxedFitWeighted(wdf, Seq("x1", "x2", "x3"), "y", "w",
      params, 0.0)
    val rDup = SgdNet.relaxedFit(dup, Seq("x1", "x2", "x3"), "y", params, 0.0)
    for (l <- lambdas.indices; j <- 0 until 3) {
      assert(math.abs(rW1.olsBeta(l)(j) - rUnw.olsBeta(l)(j)) < 1e-9, s"unit $l $j")
      assert(math.abs(rWI.olsBeta(l)(j) - rDup.olsBeta(l)(j)) < 1e-8, s"dup $l $j")
    }
    assert(math.abs(rWI.olsA0(0) - rDup.olsA0(0)) < 1e-8)
    // refitWeighted: merged grid, each lambda equals a direct weighted
    // fit on the same grid
    val base = SgdNet.fitWeighted(wdf, Seq("x1", "x2"), "y", "w", params)
    val re = SgdNet.refitWeighted(base, wdf, "w", Seq(0.5))
    assert(re.lambda.toSeq == Seq(1.0, 0.5, 0.2))
    val direct = SgdNet.fitWeighted(wdf, Seq("x1", "x2"), "y", "w",
      params.copy(lambda = Array(1.0, 0.5, 0.2)))
    for (l <- 0 until 3; j <- 0 until 2)
      assert(math.abs(re.beta(l)(0)(j) - direct.beta(l)(0)(j)) < 1e-9)
    // sgdnetCompat applies on the weighted moments: integer weights ==
    // duplication under compat's 1/sd_pop(y) L2 rescale (ridge so the
    // L2 term is actually exercised)
    val compat = SgdNetParams(alpha = 0.0, lambda = Array(2.0),
      sgdnetCompat = true, thresh = 1e-11, maxit = 100000)
    val cW = SgdNet.fitWeighted(wdf, Seq("x1", "x2"), "y", "w", compat)
    val cD = SgdNet.fit(dup, Seq("x1", "x2"), "y", compat)
    for (j <- 0 until 2)
      assert(math.abs(cW.beta(0)(0)(j) - cD.beta(0)(0)(j)) < 1e-8, s"compat $j")
    // exclude (limit arrays) + weights: the excluded coefficient is
    // forced out of the WEIGHTED fit at every lambda
    val (lo, up) = SgdNet.excludeLimits(2, Seq(1))
    val ex = SgdNet.fitWeighted(wdf, Seq("x1", "x2"), "y", "w",
      params.copy(lowerLimits = lo, upperLimits = up))
    for (l <- lambdas.indices) {
      assert(ex.beta(l)(0)(1) == 0.0, s"excluded coef at lambda $l")
      assert(math.abs(ex.beta(l)(0)(0)) > 0.0)
    }
    ()
  }

  test("weighted KKT optimality: gaussian and binomial weighted fits " +
    "satisfy the v-weighted elastic-net stationarity conditions") {
    // the SolverPropertySpec discipline at the FIT level: for the
    // weighted objective 1/(2n)Σvn·loss + λ[(1−α)/2‖β_std‖² + α‖β_std‖₁]
    // the returned coefficients must satisfy, per standardized coord,
    //   active:  g_j + λ(1−α)β_std_j = −λα·sign(β_std_j)
    //   zero:    |g_j| ≤ λα
    // with g_j the v-weighted loss gradient — verified driver-side from
    // the collected rows, independent of the solver's own arithmetic.
    val rnd = new scala.util.Random(61)
    val data = (1 to 400).map { _ =>
      val x1 = rnd.nextGaussian(); val x2 = rnd.nextGaussian() * 2
      val x3 = rnd.nextGaussian()
      val yg = 1.0 + 0.8 * x1 - 0.5 * x2 + rnd.nextGaussian() * 0.3
      val pb = 1.0 / (1.0 + math.exp(-(0.4 * x1 - 0.6 * x2)))
      val yb = if (rnd.nextDouble() < pb) 1.0 else 0.0
      val w = (1 + rnd.nextInt(4)).toDouble
      (x1, x2, x3, yg, yb, w)
    }
    val df = data.toDF("x1", "x2", "x3", "yg", "yb", "w")
    val n = data.size
    val wsum = data.map(_._6).sum
    val norm = n / wsum
    val vn = data.map(_._6 * norm)
    val xs0 = data.map(r => Array(r._1, r._2, r._3))
    def wmean(v: Seq[Double]) = v.zip(vn).map { case (a, b) => a * b }.sum / n
    val mx = (0 until 3).map(j => wmean(xs0.map(_(j))))
    val sd = (0 until 3).map(j =>
      math.sqrt(wmean(xs0.map(x => x(j) * x(j))) - mx(j) * mx(j)))
    val xs = xs0.map(x => Array.tabulate(3)(j => (x(j) - mx(j)) / sd(j)))
    for ((family, label, alpha, lam) <- Seq(
        ("gaussian", "yg", 0.7, 0.08), ("gaussian", "yg", 1.0, 0.3),
        ("binomial", "yb", 0.8, 0.02))) {
      val m = SgdNet.fitWeighted(df, Seq("x1", "x2", "x3"), label, "w",
        SgdNetParams(family = family, alpha = alpha, lambda = Array(lam),
          thresh = 1e-11, maxit = 200000))
      val bOrig = (0 until 3).map(j => m.beta(0)(0)(j))
      val bStd = (0 until 3).map(j => bOrig(j) * sd(j))
      val a0 = m.a0(0)(0)
      val grad = (0 until 3).map { j =>
        data.indices.map { i =>
          val eta = a0 + (0 until 3).map(k2 => bOrig(k2) * xs0(i)(k2)).sum
          val resid =
            if (family == "gaussian") eta - data(i)._4
            else 1.0 / (1.0 + math.exp(-eta)) - data(i)._5
          vn(i) * xs(i)(j) * resid
        }.sum / n
      }
      for (j <- 0 until 3) {
        if (bStd(j) == 0.0)
          assert(math.abs(grad(j)) <= lam * alpha + 1e-6,
            s"$family zero-coef KKT j=$j: |${grad(j)}| > ${lam * alpha}")
        else
          assert(math.abs(grad(j) + lam * (1 - alpha) * bStd(j) +
            lam * alpha * math.signum(bStd(j))) < 1e-6,
            s"$family active-coef KKT j=$j")
      }
    }
    ()
  }

  test("offset + weights (glmnet offset= with weights=): unit weights == " +
    "unweighted offset fit; integer weights == duplicated rows") {
    // poisson rate model: y ~ exp(offset + a0 + b x)
    val rnd = new scala.util.Random(41)
    val df = (1 to 400).map { _ =>
      val x1 = rnd.nextGaussian()
      val off = math.log(1.0 + rnd.nextInt(4)) // ln(exposure)
      val mu = math.exp(off + 0.3 + 0.4 * x1)
      val y = math.max(0L, math.round(mu + rnd.nextGaussian() * math.sqrt(mu)))
      (x1, off, y.toDouble)
    }.toDF("x1", "off", "y")
    val params = SgdNetParams(family = "poisson", alpha = 1.0,
      lambda = Array(0.05, 0.01), thresh = 1e-10, maxit = 100000)
    val unw = SgdNet.fitWithOffset(df, Seq("x1"), "y", "off", params)
    val w1 = SgdNet.fitWithOffsetWeighted(df.withColumn("w", lit(1.0)),
      Seq("x1"), "y", "off", "w", params)
    // same arithmetic modulo treeAggregate merge order — tight
    // tolerance, not bitwise (last-ulp wobble between runs)
    for (l <- 0 until 2) {
      assert(math.abs(w1.beta(l)(0)(0) - unw.beta(l)(0)(0)) < 1e-12,
        s"unit beta($l)")
      assert(math.abs(w1.a0(l)(0) - unw.a0(l)(0)) < 1e-12, s"unit a0($l)")
    }
    val wdf = df.withColumn("w",
      (pmod(round(col("x1") * 100).cast("long"), lit(3)) + 1).cast("double"))
    val dup = wdf.withColumn("k",
        explode(sequence(lit(1), col("w").cast("int")))).drop("k")
    val wI = SgdNet.fitWithOffsetWeighted(wdf, Seq("x1"), "y", "off", "w",
      params)
    val dupFit = SgdNet.fitWithOffset(dup, Seq("x1"), "y", "off", params)
    for (l <- 0 until 2) {
      assert(math.abs(wI.beta(l)(0)(0) - dupFit.beta(l)(0)(0)) < 1e-8,
        s"dup beta($l): ${wI.beta(l)(0)(0)} vs ${dupFit.beta(l)(0)(0)}")
      assert(math.abs(wI.a0(l)(0) - dupFit.a0(l)(0)) < 1e-8, s"dup a0($l)")
    }
    // gaussian reduction: offset+weights == weighted fit of y - off
    val gdf = SparkSpec.regressionDF(spark)
      .withColumn("off", col("x3") * 10)
      .withColumn("w",
        (pmod(round(col("y") * 100).cast("long"), lit(3)) + 1).cast("double"))
    val gp = SgdNetParams(alpha = 0.0, lambda = Array(1.0), thresh = 1e-11,
      maxit = 100000)
    val go = SgdNet.fitWithOffsetWeighted(gdf, Seq("x1", "x2"), "y", "off",
      "w", gp)
    val gm = SgdNet.fitWeighted(
      gdf.withColumn("y2", col("y") - col("off")),
      Seq("x1", "x2"), "y2", "w", gp)
    for (j <- 0 until 2)
      assert(math.abs(go.beta(0)(0)(j) - gm.beta(0)(0)(j)) < 1e-12)
    ()
  }

  test("sparse + weights: fitSparseWeighted matches the weighted DENSE " +
    "fit for gaussian, binomial, multinomial; unit weights == fitSparse") {
    val rnd = new scala.util.Random(9)
    val rows = (1 to 400).map { i =>
      val dense = Array.tabulate(4)(_ =>
        if (rnd.nextDouble() < 0.4) rnd.nextGaussian() else 0.0)
      val yg = 1.0 + dense(0) * 0.8 - dense(2) * 0.5 + rnd.nextGaussian() * 0.1
      val eta = -0.3 + dense(0) * 1.2 - dense(1) * 0.8
      val yb = if (rnd.nextDouble() < 1.0 / (1.0 + math.exp(-eta))) 1.0 else 0.0
      val yc = s"c${i % 3}"
      val w = (i % 3 + 1).toDouble
      val idx = dense.indices.filter(dense(_) != 0.0).toArray
      (idx, idx.map(dense), dense.toSeq, yg, yb, yc, w)
    }
    val sp = rows.map(r => (r._1, r._2, r._4, r._5, r._6, r._7))
      .toDF("idx", "vals", "yg", "yb", "yc", "w")
    val dn = rows.map(r => (r._3(0), r._3(1), r._3(2), r._3(3), r._4, r._5,
        r._6, r._7))
      .toDF("V0", "V1", "V2", "V3", "yg", "yb", "yc", "w")
    val feats = (0 until 4).map(j => s"V$j")
    // gaussian
    val pg = SgdNetParams(alpha = 0.5, lambda = Array(0.1, 0.02),
      thresh = 1e-10, maxit = 100000)
    val sg = SgdNet.fitSparseWeighted(sp, "idx", "vals", 4, "yg", "w", pg)
    val dg = SgdNet.fitWeighted(dn, feats, "yg", "w", pg)
    for (l <- 0 until 2; j <- 0 until 4)
      assert(math.abs(sg.beta(l)(0)(j) - dg.beta(l)(0)(j)) < 1e-9,
        s"gauss sparse/dense b($l)($j)")
    // binomial
    val pb = SgdNetParams(family = "binomial", alpha = 0.5,
      lambda = Array(0.05, 0.01), thresh = 1e-8, maxit = 100000)
    val sb = SgdNet.fitSparseWeighted(sp, "idx", "vals", 4, "yb", "w", pb)
    val db = SgdNet.fitWeighted(dn, feats, "yb", "w", pb)
    for (l <- 0 until 2; j <- 0 until 4)
      assert(math.abs(sb.beta(l)(0)(j) - db.beta(l)(0)(j)) < 1e-7,
        s"binom sparse/dense b($l)($j): ${sb.beta(l)(0)(j)} vs ${db.beta(l)(0)(j)}")
    // multinomial
    val pm = SgdNetParams(family = "multinomial", alpha = 1.0,
      lambda = Array(0.02), thresh = 1e-7, maxit = 5000)
    val sm = SgdNet.fitSparseWeighted(sp, "idx", "vals", 4, "yc", "w", pm)
    val dm = SgdNet.fitWeighted(dn, feats, "yc", "w", pm)
    for (t <- 0 until 3; j <- 0 until 4)
      assert(math.abs(sm.beta(0)(t)(j) - dm.beta(0)(t)(j)) < 1e-6,
        s"multinom sparse/dense b($t)($j)")
    // unit weights through the weighted sparse route == plain fitSparse
    val sp1 = sp.withColumn("w1", lit(1.0))
    val su = SgdNet.fitSparseWeighted(sp1, "idx", "vals", 4, "yg", "w1", pg)
    val s0 = SgdNet.fitSparse(sp, "idx", "vals", 4, "yg", pg)
    // same arithmetic modulo treeAggregate merge order (last-ulp wobble
    // between runs) — tolerance, not bitwise
    for (l <- 0 until 2; j <- 0 until 4)
      assert(math.abs(su.beta(l)(0)(j) - s0.beta(l)(0)(j)) < 1e-12,
        s"unit b($l)($j)")
    ()
  }
}
