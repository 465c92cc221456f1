package graft.ml

import graft.SparkSpec

/** glmnet lower.limits / upper.limits box constraints and `exclude`. */
class BoxConstraintsSpec extends SparkSpec {
  import spark.implicits._

  // y correlates with x1 positively and (partialling x1) with x2
  // NEGATIVELY, so the unconstrained OLS has b2 < 0
  private def negData = {
    val rnd = new scala.util.Random(11)
    (1 to 500).map { _ =>
      val x1 = rnd.nextGaussian()
      val x2 = rnd.nextGaussian() * 0.5 + 0.3 * x1
      val y = 2.0 * x1 - 1.5 * x2 + rnd.nextGaussian() * 0.1
      (x1, x2, y)
    }.toDF("x1", "x2", "y")
  }

  test("lowerLimits: non-negative OLS lands on the active-set optimum") {
    val df = negData
    val un = SgdNet.fit(df, Seq("x1", "x2"), "y",
      SgdNetParams(lambda = Array(0.0), thresh = 1e-11, maxit = 100000))
    assert(un.beta(0)(0)(1) < 0)   // constraint will bind
    val m = SgdNet.fit(df, Seq("x1", "x2"), "y",
      SgdNetParams(lambda = Array(0.0), thresh = 1e-11, maxit = 100000,
        lowerLimits = Array(0.0, 0.0)))
    val b = m.beta(0)(0)
    assert(b(1) === 0.0)
    // with x2 out, b1 is the simple regression slope of y on x1
    val st = df.select("x1", "y").collect().map(r =>
      (r.getDouble(0), r.getDouble(1)))
    val mx = st.map(_._1).sum / st.length; val my = st.map(_._2).sum / st.length
    val slope = st.map { case (x, y) => (x - mx) * (y - my) }.sum /
      st.map { case (x, _) => (x - mx) * (x - mx) }.sum
    assert(math.abs(b(0) - slope) < 1e-6)
  }

  test("upperLimits: a binding cap clips the coefficient exactly") {
    val df = negData
    val m = SgdNet.fit(df, Seq("x1", "x2"), "y",
      SgdNetParams(lambda = Array(0.0), thresh = 1e-11, maxit = 100000,
        upperLimits = Array(1.0, Double.PositiveInfinity)))
    assert(m.beta(0)(0)(0) === 1.0)   // true coef ~2 -> cap binds
  }

  test("excludeLimits: forced-out feature is 0 on the whole path, " +
    "others match the refit without it") {
    val df = negData
    val (lo, up) = SgdNet.excludeLimits(2, Seq(1))
    val m = SgdNet.fit(df, Seq("x1", "x2"), "y",
      SgdNetParams(lambda = Array(1.0, 0.1, 0.0), thresh = 1e-11,
        maxit = 100000, lowerLimits = lo, upperLimits = up))
    for (l <- 0 until 3) assert(m.beta(l)(0)(1) === 0.0)
    val without = SgdNet.fit(df, Seq("x1"), "y",
      SgdNetParams(lambda = Array(1.0, 0.1, 0.0), thresh = 1e-11,
        maxit = 100000))
    for (l <- 0 until 3)
      assert(math.abs(m.beta(l)(0)(0) - without.beta(l)(0)(0)) < 1e-6,
        s"lambda idx $l")
  }

  test("binomial: non-negative limits clip the negative coefficient") {
    val rnd = new scala.util.Random(5)
    val df = (1 to 600).map { _ =>
      val x1 = rnd.nextGaussian(); val x2 = rnd.nextGaussian()
      val z = 1.5 * x1 - 2.0 * x2
      val y = if (1.0 / (1.0 + math.exp(-z)) > rnd.nextDouble()) 1.0 else 0.0
      (x1, x2, y)
    }.toDF("x1", "x2", "y")
    val m = SgdNet.fit(df, Seq("x1", "x2"), "y",
      SgdNetParams(family = "binomial", lambda = Array(0.001),
        thresh = 1e-9, maxit = 100000, lowerLimits = Array(0.0, 0.0)))
    assert(m.beta(0)(0)(1) === 0.0)
    assert(m.beta(0)(0)(0) > 0.5)
  }

  test("validation: limits must bracket zero; group paths accept (r16)") {
    val df = negData
    intercept[IllegalArgumentException] {
      SgdNet.fit(df, Seq("x1", "x2"), "y",
        SgdNetParams(lowerLimits = Array(0.5, 0.0)))
    }
    // round 16: the group-penalty paths take the boxed group prox
    // (LinAlg.boxedGroupProx) — fit and CV accept limits and the
    // coefficients respect the box (full coverage: GroupLimitsSpec)
    val mg = SgdNet.fitMulti(df, Seq("x1"), Seq("y", "x2"),
      SgdNetParams(family = "mgaussian", lambda = Array(0.1),
        lowerLimits = Array(0.0)))
    for (t <- 0 until 2) assert(mg.beta(0)(t)(0) >= -1e-12)
    val mc = graft.SparkSpec.multiclassDF(spark)
    val gm = SgdNet.fit(mc, Seq("x1", "x2"), "cls",
      SgdNetParams(family = "multinomial", typeMultinomial = "grouped",
        lambda = Array(0.01), lowerLimits = Array(0.0, 0.0)))
    for (t <- 0 until gm.nResponses; j <- 0 until 2)
      assert(gm.beta(0)(t)(j) >= -1e-12)
    ()
  }

  test("CV with box limits == per-fold bounded refits (gaussian one-pass CV)") {
    import org.apache.spark.sql.functions._
    val df = negData
      .withColumn("f", pmod(xxhash64(col("x1"), col("x2"), col("y")), lit(3)))
    val params = SgdNetParams(alpha = 1.0, lambda = Array(0.5, 0.05, 0.0),
      thresh = 1e-11, maxit = 100000, lowerLimits = Array(0.0, 0.0))
    val cv = CvSgdNet.fit(df, Seq("x1", "x2"), Seq("y"), params,
      nfolds = 3, foldCol = col("f"))
    // manual reference: per-fold bounded refit on the fold's train ROWS
    // (the engine subtracts fold moments — same statistics, other route)
    val cvmRef = Array.ofDim[Double](3, 3)
    for (f <- 0 until 3) {
      val m = SgdNet.fit(df.filter(col("f") =!= f), Seq("x1", "x2"), "y", params)
      for (l <- 0 until 3) {
        val eta = lit(m.a0(l)(0)) + col("x1") * lit(m.beta(l)(0)(0)) +
          col("x2") * lit(m.beta(l)(0)(1))
        cvmRef(f)(l) = df.filter(col("f") === f)
          .agg(avg(pow(col("y") - eta, 2))).head().getDouble(0)
        // the non-negative bound holds on every fold's path point
        assert(m.beta(l)(0)(0) >= 0.0 && m.beta(l)(0)(1) >= 0.0)
      }
    }
    for (l <- 0 until 3) {
      val ref = (0 until 3).map(cvmRef(_)(l)).sum / 3
      assert(math.abs(cv.best.cvm(l) - ref) < 1e-6 * math.max(1.0, ref),
        s"cvm at lambda idx $l: ${cv.best.cvm(l)} vs $ref")
    }
    // the constraint genuinely binds somewhere on the path (x2's
    // unconstrained coefficient is negative on this data)
    assert(cv.best.fit.beta(2)(0)(1) === 0.0)
  }

  test("no-limits fits are unchanged (null fast path)") {
    val df = negData
    val a = SgdNet.fit(df, Seq("x1", "x2"), "y",
      SgdNetParams(lambda = Array(0.5), thresh = 1e-11, maxit = 100000))
    val b = SgdNet.fit(df, Seq("x1", "x2"), "y",
      SgdNetParams(lambda = Array(0.5), thresh = 1e-11, maxit = 100000,
        lowerLimits = Array(Double.NegativeInfinity,
          Double.NegativeInfinity),
        upperLimits = Array(Double.PositiveInfinity,
          Double.PositiveInfinity)))
    for (j <- 0 until 2)
      assert(math.abs(a.beta(0)(0)(j) - b.beta(0)(0)(j)) < 1e-9)
  }

  test("relax + limits: the refit honors the box on every route (round 17)") {
    import org.apache.spark.sql.functions._
    // gaussian: unconstrained refit has b2 < 0; with lowerLimits = 0 the
    // refit must clip it and re-optimize the free coordinate
    val df = negData
    val params = SgdNetParams(alpha = 1.0, lambda = Array(0.1, 0.01),
      thresh = 1e-11, maxit = 100000,
      lowerLimits = Array(0.0, 0.0), upperLimits = null)
    val rp = SgdNet.relaxedFit(df, Seq("x1", "x2"), "y", params, gamma = 0.0)
    for (l <- 0 until 2; j <- 0 until 2)
      assert(rp.olsBeta(l)(j) >= -1e-12, s"refit bound ols($l)($j)")
    // the bound binds (the unbounded refit would be negative), and the
    // free coordinate re-optimizes: compare against the 1-feature OLS
    // of y on x1 alone when b2 is pinned at 0
    val un = SgdNet.relaxedFit(df, Seq("x1", "x2"), "y",
      params.copy(lowerLimits = null), gamma = 0.0)
    assert(un.olsBeta(0)(1) < -0.1, "unbounded refit should be negative")
    val st = df.agg(
      covar_pop(col("x1"), col("y")).as("c1y"),
      var_pop(col("x1")).as("v1")).head
    val b1Pinned = st.getDouble(0) / st.getDouble(1)
    for (l <- 0 until 2 if rp.olsBeta(l)(1) == 0.0 && rp.olsBeta(l)(0) != 0.0)
      assert(math.abs(rp.olsBeta(l)(0) - b1Pinned) < 1e-6,
        s"free coord re-optimizes at l=$l: ${rp.olsBeta(l)(0)} vs $b1Pinned")
    // non-binding limits == unbounded refit (CD route vs exact solve)
    val loose = SgdNet.relaxedFit(df, Seq("x1", "x2"), "y",
      params.copy(lowerLimits = Array(-100.0, -100.0),
        upperLimits = Array(100.0, 100.0)), gamma = 0.0)
    for (l <- 0 until 2; j <- 0 until 2)
      assert(math.abs(loose.olsBeta(l)(j) - un.olsBeta(l)(j)) < 1e-8,
        s"non-binding == unbounded ols($l)($j)")
    // binomial IRLS refit honors the box too
    val db = SparkSpec.binaryDF(spark)
    val pb = SgdNetParams(family = "binomial", alpha = 1.0,
      lambda = Array(0.02), thresh = 1e-9, maxit = 100000,
      lowerLimits = Array(0.0, 0.0), upperLimits = null)
    val rb = SgdNet.relaxedFitGlm(db, Seq("x1", "x2"), "y", pb, gamma = 0.0)
    for (j <- 0 until 2)
      assert(rb.olsBeta(0)(j) >= -1e-12, s"binomial refit bound ($j)")
    // x2's true effect is negative, so the bound binds there
    val ub = SgdNet.relaxedFitGlm(db, Seq("x1", "x2"), "y",
      pb.copy(lowerLimits = null), gamma = 0.0)
    assert(ub.olsBeta(0)(1) < 0, "unbounded binomial refit negative on x2")
    assert(rb.olsBeta(0)(1) == 0.0 || rb.olsBeta(0)(1) > 0,
      "bounded binomial refit clipped")
    // relaxed CV: the per-fold refits honor the box (full-data refit
    // rides as the virtual fold)
    val cvB = CvSgdNet.fitRelaxed(negData.withColumn("rid",
        monotonically_increasing_id()), Seq("x1", "x2"), "y",
      params, nfolds = 3, gammas = Seq(0.0, 1.0),
      foldCol = pmod(xxhash64(col("rid")), lit(3)))
    for (l <- 0 until 2; j <- 0 until 2)
      assert(cvB.relaxed.olsBeta(l)(j) >= -1e-12, s"CV refit bound ($l)($j)")
    ()
  }
}
