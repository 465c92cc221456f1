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

  test("validation: limits must bracket zero; unsupported paths reject") {
    val df = negData
    intercept[IllegalArgumentException] {
      SgdNet.fit(df, Seq("x1", "x2"), "y",
        SgdNetParams(lowerLimits = Array(0.5, 0.0)))
    }
    intercept[IllegalArgumentException] {
      CvSgdNet.fit(df, Seq("x1", "x2"), Seq("y"),
        SgdNetParams(lowerLimits = Array(0.0, 0.0)), nfolds = 3)
    }
    ()
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
}
