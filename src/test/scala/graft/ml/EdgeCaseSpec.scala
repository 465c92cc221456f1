package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Degenerate-input behavior: constant features/labels, tiny n. */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  test("constant feature gets a zero coefficient, fit still exact") {
    val df = SparkSpec.regressionDF(spark).withColumn("c", lit(5.0))
    val m = SgdNet.fit(df, Seq("x1", "x2", "c"), "y",
      SgdNetParams(lambda = Array(0.0), thresh = 1e-11, maxit = 100000))
    assert(m.beta(0)(0)(2) == 0.0, "constant feature coefficient")
    val base = SgdNet.fit(df, Seq("x1", "x2"), "y",
      SgdNetParams(lambda = Array(0.0), thresh = 1e-11, maxit = 100000))
    for (j <- 0 until 2)
      assert(math.abs(m.beta(0)(0)(j) - base.beta(0)(0)(j)) < 1e-8)
  }

  test("constant label: zero null deviance, dev ratio stays defined") {
    val df = SparkSpec.regressionDF(spark).withColumn("yc", lit(3.5))
    val m = SgdNet.fit(df, Seq("x1", "x2"), "yc",
      SgdNetParams(alpha = 1.0, nlambda = 4))
    assert(m.nulldev == 0.0)
    assert(m.devRatio.forall(r => !r.isNaN))
    assert(m.lambda.forall(_ < 1e-10), "lambda path degenerates to ~zero")
    assert(math.abs(m.a0(0)(0) - 3.5) < 1e-9)
  }

  test("tiny n still fits without error") {
    val df = Seq((1.0, 2.0), (2.0, 3.9), (3.0, 6.1)).toDF("x1", "y")
    val m = SgdNet.fit(df, Seq("x1"), "y",
      SgdNetParams(lambda = Array(0.0), thresh = 1e-11))
    assert(math.abs(m.beta(0)(0)(0) - 2.05) < 0.01)
  }

  test("empty feature list and unsupported family are rejected") {
    val df = SparkSpec.regressionDF(spark)
    intercept[IllegalArgumentException] {
      SgdNet.fit(df, Seq.empty, "y", SgdNetParams())
    }
    intercept[IllegalArgumentException] {
      SgdNet.fit(df, Seq("x1"), "y", SgdNetParams(family = "tweedie"))
    }
  }

  test("large-p contract: oversized p fails FAST on every route " +
      "(round 18)") {
    // The sufficient-stats/IRLS architecture keeps O(p²) driver state;
    // SURVEY §3 scopes it to p up to ~5k–8k. Round 18 enforces that as
    // a fail-fast require at EVERY entry (fit / CV / relax / offset /
    // weighted, dense and sparse) instead of a driver OOM mid-
    // treeAggregate. The cap is configurable (maxGramP); shrink it for
    // the test so no big allocation ever happens.
    val df = SparkSpec.regressionDF(spark)
      .withColumn("w", lit(1.0)).withColumn("off", lit(0.1))
      .withColumn("sidx", array(lit(0), lit(1)))
      .withColumn("svals", array(col("x1"), col("x2")))
      .withColumn("yb", (col("y") > 0).cast("double"))
    // three REAL columns (> the shrunken cap): column resolution must
    // not be what fails — the maxGramP require must fire first
    val names = Seq("x1", "x2", "w")
    val saved = SgdNet.maxGramP
    SgdNet.maxGramP = 2
    try {
      def mustFail(body: => Any): Unit = {
        val e = intercept[IllegalArgumentException](body)
        assert(e.getMessage.contains("maxGramP"), e.getMessage)
      }
      mustFail(SgdNet.fit(df, names, "y", SgdNetParams()))
      mustFail(SgdNet.fitWeighted(df, names, "y", "w", SgdNetParams()))
      mustFail(SgdNet.fitWithOffset(df, names, "y", "off", SgdNetParams()))
      mustFail(SgdNet.relaxedFit(df, names, "y",
        SgdNetParams(lambda = Array(1.0))))
      mustFail(SgdNet.fitSparse(df, "sidx", "svals", 3, "y", SgdNetParams()))
      mustFail(SgdNet.fitSparseWithOffset(df, "sidx", "svals", 3, "y",
        "off", SgdNetParams(family = "poisson")))
      mustFail(CvSgdNet.fit(df, names, Seq("y"), SgdNetParams(), nfolds = 3))
      mustFail(CvSgdNet.fitWeighted(df, names, "y", "w", SgdNetParams(),
        nfolds = 3))
      mustFail(CvSgdNet.fitWithOffset(df, names, "y", "off", SgdNetParams(),
        nfolds = 3))
      mustFail(CvSgdNet.fitSparse(df, "sidx", "svals", 3, "y",
        SgdNetParams(), nfolds = 3))
      mustFail(CvSgdNet.fitRelaxed(df, names, "y",
        SgdNetParams(lambda = Array(1.0)), nfolds = 3))
      mustFail(CvSgdNet.fitRelaxedSparse(df, "sidx", "svals", 3, "y",
        SgdNetParams(lambda = Array(1.0)), nfolds = 3))
      // GramStats itself is structurally gated driver-side
      mustFail(new GramStats(3, 1))
    } finally SgdNet.maxGramP = saved
    // at the restored cap the same fits run fine
    val m = SgdNet.fit(df, Seq("x1", "x2"), "y", SgdNetParams())
    assert(m.lambda.nonEmpty)
  }
}
