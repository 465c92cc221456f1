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
}
