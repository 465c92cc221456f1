package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EstimatorSpec extends SparkSpec {

  test("SgdNetEstimator works inside a spark.ml Pipeline") {
    import org.apache.spark.ml.Pipeline
    val df = SparkSpec.regressionDF(spark)
    val est = new SgdNetEstimator()
      .setFeatureCols(Seq("x1", "x2", "x3")).setLabelCol("y")
      .setAlpha(0.5).setNLambda(10)
    val pipe = new Pipeline().setStages(Array(est))
    val model = pipe.fit(df)
    val out = model.transform(df)
    assert(out.columns.contains("prediction"))
    val mse = out.selectExpr("avg(pow(prediction - y, 2))").head.getDouble(0)
    assert(mse < 0.2, s"pipeline prediction mse $mse")
    // path model accessible for the full sgdnet surface
    val pm = model.stages(0).asInstanceOf[SgdNetPipelineModel].pathModel
    assert(pm.nLambda == 10 && pm.devRatio.last > 0.9)
  }

  test("param validation and copy") {
    val est = new SgdNetEstimator().setFeatureCols(Seq("x1")).setLabelCol("y")
    intercept[IllegalArgumentException] { est.setAlpha(1.5) }
    intercept[IllegalArgumentException] { est.setFamily("tweedie") }
    val copied = est.copy(org.apache.spark.ml.param.ParamMap.empty)
    assert(copied.isInstanceOf[SgdNetEstimator])
  }

  test("estimator routes penaltyFactor, weightCol, and offsetCol to the fits") {
    import org.apache.spark.sql.functions._
    val df = graft.SparkSpec.regressionDF(spark)
    def base() = new SgdNetEstimator()
      .setFeatureCols(Seq("x1", "x2")).setLabelCol("y")
      .setLambdas(Seq(0.3)).setThresh(1e-10)
    val pf = base().setPenaltyFactor(Seq(0.0, 1.0)).fit(df).pathModel
    val direct = SgdNet.fit(df, Seq("x1", "x2"), "y",
      SgdNetParams(lambda = Array(0.3), thresh = 1e-10,
        penaltyFactor = Array(0.0, 1.0)))
    for (j <- 0 until 2)
      assert(math.abs(pf.beta(0)(0)(j) - direct.beta(0)(0)(j)) < 1e-9)
    val wdf = df.withColumn("w", lit(2.0))
    val mw = base().setWeightCol("w").fit(wdf).pathModel
    val dw = SgdNet.fitWeighted(wdf, Seq("x1", "x2"), "y", "w",
      SgdNetParams(lambda = Array(0.3), thresh = 1e-10))
    assert(math.abs(mw.a0(0)(0) - dw.a0(0)(0)) < 1e-9)
    val odf = df.withColumn("off", lit(1.5))
    val mo = base().setOffsetCol("off").fit(odf).pathModel
    val doff = SgdNet.fitWithOffset(odf, Seq("x1", "x2"), "y", "off",
      SgdNetParams(lambda = Array(0.3), thresh = 1e-10))
    assert(math.abs(mo.a0(0)(0) - doff.a0(0)(0)) < 1e-9)
    // weightCol AND offsetCol together route through
    // fitWithOffsetWeighted (round 16 — the old reject is gone)
    val wodf = wdf.withColumn("off", lit(1.5))
    val mwo = base().setWeightCol("w").setOffsetCol("off").fit(wodf).pathModel
    val dwo = SgdNet.fitWithOffsetWeighted(wodf, Seq("x1", "x2"), "y",
      "off", "w", SgdNetParams(lambda = Array(0.3), thresh = 1e-10))
    assert(math.abs(mwo.a0(0)(0) - dwo.a0(0)(0)) < 1e-9)
  }

  test("estimator weightCol reaches the weighted GLM route (binomial)") {
    import org.apache.spark.sql.functions._
    val df = graft.SparkSpec.binaryDF(spark)
      .withColumn("w", (pmod(round(col("x1") * 100).cast("long"), lit(3)) + 1)
        .cast("double"))
    val est = new SgdNetEstimator()
      .setFeatureCols(Seq("x1", "x2")).setLabelCol("y")
      .setFamily("binomial").setLambdas(Seq(0.01)).setThresh(1e-9)
      .setWeightCol("w")
      .fit(df).pathModel
    val direct = SgdNet.fitWeighted(df, Seq("x1", "x2"), "y", "w",
      SgdNetParams(family = "binomial", lambda = Array(0.01), thresh = 1e-9))
    for (j <- 0 until 2)
      assert(math.abs(est.beta(0)(0)(j) - direct.beta(0)(0)(j)) < 1e-7)
    assert(math.abs(est.a0(0)(0) - direct.a0(0)(0)) < 1e-7)
  }

  test("estimator routes lowerLimits/upperLimits to the fit") {
    val df = graft.SparkSpec.regressionDF(spark)
    val m = new SgdNetEstimator()
      .setFeatureCols(Seq("x1", "x2")).setLabelCol("y")
      .setLambdas(Seq(0.0)).setThresh(1e-10)
      .setLowerLimits(Seq(0.0, 0.0))
      .fit(df).pathModel
    val direct = SgdNet.fit(df, Seq("x1", "x2"), "y",
      SgdNetParams(lambda = Array(0.0), thresh = 1e-10,
        lowerLimits = Array(0.0, 0.0)))
    for (j <- 0 until 2)
      assert(math.abs(m.beta(0)(0)(j) - direct.beta(0)(0)(j)) < 1e-9)
    assert(m.beta(0)(0).forall(_ >= 0.0))
  }

  test("estimator: poisson family, weight+offset together, dfmax (round 16)") {
    val df = graft.SparkSpec.regressionDF(spark)
      .withColumn("yp", ceil(abs(col("y"))).cast("double"))
      .withColumn("off", col("x1") * 0.2)
      .withColumn("w", (pmod(round(col("x2") * 100).cast("long"), lit(3)) + 1)
        .cast("double"))
    // poisson family is settable and routes offset+weights together
    val est = new SgdNetEstimator()
      .setFeatureCols(Seq("x1", "x2")).setLabelCol("yp")
      .setFamily("poisson").setLambdas(Seq(0.02)).setThresh(1e-9)
      .setOffsetCol("off").setWeightCol("w")
      .fit(df).pathModel
    val direct = SgdNet.fitWithOffsetWeighted(df, Seq("x1", "x2"), "yp",
      "off", "w", SgdNetParams(family = "poisson", lambda = Array(0.02),
        thresh = 1e-9))
    for (j <- 0 until 2)
      assert(math.abs(est.beta(0)(0)(j) - direct.beta(0)(0)(j)) < 1e-7)
    assert(math.abs(est.a0(0)(0) - direct.a0(0)(0)) < 1e-7)
    // dfmax truncates through the estimator exactly as the direct fit
    val full = SgdNet.fit(df, Seq("x1", "x2", "x3"), "y",
      SgdNetParams(alpha = 1.0, nlambda = 12, thresh = 1e-9))
    val cut0 = full.df.indexWhere(_ > 1)
    if (cut0 > 0) {
      val t = new SgdNetEstimator()
        .setFeatureCols(Seq("x1", "x2", "x3")).setLabelCol("y")
        .setAlpha(1.0).setNLambda(12).setThresh(1e-9).setDfmax(1)
        .fit(df).pathModel
      assert(t.lambda.length == cut0, s"${t.lambda.length} vs $cut0")
    }
  }

  test("estimator routes relax/gamma to relaxedFit (round 17)") {
    val df = graft.SparkSpec.regressionDF(spark)
    def base() = new SgdNetEstimator()
      .setFeatureCols(Seq("x1", "x2")).setLabelCol("y")
      .setLambdas(Seq(0.5, 0.1)).setThresh(1e-10)
    // gaussian: blended stage == gamma*penalized + (1-gamma)*refit
    val est = base().setRelax(true).setGamma(0.25).fit(df).pathModel
    val rp = SgdNet.relaxedFit(df, Seq("x1", "x2"), "y",
      SgdNetParams(lambda = Array(0.5, 0.1), thresh = 1e-10), gamma = 0.25)
    for (l <- 0 until 2) {
      assert(math.abs(est.a0(l)(0) - rp.blendedA0(l)) < 1e-9, s"a0($l)")
      for (j <- 0 until 2)
        assert(math.abs(est.beta(l)(0)(j) - rp.blendedBeta(l)(j)) < 1e-9,
          s"beta($l)($j)")
    }
    // weighted gaussian routes to relaxedFitWeighted
    val wdf = df.withColumn("w", (pmod(xxhash64(col("x1")), lit(3)) + 1)
      .cast("double"))
    val estW = base().setRelax(true).setGamma(0.0).setWeightCol("w")
      .fit(wdf).pathModel
    val rpW = SgdNet.relaxedFitWeighted(wdf, Seq("x1", "x2"), "y", "w",
      SgdNetParams(lambda = Array(0.5, 0.1), thresh = 1e-10), gamma = 0.0)
    for (l <- 0 until 2; j <- 0 until 2)
      assert(math.abs(estW.beta(l)(0)(j) - rpW.blendedBeta(l)(j)) < 1e-9,
        s"weighted beta($l)($j)")
    // binomial routes through relaxedFitGlm inside relaxedFit
    val db = SparkSpec.binaryDF(spark)
    val estB = new SgdNetEstimator()
      .setFeatureCols(Seq("x1", "x2")).setLabelCol("y")
      .setFamily("binomial").setLambdas(Seq(0.05)).setThresh(1e-8)
      .setRelax(true).setGamma(0.5).fit(db).pathModel
    val rpB = SgdNet.relaxedFit(db, Seq("x1", "x2"), "y",
      SgdNetParams(family = "binomial", lambda = Array(0.05), thresh = 1e-8),
      gamma = 0.5)
    for (j <- 0 until 2)
      assert(math.abs(estB.beta(0)(0)(j) - rpB.blendedBeta(0)(j)) < 1e-7,
        s"binomial beta($j)")
    // relax + offsetCol routes to relaxedFitWithOffset (the full grid)
    val wOff = df.withColumn("off", col("x1") * 0.3)
    val estO = base().setRelax(true).setGamma(0.5).setOffsetCol("off")
      .fit(wOff).pathModel
    val rpO = SgdNet.relaxedFitWithOffset(wOff, Seq("x1", "x2"), "y", "off",
      SgdNetParams(lambda = Array(0.5, 0.1), thresh = 1e-10), gamma = 0.5)
    for (l <- 0 until 2; j <- 0 until 2)
      assert(math.abs(estO.beta(l)(0)(j) - rpO.blendedBeta(l)(j)) < 1e-9,
        s"offset relax beta($l)($j)")
    intercept[IllegalArgumentException] { base().setGamma(1.5) }
    ()
  }
}
