package graft.ml

import graft.SparkSpec

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
    intercept[IllegalArgumentException] { est.setFamily("poisson") }
    val copied = est.copy(org.apache.spark.ml.param.ParamMap.empty)
    assert(copied.isInstanceOf[SgdNetEstimator])
  }
}
