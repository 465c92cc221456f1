package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Model persistence round-trips: fit -> save -> load -> identical
  * predictions (the reference gets this for free via saveRDS; a fitted
  * path that cannot leave the Spark session is useless in production). */
class PersistenceSpec extends SparkSpec {

  private def tmp(name: String): String =
    s"/tmp/graft-persist-${name}-${java.util.UUID.randomUUID().toString.take(8)}"

  private def maxPredDiff(a: org.apache.spark.sql.DataFrame,
                          b: org.apache.spark.sql.DataFrame): Double = {
    val pa = a.select(col("pred_0")).collect().map(_.getDouble(0))
    val pb = b.select(col("pred_0")).collect().map(_.getDouble(0))
    assert(pa.length == pb.length && pa.nonEmpty)
    pa.zip(pb).map { case (x, y) => math.abs(x - y) }.max
  }

  test("gaussian path model round-trips bit-exactly") {
    val df = SparkSpec.regressionDF(spark).orderBy("x1")
    val m = SgdNet.fit(df, Seq("x1", "x2", "x3"), "y",
      SgdNetParams(alpha = 0.5, nlambda = 8))
    val path = tmp("gauss")
    m.save(spark, path)
    val r = SgdNetModel.load(spark, path)
    assert(r.family == m.family)
    assert(r.featureNames.sameElements(m.featureNames))
    assert(r.responseNames.sameElements(m.responseNames))
    assert(r.lambda.sameElements(m.lambda))
    assert(r.devRatio.sameElements(m.devRatio))
    assert(r.nulldev == m.nulldev && r.nobs == m.nobs && r.npasses == m.npasses)
    assert(r.params == m.params.copy(lambda = null) ||
      java.util.Arrays.equals(Option(r.params.lambda).getOrElse(Array.empty),
        Option(m.params.lambda).getOrElse(Array.empty)))
    for (l <- m.lambda.indices) {
      assert(r.a0(l).sameElements(m.a0(l)))
      for (t <- r.a0(l).indices)
        assert(r.beta(l)(t).sameElements(m.beta(l)(t)))
    }
    // doubles round-trip exactly through parquet -> identical predictions
    assert(maxPredDiff(m.predict(df, "link", Seq(0)),
      r.predict(df, "link", Seq(0))) == 0.0)
    // MLlib writer convention: overwrite = false refuses an existing path
    intercept[Exception] { m.save(spark, path, overwrite = false) }
    m.save(spark, path) // default still overwrites
  }

  test("multinomial model round-trips (class labels + per-class coefs)") {
    val df = SparkSpec.multiclassDF(spark)
    val m = SgdNet.fit(df, Seq("x1", "x2"), "cls",
      SgdNetParams(family = "multinomial", alpha = 1.0, lambda = Array(0.01),
        thresh = 1e-5))
    val path = tmp("multinom")
    m.save(spark, path)
    val r = SgdNetModel.load(spark, path)
    assert(r.classLabels.sameElements(m.classLabels))
    assert(r.nResponses == m.nResponses)
    val a = m.predict(df, "class", Seq(0)).select("pred_0")
      .collect().map(_.getString(0))
    val b = r.predict(df, "class", Seq(0)).select("pred_0")
      .collect().map(_.getString(0))
    assert(a.sameElements(b))
  }

  test("CvResult round-trips: curve, selections, and predictAt agree") {
    val df = SparkSpec.regressionDF(spark)
    val cv = CvSgdNet.fit(df, Seq("x1", "x2"), Seq("y"),
      SgdNetParams(alpha = 1.0, nlambda = 6), nfolds = 3)
    val path = tmp("cv")
    cv.save(spark, path)
    val r = CvSgdNet.load(spark, path)
    assert(r.paths.size == cv.paths.size)
    assert(r.best.alpha == cv.best.alpha)
    assert(r.best.lambdaMin == cv.best.lambdaMin)
    assert(r.best.lambda1se == cv.best.lambda1se)
    assert(r.best.cvm.sameElements(cv.best.cvm))
    assert(r.best.cvsd.sameElements(cv.best.cvsd))
    val a = cv.predictAt(df, "lambda.min").select("pred").collect().map(_.getDouble(0))
    val b = r.predictAt(df, "lambda.min").select("pred").collect().map(_.getDouble(0))
    assert(a.zip(b).forall { case (x, y) => x == y })
  }

  test("Pipeline.save/load and fitted PipelineModel.save/load with a graft stage") {
    import org.apache.spark.ml.{Pipeline, PipelineModel}
    val df = SparkSpec.regressionDF(spark)
    val est = new SgdNetEstimator()
      .setFeatureCols(Seq("x1", "x2", "x3")).setLabelCol("y")
      .setAlpha(0.5).setNLambda(6).setThresh(1e-5)
    val pipe = new Pipeline().setStages(Array(est))
    // unfitted pipeline round-trip (DefaultParamsWritable on the stage)
    val pipePath = tmp("pipe")
    pipe.write.overwrite().save(pipePath)
    val pipe2 = Pipeline.load(pipePath)
    val est2 = pipe2.getStages(0).asInstanceOf[SgdNetEstimator]
    assert(est2.uid == est.uid)
    assert(est2.getOrDefault(est2.featureCols).sameElements(Array("x1", "x2", "x3")))
    assert(est2.getOrDefault(est2.alpha) == 0.5)
    // fitted model round-trip (custom MLWriter/MLReader on the stage)
    val fitted = pipe.fit(df)
    val modelPath = tmp("pipemodel")
    fitted.write.overwrite().save(modelPath)
    val restored = PipelineModel.load(modelPath)
    val stage = restored.stages(0).asInstanceOf[SgdNetPipelineModel]
    assert(stage.uid == est.uid)
    val a = fitted.transform(df).select("prediction").collect().map(_.getDouble(0))
    val b = restored.transform(df).select("prediction").collect().map(_.getDouble(0))
    assert(a.zip(b).forall { case (x, y) => x == y })
  }

  test("RelaxedCvResult round-trips: surface, blended models, refit path") {
    import org.apache.spark.sql.functions._
    val df = SparkSpec.regressionDF(spark)
      .withColumn("rid", monotonically_increasing_id())
    val fold = pmod(xxhash64(col("rid")), lit(3))
    val r = CvSgdNet.fitRelaxed(df, Seq("x1", "x2"), "y",
      SgdNetParams(alpha = 1.0, lambda = Array(0.5, 0.05), thresh = 1e-9),
      nfolds = 3, gammas = Seq(0.0, 0.5, 1.0), foldCol = fold)
    val path = tmp("relaxedcv")
    r.save(spark, path)
    val r2 = CvSgdNet.loadRelaxed(spark, path)
    assert(r2.gammas.sameElements(r.gammas))
    assert(r2.bestGamma == r.bestGamma)
    for (g <- 0 until 3; l <- 0 until 2) {
      assert(r2.paths(g).cvm(l) == r.paths(g).cvm(l), s"cvm($g)($l)")
      assert(r2.paths(g).cvsd(l) == r.paths(g).cvsd(l), s"cvsd($g)($l)")
      for (j <- 0 until 2)
        assert(r2.paths(g).fit.beta(l)(0)(j) == r.paths(g).fit.beta(l)(0)(j))
    }
    // the refit path and blended coefficient extraction survive
    val (a0A, bA) = r.coefAt("lambda.min")
    val (a0B, bB) = r2.coefAt("lambda.min")
    assert(a0A == a0B && bA.sameElements(bB))
    // overwrite contract
    intercept[IllegalArgumentException] {
      r.save(spark, path, overwrite = false)
    }
    ()
  }

  test("RelaxedPath round-trips: penalized model, refits, gamma, blends (round 17)") {
    val df = SparkSpec.binaryDF(spark)
    val rp = SgdNet.relaxedFit(df, Seq("x1", "x2"), "y",
      SgdNetParams(family = "binomial", alpha = 1.0,
        lambda = Array(0.05, 0.01), thresh = 1e-8, maxit = 100000),
      gamma = 0.25)
    val dir = java.nio.file.Files.createTempDirectory("graft_rp").toString
    rp.save(spark, s"$dir/rp")
    val back = SgdNet.loadRelaxedPath(spark, s"$dir/rp")
    assert(back.gamma == rp.gamma)
    assert(back.model.classLabels.sameElements(rp.model.classLabels))
    for (l <- 0 until 2) {
      assert(back.olsA0(l) == rp.olsA0(l), s"olsA0($l)")
      assert(back.olsBeta(l).sameElements(rp.olsBeta(l)), s"olsBeta($l)")
      assert(back.blendedA0(l) == rp.blendedA0(l), s"blend a0($l)")
      for (j <- 0 until 2)
        assert(back.model.beta(l)(0)(j) == rp.model.beta(l)(0)(j),
          s"pen beta($l)($j)")
    }
    // overwrite contract: second save without overwrite fails
    intercept[IllegalArgumentException] {
      rp.save(spark, s"$dir/rp", overwrite = false)
    }
    ()
  }
}
