package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** glmnet dfmax/pmax path truncation (round 16): every truncated path
  * must be exactly the longest admissible PREFIX of the corresponding
  * unrestricted path — same lambdas, same coefficients — with the
  * first violating point dropped; the secondary (sparse / weighted /
  * offset) routes slice post-hoc to the same surface. */
class DfmaxSpec extends SparkSpec {
  import spark.implicits._

  private def expectCut(full: SgdNetModel, dfmax: Int): Int = {
    val idx = full.df.indexWhere(_ > dfmax)
    if (idx < 0) full.lambda.length else idx
  }

  private def assertPrefix(t: SgdNetModel, full: SgdNetModel, cut: Int,
                           tag: String): Unit = {
    assert(t.lambda.length == cut, s"$tag cut: ${t.lambda.length} vs $cut")
    for (l <- 0 until cut) {
      // two separate fits: treeAggregate merge order wobbles the last
      // ulp of the moments, so compare with a tolerance, not bitwise
      assert(math.abs(t.lambda(l) - full.lambda(l)) <=
        1e-12 * full.lambda(l), s"$tag lambda($l)")
      for (k <- 0 until full.nResponses; j <- 0 until full.nFeatures)
        assert(math.abs(t.beta(l)(k)(j) - full.beta(l)(k)(j)) < 1e-7,
          s"$tag beta($l)($k)($j)")
    }
  }

  test("dfmax truncates the gaussian path at the first violating point") {
    val df = SparkSpec.regressionDF(spark)
    val params = SgdNetParams(alpha = 1.0, nlambda = 20, thresh = 1e-9)
    val full = SgdNet.fit(df, Seq("x1", "x2", "x3"), "y", params)
    for (dfmax <- Seq(0, 1, 2)) {
      val cut = expectCut(full, dfmax)
      if (cut > 0) {
        val t = SgdNet.fit(df, Seq("x1", "x2", "x3"), "y",
          params.copy(dfmax = dfmax))
        assertPrefix(t, full, cut, s"gaussian dfmax=$dfmax")
      }
    }
    // pmax: ever-active count along the path
    val ever = scala.collection.mutable.Set.empty[Int]
    val everCount = full.beta.map { bl =>
      (0 until 3).foreach(j => if (bl(0)(j) != 0.0) ever += j)
      ever.size
    }
    val pmax = 1
    val cutP0 = everCount.indexWhere(_ > pmax)
    val cutP = if (cutP0 < 0) full.lambda.length else cutP0
    if (cutP > 0) {
      val t = SgdNet.fit(df, Seq("x1", "x2", "x3"), "y",
        params.copy(pmax = pmax))
      assertPrefix(t, full, cutP, "gaussian pmax")
    }
    // unlimited bounds are the identity
    val same = SgdNet.fit(df, Seq("x1", "x2", "x3"), "y",
      params.copy(dfmax = 3, pmax = 3))
    assertPrefix(same, full, full.lambda.length, "gaussian unlimited")
  }

  test("GLM and multinomial cores truncate at the first violation") {
    val db = SparkSpec.binaryDF(spark)
    val pb = SgdNetParams(family = "binomial", alpha = 1.0, nlambda = 10,
      thresh = 1e-9, maxit = 10000)
    val fullB = SgdNet.fit(db, Seq("x1", "x2"), "y", pb)
    val cutB = expectCut(fullB, 1)
    if (cutB > 0 && cutB < fullB.lambda.length)
      assertPrefix(SgdNet.fit(db, Seq("x1", "x2"), "y", pb.copy(dfmax = 1)),
        fullB, cutB, "binomial")
    val dp = SparkSpec.regressionDF(spark)
      .withColumn("yp", ceil(abs(col("y"))).cast("double"))
    val pp = SgdNetParams(family = "poisson", alpha = 1.0, nlambda = 10,
      thresh = 1e-9, maxit = 10000)
    val fullP = SgdNet.fit(dp, Seq("x1", "x2"), "yp", pp)
    val cutP = expectCut(fullP, 1)
    if (cutP > 0 && cutP < fullP.lambda.length)
      assertPrefix(SgdNet.fit(dp, Seq("x1", "x2"), "yp", pp.copy(dfmax = 1)),
        fullP, cutP, "poisson")
    val dm = SparkSpec.regressionDF(spark)
      .withColumn("c", pmod(ceil(col("y") * 3), lit(3)).cast("int"))
    val pm = SgdNetParams(family = "multinomial", alpha = 1.0, nlambda = 8,
      thresh = 1e-7, maxit = 3000)
    val fullM = SgdNet.fit(dm, Seq("x1", "x2", "x3"), "c", pm)
    val cutM = expectCut(fullM, 1)
    if (cutM > 0 && cutM < fullM.lambda.length)
      assertPrefix(SgdNet.fit(dm, Seq("x1", "x2", "x3"), "c",
        pm.copy(dfmax = 1)), fullM, cutM, "multinomial")
  }

  test("secondary routes (sparse GLM, weighted GLM, offset) slice post-hoc") {
    val db = SparkSpec.binaryDF(spark)
      .withColumn("idx", array(lit(0), lit(1)))
      .withColumn("vals", array(col("x1"), col("x2")))
      .withColumn("w", lit(1.0) + (col("x1") > 0).cast("double"))
      .withColumn("off", col("x2") * 0.3)
    val pb = SgdNetParams(family = "binomial", alpha = 1.0, nlambda = 10,
      thresh = 1e-9, maxit = 10000)
    val fullS = SgdNet.fitSparse(db, "idx", "vals", 2, "y", pb)
    val cutS = expectCut(fullS, 1)
    if (cutS > 0 && cutS < fullS.lambda.length)
      assertPrefix(SgdNet.fitSparse(db, "idx", "vals", 2, "y",
        pb.copy(dfmax = 1)), fullS, cutS, "sparse binomial")
    val fullW = SgdNet.fitWeighted(db, Seq("x1", "x2"), "y", "w", pb)
    val cutW = expectCut(fullW, 1)
    if (cutW > 0 && cutW < fullW.lambda.length)
      assertPrefix(SgdNet.fitWeighted(db, Seq("x1", "x2"), "y", "w",
        pb.copy(dfmax = 1)), fullW, cutW, "weighted binomial")
    val fullO = SgdNet.fitWithOffset(db, Seq("x1", "x2"), "y", "off", pb)
    val cutO = expectCut(fullO, 1)
    if (cutO > 0 && cutO < fullO.lambda.length)
      assertPrefix(SgdNet.fitWithOffset(db, Seq("x1", "x2"), "y", "off",
        pb.copy(dfmax = 1)), fullO, cutO, "offset binomial")
  }

  test("secondary routes STOP cluster passes at the dfmax cut (round 17)") {
    // true early stopping: a dfmax hit must stop the remaining lambdas'
    // IRLS treeAggregates on the sparse/weighted/offset routes, not just
    // slice the returned surface — npasses is the cluster-pass count
    val db = SparkSpec.binaryDF(spark)
      .withColumn("idx", array(lit(0), lit(1)))
      .withColumn("vals", array(col("x1"), col("x2")))
      .withColumn("w", lit(1.0) + (col("x1") > 0).cast("double"))
      .withColumn("off", col("x2") * 0.3)
    val pb = SgdNetParams(family = "binomial", alpha = 1.0, nlambda = 10,
      thresh = 1e-9, maxit = 10000)
    def check(tag: String, fit: SgdNetParams => SgdNetModel): Unit = {
      val full = fit(pb)
      val cut = expectCut(full, 1)
      if (cut > 0 && cut < full.lambda.length) {
        val t = fit(pb.copy(dfmax = 1))
        assert(t.npasses < full.npasses,
          s"$tag passes: ${t.npasses} vs full ${full.npasses}")
      }
    }
    check("weighted", p => SgdNet.fitWeighted(db, Seq("x1", "x2"), "y", "w", p))
    check("sparse", p => SgdNet.fitSparse(db, "idx", "vals", 2, "y", p))
    check("offset", p => SgdNet.fitWithOffset(db, Seq("x1", "x2"), "y", "off", p))
  }

  test("contract: bounds excluding every path point reject") {
    val df = SparkSpec.regressionDF(spark)
    intercept[IllegalArgumentException] {
      SgdNet.fit(df, Seq("x1", "x2"), "y",
        SgdNetParams(alpha = 1.0, lambda = Array(0.001), thresh = 1e-9,
          dfmax = 0))
    }
    ()
  }
}
