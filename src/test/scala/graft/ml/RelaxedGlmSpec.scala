package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Relaxed elastic net for the IRLS families (round 16 — glmnet
  * relax = TRUE with binomial/poisson): the active-set unpenalized
  * refit must equal an independent solver's MLE on the active
  * columns, empty active sets must refit to the closed-form null, and
  * the gamma blend must be linear with γ = 1 reproducing the
  * penalized path. */
class RelaxedGlmSpec extends SparkSpec {
  import spark.implicits._

  private def assembled(df: org.apache.spark.sql.DataFrame,
                        cols: Array[String]) =
    new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(cols).setOutputCol("fv").transform(df)

  test("binomial relaxed refit == spark.ml LogisticRegression at regParam 0") {
    val db = SparkSpec.binaryDF(spark)
    val params = SgdNetParams(family = "binomial", alpha = 1.0,
      lambda = Array(0.02), thresh = 1e-9, maxit = 100000)
    val rp = SgdNet.relaxedFit(db, Seq("x1", "x2"), "y", params, gamma = 0.0)
    assert(rp.model.df(0) == 2, "both features should be active")
    val lr = new org.apache.spark.ml.classification.LogisticRegression()
      .setRegParam(0.0).setFitIntercept(true).setTol(1e-10).setMaxIter(300)
      .setFeaturesCol("fv").setLabelCol("y")
      .fit(assembled(db, Array("x1", "x2")))
    assert(math.abs(rp.olsA0(0) - lr.intercept) < 1e-4,
      s"a0 ${rp.olsA0(0)} vs ${lr.intercept}")
    for (j <- 0 until 2)
      assert(math.abs(rp.olsBeta(0)(j) - lr.coefficients(j)) < 1e-4,
        s"b$j ${rp.olsBeta(0)(j)} vs ${lr.coefficients(j)}")
    // gamma = 0 blends to the refit; gamma = 1 to the penalized path
    assert(rp.blendedA0(0) == rp.olsA0(0))
    val rp1 = SgdNet.relaxedFit(db, Seq("x1", "x2"), "y", params, gamma = 1.0)
    for (j <- 0 until 2)
      assert(rp1.blendedBeta(0)(j) == rp1.model.beta(0)(0)(j), "gamma=1")
  }

  test("poisson relaxed refit == spark.ml GLR at regParam 0") {
    val dp = SparkSpec.regressionDF(spark)
      .withColumn("yp", ceil(abs(col("y"))).cast("double"))
    val params = SgdNetParams(family = "poisson", alpha = 1.0,
      lambda = Array(0.01), thresh = 1e-9, maxit = 100000)
    val rp = SgdNet.relaxedFit(dp, Seq("x1", "x2"), "yp", params, gamma = 0.5)
    val glr = new org.apache.spark.ml.regression.GeneralizedLinearRegression()
      .setFamily("poisson").setLink("log").setRegParam(0.0)
      .setTol(1e-10).setMaxIter(200)
      .setFeaturesCol("fv").setLabelCol("yp")
      .fit(assembled(dp, Array("x1", "x2")))
    assert(math.abs(rp.olsA0(0) - glr.intercept) < 1e-4,
      s"a0 ${rp.olsA0(0)} vs ${glr.intercept}")
    for (j <- 0 until 2)
      assert(math.abs(rp.olsBeta(0)(j) - glr.coefficients(j)) < 1e-4,
        s"b$j ${rp.olsBeta(0)(j)} vs ${glr.coefficients(j)}")
    // blend linearity at gamma = 0.5
    for (j <- 0 until 2) {
      val want = 0.5 * rp.model.beta(0)(0)(j) + 0.5 * rp.olsBeta(0)(j)
      assert(rp.blendedBeta(0)(j) == want, s"blend b$j")
    }
  }

  test("empty and partial active sets; per-lambda refits along a path") {
    val db = SparkSpec.binaryDF(spark)
    // explicit grid: 10.0 guarantees an empty active set, the tail is
    // dense enough for a df == 1 transition point
    val params = SgdNetParams(family = "binomial", alpha = 1.0,
      lambda = Array(10.0, 0.3, 0.15, 0.08, 0.05, 0.02, 0.01),
      thresh = 1e-9, maxit = 100000)
    val rp = SgdNet.relaxedFit(db, Seq("x1", "x2"), "y", params, gamma = 0.0)
    val dfs = rp.model.df
    assert(dfs(0) == 0, "the large-lambda point is the null")
    val pbar = db.agg(avg(col("y"))).head().getDouble(0)
    assert(math.abs(rp.olsA0(0) - math.log(pbar / (1 - pbar))) < 1e-9,
      "empty active set refits to logit(ybar)")
    assert(rp.olsBeta(0).forall(_ == 0.0))
    // a df == 1 point (if the path has one): refit == single-feature MLE
    val l1 = dfs.indexWhere(_ == 1)
    if (l1 >= 0) {
      val j = (0 until 2).find(rp.model.beta(l1)(0)(_) != 0.0).get
      val lr = new org.apache.spark.ml.classification.LogisticRegression()
        .setRegParam(0.0).setFitIntercept(true).setTol(1e-10).setMaxIter(300)
        .setFeaturesCol("fv").setLabelCol("y")
        .fit(assembled(db, Array(Seq("x1", "x2")(j))))
      assert(math.abs(rp.olsA0(l1) - lr.intercept) < 1e-4, "partial a0")
      assert(math.abs(rp.olsBeta(l1)(j) - lr.coefficients(0)) < 1e-4,
        "partial beta")
      assert(rp.olsBeta(l1).zipWithIndex.filter(_._2 != j).forall(_._1 == 0.0),
        "inactive stays zero")
    }
    // identical active sets share the same refit (path tail)
    val lLast = dfs.length - 1
    if (dfs(lLast) == 2 && dfs(lLast - 1) == 2)
      for (j <- 0 until 2)
        assert(math.abs(rp.olsBeta(lLast)(j) - rp.olsBeta(lLast - 1)(j)) < 1e-6,
          "same active set -> same refit")
    intercept[IllegalArgumentException] {
      SgdNet.relaxedFitGlm(db, Seq("x1"), "y", SgdNetParams())
    }
    ()
  }

  test("sparse GLM relaxed fit == dense (binomial, poisson; paths)") {
    val db = SparkSpec.binaryDF(spark)
      .withColumn("sidx", array(lit(0), lit(1)))
      .withColumn("svals", array(col("x1"), col("x2")))
    val pb = SgdNetParams(family = "binomial", alpha = 1.0,
      lambda = Array(0.3, 0.05, 0.01), thresh = 1e-9, maxit = 100000)
    val d = SgdNet.relaxedFitGlm(db, Seq("x1", "x2"), "y", pb, gamma = 0.25)
    val s = SgdNet.relaxedFitGlmSparse(db, "sidx", "svals", 2, "y", pb,
      gamma = 0.25)
    for (l <- 0 until 3) {
      assert(math.abs(s.olsA0(l) - d.olsA0(l)) < 1e-6, s"ols a0($l)")
      for (j <- 0 until 2) {
        assert(math.abs(s.olsBeta(l)(j) - d.olsBeta(l)(j)) < 1e-6,
          s"ols beta($l)($j)")
        assert(math.abs(s.blendedBeta(l)(j) - d.blendedBeta(l)(j)) < 1e-6,
          s"blend($l)($j)")
      }
    }
    // poisson with a data-derived path
    val dp = SparkSpec.regressionDF(spark)
      .withColumn("yp", ceil(abs(col("y"))).cast("double"))
      .withColumn("sidx", array(lit(0), lit(1)))
      .withColumn("svals", array(col("x1"), col("x2")))
    val pp = SgdNetParams(family = "poisson", alpha = 1.0, nlambda = 5,
      thresh = 1e-9, maxit = 100000)
    val dpp = SgdNet.relaxedFitGlm(dp, Seq("x1", "x2"), "yp", pp)
    val spp = SgdNet.relaxedFitGlmSparse(dp, "sidx", "svals", 2, "yp", pp)
    assert(spp.model.lambda.zip(dpp.model.lambda).forall { case (a, b) =>
      math.abs(a - b) < 1e-9 * b }, "lambda path")
    // the lambda_max point sits EXACTLY on the soft-threshold boundary,
    // so an ulp of moment-order difference can flip a ~1e-17
    // coefficient between active and not (changing that point's refit
    // between null and single-feature MLE — inherent to the path
    // definition, glmnet shares the edge). Compare refits only where
    // the two routes agree on the active set; they must agree past the
    // knife-edge point.
    var compared = 0
    for (l <- 0 until 5) {
      val aD = (0 until 2).filter(j => dpp.model.beta(l)(0)(j) != 0.0)
      val aS = (0 until 2).filter(j => spp.model.beta(l)(0)(j) != 0.0)
      if (l > 0) assert(aD == aS, s"active set($l): $aD vs $aS")
      if (aD == aS) {
        compared += 1
        for (j <- 0 until 2)
          assert(math.abs(spp.olsBeta(l)(j) - dpp.olsBeta(l)(j)) < 1e-6,
            s"poisson ols($l)($j)")
      }
    }
    assert(compared >= 4, "parity must cover the path tail")
    intercept[IllegalArgumentException] {
      SgdNet.relaxedFitGlmSparse(db, "sidx", "svals", 2, "y", SgdNetParams())
    }
    ()
  }

  test("weighted IRLS relax: integer weights == row duplication (round 17)") {
    // glmnet relax = TRUE + weights for binomial/poisson, dense and
    // sparse: the weighted refit must reproduce exact row duplication,
    // and the public relaxedFitWeighted / relaxedFitSparse entries
    // must route the IRLS families here
    val db = SparkSpec.binaryDF(spark)
      .withColumn("w", (pmod(xxhash64(col("x1")), lit(3)) + 1).cast("double"))
      .withColumn("sidx", array(lit(0), lit(1)))
      .withColumn("svals", array(col("x1"), col("x2")))
    val dup = db.withColumn("k", explode(sequence(lit(1), col("w").cast("int"))))
    val pb = SgdNetParams(family = "binomial", alpha = 1.0,
      lambda = Array(0.05, 0.01), thresh = 1e-9, maxit = 100000)
    val wr = SgdNet.relaxedFitWeighted(db, Seq("x1", "x2"), "y", "w", pb,
      gamma = 0.0)
    val dr = SgdNet.relaxedFitGlm(dup, Seq("x1", "x2"), "y", pb, gamma = 0.0)
    for (l <- 0 until 2) {
      assert(math.abs(wr.olsA0(l) - dr.olsA0(l)) < 1e-6, s"binom a0($l)")
      for (j <- 0 until 2)
        assert(math.abs(wr.olsBeta(l)(j) - dr.olsBeta(l)(j)) < 1e-6,
          s"binom ols($l)($j)")
    }
    // sparse twin routes through relaxedFitSparse and matches dense
    val sr = SgdNet.relaxedFitSparse(db, "sidx", "svals", 2, "y", pb,
      gamma = 0.0, weightCol = "w")
    for (l <- 0 until 2; j <- 0 until 2)
      assert(math.abs(sr.olsBeta(l)(j) - wr.olsBeta(l)(j)) < 1e-7,
        s"sparse binom ols($l)($j)")
    // poisson weighted == duplication
    val dp = SparkSpec.regressionDF(spark)
      .withColumn("yp", ceil(abs(col("y"))).cast("double"))
      .withColumn("w", (pmod(xxhash64(col("x1")), lit(3)) + 1).cast("double"))
    val pp = SgdNetParams(family = "poisson", alpha = 1.0,
      lambda = Array(0.05), thresh = 1e-9, maxit = 100000)
    val wp = SgdNet.relaxedFitWeighted(dp, Seq("x1", "x2"), "yp", "w", pp,
      gamma = 0.0)
    val dupP = dp.withColumn("k",
      explode(sequence(lit(1), col("w").cast("int"))))
    val dpR = SgdNet.relaxedFitGlm(dupP, Seq("x1", "x2"), "yp", pp,
      gamma = 0.0)
    for (j <- 0 until 2)
      assert(math.abs(wp.olsBeta(0)(j) - dpR.olsBeta(0)(j)) < 1e-6,
        s"poisson ols($j)")
    // zero weights drop the row everywhere
    val dz = db.withColumn("w0",
      when(col("x1") > 1.0, 0.0).otherwise(col("w")))
    val wz = SgdNet.relaxedFitWeighted(dz, Seq("x1", "x2"), "y", "w0", pb,
      gamma = 0.0)
    val filt = dz.filter(col("w0") > 0)
    val wf = SgdNet.relaxedFitWeighted(filt, Seq("x1", "x2"), "y", "w0", pb,
      gamma = 0.0)
    for (l <- 0 until 2; j <- 0 until 2)
      assert(math.abs(wz.olsBeta(l)(j) - wf.olsBeta(l)(j)) < 1e-9,
        s"zero-drop ols($l)($j)")
  }

  test("relax + offset: GLR anchor, zero-offset collapse, weights, sparse, gaussian (round 17)") {
    val db = SparkSpec.binaryDF(spark)
      .withColumn("off", col("x2") * 0.4 + lit(0.2))
      .withColumn("w", (pmod(xxhash64(col("x1")), lit(3)) + 1).cast("double"))
      .withColumn("sidx", array(lit(0), lit(1)))
      .withColumn("svals", array(col("x1"), col("x2")))
    val pb = SgdNetParams(family = "binomial", alpha = 1.0,
      lambda = Array(0.02), thresh = 1e-9, maxit = 100000)
    // varying offset, gamma = 0: the unpenalized active-set refit must
    // equal spark.ml GLR with the same offset at regParam 0
    val rp = SgdNet.relaxedFitWithOffset(db, Seq("x1", "x2"), "y", "off",
      pb, gamma = 0.0)
    assert(rp.model.df(0) == 2, "both features should be active")
    val glr = new org.apache.spark.ml.regression.GeneralizedLinearRegression()
      .setFamily("binomial").setLink("logit").setOffsetCol("off")
      .setRegParam(0.0).setFitIntercept(true).setTol(1e-12).setMaxIter(300)
      .setFeaturesCol("fv").setLabelCol("y")
      .fit(assembled(db, Array("x1", "x2")))
    assert(math.abs(rp.olsA0(0) - glr.intercept) < 1e-5,
      s"a0 ${rp.olsA0(0)} vs ${glr.intercept}")
    for (j <- 0 until 2)
      assert(math.abs(rp.olsBeta(0)(j) - glr.coefficients(j)) < 1e-5,
        s"b$j ${rp.olsBeta(0)(j)} vs ${glr.coefficients(j)}")
    // zero offset == plain IRLS relax
    val z = db.withColumn("z0", lit(0.0))
    val r0 = SgdNet.relaxedFitWithOffset(z, Seq("x1", "x2"), "y", "z0", pb,
      gamma = 0.0)
    val rPlain = SgdNet.relaxedFitGlm(db, Seq("x1", "x2"), "y", pb,
      gamma = 0.0)
    for (j <- 0 until 2)
      assert(math.abs(r0.olsBeta(0)(j) - rPlain.olsBeta(0)(j)) < 1e-7,
        s"zero-off ols($j)")
    // offset + integer weights == row duplication
    val wr = SgdNet.relaxedFitWithOffset(db, Seq("x1", "x2"), "y", "off", pb,
      gamma = 0.0, weightCol = "w")
    val dup = db.withColumn("k", explode(sequence(lit(1), col("w").cast("int"))))
    val dr = SgdNet.relaxedFitWithOffset(dup, Seq("x1", "x2"), "y", "off", pb,
      gamma = 0.0)
    for (j <- 0 until 2)
      assert(math.abs(wr.olsBeta(0)(j) - dr.olsBeta(0)(j)) < 1e-6,
        s"w+off ols($j)")
    // sparse twin matches dense
    val sr = SgdNet.relaxedFitGlmSparse(db, "sidx", "svals", 2, "y", pb,
      gamma = 0.0, offsetCol = "off")
    for (j <- 0 until 2)
      assert(math.abs(sr.olsBeta(0)(j) - rp.olsBeta(0)(j)) < 1e-7,
        s"sparse+off ols($j)")
    // poisson offset null for an empty active set: exposure MLE
    val dp = SparkSpec.regressionDF(spark)
      .withColumn("yp", ceil(abs(col("y"))).cast("double"))
      .withColumn("off", col("x2") * 0.1)
    val pp = SgdNetParams(family = "poisson", alpha = 1.0,
      lambda = Array(1e6), thresh = 1e-9, maxit = 100000)
    val rNull = SgdNet.relaxedFitWithOffset(dp, Seq("x1"), "yp", "off", pp,
      gamma = 0.0)
    val exp30 = exp(greatest(least(col("off"), lit(30.0)), lit(-30.0)))
    val row = dp.agg(sum(col("yp")).as("sy"), sum(exp30).as("se")).head
    assert(math.abs(rNull.olsA0(0) -
      math.log(row.getDouble(0) / row.getDouble(1))) < 1e-9, "poisson off-null")
    // gaussian delegation: relaxedFitWithOffset == relaxedFit on y - off
    val dg = SparkSpec.regressionDF(spark).withColumn("off", col("x3") * 0.5)
    val pg = SgdNetParams(alpha = 1.0, lambda = Array(0.5, 0.05),
      thresh = 1e-10, maxit = 100000)
    val go = SgdNet.relaxedFitWithOffset(dg, Seq("x1", "x2"), "y", "off", pg,
      gamma = 0.25)
    val gAdj = dg.withColumn("ya", col("y") - col("off"))
    val gd = SgdNet.relaxedFit(gAdj, Seq("x1", "x2"), "ya", pg, gamma = 0.25)
    for (l <- 0 until 2; j <- 0 until 2)
      assert(math.abs(go.olsBeta(l)(j) - gd.olsBeta(l)(j)) < 1e-10,
        s"gaussian delegation ols($l)($j)")
    ()
  }

  test("refit score equations vanish on random weighted+offset problems (round 17)") {
    // direct optimality check with no external anchor: the converged
    // unpenalized refit must satisfy the v-weighted GLM score equations
    // sum v*(y - mu)*[1, x_A] = 0 with mu evaluated at eta + offset
    import spark.implicits._
    for (trial <- 1 to 2) {
      val rnd = new scala.util.Random(900 + trial)
      val binomialT = trial % 2 == 1
      val rows = (1 to 300).map { _ =>
        val x1 = rnd.nextGaussian(); val x2 = rnd.nextGaussian()
        val x3 = rnd.nextGaussian()
        val off = 0.3 * x2 + 0.1
        val eta = 0.4 + 1.1 * x1 - 0.6 * x3 + off
        val y =
          if (binomialT) {
            if (rnd.nextDouble() < 1.0 / (1.0 + math.exp(-eta))) 1.0 else 0.0
          } else {
            // poisson-ish counts from the rate
            val mu = math.exp(math.min(eta, 3.0))
            math.floor(mu + rnd.nextGaussian() * math.sqrt(mu)).max(0.0)
          }
        (x1, x2, x3, off, y, (rnd.nextInt(3) + 1).toDouble)
      }
      val df = rows.toDF("x1", "x2", "x3", "off", "y", "w")
      val fam = if (binomialT) "binomial" else "poisson"
      val params = SgdNetParams(family = fam, alpha = 1.0,
        lambda = Array(0.08, 0.02), thresh = 1e-10, maxit = 100000)
      val rp = SgdNet.relaxedFitGlm(df, Seq("x1", "x2", "x3"), "y", params,
        gamma = 0.0, weightCol = "w", offsetCol = "off")
      val data = rows
      for (l <- 0 until 2) {
        val b = rp.olsBeta(l); val a0 = rp.olsA0(l)
        val active = (0 until 3).filter(j => b(j) != 0.0)
        var s0 = 0.0
        val sj = new Array[Double](3)
        var sw = 0.0
        data.foreach { case (x1, x2, x3, off, y, w) =>
          val xs = Array(x1, x2, x3)
          var eta = a0 + off
          for (j <- 0 until 3) eta += b(j) * xs(j)
          val mu = if (binomialT) 1.0 / (1.0 + math.exp(-eta))
            else math.exp(math.max(math.min(eta, 30.0), -30.0))
          s0 += w * (y - mu)
          for (j <- 0 until 3) sj(j) += w * (y - mu) * xs(j)
          sw += w
        }
        assert(math.abs(s0 / sw) < 1e-6, s"$fam trial $trial score a0($l): ${s0 / sw}")
        for (j <- active)
          assert(math.abs(sj(j) / sw) < 1e-6,
            s"$fam trial $trial score x$j($l): ${sj(j) / sw}")
      }
    }
  }
}
