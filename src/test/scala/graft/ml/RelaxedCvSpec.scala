package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Relaxed cross-validation (cv.glmnet relax = TRUE, round 16):
  * the γ = 1 slice must equal the plain CV, λ = 0 must collapse the
  * whole gamma grid (penalized == refit with everything active), the
  * fold cells must match hand-computed moment algebra, and integer
  * weights must reproduce row duplication. */
class RelaxedCvSpec extends SparkSpec {
  import spark.implicits._

  private lazy val data = {
    val rnd = new scala.util.Random(41)
    (1 to 500).map { i =>
      val x1 = rnd.nextGaussian() * 2.0 + 1.0
      val x2 = rnd.nextGaussian() * 0.5 - 2.0
      val x3 = rnd.nextGaussian()
      val y = 3.0 + 2.0 * x1 - 1.5 * x2 + rnd.nextGaussian() * 0.4
      (i.toLong, x1, x2, x3, y, (i % 3 + 1).toDouble)
    }.toDF("rid", "x1", "x2", "x3", "y", "w")
  }
  private def fold = pmod(xxhash64(col("rid")), lit(3))

  test("gamma = 1 slice == plain CV; lambda = 0 collapses the gamma grid") {
    val lambdas = Array(2.0, 0.5, 0.1, 0.0)
    val params = SgdNetParams(alpha = 1.0, lambda = lambdas, thresh = 1e-10,
      maxit = 100000)
    val r = CvSgdNet.fitRelaxed(data, Seq("x1", "x2", "x3"), "y", params,
      nfolds = 3, gammas = Seq(0.0, 0.5, 1.0), foldCol = fold)
    val plain = CvSgdNet.fit(data, Seq("x1", "x2", "x3"), Seq("y"), params,
      nfolds = 3, foldCol = fold)
    val g1 = r.paths(2)
    assert(g1.lambda.sameElements(plain.best.lambda))
    for (l <- lambdas.indices) {
      assert(math.abs(g1.cvm(l) - plain.best.cvm(l)) <
        1e-9 * math.max(1.0, plain.best.cvm(l)), s"gamma=1 cvm($l)")
      assert(math.abs(g1.cvsd(l) - plain.best.cvsd(l)) <
        1e-9 * math.max(1.0, plain.best.cvsd(l)), s"gamma=1 cvsd($l)")
    }
    // at lambda = 0 every coordinate is active and the refit IS the
    // penalized solution, so every gamma scores identically there
    val lZero = lambdas.indexOf(0.0)
    for (g <- 0 until 3)
      assert(math.abs(r.paths(g).cvm(lZero) - g1.cvm(lZero)) <
        1e-8 * math.max(1.0, g1.cvm(lZero)), s"lambda=0 gamma($g)")
    // full-data blended model: gamma=1 equals the penalized path model
    for (l <- lambdas.indices; j <- 0 until 3)
      assert(math.abs(r.paths(2).fit.beta(l)(0)(j) -
        r.relaxed.model.beta(l)(0)(j)) < 1e-12, "gamma=1 full fit")
  }

  test("fold cells match hand-computed penalized + refit moment algebra") {
    // 1 feature: penalized fold fit and OLS refit are closed forms
    val lam = 1.0
    val params = SgdNetParams(alpha = 1.0, lambda = Array(lam), thresh = 1e-10,
      maxit = 100000)
    val r = CvSgdNet.fitRelaxed(data, Seq("x1"), "y", params,
      nfolds = 3, gammas = Seq(0.0, 0.4, 1.0), foldCol = fold)
    val rows = data.withColumn("__f", fold).select("x1", "y", "__f").collect()
      .map(rw => (rw.getDouble(0), rw.getDouble(1), rw.getLong(2).toInt))
    for ((gm, gi) <- Seq((0.0, 0), (0.4, 1), (1.0, 2))) {
      val cells = (0 until 3).map { f =>
        val tr = rows.filter(_._3 != f)
        val te = rows.filter(_._3 == f)
        val n = tr.length.toDouble
        val mx = tr.map(_._1).sum / n
        val my = tr.map(_._2).sum / n
        val sd = math.sqrt(tr.map(t => (t._1 - mx) * (t._1 - mx)).sum / n)
        val cxy = tr.map(t => (t._1 - mx) * (t._2 - my)).sum / n
        val bPen = math.signum(cxy / sd) *
          math.max(math.abs(cxy / sd) - lam, 0.0) / sd
        val bOls = if (bPen != 0.0) (cxy / sd) / sd else 0.0
        val b = gm * bPen + (1 - gm) * bOls
        val a0 = my - b * mx
        te.map(t => math.pow(t._2 - a0 - b * t._1, 2)).sum / te.length
      }
      val cvm = cells.sum / 3.0
      assert(math.abs(r.paths(gi).cvm(0) - cvm) <
        1e-9 * math.max(1.0, cvm), s"gamma=$gm cvm")
    }
  }

  test("mae measure: one scoring aggregation matches hand-computed cells") {
    val lam = 1.0
    val params = SgdNetParams(alpha = 1.0, lambda = Array(lam), thresh = 1e-10,
      maxit = 100000)
    val r = CvSgdNet.fitRelaxed(data, Seq("x1"), "y", params,
      nfolds = 3, gammas = Seq(0.0, 1.0), measure = "mae", foldCol = fold)
    val rows = data.withColumn("__f", fold).select("x1", "y", "__f").collect()
      .map(rw => (rw.getDouble(0), rw.getDouble(1), rw.getLong(2).toInt))
    for ((gm, gi) <- Seq((0.0, 0), (1.0, 1))) {
      val cells = (0 until 3).map { f =>
        val tr = rows.filter(_._3 != f)
        val te = rows.filter(_._3 == f)
        val n = tr.length.toDouble
        val mx = tr.map(_._1).sum / n
        val my = tr.map(_._2).sum / n
        val sd = math.sqrt(tr.map(t => (t._1 - mx) * (t._1 - mx)).sum / n)
        val cxy = tr.map(t => (t._1 - mx) * (t._2 - my)).sum / n
        val bPen = math.signum(cxy / sd) *
          math.max(math.abs(cxy / sd) - lam, 0.0) / sd
        val bOls = if (bPen != 0.0) (cxy / sd) / sd else 0.0
        val b = gm * bPen + (1 - gm) * bOls
        val a0 = my - b * mx
        te.map(t => math.abs(t._2 - a0 - b * t._1)).sum / te.length
      }
      val cvm = cells.sum / 3.0
      assert(math.abs(r.paths(gi).cvm(0) - cvm) < 1e-9 * math.max(1.0, cvm),
        s"mae gamma=$gm")
    }
  }

  test("relaxed CV weighted: integer weights == row duplication") {
    val params = SgdNetParams(alpha = 1.0, lambda = Array(0.5, 0.05),
      thresh = 1e-10, maxit = 100000)
    val wr = CvSgdNet.fitRelaxed(data, Seq("x1", "x2"), "y", params,
      nfolds = 3, gammas = Seq(0.0, 1.0), foldCol = fold, weightCol = "w")
    val dup = data.withColumn("k",
      explode(sequence(lit(1), col("w").cast("int"))))
    val dr = CvSgdNet.fitRelaxed(dup, Seq("x1", "x2"), "y", params,
      nfolds = 3, gammas = Seq(0.0, 1.0), foldCol = fold)
    for (g <- 0 until 2; l <- 0 until 2) {
      assert(math.abs(wr.paths(g).cvm(l) - dr.paths(g).cvm(l)) <
        1e-8 * math.max(1.0, dr.paths(g).cvm(l)), s"dup cvm($g)($l)")
      for (j <- 0 until 2)
        assert(math.abs(wr.paths(g).fit.beta(l)(0)(j) -
          dr.paths(g).fit.beta(l)(0)(j)) < 1e-8, s"dup beta($g)($l)($j)")
    }
  }

  test("binomial relaxed CV: gamma=1 == plain CV; gamma=0 == per-fold refits") {
    val rnd = new scala.util.Random(43)
    val db = (1 to 500).map { i =>
      val x1 = rnd.nextGaussian(); val x2 = rnd.nextGaussian()
      val pb = 1.0 / (1.0 + math.exp(-(-0.3 + 1.2 * x1 - 0.4 * x2)))
      (i.toLong, x1, x2, if (rnd.nextDouble() < pb) 1.0 else 0.0)
    }.toDF("rid", "x1", "x2", "y")
    val foldB = pmod(xxhash64(col("rid")), lit(3))
    val lambdas = Array(0.05, 0.01)
    val params = SgdNetParams(family = "binomial", alpha = 1.0,
      lambda = lambdas, thresh = 1e-9, maxit = 100000)
    val r = CvSgdNet.fitRelaxed(db, Seq("x1", "x2"), "y", params,
      nfolds = 3, gammas = Seq(0.0, 1.0), foldCol = foldB)
    // gamma = 1 slice == the plain shared binomial CV
    val plain = CvSgdNet.fit(db, Seq("x1", "x2"), Seq("y"), params,
      nfolds = 3, foldCol = foldB)
    for (l <- lambdas.indices)
      assert(math.abs(r.paths(1).cvm(l) - plain.best.cvm(l)) <
        1e-6 * math.max(1.0, plain.best.cvm(l)), s"gamma=1 cvm($l)")
    // gamma = 0 cvm == manual per-fold relaxedFitGlm refits scored by hand
    val withF = db.withColumn("__f", foldB)
    for (l <- lambdas.indices) {
      var cvm = 0.0
      for (f <- 0 until 3) {
        val rp = SgdNet.relaxedFitGlm(withF.filter(col("__f") =!= f),
          Seq("x1", "x2"), "y", params)
        val test = withF.filter(col("__f") === f)
          .select("x1", "x2", "y").collect()
        var s = 0.0
        test.foreach { rw =>
          val eta = rp.olsA0(l) + rp.olsBeta(l)(0) * rw.getDouble(0) +
            rp.olsBeta(l)(1) * rw.getDouble(1)
          val mu0 = 1.0 / (1.0 + math.exp(-eta))
          val mu = math.min(math.max(mu0, 1e-5), 1.0 - 1e-5)
          val y = rw.getDouble(2)
          s += -2.0 * (y * math.log(mu) + (1 - y) * math.log(1 - mu))
        }
        cvm += s / test.length
      }
      cvm /= 3.0
      assert(math.abs(r.paths(0).cvm(l) - cvm) < 1e-4 * math.max(1.0, cvm),
        s"gamma=0 cvm($l): ${r.paths(0).cvm(l)} vs $cvm")
    }
    // poisson route + integer weights == duplication
    val dp = data.withColumn("yp", ceil(abs(col("y"))).cast("double"))
    val pp = SgdNetParams(family = "poisson", alpha = 1.0,
      lambda = Array(0.05, 0.01), thresh = 1e-9, maxit = 100000)
    val wr = CvSgdNet.fitRelaxed(dp, Seq("x1", "x2"), "yp", pp,
      nfolds = 3, gammas = Seq(0.0, 0.5), foldCol = fold, weightCol = "w")
    val dup = dp.withColumn("k",
      explode(sequence(lit(1), col("w").cast("int"))))
    val dr = CvSgdNet.fitRelaxed(dup, Seq("x1", "x2"), "yp", pp,
      nfolds = 3, gammas = Seq(0.0, 0.5), foldCol = fold)
    for (g <- 0 until 2; l <- 0 until 2)
      assert(math.abs(wr.paths(g).cvm(l) - dr.paths(g).cvm(l)) <
        1e-6 * math.max(1.0, dr.paths(g).cvm(l)), s"poisson dup cvm($g)($l)")
    intercept[IllegalArgumentException] {
      CvSgdNet.fitRelaxed(db, Seq("x1"), "y",
        SgdNetParams(family = "multinomial"), foldCol = foldB)
    }
    ()
  }

  test("sparse relaxed CV == dense (mse and mae, weighted; contracts)") {
    val sp = data.withColumn("sidx", array(lit(0), lit(1)))
      .withColumn("svals", array(col("x1"), col("x2")))
    val params = SgdNetParams(alpha = 1.0, lambda = Array(0.5, 0.05),
      thresh = 1e-10, maxit = 100000)
    for (measure <- Seq("deviance", "mae")) {
      val d = CvSgdNet.fitRelaxed(data, Seq("x1", "x2"), "y", params,
        nfolds = 3, gammas = Seq(0.0, 0.5, 1.0), measure = measure,
        foldCol = fold)
      val s = CvSgdNet.fitRelaxedSparse(sp, "sidx", "svals", 2, "y", params,
        nfolds = 3, gammas = Seq(0.0, 0.5, 1.0), measure = measure,
        foldCol = fold)
      for (g <- 0 until 3; l <- 0 until 2)
        assert(math.abs(s.paths(g).cvm(l) - d.paths(g).cvm(l)) <=
          1e-11 * math.max(1.0, d.paths(g).cvm(l)), s"$measure cvm($g)($l)")
    }
    // weighted delegation parity
    val dw = CvSgdNet.fitRelaxed(data, Seq("x1", "x2"), "y", params,
      nfolds = 3, gammas = Seq(0.0, 1.0), foldCol = fold, weightCol = "w")
    val sw = CvSgdNet.fitRelaxedSparse(sp, "sidx", "svals", 2, "y", params,
      nfolds = 3, gammas = Seq(0.0, 1.0), foldCol = fold, weightCol = "w")
    for (g <- 0 until 2; l <- 0 until 2)
      assert(math.abs(sw.paths(g).cvm(l) - dw.paths(g).cvm(l)) <=
        1e-11 * math.max(1.0, dw.paths(g).cvm(l)), s"w cvm($g)($l)")
    intercept[IllegalArgumentException] {
      CvSgdNet.fitRelaxedSparse(sp, "sidx", "svals", 2, "y",
        SgdNetParams(family = "mgaussian"), foldCol = fold)
    }
    ()
  }

  private lazy val binData = {
    val rnd = new scala.util.Random(43)
    (1 to 500).map { i =>
      val x1 = rnd.nextGaussian(); val x2 = rnd.nextGaussian()
      val pb = 1.0 / (1.0 + math.exp(-(-0.3 + 1.2 * x1 - 0.4 * x2)))
      (i.toLong, x1, x2, if (rnd.nextDouble() < pb) 1.0 else 0.0,
        (i % 3 + 1).toDouble)
    }.toDF("rid", "x1", "x2", "y", "w")
  }

  test("sparse relaxed GLM CV == dense (binomial, poisson; weighted)") {
    // round 17: the last cv.glmnet relax cell — dgCMatrix x with an
    // IRLS family. Sparse CSR rows carry the same two features, so any
    // divergence isolates the sparse fold-tiled chassis.
    val foldB = pmod(xxhash64(col("rid")), lit(3))
    val spB = binData.withColumn("sidx", array(lit(0), lit(1)))
      .withColumn("svals", array(col("x1"), col("x2")))
    val lambdas = Array(0.05, 0.01)
    val pb = SgdNetParams(family = "binomial", alpha = 1.0,
      lambda = lambdas, thresh = 1e-9, maxit = 100000)
    for (measure <- Seq("deviance", "class")) {
      val d = CvSgdNet.fitRelaxed(binData, Seq("x1", "x2"), "y", pb,
        nfolds = 3, gammas = Seq(0.0, 0.5, 1.0), measure = measure,
        foldCol = foldB)
      val s = CvSgdNet.fitRelaxedSparse(spB, "sidx", "svals", 2, "y", pb,
        nfolds = 3, gammas = Seq(0.0, 0.5, 1.0), measure = measure,
        foldCol = foldB)
      for (g <- 0 until 3; l <- lambdas.indices) {
        assert(math.abs(s.paths(g).cvm(l) - d.paths(g).cvm(l)) <=
          1e-7 * math.max(1.0, d.paths(g).cvm(l)),
          s"binomial $measure cvm($g)($l)")
        for (j <- 0 until 2)
          assert(math.abs(s.paths(g).fit.beta(l)(0)(j) -
            d.paths(g).fit.beta(l)(0)(j)) < 1e-6,
            s"binomial $measure beta($g)($l)($j)")
      }
      assert(s.paths.head.fit.classLabels
        .sameElements(d.paths.head.fit.classLabels))
    }
    // poisson, with a weight column riding along on both sides
    val dp = binData.withColumn("yp",
      (lit(1.0) + abs(col("x1")) * lit(2.0)).cast("int").cast("double"))
    val spP = dp.withColumn("sidx", array(lit(0), lit(1)))
      .withColumn("svals", array(col("x1"), col("x2")))
    val pp = SgdNetParams(family = "poisson", alpha = 1.0,
      lambda = Array(0.05, 0.01), thresh = 1e-9, maxit = 100000)
    val dP = CvSgdNet.fitRelaxed(dp, Seq("x1", "x2"), "yp", pp,
      nfolds = 3, gammas = Seq(0.0, 1.0), foldCol = foldB, weightCol = "w")
    val sP = CvSgdNet.fitRelaxedSparse(spP, "sidx", "svals", 2, "yp", pp,
      nfolds = 3, gammas = Seq(0.0, 1.0), foldCol = foldB, weightCol = "w")
    for (g <- 0 until 2; l <- 0 until 2)
      assert(math.abs(sP.paths(g).cvm(l) - dP.paths(g).cvm(l)) <=
        1e-7 * math.max(1.0, dP.paths(g).cvm(l)), s"poisson w cvm($g)($l)")
    // dev.ratio of the blended sparse full models stays a real ratio
    sP.paths.foreach(p => p.fit.devRatio.foreach(dr =>
      assert(dr >= -1e-9 && dr <= 1.0 + 1e-9)))
    ()
  }

  test("relaxed binomial CV auc: gamma=1 == plain CV; gamma=0 hand-scored") {
    val foldB = pmod(xxhash64(col("rid")), lit(3))
    val lambdas = Array(0.05, 0.01)
    val params = SgdNetParams(family = "binomial", alpha = 1.0,
      lambda = lambdas, thresh = 1e-9, maxit = 100000)
    val r = CvSgdNet.fitRelaxed(binData, Seq("x1", "x2"), "y", params,
      nfolds = 3, gammas = Seq(0.0, 1.0), measure = "auc", foldCol = foldB)
    // gamma = 1 blend IS the penalized fold model: identical eta ranks,
    // so the rank-AUC matches the plain binomial CV auc exactly
    val plain = CvSgdNet.fit(binData, Seq("x1", "x2"), Seq("y"), params,
      nfolds = 3, measure = "auc", foldCol = foldB)
    for (l <- lambdas.indices)
      assert(math.abs(r.paths(1).cvm(l) - plain.best.cvm(l)) <= 1e-12,
        s"gamma=1 auc($l): ${r.paths(1).cvm(l)} vs ${plain.best.cvm(l)}")
    // gamma = 0 blend scores the per-fold unpenalized refits: hand-rank
    // each held-out fold from relaxedFitGlm on the train rows
    val withF = binData.withColumn("__f", foldB)
    for (l <- lambdas.indices) {
      var cvm = 0.0
      for (f <- 0 until 3) {
        val rp = SgdNet.relaxedFitGlm(withF.filter(col("__f") =!= f),
          Seq("x1", "x2"), "y", params)
        val test = withF.filter(col("__f") === f)
          .select("x1", "x2", "y").collect()
        val scored = test.map { rw =>
          (rp.olsA0(l) + rp.olsBeta(l)(0) * rw.getDouble(0) +
            rp.olsBeta(l)(1) * rw.getDouble(1), rw.getDouble(2))
        }
        // midrank AUC over the scored fold
        val sorted = scored.sortBy(_._1)
        val nPos = sorted.count(_._2 == 1.0).toDouble
        val nNeg = sorted.length - nPos
        var i = 0
        var rankSum = 0.0
        while (i < sorted.length) {
          var j = i
          while (j < sorted.length && sorted(j)._1 == sorted(i)._1) j += 1
          val mid = (i + j + 1) / 2.0 // average of ranks i+1..j
          for (k <- i until j if sorted(k)._2 == 1.0) rankSum += mid
          i = j
        }
        cvm += (rankSum - nPos * (nPos + 1) / 2.0) / (nPos * nNeg)
      }
      cvm /= 3.0
      assert(math.abs(r.paths(0).cvm(l) - cvm) < 1e-6,
        s"gamma=0 auc($l): ${r.paths(0).cvm(l)} vs $cvm")
    }
    // sparse twin: same folds, same grid — auc parity with dense
    val spB = binData.withColumn("sidx", array(lit(0), lit(1)))
      .withColumn("svals", array(col("x1"), col("x2")))
    val s = CvSgdNet.fitRelaxedSparse(spB, "sidx", "svals", 2, "y", params,
      nfolds = 3, gammas = Seq(0.0, 1.0), measure = "auc", foldCol = foldB)
    for (g <- 0 until 2; l <- lambdas.indices)
      assert(math.abs(s.paths(g).cvm(l) - r.paths(g).cvm(l)) <= 1e-9,
        s"sparse auc cvm($g)($l)")
    // poisson still rejects auc on both routes
    intercept[IllegalArgumentException] {
      CvSgdNet.fitRelaxed(binData, Seq("x1"), "y",
        SgdNetParams(family = "poisson", lambda = Array(0.1)),
        measure = "auc", foldCol = foldB)
    }
    // round 18: relaxed auc selection MAXIMIZES (the cv.glmnet relax
    // convention) — bestGamma/lambda.min sit at the curve MAXIMUM, and
    // lambda.1se is the largest lambda with cvm >= max − sd; cvm stays
    // the raw AUC on every path. Dense and sparse agree.
    for (res <- Seq(r, s)) {
      val bestAuc = res.gammas.indices.map(g => res.paths(g).cvm.max).max
      assert(res.best.cvm.max == bestAuc, "bestGamma is the argmax path")
      val li = res.best.lambda.indexOf(res.best.lambdaMin)
      assert(res.best.cvm(li) == res.best.cvm.max,
        s"lambda.min at max auc: ${res.best.cvm(li)} vs ${res.best.cvm.max}")
      val cut = res.best.cvm(li) - res.best.cvsd(li)
      val i1se = res.best.lambda.indexOf(res.best.lambda1se)
      assert(res.best.cvm(i1se) >= cut - 1e-15, "1se within one sd of max")
      assert(!res.best.lambda.indices.exists(l =>
        l < i1se && res.best.cvm(l) >= cut - 1e-15),
        "1se is the LARGEST lambda within one sd")
    }
    // deviance still minimizes on the same data (unchanged convention)
    val rDev = CvSgdNet.fitRelaxed(binData, Seq("x1", "x2"), "y", params,
      nfolds = 3, gammas = Seq(0.0, 1.0), measure = "deviance",
      foldCol = foldB)
    val lDev = rDev.best.lambda.indexOf(rDev.best.lambdaMin)
    assert(rDev.best.cvm(lDev) == rDev.best.cvm.min,
      "deviance lambda.min at curve minimum")
    ()
  }

  test("coefAt returns the blended full-data coefficients; contracts") {
    val params = SgdNetParams(alpha = 1.0, lambda = Array(1.0, 0.1),
      thresh = 1e-10, maxit = 100000)
    val r = CvSgdNet.fitRelaxed(data, Seq("x1", "x2"), "y", params,
      nfolds = 3, gammas = Seq(0.0, 1.0), foldCol = fold)
    val (a0, b) = r.coefAt("lambda.min")
    val l = r.best.lambda.indexOf(r.best.lambdaMin)
    val g = r.bestGamma
    assert(math.abs(a0 - (g * r.relaxed.model.a0(l)(0) +
      (1 - g) * r.relaxed.olsA0(l))) < 1e-12)
    for (j <- 0 until 2)
      assert(math.abs(b(j) - (g * r.relaxed.model.beta(l)(0)(j) +
        (1 - g) * r.relaxed.olsBeta(l)(j))) < 1e-12)
    // dev.ratio of the blended full model is a real deviance ratio
    r.paths.foreach(p => p.fit.devRatio.foreach(dr =>
      assert(dr >= -1e-9 && dr <= 1.0 + 1e-9)))
    intercept[IllegalArgumentException] {
      CvSgdNet.fitRelaxed(data, Seq("x1"), "y",
        SgdNetParams(family = "mgaussian"), foldCol = fold)
    }
    intercept[IllegalArgumentException] {
      CvSgdNet.fitRelaxed(data, Seq("x1"), "y", SgdNetParams(),
        gammas = Seq(1.5), foldCol = fold)
    }
    ()
  }

  test("relaxed CV + offset: zero collapse, gamma=1 == offset CV, hand-scored refits, sparse, gaussian (round 17)") {
    val foldB = pmod(xxhash64(col("rid")), lit(3))
    val db = binData.withColumn("off", col("x2") * 0.4 + lit(0.2))
      .withColumn("sidx", array(lit(0), lit(1)))
      .withColumn("svals", array(col("x1"), col("x2")))
    val lambdas = Array(0.05, 0.01)
    val pb = SgdNetParams(family = "binomial", alpha = 1.0,
      lambda = lambdas, thresh = 1e-9, maxit = 100000)
    // zero offset == plain relaxed CV on every (gamma, lambda) cell
    val z = db.withColumn("z0", lit(0.0))
    val rz = CvSgdNet.fitRelaxed(z, Seq("x1", "x2"), "y", pb,
      nfolds = 3, gammas = Seq(0.0, 1.0), foldCol = foldB, offsetCol = "z0")
    val rp = CvSgdNet.fitRelaxed(db, Seq("x1", "x2"), "y", pb,
      nfolds = 3, gammas = Seq(0.0, 1.0), foldCol = foldB)
    for (g <- 0 until 2; l <- 0 until 2)
      assert(math.abs(rz.paths(g).cvm(l) - rp.paths(g).cvm(l)) <=
        1e-9 * math.max(1.0, rp.paths(g).cvm(l)), s"zero-off cvm($g)($l)")
    // varying offset, gamma = 1 slice == the plain binomial OFFSET CV
    val r = CvSgdNet.fitRelaxed(db, Seq("x1", "x2"), "y", pb,
      nfolds = 3, gammas = Seq(0.0, 1.0), foldCol = foldB,
      offsetCol = "off")
    val plain = CvSgdNet.fitWithOffset(db, Seq("x1", "x2"), "y", "off", pb,
      nfolds = 3, foldCol = foldB)
    for (l <- lambdas.indices)
      assert(math.abs(r.paths(1).cvm(l) - plain.best.cvm(l)) <=
        1e-6 * math.max(1.0, plain.best.cvm(l)), s"gamma=1 off cvm($l)")
    // gamma = 0 cvm == per-fold standalone offset refits scored by hand
    // (held-out deviance INCLUDES the row's own offset)
    val withF = db.withColumn("__f", foldB)
    for (l <- lambdas.indices) {
      var cvm = 0.0
      for (f <- 0 until 3) {
        val rpf = SgdNet.relaxedFitWithOffset(withF.filter(col("__f") =!= f),
          Seq("x1", "x2"), "y", "off", pb)
        val test = withF.filter(col("__f") === f)
          .select("x1", "x2", "y", "off").collect()
        var s = 0.0
        test.foreach { rw =>
          val eta = rpf.olsA0(l) + rpf.olsBeta(l)(0) * rw.getDouble(0) +
            rpf.olsBeta(l)(1) * rw.getDouble(1) + rw.getDouble(3)
          val mu0 = 1.0 / (1.0 + math.exp(-eta))
          val mu = math.min(math.max(mu0, 1e-5), 1.0 - 1e-5)
          val y = rw.getDouble(2)
          s += -2.0 * (y * math.log(mu) + (1 - y) * math.log(1 - mu))
        }
        cvm += s / test.length
      }
      cvm /= 3.0
      assert(math.abs(r.paths(0).cvm(l) - cvm) < 1e-4 * math.max(1.0, cvm),
        s"gamma=0 off cvm($l): ${r.paths(0).cvm(l)} vs $cvm")
    }
    // sparse twin == dense on the full (gamma, lambda) surface
    val s = CvSgdNet.fitRelaxedSparse(db, "sidx", "svals", 2, "y", pb,
      nfolds = 3, gammas = Seq(0.0, 1.0), foldCol = foldB,
      offsetCol = "off")
    for (g <- 0 until 2; l <- 0 until 2)
      assert(math.abs(s.paths(g).cvm(l) - r.paths(g).cvm(l)) <=
        1e-7 * math.max(1.0, r.paths(g).cvm(l)), s"sparse off cvm($g)($l)")
    // data-derived lambda path with an offset agrees dense == sparse
    val pAuto = SgdNetParams(family = "binomial", alpha = 1.0, nlambda = 5,
      thresh = 1e-9, maxit = 100000)
    val rA = CvSgdNet.fitRelaxed(db, Seq("x1", "x2"), "y", pAuto,
      nfolds = 3, gammas = Seq(1.0), foldCol = foldB, offsetCol = "off")
    val sA = CvSgdNet.fitRelaxedSparse(db, "sidx", "svals", 2, "y", pAuto,
      nfolds = 3, gammas = Seq(1.0), foldCol = foldB, offsetCol = "off")
    assert(rA.paths(0).lambda.length == sA.paths(0).lambda.length)
    for (l <- rA.paths(0).lambda.indices)
      assert(math.abs(rA.paths(0).lambda(l) - sA.paths(0).lambda(l)) <=
        1e-9 * rA.paths(0).lambda(l), s"auto-path lambda($l)")
    // gaussian: relaxed CV + offset == relaxed CV on y − offset
    val dg = data.withColumn("off", col("x3") * 0.5)
    val pg = SgdNetParams(alpha = 1.0, lambda = Array(0.5, 0.05),
      thresh = 1e-10, maxit = 100000)
    val gOff = CvSgdNet.fitRelaxed(dg, Seq("x1", "x2"), "y", pg,
      nfolds = 3, gammas = Seq(0.0, 1.0), foldCol = fold, offsetCol = "off")
    val gAdj = CvSgdNet.fitRelaxed(
      dg.withColumn("y", col("y") - col("off")), Seq("x1", "x2"), "y", pg,
      nfolds = 3, gammas = Seq(0.0, 1.0), foldCol = fold)
    for (g <- 0 until 2; l <- 0 until 2)
      assert(math.abs(gOff.paths(g).cvm(l) - gAdj.paths(g).cvm(l)) <=
        1e-11 * math.max(1.0, gAdj.paths(g).cvm(l)), s"gauss off cvm($g)($l)")
    ()
  }

  test("predictAt: blended predictions at the selected point (round 17)") {
    val params = SgdNetParams(alpha = 1.0, lambda = Array(0.5, 0.05),
      thresh = 1e-10, maxit = 100000)
    val r = CvSgdNet.fitRelaxed(data, Seq("x1", "x2"), "y", params,
      nfolds = 3, gammas = Seq(0.0, 0.5, 1.0), foldCol = fold)
    // predictions at lambda.min equal the coefAt blend applied by hand
    val (a0, b) = r.coefAt("lambda.min")
    val preds = r.predictAt(data, "lambda.min")
      .select("x1", "x2", "pred").collect()
    preds.foreach { rw =>
      val eta = a0 + b(0) * rw.getDouble(0) + b(1) * rw.getDouble(1)
      assert(math.abs(rw.getDouble(2) - eta) < 1e-9)
    }
    // binomial: response type stays in [0,1] and matches the blend
    val db = binData
    val foldB = pmod(xxhash64(col("rid")), lit(3))
    val rb = CvSgdNet.fitRelaxed(db, Seq("x1", "x2"), "y",
      SgdNetParams(family = "binomial", alpha = 1.0,
        lambda = Array(0.05, 0.01), thresh = 1e-9, maxit = 100000),
      nfolds = 3, gammas = Seq(0.0, 1.0), foldCol = foldB)
    val (a0b, bb) = rb.coefAt("lambda.min")
    rb.predictAt(db, "lambda.min", tpe = "response")
      .select("x1", "x2", "pred").collect().foreach { rw =>
        val mu = 1.0 / (1.0 + math.exp(-(a0b + bb(0) * rw.getDouble(0) +
          bb(1) * rw.getDouble(1))))
        assert(math.abs(rw.getDouble(2) - mu) < 1e-9)
        assert(rw.getDouble(2) >= 0 && rw.getDouble(2) <= 1)
      }
    intercept[IllegalArgumentException] { r.predictAt(data, tpe = "bogus") }
    ()
  }
}
