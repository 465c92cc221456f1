package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Lambda interpolation, npasses accounting, sparse input. */
class PredictSpec extends SparkSpec {
  import spark.implicits._

  test("atLambda interpolates linearly between path points and clamps") {
    val df = SparkSpec.regressionDF(spark)
    val m = SgdNet.fit(df, Seq("x1", "x2"), "y",
      SgdNetParams(alpha = 1.0, nlambda = 10, thresh = 1e-9))
    // exactly on a path point
    val (a0At, bAt) = m.atLambda(m.lambda(3))
    assert(math.abs(a0At(0) - m.a0(3)(0)) < 1e-12)
    for (j <- 0 until 2) assert(math.abs(bAt(0)(j) - m.beta(3)(0)(j)) < 1e-12)
    // midpoint between points 3 and 4
    val mid = (m.lambda(3) + m.lambda(4)) / 2
    val frac = (mid - m.lambda(4)) / (m.lambda(3) - m.lambda(4))
    val (_, bMid) = m.atLambda(mid)
    for (j <- 0 until 2) {
      val expect = frac * m.beta(3)(0)(j) + (1 - frac) * m.beta(4)(0)(j)
      assert(math.abs(bMid(0)(j) - expect) < 1e-12)
    }
    // clamping beyond the ends
    val (_, bHi) = m.atLambda(m.lambda(0) * 10)
    for (j <- 0 until 2) assert(bHi(0)(j) == m.beta(0)(0)(j))
    val (_, bLo) = m.atLambda(m.lambda.last / 10)
    for (j <- 0 until 2) assert(bLo(0)(j) == m.beta.last(0)(j))
  }

  test("npasses: gaussian path uses ONE data pass; binomial counts IRLS passes") {
    val df = SparkSpec.regressionDF(spark)
    val m = SgdNet.fit(df, Seq("x1", "x2"), "y", SgdNetParams(nlambda = 50))
    // npasses for gaussian counts CD sweeps (driver-side); the cluster work
    // is exactly one aggregation regardless of path length — verified by
    // construction (solveGaussianFromStats takes only GramStats)
    assert(m.npasses > 0)
    val db = SparkSpec.binaryDF(spark)
    val mb = SgdNet.fit(db, Seq("x1", "x2"), "y",
      SgdNetParams(family = "binomial", lambda = Array(0.1, 0.05)))
    assert(mb.npasses >= 2, "at least one IRLS pass per lambda")
  }

  test("score() measures: deviance==mse for gaussian, mae, class error") {
    val df = SparkSpec.regressionDF(spark)
    val m = SgdNet.fit(df, Seq("x1", "x2"), "y",
      SgdNetParams(alpha = 1.0, nlambda = 3, thresh = 1e-8))
    val dev = m.score(df, "deviance").collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    val mse = m.score(df, "mse").collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    dev.foreach { case (l, v) => assert(v == mse(l), s"deviance==mse at $l") }
    val mae = m.score(df, "mae").collect()
    assert(mae.length == 3 && mae.forall(_.getDouble(2) > 0))
    val db = SparkSpec.binaryDF(spark)
    val mb = SgdNet.fit(db, Seq("x1", "x2"), "y",
      SgdNetParams(family = "binomial", lambda = Array(0.02), thresh = 1e-7))
    val cls = mb.score(db, "class").head.getDouble(2)
    assert(cls > 0 && cls < 0.3, s"class error $cls")
    // binomial deviance/mse per the reference's one-hot definitions
    val bdev = mb.score(db, "deviance").head.getDouble(2)
    val bmse = mb.score(db, "mse").head.getDouble(2)
    val manualDev = db.selectExpr(
      s"avg(-2 * (y * ln(least(greatest(${"1.0/(1.0+exp(-(" +
        mb.a0(0)(0) + " + x1*" + mb.beta(0)(0)(0) + " + x2*" + mb.beta(0)(0)(1) + ")))"}, 1e-5), 1.0-1e-5)) " +
        s"+ (1-y) * ln(1 - least(greatest(${"1.0/(1.0+exp(-(" +
        mb.a0(0)(0) + " + x1*" + mb.beta(0)(0)(0) + " + x2*" + mb.beta(0)(0)(1) + ")))"}, 1e-5), 1.0-1e-5))))")
      .head.getDouble(0)
    assert(math.abs(bdev - manualDev) < 1e-9, s"$bdev vs $manualDev")
    assert(bmse > 0 && bmse < 2.0)
  }

  test("refit merges extra lambdas and agrees with direct fits (exact predict)") {
    val df = SparkSpec.regressionDF(spark)
    val m = SgdNet.fit(df, Seq("x1", "x2"), "y",
      SgdNetParams(alpha = 1.0, nlambda = 5, thresh = 1e-9))
    val s = (m.lambda(1) + m.lambda(2)) / 2 // off-path
    val r = SgdNet.refit(m, df, Seq(s))
    assert(r.lambda.length == 6 && r.lambda.contains(s))
    assert(r.lambda.sliding(2).forall(a => a(0) > a(1)))
    // exact solution at s equals a direct fit at s
    val direct = SgdNet.fit(df, Seq("x1", "x2"), "y",
      SgdNetParams(alpha = 1.0, lambda = Array(s), thresh = 1e-9))
    val idx = r.lambda.indexOf(s)
    for (j <- 0 until 2)
      assert(math.abs(r.beta(idx)(0)(j) - direct.beta(0)(0)(j)) < 1e-6)
  }

  test("sparse input matches the dense fit exactly") {
    val rnd = new scala.util.Random(3)
    val rows = (1 to 300).map { _ =>
      // ~70% sparse row over 6 features
      val dense = Array.tabulate(6)(j =>
        if (rnd.nextDouble() < 0.3) rnd.nextGaussian() else 0.0)
      val y = 1.0 + dense.zipWithIndex.map { case (v, j) => v * (j + 1) * 0.5 }.sum +
        rnd.nextGaussian() * 0.1
      val idx = dense.indices.filter(dense(_) != 0.0).toArray
      (idx, idx.map(dense), dense.toSeq, y)
    }
    val sparseDf = rows.map(r => (r._1, r._2, r._4)).toDF("idx", "vals", "y")
    val denseDf = rows.map(r => (r._3(0), r._3(1), r._3(2), r._3(3), r._3(4), r._3(5), r._4))
      .toDF("v0", "v1", "v2", "v3", "v4", "v5", "y")
    for ((alpha, lam) <- Seq((1.0, 0.05), (0.0, 0.2))) {
      val ms = SgdNet.fitSparse(sparseDf, "idx", "vals", 6, "y",
        SgdNetParams(alpha = alpha, lambda = Array(lam), thresh = 1e-10, maxit = 100000))
      val md = SgdNet.fit(denseDf, (0 until 6).map(j => s"v$j"), "y",
        SgdNetParams(alpha = alpha, lambda = Array(lam), thresh = 1e-10, maxit = 100000))
      for (j <- 0 until 6)
        assert(math.abs(ms.beta(0)(0)(j) - md.beta(0)(0)(j)) < 1e-10,
          s"alpha=$alpha sparse/dense beta_$j")
      assert(math.abs(ms.a0(0)(0) - md.a0(0)(0)) < 1e-10)
    }
  }

  test("sparse binomial and poisson IRLS match their dense fits") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 400).map { _ =>
      val dense = Array.tabulate(4)(_ =>
        if (rnd.nextDouble() < 0.4) rnd.nextGaussian() else 0.0)
      val eta = -0.3 + dense(0) * 1.2 - dense(1) * 0.8 + dense(2) * 0.5
      val pb = 1.0 / (1.0 + math.exp(-eta))
      val yb = if (rnd.nextDouble() < pb) 1.0 else 0.0
      val yp = {
        // Poisson-ish counts from a log-link mean, deterministic-ish draw
        val mu = math.exp(0.5 + dense(0) * 0.3 - dense(3) * 0.4)
        math.floor(mu + rnd.nextGaussian() * math.sqrt(mu)).max(0.0)
      }
      val idx = dense.indices.filter(dense(_) != 0.0).toArray
      (idx, idx.map(dense), dense.toSeq, yb, yp)
    }
    val sparseDf = rows.map(r => (r._1, r._2, r._4, r._5))
      .toDF("idx", "vals", "yb", "yp")
    val denseDf = rows.map(r => (r._3(0), r._3(1), r._3(2), r._3(3), r._4, r._5))
      .toDF("v0", "v1", "v2", "v3", "yb", "yp")
    val feats = (0 until 4).map(j => s"v$j")
    for ((family, label) <- Seq(("binomial", "yb"), ("poisson", "yp"))) {
      val params = SgdNetParams(family = family, alpha = 0.5,
        lambda = Array(0.05, 0.01), thresh = 1e-8, maxit = 100000)
      val ms = SgdNet.fitSparse(sparseDf, "idx", "vals", 4, label, params)
      val md = SgdNet.fit(denseDf, feats, label, params)
      for (l <- 0 until 2; j <- 0 until 4)
        assert(math.abs(ms.beta(l)(0)(j) - md.beta(l)(0)(j)) < 1e-8,
          s"$family sparse/dense beta($l)($j): ${ms.beta(l)(0)(j)} vs ${md.beta(l)(0)(j)}")
      for (l <- 0 until 2)
        assert(math.abs(ms.a0(l)(0) - md.a0(l)(0)) < 1e-8, s"$family a0($l)")
      assert(math.abs(ms.nulldev - md.nulldev) < 1e-6 * math.max(1.0, md.nulldev))
      for (l <- 0 until 2)
        assert(math.abs(ms.devRatio(l) - md.devRatio(l)) < 1e-8)
    }
  }

  test("sparse GLM box limits match the dense bounded fits") {
    val rnd = new scala.util.Random(17)
    val rows = (1 to 400).map { _ =>
      val dense = Array.tabulate(3)(_ =>
        if (rnd.nextDouble() < 0.5) rnd.nextGaussian() else 0.0)
      // v1's true effect is NEGATIVE so the non-negative bound binds
      val eta = 0.2 + dense(0) * 1.0 - dense(1) * 1.5
      val yb = if (rnd.nextDouble() < 1.0 / (1.0 + math.exp(-eta))) 1.0 else 0.0
      val idx = dense.indices.filter(dense(_) != 0.0).toArray
      (idx, idx.map(dense), dense.toSeq, yb)
    }
    val sparseDf = rows.map(r => (r._1, r._2, r._4)).toDF("idx", "vals", "yb")
    val denseDf = rows.map(r => (r._3(0), r._3(1), r._3(2), r._4))
      .toDF("v0", "v1", "v2", "yb")
    val params = SgdNetParams(family = "binomial", alpha = 1.0,
      lambda = Array(0.01), thresh = 1e-9, maxit = 100000,
      lowerLimits = Array(0.0, 0.0, 0.0))
    val ms = SgdNet.fitSparse(sparseDf, "idx", "vals", 3, "yb", params)
    val md = SgdNet.fit(denseDf, Seq("v0", "v1", "v2"), "yb", params)
    assert(ms.beta(0)(0)(1) == 0.0 && md.beta(0)(0)(1) == 0.0,
      "the bound must bind on the negative coefficient")
    for (j <- 0 until 3)
      assert(math.abs(ms.beta(0)(0)(j) - md.beta(0)(0)(j)) < 1e-8, s"beta_$j")
    assert(math.abs(ms.a0(0)(0) - md.a0(0)(0)) < 1e-8)
    // invalid limits reject on the sparse route too
    intercept[IllegalArgumentException] {
      SgdNet.fitSparse(sparseDf, "idx", "vals", 3, "yb",
        params.copy(lowerLimits = Array(0.5, 0.0, 0.0)))
    }
    ()
  }

  test("sparse predict matches dense predict on the same model (all types)") {
    val rnd = new scala.util.Random(21)
    val rows = (1 to 300).map { i =>
      val dense = Array.tabulate(5)(_ =>
        if (rnd.nextDouble() < 0.4) rnd.nextGaussian() else 0.0)
      val eta = 0.4 + dense(0) * 1.4 - dense(1) * 0.9
      val yb = if (rnd.nextDouble() < 1.0 / (1.0 + math.exp(-eta))) 1.0 else 0.0
      val y = 1.0 + dense.zipWithIndex.map { case (v, j) => v * (j + 1) * 0.4 }.sum +
        rnd.nextGaussian() * 0.1
      val idx = dense.indices.filter(dense(_) != 0.0).toArray
      (i.toLong, idx, idx.map(dense), dense.toSeq, y, yb)
    }
    val sp = rows.map(r => (r._1, r._2, r._3, r._5, r._6))
      .toDF("id", "idx", "vals", "y", "yb")
    // dense columns named V0..V4 — fitSparse's featureNames — so the SAME
    // model predicts both representations
    val de = rows.map(r => (r._1, r._4(0), r._4(1), r._4(2), r._4(3), r._4(4),
        r._5, r._6))
      .toDF("id", "V0", "V1", "V2", "V3", "V4", "y", "yb")
    def byId(df: org.apache.spark.sql.DataFrame, c: String): Map[Long, Double] =
      df.select(col("id"), col(c).cast("double")).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // gaussian link
    val mg = SgdNet.fitSparse(sp, "idx", "vals", 5, "y",
      SgdNetParams(alpha = 1.0, lambda = Array(0.05), thresh = 1e-10))
    val gs = byId(mg.predictSparse(sp, "idx", "vals", "link"), "pred_0")
    val gd = byId(mg.predict(de, "link"), "pred_0")
    for (i <- gs.keys) assert(math.abs(gs(i) - gd(i)) < 1e-12, s"gaussian link row $i")
    // binomial response + class
    val mb = SgdNet.fitSparse(sp, "idx", "vals", 5, "yb",
      SgdNetParams(family = "binomial", alpha = 0.5, lambda = Array(0.02),
        thresh = 1e-8, maxit = 100000))
    val bs = byId(mb.predictSparse(sp, "idx", "vals", "response"), "pred_0")
    val bd = byId(mb.predict(de, "response"), "pred_0")
    for (i <- bs.keys) assert(math.abs(bs(i) - bd(i)) < 1e-12, s"binomial response row $i")
    val cs = mb.predictSparse(sp, "idx", "vals", "class")
      .select("id", "pred_0").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val cd = mb.predict(de, "class")
      .select("id", "pred_0").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cs == cd, "binomial class predictions must agree")
  }

  test("sparse multinomial FISTA matches the dense fit") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 450).map { _ =>
      val dense = Array.tabulate(4)(_ =>
        if (rnd.nextDouble() < 0.4) rnd.nextGaussian() else 0.0)
      val etas = Array(
        0.2 + dense(0) * 1.5 - dense(1) * 0.5,
        -0.1 - dense(0) * 0.7 + dense(2) * 1.1,
        0.0 + dense(1) * 0.9 - dense(3) * 0.6)
      val mx = etas.max
      val ps = etas.map(e => math.exp(e - mx))
      val z = ps.sum
      var u = rnd.nextDouble() * z
      var cls = 0
      while (cls < 2 && u > ps(cls)) { u -= ps(cls); cls += 1 }
      val idx = dense.indices.filter(dense(_) != 0.0).toArray
      (idx, idx.map(dense), dense.toSeq, s"c$cls")
    }
    val sparseDf = rows.map(r => (r._1, r._2, r._4)).toDF("idx", "vals", "y")
    val denseDf = rows.map(r => (r._3(0), r._3(1), r._3(2), r._3(3), r._4))
      .toDF("v0", "v1", "v2", "v3", "y")
    for (tpe <- Seq("ungrouped", "grouped")) {
      val params = SgdNetParams(family = "multinomial", alpha = 1.0,
        lambda = Array(0.02), thresh = 1e-7, maxit = 100000,
        typeMultinomial = tpe)
      val ms = SgdNet.fitSparse(sparseDf, "idx", "vals", 4, "y", params)
      val md = SgdNet.fit(denseDf, (0 until 4).map(j => s"v$j"), "y", params)
      assert(ms.classLabels.toSeq == md.classLabels.toSeq)
      for (t <- 0 until 3; j <- 0 until 4)
        assert(math.abs(ms.beta(0)(t)(j) - md.beta(0)(t)(j)) < 1e-7,
          s"$tpe sparse/dense beta($t)($j): ${ms.beta(0)(t)(j)} vs ${md.beta(0)(t)(j)}")
      for (t <- 0 until 3)
        assert(math.abs(ms.a0(0)(t) - md.a0(0)(t)) < 1e-7, s"$tpe a0($t)")
      assert(math.abs(ms.devRatio(0) - md.devRatio(0)) < 1e-8)
    }
  }

  test("devResidCol: gaussian = y − ŷ; binomial squares sum to the deviance") {
    import org.apache.spark.sql.functions._
    val df = SparkSpec.regressionDF(spark)
    val m = SgdNet.fit(df, Seq("x1", "x2"), "y",
      SgdNetParams(lambda = Array(0.0), thresh = 1e-10))
    val gap = df.select((col("y") - m.linkCol(0) -
        m.devResidCol(col("y"), 0)).as("g"))
      .selectExpr("max(abs(g))").head.getDouble(0)
    assert(gap == 0.0, "gaussian deviance residual is the raw residual")
    val db = SparkSpec.binaryDF(spark)
    val mb = SgdNet.fit(db, Seq("x1", "x2"), "y",
      SgdNetParams(family = "binomial", lambda = Array(0.02), thresh = 1e-7))
    val ssr = db.select(mb.devResidCol(col("y"), 0).as("r"))
      .selectExpr("sum(r * r)").head.getDouble(0)
    val manual = db.select((lit(-2.0) * (col("y") * log(mb.responseCol(0))
        + (lit(1.0) - col("y")) * log(lit(1.0) - mb.responseCol(0)))).as("d"))
      .selectExpr("sum(d)").head.getDouble(0)
    assert(math.abs(ssr - manual) < 1e-6, s"$ssr vs $manual")
    // signs follow y − μ
    val signs = db.select(signum(col("y") - mb.responseCol(0)).as("s"),
        signum(mb.devResidCol(col("y"), 0)).as("r"))
      .selectExpr("max(abs(s - r))").head.getDouble(0)
    assert(signs == 0.0)
    // poisson: y = 0 rows stay finite
    val dp = Seq((0.0, 0.0), (1.0, 2.0), (2.0, 5.0), (3.0, 9.0), (0.5, 1.0))
      .toDF("x1", "y")
    val mp = SgdNet.fit(dp, Seq("x1"), "y",
      SgdNetParams(family = "poisson", lambda = Array(0.0), thresh = 1e-9))
    val rs = dp.select(mp.devResidCol(col("y"), 0).as("r"))
      .collect().map(_.getDouble(0))
    assert(rs.forall(v => !v.isNaN && !v.isInfinite), rs.mkString(","))
    intercept[IllegalArgumentException] {
      val mm = SgdNet.fit(db.withColumn("c", (col("y") * 2).cast("int")),
        Seq("x1"), "c", SgdNetParams(family = "multinomial",
          lambda = Array(0.05), maxit = 10))
      mm.devResidCol(col("c"), 0)
    }
  }

  test("predictWithOffset: newoffset adds to every linear predictor") {
    val db = SparkSpec.binaryDF(spark).withColumn("noff", col("x1") * 0.5)
    val m = SgdNet.fitWithOffset(db, Seq("x1", "x2"), "y", "noff",
      SgdNetParams(family = "binomial", lambda = Array(0.02),
        thresh = 1e-9, maxit = 10000))
    // link/response with the offset == hand math on the coefficients
    val got = m.predictWithOffset(
        m.predictWithOffset(db, Seq("noff"), "link")
          .withColumnRenamed("pred_0", "eta"),
        Seq("noff"), "response").withColumnRenamed("pred_0", "mu")
      .select("x1", "x2", "noff", "eta", "mu").collect()
    got.foreach { r =>
      val eta = m.a0(0)(0) + m.beta(0)(0)(0) * r.getDouble(0) +
        m.beta(0)(0)(1) * r.getDouble(1) + r.getDouble(2)
      assert(math.abs(r.getDouble(3) - eta) < 1e-12, "link")
      assert(math.abs(r.getDouble(4) - 1.0 / (1.0 + math.exp(-eta))) < 1e-12,
        "response")
    }
    // class cut happens AFTER the offset is added
    val cls = m.predictWithOffset(db, Seq("noff"), "class")
      .select(col("pred_0"), m.linkCol(0) + col("noff") > 0.0)
      .collect()
    cls.foreach { r =>
      assert((r.getString(0) == m.classLabels(1)) == r.getBoolean(1), "class cut")
    }
    // multinomial: one offset column per class, argmax over shifted etas
    val md = SparkSpec.regressionDF(spark)
      .withColumn("c", (pmod(ceil(col("y") * 7), lit(3))).cast("int"))
      .withColumn("o0", col("x1") * 0.2)
      .withColumn("o1", lit(0.0)).withColumn("o2", -col("x2") * 0.3)
    val mm = SgdNet.fitMultinomialWithOffset(md, Seq("x1", "x2"), "c",
      Seq("o0", "o1", "o2"), SgdNetParams(family = "multinomial",
        lambda = Array(0.02), thresh = 1e-8, maxit = 5000))
    val rows = mm.predictWithOffset(md, Seq("o0", "o1", "o2"), "class")
      .select("x1", "x2", "o0", "o1", "o2", "pred_0").collect()
    rows.foreach { r =>
      val etas = Array.tabulate(3)(t => mm.a0(0)(t) +
        mm.beta(0)(t)(0) * r.getDouble(0) + mm.beta(0)(t)(1) * r.getDouble(1) +
        r.getDouble(2 + t))
      val want = mm.classLabels(etas.indexOf(etas.max))
      assert(r.getString(5) == want, "multinomial argmax with offsets")
    }
    intercept[IllegalArgumentException] {
      mm.predictWithOffset(md, Seq("o0"), "link")
    }
    ()
  }
}
