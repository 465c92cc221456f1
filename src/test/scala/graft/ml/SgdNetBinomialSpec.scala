package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SgdNetBinomialSpec extends SparkSpec {

  test("logistic regression matches spark.ml (same objective)") {
    // Compare on pre-standardized features with standardization=false on
    // both sides: isolates the solvers from spark.ml's sample-sd
    // standardization convention (graft uses population sd like glmnet).
    val raw = SparkSpec.binaryDF(spark)
    val st = raw.agg(avg("x1"), stddev_pop("x1"), avg("x2"), stddev_pop("x2")).head
    val df = raw
      .withColumn("z1", (col("x1") - st.getDouble(0)) / st.getDouble(1))
      .withColumn("z2", (col("x2") - st.getDouble(2)) / st.getDouble(3))
    for ((alpha, lam) <- Seq((0.0, 0.1), (1.0, 0.02), (0.5, 0.05))) {
      val m = SgdNet.fit(df, Seq("z1", "z2"), "y",
        SgdNetParams(family = "binomial", alpha = alpha, lambda = Array(lam),
          standardize = false, thresh = 1e-9, maxit = 100000))
      import org.apache.spark.ml.feature.VectorAssembler
      import org.apache.spark.ml.classification.LogisticRegression
      val va = new VectorAssembler().setInputCols(Array("z1", "z2")).setOutputCol("f")
      val ml = new LogisticRegression().setFeaturesCol("f").setLabelCol("y")
        .setRegParam(lam).setElasticNetParam(alpha).setStandardization(false)
        .setMaxIter(100000).setTol(1e-15).fit(va.transform(df))
      for (j <- 0 until 2)
        assert(math.abs(m.beta(0)(0)(j) - ml.coefficients(j)) < 1e-6,
          s"alpha=$alpha lam=$lam beta_$j: ${m.beta(0)(0)(j)} vs ${ml.coefficients(j)}")
      assert(math.abs(m.a0(0)(0) - ml.intercept) < 1e-6)
    }
  }

  test("class labels sorted; coefficients model the second level") {
    val df = SparkSpec.binaryDF(spark)
      .withColumn("lbl", when(col("y") === 1.0, "pos").otherwise("neg"))
    val m = SgdNet.fit(df, Seq("x1", "x2"), "lbl",
      SgdNetParams(family = "binomial", lambda = Array(0.05)))
    assert(m.classLabels.toSeq == Seq("neg", "pos"))
    // x1 has positive true effect on P(pos)
    assert(m.beta(0)(0)(0) > 0)
  }

  test("predict response/class columns") {
    val df = SparkSpec.binaryDF(spark)
    val m = SgdNet.fit(df, Seq("x1", "x2"), "y",
      SgdNetParams(family = "binomial", lambda = Array(0.01), thresh = 1e-8))
    val pred = df.select(
      m.responseCol(0).as("p"), m.classCol(0).as("c"), col("y"))
    val rows = pred.collect()
    assert(rows.forall(r => r.getDouble(0) >= 0 && r.getDouble(0) <= 1))
    // classification accuracy should beat the base rate comfortably
    val acc = rows.count(r => (r.getDouble(0) > 0.5) == (r.getDouble(2) == 1.0)).toDouble / rows.length
    assert(acc > 0.8, s"accuracy $acc")
  }

  test("deviance ratio increases along the path; nulldev is closed form") {
    val df = SparkSpec.binaryDF(spark)
    val m = SgdNet.fit(df, Seq("x1", "x2"), "y",
      SgdNetParams(family = "binomial", nlambda = 8))
    val n = df.count().toDouble
    val p = df.agg(avg("y")).head.getDouble(0)
    val expected = -2.0 * n * (p * math.log(p) + (1 - p) * math.log(1 - p))
    assert(math.abs(m.nulldev - expected) < 1e-6)
    assert(m.devRatio.last > m.devRatio.head)
    assert(m.devRatio.head < 0.02, "lambda_max fit explains ~no deviance")
  }

  test("binomial rejects >2 or <2 classes") {
    val df3 = SparkSpec.multiclassDF(spark)
    val e = intercept[IllegalArgumentException] {
      SgdNet.fit(df3, Seq("x1", "x2"), "cls", SgdNetParams(family = "binomial"))
    }
    assert(e.getMessage.contains("multinomial"))
    val df1 = SparkSpec.binaryDF(spark).withColumn("one", lit("a"))
    intercept[IllegalArgumentException] {
      SgdNet.fit(df1, Seq("x1", "x2"), "one", SgdNetParams(family = "binomial"))
    }
  }

  test("AUC matches a hand-computed small case") {
    import spark.implicits._
    // scores: pos {3, 2}, neg {1, 2} -> pairs: (3>1)=1, (3>2)=1, (2>1)=1, (2==2)=0.5
    val df = Seq((3.0, 1.0), (2.0, 1.0), (1.0, 0.0), (2.0, 0.0)).toDF("s", "y")
    val auc = SgdNetModel.aucOf(df, "s", "y")
    assert(math.abs(auc - 3.5 / 4.0) < 1e-12)
  }
}
