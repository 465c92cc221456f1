package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Concrete, mechanically-checkable bench baseline (BASELINE.json names
  * the "within 2× of baseline" criterion but carries no timings): fit
  * the SAME elastic-net objective on the SAME sf0.1 data with spark.ml
  * (the in-repo reference implementation of the reference's model
  * family) and with graft's path solver, and record the wall-clock
  * ratio.
  *
  * Workload: a 10-lambda lasso path, gaussian (LinearRegression) and
  * binomial (LogisticRegression), 3 features over the 600 k-row sf0.1
  * lineitem. spark.ml fits one regParam per `fit()` (no cross-lambda
  * warm start is exposed), so the path costs 10 sequential fits —
  * that IS the like-for-like cost a spark.ml user pays for the path
  * the reference (and graft) produce in one call.
  *
  * Output: one JSON line + `BASELINE_local.json`, which `graft.Bench`
  * folds into its report as `baseline_ratio_*` so every subsequent
  * bench file carries the ratio.
  */
object Baseline {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.ml.feature.VectorAssembler
    import org.apache.spark.ml.regression.LinearRegression
    import org.apache.spark.ml.classification.LogisticRegression

    val features = Array("l_quantity", "l_discount", "l_tax")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .withColumn("is_r", (col("l_returnflag") === "R").cast("double"))
      .select((features.map(col) :+ col("l_extendedprice") :+ col("is_r")): _*)
      .cache()
    li.count() // materialize: neither side pays the scan

    val assembled = new VectorAssembler()
      .setInputCols(features).setOutputCol("fx")
      .transform(li).cache()
    assembled.count()

    val path = Array(100.0, 50.0, 20.0, 10.0, 5.0, 2.0, 1.0, 0.5, 0.2, 0.1)

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // warm-up both stacks (JIT + codegen), then measure
    new LinearRegression().setFeaturesCol("fx").setLabelCol("l_extendedprice")
      .setElasticNetParam(1.0).setRegParam(path.head).setMaxIter(20)
      .fit(assembled)
    ml.SgdNet.fit(li, features.toSeq, "l_extendedprice",
      ml.SgdNetParams(alpha = 1.0, lambda = Array(path.head)))

    val sparkmlGauss = time {
      path.foreach { lam =>
        new LinearRegression().setFeaturesCol("fx")
          .setLabelCol("l_extendedprice")
          .setElasticNetParam(1.0).setRegParam(lam).setMaxIter(100)
          .setTol(1e-6).fit(assembled)
      }
    }
    val graftGauss = time {
      ml.SgdNet.fit(li, features.toSeq, "l_extendedprice",
        ml.SgdNetParams(alpha = 1.0, lambda = path, thresh = 1e-7))
    }
    val sparkmlBinom = time {
      path.map(_ / 1e4).foreach { lam =>
        new LogisticRegression().setFeaturesCol("fx").setLabelCol("is_r")
          .setElasticNetParam(1.0).setRegParam(lam).setMaxIter(100)
          .setTol(1e-6).fit(assembled)
      }
    }
    val graftBinom = time {
      ml.SgdNet.fit(li, features.toSeq, "is_r",
        ml.SgdNetParams(family = "binomial", alpha = 1.0,
          lambda = path.map(_ / 1e4), thresh = 1e-7))
    }
    val json =
      f"""{"workload":"10-lambda lasso path, 3 features, sf0.1 lineitem (${li.count()} rows)","sparkml_gauss_sec":$sparkmlGauss%.3f,"graft_gauss_sec":$graftGauss%.3f,"gauss_ratio":${graftGauss / sparkmlGauss}%.3f,"sparkml_binom_sec":$sparkmlBinom%.3f,"graft_binom_sec":$graftBinom%.3f,"binom_ratio":${graftBinom / sparkmlBinom}%.3f,"cpus":$cpus}"""
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get("BASELINE_local.json"),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
