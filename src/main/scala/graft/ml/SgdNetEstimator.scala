package graft.ml

import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable,
  Identifiable, MLReadable, MLReader, MLWritable, MLWriter}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.types.StructType

/** spark.ml Pipeline-conformant wrapper around [[SgdNet]]: drops into
  * `org.apache.spark.ml.Pipeline`, `CrossValidator`, and param grids like
  * any MLlib estimator, while fitting the reference-faithful
  * regularization path underneath. Persists like any MLlib stage:
  * `DefaultParamsWritable` here, a custom writer on the fitted model —
  * so `Pipeline.save`/`PipelineModel.load` round-trip graft stages.
  */
class SgdNetEstimator(override val uid: String)
    extends Estimator[SgdNetPipelineModel] with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("sgdnet"))

  final val featureCols = new StringArrayParam(this, "featureCols", "feature column names")
  final val labelCol = new Param[String](this, "labelCol", "label column")
  final val family = new Param[String](this, "family", "model family",
    ParamValidators.inArray(Array("gaussian", "binomial", "multinomial",
      "mgaussian", "poisson")))
  final val alpha = new DoubleParam(this, "alpha", "elastic-net mixing",
    ParamValidators.inRange(0, 1))
  final val nLambda = new IntParam(this, "nLambda", "path length", ParamValidators.gt(0))
  final val lambdas = new DoubleArrayParam(this, "lambdas", "explicit lambda path")
  final val standardize = new BooleanParam(this, "standardize", "standardize features")
  final val fitIntercept = new BooleanParam(this, "fitIntercept", "fit intercept")
  final val thresh = new DoubleParam(this, "thresh", "convergence threshold")
  final val penaltyFactor = new DoubleArrayParam(this, "penaltyFactor",
    "glmnet penalty.factor: per-feature multiplier on both penalty terms")
  final val weightCol = new Param[String](this, "weightCol",
    "observation-weight column (gaussian/binomial/poisson)")
  final val offsetCol = new Param[String](this, "offsetCol",
    "linear-predictor offset column (gaussian/binomial/poisson; " +
      "combines with weightCol)")
  final val dfmax = new IntParam(this, "dfmax",
    "glmnet dfmax: max nonzero features in any returned model (path truncates)")
  final val pmax = new IntParam(this, "pmax",
    "glmnet pmax: max ever-active features along the path (path truncates)")
  final val lowerLimits = new DoubleArrayParam(this, "lowerLimits",
    "glmnet lower.limits: per-coefficient lower bounds (each <= 0)")
  final val upperLimits = new DoubleArrayParam(this, "upperLimits",
    "glmnet upper.limits: per-coefficient upper bounds (each >= 0)")
  final val relax = new BooleanParam(this, "relax",
    "glmnet relax: blend each lambda's penalized fit with its " +
      "active-set unpenalized refit (gaussian/binomial/poisson)")
  final val gamma = new DoubleParam(this, "gamma",
    "glmnet relax gamma: blend weight, 1 = penalized, 0 = full refit",
    ParamValidators.inRange(0, 1))

  setDefault(labelCol -> "label", family -> "gaussian", alpha -> 1.0,
    nLambda -> 100, standardize -> true, fitIntercept -> true, thresh -> 1e-3,
    relax -> false, gamma -> 1.0)

  def setFeatureCols(v: Seq[String]): this.type = set(featureCols, v.toArray)
  def setLabelCol(v: String): this.type = set(labelCol, v)
  def setFamily(v: String): this.type = set(family, v)
  def setAlpha(v: Double): this.type = set(alpha, v)
  def setNLambda(v: Int): this.type = set(nLambda, v)
  def setLambdas(v: Seq[Double]): this.type = set(lambdas, v.toArray)
  def setStandardize(v: Boolean): this.type = set(standardize, v)
  def setFitIntercept(v: Boolean): this.type = set(fitIntercept, v)
  def setThresh(v: Double): this.type = set(thresh, v)
  def setPenaltyFactor(v: Seq[Double]): this.type = set(penaltyFactor, v.toArray)
  def setWeightCol(v: String): this.type = set(weightCol, v)
  def setOffsetCol(v: String): this.type = set(offsetCol, v)
  def setDfmax(v: Int): this.type = set(dfmax, v)
  def setPmax(v: Int): this.type = set(pmax, v)
  def setLowerLimits(v: Seq[Double]): this.type = set(lowerLimits, v.toArray)
  def setUpperLimits(v: Seq[Double]): this.type = set(upperLimits, v.toArray)
  def setRelax(v: Boolean): this.type = set(relax, v)
  def setGamma(v: Double): this.type = set(gamma, v)

  override def fit(dataset: Dataset[_]): SgdNetPipelineModel = {
    val params = SgdNetParams(
      family = $(family), alpha = $(alpha), nlambda = $(nLambda),
      lambda = if (isSet(lambdas)) $(lambdas) else null,
      standardize = $(standardize), intercept = $(fitIntercept),
      thresh = $(thresh),
      penaltyFactor = if (isSet(penaltyFactor)) $(penaltyFactor) else null,
      lowerLimits = if (isSet(lowerLimits)) $(lowerLimits) else null,
      upperLimits = if (isSet(upperLimits)) $(upperLimits) else null,
      dfmax = if (isSet(dfmax)) $(dfmax) else -1,
      pmax = if (isSet(pmax)) $(pmax) else -1)
    val df = dataset.toDF()
    if ($(relax)) {
      // round 17: glmnet relax = TRUE through the Pipeline surface.
      // The fitted stage carries the gamma-BLENDED path (coefficients
      // exactly gamma*penalized + (1-gamma)*refit per lambda, the
      // RelaxedPath blend); dev.ratio stays the penalized path's
      // (informational, like cv.glmnet's relaxed slot). offsetCol and
      // weightCol compose (the full relax grid).
      val rp =
        if (isSet(offsetCol))
          SgdNet.relaxedFitWithOffset(df, $(featureCols).toSeq, $(labelCol),
            $(offsetCol), params, $(gamma),
            weightCol = if (isSet(weightCol)) $(weightCol) else null)
        else if (isSet(weightCol))
          SgdNet.relaxedFitWeighted(df, $(featureCols).toSeq, $(labelCol),
            $(weightCol), params, $(gamma))
        else SgdNet.relaxedFit(df, $(featureCols).toSeq, $(labelCol),
          params, $(gamma))
      val pm = rp.model
      val a0B = Array.tabulate(pm.nLambda)(l => Array(rp.blendedA0(l)))
      val bB = Array.tabulate(pm.nLambda)(l => Array(rp.blendedBeta(l)))
      val blended = new SgdNetModel(pm.family, pm.featureNames,
        pm.responseNames, pm.classLabels, pm.lambda, a0B, bB, pm.nulldev,
        pm.devRatio, pm.nobs, pm.npasses, params)
      return new SgdNetPipelineModel(uid, blended).setParent(this)
    }
    val m =
      if (isSet(weightCol) && isSet(offsetCol))
        SgdNet.fitWithOffsetWeighted(df, $(featureCols).toSeq, $(labelCol),
          $(offsetCol), $(weightCol), params)
      else if (isSet(weightCol))
        SgdNet.fitWeighted(df, $(featureCols).toSeq, $(labelCol),
          $(weightCol), params)
      else if (isSet(offsetCol))
        SgdNet.fitWithOffset(df, $(featureCols).toSeq, $(labelCol),
          $(offsetCol), params)
      else SgdNet.fit(df, $(featureCols).toSeq, $(labelCol), params)
    new SgdNetPipelineModel(uid, m).setParent(this)
  }

  override def copy(extra: ParamMap): SgdNetEstimator = defaultCopy(extra)

  override def transformSchema(schema: StructType): StructType = {
    require($(featureCols).forall(schema.fieldNames.contains),
      s"missing feature columns: ${$(featureCols).filterNot(schema.fieldNames.contains).mkString(",")}")
    schema.add("prediction", org.apache.spark.sql.types.DoubleType)
  }
}

object SgdNetEstimator extends DefaultParamsReadable[SgdNetEstimator] {
  override def load(path: String): SgdNetEstimator = super.load(path)
}

/** Fitted pipeline model: transform() appends `prediction` at the densest
  * path point (smallest lambda); the full path model is exposed as
  * `pathModel` for coef/score/deviance access. */
class SgdNetPipelineModel(override val uid: String, val pathModel: SgdNetModel)
    extends Model[SgdNetPipelineModel] with MLWritable {

  override def transform(dataset: Dataset[_]): DataFrame = {
    val l = pathModel.nLambda - 1
    val c = pathModel.family match {
      case "binomial" | "multinomial" => pathModel.responseCol(l)
      case _                          => pathModel.linkCol(l)
    }
    dataset.toDF().withColumn("prediction", c)
  }

  override def copy(extra: ParamMap): SgdNetPipelineModel =
    new SgdNetPipelineModel(uid, pathModel).setParent(parent)

  override def transformSchema(schema: StructType): StructType =
    schema.add("prediction", org.apache.spark.sql.types.DoubleType)

  override def write: MLWriter = new SgdNetPipelineModel.Writer(this)
}

object SgdNetPipelineModel extends MLReadable[SgdNetPipelineModel] {
  import org.json4s._
  import org.json4s.JsonDSL._
  import org.json4s.jackson.JsonMethods._

  /** Writes the standard MLlib stage metadata (so `PipelineModel.load`
    * can dispatch on the `class` field) plus the path-model payload via
    * [[SgdNetModel!.save]] under `<path>/model`. Honors the MLWriter
    * overwrite contract: saving to an existing path fails unless the
    * caller asked for `.overwrite()`. */
  private[ml] class Writer(instance: SgdNetPipelineModel) extends MLWriter {
    override protected def saveImpl(path: String): Unit = {
      val mode = if (shouldOverwrite) "overwrite" else "errorifexists"
      val metadata = ("class" -> instance.getClass.getName) ~
        ("timestamp" -> System.currentTimeMillis()) ~
        ("sparkVersion" -> sc.version) ~
        ("uid" -> instance.uid) ~
        ("paramMap" -> JObject(Nil)) ~
        ("defaultParamMap" -> JObject(Nil))
      sparkSession.createDataset(Seq(compact(render(metadata))))(Encoders.STRING)
        .repartition(1).write.mode(mode).text(s"$path/metadata")
      instance.pathModel.save(sparkSession, s"$path/model",
        overwrite = shouldOverwrite)
    }
  }

  private class Reader extends MLReader[SgdNetPipelineModel] {
    override def load(path: String): SgdNetPipelineModel = {
      implicit val formats: Formats = DefaultFormats
      val metaStr = sparkSession.read.text(s"$path/metadata").head().getString(0)
      val uid = (parse(metaStr) \ "uid").extract[String]
      new SgdNetPipelineModel(uid, SgdNetModel.load(sparkSession, s"$path/model"))
    }
  }

  override def read: MLReader[SgdNetPipelineModel] = new Reader

  override def load(path: String): SgdNetPipelineModel = super.load(path)
}
