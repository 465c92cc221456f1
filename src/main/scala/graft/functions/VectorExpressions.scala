package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for embedding math.
  *
  * Spark's array higher-order functions (`zip_with` + `aggregate`)
  * evaluate interpreted — measured ~50x slower than codegen on 64-dim
  * dot products (see Dedup scaladoc). These expressions generate a tight
  * Java loop inside whole-stage codegen: no per-pair allocation, no
  * virtual dispatch per element. Preference order from the design brief:
  * native `Expression` with `doGenCode` > HOFs > UDF.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // AbstractDataType is private[sql] in Spark 4; rely on the inferred
  // covariant Seq[ArrayType] to satisfy ExpectsInputTypes
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity in a single fused loop (dot and both norms). */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // AbstractDataType is private[sql] in Spark 4; rely on the inferred
  // covariant Seq[ArrayType] to satisfy ExpectsInputTypes
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double xv = $a.getDouble($i); double yv = $b.getDouble($i);
         |  $dot += xv * yv; $na += xv * xv; $nb += yv * yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Sparse dot product: sum over k of weights[indices[k]] * values[k] —
  * the CSR-row linear predictor behind sparse predict (the reference
  * scores dgCMatrix newx, R/predict.sgdnet.R). The weight vector folds
  * into the plan as an array literal; cost is O(nnz) per row, the row is
  * never densified. Out-of-range indices are ignored (contribute 0). */
case class SparseDot(indices: Expression, values: Expression,
                     weights: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with ExpectsInputTypes {

  // AbstractDataType is private[sql] in Spark 4; rely on the inferred
  // covariant Seq[ArrayType] to satisfy ExpectsInputTypes
  override def inputTypes = Seq(ArrayType(org.apache.spark.sql.types.IntegerType),
    ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sparse_dot"
  override def first: Expression = indices
  override def second: Expression = values
  override def third: Expression = weights

  override protected def nullSafeEval(i: Any, v: Any, w: Any): Any = {
    val idx = i.asInstanceOf[ArrayData]
    val vs = v.asInstanceOf[ArrayData]
    val ws = w.asInstanceOf[ArrayData]
    val n = math.min(idx.numElements(), vs.numElements())
    val p = ws.numElements()
    var s = 0.0
    var k = 0
    while (k < n) {
      val j = idx.getInt(k)
      if (j >= 0 && j < p) s += ws.getDouble(j) * vs.getDouble(k)
      k += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (i, v, w) => {
      val k = ctx.freshName("k")
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      s"""
         |int $n = java.lang.Math.min($i.numElements(), $v.numElements());
         |int $p = $w.numElements();
         |double $s = 0.0;
         |for (int $k = 0; $k < $n; $k++) {
         |  int $j = $i.getInt($k);
         |  if ($j >= 0 && $j < $p) $s += $w.getDouble($j) * $v.getDouble($k);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(indices = newFirst, values = newSecond, weights = newThird)
}

/** Registration + Column helpers. `GraftExtensions` plugs into
  * `spark.sql.extensions`; `ensureRegistered` registers on a live
  * session (idempotent) so library operators can rely on the functions
  * without session-construction requirements.
  */
object GraftFunctions {

  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> (args => DotProduct(args(0), args(1))),
    "graft_cosine" -> (args => CosineSimilarity(args(0), args(1))),
    "graft_sparse_dot" -> (args => SparseDot(args(0), args(1), args(2))),
    "graft_lang_id" -> (args => LangId(args(0))))

  def register(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    fns.foreach { case (name, builder) =>
      ext.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }

  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    fns.foreach { case (name, builder) =>
      val id = org.apache.spark.sql.catalyst.FunctionIdentifier(name)
      if (!reg.functionExists(id))
        reg.registerFunction(id, new ExpressionInfo("graft.functions", name), builder)
    }
  }

  /** Codegen'd dot product of two array<double> columns. */
  def dot(spark: SparkSession, a: Column, b: Column): Column = {
    ensureRegistered(spark)
    call_function("graft_dot", a, b)
  }

  /** Codegen'd cosine similarity of two array<double> columns. */
  def cosine(spark: SparkSession, a: Column, b: Column): Column = {
    ensureRegistered(spark)
    call_function("graft_cosine", a, b)
  }

  /** Codegen'd sparse dot: sum_k weights[indices[k]] * values[k]. */
  def sparseDot(spark: SparkSession, indices: Column, values: Column,
                weights: Column): Column = {
    ensureRegistered(spark)
    call_function("graft_sparse_dot", indices, values, weights)
  }

  /** Codegen'd language-ID of a string column. */
  def langId(spark: SparkSession, text: Column): Column = {
    ensureRegistered(spark)
    call_function("graft_lang_id", text)
  }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` injects the
  * functions at session build time (the standard deployment path). */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    GraftFunctions.register(ext)
}
