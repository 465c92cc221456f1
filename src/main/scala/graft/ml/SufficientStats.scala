package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** One-pass sufficient statistics for penalized (weighted) least squares.
  *
  * This is the scale-critical kernel of graft's model fitting: a single
  * `treeAggregate` linear scan produces n, column sums, the packed Gram
  * matrix XtX, and the cross-moments XtY for K response columns. Driver
  * state is O(p^2 + pK) regardless of row count, so the same code path
  * works at 100 TB with 1000 executors (depth-2 tree aggregation keeps
  * the driver fan-in bounded).
  *
  * The reference (sgdnet, src/saga-dense.h) instead streams samples
  * sequentially through SAGA — a shape that cannot distribute. graft
  * keeps the reference's objective but computes with cluster-shaped
  * statistics; for the gaussian family these statistics are *complete*
  * (the whole lambda path is solved from them with zero further passes).
  */
final class GramStats(val p: Int, val k: Int) extends Serializable {
  // large-p contract (round 18): the zeroValue of every moment
  // treeAggregate is constructed driver-side BEFORE any data pass, so
  // this structural gate fails fast on EVERY gaussian/mgaussian route
  // (fit, CV, relax; dense and sparse) instead of OOMing mid-aggregate.
  // Driver-side ONLY (TaskContext == null): executors of a real
  // cluster don't see a driver-side maxGramP override, and a task that
  // got this far was already admitted by the driver's gate.
  if (org.apache.spark.TaskContext.get() == null) SgdNet.requireGramP(p)
  var n: Long = 0L
  val sumX = new Array[Double](p)           // column sums of features
  val xtx = new Array[Double](LinAlg.triSize(p)) // packed upper-tri X'X
  val sumY = new Array[Double](k)           // response sums
  val sumYY = new Array[Double](k)          // response squared sums
  val xty = new Array[Double](p * k)        // X'Y, column-major [j*k + t]

  def add(x: Array[Double], y: Array[Double]): GramStats = {
    n += 1
    var j = 0
    while (j < p) {
      val xj = x(j)
      sumX(j) += xj
      var i = 0
      val base = j * (j + 1) / 2
      while (i <= j) { xtx(base + i) += x(i) * xj; i += 1 }
      var t = 0
      while (t < k) { xty(j * k + t) += xj * y(t); t += 1 }
      j += 1
    }
    var t = 0
    while (t < k) { sumY(t) += y(t); sumYY(t) += y(t) * y(t); t += 1 }
    this
  }

  /** Weighted row: every moment accumulates with multiplier `w`, but
    * `n` still counts ROWS — callers pass weights pre-normalized to
    * sum to n (the glmnet convention), so the downstream /n moment
    * math yields exactly the WEIGHTED means/variances/covariances. */
  def addWeighted(x: Array[Double], y: Array[Double], w: Double): GramStats = {
    n += 1
    var j = 0
    while (j < p) {
      val xj = x(j)
      val wxj = w * xj
      sumX(j) += wxj
      var i = 0
      val base = j * (j + 1) / 2
      while (i <= j) { xtx(base + i) += x(i) * wxj; i += 1 }
      var t = 0
      while (t < k) { xty(j * k + t) += wxj * y(t); t += 1 }
      j += 1
    }
    var t = 0
    while (t < k) { sumY(t) += w * y(t); sumYY(t) += w * y(t) * y(t); t += 1 }
    this
  }

  /** Sparse row: only the listed feature indices are nonzero. The Gram
    * update touches O(nnz^2) cells instead of O(p^2) — the whole point of
    * CSR input for wide-but-sparse designs (reference saga-sparse.h). */
  def addSparse(idx: Array[Int], vals: Array[Double], y: Array[Double]): GramStats = {
    n += 1
    var a = 0
    while (a < idx.length) {
      val j = idx(a); val xj = vals(a)
      sumX(j) += xj
      var b = 0
      while (b <= a) {
        val i = idx(b)
        if (i <= j) xtx(j * (j + 1) / 2 + i) += vals(b) * xj
        else xtx(i * (i + 1) / 2 + j) += vals(b) * xj
        b += 1
      }
      var t = 0
      while (t < k) { xty(j * k + t) += xj * y(t); t += 1 }
      a += 1
    }
    var t = 0
    while (t < k) { sumY(t) += y(t); sumYY(t) += y(t) * y(t); t += 1 }
    this
  }

  /** Weighted sparse row — [[addSparse]] with every moment scaled by
    * `w` (n still counts rows; callers pass sum-to-n normalized
    * weights, the [[addWeighted]] convention). */
  def addSparseWeighted(idx: Array[Int], vals: Array[Double],
                        y: Array[Double], w: Double): GramStats = {
    n += 1
    var a = 0
    while (a < idx.length) {
      val j = idx(a); val wxj = w * vals(a)
      sumX(j) += wxj
      var b = 0
      while (b <= a) {
        val i = idx(b)
        if (i <= j) xtx(j * (j + 1) / 2 + i) += vals(b) * wxj
        else xtx(i * (i + 1) / 2 + j) += vals(b) * wxj
        b += 1
      }
      var t = 0
      while (t < k) { xty(j * k + t) += wxj * y(t); t += 1 }
      a += 1
    }
    var t = 0
    while (t < k) { sumY(t) += w * y(t); sumYY(t) += w * y(t) * y(t); t += 1 }
    this
  }

  def merge(o: GramStats): GramStats = {
    n += o.n
    var i = 0
    while (i < sumX.length) { sumX(i) += o.sumX(i); i += 1 }
    i = 0
    while (i < xtx.length) { xtx(i) += o.xtx(i); i += 1 }
    i = 0
    while (i < sumY.length) { sumY(i) += o.sumY(i); sumYY(i) += o.sumYY(i); i += 1 }
    i = 0
    while (i < xty.length) { xty(i) += o.xty(i); i += 1 }
    this
  }

  /** Multiply every weight-linear moment by `c`; `n` (the ROW count) is
    * unchanged. This rescales RAW-v weighted moments to a different
    * weight normalization driver-side — the per-fold "weights sum to
    * n_train" step of shared-pass weighted CV: moments are linear in
    * the observation weight, so accumulating with raw v once and
    * scaling per fold is exact (same sums, one multiplier). */
  def scaleWeights(c: Double): GramStats = {
    var i = 0
    while (i < sumX.length) { sumX(i) *= c; i += 1 }
    i = 0
    while (i < xtx.length) { xtx(i) *= c; i += 1 }
    i = 0
    while (i < sumY.length) { sumY(i) *= c; sumYY(i) *= c; i += 1 }
    i = 0
    while (i < xty.length) { xty(i) *= c; i += 1 }
    this
  }

  /** Moment subtraction — the "train = total minus fold" step every
    * one-pass CV family uses. Kept HERE, next to [[merge]], so a field
    * added to the stats is updated in exactly two places instead of at
    * every CV call site. */
  def subtract(o: GramStats): GramStats = {
    n -= o.n
    var i = 0
    while (i < sumX.length) { sumX(i) -= o.sumX(i); i += 1 }
    i = 0
    while (i < xtx.length) { xtx(i) -= o.xtx(i); i += 1 }
    i = 0
    while (i < sumY.length) { sumY(i) -= o.sumY(i); sumYY(i) -= o.sumYY(i); i += 1 }
    i = 0
    while (i < xty.length) { xty(i) -= o.xty(i); i += 1 }
    this
  }
}

/** Derived, standardized-scale quantities used by the CD solver. */
final case class StdStats(
    n: Long,
    xMean: Array[Double],
    xSd: Array[Double],      // population sd (1/n), glmnet convention
    yMean: Array[Double],
    yVar: Array[Double],     // population variance of each response
    gram: Array[Array[Double]],  // (1/n) Xs'Xs on the working scale
    b: Array[Array[Double]]      // [K][p]: (1/n) <xs_j, y_t>, y centered iff intercept
)

object SufficientStats {

  /** Assemble feature/label columns into a cached RDD of primitive arrays. */
  def toRdd(df: DataFrame, featureCols: Seq[String], labelCols: Seq[String]) = {
    val p = featureCols.size
    val k = labelCols.size
    val cols = (featureCols ++ labelCols).map(c => col(c).cast("double"))
    df.select(cols: _*).rdd.map { row =>
      val x = new Array[Double](p)
      var j = 0
      while (j < p) { x(j) = row.getDouble(j); j += 1 }
      val y = new Array[Double](k)
      var t = 0
      while (t < k) { y(t) = row.getDouble(p + t); t += 1 }
      (x, y)
    }
  }

  def compute(rdd: org.apache.spark.rdd.RDD[(Array[Double], Array[Double])],
              p: Int, k: Int): GramStats =
    rdd.treeAggregate(new GramStats(p, k))(
      seqOp = (s, xy) => s.add(xy._1, xy._2),
      combOp = (a, b) => a.merge(b),
      depth = 2)

  /** Standardized-scale derivation.
    *
    * standardize=true divides each feature by its population sd;
    * centering is applied iff an intercept is fit (matching glmnet /
    * sgdnet, where the intercept absorbs the means). On the working
    * scale gram(j)(j) == 1 when standardized and centered.
    */
  def standardize(g: GramStats, standardizeX: Boolean, intercept: Boolean): StdStats = {
    val p = g.p; val k = g.k; val n = g.n.toDouble
    val xMean = g.sumX.map(_ / n)
    val rawVar = Array.tabulate(p) { j =>
      math.max(g.xtx(LinAlg.triIdx(j, j)) / n - xMean(j) * xMean(j), 0.0)
    }
    val xSd = rawVar.map(v => { val s = math.sqrt(v); if (s > 0) s else 1.0 })
    val scale = if (standardizeX) xSd else Array.fill(p)(1.0)
    val center = if (intercept) xMean else new Array[Double](p)
    val yMean = g.sumY.map(_ / n)
    val yVar = Array.tabulate(k)(t => math.max(g.sumYY(t) / n - yMean(t) * yMean(t), 0.0))
    val gram = Array.tabulate(p, p) { (i, j) =>
      (g.xtx(LinAlg.triIdx(i, j)) / n - center(i) * xMean(j) - center(j) * xMean(i)
        + center(i) * center(j)) / (scale(i) * scale(j))
    }
    val yCenter = if (intercept) yMean else new Array[Double](k)
    val b = Array.tabulate(k, p) { (t, j) =>
      (g.xty(j * k + t) / n - center(j) * yMean(t) - yCenter(t) * xMean(j)
        + center(j) * yCenter(t)) / scale(j)
    }
    StdStats(g.n, xMean, xSd, yMean, yVar, gram, b)
  }
}
