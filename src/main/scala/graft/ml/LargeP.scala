package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Screened / active-set Gram construction for LARGE p (round 18 —
  * the architectural extension behind the `maxGramP` contract gate):
  * the gaussian elastic-net path WITHOUT ever materializing the p×p
  * Gram.
  *
  * The one-pass [[SgdNet.fit]] route aggregates the full packed Gram
  * (p(p+1)/2 doubles in the driver and in every task), which caps p at
  * `SgdNet.maxGramP` (~8k). For alpha > 0 the sequential strong rule
  * (Tibshirani et al. 2012) knows each path point's candidate set
  * BEFORE the Gram is consumed, so this route aggregates only:
  *
  *  - pass A: per-feature means/variances, X'y, y-moments — O(p)
  *    driver state, the lambda path and the zero-solution gradient;
  *  - Gram-EXTENSION passes: when new columns enter the ever-candidate
  *    set E, one pass accumulates the raw |new|×|E| cross-moment slab
  *    (centered/standardized driver-side with the exact
  *    [[SufficientStats.standardize]] formula) — driver state grows to
  *    O(|E|²), never O(p²);
  *  - one GRADIENT pass per path point: the full standardized
  *    p-gradient at the just-solved coefficients (per-row cost
  *    O(p + |active|)), which is BOTH the exact KKT backcheck over
  *    every discarded coordinate (violators re-enter E, the Gram slab
  *    extends, and the point re-solves — equality with the full-Gram
  *    path is structural, same discipline as `solveScreened`) AND the
  *    next point's strong-rule input.
  *
  * Cost model: 1 + nlambda (+ rare extension/violation) data passes vs
  * the full-Gram route's single pass — the designed trade for p beyond
  * driver memory. The input rows are persisted MEMORY_AND_DISK for the
  * multi-pass loop and unpersisted on return. `|E|` (not p) is held to
  * `SgdNet.maxGramP`; `dfmax`/`pmax` bound it tighter and stop the
  * path early, which is the recommended regime at very large p.
  *
  * Contract: gaussian single-response, alpha > 0 (ridge keeps every
  * coordinate — screening is vacuous), no penalty factors / box
  * limits / sgdnetCompat (those compose with the full-Gram route,
  * which large-p users reach after dimensionality reduction).
  * standardize and intercept both honored. Verified equal to
  * [[SgdNet.fit]] on every shared regime by LargePSpec.
  */
object LargeP {

  def fitGaussian(df: DataFrame, featureCols: Seq[String], labelCol: String,
                  params: SgdNetParams = SgdNetParams()): SgdNetModel = {
    require(params.family == "gaussian",
      s"LargeP.fitGaussian supports gaussian, not ${params.family}")
    require(params.alpha > 0,
      "the screened-Gram route needs alpha > 0 (at alpha = 0 every " +
        "coordinate is active and the Gram IS p x p — ridge at large p " +
        "needs dimensionality reduction first)")
    require(params.penaltyFactor == null && params.lowerLimits == null &&
      params.upperLimits == null && !params.sgdnetCompat &&
      !params.standardizeResponse,
      "LargeP.fitGaussian composes with none of penaltyFactor / box " +
        "limits / sgdnetCompat / standardizeResponse — reduce " +
        "dimensionality and use SgdNet.fit for those")
    require(featureCols.nonEmpty, "the predictor matrix (x) is empty.")
    require(params.nlambda > 0, "lambda path cannot be of zero length.")
    require(params.thresh >= 0 && params.maxit > 0, "bad thresh/maxit")
    val p = featureCols.size
    val sc = df.sparkSession.sparkContext

    val rows = SufficientStats.toRdd(df, featureCols, Seq(labelCol))
      .map { case (x, y) => (x, y(0)) }
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // ---------------------------------------------- pass A: O(p) moments
      val accA = rows.treeAggregate(new Array[Double](3 * p + 3))(
        seqOp = (a, r) => {
          val x = r._1; val y = r._2
          var j = 0
          while (j < p) {
            val xj = x(j)
            a(j) += xj; a(p + j) += xj * xj; a(2 * p + j) += xj * y
            j += 1
          }
          a(3 * p) += 1.0; a(3 * p + 1) += y; a(3 * p + 2) += y * y
          a
        },
        combOp = (a, b) => {
          var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a
        }, depth = 2)
      var passes = 1
      val nD = accA(3 * p)
      require(nD > 0, "the response (y) is empty.")
      val nL = nD.toLong
      val mean = Array.tabulate(p)(j => accA(j) / nD)
      val xSd = Array.tabulate(p) { j =>
        val v = math.max(accA(p + j) / nD - mean(j) * mean(j), 0.0)
        val s = math.sqrt(v); if (s > 0) s else 1.0
      }
      val scale = if (params.standardize) xSd else Array.fill(p)(1.0)
      val center = if (params.intercept) mean else new Array[Double](p)
      val yMean = accA(3 * p + 1) / nD
      val yVar = math.max(accA(3 * p + 2) / nD - yMean * yMean, 0.0)
      val yCen = if (params.intercept) yMean else 0.0
      // standardized-scale gradient at beta = 0 (SufficientStats
      // .standardize b-formula, recomputed from the O(p) moments)
      val c = Array.tabulate(p)(j =>
        (accA(2 * p + j) / nD - center(j) * yMean - yCen * mean(j) +
          center(j) * yCen) / scale(j))

      val minRatio = if (params.lambdaMinRatio.isNaN)
        LambdaPath.defaultMinRatio(nL, p) else params.lambdaMinRatio
      val lambdas = if (params.lambda != null) params.lambda
        else LambdaPath.build(Array(c), params.alpha, params.nlambda,
          minRatio, null)
      val lmaxData = c.map(math.abs).max / params.alpha

      // ------------------------------------- ever-candidate Gram block E
      val posOf = scala.collection.mutable.HashMap.empty[Int, Int]
      val eIdx = scala.collection.mutable.ArrayBuffer.empty[Int]
      // symmetric standardized Gram over E, grown in place
      val gramE = scala.collection.mutable.ArrayBuffer
        .empty[scala.collection.mutable.ArrayBuffer[Double]]

      def extend(newCols: Seq[Int]): Unit = {
        if (newCols.isEmpty) return
        require(eIdx.size + newCols.size <= SgdNet.maxGramP,
          s"the ever-candidate set would grow to " +
            s"${eIdx.size + newCols.size} > maxGramP = ${SgdNet.maxGramP} " +
            "columns: the active block no longer fits the O(|E|^2) " +
            "driver budget. Use dfmax/pmax to bound the path, a larger " +
            "lambda floor, or raise graft.ml.SgdNet.maxGramP.")
        val oldE = eIdx.toArray
        val nn = newCols.toArray
        val eAfter = oldE ++ nn
        val bc = sc.broadcast((nn, eAfter))
        // RAW cross moments (same accumulation shape as GramStats.xtx);
        // centered/standardized driver-side with the standardize formula
        val acc = rows.treeAggregate(
            new Array[Double](nn.length * eAfter.length))(
          seqOp = (a, r) => {
            val x = r._1
            val (nnL, eL) = bc.value
            var ai = 0
            while (ai < nnL.length) {
              val xa = x(nnL(ai))
              val base = ai * eL.length
              var bi = 0
              while (bi < eL.length) { a(base + bi) += xa * x(eL(bi)); bi += 1 }
              ai += 1
            }
            a
          },
          combOp = (a, b) => {
            var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a
          }, depth = 2)
        passes += 1
        bc.destroy()
        def std(aRaw: Double, i: Int, j: Int): Double =
          (aRaw / nD - center(i) * mean(j) - center(j) * mean(i) +
            center(i) * center(j)) / (scale(i) * scale(j))
        // append new columns to the symmetric block
        for (bi <- oldE.indices)
          for (ai <- nn.indices)
            gramE(bi) += std(acc(ai * eAfter.length + bi), nn(ai), oldE(bi))
        for (ai <- nn.indices) {
          val row = scala.collection.mutable.ArrayBuffer.empty[Double]
          for (bi <- eAfter.indices)
            row += std(acc(ai * eAfter.length + bi), nn(ai), eAfter(bi))
          gramE += row
        }
        nn.foreach { j => posOf(j) = eIdx.size; eIdx += j }
      }

      // full standardized gradient at the current solution — the KKT /
      // strong-rule pass (per-row O(p + |active|))
      def gradientPass(beta: Array[Double]): Array[Double] = {
        val act = (0 until p).filter(beta(_) != 0.0).toArray
        if (act.isEmpty) return c.clone()
        val bAct = act.map(beta)
        val bc = sc.broadcast((act, bAct, center, scale))
        val acc = rows.treeAggregate(new Array[Double](p))(
          seqOp = (a, r) => {
            val x = r._1
            val (actL, bL, ctr, scl) = bc.value
            var s = 0.0
            var i = 0
            while (i < actL.length) {
              val j = actL(i)
              s += bL(i) * (x(j) - ctr(j)) / scl(j)
              i += 1
            }
            var j = 0
            while (j < p) { a(j) += (x(j) - ctr(j)) / scl(j) * s; j += 1 }
            a
          },
          combOp = (a, b) => {
            var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a
          }, depth = 2)
        passes += 1
        bc.destroy()
        Array.tabulate(p)(j => c(j) - acc(j) / nD)
      }

      // ----------------------------------------------------- path loop
      val L = lambdas.length
      val ySecond = if (params.intercept) yVar else yVar + yMean * yMean
      val nulldev = nD * ySecond
      val a0Out = Array.ofDim[Double](L, 1)
      val betaOut = Array.ofDim[Double](L, 1, p)
      val devRatio = new Array[Double](L)
      val beta = new Array[Double](p) // standardized coords, warm across l
      var grad = c.clone()
      var lamPrev = lmaxData
      val dfGate = new SgdNet.DfGate(params, p)
      var cutL = L
      var l = 0
      while (l < L) {
        val lam = lambdas(l)
        val bound = params.alpha * (2.0 * lam - lamPrev)
        extend((0 until p).filter(j => !posOf.contains(j) &&
          (beta(j) != 0.0 || math.abs(grad(j)) >= bound)))
        val tol = math.max(params.thresh * 1e-2, 1e-12) * math.max(lam, 1.0)
        var done = false
        while (!done) {
          val m = eIdx.size
          val aSub = Array.tabulate(m, m)((x2, y2) => gramE(x2)(y2))
          val cSub = Array.tabulate(m)(x2 => c(eIdx(x2)))
          val init = Array.tabulate(m)(x2 => beta(eIdx(x2)))
          val r = CoordinateDescent.solve(aSub, cSub,
            new Array[Double](m), 0.0, 1.0, lam, params.alpha,
            intercept = false, init = init,
            thresh = params.thresh * 1e-4, maxIter = params.maxit)
          var x2 = 0
          while (x2 < m) { beta(eIdx(x2)) = r.beta(x2); x2 += 1 }
          grad = gradientPass(beta)
          val violators = (0 until p).filter(j => !posOf.contains(j) &&
            math.abs(grad(j)) > lam * params.alpha + tol)
          if (violators.isEmpty) done = true else extend(violators)
        }
        if (!dfGate.admit(j => beta(j) != 0.0)) { cutL = l; l = L }
        else {
          // RSS/n from the block moments (full-Gram tail formula on E)
          var bb = 0.0; var gq = 0.0
          for (x2 <- 0 until eIdx.size) {
            val j = eIdx(x2)
            bb += c(j) * beta(j)
            var s = 0.0
            for (y2 <- 0 until eIdx.size) s += gramE(x2)(y2) * beta(eIdx(y2))
            gq += beta(j) * s
          }
          val rssOverN = ySecond - 2 * bb + gq
          devRatio(l) = if (nulldev > 0) 1.0 - nD * rssOverN / nulldev else 0.0
          for (j <- 0 until p) betaOut(l)(0)(j) = beta(j) / scale(j)
          a0Out(l)(0) = if (params.intercept)
            yMean - (0 until p).map(j => betaOut(l)(0)(j) * mean(j)).sum
          else 0.0
          lamPrev = lam
          l += 1
        }
      }
      require(cutL > 0, "dfmax/pmax exclude every path point")

      // npasses reports DATA passes (the resource this route is
      // designed around), unlike the one-pass route's CD-iteration count
      new SgdNetModel("gaussian", featureCols.toArray, Array(labelCol),
        Array.empty, lambdas.take(cutL), a0Out.take(cutL),
        betaOut.take(cutL), nulldev, devRatio.take(cutL), nL, passes,
        params)
    } finally rows.unpersist(blocking = false)
  }
}
