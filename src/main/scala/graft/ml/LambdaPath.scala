package graft.ml

/** Regularization-path construction, matching the reference semantics
  * (sgdnet src/utils.h:155-165): lambda_max = max_j |(1/n)<x_j_std, y>|
  * divided by max(alpha, 0.001), then nlambda log-spaced values down to
  * lambda_max * lambdaMinRatio. The default min-ratio is 1e-4 (1e-2 when
  * p > n), as in R/sgdnet.R's `lambda.min.ratio` default.
  */
object LambdaPath {

  def defaultMinRatio(n: Long, p: Int): Double = if (n < p) 1e-2 else 1e-4

  def logSpace(hi: Double, lo: Double, num: Int): Array[Double] = {
    if (num == 1) return Array(hi)
    val lhi = math.log(hi); val llo = math.log(lo)
    Array.tabulate(num)(i => math.exp(lhi + (llo - lhi) * i / (num - 1.0)))
  }

  /** b: [K][p] working-scale gradients at beta=0 ((1/n)<xs_j, y_t>).
    * For multi-response families lambda_max uses the group norm over
    * responses (matching the group penalty); for K=1 this is |b_j|.
    */
  def lambdaMax(b: Array[Array[Double]], alpha: Double): Double = {
    val k = b.length
    val p = if (k == 0) 0 else b(0).length
    var mx = 0.0
    var j = 0
    while (j < p) {
      var s = 0.0
      var t = 0
      while (t < k) { s += b(t)(j) * b(t)(j); t += 1 }
      val nrm = math.sqrt(s)
      if (nrm > mx) mx = nrm
      j += 1
    }
    mx / math.max(alpha, 1e-3)
  }

  def build(b: Array[Array[Double]], alpha: Double, nlambda: Int,
            minRatio: Double,
            penaltyFactor: Array[Double] = null): Array[Double] = {
    val lmax = lambdaMax(b, alpha, penaltyFactor)
    if (lmax <= 0.0) Array.fill(nlambda)(0.0)
    else logSpace(lmax, lmax * minRatio, nlambda)
  }

  /** lambda_max under glmnet penalty.factor semantics: the smallest
    * lambda with every PENALIZED coordinate zero is
    * max over pf_j > 0 of |b_j| / pf_j (unpenalized coordinates never
    * constrain the path). */
  def lambdaMax(b: Array[Array[Double]], alpha: Double,
                penaltyFactor: Array[Double]): Double = {
    if (penaltyFactor == null) return lambdaMax(b, alpha)
    val k = b.length
    val p = if (k == 0) 0 else b(0).length
    var mx = 0.0
    var j = 0
    while (j < p) {
      if (penaltyFactor(j) > 0) {
        var s = 0.0
        var t = 0
        while (t < k) { s += b(t)(j) * b(t)(j); t += 1 }
        val nrm = math.sqrt(s) / penaltyFactor(j)
        if (nrm > mx) mx = nrm
      }
      j += 1
    }
    mx / math.max(alpha, 1e-3)
  }
}
