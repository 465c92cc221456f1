package graft.ml

/** Small dense linear-algebra helpers used driver-side by the solvers.
  *
  * All heavy lifting over data happens in Spark aggregations; these run
  * only on p-dimensional (feature-count) objects on the driver.
  */
object LinAlg {

  /** Index into a packed upper-triangular symmetric p x p matrix (i <= j). */
  @inline def triIdx(i: Int, j: Int): Int =
    if (i <= j) j * (j + 1) / 2 + i else i * (i + 1) / 2 + j

  def triSize(p: Int): Int = p * (p + 1) / 2

  /** Unpack a packed symmetric matrix into a dense p x p array. */
  def unpackSym(packed: Array[Double], p: Int): Array[Array[Double]] = {
    val out = Array.ofDim[Double](p, p)
    var j = 0
    while (j < p) {
      var i = 0
      while (i <= j) {
        val v = packed(triIdx(i, j))
        out(i)(j) = v
        out(j)(i) = v
        i += 1
      }
      j += 1
    }
    out
  }

  /** Soft-thresholding operator S(z, g) = sign(z) * max(|z| - g, 0). */
  @inline def softThreshold(z: Double, g: Double): Double =
    if (z > g) z - g else if (z < -g) z + g else 0.0

  /** Largest eigenvalue of a symmetric PSD matrix via power iteration. */
  def maxEig(a: Array[Array[Double]], iters: Int = 100): Double = {
    val p = a.length
    if (p == 0) return 0.0
    var v = Array.fill(p)(1.0 / math.sqrt(p.toDouble))
    var eig = 0.0
    var it = 0
    while (it < iters) {
      val av = Array.ofDim[Double](p)
      var i = 0
      while (i < p) {
        var s = 0.0
        val ai = a(i)
        var j = 0
        while (j < p) { s += ai(j) * v(j); j += 1 }
        av(i) = s
        i += 1
      }
      val nrm = math.sqrt(av.map(x => x * x).sum)
      if (nrm == 0.0) return 0.0
      eig = nrm
      v = av.map(_ / nrm)
      it += 1
    }
    eig
  }

  @inline def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  def l2norm(a: Array[Double]): Double = math.sqrt(dot(a, a))
}
