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

  /** Solve a·x = b by Gaussian elimination with partial pivoting —
    * driver-side, for ACTIVE-SET normal equations (a is a dense copy
    * of a small symmetric submatrix; both inputs are left intact).
    * Used by the relaxed (unpenalized) refit, where sets stay small
    * by construction. */
  def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val n = b.length
    val m = Array.tabulate(n)(i => a(i).clone())
    val x = b.clone()
    var c = 0
    while (c < n) {
      var piv = c
      var r = c + 1
      while (r < n) {
        if (math.abs(m(r)(c)) > math.abs(m(piv)(c))) piv = r
        r += 1
      }
      require(math.abs(m(piv)(c)) > 1e-12,
        s"singular active-set system at column $c")
      if (piv != c) {
        val t = m(piv); m(piv) = m(c); m(c) = t
        val tb = x(piv); x(piv) = x(c); x(c) = tb
      }
      r = c + 1
      while (r < n) {
        val f = m(r)(c) / m(c)(c)
        if (f != 0.0) {
          var k = c
          while (k < n) { m(r)(k) -= f * m(c)(k); k += 1 }
          x(r) -= f * x(c)
        }
        r += 1
      }
      c += 1
    }
    var i = n - 1
    while (i >= 0) {
      var s = x(i)
      var k = i + 1
      while (k < n) { s -= m(i)(k) * x(k); k += 1 }
      x(i) = s / m(i)(i)
      i -= 1
    }
    x
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

  /** BOX-CONSTRAINED group prox (round 16 — closes the documented
    * mgaussian / grouped-multinomial limits gap):
    *
    *   argmin_u  (q/2)·‖u‖² − r·u + g·‖u‖₂   s.t.  lo_t ≤ u_t ≤ up_t
    *
    * with lo ≤ 0 ≤ up elementwise (the glmnet limit contract) and
    * q > 0. The group-l1 term couples the coordinates, so — unlike the
    * 1-D elastic-net step — clip(unconstrained solution) is NOT the
    * answer. KKT structure: if u ≠ 0 with T = ‖u‖, every coordinate is
    * u_t = clip(r_t·T/(qT + g), lo_t, up_t), and T must equal the norm
    * of that vector — ψ(T)/T is strictly decreasing (each unclipped
    * magnitude is |r_t|/(qT + g), decreasing; clipping only flattens
    * further), so the fixed point is unique and BISECTION on
    * ψ(T) − T = 0 converges unconditionally. u = 0 is optimal iff
    * ‖r̃‖ ≤ g where r̃ zeroes the coordinates whose descent direction
    * the box pins (r_t > 0 with up_t = 0, or r_t < 0 with lo_t = 0).
    * g = 0 decouples: u_t = clip(r_t/q) exactly.
    *
    * Writes the solution into `out` and returns it. */
  def boxedGroupProx(r: Array[Double], q: Double, g: Double,
                     lo: Array[Double], up: Array[Double],
                     out: Array[Double]): Array[Double] = {
    val k = r.length
    var t = 0
    if (g <= 0.0) {
      // no group-l1: coordinate-separable clipped ridge step
      while (t < k) {
        var u = r(t) / q
        if (u < lo(t)) u = lo(t)
        if (u > up(t)) u = up(t)
        out(t) = u
        t += 1
      }
      return out
    }
    // zero test on the FEASIBLE-direction gradient
    var nrmF = 0.0
    t = 0
    while (t < k) {
      val rt = r(t)
      val blocked = (rt > 0 && up(t) == 0.0) || (rt < 0 && lo(t) == 0.0)
      if (!blocked) nrmF += rt * rt
      t += 1
    }
    if (math.sqrt(nrmF) <= g) {
      java.util.Arrays.fill(out, 0.0)
      return out
    }
    def psi(bigT: Double): Double = {
      val s = bigT / (q * bigT + g)
      var acc = 0.0
      var i = 0
      while (i < k) {
        var u = r(i) * s
        if (u < lo(i)) u = lo(i)
        if (u > up(i)) u = up(i)
        acc += u * u
        i += 1
      }
      math.sqrt(acc)
    }
    // bracket: ψ(T) > T for small T (slope ‖r̃‖/g > 1); ψ(T) ≤ ‖r‖/q < hi
    var a = 0.0
    var b = l2norm(r) / q + 1e-12
    var it = 0
    while (it < 200 && (b - a) > 1e-15 * b) {
      val mid = 0.5 * (a + b)
      if (psi(mid) > mid) a = mid else b = mid
      it += 1
    }
    val bigT = 0.5 * (a + b)
    val s = bigT / (q * bigT + g)
    t = 0
    while (t < k) {
      var u = r(t) * s
      if (u < lo(t)) u = lo(t)
      if (u > up(t)) u = up(t)
      out(t) = u
      t += 1
    }
    out
  }
}
