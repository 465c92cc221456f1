package graft.ops

import graft.SparkSpec

/** PCA: Jacobi eigendecomposition of the single-pass covariance. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("pcaTopK: orthonormal components, descending eigenvalues, trace") {
    // anisotropic cloud: dim0 dominates, dim1 second, dim2 tiny
    val vecs = (0 until 200).map { i =>
      val t = (i % 21 - 10) / 10.0
      val u = ((i / 21) % 9 - 4) / 8.0
      Seq(3.0 * t, 1.0 * u, 0.05 * (i % 3 - 1))
    }
    val df = vecs.map(Tuple1(_)).toDF("emb")
    val m = Embeddings.pcaTopK(df, "emb", k = 3)
    assert(m.eigenvalues.length === 3)
    // descending order
    assert(m.eigenvalues.sliding(2).forall(w => w(0) >= w(1) - 1e-12))
    // orthonormal
    for (i <- 0 until 3; j <- 0 until 3) {
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot(m.components(i), m.components(j)) - expect) < 1e-8,
        s"($i,$j)")
    }
    // trace identity vs the exact covariance diagonal
    val cov = Embeddings.covariance(df, "emb").collect()
      .map(r => (r.getAs[Int]("i"), r.getAs[Int]("j")) -> r.getAs[Double]("cov"))
      .toMap
    val trace = (0 until 3).map(i => cov((i, i))).sum
    assert(math.abs(m.eigenvalues.sum - trace) < 1e-4)
    // first PC aligns with the dominant axis, sign-fixed positive
    assert(math.abs(m.components(0)(0)) > 0.999)
    assert(m.components(0)(m.components(0).indices
      .maxBy(i => math.abs(m.components(0)(i)))) > 0)
  }

  test("pcaProject: per-component score variance equals the eigenvalue") {
    val vecs = (0 until 300).map { i =>
      val t = (i % 25 - 12) / 6.0
      Seq(2.0 * t + 0.3 * (i % 7 - 3), 1.0 * (i % 7 - 3), 0.2 * (i % 5 - 2))
    }
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "emb")
    val m = Embeddings.pcaTopK(df, "emb", k = 2)
    val scores = Embeddings.pcaProject(df, "id", "emb", m).collect()
      .map(_.getSeq[Double](1))
    for (c <- 0 until 2) {
      val xs = scores.map(_(c))
      val mean = xs.sum / xs.length
      val varPop = xs.map(x => (x - mean) * (x - mean)).sum / xs.length
      // quantization at 1e-3 bounds the gap
      assert(math.abs(varPop - m.eigenvalues(c)) < 1e-2,
        s"component $c: $varPop vs ${m.eigenvalues(c)}")
    }
    // projection is reproducible and complete
    assert(scores.length === 300)
  }
}
