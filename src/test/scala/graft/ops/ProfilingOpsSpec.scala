package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ACF, lexical diversity, profile drift, embedding covariance. */
class ProfilingOpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------------ acf

  test("acf: matches the direct closed form and zero-fills gaps") {
    // 12 consecutive days, one gap (day 6 absent -> counted as 0)
    val xs = Seq(10.0, 20.0, 10.0, 20.0, 10.0, 20.0, 0.0, 20.0, 10.0, 20.0, 10.0, 20.0)
    val rows = xs.zipWithIndex.collect {
      case (v, i) if i != 6 =>
        (java.sql.Timestamp.valueOf(f"2024-03-${i + 1}%02d 10:00:00"), v)
    }
    val df = rows.toDF("d", "x")
    val got = Temporal.acf(df, "d", "x", maxLag = 3).collect()
      .map(r => r.getAs[Long]("lag") -> r.getAs[Double]("acf")).toMap
    def direct(k: Int): Double = {
      val c = xs.map(v => math.round(v * 100).toDouble)
      val n = c.size; val m = c.sum / n
      val num = (0 until n - k).map(t => (c(t) - m) * (c(t + k) - m)).sum
      val den = c.map(v => (v - m) * (v - m)).sum
      num / den
    }
    for (k <- 1 to 3)
      assert(math.abs(got(k.toLong) - direct(k)) < 1e-6, s"lag $k")
    assert(Temporal.acf(df, "d", "x", maxLag = 1).head()
      .getAs[Long]("n_days") === 12L)
  }

  // ------------------------------------------------------- tokenDiversity

  test("tokenDiversity: uniform tokens give entropy log2(V), TTR exact") {
    // slice u: 4 distinct tokens once each -> entropy 2 bits, TTR 1
    val docs = Seq(("u", "aa bb cc dd"), ("r", "x x x x x x x y"))
      .toDF("src", "text")
    val got = CorpusStats.tokenDiversity(docs, "src", "text").collect()
      .map(r => r.getAs[String]("slice") -> r).toMap
    val u = got("u")
    assert(u.getAs[Long]("n_tokens") === 4L && u.getAs[Long]("vocab") === 4L)
    assert(u.getAs[Double]("entropy_bits") === 2.0)
    assert(u.getAs[Long]("simpson_ppm") === 0L)       // no repeats
    assert(u.getAs[Long]("ttr_ppm") === 1000000L)
    val r = got("r")
    // 7x "x", 1x "y": simpson = 42/56, entropy = -(7/8 lg 7/8 + 1/8 lg 1/8)
    assert(r.getAs[Long]("simpson_ppm") === 42L * 1000000 / 56)
    val exp = -(7.0 / 8 * (math.log(7.0 / 8) / math.log(2)) +
      1.0 / 8 * (math.log(1.0 / 8) / math.log(2)))
    assert(math.abs(r.getAs[Double]("entropy_bits") - exp) < 1e-6)
  }

  // --------------------------------------------------------- profileDrift

  test("profileDrift: null rates, distincts, and deltas per column") {
    val a = Seq(("x", Some(1.0)), ("y", None), ("x", Some(2.0)), ("z", Some(2.0)))
      .toDF("k", "v")
    val b = Seq(("x", None), ("x", None), (null, Some(3.0)), ("w", Some(3.0)))
      .toDF("k", "v")
    val got = DataQuality.profileDrift(a, b, Seq("k", "v")).collect()
      .map(r => r.getAs[String]("column") -> r).toMap
    val k = got("k")
    assert(k.getAs[Long]("n_a") === 4L && k.getAs[Long]("n_b") === 4L)
    assert(k.getAs[Long]("null_ppm_a") === 0L)
    assert(k.getAs[Long]("null_ppm_b") === 250000L)
    assert(k.getAs[Long]("distinct_a") === 3L)  // x y z
    assert(k.getAs[Long]("distinct_b") === 2L)  // x w
    assert(k.getAs[Long]("null_drift_ppm") === 250000L)
    val v = got("v")
    assert(v.getAs[Long]("null_ppm_a") === 250000L)
    assert(v.getAs[Long]("null_ppm_b") === 500000L)
    assert(v.getAs[Long]("null_drift_ppm") === 250000L)
    assert(v.getAs[Long]("distinct_a") === 2L && v.getAs[Long]("distinct_b") === 1L)
  }

  // ----------------------------------------------------------- covariance

  test("covariance: matches the direct population covariance") {
    val vecs = Seq(
      Seq(1.0, 2.0, 0.5), Seq(2.0, 4.0, 0.5), Seq(3.0, 6.0, 0.5),
      Seq(4.0, 8.0, 0.5))
    val df = vecs.map(Tuple1(_)).toDF("emb")
    val got = Embeddings.covariance(df, "emb").collect()
      .map(r => (r.getAs[Int]("i"), r.getAs[Int]("j")) -> r.getAs[Double]("cov"))
      .toMap
    assert(got.size === 6) // upper triangle of d=3
    def direct(i: Int, j: Int): Double = {
      val n = vecs.size
      val mi = vecs.map(_(i)).sum / n; val mj = vecs.map(_(j)).sum / n
      vecs.map(v => (v(i) - mi) * (v(j) - mj)).sum / n
    }
    for (i <- 0 until 3; j <- i until 3)
      assert(math.abs(got((i, j)) - direct(i, j)) < 1e-6, s"($i,$j)")
    // dim 2 is constant -> zero variance and zero cross-covariance
    assert(got((2, 2)) === 0.0 && got((0, 2)) === 0.0)
  }

  test("covariance: rejects mixed dimensions") {
    val df = Seq(Tuple1(Seq(1.0, 2.0)), Tuple1(Seq(1.0, 2.0, 3.0))).toDF("emb")
    intercept[Exception] { Embeddings.covariance(df, "emb") }
  }
}
