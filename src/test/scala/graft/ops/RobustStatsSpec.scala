package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Chi-square independence, winsorized stats, IBAN validation. */
class RobustStatsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ chiSquare

  test("chiSquare: independent columns score zero, dependence is large") {
    val ind = (0 until 600).map(i => (i % 2, i % 3)).toDF("a", "b")
    val r0 = Analytics.chiSquare(ind, "a", "b").head()
    assert(r0.getAs[Double]("chi2") === 0.0)
    assert(r0.getAs[Long]("dof") === 2)
    assert(r0.getAs[Double]("cramers_v") === 0.0)
    // perfect dependence: chi2 = n * minDim, V = 1
    val dep = (0 until 600).map(i => (i % 3, i % 3)).toDF("a", "b")
    val r1 = Analytics.chiSquare(dep, "a", "b").head()
    assert(math.abs(r1.getAs[Double]("chi2") - 1200.0) < 1e-4)
    assert(math.abs(r1.getAs[Double]("cramers_v") - 1.0) < 1e-6)
  }

  // ------------------------------------------------------- winsorizedStats

  test("winsorizedStats: clips the tails at the group percentiles") {
    // group g: 1..100 → p5 = 5.95, p95 = 95.05 (percentile interpolation)
    val rows = (1 to 100).map(i => ("g", i.toDouble)).toDF("k", "x")
    val r = Analytics.winsorizedStats(rows, "k", "x", 0.05, 0.95).head()
    assert(r.getAs[Long]("n") === 100)
    assert(r.getAs[Long]("n_clipped_lo") === 5)  // 1..5 below 5.95
    assert(r.getAs[Long]("n_clipped_hi") === 5)  // 96..100 above 95.05
    assert(r.getAs[Double]("lo") === 5.95 && r.getAs[Double]("hi") === 95.05)
    // winsorized cent-sum: middle untouched, tails at the bounds
    val expected = (6 to 95).map(_ * 100L).sum + 5 * 595L + 5 * 9505L
    assert(r.getAs[Long]("winsorized_cents") === expected)
  }

  // -------------------------------------------------------------- ibanScan

  test("ibanScan: validates mod-97, rejects corrupted checksums") {
    val rows = Seq(
      (1L, "pay to DE89370400440532013000 today"),  // valid
      (2L, "pay to DE89370400440532013001 today"),  // checksum broken
      (3L, "gb account GB82WEST12345698765432 ok"), // valid with letters
      (4L, "no iban here"),
      (5L, "short DE8912345678901 run"))            // 15 chars, bad sum
      .toDF("doc_id", "text")
    val got = TextAnalysis.ibanScan(rows, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got(1L).getAs[Boolean]("iban_valid"))
    assert(!got(2L).getAs[Boolean]("iban_valid"))
    assert(got(3L).getAs[Boolean]("iban_valid"))
    assert(!got.contains(4L))
    assert(!got(5L).getAs[Boolean]("iban_valid"))
  }
}
