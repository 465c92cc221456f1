package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multi-probe LSH and seasonal residuals. */
class MultiProbeSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = (0 until 200).map { i =>
    val base = Array.tabulate(16)(j => math.sin(i * 0.7 + j).toFloat)
    (i.toLong, base)
  }.toDF("vec_id", "embedding")

  test("multi-probe candidates are a superset: recall never drops") {
    val e = vecs
    val q = e.filter(col("vec_id") < 8)
    def hits(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = hits(Ann.bruteForceTopK(e, q, "vec_id", "embedding", k = 5))
    val single = hits(Ann.lshTopK(e, q, "vec_id", "embedding",
      k = 5, tables = 2, bits = 8))
    val multi = hits(Ann.lshTopKMultiProbe(e, q, "vec_id", "embedding",
      k = 5, tables = 2, bits = 8, probes = 4))
    assert((multi intersect truth).size >= (single intersect truth).size)
  }

  test("zero probes reduces exactly to single-probe LSH") {
    val e = vecs
    val q = e.filter(col("vec_id") < 5)
    val a = Ann.lshTopK(e, q, "vec_id", "embedding", k = 4,
      tables = 3, bits = 5).orderBy("query_id", "rank").collect()
    val b = Ann.lshTopKMultiProbe(e, q, "vec_id", "embedding", k = 4,
      tables = 3, bits = 5, probes = 0).orderBy("query_id", "rank").collect()
    assert(a.map(_.toSeq).sameElements(b.map(_.toSeq)))
  }

  test("seasonalResiduals: flat cells residual to zero, spikes counted") {
    val rows = Seq(
      ("k", "2024-01-01 10:00:00", 5.0), ("k", "2024-01-08 10:00:00", 5.0),
      ("k", "2024-01-15 10:00:00", 305.0)) // same Monday-10h cell
      .toDF("k", "ts", "v")
    val r = Analytics.seasonalResiduals(rows, "k", "ts", "v",
      threshCents = 10000).head()
    // cell mean = (500+500+30500) div 3 = 10500 cents
    assert(r.getAs[Long]("n") === 3)
    assert(r.getAs[Long]("max_abs_resid_cents") === 20000)
    assert(r.getAs[Long]("n_beyond") === 1) // only the spike
  }
}
