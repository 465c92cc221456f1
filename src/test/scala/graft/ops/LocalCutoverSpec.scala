package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Optimization round 18: the bounded driver cutovers added to the
  * distinct-value prefix-scan family must be PATH-EQUAL — the driver
  * fast path (cells ≤ maxLocalCells, the default at spec scale) and
  * the distributed two-pass range-partitioned scan (forced with
  * maxLocalCells = 0) produce identical rows, because both walk the
  * same value order with the same exact integer arithmetic and the
  * same closing double expressions. */
class LocalCutoverSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[Double], tag: String = "x") =
    rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", tag)

  private val xs = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0,
    5.0, 8.0, 9.0, 7.0, 9.0)
  private val ys = Seq(2.0, 7.0, 1.0, 8.0, 2.0, 8.0, 1.0, 8.0, 2.0, 8.0,
    4.0, 5.0, 9.0, 0.0, 4.0)

  private def sortedRows(d: org.apache.spark.sql.DataFrame) =
    d.collect().map(_.toSeq.map(String.valueOf(_)).mkString("|")).sorted.toSeq

  test("exactScale: driver cutover == forced distributed scan") {
    val probs = Seq(0.1, 0.25, 0.5, 0.9, 1.0)
    val a = Quantiles.exactScale(df(xs), "x", probs)
    val b = Quantiles.exactScale(df(xs), "x", probs, maxLocalCells = 0L)
    assert(sortedRows(a) === sortedRows(b))
    // and both equal the buffering correctness anchor
    assert(sortedRows(a) === sortedRows(Quantiles.exact(df(xs), "x", probs)))
  }

  test("weightedExactScale: driver cutover == forced distributed scan") {
    val d = xs.zip(ys).zipWithIndex
      .map { case ((v, w), i) => (i.toLong, v, math.max(w, 1.0).toLong) }
      .toDF("id", "x", "w")
    val pm = Seq(100, 500, 900, 1000)
    val a = Quantiles.weightedExactScale(d, "x", "w", pm)
    val b = Quantiles.weightedExactScale(d, "x", "w", pm, maxLocalCells = 0L)
    assert(sortedRows(a) === sortedRows(b))
  }

  test("exactByGroupScale: driver cutover == forced distributed chain") {
    val d = xs.zip(ys).zipWithIndex
      .map { case ((v, g), i) => (i.toLong, (g % 3).toInt, v) }
      .toDF("id", "g", "x")
    val probs = Seq(0.0, 0.5, 0.95)
    val a = Quantiles.exactByGroupScale(d, "g", "x", probs)
    val b = Quantiles.exactByGroupScale(d, "g", "x", probs,
      maxLocalCells = 0L)
    assert(sortedRows(a) === sortedRows(b))
  }

  test("ksStatistic / cvmStatistic / mannWhitneyU / emd1d: path equality") {
    val a = df(xs); val b = df(ys)
    assert(Drift.ksStatistic(a, b, "x") ===
      Drift.ksStatistic(a, b, "x", maxLocalCells = 0L))
    assert(sortedRows(Drift.cvmStatistic(a, b, "x")) ===
      sortedRows(Drift.cvmStatistic(a, b, "x", maxLocalCells = 0L)))
    assert(sortedRows(Drift.mannWhitneyU(a, b, "x")) ===
      sortedRows(Drift.mannWhitneyU(a, b, "x", maxLocalCells = 0L)))
    assert(sortedRows(Drift.emd1d(a, b, "x")) ===
      sortedRows(Drift.emd1d(a, b, "x", maxLocalCells = 0L)))
  }

  test("spearman / kruskalWallis: joint-cell cutover == rank-map path") {
    val d = xs.zip(ys).zipWithIndex
      .map { case ((x, y), i) => (i.toLong, x, y) }.toDF("id", "x", "y")
    assert(sortedRows(Stats.spearman(d, "x", "y")) ===
      sortedRows(Stats.spearman(d, "x", "y", maxLocalCells = 0L)))
    val g = xs.zip(ys).zipWithIndex
      .map { case ((x, y), i) => (i.toLong, s"g${(y % 3).toInt}", x) }
      .toDF("id", "g", "x")
    assert(sortedRows(Stats.kruskalWallis(g, "g", "x")) ===
      sortedRows(Stats.kruskalWallis(g, "g", "x", maxLocalCells = 0L)))
  }

  test("spearman: BigInt moment branch (n > long-exact bound) matches") {
    // round 19 (ADVICE): the long-exact bound is now a parameter
    // (`longExactN`), so the BigInt accumulator branch EXECUTES at
    // small n — longExactN = 0 forces it; the long branch (default
    // bound) and the distributed decimal(38,0) path are the witnesses.
    val d = (0 until 500).map { i =>
      (i.toLong, (i % 17).toDouble, ((i * 31) % 13).toDouble)
    }.toDF("id", "x", "y")
    val long_branch = sortedRows(Stats.spearman(d, "x", "y"))
    val bigint_branch = sortedRows(Stats.spearman(d, "x", "y",
      longExactN = 0L))
    val distributed = sortedRows(Stats.spearman(d, "x", "y",
      maxLocalCells = 0L))
    assert(bigint_branch === long_branch)
    assert(bigint_branch === distributed)
  }
}
