package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Modularity, Poisson bootstrap, mutual information, Holt smoothing. */
class StatOpsSpec extends SparkSpec {
  import spark.implicits._

  // ----------------------------------------------------------- modularity

  test("modularity: two triangles with a bridge, hand-computed") {
    // triangle {1,2,3}, triangle {4,5,6}, bridge 3-4 → m = 7
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("s", "d")
    val mem = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 2L), (5L, 2L), (6L, 2L)).toDF("id", "c")
    val per = Graph.modularity(edges, "s", "d", mem, "id", "c")
      .orderBy("community").collect()
    assert(per.length === 2)
    // each community: e_in = 3, d_sum = 7
    assert(per.forall(r => r.getAs[Long]("e_in") === 3L))
    assert(per.forall(r => r.getAs[Long]("d_sum") === 7L))
    // q = 3e12 div 7 − 49e12 div 196 = 428571428571 − 250000000000
    assert(per.forall(r => r.getAs[Long]("q_e12") === 178571428571L))
    val tot = Graph.modularityTotal(
      Graph.modularity(edges, "s", "d", mem, "id", "c")).head()
    assert(tot.getAs[Long]("modularity_e12") === 2 * 178571428571L)
  }

  test("modularity: the all-in-one partition scores zero") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("s", "d")
    val mem = Seq((1L, 9L), (2L, 9L), (3L, 9L)).toDF("id", "c")
    val r = Graph.modularity(edges, "s", "d", mem, "id", "c").head()
    assert(r.getAs[Long]("q_e12") === 0L) // 1e12 div 1 − 36e12 div 36
  }

  // ------------------------------------------------------- bootstrapMeans

  test("bootstrapMeans: deterministic, constant values give exact means") {
    val df = (1L to 500L).map(i => (i, 3.14)).toDF("id", "v")
    val m1 = Sampling.bootstrapMeans(df, "id", "v", replicates = 10)
      .orderBy("replicate").collect()
    val m2 = Sampling.bootstrapMeans(df.repartition(7), "id", "v",
      replicates = 10).orderBy("replicate").collect()
    assert(m1.map(_.toSeq).sameElements(m2.map(_.toSeq)))
    assert(m1.length === 10)
    // constant column: every replicate mean is exactly 314 * 1e6
    assert(m1.forall(_.getAs[Long]("mean_ppm_units") === 314000000L))
    // Poisson(1) weights: n_eff within a loose band of n
    assert(m1.forall(r => math.abs(r.getAs[Long]("n_eff") - 500L) < 150))
  }

  test("bootstrapSummary: ordered CI bounds") {
    val df = (1L to 2000L).map(i => (i, (i % 100).toDouble)).toDF("id", "v")
    val s = Sampling.bootstrapSummary(
      Sampling.bootstrapMeans(df, "id", "v", replicates = 30)).head()
    assert(s.getAs[Long]("n_replicates") === 30)
    assert(s.getAs[Double]("ci_lo") <= s.getAs[Double]("median"))
    assert(s.getAs[Double]("median") <= s.getAs[Double]("ci_hi"))
  }

  // ----------------------------------------------------------- mutualInfo

  test("mutualInfo: independent columns score zero, copy scores H") {
    val ind = (0 until 600).map(i => (i % 2, i % 3)).toDF("a", "b")
    val r0 = Analytics.mutualInfo(ind, "a", "b").head()
    assert(r0.getAs[Double]("mi_nats") === 0.0)
    val dep = (0 until 600).map(i => (i % 3, i % 3)).toDF("a", "b")
    val r1 = Analytics.mutualInfo(dep, "a", "b").head()
    assert(r1.getAs[Double]("mi_nats") === r1.getAs[Double]("h_a"))
    assert(math.abs(r1.getAs[Double]("h_a") - math.log(3)) < 1e-5)
  }

  // -------------------------------------------------------- holtLevelTrend

  test("holtLevelTrend: two-point hand check and key isolation") {
    val df = Seq(
      (1L, "2024-01-01 00:00:00", 1L, 10.0),
      (1L, "2024-01-01 00:01:00", 2L, 20.0),
      (2L, "2024-01-01 00:00:00", 3L, 5.0))
      .toDF("k", "ts", "tie", "v")
    val by = Drift.holtLevelTrend(df, "k", "ts", "tie", "v").collect()
      .map(r => r.getAs[Long]("k") -> r).toMap
    val r1 = by(1L)
    assert(r1.getAs[Double]("level") === 15.0) // 0.5*20 + 0.5*10
    assert(r1.getAs[Double]("trend") === 1.25) // 0.25*(15-10)
    assert(r1.getAs[Double]("forecast") === 16.25)
    val r2 = by(2L)
    assert(r2.getAs[Double]("level") === 5.0 && r2.getAs[Double]("trend") === 0.0)
  }

  test("holtLevelTrend: partitioning cannot change the fold") {
    val df = (1 to 200).map(i =>
      (i % 5L, f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00", i.toLong,
        (i * 7 % 43).toDouble)).toDF("k", "ts", "tie", "v")
    val a = Drift.holtLevelTrend(df, "k", "ts", "tie", "v")
      .orderBy("k").collect()
    val b = Drift.holtLevelTrend(df.repartition(11), "k", "ts", "tie", "v")
      .orderBy("k").collect()
    assert(a.map(_.toSeq).sameElements(b.map(_.toSeq)))
  }

  test("wilcoxonSignedRank: hand-computed ranks, midrank ties, zero drop") {
    import spark.implicits._
    // d = {+1, +2, -3, +4}: ranks of |d| are 1..4, W+ = 1+2+4 = 7
    val a = Stats.wilcoxonSignedRank(
      Seq(("a", 1L), ("b", 2L), ("c", -3L), ("d", 4L)).toDF("u", "d"),
      "u", col("d")).head()
    assert(a.getLong(0) === 4L && a.getLong(1) === 14L && a.getLong(2) === 0L)
    assert(math.abs(a.getDouble(3) - 4.0 / math.sqrt(30.0)) < 1e-6)
    // ties: d = {+1, -1, +2} -> midranks 1.5, 1.5, 3; positives are
    // +1 (1.5) and +2 (3) -> W+ = 4.5, doubled W2 = 9; T = 2^3 - 2 = 6
    val b = Stats.wilcoxonSignedRank(
      Seq(("a", 1L), ("b", -1L), ("c", 2L), ("z", 0L)).toDF("u", "d"),
      "u", col("d")).head()
    assert(b.getLong(0) === 3L, "zero diff drops")
    assert(b.getLong(1) === 9L && b.getLong(2) === 6L)
    // z = (W2 - n(n+1)/2) / sqrt(n(n+1)(2n+1)/6 - T/12) = 3/sqrt(13.5)
    assert(math.abs(b.getDouble(3) - 3.0 / math.sqrt(13.5)) < 1e-6)
    // partition invariance (two-pass global rank, integral sums)
    val big = (1 to 300).map(i => (s"u$i", if (i % 3 == 0) -i.toLong else i.toLong))
      .toDF("u", "d")
    val r1 = Stats.wilcoxonSignedRank(big, "u", col("d")).head()
    val r2 = Stats.wilcoxonSignedRank(big.repartition(17), "u", col("d")).head()
    assert(r1.toSeq === r2.toSeq)
  }

  test("friedmanTest: textbook no-tie case; incomplete blocks drop; tie correction") {
    import spark.implicits._
    // 3 blocks × 3 treatments, treatment C always best, A always worst:
    // ranks per block (A,B,C) = (1,2,3); R_j = (3,6,9); no ties.
    // chi2 = 12/(n k (k+1)) ΣR² − 3n(k+1) = 12/36·(9+36+81) − 36 = 6
    val df = (for {
      b <- 1 to 3
      (tr, v) <- Seq(("A", 10L), ("B", 20L), ("C", 30L))
    } yield (s"b$b", tr, v + b)).toDF("b", "tr", "v")
    val r = Stats.friedmanTest(df, col("b"), col("tr"), col("v")).head()
    assert(r.getLong(0) === 3L && r.getLong(1) === 3L && r.getLong(2) === 0L)
    assert(math.abs(r.getDouble(3) - 6.0) < 1e-9)
    // an incomplete block drops and is counted
    val withBad = df.unionAll(Seq(("b9", "A", 5L)).toDF("b", "tr", "v"))
    val r2 = Stats.friedmanTest(withBad, col("b"), col("tr"), col("v")).head()
    assert(r2.getLong(0) === 3L && r2.getLong(2) === 1L)
    assert(r2.getDouble(3) === r.getDouble(3))
    // full ties within every block reject (zero denominator)
    intercept[IllegalArgumentException] {
      Stats.friedmanTest(
        (for { b <- 1 to 2; tr <- Seq("A", "B") } yield (s"b$b", tr, 7L))
          .toDF("b", "tr", "v"), col("b"), col("tr"), col("v"))
    }
    ()
  }

  test("cmhTest: hand-computed two-stratum tables; degenerate strata skipped") {
    import spark.implicits._
    // stratum A: a=3 b=1 c=1 d=3 (n=8, E=2, V=4*4*4*4/(64*7)=4/7)
    // stratum B: a=2 b=2 c=2 d=2 (n=8, E=2, V=4/7)
    def rows(s: String, e: Boolean, o: Boolean, k: Int) =
      Seq.fill(k)((s, e, o))
    val df = (rows("A", true, true, 3) ++ rows("A", true, false, 1) ++
      rows("A", false, true, 1) ++ rows("A", false, false, 3) ++
      rows("B", true, true, 2) ++ rows("B", true, false, 2) ++
      rows("B", false, true, 2) ++ rows("B", false, false, 2) ++
      // degenerate stratum: no unexposed rows — contributes nothing
      rows("Z", true, true, 4))
      .toDF("s", "e", "o")
    val r = Stats.cmhTest(df, col("s"), col("e"), col("o")).head()
    assert(r.getLong(0) === 3L && r.getLong(1) === 5L)
    assert(math.abs(r.getDouble(2) - 4.0) < 1e-9)          // E total
    assert(math.abs(r.getDouble(3) - 8.0 / 7.0) < 1e-6)    // V total
    // chi2 = (5-4)^2 / (8/7) = 7/8
    assert(math.abs(r.getDouble(4) - 0.875) < 1e-6)
    // OR_MH = (3*3/8 + 2*2/8) / (1*1/8 + 2*2/8) = (13/8)/(5/8) = 2.6
    assert(math.abs(r.getDouble(5) - 2.6) < 1e-6)
  }

  test("ratioMetricCI: hand-computed delta-method variance") {
    import spark.implicits._
    // units (x, y): (10,2), (20,4), (30,4) -> R = 6, varX = 100,
    // varY = 4/3, covXY = 10; se^2 = (100 - 120 + 48) / (3 * (10/3)^2)
    val df = Seq(("u1", 10L, 2L), ("u2", 20L, 4L), ("u3", 30L, 4L))
      .toDF("u", "x", "y")
    val r = Stats.ratioMetricCI(df, "u", col("x"), col("y")).head()
    assert(r.getLong(0) === 3L && r.getLong(1) === 60L && r.getLong(2) === 10L)
    assert(math.abs(r.getDouble(3) - 6.0) < 1e-9)
    val se = math.sqrt(28.0 / (3.0 * (10.0 / 3.0) * (10.0 / 3.0)))
    assert(math.abs(r.getDouble(4) - se) < 1e-6)
    assert(math.abs(r.getDouble(5) - (6.0 - 1.96 * se)) < 1e-5)
    assert(math.abs(r.getDouble(6) - (6.0 + 1.96 * se)) < 1e-5)
    // degenerate contracts
    intercept[IllegalArgumentException] {
      Stats.ratioMetricCI(df.limit(1), "u", col("x"), col("y"))
    }
    ()
  }

  test("signFlipTest: null diffs, strong signal rejects, partition-invariant") {
    import spark.implicits._
    // all-zero diffs: every flipped statistic ties the observed 0 ->
    // p = (128+1)/(128+1) = 1
    val zero = (1 to 50).map(i => (s"u$i", 0L)).toDF("u", "d")
    val rz = Stats.signFlipTest(zero, "u", col("d")).head()
    assert(rz.getLong(0) === 50L && rz.getLong(2) === 0L)
    assert(rz.getLong(3) === 128L && rz.getLong(4) === 1000000L)
    // one pair can never reject: |±d| always ties |d|
    val one = Seq(("solo", 7L)).toDF("u", "d")
    assert(Stats.signFlipTest(one, "u", col("d")).head().getLong(4) === 1000000L)
    // 200 keys all +100: observed 20000 dwarfs the ±sqrt(n)-scale
    // flipped sums -> small p
    val strong = (1 to 200).map(i => (s"k$i", 100L)).toDF("u", "d")
    val rs = Stats.signFlipTest(strong, "u", col("d")).head()
    assert(rs.getLong(2) === 20000L)
    assert(rs.getLong(4) < 100000L, s"p_ppm ${rs.getLong(4)}")
    // deterministic and partition-invariant (integer sums commute)
    val rp = Stats.signFlipTest(strong.repartition(13), "u", col("d")).head()
    assert(rp.toSeq === rs.toSeq)
    intercept[IllegalArgumentException] {
      Stats.signFlipTest(strong, "u", col("d"), flips = 200)
    }
    ()
  }
}
