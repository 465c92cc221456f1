package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Silhouette, time-decayed stats, join-cardinality estimation. */
class ScaleUtilOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------- silhouetteBy

  test("silhouetteBy: perfectly separated clusters score 1.0") {
    val rows = Seq(
      (1L, 0, Array(1.0f, 0.0f)), (2L, 0, Array(1.0f, 0.0f)),
      (3L, 1, Array(0.0f, 1.0f)), (4L, 1, Array(0.0f, 1.0f)))
      .toDF("id", "label", "vec")
    val by = Embeddings.silhouetteBy(rows, "id", "label", "vec")
      .collect().map(r => r.getAs[Int]("label") -> r).toMap
    // a = 0 (points sit on their centroid), b > 0 → s = 1
    assert(by(0).getAs[Long]("mean_s_micro") === 1000000L)
    assert(by(1).getAs[Long]("mean_s_micro") === 1000000L)
    assert(by(0).getAs[Long]("n_points") === 2)
  }

  test("silhouetteBy: a point planted in the wrong cluster scores negative") {
    val rows = Seq(
      (1L, 0, Array(1.0f, 0.0f)), (2L, 0, Array(1.0f, 0.0f)),
      (3L, 1, Array(0.0f, 1.0f)), (4L, 1, Array(0.0f, 1.0f)),
      (5L, 0, Array(0.0f, 1.0f))) // wrong side
      .toDF("id", "label", "vec")
    val by = Embeddings.silhouetteBy(rows, "id", "label", "vec")
      .collect().map(r => r.getAs[Int]("label") -> r).toMap
    // label-0 mean is dragged down by the planted point (its own
    // centroid moved too, but it is still far nearer to cluster 1)
    assert(by(0).getAs[Long]("mean_s_micro") <
      by(1).getAs[Long]("mean_s_micro"))
    assert(by(1).getAs[Long]("mean_s_micro") > 900000L)
  }

  test("silhouetteBy: partitioning invariance") {
    val rows = (1 to 60).map(i =>
      (i.toLong, i % 3, Array.tabulate(4)(j =>
        (if (j == i % 3) 1.0f else 0.0f) + (i % 7) * 0.01f)))
      .toDF("id", "label", "vec")
    val a = Embeddings.silhouetteBy(rows, "id", "label", "vec")
      .orderBy("label").collect()
    val b = Embeddings.silhouetteBy(rows.repartition(13), "id", "label", "vec")
      .orderBy("label").collect()
    assert(a.map(_.toSeq).sameElements(b.map(_.toSeq)))
  }

  // ------------------------------------------------------ timeDecayedStats

  test("timeDecayedStats: power-of-two halflife weights") {
    val rows = Seq(
      ("a", "2024-02-05 10:00:00", 1.0),  // age 0 → k=0 → w = 2^20
      ("a", "2024-01-29 10:00:00", 2.0),  // age 7 → k=1 → w = 2^19
      ("a", "2023-07-01 10:00:00", 4.0),  // ancient → w = 0
      ("b", "2024-02-10 10:00:00", 3.0))  // future → clamps to k=0
      .toDF("k", "ts", "v")
    val by = Temporal.timeDecayedStats(rows, "k", "ts", "v",
      refDate = "2024-02-05", halflifeDays = 7)
      .collect().map(r => r.getAs[String]("k") -> r).toMap
    assert(by("a").getAs[Long]("n") === 3)
    assert(by("a").getAs[Long]("decayed_x20") === (1L << 20) + (1L << 19))
    assert(by("a").getAs[Long]("decayed_cents_x20") ===
      100L * (1L << 20) + 200L * (1L << 19))
    assert(by("b").getAs[Long]("decayed_x20") === (1L << 20))
  }

  // ------------------------------------------------------- joinCardinality

  test("joinCardinality: exact histogram product") {
    val a = Seq(1L, 1L, 2L, 9L).toDF("k")
    val b = Seq(1L, 1L, 1L, 3L).toDF("k")
    val r = Profile.joinCardinality(a, "k", b, "k").head()
    assert(r.getAs[Long]("est_rows") === 6) // only key 1 matches: 2*3
    assert(r.getAs[Long]("n_matched_keys") === 1)
    assert(r.getAs[Long]("max_key_rows") === 6)
    assert(r.getAs[Long]("max_key_share_ppm") === 1000000L)
    // the estimate equals the actual join size
    assert(a.join(b, "k").count() === 6)
  }

  // --------------------------------------------------------- quantizeInt8

  test("quantizeInt8: power-of-two scales, codes in int8 range, exact zero") {
    val rows = Seq(
      (1L, Array(1.0f, -0.5f, 0.25f)),   // maxabs 1 → e = -7 (127/128 < 1)
      (2L, Array(0.0f, 0.0f)),           // all-zero → floor exponent
      (3L, Array(200.0f, -100.0f)))      // needs e = 1 (127*2 >= 200)
      .toDF("id", "vec")
    val by = Embeddings.quantizeInt8(rows, "id", "vec").collect()
      .map(r => r.getAs[Long]("id") -> r).toMap
    assert(by(1L).getAs[Int]("e") === -7 + 1) // 127*2^-7 = 0.9921875 < 1 → -6
    val codes1 = by(1L).getAs[scala.collection.Seq[Int]]("codes")
    assert(codes1.forall(c => c >= -127 && c <= 127))
    // 2^-6 scale: 1.0/2^-6 = 64 exactly → zero reconstruction error
    assert(codes1.head === 64)
    assert(by(1L).getAs[Long]("err_e15") === 0L) // all components dyadic
    assert(by(2L).getAs[Int]("e") === -40)
    assert(by(2L).getAs[Long]("err_e15") === 0L)
    assert(by(3L).getAs[Int]("e") === 1)
    assert(by(3L).getAs[scala.collection.Seq[Int]]("codes").toSeq === Seq(100, -50))
  }

  test("quantizeInt8Report: rollup keyed by label") {
    val rows = Seq((1L, 7, Array(1.0f, 0.5f)), (2L, 7, Array(0.25f, 0.125f)),
      (3L, 9, Array(2.0f, 4.0f))).toDF("id", "label", "vec")
    val by = Embeddings.quantizeInt8Report(rows, "id", "label", "vec")
      .collect().map(r => r.getAs[Int]("label") -> r).toMap
    assert(by(7).getAs[Long]("n_vecs") === 2)
    assert(by(9).getAs[Long]("n_vecs") === 1)
    // dyadic inputs quantize losslessly
    assert(by(7).getAs[Long]("total_err_e15") === 0L)
    assert(by(9).getAs[Long]("total_err_e15") === 0L)
  }

  // ---------------------------------------------------- weightedExactScale

  test("weightedExactScale: weighted lower quantiles, weight-sensitive") {
    // values 1..4 with weights 1, 1, 1, 7 -> W=10:
    //  p500 target ceil(5)=5 -> first cum >= 5 is value 4 (cum 1,2,3,10)
    //  p250 target ceil(2.5)=3 -> value 3
    val df = Seq((1.0, 1L), (2.0, 1L), (3.0, 1L), (4.0, 7L))
      .toDF("v", "w")
    val got = graft.ops.Quantiles.weightedExactScale(df, "v", "w",
      Seq(250, 500, 900)).collect()
      .map(r => r.getAs[Long]("p_permille") -> r).toMap
    assert(got(250L).getAs[Double]("value") === 3.0)
    assert(got(250L).getAs[Long]("t_rank") === 3L)
    assert(got(500L).getAs[Double]("value") === 4.0)
    assert(got(900L).getAs[Double]("value") === 4.0)
    assert(got(500L).getAs[Long]("total_weight") === 10L)
    // unweighted (all weights 1) equals the plain lower quantile
    val flat = Seq(10.0, 20.0, 30.0, 40.0).map((_, 1L)).toDF("v", "w")
    val m = graft.ops.Quantiles.weightedExactScale(flat, "v", "w", Seq(500))
      .head()
    assert(m.getAs[Double]("value") === 20.0) // ceil(0.5*4)=2nd value
  }
}
