package graft.ops

import graft.SparkSpec
// (gains-curve spec appended at the end of this suite)
import org.apache.spark.sql.functions._

/** Integer-exact retrieval / classifier evaluation metrics. */
class EvaluationSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------- rankedEval

  // query 1: run retrieves items 10,20,30 (scores 3,2,1); grades 3,0,1.
  // query 2: run retrieves 10,20 (scores 5,4); nothing relevant.
  private val run = Seq(
    (1L, 10L, 3.0), (1L, 20L, 2.0), (1L, 30L, 1.0),
    (2L, 10L, 5.0), (2L, 20L, 4.0)).toDF("q", "item", "s")
  private val truth = Seq(
    (1L, 10L, 3L), (1L, 30L, 1L), (1L, 99L, 2L), // 99 never retrieved
    (2L, 77L, 1L)).toDF("q", "item", "rel")

  test("rankedEval: hand-computed metrics at k=3") {
    val lcm = Evaluation.rankLcm(3) // 6
    val w = Evaluation.dcgWeights(3)
    val got = Evaluation.rankedEval(run, truth, "q", "item", "s", "rel", 3)
      .orderBy("q").collect()

    val r1 = got(0)
    assert(r1.getAs[Long]("hits") === 2) // items 10 and 30
    assert(r1.getAs[Long]("n_rel") === 3)
    assert(r1.getAs[Long]("prec_ppm") === 2L * 1000000 / 3)
    assert(r1.getAs[Long]("rec_ppm") === 2L * 1000000 / 3)
    assert(r1.getAs[Long]("rr_lcm") === lcm) // first hit at rank 1
    // AP numerator: rank1 hit (hits=1) → 1*(6/1); rank3 hit (hits=2) → 2*(6/3)
    val apNum = 1 * (lcm / 1) + 2 * (lcm / 3)
    assert(r1.getAs[Long]("ap_ppm") === apNum * 1000000L / (lcm * 3))
    // DCG: 3*w(1) + 0*w(2) + 1*w(3); IDCG: grades 3,2,1 in order
    val dcg = 3 * w(0) + 1 * w(2)
    val idcg = 3 * w(0) + 2 * w(1) + 1 * w(2)
    assert(r1.getAs[Long]("dcg_e9") === dcg)
    assert(r1.getAs[Long]("idcg_e9") === idcg)
    assert(r1.getAs[Long]("ndcg_ppm") === dcg * 1000000L / idcg)

    val r2 = got(1)
    assert(r2.getAs[Long]("hits") === 0)
    assert(r2.getAs[Long]("n_rel") === 1) // item 77, never retrieved
    assert(r2.getAs[Long]("rr_lcm") === 0)
    assert(r2.getAs[Long]("rec_ppm") === 0)
    assert(r2.getAs[Long]("ap_ppm") === 0)
    // no relevant item retrieved but idcg is defined (truth has grades)
    assert(r2.getAs[Long]("ndcg_ppm") === 0)
  }

  test("rankedEval: perfect ranking scores ndcg = rr = 1") {
    val perfRun = Seq((1L, 10L, 9.0), (1L, 99L, 8.0), (1L, 30L, 7.0))
      .toDF("q", "item", "s") // retrieved exactly in grade order 3,2,1
    val got = Evaluation.rankedEval(perfRun, truth, "q", "item", "s", "rel", 3)
      .head()
    assert(got.getAs[Long]("ndcg_ppm") === 1000000L)
    assert(got.getAs[Long]("rr_lcm") === Evaluation.rankLcm(3))
    assert(got.getAs[Long]("ap_ppm") === 1000000L)
  }

  test("irSummary rolls up per-query rows") {
    val per = Evaluation.rankedEval(run, truth, "q", "item", "s", "rel", 3)
    val s = Evaluation.irSummary(per, 3).head()
    assert(s.getAs[Long]("n_queries") === 2)
    val lcm = Evaluation.rankLcm(3)
    assert(s.getAs[Long]("mrr_ppm") === (lcm + 0) * 1000000L / (lcm * 2))
  }

  // ------------------------------------------------------------- prCurve

  test("prCurve: prefix sums are exact and recall is monotone") {
    val df = Seq((5.0, 1L), (5.0, 0L), (4.0, 1L), (3.0, 0L), (3.0, 1L),
      (1.0, 0L)).toDF("s", "y")
    val pts = Evaluation.prCurve(df, "s", "y").orderBy(desc("threshold"))
      .collect()
    assert(pts.length === 4) // distinct scores
    // threshold 5: tp=1 fp=1; threshold 4: tp=2 fp=1; 3: tp=3 fp=2
    assert(pts(0).getAs[Long]("tp") === 1 && pts(0).getAs[Long]("fp") === 1)
    assert(pts(1).getAs[Long]("tp") === 2 && pts(1).getAs[Long]("fp") === 1)
    assert(pts(2).getAs[Long]("tp") === 3 && pts(2).getAs[Long]("fp") === 2)
    // last point covers everything
    assert(pts(3).getAs[Long]("tp") === 3 && pts(3).getAs[Long]("fn") === 0)
    val recalls = pts.map(_.getAs[Long]("rec_ppm"))
    assert(recalls.sameElements(recalls.sorted))
    // partitioning cannot change the curve
    val re = Evaluation.prCurve(df.repartition(7), "s", "y")
      .orderBy(desc("threshold")).collect()
    assert(re.map(_.toSeq).sameElements(pts.map(_.toSeq)))
  }

  test("confusionAt agrees with the prCurve point at that threshold") {
    val df = Seq((5.0, 1L), (5.0, 0L), (4.0, 1L), (3.0, 0L), (3.0, 1L),
      (1.0, 0L)).toDF("s", "y")
    val c = Evaluation.confusionAt(df, "s", "y", 4.0).head()
    val p = Evaluation.prCurve(df, "s", "y")
      .filter(col("threshold") === 4.0).head()
    for (f <- Seq("tp", "fp", "fn", "tn", "prec_ppm", "rec_ppm", "f1_ppm"))
      assert(c.getAs[Long](f) === p.getAs[Long](f), f)
  }

  // -------------------------------------------------- calibration / brier

  test("brier: perfect ppm predictions score zero, worst score 1e12") {
    val perfect = Seq((1000000L, 1L), (0L, 0L), (1000000L, 1L))
      .toDF("mu", "y")
    val b = Evaluation.brier(perfect, "mu", "y", 10).head()
    assert(b.getAs[Long]("brier_e12") === 0L)
    assert(b.getAs[Long]("ece_ppm") === 0L)
    val worst = Seq((1000000L, 0L), (0L, 1L)).toDF("mu", "y")
    val w = Evaluation.brier(worst, "mu", "y", 10).head()
    assert(w.getAs[Long]("brier_e12") === 1000000000000L)
  }

  test("calibrationBins: bin edges and counts") {
    val df = Seq((0L, 0L), (99999L, 0L), (100000L, 1L), (999999L, 1L),
      (1000000L, 1L)).toDF("mu", "y")
    val bins = Evaluation.calibrationBins(df, "mu", "y", 10)
      .orderBy("bin").collect()
    // mu=0 and 99999 → bin 0; 100000 → bin 1; 999999 and 1000000 → bin 9
    assert(bins.map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n"))).toSeq
      === Seq((0L, 2L), (1L, 1L), (9L, 2L)))
    assert(bins.map(_.getAs[Long]("n")).sum === 5)
  }

  test("gainsCurve: perfect separation gives max early lift, curve ends at 1") {
    import org.apache.spark.sql.functions._
    // scores rank ids 1..10 top-down; the top-scored 5 are positive
    val df = (1 to 10).map(i => (i.toLong, (11 - i).toDouble, i <= 5))
      .toDF("id", "s", "y")
    val got = Evaluation.gainsCurve(df, "id", "s", col("y"), buckets = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(5),
        r.getLong(6)))
    // bucket 0: 2 of 2 positive → capture 2/5, lift = (2·10)/(2·5) = 2
    assert(got(0) == ((0L, 2L, 400000L, 2000000L)), got(0).toString)
    // by bucket 2 every positive is captured; lift decays to 10/6
    assert(got(2)._3 == 1000000L && got(2)._4 == 1000000L * 10 / 6)
    // the curve always ends at capture 1, lift 1
    assert(got(4)._3 == 1000000L && got(4)._4 == 1000000L)
  }

  test("meanCumulativeFunction: cumulative recurrent events per at-risk unit") {
    import org.apache.spark.sql.functions._
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-03-${day}%02d 09:00:00")
    val ev = Seq(
      (1L, ts(1), "error"), (2L, ts(1), "error"), (1L, ts(3), "error"),
      (2L, ts(2), "click")) // non-matching event keeps user 2 at risk
      .toDF("user_id", "ts", "event_type")
    val got = Analytics.meanCumulativeFunction(ev, "ts", "user_id",
        col("event_type") === "error")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((2L, 2L, 1000000L), (1L, 3L, 1500000L)))
  }

  test("isotonicCalibration: pools adjacent violators, keeps monotone bins intact") {
    import spark.implicits._
    // 4 bins with rates 0.2, 0.6, 0.4, 0.8 — bins 1 and 2 violate and
    // pool to their joint rate 0.5; bins 0 and 3 stand
    val rows =
      (1 to 10).map(i => (0.05, if (i <= 2) 1L else 0L)) ++  // bin 0: 2/10
      (1 to 10).map(i => (0.30, if (i <= 6) 1L else 0L)) ++  // bin 1: 6/10
      (1 to 10).map(i => (0.55, if (i <= 4) 1L else 0L)) ++  // bin 2: 4/10
      (1 to 10).map(i => (0.80, if (i <= 8) 1L else 0L))     // bin 3: 8/10
    val df = rows.toDF("s", "y")
    val got = Evaluation.isotonicCalibration(df, col("s"), col("y"), nBins = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      (0, 10L, 200000L, 200000L),
      (1, 10L, 600000L, 500000L),
      (2, 10L, 400000L, 500000L),
      (3, 10L, 800000L, 800000L)))
    // iso is monotone by construction
    val iso = got.map(_._4)
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b })
    // a perfect score (s = 1.0) lands in the TOP bin, not out of range
    val top = Evaluation.isotonicCalibration(
      Seq((1.0, 1L), (0.0, 0L)).toDF("s", "y"), col("s"), col("y"), nBins = 4)
      .collect().map(_.getInt(0)).toSet
    assert(top === Set(0, 3))
  }

  test("fleissKappa: textbook identities — perfect agreement 1, no correction when pe tiny") {
    import spark.implicits._
    // 3 items, 3 raters each, all raters agree per item, 3 categories
    val perfect = Seq(
      (1L, "a"), (1L, "a"), (1L, "a"),
      (2L, "b"), (2L, "b"), (2L, "b"),
      (3L, "c"), (3L, "c"), (3L, "c")).toDF("i", "c")
    val p = Evaluation.fleissKappa(perfect, col("i"), col("c"), nRaters = 3)
      .head()
    assert(p.getDouble(3) === 1.0 && p.getDouble(5) === 1.0) // p_bar, kappa
    // items with the wrong rater count are DROPPED and reported
    val mixed = perfect.unionAll(Seq((4L, "a"), (4L, "a")).toDF("i", "c"))
    val m = Evaluation.fleissKappa(mixed, col("i"), col("c"), nRaters = 3)
      .head()
    assert(m.getLong(0) === 3L && m.getLong(2) === 1L)
    // hand-computed mixed-agreement case: 2 items, 2 raters;
    // item 1 agrees (a,a), item 2 splits (a,b):
    // p_bar = (2 + 0) / (2*2*1) = 0.5; totals a=3, b=1 of 4 ->
    // p_e = (9 + 1)/16 = 0.625; kappa = (0.5 - 0.625)/0.375 = -1/3
    val h = Evaluation.fleissKappa(
      Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "b")).toDF("i", "c"),
      col("i"), col("c"), nRaters = 2).head()
    assert(h.getDouble(3) === 0.5 && h.getDouble(4) === 0.625)
    assert(math.abs(h.getDouble(5) - (-1.0 / 3.0)) < 1e-6)
  }
}
