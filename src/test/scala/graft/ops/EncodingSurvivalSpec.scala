package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Target encoding, WoE/IV, Cohen's kappa, Kaplan-Meier. */
class EncodingSurvivalSpec extends SparkSpec {
  import spark.implicits._

  // --------------------------------------------------------- targetEncode

  test("targetEncode: LOO formula with smoothing toward the prior") {
    // cat a: 3 rows, 2 positive; cat b: 2 rows, 0 positive; prior 2/5
    val df = Seq(("a", 1L), ("a", 1L), ("a", 0L), ("b", 0L), ("b", 0L))
      .toDF("c", "y")
    val got = Importance.targetEncode(df, "c", col("y"), smoothing = 10.0)
      .collect()
      .map(r => (r.getAs[String]("category"), r.getAs[Long]("y")) ->
        r.getAs[Double]("enc")).toMap
    val prior = 2.0 / 5
    def enc(sum: Long, y: Long, n: Long) =
      (sum - y + 10.0 * prior) / (n - 1.0 + 10.0)
    assert(got.size === 3) // (a,0) (a,1) (b,0)
    assert(math.abs(got(("a", 1L)) - enc(2, 1, 3)) < 1e-6)
    assert(math.abs(got(("a", 0L)) - enc(2, 0, 3)) < 1e-6)
    assert(math.abs(got(("b", 0L)) - enc(0, 0, 2)) < 1e-6)
  }

  // ---------------------------------------------------------------- woeIv

  test("woeIv: matches the hand formula, omits zero-cell buckets") {
    // bucket 1: 3 good / 1 bad; bucket 2: 1 good / 3 bad;
    // bucket 3: 2 good / 0 bad (omitted)
    val rows = Seq((1L, 0L), (1L, 0L), (1L, 0L), (1L, 1L),
      (2L, 0L), (2L, 1L), (2L, 1L), (2L, 1L), (3L, 0L), (3L, 0L))
    val df = rows.toDF("b", "y")
    val got = Importance.woeIv(df, col("b"), col("y")).collect()
      .map(r => r.getAs[Long]("bucket") -> r).toMap
    assert(got.size === 2 && !got.contains(3L))
    val (gAll, bAll) = (6.0, 4.0)
    def woe(g: Long, b: Long) = math.log((b * gAll) / (g * bAll))
    def iv(g: Long, b: Long) = (b / bAll - g / gAll) * woe(g, b)
    assert(math.abs(got(1L).getAs[Double]("woe") - woe(3, 1)) < 1e-6)
    assert(math.abs(got(2L).getAs[Double]("woe") - woe(1, 3)) < 1e-6)
    assert(math.abs(got(1L).getAs[Double]("iv_term") - iv(3, 1)) < 1e-6)
    assert(math.abs(got(2L).getAs[Double]("iv_term") - iv(1, 3)) < 1e-6)
  }

  // ----------------------------------------------------------- cohenKappa

  test("cohenKappa: perfect agreement 1, known 2x2 case matches") {
    val perfect = (0 until 50).map(i => (i % 2, i % 2)).toDF("a", "b")
    val r0 = Evaluation.cohenKappa(perfect, col("a"), col("b")).head()
    assert(r0.getAs[Double]("kappa") === 1.0)
    assert(r0.getAs[Long]("agree_ppm") === 1000000L)
    // 2x2 cells: (0,0)=20 (0,1)=5 (1,0)=10 (1,1)=15 -> po=.7
    val rows = Seq.fill(20)((0, 0)) ++ Seq.fill(5)((0, 1)) ++
      Seq.fill(10)((1, 0)) ++ Seq.fill(15)((1, 1))
    val r = Evaluation.cohenKappa(rows.toDF("a", "b"), col("a"), col("b")).head()
    val n = 50.0; val po = 35.0 / n
    val pe = (25.0 * 30 + 25.0 * 20) / (n * n)
    assert(math.abs(r.getAs[Double]("kappa") - (po - pe) / (1 - pe)) < 1e-6)
    assert(r.getAs[Long]("n") === 50L && r.getAs[Long]("agree_ppm") === 700000L)
  }

  // ---------------------------------------------------------- kaplanMeier

  test("logRank: identical cohorts give z ~ 0; divergent hazards flag") {
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-02-${day + 1}%02d 09:00:00")
    // symmetric cohorts: every duration appears once per parity;
    // sentinel users (one per parity) extend the corpus to day 20 so
    // the gap>7 churn rule fires for the short-lived users
    val same = ((0 until 20).flatMap { i =>
      val dur = i % 5 + 1
      Seq((i.toLong, ts(0)), (i.toLong, ts(dur)))
    } ++ Seq((100L, ts(0)), (100L, ts(20)), (101L, ts(0)), (101L, ts(20))))
      .toDF("user_id", "ts")
    val r0 = Analytics.logRank(same, "user_id", "ts",
      pmod(col("user_id"), lit(2)) === 1).head()
    assert(math.abs(r0.getAs[Double]("z_logrank")) < 0.6)
    // cohort 1 churns at duration 1-2, cohort 0 survives to 10-12;
    // fully-observed contract so every lifetime is an event
    val diff = (0 until 20).flatMap { i =>
      val dur = if (i % 2 == 1) 1 + i % 2 else 10 + i % 3
      Seq((i.toLong, ts(0)), (i.toLong, ts(dur)))
    }.toDF("user_id", "ts")
    val r1 = Analytics.logRank(diff, "user_id", "ts",
      pmod(col("user_id"), lit(2)) === 1, churnGapDays = -1).head()
    assert(r1.getAs[Double]("z_logrank") > 2.0) // group 1 churns early
    assert(r1.getAs[Long]("n_1") === 10L && r1.getAs[Long]("n_2") === 10L)
  }

  test("coxScoreTest: hand-computed Breslow score, info, one-step beta") {
    import spark.implicits._
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-02-${day + 1}%02d 09:00:00")
    // u1: 2 events, lifetime 1; u2: 3 events, lifetime 1; u3: 1 event, t 0
    val ev = Seq(
      (1L, ts(0)), (1L, ts(1)),
      (2L, ts(0)), (2L, ts(0)), (2L, ts(1)),
      (3L, ts(0))).toDF("user_id", "ts")
    val r = Analytics.coxScoreTest(ev, "user_id", "ts", count(lit(1))).head()
    // grid t=0: risk {u1,u2,u3}: nr=3 rx=6 rxx=14, dt=1 sx=1
    //      t=1: risk {u1,u2}:    nr=2 rx=5 rxx=13, dt=2 sx=5
    // U = (1 - 1*2) + (5 - 2*2.5) = -1
    // I = 1*(14/3 - 4) + 2*(13/2 - 6.25) = 2/3 + 1/2 = 7/6
    assert(r.getAs[Long]("n_users") === 3L && r.getAs[Long]("n_times") === 2L)
    assert(math.abs(r.getAs[Double]("u_score") - (-1.0)) < 1e-9)
    assert(math.abs(r.getAs[Double]("info") - 7.0 / 6.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("beta_1") - (-6.0 / 7.0)) < 1e-6)
    assert(math.abs(r.getAs[Double]("z_score") - (-1.0 / math.sqrt(7.0 / 6.0))) < 1e-6)
    // a covariate with NO variance in any risk set rejects
    intercept[IllegalArgumentException] {
      Analytics.coxScoreTest(
        Seq((1L, ts(0)), (2L, ts(0))).toDF("user_id", "ts"),
        "user_id", "ts", count(lit(1)))
    }
    ()
  }

  test("kaplanMeier: censoring, n_risk suffix sums, ln-survival") {
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-02-${day + 1}%02d 09:00:00")
    // corpus spans day 0..20. users:
    //  u1: days 0..2  (dur 2, last day 2, gap 18 > 7 -> churned)
    //  u2: days 0..2  (dur 2, churned)
    //  u3: days 0..5  (dur 5, gap 15 -> churned)
    //  u4: days 0..20 (dur 20, gap 0 -> censored)
    //  u5: days 3..20 (dur 17, gap 0 -> censored)
    val ev = Seq((1L, 0), (1L, 2), (2L, 0), (2L, 2), (3L, 0), (3L, 5),
      (4L, 0), (4L, 20), (5L, 3), (5L, 20))
      .map { case (u, d) => (u, ts(d)) }.toDF("user_id", "ts")
    val got = Analytics.kaplanMeier(ev, "user_id", "ts").collect()
    // event times: t=2 (d=2, n_risk=5), t=5 (d=1, n_risk=3)
    assert(got.length === 2)
    val t2 = got(0); val t5 = got(1)
    assert(t2.getAs[Long]("t_days") === 2L && t2.getAs[Long]("n_risk") === 5L
      && t2.getAs[Long]("d_churn") === 2L)
    assert(t5.getAs[Long]("t_days") === 5L && t5.getAs[Long]("n_risk") === 3L
      && t5.getAs[Long]("d_churn") === 1L)
    val ln2 = math.log(3.0 / 5)
    val ln5 = ln2 + math.log(2.0 / 3)
    assert(math.abs(t2.getAs[Double]("ln_surv") - ln2) < 1e-6)
    assert(math.abs(t5.getAs[Double]("ln_surv") - ln5) < 1e-6)
  }

  test("kaplanMeier hour unit: same curve on an hour-scaled corpus") {
    // the day-mode corpus above, compressed onto an hour grid: every
    // day becomes an hour, churn gap counts hours — the survival table
    // must be identical row-for-row to the day-mode fixture
    def ts(hour: Int) = java.sql.Timestamp.valueOf(
      f"2024-02-01 ${hour}%02d:30:00")
    val ev = Seq((1L, 0), (1L, 2), (2L, 0), (2L, 2), (3L, 0), (3L, 5),
      (4L, 0), (4L, 20), (5L, 3), (5L, 20))
      .map { case (u, h) => (u, ts(h)) }.toDF("user_id", "ts")
    val got = Analytics.kaplanMeier(ev, "user_id", "ts",
      churnGapDays = 7, timeUnit = "hour").collect()
    assert(got.length === 2)
    assert(got(0).getAs[Long]("t_days") === 2L
      && got(0).getAs[Long]("n_risk") === 5L
      && got(0).getAs[Long]("d_churn") === 2L)
    assert(got(1).getAs[Long]("t_days") === 5L
      && got(1).getAs[Long]("n_risk") === 3L
      && got(1).getAs[Long]("d_churn") === 1L)
    intercept[IllegalArgumentException] {
      Analytics.kaplanMeier(ev, "user_id", "ts", timeUnit = "week")
    }
  }
}
