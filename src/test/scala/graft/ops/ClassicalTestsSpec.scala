package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** G-test, Jarque–Bera, Grubbs, BH/Holm FDR, Nelson–Aalen. */
class ClassicalTestsSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- gTest

  test("gTest: hand-computed 2x2 table") {
    // table: (x,p)=30, (x,q)=10, (y,p)=10, (y,q)=30
    val df = Seq.fill(30)(("x", "p")) ++ Seq.fill(10)(("x", "q")) ++
      Seq.fill(10)(("y", "p")) ++ Seq.fill(30)(("y", "q"))
    val r = Stats.gTest(df.toDF("a", "b"), "a", "b").head()
    val n = 80.0
    val exp = 2.0 * Seq((30.0, 40.0, 40.0), (10.0, 40.0, 40.0),
      (10.0, 40.0, 40.0), (30.0, 40.0, 40.0))
      .map { case (o, ra, ca) => o * math.log(o * n / (ra * ca)) }.sum
    assert(r.getAs[Long]("n") === 80L)
    assert(r.getAs[Long]("dof") === 1L)
    assert(math.abs(r.getAs[Double]("g_stat") - exp) < 1e-5)
  }

  test("gTest: independent margins give ~0") {
    val df = (for (a <- Seq("x", "y"); b <- Seq("p", "q", "r"); _ <- 1 to 20)
      yield (a, b)).toDF("a", "b")
    val r = Stats.gTest(df, "a", "b").head()
    assert(r.getAs[Long]("dof") === 2L)
    assert(math.abs(r.getAs[Double]("g_stat")) < 1e-9)
  }

  // ------------------------------------------------------------ jarqueBera

  test("jarqueBera: symmetric uniform grid has 0 skew, known kurtosis") {
    // x in {-2,-1,0,1,2} equally often: mu2=2, mu4=6.8 -> exk=-1.3
    val df = Seq(-2, -1, 0, 1, 2).flatMap(v => Seq.fill(10)(("g", v.toDouble)))
      .toDF("g", "x")
    val r = Stats.jarqueBera(df, "x", "g", scaleDigits = 0).head()
    assert(r.getAs[Double]("skewness") === 0.0)
    assert(math.abs(r.getAs[Double]("ex_kurtosis") - (6.8 / 4.0 - 3.0)) < 1e-9)
    val exk = 6.8 / 4.0 - 3.0
    assert(math.abs(r.getAs[Double]("jb") - 50.0 / 6.0 * exk * exk / 4.0) < 1e-5)
  }

  test("jarqueBera: skewed group detected, groups independent") {
    val sym = Seq.fill(20)(1.0) ++ Seq.fill(20)(-1.0)
    val skw = Seq.fill(30)(0.0) ++ Seq.fill(3)(50.0)
    val df = (sym.map(("s", _)) ++ skw.map(("k", _))).toDF("g", "x")
    val out = Stats.jarqueBera(df, "x", "g").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("s").getAs[Double]("skewness") === 0.0)
    assert(out("k").getAs[Double]("skewness") > 2.0)
    assert(out("k").getAs[Double]("jb") > out("s").getAs[Double]("jb"))
  }

  // --------------------------------------------------------------- grubbs

  test("grubbs: planted outlier dominates; count of arg-max ties") {
    val base = Seq.fill(50)(10.0) ++ Seq.fill(49)(12.0) :+ 100.0
    val r = Stats.grubbs(base.map(("g", _)).toDF("g", "x"), "x", "g").head()
    val n = 100.0; val mean = (50 * 10.0 + 49 * 12.0 + 100.0) / n
    val varS = (base.map(x => (x - mean) * (x - mean)).sum) / (n - 1)
    val exp = (100.0 - mean) / math.sqrt(varS)
    assert(math.abs(r.getAs[Double]("g_stat") - exp) < 1e-5)
    assert(r.getAs[Long]("n_at_max") === 1L)
    // symmetric two-sided ties both count
    val sym = (Seq.fill(10)(0.0) ++ Seq(5.0, -5.0)).map(("g", _)).toDF("g", "x")
    assert(Stats.grubbs(sym, "x", "g").head().getAs[Long]("n_at_max") === 2L)
  }

  // ----------------------------------------------------------- fdrCorrect

  test("fdrCorrect: hand-computed BH and Holm envelopes, capped at 1") {
    // classic example: p = .01, .02, .03, .04, .9  (m = 5)
    val df = Seq(("a", 0.01), ("b", 0.02), ("c", 0.03), ("d", 0.04),
      ("e", 0.9)).toDF("k", "p")
    val out = Stats.fdrCorrect(df, "k", "p").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // BH: q_i = p_i*m/i = .05,.05,.05,.05,.9 ; suffix-min keeps .05
    assert(out("a") === ((1L, 0.05, 0.05)))
    assert(out("b") === ((2L, 0.05, 0.08)))
    assert(out("c") === ((3L, 0.05, 0.09)))
    assert(out("d") === ((4L, 0.05, 0.09)))   // holm prefix-max carries .09
    assert(out("e") === ((5L, 0.9, 0.9)))
    // BH's suffix-min pulls rank-1 down to min q (= p_max at rank m, so
    // BH never needs the cap); Holm's p*(m-i+1) can exceed 1 and clips
    val cap = Stats.fdrCorrect(
      Seq(("x", 0.6), ("y", 0.9)).toDF("k", "p"), "k", "p").collect()
      .map(r => r.getString(0) -> ((r.getDouble(3), r.getDouble(4)))).toMap
    assert(cap("x") === ((0.9, 1.0)) && cap("y") === ((0.9, 1.0)))
  }

  test("fdrCorrect: monotone in rank and deterministic under ties") {
    val df = (1 to 200).map(i => (s"h$i", (i % 7 + 1) / 10.0)).toDF("k", "p")
    val rows = Stats.fdrCorrect(df, "k", "p").orderBy("rank").collect()
    assert(rows.length === 200)
    // BH adjusted values are non-decreasing in rank
    val bh = rows.map(_.getDouble(3))
    assert(bh.zip(bh.tail).forall { case (x, y) => x <= y })
    val holm = rows.map(_.getDouble(4))
    assert(holm.zip(holm.tail).forall { case (x, y) => x <= y })
    // re-run is identical (total order via key tie-break)
    val again = Stats.fdrCorrect(df, "k", "p").orderBy("rank").collect()
    assert(rows.map(_.toSeq) === again.map(_.toSeq))
  }

  // ----------------------------------------------------------- nelsonAalen

  test("nelsonAalen: hand-computed hazard on a 4-user lifetime grid") {
    // users: lifetimes (first..last day): t=0 (churned), t=1 (churned),
    // t=1 (censored at dmax), t=3 (last at dmax -> censored)
    val rows = Seq(
      (1L, "2024-01-01"), (1L, "2024-01-01"),            // t=0, last=d0
      (2L, "2024-01-01"), (2L, "2024-01-02"),            // t=1, last=d1
      (3L, "2024-01-03"), (3L, "2024-01-04"),            // t=1, last=dmax
      (4L, "2024-01-01"), (4L, "2024-01-04"))            // t=3, last=dmax
      .toDF("u", "d").select(col("u"), to_timestamp(col("d")).as("ts"))
    val out = Analytics.nelsonAalen(rows, "u", "ts", churnGapDays = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    // grid: t=0 (d=1,m=1), t=1 (d=1,m=2), t=3 (d=0,m=1)
    // n_risk: t=0 -> 4, t=1 -> 3; hazard: 1/4 then 1/4+1/3
    assert(out(0L) === ((4L, 1L, 0.25, 0.0625)))
    assert(out(1L)._1 === 3L)
    assert(math.abs(out(1L)._3 - (0.25 + 1.0 / 3)) < 1e-6)
    assert(math.abs(out(1L)._4 - (0.0625 + 1.0 / 9)) < 1e-6)
    assert(!out.contains(3L))  // censored-only durations are filtered
  }

  test("nelsonAalen: shares kaplanMeier's grid and risk sets") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val na = Analytics.nelsonAalen(events, "user_id", "ts",
      churnGapDays = 24, timeUnit = "hour")
      .select("t_days", "n_risk", "d_churn")
    val km = Analytics.kaplanMeier(events, "user_id", "ts",
      churnGapDays = 24, timeUnit = "hour")
      .select("t_days", "n_risk", "d_churn")
    // NA keeps n_risk == d rows that KM must drop (log(0)); on this
    // data both grids agree after applying KM's extra filter
    val naF = na.filter(col("n_risk") > col("d_churn"))
    assert(naF.exceptAll(km).count() === 0 && km.exceptAll(naF).count() === 0)
    assert(na.count() >= km.count())
  }
}
