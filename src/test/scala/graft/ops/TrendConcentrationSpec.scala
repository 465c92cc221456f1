package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Theil-Sen, HHI, Jensen-Shannon divergence, Hill tail index. */
class TrendConcentrationSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int) =
    java.sql.Timestamp.valueOf(f"2024-03-${day + 1}%02d 12:00:00")

  // ------------------------------------------------------------- theilSen

  test("theilSen: exact slope on linear data, robust to one outlier") {
    val lin = (0 until 10).map(i => (ts(i), 5.0 + 2.5 * i)).toDF("d", "x")
    val r = Analytics.theilSen(lin, "d", "x").head()
    assert(r.getAs[Long]("n_days") === 10L && r.getAs[Long]("n_pairs") === 45L)
    assert(r.getAs[Double]("slope_per_day") === 2.5)
    // one wild outlier day: median slope stays 2.5 (OLS would not)
    val out = ((0 until 10).map(i => (ts(i), 5.0 + 2.5 * i)) :+
      (ts(10), 1000.0)).toDF("d", "x")
    val r2 = Analytics.theilSen(out, "d", "x").head()
    assert(r2.getAs[Double]("slope_per_day") === 2.5)
  }

  // ------------------------------------------------------------------ hhi

  test("hhi: monopoly is 1e6 ppm, equal split is 1e6/n") {
    val rows = Seq(("m", 1L, 50.0), ("m", 1L, 30.0),
      ("e", 1L, 10.0), ("e", 2L, 10.0), ("e", 3L, 10.0), ("e", 4L, 10.0))
      .toDF("g", "ent", "v")
    val got = Analytics.hhi(rows, "g", "ent", "v").collect()
      .map(r => r.getAs[String]("g") -> r).toMap
    assert(got("m").getAs[Long]("hhi_ppm") === 1000000L)
    assert(got("m").getAs[Long]("top_share_ppm") === 1000000L)
    assert(got("e").getAs[Long]("hhi_ppm") === 250000L)
    assert(got("e").getAs[Long]("top_share_ppm") === 250000L)
    assert(got("e").getAs[Long]("n_entities") === 4L)
  }

  // --------------------------------------------------------- jsDivergence

  test("jsDivergence: identical slices 0; disjoint vocab near 1 bit") {
    val same = Seq(("a", "x y z"), ("b", "x y z")).toDF("s", "t")
    val r0 = CorpusStats.jsDivergence(same, "s", "t", "a", "b").head()
    assert(r0.getAs[Double]("jsd_bits") === 0.0)
    // heavy disjoint vocabularies: JSD approaches 1 bit (smoothing
    // over 1024 buckets keeps it strictly below)
    // 10k tokens per side so the +1-per-bucket smoothing mass (1024)
    // no longer dominates the signal
    val aTxt = Seq.fill(25)((1 to 400).map(i => s"aa$i").mkString(" ")).mkString(" ")
    val bTxt = Seq.fill(25)((1 to 400).map(i => s"bb$i").mkString(" ")).mkString(" ")
    val dis = Seq(("a", aTxt), ("b", bTxt)).toDF("s", "t")
    val r1 = CorpusStats.jsDivergence(dis, "s", "t", "a", "b").head()
    assert(r1.getAs[Double]("jsd_bits") > 0.5 && r1.getAs[Double]("jsd_bits") <= 1.0)
    assert(r1.getAs[Long]("n_a") === 10000L && r1.getAs[Long]("n_b") === 10000L)
  }

  // ---------------------------------------------------- conformalInterval

  test("conformalInterval: exact line gives zero band; outliers widen it") {
    val clean = (1 to 100).map(i => (i.toDouble, 5.0 + 2.0 * i)).toDF("x", "y")
    val r0 = Analytics.conformalInterval(clean, "x", "y").head()
    assert(r0.getAs[Double]("slope") === 2.0)
    assert(r0.getAs[Double]("q_resid_cents") === 0.0)
    // 10% of points pushed off the line by ~50.00: the 90% band stays
    // small, a 95% band must cover the outliers
    val noisy = (1 to 100).map { i =>
      val bump = if (i % 10 == 0) 50.0 else 0.0
      (i.toDouble, 5.0 + 2.0 * i + bump)
    }.toDF("x", "y")
    val r90 = Analytics.conformalInterval(noisy, "x", "y").head()
    val r95 = Analytics.conformalInterval(noisy, "x", "y",
      permille = 950).head()
    assert(r90.getAs[Double]("q_resid_cents") < 2000.0)
    assert(r95.getAs[Double]("q_resid_cents") > 3000.0)
  }

  // ------------------------------------------------------------ quadTrend

  test("quadTrend: recovers an exact planted parabola") {
    // weekly values y = 100 + 5x + 2x^2 planted as one event per week
    def ts(week: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 1, 12, 0).plusDays(week * 7L))
    val rows = (0 until 12).map { x =>
      (ts(x), 100.0 + 5.0 * x + 2.0 * x * x)
    }.toDF("d", "v")
    val r = Analytics.quadTrend(rows, "d", "v").head()
    assert(r.getAs[Long]("n_weeks") === 12L)
    assert(math.abs(r.getAs[Double]("c0") - 100.0) < 1e-4)
    assert(math.abs(r.getAs[Double]("c1") - 5.0) < 1e-4)
    assert(math.abs(r.getAs[Double]("c2") - 2.0) < 1e-4)
  }

  // -------------------------------------------------------- countMinAudit

  test("countMinAudit: never undercounts; exact on a sparse stream") {
    // few distinct tokens << width -> no collisions -> estimates exact
    val docs = Seq.fill(30)("alpha beta beta gamma").map(Tuple1(_)).toDF("t")
    val got = Frequent.countMinAudit(docs, "t", depth = 3, width = 256,
      topK = 3).collect()
    got.foreach { r =>
      assert(r.getAs[Long]("overcount") >= 0L) // CMS invariant
      assert(r.getAs[Long]("cms_estimate") === r.getAs[Long]("exact_count"))
    }
    val byTok = got.map(r => r.getAs[String]("token") ->
      r.getAs[Long]("exact_count")).toMap
    assert(byTok("beta") === 60L && byTok("alpha") === 30L)
    // a tiny width forces collisions: estimates still never undercount
    val tight = Frequent.countMinAudit(docs, "t", depth = 2, width = 2,
      topK = 3).collect()
    tight.foreach(r => assert(
      r.getAs[Long]("cms_estimate") >= r.getAs[Long]("exact_count")))
  }

  // ------------------------------------------------------------- hillTail

  test("hillTail: matches the direct estimator on a planted tail") {
    // x_i = floor(1000 / i^0.5): a Pareto-ish tail with alpha ~ 2
    val xs = (1 to 300).map(i => math.floor(1000.0 / math.sqrt(i)).toLong)
    val df = xs.map(Tuple1(_)).toDF("x")
    val r = CorpusStats.hillTail(df, "x", k = 50).head()
    val sorted = xs.sortBy(-_)
    val xt = sorted(50)
    val direct = 50.0 / sorted.take(50).map(x => math.log(x.toDouble / xt)).sum
    assert(r.getAs[Long]("x_tail") === xt)
    assert(math.abs(r.getAs[Double]("hill_alpha") - direct) < 1e-6)
    intercept[IllegalArgumentException] {
      CorpusStats.hillTail(df.limit(10), "x", k = 50)
    }
  }

  test("hllSketch: estimate within HLL error bounds; duplicate- and partition-invariant") {
    import spark.implicits._
    val n = 20000
    val df = (1 to n).map(i => s"user_$i").toDF("u")
    val r = Frequent.hllSketch(df, "u", p = 10).head()
    val est = r.getAs[Double]("est_raw")
    // standard error 1.04/sqrt(1024) ~ 3.25%; allow 5 sigma
    assert(math.abs(est - n) / n < 0.17, s"est $est vs $n")
    assert(r.getAs[Int]("m") === 1024)
    // duplicates cannot move a max-register sketch
    val dup = Frequent.hllSketch(df.unionAll(df).unionAll(df), "u", p = 10).head()
    assert(dup.getAs[Long]("s_scaled") === r.getAs[Long]("s_scaled"))
    assert(dup.getAs[Double]("est_raw") === est)
    // nor can partitioning (element-wise max merges commute)
    val rep = Frequent.hllSketch(df.repartition(17), "u", p = 10).head()
    assert(rep.getAs[Long]("s_scaled") === r.getAs[Long]("s_scaled"))
    // far above 2.5m the raw estimator IS the estimate
    assert(r.getAs[Double]("est") === est)
    // small range: linear counting kicks in and lands near truth
    val small = Frequent.hllSketch(
      (1 to 200).map(i => s"u$i").toDF("u"), "u", p = 10).head()
    val se = small.getAs[Double]("est")
    assert(math.abs(se - 200) / 200 < 0.15, s"lc est $se")
    assert(se != small.getAs[Double]("est_raw"))
    // p out of the single-alpha regime rejects
    intercept[IllegalArgumentException] {
      Frequent.hllSketch(df, "u", p = 5)
    }
    // empty input: the empty sketch (all-zero registers -> linear
    // counting -> est 0), not an empty-collection throw (round-15 fix)
    val empty = Frequent.hllSketch(df.filter(lit(false)), "u", p = 10).head()
    assert(empty.getAs[Long]("v_zero") === 1024L)
    assert(empty.getAs[Double]("est") === 0.0)
    ()
  }

  test("hllSketchBy: per-group registers match the per-group corpus " +
    "sketch; merge == union; partition-invariant") {
    import spark.implicits._
    val df = (1 to 12000).map { i =>
      (s"g${i % 3}", s"user_${i % (2000 * (i % 3 + 1))}")
    }.toDF("g", "u")
    val by = Frequent.hllSketchBy(df, Seq("g"), "u", p = 10).collect()
    assert(by.length === 3)
    // each group's row equals the corpus-global sketch of that group's
    // rows alone (same registers -> same s_scaled/v_zero/estimates)
    for (g <- Seq("g0", "g1", "g2")) {
      val solo = Frequent.hllSketch(df.filter(col("g") === g), "u", p = 10).head()
      val row = by.find(_.getString(0) == g).get
      assert(row.getAs[Long]("s_scaled") === solo.getAs[Long]("s_scaled"), g)
      assert(row.getAs[Long]("v_zero") === solo.getAs[Long]("v_zero"), g)
      assert(row.getAs[Double]("est") === solo.getAs[Double]("est"), g)
    }
    // partition invariance (max-fold commutes)
    val rep = Frequent.hllSketchBy(df.repartition(17), Seq("g"), "u", p = 10)
      .collect()
    assert(rep.map(r => (r.getString(0), r.getAs[Long]("s_scaled"))).toSet ===
      by.map(r => (r.getString(0), r.getAs[Long]("s_scaled"))).toSet)
    // fold == union: register merge of two halves == one-shot sketch,
    // and summarize(registers) == hllSketchBy
    val (h1, h2) = (df.filter(col("u").substr(6, 1).isin("0", "1", "2", "3")),
      df.filter(!col("u").substr(6, 1).isin("0", "1", "2", "3")))
    val merged = Frequent.summarizeHllRegisters(
      Frequent.mergeHllRegisters(
        Frequent.hllRegistersBy(h1, Seq("g"), "u", p = 10),
        Frequent.hllRegistersBy(h2, Seq("g"), "u", p = 10),
        Seq("g"), p = 10),
      Seq("g"), p = 10).collect()
    assert(merged.map(r => (r.getString(0), r.getAs[Long]("s_scaled"),
        r.getAs[Double]("est"))).toSeq.sortBy(_._1) ===
      by.map(r => (r.getString(0), r.getAs[Long]("s_scaled"),
        r.getAs[Double]("est"))).toSeq.sortBy(_._1))
    // merge with a key absent on one side == that side's empty sketch
    val extra = Seq(("g9", "only_user")).toDF("g", "u")
    val mergedDisjoint = Frequent.summarizeHllRegisters(
      Frequent.mergeHllRegisters(
        Frequent.hllRegistersBy(df, Seq("g"), "u", p = 10),
        Frequent.hllRegistersBy(extra, Seq("g"), "u", p = 10),
        Seq("g"), p = 10),
      Seq("g"), p = 10).collect()
    assert(mergedDisjoint.length === 4)
    val g9 = mergedDisjoint.find(_.getString(0) == "g9").get
    assert(g9.getAs[Long]("v_zero") === 1023L)
    ()
  }
}
