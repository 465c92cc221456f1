package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Spearman, Kendall tau-b, Welch's t, Benford, CUPED. */
class StatsFamilySpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------- spearman

  test("spearman: monotone data gives 1, reversal gives -1") {
    val up = (1 to 50).map(i => (i.toDouble, (i * i).toDouble)).toDF("a", "b")
    assert(Stats.spearman(up, "a", "b").head().getAs[Double]("rho") === 1.0)
    val down = (1 to 50).map(i => (i.toDouble, (51 - i).toDouble)).toDF("a", "b")
    assert(Stats.spearman(down, "a", "b").head().getAs[Double]("rho") === -1.0)
  }

  test("spearman: tie midranks match the closed-form computation") {
    // a has ties; expected value computed directly from average ranks
    val rows = Seq((1.0, 2.0), (1.0, 1.0), (2.0, 4.0), (3.0, 3.0), (3.0, 5.0))
    val df = rows.toDF("a", "b")
    def ranks(xs: Seq[Double]): Seq[Double] = {
      val sorted = xs.sorted
      xs.map { v =>
        val lo = sorted.indexOf(v) + 1
        val hi = sorted.lastIndexOf(v) + 1
        (lo + hi) / 2.0
      }
    }
    val ra = ranks(rows.map(_._1)); val rb = ranks(rows.map(_._2))
    val n = rows.size
    val mx = ra.sum / n; val my = rb.sum / n
    val num = ra.zip(rb).map { case (x, y) => (x - mx) * (y - my) }.sum
    val den = math.sqrt(ra.map(x => (x - mx) * (x - mx)).sum) *
      math.sqrt(rb.map(y => (y - my) * (y - my)).sum)
    val expected = num / den
    val got = Stats.spearman(df, "a", "b").head().getAs[Double]("rho")
    assert(math.abs(got - expected) < 1e-6)
    assert(Stats.spearman(df, "a", "b").head().getAs[Long]("n") === 5L)
  }

  // ----------------------------------------------------------- kendallTau

  test("kendallTau: perfect concordance 1, discordance -1, ties shrink") {
    val up = (1 to 30).map(i => (i.toDouble, i.toDouble)).toDF("a", "b")
    val r = Stats.kendallTau(up, "a", "b", scaleDigits = 0).head()
    assert(r.getAs[Double]("tau_b") === 1.0)
    assert(r.getAs[Long]("nc") === 30L * 29 / 2 && r.getAs[Long]("nd") === 0L)
    val down = (1 to 30).map(i => (i.toDouble, (31 - i).toDouble)).toDF("a", "b")
    assert(Stats.kendallTau(down, "a", "b", scaleDigits = 0)
      .head().getAs[Double]("tau_b") === -1.0)
  }

  test("kendallTau: tau-b tie correction matches hand computation") {
    // pairs: (1,1),(1,2),(2,1),(2,2),(2,3) — nc, nd, ties by enumeration
    val rows = Seq((1.0, 1.0), (1.0, 2.0), (2.0, 1.0), (2.0, 2.0), (2.0, 3.0))
    var nc = 0L; var nd = 0L; var tx = 0L; var ty = 0L
    for (i <- rows.indices; j <- i + 1 until rows.size) {
      val (x1, y1) = rows(i); val (x2, y2) = rows(j)
      if (x1 != x2 && y1 != y2) {
        if ((x1 < x2) == (y1 < y2)) nc += 1 else nd += 1
      } else if (x1 == x2 && y1 != y2) tx += 1
      else if (y1 == y2 && x1 != x2) ty += 1
      else { tx += 1; ty += 1 }
    }
    val n0 = rows.size.toLong * (rows.size - 1) / 2
    // n1/n2 count ties in x / y regardless of the other column
    val n1 = rows.groupBy(_._1).values.map(g => g.size.toLong * (g.size - 1) / 2).sum
    val n2 = rows.groupBy(_._2).values.map(g => g.size.toLong * (g.size - 1) / 2).sum
    val expected = (nc - nd).toDouble / math.sqrt((n0 - n1).toDouble * (n0 - n2))
    val r = Stats.kendallTau(rows.toDF("a", "b"), "a", "b", scaleDigits = 0).head()
    assert(r.getAs[Long]("nc") === nc && r.getAs[Long]("nd") === nd)
    assert(math.abs(r.getAs[Double]("tau_b") - expected) < 1e-6)
  }

  test("kendallTau: cell gate rejects unquantized high cardinality") {
    val wide = (1 to 500).map(i => (i * 1.0001, i * 2.0003)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      Stats.kendallTau(wide, "a", "b", maxCells = 100).head()
    }
  }

  // ----------------------------------------------------------- welchTTest

  test("welchTTest: identical groups give t=0; known case matches") {
    val same = ((1 to 40).map(i => ("a", i.toDouble)) ++
      (1 to 40).map(i => ("b", i.toDouble))).toDF("g", "x")
    val r0 = Stats.welchTTest(same, "x", "g", "a", "b").head()
    assert(r0.getAs[Double]("t_stat") === 0.0)
    // crafted unequal-variance case, expected from the same closed form
    val xa = Seq(1.0, 2.0, 3.0, 4.0, 5.0)
    val xb = Seq(2.0, 4.0, 6.0, 8.0, 10.0, 12.0)
    val df = (xa.map(("a", _)) ++ xb.map(("b", _))).toDF("g", "x")
    def mv(xs: Seq[Double]) = {
      val m = xs.sum / xs.size
      (m, xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1))
    }
    val (ma, va) = mv(xa); val (mb, vb) = mv(xb)
    val sa = va / xa.size; val sb = vb / xb.size
    val tExp = (ma - mb) / math.sqrt(sa + sb)
    val dfExp = (sa + sb) * (sa + sb) /
      (sa * sa / (xa.size - 1) + sb * sb / (xb.size - 1))
    val r = Stats.welchTTest(df, "x", "g", "a", "b").head()
    assert(math.abs(r.getAs[Double]("t_stat") - tExp) < 1e-5)
    assert(math.abs(r.getAs[Double]("df_welch") - dfExp) < 1e-4)
    assert(r.getAs[Long]("n_a") === 5L && r.getAs[Long]("n_b") === 6L)
  }

  // --------------------------------------------------------------- anovaF

  test("anovaF: matches the direct computation on separated groups") {
    val xa = Seq(1.0, 2.0, 3.0, 4.0)
    val xb = Seq(6.0, 7.0, 8.0, 9.0)
    val xc = Seq(11.0, 12.0, 13.0, 14.0)
    val df = (xa.map(("a", _)) ++ xb.map(("b", _)) ++ xc.map(("c", _)))
      .toDF("g", "x")
    val all = xa ++ xb ++ xc
    val gm = all.sum / all.size
    def sm(xs: Seq[Double]) = xs.sum / xs.size
    val ssb = Seq(xa, xb, xc).map(g => g.size * math.pow(sm(g) - gm, 2)).sum
    val ssw = Seq(xa, xb, xc).map(g => g.map(x => math.pow(x - sm(g), 2)).sum).sum
    val fExp = (ssb / 2) / (ssw / (all.size - 3))
    val r = Stats.anovaF(df, "g", "x").head()
    assert(r.getAs[Long]("k_groups") === 3L && r.getAs[Long]("n") === 12L)
    assert(math.abs(r.getAs[Double]("f_stat") - fExp) < 1e-4)
    assert(math.abs(r.getAs[Double]("ln_ssb") - math.log(ssb)) < 1e-5)
    assert(math.abs(r.getAs[Double]("ln_ssw") - math.log(ssw)) < 1e-5)
  }

  // -------------------------------------------------------- kruskalWallis

  test("kruskalWallis: matches the direct tie-corrected H") {
    val rows = Seq(("a", 1.0), ("a", 2.0), ("a", 2.0), ("b", 3.0),
      ("b", 4.0), ("c", 5.0), ("c", 6.0), ("c", 2.0))
    val df = rows.toDF("g", "v")
    // direct: midranks over the pooled sample
    val sorted = rows.map(_._2).sorted
    def midrank(v: Double): Double = {
      val lo = sorted.indexOf(v) + 1; val hi = sorted.lastIndexOf(v) + 1
      (lo + hi) / 2.0
    }
    val byG = rows.groupBy(_._1).view.mapValues(_.map(x => midrank(x._2)))
    val n = rows.size.toDouble
    val sumR = byG.values.map(rs => math.pow(rs.sum, 2) / rs.size).sum
    val h0 = 12.0 / (n * (n + 1)) * sumR - 3.0 * (n + 1)
    val ties = rows.map(_._2).groupBy(identity).values
      .map(g => math.pow(g.size, 3) - g.size).sum
    val hExp = h0 / (1.0 - ties / (n * n * n - n))
    val r = Stats.kruskalWallis(df, "g", "v").head()
    assert(r.getAs[Long]("k_groups") === 3L && r.getAs[Long]("n") === 8L)
    assert(math.abs(r.getAs[Double]("h_stat") - hExp) < 1e-5)
  }

  // -------------------------------------------------------------- benford

  test("benford: digits come from the cent string; all nine rows emitted") {
    // values 1.00, 2.00, ... 9.00, 19.00 → digits 1..9 once, 1 twice
    val vals = (1 to 9).map(_.toDouble) :+ 19.0
    val df = vals.map(Tuple1(_)).toDF("x")
    val rows = Stats.benford(df, "x").collect()
    assert(rows.length === 9)
    val byDigit = rows.map(r => r.getAs[Int]("digit") -> r.getAs[Long]("n_obs")).toMap
    assert(byDigit(1) === 2L) // 1.00 → "100", 19.00 → "1900"
    assert((2 to 9).forall(d => byDigit(d) === 1L))
    // chi term for digit 1: (2 - 10*p)² / (10*p)
    val p = Stats.benfordPpt.head._2
    val exp1 = (2.0 - 10 * p) * (2.0 - 10 * p) / (10 * p)
    val got1 = rows.find(_.getAs[Int]("digit") == 1).get.getAs[Double]("chi_term")
    assert(math.abs(got1 - exp1) < 1e-6)
    // zero-count digits still get a row with the full expected-mass term
    val none = Seq(Tuple1(1.0)).toDF("x")
    val z = Stats.benford(none, "x").collect()
    assert(z.count(_.getAs[Long]("n_obs") == 0L) === 8)
  }

  // ------------------------------------------------------------------ srm

  test("srmCheck: balanced split near zero; skew flags strongly") {
    val balanced = (0 until 1000).map(i => Tuple1((i % 2 == 0))).toDF("a")
    val r0 = Stats.srmCheck(balanced, col("a").cast("long")).head()
    assert(math.abs(r0.getAs[Double]("z_srm")) < 0.1)
    val skew = (0 until 1000).map(i => Tuple1(i % 10 != 0)).toDF("a")
    val r1 = Stats.srmCheck(skew, col("a").cast("long")).head()
    assert(r1.getAs[Long]("n_a") === 900L)
    // z = (900 - 500)/sqrt(250) = 25.3
    assert(math.abs(r1.getAs[Double]("z_srm") - 400.0 / math.sqrt(250)) < 1e-4)
  }

  // ------------------------------------------------------------------ ipw

  test("ipwAte: uninformative propensity collapses to plain means") {
    // treatment independent of x -> the lasso shrinks b to 0, p is the
    // constant base rate, and the Hajek means equal the raw group means
    val dir = "/root/testdata/sf0.001"
    val r = graft.queries.PathQueries.ipwAte(spark, dir).head()
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val raw = li.groupBy((col("l_returnflag") === "R").cast("int").as("t"))
      .agg(avg(col("l_extendedprice")).as("m"), count(lit(1)).as("n"))
      .collect().map(x => x.getAs[Int]("t") -> x).toMap
    assert(r.getAs[Long]("n_treated") === raw(1).getAs[Long]("n"))
    assert(r.getAs[Long]("n_control") === raw(0).getAs[Long]("n"))
    // weights reweight within groups; with a nearly-flat propensity the
    // IPW means sit close to the raw means (identical if b == 0)
    assert(math.abs(r.getAs[Double]("mean_treated") - raw(1).getAs[Double]("m"))
      < 0.05 * math.abs(raw(1).getAs[Double]("m")))
    assert(math.abs(r.getAs[Double]("ate") -
      (r.getAs[Double]("mean_treated") - r.getAs[Double]("mean_control"))) < 2.1e-6) // two independent 6dp roundings
  }

  // ----------------------------------------------------------- diffInDiff

  test("diffInDiff: recovers a planted treatment effect over a trend") {
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 10:00:00")
    // shared trend: +4 post; treated adds +7 true effect post
    val ev = (0 until 10).flatMap { i =>
      Seq((1L, ts(2), 10.0 + i), (1L, ts(20), 21.0 + i),  // treated: 10->21 (+4 trend +7)
        (2L, ts(2), 10.0 + i), (2L, ts(20), 14.0 + i))    // control: 10->14 (+4 trend)
    }.toDF("user_id", "ts", "value")
    val r = Stats.diffInDiff(ev, "ts", "value",
      pmod(col("user_id"), lit(2)) === 1).head()
    assert(r.getAs[Double]("did") === 7.0)
    assert(r.getAs[Long]("n_t") === 20L && r.getAs[Long]("n_c") === 20L)
    assert(r.getAs[Double]("m_t_pre") === 14.5 && r.getAs[Double]("m_c_post") === 18.5)
  }

  // ---------------------------------------------------------------- cuped

  test("cuped: adjustment recovers the known theta and shrinks variance") {
    // post = 2*pre + variant effect; theta should be ~2, and the
    // adjusted means should preserve the true lift
    // variant flips per DECADE of user ids so it is independent of
    // pre = u%10+1 (a %2 variant would correlate with pre's parity and
    // bias theta away from 2)
    val events = (0 until 200).flatMap { u =>
      val pre = (u % 10 + 1).toDouble
      val post = 2.0 * pre + ((u / 10) % 2) * 5.0
      Seq((u.toLong, java.sql.Timestamp.valueOf("2024-01-05 00:00:00"), pre),
        (u.toLong, java.sql.Timestamp.valueOf("2024-01-25 00:00:00"), post))
    }.toDF("user_id", "ts", "value")
    val r = Stats.cuped(events, "user_id", "ts", "value",
      expr("(user_id div 10) % 2").cast("long")).collect()
      .map(x => x.getAs[Long]("variant") -> x).toMap
    assert(r(0L).getAs[Long]("n_users") === 100L)
    assert(math.abs(r(0L).getAs[Double]("theta") - 2.0) < 1e-6)
    // both variants share identical pre distributions → adjustment
    // leaves the true lift of 5.0 intact
    val lift = r(1L).getAs[Double]("mean_adj") - r(0L).getAs[Double]("mean_adj")
    assert(math.abs(lift - 5.0) < 1e-6)
    // variant means: post means differ by raw lift too (balanced pre)
    val rawLift = r(1L).getAs[Double]("mean_post") - r(0L).getAs[Double]("mean_post")
    assert(math.abs(rawLift - 5.0) < 1e-6)
  }

  test("cvmStatistic: hand case, zero on identical samples, tie handling") {
    // a = {1,2}, b = {3,4}: gaps (.5, 1, .5, 0) over 4 pooled points ->
    // T = (2*2/16) * (0.25 + 1 + 0.25) = 0.375
    val a = Seq(1.0, 2.0).toDF("v")
    val b = Seq(3.0, 4.0).toDF("v")
    val r = Drift.cvmStatistic(a, b, "v").head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(math.abs(r.getDouble(2) - 0.375) < 1e-9, r.getDouble(2).toString)
    // identical samples (with ties): every prefix gap is 0
    val c = Seq(1.0, 1.0, 5.0).toDF("v")
    val r0 = Drift.cvmStatistic(c, c, "v").head()
    assert(r0.getDouble(2) == 0.0)
  }

  test("degenerate inputs fail with diagnostics, not NaN/Infinity conversions") {
    // kendallTau: one distinct x cell — clean require, not an NPE from
    // null join sums or a NaN tau from the zero denominator
    val oneX = Seq((1.0, 1.0), (1.0, 2.0), (1.0, 3.0)).toDF("a", "b")
    val eK = intercept[IllegalArgumentException] {
      Stats.kendallTau(oneX, "a", "b")
    }
    assert(eK.getMessage.contains("constant margin"), eK.getMessage)
    // anovaF: identical group means -> ln_ssb undefined
    val flat = Seq(("g1", 1.0), ("g1", 3.0), ("g2", 1.0), ("g2", 3.0))
      .toDF("g", "v")
    val eA = intercept[IllegalArgumentException] { Stats.anovaF(flat, "g", "v") }
    assert(eA.getMessage.contains("ln_ssb"), eA.getMessage)
    // hillTail: constant column -> clean require, not BigDecimal(Inf)
    val const = Seq.fill(6)(7L).toDF("x")
    val eH = intercept[IllegalArgumentException] {
      CorpusStats.hillTail(const, "x", k = 3)
    }
    assert(eH.getMessage.contains("degenerate tail"), eH.getMessage)
    // changepointSplit: flat series -> clean require, not BigDecimal(-Inf)
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-03-${day + 1}%02d 09:00:00")
    val flatSeries = (0 until 28).map(d => (ts(d), 5.0)).toDF("ts", "v")
    val eC = intercept[IllegalArgumentException] {
      Drift.changepointSplit(flatSeries, "ts", "v").collect()
    }
    assert(eC.getMessage.contains("flat series"), eC.getMessage)
  }

  test("cliffsDelta: full dominance ±1, identical samples 0, tie contribution") {
    val hi = Seq(2.0, 3.0).toDF("v"); val lo = Seq(1.0).toDF("v")
    assert(Stats.cliffsDelta(hi, lo, "v").head()
      .getAs[Double]("cliffs_delta") === 1.0)
    assert(Stats.cliffsDelta(lo, hi, "v").head()
      .getAs[Double]("cliffs_delta") === -1.0)
    val same = Seq(1.0, 5.0).toDF("v")
    assert(Stats.cliffsDelta(same, same, "v").head()
      .getAs[Double]("cliffs_delta") === 0.0)
    // a={1,2}, b={1}: pairs (1,1) tie → 0, (2,1) win → +1; delta = 1/2
    val a = Seq(1.0, 2.0).toDF("v"); val b = Seq(1.0).toDF("v")
    assert(Stats.cliffsDelta(a, b, "v").head()
      .getAs[Double]("cliffs_delta") === 0.5)
  }

  test("effectSize: hand case for pooled d and Hedges correction") {
    // A={1,2,3}, B={2,3,4}: means 2 and 3, both sample variances 1 →
    // pooled sd 1, d = −1, g = d·(1 − 3/(4·6 − 9)) = −0.8
    val df = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0),
      ("B", 2.0), ("B", 3.0), ("B", 4.0)).toDF("g", "v")
    val r = Stats.effectSize(df, "v", "g", "A", "B").head()
    assert(r.getAs[Double]("cohens_d") === -1.0)
    assert(r.getAs[Double]("hedges_g") === -0.8)
    assert(r.getAs[Long]("n_a") === 3L && r.getAs[Long]("n_b") === 3L)
  }

  test("leveneTest: hand case, and clean failure on zero within-spread") {
    // g1={0,1,4} med 1 → z={1,0,3}; g2={0,2,8} med 2 → z={2,0,6}
    // between = 8/3, within = 70/3, W = 4·(8/3)/(70/3) = 16/35
    val df = Seq(("g1", 0.0), ("g1", 1.0), ("g1", 4.0),
      ("g2", 0.0), ("g2", 2.0), ("g2", 8.0)).toDF("g", "v")
    val r = Stats.leveneTest(df, "g", "v").head()
    assert(r.getAs[Long]("k_groups") === 2L && r.getAs[Long]("n") === 6L)
    assert(math.abs(r.getAs[Double]("w_stat") - 16.0 / 35.0) < 1e-6)
    // every |x − med| identical within groups → within = 0 → require
    val degen = Seq(("g1", 0.0), ("g1", 2.0), ("g2", 0.0), ("g2", 4.0))
      .toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      Stats.leveneTest(degen, "g", "v")
    }
    assert(e.getMessage.contains("within-group"), e.getMessage)
  }

  test("trimmedMean: drops exactly floor(n·frac) per tail; ties are safe") {
    val df = (1 to 10).map(i => ("g", i.toDouble)).toDF("g", "v")
    val r = Stats.trimmedMean(df, "g", "v", trimFrac = 0.1).head()
    assert(r.getAs[Long]("n") === 10L && r.getAs[Long]("kept") === 8L)
    assert(r.getAs[Double]("trimmed_mean") === 5.5) // mean of 2..9
    // all-equal values: any trimmed subset has the same mean
    val ties = Seq.fill(10)(("g", 3.0)).toDF("g", "v")
    val rt = Stats.trimmedMean(ties, "g", "v", trimFrac = 0.2).head()
    assert(rt.getAs[Double]("trimmed_mean") === 3.0 &&
      rt.getAs[Long]("kept") === 6L)
  }

  test("mcnemar: discordant cells only; concordant-only input fails cleanly") {
    val df = Seq(
      ("k1", 1, 0), ("k2", 1, 0), ("k3", 1, 0), // a-only ×3
      ("k4", 0, 1),                             // b-only ×1
      ("k5", 1, 1), ("k6", 1, 1), ("k7", 0, 0)) // concordant
      .toDF("k", "a", "b")
    val r = Stats.mcnemar(df, "k", col("a") === 1, col("b") === 1).head()
    assert(r.getLong(0) === 7L && r.getLong(1) === 3L && r.getLong(2) === 1L)
    assert(r.getAs[Double]("chi2") === 1.0) // (3−1)²/4
    val conc = Seq(("k1", 1, 1), ("k2", 0, 0)).toDF("k", "a", "b")
    val e = intercept[IllegalArgumentException] {
      Stats.mcnemar(conc, "k", col("a") === 1, col("b") === 1)
    }
    assert(e.getMessage.contains("discordant"), e.getMessage)
  }

  test("runsTest: alternating series runs hot; blocky series runs cold") {
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-03-${day}%02d 09:00:00")
    // {1,5}×3: a=b=3, runs=6, mu=4, sigma²=1.2 → z = 2/√1.2
    val alt = (1 to 6).map(d => (ts(d), if (d % 2 == 0) 5.0 else 1.0))
      .toDF("ts", "v")
    val r = Drift.runsTest(alt, "ts", "v").head()
    assert(r.getLong(0) === 3L && r.getLong(1) === 3L && r.getLong(2) === 6L)
    assert(math.abs(r.getAs[Double]("z") - 2.0 / math.sqrt(1.2)) < 1e-6)
    // low block then high block: exactly 2 runs → strongly negative z
    val block = (1 to 10).map(d => (ts(d), if (d <= 5) 1.0 else 5.0))
      .toDF("ts", "v")
    val rb = Drift.runsTest(block, "ts", "v").head()
    assert(rb.getLong(2) === 2L && rb.getAs[Double]("z") < -2.0)
  }

  test("mannKendall: monotone series, tie correction, flat-series require") {
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-03-${day}%02d 09:00:00")
    val up = (1 to 6).map(d => (ts(d), d.toDouble)).toDF("ts", "v")
    val r = Drift.mannKendall(up, "ts", "v").head()
    assert(r.getLong(1) === 15L) // all C(6,2) pairs concordant
    assert(r.getLong(2) === 6L * 5 * 17) // no ties
    assert(math.abs(r.getAs[Double]("z") - 14.0 / math.sqrt(510.0 / 18.0)) < 1e-6)
    // ties shrink the variance term: {1,1,2,3}: tie group t=2 → 18Var
    // = 4·3·13 − 2·1·9 = 138
    val tied = Seq((ts(1), 1.0), (ts(2), 1.0), (ts(3), 2.0), (ts(4), 3.0))
      .toDF("ts", "v")
    assert(Drift.mannKendall(tied, "ts", "v").head().getLong(2) === 138L)
    val flat = (1 to 5).map(d => (ts(d), 2.0)).toDF("ts", "v")
    val e = intercept[IllegalArgumentException] {
      Drift.mannKendall(flat, "ts", "v")
    }
    assert(e.getMessage.contains("constant"), e.getMessage)
  }

  test("cronbachAlpha: perfectly correlated items give 1; independent items ~0") {
    // items all equal → every covariance = variance → alpha = 1
    val same = (1 to 40).map(i => (i.toDouble, i.toDouble, i.toDouble))
      .toDF("a", "b", "c")
    val r1 = Stats.cronbachAlpha(same, Seq("a", "b", "c")).head()
    assert(r1.getAs[Double]("alpha") === 1.0)
    assert(r1.getLong(1) === 3L)
    // hand case, k=2: a={1,2,3}, b={1,3,2}: var_a=var_b=2/3,
    // var(a+b)={2,5,5}: mean 4, var=2 → alpha = 2·(1 − (4/3)/2) = 2/3
    val h = Seq((1.0, 1.0), (2.0, 3.0), (3.0, 2.0)).toDF("a", "b")
    val r2 = Stats.cronbachAlpha(h, Seq("a", "b")).head()
    assert(math.abs(r2.getAs[Double]("alpha") - 2.0 / 3.0) < 1e-6)
    // anti-correlated pair with zero total variance fails cleanly
    val z = Seq((1.0, -1.0), (2.0, -2.0)).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      Stats.cronbachAlpha(z, Seq("a", "b"))
    }
    assert(e.getMessage.contains("total variance"), e.getMessage)
  }

  test("iccOneWay: separated groups near 1, identical groups near 0") {
    // groups at distinct levels, tiny within-noise → ICC ≈ 1
    val sep = (for (g <- 1 to 3; i <- 1 to 10)
      yield (s"g$g", g * 100.0 + i * 0.01)).toDF("g", "v")
    val r = Stats.iccOneWay(sep, "g", "v").head()
    assert(r.getAs[Double]("icc") > 0.99, r.toString)
    assert(r.getLong(0) === 3L && r.getAs[Double]("n0") === 10.0)
    // the same values in every group → between-variance ~0 → ICC ≤ 0
    val flat = (for (g <- 1 to 3; i <- 1 to 10)
      yield (s"g$g", i.toDouble)).toDF("g", "v")
    assert(Stats.iccOneWay(flat, "g", "v").head().getAs[Double]("icc") <= 0.0)
  }

  test("durbinWatson: hand case and white-noise sanity") {
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-03-${day}%02d 09:00:00")
    // daily totals {1,2,3}: e' = {−3,0,3}, num = 9+9, den = 18 → DW 1
    val df = Seq((ts(1), 1.0), (ts(2), 2.0), (ts(3), 3.0)).toDF("ts", "v")
    val r = Stats.durbinWatson(df, "ts", "v").head()
    assert(r.getAs[Long]("n_days") === 3L)
    assert(r.getAs[Double]("dw") === 1.0)
    // alternating series {1,3,1,3,…} is strongly negatively
    // autocorrelated → DW well above 2
    val alt = (1 to 20).map(d => (ts(d), if (d % 2 == 0) 3.0 else 1.0))
      .toDF("ts", "v")
    assert(Stats.durbinWatson(alt, "ts", "v").head().getAs[Double]("dw") > 3.0)
  }
}
