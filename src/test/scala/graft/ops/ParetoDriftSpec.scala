package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pareto curve, engagement depth, PSI drift series. */
class ParetoDriftSpec extends SparkSpec {
  import spark.implicits._

  test("paretoCurve: value-weighted cumulative shares") {
    val rows = Seq((1L, 70.0), (2L, 20.0), (3L, 10.0), (2L, 0.0))
      .toDF("k", "v")
    val got = CorpusStats.paretoCurve(rows, "k", "v", topK = 2).collect()
    assert(got.length === 2)
    assert(got(0).getAs[Long]("k") === 1L)
    assert(got(0).getAs[Long]("share_cum_ppm") === 700000L)
    assert(got(1).getAs[Long]("k") === 2L)
    assert(got(1).getAs[Long]("share_cum_ppm") === 900000L)
  }

  test("engagementDepth: distinct-day loyalty histogram") {
    def ts(d: Int, h: Int) =
      java.sql.Timestamp.valueOf(f"2024-06-${d + 1}%02d $h%02d:00:00")
    val ev = Seq((1L, ts(0, 9)), (1L, ts(0, 15)), (1L, ts(1, 9)),
      (2L, ts(0, 9)), (3L, ts(0, 9)), (3L, ts(1, 9)), (3L, ts(2, 9)))
      .toDF("user_id", "ts")
    val got = Analytics.engagementDepth(ev, "user_id", "ts").collect()
      .map(r => r.getAs[Long]("active_days") -> r.getAs[Long]("n_users")).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("distinctiveTerms: planted slice-specific term wins; shared term near zero") {
    val common = Seq.fill(40)("the common words here").mkString(" ")
    val a = s"$common ${Seq.fill(30)("alphaonly").mkString(" ")}"
    val b = s"$common ${Seq.fill(30)("betaonly").mkString(" ")}"
    val df = Seq(("a", a), ("b", b)).toDF("src", "text")
    val got = CorpusStats.distinctiveTerms(df, "src", "text", topK = 3)
      .collect()
    val topA = got.filter(_.getAs[String]("slice") == "a")
    assert(topA.head.getAs[String]("term") === "alphaonly")
    assert(topA.head.getAs[Double]("z_score") > 2.0)
    val topB = got.filter(_.getAs[String]("slice") == "b")
    assert(topB.head.getAs[String]("term") === "betaonly")
    // the shared vocabulary scores near zero in both slices
    val shared = got.filter(r => r.getAs[String]("term") == "the")
    shared.foreach(r => assert(math.abs(r.getAs[Double]("z_score")) < 1.0))
  }

  test("corpusCard and vocabOverlap: exact datasheet numbers") {
    val docs = Seq(
      (1L, "the quick fox", "en", "s1", 13L),
      (2L, "the quick fox", "en", "s1", 13L),       // exact dup
      (3L, "la vache rouge", "fr", "s2", 14L),
      (4L, null.asInstanceOf[String], "en", "s2", 0L),
      (5L, "the slow fox", "en", "s2", 12L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val card = CorpusStats.corpusCard(docs, "doc_id", "text", "lang",
      "source", "n_chars").head()
    assert(card.getAs[Long]("n_docs") === 5L)
    assert(card.getAs[Long]("n_null_text") === 1L)
    assert(card.getAs[Long]("n_langs") === 2L)
    assert(card.getAs[Long]("n_sources") === 2L)
    assert(card.getAs[Long]("n_tokens") === 12L)
    assert(card.getAs[Long]("vocab_size") === 7L) // the quick fox la vache rouge slow
    assert(card.getAs[Long]("dup_doc_ppm") === 200000L) // 1 of 5
    assert(card.getAs[Long]("mean_chars_milli") === 52L * 1000 / 5)
    val ov = CorpusStats.vocabOverlap(docs, "source", "text").collect()
    assert(ov.length === 1)
    val r = ov.head
    // s1 types: the quick fox (3); s2: la vache rouge the slow fox (6)
    assert(r.getAs[Long]("size_a") === 3L && r.getAs[Long]("size_b") === 6L)
    assert(r.getAs[Long]("common") === 2L) // the, fox
    assert(r.getAs[Long]("jaccard_ppm") === 2L * 1000000 / 7)
  }

  test("termBurst: a planted spike week dominates the board") {
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-09-${d + 1}%02d 12:00:00")
    // weeks 0-3: heavy steady "base item"; week 2 adds a proportionally
    // small "viral gadget" spike (so week totals stay comparable and
    // the independence expectation isolates the genuinely bursty term)
    val rows = (0 until 28).flatMap { d =>
      val steady = Seq.fill(20)((ts(d), "base item"))
      val spike = if (d / 7 == 2) Seq.fill(5)((ts(d), "viral gadget")) else Nil
      steady ++ spike
    }
    val df = rows.toDF("ts", "name")
    val got = CorpusStats.termBurst(df, "ts", "name", minCount = 10, topK = 4)
      .collect()
    assert(got.head.getAs[String]("term") === "viral" ||
      got.head.getAs[String]("term") === "gadget")
    assert(got.head.getAs[Long]("week") === 2L)
    assert(got.head.getAs[Double]("z_burst") > 3.0)
  }

  test("holtWinters: locks onto a pure seasonal pattern with zero trend") {
    def ts(d: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 3, 1, 9, 0).plusDays(d.toLong))
    // exact weekly pattern, no trend: HW converges with b ~ 0 and the
    // next-day forecast equal to the pattern value
    val pattern = Seq(10.0, 20.0, 30.0, 40.0, 30.0, 20.0, 10.0)
    val rows = (0 until 28).map(d => (ts(d), pattern(d % 7))).toDF("d", "v")
    val r = Drift.holtWinters(rows, "d", "v").head()
    assert(r.getAs[Long]("n_days") === 28L)
    assert(math.abs(r.getAs[Double]("trend")) < 0.5)
    // day 28 is pattern slot 0 -> ~10
    assert(math.abs(r.getAs[Double]("forecast_next") - 10.0) < 2.0)
    assert(r.getAs[Double]("seasonal_range") > 20.0)
    // gap-free contract
    val gappy = rows.filter(col("v") =!= 30.0)
    intercept[IllegalArgumentException] {
      Drift.holtWinters(gappy, "d", "v")
    }
  }

  test("changepointSplit: finds the planted level-shift week") {
    def ts(d: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 1, 8, 0).plusDays(d.toLong))
    // weeks 0-4 mean 10, weeks 5-9 mean 50: the best split is week 4
    val rows = (0 until 70).map { d =>
      val v = if (d / 7 < 5) 10.0 else 50.0
      (ts(d), v)
    }.toDF("d", "v")
    val r = Drift.changepointSplit(rows, "d", "v").head()
    assert(r.getAs[Long]("split_week") === 4L)
    assert(r.getAs[Double]("mean_l") === 10.0)
    assert(r.getAs[Double]("mean_r") === 50.0)
    assert(r.getAs[Long]("n_l") === 35L && r.getAs[Long]("n_r") === 35L)
  }

  test("psiSeries: week 0 is zero drift; a shifted week scores high") {
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-07-${d + 1}%02d 12:00:00")
    // week 0 (days 0-6): values ~ 10; week 1 (days 7-13): values ~ 90
    val ev = (0 until 7).flatMap(d => Seq((ts(d), 10.0), (ts(d), 12.0))) ++
      (7 until 14).flatMap(d => Seq((ts(d), 90.0), (ts(d), 95.0)))
    val df = ev.toDF("ts", "v")
    val got = Drift.psiSeries(df, "ts", "v", breaks = Seq(50.0)).collect()
      .map(r => r.getAs[Long]("week") -> r.getAs[Double]("psi")).toMap
    assert(got(0L) === 0.0)
    assert(got(1L) > 5.0) // full mass moved across the single break
  }
}
