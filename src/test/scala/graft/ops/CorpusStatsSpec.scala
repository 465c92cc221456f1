package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corpus statistics, domain blocklisting, NFC hygiene, EWMA, and HITS —
  * the round-9 distributional-diagnostics additions. */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------- lexicalStats

  test("lexicalStats: hand-computed entropy, ttr, hapax on a known doc") {
    // tokens: a a a b b c  → n=6, types=3, hapax=1 (c)
    val df = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    val r = CorpusStats.lexicalStats(df, "doc_id", "text").head()
    assert(r.getAs[Long]("n_tokens") == 6L)
    assert(r.getAs[Long]("n_types") == 3L)
    assert(math.abs(r.getAs[Double]("ttr") - 0.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("hapax_ratio") - 1.0 / 3) < 1e-12)
    val expected = math.log(6) -
      (3 * math.log(3) + 2 * math.log(2) + 1 * math.log(1)) / 6
    assert(math.abs(r.getAs[Double]("entropy") - expected) < 1e-9)
  }

  test("lexicalStats: uniform tokens maximize entropy, repeated minimize") {
    val df = Seq((1L, "a b c d"), (2L, "a a a a")).toDF("doc_id", "text")
    val m = CorpusStats.lexicalStats(df, "doc_id", "text")
      .select("doc_id", "entropy").as[(Long, Double)].collect().toMap
    assert(math.abs(m(1L) - math.log(4)) < 1e-9)
    assert(math.abs(m(2L)) < 1e-12) // single type → zero entropy
  }

  // ------------------------------------------------------------ zipfFit

  test("zipfFit recovers a ~1/r power law and ignores partitioning") {
    // counts round(1000 / r) for ranks 1..20 → slope ≈ −1
    val words = (1 to 20).flatMap(r => Seq.fill(1000 / r)(s"w$r"))
    val df = Seq(Tuple1(words.mkString(" "))).toDF("text")
    val fit = CorpusStats.zipfFit(df, "text", topK = 20).head()
    assert(fit.getAs[Long]("top_k") == 20L)
    val slope = fit.getAs[Double]("slope")
    assert(slope < -0.9 && slope > -1.1, s"slope $slope not ~ -1")
    val fit8 = CorpusStats.zipfFit(df.repartition(8), "text", topK = 20).head()
    assert(fit8.getAs[Double]("slope") == slope)
  }

  // ---------------------------------------------------------- klMixture

  test("klMixture: drifted slice diverges more; KL is non-negative") {
    // dense slices (smoothing mass s·B must stay small vs n_tokens,
    // as it would be on any real corpus)
    val line = (i: Int) => Seq.fill(8)(s"common tok$i words here").mkString(" ")
    val base = (0 until 40).map(i => ("like", line(i)))
    val similar = (0 until 40).map(i => ("similar", line(i)))
    val drifted = (0 until 40).map(_ =>
      ("drifted", Seq.fill(8)("zzz qqq xxx yyy vvv").mkString(" ")))
    val df = (base ++ similar ++ drifted).toDF("source", "text")
    val kl = CorpusStats.klMixture(df, "source", "text", buckets = 64)
      .select("slice", "kl").as[(String, Double)].collect().toMap
    assert(kl.values.forall(_ >= 0), s"negative KL in $kl")
    assert(kl("drifted") > kl("similar") * 2,
      s"drifted ${kl("drifted")} should dwarf similar ${kl("similar")}")
  }

  // ------------------------------------------------- markBlockedDomains

  test("markBlockedDomains: suffix semantics, longest match, www strip") {
    val rows = Seq(
      (1L, "https://ads.example.com/banner"),   // subdomain of rule
      (2L, "https://example.com/page"),         // exact rule
      (3L, "https://www.example.com/page"),     // www strips → exact rule
      (4L, "https://notexample.com/x"),         // suffix must align on dots
      (5L, "https://deep.ads.example.com/y"),   // two levels down
      (6L, "https://safe.org/z"),               // no rule
      (7L, "https://a.b.c.net/w"))              // longest of two rules wins
      .toDF("id", "url")
    val rules = Seq("example.com", "c.net", "b.c.net").map(Tuple1(_))
      .toDF("pattern")
    val got = TextAnalysis.markBlockedDomains(rows, "id", "url", rules)
      .select("id", "blocked_by").as[(Long, Option[String])]
      .collect().toMap
    assert(got(1L).contains("example.com"))
    assert(got(2L).contains("example.com"))
    assert(got(3L).contains("example.com"))
    assert(got(4L).isEmpty, "notexample.com must NOT match example.com")
    assert(got(5L).contains("example.com"))
    assert(got(6L).isEmpty)
    assert(got(7L).contains("b.c.net"), s"longest match wins, got ${got(7L)}")
  }

  // ----------------------------------------------------------- NFC

  test("nfcStats/nfc: decomposed accents compose, ASCII passes through") {
    val rows = Seq((1L, "cafe\u0301 latte"), (2L, "plain ascii"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val stats = TextAnalysis.nfcStats(rows, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(stats(1L) == ((11L, 10L, true))) // e+◌́ composes to é
    assert(stats(2L) == ((11L, 11L, false)))
    assert(stats(3L) == ((0L, 0L, false)))
    val texts = TextAnalysis.nfc(rows, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(texts(1L).contains("caf\u00e9 latte"))
    assert(texts(2L).contains("plain ascii"))
    assert(texts(3L).isEmpty)
  }

  // ----------------------------------------------------------- ewmaLevel

  test("ewmaLevel: hand-computed recursion, order-of-input invariance") {
    val rows = Seq(
      (1L, "2024-01-01 00:00:01", 1L, 10.0),
      (1L, "2024-01-01 00:00:02", 2L, 20.0),
      (1L, "2024-01-01 00:00:03", 3L, 30.0),
      (2L, "2024-01-01 00:00:01", 4L, 5.0))
      .toDF("k", "ts", "tie", "v")
      .withColumn("ts", col("ts").cast("timestamp"))
    // y = 10 → 0.75·10+0.25·20 = 12.5 → 0.75·12.5+0.25·30 = 16.875
    val expect = Map(1L -> 16.875, 2L -> 5.0)
    for (d <- Seq(rows, rows.orderBy(desc("tie")).repartition(5))) {
      val got = Drift.ewmaLevel(d, "k", "ts", "tie", "v", alpha = 0.25)
        .select("k", "ewma").as[(Long, Double)].collect().toMap
      assert(got == expect, s"got $got")
    }
    val n = Drift.ewmaLevel(rows, "k", "ts", "tie", "v")
      .select("k", "n").as[(Long, Long)].collect().toMap
    assert(n == Map(1L -> 3L, 2L -> 1L))
  }

  test("ewmaLevel: ties on ts break on the tie column deterministically") {
    val rows = Seq(
      (1L, "2024-01-01 00:00:01", 2L, 100.0),
      (1L, "2024-01-01 00:00:01", 1L, 0.0))
      .toDF("k", "ts", "tie", "v")
      .withColumn("ts", col("ts").cast("timestamp"))
    val got = Drift.ewmaLevel(rows, "k", "ts", "tie", "v", alpha = 0.25)
      .select("ewma").as[Double].head()
    assert(got == 0.75 * 0.0 + 0.25 * 100.0) // tie=1 first, tie=2 folds in
  }

  // ---------------------------------------------------------------- HITS

  test("hits: hand-computed 2-iteration scores on a star graph") {
    // 1→2, 3→2, 1→4:  a¹=(2:2, 4:1)  h¹=(1:3, 3:2)
    //                  a²=(2:5, 4:3)  h²=(1:8, 3:5)
    val e = Seq((1L, 2L), (3L, 2L), (1L, 4L)).toDF("src", "dst")
    val got = Graph.hits(e, "src", "dst", iters = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got(2L)._1 == 5L && got(4L)._1 == 3L)
    assert(got(1L)._2 == 8L && got(3L)._2 == 5L)
    assert(got(1L)._1 == 0L && got(3L)._1 == 0L) // no in-edges → no authority
    assert(math.abs(got(2L)._3 - 5.0 / 8) < 1e-12)
    assert(math.abs(got(1L)._4 - 8.0 / 13) < 1e-12)
  }

  test("hits: duplicate edges collapse; result is partitioning-invariant") {
    val e = Seq((1L, 2L), (1L, 2L), (3L, 2L), (1L, 4L)).toDF("src", "dst")
    val a = Graph.hits(e, "src", "dst", iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Graph.hits(e.repartition(7), "src", "dst", iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
    assert(a.contains((2L, 5L, 0L)))
  }

  test("coverageCurve: cumulative shares keep the tail in the total") {
    import spark.implicits._
    val rows = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c"))
      .toDF("k")
    val got = CorpusStats.coverageCurve(rows, "k", topK = 2)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[String]("k"),
        r.getAs[Long]("cnt"), r.getAs[Long]("share_cum_ppm")))
    // c's 2 rows stay in the denominator: the curve tops out at 800000
    assert(got.toSeq === Seq((1, "a", 5L, 500000L), (2, "b", 3L, 800000L)))
  }

  test("goodTuring: hand-computed frequency-of-frequencies re-estimates") {
    import spark.implicits._
    // token counts: a:4, b:2, c:2, d:1, e:1, f:1 -> N_1=3, N_2=2, N_4=1
    val df = Seq("a a b c d", "a a b c e f").toDF("text")
    val got = CorpusStats.goodTuring(df, Dedup.words(col("text")), maxR = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // N = 11 tokens; p0 = 3*1e6 // 11 = 272727
    // r=1: r* = 2*N_2/N_1 = 2*2/3 -> 1333333 ppm
    // r=2: r* = 3*N_3/N_2 = 0 (N_3 empty)
    // r=4: N_5 empty -> 0
    assert(got.toSeq === Seq(
      (1L, 3L, 2L, 1333333L, 272727L),
      (2L, 2L, 0L, 0L, 272727L),
      (4L, 1L, 0L, 0L, 272727L)))
  }

  test("bradleyTerry: dominant item ranks first; zero-win item gets strength 0") {
    import spark.implicits._
    // a beats b 3x, a beats c 2x, b beats c 2x, c beats b 1x; c never
    // beats a, and d never wins at all
    val pairs = (Seq.fill(3)(("a", "b")) ++ Seq.fill(2)(("a", "c")) ++
      Seq.fill(2)(("b", "c")) ++ Seq(("c", "b")) ++ Seq(("a", "d")))
      .toDF("w", "l")
    val got = Ranking.bradleyTerry(pairs, "w", "l", iters = 15)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.map(_._1).toSeq === Seq("a", "b", "c", "d"),
      got.mkString(";"))
    val byItem = got.map(g => g._1 -> g).toMap
    assert(byItem("a")._2 === 6L && byItem("a")._3 === 6L)
    assert(byItem("d")._2 === 0L && byItem("d")._4 === 0L,
      "never-winning item sits at the MLE boundary 0")
    // strengths normalize to mean ~1e6 (floor-division slack only)
    val tot = got.map(_._4).sum
    assert(math.abs(tot - 4000000L) <= 8L, s"sum $tot")
    // P[a beats b] implied by the fit exceeds the empirical dominance order
    assert(byItem("a")._4 > byItem("b")._4 && byItem("b")._4 > byItem("c")._4)
    // self-pairs are dropped; the item gate throws
    intercept[IllegalArgumentException] {
      Ranking.bradleyTerry(pairs, "w", "l", maxItems = 2)
    }
    ()
  }
}
