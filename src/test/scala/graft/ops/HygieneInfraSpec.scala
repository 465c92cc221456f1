package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corpus hygiene (mojibake, readability, keyphrases) and pipeline
  * infrastructure (compaction planning, skew reports, rank-sum test,
  * Gini concentration). */
class HygieneInfraSpec extends SparkSpec {
  import spark.implicits._

  // --------------------------------------------------------- mojibakeScan

  test("mojibakeScan: counts each artifact class, clean text scans clean") {
    val rows = Seq(
      (1L, "perfectly clean ascii text"),
      (2L, "broken � char"),
      (3L, "latin1 double decode Ã© and â€™"),
      (4L, "c1 control\u0085here"),
      (5L, "Â nbsp artifact")).toDF("doc_id", "text")
    val by = TextAnalysis.mojibakeScan(rows, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(!by(1L).getAs[Boolean]("is_mojibake"))
    assert(by(2L).getAs[Long]("n_replacement") === 1)
    assert(by(3L).getAs[Long]("n_latin1") === 2) // Ã and â€
    assert(by(4L).getAs[Long]("n_c1") === 1)
    assert(by(5L).getAs[Long]("n_latin1") === 1) // Â
    assert(Seq(2L, 3L, 4L, 5L).forall(by(_).getAs[Boolean]("is_mojibake")))
  }

  // ---------------------------------------------------------- readability

  test("readability: hand-computed FK grade, null-safe") {
    val rows = Seq((1L, "The cat sat. The dog ran!"), (2L, null))
      .toDF("doc_id", "text")
    val by = TextAnalysis.readability(rows, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val r1 = by(1L)
    assert(r1.getAs[Long]("n_words") === 6)
    assert(r1.getAs[Long]("n_sentences") === 2)
    assert(r1.getAs[Long]("n_syllables") === 6)
    // 0.39*6/2 + 11.8*6/6 - 15.59 = -2.62
    assert(r1.getAs[Long]("fk_grade_milli") === -2620L)
    assert(by(2L).getAs[Long]("n_words") === 0)
    assert(by(2L).isNullAt(by(2L).fieldIndex("fk_grade_milli")))
  }

  // ---------------------------------------------------------- rakePhrases

  test("rakePhrases: deg/freq scoring over stopword-split candidates") {
    val rows = Seq(
      (1L, "deep learning of neural networks and deep learning"))
      .toDF("doc_id", "text")
    val by = TextAnalysis.rakePhrases(rows, "doc_id", "text").collect()
      .map(r => r.getAs[String]("phrase") -> r).toMap
    assert(by.keySet === Set("deep learning", "neural networks"))
    val dl = by("deep learning")
    assert(dl.getAs[Long]("n_occurrences") === 2)
    assert(dl.getAs[Long]("n_docs") === 1)
    // deep: deg 4 freq 2 → 2e6; learning same → phrase 4e6
    assert(dl.getAs[Long]("score_ppm") === 4000000L)
    assert(by("neural networks").getAs[Long]("score_ppm") === 4000000L)
  }

  // ------------------------------------------------------- compactionPlan

  test("compactionPlan: sequential bins at the byte target") {
    val files = Seq(("p1", 1L, 3000L), ("p1", 2L, 3000L), ("p1", 3L, 3000L),
      ("p2", 4L, 12000L)).toDF("part", "file", "bytes")
    val plan = graft.sources.Layout.compactionPlan(
      files, "part", "file", "bytes", targetBytes = 5000)
    val bins = graft.sources.Layout.compactionBins(plan, "part")
      .orderBy("part", "bin_id").collect()
    // p1: before = 0,3000,6000 → bins 0,0,1; p2: one oversized file, bin 0
    assert(bins.map(r => (r.getString(0), r.getAs[Long]("bin_id"),
      r.getAs[Long]("n_files"), r.getAs[Long]("bin_bytes"))).toSeq ===
      Seq(("p1", 0L, 2L, 6000L), ("p1", 1L, 1L, 3000L),
        ("p2", 0L, 1L, 12000L)))
  }

  // ----------------------------------------------------------- skewReport

  test("skewReport: hot-key stats and salt suggestion") {
    val rows = (Seq.fill(8)("hot") ++ Seq("b", "b", "c", "c")).toDF("k")
    val r = SkewJoin.skewReport(rows, "k").head()
    assert(r.getAs[Long]("n_keys") === 3)
    assert(r.getAs[Long]("total_rows") === 12)
    assert(r.getAs[Long]("max_cnt") === 8)
    assert(r.getAs[Double]("p50") === 2.0)
    assert(r.getAs[Long]("skew_x1000") === 4000)
    // p95 of [2,2,8] = 2 + 0.9*6 = 7.4 → ceil(8/7.4) = 2
    assert(r.getAs[Long]("suggested_salt") === 2)
  }

  // ----------------------------------------------------------- mannWhitney

  test("mannWhitneyU: separated samples and the tie half-step") {
    val a = Seq(1.0, 2.0, 3.0).toDF("v")
    val b = Seq(4.0, 5.0, 6.0).toDF("v")
    val r = Drift.mannWhitneyU(a, b, "v").head()
    assert(r.getAs[Long]("u2") === 0) // every a below every b
    assert(r.getAs[Long]("tie_term") === 0)
    assert(r.getAs[Double]("z") < 0)

    val at = Seq(1.0, 2.0).toDF("v")
    val bt = Seq(2.0, 3.0).toDF("v")
    val rt = Drift.mannWhitneyU(at, bt, "v").head()
    assert(rt.getAs[Long]("u2") === 1) // one tied pair = half a win
    assert(rt.getAs[Long]("tie_term") === 6) // 2^3 - 2
  }

  test("mannWhitneyU: partitioning cannot change the statistics") {
    val a = (1 to 100).map(i => (i * 7 % 50).toDouble).toDF("v")
    val b = (1 to 80).map(i => (i * 11 % 60).toDouble).toDF("v")
    val r1 = Drift.mannWhitneyU(a, b, "v").head()
    val r2 = Drift.mannWhitneyU(a.repartition(13), b.repartition(7), "v").head()
    assert(r1.toSeq === r2.toSeq)
  }

  // ---------------------------------------------------------------- giniBy

  test("giniBy: uniform is 0, concentrated approaches 1") {
    val rows = Seq(("u", 5L), ("u", 5L), ("u", 5L), ("u", 5L),
      ("c", 0L), ("c", 0L), ("c", 0L), ("c", 10L)).toDF("g", "x")
    val by = Analytics.giniBy(rows, "g", "x").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(by("u").getAs[Long]("gini_ppm") === 0L)
    // num = 2*(4*10) - 5*10 = 30; den = 4*10 → 750000
    assert(by("c").getAs[Long]("gini_ppm") === 750000L)
    assert(by("c").getAs[Long]("total") === 10L)
  }
}
