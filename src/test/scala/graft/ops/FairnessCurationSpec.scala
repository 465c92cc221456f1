package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fairness audit, negative sampling, empirical-Bayes smoothing. */
class FairnessCurationSpec extends SparkSpec {
  import spark.implicits._

  // -------------------------------------------------------- fairnessAudit

  test("fairnessAudit: per-group rates and gaps vs overall") {
    // group a: 4 rows, 2 pos, classifier selects both pos (perfect);
    // group b: 4 rows, 2 pos, classifier selects both NEG (inverted)
    val rows = Seq(
      ("a", 1L, 1L), ("a", 1L, 1L), ("a", 0L, 0L), ("a", 0L, 0L),
      ("b", 0L, 1L), ("b", 0L, 1L), ("b", 1L, 0L), ("b", 1L, 0L))
      .toDF("g", "p", "y")
    val got = Evaluation.fairnessAudit(rows, "g", col("p"), col("y"))
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(got("a").getAs[Long]("tpr_ppm") === 1000000L)
    assert(got("a").getAs[Long]("fpr_ppm") === 0L)
    assert(got("b").getAs[Long]("tpr_ppm") === 0L)
    assert(got("b").getAs[Long]("fpr_ppm") === 1000000L)
    // overall tpr = 2/4 -> gaps are +-500000; selection rates equal
    assert(got("a").getAs[Long]("tpr_gap_ppm") === 500000L)
    assert(got("b").getAs[Long]("tpr_gap_ppm") === -500000L)
    assert(got("a").getAs[Long]("sel_gap_ppm") === 0L)
  }

  test("fairnessAudit: single-class groups are excluded") {
    val rows = Seq(("a", 1L, 1L), ("a", 0L, 0L), ("c", 1L, 1L), ("c", 0L, 1L))
      .toDF("g", "p", "y")
    val got = Evaluation.fairnessAudit(rows, "g", col("p"), col("y")).collect()
    assert(got.map(_.getAs[String]("g")).toSeq === Seq("a")) // c is all-pos
  }

  // ------------------------------------------------------- negativeSample

  test("negativeSample: deterministic, dense-range, collision-advanced") {
    val pairs = Seq((0L, 3L), (1L, 5L), (2L, 7L)).toDF("q", "pos")
    val a = Sampling.negativeSample(pairs, "q", "pos", corpusSize = 10L, k = 3)
      .collect()
    val b = Sampling.negativeSample(pairs, "q", "pos", corpusSize = 10L, k = 3)
      .collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq) // reproducible
    assert(a.length === 9)
    a.foreach { r =>
      val neg = r.getAs[Long]("neg_id")
      assert(neg >= 0 && neg < 10)
      assert(neg !== r.getAs[Long]("pos_id"))
    }
    // closed form of one draw: ((q mod 2^31)*2654435761 + rank*40503)
    // mod 2^31 mod 10, advanced off the positive
    val h = ((1L % 2147483648L) * 2654435761L + 1L * 40503L) %
      2147483648L % 10L
    val expect = if (h == 5L) (h + 1) % 10 else h
    val got = a.find(r => r.getAs[Long]("query_id") == 1L &&
      r.getAs[Long]("neg_rank") == 1L).get.getAs[Long]("neg_id")
    assert(got === expect)
  }

  // -------------------------------------------------------- ebSmoothRates

  test("ebSmoothRates: shrinks small samples toward the prior mean") {
    // keys with rates 0.2 (big n) and 1.0 (tiny n): the tiny key
    // shrinks hard, the big key barely moves
    val rows = (1 to 500).map(i => ("big", if (i <= 100) 1L else 0L)) ++
      Seq(("tiny", 1L), ("tiny", 1L)) ++
      (1 to 500).map(i => ("mid", if (i <= 300) 1L else 0L))
    val df = rows.toDF("k", "s")
    val got = Curation.ebSmoothRates(df, "k", col("s")).collect()
      .map(r => r.getAs[String]("key") -> r).toMap
    val tiny = got("tiny")
    assert(tiny.getAs[Long]("raw_ppm") === 1000000L)
    val smoothedTiny = tiny.getAs[Double]("smoothed")
    assert(smoothedTiny < 0.9) // pulled off the raw 1.0
    val big = got("big")
    assert(math.abs(big.getAs[Double]("smoothed") - 0.2) < 0.05)
    // alpha/beta positive when between-key variance is informative
    assert(tiny.getAs[Double]("alpha") > 0.0 && tiny.getAs[Double]("beta") > 0.0)
  }

  test("ebSmoothRates: degenerate variance falls back to raw rates") {
    // all keys share one rate -> variance 0 -> alpha=beta=0, smoothed=raw
    val df = Seq(("a", 1L), ("a", 0L), ("b", 1L), ("b", 0L)).toDF("k", "s")
    val got = Curation.ebSmoothRates(df, "k", col("s")).collect()
    got.foreach { r =>
      assert(r.getAs[Double]("alpha") === 0.0)
      assert(r.getAs[Double]("smoothed") === 0.5)
    }
  }

  test("domainReweight: EG step upweights high-score domains, smoothing pulls to uniform") {
    import spark.implicits._
    // equal scores -> weights equal the document shares
    val eq = Seq(("a", 10L), ("a", 10L), ("a", 10L), ("b", 10L))
      .toDF("d", "s")
    val w0 = Curation.domainReweight(eq, "d", col("s"), eta = 0.5)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("weight")).toMap
    assert(math.abs(w0("a") - 0.75) < 1e-9 && math.abs(w0("b") - 0.25) < 1e-9)
    // equal shares, b scores higher -> b upweighted by exactly
    // exp(eta*(mb - ma)) in the odds
    val df = Seq(("a", 10L), ("a", 10L), ("b", 12L), ("b", 12L)).toDF("d", "s")
    val w1 = Curation.domainReweight(df, "d", col("s"), eta = 0.5)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("weight")).toMap
    assert(w1("b") > w1("a"))
    assert(math.abs(w1("b") / w1("a") - math.exp(0.5 * 2.0)) < 1e-5)
    // full smoothing limit: smooth -> weights -> uniform mix
    val ws = Curation.domainReweight(df, "d", col("s"), eta = 0.5,
        smooth = 0.5)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("weight")).toMap
    assert(ws("a") > w1("a") && ws("b") < w1("b"))
    assert(math.abs(ws("a") + ws("b") - 1.0) < 1e-6)
    // the domain gate throws
    intercept[IllegalArgumentException] {
      Curation.domainReweight(df, "d", col("s"), eta = 0.5, maxDomains = 1)
    }
    ()
  }
}
