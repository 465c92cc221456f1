package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** multiTouchAttribution, decisionStump, hapaxStats. */
class AttributionTreesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // ------------------------------------------------- multiTouchAttribution

  test("multiTouch: 3-touch path splits 1/3 (remainder last) and 40/20/40") {
    val conv = Seq((1L, 7L, ts("2024-01-01 12:00:00"), 900L))
      .toDF("id", "u", "t", "cents")
    val tch = Seq(
      (7L, ts("2024-01-01 11:00:00"), "a"),
      (7L, ts("2024-01-01 11:30:00"), "b"),
      (7L, ts("2024-01-01 11:45:00"), "c"),
      (7L, ts("2024-01-01 08:00:00"), "z"))   // outside 2h lookback
      .toDF("u", "t", "ch")
    val out = Analytics.multiTouchAttribution(conv, tch, "id", "u", "t",
      "ch", "cents").collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(!out.contains("z"))
    // linear: 333333, 333333, 333334 (remainder to last) x 900 cents
    assert(out("a")._1 === 333333L * 900)
    assert(out("b")._1 === 333333L * 900)
    assert(out("c")._1 === 333334L * 900)
    // u-shape: first 40%, last 40%, middle 20%
    assert(out("a")._2 === 400000L * 900)
    assert(out("b")._2 === 200000L * 900)
    assert(out("c")._2 === 400000L * 900)
  }

  test("multiTouch: credit mass conserved exactly; no-touch goes to none") {
    val conv = Seq(
      (1L, 7L, ts("2024-01-01 12:00:00"), 123L),
      (2L, 8L, ts("2024-01-01 12:00:00"), 777L),   // user 8 has no touches
      (3L, 7L, ts("2024-01-02 12:00:00"), 55L))    // touches expired
      .toDF("id", "u", "t", "cents")
    val tch = Seq(
      (7L, ts("2024-01-01 11:00:00"), "a"),
      (7L, ts("2024-01-01 11:30:00"), "b"),
      (7L, ts("2024-01-01 11:40:00"), "b"),
      (7L, ts("2024-01-01 11:50:00"), "a"),
      (7L, ts("2024-01-01 11:55:00"), "c"))
      .toDF("u", "t", "ch")
    val rows = Analytics.multiTouchAttribution(conv, tch, "id", "u", "t",
      "ch", "cents").collect()
    val totLin = rows.map(_.getLong(2)).sum
    val totU = rows.map(_.getLong(3)).sum
    val expect = (123L + 777L + 55L) * 1000000L
    assert(totLin === expect && totU === expect)
    val none = rows.find(_.getString(0) == "none").get
    assert(none.getLong(2) === (777L + 55L) * 1000000L)
    assert(none.getLong(1) === 0L)
  }

  test("multiTouch: 1- and 2-touch paths get 100% and 50/50 in both models") {
    val conv = Seq((1L, 1L, ts("2024-01-01 12:00:00"), 10L),
      (2L, 2L, ts("2024-01-01 12:00:00"), 10L)).toDF("id", "u", "t", "cents")
    val tch = Seq(
      (1L, ts("2024-01-01 11:00:00"), "solo"),
      (2L, ts("2024-01-01 11:00:00"), "first"),
      (2L, ts("2024-01-01 11:30:00"), "last"))
      .toDF("u", "t", "ch")
    val out = Analytics.multiTouchAttribution(conv, tch, "id", "u", "t",
      "ch", "cents").collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out("solo") === ((10000000L, 10000000L)))
    assert(out("first") === ((5000000L, 5000000L)))
    assert(out("last") === ((5000000L, 5000000L)))
  }

  // ---------------------------------------------------------decisionStump

  test("decisionStump: perfectly separable feature found with full gain") {
    // y=1 iff x >= 5; best split is x <= 4 (threshold_cents = 400)
    val df = ((1 to 4).map(x => (x.toDouble, false)) ++
      (5 to 8).map(x => (x.toDouble, true))).toDF("x", "y")
    val r = Importance.decisionStump(df, "x", col("y")).head()
    assert(r.getAs[Long]("threshold_cents") === 400L)
    assert(r.getAs[Long]("n_left") === 4L && r.getAs[Long]("pos_left") === 0L)
    assert(r.getAs[Long]("n_right") === 4L && r.getAs[Long]("pos_right") === 4L)
    assert(r.getAs[Double]("gini_split") === 0.0)
    assert(r.getAs[Double]("gini_parent") === 0.5)
    assert(r.getAs[Double]("gain") === 0.5)
  }

  test("decisionStump: hand-computed impurity on a mixed split") {
    // x=1: 3 rows 1 pos; x=2: 3 rows 2 pos — only one candidate (x<=1)
    val df = Seq((1.0, true), (1.0, false), (1.0, false),
      (2.0, true), (2.0, true), (2.0, false)).toDF("x", "y")
    val r = Importance.decisionStump(df, "x", col("y")).head()
    assert(r.getAs[Long]("threshold_cents") === 100L)
    val gl = 1.0 - (1.0 / 3) * (1.0 / 3) - (2.0 / 3) * (2.0 / 3)
    val gr = 1.0 - (2.0 / 3) * (2.0 / 3) - (1.0 / 3) * (1.0 / 3)
    val wg = (3 * gl + 3 * gr) / 6
    assert(math.abs(r.getAs[Double]("gini_split") - wg) < 1e-6)
  }

  // ------------------------------------------------------------ hapaxStats

  test("hapaxStats: hand-counted hapax/dis/TTR per slice") {
    val df = Seq(
      ("s1", "a b b c c c"),        // vocab 3, hapax {a}, dis {b}
      ("s2", "x y"))                // vocab 2, both hapax
      .toDF("src", "text")
    val out = CorpusStats.hapaxStats(df, "src", "text").collect()
      .map(r => r.getString(0) -> r).toMap
    val s1 = out("s1")
    assert(s1.getAs[Long]("n_tokens") === 6L)
    assert(s1.getAs[Long]("vocab") === 3L)
    assert(s1.getAs[Long]("hapax") === 1L && s1.getAs[Long]("dis") === 1L)
    assert(s1.getAs[Long]("ttr_ppm") === 500000L)
    assert(s1.getAs[Long]("hapax_share_ppm") === 333333L)
    val s2 = out("s2")
    assert(s2.getAs[Long]("hapax") === 2L &&
      s2.getAs[Long]("hapax_share_ppm") === 1000000L)
  }
}
