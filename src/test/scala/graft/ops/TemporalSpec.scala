package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Hand-computable specs for the temporal/CDC, transition, A/B,
  * MAD-outlier, triangle, collocation and positional-index operators. */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("scd2 compresses runs and bounds validity periods") {
    val log = Seq(
      (1L, "a", ts("2024-01-01 00:00:00"), 1L),
      (1L, "a", ts("2024-01-02 00:00:00"), 2L), // same value: compressed
      (1L, "b", ts("2024-01-03 00:00:00"), 3L),
      (1L, "a", ts("2024-01-04 00:00:00"), 4L), // back to a: NEW version
      (2L, "x", ts("2024-01-01 12:00:00"), 5L)
    ).toDF("k", "attr", "ts", "id")
    val out = Temporal.scd2(log, "k", "attr", "ts", "id")
      .orderBy("k", "version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getInt(4), r.getBoolean(5)))
    assert(out.toSeq == Seq(
      (1L, "a", ts("2024-01-01 00:00:00"), Some(ts("2024-01-03 00:00:00")), 1, false),
      (1L, "b", ts("2024-01-03 00:00:00"), Some(ts("2024-01-04 00:00:00")), 2, false),
      (1L, "a", ts("2024-01-04 00:00:00"), None, 3, true),
      (2L, "x", ts("2024-01-01 12:00:00"), None, 1, true)))
  }

  test("scd2 treats null attribute values as a version like any other") {
    val log = Seq(
      (1L, Option("a"), ts("2024-01-01 00:00:00"), 1L),
      (1L, None, ts("2024-01-02 00:00:00"), 2L),
      (1L, None, ts("2024-01-03 00:00:00"), 3L), // null run compresses
      (1L, Option("a"), ts("2024-01-04 00:00:00"), 4L)
    ).toDF("k", "attr", "ts", "id")
    val out = Temporal.scd2(log, "k", "attr", "ts", "id")
      .orderBy("version").collect()
      .map(r => (Option(r.getString(1)), r.getInt(4)))
    assert(out.toSeq == Seq((Some("a"), 1), (None, 2), (Some("a"), 3)))
  }

  test("cdcApply: latest-wins upsert, delete, insert, passthrough") {
    val base = Seq((1L, "one", 10.0), (2L, "two", 20.0), (3L, "three", 30.0))
      .toDF("k", "name", "bal")
    val changes = Seq(
      (1L, "U", 1L, "one-v2", 11.0),
      (1L, "U", 2L, "one-v3", 12.0), // later seq wins
      (2L, "D", 1L, "gone", 0.0),    // delete key 2
      (9L, "I", 1L, "nine", 90.0)    // insert new key
    ).toDF("k", "op", "seq", "name", "bal")
    val out = Temporal.cdcApply(base, changes, "k", "op", Seq(col("seq")),
        Seq("name", "bal"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq(
      (1L, "one-v3", 12.0), (3L, "three", 30.0), (9L, "nine", 90.0)))
  }

  test("gapFill zero-fills interior hourly buckets per key") {
    val e = Seq(
      (1L, ts("2024-01-01 00:10:00"), 1.00),
      (1L, ts("2024-01-01 00:50:00"), 2.00), // same bucket
      (1L, ts("2024-01-01 03:10:00"), 4.00), // 01:00 and 02:00 are gaps
      (2L, ts("2024-01-01 05:30:00"), 9.00)  // single-bucket key
    ).toDF("k", "ts", "value")
    val out = Temporal.gapFill(e, "k", "ts", col("value"))
      .orderBy("k", "bucket").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, ts("2024-01-01 00:00:00"), 2L, 300L),
      (1L, ts("2024-01-01 01:00:00"), 0L, 0L),
      (1L, ts("2024-01-01 02:00:00"), 0L, 0L),
      (1L, ts("2024-01-01 03:00:00"), 1L, 400L),
      (2L, ts("2024-01-01 05:00:00"), 1L, 900L)))
  }

  test("transitions counts consecutive pairs with exact probabilities") {
    val e = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 00:01:00"), 2L, "b"),
      (1L, ts("2024-01-01 00:02:00"), 3L, "a"),
      (2L, ts("2024-01-01 00:00:00"), 4L, "a"),
      (2L, ts("2024-01-01 00:01:00"), 5L, "b")
    ).toDF("u", "ts", "id", "t")
    val out = Analytics.transitions(e, "u", "ts", "id", "t")
      .orderBy("from_type", "to_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // from a: 2x a->b (p=1); from b: 1x b->a (p=1)
    assert(out.toSeq == Seq(("a", "b", 2L, 1.0), ("b", "a", 1L, 1.0)))
  }

  test("abTest computes the pooled two-proportion z statistic") {
    // arm A (variant=false): 3 of 4 convert; arm B: 1 of 4
    val units = (1 to 8).map(i => (i.toLong, i % 2 == 0,
      (i % 2 == 1 && i != 7) || i == 2)).toDF("id", "is_b", "conv")
    val row = Analytics.abTest(units, col("is_b"), col("conv")).collect()(0)
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
      == ((4L, 3L, 4L, 1L)))
    val p = 4.0 / 8.0
    val z = (0.75 - 0.25) / math.sqrt(p * (1 - p) * (1.0 / 4 + 1.0 / 4))
    assert(math.abs(row.getDouble(4) - z) < 1e-6)
  }

  test("madOutliers: exact median/MAD on odd and even group sizes") {
    // group "o" (odd n=5): cents 100,200,300,400,1000 -> med 300,
    // devs 200,100,0,100,700 -> MAD 100; |x-med| > 3*100: only 1000 (700)
    // group "e" (even n=4): 100,200,300,400 -> med 250,
    // devs 150,50,50,150 -> MAD (50+150)/2 = 100; none exceed 300
    val df = (Seq(1.0, 2.0, 3.0, 4.0, 10.0).map(("o", _)) ++
      Seq(1.0, 2.0, 3.0, 4.0).map(("e", _))).toDF("g", "v")
    val out = Analytics.madOutliers(df, "g", col("v"), k = 3)
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      ("e", 4L, 250.0, 100.0, 0L), ("o", 5L, 300.0, 100.0, 1L)))
  }

  test("triangleCount: K4 has four triangles, three per node") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    // duplicated + reversed edges must not change the count
    val e = (k4 ++ k4.map(_.swap) ++ Seq((5L, 6L), (6L, 7L)))
      .toDF("src", "dst")
    val out = Graph.triangleCount(e, "src", "dst")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
  }

  test("cooccurrence counts windowed pairs with exact PMI") {
    val docs = Seq((1L, "a b a"), (2L, "b a")).toDF("doc_id", "text")
    val out = TextAnalysis.cooccurrence(docs, "doc_id", "text",
        window = 1, minPair = 1)
      .orderBy("tok_a", "tok_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    // adjacent pairs: (a,b) 'a b', (a,b) 'b a', (a,b) 'b a' -> 3
    // N_tok = 5, N_pairs = 3, c_a = 3, c_b = 2
    val pmi = BigDecimal(math.log(3.0 * 25.0 / (3.0 * (3 * 2))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.toSeq == Seq(("a", "b", 3L, 3L, 2L, pmi)))
  }

  test("positionalIndex records df, occurrence counts and first position") {
    val docs = Seq((1L, "x y x"), (2L, "y z"), (3L, "y")).toDF("doc_id", "text")
    val out = TextAnalysis.positionalIndex(docs, "doc_id", "text", minDocs = 2)
      .orderBy("token", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getInt(3), r.getLong(4)))
    // only "y" reaches df >= 2 (in all 3 docs); x/z are single-doc
    assert(out.toSeq == Seq(
      ("y", 1L, 1L, 2, 3L), ("y", 2L, 1L, 1, 3L), ("y", 3L, 1L, 1, 3L)))
  }
}
