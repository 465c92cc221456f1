package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSIR importance resampling, Kneser-Ney LM, perplexity buckets,
  * novelty, fertility, feature scaling, contamination matrix — the
  * round-9 curation additions. */
class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  // Two clearly-separated "domains": letters vs numbers-as-words.
  private lazy val letterDocs = docs(
    (0L, "alpha beta gamma delta alpha beta"),
    (1L, "beta gamma delta epsilon beta gamma"),
    (2L, "gamma delta epsilon zeta gamma delta"),
    (3L, "alpha gamma epsilon alpha gamma epsilon"))
  private lazy val numberDocs = docs(
    (10L, "one two three four one two"),
    (11L, "two three four five two three"),
    (12L, "three four five six three four"))

  test("dsirWeights ranks target-like docs above off-target docs") {
    val raw = letterDocs.unionAll(numberDocs)
    val w = Importance.dsirWeights(raw, letterDocs, "doc_id", "text",
      buckets = 256, s = 1.0)
      .select("doc_id", "logw").as[(Long, Double)].collect().toMap
    val letterAvg = Seq(0L, 1L, 2L, 3L).map(w).sum / 4
    val numberAvg = Seq(10L, 11L, 12L).map(w).sum / 3
    assert(letterAvg > numberAvg,
      s"letter docs should look target-like: $letterAvg <= $numberAvg")
    // every letter doc individually beats every number doc here
    assert(Seq(0L, 1L, 2L, 3L).map(w).min > Seq(10L, 11L, 12L).map(w).max)
  }

  test("dsirWeights is invariant to partitioning and row order") {
    val raw = letterDocs.unionAll(numberDocs)
    val a = Importance.dsirWeights(raw, letterDocs, "doc_id", "text", 256)
      .select("doc_id", "n_feats", "logw").as[(Long, Long, Double)]
      .collect().sortBy(_._1)
    val b = Importance.dsirWeights(
        raw.repartition(7, col("doc_id")).sortWithinPartitions(desc("text")),
        letterDocs.repartition(3), "doc_id", "text", 256)
      .select("doc_id", "n_feats", "logw").as[(Long, Long, Double)]
      .collect().sortBy(_._1)
    assert(a.length == b.length)
    a.zip(b).foreach { case ((id1, n1, w1), (id2, n2, w2)) =>
      assert(id1 == id2 && n1 == n2)
      assert(math.abs(w1 - w2) < 1e-9, s"doc $id1: $w1 vs $w2")
    }
  }

  test("dsirResample returns exactly k docs, deterministically, and " +
    "prefers high-weight docs") {
    val raw = letterDocs.unionAll(numberDocs)
    val k = 3
    val s1 = Importance.dsirResample(raw, letterDocs, "doc_id", "text", k, 256)
      .select("doc_id").as[Long].collect().sorted
    val s2 = Importance.dsirResample(raw.repartition(5), letterDocs,
        "doc_id", "text", k, 256)
      .select("doc_id").as[Long].collect().sorted
    assert(s1.length == k)
    assert(s1.sameElements(s2), "resample must be deterministic")
    // letter docs dominate the weights by a wide margin; the Gumbel
    // noise is O(1) while the weight gap here is large, so the top-3
    // must all be letter docs
    assert(s1.forall(_ < 10L), s"expected letter docs, got ${s1.mkString(",")}")
  }

  test("knPerplexity matches a hand-computed bigram probability") {
    // corpus: "a b a b a c" -> bigrams: a b, b a, a b, b a, a c
    // C(a b)=2 C(b a)=2 C(a c)=1 ; C(a .)=3 C(b .)=2
    // N1+(a .)=2 N1+(b .)=1 ; N1+(. b)=1 N1+(. a)=1 N1+(. c)=1 ; types=3, V=3
    val corpus = docs((0L, "a b a b a c"))
    // doc "a b": P(b|a) = (2-.75)/3 + .75*2/3*Pcont(b)
    //   Pcont(b) = (1+.5)/(3+1.5) = 1/3
    val p = (2 - 0.75) / 3 + 0.75 * 2.0 / 3 * (1.5 / 4.5)
    val got = TextAnalysis.knPerplexity(corpus, docs((5L, "a b")), "doc_id", "text")
      .select("nll").as[Double].head()
    assert(math.abs(got - (-math.log(p))) < 1e-12, s"nll $got vs ${-math.log(p)}")
  }

  test("knPerplexity: seen bigram beats unseen bigram under the same " +
    "prefix, and OOV text still scores finite") {
    val corpus = docs(
      (0L, "the cat sat on the mat"),
      (1L, "the dog sat on the rug"))
    val scored = TextAnalysis.knPerplexity(corpus,
        docs((10L, "the cat"), (11L, "the zebra"), (12L, "qq zz")),
        "doc_id", "text")
      .select("doc_id", "nll").as[(Long, Double)].collect().toMap
    assert(scored(10L) < scored(11L), "seen bigram must score better")
    assert(!scored(12L).isNaN && !scored(12L).isInfinite,
      "fully-OOV doc must score finite under smoothed continuation")
  }

  test("pplRatioBuckets: target == corpus gives delta 0 and respects " +
    "the fixed thresholds") {
    val corpus = letterDocs
    val out = TextAnalysis.pplRatioBuckets(corpus, corpus, corpus,
        "doc_id", "text", headMax = 1.4, middleMax = 1.6)
      .select("doc_id", "nll_target", "delta", "bucket")
      .as[(Long, Double, Double, String)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, nll, delta, bucket) =>
      assert(math.abs(delta) < 1e-12, s"doc $id delta $delta")
      val expect = if (nll < 1.4) "head" else if (nll < 1.6) "middle" else "tail"
      assert(bucket == expect, s"doc $id nll $nll bucket $bucket")
    }
  }

  test("ngramNovelty: first doc scores 1.0, an exact later copy scores " +
    "0.0, and totals count distinct grams") {
    val d = docs(
      (0L, "a b c d e f"),        // 3 distinct 4-grams, all first here
      (1L, "a b c d e f"),        // exact copy -> novelty 0
      (2L, "a b c d x y z"))      // 4 grams, 'a b c d' already seen
    val out = TextAnalysis.ngramNovelty(d, "doc_id", "text", w = 4)
      .select("doc_id", "total_grams", "novel_grams", "novelty")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out(0) == ((0L, 3L, 3L, 1.0)))
    assert(out(1) == ((1L, 3L, 0L, 0.0)))
    assert(out(2)._2 == 4L && out(2)._3 == 3L)
  }

  test("tokenFertility sums are corpus-exact") {
    val d = docs(
      (0L, "hello world 42!"),
      (1L, "foo-bar baz"))
    val out = TextAnalysis.tokenFertility(spark, d, "text")
      .agg(sum("ws_tokens"), sum("regex_tokens"), sum("n_docs"))
      .as[(Long, Long, Long)].head()
    // ws: 3 + 2 = 5 ; regex: hello world 4 2 ! = 5, foo - bar baz = 4
    assert(out == ((5L, 9L, 2L)))
  }

  test("scaleByGroup: z-scores standardize per group, minmax lands in " +
    "[0,1], degenerate groups go null") {
    val d = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("b", 10.0), ("b", 20.0),
      ("c", 7.0), ("c", 7.0)) // degenerate: constant
      .toDF("g", "x")
    val out = Analytics.scaleByGroup(d, col("g"), col("x"))
    val za = out.filter(col("g") === "a")
      .agg(avg("z"), stddev_pop(col("z")), min("minmax"), max("minmax"))
      .as[(Double, Double, Double, Double)].head()
    assert(math.abs(za._1) < 1e-12 && math.abs(za._2 - 1.0) < 1e-12)
    assert(za._3 == 0.0 && za._4 == 1.0)
    val cRows = out.filter(col("g") === "c")
      .select("z", "minmax", "robust").collect()
    cRows.foreach { r => assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2)) }
  }

  test("contaminationMatrix flags a planted eval copy against exactly " +
    "its source domain") {
    val train = Seq(
      (0L, "d1", "the quick brown fox jumps over the lazy dog"),
      (1L, "d2", "pack my box with five dozen liquor jugs"))
      .toDF("doc_id", "domain", "text")
    val eval = Seq(
      (10L, "s1", "the quick brown fox jumps over a fence"), // mostly d1 grams
      (11L, "s1", "completely unrelated words here nothing shared"),
      (12L, "s2", "pack my box with five dozen liquor jugs")) // exact d2 copy
      .toDF("doc_id", "set", "text")
    val m = TextAnalysis.contaminationMatrix(train, "domain", eval, "set",
        "doc_id", "text", w = 3, threshold = 0.5)
      .select("domain", "eval_set", "n_eval", "contaminated", "rate")
      .as[(String, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(m(("d1", "s1"))._4 == 1L) // doc 10
    assert(m(("d2", "s2"))._4 == 1L) // doc 12
    assert(m(("d2", "s1"))._4 == 0L)
    assert(m(("d1", "s2"))._4 == 0L)
    assert(m(("d1", "s1"))._3 == 2L && m(("d1", "s1"))._5 == 0.5)
    // every (domain, set) cell exists, even all-zero ones
    assert(m.size == 4)
  }
}
