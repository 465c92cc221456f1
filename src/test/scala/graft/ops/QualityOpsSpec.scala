package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Luhn PII scan, corpus MinHash sketches, ANN recall evaluation, and
  * the trained hashed-ngram quality filter. */
class QualityOpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ luhnScan

  test("luhnScan: validates checksums, handles separators and lengths") {
    val rows = Seq(
      (1L, "pay with 4111111111111111 now"),         // valid bare
      (2L, "pay with 4111111111111112 now"),         // checksum broken
      (3L, "card 4539 5787 6362 1486 thanks"),       // valid spaced
      (4L, "card 4111-1111-1111-1111 thanks"),       // valid dashed
      (5L, "order 123456789012 is 12 digits"),       // too short: no row
      (6L, "no digits at all"),
      (7L, "amex 371449635398431 ok"))               // valid 15-digit
      .toDF("doc_id", "text")
    val got = TextAnalysis.luhnScan(rows, "doc_id", "text")
      .select("doc_id", "digits", "luhn_valid")
      .as[(Long, String, Boolean)].collect()
    val byDoc = got.groupBy(_._1)
    assert(byDoc(1L).head._3 && byDoc(1L).head._2 == "4111111111111111")
    assert(!byDoc(2L).head._3)
    assert(byDoc(3L).head._3 && byDoc(3L).head._2 == "4539578763621486")
    assert(byDoc(4L).head._3)
    assert(!byDoc.contains(5L) && !byDoc.contains(6L))
    assert(byDoc(7L).head._3)
  }

  // ------------------------------------------- corpus sketch / similarity

  private def corpus(ids: Range, salt: String) =
    ids.map(i => (i.toLong, s"$salt document number $i with shared words " +
      s"alpha beta gamma token$i end")).toDF("doc_id", "text")

  test("corpusSketch: identical corpora sketch identically (sim = 1)") {
    val a = Dedup.corpusSketch(corpus(0 until 50, "x"), "text", k = 32)
    val b = Dedup.corpusSketch(corpus(0 until 50, "x").repartition(9),
      "text", k = 32)
    val sim = Dedup.sketchSimilarity(a, b).head()
    assert(sim.getAs[Long]("k") == 32L)
    assert(sim.getAs[Long]("n_equal") == 32L)
    assert(sim.getAs[Double]("sim") == 1.0)
  }

  test("corpusSketch: disjoint corpora diverge, union = slotwise min") {
    val ca = corpus(0 until 50, "xx")
    val cb = corpus(100 until 150, "yy")
    val a = Dedup.corpusSketch(ca, "text", k = 32)
    val b = Dedup.corpusSketch(cb, "text", k = 32)
    val simAB = Dedup.sketchSimilarity(a, b).head().getAs[Double]("sim")
    assert(simAB < 0.5, s"disjoint corpora too similar: $simAB")
    // sketch(A ∪ B) == slotwise min(sketch A, sketch B)
    val direct = Dedup.corpusSketch(ca.unionAll(cb), "text", k = 32)
      .as[(Long, String)].collect().toMap
    val folded = a.select(col("s"), col("sig").as("sa"))
      .join(b.select(col("s"), col("sig").as("sb")), "s")
      .select(col("s"), least(col("sa"), col("sb")).as("sig"))
      .as[(Long, String)].collect().toMap
    assert(direct == folded)
  }

  // ----------------------------------------------------------- recallAtK

  test("recallAtK: hand-computed hits, missed queries score zero") {
    val truth = Seq((1L, 10L), (1L, 11L), (1L, 12L),
      (2L, 20L), (2L, 21L), (2L, 22L),
      (3L, 30L), (3L, 31L), (3L, 32L)).toDF("query_id", "neighbor_id")
    val approx = Seq((1L, 10L), (1L, 11L), (1L, 99L), // 2/3 for q1
      (2L, 20L), (2L, 21L), (2L, 22L))                // 3/3 for q2, q3 missed
      .toDF("query_id", "neighbor_id")
    val got = Ann.recallAtK(approx, truth, k = 3)
      .select("query_id", "n_true", "n_hit", "recall")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 3L, 2L, 2.0 / 3)))
    assert(got(2L) == ((2L, 3L, 3L, 1.0)))
    assert(got(3L) == ((3L, 3L, 0L, 0.0)))
  }

  test("recallAtK: duplicate candidate rows don't inflate recall") {
    val truth = Seq((1L, 10L), (1L, 11L)).toDF("query_id", "neighbor_id")
    val approx = Seq((1L, 10L), (1L, 10L), (1L, 10L))
      .toDF("query_id", "neighbor_id")
    val r = Ann.recallAtK(approx, truth, k = 2).head()
    assert(r.getAs[Long]("n_hit") == 1L)
  }

  // -------------------------------------------------------- dispersionBy

  test("dispersionBy: tight group near zero, diffuse group larger") {
    val tight = (0 until 20).map(i =>
      ("tight", Array(1.0, 0.001 * i, 0.0)))
    val diffuse = Seq(("diffuse", Array(1.0, 0.0, 0.0)),
      ("diffuse", Array(0.0, 1.0, 0.0)), ("diffuse", Array(0.0, 0.0, 1.0)))
    val df = (tight ++ diffuse).toDF("label", "vec")
    val got = Embeddings.dispersionBy(df, "label", "vec")
      .select("label", "n_vecs", "dispersion")
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got("tight")._2 == 20L && got("diffuse")._2 == 3L)
    assert(got("tight")._3 < 0.001, s"tight dispersion ${got("tight")._3}")
    assert(got("diffuse")._3 > 0.3, s"diffuse dispersion ${got("diffuse")._3}")
  }

  // --------------------------------------------------------- codeSignals

  test("codeSignals routes code blocks vs prose") {
    val code =
      "def add(a, b):\n  return a + b;\nclass Calc {\n  int total = 0;\n}"
    val prose = "the gentle morning light settled over the quiet harbor " +
      "as fishermen prepared their nets for the day ahead"
    val df = Seq((1L, code), (2L, prose), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = TextAnalysis.codeSignals(df, "doc_id", "text")
      .select("doc_id", "n_keywords", "n_lines", "n_marked_lines", "is_code")
      .as[(Long, Long, Int, Int, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L)._5, "code block must flag is_code")
    assert(got(1L)._2 >= 4) // def, return, class, int
    assert(got(1L)._3 == 5 && got(1L)._4 >= 3)
    assert(!got(2L)._5, "prose must not flag is_code")
    assert(!got(3L)._5)
  }

  // ------------------------------------------------------- mergeSketches

  test("mergeSketches folds incrementally to the batch sketch") {
    val batches = Seq(corpus(0 until 20, "a"), corpus(20 until 40, "b"),
      corpus(40 until 60, "c"))
    val whole = Dedup.corpusSketch(
      batches.reduce(_.unionAll(_)), "text", k = 16)
      .as[(Long, String)].collect().toMap
    val folded = Dedup.mergeSketches(
        batches.map(b => Dedup.corpusSketch(b, "text", k = 16)): _*)
      .as[(Long, String)].collect().toMap
    assert(whole == folded)
  }

  // ------------------------------------------------- trained quality filter

  test("trainQualityFilter separates target-like from background docs") {
    val target = (0 until 30).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog " +
        s"quality prose sentence $i")).toDF("doc_id", "text")
    val background = (100 until 130).map(i =>
      (i.toLong, s"buy cheap pills now click here winner $i spam spam " +
        "free offer")).toDF("doc_id", "text")
    val model = Importance.trainQualityFilter(background, target,
      "doc_id", "text", buckets = 512)
    val scores = Importance.qualityFilterScores(model,
        target.unionAll(background), "doc_id", "text", buckets = 512)
      .as[(Long, Double)].collect().toMap
    val tMin = (0 until 30).map(i => scores(i.toLong)).min
    val bMax = (100 until 130).map(i => scores(i.toLong)).max
    assert(tMin > bMax,
      s"classifier failed to separate: target min $tMin <= background max $bMax")
    assert(tMin > 0.5 && bMax < 0.5)
  }

  test("gopherRules: each rule fires on a crafted violator (round 17)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val good = ("good", ("the quick brown fox jumps over the lazy dog and " +
      "then it ran off to be with all of that other pack having fun " +
      "with every word here so the count clears twenty easily today"))
    val docs = Seq(
      good,
      ("short", "the of and be"), // word count < 20
      ("symbols", ("the of and be " * 5) + ("# " * 30)), // symbol ratio
      ("bullets", (1 to 12).map(i => s"- item $i of the set").mkString("\n")),
      ("ellipsis", (1 to 10).map(i =>
        s"the line $i of this doc trails off...").mkString("\n")),
      ("numeric", "the of " + ((1 to 40).map(_.toString).mkString(" "))),
      ("nostops", (1 to 30).map(i => s"w$i").mkString(" "))
    ).toDF("id", "text")
    val r = TextAnalysis.gopherRules(docs, "text", minWords = 20)
      .select("id", "g_word_count", "g_symbols", "g_bullets", "g_ellipsis",
        "g_alpha", "g_stops", "gopher_keep")
      .collect().map(rw => rw.getString(0) -> rw).toMap
    assert(r("good").getBoolean(7), "good doc keeps")
    assert(!r("short").getBoolean(1), "word count fires")
    assert(!r("symbols").getBoolean(2), "symbol ratio fires")
    assert(!r("bullets").getBoolean(3), "bullet ratio fires")
    assert(!r("ellipsis").getBoolean(4), "ellipsis ratio fires")
    assert(!r("numeric").getBoolean(5), "alpha-word ratio fires")
    assert(!r("nostops").getBoolean(6), "stopword rule fires")
    docs.collect() // force no lazy surprises
    ()
  }

  test("c4Filters: line keeps and page drops (round 17)") {
    import spark.implicits._
    val docs = Seq(
      ("keep", "this is a fine sentence here.\nanother full line of text is kept!\nand one more decent line stays put."),
      ("shortlines", "too short.\nway too small.\nnope tiny."),
      ("nopunct", "this line has no terminal punctuation at all\nneither does this one over here\nnor this third one either"),
      ("lorem", "this is a fine sentence here.\nanother full line of text is kept!\nand one more decent line stays put.\nlorem ipsum dolor sit amet friends."),
      ("brace", "this is a fine sentence here.\nanother full line of text is kept!\nand one more decent line stays put { sadly."),
      ("js", "this is a fine sentence here.\nanother full line of text is kept!\nand one more decent line stays put.\nplease enable javascript to continue reading.")
    ).toDF("id", "text")
    val r = TextAnalysis.c4Filters(docs, "text")
      .select("id", "n_kept_lines", "n_sentences", "c4_lorem", "c4_brace",
        "c4_keep")
      .collect().map(rw => rw.getString(0) -> rw).toMap
    assert(r("keep").getBoolean(5) && r("keep").getInt(1) == 3)
    assert(r("shortlines").getInt(1) == 0 && !r("shortlines").getBoolean(5),
      "min words per line drops all")
    assert(r("nopunct").getInt(1) == 0 && !r("nopunct").getBoolean(5),
      "terminal punctuation rule drops all")
    assert(r("lorem").getBoolean(3) && !r("lorem").getBoolean(5))
    assert(r("brace").getBoolean(4) && !r("brace").getBoolean(5))
    // the javascript line is dropped but the page survives (3 sentences left)
    assert(r("js").getInt(1) == 3 && r("js").getBoolean(5))
    ()
  }

  test("gopherRules / c4Filters: null text = empty doc, flags never null " +
      "(round 18)") {
    // round 18 (ADVICE): a null text column used to null-propagate into
    // gopher_keep/c4_keep, and a when(!flag) violation census silently
    // counted those docs as PASSING every rule. Now null == '' and every
    // flag is a real boolean (keep = false), matching the repetition
    // kernel's explicit null handling.
    import spark.implicits._
    val docs = Seq(("a", null: String), ("b", ""),
      ("c", "the quick brown fox is here with all of that and be to of."))
      .toDF("id", "text")
    val g = TextAnalysis.gopherRules(docs, "text", minWords = 5)
      .select("id", "g_word_count", "g_word_len", "g_symbols", "g_bullets",
        "g_ellipsis", "g_alpha", "g_stops", "gopher_keep")
      .collect().map(rw => rw.getString(0) -> rw).toMap
    for (id <- Seq("a", "b"); i <- 1 to 8) {
      assert(!g(id).isNullAt(i), s"gopher $id flag $i must not be null")
    }
    assert(!g("a").getBoolean(8) && !g("b").getBoolean(8),
      "null and empty both drop")
    // null text scores EXACTLY like the empty string on every flag
    for (i <- 1 to 8)
      assert(g("a").getBoolean(i) == g("b").getBoolean(i), s"flag $i parity")
    val c = TextAnalysis.c4Filters(docs, "text")
      .select("id", "c4_text", "c4_lorem", "c4_brace", "c4_keep")
      .collect().map(rw => rw.getString(0) -> rw).toMap
    for (id <- Seq("a", "b"); i <- 1 to 4)
      assert(!c(id).isNullAt(i), s"c4 $id col $i must not be null")
    assert(!c("a").getBoolean(4) && !c("b").getBoolean(4))
    ()
  }

  test("gopherRepetitionRules: hand-computed fractions per rule (round 17)") {
    import spark.implicits._
    val docs = Seq(
      // clean prose: everything under threshold
      (1L, "the quick brown fox jumps over a lazy dog\nwhile the calm cat naps near a warm stove today\n\nfresh air drifts in from the open window now"),
      // duplicate lines: "x y." three times out of 4 lines
      (2L, "x y.\nx y.\nx y.\nsomething else entirely different here"),
      // bigram spam: "the cat" repeated
      (3L, "the cat the cat the cat the cat the cat"),
      // half-repeated 10 words: dup 5..10-gram rules fire
      (4L, "a b c d e f g h i j a b c d e f g h i j")
    ).toDF("id", "text")
    val r = TextAnalysis.gopherRepetitionRules(docs, "id", "text")
      .collect().map(rw => rw.getLong(0) -> rw).toMap
    // doc 1: no duplicate lines/paras, no repeated n-grams at all (top
    // count 1 scores 0 by convention)
    assert(r(1L).getBoolean(14), "clean doc keeps")
    assert(r(1L).getDouble(1) == 0.0 && r(1L).getDouble(3) == 0.0)
    assert(r(1L).getDouble(5) == 0.0 && r(1L).getDouble(7) == 0.0)
    // doc 2: dup_line_frac = 2/4; dup_line_char_frac = 2*4 / (3*4+38)
    assert(math.abs(r(2L).getDouble(1) - 0.5) < 1e-12)
    assert(math.abs(r(2L).getDouble(2) - 8.0 / 50.0) < 1e-12)
    assert(!r(2L).getBoolean(14), "dup lines reject")
    // doc 3: V = "the cat " * 5 trimmed, T = 39; top bigram "the cat"
    // count 5, len 7 -> 35/39; also "cat the" count 4 len 7 = 28 -> max
    assert(math.abs(r(3L).getDouble(5) - 35.0 / 39.0) < 1e-12)
    assert(!r(3L).getBoolean(14))
    // doc 4: T = 39; every 5..10-gram of the second half repeats the
    // first half -> marked chars are exactly positions 20..38 (19 chars)
    for (c <- 8 to 13)
      assert(math.abs(r(4L).getDouble(c) - 19.0 / 39.0) < 1e-12,
        s"dup ngram col $c: ${r(4L).getDouble(c)}")
    assert(!r(4L).getBoolean(14))
    ()
  }
}
