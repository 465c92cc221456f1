package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gate co-failure matrix and effective-token accounting. */
class GateAccountingSpec extends SparkSpec {
  import spark.implicits._

  test("gateMatrix: diagonal totals and co-failures") {
    val long = (1 to 350).map(i => s"w$i").mkString(" ")
    val rows = Seq(
      (1L, "just five words of text here ok " * 4), // repetitive (7 distinct / 28)
      (2L, "tiny doc"),                             // short only
      (3L, "99 88 77"),                             // short + numeric
      (4L, long),                                   // long + numeric (w1..w350)
      (5L, "a a a a a a a a a a a a a a a a a a a a b")) // repetitive (21 words)
      .toDF("doc_id", "text")
    val got = TextAnalysis.gateMatrix(rows, "doc_id", "text")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_both"))
      .toMap
    assert(got(("short", "short")) === 2)          // docs 2, 3
    assert(got(("numeric", "short")) === 1)        // doc 3 (a <= b order)
    assert(got(("long", "long")) === 1)
    assert(got(("long", "numeric")) === 1)         // doc 4's digit tokens
    assert(got(("repetitive", "repetitive")) === 2) // docs 1, 5
    assert(!got.contains(("long", "short")))       // never co-fire
  }

  test("effectiveTokens: full duplicates halve the effective mass") {
    val base = Seq((1L, "s1", "alpha beta gamma"), (2L, "s1", "delta eps"),
      (3L, "s2", "one two three four")).toDF("id", "src", "text")
    val d = base.unionAll(base.select(col("id") + 100, col("src"), col("text")))
    val by = Curation.effectiveTokens(d, "id", "src", "text")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(by("s1").getAs[Long]("n_docs") === 4)
    assert(by("s1").getAs[Long]("n_kept") === 2)
    assert(by("s1").getAs[Long]("raw_tokens") === 10)
    assert(by("s1").getAs[Long]("effective_tokens") === 5)
    assert(by("s1").getAs[Long]("dedup_ratio_ppm") === 500000L)
    assert(by("s2").getAs[Long]("dedup_ratio_ppm") === 500000L)
  }
}
