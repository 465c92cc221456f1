package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bitext candidate mining and incremental connected components. */
class IncrementalMiningSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------ bitextCandidates

  test("bitextCandidates: pairs cross-language number twins only") {
    val docs = Seq(
      (1L, "en", "price 42 total 7 units"),
      (2L, "de", "preis 42 gesamt 7 einheiten"),  // both numbers → jac 1
      (3L, "de", "nur 42 hier"),                   // one of two → 1/2
      (4L, "en", "price 42 total 7 once more"),    // same lang as 1
      (5L, "fr", "rien du tout"))                  // no numbers
      .toDF("id", "lang", "text")
    val got = Dedup.bitextCandidates(docs, "id", "lang", "text",
      threshold = 0.9).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(got === Set((1L, 2L), (2L, 4L))) // 4 is en, 2 is de: cross-lang
    val loose = Dedup.bitextCandidates(docs, "id", "lang", "text",
      threshold = 0.4).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(loose.contains((1L, 3L))) // 1 shared / 2 union = 0.5
    // 1-4 share everything but the SAME language: never paired
    assert(!loose.contains((1L, 4L)))
  }

  test("bitextCandidates: maxDf drops ubiquitous numbers") {
    val docs = (1 to 50).map(i => (i.toLong, if (i % 2 == 0) "en" else "de",
      s"common 2024 unique ${1000 + i}")).toDF("id", "lang", "text")
    // 2024 appears 50 times; with maxDf=10 only the unique numbers
    // survive → no doc shares a surviving number → no pairs
    assert(Dedup.bitextCandidates(docs, "id", "lang", "text",
      threshold = 0.1, maxDf = 10).count() === 0)
    // uncapped: every cross-lang pair shares 2024 (1 of 3 union ≈ 0.33)
    assert(Dedup.bitextCandidates(docs, "id", "lang", "text",
      threshold = 0.3, maxDf = 10000).count() > 0)
  }

  // --------------------------------------- connectedComponentsIncremental

  test("incremental CC equals full recompute when a batch merges clusters") {
    val old = Seq((1L, 2L), (3L, 4L), (6L, 7L)).toDF("a", "b")
    val fresh = Seq((2L, 3L), (8L, 9L)).toDF("a", "b")
    val labels1 = Dedup.connectedComponents(old, "a", "b")
    val inc = Dedup.connectedComponentsIncremental(
      labels1, "id", "cluster_id", fresh, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Dedup.connectedComponents(old.unionAll(fresh), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc === full)
    assert(inc(4L) === 1L) // the fresh 2-3 edge merged {1,2} with {3,4}
    assert(inc(9L) === 8L) // fresh-only nodes appear too
  }
}
