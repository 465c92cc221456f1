package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** RFM segmentation and cluster-downweighted sampling. */
class SegmentationSpec extends SparkSpec {
  import spark.implicits._

  test("rfmSegments: deterministic quartiles, recency inverted") {
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-08-${d + 1}%02d 00:00:00")
    // 8 customers: customer i orders (i+1) times, last order on day i,
    // each order worth (i+1)*10 — all three metrics increase with i
    val orders = (0 until 8).flatMap { i =>
      (0 to i).map(j => (i.toLong, ts(i - j), (i + 1) * 10.0))
    }.toDF("o_custkey", "o_orderdate", "o_totalprice")
    val got = Analytics.rfmSegments(orders, "o_custkey", "o_orderdate",
      "o_totalprice").collect()
      .map(r => r.getAs[Long]("o_custkey") -> r).toMap
    // customer 7: most recent (recency 0 -> bucket 0 -> r=4), highest
    // f and m (bucket 3 -> score 4) -> segment 444
    assert(got(7L).getAs[Long]("segment") === 444L)
    assert(got(7L).getAs[Long]("recency_days") === 0L)
    // customer 0: oldest single cheap order -> r=1? recency_days = 7
    // (ranked last ascending -> bucket 3 -> r = 1), f and m lowest
    assert(got(0L).getAs[Long]("segment") === 111L)
    // monotonicity: segments never decrease with i
    val segs = (0 until 8).map(i => got(i.toLong).getAs[Long]("segment"))
    assert(segs.sliding(2).forall(w => w(0) <= w(1)))
  }

  test("sortedNeighborhood: exactly the rank-window pairs, tie-stable") {
    // values with ties; ids break ties deterministically
    val rows = Seq((10L, 5.0), (11L, 5.0), (12L, 7.0), (13L, 1.0),
      (14L, 9.0), (15L, 7.0)).toDF("id", "v")
    val got = FuzzyJoin.sortedNeighborhood(rows, "id", col("v"), window = 2)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("rank_dist")))
    // sort order by (v, id): 13(1) 10(5) 11(5) 12(7) 15(7) 14(9)
    val order = Seq(13L, 10L, 11L, 12L, 15L, 14L)
    val expected = (for {
      i <- order.indices; j <- i + 1 until math.min(i + 3, order.size)
    } yield (order(i), order(j), (j - i).toLong)).toSet
    assert(got.toSet === expected)
    assert(got.length === expected.size)
  }

  test("lorenzDeciles: perfect equality gives linear cumulative shares") {
    def tsO(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-${i % 28 + 1}%02d 00:00:00")
    val eq = (0 until 100).map(i => (i.toLong, tsO(i), 10.0))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val got = Analytics.lorenzDeciles(eq, "o_custkey", "o_totalprice")
      .collect()
    assert(got.length === 10)
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("n_keys") === 10L)
      assert(r.getAs[Long]("cum_share_ppm") === (i + 1) * 100000L)
    }
  }

  test("priceVolumeMix: pure price and pure volume changes decompose cleanly") {
    def ts(d: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusDays(d.toLong))
    // part 1: price 2.00 -> 3.00 at constant volume 10 (pure price +10.00)
    // part 2: price 5.00 constant, volume 10 -> 14 (pure volume +20.00)
    // part 3: only period 2 (new, mass 7.00)
    val rows = Seq(
      (1L, ts(0), 20.0, 10.0), (1L, ts(400), 30.0, 10.0),
      (2L, ts(0), 50.0, 10.0), (2L, ts(400), 70.0, 14.0),
      (3L, ts(400), 7.0, 1.0))
      .toDF("l_partkey", "l_shipdate", "l_extendedprice", "l_quantity")
    val r = Analytics.priceVolumeMix(rows, "l_partkey", "l_shipdate",
      "l_extendedprice", "l_quantity", splitDays = 365).head()
    assert(r.getAs[Long]("n_matched") === 2L && r.getAs[Long]("n_new") === 1L)
    assert(r.getAs[Long]("price_effect_milli") === 1000L * 1000L) // +10.00
    assert(r.getAs[Long]("volume_effect_milli") === 2000L * 1000L) // +20.00
    assert(r.getAs[Long]("mix_effect_milli") === 0L)
    assert(r.getAs[Long]("new_mass_cents") === 700L)
    assert(r.getAs[Long]("resid_milli") === 0L) // exact decomposition here
  }

  test("dupRateBySlice: per-feed duplicate mass") {
    val docs = Seq(("s1", "a"), ("s1", "a"), ("s1", "b"),
      ("s2", "c"), ("s2", "d")).toDF("source", "text")
    val got = Dedup.dupRateBySlice(docs, "source", "text").collect()
      .map(r => r.getAs[String]("slice") -> r).toMap
    assert(got("s1").getAs[Long]("n_dup_docs") === 1L)
    assert(got("s1").getAs[Long]("dup_ppm") === 333333L)
    assert(got("s2").getAs[Long]("n_dup_docs") === 0L)
  }

  test("goldenRecord: field-level survivorship with deterministic mode") {
    val docs = Seq(
      (1L, 10, "x"), (2L, 25, "y"), (3L, 15, "y"), // cluster A
      (9L, 7, "z"))                                 // singleton
      .toDF("doc_id", "len", "cat")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("id", "cluster_id")
    val got = Dedup.goldenRecord(docs, "doc_id", "len", "cat",
      labels, "id", "cluster_id").collect()
      .map(r => r.getAs[Long]("cluster_id") -> r).toMap
    val a = got(1L)
    assert(a.getAs[Long]("rep_id") === 1L)
    assert(a.getAs[Long]("n_docs") === 3L)
    assert(a.getAs[Int]("max_len") === 25)
    assert(a.getAs[String]("mode_cat") === "y") // 2 votes beat 1
    val s = got(9L)
    assert(s.getAs[Long]("n_docs") === 1L && s.getAs[String]("mode_cat") === "z")
  }

  test("clusterDownweight: singletons always survive; big clusters thin") {
    // cluster A: ids 0..99 in one cluster; singletons 1000..1019
    val docs = ((0L until 100L) ++ (1000L until 1020L))
      .map(Tuple1(_)).toDF("doc_id")
    val labels = (0L until 100L).map(i => (i, 0L)).toDF("id", "cluster_id")
    val kept = Dedup.clusterDownweight(docs, "doc_id", labels, "id",
      "cluster_id").collect()
    val keptSingles = kept.filter(_.getAs[Long]("cluster_size") == 1L)
    assert(keptSingles.length === 20) // every singleton kept
    val keptBig = kept.filter(_.getAs[Long]("cluster_size") == 100L)
    // expected ~1 of 100; the deterministic draw keeps few
    assert(keptBig.length <= 5)
    // deterministic: second run identical
    val again = Dedup.clusterDownweight(docs, "doc_id", labels, "id",
      "cluster_id").collect()
    assert(kept.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }
}
