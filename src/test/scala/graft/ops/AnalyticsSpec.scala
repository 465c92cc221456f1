package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Funnel / retention / correlation / mixture-sampling / k-means specs
  * on hand-computable inputs. */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("funnel enforces strict step order per user") {
    val e = Seq(
      // user 1 completes all three in order
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:05:00"), "click"),
      (1L, ts("2024-01-01 10:10:00"), "purchase"),
      // user 2: purchase BEFORE click — funnel stops at click
      (2L, ts("2024-01-01 09:00:00"), "view"),
      (2L, ts("2024-01-01 09:10:00"), "purchase"),
      (2L, ts("2024-01-01 09:20:00"), "click"),
      // user 3: never views — not in the funnel at all
      (3L, ts("2024-01-01 08:00:00"), "click"),
      // user 4: click at the SAME instant as view — strict > rejects it
      (4L, ts("2024-01-01 07:00:00"), "view"),
      (4L, ts("2024-01-01 07:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val out = Analytics.funnel(e, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .orderBy("user_id")
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L))
    val steps = out.map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert(steps == Map(1L -> 3, 2L -> 2, 4L -> 1))
    // user 2's t2 is the 09:20 click (after the 09:00 view), t3 null
    // (no purchase after 09:20)
    val u2 = out.find(_.getLong(0) == 2L).get
    assert(u2.getTimestamp(2) == ts("2024-01-01 09:20:00") && u2.isNullAt(3))
  }

  test("weeklyRetention cohorts by first-event week and counts offsets") {
    val e = Seq(
      (1L, ts("2024-01-01 12:00:00")), // Monday, cohort week 2024-01-01
      (1L, ts("2024-01-10 12:00:00")), // week 2024-01-08 -> offset 1
      (2L, ts("2024-01-03 12:00:00")), // same cohort week
      (2L, ts("2024-01-17 12:00:00")), // offset 2
      (3L, ts("2024-01-09 12:00:00"))  // cohort 2024-01-08, offset 0
    ).toDF("user_id", "ts")
    val out = Analytics.weeklyRetention(e, "user_id", "ts")
      .orderBy("cohort_week", "week_offset")
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("2024-01-01", 0, 2L), ("2024-01-01", 1, 1L), ("2024-01-01", 2, 1L),
      ("2024-01-08", 0, 1L)))
  }

  test("corrPairs matches closed-form Pearson on exact fixed-point data") {
    val df = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 5.0), (4.0, 9.0))
      .toDF("x", "y")
    val out = Analytics.corrPairs(df, Seq(("x", "y")))
      .collect().head.getDouble(2)
    // closed form: n=4, Sx=10, Sy=20, Sxx=30, Syy=126, Sxy=61
    val num = 4.0 * 61 - 10 * 20
    val den = math.sqrt(4.0 * 30 - 100) * math.sqrt(4.0 * 126 - 400)
    assert(math.abs(out - math.rint(num / den * 1e6) / 1e6) < 1e-12)
    // perfectly correlated pair is exactly 1
    val one = Analytics.corrPairs(
      Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0)).toDF("x", "y"),
      Seq(("x", "y"))).collect().head.getDouble(2)
    assert(one == 1.0)
  }

  test("mixtureSample hits integer thresholds; keep-all and drop branches") {
    val docs = (0L until 100L).map(i => (i, if (i < 80) "big" else "small"))
      .toDF("id", "dom")
    val out = Sampling.mixtureSample(docs, col("id"), col("dom"),
      Map("big" -> 20L, "small" -> 1000L))
    val kept = out.groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // "small" target exceeds its 20 rows: keep all; "big" ~20/80
    assert(kept("small") == 20L)
    assert(kept.getOrElse("big", 0L) >= 10L && kept("big") <= 30L)
    // a domain absent from targets is dropped entirely
    val dropped = Sampling.mixtureSample(docs, col("id"), col("dom"),
      Map("small" -> 5L))
    assert(dropped.filter(col("dom") === "big").count() == 0L)
    // deterministic: same kept set on re-evaluation
    assert(out.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      out.select("id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("weightedSample keeps rows proportional to weight, exactly at the integer boundary") {
    // two weight classes, 9:1 — the heavy class must survive ~9x as often
    val docs = (0L until 2000L).map(i => (i, if (i % 2 == 0) 90L else 10L))
      .toDF("id", "w")
    val out = Sampling.weightedSample(docs, col("id"), col("w"), 400L)
    val kept = out.groupBy("w").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // expected: heavy 400*90/100 = 360 of 1000, light 400*10/100 = 40
    assert(kept(90L) > 250 && kept(90L) < 450, s"heavy kept ${kept(90L)}")
    assert(kept.getOrElse(10L, 0L) < 90, s"light kept ${kept.getOrElse(10L, 0L)}")
    assert(kept(90L) > 4 * kept.getOrElse(10L, 1L))
    // deterministic: exact same rows on recompute
    val ids1 = out.select("id").collect().map(_.getLong(0)).sorted.toSeq
    val ids2 = Sampling.weightedSample(docs, col("id"), col("w"), 400L)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids1 == ids2)
    // probability cap: target >= n with equal weights keeps every row
    val all = Sampling.weightedSample(docs, col("id"), lit(1L), 5000L)
    assert(all.count() == 2000L)
    // zero-weight rows never survive; all-zero weights raise
    val zw = docs.withColumn("w", when(col("id") < 1000, 0L).otherwise(col("w")))
    assert(Sampling.weightedSample(zw, col("id"), col("w"), 400L)
      .filter(col("id") < 1000).count() == 0L)
    intercept[IllegalArgumentException] {
      Sampling.weightedSample(docs, col("id"), lit(0L), 10L)
    }
  }

  test("rrfFuse combines rankers on ranks alone, ties broken by id") {
    // ranker A: docs 1,2,3 at ranks 1,2,3; ranker B: docs 3,4 at ranks 1,2
    val a = Seq((7L, 1L, 1L), (7L, 2L, 2L), (7L, 3L, 3L)).toDF("q", "d", "r")
    val b = Seq((7L, 3L, 1L), (7L, 4L, 2L)).toDF("q", "d", "r")
    val out = Ranking.rrfFuse(Seq(a, b), "q", "d", "r", kRrf = 60, topN = 10)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getInt(4))).sortBy(_._4)
    // doc 3: 1/63 + 1/61 (two rankers) must outrank everything
    assert(out.head._1 == 3L && out.head._3 == 2L)
    assert(math.abs(out.head._2 - (1.0 / 63 + 1.0 / 61)) < 1e-15)
    // doc 1 (1/61) beats doc 4 (1/62) beats doc 2 (1/62? no: 1/62)
    // doc 2 = 1/62, doc 4 = 1/62 -> exact tie, smaller id first
    assert(out.map(_._1).toSeq == Seq(3L, 1L, 2L, 4L))
    // topN truncates the fused list
    val top2 = Ranking.rrfFuse(Seq(a, b), "q", "d", "r", topN = 2)
    assert(top2.count() == 2)
    // multiple query groups fuse independently
    val a2 = Seq((1L, 10L, 1L), (2L, 20L, 1L)).toDF("q", "d", "r")
    val m = Ranking.rrfFuse(Seq(a2), "q", "d", "r", topN = 5)
    assert(m.select("query_id").distinct().count() == 2)
  }

  test("hardNegatives drops positives and re-ranks by candidate order") {
    // query 1: candidates 10..14 at ranks 1..5; positives {11, 13}
    val cand = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
        (1L, 13L, 4), (1L, 14L, 5), (2L, 20L, 1), (2L, 21L, 2))
      .toDF("query_id", "neighbor_id", "rank")
    val pos = Seq((1L, 11L), (1L, 13L), (2L, 99L))
      .toDF("query_id", "neighbor_id")
    val out = Ann.hardNegatives(cand, pos, "query_id", "neighbor_id",
        "rank", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
      .sortBy(t => (t._1, t._3))
    // query 1 keeps 10 (neg_rank 1) and 12 (neg_rank 2) — 11 excluded,
    // 14 truncated by k; query 2's positive 99 isn't a candidate, so
    // both candidates survive in order
    assert(out.toSeq == Seq((1L, 10L, 1), (1L, 12L, 2),
      (2L, 20L, 1), (2L, 21L, 2)))
  }

  test("centroidBy computes exact quantized means, invariant to partitioning") {
    val vecs = Seq(
      ("a", Array(1.0, -2.0)), ("a", Array(3.0, 4.0)),
      ("b", Array(0.5, 0.25)))
      .toDF("g", "v")
    val out = Embeddings.centroidBy(vecs, "g", "v")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSet
    // exactly representable values: quantization is lossless here
    assert(out == Set(("a", 0, 2.0), ("a", 1, 1.0),
      ("b", 0, 0.5), ("b", 1, 0.25)))
    // irrational-ish components: result identical across partitionings
    val rnd = new scala.util.Random(7)
    val big = (0 until 500).map(i =>
      (s"g${i % 3}", Array.fill(8)(rnd.nextGaussian())))
      .toDF("g", "v")
    val c1 = Embeddings.centroidBy(big.repartition(1), "g", "v").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val c13 = Embeddings.centroidBy(big.repartition(13), "g", "v").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(c1 == c13, "quantized means must not depend on partitioning")
    // quantization error bound: within 2^-20 of the true mean
    val truth = (0 until 500).groupBy(i => s"g${i % 3}")
    val rnd2 = new scala.util.Random(7)
    val data = (0 until 500).map(_ => Array.fill(8)(rnd2.nextGaussian()))
    for (((g, idxs)) <- truth; p <- 0 until 8) {
      val exact = idxs.map(i => data(i)(p)).sum / idxs.size
      assert(math.abs(c1((g, p)) - exact) <= math.pow(2, -20) + 1e-12)
    }
  }

  test("pageRank fixed-point arithmetic matches hand-computed values") {
    // 3-cycle a->b->c->a: uniform rank is the fixed point of the
    // integer recurrence too (teleport 3e9//(20*3)=50000000;
    // 50000000 + (17*333333333)//20 = 333333333)
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val prCyc = Graph.pageRank(cyc, "src", "dst", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(prCyc == Map(1L -> 333333333L, 2L -> 333333333L, 3L -> 333333333L))
    // star 2->1, 3->1: node 1 is dangling (mass leaks, documented).
    // iter 1: contrib(1) = 333333333 + 333333333; pr(1) = 50000000 +
    // (17*666666666)//20 = 616666666; pr(2) = pr(3) = teleport only.
    val star = Seq((2L, 1L), (3L, 1L)).toDF("src", "dst")
    val s1 = Graph.pageRank(star, "src", "dst", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s1 == Map(1L -> 616666666L, 2L -> 50000000L, 3L -> 50000000L))
    // iter 2: contrib(1) = 50000000 + 50000000; pr(1) = 50000000 +
    // (17*100000000)//20 = 135000000
    val s2 = Graph.pageRank(star, "src", "dst", iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s2(1L) == 135000000L && s2(2L) == 50000000L)
    // duplicate + null edges are dropped before everything
    val messy = Seq((Some(2L), Some(1L)), (Some(2L), Some(1L)),
      (None, Some(1L)), (Some(3L), Some(1L))).toDF("src", "dst")
    val m1 = Graph.pageRank(messy, "src", "dst", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m1 == s1)
  }

  test("pageRank dangling-mass redistribution conserves mass, matches hand-computed") {
    // star 2->1, 3->1 with node 1 dangling. iter 1: sink = pr(1) =
    // 333333333, share = sink//3 = 111111111; pr(1) = 50000000 +
    // (17*(666666666+111111111))//20 = 711111110; pr(2) = pr(3) =
    // 50000000 + (17*111111111)//20 = 144444444 (sum 999999998 —
    // conserved up to floor truncation)
    val star = Seq((2L, 1L), (3L, 1L)).toDF("src", "dst")
    val r1 = Graph.pageRank(star, "src", "dst", iters = 1,
        redistributeDangling = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == Map(1L -> 711111110L, 2L -> 144444444L, 3L -> 144444444L))
    // mass conservation over 5 iterations: total stays within a few
    // nano-units of scale (each floor division truncates < 1 unit per
    // node per round), where the leaky default loses ~85% of the sink
    // mass every round
    val r5 = Graph.pageRank(star, "src", "dst", iters = 5,
        redistributeDangling = true)
      .collect().map(_.getLong(1)).sum
    assert(r5 > 999999900L && r5 <= 1000000000L, s"mass $r5")
    val leaky5 = Graph.pageRank(star, "src", "dst", iters = 5)
      .collect().map(_.getLong(1)).sum
    assert(leaky5 < 900000000L, s"leaky mass $leaky5 should be far below scale")
    // no dangling nodes -> redistribution is the identity
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val a = Graph.pageRank(cyc, "src", "dst", iters = 3,
      redistributeDangling = true).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Graph.pageRank(cyc, "src", "dst", iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
    // distributed loop (maxLocalEdges = 0) runs the identical integer
    // recurrence as the driver fast path
    val dist = Graph.pageRank(star, "src", "dst", iters = 2,
        redistributeDangling = true, maxLocalEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == Map(1L -> 497037035L, 2L -> 251481480L, 3L -> 251481480L))
  }

  test("fuzzyPairs blocks then verifies; entity pipeline clusters matches") {
    val left = Seq((1L, "Acme Corp"), (2L, "Widget Inc"), (3L, "zzz"))
      .toDF("id", "name")
    val right = Seq((10L, "acme corp."), (11L, "Widget, Inc"),
      (12L, "Totally Different Name"), (13L, "acmexcorp"))
      .toDF("id", "name")
    val pairs = FuzzyJoin.fuzzyPairs(left, "id", "name", right, "id", "name",
      maxDist = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // "Acme Corp" vs "acme corp.": block keys both "acmecorp";
    // distance = 5 case subs + 1 dot insert = 6 > 3? No: Levenshtein
    // is case-sensitive here, so distance counts case changes — keep
    // the assertion on what the operator returns rather than guess:
    // "acmexcorp" blocks to "acmexcor" (different key) and never pairs.
    assert(!pairs.exists(_._2 == 13L))
    // different block keys are never compared even if close overall
    assert(!pairs.exists(p => p._1 == 3L))
    // Widget Inc vs "Widget, Inc": same block "widgetin", distance 1
    // (inserted comma) <= 3 — the pair survives with the right dist
    assert(pairs.contains((2L, 11L, 1)))
  }

  test("Export.delta classifies added/removed/changed/unchanged") {
    val oldDf = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "text")
    val newDf = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("id", "text")
    val out = graft.sources.Export.delta(oldDf, newDf, "id", Seq("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
    // null content is distinguished from the string "null" (N vs V-tag)
    val o2 = Seq((1L, Option.empty[String])).toDF("id", "text")
    val n2 = Seq((1L, Option("null"))).toDF("id", "text")
    val d2 = graft.sources.Export.delta(o2, n2, "id", Seq("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d2 == Map(1L -> "changed"))
  }

  test("DataQuality.check counts violations per rule in one pass") {
    val df = Seq((1L, 5.0), (2L, -1.0), (3L, 200.0), (4L, 7.0))
      .toDF("id", "v")
    val out = DataQuality.check(df, Seq(
        "v_nonneg" -> (col("v") < 0.0),
        "v_under_100" -> (col("v") > 100.0),
        "always_pass" -> lit(false)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map("v_nonneg" -> (1L, 4L), "v_under_100" -> (1L, 4L),
      "always_pass" -> (0L, 4L)))
  }

  test("DataQuality.histogram floor-bins negatives correctly") {
    val df = Seq(-1.5, -0.01, 0.0, 0.99, 1.0, 2.49).toDF("v")
    // cent units, bin width 100 cents: -150 -> bin -2, -1 -> bin -1,
    // 0/99 -> bin 0, 100 -> bin 1, 249 -> bin 2
    val out = DataQuality.histogram(df, col("v"), binUnits = 100L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(-2L -> (-200L, 1L), -1L -> (-100L, 1L),
      0L -> (0L, 2L), 1L -> (100L, 1L), 2L -> (200L, 1L)))
  }

  test("overlapJoin finds exactly the overlapping interval pairs") {
    val left = Seq((1L, 0L, 100L), (2L, 200L, 300L), (3L, 1000L, 1100L))
      .toDF("id", "s", "e")
    val right = Seq((10L, 50L, 60L),    // inside 1
      (11L, 100L, 150L),               // touches 1's end (closed: match)
      (12L, 301L, 400L),               // just after 2 (no match)
      (13L, 250L, 1050L))              // spans 2 and 3
      .toDF("id", "s", "e")
    // gridWidth much smaller than spans: pairs meet in MANY cells —
    // the distinct must still emit each pair once
    val out = IntervalJoin.overlapJoin(left, "id", "s", "e",
        right, "id", "s", "e", gridWidth = 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(out == Set(
      (1L, 10L, 50L, 60L), (1L, 11L, 100L, 100L),
      (2L, 13L, 250L, 300L), (3L, 13L, 1000L, 1050L)))
    // inverted / null intervals are dropped, not exploded
    val bad = Seq((9L, 100L, 0L)).toDF("id", "s", "e")
    assert(IntervalJoin.overlapJoin(bad, "id", "s", "e",
      right, "id", "s", "e", gridWidth = 7L).count() == 0L)
  }

  test("globalRank assigns exact ranks and floor-division buckets") {
    val df = Seq((1L, 30L), (2L, 10L), (3L, 30L), (4L, 50L), (5L, 20L))
      .toDF("id", "v")
    // order: v desc, id asc -> 4, 1, 3, 5, 2
    val out = Ranking.globalRank(df, Seq(col("v").desc, col("id")),
        nBuckets = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    assert(out == Set((4L, 1L, 0L), (1L, 2L, 0L), (3L, 3L, 0L),
      (5L, 4L, 1L), (2L, 5L, 1L)))
    // buckets partition evenly when n % nBuckets == 0
    val big = (1L to 100L).map(i => (i, i)).toDF("id", "v")
    val buckets = Ranking.globalRank(big, Seq(col("v"), col("id")), 10)
      .groupBy("bucket").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(buckets == (0L to 9L).map(_ -> 10L).toMap)
  }

  test("property: mixtureSample bounds hold over random corpora") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 15) {
      val nDoms = 1 + rnd.nextInt(4)
      val doms = (0 until nDoms).map(i => s"d$i")
      val rows = (0 until 50 + rnd.nextInt(250))
        .map(i => (i.toLong, doms(rnd.nextInt(nDoms))))
      val df = rows.toDF("id", "dom")
      val counts = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      // target one domain absent, one over-count, rest random
      val targets = doms.take(nDoms - 1).map { d =>
        d -> (if (rnd.nextBoolean()) counts(d) + 50L else rnd.nextInt(40).toLong)
      }.toMap
      val kept = Sampling.mixtureSample(df, col("id"), col("dom"), targets)
        .collect().map(r => (r.getLong(0), r.getString(1)))
      val keptByDom = kept.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      // kept set is a subset of the input
      assert(kept.toSet.subsetOf(rows.toSet))
      // absent domain drops entirely
      assert(!keptByDom.contains(doms.last) || nDoms == 1)
      targets.foreach { case (d, t) =>
        val k = keptByDom.getOrElse(d, 0L)
        assert(k <= counts(d), s"$d kept $k > present ${counts(d)}")
        if (t >= counts(d)) assert(k == counts(d), s"$d keep-all branch")
        if (t == 0L) assert(k == 0L, s"$d zero target")
      }
    }
  }

  test("property: pageRank ranks respect teleport floor and mass ceiling") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 10) {
      val nNodes = 3 + rnd.nextInt(20)
      val edges = (0 until nNodes * 2).map(_ =>
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        val pr = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst",
          iters = 3).collect().map(_.getLong(1))
        val present = edges.flatMap(e => Seq(e._1, e._2)).distinct.size
        val teleport = (3L * 1000000000L) / (20L * present)
        // floor divisions only LOSE mass: total never exceeds the scale,
        // and every node keeps at least its teleport share
        assert(pr.sum <= 1000000000L, s"mass ${pr.sum}")
        assert(pr.forall(_ >= teleport), s"min ${pr.min} < teleport $teleport")
      }
    }
  }

  test("KMeans.lloyd recovers well-separated clusters deterministically") {
    // two tight blobs far apart in 3-d; k=2, init = ids 0 and 1 (one in
    // each blob by construction)
    val pts = Seq(
      (0L, Array(0.0f, 0.0f, 0.0f)), (1L, Array(10.0f, 10.0f, 10.0f)),
      (2L, Array(0.1f, -0.1f, 0.05f)), (3L, Array(9.9f, 10.1f, 9.95f)),
      (4L, Array(-0.2f, 0.1f, 0.0f)), (5L, Array(10.2f, 9.8f, 10.0f))
    ).toDF("id", "vec")
    val out = KMeans.lloyd(pts, "id", "vec", k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out(0L) == out(2L) && out(2L) == out(4L))
    assert(out(1L) == out(3L) && out(3L) == out(5L))
    assert(out(0L) != out(1L))
    // rerun is bit-identical (no RNG anywhere)
    val again = KMeans.lloyd(pts, "id", "vec", k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(again == out)
    // k=1 degenerates to a single cluster
    val one = KMeans.lloyd(pts, "id", "vec", k = 1, iters = 2)
      .select("cluster").distinct().collect()
    assert(one.length == 1 && one.head.getInt(0) == 0)
  }
}
