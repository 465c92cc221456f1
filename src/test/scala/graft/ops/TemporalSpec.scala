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

  test("kCore peels below-k nodes; driver and distributed paths agree") {
    // K5 (deg 4 inside) + a pendant chain 5-6-7: at k=3 the chain peels
    // over two rounds and K5 survives with in-core degree 4
    val k5 = for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j)
    val e = (k5 ++ Seq((5L, 6L), (6L, 7L))).toDF("src", "dst")
    val local = Graph.kCore(e, "src", "dst", k = 3, rounds = 4)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(local.toSeq == (1L to 5L).map((_, 4L)))
    val dist = Graph.kCore(e, "src", "dst", k = 3, rounds = 4,
        maxLocalEdges = 0)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(dist.toSeq == local.toSeq)
  }

  test("kCore at the declared query parameters has converged (fixpoint)") {
    // q_kcore ships rounds = 16; prove the result is the true k-core at
    // verification scale by checking one fewer round changes nothing
    val pe = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .filter(col("l_orderkey") < 3000)
      .select(col("l_orderkey").as("ok"), (col("l_partkey") % 997).as("p"))
      .distinct()
    val edges = pe.select(col("ok"), col("p").as("src"))
      .join(pe.select(col("ok"), col("p").as("dst")), "ok")
      .filter(col("src") < col("dst"))
    def run(r: Int) = Graph.kCore(edges, "src", "dst", k = 30, rounds = r)
      .orderBy("id").collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(run(15) == run(16))
  }

  test("kCoreConverged returns the true core where the fixed-round default truncates") {
    // planted deep-peel graph: a 20-node path (peel depth 10 — two
    // endpoints dissolve per round) plus a disjoint triangle (a real
    // 2-core). kCore's default rounds = 6 leaves un-peeled path middle
    // nodes behind; the fixpoint mode returns exactly the triangle.
    val path = (0L until 19L).map(i => (i, i + 1))
    val tri = Seq((100L, 101L), (101L, 102L), (100L, 102L))
    val e = (path ++ tri).toDF("src", "dst")
    val truncated = Graph.kCore(e, "src", "dst", k = 2)
      .orderBy("id").collect().map(_.getLong(0))
    assert(truncated.exists(_ < 100L),
      "fixed 6-round default must still contain un-peeled path nodes " +
        "for this spec to be meaningful")
    val expected = Seq((100L, 2L), (101L, 2L), (102L, 2L))
    val conv = Graph.kCoreConverged(e, "src", "dst", k = 2)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(conv.toSeq == expected, conv.mkString(","))
    // distributed loop (count-gate convergence) agrees with the driver path
    val dist = Graph.kCoreConverged(e, "src", "dst", k = 2, maxLocalEdges = 0)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(dist.toSeq == expected, dist.mkString(","))
    // a graph whose core is empty converges to the empty frame
    assert(Graph.kCoreConverged(path.toDF("src", "dst"), "src", "dst",
      k = 2).count() == 0)
  }

  test("cusum finds the level-shift point across bucket boundaries") {
    // 6 obs: value 1.00 for the first three, 5.00 after — the centered
    // deviation |n*S_k - k*S_n| peaks at the change point k=3
    // (S_n = 1800 cents, n = 6): |6*300 - 3*1800| = 3600
    val e = (1 to 6).map { i =>
      ("a", ts(f"2024-01-01 0$i:30:00"), i.toLong,
        if (i <= 3) 1.00 else 5.00)
    }.toDF("k", "ts", "id", "value")
    val out = Drift.cusum(e, "k", "ts", "id", col("value")).collect()(0)
    assert((out.getString(0), out.getLong(1), out.getLong(2),
      out.getTimestamp(3)) ==
      (("a", 6L, 3600L, ts("2024-01-01 03:30:00"))))
  }

  test("timeWeightedAvg weights each value by its holding duration") {
    val e = Seq(
      // 1.00 held 2h, then 4.00 held 1h -> twap = (1*2 + 4*1)/3 = 2.0
      (1L, ts("2024-01-01 00:00:00"), 1L, 1.00),
      (1L, ts("2024-01-01 02:00:00"), 2L, 4.00),
      (1L, ts("2024-01-01 03:00:00"), 3L, 9.99), // final obs: no period
      (2L, ts("2024-01-01 00:00:00"), 4L, 7.00)  // single obs: dropped
    ).toDF("u", "ts", "id", "value")
    val out = Temporal.timeWeightedAvg(e, "u", "ts", "id", col("value"))
      .collect()
    assert(out.length == 1)
    val r = out(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)) ==
      ((1L, 2L, 3L * 3600L * 1000000L, 2.0)))
  }

  test("streaming CDC upsert via foreachBatch equals the batch merge") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = Seq((1L, "one", 10.0), (2L, "two", 20.0))
      .toDF("k", "name", "bal").localCheckpoint(true)
    val input = MemoryStream[(Long, String, Long, String, Double)]
    // snapshot evolves per micro-batch; in-order per-key delivery is
    // the streaming CDC precondition (documented on cdcApply)
    var snapshot = base
    val q = input.toDF().toDF("k", "op", "seq", "name", "bal").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        snapshot = Temporal.cdcApply(snapshot, batch, "k", "op",
          Seq(col("seq")), Seq("name", "bal")).localCheckpoint(true)
        ()
      }
      .start()
    input.addData((1L, "U", 1L, "one-v2", 11.0), (3L, "I", 2L, "three", 30.0))
    q.processAllAvailable()
    input.addData((2L, "D", 3L, "x", 0.0), (1L, "U", 4L, "one-v3", 12.0))
    q.processAllAvailable()
    q.stop()
    val got = snapshot.orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val allChanges = Seq(
      (1L, "U", 1L, "one-v2", 11.0), (3L, "I", 2L, "three", 30.0),
      (2L, "D", 3L, "x", 0.0), (1L, "U", 4L, "one-v3", 12.0)
    ).toDF("k", "op", "seq", "name", "bal")
    val batchMerge = Temporal.cdcApply(base, allChanges, "k", "op",
        Seq(col("seq")), Seq("name", "bal"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq == batchMerge.toSeq)
    assert(got.toSeq == Seq((1L, "one-v3", 12.0), (3L, "three", 30.0)))
  }

  test("prefixJaccardPairs equals brute-force all-pairs at the threshold") {
    val docs = Seq(
      (1L, "aa bb cc dd ee ff gg hh"),
      (2L, "aa bb cc dd ee ff gg"),   // near-dup of 1
      (3L, "zz yy xx ww vv uu tt"),   // unrelated
      (4L, "aa bb cc zz yy xx ww vv") // partial overlap, below threshold
    ).toDF("doc_id", "text")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(6,
          BigDecimal.RoundingMode.HALF_UP))).toSet
    val brute = norm(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5))
    val pref = norm(Dedup.prefixJaccardPairs(docs, "doc_id", "text", 0.5))
    assert(pref == brute && brute.nonEmpty)
  }

  test("nearestJoin picks min |dt| with ties to the earlier right row") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 23:00:00")),
      (3L, 20L, ts("2024-01-01 05:00:00")) // key with no right rows
    ).toDF("id", "k", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 09:00:00"), 1.0), // 1h before left 1
      (10L, ts("2024-01-01 11:00:00"), 2.0)  // 1h after: TIE -> earlier
    ).toDF("k", "ts", "v")
      .select(col("k"), col("ts"), col("ts").as("rt"), col("v"))
    val out = AsofJoin.nearestJoin(left, right, "k", "ts", Seq("rt", "v"))
      .orderBy("id").collect()
    assert(out(0).getTimestamp(3) == ts("2024-01-01 09:00:00")
      && out(0).getDouble(4) == 1.0
      && out(0).getLong(5) == 3600L * 1000000L)
    // left 2: only earlier rows exist; nearest is 11:00 (12h away)
    assert(out(1).getTimestamp(3) == ts("2024-01-01 11:00:00")
      && out(1).getLong(5) == 12L * 3600L * 1000000L)
    assert(out(2).isNullAt(3) && out(2).isNullAt(5))
  }

  test("periodOverPeriod joins the previous calendar period, gap-safe") {
    val e = Seq(
      ("a", ts("2024-01-01 10:00:00"), 1.00), // week 1
      ("a", ts("2024-01-02 10:00:00"), 2.00), // week 1
      ("a", ts("2024-01-08 10:00:00"), 6.00), // week 2
      ("a", ts("2024-01-22 10:00:00"), 9.00)  // week 4: gap -> null prev
    ).toDF("t", "ts", "value")
    val out = Analytics.periodOverPeriod(e, "t", "ts", col("value"))
      .orderBy("period").collect()
      .map(r => (r.getTimestamp(1).toString.take(10), r.getLong(2),
        Option(if (r.isNullAt(4)) null else r.getLong(4)),
        Option(if (r.isNullAt(6)) null else r.getDouble(6))))
    assert(out.toSeq == Seq(
      ("2024-01-01", 2L, None, None),
      ("2024-01-08", 1L, Some(2L), Some(-0.5)),
      ("2024-01-22", 1L, None, None))) // week 3 missing: NOT compared to week 2
  }

  test("exactByGroup interpolates per-group percentiles") {
    val df = (Seq(1.0, 2.0, 3.0, 4.0).map(("a", _)) ++ Seq(10.0).map(("b", _)))
      .toDF("g", "v")
    val out = Quantiles.exactByGroup(df, "g", "v", Seq(0.5, 1.0))
      .orderBy("g", "q").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(out.toSeq == Seq(("a", 0.5, 2.5), ("a", 1.0, 4.0),
      ("b", 0.5, 10.0), ("b", 1.0, 10.0)))
  }

  test("exactByGroupScale matches exactByGroup without buffering values") {
    // ties, duplicates, and a 0/1-probability edge per group
    val df = (Seq(1.0, 2.0, 2.0, 3.0, 4.0, 4.0, 4.0).map(("a", _)) ++
      Seq(10.0, 20.0).map(("b", _)) ++ Seq(7.0).map(("c", _)))
      .toDF("g", "v")
    val probs = Seq(0.0, 0.25, 0.5, 0.9, 1.0)
    val buf = Quantiles.exactByGroup(df, "g", "v", probs)
      .orderBy("g", "q").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val scale = Quantiles.exactByGroupScale(df, "g", "v", probs)
      .orderBy("g", "q").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(buf.length == scale.length)
    for (((g1, q1, v1), (g2, q2, v2)) <- buf.zip(scale)) {
      assert(g1 == g2 && q1 == q2)
      assert(math.abs(v1 - v2) < 1e-12, s"$g1 q=$q1: buffered=$v1 scale=$v2")
    }
    // the scale path's plan must contain NO value-buffering percentile
    // aggregate — only count/sum aggregates + windows over distinct values
    val plan = Quantiles.exactByGroupScale(df, "g", "v", probs)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("percentile"),
      "scale path must not use the percentile buffer aggregate")
  }

  test("groupedOls recovers per-group closed-form slope/intercept/r2") {
    // group a: perfect line y = 2x + 1 -> slope 2, intercept 1, r2 1
    val a = Seq((1.0, 3.0), (2.0, 5.0), (3.0, 7.0)).map { case (x, y) => ("a", x, y) }
    // group b: y constant would make r2 undefined; use a sloped noisy set
    val b = Seq((1.0, 1.0), (2.0, 3.0), (3.0, 2.0)).map { case (x, y) => ("b", x, y) }
    val out = Analytics.groupedOls((a ++ b).toDF("g", "x", "y"), "g", "x", "y")
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(out(0) == (("a", 2.0, 1.0, 1.0)))
    // group b closed form: slope = 0.5, intercept = 1.0, r2 = 0.25
    assert(out(1) == (("b", 0.5, 1.0, 0.25)))
  }

  test("tableDigest is order- and partitioning-independent") {
    val d1 = Seq((1L, "aa"), (2L, "bb"), (3L, "cc")).toDF("id", "t")
    val d2 = Seq((3L, "cc"), (1L, "aa"), (2L, "bb")).toDF("id", "t")
      .repartition(7)
    def dig(df: org.apache.spark.sql.DataFrame) =
      graft.sources.Export.tableDigest(df, Seq("id", "t"), shards = 4)
        .orderBy("shard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(dig(d1) == dig(d2))
    // a one-row change must move exactly that row's shard digest
    val d3 = Seq((1L, "aa"), (2L, "bb"), (3L, "CHANGED")).toDF("id", "t")
    assert(dig(d1) != dig(d3))
  }

  test("degenerate inputs: empty frames, single rows, constant groups") {
    val emptyLog = Seq.empty[(Long, String, Timestamp, Long)]
      .toDF("k", "attr", "ts", "id")
    assert(Temporal.scd2(emptyLog, "k", "attr", "ts", "id").count() == 0)
    assert(Temporal.gapFill(
      Seq.empty[(Long, Timestamp, Double)].toDF("k", "ts", "value"),
      "k", "ts", col("value")).count() == 0)
    // cdcApply with no changes: base passes through untouched
    val base = Seq((1L, "one", 10.0)).toDF("k", "name", "bal")
    val noChanges = Seq.empty[(Long, String, Long, String, Double)]
      .toDF("k", "op", "seq", "name", "bal")
    val kept = Temporal.cdcApply(base, noChanges, "k", "op",
      Seq(col("seq")), Seq("name", "bal")).collect()
    assert(kept.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      == Seq((1L, "one", 10.0)))
    // transitions with one event per key: no pairs
    val solo = Seq((1L, ts("2024-01-01 00:00:00"), 1L, "a"))
      .toDF("u", "ts", "id", "t")
    assert(Analytics.transitions(solo, "u", "ts", "id", "t").count() == 0)
    // twap: single-observation keys have no holding period
    assert(Temporal.timeWeightedAvg(solo.withColumn("value", lit(5.0)),
      "u", "ts", "id", col("value")).count() == 0)
    // cusum of a single row: centered deviation is exactly zero
    val one = Drift.cusum(solo.withColumn("value", lit(5.0)),
      "t", "ts", "id", col("value")).collect()(0)
    assert(one.getLong(1) == 1L && one.getLong(2) == 0L)
    // triangle-free graph: empty triangle table
    assert(Graph.triangleCount(
      Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"), "src", "dst").count() == 0)
    // kCore on an empty edge set: empty core
    assert(Graph.kCore(
      Seq.empty[(Long, Long)].toDF("src", "dst"), "src", "dst", k = 2)
      .count() == 0)
    // constant-x group: guarded OLS returns nulls, not NaN
    val flat = Seq(("g", 1.0, 2.0), ("g", 1.0, 3.0)).toDF("g", "x", "y")
    val ols = Analytics.groupedOls(flat, "g", "x", "y").collect()(0)
    assert(ols.isNullAt(1) && ols.isNullAt(2) && ols.isNullAt(3))
    // madOutliers on a constant group: MAD 0, zero outliers
    val mo = Analytics.madOutliers(
      Seq(("g", 5.0), ("g", 5.0)).toDF("g", "v"), "g", col("v")).collect()(0)
    assert(mo.getDouble(3) == 0.0 && mo.getLong(4) == 0L)
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

  test("ohlc bars: deterministic open/close, tie at the bucket edge") {
    val rows = Seq(
      // key k, hour bucket 00: open=10.00 (tie on ts broken by id 1<2),
      // high=30.00, low=5.00, close=5.00
      ("k", ts("2024-01-01 00:00:01"), 1L, 10.00),
      ("k", ts("2024-01-01 00:00:01"), 2L, 30.00),
      ("k", ts("2024-01-01 00:30:00"), 3L, 5.00),
      // hour bucket 01: single event
      ("k", ts("2024-01-01 01:59:59"), 4L, 7.25),
      ("j", ts("2024-01-01 00:10:00"), 5L, 2.50)
    ).toDF("k", "ts", "id", "v")
    val out = Temporal.ohlcBars(rows, "k", "ts", "id", col("v"), 3600L)
      .orderBy("k", "bar_start").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6),
        r.getLong(7)))
    assert(out.toSeq == Seq(
      ("j", ts("2024-01-01 00:00:00"), 2.50, 2.50, 2.50, 2.50, 250L, 1L),
      ("k", ts("2024-01-01 00:00:00"), 10.00, 30.00, 5.00, 5.00, 4500L, 3L),
      ("k", ts("2024-01-01 01:00:00"), 7.25, 7.25, 7.25, 7.25, 725L, 1L)))
  }
}
