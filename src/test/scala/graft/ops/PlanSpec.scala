package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Physical-plan quality gates: the properties that matter at 100 TB —
  * column pruning and filter pushdown reaching the parquet scan, small
  * sides broadcast, and no accidental cartesian products — asserted so
  * refactors cannot silently regress them. */
class PlanSpec extends SparkSpec {

  private def scans(df: DataFrame): Seq[FileSourceScanExec] =
    df.queryExecution.sparkPlan.collect { case s: FileSourceScanExec => s }

  test("parquet scans prune columns and push filters down") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .filter(col("l_orderkey") <= 10)
      .select("l_orderkey", "l_quantity")
    val s = scans(li)
    assert(s.nonEmpty, "expected a FileSourceScanExec")
    assert(s.head.requiredSchema.fieldNames.toSet == Set("l_orderkey", "l_quantity"),
      s"pruned schema: ${s.head.requiredSchema.fieldNames.mkString(",")}")
    assert(s.head.metadata("PushedFilters").contains("LessThanOrEqual(l_orderkey,10"),
      s"pushed: ${s.head.metadata("PushedFilters")}")
  }

  test("operator scans read only the columns they use") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // token counting touches (doc_id, text) — lang/source/n_chars must
    // not be read from disk
    val q = docs.select(col("doc_id"),
      TextAnalysis.wsTokenCount(col("text")).as("t"))
    val s = scans(q)
    assert(s.head.requiredSchema.fieldNames.toSet == Set("doc_id", "text"),
      s.head.requiredSchema.fieldNames.mkString(","))
  }

  test("brute-force ANN broadcasts the query side, never the corpus") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = Ann.bruteForceTopK(e, e.filter(col("vec_id") < 5),
      "vec_id", "embedding", k = 3).queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("CartesianProduct"), "corpus must not cross-join")
  }

  test("minhash LSH plans equi-joins only (no cartesian product)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Dedup.minhashLsh(docs, "doc_id", "text",
      bands = 4, rowsPerBand = 3, threshold = 0.6)
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct"), "bucket join must be equi")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "bucket join must be equi")
  }

  test("LSH routing: healthy corpora skip the kernel stage; hot data plans it") {
    // sf0.001 buckets all sit under the routing threshold, so the
    // zero-hot fast path must leave NO MapGroups (kernel) stage and NO
    // routing semi-join in the plan — the healthy plan is the plain
    // band equi-join
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val healthy = Dedup.cosineNearDups(e, "vec_id", "embedding", 0.95)
      .queryExecution.sparkPlan.toString
    assert(!healthy.contains("MapGroups"),
      "healthy corpus must not plan the kernel route")
    assert(!healthy.contains("CartesianProduct"), healthy.take(500))
    // identical vectors force every bucket hot: the kernel route
    // (MapGroups over salted cells) must appear
    import spark.implicits._
    val same = (0 until 9).map(i => (i.toLong, Array.fill(8)(1.0))).toDF("id", "v")
    val hot = Dedup.cosineNearDups(same, "id", "v", 0.9, maxBucketSize = 3)
      .queryExecution.sparkPlan.toString
    assert(hot.contains("MapGroups"), hot.take(500))
  }

  test("hash sampling stays a narrow filter (no shuffle)") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val plan = Sampling.sample(li, col("l_orderkey"), 0.1)
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("Exchange"), s"sampling must not shuffle: ${plan.take(400)}")
  }

  test("rollup plans ONE Expand pass, not per-level self-unions") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val plan = li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
      .queryExecution.sparkPlan.toString
    assert("(?s)Expand".r.findAllIn(plan).size == 1, plan.take(600))
    assert("Union".r.findAllIn(plan).isEmpty, "rollup must not self-union")
  }

  test("grouping sets plan ONE Expand pass; null pattern is one scan") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val plan = li.groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
      .queryExecution.sparkPlan.toString
    assert("(?s)Expand".r.findAllIn(plan).size == 1, plan.take(600))
    assert("Union".r.findAllIn(plan).isEmpty, "grouping sets must not self-union")
    val np = DataQuality.nullPattern(li,
      Seq("l_returnflag", "l_linestatus", "l_tax"))
    assert(scans(np).size == 1, "all pairwise null counts share one scan")
  }

  test("onion overlap and PPR plan equi-joins only, never cartesian") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val onion = Dedup.onionOverlap(d, "doc_id", "text", w = 3, minDf = 2)
      .queryExecution.sparkPlan.toString
    assert(!onion.contains("CartesianProduct") &&
      !onion.contains("BroadcastNestedLoopJoin"), onion.take(600))
    val e = spark.range(50).select(col("id").as("src"),
      ((col("id") + 7) % 50).as("dst"))
    val ppr = Graph.personalizedPageRank(e, "src", "dst", Seq(0L),
      iters = 2, maxLocalEdges = 0L)
    assert(ppr.queryExecution.sparkPlan.toString.contains("") &&
      !ppr.queryExecution.sparkPlan.toString.contains("CartesianProduct"))
  }

  test("corr matrix and DQ sweep are single-scan aggregations") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val corr = Analytics.corrPairs(li,
      Seq(("l_quantity", "l_discount"), ("l_discount", "l_tax")))
    assert(scans(corr).size == 1, "all pairs must share one scan")
    val dq = DataQuality.check(li, Seq(
      "a" -> col("l_quantity").isNull, "b" -> (col("l_tax") > 1.0)))
    assert(scans(dq).size == 1, "all rules must share one scan")
  }

  test("interval join plans a cell equi-join, never a cartesian product") {
    val a = spark.range(10).select(col("id"), (col("id") * 100).as("s"),
      (col("id") * 100 + 50).as("e"))
    val plan = IntervalJoin.overlapJoin(a, "id", "s", "e",
      a, "id", "s", "e", gridWidth = 100L).queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(600))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
  }

  test("fuzzy join is a blocked equi-join, never a cartesian product") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), substring(col("text"), 1, 20).as("k"))
    val plan = FuzzyJoin.fuzzyPairs(docs, "doc_id", "k", docs, "doc_id", "k",
      maxDist = 2).queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(600))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
  }

  test("zValue interleaves bits; z-ordered files cluster 2-d ranges") {
    import graft.sources.Layout
    import spark.implicits._
    // hand-checked interleave: x=0b101, y=0b011 -> z=0b011011 = 27
    val z = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.zValue(Seq(col("x"), col("y")), bits = 3)).head.getLong(0)
    assert(z == 27L, s"zValue(5,3)=$z")
    // locality: the same 2-d rectangle touches fewer files when z-ordered
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val zdir = "/tmp/graft-zorder-test"
    val rdir = "/tmp/graft-roundrobin-test"
    Layout.writeZOrdered(orders, Seq("o_custkey", "o_totalprice"), 8, zdir,
      numFiles = 8)
    orders.repartition(8).write.mode("overwrite").parquet(rdir)
    def filesTouched(path: String): Long =
      spark.read.parquet(path)
        .filter(col("o_custkey") < 20 && col("o_totalprice") < 30000)
        .select(input_file_name()).distinct().count()
    val (zf, rf) = (filesTouched(zdir), filesTouched(rdir))
    assert(zf < rf, s"z-ordered rows in $zf files vs round-robin $rf")
    // the z-ordered write preserves every row
    assert(spark.read.parquet(zdir).count() == orders.count())
    // SKIPPING, not just locality: the parquet reader must DECODE fewer
    // rows from the z-ordered layout under the same min/max predicate —
    // pushed filters prune whole row groups by footer stats, which only
    // works when the layout makes per-file ranges tight. Scan-level
    // numOutputRows is the rows that survived pushdown.
    def rowsDecoded(path: String): Long = {
      val q = spark.read.parquet(path)
        .filter(col("o_custkey") < 20 && col("o_totalprice") < 30000)
      q.collect()
      def scansOf(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[FileSourceScanExec] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scansOf(a.executedPlan)
        case s: FileSourceScanExec => Seq(s)
        case other => other.children.flatMap(scansOf)
      }
      scansOf(q.queryExecution.executedPlan)
        .map(_.metrics("numOutputRows").value).sum
    }
    // margin 3/4 (not 1/2): the skipping granularity is parquet
    // row-group/page stats, which shift with writer defaults — the
    // assert is "skipping engages materially", not an exact ratio
    val (zRows, rRows) = (rowsDecoded(zdir), rowsDecoded(rdir))
    assert(zRows * 4 <= rRows * 3,
      s"z-ordered scan decoded $zRows rows vs round-robin $rRows — " +
        "min/max skipping is not engaging")
  }

  test("bucketed tables join and aggregate with zero exchanges") {
    import graft.sources.Layout
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    Layout.writeBucketed(orders, "orders_b", Seq("o_orderkey"), buckets = 4)
    Layout.writeBucketed(
      li.withColumnRenamed("l_orderkey", "o_orderkey"), "lineitem_b",
      Seq("o_orderkey"), buckets = 4)
    // disable auto-broadcast so the bucketed sort-merge path is what we
    // assert on (at real scale neither side would be broadcastable)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_b").join(spark.table("lineitem_b"), "o_orderkey")
        .groupBy("o_orderkey").agg(sum("l_quantity").as("q"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange"),
        s"bucketed join+agg must not shuffle:\n${plan.take(1200)}")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        plan.take(400))
      // and it returns the same result as the plain join
      val plain = orders.join(li, orders("o_orderkey") === li("l_orderkey"))
        .groupBy(orders("o_orderkey")).agg(sum("l_quantity")).count()
      assert(joined.count() == plain)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("group sample plans WindowGroupLimit; ohlc plans no window at all") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val gs = Sampling.groupSample(docs, col("doc_id"), col("lang"), 5)
    val gsPlan = gs.queryExecution.executedPlan.toString
    // the rank filter must push a partial top-k BEFORE the shuffle —
    // without WindowGroupLimit a billion-row group moves wholesale
    assert(gsPlan.contains("WindowGroupLimit"), gsPlan.take(600))
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
    val bars = Temporal.ohlcBars(ev, "event_type", "ts", "event_id",
      col("value"), 3600L)
    val barPlan = bars.queryExecution.executedPlan.toString
    // open/close ride min/max(struct) PARTIAL aggregation — any Window
    // here is a regression to the sorted-per-bucket shape. Struct
    // min/max plans as SortAggregate (task-local sort, no extra
    // shuffle); the invariants are: no Window, partial before the
    // exchange, exactly one hash Exchange
    assert(!barPlan.contains("Window"), barPlan.take(600))
    assert(barPlan.contains("partial_min"), barPlan.take(600))
    assert("Exchange hashpartitioning".r.findAllIn(barPlan).size == 1,
      barPlan.take(600))
  }

  test("ranked evaluation bounds both top-k paths with WindowGroupLimit") {
    val spark2 = spark
    import spark2.implicits._
    val run = (1 to 50).map(i => (i % 5L, i.toLong, i * 0.1))
      .toDF("q", "item", "s")
    val truth = (1 to 30).map(i => (i % 5L, i.toLong, (i % 3).toLong))
      .toDF("q", "item", "rel")
    val plan = Evaluation.rankedEval(run, truth, "q", "item", "s", "rel", 5)
      .queryExecution.executedPlan.toString
    // the run ranking AND the ideal (IDCG) ranking are rank-filters:
    // both must push a partial top-k before their exchanges
    assert("WindowGroupLimit".r.findAllIn(plan).size >= 2, plan.take(800))
  }

  test("PR curve never plans a global Window") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_quantity"),
        (col("l_returnflag") === "R").cast("long").as("y"))
    val plan = Evaluation.prCurve(li, "l_quantity", "y")
      .queryExecution.executedPlan.toString
    // prefix sums run in the two-pass range-partitioned scan — a
    // Window here would be the single-partition global-sort regression
    assert(!plan.contains("Window"), plan.take(600))
  }

  test("Theil–Sen never plans a global Window over the slope set") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val df = Analytics.theilSen(li, "l_shipdate", "l_extendedprice")
    val plan = df.queryExecution.executedPlan.toString
    // the median pick runs through Ranking.globalRank's two-pass
    // range-partitioned rank — a Window here would be the
    // single-partition sort over O(days²) slope rows (round 16)
    assert(!plan.contains("Window"), plan.take(600))
  }

  test("integrityAudit is ONE fused plan (no per-relation driver jobs)") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val ord = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val sup = spark.read.parquet("/root/testdata/sf0.001/supplier.parquet")
    val df = DataQuality.integrityAudit(Seq(
      ("li->ord", li, "l_orderkey", ord, "o_orderkey"),
      ("li->sup", li, "l_suppkey", sup, "s_suppkey")))
    // the audit returns a lazy union: every relation's aggregates run
    // inside the one action the caller triggers (round 16 — the
    // round-15 shape ran 3 blocking jobs per relation on the driver)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("Union"), plan.take(600))
    assert(df.count() == 2)
  }

  test("link prediction applies the hub cap BEFORE the wedge join") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .filter(col("l_orderkey") < 200)
      .select(col("l_orderkey").as("s"), (col("l_partkey") % 97).as("d"))
    val df = Graph.linkPredict(docs, "s", "d", maxDegree = 50)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "wedge join must be equi")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "wedge join must be equi")
  }

  test("sorted neighborhood joins on rank buckets, never cross-joins") {
    import spark.implicits._
    val rows = (1 to 200).map(i => (i.toLong, (i * 37 % 91).toDouble))
      .toDF("id", "v")
    val plan = FuzzyJoin.sortedNeighborhood(rows, "id", col("v"), window = 5)
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(600))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
  }

  test("distinctive terms bound the rank window with WindowGroupLimit") {
    import spark.implicits._
    val docs = Seq(("a", Seq.fill(30)("alpha beta gamma").mkString(" ")),
      ("b", Seq.fill(30)("delta beta gamma").mkString(" ")))
      .toDF("src", "text")
    val plan = CorpusStats.distinctiveTerms(docs, "src", "text", topK = 3,
      minCount = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(800))
  }

  test("pareto and lorenz bound global ordering (TakeOrdered / two-pass)") {
    import spark.implicits._
    val rows = (1 to 500).map(i => (i.toLong, (i % 50).toDouble))
      .toDF("k", "v")
    val p = CorpusStats.paretoCurve(rows, "k", "v", topK = 10)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }
}
