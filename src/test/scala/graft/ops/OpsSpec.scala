package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"), // near-dup of 1
    (3L, "completely different content about spark catalyst optimizer rules engine"),
    (4L, "the quick brown fox jumps over the lazy dog again and again today") // exact dup of 1
  ).toDF("doc_id", "text")

  test("exact dedup clusters identical content") {
    val out = Dedup.exact(docs, "doc_id", Seq("text")).collect()
    assert(out.length == 3)
    val c = out.find(_.getAs[Long]("cluster_size") == 2).get
    assert(c.getAs[Long]("keep_id") == 1L)
  }

  test("exact dedup content key is null-safe") {
    // rows differing only in WHICH column is null, or null vs empty,
    // must land in different clusters
    val rows = Seq(
      (1L, Option("a"), Option.empty[String], Option("b")),
      (2L, Option("a"), Option("b"), Option.empty[String]),
      (3L, Option("a"), Option.empty[String], Option("")),
      (4L, Option("a"), Option.empty[String], Option("b")) // true dup of 1
    ).toDF("id", "c1", "c2", "c3")
    val out = Dedup.exact(rows, "id", Seq("c1", "c2", "c3")).collect()
    assert(out.length == 3, s"expected 3 distinct keys, got ${out.length}")
    val dup = out.find(_.getAs[Long]("cluster_size") == 2).get
    assert(dup.getAs[Long]("keep_id") == 1L)
  }

  test("exact dedup key resists separator/tag injection") {
    // values crafted so a separator-joined raw encoding would collide:
    // ("aVb", null) vs ("a", "bN") concatenate identically
    // under the old scheme; per-part digests keep them distinct
    val rows = Seq(
      (1L, Option("aVb"), Option.empty[String]),
      (2L, Option("a"), Option("bN"))
    ).toDF("id", "c1", "c2")
    val out = Dedup.exact(rows, "id", Seq("c1", "c2")).collect()
    assert(out.length == 2, s"adversarial values must not merge: ${out.length}")
  }

  test("cosine near-dups: SRP buckets find planted dups, agree with brute force") {
    val rnd = new scala.util.Random(7)
    val base = (0 until 30).map(i => (i.toLong, Array.fill(16)(rnd.nextGaussian())))
    // scaled copies are cosine-identical (cos = 1): every SRP plane
    // agrees, so bucketing can never miss them
    val dups = (0 until 3).map(i => (100L + i, base(i)._2.map(_ * 3.0)))
    val df = (base ++ dups).toDF("id", "v")
    val got = Dedup.cosineNearDups(df, "id", "v", threshold = 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // driver-side brute-force reference
    val all = base ++ dups
    def cos(a: Array[Double], b: Array[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val expected = (for {
      (ia, va) <- all; (ib, vb) <- all
      if ia < ib && cos(va, vb) >= 0.95
    } yield (ia, ib)).toSet
    assert(expected.size >= 3, "planted pairs present in reference")
    assert(got == expected, s"got $got expected $expected")
    // hot-bucket salting: with every vector IDENTICAL all rows share
    // every bucket; the salted route still yields ALL pairs (round-11
    // change: the cap routes, it no longer drops)
    val same = (0 until 5).map(i => (i.toLong, Array.fill(8)(1.0))).toDF("id", "v")
    val salted = Dedup.cosineNearDups(same, "id", "v", 0.9, maxBucketSize = 3)
    assert(salted.count() == 10, "all C(5,2) pairs survive the salted route")
  }

  test("cosine near-dup salted hot buckets equal the uncapped pair set") {
    // planted mega-bucket: two tight direction clusters + exact
    // rescaled duplicates, with a cap small enough that every cluster
    // bucket goes hot — the salted route must reproduce the uncapped
    // output EXACTLY (ids and cos doubles)
    val rnd = new scala.util.Random(7)
    val base = (0 until 60).map { i =>
      val c = if (i % 2 == 0) Array(1.0, 0.0, 0.1, 0.0, 0.2, 0.0, 0.0, 0.1)
              else Array(0.0, 1.0, 0.0, 0.1, 0.0, 0.2, 0.1, 0.0)
      (i.toLong, c.map(_ + rnd.nextGaussian() * 0.02))
    }
    val dups = (0 until 20).map(i => (200L + i, base(i)._2.map(_ * 2.5)))
    val df = (base ++ dups).toDF("id", "v").cache()
    val uncapped = Dedup.cosineNearDups(df, "id", "v", 0.97,
        maxBucketSize = Int.MaxValue)
      .as[(Long, Long, Double)].collect().toSet
    val saltedOut = Dedup.cosineNearDups(df, "id", "v", 0.97,
        maxBucketSize = 8)
      .as[(Long, Long, Double)].collect().toSet
    assert(uncapped.size >= 20, s"planted pairs present: ${uncapped.size}")
    assert(saltedOut == uncapped, "salted route == uncapped pair set")
  }

  test("ngram jaccard hot-gram cap bounds boilerplate grams") {
    // each doc: unique prefix + a shared boilerplate shingle; the ONLY
    // common gram across docs is "all rights reserved" (df = 4)
    val d = (1 to 4).map(i =>
      (i.toLong, s"unique$i content$i all rights reserved")).toDF("doc_id", "text")
    val uncapped = Dedup.ngramJaccardPairs(d, "doc_id", "text", threshold = 0.05)
    assert(uncapped.count() == 6, "all pairs share the boilerplate gram")
    val capped = Dedup.ngramJaccardPairs(d, "doc_id", "text", threshold = 0.05,
      maxDf = 3)
    assert(capped.count() == 0, "hot gram dropped, no candidate pairs remain")
  }

  test("shingle kernel tolerates null text") {
    val withNull = docs.unionAll(Seq((5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text"))
    val sets = Dedup.shingleSets(withNull, "doc_id", "text", 3).collect()
    assert(sets.length == 5)
    assert(sets.find(_.getLong(0) == 5L).get.getSeq[String](1).isEmpty)
    // pair operators must survive a null-text row end-to-end
    val pairs = Dedup.minhashLsh(withNull, "doc_id", "text",
      bands = 4, rowsPerBand = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)))
  }

  test("minhash LSH hot buckets are salted, not dropped") {
    // 3 identical docs share every band bucket (size 3); the routing
    // threshold of 2 sends those buckets down the salted join, which
    // must still produce all 3 pairs (round-11 lossless change)
    val trips = Seq(
      (1L, "one two three four five six seven eight nine"),
      (2L, "one two three four five six seven eight nine"),
      (3L, "one two three four five six seven eight nine"),
      (4L, "totally different text with other words entirely present")
    ).toDF("doc_id", "text")
    val salted = Dedup.minhashLsh(trips, "doc_id", "text",
      bands = 4, rowsPerBand = 3, threshold = 0.5, maxBucketSize = 2)
    assert(salted.count() == 3, "all identical pairs survive the salted route")
    val deflt = Dedup.minhashLsh(trips, "doc_id", "text",
      bands = 4, rowsPerBand = 3, threshold = 0.5)
    assert(deflt.count() == 3, "all identical pairs found under default cap")
  }

  test("minhash salted hot buckets equal the uncapped pair set") {
    // planted boilerplate mega-bucket: many docs share a long common
    // suffix, plus unrelated docs — with a routing threshold of 3 the
    // shared band buckets go hot, and the kernel route must reproduce
    // the uncapped output exactly (ids AND jaccard doubles)
    val rnd = new scala.util.Random(41)
    val docs = (0 until 24).map { i =>
      val boiler = "all rights reserved contact us subscribe now terms apply"
      val unique = Seq.fill(3)(s"w${rnd.nextInt(50)}").mkString(" ")
      (i.toLong, s"$unique $boiler")
    } ++ (100 until 106).map(i =>
      (i.toLong, s"completely different text number $i with other words"))
    val df = docs.toDF("doc_id", "text").cache()
    val uncapped = Dedup.minhashLsh(df, "doc_id", "text",
        bands = 4, rowsPerBand = 3, threshold = 0.3,
        maxBucketSize = Int.MaxValue)
      .as[(Long, Long, Double)].collect().toSet
    val salted = Dedup.minhashLsh(df, "doc_id", "text",
        bands = 4, rowsPerBand = 3, threshold = 0.3, maxBucketSize = 3)
      .as[(Long, Long, Double)].collect().toSet
    assert(uncapped.size >= 20, s"planted pairs present: ${uncapped.size}")
    assert(salted == uncapped, "salted kernel route == uncapped pair set")
  }

  test("LSH hot-bucket routing is ON by default and salting is observable") {
    assert(Dedup.DefaultMaxBucketSize != Int.MaxValue,
      "the straggler-task guard must not be opt-in")
    // planted degenerate bucket: 3 identical docs collide in all 4 band
    // buckets; a threshold of 2 routes those 4 buckets (12 band rows)
    // to the salted join — the stats record the routed mass AND the
    // pairs are all retained (vs the pre-round-11 drop semantics)
    val trips = Seq(
      (1L, "one two three four five six seven eight nine"),
      (2L, "one two three four five six seven eight nine"),
      (3L, "one two three four five six seven eight nine"),
      (4L, "totally different text with other words entirely present")
    ).toDF("doc_id", "text")
    val (pairs, stats) = Dedup.minhashLshWithStats(trips, "doc_id", "text",
      bands = 4, rowsPerBand = 3, threshold = 0.5, maxBucketSize = 2)
    assert(pairs.count() == 3, "salted buckets keep every pair")
    assert(stats.contains(Dedup.LshSaltStats(
      saltedBuckets = 4, saltedRows = 12, largestBucket = 3)), s"$stats")
    // unrouted (explicit Int.MaxValue) reports no stats
    val (_, none) = Dedup.minhashLshWithStats(trips, "doc_id", "text",
      bands = 4, rowsPerBand = 3, threshold = 0.5,
      maxBucketSize = Int.MaxValue)
    assert(none.isEmpty)
  }

  test("minhash LSH finds near-dups, rejects unrelated docs") {
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text",
      bands = 4, rowsPerBand = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)), "exact dup pair found")
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L)), "near-dup pair found")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "unrelated doc not paired")
  }

  test("simhash hot buckets are salted, not dropped") {
    val trips = Seq(
      (1L, "one two three four five six seven eight nine"),
      (2L, "one two three four five six seven eight nine"),
      (3L, "one two three four five six seven eight nine"),
      (4L, "totally different text with other words entirely present")
    ).toDF("doc_id", "text")
    // identical docs share all 4 band buckets (size 3); routing at 2
    // salts them and must keep all 3 pairs (round-11 lossless change)
    val salted = Dedup.simhashPairs(trips, "doc_id", "text", maxHamming = 3,
      maxBucketSize = 2)
    assert(salted.count() == 3, "salted simhash buckets keep every pair")
    // the default threshold (2048) leaves ordinary buckets on the plain path
    val deflt = Dedup.simhashPairs(trips, "doc_id", "text", maxHamming = 3)
    assert(deflt.count() == 3, "identical pairs found under default cap")
  }

  test("simhash: identical texts identical hashes; near-dups close; strangers far") {
    val sh = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(4L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(2L)) < ham(sh(1L), sh(3L)),
      s"near-dup ${ham(sh(1L), sh(2L))} should be closer than stranger ${ham(sh(1L), sh(3L))}")
  }

  test("ngram jaccard pairs computes exact set jaccard") {
    val out = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(out((1L, 4L)) - 1.0) < 1e-12)
    assert(out((1L, 2L)) > 0.5 && out((1L, 2L)) < 1.0)
    assert(!out.keySet.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("maxSim late interaction: hand-checkable scores, term-match ranking") {
    // query has two "token" vectors along axes x and y; doc 10 matches
    // both tokens strongly (one vector near x, one near y), doc 20 only
    // matches x, doc 30 matches neither — MaxSim must rank 10 > 20 > 30
    // even though doc 20's best SINGLE vector ties doc 10's
    val docs = Seq(
      (10L, Array(1.0, 0.0, 0.0)), (10L, Array(0.0, 1.0, 0.0)),
      (20L, Array(1.0, 0.0, 0.0)), (20L, Array(0.0, 0.0, 1.0)),
      (30L, Array(0.0, 0.0, 1.0)), (30L, Array(0.0, 0.0, 0.5))
    ).toDF("doc_id", "vec")
    val qs = Seq(
      (1L, Array(1.0, 0.0, 0.0)), (1L, Array(0.0, 1.0, 0.0))
    ).toDF("query_id", "vec")
    val got = Ann.maxSimTopK(docs, qs, "doc_id", "query_id", "vec", k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getDouble(3)))
    // scores: doc10 = 1 + 1 = 2; doc20 = 1 + 0 = 1; doc30 = 0 + 0 = 0
    assert(got.toSeq == Seq((10L, 1, 2.0), (20L, 2, 1.0), (30L, 3, 0.0)),
      got.mkString(";"))
  }

  test("mmrSelect trades relevance for diversity deterministically") {
    // d1 most relevant; d2 a near-duplicate of d1 with nearly the same
    // relevance; d3 orthogonal but less relevant. Pure relevance ranks
    // d1, d2, d3 — MMR at lambda 0.5 must pick d1, then prefer the
    // ORTHOGONAL d3 over the redundant d2
    val cands = Seq(
      (1L, 10L, 0.99, Array(1.0, 0.0)),
      (1L, 20L, 0.98, Array(0.999, 0.0447)),
      (1L, 30L, 0.60, Array(0.0, 1.0))
    ).toDF("query_id", "doc_id", "rel", "vec")
    val got = Ann.mmrSelect(cands, "query_id", "doc_id", "rel", "vec", k = 3)
      .orderBy("rank").collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(got.toSeq == Seq((1, 10L), (2, 30L), (3, 20L)), got.mkString(";"))
    // lambda = 1e6 (pure relevance) restores the relevance order
    val rel = Ann.mmrSelect(cands, "query_id", "doc_id", "rel", "vec", k = 3,
        lambdaPpm = 1000000)
      .orderBy("rank").collect().map(r => r.getLong(2))
    assert(rel.toSeq == Seq(10L, 20L, 30L), rel.mkString(","))
    // candidate-bound contract is enforced
    intercept[org.apache.spark.SparkException] {
      Ann.mmrSelect(cands, "query_id", "doc_id", "rel", "vec", k = 1,
        maxCandidates = 2).collect()
    }
  }

  test("ANN LSH recall against brute force on real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 20)
    val exact = Ann.bruteForceTopK(e, q, "vec_id", "embedding", k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Ann.lshTopK(e, q, "vec_id", "embedding", k = 10,
      tables = 8, bits = 6)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.2, s"LSH recall $recall (random embeddings; bucketed probing)")
    // and it must actually prune: candidate pairs well below n_queries * n
    assert(approx.size <= exact.size)
  }

  test("PQ ANN: quantized distances keep useful recall; deterministic") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 10)
    // exact L2 top-10 reference, driver-side
    val all = e.select(col("vec_id").cast("long"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect()
    def sq(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val exact = all.filter(_._1 < 10).flatMap { case (qid, qv) =>
      all.filter(_._1 != qid).map { case (nid, nv) => (qid, nid, sq(qv, nv)) }
        .sortBy(t => (t._3, t._2)).take(10).map(t => (qid, t._2))
    }.toSet
    val pq1 = Ann.pqTopK(e, q, "vec_id", "embedding", k = 10, m = 8, ksub = 16)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val got = pq1.map(t => (t._1, t._2)).toSet
    val recall = (exact intersect got).size.toDouble / exact.size
    assert(recall >= 0.2, s"PQ recall $recall (random embeddings, 8x16 codebooks)")
    // ranks are a proper 1..k sequence per query
    pq1.groupBy(_._1).foreach { case (qid, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to 10), s"query $qid ranks")
    }
    // deterministic: same codebooks + heaps every run
    val pq2 = Ann.pqTopK(e, q, "vec_id", "embedding", k = 10, m = 8, ksub = 16)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pq1.toSet == pq2.toSet, "PQ must be deterministic")
  }

  test("IVF ANN: k-means cells prune candidates, recall stays useful") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 20)
    val exact = Ann.bruteForceTopK(e, q, "vec_id", "embedding", k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Ann.ivfTopK(e, q, "vec_id", "embedding", k = 10,
      nlist = 8, nprobe = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect ivf).size.toDouble / exact.size
    // random embeddings scatter across cells; nprobe 3/8 should still
    // recover a solid fraction of true neighbors
    assert(recall >= 0.25, s"IVF recall $recall")
    assert(ivf.size <= exact.size, "probed candidates only")
  }

  test("IVFPQ ANN: composed residual quantization keeps useful recall") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 10)
    val exact = Ann.bruteForceTopK(e, q, "vec_id", "embedding", k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val r1 = Ann.ivfpqTopK(e, q, "vec_id", "embedding", k = 10,
      nlist = 8, m = 8, ksub = 16, nprobe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect r1).size.toDouble / exact.size
    // cell pruning (nprobe 4/8) AND residual quantization both lose a
    // little; the composition must still recover a useful fraction
    assert(recall >= 0.2, s"IVFPQ recall $recall")
    assert(r1.size <= exact.size, "probed candidates only")
    // deterministic end to end (sampled training included)
    val r2 = Ann.ivfpqTopK(e, q, "vec_id", "embedding", k = 10,
      nlist = 8, m = 8, ksub = 16, nprobe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(r1 == r2, "IVFPQ must be deterministic")
    // the composed index persists via the EXISTING ivf/pq writers and
    // scores identically after a round-trip
    val (centers, cb) = Ann.trainIvfPq(e, "vec_id", "embedding",
      nlist = 8, m = 8, ksub = 16)
    val base = s"/tmp/graft-ivfpq-${java.util.UUID.randomUUID().toString.take(8)}"
    Ann.saveIvfIndex(spark, s"$base/ivf", centers)
    Ann.savePqIndex(spark, s"$base/pq", cb)
    val f1 = Ann.ivfpqTopKFixed(e, q, "vec_id", "embedding", 5, centers, cb,
      nprobe = 4).collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val f2 = Ann.ivfpqTopKFixed(e, q, "vec_id", "embedding", 5,
      Ann.loadIvfIndex(spark, s"$base/ivf"), Ann.loadPqIndex(spark, s"$base/pq"),
      nprobe = 4).collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(f1 == f2, "loaded IVFPQ index must score identically")
  }

  test("pqTopKJoin: distributed plain-PQ equals driver path bit-exactly; corpus gate throws") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 25)
    val cb = Ann.trainPq(e, "vec_id", "embedding", m = 8, ksub = 16)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
        .toSeq
    val drv = Ann.pqTopKFixed(e, q, "vec_id", "embedding", 5, cb)
    val jn = Ann.pqTopKJoin(e, q, "vec_id", "embedding", 5, cb)
    assert(rows(jn) == rows(drv),
      "distributed plain-PQ must equal the driver ADC path, floats included")
    // the join path never collects the QUERY side: its plan keeps two
    // live parquet scans (corpus codes + queries)
    def parquetScans(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.sparkPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.size
    assert(parquetScans(jn) == 1, "queries stay a live distributed scan")
    // the CORPUS-code broadcast is explicitly gated
    intercept[IllegalArgumentException] {
      Ann.pqTopKJoin(e, q, "vec_id", "embedding", 5, cb, maxCorpusCodes = 10L)
    }
    ()
  }

  test("ivfTopKFromLayout: the query-side collect is gated") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 25)
    val centers = Ann.trainIvf(e, "vec_id", "embedding", nlist = 8)
    val base = s"/tmp/graft-layoutgate-${java.util.UUID.randomUUID().toString.take(8)}"
    Ann.saveIvfLayout(e, "vec_id", "embedding", centers, base)
    val ok = Ann.ivfTopKFromLayout(spark, base, q, "vec_id", "embedding",
      5, centers, nprobe = 3)
    assert(ok.count() > 0)
    intercept[IllegalArgumentException] {
      Ann.ivfTopKFromLayout(spark, base, q, "vec_id", "embedding",
        5, centers, nprobe = 3, maxQueries = 3L)
    }
    ()
  }

  test("distributed ANN probe: join path equals driver path, keeps query side un-collected") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 25)
    val centers = Ann.trainIvf(e, "vec_id", "embedding", nlist = 8)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
        .toSeq
    // IVF: identical results (ranks, exact float scores, tie-breaks)
    val drvIvf = Ann.ivfTopKFixed(e, q, "vec_id", "embedding", 5, centers,
      nprobe = 3)
    val joinIvf = Ann.ivfTopKJoin(e, q, "vec_id", "embedding", 5, centers,
      nprobe = 3)
    assert(rows(joinIvf) == rows(drvIvf), "IVF join probe must equal driver probe")
    // IVFPQ: identical results including bit-identical ADC sums
    val (cs, cb) = Ann.trainIvfPq(e, "vec_id", "embedding", nlist = 8,
      m = 8, ksub = 16)
    val drvPq = Ann.ivfpqTopKFixed(e, q, "vec_id", "embedding", 5, cs, cb,
      nprobe = 3)
    val joinPq = Ann.ivfpqTopKJoin(e, q, "vec_id", "embedding", 5, cs, cb,
      nprobe = 3)
    assert(rows(joinPq) == rows(drvPq), "IVFPQ join probe must equal driver probe")
    // plan shape: the join path keeps the QUERY side as a live scan in
    // the plan (two parquet scans — corpus and queries), while the
    // driver path collected it away (one scan + a local probe table).
    // That is the "no query-side collect" guarantee, visible in the plan.
    def parquetScans(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.sparkPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.size
    assert(parquetScans(joinIvf) == 2, "join path must scan queries distributed")
    assert(parquetScans(drvIvf) == 1, "driver path collects the query side")
    assert(parquetScans(joinPq) == 2)
    assert(parquetScans(drvPq) == 1)
    // the gate dispatches by an explicit query count (the gate itself
    // checkpoints the query frame once, so its plan shows the corpus
    // scan + the checkpoint — detect the dispatch by the driver-built
    // probe table instead: the driver path collects probes into a
    // LocalTableScan, the join path computes them distributed)
    def hasLocalProbeTable(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.sparkPlan.toString.contains("LocalTableScan")
    val above = Ann.ivfTopKAuto(e, q, "vec_id", "embedding", 5, centers,
      nprobe = 3, maxDriverQueries = 10)
    assert(!hasLocalProbeTable(above), "above the gate: distributed probe")
    assert(rows(above) == rows(drvIvf))
    val below = Ann.ivfTopKAuto(e, q, "vec_id", "embedding", 5, centers,
      nprobe = 3, maxDriverQueries = 1000)
    assert(hasLocalProbeTable(below), "below the gate: driver probe")
    assert(rows(below) == rows(drvIvf))
    val abovePq = Ann.ivfpqTopKAuto(e, q, "vec_id", "embedding", 5, cs, cb,
      nprobe = 3, maxDriverQueries = 10)
    assert(!hasLocalProbeTable(abovePq), "above the gate: distributed ADC")
    assert(rows(abovePq) == rows(drvPq))
  }

  test("IVF layout: cell-partitioned search equals in-memory, appends incrementally, prunes partitions") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 5)
    val centers = Ann.trainIvf(e, "vec_id", "embedding", nlist = 8)
    val base = s"/tmp/graft-ivf-layout-${java.util.UUID.randomUUID().toString.take(8)}"
    val first = e.filter(col("vec_id") < 600)
    val rest = e.filter(col("vec_id") >= 600)
    Ann.saveIvfLayout(first, "vec_id", "embedding", centers, base)
    def run(corpus: org.apache.spark.sql.DataFrame) =
      Ann.ivfTopKFixed(corpus, q, "vec_id", "embedding", 5, centers, nprobe = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    def runLayout() =
      Ann.ivfTopKFromLayout(spark, base, q, "vec_id", "embedding", 5,
        centers, nprobe = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(runLayout() == run(first), "layout search must equal in-memory")
    // incremental append: same frozen quantizer, untouched old cells
    Ann.appendIvfLayout(rest, "vec_id", "embedding", centers, base)
    assert(runLayout() == run(e), "appended layout must equal full corpus")
    // the probe filter must prune parquet partitions (cell directories)
    val plan = spark.read.parquet(base).filter(col("cell").isin(0, 1))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"expected partition pruning on cell, plan:\n$plan")
  }

  test("ANN index persistence: train once, save, load, identical results") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 10)
    val base = s"/tmp/graft-ann-index-${java.util.UUID.randomUUID().toString.take(8)}"
    // IVF: centroids round-trip bit-exactly and score identically
    val centers = Ann.trainIvf(e, "vec_id", "embedding", nlist = 8)
    Ann.saveIvfIndex(spark, s"$base/ivf", centers)
    val centers2 = Ann.loadIvfIndex(spark, s"$base/ivf")
    assert(centers.length == centers2.length)
    assert(centers.zip(centers2).forall { case (a, b) => a.sameElements(b) })
    val r1 = Ann.ivfTopKFixed(e, q, "vec_id", "embedding", 5, centers, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val r2 = Ann.ivfTopKFixed(e, q, "vec_id", "embedding", 5, centers2, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(r1 == r2, "loaded IVF index must score identically")
    // PQ: codebooks round-trip bit-exactly and score identically
    val cb = Ann.trainPq(e, "vec_id", "embedding", m = 8, ksub = 16)
    Ann.savePqIndex(spark, s"$base/pq", cb)
    val cb2 = Ann.loadPqIndex(spark, s"$base/pq")
    assert(cb.length == cb2.length)
    for (mi <- cb.indices) {
      assert(cb(mi).length == cb2(mi).length)
      assert(cb(mi).zip(cb2(mi)).forall { case (a, b) => a.sameElements(b) })
    }
    val p1 = Ann.pqTopKFixed(e, q, "vec_id", "embedding", 5, cb)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val p2 = Ann.pqTopKFixed(e, q, "vec_id", "embedding", 5, cb2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(p1 == p2, "loaded PQ index must score identically")
    // overwrite convention matches the model writers
    intercept[Exception] {
      Ann.saveIvfIndex(spark, s"$base/ivf", centers, overwrite = false)
    }
  }

  test("language id picks the right language on natural samples") {
    val samples = Seq(
      ("the cat is on the mat and it is happy", "en"),
      ("der hund ist nicht mit der katze", "de"),
      ("le chat est dans la maison pour que", "fr"),
      ("el perro es un animal en la casa", "es"),
      ("这是一个中文句子没有空格", "zh"),
      ("xyzzy plugh foobar", "und")
    ).toDF("text", "expected")
    val out = samples.withColumn("pred", TextAnalysis.langId(spark, col("text")))
      .filter(col("pred") =!= col("expected")).collect()
    assert(out.isEmpty, out.mkString(";"))
    // kernel expression must agree with the declarative HOF formulation
    val scores = TextAnalysis.langScores(col("text"))
    val best = greatest(scores.map { case (l, s) =>
      struct(s.as("s"), lit(l).as("l")) }: _*)
    val cjk = length(regexp_replace(col("text"), "[^\\x{4e00}-\\x{9fff}]", ""))
    val hof = when(cjk * 2 > length(col("text")), lit("zh"))
      .when(best.getField("s") === 0, lit("und"))
      .otherwise(best.getField("l"))
    val diff = samples.withColumn("pred", TextAnalysis.langId(spark, col("text")))
      .withColumn("hof", hof).filter(col("pred") =!= col("hof")).collect()
    assert(diff.isEmpty, diff.mkString(";"))
  }

  test("quality score penalizes repetition and punctuation noise") {
    val df = Seq(
      (1L, "a a a a a a a a a a a a"),                       // repetitive
      (2L, "many distinct words compose this reasonably long informative sentence overall"),
      (3L, "!!! ??? *** ### $$$ %%% ^^^ &&&")                // punctuation noise
    ).toDF("doc_id", "text")
    val q = TextAnalysis.qualityScore(df, "text")
      .select("doc_id", "quality").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(q(2L) > q(1L), s"informative ${q(2L)} > repetitive ${q(1L)}")
    assert(q(2L) > q(3L), s"informative ${q(2L)} > noisy ${q(3L)}")
  }

  test("fingerprints: equal for dups, winnowing selects a subset of gram hashes") {
    val fp = TextAnalysis.fingerprint(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) == fp(4L))
    assert(fp(1L) != fp(3L))
    val win = TextAnalysis.winnowing(docs, "doc_id", "text")
      .select("doc_id", "fingerprints").as[(Long, Seq[String])].collect().toMap
    assert(win(1L) == win(4L))
    assert(win(1L).nonEmpty && win(1L).toSet.subsetOf(
      win(1L).toSet ++ win(2L).toSet))
  }

  test("multimodal decode plumbing: schema, batching, frame sampling") {
    val media = Multimodal.withPayload(
      docs.withColumn("text", concat(col("text"), lit(" pad"))), "text", "video")
    val dec = Multimodal.decode(media.drop("text"), batchSize = 2)
    assert(dec.schema.fieldNames.contains("media"))
    val rows = dec.select("doc_id", "media.byte_len", "media.n_frames", "media.format").collect()
    assert(rows.length == 4)
    assert(rows.forall(_.getString(3) == "mp4"))
    // frame sampling explodes by stride
    val frames = Multimodal.sampleFrames(dec, stride = 2)
    val perDoc = frames.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nf = rows.map(r => r.getLong(0) -> r.getInt(2)).toMap
    perDoc.foreach { case (id, cnt) =>
      assert(cnt == (nf(id) + 1) / 2, s"doc $id frames ${nf(id)} sampled $cnt")
    }
  }

  test("multimodal resize + feature extraction feed the ANN operators") {
    val media = Multimodal.withPayload(docs, "text", "image")
    // resize keeps the payload and rewrites the metadata dims
    val dec = Multimodal.decode(media.withColumn("payload_keep", col("payload")))
      .withColumnRenamed("payload_keep", "payload")
    val rs = Multimodal.resize(dec, 224, 224, batchSize = 2)
    val dims = rs.select("media.width", "media.height").distinct().collect()
    assert(dims.length == 1 && dims(0).getInt(0) == 224 && dims(0).getInt(1) == 224)
    assert(rs.filter(col("payload").isNull).count() == 0)
    // modality is OPTIONAL for resize — callers often drop it after decode
    val rsNoMod = Multimodal.resize(dec.drop("modality"), 64, 32)
    assert(rsNoMod.select("media.width").distinct().head.getInt(0) == 64)
    // features: deterministic, fixed dim, in [0, 1)
    val f1 = Multimodal.featureExtract(media, dim = 8, batchSize = 2)
      .select("doc_id", "features").as[(Long, Seq[Double])].collect().toMap
    val f2 = Multimodal.featureExtract(media, dim = 8, batchSize = 3)
      .select("doc_id", "features").as[(Long, Seq[Double])].collect().toMap
    assert(f1 == f2, "features must not depend on batching")
    assert(f1.values.forall(v => v.length == 8 && v.forall(x => x >= 0 && x < 1)))
    // duplicate payloads embed identically; the chain composes with ANN
    assert(f1(1L) == f1(4L), "identical payloads -> identical features")
    val emb = Multimodal.featureExtract(media, dim = 8)
      .select(col("doc_id").as("vec_id"), col("features").as("embedding"))
    val nn = Ann.bruteForceTopK(emb, emb.filter(col("vec_id") === 1), "vec_id",
      "embedding", k = 1).collect()
    assert(nn.length == 1 && nn(0).getAs[Long]("neighbor_id") == 4L,
      "nearest neighbor of doc 1 is its exact duplicate doc 4")
  }

  test("multimodal codec seam: a custom MediaCodec swaps in without operator edits") {
    // a fake codec with recognizable outputs, proving decode/resize/embed
    // all route through the injected instance (not the stub)
    object FakeCodec extends MediaCodec {
      override def decode(payload: Array[Byte], modality: String): MediaMeta =
        MediaMeta(if (payload == null) 0L else payload.length.toLong,
          width = 1234, height = 777, nFrames = 3, format = "fake")
      override def resize(payload: Array[Byte], modality: String,
                          width: Int, height: Int): Array[Byte] =
        s"resized:${width}x$height".getBytes("UTF-8")
      override def embed(payload: Array[Byte], dim: Int): Array[Double] =
        Array.fill(dim)(0.5)
    }
    val media = Multimodal.withPayload(docs, "text", "image")
    val dec = Multimodal.decode(
      media.withColumn("payload_keep", col("payload")).drop("text"),
      batchSize = 2, codec = FakeCodec)
    val m = dec.select("media.width", "media.height", "media.n_frames", "media.format")
      .distinct().collect()
    assert(m.length == 1 && m(0).getInt(0) == 1234 && m(0).getInt(1) == 777 &&
      m(0).getInt(2) == 3 && m(0).getString(3) == "fake")
    val rs = Multimodal.resize(dec.withColumnRenamed("payload_keep", "payload"),
      64, 32, codec = FakeCodec)
    val bytes = rs.select("payload").collect().map(r =>
      new String(r.getAs[Array[Byte]](0), "UTF-8")).distinct
    assert(bytes.toSeq == Seq("resized:64x32"), "resize bytes come from the codec")
    val feats = Multimodal.featureExtract(media, dim = 4, codec = FakeCodec)
      .select("features").as[Seq[Double]].collect()
    assert(feats.forall(_ == Seq(0.5, 0.5, 0.5, 0.5)), "embed comes from the codec")
    // and the default instance is the stub: same query, stub results
    val stub = Multimodal.decode(media.drop("text"), batchSize = 2)
      .select("media.format").distinct().collect()
    assert(stub.map(_.getString(0)).toSeq == Seq("png"))
  }

  test("ImageCodec decodes real image bytes end-to-end: decode, resize, features, ANN") {
    // real PNG and JPEG payloads rendered in-test via the same JVM
    // imaging stack a production ingest would hand us
    def img(w: Int, h: Int)(px: (Int, Int) => Int): java.awt.image.BufferedImage = {
      val b = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) b.setRGB(x, y, px(x, y))
      b
    }
    def enc(b: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(b, fmt, out)
      out.toByteArray
    }
    val red = enc(img(40, 30)((_, _) => 0xFF0000), "png")
    val red2 = enc(img(40, 30)((x, _) => if (x == 0) 0xEE0000 else 0xFF0000), "png")
    val blue = enc(img(40, 30)((_, _) => 0x0000FF), "png")
    val jpegGrad = enc(img(20, 20)((x, y) => (x * 12 << 16) | (y * 12 << 8)), "jpeg")
    val rows = Seq((1L, red), (2L, red2), (3L, blue), (4L, jpegGrad),
      (5L, "not an image".getBytes("UTF-8")), (6L, null.asInstanceOf[Array[Byte]]))
    val media = rows.toDF("id", "payload").withColumn("modality", lit("image"))
    // decode: real header metadata, corrupt/null rows survive as marked
    val dec = Multimodal.decode(
      media.withColumn("payload_keep", col("payload")), codec = ImageCodec)
    val metas = dec.select("id", "media.width", "media.height", "media.format")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    assert(metas(1L) == ((40, 30, "png")), metas(1L).toString)
    assert(metas(4L) == ((20, 20, "jpeg")), metas(4L).toString)
    assert(metas(5L)._3 == "corrupt" && metas(6L)._3 == "empty")
    // resize: pixels actually re-render to the target dims (re-decoded)
    val rs = Multimodal.resize(dec.withColumnRenamed("payload_keep", "payload")
        .filter(col("id") <= 4), 16, 8, codec = ImageCodec)
    val rsMeta = Multimodal.decode(rs.drop("media"), codec = ImageCodec)
      .select("media.width", "media.height", "media.format").distinct().collect()
    assert(rsMeta.length == 1 && rsMeta(0).getInt(0) == 16 &&
      rsMeta(0).getInt(1) == 8 && rsMeta(0).getString(2) == "png")
    // features: red pixels light the R channel, not B; deterministic
    val feats = Multimodal.featureExtract(media, dim = 12, codec = ImageCodec)
      .select("id", "features").as[(Long, Seq[Double])].collect().toMap
    assert(feats(1L).zipWithIndex.forall { case (v, j) =>
      if (j % 3 == 0) v > 0.9 else v < 0.1 }, s"red features: ${feats(1L)}")
    assert(feats(3L).zipWithIndex.forall { case (v, j) =>
      if (j % 3 == 2) v > 0.9 else v < 0.1 }, s"blue features: ${feats(3L)}")
    assert(feats(6L).forall(_ == 0.0), "null payload embeds as zero vector")
    // ANN composition: the near-identical red image is red's nearest
    // neighbor through the standard brute-force operator
    val emb = Multimodal.featureExtract(media.filter(col("id") <= 4),
        dim = 12, codec = ImageCodec)
      .select(col("id").as("vec_id"), col("features").as("embedding"))
    val nn = Ann.bruteForceTopK(emb, emb.filter(col("vec_id") === 1),
      "vec_id", "embedding", k = 1).collect()
    assert(nn.length == 1 && nn(0).getLong(1) == 2L,
      s"nearest to red must be red2: ${nn.mkString(",")}")
  }

  test("AudioCodec decodes real WAV bytes end-to-end: decode, resample, features, ANN") {
    // real PCM WAV payloads synthesized in-test through the same
    // javax.sound encoder a production ingest would hand us
    def tone(hz: Double, rate: Int, frames: Int, channels: Int = 1,
             amp: Double = 12000.0): Array[Byte] = {
      val s = new Array[Short](frames * channels)
      for (i <- 0 until frames; c <- 0 until channels)
        s(i * channels + c) =
          (amp * math.sin(2 * math.Pi * hz * i / rate)).toShort
      AudioCodec.encodeWav(s, rate, channels)
    }
    // loud-then-quiet vs quiet-then-loud: opposite energy envelopes
    def envelope(first: Double, second: Double): Array[Byte] = {
      val rate = 8000; val frames = 4000
      val s = Array.tabulate(frames) { i =>
        val a = if (i < frames / 2) first else second
        (a * math.sin(2 * math.Pi * 440 * i / rate)).toShort
      }
      AudioCodec.encodeWav(s, rate, 1)
    }
    val a1 = envelope(12000, 300)
    val a2 = envelope(11500, 350) // near-duplicate of a1
    val a3 = envelope(300, 12000) // reversed envelope
    val stereo = tone(440, 16000, 1600, channels = 2)
    val rows = Seq((1L, a1), (2L, a2), (3L, a3), (4L, stereo),
      (5L, "not audio".getBytes("UTF-8")), (6L, null.asInstanceOf[Array[Byte]]))
    val media = rows.toDF("id", "payload").withColumn("modality", lit("audio"))
    // decode: real header metadata (width = Hz, height = channels,
    // nFrames = sample frames); corrupt/null rows survive as marked
    val dec = Multimodal.decode(media, codec = AudioCodec)
    val metas = dec.select("id", "media.width", "media.height",
        "media.n_frames", "media.format")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))).toMap
    assert(metas(1L) == ((8000, 1, 4000, "wav")), metas(1L).toString)
    assert(metas(4L) == ((16000, 2, 1600, "wav")), metas(4L).toString)
    assert(metas(5L)._4 == "corrupt" && metas(6L)._4 == "empty")
    // resample: 16 kHz stereo -> 8 kHz mono, frame count halves
    val rs = Multimodal.resize(media.filter(col("id") === 4), 8000, 1,
      codec = AudioCodec)
    val rsMeta = Multimodal.decode(rs.drop("media"), codec = AudioCodec)
      .select("media.width", "media.height", "media.n_frames").head()
    assert(rsMeta.getInt(0) == 8000 && rsMeta.getInt(1) == 1)
    assert(math.abs(rsMeta.getInt(2) - 800) <= 1, rsMeta.getInt(2).toString)
    // features: energy envelope — loud first half, quiet second half
    val feats = Multimodal.featureExtract(media, dim = 8, codec = AudioCodec)
      .select("id", "features").as[(Long, Seq[Double])].collect().toMap
    assert(feats(1L).take(4).forall(_ > 0.15) &&
      feats(1L).drop(4).forall(_ < 0.05), s"envelope: ${feats(1L)}")
    assert(feats(6L).forall(_ == 0.0), "null payload embeds as zero vector")
    // ANN composition: the near-duplicate clip is a1's nearest neighbor
    val emb = Multimodal.featureExtract(media.filter(col("id") <= 4),
        dim = 8, codec = AudioCodec)
      .select(col("id").as("vec_id"), col("features").as("embedding"))
    val nn = Ann.bruteForceTopK(emb, emb.filter(col("vec_id") === 1),
      "vec_id", "embedding", k = 1).collect()
    assert(nn.length == 1 && nn(0).getLong(1) == 2L,
      s"nearest to a1 must be a2: ${nn.mkString(",")}")
  }

  test("AudioCodec downmix AVERAGES interleaved channel groups, never selects") {
    // 4-channel source with constant per-channel levels; 4→2 must
    // average (ch0,ch2)→L and (ch1,ch3)→R (quad→stereo), not pick
    // channels 0 and 1 and drop the rears
    val frames = 64; val rate = 8000
    val s = new Array[Short](frames * 4)
    for (i <- 0 until frames; c <- 0 until 4)
      s(i * 4 + c) = ((c + 1) * 1000).toShort
    val quad = AudioCodec.encodeWav(s, rate, 4)
    val out = AudioCodec.resize(quad, "audio", rate, 2)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(out))
    assert(ais.getFormat.getChannels == 2)
    val raw = ais.readAllBytes()
    def sample(k: Int): Int =
      ((raw(2 * k + 1) << 8) | (raw(2 * k) & 0xFF))
    // frame 1 (skip frame 0 only to avoid any edge assumption): L, R
    assert(sample(2) == 2000, s"L must be avg(1000,3000): ${sample(2)}")
    assert(sample(3) == 3000, s"R must be avg(2000,4000): ${sample(3)}")
    // 2→1 still averages L+R
    val stereo = AudioCodec.encodeWav(
      Array.tabulate[Short](32)(i => if (i % 2 == 0) 100 else 300), rate, 2)
    val mono = AudioCodec.resize(stereo, "audio", rate, 1)
    val mIs = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(mono))
    val mRaw = mIs.readAllBytes()
    assert(((mRaw(3) << 8) | (mRaw(2) & 0xFF)) == 200,
      "mono must be avg(L,R)")
  }

  test("BPE tie-breaks collate by code point on BOTH routes (emoji vs private-use)") {
    // U+1F600 (😀, surrogate pair starting 0xD83D) sorts BEFORE
    // U+E000 under Java's UTF-16 code-unit compareTo but AFTER it in
    // code-point/UTF-8 order — Spark's sort. Both training routes must
    // share the code-point collation, so the first merge on a tied
    // corpus is (, a) on both.
    assert(Tokenizer.codePointCompare("😀", "") > 0)
    assert("😀".compareTo("") < 0) // the trap the fix closes
    val text = "😀a a"
    val d = Seq((1L, text)).toDF("doc_id", "text")
    def firstMerge(maxVocab: Int): (String, String) = {
      val m = Tokenizer.trainBpe(d, "text", numMerges = 1,
        maxVocabWords = maxVocab).head()
      (m.getString(1), m.getString(2))
    }
    val driver = firstMerge(65536) // driver loop route
    val dist = firstMerge(1)       // distributed route
    assert(driver == (("", "a")), s"driver route picked $driver")
    assert(dist == driver, s"routes disagree: $dist vs $driver")
  }

  test("VideoCodec decodes real MJPEG-AVI bytes: decode, frame sample, resize, features, ANN") {
    def frame(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val b = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) b.setRGB(x, y, rgb)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(b, "jpeg", out)
      out.toByteArray
    }
    // clip 1: red->red; clip 2: nearly the same; clip 3: blue->green
    val v1 = VideoCodec.encodeAvi(
      Array(frame(32, 24, 0xFF0000), frame(32, 24, 0xEE0000),
        frame(32, 24, 0xFF1100)), 32, 24)
    val v2 = VideoCodec.encodeAvi(
      Array(frame(32, 24, 0xEE0000), frame(32, 24, 0xFF0000)), 32, 24)
    val v3 = VideoCodec.encodeAvi(
      Array(frame(32, 24, 0x0000FF), frame(32, 24, 0x00CC00)), 32, 24)
    val rows = Seq((1L, v1), (2L, v2), (3L, v3),
      (4L, "not a video".getBytes("UTF-8")), (5L, null.asInstanceOf[Array[Byte]]))
    val media = rows.toDF("id", "payload").withColumn("modality", lit("video"))
    // decode: real avih header metadata; corrupt/null survive as marked
    val dec = Multimodal.decode(media, codec = VideoCodec)
    val metas = dec.select("id", "media.width", "media.height",
        "media.n_frames", "media.format")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))).toMap
    assert(metas(1L) == ((32, 24, 3, "avi")), metas(1L).toString)
    assert(metas(3L) == ((32, 24, 2, "avi")), metas(3L).toString)
    assert(metas(4L)._4 == "corrupt" && metas(5L)._4 == "empty")
    // frame sampling composes with the REAL frame count, and
    // extractFrame yields decodable JPEG bytes per sampled index
    val sampled = Multimodal.sampleFrames(dec.filter(col("id") === 1), stride = 2)
      .select("id", "frame_idx").as[(Long, Int)].collect().toSet
    assert(sampled == Set((1L, 0), (1L, 2)), sampled.toString)
    val f2 = VideoCodec.extractFrame(v1, 2)
    val f2meta = ImageCodec.decode(f2, "image")
    assert(f2meta.width == 32 && f2meta.height == 24 &&
      f2meta.format == "jpeg", f2meta.toString)
    assert(VideoCodec.extractFrame(v1, 99) == null)
    // resize: every frame re-renders; the rebuilt container reports the
    // target dims and the same frame count
    val rs = Multimodal.resize(media.filter(col("id") === 1), 16, 8,
      codec = VideoCodec)
    val rsMeta = Multimodal.decode(rs.drop("media"), codec = VideoCodec)
      .select("media.width", "media.height", "media.n_frames").head()
    assert(rsMeta.getInt(0) == 16 && rsMeta.getInt(1) == 8 && rsMeta.getInt(2) == 3)
    // features: red clips near, blue/green clip far; null embeds zero
    val feats = Multimodal.featureExtract(media, dim = 12, codec = VideoCodec)
      .select("id", "features").as[(Long, Seq[Double])].collect().toMap
    assert(feats(1L).zipWithIndex.forall { case (v, j) =>
      if (j % 3 == 0) v > 0.8 else v < 0.2 }, s"red clip: ${feats(1L)}")
    assert(feats(5L).forall(_ == 0.0))
    val emb = Multimodal.featureExtract(media.filter(col("id") <= 3),
        dim = 12, codec = VideoCodec)
      .select(col("id").as("vec_id"), col("features").as("embedding"))
    val nnv = Ann.bruteForceTopK(emb, emb.filter(col("vec_id") === 1),
      "vec_id", "embedding", k = 1).collect()
    assert(nnv.length == 1 && nnv(0).getLong(1) == 2L,
      s"nearest to v1 must be v2: ${nnv.mkString(",")}")
  }

  test("incremental dedup probes a persisted minhash index") {
    val corpus = docs // 4 docs, 1 and 4 identical
    val index = Dedup.minhashIndex(corpus, "doc_id", "text")
    val path = s"/tmp/graft-mh-index-${java.util.UUID.randomUUID().toString.take(8)}"
    Dedup.saveMinhashIndex(index, path)
    val loaded = Dedup.loadMinhashIndex(spark, path)
    // round-trip: identical signatures and buckets
    val a = index.orderBy("id").collect().map(_.toSeq)
    val b = loaded.orderBy("id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq, "index must round-trip exactly")
    // a new batch containing an exact copy of doc 1 (id 100) and an
    // unrelated doc (id 101): the copy must hit doc 1 (and its dup 4)
    // with estimate 1.0; the unrelated doc must hit nothing
    val newBatch = Seq(
      (100L, docs.filter(col("doc_id") === 1).head.getString(1)),
      (101L, "entirely unrelated words about volcanoes and glaciers today")
    ).toDF("doc_id", "text")
    val hits = Dedup.minhashLshIncremental(loaded, newBatch, "doc_id", "text",
        minEstJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byNew = hits.groupBy(_._1)
    // the exact copy hits its source and the source's duplicate with
    // estimate exactly 1.0 (all signatures agree); near-dup corpus
    // members may also surface, always above the floor
    assert(Set(1L, 4L).subsetOf(byNew(100L).map(_._2).toSet), hits.mkString(";"))
    assert(byNew(100L).filter(h => h._2 == 1L || h._2 == 4L).forall(_._3 == 1.0),
      "exact copy -> all signatures agree")
    assert(byNew(100L).forall(_._3 >= 0.5))
    assert(!byNew.contains(101L), "unrelated doc must not match")
    // incremental probe agrees with self-join minhashLsh on the same pairs
    val joint = corpus.unionAll(newBatch)
    val self = Dedup.minhashLsh(joint, "doc_id", "text", threshold = 0.0)
      .filter(col("id_b") === 100L)
      .select(col("id_a")).collect().map(_.getLong(0)).toSet
    assert(byNew(100L).map(_._2).toSet.subsetOf(self + 100L))
  }

  test("connected components: pairs collapse to min-id clusters") {
    val pairs = Seq((2L, 1L), (2L, 3L), (10L, 11L), (3L, 7L))
      .toDF("id_a", "id_b")
    val expected =
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 1L, 10L -> 10L, 11L -> 10L)
    // {1,2,3,7} -> 1 (via the 2-1, 2-3, 3-7 chain), {10,11} -> 10
    val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == expected, cc.toString)
    // maxLocalEdges = 0 forces the distributed pointer-jumping loop —
    // both paths must produce identical labels
    val loop = Dedup.connectedComponents(pairs, "id_a", "id_b",
        maxLocalEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(loop == expected, loop.toString)
  }

  test("connected components paths agree on a deep chain + self-loop") {
    // 60-node chain exercises multi-round pointer jumping; the (99,99)
    // self-loop node must appear in BOTH paths' output, labeled itself
    val chain = (0L until 59L).map(i => (i + 1, i)) :+ (99L, 99L)
    val pairs = chain.toDF("id_a", "id_b")
    val local = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val loop = Dedup.connectedComponents(pairs, "id_a", "id_b",
        maxLocalEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = (0L until 60L).map(_ -> 0L).toMap + (99L -> 99L)
    assert(local == expected)
    assert(loop == expected)
  }

  test("star-contraction CC: label-identical to label propagation, O(log n) rounds") {
    // planted components: a deep 64-chain (worst case for per-round
    // propagation), a star, a triangle + pendant, a self-loop singleton
    val chain = (0L until 63L).map(i => (i + 1, i))
    val star = (201L to 208L).map(i => (200L, i))
    val tri = Seq((300L, 301L), (301L, 302L), (302L, 300L), (302L, 303L))
    val selfLoop = Seq((400L, 400L))
    val pairs = (chain ++ star ++ tri ++ selfLoop).toDF("id_a", "id_b")
    val expected = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // maxIter = 15 bounds the rounds: a 64-chain needs ~log2(64)
    // alternations, far under label propagation's unjumped 64.
    // maxLocalEdges = 0 forces the DISTRIBUTED star loop (round 19
    // added a driver union-find cutover below the bound; this test's
    // subject is the star algorithm itself)
    val got = Dedup.connectedComponentsStar(pairs, "id_a", "id_b",
        maxIter = 15, maxLocalEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected, s"star labels diverge: $got")
    assert(got(63L) == 0L && got(208L) == 200L && got(303L) == 300L &&
      got(400L) == 400L)
    // random planted graph: union of seeded random trees + extra edges
    val rnd = new scala.util.Random(97)
    val randPairs = (1 to 300).map { _ =>
      val a = rnd.nextInt(120).toLong; val b = rnd.nextInt(120).toLong
      (a, b)
    }.toDF("id_a", "id_b")
    val exp2 = Dedup.connectedComponents(randPairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got2 = Dedup.connectedComponentsStar(randPairs, "id_a", "id_b",
        maxIter = 15, maxLocalEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == exp2)
    // empty input converges immediately
    assert(Dedup.connectedComponentsStar(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"), "id_a", "id_b").count() == 0)
  }

  test("boilerplate removal drops shared lines, keeps order, counts removed") {
    val d = Seq(
      (1L, "HEADER\nalpha beta\ngamma\nFOOTER"),
      (2L, "HEADER\ndelta\nFOOTER"),
      (3L, "HEADER\nepsilon zeta\nFOOTER")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.removeBoilerplate(d, "doc_id", "text", minDocs = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getLong(3)))).toMap
    assert(out(1L) == (("alpha beta\ngamma", 4, 2L)), out(1L).toString)
    assert(out(2L) == (("delta", 3, 2L)))
    assert(out(3L) == (("epsilon zeta", 3, 2L)))
  }

  test("hash sampling is deterministic, portable, and nested by fraction") {
    val df = spark.range(10000).toDF("id")
    val s10 = Sampling.sample(df, col("id"), 0.10).as[Long].collect().toSet
    val s10b = Sampling.sample(df, col("id"), 0.10).as[Long].collect().toSet
    assert(s10 == s10b, "same rows every run")
    assert(math.abs(s10.size - 1000) < 150, s"~10%: ${s10.size}")
    val s20 = Sampling.sample(df, col("id"), 0.20).as[Long].collect().toSet
    assert(s10.subsetOf(s20), "smaller fraction is a subset of the larger")
    // stratified: fractions differ per stratum
    val strat = df.withColumn("s", when(col("id") % 2 === 0, "a").otherwise("b"))
    val out = Sampling.stratifiedSample(strat, col("id"), col("s"),
        Map("a" -> 0.3, "b" -> 0.05))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(out("a") - 1500) < 200, out.toString)
    assert(math.abs(out("b") - 250) < 100, out.toString)
  }

  test("as-of join attaches the latest preceding right row per key") {
    import java.sql.Timestamp
    def ts(m: Long) = new Timestamp(1700000000000L + m * 60000L)
    val left = Seq((1L, ts(10), "e1"), (1L, ts(30), "e2"), (2L, ts(5), "e3"))
      .toDF("k", "t", "name")
    val right = Seq((1L, ts(8), 100.0), (1L, ts(20), 200.0), (3L, ts(1), 999.0))
      .toDF("k", "t", "v")
    val out = AsofJoin.asofJoin(left, right, "k", "t", Seq("v"))
      .select("name", "asof_v").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("e1") == Some(100.0), "latest right at-or-before ts(10) is ts(8)")
    assert(out("e2") == Some(200.0))
    assert(out("e3") == None, "no preceding right row for key 2")
    // inclusive semantics: equal timestamps match
    val eq = AsofJoin.asofJoin(
      Seq((1L, ts(8), "x")).toDF("k", "t", "name"), right, "k", "t", Seq("v"))
      .select("asof_v").head.getDouble(0)
    assert(eq == 100.0)
  }

  test("connected components agree with union-find on random graphs") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 3) {
      val n = 60
      val edges = (1 to 50).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // driver-side union-find reference
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(id => id -> {
          // min node id in the component
          val root = find(id.toInt)
          (0 until n).filter(j => find(j) == root)
            .filter(j => edges.exists(e => e._1 == j || e._2 == j)).min.toLong
        }).toMap
      // maxLocalEdges = 0: the reference IS union-find, so route the
      // operator through the distributed loop to test the other path
      val got = Dedup.connectedComponents(
          edges.toDF("id_a", "id_b"), "id_a", "id_b", maxLocalEdges = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"trial $trial: $got vs $expected")
    }
  }

  test("as-of join agrees with a driver-side reference on random data") {
    import java.sql.Timestamp
    val rnd = new scala.util.Random(17)
    def ts(m: Long) = new Timestamp(1700000000000L + m * 1000L)
    val leftRows = (1 to 80).map(i =>
      (rnd.nextInt(5).toLong, ts(rnd.nextInt(1000).toLong), i.toLong))
    // unique right timestamps per key (ties among right rows are
    // engine-ambiguous in any as-of implementation)
    val rightRows = (1 to 60).map(i =>
      (rnd.nextInt(5).toLong, ts(i * 17L), i * 1.5))
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    val out = AsofJoin.asofJoin(
        leftRows.toDF("k", "t", "row_id"), rightRows.toDF("k", "t", "v"),
        "k", "t", Seq("v"))
      .collect().map(r => r.getAs[Long]("row_id") -> Option(r.get(r.fieldIndex("asof_v"))))
      .toMap
    leftRows.foreach { case (k, lt, rowId) =>
      val expected = rightRows.filter(r => r._1 == k && !r._2.after(lt))
        .sortBy(_._2.getTime).lastOption.map(_._3)
      assert(out(rowId) == expected, s"row $rowId key $k t=$lt")
    }
  }

  test("new operators tolerate degenerate inputs") {
    // empty pair list -> empty cluster assignment (no hang, no NPE)
    val emptyPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(emptyPairs, "id_a", "id_b").count() == 0)
    // boilerplate removal with no shared lines leaves every doc intact
    val solo = Seq((1L, "unique line one\nunique line two")).toDF("doc_id", "text")
    val kept = TextAnalysis.removeBoilerplate(solo, "doc_id", "text", minDocs = 2)
      .head
    assert(kept.getString(1) == "unique line one\nunique line two")
    assert(kept.getLong(3) == 0L, "nothing removed")
    // sampling extremes: frac 0 keeps nothing, frac 1 keeps everything
    val df = spark.range(100).toDF("id")
    assert(Sampling.sample(df, col("id"), 0.0).count() == 0)
    assert(Sampling.sample(df, col("id"), 1.0).count() == 100)
    // as-of join with an empty right side: all payloads null, rows kept
    import java.sql.Timestamp
    val l = Seq((1L, new Timestamp(1000L), "a")).toDF("k", "t", "name")
    val r = Seq.empty[(Long, Timestamp, Double)].toDF("k", "t", "v")
    val out = AsofJoin.asofJoin(l, r, "k", "t", Seq("v")).collect()
    assert(out.length == 1 && out(0).isNullAt(out(0).fieldIndex("asof_v")))
    // bm25 with query terms absent from the corpus: empty result
    val bm = TextAnalysis.bm25(solo, "doc_id", "text", Seq("zzzqqq"))
    assert(bm.count() == 0)
  }

  test("queryLikelihood: hand-computed Dirichlet scores; zero-tf terms still contribute") {
    val docs = Seq((1L, "a b a"), (2L, "b c"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = TextAnalysis.queryLikelihood(docs, "doc_id", "text",
      Seq("a", "c"), mu = 1.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // |C| = 5, cf_a = 2, cf_c = 1 → priors 0.4 and 0.2
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d1 = math.log((2 + 0.4) / 4.0) + math.log((0 + 0.2) / 4.0)
    val d2 = math.log((0 + 0.4) / 3.0) + math.log((1 + 0.2) / 3.0)
    assert(got(1L) == r6(d1) && got(2L) == r6(d2), got.toString)
    assert(!got.contains(3L), "null text never scores")
    // a longer doc with the same tf scores LOWER (length normalization)
    val len = Seq((1L, "a x"), (2L, "a x x x x x")).toDF("doc_id", "text")
    val ls = TextAnalysis.queryLikelihood(len, "doc_id", "text", Seq("a"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ls(1L) > ls(2L))
  }

  test("captureRecapture: Chapman estimate from orientation-normalized catches") {
    val c1 = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("id_a", "id_b")
    // flipped orientation + a duplicate row must not inflate the catch
    val c2 = Seq((2L, 1L), (2L, 1L), (3L, 4L)).toDF("id_a", "id_b")
    val r = Dedup.captureRecapture(c1, c2).head()
    assert(r.getLong(0) === 3L && r.getLong(1) === 2L && r.getLong(2) === 2L)
    // chapman = 4·3/3 − 1 = 3 (the true total when catch1 saw it all)
    assert(r.getLong(3) === 3L)
    assert(r.getLong(4) === 1000000L && r.getLong(5) === 666666L)
  }

  test("captureRecaptureFromText: fused dual-detector pass == standalone detectors") {
    // a corpus with planted near-dups so BOTH detectors catch pairs
    val base = Seq(
      "the quick brown fox jumps over the lazy dog again and again tonight",
      "spark runs distributed queries over columnar parquet files at scale",
      "all work and no play makes for a very dull data engineer indeed")
    val docs = (0 until 30).map { i =>
      val t = base(i % 3)
      val txt = if (i < 6) t else t + s" tail${i % 5} extra token"
      (i.toLong, txt)
    }.toDF("doc_id", "text")
    val mh = Dedup.minhashLsh(docs, "doc_id", "text",
        bands = 4, rowsPerBand = 3, threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sp = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh.nonEmpty && sp.nonEmpty)
    val fused = Dedup.captureRecaptureFromText(docs, "doc_id", "text",
      bands = 4, rowsPerBand = 3, threshold = 0.6, maxHamming = 6).head()
    val ref = Dedup.captureRecapture(
      Dedup.minhashLsh(docs, "doc_id", "text", bands = 4, rowsPerBand = 3,
        threshold = 0.6),
      Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 6)).head()
    for (i <- 0 until 6)
      assert(fused.getLong(i) === ref.getLong(i), s"col $i: $fused vs $ref")
  }

  test("quantileNormalize: equal-size slices map onto the SAME pooled positions") {
    val df = Seq(
      ("a", 1L, 0.10), ("a", 2L, 0.20), ("a", 3L, 0.30),
      ("b", 4L, 1.00), ("b", 5L, 2.00), ("b", 6L, 3.00))
      .toDF("g", "id", "v")
    val got = Ranking.quantileNormalize(df, "g", "v", "id")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // pooled cents sorted: 10,20,30,100,200,300 (N=6); each slice has
    // n=3 → positions ⌊r·6/4⌋+1 = 2,4,5 → values 20,100,200 for BOTH
    // slices — the shifted distribution lands on the identical grid
    assert(got(1L) == 20L && got(2L) == 100L && got(3L) == 200L, got.toString)
    assert(got(4L) == 20L && got(5L) == 100L && got(6L) == 200L)
  }

  test("langMix: code-switched doc splits langs; monolingual stays pure") {
    val en = Array.fill(30)("the and of to in is").mkString(" ")
    val fr = Array.fill(30)("le la les et est dans").mkString(" ")
    val docs = Seq((1L, en + " " + fr), (2L, en)).toDF("doc_id", "text")
    val got = TextAnalysis.langMix(spark, docs, "doc_id", "text",
        chunkSize = 60)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))).toMap
    val (n1, k1, maj1, _) = got(1L)
    assert(k1 >= 2, s"switched doc must show >1 language: $k1")
    assert(n1 > 5)
    assert(Set("en", "fr").contains(maj1))
    val (_, k2, maj2, ppm2) = got(2L)
    assert(k2 == 1 && maj2 == "en" && ppm2 == 1000000L,
      s"monolingual doc: $k2 $maj2 $ppm2")
  }

  test("onionOverlap: shared shingles mark assembled docs; singles stay clean") {
    val docs = Seq(
      (1L, "w1 w2 w3 w4"), (2L, "w1 w2 w3 w5"), (3L, "x y z q"))
      .toDF("doc_id", "text")
    val got = Dedup.onionOverlap(docs, "doc_id", "text", w = 3, minDf = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    // docs 1/2 share shingle "w1 w2 w3": 1 of 2 distinct shingles
    assert(got(1L) == ((2L, 1L, 500000L, false)), got(1L).toString)
    assert(got(2L) == ((2L, 1L, 500000L, false)))
    assert(got(3L) == ((2L, 0L, 0L, true)))
    // repeated shingles inside ONE doc are not cross-doc overlap
    val self = Seq((1L, "p q r p q r p q"), (2L, "unrelated words here"))
      .toDF("doc_id", "text")
    val s = Dedup.onionOverlap(self, "doc_id", "text", w = 3, minDf = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(s(1L) == 0L, "distinct-per-doc shingles: no self-df inflation")
  }

  test("BPE training learns hand-checkable merges; counts reflect them") {
    // words: "aa" x2, "ab" x1 -> pair (a,a) count 2 wins, then the only
    // remaining pair (a,b) count 1; then nothing mergeable -> stops early
    val d = Seq((1L, "aa aa ab")).toDF("doc_id", "text")
    val merges = Tokenizer.trainBpe(d, "text", numMerges = 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq == Seq((0, "a", "a", 2L), (1, "a", "b", 1L)),
      merges.mkString(";"))
    // token counts under the learned merges: "aa"->1, "ab"->1
    val ms = merges.map(m => (m._2, m._3))
    val counts = Tokenizer.bpeTokenCount(spark, d, "doc_id", "text", ms)
      .collect().map(r => r.getLong(1))
    assert(counts.toSeq == Seq(3L), counts.mkString(","))
    // no merges: every char is a token (2 + 2 + 2)
    val raw = Tokenizer.bpeTokenCount(spark, d, "doc_id", "text", Array.empty)
      .collect()(0).getLong(1)
    assert(raw == 6L)
    // ties break lexicographically: "ba ba ab ab" -> (a,b) before (b,a)
    val t = Seq((1L, "ba ba ab ab")).toDF("doc_id", "text")
    val tm = Tokenizer.trainBpe(t, "text", numMerges = 1)
      .collect().map(r => (r.getString(1), r.getString(2)))
    assert(tm.toSeq == Seq(("a", "b")), tm.mkString(";"))
    // token SEQUENCES: "aa ab" under merges [(a,a),(a,b)] -> ["aa","ab"]
    // in document order, with null text emitting nothing
    val seqs = Tokenizer.bpeEncode(spark,
        Seq((1L, "aa ab"), (2L, null.asInstanceOf[String])).toDF("doc_id", "text"),
        "doc_id", "text", Array(("a", "a"), ("a", "b")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(seqs.toSeq.sorted == Seq((1L, 0L, "aa"), (1L, 1L, "ab")),
      seqs.mkString(";"))
  }

  test("BPE merge loop agrees with a brute-force reference on random corpora") {
    // reference: literally re-derive each merge by scanning every word's
    // current symbol sequence — independent arithmetic from the
    // hash-map/tiebreak implementation under test
    def refMerges(words: Seq[(String, Long)], n: Int): Seq[(String, String, Long)] = {
      var ws = words.map { case (w, c) => (w.map(_.toString).toList, c) }
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
      for (_ <- 0 until n if ws.exists(_._1.size > 1)) {
        val counts = ws.flatMap { case (ss, c) =>
          ss.zip(ss.drop(1)).map(p => (p, c))
        }.groupBy(_._1).map { case (p, xs) => (p, xs.map(_._2).sum) }
        if (counts.nonEmpty) {
          val ((l, r), c) = counts.toSeq.minBy { case ((a, b), m) => (-m, a, b) }
          out += ((l, r, c))
          ws = ws.map { case (ss, cnt) =>
            val b = scala.collection.mutable.ListBuffer.empty[String]
            var rest = ss
            while (rest.nonEmpty) rest match {
              case x :: y :: t if x == l && y == r => b += x + y; rest = t
              case x :: t => b += x; rest = t
              case Nil =>
            }
            (b.toList, cnt)
          }
        }
      }
      out.toSeq
    }
    val rnd = new scala.util.Random(29)
    for (trial <- 1 to 5) {
      val vocab = Seq.fill(12)(Seq.fill(1 + rnd.nextInt(5))(
        ('a' + rnd.nextInt(3)).toChar).mkString)
      val text = Seq.fill(40)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val d = Seq((1L, text)).toDF("doc_id", "text")
      val got = Tokenizer.trainBpe(d, "text", numMerges = 6)
        .orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
      val wc = text.split(" ").groupBy(identity)
        .map { case (w, xs) => (w, xs.length.toLong) }.toSeq
      val want = refMerges(wc, 6)
      assert(got == want, s"trial $trial: $got vs $want (text: $text)")
    }
  }

  test("distributed BPE rounds equal the driver loop on the full vocab") {
    // force the distributed route with a routing threshold below the
    // vocabulary size; merges must equal the driver loop's exactly —
    // the round-11 uncapped-vocab contract (maxVocabWords routes, it
    // no longer truncates)
    val rnd = new scala.util.Random(31)
    val vocab = Seq.fill(20)(Seq.fill(1 + rnd.nextInt(5))(
      ('a' + rnd.nextInt(3)).toChar).mkString)
    val text = Seq.fill(80)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val d = Seq((1L, text)).toDF("doc_id", "text")
    val (driver, sDriver) = Tokenizer.trainBpeWithStats(d, "text",
      numMerges = 8, maxVocabWords = 65536)
    val (dist, sDist) = Tokenizer.trainBpeWithStats(d, "text",
      numMerges = 8, maxVocabWords = 2)
    val a = driver.orderBy("rank").collect().map(r =>
      (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val b = dist.orderBy("rank").collect().map(r =>
      (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(a == b, s"$a vs $b")
    // nothing is dropped on either route
    assert(sDriver.droppedMass == 0 && sDist.droppedMass == 0)
    assert(sDist.keptWords == sDist.totalWords)
  }

  test("URL extraction + domain stats normalize hosts and count mentions") {
    val d = Seq(
      (1L, "read https://WWW.Example.COM/a and https://example.com/b today"),
      (2L, "see http://other.org/x"),
      (3L, "no links here")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.domainStats(d, "doc_id", "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map("example.com" -> ((1L, 2L)), "other.org" -> ((1L, 1L))),
      out.toString)
  }

  test("random projection preserves norms approximately and is deterministic") {
    val rnd = new scala.util.Random(9)
    val rows = (0 until 200).map(i => (i.toLong, Array.fill(64)(rnd.nextGaussian())))
    val df = rows.toDF("id", "v")
    val p1 = Embeddings.randomProject(df, "id", "v", outDim = 16)
      .as[(Long, Seq[Double])].collect().toMap
    val p2 = Embeddings.randomProject(df, "id", "v", outDim = 16)
      .as[(Long, Seq[Double])].collect().toMap
    assert(p1 == p2, "projection must be deterministic")
    // JL: E[||proj||^2] = ||v||^2; with 16 dims the ratio concentrates —
    // check the mean ratio across 200 vectors is near 1
    val ratios = rows.map { case (id, v) =>
      val n2 = v.map(x => x * x).sum
      p1(id).map(x => x * x).sum / n2
    }
    val mean = ratios.sum / ratios.length
    assert(math.abs(mean - 1.0) < 0.15, s"mean norm ratio $mean")
    // empty input: empty projection frame, no crash
    assert(Embeddings.randomProject(df.filter(col("id") < 0), "id", "v", 8)
      .count() == 0)
  }

  test("concat-and-chunk packing matches a sequential prefix-sum reference") {
    val rnd = new scala.util.Random(5)
    val rows = (0 until 5000).map(i => (i.toLong, (rnd.nextInt(400) + 1).toLong))
    val df = rows.toDF("id", "tok")
    val out = Packing.concatChunk(df, "id", "tok", contextLen = 512)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    var off = 0L
    rows.foreach { case (id, tok) =>
      val expect = (off, off / 512, (off + tok - 1) / 512)
      assert(out(id) == expect, s"doc $id: ${out(id)} vs $expect")
      off += tok
    }
    // invariant: consecutive docs tile the stream with no gaps/overlap
    assert(out(4999L)._1 + rows(4999)._2.toLong ==
      rows.map(_._2).sum, "offsets tile the full stream")
  }

  test("bigram LM perplexity: fluent docs score lower; unseen bigrams still score") {
    val corpus = ((0 until 20).map(i => (i.toLong, "the cat sat on the mat")) :+
      (100L, "zx qv jk pl mn")).toDF("doc_id", "text")
    val nll = TextAnalysis.lmPerplexity(corpus, corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(nll(0L) < nll(100L),
      s"common phrasing ${nll(0L)} must beat gibberish ${nll(100L)}")
    // held-out doc: "the cat" is a corpus bigram, "cat flew" is not —
    // smoothing must yield a finite score, unseen worse than seen
    val held = Seq((500L, "the cat flew")).toDF("doc_id", "text")
    val h = TextAnalysis.lmPerplexity(corpus, held, "doc_id", "text").collect()
    assert(h.length == 1 && h(0).getLong(1) == 2 && h(0).getDouble(2).isFinite)
    // a doc with fewer than two words has no bigrams and drops out
    val tiny = Seq((501L, "word")).toDF("doc_id", "text")
    assert(TextAnalysis.lmPerplexity(corpus, tiny, "doc_id", "text").count() == 0)
  }

  test("quantiles: exact interpolation; sketch rank-exact at full accuracy, bounded at low") {
    // permutation of 0..9999 (7919 coprime with 10000): distinct values,
    // value == rank, so sketch rank error reads directly in value units
    val vals = (0 until 10000).map(i => ((i * 7919) % 10000).toDouble)
    val df = vals.toDF("v")
    val sorted = vals.sorted
    val probs = Seq(0.1, 0.5, 0.9)
    val ex = Quantiles.exact(df, "v", probs).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    for (p <- probs) {
      val pos = p * (sorted.length - 1)
      val lo = math.floor(pos).toInt
      val want = sorted(lo) + (pos - lo) * (sorted(lo + 1) - sorted(lo))
      assert(math.abs(ex(p) - want) < 1e-9, s"exact p=$p: ${ex(p)} vs $want")
    }
    val full = Quantiles.approx(df, "v", probs, accuracy = 100000).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    for (p <- probs) {
      val disc = sorted(math.floor(p * (sorted.length - 1)).toInt)
      assert(full(p) == disc, s"full-accuracy sketch p=$p: ${full(p)} vs $disc")
    }
    val rough = Quantiles.approx(df, "v", probs, accuracy = 100).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    for (p <- probs)
      assert(math.abs(rough(p) - full(p)) <= 200.0,
        s"rank error beyond n/accuracy at p=$p: ${rough(p)} vs ${full(p)}")
  }

  test("exactScale quantiles match the buffering exact path, ties and edges included") {
    val probs = Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
    // heavy ties (mod 97) + a shuffled distinct tail
    val vals = (0 until 5000).map(i => ((i * 7919) % 97).toDouble) ++
      (0 until 500).map(i => 1000.0 + (i * 311) % 500)
    val df = vals.toDF("v").repartition(7)
    val ex = Quantiles.exact(df, "v", probs).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val sc = Quantiles.exactScale(df, "v", probs).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    for (p <- probs)
      assert(sc(p) == ex(p), s"p=$p: exactScale ${sc(p)} vs exact ${ex(p)}")
    // single row: every quantile is that value
    val one = Quantiles.exactScale(Seq(42.0).toDF("v"), "v", Seq(0.0, 0.5, 1.0))
      .collect().map(_.getDouble(1))
    assert(one.forall(_ == 42.0))
    // all-equal column
    val eq = Quantiles.exactScale(Seq.fill(100)(7.5).toDF("v"), "v", Seq(0.25, 0.75))
      .collect().map(_.getDouble(1))
    assert(eq.forall(_ == 7.5))
    // nulls are ignored, empty input raises
    val withNull = Seq(Option(1.0), None, Option(3.0)).toDF("v")
    val wn = Quantiles.exactScale(withNull, "v", Seq(0.5)).collect()
    assert(wn.head.getDouble(1) == 2.0)
    intercept[IllegalArgumentException] {
      Quantiles.exactScale(Seq(Option.empty[Double]).toDF("v"), "v", Seq(0.5))
    }
  }

  test("chunkText windows cover the doc with the declared overlap") {
    val d = Seq(
      (1L, "a" * 400),            // 3 chunks: 0, 150, 300
      (2L, "b" * 180),            // exactly one window
      (3L, "c" * 181),            // spills into a second chunk
      (4L, "short"),              // shorter than the overlap -> one chunk
      (5L, "")                    // empty -> no chunks
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunkText(d, "doc_id", "text", 180, 30)
      .orderBy("doc_id", "chunk_id").collect()
    val byDoc = out.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(byDoc == Map(1L -> 3, 2L -> 1, 3L -> 2, 4L -> 1))
    // consecutive chunks share exactly `overlap` characters
    val doc1 = out.filter(_.getLong(0) == 1L)
    assert(doc1.map(_.getInt(2)).toSeq == Seq(0, 150, 300))
    assert(doc1.take(2).forall(_.getString(3).length == 180))
    assert(doc1.last.getString(3).length == 100, "final partial chunk")
    // reassembling chunk strides reproduces the document
    val d3 = out.filter(_.getLong(0) == 3L).map(_.getString(3))
    assert(d3(0).take(150) + d3(1) == "c" * 181)
  }

  test("rolling features: frames match a sequential reference") {
    import java.sql.Timestamp
    val rows = Seq(
      // key 1: 6 events, one per 10 min; values 1..6
      (1L to 6L).map(i => (10L * i, new Timestamp(1700000000000L + i * 600000L), 1L, i.toDouble)),
      // key 2: two events in the same second (range ties)
      Seq((100L, new Timestamp(1700000000000L), 2L, 5.0),
          (101L, new Timestamp(1700000000000L), 2L, 7.0))
    ).flatten.toDF("event_id", "ts", "user_id", "value")
    val out = Rolling.timeRange(
        Rolling.lastNRows(rows, col("user_id"), Seq(col("ts"), col("event_id")),
          n = 3, valCol = col("value")),
        col("user_id"), col("ts"), seconds = 1500, valCol = col("value"))
      .orderBy("event_id").collect()
    val k1 = out.filter(_.getLong(2) == 1L)
    assert(k1.map(_.getAs[Long]("roll_n")).toSeq == Seq(1L, 2L, 3L, 3L, 3L, 3L))
    // rows frame sums of cents: last 3 of 100,200,...,600
    assert(k1.map(_.getAs[Long]("roll_cents")).toSeq ==
      Seq(100L, 300L, 600L, 900L, 1200L, 1500L))
    // 1500 s = 25 min trailing range covers the current + 2 prior events
    assert(k1.map(_.getAs[Long]("range_n")).toSeq == Seq(1L, 2L, 3L, 3L, 3L, 3L))
    // same-second rows: both see both (range ties are symmetric)...
    val k2 = out.filter(_.getLong(2) == 2L)
    assert(k2.map(_.getAs[Long]("range_n")).toSeq == Seq(2L, 2L))
    assert(k2.map(_.getAs[Long]("range_cents")).toSeq == Seq(1200L, 1200L))
    // ...but the row frame orders them by the event_id tiebreak
    assert(k2.map(_.getAs[Long]("roll_cents")).toSeq == Seq(500L, 1200L))
  }

  test("salted skew join equals the plain join and splits the hot key") {
    val left = spark.range(10000).toDF("id")
      .withColumn("k", when(col("id") % 4 < 3, lit(7L)).otherwise(col("id") % 100))
      .withColumn("payload", col("id") * 2)
    val right = spark.range(100).toDF("k").withColumn("name", concat(lit("n"), col("k")))
    val salted = SkewJoin.saltedJoin(left, right, "k", saltBy = col("id"),
      salts = 8, hotThreshold = 500L)
    val plain = left.join(right, "k")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // the hot key's left rows really fan out across all 8 salts
    val hotSalts = left.filter(col("k") === 7L)
      .select((Sampling.hashBucket(col("id")) % 8).as("s"))
      .distinct().count()
    assert(hotSalts == 8L, s"hot key spread over $hotSalts salts")
    // no hot keys -> falls back to the plain join, still correct
    val cold = SkewJoin.saltedJoin(left, right, "k", saltBy = col("id"),
      salts = 8, hotThreshold = 100000L)
    assert(cold.count() == plain.count())
  }

  test("semDedup: within-cluster dups found, cross-cluster pairs never compared") {
    // two tight clusters around orthogonal axes + one exact dup per cluster
    def v(axis: Int, eps: Double) =
      Array.tabulate(4)(j => (if (j == axis) 1.0 else 0.0) + (if (j == 3) eps else 0.0))
    val rows = Seq(
      (1L, v(0, 0.00)), (2L, v(0, 0.00)),   // dup pair in cluster 0
      (3L, v(0, 0.30)),                     // same cluster, below threshold
      (10L, v(1, 0.00)), (11L, v(1, 0.00)), // dup pair in cluster 1
      (20L, v(2, 0.00))                     // alone in cluster 2
    ).toDF("id", "vec")
    val centroids = Array(v(0, 0.0), v(1, 0.0), v(2, 0.0))
    val pairs = Dedup.semDedup(rows, "id", "vec", centroids, threshold = 0.99)
      .orderBy("id_a").collect()
    assert(pairs.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 2L), (10L, 11L)))
    assert(pairs.forall(_.getDouble(3) > 0.999))
    // a degenerate cluster is skipped under the cap, others survive
    val capped = Dedup.semDedup(rows, "id", "vec", centroids,
      threshold = 0.99, maxClusterSize = 2)
    assert(capped.collect().map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((10L, 11L)))
  }

  test("tfidf: frequencies, idf, and minDf pruning match a hand count") {
    val d = Seq(
      (1L, "apple apple banana"),
      (2L, "apple cherry"),
      (3L, "banana banana date")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tfidf(d, "doc_id", "text", minDf = 2)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // apple: df 2; banana: df 2; cherry/date: df 1 -> pruned
    assert(out.keySet.map(_._2) == Set("apple", "banana"))
    val (tf, df, w) = out((1L, "apple"))
    assert(tf == 2L && df == 2L)
    assert(math.abs(w - 2.0 * math.log(3.0 / 2.0)) < 1e-12)
    assert(out((3L, "banana"))._1 == 2L)
  }

  test("per-group top-k keeps exactly k rows per group, ranked and stable") {
    val d = Seq(
      ("a", 1L, 0.9), ("a", 2L, 0.9), ("a", 3L, 0.5), ("a", 4L, 0.7),
      ("b", 5L, 0.1)
    ).toDF("g", "id", "score")
    val out = TopK.perGroup(d, Seq(col("g")),
        Seq(col("score").desc, col("id")), k = 2)
      .orderBy("g", "rank").collect()
      .map(r => (r.getString(0), r.getInt(3), r.getLong(1)))
    // tie at 0.9 breaks by id; group b has fewer than k rows
    assert(out.toSeq == Seq(("a", 1, 1L), ("a", 2, 2L), ("b", 1, 5L)))
  }

  test("KS statistic matches a sequential reference on known samples") {
    val a = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    val b = Seq(3.0, 4.0, 5.0, 6.0).toDF("v")
    val (d, na, nb) = Drift.ksStatistic(a, b, "v")
    // at v=2: F_a=0.5, F_b=0 -> gap 0.5 (the supremum)
    assert(na == 4L && nb == 4L)
    assert(math.abs(d - 0.5) < 1e-12)
    // identical samples -> zero drift
    val (z, _, _) = Drift.ksStatistic(a, a, "v")
    assert(z == 0.0)
    // disjoint supports -> full separation
    val (one, _, _) = Drift.ksStatistic(a, Seq(10.0, 11.0).toDF("v"), "v")
    assert(math.abs(one - 1.0) < 1e-12)
  }

  test("bloom contamination bounds the exact fraction from above") {
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely unrelated words about catalyst optimizer internals here"),
      (3L, "prefix words then the quick brown fox jumps over something else")
    ).toDF("doc_id", "text")
    val exact = TextAnalysis.contamination(corpus, "doc_id", "text", bench, "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val bloom = TextAnalysis.contaminationBloom(corpus, "doc_id", "text",
        bench, "text", fpp = 0.001)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(exact.keySet == bloom.keySet)
    // no false negatives: bloom >= exact everywhere; at this size, equal
    exact.foreach { case (id, e) =>
      assert(bloom(id) >= e - 1e-12, s"doc $id: bloom ${bloom(id)} < exact $e")
      assert(bloom(id) == e, s"doc $id: tiny filter should be exact")
    }
    assert(exact(1L) > 0.5 && exact(2L) == 0.0)
  }

  test("duplicate spans: maximal shared token runs on the right diagonals") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "z z a b c d e f q q"),
      (3L, "p q r s t u v w x y")).toDF("id", "text")
    val spans = Dedup.duplicateSpans(df, "id", "text", minTokens = 4, gramWidth = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(4)))
    // docs 1 and 2 share exactly "a b c d e f": 6 tokens at offsets 0 / 2
    assert(spans.toSet == Set((1L, 2L, 0, 2, 6L)))
  }

  test("containment flags a short excerpt that jaccard misses") {
    import spark.implicits._
    val long = (1 to 60).map(i => s"w$i").mkString(" ")
    val quote = (20 to 30).map(i => s"w$i").mkString(" ")   // 11 words
    val df = Seq(
      (1L, long),
      (2L, s"intro1 intro2 $quote outro1 outro2"),
      (3L, "totally unrelated words only here")).toDF("id", "text")
    val cont = Dedup.containmentPairs(df, "id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(cont.length == 1)
    val (s, b, c) = cont.head
    assert(s == 2L && b == 1L && c > 0.5)
    // the same pair is invisible to exact Jaccard at any useful threshold
    val jac = Dedup.ngramJaccardPairs(df, "id", "text", threshold = 0.3)
    assert(jac.count() == 0)
  }

  test("span removal excises later copies, keeps the first occurrence") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "z z a b c d e f q q"),   // loses "a b c d e f"
      (3L, "a b c d e f g h i j"))   // full copy: everything removed
      .toDF("id", "text")
    val out = Dedup.removeDuplicateSpans(df, "id", "text",
        minTokens = 4, gramWidth = 3)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.getString(3))))
    assert(out.toSeq == Seq(
      (1L, 10L, 10L, Some("a b c d e f g h i j")),
      (2L, 10L, 4L, Some("z z q q")),
      (3L, 10L, 0L, None)))
  }

  test("duplicate spans: disjoint shared runs stay separate maximal spans") {
    import spark.implicits._
    val df = Seq(
      (1L, "s1 s2 c1 c2 c3 c4 x1 x2 d1 d2 d3 d4 y1"),
      (2L, "c1 c2 c3 c4 q d1 d2 d3 d4")).toDF("id", "text")
    val spans = Dedup.duplicateSpans(df, "id", "text", minTokens = 4, gramWidth = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(4)))
    assert(spans.toSet == Set((1L, 2L, 2, 0, 4L), (1L, 2L, 8, 5, 4L)))
  }

  test("duplicate spans: maxDf cap drops corpus-wide boilerplate grams") {
    import spark.implicits._
    val boiler = "m1 m2 m3 m4 m5"
    val df = (1L to 5L).map(i => (i, s"doc$i $boiler end$i")).toDF("id", "text")
    val uncapped = Dedup.duplicateSpans(df, "id", "text", minTokens = 5, gramWidth = 3)
    assert(uncapped.count() == 10) // all C(5,2) pairs share the 5-token run
    val capped = Dedup.duplicateSpans(df, "id", "text", minTokens = 5, gramWidth = 3,
      maxDf = 4)
    assert(capped.count() == 0) // every boilerplate gram occurs 5 times > cap
  }

  test("profile: one-pass column stats with nulls, strings, and integers") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("aa"), Some(10L)),
      (2L, None, Some(30L)),
      (3L, Some("cccc"), None),
      (4L, Some("aa"), Some(20L))).toDF("id", "s", "v")
    val p = Profile.profile(df, Seq("id", "s", "v"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p("id").getLong(1) == 4 && p("id").getLong(2) == 0)
    assert(p("id").getLong(3) == 4)                       // distinct ids
    assert(p("id").getDouble(6) == 2.5)                   // mean of 1..4
    assert(p("s").getLong(2) == 1 && p("s").getLong(3) == 2)
    assert(p("s").getString(4) == "aa" && p("s").getString(5) == "cccc")
    assert(p("s").getDouble(7) == 2.666667) // avg_len rounded to 6 dp
    assert(p("v").getLong(2) == 1 && p("v").getDouble(6) == 20.0)
    assert(p("v").isNullAt(7))                            // no avg_len for ints
    // approx path: same frame shape, HLL cardinalities exact at this size
    val a = Profile.profile(df, Seq("id", "s"), approxDistinct = true)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(a("id") == 4 && a("s") == 2)
  }

  test("SON heavy hitters equal the full groupBy on a skewed corpus") {
    import spark.implicits._
    // 200 docs: 'hot' in all, 'warm' in even ids, unique filler per doc
    val df = (1L to 200L).map { i =>
      val warm = if (i % 2 == 0) " warm" else ""
      (i, s"hot$warm filler$i noise${i % 7}")
    }.toDF("id", "text").repartition(8)
    val got = Frequent.heavyTokens(df, "text", minCount = 29)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = df.select(explode(Dedup.words(col("text"))).as("t"))
      .groupBy("t").count().filter(col("count") >= 29)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
    assert(got("hot") == 200 && got("warm") == 100)
    assert(got.keySet.forall(t => t == "hot" || t == "warm" || t.startsWith("noise")))
  }

  test("shard export: prefix-sum placement, bounded shards, manifest round-trip") {
    import spark.implicits._
    val df = (1L to 50L).map(i => (i, "x" * 100)).toDF("doc_id", "text")
      .repartition(5)
    val assign = graft.sources.Export.assignShards(df, "doc_id",
        length(col("text")), shardBytes = 300)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // doc i (100 bytes) starts at (i-1)*100 -> shard = (i-1)*100 / 300
    assign.foreach { case (id, b, off, shard) =>
      assert(b == 100 && off == (id - 1) * 100 && shard == (id - 1) * 100 / 300)
    }
    val out = s"/tmp/graft-shards-${java.util.UUID.randomUUID().toString.take(8)}"
    val man = graft.sources.Export.writeShards(df, "doc_id",
      length(col("text")), 300, out)
    val m = man.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m.size == 17 && m(0L) == ((3L, 300L))) // 50 docs / 3-per-shard
    val back = spark.read.parquet(out)
    assert(back.count() == 50 && back.select("shard").distinct().count() == 17)
  }

  test("budget curation matches a sequential greedy reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    val rows = (1L to 300L).map(i => (i, rnd.nextInt(100), 1 + rnd.nextInt(50)))
    val df = rows.toDF("id", "q", "cost").repartition(7)
    val budget = 2000L
    val got = Curation.selectByBudget(df,
        Seq(col("q").desc, col("id")), col("cost"), budget)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    // sequential reference: cum threshold in (q desc, id) order
    var cum = 0L
    val want = rows.sortBy { case (id, q, _) => (-q, id) }.flatMap { case (id, _, c) =>
      val before = cum; cum += c
      if (before + c <= budget) Some(id -> before) else None
    }.toMap
    assert(got == want)
    assert(got.nonEmpty && got.size < 300)
  }

  test("streaming: score a fitted model over a structured stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext
    val train = SparkSpec.regressionDF(spark)
    val m = graft.ml.SgdNet.fit(train, Seq("x1", "x2"), "y",
      graft.ml.SgdNetParams(lambda = Array(0.1)))
    val input = MemoryStream[(Double, Double)]
    input.addData((1.0, 2.0), (0.5, -1.0), (3.0, 0.0))
    val scored = input.toDF().toDF("x1", "x2")
      .withColumn("pred", m.linkCol(0))
    val q = scored.writeStream.format("memory").queryName("graft_scores")
      .trigger(Trigger.Once()).start()
    q.awaitTermination(30000)
    val out = spark.sql("select * from graft_scores").collect()
    assert(out.length == 3)
    assert(out.forall(r => !r.getDouble(2).isNaN))
  }

  test("per-group budget selection keeps each group's greedy prefix") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a", 50L), (2L, "a", 40L), (3L, "a", 30L),  // a: budget 100
      (4L, "b", 80L), (5L, "b", 10L)                    // b: budget 85
    ).toDF("id", "g", "cost")
    val budgets = Seq(("a", 100L), ("b", 85L)).toDF("g", "budget")
    val kept = Curation.selectByGroupBudget(docs, col("g"),
        Seq(col("cost").desc, col("id").asc), col("cost"),
        budgets, "g", "budget")
      .select("id").collect().map(_.getLong(0)).toSet
    // a: 50 + 40 = 90 fits, +30 would exceed; b: 80 fits, +10 exceeds
    assert(kept == Set(1L, 2L, 4L))
  }

  test("temperature budgets: exact integer apportionment on random inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 8) {
      val doms = (1 to 1 + rnd.nextInt(8))
        .map(i => (s"d$i", 1L + rnd.nextInt(100000).toLong))
      val budget = 1L + rnd.nextInt(1000000).toLong
      val out = Sampling.temperatureBudgets(doms.toDF("d", "m"),
        col("d"), col("m"), budget).collect()
      assert(out.map(_.getLong(2)).sum == budget,
        s"allocations must sum exactly to $budget for $doms")
      assert(out.forall(_.getLong(2) >= 0))
    }
  }

  test("paragraph dedup invariant: total kept equals distinct paragraphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val pool = (1 to 10).map(i => s"para$i content piece number $i")
    val docs = (1L to 30L).map { id =>
      val k = 1 + rnd.nextInt(5)
      (id, Seq.fill(k)(pool(rnd.nextInt(pool.size))).mkString("\n"))
    }
    val out = Dedup.paragraphDedup(docs.toDF("id", "text"), "id", "text")
      .collect()
    // each distinct paragraph hash survives exactly once corpus-wide —
    // INCLUDING within-document repeats (only one copy of a repeated
    // paragraph inside the same doc keeps its slot)
    val distinctParas = docs.flatMap(_._2.split("\n")).distinct.size
    assert(out.map(_.getLong(2)).sum == distinctParas)
    // kept text is always an ordered subsequence of the original
    val orig = docs.toMap
    out.filter(!_.isNullAt(3)).foreach { r =>
      val keptSeq = r.getString(3).split("\n").toSeq
      val origSeq = orig(r.getLong(0)).split("\n").toSeq
      val it = origSeq.iterator
      assert(keptSeq.forall(p => it.contains(p)),
        s"doc ${r.getLong(0)}: kept text must be an ordered subsequence")
    }
  }

  test("round-8 operators tolerate degenerate inputs") {
    import spark.implicits._
    // paragraph dedup: null text explodes to no paragraphs — the doc
    // simply has no row (same contract as shingle ops on null text)
    val pd = Dedup.paragraphDedup(
      Seq((1L, null.asInstanceOf[String]), (2L, "a\nb")).toDF("id", "text"),
      "id", "text").collect()
    assert(pd.map(_.getLong(0)).toSet == Set(2L))
    // group sample with k >= group size returns the whole group
    val gs = Sampling.groupSample(
      Seq((1L, "g"), (2L, "g")).toDF("id", "grp"), col("id"), col("grp"), 10)
    assert(gs.count() == 2)
    // temperature budgets: a single domain takes the entire budget
    val tb = Sampling.temperatureBudgets(
      Seq(("only", 42L)).toDF("d", "m"), col("d"), col("m"), 777L).head()
    assert(tb.getLong(2) == 777L)
    // ohlc: a single event is its own open/high/low/close
    val one = Temporal.ohlcBars(
      Seq(("k", java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 1L, 3.5))
        .toDF("k", "ts", "id", "v"), "k", "ts", "id", col("v"), 60L).head()
    assert(one.getDouble(2) == 3.5 && one.getDouble(5) == 3.5 &&
      one.getLong(6) == 350L && one.getLong(7) == 1L)
    // epoch shuffle of an empty frame is empty (two-pass rank included)
    assert(Sampling.epochShuffle(
      spark.range(0).toDF("id"), col("id"), 1).count() == 0)
    // containment on disjoint docs: no pairs
    assert(Dedup.containmentPairs(
      Seq((1L, "aa bb cc dd"), (2L, "xx yy zz ww")).toDF("id", "text"),
      "id", "text", threshold = 0.1).count() == 0)
    // leakage split with no pairs: every id a singleton, all assigned
    val ls = Sampling.leakageSafeSplit(spark.range(1, 51).toDF("id"), "id",
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"), "id_a", "id_b",
      Seq("train" -> 0.9, "test" -> 0.1))
    assert(ls.count() == 50 && ls.filter(col("cluster_id") =!= col("id")).count() == 0)
    // span removal with no duplicates returns every doc unchanged
    val sr = Dedup.removeDuplicateSpans(
      Seq((1L, "a b c d e f")).toDF("id", "text"), "id", "text",
      minTokens = 4, gramWidth = 3).head()
    assert(sr.getLong(1) == 6L && sr.getLong(2) == 6L &&
      sr.getString(3) == "a b c d e f")
  }

  test("canonical url collapses variants, keeps real query differences") {
    val urls = Seq(
      (1L, "https://site.example.org/page"),
      (2L, "HTTPS://SITE.EXAMPLE.ORG/page"),
      (3L, "https://www.site.example.org:443/page/"),
      (4L, "https://site.example.org/page?utm_source=x&gclid=z"),
      (5L, "https://site.example.org/page#frag"),
      (6L, "https://site.example.org/page?b=2&a=1"),
      (7L, "https://site.example.org/page?a=1&b=2"), // same as 6 sorted
      (8L, "http://site.example.org:80/page")        // http, not https
    ).toDF("id", "url")
    val out = TextAnalysis.urlDedup(urls, "id", "url")
      .orderBy("canon_url").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("http://site.example.org/page", 8L, 1L),
      ("https://site.example.org/page", 1L, 5L),
      ("https://site.example.org/page?a=1&b=2", 6L, 2L)))
  }

  test("leakage-safe split keeps near-dup clusters in one split") {
    val ids = (1L to 200L).toDF("id")
    // chain clusters {1..5}, {10,11}, rest singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("id_a", "id_b")
    val out = Sampling.leakageSafeSplit(ids, "id", pairs, "id_a", "id_b",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(out.count() == 200)
    val byId = out.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // every member of a cluster shares the label AND the split
    assert((1L to 5L).map(byId(_)).toSet.size == 1)
    assert(Seq(10L, 11L).map(byId(_)).toSet.size == 1)
    assert(byId(1L)._1 == 1L && byId(10L)._1 == 10L)
    // all three splits non-empty at n=200 and fractions roughly honored
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > counts("val") && counts("train") > counts("test"))
  }

  test("epoch shuffle is a reproducible permutation that varies by epoch") {
    val ids = (1L to 300L).toDF("id")
    val e1 = Sampling.epochShuffle(ids, col("id"), 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(e1.keySet == (1L to 300L).toSet)           // a permutation
    assert(e1.values.toSeq.sorted == (0L until 300L)) // positions 0..n-1
    val e1b = Sampling.epochShuffle(ids, col("id"), 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(e1 == e1b)                                 // reproducible
    val e2 = Sampling.epochShuffle(ids, col("id"), 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(e1 != e2)                                  // epochs decorrelate
  }

  test("psi is ~zero on identical samples and flags a planted shift") {
    val a = (1 to 1000).map(i => (i % 100).toDouble).toDF("v")
    val same = Drift.psiBins(a, a, "v", Seq(25.0, 50.0, 75.0))
      .agg(sum(col("psi_term"))).head().getDouble(0)
    assert(math.abs(same) < 1e-12)
    // b concentrates mass in the top bin
    val b = (1 to 1000).map(i => 80.0 + (i % 20)).toDF("v")
    val shifted = Drift.psiBins(a, b, "v", Seq(25.0, 50.0, 75.0))
      .agg(sum(col("psi_term"))).head().getDouble(0)
    assert(shifted > 0.25, s"psi $shifted should flag the shift")
  }

  test("paragraph dedup keeps first global occurrence, nulls full copies") {
    val df = Seq(
      (1L, "alpha beta\nshared footer\ngamma delta"),
      (2L, "epsilon zeta\nshared footer"),        // loses the footer
      (3L, "alpha beta\nshared footer\ngamma delta"), // full copy: all gone
      (4L, "unique content here")
    ).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(df, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.getString(3))))
    assert(out.toSeq == Seq(
      (1L, 3L, 3L, Some("alpha beta\nshared footer\ngamma delta")),
      (2L, 2L, 1L, Some("epsilon zeta")),
      (3L, 3L, 0L, None),
      (4L, 1L, 1L, Some("unique content here"))))
  }

  test("group sample returns exactly k rows per group, stable under other groups") {
    val base = (1L to 100L).map(i => (i, if (i % 2 == 0) "a" else "b"))
    val out = Sampling.groupSample(base.toDF("id", "g"), col("id"), col("g"), 7)
    val byGroup = out.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGroup == Map("a" -> 7L, "b" -> 7L))
    // adding rows of a NEW group must not change group a's chosen ids
    val aIds = out.filter(col("g") === "a").select("id").collect()
      .map(_.getLong(0)).toSet
    val widened = (base ++ (200L to 250L).map(i => (i, "c")))
      .toDF("id", "g")
    val aIds2 = Sampling.groupSample(widened, col("id"), col("g"), 7)
      .filter(col("g") === "a").select("id").collect().map(_.getLong(0)).toSet
    assert(aIds == aIds2)
  }

  test("temperature budgets: integers, exact total, flattened shares") {
    // masses 90000 vs 10000: raw share 90/10, sqrt share 3/1
    val df = Seq.tabulate(100)(i =>
      (if (i < 90) "big" else "small", 1000L)).toDF("dom", "n")
    val out = Sampling.temperatureBudgets(df, col("dom"), col("n"), 1000L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out.values.sum == 1000L)
    assert(out("big") == 750L && out("small") == 250L)
  }

  test("rerank recovers the exact top-k from a superset shortlist") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = e.filter(col("vec_id") < 3)
    val brute = Ann.bruteForceTopK(e, queries, "vec_id", "embedding", k = 4)
    // shortlist: generous brute-force top-8 (superset of the true top-4)
    val shortlist = Ann.bruteForceTopK(e, queries, "vec_id", "embedding", k = 8)
      .select(col("query_id"), col("neighbor_id"))
    val reranked = Ann.rerank(shortlist, e, queries, "vec_id", "embedding",
      "query_id", "neighbor_id", k = 4)
    val a = brute.select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val b = reranked.select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(a == b)
  }
}
