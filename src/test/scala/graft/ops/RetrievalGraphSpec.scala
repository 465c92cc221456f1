package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** knnGraph, filteredTopK, lshPlan. */
class RetrievalGraphSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    // two tight clusters + one outlier
    (0L, Array(1.0f, 0.0f), 0), (1L, Array(0.99f, 0.1f), 0),
    (2L, Array(0.98f, 0.15f), 1),
    (10L, Array(0.0f, 1.0f), 0), (11L, Array(0.1f, 0.99f), 1),
    (12L, Array(0.15f, 0.98f), 1),
    (99L, Array(-1.0f, -1.0f), 0)
  ).toDF("vec_id", "embedding", "label")

  // ------------------------------------------------------------- knnGraph

  test("knnGraph: cluster members are mutual, outlier edges are one-way") {
    val g = Ann.knnGraph(vecs, "vec_id", "embedding", k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getInt(2), r.getBoolean(4)))).toMap
    // 0's 2-NN are 1 and 2 (same cluster) and vice versa -> mutual
    assert(g((0L, 1L))._2 && g((1L, 0L))._2)
    assert(g((0L, 2L))._2 && g((2L, 0L))._2)
    // the outlier's top-2 point into a cluster, but nothing points back
    val out99 = g.keys.filter(_._1 == 99L)
    assert(out99.size === 2)
    assert(out99.forall(e => !g(e)._2))
    // mutuality is symmetric by construction
    g.foreach { case ((s, d), (_, m)) =>
      if (m) assert(g.contains((d, s)) && g((d, s))._2)
    }
  }

  test("knnGraph: IVF route equals the exact route when probing all cells") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val centers = Ann.trainIvf(e, "vec_id", "embedding", nlist = 4)
    val exact = Ann.knnGraph(e, "vec_id", "embedding", k = 3)
    val ivf = Ann.knnGraph(e, "vec_id", "embedding", k = 3,
      centers = Some(centers), nprobe = 4)
    assert(exact.exceptAll(ivf).count() === 0)
    assert(ivf.exceptAll(exact).count() === 0)
  }

  test("knnGraph: exact route refuses an unbounded corpus") {
    intercept[IllegalArgumentException] {
      Ann.knnGraph(vecs, "vec_id", "embedding", k = 1, maxBruteRows = 3)
        .count()
    }
    ()
  }

  // --------------------------------------------------------- filteredTopK

  test("filteredTopK: every neighbor satisfies the predicate; k-deficit ok") {
    val q = vecs.filter(col("vec_id") === 0L)
    val r = Ann.filteredTopK(vecs, q, "vec_id", "embedding", k = 5,
      pred = col("label") === 1).collect()
    // only 3 label-1 vectors exist -> 3 rows, all from the eligible set
    assert(r.length === 3)
    assert(r.map(_.getAs[Long]("neighbor_id")).toSet === Set(2L, 11L, 12L))
    // nearest eligible is 2 (same cluster), not the global nearest 1
    assert(r.find(_.getAs[Int]("rank") == 1).get
      .getAs[Long]("neighbor_id") === 2L)
  }

  test("filteredTopK: lit(true) predicate reproduces the unfiltered scan") {
    val q = vecs.filter(col("vec_id") < 2)
    val a = Ann.filteredTopK(vecs, q, "vec_id", "embedding", k = 3,
      pred = lit(true))
    val b = Ann.bruteForceTopK(vecs, q, "vec_id", "embedding", k = 3)
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  // -------------------------------------------------------------- lshPlan

  test("lshPlan: budget respected, S-curve monotone, threshold bracketed") {
    val rows = Dedup.lshPlan(spark, threshold = 0.6, maxHashes = 64)
      .orderBy("s_pct").collect()
    assert(rows.length === 19)
    val b = rows.head.getAs[Long]("bands")
    val r = rows.head.getAs[Long]("rows_per_band")
    assert(b * r <= 64 && rows.head.getAs[Long]("n_hashes") === b * r)
    val ps = rows.map(_.getAs[Double]("p_candidate"))
    assert(ps.zip(ps.tail).forall { case (x, y) => x <= y })
    // S-curve crosses 1/2 somewhere around the target threshold
    val pLow = rows.find(_.getAs[Long]("s_pct") == 30L).get
      .getAs[Double]("p_candidate")
    val pHigh = rows.find(_.getAs[Long]("s_pct") == 85L).get
      .getAs[Double]("p_candidate")
    assert(pLow < 0.5 && pHigh > 0.5)
  }

  test("lshPlan: argmin matches a brute-force recomputation") {
    def objective(b: Int, r: Int, t: Double): BigDecimal = {
      var sum = BigDecimal(0)
      for (i <- 1 to 99) {
        val s = i.toDouble / 100.0
        val p = 1.0 - math.pow(1.0 - math.pow(s, r), b)
        val term = if (s < t) 0.5 * p else 0.5 * (1.0 - p)
        sum += BigDecimal(term).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }
      sum
    }
    for (t <- Seq(0.4, 0.8); budget <- Seq(16, 64)) {
      val best = (for { b <- 1 to budget; r <- 1 to budget / b }
        yield (objective(b, r, t), b, r)).minBy(x => (x._1, x._2, x._3))
      val row = Dedup.lshPlan(spark, t, budget).head()
      assert(row.getAs[Long]("bands") === best._2.toLong,
        s"t=$t budget=$budget")
      assert(row.getAs[Long]("rows_per_band") === best._3.toLong)
    }
  }

  test("minhashLsh planned defaults: threshold drives (b, r); never worse than the old fixed (4,3)") {
    import spark.implicits._
    // objective dominance: at every threshold the planned parameters'
    // S-curve area is <= the historical fixed default's
    for (t <- Seq(0.5, 0.6, 0.7, 0.8, 0.9)) {
      val (b, r) = Dedup.lshPlanParams(t, Dedup.DefaultLshBudget, 0.5)
      assert(b * r <= Dedup.DefaultLshBudget)
      assert(Dedup.lshObjective(t, 0.5, b, r) <=
        Dedup.lshObjective(t, 0.5, 4, 3), s"t=$t planned ($b,$r)")
    }
    // behavioral: the default call IS the planned-parameter call
    val docs = (0L until 20L).map { i =>
      val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
      (i, if (i % 2 == 0) base else base + s" tail${i % 3}")
    }.toDF("doc_id", "text")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect()
        .map(rw => (rw.getLong(0), rw.getLong(1))).toSet
    val (pb, pr) = Dedup.lshPlanParams(0.7, Dedup.DefaultLshBudget, 0.5)
    val planned = pairs(Dedup.minhashLsh(docs, "doc_id", "text",
      threshold = 0.7))
    val explicit = pairs(Dedup.minhashLsh(docs, "doc_id", "text",
      bands = pb, rowsPerBand = pr, threshold = 0.7))
    assert(planned == explicit && planned.nonEmpty)
    // passing exactly one of the pair is an error
    intercept[IllegalArgumentException] {
      Dedup.minhashLsh(docs, "doc_id", "text", bands = 4, threshold = 0.7)
    }
    ()
  }
}
