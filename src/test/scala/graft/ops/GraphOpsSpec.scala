package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Link prediction, clustering coefficient, assortativity, association
  * rules — the graph/co-occurrence similarity additions. */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------- linkPredict

  test("linkPredict: path graph scores the open wedge only") {
    val path = Seq((1L, 2L), (2L, 3L)).toDF("s", "d")
    val got = Graph.linkPredict(path, "s", "d").collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getAs[Long]("u") === 1L && r.getAs[Long]("v") === 3L)
    assert(r.getAs[Long]("cn") === 1L)
    assert(r.getAs[Long]("ra_e12") === 500000000000L) // 1e12 / deg(2)=2
    assert(r.getAs[Long]("jac_ppm") === 1000000L)     // 1/(1+1-1)
    assert(!r.getAs[Boolean]("is_edge"))
  }

  test("linkPredict: triangle pairs are flagged as existing edges") {
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("s", "d")
    val got = Graph.linkPredict(tri, "s", "d").collect()
    assert(got.length === 3)
    assert(got.forall(_.getAs[Boolean]("is_edge")))
    assert(got.forall(_.getAs[Long]("cn") === 1L))
    // each wedge middle has degree 2
    assert(got.forall(_.getAs[Long]("ra_e12") === 500000000000L))
    // jac: 1 common of (2 + 2 - 1) = 3 neighbors
    assert(got.forall(_.getAs[Long]("jac_ppm") === 1000000L / 3))
  }

  test("linkPredict: maxDegree drops super-hub middles") {
    val star = (1L to 5L).map(i => (0L, i)).toDF("s", "d")
    assert(Graph.linkPredict(star, "s", "d").count() === 10) // C(5,2)
    assert(Graph.linkPredict(star, "s", "d", maxDegree = 3).count() === 0)
  }

  // ------------------------------------------------------ clusteringCoeff

  test("clusteringCoeff: triangle with a pendant node") {
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L)).toDF("s", "d")
    val by = Graph.clusteringCoeff(g, "s", "d").collect()
      .map(r => r.getAs[Long]("id") -> r).toMap
    assert(by(1L).getAs[Long]("deg") === 3)
    assert(by(1L).getAs[Long]("n_triangles") === 1)
    assert(by(1L).getAs[Long]("coeff_ppm") === 2000000L / 6) // 2*1/(3*2)
    assert(by(2L).getAs[Long]("coeff_ppm") === 1000000L)     // closed pair
    assert(by(4L).getAs[Long]("deg") === 1)
    assert(by(4L).isNullAt(by(4L).fieldIndex("coeff_ppm")))  // deg < 2
  }

  // ------------------------------------------------- degreeAssortativity

  test("degreeAssortativity: star is perfectly disassortative") {
    val star = (1L to 4L).map(i => (0L, i)).toDF("s", "d")
    val r = Graph.degreeAssortativity(star, "s", "d").head()
    assert(r.getAs[Long]("n_edges") === 4)
    assert(r.getAs[Double]("assortativity") === -1.0)
  }

  test("degreeAssortativity: regular graph has zero degree variance") {
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("s", "d")
    val r = Graph.degreeAssortativity(cycle, "s", "d").head()
    assert(r.isNullAt(r.fieldIndex("assortativity"))) // 0/0: undefined
  }

  // ------------------------------------------------------ associationRules

  test("associationRules: hand-computed support/confidence/lift") {
    // baskets: {a,b}, {a,b}, {a,c}, {b}
    val bi = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c"), (4L, "b")).toDF("bk", "it")
    val rules = Frequent.associationRules(bi, "bk", "it", minSupport = 2)
      .collect().map(r => (r.getString(1), r.getString(0)) -> r).toMap
    // NOTE: select order is (ante, cons, ...) but join reorders columns;
    // key on the named fields instead
    val ab = rules.values.find(r =>
      r.getAs[String]("ante") == "a" && r.getAs[String]("cons") == "b").get
    assert(ab.getAs[Long]("n_a") === 3 && ab.getAs[Long]("n_b") === 3)
    assert(ab.getAs[Long]("n_ab") === 2)
    assert(ab.getAs[Long]("conf_ppm") === 2000000L / 3)
    // lift = n_ab * N / (n_a * n_b) = 2*4/9
    assert(ab.getAs[Long]("lift_ppm") === 8000000L / 9)
    // a→c has support 1 < 2: absent
    assert(!rules.values.exists(r =>
      r.getAs[String]("ante") == "a" && r.getAs[String]("cons") == "c"))
  }

  test("associationRules: mega-baskets drop whole before the pair join") {
    val small = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"))
    val mega = (1 to 10).map(i => (9L, s"x$i"))
    val bi = (small ++ mega).toDF("bk", "it")
    val rules = Frequent.associationRules(bi, "bk", "it",
      minSupport = 1, maxBasketSize = 4).collect()
    // only the two small baskets survive; no x* items anywhere
    assert(rules.forall(r => Set("a", "b")(r.getAs[String]("ante"))))
    val ab = rules.find(r => r.getAs[String]("ante") == "a" &&
      r.getAs[String]("cons") == "b").get
    assert(ab.getAs[Long]("n_ab") === 2)
    // N counts only kept baskets: lift = 2*2/(2*2) = 1
    assert(ab.getAs[Long]("lift_ppm") === 1000000L)
  }

  test("harmonicCentrality: path graph levels and integral harmonic sum") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val got = Graph.harmonicCentrality(e, "src", "dst", maxHops = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // endpoint: one node at each distance 1..3
    assert(got(1L) == ((1L, 1L, 1L, 1000000L + 500000L + 333333L)))
    // center: two at d=1, two at d=2, none at d=3
    assert(got(3L) == ((2L, 2L, 0L, 2000000L + 1000000L)))
    // symmetric input (both directions given) must not double-count
    val sym = (Seq((1L, 2L)) ++ Seq((2L, 1L))).toDF("src", "dst")
    val g2 = Graph.harmonicCentrality(sym, "src", "dst", maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g2(1L) == 1L && g2(2L) == 1L)
    // driver fast path == distributed frontier loop, bit-exact
    val rnd = new scala.util.Random(11)
    val re = Seq.fill(200)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(p => p._1 != p._2).toDF("src", "dst")
    def run(cap: Long) = Graph.harmonicCentrality(re, "src", "dst",
        maxHops = 3, maxLocalEdges = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sorted.toSeq
    assert(run(1L << 20) == run(0L), "local and distributed BFS differ")
  }

  test("personalizedPageRank: mass decays with distance from the seed") {
    // symmetric path 1-2-3-4-5, seed {1}: rank strictly decreases away
    // from the seed
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val e = (und ++ und.map(_.swap)).toDF("src", "dst")
    val pr = Graph.personalizedPageRank(e, "src", "dst", seeds = Seq(1L),
      iters = 8).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr(1L) > pr(2L) && pr(2L) > pr(3L) && pr(3L) > pr(4L),
      pr.toString)
    // a non-seed far node gets no teleport mass, only propagated mass
    assert(pr(5L) > 0L && pr(5L) < pr(1L) / 4)
  }

  test("personalizedPageRank: driver fast path == distributed loop, bit-exact") {
    val rnd = new scala.util.Random(5)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(p => p._1 != p._2)
    val e = edges.toDF("src", "dst")
    val seeds = Seq(3L, 7L)
    def run(cap: Long) =
      Graph.personalizedPageRank(e, "src", "dst", seeds, iters = 5,
          maxLocalEdges = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(run(1L << 20) == run(0L), "local and distributed paths differ")
  }
}
