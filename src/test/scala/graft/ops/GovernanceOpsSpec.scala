package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** k-anonymity, pair-set evaluation, label propagation, seasonality. */
class GovernanceOpsSpec extends SparkSpec {
  import spark.implicits._

  // ----------------------------------------------------------- kAnonymity

  test("kAnonymity: class sizes and l-diversity") {
    // classes: (a,x): 1 row; (a,y): 2 rows; (b,x): 5 rows (3 distinct s)
    val rows = (Seq(("a", "x", 1L), ("a", "y", 2L), ("a", "y", 2L)) ++
      (1 to 5).map(i => ("b", "x", (i % 3).toLong))).toDF("q1", "q2", "s")
    val r = DataQuality.kAnonymity(rows, Seq("q1", "q2"), "s", k = 3).head()
    assert(r.getAs[Long]("n_rows") === 8)
    assert(r.getAs[Long]("n_groups") === 3)
    assert(r.getAs[Long]("n_groups_lt_k") === 2)
    assert(r.getAs[Long]("n_rows_lt_k") === 3)
    assert(r.getAs[Long]("min_group") === 1)
    assert(r.getAs[Long]("min_l_diversity") === 1) // (a,x) and (a,y)
  }

  // ---------------------------------------------------------- pairSetEval

  test("pairSetEval: normalizes orientation and duplicates") {
    val truth = Seq((1L, 2L), (3L, 4L)).toDF("a", "b")
    val cand = Seq((2L, 1L), (1L, 2L), (5L, 6L)).toDF("a", "b")
    val r = Evaluation.pairSetEval(truth, cand, "a", "b").head()
    assert(r.getAs[Long]("n_truth") === 2)
    assert(r.getAs[Long]("n_cand") === 2) // reversed dup collapses
    assert(r.getAs[Long]("n_hit") === 1)
    assert(r.getAs[Long]("prec_ppm") === 500000L)
    assert(r.getAs[Long]("rec_ppm") === 500000L)
    assert(r.getAs[Long]("f1_ppm") === 500000L)
  }

  // ----------------------------------------------------- labelPropagation

  test("labelPropagation: hop-bounded spread with clamped seeds") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("s", "d")
    val seeds = Seq((1L, "A")).toDF("id", "lab")
    def labels(rounds: Int): Map[Long, String] =
      Graph.labelPropagation(path, "s", "d", seeds, "id", "lab", rounds)
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) null else r.getString(1))).toMap
    val one = labels(1)
    assert(one(2L) === "A" && one(3L) === null && one(4L) === null)
    val two = labels(2)
    assert(two(2L) === "A" && two(3L) === "A" && two(4L) === null)
  }

  test("labelPropagation: majority with deterministic tiebreak, clamping") {
    // node 5 sees one A and one B neighbor → tie → min label A
    val g = Seq((1L, 5L), (2L, 5L), (1L, 2L)).toDF("s", "d")
    val seeds = Seq((1L, "B"), (2L, "A")).toDF("id", "lab")
    val got = Graph.labelPropagation(g, "s", "d", seeds, "id", "lab", 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(5L) === "A")
    // seeds stay clamped even with a disagreeing neighborhood
    assert(got(1L) === "B" && got(2L) === "A")
  }

  // ------------------------------------------------------ seasonalProfile

  test("seasonalProfile: epoch-anchored day of week and shares") {
    val rows = Seq(
      ("k", "1970-01-01 10:00:00", 1.0), // Thursday → dow 4
      ("k", "1970-01-04 23:00:00", 2.0), // Sunday → dow 0
      ("k", "1970-01-01 10:30:00", 3.0))
      .toDF("k", "ts", "v")
    val cells = Analytics.seasonalProfile(rows, "k", "ts", "v")
      .collect().map(r => (r.getAs[Int]("dow"), r.getAs[Int]("hour")) -> r)
      .toMap
    assert(cells((4, 10)).getAs[Long]("n") === 2)
    assert(cells((4, 10)).getAs[Long]("sum_cents") === 400)
    assert(cells((4, 10)).getAs[Long]("share_ppm") === 2000000L / 3)
    assert(cells((0, 23)).getAs[Long]("n") === 1)
  }

  test("keyCandidates: real key, dup column, null-component disqualification") {
    val df = Seq(
      (1L, Some("a"), "x"), (2L, Some("a"), "y"),
      (3L, None: Option[String], "z"), (4L, Some("b"), "z"))
      .toDF("id", "grp", "tag")
    val got = DataQuality.keyCandidates(df,
        Seq(Seq("id"), Seq("grp"), Seq("tag"), Seq("grp", "tag")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5)))).toMap
    assert(got("id") == ((4L, 4L, 0L, 1000000L, true)))
    // grp: one NULL row excluded, 'a' duplicated → never a key
    assert(got("grp") == ((4L, 2L, 2L, 500000L, false)))
    // tag: no nulls but 'z' duplicated
    assert(got("tag") == ((4L, 3L, 1L, 750000L, false)))
    // (grp, tag): all distinct among non-null rows, but the NULL row
    // disqualifies the set
    assert(got("grp,tag") == ((4L, 3L, 1L, 750000L, false)))
  }

  test("nullPattern: correlated missingness counted in one pass") {
    val df = Seq(
      (Some(1.0), Some("p"), Some("t")),
      (None: Option[Double], None: Option[String], Some("t")),
      (None: Option[Double], Some("p"), None: Option[String]),
      (Some(2.0), None: Option[String], None: Option[String]))
      .toDF("v", "p", "t")
    val got = DataQuality.nullPattern(df, Seq("v", "p", "t"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    assert(got(("v", "p")) == ((4L, 2L, 2L, 1L, 250000L)))
    assert(got(("v", "t")) == ((4L, 2L, 2L, 1L, 250000L)))
    assert(got(("p", "t")) == ((4L, 2L, 2L, 1L, 250000L)))
  }
}
