package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** JSON field stats, session paths, conversion lag. */
class BehaviorOpsSpec extends SparkSpec {
  import spark.implicits._

  test("jsonFieldStats: typed extraction with null accounting") {
    val df = Seq(("a", """{"k": 5}"""), ("a", """{"k": 7}"""),
      ("a", """{"x": 1}"""), ("b", null.asInstanceOf[String]))
      .toDF("g", "props")
    val got = DataQuality.jsonFieldStats(df, "g", "props", "$.k").collect()
      .map(r => r.getAs[String]("g") -> r).toMap
    val a = got("a")
    assert(a.getAs[Long]("n") === 3L && a.getAs[Long]("n_null") === 1L)
    assert(a.getAs[Long]("min_v") === 5L && a.getAs[Long]("max_v") === 7L)
    assert(a.getAs[Long]("sum_v") === 12L)
    assert(got("b").getAs[Long]("n_null") === 1L)
  }

  test("sessionPaths: trigrams per user in event order, top-k") {
    def ts(s: Int) = new java.sql.Timestamp(1000L * s)
    val ev = Seq(
      (1L, ts(1), 1L, "view"), (1L, ts(2), 2L, "click"), (1L, ts(3), 3L, "buy"),
      (2L, ts(1), 4L, "view"), (2L, ts(2), 5L, "click"), (2L, ts(3), 6L, "buy"),
      (3L, ts(1), 7L, "view"), (3L, ts(2), 8L, "view"), (3L, ts(3), 9L, "exit"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Analytics.sessionPaths(ev, "user_id", "ts", "event_id",
      "event_type", k = 2).collect()
    assert(got(0).getAs[String]("path") === "view>click>buy")
    assert(got(0).getAs[Long]("n") === 2L)
    assert(got(1).getAs[String]("path") === "view>view>exit")
  }

  test("navEntropy: deterministic successor gives 0; uniform gives ln k") {
    def ts(s: Int) = new java.sql.Timestamp(1000L * s)
    // after "a" always "b" (H=0); after "b": c/d equally (H=ln 2)
    val ev = (0 until 8).flatMap { u =>
      val nxt = if (u % 2 == 0) "c" else "d"
      Seq((u.toLong, ts(1), 1L + u * 10, "a"), (u.toLong, ts(2), 2L + u * 10, "b"),
        (u.toLong, ts(3), 3L + u * 10, nxt))
    }.toDF("user_id", "ts", "event_id", "event_type")
    val got = Analytics.navEntropy(ev, "user_id", "ts", "event_id",
      "event_type").collect()
      .map(r => r.getAs[String]("from_type") -> r.getAs[Double]("h_nats")).toMap
    assert(got("a") === 0.0)
    assert(math.abs(got("b") - math.log(2.0)) < 1e-6)
  }

  test("integrityAudit: counts orphans and duplicate parent keys") {
    val child = Seq((1L, Some(10L)), (2L, Some(10L)), (3L, Some(99L)),
      (4L, None: Option[Long])).toDF("id", "fk")
    val parent = Seq(10L, 11L, 11L).map(Tuple1(_)).toDF("pk")
    val got = DataQuality.integrityAudit(
      Seq(("c->p", child, "fk", parent, "pk"))).head()
    assert(got.getAs[Long]("n_child") === 3L)   // null fk excluded
    assert(got.getAs[Long]("n_orphans") === 1L) // fk=99
    assert(got.getAs[Long]("orphan_ppm") === 333333L)
    assert(got.getAs[Long]("n_parent") === 3L)
    assert(got.getAs[Long]("pk_dup_rows") === 1L) // 11 twice
  }

  test("kAnonLadder: coarsening removes uniqueness") {
    val df = Seq(
      ("en", "s1", 1L), ("en", "s1", 1L),   // k=2 cell
      ("en", "s2", 2L),                       // unique at level 3 AND 2
      ("fr", "s1", 3L), ("fr", "s1", 4L))    // unique cells, same (fr,s1)
      .toDF("lang", "source", "len_bucket")
    val got = DataQuality.kAnonLadder(df, Seq("lang", "source", "len_bucket"))
      .collect().map(r => r.getAs[Int]("level") -> r).toMap
    assert(got(3).getAs[Long]("n_groups") === 4L)
    assert(got(3).getAs[Long]("n_singletons") === 3L)
    assert(got(2).getAs[Long]("n_groups") === 3L)
    assert(got(2).getAs[Long]("n_singletons") === 1L) // only (en,s2)
    assert(got(1).getAs[Long]("n_groups") === 2L)
    assert(got(1).getAs[Long]("n_singletons") === 0L)
  }

  test("conversionLag: first view to first subsequent purchase") {
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-05-${d + 1}%02d 10:00:00")
    val ev = Seq(
      (1L, ts(0), "view"), (1L, ts(3), "purchase"), (1L, ts(9), "purchase"),
      (2L, ts(5), "purchase"), (2L, ts(6), "view"), // purchase BEFORE view: no conv
      (3L, ts(2), "view"))                          // never converts
      .toDF("user_id", "ts", "event_type")
    val got = Analytics.conversionLag(ev, "user_id", "ts", "event_type",
      "view", "purchase").collect()
    assert(got.length === 1)
    assert(got(0).getAs[Long]("lag_days") === 3L)
    assert(got(0).getAs[Long]("n_users") === 1L)
  }
}
