package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cluster-size distribution, top movers, lateness profile. */
class StreamHealthSpec extends SparkSpec {
  import spark.implicits._

  test("clusterSizes: histogram of label cardinalities") {
    val labels = Seq((1L, 10L), (2L, 10L), (3L, 10L),
      (4L, 20L), (5L, 20L), (6L, 30L)).toDF("id", "cluster_id")
    val got = Dedup.clusterSizes(labels, "cluster_id").collect()
      .map(r => r.getAs[Long]("size") ->
        (r.getAs[Long]("n_clusters"), r.getAs[Long]("n_docs"))).toMap
    assert(got(3L) === ((1L, 3L)))
    assert(got(2L) === ((1L, 2L)))
    assert(got(1L) === ((1L, 1L)))
  }

  test("topMovers: picks the largest absolute deltas, ties broken by key") {
    def ts(week: Int) = java.sql.Timestamp.valueOf(f"2024-01-${week * 7 + 1}%02d 12:00:00")
    // series a: 10 -> 50 (delta +40); series b: 100 -> 10 (delta -90)
    val ev = Seq(("a", ts(0), 10.0), ("a", ts(1), 50.0),
      ("b", ts(0), 100.0), ("b", ts(1), 10.0)).toDF("et", "ts", "v")
    val got = Analytics.topMovers(ev, "et", "ts", col("v"), k = 1).collect()
    assert(got.length === 1)
    assert(got(0).getAs[String]("series") === "b")
    assert(got(0).getAs[Long]("delta_cents") === -9000L)
    val both = Analytics.topMovers(ev, "et", "ts", col("v"), k = 5).collect()
    assert(both.map(_.getAs[String]("series")).toSeq === Seq("b", "a"))
  }

  test("cohortLtv: cumulative per-cohort revenue by age") {
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-04-${d + 1}%02d 08:00:00")
    // cohort 0: users 1,2 (week 0); cohort 1: user 3 (week 1)
    val ev = Seq(
      (1L, ts(0), 10.0), (2L, ts(1), 20.0),   // cohort 0, age 0: 30
      (1L, ts(8), 5.0),                        // cohort 0, age 1: 5
      (3L, ts(8), 40.0), (3L, ts(16), 1.0))   // cohort 1, ages 0 and 1
      .toDF("user_id", "ts", "value")
    val got = Analytics.cohortLtv(ev, "user_id", "ts", "value").collect()
      .map(r => (r.getAs[Long]("cohort_week"), r.getAs[Long]("age_week")) -> r)
      .toMap
    assert(got((0L, 0L)).getAs[Long]("rev_cents") === 3000L)
    assert(got((0L, 1L)).getAs[Long]("cum_rev_cents") === 3500L)
    assert(got((0L, 1L)).getAs[Long]("n_users") === 2L)
    assert(got((0L, 1L)).getAs[Long]("cum_per_user_milli") === 17500L)
    assert(got((1L, 1L)).getAs[Long]("cum_rev_cents") === 4100L)
  }

  test("userGrowth and stickiness: first-seen cumulative, floored ppm") {
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-04-${day + 1}%02d 08:00:00")
    val ev = Seq((1L, 0), (2L, 0), (1L, 1), (3L, 1), (1L, 2))
      .map { case (u, d) => (u, ts(d)) }.toDF("user_id", "ts")
    val g = Analytics.userGrowth(ev, "user_id", "ts").collect()
    assert(g.map(_.getAs[Long]("new_users")).toSeq === Seq(2L, 1L))
    assert(g.map(_.getAs[Long]("cum_users")).toSeq === Seq(2L, 3L))
    val s = Analytics.stickiness(ev, "user_id", "ts").collect()
      .map(r => r.getDate(0).toString -> r).toMap
    // day 2: dau=1 (u1), trailing-7 actives = {1,2,3} -> 333333 ppm
    assert(s("2024-04-03").getAs[Long]("dau") === 1L)
    assert(s("2024-04-03").getAs[Long]("rolling_7") === 3L)
    assert(s("2024-04-03").getAs[Long]("stickiness_ppm") === 333333L)
  }

  test("latenessProfile: exclusive running max, clamped, bucketed") {
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    // arrival order by seq; event at seq 3 is 1300s late, seq 5 is 700s
    val ev = Seq(
      (1L, ts(10000L)), (2L, ts(10600L)), (3L, ts(9300L)),
      (4L, ts(11000L)), (5L, ts(10300L)), (6L, ts(12000L)))
      .toDF("event_id", "ts")
    val got = Analytics.latenessProfile(ev, "event_id", "ts", bucketSeconds = 600)
      .collect().map(r => r.getAs[Long]("bucket_start_s") ->
        r.getAs[Long]("n_events")).toMap
    // latenesses: 0 (first), 0, 1300, 0, 700, 0 -> buckets 0:4, 600:1, 1200:1
    assert(got(0L) === 4L)
    assert(got(600L) === 1L)
    assert(got(1200L) === 1L)
  }
}
