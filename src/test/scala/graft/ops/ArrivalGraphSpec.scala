package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Inter-arrival burstiness and degree distributions. */
class ArrivalGraphSpec extends SparkSpec {
  import spark.implicits._

  test("interArrivalStats: periodic is -1, moments are exact") {
    val rows = Seq(
      // key 1: perfectly periodic (60s gaps) → sd 0 → B = -1
      (1L, "2024-01-01 00:00:00", 1L), (1L, "2024-01-01 00:01:00", 2L),
      (1L, "2024-01-01 00:02:00", 3L), (1L, "2024-01-01 00:03:00", 4L),
      // key 2: bursty — 1s, 1s, then an hour
      (2L, "2024-01-01 00:00:00", 5L), (2L, "2024-01-01 00:00:01", 6L),
      (2L, "2024-01-01 00:00:02", 7L), (2L, "2024-01-01 01:00:02", 8L),
      // key 3: single event → no gaps
      (3L, "2024-01-01 00:00:00", 9L))
      .toDF("k", "ts", "tie").withColumn("ts", col("ts").cast("timestamp"))
    val by = Temporal.interArrivalStats(rows, "k", "ts", "tie").collect()
      .map(r => r.getAs[Long]("k") -> r).toMap
    assert(by(1L).getAs[Long]("n_gaps") === 3)
    assert(by(1L).getAs[Long]("mean_gap_us") === 60000000L)
    assert(by(1L).getAs[Double]("burstiness") === -1.0)
    // gaps [1s, 1s, 1h]: mean 1200.67s, sd 1696.6s → B ≈ +0.171
    assert(by(2L).getAs[Double]("burstiness") === 0.171169)
    assert(by(3L).getAs[Long]("n_gaps") === 0)
    assert(by(3L).isNullAt(by(3L).fieldIndex("burstiness")))
  }

  test("degreeDistribution: shares over a known graph") {
    // star: center degree 4, four leaves degree 1 (5 nodes)
    val star = (1L to 4L).map(i => (0L, i)).toDF("s", "d")
    val got = Graph.degreeDistribution(star, "s", "d")
      .orderBy("deg").collect()
      .map(r => (r.getAs[Long]("deg"), r.getAs[Long]("n_nodes"),
        r.getAs[Long]("share_ppm")))
    assert(got.toSeq === Seq((1L, 4L, 800000L), (4L, 1L, 200000L)))
  }
}
