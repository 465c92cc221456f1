package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** 1-D EMD and rolling distinct actors. */
class EmdRollingSpec extends SparkSpec {
  import spark.implicits._

  test("emd1d: point masses give the translation distance") {
    val a = Seq(1.0, 1.0).toDF("v")  // all mass at 100 cents
    val b = Seq(3.0, 3.0).toDF("v")  // all mass at 300 cents
    val r = Drift.emd1d(a, b, "v").head()
    assert(r.getAs[Long]("n_a") === 2 && r.getAs[Long]("n_b") === 2)
    // |F diff| = 1 over the 200-cent gap → EMD = 200 cents = 200000 milli
    assert(r.getAs[Long]("emd_milli_cents") === 200000L)
  }

  test("emd1d: identical samples are zero; partitioning invariant") {
    val a = (1 to 500).map(i => (i % 37).toDouble).toDF("v")
    assert(Drift.emd1d(a, a, "v").head()
      .getAs[Long]("emd_milli_cents") === 0L)
    val b = (1 to 400).map(i => (i % 31 + 2).toDouble).toDF("v")
    val r1 = Drift.emd1d(a, b, "v").head()
    val r2 = Drift.emd1d(a.repartition(13), b.repartition(7), "v").head()
    assert(r1.toSeq === r2.toSeq)
    assert(r1.getAs[Long]("emd_milli_cents") > 0)
  }

  test("rollingDistinct: window unions days, DAU stays daily") {
    val rows = Seq(
      (1L, "2024-01-01 01:00:00"), (2L, "2024-01-01 02:00:00"),
      (1L, "2024-01-02 01:00:00"),                   // 1 returns
      (3L, "2024-01-05 01:00:00"))
      .toDF("k", "ts")
    val by = Analytics.rollingDistinct(rows, "k", "ts", windowDays = 3)
      .collect().map(r => r.getDate(0).toString -> r).toMap
    assert(by("2024-01-01").getAs[Long]("dau") === 2)
    assert(by("2024-01-02").getAs[Long]("dau") === 1)
    assert(by("2024-01-02").getAs[Long]("rolling_3") === 2) // {1,2}
    // Jan 5 window [Jan 3..5] sees only user 3
    assert(by("2024-01-05").getAs[Long]("rolling_3") === 1)
  }
}
