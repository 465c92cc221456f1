package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftSessionSpec extends AnyFunSuite {
  test("graft session builder applies the scale configuration") {
    // getOrCreate against the shared test session applies the builder's
    // runtime-settable confs to it — capture and restore what we touch
    // (stopping the session would kill every later suite in this JVM)
    val prior = SparkSpec.session
    val keep = Seq("spark.sql.adaptive.enabled",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.session.timeZone",
      "spark.sql.shuffle.partitions")
      .map(k => k -> prior.conf.getOption(k))
    try {
      val spark = GraftSession.builder(shufflePartitions = Some(8))
        .getOrCreate()
      assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
      assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
      assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
      assert(spark.conf.get("spark.sql.shuffle.partitions") == "8")
    } finally keep.foreach {
      case (k, Some(v)) => prior.conf.set(k, v)
      case (k, None)    => prior.conf.unset(k)
    }
  }
}
