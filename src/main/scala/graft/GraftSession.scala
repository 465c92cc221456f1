package graft

import org.apache.spark.sql.SparkSession

/** Recommended session configuration for running graft at scale — the
  * settings every operator in this library is designed around, in one
  * place so a user switching from the reference doesn't have to
  * rediscover them:
  *
  *  - AQE on (runtime re-planning): coalesces post-shuffle partitions,
  *    converts sort-merge to broadcast joins when a side turns out
  *    small, and splits skewed shuffle partitions — the runtime
  *    complement to the static salting in [[graft.ops.SkewJoin]].
  *  - Skew-join handling on explicitly (belt and braces with AQE).
  *  - UTC session timezone: every temporal operator and oracle in this
  *    repo assumes it; a local-timezone session silently shifts
  *    window/bar boundaries.
  *  - `shuffle.partitions` defaulting to the cluster's parallelism
  *    rather than Spark's legacy 200 (AQE coalesces down from there;
  *    at real cluster scale callers should size this to ~2-3x total
  *    cores via the `shufflePartitions` parameter).
  *
  * Returns a builder so callers can still override anything.
  */
object GraftSession {

  def builder(master: Option[String] = None,
              shufflePartitions: Option[Int] = None): SparkSession.Builder = {
    val b = SparkSession.builder()
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
    val withMaster = master.fold(b)(b.master)
    shufflePartitions.fold(withMaster)(n =>
      withMaster.config("spark.sql.shuffle.partitions", n.toString))
  }

  /** Local development/test session sized for `cores` threads. */
  def local(cores: Int = Runtime.getRuntime.availableProcessors())
      : SparkSession =
    builder(Some(s"local[$cores]"), Some(cores))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
