package graft
import org.apache.spark.sql.SparkSession

/** Headline benchmark. Prints TWO stdout lines:
  *
  *   1. the FULL result JSON — per-query min-of-reps AND first-run
  *      times, full precision (also written to `BENCH_last_full.json`
  *      in the working directory, because the driver's log capture
  *      keeps only the last 2000 characters and a 100-query line does
  *      not fit);
  *   2. a COMPACT summary line (total, methodology, errors, the
  *      slowest queries) sized to survive that 2000-char tail intact.
  *
  * Methodology: each query runs `SPARK_GRAFT_BENCH_REPS` (default 2)
  * times and the reported per-query number is the MIN — first-run
  * wall-clock on a shared box swings 2-3x with background load and
  * JIT/plan-compile warm-up, which has produced phantom regressions in
  * committed bench files twice. The `methodology` field names this so
  * consumers never compare min-of-reps against first-run files; the
  * per-query first-run times are kept alongside (`queries_first_run`).
  * A query that throws is EXCLUDED from every total and listed in
  * `errors` (its per-query value is -1), never silently folded in.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen/shuffle warm-up so the first measured query doesn't
    // absorb session start-up cost
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // optional query filter for local iteration (driver leaves it unset)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    // deterministic name order: stable cross-round comparisons
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
        var failed = false
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count() }
          catch { case _: Throwable => failed = true }
          finally spark.catalog.clearCache() // operator-internal caches don't leak across queries
          (System.nanoTime() - t0) / 1e9
        }
        (name, times.min, times.head, failed)
      }
    val ok = results.filterNot(_._4)
    val errors = results.filter(_._4).map(_._1)
    def fmtQ(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    val firstTotal = ok.map(_._3).sum
    val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val qMin = results.map { case (k, v, _, f) => (k, if (f) -1.0 else v) }
    val qFirst = results.map { case (k, _, v, f) => (k, if (f) -1.0 else v) }
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,""" +
      s""""methodology":"min_of_reps","first_run_total":$firstTotal,""" +
      s""""errors":$errJson,"queries":${fmtQ(qMin)},""" +
      s""""queries_first_run":${fmtQ(qFirst)},"sf":"$sfDir"}"""
    println(full)
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_last_full.json"),
        (full + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () } // read-only cwd: stdout already has it
    // compact tail-safe summary: slowest queries only, 3-decimal times
    def r3(v: Double): Double = math.rint(v * 1000) / 1000
    val slow = ok.sortBy(-_._2).take(12).map { case (k, v, _, _) => (k, r3(v)) }
    println(
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","reps":$reps,""" +
      s""""methodology":"min_of_reps","first_run_total":${r3(firstTotal)},""" +
      s""""n_queries":${results.size},"errors":$errJson,""" +
      s""""queries":${fmtQ(slow)},""" +
      s""""full_results":"BENCH_last_full.json","sf":"$sfDir"}""")
    spark.stop()
  }
}
