package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Physical-plan quality gates: the properties that matter at 100 TB —
  * column pruning and filter pushdown reaching the parquet scan, small
  * sides broadcast, and no accidental cartesian products — asserted so
  * refactors cannot silently regress them. */
class PlanSpec extends SparkSpec {

  private def scans(df: DataFrame): Seq[FileSourceScanExec] =
    df.queryExecution.sparkPlan.collect { case s: FileSourceScanExec => s }

  test("parquet scans prune columns and push filters down") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .filter(col("l_orderkey") <= 10)
      .select("l_orderkey", "l_quantity")
    val s = scans(li)
    assert(s.nonEmpty, "expected a FileSourceScanExec")
    assert(s.head.requiredSchema.fieldNames.toSet == Set("l_orderkey", "l_quantity"),
      s"pruned schema: ${s.head.requiredSchema.fieldNames.mkString(",")}")
    assert(s.head.metadata("PushedFilters").contains("LessThanOrEqual(l_orderkey,10"),
      s"pushed: ${s.head.metadata("PushedFilters")}")
  }

  test("operator scans read only the columns they use") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // token counting touches (doc_id, text) — lang/source/n_chars must
    // not be read from disk
    val q = docs.select(col("doc_id"),
      TextAnalysis.wsTokenCount(col("text")).as("t"))
    val s = scans(q)
    assert(s.head.requiredSchema.fieldNames.toSet == Set("doc_id", "text"),
      s.head.requiredSchema.fieldNames.mkString(","))
  }

  test("brute-force ANN broadcasts the query side, never the corpus") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = Ann.bruteForceTopK(e, e.filter(col("vec_id") < 5),
      "vec_id", "embedding", k = 3).queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("CartesianProduct"), "corpus must not cross-join")
  }

  test("minhash LSH plans equi-joins only (no cartesian product)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Dedup.minhashLsh(docs, "doc_id", "text",
      bands = 4, rowsPerBand = 3, threshold = 0.6)
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct"), "bucket join must be equi")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "bucket join must be equi")
  }

  test("hash sampling stays a narrow filter (no shuffle)") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val plan = Sampling.sample(li, col("l_orderkey"), 0.1)
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("Exchange"), s"sampling must not shuffle: ${plan.take(400)}")
  }
}
