package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.types._

/** Audited JSONL/CSV ingestion with corrupt-record quarantine. */
class IngestSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  private def writeTemp(lines: Seq[String], ext: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest").toFile
    val f = new java.io.File(dir, s"part.$ext")
    val w = new java.io.PrintWriter(f, "UTF-8")
    try lines.foreach(w.println) finally w.close()
    f.getAbsolutePath
  }

  test("readJsonlAudited: clean rows parse, bad lines quarantine") {
    val path = writeTemp(Seq(
      """{"id": 1, "name": "a"}""",
      """{"id": 2, "name": "b"}""",
      """not json at all""",
      """{"id": 3 "name": "missing comma"}""",
      """{"other": true}"""), "jsonl") // valid JSON, no schema fields -> clean
    val (clean, quarantine) = Ingest.readJsonlAudited(spark, path, schema)
    assert(clean.count() === 3) // 1, 2, and the schema-null record
    assert(clean.columns.toSeq === Seq("id", "name"))
    assert(quarantine.count() === 2)
    assert(quarantine.columns.head === "raw_record")
    val raw = quarantine.collect().map(_.getString(0))
    assert(raw.exists(_.contains("not json")))
    val audit = Ingest.auditSummary(clean, quarantine).head()
    assert(audit.getAs[Long]("n_clean") === 3L)
    assert(audit.getAs[Long]("n_quarantined") === 2L)
    assert(audit.getAs[Long]("fail_ppm") === 400000L)
  }

  test("readCsvAudited: malformed rows quarantine, clean typed") {
    val path = writeTemp(Seq(
      "1,alpha",
      "2,beta",
      "not_a_number,gamma"), "csv")
    val (clean, quarantine) = Ingest.readCsvAudited(spark, path, schema)
    assert(clean.count() === 2)
    assert(clean.schema("id").dataType === LongType)
    assert(quarantine.count() === 1)
    assert(quarantine.head().getString(0).contains("not_a_number"))
  }
}
