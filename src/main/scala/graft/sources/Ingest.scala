package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType, StringType}

/** Audited semi-structured ingestion: JSONL / CSV readers that never
  * silently drop a bad record. Both run PERMISSIVE with an explicit
  * schema (no inference — inference double-scans the input, a real
  * cost at corpus scale) plus a corrupt-record capture column, then
  * split the scan into a clean frame and a QUARANTINE frame holding
  * the raw offending lines — the ingest contract a 100 TB pipeline
  * needs: bad upstream bytes become a countable, inspectable table
  * instead of a silent row-count drift.
  *
  * One scan feeds both frames (the split is two filters over the same
  * cached-free projection — Catalyst collapses the shared scan);
  * corrupt capture is Spark's native PERMISSIVE machinery, fully
  * codegen. */
object Ingest {

  private val CorruptCol = "_graft_corrupt"

  /** Read line-delimited JSON with `schema` enforced. Returns
    * (clean, quarantine): clean carries exactly the schema's columns;
    * quarantine carries the raw malformed line. A record missing
    * every schema field but syntactically valid stays in `clean` with
    * nulls (that is a schema question, not a parse failure).
    *
    * Implementation note: parsing runs as the `from_json` EXPRESSION
    * over a plain text scan, not the JSON file source — the file
    * source refuses any plan whose pruned schema is only its internal
    * corrupt column (which is exactly what `quarantine.count()`
    * prunes to), while the expression form has no such restriction
    * and stays fully codegen. */
  def readJsonlAudited(spark: SparkSession, path: String,
                       schema: StructType): (DataFrame, DataFrame) = {
    val full = schema.add(StructField(CorruptCol, StringType, nullable = true))
    val parsed = spark.read.textFile(path).toDF("__raw")
      .select(col("__raw"),
        from_json(col("__raw"), full,
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> CorruptCol)).as("__p"))
    split(parsed, schema)
  }

  /** Read CSV (no header; pass parser options as needed) with
    * `schema` enforced; malformed lines land in quarantine. Same
    * expression-level parse as [[readJsonlAudited]]. */
  def readCsvAudited(spark: SparkSession, path: String, schema: StructType,
                     options: Map[String, String] = Map.empty): (DataFrame, DataFrame) = {
    val full = schema.add(StructField(CorruptCol, StringType, nullable = true))
    val opts = options ++ Map("mode" -> "PERMISSIVE",
      "columnNameOfCorruptRecord" -> CorruptCol)
    val parsed = spark.read.textFile(path).toDF("__raw")
      .select(col("__raw"),
        from_csv(col("__raw"), full, opts).as("__p"))
    split(parsed, schema)
  }

  private def split(parsed: DataFrame, schema: StructType): (DataFrame, DataFrame) = {
    val corrupt = col("__p").getField(CorruptCol)
    val clean = parsed.filter(corrupt.isNull)
      .select(schema.fieldNames.map(f => col("__p").getField(f).as(f)).toSeq: _*)
    val quarantine = parsed.filter(corrupt.isNotNull)
      .select(col("__raw").as("raw_record"))
    (clean, quarantine)
  }

  /** One-row ingest audit: clean/quarantined counts and the floored
    * ppm failure rate — the number that gates a load. */
  def auditSummary(clean: DataFrame, quarantine: DataFrame): DataFrame = {
    val spark = clean.sparkSession
    import spark.implicits._
    val nc = clean.count()
    val nq = quarantine.count()
    val total = nc + nq
    val ppm = if (total == 0) 0L else nq * 1000000L / total
    Seq((nc, nq, ppm)).toDF("n_clean", "n_quarantined", "fail_ppm")
  }
}
