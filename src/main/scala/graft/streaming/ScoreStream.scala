package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.ml.SgdNetModel

/** Structured Streaming scoring of a fitted path model.
  *
  * A fitted [[SgdNetModel]]'s prediction columns are plain Catalyst
  * expressions, so they compose with streaming DataFrames unchanged:
  * readStream → withColumn(pred) → writeStream. State-free scoring —
  * no watermark needed; exactly the per-record shape a 100 TB/day
  * ingest pipeline scores with.
  */
object ScoreStream {

  /** Attach prediction columns for the given lambda indices to a
    * (possibly streaming) DataFrame. */
  def scored(stream: DataFrame, model: SgdNetModel, tpe: String = "link",
             lambdaIdxs: Seq[Int] = Seq(0)): DataFrame =
    model.predict(stream, tpe, lambdaIdxs)

  /** File-source convenience: watch a directory of parquet files with the
    * given schema, score, and return the streaming frame (caller picks
    * the sink and trigger). */
  def scoreParquetDir(spark: org.apache.spark.sql.SparkSession, path: String,
                      schema: org.apache.spark.sql.types.StructType,
                      model: SgdNetModel, tpe: String = "link"): DataFrame =
    scored(spark.readStream.schema(schema).parquet(path), model, tpe)
}
