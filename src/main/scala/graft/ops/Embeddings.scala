package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-column utilities for large-scale vector pipelines. */
object Embeddings {

  /** Johnson–Lindenstrauss random projection to `outDim` dimensions
    * using the engine-portable md5 Rademacher planes ([[Ann.planesMd5]]):
    * out_i = <v, plane_i> / sqrt(outDim). Pairwise distances and norms
    * are preserved in expectation (Achlioptas-style ±1 projections), so
    * high-dim embeddings can shrink before ANN / clustering / dedup.
    *
    * Deterministic across engines and partitionings — the DuckDB oracle
    * recomputes identical projections — and a pure narrow kernel pass:
    * no shuffle, no driver data. */
  def randomProject(df: DataFrame, idCol: String, vecCol: String,
                    outDim: Int): DataFrame = {
    require(outDim > 0, "outDim must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
    val dimRow = v.select(size(col(vecCol))).limit(1).collect()
    if (dimRow.isEmpty)
      return spark.emptyDataFrame
        .select(lit(0L).as(idCol),
          lit(Array.empty[Double]).as("projection"))
    val dim = dimRow(0).getInt(0)
    val planes = Ann.planesMd5(dim, 1, outDim)(0) // [outDim][dim]
    val bcP = spark.sparkContext.broadcast(planes)
    // divide (not multiply-by-reciprocal): bitwise-identical to the
    // oracle's sum/sqrt(outDim)
    val sq = math.sqrt(outDim.toDouble)
    v.as[(Long, Array[Double])]
      .map { case (id, a) =>
        val p = bcP.value
        val out = new Array[Double](p.length)
        var i = 0
        while (i < p.length) {
          val plane = p(i)
          var s = 0.0
          var j = 0
          while (j < a.length && j < plane.length) { s += a(j) * plane(j); j += 1 }
          out(i) = s / sq
          i += 1
        }
        (id, out)
      }
      .toDF(idCol, "projection")
  }
}
