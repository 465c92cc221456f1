package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-column utilities for large-scale vector pipelines. */
object Embeddings {

  /** Per-group embedding CENTROIDS (cluster prototypes, per-domain
    * mean vectors for drift / SemDeDup seeding / routing), exact at
    * any scale: components are first quantized to integer units of
    * 2^-scaleBits via `floor(v * 2^scaleBits)` — double-by-power-of-2
    * multiply and floor are both exact IEEE ops, identical on every
    * engine — so the per-(group, position) moments are LONG sums:
    * order-independent, partitioning-independent, and oracle-exact,
    * where a naive double sum would drift with aggregation order. One
    * posexplode (corpus x dim rows) into ONE map-side-combined
    * (group, pos) aggregation; the single double division happens once
    * per output cell, on identical operands in every engine.
    *
    * Returns the long frame (groupCol, pos, mean): callers wanting the
    * assembled array can `collect_list(struct(pos, mean))` — the frame
    * keeps each output cell independent, which is what downstream
    * aggregations and the oracle compare. Quantization error is
    * deterministic and bounded by 2^-scaleBits per component. */
  def centroidBy(df: DataFrame, groupCol: String, vecCol: String,
                 scaleBits: Int = 20): DataFrame = {
    require(scaleBits >= 1 && scaleBits <= 30, "scaleBits must be in [1, 30]")
    val m = math.pow(2.0, scaleBits)
    val q = df.filter(col(vecCol).isNotNull)
      .select(col(groupCol),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "__v")))
      .select(col(groupCol), col("pos"),
        floor(col("__v") * lit(m)).cast("long").as("__iv"))
    q.groupBy(col(groupCol), col("pos"))
      .agg(sum(col("__iv")).as("__s"), count(lit(1)).as("__n"))
      .select(col(groupCol), col("pos"),
        (col("__s").cast("double") / (col("__n").cast("double") * lit(m)))
          .as("mean"))
  }

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

  /** Per-group embedding DISPERSION: mean cosine distance of each
    * group's vectors to the group's (integer-quantized, [[centroidBy]])
    * centroid — the "how semantically tight is this domain / cluster"
    * diagnostic behind SemDeDup epsilon choices and mixture decisions
    * (a diffuse source mixes differently than a templated one).
    *
    * Returns (groupCol, n_vecs, dispersion) with dispersion =
    * avg(1 − cos(v, centroid)).
    *
    * Shape (100 TB): the centroid aggregation is the [[centroidBy]]
    * long-sum pass; the assembled per-group centroid array (dim cells,
    * collect_list bounded by the dimension) broadcasts into one
    * codegen'd cosine pass over the corpus + one grouped average. Two
    * aggregations and a broadcast join — never a pairwise product. */
  def dispersionBy(df: DataFrame, groupCol: String, vecCol: String,
                   scaleBits: Int = 20): DataFrame = {
    val cent = centroidBy(df, groupCol, vecCol, scaleBits)
      .groupBy(col(groupCol))
      .agg(sort_array(collect_list(struct(col("pos"), col("mean")))).as("c"))
      .select(col(groupCol), col("c.mean").as("__centroid"))
    val v = df.filter(col(vecCol).isNotNull)
      .select(col(groupCol), col(vecCol).cast("array<double>").as("__v"))
    v.join(broadcast(cent), groupCol)
      .select(col(groupCol),
        graft.functions.GraftFunctions.cosine(df.sparkSession,
          col("__v"), col("__centroid")).as("__cos"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_vecs"),
        avg(lit(1.0) - col("__cos")).as("dispersion"))
  }
}
