package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * - [[bruteForceTopK]] is the exact baseline: broadcast the (small) query
  *   set against the corpus — one broadcast join, no shuffle of the corpus,
  *   per-query top-k via aggregation. Exact at any corpus size as long as
  *   the QUERY set is broadcastable.
  * - [[lshTopK]] is the scale path: random-hyperplane signatures bucket
  *   the corpus; queries probe only their buckets (L tables). The corpus
  *   shuffle is on (table, bucket) keys; candidates per query are bounded
  *   by bucket sizes, not corpus size.
  */
object Ann {

  /** Deterministic random hyperplanes: L tables x bits planes x dim. */
  def planes(dim: Int, tables: Int, bits: Int, seed: Long = 42L): Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(tables, bits, dim)(rnd.nextGaussian())
  }

  private def dotLit(v: Column, p: Array[Double]): Column =
    aggregate(zip_with(v, typedlit(p.toSeq), (x, y) => x * y),
      lit(0.0d), (acc, x) => acc + x)

  /** Signature (bucket id) of an embedding for one LSH table. */
  def signature(v: Column, tablePlanes: Array[Array[Double]]): Column =
    tablePlanes.zipWithIndex.map { case (p, b) =>
      when(dotLit(v, p) > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Exact top-k cosine neighbors for each query row.
    * `queries` must be small (broadcast). Returns
    * (query_id, neighbor_id, rank, cos). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        graft.functions.GraftFunctions.cosine(corpus.sparkSession, col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** IVF (inverted-file) approximate top-k: a k-means coarse quantizer
    * partitions the corpus into `nlist` cells; each query probes its
    * `nprobe` nearest cells only. The corpus shuffles ONCE on the cell id
    * (like any partitioned index build); per-query work is bounded by the
    * probed cells, not corpus size — the standard billion-scale ANN
    * layout (FAISS-style), expressed as Spark joins.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
              seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    import spark.implicits._
    val withVec = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv"))
      .withColumn("fv", array_to_vector(col("cv")))
    val km = new KMeans().setK(nlist).setSeed(seed)
      .setFeaturesCol("fv").setPredictionCol("cell").fit(withVec)
    val cells = km.transform(withVec).select("neighbor_id", "cv", "cell")
    // driver-side: nprobe nearest centroids per query (centroid table is tiny)
    val centers = km.clusterCenters.map(_.toArray)
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
      .as[(Long, Array[Double])].collect()
    val probes = q.flatMap { case (qid, qv) =>
      centers.zipWithIndex.map { case (c, i) =>
        var d = 0.0
        var j = 0
        while (j < qv.length) { val t = qv(j) - c(j); d += t * t; j += 1 }
        (d, i)
      }.sortBy(_._1).take(nprobe).map { case (_, cell) => (qid, qv, cell) }
    }
    val probeDf = spark.createDataset(probes.toSeq).toDF("query_id", "qv", "cell")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cells.join(broadcast(probeDf), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        graft.functions.GraftFunctions.cosine(spark, col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** LSH-bucketed approximate top-k: candidates share a bucket with the
    * query in at least one of `tables` hash tables. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, tables: Int = 8, bits: Int = 6,
              seed: Long = 42L): DataFrame = {
    val dim = corpus.select(size(col(vecCol))).head.getInt(0)
    val pl = planes(dim, tables, bits, seed)
    def bucketed(df: DataFrame, id: String): DataFrame =
      (0 until tables).map { t =>
        df.select(col(idCol).as(id),
          col(vecCol).cast("array<double>").as(s"${id}_v"),
          lit(t).as("table"), signature(col(vecCol).cast("array<double>"), pl(t)).as("bucket"))
      }.reduce(_ unionAll _)
    val cb = bucketed(corpus, "neighbor_id")
    val qb = bucketed(queries, "query_id")
    val cands = cb.join(broadcast(qb), Seq("table", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        col("query_id_v").as("qv"), col("neighbor_id_v").as("cv"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cands.withColumn("cos",
        graft.functions.GraftFunctions.cosine(corpus.sparkSession, col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }
}
