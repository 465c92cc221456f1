package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed Lloyd's k-means over an embedding column — the trainer
  * behind coarse quantizers ([[Ann.trainIvf]] uses a bounded-sample
  * variant; this one aggregates over the FULL corpus) and the direct
  * clustering surface (diversity bucketing, SemDeDup-style cluster
  * prep) a training-data pipeline needs.
  *
  * Built engine-exact so the whole iterative fit is oracle-verifiable:
  *
  *   - vectors are micro-quantized up front (`round(x * 10^q)` as
  *     longs — exact on any engine);
  *   - each iteration is ONE `treeAggregate` pass (no shuffle): per-
  *     cluster integer sums + counts, K x D driver state — the same
  *     no-Exchange shape as the model-fit passes in [[graft.ml.SgdNet]];
  *   - new centroids are `sum / count` — integer-exact sums followed by
  *     a single correctly-rounded IEEE division, so every engine
  *     computes bit-identical centroids;
  *   - assignment distances accumulate left-to-right over dimensions in
  *     doubles, matching a left-associated SQL `+` chain term for term;
  *     ties pick the lowest cluster index.
  *
  * Scale notes (100 TB): per-iteration cost is one corpus pass with a
  * broadcast K x D centroid table and map-side combine down to K x D
  * longs per partition — the canonical distributed Lloyd shape. The
  * quantized input is persisted across the `iters + 1` traversals.
  * Empty clusters keep their previous centroid. */
object KMeans {

  /** Fit `iters` Lloyd rounds (iters assignments, iters - 1 centroid
    * updates) with the k lowest-id vectors as initial centroids;
    * returns (id, cluster). Deterministic: no RNG anywhere — callers
    * wanting random init should hash-sample ids ([[Sampling]]) first.
    * Vectors are expected fixed-dimension; the kernel bounds its loop
    * by the shorter of row/centroid dims, so a ragged row degrades to
    * a prefix distance instead of crashing. */
  def lloyd(df: DataFrame, idCol: String, vecCol: String, k: Int,
            iters: Int, quantDigits: Int = 6): DataFrame = {
    require(k >= 1 && iters >= 1, "k and iters must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val unit = math.pow(10, quantDigits)
    val xm = df.select(col(idCol).cast("long").as("id"),
      transform(col(vecCol),
        e => round(e.cast("double") * lit(unit)).cast("long")).as("xm"))
    val rdd = xm.as[(Long, Array[Long])].rdd
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val init = xm.orderBy(col("id")).limit(k) // TakeOrdered: bounded
        .as[(Long, Array[Long])].collect()
      require(init.nonEmpty, "input is empty")
      var cents: Array[Array[Double]] = init.map(_._2.map(_.toDouble))
      val d = cents(0).length

      def assignOf(v: Array[Long], cs: Array[Array[Double]]): Int = {
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < cs.length) {
          val cv = cs(c)
          val n = math.min(v.length, cv.length)
          var s = 0.0
          var i = 0
          while (i < n) { val t = v(i).toDouble - cv(i); s += t * t; i += 1 }
          if (s < bestD) { bestD = s; best = c } // strict <: lowest index wins ties
          c += 1
        }
        best
      }

      for (_ <- 1 until iters) {
        val bc = spark.sparkContext.broadcast(cents)
        val (sums, cnts) = rdd.treeAggregate(
          (Array.fill(k, d)(0L), Array.fill(k)(0L)))(
          seqOp = { case (acc @ (s, n), (_, v)) =>
            val a = assignOf(v, bc.value)
            val m = math.min(v.length, d)
            var i = 0
            while (i < m) { s(a)(i) += v(i); i += 1 }
            n(a) += 1L
            acc
          },
          combOp = { case (acc @ (s1, n1), (s2, n2)) =>
            var c = 0
            while (c < k) {
              var i = 0
              while (i < d) { s1(c)(i) += s2(c)(i); i += 1 }
              n1(c) += n2(c)
              c += 1
            }
            acc
          })
        cents = Array.tabulate(k) { c =>
          if (cnts(c) == 0L) cents(c) // empty cluster: carry centroid
          else sums(c).map(_.toDouble / cnts(c))
        }
        bc.destroy()
      }
      val bcF = spark.sparkContext.broadcast(cents)
      // eager checkpoint: the assignment runs NOW, against the cached
      // quantized input, and the (id, cluster) result — two ints per
      // row — survives the finally-unpersist below with its lineage cut
      rdd.map { case (id, v) => (id, assignOf(v, bcF.value)) }
        .toDF("id", "cluster")
        .select(col("id"), col("cluster").cast("int").as("cluster"))
        .localCheckpoint(true)
    } finally rdd.unpersist(blocking = false)
  }
}
