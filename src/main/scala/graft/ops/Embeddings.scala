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

  /** INT8 vector quantization with exact reconstruction accounting —
    * the 4× storage cut that makes a 100 TB embedding corpus fit its
    * serving tier. Per vector: the scale is the smallest POWER OF TWO
    * `2^e` with `max|v| ≤ 127·2^e`, chosen by an unrolled comparison
    * chain against exact power-of-two literals (never a cross-engine
    * `log2` — the boundary ulp would flip e); codes are
    * `round(v / 2^e)` (division by a power of two is exact, so the
    * rounding input is bit-identical on every engine and |q| ≤ 127 by
    * construction).
    *
    * Returns one row per vector: exponent `e`, the int8 code array,
    * and `err_e15` — the squared reconstruction error as an integer
    * sum of per-component `round((v − q·2^e)²·1e15)` terms
    * (order-independent, engine-exact). Roll up with
    * [[quantizeInt8Report]]. One narrow kernel pass, no shuffle. */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.filter(col(vecCol).isNotNull && col(idCol).isNotNull)
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Seq[Double])]
      .mapPartitions(_.map { case (id, v) =>
        var maxAbs = 0.0
        v.foreach(x => if (math.abs(x) > maxAbs) maxAbs = math.abs(x))
        // smallest e in [-40, 40] with 127 * 2^e >= maxAbs (all-zero
        // vectors take the floor e = -40); comparisons against exact
        // power-of-two products only
        var e = -40
        while (e < 40 && 127.0 * java.lang.Math.scalb(1.0, e) < maxAbs) e += 1
        val scale = java.lang.Math.scalb(1.0, e)
        val q = new Array[Int](v.length)
        var err = 0L
        var i = 0
        while (i < v.length) {
          // HALF-AWAY-FROM-ZERO, matching SQL round() — Java
          // Math.round is half-UP and disagrees at negative .5 ties
          val r = v(i) / scale
          q(i) = (if (r >= 0) math.floor(r + 0.5) else math.ceil(r - 0.5)).toInt
          val d = v(i) - q(i) * scale
          err += math.round(d * d * 1e15) // non-negative: half-up == half-away
          i += 1
        }
        (id, e, q.toSeq, err)
      })
      .toDF(idCol, "e", "codes", "err_e15")
  }

  /** Per-group rollup of [[quantizeInt8]] joined back to a label
    * column: vector counts, exponent range, total reconstruction
    * error — the "is int8 safe for this corpus" audit table. */
  def quantizeInt8Report(df: DataFrame, idCol: String, labelCol: String,
                         vecCol: String): DataFrame = {
    val q = quantizeInt8(df, idCol, vecCol)
    df.select(col(idCol).cast("long").as(idCol), col(labelCol))
      .join(q, idCol)
      .groupBy(col(labelCol))
      .agg(count(lit(1)).as("n_vecs"),
        min(col("e")).as("e_min"), max(col("e")).as("e_max"),
        sum(col("err_e15")).as("total_err_e15"),
        max(col("err_e15")).as("max_err_e15"))
  }

  /** Simplified (centroid-based) silhouette per cluster label — the
    * clustering-quality score behind SemDeDup epsilon choices and
    * mixture-by-cluster decisions: for each point, `a` = distance to
    * its OWN label centroid, `b` = distance to the nearest OTHER
    * centroid, `s = (b − a)/max(a, b)` ∈ [−1, 1] (the Hartigan
    * medoid-free variant — O(n·k), never pairwise O(n²)).
    *
    * Engine-exactness: components quantize to `floor(v·2^scaleBits)`
    * ([[centroidBy]]'s trick), and the squared distance to a RATIONAL
    * centroid s/n clears denominators —
    * `D2 = Σ_pos (x_q·n − s_pos)²` — computed exactly in decimal. The
    * only doubles are `sqrt(D2)/(n·2^bits)` and the final ratio, one
    * mirrored expression each, rounded to micro-units and then
    * Long-summed per label.
    *
    * Shape (100 TB): the component join fans each point's dim rows out
    * by k labels (the k-means assignment-cost shape, shuffle on `pos`),
    * reduces to one (point, label) row, then one per-point pivot and
    * one per-label aggregation. k must be small (it multiplies the
    * pass); for large k use the IVF quantizer instead. */
  def silhouetteBy(df: DataFrame, idCol: String, labelCol: String,
                   vecCol: String, scaleBits: Int = 20): DataFrame = {
    require(scaleBits >= 1 && scaleBits <= 30, "scaleBits must be in [1, 30]")
    val m = math.pow(2.0, scaleBits)
    val expl = df
      .filter(col(vecCol).isNotNull && col(labelCol).isNotNull &&
        col(idCol).isNotNull)
      .select(col(idCol).as("__id"), col(labelCol).as("__own"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "__v")))
      .select(col("__id"), col("__own"), col("pos"),
        floor(col("__v") * lit(m)).cast("long").as("__xq"))
      .localCheckpoint(false) // moments + assignment join reuse
    val moments = expl.groupBy(col("__own").as("__clabel"), col("pos"))
      .agg(sum(col("__xq")).as("__s"), count(lit(1)).as("__n"))
    def d(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val d2 = expl.join(moments, "pos")
      .groupBy(col("__id"), col("__own"), col("__clabel"))
      .agg(max(col("__n")).as("__n"),
        sum((d(col("__xq")) * d(col("__n")) - d(col("__s"))) *
            (d(col("__xq")) * d(col("__n")) - d(col("__s")))).as("__dd"))
    val dist = d2.select(col("__id"), col("__own"), col("__clabel"),
      (sqrt(col("__dd").cast("double")) /
        (col("__n").cast("double") * lit(m))).as("__d"))
    val per = dist.groupBy(col("__id"), col("__own"))
      .agg(max(when(col("__clabel") === col("__own"), col("__d"))).as("__a"),
        min(when(col("__clabel") =!= col("__own"), col("__d"))).as("__b"))
    per
      .select(col("__own"),
        when(col("__b").isNotNull && greatest(col("__a"), col("__b")) > 0,
          round((col("__b") - col("__a")) / greatest(col("__a"), col("__b"))
            * 1000000).cast("long")).as("__sm"))
      .groupBy(col("__own"))
      .agg(count(lit(1)).as("n_points"),
        // floor of a double ratio, NOT integral div: s_micro can be
        // negative and Spark `div` truncates where SQL `//` floors;
        // the double is exact (|sum| < 2^53 ⟺ < ~9e9 points/label)
        when(count(col("__sm")) > 0,
          floor(sum(col("__sm")).cast("double") / count(col("__sm")))
            .cast("long")).as("mean_s_micro"))
      .select(col("__own").as(labelCol), col("n_points"),
        col("mean_s_micro"))
  }

  /** Exact d×d covariance of the embedding population — the input to
    * PCA / whitening / dimensionality audits. Components quantize to
    * integer units of 10^-scaleDigits (HALF-AWAY rounding, matching
    * SQL round()); ONE treeAggregate pass accumulates the d first
    * moments and the d(d+1)/2 upper-triangle products as longs, so
    * driver state is d² numbers (32 KB at d=64) regardless of corpus
    * size — the shape that holds at any row count. cov_ij =
    * (n·P_ij − S_i·S_j) / n² in quantized units², rescaled to the
    * original units by one exact power-of-ten division. Returns
    * (i, j, cov) for the upper triangle, 0-based. */
  /** One treeAggregate pass over the quantized vectors: row count,
    * per-dimension sums, and upper-triangle products — the shared
    * sufficient statistics behind [[covariance]] and [[pcaTopK]].
    * Driver state is d² longs regardless of corpus size. */
  private def covMoments(df: DataFrame, vecCol: String,
                         scaleDigits: Int): (Long, Array[Long], Array[Long]) = {
    val spark = df.sparkSession
    import spark.implicits._
    val unit = math.pow(10, scaleDigits)
    val vecs = df.filter(col(vecCol).isNotNull)
      .select(col(vecCol).cast("array<double>")).as[Seq[Double]]
    // acc = (n, sums[d], upper-triangle products[d*(d+1)/2]); arrays
    // allocate lazily on the first row of each partition
    type Acc = (Long, Array[Long], Array[Long])
    val zero: Acc = (0L, null, null)
    def quant(x: Double): Long = {
      val r = x * unit
      (if (r >= 0) math.floor(r + 0.5) else math.ceil(r - 0.5)).toLong
    }
    def seqOp(acc: Acc, v: Seq[Double]): Acc = {
      val d = v.length
      val (n, s0, p0) = acc
      val s = if (s0 == null) new Array[Long](d) else s0
      val p = if (p0 == null) new Array[Long](d * (d + 1) / 2) else p0
      require(s.length == d, "embedding dimensions must be uniform")
      val q = new Array[Long](d)
      var i = 0
      while (i < d) { q(i) = quant(v(i)); s(i) += q(i); i += 1 }
      var idx = 0
      i = 0
      while (i < d) {
        var j = i
        while (j < d) { p(idx) += q(i) * q(j); idx += 1; j += 1 }
        i += 1
      }
      (n + 1, s, p)
    }
    def combOp(x: Acc, y: Acc): Acc =
      if (x._2 == null) y
      else if (y._2 == null) x
      else {
        // partitions can each see only one row — the uniform-dimension
        // contract must hold across partitions too
        require(x._2.length == y._2.length,
          "embedding dimensions must be uniform")
        var i = 0
        while (i < x._2.length) { x._2(i) += y._2(i); i += 1 }
        i = 0
        while (i < x._3.length) { x._3(i) += y._3(i); i += 1 }
        (x._1 + y._1, x._2, x._3)
      }
    val (n, s, p) = vecs.rdd.treeAggregate(zero)(seqOp, combOp)
    require(n > 0, "no vectors")
    (n, s, p)
  }

  def covariance(df: DataFrame, vecCol: String,
                 scaleDigits: Int = 3, outDigits: Int = 6): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val unit = math.pow(10, scaleDigits)
    val (n, s, p) = covMoments(df, vecCol, scaleDigits)
    val d = s.length
    val unit2 = unit * unit
    val rows = for {
      i <- 0 until d
      j <- i until d
    } yield {
      val idx = i * d - i * (i - 1) / 2 + (j - i)
      // exact BigInt numerator; the double division is the only
      // inexact step, mirrored by the oracle
      val num = BigInt(n) * BigInt(p(idx)) - BigInt(s(i)) * BigInt(s(j))
      val cov = BigDecimal(num.toDouble / (n.toDouble * n.toDouble) / unit2)
        .setScale(outDigits, BigDecimal.RoundingMode.HALF_UP).toDouble
      (i, j, cov)
    }
    rows.toDF("i", "j", "cov")
  }

  /** Principal components of the embedding population. The covariance
    * comes from the same single-pass [[covMoments]] sufficient
    * statistics (d² driver state, corpus-size independent); the d×d
    * eigendecomposition — a driver-trivial dense problem at embedding
    * dimensions — runs as cyclic Jacobi sweeps to convergence.
    * Components are sorted by descending eigenvalue with a
    * deterministic sign convention (the largest-|weight| coordinate is
    * positive). Eigendecomposition has no SQL oracle; correctness is
    * spec-pinned: orthonormality, eigenvalue ordering, trace identity,
    * and projected-variance == eigenvalue. */
  case class PcaModel(eigenvalues: Array[Double],
                      components: Array[Array[Double]]) {
    def k: Int = components.length
    def d: Int = if (components.isEmpty) 0 else components(0).length
  }

  def pcaTopK(df: DataFrame, vecCol: String, k: Int,
              scaleDigits: Int = 3): PcaModel = {
    require(k >= 1, "k must be >= 1")
    val unit = math.pow(10, scaleDigits)
    val (n, s, p) = covMoments(df, vecCol, scaleDigits)
    val d = s.length
    require(k <= d, s"k=$k exceeds dimension $d")
    val unit2 = unit * unit
    // population covariance in original units
    val a = Array.ofDim[Double](d, d)
    for (i <- 0 until d; j <- i until d) {
      val idx = i * d - i * (i - 1) / 2 + (j - i)
      val num = BigInt(n) * BigInt(p(idx)) - BigInt(s(i)) * BigInt(s(j))
      val c = num.toDouble / (n.toDouble * n.toDouble) / unit2
      a(i)(j) = c; a(j)(i) = c
    }
    // cyclic Jacobi on the symmetric matrix; v accumulates rotations
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 100 && off > 1e-12) {
      off = 0.0
      for (pi <- 0 until d - 1; qi <- pi + 1 until d) {
        val apq = a(pi)(qi)
        if (math.abs(apq) > 1e-300) {
          off = math.max(off, math.abs(apq))
          val theta = (a(qi)(qi) - a(pi)(pi)) / (2.0 * apq)
          val t = math.signum(theta) match {
            case 0.0 => 1.0
            case sgn => sgn / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
          }
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val sn = t * c
          var i = 0
          while (i < d) {
            val aip = a(i)(pi); val aiq = a(i)(qi)
            a(i)(pi) = c * aip - sn * aiq
            a(i)(qi) = sn * aip + c * aiq
            i += 1
          }
          i = 0
          while (i < d) {
            val api = a(pi)(i); val aqi = a(qi)(i)
            a(pi)(i) = c * api - sn * aqi
            a(qi)(i) = sn * api + c * aqi
            val vip = v(i)(pi); val viq = v(i)(qi)
            v(i)(pi) = c * vip - sn * viq
            v(i)(qi) = sn * vip + c * viq
            i += 1
          }
        }
      }
      sweep += 1
    }
    val pairs = (0 until d).map { j =>
      (a(j)(j), Array.tabulate(d)(i => v(i)(j)))
    }.sortBy(-_._1).take(k)
    val comps = pairs.map { case (_, vec) =>
      // deterministic sign: the largest-|weight| coordinate positive
      val m = vec.indices.maxBy(i => (math.abs(vec(i)), -i))
      if (vec(m) < 0) vec.map(x => -x) else vec
    }.toArray
    PcaModel(pairs.map(_._1).toArray, comps)
  }

  /** Project every vector onto the model's components — one narrow
    * typed kernel pass with the (k×d) component matrix broadcast;
    * corpus-linear, no shuffle. Returns (idCol, scores[k]). */
  def pcaProject(df: DataFrame, idCol: String, vecCol: String,
                 model: PcaModel): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model.components)
    df.filter(col(vecCol).isNotNull && col(idCol).isNotNull)
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Seq[Double])]
      .mapPartitions { it =>
        val comps = bc.value
        it.map { case (id, vec) =>
          val scores = comps.map { c =>
            var acc = 0.0
            var i = 0
            while (i < c.length) { acc += c(i) * vec(i); i += 1 }
            acc
          }
          (id, scores.toSeq)
        }
      }
      .toDF(idCol, "scores")
  }
}
