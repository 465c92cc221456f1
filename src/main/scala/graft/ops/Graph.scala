package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Graph analytics over pair evidence (the natural follow-on to
  * [[Dedup.connectedComponents]]: rank nodes WITHIN the near-dup /
  * similarity graph, e.g. to pick canonical documents or weight
  * cluster members).
  *
  * PageRank here is FIXED-POINT INTEGER arithmetic end to end: ranks
  * live in nano-units (`scale` = 1e9), every contribution is integral
  * division, every sum is a long sum — so there is NO floating point
  * anywhere, summation order cannot matter, and the whole trajectory
  * is bit-exact on any engine (the DuckDB oracle unrolls the
  * iterations and reproduces it row-for-row). The cost is deterministic
  * downward truncation: each division floors, so total mass shrinks by
  * at most ~N nano-units per iteration — a reproducibility-for-
  * last-digit trade the verification story is built on.
  */
object Graph {

  /** `iters` PageRank power iterations with damping `dampNum/dampDen`
    * (default 17/20 = 0.85) over directed edges; returns
    * (id, pr_nano).
    *
    * Dangling nodes (no out-edges): by default their mass leaks — the
    * common SQL-PageRank simplification, fine for ranking within
    * connected similarity graphs where every node has an edge
    * (symmetrize undirected pair evidence first), and kept as the
    * default for trajectory continuity with existing oracles. With
    * `redistributeDangling = true` the STANDARD semantics apply: each
    * iteration aggregates the sink mass and hands every node an equal
    * integral share (`sinkMass div n`) before damping — still pure
    * long arithmetic, still bit-exact on any engine.
    *
    * Scale notes (100 TB): per iteration one key-join of edges to the
    * rank table (shuffle on src), one grouped long-sum on dst, one
    * left join back to nodes — the canonical distributed power-
    * iteration shape, bounded by `iters`. Redistribution adds ONE
    * scalar aggregate (sink-mass sum) per iteration — a driver-side
    * long, not a data motion. Each round ends in an eager
    * localCheckpoint (same rationale as connectedComponents: without
    * the lineage cut, round t re-plans t join layers). */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 5, dampNum: Long = 17L, dampDen: Long = 20L,
               scale: Long = 1000000000L,
               maxLocalEdges: Long = 1L << 20,
               redistributeDangling: Boolean = false): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    require(dampDen > 0 && dampNum >= 0 && dampNum <= dampDen,
      "damping must be a fraction in [0, 1]")
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct().localCheckpoint(true)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct().localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "graph has no edges")
    val teleport = ((dampDen - dampNum) * scale) / (dampDen * n)
    // Small-graph fast path (the connectedComponents cutover): below an
    // explicit edge bound, run the SAME integer recurrence on the
    // driver — identical ranks (pure long arithmetic, no accumulation-
    // order sensitivity), two jobs total instead of one checkpointed
    // join-agg-join round per iteration. The gate is a count() on the
    // already-checkpointed edge blocks: no row transfer before the
    // distributed loop on a graph that exceeds the bound.
    if (e.count() <= maxLocalEdges) {
      val es = e.as[(Long, Long)].collect()
      val ids = nodes.as[Long].collect()
      val idx = ids.zipWithIndex.toMap
      val deg = new Array[Long](ids.length)
      es.foreach { case (s, _) => deg(idx(s)) += 1L }
      var pr = Array.fill(ids.length)(scale / n)
      for (_ <- 1 to iters) {
        val contrib = new Array[Long](ids.length)
        es.foreach { case (s, d) => contrib(idx(d)) += pr(idx(s)) / deg(idx(s)) }
        // equal integral share of the sink mass to every node — the same
        // long arithmetic the distributed loop runs
        val share = if (redistributeDangling) {
          var sink = 0L
          var i = 0
          while (i < pr.length) { if (deg(i) == 0L) sink += pr(i); i += 1 }
          sink / n
        } else 0L
        pr = contrib.map(c => teleport + dampNum * (c + share) / dampDen)
      }
      return spark.createDataset(ids.toSeq.zip(pr.toSeq)).toDF("id", "pr_nano")
    }
    val ed = e.join(e.groupBy("src").agg(count(lit(1)).as("deg")), "src")
      .localCheckpoint(true)
    // dangling node set: computed once, tiny join key table per round
    val dangling =
      if (redistributeDangling)
        nodes.join(e.select(col("src").as("id")).distinct(), Seq("id"),
          "left_anti").localCheckpoint(true)
      else null
    var pr = nodes.select(col("id"), lit(scale / n).as("pr"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      // sink mass: ONE scalar long per round (exact sum, then one
      // integral division on the driver — matches the local path)
      val share = if (redistributeDangling) {
        val sink = pr.join(dangling, Seq("id"))
          .agg(coalesce(sum(col("pr")), lit(0L))).head().getLong(0)
        sink / n
      } else 0L
      val contrib = ed.join(pr, ed("src") === pr("id"))
        .select(col("dst"), expr("pr div deg").as("c")) // integral div: exact
        .groupBy("dst").agg(sum(col("c")).as("s"))      // long sum: exact
      pr = nodes.join(contrib, nodes("id") === contrib("dst"), "left")
        .select(nodes("id"),
          (lit(teleport) +
            expr(s"($dampNum * (coalesce(s, CAST(0 AS BIGINT)) + $share)) div $dampDen"))
            .as("pr"))
        .localCheckpoint(true)
    }
    pr.select(col("id"), col("pr").cast("long").as("pr_nano"))
  }

  /** k-hop HARMONIC (closeness) centrality: per node, the exact count
    * of nodes at each BFS distance 1..maxHops and the integral
    * harmonic sum Σ n_d·⌊10⁶/d⌋ — the "how central is this node
    * locally" measure that, unlike degree, sees past the first hop,
    * and unlike full closeness, stays bounded (maxHops frontier
    * rounds, no all-pairs shortest paths). Undirected: edges are
    * symmetrized internally. Each round is one adjacency equi-join +
    * one distinct + one anti-join against the visited set — the
    * frontier shape that survives any graph size for small maxHops.
    * Returns (id, n_1..n_maxHops, harmonic_micro). */
  def harmonicCentrality(edges: DataFrame, srcCol: String, dstCol: String,
                         maxHops: Int = 3,
                         maxLocalEdges: Long = 1L << 20): DataFrame = {
    require(maxHops >= 1 && maxHops <= 6, "maxHops must be in [1, 6]")
    val spark = edges.sparkSession
    val e0 = edges.select(col(srcCol).cast("long").as("s"),
        col(dstCol).cast("long").as("d"))
      .filter(col("s").isNotNull && col("d").isNotNull && col("s") =!= col("d"))
    val sym = e0.unionAll(e0.select(col("d").as("s"), col("s").as("d")))
      .distinct().localCheckpoint(true)
    // Count-gated driver fast path (the pageRank cutover pattern):
    // below the edge bound the same BFS runs as set arithmetic on the
    // driver — bit-identical counts, two jobs instead of ~3 per hop.
    if (sym.count() <= maxLocalEdges) {
      import spark.implicits._
      val es = sym.as[(Long, Long)].collect()
      val ids = es.map(_._1).distinct.sorted
      val idx = ids.zipWithIndex.toMap
      val nv = ids.length
      // CSR adjacency + reusable mark/frontier arrays: the per-node BFS
      // is pure int-array arithmetic (immutable Sets here measured ~3 s
      // on a 1k-node co-purchase graph; this is ~10 ms)
      val deg = new Array[Int](nv)
      es.foreach { case (s, _) => deg(idx(s)) += 1 }
      val start = new Array[Int](nv + 1)
      var i = 0
      while (i < nv) { start(i + 1) = start(i) + deg(i); i += 1 }
      val adj = new Array[Int](es.length)
      val fill = start.clone()
      es.foreach { case (s, d) =>
        val si = idx(s); adj(fill(si)) = idx(d); fill(si) += 1
      }
      val mark = Array.fill(nv)(-1)
      var cur = new Array[Int](nv)
      var nxt = new Array[Int](nv)
      val rows = (0 until nv).map { v0 =>
        val counts = new Array[Long](maxHops)
        mark(v0) = v0
        var curN = 0
        var j = start(v0)
        while (j < start(v0 + 1)) {
          val u = adj(j)
          if (mark(u) != v0) { mark(u) = v0; cur(curN) = u; curN += 1 }
          j += 1
        }
        var h = 0
        while (h < maxHops && curN > 0) {
          counts(h) = curN.toLong
          var nxtN = 0
          var c = 0
          while (c < curN) {
            val u = cur(c)
            var k = start(u)
            while (k < start(u + 1)) {
              val w = adj(k)
              if (mark(w) != v0) { mark(w) = v0; nxt(nxtN) = w; nxtN += 1 }
              k += 1
            }
            c += 1
          }
          val t = cur; cur = nxt; nxt = t; curN = nxtN
          h += 1
        }
        val harmonic = (1 to maxHops).map(d => counts(d - 1) * (1000000L / d)).sum
        Row.fromSeq(ids(v0) +: counts.toSeq :+ harmonic)
      }
      val schema = StructType(
        StructField("id", LongType, nullable = false) +:
          (1 to maxHops).map(d => StructField(s"n_$d", LongType, nullable = false)) :+
          StructField("harmonic_micro", LongType, nullable = false))
      return spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq), schema)
    }
    var frontier = sym.select(col("s").as("v"), col("d").as("u"))
      .distinct().localCheckpoint(true)
    var visited = frontier
      .unionAll(frontier.select(col("v"), col("v").as("u")).distinct())
      .localCheckpoint(true)
    val levels = scala.collection.mutable.ArrayBuffer(
      frontier.groupBy("v").agg(count(lit(1)).as("n1")))
    var hop = 2
    while (hop <= maxHops) {
      frontier = frontier.join(sym, frontier("u") === sym("s"))
        .select(frontier("v"), sym("d").as("u"))
        .filter(col("v") =!= col("u"))
        .distinct()
        .join(visited, Seq("v", "u"), "left_anti")
        .localCheckpoint(true)
      visited = visited.unionAll(frontier).localCheckpoint(true)
      levels += frontier.groupBy("v").agg(count(lit(1)).as(s"n$hop"))
      hop += 1
    }
    val ids = visited.select(col("v").as("id")).distinct()
    val joined = levels.zipWithIndex.foldLeft(ids) { case (acc, (lvl, i)) =>
      acc.join(lvl.withColumnRenamed("v", "id"), Seq("id"), "left")
        .withColumn(s"n_${i + 1}",
          coalesce(col(s"n${i + 1}"), lit(0L))).drop(s"n${i + 1}")
    }
    val harmonic = (1 to maxHops).map(d =>
      col(s"n_$d") * lit(1000000L / d)).reduce(_ + _)
    joined.withColumn("harmonic_micro", harmonic)
  }

  /** Personalized PageRank: the teleport mass returns ONLY to the seed
    * set (uniformly), so ranks measure proximity to the seeds — the
    * standard seed-expansion primitive (find docs "around" known-good
    * or known-bad ones in the near-dup/link graph). Same fixed-round
    * integral nano-unit recurrence as [[pageRank]] (bit-exact on
    * either the driver fast path or the distributed loop): pr_0 =
    * scale/|S| on seeds, 0 elsewhere; pr_{t+1} = [id ∈ S]·(1−d)·scale/|S|
    * + d·Σ contrib. Returns (id, ppr_nano). */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
                           seeds: Seq[Long], iters: Int = 5,
                           dampNum: Long = 17L, dampDen: Long = 20L,
                           scale: Long = 1000000000L,
                           maxLocalEdges: Long = 1L << 20): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    require(seeds.nonEmpty, "personalizedPageRank needs a seed set")
    require(dampDen > 0 && dampNum >= 0 && dampNum <= dampDen,
      "damping must be a fraction in [0, 1]")
    val spark = edges.sparkSession
    import spark.implicits._
    val seedSet = seeds.toSet
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct().localCheckpoint(true)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct().localCheckpoint(true)
    val s = seedSet.size.toLong
    val init = scale / s
    val teleport = ((dampDen - dampNum) * scale) / (dampDen * s)
    if (e.count() <= maxLocalEdges) {
      val es = e.as[(Long, Long)].collect()
      val ids = nodes.as[Long].collect()
      val idx = ids.zipWithIndex.toMap
      val deg = new Array[Long](ids.length)
      es.foreach { case (src, _) => deg(idx(src)) += 1L }
      var pr = ids.map(id => if (seedSet(id)) init else 0L)
      for (_ <- 1 to iters) {
        val contrib = new Array[Long](ids.length)
        es.foreach { case (src, d) =>
          contrib(idx(d)) += pr(idx(src)) / deg(idx(src))
        }
        pr = ids.indices.toArray.map { i =>
          (if (seedSet(ids(i))) teleport else 0L) +
            dampNum * contrib(i) / dampDen
        }
      }
      return spark.createDataset(ids.toSeq.zip(pr.toSeq)).toDF("id", "ppr_nano")
    }
    val ed = e.join(e.groupBy("src").agg(count(lit(1)).as("deg")), "src")
      .localCheckpoint(true)
    val isSeed = col("id").isin(seeds: _*)
    var pr = nodes.select(col("id"),
        when(isSeed, lit(init)).otherwise(lit(0L)).as("pr"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val contrib = ed.join(pr, ed("src") === pr("id"))
        .select(col("dst"), expr("pr div deg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("s"))
      pr = nodes.join(contrib, nodes("id") === contrib("dst"), "left")
        .select(nodes("id"),
          (when(isSeed, lit(teleport)).otherwise(lit(0L)) +
            expr(s"($dampNum * coalesce(s, CAST(0 AS BIGINT))) div $dampDen"))
            .as("pr"))
        .localCheckpoint(true)
    }
    pr.select(col("id"), col("pr").cast("long").as("ppr_nano"))
  }

  /** k-core decomposition membership: `rounds` synchronous peeling
    * iterations (drop every node with degree < k, recompute), returning
    * the surviving nodes with their final in-core degrees. With
    * `rounds` at or beyond convergence this IS the k-core (the unique
    * maximal subgraph of min-degree >= k); fixing the round count keeps
    * the whole trajectory engine-exact (the oracle unrolls the same
    * rounds), and synchronous peeling converges in O(peel depth)
    * rounds — typically a handful on co-occurrence graphs. On a graph
    * whose peel depth exceeds `rounds` the result is NOT yet the core —
    * use [[kCoreConverged]] (fixpoint iteration, no truncation) unless
    * you specifically need this variant's fixed, oracle-unrollable
    * trajectory.
    *
    * Scale notes (100 TB): one degree aggregation + one semi-join per
    * round on the edge key, bounded by `rounds`; each round ends in an
    * eager localCheckpoint (the connectedComponents rationale). Below
    * `maxLocalEdges` the same integer peeling runs on the driver —
    * set-membership arithmetic only, so it is bit-identical to the
    * distributed loop (the PageRank cutover pattern). */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
            rounds: Int = 6, maxLocalEdges: Long = 1L << 20): DataFrame = {
    require(k >= 1 && rounds >= 1, "k and rounds must be >= 1")
    val spark = edges.sparkSession
    import spark.implicits._
    val a = least(col(srcCol).cast("long"), col(dstCol).cast("long"))
    val b = greatest(col(srcCol).cast("long"), col(dstCol).cast("long"))
    val e0 = edges.filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .select(a.as("a"), b.as("b")).filter(col("a") =!= col("b"))
      .distinct().localCheckpoint(true)
    if (e0.count() <= maxLocalEdges) {
      var es = e0.as[(Long, Long)].collect()
      for (_ <- 1 to rounds) {
        val deg = scala.collection.mutable.Map.empty[Long, Int]
        es.foreach { case (x, y) =>
          deg(x) = deg.getOrElse(x, 0) + 1; deg(y) = deg.getOrElse(y, 0) + 1 }
        es = es.filter { case (x, y) => deg(x) >= k && deg(y) >= k }
      }
      val deg = scala.collection.mutable.Map.empty[Long, Long]
      es.foreach { case (x, y) =>
        deg(x) = deg.getOrElse(x, 0L) + 1L; deg(y) = deg.getOrElse(y, 0L) + 1L }
      return spark.createDataset(deg.toSeq.sortBy(_._1)).toDF("id", "core_deg")
    }
    var e = e0
    for (_ <- 1 to rounds) {
      val deg = e.select(col("a").as("id")).unionAll(e.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
      val good = deg.filter(col("deg") >= k).select("id")
      e = e.join(good.select(col("id").as("a")), "a")
        .join(good.select(col("id").as("b")), "b")
        .select("a", "b").localCheckpoint(true)
    }
    e.select(col("a").as("id")).unionAll(e.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("core_deg"))
  }

  /** [[kCore]] iterated to the FIXPOINT instead of a fixed round
    * budget: peels until no node falls below degree k, so the result is
    * the true k-core regardless of peel depth. The fixed-round variant
    * can silently truncate on deep-peel graphs (a long path peels two
    * endpoints per round); use this one unless you need the
    * round-for-round engine-exact trajectory the oracle unrolls.
    *
    * Convergence gate: peeling is MONOTONE — each round's edge set is a
    * subset of the previous round's — so an unchanged edge COUNT
    * already proves an unchanged edge set. One cheap count per round
    * (no except(), no hash fingerprint; the
    * [[graft.ops.Dedup.connectedComponentsStar]] gate needs the XOR +
    * exact check only because star contraction rewrites edges
    * non-monotonically). `maxIter` is a runaway bound, not a truncation
    * knob: hitting it throws rather than returning a non-core. */
  def kCoreConverged(edges: DataFrame, srcCol: String, dstCol: String,
                     k: Int, maxIter: Int = 1000,
                     maxLocalEdges: Long = 1L << 20): DataFrame = {
    require(k >= 1 && maxIter >= 1, "k and maxIter must be >= 1")
    val spark = edges.sparkSession
    import spark.implicits._
    val a = least(col(srcCol).cast("long"), col(dstCol).cast("long"))
    val b = greatest(col(srcCol).cast("long"), col(dstCol).cast("long"))
    val e0 = edges.filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .select(a.as("a"), b.as("b")).filter(col("a") =!= col("b"))
      .distinct().localCheckpoint(true)
    var n = e0.count()
    if (n <= maxLocalEdges) {
      // driver cutover: same integer peeling, bit-identical to the
      // distributed loop (the kCore/PageRank cutover pattern)
      var es = e0.as[(Long, Long)].collect()
      var changed = true
      var iter = 0
      while (changed && iter < maxIter) {
        val deg = scala.collection.mutable.Map.empty[Long, Int]
        es.foreach { case (x, y) =>
          deg(x) = deg.getOrElse(x, 0) + 1; deg(y) = deg.getOrElse(y, 0) + 1 }
        val next = es.filter { case (x, y) => deg(x) >= k && deg(y) >= k }
        changed = next.length != es.length
        es = next
        iter += 1
      }
      require(!changed || iter < maxIter,
        s"k-core peeling did not converge within $maxIter rounds")
      val deg = scala.collection.mutable.Map.empty[Long, Long]
      es.foreach { case (x, y) =>
        deg(x) = deg.getOrElse(x, 0L) + 1L; deg(y) = deg.getOrElse(y, 0L) + 1L }
      return spark.createDataset(deg.toSeq.sortBy(_._1)).toDF("id", "core_deg")
    }
    var e = e0
    var changed = n > 0
    var iter = 0
    while (changed && iter < maxIter) {
      val deg = e.select(col("a").as("id")).unionAll(e.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
      val good = deg.filter(col("deg") >= k).select("id")
      val next = e.join(good.select(col("id").as("a")), "a")
        .join(good.select(col("id").as("b")), "b")
        .select("a", "b").localCheckpoint(true)
      val m = next.count()
      changed = m != n
      e = next
      n = m
      iter += 1
    }
    require(!changed || iter < maxIter,
      s"k-core peeling did not converge within $maxIter rounds")
    e.select(col("a").as("id")).unionAll(e.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("core_deg"))
  }

  /** Per-node triangle participation counts over an undirected graph
    * given as (possibly duplicated / bidirectional) edge pairs.
    * Returns (id, n_triangles) for every node in ≥ 1 triangle —
    * integer counts, engine-exact regardless of enumeration order.
    *
    * Shape — the compact-forward / degree-orientation algorithm: each
    * undirected edge is oriented from its lower-(degree, id) endpoint
    * to the higher, making a DAG whose out-degrees are O(√m); the
    * wedge join (u→v)⋈(v→w) is then bounded by Σ outdeg² = O(m^1.5)
    * TOTAL — the classic worst-case-optimal bound — instead of
    * Σ deg² (quadratic in the max degree) for an unoriented join. The
    * closing check (u→w) is a key-join on the oriented edge set. Every
    * shuffle is on edge keys; per-node counts come from exploding each
    * triangle's three members. */
  def triangleCount(edges: DataFrame, srcCol: String,
                    dstCol: String): DataFrame = {
    val a = least(col(srcCol).cast("long"), col(dstCol).cast("long"))
    val b = greatest(col(srcCol).cast("long"), col(dstCol).cast("long"))
    val e = edges.filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .select(a.as("a"), b.as("b")).filter(col("a") =!= col("b"))
      .distinct().localCheckpoint(false) // reused 3× below
    val deg = e.select(col("a").as("id")).unionAll(e.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    // orient low-(deg, id) → high-(deg, id)
    val o = e
      .join(deg.select(col("id").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("deg").as("db")), "b")
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("u"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("v"))
      .localCheckpoint(false) // wedge + closing joins reuse the DAG
    val wedges = o.select(col("u"), col("v"))
      .join(o.select(col("u").as("v"), col("v").as("w")), "v")
    val tris = wedges.join(
      o.select(col("u"), col("v").as("w"), lit(1).as("__hit")), Seq("u", "w"))
    tris.select(explode(array(col("u"), col("v"), col("w"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_triangles"))
  }

  /** HITS hubs-and-authorities over directed edges — the link-analysis
    * complement to [[pageRank]]: authorities are pointed AT by good
    * hubs, hubs point TO good authorities (Kleinberg 1999). Used in
    * crawl curation to rank link-hub pages vs content pages.
    *
    * Pure LONG arithmetic like the integer PageRank: h⁰ = 1, then
    * alternately a ← Σ_in h and h ← Σ_out a. Instead of the textbook
    * L2 normalization (which would drag floating point — and its
    * summation-order sensitivity — into every iteration), each half-step
    * rescales by an integer POWER-OF-TWO shift chosen from the current
    * maximum (`floor(log2 max) − 39`, clamping values under 2^40):
    * division by 2^k floors identically on every engine, so the whole
    * trajectory is bit-exact, and sums of up-to-2^40 values stay far
    * from Long overflow for any realistic in/out-degree (< 2^23 ≈ 8M
    * same-key edges). Returns (id, auth, hub) in the final rescaled
    * integer units plus each node's share of the respective total
    * (`auth_share`/`hub_share`, the scale-free quantity).
    *
    * Shape (100 TB): per half-iteration one edge-to-score equi-join +
    * one grouped long-sum (the power-iteration shape, shuffle on the
    * join key) + ONE scalar max aggregate for the shift; each round
    * ends in an eager localCheckpoint (the [[pageRank]] lineage-cut
    * rationale). */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iters: Int = 2, maxLocalEdges: Long = 1L << 20): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct().localCheckpoint(true)
    // Small-graph fast path (optimization round 19 — the pageRank /
    // connectedComponents cutover discipline): below an explicit edge
    // bound, run the SAME pure-long trajectory on the driver — long
    // sums are order-free exact and the power-of-two rescale is the
    // identical `floor(log2 max) − 39` shift, so the integer scores
    // and the closing double divisions are bit-identical to the
    // distributed loop, in two jobs instead of 2 agg + 2 checkpoint
    // jobs PER HALF-ITERATION. The gate is a count() on the already-
    // checkpointed edge blocks: a 100 TB edge set pays no collect
    // before taking the distributed loop below.
    if (e.count() <= maxLocalEdges) {
      val es = e.as[(Long, Long)].collect()
      val idx = new java.util.HashMap[Long, Integer]()
      val idBuf = scala.collection.mutable.ArrayBuffer.empty[Long]
      def ix(id: Long): Int = {
        val got = idx.get(id)
        if (got != null) got.intValue()
        else { val i = idBuf.length; idx.put(id, i); idBuf += id; i }
      }
      val srcI = new Array[Int](es.length)
      val dstI = new Array[Int](es.length)
      var k = 0
      while (k < es.length) {
        srcI(k) = ix(es(k)._1); dstI(k) = ix(es(k)._2); k += 1
      }
      val n = idBuf.length
      def rescale(a: Array[Long]): Array[Long] = {
        var mx = 1L // empty-nodes coalesce(max, 1); n > 0 here, but a
        var i = 0   // genuine all-max is what the shift reads
        while (i < a.length) { if (a(i) > mx) mx = a(i); i += 1 }
        val shift = math.max(0,
          (63 - java.lang.Long.numberOfLeadingZeros(mx)) - 39)
        if (shift == 0) a else a.map(v => v >> shift)
      }
      var hub = Array.fill(n)(1L)
      var auth = new Array[Long](n)
      for (_ <- 1 to iters) {
        val na = new Array[Long](n)
        k = 0
        while (k < es.length) { na(dstI(k)) += hub(srcI(k)); k += 1 }
        auth = rescale(na)
        val nh = new Array[Long](n)
        k = 0
        while (k < es.length) { nh(srcI(k)) += auth(dstI(k)); k += 1 }
        hub = rescale(nh)
      }
      var ta = 0L; var th = 0L
      var i = 0
      while (i < n) { ta += auth(i); th += hub(i); i += 1 }
      val (taM, thM) = (math.max(ta, 1L), math.max(th, 1L))
      return spark.createDataset((0 until n).map(j =>
          (idBuf(j), auth(j), hub(j),
            auth(j).toDouble / taM, hub(j).toDouble / thM)))
        .toDF("id", "auth", "hub", "auth_share", "hub_share")
    }
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct().localCheckpoint(true)
    // integer power-of-two rescale keeping max < 2^40
    def rescaled(scores: DataFrame, c: String): DataFrame = {
      val mx = scores.agg(coalesce(max(col(c)), lit(1L))).head().getLong(0)
      val shift = math.max(0, (63 - java.lang.Long.numberOfLeadingZeros(mx)) - 39)
      if (shift == 0) scores
      else scores.select(col("id"), shiftright(col(c), shift).as(c))
    }
    var hub = nodes.select(col("id"), lit(1L).as("hub"))
      .localCheckpoint(true)
    var auth: DataFrame = null
    for (_ <- 1 to iters) {
      auth = rescaled(nodes.join(
          e.join(hub, e("src") === hub("id")).groupBy(col("dst")).agg(sum(col("hub")).as("auth"))
            .withColumnRenamed("dst", "id"),
          Seq("id"), "left")
        .select(col("id"), coalesce(col("auth"), lit(0L)).as("auth")), "auth")
        .localCheckpoint(true)
      hub = rescaled(nodes.join(
          e.join(auth, e("dst") === auth("id")).groupBy(col("src")).agg(sum(col("auth")).as("hub"))
            .withColumnRenamed("src", "id"),
          Seq("id"), "left")
        .select(col("id"), coalesce(col("hub"), lit(0L)).as("hub")), "hub")
        .localCheckpoint(true)
    }
    val joined = auth.join(hub, "id").localCheckpoint(false)
    val tot = joined.agg(
      coalesce(sum(col("auth")), lit(0L)).as("ta"),
      coalesce(sum(col("hub")), lit(0L)).as("th")).head()
    val (ta, th) = (math.max(tot.getLong(0), 1L), math.max(tot.getLong(1), 1L))
    joined.select(col("id"), col("auth"), col("hub"),
      (col("auth").cast("double") / ta).as("auth_share"),
      (col("hub").cast("double") / th).as("hub_share"))
  }

  /** Undirected simple-graph normalization shared by the similarity
    * operators below: symmetric, deduplicated, self-loop-free, with
    * endpoints ordered a < b. */
  private def simple(edges: DataFrame, srcCol: String,
                     dstCol: String): DataFrame = {
    val a = least(col(srcCol).cast("long"), col(dstCol).cast("long"))
    val b = greatest(col(srcCol).cast("long"), col(dstCol).cast("long"))
    edges.filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .select(a.as("a"), b.as("b")).filter(col("a") =!= col("b"))
      .distinct()
  }

  /** Link-prediction scores for every node pair sharing at least one
    * common neighbor: common-neighbor count, neighborhood Jaccard, and
    * the Resource-Allocation index (Zhou et al. 2009) — RA instead of
    * Adamic-Adar because `Σ 1e12 div deg(z)` is pure integer
    * arithmetic, so the score is order-independent and engine-exact
    * (Adamic-Adar's `1/ln deg` would ride on cross-engine libm).
    *
    * @param maxDegree wedge middles with degree above this are skipped
    *   — the standard super-hub cut: one celebrity node of degree d
    *   would otherwise emit d² candidate pairs. Capping bounds the
    *   wedge join by `Σ_z min(deg z, maxDegree)²` and is also how a
    *   bipartite graph is projected onto one side (cap below the far
    *   side's degrees → only near-side pairs survive).
    *
    * Shape (100 TB): one distinct edge normalization, one degree
    * aggregation, ONE self-equi-join on the wedge middle (shuffle on
    * z), one grouped sum per pair, plus degree joins keyed on u/v.
    * `is_edge` marks already-connected pairs via a left join against
    * the edge set — candidates for link prediction are the rows with
    * `is_edge = false`. */
  def linkPredict(edges: DataFrame, srcCol: String, dstCol: String,
                  maxDegree: Int = 1000): DataFrame = {
    require(maxDegree >= 1, s"maxDegree must be positive, got $maxDegree")
    val e = simple(edges, srcCol, dstCol).localCheckpoint(false)
    val adj = e.select(col("a").as("id"), col("b").as("nb"))
      .unionAll(e.select(col("b").as("id"), col("a").as("nb")))
    val deg = adj.groupBy("id").agg(count(lit(1)).as("deg"))
    val mid = adj.join(deg, "id").filter(col("deg") <= maxDegree)
      .select(col("id").as("z"), col("nb"), col("deg").as("degz"))
    val wedges = mid.select(col("z"), col("nb").as("u"), col("degz"))
      .join(mid.select(col("z"), col("nb").as("v")), "z")
      .filter(col("u") < col("v"))
    val pairs = wedges.groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("cn"),
        sum(expr("1000000000000 div degz")).as("ra_e12"))
    pairs
      .join(deg.select(col("id").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), "v")
      .join(e.select(col("a").as("u"), col("b").as("v"),
        lit(true).as("__e")), Seq("u", "v"), "left")
      .select(col("u"), col("v"), col("cn"),
        col("ra_e12"),
        expr("cn * 1000000 div (du + dv - cn)").as("jac_ppm"),
        coalesce(col("__e"), lit(false)).as("is_edge"))
  }

  /** Local clustering coefficient per node: `2·triangles div
    * (deg·(deg−1))` in ppm — how tightly a node's neighborhood closes.
    * Rides on [[triangleCount]]'s degree-oriented O(m^1.5) wedge join;
    * adds one degree aggregation and one left join (nodes in no
    * triangle coefficient 0, degree-1 nodes null). */
  def clusteringCoeff(edges: DataFrame, srcCol: String,
                      dstCol: String): DataFrame = {
    val e = simple(edges, srcCol, dstCol).localCheckpoint(false)
    val deg = e.select(col("a").as("id")).unionAll(e.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val tri = triangleCount(e, "a", "b")
    deg.join(tri, Seq("id"), "left")
      .select(col("id"), col("deg"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("deg") >= 2,
          expr("2 * coalesce(n_triangles, 0) * 1000000 div (deg * (deg - 1))"))
          .as("coeff_ppm"))
  }

  /** Degree distribution of the (undirected, simple) graph: one row
    * per distinct degree with its node count and ppm share — the
    * first look at any crawl/link/co-occurrence graph (is there a
    * heavy tail that needs hub caps?). Two aggregations, all
    * integral. */
  def degreeDistribution(edges: DataFrame, srcCol: String,
                         dstCol: String): DataFrame = {
    val e = simple(edges, srcCol, dstCol)
    val deg = e.select(col("a").as("id")).unionAll(e.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val n = deg.count()
    deg.groupBy(col("deg"))
      .agg(count(lit(1)).as("n_nodes"))
      .select(col("deg"), col("n_nodes"),
        expr(s"n_nodes * 1000000 div CAST($n AS BIGINT)").as("share_ppm"))
  }

  /** Semi-supervised label propagation with clamped seeds: spread
    * known labels (quality tier, topic, license class) from seed nodes
    * to their graph neighborhood — the "label the near-dups like their
    * labeled original" pass. Synchronous rounds; per round each node
    * takes the majority label of its labeled neighbors with the
    * deterministic (count desc, label asc) tiebreak, seeds stay
    * clamped, nodes with no labeled neighbor keep their previous
    * state. Fixed `rounds` (each is one edge-label equi-join + one
    * grouped count + one argmax — the power-iteration shape), so the
    * oracle unrolls mechanically; labels reach at most `rounds` hops.
    * Argmax via `min(struct(-count, label))` — one aggregation, no
    * window. */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       seeds: DataFrame, idCol: String, labelCol: String,
                       rounds: Int = 2,
                       maxLocalEdges: Long = 1L << 20): DataFrame = {
    require(rounds >= 1 && rounds <= 10, s"rounds must be in [1,10], got $rounds")
    val spark = edges.sparkSession
    import spark.implicits._
    val e = simple(edges, srcCol, dstCol).localCheckpoint(false)
    val seedL0 = seeds.select(col(idCol).cast("long").as("id"),
      col(labelCol).as("__seed"))
    // Small-graph fast path (optimization round 19, the pageRank/CC
    // cutover discipline): below an explicit edge bound — with a FREE
    // plan-stats pregate on the seed table so a 100 TB seed set never
    // pays a collect — run the same synchronous rounds on the driver.
    // Exactness: the majority argmax `min(struct(-count, label))`
    // compares labels in UTF8 BINARY order, which the driver mirrors
    // by comparing UTF-8 bytes unsigned (Java String.compareTo is
    // UTF-16 code-unit order — NOT the same above the BMP); counts are
    // integers; seed clamping and the null-seed coalesce are replayed
    // literally. String labels only; duplicate seed ids fall back to
    // the distributed loop (the join would multiply rows — semantics
    // the driver map cannot hold).
    val labelIsString = seedL0.schema("__seed").dataType ==
      org.apache.spark.sql.types.StringType
    if (labelIsString && Spread.smallByStats(seedL0, 64L << 20) &&
        e.count() <= maxLocalEdges) {
      val eL = e.as[(Long, Long)].collect()
      val seedRows = seedL0.collect().map(r =>
        (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
      val dupSeeds = seedRows.map(_._1).distinct.length != seedRows.length
      if (!dupSeeds) {
        val idx = new java.util.HashMap[Long, Integer]()
        val idBuf = scala.collection.mutable.ArrayBuffer.empty[Long]
        def ix(id: Long): Int = {
          val got = idx.get(id)
          if (got != null) got.intValue()
          else { val i = idBuf.length; idx.put(id, i); idBuf += id; i }
        }
        val aI = new Array[Int](eL.length)
        val bI = new Array[Int](eL.length)
        var k = 0
        while (k < eL.length) {
          aI(k) = ix(eL(k)._1); bI(k) = ix(eL(k)._2); k += 1
        }
        val n = idBuf.length
        val seedOf = new Array[String](n)
        seedRows.foreach { case (id, s) =>
          val got = idx.get(id)
          if (got != null) seedOf(got.intValue()) = s
        }
        val utf8 = java.nio.charset.StandardCharsets.UTF_8
        def utf8Less(x: String, y: String): Boolean =
          java.util.Arrays.compareUnsigned(
            x.getBytes(utf8), y.getBytes(utf8)) < 0
        var cur: Array[String] = seedOf.clone()
        for (_ <- 1 to rounds) {
          val counts = Array.fill(n)(
            null: java.util.HashMap[String, Long])
          def bump(id: Int, lbl: String): Unit = {
            if (counts(id) == null)
              counts(id) = new java.util.HashMap[String, Long]()
            counts(id).merge(lbl, 1L, (a, b) => a + b)
          }
          k = 0
          while (k < eL.length) {
            val a = aI(k); val b = bI(k)
            if (cur(b) != null) bump(a, cur(b))
            if (cur(a) != null) bump(b, cur(a))
            k += 1
          }
          val next = new Array[String](n)
          var i = 0
          while (i < n) {
            var best: String = null
            if (counts(i) != null) {
              var bc = 0L
              val it = counts(i).entrySet().iterator()
              while (it.hasNext) {
                val en = it.next()
                val c = en.getValue
                if (best == null || c > bc ||
                    (c == bc && utf8Less(en.getKey, best))) {
                  best = en.getKey; bc = c
                }
              }
            }
            next(i) =
              if (seedOf(i) != null) seedOf(i)
              else if (best != null) best
              else cur(i)
            i += 1
          }
          cur = next
        }
        return spark.createDataset((0 until n).map(i => (idBuf(i), cur(i))))
          .toDF("id", labelCol)
      }
    }
    val adj = e.select(col("a").as("id"), col("b").as("nb"))
      .unionAll(e.select(col("b").as("id"), col("a").as("nb")))
      .localCheckpoint(false)
    val nodes = adj.select(col("id")).distinct().localCheckpoint(false)
    val seedL = seeds.select(col(idCol).cast("long").as("id"),
      col(labelCol).as("__seed"))
    var cur = nodes.join(seedL, Seq("id"), "left")
      .select(col("id"), col("__seed").as("lbl"))
      .localCheckpoint(false)
    for (_ <- 1 to rounds) {
      val counts = adj
        .join(cur.filter(col("lbl").isNotNull)
          .select(col("id").as("nb"), col("lbl")), "nb")
        .groupBy(col("id"), col("lbl"))
        .agg(count(lit(1)).as("__c"))
      val best = counts
        .groupBy(col("id"))
        .agg(min(struct((-col("__c")).as("nc"), col("lbl"))).as("__m"))
        .select(col("id"), col("__m.lbl").as("__best"))
      cur = cur
        .join(seedL, Seq("id"), "left")
        .join(best, Seq("id"), "left")
        .select(col("id"),
          coalesce(col("__seed"), col("__best"), col("lbl")).as("lbl"))
        .localCheckpoint(false)
    }
    cur.select(col("id"), col("lbl").as(labelCol))
  }

  /** Newman modularity of a node partition: how much denser
    * communities are than a degree-preserving random rewiring —
    * `Q = Σ_c [ e_c/m − (d_c/2m)² ]` over communities c (e_c =
    * intra-community edges, d_c = degree sum, m = edges). The standard
    * quality score for near-dup cluster assignments and community
    * labels.
    *
    * Integral form on the 1e12 scale with documented per-community
    * flooring: `q_e12(c) = e_c·1e12 div m − d_c²·1e12 div (4m²)` —
    * decimal(38,0) keeps d_c²·1e12 exact for any realistic degree
    * mass. Returns per-community rows plus their sum is the partition
    * score (the caller aggregates, or reads `modularity_e12` off the
    * one-row rollup [[modularityTotal]]).
    *
    * Shape (100 TB): two membership equi-joins on the edge endpoints,
    * one grouped count (e_c), one degree aggregation joined to
    * membership (d_c) — all keyed shuffles, no windows. */
  def modularity(edges: DataFrame, srcCol: String, dstCol: String,
                 membership: DataFrame, idCol: String,
                 commCol: String): DataFrame = {
    val e = simple(edges, srcCol, dstCol).localCheckpoint(false)
    val m = e.count()
    require(m > 0, "graph has no edges")
    val mem = membership.select(col(idCol).cast("long").as("__id"),
      col(commCol).as("__c"))
    val intra = e
      .join(mem.select(col("__id").as("a"), col("__c").as("__ca")), "a")
      .join(mem.select(col("__id").as("b"), col("__c").as("__cb")), "b")
      .filter(col("__ca") === col("__cb"))
      .groupBy(col("__ca").as("community"))
      .agg(count(lit(1)).as("e_in"))
    val degSum = e.select(col("a").as("__id")).unionAll(e.select(col("b").as("__id")))
      .join(mem, "__id")
      .groupBy(col("__c").as("community"))
      .agg(count(lit(1)).as("d_sum"))
    degSum.join(intra, Seq("community"), "left")
      .select(col("community"), coalesce(col("e_in"), lit(0L)).as("e_in"),
        col("d_sum"),
        (expr(s"CAST(coalesce(e_in, 0) AS DECIMAL(38,0)) * 1000000000000 div $m")
          - expr(s"CAST(d_sum AS DECIMAL(38,0)) * CAST(d_sum AS DECIMAL(38,0))" +
            s" * 1000000000000 div (4 * CAST($m AS DECIMAL(38,0)) * $m)"))
          .cast("long").as("q_e12"))
  }

  /** One-row rollup of [[modularity]]: the partition's total Q. */
  def modularityTotal(perCommunity: DataFrame): DataFrame =
    perCommunity.agg(count(lit(1)).as("n_communities"),
      sum(col("e_in")).as("intra_edges"),
      sum(col("q_e12")).as("modularity_e12"))

  /** Degree assortativity: the Pearson correlation of endpoint degrees
    * over the (symmetrized) edge list — positive r = hubs link to hubs,
    * negative = hubs link to leaves (Newman 2002). Degrees are already
    * integers, so the five moment sums run in decimal(38,0) exactly
    * ([[Analytics.corrPairs]] discipline) and the double conversion is
    * the first inexact step on either engine. One degree aggregation +
    * two keyed joins + ONE moment aggregate. */
  def degreeAssortativity(edges: DataFrame, srcCol: String, dstCol: String,
                          outDigits: Int = 6): DataFrame = {
    val e = simple(edges, srcCol, dstCol).localCheckpoint(false)
    val deg = e.select(col("a").as("id")).unionAll(e.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    // both orientations: each undirected edge contributes (du,dv), (dv,du)
    val sym = e
      .join(deg.select(col("id").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("deg").as("db")), "b")
      .select(col("da").as("x"), col("db").as("y"))
    val both = sym.unionAll(sym.select(col("y").as("x"), col("x").as("y")))
    def d(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      c.cast("decimal(38,0)")
    both.agg(
      count(lit(1)).cast("decimal(38,0)").as("__n"),
      sum(d(col("x"))).as("__sx"), sum(d(col("y"))).as("__sy"),
      sum(d(col("x")) * d(col("x"))).as("__sxx"),
      sum(d(col("y")) * d(col("y"))).as("__syy"),
      sum(d(col("x")) * d(col("y"))).as("__sxy"))
      .select((col("__n") / 2).cast("long").as("n_edges"),
        round(expr("try_divide(" +
          "CAST(__n * __sxy - __sx * __sy AS DOUBLE), " +
          "sqrt(CAST(__n * __sxx - __sx * __sx AS DOUBLE)) * " +
          "sqrt(CAST(__n * __syy - __sy * __sy AS DOUBLE)))"), outDigits)
          .as("assortativity"))
  }
}
