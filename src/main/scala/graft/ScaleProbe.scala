package graft

import org.apache.spark.sql.functions._

/** Scale-study probe: time one parameterized operator invocation on an
  * arbitrary data directory (the SCALE.md harness for parameter-sweep
  * evidence the fixed query board can't express — e.g. SRP bits sized
  * to the corpus per the cosineNearDups scaladoc formula).
  *
  * Usage: runMain graft.ScaleProbe cosine <dir> <bits> <tables> <cap>
  *        runMain graft.ScaleProbe simhash <dir> <maxHamming>
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(Some(s"local[$cpus]"), Some(cpus.toInt))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val n = args(0) match {
      case "cosine" =>
        val e = spark.read.parquet(s"${args(1)}/embeddings.parquet")
        val dup = e.select((col("vec_id") + 100000).as("vec_id"),
          transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
        val all = e.select(col("vec_id"), col("embedding")).unionAll(dup)
        ops.Dedup.cosineNearDups(all, "vec_id", "embedding",
          threshold = 0.95, tables = args(3).toInt, bits = args(2).toInt,
          maxBucketSize = args(4).toInt).count()
      case "simhash" =>
        val d = spark.read.parquet(s"${args(1)}/documents.parquet")
        ops.Dedup.simhashPairs(d, "doc_id", "text",
          maxHamming = args(2).toInt).count()
      case "minhash" =>
        val d = spark.read.parquet(s"${args(1)}/documents.parquet")
        ops.Dedup.minhashLsh(d, "doc_id", "text",
          bands = 4, rowsPerBand = 3, threshold = args(2).toDouble,
          maxBucketSize = args(3).toInt).count()
      case "bpe" =>
        // distributed-vs-driver BPE route timing: args = dir, numMerges,
        // maxVocabWords (route threshold; 1 forces the distributed rounds)
        val d = spark.read.parquet(s"${args(1)}/documents.parquet")
        ops.Tokenizer.trainBpe(d, "text", numMerges = args(2).toInt,
          maxVocabWords = args(3).toInt).count()
      case "noop" =>
        // fixed harness overhead: parquet scan + count only
        spark.read.parquet(s"${args(1)}/documents.parquet").count()
      case "simhashonly" =>
        // isolates the per-word md5 signature kernel from the pair join
        val d = spark.read.parquet(s"${args(1)}/documents.parquet")
        ops.Dedup.simhash(d, "doc_id", "text").count()
      case "simhashstats" =>
        // band-bucket size distribution + Σsz² (intrinsic candidate mass)
        val d = spark.read.parquet(s"${args(1)}/documents.parquet")
        val sh = ops.Dedup.simhash(d, "doc_id", "text")
        val bandBuckets = array((0 until 4).map { b =>
          shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL)
        }: _*)
        val sizes = sh.select(posexplode(bandBuckets).as(Seq("band", "bucket")))
          .groupBy("band", "bucket").count()
        sizes.agg(count(lit(1)), max("count"), sum(col("count") * col("count")),
            sum(when(col("count") > 64, col("count") * col("count"))))
          .show(false)
        sizes.orderBy(col("count").desc).show(20, false)
        sizes.count()
      case "cvauc" =>
        // q_cv_auc's exact fit with a swappable measure: times the
        // shared-IRLS chassis with (auc) vs without (deviance) the rank
        // chain, isolating where the wall-clock goes
        val li = spark.read.parquet(s"${args(1)}/lineitem.parquet")
          .withColumn("is_r", (col("l_returnflag") === "R").cast("int"))
        val lambdas = Array(0.01, 0.003, 0.001, 5e-4, 2e-4, 5e-5)
        val fold = pmod(graft.ops.Sampling.hashBucket(
          col("l_orderkey") * 100 + col("l_linenumber")), lit(5))
        val cv = ml.CvSgdNet.fit(li, Seq("l_quantity"), Seq("is_r"),
          ml.SgdNetParams(family = "binomial", alpha = 1.0,
            lambda = lambdas, thresh = 1e-5),
          nfolds = 5, measure = args(2), foldCol = fold)
        println(s"probe_npasses=${cv.best.fit.npasses}")
        cv.curveDF(spark).count()
      case "screenwls" =>
        // round 17: strong-rule screen on the per-Newton IRLS WLS
        // subproblem — driver-solve wall over a 50-lambda lasso path at
        // large p, screened (CoordinateDescent.solveScreened) vs
        // unscreened (solve), solutions verified identical. args =
        // screenwls <p> <n> (data dir unused; pure driver math)
        val p = args(1).toInt
        val nObs = args(2).toInt
        val rnd = new scala.util.Random(7)
        val a = Array.ofDim[Double](p, p)
        val c = new Array[Double](p)
        val xw = new Array[Double](p)
        var zw = 0.0
        val ww = 1.0
        val trueB = Array.tabulate(p)(j =>
          if (j % 37 == 0) rnd.nextGaussian() * 2.0 else 0.0)
        for (_ <- 0 until nObs) {
          val x = Array.fill(p)(rnd.nextGaussian())
          val w = 0.05 + rnd.nextDouble() * 0.2
          var z = rnd.nextGaussian() * 0.5
          var j = 0
          while (j < p) { z += x(j) * trueB(j); j += 1 }
          zw += w * z / nObs
          j = 0
          while (j < p) {
            c(j) += w * x(j) * z / nObs
            xw(j) += w * x(j) / nObs
            var m = 0
            while (m <= j) {
              a(m)(j) += w * x(m) * x(j) / nObs
              if (m != j) a(j)(m) = a(m)(j)
              m += 1
            }
            j += 1
          }
        }
        val lamMax = c.map(math.abs).max
        val lams = Array.tabulate(50)(i => lamMax * math.pow(0.01, i / 49.0))
        def runPath(screened: Boolean): (Array[Array[Double]], Double) = {
          var warm = new Array[Double](p)
          val out = Array.ofDim[Double](lams.length, p)
          val t = System.nanoTime()
          for (li <- lams.indices) {
            val r =
              if (screened && li > 0)
                ml.CoordinateDescent.solveScreened(a, c, xw, zw, ww,
                  lams(li), lams(li - 1), 1.0, intercept = true, warm,
                  thresh = 1e-9, maxIter = 100000)
              else ml.CoordinateDescent.solve(a, c, xw, zw, ww, lams(li),
                1.0, intercept = true, warm, thresh = 1e-9,
                maxIter = 100000)
            warm = r.beta
            System.arraycopy(r.beta, 0, out(li), 0, p)
          }
          (out, (System.nanoTime() - t) / 1e9)
        }
        runPath(screened = false) // JIT warm
        val (u, tu) = runPath(screened = false)
        val (s, ts) = runPath(screened = true)
        var md = 0.0
        var df = 0
        for (li <- lams.indices; j <- 0 until p)
          md = math.max(md, math.abs(u(li)(j) - s(li)(j)))
        df = u.last.count(_ != 0.0)
        println(f"probe_screenwls p=$p n=$nObs df_last=$df " +
          f"unscreened=$tu%.2f screened=$ts%.2f maxdiff=$md%.2e")
        lams.length.toLong
      case "largep" =>
        // round 18: screened-Gram large-p route (LargeP.fitGaussian)
        // vs the full-Gram path at growing p. args = largep <n> <p>
        // <nlambda> <mode: both|big>. Deterministic per-row features
        // (seeded by id), signal on 4 coordinates. "both" times the
        // two routes and checks coefficient agreement; "big" runs the
        // screened route alone (the full route's maxGramP regime).
        val nRows = args(1).toLong
        val p = args(2).toInt
        val nl = args(3).toInt
        val mode = args(4)
        val schema = org.apache.spark.sql.types.StructType(
          (0 until p).map(j => org.apache.spark.sql.types.StructField(
            s"x$j", org.apache.spark.sql.types.DoubleType, false)) :+
            org.apache.spark.sql.types.StructField("y",
              org.apache.spark.sql.types.DoubleType, false))
        val rdd = spark.sparkContext.range(0L, nRows,
            numSlices = cpus.toInt).map { i =>
          val rnd = new scala.util.Random(i * 2654435761L + 12345)
          val x = Array.fill(p)(rnd.nextGaussian())
          val y = 1.5 * x(0) - 0.9 * x(7) + 0.6 * x(19) - 0.3 * x(33) +
            rnd.nextGaussian() * 0.5
          org.apache.spark.sql.Row.fromSeq(x.toSeq :+ y)
        }
        val df = spark.createDataFrame(rdd, schema)
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        df.count() // materialize once so neither route pays generation
        val names = (0 until p).map(j => s"x$j")
        // optional 6th arg: lambda.min.ratio — the sparse-path regime
        // (the screened route's design point) vs the dense default
        val minRatio = if (args.length > 5) args(5).toDouble else Double.NaN
        val prm = ml.SgdNetParams(alpha = 1.0, nlambda = nl,
          lambdaMinRatio = minRatio, thresh = 1e-7, maxit = 100000)
        if (mode == "both") {
          def t1[T](f: => T): (T, Double) = {
            val t = System.nanoTime()
            val r = f; (r, (System.nanoTime() - t) / 1e9)
          }
          val (_, twarm) = t1(ml.SgdNet.fit(df, names, "y", prm))
          val (full, tf) = t1(ml.SgdNet.fit(df, names, "y", prm))
          val (big, tb) = t1(ml.LargeP.fitGaussian(df, names, "y", prm))
          var md = 0.0
          for (l <- full.lambda.indices; j <- 0 until p)
            md = math.max(md,
              math.abs(full.beta(l)(0)(j) - big.beta(l)(0)(j)))
          val dfLast = big.beta.last.head.count(_ != 0.0)
          println(f"probe_largep p=$p n=$nRows L=${full.lambda.length} " +
            f"df_last=$dfLast full=$tf%.2f (warm $twarm%.2f) " +
            f"screened=$tb%.2f passes=${big.npasses} maxdiff=$md%.2e")
          full.lambda.length.toLong
        } else {
          val t = System.nanoTime()
          val big = ml.LargeP.fitGaussian(df, names, "y", prm)
          val tb = (System.nanoTime() - t) / 1e9
          val dfLast = big.beta.last.head.count(_ != 0.0)
          println(f"probe_largep p=$p n=$nRows L=${big.lambda.length} " +
            f"df_last=$dfLast screened=$tb%.2f passes=${big.npasses}")
          big.lambda.length.toLong
        }
      case "largepsparse" =>
        // round 18: screened-Gram sparse route (LargeP
        // .fitSparseGaussian) at hashed-feature dims. args =
        // largepsparse <n> <dim> <nnzPerRow> <nlambda> <mode: both|big>
        // [minRatio]. Signal on 4 fixed hashed slots.
        val nRows = args(1).toLong
        val dimP = args(2).toInt
        val nnz = args(3).toInt
        val nl = args(4).toInt
        val mode = args(5)
        import spark.implicits._
        val sig = Array(17 % dimP, 4099 % dimP, 65537 % dimP,
          262139 % dimP).distinct
        val ds = spark.sparkContext.range(0L, nRows,
            numSlices = cpus.toInt).map { i =>
          val rnd = new scala.util.Random(i * 2654435761L + 999)
          val ix0 = (Array.fill(nnz)(rnd.nextInt(dimP)) ++
            sig.filter(_ => rnd.nextDouble() < 0.6)).distinct.sorted
          val vs0 = ix0.map(_ => rnd.nextGaussian())
          val y = ix0.zip(vs0).collect {
            case (j, v) if j == sig(0) => 1.5 * v
            case (j, v) if sig.length > 1 && j == sig(1) => -0.9 * v
            case (j, v) if sig.length > 2 && j == sig(2) => 0.6 * v
            case (j, v) if sig.length > 3 && j == sig(3) => -0.4 * v
          }.sum + rnd.nextGaussian() * 0.5
          (ix0, vs0, y)
        }.toDF("sidx", "svals", "y")
        ds.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        ds.count()
        val minRatio = if (args.length > 6) args(6).toDouble else Double.NaN
        val prm = ml.SgdNetParams(alpha = 1.0, nlambda = nl,
          lambdaMinRatio = minRatio, thresh = 1e-7, maxit = 100000)
        def t1s[T](f: => T): (T, Double) = {
          val t = System.nanoTime()
          val r = f; (r, (System.nanoTime() - t) / 1e9)
        }
        if (mode == "both") {
          val (_, twarm) = t1s(ml.SgdNet.fitSparse(ds, "sidx", "svals",
            dimP, "y", prm))
          val (full, tf) = t1s(ml.SgdNet.fitSparse(ds, "sidx", "svals",
            dimP, "y", prm))
          val (big, tb) = t1s(ml.LargeP.fitSparseGaussian(ds, "sidx",
            "svals", dimP, "y", prm))
          var md = 0.0
          for (l <- full.lambda.indices; j <- 0 until dimP)
            md = math.max(md,
              math.abs(full.beta(l)(0)(j) - big.beta(l)(0)(j)))
          val dfLast = big.beta.last.head.count(_ != 0.0)
          println(f"probe_largepsparse dim=$dimP n=$nRows nnz=$nnz " +
            f"L=${full.lambda.length} df_last=$dfLast full=$tf%.2f " +
            f"(warm $twarm%.2f) screened=$tb%.2f passes=${big.npasses} " +
            f"maxdiff=$md%.2e")
          full.lambda.length.toLong
        } else {
          val (big, tb) = t1s(ml.LargeP.fitSparseGaussian(ds, "sidx",
            "svals", dimP, "y", prm))
          val dfLast = big.beta.last.head.count(_ != 0.0)
          println(f"probe_largepsparse dim=$dimP n=$nRows nnz=$nnz " +
            f"L=${big.lambda.length} df_last=$dfLast screened=$tb%.2f " +
            f"passes=${big.npasses}")
          big.lambda.length.toLong
        }
      case "largepsparseirls" =>
        // round 18: sparse screened IRLS (LargeP.fitSparseBinomial)
        // at hashed-feature dims — the quality-classifier regime.
        // args = largepsparseirls <n> <dim> <nnzPerRow> <nlambda>
        // <mode: both|big> [minRatio]
        val nRows = args(1).toLong
        val dimP = args(2).toInt
        val nnz = args(3).toInt
        val nl = args(4).toInt
        val mode = args(5)
        import spark.implicits._
        val sig = Array(17 % dimP, 4099 % dimP, 65537 % dimP,
          262139 % dimP).distinct
        val ds = spark.sparkContext.range(0L, nRows,
            numSlices = cpus.toInt).map { i =>
          val rnd = new scala.util.Random(i * 2654435761L + 4242)
          val ix0 = (Array.fill(nnz)(rnd.nextInt(dimP)) ++
            sig.filter(_ => rnd.nextDouble() < 0.6)).distinct.sorted
          val vs0 = ix0.map(_ => rnd.nextGaussian())
          val eta = ix0.zip(vs0).collect {
            case (j, v) if j == sig(0) => 1.5 * v
            case (j, v) if sig.length > 1 && j == sig(1) => -0.9 * v
            case (j, v) if sig.length > 2 && j == sig(2) => 0.6 * v
            case (j, v) if sig.length > 3 && j == sig(3) => -0.4 * v
          }.sum
          val y = if (rnd.nextDouble() < 1.0 / (1.0 + math.exp(-eta))) 1.0
            else 0.0
          (ix0, vs0, y)
        }.toDF("sidx", "svals", "y")
        ds.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        ds.count()
        val minRatio = if (args.length > 6) args(6).toDouble else Double.NaN
        val prm = ml.SgdNetParams(family = "binomial", alpha = 1.0,
          nlambda = nl, lambdaMinRatio = minRatio, thresh = 1e-7,
          maxit = 100000)
        def t1i[T](f: => T): (T, Double) = {
          val t = System.nanoTime()
          val r = f; (r, (System.nanoTime() - t) / 1e9)
        }
        if (mode == "both") {
          val (_, twarm) = t1i(ml.SgdNet.fitSparse(ds, "sidx", "svals",
            dimP, "y", prm))
          val (full, tf) = t1i(ml.SgdNet.fitSparse(ds, "sidx", "svals",
            dimP, "y", prm))
          val (big, tb) = t1i(ml.LargeP.fitSparseBinomial(ds, "sidx",
            "svals", dimP, "y", prm))
          var md = 0.0
          for (l <- full.lambda.indices; j <- 0 until dimP)
            md = math.max(md,
              math.abs(full.beta(l)(0)(j) - big.beta(l)(0)(j)))
          val dfLast = big.beta.last.head.count(_ != 0.0)
          println(f"probe_largepsparseirls dim=$dimP n=$nRows nnz=$nnz " +
            f"L=${full.lambda.length} df_last=$dfLast full=$tf%.2f " +
            f"(warm $twarm%.2f) screened=$tb%.2f passes=${big.npasses} " +
            f"maxdiff=$md%.2e")
          full.lambda.length.toLong
        } else {
          val (big, tb) = t1i(ml.LargeP.fitSparseBinomial(ds, "sidx",
            "svals", dimP, "y", prm))
          val dfLast = big.beta.last.head.count(_ != 0.0)
          println(f"probe_largepsparseirls dim=$dimP n=$nRows nnz=$nnz " +
            f"L=${big.lambda.length} df_last=$dfLast screened=$tb%.2f " +
            f"passes=${big.npasses}")
          big.lambda.length.toLong
        }
      case "largepcv" =>
        // round 18: screened-Gram batched CV (LargeP.cvGaussian) vs
        // the per-fold-Gram moment CV (CvSgdNet.fit). args =
        // largepcv <n> <p> <nlambda> <nfolds> <mode: both|big> [minRatio]
        val nRows = args(1).toLong
        val p = args(2).toInt
        val nl = args(3).toInt
        val nf = args(4).toInt
        val mode = args(5)
        val schema = org.apache.spark.sql.types.StructType(
          (0 until p).map(j => org.apache.spark.sql.types.StructField(
            s"x$j", org.apache.spark.sql.types.DoubleType, false)) :+
            org.apache.spark.sql.types.StructField("y",
              org.apache.spark.sql.types.DoubleType, false))
        val rdd = spark.sparkContext.range(0L, nRows,
            numSlices = cpus.toInt).map { i =>
          val rnd = new scala.util.Random(i * 2654435761L + 777)
          val x = Array.fill(p)(rnd.nextGaussian())
          val y = 1.5 * x(0) - 0.9 * x(7) + 0.6 * x(19) - 0.3 * x(33) +
            rnd.nextGaussian() * 0.5
          org.apache.spark.sql.Row.fromSeq(x.toSeq :+ y)
        }
        val df = spark.createDataFrame(rdd, schema)
        if (mode == "both") {
          df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          df.count()
        }
        val names = (0 until p).map(j => s"x$j")
        val minRatio = if (args.length > 6) args(6).toDouble else Double.NaN
        val prm = ml.SgdNetParams(alpha = 1.0, nlambda = nl,
          lambdaMinRatio = minRatio, thresh = 1e-7, maxit = 100000)
        def t1c[T](f: => T): (T, Double) = {
          val t = System.nanoTime()
          val r = f; (r, (System.nanoTime() - t) / 1e9)
        }
        if (mode == "both") {
          val (_, twarm) = t1c(ml.CvSgdNet.fit(df, names, Seq("y"), prm,
            nfolds = nf))
          val (ref, tf) = t1c(ml.CvSgdNet.fit(df, names, Seq("y"), prm,
            nfolds = nf))
          val (big, tb) = t1c(ml.LargeP.cvGaussian(df, names, "y", prm,
            nfolds = nf))
          val pr = ref.best; val pb = big.best
          var md = 0.0
          for (l <- pr.lambda.indices)
            md = math.max(md, math.abs(pr.cvm(l) - pb.cvm(l)) /
              math.max(1.0, math.abs(pr.cvm(l))))
          println(f"probe_largepcv p=$p n=$nRows nfolds=$nf " +
            f"L=${pr.lambda.length} full=$tf%.2f (warm $twarm%.2f) " +
            f"screened=$tb%.2f passes=${pb.fit.npasses} " +
            f"cvm_reldiff=$md%.2e lmin_eq=${pr.lambdaMin == pb.lambdaMin}")
          pr.lambda.length.toLong
        } else {
          val (big, tb) = t1c(ml.LargeP.cvGaussian(df, names, "y", prm,
            nfolds = nf))
          val pb = big.best
          val dfLast = pb.fit.beta.last.head.count(_ != 0.0)
          println(f"probe_largepcv p=$p n=$nRows nfolds=$nf " +
            f"L=${pb.lambda.length} df_last=$dfLast screened=$tb%.2f " +
            f"passes=${pb.fit.npasses}")
          pb.lambda.length.toLong
        }
      case "largepglm" =>
        // round 18: screened-Gram large-p IRLS route (LargeP
        // .fitBinomial) vs the full-Gram dense IRLS path. args =
        // largepglm <n> <p> <nlambda> <mode: both|big> [minRatio]
        val nRows = args(1).toLong
        val p = args(2).toInt
        val nl = args(3).toInt
        val mode = args(4)
        val schema = org.apache.spark.sql.types.StructType(
          (0 until p).map(j => org.apache.spark.sql.types.StructField(
            s"x$j", org.apache.spark.sql.types.DoubleType, false)) :+
            org.apache.spark.sql.types.StructField("y",
              org.apache.spark.sql.types.DoubleType, false))
        val rdd = spark.sparkContext.range(0L, nRows,
            numSlices = cpus.toInt).map { i =>
          val rnd = new scala.util.Random(i * 2654435761L + 54321)
          val x = Array.fill(p)(rnd.nextGaussian())
          val eta = 1.4 * x(0) - 0.9 * x(7) + 0.6 * x(19) - 0.4 * x(33)
          val y = if (rnd.nextDouble() < 1.0 / (1.0 + math.exp(-eta))) 1.0
            else 0.0
          org.apache.spark.sql.Row.fromSeq(x.toSeq :+ y)
        }
        val df = spark.createDataFrame(rdd, schema)
        if (mode == "both") {
          // columnar DataFrame caching allocates per-column builders —
          // prohibitive at p = 16k; the route persists its row RDD
          // internally, so only the two-route comparison caches here
          df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          df.count()
        }
        val names = (0 until p).map(j => s"x$j")
        val minRatio = if (args.length > 5) args(5).toDouble else Double.NaN
        val prm = ml.SgdNetParams(family = "binomial", alpha = 1.0,
          nlambda = nl, lambdaMinRatio = minRatio, thresh = 1e-7,
          maxit = 100000)
        def t1g[T](f: => T): (T, Double) = {
          val t = System.nanoTime()
          val r = f; (r, (System.nanoTime() - t) / 1e9)
        }
        if (mode == "both") {
          val (_, twarm) = t1g(ml.SgdNet.fit(df, names, "y", prm))
          val (full, tf) = t1g(ml.SgdNet.fit(df, names, "y", prm))
          val (big, tb) = t1g(ml.LargeP.fitBinomial(df, names, "y", prm))
          var md = 0.0
          for (l <- full.lambda.indices; j <- 0 until p)
            md = math.max(md,
              math.abs(full.beta(l)(0)(j) - big.beta(l)(0)(j)))
          val dfLast = big.beta.last.head.count(_ != 0.0)
          println(f"probe_largepglm p=$p n=$nRows L=${full.lambda.length} " +
            f"df_last=$dfLast full=$tf%.2f (warm $twarm%.2f) " +
            f"screened=$tb%.2f passes=${big.npasses} maxdiff=$md%.2e")
          full.lambda.length.toLong
        } else {
          val (big, tb) = t1g(ml.LargeP.fitBinomial(df, names, "y", prm))
          val dfLast = big.beta.last.head.count(_ != 0.0)
          println(f"probe_largepglm p=$p n=$nRows L=${big.lambda.length} " +
            f"df_last=$dfLast screened=$tb%.2f passes=${big.npasses}")
          big.lambda.length.toLong
        }
      case "largepglmcv" =>
        // round 18: batched screened-Gram GLM CV (LargeP.cvBinomial)
        // vs the shared-pass weighted-Gram CV (CvSgdNet.fit). args =
        // largepglmcv <n> <p> <nlambda> <nfolds> <mode: both|big>
        // [minRatio]
        val nRows = args(1).toLong
        val p = args(2).toInt
        val nl = args(3).toInt
        val nf = args(4).toInt
        val mode = args(5)
        val schema = org.apache.spark.sql.types.StructType(
          (0 until p).map(j => org.apache.spark.sql.types.StructField(
            s"x$j", org.apache.spark.sql.types.DoubleType, false)) :+
            org.apache.spark.sql.types.StructField("y",
              org.apache.spark.sql.types.DoubleType, false))
        val rdd = spark.sparkContext.range(0L, nRows,
            numSlices = cpus.toInt).map { i =>
          val rnd = new scala.util.Random(i * 2654435761L + 54321)
          val x = Array.fill(p)(rnd.nextGaussian())
          val eta = 1.4 * x(0) - 0.9 * x(7) + 0.6 * x(19) - 0.4 * x(33)
          val y = if (rnd.nextDouble() < 1.0 / (1.0 + math.exp(-eta))) 1.0
            else 0.0
          org.apache.spark.sql.Row.fromSeq(x.toSeq :+ y)
        }
        val df = spark.createDataFrame(rdd, schema)
        if (mode == "both") {
          df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          df.count()
        }
        val names = (0 until p).map(j => s"x$j")
        val minRatio = if (args.length > 6) args(6).toDouble else Double.NaN
        val prm = ml.SgdNetParams(family = "binomial", alpha = 1.0,
          nlambda = nl, lambdaMinRatio = minRatio, thresh = 1e-7,
          maxit = 100000)
        def t1gc[T](f: => T): (T, Double) = {
          val t = System.nanoTime()
          val r = f; (r, (System.nanoTime() - t) / 1e9)
        }
        if (mode == "both") {
          val (_, twarm) = t1gc(ml.CvSgdNet.fit(df, names, Seq("y"), prm,
            nfolds = nf))
          val (ref, tf) = t1gc(ml.CvSgdNet.fit(df, names, Seq("y"), prm,
            nfolds = nf))
          val (big, tb) = t1gc(ml.LargeP.cvBinomial(df, names, "y", prm,
            nfolds = nf))
          val pr = ref.best; val pb = big.best
          var md = 0.0
          for (l <- pr.lambda.indices)
            md = math.max(md, math.abs(pr.cvm(l) - pb.cvm(l)) /
              math.max(1.0, math.abs(pr.cvm(l))))
          println(f"probe_largepglmcv p=$p n=$nRows nfolds=$nf " +
            f"L=${pr.lambda.length} full=$tf%.2f (warm $twarm%.2f) " +
            f"screened=$tb%.2f passes=${pb.fit.npasses} " +
            f"cvm_reldiff=$md%.2e lmin_eq=${pr.lambdaMin == pb.lambdaMin}")
          pr.lambda.length.toLong
        } else {
          val (big, tb) = t1gc(ml.LargeP.cvBinomial(df, names, "y", prm,
            nfolds = nf))
          val pb = big.best
          val dfLast = pb.fit.beta.last.head.count(_ != 0.0)
          println(f"probe_largepglmcv p=$p n=$nRows nfolds=$nf " +
            f"L=${pb.lambda.length} df_last=$dfLast screened=$tb%.2f " +
            f"passes=${pb.fit.npasses}")
          pb.lambda.length.toLong
        }
      case "largepsparsecv" =>
        // round 18: sparse screened CV (LargeP.cvSparseGaussian) vs
        // the per-fold sparse-Gram CV (CvSgdNet.fitSparse). args =
        // largepsparsecv <n> <dim> <nnz> <nlambda> <nfolds>
        // <mode: both|big> [minRatio]
        val nRows = args(1).toLong
        val dim = args(2).toInt
        val nnz = args(3).toInt
        val nl = args(4).toInt
        val nf = args(5).toInt
        val mode = args(6)
        import spark.implicits._
        val ds = spark.sparkContext.range(0L, nRows,
            numSlices = cpus.toInt).map { i =>
          val rnd = new scala.util.Random(i * 2654435761L + 99)
          // nnz random slots + 4 fixed signal slots (0, 7, 19, 33)
          val sig = Array(0, 7, 19, 33)
          val rest = Array.fill(nnz)(4 + rnd.nextInt(dim - 4)).distinct
            .filterNot(sig.contains)
          val idx = (sig ++ rest).sorted
          val vals = idx.map(_ => rnd.nextGaussian())
          val pos = idx.zipWithIndex.toMap
          val y = 1.5 * vals(pos(0)) - 0.9 * vals(pos(7)) +
            0.6 * vals(pos(19)) - 0.3 * vals(pos(33)) +
            rnd.nextGaussian() * 0.5
          (i, idx, vals, y)
        }.toDF("rid", "sidx", "svals", "y")
        if (mode == "both") {
          ds.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          ds.count()
        }
        val foldC = org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.col("rid") * 2654435761L,
          org.apache.spark.sql.functions.lit(nf))
        val minRatio = if (args.length > 7) args(7).toDouble else Double.NaN
        val prm = ml.SgdNetParams(alpha = 1.0, nlambda = nl,
          lambdaMinRatio = minRatio, thresh = 1e-7, maxit = 100000)
        def t1sc[T](f: => T): (T, Double) = {
          val t = System.nanoTime()
          val r = f; (r, (System.nanoTime() - t) / 1e9)
        }
        if (mode == "both") {
          val (_, twarm) = t1sc(ml.CvSgdNet.fitSparse(ds, "sidx", "svals",
            dim, "y", prm, nfolds = nf, foldCol = foldC))
          val (ref, tf) = t1sc(ml.CvSgdNet.fitSparse(ds, "sidx", "svals",
            dim, "y", prm, nfolds = nf, foldCol = foldC))
          val (big, tb) = t1sc(ml.LargeP.cvSparseGaussian(ds, "sidx",
            "svals", dim, "y", prm, nfolds = nf, foldCol = foldC))
          val pr = ref.best; val pb = big.best
          var md = 0.0
          for (l <- pr.lambda.indices)
            md = math.max(md, math.abs(pr.cvm(l) - pb.cvm(l)) /
              math.max(1.0, math.abs(pr.cvm(l))))
          println(f"probe_largepsparsecv dim=$dim n=$nRows nnz=$nnz " +
            f"nfolds=$nf L=${pr.lambda.length} full=$tf%.2f " +
            f"(warm $twarm%.2f) screened=$tb%.2f " +
            f"passes=${pb.fit.npasses} cvm_reldiff=$md%.2e " +
            f"lmin_eq=${pr.lambdaMin == pb.lambdaMin}")
          pr.lambda.length.toLong
        } else {
          val (big, tb) = t1sc(ml.LargeP.cvSparseGaussian(ds, "sidx",
            "svals", dim, "y", prm, nfolds = nf, foldCol = foldC))
          val pb = big.best
          val dfLast = pb.fit.beta.last.head.count(_ != 0.0)
          println(f"probe_largepsparsecv dim=$dim n=$nRows nnz=$nnz " +
            f"nfolds=$nf L=${pb.lambda.length} df_last=$dfLast " +
            f"screened=$tb%.2f passes=${pb.fit.npasses}")
          pb.lambda.length.toLong
        }
      case "sparseirls" =>
        // round 18: strong-rule screen on the SPARSE GLM per-Newton
        // WLS solves — screened vs unscreened wall through the REAL
        // fitSparse chassis (the screenGlm seam), solutions compared.
        // args = sparseirls <n> <p> <nnzPerRow> <nlambda>
        val nRows = args(1).toInt
        val p = args(2).toInt
        val nnz = args(3).toInt
        val nl = args(4).toInt
        import spark.implicits._
        val rows = (0 until nRows).map { i =>
          val rnd = new scala.util.Random(i * 2654435761L + 7)
          val idx = (Seq(0, 7, 19) ++ Seq.fill(nnz)(rnd.nextInt(p)))
            .distinct.sorted
          val vals = idx.map(_ => rnd.nextGaussian())
          val x = idx.zip(vals).toMap
          val eta = 1.4 * x(0) - 0.9 * x(7) + 0.6 * x(19) - 0.2
          val y = if (rnd.nextDouble() < 1.0 / (1.0 + math.exp(-eta)))
            1.0 else 0.0
          (idx, vals, y)
        }
        val df = rows.toDF("sidx", "svals", "y")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        df.count()
        // optional 6th arg: lambda.min.ratio (sparse-path regime — the
        // screen's design point; the dense default gates it off)
        val mr = if (args.length > 5) args(5).toDouble else Double.NaN
        val prm = ml.SgdNetParams(family = "binomial", alpha = 1.0,
          nlambda = nl, lambdaMinRatio = mr, thresh = 1e-7, maxit = 100000)
        def fitOnce(): (ml.SgdNetModel, Double) = {
          val t = System.nanoTime()
          val m = ml.SgdNet.fitSparse(df, "sidx", "svals", p, "y", prm)
          (m, (System.nanoTime() - t) / 1e9)
        }
        fitOnce() // JIT warm
        val (mOn, tOn) = fitOnce()
        ml.SgdNet.screenGlm = false
        val (mOff, tOff) =
          try fitOnce() finally ml.SgdNet.screenGlm = true
        var md = 0.0
        for (l <- mOn.lambda.indices; j <- 0 until p)
          md = math.max(md,
            math.abs(mOn.beta(l)(0)(j) - mOff.beta(l)(0)(j)))
        val dfLast = mOn.beta.last.head.count(_ != 0.0)
        println(f"probe_sparseirls p=$p n=$nRows L=${mOn.lambda.length} " +
          f"df_last=$dfLast screened=$tOn%.2f unscreened=$tOff%.2f " +
          f"maxdiff=$md%.2e")
        mOn.lambda.length.toLong
      case "dfmaxroute" =>
        // round 17: true dfmax early stopping on a SECONDARY route
        // (weighted binomial IRLS) — full path vs dfmax-truncated,
        // npasses is the cluster treeAggregate count. args =
        // dfmaxroute <dir> <dfmax>
        val li = spark.read.parquet(s"${args(1)}/lineitem.parquet")
          .withColumn("is_r", (col("l_returnflag") === "R").cast("int"))
          .withColumn("w", lit(1.0) + (col("l_quantity") > 25).cast("double"))
        val prm = ml.SgdNetParams(family = "binomial", alpha = 1.0,
          nlambda = 50, thresh = 1e-7)
        def time(p2: ml.SgdNetParams): (Double, Int, Int) = {
          val t = System.nanoTime()
          val m = ml.SgdNet.fitWeighted(li,
            Seq("l_quantity", "l_discount", "l_tax"), "is_r", "w", p2)
          ((System.nanoTime() - t) / 1e9, m.npasses, m.nLambda)
        }
        time(prm) // JIT warm
        val (tf, pf2, lf) = time(prm)
        val (tt, pt, lt) = time(prm.copy(dfmax = args(2).toInt))
        println(f"probe_dfmaxroute full=$tf%.2f/${pf2}passes/${lf}L " +
          f"truncated=$tt%.2f/${pt}passes/${lt}L")
        lt.toLong
      case other => sys.error(s"unknown probe: $other")
    }
    println(f"probe_rows=$n probe_sec=${(System.nanoTime() - t0) / 1e9}%.3f")
    spark.stop()
  }
}
