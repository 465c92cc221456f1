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
      case other => sys.error(s"unknown probe: $other")
    }
    println(f"probe_rows=$n probe_sec=${(System.nanoTime() - t0) / 1e9}%.3f")
    spark.stop()
  }
}
