package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress data generator: emits the same ten-table schema as the
  * driver's testdata at an arbitrary scale factor, fully DETERMINISTIC
  * (every column is a pure function of the row id via xxhash64 — no
  * rand(), no driver state, identical output at any parallelism) and
  * generated distributed (spark.range, narrow transforms, direct
  * parquet write — no collect anywhere, so the generator itself scales
  * to any sf a cluster can hold).
  *
  * Purpose: the correctness board runs at sf0.01 and the bench at
  * sf0.1; this exists to validate the 100 TB design claims empirically
  * at 10x+ (SCALE.md). Distribution shapes mirror the driver data where
  * operators care: documents carry planted exact-duplicate and
  * near-duplicate runs (1 exact + 1 near per 50 docs) so the dedup
  * chain has real work; embeddings are 10 separable label clusters with
  * per-id noise so ANN recall is meaningful; events keep the 30-day
  * span with 10x density (scale-up = more traffic, not a longer
  * window).
  *
  * Usage: runMain graft.GenScale <outDir> <sf>   (sf=1 → 6M lineitem,
  * 50k docs, 50k embeddings).
  */
object GenScale {

  private def h(c: Column, salt: Int): Column =
    pmod(xxhash64(c, lit(salt)), lit(1000000007L))

  private def hmod(c: Column, salt: Int, m: Long): Column =
    pmod(xxhash64(c, lit(salt)), lit(m))

  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "scaledata/sf1"
    val sf = if (args.length > 1) args(1).toDouble else 1.0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(Some(s"local[$cpus]"), Some(cpus.toInt))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    write(spark, outDir, sf)
    spark.stop()
  }

  def write(spark: SparkSession, outDir: String, sf: Double): Unit = {
    val nCust = math.max(1, (150000 * sf).toLong)
    val nSupp = math.max(1, (10000 * sf).toLong)
    val nPart = math.max(1, (200000 * sf).toLong)
    val nOrders = math.max(1, (1500000 * sf).toLong)
    val nLine = nOrders * 4
    val nEvents = math.max(1, (1000000 * sf).toLong)
    val nDocs = math.max(1, (50000 * sf).toLong)
    val nEmb = math.max(1, (50000 * sf).toLong)

    def save(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"wrote $name")
    }

    val regions = Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
    save(spark.range(5).select(col("id").cast("int").as("r_regionkey"),
      element_at(array(regions.map(lit): _*),
        col("id").cast("int") + 1).as("r_name")), "region")

    save(spark.range(25).select(col("id").cast("int").as("n_nationkey"),
      concat(lit("nation_"), col("id")).as("n_name"),
      pmod(col("id"), lit(5)).cast("int").as("n_regionkey")), "nation")

    val segs = array(Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
      "MACHINERY").map(lit): _*)
    save(spark.range(nCust).select(col("id").as("c_custkey"),
      concat(lit("Customer#"), col("id")).as("c_name"),
      hmod(col("id"), 1, 25).cast("int").as("c_nationkey"),
      ((hmod(col("id"), 2, 1100000) - lit(100000)) / 100.0).as("c_acctbal"),
      element_at(segs, hmod(col("id"), 3, 5).cast("int") + 1)
        .as("c_mktsegment")), "customer")

    save(spark.range(nSupp).select(col("id").as("s_suppkey"),
      concat(lit("Supplier#"), col("id")).as("s_name"),
      hmod(col("id"), 4, 25).cast("int").as("s_nationkey"),
      ((hmod(col("id"), 5, 1100000) - lit(100000)) / 100.0).as("s_acctbal")),
      "supplier")

    val pWords = array(Seq("almond", "antique", "azure", "blush", "chiffon",
      "cornflower", "forest", "ghost", "honeydew", "ivory", "lavender",
      "linen", "metallic", "midnight", "navy", "olive", "plum", "powder",
      "rose", "saddle").map(lit): _*)
    val pTypes = array(Seq("STANDARD ANODIZED", "SMALL PLATED",
      "MEDIUM BURNISHED", "LARGE BRUSHED", "ECONOMY POLISHED",
      "PROMO ANODIZED").map(lit): _*)
    save(spark.range(nPart).select(col("id").as("p_partkey"),
      concat_ws(" ", element_at(pWords, hmod(col("id"), 6, 20).cast("int") + 1),
        element_at(pWords, hmod(col("id"), 7, 20).cast("int") + 1),
        element_at(pWords, hmod(col("id"), 8, 20).cast("int") + 1))
        .as("p_name"),
      concat(lit("Brand#"), hmod(col("id"), 9, 5) + 1,
        hmod(col("id"), 10, 5) + 1).as("p_brand"),
      concat_ws(" ", element_at(pTypes, hmod(col("id"), 11, 6).cast("int") + 1),
        element_at(array(lit("TIN"), lit("NICKEL"), lit("BRASS"),
          lit("STEEL"), lit("COPPER")), hmod(col("id"), 12, 5).cast("int") + 1))
        .as("p_type"),
      (hmod(col("id"), 13, 50) + 1).cast("int").as("p_size"),
      ((lit(90000) + hmod(col("id"), 14, 110000)) / 100.0)
        .as("p_retailprice")), "part")

    val prios = array(Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
      "4-NOT SPECIFIED", "5-LOW").map(lit): _*)
    val epoch95 = lit("1995-01-01").cast("date")
    save(spark.range(nOrders).select(col("id").as("o_orderkey"),
      hmod(col("id"), 15, nCust).as("o_custkey"),
      element_at(array(lit("F"), lit("O"), lit("P")),
        when(hmod(col("id"), 16, 100) < 48, 0)
          .when(hmod(col("id"), 16, 100) < 96, 1).otherwise(2)
          .cast("int") + 1).as("o_orderstatus"),
      ((lit(100000) + hmod(col("id"), 17, 40000000)) / 100.0)
        .as("o_totalprice"),
      date_add(epoch95, hmod(col("id"), 18, 2400).cast("int"))
        .cast("timestamp").as("o_orderdate"),
      element_at(prios, hmod(col("id"), 19, 5).cast("int") + 1)
        .as("o_orderpriority")), "orders")

    val li = spark.range(nLine)
      .withColumn("l_orderkey", floor(col("id") / 4))
      .withColumn("l_linenumber", pmod(col("id"), lit(4)).cast("int") + 1)
      .withColumn("qty", hmod(col("id"), 20, 50) + 1)
      .withColumn("shipoff", hmod(col("id"), 21, 2500).cast("int"))
    save(li.select(col("l_orderkey"),
      hmod(col("id"), 22, nPart).as("l_partkey"),
      hmod(col("id"), 23, nSupp).as("l_suppkey"),
      col("l_linenumber"),
      col("qty").cast("double").as("l_quantity"),
      (col("qty") * ((lit(90000) + hmod(col("id"), 24, 110000)) / 100.0))
        .as("l_extendedprice"),
      (hmod(col("id"), 25, 11) / 100.0).as("l_discount"),
      (hmod(col("id"), 26, 9) / 100.0).as("l_tax"),
      when(col("shipoff") < 1200,
        when(hmod(col("id"), 27, 2) === 0, "A").otherwise("R"))
        .otherwise(lit("N")).as("l_returnflag"),
      when(col("shipoff") < 1200, "F").otherwise("O").as("l_linestatus"),
      date_add(epoch95, col("shipoff") + 1).cast("timestamp")
        .as("l_shipdate")), "lineitem")

    // events: same 30-day span as the driver data, density scales with
    // sf; ts increases with event_id plus bounded jitter (stream-like)
    val spanUs = 30L * 86400 * 1000000
    val stepUs = spanUs / nEvents
    val eTypes = array(Seq("view", "click", "purchase", "signup",
      "error").map(lit): _*)
    save(spark.range(nEvents).select(col("id").as("event_id"),
      timestamp_micros(lit(java.time.Instant.parse("2024-01-01T00:00:00Z")
          .toEpochMilli * 1000) + col("id") * lit(stepUs) +
        hmod(col("id"), 28, stepUs.max(1L))).as("ts"),
      hmod(col("id"), 29, (15000 * sf).toLong.max(1L)).as("user_id"),
      element_at(eTypes, hmod(col("id"), 30, 5).cast("int") + 1)
        .as("event_type"),
      (hmod(col("id"), 31, 56000) / 100.0).as("value"),
      concat(lit("{\"k\": "), hmod(col("id"), 32, 100), lit("}"))
        .as("props")), "events")

    // documents: hash-driven word soup over a small vocab (mirrors the
    // driver corpus' shape: shared phrases collide across docs), with a
    // planted exact duplicate (id%50==49 copies 48) and a planted
    // near-duplicate (id%50==24 copies 23 + a 3-word tail) per 50 docs
    val vocab = array(Seq("spark", "line", "column", "order", "small",
      "sort", "fast", "value", "scan", "hash", "slow", "group", "batch",
      "query", "agg", "table", "vector", "key", "stream", "filter",
      "customer", "the", "a", "window", "join", "part", "index", "merge",
      "cache", "plan", "shuffle", "broadcast", "skew", "limit", "range",
      "union", "read", "write", "null", "copy").map(lit): _*)
    val langs = array(Seq("en", "en", "en", "en", "de", "fr", "es",
      "zh").map(lit): _*)
    val docs = spark.range(nDocs)
      .withColumn("seed", when(pmod(col("id"), lit(50)) === 49, col("id") - 1)
        .when(pmod(col("id"), lit(50)) === 24, col("id") - 1)
        .otherwise(col("id")))
      .withColumn("nw", hmod(col("seed"), 33, 110) + 8)
      .withColumn("base", concat_ws(" ", transform(
        sequence(lit(0L), col("nw")),
        p => element_at(vocab, hmod(col("seed") * 1000 + p, 34, 40)
          .cast("int") + 1))))
      .withColumn("text", when(pmod(col("id"), lit(50)) === 24,
          concat(col("base"), lit(" near dup tail")))
        .otherwise(col("base")))
    save(docs.select(col("id").as("doc_id"), col("text"),
      element_at(langs, hmod(col("seed"), 35, 8).cast("int") + 1).as("lang"),
      concat(lit("src"), hmod(col("seed"), 36, 20)).as("source"),
      length(col("text")).cast("long").as("n_chars")), "documents")

    // embeddings: 10 separable label clusters (deterministic centers via
    // cos) + per-(id, dim) noise, float32 like the driver data
    save(spark.range(nEmb).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), j =>
        (cos((hmod(col("id"), 37, 10) * 64 + j) * lit(0.7)) +
          (hmod(col("id") * 100 + j, 38, 1000) / 1000.0 - 0.5))
          .cast("float")).as("embedding"),
      hmod(col("id"), 37, 10).cast("int").as("label")), "embeddings")
  }
}
