package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * All operators are pure DataFrame pipelines over Catalyst expressions
  * (higher-order functions, no UDFs): whole-stage codegen applies and the
  * only shuffles are on the aggregation / bucket-join keys the semantics
  * require. MinHash uses md5-based deterministic hashing so results are
  * engine-reproducible (and oracle-checkable in DuckDB).
  *
  * Scale notes (100 TB): exact dedup shuffles once on the content hash;
  * MinHash-LSH shuffles once on (band, bucket) — bucket sizes are bounded
  * by tuning bands x rows-per-band, and the self-join joins only the
  * minimal (id, band, bucket) projection, re-attaching payloads after the
  * candidate set is known. Never an all-pairs product.
  */
object Dedup {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Hot-bucket observability for the LSH band joins: how many band
    * buckets exceeded `maxBucketSize` (and were routed to the salted
    * sub-bucket join instead of the plain equi-join), how many band
    * rows they held, and the largest bucket observed. Since round 11
    * NOTHING is dropped — the stats report where the intrinsic
    * quadratic candidate mass lives (Σ size² over these buckets), so a
    * caller can see the cost of a degenerate corpus rather than guess. */
  case class LshSaltStats(saltedBuckets: Long, saltedRows: Long,
                          largestBucket: Long)

  /** Skew-split router for the LSH band joins: compute bucket sizes
    * once, route rows whose bucket holds at most `maxBucketSize`
    * members to the plain equi-join path, and annotate rows in larger
    * ("hot") buckets with the sub-bucket count ceil(size / cap) for
    * the grouped salted kernels. NOTHING is dropped — `maxBucketSize` is a
    * task-granularity knob, not a recall trade (the pre-round-11 cap
    * dropped hot buckets and logged the loss; the salted join keeps
    * the exact uncapped pair set). The stats aggregate is one extra
    * job over the (already checkpointed) band-row projection — the
    * routing decision needs the sizes anyway, and the size table is
    * checkpointed so the stats pass and both routing joins share one
    * computation. */
  private def splitHotBuckets(bandRows: DataFrame, keyCols: Seq[String],
                              maxBucketSize: Int, opName: String,
                              subBucketRows: Int = 0)
      : (DataFrame, DataFrame, LshSaltStats) = {
    val kc = keyCols.map(col)
    val sub = if (subBucketRows > 0) subBucketRows else maxBucketSize
    val sizes = bandRows.groupBy(kc: _*)
      .agg(count(lit(1)).as("__sz"))
      .localCheckpoint(false) // stats .head() materializes; joins reuse
    val r = sizes.agg(
      coalesce(sum(when(col("__sz") > maxBucketSize, lit(1L))), lit(0L)),
      coalesce(sum(when(col("__sz") > maxBucketSize, col("__sz"))), lit(0L)),
      coalesce(max(col("__sz")), lit(0L))).head()
    val stats = LshSaltStats(r.getLong(0), r.getLong(1), r.getLong(2))
    // no hot buckets (the healthy-corpus common case): every row is
    // "normal", so skip both routing joins — the stats job was the
    // only overhead the routing added
    if (stats.saltedBuckets == 0) return (bandRows, bandRows, stats)
    log.info(s"$opName: ${stats.saltedBuckets} band buckets over " +
      s"$maxBucketSize (${stats.saltedRows} band rows, largest " +
      s"${stats.largestBucket}) take the salted sub-bucket route; all " +
      "pairs retained — the bucket's intrinsic size² candidate mass " +
      "is the cost")
    val normal = bandRows.join(
      sizes.filter(col("__sz") <= maxBucketSize).select(kc: _*),
      keyCols, "left_semi")
    val hot = bandRows
      .join(sizes.filter(col("__sz") > maxBucketSize), keyCols)
      .withColumn("__nsalt",
        ceil(col("__sz").cast("double") / sub).cast("int"))
      .drop("__sz")
    (normal, hot, stats)
  }

  /** Bucket-size routing threshold for the LSH band joins. Candidate
    * generation inside a bucket is O(size²); buckets above this size
    * (degenerate boilerplate / mega-cluster mass) are salted into
    * ~cap-sized sub-buckets and verified inline (grouped kernels)
    * instead of riding the candidate-distinct path, so one
    * corpus-scale bucket cannot create a straggler task or an
    * unbounded candidate shuffle. Results are IDENTICAL at any
    * setting — this tunes task granularity only. Pass `Int.MaxValue`
    * to skip the routing (single-path plan, no stats job). */
  val DefaultMaxBucketSize: Int = 2048

  /** Kernel-route threshold for [[cosineNearDups]]: buckets above this
    * size skip the candidate-distinct + vector-re-join detour and take
    * the grouped primitive-dot kernel instead. Lower than the text
    * default because vector payloads make the per-candidate cost of the
    * join path ~20x the kernel's (measured at sf1, SCALE.md finding 1) —
    * in a healthy sparse corpus buckets stay under this anyway, so the
    * normal path (which never ships vectors through the band join)
    * still serves the non-degenerate mass. Identical results at any
    * setting. */
  val DefaultVectorBucketSize: Int = 256

  /** Broadcast cap for the verify-stage payload lookups (round 16):
    * candidate pair lists at or under this many rows (~64 MB hashed at
    * 16 bytes a pair) BROADCAST into the two payload joins, so the
    * corpus-sized payload column (shingle arrays / normalized vectors)
    * never shuffles — the scale study measured the minhash verify
    * stage at 14.5 s via shuffle joins vs 1.8 s via broadcast lookups
    * on the 300k-doc corpus. Larger lists fall back to the plain
    * shuffle joins. Identical pair sets either way — a pure plan
    * choice. */
  val CandBroadcastPairs: Long = 1L << 22

  /** Kernel-route threshold for [[simhashPairs]]: the payload is one
    * long, so the kernel route (XOR + popcount per pair, single-copy
    * shuffle) beats the join path from a few dozen rows per bucket —
    * 64 keeps genuinely sparse buckets on the zero-extra-shuffle plain
    * join and routes everything collision-dense to the kernel.
    * Identical results at any setting. */
  val DefaultSimhashBucketSize: Int = 64

  /** Grid-salting threshold INSIDE the cosine kernel route: hot buckets
    * up to this many rows run as one kernel task (vectors shipped once,
    * worst task ~size²/2 dots); larger buckets split into (saltL,
    * saltR) grid cells of ~this many rows per side, bounding task
    * memory and straggler time at the price of 2 x nsalt vector
    * copies. 8192 rows = ~34M dot evals ≈ a few seconds per cell. */
  val KernelSubBucketRows: Int = 8192

  /** Words of a text column (whitespace split, lowercased). */
  def words(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** w-word shingles of a text column as an array of strings. */
  def shingles(text: Column, w: Int = 3): Column = {
    val ws = words(text)
    transform(sequence(lit(0), greatest(size(ws) - w, lit(0))),
      i => concat_ws(" ", (0 until w).map(o => element_at(ws, i + o + 1)): _*))
  }

  /** Distinct w-word shingle sets as (id, sh: array<string>) — the typed
    * fast path used by the pair operators. Semantics identical to
    * `array_distinct(shingles(text, w))` (same Java regex split, same
    * partial shingles for short docs, first-occurrence order) but ~100x
    * faster: Spark array HOFs evaluate interpreted at ~2.5 ms/doc, while
    * this per-row kernel is string ops in a tight loop. Still a pure
    * distributed projection — no shuffle, no driver involvement. */
  def shingleSets(df: DataFrame, idCol: String, textCol: String,
                  w: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        // null text -> empty shingle set (the doc simply has no grams);
        // the HOF path propagates null, which downstream explodes to the
        // same zero rows — without this guard the kernel would NPE and
        // fail the whole job on one bad row.
        if (text == null) (id, Array.empty[String])
        else {
        val ws = text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
        val n = math.max(ws.length - w, 0)
        val out = new java.util.LinkedHashSet[String]()
        var i = 0
        while (i <= n) {
          val sb = new StringBuilder
          var o = 0
          while (o < w && i + o < ws.length) {
            if (o > 0) sb.append(' ')
            sb.append(ws(i + o))
            o += 1
          }
          out.add(sb.toString)
          i += 1
        }
        (id, out.toArray(Array.empty[String]))
        }
      }
      .toDF("__id", "sh")
  }

  /** NON-distinct w-word shingle stream as one `gram` column — the
    * occurrence-counting twin of [[shingleSets]] (same split, same
    * partial shingles for short docs, every occurrence kept), as a
    * typed kernel because `explode(shingles(...))` evaluates the
    * interpreted HOF per OUTPUT row (the bench-measured trap). Pure
    * projection: no shuffle. */
  def shingleStream(df: DataFrame, textCol: String, w: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(textCol)).as[String]
      .mapPartitions { it =>
        it.filter(_ != null).flatMap { text =>
          val ws = text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
          val n = math.max(ws.length - w, 0)
          (0 to n).iterator.map { i =>
            val sb = new StringBuilder
            var o = 0
            while (o < w && i + o < ws.length) {
              if (o > 0) sb.append(' ')
              sb.append(ws(i + o))
              o += 1
            }
            sb.toString
          }
        }
      }
      .toDF("gram")
  }

  /** Exact dedup: one representative row (min id) per distinct content key.
    * One shuffle on the md5 content hash.
    *
    * The key is NULL-safe AND injection-safe: each column is tagged
    * `V<value>` (present) or `N` (null), then hashed INDIVIDUALLY; the
    * fixed-width (32 hex char) digests concatenate into the row key, so
    * no value content -- separator or tag chars inside a value -- can
    * make two distinct column tuples concatenate identically (the
    * collision a separator-joined raw encoding admits). */
  def exact(df: DataFrame, idCol: String, contentCols: Seq[String]): DataFrame = {
    val parts = contentCols.map(c =>
      md5(coalesce(concat(lit("V"), col(c).cast("string")), lit("N"))))
    val key = md5(concat(parts: _*))
    df.groupBy(key.as("content_key"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("cluster_size"))
  }

  /** PARAGRAPH-LEVEL global dedup (the RefinedWeb / Dolma recipe): split
    * each document on `sep`, keep every distinct paragraph only at its
    * FIRST global occurrence — the lexicographically smallest
    * (id, position) among all rows carrying an identical paragraph — and
    * reassemble each document's surviving text in original order.
    * Boilerplate that repeats across millions of pages (cookie banners,
    * nav bars, license footers) survives in exactly one document;
    * full-copy documents lose every paragraph (`text` comes back NULL).
    *
    * Output: (id, n_paras, n_kept, text).
    *
    * Shape: posexplode → groupBy(md5(paragraph)) keeping
    * min(struct(id, pos)) — partial-aggregated, so the hot-paragraph
    * case (the same footer on every page) collapses map-side and the
    * shuffle carries one row per distinct paragraph per partition —
    * → equi-join back on the hash → per-document ordered re-aggregation
    * (state bounded by single-document size). Paragraph volume is
    * corpus-linear; no window ever spans an unbounded partition. */
  def paragraphDedup(df: DataFrame, idCol: String, textCol: String,
                     sep: String = "\n"): DataFrame = {
    val paras = df.select(col(idCol).as("__id"),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("__pos", "__para")))
    val hashed = paras.withColumn("__h", md5(col("__para")))
    val firstOcc = hashed.groupBy("__h")
      .agg(min(struct(col("__id"), col("__pos"))).as("__first"))
    val kept = hashed.join(firstOcc, "__h")
      .filter(col("__id") === col("__first.__id") &&
        col("__pos") === col("__first.__pos"))
    val rebuilt = kept.groupBy(col("__id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("__pos"), col("__para")))),
          s => s.getField("__para")), sep).as("text"))
    paras.groupBy(col("__id")).agg(count(lit(1)).as("n_paras"))
      .join(rebuilt, Seq("__id"), "left")
      .select(col("__id").as(idCol), col("n_paras"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"), col("text"))
  }

  /** MinHash signature columns: sig_s = min over shingles of md5(s|shingle).
    * Deterministic across engines (md5 over strings, lexicographic min). */
  def minhashSignature(text: Column, numHashes: Int, shingleWidth: Int = 3): Seq[Column] = {
    val sh = shingles(text, shingleWidth)
    (0 until numHashes).map { s =>
      array_min(transform(sh, x => md5(concat(lit(s.toString), lit("|"), x))))
        .as(s"mh_$s")
    }
  }

  /** MinHash-LSH candidate pairs verified by exact shingle-set Jaccard.
    *
    * bands x rowsPerBand = number of hashes; a pair is a candidate if any
    * band's signature slice agrees, and survives if its exact Jaccard
    * >= threshold. Returns (id_a, id_b, jaccard) with id_a < id_b.
    */
  /** One-pass typed kernel: distinct shingle set PLUS the LSH band-bucket
    * hashes per row. Signature s = min over shingles of md5(s|shingle);
    * bucket b = md5 of the comma-joined signature slice — identical
    * strings to the previous explode + codegen'd min-aggregate plan, but
    * computed in a tight loop with a reused MessageDigest: no exploded
    * row materialization, no aggregation shuffle at all for the
    * signature step (the shuffle that remains is the band-bucket join,
    * which the semantics require). */
  private def shingleSetsWithBuckets(df: DataFrame, idCol: String,
                                     textCol: String, w: Int, bands: Int,
                                     rowsPerBand: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import graft.functions.TextKernels.md5Hex
    val numHashes = bands * rowsPerBand
    // spread thin inputs MODESTLY: the per-(seed, gram) md5 loop is the
    // dominant CPU cost of the LSH pipeline and inherits the scan
    // partitioning, but the kernel output is re-scanned by several
    // downstream stages, so full-parallelism spreading floods them with
    // tiny tasks (bench-measured net loss at 32) — 8 buys most of the
    // kernel speedup at a quarter of the stage overhead (no-op at scale)
    Spread.thin(df.select(col(idCol).cast("long"), col(textCol)),
        target = math.min(df.sparkSession.sparkContext.defaultParallelism, 8))
      .as[(Long, String)]
      .mapPartitions { it =>
        // per-partition state: pre-encoded seed prefixes + two reused
        // 16-byte digest buffers — the (seed, gram) min-tracking runs on
        // RAW digests (unsigned byte order == hex order; see md5Into)
        // and hex-encodes only each seed's winner
        val utf8 = java.nio.charset.StandardCharsets.UTF_8
        val prefixes = Array.tabulate(numHashes)(s => (s.toString + "|").getBytes(utf8))
        val scratch = new Array[Byte](16)
        val minBuf = new Array[Byte](16)
        it.map { case (id, text) =>
        if (text == null)
          (id, Array.empty[String], Array.empty[String], Array.empty[String])
        else {
          val ws = text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
          val n = math.max(ws.length - w, 0)
          val grams = new java.util.LinkedHashSet[String]()
          var i = 0
          while (i <= n) {
            val sb = new StringBuilder
            var o = 0
            while (o < w && i + o < ws.length) {
              if (o > 0) sb.append(' ')
              sb.append(ws(i + o))
              o += 1
            }
            grams.add(sb.toString)
            i += 1
          }
          val sh = grams.toArray(Array.empty[String])
          // encode each gram's UTF-8 bytes ONCE; per (seed, gram) the md5
          // streams the pre-encoded seed prefix then the gram bytes
          val gramBytes = new Array[Array[Byte]](sh.length)
          var gi = 0
          while (gi < sh.length) { gramBytes(gi) = sh(gi).getBytes(utf8); gi += 1 }
          val sig = new Array[String](numHashes)
          var s = 0
          while (s < numHashes) {
            var have = false
            gi = 0
            while (gi < sh.length) {
              graft.functions.TextKernels.md5Into(prefixes(s), gramBytes(gi), scratch)
              if (!have ||
                  java.util.Arrays.compareUnsigned(scratch, minBuf) < 0) {
                System.arraycopy(scratch, 0, minBuf, 0, 16)
                have = true
              }
              gi += 1
            }
            sig(s) = if (have) graft.functions.TextKernels.hexOf(minBuf) else null
            s += 1
          }
          val buckets = new Array[String](if (sh.isEmpty) 0 else bands)
          var b = 0
          while (b < buckets.length) {
            val sb = new StringBuilder
            var r = 0
            while (r < rowsPerBand) {
              if (r > 0) sb.append(',')
              sb.append(sig(b * rowsPerBand + r))
              r += 1
            }
            buckets(b) = md5Hex(sb.toString)
            b += 1
          }
          (id, sh, if (sh.isEmpty) Array.empty[String] else sig, buckets)
        }
        }
      }
      .toDF("__id", "sh", "sig", "buckets")
  }

  /** Exact shingle-set jaccard over a pairs frame carrying `sh_a` /
    * `sh_b`, thresholded — shared by the normal-bucket verify join and
    * the salted hot-bucket path so both produce bit-identical doubles. */
  private def jaccardVerify(pairs: DataFrame, threshold: Double): DataFrame =
    pairs
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("jaccard",
        col("inter") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))

  /** @param maxBucketSize route band buckets larger than this to the
    *        salted sub-bucket kernel instead of the
    *        candidate-distinct path. Candidate generation inside a
    *        bucket is O(size^2): at corpus scale a boilerplate-heavy
    *        shingle set can put millions of docs in one bucket; the
    *        salted kernel route bounds every task at ~cap-sized
    *        sub-buckets while keeping the EXACT uncapped pair set
    *        (nothing is dropped — round-11 change from the drop-cap).
    *        Default: [[DefaultMaxBucketSize]]; use
    *        [[minhashLshWithStats]] for programmatic hot-bucket stats.
    *        Pass `Int.MaxValue` to skip routing (identical result, no
    *        stats job). */
  /** Total hash budget the PLANNED default (b, r) selection optimizes
    * under — the historical fixed default's 4·3 = 12 hashes, so the
    * threshold-driven plan never costs more signature work than the
    * old hard-coded parameters did. */
  val DefaultLshBudget: Int = 12

  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
                 bands: Int = 0, rowsPerBand: Int = 0,
                 threshold: Double = 0.6, shingleWidth: Int = 3,
                 maxBucketSize: Int = DefaultMaxBucketSize): DataFrame =
    minhashLshWithStats(df, idCol, textCol, bands, rowsPerBand, threshold,
      shingleWidth, maxBucketSize)._1

  /** [[minhashLsh]], also returning the hot-bucket salt stats (None when
    * routing is skipped) so degenerate candidate mass is observable,
    * not guessed. */
  /** [[minhashLsh]], also returning hot-bucket salt stats.
    *
    * PLANNED DEFAULTS: leaving `bands`/`rowsPerBand` at 0 selects
    * (b, r) from the `threshold` via the [[lshPlan]] objective (the
    * datasketch optimal_param S-curve area) under the
    * [[DefaultLshBudget]] hash budget — "I want 0.8-similar pairs"
    * needs no hand tuning. Explicit values are honored unchanged (the
    * declared oracle queries pin them for engine reproducibility);
    * passing exactly one of the two is an error. A threshold outside
    * (0, 1) — e.g. 0 = "every candidate verifies" — has no S-curve to
    * optimize and falls back to the historical (4, 3). */
  def minhashLshWithStats(df: DataFrame, idCol: String, textCol: String,
                 bands: Int = 0, rowsPerBand: Int = 0,
                 threshold: Double = 0.6, shingleWidth: Int = 3,
                 maxBucketSize: Int = DefaultMaxBucketSize)
      : (DataFrame, Option[LshSaltStats]) = {
    require((bands > 0) == (rowsPerBand > 0),
      "pass both bands and rowsPerBand, or neither (planned defaults)")
    val (b, r) =
      if (bands > 0) (bands, rowsPerBand)
      else if (threshold > 0.0 && threshold < 1.0)
        lshPlanParams(threshold, DefaultLshBudget, 0.5)
      else (4, 3)
    // one kernel pass computes the shingle set AND the band buckets;
    // materialized once (lazy localCheckpoint) because the self-join +
    // the two verify re-joins would otherwise recompute the md5 work
    // once per consumer. localCheckpoint, not cache: the RDD blocks are
    // reference-tracked and freed on GC, so repeated operator calls in a
    // long-lived session don't accumulate storage memory.
    val sets = shingleSetsWithBuckets(df, idCol, textCol, shingleWidth,
      b, r).localCheckpoint(false)
    minhashPairsFromSets(sets, threshold, maxBucketSize)
  }

  /** The band-join + verify half of [[minhashLshWithStats]], from an
    * already-MATERIALIZED (__id, sh, buckets) frame — shared with the
    * fused dual-detector pass ([[captureRecaptureFromText]]) so one
    * shingle kernel can feed several consumers. */
  private[graft] def minhashPairsFromSets(sets: DataFrame, threshold: Double,
                                   maxBucketSize: Int)
      : (DataFrame, Option[LshSaltStats]) = {
    val bandRows0 = sets
      .select(col("__id"), posexplode(col("buckets")).as(Seq("band", "bucket")))
    val shOnly = sets.select(col("__id"), col("sh"))
    val (bandRows, hotPairs, stats) =
      if (maxBucketSize == Int.MaxValue) (bandRows0, None, None)
      else {
        val (normal, hot, s) = splitHotBuckets(
          bandRows0.localCheckpoint(false), Seq("band", "bucket"),
          maxBucketSize, "minhashLsh")
        if (s.saltedBuckets == 0) (normal, None, Some(s))
        else {
          // hot pairs verify INLINE in a grouped typed kernel (the
          // cosineNearDups shape): shingle sets ship ONCE per hot row
          // for single-cell buckets, the per-pair jaccard runs as a
          // hash-set membership count, and only surviving pairs leave
          // the group — the quadratic candidate mass never hits a
          // distinct shuffle or a payload re-join. The double
          // arithmetic (c / (na + nb - c) on exact ints) matches the
          // join path's array_intersect expression bit-for-bit.
          val spark = sets.sparkSession
          import spark.implicits._
          val hv = hot.join(shOnly, "__id")
            .select(col("band"), col("bucket"), col("__nsalt"),
              col("__id"), col("sh"))
            .as[(Int, String, Int, Long, Array[String])]
          val tagged = hv.flatMap { case (band, bucket, nsalt, id, sh) =>
            if (nsalt <= 1)
              Iterator.single((band, bucket, 0, 0, 2.toByte, id, sh))
            else {
              val own = java.lang.Math.floorMod(
                scala.util.hashing.byteswap64(id), nsalt.toLong).toInt
              (0 until nsalt).iterator.flatMap { o =>
                if (o == own)
                  Iterator((band, bucket, own, own, 2.toByte, id, sh))
                else Iterator((band, bucket, own, o, 0.toByte, id, sh),
                  (band, bucket, o, own, 1.toByte, id, sh))
              }
            }
          }
          val hp = tagged
            .groupByKey(e => (e._1, e._2, e._3, e._4))
            .flatMapGroups { (_, it) =>
              val lids = scala.collection.mutable.ArrayBuffer.empty[Long]
              val lset = scala.collection.mutable.ArrayBuffer
                .empty[java.util.HashSet[String]]
              val lsz = scala.collection.mutable.ArrayBuffer.empty[Int]
              val rids = scala.collection.mutable.ArrayBuffer.empty[Long]
              val rarr = scala.collection.mutable.ArrayBuffer.empty[Array[String]]
              it.foreach { e =>
                if (e._5 != 1.toByte) {
                  val hs = new java.util.HashSet[String](e._7.length * 2)
                  e._7.foreach(hs.add)
                  lids += e._6; lset += hs; lsz += e._7.length
                }
                if (e._5 != 0.toByte) { rids += e._6; rarr += e._7 }
              }
              val out = scala.collection.mutable.ArrayBuffer
                .empty[(Long, Long, Double)]
              var x = 0
              while (x < lids.length) {
                val ida = lids(x); val sa = lset(x); val na = lsz(x)
                var y = 0
                while (y < rids.length) {
                  val idb = rids(y)
                  if (ida < idb) {
                    val sb = rarr(y)
                    var c = 0
                    var i = 0
                    while (i < sb.length) {
                      if (sa.contains(sb(i))) c += 1
                      i += 1
                    }
                    val denom = na + sb.length - c
                    if (denom > 0) {
                      val j = c.toDouble / denom.toDouble
                      if (j >= threshold) out += ((ida, idb, j))
                    }
                  }
                  y += 1
                }
                x += 1
              }
              out.iterator
            }
            .toDF("id_a", "id_b", "jaccard")
          (normal, Some(hp), Some(s))
        }
      }
    val cands = bandRows.as("l")
      .join(bandRows.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.__id") < col("r.__id"))
      .select(col("l.__id").as("id_a"), col("r.__id").as("id_b"))
      .distinct()
      // materialized once: feeds two payload lookups and its size picks
      // the verify plan (output-bounded after banding + distinct)
      .localCheckpoint(false)
    // verify with exact shingle-set jaccard; small candidate lists
    // broadcast into the payload lookups so the corpus-sized sh frame
    // never shuffles (see CandBroadcastPairs)
    val joined =
      if (cands.count() <= CandBroadcastPairs) {
        val a = shOnly.join(broadcast(cands), col("__id") === col("id_a"))
          .select(col("id_a"), col("id_b"), col("sh").as("sh_a"))
        val b = shOnly.join(broadcast(cands), col("__id") === col("id_b"))
          .select(col("id_a").as("__ba"), col("id_b").as("__bb"),
            col("sh").as("sh_b"))
        a.join(b, col("id_a") === col("__ba") && col("id_b") === col("__bb"))
          .drop("__ba", "__bb")
      } else cands
        .join(shOnly.withColumnRenamed("__id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(shOnly.withColumnRenamed("__id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
    val normalPairs = jaccardVerify(joined, threshold)
    // a pair can surface from a normal bucket AND a hot bucket (different
    // bands) or from several hot buckets; both paths compute the same
    // jaccard double, so a distinct over the (output-sized) union dedupes
    val pairs = hotPairs
      .map(hp => normalPairs.unionAll(hp).distinct())
      .getOrElse(normalPairs)
    (pairs, stats)
  }

  // ------------------------------------------------- incremental dedup

  /** Banded minhash INDEX of a corpus — the reusable artifact for
    * INCREMENTAL dedup: dedup each new batch against the historical
    * corpus without re-scanning it (the production crawl-ingest shape).
    * One signature-sized row per doc: (id, sig, buckets) — the raw text
    * and shingle sets do NOT ride along, so the index is
    * numHashes x 32 hex chars per doc at any corpus size. Persist with
    * [[saveMinhashIndex]]; probe with [[minhashLshIncremental]].
    *
    * PLANNED DEFAULTS (round 15): leaving `bands`/`rowsPerBand` at 0
    * selects (b, r) from `threshold` exactly like [[minhashLsh]] — the
    * two operators' defaults always agree, so an index built with
    * defaults matches `minhashLsh` defaults at the same threshold.
    * Explicit values are honored unchanged; the probe side
    * ([[minhashLshIncremental]]) infers (b, r) FROM the index when left
    * at defaults, so any build/probe default combination matches. */
  def minhashIndex(df: DataFrame, idCol: String, textCol: String,
                   bands: Int = 0, rowsPerBand: Int = 0,
                   shingleWidth: Int = 3,
                   threshold: Double = 0.6): DataFrame = {
    require((bands > 0) == (rowsPerBand > 0),
      "pass both bands and rowsPerBand, or neither (planned defaults)")
    val (b, r) =
      if (bands > 0) (bands, rowsPerBand)
      else if (threshold > 0.0 && threshold < 1.0)
        lshPlanParams(threshold, DefaultLshBudget, 0.5)
      else (4, 3)
    shingleSetsWithBuckets(df, idCol, textCol, shingleWidth, b, r)
      .select(col("__id").as("id"), col("sig"), col("buckets"))
  }

  /** Persist a minhash index as parquet (overwrite = false refuses an
    * existing path, like the model writers). */
  def saveMinhashIndex(index: DataFrame, path: String,
                       overwrite: Boolean = true): Unit =
    index.write.mode(if (overwrite) "overwrite" else "errorifexists")
      .parquet(path)

  /** Restore a minhash index persisted by [[saveMinhashIndex]]. */
  def loadMinhashIndex(spark: org.apache.spark.sql.SparkSession,
                       path: String): DataFrame =
    spark.read.parquet(path)
      .select(col("id").cast("long"), col("sig").cast("array<string>"),
        col("buckets").cast("array<string>"))

  /** Near-dups of `newDocs` AGAINST an existing [[minhashIndex]] —
    * incremental dedup without touching the indexed corpus text.
    * Candidates come from the band-bucket join (minimal (id, band,
    * bucket) projections, the only wide shuffle); similarity is the
    * signature-estimated Jaccard (fraction of agreeing minhashes — the
    * standard index-probe estimate; the indexed shingle sets are gone
    * by design, so exact verification is impossible and unnecessary:
    * E[estimate] = true Jaccard, with numHashes controlling variance).
    * Returns (new_id, index_id, est_jaccard) for pairs at or above
    * `minEstJaccard`.
    *
    * Scale notes (100 TB): the index is signature-sized; per-batch cost
    * is one kernel pass over the BATCH plus the bucket join, and
    * `maxBucketSize` caps degenerate boilerplate buckets exactly like
    * [[minhashLsh]]. The bands/rowsPerBand/shingleWidth MUST match the
    * index build (bucket strings are md5 of signature slices).
    *
    * ID CONTRACT: ids MUST be globally unique across the index and
    * every probed batch (the self-pair guard filters `new_id =!=
    * index_id`, so a batch doc that REUSES an indexed doc's id would
    * silently lose its genuine near-duplicate pair). When id spaces are
    * allocated independently, disambiguate before probing — e.g. offset
    * batch ids past the index max, or carry a namespace in the id.
    *
    * BAND-PARAM CONTRACT (round 15): leaving `bands`/`rowsPerBand` at 0
    * infers (b, r) FROM the index itself (one limit-1 peek at the
    * signature/bucket array lengths), so a probe with defaults matches
    * ANY index build — planned, historical (4,3), or hand-tuned — by
    * construction. Explicit values are honored unchanged but MUST match
    * the index build (bucket strings are md5 of signature slices; a
    * mismatch silently yields zero candidates), so prefer the default. */
  def minhashLshIncremental(index: DataFrame, newDocs: DataFrame,
                            idCol: String, textCol: String,
                            bands: Int = 0, rowsPerBand: Int = 0,
                            minEstJaccard: Double = 0.6,
                            shingleWidth: Int = 3,
                            maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    require((bands > 0) == (rowsPerBand > 0),
      "pass both bands and rowsPerBand, or neither (inferred from the index)")
    val (b, r) =
      if (bands > 0) (bands, rowsPerBand)
      else index.select(size(col("buckets")), size(col("sig"))).limit(1)
        .collect() match {
          case Array(row) =>
            val nb = row.getInt(0); val nh = row.getInt(1)
            require(nb > 0 && nh > 0 && nh % nb == 0,
              s"index has malformed signature shape: $nb buckets, $nh hashes")
            (nb, nh / nb)
          case _ => // empty index: any params produce the empty result
            (4, 3)
        }
    val numHashes = b * r
    val probe = minhashIndex(newDocs, idCol, textCol, b, r,
      shingleWidth).localCheckpoint(false)
    val ix = index.select(col("id").as("index_id"),
      col("sig").as("sig_i"), col("buckets").as("buckets_i"))
    val ib0 = ix.select(col("index_id"),
      posexplode(col("buckets_i")).as(Seq("band", "bucket")))
    val pb = probe.select(col("id").as("new_id"),
      posexplode(col("buckets")).as(Seq("band", "bucket")))
    val sigN = probe.select(col("id").as("new_id"), col("sig").as("sig_n"))
    val sigI = ix.select(col("index_id"), col("sig_i"))
    // signature-estimated Jaccard via codegen'd zip_with + aggregate —
    // no UDF, no shuffle beyond the key joins; shared by both routes so
    // the doubles are bit-identical
    def estimate(pairs: DataFrame): DataFrame = pairs
      .withColumn("est_jaccard",
        aggregate(
          zip_with(col("sig_n"), col("sig_i"),
            (a, b) => when(a === b, 1.0).otherwise(0.0)),
          lit(0.0), (acc, x) => acc + x) / numHashes)
      .filter(col("est_jaccard") >= minEstJaccard)
      .select(col("new_id"), col("index_id"), col("est_jaccard"))
    val (ib, hotPairs) =
      if (maxBucketSize == Int.MaxValue) (ib0, None)
      else {
        // hot buckets defined by INDEX bucket size (the index is the
        // corpus-scale side; the probe batch is comparatively small):
        // index rows keep one deterministic salt, probe rows replicate
        // to every salt, signatures ride the join so estimation is
        // inline — no candidate-distinct shuffle over the hot mass
        val (normal, hot, s) = splitHotBuckets(ib0.localCheckpoint(false),
          Seq("band", "bucket"), maxBucketSize, "minhashLshIncremental")
        if (s.saltedBuckets == 0) (normal, None)
        else {
          val hotL = hot.join(sigI, "index_id")
            .withColumn("__salt",
              pmod(xxhash64(col("index_id")), col("__nsalt").cast("long"))
                .cast("int"))
          val hotKeys = hot.select(col("band"), col("bucket"), col("__nsalt"))
            .distinct()
          val pbHot = pb.join(hotKeys, Seq("band", "bucket"))
            .join(sigN, "new_id")
            .withColumn("__salt", explode(sequence(lit(0), col("__nsalt") - 1)))
          val hp = estimate(
            hotL.as("l").join(pbHot.as("r"),
              col("l.band") === col("r.band") &&
                col("l.bucket") === col("r.bucket") &&
                col("l.__salt") === col("r.__salt") &&
                col("l.index_id") =!= col("r.new_id"))
              .select(col("r.new_id").as("new_id"),
                col("l.index_id").as("index_id"),
                col("r.sig_n").as("sig_n"), col("l.sig_i").as("sig_i")))
          (normal, Some(hp))
        }
      }
    val cands = ib.join(pb, Seq("band", "bucket"))
      .filter(col("new_id") =!= col("index_id"))
      .select(col("new_id"), col("index_id"))
      .distinct()
    val normalPairs = estimate(cands.join(sigN, "new_id").join(sigI, "index_id"))
    // a (new, index) pair can collide in several buckets across routes;
    // both routes compute the same estimate, so a distinct over the
    // (output-sized) union dedupes
    hotPairs.map(hp => normalPairs.unionAll(hp).distinct())
      .getOrElse(normalPairs)
  }

  /** All-pairs n-gram Jaccard via inverted-index join (pairs must share at
    * least one shingle; grouped pair counts, no cartesian product).
    *
    * @param maxDf drop grams whose document frequency exceeds this before
    *        the self-join. The inverted-index join emits f² pair rows for
    *        a gram in f docs — one boilerplate trigram ("all rights
    *        reserved") in 1M docs is 10¹² join rows. Capping bounds the
    *        work like [[minhashLsh]]'s `maxBucketSize`: dropped grams no
    *        longer contribute to intersection counts, so jaccard is
    *        UNDERestimated only for pairs whose overlap is dominated by
    *        corpus-wide boilerplate (which near-dup semantics want to
    *        ignore anyway). Default: uncapped (exact semantics — what
    *        the oracle checks). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        threshold: Double, shingleWidth: Int = 3,
                        maxDf: Int = Int.MaxValue): DataFrame = {
    // cached: the self-join would otherwise recompute the shingle
    // construction once per join side
    val sets = shingleSets(df, idCol, textCol, shingleWidth)
      .withColumn("n", size(col("sh")))
      .localCheckpoint(false) // GC-freed, unlike cache (see minhashLsh)
    // join on the 8-byte xxhash64 of the shingle instead of the string:
    // same distinct-set intersection counts (collisions are ~2^-64 per
    // gram pair), half the shuffle width
    val inv0 = sets.select(col("__id"), col("n"), explode(col("sh")).as("g"))
      .withColumn("gh", xxhash64(col("g"))).drop("g")
    val inv = (if (maxDf == Int.MaxValue) inv0
               else {
                 val ok = inv0.groupBy(col("gh"))
                   .agg(count(lit(1)).as("df"))
                   .filter(col("df") <= maxDf)
                   .select(col("gh"))
                 inv0.join(ok, Seq("gh"), "left_semi")
               }).localCheckpoint(false)
    val pairCounts = inv.as("a").join(inv.as("b"),
        col("a.gh") === col("b.gh") && col("a.__id") < col("b.__id"))
      .groupBy(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .agg(count(lit(1)).cast("double").as("c"))
    pairCounts
      .withColumn("jaccard", col("c") / (col("na") + col("nb") - col("c")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Bitext candidate mining by NUMBER fingerprints: pair documents in
    * DIFFERENT languages whose digit-token sets overlap — numbers
    * survive translation verbatim, so shared numerals are the classic
    * cheap pre-filter for parallel-corpus (translation-pair) mining
    * before any expensive cross-lingual scoring.
    *
    * Candidates come from the [[ngramJaccardPairs]] inverted-index
    * machinery on distinct digit runs (regexp `[0-9]+`), restricted to
    * cross-language pairs, scored by the integral Jaccard
    * `inter·1e6 div union`. `maxDf` drops ubiquitous numbers ("2024")
    * that would fan the index quadratically — the hot-gram cap.
    * Returns (id_a, lang_a, id_b, lang_b, n_common, jac_ppm) with
    * id_a < id_b. */
  def bitextCandidates(df: DataFrame, idCol: String, langCol: String,
                       textCol: String, threshold: Double,
                       maxDf: Int = 10000): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    require(maxDf >= 1, s"maxDf must be positive, got $maxDf")
    val sets = df
      .filter(col(idCol).isNotNull && col(langCol).isNotNull)
      .select(col(idCol).cast("long").as("__id"), col(langCol).as("__lang"),
        array_distinct(regexp_extract_all(coalesce(col(textCol), lit("")),
          lit("[0-9]+"), lit(0))).as("__nums"))
      .filter(size(col("__nums")) > 0)
      .withColumn("n", size(col("__nums")))
      .localCheckpoint(false)
    val inv0 = sets.select(col("__id"), col("__lang"), col("n"),
      explode(col("__nums")).as("g"))
    val ok = inv0.groupBy(col("g")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select(col("g"))
    val inv = inv0.join(ok, Seq("g"), "left_semi").localCheckpoint(false)
    inv.as("a").join(inv.as("b"),
        col("a.g") === col("b.g") && col("a.__id") < col("b.__id") &&
        col("a.__lang") =!= col("b.__lang"))
      .groupBy(col("a.__id").as("id_a"), col("a.__lang").as("lang_a"),
        col("b.__id").as("id_b"), col("b.__lang").as("lang_b"),
        col("a.n").as("__na"), col("b.n").as("__nb"))
      .agg(count(lit(1)).as("n_common"))
      .filter(col("n_common").cast("double") >=
        (col("__na") + col("__nb") - col("n_common")).cast("double") * threshold)
      .select(col("id_a"), col("lang_a"), col("id_b"), col("lang_b"),
        col("n_common"),
        expr("n_common * 1000000 div (__na + __nb - n_common)").as("jac_ppm"))
  }

  /** Incremental connected components: fold a NEW batch of pairs into
    * EXISTING cluster labels without re-reading history — labels
    * themselves are connectivity (each (id, cluster_id) row is an edge
    * to the cluster representative), so CC over `labels ∪ newPairs`
    * equals CC over the full original edge set plus the batch. The
    * crawl-clustering companion to [[minhashLshIncremental]]. */
  def connectedComponentsIncremental(prevLabels: DataFrame, idCol: String,
                                     clusterCol: String, newPairs: DataFrame,
                                     aCol: String, bCol: String): DataFrame =
    connectedComponents(
      prevLabels.select(col(idCol).as("id_a"), col(clusterCol).as("id_b"))
        .unionAll(newPairs.select(col(aCol).as("id_a"), col(bCol).as("id_b"))),
      "id_a", "id_b")

  /** Asymmetric CONTAINMENT pairs: |A ∩ B| / |A| >= threshold over
    * distinct n-gram sets — the EXCERPT detector. Jaccard misses a
    * short quote inside a long document (the union term swamps it);
    * containment asks "what fraction of the SMALLER side's grams
    * appear in the other", flagging quotes, syndicated snippets, and
    * benchmark text embedded in web pages. Emits (id_small, id_big)
    * with the containment of the smaller-set side (ties by id).
    *
    * Shape: identical inverted-index machinery to
    * [[ngramJaccardPairs]] — hash-gram candidate join, counts-only
    * verify; `maxDf` caps stopword-gram fan-out. Inherently quadratic
    * in co-occurring docs like every exact pair op — LSH remains the
    * corpus-wide path. */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       threshold: Double, shingleWidth: Int = 3,
                       maxDf: Int = Int.MaxValue): DataFrame = {
    require(threshold > 0 && threshold <= 1, "threshold must be in (0, 1]")
    val sets = shingleSets(df, idCol, textCol, shingleWidth)
      .withColumn("n", size(col("sh")))
      .localCheckpoint(false)
    val inv0 = sets.select(col("__id"), col("n"), explode(col("sh")).as("g"))
      .withColumn("gh", xxhash64(col("g"))).drop("g")
    val inv = (if (maxDf == Int.MaxValue) inv0
               else {
                 val ok = inv0.groupBy(col("gh"))
                   .agg(count(lit(1)).as("df"))
                   .filter(col("df") <= maxDf)
                   .select(col("gh"))
                 inv0.join(ok, Seq("gh"), "left_semi")
               }).localCheckpoint(false)
    val pairCounts = inv.as("a").join(inv.as("b"),
        col("a.gh") === col("b.gh") && col("a.__id") < col("b.__id"))
      .groupBy(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .agg(count(lit(1)).cast("double").as("c"))
    // containment of the smaller-gram-set side; on equal sizes the
    // smaller id (id_a, by join construction) is the "small" side
    val small = col("na") <= col("nb")
    pairCounts
      .withColumn("id_small", when(small, col("id_a")).otherwise(col("id_b")))
      .withColumn("id_big", when(small, col("id_b")).otherwise(col("id_a")))
      .withColumn("containment", col("c") / least(col("na"), col("nb")))
      .filter(col("containment") >= threshold)
      .select("id_small", "id_big", "containment")
  }

  /** Exact-threshold Jaccard join via PREFIX FILTERING (the
    * SSJoin/PPJoin family): identical output to the all-pairs
    * [[ngramJaccardPairs]] at the same threshold, but candidate pairs
    * come only from shared PREFIX grams. Under a global gram order
    * (rarest first — ascending document frequency, gram-hash
    * tiebreak), any pair with jaccard >= t shares at least one gram
    * among each side's first `n - ceil(t·n) + 1` grams (Chaudhuri et
    * al. 2006; Xiao et al. 2008), so indexing ONLY prefixes is
    * lossless. The prefix length uses `ceil(t·n − 1e-9)` — float
    * noise can only LENGTHEN the prefix (more candidates), never drop
    * a true pair, and the exact verify step makes the output
    * independent of the filter's rounding.
    *
    * Scale notes (100 TB): the candidate join touches ~t-fraction-of-
    * rarest grams instead of every gram — on Zipfian corpora that
    * drops the join input by the head of the distribution, and the
    * rarest-first order makes surviving posting lists short. The
    * verify joins full shingle sets back on the (small) candidate
    * list only. This is the exact-semantics scale path next to the
    * probabilistic [[minhashLsh]]. */
  def prefixJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                         threshold: Double,
                         shingleWidth: Int = 3): DataFrame = {
    require(threshold > 0 && threshold <= 1, "threshold must be in (0, 1]")
    val sets = shingleSets(df, idCol, textCol, shingleWidth)
      .withColumn("n", size(col("sh")))
      .localCheckpoint(false) // prefix index + verify join reuse it
    val inv = sets.select(col("__id"), col("n"), explode(col("sh")).as("g"))
      .withColumn("gh", xxhash64(col("g"))).drop("g")
    val dfreq = inv.groupBy(col("gh")).agg(count(lit(1)).as("df"))
    val wp = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__id")).orderBy(col("df"), col("gh"))
    val prefix = inv.join(dfreq, "gh")
      .withColumn("r", row_number().over(wp))
      .filter(col("r") <=
        col("n") - ceil(lit(threshold) * col("n") - lit(1e-9)) + 1)
      .select(col("__id"), col("gh"))
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.gh") === col("b.gh") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .distinct()
    cand
      .join(sets.select(col("__id").as("id_a"), col("sh").as("sa"),
        col("n").as("na")), "id_a")
      .join(sets.select(col("__id").as("id_b"), col("sh").as("sb"),
        col("n").as("nb")), "id_b")
      .withColumn("c", size(array_intersect(col("sa"), col("sb")))
        .cast("double"))
      .withColumn("jaccard", col("c") / (col("na") + col("nb") - col("c")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 64-bit SimHash of a text column: per-token 64-bit hash, each bit
    * votes +1/-1; the sign vector packs into a long. Near-dups have
    * small Hamming distance.
    *
    * The token hash is the TOP 64 bits of md5 (first 16 hex chars,
    * parsed unsigned) — engine-portable, so the whole operator is
    * DuckDB-oracle-checkable (xxhash64 would tie the result to Spark's
    * hash implementation). Typed per-row kernel: tokens -> votes ->
    * packed sign vector in one projection — no explode, no shuffle, no
    * interpreted HOFs. */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        // natural-language vocabulary is Zipfian, so a bounded
        // per-partition word -> hash memo turns the per-OCCURRENCE md5
        // (the measured 75% of simhashPairs wall at sf1) into a
        // per-DISTINCT-WORD md5; pure function, so the memo cannot
        // change results
        val ws = java.util.regex.Pattern.compile("\\s+")
        val memo = new java.util.HashMap[String, java.lang.Long](1 << 12)
        it.map { case (id, text) =>
          val votes = new Array[Int](64)
          if (text != null) ws.split(text.trim.toLowerCase(java.util.Locale.ROOT)).foreach { w =>
            var boxed = memo.get(w)
            if (boxed == null) {
              boxed = graft.functions.TextKernels.md5Long(w)
              if (memo.size < (1 << 16)) memo.put(w, boxed)
            }
            val h = boxed.longValue
            var b = 0
            while (b < 64) {
              if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
              b += 1
            }
          }
          var packed = 0L
          var b = 0
          while (b < 64) { if (votes(b) > 0) packed |= (1L << b); b += 1 }
          (id, packed)
        }
      }
      .toDF(idCol, "simhash")
  }

  /** Hamming distance between two long columns (for simhash pairing). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: band the 64 bits into 4 x 16-bit bucket keys
    * (a pair within Hamming distance 3 shares at least one band exactly);
    * verify candidates by full Hamming distance. The Hamming filter runs
    * BEFORE the pair-dedup distinct, so the distinct shuffle carries
    * only surviving pairs, never the raw candidate mass.
    *
    * @param maxBucketSize the same salted hot-bucket routing as
    *        [[minhashLsh]]/[[cosineNearDups]]: a corpus-scale
    *        boilerplate band bucket (one 16-bit band shared by millions
    *        of near-identical docs) makes one self-join key quadratic;
    *        buckets above this size are salted into ~cap-sized
    *        sub-buckets and verified inline — identical pair set at any
    *        setting, nothing dropped. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3,
                   maxBucketSize: Int = DefaultSimhashBucketSize): DataFrame = {
    // materialize + posexplode: the band union + self-join would
    // otherwise recompute the simhash kernel once per band per side (~8x)
    val sh = simhash(df, idCol, textCol).localCheckpoint(false)
    simhashPairsFromHashes(sh, idCol, maxHamming, maxBucketSize)
  }

  /** The band-join + verify half of [[simhashPairs]], from an
    * already-MATERIALIZED (idCol, simhash) frame — shared with the
    * fused dual-detector pass ([[captureRecaptureFromText]]). */
  private[graft] def simhashPairsFromHashes(sh: DataFrame, idCol: String,
                                     maxHamming: Int,
                                     maxBucketSize: Int): DataFrame = {
    val bandBuckets = array((0 until 4).map { b =>
      shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL)
    }: _*)
    val bandRows0 = sh.select(col(idCol).as("__id"), col("simhash"),
        posexplode(bandBuckets).as(Seq("band", "bucket")))
      .localCheckpoint(false)
    val spark = sh.sparkSession
    import spark.implicits._
    val (bandRows, hotPairs) =
      if (maxBucketSize == Int.MaxValue) (bandRows0, None)
      else {
        val (normal, hot, s) = splitHotBuckets(bandRows0,
          Seq("band", "bucket"), maxBucketSize, "simhashPairs",
          subBucketRows = KernelSubBucketRows)
        if (s.saltedBuckets == 0) (normal, None)
        else {
          // hot buckets: same grouped kernel as [[cosineNearDups]] —
          // the payload is one long, so the single-copy shuffle is
          // trivial and the pair loop is XOR + popcount (~5 ns/pair vs
          // ~1 us through join machinery + candidate distinct)
          val hv = hot.select(col("band"), col("bucket"), col("__nsalt"),
              col("__id"), col("simhash"))
            .as[(Int, Long, Int, Long, Long)]
          val tagged = hv.flatMap { case (band, bucket, nsalt, id, sh) =>
            if (nsalt <= 1) Iterator.single((band, bucket, 0, 0, 2.toByte, id, sh))
            else {
              val own = java.lang.Math.floorMod(
                scala.util.hashing.byteswap64(id), nsalt.toLong).toInt
              (0 until nsalt).iterator.flatMap { o =>
                if (o == own) Iterator((band, bucket, own, own, 2.toByte, id, sh))
                else Iterator((band, bucket, own, o, 0.toByte, id, sh),
                  (band, bucket, o, own, 1.toByte, id, sh))
              }
            }
          }
          val hp = tagged
            .groupByKey(e => (e._1, e._2, e._3, e._4))
            .flatMapGroups { (_, it) =>
              val lids = scala.collection.mutable.ArrayBuffer.empty[Long]
              val lsh = scala.collection.mutable.ArrayBuffer.empty[Long]
              val rids = scala.collection.mutable.ArrayBuffer.empty[Long]
              val rsh = scala.collection.mutable.ArrayBuffer.empty[Long]
              it.foreach { e =>
                if (e._5 != 1.toByte) { lids += e._6; lsh += e._7 }
                if (e._5 != 0.toByte) { rids += e._6; rsh += e._7 }
              }
              val out = scala.collection.mutable.ArrayBuffer
                .empty[(Long, Long, Int)]
              var x = 0
              while (x < lids.length) {
                val ida = lids(x); val sa = lsh(x)
                var y = 0
                while (y < rids.length) {
                  val idb = rids(y)
                  if (ida < idb) {
                    val h = java.lang.Long.bitCount(sa ^ rsh(y))
                    if (h <= maxHamming) out += ((ida, idb, h))
                  }
                  y += 1
                }
                x += 1
              }
              out.iterator
            }
            .toDF("id_a", "id_b", "hamming")
          (normal, Some(hp))
        }
      }
    val normalPairs = bandRows.as("l").join(bandRows.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.__id") < col("r.__id"))
      .select(col("l.__id").as("id_a"), col("r.__id").as("id_b"),
        hamming(col("l.simhash"), col("r.simhash")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
    // both routes compute the same integer hamming; distinct over the
    // (filtered, output-sized) union dedupes multi-bucket collisions
    hotPairs.map(hp => normalPairs.unionAll(hp)).getOrElse(normalPairs)
      .distinct()
  }

  /** Cosine similarity of two double-array columns (Catalyst HOFs). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (acc, v) => acc + v))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0d), (acc, v) => acc + v))
    dot / (na * nb)
  }

  /** Embedding-cosine near-duplicate pairs above a threshold.
    *
    * Execution shape — fully distributed, NO driver collection of the
    * corpus: (1) one typed projection L2-normalizes each vector;
    * (2) one typed pass computes `tables` sign-random-projection
    * signatures per row against the engine-portable Rademacher planes
    * ([[Ann.planesMd5]] — md5-derived, so any engine reproduces the
    * buckets); (3) a self-join on (table, signature) over the MINIMAL
    * (id, table, sig) projection yields candidate pairs; (4) candidates
    * re-join their normalized vectors and verify with the codegen
    * `graft_dot` expression. The only shuffles are the bucket join and
    * the two verify joins on id — bucket sizes, not corpus size, bound
    * the pairwise work, which is the layout that survives a 100 TB
    * corpus (at n rows choose `bits` ≈ log2(n / targetBucketSize)).
    *
    * Recall: a pair at exactly the threshold angle can miss every table
    * (p_miss = (1 - (1-θ/π)^bits)^tables ≈ 1.2% at cos 0.95 with the
    * defaults); identical-direction duplicates (cos = 1) are ALWAYS
    * found — every plane agrees, so they share every bucket.
    *
    * @param maxBucketSize route (table, sig) buckets larger than this
    *        to the salted sub-bucket join with INLINE dot verification —
    *        same skew-split as [[minhashLsh]]. A mega-cluster corpus
    *        (SCALE.md finding 1) puts whole clusters in single buckets;
    *        the salted route keeps the exact uncapped pair set while
    *        bounding every task and skipping the candidate-distinct +
    *        vector-re-join shuffle that the hot mass would otherwise
    *        pay twice. Identical results at any setting. */
  def cosineNearDups(df: DataFrame, idCol: String, vecCol: String,
                     threshold: Double, tables: Int = 8, bits: Int = 8,
                     maxBucketSize: Int = DefaultVectorBucketSize): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // typed normalize kernel (the HOF normalized() evaluates interpreted);
    // null vectors can't pair — excluded rather than NPE-ing the job
    val v = df.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
      .map { case (id, a) =>
        var s = 0.0
        var i = 0
        while (i < a.length) { s += a(i) * a(i); i += 1 }
        val nrm = math.sqrt(s)
        val out = new Array[Double](a.length)
        i = 0
        while (i < a.length) { out(i) = a(i) / nrm; i += 1 }
        (id, out)
      }
      .toDF("__id", "nv")
      // consumed by the bucket pass and both verify joins; GC-freed
      .localCheckpoint(false)
    // empty corpus (or all-null vectors): no pairs — return the empty
    // frame instead of failing head() on a zero-row dimension probe
    val dimRow = v.select(size(col("nv"))).limit(1).collect()
    if (dimRow.isEmpty)
      return spark.emptyDataFrame
        .select(lit(0L).as("id_a"), lit(0L).as("id_b"), lit(0.0).as("cos"))
    val dim = dimRow(0).getInt(0)
    val bcP = spark.sparkContext.broadcast(Ann.planesMd5(dim, tables, bits))
    // minimal (id, table, sig) band rows — vectors never ride the bucket join
    val bandRows0 = v.as[(Long, Array[Double])].flatMap { case (id, nv) =>
      val p = bcP.value
      (0 until p.length).iterator.map { t =>
        val tp = p(t)
        var sig = 0L
        var b = 0
        while (b < tp.length) {
          val plane = tp(b)
          var d = 0.0
          var j = 0
          // min-bound: the dimension is probed from one arbitrary row, so
          // a ragged corpus (mixed vector lengths) must truncate, not AIOOBE
          val n = math.min(nv.length, plane.length)
          while (j < n) { d += nv(j) * plane(j); j += 1 }
          if (d > 0) sig |= (1L << b)
          b += 1
        }
        (id, t, sig)
      }
    }.toDF("__id", "table", "sig")
    val (bandRows, hotPairs) =
      if (maxBucketSize == Int.MaxValue) (bandRows0, None)
      else {
        val (normal, hot, s) = splitHotBuckets(bandRows0.localCheckpoint(false),
          Seq("table", "sig"), maxBucketSize, "cosineNearDups",
          subBucketRows = KernelSubBucketRows)
        if (s.saltedBuckets == 0) (normal, None)
        else {
          // hot buckets: grouped typed kernel. A join formulation pays
          // SMJ group buffering + UnsafeArrayData access PER PAIR
          // (measured ~1.5 us/pair at sf1 — the 268 s cliff of SCALE.md
          // finding 1 was exactly this shape); the kernel instead ships
          // each hot row's vector ONCE (role = both) for buckets up to
          // KernelSubBucketRows, runs a primitive double[] nested loop
          // per bucket, and emits only surviving pairs — no candidate
          // distinct, no vector re-join, no per-pair row machinery.
          // Only gargantuan buckets (> KernelSubBucketRows) grid-salt
          // into (saltL, saltR) cells — 2 x nsalt vector copies — so
          // one bucket can neither OOM a task (group memory <=
          // 2 x KernelSubBucketRows vectors) nor serialize the stage
          // behind a single quadratic straggler. The kernel loop
          // reproduces DotProduct's codegen exactly (min-length,
          // sequential sum), so the doubles bit-match the normal path.
          val hv = hot.join(v, "__id")
            .select(col("table"), col("sig"), col("__nsalt"),
              col("__id"), col("nv"))
            .as[(Int, Long, Int, Long, Array[Double])]
          // role: 0 = left, 1 = right, 2 = both (single-cell buckets)
          val tagged = hv.flatMap { case (t, sig, nsalt, id, nv) =>
            if (nsalt <= 1) Iterator.single((t, sig, 0, 0, 2.toByte, id, nv))
            else {
              val own = java.lang.Math.floorMod(
                scala.util.hashing.byteswap64(id), nsalt.toLong).toInt
              // left role in every (own, j) cell; right role in every
              // (i, own) cell — each unordered pair meets in exactly one
              // cell with the smaller id in the left role; the diagonal
              // (own, own) cell gets one dual-role copy, not two
              (0 until nsalt).iterator.flatMap { o =>
                if (o == own) Iterator((t, sig, own, own, 2.toByte, id, nv))
                else Iterator((t, sig, own, o, 0.toByte, id, nv),
                  (t, sig, o, own, 1.toByte, id, nv))
              }
            }
          }
          val hp = tagged
            .groupByKey(e => (e._1, e._2, e._3, e._4))
            .flatMapGroups { (_, it) =>
              // imperative buffers: at ~1e9+ pairs per degenerate corpus,
              // per-pair Iterator/closure allocation is the cost, so the
              // pair loop below is while-loops over primitive-indexed
              // buffers. sqrtTail = sqrt of the vector's second-half
              // energy, precomputed once per entry for the early exit.
              val lids = scala.collection.mutable.ArrayBuffer.empty[Long]
              val lvec = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
              val ltl = scala.collection.mutable.ArrayBuffer.empty[Double]
              val rids = scala.collection.mutable.ArrayBuffer.empty[Long]
              val rvec = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
              val rtl = scala.collection.mutable.ArrayBuffer.empty[Double]
              it.foreach { e =>
                val nv = e._7
                var t = 0.0
                var i = nv.length >> 1
                while (i < nv.length) { t += nv(i) * nv(i); i += 1 }
                val st = math.sqrt(t)
                if (e._5 != 1.toByte) { lids += e._6; lvec += nv; ltl += st }
                if (e._5 != 0.toByte) { rids += e._6; rvec += nv; rtl += st }
              }
              val out = scala.collection.mutable.ArrayBuffer
                .empty[(Long, Long, Double)]
              var x = 0
              while (x < lids.length) {
                val ida = lids(x); val va = lvec(x); val sa = ltl(x)
                var y = 0
                while (y < rids.length) {
                  val idb = rids(y)
                  if (ida < idb) {
                    val vb = rvec(y)
                    val n = math.min(va.length, vb.length)
                    var d = 0.0
                    var i = 0
                    if (va.length == vb.length) {
                      // half-point Cauchy–Schwarz exit: the second half
                      // contributes at most sa*sb, so a pair whose bound
                      // (+1e-9 rounding fuzz) misses the threshold is a
                      // guaranteed reject — rejects dominate a hot
                      // bucket, and they skip half the multiplies. A
                      // surviving pair continues the SAME sequential
                      // accumulation, so accepted doubles are untouched.
                      val h = n >> 1
                      while (i < h) { d += va(i) * vb(i); i += 1 }
                      if (d + sa * rtl(y) + 1e-9 >= threshold) {
                        while (i < n) { d += va(i) * vb(i); i += 1 }
                        if (d >= threshold) out += ((ida, idb, d))
                      }
                    } else {
                      // ragged pair (documented truncate semantics): the
                      // per-vector tail energies don't cover [n/2, n) —
                      // take the plain full loop
                      while (i < n) { d += va(i) * vb(i); i += 1 }
                      if (d >= threshold) out += ((ida, idb, d))
                    }
                  }
                  y += 1
                }
                x += 1
              }
              out.iterator
            }
            .toDF("id_a", "id_b", "cos")
          (normal, Some(hp))
        }
      }
    // the cosine chain keeps the plain shuffle joins: in the clustered
    // regime most candidate mass routes through the hot-bucket kernel,
    // so the normal path's vector shuffle is small and the broadcast
    // variant only added a blocking count + double corpus scan
    // (measured 22% slower at sf1 — the minhash chain is where the
    // broadcast lookup wins, see minhashPairsFromSets)
    val cands = bandRows.as("l")
      .join(bandRows.as("r"),
        col("l.table") === col("r.table") && col("l.sig") === col("r.sig") &&
          col("l.__id") < col("r.__id"))
      .select(col("l.__id").as("id_a"), col("r.__id").as("id_b"))
      .distinct()
    val normalPairs = cands
      .join(v.select(col("__id").as("id_a"), col("nv").as("nv_a")), "id_a")
      .join(v.select(col("__id").as("id_b"), col("nv").as("nv_b")), "id_b")
      .withColumn("cos",
        graft.functions.GraftFunctions.dot(spark, col("nv_a"), col("nv_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
    // both routes run the same codegen dot over the same normalized
    // vectors, so the doubles agree and a distinct over the
    // (output-sized) union dedupes multi-bucket collisions
    hotPairs.map(hp => normalPairs.unionAll(hp).distinct())
      .getOrElse(normalPairs)
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication by k-means clustering + within-cluster cosine.
    *
    * The caller supplies the centroids (train them with the bounded
    * driver-side sample recipe — see [[Ann.ivfTopK]] — or pass any fixed
    * quantizer; an explicit centroid table keeps the operator
    * deterministic and lets the DuckDB oracle replicate the whole chain).
    * ONE typed assignment pass computes each row's nearest centroid
    * (ascending-index argmin, strict `<`, so ties break to the lowest
    * cluster id — bit-reproducible cross-engine); the self-join is keyed
    * on the cluster id, so the pairwise cosine work is bounded by
    * cluster sizes, never corpus size — the same quadratic-work bound as
    * the LSH bucket joins, with `maxClusterSize` as the degenerate-
    * cluster escape hatch. Emits (cluster, id_a, id_b, cos) for pairs at
    * or above `threshold`; feed the pairs to [[connectedComponents]] for
    * keep-one-per-group dedup. */
  def semDedup(df: DataFrame, idCol: String, vecCol: String,
               centroids: Array[Array[Double]], threshold: Double,
               maxClusterSize: Int = Int.MaxValue): DataFrame = {
    require(centroids.nonEmpty, "centroids must be non-empty")
    val spark = df.sparkSession
    import spark.implicits._
    val bcC = spark.sparkContext.broadcast(centroids)
    val assigned0 = df.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
      .map { case (id, v) => (id, v, Ann.nearestCell(v, bcC.value)) }
      .toDF("__id", "v", "cluster")
      // consumed by both sides of the self-join (and the size cap)
      .localCheckpoint(false)
    val assigned =
      if (maxClusterSize == Int.MaxValue) assigned0
      else {
        val ok = assigned0.groupBy(col("cluster"))
          .agg(count(lit(1)).as("sz"))
          .filter(col("sz") <= maxClusterSize)
          .select(col("cluster"))
        assigned0.join(ok, Seq("cluster"), "left_semi")
      }
    assigned.as("l").join(assigned.as("r"),
        col("l.cluster") === col("r.cluster") && col("l.__id") < col("r.__id"))
      .withColumn("cos",
        graft.functions.GraftFunctions.cosine(spark, col("l.v"), col("r.v")))
      .filter(col("cos") >= threshold)
      .select(col("l.cluster").as("cluster"), col("l.__id").as("id_a"),
        col("r.__id").as("id_b"), col("cos"))
  }

  /** L2-normalize a double-array column (expression-level, one pass). */
  def normalized(v: Column): Column = {
    val nrm = sqrt(aggregate(transform(v, x => x * x), lit(0.0d), (a, x) => a + x))
    transform(v, x => x / nrm)
  }

  /** Connected components over a near-duplicate pair list: every node
    * gets the MINIMUM id reachable from it as its cluster id — the step
    * that turns pairwise near-dup evidence ((a,b), (b,c)) into dedup
    * groups ({a,b,c} keep a).
    *
    * Iterative min-label propagation: each round joins the edge list to
    * the current labels and takes the per-node minimum neighbor label;
    * converges in O(component diameter) rounds (near-dup components are
    * shallow — pairs/chains — so 2-4 rounds in practice; a 100 TB run
    * with deep components would switch to the large-star/small-star
    * contraction, same join primitive, O(log n) rounds). Each round is
    * one shuffle on node id; labels are checkpoint-cached so lineage
    * stays flat. Graphs at or under `maxLocalEdges` skip the loop
    * entirely for a driver union-find (bounded collect, identical
    * labels) — per-round job latency dwarfs the actual work there.
    *
    * Returns (id, cluster_id) for every node appearing in `pairs`. */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 50,
                          maxLocalEdges: Long = 1L << 20): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    // eager localCheckpoint: materializes AND truncates lineage — without
    // it every action below re-analyzes the full upstream plan (e.g. the
    // whole minhash pipeline), and planning overhead dwarfs the work
    // null endpoints are dropped up front so BOTH paths below see the
    // same edge set (the distributed joins would silently drop null
    // keys; the driver union-find would NPE on getLong)
    val p = pairs.select(col(aCol).cast("long").as("src"),
      col(bCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .localCheckpoint(true)
    // Small-graph fast path: below an EXPLICIT pair bound (default 2^20
    // pairs = 16 MB of longs — the same bounded-collect budget as the
    // ANN training sample), solve with driver union-find: identical
    // labels (min id per component), two jobs total instead of
    // 3-4 shuffle jobs PER ROUND. The size gate is a count() on the
    // already-checkpointed blocks (~free, no row transfer), so a
    // 100 TB pair graph pays no wasted collect before taking the
    // distributed loop below — the cutover is a size check, not a
    // semantic change.
    if (p.count() <= maxLocalEdges) {
      val probe = p.collect()
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x // path compression
        while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      probe.foreach { row =>
        val a = row.getLong(0); val b = row.getLong(1)
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { // union by min id keeps the label = component min
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
      val out = parent.keysIterator.map(id => (id, find(id))).toSeq
      return spark.createDataset(out).toDF("id", "cluster_id")
    }
    val edges = p.unionAll(p.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(true)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val prop = edges.join(labels, col("src") === col("id"))
        .groupBy(col("dst").as("pid")).agg(min(col("label")).as("plabel"))
      // labels only ever DECREASE, so "changed" falls out of the same
      // projection — no extra prev-vs-next join per round
      val stepped = labels.join(prop, col("id") === col("pid"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("plabel"), col("label"))).as("label"),
          (coalesce(col("plabel"), col("label")) < col("label")).as("chg"))
      // pointer jump (label <- label(label)): halves the remaining path
      // each round, so chains converge in O(log diameter) rounds instead
      // of O(diameter)
      val jumped = stepped.as("a")
        .join(stepped.select(col("id").as("jid"), col("label").as("jlabel")),
          col("a.label") === col("jid"), "left")
        .select(col("a.id").as("id"),
          least(col("a.label"), coalesce(col("jlabel"), col("a.label"))).as("label"),
          (col("a.chg") ||
            coalesce(col("jlabel"), col("a.label")) < col("a.label")).as("chg"))
      // convergence check piggy-backs on the checkpoint materialization
      // job via an accumulator — no separate count() action per round
      // (task retries can only over-count, and only zero-vs-nonzero is
      // read, so the check stays sound)
      val acc = spark.sparkContext.longAccumulator("graft.cc.changed")
      val next = jumped.as[(Long, Long, Boolean)]
        .map { t => if (t._3) acc.add(1L); (t._1, t._2) }
        .toDF("id", "label")
        .localCheckpoint(true)
      changed = acc.value
      labels = next
      iter += 1
    }
    labels.select(col("id"), col("label").as("cluster_id"))
  }

  /** Connected components by LARGE-STAR/SMALL-STAR contraction (Kiveris
    * et al. 2014, "Connected Components in MapReduce and Beyond") — the
    * deep-component escalation path [[connectedComponents]]'s doc
    * promises: label propagation converges in O(log diameter) rounds
    * WITH pointer jumping, but its per-round work is the full edge
    * list; star contraction instead rewires edges toward component
    * minima so the edge set itself flattens, converging in O(log n)
    * alternations on ANY topology (chains, expanders, lollipops) with
    * the SAME join-groupBy primitive per round.
    *
    * One alternation: large-star connects every neighbor v > u to
    * m(u) = min(Γ(u) ∪ {u}) (grouped over the symmetrized edge list);
    * small-star connects every neighbor v < u, and u itself, to the
    * minimum such neighbor (grouped over hi→lo oriented edges). Both
    * preserve connectivity and the component minimum; the fixed point
    * is a star forest rooted at each component's min id. Convergence
    * is detected by edge-set equality (one anti-join on the edge key —
    * same shuffle class as the round itself). Each round ends in an
    * eager localCheckpoint (the [[connectedComponents]] rationale).
    *
    * Returns (id, cluster_id) for every node appearing in `pairs` —
    * label-identical to [[connectedComponents]] (min reachable id),
    * self-loop-only nodes included. */
  def connectedComponentsStar(pairs: DataFrame, aCol: String, bCol: String,
                              maxIter: Int = 50,
                              maxLocalEdges: Long = 1L << 20): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val p0 = pairs.select(col(aCol).cast("long").as("u"),
        col(bCol).cast("long").as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull)
      .localCheckpoint(true)
    // Small-graph fast path (optimization round 19): the star
    // contraction's CONTRACT is label-equality with
    // [[connectedComponents]] (min reachable id per node — the same
    // reachability oracle verifies both), so below the same explicit
    // pair bound the same driver union-find produces the identical
    // (id, cluster_id) rows in two jobs, instead of ~5 shuffles + a
    // fingerprint aggregate + an eager checkpoint PER ALTERNATION.
    // The gate is a count() on already-checkpointed blocks — free of
    // row transfer at 100 TB, where the distributed loop below runs
    // unchanged.
    if (p0.count() <= maxLocalEdges) {
      val probe = p0.collect()
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x // path compression
        while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      probe.foreach { row =>
        val a = row.getLong(0); val b = row.getLong(1)
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { // union by min id keeps the label = component min
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
      val out = parent.keysIterator.map(id => (id, find(id))).toSeq
      return spark.createDataset(out).toDF("id", "cluster_id")
    }
    val nodes = p0.select(col("u").as("id"))
      .unionAll(p0.select(col("v").as("id"))).distinct()
      .localCheckpoint(true)
    def largeStar(ed: DataFrame): DataFrame = {
      val sym = ed.select(col("u"), col("v"))
        .unionAll(ed.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u")
        .agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      // no distinct: duplicate (v, m) edges are absorbed map-side by
      // smallStar's min-groupBy, cheaper than a dedicated shuffle here
      sym.join(mins, "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
    }
    def smallStar(ed: DataFrame): DataFrame = {
      val or = ed.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      val mins = or.groupBy("u").agg(min(col("v")).as("m")) // m < u
      val moved = or.join(mins, "u").filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
      moved.unionAll(mins.select(col("u"), col("m").as("v"))).distinct()
    }
    var e = p0.filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .distinct().localCheckpoint(true)
    // Edge-set fingerprint: (count, XOR of 64-bit row hashes) in ONE
    // aggregate job (XOR — overflow-free under ANSI, order-independent,
    // and edges are distinct so no self-cancellation). Equal
    // fingerprints gate the EXACT except() check, so equality stays
    // exact but the per-round cost is one cheap aggregate instead of
    // count + anti-join every round — the anti-join runs once, at
    // convergence (or on a hash collision).
    def sig(ed: DataFrame): (Long, Long) = {
      val r = ed.agg(count(lit(1)),
        expr("bit_xor(xxhash64(u, v))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var iter = 0
    var eSig = sig(e)
    var done = eSig._1 == 0L
    while (!done && iter < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint(true)
      val nSig = sig(next)
      done = nSig == eSig && next.except(e).isEmpty
      e = next
      eSig = nSig
      iter += 1
    }
    require(done || iter < maxIter,
      s"star contraction did not converge within $maxIter rounds")
    val starLabels = e.select(col("u").as("id"), col("v").as("label"))
    nodes.join(starLabels, Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("cluster_id"))
  }

  /** Dedup DECISION table — the operator users actually execute on:
    * cluster near-dup pairs ([[connectedComponents]]) and pick ONE
    * keeper per cluster: highest score, ties to the smallest id (a
    * deterministic tiebreak keeps the drop list stable across engines,
    * partitionings, and runs). Returns one row per clustered doc:
    * (id, cluster_id, keeper_id, keep); docs in no pair are implicit
    * keepers and are not returned. Docs missing from `scores` rank
    * below every scored doc.
    *
    * Scale shape: the component labels are the dominant cost (see
    * [[connectedComponents]]); the keeper election is one partial-
    * aggregated max-of-struct per cluster plus one key join. */
  def keeperTable(pairs: DataFrame, aCol: String, bCol: String,
                  scores: DataFrame, idCol: String,
                  scoreCol: String): DataFrame = {
    val cc = connectedComponents(pairs, aCol, bCol)
    val scored = cc.join(
        scores.select(col(idCol).cast("long").as("id"),
          col(scoreCol).cast("double").as("__s")), Seq("id"), "left")
      .withColumn("__s", coalesce(col("__s"), lit(Double.MinValue)))
    val keepers = scored
      .groupBy(col("cluster_id"))
      .agg(max(struct(col("__s").as("s"), (-col("id")).as("negid"))).as("__m"))
      .select(col("cluster_id"), (-col("__m.negid")).as("keeper_id"))
    scored.join(keepers, Seq("cluster_id"))
      .select(col("id"), col("cluster_id"), col("keeper_id"),
        (col("id") === col("keeper_id")).as("keep"))
  }

  // ------------------------------------------------- duplicate token spans

  /** Maximal duplicated token spans across documents — EXACT
    * substring-level dedup at token-gram granularity (the suffix-array
    * substring-dedup semantics of "Deduplicating Training Data Makes
    * Language Models Better", Lee et al. 2022, expressed as a
    * shuffle-bounded join instead of a monolithic suffix array).
    *
    * Recipe: each doc emits one md5 per `gramWidth`-token window with its
    * token position; an inverted-index self-join on the gram hash yields
    * matching positions per doc pair; consecutive matches on the same
    * alignment diagonal (pos_a - pos_b) merge into maximal runs via the
    * gaps-and-islands trick; a run of c grams is a duplicated span of
    * c + gramWidth - 1 tokens. Returns
    * (id_a, id_b, start_a, start_b, span_tokens) with id_a < id_b, one
    * row per maximal span of at least `minTokens` tokens (0-based token
    * offsets).
    *
    * Scale notes (100 TB): no cross product — the only wide shuffle is
    * the gram-hash join, and `maxDf` caps the f² pair blowup of
    * corpus-wide boilerplate grams exactly like [[ngramJaccardPairs]]'s
    * cap (a dropped gram can only split or shorten reported spans of
    * boilerplate text, never invent one). The islands window partitions
    * by (pair, diagonal) — bounded by document length, never a global
    * sort. Spans detect at gram granularity: every duplicated substring
    * of >= gramWidth tokens is found exactly; shorter ones are below
    * detection by design.
    */
  def duplicateSpans(df: DataFrame, idCol: String, textCol: String,
                     minTokens: Int, gramWidth: Int = 8,
                     maxDf: Int = Int.MaxValue): DataFrame = {
    require(minTokens >= gramWidth,
      s"minTokens ($minTokens) must be >= gramWidth ($gramWidth): shorter spans are below gram detection")
    val spark = df.sparkSession
    import spark.implicits._
    import graft.functions.TextKernels.md5Hex
    val w = gramWidth
    // (id, pos, gramHash) per token window — typed kernel (reused
    // MessageDigest), not HOFs: interpreted array lambdas measured ~50x
    // slower on shingle chains (see shingleSets).
    val occ0 = df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        if (text == null) Iterator.empty
        else {
          val ws = text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
          val n = math.max(ws.length - w, 0)
          (0 to n).iterator.map { i =>
            val sb = new StringBuilder
            var o = 0
            while (o < w && i + o < ws.length) {
              if (o > 0) sb.append(' ')
              sb.append(ws(i + o))
              o += 1
            }
            (id, i, md5Hex(sb.toString))
          }
        }
      }
      .toDF("__id", "pos", "gh")
      // both sides of the self-join read this — materialize once
      .localCheckpoint(false)
    val occ =
      if (maxDf == Int.MaxValue) occ0
      else {
        val ok = occ0.groupBy(col("gh")).agg(count(lit(1)).as("f"))
          .filter(col("f") <= maxDf).select(col("gh"))
        occ0.join(ok, Seq("gh"), "left_semi")
      }
    val pairs = occ.as("a").join(occ.as("b"),
        col("a.gh") === col("b.gh") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        col("a.pos").as("pos_a"), col("b.pos").as("pos_b"))
      .withColumn("diag", col("pos_a") - col("pos_b"))
    // pos_a is unique within (pair, diag): the gram at pos_a is fixed, so
    // row_number is deterministic and pos_a - row_number marks islands
    val byDiag = org.apache.spark.sql.expressions.Window
      .partitionBy("id_a", "id_b", "diag").orderBy("pos_a")
    pairs
      .withColumn("island", col("pos_a") - row_number().over(byDiag))
      .groupBy("id_a", "id_b", "diag", "island")
      .agg(min(col("pos_a")).as("start_a"), min(col("pos_b")).as("start_b"),
        (count(lit(1)) + (w - 1)).as("span_tokens"))
      .filter(col("span_tokens") >= minTokens)
      .select("id_a", "id_b", "start_a", "start_b", "span_tokens")
  }

  /** EXACT SUBSTRING DEDUP — the removal step of Lee et al. 2022
    * (arXiv:2107.06499): every duplicated >= minTokens token run is
    * EXCISED from the LATER document (larger id) of each pair, so one
    * copy of every long substring survives corpus-wide. Overlapping
    * spans union per document; documents whose every token is covered
    * come back with NULL text (the [[paragraphDedup]] convention).
    * Tokenization is [[words]] (lowercased \s+ split), matching span
    * detection, so positions align exactly; the rebuilt text is
    * therefore lowercase-normalized. Cross-document spans only —
    * within-document repeats are repetition-filter territory.
    *
    * Output: (id, n_tokens, n_kept, text).
    *
    * Shape: [[duplicateSpans]] (inverted gram join, per-(pair,
    * diagonal) windows) → spans explode to covered positions (volume =
    * total duplicated tokens, corpus-bounded) → one left_anti join
    * against the token table → per-document ordered rebuild (state
    * bounded by single-document size). */
  def removeDuplicateSpans(df: DataFrame, idCol: String, textCol: String,
                           minTokens: Int, gramWidth: Int = 8,
                           maxDf: Int = Int.MaxValue): DataFrame = {
    val spans = duplicateSpans(df, idCol, textCol, minTokens, gramWidth, maxDf)
    val drop = spans.select(col("id_b").as("__id"),
        explode(sequence(col("start_b").cast("long"),
          col("start_b").cast("long") + col("span_tokens") - 1)).as("pos"))
      .select(col("__id"), col("pos").cast("int").as("pos"))
      .distinct()
    val toks = df.select(col(idCol).cast("long").as("__id"),
      posexplode(words(col(textCol))).as(Seq("pos", "__w")))
    val kept = toks.join(drop, Seq("__id", "pos"), "left_anti")
    val rebuilt = kept.groupBy("__id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("__w")))),
          s => s.getField("__w")), " ").as("text"))
    toks.groupBy("__id").agg(count(lit(1)).as("n_tokens"))
      .join(rebuilt, Seq("__id"), "left")
      .select(col("__id").as(idCol), col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"), col("text"))
  }

  // ---------------------------------------------- corpus-level sketches

  /** k-slot MinHash sketch of an ENTIRE corpus: one row per hash slot
    * s ∈ [0, k) with `sig` = min over every w-shingle in the corpus of
    * md5(s|shingle) — the same portable hash family as
    * [[minhashSignature]], aggregated corpus-wide instead of per-doc.
    *
    * Because slot-wise min is associative and commutative, the sketch
    * of a union of corpora is the slot-wise min of their sketches —
    * snapshots sketch once and compare forever, and incremental
    * batches fold in without rescanning history. The fraction of equal
    * slots between two sketches is an unbiased estimate of the shingle-
    * set Jaccard similarity ([[sketchSimilarity]]) — "how much did the
    * crawl actually change" for the cost of k cells per snapshot.
    *
    * Shape (100 TB): the k signature columns compute per-row inside
    * one narrow projection (no row fan-out), then ONE map-side-combined
    * global min per column reduces the corpus to a single row,
    * unpivoted to (s, sig). Nothing but k strings ever leaves the
    * combiner. */
  def corpusSketch(df: DataFrame, textCol: String, k: Int = 64,
                   w: Int = 3): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    // typed kernel, NOT the k-column HOF projection: interpreted
    // ArrayTransform re-evaluates the whole shingle build per
    // signature column (~0.16 s/doc at k=64 — a bench-measured 10-min
    // stall on a 5k-doc corpus); the kernel keeps a k-cell running
    // min per PARTITION, so the aggregation input is one k-array per
    // partition, not per row
    val kk = k; val ww = w
    // the kernel has NO downstream shuffle, so its parallelism IS the
    // input partitioning: a single-file demo corpus would run one-core.
    // Spread thin inputs to the session's parallelism (min is
    // commutative — the result cannot change); wide inputs (the 100 TB
    // case) pass through untouched.
    val texts = df.select(col(textCol).cast("string"))
    val par = df.sparkSession.sparkContext.defaultParallelism
    val spread =
      if (texts.rdd.getNumPartitions < par) texts.repartition(par) else texts
    val partMins = spread.as[String]
      .mapPartitions { it =>
        val utf8 = java.nio.charset.StandardCharsets.UTF_8
        val prefixes = Array.tabulate(kk)(s => (s.toString + "|").getBytes(utf8))
        // per-slot RAW digest mins across the whole partition — hex
        // order == unsigned byte order (md5Into), encode once at the end
        val minBytes = new Array[Array[Byte]](kk)
        val scratch = new Array[Byte](16)
        it.foreach { text =>
          if (text != null) {
            val ws = text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
            val n = math.max(ws.length - ww, 0)
            val grams = new java.util.LinkedHashSet[String]()
            var i = 0
            while (i <= n) {
              val sb = new StringBuilder
              var o = 0
              while (o < ww && i + o < ws.length) {
                if (o > 0) sb.append(' ')
                sb.append(ws(i + o))
                o += 1
              }
              grams.add(sb.toString)
              i += 1
            }
            val sh = grams.toArray(Array.empty[String])
            val gramBytes = sh.map(_.getBytes(utf8))
            var s = 0
            while (s < kk) {
              var gi = 0
              while (gi < gramBytes.length) {
                graft.functions.TextKernels.md5Into(
                  prefixes(s), gramBytes(gi), scratch)
                if (minBytes(s) == null ||
                    java.util.Arrays.compareUnsigned(scratch, minBytes(s)) < 0)
                  minBytes(s) = scratch.clone()
                gi += 1
              }
              s += 1
            }
          }
        }
        Iterator.single(minBytes.toSeq.map(b =>
          if (b == null) null else graft.functions.TextKernels.hexOf(b)))
      }
    // one k-row reduction folds the per-partition mins (empty corpus →
    // k rows with null sig, matching the previous aggregate's shape)
    partMins.toDF("mins")
      .select(posexplode(col("mins")))
      .select(col("pos").cast("long").as("s"), col("col").as("sig"))
      .groupBy(col("s"))
      .agg(min(col("sig")).as("sig"))
  }

  /** Fold corpus sketches: slot-wise min across any number of
    * [[corpusSketch]] frames — sketch(A ∪ B) == mergeSketches(sketch A,
    * sketch B), so snapshots and incremental crawl batches fold in
    * k-row work. */
  def mergeSketches(sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "need at least one sketch")
    sketches.reduce(_.unionAll(_))
      .groupBy(col("s")).agg(min(col("sig")).as("sig"))
  }

  /** Jaccard estimate between two corpus sketches (equal slot count /
    * k). Returns one row: (k, n_equal, sim). Slots where either side
    * is null (an empty corpus) count as unequal. */
  def sketchSimilarity(a: DataFrame, b: DataFrame): DataFrame = {
    val j = a.select(col("s"), col("sig").as("sig_a"))
      .join(b.select(col("s"), col("sig").as("sig_b")), "s")
    j.agg(count(lit(1)).as("k"),
        sum(when(col("sig_a") === col("sig_b"), 1L).otherwise(0L)).as("n_equal"))
      .select(col("k"), col("n_equal"),
        (col("n_equal").cast("double") / col("k")).as("sim"))
  }

  /** Exact-duplicate rate per slice: which FEED is flooding the
    * corpus with copies — the triage that decides where dedup effort
    * goes before any near-dup machinery runs. One md5-key grouped
    * count per (slice, content), one slice rollup; duplicate docs =
    * every row beyond its group's first. All integral. Returns
    * (slice, n_docs, n_dup_docs, dup_ppm). */
  def dupRateBySlice(df: DataFrame, sliceCol: String,
                     textCol: String): DataFrame =
    df.filter(col(sliceCol).isNotNull && col(textCol).isNotNull)
      .groupBy(col(sliceCol).as("slice"), md5(col(textCol)).as("__h"))
      .agg(count(lit(1)).as("c"))
      .groupBy("slice")
      .agg(sum(col("c")).as("n_docs"),
        sum(col("c") - lit(1L)).as("n_dup_docs"))
      .select(col("slice"), col("n_docs"), col("n_dup_docs"),
        expr("n_dup_docs * 1000000 div n_docs").as("dup_ppm"))
      .orderBy("slice")

  /** Cross-document n-gram overlap — the "onion"-style contamination
    * signal (what fraction of a document's DISTINCT w-shingles also
    * appear in ≥ minDf documents): high overlap means the text is
    * assembled from corpus boilerplate even when no single document
    * duplicates it, the regime doc-level near-dup misses. Inverted-
    * index shape: one distinct (doc, shingle) explode, one shingle-df
    * grouped count, one join back, one per-doc rollup — corpus-linear,
    * no pair join anywhere. All-integral output (ppm by truncating
    * division; both engines floor on non-negative operands). Returns
    * (id, n_shingles, n_common, common_ppm, keep). */
  def onionOverlap(df: DataFrame, idCol: String, textCol: String,
                   w: Int = 3, minDf: Int = 2,
                   keepBelowPpm: Long = 500000L): DataFrame = {
    require(w >= 1 && minDf >= 2, "need w >= 1 and minDf >= 2")
    // typed shingle kernel, not array HOFs (the §6 round-2 lesson:
    // interpreted HOFs cost ~2.5 ms/doc and dominated this query 20:1).
    // Spread thin inputs HERE (not in shingleSets): onion scans the
    // whole corpus so the kernel dominates (bench-measured 0.78x),
    // while light shingleSets consumers (containment on a doc slice)
    // lose to the exchange overhead.
    val sh = shingleSets(Spread.thin(df.filter(col(textCol).isNotNull)),
        idCol, textCol, w)
      .toDF("id", "sh")
      .select(col("id"), explode(col("sh")).as("g"))
    val dfreq = sh.groupBy("g").agg(count(lit(1)).as("df"))
    sh.join(dfreq, "g")
      .groupBy("id")
      .agg(count(lit(1)).as("n_shingles"),
        sum((col("df") >= minDf).cast("long")).as("n_common"))
      .select(col("id"), col("n_shingles"), col("n_common"),
        expr("n_common * 1000000 div n_shingles").as("common_ppm"))
      .withColumn("keep", col("common_ppm") < lit(keepBelowPpm))
  }

  /** Lincoln–Petersen capture–recapture estimate of the TRUE
    * duplicate-pair population from two INDEPENDENT detectors'
    * catches (e.g. minhash vs simhash): if detector 1 catches n₁
    * pairs, detector 2 catches n₂, and m pairs appear in both, the
    * bias-corrected Chapman estimate of the total is
    * (n₁+1)(n₂+1)/(m+1) − 1 — the only way to audit dedup RECALL
    * without labeled truth. Orientation-normalized distinct pair
    * sets; one inner join for the overlap; all-integral output with
    * per-detector coverage ppm against the estimate. Returns
    * (n_1, n_2, overlap, chapman_est, coverage_1_ppm,
    * coverage_2_ppm). */
  def captureRecapture(a: DataFrame, b: DataFrame,
                       aCol: String = "id_a",
                       bCol: String = "id_b"): DataFrame = {
    val spark = a.sparkSession
    import spark.implicits._
    def norm(df: DataFrame) = df.select(
        least(col(aCol), col(bCol)).as("x"),
        greatest(col(aCol), col(bCol)).as("y"))
      .filter(col("x") =!= col("y")).distinct()
    val ca = norm(a).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cb = norm(b).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n1 = ca.count(); val n2 = cb.count()
      val m = ca.join(cb, Seq("x", "y")).count()
      val chapman = (BigInt(n1 + 1) * BigInt(n2 + 1) / BigInt(m + 1) - 1).toLong
      val c1 = if (chapman > 0) n1 * 1000000L / chapman else 0L
      val c2 = if (chapman > 0) n2 * 1000000L / chapman else 0L
      Seq((n1, n2, m, chapman, c1, c2))
        .toDF("n_1", "n_2", "overlap", "chapman_est",
          "coverage_1_ppm", "coverage_2_ppm")
    } finally { ca.unpersist(false); cb.unpersist(false); () }
  }

  /** One fused per-row kernel for the dual-detector audit: ONE
    * trim/lower/whitespace-split of the text feeds BOTH the minhash
    * chain (distinct w-gram set, per-seed md5 min-signature, band
    * buckets — byte-identical to [[shingleSetsWithBuckets]]) and the
    * simhash chain (per-word md5-top-64 bit votes with the Zipf memo —
    * byte-identical to [[simhash]]). Halves the corpus scan + split
    * work the two standalone detectors would spend. */
  private[graft] def shingleBucketSimhashSets(df: DataFrame, idCol: String,
      textCol: String, w: Int, bands: Int, rowsPerBand: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import graft.functions.TextKernels.md5Hex
    val numHashes = bands * rowsPerBand
    // spread thin inputs MODESTLY: the per-(seed, gram) md5 loop is the
    // dominant CPU cost of the LSH pipeline and inherits the scan
    // partitioning, but the kernel output is re-scanned by several
    // downstream stages, so full-parallelism spreading floods them with
    // tiny tasks (bench-measured net loss at 32) — 8 buys most of the
    // kernel speedup at a quarter of the stage overhead (no-op at scale)
    Spread.thin(df.select(col(idCol).cast("long"), col(textCol)),
        target = math.min(df.sparkSession.sparkContext.defaultParallelism, 8))
      .as[(Long, String)]
      .mapPartitions { it =>
        val wsPat = java.util.regex.Pattern.compile("\\s+")
        val memo = new java.util.HashMap[String, java.lang.Long](1 << 12)
        val utf8 = java.nio.charset.StandardCharsets.UTF_8
        val prefixes = Array.tabulate(numHashes)(s => (s.toString + "|").getBytes(utf8))
        val scratch = new Array[Byte](16)
        val minBuf = new Array[Byte](16)
        it.map { case (id, text) =>
          if (text == null)
            (id, Array.empty[String], Array.empty[String], 0L)
          else {
            val ws = wsPat.split(text.trim.toLowerCase(java.util.Locale.ROOT))
            // --- simhash votes over the SAME token stream
            val votes = new Array[Int](64)
            ws.foreach { word =>
              var boxed = memo.get(word)
              if (boxed == null) {
                boxed = graft.functions.TextKernels.md5Long(word)
                if (memo.size < (1 << 16)) memo.put(word, boxed)
              }
              val h = boxed.longValue
              var b = 0
              while (b < 64) {
                if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
                b += 1
              }
            }
            var packed = 0L
            var b0 = 0
            while (b0 < 64) { if (votes(b0) > 0) packed |= (1L << b0); b0 += 1 }
            // --- minhash shingles / signature / buckets
            val n = math.max(ws.length - w, 0)
            val grams = new java.util.LinkedHashSet[String]()
            var i = 0
            while (i <= n) {
              val sb = new StringBuilder
              var o = 0
              while (o < w && i + o < ws.length) {
                if (o > 0) sb.append(' ')
                sb.append(ws(i + o))
                o += 1
              }
              grams.add(sb.toString)
              i += 1
            }
            val sh = grams.toArray(Array.empty[String])
            val gramBytes = new Array[Array[Byte]](sh.length)
            var gi = 0
            while (gi < sh.length) { gramBytes(gi) = sh(gi).getBytes(utf8); gi += 1 }
            val sig = new Array[String](numHashes)
            var s = 0
            while (s < numHashes) {
              var have = false
              gi = 0
              while (gi < sh.length) {
                graft.functions.TextKernels.md5Into(prefixes(s), gramBytes(gi), scratch)
                if (!have ||
                    java.util.Arrays.compareUnsigned(scratch, minBuf) < 0) {
                  System.arraycopy(scratch, 0, minBuf, 0, 16)
                  have = true
                }
                gi += 1
              }
              sig(s) = if (have) graft.functions.TextKernels.hexOf(minBuf) else null
              s += 1
            }
            val buckets = new Array[String](if (sh.isEmpty) 0 else bands)
            var b = 0
            while (b < buckets.length) {
              val sb = new StringBuilder
              var r = 0
              while (r < rowsPerBand) {
                if (r > 0) sb.append(',')
                sb.append(sig(b * rowsPerBand + r))
                r += 1
              }
              buckets(b) = md5Hex(sb.toString)
              b += 1
            }
            (id, sh, buckets, packed)
          }
        }
      }
      .toDF("__id", "sh", "buckets", "simhash")
  }

  /** [[captureRecapture]] directly from text, running BOTH detectors
    * (minhash LSH and simhash banding) off ONE shared tokenization/
    * shingle kernel pass — the two standalone calls would scan and
    * re-split the corpus twice for detectors that agree on the token
    * stream. Pair sets are bit-identical to the standalone
    * [[minhashLsh]] / [[simhashPairs]] calls (spec-pinned). */
  def captureRecaptureFromText(df: DataFrame, idCol: String, textCol: String,
      bands: Int = 4, rowsPerBand: Int = 3, threshold: Double = 0.6,
      shingleWidth: Int = 3, maxHamming: Int = 3,
      maxBucketSize: Int = DefaultMaxBucketSize,
      simhashBucketSize: Int = DefaultSimhashBucketSize): DataFrame = {
    val sets = shingleBucketSimhashSets(df, idCol, textCol, shingleWidth,
      bands, rowsPerBand).localCheckpoint(false)
    val (mh, _) = minhashPairsFromSets(sets.select("__id", "sh", "buckets"),
      threshold, maxBucketSize)
    val sp = simhashPairsFromHashes(sets.select(col("__id"), col("simhash")),
      "__id", maxHamming, simhashBucketSize)
    captureRecapture(mh, sp)
  }

  /** Golden-record survivorship merge: one consolidated row per
    * near-dup cluster with FIELD-LEVEL survivorship rules — the MDM
    * step after clustering: representative id = min id (stable),
    * longest length survives, and the modal categorical value wins
    * with a deterministic (count desc, value asc) tiebreak. Docs
    * absent from the label table are their own singleton clusters.
    * One left join + two grouped aggregations + one keyed
    * WindowGroupLimit for the mode. Returns (cluster_id, rep_id,
    * n_docs, max_len, mode_cat). */
  def goldenRecord(docs: DataFrame, idCol: String, lenCol: String,
                   catCol: String, labels: DataFrame, labelIdCol: String,
                   clusterCol: String): DataFrame = {
    val labeled = docs
      .join(labels.select(col(labelIdCol).as("__id"), col(clusterCol)),
        col(idCol) === col("__id"), "left")
      .select(coalesce(col(clusterCol), col(idCol)).as("cluster_id"),
        col(idCol).as("__doc"), col(lenCol).as("__len"), col(catCol).as("__cat"))
      .localCheckpoint(false) // base aggregate + mode pass reuse
    val base = labeled.groupBy("cluster_id")
      .agg(min(col("__doc")).as("rep_id"), count(lit(1)).as("n_docs"),
        max(col("__len")).as("max_len"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id"))
      .orderBy(desc("__cnt"), col("__cat"))
    val mode = labeled.filter(col("__cat").isNotNull)
      .groupBy(col("cluster_id"), col("__cat"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("cluster_id"), col("__cat").as("mode_cat"))
    base.join(mode, Seq("cluster_id"), "left")
      .orderBy("cluster_id")
  }

  /** Cluster-size distribution of a labeling (the output of
    * [[connectedComponents]] / [[connectedComponentsStar]]): how many
    * clusters of each size exist and how many documents they hold —
    * the "is my dedup graph a few mega-clusters or many pairs" health
    * check that decides keeper policy and cap settings. Two grouped
    * counts; all integral. Returns (size, n_clusters, n_docs). */
  /** Cluster-size-downweighted sampling (the "keep duplicates with
    * probability 1/cluster-size" reweighting): every document joins
    * its near-dup cluster size (absent → singleton, size 1) and
    * survives a DIVISION-FREE deterministic Bernoulli test
    * `knuth(id) · size < 2³¹` — expected one representative's worth
    * of mass per cluster without the hard keeper cut, preserving
    * intra-cluster diversity. One left join on the label table + pure
    * per-row arithmetic; engine-exact. Returns kept
    * (idCol, cluster_id, cluster_size). */
  def clusterDownweight(docs: DataFrame, idCol: String,
                        labels: DataFrame, labelIdCol: String,
                        clusterCol: String): DataFrame = {
    val sizes = labels.groupBy(col(clusterCol))
      .agg(count(lit(1)).as("cluster_size"))
    val labeled = labels.select(col(labelIdCol).as("__id"), col(clusterCol))
      .join(sizes, Seq(clusterCol))
    docs.select(col(idCol))
      .join(labeled, col(idCol) === col("__id"), "left")
      .select(col(idCol),
        coalesce(col(clusterCol), col(idCol)).as("cluster_id"),
        coalesce(col("cluster_size"), lit(1L)).as("cluster_size"))
      .filter(
        // pmod: plain % keeps the dividend's sign, so a negative id
        // would make hash*size < 2^31 vacuously true and silently
        // disable downweighting for those rows
        expr(s"pmod(pmod($idCol, 2147483648) * 2654435761, 2147483648)")
          * col("cluster_size") < lit(2147483648L))
      .orderBy(idCol)
  }

  def clusterSizes(labels: DataFrame, clusterCol: String): DataFrame =
    labels.groupBy(col(clusterCol))
      .agg(count(lit(1)).as("size"))
      .groupBy(col("size"))
      .agg(count(lit(1)).as("n_clusters"))
      .select(col("size"), col("n_clusters"),
        (col("size") * col("n_clusters")).as("n_docs"))
      .orderBy("size")

  /** OPTIMAL LSH BAND PLAN for a target Jaccard `threshold` under a
    * signature budget of `maxHashes` total hash functions: choose
    * (bands b, rows-per-band r) with b·r ≤ maxHashes minimizing the
    * weighted false-positive + false-negative area of the S-curve
    * P(candidate | jaccard s) = 1 − (1 − s^r)^b on a 1% similarity
    * grid (the datasketch `optimal_param` objective) — the planning
    * step that turns "I want 0.8-similar pairs" into [[minhashLsh]]
    * parameters instead of hand-tuning. Pure closed-form driver math
    * (no data pass); each grid term rounds to 9 dp before the exact
    * decimal sum so the argmin is engine-reproducible, ties broken by
    * (objective, b, r). Returns the S-curve of the chosen plan at 5%
    * steps: (bands, rows_per_band, n_hashes, s_pct, p_candidate). */
  def lshPlan(spark: SparkSession, threshold: Double, maxHashes: Int = 64,
              fpWeight: Double = 0.5, outDigits: Int = 6): DataFrame = {
    import spark.implicits._
    val (b, r) = lshPlanParams(threshold, maxHashes, fpWeight)
    (5 to 95 by 5).map { sp =>
      val p = lshPAt(sp.toDouble / 100.0, b, r)
      (b.toLong, r.toLong, (b * r).toLong, sp.toLong,
        BigDecimal(p).setScale(outDigits, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
    }.toDF("bands", "rows_per_band", "n_hashes", "s_pct", "p_candidate")
  }

  /** S-curve P(candidate | jaccard s) for (b, r) banding. */
  private def lshPAt(s: Double, b: Int, r: Int): Double =
    1.0 - math.pow(1.0 - math.pow(s, r), b)

  /** The (bands, rowsPerBand) argmin of the [[lshPlan]] objective —
    * shared by the plan table and the [[minhashLshWithStats]] planned
    * defaults. Pure driver math; deterministic ties (objective, b, r). */
  private[ops] def lshPlanParams(threshold: Double, maxHashes: Int,
                                 fpWeight: Double): (Int, Int) = {
    require(threshold > 0.0 && threshold < 1.0, "threshold must be in (0,1)")
    require(maxHashes >= 1, "maxHashes must be >= 1")
    val cand = for {
      b <- 1 to maxHashes
      r <- 1 to maxHashes / b
    } yield (b, r)
    val scored = cand.map { case (b, r) =>
      (lshObjective(threshold, fpWeight, b, r), b, r)
    }
    val (_, b, r) = scored.minBy { case (o, bb, rr) => (o, bb, rr) }
    (b, r)
  }

  /** [[lshPlan]] objective value of one (b, r) pair — exposed for the
    * planned-vs-fixed spec comparison. */
  private[ops] def lshObjective(threshold: Double, fpWeight: Double,
                                b: Int, r: Int): BigDecimal = {
    var sum = BigDecimal(0)
    var i = 1
    while (i <= 99) {
      val s = i.toDouble / 100.0
      val p = lshPAt(s, b, r)
      val term = if (s < threshold) fpWeight * p
      else (1.0 - fpWeight) * (1.0 - p)
      sum += BigDecimal(term).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      i += 1
    }
    sum
  }
}
