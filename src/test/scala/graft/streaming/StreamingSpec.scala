package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)

  test("stateful streaming sessionization matches the batch gap-island result") {
    implicit val sqlCtx = spark.sqlContext
    // user 1: events at 0,10,20 (one session), then 100,105 (second session),
    //         sentinel at 10000 closes it
    // user 2: events at 5, 90 (two sessions), sentinel closes the second
    val evts = Seq(
      EventAgg.Event(1L, ts(0), "a", 1.0), EventAgg.Event(1L, ts(10), "a", 2.0),
      EventAgg.Event(1L, ts(20), "a", 3.0), EventAgg.Event(1L, ts(100), "a", 4.0),
      EventAgg.Event(1L, ts(105), "a", 5.0), EventAgg.Event(1L, ts(10000), "zz", 0.0),
      EventAgg.Event(2L, ts(5), "b", 1.5), EventAgg.Event(2L, ts(90), "b", 2.5),
      EventAgg.Event(2L, ts(10000), "zz", 0.0))

    val input = MemoryStream[EventAgg.Event]
    input.addData(evts)
    val q = EventAgg.sessionizeStream(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    q.processAllAvailable()
    val streamed = spark.sql(
      "select user_id, session_start, n_events, sum_value from sessions")
      .as[(Long, Timestamp, Long, Double)].collect().toSet

    val batch = EventAgg.sessionizeBatch(evts.toDF(), gapMinutes = 30)
      .select("user_id", "session_start", "n_events", "sum_value")
      .as[(Long, Timestamp, Long, Double)].collect()
    // the stream emits every session CLOSED by a later event; the sentinel
    // sessions themselves stay open in state
    val closed = batch.filterNot(_._2 == ts(10000)).toSet
    assert(streamed == closed, s"streamed=$streamed closed=$closed")

    // advance the watermark past sentinel_end + gap: the idle sentinel
    // sessions must flush via event-time timeout (and their state evict)
    input.addData(EventAgg.Event(3L, ts(12000), "c", 7.0))
    q.processAllAvailable()
    q.stop()
    val flushed = spark.sql(
      "select user_id, session_start, n_events, sum_value from sessions")
      .as[(Long, Timestamp, Long, Double)].collect().toSet
    val all = batch.toSet // every session of the original events, sentinels included
    assert(flushed == all, s"flushed=$flushed all=$all")
    assert(!flushed.exists(_._1 == 3L), "user 3's session is still open")
  }

  test("watermarked windowed aggregation finalizes windows in append mode") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val stream = input.toDF().toDF("ts", "event_type", "value")
    val q = EventAgg.windowedAggStream(stream, "1 hour", "1 hour")
      .writeStream.format("memory").queryName("winagg").outputMode("append").start()
    input.addData((ts(0), "a", 1.0), (ts(10), "a", 2.0), (ts(70), "b", 5.0))
    q.processAllAvailable()
    // advance the watermark far past the first windows
    input.addData((ts(600), "c", 0.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.sql("select event_type, n_events, sum_value from winagg")
      .as[(String, Long, Double)].collect().toSet
    assert(out.contains(("a", 2L, 3.0)), s"first-hour window finalized: $out")
    assert(out.contains(("b", 1L, 5.0)))
    assert(!out.exists(_._1 == "c"), "window still open is not emitted")
  }

  test("streaming dedup drops duplicate keys within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val stream = input.toDF().toDF("ts", "event_id", "value")
    val q = EventAgg.dedupStream(stream, Seq("event_id"), "10 minutes")
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    input.addData((ts(0), 1L, 1.0), (ts(1), 1L, 2.0), (ts(2), 2L, 3.0),
      (ts(3), 2L, 4.0), (ts(4), 3L, 5.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.sql("select event_id from dedup_out")
      .as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 2L, 3L), s"one row per key: ${out.toSeq}")
  }

  test("streaming near-dup detection matches batch simhash pairing") {
    implicit val sqlCtx = spark.sqlContext
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val b = "completely different content about spark catalyst optimizer rules engine"
    val input = MemoryStream[StreamDedup.Doc]
    val q = StreamDedup.nearDupStream(input.toDS(), maxHamming = 6)
      .writeStream.format("memory").queryName("neardups").outputMode("append").start()
    input.addData(
      StreamDedup.Doc(1L, ts(0), a),
      StreamDedup.Doc(2L, ts(1), b))
    q.processAllAvailable()
    // an exact dup of doc 1 arrives later -> must hit doc 1, not doc 2
    input.addData(StreamDedup.Doc(3L, ts(2), a))
    q.processAllAvailable()
    q.stop()
    val hits = spark.sql("select doc_id, dup_of, hamming from neardups")
      .as[(Long, Long, Int)].collect().toSet
    assert(hits == Set((3L, 1L, 0)), s"hits=$hits")
    // kernel equals the batch operator's simhash
    val batch = graft.ops.Dedup.simhash(
      Seq((1L, a)).toDF("doc_id", "text"), "doc_id", "text")
      .head.getLong(1)
    assert(batch == StreamDedup.simhash64(a))
  }

  test("streaming incremental dedup: foreachBatch probes the static minhash index") {
    // the continuous-ingest shape: a STATIC signature-sized index of the
    // historical corpus, each arriving micro-batch probed against it via
    // the batch operator inside foreachBatch — identical semantics to
    // the batch probe by construction, demonstrated end-to-end here
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "completely different content about spark catalyst optimizer rules engine"))
      .toDF("doc_id", "text")
    val index = graft.ops.Dedup.minhashIndex(corpus, "doc_id", "text")
      .localCheckpoint(true)
    val input = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= graft.ops.Dedup
          .minhashLshIncremental(index, batch, "doc_id", "text",
            minEstJaccard = 0.5)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        ()
      }
      .start()
    input.addData(
      (10L, "the quick brown fox jumps over the lazy dog again and again today"),
      (11L, "unrelated words about volcanoes and glaciers in the far north"))
    q.processAllAvailable()
    q.stop()
    assert(got.toSet == Set((10L, 1L, 1.0)), got.mkString(";"))
    // and the streaming path agrees with the direct batch probe
    val batchHits = graft.ops.Dedup.minhashLshIncremental(index,
        Seq((10L, "the quick brown fox jumps over the lazy dog again and again today"),
          (11L, "unrelated words about volcanoes and glaciers in the far north"))
          .toDF("doc_id", "text"),
        "doc_id", "text", minEstJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.toSet == batchHits)
  }

  test("stream-stream enrichment joins right events within the lookback") {
    implicit val sqlCtx = spark.sqlContext
    val lIn = MemoryStream[(Long, Timestamp, String)]
    val rIn = MemoryStream[(Long, Timestamp, Double)]
    val left = lIn.toDF().toDF("user_id", "ts", "name")
    val right = rIn.toDF().toDF("user_id", "ts", "score")
    val q = EventAgg.enrichStream(left, right, "user_id", Seq("score"),
        lookback = "30 minutes", watermark = "1 hour")
      .writeStream.format("memory").queryName("enriched").outputMode("append").start()
    // user 1: click at t=60 picks up score at t=40 (within 30m), not t=10
    lIn.addData((1L, ts(60), "a"), (2L, ts(60), "b"))
    rIn.addData((1L, ts(40), 7.0), (1L, ts(10), 3.0))
    q.processAllAvailable()
    // advance both watermarks so outer-join nulls finalize
    lIn.addData((9L, ts(500), "zz"))
    rIn.addData((9L, ts(500), 0.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.sql("select name, r_score from enriched where name in ('a','b')")
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("a") == Some(7.0), s"within-lookback match: $out")
    assert(out("b") == None, "no right rows for user 2 -> outer null")
  }

  test("stateless text-pipeline columns run identically over a stream") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and then some more words here"),
      (2L, "!!! ??? *** ###"),
      (3L, "der hund ist nicht mit der katze hier heute"))
    def pipe(df: org.apache.spark.sql.DataFrame) =
      graft.ops.TextAnalysis.qualityScore(df, "text")
        .withColumn("lang", graft.ops.TextAnalysis.langId(spark, col("text")))
        .withColumn("toks", graft.ops.TextAnalysis.wsTokenCount(col("text")))
        .select("doc_id", "quality", "lang", "toks")
    val input = MemoryStream[(Long, String)]
    input.addData(docs: _*)
    val q = pipe(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("qpipe").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getDouble(1), r.getString(2), r.getInt(3))
    val streamed = spark.sql("select * from qpipe").collect().map(key).toSet
    val batch = pipe(docs.toDF("doc_id", "text")).collect().map(key).toSet
    assert(streamed == batch, s"stream $streamed vs batch $batch")
  }

  test("watermarked streaming quantile sketch finalizes per-window medians") {
    implicit val sqlCtx = spark.sqlContext
    // window [0,60): values 1..5 (median 3); window [60,120): 10,20 (median 10
    // for the discrete sketch); sentinel far ahead closes both
    val evts = (1 to 5).map(i => EventAgg.Event(1L, ts(i * 5), "a", i.toDouble)) ++
      Seq(EventAgg.Event(1L, ts(70), "a", 10.0), EventAgg.Event(1L, ts(80), "a", 20.0),
        EventAgg.Event(1L, ts(10000), "zz", 0.0))
    val input = MemoryStream[EventAgg.Event]
    input.addData(evts)
    val agg = input.toDF().withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50"),
        count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("p50"), col("n"))
    val q = agg.writeStream.format("memory").queryName("squant")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val out = spark.sql("select ws, p50, n from squant").collect()
      .map(r => r.getTimestamp(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    // hour windows align to epoch hour boundaries, not to ts(0)
    def hourStart(m: Long) = new Timestamp(ts(m).getTime / 3600000L * 3600000L)
    assert(out(hourStart(5)) == ((3.0, 5L)), out.toString)
    assert(out(hourStart(70)) == ((10.0, 2L)), out.toString)
  }

  test("sliding-window streaming aggregation matches the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val evts = Seq(
      EventAgg.Event(1L, ts(10), "a", 1.0),   // windows starting at -45..0 min
      EventAgg.Event(1L, ts(40), "a", 2.0),
      EventAgg.Event(2L, ts(70), "b", 4.0),
      EventAgg.Event(1L, ts(10000), "zz", 0.0)) // sentinel closes everything
    val input = MemoryStream[EventAgg.Event]
    input.addData(evts)
    val q = EventAgg.slidingAggStream(input.toDF(), "1 hour", "15 minutes",
        watermark = "2 hours")
      .writeStream.format("memory").queryName("sslide").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))
    // the sentinel's own windows are still open when the stream stops —
    // compare finalized windows only
    val streamed = spark.sql("select * from sslide where event_type != 'zz'")
      .collect().map(key).toSet
    val batch = EventAgg.slidingAgg(evts.toDF(), "1 hour", "15 minutes")
      .filter(col("event_type") =!= "zz").collect().map(key).toSet
    assert(streamed == batch, s"stream $streamed\nbatch $batch")
    // every event appears in exactly len/slide = 4 windows
    val aRows = batch.filter(_._2 == "a").toSeq
    assert(aRows.map(_._3).sum == 8L, s"2 events x 4 windows: $aRows")
  }

  test("streaming funnel matches the batch funnel on in-order streams") {
    implicit val sqlCtx = spark.sqlContext
    val steps = Seq("view", "click", "purchase")
    // user 1 completes all three (split across two batches); user 2's
    // purchase precedes its click (stops at click); user 3 never views
    val batch1 = Seq(
      EventAgg.Event(1L, ts(0), "view", 0), EventAgg.Event(1L, ts(5), "click", 0),
      EventAgg.Event(2L, ts(0), "view", 0), EventAgg.Event(2L, ts(3), "purchase", 0),
      EventAgg.Event(3L, ts(1), "click", 0))
    val batch2 = Seq(
      EventAgg.Event(1L, ts(9), "purchase", 0),
      EventAgg.Event(2L, ts(8), "click", 0))
    val input = MemoryStream[EventAgg.Event]
    val q = EventAgg.funnelStream(input.toDS(), steps)
      .writeStream.format("memory").queryName("funnel").outputMode("update").start()
    input.addData(batch1); q.processAllAvailable()
    input.addData(batch2); q.processAllAvailable()
    q.stop()
    // final state per user = the last (highest-steps) update row
    val streamed = spark.sql("select * from funnel")
      .as[EventAgg.FunnelProgress].collect()
      .groupBy(_.user_id).map { case (u, rows) =>
        u -> rows.maxBy(_.steps_completed).times }
    val batchOut = graft.ops.Analytics.funnel(
        (batch1 ++ batch2).toDF(), "user_id", "ts", "event_type", steps)
      .collect().map { r =>
        r.getLong(0) -> (1 to 3).flatMap(i =>
          Option(r.getTimestamp(i)).map(t =>
            math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L))
      }.toMap
    assert(streamed == batchOut, s"streamed=$streamed batch=$batchOut")
    assert(!streamed.contains(3L), "user 3 never enters the funnel")
  }

  test("cv predictAt interpolates between path lambdas") {
    val df = SparkSpec.regressionDF(spark)
    val cv = graft.ml.CvSgdNet.fit(df, Seq("x1", "x2"), Seq("y"),
      graft.ml.SgdNetParams(alpha = 1.0, nlambda = 8), nfolds = 3)
    val out = cv.predictAt(df.limit(5), "lambda.min")
    assert(out.columns.contains("pred"))
    assert(out.count() == 5)
    val summary = cv.summaryDF(spark).collect()
    assert(summary.length == 1)
    assert(summary(0).getDouble(1) <= summary(0).getDouble(4) * (1 + 1e-12),
      "lambda_min <= lambda_1se")
  }

  test("silenceAlerts fires once per silent episode via event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventAgg.Event]
    val q = EventAgg.silenceAlerts(input.toDS(), silenceMinutes = 30,
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("silence").outputMode("append")
      .start()
    // user 1 last seen at t=0; user 2's event at t=100 advances the
    // watermark to 90 > 0 + 30 -> user 1's alert fires
    input.addData(EventAgg.Event(1L, ts(0), "a", 1.0))
    q.processAllAvailable()
    input.addData(EventAgg.Event(2L, ts(100), "a", 1.0))
    q.processAllAvailable()
    // one more advance so the engine runs a batch after the timeout
    input.addData(EventAgg.Event(2L, ts(200), "a", 1.0))
    q.processAllAvailable()
    q.stop()
    val alerts = spark.sql("select user_id, last_seen from silence")
      .as[(Long, Timestamp)].collect().toSet
    assert(alerts.contains((1L, ts(0))), alerts.mkString(";"))
    // user 1 never alerted twice for the same episode
    assert(alerts.count(_._1 == 1L) == 1)
  }

  test("streaming ANN: micro-batch queries probe the fixed IVF index") {
    // the similarity-search twin of incremental dedup: quantizer trained
    // (here: fixed centroids) ONCE, arriving query batches probe it via
    // the batch operator inside foreachBatch — semantics identical to
    // the batch probe by construction, demonstrated end-to-end
    implicit val sqlCtx = spark.sqlContext
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .localCheckpoint(true)
    val centers = e.filter(col("vec_id") < 8).orderBy("vec_id")
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    val queryVecs = e.filter(col("vec_id") < 4)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect()
    val input = MemoryStream[(Long, Array[Double])]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val q = input.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= graft.ops.Ann
          .ivfTopKFixed(e, batch, "vec_id", "embedding", k = 3, centers,
            nprobe = 3)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue))
        ()
      }
      .start()
    input.addData(queryVecs.take(2).toSeq)
    q.processAllAvailable()
    input.addData(queryVecs.drop(2).toSeq)
    q.processAllAvailable()
    q.stop()
    val batchHits = graft.ops.Ann.ivfTopKFixed(e,
        e.filter(col("vec_id") < 4), "vec_id", "embedding", k = 3, centers,
        nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue)).toSet
    assert(got.toSet == batchHits && batchHits.nonEmpty)
  }

  test("streaming crawl-frontier dedup keys on the canonical URL") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    // canonicalUrl is a plain narrow column — it composes into the
    // watermarked dedup with no extra shuffle or state
    val stream = input.toDF().toDF("ts", "url")
      .withColumn("curl", graft.ops.TextAnalysis.canonicalUrl(col("url")))
    val q = EventAgg.dedupStream(stream, Seq("curl"), "10 minutes")
      .writeStream.format("memory").queryName("url_dedup_out")
      .outputMode("append").start()
    input.addData(
      (ts(0), "https://site.example.org/page"),
      (ts(1), "HTTPS://WWW.SITE.EXAMPLE.ORG:443/page/"),    // same page
      (ts(2), "https://site.example.org/page?utm_source=x"), // same page
      (ts(3), "https://site.example.org/other"))
    q.processAllAvailable()
    q.stop()
    val out = spark.sql("select curl, url from url_dedup_out").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out.keySet == Set("https://site.example.org/page",
      "https://site.example.org/other"))
    // first-seen raw variant survives for the deduped page
    assert(out("https://site.example.org/page") == "https://site.example.org/page")
  }

  test("streaming OHLC bars match the batch aggregation, ties included") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Long, Double)]
    val stream = input.toDF().toDF("ts", "k", "id", "v")
    val q = EventAgg.ohlcAggStream(stream, "k", "id", "v", "1 hour", "1 hour")
      .writeStream.format("memory").queryName("ohlc").outputMode("append").start()
    // two events share ts(0): open must break the tie by id (1 < 2)
    val evts = Seq(
      (ts(0), "x", 1L, 10.0), (ts(0), "x", 2L, 30.0), (ts(30), "x", 3L, 5.0),
      (ts(70), "x", 4L, 7.25), (ts(10), "y", 5L, 2.5))
    input.addData(evts)
    q.processAllAvailable()
    // advance watermark far enough to finalize every window
    input.addData((ts(10000), "zz", 9L, 0.0))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.sql(
      "select bar_start, k, open, high, low, close, vol_cents, n_events from ohlc")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6),
        r.getLong(7))).toSet
    val batch = EventAgg.ohlcAgg(evts.toDF("ts", "k", "id", "v"),
        "k", "id", "v", "1 hour")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6),
        r.getLong(7))).toSet
    assert(streamed == batch && batch.size == 3,
      s"streamed=$streamed batch=$batch")
  }

  test("streaming EWMA matches the batch fold across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventAgg.Event]
    val q = EventAgg.ewmaStream(input.toDS(), alpha = 0.25)
      .writeStream.format("memory").queryName("ewma").outputMode("update").start()
    // batch 1 out of order WITHIN the batch (sorted by the operator),
    // batch 2 strictly later (the documented cross-batch contract)
    input.addData(Seq(
      EventAgg.Event(1L, ts(2), "a", 20.0), EventAgg.Event(1L, ts(1), "a", 10.0),
      EventAgg.Event(2L, ts(1), "b", 5.0)))
    q.processAllAvailable()
    input.addData(Seq(EventAgg.Event(1L, ts(3), "a", 30.0)))
    q.processAllAvailable()
    q.stop()
    // last update per user is the final level
    val streamed = spark.sql(
      "select user_id, n, ewma from ewma")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).map { case (k, vs) =>
        k -> vs.map(_._2).maxBy(_._1) }  // highest n = latest state
    val batchDf = Seq(
      (1L, ts(1), 1L, 10.0), (1L, ts(2), 2L, 20.0), (1L, ts(3), 3L, 30.0),
      (2L, ts(1), 4L, 5.0)).toDF("user_id", "ts", "event_id", "value")
    val batch = graft.ops.Drift.ewmaLevel(batchDf, "user_id", "ts",
        "event_id", "value", alpha = 0.25)
      .select("user_id", "n", "ewma")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
    assert(batch(1L) == ((3L, 16.875)))
  }

  test("streaming Holt matches the batch fold across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventAgg.Event]
    val q = EventAgg.holtStream(input.toDS())
      .writeStream.format("memory").queryName("holt").outputMode("update").start()
    input.addData(Seq(
      EventAgg.Event(1L, ts(2), "a", 20.0), EventAgg.Event(1L, ts(1), "a", 10.0),
      EventAgg.Event(2L, ts(1), "b", 5.0)))
    q.processAllAvailable()
    input.addData(Seq(EventAgg.Event(1L, ts(3), "a", 30.0)))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.sql(
      "select user_id, n, level, trend, forecast from holt")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).maxBy(_._1) }
    val batchDf = Seq(
      (1L, ts(1), 1L, 10.0), (1L, ts(2), 2L, 20.0), (1L, ts(3), 3L, 30.0),
      (2L, ts(1), 4L, 5.0)).toDF("user_id", "ts", "event_id", "value")
    val batch = graft.ops.Drift.holtLevelTrend(batchDf, "user_id", "ts",
        "event_id", "value")
      .select("user_id", "n", "level", "trend", "forecast")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
    // hand check: l1=15, b1=1.25; l2=0.5*30+0.5*16.25=23.125,
    // b2=0.25*(23.125-15)+0.75*1.25 = 2.96875
    assert(batch(1L) == ((3L, 23.125, 2.96875, 26.09375)))
  }

  test("streaming first-seen detection matches the batch growth curve") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventAgg.Event]
    // batch 1: users 1 and 2 appear (user 1 twice, min ts wins)
    input.addData(
      EventAgg.Event(1L, ts(5), "a", 1.0), EventAgg.Event(1L, ts(2), "a", 1.0),
      EventAgg.Event(2L, ts(3), "b", 1.0))
    val q = EventAgg.firstSeenStream(input.toDS())
      .writeStream.format("memory").queryName("newusers")
      .outputMode("append").start()
    q.processAllAvailable()
    // batch 2: user 1 again (no emission) + new user 3
    input.addData(
      EventAgg.Event(1L, ts(50), "a", 1.0), EventAgg.Event(3L, ts(60), "c", 1.0))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.sql("select user_id, first_ts from newusers")
      .as[(Long, Timestamp)].collect().toSet
    assert(streamed === Set((1L, ts(2)), (2L, ts(3)), (3L, ts(60))))
    // the per-day growth curve derived from the stream equals the
    // batch operator on the union of all events
    val allEvents = Seq(
      EventAgg.Event(1L, ts(5), "a", 1.0), EventAgg.Event(1L, ts(2), "a", 1.0),
      EventAgg.Event(2L, ts(3), "b", 1.0), EventAgg.Event(1L, ts(50), "a", 1.0),
      EventAgg.Event(3L, ts(60), "c", 1.0))
    val batchCurve = graft.ops.Analytics.userGrowth(allEvents.toDF(), "user_id", "ts")
      .collect().map(r => r.getDate(0).toString -> r.getAs[Long]("new_users")).toMap
    val streamCurve = streamed.toSeq.toDF("user_id", "first_ts")
      .select(to_date(col("first_ts")).as("d"))
      .groupBy("d").count()
      .collect().map(r => r.getDate(0).toString -> r.getAs[Long]("count")).toMap
    assert(streamCurve === batchCurve)
  }

  test("streaming per-group HLL equals the batch sketch REGARDLESS of " +
    "arrival order and batching (register max commutes)") {
    implicit val sqlCtx = spark.sqlContext
    val all = (1 to 3000).map { i =>
      KeyedValue(s"g${i % 3}", s"user_${i % (700 * (i % 3 + 1))}")
    }
    // adversarial delivery: reversed order, split into 3 uneven batches,
    // with batch 2 REPLAYING half of batch 1 (duplication is a no-op on
    // a max-register sketch)
    val shuffled = all.reverse
    val (b1, rest) = shuffled.splitAt(500)
    val (b2, b3) = rest.splitAt(1700)
    val input = MemoryStream[KeyedValue]
    val q = SketchStream.hllStream(input.toDS(), p = 10)
      .writeStream.format("memory").queryName("hllstream")
      .outputMode("update").start()
    input.addData(b1); q.processAllAvailable()
    input.addData(b2 ++ b1.take(250)); q.processAllAvailable()
    input.addData(b3); q.processAllAvailable()
    q.stop()
    // latest emitted row per key == the batch per-group sketch of the
    // UNION (duplicates and all) — exact register equality via
    // (v_zero, s_scaled) and the identical rounded estimates
    val streamRows = spark.sql(
        "select key, v_zero, s_scaled, est_raw, est from hllstream")
      .collect()
    // update mode emits one row per touched key per batch: the FULLEST
    // sketch is the one with the smallest harmonic denominator
    // (s_scaled strictly decreases whenever any register rises)
    val latest = streamRows.groupBy(_.getString(0))
      .map { case (k, rows) => k -> rows.minBy(_.getLong(2)) }
    val batch = graft.ops.Frequent.hllSketchBy(
        all.toDF("key", "value"), Seq("key"), "value", p = 10)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(latest.keySet === batch.keySet)
    for ((k, s) <- latest) {
      val b = batch(k)
      assert(s.getLong(1) === b.getAs[Long]("v_zero"), s"$k v_zero")
      assert(s.getLong(2) === b.getAs[Long]("s_scaled"), s"$k s_scaled")
      assert(s.getDouble(3) === b.getAs[Double]("est_raw"), s"$k est_raw")
      assert(s.getDouble(4) === b.getAs[Double]("est"), s"$k est")
    }
  }

  test("streaming quality gate == batch batteries on multi-batch feeds " +
      "(round 18)") {
    implicit val sqlCtx = spark.sqlContext
    // stateless per-doc batteries: batch == stream must hold under any
    // batching — feed three micro-batches with every rule's violator
    // split across them, plus a null-text doc (the ADVICE null contract)
    val good = (1L, "this is a fine long sentence with all of the usual " +
      "words. it should pass every single rule because there is plenty " +
      "here. the clean text goes on to be seen with that and have today.")
    val docs = Seq(
      good,
      (2L, "the of and be"), // short
      (3L, ("- bullet one\n" * 10) + "the of and be with that have to."),
      (4L, ("copy this line now.\n" * 6) +
        "the quick brown fox is here with all of that and be to of."),
      (5L, null: String),
      (6L, "braces are code { nope. " + good._2))
    val input = MemoryStream[(Long, String)]
    val q = QualityStream.gateStream(
        input.toDF().toDF("doc_id", "text"), "text", minWords = 10)
      .select("doc_id", "gopher_keep", "c4_keep", "quality_keep")
      .writeStream.format("memory").queryName("qgate")
      .outputMode("append").start()
    input.addData(docs.take(2)); q.processAllAvailable()
    input.addData(docs.slice(2, 4)); q.processAllAvailable()
    input.addData(docs.drop(4)); q.processAllAvailable()
    q.stop()
    val streamed = spark.sql(
      "select doc_id, gopher_keep, c4_keep, quality_keep from qgate")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))).toMap
    val batch = QualityStream.gateStream(
        docs.toDF("doc_id", "text"), "text", minWords = 10)
      .select("doc_id", "gopher_keep", "c4_keep", "quality_keep")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))).toMap
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
    assert(batch(1L)._3 && !batch(2L)._3 && !batch(6L)._3,
      "gate keeps the good doc and drops violators")
    assert(!batch(5L)._1 && !batch(5L)._2 && !batch(5L)._3,
      "null text drops with real (non-null) flags")

    // the repetition battery's typed kernel applies to a stream as-is
    val repIn = MemoryStream[(Long, String)]
    val q2 = graft.ops.TextAnalysis.gopherRepetitionRules(
        repIn.toDF().toDF("doc_id", "text"), "doc_id", "text")
      .select("doc_id", "dup_line_frac", "top_2gram_frac", "rep_keep")
      .writeStream.format("memory").queryName("qrep")
      .outputMode("append").start()
    repIn.addData(docs.take(3)); q2.processAllAvailable()
    repIn.addData(docs.drop(3)); q2.processAllAvailable()
    q2.stop()
    val streamedRep = spark.sql(
      "select doc_id, dup_line_frac, top_2gram_frac, rep_keep from qrep")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getBoolean(3))).toMap
    val batchRep = graft.ops.TextAnalysis.gopherRepetitionRules(
        docs.toDF("doc_id", "text"), "doc_id", "text")
      .select("doc_id", "dup_line_frac", "top_2gram_frac", "rep_keep")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(streamedRep == batchRep, s"rep streamed=$streamedRep batch=$batchRep")
    assert(!batchRep(4L)._3, "the duplicate-line doc fails rep_keep")
  }
}
