package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventStreams

/** Streaming parity strategy: the same transform applied to a batch frame
  * and via readStream + memory sink must agree (north-star addition — the
  * reference has no streaming surface, SURVEY.md §2.8). */
class StreamingSpec extends SparkSuite {

  /** Streaming needs a timestamp-typed ts; the canonical table boundary
    * (TpchGraph.table) guarantees long NANOSECONDS whatever the parquet
    * physically stores (int64-ns or timestamp[us] — the driver has shipped
    * both), so re-materialize through it rather than reading raw parquet. */
  lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-events").toString
    TpchGraph.table(spark, "/root/testdata/sf0.001", "events")
      .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  test("windowed counts: streaming result equals batch result") {
    val batch = EventStreams.windowedCounts(
      spark.read.parquet(eventsDir)).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val streamed = EventStreams.runToMemory(spark, eventsDir,
      EventStreams.windowedCounts, OutputMode.Complete, "wc_out").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(batch.nonEmpty)
    assert(streamed == batch)
  }

  test("labelDrift: hand-computed L1 between hourly mixes; first/gap windows emit nothing") {
    import spark.implicits._
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // hour 0: a,a,b (shares 666666/333333); hour 1: a,b,b (333333/666666);
    // hour 2: only c (1000000); hour 4 (after a GAP): a — no row
    val events = Seq(
      (ts(0, 1), "a"), (ts(0, 2), "a"), (ts(0, 3), "b"),
      (ts(1, 1), "a"), (ts(1, 2), "b"), (ts(1, 3), "b"),
      (ts(2, 30), "c"),
      (ts(4, 0), "a")).toDF("ts", "event_type")
    val out = EventStreams.labelDrift(events, windowLen = "60 minutes")
      .collect().map(r => r.getTimestamp(0).toString -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // hour 1 vs 0: |333333-666666| + |666666-333333| = 666666
    // hour 2 vs 1: c appears (1000000) + a,b vanish (333333+666666)
    assert(out == Map(
      "2024-01-01 01:00:00.0" -> ((3L, 666666L)),
      "2024-01-01 02:00:00.0" -> ((1L, 1999999L))), s"got $out")
  }

  test("streamingLabelDrift: only watermark-closed windows report; closing the tail matches batch") {
    import spark.implicits._
    def ev(id: Long, hm: String, t: String) = (id,
      java.sql.Timestamp.valueOf(s"2024-01-01 $hm:00"), 1L, t, 1.0, "")
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val base = Seq(
      ev(1, "00:01", "a"), ev(2, "00:02", "a"), ev(3, "00:03", "b"),
      ev(4, "01:01", "a"), ev(5, "01:02", "b"), ev(6, "01:03", "b"))
    // tail OPEN: last event at 02:05 → watermark 01:55 → only hour 0 is
    // closed, and hour 0 has no predecessor → the stream reports NOTHING,
    // while batch would already claim the hour-1 drift row
    val open = java.nio.file.Files.createTempDirectory("graft-sdrift-open").toString
    (base :+ ev(7, "02:05", "c")).toDF(cols: _*).coalesce(1)
      .write.mode("append").parquet(open)
    assert(EventStreams.streamingLabelDrift(spark, open).collect().isEmpty,
      "drift reported from a window the watermark has not closed")
    // tail CLOSED: one more event at 04:00 pushes the watermark to 03:50,
    // closing hours 0-2 — the stream now reports exactly the batch rows
    val closed = java.nio.file.Files.createTempDirectory("graft-sdrift-closed").toString
    (base ++ Seq(ev(7, "02:05", "c"), ev(8, "04:00", "a"))).toDF(cols: _*)
      .coalesce(1).write.mode("append").parquet(closed)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getTimestamp(0).toString -> ((r.getLong(1), r.getLong(2)))).toMap
    val streamed = rows(EventStreams.streamingLabelDrift(spark, closed))
    val batch = rows(EventStreams.labelDrift(
      spark.read.parquet(closed).select(col("ts"), col("event_type"))))
    // batch's only extra candidate would be the still-open 04:00 window,
    // which the gap rule drops on both sides — the sets must be equal
    assert(streamed == batch && streamed.keySet ==
      Set("2024-01-01 01:00:00.0", "2024-01-01 02:00:00.0"), s"got $streamed vs $batch")
  }

  test("watermark drops late rows in append mode; open windows stay unemitted") {
    import spark.implicits._
    def ev(id: Long, hm: String) = (id,
      java.sql.Timestamp.valueOf(s"2024-01-01 $hm:00"), 1L, "click", 1.0, "")
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("graft-late-spec").toString
    // batch 1: three events in window [10:00, 10:05) plus one at 10:30 that
    // advances the watermark to 10:20 once the batch commits
    Seq(ev(1, "10:00"), ev(2, "10:02"), ev(3, "10:04"), ev(4, "10:30"))
      .toDF(cols: _*).coalesce(1).write.mode("append").parquet(dir)
    val q = EventStreams.windowedCounts(EventStreams.readStream(spark, dir))
      .writeStream.outputMode(OutputMode.Append).format("memory")
      .queryName("late_wc").start()
    try {
      q.processAllAvailable()
      // batch 2: a LATE row for the already-passed 10:00 window (ts 10:02 <
      // watermark 10:20 → dropped pre-aggregation) and a fresh on-time row
      Seq(ev(5, "10:02"), ev(6, "10:31"))
        .toDF(cols: _*).coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("late_wc").collect()
      .map(r => r.getTimestamp(0).toString -> r.getLong(2)).toMap
    // the finalized 10:00 window counts 3 — the late replay is NOT in it —
    // and the 10:30 window is still open (watermark 10:21 < 10:35), so
    // append mode has emitted nothing for it yet
    assert(streamed == Map("2024-01-01 10:00:00.0" -> 3L), s"got $streamed")
    // the same data in BATCH counts the late row: the gap is exactly the
    // watermark's bounded-state trade, not a lost-data bug
    val batch = EventStreams.windowedCounts(spark.read.parquet(dir)).collect()
      .map(r => r.getTimestamp(0).toString -> r.getLong(2)).toMap
    assert(batch("2024-01-01 10:00:00.0") == 4L, s"got $batch")
  }

  test("retentionCohorts: hand-computed weekly cohort matrix") {
    import spark.implicits._
    // bucketSeconds = 100 so "weeks" are 100-second buckets; two events in
    // one (user, week) must count once
    val ev = Seq(
      (1L, 5L), (1L, 10L), (1L, 150L), (1L, 360L),  // u1: weeks 0,0,1,3
      (2L, 50L),                                     // u2: week 0
      (3L, 120L), (3L, 330L)                         // u3: weeks 1,3
    ).toDF("user_id", "sec")
      .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"))
    val out = EventStreams.retentionCohorts(ev, bucketSeconds = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      (0L, 0L) -> 2L,  // u1, u2 in their cohort week
      (0L, 1L) -> 1L,  // u1 back in week 1
      (0L, 3L) -> 1L,  // u1 back in week 3
      (1L, 0L) -> 1L,  // u3 cohort week 1
      (1L, 2L) -> 1L), // u3 back two weeks after its cohort
      s"got $out")
  }

  test("userSequences: ordered prefix, full count, partitioning-invariant two-phase prune") {
    import spark.implicits._
    // u1: 30 events cycling a/b/c (tns descending insertion order to prove
    // the sort), u2: 2 events with equal tns (event_id breaks the tie)
    val rows = (0 until 30).map(i =>
        (1L, 1000L - i, 100L - i, Seq("a", "b", "c")(i % 3))) ++
      Seq((2L, 500L, 7L, "y"), (2L, 500L, 6L, "x"))
    val ev = rows.toDF("user_id", "tns", "event_id", "event_type")
    def run(df: org.apache.spark.sql.DataFrame) =
      EventStreams.userSequences(df, maxLen = 3).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val out = run(ev)
    // u1's earliest three by tns are insertion indices 29, 28, 27 →
    // types c, b, a (i%3 for 29/28/27); u2 orders by event_id on the tie
    assert(out == Map(1L -> ((30L, "c b a")), 2L -> ((2L, "x y"))), s"got $out")
    assert(run(ev.repartition(7)) == out)
    assert(run(ev.coalesce(1)) == out)
  }

  test("rateAnomalies: randomized event streams vs a driver simulator") {
    import spark.implicits._
    val rnd = new scala.util.Random(2222)
    for (trial <- 1 to 2) {
      val types = Seq("a", "b")
      // sparse bursty stream: some hours empty, some hot
      val secs = for {
        t <- types; h <- 0 until 40 if rnd.nextDouble() < 0.7
        n = if (rnd.nextDouble() < 0.15) 8 + rnd.nextInt(8) else rnd.nextInt(4)
        i <- 0 until n
      } yield (t, h * 3600L + i)
      val trail = 6
      // driver sim: dense per-type grid over the GLOBAL hour bounds
      val byType = secs.groupBy(_._1).map { case (t, es) =>
        t -> es.groupBy(_._2 / 3600).map { case (h, xs) => h -> xs.size.toLong }
      }
      val hours = secs.map(_._2 / 3600)
      val (h0, h1) = (hours.min, hours.max)
      val expected = (for {
        t <- byType.keys; h <- (h0 + trail) to h1
        c = byType(t).getOrElse(h, 0L)
        ts = ((h - trail) until h).map(byType(t).getOrElse(_, 0L)).sum
        if c * trail > ts * 2 || c * trail * 2 < ts
      } yield (t, h * 3600L) -> ((c, ts,
        if (c * trail > ts * 2) "spike" else "drop"))).toMap
      val got = EventStreams.rateAnomalies(
          secs.toDF("event_type", "sec")
            .select(col("event_type"), timestamp_seconds(col("sec")).as("ts")),
          trailHours = trail)
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
      assert(got == expected, s"trial $trial: " +
        s"missing=${expected.keySet -- got.keySet} extra=${got.keySet -- expected.keySet}")
    }
  }

  test("rateAnomalies: spike/drop thresholds, zero-filled hours, partial windows excluded") {
    import spark.implicits._
    // type a hourly counts: h0=3, h1=3, h2=10, h3=0 (zero-filled), h4=6;
    // trailHours=2 → h0/h1 have partial trails (unflagged), h2 spikes
    // (10·2 > 2·6), h3 drops (0 < 13/4), h4 is inside both bands
    val secs = Seq.fill(3)(10L) ++ Seq.fill(3)(3610L) ++
      Seq.fill(10)(7210L) ++ Seq.fill(6)(14410L)
    val ev = secs.toDF("sec")
      .select(lit("a").as("event_type"), timestamp_seconds(col("sec")).as("ts"))
    val out = EventStreams.rateAnomalies(ev, trailHours = 2)
      .collect().map(r => r.getLong(1) ->
        ((r.getString(0), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(out == Map(
      7200L -> (("a", 10L, 6L, "spike")),
      10800L -> (("a", 0L, 13L, "drop"))), s"got $out")
  }

  test("sliding windows: streaming equals batch, every event in 2 windows") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batchDf = spark.read.parquet(eventsDir)
    val batch = rows(EventStreams.slidingCounts(batchDf))
    val streamed = rows(EventStreams.runToMemory(spark, eventsDir,
      df => EventStreams.slidingCounts(df), OutputMode.Complete, "sw_out"))
    assert(batch.nonEmpty)
    assert(streamed == batch)
    // 10-minute windows sliding every 5: each event lands in exactly 2
    assert(batch.toSeq.map(_._3).sum == 2 * batchDf.count())
  }

  test("streaming dedup drops in-horizon duplicate event ids") {
    import org.apache.spark.sql.streaming.OutputMode
    // double the stream: every event appears twice
    val dupDir = java.nio.file.Files.createTempDirectory("graft-dup").toString
    val base = spark.read.parquet(eventsDir)
    base.unionByName(base).coalesce(1).write.mode("overwrite").parquet(dupDir)
    val deduped = EventStreams.runToMemory(spark, dupDir,
      EventStreams.streamingDedup, OutputMode.Append, "dedup_out")
    assert(deduped.count() == base.count())
  }

  test("streaming signature dedup: distinct sigs equal the batch aggregation form") {
    import org.apache.spark.sql.types.{StructField, StructType, StringType, TimestampType}
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"), // exact dup
      (3L, "completely different content about spark engines and data"),
      (4L, "too short")) // < 3 words after shingling? 2 words -> no sigs
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-sig").toString
    docs.select(timestamp_seconds(lit(946684800)).as("ts"), col("text"))
      .write.mode("overwrite").parquet(dir)
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("text", StringType)))
    val streamed = EventStreams.runToMemory(spark, dir,
      df => EventStreams.streamingSignatureDedup(df),
      org.apache.spark.sql.streaming.OutputMode.Append, "sig_out", schema)
      .collect().map(r => (0 to 3).map(r.getString)).toSet
    // batch reference: the aggregation-form signatures, distinct
    val batch = graft.pipeline.Dedup.minhashSignatures(docs, "doc_id", "text")
      .select("h0", "h1", "h2", "h3").distinct()
      .collect().map(r => (0 to 3).map(r.getString)).toSet
    assert(streamed == batch)
    assert(streamed.size == 2) // dup pair collapses; short doc carries no sig
  }

  test("interval join: streaming result equals batch result") {
    def sides(df: org.apache.spark.sql.DataFrame) = (
      df.where(col("event_type") === "click"),
      df.where(col("event_type") === "view"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val batchDf = spark.read.parquet(eventsDir)
    val (bc, bv) = sides(batchDf)
    val batch = rows(EventStreams.intervalJoin(bc, bv))
    val streamed = rows(EventStreams.runToMemory(spark, eventsDir,
      df => { val (c, v) = sides(df); EventStreams.intervalJoin(c, v) },
      OutputMode.Append, "ij_out"))
    assert(batch.nonEmpty)
    assert(streamed == batch)
  }

  test("streaming multimodal ingest: decoded features equal the batch run") {
    // the BATCH image decoder composed into a readStream unchanged —
    // filter + typed mapPartitions are streaming-legal narrow ops
    val assets = graft.pipeline.Multimodal.syntheticImageAssets(spark, 12)
    val dir = java.nio.file.Files.createTempDirectory("graft-sassets-spec").toString
    assets.write.mode("overwrite").parquet(dir)
    val streamed = EventStreams.runToMemory(spark, dir,
      df => graft.pipeline.Multimodal.imageFeatures(df).toDF(),
      schema = graft.pipeline.Multimodal.assetWriteSchema)
    val batch = graft.pipeline.Multimodal.imageFeatures(assets).toDF()
    val key = (r: org.apache.spark.sql.Row) => r.getLong(0)
    val sRows = streamed.collect().map(r => key(r) -> r.toSeq).toMap
    val bRows = batch.collect().map(r => key(r) -> r.toSeq).toMap
    assert(sRows == bRows, "streamed decode diverged from batch decode")
    assert(sRows.size == 12)
  }

  test("streaming NB serve: multi-micro-batch scoring equals the batch classifier") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana apple", "fruit"), (2L, "banana apple", "fruit"),
      (3L, "bolt nut bolt", "tool"), (4L, "nut bolt", "tool"),
      (5L, "apple nut", "fruit"), (6L, "banana bolt bolt", "tool"),
      (7L, "apple apple nut nut", "fruit"), (8L, "bolt banana", "tool")
    ).toDF("doc_id", "text", "cat")
    val (wm, lt) = graft.pipeline.TextAnalysis.naiveBayesModel(docs, "text", "cat")
    val src = java.nio.file.Files.createTempDirectory("graft-nbsrc-spec").toString
    val out = java.nio.file.Files.createTempDirectory("graft-nbout-spec").toString
    // 4 files + maxFilesPerTrigger=1 forces 4 separate micro-batches
    docs.repartition(4).write.mode("overwrite").parquet(src)
    val streamed = EventStreams.streamingNbClassify(spark, src, out, wm, lt,
      "doc_id", "text", docs.schema, maxFilesPerTrigger = 1)
    val batch = graft.pipeline.TextAnalysis
      .naiveBayesClassify(docs, "doc_id", "text", wm, lt)
    val sRows = streamed.collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val bRows = batch.collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(sRows == bRows, "streamed NB scoring diverged from batch")
    assert(sRows.size == 8)
  }

  test("streaming NB serve: checkpointed restart scores only unseen files, no dup rows") {
    import spark.implicits._
    val train = Seq((1L, "apple banana", "fruit"), (2L, "bolt nut", "tool"))
      .toDF("doc_id", "text", "cat")
    val (wm, lt) = graft.pipeline.TextAnalysis.naiveBayesModel(train, "text", "cat")
    val src = java.nio.file.Files.createTempDirectory("graft-nbck-src").toString
    val out = java.nio.file.Files.createTempDirectory("graft-nbck-out").toString
    val ck = java.nio.file.Files.createTempDirectory("graft-nbck-ck").toString
    def addFile(df: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-nbck-tmp").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(src, s"$tag.parquet"))
    }
    addFile(Seq((10L, "apple apple", "x"), (11L, "bolt bolt", "x"))
      .toDF("doc_id", "text", "cat"), "b0")
    val first = EventStreams.streamingNbClassify(spark, src, out, wm, lt,
      "doc_id", "text", train.schema, maxFilesPerTrigger = 1, checkpointDir = Some(ck))
    assert(first.select("doc_id").as[Long].collect().sorted.toSeq == Seq(10L, 11L))
    // "restart": a second run over the SAME source (one new file) with the
    // SAME checkpoint must score only the new documents
    addFile(Seq((12L, "banana nut", "x")).toDF("doc_id", "text", "cat"), "b1")
    val second = EventStreams.streamingNbClassify(spark, src, out, wm, lt,
      "doc_id", "text", train.schema, maxFilesPerTrigger = 1, checkpointDir = Some(ck))
    val ids = second.select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(10L, 11L, 12L), s"restart re-scored or skipped: $ids")
  }

  test("streaming embedding ingest appends to the persisted ann index") {
    import spark.implicits._
    val all = (0L until 24L).map(i => (i,
      Array((i % 7).toDouble, (i % 5).toDouble - 2.0, (i % 3).toDouble, 1.0)))
      .toDF("vec_id", "embedding")
    val base = all.where(col("vec_id") < 16)
    val tail = all.where(col("vec_id") >= 16)
    val idxDir = java.nio.file.Files.createTempDirectory("ann-stream-idx").toString
    graft.pipeline.AnnIndex.save(
      graft.pipeline.AnnIndex.buildIvfPq(base, "vec_id", "embedding",
        nlist = 2, m = 2, codewords = 3), idxDir)
    val src = java.nio.file.Files.createTempDirectory("ann-stream-src").toString
    tail.repartition(3).write.mode("overwrite").parquet(src) // 3 micro-batches
    val ingest: (org.apache.spark.sql.DataFrame, Long) => Unit =
      (df, _) => graft.pipeline.AnnIndex.appendSave(
        spark, idxDir, df, "vec_id", "embedding")
    val q = spark.readStream.schema(tail.schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
      .writeStream.foreachBatch(ingest)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val loaded = graft.pipeline.AnnIndex.load(spark, idxDir)
    assert(loaded.codes.count() == 24L * 2, "m=2 code rows per vector")
    // streamed ingest must serve identically to a frozen-quantizer encode
    // of the full corpus (the same identity AnnIndex.append pins in-memory)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val expect = rows(graft.pipeline.Quantization.ivfPqSearchCodes(
      graft.pipeline.Quantization.ivfPqEncode(
        all, "vec_id", "embedding", 2, loaded.centroids, loaded.codebooks),
      all.where(col("vec_id") < 3), "vec_id", "embedding",
      k = 3, nprobe = 2, m = 2, centIn = loaded.centroids, resCbIn = loaded.codebooks))
    val got = rows(graft.pipeline.AnnIndex.search(
      loaded, all.where(col("vec_id") < 3), "vec_id", "embedding", k = 3, nprobe = 2))
    assert(got == expect, s"streamed $got vs frozen-encode $expect")
  }

  test("stream→graph ingestion: multi-batch, idempotent under full replay") {
    import spark.implicits._
    val events = Seq(
      (1L, 10L, "click"), (2L, 10L, "view"), (3L, 20L, "click"),
      (4L, 20L, "click"), (5L, 30L, "purchase"), (6L, 10L, "click"))
      .toDF("event_id", "user_id", "event_type")
      .select(col("event_id"), col("event_id").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"),
        lit(0.0).as("value"), lit("").as("props"))
    val src = java.nio.file.Files.createTempDirectory("sgi-src").toString
    val db = java.nio.file.Files.createTempDirectory("sgi-db").toString
    events.repartition(3).write.mode("overwrite").parquet(src)
    EventStreams.streamIntoGraph(spark, src, db, maxFilesPerTrigger = 1) // 3 batches
    val g = graft.model.GraphStore.load(spark, db)
    // 3 users + 3 types; distinct (user, type) pairs: (10,click),(10,view),
    // (20,click),(30,purchase)
    assert(g.vertices.count() == 6)
    assert(g.edges.count() == 4)
    assert(g.props.where(col("schema_type") === "User").count() == 1)
    // replay the WHOLE source again (no checkpoint): content addressing
    // + anti-joins make every effect a no-op
    EventStreams.streamIntoGraph(spark, src, db, maxFilesPerTrigger = 1)
    val g2 = graft.model.GraphStore.load(spark, db)
    assert(g2.vertices.count() == 6 && g2.edges.count() == 4)
    // the ingested graph is traversable like any other store
    val zc = new graft.exec.ZoeCompiler(g2)
    val q = graft.ql.Zoe.start(graft.model.PropValue.typed("User"))
      .referencingVertices.outgoing.outgoing // users -> Did edges -> types
    assert(zc.run(q).vertices.count() == 3) // the three event types
  }

  test("funnelCounts: strict first-occurrence chaining, hand-traced") {
    import spark.implicits._
    // u1 converts fully; u2's only view is BEFORE its first click (breaks
    // the chain); u3's purchase precedes its post-click view (no convert);
    // u4 has no click at all (not even in stage 1)
    val ev = Seq(
      (1L, "click", 10L), (1L, "view", 20L), (1L, "purchase", 30L),
      (2L, "view", 5L), (2L, "click", 10L), (2L, "purchase", 15L),
      (3L, "click", 10L), (3L, "purchase", 15L), (3L, "view", 20L),
      (4L, "view", 10L), (4L, "purchase", 20L))
      .toDF("user_id", "event_type", "ts")
    val r = EventStreams.funnelCounts(ev, "user_id", "event_type", "ts",
      Seq("click", "view", "purchase")).head()
    assert(r.getLong(0) == 3L) // u1, u2, u3 clicked
    assert(r.getLong(1) == 2L) // u1 and u3 viewed after first click
    assert(r.getLong(2) == 1L) // only u1 purchased after that view
    assert(r.getDouble(3) == BigDecimal(2.0 / 3)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getDouble(4) == 0.5)
    // a second first-click at the same min ts cannot double-count a user
    val dup = ev.unionByName(Seq((1L, "click", 10L)).toDF("user_id", "event_type", "ts"))
    assert(EventStreams.funnelCounts(dup, "user_id", "event_type", "ts",
      Seq("click", "view", "purchase")).head().getLong(0) == 3L)
  }

  test("funnelCounts: randomized events vs a driver brute-force simulator") {
    import spark.implicits._
    val stages = Seq("a", "b", "c")
    val rnd = new scala.util.Random(8130L) // fixed seed: reproducible
    val types = Seq("a", "b", "c", "x")
    val events = Seq.fill(600)(
      (rnd.nextInt(40).toLong, types(rnd.nextInt(types.size)), rnd.nextInt(1000).toLong))
    // driver ground truth: strict first-occurrence chaining per user
    val byUser = events.groupBy(_._1)
    def chain(evs: Seq[(Long, String, Long)]): Int = {
      var prev = Long.MinValue
      var depth = 0
      for (st <- stages) {
        if (depth == stages.indexOf(st)) {
          val hits = evs.filter(e => e._2 == st && e._3 > prev).map(_._3)
          if (hits.nonEmpty) { prev = hits.min; depth += 1 }
        }
      }
      depth
    }
    val depths = byUser.values.map(v => chain(v.toSeq)).toSeq
    val expected = stages.indices.map(i => depths.count(_ >= i + 1).toLong)
    val r = EventStreams.funnelCounts(events.toDF("user_id", "event_type", "ts"),
      "user_id", "event_type", "ts", stages).head()
    assert((0 to 2).map(r.getLong) == expected)
  }

  test("activeUsersReport: hand-computed DAU/WAU/stickiness across a day gap") {
    import spark.implicits._
    // day 0: users {1, 2}; day 1: {1}; day 9: {3} (gap > 7 days resets WAU)
    val ev = Seq((1L, 10L), (2L, 20L), (1L, 86400L + 5L), (3L, 9L * 86400L + 1L),
      (1L, 30L)) // duplicate (day 0, user 1) collapses
      .toDF("user_id", "epoch")
      .select(col("user_id"), col("epoch").cast("timestamp").as("ts"))
    val out = EventStreams.activeUsersReport(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // day 0: dau 2, wau 2 → 1.0; day 1: dau 1, wau {1,2}=2 → 0.5;
    // day 9: dau 1, wau {3}=1 → 1.0 (days 0/1 are out of its window)
    assert(out == Map(
      0L -> ((2L, 2L, 1000000L)),
      1L -> ((1L, 2L, 500000L)),
      9L -> ((1L, 1L, 1000000L))), s"got $out")
  }

  test("transitionMatrix: hand-traced pairs, per-from micro probabilities, id tie-break") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, "a", 10L), (2L, 1L, "b", 20L), (3L, 1L, "a", 30L), // a→b, b→a
      (4L, 2L, "b", 10L), (5L, 2L, "b", 20L),                     // b→b
      (6L, 3L, "x", 50L), (7L, 3L, "y", 50L))                     // same ts: id order → x→y
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = EventStreams.transitionMatrix(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(
      ("a", "b") -> ((1L, 1000000L)),
      ("b", "a") -> ((1L, 500000L)),
      ("b", "b") -> ((1L, 500000L)),
      ("x", "y") -> ((1L, 1000000L))), s"got $out")
  }

  test("native session_window: exact-gap event merges; diff > gap splits; all sessions emit") {
    import spark.implicits._
    val ev = Seq((1L, 100L), (1L, 1900L), (1L, 3701L), (2L, 50L))
      .toDF("user_id", "epoch")
      .select(col("user_id"), col("epoch").cast("timestamp").as("ts"))
    // 1900 sits exactly at [100, 1900)'s end and MERGES (pinned: the
    // built-in matches the custom sessionize boundary, diff == gap is
    // in-session); 3701 is 1801 s after 1900 → new session
    val out = ev
      .groupBy(col("user_id"), session_window(col("ts"), "1800 seconds").as("sw"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("n"), unix_timestamp(col("sw.start")).as("s"),
        unix_timestamp(col("sw.end")).as("e"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out == Set((1L, 2L, 100L, 3700L), (1L, 1L, 3701L, 5501L),
      (2L, 1L, 50L, 1850L)), s"got $out")
    // the custom state machine agrees on the boundary: only u1's first
    // session is closed (by the 3701 event), with the exact-gap 1900
    // event inside it
    val closed = EventStreams.sessionize(ev, gapSeconds = 1800).collect()
    assert(closed.length == 1 && closed(0).userId == 1L && closed(0).nEvents == 2 &&
      closed(0).firstTs == 100L && closed(0).lastTs == 1900L, s"got ${closed.toSeq}")
  }

  test("sessionizeEventTime: successor-closed AND watermark-expired sessions emit") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    // gap 100 s, watermark delay 50 s, max ts 10500 → final watermark
    // 10450 (times offset from epoch 0: a row AT the initial watermark 0
    // is dropped as late):
    //  u1 session A (10000, 10030): closed by the 10500 event       → emits
    //  u2 session C (10010):  expiry 10110 < 10450, watermark-flushed → emits
    //  u1 session B (10500):  expiry 10600 > 10450, still open        → absent
    val dir = java.nio.file.Files.createTempDirectory("graft-sess-spec").toString
    Seq((1L, 10000L), (1L, 10030L), (1L, 10500L), (2L, 10010L))
      .toDF("user_id", "epoch")
      .select(col("user_id"), col("epoch").cast("timestamp").as("ts"))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val schema = StructType(Seq(StructField("user_id", LongType),
      StructField("ts", TimestampType)))
    val out = EventStreams.runToMemory(spark, dir,
        df => EventStreams.sessionizeEventTime(df, gapSeconds = 100,
          watermarkDelay = "50 seconds").toDF(),
        schema = schema)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out == Set((1L, 2L, 10000L, 10030L), (2L, 1L, 10010L, 10010L)), s"got $out")
  }

  test("sessionization with custom state emits gap-separated sessions") {
    import spark.implicits._
    val events = Seq(
      (1L, 0L), (1L, 100L), (1L, 200L),      // session 1 of user 1
      (1L, 10000L), (1L, 10100L),            // session 2 of user 1
      (2L, 50L))                             // user 2, still open
      .toDF("user_id", "epoch")
      .select(col("user_id"), col("epoch").cast("timestamp").as("ts"))
    val sessions = EventStreams.sessionize(events, gapSeconds = 1800).collect()
    // only user 1's FIRST session is closed (second remains open; user 2 open)
    assert(sessions.length == 1)
    val s = sessions.head
    assert(s.userId == 1L && s.nEvents == 3 && s.firstTs == 0L && s.lastTs == 200L)
  }

  test("ts canonicalization: long-ns, timestamp[us] NTZ, timestamp[ms] TZ all land identical") {
    // The driver's testdata has shipped different physical ts types across
    // rounds (int64-ns in r7, timestamp[us] in r8+), and the r8 breakage
    // class was exactly this boundary. Materialize every shape the driver
    // could plausibly ship and pin that TpchGraph.table normalizes each to
    // the SAME long nanoseconds.
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    import scala.jdk.CollectionConverters._
    val base = java.nio.file.Files.createTempDirectory("graft-ts-shapes")
    // ms-aligned instants so every physical precision holds them exactly
    val ms = Seq(1700000000000L, 1700000086400L, 0L)
    val expectedNs = ms.map(_ * 1000000L)

    def dirFor(name: String): String = {
      val d = base.resolve(name); java.nio.file.Files.createDirectories(d); d.toString
    }
    // shape 1: raw int64 nanoseconds
    val longDir = dirFor("long_ns")
    spark.createDataFrame(
        new java.util.ArrayList[Row](ms.map(m => Row(m * 1000000L, 1L)).asJava),
        StructType(Seq(StructField("ts", LongType), StructField("user_id", LongType))))
      .write.mode("overwrite").parquet(s"$longDir/events.parquet")
    // shape 2: timestamp[us] NTZ (what the driver ships now)
    val ntzDir = dirFor("us_ntz")
    spark.createDataFrame(
        new java.util.ArrayList[Row](ms.map(m =>
          Row(java.time.LocalDateTime.ofEpochSecond(m / 1000, ((m % 1000) * 1000000L).toInt,
            java.time.ZoneOffset.UTC), 1L)).asJava),
        StructType(Seq(StructField("ts", TimestampNTZType), StructField("user_id", LongType))))
      .write.mode("overwrite").parquet(s"$ntzDir/events.parquet")
    // shape 3: timestamp[ms] with timezone (TIMESTAMP_MILLIS physical)
    val msDir = dirFor("ms_tz")
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")
    try {
      spark.createDataFrame(
          new java.util.ArrayList[Row](ms.map(m => Row(new java.sql.Timestamp(m), 1L)).asJava),
          StructType(Seq(StructField("ts", TimestampType), StructField("user_id", LongType))))
        .write.mode("overwrite").parquet(s"$msDir/events.parquet")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }

    for (dir <- Seq(longDir, ntzDir, msDir)) {
      val out = TpchGraph.table(spark, dir, "events")
      assert(out.schema("ts").dataType == LongType, s"$dir: ts not long")
      val got = out.select("ts").collect().map(_.getLong(0)).sorted.toSeq
      assert(got == expectedNs.sorted,
        s"$dir: canonical ns mismatch: $got vs ${expectedNs.sorted}")
    }
  }
}
