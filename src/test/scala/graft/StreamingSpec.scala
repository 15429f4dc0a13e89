package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.StreamingIngest

class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  test("streaming 10s pre-agg over a file source equals the batch pre-agg") {
    val ev = graft.model.Tables.events(spark, sf)
      .select(col("event_id"), col("ts_ms"), col("event_type"), col("value"))
    val dir = Files.createTempDirectory("graft_stream_").toString
    ev.write.mode("overwrite").parquet(dir)

    val out = StreamingIngest.runFileStreamOnce(spark, dir, ev.schema,
      src => StreamingIngest.preAggStream(src, col("ts_ms"), lit("events_value"),
        col("value"), Seq("attr_event_type" -> col("event_type"))),
      queryName = "stream_preagg")

    val batch = ev
      .groupBy((col("ts_ms") - col("ts_ms") % 10000L).as("chq_timestamp"),
        col("event_type").as("attr_event_type"))
      .agg(sum(col("value")).as("bsum"), count(lit(1)).cast("double").as("bcnt"))

    val j = out.join(batch, Seq("chq_timestamp", "attr_event_type"), "full")
    val bad = j.filter(col("chq_rollup_sum").isNull || col("bsum").isNull ||
      abs(col("chq_rollup_sum") - col("bsum")) > 1e-6 ||
      col("chq_rollup_count") =!= col("bcnt")).count()
    assert(bad == 0)
    assert(out.count() > 0)
  }

  test("streaming sketch pre-agg: quantile read-outs equal the batch sketch") {
    import graft.sketch.{functions => gf}
    val ev = graft.model.Tables.events(spark, sf)
      .select(col("event_id"), col("ts_ms"), col("event_type"), col("value"))
    val dir = Files.createTempDirectory("graft_stream_sk_").toString
    ev.write.mode("overwrite").parquet(dir)

    val out = StreamingIngest.runFileStreamOnce(spark, dir, ev.schema,
      src => StreamingIngest.preAggStream(src, col("ts_ms"), lit("events_value"),
        col("value"), Seq("attr_event_type" -> col("event_type")),
        withSketch = true),
      queryName = "stream_preagg_sk")

    val batch = ev
      .groupBy((col("ts_ms") - col("ts_ms") % 10000L).as("chq_timestamp"),
        col("event_type").as("attr_event_type"))
      .agg(gf.ddsketch_agg(col("value")).as("bsk"))

    // bucket counts are merge-order-insensitive → p50/p95 agree exactly
    val j = out.join(batch, Seq("chq_timestamp", "attr_event_type"), "full")
      .withColumn("sp50", gf.ddsketch_quantile(col("chq_sketch"), 0.5))
      .withColumn("bp50", gf.ddsketch_quantile(col("bsk"), 0.5))
      .withColumn("sp95", gf.ddsketch_quantile(col("chq_sketch"), 0.95))
      .withColumn("bp95", gf.ddsketch_quantile(col("bsk"), 0.95))
    val bad = j.filter(col("chq_sketch").isNull || col("bsk").isNull ||
      col("sp50") =!= col("bp50") || col("sp95") =!= col("bp95")).count()
    assert(bad == 0)
    assert(j.count() > 0)
  }

  test("streaming heavy hitters: windowed CountMin equals the batch sketch") {
    import graft.sketch.{functions => gf}
    // top-talker detection on a stream: the CountMin TypedImperativeAggregate
    // runs inside a watermarked event-time window exactly as in batch —
    // cells are merge-order-insensitive, so estimates agree EXACTLY
    val ev = graft.model.Tables.events(spark, sf)
      .select(col("event_id"), col("ts_ms"), col("user_id"), col("event_type"))
    val dir = Files.createTempDirectory("graft_stream_cms_").toString
    ev.write.mode("overwrite").parquet(dir)
    val out = StreamingIngest.runFileStreamOnce(spark, dir, ev.schema,
      src => src
        .withColumn("__ts", timestamp_millis(col("ts_ms")))
        .withWatermark("__ts", "10 seconds")
        .groupBy(window(col("__ts"), "1 hour").as("w"))
        .agg(gf.cms_agg(col("user_id").cast("string")).as("cms"))
        .select(unix_millis(col("w.start")).as("win_start"), col("cms")),
      queryName = "stream_cms")
    val batch = ev
      .groupBy((col("ts_ms") - col("ts_ms") % 3600000L).as("win_start"))
      .agg(gf.cms_agg(col("user_id").cast("string")).as("bcms"))
    val probes = ev.select(col("user_id").cast("string").as("u")).distinct()
      .limit(50)
    val j = out.join(batch, Seq("win_start"), "full").crossJoin(probes)
      .withColumn("se", gf.cms_est(col("cms"), col("u")))
      .withColumn("be", gf.cms_est(col("bcms"), col("u")))
    val bad = j.filter(col("cms").isNull || col("bcms").isNull ||
      col("se") =!= col("be")).count()
    assert(bad == 0)
    assert(j.count() > 0)
  }

  test("stream-stream interval join equals the batch interval join") {
    // BOTH sides stream (the package's other joins are stream-static):
    // probes pick up every sample of their series from the last 5 min
    val ev = graft.model.Tables.events(spark, sf)
      .withColumn("k", col("user_id") % 10)
    val probes = ev.filter(col("event_id") % 7 === 0)
      .select(col("event_id").as("pid"), col("k").as("pk"),
        col("ts_ms").as("pts_ms"))
    val samples = ev.filter(col("event_id") % 7 =!= 0)
      .select(col("event_id").as("sid"), col("k").as("sk"),
        col("ts_ms").as("sts_ms"), col("value").as("sval"))
    val pDir = Files.createTempDirectory("graft_ssj_p_").toString
    val sDir = Files.createTempDirectory("graft_ssj_s_").toString
    probes.write.mode("overwrite").parquet(pDir)
    samples.write.mode("overwrite").parquet(sDir)
    val pS = spark.readStream.schema(probes.schema).parquet(pDir)
    val sS = spark.readStream.schema(samples.schema).parquet(sDir)
    val joined = graft.streaming.StreamJoin.intervalJoin(
      pS, sS, "pk", "pts_ms", "sk", "sts_ms", lookbackMs = 300000L)
    val q = joined.writeStream
      .outputMode("append") // stream-stream inner joins emit append-only
      .format("memory").queryName("ssj")
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("ssj").select(col("pid"), col("sid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = probes.join(samples,
        col("pk") === col("sk") &&
          col("sts_ms") >= col("pts_ms") - 300000L &&
          col("sts_ms") <= col("pts_ms"))
      .select(col("pid"), col("sid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"stream=${got.size} batch=${want.size}")
    assert(want.nonEmpty)
  }

  test("streaming exact dedup emits the batch-distinct fingerprint set") {
    import graft.streaming.StreamingDedup
    import spark.implicits._
    // duplicate-heavy doc stream: 60 docs over 12 distinct texts
    val rows = (0 until 60).map { i =>
      (i.toLong, s"document body number ${i % 12} with shared text",
        new java.sql.Timestamp(1704067200000L + i * 1000L))
    }
    val docs = rows.toDF("doc_id", "text", "event_time")
    val dir = Files.createTempDirectory("graft_dedup_stream_").toString
    docs.write.mode("overwrite").parquet(dir)

    val src = spark.readStream.schema(docs.schema).parquet(dir)
    val q = StreamingDedup.dedupStream(src, "text", "event_time")
      .writeStream.outputMode("append").format("memory")
      .queryName("stream_dedup").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("stream_dedup")
      .select(StreamingDedup.contentFingerprint(col("text"))).distinct().count()
    val streamedRows = spark.table("stream_dedup").count()
    // every distinct text survives exactly once (all dups inside the window)
    assert(streamed == 12, s"distinct fps: $streamed")
    assert(streamedRows == 12, s"emitted rows: $streamedRows")
  }

  test("streaming near-dup screen: per-row sigs = batch minhash; stream = batch") {
    import graft.streaming.StreamingDedup
    import graft.ops.Dedup
    import spark.implicits._
    val reference = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "completely different words about spark clusters and shuffle partitions here"),
      (3L, "another unrelated document mentioning parquet files and columnar storage formats")
    ).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
      (11L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 1
      (12L, "a totally novel piece of writing on streaming joins and watermark state")
    ).toDF("doc_id", "text")

    // the per-row (shuffle-free, stream-safe) signature must equal the
    // batch explode->groupBy signature element-for-element
    val rowSigs = incoming.unionByName(reference)
      .select(col("doc_id"), StreamingDedup.rowSignature(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val batchSigs = Dedup.minhash(incoming.unionByName(reference), "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(rowSigs == batchSigs)

    val ref = StreamingDedup.bandedReference(reference, "text")
    val dir = Files.createTempDirectory("graft_neardup_stream_").toString
    incoming.write.mode("overwrite").parquet(dir)
    val src = spark.readStream.schema(incoming.schema).parquet(dir)
    val q = StreamingDedup.nearDupAgainst(src, ref, "text")
      .writeStream.outputMode("append").format("memory")
      .queryName("stream_neardup").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("stream_neardup")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet

    // batch run of the SAME function on the same frames
    val batch = StreamingDedup.nearDupAgainst(incoming, ref, "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(streamed == batch)
    // the exact dup matches with sim 1.0; the novel doc never matches
    val pairs = streamed.map(t => (t._1, t._2))
    assert(streamed.exists(t => t._1 == 10L && t._2 == 1L && t._4 == 1.0))
    assert(pairs.contains((11L, 1L)))
    assert(!pairs.exists(_._1 == 12L))

    // store-served banded reference == recomputed banded reference, with
    // the store deliberately stale (built from a strict id-prefix so the
    // fresh-delta pass must cover the rest) — r13, VERDICT #7
    val storeDir = Files.createTempDirectory("graft_neardup_store_").toString
    graft.ops.SignatureStore.write(
      reference.filter(col("doc_id") <= 2L), "text", storeDir)
    def refSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("ref_id"), r.getAs[Seq[Long]]("ref_sig"),
        r.getAs[Int]("band"), r.getAs[String]("bucket")))
      .toSet
    val served = refSet(StreamingDedup.bandedReferenceFromStore(
      spark, reference, "text", storeDir))
    assert(served == refSet(ref) && served.nonEmpty)
  }

  test("streaming ANN probes against the persisted index equal the batch probe") {
    import graft.ops.Similarity
    val emb = graft.model.Tables.embeddings(spark, sf)
    val idx = Files.createTempDirectory("graft_sann_idx_").toString
    Similarity.buildIvfIndex(emb, idx)
    val queries = emb.filter(col("vec_id") < 6)
      .select(col("vec_id"), col("embedding"))
    val in = Files.createTempDirectory("graft_sann_in_").toString
    queries.repartition(3).write.mode("overwrite").parquet(in)
    val out = Files.createTempDirectory("graft_sann_out_").toString
    val ckpt = Files.createTempDirectory("graft_sann_ckpt_").toString
    val q = graft.streaming.StreamingAnn.probeStream(
      spark.readStream.schema(queries.schema)
        .option("maxFilesPerTrigger", "1").parquet(in),
      idx, out, ckpt, k = 10, nProbe = 4)
    q.awaitTermination()
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("query_id"), col("vec_id"), col("sim")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val streamed = rows(spark.read.parquet(out))
    val batch = rows(Similarity.ivfTopKFromIndex(spark, idx, queries,
      k = 10, nProbe = 4))
    assert(streamed == batch && streamed.nonEmpty,
      s"stream ${streamed.size} vs batch ${batch.size}")
  }

  test("index refresh between probe-stream runs: appended vectors become visible") {
    import graft.ops.Similarity
    val emb = graft.model.Tables.embeddings(spark, sf)
    val idx = Files.createTempDirectory("graft_sann_rf_idx_").toString
    // build over HALF the corpus, probe, then append the other half and
    // probe again on a fresh run — the second run's candidates must
    // include appended vectors (the restart-against-a-new-snapshot
    // refresh contract, with the quantizer held fixed by append)
    val (oldHalf, newHalf) =
      (emb.filter(col("vec_id") % 2 === 0), emb.filter(col("vec_id") % 2 =!= 0))
    Similarity.buildIvfIndex(oldHalf, idx)
    val queries = emb.filter(col("vec_id") < 4)
      .select(col("vec_id"), col("embedding"))
    val in = Files.createTempDirectory("graft_sann_rf_in_").toString
    queries.write.mode("overwrite").parquet(in)
    def run(tag: Int): Set[(Long, Long, Double)] = {
      val out = Files.createTempDirectory(s"graft_sann_rf_out${tag}_").toString
      val ckpt = Files.createTempDirectory(s"graft_sann_rf_ck${tag}_").toString
      val q = graft.streaming.StreamingAnn.probeStream(
        spark.readStream.schema(queries.schema).parquet(in),
        idx, out, ckpt, k = 10, nProbe = 4)
      q.awaitTermination()
      spark.read.parquet(out).select(col("query_id"), col("vec_id"), col("sim"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    }
    val before = run(1)
    assert(before.nonEmpty && before.forall(_._2 % 2 == 0),
      "pre-append results must come from the built half")
    Similarity.appendToIvfIndex(newHalf, idx)
    val after = run(2)
    assert(after.exists(_._2 % 2 != 0),
      "appended vectors never surfaced in the refreshed run")
    // and the refreshed run equals the batch probe over the full index
    val batch = Similarity.ivfTopKFromIndex(spark, idx, queries, k = 10, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(after == batch)
  }

  test("probe stream rides through a concurrent re-cluster: zero failed batches, clean old/new boundary") {
    import graft.ops.Similarity
    val emb = graft.model.Tables.embeddings(spark, sf)
    val idx = Files.createTempDirectory("graft_sann_gen_idx_").toString
    Similarity.buildIvfIndex(emb.filter(col("vec_id") % 2 === 0), idx)
    // adversarial skewed delta (tight cloud around one corpus point) so
    // maintainIvfIndex is guaranteed to re-cluster
    val base = emb.orderBy(col("vec_id")).head().getSeq[Float](1)
    val delta = spark.range(0, 400)
      .select((col("id") + 200000L).as("vec_id"),
        transform(sequence(lit(0), lit(63)), d =>
          (element_at(lit(base.toArray), d + 1) +
            (pmod(hash(col("id"), d), lit(2000)) - lit(1000)) / 10000.0)
            .cast("float")).as("embedding"))
    Similarity.appendToIvfIndex(delta, idx)
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id"), col("embedding"))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("query_id"), col("vec_id"), col("sim")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // the pre-rebuild snapshot's answer
    val oldAns = rows(Similarity.ivfTopKFromIndex(spark, idx, queries,
      k = 10, nProbe = 4))
    // 12 identical single-file probe batches
    val in = Files.createTempDirectory("graft_sann_gen_in_").toString
    (0 until 12).foreach(_ =>
      queries.coalesce(1).write.mode("append").parquet(in))
    val out = Files.createTempDirectory("graft_sann_gen_out_").toString
    val ckpt = Files.createTempDirectory("graft_sann_gen_ck_").toString
    val q = graft.streaming.StreamingAnn.probeStream(
      spark.readStream.schema(queries.schema)
        .option("maxFilesPerTrigger", "1").parquet(in),
      idx, out, ckpt, k = 10, nProbe = 4)
    // force the re-cluster WHILE micro-batches are probing: before the
    // generation pointer, the whole-root rename window made a racing
    // probe fail with a missing path (r13 VERDICT #1). Threshold just
    // below the measured skew so the trip is geometry-independent.
    val skewNow = Similarity.ivfIndexStats(spark, idx).skew
    assert(skewNow > 1.0, s"appended cloud left the index balanced: $skewNow")
    @volatile var rebuilt = false
    @volatile var maintErr: Option[Throwable] = None
    val t = new Thread(() => {
      try rebuilt = Similarity.maintainIvfIndex(spark, idx, maxSkew = skewNow * 0.9)
      catch { case e: Throwable => maintErr = Some(e) }
    })
    t.start()
    q.awaitTermination() // throws on ANY failed micro-batch
    t.join()
    assert(maintErr.isEmpty, s"maintenance failed: $maintErr")
    assert(rebuilt, "the skewed index should have forced a re-cluster")
    val newAns = rows(Similarity.ivfTopKFromIndex(spark, idx, queries,
      k = 10, nProbe = 4))
    // every batch landed, and each one equals exactly one snapshot's
    // answer — no torn mixture of generations inside a batch
    val batchDirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("probe_batch=")).sortBy(_.getName)
    assert(batchDirs.length == 12, s"lost batches: ${batchDirs.length}/12")
    batchDirs.foreach { d =>
      val r = rows(spark.read.parquet(d.toString))
      assert(r == oldAns || r == newAns,
        s"${d.getName} matches neither the old nor the new snapshot")
    }
    // grace period: the superseded generation survives the flip...
    val gens = new java.io.File(idx).listFiles()
      .map(_.getName).filter(_.startsWith("gen-")).sorted.toSeq
    assert(gens == Seq("gen-00001", "gen-00002"), s"gens=$gens")
    // ...and is swept at the NEXT maintenance entry (grace expired)
    assert(!Similarity.maintainIvfIndex(spark, idx, maxSkew = 8.0))
    val gens2 = new java.io.File(idx).listFiles()
      .map(_.getName).filter(_.startsWith("gen-")).sorted.toSeq
    assert(gens2 == Seq("gen-00002"), s"gens after sweep=$gens2")
    // the swept index still serves
    assert(rows(Similarity.ivfTopKFromIndex(spark, idx, queries,
      k = 10, nProbe = 4)) == newAns)
  }

  test("stateful streaming sessionization equals batch-closed sessions") {
    import graft.streaming.{Session, SessionEvent, Sessionize}
    import spark.implicits._
    val gapMs = 1800000L
    val ev = graft.model.Tables.events(spark, sf)
      .filter(col("user_id") % 17 === 0) // small user slice keeps state tiny
      .select(col("user_id"), col("ts_ms"))
    val dir = Files.createTempDirectory("graft_sess_stream_").toString
    ev.write.mode("overwrite").parquet(dir)
    val maxTs = ev.agg(max(col("ts_ms"))).head().getLong(0)

    val src = spark.readStream.schema(ev.schema).parquet(dir).as[SessionEvent]
    val q = Sessionize.sessions(src, gapMs).writeStream
      .outputMode("append").format("memory").queryName("stream_sessions").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("stream_sessions")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // watermark delay 0 → final watermark = max event ts: every session
    // closed BEFORE it must have emitted (in-batch split or state timeout)
    val expected = Sessionize.batchClosedSessions(ev, gapMs, maxTs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(expected.nonEmpty)
    assert(streamed == expected,
      s"streamed=${streamed.size} expected=${expected.size}")
  }

  test("foreachBatch segment sink: per-batch dirs, commit log, exactly-once replay") {
    val ev = graft.model.Tables.events(spark, sf)
      .select(col("event_id"), col("ts_ms"), col("event_type"), col("value"))
    val in = Files.createTempDirectory("graft_sink_in_").toString
    ev.write.mode("overwrite").parquet(in)
    val segDir = Files.createTempDirectory("graft_sink_seg_").toString
    val commitDir = Files.createTempDirectory("graft_sink_commit_").toString
    val ckpt = Files.createTempDirectory("graft_sink_ckpt_").toString

    def run(): Unit = {
      val src = spark.readStream.schema(ev.schema).parquet(in)
      val q = StreamingIngest.segmentWriteStream(src,
        b => graft.ingest.MetricsPreAgg.preAggregate(b, col("ts_ms"),
          lit("events_value"), col("value"),
          Seq("attr_event_type" -> col("event_type")), freqMs = 10000L,
          withSketch = false),
        segDir, commitDir, ckpt)
      q.awaitTermination()
    }
    run()
    val commits = new java.io.File(commitDir).listFiles().map(_.getName).sorted
    assert(commits.nonEmpty && commits.forall(_.startsWith("batch_")))

    // written segments carry exactly the batch pre-agg totals
    val back = spark.read.parquet(segDir)
    val total = back.agg(sum(col("chq_rollup_count")), sum(col("chq_rollup_sum"))).head()
    assert(total.getDouble(0) == ev.count().toDouble)

    // second run with the same checkpoint: no new data → no new batches,
    // no duplicated segments (exactly-once at the batch level)
    run()
    val commits2 = new java.io.File(commitDir).listFiles().map(_.getName).sorted
    assert(commits2.toSeq == commits.toSeq)
    assert(spark.read.parquet(segDir).agg(sum(col("chq_rollup_count"))).head()
      .getDouble(0) == ev.count().toDouble)
  }

  test("segment sink streams cooked LOGS via the log segment writer") {
    val logs = graft.model.Cooked.logs(spark, sf)
    val in = Files.createTempDirectory("graft_logsink_in_").toString
    logs.write.mode("overwrite").parquet(in)
    val segDir = Files.createTempDirectory("graft_logsink_seg_").toString
    val commitDir = Files.createTempDirectory("graft_logsink_commit_").toString
    val ckpt = Files.createTempDirectory("graft_logsink_ckpt_").toString
    val src = spark.readStream.schema(logs.schema).parquet(in)
    val q = StreamingIngest.segmentWriteStream(src, identity,
      segDir, commitDir, ckpt,
      writeSegments = (df, dir) => graft.ingest.Segments.writeLogSegments(df, dir),
      indexAfterBatch = true)
    q.awaitTermination()
    val back = spark.read.parquet(segDir)
    assert(back.count() == logs.count())
    assert(back.columns.contains("chq_fingerprint") && back.columns.contains("dateint"))
    // the per-batch registration kept the fingerprint index current: every
    // written file is indexed, so a selective matcher can prune immediately
    import graft.ingest.{FingerprintIndex => FI}
    val indexedFiles = spark.read.parquet(FI.indexPath(segDir))
      .select("file").distinct().count()
    assert(indexedFiles == back.inputFiles.length)
    assert(FI.indexNewFiles(spark, segDir) == 0L)
  }

  test("kafka-shaped fake source: offset-resume parity with a mid-run crash") {
    import graft.streaming.{FileReplaySource, OffsetTracker, RecordConsumer}
    // ndjson fixture: 3 files x 40 lines over 2 partitions
    val dir = Files.createTempDirectory("graft_recsrc_").toString
    (0 until 3).foreach { f =>
      val lines = (0 until 40).map(i =>
        s"""{"ts_ms":${1704067200000L + (f * 40 + i) * 250L},"event_type":"t${i % 3}","value":${i % 7}.25}""")
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, f"part$f%02d.json"),
        lines.mkString("\n").getBytes("UTF-8"))
    }
    val src = new FileReplaySource(dir, "graft-ingest", numPartitions = 2)
    assert(src.endOffsets.values.sum == 120L)

    def consumeAll(tracker: OffsetTracker, batchSize: Int,
        failOnce: Boolean = false): Seq[(Int, Long, String)] = {
      val seen = scala.collection.mutable.Buffer[(Int, Long, String)]()
      var failed = failOnce
      def handler(df: org.apache.spark.sql.DataFrame): Unit = {
        val rows = df.select("partition", "offset", "value").collect()
          .map(r => (r.getInt(0), r.getLong(1), new String(r.getAs[Array[Byte]](2), "UTF-8")))
        if (failed && rows.exists(_._1 == 1)) { failed = false; throw new RuntimeException("boom") }
        seen ++= rows
      }
      try { RecordConsumer.consumeAvailable(spark, src, tracker, batchSize)(handler); () }
      catch { case _: RuntimeException =>
        RecordConsumer.consumeAvailable(spark, src, tracker, batchSize)(handler); ()
      }
      seen.toSeq
    }

    // one-shot reference run
    val oneShot = consumeAll(new OffsetTracker(
      Files.createTempDirectory("graft_offs_a_").toString), batchSize = 16)
    // crash-and-resume run: partition-1's first batch throws once, stays
    // uncommitted, and is re-delivered on resume (at-least-once); the
    // DEDUPED record set must equal the one-shot run exactly
    val resumed = consumeAll(new OffsetTracker(
      Files.createTempDirectory("graft_offs_b_").toString), batchSize = 16,
      failOnce = true)
    assert(resumed.size >= oneShot.size) // replayed batch may duplicate
    assert(resumed.distinct.sortBy(r => (r._1, r._2)) ==
      oneShot.distinct.sortBy(r => (r._1, r._2)))
    // a fresh consume over a fully-committed tracker delivers nothing
    val tracker3 = new OffsetTracker(
      Files.createTempDirectory("graft_offs_c_").toString)
    consumeAll(tracker3, batchSize = 16)
    var extra = 0
    RecordConsumer.consumeAvailable(spark, src, tracker3)(df => extra += df.count().toInt)
    assert(extra == 0)
  }

  test("kafka-shaped source feeds the SAME pre-agg as the file source") {
    import graft.streaming.{FileReplaySource, OffsetTracker, RecordConsumer, StreamingIngest}
    import spark.implicits._
    val ev = graft.model.Tables.events(spark, sf)
      .select(col("event_id"), col("ts_ms"), col("event_type"), col("value"))
      .limit(500)
    val pqDir = Files.createTempDirectory("graft_par_src_").toString
    ev.write.mode("overwrite").parquet(pqDir)
    val jsonDir = Files.createTempDirectory("graft_json_src_").toString
    ev.coalesce(2).write.mode("overwrite").json(jsonDir)

    // file-source streaming path (the existing spine)
    val streamed = StreamingIngest.runFileStreamOnce(spark,
      pqDir, spark.read.parquet(pqDir).schema,
      src => StreamingIngest.preAggStream(src, col("ts_ms"), lit("events_value"),
        col("value"), Seq("attr_event_type" -> col("event_type"))),
      queryName = "parity_file_src")
      .select("chq_timestamp", "attr_event_type", "chq_rollup_sum", "chq_rollup_count")

    // kafka-shaped path: consume records, parse the json values, same build
    val recSrc = new FileReplaySource(jsonDir, "graft-parity", numPartitions = 3)
    val tracker = new OffsetTracker(Files.createTempDirectory("graft_offs_p_").toString)
    val batches = scala.collection.mutable.Buffer[org.apache.spark.sql.DataFrame]()
    RecordConsumer.consumeAvailable(spark, recSrc, tracker) { df =>
      batches += spark.read.json(
        df.select(col("value").cast("string").as("line")).as[String])
    }
    val consumed = batches.reduce(_ unionByName _)
    val cooked = consumed
      .groupBy((col("ts_ms") - col("ts_ms") % 10000L).as("chq_timestamp"),
        col("event_type").as("attr_event_type"))
      .agg(sum(col("value")).as("k_sum"),
        count(lit(1)).cast("double").as("k_count"))

    val j = streamed.join(cooked, Seq("chq_timestamp", "attr_event_type"), "full")
    val bad = j.filter(col("chq_rollup_sum").isNull || col("k_sum").isNull ||
      abs(col("chq_rollup_sum") - col("k_sum")) > 1e-6 ||
      col("chq_rollup_count") =!= col("k_count")).count()
    assert(bad == 0 && streamed.count() > 0)
  }

  test("consumeToSegments: crash-replay leaves exactly-once segment state") {
    import graft.streaming.{FileReplaySource, OffsetTracker, RecordConsumer}
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_c2s_").toString
    (0 until 2).foreach { f =>
      val lines = (0 until 50).map(i =>
        s"""{"ts_ms":${1704067200000L + (f * 50 + i) * 500L},"event_type":"t${i % 2}","value":${i}.5}""")
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, f"in$f%02d.json"),
        lines.mkString("\n").getBytes("UTF-8"))
    }
    val segDir = Files.createTempDirectory("graft_c2s_seg_").toString
    def build(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val parsed = spark.read.json(
        df.select(col("value").cast("string").as("line")).as[String])
      graft.ingest.MetricsPreAgg.preAggregate(parsed, col("ts_ms"),
        lit("rec_value"), col("value"),
        Seq("attr_event_type" -> col("event_type")), freqMs = 10000L,
        withSketch = false)
    }
    // run 1: the SECOND batch write throws once (after the first batch of
    // that partition committed) — segments for the failed batch may be
    // partially written, then its replay REWRITES the same directory
    val src = new FileReplaySource(dir, "graft-c2s", numPartitions = 2)
    val tracker = new OffsetTracker(Files.createTempDirectory("graft_c2s_off_").toString)
    var calls = 0
    def flakyWrite(df: org.apache.spark.sql.DataFrame, d: String): Unit = {
      calls += 1
      graft.ingest.Segments.writeMetricSegments(df, d)
      if (calls == 2) throw new RuntimeException("sink crash after write, before commit")
    }
    try {
      RecordConsumer.consumeToSegments(spark, src, tracker, segDir, build,
        flakyWrite, batchSize = 30)
      ()
    } catch { case _: RuntimeException =>
      RecordConsumer.consumeToSegments(spark, src, tracker, segDir, build,
        flakyWrite, batchSize = 30)
      ()
    }
    // every record counted exactly once despite the replayed batch
    val back = spark.read.parquet(segDir)
    assert(back.agg(sum(col("chq_rollup_count"))).head().getDouble(0) == 100.0)
    // nothing re-delivers on a fresh consume over the committed tracker
    var extra = 0L
    RecordConsumer.consumeAvailable(spark, src, tracker)(df => extra += df.count())
    assert(extra == 0L)
  }

  test("streaming as-of: state stays bounded by keys, not stream length") {
    import graft.streaming.{AsofEvent, StreamAsof}
    import spark.implicits._
    // 3000 time-ordered events on 10 keys across 3 arrival waves with a
    // SMALL watermark delay: released rows must leave the buffer, so the
    // terminal state is one carry row per key — independent of how long
    // the stream ran (the property that lets this run for months)
    val evs = (0 until 3000).map { i =>
      val ts = 1000L + i * 100L
      if (i % 3 == 0) AsofEvent(i % 10L, ts, 1, i.toLong, 0.0)
      else AsofEvent(i % 10L, ts, 0, 0L, (i % 50) * 0.5)
    }
    val dir = Files.createTempDirectory("graft_stream_asof_state_").toString
    StreamAsof.writeArrivalWaves(
      evs.grouped(1000).map(_.toDS(): org.apache.spark.sql.Dataset[AsofEvent]).toSeq,
      sentinelTs = 10000000L, dir = dir)
    val src = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[AsofEvent]].schema)
      .option("maxFilesPerTrigger", 1).parquet(dir).as[AsofEvent]
    val q = StreamAsof.backward(src, toleranceMs = 60000L,
      watermarkDelay = "5 seconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("stream_asof_state").start()
    try {
      q.processAllAvailable()
      val stateRows = q.recentProgress.toSeq
        .flatMap(p => Option(p.stateOperators).toSeq.flatMap(_.toSeq))
        .lastOption.map(_.numRowsTotal).getOrElse(-1L)
      // 10 real keys + the sentinel key carry one row each
      assert(stateRows >= 0 && stateRows <= 12,
        s"state should be ~keys, was $stateRows for 3000 events")
    } finally q.stop()
    // every probe emitted exactly once
    assert(spark.table("stream_asof_state").count() == evs.count(_.side == 1))
  }

  test("streaming as-of enrichment equals the batch as-of join, ties and tolerance included") {
    import graft.streaming.{AsofEvent, StreamAsof}
    import graft.ops.AsofJoin
    import spark.implicits._
    val tol = 2400L // below the fixture's exact 2500 ms per-key slot stride
    // tie-heavy interleaved probes/samples on 5 keys: ts on a 500 ms grid
    // so probe==sample and sample==sample timestamp collisions both occur
    val evs = (0 until 300).map { i =>
      val key = i % 5L
      val ts = 1000L + (i * 7919L) % 200 * 500L
      if (i % 3 == 0) AsofEvent(key, ts, 1, probe_id = i.toLong, value = 0.0)
      else AsofEvent(key, ts, 0, probe_id = 0L, value = (i % 50) * 1.5)
    }
    val dir = Files.createTempDirectory("graft_stream_asof_").toString
    // four arrival waves in scrambled time order + a far-future sentinel
    // sample on an unused key: the watermark (2 min delay covers the whole
    // real span, so nothing is late) passes every probe and the engine's
    // no-data batch fires the event-time timeouts that drain quiet keys
    StreamAsof.writeArrivalWaves(
      evs.grouped(75).map(_.toDS(): org.apache.spark.sql.Dataset[AsofEvent]).toSeq,
      sentinelTs = 10000000L, dir = dir)
    val src = spark.readStream.schema(implicitly[org.apache.spark.sql.Encoder[AsofEvent]].schema)
      .option("maxFilesPerTrigger", 1).parquet(dir).as[AsofEvent]
    val q = StreamAsof.backward(src, toleranceMs = tol,
      watermarkDelay = "2 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("stream_asof").start()
    try q.processAllAvailable() finally q.stop()
    def norm(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))
    val got = spark.table("stream_asof")
      .select("key", "probe_id", "ts_ms", "asof_ts", "asof_value")
      .collect().map(norm).toSet
    val probes = evs.filter(_.side == 1)
      .map(e => (e.key, e.probe_id, e.ts_ms)).toDF("key", "probe_id", "ts_ms")
    val samples = evs.filter(_.side == 0)
      .map(e => (e.key, e.ts_ms, e.value)).toDF("key", "sts", "value")
    val want = AsofJoin.backward(probes, samples, "key", "ts_ms", "sts",
        payloadCols = Seq("value"), tieBreak = "value", toleranceMs = tol)
      .select(col("key"), col("probe_id"), col("ts_ms"),
        col("asof_ts"), col("asof_value"))
      .collect().map(norm).toSet
    assert(got == want,
      s"stream=${got.size} batch=${want.size} diff=${(got diff want).take(3)} ${(want diff got).take(3)}")
    assert(want.exists(_._4.isEmpty) && want.exists(_._4.nonEmpty))

    // FORWARD direction over the same arrival history: earliest sample
    // at-or-after each probe, same tie and tolerance rules as the batch
    // mirror (liveness nulls come from the watermark proof, not a guess)
    val qf = StreamAsof.forward(
      spark.readStream.schema(implicitly[org.apache.spark.sql.Encoder[AsofEvent]].schema)
        .option("maxFilesPerTrigger", 1).parquet(dir).as[AsofEvent],
      toleranceMs = tol, watermarkDelay = "2 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("stream_asof_fwd").start()
    try qf.processAllAvailable() finally qf.stop()
    val gotF = spark.table("stream_asof_fwd")
      .filter(col("key") =!= 999L) // the sentinel key's own probe-free row
      .select("key", "probe_id", "ts_ms", "asof_ts", "asof_value")
      .collect().map(norm).toSet
    val wantF = AsofJoin.forward(probes, samples, "key", "ts_ms", "sts",
        payloadCols = Seq("value"), tieBreak = "value", toleranceMs = tol)
      .select(col("key"), col("probe_id"), col("ts_ms"),
        col("asof_ts"), col("asof_value"))
      .collect().map(norm).toSet
    assert(gotF == wantF,
      s"fwd stream=${gotF.size} batch=${wantF.size} diff=${(gotF diff wantF).take(3)} ${(wantF diff gotF).take(3)}")
    assert(wantF.exists(_._4.isEmpty) && wantF.exists(_._4.nonEmpty))
  }

  test("streaming fingerprint: trie state carries across micro-batches; " +
      "extension-suffix order asymmetry matches the reference trie") {
    import graft.ops.FingerprintCompat
    import graft.streaming.StreamingFingerprint
    import spark.implicits._

    // ---- cross-batch carry: base template in batch 1, its "+retry"
    // extension ONLY in batch 2. With one stream-lifetime trie the
    // extension walks the batch-1 path and Jaccard-merges into the base
    // cluster; a per-batch trie would mint hash(extension-items) instead.
    val base = (0 until 40)
      .map(i => (i.toLong, s"INFO click request user=$i handled /api/v4/do?id=$i in ${i % 9}ms"))
    val ext = (100 until 140)
      .map(i => (i.toLong, s"INFO click request user=$i handled /api/v4/do?id=$i in ${i % 9}ms retry"))
    // two appends -> two files in one dir -> two micro-batches
    // (maxFilesPerTrigger=1; file order follows append order)
    val in2 = Files.createTempDirectory("graft_sfpc_in_").toString
    base.toDF("id", "line").coalesce(1).write.mode("append").parquet(in2)
    ext.toDF("id", "line").coalesce(1).write.mode("append").parquet(in2)
    val out = Files.createTempDirectory("graft_sfpc_out_").toString
    val ckpt = Files.createTempDirectory("graft_sfpc_ck_").toString
    val src = spark.readStream
      .schema(base.toDF("id", "line").schema)
      .option("maxFilesPerTrigger", 1).parquet(in2)
    val q = StreamingFingerprint.fingerprintStream(src, "line", out, ckpt)
    try q.awaitTermination() finally if (q.isActive) q.stop()
    val got = spark.read.parquet(out)
    assert(got.count() == 80)
    // ONE cluster across both batches (carry + Jaccard merge)
    assert(got.select("fpc_fingerprint").distinct().count() == 1,
      "extension batch minted a new cluster — trie state not carried")
    // and its id is the batch-1 base hash, not the extension hash
    val baseItems = FingerprintCompat.tokenizeInput(base.head._2)._1
    assert(got.select("fpc_fingerprint").head().getLong(0) ==
      FingerprintCompat.fingerprintHash(baseItems, Nil))

    // ---- the documented asymmetry (why the it-row uses symmetric
    // divergence): extension FIRST, then base — the base consumes a
    // strict prefix of the trie path, lands on an interior node with an
    // empty leaf, and mints its own cluster (reference cluster()
    // semantics: exact-walk beats subtree scan).
    val cm = new FingerprintCompat.TrieClusterManager(0.5)
    val extItems = FingerprintCompat.tokenizeInput(ext.head._2)._1
    val fpExt = cm.cluster(extItems)
    val fpBase = cm.cluster(baseItems)
    assert(fpExt != fpBase, "prefix-after-extension should mint a new cluster")
    // base first, extension second: merge (the carry test's shape)
    val cm2 = new FingerprintCompat.TrieClusterManager(0.5)
    val fpBase2 = cm2.cluster(baseItems)
    assert(cm2.cluster(extItems) == fpBase2)
  }

  test("change-driven TrieStore snapshots: repeated-template batches write no generations") {
    import graft.ops.{FingerprintCompat, TrieStore}
    import graft.streaming.StreamingFingerprint
    import spark.implicits._
    def lines(word: String, lo: Int): Seq[(Long, String)] = (lo until lo + 20)
      .map(i => (i.toLong, s"INFO click $word user=$i handled /api/v4/do?id=$i in ${i % 9}ms"))
    val stateDir = Files.createTempDirectory("graft_triestore_cd_").toString
    val in = Files.createTempDirectory("graft_sfpc_cd_in_").toString
    val schema = lines("request", 0).toDF("id", "line").schema
    // five micro-batches: new template, repeat, symmetric variant
    // (token-set shrink), repeat, repeat — only batches 0 and 2 change
    // the trie structurally
    Seq(lines("request", 0), lines("request", 100), lines("fetch", 200),
      lines("request", 300), lines("request", 400)).foreach { b =>
      b.toDF("id", "line").coalesce(1).write.mode("append").parquet(in)
    }
    val out = Files.createTempDirectory("graft_sfpc_cd_out_").toString
    val q = StreamingFingerprint.fingerprintStream(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(in),
      "line", out, Files.createTempDirectory("graft_sfpc_cd_ck_").toString,
      stateDir = Some(stateDir))
    try q.awaitTermination() finally if (q.isActive) q.stop()
    def gens(): Seq[String] = {
      val d = new java.io.File(stateDir)
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("gen-"))
        .map(_.getName).sorted.toSeq
    }
    // 5 batches, 2 generation writes — count-only batches skipped
    assert(gens() == Seq("gen-000000000", "gen-000000002"),
      s"expected change-driven generations, got ${gens()}")
    val fpBase = spark.read.parquet(out)
      .select("fpc_fingerprint").distinct().collect().map(_.getLong(0)).toSeq
    assert(fpBase.size == 1, "request/fetch variants should share one cluster")

    // restart on the variant only: the restored trie resolves it to the
    // SAME cluster id, and (no structural change) writes nothing new
    val in2 = Files.createTempDirectory("graft_sfpc_cd_in2_").toString
    lines("fetch", 500).toDF("id", "line").coalesce(1)
      .write.mode("append").parquet(in2)
    val out2 = Files.createTempDirectory("graft_sfpc_cd_out2_").toString
    val q2 = StreamingFingerprint.fingerprintStream(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(in2),
      "line", out2, Files.createTempDirectory("graft_sfpc_cd_ck2_").toString,
      stateDir = Some(stateDir))
    try q2.awaitTermination() finally if (q2.isActive) q2.stop()
    val fps2 = spark.read.parquet(out2)
      .select("fpc_fingerprint").distinct().collect().map(_.getLong(0)).toSeq
    assert(fps2 == fpBase, s"restart lost the trie: $fps2 != $fpBase")
    assert(gens() == Seq("gen-000000000", "gen-000000002"),
      "a count-only restart batch wrote a snapshot generation")
  }

  test("trie state survives a stream restart via TrieStore; snapshot round-trips") {
    import graft.ops.{FingerprintCompat, TrieStore}
    import graft.streaming.StreamingFingerprint
    import spark.implicits._

    val base = (0 until 30)
      .map(i => (i.toLong, s"INFO click request user=$i handled /api/v4/do?id=$i in ${i % 9}ms"))
    val ext = (100 until 130)
      .map(i => (i.toLong, s"INFO click request user=$i handled /api/v4/do?id=$i in ${i % 9}ms retry"))
    val stateDir = Files.createTempDirectory("graft_triestore_").toString

    // ---- run 1: base templates only, persisted
    val in1 = Files.createTempDirectory("graft_sfpc_r1_").toString
    base.toDF("id", "line").coalesce(1).write.mode("append").parquet(in1)
    val out1 = Files.createTempDirectory("graft_sfpc_r1o_").toString
    val q1 = StreamingFingerprint.fingerprintStream(
      spark.readStream.schema(base.toDF("id", "line").schema)
        .option("maxFilesPerTrigger", 1).parquet(in1),
      "line", out1, Files.createTempDirectory("graft_sfpc_r1k_").toString,
      stateDir = Some(stateDir))
    try q1.awaitTermination() finally if (q1.isActive) q1.stop()
    val fpBase = spark.read.parquet(out1)
      .select("fpc_fingerprint").head().getLong(0)

    // ---- run 2 (a RESTART: fresh session object): extension templates
    // only. With the restored trie they merge into run 1's cluster; a
    // cold trie would mint hash(extension-items) instead.
    val in2 = Files.createTempDirectory("graft_sfpc_r2_").toString
    ext.toDF("id", "line").coalesce(1).write.mode("append").parquet(in2)
    val out2 = Files.createTempDirectory("graft_sfpc_r2o_").toString
    val q2 = StreamingFingerprint.fingerprintStream(
      spark.readStream.schema(ext.toDF("id", "line").schema)
        .option("maxFilesPerTrigger", 1).parquet(in2),
      "line", out2, Files.createTempDirectory("graft_sfpc_r2k_").toString,
      stateDir = Some(stateDir))
    try q2.awaitTermination() finally if (q2.isActive) q2.stop()
    val fps2 = spark.read.parquet(out2)
      .select("fpc_fingerprint").distinct().collect().map(_.getLong(0)).toSeq
    assert(fps2 == Seq(fpBase),
      s"restart lost the trie: run-2 fps $fps2 != run-1 cluster $fpBase")

    // ---- snapshot/restore round-trip preserves full cluster state
    val reg = new FingerprintCompat.TenantRegistry(0.5)
    TrieStore.load(spark, stateDir, reg)
    val cm = reg.tenant("")
    val snap = cm.snapshot()
    assert(snap.nonEmpty)
    val reg2 = new FingerprintCompat.TenantRegistry(0.5)
    snap.foreach { case (p, cs) => reg2.tenant("").restoreLeaf(p, cs) }
    assert(reg2.tenant("").snapshot() == snap)

    // ---- multi-tenant stream: org isolation holds across batches AND
    // across a persisted restart (the registry snapshot carries every
    // tenant's trie)
    val stateDirM = Files.createTempDirectory("graft_triestore_mt_").toString
    val b1 = base.take(20).map { case (id, l) => (id, "acme", l) }
    val b2 = ext.take(20).map { case (id, l) => (id, "acme", l) } ++
      ext.take(20).map { case (id, l) => (id + 1000, "globex", l) }
    def runOrg(rows: Seq[(Long, String, String)]): String = {
      val in = Files.createTempDirectory("graft_sfpc_mt_in_").toString
      rows.toDF("id", "org", "line").coalesce(1)
        .write.mode("append").parquet(in)
      val out = Files.createTempDirectory("graft_sfpc_mt_out_").toString
      val q = StreamingFingerprint.fingerprintStreamByOrg(
        spark.readStream.schema(rows.toDF("id", "org", "line").schema)
          .option("maxFilesPerTrigger", 1).parquet(in),
        "line", "org", out,
        Files.createTempDirectory("graft_sfpc_mt_k_").toString,
        stateDir = Some(stateDirM))
      try q.awaitTermination() finally if (q.isActive) q.stop()
      out
    }
    val o1 = runOrg(b1)
    val acmeBase = spark.read.parquet(o1)
      .select("fpc_fingerprint").head().getLong(0)
    val o2 = runOrg(b2) // restart: fresh session, restored registry
    val byOrg = spark.read.parquet(o2).groupBy("org")
      .agg(org.apache.spark.sql.functions
        .collect_set("fpc_fingerprint").as("fps"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSet).toMap
    // acme's extension merges into acme's RESTORED base cluster;
    // globex, seeing only the extension, mints its own cluster
    assert(byOrg("acme") == Set(acmeBase), s"acme: ${byOrg("acme")}")
    val extFp = FingerprintCompat.fingerprintHash(
      FingerprintCompat.tokenizeInput(ext.head._2)._1, Nil)
    assert(byOrg("globex") == Set(extFp),
      s"globex leaked acme's cluster: ${byOrg("globex")}")

    // ---- generation lifecycle: repeated saves sweep to the two newest
    // complete generations; the newest always wins the load
    val dir2 = Files.createTempDirectory("graft_triestore_gens_").toString
    (0 until 4).foreach { g =>
      reg.tenant("").cluster(Seq("gen", s"marker$g"))
      TrieStore.save(spark, reg, dir2, g.toLong)
    }
    val gens = new java.io.File(dir2).listFiles()
      .filter(_.getName.startsWith("gen-")).map(_.getName).sorted.toSeq
    assert(gens == Seq("gen-000000002", "gen-000000003"),
      s"sweep kept $gens")
    val reg3 = new FingerprintCompat.TenantRegistry(0.5)
    assert(TrieStore.load(spark, dir2, reg3) == 3L)
    // the newest generation carries every marker cluster added so far
    val toks = reg3.tenant("").snapshot().flatMap(_._2.flatMap(_._2))
    (0 until 4).foreach(g => assert(toks.contains(s"marker$g")))
  }
}
