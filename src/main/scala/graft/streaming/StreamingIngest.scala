package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Structured-Streaming ingest mode (reference semantics: micro-batch,
  * at-least-once, event-driven — docs/design/OVERVIEW.md:38-55; the
  * reference's S3→Kafka trigger maps to a file/Kafka source with
  * Trigger.AvailableNow; the 10 s ingest pre-agg maps to a tumbling window).
  *
  * The reference has no watermark concept (data is bucketed by its own
  * timestamp and segments are idempotently replaced); `withWatermark` here
  * bounds state for continuous mode. `foreachBatch(writeMetricSegments)`
  * reproduces the segment-replace pattern.
  */
object StreamingIngest {

  /** raw event stream → 10 s pre-aggregated cooked metric rows.
    * tsMs must be a LongType epoch-ms column.
    */
  def preAggStream(raw: DataFrame, tsMs: Column, name: Column, value: Column,
      labels: Seq[(String, Column)], freqMs: Long = 10000L,
      watermark: String = "10 minutes", withSketch: Boolean = false): DataFrame = {
    val withTs = raw
      .withColumn("__event_time", timestamp_millis(tsMs))
      .withColumn("metric_name", name)
      .withColumn("__v", value.cast("double"))
    val labeled = labels.foldLeft(withTs) { case (df, (k, v)) =>
      df.withColumn(k, v.cast("string"))
    }
    val groupCols = Seq(window(col("__event_time"), s"${freqMs / 1000} seconds").as("__w"),
      col("metric_name")) ++ labels.map { case (k, _) => col(k) }
    // chq_sketch parity with the batch pre-agg (MetricsPreAgg): the
    // DDSketch UDAF is a TypedImperativeAggregate, so the state store
    // carries its serialized buffer per open window; bucket counts are
    // merge-order-insensitive, so stream == batch read-outs exactly
    val aggs = Seq(
      sum(col("__v")).as("chq_rollup_sum"),
      count(lit(1)).cast("double").as("chq_rollup_count"),
      min(col("__v")).as("chq_rollup_min"),
      max(col("__v")).as("chq_rollup_max")) ++
      (if (withSketch)
        Seq(graft.sketch.functions.ddsketch_agg(col("__v")).as("chq_sketch"))
      else Nil)
    labeled
      .withWatermark("__event_time", watermark)
      .groupBy(groupCols: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("chq_timestamp", unix_millis(col("__w.start")))
      .drop("__w")
  }

  /** foreachBatch segment-write sink with offset bookkeeping — the role of
    * the reference's Kafka consumer + `kafka_offset_tracker` table
    * (lrdb/queries/kafka_offset_tracker.sql, common_consumer.go, atomic
    * swap at metric_rollup_processor.go:486-555). Source offsets live in
    * Spark's checkpoint (works unchanged over a Kafka source —
    * `spark.readStream.format("kafka")` — no broker exists in this
    * harness, so tests drive it with a file source). Each micro-batch
    * writes its cooked rows under `ingest_batch=<id>/` — a replayed batch
    * deletes and rewrites ONLY its own directory, so delivery is
    * exactly-once at the batch level — and appends an idempotent
    * (batch_id, rows, max_ts) record to a commit log, the queryable
    * offset-tracker analog.
    */
  def segmentWriteStream(rawStream: DataFrame, build: DataFrame => DataFrame,
      segDir: String, commitDir: String, checkpointDir: String,
      writeSegments: (DataFrame, String) => Unit =
        (df, dir) => graft.ingest.Segments.writeMetricSegments(df, dir),
      indexAfterBatch: Boolean = false,
      rollupTiers: Seq[Long] = Nil, baseFreqMs: Long = 10000L)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(commitDir))
    rawStream.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val cooked = build(batch).cache()
        try {
          val n = cooked.count()
          if (n > 0) {
            val batchDir = s"$segDir/ingest_batch=$batchId"
            val p = new org.apache.hadoop.fs.Path(batchDir)
            val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
            fs.delete(p, true) // replay rewrites its own dir only
            writeSegments(cooked, batchDir)
            // the per-batch fingerprint registration of the reference's
            // ingest workers: index ONLY this batch's new files (a replay
            // re-registers its rewritten files; stale rows are lossless)
            if (indexAfterBatch)
              graft.ingest.FingerprintIndex.indexNewFiles(spark, segDir)
            // coalesce: an all-null chq_timestamp batch must not NPE after
            // segments were written but before the commit record lands
            val maxTs = cooked.agg(coalesce(max(col("chq_timestamp")), lit(-1L)))
              .head().getLong(0)
            maintainRollups(spark, cooked, segDir, rollupTiers, baseFreqMs,
              maxTs)
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(commitDir, f"batch_$batchId%09d.json"),
              s"""{"batch_id":$batchId,"rows":$n,"max_ts":$maxTs}""")
            ()
          }
        } finally { cooked.unpersist(); () }
      }
      .start()
  }

  /** Incremental rollup maintenance inside the commit loop — the
    * streaming counterpart of [[graft.ingest.MetricsPreAgg.rollupChain]]
    * (reference rolls 10s→60s→…→3600s as segments arrive,
    * metric_rollup_processor.go:571-708). After a batch lands its base
    * tier, every (tier, UTC day) the batch TOUCHED is rebuilt from the
    * on-disk base tier and swapped in as one idempotent whole-day unit:
    * the day's `dateint=` partition under `ingest_batch=rollup-<tier>/`
    * is deleted, then ONE dynamic-partition write per tier lands every
    * touched day (r18: the previous form ran one read+write JOB per
    * (tier, day) — a 3-batch 7-day stream paid 21 write jobs where 3
    * suffice; the rewrite unit and the delete-then-rewrite exactly-once
    * contract are unchanged, only the job granularity is per tier now).
    * One window DID widen with that consolidation (r18 ADVICE): all
    * touched days of a tier are deleted before the single per-tier
    * write, so a crash mid-write leaves every touched day of that tier
    * missing — under a previously-written watermark that still claims
    * them — until batch replay re-lands them; the old per-day loop
    * bounded that transient gap to one (tier, day). The atomicity unit
    * is per (tier, batch), the CONVERGENCE unit stays per (tier, day).
    * Rebuilding whole tier-days keeps the directory count bounded (days,
    * not buckets) while the rebuild read stays dateint-partition-pruned
    * to the touched days; every chain tier divides 24 h, so a coarse
    * bucket never straddles a rebuilt day. A replayed batch rewrites its
    * base dir first and then re-rebuilds the same days, so rollups
    * converge to the base tier regardless of crash/replay interleaving.
    */
  private def maintainRollups(spark: SparkSession, cooked: DataFrame,
      segDir: String, rollupTiers: Seq[Long], baseFreqMs: Long,
      batchMaxTs: Long): Unit =
    if (rollupTiers.nonEmpty) {
      val days = cooked
        .select(graft.ingest.Segments.dateint(col("chq_timestamp")).as("d"))
        .distinct().collect().map(_.getInt(0)).sorted
      val fs = new org.apache.hadoop.fs.Path(segDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      for (tier <- rollupTiers) {
        val baseDays = spark.read.parquet(segDir)
          .filter(col("freq") === baseFreqMs &&
            col("dateint").isin(days.map(Integer.valueOf): _*))
          .drop("dateint", "freq", "ingest_batch")
        val rolled = graft.ingest.MetricsPreAgg.rollup(baseDays, tier)
        val root = s"$segDir/ingest_batch=rollup-$tier"
        days.foreach { d =>
          // whole-(tier, day) delete-then-rewrite unit, as before; also
          // clear a legacy per-day dir so a store written by the old
          // naming never double-counts after an upgrade
          fs.delete(new org.apache.hadoop.fs.Path(s"$root/dateint=$d"), true)
          fs.delete(new org.apache.hadoop.fs.Path(
            s"$segDir/ingest_batch=rollup-$tier-$d"), true)
        }
        graft.ingest.Segments.writeMetricSegments(rolled, root)
      }
      // the rebuild loop re-rolled every day this batch touched from the
      // just-landed base tier, so each tier now reflects every base row
      // with ts <= batchMaxTs — record the rolled-through watermark the
      // query/discovery doors refine their freshness bound with
      // ([[graft.api.TierFreshness]]). Monotonic write: an out-of-order
      // (all-late-data) batch never regresses the claim.
      if (batchMaxTs >= 0)
        rollupTiers.foreach(t => graft.api.TierFreshness
          .writeWatermark(spark, segDir, t, batchMaxTs + 1))
    }

  /** run a stream from a parquet directory to completion (AvailableNow),
    * materializing into an in-memory table; returns the result frame.
    * Local-harness helper — a production deploy would writeStream
    * .foreachBatch(Segments.writeMetricSegments).
    */
  def runFileStreamOnce(spark: SparkSession, inputDir: String, schema: StructType,
      build: DataFrame => DataFrame, queryName: String): DataFrame = {
    val src = spark.readStream.schema(schema).parquet(inputDir)
    val q = build(src).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
    try {
      q.processAllAvailable()
    } finally q.stop()
    spark.table(queryName)
  }
}
