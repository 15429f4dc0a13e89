package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{Discovery, MetricSegments, StepPolicy}
import graft.ingest.{MetricsPreAgg, Segments}
import graft.model.Tables
import graft.promql.{Engine, MetricStore}

/** Integration spine: end-to-end query-over-SEGMENTS rows. Every other
  * PromQL/LogQL oracle evaluates the engine against an in-memory derivation
  * of `events`; these rows exercise the storage contract itself — write
  * real multi-tier partitioned segments (dateint=/freq= layout,
  * [[Segments.writeMetricSegments]]), pick the tier with
  * [[StepPolicy.paramsFor]]/[[StepPolicy.scanTier]] (partition pruning on
  * both keys), answer through [[Engine.query]], and hash-match DuckDB
  * reading THE SAME parquet files via read_parquet(hive_partitioning).
  * Mirrors the reference lifecycle steps 4-5
  * (queryapi/metrics_evaluator.go:414-536, queryapi/dates.go:23-42).
  *
  * The oracle SQL embeds the segment directory path; it is rendered when
  * [[graft.Verify]] dumps oracle_sql.json — AFTER the queries ran — so the
  * path always points at the directory the just-run queries wrote
  * (per-scale-factor, keyed by the sf dir name).
  */
object ItQueries extends Catalog {
  // 2024-01-01T00:00:00Z .. +14d (dense half of events)
  private val Start = 1704067200000L
  private val End = Start + 14L * 86400000L
  private val H4 = 4L * 3600000L
  private val HourMs = 3600000L

  private def tmpRoot: String = sys.props.getOrElse("java.io.tmpdir", "/tmp")
  private def tag(d: String): String = new java.io.File(d).getName
  // defaults point at the official correctness SF so an out-of-order render
  // (oracle before query) still names the right run
  @volatile private var segRootCur: String = s"$tmpRoot/graft_it_segments_sf0.01"
  @volatile private var freshRootCur: String = s"$tmpRoot/graft_it_fresh_sf0.01"
  @volatile private var intraRootCur: String = s"$tmpRoot/graft_it_intra_sf0.01"
  /** start of the newest (un-rolled-up) day of the fresh-tier fixture */
  private val FreshB = End - 86400000L
  /** intraday fixture: 5-day window, hourly rollup through 4.5 days */
  private val IntraEnd = Start + 5L * 86400000L
  private val IntraB = Start + 4L * 86400000L + 12L * HourMs
  /** batch-maintenance fixture: rollups stop (and stamp) at BatchCut */
  private val BatchCut = Start + 3L * 86400000L + 6L * HourMs
  @volatile private var batchRootCur: String = s"$tmpRoot/graft_it_bmaint_sf0.01"
  @volatile private var unionRootCur: String = s"$tmpRoot/graft_it_union_sf0.01"
  @volatile private var logSegRootCur: String = s"$tmpRoot/graft_it_logseg_sf0.01"

  private val built = scala.collection.concurrent.TrieMap.empty[(String, String), Boolean]

  private def deleteDir(s: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    ()
  }

  /** write the 10 s base tier + the 3600 s rollup tier once per session+sf */
  private def ensureSegments(s: SparkSession, d: String): String = {
    val dir = s"$tmpRoot/graft_it_segments_${tag(d)}"
    segRootCur = dir
    built.getOrElseUpdate((s.sparkContext.applicationId, dir), {
      deleteDir(s, dir)
      // segments cover the queried period plus a day of margin — the
      // engine-side reads are dateint-pruned to this window anyway, and the
      // oracle reads the same written files, so both sides stay consistent
      val ev = Tables.events(s, d)
        .filter(col("ts_ms") >= Start - 86400000L && col("ts_ms") < End + 86400000L)
      val base = MetricsPreAgg.preAggregate(
        ev, col("ts_ms"), lit("events_value"), col("value"),
        Seq("attr_event_type" -> col("event_type")), freqMs = 10000L,
        withSketch = false)
      Segments.writeMetricSegments(base, dir)
      Segments.writeMetricSegments(MetricsPreAgg.rollup(base, 3600000L), dir)
      true
    })
    dir
  }

  /** two batches with DISJOINT attr_* column sets in one segment dir —
    * the per-segment dynamic-schema-union case (reference
    * writer_metrics_duckdb.go:262, logs_ingest_duckdb.go:265-325)
    */
  private def ensureUnionSegments(s: SparkSession, d: String): String = {
    val dir = s"$tmpRoot/graft_it_union_${tag(d)}"
    unionRootCur = dir
    built.getOrElseUpdate((s.sparkContext.applicationId, dir), {
      deleteDir(s, dir)
      val ev = Tables.events(s, d)
        .filter(col("ts_ms") >= Start - 86400000L && col("ts_ms") < End + 86400000L)
      val a = MetricsPreAgg.preAggregate(
        ev.filter(col("event_id") % 2 === 0), col("ts_ms"), lit("events_value"),
        col("value"), Seq("attr_event_type" -> col("event_type")),
        freqMs = 60000L, withSketch = false)
      val b = MetricsPreAgg.preAggregate(
        ev.filter(col("event_id") % 2 =!= 0), col("ts_ms"), lit("events_value"),
        col("value"), Seq("attr_zone" -> concat(lit("z"), col("user_id") % 3)),
        freqMs = 60000L, withSketch = false)
      Segments.writeMetricSegments(a, dir)
      Segments.writeMetricSegments(b, dir)
      true
    })
    dir
  }

  /** A rollup-LAGGED two-tier store: the 10 s base tier covers the whole
    * window, the 3600 s rollup tier STOPS one day short — the newest day
    * exists only at 10 s, exactly the state a job-driven rollup chain
    * leaves a live lake in between runs. Gates the r17 freshness
    * contract on both consumers: the query door's opt-in fresh-tail
    * union ([[MetricSegments]] `freshTail`,
    * [[graft.api.TierFreshness.queryTierCond]]) and discovery's
    * per-dateint coarsest-present tier plan
    * ([[graft.api.Discovery.segmentScan]]).
    */
  private def ensureFreshSegments(s: SparkSession, d: String): String = {
    val dir = s"$tmpRoot/graft_it_fresh_${tag(d)}"
    freshRootCur = dir
    built.getOrElseUpdate((s.sparkContext.applicationId, dir), {
      deleteDir(s, dir)
      val ev = Tables.events(s, d)
        .filter(col("ts_ms") >= Start - 86400000L && col("ts_ms") < End)
      val base = MetricsPreAgg.preAggregate(
        ev, col("ts_ms"), lit("events_value"), col("value"),
        Seq("attr_event_type" -> col("event_type")), freqMs = 10000L,
        withSketch = false)
      Segments.writeMetricSegments(base, dir)
      // rollup lag: the hourly tier only below the fresh-day boundary
      Segments.writeMetricSegments(
        MetricsPreAgg.rollup(base.filter(col("chq_timestamp") < FreshB),
          3600000L), dir)
      true
    })
    dir
  }

  /** A HALF-ROLLED-day store with an explicit rolled-through watermark:
    * the hourly rollup covers 4.5 of the window's 5 days — partitions
    * EXIST for the boundary day, so the partition-derived day-granular
    * bound alone would claim it covered and drop its fresh half — and
    * the rollup job recorded `writeWatermark(3600000, IntraB)` the way
    * the streaming rebuild does after every batch. The doors must split
    * at the watermark, not the day.
    */
  private def ensureIntradaySegments(s: SparkSession, d: String): String = {
    val dir = s"$tmpRoot/graft_it_intra_${tag(d)}"
    intraRootCur = dir
    built.getOrElseUpdate((s.sparkContext.applicationId, dir), {
      deleteDir(s, dir)
      val ev = Tables.events(s, d)
        .filter(col("ts_ms") >= Start - 86400000L && col("ts_ms") < IntraEnd)
      val base = MetricsPreAgg.preAggregate(
        ev, col("ts_ms"), lit("events_value"), col("value"),
        Seq("attr_event_type" -> col("event_type")), freqMs = 10000L,
        withSketch = false)
      Segments.writeMetricSegments(base, dir)
      Segments.writeMetricSegments(
        MetricsPreAgg.rollup(base.filter(col("chq_timestamp") < IntraB),
          3600000L), dir)
      graft.api.TierFreshness.writeWatermark(s, dir, 3600000L, IntraB)
      true
    })
    dir
  }

  /** A store maintained by the BATCH rollup path
    * ([[graft.ingest.MetricsPreAgg.maintainRollupsBatch]], r17 VERDICT
    * #2): base ingested through BatchCut, one maintenance run (whole
    * (tier, day) rewrites + the stamped rolled-through watermark), then
    * MORE base data lands with no re-roll — the exact state a job-driven
    * lake sits in between maintenance runs. The default door must split
    * at the stamped watermark: rolled history from the hourly tier, the
    * tail (including the rolled boundary day's fresh remainder) from the
    * 10 s base.
    */
  private def ensureBatchMaintSegments(s: SparkSession, d: String): String = {
    val dir = s"$tmpRoot/graft_it_bmaint_${tag(d)}"
    batchRootCur = dir
    built.getOrElseUpdate((s.sparkContext.applicationId, dir), {
      deleteDir(s, dir)
      val ev = Tables.events(s, d)
        .filter(col("ts_ms") >= Start - 86400000L && col("ts_ms") < IntraEnd)
      val base = MetricsPreAgg.preAggregate(
        ev, col("ts_ms"), lit("events_value"), col("value"),
        Seq("attr_event_type" -> col("event_type")), freqMs = 10000L,
        withSketch = false)
      Segments.writeMetricSegments(base.filter(col("chq_timestamp") < BatchCut),
        dir)
      MetricsPreAgg.maintainRollupsBatch(s, dir, rollupTiers = Seq(3600000L))
      Segments.writeMetricSegments(
        base.filter(col("chq_timestamp") >= BatchCut), dir)
      true
    })
    dir
  }

  /** The batch-maintained lake through the DEFAULT door (fresh since
    * r18): the engine splits at the watermark the batch maintenance
    * stamped — the oracle re-derives that bound from the same store (the
    * maintenance claim is max-ingested-base-ts + 1, floored to the tier)
    * and replays the two disjoint slices.
    */
  private def tierFreshBatch(s: SparkSession, d: String): DataFrame = {
    val dir = ensureBatchMaintSegments(s, d)
    MetricSegments.query(s, dir, "sum by (attr_event_type) (events_value)",
      Start, IntraEnd)
      .withColumn("value", cents(col("value"), 100))
  }

  private def tierFreshBatchSql(dir: String): String =
    s"""WITH b AS (
       SELECT ((max(chq_timestamp) + 1) - ((max(chq_timestamp) + 1) % $HourMs))
              AS bnd
       FROM read_parquet('$dir/dateint=*/freq=10000/*.parquet',
                         hive_partitioning=1)
       WHERE chq_timestamp < $BatchCut),
     rows AS (
       SELECT chq_timestamp, attr_event_type, chq_rollup_sum
       FROM read_parquet('$dir/dateint=*/freq=3600000/*.parquet',
                         hive_partitioning=1), b
       WHERE chq_timestamp < b.bnd
       UNION ALL
       SELECT chq_timestamp, attr_event_type, chq_rollup_sum
       FROM read_parquet('$dir/dateint=*/freq=10000/*.parquet',
                         hive_partitioning=1), b
       WHERE chq_timestamp >= b.bnd)
     SELECT chq_timestamp - chq_timestamp % $HourMs AS ts, attr_event_type,
            CAST(round(sum(chq_rollup_sum) * 100, 0) AS BIGINT) / 100.0 AS value
     FROM rows
     WHERE chq_timestamp >= $Start AND chq_timestamp < $IntraEnd
     GROUP BY 1, 2"""

  /** log segments with a day-localized needle + fingerprint skip-index:
    * cooked logs over the window, every message on UTC day 2024-01-03
    * tagged with a marker token, written as dateint-partitioned segments,
    * then [[graft.ingest.FingerprintIndex.buildLogIndex]] — the ingest-side
    * registration step of the reference's fingerprint index.
    */
  private def ensureLogSegments(s: SparkSession, d: String): String = {
    val dir = s"$tmpRoot/graft_it_logseg_${tag(d)}"
    logSegRootCur = dir
    built.getOrElseUpdate((s.sparkContext.applicationId, dir), {
      deleteDir(s, dir)
      deleteDir(s, graft.ingest.FingerprintIndex.indexPath(dir))
      deleteDir(s, dir + ".aggfiles")
      val day3 = Start + 2L * 86400000L
      val logs = graft.model.Cooked.logs(s, d)
        .filter(col("chq_timestamp") >= Start - 86400000L &&
          col("chq_timestamp") < End + 86400000L)
        .withColumn("log_message",
          when(col("chq_timestamp") >= day3 && col("chq_timestamp") < day3 + 86400000L,
            concat(col("log_message"), lit(" trace=deadbeefcafe")))
            .otherwise(col("log_message")))
        .withColumn("chq_fingerprint",
          graft.ingest.LogFingerprint.fingerprint(col("log_message")))
      Segments.writeLogSegments(logs, dir, maxRecordsPerFile = 2000)
      graft.ingest.FingerprintIndex.buildLogIndex(s, dir)
      true
    })
    dir
  }

  /** segment scan → MetricStore: keep only the cooked-metrics contract
    * columns (partition keys and chq_rollup_freq/avg would otherwise leak
    * into the engine's label set)
    */
  private def storeFrom(scan: DataFrame): MetricStore = {
    val sys = Seq("chq_timestamp", "metric_name", "chq_tid", "chq_rollup_sum",
      "chq_rollup_count", "chq_rollup_min", "chq_rollup_max")
    val labels = scan.schema.fieldNames.filter(_.startsWith("attr_")).toSeq
    MetricStore(scan.select((sys ++ labels).map(col): _*))
  }

  /** exact integer-cents canonicalization (see PromQLQueries pq_rate) */
  private def cents(value: Column, scale: Double): Column =
    round(value * lit(scale), 0).cast("long") / lit(scale)

  // ---- queries -------------------------------------------------------------

  /** 14 d span → paramsFor picks the 1 h step → scanTier reads ONLY the
    * freq=3600000 partition (hourly rollup tier), dateint-pruned to the
    * effective range; sum-by-rate through the engine.
    */
  private def segRate(s: SparkSession, d: String): DataFrame = {
    val dir = ensureSegments(s, d)
    val p = StepPolicy.paramsFor(Start, End)
    require(p.stepMs == HourMs, s"14d span must select the hourly step, got ${p.stepMs}")
    val scan = StepPolicy.scanTier(s, dir, p.stepMs, p.startMs - H4, p.endMs)
    Engine.query("sum by (attr_event_type) (rate(events_value[4h]))",
      storeFrom(scan), p)
      .filter(!isnan(col("value")))
      .withColumn("value", cents(col("value"), H4 / 1000.0 * 100))
  }

  /** experimental-agg surface through the SAME segment spine: limitk's
    * deterministic md5 series selection over the step-policy-chosen hourly
    * tier — proves the round-6 function surface composes with tier
    * selection and partition pruning, not just in-memory stores
    */
  private def segLimitk(s: SparkSession, d: String): DataFrame = {
    val dir = ensureSegments(s, d)
    val p = StepPolicy.paramsFor(Start, End)
    val scan = StepPolicy.scanTier(s, dir, p.stepMs, p.startMs, p.endMs)
    Engine.query("limitk(2, events_value)", storeFrom(scan), p)
      .filter(!isnan(col("value")))
  }

  private def segLimitkSql(dir: String): String =
    s"""WITH step AS (
       SELECT chq_timestamp AS ts, attr_event_type,
              sum(chq_rollup_sum) AS bsum
       FROM read_parquet('$dir/dateint=*/freq=3600000/*.parquet',
                         hive_partitioning=1)
       WHERE chq_timestamp >= $Start AND chq_timestamp < $End
       GROUP BY 1, 2),
     r AS (
       SELECT ts, attr_event_type, bsum,
              row_number() OVER (PARTITION BY ts
                ORDER BY md5(attr_event_type), attr_event_type) AS rk
       FROM step)
     SELECT ts, attr_event_type, bsum AS value FROM r WHERE rk <= 2"""

  private def segRateSql(dir: String): String =
    s"""WITH step AS (
       SELECT chq_timestamp AS ts, attr_event_type,
              sum(chq_rollup_sum) AS bsum
       FROM read_parquet('$dir/dateint=*/freq=3600000/*.parquet',
                         hive_partitioning=1)
       WHERE chq_timestamp >= ${Start - H4} AND chq_timestamp < $End
       GROUP BY 1, 2),
     win AS (
       SELECT ts, attr_event_type, sum(bsum) OVER w AS wsum,
              min(ts) OVER w AS first_ts
       FROM step
       WINDOW w AS (PARTITION BY attr_event_type ORDER BY ts
                    RANGE BETWEEN ${H4 - HourMs} PRECEDING AND CURRENT ROW))
     SELECT ts, attr_event_type,
            CAST(round(wsum * 100, 0) AS BIGINT) / ${H4 / 1000.0 * 100} AS value
     FROM win
     WHERE first_ts = ts - ${H4 - HourMs} AND ts >= $Start AND ts < $End"""

  /** 1 h span → paramsFor picks the 10 s step → scanTier reads the
    * freq=10000 base tier, dateint-pruned to ONE day.
    */
  private def segBucket10s(s: SparkSession, d: String): DataFrame = {
    val dir = ensureSegments(s, d)
    val qEnd = Start + HourMs
    val p = StepPolicy.paramsFor(Start, qEnd)
    require(p.stepMs == 10000L, s"1h span must select the 10s step, got ${p.stepMs}")
    val scan = StepPolicy.scanTier(s, dir, p.stepMs, p.startMs, p.endMs)
    Engine.query("sum by (attr_event_type) (events_value)", storeFrom(scan), p)
  }

  private def segBucket10sSql(dir: String): String =
    s"""SELECT chq_timestamp AS ts, attr_event_type,
            sum(chq_rollup_sum) AS value
       FROM read_parquet('$dir/dateint=*/freq=10000/*.parquet',
                         hive_partitioning=1)
       WHERE chq_timestamp >= $Start AND chq_timestamp < ${Start + HourMs}
       GROUP BY 1, 2"""

  /** The tier-freshness contract end-to-end (r16 VERDICT next-round #3):
    * the 14 d span picks the hourly step and tier, but the hourly rollup
    * STOPS one day short of the window — with `freshTail = true` the
    * door unions the tier scan with the 10 s base tier past the
    * high-water mark ([[graft.api.TierFreshness.queryTierCond]]), so the
    * newest day's buckets come back instead of silently missing. The
    * oracle reads the SAME two disjoint tier slices; the engine's
    * associative bucket aggregation makes the union equal a completed
    * rollup's answer.
    */
  private def tierFresh(s: SparkSession, d: String): DataFrame = {
    val dir = ensureFreshSegments(s, d)
    val p = StepPolicy.paramsFor(Start, End)
    require(p.stepMs == HourMs, s"14d span must select the hourly step, got ${p.stepMs}")
    MetricSegments.query(s, dir, "sum by (attr_event_type) (events_value)",
      Start, End, freshTail = true)
      .withColumn("value", cents(col("value"), 100))
  }

  private def tierFreshSql(dir: String): String =
    s"""WITH rows AS (
       SELECT chq_timestamp, attr_event_type, chq_rollup_sum
       FROM read_parquet('$dir/dateint=*/freq=3600000/*.parquet',
                         hive_partitioning=1)
       WHERE chq_timestamp < $FreshB
       UNION ALL
       SELECT chq_timestamp, attr_event_type, chq_rollup_sum
       FROM read_parquet('$dir/dateint=*/freq=10000/*.parquet',
                         hive_partitioning=1)
       WHERE chq_timestamp >= $FreshB)
     SELECT chq_timestamp - chq_timestamp % $HourMs AS ts, attr_event_type,
            CAST(round(sum(chq_rollup_sum) * 100, 0) AS BIGINT) / 100.0 AS value
     FROM rows
     WHERE chq_timestamp >= $Start AND chq_timestamp < $End
     GROUP BY 1, 2"""

  /** The INTRA-DAY freshness refinement (r17): same contract as
    * [[tierFresh]] but the rollup stops MID-day and the store carries
    * the rollup job's explicit rolled-through watermark
    * ([[graft.api.TierFreshness.writeWatermark]], stamped by the
    * streaming rebuild after every batch). The partition-derived day
    * bound alone would claim the boundary day covered (its partitions
    * exist) and silently drop its fresh half; the door splits at the
    * watermark instead — rolled half from the hourly tier, fresh half
    * from the 10 s base — and the oracle reads the same two slices.
    */
  private def tierFreshIntraday(s: SparkSession, d: String): DataFrame = {
    val dir = ensureIntradaySegments(s, d)
    MetricSegments.query(s, dir, "sum by (attr_event_type) (events_value)",
      Start, IntraEnd, freshTail = true)
      .withColumn("value", cents(col("value"), 100))
  }

  private def tierFreshIntradaySql(dir: String): String =
    s"""WITH rows AS (
       SELECT chq_timestamp, attr_event_type, chq_rollup_sum
       FROM read_parquet('$dir/dateint=*/freq=3600000/*.parquet',
                         hive_partitioning=1)
       WHERE chq_timestamp < $IntraB
       UNION ALL
       SELECT chq_timestamp, attr_event_type, chq_rollup_sum
       FROM read_parquet('$dir/dateint=*/freq=10000/*.parquet',
                         hive_partitioning=1)
       WHERE chq_timestamp >= $IntraB)
     SELECT chq_timestamp - chq_timestamp % $HourMs AS ts, attr_event_type,
            CAST(round(sum(chq_rollup_sum) * 100, 0) AS BIGINT) / 100.0 AS value
     FROM rows
     WHERE chq_timestamp >= $Start AND chq_timestamp < $IntraEnd
     GROUP BY 1, 2"""

  /** Discovery freshness over the SAME lagged store (r16 VERDICT #2):
    * tag values through [[Discovery.segmentScan]]'s per-dateint
    * coarsest-present tier plan — rolled days from the hourly tier, the
    * un-rolled fresh day from the 10 s tier it still lives in. The
    * oracle replays exactly that union; `n` counts are tier-row counts
    * per the discovery contract (popularity ranking).
    */
  private def freshTagValues(s: SparkSession, d: String): DataFrame = {
    val dir = ensureFreshSegments(s, d)
    Discovery.tagValues(
      Discovery.segmentScan(s, dir, Start, End), "attr_event_type", Start, End)
  }

  private def freshTagValuesSql(dir: String): String =
    s"""WITH rows AS (
       SELECT chq_timestamp, attr_event_type
       FROM read_parquet('$dir/dateint=*/freq=3600000/*.parquet',
                         hive_partitioning=1)
       UNION ALL
       SELECT chq_timestamp, attr_event_type
       FROM read_parquet('$dir/dateint=*/freq=10000/*.parquet',
                         hive_partitioning=1)
       WHERE chq_timestamp >= $FreshB)
     SELECT attr_event_type AS tag_value, CAST(count(*) AS BIGINT) AS n
     FROM rows
     WHERE chq_timestamp >= $Start AND chq_timestamp < $End
       AND attr_event_type IS NOT NULL AND attr_event_type <> ''
     GROUP BY 1 ORDER BY n DESC, tag_value ASC LIMIT 1000"""

  /** query across two segments with disjoint attr_* sets: mergeSchema
    * union-by-name with NULL fill, matcher on a label only one batch
    * carries (absent ≡ "" per PromQL), null-label group preserved.
    */
  private def schemaUnion(s: SparkSession, d: String): DataFrame = {
    val dir = ensureUnionSegments(s, d)
    val p = StepPolicy.paramsFor(Start, End)
    val scan = s.read.option("mergeSchema", "true").parquet(dir)
      .filter(col("freq") === 60000L)
    Engine.query("""sum by (attr_event_type) (events_value{attr_zone!="z1"})""",
      storeFrom(scan), p)
      .withColumn("value", cents(col("value"), 100))
  }

  private def schemaUnionSql(dir: String): String =
    s"""WITH seg AS (
       SELECT * FROM read_parquet('$dir/dateint=*/freq=60000/*.parquet',
                                  hive_partitioning=1, union_by_name=true)),
     step AS (
       SELECT chq_timestamp - chq_timestamp % $HourMs AS ts,
              attr_event_type, sum(chq_rollup_sum) AS bsum
       FROM seg
       WHERE coalesce(attr_zone, '') <> 'z1'
         AND chq_timestamp >= $Start AND chq_timestamp < $End
       GROUP BY 1, 2)
     SELECT ts, attr_event_type,
            CAST(round(bsum * 100, 0) AS BIGINT) / 100 AS value
     FROM step WHERE ts >= $Start AND ts < $End"""

  /** Needle query through the fingerprint skip-index: `|= "deadbeefcafe"`
    * over 14 days of written log segments. The index prunes the scan to
    * the one dateint that can contain the needle (gate: require() on file
    * counts — the reference's segment-lookup behavior,
    * queryapi/logs_evaluator.go:233-424); the oracle reads EVERY segment
    * file and must agree, proving the pruning lossless.
    */
  private def logNeedle(s: SparkSession, d: String): DataFrame = {
    import graft.ingest.{FingerprintIndex => FI}
    import graft.logql.{LineFilter, LineFilterOp, LogPipeline}
    val dir = ensureLogSegments(s, d)
    val pipe = LogPipeline(Nil, List(LineFilter(LineFilterOp.Contains, "deadbeefcafe")))
    val scan = FI.scanLogs(s, dir, pipe)
    val allFiles = s.read.parquet(dir).inputFiles.length
    val readFiles = scan.inputFiles.length
    require(readFiles < allFiles,
      s"skip-index did not prune: reading $readFiles of $allFiles files")
    scan.filter(col("chq_timestamp") >= Start && col("chq_timestamp") < End &&
        col("log_message").contains("deadbeefcafe"))
      .groupBy(col("resource_service_name"))
      .agg(count(lit(1)).as("n"),
        min(col("chq_timestamp")).as("first_ts"),
        max(col("chq_timestamp")).as("last_ts"))
  }

  private def logNeedleSql(dir: String): String =
    s"""SELECT resource_service_name, count(*) AS n,
              min(chq_timestamp) AS first_ts, max(chq_timestamp) AS last_ts
       FROM read_parquet('$dir/dateint=*/*.parquet', hive_partitioning=1)
       WHERE log_message LIKE '%deadbeefcafe%'
         AND chq_timestamp >= $Start AND chq_timestamp < $End
       GROUP BY 1"""

  /** The HTTP/SSE serving layer under the correctness gate: a real
    * [[graft.api.HttpApi]] on an ephemeral port over the written log
    * segments, queried with the JDK HttpClient; the SSE stream's result
    * batches parse back into a frame (explicit schema — no inference)
    * and collapse to a deterministic (ts, line) multiset summary. The
    * oracle reads THE SAME parquet files directly — everything between
    * (LogQL parse, fingerprint pruning, compilation, JSON encoding, SSE
    * framing, HTTP transport) must preserve the rows exactly.
    */
  private def httpLogs(s: SparkSession, d: String): DataFrame = {
    val dir = ensureLogSegments(s, d)
    val api = new graft.api.HttpApi(s, logsDir = Some(dir))
    api.start()
    try {
      val q = java.net.URLEncoder.encode("""{log_level="ERROR"}""", "UTF-8")
      val url = s"http://127.0.0.1:${api.port}/api/v1/logs/query" +
        s"?q=$q&s=$Start&e=$End&limit=1000000&fields=chq_timestamp,log_message"
      val client = java.net.http.HttpClient.newHttpClient()
      val body = client.send(
        java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
          .GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString()).body()
      val events = body.split("\n\n").toSeq
        .filter(_.startsWith("data: ")).map(_.substring(6))
      require(events.lastOption.exists(e => e.contains("\"type\":\"done\"") &&
        e.contains("\"status\":\"ok\"")),
        s"SSE stream did not finish ok: ${events.lastOption}")
      import s.implicits._
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("type", StringType),
        StructField("data", StructType(Seq(
          StructField("rows", ArrayType(StructType(Seq(
            StructField("chq_timestamp", LongType),
            StructField("log_message", StringType))))))))))
      s.read.schema(schema).json(events.toDS())
        .filter(col("type") === "result")
        .select(explode(col("data.rows")).as("r"))
        .groupBy(col("r.chq_timestamp").as("chq_timestamp"),
          col("r.log_message").as("log_message"))
        .agg(count(lit(1)).as("n"))
    } finally api.stop()
  }

  /** the metrics SSE route under the gate: the same PromQL + segments as
    * it_seg_rate, but through a live HttpApi — tier selection, the engine,
    * JSON encoding, SSE framing, and transport must reproduce it_seg_rate's
    * oracle exactly (the oracle IS segRateSql; NaN doubles round-trip
    * Jackson's non-numeric tokens, and the cents grid applies after
    * re-parse, exactly where it_seg_rate applies it)
    */
  private def httpMetrics(s: SparkSession, d: String): DataFrame = {
    val dir = ensureSegments(s, d)
    val api = new graft.api.HttpApi(s, metricsDir = Some(dir))
    api.start()
    try {
      val q = java.net.URLEncoder.encode(
        "sum by (attr_event_type) (rate(events_value[4h]))", "UTF-8")
      val url = s"http://127.0.0.1:${api.port}/api/v1/metrics/query" +
        s"?q=$q&s=$Start&e=$End"
      val client = java.net.http.HttpClient.newHttpClient()
      val body = client.send(
        java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
          .GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString()).body()
      val events = body.split("\n\n").toSeq
        .filter(_.startsWith("data: ")).map(_.substring(6))
      require(events.lastOption.exists(e => e.contains("\"type\":\"done\"") &&
        e.contains("\"status\":\"ok\"")),
        s"SSE stream did not finish ok: ${events.lastOption}")
      import s.implicits._
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("type", StringType),
        StructField("data", StructType(Seq(
          StructField("rows", ArrayType(StructType(Seq(
            StructField("ts", LongType),
            StructField("attr_event_type", StringType),
            StructField("value", DoubleType))))))))))
      s.read.schema(schema).json(events.toDS())
        .filter(col("type") === "result")
        .select(explode(col("data.rows")).as("r"))
        .select(col("r.ts").as("ts"),
          col("r.attr_event_type").as("attr_event_type"),
          col("r.value").as("value"))
        .filter(!isnan(col("value")))
        .withColumn("value", cents(col("value"), H4 / 1000.0 * 100))
    } finally api.stop()
  }

  private def httpLogsSql(dir: String): String =
    s"""SELECT chq_timestamp, log_message, count(*) AS n
       FROM read_parquet('$dir/dateint=*/*.parquet', hive_partitioning=1)
       WHERE log_level = 'ERROR'
         AND chq_timestamp >= $Start AND chq_timestamp < $End
       GROUP BY 1, 2"""

  /** two tenants' metric segments in ONE dir under the leading `org=`
    * partition key — base 10 s tier + hourly rollup each, DIFFERENT row
    * sets per org (user parity split) so any cross-tenant leak breaks
    * the oracle hash
    */
  @volatile private var orgSegRootCur: String = s"$tmpRoot/graft_it_orgseg_sf0.01"

  private def ensureOrgSegments(s: SparkSession, d: String): String = {
    val dir = s"$tmpRoot/graft_it_orgseg_${tag(d)}"
    orgSegRootCur = dir
    built.getOrElseUpdate((s.sparkContext.applicationId, dir), {
      deleteDir(s, dir)
      val ev = Tables.events(s, d)
        .filter(col("ts_ms") >= Start - 86400000L && col("ts_ms") < End + 86400000L)
      Seq("org_a" -> (ev.filter(col("user_id") % 2 === 0)),
          "org_b" -> (ev.filter(col("user_id") % 2 =!= 0))).foreach { case (o, sub) =>
        val base = MetricsPreAgg.preAggregate(
          sub, col("ts_ms"), lit("events_value"), col("value"),
          Seq("attr_event_type" -> col("event_type")), freqMs = 10000L,
          withSketch = false)
        Segments.writeMetricSegments(base, dir, org = Some(o))
        Segments.writeMetricSegments(MetricsPreAgg.rollup(base, 3600000L), dir,
          org = Some(o))
      }
      true
    })
    dir
  }

  /** Multi-tenant isolation through the org-keyed front door: one segment
    * dir holds TWO organizations (the reference keys every segment table
    * and lookup on organization_id, lrdb/queries/metric_seg.sql:3-22,
    * 113-125); querying org_a must read only org_a's partition
    * directories (org leads dateint/freq — three-key pruning, gated in
    * PlanSpec) and must reproduce exactly the oracle's read of the
    * org=org_a path — org_b's rows never leak in.
    */
  private def multiOrg(s: SparkSession, d: String): DataFrame = {
    import graft.api.MetricSegments
    val dir = ensureOrgSegments(s, d)
    val qEnd = Start + HourMs
    val p = StepPolicy.paramsFor(Start, qEnd)
    require(p.stepMs == 10000L, s"1h span must select the 10s step, got ${p.stepMs}")
    MetricSegments.query(s, dir, "sum by (attr_event_type) (events_value)",
      Start, qEnd, org = Some("org_a"))
  }

  private def multiOrgSql(dir: String): String =
    s"""SELECT chq_timestamp AS ts, attr_event_type,
            sum(chq_rollup_sum) AS value
       FROM read_parquet('$dir/org=org_a/dateint=*/freq=10000/*.parquet',
                         hive_partitioning=1)
       WHERE chq_timestamp >= $Start AND chq_timestamp < ${Start + HourMs}
       GROUP BY 1, 2"""

  /** Regex-needle query through the skip-index's regex compilation: an
    * alternation matcher engages the exact-fingerprint OR-set path and a
    * `|~` regex line filter engages literal-run trigram extraction
    * (reference tryExtractExactAlternates / addAndNodeFromPattern,
    * queryapi/logs_evaluator.go:208-306, 540-700). The pruned scan is
    * require()-gated to read FEWER files than the dir holds; the oracle
    * reads EVERY file under the same predicates, proving regex pruning
    * lossless.
    */
  private def logRegexNeedle(s: SparkSession, d: String): DataFrame = {
    import graft.ingest.{FingerprintIndex => FI}
    import graft.logql.{LineFilter, LineFilterOp, LogPipeline}
    import graft.promql.{MatchOp, Matcher}
    val dir = ensureLogSegments(s, d)
    val pipe = LogPipeline(
      List(Matcher("resource_service_name", MatchOp.Re, "svc-1|svc-3")),
      List(LineFilter(LineFilterOp.Regex, "trace=dead[a-f]+cafe")))
    val scan = FI.scanLogs(s, dir, pipe)
    val allFiles = s.read.parquet(dir).inputFiles.length
    val readFiles = scan.inputFiles.length
    require(readFiles < allFiles,
      s"regex requirements did not prune: reading $readFiles of $allFiles files")
    scan.filter(col("chq_timestamp") >= Start && col("chq_timestamp") < End &&
        col("resource_service_name").rlike("^(?:svc-1|svc-3)$") &&
        col("log_message").rlike("trace=dead[a-f]+cafe"))
      .groupBy(col("resource_service_name"))
      .agg(count(lit(1)).as("n"),
        min(col("chq_timestamp")).as("first_ts"),
        max(col("chq_timestamp")).as("last_ts"))
  }

  private def logRegexNeedleSql(dir: String): String =
    s"""SELECT resource_service_name, count(*) AS n,
              min(chq_timestamp) AS first_ts, max(chq_timestamp) AS last_ts
       FROM read_parquet('$dir/dateint=*/*.parquet', hive_partitioning=1)
       WHERE regexp_matches(resource_service_name, '^(?:svc-1|svc-3)$$')
         AND regexp_matches(log_message, 'trace=dead[a-f]+cafe')
         AND chq_timestamp >= $Start AND chq_timestamp < $End
       GROUP BY 1"""

  /** span segments + fingerprint index once per session+sf */
  @volatile private var spanSegRootCur: String = s"$tmpRoot/graft_it_spanseg_sf0.01"

  private def ensureSpanSegments(s: SparkSession, d: String): String = {
    val dir = s"$tmpRoot/graft_it_spanseg_${tag(d)}"
    spanSegRootCur = dir
    built.getOrElseUpdate((s.sparkContext.applicationId, dir), {
      deleteDir(s, dir)
      deleteDir(s, graft.ingest.FingerprintIndex.indexPath(dir))
      val spans = graft.model.Cooked.spans(s, d)
        .filter(col("chq_timestamp") >= Start - 86400000L &&
          col("chq_timestamp") < End + 86400000L)
      Segments.writeSpanSegments(spans, dir, maxRecordsPerFile = 2000)
      graft.ingest.FingerprintIndex.buildLogIndex(s, dir)
      true
    })
    dir
  }

  /** Trace-by-id lookup through the exact fingerprint index — the
    * reference's span_trace_id IndexTrigramExact dimension exists for
    * precisely this (fingerprint.go:60-70): fetching one trace must not
    * scan every trace segment in range. The target id is discovered like
    * an API caller would supply it (first error trace in the window);
    * the LOOKUP scan is require()-gated to read fewer files than the dir
    * holds, and the oracle recomputes the same trace summary from a full
    * read of every file.
    */
  private def traceLookup(s: SparkSession, d: String): DataFrame = {
    import graft.ingest.{FingerprintIndex => FI}
    val dir = ensureSpanSegments(s, d)
    val seg = s.read.parquet(dir)
      .filter(col("chq_timestamp") >= Start && col("chq_timestamp") < End)
    val target = seg.filter(col("span_status_code") === "STATUS_CODE_ERROR")
      .agg(min(col("span_trace_id"))).head().getString(0)
    val req = FI.Requirement("span_trace_id",
      Seq(FI.existsFp("span_trace_id"), FI.fingerprint("span_trace_id", target)),
      guarded = false)
    val pruned = FI.prunedRead(s, dir, FI.excludedFiles(s, dir, Seq(req)))
    val allFiles = seg.inputFiles.length
    val readFiles = pruned.inputFiles.length
    require(readFiles < allFiles,
      s"trace lookup did not prune: reading $readFiles of $allFiles files")
    pruned.filter(col("span_trace_id") === target &&
        col("chq_timestamp") >= Start && col("chq_timestamp") < End)
      .groupBy(col("span_trace_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("span_status_code") === "STATUS_CODE_ERROR", 1L)
          .otherwise(0L)).as("n_errors"),
        sum(col("span_duration")).as("total_duration"),
        min(col("chq_timestamp")).as("start_ts"),
        max(col("chq_timestamp")).as("end_ts"))
  }

  private def traceLookupSql(dir: String): String =
    s"""WITH seg AS (
       SELECT * FROM read_parquet('$dir/dateint=*/*.parquet', hive_partitioning=1)
       WHERE chq_timestamp >= $Start AND chq_timestamp < $End),
     target AS (
       SELECT min(span_trace_id) AS tid FROM seg
       WHERE span_status_code = 'STATUS_CODE_ERROR')
     SELECT s.span_trace_id, CAST(count(*) AS BIGINT) AS n_spans,
            CAST(sum(CASE WHEN s.span_status_code = 'STATUS_CODE_ERROR'
              THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
            CAST(sum(s.span_duration) AS BIGINT) AS total_duration,
            min(s.chq_timestamp) AS start_ts,
            max(s.chq_timestamp) AS end_ts
     FROM seg s JOIN target t ON s.span_trace_id = t.tid
     GROUP BY 1"""

  /** Agg-file substitution (reference CanUseAggFile/BuildAggFileSQL,
    * promql/sql_builder.go:374-470; flag-off by default like upstream):
    * a count query whose grouping + matchers fit the materialized
    * agg-field set answers from the 10s count rollup instead of raw
    * segments. Gates inside the query: the rewrite must ENGAGE (canUse)
    * and the materialized input must be strictly smaller than the raw
    * segment dir; the oracle recomputes the counts from the raw parquet,
    * so a hash match proves the substitution changes nothing.
    */
  private def aggSubstitution(s: SparkSession, d: String): DataFrame = {
    import graft.api.AggFiles
    import graft.promql.{MatchOp, Matcher}
    val dir = ensureLogSegments(s, d)
    val fields = Seq("log_level", "resource_service_name")
    built.getOrElseUpdate((s.sparkContext.applicationId, AggFiles.aggDir(dir, fields)), {
      AggFiles.writeLogAggFile(s, dir, fields)
      true
    })
    val matchers = List(Matcher("log_level", MatchOp.Eq, "ERROR"))
    val groupBy = Seq("resource_service_name")
    s.conf.set(AggFiles.FlagKey, "true")
    try {
      require(AggFiles.canUse(s, fields, groupBy, matchers.map(_.label)),
        "agg-file rewrite did not engage")
      val aggBytes = AggFiles.dirBytes(s, AggFiles.aggDir(dir, fields))
      val rawBytes = AggFiles.dirBytes(s, dir)
      require(aggBytes > 0 && aggBytes < rawBytes,
        s"agg file is not a smaller input: $aggBytes vs $rawBytes bytes")
      AggFiles.countsFromAggFile(s, dir, fields, HourMs, Start, End, matchers, groupBy)
    } finally s.conf.unset(AggFiles.FlagKey)
  }

  private def aggSubstitutionSql(dir: String): String =
    s"""SELECT chq_timestamp - chq_timestamp % $HourMs AS ts,
              resource_service_name,
              CAST(count(*) AS DOUBLE) AS value
       FROM read_parquet('$dir/dateint=*/*.parquet', hive_partitioning=1)
       WHERE log_level = 'ERROR'
         AND chq_timestamp >= $Start AND chq_timestamp < $End
       GROUP BY 1, 2"""

  /** Structured-Streaming ingest end-to-end: events → parquet file source →
    * segmentWriteStream (foreachBatch 10 s pre-agg + per-batch idempotent
    * segment dirs + commit log) → read written segments → aggregate; the
    * oracle recomputes the same totals straight from `events`.
    */
  private def streamIngest(s: SparkSession, d: String): DataFrame = {
    import java.nio.file.Files
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("ts_ms"), col("event_type"), col("value"))
    val in = Files.createTempDirectory("graft_it_stream_in_").toString
    ev.coalesce(4).write.mode("overwrite").parquet(in)
    val segDir = Files.createTempDirectory("graft_it_stream_seg_").toString
    val commitDir = Files.createTempDirectory("graft_it_stream_commit_").toString
    val ckpt = Files.createTempDirectory("graft_it_stream_ckpt_").toString
    val q = graft.streaming.StreamingIngest.segmentWriteStream(
      s.readStream.schema(ev.schema).parquet(in),
      b => MetricsPreAgg.preAggregate(b, col("ts_ms"), lit("events_value"),
        col("value"), Seq("attr_event_type" -> col("event_type")),
        freqMs = 10000L, withSketch = false),
      segDir, commitDir, ckpt)
    q.awaitTermination()
    val commits = new java.io.File(commitDir).listFiles()
    require(commits != null && commits.nonEmpty, "stream wrote no commit records")
    s.read.parquet(segDir)
      .groupBy(col("attr_event_type"))
      .agg(sum(col("chq_rollup_count")).cast("long").as("n_events"),
        cents(sum(col("chq_rollup_sum")), 100).as("sum_v"),
        min(col("chq_timestamp")).as("min_bucket"),
        countDistinct(col("chq_timestamp")).as("n_buckets"))
  }

  /** Streaming ingest WITH the incremental rollup chain: events stream in
    * over multiple micro-batches (maxFilesPerTrigger=1 forces ≥2, so the
    * same tier-day is rebuilt repeatedly and idempotently), the
    * foreachBatch sink maintains the 3600 s tier as batches land, and the
    * query then runs at a COARSE step through [[MetricSegments.query]]: a
    * 7-day span selects the 1 h step, whose tier scan reads ONLY the
    * freq=3600000 files the stream's rollup maintenance wrote. The oracle
    * reads those same tier files (glob pinned to the rollup dirs), so a
    * missing/stale/double-counted rollup bucket is a hash mismatch.
    */
  private def streamRollup(s: SparkSession, d: String): DataFrame = {
    import java.nio.file.Files
    val qEnd = Start + 7L * 86400000L
    val ev = Tables.events(s, d)
      .filter(col("ts_ms") >= Start && col("ts_ms") < qEnd)
      .select(col("event_id"), col("ts_ms"), col("event_type"), col("value"))
    val in = Files.createTempDirectory("graft_it_rollup_in_").toString
    ev.coalesce(3).write.mode("overwrite").parquet(in)
    val segDir = Files.createTempDirectory("graft_it_rollup_seg_").toString
    streamRollupDirCur = segDir
    val commitDir = Files.createTempDirectory("graft_it_rollup_commit_").toString
    val ckpt = Files.createTempDirectory("graft_it_rollup_ckpt_").toString
    val q = graft.streaming.StreamingIngest.segmentWriteStream(
      s.readStream.schema(ev.schema).option("maxFilesPerTrigger", "1").parquet(in),
      b => MetricsPreAgg.preAggregate(b, col("ts_ms"), lit("events_value"),
        col("value"), Seq("attr_event_type" -> col("event_type")),
        freqMs = 10000L, withSketch = false),
      segDir, commitDir, ckpt, rollupTiers = Seq(3600000L))
    q.awaitTermination()
    val p = StepPolicy.paramsFor(Start, qEnd)
    require(p.stepMs == 3600000L,
      s"7d span must select the 1h step, got ${p.stepMs}")
    MetricSegments.query(s, segDir, "sum by (attr_event_type) (events_value)",
      Start, qEnd)
  }

  @volatile private var streamRollupDirCur: String = "/tmp/unset"

  // per (1h bucket, event_type) there is exactly ONE tid and ONE rolled
  // row, so the engine-side value is that row's chq_rollup_sum verbatim
  // and both engines read identical file bits — no float-order hazard
  private def streamRollupSql(dir: String): String =
    s"""SELECT chq_timestamp AS ts, attr_event_type,
            sum(chq_rollup_sum) AS value
       FROM read_parquet(
         '$dir/ingest_batch=rollup-*/dateint=*/freq=3600000/*.parquet',
         hive_partitioning=1)
       WHERE chq_timestamp >= $Start
         AND chq_timestamp < ${Start + 7L * 86400000L}
       GROUP BY 1, 2"""

  private val streamIngestSql =
    """SELECT event_type AS attr_event_type,
              CAST(count(*) AS BIGINT) AS n_events,
              CAST(round(sum("value") * 100, 0) AS BIGINT) / 100 AS sum_v,
              min(epoch_ms(ts) - epoch_ms(ts) % 10000) AS min_bucket,
              CAST(count(DISTINCT epoch_ms(ts) - epoch_ms(ts) % 10000) AS BIGINT)
                AS n_buckets
       FROM events GROUP BY 1"""

  /** Streaming as-of enrichment ([[graft.streaming.StreamAsof]]) gated
    * against DuckDB's NATIVE ASOF JOIN — the custom-state streaming
    * operator checked by an independent implementation of the semantics,
    * like the batch `tq_asof_*` rows. Events split into probes (every 7th
    * id) and samples; three arrival waves land as separate micro-batches
    * (maxFilesPerTrigger=1) under a watermark delay that covers the whole
    * span, then a far-future sentinel sample on an unused key advances
    * the watermark past every real probe and the engine's no-data batch
    * drains all keys through their event-time timeouts. Tie rules match
    * the batch operator (sample-before-probe at equal ts, greatest value
    * collapses equal-(key, ts) samples), so the oracle dedupes with
    * max(value) before its ASOF LEFT JOIN.
    */
  private val streamAsofTolMs = 6L * 3600000L
  private val streamAsofRuns = new java.util.concurrent.atomic.AtomicLong(0L)
  // previous runs' memory-sink views, dropped at the next invocation so
  // repeated bench runs hold at most one result copy per row, not N
  private val staleSinks = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  /** shared fixture spine of both stream-asof rows: the probe/sample
    * split of `events`, written as two ts-range arrival waves + sentinel
    * ([[graft.streaming.StreamAsof.writeArrivalWaves]]), streamed with
    * maxFilesPerTrigger=1 under a delay covering the whole span
    */
  private def streamAsofRun(s: SparkSession, d: String, prefix: String,
      run: (org.apache.spark.sql.Dataset[graft.streaming.AsofEvent]) =>
        org.apache.spark.sql.Dataset[graft.streaming.AsofOut]): DataFrame = {
    import java.nio.file.Files
    import s.implicits._
    var stale = staleSinks.poll()
    while (stale != null) {
      try s.catalog.dropTempView(stale) catch { case _: Exception => }
      stale = staleSinks.poll()
    }
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("ts_ms"), col("user_id"), col("value"))
    val tagged = ev.select(
      (col("user_id") % 10).as("key"), col("ts_ms"),
      when(col("event_id") % 7 === 0, 1).otherwise(0).as("side"),
      when(col("event_id") % 7 === 0, col("event_id")).otherwise(0L).as("probe_id"),
      when(col("event_id") % 7 === 0, 0.0).otherwise(col("value")).as("value"))
      .as[graft.streaming.AsofEvent]
    val Array(minTs, maxTs) = tagged.agg(min(col("ts_ms")), max(col("ts_ms")))
      .head() match { case r => Array(r.getLong(0), r.getLong(1)) }
    val in = Files.createTempDirectory(prefix).toString
    val half = math.max(1L, (maxTs - minTs) / 2 + 1)
    val waves = (0 until 2).map { w =>
      tagged.filter(col("ts_ms") >= minTs + w * half &&
        col("ts_ms") < minTs + (w + 1) * half)
    }
    graft.streaming.StreamAsof.writeArrivalWaves(
      waves, maxTs + 91L * 86400000L, in)
    val src = s.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[graft.streaming.AsofEvent]].schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
      .as[graft.streaming.AsofEvent]
    val sink = s"${prefix}sink_${streamAsofRuns.incrementAndGet()}"
    val q = run(src)
      .writeStream.outputMode("append").format("memory")
      .queryName(sink).start()
    try q.processAllAvailable() finally q.stop()
    staleSinks.add(sink)
    s.table(sink)
      .filter(col("key") =!= 999L)
      .select(col("key"), col("probe_id"), col("ts_ms"),
        col("asof_ts"), col("asof_value"))
  }

  private def streamAsof(s: SparkSession, d: String): DataFrame =
    streamAsofRun(s, d, "graft_it_sasof_",
      src => graft.streaming.StreamAsof.backward(src,
        toleranceMs = streamAsofTolMs, watermarkDelay = "2160 hours"))

  /** forward mirror of [[streamAsof]] over the same fixture machinery:
    * earliest sample at-or-after each probe ([[graft.streaming.StreamAsof.forward]]),
    * oracle = DuckDB's native forward ASOF (`p.ts <= s.ts`)
    */
  private def streamAsofFwd(s: SparkSession, d: String): DataFrame =
    streamAsofRun(s, d, "graft_it_sasoff_",
      src => graft.streaming.StreamAsof.forward(src,
        toleranceMs = streamAsofTolMs, watermarkDelay = "2160 hours"))

  private val streamAsofFwdSql =
    s"""WITH probes AS (
         SELECT user_id % 10 AS key, event_id AS probe_id,
                epoch_ms(ts) AS ts_ms
         FROM events WHERE event_id % 7 = 0),
       samples AS (
         SELECT user_id % 10 AS key, epoch_ms(ts) AS ts_ms, max("value") AS value
         FROM events WHERE event_id % 7 <> 0 GROUP BY 1, 2),
       j AS (
         SELECT p.key, p.probe_id, p.ts_ms, s.ts_ms AS sts, s.value AS sval
         FROM probes p ASOF LEFT JOIN samples s
           ON p.key = s.key AND p.ts_ms <= s.ts_ms)
       SELECT key, probe_id, ts_ms,
              CASE WHEN sts IS NOT NULL AND sts - ts_ms <= $streamAsofTolMs
                   THEN sts END AS asof_ts,
              CASE WHEN sts IS NOT NULL AND sts - ts_ms <= $streamAsofTolMs
                   THEN sval END AS asof_value
       FROM j"""

  private val streamAsofSql =
    s"""WITH probes AS (
         SELECT user_id % 10 AS key, event_id AS probe_id,
                epoch_ms(ts) AS ts_ms
         FROM events WHERE event_id % 7 = 0),
       samples AS (
         SELECT user_id % 10 AS key, epoch_ms(ts) AS ts_ms, max("value") AS value
         FROM events WHERE event_id % 7 <> 0 GROUP BY 1, 2),
       j AS (
         SELECT p.key, p.probe_id, p.ts_ms, s.ts_ms AS sts, s.value AS sval
         FROM probes p ASOF LEFT JOIN samples s
           ON p.key = s.key AND p.ts_ms >= s.ts_ms)
       SELECT key, probe_id, ts_ms,
              CASE WHEN sts IS NOT NULL AND ts_ms - sts <= $streamAsofTolMs
                   THEN sts END AS asof_ts,
              CASE WHEN sts IS NOT NULL AND ts_ms - sts <= $streamAsofTolMs
                   THEN sval END AS asof_value
       FROM j"""

  // `all` is a def and the oracle strings are rendered inside it: Verify
  // dumps oracle_sql.json after running the queries, so the embedded
  // segment paths are the ones this run wrote
  /** Exemplar → trace pivot, the observability motion the reference's
    * exemplar processing + span_trace_id exact-index dimension exist for
    * (internal/filereader/ingest_proto_traces.go:86,
    * internal/fingerprint/fingerprint.go:60-70): decode OTel metric
    * exemplars off the wire, take the distinct trace ids they reference
    * in an alerting window (bounded — a caller's trace list), and fetch
    * those traces from span segments through ONE OR-set index read
    * instead of scanning every file in range. The fixture's exemplar
    * trace ids use the SAME derivation as the cooked span segments, so
    * the join is real; the oracle replays derivation + join from
    * `events` and every segment file, and a require() gates that the
    * pruned fetch read strictly fewer files.
    */
  /** exemplar→metric enrichment through the segment spine: probe events
    * (the exemplar subset) pick up the most recent 10 s pre-agg sample
    * of THEIR series (attr_event_type) at-or-before their timestamp,
    * within 60 s — [[graft.ops.AsofJoin]] running against the REAL
    * freq=10000 tier (StepPolicy scan, dateint-pruned): the "what was
    * the metric when this trace fired" pivot. The oracle replays with
    * DuckDB's native ASOF JOIN over the same segment files.
    */
  private def asofEnrich(s: SparkSession, d: String): DataFrame = {
    val dir = ensureSegments(s, d)
    val qEnd = Start + 24 * HourMs
    // explicit row filter on top of the partition-pruned tier scan: the
    // oracle reads the same window, so both sides see identical samples
    val scan = StepPolicy.scanTier(s, dir, 10000L, Start, qEnd)
      .filter(col("metric_name") === "events_value" &&
        col("chq_timestamp") >= Start && col("chq_timestamp") < qEnd)
      .select(col("attr_event_type").as("k"),
        col("chq_timestamp").as("sts"),
        col("chq_rollup_sum").as("msum"),
        col("chq_rollup_count").as("mcnt"))
    val probes = Tables.events(s, d)
      .filter(col("event_id") % 5 === 2 &&
        col("ts_ms") >= Start && col("ts_ms") < qEnd)
      .select(col("event_id"), col("event_type").as("k"), col("ts_ms"))
    // (k, sts) is unique by pre-agg construction; sts tie-break is inert
    graft.ops.AsofJoin.backward(probes, scan, "k", "ts_ms", "sts",
      payloadCols = Seq("msum", "mcnt"), tieBreak = "sts",
      toleranceMs = 60000L)
  }

  private def asofEnrichSql(dir: String): String =
    s"""WITH r AS (
       SELECT attr_event_type AS k, chq_timestamp AS sts,
              chq_rollup_sum AS msum, chq_rollup_count AS mcnt
       FROM read_parquet('$dir/dateint=*/freq=10000/*.parquet',
                         hive_partitioning=1)
       WHERE metric_name = 'events_value'
         AND chq_timestamp >= $Start AND chq_timestamp < ${Start + 24 * HourMs}),
     l AS (
       SELECT event_id, event_type AS k, epoch_ms(ts) AS ts_ms
       FROM events
       WHERE event_id % 5 = 2 AND epoch_ms(ts) >= $Start
         AND epoch_ms(ts) < ${Start + 24 * HourMs})
     SELECT l.event_id, l.k, l.ts_ms,
            CASE WHEN l.ts_ms - r.sts <= 60000 THEN r.sts END AS asof_ts,
            CASE WHEN l.ts_ms - r.sts <= 60000 THEN r.msum END AS asof_msum,
            CASE WHEN l.ts_ms - r.sts <= 60000 THEN r.mcnt END AS asof_mcnt
     FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.ts_ms >= r.sts"""

  private def exemplarTrace(s: SparkSession, d: String): DataFrame = {
    import graft.ingest.OtelProto
    import OtelProto.Encode
    val dir = ensureSpanSegments(s, d)
    val rows = Tables.events(s, d)
      .filter(col("event_id") % 29 === 5 &&
        col("ts_ms") >= Start && col("ts_ms") < Start + 24 * HourMs)
      .select(col("ts_ms"), col("value"), col("user_id"), col("event_type"))
      .collect() // fixture encoding is driver-side by design (test harness)
    require(rows.nonEmpty, "no exemplar fixture rows")
    val dps = rows.toSeq.map { r =>
      val (ts, v, u, et) = (r.getLong(0), r.getDouble(1), r.getLong(2), r.getString(3))
      Encode.numberDp(ts * 1000000L, v, Seq("event.type" -> et),
        exemplars = Seq(Encode.exemplar(ts * 1000000L, v,
          md5hex(s"${ts / 600000L}|$u"), md5hex(u.toString).take(16), Nil)))
    }
    val blob = Encode.metricsData(Seq("service.name" -> "fixture-svc"),
      "graft-test", Seq(Encode.gaugeMetric("latency_exemplars", dps)))
    val ex = OtelProto.readExemplars(s,
      gzTmp("graft_it_exemplar_", "exemplars.binpb.gz", blob))
    // the caller-visible trace list: distinct ids in the window (bounded by
    // exemplar count, the same driver-side candidate-list motion as the
    // reference's API pivot)
    val tids = ex.select(col("exemplar_trace_id")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    require(tids.nonEmpty, "exemplars carried no trace ids")
    val spans = graft.api.SpanSegments.tracesByIds(s, dir, tids,
      graft.promql.QueryParams(Start, End, HourMs))
    val allFiles = s.read.parquet(dir).inputFiles.length
    require(spans.inputFiles.length < allFiles,
      s"exemplar trace fetch did not prune: ${spans.inputFiles.length} of $allFiles files")
    spans
      .groupBy(col("span_trace_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("span_status_code") === "STATUS_CODE_ERROR", 1L)
          .otherwise(0L)).as("n_errors"),
        sum(col("span_duration")).as("total_duration"),
        min(col("chq_timestamp")).as("start_ts"),
        max(col("chq_timestamp")).as("end_ts"))
  }

  private def exemplarTraceSql(dir: String): String =
    s"""WITH ex AS (
       SELECT DISTINCT md5(CAST(epoch_ms(ts) // 600000 AS VARCHAR) || '|'
                || CAST(user_id AS VARCHAR)) AS tid
       FROM events
       WHERE event_id % 29 = 5
         AND epoch_ms(ts) >= $Start AND epoch_ms(ts) < ${Start + 24 * HourMs}),
     seg AS (
       SELECT * FROM read_parquet('$dir/dateint=*/*.parquet', hive_partitioning=1)
       WHERE chq_timestamp >= $Start AND chq_timestamp < $End)
     SELECT s.span_trace_id, CAST(count(*) AS BIGINT) AS n_spans,
            CAST(sum(CASE WHEN s.span_status_code = 'STATUS_CODE_ERROR'
              THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
            CAST(sum(s.span_duration) AS BIGINT) AS total_duration,
            min(s.chq_timestamp) AS start_ts,
            max(s.chq_timestamp) AS end_ts
     FROM seg s JOIN ex ON s.span_trace_id = ex.tid
     GROUP BY 1"""

  /** LogQL-over-spans through the segments front door — the reference's
    * /api/v1/spans/query shape (SURVEY §3.3) running against REAL span
    * segments: matcher + numeric span filter + field projection, oracle
    * reading every segment file.
    */
  private def spanLogql(s: SparkSession, d: String): DataFrame = {
    val dir = ensureSpanSegments(s, d)
    graft.api.SpanSegments.query(s, dir,
      """{span_status_code="STATUS_CODE_ERROR"} | span_duration > 1000""",
      graft.promql.QueryParams(Start, End, HourMs),
      limit = 10000000, desc = false,
      fields = Seq("chq_timestamp", "span_trace_id", "span_id", "span_name",
        "span_duration"))
  }

  private def spanLogqlSql(dir: String): String =
    s"""SELECT chq_timestamp, span_trace_id, span_id, span_name, span_duration
       FROM read_parquet('$dir/dateint=*/*.parquet', hive_partitioning=1)
       WHERE span_status_code = 'STATUS_CODE_ERROR' AND span_duration > 1000
         AND chq_timestamp >= $Start AND chq_timestamp < $End"""

  private def md5hex(v: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(v.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  private def gzTmp(prefix: String, name: String, blob: Array[Byte]): String = {
    val f = java.nio.file.Files.createTempDirectory(prefix).resolve(name)
    val os = new java.util.zip.GZIPOutputStream(java.nio.file.Files.newOutputStream(f))
    os.write(blob); os.close()
    f.toString
  }

  /** logs-side dashboard fusion through the segment spine
    * ([[graft.api.LogSegments.queryMultiTagged]], r15): two metric-style
    * LogQL panels with different streams AND different groupings —
    * volume by level, error count by service — share ONE materialized
    * pass over the pruned log scan (index exclusion intersected across
    * both pipelines, one index read). The oracle replays both grids from
    * the same written segment files and tags them identically.
    */
  private def logsMulti(s: SparkSession, d: String): DataFrame = {
    val dir = ensureLogSegments(s, d)
    val p = StepPolicy.paramsFor(Start, End)
    graft.api.LogSegments.queryMultiTagged(s, dir, Seq(
      "vol" -> """sum by (log_level) (count_over_time({metric_name="log_events"}[4h]))""",
      "err" -> """sum by (resource_service_name) (count_over_time({log_level="ERROR"}[4h]))"""),
      p).filter(!isnan(col("value")))
  }

  private def logsMultiSql(dir: String): String =
    s"""WITH src AS (
       SELECT chq_timestamp, log_level, resource_service_name
       FROM read_parquet('$dir/dateint=*/*.parquet', hive_partitioning=1)
       WHERE chq_timestamp >= ${Start - H4} AND chq_timestamp < $End),
     stepv AS (
       SELECT chq_timestamp - chq_timestamp % $HourMs AS ts, log_level,
              CAST(count(*) AS DOUBLE) AS c
       FROM src GROUP BY 1, 2),
     winv AS (
       SELECT ts, log_level, sum(c) OVER w AS wc, min(ts) OVER w AS first_ts
       FROM stepv
       WINDOW w AS (PARTITION BY log_level ORDER BY ts
                    RANGE BETWEEN ${H4 - HourMs} PRECEDING AND CURRENT ROW)),
     p1 AS (
       SELECT 'vol' AS alias, ts,
              '{"log_level":"' || log_level || '"}' AS series, wc AS value
       FROM winv WHERE first_ts = ts - ${H4 - HourMs}
         AND ts >= $Start AND ts < $End),
     stepe AS (
       SELECT chq_timestamp - chq_timestamp % $HourMs AS ts,
              resource_service_name, CAST(count(*) AS DOUBLE) AS c
       FROM src WHERE log_level = 'ERROR' GROUP BY 1, 2),
     wine AS (
       SELECT ts, resource_service_name, sum(c) OVER w AS wc,
              min(ts) OVER w AS first_ts
       FROM stepe
       WINDOW w AS (PARTITION BY resource_service_name ORDER BY ts
                    RANGE BETWEEN ${H4 - HourMs} PRECEDING AND CURRENT ROW)),
     p2 AS (
       SELECT 'err' AS alias, ts,
              '{"resource_service_name":"' || resource_service_name || '"}'
                AS series,
              wc AS value
       FROM wine WHERE first_ts = ts - ${H4 - HourMs}
         AND ts >= $Start AND ts < $End)
     SELECT * FROM p1 UNION ALL SELECT * FROM p2"""

  /** lookback through a previously-UNWALKED AST node, gated at the driver
    * (the r15 total-walker fix): `timestamp(m offset 26h)` through the
    * segments front door with the query start ON a dateint boundary — the
    * 26 h offset reaches two partitions back into the previous days,
    * which the pre-fix enumerated walker priced at lookback 0
    * (TimestampFn was unlisted), silently dateint-pruning those days and
    * dropping the first ~26 h of output buckets. The oracle replays the
    * offset bucketing from the SAME written segment files.
    */
  private def segOffsetWalk(s: SparkSession, d: String): DataFrame = {
    val dir = ensureSegments(s, d)
    MetricSegments.query(s, dir, "timestamp(events_value offset 26h)",
      Start + 2L * 86400000L, End)
  }

  private def segOffsetWalkSql(dir: String): String = {
    val off = 26L * HourMs
    val qs = Start + 2L * 86400000L
    s"""SELECT ts, attr_event_type, ts / 1000.0 AS value FROM (
       SELECT (chq_timestamp + $off) - (chq_timestamp + $off) % $HourMs AS ts,
              attr_event_type
       FROM read_parquet('$dir/dateint=*/freq=3600000/*.parquet',
                         hive_partitioning=1)
       WHERE chq_timestamp >= ${qs - off} AND chq_timestamp < ${End - off}
       GROUP BY 1, 2)
     WHERE ts >= $qs AND ts < $End"""
  }

  /** NEGATIVE offset through the segments front door (r15 VERDICT #1):
    * `events_value offset -26h` over [Start, End − 2d) reads samples up
    * to 26 h AFTER the query end — two dateint partitions past the old
    * pruning upper bound `dateintOf(end − 1)`. Gates BOTH halves of the
    * signed-offset fix: the parser (pre-fix the '-' was silently
    * dropped, flipping the shift direction) and the front door's
    * forward dateint widening ([[graft.promql.Ast.forwardMs]] — without
    * it the last 26 h of output buckets vanish). The oracle replays the
    * forward-shifted bucketing from the SAME written segment files.
    */
  private def segOffsetNeg(s: SparkSession, d: String): DataFrame = {
    val dir = ensureSegments(s, d)
    MetricSegments.query(s, dir, "events_value offset -26h",
      Start, End - 2L * 86400000L)
  }

  private def segOffsetNegSql(dir: String): String = {
    val off = -26L * HourMs
    val qe = End - 2L * 86400000L
    s"""SELECT ts, attr_event_type, bsum AS value FROM (
       SELECT (chq_timestamp + $off) - (chq_timestamp + $off) % $HourMs AS ts,
              attr_event_type, sum(chq_rollup_sum) AS bsum
       FROM read_parquet('$dir/dateint=*/freq=3600000/*.parquet',
                         hive_partitioning=1)
       WHERE chq_timestamp >= ${Start - off} AND chq_timestamp < ${qe - off}
       GROUP BY 1, 2)
     WHERE ts >= $Start AND ts < $qe"""
  }

  /** literal `@` pin OUTSIDE [start − lookback, end) through the
    * segments front door (r15 VERDICT #2): the query window starts 7
    * days after the pin, so the old dateint pruning — derived from the
    * query window alone — excluded the pinned day entirely and the door
    * returned EMPTY while the engine over an unpruned store answered
    * correctly (pq_at_modifier never goes through segments). The fixed
    * door unions each literal pin's absolute read window into the
    * dateint bounds ([[graft.promql.Ast.pinWindowsMs]]); the oracle
    * re-derives the pinned bucket from the same written files and
    * broadcasts it across the query grid.
    */
  private def segAtPin(s: SparkSession, d: String): DataFrame = {
    val dir = ensureSegments(s, d)
    MetricSegments.query(s, dir, s"events_value @ ${Start / 1000}",
      Start + 7L * 86400000L, End)
  }

  private def segAtPinSql(dir: String): String = {
    val qs = Start + 7L * 86400000L
    s"""WITH pinned AS (
       SELECT attr_event_type, sum(chq_rollup_sum) AS bsum
       FROM read_parquet('$dir/dateint=*/freq=3600000/*.parquet',
                         hive_partitioning=1)
       WHERE chq_timestamp >= $Start AND chq_timestamp < ${Start + HourMs}
       GROUP BY 1)
     SELECT g.ts, p.attr_event_type, p.bsum AS value
     FROM range($qs, $End, $HourMs) g(ts), pinned p"""
  }

  /** range window × positive offset × literal pin, through the segment
    * door: `sum_over_time(events_value[4h] @ pin offset 2h)` with the pin
    * ~6 days before the query window. Gates the FULL pin-window arm of
    * [[graft.promql.Ast.pinWindowsMs]] — the window's lower bound is
    * `atMs − range − offset`, which for this pin (Start + 26 h, i.e.
    * 02:00 on day 2) reaches 20:00 on day 1: the PREVIOUS dateint
    * partition. A pruning that priced the pin alone (forgetting its
    * range+offset reach) would exclude day 1, silently dropping the
    * window's early buckets and shifting the sum. Oracle replays the
    * offset-shifted bucketing, the 4 h window with the left-inclusive
    * coverage rule, and the pin broadcast from the same written files.
    */
  private def segAtPinRange(s: SparkSession, d: String): DataFrame = {
    val dir = ensureSegments(s, d)
    val pin = Start + 26L * HourMs
    // NaN filter (range-window coverage rule, like the pq_* rows): at
    // sf0.001 the hourly buckets around the pin are sparse, so the
    // pinned window is uncovered → NaN on the engine side and no row on
    // the oracle side. At sf0.01+ the oracle emits the full grid, so a
    // pruning regression (dropped early window buckets → NaN → filtered)
    // still turns this row red by ROWCOUNT.
    MetricSegments.query(s, dir,
      s"sum_over_time(events_value[4h] @ ${pin / 1000} offset 2h)",
      Start + 7L * 86400000L, End)
      .filter(!isnan(col("value")))
  }

  private def segAtPinRangeSql(dir: String): String = {
    val qs = Start + 7L * 86400000L
    val pin = Start + 26L * HourMs
    val off = 2L * HourMs
    val h4 = 4L * HourMs
    s"""WITH step AS (
       SELECT (chq_timestamp + $off) - (chq_timestamp + $off) % $HourMs AS ts,
              attr_event_type, sum(chq_rollup_sum) AS bsum
       FROM read_parquet('$dir/dateint=*/freq=3600000/*.parquet',
                         hive_partitioning=1)
       WHERE chq_timestamp >= ${pin - h4 - off}
         AND chq_timestamp < ${pin + HourMs - off}
       GROUP BY 1, 2),
     win AS (
       SELECT ts, attr_event_type, sum(bsum) OVER w AS wsum,
              min(ts) OVER w AS first_ts
       FROM step
       WINDOW w AS (PARTITION BY attr_event_type ORDER BY ts
                    RANGE BETWEEN ${h4 - HourMs} PRECEDING AND CURRENT ROW)),
     pinned AS (
       SELECT attr_event_type, wsum
       FROM win WHERE ts = $pin AND first_ts = ts - ${h4 - HourMs})
     SELECT g.ts, p.attr_event_type, p.wsum AS value
     FROM range($qs, $End, $HourMs) g(ts), pinned p"""
  }

  /** `@ end()` through the segment door with a step-aligned end (the
    * normal case — [[StepPolicy.paramsFor]] aligns): the pin evaluates
    * the bucket CONTAINING endMs, i.e. [endMs, endMs + step), which lies
    * entirely past the old pruning upper bound `dateintOf(endMs − 1)` —
    * found by r16 audit, the bound-pin sibling of the literal-pin hole.
    * Pre-fix the door returned EMPTY while the engine over an unpruned
    * store emitted the end bucket across the grid. The query end sits on
    * a dateint boundary so the missing bucket is in the NEXT partition.
    */
  private def segAtEnd(s: SparkSession, d: String): DataFrame = {
    val dir = ensureSegments(s, d)
    MetricSegments.query(s, dir, "events_value @ end()",
      Start, Start + 7L * 86400000L)
  }

  private def segAtEndSql(dir: String): String = {
    val qe = Start + 7L * 86400000L
    s"""WITH pinned AS (
       SELECT attr_event_type, sum(chq_rollup_sum) AS bsum
       FROM read_parquet('$dir/dateint=*/freq=3600000/*.parquet',
                         hive_partitioning=1)
       WHERE chq_timestamp >= $qe AND chq_timestamp < ${qe + HourMs}
       GROUP BY 1)
     SELECT g.ts, p.attr_event_type, p.bsum AS value
     FROM range($Start, $qe, $HourMs) g(ts), pinned p"""
  }

  /** the MULTI door with an @-pinned panel (the r15 ADVICE #1 scenario,
    * distinct from the single-query [[segAtPin]]): a dashboard mixing a
    * normal grouped panel with a panel pinned 7 days BEFORE the query
    * window rides [[MetricSegments.queryMultiAt]]'s tagged fallback —
    * the shared scan's dateint union must include the pin's day or the
    * pinned panel comes back empty while the normal panel answers. The
    * oracle unions both panels' tagged rows from the same written files.
    */
  private def segMultiPin(s: SparkSession, d: String): DataFrame = {
    val dir = ensureSegments(s, d)
    MetricSegments.queryMultiAt(s, dir, Seq(
      "grp" -> "sum by (attr_event_type) (events_value)",
      "pin" -> s"events_value @ ${Start / 1000}"),
      graft.api.StepPolicy.paramsFor(Start + 7L * 86400000L, End))
  }

  private def segMultiPinSql(dir: String): String = {
    val qs = Start + 7L * 86400000L
    s"""WITH step AS (
       SELECT chq_timestamp - chq_timestamp % $HourMs AS ts, attr_event_type,
              sum(chq_rollup_sum) AS bsum
       FROM read_parquet('$dir/dateint=*/freq=3600000/*.parquet',
                         hive_partitioning=1)
       GROUP BY 1, 2),
     p1 AS (
       SELECT 'grp' AS alias, ts,
              '{"attr_event_type":"' || attr_event_type || '"}' AS series,
              bsum AS value
       FROM step WHERE ts >= $qs AND ts < $End),
     pinned AS (SELECT attr_event_type, bsum FROM step WHERE ts = $Start),
     p2 AS (
       SELECT 'pin' AS alias, g.ts,
              '{"attr_event_type":"' || p.attr_event_type || '"}' AS series,
              p.bsum AS value
       FROM range($qs, $End, $HourMs) g(ts), pinned p)
     SELECT * FROM p1 UNION ALL SELECT * FROM p2"""
  }

  /** streaming reference-parity fingerprinting
    * ([[graft.streaming.StreamingFingerprint]]): 3 micro-batches of
    * templated lines against ONE stream-lifetime trie (the reference
    * collector's in-process TrieClusterManager shape). The oracle
    * VALUE-PINS the cluster id batch-order-independently: EVEN event
    * ids emit one TYPE-LESS dominant template T ("INFO request user=…"
    * — ~half of every micro-batch, so T wins every batch's
    * (count desc, seq asc) replay and is minted FIRST whatever file
    * order the stream picks), while odd ids emit per-type "fetch"
    * templates that share 6 of T∪odd's 9 items (Jaccard 0.667 ≥ 0.5 →
    * each merges into T's cluster via the divergence subtree scan,
    * which carves no branch on merge). So every non-JSON line's
    * fingerprint is exactly hash(T) — a CONSTANT payload the DuckDB
    * XXH64 chain re-derives — and a drift in replay order, trie
    * semantics, or the hash turns the row red (the r14 trie-oracle
    * value-pin, extended to the streaming spine). JSON signup lines
    * bypass the trie with the pure item+key hash, pinned the same way.
    */
  private def streamFpc(s: SparkSession, d: String): DataFrame = {
    import java.nio.file.Files
    val ev = Tables.events(s, d).filter(col("event_id") % 13 === 0)
    val base = when(col("event_id") % 2 === 0,
        concat(lit("INFO request user="), col("user_id"),
          lit(" handled /api/v4/do?id="), col("event_id"),
          lit(" in "), pmod(col("event_id"), lit(700)), lit("ms")))
      .otherwise(concat(
        lit("INFO "), col("event_type"), lit(" fetch user="),
        col("user_id"),
        lit(" handled /api/v4/do?id="), col("event_id"),
        lit(" in "), pmod(col("event_id"), lit(700)), lit("ms")))
    val line = when(col("event_type") === "signup",
        concat(lit("""{"msg": "user signup ok", "uid": """), col("user_id"),
          lit(""", "plan": "pro"}""")))
      .otherwise(base)
    val rows = ev.select(col("event_id"), col("event_type"), line.as("line"))
    val in = Files.createTempDirectory("graft_it_fpc_in_").toString
    rows.repartition(3).write.mode("overwrite").parquet(in)
    val out = Files.createTempDirectory("graft_it_fpc_out_").toString
    val ckpt = Files.createTempDirectory("graft_it_fpc_ck_").toString
    val src = s.readStream.schema(rows.schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = graft.streaming.StreamingFingerprint
      .fingerprintStream(src, "line", out, ckpt)
    try q.awaitTermination() finally if (q.isActive) q.stop()
    s.read.parquet(out).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("fpc_fingerprint")).as("n_fp"),
        min(col("fpc_fingerprint")).as("fp"))
  }

  private def streamFpcSql: String =
    TelemetryQueries.DuckXxh64.query(
      """xsrc AS (
         SELECT event_type, count(*) AS n, CAST(1 AS BIGINT) AS n_fp,
                CASE WHEN event_type = 'signup'
                     THEN 'user:signup:ok:msg:plan:uid'
                     ELSE '<Loglevel>:request:user:<Number>:<Path>:in:<Duration>'
                END AS payload
         FROM events WHERE event_id % 13 = 0 GROUP BY 1)""",
      "event_type, n, n_fp", maxBytes = 96)

  /** compat fingerprints through the SEGMENT spine: cook log lines with
    * [[graft.ops.FingerprintCompat.fingerprintLines]] (the reference's
    * logs-ingest motion — its ingest assigns the trie fingerprint per
    * record before the segment write, logs_ingest_duckdb.go), write real
    * partitioned log segments sorted/bloomed on chq_fingerprint, read
    * them back, and aggregate per event type. One cluster per type
    * (symmetric-divergence templates), JSON lines pure-hash — the same
    * invariants as tq_fpc_cluster but THROUGH the storage contract.
    */
  private def fpcSegments(s: SparkSession, d: String): DataFrame = {
    import java.nio.file.Files
    val ev = Tables.events(s, d).filter(col("event_id") % 19 === 0)
    val line = when(col("event_type") === "signup",
        concat(lit("""{"msg": "user signup ok", "uid": """), col("user_id"),
          lit(""", "plan": "max"}""")))
      .otherwise(concat(
        lit("INFO "), col("event_type"),
        when(col("event_id") % 2 === 0, lit(" request user="))
          .otherwise(lit(" fetch user=")),
        col("user_id"),
        lit(" handled /api/v6/do?id="), col("event_id"),
        lit(" in "), pmod(col("event_id"), lit(600)), lit("ms")))
    val cooked = graft.ops.FingerprintCompat.fingerprintLines(
      ev.select(col("ts_ms").as("chq_timestamp"),
        (col("ts_ms") * 1000000L + col("event_id")).as("chq_tsns"),
        line.as("log_message"),
        concat(lit("svc-"), pmod(col("user_id"), lit(5))).as("resource_service_name"),
        col("event_type").as("attr_event_type")),
      col("log_message"))
      .withColumn("chq_fingerprint", col("fpc_fingerprint"))
      .withColumn("log_level", upper(coalesce(
        when(col("fpc_level") === "", null).otherwise(col("fpc_level")),
        lit("info"))))
      .drop("fpc_fingerprint", "fpc_level")
    val dir = Files.createTempDirectory("graft_it_fpcseg_").toString
    Segments.writeLogSegments(cooked, dir, maxRecordsPerFile = 5000)
    s.read.parquet(dir)
      .groupBy(col("attr_event_type"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("chq_fingerprint")).as("n_fp"),
        min(col("chq_fingerprint")).as("fp"),
        min(col("log_level")).as("lvl"))
  }

  /** VALUE-PINNED like [[graft.queries.TelemetryQueries]]'s
    * fpcClusterSql (r14 VERDICT #2, extended through the segment
    * spine): the SQL re-derives the deterministic batch-replay winner —
    * (count desc, joined-sequence asc) over the (type, request/fetch)
    * templates — and pushes its item payload through the DuckDB XXH64
    * chain, so the chq_fingerprint value that lands AT REST in the
    * segments is pinned end-to-end, not just its convergence count.
    */
  private def fpcSegmentsSql: String =
    TelemetryQueries.DuckXxh64.query(
      """xsrc AS (
         WITH fpc_counts AS (
           SELECT event_type,
                  CASE WHEN event_id % 2 = 0 THEN 'request' ELSE 'fetch' END AS w,
                  count(*) AS c
           FROM events WHERE event_id % 19 = 0 AND event_type <> 'signup'
           GROUP BY 1, 2),
         fpc_winner AS (
           SELECT event_type AS wt, w AS ww FROM fpc_counts
           ORDER BY c DESC, event_type ASC, w ASC LIMIT 1)
         SELECT e.event_type AS attr_event_type, count(*) AS n,
                CAST(1 AS BIGINT) AS n_fp, 'INFO' AS lvl,
                CASE WHEN e.event_type = 'signup'
                     THEN 'user:signup:ok:msg:plan:uid'
                     ELSE (SELECT '<Loglevel>:' || wt || ':' || ww ||
                           ':user:<Number>:<Path>:in:<Duration>'
                           FROM fpc_winner)
                END AS payload
         FROM events e WHERE e.event_id % 19 = 0 GROUP BY 1)""",
      "attr_event_type, n, n_fp, lvl", maxBytes = 96)

  override def all: Seq[Q] = Seq(
    Q("it_stream_fpc", streamFpc, Some(streamFpcSql)),
    Q("it_fpc_segments", fpcSegments, Some(fpcSegmentsSql)),
    Q("it_seg_rate", segRate, Some(segRateSql(segRootCur))),
    Q("it_seg_offset_walk", segOffsetWalk, Some(segOffsetWalkSql(segRootCur))),
    Q("it_seg_offset_neg", segOffsetNeg, Some(segOffsetNegSql(segRootCur))),
    Q("it_seg_at_pin", segAtPin, Some(segAtPinSql(segRootCur))),
    Q("it_seg_at_pin_range", segAtPinRange, Some(segAtPinRangeSql(segRootCur))),
    Q("it_seg_at_end", segAtEnd, Some(segAtEndSql(segRootCur))),
    Q("it_seg_multi_pin", segMultiPin, Some(segMultiPinSql(segRootCur))),
    Q("it_seg_limitk", segLimitk, Some(segLimitkSql(segRootCur))),
    Q("it_seg_bucket10s", segBucket10s, Some(segBucket10sSql(segRootCur))),
    Q("it_tier_fresh", tierFresh, Some(tierFreshSql(freshRootCur))),
    Q("it_tier_fresh_intraday", tierFreshIntraday,
      Some(tierFreshIntradaySql(intraRootCur))),
    Q("it_tier_fresh_batch", tierFreshBatch,
      Some(tierFreshBatchSql(batchRootCur))),
    Q("td_fresh_tag_values", freshTagValues, Some(freshTagValuesSql(freshRootCur))),
    Q("it_schema_union", schemaUnion, Some(schemaUnionSql(unionRootCur))),
    Q("it_stream_ingest", streamIngest, Some(streamIngestSql)),
    Q("it_stream_rollup", streamRollup, Some(streamRollupSql(streamRollupDirCur))),
    Q("it_stream_asof", streamAsof, Some(streamAsofSql)),
    Q("it_stream_asof_fwd", streamAsofFwd, Some(streamAsofFwdSql)),
    Q("it_log_needle", logNeedle, Some(logNeedleSql(logSegRootCur))),
    Q("it_http_logs", httpLogs, Some(httpLogsSql(logSegRootCur))),
    Q("it_logs_multi", logsMulti, Some(logsMultiSql(logSegRootCur))),
    Q("it_http_metrics", httpMetrics, Some(segRateSql(segRootCur))),
    Q("it_log_regex_needle", logRegexNeedle, Some(logRegexNeedleSql(logSegRootCur))),
    Q("it_multi_org", multiOrg, Some(multiOrgSql(orgSegRootCur))),
    Q("it_agg_substitution", aggSubstitution, Some(aggSubstitutionSql(logSegRootCur))),
    Q("it_trace_lookup", traceLookup, Some(traceLookupSql(spanSegRootCur))),
    Q("it_exemplar_trace", exemplarTrace, Some(exemplarTraceSql(spanSegRootCur))),
    Q("it_asof_enrich", asofEnrich, Some(asofEnrichSql(segRootCur))),
    Q("it_span_logql", spanLogql, Some(spanLogqlSql(spanSegRootCur)))
  )
}
