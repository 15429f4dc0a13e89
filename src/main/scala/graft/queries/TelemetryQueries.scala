package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.ingest.{Flatten, MetricsPreAgg, OtelProto, Readers, Segments}

/** Processing-side coverage: pre-aggregation, the rollup chain, segment
  * write/compact round-trips, and file-format ingest — each verified
  * against a direct DuckDB aggregation over the source `events` table
  * (associativity: chained partial aggs must equal the one-shot answer).
  */
object TelemetryQueries extends Catalog {

  private def raw(s: SparkSession, d: String): DataFrame = Tables.events(s, d)

  private val tidSql =
    "CAST(('0x' || substr(md5('events_value|attr_event_type=' || event_type), 1, 12)) AS BIGINT)"

  /** events → 10s pre-agg cooked rows (no sketch → exact compare) */
  private def preagg10(s: SparkSession, d: String): DataFrame =
    MetricsPreAgg.preAggregate(
      raw(s, d), col("ts_ms"), lit("events_value"), col("value"),
      Seq("attr_event_type" -> col("event_type")), freqMs = 10000L,
      withSketch = false)
      .select(col("chq_timestamp"), col("metric_name"), col("chq_tid"),
        col("chq_rollup_sum"), col("chq_rollup_count"),
        col("chq_rollup_min"), col("chq_rollup_max"), col("attr_event_type"))

  private val preagg10Sql =
    s"""SELECT epoch_ms(ts) - epoch_ms(ts) % 10000 AS chq_timestamp,
       'events_value' AS metric_name,
       $tidSql AS chq_tid,
       sum("value") AS chq_rollup_sum,
       CAST(count(*) AS DOUBLE) AS chq_rollup_count,
       min("value") AS chq_rollup_min,
       max("value") AS chq_rollup_max,
       event_type AS attr_event_type
       FROM events GROUP BY 1, 3, 8"""

  /** sketch-extracted percentile columns at ingest pre-agg (cooked contract
    * chq_rollup_p25..p99): the oracle replays the DDSketch quantile read
    * (log-bucket index, lower-rank, midpoint, clamp) per 10 s bucket.
    */
  private def preaggPercentiles(s: SparkSession, d: String): DataFrame =
    MetricsPreAgg.preAggregate(
      raw(s, d), col("ts_ms"), lit("events_value"), col("value"),
      Seq("attr_event_type" -> col("event_type")), freqMs = 10000L,
      withSketch = true)
      .select(col("chq_timestamp"), col("attr_event_type"),
        col("chq_rollup_count"),
        round(col("chq_rollup_p50"), 6).as("p50"),
        round(col("chq_rollup_p95"), 6).as("p95"))

  private val preaggPercentilesSql = {
    val g = "((1.0 + 0.01) / (1.0 - 0.01))"
    def sel(q: Double, nm: String) =
      s"""$nm AS (
         SELECT c.chq_timestamp, c.attr_event_type, min(c.i) AS qi
         FROM cum c JOIN stats st USING (chq_timestamp, attr_event_type)
         WHERE st.zc + c.cum >= CAST(floor($q * (st.n - 1)) AS BIGINT) + 1
         GROUP BY 1, 2)"""
    // zero-bucket rule: rank inside the zero count reads back 0.0
    def out(q: Double, nm: String) =
      s"""round(CASE WHEN st.zc >= CAST(floor($q * (st.n - 1)) AS BIGINT) + 1
                THEN 0.0
                ELSE least(greatest(2 * pow($g, $nm.qi) / ($g + 1.0), st.mn),
                           st.mx) END, 6)"""
    s"""WITH ev AS (
       SELECT epoch_ms(ts) - epoch_ms(ts) % 10000 AS chq_timestamp,
              event_type AS attr_event_type, "value" AS v
       FROM events),
     stats AS (
       SELECT chq_timestamp, attr_event_type, CAST(count(*) AS BIGINT) AS n,
              CAST(count(*) FILTER (WHERE v < 1e-9) AS BIGINT) AS zc,
              min(v) AS mn, max(v) AS mx
       FROM ev GROUP BY 1, 2),
     idx AS (
       SELECT chq_timestamp, attr_event_type,
              CAST(ceil(ln(v) / ln($g)) AS BIGINT) AS i, count(*) AS c
       FROM ev WHERE v >= 1e-9 GROUP BY 1, 2, 3),
     cum AS (
       SELECT chq_timestamp, attr_event_type, i,
              sum(c) OVER (PARTITION BY chq_timestamp, attr_event_type
                           ORDER BY i) AS cum
       FROM idx),
     ${sel(0.5, "q50")},
     ${sel(0.95, "q95")}
     SELECT st.chq_timestamp, st.attr_event_type,
            CAST(st.n AS DOUBLE) AS chq_rollup_count,
            ${out(0.5, "q50")} AS p50,
            ${out(0.95, "q95")} AS p95
     FROM stats st
     LEFT JOIN q50 USING (chq_timestamp, attr_event_type)
     LEFT JOIN q95 USING (chq_timestamp, attr_event_type)"""
  }

  /** DataDog-proto sketch interop end-to-end: every 10 s sketch exports to
    * proto bytes (`ddsketch_to_proto`) and re-imports
    * (`ddsketch_from_proto`) before the quantile read. Bucket contents
    * survive the round trip exactly (midpoints re-index onto the same
    * buckets), but min/max become bucket READ-BACKS — so the oracle is the
    * percentile replay WITHOUT the exact-min/max clamp (which is a no-op
    * on a round-tripped sketch: the chosen midpoint always lies within the
    * read-back extremes).
    */
  private def protoSketchRoundtrip(s: SparkSession, d: String): DataFrame = {
    import graft.sketch.{functions => gf}
    MetricsPreAgg.preAggregate(
      raw(s, d), col("ts_ms"), lit("events_value"), col("value"),
      Seq("attr_event_type" -> col("event_type")), freqMs = 10000L,
      withSketch = true)
      .withColumn("sk2",
        gf.ddsketch_from_proto(gf.ddsketch_to_proto(col("chq_sketch"))))
      .select(col("chq_timestamp"), col("attr_event_type"),
        col("chq_rollup_count"),
        round(gf.ddsketch_quantile(col("sk2"), 0.5), 6).as("p50"),
        round(gf.ddsketch_quantile(col("sk2"), 0.95), 6).as("p95"))
  }

  private val protoSketchRoundtripSql = {
    val g = "((1.0 + 0.01) / (1.0 - 0.01))"
    def sel(q: Double, nm: String) =
      s"""$nm AS (
         SELECT c.chq_timestamp, c.attr_event_type, min(c.i) AS qi
         FROM cum c JOIN stats st USING (chq_timestamp, attr_event_type)
         WHERE st.zc + c.cum >= CAST(floor($q * (st.n - 1)) AS BIGINT) + 1
         GROUP BY 1, 2)"""
    def out(q: Double, nm: String) =
      s"""round(CASE WHEN st.zc >= CAST(floor($q * (st.n - 1)) AS BIGINT) + 1
                THEN 0.0 ELSE 2 * pow($g, $nm.qi) / ($g + 1.0) END, 6)"""
    s"""WITH ev AS (
       SELECT epoch_ms(ts) - epoch_ms(ts) % 10000 AS chq_timestamp,
              event_type AS attr_event_type, "value" AS v
       FROM events),
     stats AS (
       SELECT chq_timestamp, attr_event_type, CAST(count(*) AS BIGINT) AS n,
              CAST(count(*) FILTER (WHERE v < 1e-9) AS BIGINT) AS zc
       FROM ev GROUP BY 1, 2),
     idx AS (
       SELECT chq_timestamp, attr_event_type,
              CAST(ceil(ln(v) / ln($g)) AS BIGINT) AS i, count(*) AS c
       FROM ev WHERE v >= 1e-9 GROUP BY 1, 2, 3),
     cum AS (
       SELECT chq_timestamp, attr_event_type, i,
              sum(c) OVER (PARTITION BY chq_timestamp, attr_event_type
                           ORDER BY i) AS cum
       FROM idx),
     ${sel(0.5, "q50")},
     ${sel(0.95, "q95")}
     SELECT st.chq_timestamp, st.attr_event_type,
            CAST(st.n AS DOUBLE) AS chq_rollup_count,
            ${out(0.5, "q50")} AS p50,
            ${out(0.95, "q95")} AS p95
     FROM stats st
     LEFT JOIN q50 USING (chq_timestamp, attr_event_type)
     LEFT JOIN q95 USING (chq_timestamp, attr_event_type)"""
  }

  /** At-rest sketches-go read-compat (r12 VERDICT #6): a metric segment
    * whose `chq_sketch` column carries DataDog-proto bytes — what a
    * REFERENCE-written segment stores; the fixture bytes are generated
    * through graft's proto encoder since no sketches-go library exists in
    * this environment — is written to disk, then read back through
    * [[Segments.readMetricSegments]] under the proto-compat session flag,
    * which converts the column to graft sketch bytes ON READ. Quantiles
    * come off the read-back; the oracle re-derives them independently
    * (the [[protoSketchRoundtripSql]] bucket replay, reused verbatim —
    * the at-rest leg changes where the bytes live, not their content).
    */
  private def sketchCompat(s: SparkSession, d: String): DataFrame = {
    import graft.sketch.{functions => gf}
    val dir = Files.createTempDirectory("graft_tq_skcompat_").toString
    val cooked = MetricsPreAgg.preAggregate(
      raw(s, d), col("ts_ms"), lit("events_value"), col("value"),
      Seq("attr_event_type" -> col("event_type")), freqMs = 10000L,
      withSketch = true)
      .withColumn("chq_sketch", gf.ddsketch_to_proto(col("chq_sketch")))
    Segments.writeMetricSegments(cooked, dir)
    // compat pinned per-read (r13 ADVICE): no session-conf mutation that
    // another thread planning a concurrent read could pick up
    Segments.readMetricSegments(s, dir, protoCompat = Some(true))
      .select(col("chq_timestamp"), col("attr_event_type"),
        col("chq_rollup_count"),
        round(gf.ddsketch_quantile(col("chq_sketch"), 0.5), 6).as("p50"),
        round(gf.ddsketch_quantile(col("chq_sketch"), 0.95), 6).as("p95"))
  }

  /** WRITE-side sketches-go compat (r13 VERDICT #5): graft cooks its own
    * sketch column, writes the segment under the proto-compat WRITE flag
    * (`chq_sketch` lands at rest as DataDog-proto bytes a reference
    * deployment reads natively), then reads it back under the READ flag
    * — the full interop loop entirely at rest. Quantiles off the
    * round-trip; the oracle re-derives them from raw data
    * ([[protoSketchRoundtripSql]] verbatim).
    */
  private def sketchCompatWrite(s: SparkSession, d: String): DataFrame = {
    import graft.sketch.{functions => gf}
    val dir = Files.createTempDirectory("graft_tq_skcw_").toString
    val cooked = MetricsPreAgg.preAggregate(
      raw(s, d), col("ts_ms"), lit("events_value"), col("value"),
      Seq("attr_event_type" -> col("event_type")), freqMs = 10000L,
      withSketch = true)
    Segments.writeMetricSegments(cooked, dir, sketchProtoCompat = true)
    Segments.readMetricSegments(s, dir, protoCompat = Some(true))
      .select(col("chq_timestamp"), col("attr_event_type"),
        col("chq_rollup_count"),
        round(gf.ddsketch_quantile(col("chq_sketch"), 0.5), 6).as("p50"),
        round(gf.ddsketch_quantile(col("chq_sketch"), 0.95), 6).as("p95"))
  }

  /** full rollup chain 10s→60s→300s→1200s→3600s; the hourly tier must
    * equal a direct hourly aggregation of the raw events (associativity
    * through four re-aggregations).
    */
  private def rollupChain(s: SparkSession, d: String): DataFrame = {
    val base = MetricsPreAgg.preAggregate(
      raw(s, d), col("ts_ms"), lit("events_value"), col("value"),
      Seq("attr_event_type" -> col("event_type")), freqMs = 10000L,
      withSketch = false)
    val tiers = MetricsPreAgg.rollupChain(base)
    // events.value is 2-decimal quantized, so the hourly sum's TRUE value
    // is integer cents: recover it exactly on both engines (sum-order ulp
    // noise ≪ the half-cent margin) instead of emitting the raw float sum,
    // whose round-6 hash flips at scale — the pq_rate exactCents precedent.
    // avg divides the recovered sum by the exact count: deterministic.
    val exactSum = round(col("chq_rollup_sum") * 100, 0).cast("long") / lit(100.0)
    tiers(3600000L).select(
      col("chq_timestamp"), col("chq_tid"), col("attr_event_type"),
      exactSum.as("chq_rollup_sum"), col("chq_rollup_count"),
      col("chq_rollup_min"), col("chq_rollup_max"),
      (exactSum / col("chq_rollup_count")).as("chq_rollup_avg"))
  }

  private val rollupChainSql =
    s"""SELECT epoch_ms(ts) - epoch_ms(ts) % 3600000 AS chq_timestamp,
       $tidSql AS chq_tid,
       event_type AS attr_event_type,
       CAST(round(sum("value") * 100, 0) AS BIGINT) / 100.0 AS chq_rollup_sum,
       CAST(count(*) AS DOUBLE) AS chq_rollup_count,
       min("value") AS chq_rollup_min,
       max("value") AS chq_rollup_max,
       CAST(round(sum("value") * 100, 0) AS BIGINT) / 100.0 / count(*)
         AS chq_rollup_avg
       FROM events GROUP BY 1, 2, 3"""

  /** write sorted/partitioned segments, compact, read back: per-dateint
    * counts and sums must survive the round-trip exactly.
    */

  private def segmentRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dir = Files.createTempDirectory("graft_seg_").toString
    // materialize: BOTH write waves filter this frame — unmaterialized,
    // each wave re-ran the whole pre-aggregation (r18; same rows either way)
    val base = graft.GraftSession.materialize(MetricsPreAgg.preAggregate(
      raw(s, d), col("ts_ms"), lit("events_value"), col("value"),
      Seq("attr_event_type" -> col("event_type")), freqMs = 60000L,
      withSketch = false))
    // two interleaved writes (alternating minutes — chq_tid has only one
    // value per event_type, so it can't split) → many small files per
    // partition dir → compact → one sorted file per dir. SEQUENTIAL on
    // purpose (r18): overlapping the waves (guide §2.6) was tried and
    // REVERTED — two concurrent dynamic-partition appends to one root
    // share the FileOutputCommitter `_temporary/0` staging dir and
    // clobber each other (verified: half the rows vanished at sf0.01).
    val half = expr("chq_timestamp DIV 60000 % 2")
    Segments.writeMetricSegments(base.filter(half === 0), dir,
      maxRecordsPerFile = 2000)
    Segments.writeMetricSegments(base.filter(half =!= 0), dir,
      maxRecordsPerFile = 2000)
    val before = Segments.countDataFiles(s, dir)
    val compacted = Segments.compactMetricSegments(s, dir)
    val after = Segments.countDataFiles(s, dir)
    // the small-files problem must actually be solved on disk
    require(after < before && after <= 35,
      s"compaction did not shrink the file set: $before -> $after")
    compacted.groupBy(col("dateint"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("chq_rollup_sum")).as("sum_v"),
        sum(col("chq_rollup_count")).cast("double").as("n_events"))
  }

  private val segmentRoundtripSql =
    """SELECT CAST(strftime(ts, '%Y%m%d') AS INT) AS dateint,
       count(DISTINCT (epoch_ms(ts) - epoch_ms(ts) % 60000, event_type)) AS n_rows,
       sum("value") AS sum_v,
       CAST(count(*) AS DOUBLE) AS n_events
       FROM events GROUP BY 1"""

  /** log-segment write + compaction round-trip (reference
    * log_compaction_processor.go): two interleaved small-file writes,
    * compact to one sorted file per dateint, totals survive exactly
    */
  private def logSegmentRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dir = Files.createTempDirectory("graft_logseg_").toString
    // materialize, exactly as in [[segmentRoundtrip]]: the line
    // construction (regex-heavy) otherwise runs once per write wave.
    // Sequential waves for the same committer-staging reason.
    val logs = graft.GraftSession.materialize(graft.model.Cooked.logs(s, d))
    val half = expr("chq_timestamp % 2")
    Segments.writeLogSegments(logs.filter(half === 0), dir, maxRecordsPerFile = 2000)
    Segments.writeLogSegments(logs.filter(half =!= 0), dir, maxRecordsPerFile = 2000)
    val before = Segments.countDataFiles(s, dir)
    val compacted = Segments.compactLogSegments(s, dir)
    val after = Segments.countDataFiles(s, dir)
    require(after < before && after <= 35,
      s"log compaction did not shrink the file set: $before -> $after")
    compacted.groupBy(col("dateint"))
      .agg(count(lit(1)).as("n_lines"),
        countDistinct(col("chq_fingerprint")).as("n_shapes"),
        min(col("chq_tsns")).as("min_tsns"))
  }

  private val logSegmentRoundtripSql =
    s"""WITH ${graft.model.Cooked.logsCte}
     SELECT CAST(strftime(epoch_ms(chq_timestamp), '%Y%m%d') AS INT) AS dateint,
            CAST(count(*) AS BIGINT) AS n_lines,
            CAST(count(DISTINCT ${graft.ingest.LogFingerprint.fingerprintSql("log_message")})
              AS BIGINT) AS n_shapes,
            min(chq_tsns) AS min_tsns
     FROM logs GROUP BY 1"""

  /** enumerate the exact data files a just-finished write produced: a glob
    * over a fresh temp dir races the filesystem listing (r6's one bench
    * flake was exactly this), while the explicit list is deterministic —
    * and an empty list fails loudly instead of benching an empty frame
    */
  private def writtenFiles(dir: String, suffix: String): Seq[String] = {
    val files = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(_.getName.endsWith(suffix)).map(_.getAbsolutePath).sorted.toSeq
    require(files.nonEmpty, s"no *$suffix files written under $dir")
    files
  }

  /** NDJSON.gz ingest round-trip: events → ndjson.gz on disk → readAny →
    * flatten → per-level counts equal a direct aggregation.
    */
  private def jsonIngest(s: SparkSession, d: String): DataFrame = {
    val dir = Files.createTempDirectory("graft_json_").toString + "/logs.json"
    raw(s, d).select(
      col("ts_ms"),
      struct(struct(col("user_id").cast("string").as("service.name")).as("attributes"))
        .as("resource"),
      col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").option("compression", "gzip").json(dir)
    val back = Readers.readAny(s, writtenFiles(dir, ".json.gz"))
    val cooked = Flatten.flattenToCooked(back,
      prefixes = Map("resource" -> "resource_"),
      keepTyped = Set("ts_ms", "value"))
    cooked.groupBy(col("event_type"), col("resource_attributes_service_name"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_v"))
  }

  private val jsonIngestSql =
    """SELECT event_type, CAST(user_id AS VARCHAR) AS resource_attributes_service_name,
       count(*) AS n, round(sum("value"), 4) AS sum_v
       FROM events GROUP BY 1, 2"""

  /** CSV → cooked-log translation (reference csv_log_translator.go):
    * messy headers sanitize into the log_* namespace, `data` becomes
    * log_message, the seconds-valued event_time column becomes
    * chq_timestamp in ms, provenance constants appended.
    */
  private def csvLogTranslate(s: SparkSession, d: String): DataFrame = {
    val dir = Files.createTempDirectory("graft_csvlog_").toString + "/log.csv"
    raw(s, d).select(
      expr("ts_ms DIV 1000").as("event_time"),
      col("props").as("data"),
      col("event_type").as("Event Type"),
      col("value").as("Value%"))
      .write.mode("overwrite").option("header", "true").csv(dir)
    val cooked = graft.ingest.CsvLog.translate(
      Readers.readAny(s, writtenFiles(dir, ".csv")), "bench-bucket", "log.csv")
    cooked.groupBy(col("log_event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("log_value")), 4).as("sum_v"),
        min(col("chq_timestamp")).as("min_ts"),
        first(col("resource_service_name")).as("svc"),
        count(col("log_message")).as("n_msg"))
  }

  private val csvLogTranslateSql =
    """SELECT event_type AS log_event_type, CAST(count(*) AS BIGINT) AS n,
              round(sum("value"), 4) AS sum_v,
              min(epoch_ms(ts) // 1000 * 1000) AS min_ts,
              'csv-import' AS svc,
              CAST(count(*) AS BIGINT) AS n_msg
       FROM events GROUP BY 1"""

  /** CSV ingest round-trip with header + type inference */
  private def csvIngest(s: SparkSession, d: String): DataFrame = {
    val dir = Files.createTempDirectory("graft_csv_").toString + "/events.csv"
    raw(s, d).select(col("event_id"), col("ts_ms"), col("event_type"), col("value"))
      .write.mode("overwrite").option("header", "true").csv(dir)
    val back = Readers.readAny(s, writtenFiles(dir, ".csv"))
    back.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(avg(col("value")), 6).as("avg_v"),
        max(col("ts_ms")).cast("long").as("max_ts"))
  }

  private val csvIngestSql =
    """SELECT event_type, count(*) AS n, round(avg("value"), 6) AS avg_v,
       max(epoch_ms(ts)) AS max_ts
       FROM events GROUP BY 1"""

  private val SpanStart = 1704067200000L
  private val SpanEnd = SpanStart + 14L * 86400000L

  /** Message-shape fingerprint clustering: same-shape lines share one
    * chq_fingerprint; the oracle replays template extraction + md5-48.
    */
  private def logFingerprint(s: SparkSession, d: String): DataFrame =
    graft.model.Cooked.logs(s, d)
      .groupBy(col("chq_fingerprint"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("attr_event_type")).as("n_types"),
        min(col("chq_timestamp")).as("first_ts"))

  private val logFingerprintSql = {
    import graft.ingest.LogFingerprint
    s"""WITH ${graft.model.Cooked.logsCte}
     SELECT ${LogFingerprint.fingerprintSql("log_message")} AS chq_fingerprint,
            CAST(count(*) AS BIGINT) AS n,
            CAST(count(DISTINCT attr_event_type) AS BIGINT) AS n_types,
            min(chq_timestamp) AS first_ts
     FROM logs GROUP BY 1"""
  }

  /** Trie-style learned clustering ([[graft.ingest.TrieFingerprint]],
    * reference trie_cluster_manager.go): two message families — one whose
    * mid-sentence literal (event_type, 5 variants) exceeds the wildcard
    * threshold and MUST collapse to a single fingerprint (n_templates = 5
    * pre-merge templates in one cluster), one whose 3-variant literal
    * stays below it and must NOT merge. The oracle replays the whole
    * normalize → position-cardinality → mask pipeline in SQL.
    */
  private def logFingerprintTrie(s: SparkSession, d: String): DataFrame = {
    import graft.ingest.{LogFingerprint, TrieFingerprint}
    val variant = when(col("user_id") % 3 === 0, "alpha")
      .when(col("user_id") % 3 === 1, "beta").otherwise("gamma")
    val msg = when(col("event_id") % 2 === 0,
      concat(lit("job "), col("user_id"), lit(" finished "), col("event_type"),
        lit(" code "), floor(col("value") * 10).cast("long")))
      .otherwise(concat(lit("worker "), col("user_id"), lit(" entered "), variant))
    // compute the stateless template ONCE; the masked dimension joins on it
    // and n_templates counts it — no repeated normalization passes.
    // Materialize (r18): `t` feeds BOTH the distinct-template dimension
    // and the message join, so the template regex chain evaluated TWICE
    // (task-CPU 2.3 s); one materialized pass halves it (wall 2.56→2.1 s,
    // cpu 2.3→1.1 s at sf0.1). A spread variant was also measured and
    // REJECTED: the extra exchange + 32-way contention cost more than the
    // parallelism won on this 100 k-row pass (wall ~2.4 s, cpu 6-15 s).
    val t = graft.GraftSession.materialize(
      raw(s, d).select(col("user_id"), col("event_id"), col("event_type"),
        col("value"))
        .select(LogFingerprint.template(msg).as("__tpl")))
    val dim = TrieFingerprint.maskedTemplates(t.distinct(), "__tpl", maxVariants = 4)
    t.join(dim, Seq("__tpl"))
      .groupBy(col("trie_fingerprint"), col("trie_template"))
      .agg(count(lit(1)).as("n_messages"),
        countDistinct(col("__tpl")).as("n_templates"))
  }

  private val logFingerprintTrieSql = {
    import graft.ingest.LogFingerprint
    s"""WITH lines AS (
       SELECT CASE WHEN event_id % 2 = 0
         THEN 'job ' || CAST(user_id AS VARCHAR) || ' finished ' || event_type
              || ' code ' || CAST(CAST(floor("value" * 10) AS BIGINT) AS VARCHAR)
         ELSE 'worker ' || CAST(user_id AS VARCHAR) || ' entered ' ||
              CASE user_id % 3 WHEN 0 THEN 'alpha' WHEN 1 THEN 'beta'
                   ELSE 'gamma' END
       END AS msg FROM events),
     tpl AS (SELECT msg, ${LogFingerprint.templateSql("msg")} AS tpl FROM lines),
     dt AS (SELECT DISTINCT tpl FROM tpl),
     pos AS (SELECT tpl, len(string_split(tpl, ' ')) AS n,
                    string_split(tpl, ' ')[1] AS head,
                    generate_subscripts(string_split(tpl, ' '), 1) - 1 AS p,
                    unnest(string_split(tpl, ' ')) AS t
             FROM dt),
     wild AS (SELECT n, head, p FROM (
                SELECT n, head, p, count(DISTINCT t) AS nd
                FROM pos GROUP BY 1, 2, 3) WHERE nd > 4),
     masked AS (SELECT pos.tpl,
                  string_agg(CASE WHEN wild.p IS NOT NULL THEN '<*>'
                             ELSE pos.t END, ' ' ORDER BY pos.p) AS trie_template
                FROM pos LEFT JOIN wild
                  ON pos.n = wild.n AND pos.head = wild.head AND pos.p = wild.p
                GROUP BY pos.tpl)
     SELECT CAST(('0x' || substr(md5(m.trie_template), 1, 12)) AS BIGINT)
              AS trie_fingerprint,
            m.trie_template,
            CAST(count(*) AS BIGINT) AS n_messages,
            CAST(count(DISTINCT tpl.tpl) AS BIGINT) AS n_templates
     FROM tpl JOIN masked m USING (tpl)
     GROUP BY 1, 2"""
  }

  /** HLL cardinality (reference SketchHLL merge paths,
    * promql/eval_types.go:22-32): the estimate itself is engine-specific,
    * so the oracle-checkable contract is "estimate within the configured
    * error band of the exact count" — hll_ok must be 1 for every group.
    */
  private def hllCardinality(s: SparkSession, d: String): DataFrame =
    raw(s, d).groupBy(col("event_type").as("attr_event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact"),
        approx_count_distinct(col("user_id"), 0.02).as("approx"))
      .select(col("attr_event_type"), col("n_exact"),
        when(abs(col("approx") - col("n_exact")) <=
          col("n_exact").cast("double") * 0.05, 1L).otherwise(0L).as("hll_ok"))

  private val hllCardinalitySql =
    """SELECT event_type AS attr_event_type,
              CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
              CAST(1 AS BIGINT) AS hll_ok
       FROM events GROUP BY 1"""

  /** Mergeable distinct-count sketches: per-group DataSketches HLL of
    * user_id (Spark 4 built-ins), unioned ACROSS groups — the set-union
    * cardinality approx_count_distinct cannot express (its partials never
    * leave the one aggregation). The estimate gates against the exact
    * distinct union with the same ±5% ok-flag contract as
    * tq_hll_cardinality.
    */
  private def hllUnion(s: SparkSession, d: String): DataFrame = {
    val perGroup = raw(s, d)
      .groupBy(col("event_type"))
      .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"),
        countDistinct(col("user_id")).as("n_group"))
    perGroup.agg(
      expr("hll_sketch_estimate(hll_union_agg(sk))").as("approx_union"),
      sum(col("n_group")).as("sum_groups"))
      .crossJoin(raw(s, d).agg(countDistinct(col("user_id")).as("n_exact")))
      .select(col("n_exact"),
        when(abs(col("approx_union") - col("n_exact")) <=
          col("n_exact").cast("double") * 0.05, 1L).otherwise(0L).as("hll_ok"),
        // the union must deduplicate: estimate ≤ the naive per-group sum
        when(col("approx_union") <= col("sum_groups").cast("double"), 1L)
          .otherwise(0L).as("dedup_ok"))
  }

  private val hllUnionSql =
    """SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
              CAST(1 AS BIGINT) AS hll_ok, CAST(1 AS BIGINT) AS dedup_ok
       FROM events"""

  /** Heavy hitters via Count-Min: one CMS over all user_ids (the custom
    * TypedImperativeAggregate — commutative counter adds, md5-derived row
    * hashes), estimates read for the exact top-10. The oracle recomputes
    * every probed CELL from the exact value counts: est(v) = min over
    * rows j of Σ counts(y) where hash_j(y) == hash_j(v) — the sketch's
    * defining identity, bit-replayable because the hash is md5.
    */
  private def heavyHitters(s: SparkSession, d: String): DataFrame = {
    import graft.sketch.{functions => gf}
    val ev = raw(s, d)
    val cms = ev.agg(gf.cms_agg(col("user_id"), 4, 1024).as("__cms"))
    val top = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy(col("n_events").desc, col("user_id").asc)
      .limit(10)
    top.crossJoin(broadcast(cms))
      .select(col("user_id"), col("n_events"),
        gf.cms_est(col("__cms"), col("user_id")).as("cms_est"))
  }

  private val heavyHittersSql =
    """WITH counts AS (
       SELECT CAST(user_id AS VARCHAR) AS v, count(*) AS n
       FROM events GROUP BY 1),
     cells AS (
       SELECT j,
              CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || '|' || v), 1, 12))
                AS BIGINT) % 1024 AS cell,
              CAST(sum(n) AS BIGINT) AS cn
       FROM counts CROSS JOIN range(0, 4) t(j)
       GROUP BY 1, 2),
     est AS (
       SELECT c.v, min(cl.cn) AS est_n
       FROM counts c
       CROSS JOIN range(0, 4) t(j)
       JOIN cells cl
         ON cl.j = t.j
        AND cl.cell = CAST(('0x' || substr(md5(CAST(t.j AS VARCHAR) || '|' || c.v), 1, 12))
              AS BIGINT) % 1024
       GROUP BY 1),
     top AS (
       SELECT v, n FROM counts
       ORDER BY n DESC, CAST(v AS BIGINT) ASC LIMIT 10)
     SELECT CAST(top.v AS BIGINT) AS user_id,
            CAST(top.n AS BIGINT) AS n_events,
            est.est_n AS cms_est
     FROM top JOIN est ON est.v = top.v"""

  // ---- OTel binpb round-trips ---------------------------------------------

  private def gzWrite(prefix: String, name: String, blob: Array[Byte]): String = {
    val f = Files.createTempDirectory(prefix).resolve(name)
    val os = new java.util.zip.GZIPOutputStream(java.nio.file.Files.newOutputStream(f))
    os.write(blob); os.close()
    f.toString
  }

  /** OTel MetricsData round-trip: events subset → encoded gauge + monotonic
    * sum datapoints → .binpb.gz → wire decoder → per-series aggregate. The
    * oracle recomputes the same aggregate straight from `events`, so every
    * decode field (time ns→ms, as_double, attrs, resource attrs, metric
    * type) must survive the wire.
    */
  private def binpbMetrics(s: SparkSession, d: String): DataFrame = {
    import OtelProto.Encode
    val rows = raw(s, d).filter(col("event_id") % 5 === 0)
      .select(col("event_id"), col("ts_ms"), col("event_type"), col("value"))
      .collect() // fixture encoding is driver-side by design (test harness)
    val (counterRows, gaugeRows) = rows.partition(_.getLong(0) % 10 == 0)
    def dps(rs: Array[org.apache.spark.sql.Row]) = rs.toSeq.map(r =>
      Encode.numberDp(r.getLong(1) * 1000000L, r.getDouble(3),
        Seq("event.type" -> r.getString(2))))
    val blob = Encode.metricsData(
      Seq("service.name" -> "fixture-svc"), "graft-test",
      Seq(Encode.gaugeMetric("events_value", dps(gaugeRows)),
        Encode.sumMetric("events_count", monotonic = true, dps(counterRows))))
    OtelProto.readMetrics(s, gzWrite("graft_binpb_m_", "metrics.binpb.gz", blob))
      .groupBy(col("metric_name"), col("chq_metric_type"),
        col("attr_event_type"), col("resource_service_name"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_v"),
        min(col("chq_timestamp")).as("min_ts"), max(col("chq_timestamp")).as("max_ts"))
  }

  private val binpbMetricsSql =
    """SELECT CASE WHEN event_id % 10 = 0 THEN 'events_count'
                   ELSE 'events_value' END AS metric_name,
              CASE WHEN event_id % 10 = 0 THEN 'count' ELSE 'gauge' END
                AS chq_metric_type,
              event_type AS attr_event_type,
              'fixture-svc' AS resource_service_name,
              CAST(count(*) AS BIGINT) AS n, round(sum("value"), 4) AS sum_v,
              min(epoch_ms(ts)) AS min_ts, max(epoch_ms(ts)) AS max_ts
       FROM events WHERE event_id % 5 = 0 GROUP BY 1, 2, 3, 4"""

  /** OTel histogram round-trip: events bucketed into classic histogram
    * datapoints per (hour, event_type) with bounds (5,20,50,100,200] →
    * encoded → wire decoder → every decoded field (count/sum/min/max,
    * packed bucket counts and bounds) checked against a DuckDB replay of
    * the same bucketing.
    */
  /** explicit-bounds histogram fixture blob path (shared by the decode
    * round-trip and the sketch-quantile rows)
    */
  private def histFixturePath(s: SparkSession, d: String): String = {
    import OtelProto.Encode
    val bounds = Seq(5.0, 20.0, 50.0, 100.0, 200.0)
    val rows = raw(s, d).filter(col("event_id") % 3 === 0)
      .select(expr("ts_ms - ts_ms % 3600000").as("h"), col("event_type"),
        col("value"))
      .collect()
    val dps = rows.groupBy(r => (r.getLong(0), r.getString(1))).toSeq
      .sortBy(_._1).map { case ((h, et), rs) =>
        val vs = rs.map(_.getDouble(2))
        val counts = (bounds.indices :+ bounds.length).map { i =>
          vs.count { v =>
            val lo = if (i == 0) Double.NegativeInfinity else bounds(i - 1)
            val hi = if (i == bounds.length) Double.PositiveInfinity else bounds(i)
            v > lo && v <= hi
          }.toLong
        }
        Encode.histogramDp(h * 1000000L, vs.length.toLong, vs.sum,
          vs.min, vs.max, counts, bounds, Seq("event.type" -> et))
      }
    val blob = Encode.metricsData(Seq("service.name" -> "fixture-svc"),
      "graft-test", Seq(Encode.histogramMetric("events_value_hist", dps)))
    gzWrite("graft_binpb_h_", "hist.binpb.gz", blob)
  }

  private def binpbHistogram(s: SparkSession, d: String): DataFrame = {
    OtelProto.readHistograms(s, histFixturePath(s, d))
      .select(col("chq_timestamp"), col("attr_event_type"),
        col("chq_rollup_count"), round(col("chq_rollup_sum"), 4).as("sum_v"),
        col("chq_rollup_min").as("min_v"), col("chq_rollup_max").as("max_v"),
        concat_ws(",", col("bucket_counts")).as("buckets_csv"),
        concat_ws(",", col("explicit_bounds").cast("array<string>")).as("bounds_csv"))
  }

  private val binpbHistogramSql =
    """SELECT epoch_ms(ts) - epoch_ms(ts) % 3600000 AS chq_timestamp,
              event_type AS attr_event_type,
              CAST(count(*) AS BIGINT) AS chq_rollup_count,
              round(sum("value"), 4) AS sum_v,
              min("value") AS min_v, max("value") AS max_v,
              CAST(count(*) FILTER (WHERE "value" <= 5) AS VARCHAR)
                || ',' || count(*) FILTER (WHERE "value" > 5 AND "value" <= 20)
                || ',' || count(*) FILTER (WHERE "value" > 20 AND "value" <= 50)
                || ',' || count(*) FILTER (WHERE "value" > 50 AND "value" <= 100)
                || ',' || count(*) FILTER (WHERE "value" > 100 AND "value" <= 200)
                || ',' || count(*) FILTER (WHERE "value" > 200) AS buckets_csv,
              '5.0,20.0,50.0,100.0,200.0' AS bounds_csv
       FROM events WHERE event_id % 3 = 0 GROUP BY 1, 2"""

  /** OTel EXPONENTIAL histogram round-trip: events bucketed into scale-0
    * (base-2) datapoints per (hour, event_type) → encoded (zigzag scale/
    * offset, packed varint counts) → wire decoder → every decoded field
    * checked against a DuckDB replay. Bucket index k = smallest k ≥ -7
    * with v ≤ 2^(k+1); both engines find it by COMPARING against exact
    * power-of-two literals, so no log() boundary drift is possible.
    * v < 2^-7 counts into the zero bucket.
    */
  /** OTel Summary round-trip: per-(hour, event_type) summaries with
    * client-computed lower-rank p50/p90 → encoded → wire decoder →
    * quantiles land on the cooked percentile columns; oracle recomputes
    * the same lower-rank quantiles from events.
    */
  private def binpbSummary(s: SparkSession, d: String): DataFrame = {
    import OtelProto.Encode
    val rows = raw(s, d).filter(col("event_id") % 7 === 2)
      .select(expr("ts_ms - ts_ms % 3600000").as("h"), col("event_type"),
        col("value"))
      .collect()
    val dps = rows.groupBy(r => (r.getLong(0), r.getString(1))).toSeq
      .sortBy(_._1).map { case ((h, et), rs) =>
        val vs = rs.map(_.getDouble(2)).sorted
        def lowerRank(q: Double) = vs(math.floor(q * (vs.length - 1)).toInt)
        Encode.summaryDp(h * 1000000L, vs.length.toLong, vs.sum,
          Seq(0.5 -> lowerRank(0.5), 0.9 -> lowerRank(0.9)),
          Seq("event.type" -> et))
      }
    val blob = Encode.metricsData(Seq("service.name" -> "fixture-svc"),
      "graft-test", Seq(Encode.summaryMetric("events_value_summary", dps)))
    OtelProto.readSummaries(s,
      gzWrite("graft_binpb_s_", "summary.binpb.gz", blob))
      .select(col("chq_timestamp"), col("attr_event_type"),
        col("chq_rollup_count"), round(col("chq_rollup_sum"), 4).as("sum_v"),
        col("chq_rollup_p50").as("p50"), col("chq_rollup_p90").as("p90"))
  }

  private val binpbSummarySql =
    """SELECT epoch_ms(ts) - epoch_ms(ts) % 3600000 AS chq_timestamp,
              event_type AS attr_event_type,
              CAST(count(*) AS BIGINT) AS chq_rollup_count,
              round(sum("value"), 4) AS sum_v,
              (list_sort(list("value")))[CAST(floor(0.5 * (count(*) - 1)) AS BIGINT) + 1] AS p50,
              (list_sort(list("value")))[CAST(floor(0.9 * (count(*) - 1)) AS BIGINT) + 1] AS p90
       FROM events WHERE event_id % 7 = 2 GROUP BY 1, 2"""

  /** explicit-bounds histograms → DDSketch via midpoint re-binning
    * ([[graft.sketch.ExplicitBridge]]) → p90; the oracle replays the whole
    * bridge in SQL: per-datapoint bucket counts → midpoint representatives
    * (edge buckets use the datapoint's min/max) → default-gamma log bins →
    * rank walk with [min,max] clamp.
    */
  private def histExplicitQuantile(s: SparkSession, d: String): DataFrame = {
    import graft.sketch.{functions => gf}
    OtelProto.readHistogramSketches(s, histFixturePath(s, d))
      .select(col("chq_timestamp"), col("attr_event_type"),
        round(gf.ddsketch_quantile(col("chq_sketch"), 0.9), 6).as("p90"))
  }

  private val histExplicitQuantileSql = {
    val gamma = "((1.0 + 0.01) / (1.0 - 0.01))"
    s"""WITH ev AS (
       SELECT epoch_ms(ts) - epoch_ms(ts) % 3600000 AS h,
              event_type AS et, "value" AS v
       FROM events WHERE event_id % 3 = 0),
     stats AS (
       SELECT h, et, CAST(count(*) AS BIGINT) AS n, min(v) AS mn, max(v) AS mx
       FROM ev GROUP BY 1, 2),
     bucket AS (
       SELECT h, et,
              CASE WHEN v <= 5 THEN 0 WHEN v <= 20 THEN 1 WHEN v <= 50 THEN 2
                   WHEN v <= 100 THEN 3 WHEN v <= 200 THEN 4 ELSE 5 END AS bi,
              CAST(count(*) AS BIGINT) AS c
       FROM ev GROUP BY 1, 2, 3),
     rep AS (
       SELECT b.h, b.et, b.c,
              CASE b.bi WHEN 0 THEN (s.mn + 5) / 2.0
                        WHEN 1 THEN 12.5 WHEN 2 THEN 35.0 WHEN 3 THEN 75.0
                        WHEN 4 THEN 150.0 ELSE (200 + s.mx) / 2.0 END AS r
       FROM bucket b JOIN stats s ON s.h = b.h AND s.et = b.et),
     bins AS (
       SELECT h, et, CAST(ceil(ln(r) / ln($gamma)) AS BIGINT) AS i,
              CAST(sum(c) AS BIGINT) AS c
       FROM rep GROUP BY 1, 2, 3),
     cum AS (
       SELECT h, et, i, sum(c) OVER (PARTITION BY h, et ORDER BY i) AS cum
       FROM bins),
     sel AS (
       SELECT c.h, c.et, min(c.i) AS qi
       FROM cum c JOIN stats s ON s.h = c.h AND s.et = c.et
       WHERE c.cum >= CAST(floor(0.9 * (s.n - 1)) AS BIGINT) + 1
       GROUP BY 1, 2)
     SELECT s.h AS chq_timestamp, s.et AS attr_event_type,
            round(least(greatest(2 * pow($gamma, sel.qi) / ($gamma + 1.0), s.mn),
                        s.mx), 6) AS p90
     FROM stats s JOIN sel ON sel.h = s.h AND sel.et = s.et"""
  }

  /** scale-0 expo-histogram fixture blob path for the events subset
    * (shared by the decode round-trip and the sketch-quantile rows)
    */
  private def expoFixturePath(s: SparkSession, d: String): String = {
    import OtelProto.Encode
    val zeroThresh = 0.0078125 // 2^-7
    def idx(v: Double): Int = {
      var k = -7
      while (v > math.pow(2.0, (k + 1).toDouble)) k += 1
      k
    }
    val rows = raw(s, d).filter(col("event_id") % 4 === 1)
      .select(expr("ts_ms - ts_ms % 3600000").as("h"), col("event_type"),
        col("value"))
      .collect()
    val dps = rows.groupBy(r => (r.getLong(0), r.getString(1))).toSeq
      .sortBy(_._1).map { case ((h, et), rs) =>
        val vs = rs.map(_.getDouble(2))
        val (zeros, pos) = vs.partition(_ < zeroThresh)
        val ks = pos.map(idx)
        val (off, counts) =
          if (ks.isEmpty) (0, Seq.empty[Long])
          else {
            val lo = ks.min; val hi = ks.max
            (lo, (lo to hi).map(k => ks.count(_ == k).toLong).toSeq)
          }
        Encode.expoHistogramDp(h * 1000000L, vs.length.toLong, vs.sum,
          vs.min, vs.max, scale = 0, zeroCount = zeros.length.toLong,
          posOffset = off, posCounts = counts, Seq("event.type" -> et))
      }
    val blob = Encode.metricsData(Seq("service.name" -> "fixture-svc"),
      "graft-test", Seq(Encode.expoHistogramMetric("events_value_expo", dps)))
    gzWrite("graft_binpb_e_", "expo.binpb.gz", blob)
  }

  private def binpbExpoHistogram(s: SparkSession, d: String): DataFrame = {
    OtelProto.readExpoHistograms(s, expoFixturePath(s, d))
      .select(col("chq_timestamp"), col("attr_event_type"),
        col("chq_rollup_count"), round(col("chq_rollup_sum"), 4).as("sum_v"),
        col("chq_rollup_min").as("min_v"), col("chq_rollup_max").as("max_v"),
        col("scale").cast("long").as("scale"), col("zero_count"),
        col("pos_offset").cast("long").as("pos_offset"),
        concat_ws(",", col("pos_counts")).as("counts_csv"))
  }

  private val binpbExpoHistogramSql = {
    // k = smallest k in [-7, 17] with v <= 2^(k+1), by comparison ladder
    val ladder = (-7 to 17)
      .map(k => s"WHEN v <= ${math.pow(2.0, (k + 1).toDouble)} THEN $k")
      .mkString(" ")
    s"""WITH ev AS (
       SELECT epoch_ms(ts) - epoch_ms(ts) % 3600000 AS h,
              event_type AS et, "value" AS v,
              "value" < 0.0078125 AS isz,
              CASE $ladder END AS k
       FROM events WHERE event_id % 4 = 1),
     g AS (
       SELECT h, et, CAST(count(*) AS BIGINT) AS n, sum(v) AS sv,
              min(v) AS mn, max(v) AS mx,
              CAST(count(*) FILTER (WHERE isz) AS BIGINT) AS zc,
              min(k) FILTER (WHERE NOT isz) AS ko,
              max(k) FILTER (WHERE NOT isz) AS kx
       FROM ev GROUP BY 1, 2),
     kc AS (
       SELECT h, et, k, CAST(count(*) AS BIGINT) AS c
       FROM ev WHERE NOT isz GROUP BY 1, 2, 3),
     dense AS (
       SELECT g.h, g.et, unnest(range(g.ko, g.kx + 1)) AS k FROM g),
     counts AS (
       SELECT d.h, d.et,
              array_to_string(list(coalesce(kc.c, 0) ORDER BY d.k), ',') AS csv
       FROM dense d
       LEFT JOIN kc ON kc.h = d.h AND kc.et = d.et AND kc.k = d.k
       GROUP BY 1, 2)
     SELECT g.h AS chq_timestamp, g.et AS attr_event_type,
            g.n AS chq_rollup_count, round(g.sv, 4) AS sum_v,
            g.mn AS min_v, g.mx AS max_v,
            CAST(0 AS BIGINT) AS scale, g.zc AS zero_count,
            CAST(coalesce(g.ko, 0) AS BIGINT) AS pos_offset,
            coalesce(c.csv, '') AS counts_csv
     FROM g LEFT JOIN counts c ON c.h = g.h AND c.et = g.et"""
  }

  /** ingested expo histograms → DDSketch (gamma = base 2, exact bin map)
    * → quantile read; the oracle replays the gamma-2 rank walk — midpoint
    * 2·2^qi/3, zero bucket, [min,max] clamp — from the raw events.
    */
  private def expoQuantile(s: SparkSession, d: String): DataFrame = {
    import graft.sketch.{functions => gf}
    OtelProto.readExpoHistogramSketches(s, expoFixturePath(s, d))
      .select(col("chq_timestamp"), col("attr_event_type"),
        round(gf.ddsketch_quantile(col("chq_sketch"), 0.9), 6).as("p90"))
  }

  private val expoQuantileSql = {
    val ladder = (-7 to 17)
      .map(k => s"WHEN v <= ${math.pow(2.0, (k + 1).toDouble)} THEN $k")
      .mkString(" ")
    s"""WITH ev AS (
       SELECT epoch_ms(ts) - epoch_ms(ts) % 3600000 AS h,
              event_type AS et, "value" AS v,
              "value" < 0.0078125 AS isz,
              CASE $ladder END AS k
       FROM events WHERE event_id % 4 = 1),
     stats AS (
       SELECT h, et, CAST(count(*) AS BIGINT) AS n,
              CAST(count(*) FILTER (WHERE isz) AS BIGINT) AS zc,
              min(v) AS mn, max(v) AS mx
       FROM ev GROUP BY 1, 2),
     idx AS (
       SELECT h, et, k + 1 AS i, CAST(count(*) AS BIGINT) AS c
       FROM ev WHERE NOT isz GROUP BY 1, 2, 3),
     cum AS (
       SELECT h, et, i, sum(c) OVER (PARTITION BY h, et ORDER BY i) AS cum
       FROM idx),
     sel AS (
       SELECT c.h, c.et, min(c.i) AS qi
       FROM cum c JOIN stats s ON s.h = c.h AND s.et = c.et
       WHERE s.zc + c.cum >= CAST(floor(0.9 * (s.n - 1)) AS BIGINT) + 1
       GROUP BY 1, 2)
     SELECT s.h AS chq_timestamp, s.et AS attr_event_type,
            round(CASE WHEN s.zc >= CAST(floor(0.9 * (s.n - 1)) AS BIGINT) + 1
                       THEN 0.0
                       ELSE least(greatest(2 * pow(2, sel.qi) / 3.0, s.mn),
                                  s.mx) END, 6) AS p90
     FROM stats s LEFT JOIN sel ON sel.h = s.h AND sel.et = s.et"""
  }

  /** OTel TracesData round-trip: cooked spans (first 2 days) → encoded
    * ResourceSpans grouped by service → .binpb.gz → wire decoder →
    * aggregate; ids (hex bytes), kind/status enums, ns→ms duration and
    * trace grouping must all survive.
    */
  private def binpbSpans(s: SparkSession, d: String): DataFrame = {
    import OtelProto.Encode
    val twoDays = SpanStart + 2L * 86400000L
    val rows = graft.model.Cooked.spans(s, d)
      .filter(col("chq_timestamp") >= SpanStart && col("chq_timestamp") < twoDays)
      .select("span_trace_id", "span_id", "span_parent_span_id", "span_name",
        "span_kind", "span_status_code", "chq_timestamp", "span_end_timestamp",
        "resource_service_name", "attr_event_type")
      .collect()
    val groups = rows.groupBy(_.getString(8)).toSeq.sortBy(_._1).map { case (svc, rs) =>
      (Seq("service.name" -> svc), "graft-test",
        rs.toSeq.map { r =>
          val kind = if (r.getString(4) == "SPAN_KIND_SERVER") 2 else 3
          val code = if (r.getString(5) == "STATUS_CODE_ERROR") 2 else 1
          Encode.span(r.getString(0), r.getString(1), r.getString(2),
            r.getString(3), kind, r.getLong(6) * 1000000L, r.getLong(7) * 1000000L,
            code, if (code == 2) "boom" else "",
            Seq("event.type" -> r.getString(9)))
        })
    }
    OtelProto.readSpans(s, gzWrite("graft_binpb_t_", "traces.binpb.gz",
      Encode.tracesData(groups)))
      .groupBy(col("resource_service_name"), col("span_name"), col("span_kind"),
        col("span_status_code"))
      .agg(count(lit(1)).as("n"), sum(col("span_duration")).as("dur_sum"),
        countDistinct(col("span_trace_id")).as("n_traces"),
        min(col("chq_timestamp")).as("min_ts"))
  }

  private val binpbSpansSql =
    s"""WITH ${graft.model.Cooked.spansCte}
     SELECT resource_service_name, span_name, span_kind, span_status_code,
            CAST(count(*) AS BIGINT) AS n,
            CAST(sum(span_duration) AS BIGINT) AS dur_sum,
            CAST(count(DISTINCT span_trace_id) AS BIGINT) AS n_traces,
            min(chq_timestamp) AS min_ts
     FROM spans
     WHERE chq_timestamp >= $SpanStart AND chq_timestamp < ${SpanStart + 2L * 86400000L}
     GROUP BY 1, 2, 3, 4"""

  // ---- spans (LogQL-over-spans, reference spans_worker_sql.go) ------------

  private def slowErrorSpans(s: SparkSession, d: String): DataFrame = {
    import graft.logql.{Compiler, LogStore, Parser => LParser}
    val q = LParser.parse(
      """{span_status_code="STATUS_CODE_ERROR"} | span_duration > 1000 """)
      .fold(e => throw new IllegalArgumentException(e), identity)
    Compiler.rawQuery(q.raw.get, LogStore(graft.model.Cooked.spans(s, d)),
      SpanStart, SpanEnd, limit = 10000000, fields = Seq(
        "chq_timestamp", "span_trace_id", "span_id", "span_name", "span_duration"))
  }

  private val slowErrorSpansSql =
    s"""WITH ${graft.model.Cooked.spansCte}
     SELECT chq_timestamp, span_trace_id, span_id, span_name, span_duration
     FROM spans
     WHERE span_status_code = 'STATUS_CODE_ERROR' AND span_duration > 1000
       AND chq_timestamp >= $SpanStart AND chq_timestamp < $SpanEnd"""

  /** RED-style duration distribution per service: exact p50/p95/p99 over
    * span_duration (integer ms → Spark percentile and DuckDB quantile_cont
    * interpolate identically, the pq_quantile_agg precedent) + span count.
    * At scale the exact percentile is one shuffle on the service key; the
    * sketch path (DDSketchAgg) is the streaming-friendly alternative
    * already covered by the pq_sketch rows.
    */
  private def spanDurationQuantiles(s: SparkSession, d: String): DataFrame =
    graft.model.Cooked.spans(s, d)
      .filter(col("chq_timestamp") >= SpanStart && col("chq_timestamp") < SpanEnd)
      .groupBy(col("resource_service_name"))
      .agg(
        expr("percentile(span_duration, 0.5)").as("p50"),
        expr("percentile(span_duration, 0.95)").as("p95"),
        expr("percentile(span_duration, 0.99)").as("p99"),
        count(lit(1)).as("n_spans"))

  private val spanDurationQuantilesSql =
    s"""WITH ${graft.model.Cooked.spansCte}
     SELECT resource_service_name,
            quantile_cont(span_duration, 0.5) AS p50,
            quantile_cont(span_duration, 0.95) AS p95,
            quantile_cont(span_duration, 0.99) AS p99,
            count(*) AS n_spans
     FROM spans
     WHERE chq_timestamp >= $SpanStart AND chq_timestamp < $SpanEnd
     GROUP BY 1"""

  private def spanRateBySvc(s: SparkSession, d: String): DataFrame = {
    import graft.logql.{Compiler, LogStore}
    import graft.promql.QueryParams
    Compiler.query(
      """sum by (resource_service_name) (count_over_time({span_kind="SPAN_KIND_CLIENT"}[4h]))""",
      LogStore(graft.model.Cooked.spans(s, d)),
      QueryParams(SpanStart, SpanEnd, 3600000L))
      .filter(!isnan(col("value")))
  }

  private val spanRateBySvcSql =
    s"""WITH ${graft.model.Cooked.spansCte},
     stepl AS (
       SELECT chq_timestamp - chq_timestamp % 3600000 AS ts, resource_service_name,
              CAST(count(*) AS DOUBLE) AS bsum
       FROM spans
       WHERE span_kind = 'SPAN_KIND_CLIENT'
         AND chq_timestamp >= ${SpanStart - 14400000L} AND chq_timestamp < $SpanEnd
       GROUP BY 1, 2),
     win AS (
       SELECT ts, resource_service_name, sum(bsum) OVER w AS wsum,
              min(ts) OVER w AS first_ts
       FROM stepl
       WINDOW w AS (PARTITION BY resource_service_name ORDER BY ts
                    RANGE BETWEEN 10800000 PRECEDING AND CURRENT ROW))
     SELECT ts, resource_service_name, wsum AS value
     FROM win
     WHERE first_ts = ts - 10800000 AND ts >= $SpanStart AND ts < $SpanEnd"""

  /** span parent→child self-join: per parent span, how many children and
    * whether the children's summed duration stays inside the parent's —
    * the structural traces query segment stores must answer
    */
  /** Service dependency graph (the Grafana/Tempo service-graph analog):
    * one edge per (client service → server service) parent-child span
    * pair, with call counts, error counts, and duration totals. All-
    * integer aggregates → bit-deterministic. At scale this is ONE
    * shuffle-join on span id (AQE handles skew); streaming graph
    * processors window the same join by time.
    */
  private def serviceGraph(s: SparkSession, d: String): DataFrame = {
    val sp = graft.model.Cooked.spans(s, d)
    val parents = sp.select(col("span_id").as("p_id"),
      col("resource_service_name").as("client"))
    val children = sp.filter(col("span_parent_span_id") =!= "")
      .select(col("span_parent_span_id").as("p_id"),
        col("resource_service_name").as("server"),
        col("span_duration").as("c_dur"), col("span_status_code").as("c_status"))
    parents.join(children, Seq("p_id"))
      .groupBy(col("client"), col("server"))
      .agg(count(lit(1)).as("calls"),
        sum(when(col("c_status") === "STATUS_CODE_ERROR", 1L).otherwise(0L))
          .as("error_calls"),
        sum(col("c_dur")).as("total_dur_ms"),
        max(col("c_dur")).as("max_dur_ms"))
  }

  private val serviceGraphSql =
    s"""WITH ${graft.model.Cooked.spansCte}
     SELECT p.resource_service_name AS client,
            c.resource_service_name AS server,
            CAST(count(*) AS BIGINT) AS calls,
            CAST(sum(CASE WHEN c.span_status_code = 'STATUS_CODE_ERROR'
                          THEN 1 ELSE 0 END) AS BIGINT) AS error_calls,
            CAST(sum(c.span_duration) AS BIGINT) AS total_dur_ms,
            CAST(max(c.span_duration) AS BIGINT) AS max_dur_ms
     FROM spans p
     JOIN spans c ON c.span_parent_span_id = p.span_id
     GROUP BY 1, 2"""

  private def spanChildren(s: SparkSession, d: String): DataFrame = {
    val sp = graft.model.Cooked.spans(s, d)
    val parents = sp.select(col("span_id").as("p_id"),
      col("span_name").as("parent_name"), col("span_duration").as("p_dur"))
    val children = sp.filter(col("span_parent_span_id") =!= "")
      .select(col("span_parent_span_id").as("p_id"),
        col("span_duration").as("c_dur"))
    parents.join(children, Seq("p_id"))
      .groupBy(col("parent_name"))
      .agg(count(lit(1)).as("n_children"),
        sum(col("c_dur")).as("child_dur_sum"),
        sum(when(col("c_dur") > col("p_dur"), 1).otherwise(0))
          .as("n_child_longer"))
  }

  private val spanChildrenSql =
    s"""WITH ${graft.model.Cooked.spansCte}
     SELECT p.span_name AS parent_name,
            CAST(count(*) AS BIGINT) AS n_children,
            CAST(sum(c.span_duration) AS BIGINT) AS child_dur_sum,
            CAST(sum(CASE WHEN c.span_duration > p.span_duration
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_child_longer
     FROM spans p
     JOIN spans c ON c.span_parent_span_id = p.span_id
     GROUP BY 1"""

  private def traceSummary(s: SparkSession, d: String): DataFrame =
    graft.model.Cooked.spans(s, d)
      .groupBy(col("span_trace_id"))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("span_parent_span_id") === "", 1).otherwise(0)).as("n_roots"),
        sum(col("span_duration")).as("total_duration"),
        sum(when(col("span_status_code") === "STATUS_CODE_ERROR", 1).otherwise(0))
          .as("n_errors"),
        min(col("chq_timestamp")).as("start_ts"))

  private val traceSummarySql =
    s"""WITH ${graft.model.Cooked.spansCte}
     SELECT span_trace_id, CAST(count(*) AS BIGINT) AS n_spans,
            CAST(sum(CASE WHEN span_parent_span_id = '' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_roots,
            CAST(sum(span_duration) AS BIGINT) AS total_duration,
            CAST(sum(CASE WHEN span_status_code = 'STATUS_CODE_ERROR'
              THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
            min(chq_timestamp) AS start_ts
     FROM spans GROUP BY 1"""

  // ---- tag discovery -------------------------------------------------------

  private def tagValues(s: SparkSession, d: String): DataFrame =
    graft.api.Discovery.tagValues(graft.model.Cooked.logs(s, d),
      "attr_event_type", SpanStart, SpanEnd)

  private val tagValuesSql =
    s"""WITH ${graft.model.Cooked.logsCte}
     SELECT attr_event_type AS tag_value, count(*) AS n
     FROM logs
     WHERE chq_timestamp >= $SpanStart AND chq_timestamp < $SpanEnd
       AND attr_event_type IS NOT NULL AND attr_event_type <> ''
     GROUP BY 1"""

  private def tagNames(s: SparkSession, d: String): DataFrame = {
    val logs = graft.model.Cooked.logs(s, d)
    graft.api.Discovery.tagNames(logs,
      Seq("log_level", "resource_service_name", "attr_event_type"),
      SpanStart, SpanEnd)
  }

  /** discovery over the spans signal (reference /api/v1/spans/tagvalues) */
  private def spanTagValues(s: SparkSession, d: String): DataFrame =
    graft.api.Discovery.tagValues(graft.model.Cooked.spans(s, d),
      "span_name", SpanStart, SpanEnd)

  private val spanTagValuesSql =
    s"""WITH ${graft.model.Cooked.spansCte}
     SELECT span_name AS tag_value, count(*) AS n
     FROM spans
     WHERE chq_timestamp >= $SpanStart AND chq_timestamp < $SpanEnd
       AND span_name IS NOT NULL AND span_name <> ''
     GROUP BY 1"""

  /** span tag NAMES — completes the names/values/series triple for the
    * traces signal (reference /api/v1/spans/tags, queryapi/querier.go:768-770)
    */
  private def spanTagNames(s: SparkSession, d: String): DataFrame =
    graft.api.Discovery.tagNames(graft.model.Cooked.spans(s, d),
      Seq("span_name", "span_kind", "span_status_code", "resource_service_name",
        "span_parent_span_id"),
      SpanStart, SpanEnd)

  private val spanTagNamesSql =
    s"""WITH ${graft.model.Cooked.spansCte},
     t AS (SELECT * FROM spans
           WHERE chq_timestamp >= $SpanStart AND chq_timestamp < $SpanEnd)
     SELECT tag, CAST(n AS BIGINT) AS n FROM (
       SELECT 'span_name' AS tag, count(*) AS n FROM t
         WHERE span_name IS NOT NULL AND span_name <> ''
       UNION ALL
       SELECT 'span_kind', count(*) FROM t
         WHERE span_kind IS NOT NULL AND span_kind <> ''
       UNION ALL
       SELECT 'span_status_code', count(*) FROM t
         WHERE span_status_code IS NOT NULL AND span_status_code <> ''
       UNION ALL
       SELECT 'resource_service_name', count(*) FROM t
         WHERE resource_service_name IS NOT NULL AND resource_service_name <> ''
       UNION ALL
       SELECT 'span_parent_span_id', count(*) FROM t
         WHERE span_parent_span_id IS NOT NULL AND span_parent_span_id <> '') u
     WHERE n > 0"""

  /** span SERIES (label combinations with counts), selector-scoped to
    * server spans — the traces analog of the Loki series route
    * (reference /api/v1/spans/series)
    */
  private def spanSeries(s: SparkSession, d: String): DataFrame = {
    import graft.promql.{MatchOp, Matcher}
    graft.api.Discovery.series(graft.model.Cooked.spans(s, d),
      Seq("resource_service_name", "span_name", "span_status_code"),
      SpanStart, SpanEnd,
      matchers = List(Matcher("span_kind", MatchOp.Eq, "SPAN_KIND_SERVER")))
  }

  private val spanSeriesSql =
    s"""WITH ${graft.model.Cooked.spansCte}
     SELECT resource_service_name, span_name, span_status_code, count(*) AS n
     FROM spans
     WHERE chq_timestamp >= $SpanStart AND chq_timestamp < $SpanEnd
       AND span_kind = 'SPAN_KIND_SERVER'
     GROUP BY 1, 2, 3"""

  /** distinct service names (reference /api/v1/services,
    * queryapi/querier.go:716-724)
    */
  private def services(s: SparkSession, d: String): DataFrame =
    graft.api.Discovery.services(graft.model.Cooked.logs(s, d), SpanStart, SpanEnd)

  private val servicesSql =
    s"""WITH ${graft.model.Cooked.logsCte}
     SELECT DISTINCT resource_service_name AS service_name
     FROM logs
     WHERE chq_timestamp >= $SpanStart AND chq_timestamp < $SpanEnd
       AND resource_service_name IS NOT NULL AND resource_service_name <> ''"""

  /** discovery over the metrics signal (reference /api/v1/metrics/tags) */
  private def metricTagNames(s: SparkSession, d: String): DataFrame =
    graft.api.Discovery.tagNames(graft.model.Cooked.metrics(s, d),
      Seq("metric_name", "chq_metric_type", "attr_event_type"),
      SpanStart, SpanEnd)

  private val metricTagNamesSql =
    s"""WITH ${graft.model.Cooked.metricsCte},
     t AS (SELECT 'events_value' AS metric_name, 'gauge' AS chq_metric_type,
                  attr_event_type
           FROM cooked
           WHERE chq_timestamp >= $SpanStart AND chq_timestamp < $SpanEnd)
     SELECT tag, CAST(n AS BIGINT) AS n FROM (
       SELECT 'metric_name' AS tag, count(*) AS n FROM t
         WHERE metric_name IS NOT NULL AND metric_name <> ''
       UNION ALL
       SELECT 'chq_metric_type', count(*) FROM t
         WHERE chq_metric_type IS NOT NULL AND chq_metric_type <> ''
       UNION ALL
       SELECT 'attr_event_type', count(*) FROM t
         WHERE attr_event_type IS NOT NULL AND attr_event_type <> '') u
     WHERE n > 0"""

  /** Loki-compatible series listing with selector scoping (reference
    * /api/v1/logs/series, logs_series_handler.go:89-92)
    */
  private def logSeries(s: SparkSession, d: String): DataFrame = {
    import graft.promql.{MatchOp, Matcher}
    graft.api.Discovery.series(graft.model.Cooked.logs(s, d),
      Seq("resource_service_name", "log_level"), SpanStart, SpanEnd,
      matchers = List(Matcher("log_level", MatchOp.Ne, "DEBUG")))
  }

  private val logSeriesSql =
    s"""WITH ${graft.model.Cooked.logsCte}
     SELECT resource_service_name, log_level, count(*) AS n
     FROM logs
     WHERE chq_timestamp >= $SpanStart AND chq_timestamp < $SpanEnd
       AND log_level <> 'DEBUG'
     GROUP BY 1, 2"""

  /** metric names + types + datapoint counts (reference
    * /api/v1/metrics/metadata, promql_tags_handler.go:75)
    */
  private def metricMetadata(s: SparkSession, d: String): DataFrame =
    graft.api.Discovery.metricMetadata(graft.model.Cooked.metrics(s, d),
      SpanStart, SpanEnd)

  private val metricMetadataSql =
    s"""WITH ${graft.model.Cooked.metricsCte}
     SELECT 'events_value' AS metric_name, 'gauge' AS chq_metric_type,
            count(*) AS n
     FROM cooked
     WHERE chq_timestamp >= $SpanStart AND chq_timestamp < $SpanEnd"""

  private val tagNamesSql =
    s"""WITH ${graft.model.Cooked.logsCte},
     t AS (SELECT * FROM logs
           WHERE chq_timestamp >= $SpanStart AND chq_timestamp < $SpanEnd)
     SELECT 'log_level' AS tag, count(log_level) AS n FROM t WHERE log_level <> ''
     UNION ALL
     SELECT 'resource_service_name', count(resource_service_name) FROM t
       WHERE resource_service_name <> ''
     UNION ALL
     SELECT 'attr_event_type', count(attr_event_type) FROM t
       WHERE attr_event_type <> ''"""

  /** OTel exemplar round-trip (the reference's ingest readers process
    * exemplars alongside datapoints, internal/filereader/
    * ingest_proto_traces.go:86): gauge datapoints each carrying one
    * exemplar (trace/span ids derived from the event id, user id as a
    * filtered_attribute) and per-(hour, event_type) histogram datapoints
    * carrying the exemplar of the group's SMALLEST event id (unique key →
    * deterministic pick both sides) → encoded → wire decoder →
    * [[OtelProto.readExemplars]] rows; the oracle replays both
    * derivations straight from `events`, including the hex id
    * formatting, the filtered-attribute flattening (attr_user_id), and
    * the exemplar's own measurement timestamps.
    */
  private def binpbExemplars(s: SparkSession, d: String): DataFrame = {
    import OtelProto.Encode
    val rows = raw(s, d).filter(col("event_id") % 11 === 3)
      .select(col("event_id"), col("ts_ms"), col("event_type"), col("value"),
        col("user_id"))
      .collect() // fixture encoding is driver-side by design (test harness)
    def tid(id: Long) = f"$id%032x"
    def sid(id: Long) = f"$id%016x"
    val gaugeDps = rows.toSeq.map { r =>
      val (id, ts, et, v) =
        (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3))
      Encode.numberDp(ts * 1000000L, v, Seq("event.type" -> et),
        exemplars = Seq(Encode.exemplar(ts * 1000000L, v, tid(id), sid(id),
          Seq("user.id" -> r.getLong(4).toString))))
    }
    val histDps = rows.toSeq
      .groupBy(r => (r.getLong(1) - r.getLong(1) % 3600000L, r.getString(2)))
      .toSeq.sortBy(_._1).map { case ((h, et), rs) =>
        val vs = rs.map(_.getDouble(3))
        val pick = rs.minBy(_.getLong(0))
        Encode.histogramDp(h * 1000000L, vs.length.toLong, vs.sum,
          vs.min, vs.max, Seq(vs.length.toLong), Nil,
          Seq("event.type" -> et),
          exemplars = Seq(Encode.exemplar(pick.getLong(1) * 1000000L,
            pick.getDouble(3), tid(pick.getLong(0)), sid(pick.getLong(0)),
            Seq("user.id" -> pick.getLong(4).toString))))
      }
    val blob = Encode.metricsData(Seq("service.name" -> "fixture-svc"),
      "graft-test",
      Seq(Encode.gaugeMetric("ex_gauge", gaugeDps),
        Encode.histogramMetric("ex_hist", histDps)))
    OtelProto.readExemplars(s,
      gzWrite("graft_binpb_x_", "exemplars.binpb.gz", blob))
      .groupBy(col("metric_name"), col("chq_metric_type"),
        col("attr_event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("exemplar_value")), 4).as("sum_v"),
        countDistinct(col("exemplar_trace_id")).as("n_traces"),
        countDistinct(col("attr_user_id")).as("n_users"),
        min(col("exemplar_trace_id")).as("min_trace"),
        max(col("exemplar_span_id")).as("max_span"),
        min(col("chq_timestamp")).as("min_ts"),
        max(col("chq_timestamp")).as("max_ts"))
  }

  private val binpbExemplarsSql =
    """WITH src AS (
       SELECT event_id, epoch_ms(ts) AS tms, event_type, "value", user_id
       FROM events WHERE event_id % 11 = 3),
     g AS (
       SELECT 'ex_gauge' AS metric_name, 'gauge' AS chq_metric_type,
              event_type AS attr_event_type,
              CAST(count(*) AS BIGINT) AS n,
              round(sum("value"), 4) AS sum_v,
              CAST(count(DISTINCT event_id) AS BIGINT) AS n_traces,
              CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
              printf('%032x', min(event_id)) AS min_trace,
              printf('%016x', max(event_id)) AS max_span,
              min(tms) AS min_ts, max(tms) AS max_ts
       FROM src GROUP BY 3),
     h0 AS (
       SELECT tms - tms % 3600000 AS hh, event_type,
              arg_min("value", event_id) AS ex_v,
              arg_min(tms, event_id) AS ex_ts,
              arg_min(user_id, event_id) AS ex_u,
              min(event_id) AS ex_id
       FROM src GROUP BY 1, 2),
     h AS (
       SELECT 'ex_hist' AS metric_name, 'histogram' AS chq_metric_type,
              event_type AS attr_event_type,
              CAST(count(*) AS BIGINT) AS n,
              round(sum(ex_v), 4) AS sum_v,
              CAST(count(DISTINCT ex_id) AS BIGINT) AS n_traces,
              CAST(count(DISTINCT ex_u) AS BIGINT) AS n_users,
              printf('%032x', min(ex_id)) AS min_trace,
              printf('%016x', max(ex_id)) AS max_span,
              min(ex_ts) AS min_ts, max(ex_ts) AS max_ts
       FROM h0 GROUP BY 3)
     SELECT * FROM g UNION ALL SELECT * FROM h"""

  /** as-of join ([[graft.ops.AsofJoin]]): every probe event (event_id %
    * 7 == 0) picks up the most recent sample event at-or-before its
    * timestamp on the same user_id%10 series, within a 1 h tolerance —
    * the exemplar→nearest-sample / log→active-deploy join shape. The
    * oracle is DuckDB's NATIVE ASOF LEFT JOIN over the identically
    * tie-collapsed sample side — a fully independent implementation of
    * the same semantics, not a replay of the union+window plan.
    */
  private def asofJoinQ(s: SparkSession, d: String): DataFrame = {
    val ev = raw(s, d)
    val samples = ev.filter(col("event_id") % 7 =!= 0)
      .withColumn("k", col("user_id") % 10)
    val probes = ev.filter(col("event_id") % 7 === 0)
      .withColumn("k", col("user_id") % 10)
      .select("event_id", "k", "ts_ms")
    graft.ops.AsofJoin.backward(probes, samples, "k", "ts_ms", "ts_ms",
      payloadCols = Seq("value"), tieBreak = "event_id",
      toleranceMs = 3600000L)
  }

  private val asofJoinSql =
    """WITH r0 AS (
         SELECT user_id % 10 AS k, epoch_ms(ts) AS ts_ms, value, event_id
         FROM events WHERE event_id % 7 <> 0),
       r AS (
         SELECT k, ts_ms, value FROM (
           SELECT k, ts_ms, value,
                  row_number() OVER (PARTITION BY k, ts_ms
                                     ORDER BY event_id DESC) AS rn
           FROM r0) WHERE rn = 1),
       l AS (
         SELECT event_id, user_id % 10 AS k, epoch_ms(ts) AS ts_ms
         FROM events WHERE event_id % 7 = 0)
       SELECT l.event_id, l.k, l.ts_ms,
              CASE WHEN l.ts_ms - r.ts_ms <= 3600000
                   THEN r.ts_ms END AS asof_ts,
              CASE WHEN l.ts_ms - r.ts_ms <= 3600000
                   THEN r.value END AS asof_value
       FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.ts_ms >= r.ts_ms"""

  /** the skew-resistant bucketed form of [[asofJoinQ]] — identical
    * semantics through the (key, time-bucket) partitioned windows, so
    * it shares the backward oracle verbatim; 10-min buckets. */
  private def asofBucketedQ(s: SparkSession, d: String): DataFrame = {
    val ev = raw(s, d)
    val samples = ev.filter(col("event_id") % 7 =!= 0)
      .withColumn("k", col("user_id") % 10)
    val probes = ev.filter(col("event_id") % 7 === 0)
      .withColumn("k", col("user_id") % 10)
      .select("event_id", "k", "ts_ms")
    graft.ops.AsofJoin.backwardBucketed(probes, samples, "k", "ts_ms",
      "ts_ms", payloadCols = Seq("value"), tieBreak = "event_id",
      bucketMs = 600000L, toleranceMs = 3600000L)
  }

  /** forward leg of [[asofJoinQ]]: the NEXT sample at-or-after each
    * probe (DuckDB replays with the <= ASOF comparator) */
  private def asofForwardQ(s: SparkSession, d: String): DataFrame = {
    val ev = raw(s, d)
    val samples = ev.filter(col("event_id") % 7 =!= 0)
      .withColumn("k", col("user_id") % 10)
    val probes = ev.filter(col("event_id") % 7 === 0)
      .withColumn("k", col("user_id") % 10)
      .select("event_id", "k", "ts_ms")
    graft.ops.AsofJoin.forward(probes, samples, "k", "ts_ms", "ts_ms",
      payloadCols = Seq("value"), tieBreak = "event_id",
      toleranceMs = 3600000L)
  }

  private val asofForwardSql =
    """WITH r0 AS (
         SELECT user_id % 10 AS k, epoch_ms(ts) AS ts_ms, value, event_id
         FROM events WHERE event_id % 7 <> 0),
       r AS (
         SELECT k, ts_ms, value FROM (
           SELECT k, ts_ms, value,
                  row_number() OVER (PARTITION BY k, ts_ms
                                     ORDER BY event_id DESC) AS rn
           FROM r0) WHERE rn = 1),
       l AS (
         SELECT event_id, user_id % 10 AS k, epoch_ms(ts) AS ts_ms
         FROM events WHERE event_id % 7 = 0)
       SELECT l.event_id, l.k, l.ts_ms,
              CASE WHEN r.ts_ms - l.ts_ms <= 3600000
                   THEN r.ts_ms END AS asof_ts,
              CASE WHEN r.ts_ms - l.ts_ms <= 3600000
                   THEN r.value END AS asof_value
       FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.ts_ms <= r.ts_ms"""

  /** range join ([[graft.ops.RangeJoin]]): every interval event
    * (event_id % 7 == 0, open for 1-40 min) collects the points that
    * fall inside it on the same user_id%10 series — bucketized
    * equi-join (10-min buckets, fanout <= 5 per interval), never a
    * nested loop. The oracle runs the containment as a plain
    * inequality join, independent of the bucket trick.
    */
  private def rangeJoinQ(s: SparkSession, d: String): DataFrame = {
    val ev = raw(s, d).withColumn("k", col("user_id") % 10)
    val intervals = ev.filter(col("event_id") % 7 === 0)
      .select(col("k"), col("ts_ms").as("iv_s"),
        (col("ts_ms") + (col("event_id") % 40 + 1) * 60000L).as("iv_e"),
        col("event_id").as("id"))
    val points = ev.filter(col("event_id") % 7 =!= 0)
      .select(col("event_id"), col("k"), col("ts_ms"))
    graft.ops.RangeJoin.pointInInterval(points, intervals, "k", "ts_ms",
        "iv_s", "iv_e", payloadCols = Seq("id"), bucketMs = 600000L)
      .groupBy(col("iv_id"))
      .agg(count(lit(1)).as("n_points"),
        min(col("ts_ms")).as("first_ts"), max(col("ts_ms")).as("last_ts"))
  }

  private val rangeJoinSql =
    """WITH e AS (
         SELECT event_id, user_id % 10 AS k, epoch_ms(ts) AS ts_ms
         FROM events),
       iv AS (
         SELECT k, ts_ms AS s,
                ts_ms + (event_id % 40 + 1) * 60000 AS e,
                event_id AS iv_id
         FROM e WHERE event_id % 7 = 0),
       p AS (SELECT event_id, k, ts_ms FROM e WHERE event_id % 7 <> 0)
       SELECT iv.iv_id, CAST(count(*) AS BIGINT) AS n_points,
              min(p.ts_ms) AS first_ts, max(p.ts_ms) AS last_ts
       FROM p JOIN iv ON p.k = iv.k AND p.ts_ms >= iv.s AND p.ts_ms < iv.e
       GROUP BY 1"""

  // ---- reference-bit-compatible hashes (opt-in compat mode) ---------------

  /** DuckDB splice: UTF-8 byte list of a VARCHAR expression (via hex
    * nibbles — DuckDB has no direct blob→byte-list accessor). */
  private def duckBytes(expr: String): String =
    s"""list_transform(range(1, octet_length(encode($expr)) + 1),
        i -> (strpos('0123456789abcdef', substr(lower(hex(encode($expr))), 2*i-1, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(lower(hex(encode($expr))), 2*i, 1)) - 1))"""

  /** DuckDB splice: unsigned-2^64 HUGEINT → the signed BIGINT Spark emits */
  private def duckSigned(h: String): String =
    s"""CASE WHEN $h >= 9223372036854775808::HUGEINT
         THEN ($h - 18446744073709551616::HUGEINT)::BIGINT
         ELSE ($h)::BIGINT END"""

  /** reference TID bit-compat ([[graft.ops.CompatHash.tid]], FNV-1a 64
    * over the sorted `k=v|` label serialization, tid.go:70-118): one TID
    * per synthetic (metric, user-bucket) series off `events`, with an
    * empty-valued label proving the skip-empty rule. The oracle
    * re-derives FNV-1a INDEPENDENTLY in DuckDB — HUGEINT mod-2^64
    * list_reduce over the payload's UTF-8 bytes (xor touches only the
    * low byte, so it is exact on the unsigned representation).
    */
  private def tidCompat(s: SparkSession, d: String): DataFrame = {
    val series = raw(s, d).select(
      concat(lit("evt_"), col("event_type")).as("metric_name"),
      (col("user_id") % 10).cast("string").as("attr_user_bucket"),
      when(col("event_type") === "click", lit(""))
        .otherwise(col("event_type")).as("opt")).distinct()
    series.select(col("metric_name"), col("attr_user_bucket"),
      graft.ops.CompatHash.tid(col("metric_name"), lit("gauge"),
        Seq("attr_user_bucket" -> col("attr_user_bucket"),
          "attr_opt" -> col("opt"))).as("tid"))
  }

  private def tidCompatSql: String = {
    val fold =
      s"""list_reduce(list_prepend(14695981039346656037::HUGEINT, ${duckBytes("payload")}),
          (h, b) -> ((h - h % 256 + xor((h % 256)::BIGINT, b::BIGINT)::HUGEINT)
                     * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT)"""
    s"""WITH series AS (
         SELECT DISTINCT 'evt_' || event_type AS metric_name,
                CAST(user_id % 10 AS VARCHAR) AS attr_user_bucket,
                CASE WHEN event_type = 'click' THEN '' ELSE event_type END AS opt
         FROM events),
       p AS (
         SELECT metric_name, attr_user_bucket,
                (CASE WHEN opt <> '' THEN 'attr_opt=' || opt || '|' ELSE '' END)
                || 'attr_user_bucket=' || attr_user_bucket
                || '|chq_metric_type=gauge|metric_name=' || metric_name || '|' AS payload
         FROM series),
       h AS (SELECT metric_name, attr_user_bucket, $fold AS hv FROM p)
       SELECT metric_name, attr_user_bucket, ${duckSigned("hv")} AS tid FROM h"""
  }

  /** reference index-fingerprint bit-compat
    * ([[graft.ops.CompatHash.fingerprint]], fingerprint.go:119-161):
    * exists + exact + rune-trigram fingerprints for synthetic service
    * names under the IndexTrigramExact policy, hashed with the
    * reference's 31-polynomial 64-bit string hash. The oracle re-derives
    * the trigram set with DuckDB substr (code-point slicing, same as Go
    * rune slicing) and the hash with a mod-2^64 list_reduce.
    */
  private def fpCompat(s: SparkSession, d: String): DataFrame = {
    val vals = raw(s, d)
      .select(concat(lit("svc-"), col("event_type")).as("value")).distinct()
    vals.select(col("value"),
        explode(array_union(
          array(lit(".*"), col("value")),
          graft.ops.CompatHash.trigrams(col("value")))).as("token"))
      .select(col("value"), col("token"),
        graft.ops.CompatHash.fingerprint(
          lit("resource_service_name"), col("token")).as("fp"))
  }

  private def fpCompatSql: String = {
    val fold =
      s"""list_reduce(list_prepend(0::HUGEINT, ${duckBytes("'resource_service_name:' || token")}),
          (h, b) -> (31 * h + b::HUGEINT) % 18446744073709551616::HUGEINT)"""
    s"""WITH vals AS (SELECT DISTINCT 'svc-' || event_type AS value FROM events),
       toks AS (
         SELECT DISTINCT value, token FROM (
           SELECT value, '.*' AS token FROM vals
           UNION ALL SELECT value, value AS token FROM vals
           UNION ALL
           SELECT v.value, u.t AS token
           FROM vals v, UNNEST(list_distinct(CASE WHEN length(v.value) >= 3
             THEN list_transform(range(1, length(v.value) - 1),
                                 i -> substr(v.value, i::INT, 3))
             ELSE [] END)) AS u(t))),
       h AS (SELECT value, token, $fold AS hv FROM toks)
       SELECT value, token, ${duckSigned("hv")} AS fp FROM h"""
  }

  // ---- DuckDB XXH64 (seed 0), generated CTE chain ------------------------
  // Independent re-derivation of the reference's fingerprint hash. The
  // default covers payloads UNDER 32 BYTES (8-byte rounds, 4-byte mix,
  // tail bytes, avalanche); passing maxBytes >= 32 additionally unrolls
  // the 32-byte STRIPE path (v1..v4 accumulator rounds + merge), each
  // stripe guarded by the payload length, so template-length payloads
  // (the trie-cluster value pins, ~70 bytes) re-derive bit-exactly too.
  // All arithmetic is HUGEINT mod-2^64; 64x64 multiplication splits into
  // 32-bit halves so no intermediate exceeds 2^96; xor routes through
  // signed BIGINT. Linear size: every sub-expression is staged as its
  // own CTE column.
  private[graft] object DuckXxh64 {
    private val U64 = "18446744073709551616::HUGEINT"
    private val U32 = "4294967296::HUGEINT"
    private val P1 = "11400714785074694791::HUGEINT"
    private val P2 = "14029467366897019727::HUGEINT"
    private val P3 = "1609587929392839161::HUGEINT"
    private val P4 = "9650029242287828579::HUGEINT"
    private val P5 = "2870177450012600261::HUGEINT"

    private def m64(a: String, b: String): String =
      s"((($a) % $U32) * ($b) + (((($a) // $U32) * ($b)) % $U32) * $U32) % $U64"
    private def rotl(x: String, r: Int): String =
      s"((($x) * ${BigInt(2).pow(r)}::HUGEINT) % $U64 + (($x) // ${BigInt(2).pow(64 - r)}::HUGEINT))"
    private def sgn(a: String): String =
      s"(CASE WHEN ($a) >= 9223372036854775808::HUGEINT THEN (($a) - $U64)::BIGINT ELSE ($a)::BIGINT END)"
    private def xor64(a: String, b: String): String =
      s"(CASE WHEN xor(${sgn(a)}, ${sgn(b)}) < 0 THEN xor(${sgn(a)}, ${sgn(b)})::HUGEINT + $U64 " +
        s"ELSE xor(${sgn(a)}, ${sgn(b)})::HUGEINT END)"

    /** WITH-chain computing xxh64 of `xsrc.payload` (octet length <=
      * maxBytes; lengths < 32 need no stripes — the default). Caller
      * supplies the leading `xsrc AS (...)` CTE; the final select
      * exposes every xsrc column plus signed `fp`.
      */
    def query(srcCte: String, outCols: String, maxBytes: Int = 31): String = {
      val bytesExpr =
        s"""list_transform(range(1, octet_length(encode(payload)) + 1),
            i -> (strpos('0123456789abcdef', substr(lower(hex(encode(payload))), 2*i-1, 1)) - 1) * 16
               + (strpos('0123456789abcdef', substr(lower(hex(encode(payload))), 2*i, 1)) - 1))"""
      val ctes = scala.collection.mutable.ArrayBuffer[String](
        srcCte,
        s"xb AS (SELECT *, $bytesExpr AS x_bs, octet_length(encode(payload)) AS x_n FROM xsrc)")
      var prev = "xb"
      var step = 0
      def add(expr: String, colname: String): Unit = {
        step += 1; val nm = s"x$step"
        ctes += s"$nm AS (SELECT *, $expr AS x_$colname FROM $prev)"
        prev = nm
      }
      def replace(colname: String, expr: String): Unit = {
        step += 1; val nm = s"x$step"
        ctes += s"$nm AS (SELECT * REPLACE ($expr AS x_$colname) FROM $prev)"
        prev = nm
      }
      def replaceH(expr: String): Unit = replace("h", expr)
      def le(off: String, width: Int): String =
        (0 until width).map(j =>
          s"coalesce(x_bs[($off) + ${j + 1}], 0)::HUGEINT * ${BigInt(256).pow(j)}::HUGEINT")
          .mkString("(", " + ", ")")
      val maxStripes = maxBytes / 32
      if (maxStripes > 0) {
        // stripe accumulators: v1 = seed+P1+P2, v2 = seed+P2, v3 = seed,
        // v4 = seed-P1 (seed 0, all mod 2^64)
        add(s"(($P1 + $P2) % $U64)", "v1")
        add(s"($P2 % $U64)", "v2")
        add("0::HUGEINT", "v3")
        add(s"(($U64 - $P1) % $U64)", "v4")
        for (s <- 0 until maxStripes; i <- 0 until 4) {
          // vi = round(vi, lane) = rotl(vi + lane*P2, 31) * P1, guarded by
          // "this stripe is fully inside the payload"
          val lane = s"s${s}l$i"
          add(le((32 * s + 8 * i).toString, 8), lane)
          add(m64(s"x_$lane", P2), s"s${s}a$i")
          add(s"(x_v${i + 1} + x_s${s}a$i) % $U64", s"s${s}b$i")
          add(rotl(s"x_s${s}b$i", 31), s"s${s}c$i")
          replace(s"v${i + 1}",
            s"CASE WHEN x_n >= ${32 * (s + 1)} THEN ${m64(s"x_s${s}c$i", P1)} " +
              s"ELSE x_v${i + 1} END")
        }
        // converge: h = rotl(v1,1)+rotl(v2,7)+rotl(v3,12)+rotl(v4,18),
        // then one merge round per accumulator
        add(s"(${rotl("x_v1", 1)} + ${rotl("x_v2", 7)} + ${rotl("x_v3", 12)} + " +
          s"${rotl("x_v4", 18)}) % $U64", "hm")
        for (i <- 0 until 4) {
          add(m64(s"x_v${i + 1}", P2), s"g${i}a")
          add(rotl(s"x_g${i}a", 31), s"g${i}b")
          add(m64(s"x_g${i}b", P1), s"g${i}c")
          add(xor64("x_hm", s"x_g${i}c"), s"g${i}d")
          replace("hm", s"(${m64(s"x_g${i}d", P1)} + $P4) % $U64")
        }
        add(s"CASE WHEN x_n >= 32 THEN (x_hm + x_n::HUGEINT) % $U64 " +
          s"ELSE ($P5 + x_n::HUGEINT) % $U64 END", "h")
      } else {
        add(s"($P5 + x_n::HUGEINT) % $U64", "h")
      }
      // tail: up to three 8-byte rounds over the post-stripe remainder —
      // offsets generalize to 32*(n//32)+8k (identical to 8k when n < 32)
      for (k <- 0 until 3) {
        val o = s"(32 * (x_n // 32) + ${8 * k})"
        add(le(o, 8), s"w$k")
        add(m64(s"x_w$k", P2), s"t${k}a")
        add(rotl(s"x_t${k}a", 31), s"t${k}b")
        add(m64(s"x_t${k}b", P1), s"t${k}c")
        add(xor64("x_h", s"x_t${k}c"), s"t${k}d")
        add(rotl(s"x_t${k}d", 27), s"t${k}e")
        replaceH(s"CASE WHEN x_n >= ($o) + 8 THEN (${m64(s"x_t${k}e", P1)} + $P4) % $U64 ELSE x_h END")
      }
      val o4 = "(8 * (x_n // 8))"
      add(le(o4, 4), "w4")
      add(m64("x_w4", P1), "t4a")
      add(xor64("x_h", "x_t4a"), "t4b")
      add(rotl("x_t4b", 23), "t4c")
      replaceH(s"CASE WHEN x_n % 8 >= 4 THEN (${m64("x_t4c", P2)} + $P3) % $U64 ELSE x_h END")
      val tb0 = "(8 * (x_n // 8) + CASE WHEN x_n % 8 >= 4 THEN 4 ELSE 0 END)"
      for (j <- 0 until 3) {
        add(s"coalesce(x_bs[$tb0 + ${j + 1}], 0)::HUGEINT", s"b$j")
        add(m64(s"x_b$j", P5), s"u${j}a")
        add(xor64("x_h", s"x_u${j}a"), s"u${j}b")
        add(rotl(s"x_u${j}b", 11), s"u${j}c")
        replaceH(s"CASE WHEN x_n > $tb0 + $j THEN ${m64(s"x_u${j}c", P1)} ELSE x_h END")
      }
      add(xor64("x_h", "x_h // 8589934592::HUGEINT"), "va")
      replaceH(m64("x_va", P2))
      add(xor64("x_h", "x_h // 536870912::HUGEINT"), "vb")
      replaceH(m64("x_vb", P3))
      replaceH(xor64("x_h", "x_h // 4294967296::HUGEINT"))
      "WITH " + ctes.mkString(",\n") + s"\nSELECT $outCols, ${sgn("x_h")} AS fp FROM $prev"
    }
  }

  /** reference span-fingerprint bit-compat
    * ([[graft.ops.CompatHash.spanFingerprint]], oteltools
    * fingerprinter/spans.go:51-133): synthetic spans off `events`
    * exercise all four branches — messaging, db (with absent attrs
    * participating as EMPTY join parts), http, and the plain-name
    * fallback — plus the ""→"unknown" resource default. The oracle
    * rebuilds the `##` payload AND re-derives XXH64 INDEPENDENTLY in
    * DuckDB (generated HUGEINT mod-2^64 CTE chain; payloads are kept
    * under 32 bytes so the short-input path fully covers them — the
    * stripe path is pinned by the published JSON fingerprints in
    * FingerprintCompatSpec).
    */
  private def spanFpCompat(s: SparkSession, d: String): DataFrame = {
    val ev = raw(s, d).filter(col("event_id") % 9 === 0)
    val cluster = when(col("event_type") === "error", lit(""))
      .otherwise(concat(lit("c"), pmod(col("user_id"), lit(3))))
    val ns = concat(lit("n"), pmod(col("user_id"), lit(4)))
    val svc = concat(lit("s"), pmod(col("user_id"), lit(5)))
    val kind = when(col("event_id") % 2 === 0, lit("S")).otherwise(lit("C"))
    val name = concat(lit("o"), pmod(col("event_id"), lit(8)))
    val isMsg = col("event_type") === "click"
    val isDb = col("event_type") === "purchase"
    val isHttp = col("event_type") === "view"
    ev.select(col("event_id"),
      graft.ops.CompatHash.spanFingerprint(
        cluster, ns, svc, kind, name,
        messagingSystem = when(isMsg, lit("mq")).otherwise(lit("")),
        messagingOperationType = when(isMsg && col("user_id") % 2 === 0,
          lit("p")).otherwise(when(isMsg, lit("c")).otherwise(lit(""))),
        messagingDestinationName = when(isMsg,
          concat(lit("t"), pmod(col("user_id"), lit(7)))).otherwise(lit("")),
        dbSystem = when(isDb, lit("pg")).otherwise(lit("")),
        httpRequestMethod = when(isHttp && col("user_id") % 2 === 0,
          lit("GET")).otherwise(when(isHttp, lit("POST")).otherwise(lit(""))),
        urlTemplate = when(isHttp,
          concat(lit("/u"), pmod(col("user_id"), lit(5)))).otherwise(lit(""))
      ).as("span_fp"))
  }

  private def spanFpCompatSql: String = {
    val base = """'c' || (user_id % 3) || '##n' || (user_id % 4) || '##s' || (user_id % 5)
      || CASE WHEN event_id % 2 = 0 THEN '##S' ELSE '##C' END"""
    val baseUnknown = """'unknown' || '##n' || (user_id % 4) || '##s' || (user_id % 5)
      || CASE WHEN event_id % 2 = 0 THEN '##S' ELSE '##C' END"""
    val payload = s"""CASE
        WHEN event_type = 'click' THEN ($base) || '##mq##'
          || CASE WHEN user_id % 2 = 0 THEN 'p' ELSE 'c' END
          || '##t' || (user_id % 7)
        WHEN event_type = 'purchase' THEN ($base) || '##o' || (event_id % 8)
          || '##pg' || '########'
        WHEN event_type = 'view' THEN ($base) || '##'
          || CASE WHEN user_id % 2 = 0 THEN 'GET' ELSE 'POST' END
          || '##/u' || (user_id % 5)
        WHEN event_type = 'error' THEN ($baseUnknown) || '##o' || (event_id % 8)
        ELSE ($base) || '##o' || (event_id % 8)
      END"""
    DuckXxh64.query(
      s"""xsrc AS (SELECT event_id, $payload AS payload
          FROM events WHERE event_id % 9 = 0)""",
      "event_id").replace("AS fp FROM", "AS span_fp FROM")
  }

  /** reference JSON-body fingerprint, BIT-EXACT at the driver gate
    * (fingerprinter.go:195-206: xxh64 of items joined ':' + ':key' per
    * sorted deep key): JSON log lines per event; the oracle re-derives
    * the token items (trivially — the msg template is fixed, with the
    * loglevel-capture case for event_type='error'), the sorted key list,
    * AND the XXH64 itself through the generated DuckDB chain.
    */
  private def fpcJsonFp(s: SparkSession, d: String): DataFrame = {
    val ev = raw(s, d).filter(col("event_id") % 5 === 0)
    val line = concat(lit("""{"msg": "user """), col("event_type"),
      lit(""" ok", "uid": """), col("user_id"), lit(""", "plan": "basic"}"""))
    ev.select(col("event_id"),
      graft.ops.FingerprintCompat.tokens(line)
        .getField("json_fp").as("json_fp"))
  }

  private def fpcJsonFpSql: String =
    DuckXxh64.query(
      """xsrc AS (SELECT event_id,
           'user:' || CASE WHEN event_type = 'error' THEN '<Loglevel>'
                           ELSE event_type END || ':ok:msg:plan:uid' AS payload
         FROM events WHERE event_id % 5 = 0)""",
      "event_id").replace("AS fp FROM", "AS json_fp FROM")

  /** multi-tenant fingerprinting
    * ([[graft.ops.FingerprintCompat.fingerprintLinesByOrg]], reference
    * TenantManager, internal/fingerprint/tenant_manager.go): one trie
    * per org; both orgs run the same two templates per event type and
    * converge to one cluster per type WITHIN their own trie. Merge
    * isolation (the part a shared trie would get wrong) is pinned in
    * FingerprintCompatSpec; this row gates the surface end-to-end.
    */
  private def fpcByOrg(s: SparkSession, d: String): DataFrame = {
    val ev = raw(s, d).filter(col("event_id") % 17 === 0)
    val org = when(col("user_id") % 2 === 0, lit("acme")).otherwise(lit("globex"))
    // symmetric mid-sequence divergence (request/fetch): the two
    // templates merge into one cluster whichever is seen first — an
    // extension-suffix variant would be arrival-order-dependent
    val line = concat(lit("INFO "), col("event_type"),
      when(col("event_id") % 2 === 0, lit(" request user="))
        .otherwise(lit(" fetch user=")),
      col("user_id"),
      lit(" handled /api/v5/do?id="), col("event_id"),
      lit(" in "), pmod(col("event_id"), lit(800)), lit("ms"))
    val reg = new graft.ops.FingerprintCompat.TenantRegistry(0.5)
    graft.ops.FingerprintCompat.fingerprintLinesByOrg(
      ev.select(org.as("org"), col("event_type"), line.as("line")),
      col("line"), col("org"), reg)
      .groupBy(col("org"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("fpc_fingerprint")).as("n_fp"),
        min(col("fpc_fingerprint")).as("fp"))
  }

  /** Value-pinned like [[fpcClusterSql]], per tenant: each org's trie
    * converges every template onto the cluster minted by that ORG's
    * first-replayed template (count desc, then sequence asc within the
    * org — the global replay sort is (count desc, org asc, seq asc) and
    * replay routes to per-org tries, so the restriction to one org
    * preserves its relative order); a window rank re-derives each org's
    * winner and the XXH64 chain re-derives the id.
    */
  private def fpcByOrgSql: String =
    DuckXxh64.query(
      s"""xsrc AS (
         WITH fpc_counts AS (
           SELECT CASE WHEN user_id % 2 = 0 THEN 'acme' ELSE 'globex' END AS org,
                  event_type,
                  CASE WHEN event_id % 2 = 0 THEN 'request' ELSE 'fetch' END AS w,
                  count(*) AS c
           FROM events WHERE event_id % 17 = 0
           GROUP BY 1, 2, 3),
         fpc_rank AS (
           SELECT org, event_type AS wt, w AS ww,
                  row_number() OVER (PARTITION BY org
                    ORDER BY c DESC, event_type ASC, w ASC) AS rn
           FROM fpc_counts),
         fpc_winner AS (SELECT org, wt, ww FROM fpc_rank WHERE rn = 1)
         SELECT g.org, g.event_type, g.n, CAST(1 AS BIGINT) AS n_fp,
                '<Loglevel>:' || fw.wt || ':' || fw.ww ||
                  ':user:<Number>:<Path>:in:<Duration>' AS payload
         FROM (SELECT CASE WHEN user_id % 2 = 0 THEN 'acme' ELSE 'globex' END AS org,
                      event_type, count(*) AS n
               FROM events WHERE event_id % 17 = 0 GROUP BY 1, 2) g
         JOIN fpc_winner fw ON fw.org = g.org)""",
      "org, event_type, n, n_fp", maxBytes = 96)

  /** reference-parity log-template tokenizer
    * ([[graft.ops.FingerprintCompat]], behavior from the reference's
    * fingerprinter_test.go expectation table): templated event lines
    * cover ISO8601/Loglevel/word/Number/Path/IPv4/Identifier/Duration
    * classes plus the level capture; the oracle re-derives the exact
    * token string per line from the same raw columns.
    */
  private def fpcTokens(s: SparkSession, d: String): DataFrame = {
    val ev = raw(s, d).filter(col("event_id") % 7 === 0)
    val line = concat(
      lit("2024-03-01T10:15:30Z INFO user="), col("user_id"),
      lit(" "), col("event_type"),
      lit(" served /api/v2/items?page="), pmod(col("user_id"), lit(7)),
      lit(" from 10.0."), pmod(col("user_id"), lit(200)),
      lit("."), pmod(col("event_id"), lit(200)),
      lit(" req-"), col("event_id"),
      lit(" in "), pmod(col("event_id"), lit(500)), lit("ms"))
    ev.select(col("event_id"),
        graft.ops.FingerprintCompat.tokens(line).as("__t"))
      .select(col("event_id"),
        concat_ws(" ", col("__t.items")).as("tokens"),
        col("__t.level").as("level"))
  }

  private def fpcTokensSql: String =
    """SELECT event_id,
         '<ISO8601> <Loglevel> user <Number> ' || lower(event_type) ||
         ' served <Path> from <IPv4> <Identifier> in <Duration>' AS tokens,
         'info' AS level
       FROM events WHERE event_id % 7 = 0"""

  /** reference-parity trie clustering
    * ([[graft.ops.FingerprintCompat.fingerprintLines]], semantics from
    * trie_cluster_manager.go): per event type, TWO line templates
    * diverging at one mid-sequence word must converge onto ONE cluster
    * fingerprint via the trie's Jaccard match (the shared prefix walks
    * to the divergence node, the subtree scan finds the earlier cluster
    * above threshold). JSON-bodied signup lines bypass
    * the trie with the pure item+key hash. The oracle pins one
    * fingerprint per event type over the full corpus.
    */
  private def fpcCluster(s: SparkSession, d: String): DataFrame = {
    val ev = raw(s, d).filter(col("event_id") % 11 === 0)
    // symmetric mid-sequence divergence (request/fetch): the templates
    // merge whichever arrives first in the deterministic replay order —
    // a suffix-extension pair would be order-dependent (a prefix seen
    // AFTER its extension mints a fresh cluster; that asymmetry is
    // pinned in StreamingSpec, not leaned on here)
    val base = concat(
      lit("INFO "), col("event_type"),
      when(col("event_id") % 2 === 0, lit(" request user="))
        .otherwise(lit(" fetch user=")),
      col("user_id"),
      lit(" handled /api/v3/do?id="), col("event_id"),
      lit(" in "), pmod(col("event_id"), lit(900)), lit("ms"))
    val line = when(col("event_type") === "signup",
        concat(lit("""{"msg": "user signup ok", "uid": """), col("user_id"),
          lit(""", "plan": "basic"}""")))
      .otherwise(base)
    val out = graft.ops.FingerprintCompat.fingerprintLines(
      ev.select(col("event_id"), col("event_type"), line.as("line")),
      col("line"))
    out.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("fpc_fingerprint")).as("n_fp"),
        min(col("fpc_fingerprint")).as("fp"))
  }

  /** The oracle VALUE-PINS the cluster fingerprint (r14 VERDICT #2), not
    * just convergence: every non-JSON template shares the six invariant
    * items {<Loglevel>, user, <Number>, <Path>, in, <Duration>} out of
    * eight, so the divergence-subtree Jaccard (>= 6/10) merges ALL of
    * them into the cluster minted by the FIRST-REPLAYED template —
    * deterministically the (count desc, joined-sequence asc) argmax,
    * which the SQL re-derives as (count desc, event_type asc, word asc).
    * Its item payload then pushes through the DuckDB XXH64 chain (now
    * with the 32-byte stripe path — template payloads run ~60 bytes), so
    * a drift in replay order, trie semantics, tokenizer classes, OR the
    * hash itself turns this row red. JSON signup lines pin the pure
    * item+key hash the same way.
    */
  private def fpcClusterSql: String =
    DuckXxh64.query(
      s"""xsrc AS (
         WITH fpc_counts AS (
           SELECT event_type,
                  CASE WHEN event_id % 2 = 0 THEN 'request' ELSE 'fetch' END AS w,
                  count(*) AS c
           FROM events WHERE event_id % 11 = 0 AND event_type <> 'signup'
           GROUP BY 1, 2),
         fpc_winner AS (
           SELECT event_type AS wt, w AS ww FROM fpc_counts
           ORDER BY c DESC, event_type ASC, w ASC LIMIT 1)
         SELECT e.event_type, count(*) AS n, CAST(1 AS BIGINT) AS n_fp,
                CASE WHEN e.event_type = 'signup'
                     THEN 'user:signup:ok:msg:plan:uid'
                     ELSE (SELECT '<Loglevel>:' || wt || ':' || ww ||
                           ':user:<Number>:<Path>:in:<Duration>'
                           FROM fpc_winner)
                END AS payload
         FROM events e WHERE e.event_id % 11 = 0 GROUP BY 1)""",
      "event_type, n, n_fp", maxBytes = 96)

  /** reference-parity log fingerprints AT BINPB INGEST (r14 VERDICT #6,
    * mirror of the span wiring): the opt-in
    * [[graft.ingest.OtelProto.LogsFpcCompatKey]] routes wire-decoded
    * bodies through [[graft.ops.FingerprintCompat]] exactly where the
    * reference's ingest worker fingerprints each record
    * (logs_ingest_processor.go:793-803 assigns RowKeyCFingerprint before
    * the segment write), so `chq_fingerprint` lands on the cooked frame a
    * reference deployment would read. Fixture: an events subset encoded
    * as OTel LogsData — JSON signup bodies (pure item+key hash) plus two
    * mid-sequence-diverging non-JSON templates per remaining type — gzip
    * binpb, read back with the flag pinned per-read. The oracle
    * re-derives counts, the ns→ms timestamp, the decoded severity, trie
    * convergence AND the winning cluster id's XXH64 through the DuckDB
    * chain, straight from `events` ([[fpcClusterSql]]'s construction).
    */
  private def fpcIngestLogs(s: SparkSession, d: String): DataFrame = {
    import OtelProto.Encode
    val rows = raw(s, d).filter(col("event_id") % 21 === 0)
      .select(col("event_id"), col("ts_ms"), col("event_type"), col("user_id"))
      .collect() // fixture encoding is driver-side by design (test harness)
    val recs = rows.toSeq.map { r =>
      val (id, ts, et, uid) = (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))
      val body =
        if (et == "signup")
          s"""{"msg": "user signup ok", "uid": $uid, "plan": "pro"}"""
        else {
          val w = if (id % 2 == 0) "request" else "fetch"
          s"INFO $et $w user=$uid handled /api/v7/do?id=$id in ${id % 700}ms"
        }
      Encode.logRecord(ts * 1000000L, 9, "INFO", body, Seq("event.type" -> et))
    }
    val blob = Encode.logsData(
      Seq("service.name" -> "fixture-svc"), "graft-test", recs)
    OtelProto.readLogs(s,
        gzWrite("graft_binpb_fpc_", "logs.binpb.gz", blob),
        fpcCompat = Some(true))
      .groupBy(col("attr_event_type"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("chq_fingerprint")).as("n_fp"),
        min(col("chq_fingerprint")).as("fp"),
        min(col("chq_timestamp")).as("min_ts"),
        min(col("log_level")).as("lvl"))
  }

  private def fpcIngestLogsSql: String =
    DuckXxh64.query(
      s"""xsrc AS (
         WITH fpc_counts AS (
           SELECT event_type,
                  CASE WHEN event_id % 2 = 0 THEN 'request' ELSE 'fetch' END AS w,
                  count(*) AS c
           FROM events WHERE event_id % 21 = 0 AND event_type <> 'signup'
           GROUP BY 1, 2),
         fpc_winner AS (
           SELECT event_type AS wt, w AS ww FROM fpc_counts
           ORDER BY c DESC, event_type ASC, w ASC LIMIT 1)
         SELECT e.event_type AS attr_event_type, count(*) AS n,
                CAST(1 AS BIGINT) AS n_fp,
                min(epoch_ms(e.ts)) AS min_ts, 'INFO' AS lvl,
                CASE WHEN e.event_type = 'signup'
                     THEN 'user:signup:ok:msg:plan:uid'
                     ELSE (SELECT '<Loglevel>:' || wt || ':' || ww ||
                           ':user:<Number>:<Path>:in:<Duration>'
                           FROM fpc_winner)
                END AS payload
         FROM events e WHERE e.event_id % 21 = 0 GROUP BY 1)""",
      "attr_event_type, n, n_fp, min_ts, lvl", maxBytes = 96)

  override def all: Seq[Q] = Seq(
    Q("tq_tid_compat", tidCompat, Some(tidCompatSql)),
    Q("tq_fp_compat", fpCompat, Some(fpCompatSql)),
    Q("tq_fpc_tokens", fpcTokens, Some(fpcTokensSql)),
    Q("tq_fpc_cluster", fpcCluster, Some(fpcClusterSql)),
    Q("tq_fpc_ingest_logs", fpcIngestLogs, Some(fpcIngestLogsSql)),
    Q("tq_span_fp_compat", spanFpCompat, Some(spanFpCompatSql)),
    Q("tq_fpc_jsonfp", fpcJsonFp, Some(fpcJsonFpSql)),
    Q("tq_fpc_by_org", fpcByOrg, Some(fpcByOrgSql)),
    Q("tq_asof_join", asofJoinQ, Some(asofJoinSql)),
    Q("tq_asof_forward", asofForwardQ, Some(asofForwardSql)),
    Q("tq_asof_bucketed", asofBucketedQ, Some(asofJoinSql)),
    Q("tq_range_join", rangeJoinQ, Some(rangeJoinSql)),
    Q("tq_preagg_10s", preagg10, Some(preagg10Sql)),
    Q("tq_preagg_percentiles", preaggPercentiles, Some(preaggPercentilesSql)),
    Q("tq_proto_sketch_roundtrip", protoSketchRoundtrip,
      Some(protoSketchRoundtripSql)),
    Q("tq_sketch_compat", sketchCompat, Some(protoSketchRoundtripSql)),
    Q("tq_sketch_compat_write", sketchCompatWrite, Some(protoSketchRoundtripSql)),
    Q("tq_rollup_chain", rollupChain, Some(rollupChainSql)),
    Q("tq_segment_roundtrip", segmentRoundtrip, Some(segmentRoundtripSql)),
    Q("tq_log_roundtrip", logSegmentRoundtrip, Some(logSegmentRoundtripSql)),
    Q("tq_json_ingest", jsonIngest, Some(jsonIngestSql)),
    Q("tq_csv_ingest", csvIngest, Some(csvIngestSql)),
    Q("tq_csv_log_translate", csvLogTranslate, Some(csvLogTranslateSql)),
    Q("tq_log_fingerprint", logFingerprint, Some(logFingerprintSql)),
    Q("tq_log_fingerprint_trie", logFingerprintTrie, Some(logFingerprintTrieSql)),
    Q("tq_hll_cardinality", hllCardinality, Some(hllCardinalitySql)),
    Q("tq_heavy_hitters", heavyHitters, Some(heavyHittersSql)),
    Q("tq_hll_union", hllUnion, Some(hllUnionSql)),
    Q("tq_binpb_metrics", binpbMetrics, Some(binpbMetricsSql)),
    Q("tq_binpb_spans", binpbSpans, Some(binpbSpansSql)),
    Q("tq_binpb_histogram", binpbHistogram, Some(binpbHistogramSql)),
    Q("tq_hist_explicit_quantile", histExplicitQuantile, Some(histExplicitQuantileSql)),
    Q("tq_binpb_summary", binpbSummary, Some(binpbSummarySql)),
    Q("tq_binpb_expo", binpbExpoHistogram, Some(binpbExpoHistogramSql)),
    Q("tq_binpb_exemplars", binpbExemplars, Some(binpbExemplarsSql)),
    Q("tq_expo_quantile", expoQuantile, Some(expoQuantileSql)),
    Q("sq_slow_error_spans", slowErrorSpans, Some(slowErrorSpansSql)),
    Q("sq_span_rate_by_svc", spanRateBySvc, Some(spanRateBySvcSql)),
    Q("sq_trace_summary", traceSummary, Some(traceSummarySql)),
    Q("sq_span_children", spanChildren, Some(spanChildrenSql)),
    Q("sq_service_graph", serviceGraph, Some(serviceGraphSql)),
    Q("sq_span_duration_quantiles", spanDurationQuantiles,
      Some(spanDurationQuantilesSql)),
    Q("td_tag_values", tagValues, Some(tagValuesSql)),
    Q("td_tag_names", tagNames, Some(tagNamesSql)),
    Q("td_span_tag_values", spanTagValues, Some(spanTagValuesSql)),
    Q("td_span_tag_names", spanTagNames, Some(spanTagNamesSql)),
    Q("td_span_series", spanSeries, Some(spanSeriesSql)),
    Q("td_services", services, Some(servicesSql)),
    Q("td_metric_tag_names", metricTagNames, Some(metricTagNamesSql)),
    Q("td_log_series", logSeries, Some(logSeriesSql)),
    Q("td_metric_metadata", metricMetadata, Some(metricMetadataSql))
  )
}
