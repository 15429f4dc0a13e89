package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derivation of cooked telemetry tables (reference schema, FIXTURES.md §1-2)
  * from the driver's synthetic `events` table — deterministic, so the same
  * derivation is expressible in the DuckDB oracle SQL.
  *
  * Cooked metrics contract (docs/design/db-parquet/metrics.md in the
  * reference): one row per (metric, series, pre-agg bucket) carrying
  * chq_rollup_{sum,count,min,max} partial aggregates.
  */
object Cooked {
  /** pre-agg frequency for the derived metric tier (ms) */
  val FreqMs = 60000L

  /** events → cooked metrics at 60 s pre-agg; series label = event_type.
    * withSketch adds the `chq_sketch` DDSketch column (quantile paths).
    */
  def metrics(s: SparkSession, d: String, withSketch: Boolean = false): DataFrame = {
    import graft.sketch.{functions => gf}
    val aggs = Seq(
      sum(col("value")).as("chq_rollup_sum"),
      count(lit(1)).cast("double").as("chq_rollup_count"),
      min(col("value")).as("chq_rollup_min"),
      max(col("value")).as("chq_rollup_max")) ++
      (if (withSketch) Seq(gf.ddsketch_agg(col("value")).as("chq_sketch")) else Nil)
    Tables.events(s, d)
      .withColumn("chq_timestamp", col("ts_ms") - col("ts_ms") % lit(FreqMs))
      .withColumn("attr_event_type", col("event_type"))
      // Plain rollup aggregation — partial (map-side) aggregation stays
      // BELOW the exchange, so only per-scan-partition (minute, series)
      // partials cross it, never raw event rows (guide §2.3
      // aggregate-before-shuffle). The r18 form repartitioned the raw
      // events by attr_event_type here to give the whole PromQL spine one
      // shared exchange; that forfeited map-side partials and keyed a
      // raw-row shuffle on a low-cardinality label (r18 VERDICT #1 — a
      // skew+volume hazard at 100 TB even on this fixture-twin path). The
      // shared series exchange now lives in the ENGINE
      // (Engine.leafBucketed seriesShuffle), placed over the ROLLED
      // output and only on leaves a label-keyed window follows — ~1/60th
      // the rows cross it, and value-ignoring leaves (timestamp(), time
      // components, absent()) keep their RemoveRedundantAggregates
      // collapse to a single aggregation.
      .groupBy(col("chq_timestamp"), col("attr_event_type"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("metric_name", lit("events_value"))
      .withColumn("chq_metric_type", lit("gauge"))
  }

  /** The same derivation as DuckDB SQL (CTE body named `cooked`), producing
    * chq_timestamp/attr_event_type/rollup columns. Kept textually in sync
    * with [[metrics]].
    */
  val metricsCte: String =
    """cooked AS (
       SELECT epoch_ms(ts) - epoch_ms(ts) % 60000 AS chq_timestamp,
              event_type AS attr_event_type,
              sum("value") AS chq_rollup_sum,
              CAST(count(*) AS DOUBLE) AS chq_rollup_count,
              min("value") AS chq_rollup_min,
              max("value") AS chq_rollup_max
       FROM events GROUP BY 1, 2)"""

  /** events → cooked logs (reference docs/design/db-parquet/logs.md).
    * log_message is a deterministic logfmt-ish line so LogQL parser stages
    * have something real to extract; level derived from event_type.
    */
  def logs(s: SparkSession, d: String): DataFrame = logsBase(s, d, jsonLine = false)

  private def logsBase(s: SparkSession, d: String, jsonLine: Boolean): DataFrame =
    Tables.events(s, d)
      .withColumn("chq_timestamp", col("ts_ms"))
      .withColumn("chq_tsns", col("ts_ms") * lit(1000000L))
      .withColumn("log_level",
        when(col("event_type") === "error", "ERROR")
          .when(col("event_type") === "purchase", "INFO")
          .when(col("event_type") === "signup", "INFO")
          .otherwise("DEBUG"))
      .withColumn("log_message",
        if (jsonLine) col("props")
        else concat(lit("evt="), col("event_type"),
          lit(" user="), col("user_id").cast("string"),
          lit(" value="), format_string("%.2f", col("value")),
          lit(" props="), col("props")))
      .withColumn("resource_service_name",
        concat(lit("svc-"), (col("user_id") % 5).cast("string")))
      .withColumn("attr_event_type", col("event_type"))
      .withColumn("metric_name", lit("log_events"))
      // message-shape cluster id (literals → placeholders, template hashed)
      .withColumn("chq_fingerprint",
        graft.ingest.LogFingerprint.fingerprint(col("log_message")))
      // unique row id (role of the reference's base32 chq_id,
      // docs/design/db-parquet/logs.md:18-20; md5-derived for determinism)
      .withColumn("chq_id", substring(md5(col("event_id").cast("string")), 1, 20))
      .select("chq_timestamp", "chq_tsns", "chq_id", "chq_fingerprint",
        "metric_name", "log_level", "log_message", "resource_service_name",
        "attr_event_type")

  /** logs variant whose line IS the JSON props payload (for `| json`). */
  def logsJson(s: SparkSession, d: String): DataFrame = logsBase(s, d, jsonLine = true)

  /** logs variant whose line is Loki pack-format JSON (for `| unpack`):
    * `_entry` carries the original line, other keys are promoted labels.
    */
  def logsPacked(s: SparkSession, d: String): DataFrame =
    logs(s, d).withColumn("log_message",
      to_json(struct(
        col("log_message").as("_entry"),
        col("attr_event_type").as("evt"),
        col("resource_service_name").as("svc"))))

  val logsJsonCte: String =
    """logsj AS (
       SELECT epoch_ms(ts) AS chq_timestamp,
              epoch_ms(ts) * 1000000 AS chq_tsns,
              CASE WHEN event_type = 'error' THEN 'ERROR'
                   WHEN event_type IN ('purchase','signup') THEN 'INFO'
                   ELSE 'DEBUG' END AS log_level,
              props AS log_message,
              'svc-' || CAST(user_id % 5 AS VARCHAR) AS resource_service_name,
              event_type AS attr_event_type
       FROM events)"""

  /** events → cooked spans (reference docs/design/db-parquet/traces.md,
    * span base columns logql/spans_worker_sql.go:95-115). Deterministic:
    * trace groups events by (user_id, 10-minute window); span ids derive
    * from md5.
    */
  def spans(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val traceKey = concat_ws("|", expr("ts_ms DIV 600000"), col("user_id"))
    e.select(
      col("ts_ms").as("chq_timestamp"),
      (col("ts_ms") * 1000000L).as("chq_tsns"),
      md5(traceKey).as("span_trace_id"),
      substring(md5(col("event_id").cast("string")), 1, 16).as("span_id"),
      when(col("event_id") % 3 === 0, lit(""))
        .otherwise(substring(md5((col("event_id") - 1).cast("string")), 1, 16))
        .as("span_parent_span_id"),
      col("event_type").as("span_name"),
      when(col("event_type") === "error", "SPAN_KIND_SERVER")
        .otherwise("SPAN_KIND_CLIENT").as("span_kind"),
      when(col("event_type") === "error", "STATUS_CODE_ERROR")
        .otherwise("STATUS_CODE_OK").as("span_status_code"),
      floor(col("value") * 10).cast("long").as("span_duration"),
      (col("ts_ms") + floor(col("value") * 10).cast("long")).as("span_end_timestamp"),
      concat(lit("svc-"), (col("user_id") % 5).cast("string")).as("resource_service_name"),
      col("event_type").as("attr_event_type"))
  }

  val spansCte: String =
    """spans AS (
       SELECT epoch_ms(ts) AS chq_timestamp,
              epoch_ms(ts) * 1000000 AS chq_tsns,
              md5(CAST(epoch_ms(ts) // 600000 AS VARCHAR) || '|'
                  || CAST(user_id AS VARCHAR)) AS span_trace_id,
              substr(md5(CAST(event_id AS VARCHAR)), 1, 16) AS span_id,
              CASE WHEN event_id % 3 = 0 THEN ''
                   ELSE substr(md5(CAST(event_id - 1 AS VARCHAR)), 1, 16) END
                AS span_parent_span_id,
              event_type AS span_name,
              CASE WHEN event_type = 'error' THEN 'SPAN_KIND_SERVER'
                   ELSE 'SPAN_KIND_CLIENT' END AS span_kind,
              CASE WHEN event_type = 'error' THEN 'STATUS_CODE_ERROR'
                   ELSE 'STATUS_CODE_OK' END AS span_status_code,
              CAST(floor("value" * 10) AS BIGINT) AS span_duration,
              epoch_ms(ts) + CAST(floor("value" * 10) AS BIGINT) AS span_end_timestamp,
              'svc-' || CAST(user_id % 5 AS VARCHAR) AS resource_service_name,
              event_type AS attr_event_type
       FROM events)"""

  /** DuckDB equivalent of [[logs]] (CTE named `logs`). */
  val logsCte: String =
    """logs AS (
       SELECT epoch_ms(ts) AS chq_timestamp,
              epoch_ms(ts) * 1000000 AS chq_tsns,
              CASE WHEN event_type = 'error' THEN 'ERROR'
                   WHEN event_type IN ('purchase','signup') THEN 'INFO'
                   ELSE 'DEBUG' END AS log_level,
              'evt=' || event_type || ' user=' || CAST(user_id AS VARCHAR)
                || ' value=' || printf('%.2f', "value")
                || ' props=' || props AS log_message,
              'svc-' || CAST(user_id % 5 AS VARCHAR) AS resource_service_name,
              event_type AS attr_event_type
       FROM events)"""
}
