package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.promql.QueryParams

/** Query step policy + rollup-tier selection.
  *
  * Reference behavior (queryapi/dates.go:23-42): the query span picks the
  * step, and the step picks the rollup tier that is read
  * (`frequency_ms = step` in segment lookup,
  * queryapi/metrics_evaluator.go:505-509) — sub-second aggregations come
  * from reading the pre-aggregated tier, not from scanning raw data.
  *
  * In the Spark engine, tier selection is a plan-time choice of input path
  * (`freq=<ms>/` partition of the segment layout written by
  * [[graft.ingest.Segments.writeMetricSegments]]) — Catalyst partition
  * pruning does the rest.
  */
object StepPolicy {

  /** span → step: ≤65 min→10 s, ≤12 h→1 m, ≤24 h→5 m, ≤3 d→20 m, else 1 h */
  def stepMsFor(spanMs: Long): Long =
    if (spanMs <= 65L * 60000L) 10000L
    else if (spanMs <= 12L * 3600000L) 60000L
    else if (spanMs <= 24L * 3600000L) 300000L
    else if (spanMs <= 3L * 86400000L) 1200000L
    else 3600000L

  /** largest rollup tier that divides the step (tier read for a query) */
  def tierFor(stepMs: Long, tiers: Seq[Long] = graft.ingest.MetricsPreAgg.RollupChainMs): Long =
    tiers.filter(t => t <= stepMs && stepMs % t == 0).maxOption.getOrElse(tiers.min)

  /** derive full query params from a raw time range */
  def paramsFor(startMs: Long, endMs: Long): QueryParams = {
    val step = stepMsFor(endMs - startMs)
    QueryParams(startMs - startMs % step, endMs, step)
  }

  /** read the right tier partition of a segment directory for a step */
  def scanTier(spark: SparkSession, segmentDir: String, stepMs: Long): DataFrame =
    ScanCache.read(spark, segmentDir)
      .filter(org.apache.spark.sql.functions.col("freq") === tierFor(stepMs))

  /** UTC yyyyMMdd int of an epoch-ms timestamp (segment partition key) */
  def dateintOf(ms: Long): Int = {
    val d = java.time.Instant.ofEpochMilli(ms).atZone(java.time.ZoneOffset.UTC).toLocalDate
    d.getYear * 10000 + d.getMonthValue * 100 + d.getDayOfMonth
  }

  /** [[scanTier]] with dateint partition pruning: callers pass the
    * EFFECTIVE scan range — query range extended left by (range+offset)
    * lookback, exactly what the engine's leaf will read (the reference's
    * segment lookup does the same, queryapi/dates.go:23-42 +
    * lrdb/queries/metric_seg.sql:113-125). Both `freq` and `dateint` are
    * partition columns, so Catalyst prunes whole directories — on a
    * 100 TB store this is the difference between scanning one day's tier
    * and scanning everything.
    */
  def scanTier(spark: SparkSession, segmentDir: String, stepMs: Long,
      effStartMs: Long, effEndMs: Long): DataFrame = {
    import org.apache.spark.sql.functions.col
    ScanCache.read(spark, segmentDir)
      .filter(col("freq") === tierFor(stepMs) &&
        col("dateint") >= dateintOf(effStartMs) &&
        col("dateint") <= dateintOf(effEndMs - 1))
  }

  /** [[scanTier]] over a multi-tenant segment dir: the org key leads the
    * partition layout (reference: every segment lookup keys on
    * organization_id first, lrdb/queries/metric_seg.sql:113-125), so the
    * org equality prunes every other tenant's directories before
    * dateint/freq pruning starts — three-key partition pruning.
    */
  def scanTier(spark: SparkSession, segmentDir: String, stepMs: Long,
      effStartMs: Long, effEndMs: Long, org: String): DataFrame =
    scanTier(spark, segmentDir, stepMs, effStartMs, effEndMs)
      .filter(col("org") === org)
}
