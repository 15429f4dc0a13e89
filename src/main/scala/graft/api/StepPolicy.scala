package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    spark.read.parquet(segmentDir)
      .filter(org.apache.spark.sql.functions.col("freq") === tierFor(stepMs))
}
