package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-STREAM interval enrichment — both sides are live streams (the
  * stream-static joins elsewhere in this package assume one side is a
  * fixed corpus): each probe event joins the sample events of its series
  * whose timestamp falls within [probe − lookbackMs, probe].
  *
  * Spark's watermarked stream-stream inner join does the heavy lifting:
  * both sides declare event-time watermarks and the join condition
  * carries explicit time bounds, so the state store retains each side
  * only until the watermark passes its possible match window — state
  * stays bounded by (rate × lookback + lateness), never by stream
  * length, which is the property that lets the same query run for
  * months. The join itself shuffles both streams on the series key —
  * the standard streaming repartition, no custom state code.
  */
object StreamJoin {

  /** Probes and samples must use DISJOINT column names (pre-rename on
    * the caller side); `probeKey`/`sampleKey` name the series key on
    * each side, `probeTs`/`sampleTs` the epoch-ms event times. Emits
    * one row per (probe, matching sample) pair — downstream aggregation
    * (latest sample, counts) composes on top.
    */
  def intervalJoin(probes: DataFrame, samples: DataFrame,
      probeKey: String, probeTs: String, sampleKey: String, sampleTs: String,
      lookbackMs: Long, watermark: String = "1 hour"): DataFrame = {
    val p = probes.withColumn("__pt", timestamp_millis(col(probeTs)))
      .withWatermark("__pt", watermark)
    val s = samples.withColumn("__st", timestamp_millis(col(sampleTs)))
      .withWatermark("__st", watermark)
    p.join(s,
      col(probeKey) === col(sampleKey) &&
        col("__st") >= col("__pt") - expr(s"INTERVAL $lookbackMs MILLISECONDS") &&
        col("__st") <= col("__pt"))
      .drop("__pt", "__st")
  }
}
