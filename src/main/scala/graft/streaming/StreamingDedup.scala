package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming exact deduplication for training-data pipelines: the batch
  * [[graft.ops.Dedup.exact]] contract (normalized-content fingerprint,
  * keep one doc per fingerprint) on an unbounded stream.
  *
  * `dropDuplicatesWithinWatermark` keeps state ONLY for the watermark
  * window — the property that makes this runnable forever: a full-history
  * `dropDuplicates` would grow state with every distinct document, while
  * the watermark bound matches how dup-heavy crawl streams actually
  * arrive (re-crawls and mirrors cluster in time). Docs whose duplicate
  * arrives outside the window are emitted again — downstream batch dedup
  * (the nightly [[graft.ops.Dedup]] pass) catches those, so the stream
  * stage is a high-recall prefilter with bounded memory, not the only
  * gate.
  *
  * Keep-first is ARRIVAL order (streaming has no global min-id order; the
  * batch pass imposes one when it matters).
  */
object StreamingDedup {

  /** the same normalization [[graft.ops.Dedup.exact]] fingerprints on */
  def contentFingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), " +", " "))

  /** raw doc stream → stream with exact dups (within the watermark window)
    * dropped. `tsCol` must be a TimestampType event-time column.
    */
  def dedupStream(stream: DataFrame, textCol: String, tsCol: String,
      watermark: String = "10 minutes"): DataFrame =
    stream
      .withColumn("__fp", contentFingerprint(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")
}
