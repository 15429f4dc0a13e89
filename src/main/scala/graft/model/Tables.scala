package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided synthetic tables (TESTDATA.md).
  *
  * All tables are single parquet files under `\$dir/<name>.parquet`.
  * `events.ts` is written as parquet TIMESTAMP(NANOS); we normalize to an
  * epoch-millisecond LongType column `ts_ms` so bucketing math matches the
  * reference's integer-ms semantics (reference keeps int64 ms columns, see
  * /root/reference/docs/design/db-parquet/metrics.md).
  */
object Tables {
  // Dimension tables are persisted once per session (they're joined by many
  // catalog queries). Fact tables are NOT cached: an InMemoryRelation loses
  // parquet filter pushdown and column pruning — at scale the scan-side
  // pruning is worth far more than re-reading a small file locally.
  private val dims = Set("region", "nation", "customer", "supplier", "part")
  private val cache = scala.collection.concurrent.TrieMap.empty[(String, String, String), DataFrame]

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (dims.contains(name))
      cache.getOrElseUpdate((spark.sparkContext.applicationId, dir, name),
        spark.read.parquet(s"$dir/$name.parquet").persist())
    else spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** events with an epoch-ms LongType `ts_ms` column added.
    *
    * The driver has written `events.ts` as parquet TIMESTAMP(NANOS) in some
    * rounds and TIMESTAMP_NTZ(µs) in others, so the loader is
    * schema-tolerant by type (the reference's reader factory is equally
    * tolerant by design — /root/reference/internal/filereader/
    * reader_factory.go:56-91 dispatches any input shape):
    *
    *  - Spark 4.x rejects parquet TIMESTAMP(NANOS) unless
    *    `spark.sql.legacy.parquet.nanosAsLong=true` is set (every graft
    *    session sets it — see [[graft.GraftSession]]), in which case `ts`
    *    arrives as LongType nanos. Integer `DIV` (not double division) —
    *    ns epochs (~1.7e18) exceed double's 2^53 exact-integer range.
    *  - TIMESTAMP_NTZ casts to TIMESTAMP interpreted in the session time
    *    zone, which graft pins to UTC ([[graft.GraftSession]]) — the cast
    *    is instant-preserving and matches DuckDB's `epoch_ms(ts)` on the
    *    same naive value (the oracle side).
    *  - Any new flavor fails loudly with a one-line message instead of
    *    161 downstream analysis errors.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = load(s, d, "events")
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val tsMs = df.schema("ts").dataType match {
      case LongType         => expr("ts DIV 1000000")
      case TimestampType    => unix_millis(col("ts"))
      case TimestampNTZType => unix_millis(col("ts").cast(TimestampType))
      case other => throw new IllegalArgumentException(
        s"events.ts has unsupported type $other - expected INT64 ns (nanosAsLong), TIMESTAMP, or TIMESTAMP_NTZ; " +
          "add an arm in graft.model.Tables.events")
    }
    df.withColumn("ts_ms", tsMs.cast("long"))
  }
}
