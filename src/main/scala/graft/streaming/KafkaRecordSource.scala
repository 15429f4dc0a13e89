package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Offset-range JSON for the Spark Kafka connector's `startingOffsets` /
  * `endingOffsets` batch options — the partition/offset addressing the
  * reference keeps in its offset-tracker table
  * (/root/reference/lrdb/queries/kafka_offset_tracker.sql, consumed by
  * internal/metricsprocessing/common_consumer.go). Pure string building —
  * unit-testable with no broker and no connector on the classpath.
  *
  * Sentinels follow the connector's contract: -1 = latest, -2 = earliest.
  */
object KafkaOffsets {
  val Latest = -1L
  val Earliest = -2L

  /** `{"topic":{"0":123,"1":-1}}` — offsets per partition of one topic */
  def offsetsJson(topic: String, offsets: Map[Int, Long]): String = {
    val inner = offsets.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p":$o""" }.mkString(",")
    s"""{"${escape(topic)}":{$inner}}"""
  }

  /** `{"topic":[0,1,2]}` — the connector's `assign` option */
  def assignJson(topic: String, partitions: Seq[Int]): String =
    s"""{"${escape(topic)}":[${partitions.sorted.mkString(",")}]}"""

  private def escape(s: String): String =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString }
}

/** DORMANT thin adapter over the Spark Kafka connector, behind the same
  * [[RecordSource]] trait the crash-replay-proven consume loop runs on
  * ([[RecordConsumer]]). "Dormant" because this harness has no broker and
  * no `spark-sql-kafka` jar: everything here addresses the connector
  * through its STRING surface (`format("kafka")` + options), so the class
  * compiles and its mapping logic unit-tests with zero Kafka classes on
  * the classpath; at runtime it needs the standard connector package on
  * the session (`--packages org.apache.spark:spark-sql-kafka-0-10_2.13`).
  *
  * Mapping (mirrors the reference's consumer semantics,
  * common_consumer.go):
  *  - poll(partition, from, max) → one BATCH read with explicit
  *    `startingOffsets`/`endingOffsets` on a single assigned partition —
  *    deterministic, replayable coordinates, exactly what the idempotent
  *    segment sink needs for at-least-once delivery with exactly-once
  *    segment state.
  *  - endOffsets → kafka-clients AdminClient/Consumer is NOT on the
  *    classpath, so the log-end offsets come from the caller or from a
  *    bounded `endingOffsets=latest` probe read (documented cost: a scan
  *    of the unpolled tail; a production deployment passes `knownEnd` from
  *    its own consumer group metadata instead).
  *
  * Partition discovery likewise belongs to the deployment (Kafka admin
  * API); the constructor takes the partition list explicitly.
  */
final class KafkaRecordSource(spark: SparkSession, val topic: String,
    override val partitions: Seq[Int], bootstrapServers: String,
    knownEnd: Map[Int, Long] = Map.empty,
    extraOptions: Map[String, String] = Map.empty) extends RecordSource {

  private def reader =
    extraOptions.foldLeft(
      spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrapServers)) {
      case (r, (k, v)) => r.option(k, v)
    }

  override def poll(partition: Int, from: Long, max: Int): Seq[SourceRecord] = {
    val until = knownEnd.get(partition) match {
      case Some(end) => math.min(from + max, end)
      case None      => from + max
    }
    if (until <= from) return Seq.empty
    val df = reader
      .option("assign", KafkaOffsets.assignJson(topic, Seq(partition)))
      .option("startingOffsets", KafkaOffsets.offsetsJson(topic, Map(partition -> from)))
      .option("endingOffsets", KafkaOffsets.offsetsJson(topic, Map(partition -> until)))
      .load()
    KafkaRecordSource.toRecords(df)
  }

  override def endOffsets: Map[Int, Long] =
    if (knownEnd.nonEmpty) knownEnd
    else {
      // probe read: earliest→latest over the assigned partitions, keeping
      // only the per-partition max offset. This SCANS the topic — fine for
      // a bounded replay topic, wrong for an unbounded one; a deployment
      // passes knownEnd (its consumer-group metadata) instead.
      val df = reader
        .option("assign", KafkaOffsets.assignJson(topic, partitions))
        .option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
        .load()
      val got = df.groupBy(col("partition"))
        .agg(max(col("offset")).as("last"))
        .collect()
        .map(r => r.getInt(0) -> (r.getLong(1) + 1L)).toMap
      partitions.map(p => p -> got.getOrElse(p, 0L)).toMap
    }
}

object KafkaRecordSource {
  /** Map the connector's fixed output schema (key/value BINARY, topic
    * STRING, partition INT, offset LONG, ...) to [[SourceRecord]]s,
    * offset-ordered. Driver-side collect by design: [[RecordSource.poll]]
    * is the reference's bounded-batch consumer contract (max records per
    * poll), not a full-stream materialization.
    */
  def toRecords(df: DataFrame): Seq[SourceRecord] =
    df.select(col("topic"), col("partition"), col("offset"),
        col("key").cast("string"), col("value"))
      .collect()
      .map { r =>
        SourceRecord(r.getString(0), r.getInt(1), r.getLong(2),
          Option(r.getString(3)).getOrElse(""),
          r.getAs[Array[Byte]](4))
      }.toSeq.sortBy(_.offset)

  /** The Structured-Streaming twin: a `readStream` over the same topic,
    * projected to the (topic, partition, offset, key, value) record shape —
    * drop-in for [[StreamingIngest]]'s foreachBatch sinks when a real
    * broker exists. Dormant for the same classpath reason as the batch
    * adapter.
    */
  def readStream(spark: SparkSession, topic: String, bootstrapServers: String,
      startingOffsets: String = "earliest"): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()
      .select(col("topic"), col("partition"), col("offset"),
        col("key").cast("string").as("key"), col("value"))
}
