package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{KafkaOffsets, KafkaRecordSource, SourceRecord}

/** Unit coverage for the dormant Kafka adapter's partition/offset mapping —
  * everything testable with no broker: offset-range JSON, assign JSON, and
  * the connector-schema → SourceRecord row mapping (the connector's output
  * schema is a stable public contract, reproduced literally here).
  */
class KafkaSourceSpec extends AnyFunSuite {

  test("offsetsJson: explicit offsets, partition-sorted, sentinels intact") {
    assert(KafkaOffsets.offsetsJson("t", Map(1 -> 50L, 0 -> 123L)) ===
      """{"t":{"0":123,"1":50}}""")
    assert(KafkaOffsets.offsetsJson("t", Map(0 -> KafkaOffsets.Latest)) ===
      """{"t":{"0":-1}}""")
    assert(KafkaOffsets.offsetsJson("t", Map(2 -> KafkaOffsets.Earliest)) ===
      """{"t":{"2":-2}}""")
  }

  test("offsetsJson escapes quotes/backslashes in topic names") {
    assert(KafkaOffsets.offsetsJson("""a"b\c""", Map(0 -> 1L)) ===
      """{"a\"b\\c":{"0":1}}""")
  }

  test("assignJson lists partitions sorted") {
    assert(KafkaOffsets.assignJson("events", Seq(2, 0, 1)) ===
      """{"events":[0,1,2]}""")
  }

  test("toRecords maps the connector schema and orders by offset") {
    val spark = TestSpark.spark
    // the connector's documented batch/stream output schema
    val schema = StructType(Seq(
      StructField("key", BinaryType), StructField("value", BinaryType),
      StructField("topic", StringType), StructField("partition", IntegerType),
      StructField("offset", LongType), StructField("timestamp", TimestampType),
      StructField("timestampType", IntegerType)))
    val rows = Seq(
      Row("k1".getBytes, "v1".getBytes, "t", 0, 7L, null, null),
      Row(null, "v0".getBytes, "t", 0, 3L, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val recs = KafkaRecordSource.toRecords(df)
    assert(recs.map(_.offset) === Seq(3L, 7L))
    assert(recs.head.key === "") // null key → empty, matching FileReplaySource
    assert(new String(recs.head.value) === "v0")
    assert(recs(1) === SourceRecord("t", 0, 7L, "k1", "v1".getBytes).copy(
      value = recs(1).value)) // Array[Byte] equality is by reference
    assert(new String(recs(1).value) === "v1")
  }

  test("poll clamps the batch to knownEnd and short-circuits an empty range") {
    val spark = TestSpark.spark
    // knownEnd at/below `from` → empty WITHOUT touching the (absent)
    // connector: proves the dormant adapter's only broker-free path
    val src = new KafkaRecordSource(spark, "t", Seq(0), "broker:9092",
      knownEnd = Map(0 -> 10L))
    assert(src.poll(0, 10L, 100) === Seq.empty)
    assert(src.poll(0, 42L, 100) === Seq.empty)
    assert(src.endOffsets === Map(0 -> 10L))
  }
}
