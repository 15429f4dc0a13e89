package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Kafka-SHAPED ingest source abstraction — the reference's entire ingest
  * trigger path is S3→Kafka→consumer (docs/design/OVERVIEW.md:38-55,
  * internal/metricsprocessing/common_consumer.go) with committed offsets in
  * a database table (lrdb/queries/kafka_offset_tracker.sql). No broker
  * exists in this harness, so the CONTRACT is modeled instead: a partitioned
  * record stream addressed by (topic, partition, offset), an offset tracker
  * with idempotent commits, and an at-least-once consume loop whose batch
  * handler is expected to be idempotent (the segment sink already is — a
  * replayed batch rewrites only its own directory). A production deployment
  * swaps [[FileReplaySource]] for a thin adapter over a real consumer (or
  * uses `spark.readStream.format("kafka")` directly with the same
  * foreachBatch sink); everything downstream is source-agnostic.
  */
final case class SourceRecord(topic: String, partition: Int, offset: Long,
    key: String, value: Array[Byte])

trait RecordSource {
  def topic: String
  def partitions: Seq[Int]

  /** records of `partition` with offset ∈ [from, from + max), offset-ordered */
  def poll(partition: Int, from: Long, max: Int): Seq[SourceRecord]

  /** next-offset-to-be-written per partition (Kafka endOffsets) */
  def endOffsets: Map[Int, Long]
}

/** Embedded fake: replays the LINES of text files under `dir` (sorted by
  * file name, then line number) as records — partition = stable hash of
  * the file name, offset = per-partition arrival sequence, key = file name.
  * Deterministic, so every consume run sees identical (partition, offset)
  * coordinates; that is what makes offset-resume parity testable without a
  * broker.
  */
final class FileReplaySource(dir: String, val topic: String,
    numPartitions: Int = 2) extends RecordSource {

  override val partitions: Seq[Int] = 0 until numPartitions

  // materialized once per source instance: the fake models a static topic
  // (a real adapter would poll the broker instead)
  private lazy val byPartition: Map[Int, Vector[SourceRecord]] = {
    val files = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
      .sortBy(_.getName)
    val counters = scala.collection.mutable.Map.empty[Int, Long].withDefaultValue(0L)
    val out = scala.collection.mutable.Map.empty[Int, Vector[SourceRecord]]
      .withDefaultValue(Vector.empty)
    files.foreach { f =>
      val p = math.floorMod(f.getName.hashCode, numPartitions)
      scala.io.Source.fromFile(f, "UTF-8").getLines().foreach { line =>
        val off = counters(p)
        counters(p) = off + 1
        out(p) = out(p) :+ SourceRecord(topic, p, off, f.getName,
          line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }
    out.toMap
  }

  override def poll(partition: Int, from: Long, max: Int): Seq[SourceRecord] =
    byPartition.getOrElse(partition, Vector.empty)
      .dropWhile(_.offset < from).take(max)

  override def endOffsets: Map[Int, Long] =
    partitions.map(p => p ->
      byPartition.get(p).flatMap(_.lastOption).map(_.offset + 1).getOrElse(0L)).toMap
}

/** Committed-offset store — the `kafka_offset_tracker` table analog: one
  * atomically-replaced JSON file per (topic, partition). Commits are
  * idempotent upserts; a crash between handler success and commit replays
  * the batch (at-least-once), which the idempotent sink absorbs.
  */
final class OffsetTracker(dir: String) {
  java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))

  private def path(topic: String, partition: Int) =
    java.nio.file.Paths.get(dir, s"$topic-$partition.json")

  def committed(topic: String, partition: Int): Long = {
    val p = path(topic, partition)
    if (!java.nio.file.Files.exists(p)) 0L
    else {
      val txt = java.nio.file.Files.readString(p)
      """"offset":(\d+)""".r.findFirstMatchIn(txt).map(_.group(1).toLong).getOrElse(0L)
    }
  }

  def commit(topic: String, partition: Int, offset: Long): Unit = {
    val p = path(topic, partition)
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    java.nio.file.Files.writeString(tmp,
      s"""{"topic":"$topic","partition":$partition,"offset":$offset}""")
    java.nio.file.Files.move(tmp, p,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    ()
  }
}

/** The consume loop of the reference's common_consumer: per partition,
  * poll from the committed offset, hand each batch to the (idempotent)
  * handler as a DataFrame, commit AFTER the handler returns. A handler
  * failure leaves the offset uncommitted, so the next run re-polls the
  * same batch — at-least-once delivery with exactly-once effects through
  * the idempotent sink.
  */
object RecordConsumer {
  def consumeAvailable(spark: SparkSession, source: RecordSource,
      tracker: OffsetTracker, batchSize: Int = 10000)(
      handler: DataFrame => Unit): Map[Int, Long] = {
    import spark.implicits._
    source.partitions.foreach { p =>
      var from = tracker.committed(source.topic, p)
      var recs = source.poll(p, from, batchSize)
      while (recs.nonEmpty) {
        handler(recs.toDF())
        from = recs.last.offset + 1
        tracker.commit(source.topic, p, from)
        recs = source.poll(p, from, batchSize)
      }
    }
    source.partitions.map(p => p -> tracker.committed(source.topic, p)).toMap
  }

  /** Full ingest spine over a record source — the Kafka-shaped twin of
    * [[StreamingIngest.segmentWriteStream]]'s foreachBatch contract:
    * per batch, `build` turns the raw (topic, partition, offset, key,
    * value) frame into cooked rows, which land under an idempotent
    * per-(partition, first-offset) directory; the offset commits only
    * AFTER the write. Batch boundaries are deterministic (poll from the
    * committed offset with a fixed batchSize), so a crash-replay rewrites
    * exactly its own directory — at-least-once delivery, exactly-once
    * segment state.
    */
  def consumeToSegments(spark: SparkSession, source: RecordSource,
      tracker: OffsetTracker, segDir: String,
      build: DataFrame => DataFrame,
      writeSegments: (DataFrame, String) => Unit =
        (df, dir) => graft.ingest.Segments.writeMetricSegments(df, dir),
      batchSize: Int = 10000): Map[Int, Long] =
    consumeAvailable(spark, source, tracker, batchSize) { df =>
      val id = df.select(
        org.apache.spark.sql.functions.min(col("partition")),
        org.apache.spark.sql.functions.min(col("offset"))).head()
      val batchDir = s"$segDir/ingest_batch=p${id.getInt(0)}_o${id.getLong(1)}"
      val p = new org.apache.hadoop.fs.Path(batchDir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(p, true) // replay rewrites its own dir only
      writeSegments(build(df), batchDir)
    }
}
