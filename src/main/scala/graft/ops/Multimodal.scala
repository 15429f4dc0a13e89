package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque BinaryType + typed metadata.
  *
  * The Spark-side contract is real and tested — schema, partition-friendly
  * batch shapes, deterministic feature derivation — while the actual codec
  * work (image decode, resample, frame extraction) is STUBBED behind
  * deterministic byte-level fakes: this container has no image/audio
  * libraries. Swap `fakeDecode*` for a real decoder (e.g. a Pandas UDF via
  * mapInPandas in PySpark, or a JNI codec) without touching the pipeline
  * shape.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType), // "image" | "audio" | "video"
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("sample_rate", IntegerType), StructField("n_frames", IntegerType),
      StructField("codec", StringType))))))

  /** documents → a synthetic media table: payload = utf-8 bytes of text.
    * Deterministic, so oracles can recompute byte lengths/digests.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("media_type"),
      col("text").cast("binary").as("payload"),
      struct(
        (col("n_chars") % 640 + 32).cast("int").as("width"),
        (col("n_chars") % 480 + 32).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (col("n_chars") % 300 + 1).cast("int").as("n_frames"),
        lit("fake/v1").as("codec")).as("meta"))

  /** STUB decode: deterministic 8-bucket byte histogram as the "features".
    * A real implementation decodes pixels/samples here; the aggregation
    * shape (one row per media, fixed-length feature vector) is the part
    * that matters for the pipeline.
    */
  def fakeDecodeFeatures(payload: Column): Column = {
    val bytesLen = octet_length(payload)
    array((0 until 8).map { b =>
      // deterministic per-bucket pseudo-count from the md5 of payload
      conv(substring(md5(payload), b * 4 + 1, 3), 16, 10).cast("double") / 4096.0
    }: _*)
  }

  /** frame sampling stub: every nth "frame" index up to n_frames */
  def sampleFrameIndexes(nFrames: Column, every: Int): Column =
    sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(every))

  /** feature extraction pass over a media table */
  def extractFeatures(media: DataFrame): DataFrame =
    media.select(
      col("media_id"), col("media_type"),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      md5(col("payload")).as("digest"),
      fakeDecodeFeatures(col("payload")).as("features"),
      sampleFrameIndexes(col("meta.n_frames"), 30).as("sampled_frames"))
}
