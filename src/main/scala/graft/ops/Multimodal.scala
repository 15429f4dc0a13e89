package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque BinaryType + typed metadata.
  *
  * The Spark-side contract is real and tested — schema, partition-friendly
  * batch shapes, deterministic feature derivation. IMAGES decode for real:
  * the JDK ships `javax.imageio` (PNG/JPEG/BMP/GIF), so [[decodeImageStats]]
  * produces genuine per-pixel statistics with zero new dependencies, and
  * [[encodePng]] generates real fixtures in-cluster. Audio/video codec work
  * (resample, frame extraction) stays STUBBED behind deterministic
  * byte-level fakes — this container has no media libraries beyond the JDK;
  * swap `fakeDecode*` for a real decoder (e.g. a Pandas UDF via mapInPandas
  * in PySpark, or a JNI codec) without touching the pipeline shape.
  */
object Multimodal {

  /** decoded per-image statistics: dimensions + per-channel pixel means */
  final case class ImageStats(width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** REAL image decode (javax.imageio — pure JVM): width/height and exact
    * per-channel means over all pixels. Null for undecodable payloads
    * (decode failures are data, not errors — same __error__ philosophy as
    * the LogQL parse stages). A Scala UDF is the right tool here: the work
    * is a per-row imperative decode loop over a binary blob, not an
    * expression Catalyst could optimize through; the surrounding pipeline
    * (projection, partitioning) stays Column algebra.
    */
  val decodeImageStats: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((bytes: Array[Byte]) => {
      if (bytes == null) None
      else try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) None
        else {
          val w = img.getWidth; val h = img.getHeight
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          Some(ImageStats(w, h, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n))
        }
      } catch { case _: Exception => None }
    })

  /** REAL PNG encode (fixture generator): a width×height image whose top
    * half is `topRgb` and bottom half `botRgb` (packed 0xRRGGBB). PNG is
    * lossless, so decode→stats recovers the exact construction — which is
    * what lets a SQL oracle predict pixel means from the generating
    * parameters alone.
    */
  val encodePng: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((w: Int, h: Int, topRgb: Int, botRgb: Int) => {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        val c = if (y < h / 2) topRgb else botRgb
        var x = 0
        while (x < w) { img.setRGB(x, y, c); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    })

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
