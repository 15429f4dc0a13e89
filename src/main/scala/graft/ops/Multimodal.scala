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
  * [[encodePng]] generates real fixtures in-cluster. AUDIO decodes for real
  * too: `javax.sound.sampled` reads WAV/PCM ([[decodeAudioStats]], fixtures
  * from [[encodeWavSaw]]). VIDEO codec work (frame extraction) stays
  * STUBBED behind deterministic byte-level fakes — the JDK has no video
  * decoder; swap `fakeDecode*` for a real decoder (e.g. a Pandas UDF via
  * mapInPandas in PySpark, or a JNI codec) without touching the pipeline
  * shape.
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

  /** decoded per-clip audio statistics. `sum_sq` stays an EXACT Long so an
    * external oracle replays RMS/energy bit-for-bit from integers (the
    * decode loop's float order never enters the result).
    */
  final case class AudioStats(sample_rate: Int, channels: Int, bits: Int,
      n_samples: Long, sum_sq: Long, peak: Int)

  /** REAL audio decode (javax.sound.sampled — pure JVM, WAV/PCM): format
    * header + per-sample integer statistics over 16-bit PCM frames.
    * Mirrors [[decodeImageStats]]: null for undecodable payloads, Scala
    * UDF because the work is an imperative per-row loop over a blob.
    * Multi-channel clips aggregate over interleaved samples.
    */
  val decodeAudioStats: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((bytes: Array[Byte]) => {
      if (bytes == null) None
      else try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16) None
        else {
          val data = ais.readAllBytes()
          val n = data.length / 2
          var sumSq = 0L; var peak = 0; var i = 0
          while (i < n) {
            val v =
              if (fmt.isBigEndian) (data(2 * i) << 8) | (data(2 * i + 1) & 0xff)
              else (data(2 * i + 1) << 8) | (data(2 * i) & 0xff)
            sumSq += v.toLong * v
            val a = math.abs(v); if (a > peak) peak = a
            i += 1
          }
          Some(AudioStats(fmt.getSampleRate.toInt, fmt.getChannels,
            fmt.getSampleSizeInBits, n.toLong, sumSq, peak))
        }
      } catch { case _: Exception => None }
    })

  /** REAL WAV encode (fixture generator, the audio twin of [[encodePng]]):
    * 16-bit PCM mono whose samples follow the pure-INTEGER sawtooth
    * `s_i = ((i·step) mod (2·amplitude+1)) − amplitude`. WAV is lossless
    * PCM, so decode recovers exactly these integers — and because the
    * waveform is integer arithmetic (no sin/float), a SQL oracle predicts
    * every decoded statistic from (sampleRate, nSamples, amplitude, step)
    * alone, exactly.
    */
  val encodeWavSaw: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((sampleRate: Int, nSamples: Int, amplitude: Int, step: Int) => {
      val pcm = new Array[Byte](nSamples * 2)
      var i = 0
      while (i < nSamples) {
        val v = ((i.toLong * step) % (2L * amplitude + 1) - amplitude).toInt
        pcm(2 * i) = (v & 0xff).toByte // little-endian PCM16
        pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        sampleRate.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
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
