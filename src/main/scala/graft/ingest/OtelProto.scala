package graft.ingest

import java.util.zip.GZIPInputStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal OTel protobuf decoder for `.binpb[.gz]` ingest.
  *
  * Hand-rolled from the PUBLIC protobuf wire format (varint / fixed64 /
  * length-delimited / fixed32) + the public opentelemetry-proto field
  * numbers for LogsData and TracesData. Role of the reference's
  * `otel_logs_read` / proto readers
  * (/root/reference/internal/filereader/ingest_proto_logs.go,
  * internal/metricsprocessing/logs_ingest_duckdb.go:232) — reimplemented
  * from the wire spec, not translated.
  *
  * Attribute values follow the reference's coercion rule: everything
  * stringifies, names normalize via [[Flatten.normalizeFieldName]].
  */
object OtelProto {

  // ---- wire-level reader ---------------------------------------------------

  final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
    def hasNext: Boolean = pos < end

    def readVarint(): Long = {
      var shift = 0
      var out = 0L
      while (true) {
        val b = buf(pos); pos += 1
        out |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return out
        shift += 7
      }
      out
    }

    def readTag(): (Int, Int) = {
      val v = readVarint()
      ((v >>> 3).toInt, (v & 7).toInt)
    }

    def readFixed64(): Long = {
      var out = 0L
      var i = 0
      while (i < 8) { out |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8
      out
    }

    def readFixed32(): Int = {
      var out = 0
      var i = 0
      while (i < 4) { out |= (buf(pos + i) & 0xff) << (8 * i); i += 1 }
      pos += 4
      out
    }

    def readBytes(): Array[Byte] = {
      val len = readVarint().toInt
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + len)
      pos += len
      out
    }

    /** sub-reader over a length-delimited field */
    def readMessage(): Reader = {
      val len = readVarint().toInt
      val r = new Reader(buf, pos, pos + len)
      pos += len
      r
    }

    def readString(): String = new String(readBytes(), "UTF-8")

    def skip(wireType: Int): Unit = wireType match {
      case 0 => readVarint()
      case 1 => pos += 8
      case 2 => pos += readVarint().toInt
      case 5 => pos += 4
      case other => throw new IllegalArgumentException(s"wire type $other")
    }
  }

  // ---- OTel common ----------------------------------------------------------

  /** AnyValue → stringified (oneof: 1 string, 2 bool, 3 int, 4 double,
    * 5 array, 6 kvlist, 7 bytes)
    */
  private def anyValue(r: Reader): String = {
    var out: String = null
    while (r.hasNext) {
      val (f, w) = r.readTag()
      f match {
        case 1 => out = r.readString()
        case 2 => out = (r.readVarint() != 0).toString
        case 3 => out = r.readVarint().toString
        case 4 => out = java.lang.Double.longBitsToDouble(r.readFixed64()).toString
        case 5 | 6 => // array_value / kvlist_value → compact json-ish string
          val inner = r.readMessage()
          val parts = scala.collection.mutable.ListBuffer[String]()
          while (inner.hasNext) {
            val (f2, w2) = inner.readTag()
            if (f2 == 1 && w2 == 2) parts += anyValue(inner.readMessage())
            else inner.skip(w2)
          }
          out = parts.mkString("[", ",", "]")
        case 7 => out = java.util.Base64.getEncoder.encodeToString(r.readBytes())
        case _ => r.skip(w)
      }
    }
    out
  }

  /** repeated KeyValue {key=1, value=2} → normalized (name → string) */
  private def keyValue(r: Reader): (String, String) = {
    var k: String = null
    var v: String = null
    while (r.hasNext) {
      val (f, w) = r.readTag()
      f match {
        case 1 => k = r.readString()
        case 2 => v = anyValue(r.readMessage())
        case _ => r.skip(w)
      }
    }
    (if (k == null) "" else Flatten.normalizeFieldName(k), v)
  }

  // ---- LogsData --------------------------------------------------------------

  final case class OtelLog(
      timeUnixNano: Long,
      severityNumber: Int,
      severityText: String,
      body: String,
      attrs: Map[String, String],
      resourceAttrs: Map[String, String],
      scopeName: String)

  def parseLogs(data: Array[Byte]): Seq[OtelLog] = {
    val out = scala.collection.mutable.ListBuffer[OtelLog]()
    val root = new Reader(data, 0, data.length)
    while (root.hasNext) {
      val (f, w) = root.readTag()
      if (f == 1 && w == 2) { // resource_logs
        val rl = root.readMessage()
        var resAttrs = Map.empty[String, String]
        val scopeLogs = scala.collection.mutable.ListBuffer[Reader]()
        while (rl.hasNext) {
          val (f2, w2) = rl.readTag()
          f2 match {
            case 1 => // resource { attributes=1 }
              val res = rl.readMessage()
              while (res.hasNext) {
                val (f3, w3) = res.readTag()
                if (f3 == 1 && w3 == 2) resAttrs += keyValue(res.readMessage())
                else res.skip(w3)
              }
            case 2 => scopeLogs += rl.readMessage()
            case _ => rl.skip(w2)
          }
        }
        scopeLogs.foreach { sl =>
          var scopeName = ""
          while (sl.hasNext) {
            val (f2, w2) = sl.readTag()
            f2 match {
              case 1 => // scope { name=1 }
                val sc = sl.readMessage()
                while (sc.hasNext) {
                  val (f3, w3) = sc.readTag()
                  if (f3 == 1 && w3 == 2) scopeName = sc.readString()
                  else sc.skip(w3)
                }
              case 2 => // log_records
                val lr = sl.readMessage()
                var t = 0L; var sevN = 0; var sevT = ""; var body = ""
                var attrs = Map.empty[String, String]
                while (lr.hasNext) {
                  val (f3, w3) = lr.readTag()
                  f3 match {
                    case 1 => t = lr.readFixed64()
                    case 2 => sevN = lr.readVarint().toInt
                    case 3 => sevT = lr.readString()
                    case 5 => body = anyValue(lr.readMessage())
                    case 6 => attrs += keyValue(lr.readMessage())
                    case _ => lr.skip(w3)
                  }
                }
                out += OtelLog(t, sevN, sevT, body, attrs, resAttrs, scopeName)
              case _ => sl.skip(w2)
            }
          }
        }
      } else root.skip(w)
    }
    out.toSeq
  }

  // ---- Spark integration -----------------------------------------------------

  private def maybeGunzip(path: String, content: Array[Byte]): Array[Byte] =
    if (path.endsWith(".gz")) {
      val in = new GZIPInputStream(new java.io.ByteArrayInputStream(content))
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](65536)
      var n = in.read(buf)
      while (n > 0) { bos.write(buf, 0, n); n = in.read(buf) }
      bos.toByteArray
    } else content

  /** `.binpb[.gz]` OTel logs → cooked logs DataFrame: chq_timestamp/tsns,
    * log_level, log_message, scope_name + flattened resource_* / attr_*
    * string columns (dynamic union across records, missing → null).
    */
  def readLogs(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val files = spark.read.format("binaryFile").load(path)
      .select("path", "content").as[(String, Array[Byte])]
    val logs = files.flatMap { case (p, content) => parseLogs(maybeGunzip(p, content)) }
    val keys = logs
      .flatMap(l => l.attrs.keys.map("attr_" + _) ++ l.resourceAttrs.keys.map("resource_" + _))
      .distinct().collect().sorted
    val base = logs.toDF()
    val withCols = keys.foldLeft(
      base.select(
        expr("timeUnixNano DIV 1000000").as("chq_timestamp"), // integer div: ns epochs exceed double's 2^53
        col("timeUnixNano").as("chq_tsns"),
        col("severityText").as("log_level"),
        col("severityNumber").as("chq_severity_number"),
        col("body").as("log_message"),
        col("scopeName").as("scope_name"),
        col("attrs"), col("resourceAttrs"))) { (df, k) =>
      if (k.startsWith("attr_")) df.withColumn(k, col("attrs").getItem(k.stripPrefix("attr_")))
      else df.withColumn(k, col("resourceAttrs").getItem(k.stripPrefix("resource_")))
    }
    withCols.drop("attrs", "resourceAttrs")
      .withColumn("metric_name", lit("log_events"))
  }

  // ---- tiny encoder (fixtures/tests; also documents the wire format) ---------

  object Encode {
    def varint(v: Long): Array[Byte] = {
      val out = scala.collection.mutable.ArrayBuffer[Byte]()
      var x = v
      while ((x & ~0x7fL) != 0) { out += ((x & 0x7f) | 0x80).toByte; x >>>= 7 }
      out += (x & 0x7f).toByte
      out.toArray
    }
    def tag(field: Int, wire: Int): Array[Byte] = varint((field.toLong << 3) | wire)
    def ld(field: Int, payload: Array[Byte]): Array[Byte] =
      tag(field, 2) ++ varint(payload.length) ++ payload
    def str(field: Int, s: String): Array[Byte] = ld(field, s.getBytes("UTF-8"))
    def fixed64(field: Int, v: Long): Array[Byte] =
      tag(field, 1) ++ (0 until 8).map(i => ((v >>> (8 * i)) & 0xff).toByte).toArray
    def vint(field: Int, v: Long): Array[Byte] = tag(field, 0) ++ varint(v)

    def anyString(s: String): Array[Byte] = str(1, s)
    def kv(key: String, value: String): Array[Byte] =
      str(1, key) ++ ld(2, anyString(value))

    def logRecord(timeNs: Long, sevNum: Int, sevText: String, body: String,
        attrs: Seq[(String, String)]): Array[Byte] =
      fixed64(1, timeNs) ++ vint(2, sevNum) ++ str(3, sevText) ++
        ld(5, anyString(body)) ++
        attrs.flatMap { case (k, v) => ld(6, kv(k, v)) }

    def logsData(resourceAttrs: Seq[(String, String)], scopeName: String,
        records: Seq[Array[Byte]]): Array[Byte] = {
      val resource = resourceAttrs.flatMap { case (k, v) => ld(1, kv(k, v)) }.toArray
      val scope = str(1, scopeName)
      val scopeLogs = ld(1, scope) ++ records.flatMap(r => ld(2, r))
      ld(1, ld(1, resource) ++ ld(2, scopeLogs))
    }
  }
}
