package graft.sketch

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType}

/** DataDog-proto DDSketch interop — the byte encoding the reference's
  * sketches carry (`promql/aggregator.go:48-61` round-trips
  * sketches-go `proto.Marshal` bytes through its segments). graft's own
  * sketch bytes stay its versioned format; this importer lets graft QUERY
  * reference-written segments by converting on read.
  *
  * Wire format reimplemented from the public `ddsketch.proto`
  * (DataDog/sketches-go, Apache-2.0 — field numbers only, no code reuse):
  *
  * {{{
  * message DDSketch { IndexMapping mapping = 1; Store positiveValues = 2;
  *                    Store negativeValues = 3; double zeroCount = 4; }
  * message IndexMapping { double gamma = 1; double indexOffset = 2;
  *                        Interpolation interpolation = 3; }  // NONE = log
  * message Store { map<sint32, double> binCounts = 1;
  *                 repeated double contiguousBinCounts = 2;   // packed
  *                 sint32 contiguousBinIndexOffset = 3; }
  * }}}
  *
  * Semantics of the import (documented divergences):
  *  - only `interpolation = NONE` (pure logarithmic mapping) is accepted —
  *    it is what the reference writes; interpolated mappings raise.
  *  - `indexOffset` shifts bucket indices; graft uses offset 0, so indices
  *    import as `i - round(indexOffset)` (a non-integral offset would skew
  *    read-backs by ≤ one bucket — within the sketch's own α guarantee).
  *  - bin counts are float64 (weighted sketches); they import rounded to
  *    longs. The proto carries no exact count/sum/min/max, so those stats
  *    are RECONSTRUCTED from bucket read-back midpoints: quantiles keep
  *    the sketch's α-relative guarantee, `ddsketch_stats` fields become
  *    α-approximate instead of exact for imported sketches.
  */
object DDSketchProto {

  import graft.ingest.OtelProto.Reader

  def decode(bytes: Array[Byte]): DDSketch = {
    var gamma = 0.0
    var indexOffset = 0.0
    var interpolation = 0L
    var zeroCount = 0.0
    var pos = Map.empty[Int, Double]
    var neg = Map.empty[Int, Double]
    val r = new Reader(bytes, 0, bytes.length)
    while (r.hasNext) {
      val (f, w) = r.readTag()
      f match {
        case 1 =>
          val m = r.readMessage()
          while (m.hasNext) {
            val (mf, mw) = m.readTag()
            mf match {
              case 1 => gamma = java.lang.Double.longBitsToDouble(m.readFixed64())
              case 2 => indexOffset = java.lang.Double.longBitsToDouble(m.readFixed64())
              case 3 => interpolation = m.readVarint()
              case _ => m.skip(mw)
            }
          }
        case 2 => pos = readStore(r.readMessage())
        case 3 => neg = readStore(r.readMessage())
        case 4 => zeroCount = java.lang.Double.longBitsToDouble(r.readFixed64())
        case _ => r.skip(w)
      }
    }
    require(gamma > 1.0, s"ddsketch proto: missing/invalid gamma $gamma")
    require(interpolation == 0L,
      s"ddsketch proto: interpolated mapping $interpolation unsupported (reference writes NONE)")
    val alpha = (gamma - 1.0) / (gamma + 1.0)
    val shift = math.round(indexOffset).toInt
    val sk = new DDSketch(alpha)
    val g = gamma
    def mid(i: Int): Double = 2.0 * math.pow(g, i) / (g + 1.0)
    def put(store: Map[Int, Double], sign: Int): Unit =
      store.toSeq.sortBy(_._1).foreach { case (i, c) =>
        val n = math.round(c)
        if (n > 0) sk.add(sign * mid(i - shift), n)
      }
    put(neg, -1)
    val z = math.round(zeroCount)
    if (z > 0) sk.add(0.0, z)
    put(pos, 1)
    sk
  }

  private def readStore(r: Reader): Map[Int, Double] = {
    val out = scala.collection.mutable.Map.empty[Int, Double]
    var contiguousOffset = 0
    var contiguous = Vector.empty[Double]
    while (r.hasNext) {
      val (f, w) = r.readTag()
      f match {
        case 1 =>
          // map entry: key = 1 (sint32 zigzag), value = 2 (double)
          val e = r.readMessage()
          var k = 0; var v = 0.0
          while (e.hasNext) {
            val (ef, ew) = e.readTag()
            ef match {
              case 1 => k = e.readZigzag().toInt
              case 2 => v = java.lang.Double.longBitsToDouble(e.readFixed64())
              case _ => e.skip(ew)
            }
          }
          out(k) = out.getOrElse(k, 0.0) + v
        case 2 =>
          // packed doubles (also accept unpacked wire type 1)
          if (w == 2) {
            val m = r.readMessage()
            while (m.hasNext)
              contiguous :+= java.lang.Double.longBitsToDouble(m.readFixed64())
          } else contiguous :+= java.lang.Double.longBitsToDouble(r.readFixed64())
        case 3 => contiguousOffset = r.readZigzag().toInt
        case _ => r.skip(w)
      }
    }
    contiguous.zipWithIndex.foreach { case (c, i) =>
      if (c != 0.0) {
        val k = contiguousOffset + i
        out(k) = out.getOrElse(k, 0.0) + c
      }
    }
    out.toMap
  }

  /** Encode a graft sketch AS DataDog-proto bytes (map-store form, NONE
    * interpolation, offset 0) — the write half of interop, and what the
    * round-trip tests drive decode() with (no DataDog library exists in
    * this environment to generate fixtures).
    */
  private final class Writer {
    private val b = new java.io.ByteArrayOutputStream()
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { b.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      b.write(v.toInt)
    }
    def tag(field: Int, wire: Int): Unit = varint((field.toLong << 3) | wire)
    def fixed64(v: Long): Unit = {
      var i = 0
      while (i < 8) { b.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
    }
    def doubleField(field: Int, v: Double): Unit = {
      tag(field, 1); fixed64(java.lang.Double.doubleToLongBits(v))
    }
    def zigzagField(field: Int, v: Long): Unit = {
      tag(field, 0); varint((v << 1) ^ (v >> 63))
    }
    def messageField(field: Int, body: Array[Byte]): Unit = {
      tag(field, 2); varint(body.length.toLong); b.write(body)
    }
    def bytes: Array[Byte] = b.toByteArray
  }

  def encode(sk: DDSketch): Array[Byte] = {
    def store(m: scala.collection.mutable.LongMap[Long]): Array[Byte] = {
      val w = new Writer
      m.toSeq.sortBy(_._1).foreach { case (i, n) =>
        val e = new Writer // map entry: key = 1 (sint32 zigzag), value = 2 (double)
        e.zigzagField(1, i)
        e.doubleField(2, n.toDouble)
        w.messageField(1, e.bytes)
      }
      w.bytes
    }
    val mapping = { // { gamma, indexOffset = 0 (omitted), interpolation = NONE (omitted) }
      val w = new Writer
      w.doubleField(1, (1.0 + sk.alpha) / (1.0 - sk.alpha))
      w.bytes
    }
    val out = new Writer
    out.messageField(1, mapping)
    out.messageField(2, store(sk.pos))
    out.messageField(3, store(sk.neg))
    out.doubleField(4, sk.zeroCount.toDouble)
    out.bytes
  }
}

/** `ddsketch_from_proto(bytes)` → graft sketch bytes: the read-side bridge
  * that lets every existing sketch function (quantile/stats/fraction/merge)
  * run over reference-written DataDog-proto sketch columns.
  */
case class DDSketchFromProto(child: Expression)
  extends Expression with CodegenFallback with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "ddsketch_from_proto"

  override def eval(input: InternalRow): Any = {
    val b = child.eval(input)
    if (b == null) null
    else DDSketchProto.decode(b.asInstanceOf[Array[Byte]]).serialize()
  }

  override protected def withNewChildInternal(newChild: Expression): DDSketchFromProto =
    copy(child = newChild)
}

/** `ddsketch_to_proto(sketch)` → DataDog-proto bytes: the write-side
  * bridge — segments exported with this column are readable by any
  * sketches-go/sketches-java consumer (including the reference).
  */
case class DDSketchToProto(child: Expression)
  extends Expression with CodegenFallback with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "ddsketch_to_proto"

  override def eval(input: InternalRow): Any = {
    val b = child.eval(input)
    if (b == null) null
    else DDSketchProto.encode(DDSketch.deserialize(b.asInstanceOf[Array[Byte]]))
  }

  override protected def withNewChildInternal(newChild: Expression): DDSketchToProto =
    copy(child = newChild)
}
