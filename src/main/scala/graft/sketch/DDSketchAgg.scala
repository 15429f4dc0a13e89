package graft.sketch

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types._

/** `ddsketch_agg(value)` — build a DDSketch from raw doubles → binary.
  * Native `TypedImperativeAggregate` so partial (map-side) aggregation and
  * shuffle-side merge work exactly like built-in aggregates — one shuffle
  * per groupBy at any scale, sketch bytes are the partial state.
  */
case class DDSketchAgg(
    child: Expression,
    alpha: Double = DDSketch.DefaultAlpha,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DDSketch] with UnaryLike[Expression] {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "ddsketch_agg"

  override def createAggregationBuffer(): DDSketch = new DDSketch(alpha)

  override def update(buf: DDSketch, input: InternalRow): DDSketch = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: DDSketch, other: DDSketch): DDSketch = buf.merge(other)

  override def eval(buf: DDSketch): Any = buf.serialize()

  override def serialize(buf: DDSketch): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): DDSketch = DDSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): DDSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DDSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): DDSketchAgg =
    copy(child = newChild)
}

/** `ddsketch_merge_agg(sketch_bytes)` — merge pre-serialized sketches
  * (rollup chain, quantile paths: reference `ddsketch_stats_agg(chq_sketch)`).
  */
case class DDSketchMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DDSketch] with UnaryLike[Expression] {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "ddsketch_merge_agg"

  override def createAggregationBuffer(): DDSketch = new DDSketch()

  override def update(buf: DDSketch, input: InternalRow): DDSketch = {
    val v = child.eval(input)
    if (v != null) {
      val other = DDSketch.deserialize(v.asInstanceOf[Array[Byte]])
      // an empty buffer adopts the incoming sketch's accuracy
      if (buf.isEmpty && buf.alpha != other.alpha) other else buf.merge(other)
    } else buf
  }

  override def merge(buf: DDSketch, other: DDSketch): DDSketch =
    if (buf.isEmpty && other.alpha != buf.alpha) other
    else buf.merge(other)

  override def eval(buf: DDSketch): Any = buf.serialize()
  override def serialize(buf: DDSketch): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): DDSketch = DDSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): DDSketchMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DDSketchMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): DDSketchMergeAgg =
    copy(child = newChild)
}

/** `ddsketch_quantile(sketch, q)` — value-at-quantile from sketch bytes. */
case class DDSketchQuantile(sketch: Expression, q: Expression)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(sketch, q)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "ddsketch_quantile"

  override def eval(input: InternalRow): Any = {
    val b = sketch.eval(input)
    val qv = q.eval(input)
    if (b == null || qv == null) null
    else {
      val sk = DDSketch.deserialize(b.asInstanceOf[Array[Byte]])
      if (sk.isEmpty) null else sk.quantile(qv.asInstanceOf[Double])
    }
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(sketch = c(0), q = c(1))
}

/** `ddsketch_fraction(sketch, lo, hi)` — fraction of observations whose
  * read-back value lies in [lo, hi] (see [[DDSketch.fractionBetween]]).
  */
case class DDSketchFraction(sketch: Expression, lo: Expression, hi: Expression)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(sketch, lo, hi)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "ddsketch_fraction"

  override def eval(input: InternalRow): Any = {
    val b = sketch.eval(input)
    val l = lo.eval(input)
    val h = hi.eval(input)
    if (b == null || l == null || h == null) null
    else {
      val sk = DDSketch.deserialize(b.asInstanceOf[Array[Byte]])
      if (sk.isEmpty) null
      else sk.fractionBetween(l.asInstanceOf[Double], h.asInstanceOf[Double])
    }
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(sketch = c(0), lo = c(1), hi = c(2))
}

/** `ddsketch_stdvar(sketch, isStdDev)` — population variance (or its
  * square root) of the read-back values, via the canonical ascending-value
  * fold (see [[DDSketch.readbackVariance]]).
  */
case class DDSketchStdVar(sketch: Expression, isStdDev: Boolean)
  extends Expression with CodegenFallback with UnaryLike[Expression] {

  override def child: Expression = sketch
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = if (isStdDev) "ddsketch_stddev" else "ddsketch_stdvar"

  override def eval(input: InternalRow): Any = {
    val b = sketch.eval(input)
    if (b == null) null
    else {
      val sk = DDSketch.deserialize(b.asInstanceOf[Array[Byte]])
      if (sk.isEmpty) null
      else {
        val v = sk.readbackVariance
        if (isStdDev) math.sqrt(v) else v
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): DDSketchStdVar =
    copy(sketch = newChild)
}

/** `ddsketch_stats(sketch)` — struct(count, sum, min, max, avg, p50, p90,
  * p95, p99): the reference extension's output shape.
  */
case class DDSketchStats(sketch: Expression)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(sketch)
  override def dataType: DataType = DDSketchStats.schema
  override def nullable: Boolean = true
  override def prettyName: String = "ddsketch_stats"

  override def eval(input: InternalRow): Any = {
    val b = sketch.eval(input)
    if (b == null) null
    else {
      val sk = DDSketch.deserialize(b.asInstanceOf[Array[Byte]])
      InternalRow(sk.count, sk.sum, sk.min, sk.max, sk.avg,
        sk.quantile(0.25), sk.quantile(0.5), sk.quantile(0.75),
        sk.quantile(0.9), sk.quantile(0.95), sk.quantile(0.99))
    }
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(sketch = c(0))
}

object DDSketchStats {
  val schema: StructType = StructType(Seq(
    StructField("count", LongType), StructField("sum", DoubleType),
    StructField("min", DoubleType), StructField("max", DoubleType),
    StructField("avg", DoubleType),
    StructField("p25", DoubleType), StructField("p50", DoubleType),
    StructField("p75", DoubleType), StructField("p90", DoubleType),
    StructField("p95", DoubleType), StructField("p99", DoubleType)))
}

/** Column-level entry points (`import graft.sketch.functions._`). */
object functions {
  import org.apache.spark.sql.graftshim.ColumnBridge
  private def expr(c: Column): Expression = ColumnBridge.expression(c)
  private def toCol(e: Expression): Column = ColumnBridge.column(e)

  def ddsketch_agg(value: Column, alpha: Double = DDSketch.DefaultAlpha): Column =
    toCol(DDSketchAgg(expr(value.cast("double")), alpha).toAggregateExpression())

  def ddsketch_merge_agg(sketch: Column): Column =
    toCol(DDSketchMergeAgg(expr(sketch)).toAggregateExpression())

  def ddsketch_quantile(sketch: Column, q: Double): Column =
    toCol(DDSketchQuantile(expr(sketch), expr(lit(q))))

  def ddsketch_stats(sketch: Column): Column =
    toCol(DDSketchStats(expr(sketch)))

  def ddsketch_fraction(sketch: Column, lo: Double, hi: Double): Column =
    toCol(DDSketchFraction(expr(sketch), expr(lit(lo)), expr(lit(hi))))

  def ddsketch_stdvar(sketch: Column, isStdDev: Boolean = false): Column =
    toCol(DDSketchStdVar(expr(sketch), isStdDev))

  def ddsketch_from_proto(bytes: Column): Column =
    toCol(DDSketchFromProto(expr(bytes)))

  def ddsketch_to_proto(sketch: Column): Column =
    toCol(DDSketchToProto(expr(sketch)))

  def cms_agg(value: Column, depth: Int = CountMin.DefaultDepth,
      width: Int = CountMin.DefaultWidth): Column =
    toCol(CountMinAgg(expr(value.cast("string")), depth, width).toAggregateExpression())

  def cms_merge_agg(sketch: Column): Column =
    toCol(CountMinMergeAgg(expr(sketch)).toAggregateExpression())

  def cms_est(sketch: Column, value: Column): Column =
    toCol(CountMinEstimate(expr(sketch), expr(value.cast("string"))))
}
