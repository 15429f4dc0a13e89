package graft.sketch

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** `cms_agg(value[, depth, width])` — build a Count-Min frequency sketch
  * from a string column → binary. Native `TypedImperativeAggregate`
  * (DDSketchAgg's shape): map-side partials, shuffle-side merges — one
  * shuffle per groupBy at any scale, and the merged cells are identical
  * whatever the partitioning because counter adds commute.
  */
case class CountMinAgg(
    child: Expression,
    depth: Int = CountMin.DefaultDepth,
    width: Int = CountMin.DefaultWidth,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMin] with UnaryLike[Expression] {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "cms_agg"

  override def createAggregationBuffer(): CountMin = new CountMin(depth, width)

  override def update(buf: CountMin, input: InternalRow): CountMin = {
    val v = child.eval(input)
    if (v != null) buf.add(v.toString)
    buf
  }

  override def merge(buf: CountMin, other: CountMin): CountMin = buf.merge(other)

  override def eval(buf: CountMin): Any = buf.serialize()
  override def serialize(buf: CountMin): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): CountMin = CountMin.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinAgg =
    copy(child = newChild)
}

/** `cms_merge_agg(cms_bytes)` — merge pre-serialized Count-Min sketches
  * (rollup over pre-sketched groups; cells add elementwise).
  */
case class CountMinMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMin] with UnaryLike[Expression] {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "cms_merge_agg"

  override def createAggregationBuffer(): CountMin =
    new CountMin(CountMin.DefaultDepth, CountMin.DefaultWidth)

  override def update(buf: CountMin, input: InternalRow): CountMin = {
    val v = child.eval(input)
    if (v != null) {
      val other = CountMin.deserialize(v.asInstanceOf[Array[Byte]])
      // an empty default-shaped buffer adopts the incoming sketch's shape
      if (buf.isEmpty && (buf.depth != other.depth || buf.width != other.width)) other
      else buf.merge(other)
    } else buf
  }

  override def merge(buf: CountMin, other: CountMin): CountMin =
    if (buf.isEmpty && (buf.depth != other.depth || buf.width != other.width)) other
    else if (other.isEmpty && (buf.depth != other.depth || buf.width != other.width)) buf
    else buf.merge(other)

  override def eval(buf: CountMin): Any = buf.serialize()
  override def serialize(buf: CountMin): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): CountMin = CountMin.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinMergeAgg =
    copy(child = newChild)
}

/** `cms_est(cms, value)` — point frequency estimate (never under the true
  * count) from sketch bytes.
  */
case class CountMinEstimate(sketch: Expression, value: Expression)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(sketch, value)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "cms_est"

  override def eval(input: InternalRow): Any = {
    val b = sketch.eval(input)
    val v = value.eval(input)
    if (b == null || v == null) null
    else CountMin.deserialize(b.asInstanceOf[Array[Byte]]).estimate(v.toString)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(sketch = c(0), value = c(1))
}
