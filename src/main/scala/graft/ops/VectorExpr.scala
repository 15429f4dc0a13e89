package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Native codegen'd dot product over two array columns (float or double
  * elements), the hot inner loop of every similarity operator. Replaces the
  * `zip_with` + `aggregate` higher-order-function formulation, which Spark
  * evaluates interpreted (per-element closure calls + an intermediate array
  * allocation per row) — an order of magnitude slower than a fused loop and
  * excluded from whole-stage codegen.
  *
  * Semantics are EXACTLY the HOF formulation's (and the DuckDB oracle's
  * `list_sum(list_transform(list_zip(...)))` replay): elements cast to
  * double, products accumulated left-to-right (bit-identical summation
  * order), any null element → null result, unequal lengths → null (zip_with
  * pads with null).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val (lt, rt) = (elemType(left), elemType(right))
    var acc = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = lt match {
        case FloatType => x.getFloat(i).toDouble
        case _         => x.getDouble(i)
      }
      val yv = rt match {
        case FloatType => y.getFloat(i).toDouble
        case _         => y.getDouble(i)
      }
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val getA = CodeGenerator.getValue(a, elemType(left), i)
      val getB = CodeGenerator.getValue(b, elemType(right), i)
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |    } else {
         |      $acc += (double)($getA) * (double)($getB);
         |    }
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-level dot product (see [[DotProduct]]) */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** Native codegen'd product-quantization encoder: for each of `m`
  * subspaces, the index of the codebook entry with the smallest sub-L2²
  * (first index on ties) — the per-row hot loop of PQ/IVF-PQ indexing.
  * Replaces the Column-algebra form (m × ks `aggregate(zip_with(slice))`
  * folds per row, every one an interpreted CodegenFallback that re-slices
  * the embedding) with ONE fused loop.
  *
  * Semantics are EXACTLY the HOF formulation's (and the DuckDB oracle
  * replay's): elements and codebook values widen float→double, sub-L2²
  * accumulates in dimension order, argmin = first index reaching the
  * minimum (strict `<` on an ascending scan), a wrong-length or
  * null-element embedding → null. `codebook` is flattened ks×(m·sub)
  * row-major — entry c's sub-vector for subspace j starts at
  * `c·m·sub + j·sub`.
  */
case class PqEncode(child: Expression, codebook: Array[Float],
    m: Int, ks: Int, sub: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_encode"

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val dims = m * sub
    if (x.numElements() != dims) return null
    val et = elemType
    val xs = new Array[Double](dims)
    var i = 0
    while (i < dims) {
      if (x.isNullAt(i)) return null
      xs(i) = et match {
        case FloatType => x.getFloat(i).toDouble
        case _         => x.getDouble(i)
      }
      i += 1
    }
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < ks) {
        var d2 = 0.0
        var d = 0
        while (d < sub) {
          val diff = xs(j * sub + d) - codebook(c * dims + j * sub + d).toDouble
          d2 += diff * diff
          d += 1
        }
        if (d2 < bestD) { bestD = d2; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "float[]")
    val dims = m * sub
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val xs = ctx.freshName("xs")
      val codes = ctx.freshName("codes")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val d2 = ctx.freshName("d2")
      val diff = ctx.freshName("diff")
      val getX = CodeGenerator.getValue(a, elemType, i)
      s"""
         |if ($a.numElements() != $dims) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $xs = new double[$dims];
         |  for (int $i = 0; $i < $dims && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; }
         |    else { $xs[$i] = (double)($getX); }
         |  }
         |  if (!${ev.isNull}) {
         |    int[] $codes = new int[$m];
         |    for (int $j = 0; $j < $m; $j++) {
         |      int $best = 0;
         |      double $bestD = Double.POSITIVE_INFINITY;
         |      for (int $c = 0; $c < $ks; $c++) {
         |        double $d2 = 0.0;
         |        for (int $d = 0; $d < $sub; $d++) {
         |          double $diff = $xs[$j * $sub + $d]
         |            - (double) $cbRef[$c * $dims + $j * $sub + $d];
         |          $d2 += $diff * $diff;
         |        }
         |        if ($d2 < $bestD) { $bestD = $d2; $best = $c; }
         |      }
         |      $codes[$j] = $best;
         |    }
         |    ${ev.value} =
         |      new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  /** Column-level PQ encode: `sample` is the ks codebook vectors (full
    * dims each); flattened row-major for the expression
    */
  def encode(emb: Column, sample: Array[Array[Float]],
      m: Int, ks: Int, sub: Int): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(emb),
      sample.flatten, m, ks, sub))
}
