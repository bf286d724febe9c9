package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native vector math: one-pass dot product and multi-table LSH
  * postings, replacing `zip_with`+`aggregate` lambda trees (which
  * re-traverse the arrays and janino-compile slowly).
  */

/** Σ aᵢ·bᵢ over two equal-length double arrays, summed left-to-right
  * (same order as the previous fold — results are bit-identical). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DotProduct.compute($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProduct = copy(left = newLeft, right = newRight)
}

object DotProduct {
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  def dot_product(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** Multi-table random-hyperplane LSH postings for a unit vector:
  * element t = (t << 16) | signBits(t), where signBits are the signs
  * of `planes` projections onto deterministic splitmix64 hyperplanes.
  * One pass computes all tables × planes projections. */
case class LshPostings(child: Expression, planes: Int, tables: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    LshPostings.compute(input.asInstanceOf[ArrayData], planes, tables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LshPostings.compute($c, $planes, $tables);")

  override protected def withNewChildInternal(newChild: Expression): LshPostings =
    copy(child = newChild)
}

object LshPostings {
  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Hyperplane component for (table, plane, dim) in [-1, 1). */
  @inline private def component(t: Int, p: Int, j: Int): Double =
    mix((t.toLong << 40) ^ (p.toLong << 20) ^ j.toLong).toDouble /
      Long.MaxValue.toDouble

  def compute(unit: ArrayData, planes: Int, tables: Int): ArrayData = {
    val dim = unit.numElements()
    val out = new Array[Any](tables)
    var t = 0
    while (t < tables) {
      var bits = 0L
      var p = 0
      while (p < planes) {
        var proj = 0.0
        var j = 0
        while (j < dim) { proj += unit.getDouble(j) * component(t, p, j); j += 1 }
        if (proj >= 0) bits |= (1L << p)
        p += 1
      }
      out(t) = (t.toLong << 16) | bits
      t += 1
    }
    new GenericArrayData(out)
  }

  def lsh_postings(unit: Column, planes: Int, tables: Int): Column =
    ColumnBridge.column(
      LshPostings(ColumnBridge.expression(unit), planes, tables))
}

/** max |aᵢ| over a double array — the per-vector int8 quantization
  * scale. */
case class VecAbsMax(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    VecAbsMax.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VecAbsMax.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): VecAbsMax =
    copy(child = newChild)
}

object VecAbsMax {
  def compute(a: ArrayData): Double = {
    var m = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { val v = math.abs(a.getDouble(i)); if (v > m) m = v; i += 1 }
    m
  }

  def vec_abs_max(a: Column): Column =
    ColumnBridge.column(VecAbsMax(ColumnBridge.expression(a)))
}

/** Symmetric int8 scalar quantization: qᵢ = round(127·aᵢ/scale) as a
  * packed byte array — 8× smaller than the double vector, the standard
  * SQ8 index layout. */
case class QuantizeI8(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, s: Any): Any =
    QuantizeI8.compute(a.asInstanceOf[ArrayData], s.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, s) =>
      s"${ev.value} = graft.functions.QuantizeI8.compute($a, $s);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): QuantizeI8 = copy(left = newLeft, right = newRight)
}

object QuantizeI8 {
  def compute(a: ArrayData, scale: Double): ArrayData = {
    val n = a.numElements()
    val out = new Array[Byte](n)
    val f = if (scale > 0) 127.0 / scale else 0.0
    var i = 0
    while (i < n) {
      out(i) = math.max(-127, math.min(127, math.round(a.getDouble(i) * f))).toByte
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  def quantize_i8(a: Column, scale: Column): Column =
    ColumnBridge.column(QuantizeI8(
      ColumnBridge.expression(a), ColumnBridge.expression(scale)))
}

/** Σ qaᵢ·qbᵢ over two int8 arrays with integer accumulation — the SQ8
  * approximate-dot hot loop (reconstruct cosine as
  * sa·sb/127² · dot). */
case class DotI8(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    DotI8.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DotI8.compute($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotI8 = copy(left = newLeft, right = newRight)
}

object DotI8 {
  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += a.getByte(i).toLong * b.getByte(i).toLong; i += 1 }
    acc
  }

  def dot_i8(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotI8(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** The `nprobe` nearest IVF cells for a query vector against a flat
  * row-major (nlist × dim) centroid array (a broadcast literal, like
  * the PCA component columns in EmbeddingCompress): cell indices in
  * ascending squared-L2-distance order, ties by index. One codegen'd
  * pass per row — the query-side cell ranking of
  * [[graft.operators.IvfIndex]] runs in the scan stage with no Scala
  * UDF (VERDICT r11). nlist is small (≤ a few hundred), so the full
  * distance pass is O(nlist·dim) per query and the sort O(nlist log
  * nlist). */
case class NearestCells(left: Expression, right: Expression, nprobe: Int)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(q: Any, c: Any): Any =
    NearestCells.compute(q.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData],
      nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, c) =>
      s"${ev.value} = graft.functions.NearestCells.compute($q, $c, $nprobe);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): NearestCells = copy(left = newLeft, right = newRight)
}

object NearestCells {
  def compute(unit: ArrayData, flat: ArrayData, nprobe: Int): ArrayData = {
    val dim = unit.numElements()
    val nlist = if (dim == 0) 0 else flat.numElements() / dim
    val d = new Array[Double](nlist)
    var c = 0
    while (c < nlist) {
      var acc = 0.0
      var j = 0
      val base = c * dim
      while (j < dim) {
        val diff = flat.getDouble(base + j) - unit.getDouble(j)
        acc += diff * diff
        j += 1
      }
      d(c) = acc
      c += 1
    }
    val idx = Array.tabulate(nlist)(identity)
      .sortBy(i => (d(i), i))
    val out = new Array[Any](math.min(nprobe, nlist))
    var i = 0
    while (i < out.length) { out(i) = idx(i); i += 1 }
    new GenericArrayData(out)
  }

  def nearest_cells(unit: Column, flatCentroids: Column, nprobe: Int): Column =
    ColumnBridge.column(NearestCells(
      ColumnBridge.expression(unit), ColumnBridge.expression(flatCentroids),
      nprobe))
}
