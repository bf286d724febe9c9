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
