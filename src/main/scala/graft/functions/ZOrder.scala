package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (z-order) interleave of two 32-bit keys — the
  * multi-dimensional clustering key for data layout.
  *
  * The 100 TB problem: a table sorted by ONE key (say ts) gives
  * min/max skipping on that key only; queries filtering on the other
  * hot key (token_id) read every row group. Sorting by the
  * interleaved key clusters BOTH dimensions: any small token range ∪
  * time range touches O(√files) of the layout, so parquet row-group
  * stats prune most of the scan for either predicate. (The same trick
  * ClickHouse ships as `ORDER BY (mortonEncode(...))` and Delta/
  * Iceberg as `ZORDER BY` / sort-order transforms — here it is just
  * an expression: range-partition + sort by it and any parquet writer
  * gets the layout.)
  *
  * Each input is truncated to its low 32 bits; a and b occupy even
  * and odd bit positions respectively.
  */
case class ZOrder(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_zorder"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    import org.apache.spark.sql.types._
    def ok(dt: DataType) = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckSuccess
    else TypeCheckFailure(
      s"$prettyName(a: integral, b: integral), got (${left.dataType}, ${right.dataType})")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.interleave(a.asInstanceOf[Number].longValue(),
      b.asInstanceOf[Number].longValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrder.interleave((long) $a, (long) $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder =
    copy(left = newLeft, right = newRight)
}

object ZOrder {

  /** Spread the low 32 bits of v to the even bit positions of a
    * 64-bit word (the standard mask-shift cascade). */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  def interleave(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)

  /** Column API: morton key of two integral columns. */
  def z_order(a: Column, b: Column): Column =
    ColumnBridge.column(ZOrder(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
