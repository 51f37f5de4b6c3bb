package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Burrows–Wheeler transform (Burrows & Wheeler 1994) of a bounded
  * ASCII prefix — the character-clustering front-end of bzip2-family
  * compression, used here as a compressibility probe: the drop in
  * RLE run count between the raw text and its BWT estimates how much
  * a context-sorting compressor would gain. Implemented as the
  * classic sorted-rotation construction (the caller bounds the input
  * so the O(n² log n) rotation sort stays constant per row). ASCII
  * inputs only by contract: Java string order and DuckDB's binary
  * collation agree exactly there, so the oracle can replay the same
  * rotation sort with `list_sort`.
  */
case class BwtExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bwt"

  override protected def nullSafeEval(input: Any): Any =
    BwtExpr.bwt(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BwtExpr.bwt($c)")

  override protected def withNewChildInternal(newChild: Expression): BwtExpr =
    copy(child = newChild)
}

object BwtExpr {

  /** Static forwarder target for generated Java code. */
  def bwt(input: UTF8String): UTF8String = {
    val s = input.toString
    val n = s.length
    if (n == 0) return UTF8String.fromString("")
    val rotations = Array.tabulate(n)(i => s.substring(i) + s.substring(0, i))
    java.util.Arrays.sort(rotations, java.util.Comparator.naturalOrder())
    val out = new Array[Char](n)
    var i = 0
    while (i < n) { out(i) = rotations(i).charAt(n - 1); i += 1 }
    UTF8String.fromString(new String(out))
  }

  /** Column form. */
  def bwt(s: Column): Column =
    ColumnBridge.column(BwtExpr(ColumnBridge.expression(s)))
}
