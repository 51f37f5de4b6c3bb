package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd column faces for [[ZstdCodec]] — same UnaryExpression
  * shape as the gzip/LZ4/Snappy shard pairs. */
object ZstdHelper {
  def zstdUtf8(s: UTF8String): Array[Byte] = ZstdCodec.compressFrame(s.getBytes)
  def unzstdUtf8(b: Array[Byte]): UTF8String =
    UTF8String.fromBytes(ZstdCodec.decompressFrame(b))
}

/** string → zstd frame (RAW/RLE blocks, xxh64 checksum). */
case class ZstdUtf8(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "zstd_utf8"
  override protected def nullSafeEval(input: Any): Any =
    ZstdHelper.zstdUtf8(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ZstdHelper.zstdUtf8($c)")
  override protected def withNewChildInternal(c: Expression): ZstdUtf8 =
    copy(child = c)
}

/** zstd frame → string (loud failure on bad magic/FCS/checksum). */
case class UnzstdUtf8(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unzstd_utf8"
  override protected def nullSafeEval(input: Any): Any =
    ZstdHelper.unzstdUtf8(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ZstdHelper.unzstdUtf8($c)")
  override protected def withNewChildInternal(c: Expression): UnzstdUtf8 =
    copy(child = c)
}

/** zstd frame → declared frame content size (header field). */
case class ZstdContentSize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "zstd_content_size"
  override protected def nullSafeEval(input: Any): Any =
    ZstdCodec.contentSize(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ZstdCodec.contentSize($c)")
  override protected def withNewChildInternal(c: Expression): ZstdContentSize =
    copy(child = c)
}

/** Column-API face. */
object ZstdExprs {
  def zstdUtf8(text: Column): Column =
    ColumnBridge.column(ZstdUtf8(ColumnBridge.expression(text)))
  def unzstdUtf8(payload: Column): Column =
    ColumnBridge.column(UnzstdUtf8(ColumnBridge.expression(payload)))
  def zstdContentSize(payload: Column): Column =
    ColumnBridge.column(ZstdContentSize(ColumnBridge.expression(payload)))
}
