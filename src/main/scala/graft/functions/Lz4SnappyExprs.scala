package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd column faces for the pure-JVM LZ4-frame and Snappy-block
  * codecs ([[Lz4Codec]], [[SnappyCodec]]) — same UnaryExpression shape
  * as [[ShardCodec]]'s gzip pair, so shard assembly/parse stays inside
  * whole-stage codegen with one tight JVM call per row. */
object Lz4SnappyHelper {
  def lz4Utf8(s: UTF8String): Array[Byte] = Lz4Codec.compressFrame(s.getBytes)
  def unlz4Utf8(b: Array[Byte]): UTF8String =
    UTF8String.fromBytes(Lz4Codec.decompressFrame(b))
  def snappyUtf8(s: UTF8String): Array[Byte] = SnappyCodec.compress(s.getBytes)
  def unsnappyUtf8(b: Array[Byte]): UTF8String =
    UTF8String.fromBytes(SnappyCodec.decompress(b))
  /** Little-endian content-size field of an LZ4 frame header (bytes
    * 6..13 with our FLG), for header-vs-content integrity columns. */
  def lz4ContentSize(b: Array[Byte]): Long = {
    var v = 0L
    var k = 0
    while (k < 8) { v |= (b(6 + k).toLong & 0xFF) << (8 * k); k += 1 }
    v
  }
}

/** string → LZ4 frame (64 KB blocks, xxh32 content checksum). */
case class Lz4Utf8(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lz4_utf8"
  override protected def nullSafeEval(input: Any): Any =
    Lz4SnappyHelper.lz4Utf8(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Lz4SnappyHelper.lz4Utf8($c)")
  override protected def withNewChildInternal(c: Expression): Lz4Utf8 =
    copy(child = c)
}

/** LZ4 frame → string (loud failure on bad magic/checksums/size). */
case class UnLz4Utf8(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unlz4_utf8"
  override protected def nullSafeEval(input: Any): Any =
    Lz4SnappyHelper.unlz4Utf8(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Lz4SnappyHelper.unlz4Utf8($c)")
  override protected def withNewChildInternal(c: Expression): UnLz4Utf8 =
    copy(child = c)
}

/** LZ4 frame → declared content size (header field, 0..2^63). */
case class Lz4ContentSize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lz4_content_size"
  override protected def nullSafeEval(input: Any): Any =
    Lz4SnappyHelper.lz4ContentSize(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Lz4SnappyHelper.lz4ContentSize($c)")
  override protected def withNewChildInternal(c: Expression): Lz4ContentSize =
    copy(child = c)
}

/** string → raw Snappy block. */
case class SnappyUtf8(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "snappy_utf8"
  override protected def nullSafeEval(input: Any): Any =
    Lz4SnappyHelper.snappyUtf8(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Lz4SnappyHelper.snappyUtf8($c)")
  override protected def withNewChildInternal(c: Expression): SnappyUtf8 =
    copy(child = c)
}

/** raw Snappy block → string (loud failure on malformed streams). */
case class UnsnappyUtf8(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unsnappy_utf8"
  override protected def nullSafeEval(input: Any): Any =
    Lz4SnappyHelper.unsnappyUtf8(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Lz4SnappyHelper.unsnappyUtf8($c)")
  override protected def withNewChildInternal(c: Expression): UnsnappyUtf8 =
    copy(child = c)
}

/** Column-API face. */
object Lz4SnappyExprs {
  def lz4Utf8(text: Column): Column =
    ColumnBridge.column(Lz4Utf8(ColumnBridge.expression(text)))
  def unlz4Utf8(payload: Column): Column =
    ColumnBridge.column(UnLz4Utf8(ColumnBridge.expression(payload)))
  def lz4ContentSize(payload: Column): Column =
    ColumnBridge.column(Lz4ContentSize(ColumnBridge.expression(payload)))
  def snappyUtf8(text: Column): Column =
    ColumnBridge.column(SnappyUtf8(ColumnBridge.expression(text)))
  def unsnappyUtf8(payload: Column): Column =
    ColumnBridge.column(UnsnappyUtf8(ColumnBridge.expression(payload)))
}
