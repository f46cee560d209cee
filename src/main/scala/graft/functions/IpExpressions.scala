package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot IP codec functions (SURVEY.md
  * §2.4 F6/F7/F10/F9, promotion plan §4): unary, null-propagating, with
  * `doGenCode` emitting a direct static call into [[IpCodec]]. Unlike a
  * Scala UDF there is no encoder round-trip or boxed lambda invocation —
  * the call sits inline in the generated consume() of the surrounding
  * WholeStageCodegen stage, so per-row codec cost is the JVM method call
  * alone. Used by every dashboard address-rendering query via
  * [[graft.GraftFunctions]].
  */
abstract class IpCodecExpression extends UnaryExpression with ExpectsInputTypes {
  /** Fully-qualified static call template; `%s` is the child's code. */
  protected def staticCall: String
  protected def boxedEval(input: Any): Any

  override protected def nullSafeEval(input: Any): Any = boxedEval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => staticCall.format(c))
}

/** F7 `IPv4NumToString(u32)` → dotted quad (viz-ch.json:233). */
case class Ip4Ntoa(child: Expression) extends IpCodecExpression {
  override def inputTypes = Seq(LongType)
  override def dataType: DataType = StringType
  override def prettyName: String = "ip4_ntoa"
  protected def staticCall: String =
    "org.apache.spark.unsafe.types.UTF8String.fromString(graft.functions.IpCodec.ip4NumToString(%s))"
  protected def boxedEval(input: Any): Any =
    UTF8String.fromString(IpCodec.ip4NumToString(input.asInstanceOf[Long]))
  override protected def withNewChildInternal(newChild: Expression): Ip4Ntoa = copy(child = newChild)
}

/** F6 `IPv6NumToString(b16)` → RFC 5952 text (viz-ch.json:233). */
case class Ip6Ntoa(child: Expression) extends IpCodecExpression {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def prettyName: String = "ip6_ntoa"
  protected def staticCall: String =
    "org.apache.spark.unsafe.types.UTF8String.fromString(graft.functions.IpCodec.ip6NumToString(%s))"
  protected def boxedEval(input: Any): Any =
    UTF8String.fromString(IpCodec.ip6NumToString(input.asInstanceOf[Array[Byte]]))
  override protected def withNewChildInternal(newChild: Expression): Ip6Ntoa = copy(child = newChild)
}

/** F10/F11: pack a uint32 left-aligned LE into 16 bytes (README.md:186-202). */
case class Ip4ToBin16(child: Expression) extends IpCodecExpression {
  override def inputTypes = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "ip4_to_bin16"
  protected def staticCall: String = "graft.functions.IpCodec.ip4ToBin16(%s)"
  protected def boxedEval(input: Any): Any = IpCodec.ip4ToBin16(input.asInstanceOf[Long])
  override protected def withNewChildInternal(newChild: Expression): Ip4ToBin16 = copy(child = newChild)
}

/** F9 `reinterpretAsUInt32` — little-endian leading 4 bytes (README.md:209). */
case class ReinterpretUint32(child: Expression) extends IpCodecExpression {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "reinterpret_uint32"
  protected def staticCall: String = "graft.functions.IpCodec.reinterpretUint32LE(%s)"
  protected def boxedEval(input: Any): Any = IpCodec.reinterpretUint32LE(input.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(newChild: Expression): ReinterpretUint32 = copy(child = newChild)
}
