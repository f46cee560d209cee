package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** DESCRIPTOR-DRIVEN protobuf decode — the schema-evolution seam the
  * hand-rolled [[ProtoCodec]] lacks (r13, verdict #6).
  *
  * The reference's ClickHouse path decodes from the `.proto` schema file
  * itself (`compose/clickhouse/create.sh:33-34`), so a user with an
  * evolving schema registry expects "hand me a compiled descriptor set
  * and decode by it" — `from_protobuf(value, "FlowMessage", descFile)`
  * in spark-protobuf terms. No protobuf-java jar exists in this
  * zero-egress image (only ORC's shaded copy, not a public seam), but
  * none is needed: `descriptor.proto` is ITSELF a protobuf message on
  * the public wire format, so the existing [[ProtoCodec.Reader]]
  * primitives parse a `FileDescriptorSet` directly —
  *  - `FileDescriptorSet.file = 1` (FileDescriptorProto)
  *  - `FileDescriptorProto`: name=1, package=2, message_type=4
  *  - `DescriptorProto`: name=1, field=2, nested_type=3
  *  - `FieldDescriptorProto`: name=1, number=3, label=4 (3=repeated),
  *    type=5, type_name=6
  * (field numbers/types from the public google/protobuf/descriptor
  * .proto). The parsed schema then drives [[decodeDynamic]], a generic
  * wire-walk that needs no generated classes — adding a field to the
  * schema registry changes the OUTPUT SCHEMA, never this code.
  *
  * Wire/value conventions match the hand codec so the two paths are
  * parity-testable on the same bytes:
  *  - uint32 rides Int bit-preserving, uint64 rides Long bit-preserving
  *    (the FlowRich convention);
  *  - absent bytes → null, absent string → "", absent scalars → 0/false
  *    (proto3 default elision, [[ProtoCodec.encode]]'s exact dual);
  *  - unknown wire fields are skipped (forward compatible);
  *  - `bytes` keep their wire length (the 16-byte address padding in
  *    [[ProtoCodec.decode]] is FlowMessage render-path normalization,
  *    not wire semantics — a descriptor consumer applies its own).
  * Repeated scalar fields accept both packed (wire type 2) and expanded
  * encodings, per the proto3 spec; nested messages decode recursively
  * into Spark structs.
  *
  * Scale shape: [[fromWireDescriptor]] is the same scan-stage flatMap as
  * [[ProtoCodec.fromWire]] — the descriptor parses ONCE on the driver,
  * the per-task closure captures only the (small, serializable) message
  * graph, and decode happens pre-shuffle in the ingest stage.
  */
object DescriptorCodec {

  /** FieldDescriptorProto.Type values (public descriptor.proto enum). */
  object FType {
    val Double = 1; val Float = 2; val Int64 = 3; val UInt64 = 4
    val Int32 = 5; val Fixed64 = 6; val Fixed32 = 7; val Bool = 8
    val String = 9; val Group = 10; val Message = 11; val Bytes = 12
    val UInt32 = 13; val Enum = 14; val SFixed32 = 15; val SFixed64 = 16
    val SInt32 = 17; val SInt64 = 18
  }

  final case class FieldDesc(name: String, number: Int, ftype: Int,
      repeated: Boolean = false, typeName: String = "")

  /** One message type; `fullName` is dotted (`pkg.Msg.Nested`). */
  final case class MessageDesc(fullName: String, fields: Seq[FieldDesc])

  // ------------------------------------------------- descriptor-set parse

  /** Parse a compiled `FileDescriptorSet` (what
    * `protoc --descriptor_set_out` emits) into the message-type map,
    * keyed by dotted full name. Nested types are flattened in. */
  def parseDescriptorSet(bytes: Array[Byte]): Map[String, MessageDesc] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, MessageDesc]
    val set = new ProtoCodec.Reader(bytes, 0, bytes.length)
    while (set.hasRemaining) {
      val tag = set.readVarint()
      if ((tag >>> 3).toInt == 1 && (tag & 7L) == 2L) {
        val file = set.readBytes()
        var pkg = ""
        val messages = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
        val fr = new ProtoCodec.Reader(file, 0, file.length)
        while (fr.hasRemaining) {
          val t = fr.readVarint()
          ((t >>> 3).toInt, (t & 7L).toInt) match {
            case (2, 2) => pkg = new String(fr.readBytes(), "UTF-8")
            case (4, 2) => messages += fr.readBytes()
            case (_, w) => fr.skip(w)
          }
        }
        messages.foreach(m => parseMessage(m, pkg, out))
      } else set.skip((tag & 7L).toInt)
    }
    out.toMap
  }

  private def parseMessage(buf: Array[Byte], scope: String,
      out: scala.collection.mutable.LinkedHashMap[String, MessageDesc]): Unit = {
    var name = ""
    val fields = scala.collection.mutable.ArrayBuffer.empty[FieldDesc]
    val nested = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val r = new ProtoCodec.Reader(buf, 0, buf.length)
    while (r.hasRemaining) {
      val t = r.readVarint()
      ((t >>> 3).toInt, (t & 7L).toInt) match {
        case (1, 2) => name = new String(r.readBytes(), "UTF-8")
        case (2, 2) => fields += parseField(r.readBytes())
        case (3, 2) => nested += r.readBytes()
        case (_, w) => r.skip(w)
      }
    }
    val full = if (scope.isEmpty) name else s"$scope.$name"
    out(full) = MessageDesc(full, fields.toSeq)
    nested.foreach(n => parseMessage(n, full, out))
  }

  private def parseField(buf: Array[Byte]): FieldDesc = {
    var name = ""; var number = 0; var ftype = 0; var repeated = false
    var typeName = ""
    val r = new ProtoCodec.Reader(buf, 0, buf.length)
    while (r.hasRemaining) {
      val t = r.readVarint()
      ((t >>> 3).toInt, (t & 7L).toInt) match {
        case (1, 2) => name = new String(r.readBytes(), "UTF-8")
        case (3, 0) => number = r.readVarint().toInt
        case (4, 0) => repeated = r.readVarint() == 3L // LABEL_REPEATED
        case (5, 0) => ftype = r.readVarint().toInt
        case (6, 2) => typeName = new String(r.readBytes(), "UTF-8").stripPrefix(".")
        case (_, w) => r.skip(w)
      }
    }
    FieldDesc(name, number, ftype, repeated, typeName)
  }

  // ------------------------------------------------- descriptor-set build

  /** Serialize a descriptor set for the given message types — the dual of
    * [[parseDescriptorSet]], for environments without `protoc` (tests,
    * fixture generation). Top-level messages only; `pkg` scopes them. */
  def buildDescriptorSet(fileName: String, pkg: String,
      messages: Seq[MessageDesc]): Array[Byte] = {
    def lenDelim(out: java.io.ByteArrayOutputStream, field: Int, b: Array[Byte]): Unit = {
      writeVarint(out, (field.toLong << 3) | 2L)
      writeVarint(out, b.length.toLong)
      out.write(b, 0, b.length)
    }
    def varint(out: java.io.ByteArrayOutputStream, field: Int, v: Long): Unit = {
      writeVarint(out, field.toLong << 3); writeVarint(out, v)
    }
    def str(out: java.io.ByteArrayOutputStream, field: Int, s: String): Unit =
      if (s.nonEmpty) lenDelim(out, field, s.getBytes("UTF-8"))
    def fieldBytes(f: FieldDesc): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream(64)
      str(o, 1, f.name)
      varint(o, 3, f.number.toLong)
      varint(o, 4, if (f.repeated) 3L else 1L)
      varint(o, 5, f.ftype.toLong)
      if (f.typeName.nonEmpty) str(o, 6, "." + f.typeName)
      o.toByteArray
    }
    def msgBytes(m: MessageDesc): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream(256)
      // simple name: strip the package scope
      str(o, 1, m.fullName.split('.').last)
      m.fields.foreach(f => lenDelim(o, 2, fieldBytes(f)))
      o.toByteArray
    }
    val file = new java.io.ByteArrayOutputStream(1024)
    str(file, 1, fileName)
    str(file, 2, pkg)
    messages.foreach(m => lenDelim(file, 4, msgBytes(m)))
    val set = new java.io.ByteArrayOutputStream(1024)
    lenDelim(set, 1, file.toByteArray)
    set.toByteArray
  }

  private def writeVarint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0L) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  // ------------------------------------------------------- dynamic decode

  private def scalarSparkType(ftype: Int): DataType = ftype match {
    case FType.Double => DoubleType
    case FType.Float => FloatType
    case FType.Int64 | FType.UInt64 | FType.Fixed64 | FType.SFixed64 |
        FType.SInt64 => LongType
    case FType.Int32 | FType.UInt32 | FType.Fixed32 | FType.SFixed32 |
        FType.SInt32 | FType.Enum => IntegerType
    case FType.Bool => BooleanType
    case FType.String => StringType
    case FType.Bytes => BinaryType
    case other => throw new IllegalArgumentException(s"unsupported field type $other")
  }

  /** Spark schema for a message under the descriptor map (nested messages
    * recurse into structs; repeated into arrays). */
  def schemaFor(messageName: String, byName: Map[String, MessageDesc]): StructType = {
    val md = byName.getOrElse(messageName,
      throw new IllegalArgumentException(
        s"message '$messageName' not in descriptor set (${byName.keys.mkString(", ")})"))
    StructType(md.fields.map { f =>
      val base =
        if (f.ftype == FType.Message) schemaFor(f.typeName, byName)
        else scalarSparkType(f.ftype)
      StructField(f.name, if (f.repeated) ArrayType(base) else base,
        nullable = true)
    })
  }

  private def zigzag(v: Long): Long = (v >>> 1) ^ -(v & 1L)

  private def readScalar(r: ProtoCodec.Reader, ftype: Int, wire: Int): Any =
    (ftype, wire) match {
      case (FType.Double, 1) => java.lang.Double.longBitsToDouble(r.readFixed64())
      case (FType.Float, 5) => java.lang.Float.intBitsToFloat(r.readFixed32())
      case (FType.Int64 | FType.UInt64, 0) => r.readVarint()
      case (FType.SInt64, 0) => zigzag(r.readVarint())
      case (FType.Fixed64 | FType.SFixed64, 1) => r.readFixed64()
      case (FType.Int32 | FType.UInt32 | FType.Enum, 0) => r.readVarint().toInt
      case (FType.SInt32, 0) => zigzag(r.readVarint()).toInt
      case (FType.Fixed32 | FType.SFixed32, 5) => r.readFixed32()
      case (FType.Bool, 0) => r.readVarint() != 0L
      case (FType.String, 2) => new String(r.readBytes(), "UTF-8")
      case (FType.Bytes, 2) => r.readBytes()
      case (t, w) =>
        throw new IllegalArgumentException(s"field type $t cannot ride wire type $w")
    }

  private def isPackable(ftype: Int): Boolean = ftype match {
    case FType.String | FType.Bytes | FType.Message | FType.Group => false
    case _ => true
  }

  /** Precompiled per-message decoder: field lookup is an ARRAY indexed by
    * field number (built once, on the driver), so the per-record wire walk
    * does no map allocation — this runs per frame in the ingest hot path.
    * Serializable: a task closure captures the compiled graph, never the
    * raw descriptor bytes. */
  final class DynamicDecoder private[DescriptorCodec] (
      val messageName: String, byName: Map[String, MessageDesc])
      extends Serializable {
    private val md = byName.getOrElse(messageName,
      throw new IllegalArgumentException(
        s"message '$messageName' not in descriptor set (${byName.keys.mkString(", ")})"))
    private val fields = md.fields.toArray
    private val maxNum = if (fields.isEmpty) 0 else fields.map(_.number).max
    // field number → position in the output row (-1 = unknown, skip)
    private val slotOf: Array[Int] = {
      val a = Array.fill(maxNum + 1)(-1)
      fields.zipWithIndex.foreach { case (f, i) => a(f.number) = i }
      a
    }
    private val subDecoders: Array[DynamicDecoder] = fields.map { f =>
      if (f.ftype == FType.Message) new DynamicDecoder(f.typeName, byName) else null
    }
    private val defaults: Array[Any] = fields.map(defaultValue)
    /** The row schema — decoded rows carry it so `getAs[T](name)` works
      * on bare decode results (the Dataset path re-imposes its own). */
    val schema: StructType = schemaFor(messageName, byName)

    /** Decode one bare message into a Row in field-declaration order.
      * Unknown fields skip; last-wins for non-repeated duplicates (proto3
      * scalar merge semantics). */
    def decode(buf: Array[Byte], start: Int = 0, endOpt: Int = -1): Row = {
      val end = if (endOpt < 0) buf.length else endOpt
      val values = new Array[Any](fields.length)
      val r = new ProtoCodec.Reader(buf, start, end)
      while (r.hasRemaining) {
        val tag = r.readVarint()
        val num = (tag >>> 3).toInt
        val wire = (tag & 7L).toInt
        val slot = if (num >= 0 && num <= maxNum) slotOf(num) else -1
        if (slot < 0) r.skip(wire)
        else {
          val f = fields(slot)
          if (f.repeated) {
            val acc = (values(slot) match {
              case null =>
                val b = scala.collection.mutable.ArrayBuffer.empty[Any]
                values(slot) = b; b
              case b => b
            }).asInstanceOf[scala.collection.mutable.ArrayBuffer[Any]]
            if (wire == 2 && isPackable(f.ftype)) {
              // packed encoding: one length-delimited run of scalars
              val packed = r.readBytes()
              val pr = new ProtoCodec.Reader(packed, 0, packed.length)
              val innerWire = f.ftype match {
                case FType.Double | FType.Fixed64 | FType.SFixed64 => 1
                case FType.Float | FType.Fixed32 | FType.SFixed32 => 5
                case _ => 0
              }
              while (pr.hasRemaining) acc += readScalar(pr, f.ftype, innerWire)
            } else if (f.ftype == FType.Message) {
              val sub = r.readBytes()
              acc += subDecoders(slot).decode(sub)
            } else acc += readScalar(r, f.ftype, wire)
          } else if (f.ftype == FType.Message) {
            val sub = r.readBytes()
            values(slot) = subDecoders(slot).decode(sub)
          } else values(slot) = readScalar(r, f.ftype, wire)
        }
      }
      var i = 0
      while (i < values.length) {
        values(i) match {
          case null => values(i) = defaults(i)
          case acc: scala.collection.mutable.ArrayBuffer[_] => values(i) = acc.toSeq
          case _ => ()
        }
        i += 1
      }
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(values, schema)
    }
  }

  /** Compile a decoder for `messageName` under the descriptor map. */
  def decoderFor(messageName: String, byName: Map[String, MessageDesc]): DynamicDecoder =
    new DynamicDecoder(messageName, byName)

  /** One-shot convenience over [[decoderFor]] (tests, exploration) —
    * production paths compile the decoder once and reuse it. */
  def decodeDynamic(messageName: String, byName: Map[String, MessageDesc],
      buf: Array[Byte], start: Int = 0, endOpt: Int = -1): Row =
    decoderFor(messageName, byName).decode(buf, start, endOpt)

  /** proto3 defaults for elided fields, matching [[ProtoCodec.encode]]'s
    * conventions: bytes → null (the hand codec's absent-address shape),
    * string → "", numerics → 0, bool → false, repeated → empty,
    * nested message → null. */
  private def defaultValue(f: FieldDesc): Any =
    if (f.repeated) Seq.empty
    else f.ftype match {
      case FType.Double => 0.0
      case FType.Float => 0.0f
      case FType.Int64 | FType.UInt64 | FType.Fixed64 | FType.SFixed64 |
          FType.SInt64 => 0L
      case FType.Int32 | FType.UInt32 | FType.Fixed32 | FType.SFixed32 |
          FType.SInt32 | FType.Enum => 0
      case FType.Bool => false
      case FType.String => ""
      case FType.Bytes | FType.Message | FType.Group => null
      case _ => null
    }

  // ---------------------------------------------------------- Spark bridge

  /** [[ProtoCodec.fromWire]] behind a DESCRIPTOR: same varint-framed
    * payload column, same strict/lenient dead-letter contract, but the
    * output schema comes from the descriptor set — schema evolution is a
    * registry update, not a code edit. */
  def fromWireDescriptor(df: DataFrame, bytesCol: String,
      descriptorSet: Array[Byte], messageName: String,
      lenient: Boolean = false): DataFrame = {
    val byName = parseDescriptorSet(descriptorSet)
    val schema = schemaFor(messageName, byName)
    val decoder = decoderFor(messageName, byName) // compiled ONCE, driver-side
    import df.sparkSession.implicits._
    val payloads = df.select(bytesCol).as[Array[Byte]]
    val enc = org.apache.spark.sql.Encoders.row(schema)
    def frames(buf: Array[Byte]): Seq[Row] = {
      if (buf == null) throw new IllegalArgumentException("null payload")
      val r = new ProtoCodec.Reader(buf, 0, buf.length)
      val out = scala.collection.mutable.ArrayBuffer.empty[Row]
      while (r.hasRemaining) {
        val lenL = r.readVarint()
        if (lenL < 0L || lenL > Int.MaxValue || r.pos.toLong + lenL > buf.length)
          throw new IllegalArgumentException(s"truncated frame ($lenL bytes at ${r.pos})")
        val len = lenL.toInt
        out += decoder.decode(buf, r.pos, r.pos + len)
        r.pos += len
      }
      out.toSeq
    }
    if (lenient)
      payloads.flatMap { b =>
        try frames(b)
        catch { case _: IllegalArgumentException | _: ArrayIndexOutOfBoundsException => Nil }
      }(enc)
    else payloads.flatMap(frames(_))(enc)
  }

  // -------------------------------------------- built-in flow descriptors

  /** The reference wire schema as a descriptor set — every FlowMessage
    * field the engine knows (base 17 + rich 12-64 + enrichment 100-103),
    * names and numbers from `/root/reference/pb-ext/flow.proto` and the
    * production schema SURVEY §1.1 documents. Generated here so a
    * protoc-less environment still has a descriptor to hand to
    * [[fromWireDescriptor]]; a real deployment passes its own compiled
    * set and THIS constant becomes a fixture. */
  lazy val flowDescriptorSet: Array[Byte] = {
    import FType._
    val fields = Seq(
      FieldDesc("Type", 1, Enum), FieldDesc("TimeReceived", 2, UInt64),
      FieldDesc("SamplingRate", 3, UInt64), FieldDesc("SequenceNum", 4, UInt32),
      FieldDesc("TimeFlowEnd", 5, UInt64), FieldDesc("SrcAddr", 6, Bytes),
      FieldDesc("DstAddr", 7, Bytes), FieldDesc("Bytes", 9, UInt64),
      FieldDesc("Packets", 10, UInt64), FieldDesc("SamplerAddress", 11, Bytes),
      FieldDesc("NextHop", 12, Bytes), FieldDesc("NextHopAS", 13, UInt32),
      FieldDesc("SrcAS", 14, UInt32), FieldDesc("DstAS", 15, UInt32),
      FieldDesc("SrcNet", 16, UInt32), FieldDesc("DstNet", 17, UInt32),
      FieldDesc("InIf", 18, UInt32), FieldDesc("OutIf", 19, UInt32),
      FieldDesc("Proto", 20, UInt32), FieldDesc("SrcPort", 21, UInt32),
      FieldDesc("DstPort", 22, UInt32), FieldDesc("IPTos", 23, UInt32),
      FieldDesc("ForwardingStatus", 24, UInt32), FieldDesc("IPTTL", 25, UInt32),
      FieldDesc("TCPFlags", 26, UInt32), FieldDesc("SrcMac", 27, UInt64),
      FieldDesc("DstMac", 28, UInt64), FieldDesc("VlanId", 29, UInt32),
      FieldDesc("Etype", 30, UInt32), FieldDesc("IcmpType", 31, UInt32),
      FieldDesc("IcmpCode", 32, UInt32), FieldDesc("SrcVlan", 33, UInt32),
      FieldDesc("DstVlan", 34, UInt32), FieldDesc("FragmentId", 35, UInt32),
      FieldDesc("FragmentOffset", 36, UInt32), FieldDesc("IPv6FlowLabel", 37, UInt32),
      FieldDesc("TimeFlowStart", 38, UInt64), FieldDesc("IngressVrfID", 39, UInt32),
      FieldDesc("EgressVrfID", 40, UInt32), FieldDesc("BiFlowDirection", 41, UInt32),
      FieldDesc("FlowDirection", 42, UInt32), FieldDesc("HasEncap", 43, Bool),
      FieldDesc("SrcAddrEncap", 44, Bytes), FieldDesc("DstAddrEncap", 45, Bytes),
      FieldDesc("ProtoEncap", 46, UInt32), FieldDesc("EtypeEncap", 47, UInt32),
      FieldDesc("IPTosEncap", 48, UInt32), FieldDesc("IPTTLEncap", 49, UInt32),
      FieldDesc("IPv6FlowLabelEncap", 50, UInt32), FieldDesc("FragmentIdEncap", 51, UInt32),
      FieldDesc("FragmentOffsetEncap", 52, UInt32), FieldDesc("HasMPLS", 53, Bool),
      FieldDesc("MPLSCount", 54, UInt32), FieldDesc("MPLS1TTL", 55, UInt32),
      FieldDesc("MPLS1Label", 56, UInt32), FieldDesc("MPLS2TTL", 57, UInt32),
      FieldDesc("MPLS2Label", 58, UInt32), FieldDesc("MPLS3TTL", 59, UInt32),
      FieldDesc("MPLS3Label", 60, UInt32), FieldDesc("MPLSLastTTL", 61, UInt32),
      FieldDesc("MPLSLastLabel", 62, UInt32), FieldDesc("HasPPP", 63, Bool),
      FieldDesc("PPPAddressControl", 64, UInt32),
      FieldDesc("SrcCountry", 100, FType.String), FieldDesc("DstCountry", 101, FType.String),
      FieldDesc("SrcASDB", 102, UInt32), FieldDesc("DstASDB", 103, UInt32))
    buildDescriptorSet("flow.proto", "flowprotob",
      Seq(MessageDesc("flowprotob.FlowMessage", fields)))
  }
}
