package graft

import org.apache.spark.sql.Row
import graft.flow.{FlowGen, FlowMessage}
import graft.flow.FlowRich._
import graft.sources.{DescriptorCodec, ProtoCodec}
import graft.sources.DescriptorCodec.{FieldDesc, FType, MessageDesc}

/** Descriptor-driven decode (r13, verdict #6): the compiled-descriptor
  * seam must reproduce the hand-rolled codec bit-for-bit on the same
  * wire bytes — parity on the FlowRich fuzz corpus — plus the generic
  * machinery the hand codec never needed (packed repeated scalars,
  * nested messages, descriptor round-trip). */
class DescriptorCodecSpec extends SparkTestBase {

  private val byName = DescriptorCodec.parseDescriptorSet(DescriptorCodec.flowDescriptorSet)
  private val Flow = "flowprotob.FlowMessage"

  // -- fuzz corpus (FlowRichSpec's generator shape, its own seed) --------
  private val rnd = new scala.util.Random(77)
  private def ru32(): Int = rnd.nextInt(4) match {
    case 0 => 0
    case 1 => rnd.nextInt(1 << 12)
    case 2 => Int.MaxValue - rnd.nextInt(3)
    case _ => -1 - rnd.nextInt(1000) // uint32 ≥ 2³¹ riding Int bit-preserving
  }
  private def rbytes(max: Int): Array[Byte] = rnd.nextInt(3) match {
    case 0 => null
    case 1 => Array.fill(1 + rnd.nextInt(max))(rnd.nextInt(256).toByte)
    case _ => new Array[Byte](0)
  }
  private def rstr(): String = rnd.nextInt(3) match {
    case 0 => ""
    case 1 => "US"
    case _ => new String(Array.fill(1 + rnd.nextInt(6))(('A' + rnd.nextInt(26)).toChar))
  }
  private def randomRich(base: FlowMessage): FlowMessageRich = FlowMessageRich(
    base,
    RoutingInfo(rbytes(16), ru32(), ru32(), ru32(), ru32(), ru32(),
      ru32(), ru32(), ru32(), ru32()),
    L2Info(rnd.nextLong() >>> rnd.nextInt(40), rnd.nextLong() >>> rnd.nextInt(40),
      ru32(), ru32(), ru32()),
    IpInfo(ru32(), ru32(), ru32(), ru32(), ru32(), ru32(), ru32(), ru32(), ru32()),
    EncapInfo(rnd.nextBoolean(), rbytes(16), rbytes(16), ru32(), ru32(),
      ru32(), ru32(), ru32(), ru32(), ru32()),
    MplsInfo(rnd.nextBoolean(), ru32(), ru32(), ru32(), ru32(), ru32(),
      ru32(), ru32(), ru32(), ru32()),
    PppInfo(rnd.nextBoolean(), ru32()),
    GeoInfo(rstr(), rstr(), ru32(), ru32()))

  /** What the descriptor path must see for the wire bytes of `m`:
    * field name → value, with [[ProtoCodec.encode]]'s elision rules
    * applied (empty/null bytes are never written → decode null; the
    * descriptor path does NOT apply FlowMessage's 16-byte address pad). */
  private def expected(m: FlowMessageRich): Map[String, Any] = {
    def b(x: Array[Byte]): Any = if (x == null || x.isEmpty) null else x.toSeq
    val base = m.base; val r = m.routing; val l2 = m.l2; val ip = m.ip
    val e = m.encap; val mp = m.mpls
    Map(
      "Type" -> base.flowType, "TimeReceived" -> base.timeReceived,
      "SamplingRate" -> base.samplingRate, "SequenceNum" -> base.sequenceNum.toInt,
      "TimeFlowEnd" -> base.timeFlowEnd, "SrcAddr" -> b(base.srcAddr),
      "DstAddr" -> b(base.dstAddr), "Bytes" -> base.bytes,
      "Packets" -> base.packets, "SamplerAddress" -> b(base.samplerAddress),
      "NextHop" -> b(r.nextHop), "NextHopAS" -> r.nextHopAS,
      "SrcAS" -> base.srcAS, "DstAS" -> base.dstAS,
      "SrcNet" -> r.srcNet, "DstNet" -> r.dstNet,
      "InIf" -> r.inIf, "OutIf" -> r.outIf,
      "Proto" -> base.proto, "SrcPort" -> base.srcPort, "DstPort" -> base.dstPort,
      "IPTos" -> ip.ipTos, "ForwardingStatus" -> ip.forwardingStatus,
      "IPTTL" -> ip.ipTtl, "TCPFlags" -> ip.tcpFlags,
      "SrcMac" -> l2.srcMac, "DstMac" -> l2.dstMac, "VlanId" -> l2.vlanId,
      "Etype" -> base.etype, "IcmpType" -> ip.icmpType, "IcmpCode" -> ip.icmpCode,
      "SrcVlan" -> l2.srcVlan, "DstVlan" -> l2.dstVlan,
      "FragmentId" -> ip.fragmentId, "FragmentOffset" -> ip.fragmentOffset,
      "IPv6FlowLabel" -> ip.ipv6FlowLabel, "TimeFlowStart" -> base.timeFlowStart,
      "IngressVrfID" -> r.ingressVrfId, "EgressVrfID" -> r.egressVrfId,
      "BiFlowDirection" -> r.biFlowDirection, "FlowDirection" -> r.flowDirection,
      "HasEncap" -> e.hasEncap, "SrcAddrEncap" -> b(e.srcAddrEncap),
      "DstAddrEncap" -> b(e.dstAddrEncap), "ProtoEncap" -> e.protoEncap,
      "EtypeEncap" -> e.etypeEncap, "IPTosEncap" -> e.ipTosEncap,
      "IPTTLEncap" -> e.ipTtlEncap, "IPv6FlowLabelEncap" -> e.ipv6FlowLabelEncap,
      "FragmentIdEncap" -> e.fragmentIdEncap, "FragmentOffsetEncap" -> e.fragmentOffsetEncap,
      "HasMPLS" -> mp.hasMpls, "MPLSCount" -> mp.mplsCount,
      "MPLS1TTL" -> mp.mpls1Ttl, "MPLS1Label" -> mp.mpls1Label,
      "MPLS2TTL" -> mp.mpls2Ttl, "MPLS2Label" -> mp.mpls2Label,
      "MPLS3TTL" -> mp.mpls3Ttl, "MPLS3Label" -> mp.mpls3Label,
      "MPLSLastTTL" -> mp.mplsLastTtl, "MPLSLastLabel" -> mp.mplsLastLabel,
      "HasPPP" -> m.ppp.hasPpp, "PPPAddressControl" -> m.ppp.pppAddressControl,
      "SrcCountry" -> m.geo.srcCountry, "DstCountry" -> m.geo.dstCountry,
      "SrcASDB" -> m.geo.srcAsdb, "DstASDB" -> m.geo.dstAsdb)
  }

  private def rowValue(row: Row, name: String): Any = row.getAs[Any](name) match {
    case a: Array[Byte] => a.toSeq
    case v => v
  }

  test("descriptor round-trip: build → parse reproduces the message graph") {
    val parsed = DescriptorCodec.parseDescriptorSet(DescriptorCodec.flowDescriptorSet)
    assert(parsed.keySet === Set(Flow))
    val fields = parsed(Flow).fields
    assert(fields.size === 67)
    assert(fields.find(_.name == "TimeReceived").get.number === 2)
    assert(fields.find(_.name == "SrcAddr").get.ftype === FType.Bytes)
    assert(fields.find(_.name == "SrcCountry").get.number === 100)
    assert(fields.forall(!_.repeated))
  }

  test("parity: descriptor decode equals the hand-rolled codec on the rich fuzz corpus") {
    val bases = FlowGen.flows(spark, 400, seed = 41).collect()
    bases.foreach { b0 =>
      val m = randomRich(b0)
      val bytes = ProtoCodec.encodeRich(m)
      val row = DescriptorCodec.decodeDynamic(Flow, byName, bytes)
      val want = expected(m)
      want.foreach { case (name, v) =>
        assert(rowValue(row, name) === v, s"field $name")
      }
      // ... and the hand-rolled rich decode agrees with the same bytes
      // (addresses modulo the FlowMessage-specific 16-byte pad)
      val hand = ProtoCodec.decodeRich(bytes)
      assert(hand.base.timeReceived === row.getAs[Long]("TimeReceived"))
      assert(hand.geo.srcCountry === row.getAs[String]("SrcCountry"))
      assert(hand.l2.srcMac === row.getAs[Long]("SrcMac"))
    }
  }

  test("fromWireDescriptor: framed payloads through the DataFrame path; lenient drops bad frames") {
    val msgs = FlowGen.flows(spark, 60, seed = 42).collect().toSeq
    val payloads = msgs.grouped(4)
      .map(_.flatMap(ProtoCodec.encodeDelimited).toArray).toSeq
    import spark.implicits._
    val df = payloads.toDF("value")
    val decoded = DescriptorCodec.fromWireDescriptor(
      df, "value", DescriptorCodec.flowDescriptorSet, Flow)
    assert(decoded.count() === 60)
    assert(decoded.columns.length === 67)
    // values parity with the typed path on the same payloads
    import org.apache.spark.sql.functions._
    val viaHand = ProtoCodec.fromWire(df, "value")
    assert(decoded.agg(sum("Bytes")).head().getLong(0)
      === viaHand.toDF().agg(sum("bytes")).head().getLong(0))
    assert(decoded.agg(sum(col("SrcPort").cast("long"))).head().getLong(0)
      === viaHand.toDF().agg(sum(col("srcPort").cast("long"))).head().getLong(0))
    // strict mode fails on garbage; lenient drops the bad payload whole
    val garbage = (payloads :+ Array[Byte](0x7F, 0x01, 0x02)).toDF("value")
    intercept[org.apache.spark.SparkException] {
      DescriptorCodec.fromWireDescriptor(garbage, "value",
        DescriptorCodec.flowDescriptorSet, Flow).count()
    }
    assert(DescriptorCodec.fromWireDescriptor(garbage, "value",
      DescriptorCodec.flowDescriptorSet, Flow, lenient = true).count() === 60)
  }

  test("schema evolution is a descriptor update: new fields appear, removed fields skip") {
    // tomorrow's schema: one extra field the codebase has never heard of
    val evolved = DescriptorCodec.buildDescriptorSet("flow2.proto", "flowprotob", Seq(
      MessageDesc("flowprotob.FlowMessage", Seq(
        FieldDesc("TimeReceived", 2, FType.UInt64),
        FieldDesc("Bytes", 9, FType.UInt64),
        FieldDesc("ObservationDomain", 70, FType.UInt32)))))
    val m = FlowGen.flows(spark, 1, seed = 43).head()
    val bytes = ProtoCodec.encode(m)
    val parsed = DescriptorCodec.parseDescriptorSet(evolved)
    val row = DescriptorCodec.decodeDynamic("flowprotob.FlowMessage", parsed, bytes)
    // known fields decode, the not-yet-sent field defaults, every OTHER
    // wire field (ports, addresses...) skips silently
    assert(row.getAs[Long]("TimeReceived") === m.timeReceived)
    assert(row.getAs[Long]("Bytes") === m.bytes)
    assert(row.getAs[Int]("ObservationDomain") === 0)
    assert(row.length === 3)
  }

  test("generic machinery: nested messages, packed + expanded repeated scalars, zigzag") {
    val set = DescriptorCodec.buildDescriptorSet("t.proto", "t", Seq(
      MessageDesc("t.Inner", Seq(
        FieldDesc("a", 1, FType.Int64), FieldDesc("s", 2, FType.String))),
      MessageDesc("t.Outer", Seq(
        FieldDesc("inner", 1, FType.Message, typeName = "t.Inner"),
        FieldDesc("xs", 2, FType.Int64, repeated = true),
        FieldDesc("z", 3, FType.SInt64),
        FieldDesc("f", 4, FType.Fixed32),
        FieldDesc("d", 5, FType.Double)))))
    val parsed = DescriptorCodec.parseDescriptorSet(set)
    assert(parsed.keySet === Set("t.Inner", "t.Outer"))
    // hand-build Outer wire bytes: nested Inner, xs packed [3,300,5] then
    // expanded 7, z = -4 zigzag, f fixed32, d double
    val o = new java.io.ByteArrayOutputStream()
    def vint(v: Long): Unit = { var x = v
      while ((x & ~0x7FL) != 0L) { o.write(((x & 0x7F) | 0x80).toInt); x >>>= 7 }
      o.write(x.toInt) }
    val inner = { val i = new java.io.ByteArrayOutputStream()
      i.write(Array[Byte](0x08, 0x2A), 0, 2) // a = 42
      i.write(0x12); i.write(2); i.write('h'); i.write('i') // s = "hi"
      i.toByteArray }
    vint((1L << 3) | 2); vint(inner.length); o.write(inner, 0, inner.length)
    val packed = { val p = new java.io.ByteArrayOutputStream()
      Seq(3L, 300L, 5L).foreach { v => var x = v
        while ((x & ~0x7FL) != 0L) { p.write(((x & 0x7F) | 0x80).toInt); x >>>= 7 }
        p.write(x.toInt) }
      p.toByteArray }
    vint((2L << 3) | 2); vint(packed.length); o.write(packed, 0, packed.length)
    vint(2L << 3); vint(7L) // expanded repeated element
    vint(3L << 3); vint(7L) // z = -4 → zigzag 7
    vint((4L << 3) | 5); o.write(Array[Byte](1, 0, 0, 0), 0, 4) // f = 1
    vint((5L << 3) | 1) // d = 2.0
    val dbits = java.lang.Double.doubleToLongBits(2.0)
    (0 until 8).foreach(i => o.write(((dbits >>> (8 * i)) & 0xFF).toInt))
    val row = DescriptorCodec.decodeDynamic("t.Outer", parsed, o.toByteArray)
    val inner0 = row.getAs[Row]("inner")
    assert(inner0.getAs[Long]("a") === 42L)
    assert(inner0.getAs[String]("s") === "hi")
    assert(row.getAs[Seq[Long]]("xs") === Seq(3L, 300L, 5L, 7L))
    assert(row.getAs[Long]("z") === -4L)
    assert(row.getAs[Int]("f") === 1)
    assert(row.getAs[Double]("d") === 2.0)
  }
}
