package graft

import graft.flow.{FlowGen, FlowMessage}
import graft.flow.FlowRich._
import graft.sources.ProtoCodec

/** Full production-schema codec: fields 1-64 + 100-103
  * (`/root/reference/pb-ext/flow.pb.go:57-147`). */
class FlowRichSpec extends SparkTestBase {

  private def bseq(b: Array[Byte]): Seq[Byte] = if (b == null) Nil else b.toSeq

  /** Structural equality with array fields canonicalized (null ≡ empty:
    * proto3 elides empty bytes, so they decode back as null). */
  private def assertSameRich(a: FlowMessageRich, b: FlowMessageRich): Unit = {
    assert(bseq(a.routing.nextHop) === bseq(b.routing.nextHop), "nextHop")
    assert(bseq(a.encap.srcAddrEncap) === bseq(b.encap.srcAddrEncap), "srcAddrEncap")
    assert(bseq(a.encap.dstAddrEncap) === bseq(b.encap.dstAddrEncap), "dstAddrEncap")
    assert(a.routing.copy(nextHop = null) === b.routing.copy(nextHop = null))
    assert(a.l2 === b.l2); assert(a.ip === b.ip)
    assert(a.encap.copy(srcAddrEncap = null, dstAddrEncap = null)
      === b.encap.copy(srcAddrEncap = null, dstAddrEncap = null))
    assert(a.mpls === b.mpls); assert(a.ppp === b.ppp); assert(a.geo === b.geo)
    // base block: reuse the light record's own round-trip invariants
    assert(a.base.copy(srcAddr = null, dstAddr = null, samplerAddress = null)
      === b.base.copy(srcAddr = null, dstAddr = null, samplerAddress = null))
  }

  private val rnd = new scala.util.Random(77231)
  private def ru32(): Int = rnd.nextInt(4) match {
    case 0 => 0
    case 1 => rnd.nextInt(1 << 12)
    case 2 => Int.MaxValue - rnd.nextInt(3)
    case _ => -1 - rnd.nextInt(1000) // uint32 ≥ 2³¹ riding Int bit-preserving
  }
  private def rbytes(max: Int): Array[Byte] = rnd.nextInt(3) match {
    case 0 => null
    case 1 => Array.fill(1 + rnd.nextInt(max))(rnd.nextInt(256).toByte)
    case _ => new Array[Byte](0) // empty elides → decodes as null
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

  test("property: rich round-trip over the full extended field set (seeded fuzz)") {
    val bases = FlowGen.flows(spark, 400, seed = 31).collect()
    bases.foreach { b =>
      val m = randomRich(b)
      assertSameRich(ProtoCodec.decodeRich(ProtoCodec.encodeRich(m)), m)
    }
  }

  test("base decode of rich bytes sees exactly the light fields (forward compat)") {
    val bases = FlowGen.flows(spark, 100, seed = 32).collect()
    bases.foreach { b =>
      val rich = randomRich(b)
      val light = ProtoCodec.decode(ProtoCodec.encodeRich(rich))
      assert(light.copy(srcAddr = null, dstAddr = null, samplerAddress = null)
        === b.copy(srcAddr = null, dstAddr = null, samplerAddress = null))
    }
  }

  test("rich decode of base bytes yields proto3 defaults beyond the light fields") {
    val b = FlowGen.flows(spark, 1, seed = 33).collect().head
    val rich = ProtoCodec.decodeRich(ProtoCodec.encode(b))
    assert(rich.routing === emptyRouting)
    assert(rich.l2 === emptyL2); assert(rich.ip === emptyIp)
    assert(rich.encap === emptyEncap); assert(rich.mpls === emptyMpls)
    assert(rich.ppp === emptyPpp); assert(rich.geo === emptyGeo)
  }

  test("all-defaults rich record is byte-identical to its base encoding") {
    val b = FlowGen.flows(spark, 1, seed = 34).collect().head
    assert(ProtoCodec.encodeRich(ofBase(b)).toSeq === ProtoCodec.encode(b).toSeq)
  }

  test("ext (fields 100-103) and rich decoders agree on the same wire bytes") {
    val b = FlowGen.flows(spark, 50, seed = 35).collect()
    b.foreach { base =>
      val rich = randomRich(base)
      val bytes = ProtoCodec.encodeRich(rich)
      val ext = ProtoCodec.decodeExt(bytes)
      assert(ext.srcCountry === rich.geo.srcCountry)
      assert(ext.dstCountry === rich.geo.dstCountry)
      assert(ext.srcASDB === rich.geo.srcAsdb)
      assert(ext.dstASDB === rich.geo.dstAsdb)
    }
  }
}
