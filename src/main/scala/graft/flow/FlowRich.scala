package graft.flow

/** The FULL production wire schema — every field of the reference's
  * extended FlowMessage (`/root/reference/pb-ext/flow.pb.go:57-147`,
  * fields 1-64 plus the 100-103 enrichment block) — as typed Scala
  * records, grouped by concern the way the proto comments group them
  * (routing / L2 / IP-transport / encapsulation / MPLS / PPP / geo).
  *
  * The light consumer ([[FlowMessage]], 17 fields) stays the default: no
  * reference dashboard queries these fields, so decoding them is opt-in
  * (`ProtoCodec.decodeRich`) — the proto3 wire format makes both views of
  * the same bytes valid (unknown fields skip; absent fields default).
  * Nested groups keep the record navigable AND encode cleanly as Spark
  * struct columns if a pipeline materializes them.
  *
  * Unsigned caveat (same as the base record): proto uint32 fields ride in
  * Int columns bit-preserving (values ≥ 2³¹ appear negative); uint64 in
  * Long. Render with the `reinterpret` codec functions where display
  * matters — the reference's ClickHouse schema makes the same choice.
  */
object FlowRich {

  /** Routing context: BGP next hop, prefix lengths, interfaces, VRFs,
    * direction flags (fields 12-13, 16-19, 39-42). */
  final case class RoutingInfo(
      nextHop: Array[Byte], nextHopAS: Int, srcNet: Int, dstNet: Int,
      inIf: Int, outIf: Int, ingressVrfId: Int, egressVrfId: Int,
      biFlowDirection: Int, flowDirection: Int)

  /** L2: MACs and VLANs (fields 27-29, 33-34). */
  final case class L2Info(srcMac: Long, dstMac: Long,
      srcVlan: Int, dstVlan: Int, vlanId: Int)

  /** IP/transport detail: ToS, TTL, TCP flags, ICMP, v6 flow label,
    * fragmentation (fields 23-26, 31-32, 35-37). */
  final case class IpInfo(ipTos: Int, forwardingStatus: Int, ipTtl: Int,
      tcpFlags: Int, icmpType: Int, icmpCode: Int, ipv6FlowLabel: Int,
      fragmentId: Int, fragmentOffset: Int)

  /** Tunnel/encapsulation inner header (fields 43-52). */
  final case class EncapInfo(hasEncap: Boolean,
      srcAddrEncap: Array[Byte], dstAddrEncap: Array[Byte],
      protoEncap: Int, etypeEncap: Int, ipTosEncap: Int, ipTtlEncap: Int,
      ipv6FlowLabelEncap: Int, fragmentIdEncap: Int, fragmentOffsetEncap: Int)

  /** MPLS label stack, first three + last (fields 53-62). */
  final case class MplsInfo(hasMpls: Boolean, mplsCount: Int,
      mpls1Ttl: Int, mpls1Label: Int, mpls2Ttl: Int, mpls2Label: Int,
      mpls3Ttl: Int, mpls3Label: Int, mplsLastTtl: Int, mplsLastLabel: Int)

  /** PPP framing (fields 63-64). */
  final case class PppInfo(hasPpp: Boolean, pppAddressControl: Int)

  /** Enrichment block, the fields the processor roadmap appends
    * (fields 100-103 — same block [[FlowEnrich.FlowMessageExt]] carries). */
  final case class GeoInfo(srcCountry: String, dstCountry: String,
      srcAsdb: Int, dstAsdb: Int)

  /** One wire message, fully decoded. */
  final case class FlowMessageRich(base: FlowMessage, routing: RoutingInfo,
      l2: L2Info, ip: IpInfo, encap: EncapInfo, mpls: MplsInfo,
      ppp: PppInfo, geo: GeoInfo)

  val emptyRouting: RoutingInfo = RoutingInfo(null, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  val emptyL2: L2Info = L2Info(0L, 0L, 0, 0, 0)
  val emptyIp: IpInfo = IpInfo(0, 0, 0, 0, 0, 0, 0, 0, 0)
  val emptyEncap: EncapInfo = EncapInfo(false, null, null, 0, 0, 0, 0, 0, 0, 0)
  val emptyMpls: MplsInfo = MplsInfo(false, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  val emptyPpp: PppInfo = PppInfo(false, 0)
  val emptyGeo: GeoInfo = GeoInfo("", "", 0, 0)

  /** A base-only view of rich bytes: everything beyond the 17 light fields
    * at proto3 defaults. */
  def ofBase(m: FlowMessage): FlowMessageRich =
    FlowMessageRich(m, emptyRouting, emptyL2, emptyIp, emptyEncap,
      emptyMpls, emptyPpp, emptyGeo)
}
