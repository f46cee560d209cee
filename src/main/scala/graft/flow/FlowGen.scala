package graft.flow

import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic, distributed flow-record generator — the mocker equivalent
  * (`/root/reference/mocker/mocker.go:54-90`) with two deliberate upgrades:
  * an explicit seed (the reference uses unseeded global rand — SURVEY.md §3
  * E1) and distributed generation (`spark.range` → per-id avalanche hash, no
  * driver-side loop), so a 10^12-row corpus generates in parallel at
  * cluster scale.
  *
  * Field distributions mirror the reference's shapes: bytes ∈ [0,1500),
  * packets ∈ [0,100), AS ∈ {65000,65001,65002}, EType=0x86DD, addresses in
  * 2001:db8::/120 with one random last byte (`mocker.go:59-90`).
  */
object FlowGen {

  /** splitmix64 avalanche — public-domain PRNG construction. */
  private def mix(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def addr(lastByte: Int): Array[Byte] = {
    // 2001:db8:0:1::/120 + random last byte (mocker.go:64-71 shape)
    val b = new Array[Byte](16)
    b(0) = 0x20; b(1) = 0x01; b(2) = 0x0d; b(3) = 0xb8.toByte
    b(6) = 0x00; b(7) = 0x01
    b(15) = lastByte.toByte
    b
  }

  /** n deterministic flow records starting at epoch second `baseTime`,
    * `ratePerSec` records per second of event time. `numPartitions > 0`
    * overrides the default split count (values depend only on the id, so
    * partitioning never changes the data). */
  def flows(spark: SparkSession, n: Long, seed: Long = 42L,
      baseTime: Long = 1704067200L, ratePerSec: Long = 100L,
      numPartitions: Int = 0): Dataset[FlowMessage] = {
    import spark.implicits._
    val ids = if (numPartitions > 0) spark.range(0L, n, 1L, numPartitions) else spark.range(n)
    ids.map { i =>
      val h = mix(seed ^ i)
      def field(k: Int): Long = mix(h + k) & Long.MaxValue
      val t = baseTime + i / ratePerSec
      FlowMessage(
        flowType = FlowSchema.FlowType.SFlow5,
        timeReceived = t,
        sequenceNum = i,
        samplingRate = 1L,
        samplerAddress = new Array[Byte](16),
        timeFlowStart = t,
        timeFlowEnd = t,
        bytes = field(1) % 1500L,
        packets = field(2) % 100L,
        srcAddr = addr((field(3) % 250L).toInt),
        dstAddr = addr((field(4) % 250L).toInt),
        etype = FlowSchema.EtypeIPv6,
        proto = 0,
        srcPort = (field(5) & 0xFFFFL).toInt,
        dstPort = (field(6) & 0xFFFFL).toInt,
        srcAS = (65000L + field(7) % 3L).toInt,
        dstAS = (65000L + field(8) % 3L).toInt)
    }
  }
}
