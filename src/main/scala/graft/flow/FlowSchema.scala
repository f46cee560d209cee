package graft.flow

import org.apache.spark.sql.types._

/** The flow record data model.
  *
  * Mirrors the reference wire schema field-by-field
  * (`/root/reference/pb-ext/flow.proto:7-65`) and the columnar raw table
  * (`/root/reference/compose/clickhouse/create.sh:36-62`). Unsigned proto
  * ints map to the next-wider signed Spark type (SURVEY.md §1.2): values are
  * physically far below 2^63 so LongType is safe; 16-byte addresses are
  * BinaryType with the IPv4-left-packed convention
  * (`/root/reference/README.md:186-202`) handled by the codec functions in
  * [[graft.GraftFunctions]].
  */
final case class FlowMessage(
    flowType: Int,            // enum FlowType: flow.proto:9-16
    timeReceived: Long,       // epoch seconds
    sequenceNum: Long,
    samplingRate: Long,
    samplerAddress: Array[Byte],
    timeFlowStart: Long,
    timeFlowEnd: Long,
    bytes: Long,
    packets: Long,
    srcAddr: Array[Byte],     // 16 bytes, v4 left-packed
    dstAddr: Array[Byte],
    etype: Int,               // 0x0800 v4 / 0x86DD v6
    proto: Int,
    srcPort: Int,
    dstPort: Int,
    srcAS: Int,
    dstAS: Int)

object FlowSchema {
  /** FlowType enum constants (flow.proto:9-16). */
  object FlowType {
    val FlowUnknown = 0
    val SFlow5      = 1
    val NetFlowV5   = 2
    val NetFlowV9   = 3
    val IPFIX       = 4
  }

  val EtypeIPv4 = 0x0800
  val EtypeIPv6 = 0x86DD

  /** StructType of the raw flow table, lower_snake column names for the SQL
    * surface (matches the Postgres DDL naming style,
    * `/root/reference/compose/postgres/create.sh:5-24`).
    */
  val raw: StructType = StructType(Seq(
    StructField("flow_type", IntegerType),
    StructField("time_received", LongType),
    StructField("sequence_num", LongType),
    StructField("sampling_rate", LongType),
    StructField("sampler_address", BinaryType),
    StructField("time_flow_start", LongType),
    StructField("time_flow_end", LongType),
    StructField("bytes", LongType),
    StructField("packets", LongType),
    StructField("src_addr", BinaryType),
    StructField("dst_addr", BinaryType),
    StructField("etype", IntegerType),
    StructField("proto", IntegerType),
    StructField("src_port", IntegerType),
    StructField("dst_port", IntegerType),
    StructField("src_as", IntegerType),
    StructField("dst_as", IntegerType)))
}
