package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf
import graft.functions.IpCodec

/** The graft scalar function family (SURVEY.md §2.4 F6–F11,F15) as
  * session-independent `UserDefinedFunction`s, plus SQL registration.
  *
  * These start life as Scala UDFs — each sits inside a codegen'd projection
  * and the surrounding plan stays whole-stage; promote to native Catalyst
  * `Expression`s only if profiling shows UDF boxing on the hot path
  * (SURVEY.md §4 note).
  */
object GraftFunctions {

  private val ip4NtoaUdf: UserDefinedFunction = udf((n: Long) => IpCodec.ip4NumToString(n))
  private val ip4AtonUdf: UserDefinedFunction = udf((s: String) => IpCodec.ip4StringToNum(s))
  private val ip6NtoaUdf: UserDefinedFunction = udf((b: Array[Byte]) => IpCodec.ip6NumToString(b))
  private val ip6AtonUdf: UserDefinedFunction = udf((s: String) => IpCodec.ip6StringToNum(s))
  private val ipStringUdf: UserDefinedFunction = udf((b: Array[Byte]) => IpCodec.ipString(b))
  private val ip4ToBin16Udf: UserDefinedFunction = udf((n: Long) => IpCodec.ip4ToBin16(n))
  private val reinterpretUint32Udf: UserDefinedFunction = udf((b: Array[Byte]) => IpCodec.reinterpretUint32LE(b))

  /** IPv4 uint32 → dotted quad (ClickHouse IPv4NumToString). */
  def ip4_ntoa(c: Column): Column = ip4NtoaUdf(c)
  /** dotted quad → IPv4 uint32 (ClickHouse IPv4StringToNum). */
  def ip4_aton(c: Column): Column = ip4AtonUdf(c)
  /** 16-byte binary → RFC 5952 IPv6 text (ClickHouse IPv6NumToString). */
  def ip6_ntoa(c: Column): Column = ip6NtoaUdf(c)
  /** IPv6 text → 16-byte binary (ClickHouse IPv6StringToNum). */
  def ip6_aton(c: Column): Column = ip6AtonUdf(c)
  /** Go net.IP.String() semantics (inserter.go:131-134). */
  def ip_string(c: Column): Column = ipStringUdf(c)
  /** IPv4 uint32 → left-packed-LE 16-byte binary (README.md:186-202 convention). */
  def ip4_to_bin16(c: Column): Column = ip4ToBin16Udf(c)
  /** LE reinterpret of leading 4 bytes as uint32 (ClickHouse reinterpretAsUInt32). */
  def reinterpret_uint32(c: Column): Column = reinterpretUint32Udf(c)

  /** Register the family for SQL (`spark.sql("select ip4_ntoa(...)")`). */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("ip4_ntoa", ip4NtoaUdf)
    spark.udf.register("ip4_aton", ip4AtonUdf)
    spark.udf.register("ip6_ntoa", ip6NtoaUdf)
    spark.udf.register("ip6_aton", ip6AtonUdf)
    spark.udf.register("ip_string", ipStringUdf)
    spark.udf.register("ip4_to_bin16", ip4ToBin16Udf)
    spark.udf.register("reinterpret_uint32", reinterpretUint32Udf)
  }
}
