package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.IpCodec._

/** Known-answer vectors from the reference's worked examples
  * (`/root/reference/README.md:186-215`) plus seeded round-trip properties.
  */
class IpCodecSpec extends AnyFunSuite {

  test("ip4 aton/ntoa known vectors (README.md:196,210)") {
    assert(ip4StringToNum("192.168.1.1") === 3232235777L)
    assert(ip4NumToString(3232235777L) === "192.168.1.1")
    assert(ip4NumToString(0L) === "0.0.0.0")
    assert(ip4NumToString(4294967295L) === "255.255.255.255")
    assert(ip4StringToNum("256.0.0.1") === -1L)
    assert(ip4StringToNum("1.2.3") === -1L)
  }

  test("v4 left-packed into 16 bytes renders 101:a8c0:: (README.md:189-193)") {
    val b = ip4ToBin16(3232235777L)
    assert(b.take(4).map(_ & 0xFF).toSeq === Seq(0x01, 0x01, 0xA8, 0xC0))
    assert(b.drop(4).forall(_ == 0))
    assert(ip6NumToString(b) === "101:a8c0::")
  }

  test("reinterpretAsUInt32 is little-endian (README.md:209)") {
    assert(reinterpretUint32LE(ip4ToBin16(3232235777L)) === 3232235777L)
    assert(reinterpretUint32LE(Array[Byte](1, 0, 0, 0)) === 1L)
    assert(reinterpretUint32LE(Array(0, 0, 0, 0x80).map(_.toByte)) === 0x80000000L)
  }

  test("ip6 ntoa canonical form and round trip (README.md:155-161)") {
    val addr = ip6StringToNum("2001:db8:0:1::80")
    assert(addr !== null)
    assert(addr.map(_ & 0xFF).toSeq === Seq(0x20, 0x01, 0x0d, 0xb8, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0x80))
    assert(ip6NumToString(addr) === "2001:db8:0:1::80")
    assert(ip6NumToString(new Array[Byte](16)) === "::")
    assert(ip6NumToString(ip6StringToNum("::1")) === "::1")
    assert(ip6NumToString(ip6StringToNum("fe80::")) === "fe80::")
    // RFC 5952: longest zero run compressed, leftmost on tie
    assert(ip6NumToString(ip6StringToNum("1:0:0:2:0:0:0:3")) === "1:0:0:2::3")
    assert(ip6NumToString(ip6StringToNum("1:0:0:2:3:0:0:4")) === "1::2:3:0:0:4")
    // single zero group is not compressed
    assert(ip6NumToString(ip6StringToNum("2001:db8:0:1:1:1:1:1")) === "2001:db8:0:1:1:1:1:1")
  }

  test("ip6 aton rejects malformed input") {
    assert(ip6StringToNum("2001:db8") === null)
    assert(ip6StringToNum("1:2:3:4:5:6:7:8:9") === null)
    assert(ip6StringToNum("zzzz::") === null)
    // r7 review: Java split/parseInt leniency let these through
    assert(ip6StringToNum("-1::") === null, "signed hex group")
    assert(ip6StringToNum("+1::") === null)
    assert(ip6StringToNum("::1:") === null, "trailing colon")
    assert(ip6StringToNum(":::") === null)
  }

  test("ip6 aton accepts the embedded-IPv4 form (ClickHouse parity)") {
    val b = ip6StringToNum("::ffff:192.168.0.1")
    assert(b !== null)
    assert(b.slice(10, 16).map(_ & 0xFF).toSeq === Seq(0xFF, 0xFF, 192, 168, 0, 1))
    assert(b.take(10).forall(_ === 0))
    assert(ip6StringToNum("::ffff:300.0.0.1") === null, "invalid embedded octet")
    // bare dotted quad maps to ::ffff:1.2.3.4 (ClickHouse behavior)
    val bare = ip6StringToNum("1.2.3.4")
    assert(bare !== null)
    assert(bare.slice(10, 16).map(_ & 0xFF).toSeq === Seq(0xFF, 0xFF, 1, 2, 3, 4))
  }

  test("ip4 aton rejects trailing dots and signed octets (r7 review)") {
    assert(ip4StringToNum("1.2.3.4.") === -1L)
    assert(ip4StringToNum("1.2.3.4....") === -1L)
    assert(ip4StringToNum("+1.2.3.4") === -1L)
    assert(ip4StringToNum("1.2.3.+4") === -1L)
    assert(ip4StringToNum("1.2.3.4") === 16909060L, "plain quad still parses")
    assert(ip4StringToNum("001.002.003.004") === 16909060L, "leading zeros allowed")
  }

  test("Go net.IP.String() semantics (inserter.go:131-140)") {
    assert(ipString(Array(192, 168, 1, 1).map(_.toByte)) === "192.168.1.1")
    val v4mapped = new Array[Byte](16)
    v4mapped(10) = 0xFF.toByte; v4mapped(11) = 0xFF.toByte
    v4mapped(12) = 10; v4mapped(13) = 0; v4mapped(14) = 0; v4mapped(15) = 1
    assert(ipString(v4mapped) === "10.0.0.1")
    assert(ipString(ip6StringToNum("2001:db8:0:1::80")) === "2001:db8:0:1::80")
    assert(ipString(null) === null)
    assert(ipString(Array.emptyByteArray) === null)
    assert(ipString(Array[Byte](1, 2, 3)) === "?")
  }

  test("property: ip4 round-trip over full uint32 range") {
    val rnd = new scala.util.Random(42)
    (0 until 2000).foreach { _ =>
      val n = rnd.nextLong().abs % 4294967296L
      assert(ip4StringToNum(ip4NumToString(n)) === n)
      assert(reinterpretUint32LE(ip4ToBin16(n)) === n)
    }
    Seq(0L, 1L, 4294967295L, 0x80000000L).foreach { n =>
      assert(ip4StringToNum(ip4NumToString(n)) === n)
    }
  }

  test("property: ip6 ntoa/aton round-trip over random 16-byte addresses") {
    val rnd = new scala.util.Random(42)
    (0 until 2000).foreach { i =>
      val b = new Array[Byte](16)
      rnd.nextBytes(b)
      // sparse addresses exercise the zero-run compression paths
      if (i % 3 == 0) (0 until 16).foreach(j => if (rnd.nextBoolean()) b(j) = 0)
      if (i % 5 == 0) java.util.Arrays.fill(b, 4, 14, 0.toByte)
      assert(ip6StringToNum(ip6NumToString(b)).toSeq === b.toSeq, s"bytes=${b.mkString(",")}")
    }
  }
}
