package graft.functions

/** Pure-JVM IP address codecs, mirroring the reference's ClickHouse
  * function surface and its Go inserter behavior:
  *
  *  - `IPv4NumToString` / `IPv4StringToNum` (`/root/reference/README.md:210,196`)
  *  - `IPv6NumToString` / `IPv6StringToNum` (`/root/reference/README.md:189,206`)
  *  - `reinterpretAsUInt32` over the 16-byte address — ClickHouse reinterpret
  *    is little-endian (`/root/reference/README.md:209`)
  *  - the storage convention: an IPv4 is packed *left-aligned, little-endian*
  *    into FixedString(16) (`/root/reference/README.md:186-202`)
  *  - Go `net.IP(bytes).String()` semantics used by the Postgres inserter
  *    (`/root/reference/inserter/inserter.go:131-134`): 4-byte and
  *    v4-mapped-16-byte render dotted-quad, everything else RFC 5952 IPv6.
  *
  * All functions are deterministic, null-free (callers guard), and cheap
  * enough to sit inside a codegen'd projection via UDF; they are
  * deliberately allocation-light for the 100 TB path.
  */
object IpCodec {

  /** uint32 (big-endian numeric value) → dotted quad. ClickHouse IPv4NumToString. */
  def ip4NumToString(n: Long): String = {
    val sb = new java.lang.StringBuilder(15)
    sb.append((n >>> 24) & 0xFF).append('.')
      .append((n >>> 16) & 0xFF).append('.')
      .append((n >>> 8) & 0xFF).append('.')
      .append(n & 0xFF)
    sb.toString
  }

  /** dotted quad → uint32. ClickHouse IPv4StringToNum. Returns -1 on
    * malformed input. split with limit -1 keeps trailing empty tokens
    * ("1.2.3.4." must NOT parse), and octets are validated char-by-char —
    * `toInt` would accept "+1". */
  def ip4StringToNum(s: String): Long = {
    if (s == null) return -1L
    val parts = s.split("\\.", -1)
    if (parts.length != 4) return -1L
    var n = 0L
    var i = 0
    while (i < 4) {
      val p = parts(i)
      if (p.isEmpty || p.length > 3) return -1L
      var v = 0
      var j = 0
      while (j < p.length) {
        val c = p.charAt(j)
        if (c < '0' || c > '9') return -1L
        v = v * 10 + (c - '0')
        j += 1
      }
      if (v > 255) return -1L
      n = (n << 8) | v
      i += 1
    }
    n
  }

  /** 16-byte address → RFC 5952 canonical IPv6 text (lowercase hex, no
    * leading zeros, longest zero-run — leftmost on ties, length ≥ 2 —
    * compressed to `::`). Matches ClickHouse IPv6NumToString output shape
    * (worked example `/root/reference/README.md:189-193`: left-packed
    * 192.168.1.1 renders as `101:a8c0::`).
    */
  def ip6NumToString(b: Array[Byte]): String = {
    require(b.length == 16, s"expected 16 bytes, got ${b.length}")
    val groups = new Array[Int](8)
    var i = 0
    while (i < 8) {
      groups(i) = ((b(2 * i) & 0xFF) << 8) | (b(2 * i + 1) & 0xFF)
      i += 1
    }
    // find longest run of zero groups (>= 2, leftmost wins)
    var bestStart = -1; var bestLen = 0
    var runStart = -1; var runLen = 0
    i = 0
    while (i < 8) {
      if (groups(i) == 0) {
        if (runStart < 0) { runStart = i; runLen = 0 }
        runLen += 1
        if (runLen > bestLen) { bestLen = runLen; bestStart = runStart }
      } else { runStart = -1; runLen = 0 }
      i += 1
    }
    if (bestLen < 2) { bestStart = -1 }
    val sb = new java.lang.StringBuilder(39)
    i = 0
    while (i < 8) {
      if (i == bestStart) {
        sb.append("::")
        i += bestLen
      } else {
        if (sb.length > 0 && sb.charAt(sb.length - 1) != ':') sb.append(':')
        sb.append(java.lang.Integer.toHexString(groups(i)))
        i += 1
      }
    }
    if (sb.length == 0) "::" else sb.toString
  }

  /** IPv6 text (with optional `::` compression) → 16 bytes. ClickHouse
    * IPv6StringToNum. Hand-parsed — no InetAddress, which may attempt
    * resolution on malformed literals. Returns null on malformed input.
    */
  def ip6StringToNum(s: String): Array[Byte] = {
    if (s == null) return null
    // embedded-IPv4 form ("::ffff:192.168.0.1", ClickHouse accepts it):
    // parse the dotted tail as v4 and substitute its two hex groups
    if (s.indexOf('.') >= 0) {
      val lastColon = s.lastIndexOf(':')
      // bare dotted quad: ClickHouse's IPv6StringToNum maps it to the
      // ::ffff: IPv4-mapped form rather than rejecting it
      if (lastColon < 0) return ip6StringToNum("::ffff:" + s)
      val v4 = ip4StringToNum(s.substring(lastColon + 1))
      if (v4 < 0) return null
      return ip6StringToNum(s.substring(0, lastColon + 1) +
        java.lang.Integer.toHexString(((v4 >> 16) & 0xFFFF).toInt) + ":" +
        java.lang.Integer.toHexString((v4 & 0xFFFF).toInt))
    }
    val out = new Array[Byte](16)
    val dcol = s.indexOf("::")
    def parseGroups(str: String): Array[Int] = {
      if (str.isEmpty) return Array.emptyIntArray
      // limit -1 keeps trailing empty tokens: "::1:" and ":::" must fail,
      // and every group must be pure hex (parseInt alone accepts "+1"/"-1")
      val parts = str.split(":", -1)
      val gs = new Array[Int](parts.length)
      var i = 0
      while (i < parts.length) {
        val p = parts(i)
        if (p.isEmpty || p.length > 4) return null
        var j = 0
        while (j < p.length) {
          if (Character.digit(p.charAt(j), 16) < 0) return null
          j += 1
        }
        gs(i) = java.lang.Integer.parseInt(p, 16)
        i += 1
      }
      gs
    }
    val (head, tail) =
      if (dcol >= 0) (parseGroups(s.substring(0, dcol)), parseGroups(s.substring(dcol + 2)))
      else (parseGroups(s), Array.emptyIntArray)
    if (head == null || tail == null) return null
    val total = head.length + tail.length
    if (dcol < 0 && total != 8) return null
    if (dcol >= 0 && total > 7) return null
    var i = 0
    while (i < head.length) { out(2 * i) = (head(i) >> 8).toByte; out(2 * i + 1) = head(i).toByte; i += 1 }
    i = 0
    val off = 8 - tail.length
    while (i < tail.length) { out(2 * (off + i)) = (tail(i) >> 8).toByte; out(2 * (off + i) + 1) = tail(i).toByte; i += 1 }
    out
  }

  /** Little-endian reinterpret of the first 4 bytes as uint32 — ClickHouse
    * `reinterpretAsUInt32(substring(...))` (`/root/reference/README.md:209`,
    * dashboard usage `/root/reference/compose/grafana/dashboards/viz-ch.json:233`).
    */
  def reinterpretUint32LE(b: Array[Byte]): Long = {
    require(b.length >= 4, s"expected >=4 bytes, got ${b.length}")
    (b(0) & 0xFFL) | ((b(1) & 0xFFL) << 8) | ((b(2) & 0xFFL) << 16) | ((b(3) & 0xFFL) << 24)
  }

  /** Pack a uint32 IPv4 left-aligned little-endian into 16 bytes — the
    * reference storage convention for v4 in FixedString(16)
    * (`/root/reference/README.md:193`: 3232235777 stores as 0101a8c0 then
    * twelve zero bytes).
    */
  def ip4ToBin16(n: Long): Array[Byte] = {
    val out = new Array[Byte](16)
    out(0) = (n & 0xFF).toByte
    out(1) = ((n >>> 8) & 0xFF).toByte
    out(2) = ((n >>> 16) & 0xFF).toByte
    out(3) = ((n >>> 24) & 0xFF).toByte
    out
  }

  /** Go `net.IP(bytes).String()` semantics (`inserter.go:131-134`): 4-byte →
    * dotted quad; 16-byte v4-mapped (::ffff:a.b.c.d) → dotted quad; other
    * 16-byte → RFC 5952; anything else → "?". Null/empty → null (callers
    * apply the reference's `0.0.0.0` default via coalesce, `inserter.go:135-140`).
    */
  def ipString(b: Array[Byte]): String = {
    if (b == null || b.length == 0) return null
    if (b.length == 4)
      return ip4NumToString(((b(0) & 0xFFL) << 24) | ((b(1) & 0xFFL) << 16) | ((b(2) & 0xFFL) << 8) | (b(3) & 0xFFL))
    if (b.length != 16) return "?"
    var i = 0
    var v4mapped = true
    while (i < 10) { if (b(i) != 0) v4mapped = false; i += 1 }
    if (v4mapped && (b(10) & 0xFF) == 0xFF && (b(11) & 0xFF) == 0xFF)
      ip4NumToString(((b(12) & 0xFFL) << 24) | ((b(13) & 0xFFL) << 16) | ((b(14) & 0xFFL) << 8) | (b(15) & 0xFFL))
    else ip6NumToString(b)
  }
}
