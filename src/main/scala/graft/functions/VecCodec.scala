package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Static kernel behind [[Int8Codes]] — symmetric int8 quantization of a
  * float vector in TWO tight primitive passes (max|v|, then
  * trunc-toward-zero of v/(max/127)).
  *
  * Exists because the HOF spelling
  * (`transform(v, x -> cast(x/ (array_max(transform(v, abs))/127) as long))`)
  * evaluates INTERPRETED — Catalyst higher-order functions never enter
  * whole-stage codegen, and each of the three lambda passes allocates and
  * boxes per element. Measured at 2M×64-dim (r13): the codes projection
  * dominated every int8-family operator identically (~21–25 s of a
  * gram/centroid/norm query each; the downstream folds were noise).
  *
  * Semantics contract (must stay bit-identical to the HOF twin, which the
  * DuckDB oracles mirror): per-element `abs(double)` max — NaN ranks
  * greatest, matching Spark's `array_max` ordering; `max` NULL-or-zero
  * (empty/all-zero vector) → all-zero codes; otherwise
  * `(double(x) / (max/127)).toLong` (Java double→long truncates toward
  * zero, = the non-ANSI `cast(.. as long)`). Null ELEMENTS read as 0.0 —
  * the testdata and generator never produce them; the HOF twin would emit
  * a null code there instead, and the parity spec pins the no-null-element
  * regime both engines actually run.
  */
object VecCodec {
  def int8Codes(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val out = new Array[Long](n)
    var mx = 0.0
    var i = 0
    while (i < n) {
      val a = if (v.isNullAt(i)) 0.0 else math.abs(v.getFloat(i).toDouble)
      if (java.lang.Double.isNaN(a) || a > mx) mx = a
      i += 1
    }
    if (mx > 0.0 || java.lang.Double.isNaN(mx)) {
      val scale = mx / 127.0
      i = 0
      while (i < n) {
        val x = if (v.isNullAt(i)) 0.0 else v.getFloat(i).toDouble
        out(i) = (x / scale).toLong
        i += 1
      }
    }
    new GenericArrayData(out)
  }
}

/** Static kernels for the integer vector reductions the int8 family
  * folds through — same rationale as [[VecCodec.int8Codes]]: the
  * `aggregate`/`zip_with` HOF spellings evaluate interpreted per element.
  */
object VecKernels {
  /** Σ a_i·b_i. Lengths must match (the int8 operators only ever dot
    * same-corpus codes); a silent zip-truncate would mis-score. */
  def dotLongs(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"dot_longs: length mismatch ($n vs ${b.numElements()})")
    var acc = 0L
    var i = 0
    while (i < n) { acc += a.getLong(i) * b.getLong(i); i += 1 }
    acc
  }

  /** Σ a_i². */
  def sumSqLongs(a: ArrayData): Long = {
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) { val x = a.getLong(i); acc += x * x; i += 1 }
    acc
  }

  /** TYPED rejection of null elements — the guard the long-vector
    * expressions/aggregates run when (and only when) the input TYPE
    * admits nulls (`containsNull=true`: parquet round-trips, SQL array
    * literals with NULL). Without it `getLong` silently reads 0 and
    * `toLongArray` throws an opaque NPE (the r13 advice finding). The
    * int8_codes-produced path declares containsNull=false and never
    * pays this scan. */
  def assertDense(a: ArrayData, fn: String): Unit = {
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) throw new IllegalArgumentException(
        s"$fn: null element at index $i — long-vector kernels need dense " +
          "arrays; array_compact or coalesce the elements upstream")
      i += 1
    }
  }

  def dotLongsChecked(a: ArrayData, b: ArrayData): Long = {
    assertDense(a, "dot_longs"); assertDense(b, "dot_longs"); dotLongs(a, b)
  }

  def sumSqLongsChecked(a: ArrayData): Long = {
    assertDense(a, "sum_sq_longs"); sumSqLongs(a)
  }
}

/** `dot_longs(array<bigint>, array<bigint>)` → bigint — native integer
  * dot product (codegen'd; replaces `aggregate(zip_with(a, b, *), +)`). */
case class DotLongs(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"dot_longs needs two array<bigint>, got $other")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_longs"

  // plan-time routing: the checked twin (null-element scan + typed error)
  // only when either input TYPE admits null elements — zero cost on the
  // int8_codes path, a clean error instead of silent 0s on arbitrary SQL
  private lazy val kernel: String =
    if (left.dataType.asInstanceOf[ArrayType].containsNull ||
        right.dataType.asInstanceOf[ArrayType].containsNull) "dotLongsChecked"
    else "dotLongs"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (kernel == "dotLongs")
      VecKernels.dotLongs(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      VecKernels.dotLongsChecked(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecKernels.$kernel($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotLongs =
    copy(left = newLeft, right = newRight)
}

/** `sum_sq_longs(array<bigint>)` → bigint — native Σx² (codegen'd;
  * replaces `aggregate(a, 0, (acc, x) -> acc + x*x)`). */
case class SumSqLongs(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sum_sq_longs needs array<bigint>, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "sum_sq_longs"

  // see DotLongs.kernel — checked twin only for containsNull=true inputs
  private lazy val kernel: String =
    if (child.dataType.asInstanceOf[ArrayType].containsNull) "sumSqLongsChecked"
    else "sumSqLongs"

  override protected def nullSafeEval(input: Any): Any =
    if (kernel == "sumSqLongs") VecKernels.sumSqLongs(input.asInstanceOf[ArrayData])
    else VecKernels.sumSqLongsChecked(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VecKernels.$kernel($c)")

  override protected def withNewChildInternal(newChild: Expression): SumSqLongs =
    copy(child = newChild)
}

/** `bigrams(array<string>)` → `array<string>` — adjacent-token bigrams
  * ("tok_i tok_i+1"), the native codegen'd form of
  * `transform(sequence(1, n-1), i -> concat_ws(' ', slice(t, i, 2)))`.
  * That HOF spelling evaluates interpreted and allocates a sequence
  * array plus a 2-slice per gram; this is one pass of
  * `UTF8String.concat` calls. Parity contract: identical output for
  * non-null tokens (the `split`-produced arrays these operators feed it
  * never contain nulls); a null token would concat as empty under
  * concat_ws vs null-propagate here, pinned out of scope by the spec.
  * Inputs with < 2 tokens yield an empty array (the HOF's
  * `sequence(1, 0)` case). */
object TextKernels {
  private val Space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  private val Empty = org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8

  def bigrams(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    // null token elements (never produced by split(), but the SQL-registered
    // form accepts arbitrary array<string>) substitute "" — concat would
    // otherwise return null into a containsNull=false array, which codegen
    // downstream is allowed to read as garbage
    var prev = { val t = toks.getUTF8String(0); if (t == null) Empty else t }
    var i = 1
    while (i < n) {
      val cur = { val t = toks.getUTF8String(i); if (t == null) Empty else t }
      out(i - 1) = org.apache.spark.unsafe.types.UTF8String.concat(prev, Space, cur)
      prev = cur
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `shingles3(string)` → `array<string>` — distinct 3-word shingles
  * (space-joined, first-occurrence order), the native form of
  * [[graft.operators.Dedup]]'s shingle UDF. The UDF pays a
  * UTF8String→String decode of the whole document, a Java-regex split,
  * per-shingle String concats, and a CatalystTypeConverters round-trip
  * on the returned Seq; this kernel splits the raw bytes on Java's
  * `\s` class ([ \t\n\x0B\f\r] — byte-for-byte the `"\\s+"` regex the
  * UDF used, and the corpus carries no \x0B for the RE2 oracle to
  * diverge on), concats UTF8Strings directly, and dedups via a HashSet
  * of UTF8String (its hashCode/equals are byte-wise). `trim` parity:
  * the leading/trailing strip drops EVERY byte <= 0x20 — `String.trim`'s
  * exact contract (it strips chars <= U+0020, a superset of `\s`: NUL,
  * \x01–\x08, \x0E–\x1F too) — so a doc with a leading/trailing sub-0x20
  * control char tokenizes identically to `split(trim(text), "\\s+")`;
  * INTERIOR control chars are non-whitespace for the split, as in the
  * UDF. < 3 tokens → empty array. */
object ShingleKernel {
  private val Space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  // String.trim strips chars <= U+0020; in UTF-8 those are exactly the
  // single bytes 0x00..0x20 (multi-byte sequence bytes are >= 0x80 and
  // read negative here, so they never match)
  private def isTrimmable(b: Byte): Boolean = b >= 0 && b <= 0x20

  def shingles3(text: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    var nBytes = text.numBytes()
    // trim parity first: skip leading/trailing bytes <= 0x20, THEN
    // tokenize the interior on the 6-byte \s class
    var lo = 0
    while (lo < nBytes && isTrimmable(text.getByte(lo))) lo += 1
    while (nBytes > lo && isTrimmable(text.getByte(nBytes - 1))) nBytes -= 1
    val toks = new java.util.ArrayList[org.apache.spark.unsafe.types.UTF8String]()
    var i = lo
    while (i < nBytes) {
      while (i < nBytes && isWs(text.getByte(i))) i += 1
      if (i < nBytes) {
        val start = i
        while (i < nBytes && !isWs(text.getByte(i))) i += 1
        // zero-copy byte-range view (safe: ASCII whitespace bytes never
        // occur inside a UTF-8 multi-byte sequence, so [start, i) is
        // always a valid UTF-8 boundary pair)
        toks.add(org.apache.spark.unsafe.types.UTF8String.fromAddress(
          text.getBaseObject, text.getBaseOffset + start, i - start))
      }
    }
    val n = toks.size()
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
    i = 0
    while (i + 2 < n) {
      seen.add(org.apache.spark.unsafe.types.UTF8String.concat(
        toks.get(i), Space, toks.get(i + 1), Space, toks.get(i + 2)))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }
}

/** See [[ShingleKernel.shingles3]]. Marked NON-deterministic for the same
  * optimizer-barrier reason as the UDF it replaces: without it,
  * InferFiltersFromGenerate + pushdown substitute the expression into
  * inferred `size(..) > 0` filters below the projection and the shingle
  * build runs 3× per row. The kernel is pure; the flag only pins WHERE
  * it evaluates. */
case class Shingles3(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingles3 needs string, got $other")
  }
  override lazy val deterministic: Boolean = false
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "shingles3"
  // nullSafeEval returns null for null text; Dedup's textDigest-keyed
  // callers coalesce that to empty upstream (the UDF returned Seq.empty —
  // withShingles wraps with a coalesce to preserve that contract)
  override protected def nullSafeEval(input: Any): Any =
    ShingleKernel.shingles3(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernel.shingles3($c)")

  override protected def withNewChildInternal(newChild: Expression): Shingles3 =
    copy(child = newChild)
}

case class Bigrams(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bigrams needs array<string>, got $other")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "bigrams"

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.bigrams(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.bigrams($c)")

  override protected def withNewChildInternal(newChild: Expression): Bigrams =
    copy(child = newChild)
}

/** `int8_codes(array<float>)` → `array<bigint>` — the native codegen'd
  * quantizer every int8-family operator projects through. `doGenCode`
  * inlines a static call into the surrounding WholeStageCodegen consume,
  * so per-row cost is the two primitive loops in [[VecCodec.int8Codes]]
  * — no interpreted lambdas, no boxing. Null input array → null (same as
  * the HOF twin). */
case class Int8Codes(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"int8_codes needs array<float>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "int8_codes"

  override protected def nullSafeEval(input: Any): Any =
    VecCodec.int8Codes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VecCodec.int8Codes($c)")

  override protected def withNewChildInternal(newChild: Expression): Int8Codes =
    copy(child = newChild)
}
