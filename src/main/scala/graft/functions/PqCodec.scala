package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType}

/** Product-quantization kernels — the 100-TB memory story for the ANN
  * tier: a 64-float embedding (256 B) compresses to `m` small code ids
  * (4 B here), and serving scores candidates from per-subspace lookup
  * tables instead of touching raw vectors. Everything runs in the
  * QUANTIZED INTEGER DOMAIN (`round(v · 2^20)` longs): distances,
  * centroid means, and ADC dot products are exact integer arithmetic, so
  * the trained codebooks and served scores are bit-reproducible against
  * the DuckDB oracle with no float-summation-order caveats at all —
  * stronger than the rounded-cosine parity the float paths rely on.
  *
  * All three expressions inline static kernels via `doGenCode` (the
  * VecCodec pattern): no interpreted higher-order functions in encode or
  * serve, which are the corpus-sized passes.
  */
object PqKernel {

  /** `round(v · scale)` per component, away-from-zero on halves — the
    * same result as Spark's `round()` column function and DuckDB's
    * `round()` on these inputs (float · 2^20 is exactly representable in
    * double, so the half cases are exact and both engines round them
    * away from zero). */
  def quantLongs(vec: ArrayData, scale: Long): ArrayData = {
    val n = vec.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val r = vec.getFloat(i).toDouble * scale
      out(i) = (if (r < 0) -math.floor(-r + 0.5) else math.floor(r + 0.5)).toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Nearest-codeword index per subspace by INTEGER L2: for sub `s`,
    * scan `cb(s)` (codewords in ascending code-id order) over the
    * sub-vector `q[s·dsub, (s+1)·dsub)`, keep the strictly smallest
    * distance — ties resolve to the LOWEST code id by scan order,
    * matching the oracle's `ORDER BY dist ASC, code ASC`. */
  def encode(q: ArrayData, cb: Array[Array[Array[Long]]], dsub: Int): ArrayData = {
    val m = cb.length
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val codes = cb(s)
      val base = s * dsub
      var bestJ = 0
      var bestD = Long.MaxValue
      var j = 0
      while (j < codes.length) {
        val c = codes(j)
        var d = 0L
        var p = 0
        while (p < dsub) {
          val diff = q.getLong(base + p) - c(p)
          d += diff * diff
          p += 1
        }
        if (d < bestD) { bestD = d; bestJ = j }
        j += 1
      }
      out(s) = bestJ
      s += 1
    }
    new GenericArrayData(out)
  }

  /** [[adcParts]] over a query BATCH: `qidx` selects the query's dot
    * table — the shape a probe-pruned candidate relation needs, where
    * the query is a COLUMN of the row (IVF cell join output), not a
    * plan-time constant. */
  def adcPartsAt(codes: ArrayData, qidx: Int, dotLuts: Array[Array[Array[Long]]],
      normLut: Array[Array[Long]]): ArrayData = {
    val dotLut = dotLuts(qidx)
    var dot = 0L
    var norm = 0L
    var s = 0
    while (s < dotLut.length) {
      val j = codes.getInt(s)
      dot += dotLut(s)(j)
      norm += normLut(s)(j)
      s += 1
    }
    new GenericArrayData(Array(dot, norm))
  }

  /** ADC parts for ONE query: `[Σ_s dotLut(s)(code_s), Σ_s normLut(s)
    * (code_s)]` — the asymmetric-distance numerator (integer dot of the
    * quantized query with the reconstruction) and the reconstruction's
    * squared norm. Two array loads per subspace; no vector math at
    * serve time. */
  def adcParts(codes: ArrayData, dotLut: Array[Array[Long]],
      normLut: Array[Array[Long]]): ArrayData = {
    var dot = 0L
    var norm = 0L
    var s = 0
    while (s < dotLut.length) {
      val j = codes.getInt(s)
      dot += dotLut(s)(j)
      norm += normLut(s)(j)
      s += 1
    }
    new GenericArrayData(Array(dot, norm))
  }
}

/** `quant_longs(vec)` → `array<bigint>` of `round(v · scale)` — the
  * shared quantization step of the PQ train/encode/serve paths. */
case class QuantLongs(child: Expression, scale: Long) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quant_longs needs array<float>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "quant_longs"

  override protected def nullSafeEval(input: Any): Any =
    PqKernel.quantLongs(input.asInstanceOf[ArrayData], scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqKernel.quantLongs($c, ${scale}L)")

  override protected def withNewChildInternal(newChild: Expression): QuantLongs =
    copy(child = newChild)
}

/** `pq_encode(q)` → `array<int>` of per-subspace codeword INDEXES under
  * the constructor-bound codebook (codewords ascending by code id within
  * each subspace, so the kernel's scan-order tie-break equals the
  * oracle's). The codebook rides the plan as a reference object. */
case class PqEncode(child: Expression, codebook: Seq[Seq[Seq[Long]]], dsub: Int)
  extends UnaryExpression {
  require(codebook.nonEmpty && codebook.forall(_.nonEmpty),
    "pq_encode: empty codebook")

  @transient private lazy val cb: Array[Array[Array[Long]]] =
    codebook.map(_.map(_.toArray).toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode needs array<bigint> (quant_longs output), got $other")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(input: Any): Any =
    PqKernel.encode(input.asInstanceOf[ArrayData], cb, dsub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebook", cb, "long[][][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqKernel.encode($c, $ref, $dsub)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** `pq_adc_parts(codes)` → `array<bigint> [adc_dot, recon_norm]` for the
  * constructor-bound single-query lookup tables. */
case class PqAdcParts(child: Expression, dotLut: Seq[Seq[Long]],
    normLut: Seq[Seq[Long]]) extends UnaryExpression {
  require(dotLut.length == normLut.length, "pq_adc_parts: LUT shape mismatch")

  @transient private lazy val dArr: Array[Array[Long]] = dotLut.map(_.toArray).toArray
  @transient private lazy val nArr: Array[Array[Long]] = normLut.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_parts needs array<int> (pq_encode output), got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_adc_parts"

  override protected def nullSafeEval(input: Any): Any =
    PqKernel.adcParts(input.asInstanceOf[ArrayData], dArr, nArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refD = ctx.addReferenceObj("pqDotLut", dArr, "long[][]")
    val refN = ctx.addReferenceObj("pqNormLut", nArr, "long[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqKernel.adcParts($c, $refD, $refN)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcParts =
    copy(child = newChild)
}

/** `pq_adc_parts_at(codes, qidx)` → `array<bigint> [adc_dot, recon_norm]`
  * against the constructor-bound query-BATCH dot tables (`qidx` picks the
  * query) — the serving form when candidates arrive from an IVF cell
  * join, carrying their query as a column. */
case class PqAdcPartsAt(left: Expression, right: Expression,
    dotLuts: Seq[Seq[Seq[Long]]], normLut: Seq[Seq[Long]])
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  require(dotLuts.nonEmpty && dotLuts.forall(_.length == normLut.length),
    "pq_adc_parts_at: LUT shape mismatch")

  @transient private lazy val dArr: Array[Array[Array[Long]]] =
    dotLuts.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val nArr: Array[Array[Long]] = normLut.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_parts_at needs (array<int>, int), got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_adc_parts_at"

  override protected def nullSafeEval(codes: Any, qidx: Any): Any =
    PqKernel.adcPartsAt(codes.asInstanceOf[ArrayData],
      qidx.asInstanceOf[Int], dArr, nArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refD = ctx.addReferenceObj("pqDotLuts", dArr, "long[][][]")
    val refN = ctx.addReferenceObj("pqNormLut", nArr, "long[][]")
    defineCodeGen(ctx, ev, (c, q) =>
      s"graft.functions.PqKernel.adcPartsAt($c, $q, $refD, $refN)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqAdcPartsAt = copy(left = newLeft, right = newRight)
}

object PqCodec {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def quantLongs(vec: Column, scale: Long): Column =
    ColumnBridge.column(QuantLongs(ColumnBridge.expression(vec), scale))

  def pqEncode(q: Column, codebook: Seq[Seq[Seq[Long]]], dsub: Int): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(q), codebook, dsub))

  def pqAdcParts(codes: Column, dotLut: Seq[Seq[Long]],
      normLut: Seq[Seq[Long]]): Column =
    ColumnBridge.column(
      PqAdcParts(ColumnBridge.expression(codes), dotLut, normLut))

  def pqAdcPartsAt(codes: Column, qidx: Column, dotLuts: Seq[Seq[Seq[Long]]],
      normLut: Seq[Seq[Long]]): Column =
    ColumnBridge.column(PqAdcPartsAt(ColumnBridge.expression(codes),
      ColumnBridge.expression(qidx), dotLuts, normLut))
}
