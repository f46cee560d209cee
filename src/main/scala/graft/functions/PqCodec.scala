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
  * All the expressions here inline static kernels via `doGenCode` (the
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

  /** Whole-query-batch ADC cosines for one candidate: element `q` is
    * `dot_q / (sqrt(qnorm_q) · sqrt(rnorm))` with `dot_q` the integer
    * ADC dot against query q's lookup table and `rnorm` the (shared)
    * reconstruction norm — computed ONCE per candidate. One kernel call
    * and one primitive double[] per candidate row replaces |queries|
    * struct + parts-array allocations in the full-scan serve (the
    * explode-per-query shape measured allocation-bound at 2M × 100).
    * Rounding to 6 places happens in the COLUMN after the explode, so
    * the score values are bit-identical to the per-query parts path. */
  def adcCosBatch(codes: ArrayData, dotLuts: Array[Array[Array[Long]]],
      normLut: Array[Array[Long]], qnorms: Array[Long]): ArrayData = {
    val m = normLut.length
    var rnorm = 0L
    var s = 0
    while (s < m) { rnorm += normLut(s)(codes.getInt(s)); s += 1 }
    val rn = math.sqrt(rnorm.toDouble)
    val out = new Array[Double](dotLuts.length)
    var q = 0
    while (q < dotLuts.length) {
      val dl = dotLuts(q)
      var dot = 0L
      s = 0
      while (s < m) { dot += dl(s)(codes.getInt(s)); s += 1 }
      out(q) = dot.toDouble / (math.sqrt(qnorms(q).toDouble) * rn)
      q += 1
    }
    new GenericArrayData(out)
  }

  /** Quantized residual `q − mq(cidx)` — the vector a RESIDUAL product
    * quantizer encodes (IVFADC: the coarse cell explains the bulk of the
    * vector, PQ only has to code the remainder). Pure integer subtract. */
  def subCentroid(q: ArrayData, cidx: Int, mq: Array[Array[Long]]): ArrayData = {
    val c = mq(cidx)
    val n = q.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = q.getLong(i) - c(i); i += 1 }
    new GenericArrayData(out)
  }

  /** Squared quantization error `Σ_s |q_s − cb(s)(code_s)|²` of one
    * vector against its assigned codewords — exact integers, the loss
    * the PQ trainer minimizes and the honest A/B metric for residual
    * vs plain coding (recall on a synthetic corpus is noise-dominated;
    * reconstruction error is not). */
  def sqErr(q: ArrayData, codes: ArrayData, cb: Array[Array[Array[Long]]],
      dsub: Int): Long = {
    var sse = 0L
    var s = 0
    while (s < cb.length) {
      val c = cb(s)(codes.getInt(s))
      val base = s * dsub
      var p = 0
      while (p < dsub) {
        val d = q.getLong(base + p) - c(p)
        sse += d * d
        p += 1
      }
      s += 1
    }
    sse
  }

  /** Residual-ADC parts `[Σ dotLut, Σ crossLut, Σ normLut]` for a
    * candidate carrying its query index AND its coarse-cell index: with
    * reconstruction `x̂ = mq(cell) + r̂`, the dot decomposes as
    * `q·x̂ = q·mq + Σ_s dot(q_s, r̂_s)` and the squared norm as
    * `|mq|² + 2·Σ_s mq_s·r̂_s + Σ_s |r̂_s|²` — the first terms ride the
    * broadcast probe relation as per-(query,cell) scalars; this kernel
    * folds the three per-subspace sums in one pass (three array loads
    * per subspace). */
  def adcPartsResAt(codes: ArrayData, qidx: Int, cidx: Int,
      dotLuts: Array[Array[Array[Long]]], crossLuts: Array[Array[Array[Long]]],
      normLut: Array[Array[Long]]): ArrayData = {
    val dotLut = dotLuts(qidx)
    val crossLut = crossLuts(cidx)
    var dot = 0L
    var cross = 0L
    var norm = 0L
    var s = 0
    while (s < dotLut.length) {
      val j = codes.getInt(s)
      dot += dotLut(s)(j)
      cross += crossLut(s)(j)
      norm += normLut(s)(j)
      s += 1
    }
    new GenericArrayData(Array(dot, cross, norm))
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

/** `pq_residual(qv, cidx)` → `array<bigint>` of `qv − mq(cidx)` against
  * the constructor-bound per-cell quantized mean centroids — the input
  * to residual PQ training/encoding. The centroid table rides the plan
  * as a reference object (nCells × dims longs, the centroid pattern). */
case class PqResidual(left: Expression, right: Expression, mq: Seq[Seq[Long]])
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  require(mq.nonEmpty, "pq_residual: empty centroid table")

  @transient private lazy val mArr: Array[Array[Long]] = mq.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_residual needs (array<bigint>, int), got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_residual"

  override protected def nullSafeEval(q: Any, cidx: Any): Any =
    PqKernel.subCentroid(q.asInstanceOf[ArrayData], cidx.asInstanceOf[Int], mArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqMeanCentroids", mArr, "long[][]")
    defineCodeGen(ctx, ev, (q, c) =>
      s"graft.functions.PqKernel.subCentroid($q, $c, $ref)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqResidual = copy(left = newLeft, right = newRight)
}

/** `pq_adc_cos_batch(codes)` → `array<double>` of unrounded ADC cosines
  * for the constructor-bound query batch — one call per candidate. */
case class PqAdcCosBatch(child: Expression, dotLuts: Seq[Seq[Seq[Long]]],
    normLut: Seq[Seq[Long]], qnorms: Seq[Long]) extends UnaryExpression {
  require(dotLuts.nonEmpty && dotLuts.length == qnorms.length &&
    dotLuts.forall(_.length == normLut.length),
    "pq_adc_cos_batch: LUT shape mismatch")

  @transient private lazy val dArr: Array[Array[Array[Long]]] =
    dotLuts.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val nArr: Array[Array[Long]] = normLut.map(_.toArray).toArray
  @transient private lazy val qArr: Array[Long] = qnorms.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_cos_batch needs array<int> (pq_encode output), got $other")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.DoubleType, containsNull = false)
  override def prettyName: String = "pq_adc_cos_batch"

  override protected def nullSafeEval(codes: Any): Any =
    PqKernel.adcCosBatch(codes.asInstanceOf[ArrayData], dArr, nArr, qArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refD = ctx.addReferenceObj("pqDotLuts", dArr, "long[][][]")
    val refN = ctx.addReferenceObj("pqNormLut", nArr, "long[][]")
    val refQ = ctx.addReferenceObj("pqQnorms", qArr, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqKernel.adcCosBatch($c, $refD, $refN, $refQ)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcCosBatch =
    copy(child = newChild)
}

/** `pq_sq_err(qv, codes)` → BIGINT squared quantization error of `qv`
  * against the constructor-bound codebook at the row's assigned codes. */
case class PqSqErr(left: Expression, right: Expression,
    codebook: Seq[Seq[Seq[Long]]], dsub: Int)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  require(codebook.nonEmpty && codebook.forall(_.nonEmpty),
    "pq_sq_err: empty codebook")

  @transient private lazy val cb: Array[Array[Array[Long]]] =
    codebook.map(_.map(_.toArray).toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(IntegerType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_sq_err needs (array<bigint>, array<int>), got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "pq_sq_err"

  override protected def nullSafeEval(q: Any, codes: Any): Any =
    PqKernel.sqErr(q.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData],
      cb, dsub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebook", cb, "long[][][]")
    defineCodeGen(ctx, ev, (q, c) =>
      s"graft.functions.PqKernel.sqErr($q, $c, $ref, $dsub)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqSqErr = copy(left = newLeft, right = newRight)
}

/** `pq_adc_parts_res_at(codes, qidx, cidx)` →
  * `array<bigint> [res_dot, cross, res_norm]` against the
  * constructor-bound query-batch dot tables, per-cell cross tables and
  * codeword norm table — the residual-IVFADC serving kernel. */
case class PqAdcPartsResAt(first: Expression, second: Expression,
    third: Expression, dotLuts: Seq[Seq[Seq[Long]]],
    crossLuts: Seq[Seq[Seq[Long]]], normLut: Seq[Seq[Long]])
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  require(dotLuts.nonEmpty && crossLuts.nonEmpty &&
    dotLuts.forall(_.length == normLut.length) &&
    crossLuts.forall(_.length == normLut.length),
    "pq_adc_parts_res_at: LUT shape mismatch")

  @transient private lazy val dArr: Array[Array[Array[Long]]] =
    dotLuts.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val xArr: Array[Array[Array[Long]]] =
    crossLuts.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val nArr: Array[Array[Long]] = normLut.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(IntegerType, _), IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_parts_res_at needs (array<int>, int, int), got $other")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_adc_parts_res_at"

  override protected def nullSafeEval(codes: Any, qidx: Any, cidx: Any): Any =
    PqKernel.adcPartsResAt(codes.asInstanceOf[ArrayData],
      qidx.asInstanceOf[Int], cidx.asInstanceOf[Int], dArr, xArr, nArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refD = ctx.addReferenceObj("pqDotLuts", dArr, "long[][][]")
    val refX = ctx.addReferenceObj("pqCrossLuts", xArr, "long[][][]")
    val refN = ctx.addReferenceObj("pqNormLut", nArr, "long[][]")
    defineCodeGen(ctx, ev, (c, q, cell) =>
      s"graft.functions.PqKernel.adcPartsResAt($c, $q, $cell, $refD, $refX, $refN)")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): PqAdcPartsResAt =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PqCodec {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def quantLongs(vec: Column, scale: Long): Column =
    ColumnBridge.column(QuantLongs(ColumnBridge.expression(vec), scale))

  def pqEncode(q: Column, codebook: Seq[Seq[Seq[Long]]], dsub: Int): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(q), codebook, dsub))

  def pqAdcPartsAt(codes: Column, qidx: Column, dotLuts: Seq[Seq[Seq[Long]]],
      normLut: Seq[Seq[Long]]): Column =
    ColumnBridge.column(PqAdcPartsAt(ColumnBridge.expression(codes),
      ColumnBridge.expression(qidx), dotLuts, normLut))

  def pqAdcCosBatch(codes: Column, dotLuts: Seq[Seq[Seq[Long]]],
      normLut: Seq[Seq[Long]], qnorms: Seq[Long]): Column =
    ColumnBridge.column(PqAdcCosBatch(ColumnBridge.expression(codes),
      dotLuts, normLut, qnorms))

  def pqSqErr(qv: Column, codes: Column, codebook: Seq[Seq[Seq[Long]]],
      dsub: Int): Column =
    ColumnBridge.column(PqSqErr(ColumnBridge.expression(qv),
      ColumnBridge.expression(codes), codebook, dsub))

  def pqResidual(qv: Column, cidx: Column, mq: Seq[Seq[Long]]): Column =
    ColumnBridge.column(PqResidual(ColumnBridge.expression(qv),
      ColumnBridge.expression(cidx), mq))

  def pqAdcPartsResAt(codes: Column, qidx: Column, cidx: Column,
      dotLuts: Seq[Seq[Seq[Long]]], crossLuts: Seq[Seq[Seq[Long]]],
      normLut: Seq[Seq[Long]]): Column =
    ColumnBridge.column(PqAdcPartsResAt(ColumnBridge.expression(codes),
      ColumnBridge.expression(qidx), ColumnBridge.expression(cidx),
      dotLuts, crossLuts, normLut))
}
