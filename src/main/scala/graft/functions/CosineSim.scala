package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** The cosine hot loop, callable from generated code: reads the columnar
  * ArrayData as primitive float arrays (no per-element boxing) and folds in
  * double, left to right — the exact IEEE sequence the DuckDB oracle's
  * ordered list arithmetic produces. */
object CosineKernel {
  /** Inputs must be DENSE same-length vectors: a length mismatch throws
    * (silently comparing the common prefix fabricates a plausible score
    * from corrupt data — r7 review finding), and a null ELEMENT follows
    * `ArrayData.toFloatArray` (0.0 on the unsafe path) — embeddings are
    * declared dense; use array_compact upstream if a source can hold
    * nulls. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val x = a.toFloatArray()
    val y = b.toFloatArray()
    if (x.length != y.length)
      throw new IllegalArgumentException(
        s"cosine_sim: vector length mismatch (${x.length} vs ${y.length})")
    val n = x.length
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xd = x(i).toDouble; val yd = y(i).toDouble
      dot += xd * yd; na += xd * xd; nb += yd * yd
      i += 1
    }
    dot / (java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb))
  }
}

object NearestCentroidKernel {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

  /** Argmax over the bound centroid set by `(round(cos, 6) desc, cid
    * asc)` — bit-identical to the interpreted
    * `aggregate(transform(cents, struct(round(cosine,6), -cid)), max)`
    * spelling it replaces: the same left-to-right double fold per
    * cosine ([[CosineKernel.cosine]]), the same HALF_UP round to 6
    * (NaN/Inf pass through, as Spark's `round` does), and the same
    * total double order (NaN greatest, -0.0 < 0.0 —
    * `java.lang.Double.compare`, which is Spark's nanSafeCompare). */
  def nearest(v: ArrayData, cids: Array[Long],
      cembs: Array[Array[Float]]): InternalRow = {
    val x = v.toFloatArray()
    var bestCos = Double.NegativeInfinity
    var bestNcid = Long.MinValue
    var k = 0
    while (k < cids.length) {
      val y = cembs(k)
      if (x.length != y.length)
        throw new IllegalArgumentException(
          s"nearest_centroid: vector length mismatch (${x.length} vs ${y.length})")
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < x.length) {
        val xd = x(i).toDouble; val yd = y(i).toDouble
        dot += xd * yd; na += xd * xd; nb += yd * yd
        i += 1
      }
      val raw = dot / (java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb))
      val cos =
        if (java.lang.Double.isNaN(raw) || java.lang.Double.isInfinite(raw)) raw
        else BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val ncid = -cids(k)
      val cmp = java.lang.Double.compare(cos, bestCos)
      if (cmp > 0 || (cmp == 0 && ncid > bestNcid)) {
        bestCos = cos; bestNcid = ncid
      }
      k += 1
    }
    new GenericInternalRow(Array[Any](-bestNcid, bestCos))
  }
}

/** `nearest_centroid(embedding)` → `struct<cid:bigint, assign_cos:double>`
  * against the constructor-bound centroid table — the IVF assignment
  * argmax as ONE codegen'd kernel call per row. The interpreted
  * transform+aggregate spelling it replaces was the last HOF island on
  * the ANN hot paths (every Lloyd iteration, every index build, every
  * IVF-PQ corpus pass ran it per vector). */
case class NearestCentroid(child: Expression, cids: Seq[Long],
    cembs: Seq[Seq[Float]])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(cids.nonEmpty && cids.length == cembs.length,
    "nearest_centroid: empty or mismatched centroid table")

  @transient private lazy val cidArr: Array[Long] = cids.toArray
  @transient private lazy val cembArr: Array[Array[Float]] =
    cembs.map(_.toArray).toArray

  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(FloatType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nearest_centroid needs array<float>, got $other")
  }
  override def dataType: DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cid",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("assign_cos", DoubleType,
        nullable = false)))
  override def prettyName: String = "nearest_centroid"

  override protected def nullSafeEval(v: Any): Any =
    NearestCentroidKernel.nearest(v.asInstanceOf[ArrayData], cidArr, cembArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refC = ctx.addReferenceObj("nnCids", cidArr, "long[]")
    val refE = ctx.addReferenceObj("nnCembs", cembArr, "float[][]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.NearestCentroidKernel.nearest($v, $refC, $refE)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

/** cosine(a, b) over float arrays as a native Catalyst expression with
  * codegen — replaces the r2 Scala UDF form (which converted ArrayData to a
  * boxed Seq[Float] per row) on the similarity hot paths. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineKernel.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.CosineKernel.cosine($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}
