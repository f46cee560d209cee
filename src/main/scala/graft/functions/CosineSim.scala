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
