package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Per-dimension integer moments of a vector column in ONE pass — the
  * aggregate form of the pairwise-moments identity
  * `MPSD = 2/(n(n−1)) · Σ_d [ n·Σq_d² − (Σq_d)² ]` that
  * [[graft.operators.Similarity.simDiversity]] uses: instead of
  * posexploding every vector into dims rows (corpus×dims generated rows
  * through a (label, dim)-keyed exchange), each task folds its rows into
  * one fixed-size (n, Σq[], Σq²[]) buffer and only |groups| serialized
  * buffers cross the exchange. Measured at 2 M × 64-dim vectors the
  * explode plan burned its time generating and hash-aggregating 128 M
  * rows; this is the same arithmetic with the row blow-up deleted.
  *
  * Exactness contract (unchanged from the explode form): inputs are int8
  * codes (|q| ≤ 127), so every moment is an exact Long and
  * `ssd = Σ_d [n·Σq² − (Σq)²]` stays inside Long up to ~3 M vectors per
  * group at 64 dims; beyond that widen to the double-moments twin. All
  * input vectors in a group must share one dimensionality — a mismatch
  * throws rather than silently mis-summing.
  */
final class VecMomentsState {
  var n: Long = 0L
  var s: Array[Long] = null
  var s2: Array[Long] = null

  def update(codes: org.apache.spark.sql.catalyst.util.ArrayData): Unit = {
    val d = codes.numElements()
    if (s == null) { s = new Array[Long](d); s2 = new Array[Long](d) }
    else require(s.length == d,
      s"vec_moments: dimensionality mismatch (${s.length} vs $d)")
    var i = 0
    while (i < d) {
      val q = codes.getLong(i)
      s(i) += q
      s2(i) += q * q
      i += 1
    }
    n += 1
  }

  def merge(other: VecMomentsState): Unit = {
    if (other.s != null) {
      if (s == null) { s = other.s.clone(); s2 = other.s2.clone(); n = other.n }
      else {
        require(s.length == other.s.length,
          s"vec_moments: dimensionality mismatch (${s.length} vs ${other.s.length})")
        var i = 0
        while (i < s.length) { s(i) += other.s(i); s2(i) += other.s2(i); i += 1 }
        n += other.n
      }
    }
  }

  /** `Σ_d [n·Σq² − (Σq)²]` — exact under the int8 contract above. */
  def ssd: Long = {
    if (s == null) return 0L
    var acc = 0L
    var i = 0
    while (i < s.length) { acc += n * s2(i) - s(i) * s(i); i += 1 }
    acc
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(n)
    val d = if (s == null) 0 else s.length
    out.writeInt(d)
    var i = 0
    while (i < d) { out.writeLong(s(i)); out.writeLong(s2(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }
}

object VecMomentsState {
  def deserialize(bytes: Array[Byte]): VecMomentsState = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val st = new VecMomentsState
    st.n = in.readLong()
    val d = in.readInt()
    if (d > 0) {
      st.s = new Array[Long](d); st.s2 = new Array[Long](d)
      var i = 0
      while (i < d) { st.s(i) = in.readLong(); st.s2(i) = in.readLong(); i += 1 }
    }
    st
  }
}

/** `vec_moments(codes)` over `array<bigint>` →
  * `struct<n_vecs:bigint, ssd:bigint>` — partial buffers are one
  * (8 + 4 + 16·dims)-byte blob per partition per group however many rows
  * fold in. Null vectors are skipped (same as the explode form, where a
  * null array generates no rows). */
case class VecMomentsAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecMomentsState] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_moments needs array<bigint> codes, got $other")
  }
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n_vecs", LongType, nullable = false),
    StructField("ssd", LongType, nullable = false)))
  override def prettyName: String = "vec_moments"

  override def createAggregationBuffer(): VecMomentsState = new VecMomentsState

  // null-element guard only when the input TYPE admits them (parquet
  // round-trips / SQL literals) -- the int8_codes path never pays it
  private lazy val checkNullElems: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def update(buffer: VecMomentsState, input: InternalRow): VecMomentsState = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      if (checkNullElems) VecKernels.assertDense(arr, prettyName)
      buffer.update(arr)
    }
    buffer
  }

  override def merge(buffer: VecMomentsState, other: VecMomentsState): VecMomentsState = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: VecMomentsState): Any = InternalRow(buffer.n, buffer.ssd)

  override def serialize(buffer: VecMomentsState): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): VecMomentsState =
    VecMomentsState.deserialize(bytes)

  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VecMomentsAgg = copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): VecMomentsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecMomentsAgg =
    copy(inputAggBufferOffset = newOffset)
}

/** `vec_sums(codes)` → `struct<n_vecs:bigint, sums:array<bigint>>` — the
  * per-dimension first-moment twin of [[VecMomentsAgg]] (same one-pass
  * fold, same fixed-size buffer; the finalize exposes Σq[] instead of
  * collapsing it), for centroid-style consumers: the per-label centroid
  * is `sums/n` and never needs the corpus×dims explode. */
case class VecSumsAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecMomentsState] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_sums needs array<bigint> codes, got $other")
  }
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n_vecs", LongType, nullable = false),
    StructField("sums", ArrayType(LongType, containsNull = false), nullable = false)))
  override def prettyName: String = "vec_sums"

  override def createAggregationBuffer(): VecMomentsState = new VecMomentsState

  // null-element guard only when the input TYPE admits them (parquet
  // round-trips / SQL literals) -- the int8_codes path never pays it
  private lazy val checkNullElems: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def update(buffer: VecMomentsState, input: InternalRow): VecMomentsState = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      if (checkNullElems) VecKernels.assertDense(arr, prettyName)
      buffer.update(arr)
    }
    buffer
  }

  override def merge(buffer: VecMomentsState, other: VecMomentsState): VecMomentsState = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: VecMomentsState): Any = InternalRow(buffer.n,
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      if (buffer.s == null) Array.emptyLongArray else buffer.s))

  override def serialize(buffer: VecMomentsState): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): VecMomentsState =
    VecMomentsState.deserialize(bytes)

  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VecSumsAgg = copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumsAgg =
    copy(inputAggBufferOffset = newOffset)
}

/** Second-moment CROSS-dimension fold: the upper-triangle Gram matrix
  * `G[i][j] = Σ_vec q_i·q_j` of an int8-code column, in ONE pass — the
  * input PCA/whitening/covariance estimation needs, computed without
  * ever materializing the corpus×dims² pair explosion. Each task folds
  * its vectors into one fixed d(d+1)/2-long triangle buffer (64 dims →
  * 2080 longs ≈ 16 KB), so the exchange carries one blob per partition
  * however many vectors fold in.
  *
  * Exactness: int8 codes keep every product ≤ 127² and the triangle sums
  * exact Longs up to ~5·10¹⁴ vectors — the covariance then derives from
  * (gram, sums, n) in driver-or-SQL space with no float accumulation.
  */
final class VecGramState {
  var n: Long = 0L
  var d: Int = 0
  var g: Array[Long] = null // upper triangle, row-major: (i,j) with j >= i

  def update(codes: org.apache.spark.sql.catalyst.util.ArrayData): Unit = {
    val dim = codes.numElements()
    if (g == null) { d = dim; g = new Array[Long](dim * (dim + 1) / 2) }
    else require(d == dim, s"vec_gram: dimensionality mismatch ($d vs $dim)")
    // one bulk copy, then the d²/2 inner loop runs on the primitive array —
    // per-element ArrayData.getLong virtual calls dominated the fold at 2M
    // vectors (each element is read d/2 times in the triangle)
    val q = codes.toLongArray()
    var i = 0
    var k = 0
    while (i < dim) {
      val qi = q(i)
      var j = i
      while (j < dim) { g(k) += qi * q(j); j += 1; k += 1 }
      i += 1
    }
    n += 1
  }

  def merge(other: VecGramState): Unit = {
    if (other.g != null) {
      if (g == null) { g = other.g.clone(); d = other.d; n = other.n }
      else {
        require(d == other.d, s"vec_gram: dimensionality mismatch ($d vs ${other.d})")
        var k = 0
        while (k < g.length) { g(k) += other.g(k); k += 1 }
        n += other.n
      }
    }
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(n)
    out.writeInt(d)
    val len = if (g == null) 0 else g.length
    out.writeInt(len)
    var k = 0
    while (k < len) { out.writeLong(g(k)); k += 1 }
    out.flush()
    bos.toByteArray
  }
}

object VecGramState {
  def deserialize(bytes: Array[Byte]): VecGramState = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val st = new VecGramState
    st.n = in.readLong()
    st.d = in.readInt()
    val len = in.readInt()
    if (len > 0) {
      st.g = new Array[Long](len)
      var k = 0
      while (k < len) { st.g(k) = in.readLong(); k += 1 }
    }
    st
  }
}

/** `vec_gram(codes)` over `array<bigint>` →
  * `struct<n_vecs:bigint, dims:int, gram:array<bigint>>` with `gram` the
  * upper triangle in row-major (i, j ≥ i) order. Null vectors are
  * skipped. */
case class VecGramAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecGramState] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_gram needs array<bigint> codes, got $other")
  }
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n_vecs", LongType, nullable = false),
    StructField("dims", IntegerType, nullable = false),
    StructField("gram", ArrayType(LongType, containsNull = false), nullable = false)))
  override def prettyName: String = "vec_gram"

  override def createAggregationBuffer(): VecGramState = new VecGramState

  // null-element guard only when the input TYPE admits them (parquet
  // round-trips / SQL literals) -- the int8_codes path never pays it
  private lazy val checkNullElems: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def update(buffer: VecGramState, input: InternalRow): VecGramState = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      if (checkNullElems) VecKernels.assertDense(arr, prettyName)
      buffer.update(arr)
    }
    buffer
  }

  override def merge(buffer: VecGramState, other: VecGramState): VecGramState = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: VecGramState): Any = InternalRow(buffer.n, buffer.d,
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      if (buffer.g == null) Array.emptyLongArray else buffer.g))

  override def serialize(buffer: VecGramState): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): VecGramState =
    VecGramState.deserialize(bytes)

  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VecGramAgg = copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): VecGramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecGramAgg =
    copy(inputAggBufferOffset = newOffset)
}

object VecMoments {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** `vecMoments(codes)` → `struct<n_vecs, ssd>`. */
  def vecMoments(codes: Column): Column =
    ColumnBridge.column(
      VecMomentsAgg(ColumnBridge.expression(codes)).toAggregateExpression())

  /** `vecSums(codes)` → `struct<n_vecs, sums>`. */
  def vecSums(codes: Column): Column =
    ColumnBridge.column(
      VecSumsAgg(ColumnBridge.expression(codes)).toAggregateExpression())

  /** `vecGram(codes)` → `struct<n_vecs, dims, gram>`. */
  def vecGram(codes: Column): Column =
    ColumnBridge.column(
      VecGramAgg(ColumnBridge.expression(codes)).toAggregateExpression())
}
