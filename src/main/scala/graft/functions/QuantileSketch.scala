package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable KLL quantile sketch aggregates — the `quantileState` /
  * `quantileMerge` pattern ClickHouse's AggregatingMergeTree uses for
  * continuous distribution panels (the reference's byte-size distribution
  * screen is the batch form), realized on the Datasketches KLL
  * implementation that already ships on Spark's classpath.
  *
  * Split exactly like [[HeavyHittersSketch]] / [[HeavyHittersMerge]]:
  *
  *  - [[QuantileSketchAgg]] (`quantile_sketch(x, k)`) emits the SERIALIZED
  *    per-group sketch (binary) — the column a streaming MV stores per
  *    micro-batch. Size is O(k log(n/k)) regardless of stream length
  *    (~few KB at the default k=200), so only fixed-size blobs ever cross
  *    an exchange or land in the MV.
  *  - [[QuantileSketchMerge]] (`quantile_merge(sketch, k, probs)`) folds
  *    blobs back together and evaluates the requested quantiles.
  *
  * KLL guarantees a NORMALIZED RANK error ε(k) (≈1.65% at k=200,
  * two-sided) that SURVIVES ARBITRARY MERGE TREES — cross-micro-batch
  * folding is as accurate as one sketch over the union. Compaction uses
  * randomized offsets, so two differently-split streams may produce
  * different (all individually within-ε) sketches; below the first
  * compaction (n ≲ k per folded group) the sketch retains every value and
  * quantiles are EXACT — the regime the spec pins value-for-value.
  */
case class QuantileSketchAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  require(k >= 8 && k <= 65535, s"need 8 <= k <= 65535 (datasketches KLL bounds), got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quantile_sketch needs a DOUBLE value column, got ${child.dataType}")
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "quantile_sketch"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)
  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }
  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other); buffer
  }
  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray
  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketchAgg = copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
}

/** `quantile_merge(sketch, k, probs)` — fold serialized
  * [[QuantileSketchAgg]] blobs and evaluate `probs` (INCLUSIVE search
  * criteria: the smallest value whose inclusive rank covers the prob —
  * exact-regime results match `percentile_disc`-style picks from the
  * data). `k` must match the sketches' (a mixed-k merge silently degrades
  * to the coarser accuracy, so it throws instead). NULL when the folded
  * sketch is empty (a group of all-null inputs).
  *
  * EXACT REGIME, loudly guarded (the [[ThetaSketchEstimate]] contract):
  * while no compaction has occurred anywhere in the merge tree
  * (`numRetained == n`, i.e. n ≤ k per folded group) the sketch retains
  * EVERY value and the INCLUSIVE quantile is exactly the ⌈p·n⌉-th order
  * statistic — DuckDB's `quantile_disc`. With `strict = true` (what
  * oracle-checked registrations pass, with k sized to the driver scale)
  * the finalizer THROWS if the folded sketch ever entered estimation
  * mode, so approximate output can never silently face an exact oracle. */
case class QuantileSketchMerge(child: Expression, k: Int, probs: Seq[Double],
    strict: Boolean = false,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  require(k >= 8 && k <= 65535, s"need 8 <= k <= 65535 (datasketches KLL bounds), got $k")
  require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
    s"probs must all lie in [0,1], got $probs")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quantile_merge needs a BINARY sketch column, got ${child.dataType}")
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "quantile_merge"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)
  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) {
      val other = KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]]))
      if (other.getK != k)
        throw new IllegalArgumentException(
          s"quantile_merge(k=$k) fed a k=${other.getK} sketch — merging would " +
            "silently degrade to the coarser rank error")
      buffer.merge(other)
    }
    buffer
  }
  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other); buffer
  }
  override def eval(buffer: KllDoublesSketch): Any =
    if (buffer.isEmpty) null
    else {
      if (strict && buffer.isEstimationMode)
        throw new IllegalStateException(
          s"quantile_merge(strict=true): folded sketch is in estimation mode " +
            s"(${buffer.getNumRetained} of ${buffer.getN} values retained) — " +
            "quantiles are rank-error-approximate here; an exact oracle is " +
            "only valid while n <= k per folded group. Raise k or pass " +
            "strict=false.")
      new GenericArrayData(
        buffer.getQuantiles(probs.toArray, QuantileSearchCriteria.INCLUSIVE))
    }
  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketchMerge = copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchMerge =
    copy(inputAggBufferOffset = newOffset)
}

/** `quantile_fold(sketch, k)` — fold serialized [[QuantileSketchAgg]]
  * blobs back into ONE blob without evaluating quantiles: the
  * MV-compaction aggregate. Same mixed-k refusal as
  * [[QuantileSketchMerge]]. KLL's rank-error bound survives the fold
  * (merge trees don't compound it); below the first compaction the fold
  * is exact, so a compacted MV reads identically in that regime. */
case class QuantileSketchFold(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  require(k >= 8 && k <= 65535, s"need 8 <= k <= 65535 (datasketches KLL bounds), got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quantile_fold needs a BINARY sketch column, got ${child.dataType}")
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "quantile_fold"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)
  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) {
      val other = KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]]))
      if (other.getK != k)
        throw new IllegalArgumentException(
          s"quantile_fold(k=$k) fed a k=${other.getK} sketch — merging would " +
            "silently degrade to the coarser rank error")
      buffer.merge(other)
    }
    buffer
  }
  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other); buffer
  }
  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray
  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketchFold = copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchFold =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchFold =
    copy(inputAggBufferOffset = newOffset)
}

object QuantileSketch {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** MV-compaction fold: `quantileFold(sketchCol, k)` → binary. */
  def quantileFold(sketch: Column, k: Int): Column =
    ColumnBridge.column(
      QuantileSketchFold(ColumnBridge.expression(sketch), k).toAggregateExpression())

  /** Mergeable partial: `quantileSketch(col, k)` → binary. */
  def quantileSketch(value: Column, k: Int = 200): Column =
    ColumnBridge.column(
      QuantileSketchAgg(ColumnBridge.expression(value), k).toAggregateExpression())

  /** Read-time finalize: `quantileMerge(sketchCol, k, probs)` →
    * array<double> aligned with `probs`. `strict = true` throws if the
    * folded sketch left the exact regime (the oracle-registration form). */
  def quantileMerge(sketch: Column, k: Int, probs: Seq[Double],
      strict: Boolean = false): Column =
    ColumnBridge.column(
      QuantileSketchMerge(ColumnBridge.expression(sketch), k, probs, strict)
        .toAggregateExpression())
}
