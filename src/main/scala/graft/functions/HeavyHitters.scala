package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable SpaceSaving (Metwally et al.) heavy-hitters summary over a
  * 64-bit item domain — bounded memory (`capacity` counters) regardless of
  * stream length or cardinality, with the classic deterministic guarantee
  * per reported item: `est - err <= true_count <= est`, and every item
  * whose true frequency exceeds n/capacity is guaranteed present.
  *
  * Point update: hit → est+1; open slot → (1, 0); full → evict the
  * minimum-est item m and admit the newcomer at (m+1, err=m). Merge (the
  * mergeable-summaries form, Agarwal et al., PODS'12): an item absent from
  * one side contributes that side's minimum estimate to both est and err
  * (its true count there is at most that minimum), then the union trims
  * back to `capacity` by estimate — both bounds survive the merge, so the
  * aggregate is partitioning-independent AT THE GUARANTEE LEVEL (marginal
  * below-threshold items may differ by merge order; heavy ones cannot be
  * lost). When `capacity` exceeds the true distinct cardinality no
  * eviction ever happens and the summary is EXACT (err = 0 throughout) —
  * the regime the spec pins value-for-value against a plain count.
  */
final class SpaceSavingState(val capacity: Int) {
  /** item -> (est, err) */
  val items: mutable.LongMap[(Long, Long)] = mutable.LongMap.empty

  /** Lazy min-heap of (est, item) snapshots ordered (est asc, item asc) —
    * the classic stream-summary's "find the minimum" made O(log capacity)
    * amortized instead of a full O(capacity) scan per eviction. Entries go
    * STALE-LOW when their item is incremented (est only grows), so the
    * heap top is always a lower bound; [[popMin]] corrects stale tops by
    * re-pushing at the current estimate until the top is live. `heapEst`
    * pins the single canonical entry per item so corrections never breed
    * duplicates; heap size therefore stays <= live items + in-flight
    * corrections = O(capacity). The hit path (no eviction) touches
    * neither structure — O(1) as before. Built lazily because merge() and
    * deserialize() rebuild `items` wholesale; they just drop the heap. */
  private var heap: mutable.PriorityQueue[(Long, Long)] = null
  private var heapEst: mutable.LongMap[Long] = null

  private def minOrd: Ordering[(Long, Long)] =
    Ordering.Tuple2(Ordering.Long.reverse, Ordering.Long.reverse) // PQ is a max-heap
  private def ensureHeap(): Unit = if (heap == null) {
    heap = mutable.PriorityQueue.empty(minOrd)
    heapEst = mutable.LongMap.empty
    items.foreach { case (k, (est, _)) => heap.enqueue((est, k)); heapEst.update(k, est) }
  }
  private def heapPush(est: Long, item: Long): Unit =
    if (heap != null) { heap.enqueue((est, item)); heapEst.update(item, est) }

  /** Pop the live minimum (min est, then min item id) — deterministic, so
    * a given merge tree always yields the same summary. Caller must have
    * called ensureHeap() and items must be non-empty. */
  private def popMin(): (Long, Long) = {
    // safety valve: superseded duplicates are discarded as they surface,
    // but if they ever outnumber live entries ~7:1, a wholesale rebuild
    // (O(capacity log capacity)) restarts from all-live — keeps worst-case
    // heap memory at O(capacity) unconditionally
    if (heap.size > 8 * capacity + 64) { heap = null; heapEst = null; ensureHeap() }
    while (true) {
      val (e, k) = heap.dequeue()
      if (heapEst.getOrElse(k, Long.MinValue) == e) {
        items.get(k) match {
          case Some((cur, _)) if cur == e =>
            heapEst.remove(k)
            return (e, k) // live minimum
          case Some((cur, _)) =>
            // stale-low: correct to the current estimate and retry
            heap.enqueue((cur, k)); heapEst.update(k, cur)
          case None =>
            heapEst.remove(k) // item no longer tracked
        }
      }
      // else: superseded duplicate — discard
    }
    throw new IllegalStateException("unreachable")
  }

  /** Minimum estimate, defined as 0 while slots remain open. */
  def minEst: Long =
    if (items.size < capacity) 0L
    else {
      ensureHeap()
      val (e, k) = popMin()
      heapPush(e, k) // peek semantics: put the live min back
      e
    }

  def update(v: Long): Unit = items.get(v) match {
    case Some((est, err)) => items.update(v, (est + 1, err)) // heap entry goes stale-low
    case None if items.size < capacity =>
      items.update(v, (1L, 0L)); heapPush(1L, v)
    case None =>
      ensureHeap()
      val (vEst, victim) = popMin()
      items.remove(victim)
      items.update(v, (vEst + 1, vEst))
      heapPush(vEst + 1, v)
  }

  def merge(o: SpaceSavingState): Unit = {
    if (o.items.isEmpty) return
    val mA = minEst
    val mB = o.minEst
    val union = mutable.LongMap.empty[(Long, Long)]
    items.foreach { case (k, (est, err)) =>
      o.items.get(k) match {
        case Some((oe, or)) => union.update(k, (est + oe, err + or))
        case None => union.update(k, (est + mB, err + mB))
      }
    }
    o.items.foreach { case (k, (oe, or)) =>
      if (!union.contains(k)) union.update(k, (oe + mA, or + mA))
    }
    items.clear()
    heap = null; heapEst = null // wholesale rebuild — heap re-derives lazily
    if (union.size <= capacity) union.foreach { case (k, v) => items.update(k, v) }
    else {
      // trim to capacity by (est desc, item asc) — deterministic
      union.toSeq.sortBy { case (k, (est, _)) => (-est, k) }
        .take(capacity).foreach { case (k, v) => items.update(k, v) }
    }
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(capacity)
    out.writeInt(items.size)
    items.foreach { case (k, (est, err)) =>
      out.writeLong(k); out.writeLong(est); out.writeLong(err)
    }
    out.flush()
    bos.toByteArray
  }
}

object SpaceSavingState {
  def deserialize(bytes: Array[Byte]): SpaceSavingState = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val st = new SpaceSavingState(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { st.items.update(in.readLong(), (in.readLong(), in.readLong())); i += 1 }
    st
  }
}

/** `heavy_hitters(item, capacity, k)` — Catalyst TypedImperativeAggregate
  * producing the top-`k` summary entries as
  * `array<struct<item:bigint, est:bigint, err:bigint>>`, ordered
  * (est desc, item asc). Plans like any native aggregate: partial
  * summaries build map-side, the serialized sketch (≤ capacity entries)
  * is all that crosses the exchange — at 100 TB the shuffle carries one
  * bounded byte blob per partition per group, never the item stream. */
case class HeavyHitters(child: Expression, capacity: Int, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingState] {

  require(capacity >= 1 && k >= 1 && k <= capacity,
    s"need 1 <= k ($k) <= capacity ($capacity)")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"heavy_hitters needs a BIGINT item column, got ${child.dataType}")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", LongType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "heavy_hitters"

  override def createAggregationBuffer(): SpaceSavingState = new SpaceSavingState(capacity)

  override def update(buffer: SpaceSavingState, input: InternalRow): SpaceSavingState = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: SpaceSavingState, other: SpaceSavingState): SpaceSavingState = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: SpaceSavingState): Any = {
    val top = buffer.items.toSeq
      .sortBy { case (item, (est, _)) => (-est, item) }
      .take(k)
      .map { case (item, (est, err)) => InternalRow(item, est, err) }
    new GenericArrayData(top.toArray[Any])
  }

  override def serialize(buffer: SpaceSavingState): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): SpaceSavingState =
    SpaceSavingState.deserialize(bytes)

  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHitters = copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
}

/** `heavy_hitters_sketch(item, capacity)` — the MERGEABLE-STATE form of
  * [[HeavyHitters]]: identical update/merge, but eval emits the SERIALIZED
  * summary (binary) instead of finalizing to top-k. This is the column a
  * SummingMergeTree-style streaming MV stores per group per micro-batch:
  * partials stay mergeable across batches, and read-time
  * [[HeavyHittersMerge]] folds them and finalizes. The blob is ≤ capacity
  * entries (24 bytes each + header) regardless of stream length. */
case class HeavyHittersSketch(child: Expression, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingState] {

  require(capacity >= 1, s"need capacity >= 1, got $capacity")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"heavy_hitters_sketch needs a BIGINT item column, got ${child.dataType}")
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "heavy_hitters_sketch"

  override def createAggregationBuffer(): SpaceSavingState = new SpaceSavingState(capacity)
  override def update(buffer: SpaceSavingState, input: InternalRow): SpaceSavingState = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Long])
    buffer
  }
  override def merge(buffer: SpaceSavingState, other: SpaceSavingState): SpaceSavingState = {
    buffer.merge(other); buffer
  }
  override def eval(buffer: SpaceSavingState): Any = buffer.serialize()
  override def serialize(buffer: SpaceSavingState): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): SpaceSavingState =
    SpaceSavingState.deserialize(bytes)

  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHittersSketch = copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersSketch =
    copy(inputAggBufferOffset = newOffset)
}

/** `heavy_hitters_merge(sketch, capacity, k)` — fold serialized
  * [[HeavyHittersSketch]] blobs (one row per partial) back into one
  * summary and finalize to the top-k array, same output type and ordering
  * as [[HeavyHitters]]. The mergeable-summaries bounds survive every
  * fold, so batch-at-once and cross-micro-batch merge trees agree at the
  * guarantee level (and exactly, in the no-eviction regime). `capacity`
  * must match the sketches' — a mixed-capacity merge has no sound bound,
  * so it throws rather than guessing. */
case class HeavyHittersMerge(child: Expression, capacity: Int, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingState] {

  require(capacity >= 1 && k >= 1 && k <= capacity,
    s"need 1 <= k ($k) <= capacity ($capacity)")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"heavy_hitters_merge needs a BINARY sketch column, got ${child.dataType}")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", LongType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "heavy_hitters_merge"

  override def createAggregationBuffer(): SpaceSavingState = new SpaceSavingState(capacity)
  override def update(buffer: SpaceSavingState, input: InternalRow): SpaceSavingState = {
    val v = child.eval(input)
    if (v != null) {
      val other = SpaceSavingState.deserialize(v.asInstanceOf[Array[Byte]])
      if (other.capacity != capacity)
        throw new IllegalArgumentException(
          s"heavy_hitters_merge(capacity=$capacity) fed a capacity-${other.capacity} " +
            "sketch — mixed capacities have no sound error bound")
      buffer.merge(other)
    }
    buffer
  }
  override def merge(buffer: SpaceSavingState, other: SpaceSavingState): SpaceSavingState = {
    buffer.merge(other); buffer
  }
  override def eval(buffer: SpaceSavingState): Any = {
    val top = buffer.items.toSeq
      .sortBy { case (item, (est, _)) => (-est, item) }
      .take(k)
      .map { case (item, (est, err)) => InternalRow(item, est, err) }
    new GenericArrayData(top.toArray[Any])
  }
  override def serialize(buffer: SpaceSavingState): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): SpaceSavingState =
    SpaceSavingState.deserialize(bytes)

  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHittersMerge = copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersMerge =
    copy(inputAggBufferOffset = newOffset)
}

/** `heavy_hitters_fold(sketch, capacity)` — fold serialized
  * [[HeavyHittersSketch]] blobs back into ONE blob without finalizing:
  * the MV-compaction aggregate (N per-micro-batch partials per group →
  * one partial), same mixed-capacity refusal as [[HeavyHittersMerge]].
  * Mergeable-summaries bounds survive the fold; below eviction the fold
  * is exact, so a compacted MV reads identically. */
case class HeavyHittersFold(child: Expression, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingState] {

  require(capacity >= 1, s"need capacity >= 1, got $capacity")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"heavy_hitters_fold needs a BINARY sketch column, got ${child.dataType}")
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "heavy_hitters_fold"

  override def createAggregationBuffer(): SpaceSavingState = new SpaceSavingState(capacity)
  override def update(buffer: SpaceSavingState, input: InternalRow): SpaceSavingState = {
    val v = child.eval(input)
    if (v != null) {
      val other = SpaceSavingState.deserialize(v.asInstanceOf[Array[Byte]])
      if (other.capacity != capacity)
        throw new IllegalArgumentException(
          s"heavy_hitters_fold(capacity=$capacity) fed a capacity-${other.capacity} " +
            "sketch — mixed capacities have no sound error bound")
      buffer.merge(other)
    }
    buffer
  }
  override def merge(buffer: SpaceSavingState, other: SpaceSavingState): SpaceSavingState = {
    buffer.merge(other); buffer
  }
  override def eval(buffer: SpaceSavingState): Any = buffer.serialize()
  override def serialize(buffer: SpaceSavingState): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): SpaceSavingState =
    SpaceSavingState.deserialize(bytes)

  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHittersFold = copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersFold =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersFold =
    copy(inputAggBufferOffset = newOffset)
}

object HeavyHitters {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** MV-compaction fold: `heavyHittersFold(sketchCol, capacity)` → binary. */
  def heavyHittersFold(sketch: Column, capacity: Int): Column =
    ColumnBridge.column(
      HeavyHittersFold(ColumnBridge.expression(sketch), capacity)
        .toAggregateExpression())

  /** Column-API entry point: `heavyHitters(col, capacity, k)`. */
  def heavyHitters(item: Column, capacity: Int, k: Int): Column =
    ColumnBridge.column(
      HeavyHitters(ColumnBridge.expression(item), capacity, k)
        .toAggregateExpression())

  /** Mergeable partial: `heavyHittersSketch(col, capacity)` → binary. */
  def heavyHittersSketch(item: Column, capacity: Int): Column =
    ColumnBridge.column(
      HeavyHittersSketch(ColumnBridge.expression(item), capacity)
        .toAggregateExpression())

  /** Read-time finalize: `heavyHittersMerge(sketchCol, capacity, k)`. */
  def heavyHittersMerge(sketch: Column, capacity: Int, k: Int): Column =
    ColumnBridge.column(
      HeavyHittersMerge(ColumnBridge.expression(sketch), capacity, k)
        .toAggregateExpression())
}
