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

  /** Minimum estimate, defined as 0 while slots remain open. */
  def minEst: Long =
    if (items.size < capacity) 0L
    else { var m = Long.MaxValue; items.foreachValue(v => if (v._1 < m) m = v._1); m }

  def update(v: Long): Unit = items.get(v) match {
    case Some((est, err)) => items.update(v, (est + 1, err))
    case None if items.size < capacity => items.update(v, (1L, 0L))
    case None =>
      // evict the min-est item; deterministic victim (min est, then min
      // item id) so a given merge tree always yields the same summary
      var victim = 0L; var vEst = Long.MaxValue
      items.foreach { case (k, (est, _)) =>
        if (est < vEst || (est == vEst && k < victim)) { victim = k; vEst = est }
      }
      items.remove(victim)
      items.update(v, (vEst + 1, vEst))
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

object HeavyHitters {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-API entry point: `heavyHitters(col, capacity, k)`. */
  def heavyHitters(item: Column, capacity: Int, k: Int): Column =
    ColumnBridge.column(
      HeavyHitters(ColumnBridge.expression(item), capacity, k)
        .toAggregateExpression())
}
