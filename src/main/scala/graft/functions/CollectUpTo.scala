package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bounded collect: gathers the group's long values into an array,
  * keeping AT MOST `limit` of them — every partial and merged buffer is
  * hard-capped, so no group can ever hold more than `limit` elements in
  * memory or ship more than `limit * bytesPerValue` per map task across
  * the shuffle, no matter how hot the key.
  *
  * This is the skew-safe sibling of `collect_list`, built for
  * cap-then-keep patterns (see Dedup.cappedKeyed): pair it with a
  * `count` in the same aggregation and filter groups to `count <=
  * limit - 1` afterwards — for every group that SURVIVES the filter the
  * collected array is provably complete (truncation can only have
  * occurred once the buffer exceeded the filter's threshold), so the
  * bound costs nothing in exactness on the kept groups.
  *
  * Which values survive truncation for dropped groups is
  * partition-order-dependent and therefore nondeterministic — callers
  * must only consume arrays of groups whose count passed the filter.
  */
case class CollectUpTo(
    child: Expression,
    limit: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[Long]]
    with UnaryLike[Expression] {

  require(limit > 0, "limit must be positive")

  override def createAggregationBuffer(): scala.collection.mutable.ArrayBuffer[Long] =
    // groups are overwhelmingly far below the cap (the point of the
    // cap), so start tiny and grow — a fixed limit-sized slab per live
    // hash-map group would multiply map-side memory by limit
    new scala.collection.mutable.ArrayBuffer[Long](4)

  override def update(
      buf: scala.collection.mutable.ArrayBuffer[Long],
      input: InternalRow): scala.collection.mutable.ArrayBuffer[Long] = {
    if (buf.length < limit) {
      val v = child.eval(input)
      if (v != null) buf += v.asInstanceOf[Long]
    }
    buf
  }

  override def merge(
      buf: scala.collection.mutable.ArrayBuffer[Long],
      other: scala.collection.mutable.ArrayBuffer[Long])
      : scala.collection.mutable.ArrayBuffer[Long] = {
    var i = 0
    while (i < other.length && buf.length < limit) { buf += other(i); i += 1 }
    buf
  }

  override def eval(buf: scala.collection.mutable.ArrayBuffer[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: scala.collection.mutable.ArrayBuffer[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.ArrayBuffer[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new scala.collection.mutable.ArrayBuffer[Long](n)
    var i = 0
    while (i < n) { buf += bb.getLong; i += 1 }
    buf
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"collect_up_to requires a BIGINT child, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "collect_up_to"

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectUpTo =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectUpTo =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CollectUpTo =
    copy(child = newChild)
}

object CollectUpTo {

  /** Column-level entry point: `collectUpTo($"id", 501)`. */
  def apply(c: Column, limit: Int): Column =
    GraftColumnBridge.column(
      new CollectUpTo(GraftColumnBridge.expression(c), limit).toAggregateExpression())
}
