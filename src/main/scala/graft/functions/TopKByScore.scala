package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Exact grouped top-k as an AGGREGATE: keeps the k best (score, id)
  * pairs per group under the total order (score DESC, id ASC).
  *
  * The rank-window formulation (`TopK.groupedTopK`) shuffles EVERY row
  * to its key's partition and sorts whole groups — correct, but at
  * 100 TB the shuffle moves the full fact and a hot key's sort
  * serializes in one task. This aggregate is the map-combine shape:
  * every partial buffer is capped at k, so at most k rows PER KEY PER
  * MAP PARTITION cross the shuffle and no sort ever exceeds k
  * elements. Unlike CollectUpTo's first-k cap (order-dependent on
  * overflow), top-k under a total order is partition-order INDEPENDENT
  * — the merged result is exact for every group.
  *
  * Returns array<struct<score double, id bigint>> sorted best-first;
  * explode for one row per survivor (see TopK.groupedTopKAgg).
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[(Double, Long)]]
    with BinaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def left: Expression = score
  override def right: Expression = id

  /** true when (s1, i1) ranks strictly better than (s2, i2). */
  @inline private def beats(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  override def createAggregationBuffer(): scala.collection.mutable.ArrayBuffer[(Double, Long)] =
    new scala.collection.mutable.ArrayBuffer[(Double, Long)](4)

  /** Insert keeping the buffer sorted best-first and capped at k —
    * O(k) per row, the right trade for the small k this exists for.
    */
  private def insert(
      buf: scala.collection.mutable.ArrayBuffer[(Double, Long)],
      s: Double, i: Long): Unit = {
    if (buf.length == k && !beats(s, i, buf.last._1, buf.last._2)) return
    var pos = buf.length
    while (pos > 0 && beats(s, i, buf(pos - 1)._1, buf(pos - 1)._2)) pos -= 1
    buf.insert(pos, (s, i))
    if (buf.length > k) buf.remove(buf.length - 1)
  }

  override def update(
      buf: scala.collection.mutable.ArrayBuffer[(Double, Long)],
      input: InternalRow): scala.collection.mutable.ArrayBuffer[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      insert(buf, s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: scala.collection.mutable.ArrayBuffer[(Double, Long)],
      other: scala.collection.mutable.ArrayBuffer[(Double, Long)])
      : scala.collection.mutable.ArrayBuffer[(Double, Long)] = {
    var i = 0
    while (i < other.length) { insert(buf, other(i)._1, other(i)._2); i += 1 }
    buf
  }

  override def eval(buf: scala.collection.mutable.ArrayBuffer[(Double, Long)]): Any =
    new GenericArrayData(buf.map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i))
    }.toArray[Any])

  override def serialize(
      buf: scala.collection.mutable.ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buf.length)
    bb.putInt(buf.length)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(
      bytes: Array[Byte]): scala.collection.mutable.ArrayBuffer[(Double, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new scala.collection.mutable.ArrayBuffer[(Double, Long)](n)
    var i = 0
    while (i < n) { buf += ((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk_by_score requires (DOUBLE score, BIGINT id), got " +
        s"${score.dataType.sql} / ${id.dataType.sql}")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_by_score"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByScore =
    copy(score = newLeft, id = newRight)
}

object TopKByScore {

  /** Column-level entry point: `TopKByScore(col("total"), col("user_id"), 3)`. */
  def apply(score: Column, id: Column, k: Int): Column =
    GraftColumnBridge.column(
      new TopKByScore(
        GraftColumnBridge.expression(score),
        GraftColumnBridge.expression(id), k).toAggregateExpression())
}
