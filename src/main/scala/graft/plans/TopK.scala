package graft.plans

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k buffer over (score, id) pairs, ordered score DESC
  * then id ASC — row_number semantics with a total tiebreak, so the
  * result is deterministic and SQL-oracle-checkable.
  *
  * Kept sorted with O(k) insertion (k is small — single-digit for
  * "top-3 per brand" shapes), merged by one linear pass. The whole
  * buffer is ≤ k pairs of longs regardless of input size — that bound
  * is the scale story (see [[TopKLongPairs]]).
  */
final class TopKPairsBuffer(val k: Int) extends Serializable {
  import scala.collection.mutable.ArrayBuffer
  private[plans] val items = ArrayBuffer.empty[(Long, Long)]

  /** Read-only view of the kept pairs (test/introspection surface). */
  def pairs: Seq[(Long, Long)] = items.toSeq

  @inline private def beats(s1: Long, i1: Long, s2: Long, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  def add(score: Long, id: Long): Unit = {
    if (items.length == k && !beats(score, id, items.last._1, items.last._2)) return
    var pos = items.length
    while (pos > 0 && beats(score, id, items(pos - 1)._1, items(pos - 1)._2)) pos -= 1
    items.insert(pos, (score, id))
    if (items.length > k) items.remove(k)
  }

  /** Merge-sort two sorted buffers, keep the best k. */
  def merge(o: TopKPairsBuffer): TopKPairsBuffer = {
    if (o.items.nonEmpty) {
      val merged = new scala.collection.mutable.ArrayBuffer[(Long, Long)](k)
      var i = 0; var j = 0
      while (merged.length < k && (i < items.length || j < o.items.length)) {
        val takeLeft = j >= o.items.length || (i < items.length &&
          beats(items(i)._1, items(i)._2, o.items(j)._1, o.items(j)._2))
        if (takeLeft) { merged += items(i); i += 1 } else { merged += o.items(j); j += 1 }
      }
      items.clear()
      items ++= merged
    }
    this
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(k)
    out.writeInt(items.length)
    items.foreach { case (s, id) => out.writeLong(s); out.writeLong(id) }
    out.flush()
    bos.toByteArray
  }
}

object TopKPairsBuffer {
  def deserialize(bytes: Array[Byte]): TopKPairsBuffer = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val b = new TopKPairsBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { b.items += ((in.readLong(), in.readLong())); i += 1 }
    b
  }
}

/** Grouped top-k as a real distributed AGGREGATE instead of a window:
  * `topk_pairs(score, id, k)` → `array<struct<score, id>>` sorted
  * score DESC, id ASC.
  *
  * The windowed top-N pattern (`row_number() OVER (PARTITION BY g
  * ORDER BY score DESC)` ≤ k) shuffles and SORTS every row of every
  * group. This aggregate runs through Spark's partial-aggregate
  * machinery: each map task keeps a k-bounded heap per group, the
  * shuffle carries ≤ k pairs per (task, group) instead of the whole
  * group, and the final merge is a linear pass — no sort of the group
  * anywhere. At 100 TB with millions of rows per group, the window
  * sorts ~all bytes; this moves ~k rows per map partition.
  *
  * Scores are exact fixed-point longs (callers scale decimals by
  * 10^s), so ordering is total and engine-exact — the DuckDB oracle
  * replays the ranking with a row_number window over the same
  * integers. Fourth rung of the custom-extension ladder (scalar
  * codegen kernels → whole-operator AsOfJoin → t-digest sketch agg →
  * bounded-state exact agg).
  */
case class TopKLongPairs(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKPairsBuffer] with BinaryLike[Expression] {

  override def left: Expression = score
  override def right: Expression = id

  override def checkInputDataTypes(): TypeCheckResult =
    if (k <= 0) TypeCheckResult.TypeCheckFailure(s"topk_pairs needs k > 0, got $k")
    else (score.dataType, id.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"topk_pairs expects (bigint, bigint) arguments, got $other")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", LongType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "topk_pairs"

  override def createAggregationBuffer(): TopKPairsBuffer = new TopKPairsBuffer(k)

  override def update(buffer: TopKPairsBuffer, input: InternalRow): TopKPairsBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) buffer.add(s.asInstanceOf[Long], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKPairsBuffer, other: TopKPairsBuffer): TopKPairsBuffer =
    buffer.merge(other)

  override def eval(buffer: TopKPairsBuffer): Any =
    if (buffer.items.isEmpty) null
    else new GenericArrayData(buffer.items.map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i))
    }.toArray[Any])

  override def serialize(buffer: TopKPairsBuffer): Array[Byte] = buffer.serialize()
  override def deserialize(storageFormat: Array[Byte]): TopKPairsBuffer =
    TopKPairsBuffer.deserialize(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKLongPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKLongPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): TopKLongPairs =
    copy(score = newLeft, id = newRight)
}

object TopKLongPairs {
  /** Column API: bounded exact top-k of (score, id) per group. */
  def apply(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKLongPairs(ColumnBridge.expression(score), ColumnBridge.expression(id), k)
        .toAggregateExpression())
}
