package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded KMV / theta-sketch builder: the k smallest DISTINCT values of
  * a long column, as one sorted array (Bar-Yossef et al., RANDOM 2002).
  *
  * This is the aggregate that makes a KMV sketch scale-honest. The naive
  * formulation — `distinct().orderBy(h).limit(k)` — computes the k minima
  * correctly but pays a full-ndv exchange first: every distinct hash in
  * the corpus is shuffled just so a TakeOrdered can throw all but k away.
  * At 1e9+ ndv that is exactly the shuffle a sketch exists to avoid. Here
  * the k-minima set IS the aggregation buffer: each map task keeps a
  * size-≤k ordered set (distinct by construction), partial aggregation
  * trims before anything is serialized, and the shuffle carries at most
  * one k-long buffer per map partition. Merge is associative/commutative
  * (union, re-trim), so the plan is a standard partial/final agg —
  * identical semantics, shuffle bounded by k × partitions instead of ndv.
  *
  * Buffer ops are O(log k) per row with an early reject (value ≥ current
  * k-th minimum never enters the set), so the per-row cost approaches a
  * single comparison once the buffer saturates.
  */
case class KMinima(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 1, "k must be at least 1")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    // early reject: once saturated, anything ≥ the current k-th minimum
    // can never be one of the k minima
    if (buf.size() < k || v < buf.last()) {
      buf.add(v)
      if (buf.size() > k) buf.pollLast()
    }
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    var open = true
    while (open && it.hasNext) {
      val v = it.next().longValue()
      // `other` iterates ascending, so the first rejected value ends the merge
      if (buf.size() < k || v < buf.last()) add(buf, v) else open = false
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size())
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size())
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong()); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "k_minima"

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinima =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinima =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): KMinima =
    copy(child = c)
}

object KMinima {
  /** The k smallest distinct values of `c` (a long column) as one sorted
    * ascending array — use under `select`/`agg` like any aggregate.
    */
  def column(c: Column, k: Int): Column =
    ColumnBridge.column(
      KMinima(ColumnBridge.expression(c), k).toAggregateExpression())
}
