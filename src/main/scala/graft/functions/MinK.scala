package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bounded-state "K smallest longs per group" aggregate — the
  * scale-correct way to materialize posting-list HEADS (q94), per-key
  * samples, or any "first K ids per key" column at 100 TB.
  *
  * The two declarative spellings both break at scale: `row_number()
  * OVER (PARTITION BY key)` materializes and sorts EVERY row of a hot
  * key inside one task (window partitions are not AQE-splittable — a
  * stopword's billion postings land on one core), and
  * `slice(sort_array(collect_list(id)), 1, K)` has unbounded
  * per-group aggregation state before the slice. This
  * TypedImperativeAggregate keeps a size-capped max-heap instead:
  * update is O(log K) against O(K) state no matter how many rows the
  * group has, partial aggregation (map-side combine) applies — the
  * shuffle carries at most K longs per (partition, group) — and merge
  * is heap-merge + truncate, associative and commutative, so the
  * result is identical under any partitioning (the q94 oracle and the
  * differential spec pin this).
  *
  * Values must be non-null longs (q94 feeds distinct doc ids; nulls
  * are skipped like built-in aggregates). Output is the sorted
  * ascending array of the K smallest values.
  */
case class MinKLongs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[java.lang.Long]] {

  require(k >= 1, "k must be >= 1")

  override def createAggregationBuffer(): java.util.PriorityQueue[java.lang.Long] =
    new java.util.PriorityQueue[java.lang.Long](
      k + 1, java.util.Collections.reverseOrder[java.lang.Long]())

  private def add(buf: java.util.PriorityQueue[java.lang.Long], v: Long): Unit = {
    if (buf.size < k) buf.add(v)
    else if (buf.peek() > v) { buf.poll(); buf.add(v) }
  }

  override def update(
      buf: java.util.PriorityQueue[java.lang.Long],
      input: InternalRow): java.util.PriorityQueue[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.PriorityQueue[java.lang.Long],
      other: java.util.PriorityQueue[java.lang.Long]): java.util.PriorityQueue[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.PriorityQueue[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr)
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.PriorityQueue[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { add(buf, bb.getLong); i += 1 }
    buf
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinKLongs = copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(o: Int): MinKLongs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinKLongs =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "min_k_longs"
}
