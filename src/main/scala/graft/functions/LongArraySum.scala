package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Element-wise sum of fixed-length long arrays — the bounded-state way
  * to aggregate a dense vector of counters (a gram/covariance upper
  * triangle, a histogram, per-dimension sums) in ONE pass.
  *
  * The declarative spelling — `posexplode` the array then `groupBy(pos)`
  * — shuffles N·n rows (at 10^12 rows × 2080 gram cells that is 2·10^15
  * shuffle records); this aggregate instead keeps one n-long buffer per
  * task, partial aggregation applies (map-side combine), and the shuffle
  * carries exactly n longs per partition regardless of row count. Merge
  * is element-wise add — associative and commutative — so the result is
  * identical under any partitioning or AQE re-plan. Callers quantize
  * per-row values to longs BEFORE this sum (the established
  * fixed-point-before-the-cross-row-sum pattern), keeping the whole
  * aggregation exact integer math.
  *
  * Input rows must be non-null arrays of exactly `n` non-null longs
  * (null rows are skipped like built-in aggregates; a wrong length is a
  * caller bug and throws).
  */
case class LongArraySum(
    child: Expression,
    n: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(n >= 1, "n must be >= 1")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](n)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == n,
        s"long_array_sum expects arrays of length $n, got ${arr.numElements()}")
      var i = 0
      while (i < n) { buf(i) += arr.getLong(i); i += 1 }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < n) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * n)
    var i = 0
    while (i < n) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(n)(bb.getLong)
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LongArraySum = copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(o: Int): LongArraySum =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): LongArraySum =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "long_array_sum"
}
