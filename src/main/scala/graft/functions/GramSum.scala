package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Fused upper-triangle gram aggregation: for each input vector e of
  * length `dim`, adds floor(e_i · e_j · 2^20) (i ≤ j, row-major triangle
  * order) into a fixed dim·(dim+1)/2-long buffer — ONE pass, bounded
  * state, map-side combine, exactly like [[LongArraySum]].
  *
  * Why not `transform`-build the 2080-cell array per row and feed
  * [[LongArraySum]] (the former gramFrame spelling)? The nested
  * higher-order transforms run interpreted lambdas per CELL and allocate
  * a 16 KB scratch array per ROW — at corpus scale that per-row garbage
  * is the dominant cost of the whole statistic. This aggregate reads the
  * raw embedding array once and accumulates in place: zero per-row
  * allocation, primitive loops.
  *
  * The cell math is OPERATION-IDENTICAL to the expression spelling (and
  * the DuckDB oracle): (e_i · e_j) · 1048576.0 in doubles, floor, to
  * long — IEEE doubles make every engine agree bit-for-bit. Float
  * inputs widen per element first, mirroring
  * `transform(embedding, x -> CAST(x AS DOUBLE))`. Null rows are
  * skipped like built-in aggregates; a wrong length is a caller bug and
  * throws. */
case class GramSum(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(dim >= 1, "dim must be >= 1")
  private val n = dim * (dim + 1) / 2

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(s"vector type $other unsupported")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](n)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == dim,
        s"gram_sum expects vectors of length $dim, got ${arr.numElements()}")
      val e = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        e(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        i += 1
      }
      var p = 0
      i = 0
      while (i < dim) {
        val xi = e(i)
        var j = i
        while (j < dim) {
          buf(p) += math.floor(xi * e(j) * 1048576.0).toLong
          p += 1
          j += 1
        }
        i += 1
      }
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
      newChildren: IndexedSeq[Expression]): GramSum = copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(o: Int): GramSum =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramSum =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "gram_sum"
}
