package graft.kernel

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import graft.img.{Codec, Raster}

/** Per-tile connected-component labeling of a vegetation mask — the
  * local half of the classic two-level distributed CCL: each tile is
  * labeled independently (4-connectivity union-find over the kernel's
  * per-pixel classification), then component fragments that touch a tile
  * edge are stitched across tiles by a boundary equi-join feeding
  * [[graft.functions.ConnectedComponents]] over the LABEL graph (tiny —
  * O(fragments), never O(pixels)). That split is what makes CCL feasible
  * on a 10^12-tile mosaic: pixels never shuffle, only per-fragment stats
  * and 4·ts boundary labels per tile.
  *
  * Local labels are deterministic: fragments are numbered by the
  * raster-scan position of their first pixel, so the global node id
  * (tile cell, local label) is reproducible under any partitioning —
  * the q108 oracle recomputes the whole merge from the sidecar and must
  * agree on ids, not just sizes.
  */
object TileCcl {

  /** Label one decoded tile. Returns (sizes, left, right, top, bottom):
    * sizes(l) = pixel count of local fragment l (raster-scan numbered);
    * the four side arrays give the local label at each boundary pixel of
    * that side (top/bottom indexed by column, left/right by row), or -1
    * where the boundary pixel is not vegetation. */
  def label(r: Raster, kernel: IndexKernel): (Array[Long], Array[Int], Array[Int], Array[Int], Array[Int]) = {
    val w = r.w; val h = r.h; val n = w * h
    val mask = new Array[Boolean](n)
    var i = 0
    while (i < n) { mask(i) = kernel.classify(r.data, i * r.channels) == 1; i += 1 }
    // union-find with path halving
    val parent = Array.tabulate(n)(identity)
    def find(x0: Int): Int = {
      var x = x0
      while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
      x
    }
    def union(a: Int, b: Int): Unit = {
      val ra = find(a); val rb = find(b)
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = y * w + x
        if (mask(p)) {
          if (x > 0 && mask(p - 1)) union(p, p - 1)
          if (y > 0 && mask(p - w)) union(p, p - w)
        }
        x += 1
      }
      y += 1
    }
    // raster-scan numbering: a root is first seen at its smallest pixel
    val localOf = new java.util.HashMap[Integer, Integer]()
    val sizesBuf = scala.collection.mutable.ArrayBuffer.empty[Long]
    val local = new Array[Int](n)
    i = 0
    while (i < n) {
      if (mask(i)) {
        val root = find(i)
        var l = localOf.get(root)
        if (l == null) { l = sizesBuf.length; localOf.put(root, l); sizesBuf += 0L }
        sizesBuf(l) += 1L
        local(i) = l
      } else local(i) = -1
      i += 1
    }
    val left = Array.tabulate(h)(row => local(row * w))
    val right = Array.tabulate(h)(row => local(row * w + w - 1))
    val top = Array.tabulate(w)(c => local(c))
    val bottom = Array.tabulate(w)(c => local((h - 1) * w + c))
    (sizesBuf.toArray, left, right, top, bottom)
  }
}

/** Catalyst expression: decode an image payload, classify each pixel
  * with `kernelName`, label 4-connected vegetation fragments, and emit
  * (sizes, left, right, top, bottom) as one struct — one decode per tile
  * for both the stats and all four boundaries. */
case class TileComponents(child: Expression, kernelName: String)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with CodegenFallback {

  @transient private lazy val kernel: IndexKernel = Kernels.all(kernelName)

  override def dataType: DataType = StructType(Seq(
    StructField("sizes", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("left", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("right", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("top", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("bottom", ArrayType(IntegerType, containsNull = false), nullable = false)))

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[Array[Byte]]
    val (sizes, l, r, t, b) = TileCcl.label(Codec.decodeBGR(bytes), kernel)
    InternalRow(
      new GenericArrayData(sizes),
      new GenericArrayData(l.map(_.asInstanceOf[Any])),
      new GenericArrayData(r.map(_.asInstanceOf[Any])),
      new GenericArrayData(t.map(_.asInstanceOf[Any])),
      new GenericArrayData(b.map(_.asInstanceOf[Any])))
  }

  override protected def withNewChildInternal(c: Expression): TileComponents = copy(child = c)
}
