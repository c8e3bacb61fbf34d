package graft.img

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Deterministic spatial image augmentations (the geometric transform
  * family every vision training pipeline applies at ingest: rotations,
  * mirror flips, central crop). Pure pixel permutations / subsets on the
  * decoded BGR raster — no resampling, no interpolation — so every output
  * pixel equals some input pixel exactly and the whole transform is
  * verifiable by integer index arithmetic (the q67 oracle re-derives the
  * source→destination coordinate map in SQL over a raw-pixel sidecar and
  * recomputes position-weighted checksums).
  *
  * Coordinate convention matches [[Raster]]: row-major from the top row,
  * (y, x) = (row, col). "rot90" is clockwise. "crop_c" is the central
  * half-crop (x0 = w/4, size w/2 — integer division, so odd sizes bias
  * one pixel toward the origin, same as the SQL `//`).
  */
object Augment {

  val kinds: Seq[String] =
    Seq("rot90", "rot180", "rot270", "flip_h", "flip_v", "crop_c")

  def apply(r: Raster, kind: String): Raster = {
    val (w, h, ch) = (r.w, r.h, r.channels)
    def build(dw: Int, dh: Int)(src: (Int, Int) => Int): Raster = {
      // src maps DESTINATION (y, x) -> source pixel offset (pre-channel)
      val out = new Array[Byte](dw * dh * ch)
      var y = 0
      while (y < dh) {
        var x = 0
        while (x < dw) {
          val so = src(y, x) * ch
          val dOff = (y * dw + x) * ch
          var c = 0
          while (c < ch) { out(dOff + c) = r.data(so + c); c += 1 }
          x += 1
        }
        y += 1
      }
      Raster(out, dw, dh, ch)
    }
    kind match {
      case "rot90" => build(h, w)((y, x) => (h - 1 - x) * w + y)
      case "rot180" => build(w, h)((y, x) => (h - 1 - y) * w + (w - 1 - x))
      case "rot270" => build(h, w)((y, x) => x * w + (w - 1 - y))
      case "flip_h" => build(w, h)((y, x) => y * w + (w - 1 - x))
      case "flip_v" => build(w, h)((y, x) => (h - 1 - y) * w + x)
      case "crop_c" => build(w / 2, h / 2)((y, x) => (h / 4 + y) * w + (w / 4 + x))
      case other => throw new IllegalArgumentException(s"unknown augmentation '$other'")
    }
  }
}

/** augment_image(bytes, kind) -> PNG bytes of the transformed image. */
case class AugmentImage(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullSafeEval(bytes: Any, kind: Any): Any =
    try Codec.encodePNG(Augment(Codec.decodeBGR(bytes.asInstanceOf[Array[Byte]]),
      kind.toString))
    catch { case scala.util.control.NonFatal(_) => null }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** pixel_checksum(bytes) -> (w, h, sum_b, sum_g, sum_r, wsum) with
  * wsum = Σ (rowMajorIndex + 1) · (b + g + r) — position-weighted, so it
  * pins the EXACT pixel permutation, not just the multiset of values
  * (a flip that landed pixels in the wrong place changes wsum even
  * though every per-channel sum is invariant). All integer. */
case class PixelChecksum(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("w", IntegerType, nullable = false),
    StructField("h", IntegerType, nullable = false),
    StructField("sum_b", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("wsum", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    try {
      val r = Codec.decodeBGR(v.asInstanceOf[Array[Byte]])
      var (sb, sg, sr, ws) = (0L, 0L, 0L, 0L)
      var i = 0
      val n = r.w * r.h
      while (i < n) {
        val b = r.data(i * 3) & 0xff
        val g = r.data(i * 3 + 1) & 0xff
        val rr = r.data(i * 3 + 2) & 0xff
        sb += b; sg += g; sr += rr
        ws += (i + 1).toLong * (b + g + rr)
        i += 1
      }
      InternalRow(r.w, r.h, sb, sg, sr, ws)
    } catch { case scala.util.control.NonFatal(_) => null }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
