package graft.img

/** Image resampling, following OpenCV's geometric conventions
  * (center-aligned mapping src = (dst + 0.5) * scale - 0.5).
  * Used for shape-mismatch normalisation (reference:
  * image_loaders.py:225 cv2.resize default INTER_LINEAR), the CIR->RGB
  * Ir upscale (image_loaders.py:382-383 INTER_CUBIC) and thumbnails
  * (generate_coverage.py:100-102 INTER_AREA). Lossless goldens in the
  * reference only pin constant-valued resizes; non-constant parity is
  * floating-point-level, covered by the PSNR criterion for lossy paths. */
object Resize {

  /** Bilinear resize of an interleaved raster (cv2 default). */
  def bilinear(r: Raster, dw: Int, dh: Int): Raster = {
    val out = new Array[Byte](dw * dh * r.channels)
    val sx = r.w.toDouble / dw
    val sy = r.h.toDouble / dh
    var y = 0
    while (y < dh) {
      val fy = (y + 0.5) * sy - 0.5
      val y0 = math.max(0, math.min(r.h - 1, math.floor(fy).toInt))
      val y1 = math.min(r.h - 1, y0 + 1)
      val wy = math.max(0.0, math.min(1.0, fy - y0))
      var x = 0
      while (x < dw) {
        val fx = (x + 0.5) * sx - 0.5
        val x0 = math.max(0, math.min(r.w - 1, math.floor(fx).toInt))
        val x1 = math.min(r.w - 1, x0 + 1)
        val wx = math.max(0.0, math.min(1.0, fx - x0))
        var c = 0
        while (c < r.channels) {
          val p00 = r.data(r.pixelOffset(y0, x0) + c) & 0xff
          val p01 = r.data(r.pixelOffset(y0, x1) + c) & 0xff
          val p10 = r.data(r.pixelOffset(y1, x0) + c) & 0xff
          val p11 = r.data(r.pixelOffset(y1, x1) + c) & 0xff
          val v = (p00 * (1 - wx) + p01 * wx) * (1 - wy) + (p10 * (1 - wx) + p11 * wx) * wy
          out((y * dw + x) * r.channels + c) = clamp(math.rint(v).toInt)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    Raster(out, dw, dh, r.channels)
  }

  /** Bicubic (Catmull-Rom with a = -0.75, OpenCV's kernel) on a single plane.
    * Column weights/anchors depend only on x, so they are precomputed once
    * per image instead of once per PIXEL — the per-pixel 4-double
    * allocation dominated the Ir-fusion hot path (65k allocations per
    * 256px tile). Identical values in the identical accumulation order:
    * outputs are bit-for-bit unchanged. */
  def bicubicPlane(plane: Array[Byte], sw: Int, sh: Int, dw: Int, dh: Int): Array[Byte] =
    bicubicPlaneWindow(plane, sw, sh, dw, dh, 0, 0, dw - 1, dh - 1)

  /** [[bicubicPlane]] restricted to the destination window
    * [x0..x1]×[y0..y1] (inclusive, caller-clamped): each computed pixel's
    * weights depend only on its absolute position, so window pixels are
    * bit-identical to a full-plane upscale; pixels outside stay 0. The
    * fused-join path uses this to upscale only the union of fragment
    * windows instead of whole tiles. */
  def bicubicPlaneWindow(plane: Array[Byte], sw: Int, sh: Int, dw: Int, dh: Int,
                         wx0: Int, wy0: Int, wx1: Int, wy1: Int): Array[Byte] = {
    val out = new Array[Byte](dw * dh)
    if (wx0 > wx1 || wy0 > wy1) return out
    val sx = sw.toDouble / dw
    val sy = sh.toDouble / dh
    // per-column clamped tap indices (4 per column) and weights
    val colXx = new Array[Int](dw * 4)
    val colW = new Array[Array[Double]](dw)
    var cx = wx0
    while (cx <= wx1) {
      val fx = (cx + 0.5) * sx - 0.5
      val ix = math.floor(fx).toInt
      colW(cx) = cubicWeights(fx - ix)
      var n = 0
      while (n < 4) { colXx(cx * 4 + n) = clampIdx(ix - 1 + n, sw); n += 1 }
      cx += 1
    }
    val rowBase = new Array[Int](4)
    var y = wy0
    while (y <= wy1) {
      val fy = (y + 0.5) * sy - 0.5
      val iy = math.floor(fy).toInt
      val ty = fy - iy
      val wys = cubicWeights(ty)
      var m = 0
      while (m < 4) { rowBase(m) = clampIdx(iy - 1 + m, sh) * sw; m += 1 }
      val outBase = y * dw
      var x = wx0
      while (x <= wx1) {
        val wxs = colW(x)
        val x4 = x * 4
        var acc = 0.0
        m = 0
        while (m < 4) {
          val base = rowBase(m)
          val rowAcc =
            wxs(0) * (plane(base + colXx(x4)) & 0xff) +
              wxs(1) * (plane(base + colXx(x4 + 1)) & 0xff) +
              wxs(2) * (plane(base + colXx(x4 + 2)) & 0xff) +
              wxs(3) * (plane(base + colXx(x4 + 3)) & 0xff)
          acc += wys(m) * rowAcc
          m += 1
        }
        out(outBase + x) = clamp(math.rint(acc).toInt)
        x += 1
      }
      y += 1
    }
    out
  }

  private def cubicWeights(t: Double): Array[Double] = {
    val a = -0.75
    val w = new Array[Double](4)
    w(0) = ((a * (t + 1) - 5 * a) * (t + 1) + 8 * a) * (t + 1) - 4 * a
    w(1) = ((a + 2) * t - (a + 3)) * t * t + 1
    w(2) = ((a + 2) * (1 - t) - (a + 3)) * (1 - t) * (1 - t) + 1
    w(3) = 1.0 - w(0) - w(1) - w(2)
    w
  }

  /** Area-averaging downsample (cv2 INTER_AREA for shrink). */
  def area(r: Raster, dw: Int, dh: Int): Raster = {
    val out = new Array[Byte](dw * dh * r.channels)
    val sx = r.w.toDouble / dw
    val sy = r.h.toDouble / dh
    var y = 0
    while (y < dh) {
      val y0 = y * sy; val y1 = (y + 1) * sy
      var x = 0
      while (x < dw) {
        val x0 = x * sx; val x1 = (x + 1) * sx
        var c = 0
        while (c < r.channels) {
          var acc = 0.0; var wsum = 0.0
          var yy = math.floor(y0).toInt
          while (yy < math.ceil(y1).toInt && yy < r.h) {
            val wy = math.min(yy + 1.0, y1) - math.max(yy.toDouble, y0)
            var xx = math.floor(x0).toInt
            while (xx < math.ceil(x1).toInt && xx < r.w) {
              val wx = math.min(xx + 1.0, x1) - math.max(xx.toDouble, x0)
              acc += wx * wy * (r.data(r.pixelOffset(yy, xx) + c) & 0xff)
              wsum += wx * wy
              xx += 1
            }
            yy += 1
          }
          out((y * dw + x) * r.channels + c) = clamp(math.rint(acc / wsum).toInt)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    Raster(out, dw, dh, r.channels)
  }

  private def clampIdx(i: Int, n: Int): Int = if (i < 0) 0 else if (i >= n) n - 1 else i
  private def clamp(v: Int): Byte = (if (v < 0) 0 else if (v > 255) 255 else v).toByte
}
