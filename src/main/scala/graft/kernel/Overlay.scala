package graft.kernel

import graft.img.{ColorSpace, Raster}

/** K15: debug overlay painting (reference: calculate_indices.py:10-18,
  * 66-94) — vegetation pixels painted green, out-of-mask pixels tinted
  * grey (grey*2+80), optionally painting the whole garden. Off the hot
  * path; used by the debug PNG sink (S11). */
object Overlay {

  /** tint_image: BGR -> grey (cv2 BGR2GRAY uint8) * 2 + 80, clipped. */
  def tint(img: Raster): Raster = {
    require(img.channels >= 3)
    val out = new Array[Byte](img.w * img.h * 3)
    var i = 0
    val n = img.w * img.h
    while (i < n) {
      val off = i * img.channels
      val g = ColorSpace.bgr2gray(img.data(off) & 0xff, img.data(off + 1) & 0xff, img.data(off + 2) & 0xff)
      val t = math.min(g * 2 + 80, 255).toByte
      out(i * 3) = t; out(i * 3 + 1) = t; out(i * 3 + 2) = t
      i += 1
    }
    Raster(out, img.w, img.h, 3)
  }

  /** apply_vegetation_index's painted image (calculate_indices.py:66-94):
    * masked vegetation -> pure green; masked non-vegetation -> original
    * (or green-channel 0 when onlyPaintVegetation=false); unmasked ->
    * tinted grey. Returns the ORIGINAL image when the mask is empty
    * (calculate_indices.py:60-62). */
  def paint(img: Raster, kernel: IndexKernel, mask: Array[Boolean],
            onlyPaintVegetation: Boolean = true): Raster = {
    require(mask.length == img.w * img.h)
    if (!mask.exists(identity)) return img
    val tinted = tint(img)
    val out = new Array[Byte](img.w * img.h * 3)
    val ch = img.channels
    var i = 0
    val n = img.w * img.h
    while (i < n) {
      val off = i * ch
      val veg = kernel.classify(img.data, off)
      if (mask(i)) {
        if (veg == 1) { // green overlay
          out(i * 3) = 0; out(i * 3 + 1) = 255.toByte; out(i * 3 + 2) = 0
        } else if (onlyPaintVegetation) {
          out(i * 3) = img.data(off); out(i * 3 + 1) = img.data(off + 1); out(i * 3 + 2) = img.data(off + 2)
        } else { // paint whole garden: non-veg masked pixels go black-green(0)
          out(i * 3) = 0; out(i * 3 + 1) = 0; out(i * 3 + 2) = 0
        }
      } else {
        out(i * 3) = tinted.data(i * 3); out(i * 3 + 1) = tinted.data(i * 3 + 1); out(i * 3 + 2) = tinted.data(i * 3 + 2)
      }
      i += 1
    }
    Raster(out, img.w, img.h, 3)
  }
}
