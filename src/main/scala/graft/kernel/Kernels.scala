package graft.kernel

import graft.img.ColorSpace

/** Per-pixel vegetation classifiers ("index kernels"), re-expressing the
  * reference's numpy/OpenCV index functions
  * (green_spaces/vegetation_analysis.py) as branch-light scalar kernels
  * over interleaved uint8 buffers. Semantics preserved exactly:
  *  - strict open thresholds low < v < high for the arithmetic indices
  *    (vegetation_analysis.py:42,95,149,201,258,323,367,415-420),
  *  - INCLUSIVE bounds for the two cv2.inRange-based indices
  *    (vegetation_analysis.py:510,562-571),
  *  - NaN (0/0) classifies as 0 because NaN > low is false
  *    (tests/test_vegetation_analysis.py:42-43,57,73),
  *  - OpenCV uint8 HSV (H in 0..180) and Lab (a,b biased +128).
  *
  * `classify` returns 0/1 for the pixel at byte offset `off` of an
  * interleaved buffer in cv2 memory order: BGR (RGB sources), G,R,Ir
  * (CIR sources loaded as BGR), or BGR+Ir (fused IRGB).
  */
trait IndexKernel extends Serializable {
  def shortName: String
  /** "RGB" | "CIR" | "IRGB" — must match the tile source format
    * (reference: analyse_polygons.py:208-213). */
  def inputFormat: String
  def channels: Int = if (inputFormat == "IRGB") 4 else 3
  def classify(buf: Array[Byte], off: Int): Int
  /** Classification of an all-zero pixel — lets missing tiles (the
    * reference zero-fills absent mosaic regions) be scored without a
    * decoded buffer: veg = onBlack * maskedPixelCount. */
  lazy val onBlack: Int = classify(new Array[Byte](4), 0)
}

/** K1: all pixels vegetation (vegetation_analysis.py:423-449). */
final case class AssumesGreen(shortName: String = "naive") extends IndexKernel {
  def inputFormat = "RGB"
  def classify(buf: Array[Byte], off: Int): Int = 1
}

/** K3: hue threshold in OpenCV HSV space (vegetation_analysis.py:14-42). */
final case class GreenFromHSV(shortName: String = "hsv",
                              low: Double = 30, high: Double = 80) extends IndexKernel {
  def inputFormat = "RGB"
  def classify(buf: Array[Byte], off: Int): Int = {
    val h = ColorSpace.hsvH(ColorSpace.bgr2hsv(buf(off) & 0xff, buf(off + 1) & 0xff, buf(off + 2) & 0xff))
    if (h > low && h < high) 1 else 0
  }
}

/** K2: green leaf index (vegetation_analysis.py:45-95). */
final case class GreenLeafIndex(shortName: String = "greenleaf",
                                low: Double = 0.0, high: Double = 1.0) extends IndexKernel {
  def inputFormat = "RGB"
  def classify(buf: Array[Byte], off: Int): Int = {
    val b = (buf(off) & 0xff).toDouble
    val g = (buf(off + 1) & 0xff).toDouble
    val r = (buf(off + 2) & 0xff).toDouble
    val gli = (2.0 * g - (r + b)) / (2.0 * g + (r + b)) // NaN for all-zero -> 0
    if (gli > low && gli < high) 1 else 0
  }
}

/** K4: NDVI on CIR tiles loaded as (g, r, ir) (vegetation_analysis.py:98-149). */
final case class NdviCir(shortName: String = "ndvi-cir",
                         low: Double = 0.0, high: Double = 1.0) extends IndexKernel {
  def inputFormat = "CIR"
  def classify(buf: Array[Byte], off: Int): Int = {
    val r = (buf(off + 1) & 0xff).toDouble
    val nir = (buf(off + 2) & 0xff).toDouble
    val ndvi = (nir - r) / (nir + r)
    if (ndvi > low && ndvi < high) 1 else 0
  }
}

/** K5: NDVI on fused BGR+Ir (vegetation_analysis.py:152-201). */
final case class NdviIrgb(shortName: String = "ndvi-irgb",
                          low: Double = 0.0, high: Double = 1.0) extends IndexKernel {
  def inputFormat = "IRGB"
  def classify(buf: Array[Byte], off: Int): Int = {
    val r = (buf(off + 2) & 0xff).toDouble
    val nir = (buf(off + 3) & 0xff).toDouble
    val ndvi = (nir - r) / (nir + r)
    if (ndvi > low && ndvi < high) 1 else 0
  }
}

/** K6: visual NDVI (g-r)/(g+r) (vegetation_analysis.py:204-258). */
final case class Vndvi(shortName: String = "vndvi",
                       low: Double = 0.0, high: Double = 1.0) extends IndexKernel {
  def inputFormat = "RGB"
  def classify(buf: Array[Byte], off: Int): Int = {
    val g = (buf(off + 1) & 0xff).toDouble
    val r = (buf(off + 2) & 0xff).toDouble
    val v = (g - r) / (g + r)
    if (v > low && v < high) 1 else 0
  }
}

/** K7: VARI (g-r)/(g+r+b) (vegetation_analysis.py:261-323). */
final case class Vari(shortName: String = "vari",
                      low: Double = 0.0, high: Double = 1.0) extends IndexKernel {
  def inputFormat = "RGB"
  def classify(buf: Array[Byte], off: Int): Int = {
    val b = (buf(off) & 0xff).toDouble
    val g = (buf(off + 1) & 0xff).toDouble
    val r = (buf(off + 2) & 0xff).toDouble
    val v = (g - r) / (g + r + b)
    if (v > low && v < high) 1 else 0
  }
}

/** K8: Lab 'a' band threshold (vegetation_analysis.py:326-367). */
final case class GreenFromLab1(shortName: String = "lab1",
                               aLow: Double = -9999, aHigh: Double = -11) extends IndexKernel {
  def inputFormat = "RGB"
  def classify(buf: Array[Byte], off: Int): Int = {
    val a = ColorSpace.labA(ColorSpace.bgr2lab(buf(off) & 0xff, buf(off + 1) & 0xff, buf(off + 2) & 0xff)) - 128.0
    if (a > aLow && a < aHigh) 1 else 0
  }
}

/** K9: Lab 'a' AND 'b' band thresholds (vegetation_analysis.py:370-420). */
final case class GreenFromLab2(shortName: String = "lab2",
                               aLow: Double = -9999, aHigh: Double = -6,
                               bLow: Double = 5, bHigh: Double = 57) extends IndexKernel {
  def inputFormat = "RGB"
  def classify(buf: Array[Byte], off: Int): Int = {
    val lab = ColorSpace.bgr2lab(buf(off) & 0xff, buf(off + 1) & 0xff, buf(off + 2) & 0xff)
    val a = ColorSpace.labA(lab) - 128.0
    val b = ColorSpace.labB(lab) - 128.0
    if (a > aLow && a < aHigh && b > bLow && b < bHigh) 1 else 0
  }
}

/** K10: Matt's IR-as-red HSV box, cv2.inRange semantics = INCLUSIVE bounds
  * (vegetation_analysis.py:452-512): restack (b, g, Ir) as BGR, to HSV. */
final case class MattIrHSV(shortName: String = "matt",
                           hLow: Int = 0, hHigh: Int = 10,
                           sLow: Int = 125, sHigh: Int = 255,
                           vLow: Int = 20, vHigh: Int = 255) extends IndexKernel {
  def inputFormat = "IRGB"
  def classify(buf: Array[Byte], off: Int): Int = {
    // channels: b,g,r,ir -> treat (b, g, ir) as a BGR pixel
    val hsv = ColorSpace.bgr2hsv(buf(off) & 0xff, buf(off + 1) & 0xff, buf(off + 3) & 0xff)
    val h = ColorSpace.hsvH(hsv); val s = ColorSpace.hsvS(hsv); val v = ColorSpace.hsvV(hsv)
    if (h >= hLow && h <= hHigh && s >= sLow && s <= sHigh && v >= vLow && v <= vHigh) 1 else 0
  }
}

/** K11: two inclusive HSV boxes over CIR-as-BGR, OR'd for the red-hue
  * wraparound (vegetation_analysis.py:515-575). */
final case class Matt2IrHSV(shortName: String = "matt2",
                            h1Low: Int = 0, h1High: Int = 15, s1Low: Int = 0, s1High: Int = 255,
                            v1Low: Int = 0, v1High: Int = 255,
                            h2Low: Int = 160, h2High: Int = 180, s2Low: Int = 0, s2High: Int = 255,
                            v2Low: Int = 0, v2High: Int = 255) extends IndexKernel {
  def inputFormat = "CIR"
  def classify(buf: Array[Byte], off: Int): Int = {
    val hsv = ColorSpace.bgr2hsv(buf(off) & 0xff, buf(off + 1) & 0xff, buf(off + 2) & 0xff)
    val h = ColorSpace.hsvH(hsv); val s = ColorSpace.hsvS(hsv); val v = ColorSpace.hsvV(hsv)
    val in1 = h >= h1Low && h <= h1High && s >= s1Low && s <= s1High && v >= v1Low && v <= v1High
    val in2 = h >= h2Low && h <= h2High && s >= s2Low && s <= s2High && v >= v2Low && v <= v2High
    if (in1 || in2) 1 else 0
  }
}

object Kernels {
  /** Registry by short name with the reference's template-config defaults
    * (analyse_polygons_template.json:56-148). */
  val all: Map[String, IndexKernel] = Seq(
    AssumesGreen(), GreenLeafIndex(), GreenFromHSV(), NdviCir(), NdviIrgb(),
    Vndvi(), Vari(), GreenFromLab1(), GreenFromLab2(), MattIrHSV(), Matt2IrHSV(),
    NnClassifier()
  ).map(k => k.shortName -> k).toMap

  /** Apply a kernel over a full buffer with an aligned mask; returns
    * (vegCount, maskedPixelCount) — the fused mask+index+count of the
    * reference's apply_vegetation_index (calculate_indices.py:46-102). */
  def countVeg(kernel: IndexKernel, buf: Array[Byte], channels: Int,
               mask: Array[Boolean]): (Long, Long) = {
    var veg = 0L; var npix = 0L
    var i = 0
    while (i < mask.length) {
      if (mask(i)) {
        npix += 1
        veg += kernel.classify(buf, i * channels)
      }
      i += 1
    }
    (veg, npix)
  }
}
