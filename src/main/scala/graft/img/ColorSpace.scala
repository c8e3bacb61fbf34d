package graft.img

/** OpenCV-exact uint8 colour conversions, re-implemented from the public
  * OpenCV algorithms (modules/imgproc/src/color_hsv.cpp RGB2HSV_b and
  * color_lab.cpp RGB2Lab_b fixed-point paths).
  *
  * Needed because the reference pins its vegetation-index goldens to
  * cv2.cvtColor semantics (reference: green_spaces/vegetation_analysis.py:39,
  * 362,409,505,560; tests/test_vegetation_analysis.py:14-19,80-105 including
  * the H in [0,180] convention and the +128 biased a/b channels).
  */
object ColorSpace {
  private final val HsvShift = 12

  private val sdivTable: Array[Int] = Array.tabulate(256) { i =>
    if (i == 0) 0 else math.rint(255.0 * (1 << HsvShift) / i).toInt
  }
  // hue range 0..180
  private val hdivTable: Array[Int] = Array.tabulate(256) { i =>
    if (i == 0) 0 else math.rint(180.0 * (1 << HsvShift) / (6.0 * i)).toInt
  }

  /** (b,g,r) in 0..255 -> packed (h<<16)|(s<<8)|v with h in 0..180. */
  def bgr2hsv(b: Int, g: Int, r: Int): Int = {
    var v = b
    var vmin = b
    if (g > v) v = g
    if (r > v) v = r
    if (g < vmin) vmin = g
    if (r < vmin) vmin = r
    val diff = v - vmin
    val s = (diff * sdivTable(v) + (1 << (HsvShift - 1))) >> HsvShift
    var h =
      if (v == r) g - b
      else if (v == g) (b - r) + 2 * diff
      else (r - g) + 4 * diff
    h = (h * hdivTable(diff) + (1 << (HsvShift - 1))) >> HsvShift
    if (h < 0) h += 180
    (h << 16) | (s << 8) | v
  }

  def hsvH(packed: Int): Int = (packed >> 16) & 0xff
  def hsvS(packed: Int): Int = (packed >> 8) & 0xff
  def hsvV(packed: Int): Int = packed & 0xff

  // ---- Lab (8u, sRGB gamma, D65) ----
  private final val LabShift = 12
  private final val GammaShift = 3
  private final val LabShift2 = LabShift + GammaShift

  private val gammaTab: Array[Int] = Array.tabulate(256) { i =>
    val x = i / 255.0
    val g = if (x <= 0.04045) x / 12.92 else math.pow((x + 0.055) / 1.055, 2.4)
    math.rint(255.0 * (1 << GammaShift) * g).toInt
  }

  private val labCbrtTab: Array[Int] = Array.tabulate(256 * 3 / 2 * (1 << GammaShift)) { i =>
    val x = i / (255.0 * (1 << GammaShift))
    val f = if (x < 0.008856) x * 7.787 + 0.13793103448275862 else math.cbrt(x)
    math.rint((1 << LabShift2) * f).toInt
  }

  private val labCoeffs: Array[Int] = {
    val m = Array(
      0.412453, 0.357580, 0.180423,
      0.212671, 0.715160, 0.072169,
      0.019334, 0.119193, 0.950227)
    val d65 = Array(0.950456, 1.0, 1.088754)
    Array.tabulate(9) { k =>
      val i = k / 3
      math.rint(m(k) * (1 << LabShift) / d65(i)).toInt
    }
  }

  private def descale(x: Int, n: Int): Int = (x + (1 << (n - 1))) >> n

  private final val LScale = (116 * 255 + 50) / 100
  private final val LShift = -((16 * 255 * (1 << LabShift2) + 50) / 100)

  /** (b,g,r) in 0..255 -> packed (L<<16)|(a<<8)|bb, biased uint8 like cv2. */
  def bgr2lab(b: Int, g: Int, r: Int): Int = {
    val rr = gammaTab(r); val gg = gammaTab(g); val bb = gammaTab(b)
    val fX = labCbrtTab(descale(rr * labCoeffs(0) + gg * labCoeffs(1) + bb * labCoeffs(2), LabShift))
    val fY = labCbrtTab(descale(rr * labCoeffs(3) + gg * labCoeffs(4) + bb * labCoeffs(5), LabShift))
    val fZ = labCbrtTab(descale(rr * labCoeffs(6) + gg * labCoeffs(7) + bb * labCoeffs(8), LabShift))
    val lum = descale(LScale * fY + LShift, LabShift2)
    val a = descale(500 * (fX - fY) + 128 * (1 << LabShift2), LabShift2)
    val bc = descale(200 * (fY - fZ) + 128 * (1 << LabShift2), LabShift2)
    (clamp8(lum) << 16) | (clamp8(a) << 8) | clamp8(bc)
  }

  def labL(packed: Int): Int = (packed >> 16) & 0xff
  def labA(packed: Int): Int = (packed >> 8) & 0xff
  def labB(packed: Int): Int = packed & 0xff

  private def clamp8(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** cv2 BGR2GRAY 8u: round(0.299R + 0.587G + 0.114B) in fixed point
    * (OpenCV uses 14-bit fixed-point coefficients). */
  private final val GrayShift = 14
  private val grayCoeffs = Array(
    math.rint(0.114 * (1 << GrayShift)).toInt, // B
    math.rint(0.587 * (1 << GrayShift)).toInt, // G
    (1 << GrayShift) - math.rint(0.114 * (1 << GrayShift)).toInt - math.rint(0.587 * (1 << GrayShift)).toInt) // R (residual, OpenCV style)

  def bgr2gray(b: Int, g: Int, r: Int): Int =
    descale(b * grayCoeffs(0) + g * grayCoeffs(1) + r * grayCoeffs(2), GrayShift)
}
