package graft.kernel

import org.scalatest.funsuite.AnyFunSuite
import graft.img.{Codec, ColorSpace, Raster}

/** Row-for-row ports of the reference's vegetation-index goldens
  * (tests/test_vegetation_analysis.py, tests/test_calculate_indices.py,
  * tests/image_test_helpers.py). Pixel tuples are in cv2 memory order. */
class KernelSpec extends AnyFunSuite {

  private def buf(pixels: Seq[Seq[Int]]): Array[Byte] =
    pixels.flatten.map(_.toByte).toArray

  private def classifyAll(k: IndexKernel, pixels: Seq[Seq[Int]]): Seq[Int] = {
    val b = buf(pixels)
    val ch = pixels.head.length
    pixels.indices.map(i => k.classify(b, i * ch))
  }

  // image_test_helpers.py:4-9 — left half red, right half blue (BGR)
  private val leftRedRightBlue4x4: Seq[Seq[Int]] =
    (0 until 4).flatMap { _ =>
      Seq(Seq(0, 0, 255), Seq(0, 0, 255), Seq(255, 0, 0), Seq(255, 0, 0))
    }

  // image_test_helpers.py:11-16 — top-left quarter red, remainder blue
  private val topLeftQuarterRed4x4: Seq[Seq[Int]] =
    Seq(
      Seq(Seq(0, 0, 255), Seq(0, 0, 255), Seq(255, 0, 0), Seq(255, 0, 0)),
      Seq(Seq(0, 0, 255), Seq(0, 0, 255), Seq(255, 0, 0), Seq(255, 0, 0)),
      Seq(Seq(255, 0, 0), Seq(255, 0, 0), Seq(255, 0, 0), Seq(255, 0, 0)),
      Seq(Seq(255, 0, 0), Seq(255, 0, 0), Seq(255, 0, 0), Seq(255, 0, 0))
    ).flatten

  test("hsv golden (test_vegetation_analysis.py:14-19): blue hue 120 in (105,135)") {
    val k = GreenFromHSV("t", 105, 135)
    val got = classifyAll(k, leftRedRightBlue4x4)
    val want = (0 until 4).flatMap(_ => Seq(0, 0, 1, 1))
    assert(got == want)
  }

  test("greenleaf golden (:22-32)") {
    val img = Seq(
      Seq(255, 0, 0), Seq(0, 255, 0), Seq(0, 0, 255),
      Seq(255, 255, 0), Seq(0, 255, 255), Seq(255, 0, 255))
    val got = classifyAll(GreenLeafIndex("t", 0.2, 0.8), img)
    assert(got == Seq(0, 0, 0, 1, 1, 0))
  }

  test("ndvi-cir golden incl. NaN pixel (:35-47)") {
    val img = Seq( // loaded order (g, r, ir)
      Seq(0, 0, 255), Seq(255, 0, 0), Seq(0, 255, 0),
      Seq(0, 128, 255), Seq(0, 255, 128), Seq(0, 255, 255))
    val got = classifyAll(NdviCir("t", 0.2, 0.8), img)
    assert(got == Seq(0, 0, 0, 1, 0, 0))
  }

  test("vndvi golden incl. NaN pixel (:50-62)") {
    val img = Seq(
      Seq(0, 0, 255), Seq(0, 0, 0), Seq(0, 255, 0),
      Seq(0, 128, 255), Seq(0, 255, 128), Seq(0, 255, 255))
    val got = classifyAll(Vndvi("t", 0.2, 0.8), img)
    assert(got == Seq(0, 0, 0, 0, 1, 0))
  }

  test("vari golden incl. NaN and strict-bound pixels (:65-77)") {
    val img = Seq(
      Seq(0, 0, 255), Seq(0, 0, 0), Seq(0, 255, 0),
      Seq(0, 128, 255), Seq(0, 255, 128), Seq(0, 255, 255),
      Seq(250, 255, 128), Seq(255, 255, 128), Seq(255, 255, 0))
    val got = classifyAll(Vari("t", 0.2, 0.8), img)
    assert(got == Seq(0, 0, 0, 0, 1, 0, 1, 0, 1))
  }

  test("lab1 golden (:80-90): a = -13 vs -10 around threshold -11") {
    val img = Seq(Seq(118, 125, 93), Seq(119, 124, 100))
    val got = classifyAll(GreenFromLab1("t", -9999, -11), img)
    assert(got == Seq(1, 0))
  }

  test("lab2 golden (:93-105)") {
    val img = Seq(
      Seq(113, 125, 96), Seq(67, 124, 114),
      Seq(178, 97, 69), Seq(153, 101, 153))
    val got = classifyAll(GreenFromLab2("t", -9999, -11, 5, 57), img)
    assert(got == Seq(0, 1, 0, 0))
  }

  test("assumes-green golden (:108-119)") {
    val img = Seq(
      Seq(0, 0, 0), Seq(255, 0, 0), Seq(0, 255, 0),
      Seq(0, 0, 255), Seq(128, 255, 128), Seq(255, 255, 255))
    assert(classifyAll(AssumesGreen("t"), img) == Seq.fill(6)(1))
  }

  test("matt golden (:122-135): BGRI pixels, inclusive inRange") {
    val img = Seq( // B G R Ir
      Seq(0, 0, 0, 255), Seq(0, 0, 255, 0),
      Seq(255, 0, 0, 0), Seq(0, 255, 0, 0))
    // HSV of (b,g,ir)-as-BGR: [[0,255,255],[0,0,0]],[[120,255,255],[60,255,255]]
    val got = classifyAll(MattIrHSV("t", 0, 10, 125, 255, 20, 255), img)
    assert(got == Seq(1, 0, 0, 0))
  }

  test("matt2: red-hue wraparound boxes over CIR-as-BGR") {
    val k = Matt2IrHSV()
    // pure 'red' in CIR-as-BGR = high channel 2 (ir): hue 0 -> box 1
    assert(k.classify(Array[Byte](0, 0, 255.toByte), 0) == 1)
    // pure green-channel pixel -> hue 120, outside both boxes
    assert(k.classify(Array[Byte](0, 255.toByte, 0), 0) == 0)
    // wraparound red: BGR (100, 0, 255): v=r, h=(g-b)*hdiv>>12 = -12 -> 168
    assert(k.classify(Array[Byte](100.toByte, 0, 255.toByte), 0) == 1)
  }

  test("cv2 HSV parity: primary/secondary colours") {
    def hsv(b: Int, g: Int, r: Int): (Int, Int, Int) = {
      val p = ColorSpace.bgr2hsv(b, g, r)
      (ColorSpace.hsvH(p), ColorSpace.hsvS(p), ColorSpace.hsvV(p))
    }
    assert(hsv(0, 0, 255) == (0, 255, 255))   // red
    assert(hsv(0, 255, 0) == (60, 255, 255))  // green
    assert(hsv(255, 0, 0) == (120, 255, 255)) // blue
    assert(hsv(0, 255, 255) == (30, 255, 255)) // yellow
    assert(hsv(255, 255, 0) == (90, 255, 255)) // cyan
    assert(hsv(255, 0, 255) == (150, 255, 255)) // magenta
    assert(hsv(0, 0, 0) == (0, 0, 0))
    assert(hsv(255, 255, 255) == (0, 0, 255))
    assert(hsv(128, 128, 128) == (0, 0, 128))
  }

  test("cv2 Lab parity: grey axis and extremes") {
    def lab(b: Int, g: Int, r: Int): (Int, Int, Int) = {
      val p = ColorSpace.bgr2lab(b, g, r)
      (ColorSpace.labL(p), ColorSpace.labA(p), ColorSpace.labB(p))
    }
    assert(lab(0, 0, 0) == (0, 128, 128))
    // white: L=255 (cv2 scales L by 255/100), neutral a/b = 128
    assert(lab(255, 255, 255) == (255, 128, 128))
    // greys stay neutral in a/b
    for (v <- Seq(32, 64, 128, 200)) {
      val (_, a, bb) = lab(v, v, v)
      assert(math.abs(a - 128) <= 1 && math.abs(bb - 128) <= 1, s"grey $v -> a=$a b=$bb")
    }
  }

  test("fused mask+count replicates apply_vegetation_index goldens (test_calculate_indices.py)") {
    val img = buf(topLeftQuarterRed4x4)
    val maskTopHalf = Array(
      true, true, true, true,
      true, true, true, true,
      false, false, false, false,
      false, false, false, false)
    val maskAllTrue = Array.fill(16)(true)
    val maskAllFalse = Array.fill(16)(false)

    // hsv (-30,30): red hue=0 passes, blue hue=120 fails
    val hsvK = GreenFromHSV("t", -30, 30)
    assert(Kernels.countVeg(hsvK, img, 3, maskTopHalf) == ((4L, 8L)))  // 0.5
    assert(Kernels.countVeg(hsvK, img, 3, maskAllTrue) == ((4L, 16L))) // 0.25
    assert(Kernels.countVeg(hsvK, img, 3, maskAllFalse) == ((0L, 0L)))
  }

  test("overlay painting matches apply_vegetation_index goldens (test_calculate_indices.py:35-48)") {
    import graft.img.Raster
    val img = Raster(buf(topLeftQuarterRed4x4), 4, 4, 3)
    val hsvK = GreenFromHSV("t", -30, 30) // red hue=0 classifies 1
    val green = Seq(0, 255, 0)
    val red = Seq(0, 0, 255)
    val blue = Seq(255, 0, 0)
    val tintBlue = Seq(138, 138, 138) // grey(blue)=29 -> 29*2+80

    // all-true mask: red pixels -> green, blue pixels -> original
    val allTrue = Array.fill(16)(true)
    val p1 = Overlay.paint(img, hsvK, allTrue)
    val want1 = Seq(green, green, blue, blue, green, green, blue, blue,
      blue, blue, blue, blue, blue, blue, blue, blue)
    assert(p1.data.toSeq == buf(want1).toSeq)

    // top-half mask: bottom half tinted grey
    val topHalf = Array(true, true, true, true, true, true, true, true,
      false, false, false, false, false, false, false, false)
    val p2 = Overlay.paint(img, hsvK, topHalf)
    val want2 = Seq(green, green, blue, blue, green, green, blue, blue,
      tintBlue, tintBlue, tintBlue, tintBlue, tintBlue, tintBlue, tintBlue, tintBlue)
    assert(p2.data.toSeq == buf(want2).toSeq)

    // empty mask: original image returned untouched
    val p3 = Overlay.paint(img, hsvK, Array.fill(16)(false))
    assert(p3.data.toSeq == img.data.toSeq)
  }

  test("onBlack: missing-tile classification matches zero-buffer semantics") {
    assert(AssumesGreen().onBlack == 1)
    assert(GreenLeafIndex().onBlack == 0) // 0/0 = NaN -> 0
    assert(GreenFromHSV().onBlack == 0)
    assert(NdviCir().onBlack == 0)
    assert(Vari().onBlack == 0)
    assert(GreenFromLab1().onBlack == 0)
    assert(MattIrHSV().onBlack == 0)
    // matt2 on black: hsv (0,0,0) is inside box 1 (inclusive 0 bounds!)
    assert(Matt2IrHSV().onBlack == 1)
  }

  test("codec: PNG encode/decode round-trip preserves BGR bytes") {
    val rnd = new scala.util.Random(7)
    val data = Array.fill[Byte](8 * 5 * 3)(rnd.nextInt(256).toByte)
    val r = Raster(data, 8, 5, 3)
    val back = Codec.decodeBGR(Codec.encodePNG(r))
    assert(back.w == 8 && back.h == 5 && back.channels == 3)
    assert(back.data.sameElements(data))
  }

  test("image quality stats: hand-computed exposure/contrast/Laplacian goldens") {
    import graft.img.Quality
    def gray(vals: Seq[Int], w: Int, h: Int): Raster =
      Raster(vals.flatMap(v => Seq(v.toByte, v.toByte, v.toByte)).toArray, w, h, 3)
    // constant image: mean = v, zero contrast, zero sharpness
    val flat = Quality.stats(gray(Seq.fill(16)(77), 4, 4))
    assert(flat.meanLum == 77.0 && flat.contrast == 0.0 && flat.sharpness == 0.0)
    // linear vertical gradient: Laplacian of a linear ramp is 0 everywhere
    val grad = Quality.stats(gray((0 until 4).flatMap(y => Seq.fill(4)(y * 10)), 4, 4))
    assert(grad.meanLum == 15.0)
    assert(math.abs(grad.contrast - math.sqrt(125.0)) < 1e-12)
    assert(grad.sharpness == 0.0)
    // single bright interior pixel at (x=1,y=1)=100:
    // L over interior = {400, -100, -100, 0} -> mean 50, var 42500
    val spike = Quality.stats(gray(
      (0 until 16).map(i => if (i == 1 * 4 + 1) 100 else 0), 4, 4))
    assert(math.abs(spike.meanLum - 6.25) < 1e-12)
    assert(math.abs(spike.sharpness - 42500.0) < 1e-9)
    assert(math.abs(spike.contrast - math.sqrt(10000.0 / 16 - 6.25 * 6.25)) < 1e-12)
    // pure-luminance weights: a saturated-red constant image reads 76.245
    val red = Raster(Array.fill[Byte](4 * 4 * 3)(0), 4, 4, 3)
    (0 until 16).foreach(i => red.data(i * 3 + 2) = 255.toByte)
    assert(math.abs(Quality.stats(red).meanLum - 299 * 255 / 1000.0) < 1e-12)
    // q55's absolute exposure thresholds respond to genuinely bad captures
    assert(Quality.stats(gray(Seq.fill(16)(30), 4, 4)).meanLum < 90.0)   // too_dark
    assert(Quality.stats(gray(Seq.fill(16)(220), 4, 4)).meanLum > 170.0) // too_bright
  }

  test("ImageQualityStats expression: equals the kernel over a PNG; corrupt bytes null out") {
    val rnd = new scala.util.Random(11)
    val data = Array.fill[Byte](8 * 8 * 3)(rnd.nextInt(256).toByte)
    val r = Raster(data, 8, 8, 3)
    val want = graft.img.Quality.stats(r)
    val expr = graft.media.ImageQualityStats(
      org.apache.spark.sql.catalyst.expressions.Literal(Codec.encodePNG(r)))
    val row = expr.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    assert(row.getDouble(0) == want.meanLum && row.getDouble(1) == want.contrast &&
      row.getDouble(2) == want.sharpness)
    val corrupt = graft.media.ImageQualityStats(
      org.apache.spark.sql.catalyst.expressions.Literal(Array[Byte](1, 2, 3)))
    assert(corrupt.eval(null) == null)
  }

  test("codec: CIR fusion picks channel 2 as Ir and stacks BGRI (image_loaders.py:362-386)") {
    // rgb tile 2x2 constant blue; cir tile 2x2 with channel2 = 9
    val rgb = Raster(Array.fill[Byte](2 * 2 * 3)(0), 2, 2, 3)
    (0 until 4).foreach(i => rgb.data(i * 3) = 255.toByte)
    val cir = Raster((0 until 4).flatMap(_ => Seq[Byte](1, 2, 9)).toArray, 2, 2, 3)
    val fused = Codec.fuseBGRI(rgb, cir)
    assert(fused.channels == 4)
    (0 until 4).foreach { i =>
      assert((fused.data(i * 4) & 0xff) == 255)
      assert((fused.data(i * 4 + 3) & 0xff) == 9)
    }
  }
}
