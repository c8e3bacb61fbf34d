package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

/** Row-for-row ports of tests/test_vegetation_analysis_nnc.py: PCA
  * feature goldens (:89-190), MLP prediction goldens (:269-297) and the
  * full classifier integration (:300+). */
class NnSpec extends AnyFunSuite {

  // (R, G, B) -> 11-feature slices (from the validation spreadsheet rows)
  private val pcaGoldens = Seq(
    // r, g, b, mono, bright1-3, colour1-3
    (155, 140, 147, 138, Seq(156, 107, 30), Seq(199, 65, 113)),
    (124, 121, 90, 68, Seq(77, 105, 22), Seq(53, 116, 90)),
    (88, 99, 85, 105, Seq(111, 82, 18), Seq(72, 117, 67)),
    (57, 53, 44, 92, Seq(105, 110, 18), Seq(32, 172, 79)))

  test("PCA feature goldens (test_vegetation_analysis_nnc.py:89-190)") {
    pcaGoldens.foreach { case (r, g, b, mono, bright, colour) =>
      val f = NnClassifier.featureVector(b, g, r, ir = 0)
      assert(f(0) == r && f(1) == g && f(2) == b)
      assert(f(3) == mono, s"mono for rgb($r,$g,$b): got ${f(3)}")
      assert(Seq(f(5), f(6), f(7)) == bright, s"bright for rgb($r,$g,$b): got ${Seq(f(5), f(6), f(7))}")
      assert(Seq(f(8), f(9), f(10)) == colour, s"colour for rgb($r,$g,$b): got ${Seq(f(8), f(9), f(10))}")
    }
    // colour-only golden row 76413
    val f = NnClassifier.featureVector(77, 128, 90, 0)
    assert(Seq(f(8), f(9), f(10)) == Seq(43, 20, 55))
  }

  test("MLP prediction goldens (:269-297)") {
    val cases = Seq(
      (Seq(155, 140, 147, 138, 72, 156, 107, 30, 199, 65, 113), 3),
      (Seq(124, 121, 90, 68, 94, 77, 105, 22, 53, 116, 90), 1),
      (Seq(57, 53, 44, 92, 90, 105, 110, 18, 32, 172, 79), 2),
      (Seq(57, 53, 44, 92, 86, 105, 110, 18, 32, 172, 79), 2),
      (Seq(72, 69, 60, 97, 70, 109, 105, 14, 43, 170, 76), 2),
      (Seq(89, 89, 81, 106, 50, 118, 98, 5, 59, 160, 71), 2),
      (Seq(103, 104, 96, 111, 32, 122, 94, 5, 71, 156, 69), 3),
      (Seq(104, 110, 100, 112, 23, 122, 87, 12, 80, 133, 68), 3))
    cases.foreach { case (x, want) =>
      val got = NnClassifier.predictClass(x.map(_.toFloat).toArray)
      assert(got == want, s"predict($x)")
    }
  }

  test("full classifier integration (:300+): class<2 => vegetation") {
    val nn = NnClassifier()
    // R,G,B,Ir = (155,140,147,72) -> class 3 -> not vegetation
    assert(nn.classify(Array[Byte](147.toByte, 140.toByte, 155.toByte, 72.toByte), 0) == 0)
    // R,G,B,Ir = (124,121,90,94) -> class 1 -> vegetation
    assert(nn.classify(Array[Byte](90.toByte, 121.toByte, 124.toByte, 94.toByte), 0) == 1)
  }

  test("nn kernel is registered and IRGB-typed") {
    assert(Kernels.all("nn").inputFormat == "IRGB")
    assert(Kernels.all("nn").channels == 4)
  }
}
