package graft.kernel

import graft.img.ColorSpace

/** K12: the reference's NeuralNetworkClassifier
  * (green_spaces/vegetation_analysis.py:578-729) — three PCA feature
  * projections over BGRI + HSV/Lab channels, an 11-feature vector per
  * pixel, and a small MLP; vegetation iff predicted class < 2
  * (vegetation_analysis.py:724).
  *
  * Semantics preserved: per-channel [0,1] normalisation with training-set
  * input bounds, mean-subtract + matmul, per-component min/max scaling to
  * 0..255 skipping component 0 (vegetation_analysis.py:652-677), np.rint
  * rounding with uint8 WRAP-around (astype(np.uint8) wraps, not clamps),
  * forward pass in float32 like Keras.
  *
  * Config values from analyse_polygons_template.json:149-173 (identical
  * to tests/test_vegetation_analysis_nnc.py:13-54).
  */
final case class NnClassifier(shortName: String = "nn") extends IndexKernel {
  def inputFormat = "IRGB"

  def classify(buf: Array[Byte], off: Int): Int = {
    val x = NnClassifier.featureVector(
      buf(off) & 0xff, buf(off + 1) & 0xff, buf(off + 2) & 0xff, buf(off + 3) & 0xff)
    val xf = new Array[Float](11)
    var i = 0
    while (i < 11) { xf(i) = x(i).toFloat; i += 1 }
    if (NnClassifier.predictClass(xf) < 2) 1 else 0
  }
}

object NnClassifier {
  // analyse_polygons_template.json:149-173
  val MonoMin: Array[Double] = Array(-151.6851, -43.19246)
  val MonoMax: Array[Double] = Array(262.3443, 69.40648)
  val BrightInMin: Array[Double] = Array(8, 15, 8, 22, 11)
  val BrightInMax: Array[Double] = Array(255, 255, 255, 255, 255)
  val BrightMin: Array[Double] = Array(-0.845984, -0.1820107, -0.2020519, -0.02920802)
  val BrightMax: Array[Double] = Array(1.358846, 0.2513977, 0.3559869, 0.2736014)
  val ColourInMin: Array[Double] = Array(8, 15, 8, 0, 105, 103)
  val ColourInMax: Array[Double] = Array(255, 255, 255, 179, 174, 168)
  val ColourMin: Array[Double] = Array(-0.7957638, -0.4348105, -0.3928765, -0.3462591)
  val ColourMax: Array[Double] = Array(1.033623, 1.051972, 0.4325098, 0.8134353)

  /** The reference's 11-feature vector for one BGRI pixel:
    * [R, G, B, monoPCA, Ir, bright1..3, colour1..3]
    * (vegetation_analysis.py:679-721). */
  def featureVector(b: Int, g: Int, r: Int, ir: Int): Array[Int] = {
    val hsv = ColorSpace.bgr2hsv(b, g, r)
    val lab = ColorSpace.bgr2lab(b, g, r)
    val mono = pca(Array(r.toDouble, g.toDouble, b.toDouble),
      NnWeights.monoComponents, NnWeights.monoMean, 3, MonoMin, MonoMax, null, null)
    val bright = pca(Array(r.toDouble, g.toDouble, b.toDouble,
      ColorSpace.hsvV(hsv).toDouble, ColorSpace.labL(lab).toDouble),
      NnWeights.brightComponents, NnWeights.brightMean, 5, BrightMin, BrightMax,
      BrightInMin, BrightInMax)
    val colour = pca(Array(r.toDouble, g.toDouble, b.toDouble, ColorSpace.hsvH(hsv).toDouble,
      ColorSpace.labA(lab).toDouble, ColorSpace.labB(lab).toDouble),
      NnWeights.colourComponents, NnWeights.colourMean, 6, ColourMin, ColourMax,
      ColourInMin, ColourInMax)
    Array(r, g, b, mono(0), ir, bright(0), bright(1), bright(2), colour(0), colour(1), colour(2))
  }

  /** One pixel through generate_8bit_pca_from_n[_normalised]_channels
    * (vegetation_analysis.py:640-677). comps is (nComp, nIn) row-major;
    * outputs use components 1.. (component 0 skipped). */
  private def pca(chans: Array[Double], comps: Array[Double], mean: Array[Double], nIn: Int,
                  pcaMin: Array[Double], pcaMax: Array[Double],
                  inMin: Array[Double], inMax: Array[Double]): Array[Int] = {
    val nOut = pcaMin.length - 1
    val x = new Array[Double](nIn)
    var c = 0
    while (c < nIn) {
      val v = if (inMin == null) chans(c) else (chans(c) - inMin(c)) / (inMax(c) - inMin(c))
      x(c) = v - mean(c)
      c += 1
    }
    val out = new Array[Int](nOut)
    var n = 0
    while (n < nOut) {
      var acc = 0.0
      var i = 0
      while (i < nIn) { acc += x(i) * comps((n + 1) * nIn + i); i += 1 }
      val t = 255.0 * ((acc - pcaMin(n + 1)) / (pcaMax(n + 1) - pcaMin(n + 1)))
      // np.rint (half-even) then astype(np.uint8): WRAPS modulo 256
      val rr = math.rint(t).toLong
      out(n) = (((rr % 256) + 256) % 256).toInt
      n += 1
    }
    out
  }

  /** float32 forward pass; argmax of logits (softmax is monotone). */
  def predictClass(x: Array[Float]): Int = {
    val h1 = dense(x, NnWeights.k1, NnWeights.b1, 11, 12, relu = true)
    val h2 = dense(h1, NnWeights.k2, NnWeights.b2, 12, 18, relu = true)
    val out = dense(h2, NnWeights.k3, NnWeights.b3, 18, 4, relu = false)
    var best = 0
    var i = 1
    while (i < 4) { if (out(i) > out(best)) best = i; i += 1 }
    best
  }

  private def dense(x: Array[Float], k: Array[Float], bias: Array[Float],
                    nIn: Int, nOut: Int, relu: Boolean): Array[Float] = {
    val out = new Array[Float](nOut)
    var o = 0
    while (o < nOut) {
      var acc = bias(o)
      var i = 0
      while (i < nIn) { acc += x(i) * k(i * nOut + o); i += 1 }
      out(o) = if (relu && acc < 0f) 0f else acc
      o += 1
    }
    out
  }
}
