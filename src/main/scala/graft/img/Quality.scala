package graft.img

/** Decoded-pixel comparison utilities for the per-row invariant
  * (BASELINE: decoded-pixel allclose with PSNR >= 40 dB for lossy
  * formats, bit-exact for lossless). */
object Quality {

  /** Peak signal-to-noise ratio between two same-shape rasters, in dB.
    * Infinity for identical buffers. */
  def psnr(a: Raster, b: Raster): Double = {
    require(a.w == b.w && a.h == b.h && a.channels == b.channels, "shape mismatch")
    var se = 0.0
    val n = a.data.length
    var i = 0
    while (i < n) {
      val d = (a.data(i) & 0xff) - (b.data(i) & 0xff)
      se += d.toDouble * d
      i += 1
    }
    if (se == 0.0) Double.PositiveInfinity
    else 10.0 * math.log10(255.0 * 255.0 * n / se)
  }

  /** Per-image curation statistics for training-data filtering. */
  final case class ImgStats(meanLum: Double, contrast: Double, sharpness: Double)

  /** Image-quality statistics over a decoded raster:
    *  - meanLum: mean BT.601 luminance (299R+587G+114B)/1000 in [0,255]
    *    — flags under/over-exposed captures;
    *  - contrast: population stddev of the luminance — flags flat/hazy
    *    captures;
    *  - sharpness: population variance of the 4-neighbour Laplacian of
    *    the luminance over interior pixels — the classic variance-of-
    *    Laplacian blur detector (Pech-Pacheco et al. 2000): defocused
    *    images have weak second derivatives everywhere.
    * Single sequential pass per image (deterministic fp accumulation
    * order — re-runs reproduce bit-identical values, which the sidecar
    * oracle for q55 relies on). Channels: 1 = grayscale; >=3 = BGR(I),
    * extra channels ignored. */
  def stats(r: Raster): ImgStats = {
    val w = r.w; val h = r.h; val c = r.channels
    val n = w * h
    val lum = new Array[Double](n)
    var sum = 0.0; var sumSq = 0.0
    var i = 0
    while (i < n) {
      val off = i * c
      val l =
        if (c == 1) (r.data(off) & 0xff).toDouble
        else {
          val b = r.data(off) & 0xff
          val g = r.data(off + 1) & 0xff
          val rr = r.data(off + 2) & 0xff
          (299 * rr + 587 * g + 114 * b) / 1000.0
        }
      lum(i) = l; sum += l; sumSq += l * l
      i += 1
    }
    val mean = sum / n
    val contrast = math.sqrt(math.max(0.0, sumSq / n - mean * mean))
    var ls = 0.0; var lss = 0.0; var m = 0
    var y = 1
    while (y < h - 1) {
      var x = 1
      while (x < w - 1) {
        val v = 4.0 * lum(y * w + x) - lum(y * w + x - 1) - lum(y * w + x + 1) -
          lum((y - 1) * w + x) - lum((y + 1) * w + x)
        ls += v; lss += v * v; m += 1
        x += 1
      }
      y += 1
    }
    val sharp = if (m == 0) 0.0
      else math.max(0.0, lss / m - (ls / m) * (ls / m))
    ImgStats(mean, contrast, sharp)
  }

  /** Encode a raster as baseline JPEG at the given quality (the lossy
    * leg of the tile table's fmt png|jpg contract). */
  def encodeJPEG(r: Raster, quality: Float = 0.9f): Array[Byte] = {
    require(r.channels == 3)
    val img = new java.awt.image.BufferedImage(r.w, r.h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val argb = new Array[Int](r.w * r.h)
    var i = 0
    while (i < r.w * r.h) {
      argb(i) = ((r.data(i * 3 + 2) & 0xff) << 16) | ((r.data(i * 3 + 1) & 0xff) << 8) | (r.data(i * 3) & 0xff)
      i += 1
    }
    img.setRGB(0, 0, r.w, r.h, argb, 0, r.w)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    // Java's JPEG writer defaults to 4:2:0 chroma subsampling, which caps
    // PSNR near 30 dB on saturated color edges whatever the quality —
    // rewrite the SOF component sampling factors to 4:4:4.
    val typeSpec = javax.imageio.ImageTypeSpecifier.createFromBufferedImageType(
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val meta = writer.getDefaultImageMetadata(typeSpec, params)
    val fmt = "javax_imageio_jpeg_image_1.0"
    val tree = meta.getAsTree(fmt).asInstanceOf[org.w3c.dom.Element]
    val sofs = tree.getElementsByTagName("sof")
    if (sofs.getLength > 0) {
      val comps = sofs.item(0).asInstanceOf[org.w3c.dom.Element]
        .getElementsByTagName("componentSpec")
      var ci = 0
      while (ci < comps.getLength) {
        val c = comps.item(ci).asInstanceOf[org.w3c.dom.Element]
        c.setAttribute("HsamplingFactor", "1")
        c.setAttribute("VsamplingFactor", "1")
        ci += 1
      }
      meta.setFromTree(fmt, tree)
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, meta), params)
    writer.dispose()
    ios.close()
    bos.toByteArray
  }
}
