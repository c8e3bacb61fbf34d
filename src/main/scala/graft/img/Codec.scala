package graft.img

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Decoded raster: interleaved channel bytes in cv2 memory order
  * (BGR for 3 channels, BGR+Ir for 4), row-major from the top row —
  * mirroring cv2.imread (reference: green_spaces/image_loaders.py:85,227;
  * channel order pinned by tests/test_image_loaders.py:107-192). */
final case class Raster(data: Array[Byte], w: Int, h: Int, channels: Int) {
  def pixelOffset(row: Int, col: Int): Int = (row * w + col) * channels
}

object Codec {

  // ImageIO defaults to disk-backed stream caches (temp file per decode!)
  // which serializes concurrent executor threads on the filesystem —
  // in-memory caching is mandatory for a 32-thread local run.
  ImageIO.setUseCache(false)

  /** Decode png/jpg bytes to BGR interleaved (3 channels, alpha dropped).
    * Fast path: ImageIO's PNG/JPEG readers usually hand back
    * TYPE_3BYTE_BGR whose backing buffer already IS our layout. */
  def decodeBGR(bytes: Array[Byte]): Raster = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "undecodable image payload")
    val w = img.getWidth; val h = img.getHeight
    if (img.getType == BufferedImage.TYPE_3BYTE_BGR) {
      val buf = img.getRaster.getDataBuffer.asInstanceOf[java.awt.image.DataBufferByte].getData
      if (buf.length == w * h * 3) return Raster(buf, w, h, 3)
    }
    val out = new Array[Byte](w * h * 3)
    val argb = img.getRGB(0, 0, w, h, null, 0, w)
    var i = 0
    while (i < w * h) {
      val p = argb(i)
      out(i * 3) = (p & 0xff).toByte            // B
      out(i * 3 + 1) = ((p >> 8) & 0xff).toByte // G
      out(i * 3 + 2) = ((p >> 16) & 0xff).toByte // R
      i += 1
    }
    Raster(out, w, h, 3)
  }

  /** Fuse an RGB tile and a CIR tile into BGR+Ir, replicating the
    * reference's channel selection + bicubic Ir upscale
    * (image_loaders.py:362-386: Ir = CIR channel 2 as loaded BGR). */
  def fuseBGRI(rgb: Raster, cir: Raster): Raster =
    fuseBGRIWindow(rgb, cir, 0, 0, rgb.w - 1, rgb.h - 1)

  /** [[fuseBGRI]] with the Ir bicubic upscale restricted to the raster
    * window [wx0..wx1]×[wy0..wy1] (inclusive; window pixels bit-identical
    * to the full upscale, outside-window Ir is 0). The scoring path
    * passes the union of fragment windows, so the per-tile upscale cost
    * scales with the polygon-covered area, not the tile area. */
  def fuseBGRIWindow(rgb: Raster, cir: Raster,
                     wx0: Int, wy0: Int, wx1: Int, wy1: Int): Raster = {
    require(rgb.channels == 3 && cir.channels == 3)
    // extract Ir plane (channel index 2 of the CIR raster)
    val irPlane = new Array[Byte](cir.w * cir.h)
    var i = 0
    while (i < cir.w * cir.h) { irPlane(i) = cir.data(i * 3 + 2); i += 1 }
    val irUp =
      if (cir.w == rgb.w && cir.h == rgb.h) irPlane
      else Resize.bicubicPlaneWindow(irPlane, cir.w, cir.h, rgb.w, rgb.h,
        math.max(wx0, 0), math.max(wy0, 0),
        math.min(wx1, rgb.w - 1), math.min(wy1, rgb.h - 1))
    val out = new Array[Byte](rgb.w * rgb.h * 4)
    i = 0
    while (i < rgb.w * rgb.h) {
      out(i * 4) = rgb.data(i * 3)
      out(i * 4 + 1) = rgb.data(i * 3 + 1)
      out(i * 4 + 2) = rgb.data(i * 3 + 2)
      out(i * 4 + 3) = irUp(i)
      i += 1
    }
    Raster(out, rgb.w, rgb.h, 4)
  }

  /** Encode a BGR raster as PNG (used by the synthetic tile generator and
    * debug sinks; PNG is lossless so decode∘encode is bit-exact). */
  def encodePNG(r: Raster): Array[Byte] = {
    require(r.channels == 3)
    val img = new BufferedImage(r.w, r.h, BufferedImage.TYPE_INT_RGB)
    val argb = new Array[Int](r.w * r.h)
    var i = 0
    while (i < r.w * r.h) {
      val b = r.data(i * 3) & 0xff
      val g = r.data(i * 3 + 1) & 0xff
      val red = r.data(i * 3 + 2) & 0xff
      argb(i) = (red << 16) | (g << 8) | b
      i += 1
    }
    img.setRGB(0, 0, r.w, r.h, argb, 0, r.w)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
}
