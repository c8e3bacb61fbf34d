package graft.pipeline

import graft.data.Synthetic.GardenRow
import graft.geom.{MPoly, Rasterize}
import graft.img.Raster
import graft.kernel.IndexKernel

/** Test oracle: the reference's literal single-machine algorithm —
  * build the covering mosaic (zero-filled for missing tiles), affine the
  * polygon into mosaic pixel space, crop, rasterize the mask, then count
  * (green_spaces/image_loaders.py:235-294 + calculate_indices.py:46-102).
  * The pipeline must reproduce these numbers exactly via its mosaic-free
  * per-cell fragments. */
object MosaicOracle {

  final case class Result(id: String, cx: Double, cy: Double, areaM2: Double,
                          npix: Long, fracs: Array[Double])

  /** Web-mercator variant: literal WebMercatorMapLoader.get_image_and_mask
    * (image_loaders.py:117-158) — transformed coords stored (tileY, tileX),
    * y-down mosaic, unflipped crop/mask affine, area in tile² units. */
  def computeWebMerc(g: GardenRow, zoom: Int, ts: Int,
                     tileFor: (Int, Int) => Option[Raster],
                     kernels: Array[IndexKernel]): Result = {
    val raw = MPoly.fromCoords(g.geometry)
    require(g.crs == Exprs.CRS84)
    // reference stores (x_geom, y_geom) = (tileY, tileX)
    val gT = raw.map { (lon, lat) =>
      val (ty, tx) = graft.geo.WebMercator.latLongToTileYX(zoom, lat, lon)
      (ty, tx)
    }
    val (cx, cy) = raw.centroid
    val area = gT.area
    val (b0, b1, b2, b3) = gT.bounds
    val minTy = b0.toInt; val minTx = b1.toInt
    val maxTy = b2.toInt; val maxTx = b3.toInt

    val ch = kernels.head.channels
    val mw = (maxTx - minTx + 1) * ts
    val mh = (maxTy - minTy + 1) * ts
    val mosaic = new Array[Byte](mw * mh * ch)
    for (y <- minTy to maxTy; x <- minTx to maxTx) {
      tileFor(x, y).foreach { tile =>
        val xOff = (x - minTx) * ts
        val yOff = (y - minTy) * ts
        var r = 0
        while (r < ts) {
          System.arraycopy(tile.data, r * ts * ch, mosaic, ((yOff + r) * mw + xOff) * ch, ts * ch)
          r += 1
        }
      }
    }
    // affine m = [0, ts, ts, 0, -minTx*ts, -minTy*ts] over (tileY, tileX)
    val gRel = gT.map((gy, gx) => (ts * gx - minTx.toDouble * ts, ts * gy - minTy.toDouble * ts))
    val (bx0, by0, bx1, by1) = gRel.bounds
    val minX = math.floor(bx0).toInt; val minY = math.floor(by0).toInt
    val maxX = math.floor(bx1).toInt; val maxY = math.floor(by1).toInt
    val w = maxX - minX + 1; val h = maxY - minY + 1

    val mask = Rasterize.maskWindowYDown(gRel, minX, minY, w, h)
    val npix = Rasterize.countMask(mask)
    val fracs = new Array[Double](kernels.length)
    if (npix == 0) return Result(g.id, cx, cy, area, 0, fracs)
    val veg = new Array[Long](kernels.length)
    var r = 0
    while (r < h) {
      val mosaicRow = minY + r // no flip
      var c = 0
      while (c < w) {
        if (mask(r * w + c)) {
          val off = (mosaicRow * mw + (minX + c)) * ch
          var k = 0
          while (k < kernels.length) { veg(k) += kernels(k).classify(mosaic, off); k += 1 }
        }
        c += 1
      }
      r += 1
    }
    var k = 0
    while (k < kernels.length) { fracs(k) = veg(k).toDouble / npix; k += 1 }
    Result(g.id, cx, cy, area, npix, fracs)
  }

  def compute(g: GardenRow, ts: Int, tileFor: (Int, Int) => Option[Raster],
              kernels: Array[IndexKernel]): Result = {
    val raw = MPoly.fromCoords(g.geometry)
    val gKm = g.crs match {
      case Exprs.EPSG27700 => raw.map((e, n) => (e / 1000.0, n / 1000.0))
      case Exprs.CRS84 => raw.map((lon, lat) => graft.geo.Osgb.toFractionalKmTile(lon, lat))
      case other => throw new IllegalArgumentException(other)
    }
    val (cx, cy) = raw.centroid
    val areaM2 = gKm.area * 1e6

    val (mnx, mny, mxx, mxy) = gKm.bounds
    val minE = mnx.toInt; val minN = mny.toInt
    val maxE = mxx.toInt; val maxN = mxy.toInt

    // mosaic assembly with vertical flip (image_loaders.py:235-255)
    val mw = (maxE - minE + 1) * ts
    val mh = (maxN - minN + 1) * ts
    val ch = kernels.head.channels
    val mosaic = new Array[Byte](mw * mh * ch)
    for (n <- minN to maxN; e <- minE to maxE) {
      tileFor(e, n).foreach { tile =>
        require(tile.w == ts && tile.h == ts && tile.channels == ch)
        val eOff = (e - minE) * ts
        val nOff = (maxN - n) * ts
        var r = 0
        while (r < ts) {
          System.arraycopy(tile.data, r * ts * ch, mosaic, ((nOff + r) * mw + eOff) * ch, ts * ch)
          r += 1
        }
      }
    }

    // affine to mosaic pixel space and crop (image_loaders.py:276-294)
    val gRel = gKm.affine(ts, 0, 0, ts, -minE.toDouble * ts, -minN.toDouble * ts)
    val (bx0, by0, bx1, by1) = gRel.bounds
    val minX = math.floor(bx0).toInt; val minY = math.floor(by0).toInt
    val maxX = math.floor(bx1).toInt; val maxY = math.floor(by1).toInt
    val w = maxX - minX + 1
    val h = maxY - minY + 1

    val mask = Rasterize.maskWindow(gRel, minX, minY, w, h)
    val npix = Rasterize.countMask(mask)
    val fracs = new Array[Double](kernels.length)
    if (npix == 0) return Result(g.id, cx, cy, areaM2, 0, fracs)

    val veg = new Array[Long](kernels.length)
    // cropped image row r = mosaic row (mh-1-maxY)+r (vertical flip crop,
    // image_loaders.py:284-294); mask row r aligns with cropped row r
    var r = 0
    while (r < h) {
      val mosaicRow = (mh - 1 - maxY) + r
      var c = 0
      while (c < w) {
        if (mask(r * w + c)) {
          val off = (mosaicRow * mw + (minX + c)) * ch
          var k = 0
          while (k < kernels.length) { veg(k) += kernels(k).classify(mosaic, off); k += 1 }
        }
        c += 1
      }
      r += 1
    }
    var k = 0
    while (k < kernels.length) { fracs(k) = veg(k).toDouble / npix; k += 1 }
    Result(g.id, cx, cy, areaM2, npix, fracs)
  }
}
