package graft.geo

/** WGS84 (EPSG:4326) -> OSGB36 / British National Grid (EPSG:27700)
  * reprojection, written from scratch from the public OSGB formulae
  * (Ordnance Survey "A guide to coordinate systems in Great Britain")
  * and the standard proj-style 7-parameter Helmert datum shift.
  *
  * Reproduces the reference's pyproj transform
  * (reference: green_spaces/coordinate_transforms.py:5-6,93-107) to well
  * under the 1 cm tolerance pinned by tests/test_image_loaders.py:75-87.
  */
object Osgb {

  // WGS84 ellipsoid
  private val aW = 6378137.0
  private val fW = 1.0 / 298.257223563
  private val e2W = fW * (2.0 - fW)

  // Airy 1830 ellipsoid (proj 'airy')
  private val aA = 6377563.396
  private val bA = 6356256.910
  private val e2A = 1.0 - (bA * bA) / (aA * aA)

  // Helmert OSGB36 -> WGS84 (position-vector, proj towgs84 convention):
  // tx,ty,tz metres; rx,ry,rz arc-seconds; s ppm
  private val tx = 446.448
  private val ty = -125.157
  private val tz = 542.060
  private val sec2rad = math.Pi / (180.0 * 3600.0)
  private val rx = 0.1502 * sec2rad
  private val ry = 0.2470 * sec2rad
  private val rz = 0.8421 * sec2rad
  private val mBF = 1.0 + (-20.4894) * 1e-6

  // Transverse Mercator (British National Grid)
  private val f0 = 0.9996012717
  private val lat0 = math.toRadians(49.0)
  private val lon0 = math.toRadians(-2.0)
  private val e0 = 400000.0
  private val n0 = -100000.0

  /** lon/lat degrees on WGS84 -> (eastings, northings) metres on OSGB36. */
  def toEastingsNorthings(lonDeg: Double, latDeg: Double): (Double, Double) = {
    val lam = math.toRadians(lonDeg)
    val phi = math.toRadians(latDeg)

    // geodetic -> geocentric on WGS84 (h = 0)
    val sinP = math.sin(phi); val cosP = math.cos(phi)
    val nu = aW / math.sqrt(1.0 - e2W * sinP * sinP)
    val x1 = nu * cosP * math.cos(lam)
    val y1 = nu * cosP * math.sin(lam)
    val z1 = nu * (1.0 - e2W) * sinP

    // inverse Helmert (proj geocentric_from_wgs84: translate, transpose-rotate, de-scale)
    val xt = x1 - tx; val yt = y1 - ty; val zt = z1 - tz
    val x2 = (xt + rz * yt - ry * zt) / mBF
    val y2 = (-rz * xt + yt + rx * zt) / mBF
    val z2 = (ry * xt - rx * yt + zt) / mBF

    // geocentric -> geodetic on Airy 1830 (iterative)
    val p = math.sqrt(x2 * x2 + y2 * y2)
    var phiA = math.atan2(z2, p * (1.0 - e2A))
    var i = 0
    while (i < 16) {
      val s = math.sin(phiA)
      val nuA = aA / math.sqrt(1.0 - e2A * s * s)
      val next = math.atan2(z2 + e2A * nuA * s, p)
      if (math.abs(next - phiA) < 1e-14) { phiA = next; i = 16 } else { phiA = next; i += 1 }
    }
    val lamA = math.atan2(y2, x2)

    transverseMercator(phiA, lamA)
  }

  /** OSGB36 geodetic -> BNG grid via the OS Guide series. */
  private def transverseMercator(phi: Double, lam: Double): (Double, Double) = {
    val sinP = math.sin(phi); val cosP = math.cos(phi); val tanP = math.tan(phi)
    val sin2 = sinP * sinP
    val nu = aA * f0 / math.sqrt(1.0 - e2A * sin2)
    val rho = aA * f0 * (1.0 - e2A) * math.pow(1.0 - e2A * sin2, -1.5)
    val eta2 = nu / rho - 1.0

    val n = (aA - bA) / (aA + bA)
    val n2 = n * n; val n3 = n2 * n
    val dPhi = phi - lat0; val sPhi = phi + lat0
    val m = bA * f0 * (
      (1.0 + n + 1.25 * n2 + 1.25 * n3) * dPhi
        - (3.0 * n + 3.0 * n2 + 2.625 * n3) * math.sin(dPhi) * math.cos(sPhi)
        + (1.875 * n2 + 1.875 * n3) * math.sin(2.0 * dPhi) * math.cos(2.0 * sPhi)
        - (35.0 / 24.0) * n3 * math.sin(3.0 * dPhi) * math.cos(3.0 * sPhi)
    )

    val t2 = tanP * tanP
    val cos3 = cosP * cosP * cosP
    val cos5 = cos3 * cosP * cosP
    val i0 = m + n0
    val ii = (nu / 2.0) * sinP * cosP
    val iii = (nu / 24.0) * sinP * cos3 * (5.0 - t2 + 9.0 * eta2)
    val iiia = (nu / 720.0) * sinP * cos5 * (61.0 - 58.0 * t2 + t2 * t2)
    val iv = nu * cosP
    val v = (nu / 6.0) * cos3 * (nu / rho - t2)
    val vi = (nu / 120.0) * cos5 * (5.0 - 18.0 * t2 + t2 * t2 + 14.0 * eta2 - 58.0 * t2 * eta2)

    val dl = lam - lon0
    val dl2 = dl * dl
    val north = i0 + ii * dl2 + iii * dl2 * dl2 + iiia * dl2 * dl2 * dl2
    val east = e0 + iv * dl + v * dl * dl2 + vi * dl * dl2 * dl2
    (east, north)
  }

  /** lon/lat -> fractional 1km-tile eastings/northings (km units).
    * reference: coordinate_transforms.py:104-107 */
  def toFractionalKmTile(lonDeg: Double, latDeg: Double): (Double, Double) = {
    val (e, n) = toEastingsNorthings(lonDeg, latDeg)
    (e / 1000.0, n / 1000.0)
  }
}

/** OSGB 100km-square tile-code math (skip-I letter rule) and slippy-map
  * web-mercator tiling, replicating the reference's public-domain formulae
  * (reference: green_spaces/coordinate_transforms.py:14-89). */
object TileCode {

  /** (1km-tile eastings, northings) -> 6-char tile code, or null outside
    * the 8x13 100km grid. reference: coordinate_transforms.py:33-58 */
  def fromEastingsNorthings(eastings: Int, northings: Int): String = {
    val e100km = math.floorDiv(eastings, 100)
    val n100km = math.floorDiv(northings, 100)
    if (e100km < 0 || e100km > 7 || n100km < 0 || n100km > 12) return null

    var letter1 = (19 - n100km) - (19 - n100km) % 5 + (e100km + 10) / 5
    var letter2 = (19 - n100km) * 5 % 25 + e100km % 5
    if (letter1 > 7) letter1 += 1
    if (letter2 > 7) letter2 += 1

    val c1 = ('A' + letter1).toChar
    val c2 = ('A' + letter2).toChar
    val de = math.floorMod(eastings, 100)
    val dn = math.floorMod(northings, 100)
    f"$c1$c2$de%02d$dn%02d"
  }

  /** Inverse of [[fromEastingsNorthings]]; null outside grid or malformed.
    * reference: coordinate_transforms.py:61-89 */
  def toEastingsNorthings(tileCode: String): (Int, Int) = {
    if (tileCode == null || tileCode.length != 6) return null
    val de = try tileCode.substring(2, 4).toInt catch { case _: NumberFormatException => return null }
    val dn = try tileCode.substring(4, 6).toInt catch { case _: NumberFormatException => return null }
    var l1 = tileCode.charAt(0) - 'A'
    var l2 = tileCode.charAt(1) - 'A'
    if (l1 > 8) l1 -= 1
    if (l2 > 8) l2 -= 1
    val e100km = math.floorMod(l1 - 2, 5) * 5 + math.floorMod(l2, 5)
    val n100km = (19 - math.floorDiv(l1, 5) * 5) - math.floorDiv(l2, 5)
    if (e100km < 0 || e100km > 7 || n100km < 0 || n100km > 12) return null
    (e100km * 100 + de, n100km * 100 + dn)
  }

  /** OSGB tile file path "TT/TTxy/TTxayb.jpg".
    * reference: image_loaders.py:229-233 */
  def toFilePath(eastings: Int, northings: Int): String = {
    val code = fromEastingsNorthings(eastings, northings)
    if (code == null) null
    else s"${code.substring(0, 2)}/${code.substring(0, 3)}${code.charAt(4)}/$code.jpg"
  }
}

/** Web-mercator slippy-map tile math.
  * reference: green_spaces/coordinate_transforms.py:14-29 */
object WebMercator {
  /** (zoom, lat, lon) -> fractional (tileY, tileX). */
  def latLongToTileYX(zoom: Int, latitude: Double, longitude: Double): (Double, Double) = {
    val numTiles = (1 << zoom).toDouble
    val x = (0.5 + longitude / 360.0) * numTiles
    val sinY = math.sin(latitude * (math.Pi / 180.0))
    val y = (0.5 + math.log((1.0 + sinY) / (1.0 - sinY)) / (-4.0 * math.Pi)) * numTiles
    (y, x)
  }

  def latLongToTileIntYX(zoom: Int, latitude: Double, longitude: Double): (Int, Int) = {
    val (y, x) = latLongToTileYX(zoom, latitude, longitude)
    (y.toInt, x.toInt)
  }
}
