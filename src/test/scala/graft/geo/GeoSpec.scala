package graft.geo

import org.scalatest.funsuite.AnyFunSuite

/** Golden ports of the reference's coordinate tests
  * (tests/test_image_loaders.py:46-104,276-368). */
class GeoSpec extends AnyFunSuite {

  test("WGS84 -> OSGB km-tile matches pyproj golden to 1cm (test_image_loaders.py:75-87)") {
    // (lon, lat) -> expected (e_km, n_km), 5-decimal (1 cm) tolerance
    val cases = Seq(
      (-2.472899455869044, 51.430893105324593, 367.22085, 170.3162),
      (-2.472903780332496, 51.430893987034189, 367.22055, 170.3163),
      (-2.473121281324169, 51.430884926567657, 367.205423, 170.31539)
    )
    cases.foreach { case (lon, lat, eKm, nKm) =>
      val (e, n) = Osgb.toFractionalKmTile(lon, lat)
      assert(math.abs(e - eKm) < 1e-5, s"eastings for ($lon,$lat): got $e want $eKm")
      assert(math.abs(n - nKm) < 1e-5, s"northings for ($lon,$lat): got $n want $nKm")
    }
  }

  test("tile code goldens (test_image_loaders.py:276-368)") {
    assert(TileCode.fromEastingsNorthings(401, 126) == "SU0126")
    assert(TileCode.fromEastingsNorthings(400, 100) == "SU0000")
    assert(TileCode.fromEastingsNorthings(399, 99) == "SY9999")
    assert(TileCode.fromEastingsNorthings(400, 99) == "SZ0099")
    assert(TileCode.fromEastingsNorthings(399, 100) == "ST9900")
    assert(TileCode.fromEastingsNorthings(499, 499) == "SE9999")
    assert(TileCode.fromEastingsNorthings(500, 499) == "TA0099")
    assert(TileCode.fromEastingsNorthings(499, 500) == "NZ9900")
    assert(TileCode.fromEastingsNorthings(500, 500) == "OV0000")
  }

  test("tile file path golden (test_image_loaders.py:90-104)") {
    assert(TileCode.toFilePath(702, 345) == "TH/TH04/TH0245.jpg")
  }

  test("tile code round-trips over the whole grid") {
    for (e <- 0 until 800 by 7; n <- 0 until 1300 by 13) {
      val code = TileCode.fromEastingsNorthings(e, n)
      assert(code != null, s"($e,$n)")
      assert(TileCode.toEastingsNorthings(code) == (e, n), s"roundtrip ($e,$n) via $code")
    }
    assert(TileCode.fromEastingsNorthings(800, 0) == null)
    assert(TileCode.fromEastingsNorthings(0, 1300) == null)
    assert(TileCode.fromEastingsNorthings(-1, 0) == null)
    assert(TileCode.toEastingsNorthings("short") == null)
  }

  test("web mercator tile math (coordinate_transforms.py:14-29)") {
    // zoom 0: whole world is tile (0,0); equator/meridian at 0.5
    val (y, x) = WebMercator.latLongToTileYX(0, 0.0, 0.0)
    assert(math.abs(y - 0.5) < 1e-12 && math.abs(x - 0.5) < 1e-12)
    // zoom 1 at lon=90E: x = (0.5 + 0.25)*2 = 1.5
    val (_, x1) = WebMercator.latLongToTileYX(1, 0.0, 90.0)
    assert(math.abs(x1 - 1.5) < 1e-12)
    // London at zoom 17: x = (0.5 - 0.1278/360)*2^17 = 65489.5 -> 65489
    val (iy, ix) = WebMercator.latLongToTileIntYX(17, 51.5074, -0.1278)
    assert(ix == 65489 && iy == 43584)
  }
}
