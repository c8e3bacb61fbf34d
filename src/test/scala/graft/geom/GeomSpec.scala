package graft.geom

import org.scalatest.funsuite.AnyFunSuite

class GeomSpec extends AnyFunSuite {

  private def square(x0: Double, y0: Double, s: Double): Seq[Seq[Double]] =
    Seq(Seq(x0, y0), Seq(x0 + s, y0), Seq(x0 + s, y0 + s), Seq(x0, y0 + s), Seq(x0, y0))

  test("area: unit square, holes subtract, multipolygon sums") {
    val sq = MPoly.fromPolygonCoords(Seq(square(0, 0, 10)))
    assert(math.abs(sq.area - 100.0) < 1e-12)

    val withHole = MPoly.fromPolygonCoords(Seq(square(0, 0, 10), square(2, 2, 3)))
    assert(math.abs(withHole.area - 91.0) < 1e-12)

    val multi = MPoly.fromCoords(Seq(Seq(square(0, 0, 1)), Seq(square(5, 5, 2))))
    assert(math.abs(multi.area - 5.0) < 1e-12)

    // orientation-independent
    val cw = MPoly.fromPolygonCoords(Seq(square(0, 0, 10).reverse))
    assert(math.abs(cw.area - 100.0) < 1e-12)
  }

  test("centroid: squares, holes, multipolygon weighting") {
    val sq = MPoly.fromPolygonCoords(Seq(square(2, 4, 2)))
    val (cx, cy) = sq.centroid
    assert(math.abs(cx - 3.0) < 1e-12 && math.abs(cy - 5.0) < 1e-12)

    // square [0,4]^2 with hole [0,2]x[0,4] left half removed-ish: use hole [0,2]x[0,4]
    val holed = MPoly.fromPolygonCoords(Seq(square(0, 0, 4), Seq(Seq(0.0, 0.0), Seq(2.0, 0.0), Seq(2.0, 4.0), Seq(0.0, 4.0), Seq(0.0, 0.0))))
    val (hx, hy) = holed.centroid
    assert(math.abs(hx - 3.0) < 1e-12 && math.abs(hy - 2.0) < 1e-12)

    // two squares area 1 at (0.5,0.5) and area 4 at (4,4) -> weighted centroid
    val multi = MPoly.fromCoords(Seq(Seq(square(0, 0, 1)), Seq(square(3, 3, 2))))
    val (mx, my) = multi.centroid
    assert(math.abs(mx - (0.5 * 1 + 4.0 * 4) / 5.0) < 1e-12)
    assert(math.abs(my - (0.5 * 1 + 4.0 * 4) / 5.0) < 1e-12)
  }

  test("bounds and affine") {
    val g = MPoly.fromPolygonCoords(Seq(square(1, 2, 3)))
    assert(g.bounds == (1.0, 2.0, 4.0, 5.0))
    val t = g.affine(100, 0, 0, 100, -100, -200) // scale by tile size, offset
    assert(t.bounds == (0.0, 0.0, 300.0, 300.0))
  }

  test("rasterize: pixel-center containment on an axis-aligned square") {
    // square from (1,1) to (4,4) in pixel units over window [0,5)x[0,5):
    // centers 1.5,2.5,3.5 inside -> 3x3 block
    val g = MPoly.fromPolygonCoords(Seq(square(1, 1, 3)))
    val m = Rasterize.maskWindow(g, 0, 0, 5, 5)
    assert(Rasterize.countMask(m) == 9)
    // row 0 = top (iAbs=4, yc=4.5 -> outside)
    assert(!m(0 * 5 + 2))
    // row 1 (iAbs=3, yc=3.5) cols 1..3 inside
    assert(!m(1 * 5 + 0) && m(1 * 5 + 1) && m(1 * 5 + 2) && m(1 * 5 + 3) && !m(1 * 5 + 4))
  }

  test("rasterize: hole excluded (even-odd)") {
    val g = MPoly.fromPolygonCoords(Seq(square(0, 0, 6), square(2, 2, 2)))
    val m = Rasterize.maskWindow(g, 0, 0, 6, 6)
    // 36 - 4 hole pixels
    assert(Rasterize.countMask(m) == 32)
    assert(!m((6 - 1 - 2) * 6 + 2)) // (x=2.5,y=2.5) inside hole
  }

  test("rasterize: fragment-sum equals whole-window mask (mosaic-free algebra)") {
    // polygon spanning a 'tile boundary' at x=100 (ts=100): mask over full
    // window must equal the union of per-tile sub-windows, pixel for pixel.
    val tri = MPoly.fromPolygonCoords(Seq(Seq(
      Seq(80.0, 10.0), Seq(130.0, 20.0), Seq(95.0, 60.0), Seq(80.0, 10.0))))
    val x0 = 80; val y0 = 10; val w = 51; val h = 51
    val whole = Rasterize.maskWindow(tri, x0, y0, w, h)

    // split at x=100
    val left = Rasterize.maskWindow(tri, x0, y0, 100 - x0, h)
    val right = Rasterize.maskWindow(tri, 100, y0, x0 + w - 100, h)
    var total = 0L
    total += Rasterize.countMask(left) + Rasterize.countMask(right)
    assert(total == Rasterize.countMask(whole))
    // spot-check exact pixels
    for (r <- 0 until h; c <- 0 until (100 - x0)) {
      assert(whole(r * w + c) == left(r * (100 - x0) + c), s"left ($r,$c)")
    }
    for (r <- 0 until h; c <- 0 until (x0 + w - 100)) {
      assert(whole(r * w + (100 - x0) + c) == right(r * (x0 + w - 100) + c), s"right ($r,$c)")
    }
  }

  test("rasterize: degenerate zero-area polygon yields empty mask") {
    val g = MPoly.fromPolygonCoords(Seq(Seq(Seq(1.0, 1.0), Seq(1.0, 1.0), Seq(1.0, 1.0))))
    val m = Rasterize.maskWindow(g, 0, 0, 3, 3)
    assert(Rasterize.countMask(m) == 0)
  }

  test("property: random triangles — strictly interior pixel centers are masked") {
    val rnd = new scala.util.Random(42)
    var trials = 0
    while (trials < 200) {
      val Seq(x1, y1, x2, y2, x3, y3) = Seq.fill(6)(rnd.nextDouble() * 40.0)
      val area2 = math.abs((x2 - x1) * (y3 - y1) - (x3 - x1) * (y2 - y1))
      if (area2 > 1.0) {
        val g = MPoly.fromPolygonCoords(Seq(Seq(Seq(x1, y1), Seq(x2, y2), Seq(x3, y3), Seq(x1, y1))))
        val m = Rasterize.maskWindow(g, 0, 0, 41, 41)
        // check every pixel center with a robust independent PIP (strict interior only)
        var r = 0
        while (r < 41) {
          var c = 0
          while (c < 41) {
            val cx = c + 0.5; val cy = (40 - r) + 0.5
            val d = distToEdges(cx, cy, Seq((x1, y1), (x2, y2), (x3, y3)))
            if (d > 0.02) { // only judge centers safely away from edges
              val inside = pipWinding(cx, cy, Seq((x1, y1), (x2, y2), (x3, y3)))
              assert(m(r * 41 + c) == inside, s"pixel ($r,$c) center ($cx,$cy) tri=($x1,$y1)($x2,$y2)($x3,$y3)")
            }
            c += 1
          }
          r += 1
        }
      }
      trials += 1
    }
  }

  private def pipWinding(px: Double, py: Double, pts: Seq[(Double, Double)]): Boolean = {
    var inside = false
    val n = pts.length
    var i = 0
    while (i < n) {
      val (x1, y1) = pts(i); val (x2, y2) = pts((i + 1) % n)
      if ((y1 > py) != (y2 > py)) {
        val xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
        if (px < xint) inside = !inside
      }
      i += 1
    }
    inside
  }

  private def distToEdges(px: Double, py: Double, pts: Seq[(Double, Double)]): Double = {
    val n = pts.length
    (0 until n).map { i =>
      val (x1, y1) = pts(i); val (x2, y2) = pts((i + 1) % n)
      val dx = x2 - x1; val dy = y2 - y1
      val len2 = dx * dx + dy * dy
      if (len2 == 0) math.hypot(px - x1, py - y1)
      else {
        val t = math.max(0.0, math.min(1.0, ((px - x1) * dx + (py - y1) * dy) / len2))
        math.hypot(px - (x1 + t * dx), py - (y1 + t * dy))
      }
    }.min
  }
}
