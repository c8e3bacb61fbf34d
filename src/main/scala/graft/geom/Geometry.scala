package graft.geom

/** From-scratch planar geometry kernel for the engine: rings stored as
  * packed coordinate arrays, polygons with holes, multipolygons.
  *
  * Semantics mirror shapely/GEOS as used by the reference
  * (green_spaces/calculate_indices.py:121-128, image_loaders.py:257-294):
  * unsigned area (holes subtract), area-weighted centroid, bounds.
  */
final class Ring(val xs: Array[Double], val ys: Array[Double]) extends Serializable {
  def size: Int = xs.length

  /** Shoelace signed area (closed implicitly; duplicate last point is harmless). */
  def signedArea: Double = {
    var s = 0.0
    var i = 0
    val n = xs.length
    while (i < n) {
      val j = if (i + 1 == n) 0 else i + 1
      s += xs(i) * ys(j) - xs(j) * ys(i)
      i += 1
    }
    s * 0.5
  }

  /** (sumX, sumY) of the 6A-weighted centroid sums (orientation-consistent with signedArea). */
  def centroidSums: (Double, Double) = {
    var sx = 0.0; var sy = 0.0
    var i = 0
    val n = xs.length
    while (i < n) {
      val j = if (i + 1 == n) 0 else i + 1
      val cross = xs(i) * ys(j) - xs(j) * ys(i)
      sx += (xs(i) + xs(j)) * cross
      sy += (ys(i) + ys(j)) * cross
      i += 1
    }
    (sx / 6.0, sy / 6.0)
  }

  def map(f: (Double, Double) => (Double, Double)): Ring = {
    val nx = new Array[Double](xs.length)
    val ny = new Array[Double](ys.length)
    var i = 0
    while (i < xs.length) {
      val (x, y) = f(xs(i), ys(i))
      nx(i) = x; ny(i) = y
      i += 1
    }
    new Ring(nx, ny)
  }
}

final class Poly(val outer: Ring, val holes: Array[Ring]) extends Serializable {
  def area: Double =
    math.abs(outer.signedArea) - holes.map(h => math.abs(h.signedArea)).sum
  def map(f: (Double, Double) => (Double, Double)): Poly =
    new Poly(outer.map(f), holes.map(_.map(f)))
  def rings: Iterator[Ring] = Iterator(outer) ++ holes.iterator
}

final class MPoly(val polys: Array[Poly]) extends Serializable {

  /** Unsigned area; holes subtract (GEOS `.area` semantics). */
  def area: Double = polys.map(_.area).sum

  /** Area-weighted centroid over polygons, holes negative (GEOS semantics). */
  def centroid: (Double, Double) = {
    var sw = 0.0; var sx = 0.0; var sy = 0.0
    polys.foreach { p =>
      val aOut = p.outer.signedArea
      val (cx, cy) = p.outer.centroidSums
      // normalize ring orientation: sums/area is orientation-invariant,
      // so scale contributions by sign(area) to get positive-outer weights
      val sgnOut = if (aOut < 0) -1.0 else 1.0
      sw += sgnOut * aOut; sx += sgnOut * cx; sy += sgnOut * cy
      p.holes.foreach { h =>
        val aH = h.signedArea
        val (hx, hy) = h.centroidSums
        val sgn = if (aH < 0) -1.0 else 1.0
        sw -= sgn * aH; sx -= sgn * hx; sy -= sgn * hy
      }
    }
    if (sw == 0.0) {
      // degenerate (zero-area): fall back to vertex average like GEOS does for
      // collapsed geometries (approximation; only hit by pathological inputs)
      var n = 0; var ax = 0.0; var ay = 0.0
      polys.foreach(_.rings.foreach { r =>
        var i = 0
        while (i < r.size) { ax += r.xs(i); ay += r.ys(i); n += 1; i += 1 }
      })
      (ax / math.max(n, 1), ay / math.max(n, 1))
    } else (sx / sw, sy / sw)
  }

  /** (minX, minY, maxX, maxY) */
  def bounds: (Double, Double, Double, Double) = {
    var mnx = Double.PositiveInfinity; var mny = Double.PositiveInfinity
    var mxx = Double.NegativeInfinity; var mxy = Double.NegativeInfinity
    polys.foreach(_.rings.foreach { r =>
      var i = 0
      while (i < r.size) {
        val x = r.xs(i); val y = r.ys(i)
        if (x < mnx) mnx = x; if (x > mxx) mxx = x
        if (y < mny) mny = y; if (y > mxy) mxy = y
        i += 1
      }
    })
    (mnx, mny, mxx, mxy)
  }

  def map(f: (Double, Double) => (Double, Double)): MPoly =
    new MPoly(polys.map(_.map(f)))

  /** 6-param affine [a,b,d,e,xoff,yoff]: x'=a*x+b*y+xoff, y'=d*x+e*y+yoff
    * (shapely.affinity.affine_transform convention,
    * reference: image_loaders.py:273-277). */
  def affine(a: Double, b: Double, d: Double, e: Double, xoff: Double, yoff: Double): MPoly =
    map((x, y) => (a * x + b * y + xoff, d * x + e * y + yoff))
}

object MPoly {
  /** Build from GeoJSON-style nested coords:
    * MultiPolygon = Seq[polygon]; polygon = Seq[ring]; ring = Seq[point]; point = Seq(x, y[, z]). */
  def fromCoords(coords: Seq[Seq[Seq[Seq[Double]]]]): MPoly = {
    val polys = coords.map { rings =>
      val built = rings.map { ring =>
        val n = ring.length
        val xs = new Array[Double](n)
        val ys = new Array[Double](n)
        var i = 0
        ring.foreach { pt => xs(i) = pt(0); ys(i) = pt(1); i += 1 }
        new Ring(xs, ys)
      }
      new Poly(built.head, built.tail.toArray)
    }
    new MPoly(polys.toArray)
  }

  /** A single polygon (ring seq) convenience. */
  def fromPolygonCoords(rings: Seq[Seq[Seq[Double]]]): MPoly = fromCoords(Seq(rings))
}
