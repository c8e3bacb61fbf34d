package graft.index

/** H3-style hexagonal cell index on the projected plane (pointy-top
  * hexagons, axial coordinates, cube rounding) — the hex counterpart to
  * [[ZIndex]] (the square/quadkey "S2 fallback"). Used as a pluggable
  * bucketing grid for kNN / spatial joins where hex geometry gives more
  * isotropic rings than squares.
  *
  * `size` is the hexagon circumradius in coordinate units. Neighbouring
  * cell centers are sqrt(3)*size apart.
  */
final case class HexIndex(size: Double) {

  private val sqrt3 = math.sqrt(3.0)

  /** Axial (q, r) of the hexagon containing (x, y), packed into a Long
    * (two biased 31-bit ints). */
  def cellOf(x: Double, y: Double): Long = {
    // pointy-top axial from cartesian
    val q = (sqrt3 / 3.0 * x - 1.0 / 3.0 * y) / size
    val r = (2.0 / 3.0 * y) / size
    val (qi, ri) = cubeRound(q, r)
    pack(qi, ri)
  }

  def center(cell: Long): (Double, Double) = {
    val (q, r) = unpack(cell)
    (size * (sqrt3 * q + sqrt3 / 2.0 * r), size * (1.5 * r))
  }

  def pack(q: Int, r: Int): Long =
    ((q.toLong + (1L << 30)) << 31) | (r.toLong + (1L << 30))
  def unpack(cell: Long): (Int, Int) =
    (((cell >> 31) - (1L << 30)).toInt, ((cell & 0x7fffffffL) - (1L << 30)).toInt)

  private def cubeRound(q: Double, r: Double): (Int, Int) = {
    val s = -q - r
    var rq = math.round(q).toInt
    var rr = math.round(r).toInt
    val rs = math.round(s).toInt
    val dq = math.abs(rq - q)
    val dr = math.abs(rr - r)
    val ds = math.abs(rs - s)
    if (dq > dr && dq > ds) rq = -rr - rs
    else if (dr > ds) rr = -rq - rs
    (rq, rr)
  }

  /** All cells within hex-grid (ring) distance k, (3k^2+3k+1) cells. */
  def kRing(cell: Long, k: Int): Array[Long] = {
    val (q0, r0) = unpack(cell)
    val out = Array.newBuilder[Long]
    var dq = -k
    while (dq <= k) {
      var dr = math.max(-k, -dq - k)
      val hi = math.min(k, -dq + k)
      while (dr <= hi) {
        out += pack(q0 + dq, r0 + dr)
        dr += 1
      }
      dq += 1
    }
    out.result()
  }

  /** Lower bound on the distance from any point inside `cell` to any point
    * in a cell OUTSIDE kRing(cell, k) — the exactness guarantee for
    * ring-expansion kNN. The minimum center distance at hex-grid distance
    * d is 1.5*d*size (attained along diagonal lattice directions, e.g.
    * axial (1,1): hex distance 2, center distance 3*size — NOT the
    * d*sqrt(3)*size of the straight axes); both points may be up to one
    * circumradius from their centers. */
  def minDistOutsideRing(k: Int): Double =
    math.max(0.0, 1.5 * (k + 1) * size - 2.0 * size)
}

/** Pluggable grid abstraction for ring-expansion algorithms. */
trait GridSystem extends Serializable {
  def cellOf(x: Double, y: Double): Long
  def kRing(cell: Long, k: Int): Array[Long]
  /** Points outside kRing(cell, k) are at least this far from any point in `cell`. */
  def minDistOutsideRing(k: Int): Double
  /** Number of cells in kRing(_, k) — the explode factor of a ring join. */
  def ringCellCount(k: Int): Long
}

object GridSystem {
  /** Unit square grid (ZIndex; cells are 1x1 in coordinate units). */
  case object Square extends GridSystem {
    def cellOf(x: Double, y: Double): Long =
      ZIndex.cellId(math.floor(x).toInt, math.floor(y).toInt)
    def kRing(cell: Long, k: Int): Array[Long] = ZIndex.kRing(cell, k)
    def minDistOutsideRing(k: Int): Double = k.toDouble
    def ringCellCount(k: Int): Long = (2L * k + 1) * (2L * k + 1)
  }

  final case class Hex(size: Double) extends GridSystem {
    private val hex = HexIndex(size)
    def cellOf(x: Double, y: Double): Long = hex.cellOf(x, y)
    def kRing(cell: Long, k: Int): Array[Long] = hex.kRing(cell, k)
    def minDistOutsideRing(k: Int): Double = hex.minDistOutsideRing(k)
    def ringCellCount(k: Int): Long = 3L * k * (k + 1) + 1
  }
}
