package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.geom.MPoly
import graft.geo.{Osgb, TileCode}
import graft.img.{Codec, Raster, Resize}
import graft.index.ZIndex
import graft.kernel.{IndexKernel, Kernels}

/** Catalyst expressions for the polygon-tile pipeline. All are
  * CodegenFallback — the work is whole-buffer kernels where codegen buys
  * nothing; they sit between codegen'd scan/join/aggregate stages. */
object Exprs {
  def col(e: Expression): Column = GraftBridge.column(e)
  def expr(c: Column): Expression = GraftBridge.expression(c)

  /** coordinates nested-array -> MPoly. Accepts the GeoJSON MultiPolygon
    * shape Array[poly][ring][point][xy]. */
  def coordsToMPoly(coords: ArrayData): MPoly = {
    val polys = (0 until coords.numElements()).map { pi =>
      val rings = coords.getArray(pi)
      val builtRings = (0 until rings.numElements()).map { ri =>
        val pts = rings.getArray(ri)
        val n = pts.numElements()
        val xs = new Array[Double](n)
        val ys = new Array[Double](n)
        var i = 0
        while (i < n) {
          val pt = pts.getArray(i)
          xs(i) = pt.getDouble(0)
          ys(i) = pt.getDouble(1)
          i += 1
        }
        new graft.geom.Ring(xs, ys)
      }
      new graft.geom.Poly(builtRings.head, builtRings.tail.toArray)
    }
    new MPoly(polys.toArray)
  }

  val CRS84 = "urn:ogc:def:crs:OGC:1.3:CRS84"
  val EPSG27700 = "urn:ogc:def:crs:EPSG::27700"
}

/** Per-garden preparation: CRS transform to km-tile space, centroid
  * (original CRS), surface area m2, covering cells, spatial sort key and
  * the serialized pixel-space polygon blob.
  * (reference: calculate_indices.py:110-137 + image_loaders.py:201-213,
  * 257-294 prep portions) */
case class PrepareGarden(gid: Expression, geometry: Expression, crs: Expression,
                         tileSize: Int,
                         /** Covering-cell grid for the polygon⋈tile join.
                           * Square = one cell per km tile (reference
                           * semantics). A hex grid (H3-style) covers via
                           * the hexes of the covered tiles' CENTERS — a
                           * superset match whose extra fragments score
                           * zero pixels, so sums are bit-identical. */
                         grid: graft.index.GridSystem = graft.index.GridSystem.Square)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(gid, geometry, crs)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("blob", BinaryType, nullable = false),
    StructField("cells", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("cx", DoubleType, nullable = false),
    StructField("cy", DoubleType, nullable = false),
    StructField("area_m2", DoubleType, nullable = false),
    StructField("sort_key", LongType, nullable = false)
  ))

  override def eval(input: InternalRow): Any = {
    val gidV = gid.eval(input).asInstanceOf[Long]
    val coords = geometry.eval(input).asInstanceOf[ArrayData]
    val crsV = crs.eval(input).asInstanceOf[UTF8String].toString
    val raw = Exprs.coordsToMPoly(coords)

    val gKm = crsV match {
      case Exprs.CRS84 => raw.map((lon, lat) => Osgb.toFractionalKmTile(lon, lat))
      case Exprs.EPSG27700 => raw.map((e, n) => (e / 1000.0, n / 1000.0))
      case other => throw new IllegalArgumentException(s"""crs_name="$other" is unsupported""")
    }

    val (cx, cy) = raw.centroid
    val area = gKm.area * 1000.0 * 1000.0
    val (mnx, mny, mxx, mxy) = gKm.bounds
    val sqCells = ZIndex.coverBounds(mnx, mny, mxx, mxy)
    val cells =
      if (grid == graft.index.GridSystem.Square) sqCells
      else sqCells.map(c =>
        grid.cellOf(ZIndex.cellE(c) + 0.5, ZIndex.cellN(c) + 0.5)).distinct
    val sortKey = mnx.toInt.toLong * 1000L + mny.toInt.toLong

    val ts = tileSize
    val cropX0 = math.floor(mnx * ts).toInt
    val cropY0 = math.floor(mny * ts).toInt
    val cropX1 = math.floor(mxx * ts).toInt
    val cropY1 = math.floor(mxy * ts).toInt
    val gPix = gKm.affine(ts, 0, 0, ts, 0, 0)
    val blob = PolyBlob.serialize(gidV, cropX0, cropX1, cropY0, cropY1, gPix)

    InternalRow(blob, new GenericArrayData(cells), cx, cy, area, sortKey)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(gid = newChildren(0), geometry = newChildren(1), crs = newChildren(2))
}

/** Score all polygons of one tile-cell against the decoded tile:
  * returns array<struct(gid, npix, veg: array<long>)>. Decodes the tile
  * once per row regardless of how many polygons cover it (the Spark
  * analogue of the reference's LRU-amortized decode,
  * image_loaders.py:215-227). Null/absent tile bytes -> the reference's
  * zero-fill semantics via each kernel's onBlack value. Wrong-sized tiles
  * are resized to tileSize (image_loaders.py:222-226). For IRGB kernels,
  * `cirBytes` carries the same-cell CIR tile which is fused as the Ir
  * plane with bicubic upscale (S3/J2, image_loaders.py:362-386). */
case class ScoreFragments(cell: Expression, bytes: Expression,
                          cirBytes: Expression, blobs: Expression,
                          tileSize: Int, kernelNames: Seq[String],
                          yDown: Boolean = false,
                          metrics: Option[PipelineMetrics] = None,
                          /** When set, the cell→blobs map comes from this
                            * executor-shared Broadcast (built once per
                            * index lifetime) instead of the `blobs` child
                            * — the map-side-join formulation with no
                            * per-query HashedRelation rebuild. */
                          lookup: Option[org.apache.spark.broadcast.Broadcast[
                            java.util.HashMap[Long, Array[Array[Byte]]]]] = None,
                          /** Lookup key when the polygon index is built on
                            * a DIFFERENT grid than the square tile grid
                            * (hex cover): `cell` stays the square tile
                            * cell that anchors the raster geometry, this
                            * keys the cell→blobs map. Defaults to `cell`. */
                          joinCell: Option[Expression] = None)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(cell, bytes, cirBytes, blobs) ++ joinCell
  override def nullable: Boolean = false

  @transient private lazy val kernels: Array[IndexKernel] =
    kernelNames.map(Kernels.all(_)).toArray
  @transient private lazy val format: String = kernels.head.inputFormat

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("gid", LongType, nullable = false),
    StructField("npix", LongType, nullable = false),
    StructField("veg", ArrayType(LongType, containsNull = false), nullable = false)
  )), containsNull = false)

  override def eval(input: InternalRow): Any = {
    val cellV = cell.eval(input).asInstanceOf[Long]
    val blobArr: Array[Array[Byte]] = lookup match {
      case Some(b) => // null when the (join) cell is uncovered
        b.value.get(joinCell.fold(cellV)(_.eval(input).asInstanceOf[Long]))
      case None =>
        val blobsV = blobs.eval(input).asInstanceOf[ArrayData]
        if (blobsV == null) null
        else Array.tabulate(blobsV.numElements())(i => blobsV.getBinary(i))
    }
    if (blobArr == null || blobArr.length == 0) return new GenericArrayData(Array.empty[Any])
    val bytesV = bytes.eval(input).asInstanceOf[Array[Byte]]
    val cirV = cirBytes.eval(input).asInstanceOf[Array[Byte]]

    val ts = tileSize
    val e = ZIndex.cellE(cellV)
    val n = ZIndex.cellN(cellV)
    val pps = new Array[PolyBlob.Prepared](blobArr.length)
    var i = 0
    while (i < blobArr.length) { pps(i) = PolyBlob.deserialize(blobArr(i)); i += 1 }

    var raster: Raster = null
    if (bytesV != null && bytesV.nonEmpty) {
      metrics.foreach(_.tilesDecoded.add(1))
      raster = Codec.decodeBGR(bytesV)
      if (raster.w != ts || raster.h != ts) {
        // S10: per-tile resize warning, message shaped like the
        // reference's (image_loaders.py:222-224 — numpy shape order is
        // (rows, cols, channels), and the stray ')' is its own typo)
        metrics.foreach { m =>
          val name =
            if (yDown) s"$e/$n"
            else TileCode.fromEastingsNorthings(e, n)
          m.warn(s"""Image "$name" is sized (${raster.h}, ${raster.w}, 3)""" +
            s" rather than ($ts, $ts, 3))")
        }
        raster = Resize.bilinear(raster, ts, ts)
      }
      if (format == "IRGB") {
        val cir =
          if (cirV != null && cirV.nonEmpty) Codec.decodeBGR(cirV)
          else Raster(new Array[Byte](ts * ts * 3), ts, ts, 3) // zero Ir plane
        // upscale Ir only inside the union of fragment raster windows —
        // window pixels are bit-identical to a full-plane upscale and
        // only they are ever read by scoreFragment
        val tileX0 = e * ts; val tileY0 = n * ts
        var ux0 = Int.MaxValue; var ux1 = Int.MinValue
        var uy0 = Int.MaxValue; var uy1 = Int.MinValue
        var k = 0
        while (k < pps.length) {
          val pp = pps(k)
          val wx0 = math.max(pp.cropX0, tileX0)
          val wx1 = math.min(pp.cropX1, tileX0 + ts - 1)
          val wy0 = math.max(pp.cropY0, tileY0)
          val wy1 = math.min(pp.cropY1, tileY0 + ts - 1)
          if (wx0 <= wx1 && wy0 <= wy1) {
            val cs = wx0 - tileX0; val ce = wx1 - tileX0
            val rs = if (yDown) wy0 - tileY0 else ts - 1 - (wy1 - tileY0)
            val re = if (yDown) wy1 - tileY0 else ts - 1 - (wy0 - tileY0)
            if (cs < ux0) ux0 = cs
            if (ce > ux1) ux1 = ce
            if (rs < uy0) uy0 = rs
            if (re > uy1) uy1 = re
          }
          k += 1
        }
        raster = Codec.fuseBGRIWindow(raster, cir, ux0, uy0, ux1, uy1)
      }
    }

    metrics.foreach { m =>
      if (raster == null) m.missingTileFragments.add(blobArr.length)
      m.fragmentsScored.add(blobArr.length)
    }
    val out = new Array[Any](pps.length)
    i = 0
    while (i < pps.length) {
      val pp = pps(i)
      val (npix, veg) = PolyBlob.scoreFragment(pp, e, n, ts, raster, kernels, yDown)
      out(i) = InternalRow(pp.gid, npix, new GenericArrayData(veg))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(cell = newChildren(0), bytes = newChildren(1), cirBytes = newChildren(2),
      blobs = newChildren(3), joinCell = newChildren.lift(4))
}

/** Web-mercator garden preparation (the WebMercatorMapLoader path,
  * image_loaders.py:32-158): CRS84 only; geometry goes to (tileX,
  * tileY-down) slippy coordinates at `zoom`; area stays in tile² units
  * (explicitly not metric, README.md:172); cells are (x, y) slippy keys. */
case class PrepareGardenWebMerc(gid: Expression, geometry: Expression, crs: Expression,
                                zoom: Int, tileSize: Int)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(gid, geometry, crs)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("blob", BinaryType, nullable = false),
    StructField("cells", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("cx", DoubleType, nullable = false),
    StructField("cy", DoubleType, nullable = false),
    StructField("area_m2", DoubleType, nullable = false),
    StructField("sort_key", LongType, nullable = false)
  ))

  override def eval(input: InternalRow): Any = {
    val gidV = gid.eval(input).asInstanceOf[Long]
    val coords = geometry.eval(input).asInstanceOf[ArrayData]
    val crsV = crs.eval(input).asInstanceOf[UTF8String].toString
    if (crsV != Exprs.CRS84)
      throw new IllegalArgumentException(s"""crs_name="$crsV" is unsupported""")
    val raw = Exprs.coordsToMPoly(coords)
    // (lon, lat) -> (x = tileX, y = tileY downward)
    val gTile = raw.map { (lon, lat) =>
      val (ty, tx) = graft.geo.WebMercator.latLongToTileYX(zoom, lat, lon)
      (tx, ty)
    }
    val (cx, cy) = raw.centroid
    val area = gTile.area // tile^2 units (image_loaders.py:119)
    val (mnx, mny, mxx, mxy) = gTile.bounds
    val cells = graft.index.ZIndex.coverBounds(mnx, mny, mxx, mxy)
    // reference sort key uses the transformed bounds as stored: (tileY, tileX)
    val sortKey = mny.toInt.toLong * 1000L + mnx.toInt.toLong

    val ts = tileSize
    val cropX0 = math.floor(mnx * ts).toInt
    val cropY0 = math.floor(mny * ts).toInt
    val cropX1 = math.floor(mxx * ts).toInt
    val cropY1 = math.floor(mxy * ts).toInt
    val gPix = gTile.affine(ts, 0, 0, ts, 0, 0)
    val blob = PolyBlob.serialize(gidV, cropX0, cropX1, cropY0, cropY1, gPix)
    InternalRow(blob, new GenericArrayData(cells), cx, cy, area, sortKey)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(gid = newChildren(0), geometry = newChildren(1), crs = newChildren(2))
}

/** Slippy key "z/x/y" -> packed cell id (null when zoom mismatches). */
case class SlippyKeyToCell(child: Expression, zoom: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val parts = v.asInstanceOf[UTF8String].toString.split('/')
    if (parts.length != 3) return null
    try {
      if (parts(0).toInt != zoom) null
      else ZIndex.cellId(parts(1).toInt, parts(2).toInt)
    } catch { case _: NumberFormatException => null }
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** OSGB tile code string -> packed cell id (null outside the grid,
  * filtering invalid tiles like the reference's name-shape checks,
  * generate_coverage.py:344-347). */
case class TileCodeToCell(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val code = v.asInstanceOf[UTF8String].toString
    val en = TileCode.toEastingsNorthings(code)
    if (en == null) null else ZIndex.cellId(en._1, en._2)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** (eastings, northings) km ints -> tile code string (G3). */
case class CellToTileCode(e: Expression, n: Expression)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(e, n)
  override def nullable: Boolean = true
  override def dataType: DataType = StringType
  override def eval(input: InternalRow): Any = {
    val eV = e.eval(input); val nV = n.eval(input)
    if (eV == null || nV == null) return null
    val code = TileCode.fromEastingsNorthings(
      eV.asInstanceOf[Number].intValue(), nV.asInstanceOf[Number].intValue())
    if (code == null) null else UTF8String.fromString(code)
  }
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(e = newChildren(0), n = newChildren(1))
}

/** WGS84 lon/lat -> OSGB eastings/northings metres (G1) as struct. */
case class ToOsgbEN(lon: Expression, lat: Expression)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(lon, lat)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("eastings", DoubleType, nullable = false),
    StructField("northings", DoubleType, nullable = false)))
  override def eval(input: InternalRow): Any = {
    val lo = lon.eval(input).asInstanceOf[Number].doubleValue()
    val la = lat.eval(input).asInstanceOf[Number].doubleValue()
    val (e, n) = Osgb.toEastingsNorthings(lo, la)
    InternalRow(e, n)
  }
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(lon = newChildren(0), lat = newChildren(1))
}
