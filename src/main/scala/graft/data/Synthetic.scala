package graft.data

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.geo.TileCode
import graft.img.{Codec, ColorSpace, Raster, Resize}

/** Deterministic synthetic inputs (seeded, no wall-clock): an aerial tile
  * table in the BASELINE input_hint shape
  * (image_id, bytes, w, h, fmt, caption, phash) and a garden polygon
  * table shaped like the reference's GeoJSON features (FIXTURES.md §1-2).
  * Everything derives from splitmix64 of the row id, so any scale factor
  * regenerates identically on every executor. */
object Synthetic {

  final case class TileRow(image_id: String, bytes: Array[Byte], w: Int, h: Int,
                           fmt: String, caption: String, phash: Long)
  final case class GardenRow(id: String, uprn: Array[String],
                             geometry: Seq[Seq[Seq[Seq[Double]]]], crs: String)

  /** splitmix64 — public-domain PRNG step. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  def mix2(a: Long, b: Long): Long = mix(mix(a) ^ b)
  /** uniform double in [0,1) from a hash */
  def u01(h: Long): Double = (h >>> 11) * (1.0 / (1L << 53))

  // default extent: SU square area (eastings 400.., northings 100..)
  val BaseE = 400
  val BaseN = 100

  /** Deterministic tile content for a cell: 8x8-pixel blocks, each block
    * vegetation (green-dominant, GLI>0) or urban (pure grey, GLI=0) by a
    * seeded hash. Per-pixel jitter is channel-correlated for urban pixels
    * so grey stays exactly neutral. */
  def tileRaster(e: Int, n: Int, ts: Int, seed: Long): Raster = {
    val data = new Array[Byte](ts * ts * 3)
    val cellSeed = mix2(seed, (e.toLong << 32) | n.toLong)
    val block = 8
    var row = 0
    while (row < ts) {
      var col = 0
      while (col < ts) {
        val bx = col / block; val by = row / block
        val veg = java.lang.Long.remainderUnsigned(mix2(cellSeed, (bx.toLong << 20) | by.toLong), 3L) == 0L
        val pj = mix2(cellSeed, (row.toLong << 20) | col.toLong)
        val off = (row * ts + col) * 3
        if (veg) {
          val j1 = (pj & 15).toInt; val j2 = ((pj >>> 8) & 15).toInt; val j3 = ((pj >>> 16) & 15).toInt
          data(off) = (40 + j1).toByte      // B
          data(off + 1) = (160 + j2).toByte // G
          data(off + 2) = (60 + j3).toByte  // R
        } else {
          val j = (pj & 31).toInt
          val grey = (110 + j).toByte
          data(off) = grey; data(off + 1) = grey; data(off + 2) = grey
        }
        col += 1
      }
      row += 1
    }
    Raster(data, ts, ts, 3)
  }

  /** 64-bit average-hash of the grayscale 8x8 downsample. */
  def aHash(r: Raster): Long = {
    val small = Resize.area(r, 8, 8)
    val grey = new Array[Int](64)
    var sum = 0L
    var i = 0
    while (i < 64) {
      grey(i) = ColorSpace.bgr2gray(small.data(i * 3) & 0xff, small.data(i * 3 + 1) & 0xff, small.data(i * 3 + 2) & 0xff)
      sum += grey(i)
      i += 1
    }
    val mean = sum / 64
    var h = 0L
    i = 0
    while (i < 64) { if (grey(i) > mean) h |= (1L << i); i += 1 }
    h
  }

  /** CIR companion tile: Ir,R,G stored in the R,G,B slots (so cv2-order
    * decode yields (G, R, Ir), reference image_loaders.py:376-379).
    * Generated at half resolution to exercise the bicubic Ir upscale. */
  def tileRasterCir(e: Int, n: Int, ts: Int, seed: Long): Raster = {
    val half = math.max(ts / 2, 8)
    val data = new Array[Byte](half * half * 3)
    val cellSeed = mix2(seed ^ 0xc19, (e.toLong << 32) | n.toLong)
    val groundSeed = mix2(seed, (e.toLong << 32) | n.toLong)
    val block = math.max(8 * half / ts, 1)
    var row = 0
    while (row < half) {
      var colI = 0
      while (colI < half) {
        // same ground-truth vegetation pattern as the RGB tile (aligned blocks)
        val bx = (colI * ts / half) / 8; val by = (row * ts / half) / 8
        val veg = java.lang.Long.remainderUnsigned(mix2(groundSeed, (bx.toLong << 20) | by.toLong), 3L) == 0L
        val pj = mix2(cellSeed, (row.toLong << 20) | colI.toLong)
        val off = (row * half + colI) * 3
        val ir = if (veg) 200 + (pj & 15).toInt else 60 + ((pj >>> 8) & 15).toInt
        val rTrue = if (veg) 60 + ((pj >>> 16) & 15).toInt else 115 + (pj & 15).toInt
        val gTrue = if (veg) 160 + ((pj >>> 24) & 15).toInt else 115 + (pj & 15).toInt
        // stored RGB = (Ir, R, G) -> decoded BGR = (G, R, Ir)
        data(off) = gTrue.toByte      // B slot <- G
        data(off + 1) = rTrue.toByte  // G slot <- R
        data(off + 2) = ir.toByte     // R slot <- Ir
        colI += 1
      }
      row += 1
    }
    val _ = block
    Raster(data, half, half, 3)
  }

  /** Flat-block variant of [[tileRaster]] (no per-pixel jitter): smooth
    * like real aerial imagery, so a lossy jpg encoding meets the
    * input_hint's PSNR>=40dB per-row invariant (the jittered pattern is
    * a DCT worst case no codec setting can hit). Same block-level
    * vegetation ground truth. */
  def tileRasterSmooth(e: Int, n: Int, ts: Int, seed: Long): Raster = {
    val data = new Array[Byte](ts * ts * 3)
    val cellSeed = mix2(seed, (e.toLong << 32) | n.toLong)
    var row = 0
    while (row < ts) {
      var col = 0
      while (col < ts) {
        val bx = col / 8; val by = row / 8
        val veg = java.lang.Long.remainderUnsigned(mix2(cellSeed, (bx.toLong << 20) | by.toLong), 3L) == 0L
        val off = (row * ts + col) * 3
        if (veg) { data(off) = 40; data(off + 1) = 160.toByte; data(off + 2) = 60 }
        else { data(off) = 120; data(off + 1) = 120; data(off + 2) = 120 }
        col += 1
      }
      row += 1
    }
    Raster(data, ts, ts, 3)
  }

  /** Mid-frequency textured variant: the smooth block colors plus a
    * deterministic per-4x4-block jitter — the spatial statistics of real
    * aerial photography (structure + texture), unlike the flat blocks
    * (trivial for a DCT codec) or the per-pixel noise of [[tileRaster]]
    * (a DCT worst case). jpg-encodes to ~10-30 KB and costs a realistic
    * IDCT decode. */
  def tileRasterTextured(e: Int, n: Int, ts: Int, seed: Long): Raster = {
    val base = tileRasterSmooth(e, n, ts, seed)
    val cellSeed = mix2(seed ^ 0x7e7, (e.toLong << 32) | n.toLong)
    val data = base.data
    var row = 0
    while (row < ts) {
      var col = 0
      while (col < ts) {
        val h = mix2(cellSeed, ((row / 4).toLong << 20) | (col / 4).toLong)
        val off = (row * ts + col) * 3
        var ch = 0
        while (ch < 3) {
          val j = (((h >>> (ch * 8)) & 31) - 16).toInt // [-16, 15]
          val v = (data(off + ch) & 0xff) + j
          data(off + ch) = math.max(0, math.min(255, v)).toByte
          ch += 1
        }
        col += 1
      }
      row += 1
    }
    base
  }

  /** JPG tile row (the reference's OSGB tile format is .jpg,
    * image_loaders.py:229-233) at quality 0.92; smooth content by
    * default (meets the encode-round-trip PSNR>=40dB bound, proven in
    * PipelineSpec — the textured variant is available for I/O-heavy
    * experiments via `textured = true`). */
  def makeTileJpg(e: Int, n: Int, ts: Int, seed: Long, textured: Boolean = false): TileRow = {
    val raster =
      if (textured) tileRasterTextured(e, n, ts, seed) else tileRasterSmooth(e, n, ts, seed)
    val code = TileCode.fromEastingsNorthings(e, n)
    TileRow(code, graft.img.Quality.encodeJPEG(raster, 0.92f), ts, ts, "jpg",
      s"synthetic aerial jpg tile $code size=${ts}px", aHash(raster))
  }

  /** Deterministic jpg tile table (bench tables use this: the format the
    * reference actually reads, at ~1/8 the bytes of the png variant). */
  def tilesJpg(spark: SparkSession, gridW: Int, gridH: Int, ts: Int, seed: Long = 42L,
               baseE: Int = BaseE, baseN: Int = BaseN): DataFrame = {
    import spark.implicits._
    spark.range(gridW.toLong * gridH).map { i =>
      val e = baseE + (i % gridW).toInt
      val n = baseN + (i / gridW).toInt
      makeTileJpg(e, n, ts, seed)
    }.toDF()
  }

  def makeTileCir(e: Int, n: Int, ts: Int, seed: Long): TileRow = {
    val raster = tileRasterCir(e, n, ts, seed)
    val code = TileCode.fromEastingsNorthings(e, n)
    TileRow(code, Codec.encodePNG(raster), raster.w, raster.h, "png",
      s"synthetic CIR tile $code size=${raster.w}px", aHash(raster))
  }

  def tilesCir(spark: SparkSession, gridW: Int, gridH: Int, ts: Int, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.range(gridW.toLong * gridH).map { i =>
      val e = BaseE + (i % gridW).toInt
      val n = BaseN + (i / gridW).toInt
      makeTileCir(e, n, ts, seed)
    }.toDF()
  }

  /** Flat-block CIR variant (no per-pixel jitter) — like [[tileRasterSmooth]]
    * for the RGB side: real CIR imagery compresses like RGB, while the
    * jittered pattern is a DCT worst case that balloons jpg bytes ~12x and
    * turns the fused-join bench into a decode-the-noise benchmark. Same
    * block vegetation ground truth and (Ir, R, G) channel layout. */
  def tileRasterCirSmooth(e: Int, n: Int, ts: Int, seed: Long): Raster = {
    val half = math.max(ts / 2, 8)
    val data = new Array[Byte](half * half * 3)
    val groundSeed = mix2(seed, (e.toLong << 32) | n.toLong)
    var row = 0
    while (row < half) {
      var colI = 0
      while (colI < half) {
        val bx = (colI * ts / half) / 8; val by = (row * ts / half) / 8
        val veg = java.lang.Long.remainderUnsigned(mix2(groundSeed, (bx.toLong << 20) | by.toLong), 3L) == 0L
        val off = (row * half + colI) * 3
        data(off) = (if (veg) 160 else 115).toByte     // B slot <- G
        data(off + 1) = (if (veg) 60 else 115).toByte  // G slot <- R
        data(off + 2) = (if (veg) 200 else 60).toByte  // R slot <- Ir
        colI += 1
      }
      row += 1
    }
    Raster(data, half, half, 3)
  }

  /** Jpg-encoded CIR tile table (bench variant of [[tilesCir]], same
    * half-resolution Ir plane; smooth content + jpg keep the table small
    * so the fused-join bench measures decode+join+classify, not noise). */
  def tilesCirJpg(spark: SparkSession, gridW: Int, gridH: Int, ts: Int, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.range(gridW.toLong * gridH).map { i =>
      val e = BaseE + (i % gridW).toInt
      val n = BaseN + (i / gridW).toInt
      val raster = tileRasterCirSmooth(e, n, ts, seed)
      val code = TileCode.fromEastingsNorthings(e, n)
      TileRow(code, graft.img.Quality.encodeJPEG(raster, 0.92f), raster.w, raster.h, "jpg",
        s"synthetic CIR jpg tile $code size=${raster.w}px", aHash(raster))
    }.toDF()
  }

  def makeTile(e: Int, n: Int, ts: Int, seed: Long): TileRow = {
    val raster = tileRaster(e, n, ts, seed)
    val code = TileCode.fromEastingsNorthings(e, n)
    val png = Codec.encodePNG(raster)
    var vegBlocks = 0
    val cellSeed = mix2(seed, (e.toLong << 32) | n.toLong)
    val blocksPerSide = ts / 8
    for (bx <- 0 until blocksPerSide; by <- 0 until blocksPerSide)
      if (java.lang.Long.remainderUnsigned(mix2(cellSeed, (bx.toLong << 20) | by.toLong), 3L) == 0L) vegBlocks += 1
    val caption = s"synthetic aerial tile $code size=${ts}px veg_blocks=$vegBlocks/${blocksPerSide * blocksPerSide}"
    TileRow(code, png, ts, ts, "png", caption, aHash(raster))
  }

  /** Distributed deterministic tile table over a gridW x gridH cell extent. */
  def tiles(spark: SparkSession, gridW: Int, gridH: Int, ts: Int, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.range(gridW.toLong * gridH).map { i =>
      val e = BaseE + (i % gridW).toInt
      val n = BaseN + (i / gridW).toInt
      makeTile(e, n, ts, seed)
    }.toDF()
  }

  /** Deterministic garden polygons over the same extent, in EPSG:27700
    * metre coordinates. Mix of simple rings, holed polygons, boundary
    * straddlers and degenerate slivers (FIXTURES.md §1 variants). */
  def makeGarden(gid: Long, gridW: Int, gridH: Int, seed: Long,
                 baseE: Int = BaseE, baseN: Int = BaseN): GardenRow = {
    val h = mix2(seed ^ 0x9a7d, gid)
    // keep centres away from the extent border so covering cells stay inside
    val cxKm = baseE + 0.08 + u01(mix2(h, 1)) * (gridW - 0.16)
    val cyKm = baseN + 0.08 + u01(mix2(h, 2)) * (gridH - 0.16)
    val kind = java.lang.Long.remainderUnsigned(mix2(h, 3), 100L)

    val ring: Seq[Seq[Double]] =
      if (kind < 2) {
        // degenerate zero-area sliver (collinear) — 0-pixel guard path
        val x = cxKm * 1000.0; val y = cyKm * 1000.0
        Seq(Seq(x, y), Seq(x + 30.0, y + 30.0), Seq(x + 15.0, y + 15.0), Seq(x, y))
      } else {
        val radius = 0.03 + u01(mix2(h, 4)) * 0.12 // km
        val nVerts = 4 + java.lang.Long.remainderUnsigned(mix2(h, 5), 5L).toInt
        val pts = (0 until nVerts).map { k =>
          val ang = 2.0 * math.Pi * k / nVerts + u01(mix2(h, 10 + k)) * 0.5
          val rr = radius * (0.6 + 0.8 * u01(mix2(h, 30 + k)))
          Seq((cxKm + rr * math.cos(ang)) * 1000.0, (cyKm + rr * math.sin(ang)) * 1000.0)
        }
        pts :+ pts.head
      }

    val rings: Seq[Seq[Seq[Double]]] =
      if (kind >= 2 && kind < 7) {
        // add a square hole at the centre
        val hs = 0.012 * 1000.0
        val x = cxKm * 1000.0; val y = cyKm * 1000.0
        Seq(ring, Seq(Seq(x - hs, y - hs), Seq(x + hs, y - hs), Seq(x + hs, y + hs), Seq(x - hs, y + hs), Seq(x - hs, y - hs)))
      } else Seq(ring)

    val uprn: Array[String] =
      if (kind % 3 == 0) Array(s"1${gid}00", s"1${gid}01")
      else Array(s"1${gid}00")

    GardenRow(s"osgb1000$gid", uprn, Seq(rings), "urn:ogc:def:crs:EPSG::27700")
  }

  def gardens(spark: SparkSession, count: Long, gridW: Int, gridH: Int, seed: Long = 42L,
              baseE: Int = BaseE, baseN: Int = BaseN): DataFrame = {
    import spark.implicits._
    spark.range(count).map(gid => makeGarden(gid, gridW, gridH, seed, baseE, baseN)).toDF()
  }

  /** Deterministic text-ish documents are provided by the driver testdata;
    * this generator only covers the image-side tables. */
}
