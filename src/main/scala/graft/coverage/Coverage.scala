package graft.coverage

import java.time.LocalDate
import java.time.format.DateTimeFormatter
import java.time.temporal.{IsoFields, WeekFields}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.geo.TileCode
import graft.img.{Codec, Raster, Resize}

/** The generate_coverage job re-expressed Spark-first
  * (reference: green_spaces/generate_coverage.py).
  *
  * Distributed part: per-tile processing (thumbnail resize / coverage /
  * flight-date extraction) + aggregates. Driver part: assembly of the
  * bounded 13x7 100km-square UK raster (<= 10400 x 5600 px at the
  * reference's tile_size=8 — small by construction,
  * generate_coverage.py:305-308).
  */
object Coverage {

  /** Flight-date float: isoYear + (isoWeek*7 + isoWeekday)/366
    * (generate_coverage.py:166-167). */
  def dateFloat(d: LocalDate): Double = {
    val isoYear = d.get(IsoFields.WEEK_BASED_YEAR)
    val isoWeek = d.get(IsoFields.WEEK_OF_WEEK_BASED_YEAR)
    val isoDow = d.get(WeekFields.ISO.dayOfWeek())
    isoYear + (isoWeek * 7 + isoDow) / 366.0
  }

  private val fmt1 = DateTimeFormatter.ofPattern("yyyy-MM-dd")
  private val fmt2 = DateTimeFormatter.ofPattern("dd/MM/yyyy")
  private val dateFlownRe = "<osgb:dateFlown>\\s*([^<]*?)\\s*</osgb:dateFlown>".r

  /** Parse a sidecar XML payload for osgb:dateFlown (two date formats,
    * first element if repeated; generate_coverage.py:141-168).
    * Returns None for corrupt XML / unparseable dates. */
  def parseDateFlown(xml: String): Option[LocalDate] =
    dateFlownRe.findFirstMatchIn(xml).map(_.group(1)).flatMap { text =>
      try Some(LocalDate.parse(text, fmt1))
      catch {
        case _: Exception =>
          try Some(LocalDate.parse(text, fmt2)) catch { case _: Exception => None }
      }
    }

  final case class Result(raster: Raster, status: Seq[String])

  /** Thumbnail mode: per-tile INTER_AREA resize to tsz², assembled on the
    * UK grid with vertical flip. Coverage mode: white tile per present
    * tile. (generate_coverage.py:67-110, 36-64, 288-388)
    *
    * Scale shape: the decode + resize runs distributed ONCE (persisted
    * thumbs are tsz²*3 bytes/row); counters and the corrupt/odd-name code
    * lists aggregate distributedly, and only (code, thumb) rows reach the
    * driver — bounded by the OS grid (<= 1.04M tiles * 192 B at tsz=8),
    * like the reference's bounded output raster, NOT by the input table's
    * row count times its image bytes. */
  def thumbnailMap(spark: SparkSession, tiles: DataFrame, tsz: Int,
                   coverageOnly: Boolean = false): Result = {
    require(tsz <= 16, "summary raster is bounded by design; tsz>16 would not be")
    import spark.implicits._

    val processed = tiles.select("image_id", "bytes").as[(String, Array[Byte])]
      .map { case (code, bytes) =>
        val en = TileCode.toEastingsNorthings(code)
        if (code.length != 6 || en == null) (code, null: Array[Byte], 0L, false)
        else if (coverageOnly) (code, Array.fill[Byte](tsz * tsz * 3)(255.toByte), 0L, true)
        else {
          try {
            val r = Codec.decodeBGR(bytes)
            val thumb = Resize.area(r, tsz, tsz)
            (code, thumb.data, r.w.toLong * r.h, true)
          } catch {
            case _: Exception => (code, null: Array[Byte], 0L, true) // corrupted
          }
        }
      }.toDF("code", "thumb", "px", "valid")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    try {
      val stats = processed.agg(
        sum(when(col("valid") && col("thumb").isNotNull, col("px"))).as("npixels"),
        count(when(col("valid"), lit(1))).as("nprocessed")).head()
      val nPixels = Option(stats.get(0)).map(_.asInstanceOf[Long]).getOrElse(0L)
      val nProcessed = stats.getLong(1)
      val corrupted = processed.where(col("valid") && col("thumb").isNull)
        .select("code").orderBy("code").collect().map(_.getString(0))
      val oddNames = processed.where(!col("valid"))
        .select("code").orderBy("code").collect().map(_.getString(0))

      val w = 7 * 100 * tsz
      val h = 13 * 100 * tsz
      val raster = Raster(new Array[Byte](w * h * 3), w, h, 3)
      processed.where(col("valid") && col("thumb").isNotNull)
        .select("code", "thumb").collect()
        .foreach { row =>
          val code = row.getString(0)
          val thumb = row.getAs[Array[Byte]](1)
          val (e, n) = TileCode.toEastingsNorthings(code)
          val x = e * tsz
          val y = h - n * tsz - tsz
          var r = 0
          while (r < tsz) {
            System.arraycopy(thumb, r * tsz * 3, raster.data, ((y + r) * w + x) * 3, tsz * 3)
            r += 1
          }
        }
      Result(raster, Seq(
        s"Number of pixels processed: $nPixels",
        s"Corrupted tiles: ${corrupted.mkString("[", ", ", "]")}",
        s"Number of 1km tiles processed: $nProcessed",
        s"Skipped files due to odd file names: ${oddNames.mkString("[", ", ", "]")}"))
    } finally {
      processed.unpersist()
      ()
    }
  }

  /** Flights mode over a sidecar-XML table (tile_code, xml):
    * distributed parse + min/max aggregates, per-tile date plane assembled
    * on the driver (generate_coverage.py:113-179,269-285). Returns the
    * per-tile frame plus global stats. */
  def flights(spark: SparkSession, xmlTable: DataFrame): DataFrame = {
    import spark.implicits._
    val parsed = xmlTable.select("tile_code", "xml").as[(String, String)]
      .map { case (code, xml) =>
        val d = parseDateFlown(xml)
        (code,
          d.map(_.toString).orNull,
          d.map(dateFloat).getOrElse(Double.NaN),
          d.isEmpty)
      }.toDF("tile_code", "date_flown", "date_float", "corrupt")
    parsed
  }

  /** Global flight stats (A8): min/max date float + corrupt list. */
  def flightStats(parsed: DataFrame): DataFrame =
    parsed.agg(
      min(when(!col("corrupt"), col("date_float"))).as("min_date_float"),
      max(when(!col("corrupt"), col("date_float"))).as("max_date_float"),
      count(when(col("corrupt"), lit(1))).as("n_corrupt"),
      count(lit(1)).as("n_tiles"))

  final case class FlightsResult(captureDate: Raster, timeOfYear: Raster, status: Seq[String])

  /** S12 flights-mode summary rasters: the per-tile constant date-float
    * plane assembled onto the bounded UK grid
    * (generate_coverage.py:269-308) and normalized per
    * output_summary_data (:182-225) — captureDate as
    * (float-min)/(max-min) (all-zero when max==min, like the reference),
    * timeOfYear as frac(float); both rendered 8-bit grayscale with a
    * black no-data background (the reference's np.where(data==0, 0, ...)).
    * The reference additionally styles with a viridis colormap plus
    * cv2-font titles/keys — presentation varnish, not ported.
    * Only (tile_code, date_float) rows reach the driver; the rasters are
    * bounded by the grid, not the table. */
  def flightsRaster(parsed: DataFrame, tsz: Int = 8): FlightsResult = {
    require(tsz <= 16, "summary raster is bounded by design; tsz>16 would not be")
    val rows = parsed.where(!col("corrupt"))
      .select("tile_code", "date_float").collect()
      .flatMap { r =>
        Option(TileCode.toEastingsNorthings(r.getString(0))).map(en => (en, r.getDouble(1)))
      }
    val w = 7 * 100 * tsz
    val h = 13 * 100 * tsz
    val capture = Raster(new Array[Byte](w * h * 3), w, h, 3)
    val timeOfYear = Raster(new Array[Byte](w * h * 3), w, h, 3)
    if (rows.isEmpty) return FlightsResult(capture, timeOfYear, Seq("No valid flight dates"))

    val minF = rows.map(_._2).min
    val maxF = rows.map(_._2).max
    val toys = rows.map { case (_, f) => f - math.floor(f) }
    val minToY = toys.min
    val maxToY = toys.max
    def gray(v: Double): Byte = math.max(0L, math.min(255L, math.round(v * 255.0))).toByte

    rows.foreach { case ((e, n), f) =>
      val capByte = gray(if (maxF == minF) 0.0 else (f - minF) / (maxF - minF))
      val toyByte = gray(f - math.floor(f))
      val x = e * tsz
      val y = h - n * tsz - tsz
      var r = 0
      while (r < tsz) {
        var c = 0
        while (c < tsz * 3) {
          capture.data(((y + r) * w + x) * 3 + c) = capByte
          timeOfYear.data(((y + r) * w + x) * 3 + c) = toyByte
          c += 1
        }
        r += 1
      }
    }
    FlightsResult(capture, timeOfYear, Seq(
      s"Maximum date: $maxF",
      s"Minimum date: $minF",
      s"Maximum time of year: $maxToY",
      s"Minimum time of year: $minToY"))
  }
}
