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
    * tile. (generate_coverage.py:67-110, 36-64, 288-388) */
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
      }.collect()

    val w = 7 * 100 * tsz
    val h = 13 * 100 * tsz
    val raster = Raster(new Array[Byte](w * h * 3), w, h, 3)
    var nProcessed = 0L
    var nPixels = 0L
    val corrupted = scala.collection.mutable.ArrayBuffer.empty[String]
    val oddNames = scala.collection.mutable.ArrayBuffer.empty[String]
    processed.foreach { case (code, thumb, px, validName) =>
      if (!validName) oddNames += code
      else {
        nProcessed += 1
        if (thumb == null) corrupted += code
        else {
          nPixels += px
          val (e, n) = TileCode.toEastingsNorthings(code)
          val x = e * tsz
          val y = h - n * tsz - tsz
          var r = 0
          while (r < tsz) {
            System.arraycopy(thumb, r * tsz * 3, raster.data, ((y + r) * w + x) * 3, tsz * 3)
            r += 1
          }
        }
      }
    }
    Result(raster, Seq(
      s"Number of pixels processed: $nPixels",
      s"Corrupted tiles: ${corrupted.mkString("[", ", ", "]")}",
      s"Number of 1km tiles processed: $nProcessed",
      s"Skipped files due to odd file names: ${oddNames.mkString("[", ", ", "]")}"))
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
}
