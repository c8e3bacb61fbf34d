package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S1: GeoJSON FeatureCollection scan -> the engine's normalized garden
  * frame (id, uprn: array<string>, geometry: 4-level multipolygon coords,
  * crs). Handles the reference's duck-typed variants
  * (analyse_polygons.py:175-201, calculate_indices.py:114-121):
  *   - properties.id falling back to properties.toid,
  *   - uprn as scalar, list, "{a,b}"-packed string, or null,
  *   - Polygon vs MultiPolygon geometry (Polygon is wrapped),
  *   - file-level crs defaulting to CRS84.
  */
object GeoJson {

  def readGardens(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("multiLine", "true").json(path)
    val crsName: String =
      if (hasField(raw.schema, "crs"))
        Option(raw.select(col("crs.properties.name")).first().getString(0))
          .getOrElse(Exprs.CRS84)
      else Exprs.CRS84

    val feats = raw.select(explode(col("features")).as("f"))
    val fSchema = feats.schema("f").dataType.asInstanceOf[StructType]
    val props = fSchema("properties").dataType.asInstanceOf[StructType]
    val geom = fSchema("geometry").dataType.asInstanceOf[StructType]

    val idCol: Column = (props.fieldNames.contains("id"), props.fieldNames.contains("toid")) match {
      case (true, true) => coalesce(col("f.properties.id"), col("f.properties.toid"))
      case (true, false) => col("f.properties.id")
      case (false, true) => col("f.properties.toid")
      case _ => throw new IllegalArgumentException("features need properties.id or properties.toid")
    }

    val uprnCol: Column =
      if (!props.fieldNames.contains("uprn")) array().cast("array<string>")
      else props("uprn").dataType match {
        case _: ArrayType =>
          coalesce(col("f.properties.uprn").cast("array<string>"), array().cast("array<string>"))
        case _ => // scalar or "{a,b}"-packed string (analyse_polygons.py:175-186)
          when(col("f.properties.uprn").isNull, array().cast("array<string>"))
            .otherwise(split(regexp_replace(col("f.properties.uprn").cast("string"), "[{}]", ""), ","))
      }

    val coordsType = geom("coordinates").dataType
    val geomCol: Column = depthOf(coordsType) match {
      case 4 => col("f.geometry.coordinates")
      case 3 => array(col("f.geometry.coordinates")) // Polygon -> MultiPolygon
      case d => throw new IllegalArgumentException(s"unsupported coordinates nesting depth $d")
    }

    feats.select(
      idCol.cast("string").as("id"),
      uprnCol.as("uprn"),
      geomCol.cast("array<array<array<array<double>>>>").as("geometry"),
      lit(crsName).as("crs"))
  }

  private def depthOf(dt: DataType, acc: Int = 0): Int = dt match {
    case ArrayType(inner, _) => depthOf(inner, acc + 1)
    case _ => acc
  }

  private def hasField(s: StructType, name: String): Boolean = s.fieldNames.contains(name)
}

/** S7-S10 sinks with byte-for-byte reference formatting
  * (analyse_polygons.py:122-186). The exact-parity writers stream ordered
  * rows on the driver (the reference's outputs are single files by
  * definition); `writeDistributed` offers the scale path via df.write. */
object Reports {

  /** Rows must already carry id, cx, cy, area_m2, sort_key, gid and
    * frac_<name> columns (VegPipeline.run output). */
  def writeAll(perGarden: DataFrame, kernelNames: Seq[String], loaderName: String,
               baseOutputFileName: String, crsName: String,
               warnings: Seq[String] = Nil): Unit = {
    val prefix = baseOutputFileName + loaderName + kernelNames.map("-" + _).mkString

    if (warnings.nonEmpty) {
      val w = new java.io.PrintWriter(prefix + "-warnings.txt", "UTF-8")
      try warnings.foreach(w.println) finally w.close()
    }

    val ordered = perGarden.orderBy(col("sort_key"), col("gid"))
    val rows = ordered.select(
      Seq(col("id"), col("cx"), col("cy"), col("area_m2"), col("uprn")) ++
        kernelNames.map(n => col(s"frac_$n")): _*).collect()

    // summary (analyse_polygons.py:135-155)
    var totalArea = 0.0
    val totalVeg = new Array[Double](kernelNames.length)
    rows.foreach { r =>
      val area = r.getDouble(3)
      totalArea += area
      kernelNames.indices.foreach(i => totalVeg(i) += area * r.getDouble(5 + i))
    }
    val summary = new java.io.PrintWriter(prefix + "-summary.txt", "UTF-8")
    try {
      summary.println(s"Total surface area: ${PyFormat.commaFixed2(totalArea)}m²")
      kernelNames.zipWithIndex.foreach { case (name, i) =>
        val pct = 100.0 * totalVeg(i) / totalArea
        summary.println(s"Total vegetation surface area from $name:" +
          s" ${PyFormat.commaFixed2(totalVeg(i))}m² (${PyFormat.fixed1(pct)}%)")
      }
      summary.println(s"Garden centroid output with co-ordinate reference system [$crsName]")
    } finally summary.close()

    // vegetation.csv + toid2uprn.csv (analyse_polygons.py:157-186)
    val veg = new java.io.PrintWriter(prefix + "-vegetation.csv", "UTF-8")
    val t2u = new java.io.PrintWriter(prefix + "-toid2uprn.csv", "UTF-8")
    try {
      veg.print("feature id, garden centroid x, garden centroid y, surface area m²")
      kernelNames.foreach(n => veg.print(s", fraction classed as vegetation by $n"))
      veg.println()
      t2u.println("feature id, feature uprn")
      rows.foreach { r =>
        val id = r.getString(0)
        veg.print(s"$id, ${PyFormat.repr(r.getDouble(1))}, ${PyFormat.repr(r.getDouble(2))}, ${PyFormat.repr(r.getDouble(3))}")
        kernelNames.indices.foreach(i => veg.print(s", ${PyFormat.repr(r.getDouble(5 + i))}"))
        veg.println()
        r.getSeq[String](4).foreach(u => t2u.println(s"$id, $u"))
      }
    } finally { veg.close(); t2u.close() }
  }

  /** Scale path: the same tables as parquet/csv partitioned output. */
  def writeDistributed(perGarden: DataFrame, outDir: String): Unit =
    perGarden.drop("blob", "cells").write.mode("overwrite")
      .option("header", "true").csv(outDir)
}
