package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Raster file formats (SURVEY.md §2.1). The engine's native exchange
 * format mirrors the reference's WhiteboxRaster .dep/.tas pair
 * (WhiteboxAPI/src/whitebox/geospatialfiles/WhiteboxRasterBase.java:
 * 763-890 header grammar, little-endian .tas data), plus the ESRI
 * ArcASCII grid (ImportExport/src/plugins/ImportArcAsciiGrid.java)
 * and delimiter-autodetected XYZ text points
 * (RasterCreation/src/plugins/InterpolationIDW.java:421-438).
 *
 * Raster files are small relative to the page table (SURVEY.md §1.1
 * mapping note), so decode runs through Spark's binaryFile source +
 * a flatMap per file; the relational output (r, c, v) drops NoData
 * cells (the engine's NULL = absent row convention).
 */
object RasterIO {

  /** .dep header — the subset every tool round-trips. */
  case class DepHeader(rows: Int, cols: Int, north: Double,
      south: Double, east: Double, west: Double, dataType: String,
      noData: Double, byteOrder: String)

  /** Parse the loose `key:\tvalue` header grammar
    * (WhiteboxRasterBase.readHeaderFile:763-890 — substring match,
    * case-insensitive, little-endian default). */
  def readDep(path: String): DepHeader = {
    val kv = Files.readAllLines(Paths.get(path)).toArray.map(_.toString)
      .flatMap { line =>
        val i = line.indexOf(':')
        if (i < 0) None
        else Some(line.take(i).trim.toLowerCase -> line.drop(i + 1).trim)
      }.toMap
    DepHeader(
      rows = kv("rows").toInt,
      cols = kv("cols").toInt,
      north = kv("north").toDouble,
      south = kv("south").toDouble,
      east = kv("east").toDouble,
      west = kv("west").toDouble,
      dataType = kv.getOrElse("data type", "float").toLowerCase,
      noData = kv.getOrElse("nodata", "-32768").toDouble,
      byteOrder = kv.getOrElse("byte order",
        "LITTLE_ENDIAN").toUpperCase)
  }

  private def cellBytes(dt: String): Int = dt match {
    case "double" => 8
    case "float" => 4
    case "integer" => 2
    case "byte" => 1
    case other => sys.error(s"unknown data type $other")
  }

  /** Read a .dep/.tas raster into (r, c, v), NoData rows dropped. */
  def readWhiteboxRaster(spark: SparkSession,
                         depPath: String): DataFrame = {
    val h = readDep(depPath)
    val tasPath = depPath.stripSuffix(".dep") + ".tas"
    val bytes = cellBytes(h.dataType)
    val noData = h.noData
    val cols = h.cols
    val dt = h.dataType
    val isBig = h.byteOrder.contains("BIG")
    val bin = spark.read.format("binaryFile").load(tasPath)
      .select(col("content"))
    import spark.implicits._
    bin.as[Array[Byte]].flatMap { content =>
      val buf = ByteBuffer.wrap(content).order(
        if (isBig) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
      val n = content.length / bytes
      (0 until n).iterator.map { i =>
        val v = dt match {
          case "double" => buf.getDouble(i * 8)
          case "float" => buf.getFloat(i * 4).toDouble
          case "integer" => buf.getShort(i * 2).toDouble
          case "byte" => (content(i) & 0xff).toDouble
        }
        ((i / cols).toLong, (i % cols).toLong, v)
      }.filter(_._3 != noData)
    }.toDF("r", "c", "v")
  }

  /** Write (r, c, v) as .dep/.tas (FLOAT storage, row-major,
    * little-endian; absent cells -> NoData sentinel), driver-side —
    * rasters are small; the cluster path writes one .tas per tile. */
  def writeWhiteboxRaster(df: DataFrame, h: DepHeader,
                          depPath: String): Unit = {
    val cells = df.select("r", "c", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val buf = ByteBuffer.allocate(h.rows * h.cols * 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    for (r <- 0 until h.rows; c <- 0 until h.cols)
      buf.putFloat(cells.getOrElse((r.toLong, c.toLong),
        h.noData).toFloat)
    Files.write(Paths.get(depPath.stripSuffix(".dep") + ".tas"),
      buf.array())
    val dep = Seq(
      s"Min:\t0.0", s"Max:\t0.0",
      s"North:\t${h.north}", s"South:\t${h.south}",
      s"East:\t${h.east}", s"West:\t${h.west}",
      s"Cols:\t${h.cols}", s"Rows:\t${h.rows}",
      s"Data Type:\tfloat", s"Z Units:\tnot specified",
      s"XY Units:\tnot specified", s"Projection:\tnot specified",
      s"Data Scale:\tcontinuous", s"Preferred Palette:\tspectrum.pal",
      s"NoData:\t${h.noData}", s"Byte Order:\tLITTLE_ENDIAN")
    Files.write(Paths.get(depPath), dep.mkString("\n").getBytes(UTF_8))
  }

  /** Read an ESRI ArcASCII grid into (r, c, v), NoData dropped. */
  def readArcAscii(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val bin = spark.read.format("binaryFile").load(path)
      .select(col("content")).as[Array[Byte]]
    bin.flatMap { content =>
      val lines = new String(content, UTF_8).split("\n")
        .map(_.trim).filter(_.nonEmpty)
      val (hdr, data) = lines.span(l => l.headOption.exists(ch =>
        ch.isLetter || ch == '_'))
      val kv = hdr.map { l =>
        val parts = l.split("\\s+", 2)
        parts(0).toLowerCase -> parts(1).trim
      }.toMap
      val ncols = kv("ncols").toInt
      val noData = kv.getOrElse("nodata_value", "-9999").toDouble
      data.iterator.zipWithIndex.flatMap { case (line, r) =>
        line.split("\\s+").iterator.zipWithIndex.collect {
          case (tok, c) if tok.toDouble != noData =>
            (r.toLong, c.toLong, tok.toDouble)
        }
      }
    }.toDF("r", "c", "v")
  }

  /** Write (r, c, v) as ArcASCII (driver-side, dense). */
  def writeArcAscii(df: DataFrame, rows: Int, cols: Int,
                    xll: Double, yll: Double, cellSize: Double,
                    noData: Double, path: String): Unit = {
    val cells = df.select("r", "c", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val sb = new StringBuilder
    sb ++= s"ncols $cols\nnrows $rows\nxllcorner $xll\nyllcorner $yll\n"
    sb ++= s"cellsize $cellSize\nNODATA_value $noData\n"
    for (r <- 0 until rows) {
      sb ++= (0 until cols).map(c =>
        cells.getOrElse((r.toLong, c.toLong), noData)).mkString(" ")
      sb += '\n'
    }
    Files.write(Paths.get(path), sb.toString.getBytes(UTF_8))
  }

  /** Delimiter auto-detection per InterpolationIDW.java:421-438:
    * try tab, then space(s), then comma on the first data line. */
  def detectDelimiter(firstLine: String): String =
    if (firstLine.contains('\t')) "\t"
    else if (firstLine.trim.contains(' ')) " "
    else ","

  /** Read XYZ text points -> (x, y, z). */
  def readXyz(spark: SparkSession, path: String): DataFrame = {
    val first = scala.io.Source.fromFile(path).getLines()
      .find(_.trim.nonEmpty).getOrElse("")
    val sep = detectDelimiter(first)
    spark.read
      .option("sep", sep)
      .option("inferSchema", "false")
      .schema("x DOUBLE, y DOUBLE, z DOUBLE")
      .csv(path)
  }
}
