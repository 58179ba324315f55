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

  // ---- ESRI ArcGrid float binary (.flt + .hdr) -----------------------
  // ImportExport/src/plugins/ImportArcGrid.java semantics: .hdr text
  // header, float32 row-major data, LSBFIRST default byte order.

  /** Read an ArcGrid .flt/.hdr pair into (r, c, v). */
  def readArcGridFloat(spark: SparkSession, fltPath: String): DataFrame = {
    import spark.implicits._
    val hdrPath = fltPath.stripSuffix(".flt") + ".hdr"
    val kv = Files.readAllLines(Paths.get(hdrPath)).toArray
      .map(_.toString.trim).filter(_.nonEmpty)
      .map { l => val p = l.split("\\s+", 2); p(0).toLowerCase -> p(1) }
      .toMap
    val cols = kv("ncols").toInt
    val noData = kv.getOrElse("nodata_value", "-9999").toDouble
    val isBig = kv.getOrElse("byteorder", "LSBFIRST").toUpperCase
      .startsWith("MSB")
    val bin = spark.read.format("binaryFile").load(fltPath)
      .select(col("content")).as[Array[Byte]]
    bin.flatMap { content =>
      val buf = ByteBuffer.wrap(content).order(
        if (isBig) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
      (0 until content.length / 4).iterator
        .map(i => ((i / cols).toLong, (i % cols).toLong,
          buf.getFloat(i * 4).toDouble))
        .filter(_._3 != noData)
    }.toDF("r", "c", "v")
  }

  /** Write (r, c, v) as ArcGrid .flt/.hdr (driver-side, dense). */
  def writeArcGridFloat(df: DataFrame, rows: Int, cols: Int,
                        xll: Double, yll: Double, cellSize: Double,
                        noData: Double, fltPath: String): Unit = {
    val cells = df.select("r", "c", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val buf = ByteBuffer.allocate(rows * cols * 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    for (r <- 0 until rows; c <- 0 until cols)
      buf.putFloat(cells.getOrElse((r.toLong, c.toLong), noData).toFloat)
    Files.write(Paths.get(fltPath), buf.array())
    Files.write(Paths.get(fltPath.stripSuffix(".flt") + ".hdr"),
      (s"ncols $cols\nnrows $rows\nxllcorner $xll\nyllcorner $yll\n" +
        s"cellsize $cellSize\nNODATA_value $noData\nbyteorder LSBFIRST\n")
        .getBytes(UTF_8))
  }

  // ---- SAGA .sgrd/.sdat ----------------------------------------------
  // ImportExport/src/plugins/ImportSagaGrid.java (621 LoC) semantics:
  // `KEY = VALUE` header in .sgrd, float32 cells in .sdat, rows stored
  // BOTTOM-UP unless TOPTOBOTTOM = TRUE. Engine convention stays
  // top-down (r = 0 is the north row), so the row index flips on read
  // and write when the file is bottom-up.

  def readSagaGrid(spark: SparkSession, sgrdPath: String): DataFrame = {
    import spark.implicits._
    val kv = Files.readAllLines(Paths.get(sgrdPath)).toArray
      .map(_.toString).flatMap { line =>
        val i = line.indexOf('=')
        if (i < 0) None
        else Some(line.take(i).trim.toUpperCase -> line.drop(i + 1).trim)
      }.toMap
    val rows = kv("CELLCOUNT_Y").toInt
    val cols = kv("CELLCOUNT_X").toInt
    val noData = kv.getOrElse("NODATA_VALUE", "-99999").toDouble
    val isBig = kv.getOrElse("BYTEORDER_BIG", "FALSE")
      .equalsIgnoreCase("TRUE")
    val topDown = kv.getOrElse("TOPTOBOTTOM", "FALSE")
      .equalsIgnoreCase("TRUE")
    val offset = kv.getOrElse("DATAFILE_OFFSET", "0").toInt
    val sdat = sgrdPath.stripSuffix(".sgrd") + ".sdat"
    val bin = spark.read.format("binaryFile").load(sdat)
      .select(col("content")).as[Array[Byte]]
    bin.flatMap { content =>
      val buf = ByteBuffer.wrap(content).order(
        if (isBig) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
      (0 until (content.length - offset) / 4).iterator.map { i =>
        val fileRow = i / cols
        val r = if (topDown) fileRow.toLong
          else (rows - 1 - fileRow).toLong
        (r, (i % cols).toLong,
          buf.getFloat(offset + i * 4).toDouble)
      }.filter(_._3 != noData)
    }.toDF("r", "c", "v")
  }

  /** Write (r, c, v) as SAGA .sgrd/.sdat (driver-side, dense,
    * bottom-up row order — SAGA's default). */
  def writeSagaGrid(df: DataFrame, rows: Int, cols: Int,
                    xmin: Double, ymin: Double, cellSize: Double,
                    noData: Double, sgrdPath: String): Unit = {
    val cells = df.select("r", "c", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val buf = ByteBuffer.allocate(rows * cols * 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    for (fileRow <- 0 until rows; c <- 0 until cols) {
      val r = rows - 1 - fileRow
      buf.putFloat(cells.getOrElse((r.toLong, c.toLong), noData).toFloat)
    }
    Files.write(Paths.get(sgrdPath.stripSuffix(".sgrd") + ".sdat"),
      buf.array())
    Files.write(Paths.get(sgrdPath),
      (s"NAME\t= graft\nDATAFILE_OFFSET\t= 0\nDATAFORMAT\t= FLOAT\n" +
        s"BYTEORDER_BIG\t= FALSE\nPOSITION_XMIN\t= $xmin\n" +
        s"POSITION_YMIN\t= $ymin\nCELLSIZE\t= $cellSize\n" +
        s"CELLCOUNT_X\t= $cols\nCELLCOUNT_Y\t= $rows\n" +
        s"NODATA_VALUE\t= $noData\nTOPTOBOTTOM\t= FALSE\n")
        .getBytes(UTF_8))
  }

  // ---- SRTM .hgt ----------------------------------------------------
  // ImportExport/src/plugins/ImportSRTM.java semantics: square grid of
  // BIG-endian int16, side = sqrt(n), voids = -32768.

  def readSrtmHgt(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val bin = spark.read.format("binaryFile").load(path)
      .select(col("content")).as[Array[Byte]]
    bin.flatMap { content =>
      val n = content.length / 2
      val side = math.sqrt(n.toDouble).toInt
      val buf = ByteBuffer.wrap(content).order(ByteOrder.BIG_ENDIAN)
      (0 until n).iterator
        .map(i => ((i / side).toLong, (i % side).toLong,
          buf.getShort(i * 2).toDouble))
        .filter(_._3 != -32768.0)
    }.toDF("r", "c", "v")
  }

  def writeSrtmHgt(df: DataFrame, side: Int, path: String): Unit = {
    val cells = df.select("r", "c", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val buf = ByteBuffer.allocate(side * side * 2)
      .order(ByteOrder.BIG_ENDIAN)
    for (r <- 0 until side; c <- 0 until side)
      buf.putShort(cells.getOrElse((r.toLong, c.toLong), -32768.0)
        .toShort)
    Files.write(Paths.get(path), buf.array())
  }

  // ---- Surfer ASCII .grd --------------------------------------------
  // ImportExport/src/plugins/ImportSurferAsciiGrid.java semantics:
  // DSAA magic, dims, x/y/z ranges, data rows BOTTOM-UP, blank value
  // 1.70141e38.

  val SurferBlank = 1.70141e38

  def readSurferAscii(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val bin = spark.read.format("binaryFile").load(path)
      .select(col("content")).as[Array[Byte]]
    bin.flatMap { content =>
      val toks = new String(content, UTF_8).split("\\s+")
        .filter(_.nonEmpty)
      require(toks(0) == "DSAA", "not a Surfer ASCII grid")
      val cols = toks(1).toInt
      val rows = toks(2).toInt
      val data = toks.drop(9).map(_.toDouble)
      // Surfer rows run south-to-north: flip to our north-down rows
      (0 until rows * cols).iterator.map { i =>
        val sr = i / cols
        ((rows - 1 - sr).toLong, (i % cols).toLong, data(i))
      }.filter(_._3 < SurferBlank)
    }.toDF("r", "c", "v")
  }

  def writeSurferAscii(df: DataFrame, rows: Int, cols: Int,
                       xmin: Double, xmax: Double, ymin: Double,
                       ymax: Double, path: String): Unit = {
    val cells = df.select("r", "c", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val vals = cells.values
    val (zmin, zmax) =
      if (vals.isEmpty) (0.0, 0.0) else (vals.min, vals.max)
    val sb = new StringBuilder(s"DSAA\n$cols $rows\n$xmin $xmax\n")
    sb ++= s"$ymin $ymax\n$zmin $zmax\n"
    for (sr <- 0 until rows) { // bottom-up
      val r = rows - 1 - sr
      sb ++= (0 until cols).map(c =>
        cells.getOrElse((r.toLong, c.toLong), SurferBlank))
        .mkString(" ")
      sb += '\n'
    }
    Files.write(Paths.get(path), sb.toString.getBytes(UTF_8))
  }

  // ---- GRASS ASCII --------------------------------------------------
  // ImportExport/src/plugins/ImportGRASSAsciiGrid.java semantics:
  // north/south/east/west/rows/cols header lines, then data rows.

  def readGrassAscii(spark: SparkSession, path: String,
                     noData: Double = -9999.0): DataFrame = {
    import spark.implicits._
    val bin = spark.read.format("binaryFile").load(path)
      .select(col("content")).as[Array[Byte]]
    bin.flatMap { content =>
      val lines = new String(content, UTF_8).split("\n")
        .map(_.trim).filter(_.nonEmpty)
      val (hdr, data) = lines.span(_.contains(":"))
      val kv = hdr.map { l =>
        val i = l.indexOf(':')
        l.take(i).trim.toLowerCase -> l.drop(i + 1).trim
      }.toMap
      val nd = kv.get("null").map(_.toDouble).getOrElse(noData)
      data.iterator.zipWithIndex.flatMap { case (line, r) =>
        line.split("\\s+").iterator.zipWithIndex.collect {
          case (tok, c) if tok.toDouble != nd =>
            (r.toLong, c.toLong, tok.toDouble)
        }
      }
    }.toDF("r", "c", "v")
  }

  def writeGrassAscii(df: DataFrame, rows: Int, cols: Int,
                      north: Double, south: Double, east: Double,
                      west: Double, noData: Double,
                      path: String): Unit = {
    val cells = df.select("r", "c", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val sb = new StringBuilder
    sb ++= s"north: $north\nsouth: $south\neast: $east\nwest: $west\n"
    sb ++= s"rows: $rows\ncols: $cols\nnull: $noData\n"
    for (r <- 0 until rows) {
      sb ++= (0 until cols).map(c =>
        cells.getOrElse((r.toLong, c.toLong), noData)).mkString(" ")
      sb += '\n'
    }
    Files.write(Paths.get(path), sb.toString.getBytes(UTF_8))
  }

  // ---- IDRISI .rst/.rdc ---------------------------------------------
  // ImportExport/src/plugins/ImportIDRISIRaster.java semantics:
  // .rdc "key : value" metadata, .rst little-endian binary
  // (real = float32, integer = int16).

  def readIdrisi(spark: SparkSession, rstPath: String): DataFrame = {
    import spark.implicits._
    val rdcPath = rstPath.stripSuffix(".rst") + ".rdc"
    val kv = Files.readAllLines(Paths.get(rdcPath)).toArray
      .map(_.toString).flatMap { l =>
        val i = l.indexOf(':')
        if (i < 0) None
        else Some(l.take(i).trim.toLowerCase -> l.drop(i + 1).trim)
      }.toMap
    val cols = kv("columns").toInt
    val isReal = kv("data type").toLowerCase.startsWith("real")
    val noData = kv.get("flag value").map(_.toDouble)
      .getOrElse(Double.NaN)
    val bin = spark.read.format("binaryFile").load(rstPath)
      .select(col("content")).as[Array[Byte]]
    bin.flatMap { content =>
      val buf = ByteBuffer.wrap(content).order(ByteOrder.LITTLE_ENDIAN)
      val w = if (isReal) 4 else 2
      (0 until content.length / w).iterator
        .map { i =>
          val v = if (isReal) buf.getFloat(i * 4).toDouble
            else buf.getShort(i * 2).toDouble
          ((i / cols).toLong, (i % cols).toLong, v)
        }
        .filter(t => noData.isNaN || t._3 != noData)
    }.toDF("r", "c", "v")
  }

  def writeIdrisi(df: DataFrame, rows: Int, cols: Int, noData: Double,
                  rstPath: String): Unit = {
    val cells = df.select("r", "c", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val buf = ByteBuffer.allocate(rows * cols * 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    for (r <- 0 until rows; c <- 0 until cols)
      buf.putFloat(cells.getOrElse((r.toLong, c.toLong), noData).toFloat)
    Files.write(Paths.get(rstPath), buf.array())
    Files.write(Paths.get(rstPath.stripSuffix(".rst") + ".rdc"),
      (s"file format : IDRISI Raster A.1\ndata type   : real\n" +
        s"file type   : binary\ncolumns     : $cols\nrows        : $rows\n" +
        s"flag value  : $noData\n").getBytes(UTF_8))
  }

  // ---- generic multiband BIL / BIP / BSQ ----------------------------
  // ImportExport/src/plugins/ImportGenericMultibandData.java:
  // layout-strided float32 decode -> (band, r, c, v).

  def readMultiband(spark: SparkSession, binPath: String, rows: Int,
                    cols: Int, bands: Int, layout: String,
                    noData: Double = -9999.0): DataFrame = {
    import spark.implicits._
    val lay = layout.toUpperCase
    val bin = spark.read.format("binaryFile").load(binPath)
      .select(col("content")).as[Array[Byte]]
    bin.flatMap { content =>
      val buf = ByteBuffer.wrap(content).order(ByteOrder.LITTLE_ENDIAN)
      for {
        b <- (0 until bands).iterator
        r <- (0 until rows).iterator
        c <- (0 until cols).iterator
        idx = lay match {
          case "BSQ" => (b * rows + r) * cols + c
          case "BIL" => (r * bands + b) * cols + c
          case "BIP" => (r * cols + c) * bands + b
          case other => sys.error(s"unknown layout $other")
        }
        v = buf.getFloat(idx * 4).toDouble
        if v != noData
      } yield (b.toLong, r.toLong, c.toLong, v)
    }.toDF("band", "r", "c", "v")
  }

  def writeMultiband(df: DataFrame, rows: Int, cols: Int, bands: Int,
                     layout: String, noData: Double,
                     binPath: String): Unit = {
    val cells = df.select("band", "r", "c", "v").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)) ->
        x.getDouble(3)).toMap
    val lay = layout.toUpperCase
    val buf = ByteBuffer.allocate(bands * rows * cols * 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    for (b <- 0 until bands; r <- 0 until rows; c <- 0 until cols) {
      val idx = lay match {
        case "BSQ" => (b * rows + r) * cols + c
        case "BIL" => (r * bands + b) * cols + c
        case "BIP" => (r * cols + c) * bands + b
      }
      buf.putFloat(idx * 4,
        cells.getOrElse((b.toLong, r.toLong, c.toLong), noData).toFloat)
    }
    Files.write(Paths.get(binPath), buf.array())
  }

  /** Templated GML export of polygon features (ExportGML.java
    * semantics: one gml:featureMember per record, posList ring). */
  def writeGml(df: DataFrame, path: String): Unit = {
    val sb = new StringBuilder
    sb ++= """<?xml version="1.0" encoding="UTF-8"?>""" + "\n"
    sb ++= """<gml:FeatureCollection xmlns:gml="http://www.opengis.net/gml">""" + "\n"
    df.select("fid", "xs", "ys").collect().foreach { row =>
      val fid = row.getLong(0)
      val xs = row.getSeq[Double](1)
      val ys = row.getSeq[Double](2)
      val pos = (xs.zip(ys) :+ (xs.head, ys.head))
        .map { case (x, y) => s"$x $y" }.mkString(" ")
      sb ++= s"""  <gml:featureMember><feature fid="$fid">"""
      sb ++= s"""<gml:Polygon><gml:exterior><gml:LinearRing>"""
      sb ++= s"""<gml:posList>$pos</gml:posList>"""
      sb ++= "</gml:LinearRing></gml:exterior></gml:Polygon>" +
        "</feature></gml:featureMember>\n"
    }
    sb ++= "</gml:FeatureCollection>\n"
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

  // ---- USGS/CDED ASCII DEM (ImportExport/ImportDEM.java) ----

  /**
   * USGS DEM reader (ImportDEM.java:280-432): the file is a stream of
   * 1024-byte space-padded ASCII blocks; block 1 (the A record)
   * carries corner coordinates in arc-seconds at fixed offsets (west
   * 546-570, south 570-594, north 618-642, east 652-676) and the
   * profile count at 858-864. The rest is one whitespace token
   * stream per block: each column profile starts with 9 addressing
   * tokens, then `rows` elevations bottom-up (the reference hardcodes
   * rows = 1201 for CDED tiles; a parameter here). CDED NoData
   * (-32767) dropped. Output (r, c, v).
   */
  def readUsgsDem(spark: SparkSession, path: String,
                  rows: Int = 1201): DataFrame = {
    import spark.implicits._
    val bin = spark.read.format("binaryFile").load(path)
      .select(col("content")).as[Array[Byte]]
    bin.flatMap { content =>
      val nBlocks = content.length / 1024
      val out = Seq.newBuilder[(Long, Long, Double)]
      var colIx = 0L
      var rowIx = (rows - 1).toLong
      var seen = 0
      // per-block split with cross-block counters, exactly the
      // reference's walk (ImportDEM.java:403-432)
      (1 until nBlocks).foreach { b =>
        val blk = new String(content, b * 1024, 1024, UTF_8)
        blk.split(" ").foreach { tok =>
          if (tok.trim.nonEmpty) {
            seen += 1
            if (seen >= 10) {
              val z = tok.trim.toDouble
              if (z != -32767.0) out += ((rowIx, colIx, z))
              rowIx -= 1
              if (rowIx == -1) {
                seen = 0; rowIx = (rows - 1).toLong; colIx += 1
              }
            }
          }
        }
      }
      out.result().iterator
    }.toDF("r", "c", "v")
  }

  /** A-record corner parse (ImportDEM.java:347-352): arc-seconds /
    * 3600 at the fixed offsets; (north, south, east, west, cols). */
  def readUsgsDemHeader(path: String)
      : (Double, Double, Double, Double, Int) = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val a = new String(bytes, 0, 1024, UTF_8)
    (a.substring(618, 642).trim.toDouble / 3600,
      a.substring(570, 594).trim.toDouble / 3600,
      a.substring(652, 676).trim.toDouble / 3600,
      a.substring(546, 570).trim.toDouble / 3600,
      a.substring(858, 864).trim.toInt)
  }

  /** Write (r, c, v) as a USGS DEM: an A record with the corner /
    * profile-count fields at the reference offsets, then one
    * block-aligned B record per column (9 addressing tokens + rows
    * elevations bottom-up), 1024-byte space-padded blocks. */
  def writeUsgsDem(df: DataFrame, rows: Int, cols: Int,
                   north: Double, south: Double, east: Double,
                   west: Double, path: String): Unit = {
    val cells = df.select("r", "c", "v").collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(2)).toMap
    def field(s: String, at: Int, width: Int, buf: Array[Byte]): Unit =
      s.getBytes(UTF_8).take(width).zipWithIndex
        .foreach { case (b, i) => buf(at + i) = b }
    val blocks = Seq.newBuilder[Array[Byte]]
    val a = Array.fill(1024)(' '.toByte)
    field((west * 3600).toString, 546, 24, a)
    field((south * 3600).toString, 570, 24, a)
    field((north * 3600).toString, 618, 24, a)
    field((east * 3600).toString, 652, 24, a)
    field(cols.toString, 858, 6, a)
    blocks += a
    (0 until cols).foreach { c =>
      val toks = Seq.fill(9)("0") ++
        (rows - 1 to 0 by -1).map(r =>
          cells.getOrElse((r.toLong, c.toLong), -32767.0).toString)
      // pack whole tokens into 1024-byte blocks (numbers never
      // straddle a block boundary, matching the per-block split)
      var cur = new StringBuilder
      toks.foreach { t =>
        if (cur.length + t.length + 1 > 1024) {
          val blk = Array.fill(1024)(' '.toByte)
          field(cur.toString, 0, 1024, blk)
          blocks += blk
          cur = new StringBuilder
        }
        cur.append(t).append(' ')
      }
      if (cur.nonEmpty) {
        val blk = Array.fill(1024)(' '.toByte)
        field(cur.toString, 0, 1024, blk)
        blocks += blk
      }
    }
    Files.write(Paths.get(path), blocks.result().flatten.toArray)
  }

  // ---- Image import (ImportExport/ImportImage.java) ----

  /**
   * Image-as-raster reader (ImportImage.java:245-470): decode with
   * javax.imageio (PNG/JPEG/BMP/GIF readers ship in the JDK), each
   * pixel packed exactly as the reference does —
   * (255<<24)|(b<<16)|(g<<8)|r with r/g/b = the low/mid/high bytes of
   * getRGB (ImportImage.java:386-390), i.e. ARGB with alpha forced
   * opaque, stored as a double. Decode runs inside the binaryFile
   * task, so a directory of images decodes in parallel. Output
   * (r, c, v).
   */
  def readImageRaster(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val bin = spark.read.format("binaryFile").load(path)
      .select(col("content")).as[Array[Byte]]
    bin.flatMap { content =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(content))
      for {
        row <- (0 until img.getHeight).iterator
        c <- (0 until img.getWidth).iterator
      } yield {
        val z = img.getRGB(c, row)
        val r0 = z & 0xFF
        val g0 = (z >> 8) & 0xFF
        val b0 = (z >> 16) & 0xFF
        (row.toLong, c.toLong,
          ((255 << 24) | (b0 << 16) | (g0 << 8) | r0).toDouble)
      }
    }.toDF("r", "c", "v")
  }

  /** ESRI world file (ImportImage.java:296-350): six lines A, D, B,
    * E, C, F; (A, D, B, E, C, F). */
  def readWorldFile(path: String)
      : (Double, Double, Double, Double, Double, Double) = {
    val ls = scala.io.Source.fromFile(path).getLines()
      .map(_.trim).filter(_.nonEmpty).take(6).map(_.toDouble).toSeq
    (ls(0), ls(1), ls(2), ls(3), ls(4), ls(5))
  }

  /** Write packed (r, c, v) pixels back to a lossless PNG — the
    * inverse of [[readImageRaster]]'s packing. */
  def writeImagePng(df: DataFrame, rows: Int, cols: Int,
                    path: String): Unit = {
    val img = new java.awt.image.BufferedImage(cols, rows,
      java.awt.image.BufferedImage.TYPE_INT_ARGB)
    df.select("r", "c", "v").collect().foreach { x =>
      img.setRGB(x.getLong(1).toInt, x.getLong(0).toInt,
        x.getDouble(2).toInt)
    }
    javax.imageio.ImageIO.write(img, "png",
      new java.io.File(path))
  }

  // ---- TAS .vtr vector (ImportExport/ImportTASVector.java) ----

  /**
   * TAS vector reader (ImportTASVector.java:226-330): little-endian;
   * 40-byte header (float min/max at 0/4, doubles y1, y2, x1, x2 at
   * 8/16/24/32 — north/south/east/west by max/min), then records of
   * (int numVertices, float value, numVertices x (float dx, float
   * dy)) with vertex coordinates offset from (west, south).
   * numVertices == 1 -> POINT else POLYLINE. Output (fid, value,
   * kind, xs, ys).
   */
  def readTasVector(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val bin = spark.read.format("binaryFile").load(path)
      .select(col("content")).as[Array[Byte]]
    bin.flatMap { content =>
      val buf = ByteBuffer.wrap(content).order(ByteOrder.LITTLE_ENDIAN)
      val south = math.min(buf.getDouble(8), buf.getDouble(16))
      val west = math.min(buf.getDouble(24), buf.getDouble(32))
      val out = Seq.newBuilder[
        (Long, Double, String, Seq[Double], Seq[Double])]
      var loc = 40
      var fid = 0L
      while (loc + 8 <= content.length) {
        val n = buf.getInt(loc)
        val value = buf.getFloat(loc + 4).toDouble
        val xs = (0 until n).map(i =>
          buf.getFloat(loc + 8 + i * 8).toDouble + west)
        val ys = (0 until n).map(i =>
          buf.getFloat(loc + 12 + i * 8).toDouble + south)
        out += ((fid, value, if (n == 1) "POINT" else "POLYLINE",
          xs, ys))
        fid += 1
        loc += 8 + n * 8
      }
      out.result().iterator
    }.toDF("fid", "value", "kind", "xs", "ys")
  }

  /** Write (fid, value, kind, xs, ys) as TAS .vtr (inverse of
    * [[readTasVector]]; bounds derived from the data). */
  def writeTasVector(df: DataFrame, path: String): Unit = {
    val rows = df.select("fid", "value", "xs", "ys").collect()
      .sortBy(_.getLong(0))
      .map(x => (x.getDouble(1), x.getSeq[Double](2), x.getSeq[Double](3)))
    val allX = rows.flatMap(_._2)
    val allY = rows.flatMap(_._3)
    val (west, east) = (allX.min, allX.max)
    val (south, north) = (allY.min, allY.max)
    val vals = rows.map(_._1)
    val size = 40 + rows.map(r => 8 + r._2.length * 8).sum
    val buf = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    buf.putFloat(0, vals.min.toFloat)
    buf.putFloat(4, vals.max.toFloat)
    buf.putDouble(8, south); buf.putDouble(16, north)
    buf.putDouble(24, west); buf.putDouble(32, east)
    var loc = 40
    rows.foreach { case (v, xs, ys) =>
      buf.putInt(loc, xs.length)
      buf.putFloat(loc + 4, v.toFloat)
      xs.indices.foreach { i =>
        buf.putFloat(loc + 8 + i * 8, (xs(i) - west).toFloat)
        buf.putFloat(loc + 12 + i * 8, (ys(i) - south).toFloat)
      }
      loc += 8 + xs.length * 8
    }
    Files.write(Paths.get(path), buf.array())
  }
}
