package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * LAS 1.2 point-cloud reader (format-0 point records) — the engine's
 * re-expression of the reference's LASReader
 * (WhiteboxAPI/src/whitebox/geospatialfiles/LASReader.java:36-230
 * header decode; :332-396 bit-packed point records; PointRecord
 * :1077-1090), built on the PUBLIC ASPRS LAS 1.2 layout. Decode runs
 * through binaryFile + flatMap, like the raster formats.
 *
 * Output: (x, y, z, intensity, return_num, n_returns, classification,
 * scan_angle, edge_flag, withheld) with the scale/offset transform
 * applied. edge_flag is bit 7 of the flags byte (edge of flight
 * line); withheld is bit 7 of the classification byte; scan_angle is
 * the signed scan-angle-rank byte — the fields
 * FindFlightlineEdgePoints.groovy / IsolateGroundPoints.groovy read
 * via PointRecord.isPointWithheld()/getScanAngle().
 */
object LasIO {

  def readLas(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val bin = spark.read.format("binaryFile").load(path)
      .select(col("content")).as[Array[Byte]]
    bin.flatMap { content =>
      val buf = ByteBuffer.wrap(content).order(ByteOrder.LITTLE_ENDIAN)
      require(content(0) == 'L' && content(1) == 'A' &&
        content(2) == 'S' && content(3) == 'F', "not a LAS file")
      val offToPoints = buf.getInt(96)
      val recLen = buf.getShort(105) & 0xffff
      val nPoints = buf.getInt(107)
      val xScale = buf.getDouble(131); val yScale = buf.getDouble(139)
      val zScale = buf.getDouble(147)
      val xOff = buf.getDouble(155); val yOff = buf.getDouble(163)
      val zOff = buf.getDouble(171)
      (0 until nPoints).iterator.map { i =>
        val p = offToPoints + i * recLen
        val x = buf.getInt(p) * xScale + xOff
        val y = buf.getInt(p + 4) * yScale + yOff
        val z = buf.getInt(p + 8) * zScale + zOff
        val intensity = buf.getShort(p + 12) & 0xffff
        val flags = content(p + 14) & 0xff
        val returnNum = flags & 0x7          // bits 0-2
        val nReturns = (flags >> 3) & 0x7    // bits 3-5
        val edge = (flags >> 7) & 0x1        // bit 7: edge of flight line
        val clsByte = content(p + 15) & 0xff
        val classification = clsByte & 0x1f  // bits 0-4
        val withheld = (clsByte >> 7) & 0x1  // bit 7
        val scanAngle = content(p + 16).toLong // signed byte
        (x, y, z, intensity.toLong, returnNum.toLong, nReturns.toLong,
          classification.toLong, scanAngle, edge.toLong, withheld.toLong)
      }
    }.toDF("x", "y", "z", "intensity", "return_num", "n_returns",
      "classification", "scan_angle", "edge_flag", "withheld")
  }

  /** Minimal LAS 1.2 format-0 writer (driver-side; fixture/export
    * path — LAS2Shapefile analogue in reverse). */
  def writeLas(points: Seq[(Double, Double, Double, Int, Int, Int, Int)],
               path: String,
               scale: Double = 0.001): Unit =
    writeLasFull(points.map { case (x, y, z, i, rn, nr, cls) =>
      (x, y, z, i, rn, nr, cls, 0, false, false)
    }, path, scale)

  /** Full-flag writer: (x, y, z, intensity, retNum, nRet, cls,
    * scanAngle, edge, withheld). */
  def writeLasFull(points: Seq[(Double, Double, Double, Int, Int, Int,
                     Int, Int, Boolean, Boolean)],
                   path: String,
                   scale: Double = 0.001): Unit = {
    val headerLen = 227
    val recLen = 20
    val buf = ByteBuffer.allocate(headerLen + points.length * recLen)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put("LASF".getBytes("US-ASCII"))
    buf.put(24, 1.toByte)  // version major
    buf.put(25, 2.toByte)  // version minor
    buf.putShort(94, headerLen.toShort)
    buf.putInt(96, headerLen)            // offset to point data
    buf.putInt(100, 0)                   // number of VLRs
    buf.put(104, 0.toByte)               // point format 0
    buf.putShort(105, recLen.toShort)
    buf.putInt(107, points.length)
    buf.putDouble(131, scale); buf.putDouble(139, scale)
    buf.putDouble(147, scale)
    buf.putDouble(155, 0.0); buf.putDouble(163, 0.0)
    buf.putDouble(171, 0.0)
    points.zipWithIndex.foreach {
      case ((x, y, z, intensity, retNum, nRet, cls, scanAngle, edge,
             withheld), i) =>
        val p = headerLen + i * recLen
        buf.putInt(p, math.round(x / scale).toInt)
        buf.putInt(p + 4, math.round(y / scale).toInt)
        buf.putInt(p + 8, math.round(z / scale).toInt)
        buf.putShort(p + 12, intensity.toShort)
        buf.put(p + 14, ((retNum & 0x7) | ((nRet & 0x7) << 3) |
          (if (edge) 0x80 else 0)).toByte)
        buf.put(p + 15, ((cls & 0x1f) |
          (if (withheld) 0x80 else 0)).toByte)
        buf.put(p + 16, scanAngle.toByte)
    }
    Files.write(Paths.get(path), buf.array())
  }
}
