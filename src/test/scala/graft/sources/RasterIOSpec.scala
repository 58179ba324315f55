package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Derived, TestSpark}

class RasterIOSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def grid = Derived.partGrid(spark, "/root/testdata/sf0.001")

  test("dep/tas round-trip preserves every cell (float precision)") {
    val dir = Files.createTempDirectory("wbr").toString
    val dep = s"$dir/grid.dep"
    val h = RasterIO.DepHeader(rows = 40, cols = 50, north = 40.0,
      south = 0.0, east = 50.0, west = 0.0, dataType = "float",
      noData = -32768.0, byteOrder = "LITTLE_ENDIAN")
    RasterIO.writeWhiteboxRaster(grid, h, dep)
    val back = RasterIO.readWhiteboxRaster(spark, dep)
      .as[(Long, Long, Double)].collect()
      .map { case (r, c, v) => (r, c) -> v }.toMap
    val orig = grid.as[(Long, Long, Double)].collect()
      .map { case (r, c, v) => (r, c) -> v.toFloat.toDouble }.toMap
    assert(back === orig)
    assert(back.nonEmpty)
  }

  test("header grammar: loose key:value parse with defaults") {
    val dir = Files.createTempDirectory("wbr").toString
    val dep = s"$dir/h.dep"
    Files.write(java.nio.file.Paths.get(dep),
      "Rows:\t3\nCols:\t4\nNorth:\t3.0\nSouth:\t0.0\nEast:\t4.0\nWest:\t0.0\nData Type:\tFLOAT\n"
        .getBytes)
    val h = RasterIO.readDep(dep)
    assert(h.rows === 3 && h.cols === 4)
    assert(h.noData === -32768.0) // default sentinel
    assert(h.byteOrder === "LITTLE_ENDIAN") // default
  }

  test("ArcASCII round-trip") {
    val dir = Files.createTempDirectory("aag").toString
    val p = s"$dir/g.asc"
    RasterIO.writeArcAscii(grid, rows = 40, cols = 50, xll = 0,
      yll = 0, cellSize = 1.0, noData = -9999.0, p)
    val back = RasterIO.readArcAscii(spark, p)
      .as[(Long, Long, Double)].collect().toSet
    val orig = grid.as[(Long, Long, Double)].collect().toSet
    assert(back === orig)
  }

  test("XYZ delimiter autodetection (tab, space, comma)") {
    assert(RasterIO.detectDelimiter("1.0\t2.0\t3.0") === "\t")
    assert(RasterIO.detectDelimiter("1.0 2.0 3.0") === " ")
    assert(RasterIO.detectDelimiter("1.0,2.0,3.0") === ",")
    val dir = Files.createTempDirectory("xyz").toString
    val p = s"$dir/pts.csv"
    Files.write(java.nio.file.Paths.get(p),
      "1.5,2.5,10.0\n-3.25,4.0,20.5\n".getBytes)
    val got = RasterIO.readXyz(spark, p)
      .as[(Double, Double, Double)].collect().toSet
    assert(got === Set((1.5, 2.5, 10.0), (-3.25, 4.0, 20.5)))
  }
}
