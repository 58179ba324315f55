package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Lidar, TestSpark}

/**
 * End-to-end LiDAR pipeline differential: write a deterministic
 * point cloud as LAS 1.2, read it back through LasIO, run the
 * gridding family, and compare against the same operators over the
 * in-memory frame (the reference pipeline LiDAR_BareEarthDEM.groovy /
 * LiDAR_CanopyModel.groovy runs over LAS files directly).
 * Coordinates and elevations are multiples of a binary-exact 0.25
 * LAS scale so the integer quantization round-trips bit-exactly.
 */
class LidarPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // (x, y, z, intensity, return_num, n_returns, classification)
  def cloud: Seq[(Double, Double, Double, Int, Int, Int, Int)] =
    (1 to 400).map { i =>
      val x = (i * 131 % 1000) / 4.0
      val y = (i * 197 % 1000) / 4.0
      val cls = if (i % 5 < 3) 2 else 1
      val nRet = i % 3 + 1
      val ret = i * 7 % nRet + 1
      val z = x * 3.0 + y * 2.0 +
        (if (cls == 1) (i * 53 % 200) / 4.0 else 0.0)
      (x, y, z, i * 11 % 256, ret, nRet, cls)
    }

  def memDf = cloud.toDF("x", "y", "z", "intensity", "return_num",
      "n_returns", "classification")
    .select(col("x"), col("y"), col("z"),
      col("intensity").cast("long").as("intensity"),
      col("return_num").cast("long").as("return_num"),
      col("n_returns").cast("long").as("n_returns"),
      col("classification").cast("long").as("classification"))

  lazy val lasDf = {
    val dir = Files.createTempDirectory("lidar").toString
    LasIO.writeLas(cloud, s"$dir/cloud.las", scale = 0.25)
    LasIO.readLas(spark, s"$dir/cloud.las")
  }

  def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("LAS round-trip preserves the full point table") {
    assert(rows(lasDf.select("x", "y", "z", "intensity", "return_num",
      "n_returns", "classification")) === rows(memDf))
  }

  test("bare-earth DEM over LAS equals in-memory differential") {
    assert(rows(Lidar.bareEarthDem(lasDf, 10.0)) ===
      rows(Lidar.bareEarthDem(memDf, 10.0)))
  }

  test("canopy model over LAS equals in-memory differential") {
    assert(rows(Lidar.canopyModel(lasDf, 10.0)) ===
      rows(Lidar.canopyModel(memDf, 10.0)))
  }

  test("point density and summary over LAS equal in-memory") {
    assert(rows(Lidar.pointDensity(lasDf, 10.0)) ===
      rows(Lidar.pointDensity(memDf, 10.0)))
    assert(rows(Lidar.summary(lasDf)) === rows(Lidar.summary(memDf)))
  }

  test("IDW surface over LAS ground points equals in-memory") {
    val a = Lidar.idwSurface(lasDf.withColumn("pid",
      (col("x") * 10000 + col("y")).cast("long")), 10, 10, 10.0, 8.0)
    val b = Lidar.idwSurface(memDf.withColumn("pid",
      (col("x") * 10000 + col("y")).cast("long")), 10, 10, 10.0, 8.0)
    assert(rows(a) === rows(b))
  }
}
