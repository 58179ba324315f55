package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Jts

/** Vertex-exact tests for the geometry-output overlay family:
  * ring/part round-trips (shapefile winding) and operator output vs
  * direct JTS on the same fixtures. */
class OverlaySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  test("toGeometry/toPartsArrays round-trip a polygon with a hole") {
    // zone 3 shape: shell + hole (Derived.zones)
    val xs = Array(40.005, 80.005, 80.005, 40.005,
      50.005, 70.005, 70.005, 50.005)
    val ys = Array(-60.005, -60.005, -20.005, -20.005,
      -50.005, -50.005, -30.005, -30.005)
    // make shell CW, hole CCW per shapefile convention: as listed the
    // shell is CCW, so toGeometry must still classify by winding
    val g = Jts.toPolygon(xs, ys, Array(0, 4))
    val (oxs, oys, oparts) = Jts.toPartsArrays(g)
    val g2 = Jts.toGeometry(oxs, oys, oparts)
    assert(g2.getArea === g.getArea)
    assert(g2.getNumGeometries === 1)
    assert(g2.symDifference(g).getArea === 0.0)
    // winding: first ring CW (negative CCW test), second ring CCW
    val shell = oxs.slice(oparts(0), oparts(1))
      .zip(oys.slice(oparts(0), oparts(1)))
    val signed = shell.indices.map { i =>
      val (x1, y1) = shell(i)
      val (x2, y2) = shell((i + 1) % shell.length)
      x1 * y2 - x2 * y1
    }.sum / 2
    assert(signed < 0, "shell must be clockwise (shapefile winding)")
  }

  test("multipolygon arrays round-trip") {
    val a = Jts.toPolygon(Array(0.0, 1, 1, 0), Array(0.0, 0, 1, 1),
      Array(0))
    val b = Jts.toPolygon(Array(5.0, 6, 6, 5), Array(5.0, 5, 6, 6),
      Array(0))
    val multi = Jts.unionAll(Seq(a, b))
    val (xs, ys, parts) = Jts.toPartsArrays(multi)
    assert(parts.length === 2)
    val back = Jts.toGeometry(xs, ys, parts)
    assert(back.getArea === 2.0)
    assert(back.getNumGeometries === 2)
  }

  test("clip output equals direct JTS intersection per feature") {
    val sq = Derived.supplierSquares(spark, "/root/testdata/sf0.001")
    val zones = Derived.rectZones(spark)
    val got = VectorOverlay.clip(sq, zones, res = 4)
      .select("fid", "area").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // brute force: every square against the union of both rects
    val zoneGeoms = zones.collect().map { r =>
      Jts.toGeometry(r.getSeq[Double](1).toArray,
        r.getSeq[Double](2).toArray, r.getSeq[Int](3).toArray)
    }
    val region = Jts.unionAll(zoneGeoms.toSeq)
    val want = sq.collect().flatMap { r =>
      val g = Jts.toGeometry(r.getSeq[Double](1).toArray,
        r.getSeq[Double](2).toArray, r.getSeq[Int](3).toArray)
      val inter = g.intersection(region)
      if (inter.getArea > 0) Some(r.getLong(0) -> inter.getArea) else None
    }.toMap
    assert(got.keySet === want.keySet)
    want.foreach { case (fid, a) => assert(got(fid) === a, s"fid $fid") }
  }

  test("erase keeps untouched features verbatim") {
    val sq = Derived.supplierSquares(spark, "/root/testdata/sf0.001")
    val zones = Derived.rectZones(spark)
    val out = VectorOverlay.erase(sq, zones, res = 4)
    val nIn = sq.count()
    // every square either survives (possibly cut) or was fully erased
    assert(out.count() <= nIn && out.count() > 0)
    // untouched squares keep their exact ring arrays
    val touchedIds = VectorOverlay
      .overlayPairs(sq, zones, res = 4, op = Jts.OpIntersection)
      .select("a_fid").distinct()
      .collect().map(_.getLong(0)).toSet
    val verbatim = out.where(!col("fid").isin(touchedIds.toSeq: _*))
      .join(sq.withColumnRenamed("xs", "orig_xs"), Seq("fid"))
      .where(col("xs") =!= col("orig_xs")).count()
    assert(verbatim === 0)
  }
}
