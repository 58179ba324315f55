package graft.core

import scala.jdk.CollectionConverters._

import org.locationtech.jts.algorithm.Orientation
import org.locationtech.jts.geom.{Coordinate, Geometry, GeometryFactory,
  LinearRing, Polygon}
import org.locationtech.jts.operation.union.UnaryUnionOp

/**
 * Thin JTS 1.20 bridge (jar ships in /opt/spark/jars). The reference
 * delegates all non-trivial computational geometry to JTS the same
 * way (shapefile/Geometry.getJTSGeometries; Clip/Intersect/Union/
 * BufferVector in VectorTools) — this engine keeps that delegation
 * but calls it per-row inside Spark transforms.
 *
 * Geometry interchange format is the engine's ring/part model
 * (SURVEY.md §1.2): xs/ys vertex arrays + part start offsets; holes
 * are parts wound opposite to their shell.
 */
object Jts {

  private val gf = new GeometryFactory()

  /** Close a ring if needed and build a JTS LinearRing. */
  private def ring(xs: Array[Double], ys: Array[Double], start: Int,
                   end: Int): LinearRing = {
    val n = end - start
    val closed = xs(start) == xs(end - 1) && ys(start) == ys(end - 1)
    val m = if (closed) n else n + 1
    val cs = new Array[Coordinate](m)
    var i = 0
    while (i < n) {
      cs(i) = new Coordinate(xs(start + i), ys(start + i))
      i += 1
    }
    if (!closed) cs(n) = new Coordinate(xs(start), ys(start))
    gf.createLinearRing(cs)
  }

  /**
   * Build a JTS polygon from the ring/part model. Ring 0 is the
   * shell; remaining parts are holes (single-shell polygons — the
   * fixture shapes; multi-shell needs part/hole classification by
   * winding as in whitebox shapefile.Polygon.partHoleData).
   */
  def toPolygon(xs: Array[Double], ys: Array[Double],
                parts: Array[Int]): Polygon = {
    val bounds = parts :+ xs.length
    val shell = ring(xs, ys, bounds(0), bounds(1))
    val holes = (1 until parts.length).map(i =>
      ring(xs, ys, bounds(i), bounds(i + 1))).toArray
    gf.createPolygon(shell, holes)
  }

  def point(x: Double, y: Double): Geometry =
    gf.createPoint(new Coordinate(x, y))

  /** Buffer a point by `dist` (BufferVector semantics,
    * VectorTools/BufferVector.java:359+; default 8 quadrant segs). */
  def bufferPoint(x: Double, y: Double, dist: Double): Geometry =
    point(x, y).buffer(dist)

  def bufferPointArea(x: Double, y: Double, dist: Double): Double =
    bufferPoint(x, y, dist).getArea

  /** Area of polygon INTERSECT axis-aligned rectangle (Clip.java:240-460
    * semantics: per-record intersection with the clip region). */
  def clipAreaWithRect(xs: Array[Double], ys: Array[Double],
                       parts: Array[Int], minX: Double, minY: Double,
                       maxX: Double, maxY: Double): Double = {
    val rect = gf.createPolygon(Array(
      new Coordinate(minX, minY), new Coordinate(maxX, minY),
      new Coordinate(maxX, maxY), new Coordinate(minX, maxY),
      new Coordinate(minX, minY)))
    toPolygon(xs, ys, parts).intersection(rect).getArea
  }

  /** Geometry -> ring/part arrays (for round-trips in tests and the
    * VectorOps outputs). */
  def toArrays(g: Geometry): (Array[Double], Array[Double], Array[Int]) =
    g match {
      case p: Polygon =>
        val rings = (Seq(p.getExteriorRing) ++
          (0 until p.getNumInteriorRing).map(p.getInteriorRingN))
        val parts = rings.scanLeft(0)(_ + _.getNumPoints - 1).init.toArray
        val xs = rings.flatMap(_.getCoordinates.init.map(_.x)).toArray
        val ys = rings.flatMap(_.getCoordinates.init.map(_.y)).toArray
        (xs, ys, parts)
      case other =>
        val cs = other.getCoordinates
        (cs.map(_.x), cs.map(_.y), Array(0))
    }

  /** All polygonal components of a geometry (drops lower-dimension
    * pieces from collections, like the reference's polygon tools). */
  def polygonsOf(g: Geometry): Seq[Polygon] =
    (0 until g.getNumGeometries).map(g.getGeometryN).flatMap {
      case p: Polygon if !p.isEmpty => Seq(p)
      case sub if sub.getNumGeometries > 1 => polygonsOf(sub)
      case _ => Seq.empty
    }

  /**
   * Geometry (multi-polygon aware) -> shapefile-convention ring/part
   * arrays: shells clockwise, holes counter-clockwise, each shell
   * followed by its holes — the reference's partHoleData winding
   * model (shapefile/Polygon.java:356-380; Topology.java:33-233).
   */
  def toPartsArrays(g: Geometry): (Array[Double], Array[Double], Array[Int]) = {
    val xs = scala.collection.mutable.ArrayBuffer[Double]()
    val ys = scala.collection.mutable.ArrayBuffer[Double]()
    val parts = scala.collection.mutable.ArrayBuffer[Int]()
    def addRing(r: LinearRing, clockwise: Boolean): Unit = {
      val cs0 = r.getCoordinates.init // drop closing vertex
      val ccw = Orientation.isCCW(r.getCoordinateSequence)
      val cs = if (ccw == clockwise) cs0.reverse else cs0
      parts += xs.length
      cs.foreach { c => xs += c.x; ys += c.y }
    }
    polygonsOf(g).foreach { p =>
      addRing(p.getExteriorRing, clockwise = true)
      (0 until p.getNumInteriorRing).foreach(i =>
        addRing(p.getInteriorRingN(i), clockwise = false))
    }
    (xs.toArray, ys.toArray, parts.toArray)
  }

  /**
   * Ring/part arrays (shapefile winding) -> geometry: clockwise rings
   * open shells, counter-clockwise rings are holes of the LAST shell
   * (partHoleData assignment order).
   */
  def toGeometry(xs: Array[Double], ys: Array[Double],
                 parts: Array[Int]): Geometry = {
    val bounds = parts :+ xs.length
    val rings = parts.indices.map(i => ring(xs, ys, bounds(i), bounds(i + 1)))
    if (rings.isEmpty) return gf.createPolygon()
    val shells = scala.collection.mutable.ArrayBuffer[
      (LinearRing, scala.collection.mutable.ArrayBuffer[LinearRing])]()
    rings.foreach { r =>
      val isHole = Orientation.isCCW(r.getCoordinateSequence)
      if (isHole && shells.nonEmpty) shells.last._2 += r
      else shells += ((r, scala.collection.mutable.ArrayBuffer[LinearRing]()))
    }
    val polys = shells.map { case (sh, hs) =>
      gf.createPolygon(sh, hs.toArray)
    }
    if (polys.length == 1) polys.head
    else gf.createMultiPolygon(polys.toArray)
  }

  /** Overlay op codes shared with the Catalyst expression. */
  val OpIntersection = 0
  val OpUnion = 1
  val OpDifference = 2
  val OpSymDifference = 3

  /**
   * Binary overlay. JTS 1.20's default overlay is OverlayNGRobust,
   * which already includes the snap-on-topology-failure fallback the
   * reference wires by hand (Intersect.java:297-299 SnapOverlayOp).
   */
  def overlay(op: Int, a: Geometry, b: Geometry): Geometry = op match {
    case OpIntersection => a.intersection(b)
    case OpUnion => a.union(b)
    case OpDifference => a.difference(b)
    case OpSymDifference => a.symDifference(b)
    case other => throw new IllegalArgumentException(s"op $other")
  }

  /** WKT export/import (ImportExport/ExportWellKnownText.java,
    * Scripts/ImportWellKnownText.groovy — JTS WKT delegation). */
  def toWkt(xs: Array[Double], ys: Array[Double],
            parts: Array[Int]): String =
    new org.locationtech.jts.io.WKTWriter().write(toGeometry(xs, ys, parts))

  def fromWkt(wkt: String): Geometry =
    new org.locationtech.jts.io.WKTReader(gf).read(wkt)

  /** Dissolve: n-ary union (BufferVector's implicit dissolve /
    * Union.java coverage union semantics). */
  def unionAll(gs: Iterable[Geometry]): Geometry =
    if (gs.isEmpty) gf.createPolygon()
    else UnaryUnionOp.union(gs.toSeq.asJava)
}
