package graft.core

/**
 * Pure computational-geometry kernel used by the Catalyst expressions
 * and operators. Mirrors the reference's vector semantics:
 *
 *  - polygons are vertex arrays with part offsets and even-odd
 *    interior (holes are just parts; parity handles them), exactly the
 *    model of whitebox.geospatialfiles.shapefile.Polygon
 *    (parts/holes/points) and the scanline parity fill of
 *    ConversionTools/src/plugins/VectorPolygonsToRaster.java:395-443;
 *  - ray-casting point-in-polygon is the even-odd crossing rule, so a
 *    polygon-with-hole needs no special casing;
 *  - signed area / perimeter per
 *    whitebox/geospatialfiles/shapefile/Polygon.java:170-184 and the
 *    clockwise test of whitebox/utilities/Topology.java:33-233.
 *
 * All methods are static, allocation-light, and called from generated
 * code (see graft.expr), so they must stay deterministic and
 * side-effect free.
 */
object Geo {

  /**
   * Even-odd ray-cast PIP over a multi-part ring set.
   * `parts(i)` is the start vertex index of part i; the last part ends
   * at xs.length. Rings need not be explicitly closed: the test wraps
   * from the last vertex of a part back to its first.
   * Points exactly on an edge follow the half-open crossing rule
   * (deterministic, matches the scanline `isBetween` convention of
   * VectorPolygonsToRaster.java:395-412).
   */
  def pipContains(x: Double, y: Double, xs: Array[Double],
                  ys: Array[Double], parts: Array[Int]): Boolean = {
    var inside = false
    var p = 0
    val nParts = parts.length
    while (p < nParts) {
      val start = parts(p)
      val end = if (p + 1 < nParts) parts(p + 1) else xs.length
      var i = start
      var j = end - 1
      while (i < end) {
        val yi = ys(i); val yj = ys(j)
        if ((yi > y) != (yj > y)) {
          val xi = xs(i); val xj = xs(j)
          val xCross = (xj - xi) * (y - yi) / (yj - yi) + xi
          if (x < xCross) inside = !inside
        }
        j = i
        i += 1
      }
      p += 1
    }
    inside
  }

  /** Axis-aligned bbox containment pretest (Clip.java:281 analogue). */
  @inline def bboxContains(x: Double, y: Double, minX: Double,
                           minY: Double, maxX: Double,
                           maxY: Double): Boolean =
    x >= minX && x <= maxX && y >= minY && y <= maxY

  /** Signed shoelace area of one ring [start, end). CCW positive. */
  def ringSignedArea(xs: Array[Double], ys: Array[Double], start: Int,
                     end: Int): Double = {
    var a = 0.0
    var i = start
    var j = end - 1
    while (i < end) {
      a += xs(j) * ys(i) - xs(i) * ys(j)
      j = i
      i += 1
    }
    a / 2.0
  }

  /**
   * Total polygon area: |sum of signed ring areas| — holes carry
   * opposite winding so they subtract, matching Polygon.getArea
   * (shapefile/Polygon.java:170).
   */
  def polygonArea(xs: Array[Double], ys: Array[Double],
                  parts: Array[Int]): Double = {
    var a = 0.0
    var p = 0
    while (p < parts.length) {
      val start = parts(p)
      val end = if (p + 1 < parts.length) parts(p + 1) else xs.length
      a += ringSignedArea(xs, ys, start, end)
      p += 1
    }
    math.abs(a)
  }

  /** Total perimeter over all parts (shapefile/Polygon.java:177). */
  def polygonPerimeter(xs: Array[Double], ys: Array[Double],
                       parts: Array[Int]): Double = {
    var len = 0.0
    var p = 0
    while (p < parts.length) {
      val start = parts(p)
      val end = if (p + 1 < parts.length) parts(p + 1) else xs.length
      var i = start
      var j = end - 1
      while (i < end) {
        val dx = xs(i) - xs(j)
        val dy = ys(i) - ys(j)
        len += math.sqrt(dx * dx + dy * dy)
        j = i
        i += 1
      }
      p += 1
    }
    len
  }

  /** Squared planar distance. */
  @inline def dist2(x1: Double, y1: Double, x2: Double,
                    y2: Double): Double = {
    val dx = x2 - x1
    val dy = y2 - y1
    dx * dx + dy * dy
  }

  /**
   * Is the ring (one part, CW per shapefile convention for outers,
   * reversed for holes) clockwise? Negative shoelace area == CW under
   * y-up axes — the convention of whitebox.utilities.Topology:33-233.
   */
  def isClockwise(xs: Array[Double], ys: Array[Double], start: Int,
                  end: Int): Boolean =
    ringSignedArea(xs, ys, start, end) < 0.0
}
