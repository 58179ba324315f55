package graft.expr

import org.apache.spark.sql.catalyst.util.ArrayData

import graft.core.{CellIndex, Geo}

/**
 * Static evaluation helpers shared by interpreted eval and generated
 * code. Methods that take [[ArrayData]] operate on Tungsten arrays
 * in-place (no copy), which keeps the PIP join's inner predicate
 * allocation-free inside whole-stage codegen.
 */
object GeoEval {

  /** Even-odd ray-cast PIP over ArrayData (see Geo.pipContains). */
  def pipContains(x: Double, y: Double, xs: ArrayData, ys: ArrayData,
                  parts: ArrayData): Boolean = {
    var inside = false
    var p = 0
    val nParts = parts.numElements()
    val n = xs.numElements()
    while (p < nParts) {
      val start = parts.getInt(p)
      val end = if (p + 1 < nParts) parts.getInt(p + 1) else n
      var i = start
      var j = end - 1
      while (i < end) {
        val yi = ys.getDouble(i); val yj = ys.getDouble(j)
        if ((yi > y) != (yj > y)) {
          val xi = xs.getDouble(i); val xj = xs.getDouble(j)
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

  def kRing(cell: Long, k: Int): ArrayData =
    ArrayData.toArrayData(CellIndex.kRing(cell, k))

  def coverBBox(minLon: Double, minLat: Double, maxLon: Double,
                maxLat: Double, res: Int): ArrayData =
    ArrayData.toArrayData(
      CellIndex.coverBBox(minLon, minLat, maxLon, maxLat, res))

  def polygonArea(xs: ArrayData, ys: ArrayData, parts: ArrayData): Double =
    Geo.polygonArea(xs.toDoubleArray(), ys.toDoubleArray(),
      parts.toIntArray())

  def polygonPerimeter(xs: ArrayData, ys: ArrayData,
                       parts: ArrayData): Double =
    Geo.polygonPerimeter(xs.toDoubleArray(), ys.toDoubleArray(),
      parts.toIntArray())

  def bufferPointArea(x: Double, y: Double, dist: Double): Double =
    graft.core.Jts.bufferPointArea(x, y, dist)

  /** Sequential-fold dot product over float arrays: products widened
    * to double, accumulated in index order — bit-identical to
    * `aggregate(zip_with(a, b, _*_), 0d, _+_)` and to DuckDB's
    * `list_dot_product` on DOUBLE[], but with zero per-row allocation
    * (reads Tungsten arrays in place). */
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  /**
   * Random-hyperplane LSH band keys in one pass — the codegen'd twin
   * of the `transform(sequence, aggregate(...))` HOF fold it replaces
   * in Similarity.cosineNearDupPairs (BENCH_r03's slowest query was
   * exactly that interpreted fold). Bit-exact semantics:
   *   sig(h)     = sum_i round(arr_i * 1000) *
   *                (((h+1)*73856093 + (i+1)*19349663) % 95 - 47)
   *   bandKey(b) = sum_{j < bandBits} (sig(b*bandBits + j) > 0) << j
   * where round is Spark's Round(HALF_UP via BigDecimal.valueOf) then
   * long cast — matching both the old HOF form and the DuckDB oracle.
   */
  def sigBands(arr: ArrayData, nPlanes: Int, bandBits: Int): ArrayData = {
    val d = arr.numElements()
    val q = new Array[Long](d)
    var i = 0
    while (i < d) {
      q(i) = java.math.BigDecimal.valueOf(arr.getDouble(i) * 1000.0)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
      i += 1
    }
    val keys = new Array[Long](nPlanes / bandBits)
    var h = 0
    while (h < nPlanes) {
      var s = 0L
      var j = 0
      while (j < d) {
        s += q(j) * (((h + 1).toLong * 73856093L +
          (j + 1).toLong * 19349663L) % 95L - 47L)
        j += 1
      }
      if (s > 0L) keys(h / bandBits) |= 1L << (h % bandBits)
      h += 1
    }
    ArrayData.toArrayData(keys)
  }

  /** Double-array variant of [[dotF]]. */
  def dotD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  def clipAreaWithRect(xs: ArrayData, ys: ArrayData, parts: ArrayData,
                       minX: Double, minY: Double, maxX: Double,
                       maxY: Double): Double =
    graft.core.Jts.clipAreaWithRect(xs.toDoubleArray(),
      ys.toDoubleArray(), parts.toIntArray(), minX, minY, maxX, maxY)

  /** DE-9IM predicate codes for [[stPred]] (the reference's predicate
    * menu, IsolateVectorFeaturesByLocation.java:240-262). */
  val PredIntersects = 0
  val PredWithin = 1
  val PredContains = 2
  val PredCovers = 3
  val PredCoveredBy = 4
  val PredTouches = 5
  val PredCrosses = 6
  val PredOverlaps = 7
  val PredEquals = 8

  def stPred(op: Int, xsA: ArrayData, ysA: ArrayData, partsA: ArrayData,
             xsB: ArrayData, ysB: ArrayData, partsB: ArrayData): Boolean = {
    val a = graft.core.Jts.toGeometry(xsA.toDoubleArray(),
      ysA.toDoubleArray(), partsA.toIntArray())
    val b = graft.core.Jts.toGeometry(xsB.toDoubleArray(),
      ysB.toDoubleArray(), partsB.toIntArray())
    op match {
      case PredIntersects => a.intersects(b)
      case PredWithin => a.within(b)
      case PredContains => a.contains(b)
      case PredCovers => a.covers(b)
      case PredCoveredBy => a.coveredBy(b)
      case PredTouches => a.touches(b)
      case PredCrosses => a.crosses(b)
      case PredOverlaps => a.overlaps(b)
      case PredEquals => a.equalsTopo(b)
      case other => throw new IllegalArgumentException(s"pred $other")
    }
  }

  /**
   * Binary overlay (op codes in Jts.Op*) of two ring/part geometries.
   * Returns a struct row (xs, ys, parts, area, minx, miny, maxx,
   * maxy) in shapefile winding, or null when the result has no
   * polygonal component (the reference's tools skip empty results).
   */
  def overlayGeom(op: Int, xsA: ArrayData, ysA: ArrayData,
                  partsA: ArrayData, xsB: ArrayData, ysB: ArrayData,
                  partsB: ArrayData)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val a = graft.core.Jts.toGeometry(xsA.toDoubleArray(),
      ysA.toDoubleArray(), partsA.toIntArray())
    val b = graft.core.Jts.toGeometry(xsB.toDoubleArray(),
      ysB.toDoubleArray(), partsB.toIntArray())
    val out = graft.core.Jts.overlay(op, a, b)
    if (out.isEmpty || out.getArea == 0.0) return null
    val (xs, ys, parts) = graft.core.Jts.toPartsArrays(out)
    val env = out.getEnvelopeInternal
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](ArrayData.toArrayData(xs), ArrayData.toArrayData(ys),
        ArrayData.toArrayData(parts), out.getArea,
        env.getMinX, env.getMinY, env.getMaxX, env.getMaxY))
  }
}
