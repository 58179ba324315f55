package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Raster operators over the cell-relational form (r: Long, c: Long,
 * v: Double) — the engine's mapping of WhiteboxRaster grids
 * (SURVEY.md §1.1). Each function is one reference tool re-expressed
 * as a declarative Spark transform; NoData is represented as absent
 * rows (sparse relational form), which matches the reference's
 * `if (z != noData)` guard pattern without sentinel arithmetic.
 *
 * Scale note: every operator here shuffles only on (r, c)-derived
 * keys, so at cluster scale the grid partitions by row-block ranges
 * (repartitionByRange on r) exactly like the reference's row-ordered
 * priority-queue writes (VectorPolygonsToRaster.java:346-360).
 */
object Raster {

  /**
   * VectorPointsToRaster (ConversionTools, :315-473): bin points into
   * cells with every assignment rule at once — minimum / maximum /
   * sum / count / first / last (deterministic by an explicit order
   * key, min_by/max_by, per SURVEY.md §2.12 note).
   * Input needs (binR, binC, value, orderKey) columns.
   */
  def rasterizePoints(points: DataFrame, binR: Column, binC: Column,
                      value: Column, orderKey: Column): DataFrame =
    points.groupBy(binR.as("r"), binC.as("c")).agg(
      count(lit(1)).as("n"),
      min(value).as("vmin"),
      max(value).as("vmax"),
      sum(round(value * 100).cast("long")).as("sum_cents"),
      min_by(value, orderKey).as("vfirst"),
      max_by(value, orderKey).as("vlast"))

  /**
   * ExtractStatistics (StatsTools:209-443) zonal statistics: value
   * column grouped by zone id — average/min/max/range/total(+count).
   * stddev omitted from the exact contract (float-algorithm
   * divergence across engines); it is available via stddev_samp.
   */
  def zonalStats(cells: DataFrame, zone: Column,
                 value: Column): DataFrame =
    cells.groupBy(zone.as("zone")).agg(
      count(lit(1)).as("n"),
      min(value).as("vmin"),
      max(value).as("vmax"),
      (max(value) - min(value)).as("vrange"),
      sum(round(value * 100).cast("long")).as("sum_cents"))

  /**
   * FilterMean (ImageProcessingTools, FilterMean.java:272-284): mean
   * over the in-grid (non-NoData) n x n neighbourhood. Expressed as a
   * scatter: each cell contributes to its 9 targets, then the
   * aggregate keeps only targets that exist in the grid (matching the
   * reference: out-of-grid reads return NoData and are skipped).
   */
  def focalMean(grid: DataFrame, radius: Int = 1): DataFrame =
    // delegates to the generic focal engine (no reflection = the
    // skip-NoData semantics this operator always had); requires
    // non-negative cell coordinates
    Focal.filterMean(grid, radius, reflect = false,
      Long.MaxValue / 4, Long.MaxValue / 4)

  /**
   * Slope (TerrainAnalysisTools/Slope.java:218-258): Horn's finite
   * differences on the 8-neighbourhood; edges reflected like the
   * reference (Slope.java:223 isReflectedAtEdges = true), unresolved
   * reads take the centre value (NoData-substitution at :250).
   * Emitted in radians (atan of rise/run), gridRes = 1. One-shuffle
   * stencil via the shared scatter gather.
   */
  def hornSlope(grid: DataFrame, nRows: Long, nCols: Long): DataFrame = {
    val df = Terrain.gatherNeighbors(grid, reflect = true, nRows, nCols)
    val withN = (0 until 8).foldLeft(df) { (d, i) =>
      d.withColumn(s"m$i", coalesce(col(s"n$i"), col("v")))
    }
    withN.select(col("r"), col("c"),
      round(expr(
        "atan(sqrt(((m2 - m4 + 2 * (m1 - m5) + m0 - m6) / 8.0) * " +
          "((m2 - m4 + 2 * (m1 - m5) + m0 - m6) / 8.0) + " +
          "((m6 - m4 + 2 * (m7 - m3) + m0 - m2) / 8.0) * " +
          "((m6 - m4 + 2 * (m7 - m3) + m0 - m2) / 8.0)))"), 6)
        .as("slope_rad"))
  }

  /**
   * InterpolationIDW (RasterCreation/InterpolationIDW.java:483-565):
   * inverse-distance-squared weights within `radius` of each target
   * cell; exact hits (d2 == 0) short-circuit to the point value
   * (:545-552, deterministic via min point id). Targets with no point
   * in range are NoData (absent), matching the reference.
   * targets: (r, c, x, y); points: (pid, px, py, pval).
   */
  def idw(targets: DataFrame, points: DataFrame,
          radius: Double): DataFrame = {
    val joined = SpatialJoins.distanceJoin(targets, points, radius,
      lx = "x", ly = "y", rx = "px", ry = "py")
    joined.groupBy("r", "c").agg(
      round(
        when(max(when(col("dist2") === 0, 1).otherwise(0)) === 1,
          min_by(col("pval"), when(col("dist2") === 0, col("pid"))
            .otherwise(lit(Long.MaxValue))))
          .otherwise(
            sum(when(col("dist2") =!= 0, col("pval") / col("dist2"))) /
              sum(when(col("dist2") =!= 0, lit(1.0) / col("dist2")))),
          6).as("idw"))
  }

  /**
   * Reclass (GISTools/Reclass.java): assign-new-value range table as
   * a when/otherwise chain. ranges: (from, toExcl, newVal).
   */
  def reclass(value: Column,
              ranges: Seq[(Double, Double, Double)]): Column =
    ranges.foldLeft(lit(Double.NaN)) { case (acc, (lo, hi, nv)) =>
      when(value >= lo && value < hi, nv).otherwise(acc)
    }

  /**
   * Aggregate (RasterCreation/Aggregate.java:190-270): block
   * downscale by integer factors with mean/min/max/count.
   */
  def blockAggregate(grid: DataFrame, fr: Int, fc: Int): DataFrame =
    grid.groupBy(expr(s"r DIV $fr").as("br"), expr(s"c DIV $fc").as("bc"))
      .agg(count(lit(1)).as("n"), min(col("v")).as("vmin"),
        max(col("v")).as("vmax"), round(avg(col("v")), 6).as("vavg"))

  /**
   * VectorPolygonsToRaster (ConversionTools, :395-443 scanline
   * even-odd fill; holes carved by parity :449-530): rasterize
   * polygons onto the lat/lon bin lattice at `res`. Distributed per
   * polygon: a flatMap walks the rows of the polygon's bbox, finds
   * the even-odd edge crossings at the row's center latitude, and
   * emits the cells whose center longitude falls inside a crossing
   * pair — exactly the cell-center parity semantics of the
   * reference's scanline (rows at cell centers, isBetween + linear
   * interpolation xPrime).
   *
   * polys: (poly_id: Int, xs, ys, parts). Output (lat_bin, lon_bin,
   * poly_id); overlaps resolved by max poly_id (record order rule).
   */
  def rasterizePolygons(polys: DataFrame, res: Int): DataFrame = {
    val spark = polys.sparkSession
    import spark.implicits._
    val nLat = graft.core.CellIndex.latBins(res)
    val nLon = graft.core.CellIndex.lonBins(res)
    val hDeg = 180.0 / nLat
    val wDeg = 360.0 / nLon
    polys.select(col("poly_id"), col("xs"), col("ys"), col("parts"))
      .as[(Int, Seq[Double], Seq[Double], Seq[Int])]
      .flatMap { case (pid, xsS, ysS, partsS) =>
        val xs = xsS.toArray
        val ys = ysS.toArray
        val parts = partsS.toArray
        val minLat = ys.min; val maxLat = ys.max
        val minLon = xs.min; val maxLon = xs.max
        val rb0 = graft.core.CellIndex.latBin(minLat, res)
        val rb1 = graft.core.CellIndex.latBin(maxLat, res)
        (rb0 to rb1).iterator.flatMap { rb =>
          val cy = -90.0 + (rb + 0.5) * hDeg
          // even-odd crossings of the horizontal line y = cy
          val crossings = scala.collection.mutable.ArrayBuffer[Double]()
          var p = 0
          while (p < parts.length) {
            val start = parts(p)
            val end = if (p + 1 < parts.length) parts(p + 1) else xs.length
            var i = start
            var j = end - 1
            while (i < end) {
              val yi = ys(i); val yj = ys(j)
              if ((yi > cy) != (yj > cy)) {
                crossings += (xs(j) - xs(i)) * (cy - yi) / (yj - yi) + xs(i)
              }
              j = i; i += 1
            }
            p += 1
          }
          val sorted = crossings.sorted
          sorted.grouped(2).flatMap { pair =>
            if (pair.length < 2) Iterator.empty
            else {
              val xa: Double = pair(0)
              val xb: Double = pair(1)
              // cells whose center lon lies in (xa, xb)
              val c0 = math.ceil((xa + 180.0) / wDeg - 0.5).toLong
              val c1 = math.floor((xb + 180.0) / wDeg - 0.5).toLong
              (math.max(c0, 0L) to math.min(c1, nLon - 1)).iterator
                .map(cb => (rb, cb, pid))
            }
          }
        }
      }.toDF("lat_bin", "lon_bin", "poly_id")
      .groupBy("lat_bin", "lon_bin")
      .agg(max(col("poly_id")).as("poly_id"))
  }

  /**
   * Clump (WhiteboxAPI/algorithms/Clump.java:92-210): connected-
   * component labelling of a masked grid (8-connectivity), via
   * iterative min-label propagation over the adjacency self-join —
   * the distributed equivalent of the reference's flood fill +
   * equivalence merging loop. Label = min linearised cell id in the
   * component. Converges in O(diameter) rounds; each round is
   * materialised (localCheckpoint) to bound lineage.
   */
  def clump(mask: DataFrame, width: Long): DataFrame = {
    val spark = mask.sparkSession
    import spark.implicits._
    // scatter labels to the 9 neighbour positions -> equi-join shuffle
    // on (r, c), never a theta join (scales to arbitrary grids)
    val off = (-1 to 1).flatMap(dr => (-1 to 1).map(dc => (dr, dc)))
      .toDF("dr", "dc")
    var labels = mask.select(col("r"), col("c"),
      (col("r") * width + col("c")).as("lbl")).localCheckpoint(true)
    var changed = true
    while (changed) {
      val scattered = labels.crossJoin(broadcast(off))
        .select((col("r") + col("dr")).as("r"),
          (col("c") + col("dc")).as("c"), col("lbl"))
      val nbMin = scattered.groupBy("r", "c")
        .agg(min(col("lbl")).as("nbl"))
      val next = labels.join(nbMin, Seq("r", "c"), "inner")
      val improved = next.where(col("nbl") < col("lbl")).count()
      labels = next.select(col("r"), col("c"),
        least(col("lbl"), col("nbl")).as("lbl")).localCheckpoint(true)
      changed = improved > 0
    }
    labels.withColumnRenamed("lbl", "comp_id")
  }
}
