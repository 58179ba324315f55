package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.CellIndex
import graft.expr.GeoFunctions._

/**
 * Cell-keyed spatial joins — the Spark-native re-expression of the
 * reference's spatial lookup patterns (SURVEY.md §2.3):
 *
 *  - [[pipJoin]]: point-in-polygon overlay join — replaces the nested
 *    loop + DE-9IM of
 *    VectorTools/src/plugins/IsolateVectorFeaturesByLocation.java:360-611
 *    with a broadcast cell-cover equi-join plus an exact ray-cast
 *    residual predicate;
 *  - [[distanceJoin]]: distance-within theta join via k-ring expansion
 *    (`isWithinDistance`, IsolateVectorFeaturesByLocation.java:779);
 *  - [[knnJoin]]: exact k-nearest-neighbour join via iterative-
 *    deepening k-ring + distance-bounded window rank — the distributed
 *    mirror of KdTree.nearestNeighbor's heap search
 *    (WhiteboxAPI/src/whitebox/structures/KdTree.java:339-430).
 *
 * All joins key both sides by the deterministic cell index
 * (graft.core.CellIndex), so at cluster scale they run as hash
 * shuffles on cell ids with AQE skew-splitting; the polygon side of
 * the PIP join is broadcast (small-dim assumption, matching the
 * reference where zone layers are small relative to the page table).
 */
object SpatialJoins {

  /**
   * Points × polygon zones, inner join on containment.
   *
   * `points` must carry (`xCol`, `yCol`); `zones` must carry
   * (xs: Array[Double], ys: Array[Double], parts: Array[Int],
   * min_x, min_y, max_x, max_y). Each zone is exploded over the cells
   * covering its bbox at `res` and broadcast; points join on their
   * single containing cell; the exact even-odd PIP runs only on cell
   * matches (bbox pretest folded in, Clip.java:281 analogue).
   *
   * Output: all point columns + zone columns minus geometry arrays.
   */
  def pipJoin(points: DataFrame, zones: DataFrame, res: Int,
              xCol: String = "x", yCol: String = "y"): DataFrame = {
    val zoneCells = zones
      .withColumn("__cell", explode(cover_bbox(
        col("min_x"), col("min_y"), col("max_x"), col("max_y"), lit(res))))
    val pts = points.withColumn("__cell",
      latlng_to_cell(col(yCol), col(xCol), lit(res)))
    val px = pts(xCol)
    val py = pts(yCol)
    pts.join(broadcast(zoneCells), Seq("__cell"), "inner")
      .where(px >= col("min_x") && px <= col("max_x") &&
             py >= col("min_y") && py <= col("max_y") &&
             pip_contains(px, py, col("xs"), col("ys"), col("parts")))
      .drop("__cell", "xs", "ys", "parts",
        "min_x", "min_y", "max_x", "max_y")
  }

  /** Coarsest resolution whose cell extent is >= `radius` but still
    * >= minRes; keeps the k-ring fanout at ~9 cells per probe. */
  def resForRadius(radius: Double, maxRes: Int = CellIndex.DefaultRes): Int = {
    var r = maxRes
    while (r > 0 && CellIndex.cellHeightDeg(r) < radius) r -= 1
    r
  }

  /**
   * All (left, right) pairs within planar distance `radius`.
   * Executed as: key right rows by their cell at an adaptive
   * resolution, explode left rows over the k-ring that guarantees
   * covering `radius`, hash-join on cell id, exact distance filter.
   *
   * Columns: both frames need (`xCol`,`yCol`); output = left columns +
   * right columns (caller disambiguates names beforehand) + `dist2`.
   */
  def distanceJoin(left: DataFrame, right: DataFrame, radius: Double,
                   lx: String = "x", ly: String = "y",
                   rx: String = "rx", ry: String = "ry"): DataFrame = {
    val res = resForRadius(radius)
    val k = CellIndex.ringsForRadius(res, radius) - 1
    val l = left.withColumn("__cell", explode(k_ring(
      latlng_to_cell(col(ly), col(lx), lit(res)), lit(k))))
    val r = right.withColumn("__cell",
      latlng_to_cell(col(ry), col(rx), lit(res)))
    val d2 = (col(lx) - col(rx)) * (col(lx) - col(rx)) +
             (col(ly) - col(ry)) * (col(ly) - col(ry))
    l.join(r, Seq("__cell"), "inner")
      .where(d2 <= lit(radius * radius))
      .drop("__cell")
      .withColumn("dist2", d2)
  }

  /**
   * Exact kNN join: for each probe row the `k` nearest build rows by
   * planar distance, ties broken by build id ascending (deterministic,
   * mirroring ResultHeap's stable ordering, KdTree.java:918-986).
   *
   * Iterative deepening: start with ring `k0`, keep only probes whose
   * k-th neighbour distance is within the ring-guarantee radius
   * (CellIndex.kRingGuaranteeDeg) — those results are provably exact —
   * and double the ring for the rest until all probes resolve or the
   * ring covers the domain.
   *
   * probe: (probeIdCol, x, y); build: (buildIdCol, rx, ry).
   * Output: probeId, buildId, rnk (1..k), dist2.
   */
  /** Density-aware resolution: coarse enough that the k0-ring of a
    * probe is expected to hold ~2k build points, so most probes
    * resolve in the first round (the kd-tree's implicit locality,
    * chosen explicitly here). */
  def resForKnn(buildCount: Long, kNeighbors: Int): Int = {
    val targetCells = math.max(1.0, 25.0 * buildCount / (2.0 * kNeighbors))
    val r = ((math.log(targetCells) / math.log(2.0) - 1) / 2).toInt
    math.max(2, math.min(r, CellIndex.DefaultRes))
  }

  def knnJoin(probe: DataFrame, build: DataFrame, kNeighbors: Int,
              res0: Int = -1, probeId: String = "probe_id",
              buildId: String = "build_id",
              px: String = "x", py: String = "y",
              bx: String = "rx", by: String = "ry",
              k0: Int = 2): DataFrame = {
    val spark = probe.sparkSession
    val res = if (res0 > 0) res0 else resForKnn(build.count(), kNeighbors)
    val maxRing = (CellIndex.latBins(res) / 2 + 1).toInt
    val b = build.select(col(buildId), col(bx), col(by))
      .withColumn("__cell", latlng_to_cell(col(by), col(bx), lit(res)))
    val d2 = (col(px) - col(bx)) * (col(px) - col(bx)) +
             (col(py) - col(by)) * (col(py) - col(by))
    val w = Window.partitionBy(probeId).orderBy(col("dist2").asc,
      col(buildId).asc)

    // Each round materializes its outputs (localCheckpoint truncates
    // lineage) — without this the pending-probe plan embeds the prior
    // round's join twice per level and grows exponentially.
    var pending = probe.select(col(probeId), col(px), col(py))
      .localCheckpoint(true)
    var acc: DataFrame = null
    var ring = k0
    var done = false
    while (!done) {
      val exact = ring >= maxRing
      val guarantee = CellIndex.kRingGuaranteeDeg(res, ring)
      val g2 = guarantee * guarantee
      val cand = pending
        .withColumn("__cell", explode(k_ring(
          latlng_to_cell(col(py), col(px), lit(res)), lit(ring))))
        .join(b, Seq("__cell"), "inner")
        .withColumn("dist2", d2)
        .withColumn("rnk", row_number().over(w).cast("long"))
        .where(col("rnk") <= kNeighbors)
      // A probe's top-k is exact iff it found k neighbours all within
      // the guarantee radius (or the ring already spans the domain).
      val kth = cand.groupBy(col(probeId).as("__pid"))
        .agg(count(lit(1)).as("__n"), max(col("dist2")).as("__maxd2"))
        .withColumn("__ok",
          if (exact) lit(true)
          else col("__n") === kNeighbors && col("__maxd2") <= lit(g2))
      val joined = cand.join(kth,
        cand(probeId) === kth("__pid"), "inner")
      // resolved stays lazy: it re-derives from the checkpointed
      // `pending`, so consuming `acc` later costs one pass per round
      // with no lineage blow-up and no extra materialisation job here.
      val resolved = joined.where(col("__ok"))
        .select(col(probeId), col(buildId), col("rnk"), col("dist2"))
      acc = if (acc == null) resolved else acc.unionByName(resolved)
      if (exact) {
        done = true
      } else {
        val unresolvedIds = kth.where(!col("__ok")).select(col("__pid"))
        val stillPending = pending.join(unresolvedIds,
          pending(probeId) === col("__pid"), "left_semi")
        // Probes with zero candidates never appear in `kth`; keep them.
        val noCand = pending.join(kth,
          pending(probeId) === col("__pid"), "left_anti")
        pending = stillPending.unionByName(noCand).localCheckpoint(true)
        done = pending.isEmpty
      }
      ring = math.min(ring * 2, maxRing)
    }
    acc
  }
}
