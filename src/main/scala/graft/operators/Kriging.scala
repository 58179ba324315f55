package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Ordinary kriging interpolation (reference: whitebox.stats.Kriging,
 * stats/Kriging.java:82-117 + KrigingInterpolation.groovy): estimate
 * each target as the BLUE weighted sum of its k nearest samples,
 * weights from the ordinary-kriging system over a spherical
 * semivariogram with fixed (nugget, partial sill, range) — the model
 * parameters are tool options here, as in the reference's dialog.
 *
 * Scale design: neighbour search is the engine's exact distributed
 * kNN join (cell-keyed iterative deepening — SpatialJoins.knnJoin),
 * so sample lookup never all-pairs; the per-target (k+1)×(k+1) solve
 * runs executor-side inside one `mapGroups` pass (k is small and
 * fixed, the system solve is O(k³) per target — the same per-cell
 * cost profile as the reference's sequential loop, but embarrassingly
 * parallel over targets).
 *
 * [[krige2Closed]] is the k = 2 closed form (the 3×3 OK system
 * eliminates by symmetry: w1 = (1 - (γ1t - γ2t)/γ12)/2) used by the
 * SQL-mirrored oracle query — every operation is +,-,*,/ and sqrt, so
 * the result is bit-exact across engines.
 */
object Kriging {

  /** Spherical semivariogram γ(h) = c0 + c1·(1.5(h/a) − 0.5(h/a)³)
    * for h < a, else c0 + c1. (γ(0) := c0 here — the nugget applies
    * at all h > 0 and the formula is the deterministic contract; the
    * reference adds the same nugget discontinuity.) */
  def sphericalGamma(h: Column, c0: Double, c1: Double,
                     a: Double): Column =
    when(h >= a, lit(c0) + lit(c1))
      .otherwise(lit(c0) + lit(c1) *
        (lit(1.5) * (h / a) - lit(0.5) * (h / a) * (h / a) * (h / a)))

  private def sphericalGammaD(h: Double, c0: Double, c1: Double,
                              a: Double): Double =
    if (h >= a) c0 + c1
    else c0 + c1 * (1.5 * (h / a) - 0.5 * (h / a) * (h / a) * (h / a))

  /**
   * General ordinary kriging: `samples` (sid, sx, sy, sv), `targets`
   * (tid, tx, ty) -> (tid, est). Executor-side Gaussian elimination
   * with partial pivoting on the (k+1)-square OK system per target.
   */
  def ordinaryKriging(samples: DataFrame, targets: DataFrame, k: Int,
                      nugget: Double, psill: Double,
                      range: Double): DataFrame = {
    val spark = samples.sparkSession
    import spark.implicits._
    val nn = SpatialJoins.knnJoin(targets, samples, k,
      probeId = "tid", buildId = "sid",
      px = "tx", py = "ty", bx = "sx", by = "sy")
    val rows = nn
      .join(samples.select(col("sid"), col("sx"), col("sy"), col("sv")),
        Seq("sid"))
      .select(col("tid"), col("rnk"), col("sx"), col("sy"), col("sv"),
        col("dist2"))
      .as[(Long, Long, Double, Double, Double, Double)]
    rows.groupByKey(_._1).mapGroups { (tid, it) =>
      val ns = it.toArray.sortBy(_._2) // by rnk
      val m = ns.length
      // OK system: [Γ 1; 1ᵀ 0] [w; λ] = [γ_t; 1]
      val a = Array.ofDim[Double](m + 1, m + 2)
      for (i <- 0 until m) {
        for (j <- 0 until m) {
          val h = math.sqrt(
            (ns(i)._3 - ns(j)._3) * (ns(i)._3 - ns(j)._3) +
              (ns(i)._4 - ns(j)._4) * (ns(i)._4 - ns(j)._4))
          a(i)(j) = if (i == j) 0.0
            else sphericalGammaD(h, nugget, psill, range)
        }
        a(i)(m) = 1.0
        a(i)(m + 1) = sphericalGammaD(math.sqrt(ns(i)._6),
          nugget, psill, range)
      }
      for (j <- 0 until m) a(m)(j) = 1.0
      a(m)(m) = 0.0
      a(m)(m + 1) = 1.0
      // gaussian elimination, partial pivot
      val n = m + 1
      for (col0 <- 0 until n) {
        var piv = col0
        for (r2 <- col0 + 1 until n)
          if (math.abs(a(r2)(col0)) > math.abs(a(piv)(col0))) piv = r2
        val tmp = a(col0); a(col0) = a(piv); a(piv) = tmp
        for (r2 <- col0 + 1 until n) {
          val f = a(r2)(col0) / a(col0)(col0)
          for (c2 <- col0 to n) a(r2)(c2) -= f * a(col0)(c2)
        }
      }
      val x = new Array[Double](n)
      for (r2 <- n - 1 to 0 by -1) {
        var s = a(r2)(n)
        for (c2 <- r2 + 1 until n) s -= a(r2)(c2) * x(c2)
        x(r2) = s / a(r2)(r2)
      }
      var est = 0.0
      for (i <- 0 until m) est += x(i) * ns(i)._5
      (tid, est)
    }.toDF("tid", "est")
  }

  /**
   * k = 3 ordinary-kriging closed form over pivoted neighbour
   * columns (sx1..sv3, d21..d23): the 4x4 OK system [Γ 1; 1ᵀ 0]
   * reduced by the unit-sum constraint to a 2x2 solve — every
   * operation is +,-,*,/ and sqrt, so the estimate is bit-exact
   * against the SQL-mirrored oracle, and KrigingSpec pins it to
   * [[ordinaryKriging]]'s general partial-pivot solver within 1e-9.
   * This is the query-surface arm of the full n-neighbour system
   * (stats/Kriging.java:82-117) that [[krige2Closed]]'s 2-sample
   * special case under-exercised.
   */
  def krige3Closed(pv: DataFrame, nugget: Double, psill: Double,
                   range: Double): DataFrame = {
    def g(h: Column) = sphericalGamma(h, nugget, psill, range)
    def d(a: String, b: String) =
      (col(a) - col(b)) * (col(a) - col(b))
    val gt1 = g(sqrt(col("d21")))
    val gt2 = g(sqrt(col("d22")))
    val gt3 = g(sqrt(col("d23")))
    val g12 = g(sqrt(d("sx1", "sx2") + d("sy1", "sy2")))
    val g13 = g(sqrt(d("sx1", "sx3") + d("sy1", "sy3")))
    val g23 = g(sqrt(d("sx2", "sx3") + d("sy2", "sy3")))
    // (1)-(2) and (1)-(3) of the OK system with w3 = 1 - w1 - w2
    val a11 = -g12 - g13 + g23
    val a12 = g12 - g13 + g23
    val b1 = gt1 - gt2 - g13 + g23
    val a21 = lit(-2.0) * g13
    val a22 = g12 - g23 - g13
    val b2 = gt1 - gt3 - g13
    val det = a11 * a22 - a12 * a21
    val w1 = (b1 * a22 - b2 * a12) / det
    val w2 = (a11 * b2 - a21 * b1) / det
    val w3 = lit(1.0) - w1 - w2
    pv.withColumn("est",
      w1 * col("sv1") + w2 * col("sv2") + w3 * col("sv3"))
  }

  /**
   * Empirical semivariogram — the series PlotVariogram charts and
   * SemivariogramCurveFitter.java fits its models to (reference:
   * whitebox/stats/SemivariogramCurveFitterProblem.java): bin point
   * pairs by separation distance into `nBins` lags of width
   * `lagWidth`, γ(lag) = avg over pairs of 0.5·(z_i − z_j)².
   *
   * Scale design: pairs come from the cell-bucketed bounded-distance
   * join (only the 3×3 cell neighbourhood at the max-lag resolution
   * meets — never an all-pairs cross join), counted once via id
   * ordering. z arrives as a scaled long (`zq` = z·zScale) so the
   * per-lag squared-difference sum is an exact integer — order-free
   * and bit-identical across engines; at web scale swap the long for
   * a DECIMAL(38) sum before ~2^63/(Δzq²·pairs) overflows.
   *
   * `points`: (id, x, y, zq) -> (lag, n_pairs, gamma).
   */
  def empiricalVariogram(points: DataFrame, lagWidth: Double,
                         nBins: Int, zScale: Double): DataFrame = {
    val maxLag = lagWidth * nBins
    val r = points.select(col("id").as("rid"), col("x").as("rx"),
      col("y").as("ry"), col("zq").as("rzq"))
    SpatialJoins.distanceJoin(points, r, maxLag)
      .where(col("id") < col("rid"))
      .withColumn("lag", floor(sqrt(col("dist2")) / lagWidth))
      .where(col("lag") < nBins)
      .groupBy("lag")
      .agg(count(lit(1)).as("n_pairs"),
        sum((col("zq") - col("rzq")) * (col("zq") - col("rzq")))
          .as("__ss"))
      .select(col("lag"), col("n_pairs"),
        round(col("__ss").cast("double") /
          (lit(2.0) * col("n_pairs") * lit(zScale * zScale)), 6)
          .as("gamma"))
  }

  /**
   * k = 2 closed-form ordinary kriging used by the oracle query:
   * neighbour rank by (dist², sid); w1 = (1 − (γ1t − γ2t)/γ12)/2.
   * Input `nnPivot` must carry (sx1, sy1, sv1, d21, sx2, sy2, sv2,
   * d22); adds `est`.
   */
  def krige2Closed(nnPivot: DataFrame, nugget: Double, psill: Double,
                   range: Double): DataFrame = {
    val h1 = sqrt(col("d21"))
    val h2 = sqrt(col("d22"))
    val h12 = sqrt((col("sx1") - col("sx2")) * (col("sx1") - col("sx2")) +
      (col("sy1") - col("sy2")) * (col("sy1") - col("sy2")))
    val g1t = sphericalGamma(h1, nugget, psill, range)
    val g2t = sphericalGamma(h2, nugget, psill, range)
    val g12 = sphericalGamma(h12, nugget, psill, range)
    nnPivot.withColumn("__w1",
        (lit(1.0) - (g1t - g2t) / g12) / 2.0)
      .withColumn("est",
        col("__w1") * col("sv1") + (lit(1.0) - col("__w1")) * col("sv2"))
      .drop("__w1")
  }
}
