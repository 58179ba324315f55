package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Radial-basis-function interpolation (reference:
 * WhiteboxGIS/resources/plugins/Scripts/
 * RadialBasisFunctionInterpolation.groovy:556-640): weights solve the
 * N×N system Φw = v with Φ_ij = φ(‖s_i − s_j‖², R2), then every
 * target evaluates Σ w_i · φ(‖t − s_i‖², R2). NOTE the reference
 * passes the SQUARED distance as φ's argument (norm = dx²+dy² feeds
 * RBFMultiquadradic etc. unrooted) — mirrored here.
 *
 * Scale design: the sample table is the small side (the reference
 * itself solves one global dense system), so the solve runs once on
 * the driver over the collected samples — O(n³) for n samples, the
 * same cost centre as the reference's SVD — and the (x, y, w) arrays
 * broadcast. Evaluation is a map-side pass over targets: no shuffle,
 * embarrassingly parallel over any executor count. [[rbf3Closed]] is
 * the 3-sample Cramer closed form whose operation order the SQL
 * oracle mirrors token-for-token (bit-exact across engines);
 * [[interpolate]] is the general-n path, spec-tested against it.
 */
object Rbf {

  /** φ(d², r2) column forms (RadialBasisFunctionInterpolation.groovy:
    * 557-574; d is the squared distance, as the reference passes it). */
  def phiC(basis: String, d2: Column, r2: Double): Column =
    basis match {
      case "multiquadric" =>
        sqrt(lit(1.0) + (d2 / r2) * (d2 / r2))
      case "inverse multiquadric" =>
        lit(1.0) / sqrt(d2 + r2)
      case "gaussian" => exp(-(d2 / r2))
      case "thin plate spline" =>
        (d2 + r2) * (log(d2 + r2) / math.log(10))
      case "natural cubic spline" => pow(d2 + r2, 1.5)
      case other =>
        throw new IllegalArgumentException(s"unknown basis: $other")
    }

  private def phiD(basis: String, d2: Double, r2: Double): Double =
    basis match {
      case "multiquadric" => math.sqrt(1.0 + (d2 / r2) * (d2 / r2))
      case "inverse multiquadric" => 1.0 / math.sqrt(d2 + r2)
      case "gaussian" => math.exp(-(d2 / r2))
      case "thin plate spline" =>
        (d2 + r2) * (math.log(d2 + r2) / math.log(10))
      case "natural cubic spline" => math.pow(d2 + r2, 1.5)
      case other =>
        throw new IllegalArgumentException(s"unknown basis: $other")
    }

  /** Dense solve, Gaussian elimination with partial pivoting (same
    * kernel as [[Kriging.ordinaryKriging]]'s per-target solve). */
  private[operators] def solve(a: Array[Array[Double]],
                               b: Array[Double]): Array[Double] = {
    val n = b.length
    val m = Array.tabulate(n)(i => a(i) :+ b(i))
    for (c0 <- 0 until n) {
      var piv = c0
      for (r2 <- c0 + 1 until n)
        if (math.abs(m(r2)(c0)) > math.abs(m(piv)(c0))) piv = r2
      val t = m(c0); m(c0) = m(piv); m(piv) = t
      for (r2 <- c0 + 1 until n) {
        val f = m(r2)(c0) / m(c0)(c0)
        for (c2 <- c0 to n) m(r2)(c2) -= f * m(c0)(c2)
      }
    }
    val x = new Array[Double](n)
    for (r2 <- n - 1 to 0 by -1) {
      var s = m(r2)(n)
      for (c2 <- r2 + 1 until n) s -= m(r2)(c2) * x(c2)
      x(r2) = s / m(r2)(r2)
    }
    x
  }

  /**
   * General-n RBF: `samples` (sid, sx, sy, sv) -> driver solve;
   * `targets` (tid, tx, ty) -> (tid, est) map-side. The weighted sum
   * runs in ascending-sid order (a fixed fold order, so results are
   * reproducible run-to-run regardless of partitioning).
   */
  def interpolate(samples: DataFrame, targets: DataFrame,
                  basis: String, r2: Double): DataFrame = {
    val spark = samples.sparkSession
    import spark.implicits._
    val smp = samples.select(col("sid"), col("sx"), col("sy"),
        col("sv"))
      .as[(Long, Double, Double, Double)].collect().sortBy(_._1)
    val n = smp.length
    val a = Array.tabulate(n, n) { (i, j) =>
      val dx = smp(i)._2 - smp(j)._2
      val dy = smp(i)._3 - smp(j)._3
      phiD(basis, dx * dx + dy * dy, r2)
    }
    val w = solve(a, smp.map(_._4))
    val bc = spark.sparkContext.broadcast(
      (smp.map(_._2), smp.map(_._3), w))
    targets.select(col("tid"), col("tx"), col("ty"))
      .as[(Long, Double, Double)]
      .map { case (tid, tx, ty) =>
        val (xs, ys, ws) = bc.value
        var est = 0.0
        var i = 0
        while (i < xs.length) {
          val dx = tx - xs(i); val dy = ty - ys(i)
          est += ws(i) * phiD(basis, dx * dx + dy * dy, r2)
          i += 1
        }
        (tid, est)
      }.toDF("tid", "est")
  }

  /**
   * 3-sample closed form: Cramer's rule on the symmetric 3×3 system
   * (unit diagonal only for bases with φ(0)=1; the general diagonal
   * φ(0, r2) is used). Input: one pivoted row per target carrying
   * (sx1, sy1, sv1, d21, …, sx3, sy3, sv3, d23); adds `est`. Every
   * operation is +,-,*,/,sqrt in a fixed order — the SQL oracle
   * mirrors it exactly.
   */
  def rbf3Closed(pv: DataFrame, basis: String, r2: Double): DataFrame = {
    def d2(xa: String, ya: String, xb: String, yb: String): Column =
      (col(xa) - col(xb)) * (col(xa) - col(xb)) +
        (col(ya) - col(yb)) * (col(ya) - col(yb))
    val p0 = phiC(basis, lit(0.0), r2)
    val a12 = phiC(basis, d2("sx1", "sy1", "sx2", "sy2"), r2)
    val a13 = phiC(basis, d2("sx1", "sy1", "sx3", "sy3"), r2)
    val a23 = phiC(basis, d2("sx2", "sy2", "sx3", "sy3"), r2)
    val p1 = phiC(basis, col("d21"), r2)
    val p2 = phiC(basis, col("d22"), r2)
    val p3 = phiC(basis, col("d23"), r2)
    pv.withColumn("__a12", a12).withColumn("__a13", a13)
      .withColumn("__a23", a23).withColumn("__p0", p0)
      .withColumn("__det",
        col("__p0") * (col("__p0") * col("__p0") - col("__a23") * col("__a23")) -
          col("__a12") * (col("__a12") * col("__p0") - col("__a23") * col("__a13")) +
          col("__a13") * (col("__a12") * col("__a23") - col("__p0") * col("__a13")))
      .withColumn("__w1",
        (col("sv1") * (col("__p0") * col("__p0") - col("__a23") * col("__a23")) -
          col("__a12") * (col("sv2") * col("__p0") - col("__a23") * col("sv3")) +
          col("__a13") * (col("sv2") * col("__a23") - col("__p0") * col("sv3"))) /
          col("__det"))
      .withColumn("__w2",
        (col("__p0") * (col("sv2") * col("__p0") - col("__a23") * col("sv3")) -
          col("sv1") * (col("__a12") * col("__p0") - col("__a23") * col("__a13")) +
          col("__a13") * (col("__a12") * col("sv3") - col("sv2") * col("__a13"))) /
          col("__det"))
      .withColumn("__w3",
        (col("__p0") * (col("__p0") * col("sv3") - col("sv2") * col("__a23")) -
          col("__a12") * (col("__a12") * col("sv3") - col("sv2") * col("__a13")) +
          col("sv1") * (col("__a12") * col("__a23") - col("__p0") * col("__a13"))) /
          col("__det"))
      .withColumn("est",
        col("__w1") * p1 + col("__w2") * p2 + col("__w3") * p3)
      .drop("__a12", "__a13", "__a23", "__p0", "__det",
        "__w1", "__w2", "__w3")
  }
}

/**
 * Local polynomial interpolation (reference tool
 * LocalPolynomialInterpolation.java — shipped in source_files but
 * disabled; fitting basis whitebox.stats.
 * PolynomialLeastSquares2DFitting with polyOrder 1): each target fits
 * a first-order surface z = a + b·x + c·y to its k nearest samples
 * and evaluates it at the target.
 *
 * Scale design mirrors [[Kriging.ordinaryKriging]]: neighbour lookup
 * is the distributed cell-keyed kNN join (never all-pairs), the tiny
 * k×3 normal-equation solve runs executor-side per target.
 * [[plane3Closed]] is the k = 3 exact-plane Cramer form (3 points, 3
 * coefficients — least squares degenerates to interpolation) used by
 * the SQL-mirrored oracle; collinear triples (|det| < 1e-9) fall back
 * to the rank-1 neighbour's value, identically in both engines.
 */
object LocalPoly {

  /** General k: least-squares order-1 fit via 3×3 normal equations
    * per target, executor-side. `samples` (sid, sx, sy, sv),
    * `targets` (tid, tx, ty) -> (tid, est). */
  def interpolate(samples: DataFrame, targets: DataFrame,
                  k: Int): DataFrame = {
    val spark = samples.sparkSession
    import spark.implicits._
    val nn = SpatialJoins.knnJoin(targets, samples, k,
      probeId = "tid", buildId = "sid",
      px = "tx", py = "ty", bx = "sx", by = "sy")
    val rows = nn
      .join(samples.select(col("sid"), col("sx"), col("sy"), col("sv")),
        Seq("sid"))
      .join(targets, Seq("tid"))
      .select(col("tid"), col("rnk"), col("sx"), col("sy"), col("sv"),
        col("tx"), col("ty"))
      .as[(Long, Long, Double, Double, Double, Double, Double)]
    rows.groupByKey(_._1).mapGroups { (tid, it) =>
      val ns = it.toArray.sortBy(_._2)
      val (tx, ty) = (ns.head._6, ns.head._7)
      // normal equations XᵀX β = Xᵀz for X rows (1, x, y)
      var s1, sx, sy, sxx, sxy, syy, sz, sxz, syz = 0.0
      ns.foreach { case (_, _, x, y, z, _, _) =>
        s1 += 1; sx += x; sy += y
        sxx += x * x; sxy += x * y; syy += y * y
        sz += z; sxz += x * z; syz += y * z
      }
      val a = Array(Array(s1, sx, sy), Array(sx, sxx, sxy),
        Array(sy, sxy, syy))
      val beta = Rbf.solve(a, Array(sz, sxz, syz))
      (tid, beta(0) + beta(1) * tx + beta(2) * ty)
    }.toDF("tid", "est")
  }

  /** k = 3 exact plane through the three neighbours (Cramer, fixed
    * operation order — SQL-mirrored). Input pivot carries
    * (sx1..3, sy1..3, sv1..3) plus (tx, ty); adds `est`. */
  def plane3Closed(pv: DataFrame): DataFrame = {
    val det =
      (col("sx2") - col("sx1")) * (col("sy3") - col("sy1")) -
        (col("sx3") - col("sx1")) * (col("sy2") - col("sy1"))
    val b =
      ((col("sv2") - col("sv1")) * (col("sy3") - col("sy1")) -
        (col("sv3") - col("sv1")) * (col("sy2") - col("sy1"))) / det
    val c =
      ((col("sx2") - col("sx1")) * (col("sv3") - col("sv1")) -
        (col("sx3") - col("sx1")) * (col("sv2") - col("sv1"))) / det
    pv.withColumn("est",
      when(abs(det) < 1e-9, col("sv1"))
        .otherwise(col("sv1") + b * (col("tx") - col("sx1")) +
          c * (col("ty") - col("sy1"))))
  }
}
