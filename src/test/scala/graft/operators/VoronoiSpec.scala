package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Geometry checks for the Thiessen polygon output
  * (VoronoiDiagram.java semantics): per-cell containment,
  * nearest-site correctness at cell vertices, exact tiling of the
  * clip envelope, and agreement with the Delaunay dual. */
class VoronoiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val dir = "/root/testdata/sf0.001"

  private def pts = Derived.supplierPoints(spark, dir)
    .where(col("s_id") <= 40)
    .select(col("s_id").as("pid"), col("sx").as("px"), col("sy").as("py"))

  private lazy val polys = Tin.voronoiPolygons(pts).collect().map { r =>
    (r.getLong(0), r.getSeq[Double](1).toArray, r.getSeq[Double](2).toArray,
      r.getDouble(3))
  }
  private lazy val sites = pts.collect()
    .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))

  test("every point lies strictly inside its own cell") {
    val byId = sites.map(s => s._1 -> (s._2, s._3)).toMap
    polys.foreach { case (pid, xs, ys, _) =>
      val (px, py) = byId(pid)
      // convex polygon: inside iff on the non-positive side of every
      // CW edge (or non-negative of every CCW edge)
      val n = xs.length
      val signs = (0 until n).map { i =>
        val j = (i + 1) % n
        (xs(j) - xs(i)) * (py - ys(i)) - (ys(j) - ys(i)) * (px - xs(i))
      }
      assert(signs.forall(_ > 0) || signs.forall(_ < 0),
        s"site $pid outside its cell")
    }
  }

  test("cell vertices are nearest to the owning site (up to ties)") {
    val eps = 1e-9
    polys.foreach { case (pid, xs, ys, _) =>
      val own = sites.find(_._1 == pid).get
      xs.indices.foreach { i =>
        val d0 = math.hypot(xs(i) - own._2, ys(i) - own._3)
        sites.foreach { case (oid, ox, oy) =>
          if (oid != pid)
            assert(math.hypot(xs(i) - ox, ys(i) - oy) >= d0 - eps,
              s"vertex of $pid strictly closer to $oid")
        }
      }
    }
  }

  test("cells tile the 5%-expanded envelope exactly") {
    val mnx = sites.map(_._2).min; val mxx = sites.map(_._2).max
    val mny = sites.map(_._3).min; val mxy = sites.map(_._3).max
    val envArea = ((mxx - mnx) * 1.1) * ((mxy - mny) * 1.1)
    val sum = polys.map(_._4).sum
    assert(math.abs(sum - envArea) < 1e-6 * envArea)
    assert(polys.length === sites.length)
  }

  test("cells sharing an edge are exactly the Delaunay dual pairs") {
    // two cells share an edge iff they have >= 2 common vertices
    // (up to float identity from the shared bisector construction —
    // compare rounded)
    def keyPts(xs: Array[Double], ys: Array[Double]) =
      xs.indices.map(i => (math.round(xs(i) * 1e6), math.round(ys(i) * 1e6)))
        .toSet
    val cellPts = polys.map(p => (p._1, keyPts(p._2, p._3)))
    val shared = (for {
      (a, pa) <- cellPts
      (b, pb) <- cellPts
      if a < b && (pa & pb).size >= 2
    } yield (a, b)).toSet
    val dual = Tin.voronoiNeighbors(pts).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every shared-edge pair is a Delaunay pair; near-degenerate dual
    // edges (clipped away by the envelope) may drop, so <=
    assert(shared.subsetOf(dual))
    // and the overwhelming majority of dual edges survive the clip
    assert(shared.size >= dual.size / 2)
  }
}
