package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * TIN construction (ConstructTIN.groovy) + Voronoi adjacency
 * (VoronoiDiagram.java dual) by the empty-circumcircle definition: a
 * triangle (a, b, c) over the point set is Delaunay iff no other
 * point lies strictly inside its circumcircle.
 *
 * Executed as a candidate-triple join + an anti-join against the
 * incircle test — O(n⁴) arithmetic, which is the right EXACT oracle
 * shape for the small feature layers the reference builds TINs from
 * (and embarrassingly parallel in the triples). For large point sets
 * the scale path is per-tile Delaunay with halo exchange; the exact
 * definition here is what such a tiling must agree with.
 *
 * The incircle predicate is the standard 3×3 determinant times the
 * orientation sign — all +,-,* on identical doubles, so both engines
 * make identical accept/reject decisions (no epsilon).
 */
object Tin {

  private def orient(ax: Column, ay: Column, bx: Column, by: Column,
                     cx: Column, cy: Column): Column =
    (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)

  /** incircle determinant: positive when (dx, dy) is inside the
    * circumcircle of CCW (a, b, c); multiplied by orient sign below to
    * handle CW triples uniformly. */
  private def incircle(ax: Column, ay: Column, bx: Column, by: Column,
                       cx: Column, cy: Column,
                       dx: Column, dy: Column): Column = {
    val a1 = ax - dx; val a2 = ay - dy
    val b1 = bx - dx; val b2 = by - dy
    val c1 = cx - dx; val c2 = cy - dy
    val a3 = a1 * a1 + a2 * a2
    val b3 = b1 * b1 + b2 * b2
    val c3 = c1 * c1 + c2 * c2
    a1 * (b2 * c3 - b3 * c2) - a2 * (b1 * c3 - b3 * c1) +
      a3 * (b1 * c2 - b2 * c1)
  }

  /** points: (pid, px, py). Returns Delaunay triangles (ia, ib, ic),
    * vertex ids ascending. Collinear triples are excluded; cocircular
    * ties resolve to "not inside" identically on both engines. */
  def delaunayBrute(points: DataFrame): DataFrame = {
    val p = points.select(col("pid"), col("px"), col("py"))
      .localCheckpoint(true)
    def pAs(n: String) = p.select(col("pid").as(s"i$n"),
      col("px").as(s"x$n"), col("py").as(s"y$n"))
    val triples = pAs("a")
      .join(pAs("b"), col("ia") < col("ib"))
      .join(pAs("c"), col("ib") < col("ic"))
      .withColumn("__o", orient(col("xa"), col("ya"), col("xb"),
        col("yb"), col("xc"), col("yc")))
      .where(col("__o") =!= 0)
      .localCheckpoint(true)
    val withD = triples.join(pAs("d"),
      col("id") =!= col("ia") && col("id") =!= col("ib") &&
        col("id") =!= col("ic"))
    val bad = withD
      .where(incircle(col("xa"), col("ya"), col("xb"), col("yb"),
        col("xc"), col("yc"), col("xd"), col("yd")) * col("__o") > 0)
      .select("ia", "ib", "ic").distinct()
    triples.join(bad, Seq("ia", "ib", "ic"), "left_anti")
      .select("ia", "ib", "ic")
  }

  /** Voronoi cell adjacency = the Delaunay edge set (dual graph):
    * distinct (pa, pb), pa < pb. */
  def voronoiNeighbors(points: DataFrame): DataFrame = {
    val tri = delaunayBrute(points)
    tri.select(col("ia").as("pa"), col("ib").as("pb"))
      .unionByName(tri.select(col("ia").as("pa"), col("ic").as("pb")))
      .unionByName(tri.select(col("ib").as("pa"), col("ic").as("pb")))
      .distinct()
  }
}
