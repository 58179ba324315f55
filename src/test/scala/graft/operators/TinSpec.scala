package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Delaunay-by-definition (Tin.delaunayBrute) structural checks. */
class TinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("square + centre point triangulates into the 4 centre fans") {
    val pts = Seq(
      (0L, 0.0, 0.0), (1L, 10.0, 0.0), (2L, 10.0, 10.0),
      (3L, 0.0, 10.0), (4L, 5.0, 5.0)).toDF("pid", "px", "py")
    val tri = Tin.delaunayBrute(pts).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(tri === Set((0L, 1L, 4L), (1L, 2L, 4L), (2L, 3L, 4L),
      (0L, 3L, 4L)))
  }

  test("Euler's formula holds: E = V + T - 1 on a general point set") {
    // deterministic pseudo-random points, no 3 collinear / 4 cocircular
    val pts = (1L to 25L).map(i =>
      (i, (i * 37 % 101).toDouble + i * 1e-3,
        (i * 61 % 97).toDouble + i * i * 1e-4))
      .toDF("pid", "px", "py")
    val tri = Tin.delaunayBrute(pts).collect()
    val t = tri.length
    val edges = tri.flatMap { r =>
      val Seq(a, b, c) = Seq(r.getLong(0), r.getLong(1), r.getLong(2))
      Seq((a, b), (a, c), (b, c))
    }.toSet
    assert(edges.size === 25 + t - 1,
      s"Euler violated: E=${edges.size}, V=25, T=$t")
    // the dual adjacency operator agrees with the triangle edge set
    val vor = Tin.voronoiNeighbors(pts).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(vor === edges)
  }
}
