package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Ring-assembly tests for RasterToVectorPolygons: a donut patch must
  * produce an exterior ring plus one hole whose net area equals the
  * cell count, with exact corner vertices. */
class VectorizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("donut patch yields exterior + hole with exact net area") {
    // 5x5 ring of class 1 around a class-0 centre at (2,2)
    val cells = (for (r <- 0L until 5L; c <- 0L until 5L)
      yield (r, c, if (r == 2 && c == 2) 0L else 1L))
      .toDF("r", "c", "cls")
    val out = Vectorize.rasterToPolygons(cells, width = 5)
      .collect().map(x => (x.getLong(1), x.getLong(2),
        x.getSeq[Double](3), x.getSeq[Double](4), x.getSeq[Int](5),
        x.getDouble(6)))
    val donut = out.find(t => t._1 == 1L).get
    assert(donut._2 === 24)          // 25 - centre
    assert(donut._6 === 24.0)        // net ring area == cells
    assert(donut._5.length === 2)    // exterior + hole
    // exterior ring: the 4 outer corners survive collinear merge
    val xs = donut._3; val ys = donut._4; val parts = donut._5
    val ext = (parts(0) until parts(1))
      .map(i => (xs(i), ys(i))).toSet
    assert(ext === Set((0.0, 0.0), (5.0, 0.0), (5.0, 5.0), (0.0, 5.0)))
    val hole = (parts(1) until xs.length).map(i => (xs(i), ys(i))).toSet
    assert(hole === Set((2.0, 2.0), (3.0, 2.0), (3.0, 3.0), (2.0, 3.0)))
    // the centre cell is its own patch of area 1
    val centre = out.find(t => t._1 == 0L).get
    assert(centre._2 === 1 && centre._6 === 1.0)
  }

  test("diagonally touching cells stay separate 4-conn patches") {
    val cells = Seq((0L, 0L, 1L), (1L, 1L, 1L)).toDF("r", "c", "cls")
    val out = Vectorize.rasterToPolygons(cells, width = 5).collect()
    assert(out.length === 2)
    assert(out.forall(_.getDouble(6) == 1.0))
  }
}
