package graft.core

import org.scalatest.funsuite.AnyFunSuite

class GeoSpec extends AnyFunSuite {
  import Geo._

  // unit square
  val sqXs = Array(0.0, 1.0, 1.0, 0.0)
  val sqYs = Array(0.0, 0.0, 1.0, 1.0)
  val one = Array(0)

  // square with centered square hole; hole ring wound opposite to the
  // outer ring (shapefile convention, whitebox Polygon partHoleData)
  val holeXs = Array(0.0, 4.0, 4.0, 0.0, 1.0, 1.0, 3.0, 3.0)
  val holeYs = Array(0.0, 0.0, 4.0, 4.0, 1.0, 3.0, 3.0, 1.0)
  val twoParts = Array(0, 4)

  // concave star-ish polygon
  val starXs = Array(0.0, 4.0, 2.0, 4.0, 0.0, 2.0)
  val starYs = Array(0.0, 1.0, 2.0, 3.0, 4.0, 2.0)

  test("PIP: unit square interior/exterior") {
    assert(pipContains(0.5, 0.5, sqXs, sqYs, one))
    assert(!pipContains(1.5, 0.5, sqXs, sqYs, one))
    assert(!pipContains(-0.5, 0.5, sqXs, sqYs, one))
    assert(!pipContains(0.5, -0.5, sqXs, sqYs, one))
    assert(!pipContains(0.5, 1.5, sqXs, sqYs, one))
  }

  test("PIP: hole carved by even-odd parity") {
    assert(pipContains(0.5, 0.5, holeXs, holeYs, twoParts))  // rim
    assert(!pipContains(2.0, 2.0, holeXs, holeYs, twoParts)) // in hole
    assert(pipContains(3.5, 3.5, holeXs, holeYs, twoParts))  // rim
    assert(!pipContains(5.0, 2.0, holeXs, holeYs, twoParts)) // outside
  }

  test("PIP: concave polygon") {
    // the notch at (3.0, 2.0) is outside (between the two prongs)
    assert(pipContains(1.0, 1.0, starXs, starYs, one))
    assert(!pipContains(3.9, 2.0, starXs, starYs, one))
  }

  test("PIP agrees with brute-force winding on a seeded point cloud") {
    val rnd = new scala.util.Random(42)
    var inside = 0
    for (_ <- 0 until 2000) {
      val x = rnd.nextDouble() * 6.0 - 1.0
      val y = rnd.nextDouble() * 6.0 - 1.0
      val got = pipContains(x, y, holeXs, holeYs, twoParts)
      val expect = {
        val inOuter = x > 0 && x < 4 && y > 0 && y < 4
        val inHole = x > 1 && x < 3 && y > 1 && y < 3
        inOuter && !inHole
      }
      assert(got === expect, s"($x,$y)")
      if (got) inside += 1
    }
    assert(inside > 0)
  }

  test("area and perimeter: square with hole") {
    assert(polygonArea(holeXs, holeYs, twoParts) === 16.0 - 4.0)
    assert(polygonPerimeter(holeXs, holeYs, twoParts) === 16.0 + 8.0)
  }

  test("signed area / clockwise detection") {
    // sqXs/sqYs as written is counter-clockwise (y-up)
    assert(!isClockwise(sqXs, sqYs, 0, 4))
    assert(ringSignedArea(sqXs, sqYs, 0, 4) === 1.0)
  }
}
