package graft.core

import org.scalatest.funsuite.AnyFunSuite

class CellIndexSpec extends AnyFunSuite {
  import CellIndex._

  /** Seeded pseudo-random (lat, lon, res) triples. */
  private def samples(n: Int = 300): Seq[(Double, Double, Int)] = {
    val rnd = new scala.util.Random(42)
    (0 until n).map { _ =>
      (rnd.nextDouble() * 180.0 - 90.0,
       rnd.nextDouble() * 360.0 - 180.0,
       rnd.nextInt(21))
    }
  }
  private def forAllSamples(f: (Double, Double, Int) => Unit): Unit =
    samples().foreach { case (la, lo, r) => f(la, lo, r) }

  test("pack/unpack round-trips bins and res") {
    forAllSamples { (lat, lon, res) =>
      val cell = latLngToCell(lat, lon, res)
      assert(cellRes(cell) === res)
      assert(cellLatBin(cell) === latBin(lat, res))
      assert(cellLonBin(cell) === lonBin(lon, res))
    }
  }

  test("cell center is inside the cell (round-trip)") {
    forAllSamples { (lat, lon, res) =>
      val cell = latLngToCell(lat, lon, res)
      val c2 = latLngToCell(cellCenterLat(cell), cellCenterLon(cell), res)
      assert(c2 === cell)
    }
  }

  test("bins are within range") {
    forAllSamples { (lat, lon, res) =>
      val lb = latBin(lat, res)
      val ob = lonBin(lon, res)
      assert(lb >= 0 && lb < latBins(res))
      assert(ob >= 0 && ob < lonBins(res))
    }
  }

  test("poles and antimeridian clamp/wrap") {
    assert(latBin(90.0, 10) === latBins(10) - 1)
    assert(latBin(-90.0, 10) === 0)
    assert(lonBin(-180.0, 10) === 0)
    assert(lonBin(180.0, 10) === 0) // wraps
  }

  test("kRing size and membership") {
    val cell = latLngToCell(45.0, 12.0, 6)
    val ring1 = kRing(cell, 1)
    assert(ring1.length === 9)
    assert(ring1.contains(cell))
    assert(ring1.distinct.length === 9)
    val ring2 = kRing(cell, 2)
    assert(ring2.length === 25)
    // every ring-1 cell is in ring-2
    assert(ring1.forall(ring2.contains))
  }

  test("kRing clamps at poles and wraps at antimeridian") {
    val top = latLngToCell(89.9, 0.0, 6)
    val r = kRing(top, 2)
    assert(r.length === 15) // 3 lat rows (2 clamped) x 5 lon
    val left = latLngToCell(0.0, -179.99, 6)
    val r2 = kRing(left, 1)
    assert(r2.length === 9)
    assert(r2.distinct.length === 9) // wrap produced distinct cells
  }

  test("kRing guarantee: cells outside ring are at least guarantee apart") {
    val res = 6
    val cell = latLngToCell(10.0, 10.0, res)
    val g = kRingGuaranteeDeg(res, 2)
    assert(g === 2 * cellHeightDeg(res))
  }

  test("parent cell contains child center") {
    forAllSamples { (lat, lon, res0) =>
      val res = math.max(res0, 5)
      val cell = latLngToCell(lat, lon, res)
      val parent = cellToParent(cell, res - 3)
      assert(cellRes(parent) === res - 3)
      assert(latLngToCell(cellCenterLat(cell), cellCenterLon(cell),
        res - 3) === parent)
    }
  }

  test("coverBBox covers the corner cells") {
    val cells = coverBBox(10.0, 20.0, 12.0, 22.0, 8)
    assert(cells.contains(latLngToCell(20.0, 10.0, 8)))
    assert(cells.contains(latLngToCell(22.0, 12.0, 8)))
    assert(cells.contains(latLngToCell(21.0, 11.0, 8)))
    assert(cells.distinct.length === cells.length)
  }

  test("res field does not leak into bins (regression)") {
    // res=6 sets bits 59-60 of the id; unmasked unspread once read bit
    // 58+ into the lat bin, exploding kRing allocations.
    for (res <- 0 to 28; lat <- Seq(-89.9, 0.0, 45.5, 89.9);
         lon <- Seq(-179.9, 0.0, 12.3, 179.9)) {
      val cell = latLngToCell(lat, lon, res)
      assert(cellLatBin(cell) < latBins(res),
        s"latBin leak at res=$res lat=$lat lon=$lon")
      assert(cellLonBin(cell) < lonBins(res))
    }
  }
}
