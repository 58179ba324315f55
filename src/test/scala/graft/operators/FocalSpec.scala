package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Brute-force differential tests for the generic focal engine:
  * a driver-side sequential re-statement of the reference semantics
  * (reflected reads per WhiteboxRaster.java:535-557, skip-NoData)
  * must equal the distributed scatter/gather result cell-for-cell. */
class FocalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val nR = 7L
  val nC = 9L
  // deterministic small grid with one hole (NoData as absent row)
  val cells: Seq[(Long, Long, Double)] =
    (for (r <- 0L until nR; c <- 0L until nC
          if !(r == 3 && c == 4))
      yield (r, c, ((r * 31 + c * 17) % 23).toDouble / 2.0))
  lazy val grid = cells.toDF("r", "c", "v")
  val m: Map[(Long, Long), Double] =
    cells.map(t => (t._1, t._2) -> t._3).toMap

  def reflRead(r: Long, c: Long): Option[Double] = {
    var rr = r; var cc = c
    if (rr < 0) rr = -rr - 1
    if (rr >= nR) rr = nR - (rr - nR) - 1
    if (cc < 0) cc = -cc - 1
    if (cc >= nC) cc = nC - (cc - nC) - 1
    m.get((rr, cc))
  }

  def window(r: Long, c: Long, k: Int): Seq[Double] =
    (for (dr <- -k to k; dc <- -k to k)
      yield reflRead(r + dr, c + dc)).flatten

  test("filterMean with reflection equals brute force") {
    val got = Focal.filterMean(grid, 2, reflect = true, nR, nC)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(2))
      .toMap
    for (((r, c), _) <- m) {
      val w = window(r, c, 2)
      val want = BigDecimal(w.sum / w.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(got((r, c)) - want) < 1e-9, s"cell ($r,$c)")
    }
    assert(got.size === m.size)
  }

  test("filterMedian with reflection equals brute force") {
    val got = Focal.filterMedian(grid, 1, reflect = true, nR, nC)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(2))
      .toMap
    for (((r, c), _) <- m) {
      val w = window(r, c, 1).sorted
      val want =
        if (w.size % 2 == 1) w((w.size + 1) / 2 - 1)
        else (w(w.size / 2 - 1) + w(w.size / 2)) / 2.0
      assert(got((r, c)) === want, s"cell ($r,$c)")
    }
  }

  test("filterMajority tie-breaks to the smallest value") {
    val got = Focal.filterMajority(grid, 1, reflect = true, nR, nC)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(2))
      .toMap
    for (((r, c), _) <- m) {
      val w = window(r, c, 1)
      val want = w.groupBy(identity).toSeq
        .map { case (v, vs) => (-vs.size, v) }.min._2
      assert(got((r, c)) === want, s"cell ($r,$c)")
    }
  }

  test("convolveSubstitute: missing reads take the centre value") {
    val got = Focal.convolveSubstitute(grid, Focal.laplacian3x3,
        reflect = false, nR, nC)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(2))
      .toMap
    val km = Focal.laplacian3x3.map(k => (k._1, k._2) -> k._3).toMap
    for (((r, c), z) <- m) {
      val want = km.map { case ((dy, dx), w) =>
        w * m.getOrElse((r + dy, c + dx), z)
      }.sum
      assert(math.abs(got((r, c)) - want) < 1e-6, s"cell ($r,$c)")
    }
  }

  test("aspect matches the reference formula on interior cells") {
    val got = Terrain.aspect(grid, nR, nC)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(2))
      .toMap
    val dY = Terrain.dY; val dX = Terrain.dX
    for (((r, c), z) <- m if r > 0 && r < nR - 1 && c > 0 && c < nC - 1) {
      val n = (0 until 8).map(i =>
        m.getOrElse((r + dY(i), c + dX(i)), z))
      val fy = (n(6) - n(4) + 2 * (n(7) - n(3)) + n(0) - n(2)) / 8.0
      val fx = (n(2) - n(4) + 2 * (n(1) - n(5)) + n(0) - n(6)) / 8.0
      val want =
        if (fx != 0)
          180 - math.atan(fy / fx) * (180 / math.Pi) +
            90 * (fx / math.abs(fx))
        else -1.0
      assert(math.abs(got((r, c)) - want) < 1e-5, s"cell ($r,$c)")
    }
  }
}
