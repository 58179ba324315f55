package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Isobasin (HydroTools/Isobasin.java): hand-computed ramp case +
  * differential against an independent Map-based transcription of the
  * reference's two-loop sequential semantics. */
class IsobasinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dY = Terrain.dY.toArray
  private val dX = Terrain.dX.toArray

  test("isobasin on a 1x10 ramp: seeds every `threshold` cells") {
    // v = 9 - c: each cell flows east (ptr = 2), CA(c) = c + 1
    val ramp = (0L until 10L).map(c => (0L, c, 9.0 - c)).toDF("r", "c", "v")
    val got = Terrain.isobasin(ramp, 4).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    // walk drops seed 1 at c=3 (CA 4, closer than ICLCA's 3), subtracts
    // 4 downstream, seed 2 at c=7; c=8,9 drain past every seed -> absent
    val want = ((0L to 3L).map(c => (0L, c) -> 1L) ++
      (4L to 7L).map(c => (0L, c) -> 2L)).toMap
    assert(got === want)
  }

  test("isobasin matches an independent sequential transcription") {
    val g = (for (r <- 0L until 20L; c <- 0L until 25L)
      yield (r, c, ((r * 25 + c) * 37 % 1000).toDouble / 10.0))
      .toDF("r", "c", "v")
    val threshold = 12L
    val ptr = Terrain.d8Pointer(g).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    val ca0 = graft.operators.Terrain.flowAccumD8(g).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap

    // independent transcription over immutable keys + mutable Maps
    val caM = scala.collection.mutable.Map(ca0.toSeq: _*)
    val outM = scala.collection.mutable.Map.empty[(Long, Long), Long]
    def down(k: (Long, Long)): Option[(Long, Long)] = {
      val p = ptr(k)
      if (p <= 0) None
      else {
        val i = java.lang.Long.numberOfTrailingZeros(p)
        val t = (k._1 + dY(i), k._2 + dX(i))
        if (ptr.contains(t)) Some(t) else None
      }
    }
    def inflowing(k: (Long, Long)): Seq[(Long, Long)] =
      (0 until 8).flatMap { i =>
        val nb = (k._1 + dY(i), k._2 + dX(i))
        if (ptr.get(nb).contains(1L << ((i + 4) % 8))) Some(nb) else None
      }
    var nextId = 1L
    val rowMajor = ptr.keys.toSeq.sorted
    for (start <- rowMajor if inflowing(start).isEmpty) {
      var cur = start
      var stop = false
      while (!stop) {
        down(cur) match {
          case Some(t) => cur = t
          case None => stop = true
        }
        if (caM(cur) >= threshold) {
          val icl = inflowing(cur).maxBy(caM) // unique CAs in this grid
          if (caM(icl) > threshold) stop = true
          else {
            val seed =
              if (math.abs(caM(icl) - threshold) <
                  math.abs(caM(cur) - threshold)) icl
              else cur
            outM(seed) = nextId
            val dec = caM(seed)
            var w = seed
            var wd = false
            while (!wd) {
              caM(w) -= dec
              down(w) match {
                case Some(t) => w = t
                case None => wd = true
              }
            }
            nextId += 1
          }
        }
      }
    }
    for (a <- rowMajor if !outM.contains(a)) {
      var cur = a
      var oid = -1L
      var stop = false
      while (!stop) {
        down(cur) match {
          case Some(t) =>
            cur = t
            if (outM.contains(t)) { oid = outM(t); stop = true }
          case None => stop = true
        }
      }
      cur = a
      outM(cur) = oid
      stop = false
      while (!stop) {
        down(cur) match {
          case Some(t) =>
            cur = t
            if (outM.contains(t)) stop = true
            outM(cur) = oid
          case None => stop = true
        }
      }
    }
    val want = outM.filter(_._2 > 0).toMap
    val got = Terrain.isobasin(g, threshold).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    assert(got.size === want.size)
    assert(got === want)
    assert(want.values.toSet === (1L until nextId).toSet)
  }
}
