package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential oracles for the interpolators: the general-n
  * driver-solve RBF path must agree with the 3-sample Cramer closed
  * form, and the general-k least-squares local polynomial must agree
  * with the exact-plane k = 3 closed form. */
class RbfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val samples = Seq(
    (1L, 5.0, 5.0, 70.0), (2L, 30.0, 20.0, 95.0),
    (3L, 45.0, 35.0, 62.0))
  private val targets = (for (r <- 0L until 12L; c <- 0L until 15L)
    yield (r * 15 + c, c.toDouble, r.toDouble))

  test("general RBF solve matches the 3-sample Cramer closed form") {
    for (basis <- Seq("multiquadric", "gaussian", "thin plate spline",
        "inverse multiquadric", "natural cubic spline")) {
      val smp = samples.toDF("sid", "sx", "sy", "sv")
      val tgt = targets.toDF("tid", "tx", "ty")
      val general = Rbf.interpolate(smp, tgt, basis, 25.0)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val Seq((_, x1, y1, v1), (_, x2, y2, v2), (_, x3, y3, v3)) =
        samples
      val pv = targets.toDF("tid", "tx", "ty")
        .withColumn("sx1", lit(x1)).withColumn("sy1", lit(y1))
        .withColumn("sv1", lit(v1))
        .withColumn("sx2", lit(x2)).withColumn("sy2", lit(y2))
        .withColumn("sv2", lit(v2))
        .withColumn("sx3", lit(x3)).withColumn("sy3", lit(y3))
        .withColumn("sv3", lit(v3))
        .withColumn("d21", (col("tx") - x1) * (col("tx") - x1) +
          (col("ty") - y1) * (col("ty") - y1))
        .withColumn("d22", (col("tx") - x2) * (col("tx") - x2) +
          (col("ty") - y2) * (col("ty") - y2))
        .withColumn("d23", (col("tx") - x3) * (col("tx") - x3) +
          (col("ty") - y3) * (col("ty") - y3))
      val closed = Rbf.rbf3Closed(pv, basis, 25.0)
        .select(col("tid"), col("est"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      targets.foreach { case (tid, _, _) =>
        assert(math.abs(general(tid) - closed(tid)) <=
          1e-6 * math.max(1.0, math.abs(closed(tid))),
          s"basis=$basis tid=$tid ${general(tid)} vs ${closed(tid)}")
      }
    }
  }

  test("RBF interpolant passes through its samples") {
    val smp = samples.toDF("sid", "sx", "sy", "sv")
    val tgt = samples.map(s => (s._1, s._2, s._3)).toDF("tid", "tx", "ty")
    val got = Rbf.interpolate(smp, tgt, "multiquadric", 25.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    samples.foreach { case (sid, _, _, v) =>
      assert(math.abs(got(sid) - v) < 1e-6, s"sample $sid")
    }
  }

  test("general local polynomial (k=3) matches the exact-plane form") {
    // scattered, non-collinear samples
    val smp = (0L until 25L).map { i =>
      (i, (i * 7 % 13).toDouble + 0.31 * (i % 3),
        (i * 11 % 17).toDouble + 0.17 * (i % 5),
        50.0 + (i * 31 % 23).toDouble)
    }
    val smpDf = smp.toDF("sid", "sx", "sy", "sv")
    val tgt = (for (r <- 0L until 8L; c <- 0L until 8L)
      yield (r * 8 + c, c * 1.5, r * 1.5)).toDF("tid", "tx", "ty")
    val general = LocalPoly.interpolate(smpDf, tgt, 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // closed form over the same 3 nearest (brute-force ranked)
    val tl = tgt.collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    tl.foreach { case (tid, tx, ty) =>
      val ns = smp.map { case (sid, x, y, v) =>
        ((tx - x) * (tx - x) + (ty - y) * (ty - y), sid, x, y, v)
      }.sortBy(t => (t._1, t._2)).take(3)
      val Seq((_, _, x1, y1, v1), (_, _, x2, y2, v2),
        (_, _, x3, y3, v3)) = ns.toSeq
      val det = (x2 - x1) * (y3 - y1) - (x3 - x1) * (y2 - y1)
      val want =
        if (math.abs(det) < 1e-9) v1
        else {
          val b = ((v2 - v1) * (y3 - y1) - (v3 - v1) * (y2 - y1)) / det
          val c = ((x2 - x1) * (v3 - v1) - (x3 - x1) * (v2 - v1)) / det
          v1 + b * (tx - x1) + c * (ty - y1)
        }
      assert(math.abs(general(tid) - want) <=
        1e-6 * math.max(1.0, math.abs(want)), s"tid=$tid")
    }
  }
}
