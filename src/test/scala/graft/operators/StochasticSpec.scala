package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Statistical oracles for the two seeded stochastic tools (no SQL
  * oracle exists even in principle — the reference versions use an
  * unseeded Random). */
class StochasticSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val dir = "/root/testdata/sf0.001"

  test("turningBands is deterministic, seed-sensitive, near zero-mean") {
    val grid = Derived.partGrid(spark, dir)
    val a = Terrain.turningBands(grid, 40, 50, 6.0, 16, seed = 42L)
    val b = Terrain.turningBands(grid, 40, 50, 6.0, 16, seed = 42L)
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
    val c = Terrain.turningBands(grid, 40, 50, 6.0, 16, seed = 43L)
    assert(a.exceptAll(c).count() > 0, "different seed, different field")
    val stats = a.agg(avg("tb"), stddev("tb")).first()
    assert(math.abs(stats.getDouble(0)) < 0.5,
      s"field mean ${stats.getDouble(0)} too far from 0")
    assert(stats.getDouble(1) > 0.05, "field is not degenerate")
  }

  test("stochasticDepressionAnalysis: pdep in [0,1], deterministic, " +
      "deep sinks flood more than non-sinks") {
    val grid = Derived.partGrid(spark, dir)
    val a = Terrain.stochasticDepressionAnalysis(grid, 40, 50,
      rmse = 2.0, iters = 4, seed = 7L)
    assert(a.where(col("pdep") < 0 || col("pdep") > 1).count() === 0)
    val b = Terrain.stochasticDepressionAnalysis(grid, 40, 50,
      rmse = 2.0, iters = 4, seed = 7L)
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
    val depth = Terrain.depthInSink(grid, 40, 50)
    val j = a.join(depth, Seq("r", "c"))
    val deep = j.where(col("sink_depth") > 2).agg(avg("pdep")).first()
    val flat = j.where(col("sink_depth") === 0).agg(avg("pdep")).first()
    if (!deep.isNullAt(0) && !flat.isNullAt(0))
      assert(deep.getDouble(0) > flat.getDouble(0),
        s"deep sinks ${deep.getDouble(0)} vs non-sinks ${flat.getDouble(0)}")
  }
}
