package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.GeoFunctions._
import graft.operators.{Derived, TestSpark}

class PipJoinRewriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("declarative pip join is rewritten to a cell equi-join and stays exact") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ PipJoinRewrite
    try {
      val pts = Derived.customerPoints(spark, "/root/testdata/sf0.001")
      val zones = Derived.zones(spark)
      // fully declarative theta join — no manual cell keying
      val joined = pts.join(zones,
        pip_contains(pts("x"), pts("y"), zones("xs"), zones("ys"),
          zones("parts")))
        .select(col("zone_id"), col("id"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("__pip_cell"),
        s"rewrite did not fire:\n${plan.take(1500)}")
      val phys = joined.queryExecution.executedPlan.toString
      assert(!phys.contains("BroadcastNestedLoopJoin"),
        s"still a nested-loop join:\n${phys.take(1500)}")

      // result equals the manual cell-keyed pipJoin
      val got = joined.as[(Int, Long)].collect().toSet
      val want = graft.operators.SpatialJoins
        .pipJoin(pts, zones, res = 7)
        .select(col("zone_id"), col("id"))
        .as[(Int, Long)].collect().toSet
      assert(got === want)
      assert(got.nonEmpty)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == PipJoinRewrite)
    }
  }
}
