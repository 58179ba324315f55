package graft

import org.apache.spark.sql.SparkSession

/** Plan-hygiene sweep (iteration aid, not part of the driver
  * contract): build every query's physical plan WITHOUT executing it
  * and report join/scan anti-patterns — CartesianProduct,
  * BroadcastNestedLoopJoin (legitimate only against literal 1-row
  * aggregates), and SortMergeJoin (legitimate only where both sides
  * are genuinely large). One line per flagged query. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val markers = Seq("CartesianProduct", "BroadcastNestedLoopJoin",
      "SortMergeJoin")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.sparkPlan.toString
        val hits = markers.filter(plan.contains)
        if (hits.nonEmpty) println(s"$name: ${hits.mkString(", ")}")
      } catch {
        case e: Throwable => println(s"$name: PLAN-ERROR ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
