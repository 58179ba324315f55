package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Terrain-flow operators over the cell-relational grid (r, c, v) —
 * the reference's iterative pointer-DAG family (SURVEY.md §2.10).
 */
object Terrain {

  /** Neighbour order shared by Slope/FlowPointerD8
    * (HydroTools/src/plugins/FlowPointerD8.java:199-200). */
  val dY = Seq(-1, 0, 1, 1, 1, 0, -1, -1)
  val dX = Seq(1, 1, 1, 0, -1, -1, -1, 0)

  /** Gather the 8 neighbour values as n0..n7 (null when off-grid). */
  private[operators] def gatherNeighbors(grid: DataFrame): DataFrame = {
    var df = grid
    for (i <- 0 until 8) {
      val n = grid.select(col("r").as(s"nr$i"), col("c").as(s"nc$i"),
        col("v").as(s"n$i"))
      df = df.join(n,
        df("r") + dY(i) === n(s"nr$i") && df("c") + dX(i) === n(s"nc$i"),
        "left").drop(s"nr$i", s"nc$i")
    }
    df
  }

  /**
   * FlowPointerD8 (HydroTools/FlowPointerD8.java:240-270): steepest
   * descent among the 8 neighbours, slope = (z - z_n)/dist with
   * dist = sqrt(2) on diagonals (even i) and 1 on orthogonals,
   * pointer = 2^i of the FIRST strictly-greatest slope, 0 when no
   * neighbour is lower (maxSlope <= 0). Off-grid neighbours are
   * skipped (NoData semantics).
   */
  def d8Pointer(grid: DataFrame): DataFrame = {
    val nb = gatherNeighbors(grid)
    val slopes = (0 until 8).map { i =>
      val dist = if (i % 2 == 0) math.sqrt(2.0) else 1.0
      ((col("v") - col(s"n$i")) / dist).as(s"s$i")
    }
    val withS = nb.select((col("r") +: col("c") +: slopes): _*)
    val m = greatest((0 until 8).map(i =>
      coalesce(col(s"s$i"), lit(-9.9999999e7))): _*)
    // first index attaining the max wins (strict > update rule)
    withS.withColumn("__m", m)
      .select(col("r"), col("c"),
        when(col("__m") > 0,
          (0 until 8).foldLeft(lit(0)) { (acc, i) =>
            when(acc === 0 && col(s"s$i").isNotNull &&
              col(s"s$i") === col("__m"), lit(1 << i)).otherwise(acc)
          }).otherwise(lit(0)).cast("long").as("ptr"))
  }

  /**
   * FlowAccumD8 (HydroTools/FlowAccumD8.java:291-375): number of
   * cells draining through each cell (itself included), accumulated
   * along the D8 pointer DAG. Distributed as iterative frontier
   * propagation: each round pushes every cell's count one step
   * downstream until the frontier drains — O(longest flowpath)
   * rounds, each a hash equi-join on the target cell, materialised
   * per round (localCheckpoint) to bound lineage.
   */
  def flowAccumD8(grid: DataFrame): DataFrame = {
    val spark = grid.sparkSession
    val ptr = d8Pointer(grid)
    // decode pointer to the downstream cell coordinates
    val dyExpr = (0 until 8).foldLeft(lit(0)) { (acc, i) =>
      when(col("ptr") === (1 << i), lit(dY(i))).otherwise(acc)
    }
    val dxExpr = (0 until 8).foldLeft(lit(0)) { (acc, i) =>
      when(col("ptr") === (1 << i), lit(dX(i))).otherwise(acc)
    }
    val edges = ptr.where(col("ptr") > 0)
      .select(col("r"), col("c"),
        (col("r") + dyExpr).as("tr"), (col("c") + dxExpr).as("tc"))
      .localCheckpoint(true)

    // frontier: per-cell count packets flowing downstream
    var acc = grid.select(col("r"), col("c"), lit(1L).as("cnt"))
      .localCheckpoint(true)
    var frontier = acc
    var done = false
    while (!done) {
      val pushed = frontier.join(edges, Seq("r", "c"), "inner")
        .groupBy(col("tr").as("r"), col("tc").as("c"))
        .agg(sum(col("cnt")).as("cnt"))
        .localCheckpoint(true)
      done = pushed.isEmpty
      if (!done) {
        acc = acc.unionByName(pushed)
          .groupBy("r", "c").agg(sum(col("cnt")).as("cnt"))
          .localCheckpoint(true)
        frontier = pushed
      }
    }
    acc.withColumnRenamed("cnt", "n_upslope")
  }

  /**
   * Watershed (HydroTools/Watershed.java:386-401 trace semantics):
   * label every cell with the sink (terminal cell, ptr = 0) its D8
   * flowpath reaches. Distributed by POINTER DOUBLING: each round
   * replaces every cell's successor with its successor's successor,
   * so convergence takes O(log(longest path)) rounds instead of
   * O(path) — the Spark-native answer to the reference's per-cell
   * downstream trace loop.
   * Output: (r, c, sink_id) with sink_id = sink.r * width + sink.c.
   */
  def watershed(grid: DataFrame, width: Long): DataFrame = {
    val ptr = d8Pointer(grid)
    val dyExpr = (0 until 8).foldLeft(lit(0)) { (acc, i) =>
      when(col("ptr") === (1 << i), lit(dY(i))).otherwise(acc)
    }
    val dxExpr = (0 until 8).foldLeft(lit(0)) { (acc, i) =>
      when(col("ptr") === (1 << i), lit(dX(i))).otherwise(acc)
    }
    // next(cell): downstream cell for flowing cells, self for sinks
    var next = ptr.select(col("r"), col("c"),
        when(col("ptr") > 0, col("r") + dyExpr).otherwise(col("r"))
          .as("tr"),
        when(col("ptr") > 0, col("c") + dxExpr).otherwise(col("c"))
          .as("tc"))
      .localCheckpoint(true)
    var converged = false
    while (!converged) {
      val hop = next.select(col("r").as("hr"), col("c").as("hc"),
        col("tr").as("ttr"), col("tc").as("ttc"))
      val doubled = next.join(hop,
          col("tr") === col("hr") && col("tc") === col("hc"), "inner")
        .select(col("r"), col("c"), col("ttr").as("tr"),
          col("ttc").as("tc"))
        .localCheckpoint(true)
      val moved = doubled.join(next.select(col("r"), col("c"),
          col("tr").as("otr"), col("tc").as("otc")), Seq("r", "c"))
        .where(col("tr") =!= col("otr") || col("tc") =!= col("otc"))
        .count()
      next = doubled
      converged = moved == 0
    }
    next.select(col("r"), col("c"),
      (col("tr") * width + col("tc")).as("sink_id"))
  }
}
