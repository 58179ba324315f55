package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc phase profiler for the fixed-grid hydrology queries (not
  * part of the driver contract; used to attribute job overhead). */
object ProfileScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("profile").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.01")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val g = operators.Derived.partGrid(spark, dir)
    time("warm: grid count")(g.count())
    val ptr = time("d8Pointer ckpt")(
      operators.Terrain.d8Pointer(g).localCheckpoint(true))
    time("d8Edges ckpt")(
      operators.Terrain.d8Edges(g).localCheckpoint(true))
    val fa = time("flowAccumD8")(
      operators.Terrain.flowAccumD8(g).localCheckpoint(true))
    val stream = time("stream filter ckpt")(
      fa.where(col("n_upslope") >= 15L).select("r", "c")
        .localCheckpoint(true))
    val edges2 = time("d8Edges ckpt #2")(
      operators.Terrain.d8Edges(g).localCheckpoint(true))
    val sedges = time("sedges ckpt")(
      edges2.join(stream, Seq("r", "c"))
        .join(stream.select(col("r").as("tr"), col("c").as("tc")),
          Seq("tr", "tc"))
        .select("r", "c", "tr", "tc").localCheckpoint(true))
    val indeg = sedges.groupBy("tr", "tc").agg(count(lit(1)).as("n"))
    val pred1 = sedges.join(indeg.where(col("n") === 1), Seq("tr", "tc"))
      .select(col("tr").as("r"), col("tc").as("c"),
        col("r").as("pr"), col("c").as("pc"))
    val nxt = time("nxt ckpt")(
      stream.join(pred1, Seq("r", "c"), "left")
        .select(col("r"), col("c"),
          coalesce(col("pr"), col("r")).as("tr"),
          coalesce(col("pc"), col("c")).as("tc"))
        .localCheckpoint(true))
    time("resolvePointers")(
      operators.Terrain.resolvePointers(nxt).count())
    time("streamLinkId full again")(
      operators.Terrain.streamLinkId(g, 15L, 50L).count())
    time("massFlux full")(
      operators.Terrain.massFluxD8(
        g.withColumn("load", col("v") / 100.0)
          .withColumn("eff", lit(0.9)).withColumn("absorp", lit(0.1)),
        24).count())
    spark.stop()
  }
}
