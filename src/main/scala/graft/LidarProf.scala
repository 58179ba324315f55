package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc phase profiler for lidar_segmentation (dev harness, not
  * part of the driver contract). */
object LidarProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("lidarprof").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val cloud = operators.Derived.lidarCloud(spark, dir)
    time("warm: cloud count")(cloud.count())
    val pts = cloud.select(col("pid"), col("x"), col("y"), col("z"))
    val r = pts.select(col("pid").as("rpid"), col("x").as("rx"),
      col("y").as("ry"), col("z").as("rz"))
    val pairs = time("distanceJoin ckpt")(
      operators.SpatialJoins.distanceJoin(pts, r, 3.0)
        .where(col("pid") =!= col("rpid"))
        .select(col("pid"), col("rpid"), col("rz"))
        .localCheckpoint(true))
    time("pairs count")(pairs.count())
    val mda = time("mda ckpt")(pts.join(
        pairs.groupBy("pid").agg(min(col("rz")).as("__mn")),
        Seq("pid"), "left")
      .select(col("pid"),
        (col("z") - least(col("z"), coalesce(col("__mn"), col("z"))))
          .as("mda")).localCheckpoint(true))
    val thr = 3.0 * math.tan(math.toRadians(65.0))
    val e = time("edges ckpt")(pairs
      .where(col("pid") < col("rpid"))
      .join(mda.select(col("pid"), col("mda").as("ma")), Seq("pid"))
      .join(mda.select(col("pid").as("rpid"), col("mda").as("mb")),
        Seq("rpid"))
      .where(abs(col("ma") - col("mb")) <= lit(thr))
      .select(col("pid").as("a"), col("rpid").as("b"))
      .localCheckpoint(true))
    val selfLoops = pts.select(col("pid").as("a"), col("pid").as("b"))
    time("GraphCC.label + count")(
      operators.GraphCC.label(e.unionByName(selfLoops)).count())
    spark.stop()
  }
}
