package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expr.GeoFunctions._
import graft.operators.{Derived, Similarity, Skew, SpatialJoins, TextOps}

/**
 * Two-cluster-size scaling harness (BASELINE.json north_rule): the
 * SAME deterministic heavy workload at two parallelism levels, so
 * throughput scaling efficiency = (T_N / T_4N) / 4 is measured on
 * compute-bound jobs rather than fixed per-query overhead. The
 * workload replicates the derived point cloud 50x with deterministic
 * jitter (~1.5M points at sf0.1, hot cluster preserved) and runs the
 * engine's headline spatial joins + dedup + ANN.
 *
 * Prints ONE JSON line like Bench. Driven by tools/scaling_bench.sh,
 * results recorded in BENCH/BASELINE.md.
 */
object ScalingBench {

  /** 50x replication with sub-cell deterministic jitter: keeps the
    * spatial distribution (and the hot cells) intact. */
  def scaledPoints(spark: SparkSession, dir: String,
                   factor: Int): DataFrame = {
    val pts = Derived.customerPoints(spark, dir)
    pts.crossJoin(spark.range(factor).select(col("id").as("rep")))
      .select(
        (col("id") * factor + col("rep")).as("id"),
        (col("x") + col("rep") * 1e-6).as("x"),
        (col("y") + col("rep") * 1e-6).as("y"),
        col("val"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE", "50").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val pts = scaledPoints(spark, sfDir, factor).localCheckpoint(true)
    val nPages = pts.count()
    val sup = Derived.supplierPoints(spark, sfDir)
      .select(col("s_id"), col("sx"), col("sy")).localCheckpoint(true)
    val docs = Derived.table(spark, sfDir, "documents")
    val corpus = docs.select(col("doc_id"), col("text"))
      .crossJoin(spark.range(4).select(col("id").as("rep")))
      .select((col("doc_id") * 4 + col("rep")).as("doc_id"),
        when(col("rep") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" rep"),
            col("rep").cast("string"))).as("text"))
      .localCheckpoint(true)

    def time(name: String)(f: => Long): (String, Double, Long) = {
      val t0 = System.nanoTime()
      val rows = f
      (name, (System.nanoTime() - t0) / 1e9, rows)
    }

    val results = Seq(
      time("pip_join") {
        SpatialJoins.pipJoin(pts, Derived.zones(spark), res = 7)
          .select("zone_id", "id").count()
      },
      time("tile_histogram_salted") {
        Skew.saltedCountSum(
          pts.select(
            cell_lat_bin(cell_to_parent(
              latlng_to_cell(col("y"), col("x"), lit(14)), lit(6)))
              .as("b1"),
            cell_lon_bin(cell_to_parent(
              latlng_to_cell(col("y"), col("x"), lit(14)), lit(6)))
              .as("b2"),
            round(col("val") * 100).cast("long").as("cents")),
          Seq(col("b1"), col("b2")), col("cents"), salts = 16).count()
      },
      time("distance_join") {
        SpatialJoins.distanceJoin(pts, sup, radius = 1.5,
          lx = "x", ly = "y", rx = "sx", ry = "sy").count()
      },
      time("knn_join") {
        SpatialJoins.knnJoin(
          sup, pts.select(col("id").as("c_id"), col("x").as("cx"),
            col("y").as("cy")),
          kNeighbors = 5, probeId = "s_id", buildId = "c_id",
          px = "sx", py = "sy", bx = "cx", by = "cy").count()
      },
      time("minhash_lsh") {
        TextOps.minhashLshPairs(corpus, perms = 16, bands = 4,
          threshold = 0.95).count()
      },
      time("ann_topk") {
        val emb = Derived.table(spark, sfDir, "embeddings")
        Similarity.bruteForceTopK(emb,
          emb.where(col("vec_id") % 25 === 0), 10).count()
      }
    )

    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val pipSec = results.find(_._1 == "pip_join").map(_._2).get
    println(s"""{"metric":"scaling","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","pages":$nPages,"pip_pages_per_sec":${nPages / pipSec},"cpus":$cpus,"scale_factor":$factor}""")
    spark.stop()
  }
}
