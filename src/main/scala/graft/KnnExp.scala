// experiment driver — not part of the library
package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Derived, SpatialJoins, TextOps}
object KnnExp {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("CPUS", "4")
    val which = sys.env.getOrElse("WHICH", "knn")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.1"
    val factor = sys.env.getOrElse("FACTOR", "100").toInt
    val pts = ScalingBench.scaledPoints(spark, sfDir, factor)
      .repartition(cpus.toInt * 3).localCheckpoint(true)
    val supRep = Derived.supplierPoints(spark, sfDir)
      .select(col("s_id"), col("sx"), col("sy"))
      .crossJoin(spark.range(4).select(col("id").as("rep")))
      .select((col("s_id") * 4 + col("rep")).as("s_id"),
        (col("sx") + col("rep") * 1e-5).as("sx"),
        (col("sy") + col("rep") * 1e-5).as("sy"))
      .repartition(cpus.toInt * 3).localCheckpoint(true)
    val t0 = System.nanoTime()
    if (which == "knn") {
      val n = SpatialJoins.knnJoin(supRep,
        pts.select(col("id").as("c_id"), col("x").as("cx"), col("y").as("cy")),
        5, probeId = "s_id", buildId = "c_id",
        px = "sx", py = "sy", bx = "cx", by = "cy").count()
      println(s"RESULT knn rows=$n sec=${(System.nanoTime()-t0)/1e9}")
    } else {
      val nDocs = 20000L
      val base = spark.range(nDocs).as[Long].map { i =>
        val rnd = new scala.util.Random(i)
        (i, Array.fill(30)(s"w${rnd.nextInt(5000)}").mkString(" "))
      }.toDF("doc_id", "text")
      val corpus = base.unionByName(base.select((col("doc_id")+10000000L).as("doc_id"),
        expr("array_join(slice(split(text, ' '), 1, 28), ' ')").as("text")))
        .repartition(cpus.toInt * 3).localCheckpoint(true)
      val n = TextOps.minhashLshPairs(corpus, 16, 4, 0.95).count()
      println(s"RESULT minhash rows=$n sec=${(System.nanoTime()-t0)/1e9}")
    }
    spark.stop()
  }
}
