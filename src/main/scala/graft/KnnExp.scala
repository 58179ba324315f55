// experiment driver — not part of the library
package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Derived, SpatialJoins, TextOps}
object KnnExp {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("CPUS", "4")
    val which = sys.env.getOrElse("WHICH", "knn")
    val shuf = sys.env.getOrElse("SHUF", cpus)
    val b = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuf)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    sys.env.get("EVLOG").foreach { dir =>
      new java.io.File(dir).mkdirs()
      b.config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", dir)
    }
    val spark = b.getOrCreate()
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
      for (pass <- 1 to 3) {
        val p0 = System.nanoTime()
        val n = SpatialJoins.knnJoin(supRep,
          pts.select(col("id").as("c_id"), col("x").as("cx"), col("y").as("cy")),
          5, probeId = "s_id", buildId = "c_id",
          px = "sx", py = "sy", bx = "cx", by = "cy").count()
        println(s"RESULT knn pass=$pass rows=$n sec=${(System.nanoTime()-p0)/1e9}")
      }
    } else {
      val nDocs = sys.env.getOrElse("NDOCS", "20000").toLong
      val base = spark.range(nDocs).as[Long].map { i =>
        val rnd = new scala.util.Random(i)
        (i, Array.fill(30)(s"w${rnd.nextInt(5000)}").mkString(" "))
      }.toDF("doc_id", "text")
      val corpus = base.unionByName(base.select((col("doc_id")+10000000L).as("doc_id"),
        expr("array_join(slice(split(text, ' '), 1, 28), ' ')").as("text")))
        .repartition(cpus.toInt * 3).localCheckpoint(true)
      // phased replica of minhashLshPairs for profiling
      def phase[T](name: String)(f: => T): T = {
        val p0 = System.nanoTime()
        val r = f
        println(f"PHASE $name ${(System.nanoTime()-p0)/1e9}%.1f s")
        r
      }
      val perms = 16; val bands = 4; val rows = perms / bands
      val sigs = phase("sigs") {
        corpus.select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
          .as[(Long, Seq[String])]
          .map { case (id, toks) => (id, TextOps.minhashSignature(toks.distinct, perms)) }
          .toDF("doc_id", "sig").localCheckpoint(true)
      }
      val buckets = phase("buckets") {
        sigs.select(col("doc_id"), posexplode(col("sig")).as(Seq("pos", "h")))
          .withColumn("band", expr(s"pos DIV $rows"))
          .groupBy("doc_id", "band")
          .agg(hash(sort_array(collect_list(struct(col("pos"), col("h"))))).as("bkey"))
          .localCheckpoint(true)
      }
      val cand = phase("cand") {
        val l = buckets.select(col("band"), col("bkey"), col("doc_id").as("a"))
        val r = buckets.select(col("band"), col("bkey"), col("doc_id").as("b"))
        l.join(r, Seq("band", "bkey")).where(col("a") < col("b"))
          .select("a", "b").distinct().localCheckpoint(true)
      }
      println(s"cand rows=${cand.count()}")
      val dt = phase("dt") { TextOps.docTokens(corpus).localCheckpoint(true) }
      val n = phase("verify") {
        val sizes = dt.groupBy("doc_id").agg(count(lit(1)).as("sz"))
        val shared = cand
          .join(dt.select(col("doc_id").as("a"), col("tok")), Seq("a"))
          .join(dt.select(col("doc_id").as("b2"), col("tok").as("tok2")),
            col("b") === col("b2") && col("tok") === col("tok2"))
          .groupBy("a", "b").agg(count(lit(1)).as("shared"))
        shared
          .join(sizes.select(col("doc_id").as("a"), col("sz").as("sza")), Seq("a"))
          .join(sizes.select(col("doc_id").as("b"), col("sz").as("szb")), Seq("b"))
          .select(col("a"), col("b"), (col("shared").cast("double") /
            (col("sza") + col("szb") - col("shared"))).as("jacc"))
          .where(col("jacc") >= 0.95).count()
      }
      println(s"RESULT minhash rows=$n sec=${(System.nanoTime()-t0)/1e9}")
    }
    spark.stop()
  }
}
