package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch harness: phase-level timing of minhashLshPairs internals
  * on the ScalingBench corpus (iteration aid, not part of the driver
  * contract). */
object MhExp {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE", "1600").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val nPart = cpus.toInt * 3
    val nDocs = 10000L * factor / 50
    val base = spark.range(nDocs).as[Long].map { i =>
      val rnd = new scala.util.Random(i)
      val toks = Array.fill(30)(s"w${rnd.nextInt(5000)}")
      (i, toks.mkString(" "))
    }.toDF("doc_id", "text")
    val corpus = base.unionByName(
        base.select((col("doc_id") + 10000000L).as("doc_id"),
          expr("array_join(slice(split(text, ' '), 1, 28), ' ')")
            .as("text")))
      .repartition(nPart).localCheckpoint(true)
    println(s"corpus: ${corpus.count()}")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[mh] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    for (pass <- 1 to 2) {
      println(s"--- pass $pass")
      val groups = t("groups-checkpoint") {
        corpus
          .select(col("doc_id"),
            sort_array(array_distinct(transform(
              operators.TextOps.tokens(col("text")),
              tk => xxhash64(tk)))).as("ts"))
          .groupBy(xxhash64(col("ts")).as("__h1"),
            xxhash64(reverse(col("ts"))).as("__h2"),
            size(col("ts")).as("__sz"))
          .agg(first(col("ts")).as("ts"),
            min(col("doc_id")).as("rep"),
            sort_array(collect_list(col("doc_id"))).as("members"))
          .select("ts", "rep", "members")
          .localCheckpoint(true)
      }
      t("maxSize")(groups.agg(max(size(col("ts")))).collect())
      val withKey = groups.select(col("rep"),
        size(col("ts")).as("sz"), col("ts"),
        aggregate(col("ts"), lit(0L),
          (a, x) => a.bitwiseXOR(x)).as("fkey"))
      val full = withKey.select(col("rep"), col("sz"),
        col("fkey").as("key"))
      val dels = withKey
        .select(col("rep"), (col("sz") - 1).as("sz"),
          col("fkey"), explode(col("ts")).as("h"))
        .select(col("rep"), col("sz"),
          col("fkey").bitwiseXOR(col("h")).as("key"))
      val keys = full.unionByName(dels).localCheckpoint(true)
      t("keys-checkpoint")(keys.count())
      val l = keys.select(col("key"), col("sz"), col("rep").as("ra"))
      val r = keys.select(col("key"), col("sz"), col("rep").as("rb"))
      t("join-count-only") {
        println("joined rows: " + l.join(r, Seq("key", "sz")).count())
      }
      t("groupkeys") {
        println("distinct keys: " +
          keys.groupBy("key", "sz").count()
            .agg(max(col("count")), count(lit(1))).collect().toSeq)
      }
      val cand = t("selfjoin-distinct") {
        val c = l.join(r, Seq("key", "sz"))
          .where(col("ra") < col("rb"))
          .select("ra", "rb").distinct().localCheckpoint(true)
        println(s"cand: ${c.count()}")
        c
      }
      if (pass == 2) {
        l.join(r, Seq("key", "sz")).where(col("ra") < col("rb"))
          .select("ra", "rb").distinct().explain()
      }
      t("verify") {
        val ga = groups.select(col("rep").as("ra"), col("ts").as("tsa"),
          col("members").as("ma"))
        val gb = groups.select(col("rep").as("rb"), col("ts").as("tsb"),
          col("members").as("mb"))
        val n = cand.join(ga, Seq("ra")).join(gb, Seq("rb"))
          .withColumn("__shared",
            size(array_intersect(col("tsa"), col("tsb"))))
          .withColumn("jacc", col("__shared").cast("double") /
            (size(col("tsa")) + size(col("tsb")) - col("__shared")))
          .where(col("jacc") >= 0.95)
          .select(explode(col("ma")).as("da"), col("mb"), col("jacc"))
          .select(col("da"), explode(col("mb")).as("db"), col("jacc"))
          .count()
        println(s"verified: $n")
      }
      graft.core.CacheReaper.reapExcept(spark,
        Set.empty[Int] ++ spark.sparkContext.getPersistentRDDs.keySet
          .filter(_ <= 10))
    }
    spark.stop()
  }
}
