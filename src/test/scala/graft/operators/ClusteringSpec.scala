package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ClusteringSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val dir = "/root/testdata/sf0.001"

  test("k-means partitions every vector into a live cluster") {
    val emb = Derived.table(spark, dir, "embeddings")
    val (assignments, cents) = Clustering.kMeans(emb, k = 8, iters = 2)
    assert(assignments.count() === emb.count())
    val nClusters = assignments.select("cluster").distinct().count()
    assert(nClusters >= 2 && nClusters <= 8)
    // centroids exist exactly for the live clusters
    assert(cents.select("cluster").distinct().count() === nClusters)
  }

  test("isodata splits a high-variance cluster and recovers 3 blobs") {
    import spark.implicits._
    // three tight 2-D blobs; k0 = 2 forces at least one split
    val pts = (0L until 30L).map { i =>
      val blob = i % 3
      val base = blob match {
        case 0 => (0.0, 0.0)
        case 1 => (100.0, 0.0)
        case _ => (0.0, 100.0)
      }
      (i, Array(base._1 + (i % 5) * 0.01, base._2 + (i % 7) * 0.01))
    }.toDF("vec_id", "embedding")
    val (assignments, cents) = Clustering.isodata(pts, k0 = 2,
      iters = 6, minSize = 2, maxK = 5, splitVar = 1.0)
    assert(assignments.count() === 30)
    val byBlob = assignments.collect()
      .map(r => (r.getLong(0) % 3, r.getLong(1)))
      .groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).toSet }
    // every blob ends up in exactly one cluster, distinct across blobs
    byBlob.values.foreach(s => assert(s.size == 1))
    assert(byBlob.values.map(_.head).toSet.size == 3)
    val nClusters = cents.select("cluster").distinct().count()
    assert(nClusters >= 3 && nClusters <= 5)
  }

  test("trained IVF reaches recall@5 >= 0.9 vs brute force") {
    val emb = Derived.table(spark, dir, "embeddings")
    val queries = emb.where(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, 5)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Clustering
      .ivfTrainedTopK(emb, queries, k = 5, nlist = 8, iters = 2,
        nprobe = 3)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall@5 = $recall")
  }
}
