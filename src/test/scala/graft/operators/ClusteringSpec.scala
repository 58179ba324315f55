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
