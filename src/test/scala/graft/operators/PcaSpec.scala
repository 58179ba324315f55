package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class PcaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("PCA components are orthonormal eigenvectors of the covariance") {
    val emb = Derived.table(spark, "/root/testdata/sf0.001", "embeddings")
    val cov = Clustering.covarianceMatrix(emb).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val dim = cov.keys.map(_._2).max + 1
    def c(i: Int, j: Int) =
      cov.getOrElse((math.min(i, j), math.max(i, j)), 0.0)
    val (vals, vecs) = Clustering.pca(emb, 5)
    assert(vals.length === 5 && vecs.length === 5)
    // eigenvalues descending and non-negative (covariance is PSD)
    assert(vals.sliding(2).forall(p => p(0) >= p(1) - 1e-9))
    assert(vals.forall(_ >= -1e-9))
    for (k <- 0 until 5) {
      val v = vecs(k)
      // unit norm
      assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9)
      // C v = lambda v
      for (i <- 0 until dim) {
        val cv = (0 until dim).map(j => c(i, j) * v(j)).sum
        assert(math.abs(cv - vals(k) * v(i)) < 1e-6, s"row $i comp $k")
      }
      // orthogonal to the others
      for (l <- 0 until k) {
        val dot = v.zip(vecs(l)).map { case (a, b) => a * b }.sum
        assert(math.abs(dot) < 1e-7)
      }
    }
  }

  test("inverse PCA reconstructs exactly at full rank, monotonically " +
      "better with more components") {
    val emb = Derived.table(spark, "/root/testdata/sf0.001", "embeddings")
    val orig = Similarity.exploded(emb).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val dim = orig.keys.map(_._2).max + 1
    def err(k: Int): Double = {
      val rec = Clustering.inversePca(emb, k).collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
      assert(rec.keySet == orig.keySet)
      rec.map { case (key, v) =>
        val d = v - orig(key); d * d
      }.sum
    }
    val eFull = err(dim)
    assert(eFull < 1e-12, s"full-rank reconstruction error $eFull")
    val e1 = err(1); val e3 = err(3)
    assert(e1 > e3 && e3 > eFull,
      s"errors must fall with rank: $e1 -> $e3 -> $eFull")
  }
}
