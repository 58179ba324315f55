package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Iterative centroid clustering over the embeddings table — the
 * reference's kMeansClassification / ModifiedKMeans family
 * (ImageProcessingTools/kMeansClassification.java; SURVEY.md §2.4
 * "iterative groupBy(cluster).agg(avg) loop") applied to embedding
 * vectors, which also provides the trained coarse quantizer the IVF
 * ANN index needs (SURVEY's ann scale path).
 *
 * Determinism contract (cross-engine reproducible): seeded init =
 * the first k vectors by id; squared distances and centroid means
 * are rounded to 6 decimals each iteration; argmin ties break to the
 * smallest cluster id. Fixed iteration count (no convergence test).
 */
object Clustering {

  private def d2(ev: Column, cv: Column): Column =
    round(sum((ev - cv) * (ev - cv)), 6)

  /** Nearest-centroid assignment. e: (vec_id, pos, ev);
    * centroids: (cluster, pos, cv). -> (vec_id, cluster). */
  def assign(e: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id")
      .orderBy(col("d2").asc, col("cluster").asc)
    e.join(broadcast(centroids), Seq("pos"))
      .groupBy(col("vec_id"), col("cluster"))
      .agg(d2(col("ev"), col("cv")).as("d2"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select("vec_id", "cluster")
  }

  /** Catalyst `round(_, 6)` semantics for doubles (HALF_UP on the
    * decimal form) — keeps the fused trainer on the same round-6
    * determinism contract as the relational/SQL mirror. */
  private def round6(x: Double): Double =
    new java.math.BigDecimal(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Nearest-centroid index over a broadcast centroid table sorted by
    * cluster id: strict `<` on the round-6 squared distance = argmin
    * with ties to the smallest id, the [[assign]] contract. */
  private def assignIdx(cents: Array[(Long, Array[Double])],
                        a: Array[Float]): Int = {
    var best = Double.MaxValue
    var bestIx = 0
    var ci = 0
    while (ci < cents.length) {
      val cv = cents(ci)._2
      var s = 0.0
      var i = 0
      while (i < cv.length) {
        val d = a(i).toDouble - cv(i); s += d * d; i += 1
      }
      val r = round6(s)
      if (r < best) { best = r; bestIx = ci }
      ci += 1
    }
    bestIx
  }

  /**
   * `iters` rounds of assign + mean update from the first-k-ids init.
   * Returns (finalAssignments, finalCentroids (cluster, pos, cv)).
   *
   * Executed the 100 TB way: centroids are a broadcast k x d array,
   * each iteration is ONE mapPartitions pass emitting k x d partial
   * sums per partition (classic distributed k-means — no exploded-row
   * shuffle, no per-(vec, cluster) window rank), and the only shuffle
   * is the tiny (cluster, pos) partial-sum aggregate. Same trajectory
   * as the relational/SQL mirror under the round-6 contract: squared
   * distances and centroid means round to 6 dp each round, argmin
   * ties break to the smallest cluster id.
   */
  def kMeans(emb: DataFrame, k: Int, iters: Int): (DataFrame, DataFrame) = {
    val spark = emb.sparkSession
    import spark.implicits._
    val (assignments, cent) = kMeansArrays(emb, k, iters)
    val centDf = cent.toSeq.flatMap { case (cid, cv) =>
      cv.indices.map(i => (cid, i, cv(i)))
    }.toDF("cluster", "pos", "cv")
    (assignments, centDf)
  }

  /** [[kMeans]] core returning the trained centroids as the broadcast
    * array form (cluster id, vector), sorted by id. */
  def kMeansArrays(emb: DataFrame, k: Int, iters: Int)
      : (DataFrame, Array[(Long, Array[Double])]) = {
    val spark = emb.sparkSession
    import spark.implicits._
    val ev = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].localCheckpoint(true)
    var cent: Array[(Long, Array[Double])] =
      ev.filter(_._1 < k).collect().sortBy(_._1)
        .map { case (id, a) => (id, a.map(_.toDouble)) }
    for (_ <- 1 to iters) {
      val bc = spark.sparkContext.broadcast(cent)
      val partials = ev.mapPartitions { it =>
        val cs = bc.value
        val kk = cs.length
        val d = cs.head._2.length
        val sums = Array.fill(kk)(new Array[Double](d))
        val cnts = new Array[Long](kk)
        it.foreach { case (_, a) =>
          val ci = assignIdx(cs, a)
          val s = sums(ci)
          var i = 0
          while (i < d) { s(i) += a(i).toDouble; i += 1 }
          cnts(ci) += 1
        }
        (0 until kk).iterator.filter(cnts(_) > 0).flatMap { ci =>
          (0 until d).iterator.map(i =>
            (cs(ci)._1, i, sums(ci)(i), cnts(ci)))
        }
      }.toDF("cluster", "pos", "s", "n")
        .groupBy("cluster", "pos")
        .agg(sum(col("s")).as("s"), sum(col("n")).as("n"))
        .collect()
      cent = partials.groupBy(_.getLong(0)).toArray.sortBy(_._1)
        .map { case (cid, rows) =>
          val d = rows.length
          val cv = new Array[Double](d)
          rows.foreach(r => cv(r.getInt(1)) =
            round6(r.getDouble(2) / r.getLong(3)))
          (cid, cv)
        }
    }
    val bcF = spark.sparkContext.broadcast(cent)
    val assignments = ev.map { case (id, a) =>
      (id, bcF.value(assignIdx(bcF.value, a))._1)
    }.toDF("vec_id", "cluster")
    (assignments, cent)
  }

  /**
   * ISODATA classification (ImageProcessingTools/
   * IsodataClassification.java semantics, deterministic re-statement):
   * k-means rounds interleaved with structural updates — clusters
   * smaller than `minSize` are DISCARDED (members re-assign next
   * round), and while below `maxK` the cluster with the largest
   * per-dimension variance splits when that variance exceeds
   * `splitVar` (the two children seed at mean ± sqrt(var) on the
   * widest dimension, rounded to 6 decimals). All tie-breaks are by
   * cluster id, so the trajectory is reproducible.
   *
   * Returns (assignments (vec_id, cluster), centroids (cluster, pos,
   * cv)); cluster ids are the seed vector ids and split children take
   * ids maxId+1/maxId+2 at the time of the split.
   */
  def isodata(emb: DataFrame, k0: Int, iters: Int, minSize: Long,
              maxK: Int, splitVar: Double): (DataFrame, DataFrame) = {
    val spark = emb.sparkSession
    import spark.implicits._
    val e = Similarity.exploded(emb).localCheckpoint(true)
    var c = e.where(col("vec_id") < k0)
      .select(col("vec_id").as("cluster"), col("pos"),
        col("ev").as("cv"))
      .localCheckpoint(true)
    var nextId = c.agg(max(col("cluster"))).head().getLong(0) + 1
    for (_ <- 1 to iters) {
      val a = assign(e, c)
      val sizes = a.groupBy("cluster").agg(count(lit(1)).as("sz"))
      val kept = a.join(sizes.where(col("sz") >= minSize)
        .select("cluster"), Seq("cluster"))
      val stats = kept.join(e, Seq("vec_id"))
        .groupBy(col("cluster"), col("pos"))
        .agg(round(avg(col("ev")), 6).as("cv"),
          round(avg(col("ev") * col("ev")) -
            avg(col("ev")) * avg(col("ev")), 6).as("vr"))
        .localCheckpoint(true)
      val nClusters = stats.select("cluster").distinct().count()
      // widest (cluster, pos) by variance, ties to smaller ids
      val worst = stats
        .orderBy(col("vr").desc, col("cluster").asc, col("pos").asc)
        .limit(1).collect().headOption
      c = worst match {
        case Some(w) if nClusters < maxK && w.getDouble(3) > splitVar =>
          val (splitCl, splitPos, splitVr) =
            (w.getLong(0), w.getInt(1), w.getDouble(3))
          val delta = math.sqrt(splitVr)
          val parent = stats.where(col("cluster") === splitCl)
          val others = stats.where(col("cluster") =!= splitCl)
            .select("cluster", "pos", "cv")
          val childA = parent.select(lit(nextId).as("cluster"),
            col("pos"), round(when(col("pos") === splitPos,
              col("cv") - delta).otherwise(col("cv")), 6).as("cv"))
          val childB = parent.select(lit(nextId + 1).as("cluster"),
            col("pos"), round(when(col("pos") === splitPos,
              col("cv") + delta).otherwise(col("cv")), 6).as("cv"))
          nextId += 2
          others.unionByName(childA).unionByName(childB)
            .localCheckpoint(true)
        case _ =>
          stats.select("cluster", "pos", "cv").localCheckpoint(true)
      }
    }
    (assign(e, c), c)
  }

  /**
   * IVF ANN with a TRAINED coarse quantizer: k-means lists, queries
   * probe their `nprobe` nearest lists, exact cosine runs only inside
   * probed lists — probe cost O(N * nprobe / nlist) instead of O(N).
   * Output contract matches Similarity.bruteForceTopK.
   */
  /** Driver-side memo of trained IVF coarse quantizers: at 100 TB
    * you train the lists once and serve many query batches, and the
    * trained index is nlist x dim doubles — trivially driver-sized.
    * Keyed like [[graft.core.Memo]] (semantic hash of the embedding
    * plan + params); capped FIFO at 16 entries. BENCH_r04 measured
    * retrain-per-query as a 2.5 -> 4.1 s regression on ann_ivf. */
  private val ivfIndexCache = scala.collection.mutable.LinkedHashMap
    .empty[String, Array[(Long, Array[Double])]]

  private def trainedCentroids(emb: DataFrame, nlist: Int,
                               iters: Int): Array[(Long, Array[Double])] =
    ivfIndexCache.synchronized {
      val key = graft.core.Memo.key(emb, s"kmeansArrays:$nlist:$iters")
      ivfIndexCache.get(key) match {
        case Some(c) => c
        case None =>
          val c = kMeansArrays(emb, nlist, iters)._2
          while (ivfIndexCache.size >= 16)
            ivfIndexCache.remove(ivfIndexCache.head._1)
          ivfIndexCache.put(key, c)
          c
      }
    }

  def ivfTrainedTopK(emb: DataFrame, queries: DataFrame, k: Int,
                     nlist: Int, iters: Int, nprobe: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cent = trainedCentroids(emb, nlist, iters)
    // probe selection: per query the nprobe nearest lists by round-6
    // squared distance, ties to the smaller cluster id (the
    // relational-rank contract). The probe batch is the small side by
    // contract, so selection runs on the collected batch and ships as
    // a broadcast INVERTED index cluster -> probing queries — list
    // routing, scoring and the per-probe top-k partials then all
    // happen in ONE pass over the embedding table (the 100 TB IVF
    // shape: a map-side GEMM block against broadcast probes, only
    // <= k rows per (probe x partition) ever shuffle).
    val qs = queries.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val inv: Map[Long, Array[(Long, Array[Float], Double)]] = qs
      .flatMap { case (qid, qe) =>
        val qn = math.sqrt(Similarity.dotFF(qe, qe))
        cent.map { case (cid, cv) =>
          var s = 0.0
          var i = 0
          while (i < cv.length) {
            val d = qe(i).toDouble - cv(i); s += d * d; i += 1
          }
          ((round6(s), cid), (qid, qe, qn))
        }.sortBy(_._1).take(nprobe)
          .map { case ((_, cid), q) => (cid, q) }
      }
      .groupBy(_._1).map { case (cid, xs) => cid -> xs.map(_._2) }
    val bcC = spark.sparkContext.broadcast(cent)
    val bcQ = spark.sparkContext.broadcast(inv)
    val sims = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = bcC.value
        val route = bcQ.value
        it.flatMap { case (nid, e) =>
          route.get(cs(assignIdx(cs, e))._1) match {
            case None => Iterator.empty
            case Some(probes) =>
              val nrm = math.sqrt(Similarity.dotFF(e, e))
              probes.iterator.collect {
                case (qid, qe, qn) if qid != nid =>
                  (qid, nid,
                    round6(Similarity.dotFF(e, qe) / (qn * nrm)))
              }
          }
        }
      }.toDF("q_id", "n_id", "sim6")
    val topk = (kc: Column, ic: Column) =>
      graft.expr.SmallestKAgg.smallestK(k)(kc, ic)
    sims.groupBy("q_id")
      .agg(topk(-col("sim6"), col("n_id")).as("__tk"))
      .select(col("q_id"), col("__tk.ks").as("__ks"),
        posexplode(col("__tk.ids")).as(Seq("__pos", "n_id")))
      .select(col("q_id"), col("n_id"),
        (col("__pos") + 1).cast("long").as("rnk"),
        (-element_at(col("__ks"), col("__pos") + 1) + lit(0.0))
          .as("sim6"))
  }

  /**
   * Covariance matrix of the embedding dimensions — the aggregation
   * core of PCAForAttributes (StatsTools/PCAForAttributes.java, 881
   * LoC): one relational pass builds all pairwise cross-sums
   * (partial+final decomposition free from Spark), cov(i,j) =
   * (s_ij - n * mean_i * mean_j) / (n - 1).
   */
  def covarianceMatrix(emb: DataFrame): DataFrame = {
    val e = Similarity.exploded(emb).localCheckpoint(true)
    val means = e.groupBy("pos")
      .agg(sum(col("ev")).as("s"), count(lit(1)).as("n"))
      .select(col("pos"), (col("s") / col("n")).as("m"), col("n"))
    val a = e.select(col("vec_id"), col("pos").as("i"),
      col("ev").as("evi"))
    val b = e.select(col("vec_id"), col("pos").as("j"),
      col("ev").as("evj"))
    a.join(b, Seq("vec_id")).where(col("i") <= col("j"))
      .groupBy("i", "j")
      .agg(sum(col("evi") * col("evj")).as("sij"))
      .join(means.select(col("pos").as("i"), col("m").as("mi"),
        col("n")), Seq("i"))
      .join(means.select(col("pos").as("j"), col("m").as("mj")),
        Seq("j"))
      .select(col("i"), col("j"),
        ((col("sij") - col("n") * col("mi") * col("mj")) /
          (col("n") - 1)).as("cov"))
  }

  /**
   * PCA: eigen decomposition of the covariance matrix (driver-side
   * via commons-math3, exactly where the reference solves it after
   * its accumulation loops). Components sorted by eigenvalue
   * descending; sign fixed so each vector's largest-magnitude
   * coordinate is positive. Returns (eigenvalues, components).
   */
  def pca(emb: DataFrame, nComponents: Int)
      : (Array[Double], Array[Array[Double]]) = {
    val entries = covarianceMatrix(emb).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val dim = entries.keys.map(_._2).max + 1
    val m = Array.tabulate(dim, dim)((i, j) =>
      entries.getOrElse((math.min(i, j), math.max(i, j)), 0.0))
    val eig = new org.apache.commons.math3.linear.EigenDecomposition(
      new org.apache.commons.math3.linear.Array2DRowRealMatrix(m))
    val pairs = (0 until dim).map(k =>
      (eig.getRealEigenvalue(k), eig.getEigenvector(k).toArray))
      .sortBy(-_._1)
      .take(nComponents)
      .map { case (lam, vec) =>
        val iMax = vec.indices.maxBy(i => math.abs(vec(i)))
        val v = if (vec(iMax) < 0) vec.map(-_) else vec
        (lam, v)
      }
    (pairs.map(_._1).toArray, pairs.map(_._2).toArray)
  }

  /**
   * InversePrincipalComponentAnalysis (StatsTools/InversePrincipal
   * ComponentAnalysis.java): reconstruct the attribute space from the
   * first nComponents component images — x_hat = mean + sum_k
   * (v_k . (x - mean)) v_k. The loadings (nComponents x dim, tiny)
   * broadcast into two relational passes (score, back-project); the
   * eigen solve itself is [[pca]].
   */
  def inversePca(emb: DataFrame, nComponents: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val comps = pca(emb, nComponents)._2
    val cdf = comps.zipWithIndex.toSeq.flatMap { case (v, k) =>
      v.zipWithIndex.map { case (w, p) => (k, p, w) }
    }.toDF("k", "pos", "w")
    val e = Similarity.exploded(emb).localCheckpoint(true)
    val means = e.groupBy("pos")
      .agg((sum("ev") / count(lit(1))).as("m"))
    val cent = e.join(means, Seq("pos"))
      .select(col("vec_id"), col("pos"), (col("ev") - col("m")).as("x"))
    val scores = cent.join(broadcast(cdf), Seq("pos"))
      .groupBy("vec_id", "k")
      .agg(sum(col("x") * col("w")).as("score"))
    scores.join(broadcast(cdf), Seq("k"))
      .groupBy("vec_id", "pos")
      .agg(sum(col("score") * col("w")).as("proj"))
      .join(means, Seq("pos"))
      .select(col("vec_id"), col("pos"),
        (col("m") + col("proj")).as("recon"))
  }

  /** DuckDB CTE chain mirroring [[kMeans]] over the `embeddings`
    * view: defines `e`, `c_0`..`c_<iters>` and `a_final`. */
  def kMeansSqlCtes(k: Int, iters: Int): String = {
    val sb = new StringBuilder
    sb ++=
      s"""e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         |  CAST(unnest(embedding) AS DOUBLE) AS ev FROM embeddings),
         |c_0 AS (SELECT vec_id AS cluster, pos, ev AS cv FROM e WHERE vec_id < $k)""".stripMargin
    def assignCte(name: String, cFrom: String): String =
      s""",
         |${name}_d AS (SELECT e.vec_id, c.cluster,
         |  round(sum((e.ev - c.cv) * (e.ev - c.cv)), 6) AS d2
         |  FROM e JOIN $cFrom c ON c.pos = e.pos GROUP BY 1, 2),
         |$name AS (SELECT vec_id, cluster FROM (
         |  SELECT vec_id, cluster,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
         |  FROM ${name}_d) WHERE rn = 1)""".stripMargin
    for (i <- 1 to iters) {
      sb ++= assignCte(s"a_$i", s"c_${i - 1}")
      sb ++=
        s""",
           |c_$i AS (SELECT a.cluster, e.pos, round(avg(e.ev), 6) AS cv
           |  FROM a_$i a JOIN e ON e.vec_id = a.vec_id GROUP BY 1, 2)""".stripMargin
    }
    sb ++= assignCte("a_final", s"c_$iters")
    sb.toString
  }
}
