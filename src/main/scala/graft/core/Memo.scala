package graft.core

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.DataFrame

/**
 * Process-wide memo of expensive shared intermediates (the engine's
 * materialized-view analogue). The bench/verify loops run 200+
 * queries in one session; the six stream-network tools each derive
 * the same flow-accumulation grid and stream graph from the same DEM
 * (SURVEY.md §2.10), and at high core counts the recompute is pure
 * scheduler tax (BENCH_r03: geo_stream_metrics 17.6 s at local[32]
 * where the shared graph itself computes in ~1 s). Entries are keyed
 * by the *semantic hash of the input plan* plus an operator tag, so a
 * hit is exactly "same logical input, same operator" — the cached
 * frame is an eagerly materialized localCheckpoint, bit-identical to
 * a recompute.
 *
 * Entries register their backing block ids in [[protectedIds]], which
 * [[CacheReaper.reapExcept]] spares; a reaped/lost entry fails the
 * liveness check and is rebuilt transparently.
 */
object Memo {

  private case class Entry(dfs: Seq[DataFrame], ids: Set[Int])

  private val cache = TrieMap.empty[String, Entry]

  /** Block-manager RDD ids backing live memo entries (reaper keep-set). */
  @volatile private var protectedSet: Set[Int] = Set.empty

  def protectedIds: Set[Int] = protectedSet

  /** Key = session identity + semantic hash of the input plan + tag:
    * two calls with the same source data and parameters share one
    * entry; anything else misses. */
  def key(input: DataFrame, tag: String): String =
    System.identityHashCode(input.sparkSession).toString + ":" +
      input.queryExecution.analyzed.semanticHash().toString + ":" + tag

  /** Memoized build of several frames that share one computation
    * (e.g. streamGraph's stream/edges/indegree triple). The builder's
    * outputs are eagerly checkpointed; a later call with the same key
    * returns the materialized frames without recompute. */
  def cachedSeq(k: String, spark: org.apache.spark.sql.SparkSession)
               (build: => Seq[DataFrame]): Seq[DataFrame] = synchronized {
    cache.get(k) match {
      case Some(e) if e.ids.forall(
          spark.sparkContext.getPersistentRDDs.contains) =>
        return e.dfs
      case Some(e) =>
        // partially reaped (external unpersist): drop and rebuild
        protectedSet = protectedSet -- e.ids
        cache.remove(k)
      case None =>
    }
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val dfs = build.map(_.localCheckpoint(eager = true))
    val ids = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    protectedSet = protectedSet ++ ids
    cache.put(k, Entry(dfs, ids))
    dfs
  }

  def cached(k: String, spark: org.apache.spark.sql.SparkSession)
            (build: => DataFrame): DataFrame =
    cachedSeq(k, spark)(Seq(build)).head
}
