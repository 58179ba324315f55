package graft.core

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TestSpark

/** The r5 Memo contract: only the RETURNED frames' blocks are
  * protected (interior build checkpoints stay reapable), hits return
  * the materialized frames, and the table LRU-evicts past its cap
  * releasing protection. */
class MemoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("hit returns cached frames; interior checkpoints stay reapable") {
    import spark.implicits._
    val in = Seq((1L, 2.0), (2L, 3.0)).toDF("k", "v")
    var builds = 0
    var interiorId = -1
    val key = Memo.key(in, "memospec-a")
    val out1 = Memo.cached(key, spark) {
      builds += 1
      // interior checkpoint (like a per-round lineage truncation)
      val interior = in.withColumn("v2", col("v") * 2)
        .localCheckpoint(true)
      interiorId = interior.rdd.id
      interior.withColumn("v3", col("v2") + 1)
    }
    assert(builds == 1)
    val out2 = Memo.cached(key, spark) { builds += 1; in }
    assert(builds == 1, "second call must hit, not rebuild")
    assert(out1.collect().toSeq == out2.collect().toSeq)
    // the interior checkpoint is NOT in the protected set
    val prot = Memo.protectedIds
    assert(prot.nonEmpty, "the returned frame's blocks are protected")
    // reap everything unprotected: the hit must survive
    CacheReaper.reapExcept(spark, Set.empty)
    val out3 = Memo.cached(key, spark) { builds += 1; in }
    assert(builds == 1, "reap of unprotected blocks must not evict the entry")
    assert(out3.count() == 2)
  }

  test("LRU cap evicts old entries and releases their protection") {
    import spark.implicits._
    val before = Memo.protectedIds.size
    val keys = (0 until 40).map { i =>
      val in = Seq((i.toLong, i.toDouble)).toDF("k", "v")
      val k = Memo.key(in, s"memospec-lru-$i")
      Memo.cached(k, spark) { in.withColumn("w", col("v") + i) }
      k
    }
    // the cap is 32: the earliest entries must have been evicted
    var rebuilt = 0
    val in0 = Seq((0L, 0.0)).toDF("k", "v")
    Memo.cached(keys.head, spark) { rebuilt += 1; in0 }
    assert(rebuilt == 1, "evicted key must rebuild")
    assert(Memo.protectedIds.size <= before + 33,
      "protection must not grow unboundedly")
  }
}
