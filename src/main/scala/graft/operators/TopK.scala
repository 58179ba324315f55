package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udaf

/**
 * Bounded top-k typed aggregator — the distributed replacement for
 * "rank over a window, keep rnk <= k" when k is small and the
 * candidate set per group can be huge (hot spatial cells, skewed
 * probes). The window formulation shuffles and SORTS every candidate
 * row per group in one partition; this aggregator keeps a fixed
 * k-slot insertion buffer per group with map-side partial
 * aggregation, so the shuffle carries one <=k buffer per (group x
 * input partition) instead of every candidate row — the same
 * heap-bounded search the reference's kd-tree uses per query
 * (WhiteboxAPI/src/whitebox/structures/KdTree.java:918-986,
 * ResultHeap), re-expressed as a Spark `Aggregator` so Catalyst
 * plans it as an ObjectHashAggregate with partial merge.
 *
 * Ordering: ascending (key, id) — ties on the key break to the
 * smallest id, matching the documented kNN contract. Buffers hold
 * primitive arrays (no per-row boxing); sentinel slots are
 * (+Infinity, Long.MaxValue) and are trimmed in `finish`.
 */
object TopK {

  case class KeyId(key: Double, id: Long)

  /** Fixed-width insertion buffer: parallel primitive arrays sorted
    * ascending by (key, id); unused slots hold the +Inf sentinel. */
  case class Buf(ks: Array[Double], ids: Array[Long])

  class TopKAgg(k: Int) extends Aggregator[KeyId, Buf, Buf] {

    @inline private def lt(k1: Double, i1: Long, k2: Double,
                           i2: Long): Boolean =
      k1 < k2 || (k1 == k2 && i1 < i2)

    def zero: Buf = Buf(Array.fill(k)(Double.PositiveInfinity),
      Array.fill(k)(Long.MaxValue))

    def reduce(b: Buf, in: KeyId): Buf = {
      val ks = b.ks
      val ids = b.ids
      if (lt(in.key, in.id, ks(k - 1), ids(k - 1))) {
        var pos = k - 1
        while (pos > 0 && lt(in.key, in.id, ks(pos - 1), ids(pos - 1))) {
          ks(pos) = ks(pos - 1)
          ids(pos) = ids(pos - 1)
          pos -= 1
        }
        ks(pos) = in.key
        ids(pos) = in.id
      }
      b
    }

    def merge(a: Buf, b: Buf): Buf = {
      // classic two-sorted-array merge, first k survivors
      val ks = new Array[Double](k)
      val ids = new Array[Long](k)
      var i = 0
      var j = 0
      var o = 0
      while (o < k) {
        if (lt(a.ks(i), a.ids(i), b.ks(j), b.ids(j))) {
          ks(o) = a.ks(i); ids(o) = a.ids(i); i += 1
        } else {
          ks(o) = b.ks(j); ids(o) = b.ids(j); j += 1
        }
        o += 1
      }
      Buf(ks, ids)
    }

    def finish(b: Buf): Buf = {
      var n = k
      while (n > 0 && b.ids(n - 1) == Long.MaxValue &&
        b.ks(n - 1) == Double.PositiveInfinity) n -= 1
      Buf(b.ks.take(n), b.ids.take(n))
    }

    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
  }

  /** Untyped column form: `smallestK(k)(keyCol, idCol)` returns a
    * struct (ks: array&lt;double&gt;, ids: array&lt;long&gt;) of the k
    * smallest (key, id) pairs in ascending order. */
  def smallestK(k: Int): UserDefinedFunction =
    udaf(new TopKAgg(k), Encoders.product[KeyId])
}
