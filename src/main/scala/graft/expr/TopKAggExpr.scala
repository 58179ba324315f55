package graft.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/**
 * Bounded top-k as a [[TypedImperativeAggregate]] — the fast path of
 * ObjectHashAggregate. The earlier `udaf(Aggregator)` form paid an
 * ExpressionEncoder round-trip per INPUT ROW (case-class
 * materialisation of every candidate); with billions of candidate
 * rows streaming through the kNN rounds and the ANN cross join, that
 * conversion dominated the query. Here `update` reads the two child
 * expressions straight off the InternalRow and runs the primitive
 * insertion buffer — no per-row allocation beyond the child eval.
 *
 * Ordering contract matches [[graft.operators.TopK]]: ascending
 * (key, id), ties to the smaller id; sentinel slots are
 * (+Infinity, Long.MaxValue), trimmed at eval. Null keys/ids are
 * skipped. Output: struct(ks: array&lt;double&gt;, ids: array&lt;long&gt;).
 */
case class SmallestKAgg(
    k: Int,
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SmallestKAgg.Buf]
  with BinaryLike[Expression] {

  import SmallestKAgg.Buf

  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("ks", ArrayType(DoubleType, containsNull = false)),
    StructField("ids", ArrayType(LongType, containsNull = false))))

  override def createAggregationBuffer(): Buf =
    new Buf(Array.fill(k)(Double.PositiveInfinity),
      Array.fill(k)(Long.MaxValue))

  @inline private def lt(k1: Double, i1: Long, k2: Double,
                         i2: Long): Boolean =
    k1 < k2 || (k1 == k2 && i1 < i2)

  override def update(b: Buf, input: InternalRow): Buf = {
    val kv = left.eval(input)
    if (kv != null) {
      val iv = right.eval(input)
      if (iv != null) {
        val key = kv.asInstanceOf[Double]
        val id = iv.asInstanceOf[Long]
        val ks = b.ks
        val ids = b.ids
        if (lt(key, id, ks(k - 1), ids(k - 1))) {
          var pos = k - 1
          while (pos > 0 && lt(key, id, ks(pos - 1), ids(pos - 1))) {
            ks(pos) = ks(pos - 1)
            ids(pos) = ids(pos - 1)
            pos -= 1
          }
          ks(pos) = key
          ids(pos) = id
        }
      }
    }
    b
  }

  override def merge(a: Buf, b: Buf): Buf = {
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
    new Buf(ks, ids)
  }

  override def eval(b: Buf): Any = {
    var n = k
    while (n > 0 && b.ids(n - 1) == Long.MaxValue &&
      b.ks(n - 1) == Double.PositiveInfinity) n -= 1
    InternalRow(new GenericArrayData(b.ks.take(n)),
      new GenericArrayData(b.ids.take(n)))
  }

  override def serialize(b: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(16 * k)
    var i = 0
    while (i < k) {
      bb.putDouble(b.ks(i)); bb.putLong(b.ids(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val ks = new Array[Double](k)
    val ids = new Array[Long](k)
    var i = 0
    while (i < k) {
      ks(i) = bb.getDouble(); ids(i) = bb.getLong(); i += 1
    }
    new Buf(ks, ids)
  }

  override def withNewMutableAggBufferOffset(o: Int): SmallestKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SmallestKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): SmallestKAgg = copy(left = l, right = r)
  override def prettyName: String = "smallest_k"
}

object SmallestKAgg {
  /** Parallel primitive arrays sorted ascending by (key, id). */
  final class Buf(val ks: Array[Double], val ids: Array[Long])

  /** Column form: drop-in for TopK.smallestK(k)(key, id). */
  def smallestK(k: Int)(key: Column, id: Column): Column =
    Bridge.column(AggregateExpression(
      SmallestKAgg(k, Bridge.expression(key), Bridge.expression(id)),
      Complete, isDistinct = false))
}
