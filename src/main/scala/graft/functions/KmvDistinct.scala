package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType}

/** KMV (k-minimum-values) distinct-count sketch as a native Catalyst
  * `TypedImperativeAggregate` — the bounded-state alternative to an exact
  * `count(DISTINCT x)` whose shuffle carries every distinct value. The
  * aggregation state is the k smallest DISTINCT unit-interval hashes of
  * the input (a bounded TreeSet, ≤ k doubles per group on every
  * map/merge side); the estimator is the classic (k−1)/u₍ₖ₎, exact
  * whenever fewer than k distinct values were seen.
  *
  * Everything is deterministic and engine-portable BY CONSTRUCTION — the
  * input is hashed to md5-hex and mapped to [0,1) as a 48-bit integer
  * over 2⁴⁸ (both exact in IEEE doubles), set membership and ordering
  * compare exact doubles, and the final estimate is one IEEE division —
  * so a SQL oracle replays the estimate bit-for-bit with
  * `row_number() OVER (ORDER BY u)` arithmetic. Unlike
  * `approx_count_distinct` (HLL++, engine-specific registers), the
  * result is cross-engine reproducible.
  *
  * 100 TB shape: per-group state is k doubles regardless of input size;
  * partial aggregation runs map-side, merge is a bounded set union.
  */
case class KmvDistinct(child: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[Double]]
    with UnaryLike[Expression] {

  require(k >= 2, s"kmv needs k >= 2; got $k")

  override def createAggregationBuffer(): java.util.TreeSet[Double] =
    new java.util.TreeSet[Double]()

  override def update(buf: java.util.TreeSet[Double], input: InternalRow): java.util.TreeSet[Double] = {
    val v = child.eval(input)
    if (v != null) {
      buf.add(v.asInstanceOf[Double])
      if (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[Double], other: java.util.TreeSet[Double]): java.util.TreeSet[Double] = {
    val it = other.iterator()
    while (it.hasNext) {
      buf.add(it.next())
      if (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[Double]): Any =
    if (buf.size < k) buf.size.toDouble
    else (k - 1).toDouble / buf.last()

  override def serialize(buf: java.util.TreeSet[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putDouble(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[Double]()
    var i = 0
    while (i < n) { buf.add(bb.getDouble); i += 1 }
    buf
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_distinct"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinct =
    copy(child = newChild)
}

object KmvDistinct {
  /** The portable unit-interval hash: first 12 md5-hex digits as a 48-bit
    * integer over 2⁴⁸ — exact in IEEE doubles, replayable in any engine. */
  def unitHash(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 12), 16, 10).cast("double") /
      lit(281474976710656.0) // 16^12

  /** Aggregate column: KMV distinct-count estimate of `c` (nulls skipped,
    * estimate exact below k distinct values). */
  def kmvDistinct(c: Column, k: Int): Column =
    GraftSqlBridge.column(
      KmvDistinct(GraftSqlBridge.expression(unitHash(c)), k).toAggregateExpression())
}
