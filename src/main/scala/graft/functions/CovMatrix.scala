package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Aggregation state of [[CovMatrix]]: per upper-triangle cell (i ≤ j) the
  * exact decimal Σ xᵢxⱼ and contributing-row count, plus per dimension the
  * exact decimal Σ xᵢ and count — everything [[graft.pipeline.Clustering]]
  * needs for a covariance matrix, from ONE pass with no row expansion. */
final class CovBuffer {
  // key: (i << 32) | j for cells, d for dims; value: (count, exact sum)
  val cells = new java.util.HashMap[Long, CovBuffer.Cell]()
  val dims = new java.util.HashMap[Long, CovBuffer.Cell]()
}

object CovBuffer {
  final class Cell {
    var n: Long = 0L
    var sum: java.math.BigDecimal = java.math.BigDecimal.ZERO
  }

  def cell(m: java.util.HashMap[Long, Cell], key: Long): Cell = {
    var c = m.get(key)
    if (c == null) { c = new Cell; m.put(key, c) }
    c
  }

  /** The double→decimal(·,10) quantum Spark's `cast(x AS decimal(30,10))`
    * applies per addend: shortest-representation decimal of the double
    * (`BigDecimal.valueOf`), rounded HALF_UP to scale 10. Summing these
    * exactly reproduces the decimal-sum column the long-form plan built. */
  def quantize(p: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(p).setScale(10, java.math.RoundingMode.HALF_UP)
}

/** cov_matrix(vec): the full upper-triangle second-moment table of an
  * embedding column as ONE `TypedImperativeAggregate` — the narrow
  * replacement for the `explode(d(d+1)/2 structs per row) → groupBy(i, j)`
  * plan, which amplified every corpus row ~d²/2× before the (map-side
  * combinable, but still amplified) hash aggregation. Here the fold is
  * row-local: state is ~d²/2 (count, exact decimal sum) cells per
  * partition regardless of corpus size, the merge is cell-wise decimal
  * addition, and the corpus is scanned exactly once for BOTH the products
  * and the per-dimension means.
  *
  * Decimal semantics are pinned to the plan it replaces (and to the SQL
  * oracle that replays it): each product/element is quantized like
  * Spark's `cast(double AS decimal(30,10))` — shortest-repr decimal,
  * HALF_UP to scale 10 ([[CovBuffer.quantize]]) — and summed EXACTLY, so
  * the result is partition-order independent and bit-identical to
  * `sum(cast(p AS decimal(30,10)))`.
  *
  * Ragged/null semantics match the explode form: a row contributes cell
  * (i, j) iff its array has both positions (counted even when an element
  * is null — the explode emitted the pair row regardless), but a product
  * with any null factor adds nothing to the sum; per-dim counts include
  * null elements, per-dim sums skip them. Null arrays contribute nothing.
  *
  * Returns struct<cells: array<struct<i, j, n, sxy: decimal(38,10)>>,
  * dims: array<struct<d, n, sx: decimal(38,10)>>>, cell arrays sorted by
  * key for a deterministic wire shape. */
case class CovMatrix(child: Expression,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CovBuffer] with UnaryLike[Expression] {

  override def createAggregationBuffer(): CovBuffer = new CovBuffer

  override def update(buf: CovBuffer, input: InternalRow): CovBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[ArrayData]
      val n = a.numElements()
      var i = 0
      while (i < n) {
        val iNull = a.isNullAt(i)
        val x = if (iNull) 0.0 else a.getDouble(i)
        val dc = CovBuffer.cell(buf.dims, i.toLong)
        dc.n += 1
        if (!iNull) dc.sum = dc.sum.add(CovBuffer.quantize(x))
        var j = i
        while (j < n) {
          val c = CovBuffer.cell(buf.cells, (i.toLong << 32) | j.toLong)
          c.n += 1
          if (!iNull && !a.isNullAt(j))
            c.sum = c.sum.add(CovBuffer.quantize(x * a.getDouble(j)))
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: CovBuffer, other: CovBuffer): CovBuffer = {
    def mergeMap(dst: java.util.HashMap[Long, CovBuffer.Cell],
                 src: java.util.HashMap[Long, CovBuffer.Cell]): Unit = {
      val it = src.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = CovBuffer.cell(dst, e.getKey)
        c.n += e.getValue.n
        c.sum = c.sum.add(e.getValue.sum)
      }
    }
    mergeMap(buf.cells, other.cells)
    mergeMap(buf.dims, other.dims)
    buf
  }

  private def toRows(m: java.util.HashMap[Long, CovBuffer.Cell],
                     split: Boolean): GenericArrayData = {
    val keys = new Array[Long](m.size)
    val it = m.keySet().iterator()
    var i = 0
    while (it.hasNext) { keys(i) = it.next(); i += 1 }
    java.util.Arrays.sort(keys)
    new GenericArrayData(keys.map { k =>
      val c = m.get(k)
      val sum = Decimal(scala.math.BigDecimal(c.sum.setScale(10)), 38, 10)
      if (split)
        new GenericInternalRow(Array[Any](k >> 32, k & 0xffffffffL, c.n, sum))
      else
        new GenericInternalRow(Array[Any](k, c.n, sum))
    }.asInstanceOf[Array[Any]])
  }

  override def eval(buf: CovBuffer): Any =
    new GenericInternalRow(Array[Any](
      toRows(buf.cells, split = true), toRows(buf.dims, split = false)))

  override def serialize(buf: CovBuffer): Array[Byte] = {
    def bytes(m: java.util.HashMap[Long, CovBuffer.Cell]): Seq[(Long, Long, Array[Byte])] = {
      val out = Seq.newBuilder[(Long, Long, Array[Byte])]
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        out += ((e.getKey, e.getValue.n, e.getValue.sum.unscaledValue().toByteArray))
      }
      out.result()
    }
    val cs = bytes(buf.cells)
    val ds = bytes(buf.dims)
    val size = 8 + (cs ++ ds).map(t => 20 + t._3.length).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(cs.size); bb.putInt(ds.size)
    (cs ++ ds).foreach { case (k, n, u) =>
      bb.putLong(k); bb.putLong(n); bb.putInt(u.length); bb.put(u)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CovBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val ncells = bb.getInt
    val ndims = bb.getInt
    val buf = new CovBuffer
    def read(m: java.util.HashMap[Long, CovBuffer.Cell], count: Int): Unit = {
      var i = 0
      while (i < count) {
        val k = bb.getLong
        val c = new CovBuffer.Cell
        c.n = bb.getLong
        val len = bb.getInt
        val u = new Array[Byte](len)
        bb.get(u)
        c.sum = new java.math.BigDecimal(new java.math.BigInteger(u), 10)
        m.put(k, c)
        i += 1
      }
    }
    read(buf.cells, ncells)
    read(buf.dims, ndims)
    buf
  }

  // the buffer stores scale-10 decimals exactly; 38 digits of precision is
  // the widest Spark decimal and matches sum(decimal(30,10))'s result type
  private val sumType = DecimalType(38, 10)
  override def dataType: DataType = StructType(Seq(
    StructField("cells", ArrayType(StructType(Seq(
      StructField("i", LongType, nullable = false),
      StructField("j", LongType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("sxy", sumType, nullable = false))), containsNull = false),
      nullable = false),
    StructField("dims", ArrayType(StructType(Seq(
      StructField("d", LongType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("sx", sumType, nullable = false))), containsNull = false),
      nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cov_matrix"

  override def withNewMutableAggBufferOffset(newOffset: Int): CovMatrix =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CovMatrix =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CovMatrix =
    copy(child = newChild)
}

object CovMatrix {
  /** Aggregate column: the one-pass covariance second-moment table of an
    * array<double> column (see [[CovMatrix]]). */
  def covMatrix(c: Column): Column =
    GraftSqlBridge.column(
      CovMatrix(GraftSqlBridge.expression(c)).toAggregateExpression())
}

/** centered_projection(vec, means, loadings): the per-row PCA coordinates
  * Σᵢ (xᵢ − mᵢ)·lᵢ as EXACT decimal sums, one struct per component — the
  * row-local replacement for `posexplode → broadcast joins →
  * groupBy(id, component) + decimal sum`, whose aggregation re-keyed the
  * whole corpus by row id. Addends are quantized exactly like
  * `cast((x − m) * l AS decimal(30,10))` ([[CovBuffer.quantize]]) and
  * summed exactly, so every coordinate is bit-identical to the aggregation
  * it replaces. `means` is the d-array of dimension means; `loadings` is
  * the component-sorted array<struct<component, l: array<double>>>.
  * Dimensions beyond any input's length contribute nothing (the join-form
  * dropped them); null elements add nothing to their sum (the decimal cast
  * of a null product was skipped by sum()); a null vec yields null.
  * Interpreted (decimal arithmetic does not codegen), like the aggregate
  * form it mirrors. */
case class CenteredProjection(vec: Expression, means: Expression, loads: Expression)
  extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def prettyName: String = "centered_projection"
  override def children: Seq[Expression] = Seq(vec, means, loads)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("component", LongType, nullable = false),
    StructField("s", DecimalType(38, 10), nullable = true))), containsNull = false)

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    val m = means.eval(input)
    val l = loads.eval(input)
    if (v == null || m == null || l == null) return null
    // a zero-length vector produced no exploded rows (hence no groups) in
    // the aggregation form — mirror that by yielding null (explode drops it)
    if (v.asInstanceOf[ArrayData].numElements() == 0) return null
    val va = v.asInstanceOf[ArrayData]
    val ma = m.asInstanceOf[ArrayData]
    val la = l.asInstanceOf[ArrayData]
    val out = new Array[Any](la.numElements())
    var k = 0
    while (k < la.numElements()) {
      val row = la.getStruct(k, 2)
      val comp = row.getLong(0)
      val larr = row.getArray(1)
      val n = math.min(va.numElements(), math.min(ma.numElements(), larr.numElements()))
      var sum: java.math.BigDecimal = null
      var i = 0
      while (i < n) {
        if (!va.isNullAt(i) && !ma.isNullAt(i) && !larr.isNullAt(i)) {
          val p = (va.getDouble(i) - ma.getDouble(i)) * larr.getDouble(i)
          val q = CovBuffer.quantize(p)
          sum = if (sum == null) q else sum.add(q)
        }
        i += 1
      }
      out(k) = new GenericInternalRow(Array[Any](comp,
        if (sum == null) null else Decimal(scala.math.BigDecimal(sum.setScale(10)), 38, 10)))
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(vec = newChildren(0), means = newChildren(1), loads = newChildren(2))
}

object CenteredProjection {
  def centeredProjection(vec: Column, means: Column, loads: Column): Column =
    GraftSqlBridge.column(CenteredProjection(
      GraftSqlBridge.expression(vec), GraftSqlBridge.expression(means),
      GraftSqlBridge.expression(loads)))
}
