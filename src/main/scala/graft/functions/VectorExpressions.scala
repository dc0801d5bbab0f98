package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types._
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Native Catalyst expressions for the embedding hot path.
  *
  * Spark's higher-order array functions (`zip_with`, `aggregate`) are
  * CodegenFallback: each row allocates lambda variables and walks the array
  * through the interpreted evaluator — and a cosine needs three such folds.
  * These expressions fuse the three dot products into ONE codegen'd loop
  * over the array data, bit-for-bit reproducing the HOF formulation
  * (same left-fold accumulation order, same float→double widening), so
  * swapping them in cannot change any result, only the cost.
  *
  * Semantics (identical to the zip_with/aggregate composition):
  *  - null array, mismatched lengths, or any null element → null;
  *  - empty arrays → 0.0 for dot, NaN for cosine (0/0);
  *  - elements are widened to double before multiplying.
  * One deliberate divergence: a zero-norm input makes the HOF divide THROW
  * under ANSI mode (Spark 4 default); the native cosine yields IEEE NaN —
  * the behavior of every SQL engine's cosine function, and the right call
  * for a pipeline operator (a single all-zeros embedding must not kill a
  * 100 TB job).
  */
abstract class VectorFoldExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  protected def leftElem: DataType = left.dataType.asInstanceOf[ArrayType].elementType
  protected def rightElem: DataType = right.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(et, _) =>
        et == FloatType || et == DoubleType || et == IntegerType || et == LongType
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double|int|bigint> inputs, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  protected def elemAt(arr: ArrayData, i: Int, et: DataType): Double = et match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case other => throw new IllegalStateException(s"unreachable element type $other")
  }
}

/** dot(a, b) = Σ aᵢ·bᵢ as one codegen'd loop. SQL name: graft_dot. */
case class DotProduct(left: Expression, right: Expression) extends VectorFoldExpression {
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += elemAt(a, i, leftElem) * elemAt(b, i, rightElem)
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (double) (${CodeGenerator.getValue(a, leftElem, i)})
         |          * (double) (${CodeGenerator.getValue(b, rightElem, i)});
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** cosine(a, b) = Σaᵢbᵢ / (√Σaᵢ² · √Σbᵢ²), all three sums fused into one
  * codegen'd loop (the HOF form walks the arrays three times, interpreted).
  * SQL name: graft_cosine. */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorFoldExpression {
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dab = 0.0
    var daa = 0.0
    var dbb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = elemAt(a, i, leftElem)
      val y = elemAt(b, i, rightElem)
      dab += x * y
      daa += x * x
      dbb += y * y
      i += 1
    }
    dab / (math.sqrt(daa) * math.sqrt(dbb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dab = ctx.freshName("dab")
      val daa = ctx.freshName("daa")
      val dbb = ctx.freshName("dbb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dab = 0.0, $daa = 0.0, $dbb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $x = (double) (${CodeGenerator.getValue(a, leftElem, i)});
         |    final double $y = (double) (${CodeGenerator.getValue(b, rightElem, i)});
         |    $dab += $x * $y; $daa += $x * $x; $dbb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dab / (java.lang.Math.sqrt($daa) * java.lang.Math.sqrt($dbb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** nearest_centroid(vec, cents): the argmin of a distance score over a
  * BROADCAST centroid array, folded row-locally — the narrow replacement
  * for the `crossJoin(broadcast(cents)).groupBy(rowId).agg(min(struct))`
  * assignment shape, which shuffles the whole corpus (vectors aboard) once
  * per assignment. With this kernel the assignment is a pure projection:
  * zero exchanges, and the n×k scored expansion never exists as rows.
  *
  * `cents` is array<struct<cid: bigint, centroid: array<numeric>>> (one
  * collected row, broadcast by the caller). `metric` picks the score:
  *  - [[NearestCentroid.L2]]: d = v·v − 2 v·c + c·c, each dot the same
  *    left fold as [[DotProduct]] — bit-identical to the crossJoin form's
  *    `dotNative(v,v) - dotNative(v,c) * 2.0 + dotNative(c,c)`;
  *  - [[NearestCentroid.NegCos]]: d = −(Σvc / (√Σv²·√Σc²)), the exact
  *    negation of [[CosineSimilarity]] (NaN for a zero-norm side).
  * Ties and NaN follow Spark's double ordering (−0.0 == 0.0; NaN largest,
  * NaN == NaN), then smallest cid — exactly the min(struct(d, cid))
  * winner. Returns struct<d: double, cid: bigint>.
  *
  * Null semantics (deliberately STRICTER than the crossJoin form, whose
  * null-scored candidates fell into struct-ordering limbo): a null vec,
  * null element in vec, or null/empty cents → null result; a candidate
  * with a null cid/centroid, a null element, or a mismatched length is
  * SKIPPED (never wins with an undefined score). */
case class NearestCentroid(left: Expression, right: Expression, metric: Int)
  extends BinaryExpression {
  override def prettyName: String = "graft_nearest_centroid"
  override def dataType: DataType = StructType(Seq(
    StructField("d", DoubleType, nullable = false),
    StructField("cid", LongType, nullable = false)))
  override def nullable: Boolean = true

  private def vecElem: DataType = left.dataType.asInstanceOf[ArrayType].elementType
  private def centElem: DataType = right.dataType.asInstanceOf[ArrayType]
    .elementType.asInstanceOf[StructType].fields(1).dataType
    .asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def num(dt: DataType) =
      dt == FloatType || dt == DoubleType || dt == IntegerType || dt == LongType
    val okVec = left.dataType match {
      case ArrayType(et, _) => num(et)
      case _ => false
    }
    val okCents = right.dataType match {
      case ArrayType(StructType(Array(c0, c1)), _) =>
        c0.dataType == LongType && (c1.dataType match {
          case ArrayType(et, _) => num(et)
          case _ => false
        })
      case _ => false
    }
    if (okVec && okCents && (metric == NearestCentroid.L2 || metric == NearestCentroid.NegCos))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<numeric>, array<struct<bigint, array<numeric>>>) " +
        s"and metric in {0, 1}; got ${left.dataType.catalogString}, " +
        s"${right.dataType.catalogString}, metric=$metric")
  }

  // Spark's SQL double ordering: primitive == first (−0.0 == 0.0), then
  // Double.compare (NaN largest, NaN == NaN)
  private def cmpD(a: Double, b: Double): Int =
    if (a == b) 0 else java.lang.Double.compare(a, b)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val v = l.asInstanceOf[ArrayData]
    val cs = r.asInstanceOf[ArrayData]
    val n = v.numElements()
    var vv = 0.0
    var j = 0
    while (j < n) {
      if (v.isNullAt(j)) return null
      val x = elemAtD(v, j, vecElem)
      vv += x * x
      j += 1
    }
    var found = false
    var bestD = 0.0
    var bestCid = 0L
    var i = 0
    val m = cs.numElements()
    while (i < m) {
      if (!cs.isNullAt(i)) {
        val row = cs.getStruct(i, 2)
        if (!row.isNullAt(0) && !row.isNullAt(1)) {
          val cid = row.getLong(0)
          val c = row.getArray(1)
          if (c.numElements() == n) {
            var vc = 0.0
            var cc = 0.0
            var bad = false
            var p = 0
            while (p < n && !bad) {
              if (c.isNullAt(p)) bad = true
              else {
                val x = elemAtD(v, p, vecElem)
                val y = elemAtD(c, p, centElem)
                vc += x * y
                cc += y * y
              }
              p += 1
            }
            if (!bad) {
              val d =
                if (metric == NearestCentroid.L2) vv - vc * 2.0 + cc
                else -(vc / (math.sqrt(vv) * math.sqrt(cc)))
              val cmp = cmpD(d, bestD)
              if (!found || cmp < 0 || (cmp == 0 && cid < bestCid)) {
                found = true; bestD = d; bestCid = cid
              }
            }
          }
        }
      }
      i += 1
    }
    if (!found) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestD, bestCid))
  }

  private def elemAtD(arr: ArrayData, i: Int, et: DataType): Double = et match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case other => throw new IllegalStateException(s"unreachable element type $other")
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cs) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val vv = ctx.freshName("vv")
      val vc = ctx.freshName("vc")
      val cc = ctx.freshName("cc")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val d = ctx.freshName("d")
      val cmp = ctx.freshName("cmp")
      val found = ctx.freshName("found")
      val bestD = ctx.freshName("bestD")
      val bestCid = ctx.freshName("bestCid")
      val row = ctx.freshName("row")
      val cid = ctx.freshName("cid")
      val cArr = ctx.freshName("cArr")
      val bad = ctx.freshName("bad")
      val score =
        if (metric == NearestCentroid.L2) s"$vv - $vc * 2.0 + $cc"
        else s"-($vc / (java.lang.Math.sqrt($vv) * java.lang.Math.sqrt($cc)))"
      s"""
         |final int $n = $v.numElements();
         |double $vv = 0.0;
         |for (int $j = 0; $j < $n; $j++) {
         |  if ($v.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  final double $x = (double) (${CodeGenerator.getValue(v, vecElem, j)});
         |  $vv += $x * $x;
         |}
         |if (!${ev.isNull}) {
         |  boolean $found = false;
         |  double $bestD = 0.0;
         |  long $bestCid = 0L;
         |  final int $m = $cs.numElements();
         |  for (int $i = 0; $i < $m; $i++) {
         |    if ($cs.isNullAt($i)) continue;
         |    final InternalRow $row = $cs.getStruct($i, 2);
         |    if ($row.isNullAt(0) || $row.isNullAt(1)) continue;
         |    final long $cid = $row.getLong(0);
         |    final ArrayData $cArr = $row.getArray(1);
         |    if ($cArr.numElements() != $n) continue;
         |    double $vc = 0.0, $cc = 0.0;
         |    boolean $bad = false;
         |    for (int $p = 0; $p < $n; $p++) {
         |      if ($cArr.isNullAt($p)) { $bad = true; break; }
         |      final double $x = (double) (${CodeGenerator.getValue(v, vecElem, p)});
         |      final double $y = (double) (${CodeGenerator.getValue(cArr, centElem, p)});
         |      $vc += $x * $y; $cc += $y * $y;
         |    }
         |    if ($bad) continue;
         |    final double $d = $score;
         |    final int $cmp = ($d == $bestD) ? 0 : java.lang.Double.compare($d, $bestD);
         |    if (!$found || $cmp < 0 || ($cmp == 0 && $cid < $bestCid)) {
         |      $found = true; $bestD = $d; $bestCid = $cid;
         |    }
         |  }
         |  if (!$found) { ${ev.isNull} = true; }
         |  else {
         |    ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |      new Object[] { java.lang.Double.valueOf($bestD), java.lang.Long.valueOf($bestCid) });
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object NearestCentroid {
  val L2 = 0
  val NegCos = 1
}

/** int8_scale(vec) = max(|xᵢ|) / 127.0 — the per-vector symmetric-int8
  * quantization scale as ONE codegen'd pass, replacing the
  * posexplode → groupBy(id) → join-back shape (two corpus-keyed exchanges
  * for a row-local statistic). Null elements are skipped like the max()
  * aggregate they replace; a vector with no non-null elements (or a null
  * vector) yields null. */
case class Int8Scale(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_int8_scale"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elem: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(et, _)
      if et == FloatType || et == DoubleType || et == IntegerType || et == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<numeric> input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var mx = 0.0
    var seen = false
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val x = math.abs(elem match {
          case FloatType => a.getFloat(i).toDouble
          case DoubleType => a.getDouble(i)
          case IntegerType => a.getInt(i).toDouble
          case LongType => a.getLong(i).toDouble
          case other => throw new IllegalStateException(s"unreachable element type $other")
        })
        if (!seen || x > mx) mx = x
        seen = true
      }
      i += 1
    }
    if (!seen) null else mx / 127.0
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val mx = ctx.freshName("mx")
      val x = ctx.freshName("x")
      val seen = ctx.freshName("seen")
      s"""
         |final int $n = $a.numElements();
         |double $mx = 0.0;
         |boolean $seen = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) continue;
         |  final double $x = java.lang.Math.abs(
         |    (double) (${CodeGenerator.getValue(a, elem, i)}));
         |  if (!$seen || $x > $mx) { $mx = $x; }
         |  $seen = true;
         |}
         |if (!$seen) { ${ev.isNull} = true; }
         |else { ${ev.value} = $mx / 127.0; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-API entry points for the native expressions. */
object VectorFunctions {
  def dotNative(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProduct(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
  def cosineNative(a: Column, b: Column): Column =
    GraftSqlBridge.column(CosineSimilarity(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
  /** struct<d, cid> of the L2²-nearest centroid in `cents` (see
    * [[NearestCentroid]]). */
  def nearestCentroidL2(vec: Column, cents: Column): Column =
    GraftSqlBridge.column(NearestCentroid(
      GraftSqlBridge.expression(vec), GraftSqlBridge.expression(cents),
      NearestCentroid.L2))
  /** struct<d, cid> of the cosine-NEAREST centroid (d = −cos; see
    * [[NearestCentroid]]). */
  def nearestCentroidNegCos(vec: Column, cents: Column): Column =
    GraftSqlBridge.column(NearestCentroid(
      GraftSqlBridge.expression(vec), GraftSqlBridge.expression(cents),
      NearestCentroid.NegCos))
  /** max(|xᵢ|)/127 — the symmetric-int8 scale (see [[Int8Scale]]). */
  def int8Scale(vec: Column): Column =
    GraftSqlBridge.column(Int8Scale(GraftSqlBridge.expression(vec)))
}

/** SQL surface: install with `spark.sql.extensions=graft.functions.GraftExtensions`
  * at session build, or [[GraftExtensions.register]] on a live session —
  * then `SELECT graft_cosine(emb, query_emb)` works from plain SQL (and the
  * CLI's script/repl verbs). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(ext.injectFunction)
}

object GraftExtensions {
  private def two(name: String, className: String,
                  build: (Expression, Expression) => Expression)
  : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(className, name),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"$name expects exactly 2 arguments, got ${args.length}")
        build(args(0), args(1))
      })

  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    two("graft_dot", classOf[DotProduct].getCanonicalName, DotProduct.apply),
    two("graft_cosine", classOf[CosineSimilarity].getCanonicalName, CosineSimilarity.apply),
    (FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[WordShingleArray].getCanonicalName, "graft_shingles"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"graft_shingles expects (text, n), got ${args.length} arguments")
        require(args(1).foldable, "graft_shingles: n must be a literal")
        WordShingleArray(args(0), args(1).eval().asInstanceOf[Number].intValue())
      }))

  /** Extensions only run while a session is being built; this installs the
    * same functions on an already-running session (tests, REPLs). */
  def register(spark: SparkSession): Unit = descriptors.foreach { case (id, info, builder) =>
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
