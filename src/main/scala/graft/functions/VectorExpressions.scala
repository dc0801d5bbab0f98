package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
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

/** Column-API entry points for the native expressions. */
object VectorFunctions {
  def dotNative(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProduct(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
  def cosineNative(a: Column, b: Column): Column =
    GraftSqlBridge.column(CosineSimilarity(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
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
