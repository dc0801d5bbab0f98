package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused text-normalization kernels for the shingle hot path.
  *
  * The composable formulation — `explode(transform(sequence(...), i ->
  * concat_ws(element_at(split(regexp_replace(lower(text), ...)), ...))))`
  * or the window-lead long form — pays either an interpreted higher-order
  * walk per element or a corpus-wide exchange+sort per consumer. This
  * kernel computes word n-gram shingles of the normalized text in ONE
  * byte-level pass per document, called from whole-stage codegen as a
  * static method: no regex, no intermediate arrays, no shuffle.
  *
  * Exact-equivalence contract (pinned by TextExpressionsSpec against the
  * Spark-functions formulation): the output equals
  * `wordShingles(text, n)` built from
  * `split(trim(regexp_replace(lower(text), "[^a-z0-9]+", " ")), " ")`.
  * Equivalence argument for the byte walk: [a-z0-9] is ASCII-only, UTF-8
  * multi-byte characters use only bytes ≥ 0x80, and Spark's `lower()` is
  * UTF8String.toLowerCase — the same lowering used here. So "separator
  * character runs" and "separator byte runs" delimit identical words.
  */
object TextKernels {
  private val EmptyArray: ArrayData = new GenericArrayData(Array.empty[Any])

  private def isWordByte(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')

  /** Whitespace word tokens of the normalized text — the byte-walk
    * equivalent of split(trim(regexp_replace(lower(text), "[^a-z0-9]+",
    * " ")), " "), INCLUDING the empty-input edge: an all-separator or
    * empty text normalizes to "" and split("", " ") yields [""], so this
    * returns a single empty-string word there too (token consumers pin
    * that behavior). */
  def words(text: UTF8String): ArrayData = {
    val bytes = text.toLowerCase.getBytes
    val len = bytes.length
    val out = new java.util.ArrayList[Any](8)
    var i = 0
    while (i < len) {
      while (i < len && !isWordByte(bytes(i))) i += 1
      if (i < len) {
        val s = i
        while (i < len && isWordByte(bytes(i))) i += 1
        out.add(UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, s, i)))
      }
    }
    if (out.isEmpty) new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
    else new GenericArrayData(out.toArray)
  }

  /** [[shingles]] with per-document dedup fused in: distinct shingles in
    * first-occurrence order, one narrow pass — callers that would
    * otherwise dropDuplicates(doc, shingle) skip that corpus-wide
    * exchange entirely (a document's shingles are always co-located by
    * construction; only cross-document aggregation needs a shuffle). */
  def shinglesDistinct(text: UTF8String, n: Int): ArrayData = {
    val all = shingles(text, n)
    val m = all.numElements()
    if (m <= 1) return all
    val seen = new java.util.HashSet[UTF8String](m * 2)
    val out = new java.util.ArrayList[Any](m)
    var i = 0
    while (i < m) {
      val sh = all.getUTF8String(i)
      if (seen.add(sh)) out.add(sh)
      i += 1
    }
    if (out.size == m) all else new GenericArrayData(out.toArray)
  }

  /** Word n-gram shingles of the normalized text. Fewer than n words →
    * empty array. n must be ≥ 1; for n = 1 this returns the words
    * themselves (note the regex pipeline's one edge: an all-separator
    * text yields zero words here but a single empty-string word through
    * split(""); no shingle consumer uses n = 1). */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.toLowerCase.getBytes
    val len = bytes.length
    // collect word slices [start, end)
    var starts = new Array[Int](8)
    var ends = new Array[Int](8)
    var m = 0
    var i = 0
    while (i < len) {
      while (i < len && !isWordByte(bytes(i))) i += 1
      if (i < len) {
        val s = i
        while (i < len && isWordByte(bytes(i))) i += 1
        if (m == starts.length) {
          starts = java.util.Arrays.copyOf(starts, m * 2)
          ends = java.util.Arrays.copyOf(ends, m * 2)
        }
        starts(m) = s; ends(m) = i; m += 1
      }
    }
    if (m < n) return EmptyArray
    val out = new Array[Any](m - n + 1)
    var w = 0
    while (w <= m - n) {
      var size = n - 1 // separating spaces
      var k = 0
      while (k < n) { size += ends(w + k) - starts(w + k); k += 1 }
      val sh = new Array[Byte](size)
      var p = 0
      k = 0
      while (k < n) {
        if (k > 0) { sh(p) = ' '; p += 1 }
        val wl = ends(w + k) - starts(w + k)
        System.arraycopy(bytes, starts(w + k), sh, p, wl)
        p += wl
        k += 1
      }
      out(w) = UTF8String.fromBytes(sh)
      w += 1
    }
    new GenericArrayData(out)
  }
}

/** Codegen'd `shingles(text, n)`: array of word n-gram shingles of the
  * normalized text, one fused byte pass per row (see [[TextKernels]]);
  * `distinct = true` fuses per-document dedup into the same pass. */
case class WordShingleArray(child: Expression, n: Int,
                            distinct: Boolean = false) extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")
  override def prettyName: String = "graft_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  private def kernel: String = if (distinct) "shinglesDistinct" else "shingles"

  override def nullSafeEval(t: Any): Any =
    if (distinct) TextKernels.shinglesDistinct(t.asInstanceOf[UTF8String], n)
    else TextKernels.shingles(t.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.$kernel($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd `words(text)`: whitespace word tokens of the normalized
  * text, one fused byte pass per row — regex-free equivalent of the
  * lower/regexp_replace/trim/split composition (incl. its [""] edge). */
case class WordArray(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_words"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(t: Any): Any =
    TextKernels.words(t.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.words($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-API entry point. */
object TextFunctions {
  /** Native whitespace word tokens of the normalized text. */
  def wordsNative(text: Column): Column =
    GraftSqlBridge.column(WordArray(GraftSqlBridge.expression(text)))

  /** Native word n-gram shingles of the normalized text — the codegen'd
    * equivalent of the regex/split/HOF formulation, usable in any
    * projection (batch or per-row streaming). */
  def shinglesNative(text: Column, n: Int): Column =
    GraftSqlBridge.column(WordShingleArray(GraftSqlBridge.expression(text), n))

  /** [[shinglesNative]] with per-row (per-document) dedup fused into the
    * kernel — distinct shingles in first-occurrence order. */
  def shinglesDistinctNative(text: Column, n: Int): Column =
    GraftSqlBridge.column(
      WordShingleArray(GraftSqlBridge.expression(text), n, distinct = true))
}
