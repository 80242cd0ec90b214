package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-grams of a token array — each window of `n` tokens joined
  * with single spaces, optionally deduplicated to first occurrences —
  * as a native Catalyst `Expression` with `doGenCode`.
  *
  * This replaces the interpreted shape shared by every shingle/n-gram
  * producer in the repo:
  * `transform(sequence(1, size-n+1), i -> concat_ws(" ", slice(t,i,n)))`
  * (+ `array_distinct` for shingles). Higher-order functions are
  * CodegenFallback — each window pays an interpreted lambda dispatch,
  * a boxed index, a fresh `slice` array and an expression-tree
  * `concat_ws` — where this expression emits the same UTF8String
  * windows in one compiled pass. Byte-identical outputs: windows are
  * joined with `UTF8String.concatWs` (the engine's own concat_ws
  * kernel; split() arrays never hold nulls), and the distinct variant
  * keeps FIRST occurrences in order, exactly `array_distinct`'s
  * contract. Short arrays (size < n) return an EMPTY array — callers
  * either guard size >= n first (the `wordShingles` contract) or
  * explode the result, where empty and the old guard's `array()` both
  * contribute zero rows. WordNGramsSpec pins bit equality against the
  * HOF formulation.
  */
case class WordNGrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {
  require(n >= 1, s"n-gram width $n must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(input: Any): Any =
    WordNGrams.build(input.asInstanceOf[ArrayData], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordNGrams.build($c, $n, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNGrams {
  private val Space = UTF8String.fromString(" ")

  def build(a: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val sz = a.numElements()
    val m = sz - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](sz)
    var i = 0
    while (i < sz) { toks(i) = a.getUTF8String(i); i += 1 }
    if (!distinct) {
      val out = new Array[Any](m)
      i = 0
      while (i < m) {
        val win = new Array[UTF8String](n)
        System.arraycopy(toks, i, win, 0, n)
        out(i) = UTF8String.concatWs(Space, win: _*)
        i += 1
      }
      new GenericArrayData(out)
    } else {
      val seen = new java.util.HashSet[UTF8String](math.max(16, m * 2))
      val out = new java.util.ArrayList[Any](m)
      i = 0
      while (i < m) {
        val win = new Array[UTF8String](n)
        System.arraycopy(toks, i, win, 0, n)
        val g = UTF8String.concatWs(Space, win: _*)
        if (seen.add(g)) out.add(g)
        i += 1
      }
      new GenericArrayData(out.toArray)
    }
  }

  /** Column wrapper. */
  def apply(c: Column, n: Int, distinct: Boolean): Column =
    GraftBridge.column(WordNGrams(GraftBridge.expression(c), n, distinct))
}
