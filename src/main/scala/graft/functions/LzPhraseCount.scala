package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** LZ78 phrase count over the first `cap` characters, as a native
  * Catalyst `Expression` — the compiled twin of
  * `TextAnalysis.lzPhraseCount`'s higher-order `aggregate` fold.
  *
  * It replicates the fold's DELIMITED-STRING dictionary semantics
  * exactly — dict starts as "|", a candidate extends the current
  * phrase when `dict` CONTAINS "|cand|" as a substring (including the
  * quirk where a document's own '|' characters can match across
  * phrase boundaries), otherwise "cand|" is appended and the count
  * increments; a non-empty trailing phrase adds 1 — because the
  * DuckDB oracle replays that same string-encoded fold and the gate
  * hashes RESULTS. The fold costs an interpreted expression-tree step
  * (UTF8String concat + contains, boxed struct state) per character;
  * this is one compiled loop per row. Characters are Unicode code
  * points on both paths: `substring(text, 1, cap)` counts code
  * points, and Java's regex `split("")` advances by code point, so
  * the iteration units agree. NULL text stays NULL; the EMPTY-text
  * guard (`when(length = 0, 0)`) stays at the call site, mirroring
  * the HOF version's wrapper. LzPhraseCountSpec pins bit equality.
  */
case class LzPhraseCount(child: Expression, cap: Int) extends UnaryExpression {
  require(cap >= 1, s"cap $cap must be >= 1")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "lz_phrase_count"

  override def nullSafeEval(input: Any): Any =
    LzPhraseCount.count(input.asInstanceOf[UTF8String], cap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LzPhraseCount.count($c, $cap);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LzPhraseCount {
  def count(text: UTF8String, cap: Int): Int = {
    // substringSQL(1, cap) = Spark's substring(text, 1, cap): the
    // first `cap` code points
    val str = text.substringSQL(1, cap).toString
    val dict = new java.lang.StringBuilder("|")
    val cur = new java.lang.StringBuilder()
    var cnt = 0
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      cur.appendCodePoint(cp)
      val probe = "|" + cur + "|"
      if (dict.indexOf(probe) < 0) {
        dict.append(cur).append('|')
        cur.setLength(0)
        cnt += 1
      }
      i += Character.charCount(cp)
    }
    if (cur.length > 0) cnt + 1 else cnt
  }

  /** Column wrapper. */
  def apply(c: Column, cap: Int): Column =
    GraftBridge.column(LzPhraseCount(GraftBridge.expression(c), cap))
}
