package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine-portable polynomial string hash
  * h = fold(h·131 + codepoint) mod 1e9+7 — the q42/q43 family every
  * SQL oracle replays — as a native codegen `Expression`.
  *
  * Semantically identical to the HOF form
  * `aggregate(split(t, ""), 0L, (h, c) => pmod(h·131 + ascii(c), P))`
  * for BMP text (split("") yields one string per code unit and
  * `ascii` reads its code point, so both iterate code points; the
  * corpus contract is BMP-only, where unit = point). The HOF form
  * regex-splits every token into a materialized array of single-char
  * UTF8Strings and folds through boxed rows — this expression is one
  * local loop, no allocation beyond the decoded string. An empty
  * string hashes to 0 exactly like the HOF's single fold step over
  * split("") = [""], ascii("") = 0.
  */
case class PolyTokenHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_token_hash"

  override def nullSafeEval(input: Any): Any =
    PolyTokenHash.hashString(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PolyTokenHash.hashString($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyTokenHash {
  val Prime = 1000000007L

  /** Static hot-path helper the generated code calls directly. */
  def hashString(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * 131L + cp) % Prime
      i += Character.charCount(cp)
    }
    h
  }

  def apply(c: Column): Column =
    GraftBridge.column(PolyTokenHash(GraftBridge.expression(c)))
}
