package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Adjacent token pairs of a token array as array<struct<a, b>> — the
  * compiled twin of the interpreted
  * `transform(sequence(1, size-1), i -> struct(t[i], t[i+1]))` shape
  * shared by the bigram/co-occurrence/markov queries. Same windows in
  * the same order; short arrays (size < 2) yield an EMPTY array, and
  * every call site explodes the result, where empty and the
  * descending-sequence garbage the old form would produce behind its
  * size >= 2 filter both contribute zero rows. WordNGramsSpec pins
  * equality against the HOF formulation.
  */
case class AdjacentPairs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = AdjacentPairs.Schema
  override def prettyName: String = "adjacent_pairs"

  override def nullSafeEval(input: Any): Any =
    AdjacentPairs.build(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.AdjacentPairs.build($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AdjacentPairs {
  val Schema: DataType = ArrayType(StructType(Seq(
    StructField("a", StringType, nullable = true),
    StructField("b", StringType, nullable = true))), containsNull = false)

  def build(arr: ArrayData): ArrayData = {
    val sz = arr.numElements()
    if (sz < 2) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](sz)
    var i = 0
    while (i < sz) { toks(i) = arr.getUTF8String(i); i += 1 }
    val out = new Array[Any](sz - 1)
    i = 0
    while (i < sz - 1) {
      out(i) = new GenericInternalRow(Array[Any](toks(i), toks(i + 1)))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column wrapper: array<struct<a, b>> of adjacent elements. */
  def apply(c: Column): Column =
    GraftBridge.column(AdjacentPairs(GraftBridge.expression(c)))
}
