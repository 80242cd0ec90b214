package graft.functions

import java.math.RoundingMode

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row character-distribution statistics — (n_chars,
  * distinct_chars, Σ p·ln p) over Unicode code points — as a native
  * Catalyst `Expression` with `doGenCode`.
  *
  * A document's characters all live in its own row, so per-doc entropy
  * needs NO distributed aggregate: the explode → (doc, char) groupBy
  * shape (q191's first implementation) shuffled one row per character
  * — corpus-length × char-length traffic for a value computable in a
  * single local pass. This expression restores the per-row shape:
  * whole-stage codegen, zero exchanges before the final sort.
  *
  * Exactness contract with the DuckDB oracle: each p·ln p term is
  * rounded HALF_UP to 9 dp (exactly Spark's `round(x, 9)` semantics)
  * and accumulated as a 10⁻⁹-scaled long — the same associative-exact
  * arithmetic as the registry's `dsum` DECIMAL(18,9) discipline, so
  * the result is bit-identical to the aggregate formulation at any
  * parallelism. |Σ| ≤ ln(distinct) ≤ ~15 nats, far inside the scaled
  * long range.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {
  override def dataType: DataType = CharEntropy.Schema
  override def prettyName: String = "char_entropy"

  override def nullSafeEval(input: Any): Any =
    CharEntropy.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharEntropy.stats($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharEntropy {
  val Schema: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("distinct_chars", LongType, nullable = false),
    StructField("negent", DoubleType, nullable = false)))

  /** One local pass: code-point counts (dense array fast path for
    * ASCII, map fallback beyond), then the 9-dp-rounded term sum.
    */
  def stats(s: UTF8String): InternalRow = {
    val str = s.toString
    val ascii = new Array[Long](128)
    var wide: java.util.HashMap[Integer, java.lang.Long] = null
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (cp < 128) ascii(cp) += 1L
      else {
        if (wide == null) wide = new java.util.HashMap[Integer, java.lang.Long]()
        val k = Integer.valueOf(cp)
        wide.put(k, wide.getOrDefault(k, 0L) + 1L)
      }
      n += 1L
      i += Character.charCount(cp)
    }
    if (n == 0L) return new GenericInternalRow(Array[Any](0L, 0L, 0.0))

    var distinct = 0L
    var scaled = 0L // Σ round9(p·ln p) as a 1e-9-scaled long (exact)
    def add(c: Long): Unit = {
      distinct += 1L
      val p = c.toDouble / n
      val term = p * math.log(p)
      scaled += java.math.BigDecimal.valueOf(term)
        .setScale(9, RoundingMode.HALF_UP).movePointRight(9).longValueExact()
    }
    var j = 0
    while (j < 128) { if (ascii(j) > 0L) add(ascii(j)); j += 1 }
    if (wide != null) {
      val it = wide.values().iterator()
      while (it.hasNext) add(it.next())
    }
    new GenericInternalRow(Array[Any](n, distinct, scaled / 1e9))
  }

  /** Column wrapper: struct(n_chars, distinct_chars, negent). */
  def apply(c: Column): Column =
    GraftBridge.column(CharEntropy(GraftBridge.expression(c)))
}
